"""Misra-Gries frequent-items summary: exact-regime equality vs plain
counts (the contract regime), truncating-regime error intervals and
the heavy-hitter presence guarantee, one-shot merge order-independence,
layout determinism, and guards."""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawl_spark.operators.freq import (
    mg_fold,
    mg_merge_counts,
    mg_topk,
    mg_topk_oracle_sql,
)


def test_exact_regime_matches_plain_counts(spark):
    rows = [(f"h{i % 40}", "s%d" % (i % 3)) for i in range(6000)]
    df = spark.createDataFrame(rows, "host string, lang string")
    got = sorted(
        tuple(r)
        for r in mg_topk(df, "host", ("lang",), require_exact=True).collect()
    )
    con = duckdb.connect()
    con.register("src", pd.DataFrame(rows, columns=["host", "lang"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            mg_topk_oracle_sql("SELECT host, lang FROM src", "host", ("lang",))
        ).fetchall()
    )
    assert got == want
    assert all(r[-1] == 0 for r in got)  # err 0 everywhere


def test_truncating_regime_bounds_and_presence(spark):
    """Planted heavy hitters over a long tail at k=50: every interval
    [est, est+err] covers the true count, err ≤ n/(k+1), and every
    item whose true count exceeds err is present."""
    rng = random.Random(7)
    rows = [("heavy%d" % (i % 5),) for i in range(20000)] + [
        ("tail%d" % i,) for i in range(30000)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "host string")
    out = {
        r["item"]: (r["est_count"], r["err"])
        for r in mg_topk(df, "host", (), k=50).collect()
    }
    n = len(rows)
    err = next(iter(out.values()))[1]
    assert 0 < err <= n // 51
    for i in range(5):
        h = "heavy%d" % i
        assert h in out  # 4000 > err -> guaranteed present
        est, e = out[h]
        assert est <= 4000 <= est + e
    for item, (est, e) in out.items():
        true = 4000 if item.startswith("heavy") else 1
        assert est <= true <= est + e, item
    # require_exact must refuse this regime loudly
    with pytest.raises(Exception, match="truncated"):
        mg_topk(df, "host", (), k=50, require_exact=True).collect()


def test_merge_is_one_shot_order_independent():
    """mg_merge_counts: any permutation of the partials produces the
    IDENTICAL merged summary (the union sum is commutative and the
    single truncation sees the same totals)."""
    rng = random.Random(3)
    parts = []
    for p in range(6):
        counters = {
            "i%d" % rng.randrange(40): rng.randrange(1, 50) for _ in range(25)
        }
        parts.append((counters, rng.randrange(0, 5)))
    ref = mg_merge_counts(list(parts), 10)
    for _ in range(5):
        rng.shuffle(parts)
        assert mg_merge_counts(list(parts), 10) == ref


def test_fold_invariant_vs_exact():
    """Folding random exact batches keeps est <= true <= est + err for
    every surviving counter, and err <= n/(k+1)."""
    rng = random.Random(11)
    counters, err = {}, 0
    true: dict = {}
    n = 0
    for _ in range(30):
        batch = {}
        for _ in range(rng.randrange(5, 60)):
            item = "x%d" % rng.randrange(200)
            c = rng.randrange(1, 20)
            batch[item] = batch.get(item, 0) + c
        for i, c in batch.items():
            true[i] = true.get(i, 0) + c
        n += sum(batch.values())
        counters, err = mg_fold(counters, err, batch, 16)
        assert len(counters) <= 16
        assert err <= n // 17
        for i, c in counters.items():
            assert c <= true[i] <= c + err, i


def test_layout_determinism_and_guards(spark):
    df = spark.range(5000).select(
        F.concat(F.lit("h"), (F.col("id") % 300).cast("string")).alias("host")
    ).repartition(4, "host")
    a = sorted(tuple(r) for r in mg_topk(df, "host", (), k=20).collect())
    b = sorted(tuple(r) for r in mg_topk(df, "host", (), k=20).collect())
    assert a == b  # same layout -> bit-identical
    with pytest.raises(ValueError, match="k must be positive"):
        mg_topk(df, "host", (), k=0)
    with pytest.raises(ValueError, match="column not in df"):
        mg_topk(df, "nope")
    # NULL items dropped
    dfn = spark.createDataFrame(
        [("a",), (None,), ("a",)], "host string"
    )
    out = mg_topk(dfn, "host", (), require_exact=True).collect()
    assert [(r["item"], r["est_count"]) for r in out] == [("a", 2)]


def test_null_strata_preserved_and_empty_summary_err(spark):
    """NULL stratum values form a real group (the SQL twin's GROUP BY
    keeps them — pandas' dropna default must not eat them), and a
    summary whose truncation EMPTIES its counter set still delivers
    its error mass: require_exact raises, and the all-evicted output
    carries one NULL-item interval row instead of vanishing."""
    rows = [(None, "h1"), (None, "h1"), ("en", "h1"), ("en", "h2")]
    df = spark.createDataFrame(rows, "lang string, host string")
    got = sorted(
        (
            (r["lang"] or "", r["item"], r["est_count"], r["err"])
            for r in mg_topk(
                df, "host", ("lang",), require_exact=True
            ).collect()
        )
    )
    assert got == [
        ("", "h1", 2, 0),
        ("en", "h1", 1, 0),
        ("en", "h2", 1, 0),
    ]

    # one partition, k=2, three items with EQUAL counts: the MG cut
    # d equals every count, all counters evicted, err = d = 2
    df2 = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",), ("c",)], "host string"
    ).coalesce(1)
    with pytest.raises(Exception, match="truncated"):
        mg_topk(df2, "host", (), k=2, require_exact=True).collect()
    out = mg_topk(df2, "host", (), k=2).collect()
    assert len(out) == 1 and out[0]["item"] is None
    assert out[0]["est_count"] == 0 and out[0]["err"] == 2
    # the interval statement holds: every absent item has true <= err

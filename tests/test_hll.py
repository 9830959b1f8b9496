"""HyperLogLog register sketch: estimate accuracy vs exact distinct,
exact merge property (merge(regs(A), regs(B)) ≡ regs(A ∪ B)),
incremental round-over-round use, rho correctness vs a pure-Python
md5 twin, and the DuckDB oracle parity at pytest scale."""

import hashlib
import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawl_spark.operators.hll import (
    hll_distinct,
    hll_distinct_oracle_sql,
    hll_estimate,
    hll_merge,
    hll_registers,
)

M = 4096


def _py_registers(pairs):
    """Pure-Python twin of hll_registers: dict[(host, idx)] -> rho."""
    regs = {}
    for host, url in pairs:
        hx = hashlib.md5(url.encode("utf-8")).hexdigest()
        idx = int(hx[0:3], 16)
        w = int(hx[3:16], 16)
        rho = 53 if w == 0 else 53 - w.bit_length()
        key = (host, idx)
        if regs.get(key, 0) < rho:
            regs[key] = rho
    return regs


def _mk(spark, n, hosts=5, dup=3):
    rows = [
        (f"h{i % hosts}.example", f"https://h{i % hosts}.example/p/{i // dup}")
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "host string, url string")


def test_registers_match_python_twin(spark):
    rows, df = _mk(spark, 6000)
    got = {
        (r["host"], r["idx"]): r["rho"]
        for r in hll_registers(df).collect()
    }
    assert got == _py_registers(rows)


def test_estimate_within_error_bound(spark):
    """Relative error within 5σ of HLL's 1.04/sqrt(m) for cardinalities
    spanning the linear-counting and raw regimes."""
    for true_n in (50, 800, 20_000):
        df = spark.range(true_n * 3).select(
            F.lit("h").alias("host"),
            (F.col("id") % true_n).cast("string").alias("url"),
        )
        est = hll_distinct(df).collect()[0]["n_distinct_est"]
        sigma = 1.04 / math.sqrt(M)
        assert abs(est - true_n) / true_n <= 5 * sigma, (true_n, est)


def test_merge_equals_whole_and_is_idempotent(spark):
    _, df = _mk(spark, 8000)
    a = df.where(F.crc32(F.col("url")) % 2 == 0)
    b = df.where(F.crc32(F.col("url")) % 2 == 1)
    ra, rb = hll_registers(a), hll_registers(b)
    key = lambda rws: sorted((r["host"], r["idx"], r["rho"]) for r in rws)
    whole = key(hll_registers(df).collect())
    assert key(hll_merge(ra, rb).collect()) == whole
    # idempotent / self-absorbing: re-merging a part changes nothing
    assert key(hll_merge(ra, rb, ra).collect()) == whole


def test_incremental_rounds_estimate_matches_one_shot(spark):
    """The delta-log usage: per-round register tables merged across
    rounds estimate EXACTLY what a one-shot sketch of the union would
    — same registers in, same floats out."""
    _, df = _mk(spark, 9000)
    rounds = [df.where(F.length("url") % 3 == i) for i in range(3)]
    merged = hll_merge(*[hll_registers(r) for r in rounds])
    inc = {
        r["host"]: (r["n_registers"], r["n_distinct_est"])
        for r in hll_estimate(merged).collect()
    }
    one = {
        r["host"]: (r["n_registers"], r["n_distinct_est"])
        for r in hll_distinct(df).collect()
    }
    assert inc == one


def test_null_values_dropped_and_bad_strata_raise(spark):
    df = spark.createDataFrame(
        [("h", "u1"), ("h", None), ("h", "u2")], "host string, url string"
    )
    regs = _py_registers([("h", "u1"), ("h", "u2")])
    got = {
        (r["host"], r["idx"]): r["rho"] for r in hll_registers(df).collect()
    }
    assert got == regs
    with pytest.raises(ValueError, match="strata"):
        hll_registers(df, strata=("nope",))
    with pytest.raises(ValueError, match="p="):
        hll_registers(df, p=14)


def test_duckdb_oracle_parity(spark):
    """Parity across BOTH estimator branches: the _mk hosts sit in the
    linear-counting regime; the extra `big.example` stratum (20k
    distinct) exceeds 2.5·m and takes the raw alpha·m²/Z branch."""
    rows, df = _mk(spark, 12_000, hosts=4, dup=2)
    rows = rows + [
        ("big.example", f"https://big.example/p/{i}") for i in range(20_000)
    ]
    df = df.unionByName(
        spark.createDataFrame(rows[12_000:], "host string, url string")
    )
    got = sorted(
        (r["host"], r["n_registers"], r["n_distinct_est"])
        for r in hll_distinct(df).collect()
    )
    con = duckdb.connect()
    con.register("src", pd.DataFrame(rows, columns=["host", "url"]))
    want = sorted(
        (h, int(n), float(e))
        for h, n, e in con.execute(
            hll_distinct_oracle_sql("SELECT host, url FROM src")
        ).fetchall()
    )
    assert got == want
    # empty strata: the global estimate, same parity path
    g0 = hll_distinct(df, strata=()).collect()[0]
    w0 = con.execute(
        hll_distinct_oracle_sql("SELECT host, url FROM src", strata=())
    ).fetchall()[0]
    assert (g0["n_registers"], float(g0["n_distinct_est"])) == (
        w0[0],
        float(w0[1]),
    )


def test_unicode_value_parity_across_engines(spark):
    """Adversarial unicode items (emoji, astral plane, CJK, combining
    marks, NFC-vs-NFD spellings, RTL, null-adjacent controls) through
    the THREE md5-keyed operators added this round — Spark's
    cast-to-UTF-8-binary md5, DuckDB's md5(VARCHAR) and Python's
    .encode('utf-8') must agree on every byte or the cross-engine
    contract silently diverges on real web text."""
    from crawl_spark.operators.freq import mg_topk, mg_topk_oracle_sql
    from crawl_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_oracle_sql,
    )

    items = [
        "plain-ascii", "café", "café",  # NFC vs NFD
        "日本語テキスト", "🦀🚀", "\U0001F9E1x",  # CJK + astral
        "عربي", "עברית",  # RTL
        "a\tb", "line\nbreak", " nbsp", "​zwsp",
        "mixed🦀and日本語", "ß", "İstanbul",
    ]
    rows = [(items[i % len(items)], i % 3, float(i % 7 + 1)) for i in range(900)]
    df = spark.createDataFrame(rows, "url string, grp int, weight double")
    pdf = pd.DataFrame(rows, columns=["url", "grp", "weight"])
    con = duckdb.connect()
    con.register("u0", pdf)

    # hll: registers over unicode urls, host = grp
    g1 = sorted(
        tuple(r)
        for r in hll_distinct(
            df.select(F.col("grp").cast("string").alias("host"), "url")
        ).collect()
    )
    w1 = sorted(
        (h, int(n), float(e))
        for h, n, e in con.execute(
            hll_distinct_oracle_sql(
                "SELECT CAST(grp AS VARCHAR) AS host, url FROM u0"
            )
        ).fetchall()
    )
    assert [(a, b, float(c)) for a, b, c in g1] == w1

    # mg: unicode ITEMS in the exact regime
    g2 = sorted(
        tuple(r)
        for r in mg_topk(df, "url", (), require_exact=True).collect()
    )
    w2 = sorted(
        tuple(r)
        for r in con.execute(
            mg_topk_oracle_sql("SELECT url FROM u0", "url", ())
        ).fetchall()
    )
    assert g2 == w2

    # weighted sample: unicode IDS drive the md5 priority
    df3 = df.select(F.col("url").alias("doc_id"), "weight").distinct()
    con.register("u3", pdf[["url", "weight"]].drop_duplicates())
    g3 = sorted(
        tuple(r)
        for r in weighted_sample(df3, 6, "weight", "doc_id", ()).collect()
    )
    w3 = sorted(
        tuple(r)
        for r in con.execute(
            weighted_sample_oracle_sql(
                "SELECT url AS doc_id, weight FROM u3", 6, "weight", "doc_id"
            )
        ).fetchall()
    )
    assert g3 == w3

"""KLL quantile sketch: exact-regime equality vs the rank statistic,
compacting-regime rank-error bounds vs numpy, determinism, and
merge-order independence of the content-derived compaction parity."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawl_spark.operators.sketch import KLL, kll_quantiles

PROBS = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)


def _rank_stat(values, p):
    """min{v : rank(v) >= ceil(p*n)} — the sketch's exact-regime
    definition."""
    s = np.sort(np.asarray(values, dtype=np.float64))
    target = max(math.ceil(p * len(s)), 1)
    return float(s[target - 1])


def test_kll_exact_when_uncompacted():
    rng = np.random.RandomState(7)
    vals = rng.lognormal(0.0, 2.0, size=200)  # <= k: exact regime
    sk = KLL(256)
    sk.add(vals)
    assert not sk.compacted()
    assert sk.n == 200
    for p in PROBS:
        assert sk.quantile(p) == _rank_stat(vals, p), p


def test_kll_rank_error_bound_compacting():
    """200k values through a k=256 sketch: empirical rank error of
    every quantile ≤ 1.5% of n (KLL's w.h.p. bound is ~2.3/k ≈ 0.9%;
    1.5% leaves margin for the deterministic coin)."""
    rng = np.random.RandomState(11)
    for dist in (
        rng.lognormal(0, 2, 200_000),
        rng.uniform(-5, 5, 200_000),
        np.concatenate([rng.normal(0, 1, 100_000), rng.normal(50, 1, 100_000)]),
    ):
        sk = KLL(256)
        for chunk in np.array_split(dist, 37):  # streaming adds
            sk.add(chunk)
        assert sk.compacted() and sk.n == len(dist)
        s = np.sort(dist)
        for p in PROBS:
            q = sk.quantile(p)
            rank = np.searchsorted(s, q, side="right")
            assert abs(rank - p * len(s)) <= 0.015 * len(s), (p, rank)


def test_kll_deterministic_and_any_merge_order_bounded():
    """Re-runs with the same fold order are bit-identical (the
    md5-of-content coin has no RNG state); EVERY fold order stays
    within the rank-error bound (order changes which elements survive
    compaction, not the guarantee — hence the canonical fold order in
    the Spark merge stage)."""
    rng = np.random.RandomState(3)
    vals = rng.normal(0, 1, 60_000)
    parts = np.array_split(vals, 8)
    s = np.sort(vals)

    def build(order):
        sk = KLL(128)
        for i in order:
            part = KLL(128)
            part.add(parts[i])
            sk.merge(part)
        return [sk.quantile(p) for p in PROBS]

    a = build(range(8))
    c = build(range(8))
    assert a == c  # re-run identical
    for order in (reversed(range(8)), [3, 0, 7, 1, 6, 2, 5, 4]):
        for p, q in zip(PROBS, build(order)):
            rank = np.searchsorted(s, q, side="right")
            assert abs(rank - p * len(s)) <= 0.03 * len(s), (p, q)


def test_kll_quantiles_spark_matches_local_sketch(spark):
    """The Spark two-stage pipeline over ONE partition equals the local
    sketch fed the same rows in order; multi-partition stays within the
    rank-error bound; tiny strata are exact per stratum."""
    rng = np.random.RandomState(5)
    vals = rng.lognormal(0, 1, 5000)
    langs = np.where(np.arange(5000) % 3 == 0, "en", "de")
    rows = [(str(l), float(v)) for l, v in zip(langs, vals)]
    df = spark.createDataFrame(rows, "lang string, score double")

    out = kll_quantiles(
        df.coalesce(1), "score", ("lang",), PROBS, k=4096
    ).collect()
    # k=4096 > any stratum size -> exact regime per stratum
    by = {}
    for r in out:
        by[(r["lang"], r["p"])] = (r["q"], r["n"])
    for lang in ("en", "de"):
        sub = vals[langs == lang]
        for p in PROBS:
            q, n = by[(lang, p)]
            assert n == len(sub)
            assert q == round(_rank_stat(sub, p), 6), (lang, p)

    # multi-partition compacting run: bound check per stratum
    big = spark.range(120_000).select(
        F.when(F.col("id") % 4 == 0, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
        (F.sin(F.col("id").cast("double")) * 1000).alias("score"),
    ).repartition(16)
    got = kll_quantiles(big, "score", ("lang",), (0.25, 0.5, 0.9), k=256).collect()
    import pandas as pd

    pdf = big.toPandas()
    for r in got:
        sub = np.sort(pdf[pdf["lang"] == r["lang"]]["score"].to_numpy())
        rank = np.searchsorted(sub, r["q"], side="right")
        assert r["n"] == len(sub)
        assert abs(rank - r["p"] * len(sub)) <= 0.02 * len(sub), r


def test_kll_quantiles_null_scores_and_missing_strata(spark):
    df = spark.createDataFrame(
        [("en", 1.0), ("en", None), ("en", 2.0)], "lang string, score double"
    )
    out = kll_quantiles(df, "score", ("lang",), (0.5, 1.0), k=64).collect()
    assert {r["n"] for r in out} == {2}  # null dropped
    assert {r["q"] for r in out} == {1.0, 2.0}
    with pytest.raises(ValueError):
        kll_quantiles(df, "score", ("nope",), (0.5,))
    with pytest.raises(ValueError):
        kll_quantiles(df, "score", ("lang",), ())
    with pytest.raises(ValueError):
        KLL(4)

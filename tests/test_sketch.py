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


def test_kll_quantiles_spark_exact_regime_and_bounds(spark):
    """Exact regime per stratum (k above every stratum size) equals the
    rank statistic; multi-partition compacting run stays within the
    rank-error bound."""
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


def test_kll_quantiles_spark_equals_local_sketch_when_compacting(spark):
    """Single-partition pipeline == a local sketch fed the same rows in
    the same (one-batch) order, INCLUDING the compacting regime: the
    canonical fold of a single partial's level rows reconstructs that
    partial bit-for-bit (intermediate caps only loosen), so the
    documented Spark ≡ local-sketch property is pinned, not assumed."""
    rng = np.random.RandomState(13)
    vals = rng.lognormal(0, 1, 5000)
    df = spark.createDataFrame(
        [("en", float(v)) for v in vals], "lang string, score double"
    )
    got = {
        r["p"]: (r["q"], r["n"])
        for r in kll_quantiles(
            df.coalesce(1), "score", ("lang",), PROBS, k=128
        ).collect()
    }
    sk = KLL(128)
    # replicate the session's Arrow chunking (maxRecordsPerBatch=128,
    # crawl_spark/session.py) — add boundaries shift compaction points
    for i in range(0, len(vals), 128):
        sk.add(vals[i : i + 128])
    assert sk.compacted()
    for p in PROBS:
        assert got[p] == (round(sk.quantile(p), 6), sk.n), p


def test_kll_negative_zero_fold_determinism():
    """-0.0 normalizes to +0.0 at add time, so value-equal partials are
    byte-equal and the canonical fold order cannot leak arrival order
    into the compaction parity."""
    a, b = KLL(8), KLL(8)
    filler = np.arange(1.0, 20.0)
    a.add(np.concatenate([[0.0], filler]))
    a2 = KLL(8)
    a2.add(np.concatenate([[-0.0], filler]))
    b.merge(a2)
    sk1, sk2 = KLL(8), KLL(8)
    sk1.merge(a)
    sk1.merge(b)
    sk2.merge(b)
    sk2.merge(a)
    assert [x.tolist() for x in sk1.levels[1:]] == [
        x.tolist() for x in sk2.levels[1:]
    ]


def test_kll_quantiles_require_exact_and_duplicate_probs(spark):
    df = spark.createDataFrame(
        [("en", float(i)) for i in range(500)], "lang string, score double"
    )
    with pytest.raises(ValueError):
        kll_quantiles(df, "score", ("lang",), (0.5, 0.5))
    # k=64 << 500 -> compacts -> require_exact raises in the merge task
    import py4j.protocol

    with pytest.raises(Exception) as ei:
        kll_quantiles(
            df, "score", ("lang",), (0.5,), k=64, require_exact=True
        ).collect()
    assert "require_exact" in str(ei.value)
    # without the flag the same call succeeds
    assert kll_quantiles(df, "score", ("lang",), (0.5,), k=64).count() == 1


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


def test_kll_bytes_roundtrip_and_versioning():
    """The streaming-checkpoint serialization: bit-exact round trip
    (levels, extremes, quantiles, still-usable sketch), and LOUD
    rejection of unknown versions and trailing junk — layout drift
    must be a named failure, never a silently-garbage sketch."""
    import numpy as np
    import pytest

    from crawl_spark.operators.sketch import (
        KLL,
        kll_from_bytes,
        kll_to_bytes,
    )

    rng = np.random.RandomState(1)
    sk = KLL(64)
    sk.add(rng.normal(0, 1, 5000))
    raw = kll_to_bytes(sk)
    rt = kll_from_bytes(raw)
    assert rt.k == sk.k and rt.n == sk.n
    assert rt.vmin == sk.vmin and rt.vmax == sk.vmax
    assert all((a == b).all() for a, b in zip(rt.levels, sk.levels))
    for p in (0.0, 0.1, 0.5, 0.9, 1.0):
        assert rt.quantile(p) == sk.quantile(p)
    rt.add(rng.normal(0, 1, 100))  # usable after round trip
    # empty sketch round-trips too
    empty = kll_from_bytes(kll_to_bytes(KLL(32)))
    assert empty.n == 0
    with pytest.raises(ValueError, match="magic"):
        kll_from_bytes(b"XXXX" + raw[4:])
    with pytest.raises(ValueError, match="trailing"):
        kll_from_bytes(raw + b"\x00")

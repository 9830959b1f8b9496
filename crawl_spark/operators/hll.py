"""Mergeable HyperLogLog distinct-count sketch (Flajolet et al.,
AofA 2007) — the cross-round / cross-shard cardinality arm.

Why it exists: the engine's exact answers to "how many distinct URLs
per host?" are anti-joins or ``count(DISTINCT …)`` groupBys — one full
shuffle of the key column per question, re-paid every round. At 100 TB
the right artifact is the same shape as the seen/frontier delta logs
(CLAUDE.md invariants): a tiny per-shard REGISTER TABLE that is
  * mergeable by ``MAX`` (idempotent, commutative, associative — union
    the register rows of any number of rounds/shards and re-max),
  * O(|strata| · 2^p) rows regardless of input size,
  * estimable to ~1.04/sqrt(2^p) relative error (1.6 % at p=12)
    without ever touching the raw keys again.
Spark's own ``approx_count_distinct`` is HLL++ but its sketch is
opaque (not persistable / re-mergeable as a table across engine runs),
and its xxhash64 has no DuckDB twin. This module trades a few lines of
SQL for a register artifact that snapshots like every other state
table and is bit-identical cross-engine.

Determinism / cross-engine contract (the repo's float-hash rules):
  * hash = md5 (the only sanctioned cross-engine hash); the first
    3 hex chars are the register index (p=12 → m=4096), the next
    13 hex chars the 52-bit rank window ``w``.
  * rho = 53 - bitlen(w) (w=0 → 53), with bitlen taken as
    ``length(bin(w))`` — an exact STRING computation on both engines,
    never ``floor(log2(w))`` (log2(2^52 - 1) rounds UP to 52.0 in
    IEEE double, off-by-one at every power boundary).
  * the harmonic sum is accumulated in integer micro-units of 2^-53:
    each register contributes ``2^(53-rho)`` (exact in double for
    rho >= 1, cast to DECIMAL(38,0)); zero registers contribute 2^53.
    The decimal sum is exact and order-independent, so both engines
    produce the SAME integer, rounded ONCE on the final cast to
    double — no order-dependent float accumulation anywhere.
  * the estimator is the classic bias-corrected alpha_m m^2 / Z with
    the small-range linear-counting branch (E <= 2.5m and V > 0 →
    m ln(m/V)). The 32-bit large-range correction is intentionally
    absent: the rank window is 52 bits, so hash collisions are
    negligible at any cardinality this engine will meet.

Plan shape at 100 TB: one narrow projection over the scan (md5 + two
substrings + a string-length — whole-stage codegen, zero Python), one
partial-aggregated groupBy(strata, idx) whose output is bounded by
|strata| · 4096 rows, then a |strata|-sized groupBy for the estimate.
The raw key column crosses the wire only as (idx, rho) pairs; the
partial ``max`` combiner collapses each map task's contribution to
≤ m rows before the shuffle. Incremental use mirrors the seen-set
delta log: persist each round's ``hll_registers`` output, and answer
"distinct so far" with ``hll_merge`` + ``hll_estimate`` over the tiny
register tables instead of rescanning history.

Reference tie-in: the Go reference keeps exact per-run counters
(crawl.go counters; SURVEY.md §2.7) and has no cardinality sketch —
this is a driver-mandated scale extension, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_distinct",
    "hll_distinct_oracle_sql",
    "py_update_registers",
    "py_estimate",
]

_P = 12  # register-index bits; m = 4096
_M = 1 << _P
_TWO53 = float(1 << 53)  # micro-unit scale of the harmonic sum


def _check_p(p: int) -> None:
    # 3 hex chars of index + 13 hex chars of rank window; other
    # precisions would need a different hex split, so pin it rather
    # than silently mis-slice.
    if p != _P:
        raise ValueError(f"hll: only p={_P} (m={_M}) is supported")


def _strata_cols(df: DataFrame, strata: tuple[str, ...]) -> list[str]:
    missing = set(strata) - {f.name for f in df.schema.fields}
    if missing:
        raise ValueError(f"hll: strata not in df: {sorted(missing)}")
    return list(strata)


def hll_registers(
    df: DataFrame,
    value_col: str = "url",
    strata: tuple[str, ...] = ("host",),
    p: int = _P,
) -> DataFrame:
    """Sparse HLL registers of ``value_col`` per stratum:
    ``(*strata, idx, rho)`` with one row per NON-ZERO register
    (absent idx ≡ rho 0). NULL values are dropped (no identity).

    This is the mergeable artifact: union any number of outputs (same
    strata, same p) and re-``MAX`` — :func:`hll_merge` — to get the
    registers of the union of their inputs, exactly.
    """
    _check_p(p)
    sc = _strata_cols(df, strata)
    h = F.md5(F.col(value_col).cast("string").cast("binary"))
    w = F.conv(F.substring(h, 4, 13), 16, 10).cast("bigint")
    rows = df.where(F.col(value_col).isNotNull()).select(
        *sc,
        F.conv(F.substring(h, 1, 3), 16, 10).cast("int").alias("idx"),
        F.when(w == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.bin(w)))
        .cast("int")
        .alias("rho"),
    )
    return rows.groupBy(*sc, "idx").agg(F.max("rho").alias("rho"))


def hll_merge(
    first: DataFrame, *rest: DataFrame, strata: tuple[str, ...] = ("host",)
) -> DataFrame:
    """Merge register tables (same strata, same p): union + per-(strata,
    idx) MAX. Exact — merge(regs(A), regs(B)) ≡ regs(A ∪ B) bit for
    bit, because per-register max is how the sketch absorbs rows in
    the first place."""
    sc = _strata_cols(first, strata)
    out = first
    for r in rest:
        out = out.unionByName(r.select(*sc, "idx", "rho"))
    return out.groupBy(*sc, "idx").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    strata: tuple[str, ...] = ("host",),
    p: int = _P,
) -> DataFrame:
    """Cardinality estimate per stratum from a register table:
    ``(*strata, n_registers, n_distinct_est)`` — ``n_registers`` the
    count of non-zero registers (integer-exact cross-engine),
    ``n_distinct_est`` the bias-corrected HLL estimate rounded to 6 dp
    (the repo's float-hash rule). See the module docstring for why the
    harmonic sum is a DECIMAL of 2^-53 micro-units."""
    _check_p(p)
    sc = _strata_cols(registers, strata)
    micro = F.pow(F.lit(2.0), F.lit(53) - F.col("rho")).cast("decimal(38,0)")
    agg = registers.groupBy(*sc).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(micro).alias("__zmicro"),
    )
    m = F.lit(float(_M))
    present = F.col("n_registers").cast("double")
    zero = m - present  # V: registers never hit
    z_micro = (
        F.col("__zmicro")
        + (F.lit(_M).cast("decimal(38,0)") - F.col("n_registers"))
        * F.lit(1 << 53).cast("decimal(38,0)")
    )
    z = z_micro.cast("double") / F.lit(_TWO53)
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / m)
    e_raw = alpha * m * m / z
    est = F.when(
        (e_raw <= F.lit(2.5) * m) & (zero > F.lit(0.0)),
        m * F.log(m / zero),
    ).otherwise(e_raw)
    return agg.select(
        *sc,
        F.col("n_registers"),
        F.round(est, 6).alias("n_distinct_est"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str = "url",
    strata: tuple[str, ...] = ("host",),
    p: int = _P,
) -> DataFrame:
    """One-shot per-stratum distinct-count estimate:
    :func:`hll_registers` → :func:`hll_estimate`. The two-step form is
    the scale path (persist the registers, merge across rounds); this
    composition is the ad-hoc query."""
    return hll_estimate(hll_registers(df, value_col, strata, p), strata, p)


def hll_distinct_oracle_sql(
    inner_sql: str,
    value_col: str = "url",
    strata: tuple[str, ...] = ("host",),
) -> str:
    """DuckDB twin of :func:`hll_distinct`: the identical md5 → hex
    split → ``length(bin(w))`` rank → max-register → micro-unit
    HUGEINT harmonic sum → single-rounded estimate. Every intermediate
    is integer-exact on both engines; the only float rounding is the
    final cast + the libm ``ln`` of the linear-counting branch, both
    inside round(·, 6). Handles empty ``strata`` (the global estimate)
    like the Spark side: the grouped CTEs degrade to global
    aggregates."""
    scp = (", ".join(strata) + ",") if strata else ""
    reg_gb = f"GROUP BY {scp} idx".rstrip(", ") if strata else "GROUP BY idx"
    agg_gb = f"GROUP BY {', '.join(strata)}" if strata else ""
    return f"""
WITH x AS ({inner_sql}),
h AS (
  SELECT {scp} md5(CAST({value_col} AS VARCHAR)) AS hx
  FROM x WHERE {value_col} IS NOT NULL
),
r0 AS (
  SELECT {scp}
         CAST('0x' || substr(hx, 1, 3) AS INTEGER) AS idx,
         CAST('0x' || substr(hx, 4, 13) AS BIGINT) AS w
  FROM h
),
regs AS (
  SELECT {scp} idx,
         MAX(CASE WHEN w = 0 THEN 53
                  ELSE 53 - length(bin(w)) END) AS rho
  FROM r0 {reg_gb}
),
agg AS (
  SELECT {scp} COUNT(*) AS n_registers,
         SUM(CAST(POWER(2.0, 53 - rho) AS HUGEINT)) AS zmicro
  FROM regs {agg_gb}
),
est AS (
  SELECT {scp} n_registers,
         CAST(zmicro + (4096 - n_registers) * CAST(9007199254740992 AS HUGEINT)
              AS DOUBLE) / 9007199254740992.0 AS z,
         (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 AS a2,
         CAST(4096 - n_registers AS DOUBLE) AS v
  FROM agg
)
SELECT {scp} CAST(n_registers AS BIGINT) AS n_registers,
       round(CASE WHEN a2 / z <= 2.5 * 4096.0 AND v > 0.0
                  THEN 4096.0 * ln(4096.0 / v)
                  ELSE a2 / z END, 6) AS n_distinct_est
FROM est
"""


def py_update_registers(regs: bytearray, values) -> bytearray:
    """Pure-Python register update — the streaming arm's kernel
    (`streaming/feed.host_distinct_stream` keeps one 4096-byte register
    vector per host in the state store) and the test twin of
    :func:`hll_registers`. Same md5 hex split, same
    ``53 - bit_length(w)`` rank; NULL/None values dropped."""
    import hashlib

    for v in values:
        if v is None:
            continue
        hx = hashlib.md5(str(v).encode("utf-8")).hexdigest()
        idx = int(hx[0:3], 16)
        w = int(hx[3:16], 16)
        rho = 53 if w == 0 else 53 - w.bit_length()
        if regs[idx] < rho:
            regs[idx] = rho
    return regs


def py_estimate(regs: bytes) -> tuple[int, float]:
    """(n_registers, n_distinct_est) from a register vector — float-step
    IDENTICAL to :func:`hll_estimate`: the harmonic sum is an exact
    Python int of 2^-53 micro-units whose single int→float division is
    the same correctly-rounded step as the engine's DECIMAL→DOUBLE
    cast, so the streaming emission equals the batch operator's output
    bit-for-bit (validated in tests/test_hll.py)."""
    present = sum(1 for r in regs if r > 0)
    z_micro = sum((1 << (53 - r)) for r in regs if r > 0)
    z_micro += (_M - present) << 53
    z = z_micro / (1 << 53)
    m = float(_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e_raw = alpha * m * m / z
    zero = m - float(present)
    import math

    if e_raw <= 2.5 * m and zero > 0.0:
        est = m * math.log(m / zero)
    else:
        est = e_raw
    return present, round(est, 6)

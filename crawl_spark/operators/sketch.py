"""Mergeable quantile sketch (KLL, Karnin-Lang-Liberty FOCS'16) — the
100 TB path for per-stratum gate calibration.

`textops.score_quantiles` is EXACT but its ``percentile`` aggregate
buffers each group's values, so its documented scale contract is
"calibrate on a stratified sample". This module is the other arm of
that trade: a streaming sketch of O(k·log(n/k)) values per stratum
whose rank error is ~O(1/k) — no value buffering anywhere, one
partial-sketch pass over the scan + one dimension-sized merge shuffle.

Determinism (the repo's cross-engine discipline, applied to a
randomized algorithm): KLL's only coin flip is the compaction parity
(keep even- or odd-indexed survivors of a sorted buffer). Here the
parity is the first bit of md5(sorted buffer bytes) — a deterministic
function of the buffer content, so a fixed fold order reproduces bit
for bit. Fold ORDER still matters (each intermediate compaction is
lossy at a different point), so the merge stage folds partial rows in
a canonical sorted order; results are therefore layout-deterministic:
same files + same split config → same output, bit for bit, across
re-runs and shuffle-arrival orders.

Exactness escape hatch: a sketch that never compacted (stratum count
≤ k per partial, and ≤ k after the merge) holds every value at
weight 1 and its
quantile is EXACTLY the rank statistic ``min{v : rank(v) ≥ ⌈p·n⌉}`` —
which plain SQL can replay. The `kll_quantiles` contract query runs in
that regime, so DuckDB hash-matches it bit-for-bit while the pytest
suite exercises the compacting regime against numpy rank-error bounds.

Plan shape at 100 TB: stage 1 is `mapInPandas` over the scan — one
sketch per (stratum, partition), emitted as (strata…, level, values)
rows, O(|strata|·P·levels) rows total, corpus values never shuffle;
stage 2 is ONE groupBy(strata) `applyInPandas` merge — each task holds
|probs| + O(k·log n) doubles, never the stratum's rows. Compare:
Spark's own ``approx_percentile`` (GK) is the same shape but is not
cross-engine-deterministic and not exposed as a mergeable artifact;
this sketch can be persisted per shard and re-merged incrementally.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "KLL",
    "kll_quantiles",
    "kll_quantiles_oracle_sql",
    "kll_to_bytes",
    "kll_from_bytes",
]


class KLL:
    """Deterministic KLL sketch over float64 values.

    ``levels[i]`` holds values of weight ``2**i`` (unsorted between
    compactions). Capacity of level i with H levels is
    ``max(ceil(k * (2/3)**(H-1-i)), 8)`` — the canonical geometric
    schedule: the top level keeps ~k values, lower (lighter) levels
    shrink, total footprint ~3k.
    """

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("KLL: k must be >= 8")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        # exact extremes (compaction may discard the true min/max from
        # the level buffers; DataSketches tracks them the same way)
        self.vmin = math.inf
        self.vmax = -math.inf

    def _cap(self, i: int) -> int:
        h = len(self.levels)
        return max(int(math.ceil(self.k * (2.0 / 3.0) ** (h - 1 - i))), 8)

    @staticmethod
    def _parity(buf: np.ndarray) -> int:
        # content-derived coin: first md5 bit of the sorted buffer
        return hashlib.md5(buf.tobytes()).digest()[0] & 1

    def _compress(self) -> None:
        while True:
            over = [
                i
                for i in range(len(self.levels))
                if len(self.levels[i]) > self._cap(i)
            ]
            if not over:
                return
            i = over[0]
            buf = np.sort(self.levels[i], kind="stable")
            # weight conservation: promote an EVEN count (each survivor
            # doubles its weight); an odd buffer retains its minimum at
            # this level — n stays exact through every compaction.
            if len(buf) % 2:
                keep, core = buf[:1], buf[1:]
            else:
                keep, core = buf[:0], buf
            off = self._parity(core)
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], core[off::2]]
            )
            self.levels[i] = keep

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        # normalize -0.0 → +0.0: the canonical fold order compares by
        # VALUE while the compaction coin hashes BYTES — a mixed-zero
        # stratum would otherwise leak shuffle-arrival order into the
        # parity (IEEE: -0.0 + 0.0 == +0.0)
        v = v + 0.0
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def merge(self, other: "KLL") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, buf in enumerate(other.levels):
            if len(buf):
                self.levels[i] = np.concatenate([self.levels[i], buf])
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress()

    @property
    def n(self) -> int:
        """Total weight = number of values represented."""
        return int(sum(len(b) << i for i, b in enumerate(self.levels)))

    def compacted(self) -> bool:
        return any(len(b) for b in self.levels[1:])

    def quantile(self, p: float) -> float:
        """Rank statistic: the smallest stored value whose cumulative
        weight reaches ``ceil(p·n)``; p=0 and p=1 return the EXACT
        tracked min/max. On an uncompacted sketch this is exactly
        ``min{v : rank(v) >= ceil(p*n)}`` over the input."""
        w = self.n
        if w == 0:
            return float("nan")
        if p <= 0.0:
            return self.vmin
        if p >= 1.0:
            return self.vmax
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [
                np.full(len(b), 1 << i, dtype=np.int64)
                for i, b in enumerate(self.levels)
            ]
        )
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(wts[order])
        # IEEE double p*w on BOTH engines (see oracle) — identical bits
        target = max(math.ceil(p * w), 1)
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(vals[order[min(idx, len(order) - 1)]])


_LEVEL_SUFFIX = [
    T.StructField("__level", T.IntegerType()),
    T.StructField("__vals", T.ArrayType(T.DoubleType())),
]


def kll_quantiles(
    df: DataFrame,
    score_col: str = "score",
    strata: tuple[str, ...] = ("lang",),
    probs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
    k: int = 256,
    require_exact: bool = False,
) -> DataFrame:
    """Per-stratum KLL quantiles of ``score_col`` →
    ``(*strata, p, q, n)`` rows, ``q`` rounded to 6 dp (the repo's
    float-hash rule), ``n`` the stratum count. NaN/NULL scores are
    dropped (they carry no rank). See module docstring for the
    determinism and exactness contracts; rank error of the compacting
    regime is validated against numpy in tests/test_sketch.py.

    ``require_exact=True`` raises in the merge task if any stratum's
    merged sketch compacted — for callers (like the oracle-checked
    contract query) whose correctness depends on the exact regime, so
    a silent drift into approximation becomes a named failure."""
    plist = [float(p) for p in probs]
    if not plist:
        raise ValueError("kll_quantiles: probs must be non-empty")
    if len(set(plist)) != len(plist):
        # the SQL twin's GROUP BY would collapse duplicates; reject
        # them here so the two row counts can never disagree
        raise ValueError("kll_quantiles: probs must be distinct")
    sfields = [f for f in df.schema.fields if f.name in strata]
    if len(sfields) != len(strata):
        missing = set(strata) - {f.name for f in df.schema.fields}
        raise ValueError(f"kll_quantiles: strata not in df: {missing}")
    part_schema = T.StructType(list(sfields) + _LEVEL_SUFFIX)
    out_schema = T.StructType(
        list(sfields)
        + [
            T.StructField("p", T.DoubleType()),
            T.StructField("q", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )
    scols = list(strata)
    narrow = df.select(*scols, F.col(score_col).cast("double").alias("__s"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for key, grp in pdf.groupby(scols, dropna=False, sort=False):
                kt = key if isinstance(key, tuple) else (key,)
                sk = sketches.get(kt)
                if sk is None:
                    sk = sketches[kt] = KLL(k)
                sk.add(grp["__s"].to_numpy(dtype=np.float64, na_value=np.nan))
        rows = []
        for kt, sk in sketches.items():
            if sk.n == 0:
                continue
            # level -1 carries the exact extremes across the shuffle
            rows.append((*kt, -1, [sk.vmin, sk.vmax]))
            for lvl, buf in enumerate(sk.levels):
                if len(buf):
                    rows.append((*kt, lvl, buf.tolist()))
        if rows:  # empty partitions yield nothing (Arrow-safe)
            yield pd.DataFrame(
                rows, columns=scols + ["__level", "__vals"]
            )

    partials = narrow.mapInPandas(partial, part_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        # canonical fold order: shuffle arrival order is not
        # deterministic, compaction outcomes depend on fold order
        items = sorted(
            zip(pdf["__level"], pdf["__vals"]),
            key=lambda t: (t[0], tuple(t[1])),
        )
        sk = KLL(k)
        for lvl, vals in items:
            if lvl < 0:  # extremes sentinel
                sk.vmin = min(sk.vmin, vals[0])
                sk.vmax = max(sk.vmax, vals[1])
                continue
            other = KLL(k)
            while len(other.levels) <= lvl:
                other.levels.append(np.empty(0, dtype=np.float64))
            other.levels[lvl] = np.asarray(vals, dtype=np.float64)
            sk.merge(other)
        key = [pdf[s].iloc[0] for s in scols]
        if require_exact and sk.compacted():
            raise ValueError(
                "kll_quantiles(require_exact=True): stratum %r compacted "
                "(count %d exceeds the exact regime for k=%d) — raise k "
                "or drop the exactness requirement" % (key, sk.n, k)
            )
        rows = [
            (*key, p, round(sk.quantile(p), 6), sk.n) for p in plist
        ]
        return pd.DataFrame(rows, columns=scols + ["p", "q", "n"])

    return partials.groupBy(*scols).applyInPandas(merge, out_schema)


def kll_quantiles_oracle_sql(
    inner_sql: str,
    score_col: str = "score",
    strata: tuple[str, ...] = ("lang",),
    probs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> str:
    """DuckDB twin of :func:`kll_quantiles` in the EXACT (uncompacted)
    regime: the rank statistic ``min{v : rank(v) >= ceil(p*n)}`` with
    the target computed as ``CEIL(p * n)`` on IEEE doubles — the same
    expression the sketch evaluates, so the bits agree even where
    ``p*n`` lands on a representation boundary. Valid whenever every
    stratum holds ≤ k values (the sketch never compacts); the
    compacting regime has no SQL twin and is bound-checked in pytest."""
    sc = ", ".join(strata)
    plist = [float(p) for p in probs]
    if len(set(plist)) != len(plist):
        raise ValueError("kll_quantiles_oracle_sql: probs must be distinct")
    pvals = ", ".join(f"CAST({p!r} AS DOUBLE)" for p in plist)
    return f"""
WITH x AS ({inner_sql}),
v AS (
  SELECT {sc}, CAST({score_col} AS DOUBLE) AS s,
         row_number() OVER (PARTITION BY {sc} ORDER BY CAST({score_col} AS DOUBLE)) AS rn,
         count(*) OVER (PARTITION BY {sc}) AS n
  FROM x WHERE {score_col} IS NOT NULL
    AND NOT isnan(CAST({score_col} AS DOUBLE))
),
p AS (SELECT unnest([{pvals}]) AS p)
SELECT {sc}, p.p AS p,
       round(min(v.s), 6) AS q,
       CAST(v.n AS BIGINT) AS n
FROM v JOIN p ON v.rn >= GREATEST(CEIL(p.p * v.n), 1)
GROUP BY {sc}, p.p, v.n
"""


_KLL_MAGIC = b"KLL1"  # bump on ANY layout change: a version mismatch
# must be a named failure, never a silently-garbage sketch


def kll_to_bytes(sk: KLL) -> bytes:
    """Explicit binary state for the streaming arm (no pickle: the
    layout is part of the streaming-checkpoint contract): magic+version
    tag, then k, vmin, vmax, level count, then per level a length +
    raw float64 bytes."""
    import struct

    parts = [
        _KLL_MAGIC,
        struct.pack("<qddq", sk.k, sk.vmin, sk.vmax, len(sk.levels)),
    ]
    for buf in sk.levels:
        b = np.ascontiguousarray(buf, dtype=np.float64).tobytes()
        parts.append(struct.pack("<q", len(buf)))
        parts.append(b)
    return b"".join(parts)


def kll_from_bytes(raw: bytes) -> KLL:
    """Inverse of :func:`kll_to_bytes`. Rejects unknown versions and
    trailing junk loudly instead of reinterpreting bytes."""
    import struct

    if raw[:4] != _KLL_MAGIC:
        raise ValueError(
            "kll_from_bytes: bad magic/version "
            f"{raw[:4]!r} (expected {_KLL_MAGIC!r}) — checkpoint written "
            "by an incompatible sketch layout"
        )
    k, vmin, vmax, nlev = struct.unpack_from("<qddq", raw, 4)
    off = 4 + struct.calcsize("<qddq")
    sk = KLL(int(k))
    sk.vmin, sk.vmax = float(vmin), float(vmax)
    levels = []
    for _ in range(int(nlev)):
        (ln,) = struct.unpack_from("<q", raw, off)
        off += 8
        levels.append(
            np.frombuffer(raw, dtype=np.float64, count=int(ln), offset=off
                          ).copy()
        )
        off += int(ln) * 8
    if off != len(raw):
        raise ValueError(
            f"kll_from_bytes: {len(raw) - off} trailing bytes — "
            "corrupt or layout-drifted checkpoint"
        )
    sk.levels = levels if levels else [np.empty(0, dtype=np.float64)]
    return sk

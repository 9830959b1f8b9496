"""Partitioned Bloom-filter pre-filter for the URL seen-set
(north_rule: "URL-seen dedup via partitioned Bloom/cuckoo filters built
per host-hash partition ... dedup applied in vectorized Arrow UDFs,
never per-row Python").

Role in the dedup pipeline (SURVEY.md §2.5): the Bloom filter is a
PRE-filter, never the decider —

    candidate links ──bloom──► "definitely new"   → skip the join
                         └───► "possibly seen"    → exact anti-join

A Bloom negative is authoritative (no false negatives), a positive is
confirmed by the exact anti-join against the seen table, so the combined
operator is EXACTLY the anti-join (property-tested), while the shuffle
only carries the possibly-seen minority. At a 10^10-row seen-set the
anti-join shuffle is the round bottleneck; with double-hashed k=4 probes
and ~10 bits/key the pre-filter drops ~99% of genuinely-new links out of
it.

Mechanics: keys are the engine's 64-bit url_hash column (no re-hashing
of strings); probe i uses double hashing h1 + i*h2 with
h2 = splitmix64(h1) — all numpy uint64 vector ops inside mapInPandas
(Arrow batches in, boolean mask out; zero per-row Python). Bitmaps are
bucketed by host_hash % n_buckets, built/merged distributedly with
applyInPandas, then broadcast; per-bucket bitmaps persist to the round
snapshot for resume.

Why Bloom and not cuckoo (the north rule offers either): a cuckoo
filter's two advantages are deletion and slightly better bits/key at
low FPP — and BOTH are worthless here. The seen-set is append-only by
engine invariant (a url never re-enters the frontier; CLAUDE.md), so
deletion support buys nothing; and the delta-log state design needs
filters that MERGE — Bloom bitmaps union with a plain bitwise OR
(exactly how per-round deltas fold into the snapshot filter, see
``update_bitmaps``), while merging two cuckoo tables re-inserts every
fingerprint and can FAIL on overflow, which would make the
compaction path fallible. A pre-filter whose merge can't fail beats
one that saves ~1 bit/key.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPLITMIX_1 = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public-domain splitmix64 constants)."""
    z = (x + _SPLITMIX_1).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(30))) * _SPLITMIX_2).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(27))) * _SPLITMIX_3).astype(np.uint64)
    return (z ^ (z >> np.uint64(31))).astype(np.uint64)


class BloomConfig:
    def __init__(self, n_buckets: int = 64, bits_per_bucket: int = 1 << 20, n_hashes: int = 4):
        self.n_buckets = n_buckets
        self.bits_per_bucket = bits_per_bucket  # power of two keeps % cheap
        self.n_hashes = n_hashes

    @property
    def bytes_per_bucket(self) -> int:
        return self.bits_per_bucket // 8


def _probe_positions(url_hash: np.ndarray, cfg: BloomConfig) -> list[np.ndarray]:
    h1 = url_hash.astype(np.uint64)
    h2 = _splitmix64(h1) | np.uint64(1)  # odd -> full-period double hashing
    m = np.uint64(cfg.bits_per_bucket)
    return [((h1 + np.uint64(i) * h2) % m).astype(np.uint64) for i in range(cfg.n_hashes)]


def _set_bits(bitmap: np.ndarray, url_hash: np.ndarray, cfg: BloomConfig) -> None:
    for pos in _probe_positions(url_hash, cfg):
        np.bitwise_or.at(bitmap, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))


def _test_bits(bitmap: np.ndarray, url_hash: np.ndarray, cfg: BloomConfig) -> np.ndarray:
    """True where ALL probes hit (possibly seen)."""
    hit = np.ones(len(url_hash), dtype=bool)
    for pos in _probe_positions(url_hash, cfg):
        byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
        bit = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
        hit &= (byte & bit) != 0
    return hit


def build_bitmaps(seen_df: DataFrame, cfg: BloomConfig) -> dict[int, bytes]:
    """Distributed build: one bitmap per host_hash bucket via
    applyInPandas (each bucket's keys aggregate on its own executor),
    collected as (bucket, bytes) rows — n_buckets rows total."""

    schema = T.StructType(
        [T.StructField("bucket", T.IntegerType()), T.StructField("bits", T.BinaryType())]
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(cfg.bytes_per_bucket, dtype=np.uint8)
        _set_bits(bitmap, pdf["url_hash"].to_numpy().astype(np.uint64), cfg)
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iat[0])], "bits": [bitmap.tobytes()]})

    rows = (
        seen_df.select(
            F.pmod(F.col("host_hash"), F.lit(cfg.n_buckets)).cast("int").alias("bucket"),
            F.col("url_hash"),
        )
        .groupBy("bucket")
        .applyInPandas(build, schema)
        .collect()
    )
    return {r.bucket: r.bits for r in rows}


def update_bitmaps(
    bitmaps: dict[int, bytes], new_df: DataFrame, cfg: BloomConfig
) -> dict[int, bytes]:
    """OR-merge the bitmaps of a (bounded) batch of new keys."""
    delta = build_bitmaps(new_df, cfg)
    out = dict(bitmaps)
    for b, bits in delta.items():
        if b in out:
            merged = np.frombuffer(out[b], dtype=np.uint8) | np.frombuffer(bits, dtype=np.uint8)
            out[b] = merged.tobytes()
        else:
            out[b] = bits
    return out


def split_by_bloom(
    links_df: DataFrame,
    bitmaps: dict[int, bytes],
    cfg: BloomConfig,
    spark: SparkSession,
):
    """Tag candidate links: possibly_seen=False rows are DEFINITELY new
    (bypass the anti-join); True rows need the exact check.

    One mapInPandas pass, numpy-vectorized; the bitmap dict rides a
    Spark broadcast (n_buckets × bits/8 bytes, ~8 MB at defaults).
    """
    bc = spark.sparkContext.broadcast(bitmaps)
    fields = links_df.schema.fields
    out_schema = T.StructType(fields + [T.StructField("possibly_seen", T.BooleanType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        maps = bc.value
        for pdf in batches:
            uh = pdf["url_hash"].to_numpy().astype(np.uint64)
            bucket = (pdf["host_hash"].to_numpy().astype(np.int64) % cfg.n_buckets + cfg.n_buckets) % cfg.n_buckets
            seen = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(bucket):
                bits = maps.get(int(b))
                if bits is None:
                    continue
                mask = bucket == b
                bitmap = np.frombuffer(bits, dtype=np.uint8)
                seen[mask] = _test_bits(bitmap, uh[mask], cfg)
            out = pdf.copy()
            out["possibly_seen"] = seen
            yield out

    tagged = links_df.mapInPandas(fn, out_schema)
    return tagged


def save_bitmaps(bitmaps: dict[int, bytes], path: str) -> None:
    np.savez(path, **{str(k): np.frombuffer(v, dtype=np.uint8) for k, v in bitmaps.items()})


def load_bitmaps(path: str) -> dict[int, bytes]:
    with np.load(path) as z:
        return {int(k): z[k].tobytes() for k in z.files}

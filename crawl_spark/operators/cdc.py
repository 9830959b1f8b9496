"""Content-defined chunking (CDC) dedup — gear-hash rolling boundaries.

The byte-level dedup family member that survives INSERTIONS: fixed-size
blocks (``dedup.block_dedup``'s byte analog) lose all alignment after one
inserted byte, while CDC cuts wherever the content itself says to, so an
edited document still shares every chunk outside the edit window. This is
the storage/web-corpus dedup technique of Xia et al., "FastCDC: a Fast
and Efficient Content-Defined Chunking Approach for Data Deduplication"
(USENIX ATC'16 — public paper); implemented here as the single-mask gear
variant (the paper's normalized two-mask refinement changes chunk-size
spread, not the mechanism).

Contract (shared bit-for-bit by the Spark path and the pure-Python twin
the tests pin against):

- gear table: ``gear[b] = first 8 bytes (big-endian) of md5(b"gear-%d")``
  — deterministic, no RNG (same reproducibility rule as the module's
  md5-parity LSH planes).
- rolling hash: ``h_i = (h_{i-1} << 1 + gear[byte_i]) mod 2^64``. The
  shift means ``h_i`` depends on only the last 64 bytes — a sliding
  window by construction, so the hash NEVER needs resetting at chunk
  boundaries and the whole sequence vectorizes as a 64-term shifted
  convolution (numpy uint64, Arrow batches via mapInPandas — zero
  per-byte Python on the Spark path).
- cut after byte i when the current chunk has >= min_size bytes and
  ``h_i & (avg_size - 1) == 0``; force a cut at max_size; the final
  partial chunk is kept. ``min_size`` must be >= 64 so a judged
  position's window never reaches back across the previous cut (this is
  what makes the no-reset contract equal to FastCDC's reset-per-chunk
  hash at every judged position).

Scale shape (100 TB): chunking is embarrassingly parallel per document
(one mapInPandas projection, no shuffle); the only corpus-wide exchange
is ONE partial-aggregated groupBy on the 16-byte chunk digest — the same
single-shuffle shape as exact_dedup/block_dedup. Chunk boundaries of one
doc never depend on another doc.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

M64 = (1 << 64) - 1

_GEAR_NP = None


def gear_table() -> list[int]:
    """The deterministic 256-entry gear table (see module docstring)."""
    import hashlib

    return [
        int.from_bytes(hashlib.md5(b"gear-%d" % i).digest()[:8], "big")
        for i in range(256)
    ]


def _gear_np():
    global _GEAR_NP
    if _GEAR_NP is None:
        import numpy as np

        _GEAR_NP = np.array(gear_table(), dtype=np.uint64)
    return _GEAR_NP


def cdc_cuts_py(
    data: bytes, min_size: int = 64, avg_size: int = 256, max_size: int = 1024
) -> list[int]:
    """Pure-Python per-byte twin (the TEST ORACLE — intentionally the
    naive loop form of the contract; the Spark path must reproduce it
    bit-for-bit). Returns the cut positions (exclusive chunk ends)."""
    gear = gear_table()
    h, cuts, start = 0, [], 0
    mask = avg_size - 1
    for i, b in enumerate(data):
        h = ((h << 1) + gear[b]) & M64
        if (i - start + 1 >= min_size and (h & mask) == 0) or (
            i - start + 1 == max_size
        ):
            cuts.append(i + 1)
            start = i + 1
    if start < len(data):
        cuts.append(len(data))
    return cuts


def _cdc_cuts_np(data: bytes, min_size: int, avg_size: int, max_size: int):
    """Vectorized twin of :func:`cdc_cuts_py`: the windowed gear hash as
    a 64-term shifted convolution, then a sequential walk over the
    SPARSE candidate set (~n/avg_size positions) + forced max_size cuts.
    """
    import numpy as np

    n = len(data)
    if n == 0:
        return []
    arr = np.frombuffer(data, dtype=np.uint8)
    g = _gear_np()[arr]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(min(64, n)):
        h[k:] += g[: n - k] << np.uint64(k)
    cand = np.nonzero((h & np.uint64(avg_size - 1)) == 0)[0]
    cuts, start, ci = [], 0, 0
    while start < n:
        forced = min(start + max_size, n)
        while ci < len(cand) and cand[ci] + 1 < start + min_size:
            ci += 1
        if ci < len(cand) and cand[ci] + 1 <= forced:
            cut = int(cand[ci]) + 1
            ci += 1
        else:
            cut = forced
        cuts.append(cut)
        start = cut
    return cuts


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
        T.StructField("chunk_md5", T.StringType()),
    ]
)


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> DataFrame:
    """One row per content-defined chunk: (doc_id, chunk_idx, offset,
    length, chunk_md5) over the UTF-8 bytes of ``text_col``. Pure
    projection (mapInPandas, Arrow batches, numpy-vectorized hash) — no
    shuffle; empty docs produce no rows (mirrors ``block_dedup``).
    """
    if min_size < 64:
        raise ValueError(
            "cdc_chunks: min_size must be >= 64 (the gear window) so the "
            "no-reset rolling hash equals the per-chunk-reset contract"
        )
    if avg_size & (avg_size - 1):
        raise ValueError("cdc_chunks: avg_size must be a power of two")
    if not min_size <= avg_size <= max_size:
        raise ValueError("cdc_chunks: need min_size <= avg_size <= max_size")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, offs, lens, digs = [], [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                data = (txt or "").encode("utf-8")
                prev = 0
                for j, cut in enumerate(
                    _cdc_cuts_np(data, min_size, avg_size, max_size)
                ):
                    ids.append(int(did))
                    idxs.append(j)
                    offs.append(prev)
                    lens.append(cut - prev)
                    digs.append(hashlib.md5(data[prev:cut]).hexdigest())
                    prev = cut
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "length": pd.Series(lens, dtype="int64"),
                    "chunk_md5": pd.Series(digs, dtype="object"),
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(fn, CHUNK_SCHEMA)


def cdc_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> DataFrame:
    """Corpus-wide CDC dedup accounting: keep the FIRST occurrence of
    each chunk digest (ordered by (doc_id, chunk_idx) — deterministic
    first-writer-wins, the same rule as ``block_dedup``) and emit per-doc
    (n_chunks, n_kept, bytes_total, bytes_kept, kept_ratio).

    ONE corpus shuffle: min(struct(doc_id, chunk_idx, length)) partial-
    aggregated groupBy on the digest (a boilerplate chunk repeated
    across the corpus combines map-side — no hot-key funnel), then a
    second bounded groupBy on doc_id for the survivor counts.
    kept_ratio is 6dp (float contract).
    """
    chunks = cdc_chunks(df, id_col, text_col, min_size, avg_size, max_size)
    chunks = chunks.localCheckpoint(eager=False)  # feeds totals AND dedup
    first = chunks.groupBy("chunk_md5").agg(
        F.min(F.struct("doc_id", "chunk_idx", "length")).alias("__first")
    )
    kept = first.groupBy(F.col("__first.doc_id").alias("doc_id")).agg(
        F.count("*").alias("n_kept"),
        F.sum("__first.length").alias("bytes_kept"),
    )
    totals = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"), F.sum("length").alias("bytes_total")
    )
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        "bytes_total",
        F.coalesce(F.col("bytes_kept"), F.lit(0)).alias("bytes_kept"),
        F.round(
            F.coalesce(F.col("n_kept"), F.lit(0)) / F.col("n_chunks"), 6
        ).alias("kept_ratio"),
    )

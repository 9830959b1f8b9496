"""Mergeable Misra-Gries frequent-items summary (Misra & Gries 1982;
mergeability per Agarwal et al., PODS'12) — the frequency arm of the
sketch family (KLL = quantiles, HLL = cardinality, MG = heavy hitters).

Why it exists: "which hosts dominate the crawl?" asked over ALL history
is a full groupBy of the key column per question — fine once, wrong as
a per-round re-ask at 10^10 urls when the distinct-key set itself is
the shuffle. The MG summary is ≤ k counters per stratum with a PROVEN
deterministic error interval: for every item,
``est ≤ true ≤ est + err`` with ``err ≤ n/(k+1)``, and any item whose
true count exceeds ``err`` is guaranteed PRESENT. Like the seen/HLL
delta logs, summaries persist per round and merge.

Design (the repo's determinism discipline, applied like KLL's):

* Per partition, the summary is built by folding each Arrow batch's
  EXACT pandas counts into the running summary with the MG merge rule
  (sum counters; while > k entries, subtract the (k+1)-th largest
  count d from all, drop ≤ 0, and add d to the summary's tracked
  ``err``). Exact batch counts are themselves error-0 MG summaries,
  so the fold preserves the MG invariant (Agarwal et al. Thm 1).
* The cross-partition merge is ONE-SHOT and order-independent: sum
  ALL partial counters exactly (a commutative union), then truncate
  ONCE — so the merged output does not depend on the fold order at
  all; only the per-partition stage is layout-bound (same files +
  same split config → same output bit for bit, the KLL contract).
* ``err`` is tracked EXACTLY per summary (the sum of every d ever
  subtracted + dropped-entry ceilings share the same bound), so the
  output carries its own per-stratum certainty interval instead of a
  paper bound the reader must trust.

Exactness escape hatch (the KLL trick): a summary that never truncated
(≤ k distinct items per partition and ≤ k after the union) holds EXACT
counts with err = 0 — plain SQL ``GROUP BY item`` replays it bit for
bit, which is the contract query's regime (``require_exact=True``
turns silent drift into a named failure); the truncating regime is
bound-checked in pytest.

Plan shape at 100 TB: one mapInPandas pass over the scan emitting
≤ P·k counter rows per stratum (the raw key column never shuffles —
only surviving counters do), then ONE dimension-sized
groupBy(strata) applyInPandas merge whose input is ≤ P·k rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["mg_fold", "mg_merge_counts", "mg_topk", "mg_topk_oracle_sql"]


def mg_fold(
    counters: dict, err: int, batch_counts: dict, k: int
) -> tuple[dict, int]:
    """Fold one EXACT count dict into an MG summary of ≤ k counters.
    Returns the new (counters, err). Deterministic: ties in the
    truncation cut are resolved by the value of the cut itself (every
    counter ≤ d is dropped), never by item order."""
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        vals = sorted(counters.values(), reverse=True)
        d = vals[k]  # the (k+1)-th largest
        counters = {i: c - d for i, c in counters.items() if c > d}
        err += d
    return counters, err


def mg_merge_counts(parts: list[tuple[dict, int]], k: int) -> tuple[dict, int]:
    """ONE-SHOT merge of partial summaries: exact commutative union sum,
    then a single truncation — order-independent by construction."""
    total: dict = {}
    err = 0
    for counters, e in parts:
        err += int(e)
        for item, c in counters.items():
            total[item] = total.get(item, 0) + int(c)
    if len(total) > k:
        vals = sorted(total.values(), reverse=True)
        d = vals[k]
        total = {i: c - d for i, c in total.items() if c > d}
        err += d
    return total, err


def mg_topk(
    df: DataFrame,
    item_col: str = "host",
    strata: tuple[str, ...] = (),
    k: int = 4096,
    require_exact: bool = False,
) -> DataFrame:
    """Per-stratum Misra-Gries frequent items:
    ``(*strata, item, est_count, err)`` — at most k rows per stratum,
    ``est_count ≤ true ≤ est_count + err`` for present items, any item
    with true count > err guaranteed present, absent items have true
    ≤ err. NULL items are dropped.

    ``require_exact=True`` raises in the merge task if ANY truncation
    happened (per-partition or at the union) — for callers whose
    correctness depends on exact counts (the oracle-checked contract
    query), so a silent drift into approximation becomes a named
    failure instead of a hash mismatch.
    """
    if k <= 0:
        raise ValueError("mg_topk: k must be positive")
    names = {f.name for f in df.schema.fields}
    for c in (item_col, *strata):
        if c not in names:
            raise ValueError(f"mg_topk: column not in df: {c}")
    sfields = [f for f in df.schema.fields if f.name in strata]
    part_schema = T.StructType(
        list(sfields)
        + [
            T.StructField("__pid", T.IntegerType()),
            T.StructField("item", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("err", T.LongType()),
        ]
    )
    out_schema = T.StructType(
        list(sfields)
        + [
            T.StructField("item", T.StringType()),
            T.StructField("est_count", T.LongType()),
            T.StructField("err", T.LongType()),
        ]
    )
    scols = list(strata)
    kk = int(k)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one MG summary per (partition, stratum); the raw item column
        # dies here — only surviving counters leave the task
        state: dict = {}  # strata-key -> (counters, err)
        pid = None
        for pdf in batches:
            if pid is None:
                # TaskContext is available inside the task
                from pyspark import TaskContext

                ctx = TaskContext.get()
                pid = ctx.partitionId() if ctx is not None else 0
            pdf = pdf[pdf["__item"].notna()]
            if len(pdf) == 0:
                continue
            grouped = (
                # dropna=False: a NULL stratum is a real group (the SQL
                # twin's GROUP BY keeps it) — pandas' default drops it
                pdf.groupby(scols, sort=False, dropna=False)["__item"]
                if scols
                else {(): pdf["__item"]}
            )
            items = grouped.items() if not scols else grouped
            for key, series in items:
                if scols and not isinstance(key, tuple):
                    key = (key,)
                counters, e = state.get(key, ({}, 0))
                state[key] = mg_fold(
                    counters, e, series.value_counts().to_dict(), kk
                )
        rows = []
        for key, (counters, e) in state.items():
            # marker row (item NULL, cnt 0) ALWAYS ships the summary's
            # err: a truncation that empties the counter set must still
            # deliver its error mass to the merge, or the published
            # bound understates and require_exact falsely passes
            rows.append((*key, pid or 0, None, 0, int(e)))
            for item, c in counters.items():
                rows.append((*key, pid or 0, str(item), int(c), int(e)))
        cols = scols + ["__pid", "item", "cnt", "err"]
        yield pd.DataFrame(rows, columns=cols)

    def merge(key, pdf):
        parts = []
        for pid, g in pdf.groupby("__pid", sort=True):
            e = int(g["err"].iloc[0])
            real = g[g["item"].notna()]
            parts.append((dict(zip(real["item"], real["cnt"])), e))
        counters, err = mg_merge_counts(parts, kk)
        if require_exact and err != 0:
            raise ValueError(
                "mg_topk(require_exact=True): summary truncated "
                f"(err={err}) — counts are no longer exact"
            )
        items = sorted(counters.items())
        if not items and err > 0:
            # every counter was evicted: the interval information
            # ("any absent item has true <= err") must still reach the
            # caller — one NULL-item row carries it
            return pd.DataFrame(
                [(*key, None, 0, int(err))],
                columns=scols + ["item", "est_count", "err"],
            )
        return pd.DataFrame(
            [(*key, item, int(c), int(err)) for item, c in items],
            columns=scols + ["item", "est_count", "err"],
        )

    base = df.select(
        *scols, F.col(item_col).cast("string").alias("__item")
    )
    partial = base.mapInPandas(partials, part_schema)
    if scols:
        return partial.groupBy(*scols).applyInPandas(merge, out_schema)
    # global: single group keyed by a constant
    return (
        partial.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(lambda key, pdf: merge((), pdf), out_schema)
    )


def mg_topk_oracle_sql(
    inner_sql: str,
    item_col: str = "host",
    strata: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`mg_topk` in the EXACT (untruncated) regime:
    plain per-stratum counts with err = 0. Valid whenever every
    (partition, stratum) holds ≤ k distinct items and the union does
    too — guarded Spark-side by ``require_exact``; the truncating
    regime has no SQL twin and is bound-checked in pytest.

    The cast to VARCHAR happens BEFORE the GROUP BY (in a subquery),
    matching the Spark side's cast-then-count: raw values that are
    SQL-equal but stringify differently (-0.0 vs 0.0 doubles) must
    count as the distinct string items the operator emits."""
    scp = (", ".join(strata) + ",") if strata else ""
    gb = f"GROUP BY {scp} item".rstrip(",")
    return f"""
WITH x AS ({inner_sql}),
i AS (
  SELECT {scp} CAST({item_col} AS VARCHAR) AS item
  FROM x WHERE {item_col} IS NOT NULL
)
SELECT {scp} item,
       COUNT(*) AS est_count,
       CAST(0 AS BIGINT) AS err
FROM i
{gb}
"""

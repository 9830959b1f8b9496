"""Fetch-telemetry sequence analytics: sessionization and error streaks.

The reference engine emits a flat event stream (counters + error stream,
`crawler.go:134-136`; the repo's engine mirrors it as the `errors` table
and per-round counters). Operating a crawl needs the SEQUENCE view of
that stream per entity (host/worker/user): contiguous activity sessions
(gap-based sessionization — the standard telemetry reduction) and
consecutive-error streaks (the input to a backoff/circuit-breaker
policy: N failures in a row → cool the host down).

Both operators are one-shuffle-on-entity shapes: the stream is hashed
once by the entity column, every window below is per-entity and bounded
by that entity's event count. That is the right contract for fetch
telemetry, where entities are hosts (10^7-ish) and per-host event
counts are moderate; a single mega-entity (one host = half the stream)
would make its window a hot task — the same trade the engine's
politeness path solves with hot-host routing (`topk.grouped_topk`),
which applies here unchanged if needed.

Timestamps are compared in exact integer MICROSECONDS (`unix_micros` /
DuckDB `epoch_us`) — no float time math, so session boundaries are
engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ts_us(col: F.Column) -> F.Column:
    """Exact epoch microseconds of a timestamp column (parquet NTZ reads
    cast through session-UTC timestamp first)."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: consecutive events of one entity belong
    to the same session while the inter-event gap is <= ``gap_s``
    seconds; a larger gap starts a new session.

    Returns one row per (entity, session): ``(entity, session_idx,
    n_events, start_us, end_us, duration_us)`` with ``session_idx``
    1-based in time order and timestamps in exact epoch microseconds.

    Shape: ONE shuffle on entity; the lag and the running-sum session
    counter are per-entity windows bounded by that entity's event
    count. Ties on ts break by a second deterministic order column if
    the input carries duplicate timestamps — pass a pre-sorted unique
    key via the ts column itself being unique (the events fixture's ts
    is), or dedup upstream.
    """
    us = _ts_us(F.col(ts_col))
    wo = Window.partitionBy("entity").orderBy("__us")
    base = events.select(F.col(entity_col).alias("entity"), us.alias("__us"))
    flagged = base.withColumn("__prev", F.lag("__us").over(wo)).withColumn(
        "__new",
        (
            F.col("__prev").isNull()
            | (F.col("__us") - F.col("__prev") > F.lit(gap_s * 1_000_000))
        ).cast("int"),
    )
    sessions = flagged.withColumn(
        "session_idx",
        F.sum("__new").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessions.groupBy("entity", "session_idx")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("__us").alias("start_us"),
            F.max("__us").alias("end_us"),
        )
        .select(
            "entity",
            F.col("session_idx").cast("int").alias("session_idx"),
            "n_events",
            "start_us",
            "end_us",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        )
    )


def error_streaks(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    error_value: str = "error",
) -> DataFrame:
    """Consecutive-error streak profile per entity — the backoff input:
    ``(entity, n_events, n_errors, n_streaks, max_streak,
    ends_in_streak)`` where a streak is a maximal run of consecutive
    ``error_value`` events in time order, ``max_streak`` its longest
    length (0 when the entity never errored) and ``ends_in_streak``
    whether the LAST event is an error (the host is currently failing —
    the circuit-breaker trigger).

    Gaps-and-islands on (row_number − per-type row_number), all windows
    per-entity bounded; one shuffle on entity.
    """
    us = _ts_us(F.col(ts_col))
    base = events.select(
        F.col(entity_col).alias("entity"),
        us.alias("__us"),
        (F.col(type_col) == error_value).cast("int").alias("__err"),
    )
    w_all = Window.partitionBy("entity").orderBy("__us")
    w_err = Window.partitionBy("entity", "__err").orderBy("__us")
    grp = base.withColumn(
        "__isl", F.row_number().over(w_all) - F.row_number().over(w_err)
    ).withColumn(
        "__last",
        (F.col("__us") == F.max("__us").over(Window.partitionBy("entity")))
        .cast("int"),
    )
    streaks = (
        grp.filter(F.col("__err") == 1)
        .groupBy("entity", "__isl")
        .agg(F.count("*").cast("long").alias("len"))
        .groupBy("entity")
        .agg(
            F.count("*").cast("long").alias("n_streaks"),
            F.max("len").alias("max_streak"),
        )
    )
    totals = grp.groupBy("entity").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("__err").cast("long").alias("n_errors"),
        F.max(F.when(F.col("__last") == 1, F.col("__err"))).alias("__tail_err"),
    )
    return totals.join(streaks, "entity", "left").select(
        "entity",
        "n_events",
        "n_errors",
        F.coalesce("n_streaks", F.lit(0)).cast("long").alias("n_streaks"),
        F.coalesce("max_streak", F.lit(0)).cast("long").alias("max_streak"),
        (F.col("__tail_err") == 1).alias("ends_in_streak"),
    )

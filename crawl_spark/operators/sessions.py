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
        # NULL event_type counts as NOT-error (the oracle's CASE..ELSE
        # 0) — a bare ==cast would yield NULL and skew sum/partitioning
        F.when(F.col(type_col) == error_value, F.lit(1))
        .otherwise(F.lit(0))
        .alias("__err"),
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


def host_policy(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    latency_col: str = "value",
    error_value: str = "error",
    robots: DataFrame | None = None,
    base_delay_ms: int = 1000,
    max_backoff_pow: int = 6,
    max_concurrency: int = 8,
) -> DataFrame:
    """Adaptive per-host politeness policy from measured fetch
    telemetry — the controller that closes the loop between the
    telemetry analytics (:func:`error_streaks`, latency percentiles)
    and the engine's politeness scheduler (whose budgets/delays are
    inputs, `plans/engine.py`): feed a telemetry window in, get the
    next epoch's per-host (delay, concurrency) recommendation out.

    Per entity: ``(entity, n_events, n_errors, err_rate,
    trailing_streak, p95_latency, delay_ms, concurrency)`` where

    * ``trailing_streak`` = consecutive errors at the END of the stream
      (the circuit-breaker state, sharper than :func:`error_streaks`'s
      boolean: its length drives the backoff exponent);
    * ``delay_ms`` = max of the robots crawl-delay (if a ``robots``
      frame ``(entity, robots_delay_ms)`` is given — broadcast,
      dimension-sized), the crawler's ``base_delay_ms`` floor, and —
      while failing — exponential backoff
      ``base_delay_ms · 2^min(trailing_streak, max_backoff_pow)``.
      All integer math; the robots term is coalesced to 0 explicitly
      because Spark's ``greatest`` SKIPS nulls rather than propagating
      them (the repo's null-extremum rule);
    * ``concurrency`` = 1 while failing or when the error rate
      exceeds 1/2 (AIMD's multiplicative decrease), else scaled so the
      host sees roughly one request in flight per second of measured
      p95 latency: ``min(max_concurrency, max(1, floor(1000 /
      max(p95_latency, 1))))`` — additive headroom only when the host
      is fast AND healthy.

    p95 is Spark's exact ``percentile`` ≡ DuckDB ``quantile_cont``
    (bit-identical (n-1)p interpolation, the `score_quantiles` pairing)
    so the whole policy row hash-matches cross-engine. Shape: ONE
    shuffle on entity; the trailing-streak window is per-entity
    bounded; at 100 TB the percentile's value buffering follows
    `score_quantiles`' documented sample-first contract.
    """
    us = _ts_us(F.col(ts_col))
    base = events.select(
        F.col(entity_col).alias("entity"),
        us.alias("__us"),
        # when/otherwise, not a bare ==cast: a NULL event_type must
        # count as NOT-error (the oracle's CASE..ELSE 0), not as NULL
        # (which sum/max would skip, drifting the trailing streak)
        F.when(F.col(type_col) == error_value, F.lit(1))
        .otherwise(F.lit(0))
        .alias("__err"),
        F.col(latency_col).cast("double").alias("__lat"),
    )
    # same-microsecond ties order ok-before-error on BOTH engines — a
    # deterministic, conservative read (the error counts as trailing);
    # ties within one type are rank-order-irrelevant to the aggregate
    w_all = Window.partitionBy("entity").orderBy("__us", "__err")
    rn = base.withColumn("__rn", F.row_number().over(w_all))
    agg = rn.groupBy("entity").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("__err").cast("long").alias("n_errors"),
        F.max(F.when(F.col("__err") == 0, F.col("__rn"))).alias("__last_ok"),
        F.percentile(F.col("__lat"), F.lit(0.95)).alias("__p95"),
    )
    trailing = (
        F.col("n_events") - F.coalesce(F.col("__last_ok"), F.lit(0))
    ).cast("long")
    out = agg.select(
        "entity",
        "n_events",
        "n_errors",
        F.round(
            F.col("n_errors").cast("double") / F.col("n_events").cast("double"),
            6,
        ).alias("err_rate"),
        trailing.alias("trailing_streak"),
        F.round(F.coalesce(F.col("__p95"), F.lit(1.0)), 6).alias(
            "p95_latency"
        ),
        F.coalesce(F.col("__p95"), F.lit(1.0)).alias("__p95f"),
    )
    if robots is not None:
        out = out.join(
            F.broadcast(
                robots.select(
                    F.col("entity"),
                    F.col("robots_delay_ms").cast("long").alias("__rdel"),
                )
            ),
            "entity",
            "left",
        )
    else:
        out = out.withColumn("__rdel", F.lit(None).cast("long"))
    failing = F.col("trailing_streak") > 0
    backoff = (
        F.lit(base_delay_ms)
        * F.pow(
            F.lit(2.0),
            F.least(F.col("trailing_streak"), F.lit(max_backoff_pow)),
        ).cast("long")
    ).cast("long")
    delay = F.greatest(
        F.coalesce(F.col("__rdel"), F.lit(0)).cast("long"),
        F.lit(base_delay_ms).cast("long"),
        F.when(failing, backoff).otherwise(F.lit(0)).cast("long"),
    )
    conc = (
        F.when(failing | (F.col("err_rate") > 0.5), F.lit(1))
        .otherwise(
            F.least(
                F.lit(max_concurrency).cast("long"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.floor(
                        F.lit(1000.0) / F.greatest(F.col("__p95f"), F.lit(1.0))
                    ),
                ),
            )
        )
        .cast("int")
    )
    return out.select(
        "entity",
        "n_events",
        "n_errors",
        "err_rate",
        "trailing_streak",
        "p95_latency",
        delay.alias("delay_ms"),
        conc.alias("concurrency"),
    )


def host_policy_oracle_sql(
    inner_sql: str,
    robots_sql: str | None = None,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    latency_col: str = "value",
    error_value: str = "error",
    base_delay_ms: int = 1000,
    max_backoff_pow: int = 6,
    max_concurrency: int = 8,
) -> str:
    """DuckDB twin of :func:`host_policy`: same row_number trailing
    streak, ``quantile_cont`` p95 (≡ Spark exact percentile), same
    integer backoff/greatest/floor arithmetic."""
    robots_cte = (
        f"rob AS ({robots_sql}),"
        if robots_sql is not None
        else "rob AS (SELECT NULL AS entity, NULL AS robots_delay_ms WHERE 1=0),"
    )
    return f"""
WITH x AS ({inner_sql}),
b AS (
  SELECT {entity_col} AS entity, epoch_us(CAST({ts_col} AS TIMESTAMP)) AS us,
         CASE WHEN {type_col} = '{error_value}' THEN 1 ELSE 0 END AS err,
         CAST({latency_col} AS DOUBLE) AS lat
  FROM x
),
rn AS (
  SELECT *, row_number() OVER (PARTITION BY entity ORDER BY us, err) AS rnum
  FROM b
),
agg AS (
  SELECT entity, COUNT(*) AS n_events, SUM(err) AS n_errors,
         MAX(CASE WHEN err = 0 THEN rnum END) AS last_ok,
         quantile_cont(lat, 0.95) AS p95
  FROM rn GROUP BY entity
),
{robots_cte}
pol AS (
  SELECT a.entity, a.n_events, a.n_errors,
         round(CAST(a.n_errors AS DOUBLE) / CAST(a.n_events AS DOUBLE), 6)
           AS err_rate,
         a.n_events - COALESCE(a.last_ok, 0) AS trail,
         COALESCE(a.p95, 1.0) AS p95f,
         COALESCE(r.robots_delay_ms, 0) AS rdel
  FROM agg a LEFT JOIN rob r ON a.entity = r.entity
)
SELECT entity,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_errors AS BIGINT) AS n_errors,
       err_rate,
       CAST(trail AS BIGINT) AS trailing_streak,
       round(p95f, 6) AS p95_latency,
       CAST(GREATEST(
         CAST(rdel AS BIGINT),
         CAST({base_delay_ms} AS BIGINT),
         CASE WHEN trail > 0
              THEN {base_delay_ms} * CAST(POWER(2.0,
                     LEAST(trail, {max_backoff_pow})) AS BIGINT)
              ELSE 0 END
       ) AS BIGINT) AS delay_ms,
       CAST(CASE WHEN trail > 0 OR err_rate > 0.5 THEN 1
            ELSE LEAST(CAST({max_concurrency} AS BIGINT),
                       GREATEST(CAST(1 AS BIGINT),
                                CAST(FLOOR(1000.0 / GREATEST(p95f, 1.0))
                                     AS BIGINT)))
            END AS INTEGER) AS concurrency
FROM pol
"""

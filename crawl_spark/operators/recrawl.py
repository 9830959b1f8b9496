"""Re-crawl (freshness) scheduling: when is a known URL due again?

The reference crawls each URL once (seen-set guarantees it; SURVEY.md
§2.5). A continuous deployment of the same engine re-enqueues pages on
a freshness schedule — the standard signal set is the sitemap protocol's
`changefreq`/`lastmod` (sources/sitemap.py) plus the crawler's own
last-fetch time. This operator turns those into a due time and a
priority boost the engine's FIFO key already understands, as pure
column expressions (one projection, no shuffle, no UDF — the scan IS
the operator at any scale).

Semantics (deterministic, `now` is an explicit parameter — nothing
reads the wall clock):

- interval_s: changefreq → seconds (always=60 … yearly=31536000);
  `never` and unknown/missing → NULL (never due by changefreq alone).
- due_ts = last_fetch_ts + interval_s (NULL interval → NULL).
- overdue_ratio = (now - last_fetch_ts) / interval_s, floored at 0 —
  1.0 means exactly one interval late; NULL interval → NULL.
- recrawl_priority = least(floor(overdue_ratio), cap) as an additive
  boost for the frontier's priority column: overdue pages climb the
  FIFO key one notch per missed interval, capped so a long-dead page
  can't starve fresh discoveries.

Integration note: the engine's seen-set invariant (a url never
re-enters the frontier within a run — the exactness contract of the
delta-log deletes, CLAUDE.md) is deliberately untouched. Re-crawl
output seeds a NEW crawl epoch (fresh workdir / seen set), with due
urls as the seed list and recrawl_priority folded into seed priority —
it is not a mid-run re-entry path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# sitemaps.org changefreq values → re-crawl interval in seconds
CHANGEFREQ_SECONDS = {
    "always": 60,
    "hourly": 3_600,
    "daily": 86_400,
    "weekly": 604_800,
    "monthly": 2_592_000,
    "yearly": 31_536_000,
}


def changefreq_interval(col: Column) -> Column:
    """Seconds for a changefreq value; NULL for never/unknown/missing."""
    expr = None
    for name, secs in CHANGEFREQ_SECONDS.items():
        cond = F.lower(col) == name
        expr = F.when(cond, secs) if expr is None else expr.when(cond, secs)
    return expr.otherwise(F.lit(None).cast("long"))


def recrawl_schedule(
    df: DataFrame,
    now_ts: int,
    url_col: str = "url",
    last_fetch_col: str = "last_fetch_ts",
    changefreq_col: str = "changefreq",
    priority_cap: int = 10,
) -> DataFrame:
    """(url, interval_s, due_ts, overdue_ratio, recrawl_priority) per
    input row. ``last_fetch_ts``/``now_ts`` are epoch seconds;
    overdue_ratio is rounded to 6 dp (repo float contract)."""
    interval = changefreq_interval(F.col(changefreq_col))
    # explicit NULL gate: Spark's greatest() SKIPS nulls (greatest(NULL,
    # 0.0) = 0.0), which would silently turn no-schedule (NULL interval)
    # or never-fetched (NULL last_fetch) rows into "maximally fresh"
    # instead of NULL
    overdue = F.when(
        interval.isNotNull() & F.col(last_fetch_col).isNotNull(),
        F.greatest(
            (F.lit(now_ts) - F.col(last_fetch_col)) / interval, F.lit(0.0)
        ),
    )
    return df.select(
        F.col(url_col).alias("url"),
        interval.alias("interval_s"),
        (F.col(last_fetch_col) + interval).alias("due_ts"),
        F.round(overdue, 6).alias("overdue_ratio"),
        # least() also skips nulls — gate again so no-schedule rows get
        # NULL priority, not the cap
        F.when(
            overdue.isNotNull(),
            F.least(F.floor(overdue), F.lit(priority_cap)),
        )
        .cast("long")
        .alias("recrawl_priority"),
    )


def host_budget(
    hosts: DataFrame,
    base_budget: int = 100,
    traps: DataFrame | None = None,
    reputation: DataFrame | None = None,
    priorities: DataFrame | None = None,
    boost: tuple[int, ...] = (4, 2),
    host_col: str = "host",
) -> DataFrame:
    """Per-host page budget for the next crawl epoch — the planning
    composition over the host-signal family: crawl traps get zero
    budget, reputation-dropped domains get zero budget, and
    high-centrality hosts get a multiplied allowance (tier 0 →
    ``boost[0]``×, tier 1 → ``boost[1]``×, deeper tiers → 1×). Feed
    the result into the engine's politeness budgets / `batch_cap`
    routing as a broadcast dimension.

    Inputs are the dimension-sized outputs of
    :func:`~crawl_spark.operators.urlfilter.trap_detect` (``host``,
    ``is_trap``), :func:`~crawl_spark.operators.sampling.
    domain_reputation` (``host_col``, ``keep``) and
    :func:`~crawl_spark.operators.graph.pr_priority` (``node``,
    ``priority``); any of them may be None (no signal = no
    restriction / no boost). All joins are broadcasts of
    dimension-sized frames onto the host dimension — O(hosts), no
    corpus access, no window.

    Emits (host, is_trap, keep, priority, budget) with
    ``budget = 0`` when trapped or dropped, else
    ``base_budget × boost[min(priority, len(boost))]`` (boost beyond
    the tuple = 1×). Deterministic integer arithmetic — the SQL twin
    replays it exactly.
    """
    if base_budget < 0:
        raise ValueError(f"base_budget must be >= 0, got {base_budget}")
    out = hosts.select(F.col(host_col).alias("host"))
    if traps is not None:
        out = out.join(
            F.broadcast(
                traps.select(F.col("host"), F.col("is_trap"))
            ),
            "host",
            "left",
        )
    else:
        out = out.withColumn("is_trap", F.lit(None).cast("boolean"))
    if reputation is not None:
        rep_host = "host" if "host" in reputation.columns else reputation.columns[0]
        out = out.join(
            F.broadcast(
                reputation.select(
                    F.col(rep_host).alias("host"), F.col("keep")
                )
            ),
            "host",
            "left",
        )
    else:
        out = out.withColumn("keep", F.lit(None).cast("boolean"))
    if priorities is not None:
        out = out.join(
            F.broadcast(
                priorities.select(
                    F.col("node").alias("host"), F.col("priority")
                )
            ),
            "host",
            "left",
        )
    else:
        out = out.withColumn("priority", F.lit(None).cast("int"))

    is_trap = F.coalesce(F.col("is_trap"), F.lit(False))
    keep = F.coalesce(F.col("keep"), F.lit(True))
    tier = F.coalesce(F.col("priority"), F.lit(len(boost)))
    mult = F.lit(1)
    for t in range(len(boost) - 1, -1, -1):
        mult = F.when(tier <= t, F.lit(int(boost[t]))).otherwise(mult)
    budget = (
        F.when(is_trap | ~keep, F.lit(0))
        .otherwise(F.lit(int(base_budget)) * mult)
        .cast("long")
    )
    return out.select(
        "host",
        is_trap.alias("is_trap"),
        keep.alias("keep"),
        tier.cast("int").alias("priority"),
        budget.alias("budget"),
    )


def content_drift(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "text",
) -> DataFrame:
    """Per-URL change-rate profile from a multi-capture history — the
    empirical input a re-crawl scheduler actually wants (Cho &
    Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
    TODS'03: estimate each page's change frequency from observed
    captures, then budget re-fetches by it). `changefreq` from sitemaps
    (:func:`recrawl_schedule`) is a publisher CLAIM; this measures it.

    Input: one row per (url, capture) with an epoch-seconds timestamp
    and the captured content. Output, one row per url:

    - ``n_captures`` — captures observed;
    - ``n_changes`` — captures whose content digest differs from the
      previous capture's (md5, the repo's cross-engine hash);
    - ``change_rate`` — n_changes / (n_captures − 1), 6 dp, NULL when a
      single capture (no interval observed);
    - ``first_ts`` / ``last_ts``;
    - ``est_interval_s`` — observed mean seconds between CHANGES,
      floor((last_ts − first_ts) / n_changes) in exact integer math;
      NULL when no change was observed (no evidence the page ever
      changes — schedule by the publisher claim instead).

    Scale shape: ONE shuffle on url; the lag window is per-url, bounded
    by that url's capture count (a handful — crawls keep the last few
    captures), never a corpus-wide sort. Content never shuffles: the
    digest is projected map-side before the exchange.
    """
    from pyspark.sql import Window

    digested = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        F.md5(F.col(content_col).cast("binary")).alias("dg"),
    )
    w = Window.partitionBy("url").orderBy("ts")
    flagged = digested.withColumn(
        "chg",
        (F.lag("dg").over(w).isNotNull() & (F.col("dg") != F.lag("dg").over(w)))
        .cast("int"),
    )
    agg = flagged.groupBy("url").agg(
        F.count("*").cast("long").alias("n_captures"),
        F.sum("chg").cast("long").alias("n_changes"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    return agg.select(
        "url",
        "n_captures",
        "n_changes",
        F.when(
            F.col("n_captures") > 1,
            F.round(F.col("n_changes") / (F.col("n_captures") - 1), 6),
        ).alias("change_rate"),
        "first_ts",
        "last_ts",
        F.when(
            F.col("n_changes") > 0,
            F.floor((F.col("last_ts") - F.col("first_ts")) / F.col("n_changes")),
        ).cast("long").alias("est_interval_s"),
    )

"""The crawl round loop — the engine core (SURVEY.md §3.1 Spark lifecycle).

Implements PINNED ROUND SPEC v1 (tests/refmodel.py docstring) as
DataFrame dataflow:

    frontier_0 = seeds -> canonicalize -> seq-stamp
    round r:
      live     = frontier minus expired (deadline <= r)
      allowed  = live minus robots-disallowed           (broadcast join)
      ranked   = row_number over (partition host, FIFO key) <= host budget
      batch    = ranked orderBy FIFO key limit batch_cap (TakeOrdered)
      fetched  = batch JOIN pages on url_canon           (broadcast batch)
      extract  = one-parse mapInPandas: per-handler text + links
      new      = explode links -> canonicalize -> in-round dedup
                 -> anti-join seen
      frontier = deferred ∪ new;  seen ∪= new;  host clock advances
      -> snapshot (parquet per round under workdir; lineage truncation)

Scale design notes (100 TB pages, 10^10-row frontier):
- The fetch join broadcasts the BATCH side (bounded by batch_cap) against
  the huge pages table — no shuffle of pages, no full sort. Catalyst
  additionally gets an IN-filter on host_hash buckets for partition
  pruning when the pages table is bucket-partitioned.
- The politeness window shuffles the frontier once on `host`; the
  host-budget filter and FIFO ranking are partition-local after that
  single shuffle. `batch_pos` is a window over <= batch_cap rows (a
  bounded single-partition window, the same backpressure bound as the
  reference's queue capacity, crawler.go:69).
- Each round is materialized to parquet (the snapshot/checkpoint layer),
  which truncates plan lineage — round N's plan never re-executes round
  N-1's DAG.
- All Python is Arrow-vectorized; the only per-row Python runs inside
  pandas batches (urllib canonicalization, HTML parse).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.canon_udf import canon_row, canonicalize_udf
from ..functions.extract import extract_links as _extract_links_py
from ..functions.htmldom import parse_html, sel_text
from .handlers import HandlerRegistry

SEQ_STRIDE = 1 << 20

FIFO_KEY = ["priority", "round_added", "seq"]

_FRONTIER_COLS = [
    "url", "url_canon", "host", "path", "host_hash", "url_hash",
    "priority", "depth", "round_added", "seq", "callbacks", "referer",
    "deadline", "raw",
]

_FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_canon", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("host_hash", T.IntegerType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("round_added", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("callbacks", T.ArrayType(T.StringType())),
        T.StructField("referer", T.StringType()),
        T.StructField("deadline", T.DoubleType()),
        T.StructField("raw", T.BooleanType()),
    ]
)

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("batch_pos", T.LongType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("handler", T.StringType()),
        T.StructField("out_callbacks", T.ArrayType(T.StringType())),
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("link_pos0", T.LongType()),
    ]
)

_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host_hash", T.IntegerType()),
        T.StructField("first_round", T.IntegerType()),
    ]
)

_HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("next_time", T.DoubleType()),
    ]
)


@dataclass
class EngineConfig:
    batch_cap: int = 1000
    max_rounds: int = 50
    workdir: str = "/tmp/crawl_spark_work"
    collect_transcript: bool = True
    keep_rounds: int = 2  # older round snapshots are deleted (resume keeps last)
    default_crawl_delay: float = 0.0


@dataclass
class CrawlResult:
    transcript: list = field(default_factory=list)
    counters: list = field(default_factory=list)
    rounds: int = 0
    workdir: str = ""

    @property
    def total_fetched(self) -> int:
        return sum(c["fetched"] for c in self.counters)

    @property
    def total_scheduled(self) -> int:
        return sum(c.get("scheduled", 0) for c in self.counters)


def _make_extract_fn(registry: HandlerRegistry):
    """mapInPandas fn: one parse per page, all matched handlers per row.

    Emits one output row per (page, matched handler) with that handler's
    extracted text and (for follow handlers) resolved links plus the
    row-global starting link position (spec step 7).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in _EXTRACT_SCHEMA.fields}
            for i in range(len(pdf)):
                html = pdf["html"].iat[i]
                if html is None or bool(pdf["raw"].iat[i]):
                    continue
                cb = pdf["callbacks"].iat[i]  # Arrow gives numpy arrays
                callbacks = [] if cb is None else list(cb)
                handlers = registry.get_handlers(callbacks)
                if not handlers:
                    continue
                root = parse_html(html)
                pos = 0
                for h in handlers:
                    links = (
                        _extract_links_py(root, pdf["url"].iat[i], h.link_selector)
                        if h.follow
                        else []
                    )
                    out["url_canon"].append(pdf["url_canon"].iat[i])
                    out["url"].append(pdf["url"].iat[i])
                    out["batch_pos"].append(int(pdf["batch_pos"].iat[i]))
                    out["priority"].append(int(pdf["priority"].iat[i]))
                    out["depth"].append(int(pdf["depth"].iat[i]))
                    out["handler"].append(h.name)
                    out["out_callbacks"].append(
                        list(h.out_callbacks) if h.out_callbacks else callbacks
                    )
                    out["text"].append(sel_text(root, h.text_selector))
                    out["links"].append(links)
                    out["link_pos0"].append(pos)
                    pos += len(links)
            yield pd.DataFrame(out)

    return fn


class CrawlEngine:
    """PySpark-native crawler over a Common-Crawl-style pages table.

    `pages_df` must have columns (url, html); `url` is assumed canonical
    (set ``canonicalize_pages=True`` to canonicalize it with the UDF —
    one extra pass over the table).
    """

    def __init__(
        self,
        spark: SparkSession,
        pages_df: DataFrame,
        registry: HandlerRegistry,
        robots_df: DataFrame | None = None,
        config: EngineConfig | None = None,
        canonicalize_pages: bool = False,
    ):
        self.spark = spark
        self.registry = registry
        self.config = config or EngineConfig()
        if canonicalize_pages:
            pages_df = pages_df.withColumn(
                "url", canonicalize_udf(F.col("url"), F.lit(None).cast("string"))["url_canon"]
            )
        # only url+html ever reach the engine: column pruning at the scan
        self.pages = pages_df.select(
            F.col("url").alias("page_url"), F.col("html").alias("html")
        )
        if robots_df is None:
            robots_df = spark.createDataFrame(
                [], "host string, disallow array<string>, crawl_delay double"
            )
        self.robots = robots_df.select("host", "disallow", "crawl_delay")

    # -- seed stamping (driver-side: seed lists are small; order = seq) ----
    def seed_frontier(self, seeds: pd.DataFrame | list) -> DataFrame:
        if isinstance(seeds, list):
            seeds = pd.DataFrame(seeds)
        rows, seen, errors = [], set(), []
        for i, s in enumerate(seeds.to_dict("records")):
            c = canon_row(s.get("url"), s.get("referer"))
            if c["url_canon"] is None:
                errors.append((s.get("url"), 0, "invalid_url", ""))
                continue
            if c["url_canon"] in seen:
                continue
            seen.add(c["url_canon"])
            rows.append(
                {
                    "url": s.get("url"),
                    "url_canon": c["url_canon"],
                    "host": c["host"],
                    "path": c["path"],
                    "host_hash": c["host_hash"],
                    "url_hash": c["url_hash"],
                    "priority": int(s.get("priority") or 0),
                    "depth": 0,
                    "round_added": 0,
                    "seq": i,
                    "callbacks": [] if s.get("callbacks") is None else list(s.get("callbacks")),
                    "referer": s.get("referer"),
                    "deadline": s.get("deadline"),
                    "raw": bool(s.get("raw") or False),
                }
            )
        self._seed_errors = errors
        self._seed_dups = len(seeds) - len(rows) - len(errors)
        return self.spark.createDataFrame(rows, _FRONTIER_SCHEMA)

    # -- one round ---------------------------------------------------------
    def _round(
        self,
        r: int,
        frontier: DataFrame,
        seen: DataFrame,
        host_state: DataFrame,
    ):
        cfg = self.config
        c = {"round": r, "fetched": 0, "deduped": 0, "deferred_by_politeness": 0,
             "expired": 0, "errors": 0, "scheduled": 0}
        errors_parts = []

        # 1. expire (deadline drop, nsq/nsqcrawl/queue.go:90-94)
        live = frontier.filter(F.col("deadline").isNull() | (F.col("deadline") > r))
        c["expired"] = frontier.count() - live.count()

        # 2. robots disallow (broadcast: robots is a per-host dim table)
        rb = F.broadcast(self.robots)
        live = live.join(rb, "host", "left")
        denied_cond = F.exists(
            F.coalesce(F.col("disallow"), F.array().cast("array<string>")),
            lambda p: F.col("path").startswith(p),
        )
        denied = live.filter(denied_cond)
        errors_parts.append(
            denied.select(
                F.col("url_canon").alias("url"), F.lit(r).alias("round"),
                F.lit("robots_denied").alias("error_class"), F.lit("").alias("message"),
            )
        )
        allowed = live.filter(~denied_cond)

        # 3+4. per-host budget via window rank (single shuffle on host)
        d = F.coalesce(F.col("crawl_delay"), F.lit(cfg.default_crawl_delay))
        nt = F.coalesce(F.col("next_time"), F.lit(0.0))
        s_t = F.greatest(nt, F.lit(float(r)))
        budget = F.when(d <= 0, F.lit(None).cast("long")).otherwise(
            F.greatest(F.ceil((F.lit(r + 1.0) - s_t) / d), F.lit(0))
        )
        w = Window.partitionBy("host").orderBy(*FIFO_KEY)
        ranked = (
            allowed.join(F.broadcast(host_state), "host", "left")
            .withColumn("host_budget", budget)
            .withColumn("host_rank", F.row_number().over(w))
        )
        survivors = ranked.filter(
            F.col("host_budget").isNull() | (F.col("host_rank") <= F.col("host_budget"))
        )

        # 5. global cap: TakeOrdered (no full sort); batch_pos over <= cap rows
        batch = survivors.orderBy(*FIFO_KEY).limit(cfg.batch_cap)
        batch = batch.withColumn(
            "batch_pos", F.row_number().over(Window.orderBy(*FIFO_KEY))
        )
        batch = batch.localCheckpoint(eager=True)  # reused 4×; bounded by cap
        n_batch = batch.count()
        n_allowed = allowed.count()
        c["deferred_by_politeness"] = n_allowed - n_batch

        transcript = None
        if cfg.collect_transcript:
            transcript = [
                row.url_canon
                for row in batch.select("url_canon", "batch_pos").orderBy("batch_pos").collect()
            ]

        # 6. host clock update
        fetched_per_host = batch.groupBy("host").agg(F.count("*").alias("k"))
        upd = (
            fetched_per_host.join(F.broadcast(self.robots), "host", "left")
            .join(F.broadcast(host_state), "host", "left")
            .withColumn("d", F.coalesce(F.col("crawl_delay"), F.lit(cfg.default_crawl_delay)))
            .filter(F.col("d") > 0)
            .select(
                "host",
                (F.greatest(F.coalesce(F.col("next_time"), F.lit(0.0)), F.lit(float(r)))
                 + F.col("k") * F.col("d")).alias("next_time"),
            )
        )
        host_state = host_state.join(upd.select("host"), "host", "left_anti").unionByName(upd)

        # 6b. fetch = equi-join against pages, broadcasting the bounded
        # batch. A single left-outer join can't broadcast its preserved
        # side (Spark only builds the non-preserved side), which would
        # silently shuffle the 100 TB pages table — so split into
        #   hits   = pages ⋈ broadcast(batch)        (inner, build right)
        #   misses = batch ⋉̸ broadcast(hit urls)     (left-anti, build right)
        # Both joins build the ≤batch_cap side; pages is only scanned.
        fetch_cols = ["url_canon", "url", "batch_pos", "priority", "depth", "callbacks", "raw"]
        hits = self.pages.join(
            F.broadcast(batch.select(*fetch_cols)),
            F.col("url_canon") == F.col("page_url"),
            "inner",
        ).drop("page_url")
        hits = hits.localCheckpoint(eager=True)  # bounded by cap; reused 2×
        misses = batch.select("url_canon").join(
            F.broadcast(hits.select("url_canon")), "url_canon", "left_anti"
        )
        errors_parts.append(
            misses.select(
                F.col("url_canon").alias("url"), F.lit(r).alias("round"),
                F.lit("fetch_miss").alias("error_class"), F.lit("").alias("message"),
            )
        )
        c["fetched"] = hits.count()

        # 7. extract + dispatch (one parse per page, Arrow-batched)
        extracted = hits.select(
            "url_canon", "url", "batch_pos", "priority", "depth", "callbacks", "raw", "html"
        ).mapInPandas(_make_extract_fn(self.registry), _EXTRACT_SCHEMA)
        extracted = extracted.localCheckpoint(eager=True)  # parse once, reuse

        # 8. schedule links: explode -> canonicalize -> dedup -> anti-join seen
        links = (
            extracted.filter(F.size("links") > 0)
            .select(
                F.col("url").alias("referer"), "batch_pos", "priority", "depth",
                "out_callbacks", "link_pos0",
                F.posexplode("links").alias("pos", "link"),
            )
            .withColumn("seq", F.col("batch_pos") * SEQ_STRIDE + F.col("link_pos0") + F.col("pos"))
            .withColumn("c", canonicalize_udf(F.col("link"), F.lit(None).cast("string")))
            .select(
                "referer", "priority", "depth", "out_callbacks", "link", "seq",
                F.col("c.url_canon").alias("url_canon"),
                F.col("c.host").alias("host"),
                F.col("c.path").alias("path"),
                F.col("c.url_hash").alias("url_hash"),
                F.col("c.host_hash").alias("host_hash"),
            )
            .filter(F.col("url_canon").isNotNull())
        )
        # in-round dedup: first occurrence in sequential order wins (spec:
        # links are scheduled in (batch_pos, position) = seq order)
        w_dup = Window.partitionBy("url_canon").orderBy("seq")
        deduped_links = links.withColumn("rn", F.row_number().over(w_dup)).filter(F.col("rn") == 1)
        n_valid = links.count()
        new_rows = (
            deduped_links.join(seen.select("url_canon"), "url_canon", "left_anti")
            .select(
                F.col("link").alias("url"),
                "url_canon", "host", "path", "host_hash", "url_hash",
                F.col("priority"),
                (F.col("depth") + 1).alias("depth"),
                F.lit(r + 1).alias("round_added"),
                F.col("seq"),
                F.col("out_callbacks").alias("callbacks"),
                F.col("referer"),
                F.lit(None).cast("double").alias("deadline"),
                F.lit(False).alias("raw"),
            )
            .select(*_FRONTIER_COLS)
        )

        # deferred rows keep their FIFO key (re-ranked next round)
        deferred = allowed.join(batch.select("url_canon"), "url_canon", "left_anti").select(
            *_FRONTIER_COLS
        )
        frontier_next = deferred.unionByName(new_rows)
        seen_next = seen.unionByName(
            new_rows.select(
                "url_canon", "url_hash", "host_hash",
                F.col("round_added").alias("first_round"),
            )
        )
        errors_df = errors_parts[0].unionByName(errors_parts[1])
        return frontier_next, seen_next, host_state, errors_df, extracted, c, transcript, n_valid

    def latest_round(self) -> int | None:
        """Highest committed round in workdir, or None."""
        if not os.path.isdir(self.config.workdir):
            return None
        rounds = [
            int(d.split("_")[1])
            for d in os.listdir(self.config.workdir)
            if d.startswith("round_") and not d.endswith(".tmp")
            and os.path.exists(os.path.join(self.config.workdir, d, "manifest.json"))
        ]
        return max(rounds) if rounds else None

    # -- the crawl ---------------------------------------------------------
    def run(
        self,
        seeds,
        max_rounds: int | None = None,
        resume: bool = False,
    ) -> CrawlResult:
        cfg = self.config
        spark = self.spark
        res = CrawlResult(workdir=cfg.workdir)
        max_rounds = max_rounds if max_rounds is not None else cfg.max_rounds

        start_round = 0
        if resume:
            last = self.latest_round()
            if last is not None:
                base = os.path.join(cfg.workdir, "round_%05d" % last)
                with open(os.path.join(base, "manifest.json")) as f:
                    manifest = json.load(f)
                frontier = spark.read.schema(_FRONTIER_SCHEMA).parquet(
                    os.path.join(base, "frontier")
                )
                seen = spark.read.schema(_SEEN_SCHEMA).parquet(os.path.join(base, "seen"))
                host_state = spark.read.schema(_HOST_STATE_SCHEMA).parquet(
                    os.path.join(base, "host_state")
                )
                res.transcript = manifest.get("transcript_all", [])
                res.counters = manifest.get("counters_all", [])
                start_round = last + 1
            else:
                resume = False
        if not resume:
            if os.path.exists(cfg.workdir):
                shutil.rmtree(cfg.workdir)
            os.makedirs(cfg.workdir, exist_ok=True)
            frontier = self.seed_frontier(seeds)
            seen = frontier.select(
                "url_canon", "url_hash", "host_hash", F.lit(0).alias("first_round")
            )
            host_state = spark.createDataFrame([], _HOST_STATE_SCHEMA)

        for r in range(start_round, max_rounds):
            if frontier.isEmpty():
                break
            (frontier_n, seen_n, host_state_n, errors_df, extracted, c,
             transcript, n_valid) = self._round(r, frontier, seen, host_state)

            # materialize snapshot (truncates lineage; enables resume)
            manifest_tables = {
                "frontier": frontier_n,
                "seen": seen_n,
                "host_state": host_state_n,
                "errors": errors_df,
                "extracted": extracted.select(
                    "url_canon", "handler", "text", F.lit(r).alias("round")
                ),
            }
            base = os.path.join(cfg.workdir, "round_%05d" % r)
            tmp = base + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp)
            for name, df in manifest_tables.items():
                df.write.mode("overwrite").parquet(os.path.join(tmp, name))

            n_new = (
                spark.read.schema(_FRONTIER_SCHEMA)
                .parquet(os.path.join(tmp, "frontier"))
                .filter(F.col("round_added") == r + 1)
                .count()
            )
            c["scheduled"] = n_new
            c["deduped"] = n_valid - n_new
            c["errors"] = spark.read.parquet(os.path.join(tmp, "errors")).count()
            if transcript is not None:
                res.transcript.append(transcript)
            res.counters.append(c)

            manifest = {
                "round": r,
                "snapshot_id": "r%05d" % r,
                "counters": c,
                "counters_all": res.counters,
                "transcript_all": res.transcript,
            }
            with open(os.path.join(tmp, "manifest.json"), "w") as f:
                json.dump(manifest, f)
            if os.path.exists(base):
                shutil.rmtree(base)
            os.rename(tmp, base)  # atomic commit
            res.rounds = r + 1

            # re-open state from the COMMITTED path (the .tmp dir is gone)
            frontier = spark.read.schema(_FRONTIER_SCHEMA).parquet(os.path.join(base, "frontier"))
            seen = spark.read.schema(_SEEN_SCHEMA).parquet(os.path.join(base, "seen"))
            host_state = spark.read.schema(_HOST_STATE_SCHEMA).parquet(
                os.path.join(base, "host_state")
            )

            # retention: keep the last `keep_rounds` snapshots
            for d in sorted(os.listdir(cfg.workdir)):
                if d.startswith("round_") and not d.endswith(".tmp"):
                    rr = int(d.split("_")[1])
                    if rr <= r - cfg.keep_rounds:
                        for t in ("frontier", "seen", "host_state"):
                            p = os.path.join(cfg.workdir, d, t)
                            if os.path.exists(p):
                                shutil.rmtree(p)
        return res

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
      frontier log += (adds=new, dels=batch urls);  seen log += new;
      host clock advances
      -> snapshot (parquet per round under workdir; lineage truncation;
         seen is an APPEND-ONLY delta log and the frontier is a
         MERGE-ON-READ log — base ∪ adds − dels, with expired and
         robots-denied rows dropped by predicate at read; full frontier
         materialization happens only at compaction rounds)

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

from ..functions.canon_udf import canonicalize_udf
from ..functions.extract import extract_links as _extract_links_py
from ..functions.htmldom import parse_html, sel_text
from ..operators.topk import grouped_topk, ranked_topk
from .handlers import HandlerRegistry

SEQ_STRIDE = 1 << 20

FIFO_KEY = ["priority", "round_added", "seq"]

# Full Request parity (request.go:13-32): the reference's method / form
# / query / cookies / header fields ride the frontier as nullable
# columns so middlewares and the request-construction pipeline
# (plans/request.py) see them; engine columns follow.
_FRONTIER_COLS = [
    "url", "url_canon", "host", "path", "host_hash", "url_hash",
    "priority", "depth", "round_added", "seq", "callbacks", "referer",
    "deadline", "raw", "method", "form", "query", "cookies", "header",
    # politeness columns, stamped AT ADD TIME (robots is static per
    # engine run — pinned by the manifest fingerprint): `denied` is the
    # robots-disallow verdict for this row, `crawl_delay` the host's
    # delay (null = no robots row; the config default applies at use).
    # Stamping when rows enter the frontier (seeds / new links / staged
    # pickups — all bounded per round) means the round loop NEVER joins
    # the frontier against robots: at a 10^8-host robots table the old
    # per-round frontier⋈broadcast(robots) join was the last per-round
    # O(|hosts|) network cost.
    "crawl_delay", "denied",
]

_MULTIMAP = T.MapType(T.StringType(), T.ArrayType(T.StringType()))

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
        T.StructField("method", T.StringType()),
        T.StructField("form", _MULTIMAP),
        T.StructField("query", _MULTIMAP),
        T.StructField("cookies", _MULTIMAP),
        T.StructField("header", T.MapType(T.StringType(), T.StringType())),
        T.StructField("crawl_delay", T.DoubleType()),
        T.StructField("denied", T.BooleanType()),
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

# on-disk layout of a seen delta dir: hive-partitioned by the url_hash
# bucket (sb=pmod(url_hash, seen_buckets)/), files sorted by url_hash
# within each bucket so parquet row-group min/max stats can skip
_SEEN_BUCKETED_SCHEMA = T.StructType(
    _SEEN_SCHEMA.fields + [T.StructField("sb", T.IntegerType())]
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
    # driver-side transcript copy: OFF by default — it grows
    # O(rounds × batch_cap) in driver memory. The parquet `transcript`
    # table per round is the durable record; use
    # ``CrawlResult.read_transcript(spark)`` to reconstruct the list, or
    # opt in here for tests/small crawls.
    collect_transcript: bool = False
    # retention depth for REDUNDANT per-round artifacts. Since round 4
    # every state table (seen/frontier/host_state) lives in a shared
    # append-only delta log pruned only by its own compaction, so the
    # only per-round file that duplicates recoverable state is the
    # Bloom snapshot (bloom.npz, ~8 MB × rounds with use_bloom): rounds
    # older than this lose theirs (a resume from such a round rebuilds
    # the bitmaps from the seen log). errors/extracted/transcript are
    # the crawl's O(batch) OUTPUTS, not caches — never reaped.
    keep_rounds: int = 2
    default_crawl_delay: float = 0.0
    timing: bool = False  # print per-phase wall times (perf debugging)
    # batch caps at or below this use the serial TakeOrdered+window
    # selection (fewer jobs); above it the distributed ranked_topk
    topk_serial_max: int = 10_000
    # politeness skew: hosts with at least this many frontier rows are
    # routed through a distributed per-host top-k instead of the
    # groupBy(host) window (0/None disables detection)
    hot_host_threshold: int | None = 2_000_000
    max_hot_hosts: int = 16
    # Bloom seen-set pre-filter (operators/bloom.py): OFF by default at
    # test scale (the exact anti-join is cheaper below ~10^7 seen rows);
    # turn on for 10^9+ seen-sets where the anti-join shuffle dominates.
    use_bloom: bool = False
    bloom_buckets: int = 64
    bloom_bits: int = 1 << 20
    bloom_hashes: int = 4
    # seen-set delta-log compaction: once the log holds at least this
    # many delta dirs, the commit rewrites their union into one compact
    # dir and the manifest references only that (bounds reader file
    # count; older manifests lose seen time-travel — the documented
    # retention contract). 0 disables.
    # default 32: a 1,000-round crawl would otherwise union 1,000 delta
    # dirs on every seen read (file-listing cost grows per round);
    # compacting every ~32 rounds amortizes the O(|seen|) rewrite to
    # 1/32 of rounds while keeping reads at ≤32 dirs. 0 disables.
    seen_compact_min_deltas: int = 32
    # seen-set hash-bucket count: every seen delta dir is hive-partitioned
    # by sb = pmod(url_hash, seen_buckets) (SURVEY §4.2's bucket(hash, B)
    # layout). The per-round membership check prunes its scan to the
    # buckets the round's links actually touch, and the Bloom bitmaps
    # share the same idea per host bucket.
    seen_buckets: int = 64
    # membership-check strategy threshold: when the round's candidate
    # links are at most this many rows, the check runs as
    #   hits  = seen ⋉ broadcast(links)      (seen SCANNED, never shuffled)
    #   unseen = links ⋉̸ broadcast(hits)     (both joins build the bounded side)
    # — per-round cost is one pruned scan of seen, flat in rounds, vs the
    # classic anti-join that re-shuffles the ENTIRE seen set every round
    # (O(|seen|) network at a 10^10-row seen set). Candidate sets larger
    # than this (bounded by batch_cap × links/page — tune together) fall
    # back to the shuffle anti-join, which AQE can still skew-split.
    # MEMORY COST: the probe path broadcasts the (url_hash, url_canon)
    # candidate set AND (separately) the ≤-as-large hit set — i.e. up to
    # 2× ~(96 B/row × max) live on the driver and every executor per
    # round. None (default) derives the cap from
    # spark.sql.autoBroadcastJoinThreshold / ~96 B-per-row (Spark's
    # 10 MB default ⇒ ~109k rows ⇒ tens of MB as a hashed relation —
    # safe on default-sized JVMs); set an explicit row count only with
    # the executor/driver headroom to match (4M rows ≈ 400 MB × 2).
    seen_probe_broadcast_max: int | None = None
    # bucket-prune the seen scan only when the probe side is small enough
    # for pruning to have a chance: ≥ ~B·ln(B) uniformly-hashed links
    # touch every bucket w.h.p. (coupon collector), so collecting their
    # distinct buckets is a wasted per-round job that always answers
    # "all of them". Probes at or below this threshold (staged trickles,
    # small batches, resume replays) still prune — where it matters.
    seen_prune_max_probe: int = 2_048
    # frontier merge-on-read log: rounds append add/del deltas; once the
    # log holds this many add deltas the commit materializes the merged
    # frontier as a new base (amortizes the O(|frontier|) write to 1/k
    # rounds). 1 = materialize every round (legacy behavior).
    frontier_compact_every: int = 8
    # out-of-band seed pickup: when set, every round boundary drains the
    # streaming staging dir (streaming/feed.py) and unions not-yet-seen
    # staged urls into the frontier — the reference's NSQ-topic "picked
    # up at the next round boundary" semantics (SURVEY §3.3)
    staged_seeds_dir: str | None = None
    # bucketed pages layout (SURVEY §4.2, fetch side): when set, pages_df
    # must carry a hive-partition column `pages_bucket_col` with value
    # pmod(F.hash(url), pages_buckets) (sources.fixtures.
    # write_bucketed_pages writes this layout). Each round collects the
    # batch's ≤batch_cap distinct bucket ids (tiny job over the
    # checkpointed batch) and filters the pages scan on them BEFORE the
    # fetch joins — partition pruning skips every other bucket's files,
    # so the two per-round pages scans read O(batch buckets / B) of the
    # 100 TB table instead of all of it. None disables (flat layout).
    pages_buckets: int | None = None
    pages_bucket_col: str = "pb"
    # robots dimension layout: when set (and politeness is active), the
    # engine persists the robots table ONCE per workdir under
    # `robots_dim/`, hive-partitioned by rb = pmod(hash(host), B) with
    # files host-sorted within each bucket — the same layout the seen
    # log uses. The per-round stamp probe (new links' hosts, bounded)
    # then prunes its robots scan to the touched buckets instead of
    # scanning (or worse, broadcasting) all 10^8 hosts. None = probe the
    # in-memory robots DataFrame without partition pruning.
    robots_buckets: int | None = 64
    # small-dim stamp fast path (round 5): a robots table with at most
    # this many rows is broadcast outright by `_stamp_robots` — one
    # join, no per-batch host-probe driver job, and no persisted
    # robots_dim either (the pruned scan would never be used). None
    # derives the cap from autoBroadcastJoinThreshold exactly like the
    # seen probe (`_seen_probe_max`); 0 forces the pruned-scan probe
    # path regardless of size (used by plan-evidence tooling).
    robots_broadcast_max: int | None = None
    # host_state is a merge-on-read delta log (host_state_log/): each
    # round appends only the batch's host-clock updates (≤ batch hosts
    # rows); the state is the per-host MAX over the deltas (valid
    # because next_time strictly increases per host — greatest(nt, r) +
    # k·d > nt for k ≥ 1, d > 0, and robots/delays are static per run).
    # Once the log holds this many deltas, the commit compacts them into
    # one dir (same amortization contract as seen_compact_min_deltas).
    # 0 disables compaction.
    host_state_compact_min_deltas: int = 32
    # optionally cache the merged frontier view for each round: the round
    # scans it ~4× (counts, politeness rank, batch selection, errors) and
    # each scan re-runs the log merge. Measured at bench scale the merge
    # is NOT the bottleneck (union + broadcast anti-join over parquet
    # scans — identical A/B walls), and at 10^10 rows pinning the
    # frontier in executor memory is its own cost — so default OFF; turn
    # on for memory-rich clusters to trade cache space for scan I/O.
    cache_frontier: bool = False


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

    def read_transcript(self, spark: SparkSession) -> list[list[str]]:
        """Reconstruct the per-round dequeue transcript from the durable
        parquet `transcript` tables (the O(batch_cap)-per-round record) —
        the opt-in replacement for ``collect_transcript=True``."""
        out = []
        for rr in range(self.rounds):
            tp = os.path.join(self.workdir, "round_%05d" % rr, "transcript")
            out.append(
                [
                    row.url_canon
                    for row in spark.read.parquet(tp).orderBy("batch_pos").collect()
                ]
            )
        return out


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
        middlewares: list | None = None,
    ):
        self.spark = spark
        self.registry = registry
        self.config = config or EngineConfig()
        # middleware chain (crawler.go:25, run crawler.go:153-158):
        # ordered DataFrame→DataFrame transforms applied to the dequeued
        # batch BEFORE the fetch. A middleware may add/set a string
        # column `mw_error`; rows where it is non-null abort (routed to
        # the errors table, skipped by the fetch) and later middlewares
        # never see them — the reference's first-error-aborts semantics.
        self.middlewares = list(middlewares or [])
        if canonicalize_pages:
            pages_df = pages_df.withColumn(
                "url", canonicalize_udf(F.col("url"), F.lit(None).cast("string"))["url_canon"]
            )
        # only url+html ever reach the engine: column pruning at the scan
        # (+ the bucket partition column when the layout is bucketed)
        page_cols = [F.col("url").alias("page_url"), F.col("html").alias("html")]
        if self.config.pages_buckets:
            page_cols.append(F.col(self.config.pages_bucket_col))
        self.pages = pages_df.select(*page_cols)
        if robots_df is None:
            robots_df = spark.createDataFrame(
                [], "host string, disallow array<string>, crawl_delay double"
            )
        self.robots = robots_df.select("host", "disallow", "crawl_delay")
        # one row per host is a CORRECTNESS contract, not a convention:
        # the add-time robots stamp left-joins entering rows on host, so
        # a duplicate host row would duplicate frontier rows through the
        # join — inflating the committed expired/allowed counters and
        # double-scheduling that host's urls. ONE partial-aggregated job
        # at construction (count + count_distinct combine map-side —
        # a single scan even at a 10^8-host table).
        row = self.robots.agg(
            F.count("*").alias("n"), F.countDistinct("host").alias("nd")
        ).collect()[0]
        n_rb = row.n
        if n_rb and n_rb != row.nd:
            raise ValueError(
                "robots_df must have exactly one row per host "
                "(deduplicate/merge rules upstream — "
                "functions.robots.robots_table emits one row per host)"
            )
        # politeness fast path: with no robots rules and no default delay,
        # every budget is unlimited and no URL is denied — the per-host
        # window rank, robots join and host-clock update are identity
        # transforms, so skip them (saves a shuffle + 2 joins per round).
        self._politeness_active = (
            self.config.default_crawl_delay > 0 or n_rb > 0  # no isEmpty job
        )
        self._n_robots = n_rb
        self._robots_dim_path: str | None = None  # set by _ensure_robots_dim
        self._robots_small: DataFrame | None = None  # small-dim stamp cache
        self._errors_schema = "url string, round int, error_class string, message string"
        self._parallelism = spark.sparkContext.defaultParallelism
        self._robots_fp: dict | None = None
        self._staged_drained: set[str] = set()
        self._bloom = None
        if self.config.use_bloom:
            from ..operators.bloom import BloomConfig

            self._bloom_cfg = BloomConfig(
                self.config.bloom_buckets, self.config.bloom_bits, self.config.bloom_hashes
            )
        else:
            self._bloom_cfg = None

    # -- seed stamping -------------------------------------------------------
    # seq = position in the seed list (refmodel spec); canonicalization
    # runs IN SPARK (the vectorized canon UDF), not a driver loop — a
    # 10^6-seed list would otherwise serialize ~1 min of driver-side URL
    # parsing ahead of an otherwise parallel job. Dedup keeps the
    # first occurrence (min seq) per canonical URL, matching the
    # sequential reference model exactly.
    def seed_frontier(self, seeds: pd.DataFrame | list) -> DataFrame:
        if isinstance(seeds, list):
            seeds = pd.DataFrame(seeds)
        n = len(seeds)
        if n == 0:
            self._seed_errors, self._seed_dups = [], 0
            self._n_seeded = 0
            return self.spark.createDataFrame([], _FRONTIER_SCHEMA)

        def col_or(name, default):
            if name in seeds.columns:
                return seeds[name]
            return pd.Series([default] * n)

        isnull = lambda v: v is None or (isinstance(v, float) and v != v)
        as_multimap = lambda v: (
            None if isnull(v) else {k: list(vv) for k, vv in dict(v).items()}
        )
        pdf = pd.DataFrame(
            {
                "url": col_or("url", None),
                "referer": [None if isnull(v) else v for v in col_or("referer", None)],
                "priority": [0 if isnull(v) else int(v) for v in col_or("priority", 0)],
                "seq": range(n),
                "callbacks": [[] if isnull(v) else list(v) for v in col_or("callbacks", None)],
                "deadline": [None if isnull(v) else float(v) for v in col_or("deadline", None)],
                "raw": [False if isnull(v) else bool(v) for v in col_or("raw", False)],
                "method": [None if isnull(v) else str(v) for v in col_or("method", None)],
                "form": [as_multimap(v) for v in col_or("form", None)],
                "query": [as_multimap(v) for v in col_or("query", None)],
                "cookies": [as_multimap(v) for v in col_or("cookies", None)],
                "header": [
                    None if isnull(v) else dict(v) for v in col_or("header", None)
                ],
            }
        )
        raw_df = self.spark.createDataFrame(
            pdf,
            "url string, referer string, priority int, seq long, "
            "callbacks array<string>, deadline double, raw boolean, "
            "method string, form map<string,array<string>>, "
            "query map<string,array<string>>, cookies map<string,array<string>>, "
            "header map<string,string>",
        )
        if n > 64:  # spread a big seed list before the parallel canon pass
            raw_df = raw_df.repartition(self._parallelism)
        stamped = raw_df.withColumn(
            "c", canonicalize_udf(F.col("url"), F.col("referer"))
        ).select(
            "url", "referer", "priority", "seq", "callbacks", "deadline", "raw",
            "method", "form", "query", "cookies", "header",
            F.col("c.url_canon").alias("url_canon"),
            F.col("c.host").alias("host"),
            F.col("c.path").alias("path"),
            F.col("c.url_hash").alias("url_hash"),
            F.col("c.host_hash").alias("host_hash"),
        )
        # checkpoint before filtering on the UDF output (pushdown would
        # double-evaluate the canon pass, see the links pipeline below)
        stamped = stamped.localCheckpoint(eager=True)
        # exact invalid count from ONE aggregate; the collected error list
        # is a bounded 10k SAMPLE (documented cap — don't ship 10^6
        # malformed urls to the driver), so dup accounting never drifts
        n_invalid = stamped.filter(F.col("url_canon").isNull()).count()
        self._seed_errors = [
            (row.url, 0, "invalid_url", "")
            for row in stamped.filter(F.col("url_canon").isNull())
            .select("url").limit(10000).collect()
        ]
        w = Window.partitionBy("url_canon").orderBy("seq")
        frontier = (
            stamped.filter(F.col("url_canon").isNotNull())
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .withColumn("depth", F.lit(0))
            .withColumn("round_added", F.lit(0))
        )
        # politeness stamp at add time (bounded by the seed list)
        frontier = self._stamp_robots(frontier, n).select(*_FRONTIER_COLS)
        frontier = frontier.localCheckpoint(eager=True)
        self._n_seeded = frontier.count()
        self._seed_dups = n - self._n_seeded - n_invalid
        return frontier

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
        tick = self._make_tick(r)

        # 1. expire (deadline drop, nsq/nsqcrawl/queue.go:90-94).
        expired_cond = F.col("deadline").isNotNull() & (F.col("deadline") <= r)

        if self._politeness_active:
            # 2. robots disallow — a COLUMN predicate: the verdict (and
            # the host's crawl_delay) was stamped when the row entered
            # the frontier (robots is static per run, manifest-pinned),
            # so the round never joins the frontier against robots. The
            # old frontier⋈broadcast(robots) join shipped the whole
            # robots table to every executor every round — GBs at a
            # 10^8-host web-scale frontier.
            fr = frontier
            # denied is non-null by construction (every row is stamped
            # at add time; pre-stamping workdirs are REJECTED on resume
            # by _check_frontier_stamped when politeness is active) —
            # the coalesce is belt-and-braces for the politeness-
            # inactive legacy case where the verdict is unused anyway
            denied_cond = F.coalesce(F.col("denied"), F.lit(False))
            # ONE full-frontier counting job per round: a per-host partial
            # aggregate (map-side combine — the shuffle carries ≤ one row
            # per host, never frontier rows) feeds (a) the global
            # expired/allowed totals and (b) heavy-hitter detection. This
            # replaces the three separate full-frontier scans the round
            # used to run (expiry agg + hot-host groupBy + n_allowed
            # count). The ≤|hosts|-row result is checkpointed and reused.
            per_host = (
                fr.groupBy("host")
                .agg(
                    F.count("*").alias("__n"),
                    F.count(F.when(expired_cond, 1)).alias("__n_exp"),
                    F.count(F.when(~expired_cond & denied_cond, 1)).alias("__n_den"),
                )
                .localCheckpoint(eager=True)
            )
            tot = per_host.agg(
                F.sum("__n").alias("n"),
                F.sum("__n_exp").alias("n_expired"),
                F.sum("__n_den").alias("n_denied"),
            ).collect()[0]
            c["expired"] = int(tot.n_expired or 0)
            n_allowed = int((tot.n or 0) - (tot.n_expired or 0) - (tot.n_denied or 0))
            tick("counts_agg")

            live_r = fr.filter(~expired_cond)
            denied = live_r.filter(denied_cond)
            errors_parts.append(
                denied.select(
                    F.col("url_canon").alias("url"), F.lit(r).alias("round"),
                    F.lit("robots_denied").alias("error_class"), F.lit("").alias("message"),
                )
            )
            allowed = live_r.filter(~denied_cond)

            # 3+4. per-host budget selection. The window rank shuffles on
            # `host`, so a mega-host (hot domain) lands its ENTIRE
            # frontier slice in one task — the classic skew the
            # north_rule calls out. Mitigation with EXACT semantics:
            # detect heavy hitters from the per-host aggregate above,
            # route each hot host through a distributed per-host top-k
            # (its budget is a pure function of (robots, host_state, r),
            # computed driver-side from the same formula), and keep the
            # single-shuffle window for the cold tail. The union equals
            # the plain window rank because FIFO keys are unique.
            hot_hosts: list[str] = []
            if cfg.hot_host_threshold:
                hot_hosts = [
                    row.host
                    for row in per_host.select(
                        "host",
                        (F.col("__n") - F.col("__n_exp") - F.col("__n_den")).alias("n"),
                    )
                    .filter(F.col("n") >= cfg.hot_host_threshold)
                    .orderBy(F.col("n").desc())
                    .limit(cfg.max_hot_hosts)
                    .collect()
                ]
            cold = allowed.filter(~F.col("host").isin(hot_hosts)) if hot_hosts else allowed

            # crawl_delay comes from the frontier row itself; next_time
            # joins only the ACTIVE host_state slice (hosts with
            # next_time > r) — for nt ≤ r, greatest(nt, r) = r, identical
            # to the host being absent, so the broadcast is bounded by
            # hosts still on cooldown, never all hosts ever fetched.
            d = F.coalesce(F.col("crawl_delay"), F.lit(cfg.default_crawl_delay))
            nt = F.coalesce(F.col("next_time"), F.lit(0.0))
            s_t = F.greatest(nt, F.lit(float(r)))
            budget = F.when(d <= 0, F.lit(None).cast("long")).otherwise(
                F.greatest(F.ceil((F.lit(r + 1.0) - s_t) / d), F.lit(0))
            )
            w = Window.partitionBy("host").orderBy(*FIFO_KEY)
            ranked = (
                cold.join(
                    F.broadcast(self._active_host_state(host_state, r)),
                    "host",
                    "left",
                )
                .withColumn("host_budget", budget)
                .withColumn("host_rank", F.row_number().over(w))
            )
            survivors = ranked.filter(
                F.col("host_budget").isNull() | (F.col("host_rank") <= F.col("host_budget"))
            ).select(*_FRONTIER_COLS)

            if hot_hosts:
                import math

                # ONE driver job for all hot-host budget inputs (instead
                # of a collect + a Spark job per host): budgets are a
                # pure function of (robots delay, host clock, r)
                hot_df = self.spark.createDataFrame(
                    [(h,) for h in hot_hosts], "host string"
                )
                rsrc, _ = self._robots_scan()
                # ≤ max_hot_hosts values: the isin pushes into the
                # robots scan (row-group skip on the host-sorted files)
                # so the build side is a handful of rows, never the
                # whole dimension — same no-full-robots-join rule as
                # the stamp probe
                hot_delays = rsrc.filter(
                    F.col("host").isin(hot_hosts)
                ).select("host", "crawl_delay")
                info = {
                    row.host: (row.crawl_delay, row.next_time)
                    for row in hot_df.join(hot_delays, "host", "left").join(
                        self._active_host_state(host_state, r), "host", "left"
                    ).collect()
                }
                budgets = []
                for h in hot_hosts:
                    dh, nth = info[h]
                    dh = cfg.default_crawl_delay if dh is None else dh
                    if dh <= 0:
                        k_h = cfg.batch_cap  # unlimited budget; global cap bounds it
                    else:
                        s_h = max(nth if nth is not None else 0.0, float(r))
                        k_h = max(int(math.ceil((r + 1.0 - s_h) / dh)), 0)
                    k_h = min(k_h, cfg.batch_cap)
                    if k_h > 0:
                        budgets.append((h, k_h))
                if budgets:
                    # ONE distributed grouped top-k over ALL hot hosts —
                    # per-host budgets ride a broadcast column; no
                    # per-host driver loop, no per-host jobs
                    budgets_df = self.spark.createDataFrame(
                        budgets, "host string, __k long"
                    )
                    hot = allowed.select(*_FRONTIER_COLS).join(
                        F.broadcast(budgets_df), "host"
                    )
                    # grouped_topk's contract: the input must recompute
                    # DETERMINISTICALLY (its monotonic-id rank is evaluated
                    # on both sides of a self-aggregate-join). Holds here:
                    # `allowed` derives from parquet scans of the committed
                    # frontier log through deterministic filters/joins, and
                    # FIFO keys are unique (seq stamping).
                    hot_top = grouped_topk(hot, ["host"], FIFO_KEY, "__k").select(
                        *_FRONTIER_COLS
                    )
                    survivors = survivors.unionByName(hot_top)
        else:
            # no politeness: counts still come from ONE aggregation job
            agg = frontier.agg(
                F.count("*").alias("n"),
                F.count(F.when(expired_cond, 1)).alias("n_expired"),
            ).collect()[0]
            c["expired"] = agg.n_expired
            tick("counts_agg")
            live = frontier.filter(~expired_cond)
            errors_parts.append(
                self.spark.createDataFrame([], self._errors_schema)
            )
            allowed = live
            survivors = live
            n_allowed = agg.n - agg.n_expired  # no extra job

        # 5. global cap + batch_pos stamp. Two physically different,
        # logically identical strategies (keys are unique, so both give
        # the same batch):
        # - small caps: orderBy+limit (TakeOrdered) + one bounded window
        #   — fewest jobs, serial merge is trivial at this size;
        # - large caps: distributed exact top-k (operators/topk.py) — no
        #   TakeOrdered merge, no single-partition window; the only
        #   serial data is one row-count per partition.
        if cfg.batch_cap <= cfg.topk_serial_max:
            batch = survivors.orderBy(*FIFO_KEY).limit(cfg.batch_cap)
            batch = batch.withColumn(
                "batch_pos", F.row_number().over(Window.orderBy(*FIFO_KEY))
            ).select(*_FRONTIER_COLS, "batch_pos")
        else:
            batch = ranked_topk(
                survivors.select(*_FRONTIER_COLS), FIFO_KEY, cfg.batch_cap,
                pos_col="batch_pos", num_partitions=self._parallelism,
            )
        batch = batch.localCheckpoint(eager=True)  # reused 4×; bounded by cap
        n_batch = batch.count()
        c["deferred_by_politeness"] = n_allowed - n_batch
        tick("batch_select")

        transcript = None
        if cfg.collect_transcript:
            transcript = [
                row.url_canon
                for row in batch.select("url_canon", "batch_pos").orderBy("batch_pos").collect()
            ]

        # 6. host clock update — the round's host_state DELTA (≤ batch
        # hosts rows; identity/empty when politeness is inactive).
        # crawl_delay rides the batch rows (stamped at add time,
        # identical per host — first() is deterministic), so no robots
        # join; next_time joins only the broadcast ACTIVE slice. The
        # caller appends the delta to the merge-on-read host_state log —
        # the full table is never rebuilt or rewritten per round.
        host_state_delta = self.spark.createDataFrame([], _HOST_STATE_SCHEMA)
        if self._politeness_active:
            fetched_per_host = batch.groupBy("host").agg(
                F.count("*").alias("k"),
                F.first("crawl_delay").alias("crawl_delay"),
            )
            host_state_delta = (
                fetched_per_host.join(
                    F.broadcast(self._active_host_state(host_state, r)),
                    "host",
                    "left",
                )
                .withColumn("d", F.coalesce(F.col("crawl_delay"), F.lit(cfg.default_crawl_delay)))
                .filter(F.col("d") > 0)
                .select(
                    "host",
                    (F.greatest(F.coalesce(F.col("next_time"), F.lit(0.0)), F.lit(float(r)))
                     + F.col("k") * F.col("d")).alias("next_time"),
                )
            )

        # 6a. middleware chain on the dequeued batch (reference semantics:
        # runs inside Execute AFTER dequeue — so the transcript above
        # already includes rows a middleware aborts; they just never
        # reach the fetch). Rows flagged via `mw_error` route to the
        # errors table and drop out of the stream before later
        # middlewares, matching first-error-aborts (crawler.go:153-158).
        fetch_batch = batch
        if self.middlewares:
            for mw in self.middlewares:
                fetch_batch = mw(fetch_batch)
                if "mw_error" in fetch_batch.columns:
                    aborted = fetch_batch.filter(F.col("mw_error").isNotNull())
                    errors_parts.append(
                        aborted.select(
                            F.col("url_canon").alias("url"), F.lit(r).alias("round"),
                            F.lit("middleware").alias("error_class"),
                            F.col("mw_error").alias("message"),
                        )
                    )
                    fetch_batch = fetch_batch.filter(
                        F.col("mw_error").isNull()
                    ).drop("mw_error")
            fetch_batch = fetch_batch.localCheckpoint(eager=True)  # bounded

        # 6b. fetch = equi-join against pages, broadcasting the bounded
        # batch. A single left-outer join can't broadcast its preserved
        # side (Spark only builds the non-preserved side), which would
        # silently shuffle the 100 TB pages table — so split into
        #   hits   = pages ⋈ broadcast(batch)        (inner, build right)
        #   misses = batch ⋉̸ broadcast(hit urls)     (left-anti, build right)
        # Both joins build the ≤batch_cap side; pages is only scanned.
        fetch_cols = ["url_canon", "url", "batch_pos", "priority", "depth", "callbacks", "raw"]
        # Hit/miss accounting uses a url-ONLY join — parquet column
        # pruning means this scan never touches the html blobs. The html
        # scan happens exactly once, streamed straight into extraction
        # below (never checkpointed: materializing per-round page bodies
        # would write+read the whole fetched batch's html to disk).
        pages_src = self.pages
        if cfg.pages_buckets:
            # bucket-pruned fetch: the batch touches ≤batch_cap buckets —
            # collect their ids (tiny job over the checkpointed batch) and
            # let partition pruning skip every other bucket's files in
            # BOTH per-round pages scans (url-only hit join + html scan)
            bucket_ids = [
                row.b
                for row in fetch_batch.select(
                    F.pmod(F.hash("url_canon"), F.lit(cfg.pages_buckets)).alias("b")
                )
                .distinct()
                .collect()
            ]
            pages_src = self.pages.filter(
                F.col(cfg.pages_bucket_col).isin(bucket_ids)
            )
        hit_urls = pages_src.select("page_url").join(
            F.broadcast(fetch_batch.select(F.col("url_canon"))),
            F.col("url_canon") == F.col("page_url"),
            "inner",
        ).select("url_canon")
        hit_urls = hit_urls.localCheckpoint(eager=True)  # tiny; reused 2×
        misses = fetch_batch.select("url_canon").join(
            F.broadcast(hit_urls), "url_canon", "left_anti"
        )
        errors_parts.append(
            misses.select(
                F.col("url_canon").alias("url"), F.lit(r).alias("round"),
                F.lit("fetch_miss").alias("error_class"), F.lit("").alias("message"),
            )
        )
        c["fetched"] = hit_urls.count()
        tick("fetch_join")

        # 7. fetch + extract + dispatch in ONE pass over the html scan
        # (broadcast join against the bounded batch, one parse per page,
        # Arrow-batched). Parallelism comes from the pages scan splits —
        # make_session caps files.maxPartitionBytes so local fixtures
        # split like a real many-file corpus does naturally.
        hits = pages_src.join(
            F.broadcast(fetch_batch.select(*fetch_cols)),
            F.col("url_canon") == F.col("page_url"),
            "inner",
        ).drop("page_url")
        extracted = hits.select(
            "url_canon", "url", "batch_pos", "priority", "depth", "callbacks", "raw", "html"
        ).mapInPandas(_make_extract_fn(self.registry), _EXTRACT_SCHEMA)
        extracted = extracted.localCheckpoint(eager=True)  # parse once, reuse
        tick("extract")

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
        )
        # Materialize BEFORE filtering out malformed links: a filter on a
        # UDF-derived column gets predicate-pushed below the projection,
        # turning one ArrowEvalPython into two (the whole canon pass runs
        # twice — measured 2× wall). The checkpoint also lets the
        # dedup/anti-join and the `deduped` counter share one UDF pass.
        # Bounded by batch_cap × links/page.
        links = links.localCheckpoint(eager=True)
        links = links.filter(F.col("url_canon").isNotNull())
        tick("links_canon")
        # in-round dedup: first occurrence in sequential order wins (spec:
        # links are scheduled in (batch_pos, position) = seq order)
        w_dup = Window.partitionBy("url_canon").orderBy("seq")
        deduped_links = links.withColumn("rn", F.row_number().over(w_dup)).filter(F.col("rn") == 1)
        n_valid = links.count()
        if self._bloom is not None:
            # Bloom pre-filter (operators/bloom.py): definite-new links
            # skip the seen anti-join; possible-seen links get the exact
            # check, so the union equals the plain anti-join exactly.
            from ..operators.bloom import split_by_bloom

            tagged = split_by_bloom(
                deduped_links.drop("rn"), self._bloom, self._bloom_cfg, self.spark
            ).localCheckpoint(eager=True)  # consumed by both branches
            definite_new = tagged.filter(~F.col("possibly_seen")).drop("possibly_seen")
            candidates = tagged.filter(F.col("possibly_seen")).drop("possibly_seen")
            # shuffle-reduction evidence: only these rows pay the exact
            # membership check against the seen set (cheap count:
            # checkpointed)
            c["bloom_exact_checked"] = candidates.count()
            unseen = definite_new.unionByName(
                self._links_minus_seen(candidates, seen, c["bloom_exact_checked"])
            )
        else:
            unseen = self._links_minus_seen(deduped_links, seen, n_valid)
        new_rows = (
            unseen
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
                # links are plain GETs: Request extras default to null
                F.lit(None).cast("string").alias("method"),
                F.lit(None).cast(_MULTIMAP).alias("form"),
                F.lit(None).cast(_MULTIMAP).alias("query"),
                F.lit(None).cast(_MULTIMAP).alias("cookies"),
                F.lit(None).cast("map<string,string>").alias("header"),
            )
        )
        # politeness stamp at add time: one bucket-pruned robots probe
        # over the round's NEW links (bounded) replaces the old
        # full-frontier robots broadcast join in every later round.
        # hosts_src=links: the strategy probe's host set comes from the
        # CHECKPOINTED pre-anti-join frame (a superset of new_rows'
        # hosts), so the seen anti-join is never evaluated twice.
        new_rows = self._stamp_robots(
            new_rows, n_valid, hosts_src=links
        ).select(*_FRONTIER_COLS)
        # new_rows feeds BOTH the frontier and the seen snapshot writes —
        # materialize once so the dedup window + seen anti-join don't run
        # twice. Bounded by the links of one batch.
        new_rows = new_rows.localCheckpoint(eager=True)
        tick("dedup_antijoin")

        # MERGE-ON-READ frontier semantics: the round emits only DELTAS —
        # adds = this round's new links (bounded by the batch's link
        # fan-out) and dels = the dequeued batch's urls (bounded by
        # batch_cap). Deferred rows are never rewritten: they simply stay
        # in the log and re-rank next round. Expired and robots-denied
        # rows need no delete lists at all — deadlines and robots are
        # static, so `_read_frontier` drops them by predicate. Exactness
        # of url-list deletes rests on the seen-set invariant: a url that
        # ever entered the frontier is in `seen`, so it can never be
        # re-added — dels and adds never collide.
        frontier_adds = new_rows
        frontier_dels = batch.select("url_canon")
        # APPEND-ONLY seen semantics: the round emits only the DELTA (this
        # round's newly-seen urls). The caller appends it to the delta log;
        # the full seen set is the union of delta files — never rewritten.
        # At a 10^10-row seen set this bounds per-round snapshot writes by
        # |new_rows|, not |seen| (Iceberg fast-append, SURVEY §4.2).
        seen_delta = new_rows.select(
            "url_canon", "url_hash", "host_hash",
            F.col("round_added").alias("first_round"),
        )
        # union EVERY error part (robots + each middleware's aborts +
        # fetch misses) — middlewares append parts between the first and
        # last, so a pairwise union would silently drop them
        import functools

        errors_df = functools.reduce(lambda a, b: a.unionByName(b), errors_parts)
        # the durable transcript record (url_canon, batch_pos) — the
        # driver-side `transcript` list is an optional test convenience,
        # the parquet table is the O(batch_cap)-per-round source of truth
        transcript_df = batch.select("url_canon", "batch_pos")
        return (frontier_adds, frontier_dels, seen_delta, host_state_delta,
                errors_df, extracted, transcript_df, c, transcript, n_valid)

    def _make_tick(self, r: int):
        if not self.config.timing:
            return lambda label: None
        import time as _t

        last = [_t.time()]

        def tick(label: str) -> None:
            now = _t.time()
            print("    [r%d] %-14s %.2fs" % (r, label, now - last[0]), flush=True)
            last[0] = now

        return tick

    def robots_fingerprint(self) -> dict:
        """Order-independent fingerprint of the politeness inputs the
        merge-on-read frontier's predicate-deletes depend on. Stored in
        every manifest and asserted on resume/read: a workdir replayed
        under DIFFERENT robots rules (or default delay) would silently
        reconstruct a different frontier than was committed — fail loudly
        instead. Computed in Spark (bit_xor of per-row xxhash64), never
        collected: robots is a per-host dim table that can be huge."""
        if self._robots_fp is None:
            row = self.robots.agg(
                F.count("*").alias("n"),
                F.coalesce(
                    F.expr(
                        "bit_xor(xxhash64(host, concat_ws('|', disallow), crawl_delay))"
                    ),
                    F.lit(0),
                ).alias("fp"),
            ).collect()[0]
            self._robots_fp = {
                "n": int(row.n),
                "fp": int(row.fp),
                "default_crawl_delay": self.config.default_crawl_delay,
            }
        return self._robots_fp

    def _check_robots_fp(self, manifest: dict, what: str) -> None:
        committed = manifest.get("robots")
        if committed is not None and committed != self.robots_fingerprint():
            raise ValueError(
                "%s: robots/politeness inputs differ from the ones snapshot "
                "%s was committed under (committed %s, engine has %s) — the "
                "frontier log's predicate-deletes would reconstruct a "
                "different frontier. Rebuild the engine with the original "
                "robots table, or start a fresh workdir."
                % (what, manifest.get("snapshot_id"), committed, self._robots_fp)
            )

    def _check_seen_buckets(self, manifest: dict, what: str) -> None:
        """Bucketed seen deltas store ``sb = pmod(url_hash, B)`` as a
        hive partition VALUE — it is only meaningful under the B it was
        written with. Resuming with a different ``seen_buckets`` would
        make ``_links_minus_seen``'s partition prune (computed with the
        new B) silently skip partitions holding matching seen rows, so
        seen urls would re-enter the frontier — breaking the invariant
        the frontier log's delete exactness depends on. Same
        pin-and-assert pattern as the robots fingerprint."""
        committed = manifest.get("seen_buckets")
        if committed is not None and committed != self.config.seen_buckets:
            raise ValueError(
                "%s: snapshot %s was committed with seen_buckets=%d but the "
                "engine is configured with seen_buckets=%d — the bucketed "
                "seen deltas' sb partition values would no longer line up "
                "with the membership probe's prune and seen urls would "
                "re-enter the frontier. Resume with seen_buckets=%d (a "
                "compaction under the new B must rewrite every delta), or "
                "start a fresh workdir."
                % (
                    what,
                    manifest.get("snapshot_id"),
                    committed,
                    self.config.seen_buckets,
                    committed,
                )
            )

    def _check_frontier_stamped(self, manifest: dict, what: str) -> None:
        """Frontier rows carry their robots verdict/crawl_delay as
        STAMPED columns (round 4). A workdir committed by a pre-stamping
        engine stores frontier parquet without those columns — the
        schema-on-read fills NULLs, which the round loop would coalesce
        to denied=False / default delay: previously-denied urls would be
        fetched (robots violation) and budgets would use the wrong
        delay. With politeness active that is a silent semantic break,
        so fail loudly (same pin-and-assert pattern as seen_buckets);
        with politeness inactive the stamped columns are unused and the
        legacy workdir resumes fine."""
        if manifest.get("frontier_stamped") or not self._politeness_active:
            return
        raise ValueError(
            "%s: this workdir's frontier log predates add-time robots "
            "stamping (no 'frontier_stamped' manifest pin) and politeness "
            "is active — resuming would treat every queued row as "
            "robots-allowed with the default crawl delay. Re-crawl into a "
            "fresh workdir (or resume with politeness disabled if that "
            "matches the original run's config)." % what
        )

    # -- robots dimension: persisted bucketed layout + add-time stamping ----
    _ROBOTS_DIM_SCHEMA = (
        "host string, disallow array<string>, crawl_delay double"
    )

    def _ensure_robots_dim(self) -> None:
        """Persist the robots table under ``workdir/robots_dim`` in the
        seen log's bucketed layout (hive-partitioned by
        rb = pmod(hash(host), robots_buckets), host-sorted files) so the
        per-round stamp probe is a partition-pruned SCAN — robots is
        never broadcast or shuffled by the round loop. Written once per
        workdir; reused across resumes when the stored fingerprint and
        bucket count match the engine's (robots is static per run — the
        manifest fingerprint already rejects resumes under different
        rules), rewritten otherwise (the dir is a cache of the
        constructor-provided robots_df, not state)."""
        B = self.config.robots_buckets
        if not B or not self._politeness_active or self._n_robots == 0:
            return
        if self._n_robots <= self._robots_bc_max():
            return  # small-dim stamp broadcasts outright — no dim needed
        final = os.path.join(self.config.workdir, "robots_dim")
        meta_p = os.path.join(final, "_meta.json")
        want = {"buckets": B, "fp": self.robots_fingerprint()}
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                if json.load(f) == want:
                    self._robots_dim_path = final
                    return
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        (
            self.robots.withColumn(
                "rb", F.pmod(F.hash("host"), F.lit(B)).cast("int")
            )
            .repartition(B, "rb")
            .sortWithinPartitions("rb", "host")
            .write.mode("overwrite")
            .partitionBy("rb")
            .parquet(tmp)
        )
        with open(os.path.join(tmp, "_meta.json"), "w") as f:
            json.dump(want, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        self._robots_dim_path = final

    def _robots_scan(self) -> tuple[DataFrame, bool]:
        """(robots source, bucketed?) — the persisted bucketed scan when
        available, else the constructor-provided DataFrame."""
        if self._robots_dim_path:
            return (
                self.spark.read.option("basePath", self._robots_dim_path)
                .schema(self._ROBOTS_DIM_SCHEMA + ", rb int")
                .parquet(self._robots_dim_path),
                True,
            )
        return self.robots, False

    def _stamp_robots(
        self, df: DataFrame, n_probe: int, hosts_src: DataFrame | None = None
    ) -> DataFrame:
        """Stamp (crawl_delay, denied) onto rows ENTERING the frontier.

        ``df`` is bounded (one batch's link fan-out / a seed list / a
        staged drain), so the join runs as the same scan-side probe the
        seen membership check uses: prune the robots scan to the hosts'
        rb buckets, left-semi it against the broadcast host set (robots
        is only SCANNED — never shuffled, never fully broadcast), and
        broadcast the ≤|hosts| surviving slice back onto the rows.
        Probes above the broadcast row cap fall back to a shuffle join
        (AQE applies). With politeness inactive the stamp is two
        literals — no jobs.

        Round 5: (a) a robots table small enough to broadcast outright
        (≤ the same row cap the seen probe derives from
        autoBroadcastJoinThreshold) skips the host probe entirely — one
        broadcast join, ZERO driver jobs per stamp; this removes the
        fixed ~1 s/round probe floor BENCH §e6 measured below ~10^6
        hosts while keeping the flat pruned-scan asymptotics above it.
        (b) ``hosts_src``, when given, must be a MATERIALIZED frame
        whose distinct hosts are a superset of df's — the strategy
        probe collects from it instead of re-evaluating df's
        un-checkpointed plan (the links path hands the checkpointed
        pre-anti-join frame, so the seen anti-join is not run twice
        per round)."""
        if not self._politeness_active or self._n_robots == 0:
            return df.withColumn(
                "crawl_delay", F.lit(None).cast("double")
            ).withColumn("denied", F.lit(False))
        rsrc, bucketed = self._robots_scan()
        denied = F.coalesce(
            F.exists(
                F.coalesce(F.col("disallow"), F.array().cast("array<string>")),
                lambda p: F.col("path").startswith(p),
            ),
            F.lit(False),
        )
        if self._n_robots <= self._robots_bc_max():
            if self._robots_small is None:
                # materialized once, broadcast from cached blocks every
                # later stamp (no per-round scan/footer re-read)
                self._robots_small = rsrc.select(
                    "host", "disallow", "crawl_delay"
                ).localCheckpoint(eager=False)
            joined = df.join(F.broadcast(self._robots_small), "host", "left")
            return joined.withColumn("denied", denied).drop("disallow")
        # strategy selection is by DISTINCT HOSTS, not link rows: the
        # broadcast side is always the ≤|hosts| robots slice (never the
        # links), so a 10^6-link fan-out over a few hundred hosts still
        # takes the pruned-scan probe — gating on n_probe here would
        # needlessly fall back to a full robots shuffle join exactly in
        # the production case (large batches, few hosts).
        hosts = (hosts_src if hosts_src is not None else df).select("host").distinct()
        cap = self.config.seen_prune_max_probe
        # ONE bounded job fetches (host, rb) pairs — limit cap+1 so an
        # over-cap host set is detected without a count job
        pairs = hosts.select(
            "host",
            F.pmod(F.hash("host"), F.lit(self.config.robots_buckets or 1))
            .cast("int")
            .alias("rb"),
        ).limit(cap + 1).collect()
        if not pairs:
            return df.withColumn(
                "crawl_delay", F.lit(None).cast("double")
            ).withColumn("denied", F.lit(False))
        if len(pairs) <= cap:
            # small host set: TWO pushable predicates replace the
            # semi-join — the rb isin prunes hive partitions, the
            # host isin skips row groups via the host-sorted files'
            # min/max stats. The robots scan cost is then ~flat in
            # |robots| (O(touched row groups), not O(table)).
            if bucketed:
                touched = sorted({p.rb for p in pairs})
                if len(touched) < self.config.robots_buckets:
                    rsrc = rsrc.filter(F.col("rb").isin(touched))
            rslice = rsrc.filter(
                F.col("host").isin([p.host for p in pairs])
            ).select("host", "disallow", "crawl_delay")
            joined = df.join(F.broadcast(rslice), "host", "left")
        else:
            # > cap distinct hosts: the isin/prune lists stop paying.
            # n_probe bounds |hosts|, so when the LINKS fit the probe
            # budget the host set certainly does — semi-join the scan
            # against the broadcast host set and broadcast the slice
            # back. Past that, one bounded count decides; only a host
            # set too big to broadcast falls to the shuffle join
            # (against the persisted scan — the constructor DataFrame
            # may be an arbitrary upstream plan; AQE skew-split applies).
            n_hosts = (
                n_probe if n_probe <= self._seen_probe_max() else hosts.count()
            )
            if n_hosts <= self._seen_probe_max():
                rslice = rsrc.select("host", "disallow", "crawl_delay").join(
                    F.broadcast(hosts), "host", "leftsemi"
                )
                joined = df.join(F.broadcast(rslice), "host", "left")
            else:
                joined = df.join(
                    rsrc.select("host", "disallow", "crawl_delay"),
                    "host",
                    "left",
                )
        return joined.withColumn("denied", denied).drop("disallow")

    # -- host_state merge-on-read delta log ----------------------------------
    # Each round appends only the batch's host-clock updates; the state
    # is the per-host MAX of next_time over the log (updates are strictly
    # increasing per host since robots/delays are static per run and
    # next_time' = greatest(nt, r) + k·d > nt for k ≥ 1, d > 0). The
    # round loop never materializes the full table: the budget formula
    # only distinguishes hosts with next_time > r (for nt ≤ r,
    # greatest(nt, r) = r — identical to the host being absent), so the
    # per-round join broadcasts the ACTIVE slice — hosts still on
    # cooldown, bounded by recent fetch activity — never all hosts ever
    # fetched. The old design broadcast and fully rewrote host_state
    # every round: O(|hosts|) per round at a 10^8-host frontier.
    def _read_host_state_deltas(
        self, rels: list[str], extra_paths: list[str] | None = None
    ) -> DataFrame:
        paths = [os.path.join(self.config.workdir, rel) for rel in rels] + list(
            extra_paths or []
        )
        if not paths:
            return self.spark.createDataFrame([], _HOST_STATE_SCHEMA)
        return self.spark.read.schema(_HOST_STATE_SCHEMA).parquet(*paths)

    @staticmethod
    def _merge_host_state(deltas: DataFrame) -> DataFrame:
        """Full merged view (one row per host) — read_table/compaction;
        the round loop uses _active_host_state instead."""
        return deltas.groupBy("host").agg(F.max("next_time").alias("next_time"))

    @staticmethod
    def _active_host_state(deltas: DataFrame, r: int) -> DataFrame:
        """Hosts still on cooldown at round r. Filtering next_time > r
        BEFORE the merge is exact (the per-host max survives iff it is
        > r, and max over the surviving subset equals the overall max)
        and pushes to parquet row-group stats; the groupBy then shuffles
        only cooldown rows, not the full host history."""
        return (
            deltas.filter(F.col("next_time") > r)
            .groupBy("host")
            .agg(F.max("next_time").alias("next_time"))
        )

    # -- snapshot catalog (Iceberg-style: ids, lineage, time travel) -------
    def snapshots(self) -> list[dict]:
        """All committed snapshot manifests, oldest first."""
        if not os.path.isdir(self.config.workdir):
            return []
        out = []
        for d in sorted(os.listdir(self.config.workdir)):
            mf = os.path.join(self.config.workdir, d, "manifest.json")
            if d.startswith("round_") and not d.endswith(".tmp") and os.path.exists(mf):
                with open(mf) as f:
                    out.append(json.load(f))
        return out

    def read_table(self, name: str, snapshot: int | None = None) -> DataFrame:
        """Time-travel read: a state table (frontier/seen/host_state/
        errors/extracted/transcript) at a given committed round (default:
        latest). Raises if that table was pruned by retention/compaction.

        ``seen`` is append-only: each manifest lists the delta dirs whose
        union IS the seen set at that snapshot — the read unions them
        (merge-on-read); nothing is ever rewritten except by compaction.
        """
        r = snapshot if snapshot is not None else self.latest_round()
        if r is None:
            raise FileNotFoundError("no committed snapshot in %s" % self.config.workdir)
        if name == "frontier":
            mf = os.path.join(self.config.workdir, "round_%05d" % r, "manifest.json")
            with open(mf) as f:
                manifest = json.load(f)
            self._check_robots_fp(manifest, "read_table('frontier')")
            self._check_frontier_stamped(manifest, "read_table('frontier')")
            log = manifest["frontier_log"]
            missing = [
                p
                for p in [log["base"], *log["adds"], *log["dels"]]
                if not os.path.isdir(os.path.join(self.config.workdir, p))
            ]
            if missing:
                raise FileNotFoundError(
                    "frontier log dirs %s for snapshot r%05d were compacted away "
                    "(retention?)" % (missing, r)
                )
            return self._read_frontier(log, r)
        if name == "seen":
            mf = os.path.join(self.config.workdir, "round_%05d" % r, "manifest.json")
            with open(mf) as f:
                manifest = json.load(f)
            self._check_seen_buckets(manifest, "read_table('seen')")
            rels = manifest.get("seen_deltas", [])
            missing = [p for p in rels if not os.path.isdir(os.path.join(self.config.workdir, p))]
            if missing:
                raise FileNotFoundError(
                    "seen deltas %s for snapshot r%05d were compacted away (retention?)"
                    % (missing, r)
                )
            return self._read_seen(rels)
        if name == "host_state":
            mf = os.path.join(self.config.workdir, "round_%05d" % r, "manifest.json")
            with open(mf) as f:
                manifest = json.load(f)
            # merge-on-read: the manifest lists the delta dirs whose
            # per-host MAX is the host-clock table at that snapshot
            # (next_time strictly increases per host — see the delta-log
            # notes above). Legacy manifests stored the full table in the
            # round dir: a valid one-entry delta set.
            rels = manifest.get("host_state_deltas", ["round_%05d/host_state" % r])
            missing = [
                p for p in rels
                if not os.path.isdir(os.path.join(self.config.workdir, p))
            ]
            if missing:
                raise FileNotFoundError(
                    "host_state deltas %s for snapshot r%05d were compacted "
                    "away (retention?)" % (missing, r)
                )
            return self._merge_host_state(self._read_host_state_deltas(rels))
        path = os.path.join(self.config.workdir, "round_%05d" % r, name)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                "table %r not present at snapshot r%05d (retention?)" % (name, r)
            )
        schema = {
            "host_state": _HOST_STATE_SCHEMA,
        }.get(name)
        reader = self.spark.read.schema(schema) if schema else self.spark.read
        return reader.parquet(path)

    def diff_snapshots(self, from_snapshot: int, to_snapshot: int) -> dict:
        """Incremental changefeed (CDC export) between two committed
        rounds — the Iceberg ``incremental read`` shape on this engine's
        delta-log manifests. Returns a dict of DataFrames:

        - ``seen_added``: urls first seen in ``(from, to]``. The seen set
          is an APPEND-ONLY delta log, so this is pure log arithmetic —
          read only the delta dirs the ``to`` manifest lists beyond the
          ``from`` manifest, O(changed rows) with no join. If compaction
          rewrote the log between the snapshots (``from``'s dirs are no
          longer a subset of ``to``'s) it falls back to an exact
          bucket-colocated anti-join of the two materialized reads.
        - ``frontier_added`` / ``frontier_removed``: exact url-keyed
          anti-joins of the two materialized frontiers. There is no
          "changed" class WITHIN a manifest lineage: frontier rows are
          add-once/delete-once (the seen-set invariant — a url never
          re-enters; robots verdicts are stamped at add time), and the
          one sanctioned restamp (``rebase_robots``) opens a NEW lineage
          whose fingerprint ``read_table`` already refuses to mix.
        - ``host_state_changed``: hosts whose politeness clock advanced,
          with the new clock. Fast path mirrors ``seen_added``: merge
          only the delta dirs added after ``from`` — exact because
          ``next_time`` strictly increases per host, so the max over the
          new deltas IS the host's value at ``to``. Legacy full-table
          layouts (no ``host_state_deltas`` manifest key) take the exact
          join fallback.
        - ``extracted_added``: the extraction sink rows produced in
          rounds ``(from, to]`` (one multi-dir scan of the per-round
          sink dirs that still exist under retention) — the "new
          training data since snapshot N" export the curation pipeline
          consumes.

        At 100 TB every fast path here is metadata-bounded: CDC cost
        scales with the CHANGE volume, never with accumulated state;
        only the frontier diff touches full state, and the live frontier
        is the bounded working set, orders smaller than seen.
        """
        if from_snapshot > to_snapshot:
            raise ValueError(
                "from_snapshot %d > to_snapshot %d" % (from_snapshot, to_snapshot)
            )
        mfs = {}
        for r in (from_snapshot, to_snapshot):
            mf = os.path.join(self.config.workdir, "round_%05d" % r, "manifest.json")
            if not os.path.exists(mf):
                raise FileNotFoundError("no committed snapshot r%05d" % r)
            with open(mf) as f:
                mfs[r] = json.load(f)
        mf0, mf1 = mfs[from_snapshot], mfs[to_snapshot]

        # seen: append-only log → set difference of delta dirs
        s0, s1 = mf0.get("seen_deltas", []), mf1.get("seen_deltas", [])
        new_rels = [p for p in s1 if p not in set(s0)]
        if set(s0) <= set(s1) and all(
            os.path.isdir(os.path.join(self.config.workdir, p)) for p in new_rels
        ):
            self._check_seen_buckets(mf1, "diff_snapshots('seen')")
            seen_added = self._read_seen(new_rels)
        else:  # compacted between the snapshots: exact fallback
            seen_added = self.read_table("seen", to_snapshot).join(
                self.read_table("seen", from_snapshot).select("url_hash"),
                "url_hash",
                "left_anti",
            )

        f0 = self.read_table("frontier", from_snapshot)
        f1 = self.read_table("frontier", to_snapshot)
        frontier_added = f1.join(f0.select("url"), "url", "left_anti")
        frontier_removed = f0.join(f1.select("url"), "url", "left_anti")

        h0_rels = mf0.get("host_state_deltas")
        h1_rels = mf1.get("host_state_deltas")
        if (
            h0_rels is not None
            and h1_rels is not None
            and set(h0_rels) <= set(h1_rels)
        ):
            new_h = [p for p in h1_rels if p not in set(h0_rels)]
            host_state_changed = self._merge_host_state(
                self._read_host_state_deltas(new_h)
            )
        else:
            old = self.read_table("host_state", from_snapshot).select(
                "host", F.col("next_time").alias("__old")
            )
            host_state_changed = (
                self.read_table("host_state", to_snapshot)
                .join(old, "host", "left")
                .filter(F.col("__old").isNull() | (F.col("next_time") > F.col("__old")))
                .drop("__old")
            )

        ex_dirs = [
            os.path.join(self.config.workdir, "round_%05d" % r, "extracted")
            for r in range(from_snapshot + 1, to_snapshot + 1)
        ]
        ex_dirs = [p for p in ex_dirs if os.path.isdir(p)]
        extracted_added = (
            self.spark.read.schema(_EXTRACT_SCHEMA).parquet(*ex_dirs)
            if ex_dirs
            else self.spark.createDataFrame([], _EXTRACT_SCHEMA)
        )

        return {
            "seen_added": seen_added,
            "frontier_added": frontier_added,
            "frontier_removed": frontier_removed,
            "host_state_changed": host_state_changed,
            "extracted_added": extracted_added,
        }

    # -- seen delta log ----------------------------------------------------
    # The seen set is an append-only log of hash-BUCKETED delta dirs:
    # each dir is hive-partitioned by sb = pmod(url_hash, seen_buckets),
    # with files range-laid-out and sorted by url_hash (parquet min/max
    # row-group stats line up with the probe key). This is SURVEY §4.2's
    # "partition seen by bucket(hash, B)" promise: the per-round
    # membership check (``_links_minus_seen``) prunes its scan to the
    # buckets the round's links touch and probes with a broadcast hash
    # join — the seen side is only ever SCANNED, never shuffled.
    def _read_seen(self, rels: list[str]) -> DataFrame:
        """The seen set = the delta-log dirs (merge-on-read), read as ONE
        multi-path scan; carries the ``sb`` bucket column for partition
        pruning.

        One scan, not a union of per-dir reads: the dirs are laid out as
        hive partitions ``seen_deltas/delta=<name>/sb=NN`` so a single
        ``parquet(p1, p2, …)`` with ``basePath=seen_deltas`` covers the
        manifest's delta list.  A per-dir union would make every
        downstream join fan out per branch — the membership check's
        broadcast of the links batch was rebuilt once PER DELTA DIR
        (measured: dedup_antijoin 2× slower by round 3 of a crawl) —
        while the single scan keeps it one scan node + one broadcast
        however many deltas the log holds."""
        if not rels:
            return self.spark.createDataFrame([], _SEEN_BUCKETED_SCHEMA)
        base = os.path.join(self.config.workdir, "seen_deltas")
        cols = [f.name for f in _SEEN_BUCKETED_SCHEMA.fields]
        # legacy dirs (pre-bucketing layout: flat `seen_deltas/<name>`,
        # no delta=/sb= structure) cannot share the partitioned scan —
        # mixing them raises CONFLICTING_DIRECTORY_STRUCTURES, and read
        # alone they'd surface sb=NULL and be dropped by the bucket
        # prune. They are read flat and their sb COMPUTED from url_hash
        # (same pmod as the writer), so resumed old workdirs stay exact
        # and even prune correctly (row-filter, not file-prune).
        new_rels = [r for r in rels if os.path.basename(r).startswith("delta=")]
        old_rels = [r for r in rels if not os.path.basename(r).startswith("delta=")]
        parts = []
        if new_rels:
            paths = [os.path.join(self.config.workdir, rel) for rel in new_rels]
            parts.append(
                self.spark.read.option("basePath", base)
                .schema(_SEEN_BUCKETED_SCHEMA)
                .parquet(*paths)
                .select(*cols)
            )
        if old_rels:
            paths = [os.path.join(self.config.workdir, rel) for rel in old_rels]
            parts.append(
                self.spark.read.schema(_SEEN_SCHEMA)
                .parquet(*paths)
                .withColumn(
                    "sb",
                    F.pmod(
                        F.col("url_hash"), F.lit(self.config.seen_buckets)
                    ).cast("int"),
                )
                .select(*cols)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _write_seen_delta(self, df: DataFrame, name: str, large: bool = False) -> str:
        """Write one bucketed seen delta dir atomically; returns the
        workdir-relative path the manifest should reference.

        Layout: partitionBy(sb) subdirs, files url_hash-sorted either
        way. Per-round deltas (bounded by one batch's fan-out) hash-
        repartition on sb alone — ≤B one-file tasks and, unlike a range
        repartition, NO sampling pass over the input (a whole extra job
        per round, measured ~0.6 s at bench scale). Compaction rewrites
        the entire seen set, where intra-bucket parallelism matters more
        than one saved job: `large=True` keeps the range layout on
        (sb, url_hash) so every core gets a slice of the big buckets."""
        rel = os.path.join("seen_deltas", "delta=" + name)
        final = os.path.join(self.config.workdir, rel)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        B = self.config.seen_buckets
        out = df.select(*[f.name for f in _SEEN_SCHEMA.fields]).withColumn(
            "sb", F.pmod(F.col("url_hash"), F.lit(B)).cast("int")
        )
        if large:
            out = out.repartitionByRange(max(B, self._parallelism), "sb", "url_hash")
        else:
            out = out.repartition(B, "sb")
        out = out.sortWithinPartitions("sb", "url_hash")
        out.write.mode("overwrite").partitionBy("sb").parquet(tmp)
        if os.path.exists(final):  # replay of an uncommitted round
            shutil.rmtree(final)
        os.rename(tmp, final)
        return rel

    # conservative broadcast-row estimate for the membership probe:
    # url_hash (8 B) + average url_canon (~60 B) + BroadcastHashedRelation
    # per-row overhead. Used only to DERIVE a row cap from the byte-based
    # broadcast threshold; the probe is broadcast explicitly either way.
    _PROBE_ROW_BYTES = 96

    def _robots_bc_max(self) -> int:
        """Row cap under which the whole robots table is broadcast by
        the stamp instead of host-probed (config override, else the
        same autoBroadcastJoinThreshold-derived cap the seen probe
        uses)."""
        if self.config.robots_broadcast_max is not None:
            return self.config.robots_broadcast_max
        return self._seen_probe_max()

    def _seen_probe_max(self) -> int:
        """Resolved row cap for the scan-probe membership strategy.

        Explicit ``config.seen_probe_broadcast_max`` wins. Otherwise the
        cap is ``autoBroadcastJoinThreshold / ~96 B-per-row`` — the same
        byte budget the cluster operator already sized for broadcast
        joins, re-expressed in probe rows (Spark's 10 MB default ⇒
        ~109k rows; a 256 MB memory-rich setting ⇒ ~2.8M). The probe
        path broadcasts up to 2× this many rows per round (candidates +
        hits), which is why the cap tracks the operator's knob instead
        of a hardcoded row count that could be hundreds of MB at
        realistic URL lengths."""
        if self.config.seen_probe_broadcast_max is not None:
            return self.config.seen_probe_broadcast_max
        raw = str(
            self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        ).strip().lower()
        mult = 1
        for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                          ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                          ("b", 1)):
            if raw.endswith(suffix):
                raw, mult = raw[: -len(suffix)], m
                break
        try:
            thr = int(raw) * mult
        except ValueError:
            thr = 10 << 20
        if thr <= 0:  # auto-broadcast disabled ≠ probe disabled: keep the
            thr = 10 << 20  # default byte budget for the explicit hint
        return max(thr // self._PROBE_ROW_BYTES, 1)

    def _links_minus_seen(
        self, links: DataFrame, seen: DataFrame, n_probe: int
    ) -> DataFrame:
        """links ∖ seen — the per-round membership check.

        Scan-side strategy (the 10^10-row plan): a plain
        ``links.join(seen, "left_anti")`` shuffles BOTH sides, i.e. the
        entire seen set re-crosses the network every round (measured
        linear in |seen|: 61.9 s at 128M rows). Instead, since the links
        side is bounded by one batch's fan-out:

          1. prune: collect the ≤seen_buckets distinct ``sb`` values the
             links hash into (tiny job) and filter the seen scan to those
             hive partitions;
          2. hits = pruned_seen ⋉ broadcast(links)  — a broadcast hash
             LEFT-SEMI join that streams the seen scan past a hash table
             of the links' (url_hash, url_canon) keys: no shuffle, no
             sort, and |hits| ≤ |links|;
          3. unseen = links ⋉̸ broadcast(hits) — exact anti semantics.

        Equality is checked on url_canon (url_hash rides along for the
        cheap 64-bit reject), so this is EXACTLY the anti-join. Above
        ``seen_probe_broadcast_max`` candidates (by default derived from
        ``spark.sql.autoBroadcastJoinThreshold`` — see
        :meth:`_seen_probe_max`) the classic shuffle anti-join takes
        over (AQE skew-split applies there)."""
        if n_probe > self._seen_probe_max():
            return links.join(seen.select("url_canon"), "url_canon", "left_anti")
        B = self.config.seen_buckets
        probe = links.select("url_hash", "url_canon")
        pruned = seen
        if n_probe <= self.config.seen_prune_max_probe:
            # small probe: its distinct buckets are worth a (tiny) job —
            # the scan skips every other bucket's files entirely
            touched = [
                r.sb
                for r in probe.select(
                    F.pmod(F.col("url_hash"), F.lit(B)).cast("int").alias("sb")
                )
                .distinct()
                .collect()
            ]
            if not touched:
                return links
            if len(touched) < B:
                # sb IS NULL escape: deltas written by the pre-bucketing
                # layout (resumed old workdirs) surface sb=NULL — they
                # must always be scanned, not silently pruned away
                # (dropping them would re-admit seen urls and break the
                # never-re-enters invariant)
                pruned = seen.filter(
                    F.col("sb").isin(touched) | F.col("sb").isNull()
                )
        hits = pruned.select("url_hash", "url_canon").join(
            F.broadcast(probe), ["url_hash", "url_canon"], "leftsemi"
        )
        return links.join(
            F.broadcast(hits.select("url_canon")), "url_canon", "left_anti"
        )

    def _write_delta(
        self, df: DataFrame, name: str, log: str = "seen_deltas", large: bool = False
    ) -> str:
        """Write one delta dir atomically (tmp + rename); returns the
        workdir-relative path the manifest should reference. Seen deltas
        route through the bucketed writer."""
        if log == "seen_deltas":
            return self._write_seen_delta(df, name, large=large)
        rel = os.path.join(log, name)
        final = os.path.join(self.config.workdir, rel)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):  # replay of an uncommitted round
            shutil.rmtree(final)
        os.rename(tmp, final)
        return rel

    # -- frontier merge-on-read log ----------------------------------------
    # The frontier is an Iceberg-v2-style log: a materialized `base` plus
    # per-round `adds` (new links) and `dels` (dequeued batch urls). A
    # read unions base+adds, anti-joins the broadcast del set, and drops
    # expired / robots-denied rows BY PREDICATE — deadlines and robots
    # rules are static per row/engine, so those (potentially unbounded)
    # delete sets never need materializing:
    #   - a row is expired-dropped the first round it is processed with
    #     deadline ≤ r, hence gone from every snapshot ≥ max(round it
    #     could have been processed) → filter (round_added ≤ r AND
    #     deadline ≤ r);
    #   - robots-denied rows drop at their first processed round →
    #     filter (round_added ≤ r AND denied).
    # New rows (round_added == r+1) are exempt from both, matching the
    # round loop, which only expires/denies rows it dequeues from the
    # previous snapshot.
    def _read_frontier(
        self, log: dict, upto_r: int, denied_filter: bool = False
    ) -> DataFrame:
        wd = self.config.workdir
        # ONE multi-path scan for base+adds and one for dels (the dirs
        # are flat, so no basePath gymnastics needed): a per-dir union
        # adds a scan node + file listing per accumulated delta dir,
        # growing the plan with crawl age for no benefit.
        f = self.spark.read.schema(_FRONTIER_SCHEMA).parquet(
            *[os.path.join(wd, rel) for rel in [log["base"]] + list(log["adds"])]
        )
        if log["dels"]:
            dels = self.spark.read.schema("url_canon string").parquet(
                *[os.path.join(wd, d) for d in log["dels"]]
            )
            f = f.join(F.broadcast(dels), "url_canon", "left_anti")
        processed = F.col("round_added") <= upto_r
        expired = F.col("deadline").isNotNull() & (F.col("deadline") <= upto_r)
        f = f.filter(~(processed & expired))
        # rebase_robots() re-stamps the log under NEW rules at round k
        # (log["restamped_at"] = k): a re-stamped denial counts as
        # "processed" only from round k on — max(round_added, k) ≤ upto_r
        # — so the resume read KEEPS newly-denied rows for round k to
        # error-and-drop (exactly like a freshly added denied row), while
        # rows added after the rebase keep the normal round_added rule.
        restamp = log.get("restamped_at")
        processed_denied = (
            processed
            if restamp is None
            else F.greatest(F.col("round_added"), F.lit(restamp)) <= upto_r
        )
        if self._politeness_active or denied_filter:
            # the robots verdict is a COLUMN stamped when the row entered
            # the frontier — the merge-on-read never touches the robots
            # table (the old per-read broadcast(robots) join shipped the
            # whole dimension to every executor on every frontier read;
            # GBs at a 10^8-host web-scale frontier). denied is non-null
            # by construction — pre-stamping workdirs are rejected by
            # _check_frontier_stamped when politeness is active.
            # denied_filter=True forces the predicate even when THIS
            # engine's politeness is inactive: rebase_robots() reading
            # the OLD epoch's log must keep its processed denials
            # dropped (refmodel step-2 drops are permanent) even when
            # the NEW rules turn politeness off.
            denied_cond = F.coalesce(F.col("denied"), F.lit(False))
            f = f.filter(~(processed_denied & denied_cond))
        return f.select(*_FRONTIER_COLS)

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

    # -- robots epoch switch -------------------------------------------------
    def rebase_robots(self) -> dict:
        """Adopt NEW robots/politeness rules for a committed workdir —
        the sanctioned epoch switch (reference users re-fetch robots.txt
        between crawls; cf. the deadline/TTL freshness semantics in
        ``nsq/nsqcrawl/queue.go:90-94``).

        Construct the engine with the NEW robots_df over the OLD
        workdir and call this BEFORE ``run(resume=True)`` — a plain
        resume under changed rules is rejected by the fingerprint pin
        (`_check_robots_fp`). One bounded pass re-stamps the LIVE
        frontier under the new rules and atomically rewrites the latest
        manifest to open the new lineage:

        * the live view is read under the OLD epoch's log, with the
          stamped-denied predicate FORCED (``denied_filter=True``):
          urls denied and errored in an earlier epoch stay dropped
          even if the new rules would allow them — in the refmodel
          (``tests/refmodel.py`` ``robots_switch=(k, new_robots)``,
          the oracle for this contract) step-2 drops are permanent;
        * every surviving row is re-stamped (crawl_delay, denied) via
          the same add-time probe new rows use, so budgets and
          verdicts from round k = last+1 follow the new rules;
        * the restamped rows become a fresh compacted base with
          ``restamped_at = k`` in the log: the merge-on-read counts a
          re-stamped denial as processed only from round k on, so the
          resume KEEPS newly-denied rows for round k to error-and-drop
          exactly like freshly added denied rows;
        * the latest manifest is replaced (tmp + rename, the same
          atomic-commit pattern as the round snapshots) with the new
          fingerprint, the new log and a pinned ``n_frontier``
          (re-stamping changes which logged rows are live, so the
          derived deferred+scheduled size no longer applies).

        host_state is untouched: per-host next_time survives the epoch
        (the refmodel keeps its clock across the switch), and the
        per-host-MAX merge of the host_state delta log stays valid —
        every written delta is greatest(nt, r) + k·d > nt regardless
        of which epoch's d produced it.

        Scale: the one full-frontier pass (merge + re-stamp + base
        write) is the same cost as a frontier compaction, paid once
        per epoch switch — never per round. Returns the rewritten
        manifest; no-op (manifest returned unchanged) when the rules
        already match."""
        cfg = self.config
        last = self.latest_round()
        if last is None:
            raise ValueError(
                "rebase_robots: no committed rounds under %r — nothing to "
                "rebase (run the first epoch with run())" % cfg.workdir
            )
        base = os.path.join(cfg.workdir, "round_%05d" % last)
        with open(os.path.join(base, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest.get("robots") == self.robots_fingerprint():
            return manifest  # same rules — resume directly
        self._check_seen_buckets(manifest, "rebase_robots")
        if not manifest.get("frontier_stamped"):
            raise ValueError(
                "rebase_robots: this workdir's frontier log predates "
                "add-time robots stamping — the old epoch's denials "
                "cannot be replayed. Re-crawl into a fresh workdir."
            )
        k = last + 1
        live = self._read_frontier(
            manifest["frontier_log"], last, denied_filter=True
        )
        # ONE materialization feeds the count, the stamp probe and the
        # base write — without it the merge scan + del anti-join would
        # re-run per consumer, and the probe would evaluate an
        # un-checkpointed plan (the double-evaluation rule)
        live = live.drop("crawl_delay", "denied").localCheckpoint(eager=True)
        n_frontier = live.count()
        self._ensure_robots_dim()  # new fingerprint → fresh bucketed layout
        restamped = self._stamp_robots(live, n_frontier).select(*_FRONTIER_COLS)
        new_base = self._write_delta(
            restamped, "base_rebase_%05d" % k, log="frontier_log"
        )
        old_refs = [
            manifest["frontier_log"]["base"],
            *manifest["frontier_log"]["adds"],
            *manifest["frontier_log"]["dels"],
        ]
        manifest = {
            **manifest,
            "frontier_log": {
                "base": new_base,
                "adds": [],
                "dels": [],
                "restamped_at": k,
            },
            "robots": self.robots_fingerprint(),
            "n_frontier": n_frontier,
            "rebase": {"at_round": k, "base": new_base},
        }
        tmp = os.path.join(base, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, os.path.join(base, "manifest.json"))  # atomic commit
        # the committed manifest references only the restamped base —
        # drop the old epoch's log dirs (older manifests lose
        # time-travel: the same documented retention as compaction).
        # A crash before this cleanup leaves overwritable orphans.
        for rel in old_refs:
            p = os.path.join(cfg.workdir, rel)
            if os.path.exists(p):
                shutil.rmtree(p)
        return manifest

    # -- out-of-band staged-seed pickup ------------------------------------
    _STAGED_SEQ_BASE = 1 << 50  # after every link seq of the same round

    def _pickup_staged(self, r: int, frontier: DataFrame):
        """Round-boundary pickup of out-of-band seeds (the NSQ-topic
        analog): drain the staging table, drop urls already seen,
        seq-stamp deterministically (after all link seqs of the round —
        url_canon order; the staged batch is bounded out-of-band input,
        so its single-partition stamp window is bounded too), append
        them to BOTH delta logs, and union them into this round's
        frontier. Re-drained rows are idempotent: once picked up they
        are in `seen`, so later drains drop them."""
        from ..streaming.feed import drain_staged_seeds

        staged, new_files = drain_staged_seeds(
            self.spark, self.config.staged_seeds_dir, self._staged_drained
        )
        # high-watermark: mark the files drained NOW (persisted by this
        # round's manifest commit; a crash before commit forgets them and
        # the replay re-drains — idempotent via the seen check)
        self._staged_drained |= set(new_files)
        if not new_files:
            return frontier, 0
        # bounded out-of-band batch: checkpoint once, count, then run the
        # scan-side membership check (same no-shuffle-of-seen plan as the
        # round's link dedup)
        staged = staged.localCheckpoint(eager=True)
        n_staged_raw = staged.count()
        if n_staged_raw == 0:
            return frontier, 0
        seen_now = self._read_seen(self._seen_rels)
        w_dup = Window.partitionBy("url_canon").orderBy("event_ts", "url")
        fresh = (
            self._links_minus_seen(staged, seen_now, n_staged_raw)
            .withColumn("rn", F.row_number().over(w_dup))
            .filter(F.col("rn") == 1)
            .drop("rn")
        ).localCheckpoint(eager=True)  # bounded by the staged batch
        n = fresh.count()
        if n == 0:
            return frontier, 0
        w = Window.orderBy("url_canon")
        rows = fresh.select(
            "url",
            "url_canon",
            "host",
            "path",
            "host_hash",
            "url_hash",
            F.coalesce(F.col("priority"), F.lit(0)).alias("priority"),
            F.lit(0).alias("depth"),
            F.lit(r).alias("round_added"),
            (F.lit(self._STAGED_SEQ_BASE) + F.row_number().over(w)).alias("seq"),
            F.coalesce(F.col("callbacks"), F.array().cast("array<string>")).alias(
                "callbacks"
            ),
            F.lit(None).cast("string").alias("referer"),
            "deadline",
            F.lit(False).alias("raw"),
            F.lit(None).cast("string").alias("method"),
            F.lit(None).cast(_MULTIMAP).alias("form"),
            F.lit(None).cast(_MULTIMAP).alias("query"),
            F.lit(None).cast(_MULTIMAP).alias("cookies"),
            F.lit(None).cast("map<string,string>").alias("header"),
        )
        # politeness stamp at add time (bounded by the staged batch)
        rows = self._stamp_robots(rows, n).select(*_FRONTIER_COLS)
        rows = rows.localCheckpoint(eager=True)
        # append to both logs NOW; the round's manifest commit references
        # them (a crash before commit leaves overwritable orphans — the
        # same replay semantics as the round deltas)
        self._seen_rels = self._seen_rels + [
            self._write_delta(
                rows.select(
                    "url_canon", "url_hash", "host_hash",
                    F.col("round_added").alias("first_round"),
                ),
                "delta_%05d_staged" % r,
            )
        ]
        self._frontier_log = {
            "base": self._frontier_log["base"],
            "adds": self._frontier_log["adds"]
            + [self._write_delta(rows, "add_%05d_staged" % r, log="frontier_log")],
            "dels": self._frontier_log["dels"],
        }
        return frontier.unionByName(rows), n

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
                self._check_robots_fp(manifest, "resume")
                self._check_seen_buckets(manifest, "resume")
                self._check_frontier_stamped(manifest, "resume")
                self._staged_drained = set(manifest.get("staged_drained", []))
                self._frontier_log = manifest["frontier_log"]
                frontier = self._read_frontier(self._frontier_log, last)
                self._seen_rels = manifest["seen_deltas"]
                seen = self._read_seen(self._seen_rels)
                self._host_state_rels = manifest.get(
                    "host_state_deltas",
                    # legacy manifests (pre-delta-log) stored the FULL
                    # table inside the round dir — a full table is a
                    # valid one-entry delta set (per-host max ≡ identity)
                    ["round_%05d/host_state" % last],
                )
                host_state = self._read_host_state_deltas(self._host_state_rels)
                # robots dim cache is fingerprint-validated — reused when
                # the rules match (they must: _check_robots_fp above),
                # rebuilt only for a legacy workdir that predates it
                self._ensure_robots_dim()
                # manifests are O(1): rebuild run history from the
                # per-round manifests + transcript tables (never embedded)
                res.counters = [m["counters"] for m in self.snapshots()]
                # next-frontier size is derivable from the last counters —
                # saves a count job (deferred rows + newly scheduled)
                lc = manifest["counters"]
                # rebase_robots() overrides the derived size: re-stamping
                # changes which logged rows are live, so the rebase counts
                # the new view once and pins it in the manifest
                n_frontier = manifest.get(
                    "n_frontier", lc["deferred_by_politeness"] + lc["scheduled"]
                )
                if cfg.collect_transcript:
                    # reuse the one reconstruction implementation
                    res.rounds = last + 1
                    res.transcript = res.read_transcript(spark)
                start_round = last + 1
                if cfg.use_bloom:
                    from ..operators.bloom import build_bitmaps, load_bitmaps

                    npz = os.path.join(base, "bloom.npz")
                    self._bloom = (
                        load_bitmaps(npz)
                        if os.path.exists(npz)
                        else build_bitmaps(seen, self._bloom_cfg)
                    )
            else:
                resume = False
        if not resume:
            if os.path.exists(cfg.workdir):
                shutil.rmtree(cfg.workdir)
            os.makedirs(os.path.join(cfg.workdir, "seen_deltas"))
            os.makedirs(os.path.join(cfg.workdir, "frontier_log"))
            os.makedirs(os.path.join(cfg.workdir, "host_state_log"))
            # persist the bucketed robots layout BEFORE seeding: the seed
            # stamp is the first probe against it
            self._ensure_robots_dim()
            seeded = self.seed_frontier(seeds)
            seed_seen = seeded.select(
                "url_canon", "url_hash", "host_hash", F.lit(0).alias("first_round")
            )
            # both logs' first entries: the seed rows (written once)
            self._frontier_log = {
                "base": self._write_delta(seeded, "base_seed", log="frontier_log"),
                "adds": [],
                "dels": [],
            }
            frontier = self._read_frontier(self._frontier_log, -1)
            n_frontier = self._n_seeded
            self._seen_rels = [self._write_delta(seed_seen, "delta_seed")]
            seen = self._read_seen(self._seen_rels)
            self._host_state_rels = []
            host_state = self._read_host_state_deltas(self._host_state_rels)
            if cfg.use_bloom:
                from ..operators.bloom import build_bitmaps

                self._bloom = build_bitmaps(seen, self._bloom_cfg)

        for r in range(start_round, max_rounds):
            n_staged = 0
            if cfg.staged_seeds_dir:
                frontier, n_staged = self._pickup_staged(r, frontier)
                if n_staged:
                    n_frontier += n_staged
                    seen = self._read_seen(self._seen_rels)
            # fixpoint check costs no job: the next frontier size is
            # deferred + newly-scheduled (+ staged), all already counted
            if n_frontier == 0:
                break
            if cfg.cache_frontier:
                frontier = frontier.persist()
            (frontier_adds, frontier_dels, seen_delta, host_state_n, errors_df,
             extracted, transcript_df, c, transcript, n_valid) = self._round(
                r, frontier, seen, host_state
            )
            c["staged"] = n_staged

            # materialize snapshot (truncates lineage; enables resume).
            # `seen` and `frontier` are NOT here: both go to append-only
            # delta logs — this loop's write volume is O(batch outputs),
            # never O(|seen|) or O(|frontier|).
            manifest_tables = {
                "errors": errors_df,
                "extracted": extracted.select(
                    "url_canon", "handler", "text", F.lit(r).alias("round")
                ),
                "transcript": transcript_df,
            }
            tick = self._make_tick(r)
            base = os.path.join(cfg.workdir, "round_%05d" % r)
            tmp = base + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp)
            lineage = {}
            for name, df in manifest_tables.items():
                path = os.path.join(tmp, name)
                df.write.mode("overwrite").parquet(path)
                # file-level lineage: the output files this snapshot owns
                lineage[name] = sorted(
                    f for f in os.listdir(path) if f.endswith(".parquet")
                )
                tick("write_" + name)
            # append this round's seen DELTA to the log (atomic rename; a
            # crash before manifest commit leaves an unreferenced dir,
            # which the round replay overwrites — Iceberg orphan-file
            # semantics)
            delta_rel = self._write_delta(seen_delta, "delta_%05d" % r)
            delta_abs = os.path.join(cfg.workdir, delta_rel)
            # bucketed layout: parquet files live under sb=*/ subdirs —
            # lineage records bucket-relative paths
            lineage["seen"] = sorted(
                os.path.join(os.path.relpath(dirpath, delta_abs), f)
                for dirpath, _, files in os.walk(delta_abs)
                for f in files
                if f.endswith(".parquet")
            )
            tick("write_seen_delta")
            # frontier log: append this round's add/del deltas (bounded by
            # the batch's links and batch_cap respectively); materialize a
            # new base only every `frontier_compact_every` rounds
            add_rel = self._write_delta(frontier_adds, "add_%05d" % r, log="frontier_log")
            del_rel = self._write_delta(frontier_dels, "del_%05d" % r, log="frontier_log")
            lineage["frontier"] = sorted(
                f
                for f in os.listdir(os.path.join(cfg.workdir, add_rel))
                if f.endswith(".parquet")
            )
            frontier_log_next = {
                **self._frontier_log,  # keeps a rebase's restamped_at
                "adds": self._frontier_log["adds"] + [add_rel],
                "dels": self._frontier_log["dels"] + [del_rel],
            }
            frontier_compacted_away: list[str] = []
            if len(frontier_log_next["adds"]) >= max(cfg.frontier_compact_every, 1):
                merged = self._read_frontier(frontier_log_next, r)
                new_base = self._write_delta(merged, "base_%05d" % r, log="frontier_log")
                frontier_compacted_away = [
                    frontier_log_next["base"],
                    *frontier_log_next["adds"],
                    *frontier_log_next["dels"],
                ]
                # restamped_at is intentionally dropped: the merge above
                # ran at upto_r = r ≥ the rebase round, so every
                # re-stamped denial has been processed and predicate-
                # dropped — the compacted base holds none of them.
                frontier_log_next = {"base": new_base, "adds": [], "dels": []}
                tick("compact_frontier")
            tick("write_frontier_deltas")
            # host_state delta: ≤ this batch's hosts rows, appended to the
            # merge-on-read log — the full per-host table is never
            # rewritten (the old design rewrote all |hosts| rows every
            # round: the last per-round O(|hosts|) write in the engine).
            # Skipped entirely when politeness is inactive (the delta is
            # the empty identity).
            host_state_rels_next = self._host_state_rels
            hs_compacted_away: list[str] = []
            if self._politeness_active:
                hs_rel = self._write_delta(
                    host_state_n, "hs_%05d" % r, log="host_state_log"
                )
                lineage["host_state"] = sorted(
                    f
                    for f in os.listdir(os.path.join(cfg.workdir, hs_rel))
                    if f.endswith(".parquet")
                )
                host_state_rels_next = host_state_rels_next + [hs_rel]
                tick("write_host_state_delta")
                if (
                    cfg.host_state_compact_min_deltas
                    and len(host_state_rels_next)
                    >= cfg.host_state_compact_min_deltas
                ):
                    hs_compact = self._write_delta(
                        self._merge_host_state(
                            self._read_host_state_deltas(host_state_rels_next)
                        ),
                        "hs_compact_%05d" % r,
                        log="host_state_log",
                    )
                    hs_compacted_away = host_state_rels_next
                    host_state_rels_next = [hs_compact]
                    tick("compact_host_state")
            seen_rels_next = self._seen_rels + [delta_rel]
            compacted_away: list[str] = []
            if (
                cfg.seen_compact_min_deltas
                and len(seen_rels_next) >= cfg.seen_compact_min_deltas
            ):
                compact_rel = self._write_delta(
                    self._read_seen(seen_rels_next), "compact_%05d" % r, large=True
                )
                compacted_away = seen_rels_next
                seen_rels_next = [compact_rel]
                tick("compact_seen")
            # per-partition metrics of the round's fetch output
            # (north_rule: per-partition lineage + counters)
            part_rows = {
                int(row.pid): row.n
                for row in extracted.groupBy(
                    F.spark_partition_id().alias("pid")
                ).agg(F.count("*").alias("n")).collect()
            }

            # seen_delta projects the localCheckpointed new_rows — count
            # THAT (cheap RDD count), not a disk re-read of the freshly
            # written 64-subdir delta (file listing + scan, a whole extra
            # job per round for a number already in memory)
            n_new = seen_delta.count()
            c["scheduled"] = n_new
            c["deduped"] = n_valid - n_new
            if self._bloom is not None:
                from ..operators.bloom import save_bitmaps, update_bitmaps

                if n_new:
                    self._bloom = update_bitmaps(
                        self._bloom,
                        seen_delta.select("url_hash", "host_hash"),
                        self._bloom_cfg,
                    )
                save_bitmaps(self._bloom, os.path.join(tmp, "bloom.npz"))
            c["errors"] = spark.read.parquet(os.path.join(tmp, "errors")).count()
            if transcript is not None:
                res.transcript.append(transcript)
            res.counters.append(c)

            # O(1) manifest: per-round counters + parent pointer + this
            # snapshot's file lists — never the cumulative transcript
            manifest = {
                "round": r,
                "snapshot_id": "r%05d" % r,
                "parent_snapshot": ("r%05d" % (r - 1)) if r > start_round or resume else None,
                "counters": c,
                "seen_deltas": seen_rels_next,
                "frontier_log": frontier_log_next,
                "host_state_deltas": host_state_rels_next,
                # politeness-input fingerprint: predicate-deletes in the
                # frontier log are only valid under these robots rules
                "robots": self.robots_fingerprint(),
                # bucketed seen deltas' sb values are only meaningful
                # under this B — pinned and asserted on resume/read
                "seen_buckets": cfg.seen_buckets,
                # frontier rows carry stamped robots columns (round 4) —
                # pinned so pre-stamping workdirs fail loudly on resume
                "frontier_stamped": True,
                # staged-seed high-watermark: files already drained from
                # staged_seeds_dir (skipped by later drains — the pickup
                # cost stays O(new files), not O(all files ever staged))
                "staged_drained": sorted(self._staged_drained),
                "lineage": {
                    "input_snapshot": ("r%05d" % (r - 1)) if r > 0 else "seeds",
                    "output_files": lineage,
                    "extracted_rows_per_partition": part_rows,
                },
            }
            with open(os.path.join(tmp, "manifest.json"), "w") as f:
                json.dump(manifest, f)
            if os.path.exists(base):
                shutil.rmtree(base)
            os.rename(tmp, base)  # atomic commit
            res.rounds = r + 1
            self._seen_rels = seen_rels_next
            self._frontier_log = frontier_log_next
            self._host_state_rels = host_state_rels_next
            # only NOW is it safe to drop compacted deltas: the committed
            # manifest references the compact dirs, not them (older
            # manifests lose time-travel — documented retention)
            for rel in compacted_away + frontier_compacted_away + hs_compacted_away:
                p = os.path.join(cfg.workdir, rel)
                if os.path.exists(p):
                    shutil.rmtree(p)

            # re-open state from the COMMITTED logs/paths (.tmp is gone)
            if cfg.cache_frontier:
                frontier.unpersist()
            frontier = self._read_frontier(self._frontier_log, r)
            n_frontier = c["deferred_by_politeness"] + c["scheduled"]
            seen = self._read_seen(self._seen_rels)
            host_state = self._read_host_state_deltas(self._host_state_rels)
            # retention: state tables live in shared delta logs (pruned
            # only by their own compaction) and round dirs hold O(batch)
            # OUTPUTS — the one redundant per-round artifact is the
            # Bloom snapshot (each fully supersedes the previous; a
            # resume from an older round rebuilds from the seen log)
            if self._bloom is not None and cfg.keep_rounds:
                for d in sorted(os.listdir(cfg.workdir)):
                    if d.startswith("round_") and not d.endswith(".tmp"):
                        rr = int(d.split("_")[1])
                        npz = os.path.join(cfg.workdir, d, "bloom.npz")
                        if rr <= r - cfg.keep_rounds and os.path.exists(npz):
                            os.remove(npz)
        return res

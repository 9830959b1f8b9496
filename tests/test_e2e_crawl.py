"""Flagship e2e: the Spark engine must reproduce the sequential reference
model exactly — crawl ordering (per-round transcript), URL-seen set,
byte-identical extracted text, and per-round counters (SURVEY.md §5.2 #1,
BASELINE.md target metrics)."""

from __future__ import annotations

import pandas as pd
import pytest

from crawl_spark.plans.engine import CrawlEngine, EngineConfig
from crawl_spark.plans.handlers import Handler, HandlerRegistry

from . import refmodel


def _registry() -> HandlerRegistry:
    reg = HandlerRegistry()
    reg.register("page", Handler(name="page", text_selector="body", link_selector="a"))
    # glob pattern: matches callback "list" (go-glob, crawler.go:258-263)
    reg.register(
        "li*",
        Handler(name="lister", text_selector="h1", link_selector="ul.nav a", follow=False),
    )
    return reg


def _load(tiny_fixture):
    pages = pd.read_parquet(tiny_fixture["pages"])
    seeds = pd.read_parquet(tiny_fixture["seeds"])
    robots = pd.read_parquet(tiny_fixture["robots"])
    return pages, seeds, robots


def _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=6):
    pages_map = dict(zip(pages["url"], pages["html"]))
    robots_map = {
        r["host"]: (list(r["disallow"]), float(r["crawl_delay"]))
        for r in robots.to_dict("records")
    }
    return refmodel.crawl(
        pages_map,
        seeds.to_dict("records"),
        _registry(),
        robots=robots_map,
        batch_cap=batch_cap,
        max_rounds=max_rounds,
    )


@pytest.fixture(scope="module")
def crawl_pair(spark, tiny_fixture, tmp_path_factory):
    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots)

    engine = CrawlEngine(
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=40,
            max_rounds=6,
            workdir=str(tmp_path_factory.mktemp("crawl_work")), collect_transcript=True),
    )
    result = engine.run(seeds)
    return golden, result, engine


def test_crawl_ordering_exact(crawl_pair):
    golden, result, _ = crawl_pair
    assert len(result.transcript) == len(golden.transcript)
    for r, (got, exp) in enumerate(zip(result.transcript, golden.transcript)):
        assert got == exp, "round %d ordering mismatch:\ngot  %s\nwant %s" % (r, got, exp)


def test_read_transcript_matches_driver_copy(crawl_pair, spark):
    """The durable parquet transcript reconstructs the driver-side list
    exactly (collect_transcript=False is the production default — this is
    the opt-in read-back path)."""
    _, result, _ = crawl_pair
    assert result.read_transcript(spark) == result.transcript


def test_seen_deltas_hash_bucketed(crawl_pair, spark):
    """SURVEY §4.2 layout promise: every seen delta dir is hive-
    partitioned by sb = pmod(url_hash, seen_buckets), so the membership
    check can prune its scan to the buckets a round's links touch."""
    import os

    from pyspark.sql import functions as F

    _, result, engine = crawl_pair
    droot = os.path.join(result.workdir, "seen_deltas")
    for d in os.listdir(droot):
        subs = [s for s in os.listdir(os.path.join(droot, d)) if s.startswith("sb=")]
        assert subs, "delta dir %s is not bucketed" % d
    # the sb column equals pmod(url_hash, B) for every row
    B = engine.config.seen_buckets
    seen = engine.read_table("seen")
    bad = seen.filter(
        F.col("sb") != F.pmod(F.col("url_hash"), F.lit(B)).cast("int")
    ).count()
    assert bad == 0


def test_seen_set_exact(crawl_pair, spark):
    golden, result, engine = crawl_pair
    # seen is an append-only delta log: read via the manifest's delta list
    seen = {row.url_canon for row in engine.read_table("seen").collect()}
    assert seen == golden.seen


def test_extracted_text_byte_identical(crawl_pair, spark, tiny_fixture):
    golden, result, _ = crawl_pair
    import os

    rows = []
    for r in range(result.rounds):
        p = os.path.join(result.workdir, "round_%05d" % r, "extracted")
        if os.path.exists(p):
            rows += spark.read.parquet(p).collect()
    got = {(row.url_canon, row.handler): row.text for row in rows}
    exp = {
        (u, h): t for u, handlers in golden.texts.items() for h, t in handlers.items()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k].encode() == exp[k].encode(), "text mismatch for %s" % (k,)
    # and the golden pages.text column (generator truth) for handler "page"
    pages = pd.read_parquet(tiny_fixture["pages"])
    page_text = dict(zip(pages["url"], pages["text"]))
    for (u, h), t in exp.items():
        if h == "page" and u in page_text:
            assert t == page_text[u]


def test_counters_match(crawl_pair):
    golden, result, _ = crawl_pair
    keys = ["fetched", "deduped", "deferred_by_politeness", "expired"]
    assert len(result.counters) == len(golden.counters)
    for got, exp in zip(result.counters, golden.counters):
        for k in keys:
            assert got[k] == exp[k], "round %s counter %s: got %s want %s" % (
                got["round"], k, got[k], exp[k])


def test_resume_identical_ordering(spark, tiny_fixture, tmp_path_factory):
    """Kill after round 2, resume from snapshot, transcript must equal the
    uninterrupted run (north_rule: resumable with identical ordering)."""
    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=5)

    wd = str(tmp_path_factory.mktemp("resume_work"))
    mk = lambda: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(batch_cap=40, max_rounds=5, workdir=wd, keep_rounds=99, collect_transcript=True),
    )
    mk().run(seeds, max_rounds=2)  # "killed" after round 2
    result = mk().run(seeds, max_rounds=5, resume=True)
    assert result.transcript == golden.transcript[: len(result.transcript)]
    assert len(result.transcript) == len(golden.transcript)


def test_hot_host_path_equals_window_path(spark, tiny_fixture, tmp_path_factory):
    """Skew mitigation must be semantics-free: with a threshold low
    enough to route most hosts through the per-host top-k path, the
    transcript still equals the reference model exactly (the Zipf
    fixture makes host0 genuinely hot)."""
    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=5)
    engine = CrawlEngine(
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=40,
            max_rounds=5,
            workdir=str(tmp_path_factory.mktemp("hot_work")),
            hot_host_threshold=3,
            max_hot_hosts=8, collect_transcript=True),
    )
    result = engine.run(seeds)
    assert result.transcript == golden.transcript
    assert [c["deferred_by_politeness"] for c in result.counters] == [
        c["deferred_by_politeness"] for c in golden.counters
    ]


def test_snapshot_manifest_lineage_and_time_travel(crawl_pair, spark):
    """north_rule: per-round snapshots carry per-partition lineage +
    counters; snapshot ids chain; state tables time-travel by round."""
    import json
    import os

    _, result, engine = crawl_pair
    snaps = engine.snapshots()
    assert [s["round"] for s in snaps] == sorted(s["round"] for s in snaps)
    last = snaps[-1]
    assert last["snapshot_id"] == "r%05d" % (result.rounds - 1)
    lin = last["lineage"]
    assert lin["output_files"]["frontier"], "frontier snapshot lists its files"
    assert set(lin["output_files"]) >= {"frontier", "seen", "errors", "extracted"}
    # per-partition extracted-row counters sum to the round's fetch output
    base = os.path.join(result.workdir, "round_%05d" % (result.rounds - 1))
    n_extracted = spark.read.parquet(os.path.join(base, "extracted")).count()
    assert sum(lin["extracted_rows_per_partition"].values()) == n_extracted
    # chain: every non-first snapshot names its parent
    for prev, cur in zip(snaps, snaps[1:]):
        assert cur["parent_snapshot"] == prev["snapshot_id"]
    # time travel: seen-set is monotone across the last two snapshots
    if len(snaps) >= 2 and result.rounds >= 2:
        r = result.rounds - 1
        seen_now = {row.url_canon for row in engine.read_table("seen", r).collect()}
        seen_prev = {row.url_canon for row in engine.read_table("seen", r - 1).collect()}
        assert seen_prev <= seen_now


def test_diff_snapshots_changefeed(crawl_pair, spark):
    """CDC export between two committed rounds: every diff table equals
    the exact set difference of the materialized time-travel reads —
    while the seen/host_state fast paths never read pre-`from` state
    (append-only log arithmetic)."""
    import os

    _, result, engine = crawl_pair
    last = result.rounds - 1
    mid = last // 2
    assert mid < last, "fixture must commit >= 2 rounds"
    d = engine.diff_snapshots(mid, last)

    s_mid = {r["url_hash"] for r in engine.read_table("seen", mid).collect()}
    s_last = {r["url_hash"] for r in engine.read_table("seen", last).collect()}
    assert {r["url_hash"] for r in d["seen_added"].collect()} == s_last - s_mid
    assert s_last - s_mid, "fixture grows the seen set after mid"

    f_mid = {r["url"] for r in engine.read_table("frontier", mid).collect()}
    f_last = {r["url"] for r in engine.read_table("frontier", last).collect()}
    assert {r["url"] for r in d["frontier_added"].collect()} == f_last - f_mid
    assert {r["url"] for r in d["frontier_removed"].collect()} == f_mid - f_last
    assert f_mid - f_last, "fixture crawls mid-frontier urls after mid"

    h_mid = {r["host"]: r["next_time"] for r in engine.read_table("host_state", mid).collect()}
    h_last = {r["host"]: r["next_time"] for r in engine.read_table("host_state", last).collect()}
    got_h = {r["host"]: r["next_time"] for r in d["host_state_changed"].collect()}
    assert got_h == {
        h: t for h, t in h_last.items() if h not in h_mid or t > h_mid[h]
    }

    n_expected = 0
    for r in range(mid + 1, last + 1):
        p = os.path.join(result.workdir, "round_%05d" % r, "extracted")
        if os.path.isdir(p):
            n_expected += spark.read.parquet(p).count()
    assert d["extracted_added"].count() == n_expected > 0

    empty = engine.diff_snapshots(last, last)
    assert all(v.count() == 0 for v in empty.values())
    with pytest.raises(ValueError):
        engine.diff_snapshots(last, mid)
    with pytest.raises(FileNotFoundError):
        engine.diff_snapshots(mid, last + 999)


def test_seen_delta_log_append_only(crawl_pair, spark):
    """north_rule scale invariant: per-round seen writes are bounded by
    that round's NEW urls (append-only log), never the cumulative set;
    the deltas are disjoint and their union is exactly the seen set."""
    import os

    golden, result, engine = crawl_pair
    droot = os.path.join(result.workdir, "seen_deltas")
    per_delta = {
        d: spark.read.parquet(os.path.join(droot, d)).count()
        for d in sorted(os.listdir(droot))
    }
    # one delta per round, sized by that round's scheduled (new) urls
    for c in result.counters:
        assert per_delta["delta=delta_%05d" % c["round"]] == c["scheduled"]
    # disjoint appends: sizes sum to the full seen set (no rewrite ever)
    assert sum(per_delta.values()) == len(golden.seen)


def test_seen_compaction_and_resume(spark, tiny_fixture, tmp_path_factory):
    """Delta-log compaction must not change semantics: transcript and
    seen set equal the reference model, and a killed run resumes across
    a compacted log."""
    import os

    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=5)
    wd = str(tmp_path_factory.mktemp("compact_work"))
    mk = lambda: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=40, max_rounds=5, workdir=wd, keep_rounds=99,
            seen_compact_min_deltas=2, collect_transcript=True),
    )
    mk().run(seeds, max_rounds=2)
    engine = mk()
    result = engine.run(seeds, max_rounds=5, resume=True)
    assert result.transcript == golden.transcript
    seen = {row.url_canon for row in engine.read_table("seen").collect()}
    assert seen == golden.seen
    # the log stays bounded: compaction keeps ≤ min_deltas dirs around
    droot = os.path.join(wd, "seen_deltas")
    assert len(os.listdir(droot)) <= 2


def test_frontier_log_bounded_writes(crawl_pair, spark):
    """The frontier is a merge-on-read log: per-round writes are the add
    delta (this round's new links) and del delta (the dequeued batch) —
    bounded by batch outputs, never O(|frontier|) — and read_table
    reconstructs the exact frontier."""
    import os

    golden, result, engine = crawl_pair
    droot = os.path.join(result.workdir, "frontier_log")
    names = sorted(os.listdir(droot))
    # no full materialization happened (default compact_every=8 > rounds)
    assert not any(n.startswith("base_0") for n in names)
    for c in result.counters:
        r = c["round"]
        n_add = spark.read.parquet(os.path.join(droot, "add_%05d" % r)).count()
        assert n_add == c["scheduled"]
        n_del = spark.read.parquet(os.path.join(droot, "del_%05d" % r)).count()
        assert n_del <= 40  # batch_cap
    # merged view at the last snapshot: every url is either unfetched or
    # pending; none of the dequeued urls remain
    frontier = engine.read_table("frontier").toPandas()
    dequeued = {u for roundlist in result.transcript for u in roundlist}
    assert not (set(frontier.url_canon) & dequeued)


def test_frontier_compaction_and_resume(spark, tiny_fixture, tmp_path_factory):
    """Frontier-log compaction must not change semantics: transcript
    equals the reference model and a killed run resumes across a
    compacted log (base rewritten every 2 rounds)."""
    import os

    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=5)
    wd = str(tmp_path_factory.mktemp("fcompact_work"))
    mk = lambda: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=40, max_rounds=5, workdir=wd, keep_rounds=99,
            frontier_compact_every=2, collect_transcript=True),
    )
    mk().run(seeds, max_rounds=3)
    engine = mk()
    result = engine.run(seeds, max_rounds=5, resume=True)
    assert result.transcript == golden.transcript
    # compaction ran and consumed dirs were dropped: the log stays small
    droot = os.path.join(wd, "frontier_log")
    assert any(n.startswith("base_0") for n in os.listdir(droot))
    assert len(os.listdir(droot)) <= 5  # base + ≤2 adds + ≤2 dels


def test_resume_rejects_changed_seen_buckets(spark, tiny_fixture, tmp_path_factory):
    """The manifest pins seen_buckets: bucketed seen deltas store
    sb = pmod(url_hash, B) as a hive partition value, so resuming (or
    reading seen) under a different B would make the membership probe's
    bucket prune silently skip partitions holding matching rows — seen
    urls would re-enter the frontier. Must fail loudly instead; the
    same B resumes fine."""
    pages, seeds, robots = _load(tiny_fixture)
    wd = str(tmp_path_factory.mktemp("sb_pin_work"))
    mk = lambda B: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=40, max_rounds=4, workdir=wd, seen_buckets=B),
    )
    mk(8).run(seeds, max_rounds=2)
    # same B -> resume OK
    mk(8).run(seeds, max_rounds=3, resume=True)
    # different B -> refused (resume AND seen read)
    with pytest.raises(ValueError, match="seen_buckets"):
        mk(16).run(seeds, max_rounds=4, resume=True)
    with pytest.raises(ValueError, match="seen_buckets"):
        mk(16).read_table("seen")


@pytest.mark.parametrize(
    "cap,rounds,kw",
    [
        (7, 5, {}),  # tiny batches: many deferrals, deep rounds
        (120, 3, {"seen_compact_min_deltas": 2, "frontier_compact_every": 1}),
        (40, 4, {"hot_host_threshold": 2, "max_hot_hosts": 4,
                 "frontier_compact_every": 2}),
        # membership-check strategy matrix: force the classic shuffle
        # anti-join (broadcast-probe disabled) and a single-bucket seen
        # layout (no pruning possible) — all must be transcript-identical
        (40, 4, {"seen_probe_broadcast_max": 0}),
        (40, 4, {"seen_buckets": 1}),
        # politeness-stamp strategy matrix (round 4): no persisted
        # robots_dim (in-memory probe, no partition pruning) and a
        # forced shuffle-join stamp — both must be transcript-identical
        (40, 4, {"robots_buckets": None}),
        (40, 4, {"seen_probe_broadcast_max": 0, "robots_buckets": None}),
    ],
)
def test_engine_matches_refmodel_across_configs(
    spark, tiny_fixture, tmp_path_factory, cap, rounds, kw
):
    """Config matrix: odd batch caps, per-round compaction of BOTH delta
    logs, and near-universal hot-host routing must all reproduce the
    sequential reference model exactly."""
    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots, batch_cap=cap, max_rounds=rounds)
    engine = CrawlEngine(
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=cap, max_rounds=rounds,
            workdir=str(tmp_path_factory.mktemp("cfg_work")), **kw, collect_transcript=True),
    )
    result = engine.run(seeds)
    assert result.transcript == golden.transcript
    keys = ["fetched", "deduped", "deferred_by_politeness", "expired"]
    for got, exp in zip(result.counters, golden.counters):
        assert {k: got[k] for k in keys} == {k: exp[k] for k in keys}


def test_crash_between_delta_write_and_commit_replays_cleanly(
    spark, tiny_fixture, tmp_path_factory
):
    """Crash-window semantics: if a round dies AFTER its seen/frontier
    delta dirs are renamed but BEFORE the manifest commit, the deltas
    are unreferenced orphans; resume must replay the round, overwrite
    them, and end bit-identical to an uninterrupted run (Iceberg
    orphan-file semantics)."""
    import os
    import shutil

    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=4)
    wd = str(tmp_path_factory.mktemp("crash_work"))
    mk = lambda: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(batch_cap=40, max_rounds=4, workdir=wd, keep_rounds=99, collect_transcript=True),
    )
    mk().run(seeds, max_rounds=3)  # rounds 0..2 committed
    # simulate the crash window during round 2: delete the committed
    # round dir (manifest gone) but leave its delta dirs as orphans
    shutil.rmtree(os.path.join(wd, "round_00002"))
    assert os.path.isdir(os.path.join(wd, "seen_deltas", "delta=delta_00002"))  # orphan
    assert os.path.isdir(os.path.join(wd, "frontier_log", "add_00002"))  # orphan
    engine = mk()
    result = engine.run(seeds, max_rounds=4, resume=True)  # replays r2, runs r3
    assert result.transcript == golden.transcript
    seen = {row.url_canon for row in engine.read_table("seen").collect()}
    assert seen == golden.seen


def test_middleware_chain_aborts_before_fetch(spark, tiny_fixture, tmp_path_factory):
    """Middleware semantics (crawler.go:153-158): runs after dequeue, so
    aborted rows appear in the transcript but are never fetched; errors
    carry the middleware's message; later middlewares don't see them."""
    import os

    from pyspark.sql import functions as F

    pages, seeds, robots = _load(tiny_fixture)
    base = _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=2)
    blocked_host = "host0.example"

    def block_host0(df):
        return df.withColumn(
            "mw_error",
            F.when(F.col("host") == blocked_host, F.lit("blocked:host0")),
        )

    def block_host2(df):  # must only see survivors of block_host0
        return df.withColumn(
            "mw_error",
            F.when(F.col("host") == "host2.example", F.lit("blocked:host2")),
        )

    engine = CrawlEngine(
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=40, max_rounds=2,
            workdir=str(tmp_path_factory.mktemp("mw_work")), collect_transcript=True),
        middlewares=[block_host0, block_host2],
    )
    result = engine.run(seeds)
    # transcript = dequeue order: identical to the no-middleware model
    assert result.transcript[0] == base.transcript[0]
    all_errs = pd.concat(
        [
            spark.read.parquet(
                os.path.join(result.workdir, "round_%05d" % r, "errors")
            ).toPandas()
            for r in range(result.rounds)
        ]
    )
    mw_errs = all_errs[all_errs.error_class == "middleware"]
    assert len(mw_errs) > 0
    # regression (round-1 bug): the errors union must keep EVERY part —
    # the 2nd middleware's aborts and the fetch misses, not just part[1]
    assert set(mw_errs.message) == {"blocked:host0", "blocked:host2"}
    for _, e in mw_errs.iterrows():
        host = "host0" if e.message == "blocked:host0" else "host2"
        assert e.url.startswith("http://%s.example" % host)
    miss = all_errs[all_errs.error_class == "fetch_miss"]
    assert any(u.startswith("http://nowhere") for u in miss.url)
    errs = spark.read.parquet(
        os.path.join(result.workdir, "round_%05d" % (result.rounds - 1), "errors")
    ).toPandas()
    # blocked rows were never fetched: extracted has no host0 rows
    ext = spark.read.parquet(
        os.path.join(result.workdir, "round_%05d" % (result.rounds - 1), "extracted")
    ).toPandas()
    assert not any(u.startswith("http://host0.example/") for u in ext.url_canon)


def test_staged_seed_pickup_at_round_boundary(spark, tiny_fixture, tmp_path_factory):
    """SURVEY §3.3: out-of-band seeds staged by the streaming feed are
    picked up at the next round boundary — including into an EMPTY
    frontier — exactly once (re-drains are dropped by the seen set)."""
    import json
    import os

    from crawl_spark.streaming.feed import seed_feed_stream

    pages = pd.read_parquet(tiny_fixture["pages"])
    urls = sorted(pages["url"])
    base = str(tmp_path_factory.mktemp("staged_pickup"))
    in_dir, staging, ck = [os.path.join(base, d) for d in ("in", "staged", "ck")]
    os.makedirs(in_dir)

    def stage(batch_name, stage_urls):
        with open(os.path.join(in_dir, batch_name), "w") as f:
            for u in stage_urls:
                f.write(json.dumps({"url": u, "callbacks": ["page"],
                                    "event_ts": "2026-01-01T00:00:00Z"}) + "\n")
        q = seed_feed_stream(spark, in_dir, staging, ck, available_now=True)
        q.awaitTermination(120)

    stage("b1.json", [urls[0], urls[0], urls[1]])  # dup collapses in-stream
    wd = os.path.join(base, "wd")
    mk = lambda: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        config=EngineConfig(batch_cap=40, max_rounds=2, workdir=wd,
                            keep_rounds=99, staged_seeds_dir=staging, collect_transcript=True),
    )
    res = mk().run([])  # NO direct seeds: frontier starts empty
    assert res.counters[0]["staged"] == 2
    assert res.transcript[0] == sorted([urls[0], urls[1]])
    assert res.rounds == 2  # their links crawl in round 1

    # second out-of-band batch lands while "the job was down"; resume
    # must pick up ONLY the not-yet-seen url (urls[0] is in seen)
    seen_mid = {r.url_canon for r in mk().read_table("seen").collect()}
    fresh_url = next(u for u in urls if u not in seen_mid)
    stage("b2.json", [urls[0], fresh_url])
    res2 = mk().run([], max_rounds=4, resume=True)
    assert res2.counters[2]["staged"] == 1
    assert urls[0] not in {u for t in res2.transcript[2:] for u in t}
    engine = mk()
    seen = {r.url_canon for r in engine.read_table("seen").collect()}
    assert {urls[0], urls[1], fresh_url} <= seen
    # the staged row entered the crawl: either already fetched (FIFO
    # places staged seqs after the same round's links, so it may wait
    # behind the batch cap) or still queued in the frontier
    crawled = {u for t in res2.transcript[2:] for u in t}
    queued = {r.url_canon for r in engine.read_table("frontier").collect()}
    assert fresh_url in (crawled | queued)
    # high-watermark: the latest manifest records every drained staged
    # file, so later drains never re-read them (ADVICE r2: pickup cost is
    # O(new files), not O(all files ever staged))
    last = max(
        d for d in os.listdir(wd) if d.startswith("round_") and not d.endswith(".tmp")
    )
    with open(os.path.join(wd, last, "manifest.json")) as f:
        drained = set(json.load(f)["staged_drained"])
    staged_files = {f for f in os.listdir(staging) if f.endswith(".parquet")}
    assert staged_files <= drained and len(staged_files) >= 2


def test_request_fields_ride_the_frontier(spark, tiny_fixture, tmp_path_factory):
    """Full Request parity (request.go:13-32): method/form/query/cookies/
    header survive seed stamping with exact values; scheduled links get
    null extras (plain GETs)."""
    engine = CrawlEngine(
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        config=EngineConfig(workdir=str(tmp_path_factory.mktemp("req_work")), collect_transcript=True),
    )
    seeds = [
        {
            "url": "http://host1.example/p/1",
            "method": "post",
            "form": {"a": ["1", "2"]},
            "query": {"q": ["x"]},
            "cookies": {"sid": ["s1"]},
            "header": {"X-K": "v"},
            "callbacks": ["page"],
        },
        {"url": "http://host2.example/p/2", "callbacks": ["page"]},
    ]
    rows = {r.url: r for r in engine.seed_frontier(seeds).collect()}
    r1 = rows["http://host1.example/p/1"]
    assert r1.method == "post"
    assert dict(r1.form) == {"a": ["1", "2"]}
    assert dict(r1.query) == {"q": ["x"]}
    assert dict(r1.cookies) == {"sid": ["s1"]}
    assert dict(r1.header) == {"X-K": "v"}
    r2 = rows["http://host2.example/p/2"]
    assert r2.method is None and r2.form is None and r2.header is None


def test_bucketed_pages_fetch_pruning(spark, tiny_fixture, tmp_path_factory):
    """SURVEY §4.2 fetch-side layout: with pages hive-partitioned by
    pmod(hash(url), B), the fetch joins prune to the batch's buckets —
    same transcript/counters as the flat layout, strictly fewer files
    scanned per round."""
    import os

    from pyspark.sql import functions as F

    from crawl_spark.sources.fixtures import write_bucketed_pages

    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=4)
    B = 16
    bp = str(tmp_path_factory.mktemp("bucketed")) + "/pages"
    write_bucketed_pages(spark.read.parquet(tiny_fixture["pages"]), bp, B)
    bucketed = spark.read.parquet(bp)
    engine = CrawlEngine(
        spark,
        bucketed,
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=40, max_rounds=4, pages_buckets=B,
            workdir=str(tmp_path_factory.mktemp("bp_work")),
            collect_transcript=True,
        ),
    )
    result = engine.run(seeds)
    assert result.transcript == golden.transcript
    keys = ["fetched", "deduped", "deferred_by_politeness", "expired"]
    for got, exp in zip(result.counters, golden.counters):
        assert {k: got[k] for k in keys} == {k: exp[k] for k in keys}
    # pruning evidence: the bucket filter reaches the parquet scan as a
    # PARTITION filter (directory-level skip), not a post-scan row filter
    plan = (
        bucketed.filter(F.col("pb").isin([0, 1, 2]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = next(
        (ln for ln in plan.splitlines() if "PartitionFilters" in ln), ""
    )
    # e.g. "... PartitionFilters: [pb#12 IN (0,1,2)], ..." — a non-empty
    # filter list naming the bucket column
    assert "PartitionFilters: [pb#" in pf, pf
    assert "DataFilters: []" in pf, pf  # pruned at listing, no row filter


def test_seen_probe_prune_threshold(spark, tiny_fixture, tmp_path_factory):
    """_links_minus_seen: probes at or below seen_prune_max_probe prune
    the seen scan to the touched sb buckets (PartitionFilters, no row
    filter on sb); larger probes skip the bucket-collect job entirely.
    Both strategies must equal the plain shuffle anti-join exactly."""
    from pyspark.sql import functions as F

    pages, seeds, robots = _load(tiny_fixture)
    engine = CrawlEngine(
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=40, max_rounds=3,
            workdir=str(tmp_path_factory.mktemp("probe_work")),
        ),
    )
    engine.run(seeds)
    seen = engine.read_table("seen")
    # probe = half already-seen urls, half fresh — exercises both join outcomes
    half = seen.select("url_canon", "url_hash").limit(8)
    fresh = spark.range(8).select(
        F.concat(F.lit("http://new.example/x/"), F.col("id")).alias("url_canon"),
        F.xxhash64(F.col("id")).alias("url_hash"),
    )
    links = half.unionByName(fresh).localCheckpoint(eager=True)
    expected = sorted(
        r.url_canon
        for r in links.join(seen.select("url_canon"), "url_canon", "left_anti").collect()
    )
    n = links.count()

    pruned = engine._links_minus_seen(links, seen, n)  # 16 ≤ 2048 → prunes
    assert sorted(r.url_canon for r in pruned.select("url_canon").collect()) == expected
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # bucket prune + the defensive isnull(sb) escape for legacy rows:
    # PartitionFilters: [(sb# IN (...) OR isnull(sb#))] — the IN list
    # prunes files (isnull matches no hive dir), rows stay exact
    pf = [
        ln for ln in plan.splitlines()
        if "PartitionFilters: [" in ln and "sb#" in ln and " IN (" in ln
    ]
    assert pf, plan  # the seen scan is bucket-pruned at listing time
    assert "Exchange hashpartitioning(url_canon" not in plan  # seen never shuffles

    engine.config.seen_prune_max_probe = 0  # force the skip-prune branch
    unpruned = engine._links_minus_seen(links, seen, n)
    assert sorted(r.url_canon for r in unpruned.select("url_canon").collect()) == expected
    plan2 = unpruned._jdf.queryExecution().executedPlan().toString()
    assert not any(  # full scan: no sb prune in either filter form
        "PartitionFilters: [" in ln and "sb#" in ln and " IN (" in ln
        for ln in plan2.splitlines()
    )
    assert "Exchange hashpartitioning(url_canon" not in plan2  # no seen shuffle


def test_seen_probe_scans_prebucketing_deltas(spark, tiny_fixture, tmp_path_factory):
    """Resumed old workdirs hold FLAT seen deltas (pre-bucketing layout:
    no delta=/sb= structure). Mixing them into the partitioned scan
    raises CONFLICTING_DIRECTORY_STRUCTURES, and read alone they'd
    surface sb=NULL and be silently dropped by the bucket prune —
    re-admitting every url they record. _read_seen must read them flat,
    COMPUTE sb from url_hash, and keep the membership check exact."""
    import os

    from pyspark.sql import functions as F

    pages, seeds, robots = _load(tiny_fixture)
    wd = str(tmp_path_factory.mktemp("oldseen_work"))
    engine = CrawlEngine(
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        config=EngineConfig(batch_cap=40, max_rounds=2, workdir=wd),
    )
    engine.run(seeds)
    # simulate a pre-bucketing delta: flat dir, no sb column/partition
    old = spark.createDataFrame(
        [(F_OLD_HASH, "http://old.example/a"), (F_OLD_HASH + 1, "http://old.example/b")],
        "url_hash long, url_canon string",
    )
    rel = os.path.join("seen_deltas", "delta_legacy")
    old.write.parquet(os.path.join(wd, rel))
    # MIXED layout: legacy flat dir + this run's bucketed delta= dirs
    engine._seen_rels = engine._seen_rels + [rel]
    seen = engine._read_seen(engine._seen_rels)
    B = engine.config.seen_buckets
    legacy = {
        r.url_hash: r.sb
        for r in seen.filter(F.col("url_canon").startswith("http://old.")).collect()
    }
    # sb computed, not NULL — legacy rows participate in pruning exactly
    assert legacy == {h: h % B for h in (F_OLD_HASH, F_OLD_HASH + 1)}
    assert seen.filter(F.col("sb").isNull()).count() == 0

    links = spark.createDataFrame(
        [(F_OLD_HASH, "http://old.example/a"),      # in the legacy delta
         (12345, "http://new.example/fresh")],      # genuinely new
        "url_hash long, url_canon string",
    ).localCheckpoint(eager=True)
    out = engine._links_minus_seen(links, seen, 2)  # 2 <= 2048: prune branch
    assert [r.url_canon for r in out.collect()] == ["http://new.example/fresh"]


F_OLD_HASH = 777001


def test_duplicate_robots_host_rejected(spark, tiny_fixture, tmp_path_factory):
    """One row per host is the join contract: a duplicate host row would
    duplicate frontier rows through the politeness left join."""
    import pytest

    dup = spark.createDataFrame(
        [("h.example", ["/x"], 0.0), ("h.example", ["/y"], 1.0)],
        "host string, disallow array<string>, crawl_delay double",
    )
    with pytest.raises(ValueError, match="one row per host"):
        CrawlEngine(
            spark,
            spark.read.parquet(tiny_fixture["pages"]),
            _registry(),
            robots_df=dup,
            config=EngineConfig(
                batch_cap=10, max_rounds=1,
                workdir=str(tmp_path_factory.mktemp("dup_rb")),
            ),
        )


def test_host_state_delta_log_bounded_merge_and_compaction(
    spark, tiny_fixture, tmp_path_factory
):
    """Politeness state is a merge-on-read delta log (round-4 scale fix:
    the old design broadcast robots and rewrote the full host_state
    table every round — O(|hosts|) per round at a web-scale frontier).
    Checks: per-round appends are bounded by the batch's hosts, the
    per-host MAX over the log equals the reference model's clocks,
    compaction + kill/resume keep the transcript exact, and the robots
    table is persisted ONCE in the bucketed rb=* layout (reused, not
    rewritten, on resume)."""
    import json
    import os

    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=5)

    wd = str(tmp_path_factory.mktemp("hs_work"))
    mk = lambda: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(
            batch_cap=40, max_rounds=5, workdir=wd,
            host_state_compact_min_deltas=4, collect_transcript=True,
            # the fixture robots is below the small-dim broadcast cap
            # (round 5) — force the pruned-scan probe this test pins
            robots_broadcast_max=0),
    )
    mk().run(seeds, max_rounds=2)  # "crash" after round 1's commit
    dim = os.path.join(wd, "robots_dim")
    mtime_before_resume = os.path.getmtime(dim)
    engine = mk()
    result = engine.run(seeds, resume=True)
    assert result.transcript == golden.transcript

    # robots dim: bucketed hive layout, fingerprint-pinned, written once
    assert any(d.startswith("rb=") for d in os.listdir(dim))
    with open(os.path.join(dim, "_meta.json")) as f:
        assert json.load(f)["fp"] == engine.robots_fingerprint()
    assert os.path.getmtime(dim) == mtime_before_resume

    # per-round host_state delta is bounded by that round's batch hosts
    # (compacted-away dirs are gone — skip them; at least one must
    # remain from the post-compaction tail)
    checked = 0
    for r, batch in enumerate(result.transcript):
        p = os.path.join(wd, "host_state_log", "hs_%05d" % r)
        if not os.path.isdir(p):
            continue
        n_hosts = len({u.split("/")[2] for u in batch})
        assert spark.read.parquet(p).count() <= n_hosts
        checked += 1
    assert checked >= 1

    # compaction fired (threshold 4 over 5 rounds): the latest manifest
    # references a collapsed log, and read_table merges exactly the
    # reference model's host clocks (per-host MAX over the deltas)
    last = engine.snapshots()[-1]
    assert len(last["host_state_deltas"]) < result.rounds
    merged = {
        row.host: row.next_time
        for row in engine.read_table("host_state").collect()
    }
    assert merged == pytest.approx(golden.host_state)


def test_sitemap_recrawl_frontier_integration(spark, tiny_fixture, tmp_path_factory):
    """Round-4 integration e2e (VERDICT r3 #7): robots `Sitemap:`
    discovery → sitemap parsing → changefreq-driven recrawl scheduling
    → staged-seed pickup into a crawl round with boosted priority.
    The recrawl-due url must be crawled FIRST in round 0 (its boosted
    priority beats the direct seeds under the FIFO key), and the
    not-due url must not be scheduled at all."""
    import json
    import os

    from pyspark.sql import functions as F

    from crawl_spark.functions.robots import sitemap_urls_table
    from crawl_spark.operators.recrawl import recrawl_schedule
    from crawl_spark.sources.sitemap import read_sitemap_files, sitemap_entries
    from crawl_spark.streaming.feed import seed_feed_stream

    base = str(tmp_path_factory.mktemp("smrc"))
    pages = pd.read_parquet(tiny_fixture["pages"])
    urls = sorted(pages["url"])
    sm_dir = os.path.join(base, "sitemaps")
    os.makedirs(sm_dir)

    # 1. discovery: a global `Sitemap:` line in robots.txt
    rb = spark.createDataFrame(
        [("hostX.example",
          "User-agent: *\nDisallow: /private\n"
          "Sitemap: file://%s/map1.xml\n" % sm_dir)],
        "host string, body string",
    )
    assert {r.sitemap_url for r in sitemap_urls_table(rb).collect()} == {
        "file://%s/map1.xml" % sm_dir
    }

    # 2. "fetch" the discovered sitemap (disk read stands in for HTTP)
    target, other = urls[5], urls[6]
    with open(os.path.join(sm_dir, "map1.xml"), "w") as f:
        f.write(
            "<urlset>"
            "<url><loc>%s</loc><changefreq>daily</changefreq></url>"
            "<url><loc>%s</loc><changefreq>never</changefreq></url>"
            "</urlset>" % (target, other)
        )
    entries = sitemap_entries(read_sitemap_files(spark, sm_dir))

    # 3. schedule: both last fetched 2 days ago — daily is overdue (2×),
    # never has NULL interval and must not become due
    now = 1_700_000_000
    fetched = spark.createDataFrame(
        [(target, now - 2 * 86400), (other, now - 2 * 86400)],
        "loc string, last_fetch_ts long",
    )
    due = (
        recrawl_schedule(entries.join(fetched, "loc"), now_ts=now, url_col="loc")
        .filter(F.col("overdue_ratio") >= 1.0)
        .collect()
    )
    assert [r.url for r in due] == [target]
    prio = int(due[0].recrawl_priority)
    assert prio >= 1

    # 4. stage the due url out-of-band with BOOSTED engine priority
    # (engine FIFO is ascending: smaller sorts earlier)
    in_dir, staging, ck = [os.path.join(base, d) for d in ("in", "staged", "ck")]
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "recrawl.json"), "w") as f:
        f.write(json.dumps({
            "url": target, "priority": -prio, "callbacks": ["page"],
            "event_ts": "2026-01-01T00:00:00Z",
        }) + "\n")
    seed_feed_stream(spark, in_dir, staging, ck, available_now=True)\
        .awaitTermination(120)

    # 5. crawl: 3 direct seeds at priority 0, batch_cap 2 — the staged
    # recrawl url must lead round 0's transcript
    direct = [u for u in urls[:4] if u not in (target, other)][:3]
    eng = CrawlEngine(
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        config=EngineConfig(batch_cap=2, max_rounds=2, workdir=os.path.join(base, "wd"),
                            staged_seeds_dir=staging, collect_transcript=True),
    )
    res = eng.run([{"url": u, "callbacks": ["page"]} for u in direct])
    assert res.counters[0]["staged"] == 1
    assert res.transcript[0][0] == target
    assert all(other not in t for t in res.transcript)


def test_robots_dim_rebuilt_when_missing(spark, tiny_fixture, tmp_path_factory):
    """robots_dim is a CACHE of the constructor-provided robots table,
    not state: deleting it from a committed workdir must not change
    resume semantics — the engine rebuilds it (fingerprint-pinned) and
    the resumed transcript still exact-matches the reference model."""
    import os
    import shutil

    pages, seeds, robots = _load(tiny_fixture)
    golden = _run_refmodel(pages, seeds, robots, batch_cap=40, max_rounds=5)
    wd = str(tmp_path_factory.mktemp("rbdim_work"))
    mk = lambda: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(batch_cap=40, max_rounds=5, workdir=wd,
                            collect_transcript=True,
                            # force the probe path (round 5): the tiny
                            # fixture would otherwise broadcast the dim
                            # outright and never persist robots_dim
                            robots_broadcast_max=0),
    )
    mk().run(seeds, max_rounds=2)
    shutil.rmtree(os.path.join(wd, "robots_dim"))
    res = mk().run(seeds, resume=True)
    assert res.transcript == golden.transcript
    assert os.path.isdir(os.path.join(wd, "robots_dim"))  # rebuilt


def test_resume_rejects_prestamping_workdir(spark, tiny_fixture, tmp_path_factory):
    """A workdir committed by a pre-stamping engine (no 'frontier_stamped'
    manifest pin) must be REJECTED on resume while politeness is active:
    its frontier parquet lacks the denied/crawl_delay columns, and
    schema-on-read NULLs would silently un-deny robots-blocked rows.
    With politeness inactive the stamped columns are unused and a legacy
    workdir must still resume."""
    import json
    import os

    pages, seeds, robots = _load(tiny_fixture)

    def strip_pins(wd):
        for d in os.listdir(wd):
            mf = os.path.join(wd, d, "manifest.json")
            if d.startswith("round_") and os.path.exists(mf):
                with open(mf) as f:
                    m = json.load(f)
                m.pop("frontier_stamped", None)
                with open(mf, "w") as f:
                    json.dump(m, f)

    # politeness ACTIVE: same robots both runs (fp matches), pin missing
    # -> loud rejection
    wd1 = str(tmp_path_factory.mktemp("prestamp_act"))
    mk1 = lambda: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]),
        config=EngineConfig(batch_cap=40, max_rounds=4, workdir=wd1,
                            collect_transcript=True),
    )
    mk1().run(seeds, max_rounds=2)
    strip_pins(wd1)
    with pytest.raises(ValueError, match="frontier_stamped"):
        mk1().run(seeds, resume=True)

    # politeness INACTIVE: the unstamped verdicts are unused -> the
    # legacy workdir resumes fine
    wd2 = str(tmp_path_factory.mktemp("prestamp_inact"))
    mk2 = lambda: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        config=EngineConfig(batch_cap=40, max_rounds=4, workdir=wd2,
                            collect_transcript=True),
    )
    mk2().run(seeds, max_rounds=2)
    strip_pins(wd2)
    res = mk2().run(seeds, resume=True)
    assert res.rounds == 4


def _switch_robots(robots: pd.DataFrame) -> pd.DataFrame:
    """Deterministic epoch-2 rules: flip every delay (hosts that were
    unlimited get a real budget and vice versa) and deny every 7th host
    outright — guarantees newly-denied live rows AND budget-flipped
    hosts at the switch round."""
    rows = []
    for i, r in enumerate(robots.to_dict("records")):
        rows.append(
            {
                "host": r["host"],
                "disallow": ["/"] if i % 7 == 0 else [],
                "crawl_delay": 0.0 if float(r["crawl_delay"]) > 0 else 0.5,
            }
        )
    return pd.DataFrame(rows)


def _robots_map(df: pd.DataFrame) -> dict:
    return {
        r["host"]: (list(r["disallow"]), float(r["crawl_delay"]))
        for r in df.to_dict("records")
    }


def test_rebase_robots_epoch_switch(spark, tiny_fixture, tmp_path_factory):
    """Robots refresh across epochs (VERDICT r4 item 3): run 2 rounds
    under epoch-1 rules, swap robots, rebase_robots(), resume — the
    transcript/counters/errors/seen must equal a refmodel run with
    robots_switch at that round. Also pins: a plain resume under
    changed rules still fails loudly, and a rebase under UNCHANGED
    rules is a no-op."""
    import os

    pages, seeds, robots = _load(tiny_fixture)
    robots2 = _switch_robots(robots)
    pages_map = dict(zip(pages["url"], pages["html"]))
    golden = refmodel.crawl(
        pages_map,
        seeds.to_dict("records"),
        _registry(),
        robots=_robots_map(robots),
        batch_cap=40,
        max_rounds=5,
        robots_switch=(2, _robots_map(robots2)),
    )
    wd = str(tmp_path_factory.mktemp("rebase_work"))
    robots1_df = spark.read.parquet(tiny_fixture["robots"])
    robots2_df = spark.createDataFrame(
        robots2, "host string, disallow array<string>, crawl_delay double"
    )
    mk = lambda rb: CrawlEngine(  # noqa: E731
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        robots_df=rb,
        config=EngineConfig(batch_cap=40, max_rounds=5, workdir=wd,
                            keep_rounds=99, collect_transcript=True),
    )
    mk(robots1_df).run(seeds, max_rounds=2)  # epoch 1: rounds 0-1

    # changed rules WITHOUT a rebase: the fingerprint pin fires
    with pytest.raises(ValueError, match="robots/politeness inputs differ"):
        mk(robots2_df).run(seeds, max_rounds=5, resume=True)

    eng2 = mk(robots2_df)
    m = eng2.rebase_robots()
    assert m["frontier_log"]["restamped_at"] == 2
    assert m["rebase"]["at_round"] == 2
    assert m["n_frontier"] >= 0
    # idempotent: same-rules rebase is a no-op returning the manifest
    assert mk(robots2_df).rebase_robots()["rebase"] == m["rebase"]

    result = eng2.run(seeds, max_rounds=5, resume=True)
    assert result.transcript == golden.transcript
    keys = ["fetched", "deduped", "deferred_by_politeness", "expired"]
    assert len(result.counters) == len(golden.counters)
    for got, exp in zip(result.counters, golden.counters):
        for kk in keys:
            assert got[kk] == exp[kk], "round %s counter %s: got %s want %s" % (
                got["round"], kk, got[kk], exp[kk])
    # robots_denied errors — incl. round-2 denials of RE-STAMPED rows
    # that entered the frontier under epoch-1 rules — match exactly
    got_denied = set()
    for r in range(result.rounds):
        p = os.path.join(wd, "round_%05d" % r, "errors")
        if os.path.exists(p):
            got_denied |= {
                (row.url, row.round)
                for row in spark.read.parquet(p).collect()
                if row.error_class == "robots_denied"
            }
    exp_denied = {(u, r) for (u, r, c) in golden.errors if c == "robots_denied"}
    assert got_denied == exp_denied
    assert exp_denied, "fixture must exercise post-switch denials"
    assert any(r >= 2 for (_, r) in exp_denied), "switch must deny live rows"
    seen = {row.url_canon for row in eng2.read_table("seen").collect()}
    assert seen == golden.seen


def test_rebase_robots_to_empty_rules(spark, tiny_fixture, tmp_path_factory):
    """Epoch switch to NO rules (politeness off in the new engine):
    urls denied and errored under epoch 1 stay dropped (refmodel step-2
    drops are permanent — the rebase read forces the stamped-denied
    predicate even though the new engine's politeness is inactive),
    while every surviving row runs with unlimited budget."""
    pages, seeds, robots = _load(tiny_fixture)
    pages_map = dict(zip(pages["url"], pages["html"]))
    empty = pd.DataFrame({"host": pd.Series([], dtype=str),
                          "disallow": pd.Series([], dtype=object),
                          "crawl_delay": pd.Series([], dtype=float)})
    golden = refmodel.crawl(
        pages_map,
        seeds.to_dict("records"),
        _registry(),
        robots=_robots_map(robots),
        batch_cap=40,
        max_rounds=5,
        robots_switch=(2, {}),
    )
    wd = str(tmp_path_factory.mktemp("rebase_empty_work"))
    cfg = lambda: EngineConfig(batch_cap=40, max_rounds=5, workdir=wd,  # noqa: E731
                               keep_rounds=99, collect_transcript=True)
    CrawlEngine(
        spark, spark.read.parquet(tiny_fixture["pages"]), _registry(),
        robots_df=spark.read.parquet(tiny_fixture["robots"]), config=cfg(),
    ).run(seeds, max_rounds=2)
    eng2 = CrawlEngine(
        spark, spark.read.parquet(tiny_fixture["pages"]), _registry(),
        robots_df=spark.createDataFrame(
            empty, "host string, disallow array<string>, crawl_delay double"
        ),
        config=cfg(),
    )
    eng2.rebase_robots()
    result = eng2.run(seeds, max_rounds=5, resume=True)
    assert result.transcript == golden.transcript
    for got, exp in zip(result.counters, golden.counters):
        for kk in ["fetched", "deduped", "deferred_by_politeness", "expired"]:
            assert got[kk] == exp[kk]
    seen = {row.url_canon for row in eng2.read_table("seen").collect()}
    assert seen == golden.seen


def test_pr_priority_frontier_integration(spark, tiny_fixture, tmp_path_factory):
    """Link-graph → scheduler composition: pagerank over the host graph,
    pr_priority tiers, seeds stamped with their host's tier — the
    hub host's seed must lead round 0 even though the default FIFO key
    (all priorities equal) would have crawled the lexically-smaller
    url first."""
    from urllib.parse import urlsplit

    from crawl_spark.operators.graph import pagerank, pr_priority

    pages = pd.read_parquet(tiny_fixture["pages"])
    urls = sorted(pages["url"])
    host_rep: dict[str, str] = {}
    for u in urls:
        host_rep.setdefault(urlsplit(u).netloc, u)
    hs = sorted(host_rep)
    assert len(hs) >= 2
    hub = hs[-1]
    u_low, u_hub = host_rep[hs[0]], host_rep[hub]
    assert u_low < u_hub  # default order would fetch u_low first

    edges = spark.createDataFrame(
        [(h, hub) for h in hs if h != hub], "src string, dst string"
    )
    pr = pr_priority(pagerank(edges, iters=3), thresholds=(0.2,))
    tiers = {r.node: r.priority for r in pr.collect()}
    assert tiers[hub] == 0 and all(t == 1 for h, t in tiers.items() if h != hub)

    eng = CrawlEngine(
        spark,
        spark.read.parquet(tiny_fixture["pages"]),
        _registry(),
        config=EngineConfig(
            batch_cap=2,
            max_rounds=1,
            workdir=str(tmp_path_factory.mktemp("prprio_wd")),
            collect_transcript=True,
        ),
    )
    res = eng.run(
        [
            {"url": u, "callbacks": ["page"],
             "priority": tiers[urlsplit(u).netloc]}
            for u in (u_low, u_hub)
        ]
    )
    assert list(res.transcript[0]) == [u_hub, u_low]

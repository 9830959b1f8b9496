"""curate_training_set: the composition must equal its stages run
sequentially, and each gate must drop documents for its own reason."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def relined(spark):
    d = spark.read.parquet(DOCS)
    return d.select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"(\S+ \S+) ", "$1\n").alias("text"),
    ).localCheckpoint()


def test_composition_equals_sequential_stages(spark, relined):
    from crawl_spark.operators.dedup import decontaminate
    from crawl_spark.operators.pipeline import curate_training_set, scrub_text
    from crawl_spark.operators.sampling import dsir_select, dsir_weights, pack_sequences
    from crawl_spark.operators.textops import clean_corpus, gopher_repetition

    target = relined.filter(F.col("doc_id") % 7 == 0)
    got = curate_training_set(
        relined,
        min_tokens=30, min_quality=4.0, langs=("en",),
        max_dup_line_frac=0.05, max_top2gram_frac=0.06,
        target_df=target, dsir_keep=60, dsir_buckets=512,
        seq_len=256, streams=8,
    ).collect()

    base = relined.select("doc_id", scrub_text(F.col("text")).alias("text"))
    cc_ids = {r.doc_id for r in clean_corpus(base, min_tokens=30, min_quality=4.0).collect()}
    gr_ids = {
        r.doc_id
        for r in gopher_repetition(
            base, max_dup_line_frac=0.05, max_top2gram_frac=0.06
        ).collect()
        if r.keep
    }
    surv = cc_ids & gr_ids
    ktext = base.filter(F.col("doc_id").isin(list(surv)))
    w = dsir_weights(target, ktext, n_buckets=512)
    sel = {
        r.doc_id: (r.score, r.sel_rank)
        for r in dsir_select(ktext, w, 60, n_buckets=512).collect()
    }
    packed = {
        r.doc_id: (r.stream, r.n_tokens, r.start_offset, r.bin)
        for r in pack_sequences(
            base.filter(F.col("doc_id").isin(list(sel))),
            seq_len=256, streams=8,
        ).collect()
    }
    assert {r.doc_id for r in got} == set(sel)
    for r in got:
        assert (r.stream, r.n_tokens, r.start_offset, r.bin) == packed[r.doc_id]
        assert (r.score, r.sel_rank) == sel[r.doc_id]
        assert r.doc_id in surv


def test_each_gate_drops_for_its_own_reason(spark):
    from crawl_spark.operators.pipeline import curate_training_set

    good = (
        "the data value in a fast report is of and to the point for it . "
    ) * 4  # ~68 en tokens, stopwordy, low punct, varied lines after relining
    rows = [
        (0, good + "alpha beta"),
        (1, good + "gamma delta"),
        (2, good + "alpha beta"),  # exact dup of 0 -> dedup drop
        (3, "der und das nicht ist ein zu die " * 8),  # german -> lang drop
        (4, "tiny doc"),  # min_tokens drop
        (5, ("spam ham " * 40).strip()),  # one 2-gram dominates -> gopher drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"(\S+ \S+) ", "$1\n").alias("text"),
    )
    out = curate_training_set(
        df,
        min_tokens=30, min_quality=2.0, langs=("en",),
        max_dup_line_frac=0.9, max_top2gram_frac=0.5,
        seq_len=64, streams=4,
    ).collect()
    kept = {r.doc_id for r in out}
    assert kept == {0, 1}, kept
    by = {r.doc_id: r for r in out}
    assert by[0].n_copies == 2 and by[1].n_copies == 1
    assert all(r.lang_pred == "en" for r in out)
    assert "score" not in out[0].asDict()  # dsir off -> no selection columns


def test_classifier_and_lm_gates_compose(spark, relined):
    """The optional NB-classifier and CCNet-LM gates must equal the
    standalone operators run over the surviving corpus — including the
    LM tercile cutoffs, which by contract are computed over the
    SURVIVORS, not the raw crawl."""
    from crawl_spark.operators.classify import nb_score, nb_train
    from crawl_spark.operators.pipeline import curate_training_set, scrub_text
    from crawl_spark.operators.sampling import lm_buckets, lm_model
    from crawl_spark.operators.textops import clean_corpus, gopher_repetition

    # labeled seed set: "good" = corpus-like text, "bad" = synthetic spam
    good = relined.filter(F.col("doc_id") % 11 == 0).select(
        F.lit("good").alias("label"), "text"
    )
    bad = spark.createDataFrame(
        [("bad", "buy cheap deal sale discount offer now %d" % i) for i in range(20)],
        "label string, text string",
    )
    clf_df = good.union(bad)
    ref = relined.filter(F.col("doc_id") % 13 == 0)

    got = {
        r.doc_id: r
        for r in curate_training_set(
            relined,
            min_tokens=30, min_quality=4.0, langs=("en",),
            max_dup_line_frac=0.05, max_top2gram_frac=0.06,
            classifier_df=clf_df, classifier_keep=("good",),
            classifier_buckets=512,
            reference_df=ref, lm_keep=("head", "middle"), lm_n_buckets=512,
            seq_len=256, streams=8,
        ).collect()
    }

    base = relined.select("doc_id", scrub_text(F.col("text")).alias("text"))
    cc = {r.doc_id for r in clean_corpus(base, min_tokens=30, min_quality=4.0).collect()}
    gr = {
        r.doc_id
        for r in gopher_repetition(
            base, max_dup_line_frac=0.05, max_top2gram_frac=0.06
        ).collect()
        if r.keep
    }
    surv = base.filter(F.col("doc_id").isin(list(cc & gr)))
    nbm = nb_train(clf_df, n_buckets=512)
    clf = {
        r.doc_id: (r.pred, r.score)
        for r in nb_score(surv, nbm, n_buckets=512).collect()
        if r.pred == "good"
    }
    surv2 = surv.filter(F.col("doc_id").isin(list(clf)))
    lmm = lm_model(ref, n_buckets=512)
    lb = {
        r.doc_id: (r.nll, r.bucket)
        for r in lm_buckets(surv2, lmm, n_buckets=512).collect()
        if r.bucket in ("head", "middle")
    }
    assert set(got) == set(lb) and len(got) > 0
    for i, r in got.items():
        assert (r.clf_pred, r.clf_score) == clf[i]
        assert (r.nll, r.lm_bucket) == lb[i]
    # the gates actually dropped something
    assert len(clf) < len(cc & gr) or len(lb) < len(clf)


def test_scrub_changes_packing_input(spark):
    """PII tags must be what the packer counts: a doc whose only long
    run is an email-laden line keeps its row with the scrubbed token
    count, not the raw one."""
    from crawl_spark.operators.pipeline import scrub_text

    df = spark.createDataFrame(
        [(0, "contact a@b.com and c@d.org now")], "doc_id long, text string"
    )
    s = df.select(scrub_text(F.col("text")).alias("t")).collect()[0].t
    assert s == "contact <EMAIL> and <EMAIL> now"


def test_crawl_output_feeds_curation(spark, tmp_path_factory):
    """The full circle: crawl engine rounds produce the `extracted`
    snapshot tables; curate_training_set turns them into packed
    training sequences. Deterministic end-to-end — a re-run of the
    same crawl + pipeline yields the identical packed assignment."""
    import os

    import pandas as pd

    from crawl_spark.plans.engine import CrawlEngine, EngineConfig
    from crawl_spark.plans.handlers import Handler, HandlerRegistry
    from crawl_spark.operators.pipeline import curate_training_set
    from crawl_spark.sources.fixtures import write_fixture

    fx = write_fixture(str(tmp_path_factory.mktemp("fx_curate")), "tiny")
    reg = HandlerRegistry()
    reg.register("page", Handler(name="page"))

    def crawl_then_curate(workdir):
        eng = CrawlEngine(
            spark,
            spark.read.parquet(fx["pages"]),
            reg,
            robots_df=spark.read.parquet(fx["robots"]),
            config=EngineConfig(batch_cap=25, max_rounds=3, workdir=workdir),
        )
        res = eng.run(pd.read_parquet(fx["seeds"]))
        parts = [
            os.path.join(workdir, "round_%05d" % r, "extracted")
            for r in range(res.rounds)
        ]
        ext = None
        for p in parts:
            if os.path.exists(p):
                d = spark.read.parquet(p)
                ext = d if ext is None else ext.unionByName(d)
        docs = ext.select(
            F.xxhash64("url_canon").alias("doc_id"), F.col("text")
        ).filter(F.length("text") > 0)
        out = curate_training_set(
            docs,
            min_tokens=2,
            min_quality=0.0,
            langs=("en", "und"),
            max_dup_line_frac=1.0,
            max_top2gram_frac=1.0,
            seq_len=64,
            streams=4,
        )
        return sorted(
            (r.doc_id, r.stream, r.n_tokens, r.start_offset, r.bin, r.n_copies)
            for r in out.collect()
        )

    a = crawl_then_curate(str(tmp_path_factory.mktemp("w_a")))
    b = crawl_then_curate(str(tmp_path_factory.mktemp("w_b")))
    assert len(a) > 0
    assert a == b  # crawl -> curate is deterministic end-to-end


def test_c4_gate_composes(spark):
    """curate_training_set(c4_rules=True) must equal hand-applying the
    C4 edit (python twin of the line/page rules) and then running the
    pipeline without the gate — the stage rewrites text, so the packed
    offsets/token counts must match on the EDITED documents."""
    from crawl_spark.operators.pipeline import curate_training_set

    from .twins import py_c4

    def good(i):
        return "\n".join(
            f"the data value in a fast report is of and to the point for it number{i}{j}."
            for j in range(6)
        )

    rows = [
        (0, good(0)),  # clean page, survives untouched
        (1, good(1) + "\nno punct menu junk line\nplease enable javascript now."),
        (2, good(2) + "\nlorem ipsum dolor sit amet today."),  # page drop
        (3, "\n".join(good(3).split("\n")[:3])),  # < 5 sentences -> drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in curate_training_set(
            df, c4_rules=True, min_tokens=30, min_quality=4.0,
            langs=("en",), seq_len=256, streams=8,
        ).collect()
    }

    pre = []
    for i, t in rows:
        _, _, _, ok, clean = py_c4(t)
        if ok:
            pre.append((i, clean))
    assert [i for i, _ in pre] == [0, 1]  # the twin agrees on who survives
    want = {
        r.doc_id: r
        for r in curate_training_set(
            spark.createDataFrame(pre, "doc_id long, text string"),
            c4_rules=False, min_tokens=30, min_quality=4.0,
            langs=("en",), seq_len=256, streams=8,
        ).collect()
    }
    assert set(got) == set(want)
    for i in got:
        g, w = got[i], want[i]
        assert (g.stream, g.n_tokens, g.start_offset, g.bin) == (
            w.stream, w.n_tokens, w.start_offset, w.bin
        ), i
        assert (g.lang_pred, g.quality, g.dup_line_frac, g.top2gram_frac) == (
            w.lang_pred, w.quality, w.dup_line_frac, w.top2gram_frac
        ), i

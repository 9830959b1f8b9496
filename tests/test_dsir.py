"""DSIR importance resampling + SemDeDup vs pure-Python oracles.

Same philosophy as test_operators.py: the DuckDB contract in
__spark_entry__ checks cross-engine agreement; these tests pin the
SEMANTICS against a from-first-principles Python model, so a bug
mirrored into both the SQL and the Spark side still gets caught.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"

B = 512  # hashed-feature buckets used throughout (small → real collisions)


def py_tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def py_grams(toks: list[str]) -> list[str]:
    return list(toks) + [
        toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
    ]


def py_bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def py_weights(target_texts, raw_texts):
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for texts, acc in ((target_texts, ct), (raw_texts, cr)):
        for t in texts:
            for g in py_grams(py_tokens(t)):
                b = py_bucket(g)
                acc[b] = acc.get(b, 0) + 1
    T, R = sum(ct.values()), sum(cr.values())
    return {
        b: round(
            math.log((ct.get(b, 0) + 1) / (T + B))
            - math.log((cr.get(b, 0) + 1) / (R + B)),
            6,
        )
        for b in range(B)
    }


def py_score(text: str, w: dict[int, float]) -> float:
    # mirror the engine's decimal-exact sum: each term is a 6dp value
    return round(sum(w[py_bucket(g)] for g in py_grams(py_tokens(text))), 6)


@pytest.fixture(scope="module")
def corpus(spark):
    # deterministic synthetic split: target-flavored docs share a vocab
    rows = []
    for i in range(60):
        if i % 3 == 0:
            txt = f"science result {i % 5} experiment data measure proton"
        elif i % 3 == 1:
            txt = f"buy cheap deal {i % 7} sale discount offer now"
        else:
            txt = f"science data {i % 4} sale mixed report value"
        rows.append((i, txt))
    # one empty and one single-token doc exercise the edge rows
    rows.append((60, ""))
    rows.append((61, "proton"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_match_python_model(spark, corpus):
    from crawl_spark.operators.sampling import dsir_weights

    target = corpus.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 60))
    w = dsir_weights(target, corpus, n_buckets=B)
    got = {r["bucket"]: r["logratio"] for r in w.collect()}
    pdf = corpus.toPandas().set_index("doc_id").text
    exp = py_weights(
        [pdf[i] for i in range(0, 60, 3)], list(pdf.values)
    )
    assert len(got) == B  # full spine, smoothing prior included
    for b in range(B):
        assert abs(got[b] - exp[b]) < 1e-9, b


def test_dsir_score_matches_python_model(spark, corpus):
    from crawl_spark.operators.sampling import dsir_score, dsir_weights

    target = corpus.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 60))
    w = dsir_weights(target, corpus, n_buckets=B)
    wmap = {r["bucket"]: r["logratio"] for r in w.collect()}
    got = {r["doc_id"]: r for r in dsir_score(corpus, w, n_buckets=B).collect()}
    pdf = corpus.toPandas().set_index("doc_id").text
    assert len(got) == 62  # empty doc keeps its row
    for i, text in pdf.items():
        toks = py_tokens(text)
        assert got[i]["n_grams"] == max(2 * len(toks) - 1, 0), i
        assert abs(got[i]["score"] - py_score(text, wmap)) < 1e-9, i
    assert got[60]["score"] == 0.0 and got[60]["n_grams"] == 0


def test_dsir_separates_target_like_docs(spark, corpus):
    """Sanity on the method, not just the arithmetic: target-vocab docs
    must outscore off-domain docs by a clear margin."""
    from crawl_spark.operators.sampling import dsir_score, dsir_weights

    target = corpus.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 60))
    w = dsir_weights(target, corpus, n_buckets=B)
    s = {r["doc_id"]: r["score"] for r in dsir_score(corpus, w, n_buckets=B).collect()}
    sci = [s[i] for i in range(0, 60) if i % 3 == 0]
    spam = [s[i] for i in range(0, 60) if i % 3 == 1]
    mixed = [s[i] for i in range(0, 60) if i % 3 == 2]
    assert min(sci) > max(spam)
    assert min(sci) > max(mixed)  # mixed docs sit between
    assert min(mixed) > max(spam)


def test_dsir_select_is_exact_global_topk(spark, corpus):
    from crawl_spark.operators.sampling import dsir_score, dsir_select, dsir_weights

    target = corpus.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 60))
    w = dsir_weights(target, corpus, n_buckets=B)
    scored = sorted(
        ((r["score"], r["doc_id"]) for r in dsir_score(corpus, w, n_buckets=B).collect()),
        key=lambda x: (-x[0], x[1]),
    )
    got = dsir_select(corpus, w, k=10, n_buckets=B).collect()
    assert len(got) == 10
    by_rank = {r["sel_rank"]: r["doc_id"] for r in got}
    for rank, (_, did) in enumerate(scored[:10], start=1):
        assert by_rank[rank] == did


def test_semdedup_is_cc_over_pair_graph(spark):
    """SemDeDup clusters must be the exact transitive closure of the
    within-cell cosine pair graph (BFS oracle), singletons their own
    canonical cluster — same contract as dedup.neardup_clusters but in
    embedding space."""
    from crawl_spark.operators.similarity import embedding_neardup_pairs, semdedup

    emb = spark.read.parquet(EMB)
    pairs = embedding_neardup_pairs(emb, threshold=0.25).collect()
    assert len(pairs) > 0
    adj: dict[int, set[int]] = {}
    for row in pairs:
        adj.setdefault(row.id_a, set()).add(row.id_b)
        adj.setdefault(row.id_b, set()).add(row.id_a)
    expect: dict[int, int] = {}
    for start in adj:
        if start in expect:
            continue
        comp, todo = {start}, [start]
        while todo:
            n = todo.pop()
            for m in adj.get(n, ()):
                if m not in comp:
                    comp.add(m)
                    todo.append(m)
        lbl = min(comp)
        for n in comp:
            expect[n] = lbl
    got = semdedup(emb, threshold=0.25).collect()
    assert len(got) == emb.count()
    sizes: dict[int, int] = {}
    for r in got:
        cid = expect.get(r.vec_id, r.vec_id)
        assert r.cluster_id == cid, (r.vec_id, r.cluster_id, cid)
        assert r.is_canonical == (r.vec_id == cid)
        sizes[cid] = sizes.get(cid, 0) + 1
    for r in got:
        assert r.cluster_size == sizes[r.cluster_id]
    # dedup-rate accounting: kept fraction is canonicals / corpus
    kept = sum(1 for r in got if r.is_canonical)
    assert kept < len(got)  # the fixture has real semantic dups


def test_dsir_in_bpe_token_space(spark):
    """The tokenizer= hook must carry through fit AND score: weights
    fitted and docs scored in the same BPE piece space agree with the
    pure-Python model run over tok.tokenize (the driver-side twin)."""
    from crawl_spark.operators.sampling import dsir_score, dsir_weights
    from crawl_spark.operators.textops import BpeTokenizer

    tok = BpeTokenizer(["sci", "ence", "data", "sale", "deal", "x"])
    rows = [
        (0, "science data"),
        (1, "sale deal sale"),
        (2, "science sale xx"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.filter(F.col("doc_id") == 0)
    w = dsir_weights(target, df, n_buckets=B, tokenizer=tok)
    wmap = {r["bucket"]: r["logratio"] for r in w.collect()}
    got = {
        r["doc_id"]: r
        for r in dsir_score(df, w, n_buckets=B, tokenizer=tok).collect()
    }

    def toks(t):
        return tok.tokenize(t)

    exp_w = {}
    ct, cr = {}, {}
    for did, t in rows:
        for g in py_grams(toks(t)):
            b = py_bucket(g)
            cr[b] = cr.get(b, 0) + 1
            if did == 0:
                ct[b] = ct.get(b, 0) + 1
    T, R = sum(ct.values()), sum(cr.values())
    for b in range(B):
        exp_w[b] = round(
            math.log((ct.get(b, 0) + 1) / (T + B))
            - math.log((cr.get(b, 0) + 1) / (R + B)),
            6,
        )
    for b in range(B):
        assert abs(wmap[b] - exp_w[b]) < 1e-9, b
    for did, t in rows:
        pieces = toks(t)
        assert got[did]["n_grams"] == max(2 * len(pieces) - 1, 0), (did, pieces)
        exp_s = round(sum(exp_w[py_bucket(g)] for g in py_grams(pieces)), 6)
        assert abs(got[did]["score"] - exp_s) < 1e-9, did
    # token space must actually differ from whitespace space here
    assert toks("science data") != ["science", "data"]


def test_semdedup_accepts_trained_centroids(spark):
    """The paper-faithful path: k-means-trained centroids change the
    cell partition (recall boundary), but the output must STILL be the
    exact transitive closure of the resulting pair graph."""
    from crawl_spark.operators.similarity import (
        embedding_neardup_pairs,
        semdedup,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(EMB)
    cents = train_ivf_centroids(emb, k=8, iters=2)
    pairs = embedding_neardup_pairs(emb, threshold=0.25, centroids=cents).collect()
    got = semdedup(emb, threshold=0.25, centroids=cents).collect()
    adj: dict[int, set[int]] = {}
    for row in pairs:
        adj.setdefault(row.id_a, set()).add(row.id_b)
        adj.setdefault(row.id_b, set()).add(row.id_a)
    expect: dict[int, int] = {}
    for start in adj:
        if start in expect:
            continue
        comp, todo = {start}, [start]
        while todo:
            n = todo.pop()
            for m in adj.get(n, ()):
                if m not in comp:
                    comp.add(m)
                    todo.append(m)
        lbl = min(comp)
        for n in comp:
            expect[n] = lbl
    assert len(got) == emb.count()
    for r in got:
        assert r.cluster_id == expect.get(r.vec_id, r.vec_id)


def test_lm_score_matches_python_model(spark, corpus):
    """CCNet-proxy NLL: nll = -mean 6dp logp over the doc's hashed
    grams under the reference bag-of-ngrams model; empty docs NULL."""
    from crawl_spark.operators.sampling import lm_model, lm_score

    ref_ids = [i for i in range(0, 60) if i % 3 == 0]
    m = lm_model(corpus.filter(F.col("doc_id").isin(ref_ids)), n_buckets=B)
    mmap = {r["bucket"]: r["logp"] for r in m.collect()}
    assert len(mmap) == B
    got = {r["doc_id"]: r for r in lm_score(corpus, m, n_buckets=B).collect()}
    pdf = corpus.toPandas().set_index("doc_id").text

    cnt: dict[int, int] = {}
    for i in ref_ids:
        for g in py_grams(py_tokens(pdf[i])):
            b = py_bucket(g)
            cnt[b] = cnt.get(b, 0) + 1
    T = sum(cnt.values())
    exp_m = {b: round(math.log((cnt.get(b, 0) + 1) / (T + B)), 6) for b in range(B)}
    for b in range(B):
        assert abs(mmap[b] - exp_m[b]) < 1e-9, b
    for i, text in pdf.items():
        grams = py_grams(py_tokens(text))
        if not grams:
            assert got[i]["nll"] is None and got[i]["n_grams"] == 0
            continue
        exp = round(-round(sum(exp_m[py_bucket(g)] for g in grams), 6) / len(grams), 6)
        assert abs(got[i]["nll"] - exp) < 1e-9, i
    # the signal works: reference-like docs have LOWER nll than spam
    sci = [got[i]["nll"] for i in range(0, 60) if i % 3 == 0]
    spam = [got[i]["nll"] for i in range(0, 60) if i % 3 == 1]
    assert max(sci) < min(spam)


def _py_terciles(nlls):
    """Rank-based cutoffs: the ceil(n/3)-th and ceil(2n/3)-th smallest."""
    s = sorted(nlls)
    n = len(s)
    return s[(n + 2) // 3 - 1], s[(2 * n + 2) // 3 - 1]


def test_lm_buckets_matches_python_terciles(spark, corpus):
    from crawl_spark.operators.sampling import lm_buckets, lm_model, lm_score

    ref = corpus.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 60))
    m = lm_model(ref, n_buckets=B)
    nll = {r["doc_id"]: r["nll"] for r in lm_score(corpus, m, n_buckets=B).collect()}
    c1, c2 = _py_terciles([v for v in nll.values() if v is not None])

    got = {r["doc_id"]: r["bucket"] for r in lm_buckets(corpus, m, n_buckets=B).collect()}
    assert len(got) == 62
    for i, v in nll.items():
        want = (
            None if v is None
            else "head" if v <= c1
            else "middle" if v <= c2
            else "tail"
        )
        assert got[i] == want, (i, v, c1, c2)
    # all three buckets are populated and reference-like docs lead the head
    assert {"head", "middle", "tail"} <= set(got.values())
    sci = [got[i] for i in range(0, 60, 3)]
    assert set(sci) == {"head"} or sci.count("head") > len(sci) * 0.8


def test_lm_buckets_sampled_cutoffs_are_deterministic(spark, corpus):
    """sample_frac < 1: cutoffs come from the md5-threshold subset only —
    recompute them in Python over the same subset and expect identical
    assignment for every doc."""
    import hashlib as _h

    from crawl_spark.operators.sampling import lm_buckets, lm_model, lm_score

    ref = corpus.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 60))
    m = lm_model(ref, n_buckets=B)
    nll = {r["doc_id"]: r["nll"] for r in lm_score(corpus, m, n_buckets=B).collect()}
    thr = "%04x" % int(0.5 * (1 << 16))
    sampled = [
        v for i, v in nll.items()
        if v is not None and _h.md5(str(i).encode()).hexdigest()[:4] < thr
    ]
    assert 0 < len(sampled) < sum(v is not None for v in nll.values())
    c1, c2 = _py_terciles(sampled)
    got = {
        r["doc_id"]: r["bucket"]
        for r in lm_buckets(corpus, m, n_buckets=B, sample_frac=0.5).collect()
    }
    for i, v in nll.items():
        want = (
            None if v is None
            else "head" if v <= c1
            else "middle" if v <= c2
            else "tail"
        )
        assert got[i] == want, (i, v, c1, c2)

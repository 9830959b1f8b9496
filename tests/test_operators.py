"""Training-data pipeline operators vs independent pure-Python oracles.

The DuckDB oracle in __spark_entry__ checks cross-engine agreement; these
tests pin the SEMANTICS against a from-first-principles Python model (so
a bug mirrored into both SQL and Spark still gets caught)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


def py_tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def py_shingles(toks, n=3):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).limit(100).cache()


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas()


def test_minhash_signature_matches_python(docs, docs_pd):
    from crawl_spark.operators.dedup import MINHASH_K, minhash_signature

    got = minhash_signature(docs).toPandas().set_index("doc_id")
    for _, row in docs_pd.head(20).iterrows():
        sh = list(dict.fromkeys(py_shingles(py_tokens(row.text))))
        for j in (0, 5, MINHASH_K - 1):
            exp = min(
                hashlib.md5(f"{j}:{s}".encode()).hexdigest() for s in sh
            )
            assert got.loc[row.doc_id, f"mh_{j}"] == exp


def test_simhash_matches_python(docs, docs_pd):
    from crawl_spark.operators.dedup import simhash

    got = simhash(docs).toPandas().set_index("doc_id")["simhash"]
    for _, row in docs_pd.head(10).iterrows():
        votes = [0] * 32
        for tok in py_tokens(row.text):
            h = hashlib.md5(tok.encode()).hexdigest()
            for b in range(32):
                nib = int(h[b // 4], 16)
                bit = (nib >> (b % 4)) & 1
                votes[b] += 1 if bit else -1
        exp = sum(1 << b for b in range(32) if votes[b] > 0)
        assert int(got[row.doc_id]) == exp


def test_exact_dedup_keeps_min_id(spark):
    from crawl_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a  b   c"), (3, "x y"), (4, "A B c")],
        "doc_id long, text string",
    )
    out = exact_dedup(df).toPandas().sort_values("doc_id")
    # 1,2,4 normalize to "a b c" -> survivor id 1 with 3 copies
    assert list(out.doc_id) == [1, 3]
    assert int(out[out.doc_id == 1].n_copies.iloc[0]) == 3


def test_ngram_jaccard_verifies_near_dups(spark):
    from crawl_spark.operators.dedup import ngram_jaccard_pairs

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    near = base.replace("delta", "delta2")
    far = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)], "doc_id long, text string"
    )
    out = ngram_jaccard_pairs(df, threshold=0.05).toPandas()
    pairs = {(a, b): j for a, b, j in out.itertuples(index=False)}
    assert pairs[(1, 2)] == 1.0
    if (1, 3) in pairs:  # candidate only if LSH banded them together
        assert 0 < pairs[(1, 3)] < 1


def test_cosine_topk_matches_numpy(spark):
    from crawl_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(EMB)
    got = brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=5).toPandas()
    pdf = emb.toPandas()
    vecs = np.stack(pdf.embedding.map(np.asarray)).astype(np.float64)
    ids = pdf.vec_id.to_numpy()
    norms = np.linalg.norm(vecs, axis=1)
    for q in range(3):
        qi = np.where(ids == q)[0][0]
        cos = np.round(vecs @ vecs[qi] / (norms * norms[qi]), 6)
        order = sorted(
            [(float(-cos[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != q]
        )[:5]
        exp_ids = [i for _, i in order]
        got_q = got[got.query_id == q].sort_values("rank")
        assert list(got_q.nbr_id) == exp_ids
        # rounded cosine agrees with numpy to the same 6dp contract
        for (_, row), (negc, _) in zip(got_q.iterrows(), order):
            assert abs(row.cos - (-negc)) < 1e-9


def test_ivf_recall_vs_brute_force(spark):
    """IVF with nprobe=2 over random vectors: top-1 recall should be
    decent and every returned neighbor must be a real vector."""
    from crawl_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(EMB)
    q = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, q, k=1).toPandas().set_index("query_id")
    approx = ivf_topk(emb, q, k=1, nprobe=4).toPandas().set_index("query_id")
    hits = sum(
        int(exact.loc[i, "nbr_id"] == approx.loc[i, "nbr_id"])
        for i in exact.index
        if i in approx.index
    )
    assert hits >= len(exact) // 2  # random data, coarse codebook


def test_lang_id_and_quality_shapes(docs):
    from crawl_spark.operators.textops import lang_id, quality_score, token_count

    n = docs.count()
    li = lang_id(docs).toPandas()
    assert len(li) == n and set(li.columns) == {"doc_id", "lang_pred", "lang_score"}
    assert li.lang_pred.isin(["en", "de", "fr", "es", "pl", "und"]).all()
    qs = quality_score(docs).toPandas()
    assert ((qs.quality >= 0) & (qs.quality <= 10)).all()
    tc = token_count(docs).toPandas()
    assert (tc.n_ws_tokens >= tc.n_uniq_tokens).all()


def test_fingerprint_winnowing_property(spark):
    """Winnowing guarantee: the fingerprint set is a subset of the
    shingle hashes and shared text yields shared fingerprints."""
    from crawl_spark.operators.textops import fingerprint

    text = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, text), (2, text + " extra tail words here")],
        "doc_id long, text string",
    )
    out = fingerprint(df).toPandas()
    assert (out.n_fingerprints >= 1).all()
    # identical prefix -> the min fingerprint of doc1 appears in doc2's
    # windows iff windows overlap; weaker but deterministic check:
    assert out[out.doc_id == 1].min_fingerprint.iloc[0] is not None


def test_vocabulary_counts_match_python(spark):
    from crawl_spark.operators.textops import vocabulary

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b"), (3, "c")], "doc_id long, text string"
    )
    out = vocabulary(df, top_k=10, min_count=1).toPandas()
    got = {r.token: (r["count"], r.doc_freq, r["rank"]) for _, r in out.iterrows()}
    # counts with multiplicity; doc_freq distinct docs; rank by (count desc, token)
    assert got["a"] == (3, 2, 1)
    assert got["b"] == (3, 2, 2)
    assert got["c"] == (2, 2, 3)


def test_clean_corpus_gates(spark):
    from crawl_spark.operators.textops import clean_corpus

    long_en = "the " + " ".join(f"w{i}" for i in range(40)) + " of and to in is"
    df = spark.createDataFrame(
        [(1, long_en), (2, long_en), (3, "short text"), (4, "x " * 40)],
        "doc_id long, text string",
    )
    out = clean_corpus(df, min_tokens=30, min_quality=4.0).toPandas()
    # doc 1 survives (dup of 2 collapses to min id), 3 too short, 4 no stopwords
    assert list(out.doc_id) == [1]
    assert int(out.n_copies.iloc[0]) == 2


def test_grouped_topk_equals_window(spark):
    """grouped_topk (distributed per-group top-k) must equal the plain
    window-rank formulation — int k and per-row budget-column k — on
    skewed data spread across many input partitions."""
    from pyspark.sql import Window

    from crawl_spark.operators.topk import grouped_topk

    rng = np.random.RandomState(7)
    n = 5000
    pdf = pd.DataFrame(
        {
            "host": ["h%d" % int(g) for g in rng.zipf(1.3, n) % 17],
            "a": rng.permutation(n),  # unique key
        }
    )
    df = spark.createDataFrame(pdf).repartition(16).localCheckpoint(eager=True)
    w = Window.partitionBy("host").orderBy("a")
    ranked = df.withColumn("rn", F.row_number().over(w))

    for k in (1, 7, 100):
        exp = set(map(tuple, ranked.filter(F.col("rn") <= k).select("host", "a").collect()))
        got = set(map(tuple, grouped_topk(df, ["host"], ["a"], k).select("host", "a").collect()))
        assert got == exp, "int k=%d" % k

    # per-group budget column: k = (host index % 5) + 1
    budgets = spark.createDataFrame(
        [("h%d" % i, i % 5 + 1) for i in range(17)], "host string, kb long"
    )
    dfb = df.join(F.broadcast(budgets), "host")
    exp = set(
        map(
            tuple,
            dfb.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= F.col("kb"))
            .select("host", "a")
            .collect(),
        )
    )
    got = set(map(tuple, grouped_topk(dfb, ["host"], ["a"], "kb").select("host", "a").collect()))
    assert got == exp


def test_trained_ivf_beats_untrained_codebook(spark):
    """k-means-trained centroids must deliver better (or equal, never
    worse) nprobe=1 top-1 recall than the arbitrary id-subset codebook
    on clustered data — and clear an absolute recall bar."""
    from crawl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(11)
    centers = rng.normal(scale=8.0, size=(8, 16))
    vecs = np.concatenate(
        [c + rng.normal(scale=0.3, size=(50, 16)) for c in centers]
    ).astype(np.float32)
    ids = rng.permutation(len(vecs))
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    emb = spark.createDataFrame(pdf).localCheckpoint(eager=True)

    q = emb.filter(F.col("vec_id") < 12)
    exact = brute_force_topk(emb, q, k=1).toPandas().set_index("query_id")

    def recall(approx):
        a = approx.toPandas().set_index("query_id")
        return sum(
            int(exact.loc[i, "nbr_id"] == a.loc[i, "nbr_id"])
            for i in exact.index
            if i in a.index
        ) / len(exact)

    cents = train_ivf_centroids(emb, k=8, iters=4)
    r_trained = recall(ivf_topk(emb, q, k=1, nprobe=1, centroids=cents))
    r_untrained = recall(ivf_topk(emb, q, k=1, nprobe=1, centroid_mod=41))
    assert r_trained >= r_untrained
    assert r_trained >= 0.9, (r_trained, r_untrained)


def test_signbit_lsh_buckets_and_neardup(spark):
    """Random-hyperplane LSH: a vector and its tiny perturbation share a
    bucket (high cosine ⇒ same sign bits); the blocked near-dup pass
    finds every planted pair without an all-pairs join."""
    from crawl_spark.operators.similarity import (
        signbit_neardup_pairs,
        simhash_sign_buckets,
    )

    rng = np.random.RandomState(3)
    base = rng.normal(size=(40, 16)).astype(np.float64) * 4
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, [float(x) for x in v]))
        noisy = v + rng.normal(scale=1e-4, size=16)
        rows.append((i * 2 + 1, [float(x) for x in noisy]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    b = simhash_sign_buckets(emb, n_bits=12, dim=16).toPandas().set_index("vec_id")
    same = sum(int(b.loc[2 * i].bucket == b.loc[2 * i + 1].bucket) for i in range(40))
    assert same >= 38  # near-identical vectors collide (ε bit-flip rate)
    assert b.bucket.nunique() > 10  # but the space is genuinely spread

    pairs = signbit_neardup_pairs(emb, threshold=0.999, n_bits=12, dim=16).toPandas()
    found = {(r.id_a, r.id_b) for _, r in pairs.iterrows()}
    planted_found = sum(int((2 * i, 2 * i + 1) in found) for i in range(40))
    assert planted_found == same  # every colliding planted pair verified


def test_block_dedup_removes_repeated_chunks(spark):
    """Token-block dedup: a boilerplate chunk shared by many docs
    survives only in the first (doc_id, block) position; unique chunks
    all survive."""
    from crawl_spark.operators.dedup import block_dedup

    boiler = " ".join("b%d" % i for i in range(16))  # one exact block
    docs = [
        (0, boiler + " " + " ".join("u0x%d" % i for i in range(16))),
        (1, boiler + " " + " ".join("u1x%d" % i for i in range(16))),
        (2, " ".join("u2x%d" % i for i in range(16)) + " " + boiler),
        (3, " ".join("u3x%d" % i for i in range(32))),
    ]
    out = (
        block_dedup(spark.createDataFrame(docs, "doc_id long, text string"), block=16)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.n_blocks) == [2, 2, 2, 2]
    # doc 0 keeps both (first writer of the boilerplate); docs 1 and 2
    # lose exactly the boilerplate block; doc 3 is untouched
    assert list(out.n_kept) == [2, 1, 1, 2]
    assert list(out.kept_ratio) == [1.0, 0.5, 0.5, 1.0]


def test_tfidf_top_terms_matches_python(spark):
    from crawl_spark.operators.textops import tfidf_top_terms

    docs = [(1, "a a b c"), (2, "a b b"), (3, "c d d d")]
    out = tfidf_top_terms(
        spark.createDataFrame(docs, "doc_id long, text string"), top_k=2
    ).toPandas()
    N = 3
    dfreq = {"a": 2, "b": 2, "c": 2, "d": 1}
    tfs = {1: {"a": 2, "b": 1, "c": 1}, 2: {"a": 1, "b": 2}, 3: {"c": 1, "d": 3}}
    for doc, tf in tfs.items():
        exp = sorted(
            (
                (round(tf[t] * (math.log((N + 1) / (dfreq[t] + 1)) + 1), 6), t)
                for t in tf
            ),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        got = out[out.doc_id == doc].sort_values("rank")
        assert list(got.token) == [t for _, t in exp], doc
        for (_, row), (score, _) in zip(got.iterrows(), exp):
            assert abs(row.tfidf - score) < 1e-9


def test_neardup_clusters_transitive_closure(spark):
    """Clusters must be the exact transitive closure of the verified pair
    graph: cluster_id = min reachable doc id (BFS oracle in plain
    Python), singletons are their own canonical cluster."""
    from crawl_spark.operators.dedup import neardup_clusters, ngram_jaccard_pairs

    docs = spark.read.parquet(DOCS)
    pairs = ngram_jaccard_pairs(docs, threshold=0.1).collect()
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
    got = neardup_clusters(docs, threshold=0.1).collect()
    assert len(got) == docs.count()
    assert len(pairs) > 0  # the fixture corpus must exercise real merges
    by_id = {r.doc_id: r for r in got}
    sizes: dict[int, int] = {}
    for r in got:
        cid = expect.get(r.doc_id, r.doc_id)  # singleton -> own id
        assert r.cluster_id == cid, (r.doc_id, r.cluster_id, cid)
        assert r.is_canonical == (r.doc_id == cid)
        sizes[cid] = sizes.get(cid, 0) + 1
    for r in got:
        assert r.cluster_size == sizes[r.cluster_id]
    assert max(sizes.values()) >= 3  # at least one transitive (A-B-C) merge


def test_pii_scrub_redacts_and_counts(spark):
    from crawl_spark.operators.textops import pii_scrub

    rows = [
        (1, "write to alice.smith+x@sub.example.org or bob@ex.io today"),
        (2, "server at 10.0.42.7 and backup 192.168.1.255 online"),
        (3, "call +14155551234 now"),
        (4, "mixed bob@ex.io from 8.8.8.8 dials +4915123456789 ok"),
        (5, "nothing sensitive here at all"),
        (6, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in pii_scrub(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (2, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) == (0, 2, 0)
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["n_phones"]) == (0, 0, 1)
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (1, 1, 1)
    assert (out[5]["n_emails"], out[5]["n_ipv4"], out[5]["n_phones"]) == (0, 0, 0)
    # byte-level contract: clean_md5 is md5 of the hand-redacted text
    expected4 = "mixed <EMAIL> from <IP> dials <PHONE> ok"
    assert out[4]["clean_md5"] == hashlib.md5(expected4.encode()).hexdigest()
    assert out[4]["clean_len"] == len(expected4)
    assert out[6]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_gopher_repetition_flags_repetitive_docs(spark):
    from crawl_spark.operators.textops import gopher_repetition

    clean = "the quick brown fox jumps over a lazy dog near the river bank"
    spammy_lines = "buy now\n" * 10 + "unique tail"
    spammy_grams = " ".join(["click here"] * 20)
    rows = [(1, clean), (2, spammy_lines), (3, spammy_grams), (4, "")]
    out = {
        r["doc_id"]: r
        for r in gopher_repetition(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["keep"] is True and out[1]["dup_line_frac"] == 0.0
    # 11 non-blank lines, 2 distinct -> dup frac 9/11
    assert out[2]["n_lines"] == 11
    assert out[2]["dup_line_frac"] == round(1 - 2 / 11, 6)
    assert out[2]["keep"] is False
    # "here click" and "click here" alternate; top 2-gram = 20 of 39
    assert out[3]["top2gram_frac"] == round(20 / 39, 6)
    assert out[3]["keep"] is False
    assert out[4]["n_lines"] == 0 and out[4]["keep"] is True


def test_line_dedup_removes_corpus_hot_lines(spark):
    from crawl_spark.operators.dedup import line_dedup

    boiler = "subscribe to our newsletter"
    docs = []
    for i in range(5):  # boilerplate line in 5 docs (> max_docs=3)
        docs.append((i, f"unique opener {i}\n{boiler}\n\nunique closer {i}"))
    docs.append((9, boiler))  # doc that is ONLY the hot line
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            spark.createDataFrame(docs, "doc_id long, text string"), max_docs=3
        ).collect()
    }
    for i in range(5):
        assert out[i]["n_lines"] == 4
        assert out[i]["n_kept"] == 3  # blank line is kept, boiler dropped
        rebuilt = f"unique opener {i}\n\nunique closer {i}"
        assert out[i]["clean_md5"] == hashlib.md5(rebuilt.encode()).hexdigest()
    assert out[9]["n_kept"] == 0
    assert out[9]["clean_md5"] == hashlib.md5(b"").hexdigest()
    # below the threshold nothing is removed
    out3 = line_dedup(
        spark.createDataFrame(docs[:3], "doc_id long, text string"), max_docs=3
    ).collect()
    assert all(r["n_kept"] == r["n_lines"] for r in out3)


def test_hash_sample_matches_python_rule(spark):
    from crawl_spark.operators.sampling import hash_sample, rate_threshold

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = hash_sample(df, rates={"en": 0.5}, default_rate=0.125).collect()
    expect = set()
    for i, lang in rows:
        b = hashlib.md5(str(i).encode()).hexdigest()[:4]
        if b < rate_threshold(0.5 if lang == "en" else 0.125):
            expect.add(i)
    assert {r["doc_id"] for r in kept} == expect
    n_en = sum(1 for r in kept if r["lang"] == "en")
    n_de = len(kept) - n_en
    assert 400 < n_en < 600 and 60 < n_de < 190  # ~0.5 / ~0.125 of 1000
    # rate 1.0 keeps everything (threshold 'g' sorts after all hex)
    assert hash_sample(df, default_rate=1.0).count() == 2000
    assert hash_sample(df, default_rate=0.0).count() == 0


def test_domain_quota_caps_groups_deterministically(spark):
    from crawl_spark.operators.sampling import domain_quota

    rows = [(i, "big") for i in range(100)] + [(100 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_quota(df, quota=10).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src["big"]) == 10 and len(by_src["small"]) == 4
    expect_big = set(
        sorted(range(100), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:10]
    )
    assert by_src["big"] == expect_big


def test_weighted_sample_matches_python_twin(spark):
    """Sequential-Poisson πps selection replayed in pure Python: same
    md5 uniform, same single-division priority, same (key, id) order —
    the selected SET is bit-exact, and NULL/NaN/zero/negative weights
    are dropped (NaN explicitly: Spark orders NaN above all numbers)."""
    from crawl_spark.operators.sampling import weighted_sample

    rows = []
    for i in range(3000):
        w = [2.0, 9.0, 0.5, 0.0, -1.0, float("nan"), None][i % 7]
        rows.append((i, "s%d" % (i % 3), w))
    df = spark.createDataFrame(
        rows + [(None, "s0", 5.0)],  # NULL id: NULL priority would
        # sort FIRST in Spark's ascending top-k — must be dropped
        "doc_id long, lang string, weight double",
    )

    def key(i, w):
        v = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
        return ((v + 1) / (1 << 52)) / w

    expect = {}
    for i, s, w in rows:
        if w is not None and w == w and w > 0:
            expect.setdefault(s, []).append((key(i, w), i))
    want = {
        (s, i)
        for s, ks in expect.items()
        for _, i in sorted(ks)[:11]
    }
    got = weighted_sample(df, 11, "weight", "doc_id", ("lang",)).collect()
    assert {(r["lang"], r["doc_id"]) for r in got} == want
    assert all(r["weight"] > 0 for r in got)


def test_weighted_sample_proportionality_and_guards(spark):
    """Inclusion tracks weight: w=10 items (1/10th of the corpus) take
    ~52% of the slots at this k (analytic threshold: 5000t + 4500t =
    500 → heavy share 0.526); k >= eligible keeps everything; k <= 0
    and missing columns raise."""
    import pytest
    from crawl_spark.operators.sampling import weighted_sample

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, 10.0).otherwise(1.0).alias("weight"),
    )
    got = weighted_sample(df, 500, strata=()).collect()
    heavy = sum(1 for r in got if r["weight"] == 10.0)
    assert len(got) == 500 and 220 <= heavy <= 310  # 263 expected
    assert weighted_sample(df, 10_000, strata=()).count() == 5000
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample(df, 0, strata=())
    with pytest.raises(ValueError, match="column not in df"):
        weighted_sample(df, 5, weight_col="nope", strata=())


def test_mix_domains_matches_python_rule(spark):
    """Temperature mixing (share ∝ sqrt(count)) replayed in pure
    Python: same kept set, buckets and thresholds. Python round() is
    banker's (Spark/DuckDB are HALF_UP) — irrelevant here because
    sqrt(int)·10^6 never lands on an exact .5 tie for non-perfect
    squares."""
    import math
    from decimal import Decimal

    from crawl_spark.operators.sampling import mix_domains

    rows = [(i, "en" if i % 4 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r["doc_id"]: r for r in mix_domains(df, budget=300).collect()}

    cnt: dict[str, int] = {}
    for _, lang in rows:
        cnt[lang] = cnt.get(lang, 0) + 1
    w = {l: Decimal(str(round(math.sqrt(c), 6))) for l, c in cnt.items()}
    W = float(sum(w.values()))
    thr = {
        l: math.floor(
            65536.0 * min((300.0 * float(w[l])) / W / cnt[l], 1.0)
        )
        for l in cnt
    }
    kept = {}
    for i, l in rows:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        if b < thr[l]:
            kept[i] = (l, b, thr[l])
    assert set(out) == set(kept)
    for i, (l, b, t) in kept.items():
        assert (out[i]["lang"], out[i]["bucket"], out[i]["thr"]) == (l, b, t)
    # alpha=0.5 lifts the tail: fr (500 docs) keeps a HIGHER fraction
    # than en (1500 docs)
    assert thr["fr"] > thr["en"]


def test_mix_domains_alpha_extremes(spark):
    """alpha=1 reproduces the corpus mix (equal keep-rate for every
    stratum); budget >= corpus keeps everything (rate capped at 1)."""
    from crawl_spark.operators.sampling import mix_domains, mix_rates

    rows = [(i, "en" if i % 4 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    thr = {
        r["lang"]: r["thr"]
        for r in mix_rates(df, budget=400, alpha=1.0).collect()
    }
    # proportional weights → identical per-stratum keep rate (400/2000)
    assert thr["en"] == thr["fr"] == int(65536 * 400 / 2000)
    assert mix_domains(df, budget=5000).count() == 2000


def test_contamination_report_counts(spark):
    from crawl_spark.operators.dedup import contamination_report

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # shares 3 of b0's grams
            (2, "x y z w q"),  # clean
            (3, "c d e q r s"),  # shares 1
            (4, "a b c"),  # shares 1
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "a b c d e", "b0"), (11, "m n o", "b1")],
        "doc_id long, text string, bench string",
    )
    out = {r["bench"]: r for r in contamination_report(df, ev, n=3).collect()}
    b0 = out["b0"]  # eval grams: 'a b c', 'b c d', 'c d e'
    assert (b0["n_eval_grams"], b0["n_hit_grams"], b0["n_hit_docs"]) == (3, 3, 3)
    assert b0["gram_frac"] == 1.0 and b0["doc_frac"] == 0.75
    b1 = out["b1"]  # zero hits still keeps its row
    assert (b1["n_eval_grams"], b1["n_hit_grams"], b1["n_hit_docs"]) == (1, 0, 0)
    assert b1["gram_frac"] == 0.0 and b1["doc_frac"] == 0.0


def test_connected_components_random_graphs_property(spark):
    """20 seeded random graphs (disjoint node ranges, one Spark job)
    must match union-find — exercises convergence across many shapes:
    chains, stars, cycles, isolated pairs, dup edges."""
    import random

    from crawl_spark.operators.graph import connected_components

    rng = random.Random(42)
    E = []
    for g in range(20):
        base = g * 1000
        n_nodes = rng.randint(2, 25)
        for _ in range(rng.randint(1, 35)):
            E.append(
                (base + rng.randrange(n_nodes), base + rng.randrange(n_nodes))
            )
    df = spark.createDataFrame(E, "a long, b long")
    out = {r["node"]: r["component"] for r in connected_components(df).collect()}

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for u, v in E:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    assert out == {v: find(v) for v in parent}


def test_pagerank_random_graph_property(spark):
    """Seeded random graph vs the numpy power iteration — covers
    dangling nodes, self-loops, multi-edges and rank conservation."""
    import random

    import numpy as np

    from crawl_spark.operators.graph import pagerank

    rng = random.Random(7)
    E = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    df = spark.createDataFrame(E, "src long, dst long")
    out = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}

    ded = sorted(set(E))
    nodes = sorted({u for e in ded for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n, d = len(nodes), 0.85
    deg = {}
    for s, _ in ded:
        deg[s] = deg.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(4):
        dm = sum(r[idx[v]] for v in nodes if v not in deg)
        s = np.zeros(n)
        for u, v in ded:
            s[idx[v]] += r[idx[u]] / deg[u]
        r = (1 - d) / n + d * (s + dm / n)
    assert out == {v: round(float(r[idx[v]]), 6) for v in nodes}
    assert abs(sum(out.values()) - 1.0) < 1e-4


def test_pack_sequences_random_docs_property(spark):
    """Seeded random doc lengths (incl. empty docs) must reproduce the
    python packer exactly for every stream."""
    import random

    from crawl_spark.operators.sampling import pack_sequences

    rng = random.Random(99)
    rows = [
        (i, " ".join("w%d" % j for j in range(rng.choice([0, 1, 3, 17, 64, 200]))))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, seq_len=128, streams=16).collect()}

    streams = {}
    for i, text in rows:
        pick = hashlib.md5(str(i).encode()).hexdigest()
        streams.setdefault(int(pick[:8], 16) % 16, []).append(
            (pick, i, len(text.split()))
        )
    for s, docs in streams.items():
        off = 0
        for pick, i, n in sorted(docs):
            r = out[i]
            assert (r["stream"], r["n_tokens"], r["start_offset"], r["bin"]) == (
                s, n, off, off // 128,
            )
            off += n
    assert len(out) == 400


def test_latest_capture_keeps_newest_row(spark):
    from datetime import datetime

    from crawl_spark.operators.dedup import latest_capture

    rows = [
        ("u1", datetime(2024, 1, 1), "old"),
        ("u1", datetime(2024, 3, 1), "new"),
        ("u1", datetime(2024, 2, 1), "mid"),
        ("u2", datetime(2024, 1, 1), "only"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = {r["url"]: r for r in latest_capture(df).collect()}
    assert out["u1"]["text"] == "new" and out["u1"]["n_captures"] == 3
    assert out["u1"]["warc_ts"] == datetime(2024, 3, 1)
    assert out["u2"]["text"] == "only" and out["u2"]["n_captures"] == 1
    # keep_cols narrows the carried struct
    slim = latest_capture(df, keep_cols=["warc_ts"]).columns
    assert slim == ["url", "warc_ts", "n_captures"]


def test_anchor_text_topk_matches_window(spark):
    from pyspark.sql import Window

    from crawl_spark.operators.graph import anchor_text_topk

    # hub target with heavy repetition + a cold tail with ties
    rows = (
        [("hub", f"anchor{i % 6}") for i in range(600)]
        + [("cold1", "x"), ("cold1", "x"), ("cold1", "y"), ("cold2", "z")]
    )
    df = spark.createDataFrame(rows, "dst string, anchor string")
    got = {
        (r["dst"], r["anchor"], r["n_links"])
        for r in anchor_text_topk(df, k=2).collect()
    }
    c = df.groupBy("dst", "anchor").count().withColumnRenamed("count", "n_links")
    w = Window.partitionBy("dst").orderBy(F.col("n_links").desc(), "anchor")
    expect = {
        (r["dst"], r["anchor"], r["n_links"])
        for r in c.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 2").drop("rn").collect()
    }
    assert got == expect
    assert ("cold2", "z", 1) in got and ("cold1", "x", 2) in got


def test_pagerank_matches_power_iteration(spark):
    import numpy as np

    from crawl_spark.operators.graph import pagerank

    E = [(0, 1), (0, 2), (1, 2), (2, 0), (4, 2), (4, 3), (0, 1)]  # dup edge
    df = spark.createDataFrame(E, "src long, dst long")
    out = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}

    ded = sorted(set(E))
    nodes = sorted({u for e in ded for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n, d = len(nodes), 0.85
    deg = {}
    for s, _ in ded:
        deg[s] = deg.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        dm = sum(r[idx[v]] for v in nodes if v not in deg)
        s = np.zeros(n)
        for u, v in ded:
            s[idx[v]] += r[idx[u]] / deg[u]
        r = (1 - d) / n + d * (s + dm / n)
    assert out == {v: round(float(r[idx[v]]), 6) for v in nodes}
    # rank is a distribution at every step (dangling mass redistributed)
    assert abs(sum(out.values()) - 1.0) < 1e-4
    # node 4 has no in-links: floor rank; dangling node 3 sits just above
    assert out[4] == min(out.values()) and out[3] < out[2]


def test_pagerank_bucketed_edges_never_shuffle(spark, tmp_path):
    from pyspark.sql import functions as F

    from crawl_spark.operators.graph import pagerank

    e = spark.range(2000).select(
        (F.col("id") % 97).alias("src"), ((F.col("id") * 31 + 7) % 97).alias("dst")
    )
    plain = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    # force the SMJ path so the plan question is real, not broadcast-hidden
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = pagerank(
            e, iters=3, bucket_path=str(tmp_path / "edges"), n_buckets=8,
            bucket_table="pr_edges_test",
        )
        bucketed = {r["node"]: r["rank"] for r in df.collect()}
        # plan evidence: the per-iteration contribution join scans the
        # bucketed table with no exchange on the edge side
        ranks = spark.range(97).select(F.col("id").alias("src"), F.lit(1.0).alias("w"))
        j = (
            spark.table("pr_edges_test").join(ranks, "src")
            .groupBy("dst").agg(F.sum("w").alias("s"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # left (edge) branch of the SMJ = the ":"-prefixed lines
        after = plan.split("SortMergeJoin")[1].splitlines()[1:]
        edge_side = [l for l in after if l.lstrip().startswith(":")]
        assert edge_side and any("FileScan" in l for l in edge_side)
        assert not any("Exchange" in l for l in edge_side)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS pr_edges_test")
    # same nodes; ranks equal within one ulp of the 6dp rounding (the
    # layouts sum float contributions in different orders, so bit-exact
    # equality of rounded values would be flaky near .5e-6 boundaries)
    assert set(bucketed) == set(plain)
    assert max(abs(bucketed[n] - plain[n]) for n in plain) <= 1e-6


def _hits_python(E, iters):
    """Driver-side twin of graph.hits: L1-normalized alternating updates."""
    ded = sorted(set(E))
    nodes = sorted({u for e in ded for u in e})
    h = {v: 1.0 / len(nodes) for v in nodes}
    a = {}
    for _ in range(iters):
        a = {v: 0.0 for v in nodes}
        for u, v in ded:
            a[v] += h[u]
        t = sum(a.values())
        a = {v: (x / t if t > 0 else 0.0) for v, x in a.items()}
        h = {v: 0.0 for v in nodes}
        for u, v in ded:
            h[u] += a[v]
        t = sum(h.values())
        h = {v: (x / t if t > 0 else 0.0) for v, x in h.items()}
    return {v: (round(h[v], 6), round(a[v], 6)) for v in nodes}


def test_hits_matches_python_iteration(spark):
    from crawl_spark.operators.graph import hits

    # 0 links to everything (pure hub), 3 is linked by many (authority),
    # 5 is isolated-ish via a dangling edge, plus a duplicate edge
    E = [(0, 1), (0, 2), (0, 3), (1, 3), (2, 3), (4, 3), (3, 5), (0, 1)]
    df = spark.createDataFrame(E, "src long, dst long")
    out = {r["node"]: (r["hub"], r["authority"]) for r in hits(df, iters=5).collect()}
    assert out == _hits_python(E, 5)
    # structure: 0 is the best hub; 3 is the best authority
    assert max(out, key=lambda v: out[v][0]) == 0
    assert max(out, key=lambda v: out[v][1]) == 3
    # L1 contract: both scores are distributions
    assert abs(sum(v[0] for v in out.values()) - 1.0) < 1e-4
    assert abs(sum(v[1] for v in out.values()) - 1.0) < 1e-4


def test_hits_random_graph_property_and_empty(spark):
    import random

    from crawl_spark.operators.graph import hits

    rng = random.Random(11)
    E = [(rng.randrange(30), rng.randrange(30)) for _ in range(90)]
    df = spark.createDataFrame(E, "src long, dst long")
    out = {r["node"]: (r["hub"], r["authority"]) for r in hits(df, iters=4).collect()}
    assert out == _hits_python(E, 4)
    empty = hits(
        spark.createDataFrame([], "src long, dst long"), iters=3
    ).collect()
    assert empty == []


def test_hits_dual_bucketed_layouts(spark, tmp_path):
    """With bucket_path, BOTH per-iteration joins read a layout
    co-located on their key: the src-bucketed table for the authority
    step and the dst-bucketed table for the hub step — no Exchange on
    the edge side of either join."""
    from pyspark.sql import functions as F

    from crawl_spark.operators.graph import hits

    e = spark.range(1500).select(
        (F.col("id") % 83).alias("src"), ((F.col("id") * 29 + 5) % 83).alias("dst")
    )
    plain = {r["node"]: (r["hub"], r["authority"]) for r in hits(e, iters=3).collect()}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = hits(
            e, iters=3, bucket_path=str(tmp_path / "edges"), n_buckets=8,
            bucket_table="hits_edges_test",
        )
        bucketed = {r["node"]: (r["hub"], r["authority"]) for r in df.collect()}
        scores = spark.range(83).select(F.col("id").alias("k"), F.lit(1.0).alias("w"))
        for key, agg_key in (("src", "dst"), ("dst", "src")):
            j = (
                spark.table(f"hits_edges_test_{key}")
                .join(scores.withColumnRenamed("k", key), key)
                .groupBy(agg_key).agg(F.sum("w").alias("s"))
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan, key
            after = plan.split("SortMergeJoin")[1].splitlines()[1:]
            edge_side = [l for l in after if l.lstrip().startswith(":")]
            assert edge_side and any("FileScan" in l for l in edge_side), key
            assert not any("Exchange" in l for l in edge_side), key
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS hits_edges_test_src")
        spark.sql("DROP TABLE IF EXISTS hits_edges_test_dst")
    assert set(bucketed) == set(plain)
    assert max(
        abs(bucketed[n][i] - plain[n][i]) for n in plain for i in (0, 1)
    ) <= 1e-6


def test_host_graph_collapses_page_links(spark):
    from crawl_spark.operators.graph import host_graph

    links = [
        ("http://a.example/1", "http://b.example/x"),
        ("http://a.example/1", "http://b.example/y"),   # same pair, same page
        ("http://a.example/2", "http://b.example/x"),   # same pair, new page
        ("http://A.EXAMPLE./3", "http://c.example/z"),  # case + trailing dot
        ("http://a.example/4", "http://a.example/5"),   # self-loop: dropped
        ("not a url", "http://b.example/x"),            # malformed: dropped
    ]
    df = spark.createDataFrame(links, "src_url string, dst_url string")
    out = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["n_src_pages"])
        for r in host_graph(df).collect()
    }
    assert out == {
        ("a.example", "b.example"): (3, 2),
        ("a.example", "c.example"): (1, 1),
    }
    with_loops = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["n_src_pages"])
        for r in host_graph(df, keep_self_loops=True).collect()
    }
    assert with_loops[("a.example", "a.example")] == (1, 1)
    assert len(with_loops) == 3


def test_connected_components_matches_union_find(spark):
    from crawl_spark.operators.graph import connected_components

    # two chains, a triangle, a merged pair of chains, and a dup edge
    E = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (20, 21), (21, 22),
         (22, 20), (3, 10), (0, 1)]
    df = spark.createDataFrame(E, "a long, b long")
    out = {r["node"]: r["component"] for r in connected_components(df).collect()}

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for u, v in E:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    expect = {v: find(v) for v in parent}
    assert out == expect
    assert out[12] == 0  # chains merged through 3-10 bridge
    assert out[22] == 20


def test_token_entropy_matches_python(spark):
    from collections import Counter

    from crawl_spark.operators.textops import token_entropy

    rows = [
        (0, "a a a a"),                 # single token: H=0, norm NULL
        (1, "a b c d"),                 # uniform: H=2, norm 1.0
        (2, "a a b"),                   # mixed
        (3, ""),                        # empty: zero counts, NULLs
        (4, "spam spam spam spam ham"), # low-entropy stuffing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    for i, text in rows:
        toks = text.lower().split()
        r = out[i]
        assert r["n_tokens"] == len(toks) and r["n_unique"] == len(set(toks))
        if not toks:
            assert r["entropy"] is None and r["norm_entropy"] is None
            continue
        c = Counter(toks)
        n = len(toks)
        h = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
        assert r["entropy"] == round(h, 6)
        if len(c) > 1:
            assert r["norm_entropy"] == round(h / math.log2(len(c)), 6)
        else:
            assert r["norm_entropy"] is None
    assert out[1]["entropy"] == 2.0 and out[1]["norm_entropy"] == 1.0
    assert out[0]["entropy"] == 0.0
    assert out[4]["entropy"] < out[2]["entropy"] < out[1]["entropy"]


def test_connected_components_raises_when_unconverged(spark):
    """A chain longer than max_iters must fail loudly, not silently
    report one component as several (the DuckDB oracle computes true
    min-reachable labels, so silent truncation would also hash-mismatch)."""
    import pytest

    from crawl_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "a long, b long")
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(df, max_iters=5).collect()
    ok = {r["node"]: r["component"] for r in
          connected_components(df, max_iters=40).collect()}
    assert set(ok.values()) == {0}


def test_pagerank_empty_edges_returns_empty(spark):
    from crawl_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src long, dst long")
    out = pagerank(df, iters=3)
    assert out.columns == ["node", "rank"] and out.count() == 0


def test_pack_sequences_matches_python_packer(spark):
    from crawl_spark.operators.sampling import pack_sequences

    rows = [(i, " ".join(f"tok{j}" for j in range((i * 7) % 50 + 1))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, seq_len=64, streams=8).collect()}

    # Python reference: same md5 stream assignment + concat order.
    streams = {}
    for i, text in rows:
        pick = hashlib.md5(str(i).encode()).hexdigest()
        s = int(pick[:8], 16) % 8
        streams.setdefault(s, []).append((pick, i, len(text.split())))
    for s, docs in streams.items():
        off = 0
        for pick, i, n in sorted(docs):
            r = out[i]
            assert (r["stream"], r["n_tokens"], r["start_offset"], r["bin"]) == (
                s, n, off, off // 64,
            ), f"doc {i}"
            off += n
    assert len(out) == 300
    # every doc placed exactly once; offsets within a stream are disjoint
    for s, docs in streams.items():
        total = sum(n for _, _, n in docs)
        ends = [out[i]["start_offset"] + out[i]["n_tokens"] for _, i, _ in docs]
        assert max(ends) == total


def test_decontaminate_flags_eval_overlap(spark):
    from crawl_spark.operators.dedup import decontaminate

    corpus = [
        (0, "alpha beta gamma delta epsilon zeta"),   # contains the eval 5-gram
        (1, "alpha beta gamma delta DIFFERENT zeta"), # breaks every 5-gram
        (2, "totally unrelated text about other things entirely"),
        (3, "x alpha beta gamma delta epsilon y"),    # eval gram mid-doc
        (4, "too short"),                             # < n tokens: always passes
    ]
    ev = [(100, "alpha beta gamma delta epsilon")]
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            spark.createDataFrame(corpus, "doc_id long, text string"),
            spark.createDataFrame(ev, "doc_id long, text string"),
            n=5,
        ).collect()
    }
    assert len(out) == 5  # every input doc gets a verdict
    assert not out[0]["keep"] and out[0]["n_hit_grams"] == 1
    assert out[1]["keep"] and out[1]["n_hit_grams"] == 0
    assert out[2]["keep"]
    assert not out[3]["keep"] and out[3]["n_hit_grams"] == 1
    assert out[4]["keep"]
    # n larger than every doc: nothing can hit
    clean = decontaminate(
        spark.createDataFrame(corpus, "doc_id long, text string"),
        spark.createDataFrame(ev, "doc_id long, text string"),
        n=50,
    ).collect()
    assert all(r["keep"] for r in clean)


def test_nfc_dedup_merges_composition_variants(spark):
    """Precomposed and combining-mark spellings of the same visible
    string dedup together; NFKC-only equivalences (ligatures,
    fullwidth) deliberately do NOT."""
    from crawl_spark.operators.dedup import exact_dedup, nfc_dedup

    rows = [
        (0, "Café menu Å one"),          # precomposed é, Å
        (1, "Café menu Å one"),        # decomposed twins
        (2, "café   MENU  Å one"),     # + case/ws noise
        (3, "Café menu Å two"),          # different content
        (4, "ﬁne print"),                     # ﬁ ligature (NFKC-only)
        (5, "fine print"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_copies"] for r in nfc_dedup(df).collect()}
    assert out == {0: 3, 3: 1, 4: 1, 5: 1}
    # plain exact_dedup already folds case/ws (1 merges with 2) but
    # NOT composition: the precomposed 0 stays a separate group
    assert len(exact_dedup(df).collect()) == 5


def test_decontaminate_bloom_equals_broadcast(spark):
    """eval_side="bloom" is exactness-preserving at ANY false-positive
    rate: a Bloom negative is authoritative (no false negatives), every
    positive is verified on the md5 digest — so even a deliberately
    tiny, FP-heavy bitmap must reproduce the broadcast path bit-for-bit.
    """
    from crawl_spark.operators.bloom import BloomConfig
    from crawl_spark.operators.dedup import decontaminate

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    corpus = [
        (i, " ".join(words[(i + j) % len(words)] + str((i * 7 + j) % 11) for j in range(12)))
        if i < 60
        else (i, " ".join(f"only{i}w{j}" for j in range(12)))  # no shared grams
        for i in range(120)
    ]
    # eval set = every 9th patterned doc's text (so some corpus docs
    # self-hit and shifted near-copies hit too), plus one gram no corpus
    # doc has; the only{i} docs can never hit
    ev = [(1000 + i, t) for i, t in enumerate(t for d, t in corpus if d % 9 == 0 and d < 60)]
    ev.append((2000, "nope0 nope1 nope2 nope3 nope4"))
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    edf = spark.createDataFrame(ev, "doc_id long, text string")

    want = sorted(map(tuple, decontaminate(cdf, edf, n=5).collect()))
    assert any(r[1] > 0 for r in want) and any(r[1] == 0 for r in want)
    for cfg in (
        None,  # defaults
        BloomConfig(n_buckets=4, bits_per_bucket=1 << 6, n_hashes=2),  # FP-saturated
    ):
        got = sorted(map(tuple, decontaminate(
            cdf, edf, n=5, eval_side="bloom", bloom_cfg=cfg
        ).collect()))
        assert got == want

    import pytest as _pytest
    with _pytest.raises(ValueError, match="eval_side"):
        decontaminate(cdf, edf, n=5, eval_side="nonsense")


def test_url_blocklist_filter_subdomains_and_boundaries(spark):
    from crawl_spark.operators.urlfilter import url_blocklist_filter

    rows = [
        (0, "http://bad.example/x"),               # exact blocked host
        (1, "http://a.b.bad.example/x"),           # deep subdomain -> blocked
        (2, "HTTP://BAD.EXAMPLE:8080/x"),          # case + port -> blocked
        (3, "http://notbad.example/x"),            # label boundary: NOT blocked
        (4, "http://bad.example.com/x"),           # different apex: NOT blocked
        (5, "http://user:pw@bad.example/x"),       # userinfo form -> blocked
        (6, "http://good.example/x"),
        (7, "http://example/x"),                   # bare host, not in list
        (8, "http://bad.example./x"),              # root-dot FQDN -> blocked
        (9, "http://a.bad.example./x"),            # root-dot subdomain -> blocked
        # >MAX_LABELS labels: the cap is taken from the apex end, so
        # prepending 11 subdomain labels is NOT a blocklist-evasion path
        (10, "http://" + ".".join(f"x{i}" for i in range(11)) + ".bad.example/x"),
        # same depth under an unblocked apex stays unblocked
        (11, "http://" + ".".join(f"x{i}" for i in range(11)) + ".good.example/x"),
    ]
    blocked = spark.createDataFrame([("bad.example",), ("evil.test",)], ["host"])
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_blocklist_filter(df, blocked).collect()
    assert {r["doc_id"] for r in out} == {3, 4, 6, 7, 11}
    hosts = {r["doc_id"]: r["host"] for r in out}
    assert hosts[3] == "notbad.example" and hosts[4] == "bad.example.com"
    # empty blocklist keeps everything
    none_blocked = url_blocklist_filter(
        df, spark.createDataFrame([], "host string")
    )
    assert none_blocked.count() == 12


def test_cc_star_chain_converges_in_log_rounds(spark):
    """The round-4 log-round variant: a 10k-node chain has diameter
    9999 — min-label propagation would need 9999 edge-scan rounds;
    star contraction must finish inside 20 and still produce the exact
    min-reachable labels."""
    from crawl_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(9999)], "a long, b long"
    )
    stats = {}
    out = {
        r["node"]: r["component"]
        for r in connected_components_star(df, max_rounds=20, stats=stats).collect()
    }
    assert stats["rounds"] <= 20
    assert len(out) == 10000 and set(out.values()) == {0}


def test_cc_star_random_graphs_match_union_find(spark):
    """Same 20-seeded-random-graphs property as the min-label operator:
    star contraction must agree with union-find on every node."""
    import random

    from crawl_spark.operators.graph import connected_components_star

    rng = random.Random(42)
    E = []
    for g in range(20):
        base = g * 1000
        n_nodes = rng.randint(2, 25)
        for _ in range(rng.randint(1, 35)):
            E.append(
                (base + rng.randrange(n_nodes), base + rng.randrange(n_nodes))
            )
    df = spark.createDataFrame(E, "a long, b long")
    out = {
        r["node"]: r["component"]
        for r in connected_components_star(df).collect()
    }

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in E:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    assert out == {v: find(v) for v in parent}


def test_cc_star_selfloop_and_agreement_with_minlabel(spark):
    """Self-loop-only nodes are singleton components (parity with the
    min-label operator), and both operators emit identical labelings
    on a mixed graph."""
    from crawl_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    E = [(5, 5), (0, 1), (1, 2), (10, 11), (12, 12), (2, 0)]
    df = spark.createDataFrame(E, "a long, b long")
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    minl = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert star == minl
    assert star[5] == 5 and star[12] == 12


def test_repeated_spans_matches_bruteforce(spark):
    """Arbitrary-offset substring dedup (round 4): planted repeated
    spans at NON-chunk-aligned offsets, overlapping repeats, a
    within-doc self-repeat, and clean docs — the Spark hashed-w-gram
    operator must agree with a brute-force Python model on every doc."""
    from crawl_spark.operators.dedup import repeated_spans

    W = 5
    lic = "licensed under the apache license version two point zero ok"
    docs = [
        # d0/d1 share `lic` at different, non-aligned offsets
        (0, "alpha beta " + lic + " gamma delta epsilon zeta eta theta"),
        (1, "one two three four " + lic),
        # d2 repeats a 5-token phrase INSIDE itself (two disjoint spans:
        # starts 2 and 13, gap 11 > W so they do NOT merge)
        (2, "x1 x2 red green blue cyan magenta x3 x4 x5 x6 x7 x8 "
            "red green blue cyan magenta x9"),
        # d3 clean (unique words)
        (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),
        # d4 shorter than the window
        (4, "tiny doc"),
        # d5 exact duplicate of d3's tail + unique prefix (boundary span)
        (5, "p1 p2 p3 q4 q5 q6 q7 q8 q9 q10"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_covered, r.n_spans, r.dup_ratio)
        for r in repeated_spans(df, window=W).collect()
    }

    # brute force: every w-gram string, corpus-wide counts, coverage set
    from collections import Counter

    tok = {d: t.lower().split() for d, t in docs}
    cnt = Counter()
    grams = {}
    for d, ts in tok.items():
        g = [" ".join(ts[p:p + W]) for p in range(max(len(ts) - W + 1, 0))]
        grams[d] = g
        cnt.update(g)
    for d, ts in tok.items():
        covered = set()
        for p, g in enumerate(grams[d]):
            if cnt[g] >= 2:
                covered.update(range(p, p + W))
        spans, prev = 0, None
        for q in sorted(covered):
            if prev is None or q != prev + 1:
                spans += 1
            prev = q
        ratio = round(len(covered) / len(ts), 6) if ts else 0.0
        assert got[d] == (len(ts), len(covered), spans, ratio), d
    # the planted license span really was detected
    assert got[0][1] >= W and got[1][1] >= W and got[2][2] == 2


def test_ivf_shortlist_rerank(spark):
    """Two-stage shortlist re-rank (round 4): with shortlist_dims = full
    dim the truncated ordering IS the exact ordering, so results match
    the plain path row-for-row; with a 16-dim shortlist the output is
    still k well-formed exact-scored rows per query with high overlap."""
    from crawl_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(EMB)
    q = emb.filter(F.col("vec_id") < 8)
    plain = ivf_topk(emb, q, k=5, nprobe=4).toPandas()
    full = ivf_topk(
        emb, q, k=5, nprobe=4, shortlist_dims=64, shortlist_mult=1
    ).toPandas()
    key = ["query_id", "rank"]
    assert (
        plain.sort_values(key).reset_index(drop=True).equals(
            full.sort_values(key).reset_index(drop=True)
        )
    )
    short = ivf_topk(
        emb, q, k=5, nprobe=4, shortlist_dims=16, shortlist_mult=4
    ).toPandas()
    assert (short.groupby("query_id")["rank"].count() == 5).all()
    # exact re-rank: every emitted cos is the full-dim cosine, so any
    # (query, nbr) pair present in both paths carries the same score
    merged = short.merge(plain, on=["query_id", "nbr_id"], suffixes=("_s", "_p"))
    assert (merged["cos_s"] == merged["cos_p"]).all()

    # the shortlist's accuracy CONTRACT needs front-loaded dimensions
    # (the docstring's stated assumption): on a fixture whose leading 8
    # dims carry ~100x the energy of the tail, an 8-dim shortlist must
    # recover (nearly) the plain path's top-k. The isotropic sf
    # embeddings deliberately can't show this — random truncation keeps
    # only dims/DIM of the signal.
    rng = np.random.RandomState(7)
    vecs = np.concatenate(
        [rng.randn(400, 8) * 10.0, rng.randn(400, 24) * 0.1], axis=1
    )
    fl = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    flq = fl.filter(F.col("vec_id") < 8)
    p2 = ivf_topk(fl, flq, k=5, nprobe=4).toPandas()
    s2 = ivf_topk(
        fl, flq, k=5, nprobe=4, shortlist_dims=8, shortlist_mult=4
    ).toPandas()
    m2 = s2.merge(p2, on=["query_id", "nbr_id"])
    overlap = len(m2) / len(p2)
    assert overlap >= 0.9, overlap


def test_suggest_ivf_cells_bounds():
    from crawl_spark.operators.similarity import suggest_ivf_cells

    assert suggest_ivf_cells(0) == 16
    assert suggest_ivf_cells(100) == 16
    assert suggest_ivf_cells(1_000_000) == 1000
    assert suggest_ivf_cells(10**12) == 1 << 16


def test_pack_sequences_warns_below_parallelism(spark):
    import warnings

    from crawl_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id long, text string"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pack_sequences(df, streams=2).collect()
    assert any("defaultParallelism" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pack_sequences(df, streams=4096).collect()
    assert not any("defaultParallelism" in str(x.message) for x in w)


def test_pq_encode_and_adc_match_python(spark):
    """Product quantization (round 4): codes, ADC top-k and the exact
    re-rank must match a from-first-principles numpy/python model under
    the 6dp micro-unit integer contract (bit-exact argmin/ordering)."""
    from crawl_spark.operators.similarity import pq_encode, pq_topk

    M, K = 8, 16
    emb = spark.read.parquet(EMB)
    codes = {r.vec_id: list(r.codes) for r in pq_encode(emb).collect()}
    pdf = emb.toPandas()
    ids = pdf.vec_id.to_numpy()
    V = np.stack(pdf.embedding.map(np.asarray)).astype(np.float64)
    base = V[np.argsort(ids)[:K]]

    def micro(a, b):
        d = 0.0
        for x, y in zip(a, b):
            d += (x - y) * (x - y)
        # Spark F.round is HALF_UP; python round is banker's — match it
        return math.floor(d * 1e6 + 0.5)

    def np_code(v, j):
        return min(
            (micro(base[c][j * 8:(j + 1) * 8], v[j * 8:(j + 1) * 8]), c)
            for c in range(K)
        )[1]

    for i in range(len(ids)):
        assert codes[ids[i]] == [np_code(V[i], j) for j in range(M)], ids[i]

    got = pq_topk(emb, emb.filter(F.col("vec_id") < 4), q_k=5).toPandas()
    for qid in sorted(ids)[:4]:
        qi = np.where(ids == qid)[0][0]
        dt = [
            [micro(base[c][j * 8:(j + 1) * 8], V[qi][j * 8:(j + 1) * 8])
             for c in range(K)]
            for j in range(M)
        ]
        want = sorted(
            (sum(dt[j][codes[ids[i]][j]] for j in range(M)), int(ids[i]))
            for i in range(len(ids))
            if ids[i] != qid
        )[:5]
        g = got[got.query_id == qid].sort_values("rank")
        assert list(zip(g.nbr_id, g.adc_d2)) == [(n, s / 1e6) for s, n in want]

    # exact re-rank: d2 is the true full-dim squared L2
    rr = pq_topk(
        emb, emb.filter(F.col("vec_id") < 4), q_k=5, rerank_mult=4
    ).toPandas()
    assert (rr.groupby("query_id")["rank"].count() == 5).all()
    for _, row in rr.iterrows():
        qi = np.where(ids == row.query_id)[0][0]
        ni = np.where(ids == row.nbr_id)[0][0]
        assert abs(row.d2 - micro(V[qi], V[ni]) / 1e6) < 1e-12


def test_pq_training_reduces_quantization_error(spark):
    """Per-subspace Lloyd training must strictly reduce total squared
    reconstruction error vs the untrained smallest-id codebook."""
    from crawl_spark.operators.similarity import (
        default_pq_codebooks,
        pq_encode,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(EMB)
    pdf = emb.toPandas()
    ids = pdf.vec_id.to_numpy()
    V = np.stack(pdf.embedding.map(np.asarray)).astype(np.float64)

    def qerr(cbdf):
        cb = {(r.subspace, r.code): np.array(r.cv) for r in cbdf.collect()}
        cds = {r.vec_id: list(r.codes) for r in pq_encode(emb, cbdf).collect()}
        return sum(
            float(
                (
                    (V[i] - np.concatenate(
                        [cb[(j, cds[ids[i]][j])] for j in range(8)]
                    )) ** 2
                ).sum()
            )
            for i in range(len(ids))
        )

    e_un = qerr(default_pq_codebooks(emb))
    e_tr = qerr(train_pq_codebooks(emb, iters=3))
    assert e_tr < e_un


def test_ivf_pq_full_probe_equals_pq(spark):
    """IVF×PQ composition property: probing EVERY cell makes the
    candidate set the whole corpus, so the ADC ordering must equal
    plain pq_topk row-for-row; pruned probes + exact re-rank emit q_k
    well-formed rows per query with d2 sorted."""
    from crawl_spark.operators.similarity import ivf_pq_topk, pq_topk

    emb = spark.read.parquet(EMB)
    q = emb.filter(F.col("vec_id") < 4)
    ncells = emb.filter(F.col("vec_id") % 41 == 0).count()
    a = ivf_pq_topk(emb, q, q_k=5, nprobe=ncells, rerank_mult=0).toPandas()
    b = pq_topk(emb, q, q_k=5).toPandas()
    key = ["query_id", "rank"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    c = ivf_pq_topk(emb, q, q_k=5, nprobe=3, rerank_mult=4).toPandas()
    assert (c.groupby("query_id")["rank"].count() == 5).all()
    for _, g in c.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g.d2) == sorted(g.d2)


def test_pq_missized_embedding_raises(spark):
    """A corpus row whose embedding length != dim must FAIL LOUDLY in
    the PQ paths (round 5): without the guard, F.slice silently
    shortens the sub-vectors and the argmin yields NULL codes."""
    from crawl_spark.operators.similarity import pq_encode, pq_topk

    emb = spark.read.parquet(EMB)
    bad = emb.select(
        "vec_id",
        F.when(F.col("vec_id") == 7, F.slice("embedding", 1, 10))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    with pytest.raises(Exception, match="pq: size"):
        pq_encode(bad).collect()
    # mis-sized QUERY vectors fail the same way
    with pytest.raises(Exception, match="pq: size"):
        pq_topk(emb, bad.filter(F.col("vec_id") < 8), q_k=3).collect()
    # well-sized rows are untouched by the guard
    ok = pq_encode(bad.filter(F.col("vec_id") != 7))
    assert ok.filter(F.col("codes").isNull()).count() == 0


def test_neardup_hot_cell_salt_split_exact(spark):
    """Hot-cell guard (round 5): a degenerate all-one-cell corpus must
    (a) warn loudly, (b) salt-split into bounded sub-block joins, and
    (c) return EXACTLY the same pair set as the unsalted path."""
    import warnings

    from crawl_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.read.parquet(EMB).filter(F.col("vec_id") < 120)
    # one centroid -> every vector lands in a single cell
    one_cell = spark.createDataFrame(
        [(0, [1.0] * 32)], "centroid_id long, cv array<double>"
    )
    kw = dict(threshold=0.0, centroids=one_cell)
    plain = {
        (r.id_a, r.id_b, r.cos)
        for r in embedding_neardup_pairs(emb, max_cell=10**9, **kw).collect()
    }
    assert plain  # fixture yields pairs at this threshold
    with warnings.catch_warnings(record=True) as seen:
        warnings.simplefilter("always")
        salted = {
            (r.id_a, r.id_b, r.cos)
            for r in embedding_neardup_pairs(emb, max_cell=16, **kw).collect()
        }
    assert any("salt-splitting" in str(w.message) for w in seen)
    assert salted == plain


# -- pluggable tokenizer (round 5) ------------------------------------------


def test_bpe_tokenizer_greedy_longest_match():
    """Driver-side contract: greedy longest piece at each cursor, one
    <unk> per maximal unmatched run, lowercase + whitespace pre-split."""
    from crawl_spark.operators.textops import BpeTokenizer

    tok = BpeTokenizer(["ab", "abc", "c", "de", "e"])
    # "abcde": abc (longest at 0) + de; never ab+c+de
    assert tok.tokenize("Abcde") == ["abc", "de"]
    # unmatched run "xy" collapses to ONE unk; then "c" matches
    assert tok.tokenize("xyc") == ["<unk>", "c"]
    # interior gap: ab, then "zz" unk, then e
    assert tok.tokenize("abzze") == ["ab", "<unk>", "e"]
    assert tok.tokenize("ab cde  abc") == ["ab", "c", "de", "abc"]
    assert tok.tokenize("") == []
    assert tok.tokenize(None) == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        BpeTokenizer([])


def test_token_count_in_tokenizer_space(spark):
    """token_count(tokenizer=...) counts the tokenizer's pieces; the
    Spark pandas-UDF path equals the driver-side tokenize() twin."""
    import pandas as pd

    from crawl_spark.operators.textops import BpeTokenizer, token_count

    tok = BpeTokenizer(["lo", "rem", "ip", "sum", "dol"])
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["Lorem ipsum", "dolor lorem", ""]}
    )
    df = spark.createDataFrame(docs)
    got = {r.doc_id: r for r in token_count(df, tokenizer=tok).collect()}
    for _, row in docs.iterrows():
        pieces = tok.tokenize(row["text"])
        assert got[row["doc_id"]].n_ws_tokens == len(pieces)
        assert got[row["doc_id"]].n_uniq_tokens == len(set(pieces))
    # default path unchanged: whitespace counts
    base = {r.doc_id: r for r in token_count(df).collect()}
    assert base[1].n_ws_tokens == 2 and base[3].n_ws_tokens == 0


def test_pack_sequences_in_tokenizer_space(spark):
    """pack_sequences(tokenizer=...) packs by tokenizer-piece counts —
    n_tokens per doc equals the driver twin, offsets stay a stream-local
    prefix sum, and the default whitespace path is untouched."""
    import pandas as pd

    from crawl_spark.operators.sampling import pack_sequences
    from crawl_spark.operators.textops import BpeTokenizer

    tok = BpeTokenizer(["aa", "a", "bb", "b"])
    docs = pd.DataFrame(
        {
            "doc_id": list(range(12)),
            "text": ["aaa bb a" * (i % 3 + 1) for i in range(12)],
        }
    )
    df = spark.createDataFrame(docs)
    rows = pack_sequences(df, seq_len=8, streams=4, tokenizer=tok).collect()
    exp_n = {
        int(r["doc_id"]): len(tok.tokenize(r["text"]))
        for _, r in docs.iterrows()
    }
    assert {r.doc_id: r.n_tokens for r in rows} == exp_n
    # per-stream: offsets are the prefix sum of n_tokens in (md5, id) order
    by_stream = {}
    for r in sorted(rows, key=lambda r: (r.stream, r.start_offset)):
        nxt = by_stream.get(r.stream, 0)
        assert r.start_offset == nxt
        assert r.bin == r.start_offset // 8
        by_stream[r.stream] = nxt + r.n_tokens


def test_decontaminate_in_tokenizer_space(spark):
    """decontaminate(tokenizer=...) applies the SAME tokenizer to both
    sides: an eval doc overlapping only in token space (not in
    whitespace space) flags the training doc."""
    import pandas as pd

    from crawl_spark.operators.dedup import decontaminate
    from crawl_spark.operators.textops import BpeTokenizer

    tok = BpeTokenizer(["foo", "bar", "baz", "qux"])
    # whitespace views differ ("foobarbaz qux" vs "foo barbaz qux"),
    # token views agree: [foo bar baz qux]
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["foobarbaz qux", "qux qux qux far"]})
    )
    ev = spark.createDataFrame(pd.DataFrame({"text": ["foo barbaz qux"]}))
    got = {r.doc_id: r for r in decontaminate(train, ev, n=4, tokenizer=tok).collect()}
    assert got[1].n_hit_grams == 1 and not got[1].keep
    assert got[2].n_hit_grams == 0 and got[2].keep
    # default whitespace space: no 4-gram overlap → both pass
    base = {r.doc_id: r for r in decontaminate(train, ev, n=4).collect()}
    assert base[1].keep and base[2].keep


def test_c4_clean_line_and_page_rules(spark):
    """Every C4 rule exercised by hand-built docs; the cleaned-text md5
    is checked byte-level against hand-assembled survivors."""
    from crawl_spark.operators.textops import c4_clean

    good = "the data rows join cleanly and fast."
    five_good = "\n".join([good] * 5)
    rows = [
        # 1: five good lines -> keep
        (1, five_good),
        # 2: line rules — no terminal punct / <3 words / javascript line
        #    each dropped; five good lines survive -> keep
        (2, five_good + "\nno terminal punct here\ntiny one.\n"
            + "please enable JavaScript to continue now."),
        # 3: page gate — lorem ipsum (case-insensitive) -> drop
        (3, five_good + "\nLorem Ipsum dolor sit amet today."),
        # 4: page gate — curly bracket anywhere -> drop
        (4, five_good + "\ncode { block starts here."),
        # 5: page gate — blocklist word as whole token -> drop
        (5, five_good + "\nthis page contains badword1 sadly."),
        # 6: blocklist word only as a SUBSTRING -> not a token hit -> keep
        (6, five_good + "\nthis page contains badword1x safely today."),
        # 7: only 4 sentences survive -> drop (min_sentences=5)
        (7, "\n".join([good] * 4)),
        # 8: multi-sentence line counts each [.!?]; end-quote keeps the line
        (8, 'good start. really good. yes!\nhe said "stop right there."\n'
            + "trailing spaces still end well.   "),
        # 9: empty text
        (9, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in c4_clean(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["keep"] and out[1]["n_kept"] == 5 and out[1]["n_sentences"] == 5
    assert out[1]["clean_md5"] == hashlib.md5(five_good.encode()).hexdigest()
    assert out[2]["n_lines"] == 8 and out[2]["n_kept"] == 5
    assert out[2]["keep"] is True
    assert out[2]["clean_md5"] == hashlib.md5(five_good.encode()).hexdigest()
    for bad in (3, 4, 5):
        assert out[bad]["keep"] is False, bad
        assert out[bad]["n_kept"] == 6  # the gate is page-level, lines survive
    assert out[6]["keep"] is True and out[6]["n_kept"] == 6
    assert out[7]["keep"] is False and out[7]["n_sentences"] == 4
    # doc 8: line1 has 3 sentences, line2 ends in end-quote (kept, +1),
    # line3 rtrims to terminal '.' (kept, +1) -> 5 sentences, keep
    assert out[8]["n_kept"] == 3 and out[8]["n_sentences"] == 5
    assert out[8]["keep"] is True
    expected8 = ('good start. really good. yes!\nhe said "stop right there."\n'
                 + "trailing spaces still end well.   ")
    assert out[8]["clean_md5"] == hashlib.md5(expected8.encode()).hexdigest()
    assert out[8]["clean_len"] == len(expected8)
    assert out[9]["n_lines"] == 1 and out[9]["n_kept"] == 0
    assert out[9]["keep"] is False
    assert out[9]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_fix_encoding_repairs_mojibake(spark):
    """Hand-built mojibake pairs + the no-corruption guarantees, checked
    through BOTH the Spark UDF and its driver twin (must agree)."""
    import pandas as pd

    from crawl_spark.operators.textops import fix_encoding, fix_encoding_str

    cafe = "café déjà vu"
    mojibake = cafe.encode("utf-8").decode("latin-1")  # "cafÃ© dÃ©jÃ  vu"
    double = mojibake.encode("utf-8").decode("latin-1")  # double-encoded
    cases = {
        1: (mojibake, cafe),
        2: (double, cafe),  # two passes unwind double mojibake
        3: ("plain ascii stays put", "plain ascii stays put"),
        4: ("漢字 outside latin-1", "漢字 outside latin-1"),
        5: ("café", "café"),  # real accents: latin-1 bytes not valid utf-8
        6: ("", ""),
        7: (None, None),
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(cases), "text": [v[0] for v in cases.values()]}
        ).astype({"doc_id": "int64"})
    )
    got = {
        r["doc_id"]: r["fixed"]
        for r in df.select("doc_id", fix_encoding(F.col("text")).alias("fixed")).collect()
    }
    for k, (raw, want) in cases.items():
        assert got[k] == want, (k, got[k], want)
        assert fix_encoding_str(raw) == want, k  # driver twin agrees


def test_fix_encoding_roundtrip_property():
    """Property: for any fixed-point string with non-ASCII content,
    repairing its mojibake form recovers it exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawl_spark.operators.textops import fix_encoding_str

    safe = st.text(
        alphabet="abc éàüñßøç日", min_size=1, max_size=40
    ).filter(
        lambda s: any(ord(c) > 127 for c in s) and fix_encoding_str(s) == s
    )

    @given(safe)
    @settings(max_examples=200, deadline=None)
    def _prop(s):
        m = s.encode("utf-8").decode("latin-1")
        assert fix_encoding_str(m) == s

    _prop()


def py_span_dedup(docs, n=3, sep=". "):
    """From-first-principles model of the C4 duplicated-span rule."""
    from collections import defaultdict

    sents = {i: s.split(sep) for i, s in docs.items()}
    spans = []
    for i in sorted(sents):
        ss = sents[i]
        for p in range(max(len(ss) - n + 1, 0)):
            spans.append((i, p, sep.join(ss[p : p + n])))
    first, count = {}, defaultdict(int)
    for i, p, k in sorted(spans):
        count[k] += 1
        if k not in first:
            first[k] = (i, p)
    marked = defaultdict(set)
    ndup = defaultdict(int)
    for i, p, k in spans:
        if count[k] >= 2 and first[k] != (i, p):
            marked[i].update(range(p, p + n))
            ndup[i] += 1
    out = {}
    for i, ss in sents.items():
        kept = [s for j, s in enumerate(ss) if j not in marked[i]]
        out[i] = (len(ss), len(kept), ndup[i], sep.join(kept))
    return out


def test_span_dedup_matches_python_model(spark):
    """C4 duplicated-3-sentence-span removal: global first occurrence
    keeps, every other occurrence loses its sentences; reassembly is
    byte-exact (md5-pinned), and untouched docs round-trip."""
    from crawl_spark.operators.dedup import span_dedup

    docs = {
        1: "a1 one. b1 two. X spanline. Y spanline. Z spanline. c1 tail.",
        2: "a2 one. X spanline. Y spanline. Z spanline. c2 tail.",
        3: "X spanline. Y spanline. Z spanline. tail3 here.",
        4: "R rep. S rep. T rep. R rep. S rep. T rep. end4 done.",
        5: "only two. here",
    }
    want = py_span_dedup(docs)
    out = {
        r["doc_id"]: r
        for r in span_dedup(
            spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        ).collect()
    }
    assert set(out) == set(docs)
    for i in docs:
        ns, nk, nd, clean = want[i]
        assert out[i]["n_sentences"] == ns, i
        assert out[i]["n_kept"] == nk, i
        assert out[i]["n_dup_spans"] == nd, i
        assert out[i]["clean_md5"] == hashlib.md5(clean.encode()).hexdigest(), i
        assert out[i]["clean_len"] == len(clean), i
    # ownership: doc 1 holds the global first (doc, pos) of the shared
    # span -> keeps everything; docs 2 and 3 lose exactly 3 sentences
    assert out[1]["n_kept"] == 6 and out[1]["n_dup_spans"] == 0
    assert out[2]["n_kept"] == 2 and out[3]["n_kept"] == 1
    # doc 4: internal repetition — second (R,S,T) occurrence removed
    assert out[4]["n_kept"] == 4 and out[4]["n_dup_spans"] == 1
    # doc 5: < n sentences -> untouched, byte-identical round-trip
    assert out[5]["clean_md5"] == hashlib.md5(docs[5].encode()).hexdigest()


def test_strip_tracking_params_rules(spark):
    """Key-boundary, case-insensitive, order-preserving removal; values
    never matched; empty pairs drop; bare '?' drops when emptied."""
    from crawl_spark.operators.urlfilter import strip_tracking_params

    rows = [
        (1, "https://a.example/p"),                                # no query
        (2, "https://a.example/p?utm_source=x&utm_medium=y"),      # all stripped
        (3, "https://a.example/p?q=1&fbclid=abc"),                 # mixed
        (4, "https://a.example/p?a=1&b=2"),                        # untouched
        (5, "https://a.example/p?UTM_Source=x&q=2"),               # case-insensitive key
        (6, "https://a.example/p?q=utm_source"),                   # value, not key
        (7, "https://a.example/p?a=1&&gclid=z"),                   # empty pair drops
        (8, "https://a.example/p?gclid"),                          # key-only pair
        (9, "https://a.example/p?q=a?b&msclkid=m"),                # '?' in a value
    ]
    out = {
        r["doc_id"]: r
        for r in strip_tracking_params(
            spark.createDataFrame(rows, "doc_id long, url string")
        ).collect()
    }
    want = {
        1: ("https://a.example/p", 0),
        2: ("https://a.example/p", 2),
        3: ("https://a.example/p?q=1", 1),
        4: ("https://a.example/p?a=1&b=2", 0),
        5: ("https://a.example/p?q=2", 1),
        6: ("https://a.example/p?q=utm_source", 0),
        7: ("https://a.example/p?a=1", 1),
        8: ("https://a.example/p", 1),
        9: ("https://a.example/p?q=a?b", 1),
    }
    for k, (w_url, w_n) in want.items():
        assert out[k]["url_stripped"] == w_url, (k, out[k]["url_stripped"])
        assert out[k]["n_stripped"] == w_n, k


def test_span_dedup_random_corpus_matches_model(spark):
    """Seeded random corpus built from a SMALL sentence pool (forcing
    heavy cross-doc and within-doc span collisions, overlapping dup
    spans, and <n docs) — every output field must match the
    from-first-principles model."""
    import random

    from crawl_spark.operators.dedup import span_dedup

    rng = random.Random(42)
    pool = [f"s{k} word{k}" for k in range(7)]  # 7 sentences -> collisions
    docs = {
        i: ". ".join(rng.choice(pool) for _ in range(rng.randint(1, 12)))
        for i in range(200)
    }
    want = py_span_dedup(docs)
    out = {
        r["doc_id"]: r
        for r in span_dedup(
            spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        ).collect()
    }
    assert set(out) == set(docs)
    for i in docs:
        ns, nk, nd, clean = want[i]
        got = out[i]
        assert (
            got["n_sentences"], got["n_kept"], got["n_dup_spans"],
            got["clean_md5"], got["clean_len"],
        ) == (ns, nk, nd, hashlib.md5(clean.encode()).hexdigest(), len(clean)), i


_BOILER_HTML = """
<html><head><title>t</title><style>p .x {{ color: red }}</style></head><body>
<nav><ul><li><a href=/a>Home</a></li><li><a href=/b>About page link</a></li></ul></nav>
<div class=content>
  <h1>The quick brown fox story headline number {i}</h1>
  <p>The quick brown fox jumps over the lazy dog near river bank {i}.</p>
  <p>It then <b>cont</b>inues along the path to the old mill {i}.</p>
  <p>Read <a href=/more>more</a> about the fox in our wildlife archive {i}.</p>
  <p>short.</p>
  <p><a href=/x>link</a> <a href=/y>soup</a> <a href=/z>menu of links only</a></p>
</div>
<footer><p>Copyright 2026 Example Corp all rights reserved forever</p></footer>
<script>var x = 1;</script>
</body></html>"""


def test_main_content_rules():
    """Driver twin: prune set, leaf blocks, min-words, link density,
    inline tags not splitting words — all on one crafted page."""
    from crawl_spark.operators.boilerplate import main_content_str

    text, n_blocks, n_kept = main_content_str(_BOILER_HTML.format(i=7))
    assert (n_blocks, n_kept) == (6, 4)
    assert "continues along" in text          # <b> does not split the word
    assert "Home" not in text                 # nav pruned
    assert "Copyright" not in text            # footer pruned
    assert "var x" not in text                # script pruned
    assert "color: red" not in text           # style pruned
    assert "short." not in text               # min_words
    assert "menu of links only" not in text   # link density
    assert text.startswith("The quick brown fox story headline number 7\n")
    # degenerate inputs
    assert main_content_str(None) == ("", 0, 0)
    assert main_content_str("") == ("", 0, 0)
    assert main_content_str("plain text, no tags at all") == ("", 0, 0)


def test_extract_main_content_spark_matches_twin(spark):
    """The mapInPandas operator must agree with the driver twin on
    every page, md5 and counts both."""
    import pandas as pd

    from crawl_spark.operators.boilerplate import (
        extract_main_content,
        main_content_str,
    )

    pages = {i: _BOILER_HTML.format(i=i) for i in range(20)}
    pages[20] = ""                       # degenerate rows ride along
    pages[21] = "<p>tiny.</p>"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(pages), "html": list(pages.values())})
        .astype({"doc_id": "int64"})
    )
    out = {r["doc_id"]: r for r in extract_main_content(df).collect()}
    assert set(out) == set(pages)
    for i, h in pages.items():
        text, nb, nk = main_content_str(h)
        assert out[i]["n_blocks"] == nb, i
        assert out[i]["n_kept"] == nk, i
        assert out[i]["main_len"] == len(text), i
        assert out[i]["main_md5"] == hashlib.md5(text.encode()).hexdigest(), i
    assert out[0]["boilerplate_ratio"] > 0.0
    assert out[21]["n_blocks"] == 1 and out[21]["n_kept"] == 0


def test_gopher_quality_matches_python_model(spark):
    """Every Gopher A1.1 quality rule fires on its own crafted doc and
    every metric matches a from-first-principles model."""
    import re

    from crawl_spark.operators.textops import gopher_quality

    good = ("the data value of a fast report and that we have with it "
            "to be or not " * 5).strip()                       # 70 stopwordy words
    docs = {
        1: good,                                               # keep
        2: "short doc only five words here",                   # n_words drop
        3: " ".join(["supercalifragilistic"] * 60),            # mean len drop
        4: good + " " + "# " * 20,                             # symbol drop
        5: good + "\n" + "\n".join(["• item"] * 60),           # bullet drop
        6: good + "\n" + "\n".join(["and so on..."] * 40),     # ellipsis drop
        7: good + " " + " ".join(["12345"] * 60),              # alpha drop
        8: " ".join(["zork"] * 60),                            # stopword drop
        9: "",                                                 # empty
    }

    def model(text):
        w = [x for x in text.lower().split() if x]
        lines = [l for l in text.split("\n") if l.strip() != ""]
        n, nl = len(w), len(lines)
        mean = round(sum(len(x) for x in w) / n, 6) if n else 0.0
        sym = round(sum(text.count(c) for c in "#…") / n, 6) if n else 0.0
        bullet = round(
            sum(1 for l in lines if re.match(r"^[•\-*]", re.sub(r"^\s+", "", l)))
            / nl, 6,
        ) if nl else 0.0
        ell = round(
            sum(1 for l in lines
                if re.search(r"(…|\.\.\.)$", re.sub(r"\s+$", "", l))) / nl, 6,
        ) if nl else 0.0
        alpha = round(sum(1 for x in w if re.search("[a-z]", x)) / n, 6) if n else 0.0
        stops = len(set(w) & {"the", "be", "to", "of", "and", "that", "have", "with"})
        keep = (50 <= n <= 100_000 and 3.0 <= mean <= 10.0 and sym <= 0.10
                and bullet <= 0.90 and ell <= 0.30 and alpha >= 0.80 and stops >= 2)
        return n, mean, sym, bullet, ell, alpha, stops, keep

    out = {
        r["doc_id"]: r
        for r in gopher_quality(
            spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        ).collect()
    }
    for i, text in docs.items():
        n, mean, sym, bullet, ell, alpha, stops, keep = model(text)
        got = out[i]
        assert (
            got["n_words"], got["mean_word_len"], got["symbol_ratio"],
            got["bullet_frac"], got["ellipsis_frac"], got["alpha_frac"],
            got["stopword_hits"], got["keep"],
        ) == (n, mean, sym, bullet, ell, alpha, stops, keep), (i, dict(got.asDict()))
    assert out[1]["keep"] is True
    for bad in (2, 3, 4, 5, 6, 7, 8, 9):
        assert out[bad]["keep"] is False, bad


def test_c4_clean_random_corpus_matches_twin(spark):
    """Seeded random pages assembled from a line pool that exercises
    every C4 line/page rule boundary (trailing spaces, end-quotes,
    exactly-3-word lines, javascript casing, badword-as-substring) —
    all output fields must match a from-first-principles twin."""
    import random

    from crawl_spark.operators.textops import c4_clean

    from .twins import py_c4

    pool = [
        "the quick brown fox runs far today.",
        "a tidy sentence ends here!",
        'he said "stop right there."',
        "ends with spaces still counts.   ",
        "three word line.",          # exactly 3 words
        "two words.",                # below the floor
        "no terminal punctuation on this line",
        "please enable JavaScript to continue now.",
        "jAvAsCrIpT mixed case mention here.",
        "lorem ipsum dolor sit amet today.",
        "a curly { bracket appears here.",
        "a closing } brace appears here.",
        "\tcarriage return residue line.\r",
        "contains badword1 as a token sadly.",
        "contains badword1x only as substring safely.",
        "multi. sentence! line? packed full.",
        "",                          # blank line
    ]
    rng = random.Random(7)
    docs = {
        i: "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 10)))
        for i in range(150)
    }
    out = {
        r["doc_id"]: r
        for r in c4_clean(
            spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        ).collect()
    }
    assert set(out) == set(docs)
    kept_any = drop_any = False
    for i, text in docs.items():
        nl, nk, ns, keep, clean = py_c4(text)
        got = out[i]
        assert (
            got["n_lines"], got["n_kept"], got["n_sentences"], got["keep"],
            got["clean_md5"], got["clean_len"],
        ) == (nl, nk, ns, keep, hashlib.md5(clean.encode()).hexdigest(), len(clean)), i
        kept_any |= keep
        drop_any |= not keep
    assert kept_any and drop_any  # the corpus exercised both verdicts


def test_trap_detect_signals(spark):
    from crawl_spark.operators.urlfilter import trap_detect

    rows = []
    # host A: calendar/session trap — 60 urls, ONE path, query explosion
    rows += [f"https://a.example/cal?day={i}" for i in range(60)]
    # host B: healthy — 60 urls, 60 distinct shallow paths, no query
    rows += [f"https://b.example/p{i}" for i in range(60)]
    # host C: depth trap — 50 urls at depth 10, distinct paths
    rows += [
        "https://c.example/" + "/".join(f"d{j}" for j in range(9)) + f"/x{i}"
        for i in range(50)
    ]
    # host D: below min_urls — same shape as A but only 5 urls
    rows += [f"https://d.example/cal?day={i}" for i in range(5)]
    # host E: root-level session explosion — PATH-LESS query URLs
    rows += [f"https://e.example?sid={i}" for i in range(60)]
    # host F: fragments — same path, '?' inside the fragment is no query
    rows += ["https://f.example/p#a", "https://f.example/p#b?x"]
    df = spark.createDataFrame([(u,) for u in rows], "url string")
    got = {
        r.host: r
        for r in trap_detect(df, min_urls=50, path_dup_frac=0.5,
                             mean_depth_max=8.0).collect()
    }
    a = got["a.example"]
    assert (a.n_urls, a.n_paths, a.max_per_path) == (60, 1, 60)
    assert a.query_frac == 1.0 and a.mean_depth == 1.0 and a.is_trap
    b = got["b.example"]
    assert (b.n_urls, b.n_paths, b.max_per_path) == (60, 60, 1)
    assert b.query_frac == 0.0 and not b.is_trap
    c = got["c.example"]
    assert c.mean_depth == 10.0 and c.is_trap and c.max_per_path == 1
    d = got["d.example"]
    assert d.max_per_path == 5 and not d.is_trap  # below min_urls
    e = got["e.example"]
    assert (e.n_urls, e.n_paths, e.max_per_path) == (60, 1, 60)
    assert e.query_frac == 1.0 and e.mean_depth == 0.0 and e.is_trap
    f = got["f.example"]
    assert (f.n_paths, f.query_frac) == (1, 0.0)  # fragment '?' ≠ query


def test_domain_reputation_signals(spark):
    from crawl_spark.operators.sampling import domain_reputation

    rows = []
    # X: dup farm — 10 copies of one page (identical after ws/case norm)
    rows += [(100 + i, "X", "Buy CHEAP   widgets now here today") for i in range(10)]
    # Y: healthy — 10 unique long-enough docs
    rows += [(200 + i, "Y", f"unique article number {i} " + "w " * 12) for i in range(10)]
    # Z: stub farm — 10 distinct but tiny docs
    rows += [(300 + i, "Z", f"stub {i}") for i in range(10)]
    # W: small domain — 2 identical docs, below min_docs
    rows += [(400 + i, "W", "tiny twin page") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.source: r
        for r in domain_reputation(
            df, min_docs=5, dup_ratio_max=0.5, short_frac_max=0.5,
            short_tokens=10,
        ).collect()
    }
    x = got["X"]
    assert (x.n_docs, x.max_copies) == (10, 10)
    assert x.dup_ratio == 0.9 and not x.keep
    y = got["Y"]
    assert y.dup_ratio == 0.0 and y.short_frac == 0.0 and y.keep
    assert y.mean_tokens == 16.0  # "unique article number {i}" + 12 w's
    z = got["Z"]
    assert z.short_frac == 1.0 and not z.keep
    w = got["W"]
    assert w.dup_ratio == 0.5 and w.keep  # below min_docs: no verdict


def _py_ccnet_normalize(s: str) -> str:
    import unicodedata

    out = []
    for ch in s.lower():
        cat = unicodedata.category(ch)
        if cat == "Nd":
            out.append("0")
        elif cat.startswith("P"):
            continue
        else:
            out.append(ch)
    # Java \s+ is ASCII [ \t\n\x0B\f\r]
    import re

    return re.sub(r"[ \t\n\x0b\f\r]+", " ", "".join(out)).strip()


def test_ccnet_normalize_matches_python_twin(spark):
    from crawl_spark.operators.dedup import ccnet_normalize

    samples = [
        "Posted on 2024-01-02, by ADMIN!",
        "posted   on 2025-11-30 by admin",
        "Price: $1,234.99 (was €2.000,00)",
        "arabic ٣٤ digits; devanagari २ too",
        "quotes “hello” — dash … ellipsis 。",
        "tabs\tand\nnewlines\r\nhere",
        "vertical\x0btab\x0bseam",  # Java \s has \x0B, RE2's does not
        "",
        "   only   spaces   ",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "i long, text string")
    got = {
        r.i: r.norm
        for r in df.select("i", ccnet_normalize(F.col("text")).alias("norm")).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == _py_ccnet_normalize(s), (i, s, got[i])


def test_ccnet_dedup_collapses_date_variants(spark):
    from crawl_spark.operators.dedup import ccnet_dedup, exact_dedup

    rows = [
        (1, "Posted on 2024-01-02: hello world!"),
        (2, "posted on 2025-11-30 hello world"),
        (3, "a different page entirely"),
        (4, "A different page, entirely..."),
        (5, "unique survivor"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_copies for r in ccnet_dedup(df).collect()}
    assert got == {1: 2, 3: 2, 5: 1}
    # plain exact_dedup keeps all 5 — the normalization is what collapses
    assert exact_dedup(df).count() == 5


def test_incremental_dedup_reasons(spark):
    from crawl_spark.operators.dedup import exact_dedup, incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "already in the corpus"), (2, "an old page")],
        "doc_id long, text string",
    )
    corpus_digests = exact_dedup(corpus).select("content_md5")
    batch = spark.createDataFrame(
        [
            (10, "already in   the CORPUS"),  # corpus dup (normalized)
            (11, "fresh page one"),
            (12, "fresh page two"),
            (13, "fresh page two"),  # batch dup of 12
            (14, "fresh page two"),  # another batch dup
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in incremental_dedup(batch, corpus_digests).collect()}
    assert len(got) == 5
    assert not got[10].keep and got[10].reason == "corpus_dup"
    assert got[11].keep and got[11].reason is None
    assert got[12].keep and got[12].reason is None
    assert not got[13].keep and got[13].reason == "batch_dup"
    assert not got[14].keep and got[14].reason == "batch_dup"


def test_leak_safe_split_cluster_consistent(spark):
    import hashlib

    from crawl_spark.operators.dedup import neardup_clusters
    from crawl_spark.operators.sampling import leak_safe_split

    # 3 near-dup pairs + singletons, via the real clustering path
    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again "
    for i in range(20):
        rows.append((2 * i, base + f"tail {i}"))
        rows.append((2 * i + 1, base + f"tail {i} extra"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clusters = neardup_clusters(df, threshold=0.1)
    got = leak_safe_split(clusters, valid_rate=0.25).collect()
    by_cluster: dict[int, set] = {}
    for r in got:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
        exp = (
            "valid"
            if hashlib.md5(str(r.cluster_id).encode()).hexdigest()[:4]
            < "%04x" % int(0.25 * (1 << 16))
            else "train"
        )
        assert r.split == exp
    assert all(len(s) == 1 for s in by_cluster.values())  # no straddle
    assert len(got) == 40


def test_suggest_lsh_bands_s_curve_optimum():
    import pytest

    from crawl_spark.operators.dedup import LSH_BANDS, MINHASH_K, suggest_lsh_bands

    # the repo's own default banding is the 0.5-threshold optimum
    assert suggest_lsh_bands(MINHASH_K, 0.5) == (LSH_BANDS, MINHASH_K // LSH_BANDS)
    # r is monotone in threshold: stricter thresholds -> longer bands
    rows = [suggest_lsh_bands(128, t)[1] for t in (0.1, 0.3, 0.5, 0.8, 0.95)]
    assert rows == sorted(rows) and rows[0] < rows[-1]
    # exact-divisor contract: lsh_bands(bands=b) reproduces r
    for t in (0.2, 0.5, 0.9):
        b, r = suggest_lsh_bands(12, t)
        assert b * r == 12
    # FP bias shifts toward longer rows (higher precision)
    assert suggest_lsh_bands(128, 0.5, fp_weight=0.9)[1] > suggest_lsh_bands(
        128, 0.5, fp_weight=0.1
    )[1]
    with pytest.raises(ValueError):
        suggest_lsh_bands(12, 0.0)
    with pytest.raises(ValueError):
        suggest_lsh_bands(0, 0.5)


def test_trap_hosts_feed_blocklist_filter(spark):
    """The documented frontier-hygiene loop: trap_detect verdicts gate
    future URLs through url_blocklist_filter (trap host AND its
    subdomains dropped; healthy hosts untouched)."""
    from pyspark.sql import functions as F

    from crawl_spark.operators.urlfilter import trap_detect, url_blocklist_filter

    urls = [f"https://trap.example/cal?day={i}" for i in range(40)]
    urls += [f"https://ok.example/p{i}" for i in range(40)]
    seen = spark.createDataFrame([(u,) for u in urls], "url string")
    verdicts = trap_detect(seen, min_urls=30, path_dup_frac=0.5)
    blocked = verdicts.filter(F.col("is_trap")).select("host")

    incoming = spark.createDataFrame(
        [
            (1, "https://trap.example/cal?day=99"),
            (2, "https://sub.trap.example/other"),
            (3, "https://ok.example/p99"),
            (4, "https://new.example/x"),
        ],
        "doc_id long, url string",
    )
    kept = url_blocklist_filter(incoming, blocked)
    assert sorted(r.doc_id for r in kept.collect()) == [3, 4]


def test_lsh_bands_derives_k_and_rejects_nondivisor(spark):
    import pytest

    from crawl_spark.operators.dedup import lsh_bands, minhash_signature

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id long, text string"
    )
    sig = minhash_signature(df, k=6)  # non-default width
    out = lsh_bands(sig, bands=3)
    assert out.select("band").distinct().count() == 3
    assert out.count() == 6  # 2 docs × 3 bands
    with pytest.raises(ValueError):
        lsh_bands(sig, bands=4)  # 4 does not divide 6
    with pytest.raises(ValueError):
        lsh_bands(sig, bands=7)  # bands > k would hash an empty slice


def test_mirror_hosts_pairs(spark):
    from crawl_spark.operators.dedup import mirror_hosts

    rows = []
    for i in range(8):
        rows += [("m1", f"page {i} mirrored content"),
                 ("m2", f"page {i} mirrored content")]
    rows += [("m2", "extra a only on m2"), ("m2", "extra b only on m2")]
    rows += [("u1", f"unique u1 {i}") for i in range(5)]
    rows += [("u2", f"unique u2 {i}") for i in range(3)]
    rows += [("u1", "shared once page"), ("u2", "shared once page")]
    # boilerplate on ALL 4 hosts: above the cap, must not create pairs
    rows += [(h, "footer boilerplate") for h in ("m1", "m2", "u1", "u2")]
    rows += [("m1", "page 0 mirrored content")]  # dup row: distinct folds it
    df = spark.createDataFrame(rows, "host string, text string")
    got = {
        (r.host_a, r.host_b): r
        for r in mirror_hosts(df, min_jaccard=0.5,
                              max_hosts_per_digest=3).collect()
    }
    assert set(got) == {("m1", "m2"), ("u1", "u2")}
    m = got[("m1", "m2")]
    assert (m.n_shared, m.n_a, m.n_b) == (8, 8, 10)
    assert m.jaccard == 0.8 and m.is_mirror
    u = got[("u1", "u2")]
    assert (u.n_shared, u.n_a, u.n_b) == (1, 6, 4)
    assert u.jaccard == round(1 / 9, 6) and not u.is_mirror


def _java_ws_tokens(s: str) -> list[str]:
    # tokens()'s contract: lowercase, split on Java \s = [ \t\n\x0B\f\r]
    import re

    return [t for t in re.split(r"[ \t\n\x0b\f\r]+", s.lower()) if t]


def test_trap_detect_random_corpus_matches_twin(spark):
    """Seeded random URL corpus over every parse boundary (path-less
    queries, fragments, '?' inside fragments, userinfo, root-dot hosts,
    uppercase schemes, unparsable junk) — every output field must match
    a from-first-principles python twin."""
    import random
    import re

    from crawl_spark.operators.urlfilter import trap_detect

    rng = random.Random(41)
    hosts = ["a.example", "B.Example", "deep.example", "q.example."]
    urls = []
    for _ in range(400):
        h = rng.choice(hosts)
        scheme = rng.choice(["https", "HTTP", "ftp"])
        user = rng.choice(["", "u:p@"])
        kind = rng.randrange(6)
        if kind == 0:
            path = "/cal"
            tail = f"?day={rng.randrange(50)}"
        elif kind == 1:
            path = "/" + "/".join(f"d{rng.randrange(3)}" for _ in range(rng.randrange(1, 12)))
            tail = ""
        elif kind == 2:
            path = ""
            tail = f"?sid={rng.randrange(30)}"
        elif kind == 3:
            path = f"/p{rng.randrange(20)}"
            tail = "#frag" + rng.choice(["", "?notaquery"])
        elif kind == 4:
            path = f"/x/y{rng.randrange(5)}"
            tail = rng.choice(["?a=1#f", "#f?a=1", "?", "#"])
        else:
            path = f"/p{rng.randrange(20)}"
            tail = ""
        urls.append(f"{scheme}://{user}{h}{path}{tail}")
    urls += ["not a url at all", "mailto:x@y.example"]
    # a dedicated calendar-trap host so both verdicts appear
    urls += [f"https://trap.example/cal?day={i}" for i in range(40)]

    # twin: the documented semantics from first principles
    agg: dict[str, dict] = {}
    for u in urls:
        lu = u.lower()
        m = re.match(r"^[a-z][a-z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]+)", lu)
        host = re.sub(r"\.$", "", m.group(1)) if m else ""
        path_q = re.sub(r"^[a-z][a-z0-9+.\-]*://[^/?#]*", "", lu, count=1)
        path_query = path_q.split("#", 1)[0]
        path = path_query.split("?", 1)[0]
        a = agg.setdefault(host, {"n": 0, "paths": {}, "nq": 0, "sd": 0})
        a["n"] += 1
        a["paths"][path] = a["paths"].get(path, 0) + 1
        a["nq"] += 1 if "?" in path_query else 0
        a["sd"] += len([s for s in path.split("/") if s])

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.host: r for r in trap_detect(df, min_urls=30).collect()}
    assert set(got) == set(agg)
    for host, a in agg.items():
        r = got[host]
        assert (r.n_urls, r.n_paths, r.max_per_path) == (
            a["n"], len(a["paths"]), max(a["paths"].values())
        ), host
        assert abs(r.query_frac - a["nq"] / a["n"]) < 5.1e-7, host  # 6dp round
        assert abs(r.mean_depth - a["sd"] / a["n"]) < 5.1e-7, host
        exp_trap = a["n"] >= 30 and (
            max(a["paths"].values()) / a["n"] >= 0.5 or a["sd"] / a["n"] >= 8.0
        )
        assert r.is_trap == exp_trap, host
    assert any(r.is_trap for r in got.values())
    assert any(not r.is_trap for r in got.values())


def test_mirror_hosts_random_corpus_matches_twin(spark):
    """Seeded random (host, text) corpus — pair set, counts, Jaccards
    and verdicts must match a from-first-principles set-arithmetic twin
    (including which digests the hot cap removes)."""
    import random
    from itertools import combinations

    from crawl_spark.operators.dedup import mirror_hosts

    rng = random.Random(17)
    pool = [f"page {i} body words here" for i in range(30)]
    pool += ["Shared   BOILERPLATE\tfooter"]  # ws/case-normalized dup
    hosts = [f"h{i}" for i in range(6)]
    rows = []
    for h in hosts:
        for _ in range(rng.randrange(8, 25)):
            rows.append((h, rng.choice(pool)))

    cap, thr = 3, 0.3
    sets: dict[str, set] = {h: set() for h in hosts}
    for h, t in rows:
        sets[h].add(" ".join(_java_ws_tokens(t)))
    from collections import Counter

    nh = Counter(d for h in hosts for d in sets[h])
    cold = {h: {d for d in sets[h] if nh[d] <= cap} for h in hosts}
    exp = {}
    for a, b in combinations(sorted(hosts), 2):
        shared = len(cold[a] & cold[b])
        if shared:
            jac = shared / (len(cold[a]) + len(cold[b]) - shared)
            exp[(a, b)] = (shared, len(cold[a]), len(cold[b]), jac, jac >= thr)

    df = spark.createDataFrame(rows, "host string, text string")
    got = {
        (r.host_a, r.host_b): r
        for r in mirror_hosts(df, min_jaccard=thr, max_hosts_per_digest=cap).collect()
    }
    assert set(got) == set(exp)
    for k, (shared, na, nb, jac, mir) in exp.items():
        r = got[k]
        assert (r.n_shared, r.n_a, r.n_b) == (shared, na, nb), k
        assert abs(r.jaccard - jac) < 5.1e-7 and r.is_mirror == mir, k


def test_domain_reputation_random_corpus_matches_twin(spark):
    """Seeded random (doc, source, text) corpus — all six output fields
    must match a from-first-principles twin (dup mass via normalized
    text identity, short fraction via the Java-\\s token count)."""
    import random

    from crawl_spark.operators.sampling import domain_reputation

    rng = random.Random(23)
    pool = (
        [f"unique article {i} alpha beta gamma delta epsilon zeta eta theta" for i in range(40)]
        + ["dup  PROMO page\tbuy now cheap fast deal widgets here today"] * 6
        + ["tiny stub", "another stub"] * 3
    )
    rows = [
        (i, f"dom{rng.randrange(5)}", rng.choice(pool)) for i in range(300)
    ]
    agg: dict[str, dict] = {}
    for _i, g, t in rows:
        toks = _java_ws_tokens(t)
        a = agg.setdefault(g, {"n": 0, "dig": {}, "ns": 0, "st": 0})
        a["n"] += 1
        d = " ".join(toks)
        a["dig"][d] = a["dig"].get(d, 0) + 1
        a["ns"] += 1 if len(toks) < 10 else 0
        a["st"] += len(toks)

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.source: r
        for r in domain_reputation(
            df, min_docs=5, dup_ratio_max=0.4, short_frac_max=0.3, short_tokens=10
        ).collect()
    }
    assert set(got) == set(agg)
    for g, a in agg.items():
        r = got[g]
        dup = 1 - len(a["dig"]) / a["n"]
        short = a["ns"] / a["n"]
        assert r.n_docs == a["n"] and r.max_copies == max(a["dig"].values()), g
        assert abs(r.dup_ratio - dup) < 5.1e-7, g
        assert abs(r.short_frac - short) < 5.1e-7, g
        assert abs(r.mean_tokens - a["st"] / a["n"]) < 5.1e-7, g
        exp_keep = not (a["n"] >= 5 and (dup >= 0.4 or short >= 0.3))
        assert r.keep == exp_keep, g


def test_corpus_datasheet_hand_computed(spark):
    from crawl_spark.operators.stats import corpus_datasheet

    rows = [
        (1, "en", "web", "a b c"),
        (2, "en", "web", "A  B   c"),  # same normalized content as doc 1
        (3, "en", "web", "a b c d e f g h i j k l"),
        (4, "en", "web", "x"),
        (5, "fr", "web", "un deux trois"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
    got = {(r.lang, r.source): r for r in corpus_datasheet(df).collect()}
    en = got[("en", "web")]
    assert (en.n_docs, en.max_copies, en.n_tokens) == (4, 2, 19)
    assert en.n_bytes == len("a b c") + len("A  B   c") + 23 + 1
    assert en.dup_ratio == 0.25 and en.short_frac == 0.75
    assert en.mean_tokens == 4.75
    assert en.doc_share == 0.8 and en.token_share == round(19 / 22, 6)
    fr = got[("fr", "web")]
    assert (fr.n_docs, fr.n_tokens, fr.dup_ratio) == (1, 3, 0.0)
    assert fr.short_frac == 1.0 and fr.doc_share == 0.2
    assert fr.token_share == round(3 / 22, 6)


def test_corpus_datasheet_empty(spark):
    from crawl_spark.operators.stats import corpus_datasheet

    df = spark.createDataFrame([], "doc_id long, lang string, source string, text string")
    assert corpus_datasheet(df).collect() == []


def test_epoch_mix_matches_python_rule(spark):
    import hashlib

    from crawl_spark.operators.sampling import epoch_mix, rate_threshold

    rows = [(i, ["hi", "lo", "mid"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = epoch_mix(
        df, {"hi": 2.5, "lo": 0.25}, group_col="grp", default_epochs=1.0
    ).collect()

    spec = {"hi": (2, rate_threshold(0.5)), "lo": (0, rate_threshold(0.25))}
    exp = {}
    for i, g in rows:
        n, thr = spec.get(g, (1, rate_threshold(0.0)))
        b = hashlib.md5(str(i).encode()).hexdigest()[:4]
        c = n + (1 if b < thr else 0)
        if c >= 1:
            exp[i] = (g, c)
    assert {r.doc_id for r in got} == set(exp)
    per_doc = {}
    for r in got:
        per_doc.setdefault(r.doc_id, []).append(r.epoch)
        assert r.grp == exp[r.doc_id][0]
    for i, (g, c) in exp.items():
        assert sorted(per_doc[i]) == list(range(1, c + 1)), i
    # the "hi" stratum really upsamples: ~2.5x its doc count
    hi_rows = sum(1 for r in got if r.grp == "hi")
    assert 2 * 30 <= hi_rows <= 3 * 30
    # nesting: e=2.3's extra-copy docs are a subset of e=2.7's
    e23 = {r.doc_id for r in epoch_mix(df, {"hi": 2.3}, group_col="grp",
                                       default_epochs=0.0).collect()
           if r.epoch == 3}
    e27 = {r.doc_id for r in epoch_mix(df, {"hi": 2.7}, group_col="grp",
                                       default_epochs=0.0).collect()
           if r.epoch == 3}
    assert e23 <= e27


def test_epoch_mix_rejects_negative(spark):
    import pytest as _pytest

    from crawl_spark.operators.sampling import epoch_mix

    df = spark.createDataFrame([(1, "a")], "doc_id long, grp string")
    with _pytest.raises(ValueError):
        epoch_mix(df, {"a": -1.0}, group_col="grp")
    with _pytest.raises(ValueError):
        epoch_mix(df, {}, group_col="grp", default_epochs=-0.5)


def test_canonical_dedup_folds_aliases(spark):
    from crawl_spark.operators.dedup import canonical_dedup

    pages = [
        # three aliases declaring one canonical, both attr orders + case
        ("http://a/print", '<head><link rel="canonical" href="http://a/x"/></head>'),
        ("http://a/amp", "<head><link href='http://a/x' rel='canonical'></head>"),
        ("http://a/x", '<head><LINK REL="CANONICAL" HREF="http://a/x"></head>'),
        # no canonical: self-keyed
        ("http://b/1", "<head><title>t</title></head>"),
        # empty href: treated as absent
        ("http://b/2", '<head><link rel="canonical" href=""></head>'),
        # first canonical wins when several are declared
        (
            "http://c/1",
            '<link rel="canonical" href="http://c/first">'
            '<link rel="canonical" href="http://c/second">',
        ),
        # a canonical-looking rel on a DIFFERENT tag attr must not match
        ("http://d/1", '<link rel="alternate" href="http://d/nope">'),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    got = {r.canon_target: r for r in canonical_dedup(df).collect()}
    assert got["http://a/x"].n_aliases == 3
    assert got["http://a/x"].url == "http://a/amp"  # min url survives
    assert got["http://b/1"].n_aliases == 1
    assert got["http://b/2"].n_aliases == 1  # empty href -> self
    assert got["http://c/first"].url == "http://c/1"
    assert got["http://d/1"].n_aliases == 1
    assert len(got) == 5  # 7 pages fold into 5 canonical groups


def test_pr_priority_tiers(spark):
    import pytest as _pytest

    from crawl_spark.operators.graph import pr_priority

    ranks = spark.createDataFrame(
        [(1, 0.02), (2, 0.005), (3, 0.00005), (4, 0.0000001), (5, 0.00001)],
        "node long, rank double",
    )
    got = {r.node: r.priority for r in pr_priority(ranks).collect()}
    assert got == {1: 0, 2: 1, 3: 3, 4: 4, 5: 3}  # 1e-5 boundary: >= keeps tier 3
    with _pytest.raises(ValueError):
        pr_priority(ranks, thresholds=(1e-3, 1e-2))
    with _pytest.raises(ValueError):
        pr_priority(ranks, thresholds=(1e-3, 1e-3))


def test_meta_robots_flags_rules(spark):
    from crawl_spark.operators.urlfilter import meta_robots_flags

    pages = [
        ("u1", '<meta name="robots" content="noindex, nofollow">'),
        ("u2", "<META CONTENT='NOFOLLOW' NAME='ROBOTS'>"),  # reversed, caps
        ("u3", '<meta name="robots" content="none">'),  # implies both
        ("u4", '<meta name="robots" content="index, follow">'),
        ("u5", "<head><title>no meta at all</title></head>"),
        # directive must match on token boundaries, not substrings
        ("u6", '<meta name="robots" content="nonestandard,noindexing">'),
        # a robots-valued content on a DIFFERENT meta name must not match
        ("u7", '<meta name="googlebot" content="noindex">'),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    got = {r.url: (r.noindex, r.nofollow) for r in meta_robots_flags(df).collect()}
    assert got == {
        "u1": (True, True),
        "u2": (False, True),
        "u3": (True, True),
        "u4": (False, False),
        "u5": (False, False),
        "u6": (False, False),
        "u7": (False, False),
    }


def test_host_budget_composes_host_signals(spark):
    """Full planning composition: trap_detect + domain_reputation +
    pagerank/pr_priority -> host_budget. trap.example gets 0 (trap),
    farm.example gets 0 (reputation drop), hub.example gets the tier-0
    boost, plain.example the base budget."""
    from pyspark.sql import functions as F

    from crawl_spark.operators.graph import pagerank, pr_priority
    from crawl_spark.operators.recrawl import host_budget
    from crawl_spark.operators.sampling import domain_reputation
    from crawl_spark.operators.urlfilter import trap_detect

    # corpus: trap host = 60 urls on ONE path with query variants;
    # others get distinct paths
    urls = [("http://trap.example/cal?d=%d" % i) for i in range(60)]
    urls += [("http://hub.example/p%d" % i) for i in range(10)]
    urls += [("http://plain.example/p%d" % i) for i in range(10)]
    urls += [("http://farm.example/p%d" % i) for i in range(10)]
    traps = trap_detect(
        spark.createDataFrame([(u,) for u in urls], "url string"),
        min_urls=50,
    )

    # reputation: farm.example is 10 copies of one page
    docs = [(i, "farm.example", "buy cheap widgets now today friends") for i in range(10)]
    docs += [(100 + i, h, "unique article %d words words words words words words words words" % i)
             for i, h in enumerate(["hub.example", "plain.example", "trap.example"] * 4)]
    rep = domain_reputation(
        spark.createDataFrame(docs, "doc_id long, host string, text string"),
        group_col="host",
        min_docs=5,
    )

    edges = spark.createDataFrame(
        [(h, "hub.example") for h in ("trap.example", "plain.example", "farm.example")],
        "src string, dst string",
    )
    prio = pr_priority(pagerank(edges, iters=3), thresholds=(0.3,))

    hosts = spark.createDataFrame(
        [(h + ".example",) for h in ("trap", "hub", "plain", "farm", "new")],
        "host string",
    )
    got = {
        r.host: r
        for r in host_budget(
            hosts, base_budget=100, traps=traps, reputation=rep,
            priorities=prio, boost=(4, 2),
        ).collect()
    }
    assert got["trap.example"].budget == 0 and got["trap.example"].is_trap
    assert got["farm.example"].budget == 0 and not got["farm.example"].keep
    assert got["hub.example"].budget == 400 and got["hub.example"].priority == 0
    assert got["plain.example"].budget == 200  # tier 1 (below 0.3)
    assert got["new.example"].budget == 100  # no signals: base budget
    assert got["new.example"].priority == 2  # beyond boost tiers


def test_build_postings_matches_python_index(spark):
    from collections import Counter, defaultdict

    from crawl_spark.operators.textops import build_postings

    rows = [
        (1, "the cat sat on the mat the end"),
        (2, "the dog the dog the dog"),
        (3, "cat dog cat"),
        (4, "mat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = defaultdict(list)
    for r in build_postings(df, k=2).collect():
        got[r.term].append((r.rank, r.doc_id, r.tf))

    index = defaultdict(list)
    for i, t in rows:
        for term, tf in Counter(t.split()).items():
            index[term].append((i, tf))
    for term, posts in index.items():
        posts.sort(key=lambda p: (-p[1], p[0]))
        exp = [(rk + 1, i, tf) for rk, (i, tf) in enumerate(posts[:2])]
        assert sorted(got[term]) == exp, term
    assert set(got) == set(index)
    # the hub term "the" (docs 1 and 2 both tf 3) is capped at k=2 and
    # tie-breaks by doc id ascending
    assert sorted(got["the"]) == [(1, 1, 3), (2, 2, 3)]


def test_bm25_matches_python_model(spark):
    """bm25_topk vs a from-scratch Python BM25 (same Lucene idf, same
    round-6-then-sum contract), including the n_terms column and the
    (score desc, doc_id) tie order."""
    import math
    from collections import Counter
    from decimal import Decimal

    from crawl_spark.operators.search import bm25_topk, tokenize_query

    rows = [
        (1, "hash join hash join hash probe build"),
        (2, "window agg window sort agg spill"),
        (3, "join scan filter scan join hash"),
        (4, "the the the the the the the the"),
        (5, "hash"),
        (6, ""),  # empty doc: counts in N and avgdl, matches nothing
    ]
    queries = [("qa", "hash join"), ("qb", "the"), ("qc", "agg window agg")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.query_id, r.rank): (r.doc_id, r.n_terms, r.score)
        for r in bm25_topk(df, queries, k=3).collect()
    }

    toks = {i: t.lower().split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    exp = {}
    for qid, qtext in queries:
        terms = tokenize_query(qtext)
        dfreq = {
            t: sum(1 for tk in toks.values() if t in tk) for t in terms
        }
        scored = []
        for i, tk in toks.items():
            c = Counter(tk)
            s, n_terms = Decimal(0), 0
            for t in terms:
                tf = c.get(t, 0)
                if not tf:
                    continue
                n_terms += 1
                idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                w = idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(tk) / avgdl)
                )
                s += Decimal(str(round(w, 6)))
            if n_terms:
                scored.append((-float(s), i, n_terms))
        scored.sort()
        for rk, (neg, i, nt) in enumerate(scored[:3], start=1):
            exp[(qid, rk)] = (i, nt, -neg)
    assert got == exp
    # the single-term query ranks purely by tf saturation: doc 4 (tf=8)
    # still beats nothing else — it is the only 'the' match
    assert got[("qb", 1)][0] == 4 and ("qb", 2) not in got


def test_bm25_empty_inputs_raise(spark):
    from crawl_spark.operators.search import bm25_topk

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(df, [])
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(empty, [("q", "a")])


def test_hop_distance_matches_python_bfs(spark):
    """hop_distance vs a dict BFS: cycle, diamond (two paths, min hop
    wins), unreachable node absent, max_hops truncation, seed not in
    the edge table still reported at hop 0."""
    from collections import deque

    from crawl_spark.operators.graph import hop_distance

    edges = [
        (0, 1), (1, 2), (2, 0),          # cycle back to the seed
        (0, 3), (3, 4), (1, 4),          # diamond: 4 via 0-1-4 (hop 2)
        (4, 5), (5, 6), (6, 7), (7, 8),  # chain beyond max_hops
        (9, 0),                          # 9 reaches the seed, nothing reaches 9
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (99,)], "node long")

    def bfs(adj, starts, cap):
        dist = {s: 0 for s in starts}
        q = deque(starts)
        while q:
            u = q.popleft()
            if dist[u] == cap:
                continue
            for v in adj.get(u, ()):  # noqa: B909
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    for cap in (0, 1, 4):
        got = {
            r.node: r.hop
            for r in hop_distance(e, seeds, max_hops=cap).collect()
        }
        assert got == bfs(adj, [0, 99], cap), cap
    full = {r.node: r.hop for r in hop_distance(e, seeds, max_hops=4).collect()}
    assert full[99] == 0 and 9 not in full and full[4] == 2
    assert 8 not in full  # hop 6 > max_hops=4


def test_degree_stats_hand_computed(spark):
    from crawl_spark.operators.graph import degree_stats

    e = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3), (2, 3), (3, 1), (4, 1)],  # (1,2) duplicated
        "src long, dst long",
    )
    got = {
        r.node: (r.out_deg, r.in_deg, r.deg_bucket)
        for r in degree_stats(e).collect()
    }
    # distinct edges: 1->2, 1->3, 2->3, 3->1, 4->1
    assert got == {
        1: (2, 2, 3),  # total 4 -> bin '100' -> bucket 3
        2: (1, 1, 2),
        3: (1, 2, 2),
        4: (1, 0, 1),  # dangling source-only node
    }


def test_content_drift_hand_computed(spark):
    from crawl_spark.operators.recrawl import content_drift

    rows = [
        ("u1", 100, "a"), ("u1", 200, "b"), ("u1", 300, "b"), ("u1", 400, "c"),
        ("u2", 100, "x"), ("u2", 500, "x"),   # never changes
        ("u3", 100, "only"),                  # single capture
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long, text string")
    got = {r.url: r.asDict() for r in content_drift(df).collect()}
    assert got["u1"] == {
        "url": "u1", "n_captures": 4, "n_changes": 2,
        "change_rate": round(2 / 3, 6), "first_ts": 100, "last_ts": 400,
        "est_interval_s": 150,
    }
    assert got["u2"]["n_changes"] == 0
    assert got["u2"]["change_rate"] == 0.0
    assert got["u2"]["est_interval_s"] is None
    assert got["u3"]["n_captures"] == 1
    assert got["u3"]["change_rate"] is None
    assert got["u3"]["est_interval_s"] is None


def test_sitemap_coverage_hand_computed(spark):
    from crawl_spark.operators.stats import sitemap_coverage

    declared = spark.createDataFrame(
        [
            ("https://a.example/p/1",), ("https://a.example/p/2",),
            ("https://a.example/p/2",),           # duplicate declaration
            ("https://b.example/p/1",),           # declared, never crawled
            (None,),                              # loc-less row: dropped
        ],
        "loc string",
    )
    crawled = spark.createDataFrame(
        [
            ("https://a.example/p/1",), ("https://a.example/q/9",),
            ("https://c.example/p/1",),           # crawled, never declared
        ],
        "url string",
    )
    got = {r.host: r.asDict() for r in sitemap_coverage(declared, crawled).collect()}
    assert got["a.example"] == {
        "host": "a.example", "n_declared": 2, "n_crawled": 2, "n_matched": 1,
        "coverage": 0.5, "n_undeclared": 1,
    }
    assert got["b.example"]["n_declared"] == 1
    assert got["b.example"]["n_crawled"] == 0
    assert got["b.example"]["coverage"] == 0.0
    assert got["c.example"]["n_declared"] == 0
    assert got["c.example"]["coverage"] is None
    assert got["c.example"]["n_undeclared"] == 1


def test_sessionize_hand_computed(spark):
    """Gap rule is strict (> gap starts a session; == gap does not),
    session_idx is 1-based in time order, singleton sessions have
    duration 0."""
    from datetime import datetime as DT

    from crawl_spark.operators.sessions import sessionize

    def ts(s):
        return DT(2024, 1, 1, 0, 0, s)

    rows = [
        (1, ts(0)), (1, ts(10)), (1, ts(20)),   # session 1: 3 events
        (1, ts(50)), (1, ts(55)),               # gap 30 > 10? -> new
        (2, ts(0)),                             # singleton
        (2, ts(11)),                            # gap 11 > 10 -> new
        (3, ts(0)), (3, ts(10)),                # gap == 10 -> SAME session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.entity, r.session_idx): (r.n_events, r.duration_us)
        for r in sessionize(df, gap_s=10).collect()
    }
    m = 1_000_000
    assert got == {
        (1, 1): (3, 20 * m), (1, 2): (2, 5 * m),
        (2, 1): (1, 0), (2, 2): (1, 0),
        (3, 1): (2, 10 * m),
    }


def test_error_streaks_hand_computed(spark):
    from datetime import datetime as DT

    from crawl_spark.operators.sessions import error_streaks

    def ts(s):
        return DT(2024, 1, 1, 0, 0, s)

    rows = [
        # entity 1: E E ok E E E  -> streaks 2 and 3, ends failing
        (1, ts(0), "error"), (1, ts(1), "error"), (1, ts(2), "view"),
        (1, ts(3), "error"), (1, ts(4), "error"), (1, ts(5), "error"),
        # entity 2: never errors
        (2, ts(0), "view"), (2, ts(1), "click"),
        # entity 3: one error then recovers
        (3, ts(0), "error"), (3, ts(1), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.entity: r.asDict() for r in error_streaks(df).collect()}
    assert got[1] == {
        "entity": 1, "n_events": 6, "n_errors": 5, "n_streaks": 2,
        "max_streak": 3, "ends_in_streak": True,
    }
    assert got[2]["n_streaks"] == 0 and got[2]["max_streak"] == 0
    assert got[2]["ends_in_streak"] is False
    assert got[3] == {
        "entity": 3, "n_events": 2, "n_errors": 1, "n_streaks": 1,
        "max_streak": 1, "ends_in_streak": False,
    }


def test_host_policy_hand_computed(spark):
    """Every policy branch by hand: failing host → exponential backoff
    + concurrency 1, robots delay dominating the max, error rate > 1/2
    on a healthy host → concurrency 1, fast healthy host → latency-
    scaled concurrency at the cap, slow healthy host → concurrency 1
    via the floor, all-errors host → trailing = n_events."""
    from datetime import datetime as DT

    from crawl_spark.operators.sessions import host_policy

    def ts(s):
        return DT(2024, 1, 1, 0, 0, s)

    rows = [
        # entity 1: ok then 3 trailing errors -> backoff 1000*2^3=8000
        (1, ts(0), "view", 100.0), (1, ts(1), "error", 100.0),
        (1, ts(2), "error", 100.0), (1, ts(3), "error", 100.0),
        # entity 2: healthy + fast (p95=50ms) -> conc = min(8, 1000/50)=8
        (2, ts(0), "view", 50.0), (2, ts(1), "view", 50.0),
        # entity 3: healthy but 2/3 errors (not trailing) -> conc 1
        (3, ts(0), "error", 10.0), (3, ts(1), "error", 10.0),
        (3, ts(2), "view", 10.0),
        # entity 4: healthy + slow (p95=4000ms) -> conc floor(.25)->1
        (4, ts(0), "view", 4000.0), (4, ts(1), "view", 4000.0),
        # entity 5: ALL errors -> trailing = n_events, capped backoff
        (5, ts(0), "error", 5.0), (5, ts(1), "error", 5.0),
        (5, ts(2), "error", 5.0), (5, ts(3), "error", 5.0),
        (5, ts(4), "error", 5.0), (5, ts(5), "error", 5.0),
        (5, ts(6), "error", 5.0), (5, ts(7), "error", 5.0),
        # entity 6: NULL event_type tail counts as NOT-error (the
        # oracle's CASE..ELSE 0) -> healthy, no backoff
        (6, ts(0), "error", 20.0), (6, ts(1), None, 20.0),
        # entity 7: same-microsecond tie, one error one ok -> the
        # deterministic (us, err) order puts the error LAST (trailing)
        (7, ts(0), "view", 30.0), (7, ts(1), "error", 30.0),
        (7, ts(1), "view", 30.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    robots = spark.createDataFrame(
        [(2, 9000)], "entity long, robots_delay_ms long"
    )
    got = {
        r["entity"]: r.asDict()
        for r in host_policy(df, robots=robots).collect()
    }
    assert got[1]["trailing_streak"] == 3 and got[1]["delay_ms"] == 8000
    assert got[1]["concurrency"] == 1
    assert got[2]["delay_ms"] == 9000  # robots dominates the 1000 floor
    assert got[2]["concurrency"] == 8 and got[2]["err_rate"] == 0.0
    assert got[3]["trailing_streak"] == 0 and got[3]["concurrency"] == 1
    assert got[3]["delay_ms"] == 1000  # err_rate gate alone, no backoff
    assert got[4]["concurrency"] == 1 and got[4]["p95_latency"] == 4000.0
    assert got[5]["trailing_streak"] == 8
    assert got[5]["delay_ms"] == 1000 * 2**6  # backoff capped at 2^6
    assert got[6]["trailing_streak"] == 0 and got[6]["n_errors"] == 1
    # err_rate is exactly 0.5, NOT > 0.5 -> no gate; healthy + fast
    # (p95=20ms) -> latency-scaled concurrency at the cap
    assert got[6]["err_rate"] == 0.5
    assert got[6]["delay_ms"] == 1000 and got[6]["concurrency"] == 8
    assert got[7]["trailing_streak"] == 1 and got[7]["concurrency"] == 1


def test_classify_asset_urls_rules(spark):
    from crawl_spark.operators.urlfilter import classify_asset_urls

    cases = {
        "https://a.example/p.PNG": ("png", "image", False),
        "https://a.example/p.png?x=1#f": ("png", "image", False),
        "https://a.example/deep/path/app.min.js": ("js", "script", False),
        "https://a.example/font.woff2": ("woff2", "font", False),
        "https://a.example/x.tar.gz": ("gz", "archive", False),
        "https://a.example/report.pdf": ("pdf", "document", False),
        "https://a.example/page.html": ("html", "page", True),
        "https://a.example/api/v1.2/items": ("2/items"[-7:], "page", True),
        "https://a.example/plain": ("", "page", True),
        "https://a.example/": ("", "page", True),
        "https://a.example/a.b/c": ("", "page", True),  # dot in dir only
    }
    # fix the v1.2 expectation: ext group cannot span '/', so no match
    cases["https://a.example/api/v1.2/items"] = ("", "page", True)
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r.url: (r.ext, r.kind, r.fetch_html)
        for r in classify_asset_urls(df).collect()
    }
    assert got == cases


def test_resolve_redirects_matches_python_walk(spark):
    from crawl_spark.operators.graph import resolve_redirects

    edges = [
        (1, 2), (2, 3), (3, 4),            # chain 1->4 (3 hops), 2->4, 3->4
        (10, 11), (11, 10),                # 2-loop
        (20, 10),                          # feeds the loop -> unresolved
        (30, 31),                          # 1-hop
        (40, 41), (40, 42),                # duplicate out-edges: min(dst)=41
        # long chain 100 -> 99 -> ... -> 80 (20 hops from 100)
        *[(100 - k, 99 - k) for k in range(20)],
    ]
    df = spark.createDataFrame(edges, "src long, dst long")

    def walk(ptr, s, cap):
        cur, hops = ptr[s], 1
        while cur in ptr and hops < cap:
            cur, hops = ptr[cur], hops + 1
        return (cur, hops, True) if cur not in ptr and hops <= cap else (None, None, False)

    ptr = {}
    for s, d in edges:
        ptr[s] = min(ptr.get(s, d), d)
    for cap in (1, 2, 8, 16, 32):
        got = {
            r.src: (r.final, r.hops, r.resolved)
            for r in resolve_redirects(df, max_chain=cap).collect()
        }
        assert got == {s: walk(ptr, s, cap) for s in ptr}, cap
    full = {
        r.src: (r.final, r.hops, r.resolved)
        for r in resolve_redirects(df, max_chain=32).collect()
    }
    assert full[1] == (4, 3, True)
    assert full[10] == (None, None, False) and full[20] == (None, None, False)
    assert full[40] == (41, 1, True)  # min(dst) rule
    assert full[100] == (80, 20, True)  # doubling covers the long chain


def test_ann_recall_full_probe_is_one(spark):
    """Probing EVERY cell makes IVF exhaustive, so recall@k must be
    exactly 1.0 per query; nprobe=1 recall is <= that and the hit
    counts match a from-scratch python evaluation of both pipelines."""
    import numpy as np

    from crawl_spark.operators.similarity import ann_recall

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 8).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter("vec_id < 5")
    # centroid_mod=20 -> centroids at ids 0,20,40 (3 cells)
    full = {
        r.query_id: r
        for r in ann_recall(df, q, k=5, nprobe=3, centroid_mod=20).collect()
    }
    assert all(r.recall == 1.0 and r.n_hit == r.n_exact == 5 for r in full.values())
    one = {
        r.query_id: r
        for r in ann_recall(df, q, k=5, nprobe=1, centroid_mod=20).collect()
    }
    assert set(one) == set(full) == set(range(5))
    assert all(0 <= one[i].n_hit <= 5 and one[i].recall == round(one[i].n_hit / 5, 6) for i in one)


def test_embed_dim_stats_matches_numpy(spark):
    import numpy as np

    from crawl_spark.operators.similarity import embed_dim_stats

    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 4).round(4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    got = {r.pos: r for r in embed_dim_stats(df).collect()}
    for d in range(4):
        col = vecs[:, d]
        s1 = sum(round(float(x), 6) for x in col)
        s2 = sum(round(float(x) * float(x), 12) for x in col)
        r = got[d + 1]
        assert r.n == 200
        assert r.mean == round(s1 / 200, 6)
        assert r.var == round(s2 / 200 - (s1 / 200) * (s1 / 200), 6)
        assert r.vmin == round(float(col.min()), 6)
        assert r.vmax == round(float(col.max()), 6)


def test_lsh_recall_matches_python_truth(spark):
    """lsh_recall vs a from-scratch python evaluation: exact Jaccard
    truth over all pairs, candidates from the same banded minhash (via
    the operator, trusted separately by test_minhash_*), identical
    recall/precision arithmetic. Corpus built so both near-dups and
    unrelated docs exist at threshold 0.5."""
    from crawl_spark.operators.dedup import lsh_recall, minhash_candidates

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 1
        (3, "one two three four five six seven eight"),
        (4, "one two three four five six seven eight"),        # exact dup of 3
        (5, "completely different words entirely unrelated here now ok"),
        (6, "short text"),                                     # no 3-shingle pair
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = lsh_recall(df, threshold=0.5).collect()[0]

    def sh3(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    true = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            a, b = sh3(ta), sh3(tb)
            if a and b and round(len(a & b) / len(a | b), 6) >= 0.5:
                true.add((ia, ib))
    cand = {
        (r.id_a, r.id_b) for r in minhash_candidates(df).collect()
    }
    hit = true & cand
    assert got.n_true == len(true) and got.n_cand == len(cand)
    assert got.n_hit == len(hit)
    assert got.recall == (round(len(hit) / len(true), 6) if true else None)
    assert got.precision == (round(len(hit) / len(cand), 6) if cand else None)
    assert (1, 2) in true and (3, 4) in true  # the fixture has real signal


def test_shuffle_corpus_is_seeded_permutation(spark):
    """(a) every id appears exactly once; (b) pos is dense 1..n per
    shard; (c) identical across two invocations (determinism); (d) a
    different seed yields a different order; (e) the (shard, pos) key
    matches the pure-Python twin of the md5 contract exactly."""
    import hashlib

    from crawl_spark.operators.sampling import shuffle_corpus

    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_corpus(df, seed=7, shards=8).collect()
    }
    assert sorted(got) == ids  # permutation: each id exactly once
    by_shard: dict[int, list[int]] = {}
    for sh, pos in got.values():
        by_shard.setdefault(sh, []).append(pos)
    for sh, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), sh

    again = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_corpus(df, seed=7, shards=8).collect()
    }
    assert again == got  # deterministic replay

    other = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_corpus(df, seed=8, shards=8).collect()
    }
    assert other != got  # a new epoch seed is a new permutation

    # pure-Python twin: shard = int(md5('7:'+id)[:8], 16) % 8, order by
    # (md5 hex, id) within the shard
    keyed = [(hashlib.md5(b"7:%d" % i).hexdigest(), i) for i in ids]
    twin: dict[int, tuple[int, int]] = {}
    shards: dict[int, list[tuple[str, int]]] = {}
    for k, i in keyed:
        shards.setdefault(int(k[:8], 16) % 8, []).append((k, i))
    for sh, rows in shards.items():
        for pos, (_, i) in enumerate(sorted(rows), 1):
            twin[i] = (sh, pos)
    assert twin == got


def test_shuffle_corpus_rejects_bad_shards(spark):
    import pytest as _pytest

    from crawl_spark.operators.sampling import shuffle_corpus

    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError, match="shards"):
        shuffle_corpus(df, shards=0)


def test_compression_ratio_matches_python_twin(spark):
    """Per-row rule == the driver twin (same CPython zlib) bit-for-bit;
    repetitive text scores measurably below varied prose; NULL/empty
    rows come back NULL."""
    from crawl_spark.operators.textops import (
        compression_ratio,
        compression_ratio_str,
    )

    docs = [
        (0, "spam spam spam " * 200),
        (1, "the quick brown fox jumps over the lazy dog and then "
            "discusses seventeen unrelated topics in varied prose"),
        (2, None),
        (3, ""),
        (4, "héllo wörld ünïcode " * 30),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bytes, r.n_compressed, r.ratio)
        for r in compression_ratio(df).collect()
    }
    for i, t in docs:
        want = compression_ratio_str(t)
        assert got[i] == (want if want else (None, None, None)), i
    assert got[0][2] < got[1][2]  # repetition compresses far better


def test_url_templates_hand_computed(spark):
    from crawl_spark.operators.urlfilter import url_templates

    rows = []
    # host A: /product/{n} dominates (20 urls), /cat/{n}/{n} second (5)
    rows += [f"https://a.example/product/{i}" for i in range(20)]
    rows += [f"https://a.example/cat/{i}/{i+1}" for i in range(5)]
    # hex run (12 chars) and a UUID both template away
    rows += [
        "https://a.example/s/0123456789ab",
        "https://a.example/s/ba9876543210",
        "https://a.example/u/123e4567-e89b-12d3-a456-426614174000",
        "https://a.example/u/00000000-0000-4000-8000-000000000000",
    ]
    # a singleton template (dropped at min_count=2)
    rows += ["https://a.example/about"]
    # query/fragment never leak into the template
    rows += ["https://b.example/p/7?x=1#frag", "https://b.example/p/8"]
    df = spark.createDataFrame([(u,) for u in rows], "url string")
    got = url_templates(df, k=3, min_count=2).collect()
    a = {r.template: r for r in got if r.host == "a.example"}
    assert a["/product/{n}"].n_urls == 20 and a["/product/{n}"].rank == 1
    assert a["/product/{n}"].n_paths == 20
    assert a["/product/{n}"].example == "/product/0"
    assert a["/cat/{n}/{n}"].n_urls == 5
    assert a["/s/{hex}"].n_urls == 2
    # k=3 keeps the top 3 only; /u/{uuid} (2) ties with /s/{hex} (2) —
    # template asc breaks the tie, so /s/{hex} wins rank 3
    assert len(a) == 3 and "/u/{uuid}" not in a
    assert "/about" not in a  # singleton dropped
    b = {r.template: r for r in got if r.host == "b.example"}
    assert list(b) == ["/p/{n}"] and b["/p/{n}"].n_urls == 2


def test_param_stats_id_like_detection(spark):
    from crawl_spark.operators.urlfilter import param_stats

    rows = []
    # sid: 10 occurrences, all-distinct values -> id_like
    rows += [f"https://a.example/p?sid=s{i}&page={i % 2}" for i in range(10)]
    # bare key (no '='), counted with value ''
    rows += ["https://a.example/p?flag", "https://a.example/p?flag"]
    # base64 value: padding '=' stays in the value (ONE distinct value)
    rows += ["https://a.example/p?tok=QQ==", "https://a.example/p?tok=QQ=="]
    # empty pair segments dropped; fragment '?' is not a query
    rows += ["https://a.example/p?a=1&&a=1", "https://a.example/p#x?b=2"]
    df = spark.createDataFrame([(u,) for u in rows], "url string")
    got = {(r.host, r.key): r for r in param_stats(df, min_occ=5).collect()}
    sid = got[("a.example", "sid")]
    assert (sid.n_occ, sid.n_vals, sid.max_per_val) == (10, 10, 1)
    assert sid.distinct_ratio == 1.0 and sid.id_like
    page = got[("a.example", "page")]
    assert (page.n_occ, page.n_vals) == (10, 2) and not page.id_like
    flag = got[("a.example", "flag")]
    assert (flag.n_occ, flag.n_vals) == (2, 1) and not flag.id_like
    tok = got[("a.example", "tok")]
    assert (tok.n_occ, tok.n_vals) == (2, 1)  # '=' padding not split on
    assert got[("a.example", "a")].n_occ == 2  # '&&' empty segment gone
    assert ("a.example", "b") not in got  # fragment '?' is no query


def test_trustrank_matches_python_iteration(spark):
    from crawl_spark.operators.graph import trustrank

    # trusted core 0->1->2->0 (+2->3), spam island 10<->11 with heavy
    # internal linkage, 3 dangling (no out-edges), seed = {0}
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (10, 11), (11, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,), (99,)], "node long")  # 99 not in graph
    got = {r.node: r.trust for r in trustrank(e, s, iters=5).collect()}

    # pure-Python twin, same association
    nodes = sorted({x for t in edges for x in t})
    out = {}
    for a, b in edges:
        out.setdefault(a, set()).add(b)
    tp = {v: (1.0 if v == 0 else 0.0) for v in nodes}
    r = dict(tp)
    d = 0.85
    for _ in range(5):
        dm = sum(r[v] for v in nodes if v not in out)
        s_in = {v: 0.0 for v in nodes}
        for a, nbrs in out.items():
            for b in nbrs:
                s_in[b] += r[a] / len(nbrs)
        r = {v: (1.0 - d) * tp[v] + d * (s_in[v] + dm * tp[v]) for v in nodes}
    for v in nodes:
        assert abs(got[v] - round(r[v], 6)) <= 1e-6, (v, got[v], r[v])
    # spam island is unreachable from the seed: exactly zero trust
    assert got[10] == 0.0 and got[11] == 0.0
    # trust is conserved (rounded): teleport + dangling both return to seeds
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_trustrank_empty_seed_raises(spark):
    import pytest as _pytest

    from crawl_spark.operators.graph import trustrank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    s = spark.createDataFrame([(42,)], "node long")  # not a graph node
    with _pytest.raises(ValueError, match="no seed"):
        trustrank(e, s)


def test_score_quantiles_matches_numpy(spark):
    import numpy as np

    from crawl_spark.operators.textops import score_quantiles

    rows = [("en", float(v)) for v in [1, 3, 5, 7, 9, 11, 200]] + [
        ("fr", float(v)) for v in [0.5, 0.75, 2.5]
    ] + [("de", 4.0)]  # single-value stratum: every quantile is 4.0
    df = spark.createDataFrame(rows, "lang string, score double")
    got = {
        (r.lang, r.p): r.q
        for r in score_quantiles(df, probs=(0.1, 0.5, 0.9)).collect()
    }
    for lang, vals in [
        ("en", [1, 3, 5, 7, 9, 11, 200]),
        ("fr", [0.5, 0.75, 2.5]),
        ("de", [4.0]),
    ]:
        for p in (0.1, 0.5, 0.9):
            want = round(float(np.quantile(np.array(vals, dtype=float), p)), 6)
            assert got[(lang, p)] == want, (lang, p, got[(lang, p)], want)
    assert len(got) == 9

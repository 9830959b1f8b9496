"""Multinomial Naive Bayes (hashed grams) vs a pure-Python twin."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

B = 512


def py_tokens(text):
    return [t for t in text.lower().split() if t]


def py_grams(toks):
    return list(toks) + [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]


def py_bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def py_nb_train(rows):
    counts, docs = {}, {}
    for lab, text in rows:
        docs[lab] = docs.get(lab, 0) + 1
        for g in py_grams(py_tokens(text)):
            k = (lab, py_bucket(g))
            counts[k] = counts.get(k, 0) + 1
    totals = {}
    for (lab, _), c in counts.items():
        totals[lab] = totals.get(lab, 0) + c
    nd = sum(docs.values())
    logp = {
        (lab, b): round(
            math.log((counts.get((lab, b), 0) + 1) / (totals.get(lab, 0) + B)), 6
        )
        for lab in docs
        for b in range(B)
    }
    logprior = {lab: round(math.log(docs[lab] / nd), 6) for lab in docs}
    return logp, logprior


def py_nb_score(text, logp, logprior):
    grams = py_grams(py_tokens(text))
    best = None
    for lab in sorted(logprior):
        s = round(sum(logp[(lab, py_bucket(g))] for g in grams) + logprior[lab], 6)
        if best is None or s > best[1]:
            best = (lab, s)
    return best[0], best[1], len(grams)


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for i in range(90):
        if i % 3 == 0:
            rows.append(("sci", f"experiment data proton result {i % 5} measure"))
        elif i % 3 == 1:
            rows.append(("spam", f"buy cheap deal sale {i % 7} discount offer"))
        else:
            rows.append(("news", f"report today event {i % 4} city council vote"))
    return spark.createDataFrame(
        [(i, lab, t) for i, (lab, t) in enumerate(rows)],
        "doc_id long, label string, text string",
    )


def test_nb_matches_python_model(spark, labeled):
    from crawl_spark.operators.classify import nb_score, nb_train

    model = nb_train(labeled, n_buckets=B)
    rows = labeled.collect()
    logp, logprior = py_nb_train([(r["label"], r["text"]) for r in rows])

    got_model = {(r["label"], r["bucket"]): (r["logp"], r["logprior"])
                 for r in model.collect()}
    assert len(got_model) == 3 * B  # full K x B spine
    for (lab, b), (lp, pr) in got_model.items():
        assert abs(lp - logp[(lab, b)]) < 1e-9
        assert abs(pr - logprior[lab]) < 1e-9

    scored = {r["doc_id"]: r for r in nb_score(labeled, model, n_buckets=B).collect()}
    assert len(scored) == 90
    for r in rows:
        lab, s, n = py_nb_score(r["text"], logp, logprior)
        g = scored[r["doc_id"]]
        assert (g["pred"], g["n_grams"]) == (lab, n), r["doc_id"]
        assert abs(g["score"] - s) < 1e-6, r["doc_id"]


def test_nb_classifies_held_out_and_empty_docs(spark, labeled):
    from crawl_spark.operators.classify import nb_score, nb_train

    train = labeled.filter(F.col("doc_id") < 60)
    model = nb_train(train, n_buckets=B)
    test = labeled.filter(F.col("doc_id") >= 60)
    out = {r["doc_id"]: r["pred"] for r in nb_score(test, model, n_buckets=B).collect()}
    want = {r["doc_id"]: r["label"] for r in test.collect()}
    assert out == want  # disjoint vocabularies: perfect held-out accuracy

    # empty / whitespace docs classify by priors alone (equal priors here
    # -> deterministic label-ascending tie-break), n_grams = 0
    empties = spark.createDataFrame(
        [(1000, ""), (1001, " \t ")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in nb_score(empties, model, n_buckets=B).collect()}
    assert len(got) == 2
    for r in got.values():
        assert r["n_grams"] == 0 and r["pred"] == "news"  # min label


def test_nb_train_rejects_null_labels(spark):
    from crawl_spark.operators.classify import nb_train

    df = spark.createDataFrame(
        [(0, "sci", "a b"), (1, None, "c d")], "doc_id long, label string, text string"
    )
    with pytest.raises(ValueError, match="NULL"):
        nb_train(df, n_buckets=B)

"""Ranked keyword retrieval over the crawled corpus: BM25 top-k.

The reference crawler feeds a search index (`SURVEY.md` §1 — the classic
downstream of `crawler.go`'s extracted text); `textops.build_postings`
exports the impact-ordered posting lists. This module adds the ranking
half: Okapi BM25 (Robertson & Walker, SIGIR'94; the Lucene
`ln(1 + (N - df + 0.5)/(df + 0.5))` non-negative idf variant) evaluated
corpus-wide for a literal query set — the retrieval baseline every
corpus-quality / decontamination study runs against a crawl.

Scale design (100 TB corpus, 10^9 docs):

- Queries are a driver-literal dimension (10s-1000s of rows): they
  broadcast; the corpus never moves because of them.
- The token stream is SEMI-JOINED against the distinct query-term set
  BEFORE the (doc, term) aggregation, so the only shuffle carries
  (doc_id, term, 1, dl) for MATCHING tokens only — a stopword-free
  query touches a tiny corpus slice; document text never shuffles.
- df (document frequency) and the per-(query, doc) score are partial-
  aggregated groupBys; per-term contributions are rounded to 6 dp and
  summed as DECIMAL(18,6) (the repo's decimal-exact-sum rule) so the
  DuckDB oracle hash-matches bit-for-bit.
- N and avgdl are ONE bounded 1-row driver aggregate (the
  `tfidf_top_terms` precedent).
- Final ranking goes through `grouped_topk`, never a bare
  `Window.partitionBy(query_id)`: a stopword query matches nearly every
  document, the exact hub shape the local prune exists for.

Float contract: avgdl = exact-integer sum / exact-integer count in one
float64 division; idf and the saturation term are evaluated with the
same literal constants and association on both engines; only the
per-term contribution is rounded (6 dp) before the decimal sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import resolve_tokens
from .topk import grouped_topk


def tokenize_query(text: str) -> list[str]:
    """Driver-side twin of the whitespace token contract
    (:func:`~crawl_spark.operators.textops.tokens`) for query strings:
    lowercase, split on whitespace, drop empties, distinct terms in
    first-seen order (BM25 scores each term once)."""
    seen: dict[str, None] = {}
    for t in text.lower().split():
        if t:
            seen.setdefault(t, None)
    return list(seen)


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    tokenizer=None,
) -> DataFrame:
    """Top-``k`` documents per query by Okapi BM25.

    ``queries`` is a list of ``(query_id, query_text)`` literals (the
    dimension side — it broadcasts). Returns
    ``(query_id, rank, doc_id, n_terms, score)`` with ``rank`` 1-based
    by (score desc, doc_id asc) and ``score`` the decimal-exact sum of
    6-dp-rounded per-term contributions

        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    with ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` over the FULL
    corpus (N docs, avgdl mean token length — empty docs count).
    ``tokenizer`` follows the :func:`~crawl_spark.operators.textops.
    resolve_tokens` hook; queries are tokenized with the same contract
    driver-side (:func:`tokenize_query`).
    """
    spark = df.sparkSession
    qrows = [
        (qid, term)
        for qid, qtext in queries
        for term in tokenize_query(qtext)
    ]
    if not qrows:
        raise ValueError("bm25_topk: empty query set")
    qterms = spark.createDataFrame(qrows, "query_id string, term string")

    # ONE bounded 1-row aggregate for the corpus constants. size() of the
    # token array in a plain projection — text is read once, nothing
    # shuffles (partial agg all the way down).
    n_docs, sum_dl = (
        df.select(F.size(resolve_tokens(F.col(text_col), tokenizer)).alias("dl"))
        .agg(F.count("*"), F.coalesce(F.sum("dl"), F.lit(0)))
        .first()
    )
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = sum_dl / n_docs  # one float64 division of two exact integers

    # Token stream, pre-filtered to query terms BEFORE the aggregation:
    # the shuffle carries only matching (doc_id, term, dl) rows.
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        resolve_tokens(F.col(text_col), tokenizer).alias("__toks"),
    ).select(
        "doc_id",
        F.explode("__toks").alias("term"),
        F.size("__toks").alias("dl"),
    )
    tf = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term", "leftsemi")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"), F.max("dl").alias("dl"))
    )
    # df(t) over query terms only — tf is already one row per (doc, term).
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("dfreq"))

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("dfreq") + F.lit(0.5))
        / (F.col("dfreq") + F.lit(0.5))
    )
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    contrib = F.round(idf * sat, 6).cast("decimal(18,6)")

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("int").alias("n_terms"),
            F.sum(contrib).alias("__dscore"),
        )
        .select(
            "query_id",
            "doc_id",
            "n_terms",
            F.col("__dscore").cast("double").alias("score"),
        )
        .withColumn("__negscore", -F.col("score"))
    )
    ranked = grouped_topk(
        scored, ["query_id"], ["__negscore", "doc_id"], k,
        rank_col="rank", keep_rank=True,
    )
    return ranked.select(
        "query_id", F.col("rank").cast("int").alias("rank"),
        "doc_id", "n_terms", "score",
    )


def bm25_oracle_sql(
    queries: list[tuple[str, str]],
    toks_sql: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same literals, same association,
    same 6-dp-round-then-decimal-sum), parameterized on the shared token
    SQL (`_TOKS` in ``__spark_entry__``)."""
    qvals = ", ".join(
        f"('{qid}', '{term}')"
        for qid, qtext in queries
        for term in tokenize_query(qtext)
    )
    return f"""
WITH q(query_id, term) AS (VALUES {qvals}),
stats AS (
  SELECT count(*) AS n, CAST(sum(len({toks_sql})) AS DOUBLE) / count(*) AS avgdl
  FROM {table}),
tok AS (
  SELECT {id_col} AS doc_id, unnest({toks_sql}) AS term, len({toks_sql}) AS dl
  FROM {table}),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
  FROM tok WHERE term IN (SELECT term FROM q)
  GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM tf GROUP BY 1),
scored AS (
  SELECT q.query_id, tf.doc_id,
    CAST(count(*) AS INT) AS n_terms,
    CAST(sum(CAST(round(
      ln(1.0 + (CAST(s.n AS DOUBLE) - d.dfreq + 0.5) / (d.dfreq + 0.5))
      * (tf.tf * {k1 + 1.0!r}) / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * tf.dl / s.avgdl)),
      6) AS DECIMAL(18,6))) AS DOUBLE) AS score
  FROM tf JOIN dfreq d USING (term) JOIN q USING (term) CROSS JOIN stats s
  GROUP BY 1, 2),
r AS (
  SELECT query_id, doc_id, n_terms, score,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_terms, score
FROM r WHERE rank <= {k}
"""

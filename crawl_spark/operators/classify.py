"""Trainable text classification: multinomial Naive Bayes over hashed
unigram+bigram features — the fastText-linear-classifier role in a
training-data pipeline (FineWeb-Edu-style "model-filtered quality",
trainable topic/domain/language tagging), fully distributed and
cross-engine exact.

Relationship to the neighbouring operators: ``sampling.dsir_weights``
fits the two-class log-RATIO for importance RESAMPLING; this module
fits K per-class log-LIKELIHOOD models plus priors and returns argmax
PREDICTIONS. Both share the hashed-gram feature space
(``sampling._dsir_grams`` / ``_dsir_bucket``: whitespace-or-tokenizer
unigrams + bigrams, md5-prefix bucketed into ``n_buckets``).

Plan shapes at 100 TB:

- ``nb_train``: ONE partial-aggregated groupBy(label, bucket) over the
  exploded grams (≤ K·n_buckets result rows however large the labeled
  corpus), one tiny groupBy(label) for doc priors; the model is a
  K·n_buckets-row DataFrame — broadcastable by construction.
- ``nb_score``: corpus grams explode map-side and broadcast-join the
  model on the bucket key (fan-out ×K — K is the class count, single
  digits in practice); ONE groupBy(id, label) with decimal-exact sums,
  then ONE partial-agg groupBy(id) argmax via min(struct(-score,
  label)) — never a per-doc window, never a driver collect.

Per-bucket log-probabilities are rounded to 6 dp at train time and
summed as DECIMALs at score time, so scores are order-independent and
bit-identical across Spark, DuckDB and the pure-Python twin (the same
contract dsir_score uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nb_train(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 4096,
    tokenizer=None,
) -> DataFrame:
    """Fit the model: one row per (label, bucket) — the FULL K×B spine —
    with ``logp`` = log add-one-smoothed class-conditional bucket
    probability and ``logprior`` = log class document share (repeated
    per row so the model stays a single broadcastable frame).

    Rows with NULL labels are rejected loudly (a silent drop would skew
    the priors); token-less docs still count toward priors.
    """
    spark = df.sparkSession
    from .sampling import _dsir_bucket, _dsir_grams, _dsir_tokened

    if df.filter(F.col(label_col).isNull()).limit(1).count():
        raise ValueError("nb_train: NULL %r labels in the training frame" % label_col)
    B = int(n_buckets)

    tdf = _dsir_tokened(df, [F.col(label_col)], text_col, tokenizer)
    counts = (
        tdf.select(
            F.col(label_col).alias("label"),
            F.explode(_dsir_grams(F.col("__t"))).alias("__g"),
        )
        .select("label", _dsir_bucket(F.col("__g"), B).alias("bucket"))
        .groupBy("label", "bucket")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)  # consumed by totals AND the spine join
    )
    totals = counts.groupBy("label").agg(F.sum("c").alias("total"))
    docs = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    # tiny frames: K rows each; the cross join below is K×B rows total
    priors = (
        docs.crossJoin(docs.agg(F.sum("n_docs").alias("__all")))
        .select(
            "label",
            F.round(F.log(F.col("n_docs") / F.col("__all")), 6).alias("logprior"),
        )
    )
    spine = priors.join(totals, "label", "left").crossJoin(
        spark.range(B).select(F.col("id").cast("int").alias("bucket"))
    )
    return (
        spine.join(counts, ["label", "bucket"], "left")
        .select(
            "label",
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.coalesce(F.col("total"), F.lit(0)) + B).cast("double")
                ),
                6,
            ).alias("logp"),
            "logprior",
        )
    )


def nb_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    tokenizer=None,
) -> DataFrame:
    """Classify every document: (id, n_grams, pred, score) where
    ``score`` = logprior(pred) + Σ_grams logp(pred, bucket) and ``pred``
    is the argmax class (ties broken by label ascending — deterministic
    cross-engine). Token-less docs are classified by priors alone.

    SQL twin of the argmax: rank per-doc per-label sums by
    (score DESC, label ASC) and keep rank 1.
    """
    from .sampling import _dsir_bucket, _dsir_grams, _dsir_tokened

    labels = model.select("label", "logprior").distinct()
    tdf = _dsir_tokened(df, [F.col(id_col)], text_col, tokenizer)
    g = tdf.select(
        F.col(id_col),
        F.explode_outer(_dsir_grams(F.col("__t"))).alias("__g"),
    ).select(F.col(id_col), _dsir_bucket(F.col("__g"), n_buckets).alias("bucket"))
    # gram × model fan-out (×K), then one (id, label) partial-agg sum;
    # the left join + crossJoin(labels) keeps gram-less docs in every class
    per_label = (
        g.join(F.broadcast(model.select("label", "bucket", "logp")), "bucket", "left")
        .groupBy(id_col, "label")
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(
                F.sum(F.col("logp").cast("decimal(18,6)")),
                F.lit(0).cast("decimal(28,6)"),
            ).alias("__s"),
        )
    )
    # gram-less docs aggregate under label NULL: expand them to all labels
    nulls = (
        per_label.filter(F.col("label").isNull())
        .drop("label")
        .crossJoin(F.broadcast(labels.select("label")))
    )
    scored = (
        per_label.filter(F.col("label").isNotNull())
        .unionByName(nulls)
        .join(F.broadcast(labels), "label")
        .select(
            F.col(id_col),
            "label",
            "n_grams",
            (F.col("__s") + F.col("logprior").cast("decimal(18,6)")).alias("score"),
        )
    )
    best = (
        scored.groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.min(F.struct((-F.col("score")).alias("ns"), F.col("label"))).alias("__b"),
        )
    )
    return best.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("__b.label").alias("pred"),
        (-F.col("__b.ns")).cast("double").alias("score"),
    )

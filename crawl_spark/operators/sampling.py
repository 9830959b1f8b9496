"""Deterministic corpus sampling / balancing operators.

Training-data pipelines rarely train on the raw crawl mix: they
down-sample over-represented strata (languages, sources) and cap the
page count any single domain may contribute (domain balancing — the
anti-SEO-farm rule). Both ops here are DETERMINISTIC — driven by md5 of
the row id, never rand() — so a re-run of the pipeline (or a resumed
round) selects the identical subset, and the DuckDB oracle can replay
the selection bit-for-bit.

Scale notes (100 TB corpus):
- ``hash_sample`` is a pure per-row filter: no shuffle, no state, fully
  pushed past the parquet scan's column pruning (only id + stratum are
  read if the caller selects them).
- ``domain_quota`` routes through ``grouped_topk`` (operators/topk.py):
  per-group top-k WITHOUT funneling a hot domain's entire slice through
  one window task — the same skew machinery the crawl engine uses for
  hot hosts.

md5 (not F.hash/murmur3) because the sampling decision is part of the
cross-engine contract: Spark, DuckDB, and Python agree on md5 bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_hex(id_col: Column) -> Column:
    """First 4 hex chars of md5(id) — a uniform 16-bit bucket in
    ['0000','ffff']. Fixed-width lowercase hex compares lexicographically
    == numerically, so thresholds are plain string compares (identical
    semantics in every engine, no hex→int conversion dialects)."""
    return F.substring(F.md5(id_col.cast("string")), 1, 4)


def rate_threshold(rate: float) -> str:
    """The threshold under which a 4-hex-char bucket is kept to sample
    ~``rate`` of rows: floor(rate · 2^16) zero-padded. rate=1.0 returns
    'g', which sorts after every hex bucket (the compare is
    LEXICOGRAPHIC on fixed-width hex — a 5-char '10000' would sort
    BEFORE 'ffff', not after)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0,1]")
    return "g" if rate >= 1.0 else "%04x" % int(rate * (1 << 16))


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic stratified down-sampling: keep a row iff its md5
    bucket falls under its stratum's rate threshold.

    ``rates`` maps stratum value → keep rate; strata not listed use
    ``default_rate``. Emits the surviving rows' (id, stratum, bucket).

    SQL twin: substr(md5(CAST(id AS VARCHAR)), 1, 4) compared against a
    CASE over the same thresholds.
    """
    rates = rates or {}
    bucket = _bucket_hex(F.col(id_col))
    thr: Column = F.lit(rate_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(rate_threshold(rate))
        ).otherwise(thr)
    return (
        df.select(F.col(id_col), F.col(strata_col), bucket.alias("bucket"))
        .filter(F.col("bucket") < thr)
    )


def domain_quota(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    quota: int = 10,
) -> DataFrame:
    """Cap each domain/source at ``quota`` documents, picking the kept
    subset deterministically (the ``quota`` smallest md5(id) per group —
    an unbiased uniform pick, stable across runs/engines).

    Exact per-group top-k via ``grouped_topk``: a domain with 10^8 pages
    is pruned partition-locally to ≤ P·quota candidates before the one
    bounded window — never a single task holding the whole hot group.

    SQL twin: row_number() OVER (PARTITION BY grp ORDER BY md5(id), id)
    ≤ quota.
    """
    from .topk import grouped_topk

    picked = grouped_topk(
        df.select(
            F.col(id_col),
            F.col(group_col),
            F.md5(F.col(id_col).cast("string")).alias("pick_hash"),
        ),
        [group_col],
        ["pick_hash", id_col],  # md5 collisions: id breaks ties exactly
        quota,
    )
    return picked.select(F.col(id_col), F.col(group_col), "pick_hash")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    streams: int = 64,
    tokenizer=None,
) -> DataFrame:
    """Assign documents to fixed-length training sequences (the standard
    pretraining packing step: concatenate docs, chunk every ``seq_len``
    tokens; docs may straddle a chunk boundary).

    A single global concatenation order is a SinglePartition window — the
    one plan shape this repo bans — so packing is SHARDED: each doc
    hashes to one of ``streams`` independent packing streams (md5-based,
    deterministic), and the concat order within a stream is
    (md5(id), id) — also deterministic, so a re-run or a different
    engine reproduces the exact same bins. Streams are independent by
    construction; set ``streams`` >= cluster parallelism and the window
    runs as ``streams`` bounded partition-local sorts. The ragged tail
    (one partially-filled final bin per stream) is the standard cost of
    sharded packing: bounded by streams · seq_len tokens TOTAL,
    negligible against any real corpus.

    Emits one row per doc: (id, stream, n_tokens, start_offset, bin) —
    ``start_offset`` is the token offset where the doc begins inside its
    stream's concatenation, ``bin = start_offset // seq_len`` the
    training-sequence index it starts in. Tokens = whitespace tokens by
    default; pass ``tokenizer=`` (textops.resolve_tokens hook, e.g.
    textops.BpeTokenizer) to pack in real tokenizer space, or rename a
    precomputed count column to ``__n_tokens`` (which wins over both).

    SQL twin: sum(n) OVER (PARTITION BY stream ORDER BY md5(id), id
    ROWS UNBOUNDED PRECEDING) - n.

    ``streams`` below the cluster's parallelism leaves cores idle during
    the per-stream sort (each stream is one window task) — warned, not
    raised, because the stream count is part of the packing's
    deterministic CONTRACT: silently rescaling it would change every
    (stream, bin) assignment on re-runs under a different cluster size.
    """
    from pyspark.sql import Window

    from .textops import resolve_tokens

    par = df.sparkSession.sparkContext.defaultParallelism
    if streams < par:
        import warnings

        warnings.warn(
            "pack_sequences(streams=%d) < defaultParallelism=%d: the "
            "packing windows will use only %d of %d cores. Raise "
            "`streams` (the ragged-tail cost is streams*seq_len tokens "
            "total) — but note stream count is part of the deterministic "
            "bin contract, so pick it per-corpus, not per-cluster."
            % (streams, par, streams, par),
            stacklevel=2,
        )
    if "__n_tokens" in df.columns:
        n_tok = F.col("__n_tokens")
    else:
        n_tok = F.size(resolve_tokens(F.col(text_col), tokenizer))
    pick = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col),
        F.pmod(
            F.conv(F.substring(pick, 1, 8), 16, 10).cast("long"), F.lit(streams)
        ).cast("int").alias("stream"),
        n_tok.cast("long").alias("n_tokens"),
        pick.alias("__pick"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("__pick", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        F.col(id_col),
        "stream",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / seq_len
        ).cast("long").alias("bin"),
    )


def shuffle_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    shards: int = 64,
) -> DataFrame:
    """Deterministic SEEDED global shuffle — the training-order
    randomization step every pretraining run performs between curation
    and the data loader (and again per epoch with a new seed).

    Emits one row per doc: ``(id, shard, pos)``. The global training
    order is shards ascending, then ``pos`` (1-based, dense) within the
    shard — a sharded writer emits file ``shard`` sorted by ``pos`` and
    the loader reads files in shard order. Because the permutation key
    is ``md5(seed ':' id)``, the order is (a) uniform, (b) reproducible
    bit-for-bit across runs and engines (resume/debug replays the exact
    batch sequence), and (c) re-seedable: a new ``seed`` yields an
    independent permutation for the next epoch without touching the
    data — unlike ``rand()``, which changes under partition layout.

    Scale shape (100 TB corpus): an exact GLOBAL rank would be a
    SinglePartition window — the one plan shape this repo bans — so the
    permutation is SHARDED exactly like :func:`pack_sequences`: docs
    hash to ``shards`` independent md5 buckets (uniform by construction
    — no hot key is possible), and each shard ranks locally in one
    bounded window task of ~N/shards rows. Set ``shards`` to at least
    the cluster parallelism; it is part of the deterministic contract
    (same warning semantics as ``pack_sequences``).

    SQL twin: row_number() OVER (PARTITION BY shard ORDER BY
    md5(seed ':' id), id).
    """
    from pyspark.sql import Window

    if shards < 1:
        raise ValueError("shuffle_corpus: shards must be >= 1")
    par = df.sparkSession.sparkContext.defaultParallelism
    if shards < par:
        import warnings

        warnings.warn(
            "shuffle_corpus(shards=%d) < defaultParallelism=%d: the "
            "per-shard rank windows will use only %d of %d cores. Raise "
            "`shards` — but note the shard count is part of the "
            "deterministic order contract, so pick it per-corpus, not "
            "per-cluster." % (shards, par, shards, par),
            stacklevel=2,
        )
    key = F.md5(
        F.concat_ws(":", F.lit(str(int(seed))), F.col(id_col).cast("string"))
    )
    base = df.select(
        F.col(id_col),
        F.pmod(
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), F.lit(shards)
        ).cast("int").alias("shard"),
        key.alias("__key"),
    )
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return base.select(
        F.col(id_col),
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# -- DSIR: hashed-n-gram importance resampling (data selection) -------------
# Xie et al., "Data Selection for Language Models via Importance
# Resampling" (NeurIPS 2023, arXiv:2302.03169 — public method): estimate
# how target-domain-like each raw document is by the log-likelihood
# ratio of its hashed n-gram features under a target vs a raw bag-of-
# ngrams model, then keep the highest-scoring fraction. This is the
# classifier-free data-selection step between the quality filters
# (textops.quality_score / gopher_repetition) and packing.
#
# Scale shape (100 TB raw corpus):
# - the feature space is FIXED at ``n_buckets`` hashed buckets, so the
#   learned weights are an O(n_buckets) table — broadcast, never
#   shuffled with the corpus;
# - weight fitting is two corpus aggregates (one shuffle each, partial
#   map-side combine on the bucket key; the target sample is small by
#   definition);
# - scoring is explode → broadcast-join → one groupBy(doc) sum: a
#   single shuffle on doc_id, no window, no driver loop;
# - selection routes through topk.ranked_topk (distributed global
#   top-k, never a single-partition ORDER BY).
#
# Cross-engine exactness: buckets are md5-derived (first 8 hex chars →
# int, the repo's hash contract); per-bucket log-ratios are rounded to
# 6dp and per-doc sums accumulate as DECIMAL(18,6) — order-independent,
# so Spark and DuckDB agree bit-for-bit.


def _dsir_tokened(df: DataFrame, cols: list[Column], text_col: str, tokenizer):
    """(cols…, __t tokens) with the token array materialized ONCE —
    the gram builder below references it three times (unigrams + two
    bigram slices) and Catalyst does not CSE nested HOFs (CLAUDE.md)."""
    from .textops import resolve_tokens

    return df.select(
        *cols, resolve_tokens(F.col(text_col), tokenizer).alias("__t")
    ).localCheckpoint(eager=False)


def _dsir_grams(tok_col: Column) -> Column:
    """Unigrams + space-joined bigrams (with multiplicity) of a
    MATERIALIZED token-array column. SQL twin: unnest(t) UNION ALL
    t[i] || ' ' || t[i+1] for i in range(1, len(t))."""
    n1 = F.greatest(F.size(tok_col) - 1, F.lit(0))
    bis = F.zip_with(
        F.slice(tok_col, 1, n1),
        F.slice(tok_col, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(tok_col, bis)


def _dsir_bucket(g: Column, n_buckets: int) -> Column:
    """md5-hash a gram into [0, n_buckets): first 8 hex chars as an
    integer, mod n_buckets. SQL twin:
    CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % n_buckets."""
    return (
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")


def _dsir_bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, tokenizer
) -> DataFrame:
    """Corpus-level (bucket, c) hashed-gram counts: one partial-agg
    groupBy on the bucket key — ≤ n_buckets result rows regardless of
    corpus size."""
    tdf = _dsir_tokened(df, [], text_col, tokenizer)
    return (
        tdf.select(
            F.explode(_dsir_grams(F.col("__t"))).alias("__g")
        )
        .select(_dsir_bucket(F.col("__g"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    tokenizer=None,
) -> DataFrame:
    """Fit the DSIR importance weights: per hash bucket b,
    log p_target(b) − log p_raw(b) under add-one-smoothed bag-of-ngram
    models. Returns the FULL (bucket, logratio) spine — exactly
    ``n_buckets`` rows, broadcastable by construction; buckets unseen
    in both corpora carry the smoothing-only prior ratio.

    ``target`` is the (small) target-domain sample, ``raw`` the corpus
    being scored (or any representative sample of it — the paper fits
    the raw model on a sample). Both count jobs are single partial-agg
    shuffles; the two totals come back in ONE 2-scalar driver read over
    the already-aggregated ≤ n_buckets-row frames.
    """
    spark = raw.sparkSession
    B = int(n_buckets)
    ct = _dsir_bucket_counts(target, text_col, B, tokenizer).localCheckpoint(
        eager=False
    )
    cr = _dsir_bucket_counts(raw, text_col, B, tokenizer).localCheckpoint(
        eager=False
    )
    # ONE driver action for both totals (the two 1-row aggregates cross-
    # join into a single job; the lazy checkpoints materialize inside it)
    tot = (
        ct.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("ts"))
        .crossJoin(cr.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("rs")))
        .collect()[0]
    )
    t_total, r_total = tot["ts"], tot["rs"]
    spine = spark.range(B).select(F.col("id").cast("int").alias("bucket"))
    ctt = ct.withColumnRenamed("c", "__ct")
    crr = cr.withColumnRenamed("c", "__cr")
    return (
        spine.join(ctt, "bucket", "left")
        .join(crr, "bucket", "left")
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + 1)
                    / F.lit(float(t_total + B))
                )
                - F.log(
                    (F.coalesce(F.col("__cr"), F.lit(0)) + 1)
                    / F.lit(float(r_total + B))
                ),
                6,
            ).alias("logratio"),
        )
    )


def dsir_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    tokenizer=None,
) -> DataFrame:
    """Score every document: sum of its hashed-gram log-ratios (higher
    = more target-like). Emits (id, n_grams, score); token-less docs
    keep a row with n_grams = 0, score = 0.

    One explode + broadcast weight join + one groupBy(id) shuffle; the
    per-doc sum accumulates 6dp DECIMALs (order-independent — the
    DuckDB twin is bit-identical). ``n_buckets`` must match the value
    the weights were fitted with (the join is on the bucket id).
    """
    tdf = _dsir_tokened(df, [F.col(id_col)], text_col, tokenizer)
    g = tdf.select(
        F.col(id_col),
        F.explode_outer(_dsir_grams(F.col("__t"))).alias("__g"),
    ).select(
        F.col(id_col), _dsir_bucket(F.col("__g"), n_buckets).alias("bucket")
    )
    return (
        g.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(
                F.sum(F.col("logratio").cast("decimal(18,6)")),
                F.lit(0).cast("decimal(28,6)"),
            )
            .cast("double")
            .alias("score"),
        )
    )


def dsir_select(
    df: DataFrame,
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    tokenizer=None,
) -> DataFrame:
    """Keep the k most-target-like documents: dsir_score →
    topk.ranked_topk on (−score, id) — the distributed exact global
    top-k (local prune to ≤ P·k rows, one bounded range shuffle; never
    a single-partition ORDER BY). Deterministic: id breaks score ties.
    """
    from .topk import ranked_topk

    scored = dsir_score(df, weights, id_col, text_col, n_buckets, tokenizer)
    ranked = scored.withColumn("__neg", -F.col("score"))
    return ranked_topk(ranked, ["__neg", id_col], k, pos_col="sel_rank").drop(
        "__neg"
    )


def lm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    tokenizer=None,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    arXiv:1911.00359 — public method): per-document negative
    log-likelihood under a reference-corpus bag-of-ngrams model, the
    "does this read like curated text" signal CCNet thresholds on
    (there with a KenLM; here with the same hashed unigram+bigram
    add-one-smoothed model DSIR uses — a documented proxy with the
    identical pipeline role, not a KenLM reimplementation).

    ``model`` is the (bucket, logp) table from :func:`lm_model`. Emits
    (id, n_grams, nll) where nll = −mean log p(gram) over the doc's
    hashed grams, 6dp — LOWER is more reference-like; docs with no
    grams get NULL nll (nothing to measure; CCNet drops empties
    upstream). Same plan shape as :func:`dsir_score`: one broadcast
    join + one partial-agg groupBy(doc); the per-doc sum accumulates
    6dp DECIMALs so the mean is order-independent and the DuckDB twin
    bit-identical.
    """
    tdf = _dsir_tokened(df, [F.col(id_col)], text_col, tokenizer)
    g = tdf.select(
        F.col(id_col),
        F.explode_outer(_dsir_grams(F.col("__t"))).alias("__g"),
    ).select(
        F.col(id_col), _dsir_bucket(F.col("__g"), n_buckets).alias("bucket")
    )
    return (
        g.join(F.broadcast(model), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.round(
                -F.sum(F.col("logp").cast("decimal(18,6)")).cast("double")
                / F.count("bucket"),
                6,
            ).alias("nll"),
        )
    )


def lm_model(
    reference: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    tokenizer=None,
) -> DataFrame:
    """Fit the reference bag-of-ngrams model for :func:`lm_score`:
    logp(b) = ln((count(b)+1) / (total+n_buckets)) per hashed bucket,
    6dp. Full ``n_buckets``-row spine (unseen buckets carry the
    smoothing floor), broadcastable by construction; one partial-agg
    count shuffle + a 1-scalar driver read."""
    spark = reference.sparkSession
    B = int(n_buckets)
    cnt = _dsir_bucket_counts(reference, text_col, B, tokenizer).localCheckpoint(
        eager=False
    )
    total = cnt.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("s")).collect()[0]["s"]
    spine = spark.range(B).select(F.col("id").cast("int").alias("bucket"))
    return spine.join(cnt, "bucket", "left").select(
        "bucket",
        F.round(
            F.log((F.coalesce(F.col("c"), F.lit(0)) + 1) / F.lit(float(total + B))),
            6,
        ).alias("logp"),
    )


def lm_buckets(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    sample_frac: float = 1.0,
    tokenizer=None,
) -> DataFrame:
    """CCNet's head/middle/tail partitioning (Wenzek et al. 2020): score
    every doc with :func:`lm_score` and split the corpus into perplexity
    terciles — "head" reads most like the reference corpus, "tail"
    least; CCNet trains on head+middle and publishes all three.

    Cutoffs are RANK-BASED, not interpolated: c1 = the ⌈n/3⌉-th smallest
    nll in the cutoff sample, c2 the ⌈2n/3⌉-th — values PRESENT in the
    data, so both cutoffs are engine-exact (interpolated quantiles
    differ across engines in the last ulp and can flip boundary docs).
    Assignment is nll ≤ c1 → head, ≤ c2 → middle, else tail; docs with
    no grams keep a row with NULL nll and NULL bucket (CCNet drops
    empties upstream).

    Plan shape at 100 TB: scoring is lm_score's broadcast join + one
    partial-agg groupBy; the cutoff sample is the deterministic
    md5-threshold filter (``sample_frac``, hash_sample's rule — at a
    10^10-doc corpus sample ~10^6 docs: tercile cutoff error is
    O(1/√sample), far below any downstream threshold), the two ranks
    come from ONE ``ranked_topk`` pass (local prune to ≤ P·k rows, one
    bounded shuffle — never a global ORDER BY), and the cutoffs return
    to the corpus as two literals. The scored frame is lazily
    checkpointed: it feeds the cutoff job AND the final projection.
    """
    from .topk import ranked_topk

    scored = lm_score(df, model, id_col, text_col, n_buckets, tokenizer)
    scored = scored.localCheckpoint(eager=False)
    sample = scored.filter(F.col("nll").isNotNull())
    if sample_frac < 1.0:
        sample = sample.filter(
            _bucket_hex(F.col(id_col)) < F.lit(rate_threshold(sample_frac))
        )
    n = sample.count()
    if n == 0:
        return scored.select(
            id_col, "n_grams", "nll", F.lit(None).cast("string").alias("bucket")
        )
    k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
    ranked = ranked_topk(sample.select("nll"), ["nll"], k2, pos_col="__r")
    cuts = ranked.agg(
        F.max(F.when(F.col("__r") <= k1, F.col("nll"))).alias("c1"),
        F.max("nll").alias("c2"),
    ).collect()[0]
    return scored.select(
        id_col,
        "n_grams",
        "nll",
        F.when(F.col("nll").isNull(), F.lit(None).cast("string"))
        .when(F.col("nll") <= cuts["c1"], F.lit("head"))
        .when(F.col("nll") <= cuts["c2"], F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# -- Temperature mixing: per-stratum resampling at share ∝ count^alpha ------
# The standard pretraining data-mix step (multilingual BERT / XLM-R
# exponential-smoothing sampling, The Pile per-source weights — public
# methods): strata (languages, sources) contribute to the training set
# at a share proportional to count^alpha rather than raw count, lifting
# the tail without letting the head (English, big SEO domains) dominate.
# alpha=1 reproduces the corpus mix, alpha=0 a uniform per-stratum mix.
#
# Scale shape (100 TB corpus): the per-stratum counts are ONE partial-agg
# groupBy whose result is O(|strata|) — a driver-tiny table; the rates
# derived from it broadcast back onto the corpus, and selection is a pure
# per-row md5-threshold filter (hash_sample's machinery) — the corpus
# itself never shuffles.
#
# Cross-engine exactness: every arithmetic step is either exact integer /
# DECIMAL math or an IEEE-correctly-rounded double primitive (sqrt, *, /;
# never libm pow on the default path), the stratum weight sum accumulates
# as DECIMAL (order-independent), and the final keep threshold scales by
# 65536 — a power of two, exact in binary floating point — so Spark,
# DuckDB and Python agree on every kept row bit-for-bit. alpha != 0.5
# uses pow(), which is not correctly rounded by IEEE; the 6dp round
# before the DECIMAL cast makes a cross-libm flip astronomically
# unlikely, but only the sqrt default is *guaranteed* exact.


def mix_rates(
    df: DataFrame,
    group_col: str = "lang",
    budget: int = 1000,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-stratum temperature-mix acceptance thresholds.

    Returns one row per stratum: (group, n_docs, thr) where ``thr`` in
    [0, 65536] is the 16-bit md5-bucket cutoff under which a doc is
    kept. Derivation: w_g = round(n_g^alpha, 6) as DECIMAL(18,6);
    W = Σ w_g (DECIMAL, order-independent); keep rate
    r_g = min(1, budget·w_g / W / n_g) — i.e. the stratum's share of
    ``budget`` docs, capped at keeping everything (no up-sampling) —
    and thr = floor(65536·r_g).

    SQL twin: the same CTE chain over GROUP BY + a scalar total; see
    the ``domain_mix`` oracle in __spark_entry__.
    """
    cnt = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    w_raw = (
        F.sqrt(F.col("n_docs"))
        if alpha == 0.5
        else F.pow(F.col("n_docs"), F.lit(float(alpha)))
    )
    weighted = cnt.select(
        group_col,
        "n_docs",
        F.round(w_raw, 6).cast("decimal(18,6)").alias("__w"),
    )
    # ONE bounded driver read (1 row, exact DECIMAL) for the weight
    # total, the dsir_weights precedent — a crossJoin with an aggregate
    # over the same lineage trips Spark 4's hidden-attribute resolution
    # (AMBIGUOUS_REFERENCE on __w even when the agg branch re-aliases).
    # float(Decimal) is correctly rounded, matching the SQL twin's
    # CAST(sum(wv) AS DOUBLE).
    weighted = weighted.localCheckpoint(eager=False)
    w_total = weighted.agg(F.sum("__w").alias("__W")).collect()[0]["__W"]
    if w_total is None:
        # empty input: no strata exist — the (empty) frame types through
        return weighted.select(
            group_col, "n_docs", F.lit(0).cast("int").alias("thr")
        )
    rate = F.least(
        (F.lit(float(budget)) * F.col("__w").cast("double"))
        / F.lit(float(w_total))
        / F.col("n_docs").cast("double"),
        F.lit(1.0),
    )
    return weighted.select(
        group_col,
        "n_docs",
        F.floor(F.lit(65536.0) * rate).cast("int").alias("thr"),
    )


def mix_domains(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "lang",
    budget: int = 1000,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-mixed deterministic resampling: keep ~``budget`` docs
    with per-stratum shares ∝ count^alpha (see :func:`mix_rates`).

    Emits the kept rows' (id, group, bucket, thr) — ``bucket`` is the
    16-bit md5(id) value, kept iff bucket < the stratum's thr, so the
    selection replays identically on re-runs and in the DuckDB twin.
    One tiny-groupBy + broadcast-join + per-row filter; no corpus
    shuffle.
    """
    rates = mix_rates(df, group_col, budget, alpha)
    bucket = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
        )
        .cast("int")
        .alias("bucket")
    )
    return (
        df.select(F.col(id_col), F.col(group_col), bucket)
        .join(F.broadcast(rates.select(group_col, "thr")), group_col)
        .filter(F.col("bucket") < F.col("thr"))
        .select(F.col(id_col), F.col(group_col), "bucket", "thr")
    )


def epoch_mix(
    df: DataFrame,
    epochs: dict[str, float],
    id_col: str = "doc_id",
    group_col: str = "lang",
    default_epochs: float = 1.0,
) -> DataFrame:
    """Fractional-epoch UP-sampling by stratum — the data-mix schedule
    role (GPT-3 tab. 2.2's per-dataset epoch counts, FineWeb-Edu /
    Llama-style quality-bucket upweighting): a stratum scheduled for
    2.5 epochs emits every doc twice plus a deterministic half of the
    docs a third time.

    ``epochs`` maps group value → epochs ≥ 0 (groups absent from the
    map get ``default_epochs``). Per doc: ``copies = floor(e)`` plus
    one more iff the doc's 16-bit md5 bucket falls under the
    fractional part's :func:`rate_threshold` — so the extra-copy
    subset is the same on re-runs, across engines, and NESTED across
    schedules (e=2.3's extra docs ⊂ e=2.7's). Emits one row per copy:
    (id, group, bucket, epoch) with epoch = 1..copies; e < 1 strata
    are down-sampled (epoch_mix generalizes :func:`hash_sample`).

    Scale: the schedule is a dimension-sized broadcast; copies
    materialize as one map-side ``explode(sequence(...))`` — no
    shuffle, no RNG, output exactly Σ_g copies_g(doc) rows.

    SQL twin: the same spec as a VALUES join + generate_series — see
    the ``epoch_mix`` oracle in __spark_entry__.
    """
    spark = df.sparkSession
    for g, e in epochs.items():
        if e < 0:
            raise ValueError(f"epochs[{g!r}] must be >= 0, got {e}")
    if default_epochs < 0:
        raise ValueError(f"default_epochs must be >= 0, got {default_epochs}")

    def _split(e: float) -> tuple[int, str]:
        n_full = int(e)
        return n_full, rate_threshold(e - n_full)

    spec_rows = [(g, *_split(e)) for g, e in sorted(epochs.items())]
    spec = spark.createDataFrame(
        spec_rows, f"{group_col} string, n_full int, thr string"
    )
    dn, dthr = _split(default_epochs)
    copies = (
        F.coalesce(F.col("n_full"), F.lit(dn))
        + (
            F.col("bucket")
            < F.coalesce(F.col("thr"), F.lit(dthr))
        ).cast("int")
    ).alias("copies")
    based = (
        df.select(
            F.col(id_col),
            F.col(group_col),
            _bucket_hex(F.col(id_col)).alias("bucket"),
        )
        .join(F.broadcast(spec), group_col, "left")
        .select(id_col, group_col, "bucket", copies)
        .filter(F.col("copies") >= 1)
    )
    return based.select(
        id_col,
        group_col,
        "bucket",
        F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("epoch"),
    )


def domain_reputation(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
    min_docs: int = 5,
    dup_ratio_max: float = 0.5,
    short_frac_max: float = 0.5,
    short_tokens: int = 10,
) -> DataFrame:
    """Per-domain reputation scoring — the host-level curation gate
    RefinedWeb/DCLM-style pipelines run BEFORE per-document filtering:
    a domain whose pages are mostly copies of each other (SEO farms,
    mirror hosts) or mostly near-empty stubs is dropped wholesale,
    which is both cheaper and higher-precision than judging its pages
    one by one.

    Signals per domain, from TWO partial-aggregated groupBys (text
    never shuffles — level 1 groups on (domain, 16-byte content
    digest) carrying only counts):

    - ``n_docs``      — documents from the domain;
    - ``dup_ratio``   — 1 − distinct-content/n_docs (exact-dup mass);
    - ``max_copies``  — the single most-duplicated page's count;
    - ``short_frac``  — fraction of docs under ``short_tokens`` tokens;
    - ``mean_tokens`` — mean whitespace-token count;
    - ``keep``        — False iff ``n_docs >= min_docs`` AND
      (``dup_ratio >= dup_ratio_max`` OR ``short_frac >=
      short_frac_max``); small domains pass (no evidence either way).

    The digest is md5 of the same lowercased ws-collapsed
    normalization :func:`~crawl_spark.operators.dedup.exact_dedup`
    keys on, so "duplicate" means the same thing across the pipeline.
    Output is dimension-sized (one row per domain) — gate the corpus
    with a broadcast join on ``group_col``. Ratios round(·,6).
    """
    from .textops import tokens

    # token array materialized ONCE (lazy checkpoint): the digest and
    # the count both reference it, and Catalyst does not CSE nested
    # HOFs (CLAUDE.md) — inlined, tokenization would run 2× per row
    tokd = df.select(
        F.col(group_col).alias("grp"),
        tokens(F.col(text_col)).alias("__t"),
    ).localCheckpoint(eager=False)
    per_doc = tokd.select(
        "grp",
        F.md5(F.concat_ws(" ", F.col("__t"))).alias("content_md5"),
        F.size(F.col("__t")).cast("long").alias("n_tok"),
    ).select(
        "grp",
        "content_md5",
        "n_tok",
        (F.col("n_tok") < short_tokens).cast("long").alias("is_short"),
    )
    g1 = per_doc.groupBy("grp", "content_md5").agg(
        F.count("*").alias("cnt"),
        F.sum("is_short").alias("ns"),
        F.sum("n_tok").alias("st"),
    )
    g2 = g1.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("cnt").cast("long").alias("max_copies"),
        F.sum("ns").alias("n_short"),
        F.sum("st").alias("sum_tok"),
    )
    dup_ratio = 1 - F.col("n_distinct") / F.col("n_docs")
    short_frac = F.col("n_short") / F.col("n_docs")
    return g2.select(
        F.col("grp").alias(group_col),
        "n_docs",
        F.round(dup_ratio, 6).alias("dup_ratio"),
        "max_copies",
        F.round(short_frac, 6).alias("short_frac"),
        F.round(F.col("sum_tok") / F.col("n_docs"), 6).alias("mean_tokens"),
        (
            ~(
                (F.col("n_docs") >= min_docs)
                & (
                    (dup_ratio >= dup_ratio_max)
                    | (short_frac >= short_frac_max)
                )
            )
        ).alias("keep"),
    )


def leak_safe_split(
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    valid_rate: float = 0.1,
) -> DataFrame:
    """Leakage-safe train/validation split: the unit of assignment is
    the NEAR-DUP CLUSTER, not the document, so no held-out document has
    a near-duplicate in train (the eval-contamination failure mode
    document-level random splits cannot avoid — splitting after dedup
    still leaks when dedup keeps >1 member per cluster, e.g. threshold
    tuning or per-shard dedup).

    Input is any (id, cluster_id) frame —
    :func:`~crawl_spark.operators.dedup.neardup_clusters` or
    :func:`~crawl_spark.operators.similarity.semdedup` output directly;
    singletons arrive as their own cluster there, so every doc is
    covered. The split is the module's deterministic md5-bucket rule
    (:func:`hash_sample`'s threshold semantics) applied to the CLUSTER
    id: a pure projection — no shuffle, no RNG, stable across runs and
    engines, and cluster-consistent by construction.
    """
    thr = rate_threshold(valid_rate)
    bucket = _bucket_hex(F.col(cluster_col))
    return clusters.select(
        F.col(id_col),
        F.col(cluster_col),
        F.when(bucket < F.lit(thr), F.lit("valid"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    strata: tuple[str, ...] = (),
) -> DataFrame:
    """Weight-proportional sampling WITHOUT replacement (k per stratum,
    or k global when ``strata`` is empty) by sequential Poisson
    sampling (Ohlsson 1998, the πps design behind e.g. price-index
    surveys): each row gets priority ``u / w`` — ``u`` a deterministic
    md5 uniform, ``w`` its weight — and the k SMALLEST priorities win.
    Heavier rows draw proportionally smaller priorities, so inclusion
    probability ≈ w / Σw without ever materializing Σw (no extra pass,
    no broadcast of a normalizer).

    Chosen over the Efraimidis-Spirakis exponential key ``u^(1/w)``
    deliberately: that key needs libm ``pow``/``log``, whose last-ulp
    bits differ between the JVM and C runtimes — and a selection
    BOUNDARY must be bit-exact cross-engine, not round(·,6)-close.
    Here ``u = (md5_52bits + 1) / 2^52`` is exact (power-of-two
    division of a ≤52-bit integer), and ``u / w`` is one IEEE-754
    division — correctly rounded to identical bits on every engine, so
    the DuckDB oracle replays the exact selected set. Ties (only
    possible via identical (u, w)) break on id.

    Rows with NULL, NaN, or non-positive weight are dropped — they
    have no well-defined inclusion probability; NaN is gated
    explicitly because Spark orders NaN ABOVE all numbers (a bare
    ``w > 0`` would keep it). NULL ids are dropped too: a NULL id
    hashes to a NULL priority, which Spark's ascending top-k would
    order FIRST (winning selection) while SQL's NULLS LAST loses it —
    no identity, no seat.

    Scale shape: one codegen projection (md5 + two divisions), then
    the repo's bounded top-k machinery — ``grouped_topk`` per stratum
    (partition-local prune, no hot-stratum window funnel) or global
    ``ranked_topk``. The weight column is the only data beyond id +
    strata that crosses the wire.

    Output: ``(*strata, id, weight, sel_key)`` with ``sel_key`` the
    priority rounded to 6 dp (the repo's float-hash rule; ranking uses
    full precision internally).
    """
    if k <= 0:
        raise ValueError("weighted_sample: k must be positive")
    sc = [f.name for f in df.schema.fields]
    for c in (weight_col, id_col, *strata):
        if c not in sc:
            raise ValueError(f"weighted_sample: column not in df: {c}")
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        + F.lit(1)
    ).cast("double") / F.lit(float(1 << 52))
    base = (
        df.where(
            F.col(id_col).isNotNull() & w.isNotNull() & ~F.isnan(w) & (w > 0)
        )
        .select(
            *strata,
            F.col(id_col),
            w.alias("__w"),
            (u / w).alias("__key"),
        )
    )
    if strata:
        from .topk import grouped_topk

        picked = grouped_topk(base, list(strata), ["__key", id_col], k)
    else:
        from .topk import ranked_topk

        picked = ranked_topk(base, ["__key", id_col], k, pos_col="__pos").drop(
            "__pos"
        )
    return picked.select(
        *strata,
        F.col(id_col),
        F.round("__w", 6).alias("weight"),
        F.round("__key", 6).alias("sel_key"),
    )


def weighted_sample_oracle_sql(
    inner_sql: str,
    k: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    strata: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`weighted_sample`: identical md5 uniform,
    identical single-division priority (bit-exact — no libm), the same
    (priority, id) order, row_number ≤ k."""
    part = ("PARTITION BY " + ", ".join(strata)) if strata else ""
    sel = (", ".join(strata) + ",") if strata else ""
    return f"""
WITH x AS ({inner_sql}),
keyed AS (
  SELECT {sel} {id_col},
         CAST({weight_col} AS DOUBLE) AS w,
         (CAST(CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 13)
               AS BIGINT) + 1 AS DOUBLE) / 4503599627370496.0)
           / CAST({weight_col} AS DOUBLE) AS key
  FROM x
  WHERE {id_col} IS NOT NULL
    AND {weight_col} IS NOT NULL
    AND NOT isnan(CAST({weight_col} AS DOUBLE))
    AND CAST({weight_col} AS DOUBLE) > 0
),
ranked AS (
  SELECT *, row_number() OVER ({part} ORDER BY key, {id_col}) AS rn
  FROM keyed
)
SELECT {sel} {id_col}, round(w, 6) AS weight, round(key, 6) AS sel_key
FROM ranked WHERE rn <= {k}
"""

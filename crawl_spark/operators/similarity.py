"""Similarity search over an embedding column (array<float>).

Three tiers, all built-in column expressions (no UDFs — `F.zip_with` +
`F.aggregate` keep the dot product inside codegen):

- brute_force_topk: exact cosine top-k (the correctness baseline; cross
  join — only for bounded query sets / verification).
- ivf_assign / ivf_topk: IVF coarse quantization — assign every vector
  to its nearest centroid once, then probe only `nprobe` centroid lists
  per query.  At 10^9 vectors this turns a full scan per query into
  nprobe/ncentroids of the corpus, and the assign step is a broadcast
  join (centroid set is small by construction).
- simhash_sign_buckets: random-hyperplane LSH (sign bits vs fixed
  deterministic pseudo-hyperplanes) for near-dup blocking.
- pq_encode / pq_topk: product quantization (Jégou et al.) — vectors
  compressed to m sub-codes, candidates scored by integer
  distance-table lookups (ADC), optional exact full-dim re-rank; the
  >10^9-vector memory path.

Float contract (matches the DuckDB oracle): embeddings are cast
float→double elementwise, dot products accumulate in index order, and
cosines are rounded to 6dp before any ordering/filtering, with id as the
tiebreak — so top-k selection is bit-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .topk import grouped_topk


def _vecd(c: Column) -> Column:
    return c.cast("array<double>")


def _checked_vec(vec_col: str, dim: int, id_col: str) -> Column:
    """array<double> vector that FAILS LOUDLY on mis-sized rows.

    Without the guard, ``F.slice`` returns short arrays for a
    wrong-length embedding, ``zip_with`` NULL-pads, the micro-distance
    goes NULL and the packed argmin yields NULL codes — silently wrong
    results. A per-row ``size() == dim`` check is O(1) and matches the
    strictness of ``_collect_codebooks``'s missing-code error."""
    v = _vecd(F.col(vec_col))
    return F.when(F.size(v) == dim, v).otherwise(
        F.raise_error(
            F.concat(
                F.lit("pq: size(%s) != dim=%d at %s=" % (vec_col, dim, id_col)),
                F.col(id_col).cast("string"),
            )
        )
    )


def dot(a: Column, b: Column) -> Column:
    """Index-ordered dot product (deterministic fp accumulation)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return F.round(dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))), 6)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (baseline / verifier).

    `queries` must be small (it is broadcast); every (query, vector)
    cosine is computed in one codegen stage, then a per-query window
    keeps the top k with (cos desc, id asc) deterministic ordering.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _vecd(F.col(vec_col)).alias("qv")
    )
    v = vectors.select(F.col(id_col).alias("nbr_id"), _vecd(F.col(vec_col)).alias("vv"))
    scored = (
        F.broadcast(q)
        .crossJoin(v)
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", cosine(F.col("qv"), F.col("vv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cos")
    )


def _default_centroids(
    vectors: DataFrame, centroid_mod: int, id_col: str, vec_col: str
) -> DataFrame:
    """The deterministic id-subset codebook (the SQL-oracle path)."""
    return vectors.filter(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("centroid_id"), _vecd(F.col(vec_col)).alias("cv")
    )


def assign_to_centroids(v: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest-centroid (cosine argmax) per vector; centroids broadcast."""
    scored = v.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        "centroid_id",
        cosine(F.col("vv"), F.col("cv")).alias("cos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), "centroid_id", F.col("cos").alias("centroid_cos"))
    )


def kmeans_iteration(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd step: assign every vector to its nearest centroid
    (broadcast join — no shuffle of the corpus), then recompute each
    centroid as the elementwise mean of its members.

    The mean is a partial-aggregated groupBy over exploded (centroid,
    dim) pairs — the shuffle carries k·dim partial sums, never vectors.
    Returns (centroid_id, cv, n_members); empty cells drop out.
    """
    v = vectors.select(F.col(id_col), _vecd(F.col(vec_col)).alias("vv"))
    assigned = assign_to_centroids(v, centroids, id_col).select(id_col, "centroid_id")
    members = assigned.join(v, id_col)
    means = (
        members.select("centroid_id", F.posexplode("vv").alias("pos", "val"))
        .groupBy("centroid_id", "pos")
        .agg(F.avg("val").alias("val"), F.count("*").alias("n"))
        .groupBy("centroid_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))),
                lambda s: s["val"],
            ).alias("cv"),
            F.max("n").alias("n_members"),
        )
    )
    return means


def suggest_ivf_cells(n_vectors: int) -> int:
    """Cell-count rule of thumb: k ≈ √N, clamped to [16, 65536].

    √N balances the two costs a probe pays: the broadcast centroid
    argmax is O(k) per vector and each probed list holds ~N/k vectors,
    so total per-query work ~ k + nprobe·N/k, minimized at k ≈ √(nprobe·N).
    (The classic IVF sizing guidance, e.g. the public FAISS docs'
    ``nlist ≈ sqrt(N)``.) The 65536 cap keeps the codebook
    driver/broadcast-tiny (64k × dim doubles); past 10^10 vectors use a
    two-level coarse quantizer instead of pushing k higher.
    """
    import math

    return max(16, min(1 << 16, int(math.sqrt(max(n_vectors, 1)))))


def train_ivf_centroids(
    vectors: DataFrame,
    k: int | None = 64,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic spherical k-means codebook for IVF.

    Init: the k vectors with smallest md5(id) — a reproducible pseudo-
    random spread (no RNG, so training is replayable bit-for-bit).
    Each iteration runs one ``kmeans_iteration``; the k·dim codebook is
    collected to the driver between steps (tiny) and re-broadcast.
    Empty cells keep their previous centroid so k never shrinks.

    ``k=None`` auto-sizes the codebook as :func:`suggest_ivf_cells`
    (≈ √N — one count job). The explicit default 64 is a FIXTURE-scale
    number (√N for the ~4k-vector test tables); size by corpus, not by
    habit, when calling at scale.
    """
    spark = vectors.sparkSession
    if k is None:
        k = suggest_ivf_cells(vectors.count())
    seeds = (
        vectors.select(F.col(id_col), _vecd(F.col(vec_col)).alias("cv"))
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(k)
    )
    cents = {
        i: row.cv for i, row in enumerate(seeds.collect())
    }  # centroid_id -> vector (k × dim doubles: driver-tiny)
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(cid, list(cv)) for cid, cv in sorted(cents.items())],
            "centroid_id long, cv array<double>",
        )
        new = {
            row.centroid_id: list(row.cv)
            for row in kmeans_iteration(
                vectors, cdf, id_col, vec_col
            ).collect()
        }
        cents.update(new)  # empty cells keep the previous centroid
    return spark.createDataFrame(
        [(cid, list(cv)) for cid, cv in sorted(cents.items())],
        "centroid_id long, cv array<double>",
    )


def ivf_assign(
    vectors: DataFrame,
    centroid_mod: int = 41,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Assign each vector to its nearest coarse centroid (by cosine).

    ``centroids`` (centroid_id, cv) is a trained codebook from
    ``train_ivf_centroids``; when omitted, the deterministic subset
    id % centroid_mod == 0 stands in (the exact-SQL-oracle path).
    Broadcast the centroid set; argmax via window.
    """
    cents = (
        centroids
        if centroids is not None
        else _default_centroids(vectors, centroid_mod, id_col, vec_col)
    )
    v = vectors.select(F.col(id_col), _vecd(F.col(vec_col)).alias("vv"))
    return assign_to_centroids(v, cents, id_col)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    centroid_mod: int = 41,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    shortlist_dims: int | None = None,
    shortlist_mult: int = 4,
) -> DataFrame:
    """IVF approximate top-k: search only the nprobe nearest centroid
    lists per query.  Join keys are centroid ids — the corpus is scanned
    once for assignment and thereafter only touched per probed list.
    Pass a trained ``centroids`` codebook for real recall; the default
    id-subset codebook is the deterministic oracle path.

    Two-stage re-rank (``shortlist_dims``): score every probed
    candidate with a CHEAP truncated-dimension cosine first (the IVF-PQ
    ADC analog — ``shortlist_dims`` of ``dim`` flops per candidate),
    keep the best ``k·shortlist_mult`` per query, then exact-re-rank
    only the shortlist at full dimension. Cuts the full-dim scoring
    from O(probed candidates) to O(k·mult) per query; the compute win
    assumes leading dimensions carry signal (PCA-rotated or
    front-loaded embeddings — the standard layout for truncatable
    vectors). Shortlist slots are per candidate ROW, so a neighbor
    reached via two probes occupies two slots — ``shortlist_mult``
    ≥ 2·nprobe keeps that crowding negligible. Exact scores, possibly
    reduced recall vs the plain path when the truncated scores misrank
    (raise ``shortlist_dims``/``shortlist_mult`` to converge on it —
    with ``shortlist_dims >= dim`` the shortlist ordering equals the
    exact ordering, so results match the plain path exactly)."""
    cents = (
        centroids
        if centroids is not None
        else _default_centroids(vectors, centroid_mod, id_col, vec_col)
    )
    assign = ivf_assign(vectors, centroid_mod, id_col, vec_col, centroids=cents)
    q = queries.select(F.col(id_col).alias("query_id"), _vecd(F.col(vec_col)).alias("qv"))
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "centroid_id", cosine(F.col("qv"), F.col("cv")).alias("ccos")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("centroid_id"))
    probes = qc.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe).select(
        "query_id", "qv", "centroid_id"
    )
    v = vectors.select(F.col(id_col).alias("nbr_id"), _vecd(F.col(vec_col)).alias("vv"))
    lists = assign.join(v, assign[id_col] == F.col("nbr_id")).select("centroid_id", "nbr_id", "vv")
    cand = probes.join(lists, "centroid_id").filter(
        F.col("query_id") != F.col("nbr_id")
    )
    if shortlist_dims is not None:
        # per-query shortlist via grouped_topk, NOT a bare window: the
        # probed candidate set is bounded (~nprobe·N/ncells) but under
        # adversarial query counts / hot cells a partitionBy(query_id)
        # window funnels a query's whole candidate list into one task;
        # grouped_topk local-prunes to ≤ P·(k·mult) rows per query first
        # (topk.py — key (−scos, nbr_id) is unique per query, and the
        # input recomputes deterministically from the checkpointed
        # query frame + the corpus scan, its documented contract).
        cand = grouped_topk(
            cand.withColumn(
                "__negscos",
                -cosine(
                    F.slice(F.col("qv"), 1, shortlist_dims),
                    F.slice(F.col("vv"), 1, shortlist_dims),
                ),
            ),
            ["query_id"],
            ["__negscos", "nbr_id"],
            k * shortlist_mult,
        ).drop("__negscos")
    scored = (
        cand.select("query_id", "nbr_id", cosine(F.col("qv"), F.col("vv")).alias("cos"))
        .groupBy("query_id", "nbr_id")
        .agg(F.max("cos").alias("cos"))  # a nbr can appear via 2 probes
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cos")
    )


def _hyperplane_signs(n_bits: int, dim: int) -> list[list[float]]:
    """±1 pseudo-hyperplanes from md5 parity — deterministic and
    engine-portable (DuckDB derives the identical planes from the same
    md5 strings), so the LSH is oracle-checkable."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(("%d_%d" % (j, d)).encode()).hexdigest()[0], 16) < 8
            else -1.0
            for d in range(dim)
        ]
        for j in range(n_bits)
    ]


def simhash_sign_buckets(
    vectors: DataFrame,
    n_bits: int = 16,
    dim: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = the n_bits sign bits of the
    vector against fixed pseudo-hyperplanes (sign of ⟨v, h_j⟩).

    Cosine-similar vectors agree on each bit with probability
    1 − θ/π, so near-duplicates collide in the same bucket — the
    embedding analog of MinHash banding, and the second (non-IVF) ANN
    blocking path. Hyperplanes are ±1 literals baked into the plan
    (row-independent — never recomputed per row); each bit is one
    zip_with/aggregate dot product in codegen. The dot is rounded to
    6dp before the sign so the bucket string is bit-stable across
    engines (the module's float contract)."""
    signs = _hyperplane_signs(n_bits, dim)
    v = _vecd(F.col(vec_col))
    bits = [
        F.when(
            F.round(dot(v, F.array(*[F.lit(s) for s in signs[j]])), 6) >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for j in range(n_bits)
    ]
    return vectors.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def signbit_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.99,
    n_bits: int = 16,
    dim: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs blocked by sign-bucket LSH (candidate-then-verify):
    only same-bucket pairs pay the exact cosine — O(Σ bucket²), the
    LSH twin of the IVF-blocked ``embedding_neardup_pairs``."""
    b = simhash_sign_buckets(vectors, n_bits, dim, id_col, vec_col)
    v = vectors.select(F.col(id_col), _vecd(F.col(vec_col)).alias("vv"))
    bv = b.join(v, id_col)
    a = bv.select(F.col(id_col).alias("id_a"), "bucket", F.col("vv").alias("va"))
    c = bv.select(F.col(id_col).alias("id_b"), "bucket", F.col("vv").alias("vb"))
    return (
        a.join(c, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.99,
    centroid_mod: int = 41,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    max_cell: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by IVF cell.

    Pairs are only compared within a coarse cell (same blocking idea as
    MinHash bands) — O(sum of cell²) not O(n²); recall is bounded by the
    quantizer (train the codebook for tighter cells), the standard
    scale/quality trade.

    Hot-cell guard (round 5): one degenerate cell (untrained codebook,
    duplicate-heavy corpus) makes cell² explode INSIDE A SINGLE JOIN
    KEY — same-shape tasks as the banned single-partition window. Cell
    sizes are counted in one aggregate over the (already materialized)
    assignment; any cell above ``max_cell`` triggers a loud warning and
    an EXACT triangle salt-split: rows get ``salt = hash(id) mod S``
    (S = ⌈n/max_cell⌉) and each unordered sub-block pair (i ≤ j) is
    joined once — left replicas carry keys (salt, j≥salt), right
    replicas (i≤salt, salt), so every intra-cell pair is compared
    exactly once (i == j dedups by id order; i < j appears in exactly
    one block) while per-key work drops from n² to ~(n/S)². Total pair
    count is unchanged (exactness); only the skew is defused. The
    fast path (no hot cells) keeps the round-4 plan shape unchanged."""
    assign = ivf_assign(
        vectors, centroid_mod, id_col, vec_col, centroids=centroids
    ).select(F.col(id_col), "centroid_id")
    v = vectors.select(F.col(id_col), _vecd(F.col(vec_col)).alias("vv"))
    # lazy-checkpoint the assigned corpus: the size probe + BOTH sides
    # of the self-join read it (the round-4 path recomputed the
    # window-argmax assignment once per side).
    av = assign.join(v, id_col).localCheckpoint(eager=False)
    # ≤ |codebook| rows to the driver (codebooks are ≤ 65536 cells).
    hot = {
        r["centroid_id"]: r["__n"]
        for r in av.groupBy("centroid_id")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > max_cell)
        .collect()
    }
    if not hot:
        a = av.select(F.col(id_col).alias("id_a"), F.col("centroid_id"), F.col("vv").alias("va"))
        b = av.select(F.col(id_col).alias("id_b"), F.col("centroid_id"), F.col("vv").alias("vb"))
        return (
            a.join(b, ["centroid_id"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
            .filter(F.col("cos") >= threshold)
        )

    import math
    import warnings

    worst = max(hot.values())
    warnings.warn(
        "embedding_neardup_pairs: %d cell(s) exceed max_cell=%d (largest=%d"
        " rows → %d² intra-cell pairs in one join key); salt-splitting"
        " those cells (exact). Train the codebook for tighter cells."
        % (len(hot), max_cell, worst, worst),
        stacklevel=2,
    )
    sdf = vectors.sparkSession.createDataFrame(
        [(int(cid), int(math.ceil(n / max_cell))) for cid, n in sorted(hot.items())],
        "centroid_id long, __S int",
    )
    salted = (
        av.join(F.broadcast(sdf), "centroid_id", "left")
        .withColumn("__S", F.coalesce(F.col("__S"), F.lit(1)))
        .withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.col("__S")).cast("int")
        )
    )
    left = salted.select(
        F.col(id_col).alias("id_a"),
        "centroid_id",
        F.col("vv").alias("va"),
        F.col("__salt").alias("__i"),
        F.explode(F.sequence(F.col("__salt"), F.col("__S") - 1)).alias("__j"),
    )
    right = salted.select(
        F.col(id_col).alias("id_b"),
        "centroid_id",
        F.col("vv").alias("vb"),
        F.explode(F.sequence(F.lit(0), F.col("__salt"))).alias("__i"),
        F.col("__salt").alias("__j"),
    )
    return (
        left.join(right, ["centroid_id", "__i", "__j"])
        .filter((F.col("__i") != F.col("__j")) | (F.col("id_a") < F.col("id_b")))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            cosine(F.col("va"), F.col("vb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semdedup(
    vectors: DataFrame,
    threshold: float = 0.99,
    centroid_mod: int = 41,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    max_cell: int = 100_000,
    max_iter: int = 25,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540 — public method): k-means-cluster the embedding
    space, mark cosine-near pairs WITHIN each cluster as semantic
    duplicates, and keep one canonical document per duplicate group.
    The paper's point is that web-scale corpora carry large volumes of
    *semantically* redundant text that lexical dedup (MinHash/simhash)
    never sees; pruning it improves training efficiency.

    Composition of the module's scale machinery, no new join shapes:

    - clustering + within-cluster pairs = :func:`embedding_neardup_pairs`
      (IVF cells ARE the paper's k-means clusters; O(sum cell²) not
      O(n²), hot-cell salt-split guard included). Pass a trained
      ``centroids`` frame (``train_ivf_centroids``) for paper-faithful
      clusters; the deterministic modular codebook is the test default.
    - duplicate groups = :func:`~crawl_spark.operators.graph.
      connected_components` over the pair graph (A~B, B~C collapse to
      ONE kept doc — min-label, O(pairs) per round, bounded by group
      diameter; near-dup groups are shallow).
    - canonical survivor = min id per component (deterministic, no RNG
      — the paper keeps a random point per group; min-id is the
      engine's reproducibility contract, same rule as
      ``dedup.neardup_clusters``).

    Returns (id, cluster_id, cluster_size, is_canonical): training-set
    construction keeps ``is_canonical`` rows; ``1 - sum(is_canonical)/n``
    is the semantic-dup rate. Cross-engine exact: cosines are 6dp-rounded
    before the threshold (module float contract), so the pair graph —
    and hence the components — is bit-identical in Spark and DuckDB.

    Recall is bounded by the quantizer (pairs straddling a cell boundary
    are missed) — that is SemDeDup's own design trade, not an
    approximation added here; the paper likewise only compares within
    cluster.
    """
    from .graph import connected_components

    pairs = embedding_neardup_pairs(
        vectors,
        threshold=threshold,
        centroid_mod=centroid_mod,
        id_col=id_col,
        vec_col=vec_col,
        centroids=centroids,
        max_cell=max_cell,
    )
    labels = connected_components(pairs, a="id_a", b="id_b", max_iters=max_iter)
    out = (
        vectors.select(F.col(id_col))
        .join(
            labels.withColumnRenamed("node", id_col).withColumnRenamed(
                "component", "label"
            ),
            id_col,
            "left",
        )
        .withColumn("cluster_id", F.coalesce(F.col("label"), F.col(id_col)))
        .drop("label")
    )
    sizes = out.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return out.join(sizes, "cluster_id").select(
        F.col(id_col),
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )


# -- product quantization (PQ): compressed codes + ADC scan ----------------
# The >10^9-vector memory path (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — public method): split each
# dim-D vector into m subspaces of D/m dims, quantize each subvector to
# one of k sub-centroids, and score candidates by summing per-subspace
# distance-table lookups (ADC) instead of touching raw floats — a
# 64-dim float vector becomes m=8 small codes, a 32× compression, and
# the scan reads codes only. Distances use an EXACT integer contract:
# every per-subspace squared-L2 is computed in index order, scaled to
# 6dp MICRO-UNITS (round(d*1e6) as long), and summed as integers — so
# argmin/ordering are bit-identical across Spark, DuckDB and Python
# (the module's float contract, made exact for sums).


def _sqdist(a: Column, b: Column) -> Column:
    """Index-ordered squared L2 (deterministic fp accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sqdist_micro(a: Column, b: Column) -> Column:
    """Squared L2 in 6dp micro-units (exact integer contract)."""
    return F.round(_sqdist(a, b) * 1e6, 0).cast("long")


def default_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic untrained codebooks — sub-slices of the k
    smallest-id vectors (the SQL-oracle path, the PQ analog of
    ``_default_centroids``). Returns (subspace, code, cv).

    Built driver-side: the k base vectors arrive via a TakeOrdered
    (distributed top-k, no global window) and the codebook is k·dim
    doubles — tiny by construction, and every consumer collects it
    anyway to bake the literals into the plan."""
    ds = dim // m
    rows = (
        vectors.select(F.col(id_col), _vecd(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    data = [
        (j, c, [float(x) for x in rows[c].v[j * ds: (j + 1) * ds]])
        for j in range(m)
        for c in range(len(rows))
    ]
    return vectors.sparkSession.createDataFrame(
        data, "subspace int, code int, cv array<double>"
    )


def _collect_codebooks(codebooks: DataFrame, m: int, k: int) -> list:
    """codebooks DF -> nested python list [subspace][code] = cv.
    m·k·(D/m) doubles — driver-tiny by construction."""
    cb = [[None] * k for _ in range(m)]
    for row in codebooks.collect():
        cb[row.subspace][row.code] = list(row.cv)
    for j in range(m):
        missing = [c for c in range(k) if cb[j][c] is None]
        if missing:
            raise ValueError(
                f"codebooks missing subspace {j} codes {missing[:4]}…"
            )
    return cb


def _cb_literal(cb_j: list) -> Column:
    """One subspace's codebook as a literal array<array<double>> —
    baked into the plan, never recomputed per row."""
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in cv]) for cv in cb_j]
    )


def _argmin_code(cb_ary: Column, sv: Column, k: int) -> Column:
    """Code of the nearest sub-centroid: ONE pass via min over
    PACKED longs (micro_distance·k + code) — integer min is total and
    engine-portable, and ties break to the smaller code exactly like
    the oracle's ORDER BY (d, code). transform's binary lambda supplies
    the code index; no struct (struct-field aliases inside lambdas are
    unreliable), no double evaluation of the distance. Packing is safe:
    micro distances are ≪ 2^50 and k ≤ 2^8."""
    packed = F.array_min(
        F.transform(cb_ary, lambda c, i: _sqdist_micro(c, sv) * k + i)
    )
    return (packed % k).cast("int")


def _pq_query_frame(
    queries: DataFrame, m: int, ds: int, id_col: str, vec_col: str
) -> DataFrame:
    """(query_id, __q, __qs0..__qs{m-1}) behind a lazy checkpoint: the
    full vector (for the coarse quantizer / exact re-rank) plus the
    per-subspace slices as REAL COLUMNS — HOF lambdas below reference
    columns, never slice expressions (CLAUDE.md: an outer-column
    EXPRESSION inside a lambda re-evaluates per element). Mis-sized
    query vectors raise (``_checked_vec``)."""
    v = _checked_vec(vec_col, m * ds, id_col)
    return queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("__q"),
        *[F.slice(v, j * ds + 1, ds).alias("__qs%d" % j) for j in range(m)],
    ).localCheckpoint(eager=False)


def _pq_dtables(cb: list, m: int) -> Column:
    """Per-query distance tables: array of m per-subspace arrays of
    micro-distances to every sub-centroid, from the ``__qs*`` columns."""

    def one(cb_j: list, qs: Column) -> Column:
        # NB: ONE-parameter lambda — a second parameter (even a
        # defaulted one) would be bound to the array INDEX by
        # F.transform, silently shadowing the closure variable (the
        # module's documented 2-arg-lambda trap).
        return F.transform(_cb_literal(cb_j), lambda c: _sqdist_micro(c, qs))

    return F.array(*[one(cb[j], F.col("__qs%d" % j)) for j in range(m)])


def _pq_adc() -> Column:
    """ADC score: Σ_j dtable[j][codes[j]] as exact long micro-units,
    exposed in squared-L2 units (identical doubles both engines)."""
    return (
        F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("__dt"),
                lambda c, t: F.element_at(t, c + 1),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        / 1e6
    )


def _pq_exact_rerank(
    ranked: DataFrame,
    vectors: DataFrame,
    qdf: DataFrame,
    q_k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact full-dim squared-L2 re-rank of an ADC shortlist (the
    shared second stage of pq_topk / ivf_pq_topk): joins the
    O(q_k·mult) shortlist rows back to the raw vectors, scores with
    the micro-exact full-dim distance, and keeps the q_k best.
    Output: (query_id, rank, nbr_id, d2, adc_d2)."""
    v = vectors.select(
        F.col(id_col).alias("nbr_id"), _vecd(F.col(vec_col)).alias("__vv")
    )
    exact = (
        ranked.select("query_id", "nbr_id", "adc_d2")
        .join(v, "nbr_id")
        .join(F.broadcast(qdf.select("query_id", "__q")), "query_id")
        .select(
            "query_id",
            "nbr_id",
            "adc_d2",
            (_sqdist_micro(F.col("__q"), F.col("__vv")) / 1e6).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d2", "nbr_id")
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= q_k)
        .select("query_id", "rank", "nbr_id", "d2", "adc_d2")
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame | None = None,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each vector compressed to m sub-codes.

    The codebook is collected once (driver-tiny) and baked into the
    plan as literals, so encoding is a single stateless projection over
    the corpus scan: no join, no shuffle, codegen throughout. The m
    per-subspace slices are materialized as real columns behind a lazy
    checkpoint so the argmin lambdas reference COLUMNS — both the
    nested-HOF CSE gap and the outer-expression-in-lambda per-element
    re-eval are avoided (CLAUDE.md perf rules). Rows whose embedding
    length != ``dim`` raise at scan time (``_checked_vec``) instead of
    silently producing NULL codes."""
    ds = dim // m
    cb = _collect_codebooks(
        codebooks
        if codebooks is not None
        else default_pq_codebooks(vectors, m, k, dim, id_col, vec_col),
        m,
        k,
    )
    v = _checked_vec(vec_col, dim, id_col)
    vdf = vectors.select(
        F.col(id_col),
        *[F.slice(v, j * ds + 1, ds).alias("__s%d" % j) for j in range(m)],
    ).localCheckpoint(eager=False)
    codes = F.array(
        *[
            _argmin_code(_cb_literal(cb[j]), F.col("__s%d" % j), k)
            for j in range(m)
        ]
    )
    return vdf.select(F.col(id_col), codes.alias("codes"))


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    q_k: int = 10,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    codebooks: DataFrame | None = None,
    rerank_mult: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ/ADC approximate top-k: candidates are scored from their CODES
    via per-query distance tables — the corpus's raw floats are never
    read in the scoring pass.

    Per query: dtable[j][c] = micro-sqdist(query subvector j,
    sub-centroid c) — m·k longs, computed once per query row and
    broadcast with it. Candidate score = Σ_j dtable[j][codes[j]]
    (integer lookups, exact). ``rerank_mult`` > 0 keeps the q_k·mult
    best ADC candidates and re-ranks them with the EXACT full-dim
    squared L2 against the raw vectors — the standard two-stage PQ
    pipeline (ADC shortlist is approximate because quantization loses
    within-cell geometry; the exact re-rank restores the final
    ordering at O(q_k·mult) float work per query).

    Output: (query_id, rank, nbr_id, adc_d2) without re-rank;
    (query_id, rank, nbr_id, d2, adc_d2) with it — d2/adc_d2 in
    squared-L2 units at 6dp (micro-exact cross-engine)."""
    ds = dim // m
    cbdf = (
        codebooks
        if codebooks is not None
        else default_pq_codebooks(vectors, m, k, dim, id_col, vec_col)
    )
    cb = _collect_codebooks(cbdf, m, k)
    encoded = pq_encode(vectors, cbdf, m, k, dim, id_col, vec_col)
    qdf = _pq_query_frame(queries, m, ds, id_col, vec_col)
    q = qdf.select("query_id", _pq_dtables(cb, m).alias("__dt"))
    scored = (
        encoded.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("nbr_id"),
            _pq_adc().alias("adc_d2"),
        )
    )
    topn = q_k * rerank_mult if rerank_mult else q_k
    # Rank the ADC scan with grouped_topk, NOT Window.partitionBy: the
    # scan produces O(|corpus|) scored rows PER QUERY, and a bare
    # per-query window funnels all of them into one task — a single-task
    # sort at 10^9+ codes. grouped_topk local-prunes each scan partition
    # to its top-n per query first (narrow, no shuffle), so the window
    # sees ≤ P·topn rows per query. Its deterministic-recomputation
    # contract holds: both pipeline inputs sit behind lazy checkpoints
    # (encoded slices / query frame), codes+tables are plan literals,
    # and (adc_d2, nbr_id) is unique per query. The ADC expression is
    # recomputed once more by the self-aggregate-join — m integer
    # lookups per row, far cheaper at scale than materializing the
    # O(|corpus|·|queries|) scored frame.
    ranked = grouped_topk(
        scored, ["query_id"], ["adc_d2", "nbr_id"], topn,
        rank_col="rank", keep_rank=True,
    )
    if not rerank_mult:
        return ranked.select("query_id", "rank", "nbr_id", "adc_d2")
    return _pq_exact_rerank(ranked, vectors, qdf, q_k, id_col, vec_col)


def train_pq_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace Lloyd k-means codebooks, trained in ONE corpus pass
    per iteration (not m): vectors explode to (id, subspace, subvector)
    rows once (lazily checkpointed), assignment is the same
    literal-codebook argmin the encoder uses (indexed by the row's
    subspace — no join), and the new sub-centroids come from a
    partial-aggregated groupBy(subspace, code, pos) mean. Init: the k
    smallest-md5(id) vectors' sub-slices (reproducible, no RNG); empty
    cells keep their previous centroid so k never shrinks. The m·k·dim
    codebook round-trips through the driver between iterations — tiny
    by construction."""
    spark = vectors.sparkSession
    ds = dim // m
    seeds = (
        vectors.select(F.col(id_col), _vecd(F.col(vec_col)).alias("v"))
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    cb = [
        [list(row.v[j * ds: (j + 1) * ds]) for row in seeds]
        for j in range(m)
    ]
    sub_parts = [
        vectors.select(
            F.col(id_col),
            F.lit(j).alias("subspace"),
            F.slice(_checked_vec(vec_col, dim, id_col), j * ds + 1, ds).alias("sv"),
        )
        for j in range(m)
    ]
    sub = sub_parts[0]
    for p in sub_parts[1:]:
        sub = sub.unionByName(p)
    sub = sub.localCheckpoint(eager=False)
    for _ in range(iters):
        # per-row argmin against THIS row's subspace codebook: a literal
        # array<array<array<double>>> indexed by the subspace column
        cb_all = F.array(*[_cb_literal(cb[j]) for j in range(m)])
        code = _argmin_code(
            F.element_at(cb_all, F.col("subspace") + 1), F.col("sv"), k
        )
        means = (
            sub.select("subspace", code.alias("code"), F.posexplode("sv").alias("pos", "x"))
            .groupBy("subspace", "code", "pos")
            .agg(F.avg("x").alias("mu"))
            .groupBy("subspace", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                    lambda s: s["mu"],
                ).alias("cv")
            )
            .collect()
        )
        for row in means:
            cb[row.subspace][row.code] = list(row.cv)
    rows = [
        (j, c, cb[j][c]) for j in range(m) for c in range(k)
    ]
    return spark.createDataFrame(
        rows, "subspace int, code int, cv array<double>"
    )


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    q_k: int = 10,
    nprobe: int = 4,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    centroid_mod: int = 41,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    rerank_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF×PQ composition — the standard production ANN shape (FAISS
    IVFPQ, non-residual variant): the coarse quantizer prunes the
    corpus to ``nprobe`` cells per query, the PQ codes score ONLY those
    cells' members via integer distance-table lookups, and the exact
    re-rank touches just ``q_k·rerank_mult`` raw vectors per query.
    Per-query cost: nprobe/ncells of the corpus in CODE lookups (m
    integer adds each) + O(q_k·mult) full-dim float work — at 10^9
    vectors neither the floats nor even the full code table is scanned.

    Codes quantize the raw vectors, not the cell residuals (the
    residual refinement needs per-cell codebooks — m·k·ncells
    sub-centroids — and is a drop-in upgrade: train codebooks on
    ``v - centroid`` and subtract the probed cell's centroid from the
    query before building its tables). ``rerank_mult=0`` returns raw
    ADC scores. Output matches :func:`pq_topk`:
    (query_id, rank, nbr_id, adc_d2) without re-rank,
    (query_id, rank, nbr_id, d2, adc_d2) with it."""
    ds = dim // m
    cents = (
        centroids
        if centroids is not None
        else _default_centroids(vectors, centroid_mod, id_col, vec_col)
    )
    cbdf = (
        codebooks
        if codebooks is not None
        else default_pq_codebooks(vectors, m, k, dim, id_col, vec_col)
    )
    cb = _collect_codebooks(cbdf, m, k)

    # coarse lists: (centroid_id, nbr_id, codes) — built once, reusable
    assign = ivf_assign(vectors, centroid_mod, id_col, vec_col, centroids=cents)
    encoded = pq_encode(vectors, cbdf, m, k, dim, id_col, vec_col)
    lists = assign.select(F.col(id_col).alias("nbr_id"), "centroid_id").join(
        encoded.withColumnRenamed(id_col, "nbr_id"), "nbr_id"
    )

    # query side: nprobe nearest cells (cosine, same rule as ivf_topk)
    # + the PQ distance tables, broadcast together
    qdf = _pq_query_frame(queries, m, ds, id_col, vec_col)
    qc = qdf.crossJoin(F.broadcast(cents)).withColumn(
        "ccos", cosine(F.col("__q"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id")
    )
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id", _pq_dtables(cb, m).alias("__dt"))
    )
    scored = (
        F.broadcast(probes)
        .join(lists, "centroid_id")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", _pq_adc().alias("adc_d2"))
    )
    topn = q_k * rerank_mult if rerank_mult else q_k
    # Candidates are already bounded (nprobe cells per query), but the
    # same grouped_topk ranking as pq_topk keeps the per-query task
    # bounded even when a hot cell concentrates the corpus (topk.py).
    ranked = grouped_topk(
        scored, ["query_id"], ["adc_d2", "nbr_id"], topn,
        rank_col="rank", keep_rank=True,
    )
    if not rerank_mult:
        return ranked.select("query_id", "rank", "nbr_id", "adc_d2")
    return _pq_exact_rerank(ranked, vectors, qdf, q_k, id_col, vec_col)


def ann_recall(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    centroid_mod: int = 41,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    shortlist_dims: int | None = None,
    shortlist_mult: int = 4,
) -> DataFrame:
    """recall@k of the IVF path against exact brute force — the eval
    harness an ANN deployment tunes (nprobe / codebook / shortlist)
    against. One row per query: ``(query_id, n_exact, n_hit, recall)``
    where ``n_exact = min(k, |corpus|-1)`` is the ground-truth set
    size, ``n_hit`` how many of those the IVF path returned, ``recall``
    their 6-dp ratio.

    Composition of the two existing operators (same parameters ivf_topk
    takes), joined per (query, neighbor): the hit check is a LEFT-SEMI
    join of two ≤ |queries|·k frames — eval cost is bounded by the
    query set, never the corpus (the brute-force side is the documented
    verifier: run it on a SAMPLE of queries in production, exactly what
    this operator's `queries` parameter expresses).
    """
    exact = brute_force_topk(vectors, queries, k, id_col, vec_col)
    approx = ivf_topk(
        vectors, queries, k, nprobe, centroid_mod, id_col, vec_col,
        centroids, shortlist_dims, shortlist_mult,
    )
    hits = exact.select("query_id", "nbr_id").join(
        approx.select("query_id", "nbr_id"), ["query_id", "nbr_id"], "leftsemi"
    )
    n_exact = exact.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    n_hit = hits.groupBy("query_id").agg(F.count("*").cast("long").alias("n_hit"))
    return (
        n_exact.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_exact"), 6
            ).alias("recall"),
        )
    )


def embed_dim_stats(
    vectors: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension distribution profile of an embedding column:
    ``(pos, n, mean, var, vmin, vmax)`` (pos 1-based) — the codebook /
    shortlist diagnostic (is the energy front-loaded enough for
    truncated-dim shortlists? are there dead dimensions a PQ split
    wastes a sub-quantizer on?).

    ONE posexplode + ONE partial-aggregated groupBy(pos); output is
    dimension-sized. Float contract: values are rounded (6 dp for the
    sum, 12 dp for the square sum) and accumulated as DECIMALS — sums
    across 10^9 rows are exact on both engines regardless of partial-
    agg order; mean/var then come from the exact sums in one double
    expression each.
    """
    x = vectors.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos0", "v")
    ).select((F.col("pos0") + 1).cast("int").alias("pos"), "v")
    s1 = F.sum(F.round(F.col("v"), 6).cast("decimal(18,6)"))
    s2 = F.sum(F.round(F.col("v") * F.col("v"), 12).cast("decimal(28,12)"))
    agg = x.groupBy("pos").agg(
        F.count("*").cast("long").alias("n"),
        s1.alias("__s1"),
        s2.alias("__s2"),
        F.round(F.min("v"), 6).alias("vmin"),
        F.round(F.max("v"), 6).alias("vmax"),
    )
    mean = F.col("__s1").cast("double") / F.col("n")
    var = F.col("__s2").cast("double") / F.col("n") - mean * mean
    return agg.select(
        "pos", "n",
        F.round(mean, 6).alias("mean"),
        F.round(var, 6).alias("var"),
        "vmin", "vmax",
    ).orderBy("pos")

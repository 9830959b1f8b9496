"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Spark-first design — every step is built-in column expressions + joins
(JVM-side, codegen), so the same pipeline that dedups 500 test docs
dedups a 100 TB corpus:

- exact:    md5(normalized text) → window keep-first (one shuffle on the
            16-byte digest, never on the text itself).
- MinHash:  k md5-based hash functions over word shingles → signature →
            LSH bands → self-join on band key.  Banding means candidate
            generation shuffles (doc_id, band_key) pairs only; the
            quadratic part runs per-bucket, and bucket sizes are bounded
            by collision probability, not corpus size.
- SimHash:  64 explode-free… actually explode(tokens)×explode(bits) then
            two groupBys — all partial-aggregated; the heavy explode is
            map-side and never materialized.
- Jaccard:  exact verify on LSH candidates only (classic
            candidate-then-verify; verification cost is O(candidates),
            not O(n²)).

md5 is used for all content hashing because it is bit-identical across
Spark, DuckDB (the correctness oracle), and Python — murmur3 (F.hash) is
used elsewhere for partitioning only, never for cross-engine contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import shingles, tokens

MINHASH_K = 12  # hash functions
LSH_BANDS = 4   # bands of r = K/BANDS rows each


def suggest_lsh_bands(
    n_hashes: int = MINHASH_K,
    threshold: float = 0.5,
    fp_weight: float = 0.5,
) -> tuple[int, int]:
    """Threshold-optimal LSH banding ``(bands, rows_per_band)``.

    A (b, r) banding of an n-hash MinHash signature collides a pair
    with Jaccard similarity s with probability ``1 − (1 − s^r)^b``
    (the classic S-curve; Mining of Massive Datasets §3.4 — public
    method, same optimization datasketch exposes). This picks, among
    all b·r ≤ n_hashes with maximal coverage, the (b, r) minimizing
    the weighted false-positive area (∫ below ``threshold``) plus
    false-negative area (∫ above) of that curve — so callers tune
    `lsh_bands` by THRESHOLD, the quantity they actually care about,
    instead of guessing band counts. Only exact divisor pairs
    (b·r = n_hashes) are considered, so ``lsh_bands(sig,
    bands=b)``'s own ``r = n // b`` reproduces the suggested r
    exactly. Deterministic scan; numerical integration at 1e-3 step.

    ``fp_weight`` ∈ (0,1): weight on the false-positive area (raise it
    to bias toward fewer, higher-precision candidates; candidates are
    verified downstream anyway, so FPs cost compute, FNs cost recall).
    """
    if not 1 <= n_hashes:
        raise ValueError("n_hashes must be >= 1")
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0,1)")
    best: tuple[float, int, int] | None = None
    step = 0.001
    for r in range(1, n_hashes + 1):
        if n_hashes % r:
            continue
        b = n_hashes // r
        fp = fn = 0.0
        for i in range(int(1.0 / step)):
            s = (i + 0.5) * step
            p = 1.0 - (1.0 - s**r) ** b
            if s < threshold:
                fp += p * step
            else:
                fn += (1.0 - p) * step
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if best is None or err < best[0] - 1e-12:
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized (lowercased, ws-collapsed) text.

    Keeps the smallest id per content digest; emits survivors with their
    duplicate count. Equivalent to groupBy(digest) keep-min — expressed
    as a window so survivors keep all their columns without a re-join.
    """
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    d = df.withColumn("content_md5", F.md5(norm))
    w = Window.partitionBy("content_md5").orderBy(F.col(id_col))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(Window.partitionBy("content_md5")))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), "content_md5", F.col("n_copies").cast("long").alias("n_copies"))
    )


def nfc_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup robust to Unicode composition differences: the
    digest key is md5 over NFC-normalized, lowercased, ws-collapsed
    text, so ``Café`` typed precomposed and as ``e``+combining-acute
    land in one duplicate group (plain :func:`exact_dedup` treats them
    as distinct byte strings).

    Plan shape at 100 TB: one Arrow-batched pandas-UDF projection
    (``textops.nfc_normalize`` — C-speed unicodedata, no JVM NFC
    exists), then exactly :func:`exact_dedup`'s single shuffle on the
    16-byte digest. NFC only — NFKC compatibility folds change content
    and stay out of a dedup key.
    """
    from .textops import nfc_normalize

    return exact_dedup(
        df.withColumn(text_col, nfc_normalize(F.col(text_col))), id_col, text_col
    )


def latest_capture(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the newest capture per URL (the standard first step over
    Common-Crawl-style page tables, where each URL appears once per
    crawl snapshot).

    One partial-aggregated ``groupBy(url)`` with ``max_by`` over a
    struct of the kept columns — no window, so even a URL captured in
    every crawl is a single combine chain, and the map-side combine
    collapses per-partition duplicates before the shuffle. Emits
    (url, <keep_cols of the newest capture>, n_captures). ``keep_cols``
    defaults to every column except url. Ties on ``ts_col`` pick an
    arbitrary capture (make the timestamp unique upstream if exactness
    across engines matters — captures of one URL in one crawl share
    nothing else to order by).
    """
    cols = (
        keep_cols
        if keep_cols is not None
        else [c for c in pages.columns if c != url_col]
    )
    if not cols:  # just (url, n_captures) — no newest-row payload
        return pages.groupBy(F.col(url_col).alias("url")).agg(
            F.count("*").cast("long").alias("n_captures")
        )
    agg = pages.groupBy(F.col(url_col).alias("url")).agg(
        F.max_by(F.struct(*cols), F.col(ts_col)).alias("__s"),
        F.count("*").alias("n_captures"),
    )
    return agg.select(
        "url",
        *[F.col(f"__s.{c}").alias(c) for c in cols],
        F.col("n_captures").cast("long").alias("n_captures"),
    )


def canonical_href(html: F.Column) -> F.Column:
    """First ``<link rel="canonical" href="...">`` target in the page,
    or NULL — both attribute orders, case-insensitive, single or
    double quotes. Pure JVM ``regexp_extract`` in the Java ∩ RE2
    dialect (whole-stage codegen; the DuckDB twin runs the identical
    patterns), so canonical discovery never leaves the scan stage.
    """
    p_rel_first = (
        r"""(?i)<link[^>]*\brel\s*=\s*["']canonical["'][^>]*"""
        r"""\bhref\s*=\s*["']([^"']+)["']"""
    )
    p_href_first = (
        r"""(?i)<link[^>]*\bhref\s*=\s*["']([^"']+)["'][^>]*"""
        r"""\brel\s*=\s*["']canonical["']"""
    )
    return F.coalesce(
        F.nullif(F.regexp_extract(html, p_rel_first, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, p_href_first, 1), F.lit("")),
    )


def canonical_dedup(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Collapse URL aliases by the page's declared canonical target —
    the ``<link rel=canonical>`` fold Common-Crawl-style dedup runs
    before content hashing (print views, tracking-param variants and
    mobile mirrors of one article all declare the same canonical, so
    they fold without comparing bodies; cf. the reference's extraction
    surface `html_utils.go:12-106`, which reads attrs by selector but
    has no alias fold).

    Key = the canonical href when the page declares one, else the
    page's own URL (self-canonical). Survivor = min url per key. Emits
    (url, canon_target, n_aliases). ONE shuffle on the target key —
    html never moves; the extraction is a map-side JVM regexp over the
    scan. Absolute hrefs are folded as-declared; resolve relative
    canonicals against the page URL upstream with the engine's
    canonicalization UDF when crawling hostile markup.
    """
    keyed = pages.select(
        F.col(url_col).alias("url"),
        F.coalesce(canonical_href(F.col(html_col)), F.col(url_col)).alias(
            "canon_target"
        ),
    )
    return keyed.groupBy("canon_target").agg(
        F.min("url").alias("url"),
        F.count("*").cast("long").alias("n_aliases"),
    ).select("url", "canon_target", "n_aliases")


def block_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 16,
) -> DataFrame:
    """Token-block exact dedup (chunk-level boilerplate removal — the
    sub-document analog of ``exact_dedup``, the op training pipelines
    run to strip repeated navigation/footer/license chunks).

    Split each doc's token stream into fixed ``block``-token chunks,
    hash each chunk (md5), and keep only the FIRST occurrence of each
    chunk corpus-wide (ordered by (doc_id, block index) — deterministic
    first-writer-wins). Emits per-doc (n_blocks, n_kept, kept_ratio).

    Plan shape at 100 TB: posexplode → partial-aggregated groupBy
    (doc, block) that reassembles chunk text via array_sort(collect_list)
    — a deliberate shuffle-based build, because the slice-in-transform
    alternative re-evaluates the token array per element (the module's
    HOF outer-reference trap). The first-occurrence flag is a
    ``min(struct(doc_id, blk))`` groupBy per chunk digest — a PARTIAL
    aggregate, so the op's own target case (one boilerplate chunk
    repeated across the corpus) combines map-side instead of funneling
    every occurrence of the hot digest into a single window task; the
    survivor counts then come from a second partial groupBy on doc_id
    (docs have bounded chunk counts — no hot key), and per-doc n_blocks
    is ceil(n_tokens/block) computed directly from the token array, so
    the chunk table is built exactly ONCE. kept_ratio is rounded to 6dp
    (cross-engine float contract)."""
    tok = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tk")
    )
    blocks = (
        tok.withColumn("blk", F.floor(F.col("pos") / block).cast("int"))
        .groupBy(id_col, "blk")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tk"))),
                        lambda s: s["tk"],
                    ),
                    " ",
                )
            ).alias("chunk_md5")
        )
    )
    # first occurrence per chunk = min (doc_id, blk) — struct ordering is
    # field-by-field, identical to ORDER BY doc_id, blk
    first = blocks.groupBy("chunk_md5").agg(
        F.min(F.struct(F.col(id_col), F.col("blk"))).alias("__first")
    )
    kept = first.groupBy(F.col("__first").getField(id_col).alias(id_col)).agg(
        F.count("*").alias("n_kept")
    )
    nblk = df.select(
        F.col(id_col),
        F.ceil(F.size(tokens(F.col(text_col))) / block).cast("long").alias("n_blocks"),
    ).filter(F.col("n_blocks") > 0)
    return nblk.join(kept, id_col, "left").select(
        F.col(id_col),
        "n_blocks",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.round(F.coalesce(F.col("n_kept"), F.lit(0)) / F.col("n_blocks"), 6).alias(
            "kept_ratio"
        ),
    )


def repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    tokenizer=None,
) -> DataFrame:
    """Arbitrary-offset repeated-span detection (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better"
    substring family, re-expressed as hashed rolling w-grams instead of
    a sequential suffix array — the standard distributed formulation).

    A token position p in a doc STARTS a repeated span when the
    ``window``-token w-gram at p occurs ≥ 2 times anywhere in the
    corpus (any doc, any offset — unlike :func:`block_dedup`'s
    fixed-boundary chunks). The maximal union of repeated w-grams is
    the doc's removable span set. Emits per doc:

      (doc_id, n_tokens, n_covered, n_spans, dup_ratio)

    where n_covered = tokens inside any repeated span, n_spans = number
    of maximal merged spans, dup_ratio = round(n_covered/n_tokens, 6).

    Plan shape at 100 TB:
      1. w-gram digests build MAP-SIDE per doc (the zip_with-chain
         shingle, then one md5 per gram — no outer-ref HOF trap, no
         token shuffle);
      2. ONE corpus-wide partial-aggregated groupBy on the 16-byte
         digest marks repeated grams (the only O(corpus) shuffle, and
         it carries (digest, count) rows, never text);
      3. the repeated flag re-joins the (doc_id, p, digest) starts on
         the digest — co-partitioned with the groupBy, so Catalyst
         reuses the exchange;
      4. span merging is gaps-and-islands over each doc's REPEATED
         starts only (per-doc window, bounded by doc length: two
         partial steps — lag + running sum — then a partial-agg
         groupBy per island). Two starts merge iff their gap ≤ window
         (overlapping or abutting w-grams).
    """
    from .textops import resolve_tokens, shingles

    # materialize the token array ONCE (lazy checkpoint): the shingle
    # zip_with chain below references it in `window`+1 slice nodes, and
    # Catalyst does not CSE nested higher-order functions — inlined,
    # the tokenize pipeline (lower+split+filter) re-ran ~window× per
    # row (the same no-CSE trap fingerprint/minhash fixed).
    tdf = df.select(
        F.col(id_col), resolve_tokens(F.col(text_col), tokenizer).alias("__t")
    ).localCheckpoint(eager=False)
    grams = F.transform(
        shingles(F.col("__t"), window), lambda s: F.md5(s)
    )
    # n_tokens for the final join is a narrow re-read of the token
    # checkpoint — NOT a re-run of the gram build (which the old
    # base.join(per_doc) shape paid a second time).
    base = tdf.select(F.col(id_col), F.size("__t").alias("n_tokens"))
    # the (doc, p, digest) starts table feeds TWO consumers (the corpus
    # digest count and the repeated-start join) whose exchanges differ
    # (partial-agg rows vs raw rows), so Catalyst cannot reuse one scan
    # — without this checkpoint the O(n·w) gram build runs twice
    # (measured 2× wall at sf0.1). 28 B/row, spills to disk; the same
    # order of magnitude the digest shuffle pays anyway.
    starts = tdf.select(
        F.col(id_col), F.posexplode(grams).alias("p", "h")
    ).localCheckpoint(eager=False)
    rep = (
        starts.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h")
    )
    rs = starts.join(rep, "h").select(id_col, "p")
    w_ord = Window.partitionBy(id_col).orderBy("p")
    islands = (
        rs.withColumn("prev", F.lag("p").over(w_ord))
        .withColumn(
            "new_span",
            F.when(
                F.col("prev").isNull()
                | (F.col("p") - F.col("prev") > window),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    spans = islands.groupBy(id_col, "span_id").agg(
        (F.max("p") - F.min("p") + window).alias("span_len")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_len").alias("n_covered"),
        F.count("*").alias("n_spans"),
    )
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_covered"), F.lit(0)).cast("long").alias("n_covered"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.coalesce(F.col("n_covered"), F.lit(0)) / F.col("n_tokens"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature: k hex-string min-hashes over word shingles.

    Hash family j (0..k-1): h_j(s) = md5(j || ':' || s); the signature
    component is the lexicographic min (hex strings compare like the
    128-bit ints they encode). Docs with no shingles get null components.
    One projection — no shuffle.

    Components are emitted as SEPARATE columns (mh_0..mh_{k-1}), not one
    array: Catalyst prunes unused columns but cannot prune inside an
    array expression, and downstream banding only touches k/bands
    components per branch — with an array every branch would recompute
    the full signature (measured 17× slower at sf0.1).

    The shingle ARRAY itself is materialized once (lazy checkpoint)
    before the k component columns are built from it: all k reference
    the same array, and Catalyst does not CSE nested higher-order
    functions — inlined, the tokenize→shingle→distinct pipeline re-ran
    k times per row (measured 1.7× whole-op at sf0.1; the same CSE gap
    fixed in textops.fingerprint and the jaccard verifier).
    """
    shdf = df.select(
        F.col(id_col),
        F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n)).alias(
            "__sh"
        ),
    ).localCheckpoint(eager=False)

    def hasher(j: int):
        # NB: the returned lambda must take exactly ONE parameter —
        # F.transform passes (element, index) to 2-arg callables, which
        # would silently bind the array index instead of j.
        prefix = f"{j}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    cols = [
        F.array_min(F.transform(F.col("__sh"), hasher(j))).alias(f"mh_{j}")
        for j in range(k)
    ]
    return shdf.select(F.col(id_col), *cols)


def lsh_bands(sig_df: DataFrame, id_col: str = "doc_id", bands: int = LSH_BANDS) -> DataFrame:
    """Explode a signature into (id, band, band_key) rows.

    band_key = md5(band || ':' || sig slice) — docs agreeing on all r
    components of any band collide. Null signatures (empty docs) drop out.

    ``k`` is read off the signature frame's ``mh_*`` columns (NOT
    assumed = MINHASH_K), so a ``minhash_signature(k=…)`` /
    :func:`suggest_lsh_bands` pairing bands correctly at any width;
    a ``bands`` that does not divide k fails loudly instead of
    silently banding a prefix (or, at bands > k, hashing an EMPTY
    slice — every doc colliding in every band).
    """
    k = sum(1 for c in sig_df.columns if c.startswith("mh_"))
    if bands < 1 or k == 0 or k % bands:
        raise ValueError(
            f"bands={bands} must divide the signature's {k} mh_* columns"
        )
    r = k // bands
    rows = []
    for b in range(bands):
        key = F.md5(
            F.concat_ws("|", F.lit(str(b)), *[F.col(f"mh_{b * r + i}") for i in range(r)])
        )
        rows.append(
            sig_df.filter(F.col("mh_0").isNotNull()).select(
                F.col(id_col), F.lit(b).alias("band"), key.alias("band_key")
            )
        )
    out = rows[0]
    for x in rows[1:]:
        out = out.unionByName(x)
    return out


def minhash_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """LSH candidate pairs: ids sharing at least one band bucket.

    The self-join runs on band_key (16-byte digest) — at corpus scale
    this is the only shuffle, and AQE's skew-join splits any hot bucket.
    The bands table is materialized first (localCheckpoint) so the
    signature computation runs once, not once per join side.
    """
    bands = lsh_bands(minhash_signature(df, id_col, text_col), id_col)
    bands = bands.localCheckpoint(eager=True)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs: exact n-gram Jaccard verify over LSH candidates.

    jaccard = |A∩B| / |A∪B| over distinct word shingles, computed by
    joining each candidate pair's exploded shingle sets — O(candidate
    pairs × shingles), never O(n²). Rounded to 6dp (cross-engine float
    contract).
    """
    cand = minhash_candidates(df, id_col, text_col)
    # the exploded shingle table has THREE consumers (sizes + both join
    # sides of the intersection) — materialize it once (lazy
    # checkpoint): Catalyst re-inlines the tokenize→shingle→explode
    # pipeline per consumer otherwise (measured 8.1 s → 5.3 s at sf0.1;
    # same nested-HOF CSE gap as textops.fingerprint)
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))).alias("sh"),
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh.withColumnRenamed(id_col, "id_a"), "id_a")
        .join(
            sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
        .filter(F.col("sh") == F.col("sh_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash signature (Charikar'02): per-token md5 bit votes.

    bit b of token t = bit (b mod 4) of hex nibble (b div 4) of md5(t);
    each token votes +1/-1 per bit position (with multiplicity); the
    signature sets bit b iff the vote sum is > 0.  Two groupBys, both
    partial-aggregated; emits (id, simhash bigint).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    h = tok.withColumn("h", F.md5(F.col("tok")))
    bit = h.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        F.col("h"),
    ).withColumn(
        "nib",
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.col("h"), (F.col("b") / 4).cast("int") + 1, 1),
        )
        - 1,
    ).withColumn(
        "bitval",
        (F.floor(F.col("nib") / F.pow(F.lit(2.0), (F.col("b") % 4).cast("double"))).cast("int") % 2),
    )
    votes = bit.groupBy(id_col, "b").agg(
        F.sum(F.when(F.col("bitval") == 1, 1).otherwise(-1)).alias("v")
    )
    sig = votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.pow(F.lit(2.0), F.col("b").cast("double")).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
    return sig


def neardup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate CLUSTERING: connected components over the verified
    LSH pair graph + canonical-survivor selection — the step a training
    pipeline runs after pair detection (A~B, B~C must collapse to ONE
    kept document, not two independent pair-wise drops).

    cluster_id = min doc id reachable in the near-dup graph (docs with no
    near-dups are their own singleton cluster); is_canonical flags the
    per-cluster survivor; cluster_size supports dedup-rate accounting.

    Algorithm: the pair graph goes through
    :func:`crawl_spark.operators.graph.connected_components` (iterative
    min-label propagation over the EDGE list — O(near-dup pairs), not
    O(corpus) — bounded by component diameter with an exact early stop;
    see that docstring for the scale layout); this function adds the
    corpus-side singleton fill, canonical flag and size accounting.
    Deterministic: min() over unique ids has no ties.
    """
    from .graph import connected_components

    pairs = ngram_jaccard_pairs(df, id_col, text_col, shingle_n, threshold)
    labels = connected_components(pairs, a="id_a", b="id_b", max_iters=max_iter)
    out = (
        df.select(F.col(id_col))
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


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 3,
) -> DataFrame:
    """Corpus-level repeated-line removal (the CCNet/RefinedWeb
    boilerplate rule): a non-blank line that appears in MORE than
    ``max_docs`` distinct documents is navigation/footer boilerplate —
    strip every occurrence, everywhere, and reassemble the documents.

    Plan shape at 100 TB:
    - one posexplode pass emits (doc_id, pos, line);
    - hot-line detection is a PARTIAL-aggregated count(DISTINCT doc)
      per line (the shuffle carries (line, doc) pairs once — Spark
      expands distinct aggregates map-side);
    - removal is a left_anti join on the line value (hot lines are an
      unbounded set at corpus scale, so no broadcast assumption);
    - reassembly is one groupBy(doc_id) whose collect_list is bounded by
      a single document's line count (no hot key), ordered exactly by
      the original positions via array_sort over (pos, line) structs.

    Emits per-doc (n_lines, n_kept, clean_md5) — clean_md5 hashes the
    reassembled text so the oracle checks byte-level reassembly without
    shipping documents around. Blank lines are never hot (they are not
    boilerplate, they are layout) and are always kept; a doc whose every
    line was removed reassembles to the empty string.
    """
    exploded = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    )
    hot = (
        exploded.filter(F.trim(F.col("line")) != "")
        .groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") > max_docs)
        .select("line")
    )
    kept = exploded.join(hot, "line", "left_anti")
    reasm = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            )
        ).alias("clean_md5"),
    )
    return (
        df.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), "\n")).cast("int").alias("n_lines"),
        )
        .join(reasm, id_col, "left")
        .select(
            F.col(id_col),
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("int").alias("n_kept"),
            F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias("clean_md5"),
        )
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    tokenizer=None,
    eval_side: str = "broadcast",
    bloom_cfg=None,
) -> DataFrame:
    """Benchmark decontamination: flag training docs that share any word
    ``n``-gram with an evaluation/benchmark set (the GPT-3 appendix-C /
    Llama training-data rule; 13-grams are the published default).

    Plan shape at 100 TB (``eval_side="broadcast"``, the default):
    - the eval side is tiny versus the corpus (benchmarks are MBs, the
      corpus is TBs): its distinct gram digests broadcast;
    - the corpus side explodes to (doc_id, gram_md5) map-side and
      streams through the BROADCAST hash join — the corpus never
      shuffles its grams, and only MATCHED pairs (bounded by the
      contamination rate, not the corpus) reach the per-doc count;
    - grams travel as 16-byte md5 digests, never as strings, so the
      broadcast and the matched-pair shuffle stay narrow;
    - the final left join back to the corpus is a join on ``id_col``
      against a hit set bounded by the number of contaminated docs.

    ``eval_side="bloom"`` is the scale path for eval sets whose digest
    table exceeds the broadcast budget (e.g. decontaminating against a
    10^9-gram *held-out corpus* rather than a benchmark): eval gram
    keys are folded into a Bloom bitmap (``bloom.BloomConfig``; ~1 GB
    broadcast at 10^9 grams/8 bits-per-key vs 16 GB of md5 digests),
    corpus grams stream map-side through the vectorized bitmap probe,
    and only bloom-POSITIVE grams (true hits + FP-rate noise) reach the
    exact verify join against the eval digests. A Bloom negative is
    authoritative, every positive is verified on the 16-byte md5 — the
    result is bit-identical to the broadcast path at ANY false-positive
    rate (property-tested); FP rate costs verify-join traffic only.
    The corpus side still never shuffles un-filtered grams; the eval
    side shuffles twice (bitmap build, verify join) instead of
    broadcasting digests.

    Emits per-doc (n_hit_grams, keep) over ALL input docs — docs shorter
    than ``n`` tokens have no grams and always pass.

    ``tokenizer`` (textops.resolve_tokens hook) switches BOTH sides to
    the same token space — the published rules are defined over BPE
    tokens; the default keeps the whitespace oracle contract.
    """
    from .textops import resolve_tokens

    gram = lambda c: F.explode(  # noqa: E731
        shingles(resolve_tokens(c, tokenizer), n)
    ).alias("g")
    ev = (
        eval_df.select(gram(F.col(text_col)))
        .select(F.md5("g").alias("gram_md5"))
        .distinct()
    )
    if eval_side == "broadcast":
        corpus_grams = df.select(F.col(id_col), gram(F.col(text_col))).select(
            id_col, F.md5("g").alias("gram_md5")
        )
        matched = corpus_grams.join(F.broadcast(ev), "gram_md5")
    elif eval_side == "bloom":
        from .bloom import BloomConfig, build_bitmaps, split_by_bloom

        cfg = bloom_cfg or BloomConfig(n_buckets=16)
        # bloom.py keys on (host_hash → bucket, url_hash → probes); any
        # 64-bit key works — here both derive from xxhash64(gram).
        ev_keys = (
            eval_df.select(gram(F.col(text_col)))
            .select(F.xxhash64("g").alias("url_hash"))
            .withColumn("host_hash", F.col("url_hash"))
        )
        bitmaps = build_bitmaps(ev_keys, cfg)
        corpus_grams = df.select(F.col(id_col), gram(F.col(text_col))).select(
            id_col,
            F.md5("g").alias("gram_md5"),
            F.xxhash64("g").alias("url_hash"),
        ).withColumn("host_hash", F.col("url_hash"))
        tagged = split_by_bloom(corpus_grams, bitmaps, cfg, df.sparkSession)
        survivors = tagged.filter(F.col("possibly_seen")).select(id_col, "gram_md5")
        matched = survivors.join(ev, "gram_md5")  # exact verify, no broadcast
    else:
        raise ValueError(f"eval_side must be 'broadcast' or 'bloom', got {eval_side!r}")
    hits = matched.groupBy(id_col).agg(
        F.count_distinct("gram_md5").alias("n_hit_grams")
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hit_grams", F.lit(0)).cast("long").alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) == 0).alias("keep"),
        )
    )


def contamination_report(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_col: str = "bench",
    n: int = 13,
    tokenizer=None,
) -> DataFrame:
    """Per-benchmark contamination summary — the audit table published
    alongside decontamination runs (GPT-3 appendix C reports exactly
    this shape: per benchmark, how many eval n-grams leak into the
    training corpus and how many training docs carry them).

    ``eval_df`` carries one row per eval document with a ``bench_col``
    naming its benchmark. Emits one row per benchmark:

    - ``n_eval_grams`` — distinct word-``n``-gram digests in the bench;
    - ``n_hit_grams`` — of those, how many occur anywhere in ``df``;
    - ``n_hit_docs``  — distinct corpus docs sharing ≥1 gram;
    - ``gram_frac`` / ``doc_frac`` — the two ratios, 6dp (doc_frac is
      over the TOTAL corpus doc count, hit or not).

    Plan shape at 100 TB: the eval side is MBs by definition — its
    (bench, digest) set broadcasts; corpus grams explode map-side and
    stream through the broadcast join, so only MATCHED pairs (bounded
    by the contamination rate) ever shuffle, once, on the bench key.
    The corpus doc total is a second partial-agg scalar crossed in.
    Benchmarks with zero hits keep a row (left join from the eval
    side). Grams travel as md5 digests, never strings.

    SQL twin: the ``contamination`` oracle in __spark_entry__.
    """
    from .textops import resolve_tokens

    gram = lambda c: F.explode(  # noqa: E731
        shingles(resolve_tokens(c, tokenizer), n)
    ).alias("g")
    ev = (
        eval_df.select(F.col(bench_col).alias("bench"), gram(F.col(text_col)))
        .select("bench", F.md5("g").alias("gram_md5"))
        .distinct()
    )
    ev_sizes = ev.groupBy("bench").agg(
        F.count("*").alias("n_eval_grams")
    )
    matched = (
        df.select(F.col(id_col), gram(F.col(text_col)))
        .select(id_col, F.md5("g").alias("gram_md5"))
        .join(F.broadcast(ev), "gram_md5")
        .groupBy("bench")
        .agg(
            F.count_distinct("gram_md5").alias("n_hit_grams"),
            F.count_distinct(id_col).alias("n_hit_docs"),
        )
    )
    total = df.select(F.count("*").alias("__n_docs"))
    return (
        ev_sizes.join(matched, "bench", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bench",
            F.col("n_eval_grams").cast("long").alias("n_eval_grams"),
            F.coalesce("n_hit_grams", F.lit(0)).cast("long").alias("n_hit_grams"),
            F.coalesce("n_hit_docs", F.lit(0)).cast("long").alias("n_hit_docs"),
            F.round(
                F.coalesce("n_hit_grams", F.lit(0)).cast("double")
                / F.col("n_eval_grams").cast("double"),
                6,
            ).alias("gram_frac"),
            F.round(
                F.coalesce("n_hit_docs", F.lit(0)).cast("double")
                / F.col("__n_docs").cast("double"),
                6,
            ).alias("doc_frac"),
        )
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    sep: str = ". ",
    checkpoint: bool = True,
) -> DataFrame:
    """C4's corpus-level duplicated-span removal (Raffel et al. 2020
    §2.2: "we removed any duplicated three-sentence spans"): split each
    document into sentences on the literal ``sep`` boundary, hash every
    ``n``-sentence sliding span, and wherever a span occurs ≥ 2 times
    corpus-wide, REMOVE its sentences from every occurrence except the
    globally-first one (ownership = min (doc_id, position) — a total
    order, so re-runs and engines agree), then re-assemble each doc
    from its surviving sentences (joined with ``sep``; reassembly is
    byte-identical to the input whenever nothing was removed, because
    the literal split is lossless under the same join).

    Complements the family: :func:`line_dedup` drops corpus-hot LINES,
    :func:`repeated_spans` SCORES token-level repetition, ``span_dedup``
    EDITS at sentence granularity — the missing C4 stage.

    Emits (doc_id, n_sentences, n_kept, n_dup_spans, clean_md5,
    clean_len).

    Plan shape at 100 TB (window-free — ownership via min(struct), not
    rank):
      1. span digests build map-side (zip_with chain over shifted
         sentence slices; the sentence array is checkpointed once —
         the chain references it n+1 times and Catalyst does not CSE
         nested HOFs);
      2. ONE corpus-wide partial-agg groupBy on the 16-byte digest
         computes (owner, count) — the only O(corpus) shuffle, and it
         carries digests, never text;
      3. losers re-join starts on the digest (co-partitioned with the
         groupBy — Catalyst reuses the exchange) and mark their n
         sentence indices;
      4. deletion sets aggregate the LOSERS frame only (small), and the
         edit applies as a positional array filter after one left join
         onto the sentence arrays — corpus text never explodes and
         never rides a shuffle; when few docs were edited AQE broadcasts
         the deletion side and text does not move at all.
    """
    import re as _re

    sdf = df.select(
        F.col(id_col),
        F.split(F.col(text_col), _re.escape(sep)).alias("__s"),
    ).localCheckpoint(eager=False)
    sents = F.col("__s")
    m = F.greatest(F.size(sents) - n + 1, F.lit(0))
    sp = F.slice(sents, 1, m)
    for j in range(1, n):
        sp = F.zip_with(
            sp, F.slice(sents, 1 + j, m), lambda a, b: F.concat(a, F.lit(sep), b)
        )
    grams = F.transform(
        F.when(F.size(sents) >= n, sp).otherwise(F.array().cast("array<string>")),
        lambda s: F.md5(s),
    )
    # (doc, p, digest) feeds two consumers with different exchanges
    # (corpus count vs loser join) — checkpoint so the span build runs
    # once (the same two-consumer trap repeated_spans documents).
    starts = sdf.select(
        F.col(id_col), F.posexplode(grams).alias("p", "h")
    ).localCheckpoint(eager=False)
    own = (
        starts.groupBy("h")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("p"))).alias("__first"),
            F.count("*").alias("__c"),
        )
        .filter(F.col("__c") >= 2)
        .select("h", "__first")
    )
    dups = (
        starts.join(own, "h")
        .filter(F.struct(F.col(id_col), F.col("p")) != F.col("__first"))
        .select(id_col, "p")
    )
    # Per-doc deletion sets aggregate the SMALL losers frame — sentence
    # TEXT never explodes and never rides a shuffle keyed by anything:
    # the one text movement left is the edited-docs join below, and AQE
    # turns even that into a broadcast when few docs were edited (the
    # common case). (The first cut exploded every sentence through an
    # anti-join + collect_list reassembly — TWO corpus-text exchanges;
    # removing them measured 69→54 s at 4 cores / 35→28 s at 16 on the
    # 200k-doc token-level workload, BENCH §a0-ops — the remaining cost
    # is the span-digest build+shuffle the operator exists to pay.)
    ed = dups.groupBy(id_col).agg(
        F.count("*").cast("int").alias("__nd"),
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.collect_list(F.sequence(F.col("p"), F.col("p") + (n - 1)))
                )
            )
        ).alias("__del"),
    )
    # positional filter: __del is a materialized row value here (join
    # output attribute), so the lambda's outer reference is a cheap
    # per-row read, not a re-evaluated expression pipeline (the HOF
    # outer-ref hazard applies to expressions, not attributes).
    kept_arr = F.when(
        F.col("__del").isNull(), F.col("__s")
    ).otherwise(
        F.filter(
            F.col("__s"),
            lambda x, i: ~F.array_contains(F.col("__del"), i),
        )
    )
    jd = sdf.join(ed, id_col, "left").select(
        F.col(id_col),
        F.size("__s").cast("int").alias("n_sentences"),
        F.coalesce(F.col("__nd"), F.lit(0)).alias("n_dup_spans"),
        kept_arr.alias("__k"),
    )
    if checkpoint:
        # __k feeds 3 outputs (no-CSE rule); checkpoint=False exists for
        # plan capture — the lazy checkpoint truncates visible lineage
        jd = jd.localCheckpoint(eager=False)
    clean = F.array_join(F.col("__k"), sep)
    return jd.select(
        F.col(id_col),
        "n_sentences",
        F.size("__k").cast("int").alias("n_kept"),
        "n_dup_spans",
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("int").alias("clean_len"),
    )


def ccnet_normalize(c: F.Column) -> F.Column:
    """CCNet's dedup-hash text normalization (Wenzek et al. 2020, §3.1
    — public method): lowercase, every unicode digit folded to ``0``,
    unicode punctuation removed, whitespace collapsed. The POINT is
    that near-identical boilerplate pages differing only in dates,
    counters or punctuation hash to ONE key, so paragraph/document
    dedup catches them; the normalized form is only ever hashed — the
    kept text is untouched.

    Pure JVM regexp chain (whole-stage codegen, no Python): the
    ``\\p{Nd}`` / ``\\p{P}`` classes are in the Java∩RE2 regex subset
    the module's PII scrubber already relies on, so the DuckDB oracle
    runs the same program. The whitespace collapse spells the class
    OUT as ``[ \\t\\n\\x0B\\f\\r]`` rather than ``\\s`` — Java's
    ``\\s`` includes vertical tab, RE2's does not, so the shorthand
    would hash ``a\\x0Bb`` differently across engines (and \\x0B is
    real in PDF/DOC-extracted web text).
    """
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(c), r"\p{Nd}", "0"),
                r"\p{P}",
                "",
            ),
            r"[ \t\n\x0B\f\r]+",
            " ",
        )
    )


def ccnet_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup keyed on :func:`ccnet_normalize` of the text — the
    CCNet hash-normalization dedup step. Same single-shuffle shape and
    output contract as :func:`exact_dedup` (survivor = min id per
    digest, duplicate count carried), but ``Posted on 2024-01-02!`` and
    ``posted on 2025-11-30`` now collapse to one group.

    Delegates to :func:`exact_dedup` over the pre-normalized text
    (the :func:`nfc_dedup` pattern — ONE place owns the survivor
    rule): ``ccnet_normalize`` output is already lowercased,
    single-spaced and trimmed, so exact_dedup's tokens+concat_ws
    digest chain is the identity on it — md5(normalized) exactly.
    """
    return exact_dedup(
        df.withColumn(text_col, ccnet_normalize(F.col(text_col))),
        id_col,
        text_col,
    )


def incremental_dedup(
    batch: DataFrame,
    corpus_digests: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    digest_col: str = "content_md5",
) -> DataFrame:
    """Deduplicate an INCOMING BATCH against an existing corpus — the
    production ingestion shape (a new crawl round / dump lands against
    petabytes already curated; re-running corpus-wide dedup per arrival
    is not an option). ``corpus_digests`` is the prior snapshot's
    digest table (e.g. accumulated :func:`exact_dedup` output).

    Plan shape is EXACTLY the engine's seen-set probe
    (engine.py `_links_minus_seen`), re-expressed at the curation
    layer — the asymmetric anti-join done right:

    - the batch's distinct digests (bounded by |batch|) BROADCAST into
      a left-semi join against the corpus digest scan — the corpus is
      only scanned, never shuffled, and with a digest-bucketed layout
      the scan prunes to the touched buckets;
    - the surviving hit set (≤ |batch digests|) broadcasts BACK onto
      the batch rows;
    - batch-internal dups resolve via one bounded groupBy(digest) on
      the batch itself (first occurrence = min id).

    Emits one row per batch doc: (id, digest, keep, reason) with
    ``reason`` ∈ {'corpus_dup', 'batch_dup', NULL}; ``keep`` marks the
    batch's first occurrence of a digest the corpus has never seen.
    """
    from .textops import tokens

    d = batch.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", tokens(F.col(text_col)))).alias(digest_col),
    )
    firsts = d.groupBy(digest_col).agg(F.min(id_col).alias("first_id"))
    hits = (
        corpus_digests.select(F.col(digest_col))
        .join(F.broadcast(firsts.select(digest_col)), digest_col, "leftsemi")
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    joined = (
        d.join(F.broadcast(firsts), digest_col)
        .join(F.broadcast(hits), digest_col, "left")
        .withColumn("in_corpus", F.coalesce("in_corpus", F.lit(False)))
    )
    return joined.select(
        F.col(id_col),
        F.col(digest_col),
        (~F.col("in_corpus") & (F.col(id_col) == F.col("first_id"))).alias(
            "keep"
        ),
        F.when(F.col("in_corpus"), F.lit("corpus_dup"))
        .when(F.col(id_col) != F.col("first_id"), F.lit("batch_dup"))
        .alias("reason"),
    )


def mirror_hosts(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    max_hosts_per_digest: int = 16,
) -> DataFrame:
    """Mirror-site detection (Broder/Bharat's shared-content host
    pairs — the crawl-hygiene step that stops a crawler fetching the
    same corpus once per mirror, and the curation step that stops a
    mirror farm weighting its content N×): host pairs ranked by the
    Jaccard overlap of their page-content digest sets.

    Candidate-then-verify over the module's exact-dedup digest, with
    the same hot-key discipline as `embedding_neardup_pairs`:

    - (host, digest) pairs are de-duplicated in ONE shuffle (text never
      shuffles — only host + the 16-byte digest);
    - digests on more than ``max_hosts_per_digest`` hosts are dropped
      BEFORE the pair join — site-template boilerplate shared by every
      host on a shared platform would otherwise contribute O(hosts²)
      candidate pairs per digest, and carries no mirror signal (a real
      mirror PAIR holds its content at 2 hosts, far under any sane
      cap). Totals use the same capped set, so the Jaccard's numerator
      and denominator agree;
    - the digest self-join is bounded by Σ c² over c ≤ cap, and the
      per-pair count is a partial-aggregated groupBy;
    - per-host digest totals are dimension-sized and broadcast back
      onto the pair frame.

    Emits one row per candidate pair (host_a < host_b, ≥1 shared
    digest): (host_a, host_b, n_shared, n_a, n_b, jaccard·6dp,
    is_mirror = jaccard ≥ ``min_jaccard``). Feed ``is_mirror`` pairs'
    losing side to ``url_blocklist_filter``.
    """
    hd = df.select(
        F.col(host_col).alias("host"),
        F.md5(F.concat_ws(" ", tokens(F.col(text_col)))).alias("digest"),
    ).distinct()
    # cold feeds THREE consumers (totals + both sides of the pair
    # self-join): materialize it once, or the tokenize+digest+distinct
    # +cap subtree re-executes per consumer (CLAUDE.md no-reuse rule)
    cold = hd.join(
        hd.groupBy("digest")
        .agg(F.count("*").alias("nh"))
        .filter(F.col("nh") <= max_hosts_per_digest)
        .select("digest"),
        "digest",
    ).localCheckpoint(eager=False)
    totals = cold.groupBy("host").agg(F.count("*").cast("long").alias("n"))
    pairs = (
        cold.alias("a")
        .join(cold.alias("b"), "digest")
        .filter(F.col("a.host") < F.col("b.host"))
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        pairs.join(
            F.broadcast(totals.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))),
            "host_a",
        )
        .join(
            F.broadcast(totals.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(jac, 6).alias("jaccard"),
            (jac >= min_jaccard).alias("is_mirror"),
        )
    )


def lsh_recall(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Eval harness for the MinHash-LSH stage (the dedup twin of
    `similarity.ann_recall`): how much of the TRUE near-dup pair set
    (exact shingle Jaccard >= ``threshold``, computed with the all-pairs
    shingle-join verifier) does the banded candidate generator recover,
    and how much of what it generates is real?

    ONE summary row: ``(n_true, n_cand, n_hit, recall, precision)`` —
    recall = hit/true (NULL when no true pair exists), precision =
    hit/candidates (NULL when no candidate), both 6 dp. These are the
    numbers `suggest_lsh_bands`' S-curve PREDICTS; this measures them.

    The ground-truth side shares one shingle per (doc, gram) row across
    its three consumers (lazy checkpoint — the module's no-CSE rule)
    and pairs docs through a shingle-equality self-join: O(Σ per-gram
    doc-count²), not O(n²) — but still super-linear on hot shingles,
    which is exactly why it is the documented VERIFIER: run it on a
    sample of the corpus (the `df` you pass in), never the whole crawl.
    """
    cand = minhash_candidates(df, id_col, text_col).localCheckpoint(eager=True)
    sh = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))
        ).alias("sh"),
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    inter_all = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.sh") == F.col("y.sh"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .groupBy(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    true_pairs = (
        inter_all.join(
            sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "n_a"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "n_b"),
            "id_b",
        )
        .filter(
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            )
            >= threshold
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    hit = true_pairs.join(cand, ["id_a", "id_b"], "leftsemi")
    row = (
        true_pairs.agg(F.count("*").cast("long").alias("n_true"))
        .crossJoin(cand.agg(F.count("*").cast("long").alias("n_cand")))
        .crossJoin(hit.agg(F.count("*").cast("long").alias("n_hit")))
    )
    return row.select(
        "n_true",
        "n_cand",
        "n_hit",
        F.when(
            F.col("n_true") > 0, F.round(F.col("n_hit") / F.col("n_true"), 6)
        ).alias("recall"),
        F.when(
            F.col("n_cand") > 0, F.round(F.col("n_hit") / F.col("n_cand"), 6)
        ).alias("precision"),
    )

"""Text-analysis operators for a training-data pipeline: tokenization,
shingling, language-ID, quality scoring, token counting, fingerprinting.

All pure ``pyspark.sql.functions`` column expressions (JVM-side,
vectorized, whole-stage codegen) — no UDFs. Each operator has an exact
ANSI-SQL equivalent (the DuckDB oracle in ``__spark_entry__.py``); the
token/shingle definitions below are the single source of truth shared by
the Spark and SQL sides.

Scale notes (100 TB corpus):
- everything is a narrow per-row projection or an explode+groupBy(doc_id)
  — aggregations are partial (map-side combine) and shuffle only
  (doc_id, key) pairs, never raw text;
- column pruning: callers should select (doc_id, text) before these ops
  so parquet never materializes unused columns.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 (pandas_udf type-hint resolution)
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Stopword sets for the n-gram/stopword language-ID heuristic.  Tiny and
# deterministic on purpose: the operator contract is the *mechanism*
# (per-language token-overlap scoring with a fixed tiebreak), not a
# state-of-the-art model — swap in real fastText-style tables in prod.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "value", "data", "fast"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "es"],
    "pl": ["nie", "to", "się", "jest", "na", "i", "z", "do"],
}
LANG_ORDER = sorted(LANG_STOPWORDS)  # deterministic tiebreak: alphabetical

# English-ish stopword list used by the quality score (ratio feature).
QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]

PUNCT_RE = r"[.,!?;:]"
WORD_RE = "[a-z0-9]+"  # BPE-ish word pieces after lowercasing


def tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text (empties dropped).

    SQL twin: list_filter(string_split_regex(lower(t), '\\s+'), x -> x <> '')
    """
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


_nfc_udf = None  # created lazily: pandas_udf needs an active session


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC canonical composition of a string column — the
    standard pre-dedup normalization for web text, where the same
    visible string arrives both precomposed (``é`` U+00E9) and
    decomposed (``e`` + U+0301) depending on the producing editor/OS.

    Spark has no JVM NFC builtin, so this is the sanctioned Python
    path: one Arrow-batched pandas UDF whose per-element work is
    CPython's C-implemented ``unicodedata.normalize`` — no Python-level
    parsing, no row-at-a-time Spark UDF. NFC only (canonical): ligature
    / fullwidth / compatibility folds (NFKC) are deliberately NOT
    applied — they change content, not representation.

    SQL twin (DuckDB): ``nfc_normalize(text)`` (verified char-identical
    to unicodedata across composed/decomposed/hangul/combining cases).
    """
    global _nfc_udf
    if _nfc_udf is None:

        @F.pandas_udf("string")
        def _nfc(s: pd.Series) -> pd.Series:
            import unicodedata

            return s.map(
                lambda x: unicodedata.normalize("NFC", x) if x is not None else None
            )

        _nfc_udf = _nfc
    return _nfc_udf(text)


def resolve_tokens(text: Column, tokenizer=None) -> Column:
    """The pluggable tokenizer hook shared by token-space operators
    (``token_count``, ``pack_sequences``, ``decontaminate``,
    ``repeated_spans``): ``tokenizer=None`` keeps the module's
    whitespace contract (:func:`tokens` — all DuckDB oracles are
    defined over it); otherwise ``tokenizer`` is any callable mapping
    a string Column to an ``array<string>`` Column — e.g.
    :class:`BpeTokenizer` — and the operator runs in that token space
    (real training pipelines define dedup/decontamination/packing over
    BPE tokens: Lee et al. 2022, GPT-3 appendix C)."""
    return tokens(text) if tokenizer is None else tokenizer(text)


class BpeTokenizer:
    """Deterministic greedy longest-match vocab tokenizer — the
    vectorized ``tokenizer=`` plug-in for token-space operators.

    Not a trained BPE (no merges learned here); it applies a FIXED
    vocabulary with the same greedy longest-match-first segmentation a
    BPE vocab is used with at inference: lowercase (optional),
    whitespace pre-split, then per word repeatedly emit the longest
    vocab piece matching at the cursor; a maximal unmatched run emits
    one ``unk``. Deterministic by construction (pure function of
    (vocab, text)), so re-runs and the driver/executor sides agree.

    Spark path: ``__call__(col)`` returns an Arrow-batched pandas UDF
    column — the vocab ships once per task inside the serialized UDF
    closure (fine to ~10^5 pieces; wrap the piece list in
    ``SparkContext.broadcast`` upstream for bigger vocabs and pass the
    ``.value`` in). ``tokenize(str)`` is the driver-side twin used by
    tests/oracles."""

    def __init__(self, vocab: list[str], lowercase: bool = True, unk: str = "<unk>"):
        import re

        if not vocab:
            raise ValueError("BpeTokenizer needs a non-empty vocab")
        # longest-first alternation = greedy longest match at each cursor
        # (Python re alternation is first-match, so order IS the policy)
        self.pieces = sorted(set(vocab), key=lambda p: (-len(p), p))
        self.lowercase = lowercase
        self.unk = unk
        self._re = re.compile("|".join(re.escape(p) for p in self.pieces))

    def tokenize(self, text: str | None) -> list[str]:
        if not text:
            return []
        if self.lowercase:
            text = text.lower()
        out: list[str] = []
        for word in text.split():
            pos = 0
            while pos < len(word):
                m = self._re.match(word, pos)
                if m:
                    out.append(m.group(0))
                    pos = m.end()
                else:
                    nxt = self._re.search(word, pos)
                    out.append(self.unk)
                    pos = nxt.start() if nxt else len(word)
        return out

    def __call__(self, col: Column) -> Column:
        from pyspark.sql.functions import pandas_udf

        tok = self

        @pandas_udf("array<string>")
        def _tk(s: pd.Series) -> pd.Series:
            return s.map(tok.tokenize)

        return _tk(col)


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles, in order; [] when fewer than n tokens.

    Built as a zip_with chain over shifted slices, NOT transform +
    element_at(toks, i): an outer-column reference inside a lambda is
    re-evaluated per element by the interpreted higher-order-function
    path, which turns shingling into O(len²) token-array recomputation
    (measured ~100× slower on real documents).

    SQL twin uses range(0, len-n+1) + 1-based list indexing.
    """
    m = F.greatest(F.size(toks) - n + 1, F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, 1 + j, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID (reference-class heuristic).

    Scores each language by |distinct(tokens) ∩ stopwords(lang)|; the
    prediction is the max score with alphabetical-language tiebreak;
    all-zero scores → 'und'.  Pure array ops, no shuffle; the distinct
    token array is materialized once (lazy checkpoint) because the
    per-language scores reference it |languages| times and Catalyst
    does not CSE nested HOFs (the tokenize pipeline re-ran per language
    — measured 1.4× at 200k docs; see CLAUDE.md perf notes).
    """
    tdf = df.select(
        F.col(id_col),
        F.array_distinct(tokens(F.col(text_col))).alias("__t"),
    ).localCheckpoint(eager=False)
    toks = F.col("__t")
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])))
        for lang in LANG_ORDER
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    pred = F.lit("und")
    # reverse order so that on ties the alphabetically-first language wins
    for lang, sc in reversed(list(zip(LANG_ORDER, scores))):
        pred = F.when((best > 0) & (sc == best), F.lit(lang)).otherwise(pred)
    return tdf.select(F.col(id_col), pred.alias("lang_pred"), best.alias("lang_score"))


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    Emits one row per doc: n_tokens, mean_token_len, punct_ratio,
    stopword_ratio, and a [0,1] quality score (fixed linear blend).
    All ratios rounded to 6dp for cross-engine float stability.

    The token array and the char-level scalars are materialized once
    (lazy checkpoint): the features below reference the token pipeline
    ~5 times and Catalyst does not CSE nested HOFs (see CLAUDE.md perf
    notes — the tokenize ran per feature before).
    """
    t0 = F.col(text_col)
    tdf = df.select(
        F.col(id_col),
        tokens(t0).alias("__t"),
        F.length(t0).alias("__nc"),
        (F.length(t0) - F.length(F.regexp_replace(t0, PUNCT_RE, ""))).alias(
            "__np"
        ),
    ).localCheckpoint(eager=False)
    toks = F.col("__t")
    n_tok = F.size(toks)
    n_char = F.col("__nc")
    n_punct = F.col("__np")
    sw = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    mean_len = F.round(
        F.when(n_tok > 0, (F.length(F.concat_ws("", toks))) / n_tok).otherwise(F.lit(0.0)), 6
    )
    punct_ratio = F.round(F.when(n_char > 0, n_punct / n_char).otherwise(F.lit(0.0)), 6)
    stop_ratio = F.round(F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)), 6)
    # fixed blend (0..10): long-enough docs with some stopwords and few
    # punct runs. Integer weights over ≤6dp terms keep the score exactly
    # representable at 6dp — so round(·,6) can never hit a .5 boundary
    # and the DuckDB oracle agrees bit-for-bit.
    len_term = F.least(n_tok / F.lit(40.0), F.lit(1.0))
    score = F.round(
        F.lit(5) * len_term + F.lit(3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(2) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))),
        6,
    )
    return tdf.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def token_count(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=None,
) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex word pieces.

    n_ws_tokens = whitespace-split count; n_word_pieces = matches of
    ``[a-z0-9]+`` on the lowercased text (a cheap stand-in for a BPE
    pre-tokenizer); n_uniq_tokens = distinct whitespace tokens.

    ``tokenizer`` (see :func:`resolve_tokens`) swaps the token space:
    n_ws_tokens / n_uniq_tokens then count the tokenizer's pieces
    (column names kept — the default path is the oracle contract);
    n_word_pieces stays the regex estimate either way.
    """
    t = F.col(text_col)
    toks = resolve_tokens(t, tokenizer)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.regexp_count(F.lower(t), F.lit(WORD_RE)).alias("n_word_pieces"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram (Shannon) entropy — the standard
    gibberish/repetitiveness signal complementary to
    :func:`gopher_repetition`: low entropy = a few tokens dominate
    (keyword stuffing, boilerplate loops), entropy near log2(n_unique)
    = maximally mixed.

    Computed as H = log2(n) − Σ c·log2(c) / n (algebraically identical
    to −Σ p·log2 p but needs NO join of per-token counts back to
    per-doc totals — both aggregates come out of the same two
    partial-aggregated groupBys; the DuckDB twin uses the same formula
    so float parity holds at 6 dp). norm_entropy = H / log2(n_unique),
    NULL when n_unique ≤ 1 (single-token and empty docs have no mixing
    to measure); token-less docs keep a row with zero counts.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    cnt = tok.groupBy(id_col, "token").agg(
        F.count("*").cast("double").alias("c")
    )
    agg = cnt.groupBy(id_col).agg(
        F.sum("c").alias("n"),
        F.count("*").alias("u"),
        F.sum(F.col("c") * F.log2("c")).alias("sclc"),
    )
    ent = F.log2("n") - F.col("sclc") / F.col("n")
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n"), F.lit(0.0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("n_unique"),
            F.round(ent, 6).alias("entropy"),
            F.when(
                F.col("u") > 1,
                F.round(ent / F.log2(F.col("u").cast("double")), 6),
            ).alias("norm_entropy"),
        )
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
    min_count: int = 2,
) -> DataFrame:
    """Corpus vocabulary: token → (count, doc frequency), top_k by count
    (tokenizer-training precursor). Explode + two partial-aggregated
    counts; the shuffle carries (token, partial counts), never text.
    Deterministic order: count desc, then token asc.

    Ranking goes through ``ranked_topk`` (distributed partition-offset
    stamping) — a bare ``Window.orderBy(count desc)`` would funnel the
    ENTIRE vocabulary through one task, the classic single-partition
    window a 100 TB corpus cannot run."""
    from .topk import ranked_topk

    tok = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    # doc_freq = one exploded row per (doc, distinct token), counted per
    # token — no doc-id column needed (one row of the source IS one doc)
    agg = (
        df.select(F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("count"))
    ranked = ranked_topk(
        counts.join(agg, "token")
        .filter(F.col("count") >= min_count)
        .withColumn("__negc", -F.col("count")),
        ["__negc", "token"],
        top_k,
        pos_col="rank",
    )
    return ranked.select(
        F.col("rank").cast("int").alias("rank"), "token", "count", "doc_freq"
    )


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_tf: int = 1,
    tokenizer=None,
) -> DataFrame:
    """Inverted-index postings export — the classic downstream of a
    crawl (term → the top-``k`` documents ranked by term frequency),
    i.e. an impact-ordered posting list per term ready for a search
    index or a keyword-retrieval baseline over the corpus.

    ONE explode + ONE partial-aggregated ``groupBy(term, doc)`` (the
    shuffle carries (term, id, count) — never text), then per-term
    ranking through ``grouped_topk``: the hub problem is structural
    here — a stopword's posting list spans nearly EVERY document, so a
    bare ``Window.partitionBy(term)`` would funnel the whole corpus'
    rows for that term through one task; grouped_topk's local prune
    bounds each term at ≤ P·k candidate rows first. Order within a
    term: tf desc, then id asc (deterministic, engine-exact).

    Emits (term, doc_id, tf, rank), rank 1-based. ``tokenizer``
    follows the :func:`resolve_tokens` hook (default = the whitespace
    contract, so the DuckDB oracle replays it).
    """
    from .topk import grouped_topk

    tf = (
        df.select(
            F.col(id_col),
            F.explode(resolve_tokens(F.col(text_col), tokenizer)).alias("term"),
        )
        .groupBy("term", id_col)
        .agg(F.count("*").cast("long").alias("tf"))
        .filter(F.col("tf") >= min_tf)
    )
    ranked = grouped_topk(
        tf.withColumn("__negtf", -F.col("tf")),
        ["term"],
        ["__negtf", id_col],
        k,
        rank_col="rank",
        keep_rank=True,
    )
    return ranked.select(
        "term", id_col, "tf", F.col("rank").cast("int").alias("rank")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the sklearn-style smoothing — keyword
    extraction / doc-representation precursor).

    Two partial-aggregated groupBys (term frequency per doc, document
    frequency per token — both shuffle only (key, count) pairs), one
    broadcast-sized scalar N, and a PER-DOC window (bounded by the doc's
    vocabulary, never a global sort). tfidf is rounded to 6dp BEFORE the
    ranking so ordering is bit-stable across engines (ties break by
    token asc)."""
    n_docs = df.count()
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    scored = tf.join(dfreq, "token").withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1) / (F.col("dfreq") + 1)) + 1),
            6,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select(F.col(id_col), "rank", "token", "tf", "tfidf")
    )


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 30,
    min_quality: float = 4.0,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """The composed training-data filter — the pipeline a 100 TB corpus
    actually runs: exact dedup → language gate → quality gate, emitting
    the surviving documents with their scores.

    Composition stays lazy: Catalyst fuses the three operators' scans
    into one pass over (id, text); the only shuffle is the dedup window
    on the 16-byte content digest.
    """
    from .dedup import exact_dedup

    survivors = exact_dedup(df, id_col, text_col).select(id_col, "n_copies")
    li = lang_id(df, id_col, text_col)
    qs = quality_score(df, id_col, text_col)
    return (
        df.select(id_col)
        .join(survivors, id_col)
        .join(li, id_col)
        .join(qs, id_col)
        .filter(
            F.col("lang_pred").isin(list(langs))
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("quality") >= min_quality)
        )
        .select(id_col, "n_copies", "lang_pred", "n_tokens", "quality")
    )


# PII patterns: kept to syntax that Java regex (Spark) and RE2 (DuckDB)
# interpret IDENTICALLY — character classes, \b, \d, bounded repeats; no
# lookarounds (RE2 has none), no possessive quantifiers (Java-only).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{7,15}"


def _pii_chain(t0: Column) -> tuple[Column, Column, Column]:
    """The single point of truth for the PII replacement chain and its
    ORDER contract (emails → IPs → phones — emails first so digits
    inside an address never double-count as IP/phone material). Both
    :func:`pii_scrub` (counts + scrubbed-text md5) and
    :func:`scrub_text` (the pipeline's scrubbed-text expression) build
    from this; the `curate` oracle's SQL mirrors the same order."""
    t1 = F.regexp_replace(t0, PII_EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return t1, t2, t3


def scrub_text(col: Column) -> Column:
    """Scrubbed-text expression (see :func:`_pii_chain` for the order
    contract) — the reusable form consumed by the curation pipeline."""
    return _pii_chain(col)[2]


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII redaction: emails → <EMAIL>, IPv4s → <IP>, +intl phone
    numbers → <PHONE>, applied IN THAT ORDER (emails are scrubbed before
    the IP pass so digits inside an address are never double-counted;
    counts are taken on the text each pass actually sees).

    Pure regexp_count/regexp_replace column expressions — one
    projection, no shuffle, whole-stage codegen; at 100 TB this is a
    map-only pass that fuses with neighboring filters. Emits per-doc
    counts plus md5/length of the scrubbed text (the full-text contract
    without shipping text to the driver).
    """
    t0 = F.col(text_col)
    t1, t2, t3 = _pii_chain(t0)
    n_em = F.regexp_count(t0, F.lit(PII_EMAIL_RE))
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4_RE))
    n_ph = F.regexp_count(t2, F.lit(PII_PHONE_RE))
    return df.select(
        F.col(id_col),
        n_em.cast("int").alias("n_emails"),
        n_ip.cast("int").alias("n_ipv4"),
        n_ph.cast("int").alias("n_phones"),
        F.md5(t3).alias("clean_md5"),
        F.length(t3).cast("int").alias("clean_len"),
    )


def compression_ratio_str(s: str | None, level: int = 6) -> tuple | None:
    """Driver-side twin of :func:`compression_ratio`'s per-row rule:
    (n_bytes, n_compressed, ratio) of the UTF-8 encoding under zlib at
    ``level``; None for NULL/empty text (no bytes → no ratio)."""
    import zlib

    if not s:
        return None
    raw = s.encode("utf-8")
    comp = zlib.compress(raw, level)
    return (len(raw), len(comp), round(len(comp) / len(raw), 6))


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """zlib compression-ratio quality signal — the cheap repetition /
    boilerplate detector the published web-text pipelines gate on
    (Dolma §2.2 / RefinedWeb run gzip-ratio filters: machine-generated
    and template-spam pages compress far below prose; random or
    binary-ish payloads compress near 1.0). Emits
    ``(id, n_bytes, n_compressed, ratio)`` with ``ratio`` rounded to
    6 dp; NULL row for empty/NULL text.

    Scale shape: a pure PROJECTION — no shuffle, no state. The zlib
    pass is per-element C (CPython's zlib) inside ONE Arrow-batched
    pandas UDF: the sanctioned Python path (nfc_normalize precedent),
    never a row-at-a-time Spark UDF. Contract: zlib output at a fixed
    ``level`` is deterministic for a given zlib library; the driver
    twin (:func:`compression_ratio_str`) runs the same CPython zlib as
    the executors, so tests pin the rule bit-for-bit. Rows-only at the
    oracle (DuckDB has no zlib) — same class as fix_encoding.
    """
    import zlib  # noqa: F401  (documented dependency of the closure)

    @F.pandas_udf("struct<n_bytes:long,n_compressed:long,ratio:double>")
    def _cr(s: pd.Series) -> pd.DataFrame:
        import zlib as _z

        def one(x):
            if not x:
                return (None, None, None)
            raw = x.encode("utf-8")
            comp = _z.compress(raw, level)
            return (len(raw), len(comp), round(len(comp) / len(raw), 6))

        vals = s.map(one)
        return pd.DataFrame(
            vals.tolist(), columns=["n_bytes", "n_compressed", "ratio"],
            index=s.index,
        )

    out = df.select(F.col(id_col), _cr(F.col(text_col)).alias("__c"))
    return out.select(
        F.col(id_col),
        F.col("__c.n_bytes").alias("n_bytes"),
        F.col("__c.n_compressed").alias("n_compressed"),
        F.col("__c.ratio").alias("ratio"),
    )


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_top2gram_frac: float = 0.20,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1 class of
    rules): fraction of duplicated (non-blank) lines and the share of
    the most frequent word 2-gram, plus the keep/drop verdict.

    Line stats are pure array expressions (no shuffle). The top-2-gram
    share needs a per-(doc, gram) count — explode + two PARTIAL-
    aggregated groupBys (doc_id keys are bounded, no hot key; the
    shuffle carries (doc_id, gram, count), never text). Fractions are
    rounded to 6dp (cross-engine float contract).
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != F.lit(""))
    n_lines = F.size(lines)
    dup_frac = F.round(
        F.when(
            n_lines > 0,
            1.0 - F.size(F.array_distinct(lines)) / n_lines,
        ).otherwise(F.lit(0.0)),
        6,
    )
    base = df.select(
        F.col(id_col),
        n_lines.cast("int").alias("n_lines"),
        dup_frac.alias("dup_line_frac"),
    )
    grams = df.select(
        F.col(id_col),
        F.explode(shingles(tokens(t), 2)).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    top = per_gram.groupBy(id_col).agg(
        F.max("c").alias("__top"), F.sum("c").alias("__total")
    )
    out = base.join(top, id_col, "left").select(
        F.col(id_col),
        "n_lines",
        "dup_line_frac",
        F.round(
            F.coalesce(F.col("__top") / F.col("__total"), F.lit(0.0)), 6
        ).alias("top2gram_frac"),
    )
    return out.withColumn(
        "keep",
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top2gram_frac") <= max_top2gram_frac),
    )


def fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03 style).

    Hash every word n-gram shingle (md5 hex — stable across engines),
    slide a ``window``-wide window over the hash sequence, keep the min
    hash of each window, dedup.  Emits per-doc fingerprint-set size and
    the lexicographic min fingerprint (a compact doc signature).
    Docs with fewer than ``window`` shingles use the global min.
    """
    toks = tokens(F.col(text_col))
    sh = shingles(toks, n)
    # materialize the per-doc hash array ONCE (lazy checkpoint): the
    # window-min chain below references it in `window`+2 places (the
    # shifted slices, size, array_min), and Catalyst does not CSE
    # nested higher-order functions — inlined, the whole
    # tokenize→shingle→md5 pipeline re-ran per reference (measured ~6×:
    # 8.1 s → 1.3 s at sf0.1). One narrow (id, hashes) row per doc.
    hdf = df.select(
        F.col(id_col), F.transform(sh, lambda s: F.md5(s)).alias("__h")
    ).localCheckpoint(eager=False)
    hashes = F.col("__h")
    nwin = F.size(hashes) - window + 1
    # rolling window-min as a zip_with chain over shifted slices (same
    # outer-reference-in-lambda hazard as shingles(): array_min(slice(h,
    # i, w)) inside a transform re-evaluates the full hash array per
    # window position)
    m = F.greatest(nwin, F.lit(0))
    win_mins = F.slice(hashes, 1, m)
    for j in range(1, window):
        win_mins = F.zip_with(
            win_mins, F.slice(hashes, 1 + j, m), lambda a, b: F.least(a, b)
        )
    fps = F.when(nwin >= 1, F.array_distinct(win_mins)).otherwise(
        F.when(F.size(hashes) > 0, F.array(F.array_min(hashes))).otherwise(
            F.array().cast("array<string>")
        )
    )
    return hdf.select(
        F.col(id_col),
        F.size(fps).alias("n_fingerprints"),
        F.array_min(fps).alias("min_fingerprint"),
    )


# --- C4-style line-level cleaning (Raffel et al. 2020, JMLR §2.2) -----------

# Placeholder blocklist (deterministic, tiny — the operator contract is the
# word-boundary page gate, not the list; swap in the real "Dirty, Naughty,
# Obscene or Otherwise Bad Words" list in prod, same as LANG_STOPWORDS).
C4_BADWORDS = ["badword1", "badword2", "badword3"]

# C4 keeps lines "ending in a terminal punctuation mark (i.e. a period,
# exclamation mark, question mark, or end quotation mark)".  The match runs
# on the line with ALL trailing whitespace regex-stripped first — Java '$'
# matches before a final \r (CRLF residue after the \n split) while RE2/
# Python do not, so a bare rtrim+'$' silently diverges across engines on
# CRLF text; stripping \s+$ first makes every engine see the same tail.
C4_TERMINAL_RE = r'[.!?"]$'


def c4_kept_lines(text: Column, min_words_per_line: int = 3) -> Column:
    """The C4 LINE rules as a reusable expression: the array of lines
    that survive rules 1-3 (terminal punctuation on the rtrimmed line,
    ≥ ``min_words_per_line`` whitespace words, no "javascript") — the
    single point of truth shared by :func:`c4_clean` (scoring) and the
    curation pipeline's editing gate. Callers that reference the array
    more than once must materialize it (no-CSE rule)."""

    def _line_ok(line: Column) -> Column:
        words = F.filter(F.split(F.lower(line), r"\s+"), lambda x: x != F.lit(""))
        return (
            F.regexp_replace(line, r"\s+$", "").rlike(C4_TERMINAL_RE)
            & (F.size(words) >= min_words_per_line)
            & ~F.contains(F.lower(line), F.lit("javascript"))
        )

    return F.filter(F.split(text, "\n"), _line_ok)


def c4_page_ok(
    text: Column, badwords: tuple[str, ...] = tuple(C4_BADWORDS)
) -> Column:
    """The C4 PAGE gates that read the ORIGINAL text (lorem ipsum /
    curly bracket / blocklist whole-token) — rule 4 (min sentences) is
    computed by callers on the CLEANED text, so it lives with them."""
    return (
        ~F.contains(F.lower(text), F.lit("lorem ipsum"))
        & ~F.contains(text, F.lit("{"))
        & ~F.contains(text, F.lit("}"))
        & (
            F.size(
                F.array_intersect(
                    tokens(text), F.array(*[F.lit(w) for w in badwords])
                )
            )
            == 0
        )
    )


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = tuple(C4_BADWORDS),
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2) — the classic
    web-text curation stage BETWEEN raw extraction and the doc-level
    gates (`quality_score` / `gopher_repetition` judge whole documents;
    C4 edits them line by line and re-assembles the survivors):

    line keep rules (applied per ``\\n``-line, whitespace-rtrimmed):
      1. ends in terminal punctuation (``. ! ?`` or end-quote) —
         boilerplate/menu/footer lines rarely do;
      2. has at least ``min_words_per_line`` whitespace words;
      3. does not contain the word "javascript" (case-insensitive).
    page drop rules (on the ORIGINAL text, per the paper):
      4. fewer than ``min_sentences`` sentences survive (sentence :=
         a ``[.!?]`` occurrence in the cleaned text);
      5. contains "lorem ipsum" (case-insensitive) or a curly bracket
         (either ``{`` or ``}`` — a truncated code page may carry only
         the closing one);
      6. contains any blocklist word as a whole (whitespace) token.

    Emits per-doc line/sentence counts, the keep verdict, and
    md5/length of the cleaned text (the full-text contract without
    shipping text anywhere).

    Scale: a pure map-side projection — no shuffle, no join, no window;
    at 100 TB this fuses with the neighboring scan.  The kept-lines
    array is materialized once behind a lazy localCheckpoint because
    the output derives four expressions from it and Catalyst does not
    CSE nested higher-order functions (CLAUDE.md perf rules); the
    re-assembled string join itself is then linear per reference.
    """
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.size(F.split(t, "\n")).cast("int").alias("n_lines"),
        c4_kept_lines(t, min_words_per_line).alias("__kept"),
        c4_page_ok(t, badwords).alias("__page_ok"),
    ).localCheckpoint(eager=False)
    clean = F.array_join(F.col("__kept"), "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]")).cast("int")
    return base.select(
        F.col(id_col),
        "n_lines",
        F.size("__kept").cast("int").alias("n_kept"),
        n_sent.alias("n_sentences"),
        (F.col("__page_ok") & (n_sent >= F.lit(min_sentences))).alias("keep"),
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("int").alias("clean_len"),
    )


# --- Mojibake repair (ftfy-class, as used in GPT-2/OpenWebText prep) --------

_fix_encoding_udf = None  # created lazily: pandas_udf needs an active session


def fix_encoding_str(s: str | None, max_passes: int = 2) -> str | None:
    """Driver-side twin of :func:`fix_encoding`'s repair rule — the
    single point of truth for the contract (the pandas UDF maps this
    exact function).

    Repairs UTF-8-read-as-Latin-1 mojibake ("é" stored as "Ã©"): if
    the text round-trips ``latin-1 encode → utf-8 decode`` cleanly AND
    the result is strictly shorter (multi-byte sequences collapse to
    one char — a no-op round-trip can never shrink pure Latin-1), it
    was double-encoded; repeat up to ``max_passes`` times for
    double-mojibake.  Anything that fails either codec is returned
    unchanged, so ASCII, non-Latin-1 text (CJK etc.) and ordinary
    accented Latin-1 text (whose byte image is invalid UTF-8) are
    never touched.  The rule's ONE false-positive class — shared with
    every mojibake fixer, ftfy included — is genuine text whose
    Latin-1 bytes happen to form valid multi-byte UTF-8: e.g. a
    literal "Â" immediately followed by a continuation-range char
    (a doc ABOUT mojibake quoting "Â¡") is indistinguishable from
    true mojibake by construction and gets rewritten.
    """
    if s is None:
        return None
    for _ in range(max_passes):
        try:
            repaired = s.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s
        if len(repaired) >= len(s):
            return s
        s = repaired
    return s


def fix_encoding(text: Column, max_passes: int = 2) -> Column:
    """Mojibake repair for a string column — the ftfy-role pass (The
    Pile / OpenWebText pipelines run `ftfy.fix_text` before any other
    gate) restricted to its dominant, loss-free rule: reverse
    UTF-8-decoded-as-Latin-1 double encoding (see
    :func:`fix_encoding_str` for the exact contract).

    Spark has no byte-level codec builtin for Latin-1, so like
    :func:`nfc_normalize` this is the sanctioned Python path: one
    Arrow-batched pandas UDF whose per-element work is CPython's
    C-implemented codecs — no Python-level byte loops.  Map-only, no
    shuffle; no DuckDB oracle exists (DuckDB is UTF-8-only), so the
    contract entry is rows-only and exactness is pinned by pytest
    against hand-built mojibake pairs + a property sweep.
    """
    global _fix_encoding_udf
    if _fix_encoding_udf is None:
        _fix_encoding_udf = {}
    if max_passes not in _fix_encoding_udf:  # one cached UDF per depth
        n = max_passes

        @F.pandas_udf("string")
        def _fix(s: pd.Series) -> pd.Series:
            return s.map(lambda x: fix_encoding_str(x, max_passes=n))

        _fix_encoding_udf[max_passes] = _fix
    return _fix_encoding_udf[max_passes](text)


# --- Gopher quality rules (Rae et al. 2021, Appendix A1.1) -------------------

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.10,
    max_bullet_frac: float = 0.90,
    max_ellipsis_frac: float = 0.30,
    min_alpha_frac: float = 0.80,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher QUALITY rule family (Rae et al. 2021 §A1.1; defaults
    are the paper's published bounds) — the sibling of
    :func:`gopher_repetition`, which covers the REPETITION rules:

      1. ``min_words ≤ |words| ≤ max_words``;
      2. mean word length in ``[min_mean_word_len, max_mean_word_len]``;
      3. symbol-to-word ratio (``#`` and ``…`` occurrences / words)
         ≤ ``max_symbol_ratio``;
      4. fraction of non-blank lines starting with a bullet
         (``• - *``) ≤ ``max_bullet_frac``;
      5. fraction of non-blank lines ending with an ellipsis
         (``…`` or ``...``) ≤ ``max_ellipsis_frac``;
      6. fraction of words containing ≥ 1 ``[a-z]`` character
         ≥ ``min_alpha_frac`` (words are lowercased by the module's
         token contract);
      7. at least ``min_stopword_hits`` DISTINCT words from the
         paper's 8-word stop list present.

    Emits the per-doc metrics (6dp-rounded fractions — the
    cross-engine float contract) and the keep verdict. Pure array
    expressions over one projection — no shuffle; the token and line
    arrays are materialized once (lazy checkpoint) because seven rules
    read them and Catalyst does not CSE nested HOFs (the lang_id
    pattern). Empty docs (0 words) fail rule 1 and emit 0-valued
    metrics rather than NULLs.
    """
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        tokens(t).alias("__w"),
        F.filter(F.split(t, "\n"), lambda x: F.trim(x) != F.lit("")).alias("__l"),
        (
            F.length(t) - F.length(F.regexp_replace(t, r"[#…]", ""))
        ).alias("__sym"),
    ).localCheckpoint(eager=False)
    w, lines = F.col("__w"), F.col("__l")
    n_words = F.size(w)
    n_lines = F.size(lines)
    mean_len = F.round(
        F.when(
            n_words > 0,
            F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            / n_words,
        ).otherwise(F.lit(0.0)),
        6,
    )
    sym_ratio = F.round(
        F.when(n_words > 0, F.col("__sym") / n_words).otherwise(F.lit(0.0)), 6
    )
    # edge whitespace is regex-stripped before the anchored matches: Java
    # '$' matches before a trailing \r where RE2/Python do not (the same
    # CRLF divergence c4_kept_lines guards against)
    bullet_frac = F.round(
        F.when(
            n_lines > 0,
            F.size(
                F.filter(
                    lines,
                    lambda x: F.regexp_replace(x, r"^\s+", "").rlike(r"^[•\-*]"),
                )
            )
            / n_lines,
        ).otherwise(F.lit(0.0)),
        6,
    )
    ellipsis_frac = F.round(
        F.when(
            n_lines > 0,
            F.size(
                F.filter(
                    lines,
                    lambda x: F.regexp_replace(x, r"\s+$", "").rlike(
                        r"(…|\.\.\.)$"
                    ),
                )
            )
            / n_lines,
        ).otherwise(F.lit(0.0)),
        6,
    )
    alpha_frac = F.round(
        F.when(
            n_words > 0,
            F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / n_words,
        ).otherwise(F.lit(0.0)),
        6,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(w), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    return base.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.cast("int").alias("stopword_hits"),
        (
            (n_words >= F.lit(min_words))
            & (n_words <= F.lit(max_words))
            & (mean_len >= F.lit(min_mean_word_len))
            & (mean_len <= F.lit(max_mean_word_len))
            & (sym_ratio <= F.lit(max_symbol_ratio))
            & (bullet_frac <= F.lit(max_bullet_frac))
            & (ellipsis_frac <= F.lit(max_ellipsis_frac))
            & (alpha_frac >= F.lit(min_alpha_frac))
            & (stop_hits >= F.lit(min_stopword_hits))
        ).alias("keep"),
    )


def score_quantiles(
    df: DataFrame,
    score_col: str = "score",
    strata: tuple[str, ...] = ("lang",),
    probs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Per-stratum EXACT quantiles of a score column — the calibration
    step behind every per-language gate threshold (FineWeb/CCNet tune
    quality and perplexity cutoffs per language, not globally: the same
    absolute score means different things in different strata). Feed it
    ``quality_score``/``lm_score``/``compression_ratio`` output, read
    off the per-stratum cutoff, put it in the gate.

    Emits ``(*strata, p, q)`` — one row per (stratum, probability),
    ``q`` the linearly-interpolated type-7 quantile at ``p``, 6 dp.
    Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` share
    the (n-1)·p interpolation bit-for-bit on doubles (probed), so the
    oracle hash-matches.

    Scale contract: exact ``percentile`` BUFFERS each group's values in
    the aggregation — strata are dimension-sized but group value counts
    are corpus-scale, so at 100 TB run this over a stratified sample
    (:func:`~crawl_spark.operators.sampling.hash_sample` composes: a
    10^6-row-per-stratum sample puts quantile error at ~1e-3) or swap
    in ``approx_percentile`` where cross-engine exactness isn't needed.
    The output side is always dimension-sized: |strata| × |probs| rows.
    """
    plist = [float(p) for p in probs]
    if not plist:
        raise ValueError("score_quantiles: probs must be non-empty")
    scols = [F.col(s) for s in strata]
    agg = df.groupBy(*scols).agg(
        F.percentile(F.col(score_col).cast("double"), F.lit(plist)).alias("__q")
    )
    parr = F.array(*[F.lit(p) for p in plist])
    return agg.select(
        *strata, F.posexplode("__q").alias("__i", "q")
    ).select(
        *strata,
        F.element_at(parr, F.col("__i") + 1).alias("p"),
        F.round("q", 6).alias("q"),
    )


def score_quantiles_oracle_sql(
    inner_sql: str,
    score_col: str = "score",
    strata: tuple[str, ...] = ("lang",),
    probs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> str:
    """DuckDB twin of :func:`score_quantiles` over ``inner_sql`` (a
    SELECT producing the strata + score columns): ``quantile_cont`` on
    the DOUBLE-cast score, probabilities as explicit DOUBLE literals
    (a bare 0.1 list literal is DECIMAL in DuckDB — the cast keeps the
    p column's type and values engine-identical)."""
    sc = ", ".join(strata)
    plist = [float(p) for p in probs]
    pvals = ", ".join(f"CAST({p!r} AS DOUBLE)" for p in plist)
    qprobs = ", ".join(repr(p) for p in plist)
    return f"""
WITH x AS ({inner_sql}),
g AS (SELECT {sc}, quantile_cont(CAST({score_col} AS DOUBLE), [{qprobs}]) AS qs
      FROM x GROUP BY {sc}),
i AS (SELECT unnest(generate_series(1, {len(plist)})) AS i)
SELECT {sc}, ([{pvals}])[i] AS p, round(qs[i], 6) AS q
FROM g CROSS JOIN i
"""

"""Trained byte-pair encoding: learn merges FROM the corpus, on Spark.

Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units" (ACL 2016, arXiv:1508.07909 — the public BPE
algorithm): start from characters, repeatedly merge the most frequent
adjacent symbol pair. The repo's token-space operators (`token_count`,
`pack_sequences`, `decontaminate`, `repeated_spans`, `bm25_topk`)
already accept a ``tokenizer=`` hook (textops.resolve_tokens); this
module closes the loop by TRAINING that tokenizer on the crawl itself —
the step a real pretraining pipeline runs between curation and packing
(GPT-2/Llama tokenizers are BPE trained on a web corpus).

Scale design (100 TB corpus, 10^9 docs) — the key fact is that BPE
training is NOT a corpus-sized problem once word counts are in hand:

- ONE distributed pass computes word-TYPE counts: explode + a
  partial-aggregated groupBy, the only shuffle carries (word, partial
  count) — text never moves. Zipf's law makes the type table ~10^6-10^8
  rows for any corpus size.
- The type table is pruned to the ``max_word_types`` heaviest types
  (count desc, word asc) through ``ranked_topk`` — the distributed
  partition-offset ranking, never a single-task window — and only that
  BOUNDED table is collected (default 250k types ≈ a few MB; the same
  sanctioned driver-side footprint as the PQ codebooks). The pruned
  tail's token mass is measured in the same aggregation and reported in
  ``stats`` — standard practice (rare types contribute ~nothing to pair
  counts), made visible instead of silent.
- The merge loop itself runs driver-side over the type table with
  incremental pair-count maintenance (only words containing the merged
  pair are touched) — O(types · word_len) setup, near-O(touched) per
  merge. 32k merges over 250k types is seconds, and NO Spark job runs
  per merge (an iteration-per-merge dataflow would be 32k shuffles —
  the wrong engine for a table that fits in one task's memory).
- Encoding with the learned merges is :class:`MergeBpe` — an
  Arrow-batched pandas UDF with a per-word memo (Zipf again: a batch
  re-encodes few distinct words), pluggable wherever ``tokenizer=`` is.

Determinism contract (cross-run / cross-engine): pair ties break by
(count desc, pair lexicographically ascending); within a word, merges
apply to ALL occurrences of the chosen pair left-to-right (the
published inference rule). ``tokenize`` is a pure function of
(merges, text), so executors, the driver twin and re-runs agree
bit-for-bit — the property every oracle in this repo leans on.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # Sennrich end-of-word terminal symbol

# Java regex \s == [ \t\n\x0B\f\r] (ASCII only, no UNICODE_CHARACTER_CLASS).
# MergeBpe MUST split words exactly like textops.tokens()'s F.split(·, "\\s+")
# or train-time and encode-time word boundaries diverge on control chars —
# Python str.split() splits the wider Unicode set (\x1c-\x1f, \x85, \xa0…),
# the exact trap the repo's extracted-text contract documents.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _train_merges(
    word_counts: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Driver-side exact Sennrich merge loop over (word, count) types.

    Incremental bookkeeping: pair → weighted count and pair → set of
    word indices; a merge rewrites only the words that contain the
    merged pair (subtract their old adjacent pairs, splice, re-add).
    Returns [(left, right, pair_count)] in merge order.
    """
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in word_counts if w
    ]
    pair_count: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (syms, c) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_count[p] += c
            pair_words[p].add(i)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pair_count:
            break
        (a, b), cnt = min(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        new_sym = a + b
        for i in sorted(pair_words[(a, b)]):
            syms, c = words[i]
            for p in zip(syms, syms[1:]):
                pair_count[p] -= c
                if pair_count[p] <= 0:
                    del pair_count[p]
                pair_words[p].discard(i)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, c)
            for p in zip(out, out[1:]):
                pair_count[p] += c
                pair_words[p].add(i)
    return merges


def word_type_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) token-type table — the ONE distributed pass of
    :func:`bpe_train`: explode + partial-aggregated groupBy; the only
    shuffle carries (word, partial count), never text. Exposed so the
    plan evidence (PLANS.md) and the trainer share one definition."""
    from .textops import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    max_word_types: int = 250_000,
    min_pair_count: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns a small DataFrame ``(rank, left, right, pair_count)`` with
    ``rank`` 1-based in merge order — feed it (collected) to
    :class:`MergeBpe`, or persist it next to the training shards as the
    tokenizer artifact. Words are the repo's whitespace token contract
    (textops.tokens: lowercased, whitespace-split), so the trained
    tokenizer composes with every oracle-checked token-space operator.

    ``stats`` (optional dict) receives ``word_types`` (distinct types
    seen), ``kept_types``, ``kept_mass`` / ``total_mass`` (token
    occurrences covered by the kept types) and ``n_merges`` actually
    learned (< requested when pair counts fall under
    ``min_pair_count`` — tiny corpora saturate).
    """
    from .topk import ranked_topk

    if n_merges < 1:
        raise ValueError("bpe_train: n_merges must be >= 1")
    if max_word_types < 1:
        raise ValueError("bpe_train: max_word_types must be >= 1")
    spark = df.sparkSession
    counts = word_type_counts(df, text_col).localCheckpoint(eager=False)
    total_types, total_mass = counts.agg(
        F.count("*"), F.coalesce(F.sum("count"), F.lit(0))
    ).first()
    kept = ranked_topk(
        counts.withColumn("__negc", -F.col("count")),
        ["__negc", "word"],
        max_word_types,
        pos_col="__rank",
    ).select("word", "count")
    # r["count"], not r.count: Row.count is the namedtuple METHOD and
    # shadows the field — the bound method would ride into the trainer.
    pairs = [(r["word"], r["count"]) for r in kept.collect()]
    merges = _train_merges(pairs, n_merges, min_pair_count)
    if stats is not None:
        stats["word_types"] = int(total_types)
        stats["kept_types"] = len(pairs)
        stats["total_mass"] = int(total_mass)
        stats["kept_mass"] = int(sum(c for _, c in pairs))
        stats["n_merges"] = len(merges)
    return spark.createDataFrame(
        [
            (rank, left, right, int(cnt))
            for rank, (left, right, cnt) in enumerate(merges, 1)
        ],
        "rank int, left string, right string, pair_count long",
    )


class MergeBpe:
    """Trained-BPE tokenizer over a learned merge list — the
    ``tokenizer=`` plug-in (textops.resolve_tokens contract) that runs
    token-space operators in the EXACT segmentation ``bpe_train``
    produced.

    Inference rule (Sennrich apply_bpe / GPT-2 bpe()): per word
    (lowercased, whitespace-split, ``</w>``-terminated), repeatedly
    find the present pair with the LOWEST merge rank and merge all its
    occurrences left-to-right, until no learned pair remains. A word
    seen during training therefore reproduces its training-time symbol
    sequence exactly (asserted by the twin tests).

    ``tokenize(str)`` is the driver-side twin; ``__call__(col)`` the
    Arrow-batched pandas UDF with a per-word memo (Zipf: batches
    re-encode few distinct words). Merge ranks ship once per task in
    the UDF closure — 32k merges ≈ under a MB."""

    def __init__(self, merges: list[tuple[str, str]], lowercase: bool = True):
        self.ranks: dict[tuple[str, str], int] = {
            (left, right): rank for rank, (left, right) in enumerate(merges)
        }
        if len(self.ranks) != len(merges):
            raise ValueError("MergeBpe: duplicate pair in merges")
        self.lowercase = lowercase
        self._memo: dict[str, list[str]] = {}

    @classmethod
    def from_df(cls, merges_df: DataFrame, lowercase: bool = True) -> "MergeBpe":
        """Build from a :func:`bpe_train` result (collects the small
        merge table in rank order)."""
        rows = merges_df.select("rank", "left", "right").collect()
        ordered = sorted(rows, key=lambda r: r.rank)
        return cls([(r.left, r.right) for r in ordered], lowercase=lowercase)

    def _encode_word(self, word: str) -> list[str]:
        got = self._memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_rank = None
            for p in zip(syms, syms[1:]):
                r = self.ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best = r, p
            if best_rank is None:
                break
            a, b = best
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        self._memo[word] = syms
        return syms

    def tokenize(self, text: str | None) -> list[str]:
        if not text:
            return []
        if self.lowercase:
            text = text.lower()
        out: list[str] = []
        for word in _JAVA_WS.split(text):
            if word:
                out.extend(self._encode_word(word))
        return out

    def __call__(self, col: Column) -> Column:
        from pyspark.sql.functions import pandas_udf

        tok = self

        @pandas_udf("array<string>")
        def _tk(s: pd.Series) -> pd.Series:
            return s.map(tok.tokenize)

        return _tk(col)

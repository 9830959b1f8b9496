"""The composed end-to-end curation pipeline — crawl text in, packed
training sequences out.

``curate_training_set`` chains the module's individual operators into
the standard web-corpus preparation recipe (the FineWeb / Dolma /
Gopher-family shape, all public methods):

    [C4 line-level edit + page gates] → PII scrub → exact dedup +
    language gate + quality gate (clean_corpus) → repetition gate
    (gopher_repetition) [→ benchmark decontamination]
    [→ NB classifier gate] [→ CCNet LM-bucket gate]
    [→ DSIR importance selection] [→ domain quota] → sequence packing

Each stage is the already-oracle-checked operator; this module adds only
composition, so the pipeline's correctness decomposes into the stages'
(and the composed contract query checks the whole chain end-to-end
against one DuckDB program anyway).

Plan shape at 100 TB — what the composition adds or avoids:

- the scrubbed text is materialized ONCE (lazy localCheckpoint): five
  downstream stages read it, and without the materialization each
  would re-run the three regex passes over the full corpus (the
  module's no-CSE rule, CLAUDE.md). On a real cluster the equivalent
  is a persisted intermediate table (the engine's bucketed-layout
  pattern); in-process, localCheckpoint spills executor-side — never
  through the driver.
- every gate joins NARROW per-doc score frames on the id — text never
  rides a shuffle after the scrub projection. The shuffles are exactly
  the stages' own: one digest exchange (dedup), one (doc, gram) partial
  agg (gopher top-2-gram), a broadcast of eval-set digests
  (decontaminate), one groupBy(doc) (DSIR score), grouped_topk /
  ranked_topk (quota, selection), and the sharded packing windows.
- gate-frame joins stay inner on unique ids (no fan-out); survivors
  shrink monotonically, so the later, more expensive stages (DSIR fit,
  packing) run over the reduced corpus, not the raw crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import clean_corpus, gopher_repetition, scrub_text

__all__ = ["curate_training_set", "scrub_text"]


def curate_training_set(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    c4_rules: bool = False,
    c4_min_sentences: int = 5,
    scrub_pii: bool = True,
    min_tokens: int = 30,
    min_quality: float = 4.0,
    langs: tuple[str, ...] = ("en",),
    max_dup_line_frac: float = 0.30,
    max_top2gram_frac: float = 0.20,
    eval_df: DataFrame | None = None,
    eval_ngram: int = 13,
    classifier_df: DataFrame | None = None,
    classifier_keep: tuple[str, ...] | None = None,
    classifier_buckets: int = 4096,
    reference_df: DataFrame | None = None,
    lm_keep: tuple[str, ...] = ("head", "middle"),
    lm_n_buckets: int = 4096,
    target_df: DataFrame | None = None,
    dsir_keep: int | None = None,
    dsir_buckets: int = 4096,
    domain_col: str | None = None,
    domain_cap: int | None = None,
    seq_len: int = 2048,
    streams: int = 64,
    tokenizer=None,
) -> DataFrame:
    """Run the full curation pipeline; one output row per PACKED
    surviving document: (id, stream, n_tokens, start_offset, bin) from
    the packer plus the provenance scores that kept it (n_copies,
    lang_pred, quality, dup_line_frac, top2gram_frac, and score/
    sel_rank when DSIR selection is on).

    Optional stages engage by argument: ``c4_rules`` prepends the C4
    line-level EDIT (textops.c4_kept_lines re-assembly on raw text,
    pre-scrub, plus the lorem-ipsum/curly/blocklist/min-sentences page
    gates — docs are rewritten, not just filtered); ``eval_df`` adds 13-gram
    benchmark decontamination; ``classifier_df`` (labeled (label, text)
    seed set) + ``classifier_keep`` adds the FineWeb-Edu-style NB
    classifier gate (keep docs predicted into those labels; provenance
    clf_pred/clf_score); ``reference_df`` adds the CCNet LM gate (fit
    lm_model on the reference corpus, keep docs whose perplexity
    tercile is in ``lm_keep`` — provenance nll/lm_bucket; cutoffs
    computed over the surviving corpus); ``target_df`` + ``dsir_keep``
    adds DSIR importance selection (weights fitted target-vs-SURVIVORS,
    top ``dsir_keep`` kept); ``domain_col`` + ``domain_cap`` caps any
    one domain's contribution (applied AFTER selection — the quota
    shapes the final mixture). ``tokenizer`` switches decontamination,
    the classifier/LM models, DSIR and packing into the same tokenizer
    space (textops.resolve_tokens hook); the gates' published rules
    stay whitespace-defined.
    """
    from .dedup import decontaminate
    from .sampling import domain_quota, dsir_select, dsir_weights, pack_sequences

    keep_cols = [F.col(id_col), F.col(text_col)]
    if domain_col:
        keep_cols.append(F.col(domain_col))
    base = df.select(*keep_cols)
    if c4_rules:
        # C4 line-level EDIT first (raw web text, before any scrubbing,
        # per the paper's ordering): keep-lines array + original-text
        # page gates materialize once (no-CSE rule), then the doc is
        # re-assembled and pages failing the gates are dropped.
        from .textops import c4_kept_lines, c4_page_ok

        pre = [F.col(id_col)] + ([F.col(domain_col)] if domain_col else [])
        # the CLEAN STRING (not the kept-lines array) is what gets
        # materialized: the filter's regexp_count and the projection
        # then both read the checkpointed column, so the O(doc) join of
        # kept lines runs exactly once (Filter and Project are separate
        # operators — subexpression elimination does not span them)
        base = base.select(
            *pre,
            F.array_join(c4_kept_lines(F.col(text_col)), "\n").alias("__clean"),
            c4_page_ok(F.col(text_col)).alias("__c4ok"),
        ).localCheckpoint(eager=False)
        base = base.filter(
            F.col("__c4ok")
            & (
                F.regexp_count(F.col("__clean"), F.lit(r"[.!?]"))
                >= F.lit(c4_min_sentences)
            )
        ).select(*pre, F.col("__clean").alias(text_col))
    if scrub_pii:
        base = base.withColumn(text_col, scrub_text(F.col(text_col)))
    # five stages scan this; without materialization each re-runs the
    # scrub regexes over the corpus (no-CSE rule)
    base = base.localCheckpoint(eager=False)

    kept = clean_corpus(
        base, id_col, text_col, min_tokens=min_tokens,
        min_quality=min_quality, langs=langs,
    ).drop("n_tokens")  # the packer re-emits the same count
    gr = (
        gopher_repetition(
            base, id_col, text_col,
            max_dup_line_frac=max_dup_line_frac,
            max_top2gram_frac=max_top2gram_frac,
        )
        .filter(F.col("keep"))
        .select(F.col(id_col), "dup_line_frac", "top2gram_frac")
    )
    kept = kept.join(gr, id_col)
    if eval_df is not None:
        dec = (
            decontaminate(base, eval_df, id_col, text_col, n=eval_ngram,
                          tokenizer=tokenizer)
            .filter(F.col("keep"))
            .select(F.col(id_col))
        )
        kept = kept.join(dec, id_col)
    # the stages below run MULTIPLE actions over `kept`'s lineage (the
    # DSIR fit's driver reads, ranked_topk's eager checkpoint, the final
    # pack + provenance joins) — without this the whole gate chain
    # (dedup digest shuffle, gopher gram groupBy) re-executes per action
    kept = kept.localCheckpoint(eager=False)
    if classifier_df is not None and classifier_keep:
        from .classify import nb_score, nb_train

        nbm = nb_train(
            classifier_df, "label", text_col, classifier_buckets, tokenizer
        )
        clf = (
            nb_score(
                base.join(kept.select(id_col), id_col),
                nbm, id_col, text_col, classifier_buckets, tokenizer,
            )
            .filter(F.col("pred").isin(*classifier_keep))
            .select(
                F.col(id_col),
                F.col("pred").alias("clf_pred"),
                F.col("score").alias("clf_score"),
            )
        )
        kept = kept.join(clf, id_col)
    if reference_df is not None:
        from .sampling import lm_buckets as _lm_buckets
        from .sampling import lm_model

        lmm = lm_model(reference_df, text_col, lm_n_buckets, tokenizer)
        lb = (
            _lm_buckets(
                base.join(kept.select(id_col), id_col),
                lmm, id_col, text_col, lm_n_buckets, tokenizer=tokenizer,
            )
            .filter(F.col("bucket").isin(*lm_keep))
            .select(F.col(id_col), "nll", F.col("bucket").alias("lm_bucket"))
        )
        kept = kept.join(lb, id_col)
    if (classifier_df is not None and classifier_keep) or reference_df is not None:
        # the new gates' broadcast joins + aggregates would otherwise
        # re-execute under every downstream action (DSIR fit, packing)
        kept = kept.localCheckpoint(eager=False)
    if target_df is not None and dsir_keep:
        ktext = base.join(kept.select(id_col), id_col)
        w = dsir_weights(target_df, ktext, text_col, dsir_buckets, tokenizer)
        sel = dsir_select(
            ktext, w, dsir_keep, id_col, text_col, dsir_buckets, tokenizer
        ).select(F.col(id_col), "score", "sel_rank")
        kept = kept.join(sel, id_col)
    if domain_col and domain_cap:
        dq = domain_quota(
            base.join(kept.select(id_col), id_col).select(id_col, domain_col),
            id_col, domain_col, domain_cap,
        ).select(F.col(id_col))
        kept = kept.join(dq, id_col)

    packed = pack_sequences(
        base.join(kept.select(id_col), id_col),
        id_col, text_col, seq_len=seq_len, streams=streams,
        tokenizer=tokenizer,
    )
    return packed.join(kept, id_col)

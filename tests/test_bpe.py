"""Trained-BPE exactness: the Spark-side bpe_train must reproduce the
published Sennrich algorithm bit-for-bit (naive recount-from-scratch
reference below), and MergeBpe inference must reproduce the TRAINING
segmentation of every training word (the classic BPE invariant)."""

from collections import Counter

from crawl_spark.operators.bpe import EOW, MergeBpe, _train_merges, bpe_train


def naive_bpe(word_counts, n_merges, min_pair_count=2):
    """Reference Sennrich trainer: recount every pair from scratch each
    iteration (no incremental bookkeeping to share bugs with).
    Returns (merges, final word symbol table)."""
    words = [(list(w) + [EOW], c) for w, c in word_counts if w]
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                counts[p] += c
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        nxt = []
        for syms, c in words:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            nxt.append((out, c))
        words = nxt
    return merges, words


CORPUS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("low-key", 1), ("aaaa", 4), ("aa", 7), ("banana", 2),
    ("bandana", 1), ("newer", 3), ("wide", 2), ("a", 9),
]


def test_incremental_trainer_equals_naive_reference():
    got = _train_merges(CORPUS, n_merges=40)
    want, _ = naive_bpe(CORPUS, n_merges=40)
    assert got == want
    assert len(got) > 10  # the corpus genuinely trains


def test_overlapping_pairs_merge_left_to_right():
    # 'aaaa' with pair (a,a): left-to-right gives [aa, aa], then (aa,aa)
    got = _train_merges([("aaaa", 10)], n_merges=3, min_pair_count=1)
    want, _ = naive_bpe([("aaaa", 10)], n_merges=3, min_pair_count=1)
    assert got == want
    assert got[0][:2] == ("a", "a")


def test_encode_reproduces_training_segmentation():
    merges, final_words = naive_bpe(CORPUS, n_merges=40)
    tok = MergeBpe([(a, b) for a, b, _ in merges])
    for (word, _), (syms, _) in zip(CORPUS, final_words):
        assert tok._encode_word(word) == syms, word
    # unseen word: segments deterministically with learned pieces
    assert tok.tokenize("lowest") == tok.tokenize("LOWEST")
    assert "".join(tok.tokenize("lowest")) == "lowest" + EOW


def test_bpe_train_on_spark_matches_driver_twin(spark):
    docs = [
        (0, "low low lower newest newest newest"),
        (1, "widest wide banana bandana newer"),
        (2, "aa aa aaaa a a a LOW Newest"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    stats: dict = {}
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_train(df, n_merges=25, stats=stats)
        .orderBy("rank")
        .collect()
    ]
    # driver twin: same whitespace-lowercase word counts, same trainer
    wc = Counter()
    for _, t in docs:
        if t:
            wc.update(t.lower().split())
    want = [
        (i, a, b, c)
        for i, (a, b, c) in enumerate(
            _train_merges(sorted(wc.items()), 25), 1
        )
    ]
    assert got == want
    assert stats["word_types"] == len(wc)
    assert stats["kept_types"] == len(wc)
    assert stats["total_mass"] == sum(wc.values()) == stats["kept_mass"]
    assert stats["n_merges"] == len(got)


def test_bpe_train_prunes_word_types_deterministically(spark):
    rows = [(i, "common " * 5 + f"rare{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats: dict = {}
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe_train(df, n_merges=10, max_word_types=5, stats=stats)
        .orderBy("rank")
        .collect()
    ]
    assert stats["word_types"] == 31 and stats["kept_types"] == 5
    assert stats["kept_mass"] < stats["total_mass"]
    # twin over the SAME prune rule: top-5 types by (count desc, word asc)
    wc = Counter()
    for _, t in rows:
        wc.update(t.lower().split())
    kept = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == _train_merges(kept, 10)


def test_merge_bpe_plugs_into_token_space_operators(spark):
    from crawl_spark.operators.textops import token_count

    docs = [(0, "the banana band bandana"), (1, "newest new news")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tok = MergeBpe.from_df(bpe_train(df, n_merges=15))
    got = {
        r.doc_id: r.n_ws_tokens
        for r in token_count(df, tokenizer=tok).collect()
    }
    want = {i: len(tok.tokenize(t)) for i, t in docs}
    assert got == want and any(v > 4 for v in got.values())

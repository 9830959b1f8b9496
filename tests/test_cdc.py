"""Content-defined chunking (gear CDC) vs the pure-Python byte-loop twin.

The twin (cdc.cdc_cuts_py) IS the contract: the vectorized Spark path
must reproduce its cuts bit-for-bit, and the insertion-robustness test
pins the property that makes CDC worth having over fixed blocks.
"""

from __future__ import annotations

import hashlib

import pytest

from crawl_spark.operators.cdc import M64, cdc_cuts_py, gear_table

MIN, AVG, MAX = 64, 256, 1024


def make_doc(seed: int, n: int) -> bytes:
    """Deterministic pseudo-random bytes (md5 counter stream)."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.md5(b"%d-%d" % (seed, i)).digest()
        i += 1
    return bytes(out[:n])


def test_gear_table_is_deterministic_md5():
    g = gear_table()
    assert len(g) == 256
    assert g[0] == int.from_bytes(hashlib.md5(b"gear-0").digest()[:8], "big")
    assert len(set(g)) == 256  # md5 gives distinct entries here
    assert all(0 <= v <= M64 for v in g)


def test_py_twin_cut_invariants():
    data = make_doc(1, 50_000)
    cuts = cdc_cuts_py(data, MIN, AVG, MAX)
    assert cuts[-1] == len(data)
    assert cuts == sorted(set(cuts))
    prev = 0
    for c in cuts[:-1]:
        assert MIN <= c - prev <= MAX
        prev = c
    assert cuts[-1] - prev <= MAX  # tail may undershoot MIN, never MAX
    # avg chunk size in the right ballpark (power-of-two mask -> ~AVG)
    assert 5 <= len(cuts) <= 50_000 / MIN


def test_forced_cuts_on_low_entropy_data():
    """Constant bytes give a constant windowed hash once the 64-byte
    window fills: pick a byte whose steady-state hash MISSES the mask —
    every chunk must then be a forced MAX cut (the degenerate-data
    path). Steady-state h for byte c is gear[c]·(2^64−1) ≡ −gear[c]."""
    g = gear_table()
    c = next(
        b
        for b in range(256)
        if ((M64 + 1 - g[b]) & M64) & (AVG - 1) != 0
    )
    data = bytes([c]) * 20_000
    cuts = cdc_cuts_py(data, MIN, AVG, MAX)
    sizes = [b - a for a, b in zip([0] + cuts, cuts)]
    assert set(sizes[:-1]) == {MAX} and sizes[-1] <= MAX


def test_vectorized_cuts_equal_python_twin():
    from crawl_spark.operators.cdc import _cdc_cuts_np

    for seed, n in [(2, 0), (3, 1), (4, 63), (5, 64), (6, 300), (7, 5_000), (8, 60_000)]:
        data = make_doc(seed, n)
        assert _cdc_cuts_np(data, MIN, AVG, MAX) == cdc_cuts_py(
            data, MIN, AVG, MAX
        ), (seed, n)
    assert _cdc_cuts_np(bytes(9_000), MIN, AVG, MAX) == cdc_cuts_py(
        bytes(9_000), MIN, AVG, MAX
    )


def test_cdc_chunks_spark_matches_twin(spark):
    from crawl_spark.operators.cdc import cdc_chunks

    texts = {
        0: make_doc(10, 4_000).hex(),  # hex keeps it valid UTF-8/1 byte per char
        1: make_doc(11, 700).hex(),
        2: "",  # no chunks
        3: "x" * 30,  # single sub-MIN tail chunk
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = sorted(
        cdc_chunks(df, min_size=MIN, avg_size=AVG, max_size=MAX).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    exp = []
    for did, txt in texts.items():
        data = txt.encode()
        prev = 0
        for j, cut in enumerate(cdc_cuts_py(data, MIN, AVG, MAX)):
            exp.append(
                (did, j, prev, cut - prev, hashlib.md5(data[prev:cut]).hexdigest())
            )
            prev = cut
    exp.sort()
    assert [(r.doc_id, r.chunk_idx, r.offset, r.length, r.chunk_md5) for r in got] == exp
    assert not any(r.doc_id == 2 for r in got)


def test_cdc_survives_insertion_where_fixed_blocks_do_not(spark):
    """The reason CDC exists: one inserted byte near the start must leave
    most chunk digests intact, while fixed-size blocks lose alignment
    everywhere after the edit."""
    from crawl_spark.operators.cdc import cdc_chunks

    base = make_doc(20, 40_000).hex()
    edited = base[:100] + "Z" + base[100:]
    df = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    a = {r.chunk_md5 for r in rows if r.doc_id == 0}
    b = {r.chunk_md5 for r in rows if r.doc_id == 1}
    shared = len(a & b) / max(len(a), 1)
    assert shared > 0.8, shared
    # fixed blocks on the same pair: nothing after the edit point aligns
    n = AVG
    fa = {base[i : i + n] for i in range(0, len(base), n)}
    fb = {edited[i : i + n] for i in range(0, len(edited), n)}
    assert len(fa & fb) / len(fa) < 0.05


def test_cdc_dedup_counts_match_python_model(spark):
    from crawl_spark.operators.cdc import cdc_dedup

    # doc 1 repeats doc 0's content -> its chunks all dedup away;
    # doc 2 is half-shared, half-unique
    t0 = make_doc(30, 8_000).hex()
    t2 = t0[:8_000] + make_doc(31, 4_000).hex()
    df = spark.createDataFrame(
        [(0, t0), (1, t0), (2, t2)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in cdc_dedup(df).collect()}

    chunks: dict[int, list[tuple[int, str, int]]] = {}
    for did, txt in [(0, t0), (1, t0), (2, t2)]:
        data = txt.encode()
        prev, lst = 0, []
        for j, cut in enumerate(cdc_cuts_py(data, MIN, AVG, MAX)):
            lst.append((j, hashlib.md5(data[prev:cut]).hexdigest(), cut - prev))
            prev = cut
        chunks[did] = lst
    firsts: dict[str, tuple[int, int, int]] = {}
    for did in sorted(chunks):
        for j, h, ln in chunks[did]:
            if h not in firsts or (did, j) < firsts[h][:2]:
                firsts[h] = (did, j, ln)
    for did in chunks:
        kept = [v for v in firsts.values() if v[0] == did]
        r = got[did]
        assert r.n_chunks == len(chunks[did])
        assert r.n_kept == len(kept)
        assert r.bytes_total == sum(ln for _, _, ln in chunks[did])
        assert r.bytes_kept == sum(v[2] for v in kept)
        assert abs(r.kept_ratio - round(len(kept) / len(chunks[did]), 6)) < 1e-9
    assert got[1].n_kept == 0  # exact repeat fully deduped
    assert 0 < got[2].n_kept < got[2].n_chunks  # partial overlap


def test_cdc_parameter_validation(spark):
    from crawl_spark.operators.cdc import cdc_chunks

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cdc_chunks(df, min_size=32)
    with pytest.raises(ValueError):
        cdc_chunks(df, avg_size=300)
    with pytest.raises(ValueError):
        cdc_chunks(df, min_size=2048, avg_size=256)


def test_property_vectorized_equals_twin_on_random_bytes():
    """Hypothesis sweep: arbitrary byte strings (including runs and
    boundary-adjacent lengths) — the numpy path must equal the byte-loop
    twin exactly, and the cut invariants must hold."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawl_spark.operators.cdc import _cdc_cuts_np

    @given(
        st.binary(max_size=6000),
        st.sampled_from([64, 128, 256]),
    )
    @settings(max_examples=150, deadline=None)
    def check(data, avg):
        mx = avg * 4
        cuts = cdc_cuts_py(data, 64, avg, mx)
        assert _cdc_cuts_np(data, 64, avg, mx) == cuts
        prev = 0
        for c in cuts[:-1]:
            assert 64 <= c - prev <= mx
            prev = c
        if cuts:
            assert cuts[-1] == len(data) and cuts[-1] - prev <= mx
        else:
            assert data == b""

    check()

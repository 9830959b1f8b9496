"""Murmur3 hashing for URL-seen / host bucketing (north_star: "canonicalized
URLs murmur3-hashed").

``murmur3_32`` is MurmurHash3 x86_32 — the same algorithm Spark's
``F.hash()`` uses (seed 42), implemented here in pure Python so the
sequential reference model, the fixture generator, and the vectorized UDF
path all agree bit-for-bit without depending on JVM execution. Verified
against Spark's ``F.hash`` in tests/test_hashing.py.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Murmur3 x86_32, Spark's byte-stream variant; SIGNED int32 result.

    Spark (``Murmur3_x86_32.hashUnsafeBytes``) hashes 4-byte little-endian
    words with the canonical round, but mixes each TAIL byte as a full
    round on the sign-extended byte — unlike canonical murmur3. We match
    Spark exactly so ``F.hash(col)`` (JVM, hot path) and this function
    (refmodel/UDF path) are interchangeable; parity is asserted in
    tests/test_hashing.py.
    """
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    for b in data[rounded:]:
        if b >= 0x80:  # JVM bytes are signed; sign-extend before the mix
            b -= 0x100
        k = (b * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def url_hash64(url_canon: str) -> int:
    """128→64-bit-ish composite for the seen-set / Bloom keys: two
    independent murmur32 lanes packed into a signed int64."""
    b = url_canon.encode("utf-8")
    lo = murmur3_32(b, 42) & _M32
    hi = murmur3_32(b, 0x9747B28C) & _M32
    v = (hi << 32) | lo
    return v - (1 << 64) if v >= (1 << 63) else v


def bucket_of(host: str, n_buckets: int) -> int:
    """pmod(murmur3(host), n_buckets) — the partition bucket for a host."""
    return murmur3_32(host.encode("utf-8"), 42) % n_buckets

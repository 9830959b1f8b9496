"""Vectorized URL canonicalization UDF (SURVEY.md §2.8 #1).

One Arrow-batched pass produces every URL-derived column the engine needs:
canonical form (fetch-join + seen-set key), host (politeness partition
key), path+query (robots prefix matching), and the murmur3 hashes
(bucketing + Bloom keys). Hashes use the same pure-Python murmur3 as the
sequential reference model, which is bit-compatible with Spark's
``F.hash`` (tests/test_hashing.py), so either side can compute them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import murmur3_32, url_hash64
from .urlnorm import canonicalize, host_of

CANON_TYPE = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host_hash", T.IntegerType()),
    ]
)


def canon_row(url: str | None, referer: str | None = None) -> dict:
    """Canonicalize one URL; shared by the UDF below and driver-side code
    (seed stamping, refmodel). Unusable URL -> all-null struct."""
    if url is None:
        return {"url_canon": None, "host": None, "path": None, "url_hash": None, "host_hash": None}
    canon = canonicalize(url, referer)
    host = host_of(canon) if canon else None
    if canon is None or host is None:
        return {"url_canon": None, "host": None, "path": None, "url_hash": None, "host_hash": None}
    # path including query — robots prefixes match everything after host
    path = canon.split(host, 1)[1] if host in canon else "/"
    return {
        "url_canon": canon,
        "host": host,
        "path": path,
        "url_hash": url_hash64(canon),
        "host_hash": murmur3_32(host.encode("utf-8")),
    }


@F.pandas_udf(CANON_TYPE)
def canonicalize_udf(url: pd.Series, referer: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([canon_row(u, r) for u, r in zip(url, referer)])

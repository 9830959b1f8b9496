"""Training-shard sink: deterministic layout, manifest validation,
round-trip identity, one file per shard."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from crawl_spark.sources.shards import (
    MANIFEST,
    read_training_shards,
    write_training_shards,
)


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body "), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 7).alias("extra"),
    )


def test_shards_roundtrip_layout_and_manifest(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, path, n_shards=8)

    # exactly one parquet file per shard dir; all 8 shards present
    dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert len(dirs) == 8
    for d in dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d
    assert manifest["total_rows"] == 300
    assert sum(s["n_rows"] for s in manifest["shards"].values()) == 300

    # round trip: same rows, and shard matches the documented md5 rule
    back = read_training_shards(spark, path)
    rows = back.collect()
    assert sorted((r["doc_id"], r["text"], r["extra"]) for r in rows) == sorted(
        (r["doc_id"], r["text"], r["extra"]) for r in df.collect()
    )
    for r in rows:
        want = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 8
        assert r["shard"] == want

    # determinism: a second write produces identical manifest + shard contents
    path2 = str(tmp_path / "shards2")
    manifest2 = write_training_shards(df, path2, n_shards=8)
    assert manifest2 == manifest
    for k in range(8):
        a = spark.read.parquet(os.path.join(path, "shard=%d" % k)).collect()
        b = spark.read.parquet(os.path.join(path2, "shard=%d" % k)).collect()
        assert a == b, k  # same rows in the same on-file order


def test_shards_validation_catches_corruption(spark, tmp_path):
    df = _docs(spark, 200)
    path = str(tmp_path / "shards")
    write_training_shards(df, path, n_shards=4)
    read_training_shards(spark, path)  # clean set validates

    # drop one shard's file -> read must fail loudly
    victim = glob.glob(os.path.join(path, "shard=2", "*.parquet"))[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="shard validation failed"):
        read_training_shards(spark, path)
    # unvalidated read still works for what's left (caller's explicit choice)
    assert read_training_shards(spark, path, validate=False).count() < 200


def test_shards_atomic_overwrite(spark, tmp_path):
    """A re-write of the same path replaces the set atomically: the old
    manifest never mixes with new files."""
    path = str(tmp_path / "shards")
    write_training_shards(_docs(spark, 100), path, n_shards=4)
    m2 = write_training_shards(_docs(spark, 150), path, n_shards=4)
    assert m2["total_rows"] == 150
    import json

    with open(os.path.join(path, MANIFEST)) as f:
        assert json.load(f)["total_rows"] == 150
    assert read_training_shards(spark, path).count() == 150
    assert not os.path.exists(path + ".tmp")

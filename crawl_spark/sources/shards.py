"""Training-shard sink: ship a curated corpus as N deterministic,
self-describing parquet shards — the last step of the crawl → curate →
ship pipeline (the artifact a trainer's data loader actually mounts).

Contract (all deterministic, so re-runs and different engines produce
the same shards):

- shard assignment: ``pmod(int(md5(id)[:8], 16), n_shards)`` — the SAME
  md5-prefix rule :func:`~crawl_spark.operators.sampling.pack_sequences`
  uses for stream assignment, so ``n_shards == streams`` co-locates a
  packing stream's docs in one shard (a training sequence never spans
  shard files).
- within-shard order: (md5(id), id) — content-defined, engine-agnostic.
- layout: ``path/shard=K/part-*.parquet``, exactly ONE file per shard
  (each shard's rows land in one task: ``repartition(n_shards, shard)``
  then ``partitionBy``; a hash collision putting two shards in one task
  still writes one file per shard DIRECTORY).
- manifest: ``path/_shards_manifest.json`` with per-shard row counts
  and an order-independent content checksum (sum of the 32-bit md5
  prefix of each row's ``id:text`` — md5 only, per the repo's
  cross-engine hash rule) — cheap to recompute anywhere, incl. SQL.
- atomic: written to ``path.tmp`` then renamed, mirroring the engine's
  snapshot commits; readers never observe a half-written shard set.

Plan shape at 100 TB: ONE shuffle (the repartition on the shard key),
partition-local sorts, a single n_shards-row aggregate for the manifest
(collected — bounded by n_shards, not rows), no other driver data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_shards_manifest.json"


def shard_expr(id_col: str, n_shards: int) -> F.Column:
    """Deterministic shard id: pmod(int(md5(id)[:8], 16), n_shards).

    SQL twin (DuckDB): ``CAST(('0x' || substring(md5(CAST(id AS
    VARCHAR)), 1, 8))::BIGINT % n AS INT)`` (md5 prefix is < 2^32 so the
    value is non-negative and pmod == %).
    """
    pick = F.md5(F.col(id_col).cast("string"))
    return F.pmod(
        F.conv(F.substring(pick, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")


def _row_digest(id_col: str, text_col: str) -> F.Column:
    """int(md5(id:text)[:8], 16) — the summed per-shard checksum term.

    SQL twin (DuckDB): ``('0x' || substring(md5(id || ':' || text), 1,
    8))::BIGINT``. 32 bits per row keeps a shard's sum inside BIGINT up
    to 2^31 rows/shard."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col(text_col))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> dict:
    """Write ``df`` as ``n_shards`` deterministic parquet shards +
    manifest; returns the manifest dict. All input columns are kept;
    ``id_col``/``text_col`` define the checksum identity.
    """
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    sharded = df.withColumn("shard", shard_expr(id_col, n_shards))
    pick = F.md5(F.col(id_col).cast("string"))
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", pick, id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(tmp)
    )
    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(_row_digest(id_col, text_col)).alias("checksum"),
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "text_col": text_col,
        "total_rows": int(sum(r["n_rows"] for r in stats)),
        "shards": {
            int(r["shard"]): {"n_rows": int(r["n_rows"]), "checksum": int(r["checksum"])}
            for r in stats
        },
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.rename(tmp, path)
    return manifest


def read_training_shards(
    spark: SparkSession, path: str, validate: bool = True
) -> DataFrame:
    """Read a shard set back (with its ``shard`` column). With
    ``validate`` (default), recompute per-shard row counts and checksums
    and raise ``ValueError`` on ANY mismatch with the manifest — a
    missing/truncated/corrupted shard file never feeds a training run
    silently. Validation is one aggregate scan; skip it on hot paths
    re-reading a set already validated this session."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    df = spark.read.parquet(path)
    if validate:
        got = {
            int(r["shard"]): (int(r["n_rows"]), int(r["checksum"]))
            for r in df.groupBy("shard")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    _row_digest(manifest["id_col"], manifest["text_col"])
                ).alias("checksum"),
            )
            .collect()
        }
        want = {
            int(k): (v["n_rows"], v["checksum"])
            for k, v in manifest["shards"].items()
        }
        if got != want:
            bad = sorted(
                set(want) ^ set(got)
                | {k for k in set(want) & set(got) if want[k] != got[k]}
            )
            raise ValueError(
                "shard validation failed at %s: shards %s do not match the "
                "manifest (missing, truncated or corrupted)" % (path, bad)
            )
    return df

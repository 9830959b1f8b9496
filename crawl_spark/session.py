"""SparkSession factory with configs pinned for the crawl engine.

Designed for a multi-executor cluster at 100 TB scale; tested on
``local[N]``. Every config here is scale-motivated:

- AQE on: runtime coalescing + skew-join splitting for hot-host skew.
- Arrow on, modest batch size: the ``html: binary`` column produces large
  Arrow batches; 2048 rows/batch keeps executor memory bounded when pages
  average ~50 KB (≈100 MB per batch worst case).
- shuffle partitions sized for the test harness; on a real cluster set
  ``spark.sql.shuffle.partitions`` ≈ 2–3× total cores (or rely on AQE
  coalescing from a higher initial number).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def make_session(
    app_name: str = "crawl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's pinned configs."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    # Executor Python workers must be able to import crawl_spark regardless
    # of the driver's cwd. Locally that means PYTHONPATH (inherited by the
    # JVM → worker processes, so it must be set BEFORE getOrCreate); on a
    # real cluster, ship the package with spark-submit --py-files (see
    # tools/build_zip.py) — addPyFile covers getOrCreate-after-import cases.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + pp if pp else "")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing is throughput-critical for the html-blob
        # extraction path: measured on ~24 KB pages, 2048-row batches
        # (~50 MB of payload per batch) run 1.7× SLOWER than 128-row
        # batches and destroy 4→16-core scaling (allocator/cache churn);
        # 128 rows ≈ 3 MB/batch keeps the pipeline cache-resident while
        # staying negligible overhead for narrow-row operators.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # split local parquet like a many-file production corpus would:
        # the parse-heavy extraction path draws its parallelism from the
        # scan splits (no shuffle of html blobs)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    )
    # shuffle/checkpoint scratch: a fast local dir (tmpfs for benches)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

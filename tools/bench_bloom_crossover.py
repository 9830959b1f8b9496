"""Bloom crossover measurement: at what seen-set size does the Bloom
pre-filter beat the plain exact anti-join?

Isolates the operator the crawl round runs at step 8: `links` (one
round's candidate links) anti-joined against `seen` (the cumulative
url log). The exact path shuffles ALL links + ALL of seen on url_canon;
the Bloom path probes broadcast per-bucket bitmaps (numpy, Arrow
batches) and only the possibly-seen minority pays the anti-join.

Synthetic inputs sized by --seen rows (links fixed at LINKS rows, 50%
genuinely new — the crawl's typical mix): urls are md5-derived strings,
url_hash/host_hash computed with the engine's own hashing so bitmap
bucketing is realistic. Both paths run in the same session, warm, and
are forced through the noop sink; the result row-sets are asserted
EQUAL before timing is trusted.

Usage: python tools/bench_bloom_crossover.py [seen_sizes...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LINKS = int(os.environ.get("CROSSOVER_LINKS", "2000000"))
# fraction of links already in the seen set (the crawl's dup mix):
# mature crawls see high dup rates (bloom helps least), fresh frontier
# expansions are mostly new (bloom helps most)
DUP_FRAC = float(os.environ.get("CROSSOVER_DUP_FRAC", "0.5"))


def synth(spark, n: int, salt: str, parts: int = 32):
    """n synthetic url rows with engine-grade hashes."""
    from pyspark.sql import functions as F

    base = spark.range(0, n, 1, parts)
    url = F.concat(
        F.lit("http://host"),
        (F.col("id") % 997).cast("string"),
        F.lit(".example/"),
        F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))),
    )
    return base.select(
        url.alias("url_canon"),
        F.xxhash64(url).alias("url_hash"),
        F.pmod(F.hash(F.concat(F.lit("host"), (F.col("id") % 997).cast("string"))), F.lit(1 << 16))
        .cast("int")
        .alias("host_hash"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from crawl_spark.operators.bloom import BloomConfig, build_bitmaps, split_by_bloom
    from crawl_spark.session import make_session

    sizes = [int(s) for s in sys.argv[1:]] or [2_000_000, 8_000_000, 32_000_000]
    spark = make_session("bloom_xover", master="local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    scratch = os.environ.get("CROSSOVER_SCRATCH", "/dev/shm/bloom_xover")
    os.makedirs(scratch, exist_ok=True)
    for n_seen in sizes:
        # parquet-backed state (like the engine's delta log): big seen
        # sets must not live in the driver JVM's block store
        seen_path = os.path.join(scratch, "seen_%d" % n_seen)
        if not os.path.isdir(seen_path):
            synth(spark, n_seen, "seen").write.mode("overwrite").parquet(seen_path)
        seen = spark.read.parquet(seen_path)
        # links: DUP_FRAC overlap seen (same salt+id range), rest new
        n_dup = int(LINKS * DUP_FRAC)
        overlap = synth(spark, n_dup, "seen")
        new = synth(spark, LINKS - n_dup, "new")
        links = overlap.unionByName(new).localCheckpoint(eager=True)

        cfg = BloomConfig(
            n_buckets=64,
            bits_per_bucket=max(1 << 20, 1 << (n_seen // 64).bit_length() + 3),
            n_hashes=4,
        )
        t0 = time.time()
        bitmaps = build_bitmaps(seen, cfg)
        t_build = time.time() - t0

        def run_exact():
            return links.join(seen.select("url_canon"), "url_canon", "left_anti")

        def run_bloom():
            # same shape as the engine: one probe pass, checkpointed,
            # consumed by both branches
            tagged = split_by_bloom(links, bitmaps, cfg, spark).localCheckpoint(
                eager=True
            )
            definite_new = tagged.filter(~F.col("possibly_seen")).drop("possibly_seen")
            cand = tagged.filter(F.col("possibly_seen")).drop("possibly_seen")
            return definite_new.unionByName(
                cand.join(seen.select("url_canon"), "url_canon", "left_anti")
            )

        # correctness gate before timing
        assert run_exact().count() == run_bloom().count() == LINKS - n_dup

        walls = {}
        for name, fn in (("exact", run_exact), ("bloom", run_bloom)):
            fn().write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            walls[name] = round(time.time() - t0, 2)
        n_checked = (
            split_by_bloom(links, bitmaps, cfg, spark)
            .filter(F.col("possibly_seen"))
            .count()
        )
        print(
            json.dumps(
                {
                    "seen_rows": n_seen,
                    "links": LINKS,
                    "dup_frac": DUP_FRAC,
                    "bloom_build_s": round(t_build, 2),
                    "exact_antijoin_s": walls["exact"],
                    "bloom_path_s": walls["bloom"],
                    "links_exact_checked": n_checked,
                    "antijoin_traffic_cut_pct": round(100 * (1 - n_checked / LINKS), 1),
                }
            ),
            flush=True,
        )
        links.unpersist()


if __name__ == "__main__":
    main()

"""Hot-host skew measurement: per-host budgeted top-k via the plain
window-rank (the whole host funnels through ONE task) vs `grouped_topk`
(partition-local prune + bounded window).

The budget is a PER-ROW COLUMN (joined per host) — the engine's real
politeness case. This matters for the comparison: with a LITERAL k,
Spark ≥3.5's WindowGroupLimit rule pushes a partial top-k below the
window's shuffle and the plain window is already skew-proof (measured:
32M-row hot host ranks in ~1.2 s). With a column budget that rule does
not apply (verified in the plan), so the mega-host's entire slice
serializes into one task — exactly what `grouped_topk` prevents.

Synthetic frontier: one hot host with the given rows + a uniform cold
tail; budget = 1000 per host. Results are asserted equal before timing.

Usage: python tools/bench_skew.py [hot_rows...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(os.environ.get("SKEW_K", "1000"))
COLD = int(os.environ.get("SKEW_COLD", "2000000"))


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawl_spark.operators.topk import grouped_topk
    from crawl_spark.session import make_session

    sizes = [int(s) for s in sys.argv[1:]] or [8_000_000, 32_000_000]
    spark = make_session(
        "skew", master="local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")

    for hot in sizes:
        cold_df = spark.range(0, COLD, 1, 32).select(
            F.concat(F.lit("host"), (F.col("id") % 997).cast("string")).alias("host"),
            (F.col("id") * 1000 + 1).alias("key"),  # unique keys
        )
        hot_df = spark.range(0, hot, 1, 32).select(
            F.lit("megahost").alias("host"),
            (F.col("id") * 1000 + 7).alias("key"),
        )
        frontier = cold_df.unionByName(hot_df).localCheckpoint(eager=True)
        budgets = spark.createDataFrame(
            [("host%d" % i, K) for i in range(997)] + [("megahost", K)],
            "host string, budget long",
        )
        fb = frontier.join(F.broadcast(budgets), "host")

        w = Window.partitionBy("host").orderBy("key")

        def run_window():
            return (
                fb.withColumn("r", F.row_number().over(w))
                .filter(F.col("r") <= F.col("budget"))
                .drop("r", "budget")
            )

        def run_grouped():
            return grouped_topk(fb, ["host"], ["key"], "budget").drop("budget")

        a = run_window().agg(F.count("*"), F.sum("key")).collect()[0]
        b = run_grouped().agg(F.count("*"), F.sum("key")).collect()[0]
        assert tuple(a) == tuple(b), (a, b)

        walls = {}
        for name, fn in (("window", run_window), ("grouped_topk", run_grouped)):
            fn().write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            walls[name] = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "hot_host_rows": hot,
                    "cold_rows": COLD,
                    "k": K,
                    "window_s": walls["window"],
                    "grouped_topk_s": walls["grouped_topk"],
                    "speedup": round(walls["window"] / walls["grouped_topk"], 2),
                }
            ),
            flush=True,
        )
        frontier.unpersist()


if __name__ == "__main__":
    main()

"""HLL register-table path vs exact count(DISTINCT) at growing input —
the scale evidence for the cardinality arm (operators/hll.py).

What the numbers must show:

  exact    ``groupBy(host).agg(count_distinct(url))`` — the shuffle
           carries every DISTINCT (host, url) pair: bytes written grow
           linearly with the key set, and the whole history must be
           RESCANNED every time the question is asked again.
  hll      ``hll_distinct`` — the shuffle carries at most
           |hosts|·4096 (idx, rho) int pairs behind a partial-max
           combiner, FLAT in the input size; and the register tables
           are the persistable artifact: "distinct so far" across N
           rounds is an `hll_merge` over N tiny tables, never a
           rescan.
  merge    ``hll_merge + hll_estimate`` over per-round register
           tables (the incremental path) — priced to show the
           re-ask cost is independent of history size.

Estimates are asserted within 5σ (1.04/√4096 ≈ 1.6 %) of the exact
answers before any timing is trusted. Shuffle-write bytes are the
`shuffleBytesWritten` SQLMetric summed over every exchange in the
executed (post-AQE) plan — the exact counters the Spark UI shows.

Usage: python tools/bench_hll.py [n_urls...]   (default 2e6 8e6)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _walk_plan(node):
    """Physical-plan walk that follows AQE indirection: the final plan
    behind AdaptiveSparkPlanExec and the materialized plan behind each
    (leaf) QueryStageExec."""
    yield node
    nm = node.getClass().getSimpleName()
    if nm == "AdaptiveSparkPlanExec":
        yield from _walk_plan(node.executedPlan())
    if nm.endswith("QueryStageExec"):
        yield from _walk_plan(node.plan())
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_plan(ch.apply(i))


def _shuffle_bytes(df) -> tuple[float, int, object]:
    """collect() the frame and return (seconds, shuffle-write bytes
    summed over every exchange in its executed plan, rows) — the same
    SQLMetric the Spark UI reports per ShuffleExchangeExec."""
    t0 = time.time()
    out = df.collect()
    dt = time.time() - t0
    total = 0
    for n in _walk_plan(df._jdf.queryExecution().executedPlan()):
        m = n.metrics()
        if m.contains("shuffleBytesWritten"):
            total += m.apply("shuffleBytesWritten").value()
    return dt, total, out


def main() -> None:
    from pyspark.sql import functions as F

    from crawl_spark.operators.hll import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    from crawl_spark.session import make_session

    sizes = [int(float(a)) for a in sys.argv[1:]] or [2_000_000, 8_000_000]
    hosts = 64
    spark = make_session(
        "bench_hll",
        master="local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "8"),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
    )
    sigma = 1.04 / math.sqrt(4096)

    for n in sizes:
        # 50% dup mix, skewed hosts (host h gets ~n/hosts rows,
        # distinct pool n/(2*hosts) urls)
        df = (
            spark.range(n)
            .select(
                F.concat(
                    F.lit("h"), (F.col("id") % hosts).cast("string"),
                    F.lit(".example"),
                ).alias("host"),
                F.concat(
                    F.lit("https://p/"),
                    ((F.col("id") / hosts).cast("long") % (n // (2 * hosts)))
                    .cast("string"),
                ).alias("url"),
            )
            .localCheckpoint(eager=True)  # price the operators, not range()
        )

        t_ex, sh_ex, exact_rows = _shuffle_bytes(
            df.groupBy("host").agg(F.count_distinct("url").alias("n"))
        )
        exact = {r["host"]: r["n"] for r in exact_rows}

        t_h, sh_h, est_rows = _shuffle_bytes(hll_distinct(df))
        for r in est_rows:
            err = abs(r["n_distinct_est"] - exact[r["host"]]) / exact[r["host"]]
            assert err <= 5 * sigma, (r["host"], err)

        # incremental path: 4 "rounds" of per-round register tables,
        # re-asked by merging the tiny tables (history never rescanned)
        rounds = [
            hll_registers(df.where(F.crc32("url") % 4 == i)).localCheckpoint(
                eager=True
            )
            for i in range(4)
        ]
        t_m, sh_m, merged = _shuffle_bytes(hll_estimate(hll_merge(*rounds)))
        for r in merged:
            err = abs(r["n_distinct_est"] - exact[r["host"]]) / exact[r["host"]]
            assert err <= 5 * sigma, ("merge", r["host"], err)

        print(
            json.dumps(
                {
                    "n_rows": n,
                    "hosts": hosts,
                    "exact_s": round(t_ex, 2),
                    "exact_shuffle_mb": round(sh_ex / 1e6, 1),
                    "hll_s": round(t_h, 2),
                    "hll_shuffle_mb": round(sh_h / 1e6, 1),
                    "merge4_s": round(t_m, 2),
                    "merge4_shuffle_mb": round(sh_m / 1e6, 1),
                }
            )
        )

    spark.stop()


if __name__ == "__main__":
    main()

"""Measure the graph operators' two edge layouts at a scale where the
join strategy matters.

pagerank/connected_components iterate `edges ⋈ ranks ON src`. The
checkpoint layout re-shuffles the edge table every iteration under
sort-merge join; the bucket-by-src layout pays one write up front and
then scans the edges in place (no edge-side Exchange — see PLANS.md
§14). This tool times both on the same synthetic graph so BENCH.md can
carry the measured crossover instead of a claim.

Broadcast is disabled: at bench scale Spark would broadcast the rank
side and hide the edge shuffle the 100TB case hits (10^8+ nodes do not
broadcast).

    GRAPH_EDGES=20000000 GRAPH_NODES=2000000 python tools/bench_graph.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EDGES = int(os.environ.get("GRAPH_EDGES", "20000000"))
N_NODES = int(os.environ.get("GRAPH_NODES", "2000000"))
ITERS = int(os.environ.get("GRAPH_ITERS", "5"))
WORK = os.environ.get("GRAPH_WORK", "/tmp/bench_graph")


def main() -> None:
    from pyspark.sql import functions as F

    from crawl_spark.operators.graph import connected_components, pagerank
    from crawl_spark.session import make_session

    spark = make_session("bench_graph", master="local[32]")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    e = spark.range(N_EDGES).select(
        (F.col("id") % N_NODES).alias("src"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES)).alias("dst"),
    )
    e = e.localCheckpoint(eager=True)  # fixed input for both layouts
    results = {}

    if os.environ.get("GRAPH_OP") == "cc_chain":
        # rounds-to-converge: min-label needs O(diameter) edge scans,
        # star contraction O(log n) materializing rounds. Same chain
        # graph (CHAIN_NODES nodes in CHAIN_SEG-node segments, diameter
        # = CHAIN_SEG - 1) through both; then a DEEP chain (one segment,
        # diameter = CHAIN_NODES - 1) through star only — min-label
        # would need CHAIN_NODES iterations there, which IS the finding.
        from crawl_spark.operators.graph import connected_components_star

        seg = int(os.environ.get("CHAIN_SEG", "65"))
        n = int(os.environ.get("CHAIN_NODES", "2000000"))
        pairs = (
            spark.range(n)
            .filter(F.col("id") % seg != seg - 1)
            .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
            .localCheckpoint(eager=True)
        )
        out = {"chain_nodes": n, "segment_len": seg}
        st = {}
        t0 = time.time()
        cs = connected_components_star(pairs, stats=st)
        cs.write.format("noop").mode("overwrite").save()
        out["star_sec"] = round(time.time() - t0, 2)
        out["star_rounds"] = st["rounds"]

        st = {}
        t0 = time.time()
        ml = connected_components(
            pairs,
            max_iters=seg + 2,
            bucket_path=f"{WORK}/cc_chain_edges",
            bucket_table="bench_ccc_edges",
            stats=st,
        )
        ml.write.format("noop").mode("overwrite").save()
        out["minlabel_sec"] = round(time.time() - t0, 2)
        out["minlabel_rounds"] = st["rounds"]
        spark.sql("DROP TABLE IF EXISTS bench_ccc_edges")

        # parity on a deterministic sample + component count
        s1 = {r["node"]: r["component"]
              for r in cs.filter(F.col("node") % 99991 == 0).collect()}
        s2 = {r["node"]: r["component"]
              for r in ml.filter(F.col("node") % 99991 == 0).collect()}
        out["parity_ok"] = s1 == s2 and len(s1) > 0

        # deep chain: diameter = n_deep - 1, star only
        n_deep = int(os.environ.get("CHAIN_DEEP_NODES", str(n)))
        deep = (
            spark.range(n_deep - 1)
            .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
            .localCheckpoint(eager=True)
        )
        st = {}
        t0 = time.time()
        cd = connected_components_star(deep, stats=st)
        n_comp_deep = cd.select("component").distinct().count()
        out["deep_chain_nodes"] = n_deep
        out["deep_star_sec"] = round(time.time() - t0, 2)
        out["deep_star_rounds"] = st["rounds"]
        out["deep_one_component"] = n_comp_deep == 1
        print(json.dumps(out))
        return

    if os.environ.get("GRAPH_OP") == "cc":
        # CC gets its own JVM (GRAPH_OP=cc): pagerank's two full runs
        # plus CC's symmetrized edge set overflow one shared driver heap
        t0 = time.time()
        cc = connected_components(
            e.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            max_iters=40,
            bucket_path=f"{WORK}/cc_edges",
            bucket_table="bench_cc_edges",
        )
        cc.write.format("noop").mode("overwrite").save()
        results["cc_bucketed_sec"] = round(time.time() - t0, 2)
        n_comp = cc.select("component").distinct().count()
        spark.sql("DROP TABLE IF EXISTS bench_cc_edges")
        print(
            json.dumps(
                {
                    "n_edges": N_EDGES,
                    "n_nodes": N_NODES,
                    "n_components": n_comp,
                    **results,
                }
            )
        )
        return

    t0 = time.time()
    r1 = pagerank(e, iters=ITERS)
    r1.write.format("noop").mode("overwrite").save()
    results["checkpoint_layout_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    r2 = pagerank(
        e,
        iters=ITERS,
        bucket_path=f"{WORK}/edges",
        n_buckets=32,
        bucket_table="bench_pr_edges",
    )
    r2.write.format("noop").mode("overwrite").save()
    results["bucketed_layout_sec"] = round(time.time() - t0, 2)

    # parity spot-check on a deterministic node sample
    s1 = {r["node"]: r["rank"] for r in r1.filter(F.col("node") % 99991 == 0).collect()}
    s2 = {r["node"]: r["rank"] for r in r2.filter(F.col("node") % 99991 == 0).collect()}
    results["parity_sample_nodes"] = len(s1)
    # float-sum order differs between layouts; 6dp-rounded ranks may
    # still straddle a boundary, so compare with one-ulp-of-rounding
    # tolerance rather than equality
    same_nodes = set(s1) == set(s2)
    results["parity_max_abs_diff"] = max(
        (abs(s1[n] - s2[n]) for n in s1 if n in s2), default=0.0
    )
    results["parity_ok"] = same_nodes and results["parity_max_abs_diff"] <= 1e-6

    spark.sql("DROP TABLE IF EXISTS bench_pr_edges")
    print(
        json.dumps(
            {
                "n_edges": N_EDGES,
                "n_nodes": N_NODES,
                "iters": ITERS,
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()

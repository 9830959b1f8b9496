"""Trained vs untrained IVF codebook: recall@10 and wall at sf0.1.

Round-2 verdict item #5: the recall TEST exists
(test_trained_ivf_beats_untrained_codebook); this records the measured
NUMBERS for BENCH.md — recall@10 against the exact brute-force top-k,
plus search wall, for (a) the deterministic `% 41` id-subset codebook
the DuckDB oracle uses and (b) the spherical-k-means codebook from
train_ivf_centroids.

Usage: python tools/bench_ivf.py [sf_dir] (default $SPARK_GRAFT_SF_DIR
or /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def recall_at_k(spark, approx, exact, k: int = 10) -> float:
    from pyspark.sql import functions as F

    truth = exact.select("query_id", "nbr_id")
    hits = approx.select("query_id", "nbr_id").join(
        truth, ["query_id", "nbr_id"], "inner"
    ).count()
    total = truth.count()
    return round(hits / total, 4) if total else 0.0


def main() -> None:
    from pyspark.sql import functions as F

    from crawl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )
    from crawl_spark.session import make_session

    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = make_session(
        "bench_ivf", master="local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint(True)
    queries = emb.filter(F.col("vec_id") < 64).localCheckpoint(True)
    k, nprobe = 10, 4

    exact = brute_force_topk(emb, queries, k=k).localCheckpoint(True)

    t0 = time.time()
    trained = train_ivf_centroids(emb, k=64, iters=5).localCheckpoint(True)
    t_train = time.time() - t0

    results = {"sf_dir": sf_dir, "queries": 64, "k": k,
               "train_s": round(t_train, 2)}

    def bench(fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2), recall_at_k(spark, fn(), exact, k)

    for name, cents in (("untrained_mod41", None), ("trained_kmeans64", trained)):
        wall, rec = bench(
            lambda: ivf_topk(emb, queries, k=k, nprobe=nprobe, centroids=cents)
        )
        results[name] = {"nprobe": nprobe, "search_s": wall, "recall_at_10": rec}

    # nprobe sweep (trained codebook): the recall-vs-work dial
    sweep = {}
    for np_ in (1, 2, 4, 8, 16):
        wall, rec = bench(
            lambda: ivf_topk(emb, queries, k=k, nprobe=np_, centroids=trained)
        )
        sweep[str(np_)] = {"search_s": wall, "recall_at_10": rec}
    results["nprobe_sweep_trained"] = sweep

    # two-stage shortlist re-rank: truncated-dim first pass (16 of 64
    # dims), exact full-dim re-rank of the k*4 shortlist
    wall, rec = bench(
        lambda: ivf_topk(
            emb, queries, k=k, nprobe=8, centroids=trained,
            shortlist_dims=16, shortlist_mult=4,
        )
    )
    results["shortlist16_rerank_nprobe8"] = {"search_s": wall, "recall_at_10": rec}

    # auto cell count (k = None -> ~sqrt(N))
    from crawl_spark.operators.similarity import suggest_ivf_cells

    n_vec = emb.count()
    auto_k = suggest_ivf_cells(n_vec)
    t0 = time.time()
    auto_cents = train_ivf_centroids(emb, k=None, iters=5).localCheckpoint(True)
    results["auto_cells"] = {
        "n_vectors": n_vec,
        "n_cells": auto_k,
        "train_s": round(time.time() - t0, 2),
    }
    wall, rec = bench(
        lambda: ivf_topk(emb, queries, k=k, nprobe=nprobe, centroids=auto_cents)
    )
    results["auto_cells"]["search_s"] = wall
    results["auto_cells"]["recall_at_10"] = rec

    # PQ tier (round 4): codes-only ADC scan, IVF×PQ composition, and
    # the exact re-rank. PQ ranks by squared L2, so its ground truth is
    # the exact-L2 top-k (cosine and L2 orders differ on unnormalized
    # vectors) — computed by brute force here.
    from pyspark.sql import Window

    from crawl_spark.operators.similarity import (
        _sqdist_micro,
        _vecd,
        ivf_pq_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    qv = queries.select(F.col("vec_id").alias("query_id"), _vecd(F.col("embedding")).alias("qv"))
    vv = emb.select(F.col("vec_id").alias("nbr_id"), _vecd(F.col("embedding")).alias("vv"))
    wl2 = Window.partitionBy("query_id").orderBy("d2", "nbr_id")
    exact_l2 = (
        F.broadcast(qv).crossJoin(vv)
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id",
                (_sqdist_micro(F.col("qv"), F.col("vv")) / 1e6).alias("d2"))
        .withColumn("rank", F.row_number().over(wl2))
        .filter(F.col("rank") <= k)
        .localCheckpoint(True)
    )
    t0 = time.time()
    pq_encode(emb).write.format("noop").mode("overwrite").save()
    results["pq"] = {"encode_s": round(time.time() - t0, 2)}
    pqcb = train_pq_codebooks(emb, iters=3).localCheckpoint(True)
    for name, fn in (
        ("adc", lambda: pq_topk(emb, queries, q_k=k, codebooks=pqcb)),
        ("adc_rerank4", lambda: pq_topk(emb, queries, q_k=k, codebooks=pqcb, rerank_mult=4)),
        ("ivfpq_nprobe8_rerank4", lambda: ivf_pq_topk(
            emb, queries, q_k=k, nprobe=8, centroids=trained,
            codebooks=pqcb, rerank_mult=4)),
    ):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        results["pq"][name] = {
            "search_s": wall,
            "recall_at_10_vs_l2": recall_at_k(spark, fn(), exact_l2, k),
        }
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

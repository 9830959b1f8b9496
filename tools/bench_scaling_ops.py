"""Scaling-efficiency evidence for the ANALYTICS layer (north_rule).

bench_scaling.py measures the crawl engine at N vs 4N cores and shows
the end-to-end number is capped by this box's shared memory bandwidth
(its no-Spark parse kernel caps the same way). This harness measures the
other half of the repo — the training-data operators — which are
codegen/shuffle compute over columnar text, the workload class the
north rule's two-cluster-size criterion actually targets at 100 TB.

Workload: three operators with deliberately different plan shapes, over
a deterministic synthesized documents table large enough that fixed
per-job costs don't dominate (the sf0.1 driver table is 1.5 MB — it
measures the harness, not the engine):

- ``fingerprint``  — winnowing: HOF-heavy whole-stage-codegen compute,
  narrow, no shuffle of text;
- ``repeated_spans`` — one corpus digest shuffle + per-doc bounded
  windows (the dedup family's shuffle shape);
- ``dsir_score``   — explode → broadcast weight join → one groupBy(doc)
  partial-agg shuffle (fit + score, the selection shape).

Same hygiene as bench_scaling.py: each parallelism level in its own
subprocess (cold JVM), Spark scratch on tmpfs, fixed shuffle-partition
count so the plans are identical at both levels, JIT warmed per query on
a small slice before timing, and a same-process md5 CPU control so the
box's hour is visible in the record.

Usage:
    python tools/bench_scaling_ops.py                  # pairs from SCALING_PAIRS (default 4:16)
    SCALING_CLUSTER=1 python tools/bench_scaling_ops.py  # isolated executor JVMs
    python tools/bench_scaling_ops.py --run 8 [master]   # single measured run
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALING_OPS_DOCS", "200000"))
WORDS = int(os.environ.get("SCALING_OPS_WORDS", "120"))
PAIRS = [
    tuple(int(x) for x in p.split(":"))
    for p in os.environ.get("SCALING_PAIRS", "4:16").split(",")
]
TMPFS = "/dev/shm/crawl_spark_scaling_ops"
FILES = 32


def ensure_docs_fixture(
    n_docs: int, words: int, cache_root: str = "/tmp/crawl_spark_bench"
) -> str:
    """Deterministic text corpus: md5-derived 4096-word vocab, per-doc
    word ids from an affine mix (so there ARE repeated spans and shared
    grams across docs — the dedup operators get real work), written as
    FILES parquet files for scan parallelism."""
    import hashlib

    import numpy as np
    import pandas as pd

    out = os.path.join(cache_root, f"docs_{n_docs}_w{words}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    vocab = np.array(
        [hashlib.md5(b"w%d" % i).hexdigest()[:6] for i in range(4096)]
    )
    i = np.arange(n_docs, dtype=np.int64)[:, None]
    j = np.arange(words, dtype=np.int64)[None, :]
    # block-repetitive mix: every 16th doc repeats a shared template
    # span, the rest vary — gives repeated_spans corpus-wide hits
    ids = (i * 31 + j * 7 + (i % 16) * 131) % 4096
    ids[::16, : words // 2] = (j[:, : words // 2] * 7 + 5) % 4096
    texts = [" ".join(row) for row in vocab[ids]]
    pdf = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})
    chunk = (n_docs + FILES - 1) // FILES
    for k in range(0, n_docs, chunk):
        pdf.iloc[k : k + chunk].to_parquet(
            os.path.join(out, f"part-{k//chunk:05d}.parquet"), index=False
        )
    with open(done, "w") as f:
        f.write("ok")
    return out


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def one_run(cpus: int, master: str | None = None) -> None:
    from pyspark.sql import functions as F

    from crawl_spark.operators.dedup import repeated_spans, span_dedup
    from crawl_spark.operators.sampling import dsir_score, dsir_weights
    from crawl_spark.operators.textops import fingerprint
    from crawl_spark.session import make_session

    extra = {"spark.sql.shuffle.partitions": "32"}
    if os.path.isdir("/dev/shm"):
        os.makedirs(TMPFS, exist_ok=True)
        extra["spark.local.dir"] = TMPFS
    if master and master.startswith("local-cluster"):
        extra["spark.executor.memory"] = os.environ.get("SCALING_EXEC_MEM", "4g")
    spark = make_session(
        f"scaling_ops_{cpus}", master=master or f"local[{cpus}]", extra_conf=extra
    )
    docs_dir = ensure_docs_fixture(N_DOCS, WORDS)
    docs = spark.read.parquet(docs_dir)

    def q_fingerprint(d):
        return fingerprint(d)

    def q_repeated_spans(d):
        return repeated_spans(d, window=15)

    def q_dsir_score(d):
        w = dsir_weights(d.filter(F.col("doc_id") % 7 == 0), d, n_buckets=4096)
        return dsir_score(d, w, n_buckets=4096)

    def q_span_dedup(d):
        # token-level edit (sep=" ", n=15): the Lee-et-al removal shape —
        # digest shuffle + loser join + per-doc reassembly groupBy; the
        # fixture's shared template spans give real corpus-wide losers
        return span_dedup(d, n=15, sep=" ")

    def q_hll_tokens(d):
        # round-5 cardinality arm: explode to ~24M token rows, distinct
        # per 512 hosts — codegen md5 projection + the bounded
        # partial-max register shuffle (the shape §e8 profiles)
        from crawl_spark.operators.hll import hll_distinct

        toks = d.select(
            (F.col("doc_id") % 512).cast("string").alias("host"),
            F.explode(F.split(F.col("text"), " ")).alias("url"),
        )
        return hll_distinct(toks, "url", ("host",))

    def q_mg_tokens(d):
        # round-5 frequency arm: same exploded tokens through the
        # mapInPandas counter fold (Arrow-batch pandas value_counts)
        from crawl_spark.operators.freq import mg_topk

        toks = d.select(
            F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        return mg_topk(toks, "token", (), k=2048)

    queries = [
        ("fingerprint", q_fingerprint),
        ("repeated_spans", q_repeated_spans),
        ("dsir_score", q_dsir_score),
        ("span_dedup", q_span_dedup),
        ("hll_tokens", q_hll_tokens),
        ("mg_tokens", q_mg_tokens),
    ]
    warm = docs.limit(2000).localCheckpoint()  # JIT/codegen warm-up slice
    timings = {}
    for name, q in queries:
        _noop(q(warm))
        t0 = time.time()
        _noop(q(docs))
        timings[name] = round(time.time() - t0, 2)
    total = round(sum(timings.values()), 2)

    # same-process md5 CPU control (box-hour denominator)
    c = F.col("id").cast("string")
    for _ in range(64):
        c = F.md5(c)
    ctl_df = spark.range(0, 2_000_000, 1, 64).select(c.alias("h"))
    ctl_df.filter(F.col("h").startswith("00")).count()
    t0 = time.time()
    ctl_df.filter(F.col("h").startswith("0")).count()
    control = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "master": master or f"local[{cpus}]",
                "n_docs": N_DOCS,
                "queries": timings,
                "seconds": total,
                "docs_per_sec": round(len(queries) * N_DOCS / total, 1),
                "control_sec": control,
            }
        )
    )


def _master_for(cpus: int) -> str | None:
    if os.environ.get("SCALING_CLUSTER"):
        mem_mb = int(os.environ.get("SCALING_EXEC_MEM_MB", "4096"))
        return "local-cluster[%d,2,%d]" % (max(cpus // 2, 1), mem_mb)
    return None


def orchestrate() -> None:
    ensure_docs_fixture(N_DOCS, WORDS)
    results = {}
    for lo, hi in PAIRS:
        for cpus in (lo, hi):
            if cpus in results:
                continue
            cmd = [sys.executable, os.path.abspath(__file__), "--run", str(cpus)]
            m = _master_for(cpus)
            if m:
                cmd.append(m)
            out = subprocess.run(
                cmd, capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(out.stdout[-2000:], out.stderr[-4000:], file=sys.stderr)
                raise SystemExit(f"run {cpus} produced no JSON")
            results[cpus] = json.loads(line[-1])
            print(line[-1])
    for lo, hi in PAIRS:
        a, b = results[lo], results[hi]
        per_q = {
            name: round(
                (N_DOCS / b["queries"][name]) / ((hi / lo) * N_DOCS / a["queries"][name]), 3
            )
            for name in a["queries"]
        }
        print(
            json.dumps(
                {
                    "pair": f"{lo}:{hi}",
                    "efficiency_total": round(
                        b["docs_per_sec"] / ((hi / lo) * a["docs_per_sec"]), 3
                    ),
                    "efficiency_per_query": per_q,
                    "control_ratio": round(
                        (2_000_000 / b["control_sec"])
                        / ((hi / lo) * 2_000_000 / a["control_sec"]),
                        3,
                    ),
                }
            )
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        one_run(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        orchestrate()

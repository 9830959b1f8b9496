"""Plan lint: enforce the repo's scale invariants PROGRAMMATICALLY over
every contract query's physical plan, instead of by prose review.

For each ``__spark_entry__.queries()`` entry (at sf0.001 — plans, not
results, are the subject) the lint walks ``executedPlan().toString()``
and flags:

- ``CartesianProduct`` — an O(n·m) non-broadcast cross join anywhere.
- A ``Window`` whose child subtree funnels through
  ``Exchange SinglePartition`` — the banned single-task global sort
  (the repo's ranked_topk/grouped_topk exist precisely to avoid it).
  Detection is indentation-scoped: only exchanges INSIDE the window's
  subtree count, so a 1-row final aggregate elsewhere in the plan does
  not false-positive.
- ``BroadcastNestedLoopJoin`` — allowed ONLY for queries on the
  documented broadcast-small-side list (brute-force cosine verifier,
  centroid assigns, 1-row normalization totals); flagged elsewhere.

Exceptions are an explicit allowlist with reasons, printed with every
run — a new query that reintroduces a banned shape fails the lint
instead of waiting for a human to read its plan.

Usage: python tools/plan_lint.py [--sf /root/testdata/sf0.001] [names…]
Exit code 1 if any non-allowlisted finding survives.
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, ".")

# query -> (pattern, reason) pairs that are sanctioned for that query
ALLOW: dict[str, list[tuple[str, str]]] = {
    # the documented O(n·m) verifier: queries side is broadcast-small
    "cosine_topk": [("BroadcastNestedLoopJoin", "brute-force verifier: query side broadcast-small by contract")],
    "embed_neardup": [("BroadcastNestedLoopJoin", "centroid assign: centroid side is k<=65536 rows, broadcast")],
    "semdedup": [("BroadcastNestedLoopJoin", "centroid assign (same as embed_neardup)")],
    "ivf_assign": [("BroadcastNestedLoopJoin", "centroid assign: broadcast centroids")],
    "ivf_topk": [("BroadcastNestedLoopJoin", "broadcast centroids + per-query nprobe cells")],
    "ivf_train": [("BroadcastNestedLoopJoin", "Lloyd iteration: broadcast centroids")],
    "ivf_pq": [("BroadcastNestedLoopJoin", "broadcast centroids; PQ codebooks are plan literals")],
    "pq_topk": [("BroadcastNestedLoopJoin", "queries broadcast-small; ADC tables are literals")],
    "pq_encode": [("BroadcastNestedLoopJoin", "queries broadcast-small; codebook literals")],
    "signbit_buckets": [("BroadcastNestedLoopJoin", "hyperplane matrix is a literal-sized broadcast")],
    "signbit_neardup": [("BroadcastNestedLoopJoin", "same as signbit_buckets")],
    "hits": [("BroadcastNestedLoopJoin", "1-row L1-normalization total broadcast per iteration")],
    "lm_buckets": [("BroadcastNestedLoopJoin", "2 scalar tercile cutoffs enter as a 1-row broadcast (collected literals)")],
    "dsir_score": [("BroadcastNestedLoopJoin", "model totals are 1-row broadcasts at fit time")],
    "domain_mix": [("BroadcastNestedLoopJoin", "per-stratum rates: tiny groupBy result broadcast")],
    "contamination": [("BroadcastNestedLoopJoin", "1-row corpus doc-total scalar crossed into the per-bench report")],
    "nb_classify": [("BroadcastNestedLoopJoin", "K-row priors x 1-row total, KxB model spine, gram-less docs x K labels — all bounded by class count")],
    "curate": [("BroadcastNestedLoopJoin", "composition inherits the sanctioned 1-row/centroid broadcasts above")],
    "ann_recall": [("BroadcastNestedLoopJoin", "eval harness composes the brute-force verifier (queries broadcast-small by contract) with ivf_topk's broadcast centroids")],
    "lsh_recall": [("BroadcastNestedLoopJoin", "three 1-row count aggregates crossed into the summary row (the contamination-report shape)")],
}


def _indent(line: str) -> int:
    """Tree depth of a plan line: length of the branch-drawing prefix."""
    m = re.match(r"^[\s:+\-*()0-9]*?(?=[A-Za-z])", line)
    return len(m.group(0)) if m else 0


def lint_plan(plan: str) -> list[str]:
    lines = plan.splitlines()
    findings = []
    for i, line in enumerate(lines):
        if "CartesianProduct" in line:
            findings.append("CartesianProduct")
        if re.search(r"\bWindow\b", line) and "WindowGroupLimit" not in line:
            depth = _indent(line)
            for child in lines[i + 1:]:
                cd = _indent(child)
                if cd <= depth and child.strip():
                    break  # left the window's subtree
                if "Exchange SinglePartition" in child:
                    findings.append("Window over Exchange SinglePartition")
                    break
                if "Exchange hashpartitioning" in child or "Exchange rangepartitioning" in child:
                    break  # partitioned input reaches the window first
        if "BroadcastNestedLoopJoin" in line:
            findings.append("BroadcastNestedLoopJoin")
    return findings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from crawl_spark.session import make_session

    spark = make_session("plan_lint", master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    names = args.names or sorted(qs)
    bad = 0
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        findings = lint_plan(plan)
        allowed = ALLOW.get(name, [])
        kept = []
        for f in findings:
            reasons = [r for pat, r in allowed if pat in f]
            if reasons:
                continue
            kept.append(f)
        if kept:
            bad += 1
            print(f"FAIL {name}: {sorted(set(kept))}")
        else:
            note = "" if not findings else " (allowlisted: %s)" % sorted(
                {f for f in findings}
            )
            print(f"ok   {name}{note}")
    print(f"\n{len(names) - bad}/{len(names)} query plans clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

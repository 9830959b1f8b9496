"""No-Spark parse-kernel hardware control (the BENCH.md §b protocol,
now a committed tool instead of an ad-hoc script): the crawl's hot
kernel — HTML parse + text extraction via the repo's own
functions/htmldom machinery — over the SAME pages fixture the scaling
bench crawls, run under plain multiprocessing at several worker counts.

This is the memory-bandwidth ceiling measurement: if THIS number does
not scale from N to 4N workers on the box, no engine hosting the same
kernel can, and the crawl's flat scaling row is a hardware statement,
not an engine one. Pair it same-hour with `SCALING_CLUSTER=1
tools/bench_scaling.py` (crawl) and `SCALING_CONTROL=1` (CPU-bound
through the harness).

Usage: python tools/bench_parse_kernel.py [workers...]   (default 1 4 16)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("KERNEL_PAGES", "20000"))
FILLER = int(os.environ.get("KERNEL_FILLER", "60"))


def _parse_chunk(htmls: list[bytes]) -> int:
    from crawl_spark.functions.htmldom import extract_links, parse_html, sel_text

    n = 0
    for h in htmls:
        root = parse_html(h)
        sel_text(root, "body")
        n += len(extract_links(root, "http://x.example/", "a"))
    return n


def main() -> None:
    workers_list = [int(w) for w in sys.argv[1:]] or [1, 4, 16]
    from bench import ensure_pages_fixture

    import pandas as pd

    pages_dir = ensure_pages_fixture(N_PAGES, filler_paras=FILLER)
    htmls = []
    for f in sorted(os.listdir(pages_dir)):
        if f.endswith(".parquet"):
            htmls.extend(pd.read_parquet(os.path.join(pages_dir, f))["html"])
    htmls = [bytes(h) for h in htmls]
    out = {"n_pages": len(htmls), "filler_paras": FILLER, "runs": {}}

    for w in workers_list:
        chunks = [htmls[i::w] for i in range(w)]
        with mp.Pool(w) as pool:
            pool.map(_parse_chunk, [c[:50] for c in chunks])  # warm imports
            t0 = time.time()
            pool.map(_parse_chunk, chunks)
            wall = time.time() - t0
        out["runs"][str(w)] = {
            "seconds": round(wall, 2),
            "pages_per_sec": round(len(htmls) / wall, 1),
            "per_worker": round(len(htmls) / wall / w, 1),
        }
    runs = out["runs"]
    if "4" in runs and "16" in runs:
        out["eff_4_to_16"] = round(
            runs["16"]["pages_per_sec"] / (4 * runs["4"]["pages_per_sec"]), 3
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

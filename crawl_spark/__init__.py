"""crawl_spark — a PySpark-native web-crawl frontier + analytics engine.

A from-scratch reimplementation of the *capabilities* of the Go crawler
library ``crackcomm/crawl`` (reference at /root/reference), re-expressed
Spark-first:

- the frontier is a snapshot-versioned table (parquet + JSON manifest with
  atomic-rename commits; Iceberg-compatible semantics), not a Go channel;
- fetch is an equi-join of the priority-ranked fetch batch against a
  Common-Crawl-style ``pages`` table on canonical URL, not live HTTP;
- link/text extraction are vectorized Arrow (pandas) UDFs over the
  ``html: binary`` column — never per-row Python;
- URL-seen dedup is an exact anti-join with a per-host-hash-bucket Bloom
  pre-filter; per-host politeness (robots rules + crawl-delay budgets) is a
  window-ranked priority queue over ``groupBy(host)``.

Layout:
    session    — SparkSession factory with pinned configs
    schemas    — StructTypes for every engine table
    functions/ — pure scalar semantics + their pandas-UDF wrappers
    operators/ — dedup, politeness, ranking, similarity, text stats, skew
    sources/   — table-format adapter (snapshots), fixture generators
    plans/     — the crawl round-loop engine + handler routing
    streaming/ — Structured Streaming frontier variant
"""

__version__ = "0.1.0"

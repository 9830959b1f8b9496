"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — the large-scale corpus-processing layer on top of
the crawl engine.

Everything here is built from pyspark.sql.functions (JVM-side,
whole-stage-codegen) — no Python in the hot path — so each operator
scales to 100 TB corpora and can be verified 1:1 against an ANSI-SQL
DuckDB oracle (see __spark_entry__.py).
"""

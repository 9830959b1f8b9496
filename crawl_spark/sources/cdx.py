"""CDX/CDXJ URL index: the fourth public Common-Crawl artifact family
(alongside `warc.py` in, `wet.py` / `wat.py` out). A CDX index is what
makes a 100 TB crawl *queryable without scanning it*: one sorted line
per capture, keyed by SURT (Sort-friendly URI Reordering Transform),
plus a tiny secondary index (``cluster.idx``) mapping key ranges to
(file, byte-offset) so a lookup touches one gzip block out of
petabytes. The reference's sink (`response_utils.go:6-22`) writes raw
responses; this module is the index layer a downstream consumer uses
to find them.

Line format (CDXJ, fixed field order)::

    <surt> <ts14> {"url":"<esc>","mime":"<esc>","status":"<s>",
    "digest":"<md5hex>","length":"<n>"}

SURT contract (pinned; defined over canonical URLs from
`functions/urlnorm.py` — lowercase scheme/host, no fragment, default
ports dropped, path >= "/"):

1. strip the scheme (``^https?://``);
2. host: strip one leading ``www.``, split on ``.``, reverse, join
   with ``,`` (pywb-style);
3. a remaining (non-default) port stays appended as ``:<port>`` after
   the reversed host;
4. ``)`` then the path lowercased; a bare root path ``/`` renders as
   the empty string;
5. a non-empty query renders as ``?`` + its ``&``-separated params
   lowercased and ASCII-sorted (param order is presentation, not
   identity). An empty query (trailing ``?``) is treated as no query.

Out of contract (documented, not silently wrong): userinfo and
bracketed IPv6 hosts (the canonicalizer never emits userinfo; IPv6
literals would split on ``:``), and %-encoding normalization (the
canonical form preserves the query byte-for-byte, so equal captures
index identically).

Every transform is a JVM column expression built from the SAME string
algebra the DuckDB oracle replays (``instr``/``substring_index``/
``split``/``reverse``/``array_sort`` ↔ ``strpos``/``substr``/
``string_split``/``list_reverse``/``list_sort``) — hash-checked
bit-for-bit by the ``cdx_index`` contract query. JSON escaping reuses
`wat.json_escape` (five-step replace chain); the digest is md5 hex
(the repo's cross-engine hash rule — CC uses sha1-b32, a cosmetic
difference documented here rather than hidden).

Plan shape at 100 TB:

- building the index is one projection over the capture scan (no
  shuffle until the sink's range partitioning);
- `write_cdx` is ONE range shuffle (`repartitionByRange` on
  (surt, ts14) — sampled boundaries, the same mechanism a sorted
  1000-executor write uses) + a per-partition sorted gzip writer
  (`mapInPandas`, Arrow-batched; partition id = shard id, so the
  file set concatenates globally sorted);
- the writer emits one ``cluster.idx`` row per ``block_size``-line
  gzip member as its *output rows* — the secondary index falls out of
  the same job, bounded at rows/block_size (CC ships ~1.5M lines for
  the whole crawl at block 3000);
- `cdx_lookup` on a parquet-backed index is a ``startswith`` filter —
  Catalyst pushes it as ``StringStartsWith`` to the scan (PLANS.md);
  `cdx_lookup_files` proves the file-level path: prune candidate
  shards driver-side on cluster.idx (tiny), read ONLY those gzip
  members.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .wat import json_escape
from .wet import publish_dir, stage_dir

CDX_MANIFEST = "_cdx_manifest.json"
CLUSTER_IDX = "cluster.idx"

_IDX_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("comp_len", T.LongType()),
        T.StructField("n_lines", T.LongType()),
    ]
)


def surt_key(url: Column) -> Column:
    """SURT key of a canonical URL as one JVM expression (module
    contract above). DuckDB twin: the same ``strpos``-based algebra —
    see `__spark_entry__.oracle_sql()['cdx_index']`."""
    rest = F.regexp_replace(url, "^https?://", "")
    hostport = F.substring_index(rest, "/", 1)
    # canonical path is always >= "/"; guard anyway (no '/' -> root).
    pathq = F.when(
        F.instr(rest, "/") > 0,
        F.substring(rest, F.length(hostport) + 1, F.length(rest)),
    ).otherwise(F.lit("/"))
    path = F.substring_index(pathq, "?", 1)
    query = F.when(
        F.instr(pathq, "?") > 0,
        F.substring(pathq, F.length(path) + 2, F.length(pathq)),
    ).otherwise(F.lit(""))
    host = F.substring_index(hostport, ":", 1)
    port = F.when(
        F.instr(hostport, ":") > 0,
        F.substring(hostport, F.length(host) + 1, F.length(hostport)),
    ).otherwise(F.lit(""))
    host_nw = F.regexp_replace(host, "^www[.]", "")
    rev = F.array_join(F.reverse(F.split(host_nw, "[.]")), ",")
    key_path = F.when(F.lower(path) == "/", F.lit("")).otherwise(
        F.lower(path)
    )
    key_query = F.when(
        query != "",
        F.concat(
            F.lit("?"),
            F.array_join(F.array_sort(F.split(F.lower(query), "&")), "&"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(rev, port, F.lit(")"), key_path, key_query)


def cdx_payload(
    url: Column,
    mime: Column,
    status: Column,
    digest: Column,
    length: Column,
    pointer: tuple[Column, Column, Column] | None = None,
) -> Column:
    """The CDXJ JSON payload — fixed key order by construction (concat,
    never a dict), same determinism contract as `wat.wat_payload`.
    ``pointer=(filename, offset, rlength)`` appends the WARC
    record-pointer fields (see `cdx_records`)."""
    parts = [
        F.lit('{"url":"'),
        json_escape(url),
        F.lit('","mime":"'),
        json_escape(mime),
        F.lit('","status":"'),
        status.cast("string"),
        F.lit('","digest":"'),
        digest,
        F.lit('","length":"'),
        length.cast("string"),
    ]
    if pointer is not None:
        fname, off, rlen = pointer
        parts += [
            F.lit('","offset":"'),
            off.cast("string"),
            F.lit('","rlength":"'),
            rlen.cast("string"),
            F.lit('","filename":"'),
            json_escape(fname),
        ]
    return F.concat(*parts, F.lit('"}'))


def cdx_records(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    mime_col: str = "mime",
    status_col: str = "status",
    content_col: str = "html",
    pointer_cols: tuple[str, str, str] | None = None,
) -> DataFrame:
    """One CDXJ record per capture → ``(surt, ts14, line)``.

    digest/length are computed from ``content_col`` (md5 hex / UTF-8
    octet length). Rows missing url or timestamp are dropped (an index
    line is anchored to a capture). One projection over the scan —
    Catalyst prunes the capture table to exactly the input columns; no
    shuffle.

    ``pointer_cols=(filename, offset, length)`` (the
    `warc.read_warc_with_offsets` triple) appends the record-pointer
    fields real CC CDXJ carries — ``"offset"``/``"rlength"``/
    ``"filename"`` — so a consumer can `warc.fetch_warc_record` the
    capture straight off the index line. (CC names the record length
    ``length``; this module already uses ``length`` for payload octets,
    so the pointer field is ``rlength`` — a documented, not hidden,
    divergence like md5-vs-sha1b32.)
    """
    # Null/adversarial robustness: url and timestamp anchor the line
    # (rows missing either are dropped below); everything else is
    # defaulted so `line` can never null-propagate to NULL — mime is a
    # raw response header, so control bytes (which would make the CDXJ
    # payload invalid JSON; json_escape covers only the 5 JSON-mandated
    # escapes) are stripped and a missing value becomes pywb's "unk";
    # a missing status becomes "0"; a missing body digests/measures as
    # the empty payload (Common Crawl's convention).
    c = F.coalesce(F.col(content_col).cast("string"), F.lit(""))
    mime = F.coalesce(
        F.regexp_replace(F.col(mime_col), "[\\x00-\\x1f]", ""),
        F.lit("unk"),
    )
    status = F.coalesce(F.col(status_col).cast("string"), F.lit("0"))
    pointer = None
    if pointer_cols is not None:
        fn_col, off_col, len_col = pointer_cols
        pointer = (
            F.coalesce(F.col(fn_col), F.lit("")),
            F.coalesce(F.col(off_col), F.lit(-1)),
            F.coalesce(F.col(len_col), F.lit(-1)),
        )
    payload = cdx_payload(
        F.col(url_col), mime, status, F.md5(c), F.octet_length(c), pointer
    )
    staged = df.filter(
        F.col(url_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        surt_key(F.col(url_col)).alias("surt"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts14"),
        payload.alias("__payload"),
    )
    return staged.select(
        "surt",
        "ts14",
        F.concat(
            F.col("surt"), F.lit(" "), F.col("ts14"), F.lit(" "),
            F.col("__payload"),
        ).alias("line"),
    )


def cdx_lookup(index: DataFrame, prefix: str) -> DataFrame:
    """All index rows whose SURT key starts with ``prefix`` — the CDX
    range query (a host, a host)/path subtree, …). On a parquet-backed
    index this is a pushed ``StringStartsWith`` scan filter plus
    min/max row-group pruning on the sorted key — no shuffle, no full
    scan (PLANS.md). Oracle twin: ``surt LIKE prefix || '%'``."""
    return index.filter(F.col("surt").startswith(prefix))


def cdx_collapse(index: DataFrame, digits: int = 8) -> DataFrame:
    """CDX-server ``collapse=timestamp:<digits>`` semantics (the public
    pywb/OpenWayback query API): keep ONE capture per (surt,
    ts14-prefix) bucket — the first in index order, i.e. the smallest
    ts14, with the remaining columns as a deterministic total-order
    tiebreak. ``digits=8`` is "one per url per day", ``digits=6`` per
    month; ``digits=14`` still folds captures sharing an exact
    (surt, ts14) pair (same-second recaptures keep one row — the
    CDX-server behaves the same way at full-timestamp collapse).

    Shape: ONE partial-agg shuffle via ``min(struct(...))`` groupBy —
    the repo's first-occurrence pattern (cf. `dedup.token-block`),
    never a per-key window: at 10^11 captures a hot urlkey holds years
    of captures, but partial aggregation folds them map-side to one
    row per (key, bucket) per input partition before the exchange.

    ``index`` is typed rows (`cdx_parse`/`read_cdx` output) or any
    frame with ``surt``/``ts14`` string columns; all other columns ride
    through the struct unchanged.
    """
    if not 1 <= digits <= 14:
        raise ValueError("cdx_collapse: digits must be in [1, 14]")
    rest = [c for c in index.columns if c not in ("surt", "ts14")]
    pick = F.min(
        F.struct(F.col("ts14"), *[F.col(c) for c in rest])
    ).alias("__first")
    out = index.groupBy(
        F.col("surt"), F.substring("ts14", 1, digits).alias("__bucket")
    ).agg(pick)
    return out.select(
        "surt",
        F.col("__first.ts14").alias("ts14"),
        *[F.col("__first." + c).alias(c) for c in rest],
    )


def revisit_records(index: DataFrame) -> DataFrame:
    """Url-agnostic duplicate-capture marking — the Heritrix revisit
    rule Common Crawl applies at write time: the FIRST capture of each
    payload ``digest`` (smallest (ts14, surt, url)) is the *original*;
    every later capture of the same bytes becomes a ``revisit`` record
    pointing at it (``orig_surt``/``orig_ts14``, NULL on originals).
    Downstream, originals alone carry payload bytes — revisits are
    pointers, which is what keeps a 100 TB archive from storing the
    same page body thousands of times.

    Shape: one partial-agg ``groupBy(digest)`` builds the O(distinct
    digests) originals table, one equi-join on digest stamps the flag.
    A hot digest (empty bodies, error pages) folds map-side in the agg
    and fans out 1:1 in the join; AQE's skew-join split handles the
    join side. Identical full rows (same digest+ts14+surt+url) are
    indistinguishable captures and all mark as originals — documented,
    not defended. Rows with a NULL digest (e.g. `cdx_parse` of a
    corrupt line) cannot be dedup'd: they pass through unmarked
    (revisit=false, NULL origin) via the left join rather than being
    silently dropped by NULL-key join semantics.
    """
    first = (
        index.filter(F.col("digest").isNotNull())
        .groupBy("digest")
        .agg(F.min(F.struct("ts14", "surt", "url")).alias("__o"))
    )
    joined = index.join(first, "digest", "left")
    is_rev = F.when(F.col("__o").isNull(), F.lit(False)).otherwise(
        ~(
            (F.col("ts14") == F.col("__o.ts14"))
            & (F.col("surt") == F.col("__o.surt"))
            & (F.col("url") == F.col("__o.url"))
        )
    )
    return joined.select(
        *index.columns,
        is_rev.alias("revisit"),
        F.when(is_rev, F.col("__o.surt")).alias("orig_surt"),
        F.when(is_rev, F.col("__o.ts14")).alias("orig_ts14"),
    )


_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.StringType()),
        T.StructField("offset", T.StringType()),
        T.StructField("rlength", T.StringType()),
        T.StructField("filename", T.StringType()),
    ]
)


def cdx_parse(
    lines: DataFrame, line_col: str = "line", with_pointers: bool = False
) -> DataFrame:
    """The consumer inverse: parse CDXJ lines back to typed columns
    ``(surt, ts14, url, mime, status, digest, length)``. Splits on the
    two framing spaces JVM-side (SURT keys and ts14 are space-free by
    construction; the JSON payload is everything after the second
    space) and hands the payload to Jackson ``from_json`` — the same
    escape-inverse proof shape as `wat.wat_links`. ``with_pointers``
    adds the WARC record-pointer columns (offset/rlength/filename —
    NULL on lines indexed without them); the default output schema is
    unchanged so existing consumers/oracles are unaffected."""
    line = F.col(line_col)
    surt = F.substring_index(line, " ", 1)
    ts14 = F.substring_index(F.substring_index(line, " ", 2), " ", -1)
    payload = F.substring(
        line, F.length(surt) + F.length(ts14) + 3, F.length(line)
    )
    parsed = lines.select(
        surt.alias("surt"),
        ts14.alias("ts14"),
        F.from_json(payload, _PAYLOAD_SCHEMA).alias("p"),
    )
    cols = [
        F.col("surt"),
        F.col("ts14"),
        F.col("p.url").alias("url"),
        F.col("p.mime").alias("mime"),
        F.col("p.status").alias("status"),
        F.col("p.digest").alias("digest"),
        F.col("p.length").cast("long").alias("length"),
    ]
    if with_pointers:
        cols += [
            F.col("p.offset").cast("long").alias("offset"),
            F.col("p.rlength").cast("long").alias("rlength"),
            F.col("p.filename").alias("filename"),
        ]
    return parsed.select(*cols)


def write_cdx(
    recs: DataFrame,
    path: str,
    n_shards: int = 4,
    block_size: int = 3000,
) -> dict:
    """Write a globally sorted, gzip-blocked CDX file set + cluster.idx
    + manifest. Returns the manifest dict.

    ``recs`` is `cdx_records` output. ONE range shuffle
    (``repartitionByRange`` on (surt, ts14) — partition *i* holds keys
    strictly below partition *i+1*, so ``cdx-00000.gz < cdx-00001.gz``
    and the concatenation is globally sorted) + a per-partition
    ``mapInPandas`` writer. Each file is a sequence of independent
    gzip members of ``block_size`` lines (mtime=0) — a reader can
    range-fetch and inflate ONE block; the writer's *output rows* are
    exactly the cluster.idx rows (first key of each block, filename,
    compressed offset/length, line count), so the secondary index
    costs nothing extra. cluster.idx is bounded at rows/block_size and
    written driver-side in key order (CC's own cluster.idx is one
    ~1.5M-line file; at larger scale write it with a single-partition
    sorted text job instead). Stage + rename atomically, same contract
    as `wet.write_segments`.
    """
    if not 1 <= n_shards <= 99999:
        # shard names are fixed-width cdx-%05d.gz: width keeps the
        # lexicographic file order equal to the numeric (= key) order
        raise ValueError("write_cdx: n_shards must be in [1, 99999]")
    if block_size < 1:
        raise ValueError("write_cdx: block_size must be >= 1")
    tmp = stage_dir(path)

    staged = (
        recs.select("surt", "ts14", "line")
        .repartitionByRange(n_shards, "surt", "ts14")
        .sortWithinPartitions("surt", "ts14")
    )

    def write_shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = "cdx-%05d.gz" % pid
        out_path = os.path.join(tmp, name)
        idx_rows: list = []
        pending: list = []
        offset = 0
        fh = None

        def flush() -> None:
            nonlocal offset, pending
            if not pending:
                return
            data = gzip.compress(
                ("\n".join(pending) + "\n").encode("utf-8"), mtime=0
            )
            fh.write(data)
            first = pending[0]
            key = first[: first.index(" ", first.index(" ") + 1)]
            idx_rows.append(
                (key, name, offset, len(data), len(pending))
            )
            offset += len(data)
            pending = []

        for pdf in batches:
            if fh is None and len(pdf):
                fh = open(out_path, "wb")
            for ln in pdf["line"]:
                pending.append(ln)
                if len(pending) >= block_size:
                    flush()
        if fh is not None:
            flush()
            fh.close()
        yield pd.DataFrame(
            idx_rows,
            columns=["key", "filename", "offset", "comp_len", "n_lines"],
        )

    idx = [
        (r["key"], r["filename"], r["offset"], r["comp_len"], r["n_lines"])
        for r in staged.mapInPandas(write_shard, _IDX_SCHEMA)
        .collect()
    ]
    # numeric shard id then offset == key order (fixed-width names make
    # the lexicographic manifest order agree; sort numerically anyway)
    idx.sort(key=lambda t: (int(t[1][4:-3]), t[2]))
    with open(os.path.join(tmp, CLUSTER_IDX), "w", encoding="utf-8") as f:
        for key, name, off, clen, n in idx:
            f.write("%s\t%s\t%d\t%d\t%d\n" % (key, name, off, clen, n))
    files = sorted({t[1] for t in idx})
    manifest = {
        "format": "cdxj",
        "files": files,
        "n_blocks": len(idx),
        "n_lines": int(sum(t[4] for t in idx)),
        "block_size": block_size,
    }
    with open(os.path.join(tmp, CDX_MANIFEST), "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
    publish_dir(tmp, path)
    return manifest


def write_cdx_table(
    index: DataFrame, path: str, n_shards: int = 4
) -> None:
    """The parquet twin of `write_cdx` (DEPLOY.md "Storage layout"):
    typed index rows as a range-sorted parquet table — the analytics
    read path, where a `cdx_lookup` prefix filter pushes to the scan
    as ``StringStartsWith`` and the within-file (surt, ts14) sort makes
    min/max row-group pruning effective (a host lookup reads a sliver).
    Same ONE range shuffle as `write_cdx`; columnar instead of
    gzip-blocked lines. Use `spark.read.parquet(path)` + `cdx_lookup`
    to query it."""
    (
        index.repartitionByRange(n_shards, "surt", "ts14")
        .sortWithinPartitions("surt", "ts14")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_cdx(
    spark: SparkSession, path: str, with_pointers: bool = False
) -> DataFrame:
    """Read a `write_cdx` file set back as typed rows (`cdx_parse`).
    Gzip members concatenate transparently (Hadoop's codec inflates
    multi-member streams), so this is a plain text scan of the shard
    files — split-parallel across files."""
    with open(os.path.join(path, CDX_MANIFEST), encoding="utf-8") as f:
        manifest = json.load(f)
    paths = [os.path.join(path, name) for name in manifest["files"]]
    return cdx_parse(
        spark.read.text(paths).withColumnRenamed("value", "line"),
        with_pointers=with_pointers,
    )


def _read_cluster_idx(path: str) -> list:
    rows = []
    with open(os.path.join(path, CLUSTER_IDX), encoding="utf-8") as f:
        for ln in f:
            key, name, off, clen, n = ln.rstrip("\n").split("\t")
            rows.append((key, name, int(off), int(clen), int(n)))
    return rows


def cdx_lookup_files(
    spark: SparkSession, path: str, prefix: str, with_pointers: bool = False
) -> DataFrame:
    """Prefix lookup through cluster.idx: prune to candidate *blocks*
    driver-side (the idx is tiny and sorted — a block can hold keys in
    [its first key, next block's first key)), inflate ONLY those gzip
    members, filter exactly. This is the petabyte read path: one HTTP
    range fetch per candidate block instead of a 300-file scan.
    Returns the same typed rows as `read_cdx` (test-asserted equal to
    the full-scan filter)."""
    if not prefix:
        raise ValueError(
            "cdx_lookup_files: empty prefix selects every block — use "
            "read_cdx for a full scan"
        )
    idx = _read_cluster_idx(path)
    cand: list = []
    for i, (key, name, off, clen, n) in enumerate(idx):
        nxt = idx[i + 1][0] if i + 1 < len(idx) else None
        # block may contain keys in [key, nxt): overlaps the prefix
        # range iff first key is not already past the prefix and the
        # next block does not start before it.
        if key[: len(prefix)] <= prefix and (nxt is None or nxt >= prefix):
            cand.append((name, off, clen))
    lines: list = []
    for name, off, clen in cand:
        with open(os.path.join(path, name), "rb") as f:
            f.seek(off)
            blob = f.read(clen)
        for ln in gzip.decompress(blob).decode("utf-8").splitlines():
            if ln.startswith(prefix):
                lines.append((ln,))
    df = spark.createDataFrame(lines, T.StructType(
        [T.StructField("line", T.StringType())]
    ))
    return cdx_parse(df, with_pointers=with_pointers)

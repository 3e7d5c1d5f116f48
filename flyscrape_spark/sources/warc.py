"""WARC (ISO 28500) ingest — read Web ARChive blobs into page rows.

Every web-scale training pipeline starts from crawl archives in WARC
format (Common Crawl publishes nothing else), so the engine both
WRITES its fetched pages as WARC response records and READS WARC
blobs back into the ``(url, status, html)`` shape the rest of the
pipeline consumes. The reference has no archive format (flyscrape
caches raw HTTP dumps in bbolt, /root/reference/modules/cache/
cache.go:73-78); engine-added for the training-data mission.

Format notes (public spec, iipc/warc-specifications):
- a record is ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` + exactly
  ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``;
- ``response`` records wrap an HTTP/1.1 message (status line +
  headers + body);
- archives usually store each record as its own gzip MEMBER so
  readers can seek; members concatenate into one valid .gz stream.

Scale shape: the unit of parallelism is the BLOB (one row per WARC
file / Common Crawl shard, ~100 MB-1 GB each — exactly how CC ships:
64k files per crawl), so a 100 TB archive is ~10^5 blob rows spread
over executors by the parquet/Iceberg scan; ``mapInPandas`` walks
each blob's records sequentially (the format is a byte stream —
record framing is inherently serial WITHIN a blob, parallel ACROSS
blobs). No shuffle anywhere: read, frame, emit.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

PAGE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("status", IntegerType()),
    StructField("content_type", StringType()),
    StructField("html", StringType()),
    StructField("record_offset", LongType()),
])


# --------------------------------------------------------------- write

def build_warc(pages: list[tuple[str, int, str]],
               compress: bool = True) -> bytes:
    """Serialize ``(url, status, html)`` pages as WARC response
    records (one gzip member per record when ``compress``), matching
    the framing Common Crawl readers expect. Deterministic: no
    timestamps/uuids — WARC-Date fixed at the epoch and the record id
    derived from the position, so round-trip tests and DuckDB oracles
    reproduce byte-identical blobs."""
    out = io.BytesIO()
    for i, (url, status, html) in enumerate(pages):
        body = html.encode("utf-8")
        http = (
            f"HTTP/1.1 {status} X\r\n"
            f"Content-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("utf-8") + body
        rec = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:rec:{i}>\r\n"
            "WARC-Date: 1970-01-01T00:00:00Z\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("utf-8") + http + b"\r\n\r\n"
        if compress:
            # mtime=0: deterministic gzip member bytes
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out.write(buf.getvalue())
        else:
            out.write(rec)
    return out.getvalue()


def pages_to_warc(pages: DataFrame, group_col: str = "host",
                  compress: bool = True) -> DataFrame:
    """Archive pages as one WARC blob per group: ``(group, warc)``.
    Pages sort by URL within the group so the blob bytes are
    deterministic. The group is the parallelism unit — shard a crawl
    by host (or ``pmod(url_key, K)`` for even sizes) exactly like
    Common Crawl's 64k-file segmenting."""
    schema = StructType([StructField("group", StringType()),
                         StructField("warc", BinaryType())])

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("url")
        blob = build_warc(
            list(zip(pdf["url"], (int(s) for s in pdf["status"]),
                     pdf["html"])),
            compress=compress,
        )
        return pd.DataFrame({"group": [str(pdf[group_col].iloc[0])],
                             "warc": [blob]})

    return pages.groupby(group_col).applyInPandas(build, schema)


# ---------------------------------------------------------------- read

def iter_warc_records(blob: bytes) -> Iterator[tuple[int, dict, bytes]]:
    """Yield ``(offset, warc_headers, payload)`` per record. Accepts
    plain or gzipped blobs (per-record members or one big member —
    GzipFile consumes concatenated members transparently). Streaming:
    records decompress and parse one at a time, so peak task memory is
    one record, not the decompressed blob — a 1 GB Common Crawl file
    (3-5 GB decompressed) costs megabytes, and offsets stay
    decompressed-stream offsets either way."""
    raw = io.BytesIO(blob)
    f = (io.BufferedReader(gzip.GzipFile(fileobj=raw))
         if blob[:2] == b"\x1f\x8b" else raw)
    pos = 0
    while True:
        try:
            line = f.readline()
        except (OSError, EOFError):
            return  # truncated/corrupt gzip member: stop cleanly
        if not line:
            return
        start, pos = pos, pos + len(line)
        if line == b"\r\n":
            continue
        if not line.startswith(b"WARC/"):
            return  # framing lost: stop rather than emit garbage
        headers: dict[str, str] = {}
        while True:
            try:
                h = f.readline()
            except (OSError, EOFError):
                return
            pos += len(h)
            if h in (b"", b"\r\n"):
                break
            k, _, v = h.partition(b":")
            headers[k.strip().lower().decode("utf-8", "replace")] = (
                v.strip().decode("utf-8", "replace"))
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return
        try:
            payload = f.read(length)
        except (OSError, EOFError):
            return
        pos += len(payload)
        yield start, headers, payload
        if len(payload) < length:
            return  # truncated payload: emit what we had, then stop


def parse_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """(status, content_type, body) from an HTTP/1.1 response blob."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end == -1:
        return 0, "", payload
    lines = payload[:head_end].decode("ascii", "replace").split("\r\n")
    try:
        status = int(lines[0].split(" ", 2)[1])
    except (IndexError, ValueError):
        status = 0
    ctype = ""
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, payload[head_end + 4:]


def read_warc_blobs(blobs: DataFrame,
                    content_col: str = "content") -> DataFrame:
    """DataFrame of WARC blobs (``binary`` column) → one row per
    response record: (url, status, content_type, html, record_offset).
    Non-response records (warcinfo, request, metadata) are skipped,
    as WET/text extractors do."""

    def process(batches):
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in
                    ("url", "status", "content_type", "html",
                     "record_offset")}
            for blob in pdf[content_col]:
                if blob is None:
                    continue
                for off, headers, payload in iter_warc_records(bytes(blob)):
                    if headers.get("warc-type") != "response":
                        continue
                    status, ctype, body = parse_http_response(payload)
                    rows["url"].append(headers.get("warc-target-uri", ""))
                    rows["status"].append(status)
                    rows["content_type"].append(ctype)
                    rows["html"].append(body.decode("utf-8", "replace"))
                    rows["record_offset"].append(off)
            yield pd.DataFrame(rows)

    return blobs.select(content_col).mapInPandas(process, PAGE_SCHEMA)


# ----------------------------------------------------------- CDX index

def cdx_index(pages: DataFrame, ts_col: str = "ts",
              digest_col: str = "digest") -> DataFrame:
    """(surt_key, ts, url, digest, shard_host, shard_pos): a CDX(J)-
    style capture index over fetched pages — the lookup sidecar every
    WARC archive ships with (public convention: Common Crawl's
    cc-index, pywb cdxj). Rows are keyed by SURT so one site's
    captures are lexicographic neighbors; ``shard_pos`` is the row's
    rank within its host shard ordered by (surt_key, ts), i.e. the
    offset it would occupy in that shard's sorted CDX file.

    Scale shape: SURT is a pure projection (0 shuffles); the only
    exchange is the per-host shard window — bounded by per-host
    capture counts, which the politeness budget already caps. A
    GLOBAL position would be a single-task sort; sharding by host is
    how real CDX collections are laid out anyway (then merged by the
    reader as a k-way scan).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flyscrape_spark.functions.urls import host_of, surt_key

    keyed = pages.select(
        surt_key(F.col("url")).alias("surt_key"),
        F.col(ts_col).alias("ts"),
        "url",
        F.col(digest_col).alias("digest"),
        host_of(F.col("url")).alias("shard_host"),
    )
    w = Window.partitionBy("shard_host").orderBy("surt_key", "ts", "url")
    return keyed.withColumn(
        "shard_pos", (F.row_number().over(w) - 1).cast("bigint")
    )


def revisit_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Archive-level payload dedup: the WARC 'revisit' record scheme
    (WARC/1.1 §6.7.2, Common Crawl / IA convention). The FIRST capture
    of each payload digest stays a full ``response`` record; every
    later capture of the same digest becomes a ``revisit`` record
    that stores only headers plus a ``refers_to`` pointer — at
    archive scale most recaptures are unchanged, so this is the
    storage analogue of the conditional-GET plan
    (operators/recrawl.py revalidate_plan).

    Output: (url, ts, digest, record_type, refers_to) — refers_to is
    NULL for originals, else the original capture's URL.

    Scale shape: one combinable min-struct aggregate per digest
    (first capture by (ts, url) — totally ordered, deterministic),
    then one equi-join digest -> original back onto the captures.
    Both sides hash-partition on the digest, so it is one symmetric
    shuffle pattern, never a window sort over whole digest groups.
    """
    from pyspark.sql import functions as F

    caps = pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
    )
    first = caps.groupBy("digest").agg(
        F.min(F.struct("ts", "url")).alias("_first")
    ).select(
        "digest",
        F.col("_first.ts").alias("_fts"),
        F.col("_first.url").alias("_furl"),
    )
    joined = caps.join(first, "digest")
    is_orig = (F.col("ts") == F.col("_fts")) & (F.col("url") == F.col("_furl"))
    return joined.select(
        "url", "ts", "digest",
        F.when(is_orig, F.lit("response")).otherwise(F.lit("revisit"))
            .alias("record_type"),
        F.when(is_orig, F.lit(None).cast("string"))
            .otherwise(F.col("_furl")).alias("refers_to"),
    )

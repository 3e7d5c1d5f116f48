"""Multimodal media columns: opaque binary payloads + typed metadata,
processed by Arrow-batched mapInPandas.

The reference's analog is the file-download path
(/root/reference/js_lib.go:105-190): media URLs fetched (5-parallel)
and written to disk, deduped by destination. Here media rides AS DATA:
a crawl's media spans become (media_ref, bytes, meta) rows in a media
table, deduplicated by content hash, with decode/feature-extraction as
mapInPandas stages.

Image/audio codecs are NOT in this container, so ``decode`` is a
clearly-marked deterministic stub (NotImplementedError for real
codecs); the Spark-side plumbing — binary schema, dedup, batch
iteration, partitioning — is real and tested. On a cluster, swap
``_fake_decode`` for PIL/torchaudio inside the same mapInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("content", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_hash", LongType()),
        StructField("kind_guess", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def media_from_results(results: DataFrame, pages: DataFrame | None = None) -> DataFrame:
    """Collect deduplicated media references from crawl results' spans
    (dedup-by-ref mirrors the download skip-if-exists,
    js_lib.go:174-176) and synthesize binary payloads (deterministic
    fake bytes; a real transport would fetch them)."""
    refs = (
        results.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .dropDuplicates(["media_ref"])
    )
    # deterministic fake payload: repeat of the ref's md5 hex string,
    # repeat count from the PORTABLE hash (md5-derived) so the DuckDB
    # oracle reproduces payload bytes — and hence every downstream
    # feature — bit-for-bit
    from flyscrape_spark.functions.hashing import portable_hash64

    count = (F.pmod(portable_hash64(F.col("media_ref")), F.lit(8)) + 1).cast("int")
    payload = F.repeat(
        F.unbase64(F.base64(F.encode(F.md5("media_ref"), "utf-8"))), count
    )
    return refs.select("media_ref", payload.cast("binary").alias("content"))


def extract_features(media: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Feature extraction over binary media — the mapInPandas decode
    stage. Stubbed decode: real image/audio decoding raises
    NotImplementedError in this container; the fake path derives
    deterministic pseudo-dimensions so the pipeline shape is testable.
    """

    def _fake_decode(content: bytes) -> tuple[str, int, int]:
        if not content:
            return ("empty", 0, 0)
        # REAL DECODE GOES HERE on a cluster:
        #   raise NotImplementedError("image/audio codecs not available")
        # deterministic fake: derive dims from leading bytes
        width = 16 + content[0] % 64
        height = 16 + (content[1] if len(content) > 1 else 0) % 64
        kind = "image" if len(content) % 2 == 0 else "audio"
        return (kind, width, height)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                kind, width, height = _fake_decode(raw)
                h = int.from_bytes(hashlib.md5(raw).digest()[:7], "big")
                feats.append((ref, len(raw), h, kind, width, height))
            yield pd.DataFrame(
                feats,
                columns=[
                    "media_ref", "byte_len", "content_hash",
                    "kind_guess", "width", "height",
                ],
            )

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)

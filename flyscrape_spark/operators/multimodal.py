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


RESIZE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_dim: int = 24) -> DataFrame:
    """Aspect-preserving resize plumbing — the mapInPandas stage a real
    pipeline points at PIL's ``Image.thumbnail``. Stubbed codec: dims
    come from the same fake decode as :func:`extract_features`; the
    integer scale math (out = dim * max_dim // longest side, floor,
    min 1px) and the batch shape are the real contract. The "resized"
    payload is a deterministic truncation of the source bytes (real
    decode-resize-encode raises NotImplementedError in this
    container)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                if not raw:
                    rows.append((ref, 0, 0, 0, 0, b""))
                    continue
                # REAL DECODE+RESIZE GOES HERE on a cluster:
                #   raise NotImplementedError("image codecs unavailable")
                width = 16 + raw[0] % 64
                height = 16 + (raw[1] if len(raw) > 1 else 0) % 64
                longest = max(width, height)
                if longest <= max_dim:
                    ow, oh = width, height
                else:
                    ow = max(width * max_dim // longest, 1)
                    oh = max(height * max_dim // longest, 1)
                rows.append((ref, width, height, ow, oh, raw[: ow + oh]))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "width", "height",
                         "out_width", "out_height", "content"],
            )

    return media.mapInPandas(process, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (the fan-out shape a real pipeline points at pyav/ffmpeg keyframe
    extraction). Stubbed container: duration is derived from byte
    length (125 ms/byte), frame payloads are deterministic md5-hex
    bytes of ``ref:idx`` — so the whole fan-out is reproducible by a
    SQL oracle. The Spark contract is real: mapInPandas yielding
    multiple rows per input row, batch-bounded memory, no shuffle."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                # REAL DEMUX GOES HERE on a cluster (pyav container):
                #   raise NotImplementedError("video codecs unavailable")
                duration_ms = len(raw) * 125
                n = (duration_ms + every_ms - 1) // every_ms
                for idx in range(n):
                    sig = hashlib.md5(
                        f"{ref}:{idx}".encode()).hexdigest().encode()
                    rows.append((ref, idx, idx * every_ms, sig))
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "ts_ms", "frame"])

    return media.mapInPandas(process, schema=FRAME_SCHEMA)


def media_frontier(
    results: DataFrame,
    fetched: DataFrame | None = None,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """The media fetch list: every media ref demanded by the crawl's
    interleaved spans, minus refs already fetched — the media analog
    of the URL-seen anti-join (the reference's analog is the download
    skip-if-exists, js_lib.go:174-176, done per-file at fetch time;
    here it is one set operation planning the whole media generation).

    Output: (media_ref, n_refs, first_doc) — demand count (fetch-
    priority signal) and the deterministic first referencing doc.

    Scale shape: explode -> ONE map-side-combinable groupBy on the
    ref key; the fetched side anti-joins on that same key (bucketed
    media stores make it exchange-free, the seen_store pattern).
    """
    demand = (
        results.select(F.col(id_col).alias("doc"),
                       F.explode(spans_col).alias("s"))
        .filter(F.col("s.kind") == "media")
        .groupBy(F.col("s.media_ref").alias("media_ref"))
        .agg(F.count("*").alias("n_refs"), F.min("doc").alias("first_doc"))
    )
    if fetched is not None:
        demand = demand.join(
            fetched.select("media_ref"), "media_ref", "left_anti"
        )
    return demand


#: sentinel wrapping a media ref inside a rendered training sample
MEDIA_TOKEN_PREFIX = "<|media:"
MEDIA_TOKEN_SUFFIX = "|>"


def interleave_render(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    sep: str = " ",
) -> DataFrame:
    """Serialize each document's interleaved spans into ONE training
    sample string in span order: text and link spans contribute their
    text, media spans contribute the ``<|media:REF|>`` sentinel the
    multimodal tokenizer later swaps for encoder embeddings.

    Output: (doc_id, n_spans, n_media, sample).

    Scale shape: pure higher-order array expressions per row —
    transform to (offset, rendered) structs, array_sort (offsets are
    unique per doc, so the struct sort is deterministic), project +
    join. ZERO shuffles; fuses into whatever scan feeds it.
    """
    spans = F.col(spans_col)
    rendered = F.transform(
        spans,
        lambda s: F.struct(
            s["offset"].alias("o"),
            F.when(
                s["kind"] == "media",
                F.concat(F.lit(MEDIA_TOKEN_PREFIX), s["media_ref"],
                         F.lit(MEDIA_TOKEN_SUFFIX)),
            ).otherwise(s["text"]).alias("r"),
        ),
    )
    sample = F.array_join(
        F.transform(F.array_sort(rendered), lambda x: x["r"]), sep
    )
    n_media = F.size(F.filter(spans, lambda s: s["kind"] == "media"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(spans).alias("n_spans"),
        n_media.alias("n_media"),
        sample.alias("sample"),
    )

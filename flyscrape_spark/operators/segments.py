"""Sub-document (segment-level) deduplication: remove fixed-width
word windows that repeat across many documents — the CCNet /
RefinedWeb "line dedup" stage that strips boilerplate (navigation
chrome, cookie banners, footers) which document-level dedup cannot
touch because the surrounding page differs.

The reference has no corpus post-processing at all (flyscrape stops
at per-page extraction, /root/reference/scrape.go:210-268); this is
engine-added for the training-data mission, alongside the document
level suite in operators/dedup.py.

Segmentation is a deterministic non-overlapping window of ``width``
whitespace tokens (real pipelines split on newlines; the synthetic
corpus is single-line, and a fixed window is the same operator with
a different segmenter — the segmenter is an argument of the design,
not of the shuffle shape).

Scale shape (all linear, no self-join):
- explode segments: narrow, no shuffle;
- boilerplate detection: distinct-doc count per segment via a
  two-level groupBy ((seg, doc) then seg) — both map-side
  combinable, never count(DISTINCT) over a skewed key;
- flagging: segments ⋈ boilerplate keys on the segment hash — the
  boilerplate side is small by construction (freq ≥ min_docs), so
  AQE picks a broadcast join at runtime (not forced: a pathological
  corpus where everything repeats must not OOM the driver);
- reassembly: one groupBy(doc_id) sort-within-group concat.
At 10^10 docs: the only large shuffles are the seg-hash count and
the doc_id reassembly, both partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.functions.hashing import portable_hash64


def segment_table(
    documents: DataFrame, width: int = 3, text_col: str = "text"
) -> DataFrame:
    """Explode each document into (doc_id, seg_idx, seg_text,
    seg_key) rows of non-overlapping ``width``-token windows. The
    final window may be shorter (slice clamps)."""
    toks = F.split(F.col(text_col), " ")
    seg_ids = F.sequence(
        F.lit(0), F.ceil(F.size(toks) / F.lit(float(width))).cast("int") - 1
    )
    segs = F.transform(
        seg_ids,
        lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
    )
    return documents.select("doc_id", F.posexplode(segs).alias("seg_idx", "seg_text")).select(
        "doc_id", "seg_idx", "seg_text", portable_hash64("seg_text").alias("seg_key")
    )


def boilerplate_segments(
    segments: DataFrame, min_docs: int = 5
) -> DataFrame:
    """Segment keys that occur in ≥ ``min_docs`` distinct documents.

    Two-level aggregation instead of count(DISTINCT doc_id): the
    inner (seg_key, doc_id) groupBy combines map-side, so a segment
    occurring millions of times ships one row per (segment,
    partition), not one per occurrence.
    """
    return (
        segments.groupBy("seg_key", "doc_id")
        .agg(F.count("*").alias("_n"))
        .groupBy("seg_key")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def dedup_segments(
    documents: DataFrame,
    width: int = 3,
    min_docs: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Strip boilerplate segments from every document.

    Returns (doc_id, n_segs, n_removed, clean_text) with clean_text
    the surviving segments re-joined in original order (may be empty
    if the whole document was boilerplate).
    """
    segs = segment_table(documents, width=width, text_col=text_col)
    boiler = boilerplate_segments(segs, min_docs=min_docs).select("seg_key")
    flagged = segs.join(boiler.withColumn("_is_boiler", F.lit(1)),
                        "seg_key", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segs"),
            F.count("_is_boiler").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_is_boiler").isNull(),
                                   F.struct("seg_idx", "seg_text"))
                        )
                    ),
                    lambda s: s["seg_text"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def host_template_lines(
    pages: DataFrame,
    min_docs: int = 5,
    host_col: str = "host",
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Per-HOST boilerplate lines: lines that repeat across ≥
    ``min_docs`` documents of the SAME host — navigation, footers,
    cookie banners. The per-host scope is what separates template
    chrome from globally-common lines (:func:`boilerplate_segments`
    is corpus-global; a host's "© example.com 2024" footer never
    clears a global threshold but poisons every page of that host).

    Output: (host, line, n_docs) — the host's template-line table,
    the strip-list a boilerplate-removal pass broadcasts per host.

    Scale shape: explode lines, then the same two-level combinable
    aggregate as boilerplate_segments but keyed (host, line_hash,
    doc): the inner groupBy dedups within-doc repeats map-side, the
    outer counts distinct docs; both shuffles carry (host, line)
    composite keys so a hot host spreads over its distinct lines.
    """
    lines = pages.select(
        F.col(host_col).alias("host"),
        F.col(doc_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.transform(F.split(F.col(text_col), r"\n"),
                            lambda l: F.trim(l)),
                lambda l: l != "",
            )
        ).alias("line"),
    )
    return (
        lines.groupBy("host", "line", "doc_id")
        .agg(F.count("*").alias("_n"))
        .groupBy("host", "line")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_host_boilerplate(
    pages: DataFrame,
    min_docs: int = 5,
    host_col: str = "host",
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Apply :func:`host_template_lines` back to the corpus: remove
    each host's template lines (nav, footers, cookie banners) from
    its documents — the per-host boilerplate-removal pass
    (trafilatura-style chrome stripping, but corpus-statistical
    instead of per-page heuristic: a line IS chrome because the
    host repeats it, CCNet's insight applied at host scope).

    Output: (doc_id, host, n_lines, n_removed, clean_text) with
    clean_text the surviving lines re-joined in original order
    (may be empty when the whole page is template).

    Scale shape: one (host, line) equi-join of the exploded corpus
    against the template table (itself two combinable groupBys; both
    shuffle keys carry the line, so a hot host spreads over its
    distinct lines), then one combinable per-doc regroup.
    """
    templ = host_template_lines(
        pages, min_docs=min_docs, host_col=host_col,
        text_col=text_col, doc_col=doc_col,
    ).select("host", "line", F.lit(1).alias("_is_templ"))
    # posexplode_OUTER: a doc whose text is empty/whitespace-only has
    # no lines but must still appear in the output (n_lines = 0,
    # clean_text = '') — a plain explode would silently drop it from
    # the corpus, which a downstream join-on-doc_id text replacement
    # would never notice
    lines = pages.select(
        F.col(host_col).alias("host"),
        F.col(doc_col).alias("doc_id"),
        F.posexplode_outer(
            F.filter(
                F.transform(F.split(F.col(text_col), r"\n"),
                            lambda l: F.trim(l)),
                lambda l: l != "",
            )
        ).alias("line_idx", "line"),
    )
    flagged = lines.join(templ, ["host", "line"], "left")
    return flagged.groupBy("doc_id").agg(
        F.first("host").alias("host"),
        F.count("line").alias("n_lines"),
        F.count("_is_templ").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("line").isNotNull()
                               & F.col("_is_templ").isNull(),
                               F.struct("line_idx", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    ).select("doc_id", "host", "n_lines", "n_removed", "clean_text")

"""End-to-end training-data curation pipeline: the composition the
individual operators exist FOR — per-doc quality features → language
gate → exact dedup → near-dup cluster representative selection, each
document labeled kept / drop_reason.

This is the standard LLM-corpus curation funnel (Gopher/RefinedWeb-
style, public methodology): cheap per-row filters first so the
expensive dedup stages see only survivors, then duplicate removal
keeps one representative per duplicate class.

Scale shape (the whole point of the composition):
- Stage 1 (features + quality gate) is ONE projection — zero
  shuffles, embarrassingly parallel, and it PRUNES before anything
  that shuffles. At 100 TB this is where ~half the corpus dies for
  the cost of a scan.
- Stage 2 (exact dedup) shuffles the survivors once on a 64-bit
  content hash (map-side partial agg).
- Stage 3 (near-dup) reuses the banded SimHash pairing + alternating
  large-star/small-star connected components — linear shuffles, never
  O(n²).
- Final labeling is equi-joins on (content_hash, cluster_id, doc_id);
  the per-reason precedence is a row-local CASE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.functions.hashing import portable_hash64
from flyscrape_spark.operators import cluster as cluster_ops
from flyscrape_spark.operators import dedup
from flyscrape_spark.operators.dedup import normalized_text
from flyscrape_spark.operators.text import (
    dup_word_frac_expr, lang_pred_expr, token_count, word_ngrams_expr,
)


def curate(
    documents: DataFrame,
    min_tokens: int = 5,
    max_dup_word_frac: float = 0.6,
    keep_lang: str = "en",
    simhash_bits: int = 64,
    simhash_bands: int = 4,
    max_distance: int = 3,
) -> DataFrame:
    """Label every document with its curation outcome.

    Returns (doc_id, lang_pred, n_tokens, cluster_id, kept,
    drop_reason) where drop_reason ∈ {quality, exact_duplicate,
    near_duplicate, NULL=kept}:

    - ``quality``: fails the per-row gate (too short, too repetitive,
      or not ``keep_lang``).
    - ``exact_duplicate``: same normalized content as a lower-doc_id
      quality survivor.
    - ``near_duplicate``: in the same SimHash component as a lower
      doc_id exact-surviving document.

    Near-dup defaults are the standard web-dedup setting (64-bit
    SimHash, hamming <= 3 — Manku et al. 2007, public): at 16 bits the
    banded join is cheap but chains a similar corpus into one giant
    component; 64 bits keeps components tight.
    """
    toks = F.split(normalized_text(), " ")
    feats = documents.select(
        "doc_id",
        token_count().alias("n_tokens"),
        dup_word_frac_expr(toks).alias("dup_word_frac"),
        lang_pred_expr(toks).alias("lang_pred"),
        portable_hash64(normalized_text()).alias("content_hash"),
    ).withColumn(
        "quality_ok",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("lang_pred") == keep_lang),
    )

    exact_rep = (
        feats.filter("quality_ok")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("exact_rep"))
    )

    pairs = dedup.simhash_near_dup(
        documents, bits=simhash_bits, bands=simhash_bands,
        max_distance=max_distance,
    )
    clusters = cluster_ops.dedup_clusters(documents, pairs).select(
        "doc_id", "cluster_id"
    )

    survivors = (
        feats.filter("quality_ok")
        .join(exact_rep, "content_hash")
        .filter(F.col("doc_id") == F.col("exact_rep"))
        .join(clusters, "doc_id")
    )
    near_rep = survivors.groupBy("cluster_id").agg(
        F.min("doc_id").alias("cluster_rep")
    )

    drop_reason = (
        F.when(~F.col("quality_ok"), F.lit("quality"))
        .when(F.col("doc_id") != F.col("exact_rep"), F.lit("exact_duplicate"))
        .when(F.col("doc_id") != F.col("cluster_rep"), F.lit("near_duplicate"))
    )
    return (
        feats.join(clusters, "doc_id")
        .join(exact_rep, "content_hash", "left")
        .join(near_rep, "cluster_id", "left")
        .withColumn("drop_reason", drop_reason)
        .select(
            "doc_id", "lang_pred", "n_tokens", "cluster_id",
            F.col("drop_reason").isNull().alias("kept"), "drop_reason",
        )
    )


def flag_contaminated(
    documents: DataFrame, benchmark: DataFrame, n: int = 13
) -> DataFrame:
    """Benchmark decontamination by word-n-gram overlap (the GPT-3
    appendix-C / PaLM-style procedure, public methodology): flag every
    corpus document sharing at least one n-gram with the benchmark
    set. n=13 is the published standard; lower n = stricter.

    Scale shape: the benchmark side is TINY relative to the corpus
    (eval sets are thousands of docs vs 10^10), so its distinct
    n-gram set broadcasts and the corpus side never shuffles raw
    grams — one explode, one broadcast semi-join-shaped inner join,
    one groupBy on doc_id for hit counts. The corpus n-gram explode
    is the only data-volume term, and it's embarrassingly parallel.

    Returns (doc_id, n_hits, contaminated) for EVERY corpus doc.
    """
    grams = word_ngrams_expr(n)
    doc_grams = documents.select(
        "doc_id", F.explode(grams).alias("ngram")
    ).dropDuplicates(["doc_id", "ngram"])
    bench_grams = (
        benchmark.select(F.explode(grams).alias("ngram")).distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def refinedweb_funnel(
    documents: DataFrame,
    *,
    # C4 line stage
    line_words: int = 0,
    min_line_words: int = 5,
    c4_blocklist: tuple[str, ...] | None = None,
    require_terminal_punct: bool = True,
    min_kept_lines: int = 3,
    # Gopher gate
    min_words: int = 50,
    stopwords: tuple[str, ...] | None = None,
    min_stop_hits: int = 2,
    # MinHash near-dup
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """(doc_id, keep, drop_stage): the RefinedWeb/FineWeb-style
    curation recipe as ONE composed pipeline — Gopher document gate →
    C4 line cleaning → exact dedup of the cleaned text → MinHash-LSH
    near-dup junior drop. drop_stage names the FIRST stage that
    killed the document ('gopher_<rule>', 'c4_lines', 'exact_dup',
    'near_dup'; null = kept), which is the loss-attribution table a
    curation review reads.

    Composition shape (why this is not just four operator calls):
    - every per-row rule — all five Gopher metrics AND the C4 line
      transform — evaluates in a SINGLE projection via the rules.py
      column builders, so the gate costs one scan and prunes before
      anything shuffles (joining the two operators' outputs back
      together on doc_id would shuffle the corpus twice for no
      reason);
    - exact dedup shuffles only gate survivors, on a 64-bit hash of
      the CLEANED text (C4 line removal changes what counts as a
      duplicate — dedup must run downstream of it);
    - the LSH stage sees only exact-dedup seniors: banded candidates,
      exact-Jaccard verify on candidates only, and the junior of each
      verified pair (higher doc_id) drops. Pairwise junior-drop is
      the RefinedWeb behavior; transitive-closure retention is
      curate() with connected components.
    """
    from flyscrape_spark.operators.rules import (
        C4_BLOCKLIST, GOPHER_STOPWORDS, c4_line_cols, gopher_metric_cols,
        gopher_reason,
    )

    m = gopher_metric_cols(stopwords or GOPHER_STOPWORDS)
    g_reason = gopher_reason(
        m, min_words=min_words, min_stop_hits=min_stop_hits
    )
    _, kept_lines = c4_line_cols(
        line_words, min_line_words, c4_blocklist or C4_BLOCKLIST,
        require_terminal_punct,
    )
    perrow = documents.select(
        "doc_id",
        g_reason.alias("gopher_reason"),
        (F.size(kept_lines) >= min_kept_lines).alias("c4_ok"),
        F.array_join(kept_lines, " ").alias("clean_text"),
    )

    survivors = perrow.filter(
        F.col("gopher_reason").isNull() & F.col("c4_ok")
    ).select("doc_id", "clean_text")

    hashed = survivors.select(
        "doc_id", portable_hash64(normalized_text("clean_text")).alias("content_hash")
    )
    exact_rep = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("exact_rep")
    )
    ex = hashed.join(exact_rep, "content_hash").select("doc_id", "exact_rep")

    seniors = (
        survivors.join(ex, "doc_id")
        .filter(F.col("doc_id") == F.col("exact_rep"))
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    pairs = dedup.lsh_near_dup(
        seniors, num_hashes=num_hashes, bands=bands, n=n, threshold=threshold
    )
    near_dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()

    stage = (
        F.when(
            F.col("gopher_reason").isNotNull(),
            F.concat(F.lit("gopher_"), F.col("gopher_reason")),
        )
        .when(~F.col("c4_ok"), F.lit("c4_lines"))
        .when(
            F.col("exact_rep").isNotNull()
            & (F.col("doc_id") != F.col("exact_rep")),
            F.lit("exact_dup"),
        )
        .when(F.col("is_near_dup"), F.lit("near_dup"))
    )
    return (
        perrow.join(ex, "doc_id", "left")
        .join(
            near_dropped.withColumn("is_near_dup", F.lit(True)),
            "doc_id",
            "left",
        )
        .withColumn("is_near_dup", F.coalesce("is_near_dup", F.lit(False)))
        .withColumn("drop_stage", stage)
        .select(
            "doc_id",
            F.col("drop_stage").isNull().alias("keep"),
            "drop_stage",
        )
    )


#: FineWeb-convention default: no single domain contributes more
#: than this many documents to a training shard
DOMAIN_CAP = 30


def domain_cap(
    documents: DataFrame,
    domain_col: str = "domain",
    cap: int = DOMAIN_CAP,
    order_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap: keep at most ``cap`` documents per
    registrable domain, preferring higher ``order_col`` (quality /
    length signal) with ``id_col`` as the deterministic tie-break —
    the anti-concentration step web-corpus recipes apply so one
    mega-site cannot dominate a shard.

    NULL-domain rows (registrable_domain() yields NULL for unknown
    TLDs) are EXEMPT from the cap: each forms its own singleton
    window partition (keyed by ``id_col``), so the corpus-scale slice
    of unknown-TLD hosts is never collectively squashed to ``cap``
    documents total. Their rank is always 1.

    Scale shape: rank() is a row_number()-<= k predicate, which Spark
    compiles to WindowGroupLimit — a per-key k-row HEAP on both the
    map and reduce side, so a domain with 10^8 docs costs its
    partitions k rows of state each, never a full per-domain sort
    materialization. One exchange on the domain key; skew is bounded
    by the cap itself (every key emits <= k rows downstream).
    """
    from pyspark.sql import Window

    key = F.coalesce(
        F.col(domain_col).cast("string"),
        F.concat(F.lit("\x00null:"), F.col(id_col).cast("string")),
    )
    w = Window.partitionBy(key).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        documents.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
    )

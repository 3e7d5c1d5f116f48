"""Text analysis operators: token counting, quality scoring, language
ID, document fingerprinting. All built-in pyspark.sql.functions (fully
codegen'd, no Python), each with an exact DuckDB-SQL twin for the
driver's oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.functions.hashing import portable_hash64
from flyscrape_spark.operators.dedup import normalized_text

# tiny deterministic stopword/marker sets (shared with the SQL oracles)
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "das"],
    "fr": ["le", "la", "et"],
}


def token_count(col="text"):
    """Whitespace token count (0 for empty)."""
    t = F.trim(F.col(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("bigint")


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
# marks — the GPT-2-style regex split shape (public pattern family),
# without unicode categories this sandbox's regex engines both lack.
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(documents: DataFrame) -> DataFrame:
    """Token counting two ways per doc: whitespace words and BPE-ish
    pre-tokens (regexp_extract_all, fully JVM-side). The standard
    training-data budget statistic."""
    bpeish = F.regexp_extract_all(F.col("text"), F.lit(BPEISH_PATTERN), 0)
    return documents.select(
        "doc_id",
        token_count().alias("n_words"),
        F.size(bpeish).cast("bigint").alias("n_bpeish_tokens"),
    )


def text_quality(documents: DataFrame) -> DataFrame:
    """Per-doc quality features: token count, mean token length,
    punctuation ratio, stopword ratio (rounded for cross-engine
    float equality)."""
    toks = F.split(normalized_text(), " ")
    n_tok = F.size(toks).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN))).cast("double")
    n_chars = F.length(F.col("text")).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(F.col("text"), r"[^\w\s]", ""))
    ).cast("double")
    return documents.select(
        "doc_id",
        token_count().alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1.0)), 4).alias("mean_token_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1.0)), 4).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1.0)), 4).alias("stopword_ratio"),
    )


def repetition_scores(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021,
    public): duplicate-word fraction and most-frequent-bigram
    fraction. All higher-order array functions — per-row JVM work,
    ZERO shuffles, so the operator is embarrassingly parallel at any
    scale (the Gopher filters run over trillions of tokens; anything
    with a shuffle here would be the pipeline bottleneck).

    top_bigram_frac is O(distinct²) per row via filter-count — fine at
    document length (10²-10⁴ words), and it stays inside the JVM
    instead of paying an explode + two shuffles per metric."""
    toks = F.split(normalized_text(), " ")
    dup_word_frac = dup_word_frac_expr(toks)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
    )
    top_freq = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda g: F.size(F.filter(bigrams, lambda x: x == g)),
        )
    ).cast("double")
    top_bigram_frac = F.when(F.size(toks) < 2, F.lit(0.0)).otherwise(
        F.round(top_freq / F.size(bigrams).cast("double"), 6)
    )
    return documents.select(
        "doc_id",
        dup_word_frac.alias("dup_word_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
    )


def dup_word_frac_expr(toks):
    """Gopher duplicate-word fraction as a reusable expression."""
    n_tok = F.size(toks).cast("double")
    return F.round(
        (n_tok - F.size(F.array_distinct(toks)).cast("double"))
        / F.greatest(n_tok, F.lit(1.0)),
        6,
    )


def lang_pred_expr(toks):
    """Marker-argmax language prediction as a reusable expression
    (fixed alphabetical tie order, 'unknown' on zero hits)."""

    def _hits(markers):
        m = list(markers)  # bind by closure; a 2-arg lambda would make
        # F.filter pass the element index as the second parameter
        return F.size(F.filter(toks, lambda t: t.isin(m)))

    scores = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    pred = F.lit("unknown")
    best = F.lit(0)
    for lang in sorted(scores):  # alphabetical tie-break
        s = scores[lang]
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.when(s > best, s).otherwise(best)
    return pred


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language heuristic: count hits per language's marker
    set; argmax with fixed tie order (de > en > es > fr alphabetical).
    Deterministic and SQL-twinnable."""
    toks = F.split(normalized_text(), " ")
    return documents.select(
        "doc_id", F.col("lang").alias("lang_true"),
        lang_pred_expr(toks).alias("lang_pred"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Stable 64-bit content fingerprint of the normalized text."""
    return documents.select(
        "doc_id", portable_hash64(normalized_text()).alias("fingerprint")
    )


def tfidf_top_terms(
    documents: DataFrame, k: int = 5, broadcast_idf: bool = True
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic keyword-extraction
    / topical-signature operator a corpus pipeline uses for cluster
    labeling and domain mixing. Smoothed idf = ln((N+1)/(df+1)).

    Scale shape: explode → groupBy (doc_id, term) [shuffle 1,
    map-side combinable] → groupBy term for df [shuffle 2, small
    output = vocabulary] → idf joined back (broadcast while the
    vocabulary fits — ~10^7 terms; pass broadcast_idf=False past that
    and it's a plain shuffle join on term) → per-doc top-k window
    [shuffle 3 on doc_id]. Never materializes the full doc×term
    matrix; ordering ties broken on the ROUNDED score then term so
    the result is engine-independent.
    """
    from pyspark.sql import Window

    toks = F.filter(F.split(normalized_text(), " "), lambda t: t != "")
    terms = documents.select("doc_id", F.explode(toks).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = documents.agg(F.count("*").alias("n_docs"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))).alias("idf"),
    )
    if broadcast_idf:
        idf = F.broadcast(idf)
    scored = tf.join(idf, "term").withColumn(
        "score", F.round(F.col("tf") * F.col("idf"), 6)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", F.col("rank").cast("int").alias("rank"), "score")
    )


def word_ngrams_expr(n: int, col: str = "text"):
    """Array of word n-grams of the normalized text (empty when the
    doc has fewer than n words) — per-row JVM array ops, no shuffle."""
    toks = F.filter(F.split(normalized_text(col), " "), lambda t: t != "")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
            lambda i: F.concat_ws(
                " ", *[F.get(toks, i + F.lit(j)) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_ngrams(documents: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-level top-k word n-grams by occurrence count — the
    n-gram LM / contamination-screen statistic (e.g. checking a
    benchmark's 13-grams against the training corpus).

    Scale shape: per-row gram construction (JVM array ops, no
    shuffle) → explode → ONE map-side-combinable groupBy count →
    global top-k via orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows, never a full sort shuffle). Ties at the k boundary are
    broken by ngram text, so the selected set is deterministic.
    """
    return (
        documents.select(F.explode(word_ngrams_expr(n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
    )


def chunk_documents(
    documents: DataFrame, size: int = 128, overlap: int = 32
) -> DataFrame:
    """Split every document into overlapping fixed-size token windows
    — the chunking stage ahead of embedding/retrieval indexing (each
    chunk becomes one embedding row; ``overlap`` preserves context
    across boundaries). Returns (doc_id, chunk_idx, n_chunk_tokens,
    chunk_text); empty documents yield no chunks.

    Pure higher-order array expressions + one posexplode: per-row JVM
    work with partition-local fan-out — zero shuffles, zero Python,
    embarrassingly parallel at any corpus size. Chunk starts step by
    ``size - overlap``; the final window may be shorter (slice
    clamps), and a start is only emitted while it lands inside the
    document, so no chunk is ever fully contained in its predecessor.
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    step = size - overlap
    toks = F.split(normalized_text(), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.least(F.lit(size), n - s).alias("n_chunk_tokens"),
            F.array_join(F.slice(toks, s + 1, size), " ").alias("chunk_text"),
        ),
    )
    return (
        documents.filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            "chunk_idx",
            F.col("c.n_chunk_tokens").cast("int").alias("n_chunk_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )

def vocab_build(
    documents: DataFrame, min_df: int = 2, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary for tokenizer/embedding-table construction:
    (token, tf, df, vocab_id) where tf = total occurrences, df =
    documents containing the token, and vocab_id is the dense
    frequency rank (ties broken by token text, so ids are
    deterministic across engines and runs).

    Scale shape: explode -> ONE two-level groupBy ((doc_id, token)
    with count, then token) — both map-side combinable, never
    count(DISTINCT doc_id) over a skewed token key. The min_df
    filter drops the hapax long tail BEFORE ranking, so the ranked
    set is a real vocabulary (bounded: ~10^5..10^6 rows at any
    corpus size — vocabularies grow ~ Heaps' law, not linearly), and
    the global rank window over it is a deliberate small-data sort,
    not a corpus-sized one.
    """
    from pyspark.sql import Window

    toks = F.filter(F.split(normalized_text(text_col), " "), lambda t: t != "")
    per_doc = (
        documents.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("n"))
    )
    counts = per_doc.groupBy("token").agg(
        F.sum("n").alias("tf"), F.count("*").alias("df")
    ).filter(F.col("df") >= min_df)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return counts.select(
        "token", "tf", "df",
        F.row_number().over(w).cast("bigint").alias("vocab_id"),
    )

"""Language-model quality scoring: score every document by the mean
log-probability of its word bigrams under an add-one-smoothed bigram
model estimated from the corpus itself — the CCNet-style "perplexity
filter" (Wenzek et al. 2020) reduced to an n-gram model that both
Spark and the DuckDB oracle can evaluate exactly.

Pipeline shape (all linear, no all-pairs):
  1. unigram/bigram count tables: explode → groupBy — both map-side
     combinable partial aggs.
  2. vocabulary size V: a single-row scalar broadcast (same
     documented shape as the tfidf corpus count).
  3. per-doc scoring: explode doc bigrams once, LEFT join the bigram
     count table on the bigram key and the unigram table on the left
     word, logprob = ln((c(w1 w2) + 1) / (c(w1) + V)), mean per doc.

At 100 TB the model tables are the shuffle cost: both joins are plain
equi-joins keyed on a hash-distributable string, and in production
the model is *pretrained* on a reference corpus, pruned, and
broadcast — this operator accepts any (w1, w2, cnt)/(w, cnt) pair of
model DataFrames for exactly that; estimating from the input corpus
is the self-contained default the driver query uses.

Floats: log evaluated per-bigram, mean rounded to 6dp (the repo's
verified cross-engine tolerance for ln-based scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.operators.dedup import normalized_text

#: docs whose mean bigram logprob (6dp) is below this are dropped
LM_KEEP_THRESHOLD = -9.0


def _doc_bigrams(documents: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — every consecutive word pair, order kept,
    duplicates kept (scoring weights repeated bigrams naturally)."""
    words = F.split(normalized_text(text_col), " ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - 2, F.lit(0))),
        lambda i: F.struct(
            F.element_at(words, (i + 1).cast("int")).alias("w1"),
            F.element_at(words, (i + 2).cast("int")).alias("w2"),
        ),
    )
    return (
        documents.filter(F.size(words) >= 2)
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .filter(F.col("w2").isNotNull())
    )


def bigram_model(documents: DataFrame, text_col: str = "text"):
    """Estimate (unigrams, bigrams, vocab_size_df) from the corpus.

    Unigram counts are *history* counts: occurrences of w as the
    first element of a bigram, so that Σ_w2 c(w1,w2) = c(w1) and the
    smoothed conditionals normalize exactly.
    """
    bg = _doc_bigrams(documents, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_bigram"))
    unigrams = bg.groupBy("w1").agg(F.count("*").alias("c_unigram"))
    vocab = bg.select("w1").union(bg.select("w2")).agg(
        F.countDistinct("w1").alias("vocab_size")
    )
    return unigrams, bigrams, vocab


def lm_scores(
    documents: DataFrame,
    text_col: str = "text",
    keep_threshold: float = LM_KEEP_THRESHOLD,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob, keep_lm) for every document.

    avg_logprob = mean over the doc's bigrams of
    ln((c(w1,w2) + 1) / (c(w1) + V)) — add-one smoothing, so unseen
    bigrams (w.r.t. the model) score ln(1 / (c(w1) + V)) and unseen
    histories ln(1 / V). Docs with fewer than 2 words get
    n_bigrams = 0, NULL score, keep_lm = false.
    """
    if model is not None:
        # pretrained path — the production shape at 100 TB: a pruned
        # reference-corpus model is orders of magnitude smaller than
        # the corpus being scored, so BROADCAST both tables and the
        # scoring path shuffles no gram keys at all (the only exchange
        # left is the per-doc partial-agg groupBy below). Estimating
        # from the input corpus (model=None) keeps plain equi-joins:
        # there the model is corpus-sized and must shuffle.
        unigrams, bigrams, vocab = model
        unigrams, bigrams = F.broadcast(unigrams), F.broadcast(bigrams)
    else:
        unigrams, bigrams, vocab = bigram_model(documents, text_col)
    bg = _doc_bigrams(documents, text_col)
    scored = (
        bg.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.coalesce("c_bigram", F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce("c_unigram", F.lit(0)).cast("double")
                   + F.col("vocab_size").cast("double"))
            ).alias("logprob"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("logprob"), 6).alias("avg_logprob"),
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
            F.coalesce(
                F.col("avg_logprob") >= F.lit(keep_threshold), F.lit(False)
            ).alias("keep_lm"),
        )
    )


#: bucket names in CCNet order: head = best (highest logprob = lowest
#: perplexity), tail = worst.
CCNET_BUCKETS = ("head", "middle", "tail")


def ccnet_buckets(
    documents: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    thresholds: DataFrame | None = None,
) -> DataFrame:
    """CCNet head/middle/tail quality buckets (Wenzek et al. 2020 §4.4):
    per-language perplexity terciles over the LM score.

    Two paths, matching the paper's production/estimation split:

    - ``thresholds`` given — (lang, t_head, t_middle) precomputed from
      a held-out sample: BROADCAST join + two comparisons, zero extra
      shuffles on the corpus side. This is the 100 TB path (CCNet ships
      static per-language cutoffs for exactly this reason).
    - ``thresholds=None`` — exact in-corpus terciles via ``ntile(3)``
      over (avg_logprob DESC, doc_id ASC) per language. ntile is
      integer bucketing with a deterministic tie-break, so it is
      cross-engine exact (no interpolated-quantile float drift); the
      cost is one window sort per language partition, which is the
      honest exact semantics at test scale but skew-bound at corpus
      scale — production estimates thresholds on a sample and takes
      the broadcast path.

    Docs too short to score (n_bigrams = 0, NULL avg_logprob) land in
    ``tail`` by definition and are excluded from the tercile split.
    Output: (doc_id, lang, n_bigrams, avg_logprob, bucket).
    """
    from pyspark.sql import Window

    scores = lm_scores(documents, text_col=text_col, model=model)
    scored = documents.select("doc_id", F.col(lang_col).alias("lang")).join(
        scores, "doc_id"
    )
    if thresholds is not None:
        t = F.broadcast(thresholds)
        return scored.join(t, "lang", "left").select(
            "doc_id", "lang", "n_bigrams", "avg_logprob",
            F.when(F.col("avg_logprob").isNull(), F.lit("tail"))
            .when(F.col("avg_logprob") >= F.col("t_head"), F.lit("head"))
            .when(F.col("avg_logprob") >= F.col("t_middle"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col("doc_id").asc()
    )
    with_tile = scored.filter(F.col("n_bigrams") > 0).withColumn(
        "tile", F.ntile(3).over(w)
    )
    bucketed = with_tile.select(
        "doc_id", "lang", "n_bigrams", "avg_logprob",
        F.element_at(
            F.array(*[F.lit(b) for b in CCNET_BUCKETS]), F.col("tile")
        ).alias("bucket"),
    )
    unscored = scored.filter(F.col("n_bigrams") == 0).select(
        "doc_id", "lang", "n_bigrams", "avg_logprob",
        F.lit("tail").alias("bucket"),
    )
    return bucketed.unionByName(unscored)

"""Heuristic rule-based corpus cleaning: the C4 line-level rules
(Raffel et al. 2020, §2.2) and the Gopher document-quality gate
(Rae et al. 2021, appendix A1.1) re-expressed as Spark plans.

The reference has no cleaning stage (flyscrape extracts, it does not
curate); engine-added for the training-data mission alongside the
score-producing heuristics in operators/text.py — these two operators
are the *decision* stage: every row comes back with keep/drop and the
first failing rule, the shape a curation funnel audits.

Scale shapes (both operators):
- pure per-row higher-order array expressions — ZERO shuffles, zero
  Python; they fuse into whatever scan precedes them and compose with
  the curate.py funnel's gate stage. The column builders
  (``c4_line_cols``, ``gopher_metric_cols``, ``gopher_reason``) are
  exported separately so a composed pipeline (curate.refinedweb_funnel)
  can evaluate EVERY per-row rule in one projection instead of
  joining operator outputs back together on doc_id;
- the C4 cleaner works line-at-a-time *within* the document column
  (transform/filter over a split array), so a 100 MB outlier document
  costs one task, never a shuffle;
- rule constants (blocklists, stop words) compile into the plan as
  literals — nothing is broadcast, nothing is joined.

Faithfulness notes vs the published rules:
- C4 removes lines that (a) do not end in terminal punctuation,
  (b) have fewer than 5 words, (c) contain a policy/boilerplate
  token ("javascript", "cookie", "lorem", "ipsum", "{"), and drops
  documents with fewer than 3 surviving lines. All four are
  implemented; the synthetic corpus has neither newlines nor
  punctuation, so the driver query derives deterministic pseudo-lines
  (fixed-width token windows, the segments.py convention) and
  disables the punctuation rule — the operator itself defaults to
  the published behavior.
- Gopher gates on word count, mean word length, symbol-to-word
  ratio, alphabetic-word fraction, and stop-word presence. The
  line-shape rules (bullet-start / ellipsis-end fractions) need real
  line boundaries and are folded into the C4 cleaner's line stage
  instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flyscrape_spark.operators.dedup import normalized_text

#: C4's line-level boilerplate markers (Raffel et al. 2020 §2.2),
#: token-matched after normalization.
C4_BLOCKLIST = ("javascript", "cookie", "cookies", "lorem", "ipsum", "{", "}")

#: Gopher's "must contain at least 2 of these" stop words
#: (Rae et al. 2021 A1.1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_TERMINAL_PUNCT = r'[.!?"”]$'


def _words(text_col: str) -> Column:
    return F.filter(F.split(normalized_text(text_col), " "), lambda t: t != "")


# ------------------------------------------------------ C4 line rules


def c4_line_cols(
    line_words: int = 0,
    min_line_words: int = 5,
    blocklist: tuple[str, ...] = C4_BLOCKLIST,
    require_terminal_punct: bool = True,
    text_col: str = "text",
) -> tuple[Column, Column]:
    """(lines, kept_lines) column pair implementing the C4 line rules
    as pure expressions — composable into any per-row projection.

    ``line_words == 0`` splits on real newlines (the published rule);
    a positive value derives pseudo-lines as non-overlapping
    ``line_words``-token windows for corpora whose line structure was
    lost upstream (the segments.py convention).
    """
    if line_words > 0:
        w = _words(text_col)
        lines = F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.size(w) + F.lit(line_words - 1)) / F.lit(line_words) - 1,
                    F.lit(0),
                ).cast("int"),
            ),
            lambda i: F.array_join(
                F.slice(w, i * line_words + 1, line_words), " "
            ),
        )
    else:
        lines = F.filter(
            F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        )

    block = F.array([F.lit(b) for b in blocklist])

    def line_ok(line: Column) -> Column:
        toks = F.filter(F.split(F.lower(line), " "), lambda t: t != "")
        ok = (F.size(toks) >= min_line_words) & (
            F.size(F.array_intersect(toks, block)) == 0
        )
        if require_terminal_punct:
            ok = ok & line.rlike(_TERMINAL_PUNCT)
        return ok

    return lines, F.filter(lines, line_ok)


def c4_line_filter(
    documents: DataFrame,
    line_words: int = 0,
    min_line_words: int = 5,
    blocklist: tuple[str, ...] = C4_BLOCKLIST,
    require_terminal_punct: bool = True,
    min_kept_lines: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_lines, n_kept_lines, keep, clean_text): C4-style
    line-level cleaning.

    A line survives iff it has ``>= min_line_words`` words, contains
    no blocklist token, and (when ``require_terminal_punct``) ends in
    terminal punctuation. A document is kept iff ``>= min_kept_lines``
    lines survive; ``clean_text`` is the surviving lines re-joined.
    """
    lines, kept = c4_line_cols(
        line_words, min_line_words, blocklist, require_terminal_punct, text_col
    )
    return documents.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        (F.size(kept) >= min_kept_lines).alias("keep"),
        F.array_join(kept, " ").alias("clean_text"),
    )


# -------------------------------------------------------- Gopher gate


def gopher_metric_cols(
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS, text_col: str = "text"
) -> dict[str, Column]:
    """The Gopher gate's five per-document metrics as expressions
    (rounded exactly as the gate compares them)."""
    w = _words(text_col)
    n = F.size(w)
    mean_len = F.round(
        F.aggregate(w, F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.length(t)).cast("double")
        / F.greatest(n, F.lit(1)).cast("double"),
        4,
    )
    alpha_frac = F.round(
        F.size(F.filter(w, lambda t: t.rlike("[a-z]"))).cast("double")
        / F.greatest(n, F.lit(1)).cast("double"),
        4,
    )
    symbol_ratio = F.round(
        (
            F.regexp_count(F.col(text_col), F.lit(r"#"))
            + F.regexp_count(F.col(text_col), F.lit(r"\.\.\."))
        ).cast("double")
        / F.greatest(n, F.lit(1)).cast("double"),
        4,
    )
    stop = F.array([F.lit(s) for s in stopwords])
    stop_hits = F.size(F.array_intersect(F.array_distinct(w), stop))
    return {
        "n_words": n,
        "mean_word_len": mean_len,
        "alpha_frac": alpha_frac,
        "symbol_ratio": symbol_ratio,
        "stop_hits": stop_hits,
    }


def gopher_reason(
    m: dict[str, Column],
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 2,
) -> Column:
    """First failing rule (published evaluation order) over a metric
    column dict — null when the document passes."""
    return (
        F.when(m["n_words"] < min_words, "too_few_words")
        .when(m["n_words"] > max_words, "too_many_words")
        .when(
            (m["mean_word_len"] < min_mean_word_len)
            | (m["mean_word_len"] > max_mean_word_len),
            "word_length",
        )
        .when(m["symbol_ratio"] > max_symbol_ratio, "symbol_ratio")
        .when(m["alpha_frac"] < min_alpha_frac, "non_alpha")
        .when(m["stop_hits"] < min_stop_hits, "stopwords")
    )


def gopher_quality_gate(
    documents: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
    stop_hits, keep, fail_reason): the Gopher document gate.

    ``fail_reason`` names the FIRST failing rule in the published
    evaluation order (word count, word length, symbol ratio,
    alphabetic fraction, stop words) so a funnel audit can attribute
    losses per rule; null when the document passes.
    """
    m = gopher_metric_cols(stopwords, text_col)
    d = documents.select(
        "doc_id", *[v.alias(k) for k, v in m.items()]
    )
    reason = gopher_reason(
        {k: F.col(k) for k in m},
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        min_alpha_frac, max_symbol_ratio, min_stop_hits,
    )
    return d.select(
        "*",
        reason.isNull().alias("keep"),
        reason.alias("fail_reason"),
    )

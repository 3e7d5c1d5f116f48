"""Byte-pair-encoding tokenizer training over a document corpus —
the LLM-pipeline step that turns a curated corpus into a tokenizer.

Two stages, split exactly where web scale demands:

- :func:`bpe_pair_counts` — the distributed inner loop: adjacent
  symbol-pair frequencies over the corpus, weighted by word frequency.
  Scale shape: ONE corpus-wide groupBy(word) first (map-side
  combinable; output is the vocabulary, bounded ~10^5..10^6 rows by
  Heaps' law at any corpus size), THEN the per-character explode runs
  over the tiny vocabulary — the 100 TB of text is touched once, by
  the combinable word count, never by the char fan-out.

- :func:`bpe_train` — the merge loop (Sennrich et al. 2016,
  "Neural Machine Translation of Rare Words with Subword Units").
  Merges mutate symbol sequences, so each of the ~32k steps depends
  on the last; every production trainer (SentencePiece, HF
  tokenizers) runs this loop on one node over the word-frequency
  table. We do the same: the corpus-scale work (word counting) is
  distributed, the merge loop runs driver-side over the collected
  vocabulary — a bounded, documented collect (the vocab, NOT the
  corpus), pytest-pinned against a from-scratch reference BPE.

The reference engine has no tokenizer stage (flyscrape stops at
extraction); this is part of the training-data pipeline layer built
on top of the crawl (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.operators.dedup import normalized_text

#: end-of-word marker (Sennrich 2016 §3.2) — lets BPE learn suffixes
EOW = "</w>"


def word_freqs(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized corpus — the only stage that
    reads the full 100 TB; map-side combinable groupBy."""
    toks = F.filter(
        F.split(normalized_text(text_col), " "), lambda t: t != ""
    )
    return (
        documents.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_pair_counts(
    documents: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Adjacent character-pair frequencies over the corpus — BPE
    training's step-0 statistics (what the first merge argmaxes over).

    Columns: (left_sym, right_sym, pair_count, merge_rank), the last
    word-final symbol pairing with the ``</w>`` marker, merge_rank =
    frequency rank with (left, right) tie-break so ranks are
    deterministic across engines. The rank window runs over the
    filtered pair table (<= |charset|^2 + |charset| rows — trivially
    small), not the corpus.
    """
    words = word_freqs(documents, text_col)
    pairs = words.select(
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
        F.col("word"),
    ).select(
        F.expr("substring(word, i, 1)").alias("left_sym"),
        F.when(
            F.col("i") < F.length("word"),
            F.expr("substring(word, i + 1, 1)"),
        ).otherwise(F.lit(EOW)).alias("right_sym"),
        "freq",
    )
    counts = (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    from pyspark.sql import Window

    w = Window.orderBy(
        F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym")
    )
    return counts.select(
        "left_sym",
        "right_sym",
        F.col("pair_count").cast("bigint").alias("pair_count"),
        F.row_number().over(w).cast("bigint").alias("merge_rank"),
    )


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """One merge applied to one symbol sequence, leftmost-greedy
    non-overlapping (Sennrich's re.sub semantics on symbol runs)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if (
            i + 1 < len(syms)
            and syms[i] == pair[0]
            and syms[i + 1] == pair[1]
        ):
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    documents: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_vocab_rows: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges. Distributed word counting,
    driver-side merge loop over the collected (word, freq) vocabulary
    — the standard trainer split (see module docstring). Ties argmax
    deterministically by (count desc, left, right).

    ``max_vocab_rows`` guards the collect: a vocabulary past it means
    the normalization upstream is broken (Heaps' law keeps real
    corpora well under it), so fail loudly instead of OOMing the
    driver.
    """
    rows = word_freqs(documents, text_col).limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"vocabulary exceeds max_vocab_rows={max_vocab_rows}; "
            "check text normalization before training"
        )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        vocab[tuple(r["word"]) + (EOW,)] = r["freq"]

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            _merge_word(syms, best): freq for syms, freq in vocab.items()
        }
    return merges


def bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a learned merge list (apply merges in
    learned order) — the inference side, for tests and token-count
    estimation."""
    syms: tuple[str, ...] = tuple(word) + (EOW,)
    for pair in merges:
        if len(syms) == 1:
            break
        syms = _merge_word(syms, pair)
    return list(syms)

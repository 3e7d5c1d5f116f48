"""BPE tokenizer training (operators/bpe.py) — pair statistics pinned
against an independent hand count, the merge loop pinned against a
from-scratch Sennrich-style regex reference."""

from __future__ import annotations

import re

import pytest

from flyscrape_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
    word_freqs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_freqs_normalizes_and_counts(spark):
    df = _docs(spark, ["Low low  LOW", "low tide"])
    out = {r["word"]: r["freq"] for r in word_freqs(df).collect()}
    assert out == {"low": 4, "tide": 1}


def test_pair_counts_hand_pinned(spark):
    # corpus: "aa ab" x2, "aa" x1  ->  words: aa(freq 3), ab(freq 2)
    df = _docs(spark, ["aa ab", "aa ab", "aa"])
    rows = bpe_pair_counts(df, min_count=1).collect()
    got = {(r["left_sym"], r["right_sym"]): r["pair_count"] for r in rows}
    assert got == {
        ("a", "a"): 3,          # inside "aa", weighted by freq 3
        ("a", "b"): 2,          # inside "ab"
        ("a", EOW): 3,          # "aa" word-final a
        ("b", EOW): 2,          # "ab" word-final b
    }
    # merge_rank deterministic: count desc then (left, right) asc —
    # binary collation, so "</w>" sorts before "a"
    ranked = sorted(rows, key=lambda r: r["merge_rank"])
    assert [(r["left_sym"], r["right_sym"]) for r in ranked] == [
        ("a", EOW), ("a", "a"), ("a", "b"), ("b", EOW),
    ]


def test_min_count_filters(spark):
    df = _docs(spark, ["aa ab", "aa ab", "aa"])
    rows = bpe_pair_counts(df, min_count=3).collect()
    got = {(r["left_sym"], r["right_sym"]) for r in rows}
    assert got == {("a", "a"), ("a", EOW)}


# -- reference trainer (Sennrich et al. 2016, learn_bpe.py shape) -----------


def _ref_get_stats(vocab):
    stats = {}
    for word, freq in vocab.items():
        syms = word.split()
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + freq
    return stats


def _ref_merge_vocab(pair, vocab):
    out = {}
    bigram = re.escape(" ".join(pair))
    pat = re.compile(r"(?<!\S)" + bigram + r"(?!\S)")
    for word, freq in vocab.items():
        out[pat.sub("".join(pair), word)] = freq
    return out


def _ref_train(word_freqs_map, num_merges):
    vocab = {
        " ".join(tuple(w) + (EOW,)): f for w, f in word_freqs_map.items()
    }
    merges = []
    for _ in range(num_merges):
        stats = _ref_get_stats(vocab)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _ref_merge_vocab(best, vocab)
    return merges


def test_train_matches_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cats sat",
        "a cat and a rat",
        "mat rat cat",
        "aaa aaaa the the the",   # symbol runs exercise greedy merging
    ]
    df = _docs(spark, texts)
    wf = {r["word"]: r["freq"] for r in word_freqs(df).collect()}
    got = bpe_train(df, num_merges=12)
    want = _ref_train(wf, 12)
    assert got == want


def test_encode_roundtrip(spark):
    df = _docs(spark, ["banana bandana banana"])
    merges = bpe_train(df, num_merges=30)
    # enough merges: every trained word collapses to ONE token
    assert bpe_encode("banana", merges) == ["banana" + EOW]
    # unseen word still tokenizes (into learned subwords + chars)
    toks = bpe_encode("band", merges)
    assert "".join(toks) == "band" + EOW


def test_vocab_guard_trips(spark):
    df = _docs(spark, ["one two three four five"])
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train(df, num_merges=1, max_vocab_rows=2)

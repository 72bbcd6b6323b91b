"""Distributed BPE trainer (operators/tokenizer.py): merge learning and
tokenization are verified against an independent pure-Python BPE
implementation (Sennrich-style, types-not-tokens), not by re-running the
Spark expressions."""

from __future__ import annotations

import re
from collections import Counter

from wellmeet_data_pipeline_spark.operators.tokenizer import (
    apply_bpe_merges,
    bpe_pair_counts,
    train_bpe_merges,
    word_frequencies,
)

ROWS = [
    (1, "low low low lower lowest"),
    (2, "new newer newest low"),
    (3, "aaa banana bandana"),
    (4, "Low, LOWER!  new\tnew"),  # punctuation + case + whitespace noise
]


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"[^\w\s]", "", t.lower())).strip()


def _freqs() -> Counter:
    return Counter(w for _, t in ROWS for w in _norm(t).split() if w)


def _py_bpe(freqs: Counter, n: int):
    """Independent reference: pair counts over the weighted word vocab,
    (count desc, pair asc) argmax, greedy left-to-right replacement."""
    vocab = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n):
        c: Counter = Counter()
        for w, f in freqs.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += f
        if not c:
            break
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        l, r = best
        for w, s in vocab.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_word_frequencies_normalizes_and_weights(spark):
    got = {r["word"]: r["freq"] for r in word_frequencies(_docs(spark)).collect()}
    assert got == dict(_freqs())


def test_pair_counts_match_reference_first_iteration(spark):
    freqs = _freqs()
    expect: Counter = Counter()
    for w, f in freqs.items():
        for i in range(len(w) - 1):
            expect[w[i : i + 2]] += f
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["pair"], r["n"]) for r in bpe_pair_counts(_docs(spark), top_n=10).collect()]
    assert got == top


def test_pair_counts_count_overlapping_repeats(spark):
    docs = _docs(spark).sparkSession.createDataFrame(
        [(1, "aaa")], "doc_id long, text string"
    )
    got = {r["pair"]: r["n"] for r in bpe_pair_counts(docs, top_n=5).collect()}
    assert got == {"aa": 2}  # both overlapping occurrences, per the BPE definition


def test_trained_merges_match_python_reference(spark):
    merges, vocab = train_bpe_merges(_docs(spark), n_merges=6)
    py_merges, py_vocab = _py_bpe(_freqs(), 6)
    assert merges == py_merges
    got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got == py_vocab


def test_apply_merges_tokenizes_like_reference(spark):
    merges, _ = train_bpe_merges(_docs(spark), n_merges=6)
    _, py_vocab = _py_bpe(_freqs(), 6)
    toks = apply_bpe_merges(_docs(spark), merges).collect()
    assert len(toks) == sum(_freqs().values())
    for r in toks:
        assert list(r["tokens"]) == py_vocab[r["word"]]


def test_merge_does_not_cascade_within_one_pass(spark):
    # "aaaa" under a single (a,a) merge must become [aa, aa], not [aaa, a]
    # or [aaaa]: the fold's merged symbol "aa" != l="a" blocks re-consumption.
    docs = spark.createDataFrame([(1, "aaaa aa")], "doc_id long, text string")
    merges, vocab = train_bpe_merges(docs, n_merges=1)
    assert merges == [("a", "a")]
    got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got == {"aaaa": ["aa", "aa"], "aa": ["aa"]}

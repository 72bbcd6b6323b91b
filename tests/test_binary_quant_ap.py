"""Behavioral pins for average_precision and the binary-quantization
scan — known answers and guarantees the oracle gate can't see."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _ap_ref(pairs):
    """pairs: [(score, label)] — reference AP under (score desc, idx asc)."""
    ranked = sorted(range(len(pairs)), key=lambda i: (-pairs[i][0], i))
    cum, terms = 0, []
    for r, i in enumerate(ranked, start=1):
        cum += pairs[i][1]
        if pairs[i][1]:
            terms.append(math.floor(cum / r * 1e9 + 0.5))
    return sum(terms) // (1000 * max(1, cum))


def test_average_precision_known_answers(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import average_precision

    # perfect ranking -> AP = 1
    rows = [(i, 100 - i, 1 if i < 3 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, s long, y long")
    r = average_precision(df, "s", "y", "id").collect()[0]
    assert r["ap_micro"] == 1_000_000 and r["n_pos"] == 3 and r["n_docs"] == 10

    # positives at ranks 2 and 4: AP = (1/2 + 2/4) / 2 = 0.5
    rows2 = [(1, 40, 0), (2, 30, 1), (3, 20, 0), (4, 10, 1)]
    df2 = spark.createDataFrame(rows2, "id long, s long, y long")
    r2 = average_precision(df2, "s", "y", "id").collect()[0]
    assert r2["ap_micro"] == 500_000

    # matches the reference implementation on a scrambled mix
    pairs = [((i * 7919) % 50, 1 if i % 3 == 0 else 0) for i in range(30)]
    rows3 = [(i, s, y) for i, (s, y) in enumerate(pairs)]
    df3 = spark.createDataFrame(rows3, "id long, s long, y long")
    r3 = average_precision(df3, "s", "y", "id").collect()[0]
    assert r3["ap_micro"] == _ap_ref(pairs)


def test_average_precision_degenerate(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import average_precision

    # no positives -> NULL, not a divide error
    df = spark.createDataFrame([(1, 5, 0), (2, 4, 0)], "id long, s long, y long")
    r = average_precision(df, "s", "y", "id").collect()[0]
    assert r["ap_micro"] is None and r["n_pos"] == 0

    # NULL labels occupy ranks but contribute nothing
    df2 = spark.createDataFrame(
        [(1, 30, None), (2, 20, 1), (3, 10, 0)], "id long, s long, y long"
    )
    r2 = average_precision(df2, "s", "y", "id").collect()[0]
    # the one positive sits at rank 2 -> AP = 1/2
    assert r2["ap_micro"] == 500_000 and r2["n_pos"] == 1 and r2["n_docs"] == 3


def test_sign_bit_packing_roundtrip(spark):
    """Packed halves reproduce the sign pattern: hamming(a, b) computed
    by the operator equals the naive per-dimension disagreement count."""
    from wellmeet_data_pipeline_spark.operators.similarity import (
        binary_hamming_top_k,
    )

    def vec(bits):
        return [1.0 if b else -1.0 for b in bits]

    base = [i % 2 == 0 for i in range(64)]
    flip3 = list(base)
    for i in (0, 31, 63):  # boundary bits of both halves
        flip3[i] = not flip3[i]
    flip10 = list(base)
    for i in range(10):
        flip10[i * 6] = not flip10[i * 6]
    rows = [(0, vec(base)), (1, vec(flip3)), (2, vec(flip10))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        (r["query_id"], r["neighbor_id"]): r["hamming"]
        for r in binary_hamming_top_k(df, df, k=3, dim=64).collect()
    }
    assert out[(0, 1)] == 3 and out[(0, 2)] == 10
    assert out[(1, 2)] == sum(x != y for x, y in zip(flip3, flip10))


def test_binary_topk_order_and_ties(spark):
    from wellmeet_data_pipeline_spark.operators.similarity import (
        binary_hamming_top_k,
    )

    def vec(bits):
        return [1.0 if b else -1.0 for b in bits]

    base = [True] * 64
    one = list(base)
    one[5] = False
    one_b = list(base)
    one_b[9] = False  # same distance as `one` -> tie, id-ascending wins
    rows = [(0, vec(base)), (7, vec(one)), (3, vec(one_b)), (9, vec([False] * 64))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        (r["neighbor_id"], r["hamming"], r["rank"])
        for r in binary_hamming_top_k(df, df, k=3, dim=64)
        .filter(F.col("query_id") == 0)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(3, 1, 1), (7, 1, 2), (9, 64, 3)]


def test_binary_quant_recall_self_consistent(spark):
    """When binary distance perfectly mirrors cosine order (orthogonal
    sign patterns with graded overlap), recall@k = k."""
    from wellmeet_data_pipeline_spark.operators.similarity import binary_quant_recall

    # query 0; neighbors at increasing hamming AND decreasing cosine
    def vec(n_neg):
        return [(-1.0 if i < n_neg else 1.0) for i in range(64)]

    rows = [(0, vec(0))] + [(i, vec(4 * i)) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = binary_quant_recall(df, k=3, every=50, dim=64).collect()
    assert len(r) == 1 and r[0]["query_id"] == 0
    assert r[0]["n_exact"] == 3 and r[0]["n_overlap"] == 3


def test_stupid_backoff_levels(spark):
    """Trigram hits score ln(c3/c2ctx); unseen trigrams back off with the
    0.4 penalty; a doc the LM saw verbatim scores near zero NLL."""
    import math

    from wellmeet_data_pipeline_spark.operators.scoring import stupid_backoff_nll

    lm_text = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(0, lm_text), (1, "the cat sat on the mat"), (2, "zz qq unseen words")],
        "doc_id long, text string",
    )
    lm = docs.filter(F.col("doc_id") == 0)
    out = {r["doc_id"]: r for r in stupid_backoff_nll(docs, lm).collect()}
    # doc 1 == LM text: every trigram hits with count ratio 1 except the
    # two warmup positions (pos0 unigram, pos1 bigram)
    assert out[1]["n_tokens"] == 6
    # pos0: (c1('the')+1)/(N+V) = 3/11; pos1: c2/c1 = 1/2; rest: c3/c2ctx = 1
    exp = -(
        math.floor(math.log(3 / 11) * 1e6 + 0.5)
        + math.floor(math.log((1 / 2)) * 1e6 + 0.5)
    )
    assert out[1]["sb_nll_micro"] == exp // 6
    # fully OOV doc: strictly worse than the verbatim doc
    assert out[2]["sb_nll_micro"] > out[1]["sb_nll_micro"]


def test_stupid_backoff_penalty_ordering(spark):
    """Same target token: a bigram-hit path must score higher (lower NLL)
    than the same token reached through a double backoff."""
    from wellmeet_data_pipeline_spark.operators.scoring import stupid_backoff_nll

    lm = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta gamma")], "doc_id long, text string"
    )
    # doc 10: 'x y beta gamma' -> 'gamma' at pos 3 has context (y, beta):
    #   trigram miss, bigram 'beta gamma' hit -> 0.4 * c2/c1
    # doc 11: 'x y z gamma' -> trigram and bigram miss -> 0.16 * unigram
    docs = spark.createDataFrame(
        [(10, "x y beta gamma"), (11, "x y z gamma")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in stupid_backoff_nll(docs, lm).collect()}
    assert out[10]["sb_nll_micro"] < out[11]["sb_nll_micro"]

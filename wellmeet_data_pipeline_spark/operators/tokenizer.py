"""Distributed BPE tokenizer-training primitives.

The reference repo has no tokenizer trainer; this extends the engine's
training-data surface (SURVEY §2 north-star: "the operations a
large-scale training-data pipeline would need") with the corpus-side
half of byte-pair-encoding training (Sennrich et al. 2016, public
algorithm): the expensive part of every merge iteration is counting
adjacent-symbol pairs over the corpus, and the classic trick is that
this is an aggregation over the WORD VOCABULARY (distinct words
weighted by their corpus frequency) — "types, not tokens" — so after a
single corpus pass every subsequent iteration touches a frame whose
size is the number of distinct words, not the number of words.

Scale posture at 100 TB:
- `word_frequencies` is one map-side-combined groupBy over the exploded
  token stream — the only corpus-sized pass.
- each merge iteration runs on the vocabulary frame (~10^7-10^8 rows at
  web scale, independent of corpus size), entirely in JVM codegen
  (transform/aggregate array folds — no Python in the loop).
- the per-iteration argmax is a ONE-row driver collect — a bounded
  model-parameter collect, same category as the IVF centroid fetch
  (operators/similarity.py), documented per the repo convention.
- `localCheckpoint` truncates the plan each iteration, the same
  iterative-lineage idiom as connected components (operators/dedup.py).
"""

from __future__ import annotations

import gc

from pyspark.sql import DataFrame, functions as F

from wellmeet_data_pipeline_spark.functions.text import normalized_text


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized token stream — the one
    corpus-sized pass of BPE training.  Map-side combine collapses
    repeats before the shuffle; the result is vocabulary-sized."""
    return (
        docs.select(F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_pair_counts(
    docs: DataFrame | None = None,
    text_col: str = "text",
    top_n: int = 20,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Adjacent character-pair counts weighted by word frequency — the
    argmax input of BPE merge iteration 1, exposed as a query.

    Overlapping repeats count every occurrence ("aaa" contributes "aa"
    twice), matching the standard pair-count definition.  Top-N is an
    orderBy+limit (TakeOrderedAndProject — per-partition heaps + a
    driver-side merge of top_n rows, never a global sort) with a
    deterministic (n desc, pair asc) tie-break.
    """
    v = vocab if vocab is not None else word_frequencies(docs, text_col)
    pairs = v.filter(F.length("word") >= 2).select(
        F.col("freq"),
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("pair")).limit(top_n)


def _symbolized_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, syms) with syms = the word split into single-character
    symbols — BPE's starting state."""
    return word_frequencies(docs, text_col).withColumn(
        "syms",
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
    )


def _pair_counts_over_syms(vocab: DataFrame) -> DataFrame:
    """(l, r, n) adjacent-symbol pair counts over the symbolized vocab,
    weighted by word freq.  arrays_zip of the two shifted slices keeps
    the whole thing in JVM codegen."""
    pairs = vocab.filter(F.size("syms") >= 2).select(
        F.col("freq"),
        F.explode(
            F.arrays_zip(
                F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("l"),
                F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("r"),
            )
        ).alias("p"),
    )
    return pairs.select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "freq").groupBy(
        "l", "r"
    ).agg(F.sum("freq").alias("n"))


def _merge_pair_expr(l: str, r: str):
    """Greedy left-to-right non-overlapping merge of adjacent (l, r) in
    `syms`, as a pure JVM array fold.  "aaa" under merge (a,a) becomes
    ["aa","a"]: once merged, the new symbol l||r no longer equals l, so
    the fold cannot re-consume it — the standard BPE replacement rule.
    """
    ll, rl = F.lit(l), F.lit(r)
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == ll) & (x == rl),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(ll, rl)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn `n_merges` BPE merges over the corpus; returns (merges,
    final symbolized vocab).

    Driver loop = model training iterations (bounded by n_merges, a
    hyperparameter — NOT data-sized); each iteration is one
    vocabulary-frame aggregation + a 1-row argmax collect + a JVM
    array-fold rewrite.  Ties on count break by (l, r) lexicographic so
    training is deterministic.
    """
    vocab = _symbolized_vocab(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts_over_syms(vocab)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )  # bounded model-parameter collect: exactly one row
        if not best:
            break
        l, r = best[0]["l"], best[0]["r"]
        merges.append((l, r))
        # reassigning drops the py4j ref to the superseded checkpoint; its
        # blocks are released by the ContextCleaner (DataFrame.unpersist is
        # a no-op for localCheckpoint RDDs — they are not in the cache
        # catalog).  gc.collect() keeps at most ~one stale vocab's blocks
        # alive instead of letting all n_merges generations accumulate.
        vocab = vocab.withColumn("syms", _merge_pair_expr(l, r)).localCheckpoint(
            eager=True
        )
        gc.collect()
    return merges, vocab


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list: (id, word, tokens
    array).  Merges apply in training order — the BPE inference rule —
    via chained JVM array folds; no Python, no shuffle (the rewrite is
    a projection over the token stream)."""
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .withColumn(
            "syms",
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        )
    )
    for l, r in merges:
        toks = toks.withColumn("syms", _merge_pair_expr(l, r))
    return toks.select(id_col, "word", F.col("syms").alias("tokens"))

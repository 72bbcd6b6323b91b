"""Property-based checks (hypothesis) for the invariants the dedup and
text layers rely on.  Batched: each property collects its examples and
runs ONE Spark job over all of them, keeping runtime sane."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.functions.text import (
    normalized_text,
    quality_score,
    token_count,
)

TEXTS = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"), max_codepoint=0x2FFF),
    max_size=200,
)


def _eval_many(spark, texts, col_builder):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [r["v"] for r in df.select(col_builder(F.col("t")).alias("v")).collect()]


@settings(max_examples=1, deadline=None)
@given(st.lists(TEXTS, min_size=30, max_size=30))
def test_normalized_text_is_idempotent_and_canonical(spark, texts):
    once = _eval_many(spark, texts, normalized_text)
    twice = _eval_many(spark, once, normalized_text)
    assert once == twice  # idempotent
    for v in once:
        assert v == v.lower()
        assert not re.search(r"\s\s", v)
        assert v == v.strip()


@settings(max_examples=1, deadline=None)
@given(st.lists(TEXTS, min_size=30, max_size=30))
def test_quality_score_bounded(spark, texts):
    scores = _eval_many(spark, texts, quality_score)
    assert all(s is None or 0.0 <= s <= 1.0 for s in scores)


ASCII_TEXTS = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=200
)


@settings(max_examples=1, deadline=None)
@given(st.lists(ASCII_TEXTS, min_size=30, max_size=30))
def test_token_count_nonnegative_and_split_consistent(spark, texts):
    # ASCII only: Java's \s (used by split()) is ASCII while Python's
    # str.split() is Unicode-aware — the engine contract is the Java one
    counts = _eval_many(spark, texts, token_count)
    expected = [len(t.split()) for t in texts]
    assert counts == expected

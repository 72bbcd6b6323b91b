"""Aggregation operators (SURVEY.md §2.7 A1-A4 + cube/rollup extensions).

All plain groupBy().agg() — Catalyst plans hash aggregation with
partial (map-side) + final phases, so every one of these ships one
combined row per (partition, group) into the shuffle, which is what
keeps grouped tallies viable at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conditional_counts(df: DataFrame, flag_col, group_cols: Sequence[str]) -> DataFrame:
    """A2 (save-reviews/lambda_function.py:60-98): success/failure tallies.
    sum(when(flag,1)) keeps it one pass / one shuffle instead of two counts."""
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(flag_col, 1).otherwise(0)).alias("n_success"),
        F.sum(F.when(~flag_col, 1).otherwise(0)).alias("n_failed"),
    )


def grouped_sample(df: DataFrame, group_cols: Sequence[str], payload_col: str, k: int) -> DataFrame:
    """A4 (save-reviews/lambda_function.py:109-110): keep at most k payloads
    per group — slice(collect_list) after a sort inside the group via
    sort_array for determinism."""
    return df.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_list(payload_col)), 1, k).alias("sample")
    )


def rollup_counts(df: DataFrame, dims: Sequence[str], measure: str) -> DataFrame:
    """Hierarchical subtotals (reference has none — free Catalyst extension,
    SURVEY.md §2.7)."""
    return df.rollup(*dims).agg(
        F.count("*").alias("n_rows"), F.round(F.sum(measure), 2).alias("sum_measure")
    )


def cube_counts(df: DataFrame, dims: Sequence[str], measure: str) -> DataFrame:
    return df.cube(*dims).agg(
        F.count("*").alias("n_rows"), F.round(F.sum(measure), 2).alias("sum_measure")
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_share: float,
    round_digits: int = 6,
) -> DataFrame:
    """Exact phi-heavy-hitters: keys whose frequency is >= min_share of
    all rows — the exact form of what Misra-Gries / count-min sketches
    approximate, and the frame a skew-mitigation pass (salting, hot-key
    broadcast) reads to decide WHICH keys to salt.

    Plan: one map-side-combined groupBy on the key + a 1-row total
    broadcast (scalar agg cross-joined back, the tfidf_top_terms idiom).
    Output is at most 1/min_share rows by construction — bounded
    regardless of corpus size."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("n"))
    return threshold_heavy_hitters(counts, key_col, min_share, round_digits)


def threshold_heavy_hitters(
    counts: DataFrame,
    key_col: str,
    min_share: float,
    round_digits: int = 6,
) -> DataFrame:
    """The threshold/share half of heavy_hitters over a PRE-AGGREGATED
    (key, n) frame — shared with the streaming tracker, whose counts
    come from an incrementally-maintained store instead of a scan."""
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") >= F.col("__total") * F.lit(min_share))
        .select(
            key_col,
            "n",
            F.round(F.col("n") / F.col("__total"), round_digits).alias("share"),
        )
    )


def merge_agg_states(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    count_col: str = "n_events",
    sum_col: str = "value_cents",
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: refresh a stored
    (count, sum) rollup with a delta batch WITHOUT rescanning the base
    data — union the two partial-state frames and re-reduce.  Sound
    because count/sum are commutative monoids (the same algebra Spark's
    own partial aggregation exploits per-shuffle); avg/stddev derive from
    (count, sum, sum-of-squares) states the same way.

    This is the nightly-rollup shape at 100 TB: the base frame is
    key-cardinality (already aggregated, typically 10^3-10^6x smaller
    than the event log) and the delta aggregates map-side before its
    rows move, so the refresh cost scales with |delta| + |keys|, not
    with the full history.  MIN/MAX also merge; distinct-count requires
    a mergeable sketch state (HLL) instead of a scalar."""
    return (
        base.select(*keys, count_col, sum_col)
        .unionByName(delta.select(*keys, count_col, sum_col))
        .groupBy(*keys)
        .agg(
            F.sum(count_col).alias(count_col),
            F.sum(sum_col).alias(sum_col),
        )
    )

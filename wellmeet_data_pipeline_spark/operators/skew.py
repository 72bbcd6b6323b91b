"""Skew mitigation (100 TB posture).

The driver's `events` table is skewed by user_id by construction
(TESTDATA.md), and the reference's review corpus is skewed by place_id
(a few restaurants own most reviews).  Two standard treatments:

- AQE skew-join splitting is ON in session.py — the first line of
  defense, no code changes.
- Salted two-phase aggregation here for the cases AQE can't fix
  (a single giant group in groupBy): salt the key, partial-agg on
  (key, salt), final-agg on key.  Works for any algebraic aggregate.
- Salted broadcast-replicated join for skewed join keys when the small
  side fits in memory x salt factor.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame, key_cols: Sequence[str], value_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-safe groupBy: count + sum per key.  Phase 1 shuffles
    on (key, salt) — the hot key spreads over salt_buckets reducers; phase
    2 combines salt_buckets small rows per key.

    Salt = pmod(xxhash64(all columns), buckets): a pure function of row
    CONTENT, so it is deterministic under task retry (the
    monotonically_increasing_id / round-robin hazard class cannot touch
    it) AND independent of input partitioning — spark_partition_id-based
    salts silently collapse to one bucket when the hot key arrives in few
    partitions (small file, post-coalesce, source clustered by the key),
    re-creating the very straggler this operator exists to prevent.
    Fully identical rows share a salt; their spread comes from partial
    aggregation, which collapses them before the shuffle anyway."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count("*").alias("__n"), F.sum(value_col).alias("__s")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__n").alias("n_rows"), F.sum("__s").alias("sum_value")
    )


def salted_join_small_side(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed equi join: salt the big side, replicate the small side across
    all salt values (explode), join on (key, salt).  Each hot-key bucket
    lands on a different reducer.  Prefer plain broadcast when the small
    side fits; this is for medium dims too big to broadcast next to a
    skewed fact."""
    # content hash + partition id: content alone collapses when a hot
    # key's projected rows are identical (joins have no partial-agg
    # rescue); partition id alone collapses when the key sits in few
    # partitions.  The sum spreads in either case and stays retry-
    # deterministic (a recomputed partition re-derives both terms).
    big_salted = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns]) + F.spark_partition_id(),
            F.lit(salt_buckets),
        ),
    )
    small_replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    out = big_salted.join(small_replicated, on=[key, "__salt"], how="inner")
    return out.drop("__salt")


def split_hot_cold_join(
    big: DataFrame,
    dim: DataFrame,
    key_big: str,
    key_dim: str,
    hot_keys: DataFrame,
) -> DataFrame:
    """Hot/cold split equi join: rows whose key is in `hot_keys` (a
    bounded frame, e.g. aggregations.heavy_hitters output — ≤ 1/phi
    rows) take a BROADCAST join and never shuffle; the cold remainder
    takes the normal shuffle path, now free of stragglers because the
    heavy keys are gone from it.  The classic pre-AQE skew treatment,
    kept relevant at 100 TB where a single key can exceed what one
    reducer — even an AQE-split one — should absorb, and the detector
    (heavy_hitters) is already a by-product of ingest monitoring.

    Output equals the plain inner join row-for-row (oracle-proven);
    both branches broadcast only bounded frames (hot key list, dim)."""
    keys = hot_keys.select(F.col(hot_keys.columns[0]).alias(key_big)).distinct()
    hot_rows = big.join(F.broadcast(keys), key_big, "left_semi")
    cold_rows = big.join(F.broadcast(keys), key_big, "left_anti")
    cond_hot = hot_rows[key_big] == dim[key_dim]
    hot = hot_rows.join(F.broadcast(dim), cond_hot, "inner")
    cold = cold_rows.join(dim, cold_rows[key_big] == dim[key_dim], "inner")
    return hot.unionByName(cold)


def fanout_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a CPU-heavy pipeline base whose SCAN yields
    fewer partitions than the cluster has slots (guide §2: single-task
    stages are stragglers by construction).

    The explode/hash bases this guards (shingling, per-token scoring,
    per-char entropy, signature hashing) multiply per-row work ~100x
    after a scan whose split count is BYTES-derived (maxPartitionBytes),
    so a corpus small enough to arrive in a handful of splits serializes
    its whole normalize→explode→partial-agg stage on that handful of
    cores — measured at sf0.1: the 16-hash MinHash signature build ran
    one task for 2.53s; with the base fanned out to 32 it runs 0.90s
    (min-of-3, warm).

    Scale-adaptive by construction: when the input already scans wide
    (the 100 TB case — thousands of splits), partitions >= parallelism
    and this is an exact no-op, so no corpus-grain shuffle is ever added
    at scale; when it fires, the shuffled bytes are by definition small
    (few splits).  Streaming frames pass through untouched (.rdd is
    undefined for them; the micro-batch source already controls their
    parallelism)."""
    if df.isStreaming:
        return df
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)

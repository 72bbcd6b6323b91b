"""Bucketed / co-located join support (100 TB posture).

At cluster scale the dominant cost of the reference's workload re-
expressed relationally is the fact⋈fact shuffle (reviews⋈restaurants by
place_id, events⋈events by surrogate).  Bucketing both sides by the join
key at write time lets every subsequent join/aggregate on that key run
shuffle-free: Spark matches bucket specs and plans a SortMergeJoin with
no Exchange.

Use for tables that are joined repeatedly on the same key (the
reference's place_id-keyed layout, storage_manager.py:30, is exactly
this access pattern — its one-object-per-key S3 scheme IS a bucket
layout without the join benefit).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed table.  n_buckets should be sized so one
    bucket ≈ one healthy task (128-512 MB) at the target scale.  Pass
    `path` to pin the files to an explicit location (external table) —
    without it the files land in the session's warehouse dir, which
    follows the DRIVER's cwd."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — planner elides both Exchanges."""
    return spark.table(left_name).join(spark.table(right_name), on=list(on), how=how)

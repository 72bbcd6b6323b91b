"""Small-files compaction — the operational sink every long-running
ingest needs at scale.  Streaming/incremental writers (merge_append,
foreachBatch sinks) produce one file set per micro-batch; at 100 TB the
resulting millions of small files dominate scan planning time and NN/
liststore load.  Compaction rewrites a directory into evenly-sized
files: one count pass + one shuffle-free-per-partition write.

Generalizes the reference's one-object-per-key S3 layout
(storage_manager.py:30), which has exactly this failure mode at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def evenly_sized(df: DataFrame, target_rows_per_file: int) -> tuple[DataFrame, int]:
    """(repartitioned df, file count) at ~target_rows_per_file rows per
    output file.  PERSISTS the input around the sizing count so the
    caller's write doesn't execute the lineage a second time — on a
    dedup-on-read view that lineage is a full window shuffle; caller
    unpersists after the write."""
    df = df.persist()
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    return df.repartition(n_files), n_files


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite `src_path` into `dst_path` with ~target_rows_per_file rows
    per file; returns the file count.  `sort_cols` additionally sorts
    within files (clustering for later predicate pushdown via min/max
    stats).  Source and destination are distinct on purpose: an
    in-place overwrite of a path being read is undefined behavior on
    every object store — swap atomically at the catalog/manifest layer
    instead."""
    df: DataFrame = spark.read.parquet(src_path)
    out, n_files = evenly_sized(df, target_rows_per_file)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(dst_path)
    df.unpersist()
    return n_files

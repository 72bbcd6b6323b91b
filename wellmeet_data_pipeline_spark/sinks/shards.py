"""Training-shard writer — the terminal sink of the curation pipeline:
gate → dedup → mix → shuffle_to_shards / pack_sequences → SHARDS.

Training jobs consume fixed-size, randomly-ordered shard files (WebDataset
/ tfrecord convention); this sink lays a DataFrame carrying (shard,
pos_in_shard) out as one directory per shard with bounded-size parquet
files whose within-file order IS the shard order, so a sequential reader
of shard=i replays positions 1..N in order without a sort at read time.

Scale shape: one repartition keyed on the shard column (each shard's rows
land in exactly one write task — shards are sized for training consumers,
not for Spark, so a shard per task is the intended granularity) and a
sortWithinPartitions on position; `maxRecordsPerFile` splits big shards
into bounded files without another shuffle.  No driver collect, no global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write (shard, pos)-addressed rows as partitioned training shards.

    Layout: path/shard=<i>/part-*.parquet, files capped at
    `max_records_per_file` rows, rows inside every file ordered by
    position.  repartition on the shard column co-locates each shard in
    one task; parquet min/max stats on pos_col let a range reader prune
    files within a shard."""
    (
        df.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, pos_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(shard_col)
        .parquet(path)
    )


def read_shard_in_order(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Read one shard in training order.  Partition pruning keeps the scan
    to the one shard directory; the explicit sort is logically required
    (parquet file order is not contractual) but executes as a cheap
    ~single-partition sort over one shard's rows."""
    return (
        spark.read.parquet(path)
        .filter(F.col("shard") == shard)
        .orderBy("pos_in_shard")
    )

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
from pyspark.sql import functions as F


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


def zorder_bits_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """SQL expression interleaving the low `bits` bits of two normalized
    integer expressions into a Morton (Z-order) value — identical text is
    valid Spark SQL and DuckDB SQL (>> << & | on BIGINT), so the plan and
    its oracle share one definition."""
    # every term fully parenthesized: DuckDB (PostgreSQL grammar) gives
    # << >> & | EQUAL precedence with left associativity, so a bare
    # `a << 3 | b << 2` parses as `((a << 3) | b) << 2` — cascading
    # shifts that overflow int64.  Spark SQL uses C-like precedence and
    # would parse the bare form differently: parentheses are the only
    # text both engines read the same way.
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def norm_to_grid_sql(col: str, min_col: str, max_col: str, bits: int = 8) -> str:
    """SQL mapping an integer column onto [0, 2^bits) given broadcast
    min/max columns — exact integer division, no float boundary."""
    cells = 1 << bits
    # floor() before the cast: Spark CAST(double AS BIGINT) truncates but
    # DuckDB CAST rounds half-even — floor is the one spelling both read
    # identically (numerator < 2^53, so the double quotient is exact
    # whenever the division is, and floor cannot sit on a false boundary)
    return (
        f"CAST(floor((({col} - {min_col}) * {cells})"
        f" / ({max_col} - {min_col} + 1)) AS BIGINT)"
    )


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    bucket_shift: int = 10,
) -> DataFrame:
    """Z-order (Morton) layout audit for two integer dimensions: map each
    row onto a 2^bits x 2^bits grid (equi-width over the observed min/max,
    exact integer arithmetic), interleave the bits into a Z value, and
    report per Z-BUCKET (z >> bucket_shift) row counts and per-dimension
    min/max bounds.

    Why it matters at 100 TB: writing files in Z order makes each file's
    (min, max) footer stats a TIGHT box in BOTH dimensions at once, so a
    conjunctive predicate on (x, y) skips most files — single-column sort
    gives tight bounds in one dimension and full-range bounds in the
    other.  The per-bucket spans this audit emits ARE that file-skipping
    evidence: sum(span_x * span_y) over Z buckets is far below
    n_buckets * full_area.  One agg for the global ranges (2-row
    broadcast), one map-side-combined groupBy on the bucket id; the
    actual layout write is `df.repartitionByRange(z).sortWithinPartitions
    (z).write...` using the same expression."""
    rng = df.agg(
        F.min(x_col).alias("__xmin"),
        F.max(x_col).alias("__xmax"),
        F.min(y_col).alias("__ymin"),
        F.max(y_col).alias("__ymax"),
    )
    gx = norm_to_grid_sql(x_col, "__xmin", "__xmax", bits)
    gy = norm_to_grid_sql(y_col, "__ymin", "__ymax", bits)
    z = zorder_bits_sql(gx, gy, bits)
    return (
        df.crossJoin(F.broadcast(rng))
        .select(
            F.expr(f"{z} >> {bucket_shift}").alias("zbucket"),
            F.col(x_col).alias("__x"),
            F.col(y_col).alias("__y"),
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )

"""Event-time window aggregations (SURVEY.md §2.10 T7 — absent in the
reference, exposed over the driver's `events` table).

Batch forms here; the streaming counterparts (watermarked window aggs)
live in wellmeet_data_pipeline_spark.streaming.  Session windows use the
gaps-and-islands formulation (lag + running sum) so the same semantics
are oracle-expressible in ANSI SQL; Structured Streaming's
session_window() is the stateful twin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(df: DataFrame, ts_col: str, minutes: int, group_cols: Sequence[str] = ()) -> DataFrame:
    """Tumbling event-time windows via F.window (epoch-aligned). Output keys:
    window_start (string for oracle-stable hashing) + group cols."""
    w = F.window(F.col(ts_col), f"{minutes} minutes")
    return (
        df.groupBy(w.alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(df: DataFrame, ts_col: str, length_min: int, slide_min: int) -> DataFrame:
    """Sliding windows: each event lands in length/slide windows."""
    w = F.window(F.col(ts_col), f"{length_min} minutes", f"{slide_min} minutes")
    return (
        df.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
    )


def session_window_agg(df: DataFrame, ts_col: str, key_col: str, gap_minutes: int) -> DataFrame:
    """Session windows (gap-based): a new session starts when the gap from
    the previous event of the same key exceeds `gap_minutes`.

    gaps-and-islands: lag -> boundary flag -> running sum = session id.
    Two window passes over one shuffle on the key; at scale the shuffle is
    on (key) and sessions never cross partitions, exactly like the state
    layout of Structured Streaming's session_window."""
    by_key = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    gap_s = gap_minutes * 60
    with_flag = df.withColumn(
        "is_new_session",
        F.when(
            F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(by_key) > gap_s,
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    with_sid = with_flag.withColumn(
        "session_seq",
        F.sum("is_new_session").over(by_key.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sid.groupBy(key_col, "session_seq").agg(
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )

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
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(df: DataFrame, ts_col: str, minutes: int, group_cols: Sequence[str] = ()) -> DataFrame:
    """Tumbling event-time windows via F.window (epoch-aligned). Output keys:
    window_start (string for oracle-stable hashing) + group cols.

    Rows with a NULL event time are excluded EXPLICITLY: an event-time
    window is undefined for them (streaming watermarks drop such rows
    too, so the batch twin matches), and leaving the filter implicit in
    F.window's behavior would silently diverge from engines that emit a
    NULL bucket (DuckDB date_trunc(NULL) groups them)."""
    df = df.filter(F.col(ts_col).isNotNull())
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
    """Sliding windows: each event lands in length/slide windows.
    NULL event times excluded, same contract as tumbling_window_agg."""
    df = df.filter(F.col(ts_col).isNotNull())
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


def global_rank_cumsum(
    df: DataFrame,
    order_cols: Sequence[Column],
    sum_col: Optional[str] = None,
    num_partitions: Optional[int] = None,
    rank_col: str = "rank",
    cum_col: str = "cum",
) -> DataFrame:
    """Distributed row_number (+ optional running sum) over a GLOBAL order
    without a single-partition WindowExec.

    `Window.orderBy(...)` with no partitionBy funnels the entire frame into
    ONE task (Spark logs ``WindowExec: No Partition Defined``) — acceptable
    post-agg over dozens of rows, a scale-killer over vocab- or
    user-cardinality frames (10^8+ rows at 100 TB).  Classic two-pass
    distributed prefix sum instead:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order key,
       then ``localCheckpoint`` so every downstream branch reads ONE
       immutable partitioning (range boundaries come from sampling; without
       the pin, recomputation could hand the two passes different layouts).
    2. Local pass — row_number / running sum windowed BY PARTITION ID:
       fully parallel, one task per range.
    3. Tiny pass — per-partition (row-count, sum) totals → EXCLUSIVE
       offsets via a triangular self-join over ``num_partitions`` rows,
       broadcast back.  No window at all on this path, so the executed
       plan contains zero unpartitioned WindowExec nodes
       (``tests/test_plans.py`` pins this).

    rank = partition row-offset + local row_number (LongType);
    cum  = partition sum-offset + local running sum (sum_col's sum type).

    `order_cols` must be a deterministic total order (break ties with a
    unique key) — range boundaries may split ties across partitions.
    """
    spark = df.sparkSession
    n_parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )

    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(w))
    if sum_col is not None:
        local = local.withColumn(
            "_lcum", F.sum(sum_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
        )

    aggs = [F.count("*").alias("_rows")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("_psum"))
    stats = ranged.groupBy("_pid").agg(*aggs)

    a, b = stats.alias("a"), stats.alias("b")
    off_aggs = [F.coalesce(F.sum("b._rows"), F.lit(0)).cast("long").alias("_row_off")]
    if sum_col is not None:
        off_aggs.append(F.coalesce(F.sum("b._psum"), F.lit(0)).alias("_sum_off"))
    offsets = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(*off_aggs)
    )

    out = local.join(F.broadcast(offsets), "_pid").withColumn(
        rank_col, F.col("_row_off") + F.col("_lrn")
    )
    drop = ["_pid", "_lrn", "_row_off"]
    if sum_col is not None:
        out = out.withColumn(cum_col, F.col("_sum_off") + F.col("_lcum"))
        drop += ["_lcum", "_sum_off"]
    return out.drop(*drop)


def equi_depth_buckets(
    df: DataFrame,
    group_col: str,
    value_col,
    n_buckets: int = 4,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram per group over an INTEGER
    value column: discrete quantile boundaries + per-bucket count and
    exact value range — the boundary-selection read behind
    repartitionByRange sizing, skew diagnosis, and monotone-feature
    binning (value_histogram is the equi-WIDTH twin).

    Boundaries are computed on the (group, distinct-value) GRID — counts
    per value, a cumulative window bounded by value-grid cardinality
    (never row cardinality), boundary_k = smallest value whose
    cumulative count reaches ceil(k*N/n_buckets) — all integer logic,
    no float quantile interpolation (the perplexity_lang_buckets
    pattern, generalized).  Rows then bucket by comparing against the
    broadcast boundary frame; ties share a bucket, so bucket
    populations are equal only up to tie mass (the standard equi-depth
    contract).  NULL values are excluded — a NULL row would sit at a
    different end of the cumulative window's order in Spark (nulls
    first) vs SQL (nulls last), shifting every boundary (r11 hostile
    catch)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    rows = df.filter(v.isNotNull()).select(
        F.col(group_col), v.cast("long").alias("__v")
    )
    grid = rows.groupBy(group_col, "__v").agg(F.count("*").alias("__c"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("__cum", F.sum("__c").over(w_cum)).join(
        grid.groupBy(group_col).agg(F.sum("__c").alias("__n")), group_col
    )
    cuts = cum.groupBy(group_col).agg(
        *[
            F.min(
                F.when(
                    F.col("__cum")
                    >= F.ceil(F.col("__n") * F.lit(k) / F.lit(n_buckets)),
                    F.col("__v"),
                )
            ).alias(f"__b{k}")
            for k in range(1, n_buckets)
        ]
    )
    bucketed = rows.join(F.broadcast(cuts), group_col)
    bucket = F.lit(n_buckets - 1)
    for k in range(n_buckets - 1, 0, -1):
        bucket = F.when(F.col("__v") <= F.col(f"__b{k}"), F.lit(k - 1)).otherwise(
            bucket
        )
    return (
        bucketed.withColumn("bucket", bucket)
        .groupBy(group_col, "bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("__v").alias("lo_value"),
            F.max("__v").alias("hi_value"),
        )
    )


def rolling_distinct_active(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day distinct active users per observed day (the WAU/MAU
    denominator): for each day with any activity, the count of distinct
    users active in [day - N + 1, day].

    Distinct-over-sliding-windows cannot ride an ordinary window
    aggregate (COUNT(DISTINCT) OVER a range frame re-scans the frame per
    row and still needs the full user set per day in one task).  Exact
    distributed form instead: collapse to (user, day) grain first (the
    big dedup — map-side combine, one shuffle on the pair), fan each
    active day out to the <= N as-of days it contributes to, dedup
    (user, as_of_day) again (a user active twice inside one window must
    count once), and count per day.  Data volume after the first dedup
    is users x active-days, and the fan-out is a bounded N x of THAT —
    never of the raw event log.  Trailing fan-out days beyond the data
    range are dropped by an inner join with the observed-day set
    (day-cardinality, broadcast)."""
    day = F.to_date(F.col(ts_col)).alias("__day")
    ud = events.select(day, F.col(user_col).alias("__u")).distinct()
    return rolling_distinct_from_pairs(ud, window_days)


def rolling_distinct_from_pairs(ud: DataFrame, window_days: int) -> DataFrame:
    """The (user, day)-pair-grain core of rolling_distinct_active —
    shared with the streaming twin, whose store already holds deduped
    pairs.  Input columns: __day (date), __u.

    Interval SWEEP, not fan-out: the previous form exploded each
    (user, day) to its <= N covering as-of days and re-deduped — an
    N-fold data amplification through a full shuffle (the 8→64x smoke
    slope crept to 1.03, and at MAU windows N=30 the blow-up is 30x).
    A user's covered as-of days are a union of intervals instead:
    merge their active days into maximal runs (gaps > N-1 split; a
    user-partitioned gaps-and-islands window over users×active-days),
    emit +1 at each run start and -1 one day past run end + N - 1,
    and prefix-sum the per-day deltas — day-cardinality work from
    there, via the two-pass distributed rank (no unpartitioned
    window).  Per-user runs never overlap, so no as-of day double-
    counts a user; observed days ride the delta frame with delta 0 so
    every as-of day has a row at its own date.  Data crossing the
    heavy shuffles is exactly users×active-days, independent of N."""
    ud = ud.filter(F.col("__day").isNotNull())
    days = ud.select(F.col("__day").alias("as_of_day")).distinct()

    w_u = Window.partitionBy("__u").orderBy("__day")
    prev_end = F.max(F.date_add("__day", window_days - 1)).over(
        w_u.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ud.withColumn(
        "__new_run",
        F.when(prev_end.isNull() | (F.col("__day") > prev_end), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "__run",
        F.sum("__new_run").over(w_u.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = flagged.groupBy("__u", "__run").agg(
        F.min("__day").alias("__a"), F.max("__day").alias("__b")
    )
    deltas = (
        runs.select(F.col("__a").alias("__d"), F.lit(1).cast("long").alias("__delta"))
        .unionByName(
            runs.select(
                F.date_add("__b", window_days).alias("__d"),
                F.lit(-1).cast("long").alias("__delta"),
            )
        )
        .unionByName(
            days.select(
                F.col("as_of_day").alias("__d"), F.lit(0).cast("long").alias("__delta")
            )
        )
    )
    by_day = deltas.groupBy("__d").agg(F.sum("__delta").alias("__delta"))
    cum = global_rank_cumsum(
        by_day, [F.col("__d")], sum_col="__delta", cum_col="__cum"
    )
    return (
        cum.join(F.broadcast(days), cum["__d"] == days["as_of_day"])
        .select("as_of_day", F.col("__cum").alias("n_active"))
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build from an event log:
    per key, collapse consecutive same-state observations into versioned
    validity ranges — effective_from = first observation of the run,
    effective_to = the next run's start (NULL on the current row).  The
    warehouse-standard dimension-history shape, built set-based: one
    lag() to find run starts, one lead() over the surviving change rows
    for the range close, one row_number for the version ordinal — all
    three windows partitioned BY KEY (frame size = one key's history,
    bounded by update frequency, never table-proportional; the
    cdc_apply_latest scale argument, dedup.py:1436, extended from
    latest-state to full history).

    Order within key is (ts, tie) — pass a unique tiebreaker (event_id)
    or same-instant updates version nondeterministically across retries.

    Returns (key, state, effective_from, effective_to, version,
    is_current)."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
    changes = (
        df.select(key_col, state_col, ts_col, tie_col)
        .withColumn("__prev", F.lag(state_col).over(w))
        .filter(
            F.col("__prev").isNull() | (F.col(state_col) != F.col("__prev"))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    return changes.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w2).alias("effective_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead(ts_col).over(w2).isNull().cast("int").alias("is_current"),
    )

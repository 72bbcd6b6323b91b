"""The reference's full event-driven DAG as ONE streaming pipeline
(SURVEY.md §3.3).

Reference choreography: restaurant JSON lands in S3 → Lambda validates
and saves → one AWS Batch job PER RESTAURANT crawls its reviews → review
JSON lands in S3 → second Lambda projects and posts.  Four processes,
three network hops, a job queue.

Here: one foreachBatch.  Per micro-batch of landed restaurants —
validate (P4) → fill defaults (P7) → insert-if-absent into the
restaurant store (J2/K2) → the batch's NEW place_ids become the seed
frame for the review ingest (K5's job-per-restaurant collapses into
partition-per-key scheduling) → incremental review ingest (J1) into the
review store.  The only driver-side materialization is the new-key list
(bounded by batch size, not corpus size).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.projections import fill_rds_defaults, require_fields
from wellmeet_data_pipeline_spark.pipelines import ingest_reviews
from wellmeet_data_pipeline_spark.schemas import RESTAURANT
from wellmeet_data_pipeline_spark.sinks.merge import merge_append, read_current_or_none
from wellmeet_data_pipeline_spark.streaming.pipeline import landing_stream


def _read_backlog_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    # narrow catch: ONLY path-does-not-exist may read as "no backlog yet".
    # A transient read failure must propagate — treating it as empty would
    # make the caller proceed without the carried-over obligations.
    import os

    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def _read_pending(spark: SparkSession, backlog_store: str) -> DataFrame | None:
    """Pending fan-out keys from the append-only backlog log: rows marked
    'todo' that have no 'done' marker.  The log is never overwritten —
    appends are crash-safe (a torn append leaves at worst a replayable
    duplicate, and both marks are idempotent on place_id), unlike a
    rewrite-in-place whose delete window can lose the only durable copy."""
    log = _read_backlog_or_none(spark, backlog_store)
    if log is None:
        return None
    todo = log.filter(F.col("_op") == "todo").select("place_id").distinct()
    done = log.filter(F.col("_op") == "done").select("place_id")
    return todo.join(done, "place_id", "left_anti")


def _append_marks(keys: DataFrame, backlog_store: str, op: str) -> None:
    keys.select("place_id", F.lit(op).alias("_op")).write.mode("append").parquet(
        backlog_store
    )


def _take_chunk(todo: DataFrame, max_keys: int) -> list[str]:
    """First `max_keys` place_ids in deterministic order — the ONE bounded
    driver materialization of the fan-out."""
    return [
        r["place_id"]
        for r in todo.orderBy("place_id").limit(max_keys).collect()
    ]


def _ingest_capped(
    spark: SparkSession,
    pending: DataFrame,
    backlog_store: str,
    review_store: str,
    review_fetcher: Callable[[str, int], list[dict]],
    max_keys: int,
    batch_seq: int,
) -> None:
    """Ingest up to `max_keys` pending keys, marking them done afterwards.

    At-least-once order: the 'todo' marks are already durable (appended by
    the caller before this runs); the chunk is ingested (review merge is
    idempotent on (place_id, id), so a crash-replay of the chunk is
    harmless); only then are 'done' marks appended.  A crash between
    ingest and the done-append re-ingests the chunk later — nothing is
    ever lost, because no step deletes log data."""
    chunk = _take_chunk(pending, max_keys)
    if not chunk:
        return
    ingest_reviews(spark, chunk, review_fetcher, review_store, batch_seq=batch_seq)
    chunk_df = spark.createDataFrame([(k,) for k in chunk], "place_id string")
    _append_marks(chunk_df, backlog_store, "done")


def drain_backlog(
    spark: SparkSession,
    backlog_store: str,
    review_store: str,
    review_fetcher: Callable[[str, int], list[dict]],
    max_keys_per_batch: int,
    start_seq: int = 1_000_000,
) -> None:
    """Drain any carried-over fan-out backlog to empty, one capped chunk
    per round — every driver collect stays <= max_keys_per_batch."""
    if max_keys_per_batch < 1:
        raise ValueError(f"max_keys_per_batch must be >= 1, got {max_keys_per_batch}")
    round_no = 0
    while True:
        pending = _read_pending(spark, backlog_store)
        if pending is None or pending.isEmpty():
            return
        _ingest_capped(
            spark, pending.localCheckpoint(eager=True), backlog_store, review_store,
            review_fetcher, max_keys_per_batch, start_seq + round_no,
        )
        round_no += 1


def run_orchestration(
    spark: SparkSession,
    restaurant_landing_dir: str,
    restaurant_store: str,
    review_store: str,
    checkpoint_dir: str,
    review_fetcher: Callable[[str, int], list[dict]],
    max_keys_per_batch: int | None = None,
    backlog_store: str | None = None,
) -> None:
    """availableNow activation of the whole §3.3 DAG.

    `max_keys_per_batch` bounds the one driver-side materialization (the
    new-key list driving the per-key review fan-out): each micro-batch
    ingests at most that many keys and persists the overflow to
    `backlog_store`, which later batches — and a final post-stream drain —
    keep draining under the same cap.  Without the cap a backfill-sized
    batch would build a driver list proportional to the batch (the
    reference's one-Batch-job-per-restaurant loop has the same unbounded
    fan-out, lambda_function.py:145-183)."""
    if max_keys_per_batch is not None:
        if backlog_store is None:
            raise ValueError("max_keys_per_batch requires backlog_store")
        if max_keys_per_batch < 1:
            raise ValueError(f"max_keys_per_batch must be >= 1, got {max_keys_per_batch}")
    stream = landing_stream(spark, restaurant_landing_dir, RESTAURANT)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        valid = fill_rds_defaults(require_fields(batch_df, ["place_id", "name"]))
        valid = valid.dropDuplicates(["place_id"])
        cur = read_current_or_none(spark, restaurant_store, id_col="place_id")
        existing = (
            cur.select("place_id") if cur is not None
            else spark.createDataFrame([], "place_id string")
        )
        fresh = valid.join(existing, "place_id", "left_anti")
        # K5's one-Batch-job-per-restaurant → seed frame over the NEW keys
        if max_keys_per_batch is None:
            merge_append(fresh, restaurant_store, id_col="place_id",
                         partition_col=None, batch_seq=batch_id)
            new_place_ids = [r["place_id"] for r in fresh.select("place_id").collect()]
            if new_place_ids:
                ingest_reviews(
                    spark, new_place_ids, review_fetcher, review_store,
                    batch_seq=batch_id,
                )
            return
        # durable FIRST — and specifically BEFORE the restaurant-store
        # commit: `fresh` is an anti join against the store, so a crash
        # after the store commit but before the todo-append would replay
        # the batch with fresh EMPTY and the review obligation lost
        # forever (caught by the r9 fault-injection soak).  Appending
        # todo first is safe in the other direction: a crash before the
        # store commit replays with fresh unchanged and the re-appended
        # todo marks collapse in _read_pending's distinct.
        _append_marks(fresh.select("place_id"), backlog_store, "todo")
        merge_append(fresh, restaurant_store, id_col="place_id", partition_col=None,
                     batch_seq=batch_id)
        pending = _read_pending(spark, backlog_store)
        if pending is None:
            return
        # materialize BEFORE _ingest_capped appends done-marks: the
        # pending lineage reads the log being appended to
        _ingest_capped(
            spark, pending.localCheckpoint(eager=True), backlog_store, review_store,
            review_fetcher, max_keys_per_batch, batch_id,
        )

    (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    if max_keys_per_batch is not None:
        drain_backlog(
            spark, backlog_store, review_store, review_fetcher, max_keys_per_batch
        )


def compact_backlog(spark: SparkSession, backlog_store: str, out_path: str) -> None:
    """Maintenance: rewrite the append-only mark log as pending-only
    'todo' marks at `out_path` (done pairs cancelled).  Writes to a NEW
    path like sinks.merge.compact — the live log is never overwritten, so
    the swap stays crash-safe (keep the old dir until the new one is
    committed); marks keep accumulating otherwise."""
    pending = _read_pending(spark, backlog_store)
    if pending is None:
        pending = spark.createDataFrame([], "place_id string")
    pending.select("place_id", F.lit("todo").alias("_op")).write.mode(
        "error"
    ).parquet(out_path)

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
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def _take_chunk(todo: DataFrame, max_keys: int) -> list[str]:
    """First `max_keys` place_ids in deterministic order — the ONE bounded
    driver materialization of the fan-out."""
    return [
        r["place_id"]
        for r in todo.orderBy("place_id").limit(max_keys).collect()
    ]


def _ingest_capped(
    spark: SparkSession,
    todo: DataFrame,
    backlog_store: str,
    review_store: str,
    review_fetcher: Callable[[str, int], list[dict]],
    max_keys: int,
    batch_seq: int,
) -> None:
    """Drain up to `max_keys` keys from `todo`, persisting the remainder.

    Write order is the at-least-once contract: (1) the FULL todo set goes
    to the backlog store before any ingest, so a crash mid-ingest never
    loses an obligation; (2) the chunk is ingested (review merge is
    idempotent on (place_id, id), so a replayed chunk is harmless); (3)
    the backlog is rewritten without the chunk.  `todo` is
    localCheckpoint'd by the caller because step (3) overwrites a path
    step (1)'s lineage read from."""
    todo.write.mode("overwrite").parquet(backlog_store)
    chunk = _take_chunk(todo, max_keys)
    if chunk:
        ingest_reviews(spark, chunk, review_fetcher, review_store, batch_seq=batch_seq)
    chunk_df = todo.sparkSession.createDataFrame(
        [(k,) for k in chunk], "place_id string"
    )
    todo.join(chunk_df, "place_id", "left_anti").write.mode("overwrite").parquet(
        backlog_store
    )


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
    round_no = 0
    while True:
        backlog = _read_backlog_or_none(spark, backlog_store)
        if backlog is None or backlog.isEmpty():
            return
        todo = backlog.select("place_id").distinct().localCheckpoint(eager=True)
        _ingest_capped(
            spark, todo, backlog_store, review_store, review_fetcher,
            max_keys_per_batch, start_seq + round_no,
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
        merge_append(fresh, restaurant_store, id_col="place_id", partition_col=None,
                     batch_seq=batch_id)
        # K5's one-Batch-job-per-restaurant → seed frame over the NEW keys
        if max_keys_per_batch is None:
            new_place_ids = [r["place_id"] for r in fresh.select("place_id").collect()]
            if new_place_ids:
                ingest_reviews(
                    spark, new_place_ids, review_fetcher, review_store,
                    batch_seq=batch_id,
                )
            return
        backlog = _read_backlog_or_none(spark, backlog_store)
        todo = fresh.select("place_id")
        if backlog is not None:
            todo = todo.unionByName(backlog.select("place_id"))
        # materialize BEFORE the backlog overwrite: the union's lineage
        # reads the store being rewritten
        todo = todo.distinct().localCheckpoint(eager=True)
        _ingest_capped(
            spark, todo, backlog_store, review_store, review_fetcher,
            max_keys_per_batch, batch_id,
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

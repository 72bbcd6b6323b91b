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


def run_orchestration(
    spark: SparkSession,
    restaurant_landing_dir: str,
    restaurant_store: str,
    review_store: str,
    checkpoint_dir: str,
    review_fetcher: Callable[[str, int], list[dict]],
) -> None:
    """availableNow activation of the whole §3.3 DAG."""
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
        new_place_ids = [r["place_id"] for r in fresh.select("place_id").collect()]
        if new_place_ids:
            ingest_reviews(
                spark, new_place_ids, review_fetcher, review_store, batch_seq=batch_id
            )

    (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

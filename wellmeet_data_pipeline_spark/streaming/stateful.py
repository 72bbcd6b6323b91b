"""Custom stateful streaming operators (SURVEY.md §2.10 T2,
applyInPandasWithState).

The reference's cross-run dedup state is 'the ID set re-read from the
data files before every run' (review-crawler/main.py:32, S5) — O(corpus)
per activation.  The streaming-native form keeps a checkpointed state
store keyed by id: each key's first arrival is emitted, every later
arrival is dropped, state survives restarts via the checkpoint, and the
state store shards across executors with the shuffle on the key — the
exact layout the reference's Python set can't have.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "seen integer"


def dedup_stream_by_id(stream: DataFrame, id_col: str = "id") -> DataFrame:
    """Emit only the first-ever row per id across ALL micro-batches.

    groupBy(id) -> applyInPandasWithState: state is one int per id.  If
    the key has state, drop everything; otherwise emit exactly one row
    (smallest by the remaining columns' order in the batch is arbitrary —
    batches deliver one file's rows, and cross-batch determinism comes
    from arrival order, matching the reference's append semantics)."""
    out_schema = stream.schema

    def first_only(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        for pdf in pdfs:
            if len(pdf) > 0:
                state.update((1,))
                yield pdf.head(1)
                return

    return stream.groupBy(id_col).applyInPandasWithState(
        first_only,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_dedup(
    spark,
    landing_dir: str,
    out_path: str,
    checkpoint_dir: str,
    schema,
    id_col: str = "id",
) -> None:
    """availableNow pipeline: landing JSON -> stateful first-per-id ->
    parquet append.  Re-delivered ids in later activations never reach the
    sink (contrast sinks.merge, which admits them and hides them on read)."""
    from wellmeet_data_pipeline_spark.streaming.pipeline import landing_stream

    stream = landing_stream(spark, landing_dir, schema)
    deduped = dedup_stream_by_id(stream, id_col)
    (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

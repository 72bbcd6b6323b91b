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

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "seen integer"


def dedup_stream_by_id(
    stream: DataFrame, id_col: str = "id", tiebreak_cols: Sequence[str] | None = None
) -> DataFrame:
    """Emit only the first-ever row per id across ALL micro-batches.

    groupBy(id) -> applyInPandasWithState: state is one int per id.  If
    the key has state, drop everything; otherwise emit exactly one row.
    Cross-batch the survivor is arrival order (the reference's append
    semantics); WITHIN a batch the survivor is the min row under
    `tiebreak_cols` (default: every non-id column, in schema order) —
    matching dedup_keep_first's declared-order determinism instead of
    whatever row Arrow happened to deliver first."""
    out_schema = stream.schema
    order_cols = list(tiebreak_cols) if tiebreak_cols else [
        f.name for f in stream.schema.fields if f.name != id_col
    ]

    def first_only(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        chunks = [pdf for pdf in pdfs if len(pdf) > 0]
        if not chunks:
            return
        batch = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        state.update((1,))
        yield batch.sort_values(order_cols, kind="mergesort").head(1)

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

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


def debounce_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    cooldown_seconds: int = 300,
) -> DataFrame:
    """KEPT-ANCHORED debounce: emit an event only if >= cooldown has passed
    since the last EMITTED event of the same key — the semantics a lag()
    window cannot express (the anchor advances only on kept events, an
    inherently sequential scan), which is exactly what per-key streaming
    state is for.  Contrast the batch `event_debounce` query, which
    documents itself as successive-gap thinning.

    State per key: the last-kept event-time epoch microseconds.  Within a
    batch rows are processed in (ts, remaining columns) order so output
    is deterministic under retries.  Chain of sub-cooldown events: only
    the first survives, no matter how long the chain runs — time since
    last KEPT, not since last SEEN.

    Disorder caveat: the anchor is monotone — an event arriving in a
    LATER batch with an event time before the current anchor is dropped,
    so output depends on delivery order for out-of-order streams.  Bound
    the disorder upstream with a watermark (and accept drop-late
    semantics), or use the batch `event_debounce` query on settled data
    where a total event-time order exists."""
    out_schema = stream.schema
    keys = list(key_cols)
    order_cols = [ts_col] + [
        f.name for f in stream.schema.fields if f.name not in (*keys, ts_col)
    ]

    def keep_after_cooldown(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in pdfs if len(pdf) > 0]
        if not chunks:
            return
        batch = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        batch = batch.sort_values(order_cols, kind="mergesort")
        last_us = state.get[0] if state.exists else None
        cooldown_us = cooldown_seconds * 1_000_000
        kept_rows = []
        for i, ts in enumerate(batch[ts_col]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if last_us is None or ts_us - last_us >= cooldown_us:
                kept_rows.append(i)
                last_us = ts_us
        if last_us is not None:
            state.update((last_us,))
        if kept_rows:
            yield batch.iloc[kept_rows]

    return stream.groupBy(*keys).applyInPandasWithState(
        keep_after_cooldown,
        outputStructType=out_schema,
        stateStructType="last_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""HTTP API sink with per-row error capture (SURVEY.md §2.2 K3/K4, §2.11
X4, §4 custom piece #2).

The reference POSTs row-by-row from a Lambda, tallying success/failure
and keeping the first 10 error messages (save-reviews/lambda_function.py:
60-110, 124-173; submit-aws-batch-lambda:119-142).  Spark form:
mapInPandas over repartitioned rows — one client per partition, per-row
try/except emitting an *errors-as-data* result frame (status, error), so
the tally (A2) and error sample (A4) become ordinary aggregations over
the result instead of driver-side counters.

The poster is injected; tests use a deterministic local function and the
t2 surface never touches a network.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESULT_SCHEMA = "row_key string, ok boolean, error string"


def post_partitioned(
    df: DataFrame,
    poster: Callable[[dict], None],
    key_col: str = "id",
    parallelism: int | None = None,
) -> DataFrame:
    """K3/K4: POST every row; returns a result DataFrame (row_key, ok,
    error).  `poster` raises on failure; the per-row try/except is the
    reference's handle_errors decorator (hello.py:30-60) as errors-as-data.
    Rate limiting (R9) belongs inside `poster`/the partition loop, not in
    the plan."""
    if parallelism:
        df = df.repartition(parallelism)
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, oks, errs = [], [], []
            for rec in pdf.to_dict(orient="records"):
                keys.append(str(rec.get(key_col)))
                try:
                    poster(rec)
                    oks.append(True)
                    errs.append(None)
                except Exception as exc:  # errors-as-data, never task failure
                    oks.append(False)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame({"row_key": keys, "ok": oks, "error": errs})

    return df.mapInPandas(run, RESULT_SCHEMA)


def post_report(results: DataFrame, max_errors: int = 10) -> dict:
    """The reference's event result shape (save-reviews/lambda_function.py:
    96-110): totals + first `max_errors` error messages."""
    tally = results.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("success"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("failed"),
    ).collect()[0]
    errors = [
        r["error"]
        for r in results.filter(~F.col("ok")).select("error").orderBy("row_key").limit(max_errors).collect()
    ]
    return {
        "total": tally["total"],
        "success": tally["success"] or 0,
        "failed": tally["failed"] or 0,
        "errors": errors,
    }

"""JSON ingestion (SURVEY.md §2.1 S4/S5).

The reference GetObjects whole JSON-array files and json.loads them
(review-crawler/restaurant_save.py:60-70, submit-aws-batch-lambda/
lambda_function.py:77-80).  Spark form: schema-enforced multiLine JSON
read.  The reference's S3-Select 'projection pushdown' (storage_manager.py
:63-100 — actually SELECT * with client-side projection) becomes real
column pruning: select() reaches the reader, so only requested fields are
parsed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json_array(
    spark: SparkSession, path: str, schema: StructType, multiline: bool = True
) -> DataFrame:
    """S4: one JSON array per file (the reference's {place_id}.json layout).
    Schema is declared, not inferred — inference would re-scan all 100 TB."""
    reader = spark.read.schema(schema).option("multiLine", multiline)
    return reader.option("mode", "PERMISSIVE").json(path)


def read_ids_only(spark: SparkSession, path: str, schema: StructType, id_col: str = "id") -> DataFrame:
    """S5 (get_review_ids_with_s3_select, review-crawler/storage_manager.py:
    63-100): the ID-set load before an incremental run.  Catalyst prunes to
    the single column at the parser level — the pushdown the reference
    intended but did client-side (:86-94)."""
    return read_json_array(spark, path, schema).select(id_col)

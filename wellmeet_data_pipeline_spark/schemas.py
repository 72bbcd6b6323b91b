"""Fixed StructType schemas for the reference's entities.

The reference is schemaless at rest (`json.loads` of whole S3 objects,
review-crawler/storage_manager.py:37) and validates only at the edges
(submit-aws-batch-lambda/lambda_function.py:114-116).  We declare the
schema once at ingest instead, which is what makes columnar storage,
vectorized scans and pushdown possible at 100 TB.

Shapes cited from the reference:
- review row:      review-crawler/naver_crawler.py:204-210
- restaurant row:  restaurant-crawler/restaurant-crawler.py:255-265
- RDS entity:      review-crawler/restaurant_save.py:15-23
- API payload:     save-reviews/lambda_function.py:69-73
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# review-crawler/naver_crawler.py:204-210 — id is sha256(author|content|visit_date)
# (:172-177); visit_date is a raw display string, never parsed (:198-199).
REVIEW = StructType(
    [
        StructField("id", StringType(), False),
        StructField("place_id", StringType(), False),
        StructField("author", StringType(), True),
        StructField("content", StringType(), True),
        StructField("visit_date", StringType(), True),
    ]
)

# restaurant-crawler/restaurant-crawler.py:255-265
RESTAURANT = StructType(
    [
        StructField("place_id", StringType(), True),
        StructField("name", StringType(), True),
        StructField("thumbnail_url", StringType(), True),
        StructField("category", StringType(), True),
        StructField("page", IntegerType(), True),
        StructField("origin_address", StringType(), True),
        StructField("address", StringType(), True),
        StructField("latitude", DoubleType(), True),
        StructField("longitude", DoubleType(), True),
    ]
)

# review-crawler/restaurant_save.py:15-23 (MySQL DDL), minus the
# autoincrement surrogate id which Spark sinks derive instead.
RESTAURANT_RDS = StructType(
    [
        StructField("name", StringType(), False),
        StructField("address", StringType(), False),
        StructField("latitude", DoubleType(), False),
        StructField("longitude", DoubleType(), False),
        StructField("thumbnail", StringType(), True),
    ]
)

# save-reviews/lambda_function.py:69-73 — projection+rename+cast of REVIEW.
REVIEW_API_PAYLOAD = StructType(
    [
        StructField("restaurantId", LongType(), True),
        StructField("content", StringType(), True),
        StructField("hash", StringType(), False),
    ]
)

# North-star extensions: embedding and multimodal columns (SURVEY.md §2.11).
EMBEDDED_DOCUMENT = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)

# Opaque media payload + typed metadata; decode happens in Pandas UDFs over
# mapInPandas (operators/multimodal.py) — the bytes stay an opaque column
# to Spark so shuffles move them untouched.
MEDIA_ASSET = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

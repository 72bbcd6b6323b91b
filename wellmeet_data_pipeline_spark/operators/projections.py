"""Projection / filter / validation operators (SURVEY.md §2.3 P1-P8).

All select/withColumn/fillna — pure narrow transformations that Catalyst
collapses into the scan projection, so every one of these is 'free' at
100 TB (no shuffle, columns pruned at the parquet reader).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.functions.text import cast_with_default, review_surrogate_id


def project_review(df: DataFrame) -> DataFrame:
    """P1 (review-crawler/naver_crawler.py:179-210): raw review fields ->
    canonical 5-column review row with the reference's defaults
    (author->'익명' :182-183, content->'' :194-195) and the sha256 surrogate
    id (:172-177)."""
    author = F.coalesce(F.col("author"), F.lit("익명"))
    content = F.coalesce(F.col("content"), F.lit(""))
    return df.select(
        review_surrogate_id(author, content, F.col("visit_date")).alias("id"),
        F.col("place_id"),
        author.alias("author"),
        content.alias("content"),
        F.col("visit_date"),
    )


def project_review_api_payload(df: DataFrame) -> DataFrame:
    """P3 (save-reviews/lambda_function.py:69-73): rename + cast projection
    {place_id->restaurantId:long, content, id->hash}; non-numeric place_id
    falls back to 0 like int(review.get('place_id', 0)) would raise->skip —
    we keep the row with the default (F5)."""
    return df.select(
        cast_with_default("place_id").alias("restaurantId"),
        F.coalesce(F.col("content"), F.lit("")).alias("content"),
        F.col("id").alias("hash"),
    )


def require_fields(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """P4 (submit-aws-batch-lambda/lambda_function.py:114-116): keep rows with
    every required field present."""
    cond: Column = F.lit(True)
    for f in fields:
        cond = cond & F.col(f).isNotNull()
    return df.filter(cond)


def fill_rds_defaults(df: DataFrame) -> DataFrame:
    """P7 (review-crawler/restaurant_save.py:94-114): null-coalescing defaults
    before the RDS insert: address->'', latitude/longitude->0; thumbnail
    stays nullable (:111-113)."""
    return df.fillna({"address": "", "latitude": 0.0, "longitude": 0.0})


def flatten_nested_lists(df: DataFrame, map_col: str, out_col: str) -> DataFrame:
    """P8 (submit-aws-batch-lambda/lambda_function.py:86-91): dict-of-lists ->
    flat rows; explode on the values."""
    return df.select(F.explode(F.flatten(F.map_values(F.col(map_col)))).alias(out_col))


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Re-identification audit before a dataset release: every
    quasi-identifier combination shared by FEWER than k rows is a
    k-anonymity violation (those rows are linkable by joining the quasi
    columns against any outside table).  Returns the violating groups
    with their sizes — the rows a release pipeline must suppress or
    generalize.

    One map-side-combined groupBy on the quasi tuple; output is bounded
    by the number of RARE combinations, which is what makes the audit
    cheap at 100 TB (the frequent groups — the overwhelming mass —
    never leave the aggregation)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """The companion release audit to k_anonymity_audit: a group can be
    k-anonymous yet still leak — if every row in a quasi-identifier
    group shares the SAME sensitive value, linking any member reveals
    it.  Flags groups whose sensitive attribute carries fewer than l
    distinct (non-null) values, with group size and the distinct count.

    Same scale shape as the k audit: one groupBy on the quasi tuple
    (count-distinct adds a partial-aggregation pass), output bounded by
    the homogeneous groups only."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").alias("group_size"),
            F.count_distinct(F.col(sensitive_col)).alias("distinct_sensitive"),
        )
        .filter(F.col("distinct_sensitive") < l)
    )

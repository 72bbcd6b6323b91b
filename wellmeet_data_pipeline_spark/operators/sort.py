"""Sort / limit / top-k operators (SURVEY.md §2.8 O1-O3).

Global orderBy().limit(n) compiles to TakeOrderedAndProject — each task
keeps a size-n heap and only n rows per partition reach the driver-side
merge, so 'top 10 of 100 TB' never materializes a global sort.

Per-group top-k uses a rank window: one shuffle on the group key, heap
semantics inside each partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n(df: DataFrame, order: Sequence[Column], n: int) -> DataFrame:
    """O1+O2 (orderBy newest-first, naver_crawler.py:161-169; limit,
    save-reviews/lambda_function.py:65)."""
    return df.orderBy(*order).limit(n)


def top_k_per_group(df: DataFrame, group_cols: Sequence[str], order: Sequence[Column], k: int) -> DataFrame:
    """Per-key top-k with a deterministic tie-break expected in `order`."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )

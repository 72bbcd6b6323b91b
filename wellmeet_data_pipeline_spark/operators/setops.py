"""Set operations (SURVEY.md §2.6 U1/U2).

unionByName everywhere — the reference concatenates Python lists
(review-crawler/storage_manager.py:44-45); positional union silently
mis-binds columns after schema drift, name-based union does not.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(frames: list[DataFrame], allow_missing: bool = False) -> DataFrame:
    """U2 (restaurant-crawler/restaurant-crawler.py:365-369): merge per-page
    crawl frames; `allow_missing` tolerates partially-failed sources the way
    hello.py:406-413 skips failed pages."""
    if not frames:
        raise ValueError("union_all of zero frames")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), frames)

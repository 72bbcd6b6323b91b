"""Spark 4 Python DataSource for a paginated remote feed (SURVEY.md §2.1
S1/S2 — the 'external ingest source' custom piece, §4 #1).

`spark.read.format("paginated_feed")` with options keys/pages plans one
InputPartition per (key, page) — the reference's asyncio.gather over
result pages (restaurant-crawler.py:354-369) becomes genuine Spark task
parallelism with retry/locality/speculation for free, and the source
composes with the rest of the plan (pushdown of LIMIT etc. via the
DataSource API).

The in-container feed is a deterministic generator (this environment has
no network); a real crawler swaps the body of `read()` — per-partition
client, high-water-mark option pushed into the fetch loop (R2/T3).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FEED_SCHEMA = "id string, place_id string, author string, content string, visit_date string"


class PaginatedFeedDataSource(DataSource):
    """Usage:
    spark.dataSource.register(PaginatedFeedDataSource)
    spark.read.format("paginated_feed")
         .option("keys", "p1,p2").option("pages", "4")
         .option("rows_per_page", "3").load()
    """

    @classmethod
    def name(cls) -> str:
        return "paginated_feed"

    def schema(self) -> str:
        return FEED_SCHEMA

    def reader(self, schema) -> "PaginatedFeedReader":
        return PaginatedFeedReader(self.options)


class PaginatedFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.keys = [k for k in str(options.get("keys", "")).split(",") if k]
        self.pages = int(options.get("pages", 1))
        self.rows_per_page = int(options.get("rows_per_page", 3))

    def partitions(self) -> list[InputPartition]:
        # one work unit per (key, page): the scheduler is the crawler pool
        return [
            InputPartition((key, page))
            for key in self.keys
            for page in range(1, self.pages + 1)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        key, page = partition.value
        for i in range(self.rows_per_page):
            # deterministic fake feed; a real impl fetches here
            yield (f"{key}-{page}-{i}", key, "작성자", f"내용 {i}", "7.25.금")

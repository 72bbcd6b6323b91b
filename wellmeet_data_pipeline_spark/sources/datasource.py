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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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

    def simpleStreamReader(self, schema) -> "PaginatedFeedStreamReader":
        return PaginatedFeedStreamReader(self.options)


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


class PaginatedFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the paginated feed (Spark 4 Python DataSource
    streaming API): the feed is an unbounded page sequence; each
    micro-batch advances a {"page": n} offset by `pages_per_batch`,
    bounded by `max_pages` (the in-container generator's horizon — a
    real crawler would instead stop at the live head).  Offsets live in
    the query checkpoint, so restarts resume exactly where the last
    committed batch ended and `readBetweenOffsets` regenerates any
    replayed range deterministically — exactly-once end to end with a
    deterministic source, at-least-once with a real remote feed (the
    same contract as the landing-stream pipelines)."""

    def __init__(self, options: dict):
        self.keys = [k for k in str(options.get("keys", "")).split(",") if k]
        self.rows_per_page = int(options.get("rows_per_page", 3))
        self.pages_per_batch = int(options.get("pages_per_batch", 1))
        self.max_pages = int(options.get("max_pages", 4))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _rows(self, p0: int, p1: int):
        # a LIST iterator, not a generator: the engine's prefetch cache
        # copy.copy()s the returned iterator for offset replay, and
        # generators are not copyable
        return iter(
            [
                (f"{key}-{page}-{i}", key, "작성자", f"내용 {i}", "7.25.금")
                for key in self.keys
                for page in range(p0 + 1, p1 + 1)
                for i in range(self.rows_per_page)
            ]
        )

    def read(self, start: dict):
        p0 = int(start["page"])
        p1 = min(p0 + self.pages_per_batch, self.max_pages)
        return self._rows(p0, p1), {"page": p1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["page"]), int(end["page"]))

"""binaryFile source -> MEDIA_ASSET frames (SURVEY.md §2.11 multimodal).

Generalizes the reference's thumbnail handling — a URL string it stores
but never opens (restaurant-crawler/restaurant-crawler.py:217-224) —
into a first-class media ingest: `spark.read.format('binaryFile')`
reads a directory of media files as (path, modificationTime, length,
content) rows, splittable across executors, and this module maps them
onto the canonical MEDIA_ASSET schema the multimodal operators consume.

At 100 TB: binaryFile assigns whole files to tasks (media files don't
split mid-payload), so partition count tracks file count —
`pathGlobFilter` prunes by extension at the listing, and
`maxBytesPerPartition`-style packing comes from Spark's file scan
planner.  asset_id = xxhash64(path) is deterministic across runs and
retries; keep decoded features in narrow side tables (multimodal.py),
never next to the payload.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension -> media_type for the reference's asset classes
_MEDIA_TYPES = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image", "bmp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "avi": "video", "mkv": "video", "webm": "video",
}


def _media_type_col(path_col: str = "path"):
    ext = F.lower(F.element_at(F.split(F.col(path_col), r"\."), -1))
    mapping = F.create_map(*[F.lit(x) for kv in _MEDIA_TYPES.items() for x in kv])
    return F.coalesce(mapping[ext], F.lit("binary"))


def read_media_assets(
    spark: SparkSession,
    directory: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of media files into the MEDIA_ASSET shape:
    (asset_id, media_type, payload, metadata).  asset_id is
    xxhash64(path) — stable across runs; metadata carries the file-level
    facts (path, size, mtime) as strings."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(directory)
    return raw.select(
        F.xxhash64("path").alias("asset_id"),
        _media_type_col().alias("media_type"),
        F.col("content").alias("payload"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("file_name"), F.element_at(F.split("path", "/"), -1),
            F.lit("length"), F.col("length").cast("string"),
            F.lit("modification_time"), F.date_format("modificationTime", "yyyy-MM-dd HH:mm:ss"),
        ).alias("metadata"),
    )


def write_media_fixtures(directory: str, files: dict[str, bytes]) -> None:
    """Test helper: materialize {name: payload} files under `directory`."""
    os.makedirs(directory, exist_ok=True)
    for name, payload in files.items():
        with open(os.path.join(directory, name), "wb") as f:
            f.write(payload)

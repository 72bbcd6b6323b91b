"""Multimodal column plumbing (SURVEY.md §2.11 north-star).

Media payloads are opaque `binary` columns + typed metadata (schemas.
MEDIA_ASSET) — Spark shuffles the bytes untouched and all decode /
feature-extraction runs in Arrow-batched mapInPandas.  The decode libs
(PIL/ffmpeg/librosa) are NOT in this container, so the real decoders are
stubbed behind NotImplementedError with a deterministic fake
implementation that keeps every piece of Spark-side plumbing (schema,
batch shape, partitioning) real and testable.

Generalizes the reference's thumbnail_url handling (restaurant-crawler.py
:217-224) from 'a URL string we never open' to a first-class media
pipeline.

At 100 TB: binary columns dominate row size — repartition by asset_id
range before wide stages so a few huge videos can't skew a partition, and
keep decoded features in separate (narrow) tables joined on asset_id
rather than carried next to the payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, sha256 string, "
    "width int, height int, n_frames int"
)


def decode_image(payload: bytes) -> "object":
    """Real decoder entry point — requires an image library not present in
    this container."""
    raise NotImplementedError("image decode requires PIL/cv2; not available in this environment")


def _fake_dimensions(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derive (width, height, n_frames)
    from a payload digest so tests are stable and the UDF batch shape is
    exercised end-to-end."""
    d = hashlib.sha256(payload or b"").digest()
    return 16 + d[0] % 64, 16 + d[1] % 64, 1 + d[2] % 8


def extract_features(assets: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """Decode/feature-extract over mapInPandas: one Arrow batch of binary
    payloads in, one narrow feature frame out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                payload = rec["payload"] or b""
                if use_fake_decoder:
                    w, h, nf = _fake_dimensions(payload)
                else:
                    decode_image(payload)  # pragma: no cover - stub
                    raise AssertionError("unreachable")
                rows.append(
                    {
                        "asset_id": rec["asset_id"],
                        "media_type": rec["media_type"],
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "asset_id", "media_type", "n_bytes", "sha256", "width", "height", "n_frames",
            ])

    return assets.select("asset_id", "media_type", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index,
    derived from the (fake-)decoded n_frames.  The explode happens on the
    narrow feature frame, never on the binary payload."""
    feats = extract_features(assets)
    return feats.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )


def dedup_assets_exact(assets: DataFrame) -> DataFrame:
    """Exact binary dedup: sha2 over the payload, keep lowest asset_id —
    the D3/D1 pattern applied to media bytes."""
    hashed = assets.withColumn("payload_sha", F.sha2(F.col("payload"), 256))
    keep = hashed.groupBy("payload_sha").agg(F.min("asset_id").alias("asset_id"))
    return assets.join(keep.select("asset_id"), "asset_id", "left_semi")

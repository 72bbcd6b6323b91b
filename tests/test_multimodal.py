from wellmeet_data_pipeline_spark.operators.multimodal import (
    dedup_assets_exact,
    extract_features,
    frame_sample_plan,
)


def _assets(spark):
    rows = [
        (1, "image", bytearray(b"payload-a"), {"src": "s1"}),
        (2, "image", bytearray(b"payload-a"), {"src": "s2"}),  # byte-identical dup
        (3, "video", bytearray(b"payload-b"), {"src": "s3"}),
    ]
    return spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary, metadata map<string,string>"
    )


def test_extract_features_deterministic(spark):
    feats = {r["asset_id"]: r for r in extract_features(_assets(spark)).collect()}
    assert feats[1]["sha256"] == feats[2]["sha256"]
    assert feats[1]["width"] == feats[2]["width"]
    assert feats[1]["n_bytes"] == 9
    assert feats[3]["sha256"] != feats[1]["sha256"]


def test_dedup_assets_exact(spark):
    kept = {r["asset_id"] for r in dedup_assets_exact(_assets(spark)).collect()}
    assert kept == {1, 3}


def test_frame_sample_plan(spark):
    rows = frame_sample_plan(_assets(spark), every_n=1).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert all(v == sorted(v) and v[0] == 0 for v in by_asset.values())

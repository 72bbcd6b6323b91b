from wellmeet_data_pipeline_spark.sinks.http import post_partitioned, post_report
from wellmeet_data_pipeline_spark.sinks.merge import merge_append, read_current


def _reviews(spark, rows):
    return spark.createDataFrame(rows, "id string, place_id string, content string")


def test_merge_append_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    b1 = _reviews(spark, [("r1", "p1", "v1"), ("r2", "p1", "v1"), ("r3", "p2", "v1")])
    merge_append(b1, store, batch_seq=0)
    # overlapping retry batch with a CHANGED payload for r2 — first version
    # must win (T4 idempotency)
    b2 = _reviews(spark, [("r2", "p1", "v2"), ("r4", "p2", "v1")])
    merge_append(b2, store, batch_seq=1)

    cur = read_current(spark, store)
    rows = {r["id"]: r["content"] for r in cur.collect()}
    assert rows == {"r1": "v1", "r2": "v1", "r3": "v1", "r4": "v1"}


def test_merge_append_replay_same_batch(spark, tmp_path):
    store = str(tmp_path / "store")
    b = _reviews(spark, [("r1", "p1", "v1")])
    merge_append(b, store, batch_seq=0)
    merge_append(b, store, batch_seq=0)  # at-least-once redelivery
    assert read_current(spark, store).count() == 1


def test_http_sink_errors_as_data(spark):
    df = spark.createDataFrame(
        [("1", "ok"), ("2", "boom"), ("3", "ok")], "id string, content string"
    )

    def poster(rec):
        if rec["content"] == "boom":
            raise ValueError("api rejected")

    results = post_partitioned(df, poster)
    report = post_report(results)
    assert report["total"] == 3
    assert report["success"] == 2
    assert report["failed"] == 1
    assert "ValueError" in report["errors"][0]


def test_compact_materializes_dedup(spark, tmp_path):
    from wellmeet_data_pipeline_spark.sinks.merge import compact

    store = str(tmp_path / "store_c")
    out = str(tmp_path / "store_compacted")
    merge_append(_reviews(spark, [("r1", "p1", "v1"), ("r2", "p1", "v1")]), store, batch_seq=0)
    merge_append(_reviews(spark, [("r2", "p1", "v2"), ("r3", "p2", "v1")]), store, batch_seq=1)
    compact(spark, store, out)
    cur = read_current(spark, out)
    rows = {r["id"]: r["content"] for r in cur.collect()}
    assert rows == {"r1": "v1", "r2": "v1", "r3": "v1"}


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from wellmeet_data_pipeline_spark.sinks.compact import compact_parquet

    src, dst = str(tmp_path / "many"), str(tmp_path / "few")
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    df.repartition(40).write.parquet(src)  # simulate micro-batch fragmentation
    n_files = compact_parquet(spark, src, dst, target_rows_per_file=500, sort_cols=["k"])
    assert n_files == 2
    import glob

    assert len(glob.glob(dst + "/part-*.parquet")) == 2
    out = spark.read.parquet(dst)
    assert out.count() == 1000
    assert sorted(r["k"] for r in out.collect()) == list(range(1000))

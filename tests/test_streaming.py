import json

from wellmeet_data_pipeline_spark.schemas import REVIEW
from wellmeet_data_pipeline_spark.sinks.merge import read_current
from wellmeet_data_pipeline_spark.streaming.pipeline import run_ingest_pipeline


def _drop(landing, name, rows):
    (landing / name).write_text(json.dumps(rows, ensure_ascii=False))


def test_streaming_ingest_idempotent(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    r = lambda i, p: {"id": f"h{i}", "place_id": p, "author": "a", "content": f"c{i}", "visit_date": "d"}
    _drop(landing, "p1.json", [r(1, "p1"), r(2, "p1"), r(2, "p1")])  # in-file dup
    _drop(landing, "p2.json", [r(3, "p2")])

    run_ingest_pipeline(spark, str(landing), store, ckpt, REVIEW)
    assert read_current(spark, store).count() == 3

    # second activation: one new file, one re-delivered id (T4)
    _drop(landing, "p1_again.json", [r(2, "p1"), r(4, "p1")])
    run_ingest_pipeline(spark, str(landing), store, ckpt, REVIEW)

    cur = read_current(spark, store)
    assert cur.count() == 4
    assert {row["id"] for row in cur.collect()} == {"h1", "h2", "h3", "h4"}

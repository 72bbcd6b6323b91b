"""fanout_small_scan (operators/skew.py): the r13 scale-adaptive scan
fan-out feeding the sha-heavy builders.

Pins the three contract points: a narrow frame is widened to cluster
parallelism, an already-wide frame passes through UNTOUCHED (the 100 TB
no-op path — no shuffle may ever be added at scale), and the rewrite
never changes operator results (MinHash signatures are partitioning-
invariant by construction; pinned anyway so a future edit can't make
the repartition semantic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.dedup import minhash_signatures_sha
from wellmeet_data_pipeline_spark.operators.skew import fanout_small_scan


def _docs(spark, n=40):
    rows = [(i, f"alpha beta gamma delta epsilon doc {i} tail {i % 7}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_narrow_frame_fans_out_to_parallelism(spark):
    d = _docs(spark).coalesce(1)
    out = fanout_small_scan(d)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # values untouched, only layout changed
    assert sorted(r.doc_id for r in out.collect()) == list(range(40))


def test_wide_frame_is_exact_noop(spark):
    par = spark.sparkContext.defaultParallelism
    d = _docs(spark).repartition(par + 3, "doc_id")
    out = fanout_small_scan(d)
    # same object back: no extra exchange is ever added at scale
    assert out is d


def test_min_partitions_override(spark):
    d = _docs(spark).coalesce(1)
    assert fanout_small_scan(d, min_partitions=3).rdd.getNumPartitions() == 3


def test_signatures_invariant_under_fanout(spark):
    d = _docs(spark).coalesce(1)
    base = {
        tuple(r) for r in minhash_signatures_sha(d.coalesce(1)).collect()
    }
    fanned = {tuple(r) for r in minhash_signatures_sha(fanout_small_scan(d)).collect()}
    assert base == fanned and len(base) == 40

from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.bucketing import bucketed_join, write_bucketed
from wellmeet_data_pipeline_spark.operators.skew import salted_count_sum, salted_join_small_side


def test_bucketed_join_elides_shuffle(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    write_bucketed(left, "t_left_b", ["k"], n_buckets=4)
    write_bucketed(right, "t_right_b", ["k"], n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path: broadcast would bypass bucketing on
        # tables this small, hiding what we're asserting
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "t_left_b", "t_right_b", ["k"])
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_left_b")
        spark.sql("DROP TABLE IF EXISTS t_right_b")


def test_salted_count_sum_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(500)] + [("cold", 1.0), ("cold", 2.0)],
        "key string, value double",
    )
    got = {
        r["key"]: (r["n_rows"], round(r["sum_value"], 6))
        for r in salted_count_sum(df, ["key"], "value").collect()
    }
    assert got["hot"] == (500, round(sum(float(i) for i in range(500)), 6))
    assert got["cold"] == (2, 3.0)


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("k1", i) for i in range(100)] + [("k2", 0)], "key string, payload int"
    )
    small = spark.createDataFrame([("k1", "dim1"), ("k2", "dim2"), ("k3", "dim3")], "key string, label string")
    out = salted_join_small_side(big, small, "key")
    assert out.count() == 101
    labels = {r["key"]: r["label"] for r in out.dropDuplicates(["key"]).collect()}
    assert labels == {"k1": "dim1", "k2": "dim2"}


def test_split_hot_cold_join_equals_plain_join(spark):
    from wellmeet_data_pipeline_spark.operators.skew import split_hot_cold_join

    big = spark.createDataFrame(
        [(1, "a")] * 50 + [(2, "b")] * 3 + [(3, "c")] * 2 + [(9, "x")],
        "k long, payload string",
    )
    dim = spark.createDataFrame(
        [(1, "hot-dim"), (2, "warm"), (3, "cool")], "dk long, attr string"
    )
    hot = spark.createDataFrame([(1,)], "k long")
    out = split_hot_cold_join(big, dim, "k", "dk", hot)
    plain = big.join(dim, big["k"] == dim["dk"], "inner")
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in plain.collect())
    assert a == b and len(a) == 55  # k=9 has no dim row, dropped both ways

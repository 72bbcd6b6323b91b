"""Behavioral pins for the round-10 operators — the properties the
oracle parity gate can't see (guarantees, bounds, determinism under
repartitioning)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# Winnowing
# ---------------------------------------------------------------------------

def test_winnowing_shared_run_guarantee(spark):
    """The paper's theorem: any shared word run of length >= w + k - 1
    (= 6 at the defaults) yields at least one SHARED fingerprint hash —
    matching is complete above the noise threshold."""
    from wellmeet_data_pipeline_spark.operators.dedup import winnowing_fingerprints

    shared = "quick brown foxes jump over lazy dogs"  # 7 words > 6
    d = _docs(
        spark,
        [
            (1, f"alpha beta {shared} gamma delta epsilon"),
            (2, f"one two three four {shared} five six"),
            (3, "completely different words nothing in common here at all"),
        ],
    )
    fp = winnowing_fingerprints(d).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 7-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])


def test_winnowing_density_and_window_coverage(spark):
    """Every w-window contributes a pick, so selected density is within
    [1/w, 1]; and every fingerprint is an actual gram position."""
    from wellmeet_data_pipeline_spark.operators.dedup import winnowing_fingerprints

    text = " ".join(f"w{i % 17}x{i % 5}" for i in range(60))
    d = _docs(spark, [(1, text)])
    fp = winnowing_fingerprints(d).collect()
    n_grams = 60 - 3 + 1
    n_windows = n_grams - 4 + 1
    assert n_windows / 4 <= len(fp) <= n_windows
    assert all(0 <= r["pos"] <= n_grams - 1 for r in fp)


# ---------------------------------------------------------------------------
# Rendezvous sharding
# ---------------------------------------------------------------------------

def test_rendezvous_movement_bound_and_stability(spark):
    from wellmeet_data_pipeline_spark.operators.sharding import (
        rendezvous_shard,
        reshard_movement,
    )

    d = spark.range(2000).select(F.col("id").alias("doc_id"))
    row = reshard_movement(d, 8, 9).collect()[0]
    assert row["n_docs"] == 2000
    # expected movement = 1/9 ~ 0.111; allow a generous band either side
    assert 0.06 <= row["n_moved"] / row["n_docs"] <= 0.18
    # keys that stay keep their EXACT shard (HRW stability, not re-balance)
    s8 = {r["doc_id"]: r["shard"] for r in rendezvous_shard(d, 8).collect()}
    s9 = {r["doc_id"]: r["shard"] for r in rendezvous_shard(d, 9).collect()}
    movers = {k for k in s8 if s8[k] != s9[k]}
    assert all(s9[k] == 8 for k in movers), "a moved key can only move TO the new shard"
    # balance: each of 9 shards gets roughly 1/9
    from collections import Counter

    counts = Counter(s9.values())
    assert len(counts) == 9 and min(counts.values()) > 2000 / 9 / 2


def test_rendezvous_deterministic_under_repartition(spark):
    from wellmeet_data_pipeline_spark.operators.sharding import rendezvous_shard

    d = spark.range(500).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, rendezvous_shard(d, 5).collect()))
    b = sorted(map(tuple, rendezvous_shard(d.repartition(13), 5).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Span corruption plan
# ---------------------------------------------------------------------------

def test_span_corruption_rate_and_bounds(spark):
    from wellmeet_data_pipeline_spark.operators.corpus import span_corruption_plan

    text = " ".join(f"t{i}" for i in range(207))  # 10 complete blocks + tail
    d = _docs(spark, [(1, text), (2, "short doc under one block"), (3, None)])
    plan = span_corruption_plan(d).collect()
    assert {r["doc_id"] for r in plan} == {1}  # short + null docs unmasked
    assert len(plan) == 10  # one span per complete block
    for r in plan:
        b = r["span_start"] // 20
        assert 0 <= b <= 9
        # the whole span stays inside its block
        assert r["span_start"] + r["span_len"] <= (b + 1) * 20
        assert r["span_len"] == 3
    # exactly 15% of complete-block tokens masked
    assert sum(r["span_len"] for r in plan) == 10 * 3


def test_span_corruption_is_pure_function_of_identity(spark):
    from wellmeet_data_pipeline_spark.operators.corpus import span_corruption_plan

    text = " ".join(f"q{i}" for i in range(100))
    d1 = _docs(spark, [(7, text)])
    d2 = _docs(spark, [(7, text)]).repartition(11)
    assert sorted(map(tuple, span_corruption_plan(d1).collect())) == sorted(
        map(tuple, span_corruption_plan(d2).collect())
    )


# ---------------------------------------------------------------------------
# Pareto frontier
# ---------------------------------------------------------------------------

def test_pareto_frontier_matches_quadratic_definition(spark):
    import random

    from wellmeet_data_pipeline_spark.operators.scoring import pareto_frontier

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 30), rng.randint(0, 30)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = sorted(r["id"] for r in pareto_frontier(df, "a", "b").collect())
    want = sorted(
        i
        for i, a, b in rows
        if not any(
            (a2 >= a and b2 >= b and (a2 > a or b2 > b)) for _, a2, b2 in rows
        )
    )
    assert got == want and got  # non-empty frontier, exact match


def test_pareto_frontier_keeps_equal_ties(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import pareto_frontier

    df = spark.createDataFrame(
        [(1, 5, 5), (2, 5, 5), (3, 4, 4)], "id long, a long, b long"
    )
    got = sorted(r["id"] for r in pareto_frontier(df, "a", "b").collect())
    assert got == [1, 2]


# ---------------------------------------------------------------------------
# Pigeonhole exact hamming pairs
# ---------------------------------------------------------------------------

def test_hamming_exact_pairs_complete_vs_bruteforce(spark):
    """The pigeonhole join must return EXACTLY the brute-force hamming
    pair set — completeness is the operator's whole claim."""
    import random

    from wellmeet_data_pipeline_spark.operators.similarity import hamming_exact_pairs

    rng = random.Random(5)
    vecs = []
    for i in range(80):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        vecs.append((i, v))
    # plant close pairs: copies of vec 0 with 1..7 flipped dims
    for d in range(1, 8):
        v = list(vecs[0][1])
        for j in range(d):
            v[j * 9] = -v[j * 9]
        vecs.append((1000 + d, v))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_exact_pairs(df, d_max=6).collect()
    )

    def bits(v):
        return [1 if x > 0 else 0 for x in v]

    want = []
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            a, b = vecs[i], vecs[j]
            ia, ib = sorted((a[0], b[0]))
            va = a[1] if a[0] == ia else b[1]
            vb = b[1] if b[0] == ib else a[1]
            h = sum(x != y for x, y in zip(bits(va), bits(vb)))
            if h <= 6:
                want.append((ia, ib, h))
    assert got == sorted(want)
    # the d=7 plant is excluded, the d<=6 plants are all present
    found = {(a, b) for a, b, _ in got}
    assert all((0, 1000 + d) in found for d in range(1, 7))
    assert (0, 1007) not in found


# ---------------------------------------------------------------------------
# Cluster-quality reads
# ---------------------------------------------------------------------------

def test_kmeans_silhouette_separated_vs_degenerate(spark):
    from wellmeet_data_pipeline_spark.operators.similarity import kmeans_silhouette

    # two tight, well-separated blobs around the two seeds (ids 0 and 1)
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0])]
    rows += [(10 + i, [0.1 * i, 0.0]) for i in range(4)]
    rows += [(20 + i, [10.0, 10.0 - 0.1 * i]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["cluster_id"]: r for r in kmeans_silhouette(df, k=2).collect()}
    assert set(got) == {0, 1}
    assert all(r["mean_silhouette_micro"] > 900_000 for r in got.values())
    # duplicate seeds: every point equidistant to both -> s = 0 everywhere
    dup = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    g2 = {r["cluster_id"]: r["mean_silhouette_micro"]
          for r in kmeans_silhouette(dup, k=2).collect()}
    assert g2 == {0: 0}  # all points tie to seed 0; a == b -> s = 0


def test_cluster_label_purity_majority_and_ties(spark):
    from wellmeet_data_pipeline_spark.operators.similarity import cluster_label_purity

    rows = [
        (0, [0.0, 0.0], 5),     # seed 0
        (1, [10.0, 0.0], 7),    # seed 1
        (2, [0.1, 0.0], 5),
        (3, [0.2, 0.0], 5),
        (4, [0.3, 0.0], 9),     # minority in cluster 0
        (5, [10.1, 0.0], 3),    # cluster 1: labels {7, 3} tie 1-1
        (6, [10.2, 0.0], None), # null label excluded entirely
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["cluster_id"]: r for r in cluster_label_purity(df, k=2).collect()}
    assert got[0]["n_members"] == 4 and got[0]["top_label"] == 5
    assert got[0]["purity_micro"] == 750_000
    assert got[1]["n_members"] == 2 and got[1]["top_label"] == 3  # tie -> lowest label
    assert got[1]["purity_micro"] == 500_000

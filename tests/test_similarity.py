from wellmeet_data_pipeline_spark.operators.similarity import brute_force_top_k, ivf_top_k


def _vecs(spark):
    # two tight clusters + one outlier
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.95, 0.05, 0.0]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.9, 0.1]),
        (99, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_top1_finds_cluster_mate(spark):
    df = _vecs(spark)
    got = {r["query_id"]: r["neighbor_id"] for r in brute_force_top_k(df, df, k=1).collect()}
    # v3=(0.95,.05) sits between v1=(1,0) and v2=(0.9,.1): nearest to v3 is v1
    assert got[2] == 3 and got[3] == 1
    assert got[10] == 11 and got[11] == 10


def test_brute_force_excludes_self_and_ranks(spark):
    df = _vecs(spark)
    rows = brute_force_top_k(df, df, k=3).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_ivf_matches_bruteforce_on_separated_clusters(spark):
    df = _vecs(spark)
    # centroids: ids % 1 == 0 → all candidates, capped at 3 lowest ids
    ivf = ivf_top_k(df, k=1, n_centroids=3, nprobe=3, seed_mod=1)
    bf = brute_force_top_k(df, df, k=1)
    got_ivf = {r["query_id"]: r["neighbor_id"] for r in ivf.collect()}
    got_bf = {r["query_id"]: r["neighbor_id"] for r in bf.collect()}
    assert got_ivf == got_bf


def test_ivf_kmeans_refinement_matches_bruteforce(spark):
    from wellmeet_data_pipeline_spark.operators.similarity import brute_force_top_k, ivf_top_k

    df = _vecs(spark)
    ivf = ivf_top_k(df, k=1, n_centroids=3, nprobe=2, seed_mod=1, kmeans_iters=2)
    bf = brute_force_top_k(df, df, k=1)
    got_ivf = {r["query_id"]: r["neighbor_id"] for r in ivf.collect()}
    got_bf = {r["query_id"]: r["neighbor_id"] for r in bf.collect()}
    assert got_ivf == got_bf

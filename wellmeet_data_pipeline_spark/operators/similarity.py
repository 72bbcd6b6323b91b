"""Similarity search over embedding columns (SURVEY.md §2.11 north-star).

Two tiers:
- brute_force_top_k: exact cosine top-k. The pair space is formed by a
  join, the per-pair dot product runs JVM-side (functions.vectors), and
  the top-k cut is a rank window — i.e. shuffle(query block) x broadcast
  (candidate block) + heap, never a driver-side loop.
- ivf_top_k: IVF-style approximate search — kmeans-lite centroid
  assignment (deterministic seeded sample as centroids), probe only the
  nprobe nearest centroid buckets. The bucket join is the scale path:
  at 100 TB the candidate side is partitioned by centroid_id and only
  probed buckets shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.functions.vectors import cosine_similarity, dot, l2_norm


def brute_force_top_k(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query row.

    Normalizes both sides once (norm computed in the scan projection, not
    per pair), broadcasts the smaller candidate side when Catalyst sizes
    allow, ranks with (sim desc, cand_id asc) so ties are deterministic.
    Excludes self-matches on id equality."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
    )
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_norm"),
    )
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), round_digits).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_top_k(
    data: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 131,
) -> DataFrame:
    """IVF-flat approximate self-top-k: centroids are a deterministic sample
    (vec_id % seed_mod picks ~N/seed_mod rows, capped at n_centroids by
    lowest id — reproducible without Math.random). Every vector is assigned
    to its nearest centroid; each query probes its `nprobe` nearest
    centroids' buckets only. Recall < 1, cost ~ nprobe/n_centroids of
    brute force — the 100 TB path."""
    centroids = (
        data.filter((F.col(id_col) % seed_mod) == 0)
        .orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec"))
    )

    vecs = data.select(F.col(id_col), F.col(vec_col), l2_norm(vec_col).alias("norm"))

    # rank centroids per vector (broadcast: n_centroids rows)
    ranked = (
        vecs.crossJoin(F.broadcast(centroids))
        .withColumn("c_sim", cosine_similarity(vec_col, "centroid_vec"))
        .withColumn(
            "c_rank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("c_sim").desc(), F.col("centroid_id").asc())
            ),
        )
    )
    assignment = ranked.filter(F.col("c_rank") == 1).select(id_col, "centroid_id")
    probes = ranked.filter(F.col("c_rank") <= nprobe).select(
        F.col(id_col).alias("query_id"), F.col("centroid_id")
    )

    cand = vecs.join(assignment, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"),
        "centroid_id",
    )
    q = vecs.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), F.col("norm").alias("q_norm")).join(
        probes, "query_id"
    )
    pairs = q.join(cand, "centroid_id").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6).alias("cosine_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )

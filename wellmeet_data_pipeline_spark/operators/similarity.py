"""Similarity search over embedding columns (SURVEY.md §2.11 north-star).

Two tiers:

- brute_force_top_k: exact cosine top-k.  The candidate block is collected
  and broadcast (the 'broadcast dim' pattern — embeddings tables that fit
  one executor), queries stream through mapInPandas, and the scoring is a
  single float64 matmul per Arrow batch.  Pure higher-order-function
  scoring (zip_with + aggregate per pair) measured ~20x slower — the
  lambdas are interpreted per element; BLAS is the right physical operator
  here, which is exactly what Pandas UDFs are for.

- ivf_top_k: IVF-flat approximate search, the 100 TB path.  Deterministic
  centroids, every vector assigned to its nearest centroid, queries probe
  only their nprobe nearest centroid buckets.  The bucket-local scoring is
  a cogrouped applyInPandas on centroid_id: candidates shuffle once on
  centroid, probes shuffle once on centroid, and each group does a local
  numpy top-k — cost ~ nprobe/n_centroids of brute force, no quadratic
  pair blowup anywhere.

Determinism: similarities rounded before ranking, ties broken by
neighbor_id, so results are stable across partitionings and match the
DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _matrix(series: pd.Series) -> np.ndarray:
    return np.vstack(series.to_numpy()).astype(np.float64)


def _topk_block(
    qids: np.ndarray, Q: np.ndarray, cids: np.ndarray, C: np.ndarray, k: int, round_digits: int
) -> pd.DataFrame:
    """Exact top-k of Q against C (both unnormalized), excluding id-equal
    pairs. Scoring matches the oracle formula dot/(|a||b|) with float64."""
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    S = np.round((Q @ C.T) / (qn @ cn.T), round_digits)
    out_q, out_n, out_s, out_r = [], [], [], []
    for r in range(S.shape[0]):
        mask = cids != qids[r]
        ids_m, sims_m = cids[mask], S[r][mask]
        order = np.lexsort((ids_m, -sims_m))[:k]
        kk = len(order)
        out_q.append(np.full(kk, qids[r]))
        out_n.append(ids_m[order])
        out_s.append(sims_m[order])
        out_r.append(np.arange(1, kk + 1, dtype=np.int32))
    if not out_q:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine_sim": [], "rank": []})
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "cosine_sim": np.concatenate(out_s),
            "rank": np.concatenate(out_r),
        }
    )


_TOPK_SCHEMA = "query_id long, neighbor_id long, cosine_sim double, rank int"


def brute_force_top_k(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query row (self-matches on id
    equality excluded).  Candidates are broadcast; at a scale where they
    don't fit, loop candidate blocks keeping a running top-k per query (or
    switch to ivf_top_k)."""
    spark = queries.sparkSession
    cand_pd = candidates.select(F.col(cand_id).alias("id"), F.col(vec_col).alias("v")).toPandas()
    bc = spark.sparkContext.broadcast((cand_pd["id"].to_numpy(), _matrix(cand_pd["v"])))

    def score(batches):
        cids, C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield _topk_block(
                pdf["qid"].to_numpy(), _matrix(pdf["v"]), cids, C, k, round_digits
            )

    q = queries.select(F.col(query_id).alias("qid"), F.col(vec_col).alias("v"))
    return q.mapInPandas(score, _TOPK_SCHEMA)


def _kmeans_refine(
    vecs: DataFrame, cent_ids: np.ndarray, C: np.ndarray, iters: int
) -> np.ndarray:
    """Spherical k-means refinement of the centroid matrix, distributed:
    each iteration is one assignment pass (mapInPandas vs the broadcast
    centroids) + an element-wise mean via posexplode/groupBy — only
    n_centroids x dim scalars ever reach the driver.  Deterministic given
    the deterministic init."""
    spark = vecs.sparkSession
    dim = C.shape[1]
    for _ in range(iters):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        bc = spark.sparkContext.broadcast((cent_ids, Cn))

        def assign(batches):
            cids, Cn_ = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                Q = _matrix(pdf["v"])
                Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
                best = np.argmax(Qn @ Cn_.T, axis=1)
                out = pdf[["v"]].copy()
                out["centroid_id"] = cids[best]
                yield out[["centroid_id", "v"]]

        assigned = vecs.mapInPandas(assign, "centroid_id long, v array<float>")
        means = (
            assigned.select("centroid_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_C = C.copy()
        by_cid = {int(cid): i for i, cid in enumerate(cent_ids)}
        got = np.zeros((len(cent_ids), dim))
        seen = np.zeros(len(cent_ids), dtype=bool)
        for r in means:
            i = by_cid[int(r["centroid_id"])]
            got[i, int(r["pos"])] = r["m"]
            seen[i] = True
        new_C[seen] = got[seen]  # empty clusters keep their old centroid
        C = new_C
    return C


def ivf_top_k(
    data: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_mod: int = 131,
    round_digits: int = 6,
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-flat approximate self-top-k.

    Centroids: deterministic sample (id % seed_mod == 0, lowest ids) —
    reproducible without RNG — optionally refined by `kmeans_iters`
    rounds of distributed spherical k-means (tighter buckets → higher
    recall at the same nprobe).  Assignment + probe list come from one
    mapInPandas pass against the broadcast centroid matrix; bucket-local
    exact scoring is a cogrouped applyInPandas on centroid_id; a final
    rank window merges the nprobe buckets per query."""
    spark = data.sparkSession
    cent_pd = (
        data.filter((F.col(id_col) % seed_mod) == 0)
        .orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))
        .toPandas()
    )
    cent_ids, C = cent_pd["cid"].to_numpy(), _matrix(cent_pd["v"])
    if kmeans_iters:
        C = _kmeans_refine(
            data.select(F.col(vec_col).alias("v")), cent_ids, C, kmeans_iters
        )
    bc = spark.sparkContext.broadcast((cent_ids, C))

    def rank_centroids(batches):
        cids, C = bc.value
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = _matrix(pdf["v"])
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            S = Qn @ Cn.T
            ids = pdf["id"].to_numpy()
            out = []
            for r in range(S.shape[0]):
                order = np.lexsort((cids, -S[r]))[:nprobe]
                for rank, j in enumerate(order, start=1):
                    out.append((ids[r], int(cids[j]), rank))
            yield pd.DataFrame(out, columns=["id", "centroid_id", "c_rank"])

    vecs = data.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    ranked = vecs.mapInPandas(rank_centroids, "id long, centroid_id long, c_rank int")

    assign = ranked.filter(F.col("c_rank") == 1).select("id", "centroid_id")
    probe_keys = ranked.filter(F.col("c_rank") <= nprobe).select("id", "centroid_id")
    # ranked derives from vecs, so qualify the re-join explicitly to avoid
    # ambiguous-lineage resolution
    cand = (
        vecs.alias("cv")
        .join(assign.alias("ca"), F.col("cv.id") == F.col("ca.id"))
        .select(F.col("cv.id").alias("id"), F.col("cv.v").alias("v"), F.col("ca.centroid_id").alias("centroid_id"))
    )
    probes = (
        vecs.alias("pv")
        .join(probe_keys.alias("pk"), F.col("pv.id") == F.col("pk.id"))
        .select(F.col("pv.id").alias("id"), F.col("pv.v").alias("v"), F.col("pk.centroid_id").alias("centroid_id"))
    )

    def bucket_topk(key, probe_pdf: pd.DataFrame, cand_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(probe_pdf) == 0 or len(cand_pdf) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine_sim": [], "rank": []})
        return _topk_block(
            probe_pdf["id"].to_numpy(),
            _matrix(probe_pdf["v"]),
            cand_pdf["id"].to_numpy(),
            _matrix(cand_pdf["v"]),
            k,
            round_digits,
        )

    bucket_results = (
        probes.groupBy("centroid_id")
        .cogroup(cand.groupBy("centroid_id"))
        .applyInPandas(bucket_topk, _TOPK_SCHEMA)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        bucket_results.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_dup_pairs(
    data: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    id_type: str = "long",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b) with rounded
    cosine >= threshold.  Same broadcast + Arrow-batch matmul shape as
    brute_force_top_k; at a scale where the candidate block can't
    broadcast, run it per IVF bucket instead (ivf_top_k's cogroup)."""
    spark = data.sparkSession
    cand_pd = data.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).toPandas()
    bc = spark.sparkContext.broadcast((cand_pd["id"].to_numpy(), _matrix(cand_pd["v"])))

    def score(batches):
        cids, C = bc.value
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = _matrix(pdf["v"])
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            S = np.round(Qn @ Cn.T, round_digits)
            qids = pdf["id"].to_numpy()
            out_a, out_b, out_s = [], [], []
            for r in range(S.shape[0]):
                mask = (cids > qids[r]) & (S[r] >= threshold)
                out_a.append(np.full(int(mask.sum()), qids[r]))
                out_b.append(cids[mask])
                out_s.append(S[r][mask])
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else [],
                    "id_b": np.concatenate(out_b) if out_b else [],
                    "cosine_sim": np.concatenate(out_s) if out_s else [],
                }
            )

    q = data.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return q.mapInPandas(score, f"id_a {id_type}, id_b {id_type}, cosine_sim double")

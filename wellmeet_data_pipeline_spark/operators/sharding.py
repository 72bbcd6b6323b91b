"""Deterministic shard-assignment operators (round 10).

Rendezvous (highest-random-weight) hashing assigns every key to the
shard whose sha256(salt|shard|key) digest is lexicographically largest.
The property that matters at 100 TB: when the shard count changes from
N to N+1, only ~1/(N+1) of keys move (each key moves only if the NEW
shard wins its rendezvous), versus ~N/(N+1) under `hash(key) % N` —
resharding a petabyte store becomes an incremental copy instead of a
full rewrite.  Generalizes the reference's one-object-per-place_id
layout (review-crawler/storage_manager.py:30) to a fixed shard fleet.

Implementation is a PURE PROJECTION: the N candidate digests are
computed per row and the argmax folds into a single expression — no
join, no shuffle, no UDF; Catalyst keeps it in whole-stage codegen.
Digest comparison is on fixed-width lowercase hex, so lexicographic
order is total, engine-independent, and ANSI-SQL-reproducible
(the hash_split discipline, corpus.py:281)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _digest(key: Column, shard: int, salt: str) -> Column:
    return F.sha2(
        F.concat_ws("|", F.lit(salt), F.lit(str(shard)), key.cast("string")), 256
    )


def rendezvous_shard(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    out_col: str = "shard",
) -> DataFrame:
    """Append `out_col` = the rendezvous winner in [0, n_shards).  Ties
    (cryptographically impossible, still pinned) go to the LOWEST shard:
    the winner is the first shard whose digest equals the max."""
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards} must be >= 1")
    key = F.col(id_col)
    digests = [_digest(key, s, salt) for s in range(n_shards)]
    mx = digests[0] if n_shards == 1 else F.greatest(*digests)
    winner = F.lit(n_shards - 1).cast("int")
    for s in range(n_shards - 2, -1, -1):
        winner = F.when(digests[s] == mx, F.lit(s).cast("int")).otherwise(winner)
    return df.withColumn(out_col, winner)


def reshard_movement(
    df: DataFrame,
    n_before: int,
    n_after: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """One-row audit of a shard-count change: how many keys move.
    Rendezvous gives E[moved] = |n_after - n_before| / max(n_before,
    n_after) of the corpus; modulo hashing would move almost everything.
    Output: (n_docs, n_moved, moved_micro)."""
    both = rendezvous_shard(
        rendezvous_shard(df, n_before, id_col, salt, "__s_before"),
        n_after,
        id_col,
        salt,
        "__s_after",
    )
    return both.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("__s_before") != F.col("__s_after"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved"),
    ).select(
        "n_docs",
        "n_moved",
        F.expr("n_moved * 1000000 div n_docs").cast("long").alias("moved_micro"),
    )

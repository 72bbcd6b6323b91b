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

from pyspark.sql import Column, DataFrame, Window
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


def file_compaction_plan(
    df: DataFrame,
    part_col: str,
    key_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Streaming-fill compaction plan: within each partition, walk the
    items in key order and open a new output file every time the
    running size crosses `target_bytes` — bin = exclusive-cumsum div
    target, the one-pass deterministic cousin of first-fit bin packing
    (greedy first-fit needs a sequential scan with state; the floor-of-
    cumsum form is pure window algebra, so both engines agree exactly
    and the plan parallelizes per partition).  This is the small-file
    compaction every lakehouse table needs scheduled: the output says
    which files to rewrite together and how full each compacted file
    lands.

    One partitioned window (cumsum within part_col, ordered by key_col
    — never global), one groupBy; all integer arithmetic except the
    fill ratio, one IEEE division micro-snapped.  Output per (partition,
    bin): n_items, bin_bytes, fill_micro (can exceed 1e6 when a single
    oversized item overflows its bin — those are the split candidates)."""
    w = (
        Window.partitionBy("part")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = (
        df.select(
            F.col(part_col).alias("part"),
            F.col(key_col).alias("k"),
            F.col(size_col).cast("long").alias("sz"),
        )
        .withColumn(
            "cum_before", F.coalesce(F.sum("sz").over(w), F.lit(0).cast("long"))
        )
        # integer floor division, NOT double / + cast: cumulative sizes
        # outgrow 2^53 long before they outgrow 2^63
        .withColumn("bin", F.expr(f"cum_before div {target_bytes}").cast("long"))
    )
    return (
        binned.groupBy("part", "bin")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("sz").cast("long").alias("bin_bytes"),
        )
        .select(
            F.col("part").alias(part_col),
            "bin",
            "n_items",
            "bin_bytes",
            F.expr(f"(bin_bytes * 1000000) div {target_bytes}")
            .cast("long")
            .alias("fill_micro"),
        )
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "ps1",
) -> DataFrame:
    """Deterministic weighted sample without replacement by PRIORITY
    SAMPLING (Ohlsson sequential Poisson / Duffield-Lund-Thorup): each
    item draws a uniform u from a salted sha256 of its key and takes
    priority q = u / w; the k smallest priorities are the sample.
    Heavier items draw proportionally smaller priorities, giving
    inclusion probabilities ~ min(1, w/tau) — the estimator behind
    weighted reservoir sampling, realized reproducibly (the repo's
    hash-split discipline: re-running the plan re-selects the SAME
    sample, and adding items never reshuffles survivors' priorities).

    u comes from the first 8 hex nibbles of sha256(salt|key) ((h+1)/2^32,
    never 0), so priority is ONE IEEE division of exact integers —
    bit-exact cross-engine, no transcendental (the u^(1/w) exponential-
    keys variant needs pow, which engines round differently at the last
    ulp).  Selection is a TakeOrdered top-k on (priority, key), never a
    global sort; priorities are emitted on a 1e-18 atto grid (one IEEE
    multiply + floor) because q ∈ [2.3e-10/w, 1/w] needs more than micro
    resolution.

    Returns (rank, key, weight, priority_atto), rank 1..k by ascending
    priority."""
    keyed = df.select(
        F.col(key_col).alias("k"), F.col(weight_col).cast("long").alias("w")
    ).filter(F.col("w") > 0)
    hx = F.sha2(F.concat_ws("|", F.lit(salt), F.col("k").cast("string")), 256)
    # first 8 hex nibbles -> 32-bit integer (Spark has conv(); the DuckDB
    # oracle spells the same decode with the strpos hex-nibble idiom)
    h32 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    u = (h32 + F.lit(1)).cast("double") / F.lit(4294967296.0)
    q = u / F.col("w").cast("double")
    ranked = (
        keyed.withColumn("q", q)
        .orderBy(F.col("q").asc(), F.col("k").asc())
        .limit(k)
    )
    return ranked.select(
        F.row_number()
        .over(Window.orderBy(F.col("q").asc(), F.col("k").asc()))
        .cast("long")
        .alias("rank"),
        F.col("k").alias(key_col),
        F.col("w").alias(weight_col),
        F.floor(F.col("q") * F.lit(1e18) + F.lit(0.5)).cast("long").alias(
            "priority_atto"
        ),
    )

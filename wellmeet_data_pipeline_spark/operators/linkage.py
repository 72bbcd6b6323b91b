"""Record linkage (fuzzy entity resolution) via deletion-neighborhood
split-blocking.

The reference pipeline links crawled records to canonical entities by
exact surrogate key (naver_crawler.py:172-177 sha identity;
restaurant_save.py insert-if-absent).  Real crawl streams also carry
*near*-keys — a name with one character lost in transcription — and the
naive fix is a cross join with an edit-distance filter: O(n·m), dead at
any scale.  The distributed form here is the classic split-block
pigeonhole:

  A single character DELETION at 0-based position p of a clean string
  of length n leaves the dirty string (length m = n-1) with either its
  first h = ceil(m/2) characters identical to the clean prefix (when
  p >= h) or its last s = m - h characters identical to the clean
  suffix (when p < h; sound because h + s = m < n).  So TWO equi-joins
  — on (m, prefix_h) and on (m, suffix_s) — cover every deletion
  position, and a cheap per-candidate `levenshtein` verify restores
  exactness.  Same candidates-by-equi-join / exactness-by-verify
  topology as the LSH and geo-grid families, with a pigeonhole
  completeness argument instead of a probabilistic one.

Scale posture: both sides stream through hash-partitioned equi-joins on
the block keys; candidate volume is O(n + m + collisions) for selective
keys (the verify predicate absorbs block collisions).  No cross join,
no driver collect.  Keys are computed per row, so variable-length names
block correctly without a global length assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _half_lengths(m):
    """(h, s) = (ceil(m/2), floor(m/2)) as integer columns."""
    h = F.floor((m + F.lit(1)) / F.lit(2)).cast("int")
    return h, (m - h).cast("int")


def _deletion_block_keys(df: DataFrame, name_col: str, m) -> DataFrame:
    """Attach the two split-block keys for a frame whose strings are the
    DIRTY length `m` (the dirty side passes length(name); the clean side
    passes length(name) - 1 so a clean string blocks with the dirty
    strings one deletion away)."""
    h, s = _half_lengths(m)
    c = F.col(name_col)
    return (
        df.withColumn("__m", m.cast("int"))
        .withColumn("__pre", c.substr(F.lit(1), h))
        # a deletion before position h leaves the last s characters
        # untouched, so the last s chars of dirty and clean align
        .withColumn("__suf", c.substr(F.length(c) - s + 1, s))
    )


def fuzzy_link_edit1(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str = "record_id",
    dirty_name: str = "record_name",
    clean_id: str = "entity_id",
    clean_name: str = "entity_name",
) -> DataFrame:
    """Link every dirty record to the clean entities whose name is one
    single-character deletion away (levenshtein distance 1 with
    length(clean) = length(dirty) + 1).

    Returns (dirty_id, clean_id, edit_dist) — one row per verified
    candidate pair.  Pairs surfaced by both block keys are emitted once.
    """
    # each side feeds BOTH block joins — checkpoint so an expensive
    # upstream lineage (normalization, extraction) runs once per side
    d = _deletion_block_keys(
        dirty.select(F.col(dirty_id).alias("__did"), F.col(dirty_name).alias("__dn"))
        .filter(F.col("__dn").isNotNull()),
        "__dn",
        F.length("__dn"),
    ).localCheckpoint(eager=True)
    c = _deletion_block_keys(
        clean.select(F.col(clean_id).alias("__cid"), F.col(clean_name).alias("__cn"))
        .filter(F.col("__cn").isNotNull()),
        "__cn",
        F.length("__cn") - F.lit(1),
    ).localCheckpoint(eager=True)
    pre = d.join(c, ["__m", "__pre"]).select("__did", "__dn", "__cid", "__cn")
    suf = d.join(c, ["__m", "__suf"]).select("__did", "__dn", "__cid", "__cn")
    cand = pre.unionByName(suf).distinct()
    dist = F.levenshtein(F.col("__dn"), F.col("__cn"))
    return cand.filter(dist <= 1).select(
        F.col("__did").alias(dirty_id),
        F.col("__cid").alias(clean_id),
        dist.cast("int").alias("edit_dist"),
    )


def edit_distance_neardup(
    docs: DataFrame,
    norm_col: str = "__norm",
    id_col: str = "doc_id",
    prefix_len: int = 10,
    cmp_len: int = 100,
    max_dist: int = 5,
) -> DataFrame:
    """Prefix-blocked edit-distance near-dup pairs over normalized
    document text: block on the first `prefix_len` characters, then
    verify candidates with an exact levenshtein over the first `cmp_len`
    characters, keeping pairs at distance ≤ `max_dist`.  The high-
    PRECISION companion of the MinHash family: token-set measures
    (Jaccard) call a reordered paragraph a dup, edit distance only fires
    on near-verbatim text — this is the pass that separates "same words"
    from "same bytes, small edits" (OCR noise, template fills, version
    bumps).

    Blocking is one equi-join on (prefix) — hash-partitioned, no cross
    join; the pigeonhole here is deliberate and DOCUMENTED: a pair
    differing inside its first `prefix_len` characters is missed by this
    pass and owned by the LSH candidates instead (the same blocked-
    candidates / exact-verify topology as deletion_neighborhood_link
    above, with a prefix block instead of a deletion-split block).
    Block skew = duplicate clusters sharing a prefix; the per-block
    quadratic is the same one the cluster's LSH verify already pays.
    levenshtein is evaluated JVM-side (codepoint-grain, identical to
    DuckDB's on the ASCII-normalized input).

    Returns (id_a, id_b, edit_dist) with id_a < id_b."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.substring(F.col(norm_col), 1, prefix_len).alias("blk"),
        F.substring(F.col(norm_col), 1, cmp_len).alias("cmp"),
    ).filter(F.length("blk") > 0)
    a = base.select(
        F.col("id").alias("id_a"), F.col("blk"), F.col("cmp").alias("cmp_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("blk"), F.col("cmp").alias("cmp_b")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein(F.col("cmp_a"), F.col("cmp_b")))
        .filter(F.col("edit_dist") <= max_dist)
        .select("id_a", "id_b", F.col("edit_dist").cast("long"))
    )

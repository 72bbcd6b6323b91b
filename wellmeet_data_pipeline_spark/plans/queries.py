"""Named query registry: every operator family from SURVEY.md §2 as a
(PySpark plan, DuckDB oracle SQL) pair over the driver's test tables.

Conventions (driver compare is row-count + schema + order-insensitive
value hash):
- every computed column is aliased IDENTICALLY in the Spark plan and the
  oracle SQL;
- double aggregates are round()ed (2 for sums, 4-6 for ratios) so
  accumulation-order ulp noise can't flip the hash;
- timestamps never appear raw in output — rendered with
  date_format/strftime to fixed strings;
- DuckDB sum(int) returns HUGEINT → always CAST(... AS BIGINT) in oracles;
- sums whose TRUE value has finite decimal granularity (money: cents x
  pct) are computed in exact-integer space — round each factor to its
  integer grid, multiply, sum (sums of integer-valued doubles are exact
  and order-independent below 2^53), divide once at the end — and the
  final round targets the value's own grid (4 dp for cents x pct), never
  a coarser one: a coarser round puts true values exactly ON the .xx5
  boundary, where Spark (decimal shortest-repr HALF_UP) and DuckDB
  (binary) round in different directions;
- ops that DuckDB cannot express (xxhash64-based MinHash/SimHash, IVF)
  register with oracle=None → driver's weaker rows-only check;
- NEVER write `\\s` in oracle regexes: Java's \\s is [ \\t\\n\\x0B\\f\\r]
  but DuckDB's RE2 \\s excludes \\x0B, so a generator seed that emits a
  vertical tab silently flips every token count (bit us in round 4:
  pack_sequences/corpus_end_to_end hash-mismatched on the driver's data
  while passing locally).  Oracles spell the Java set explicitly as
  [ \\t\\n\\r\\f\\x0B]; the Spark side keeps \\s (identical set in Java).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.catalog import table
from wellmeet_data_pipeline_spark.functions.text import (
    bpe_ish_token_count,
    cast_with_default,
    clean_address,
    document_fingerprint,
    extract_place_id,
    language_guess,
    quality_score,
    review_surrogate_id,
    token_count,
    url_decode,
)
from wellmeet_data_pipeline_spark.operators.aggregations import (
    conditional_counts,
    cube_counts,
    grouped_sample,
    rollup_counts,
)
from wellmeet_data_pipeline_spark.operators.dedup import (
    dedup_keep_first,
    distinct_keys,
    exact_dedup_documents,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from wellmeet_data_pipeline_spark.operators.joins import (
    anti_new_rows,
    enrich_dimension,
    high_water_mark_filter,
    insert_if_absent,
    semi_existing_rows,
)
from wellmeet_data_pipeline_spark.operators.corpus import (
    PII_PATTERNS,
    as_of_join,
    decontaminate,
    repetition_stats,
    scrub_pii,
    stratified_sample_exact,
    tfidf_top_terms,
)
from wellmeet_data_pipeline_spark.operators.similarity import brute_force_top_k, ivf_top_k
from wellmeet_data_pipeline_spark.operators.sort import top_k_per_group, top_n
from wellmeet_data_pipeline_spark.operators.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def _q(name: str, oracle: Optional[str], doc: str):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship — the reference's core incremental loop re-expressed set-based
# (SURVEY.md §3.2: state load → scan → dedup → anti join → enrich → agg)
# ---------------------------------------------------------------------------

_HWM = "2024-01-05"
_EV_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _event_surrogate():
    """D3 generalized to events: sha256(user_id|event_type|ts) — the exact
    shape of the reference's review id (naver_crawler.py:172-177)."""
    return F.sha2(
        F.concat_ws(
            "|",
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.date_format("ts", _EV_TS_FMT),
        ),
        256,
    )


@_q(
    "flagship_incremental_enrich",
    f"""
    WITH keyed AS (
      SELECT *, sha256(concat_ws('|', CAST(user_id AS VARCHAR), event_type,
                                 strftime(ts, '%Y-%m-%d %H:%M:%S.%f'))) AS surrogate
      FROM events
    ),
    new_events AS (SELECT * FROM keyed WHERE ts > TIMESTAMP '{_HWM}'),
    seen AS (SELECT surrogate FROM keyed WHERE ts <= TIMESTAMP '{_HWM}'),
    fresh AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY surrogate ORDER BY event_id) AS rn
        FROM new_events) WHERE rn = 1
    ),
    incoming AS (
      SELECT * FROM fresh f
      WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.surrogate = f.surrogate)
    )
    SELECT event_type, c_mktsegment,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM incoming JOIN customer ON user_id = c_custkey
    GROUP BY event_type, c_mktsegment
    """,
    "reference core loop: hwm scan filter (J3/T3) → sha2 surrogate (D3) → "
    "keep-first dedup (D1) → anti join vs seen set (J1) → broadcast dim "
    "enrich (J4) → grouped tallies (A1/A2)",
)
def flagship_incremental_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    keyed = ev.withColumn("surrogate", _event_surrogate())
    new_events = high_water_mark_filter(keyed, "ts", _HWM)
    seen = keyed.filter(F.col("ts") <= F.lit(_HWM).cast("timestamp")).select("surrogate")
    fresh = dedup_keep_first(new_events, "surrogate", "event_id")
    incoming = anti_new_rows(fresh, seen, "surrogate")
    cust = table(spark, sf_dir, "customer")
    joined = enrich_dimension(
        incoming.withColumnRenamed("user_id", "c_custkey"), cust, "c_custkey"
    )
    return joined.groupBy("event_type", "c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("c_custkey").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Aggregations (§2.7) — pricing summary, conditional counts, rollup/cube,
# grouped sample
# ---------------------------------------------------------------------------


@_q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100))) / 10000.0, 4) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1-shaped grouped aggregation (A1/A2 analytics form): filter "
    "pushed to scan, partial+final hash agg",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.round(F.col("l_extendedprice") * 100, 0) * (F.lit(100) - F.round(F.col("l_discount") * 100, 0))) / F.lit(10000.0), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "conditional_counts",
    """
    SELECT event_type,
           count(*) AS n_total,
           CAST(sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
           CAST(sum(CASE WHEN value >= 50 THEN 0 ELSE 1 END) AS BIGINT) AS n_failed
    FROM events GROUP BY event_type
    """,
    "A2 (save-reviews/lambda_function.py:60-98): success/failure tallies as "
    "one-pass sum(when)",
)
def q_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return conditional_counts(ev, F.col("value") >= 50, ["event_type"])


@_q(
    "grouped_sample",
    """
    SELECT event_type,
           array_to_string(list_sort(list(props))[1:3], ',') AS sample
    FROM events GROUP BY event_type
    """,
    "A4 (save-reviews/lambda_function.py:109-110): at most k payloads kept "
    "per group, deterministic via in-group sort",
)
def q_grouped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = grouped_sample(ev, ["event_type"], "props", 3)
    return out.select("event_type", F.array_join("sample", ",").alias("sample"))


@_q(
    "rollup_subtotals",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_measure
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "hierarchical subtotals — free Catalyst extension over the reference's "
    "flat tallies (§2.7)",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return rollup_counts(li, ["l_returnflag", "l_linestatus"], "l_quantity")


@_q(
    "cube_subtotals",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_measure
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "cube over both dims (§2.7 extension)",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return cube_counts(li, ["l_returnflag", "l_linestatus"], "l_quantity")


# ---------------------------------------------------------------------------
# Joins (§2.4)
# ---------------------------------------------------------------------------


@_q(
    "join_anti_new_rows",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal >= 1000
    )
    """,
    "J1 (restaurant-crawler.py:370-375): left_anti 'new rows only' filter",
)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    rich = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 1000).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return anti_new_rows(orders, rich, "o_custkey").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


@_q(
    "join_semi_existing",
    """
    SELECT o_orderkey, o_orderpriority
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    """,
    "J2's probe side (restaurant_save.py:78-91) as one left_semi instead of "
    "per-row SELECT ... LIMIT 1",
)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    big_items = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return semi_existing_rows(orders, big_items, ["o_orderkey"]).select(
        "o_orderkey", "o_orderpriority"
    )


@_q(
    "join_insert_if_absent",
    """
    WITH incoming AS (
      SELECT * FROM (
        SELECT p_name, p_brand, p_partkey, p_retailprice,
               row_number() OVER (PARTITION BY p_name ORDER BY p_partkey) AS rn
        FROM part WHERE p_size > 25) WHERE rn = 1
    ),
    existing AS (SELECT DISTINCT p_name FROM part WHERE p_retailprice > 1800)
    SELECT i.p_name, i.p_brand, i.p_partkey,
           round(i.p_retailprice, 2) AS p_retailprice
    FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.p_name = i.p_name)
    """,
    "J2/K2 (restaurant_save.py:72-130): insert-if-absent = in-batch "
    "keep-first dedup + anti join against the existing key set",
)
def q_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    incoming = (
        dedup_keep_first(part.filter(F.col("p_size") > 25), "p_name", "p_partkey")
        .select("p_name", "p_brand", "p_partkey", "p_retailprice")
    )
    existing = part.filter(F.col("p_retailprice") > 1800).select("p_name")
    out = incoming.join(existing.distinct(), "p_name", "left_anti")
    return out.select(
        "p_name", "p_brand", "p_partkey", F.round("p_retailprice", 2).alias("p_retailprice")
    )


@_q(
    "join_star_enrich",
    """
    SELECT r_name AS region, n_name AS nation,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    "J4 star-schema enrichment: fact ⋈ broadcast dims (nation/region always "
    "broadcastable), one shuffle for the agg only",
)
def q_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    nation = table(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    region = table(spark, sf_dir, "region").withColumnRenamed("r_regionkey", "n_regionkey")
    df = enrich_dimension(orders, cust, "o_custkey")
    df = enrich_dimension(df, nation, "c_nationkey")
    df = enrich_dimension(df, region, "n_regionkey")
    return (
        df.groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Dedup / distinct (§2.5)
# ---------------------------------------------------------------------------


@_q(
    "dedup_keep_first",
    """
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY event_id) AS rn
      FROM events) WHERE rn = 1
    """,
    "D1 (naver_crawler.py:249-252) made cluster-deterministic: keep the "
    "min-event_id row per (user_id, event_type)",
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return dedup_keep_first(ev, ["user_id", "event_type"], "event_id").select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )


@_q(
    "distinct_keys",
    "SELECT DISTINCT user_id, event_type FROM events",
    "D2 (submit-aws-batch-lambda/lambda_function.py:196-207): "
    "list(set(...)) → select().distinct()",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_keys(table(spark, sf_dir, "events"), ["user_id", "event_type"])


@_q(
    "surrogate_key_sha2",
    """
    SELECT c_custkey,
           sha256(concat_ws('|', c_name, c_mktsegment, CAST(c_custkey AS VARCHAR))) AS row_hash
    FROM customer
    """,
    "D3/F3/F4 (naver_crawler.py:172-177): sha256(concat_ws('|',...)) stable "
    "surrogate identity",
)
def q_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.sha2(
            F.concat_ws("|", F.col("c_name"), F.col("c_mktsegment"), F.col("c_custkey").cast("string")),
            256,
        ).alias("row_hash"),
    )


# ---------------------------------------------------------------------------
# Set operations (§2.6)
# ---------------------------------------------------------------------------

_HI = "o_totalprice > 150000"
_URG = "o_orderpriority = '1-URGENT'"


@_q(
    "union_distinct",
    f"""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE {_HI}
    UNION
    SELECT o_orderkey, o_orderstatus FROM orders WHERE {_URG}
    """,
    "U1/U2 (storage_manager.py:44-45; restaurant-crawler.py:365-369): "
    "unionByName of two frames + distinct",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    hi = o.filter(_HI).select("o_orderkey", "o_orderstatus")
    urg = o.filter(_URG).select("o_orderkey", "o_orderstatus")
    return hi.unionByName(urg).distinct()


@_q(
    "intersect_keys",
    f"""
    SELECT o_orderkey FROM orders WHERE {_HI}
    INTERSECT
    SELECT o_orderkey FROM orders WHERE {_URG}
    """,
    "set intersection (the reference's set-membership forms, §2.6)",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(_HI).select("o_orderkey").intersect(o.filter(_URG).select("o_orderkey"))
    )


@_q(
    "except_keys",
    f"""
    SELECT o_orderkey FROM orders WHERE {_HI}
    EXCEPT
    SELECT o_orderkey FROM orders WHERE {_URG}
    """,
    "set difference",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(_HI).select("o_orderkey").exceptAll(
        o.filter(_URG).select("o_orderkey")
    ).distinct()


# ---------------------------------------------------------------------------
# Sort / limit / top-k (§2.8)
# ---------------------------------------------------------------------------


@_q(
    "orderby_limit",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "O1+O2 (sort newest-first naver_crawler.py:161-169; limit "
    "save-reviews:65) — TakeOrderedAndProject, no global sort materialized",
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return top_n(o, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 10).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


@_q(
    "topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           CAST(rank_in_group AS INTEGER) AS rank_in_group
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_group
      FROM orders)
    WHERE rank_in_group <= 3
    """,
    "per-group top-k via rank window (O1-O3 generalized)",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    out = top_k_per_group(
        o, ["o_orderpriority"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3
    )
    return out.select(
        "o_orderpriority",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "rank_in_group",
    )


# ---------------------------------------------------------------------------
# Projections / validation / flatten (§2.3)
# ---------------------------------------------------------------------------


@_q(
    "project_rename_cast",
    """
    SELECT CAST(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS BIGINT) AS restaurantId,
           event_type AS content,
           sha256(concat_ws('|', CAST(event_id AS VARCHAR), event_type)) AS hash
    FROM events
    """,
    "P3 (save-reviews/lambda_function.py:69-73): rename + cast projection "
    "with F5 null-safe cast and F8 JSON field extraction",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.get_json_object("props", "$.k").try_cast("long").alias("restaurantId"),
        F.col("event_type").alias("content"),
        F.sha2(F.concat_ws("|", F.col("event_id").cast("string"), F.col("event_type")), 256).alias(
            "hash"
        ),
    )


@_q(
    "validate_required_fields",
    """
    SELECT event_id, k
    FROM (SELECT event_id,
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    WHERE k IS NOT NULL AND k >= 50
    """,
    "P4/P5 (submit-aws-batch-lambda:114-116): required-field predicate after "
    "schema-on-read extraction",
)
def q_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        ev.select("event_id", k.alias("k"))
        .filter(F.col("k").isNotNull() & (F.col("k") >= 50))
    )


@_q(
    "fillna_defaults",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), '') AS segment,
           round(coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0), 2) AS acctbal
    FROM customer
    """,
    "P7 (restaurant_save.py:94-114): null-coalescing defaults "
    "(address→'', lat/lon→0) — nulls synthesized via nullif since driver "
    "tables are dense",
)
def q_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("")).alias("segment"),
        F.round(
            F.coalesce(F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")), F.lit(0.0)),
            2,
        ).alias("acctbal"),
    )


@_q(
    "explode_flatten",
    """
    SELECT doc_id, unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS word
    FROM documents WHERE doc_id % 10 = 0
    """,
    "P8 (submit-aws-batch-lambda:86-91): nested lists → flat rows via "
    "explode",
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))


# ---------------------------------------------------------------------------
# Scalar functions (§2.9) — F1/F2 exercised on synthesized deterministic
# inputs (driver tables hold no Korean addresses/URLs; both sides build the
# same input from table keys)
# ---------------------------------------------------------------------------

_ADDR_SQL_PATTERN = (
    "([가-힣]+(?:특별시|광역시|특별자치시|도|특별자치도)?[ \\t\\n\\r\\f\\x0B]*"
    "[가-힣]+(?:시|군|구)[ \\t\\n\\r\\f\\x0B]*[가-힣0-9]+(?:읍|면|동|가|로|길)[ \\t\\n\\r\\f\\x0B]*[0-9-]+)"
)


@_q(
    "clean_address_regex",
    f"""
    SELECT c_custkey,
           trim(regexp_extract(
             concat('서울특별시 강남구 테헤란로 ', CAST(c_custkey % 400 + 1 AS VARCHAR),
                    ' 메종타워 ', CAST(c_custkey % 15 + 1 AS VARCHAR), '층'),
             '{_ADDR_SQL_PATTERN}', 1)) AS address
    FROM customer
    """,
    "F1 (restaurant-crawler.py:20-37): Korean road-address normalization "
    "regex, JVM regexp_extract instead of per-row Python",
)
def q_clean_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    origin = F.concat(
        F.lit("서울특별시 강남구 테헤란로 "),
        (F.col("c_custkey") % 400 + 1).cast("string"),
        F.lit(" 메종타워 "),
        (F.col("c_custkey") % 15 + 1).cast("string"),
        F.lit("층"),
    )
    return c.select("c_custkey", clean_address(origin).alias("address"))


@_q(
    "extract_place_id_regex",
    """
    SELECT p_partkey,
           regexp_extract(concat('https://map.naver.com/v5/entry/place/',
                                 CAST(p_partkey AS VARCHAR), '?c=15'),
                          '/place/(\\d+)', 1) AS place_id
    FROM part
    """,
    "F2 (restaurant-crawler.py:193-196): /place/(\\d+) URL id extraction",
)
def q_place_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://map.naver.com/v5/entry/place/"),
        F.col("p_partkey").cast("string"),
        F.lit("?c=15"),
    )
    return p.select("p_partkey", extract_place_id(url).alias("place_id"))


@_q(
    "url_decode_keys",
    """
    SELECT r_regionkey,
           replace(replace(concat('reviews%20', r_name, '+', CAST(r_regionkey AS VARCHAR), '.json'),
                   '+', ' '), '%20', ' ') AS decoded_key
    FROM region
    """,
    "F7 (submit-aws-batch-lambda:37): unquote_plus on S3 object keys — "
    "Spark url_decode; oracle hand-decodes the two escape forms present in "
    "the synthesized input",
)
def q_url_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    key = F.concat(
        F.lit("reviews%20"), F.col("r_name"), F.lit("+"), F.col("r_regionkey").cast("string"), F.lit(".json")
    )
    return r.select("r_regionkey", url_decode(key).alias("decoded_key"))


@_q(
    "format_keys",
    """
    SELECT printf('process-place-%d-page-%d', o_orderkey, CAST(o_orderkey % 4 + 1 AS BIGINT)) AS job_name
    FROM orders WHERE o_orderkey % 100 = 0
    """,
    "F9 (submit-aws-batch-lambda:168): deterministic job/key templating via "
    "format_string",
)
def q_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        F.format_string(
            "process-place-%d-page-%d", F.col("o_orderkey"), (F.col("o_orderkey") % 4 + 1)
        ).alias("job_name")
    )


@_q(
    "date_trunc_month",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY 1
    """,
    "derived date dimension (reference keeps dates as raw strings, "
    "naver_crawler.py:198-199 — we add real date semantics)",
)
def q_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Event-time windows (§2.10 T7)
# ---------------------------------------------------------------------------


@_q(
    "tumbling_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    "T7: tumbling 60-min event-time windows (epoch-aligned = hour-aligned)",
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return tumbling_window_agg(ev, "ts", 60, ["event_type"])


@_q(
    "sliding_window",
    """
    WITH anchored AS (
      SELECT date_trunc('hour', ts) + (CAST(minute(ts) AS INTEGER) // 30) * INTERVAL 30 MINUTE AS w0
      FROM events WHERE ts IS NOT NULL
    ),
    contrib AS (
      SELECT w0 AS wstart FROM anchored
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTE AS wstart FROM anchored
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events
    FROM contrib GROUP BY 1
    """,
    "T7: sliding 60/30-min windows — each event contributes to "
    "length/slide buckets",
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return sliding_window_agg(ev, "ts", 60, 30)


@_q(
    "session_window",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    ),
    sessioned AS (
      SELECT *, CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessioned GROUP BY user_id, session_seq
    """,
    "T7 session windows via gaps-and-islands (lag + running sum) — the "
    "batch twin of Structured Streaming session_window",
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return session_window_agg(ev, "ts", "user_id", 30)


# ---------------------------------------------------------------------------
# North-star: text analysis over documents (§2.11)
# ---------------------------------------------------------------------------

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\w \\t\\n\\r\\f\\x0B]', '', 'g'), "
    "'[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))"
)


@_q(
    "text_token_stats",
    """
    SELECT doc_id,
           CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z가-힣]+|[0-9]+|[^A-Za-z가-힣0-9 \\t\\n\\r\\f\\x0B]')) AS BIGINT) AS n_bpe_tokens,
           n_chars
    FROM documents
    """,
    "token counting: whitespace + BPE-ish regex lexemes (north-star text "
    "analysis)",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
        "n_chars",
    )


@_q(
    "text_quality_score",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars_d,
             CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END) AS DOUBLE) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\r\\f\\x0B]')) AS DOUBLE) AS n_punct,
             CAST(len(regexp_extract_all(text,
                  '(?i)\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS DOUBLE) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           round((least(n_tokens / 20.0, 1.0)
                + (1.0 - least(n_punct / greatest(n_chars_d, 1.0) * 5.0, 1.0))
                + least(n_stop / greatest(n_tokens, 1.0) * 10.0, 1.0)) / 3.0, 6) AS quality
    FROM m
    """,
    "heuristic quality scoring (length/punctuation/stopword-ratio rules, "
    "C4/Gopher-style) as pure built-ins",
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


# the language-ID heuristic as a SQL CASE — shared by the per-doc
# text_language_guess query and the lang_id_confusion evaluation
_LANG_GUESS_SQL = """CASE
             WHEN len(regexp_extract_all(text, '[가-힣]')) > 0 THEN 'ko'
             WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
             WHEN len(regexp_extract_all(text, '[Ѐ-ӿ]')) > 0 THEN 'ru'
             WHEN len(regexp_extract_all(text, '(?i)\\b(der|die|das|und|nicht|ist)\\b')) >= len(regexp_extract_all(text, '(?i)\\b(el|la|los|las|que|es|y)\\b'))
              AND len(regexp_extract_all(text, '(?i)\\b(der|die|das|und|nicht|ist)\\b')) >= len(regexp_extract_all(text, '(?i)\\b(le|les|des|est|une|et)\\b'))
              AND len(regexp_extract_all(text, '(?i)\\b(der|die|das|und|nicht|ist)\\b')) > len(regexp_extract_all(text, '(?i)\\b(the|and|is|of|to|it)\\b')) THEN 'de'
             WHEN len(regexp_extract_all(text, '(?i)\\b(el|la|los|las|que|es|y)\\b')) >= len(regexp_extract_all(text, '(?i)\\b(le|les|des|est|une|et)\\b'))
              AND len(regexp_extract_all(text, '(?i)\\b(el|la|los|las|que|es|y)\\b')) > len(regexp_extract_all(text, '(?i)\\b(the|and|is|of|to|it)\\b')) THEN 'es'
             WHEN len(regexp_extract_all(text, '(?i)\\b(le|les|des|est|une|et)\\b')) > len(regexp_extract_all(text, '(?i)\\b(the|and|is|of|to|it)\\b')) THEN 'fr'
             ELSE 'en'
           END"""


@_q(
    "text_language_guess",
    f"""
    SELECT doc_id, {_LANG_GUESS_SQL} AS lang_guess
    FROM documents
    """,
    "n-gram/marker-word language-ID heuristic (north-star)",
)
def q_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", language_guess("text").alias("lang_guess"))


@_q(
    "lang_id_confusion",
    f"""
    WITH g AS (SELECT lang, {_LANG_GUESS_SQL} AS lang_guess FROM documents),
    cm AS (
      SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
      FROM g GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM cm GROUP BY lang)
    SELECT cm.lang, cm.lang_guess, cm.n,
           round(CAST(cm.n AS DOUBLE) / t.nl, 6) AS frac_of_lang,
           cm.lang = cm.lang_guess AS is_correct
    FROM cm JOIN tot t USING (lang)
    """,
    "language-ID evaluation: confusion matrix of the heuristic against "
    "the table's ground-truth lang label, with per-truth-language "
    "fractions and a correctness flag — the quality report that decides "
    "whether the cheap scan-fused detector suffices or a model "
    "(pandas_udf) must replace it; the guess expression is the SAME "
    "shared SQL as text_language_guess so the two cannot drift",
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    g = d.select("lang", language_guess("text").alias("lang_guess"))
    cm = g.groupBy("lang", "lang_guess").agg(F.count("*").alias("n"))
    tot = cm.groupBy("lang").agg(F.sum("n").alias("__nl"))
    return cm.join(tot, "lang").select(
        "lang",
        "lang_guess",
        "n",
        F.round(F.col("n").cast("double") / F.col("__nl"), 6).alias("frac_of_lang"),
        (F.col("lang") == F.col("lang_guess")).alias("is_correct"),
    )


@_q(
    "lang_id_kappa",
    f"""
    WITH g AS (
      SELECT lang AS a, {_LANG_GUESS_SQL} AS b FROM documents
      WHERE lang IS NOT NULL
    ),
    gg AS (SELECT a, b FROM g WHERE b IS NOT NULL),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(CASE WHEN a = b THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_agree
      FROM gg
    ),
    ra AS (SELECT a, CAST(count(*) AS BIGINT) AS cnt FROM gg GROUP BY 1),
    cb AS (SELECT b, CAST(count(*) AS BIGINT) AS cnt FROM gg GROUP BY 1),
    s AS (
      SELECT CAST(coalesce(sum(CAST(ra.cnt AS HUGEINT) * cb.cnt), 0) AS HUGEINT)
               AS s
      FROM ra JOIN cb ON ra.a = cb.b
    )
    SELECT n_docs, n_agree,
           CASE WHEN n_docs > 0
                THEN CAST(CAST(n_agree AS HUGEINT) * 1000000 // n_docs AS BIGINT)
           END AS po_micro,
           CASE WHEN n_docs > 0
                THEN CAST(s * 1000000 // (CAST(n_docs AS HUGEINT) * n_docs)
                          AS BIGINT)
           END AS pe_micro,
           CASE WHEN CAST(n_docs AS HUGEINT) * n_docs - s <> 0
                THEN CAST((CAST(n_agree AS HUGEINT) * n_docs - s) * 1000000
                          // (CAST(n_docs AS HUGEINT) * n_docs - s) AS BIGINT)
           END AS kappa_micro
    FROM st CROSS JOIN s
    """,
    "Cohen's kappa between the lang-ID heuristic and the ground-truth "
    "label — chance-corrected agreement, the scalar verdict the "
    "confusion matrix (lang_id_confusion) doesn't give: accuracy that "
    "marginal label frequencies would produce for free scores ZERO.  "
    "Exact integers end-to-end ((agree*N - S)/(N^2 - S) on 128-bit "
    "decimals, micro grid; both engines' integer division truncates "
    "toward zero so negative kappas render identically); two map-side "
    "scalar aggs + one label-cardinality join",
)
def q_lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import cohens_kappa

    d = table(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    g = d.select(F.col("lang").alias("a"), language_guess("text").alias("b"))
    return cohens_kappa(g, "a", "b")


@_q(
    "script_mix_stats",
    """
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[가-힣]')) AS BIGINT) AS n_hangul,
             CAST(len(regexp_extract_all(text, '[一-鿿]')) AS BIGINT) AS n_cjk,
             CAST(len(regexp_extract_all(text, '[Ѐ-ӿ]')) AS BIGINT) AS n_cyrillic,
             CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin
      FROM documents
    ),
    t AS (SELECT *, n_hangul + n_cjk + n_cyrillic + n_latin AS total FROM c)
    SELECT doc_id, n_hangul, n_cjk, n_cyrillic, n_latin,
           CASE WHEN total = 0 THEN NULL
                ELSE round(CAST(greatest(n_hangul, n_cjk, n_cyrillic, n_latin)
                                AS DOUBLE) / total, 6) END AS dominant_share,
           (total > 0 AND greatest(n_hangul, n_cjk, n_cyrillic, n_latin)
                          < total * 0.9) AS is_mixed
    FROM t
    """,
    "per-document Unicode-script mix (code-switch detection for "
    "multilingual triage): per-script char counts as scan-fused JVM "
    "regexp_count, dominant-script share, mixed flag at the 90% "
    "threshold — the signal that routes a doc to per-language vs "
    "mixed-language processing",
)
def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import script_counts

    d = table(spark, sf_dir, "documents")
    c = d.select("doc_id", *script_counts("text"))
    total = (
        F.col("n_hangul") + F.col("n_cjk") + F.col("n_cyrillic") + F.col("n_latin")
    )
    dom = F.greatest("n_hangul", "n_cjk", "n_cyrillic", "n_latin")
    return c.select(
        "doc_id",
        "n_hangul",
        "n_cjk",
        "n_cyrillic",
        "n_latin",
        F.when(total == 0, F.lit(None).cast("double"))
        .otherwise(F.round(dom.cast("double") / total, 6))
        .alias("dominant_share"),
        ((total > 0) & (dom < total * F.lit(0.9))).alias("is_mixed"),
    )


@_q(
    "doc_fingerprint",
    f"SELECT doc_id, sha256({_NORM_SQL}) AS fingerprint FROM documents",
    "document fingerprinting: sha256 of normalized text (D3 generalized)",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", document_fingerprint("text").alias("fingerprint"))


@_q(
    "dedup_exact_documents",
    f"""
    WITH fp AS (SELECT doc_id, sha256({_NORM_SQL}) AS fingerprint FROM documents),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fingerprint)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d WHERE EXISTS (SELECT 1 FROM keep k WHERE k.doc_id = d.doc_id)
    """,
    "exact dedup over documents: fingerprint hash-groupBy, keep lowest id, "
    "semi-join back (only (hash,id) pairs ever shuffle)",
)
def q_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return exact_dedup_documents(d).select("doc_id", "lang", "source", "n_chars")


@_q(
    "ngram_jaccard_pairs",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shs
      FROM norm
    ),
    ex0 AS (SELECT doc_id, unnest(shs) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) <= 10000),
    ex AS (SELECT e.doc_id, e.shingle FROM ex0 e JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM ex GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM co
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.15
    """,
    "n-gram Jaccard near-dup pairs via inverted shingle index (only docs "
    "sharing a shingle ever meet — sub-quadratic); the oracle ENCODES the "
    "operator's document-frequency cap (shingles in >10k docs dropped "
    "from index AND set sizes) so parity holds at any scale, not just "
    "where the cap is inert",
)
def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.15)


@_q(
    "ngram_jaccard_pairs_lsh",
    None,
    "the SCALE tier of ngram_jaccard_pairs: MinHash-LSH candidate pairs "
    "drive the exact Jaccard verify, so intersection counting is linear "
    "in the candidate count instead of the shingle-DF² self-join; "
    "approximate candidate source (xxhash64 bands) → rows-only.  PAIRED "
    "EVIDENCE: ngram_jaccard_pairs is this query's hash-verified exact "
    "twin (same verify core), plus a pytest asserting pair-identical "
    "output to the exact form on this corpus",
)
def q_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import minhash_lsh_candidates

    d = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        d, threshold=0.15, candidates=minhash_lsh_candidates(d), max_shingle_df=None
    )


# rows-only (no ANSI-SQL twin: xxhash64 seeded hashing / IVF probing)


@_q(
    "dedup_minhash_lsh",
    None,
    "MinHash+LSH candidate pairs (shingle→minhash→band→bucket join); "
    "xxhash64-seeded, not DuckDB-expressible → rows-only check.  PAIRED "
    "EVIDENCE: dedup_minhash_lsh_sha is the hash-verified twin — same "
    "shingle/band/bucket plan with sha2-derived signatures both engines "
    "can compute (kept in the driver window so the evidence stays paired)",
)
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(d)


@_q(
    "dedup_simhash",
    None,
    "SimHash-64 hamming-ball near-dup pairs (banded-prefix LSH + "
    "bit_count(xor) verify); xxhash64-based → rows-only.  PAIRED "
    "EVIDENCE: dedup_simhash_sha is the hash-verified twin — identical "
    "banding/verify plan over sha2-derived bits",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        simhash_df,
        simhash_near_dup_pairs,
    )

    d = table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(simhash_df(d), max_hamming=3)


# ---------------------------------------------------------------------------
# North-star: similarity search over embeddings (§2.11)
# ---------------------------------------------------------------------------


@_q(
    "cosine_topk_bruteforce",
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    n AS (
      SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
    ),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, len(a.e) + 1),
                                           i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) AS cosine_sim
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    "exact brute-force cosine top-5 self-join over the embedding column — "
    "JVM-side zip_with/aggregate math, rank window cut",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return brute_force_top_k(e, e, k=5, round_digits=4)


@_q(
    "cosine_topk_exact_clustered",
    """
    WITH anchors AS (
      SELECT label,
             list_transform(arg_min(embedding, vec_id), x -> CAST(x AS DOUBLE)) AS a
      FROM embeddings WHERE embedding IS NOT NULL GROUP BY label
    ),
    v AS (
      SELECT e.vec_id,
             list_transform(range(1, len(e.embedding) + 1),
                            i -> an.a[i] * 0.75 + CAST(e.embedding[i] AS DOUBLE) * 0.25) AS e
      FROM embeddings e JOIN anchors an ON e.label = an.label
      WHERE e.embedding IS NOT NULL
    ),
    n AS (
      SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
    ),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, len(a.e) + 1),
                                           i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) AS cosine_sim
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    "exact cosine top-5 over the deterministic CLUSTERED embedding fixture "
    "(vectors pulled 0.75 toward their label anchor — the regime real "
    "embedding corpora live in); doubles as the recall truth set for the "
    "IVF tier in bench.py",
)
def q_cosine_topk_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import clustered_embeddings

    e = clustered_embeddings(table(spark, sf_dir, "embeddings"))
    return brute_force_top_k(e, e, k=5, round_digits=4)


@_q(
    "embedding_int8_stats",
    """
    WITH ex AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) t(i)
    ),
    st AS (SELECT pos, min(x) AS vmin, max(x) AS vmax FROM ex GROUP BY pos),
    j AS (
      SELECT ex.pos, st.vmin, st.vmax, ex.x,
             CASE WHEN st.vmax - st.vmin = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(floor((ex.x - st.vmin) / (st.vmax - st.vmin)
                                  * CAST(255 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                            AS DOUBLE)
             END AS q
      FROM ex JOIN st USING (pos)
    ),
    e AS (
      SELECT pos, vmin, vmax,
             CAST(floor(abs(x - (vmin + q * (vmax - vmin) / CAST(255 AS DOUBLE)))
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS eg
      FROM j
    )
    SELECT pos,
           round(min(vmin), 6) AS vmin,
           round(min(vmax), 6) AS vmax,
           round(CAST(sum(eg) AS DOUBLE) / count(*) / CAST(1000000 AS DOUBLE), 6)
             AS mean_abs_err,
           CAST(max(eg) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS max_abs_err
    FROM e GROUP BY pos
    """,
    "int8 scalar-quantization audit per embedding dimension: global "
    "(min, max) + round-trip reconstruction error at 256 levels — the "
    "decision frame for 1-byte/dim embedding storage; one corpus pass, "
    "dim-sized aggregations, micro-grid error sums",
)
def q_embedding_int8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import embedding_int8_stats

    return embedding_int8_stats(table(spark, sf_dir, "embeddings"))


@_q(
    "kmeans_cluster_step",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    seeds AS (SELECT vec_id AS sid, e AS se FROM v ORDER BY vec_id LIMIT 8),
    d AS (
      SELECT v.vec_id, s.sid,
             round(list_sum(list_transform(range(1, len(v.e) + 1),
                            i -> (v.e[i] - s.se[i]) * (v.e[i] - s.se[i]))), 4) AS dist
      FROM v CROSS JOIN seeds s
    ),
    best AS (
      SELECT vec_id, sid, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, sid) AS rn
      FROM d
    ),
    g AS (SELECT sid, CAST(round(dist * 10000) AS BIGINT) AS mi FROM best WHERE rn = 1)
    SELECT sid AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
           round(CAST(sum(mi) AS DOUBLE) / count(*) / CAST(10000 AS DOUBLE), 4)
             AS mean_dist
    FROM g GROUP BY sid
    """,
    "k-means over embeddings, the oracle-checkable first Lloyd step: "
    "k=8 lowest-id seeds broadcast (model-sized BNL join), nearest-seed "
    "assignment by squared L2 in pure JVM array math, per-cluster size "
    "+ exact-grid mean distance; the iterated trainer (_kmeans_refine) "
    "runs through ivf_top_k's kmeans_iters and is pytest-covered",
)
def q_kmeans_cluster_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import kmeans_assign_step

    return kmeans_assign_step(table(spark, sf_dir, "embeddings"), k=8)


@_q(
    "cosine_topk_ivf",
    None,
    "IVF-bucketed approximate top-k (probe nprobe nearest centroid buckets) "
    "— the 100 TB scale path; approximate → rows-only.  PAIRED EVIDENCE: "
    "cosine_topk_exact_clustered is the hash-verified exact tier on the "
    "SAME fixture, and bench emits ivf_recall_at_5 against it every round "
    "(1.0 in r8)",
)
def q_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF demonstrated at its REAL operating point: on the clustered
    # fixture (the regime embedding corpora live in — the raw synthetic
    # table is near-uniform in cosine space, the worst case for ANY
    # inverted-file index), probing 4 of 16 buckets reaches recall@5 ≈
    # 0.998 at ~0.4× brute-force wall time (sf0.1).  The stride-sampled
    # centroids are cluster members already, so k-means refinement
    # (available via kmeans_iters, unit-tested) buys nothing here and
    # its extra per-iteration jobs would dominate at this data size.
    # bench.py emits ivf_recall_at_5 against cosine_topk_exact_clustered
    # (the hash-verified exact tier on the SAME fixture) every round.
    from wellmeet_data_pipeline_spark.operators.similarity import clustered_embeddings

    # seed_mod pinned: 16 centroids exist at every SF (N >= 500 = 16*31),
    # and passing it avoids the N-count job — the only remaining driver
    # round-trip is the 16-row centroid sample itself
    e = clustered_embeddings(table(spark, sf_dir, "embeddings"))
    return ivf_top_k(
        e, k=5, n_centroids=16, nprobe=4, seed_mod=31, kmeans_iters=0, round_digits=4
    )


@_q(
    "cosine_topk_ivfpq",
    None,
    "IVF-PQ approximate top-k: coarse inverted file + product-quantization "
    "ADC candidate scoring + exact re-rank of the shortlist — the "
    "memory-resident index shape for 100 TB vector search (m bytes/vector "
    "instead of 4*dim); approximate → rows-only.  PAIRED EVIDENCE: "
    "cosine_topk_exact_clustered is the hash-verified exact tier on the "
    "SAME fixture; bench emits ivfpq_recall_at_5 against it every round "
    "(0.9998 in r8)",
)
def q_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same clustered fixture and probe budget as cosine_topk_ivf so the
    # two approximate tiers are directly comparable; PQ adds the
    # compressed-candidate scoring stage (16 uint8 codes per vector vs 64
    # floats — the standard PQ16x8 configuration).  bench.py emits
    # ivfpq_recall_at_5 against cosine_topk_exact_clustered every round.
    from wellmeet_data_pipeline_spark.operators.similarity import (
        clustered_embeddings,
        ivf_pq_top_k,
    )

    e = clustered_embeddings(table(spark, sf_dir, "embeddings"))
    # Operating point swept across all three SFs: 8-bit codebooks are
    # REQUIRED on the tight clustered fixture (coarser books can't rank
    # within-cluster neighbors: 16-code books scored recall 0.70 at
    # sf0.1), and oversample=32 (a 160-row exact re-rank per query —
    # negligible next to bucket scan cost) lands recall@5 at
    # 0.998/0.993/0.9998 for sf0.001/0.01/0.1.
    return ivf_pq_top_k(
        e, k=5, n_centroids=16, nprobe=4, seed_mod=31, m_subspaces=16, n_codes=256,
        oversample=32, round_digits=4,
    )


# ---------------------------------------------------------------------------
# Analytic window functions / pivot / grouping sets / scalar batteries —
# free Catalyst extensions beyond the reference's surface (SURVEY.md §2.7,
# §2.8 notes), all oracle-checked
# ---------------------------------------------------------------------------


@_q(
    "window_running_sum",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
           coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id),
                    CAST(0 AS BIGINT)) AS gap_us
    FROM events
    """,
    "running aggregate + lag gap per user — the analytic form of the "
    "reference's sequential 'time since last seen' reasoning (T2/T3)",
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_value"
        ),
        F.coalesce(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w), F.lit(0).cast("long")
        ).alias("gap_us"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@_q(
    "pivot_event_counts",
    """
    SELECT user_id,
           CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    "pivot (long→wide counts) with a fixed value list so the plan needs no "
    "value-discovery pass — the at-scale form of groupBy().pivot()",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .fillna(0, subset=_EVENT_TYPES)
    )


@_q(
    "grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "explicit grouping sets via the SQL surface (spark.sql over registered "
    "views) — §2.7 extension",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@_q(
    "customer_above_avg",
    """
    SELECT o_orderkey, n_orders
    FROM (
      SELECT o_orderkey,
             count(*) OVER (PARTITION BY o_custkey) AS n_orders,
             sum(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_sum,
             o_totalprice
      FROM orders)
    WHERE o_totalprice * n_orders > cust_sum
    """,
    "decorrelated 'orders above their customer average' via window count+sum"
    " — compared as price*n > sum so float summation-order noise (~1e-9) "
    "can't flip a comparison whose true granularity is 1 cent",
)
def q_customer_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.select(
            "o_orderkey",
            F.count("*").over(w).alias("n_orders"),
            F.sum("o_totalprice").over(w).alias("cust_sum"),
            "o_totalprice",
        )
        .filter(F.col("o_totalprice") * F.col("n_orders") > F.col("cust_sum"))
        .select("o_orderkey", "n_orders")
    )


@_q(
    "stats_by_type",
    """
    SELECT event_type,
           round(avg(value), 4) AS avg_value,
           round(stddev_samp(value), 4) AS stddev_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           round(median(value), 4) AS median_value
    FROM events GROUP BY event_type
    """,
    "statistical aggregates incl. exact median (interpolated) per group",
)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.stddev_samp("value"), 4).alias("stddev_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.median("value"), 4).alias("median_value"),
    )


@_q(
    "string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           substring(c_mktsegment, 1, 3) AS seg3,
           replace(c_name, '#', '-') AS name_dashed,
           CAST(length(c_name) AS INTEGER) AS name_len
    FROM customer
    """,
    "scalar string battery (F4/F6/F9 family): upper/lpad/substring/replace/"
    "length, all JVM built-ins",
)
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.length("c_name").alias("name_len"),
    )


@_q(
    "date_parts",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date
    FROM orders WHERE o_orderkey % 7 = 0
    """,
    "date-part extraction + interval arithmetic (the reference never parses "
    "dates — naver_crawler.py:198-199; we add real date semantics)",
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


@_q(
    "dedup_embedding_cosine",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    n AS (
      SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(range(1, len(a.e) + 1),
                                         i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) AS cosine_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(range(1, len(a.e) + 1),
                                        i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) >= 0.42
    """,
    "embedding-cosine near-dup pairs (threshold on rounded similarity) — "
    "the dense-vector member of the dedup family",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import embedding_near_dup_pairs

    e = table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e, threshold=0.42)


@_q(
    "json_typed_extract",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events WHERE props IS NOT NULL
    """,
    "F8 as typed schema-on-read: from_json with a declared struct (not "
    "string get_json_object) + derived banding",
)
def q_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import IntegerType, StructField, StructType

    ev = table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    props_schema = StructType([StructField("k", IntegerType())])
    parsed = ev.withColumn("p", F.from_json("props", props_schema))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_band"),
    )


_MINHASH_SHA_NH = 16
_MINHASH_SHA_BANDS = 4


def _minhash_sha_ctes() -> str:
    """Shared CTE chain: documents -> shingles -> sha256-family MinHash
    signature -> band buckets -> candidate pairs (as `pairs`)."""
    nh, bands = _MINHASH_SHA_NH, _MINHASH_SHA_BANDS
    rpb = nh // bands
    hcols = ",\n             ".join(
        f"min(substr(sha256(concat_ws('|', shingle, '{i}')), 1, 16)) AS h{i}" for i in range(nh)
    )
    band_selects = "\n      UNION ALL\n      ".join(
        "SELECT doc_id, {b} AS band, sha256(concat_ws('|', {cols})) AS bucket FROM sig".format(
            b=b, cols=", ".join(f"h{i}" for i in range(b * rpb, (b + 1) * rpb))
        )
        for b in range(bands)
    )
    return f"""norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                     i -> array_to_string(words[i:i+2], ' '))) AS shingle
        FROM norm)
    ),
    sig AS (
      SELECT doc_id,
             {hcols}
      FROM sh GROUP BY doc_id
    ),
    banded AS (
      {band_selects}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    )"""


def _minhash_sha_oracle() -> str:
    return f"""
    WITH {_minhash_sha_ctes()}
    SELECT id_a, id_b FROM pairs
    """


@_q(
    "dedup_minhash_lsh_sha",
    _minhash_sha_oracle(),
    "MinHash+LSH with a sha256-prefix hash family — bit-identical in ANSI "
    "SQL, so the full shingle→signature→band→bucket-join pipeline is "
    "oracle-verified (the xxhash64 variant stays the faster scale default)",
)
def q_minhash_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import minhash_lsh_candidates_sha

    d = table(spark, sf_dir, "documents")
    return minhash_lsh_candidates_sha(d)


@_q(
    "lsh_cost_estimate",
    f"""
    WITH {_minhash_sha_ctes()},
    bs AS (
      SELECT band, bucket, CAST(count(*) AS BIGINT) AS c
      FROM banded GROUP BY 1, 2
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(c) AS BIGINT) AS index_rows,
           CAST(sum(c * (c - 1) / 2) AS BIGINT) AS est_candidate_pairs,
           CAST(max(c) AS BIGINT) AS max_bucket
    FROM bs GROUP BY band
    """,
    "LSH join-cost estimator: per-band bucket histogram -> exact "
    "candidate-pair volume sum(c choose 2) + hottest bucket, computed "
    "from the INDEX rows alone (no pair join runs) — the planning read "
    "that decides whether to run the bucket self-join as-is, raise the "
    "band count, or cap hot buckets, before paying for it; the "
    "quadratic term is never materialized, only counted",
)
def q_lsh_cost_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        _sha_banded,
        minhash_signatures_sha,
    )

    d = table(spark, sf_dir, "documents")
    banded = _sha_banded(minhash_signatures_sha(d), "doc_id", 16, 4)
    bs = banded.groupBy("band", "bucket").agg(F.count("*").alias("c"))
    return bs.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.sum("c").alias("index_rows"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias(
            "est_candidate_pairs"
        ),
        F.max("c").alias("max_bucket"),
    )


@_q(
    "shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100))) / 10000.0, 4) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    "TPC-H Q3-shaped shipping-priority: selective dim filter broadcast "
    "into a fact-fact join, agg, TakeOrdered top-10",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    out = (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.round(F.col("l_extendedprice") * 100, 0) * (F.lit(100) - F.round(F.col("l_discount") * 100, 0))) / F.lit(10000.0), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )
    return out.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


@_q(
    "regional_volume",
    """
    SELECT r_name AS region, n_name AS nation,
           round(sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100))) / 10000.0, 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY r_name, n_name
    """,
    "TPC-H Q5-shaped regional volume: five joins, every dimension "
    "broadcast, single fact shuffle for the aggregation",
)
def q_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.round(F.col("l_extendedprice") * 100, 0) * (F.lit(100) - F.round(F.col("l_discount") * 100, 0))) / F.lit(10000.0), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@_q(
    "nation_pair_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           round(sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100))) / 10000.0, 4) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name, year(o_orderdate)
    """,
    "TPC-H Q7-shaped nation-pair volume: the same dim table joined twice "
    "under different roles (both broadcast), year derivation, one fact "
    "shuffle",
)
def q_nation_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("s_nk") != F.col("c_nk"))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("order_year"))
        .agg(F.round(F.sum(F.round(F.col("l_extendedprice") * 100, 0) * (F.lit(100) - F.round(F.col("l_discount") * 100, 0))) / F.lit(10000.0), 4).alias("volume"))
    )


@_q(
    "stats_correlation",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
    FROM lineitem GROUP BY l_returnflag
    """,
    "bivariate aggregates (corr / covar_samp) per group",
)
def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
    )


# ---------------------------------------------------------------------------
# Training-corpus curation (§2.11 north-star: the ops an LLM data pipeline
# runs over `documents`/`events` beyond dedup & similarity)
# ---------------------------------------------------------------------------

# synthetic PII injected identically on both sides so the scrub is actually
# exercised (the corpus text itself carries no emails/URLs)
_PII_TXT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com via https://site.example/p?id=' || CAST(doc_id AS VARCHAR) || "
    "' from 10.0.0.1 call +82 10-1234-5678 end'"
)
_SCRUB_SQL = _PII_TXT_SQL
for _pat, _tok in PII_PATTERNS:
    _SCRUB_SQL = f"regexp_replace({_SCRUB_SQL}, '{_pat}', '{_tok}', 'g')"


@_q(
    "scrub_pii",
    f"SELECT doc_id, {_SCRUB_SQL} AS clean_text FROM documents",
    "PII scrubbing: email/URL/IP/phone -> typed placeholders via a chain of "
    "JVM regexp_replace (RE2-compatible patterns shared byte-for-byte with "
    "the oracle); pre-training hygiene pass",
)
def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    with_pii = d.withColumn(
        "__txt",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via https://site.example/p?id="),
            F.col("doc_id").cast("string"),
            F.lit(" from 10.0.0.1 call +82 10-1234-5678 end"),
        ),
    )
    return scrub_pii(with_pii, "__txt", "clean_text").select("doc_id", "clean_text")


@_q(
    "decontaminate_benchmark",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                   i -> array_to_string(words[i:i+2], ' '))) AS shingle
      FROM norm
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0),
    contam AS (
      SELECT DISTINCT doc_id FROM sh WHERE shingle IN (SELECT shingle FROM bench)
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = d.doc_id)
    """,
    "benchmark decontamination (GPT-3/PaLM n-gram-overlap rule): drop corpus "
    "docs sharing any word 3-gram with the benchmark set; one shingle-keyed "
    "semi-join, benchmark side broadcast, document bodies never shuffle",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bench = d.filter((F.col("doc_id") % 37) == 0)
    return decontaminate(d, bench).select("doc_id", "lang", "source", "n_chars")


@_q(
    "gopher_repetition",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    gr AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(words) - 1, 0) + 1),
                                   i -> array_to_string(words[i:i+1], ' '))) AS g
      FROM norm
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
           round(1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) AS dup_ratio
    FROM gr GROUP BY doc_id
    """,
    "Gopher-rule repetition stats: per-doc duplicate word-2gram fraction "
    "(boilerplate/spam signal); one map-side-combined groupBy on doc_id",
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return repetition_stats(d, shingle_n=2)


@_q(
    "stratified_sample",
    """
    WITH ranked AS (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars FROM ranked WHERE rk <= ceil(n * 0.2)
    """,
    "deterministic stratified sampling: per-stratum rank by sha2(id) (a "
    "uniform retry-stable order), keep exactly ceil(20%) of each language — "
    "reproducible corpus subsetting df.sample() can't give",
)
def q_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    return stratified_sample_exact(d, ["lang"], 0.2)


@_q(
    "tfidf_top_terms",
    f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
    ),
    w2 AS (SELECT * FROM words WHERE term <> ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM w2 GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM w2),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             round(t.tf * ln(CAST(n_docs AS DOUBLE) / d.df), 6) AS tfidf
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN nd
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf, rank
    FROM ranked WHERE rank <= 3
    """,
    "TF-IDF top-3 terms per document: tf groupBy (doc, term), df groupBy "
    "(term), scalar N broadcast, rank window — corpus term profiling",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=3)


@_q(
    "asof_join_last_purchase",
    f"""
    WITH u AS (
      SELECT user_id, ts, 0 AS is_left, event_id, value
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS is_left, event_id, NULL AS value
      FROM events WHERE event_type = 'click'
    ),
    m AS (
      SELECT *,
        last_value(value IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts NULLS FIRST, is_left, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value,
        last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts NULLS FIRST, is_left, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
      FROM u
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           strftime(asof_ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           round(asof_value, 2) AS purchase_value
    FROM m WHERE is_left = 1
    """,
    "as-of join (most recent purchase at or before each click, per user): "
    "union + tagged sort + running last_value(ignorenulls) — ONE shuffle on "
    "the key instead of an O(n*m) inequality join; <= semantics, "
    "deterministic tiebreak by event_id",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    res = as_of_join(left, right, key="user_id", ts_col="ts", right_value="value", tiebreak="event_id")
    return res.select(
        "event_id",
        "user_id",
        F.date_format("ts", _EV_TS_FMT).alias("ts_s"),
        F.date_format("asof_ts", _EV_TS_FMT).alias("purchase_ts"),
        F.round("asof_value", 2).alias("purchase_value"),
    )


@_q(
    "corpus_quality_filter",
    f"""
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars_d,
             CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END) AS DOUBLE) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\r\\f\\x0B]')) AS DOUBLE) AS n_punct,
             CAST(len(regexp_extract_all(text,
                  '(?i)\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS DOUBLE) AS n_stop
      FROM documents
    ),
    q AS (
      SELECT doc_id, n_tokens,
             round((least(n_tokens / 20.0, 1.0)
                  + (1.0 - least(n_punct / greatest(n_chars_d, 1.0) * 5.0, 1.0))
                  + least(n_stop / greatest(n_tokens, 1.0) * 10.0, 1.0)) / 3.0, 6) AS quality
      FROM m
    ),
    fp AS (SELECT doc_id, sha256({_NORM_SQL}) AS fingerprint FROM documents),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fingerprint)
    SELECT d.doc_id, d.lang, d.source, CAST(q.n_tokens AS BIGINT) AS n_tokens, q.quality
    FROM documents d JOIN q USING (doc_id)
    WHERE q.quality >= 0.5 AND q.n_tokens BETWEEN 5 AND 500
      AND EXISTS (SELECT 1 FROM keep k WHERE k.doc_id = d.doc_id)
    """,
    "the C4-style curation pipeline as ONE plan: quality-rule filter + "
    "length bounds + exact-dedup keep — composition of scan-collapsed "
    "projections, one fingerprint groupBy, one semi-join",
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import exact_dedup_documents

    d = table(spark, sf_dir, "documents")
    kept = exact_dedup_documents(d).select("doc_id")
    scored = d.select(
        "doc_id", "lang", "source",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )
    return (
        scored.join(kept, "doc_id", "left_semi")
        .filter((F.col("quality") >= 0.5) & F.col("n_tokens").between(5, 500))
        .select("doc_id", "lang", "source", "n_tokens", "quality")
    )


@_q(
    "dedup_embedding_lsh",
    None,
    "embedding near-dup at scale: random-hyperplane SimHash -> banded-prefix "
    "candidate join -> exact cosine verify (sub-quadratic; planted duplicate "
    "copies of every 100th vector are recovered at threshold 0.99) — "
    "RNG hyperplanes → rows-only",
)
def q_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import embedding_near_dup_lsh

    e = table(spark, sf_dir, "embeddings")
    planted = e.filter((F.col("vec_id") % 100) == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    corpus = e.unionByName(planted)
    return embedding_near_dup_lsh(corpus, threshold=0.99, dim=64)


# ---------------------------------------------------------------------------
# Distribution analytics: percentiles, histograms, cohorts, sketches
# ---------------------------------------------------------------------------


@_q(
    "value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    "exact percentiles per group (linear interpolation — Spark percentile "
    "== DuckDB quantile_cont); one shuffle, per-group sort inside the agg",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@_q(
    "value_histogram",
    """
    SELECT event_type,
           CAST(floor(value / 50.0) AS INTEGER) AS bucket,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY event_type, CAST(floor(value / 50.0) AS INTEGER)
    """,
    "fixed-width histogram per group: arithmetic bucketing stays in "
    "codegen, map-side combine collapses each partition to (group, bucket) "
    "rows before the shuffle",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.floor(F.col("value") / 50.0).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


@_q(
    "equi_depth_value_buckets",
    """
    WITH r AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
    ),
    g AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1, 2),
    cum AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM g
    ),
    cuts AS (
      SELECT event_type,
             min(CASE WHEN cum >= ceil(n * 1 / 4.0) THEN v END) AS b1,
             min(CASE WHEN cum >= ceil(n * 2 / 4.0) THEN v END) AS b2,
             min(CASE WHEN cum >= ceil(n * 3 / 4.0) THEN v END) AS b3
      FROM cum GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(CASE WHEN r.v <= c.b1 THEN 0
                     WHEN r.v <= c.b2 THEN 1
                     WHEN r.v <= c.b3 THEN 2
                     ELSE 3 END AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(r.v) AS BIGINT) AS lo_value,
           CAST(max(r.v) AS BIGINT) AS hi_value
    FROM r JOIN cuts c USING (event_type)
    GROUP BY 1, 2
    """,
    "equi-depth (equal-frequency) histogram per event type over exact "
    "integer cents — the boundary-selection read behind "
    "repartitionByRange sizing and skew diagnosis (value_histogram is "
    "the equi-width twin); discrete quantile boundaries from the "
    "(group, value) grid, all integer logic, no float interpolation",
)
def q_equi_depth_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.windows import equi_depth_buckets

    ev = table(spark, sf_dir, "events")
    out = equi_depth_buckets(
        ev, "event_type", F.round(F.col("value") * 100), n_buckets=4
    )
    return out.select(
        "event_type",
        F.col("bucket").cast("int").alias("bucket"),
        "n_rows",
        F.col("lo_value").alias("lo_value"),
        F.col("hi_value").alias("hi_value"),
    )


@_q(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    activity AS (
      SELECT DISTINCT o.o_custkey, f.cohort_month,
             (year(date_trunc('month', o.o_orderdate)) - year(f.cohort_month)) * 12
             + (month(date_trunc('month', o.o_orderdate)) - month(f.cohort_month)) AS month_offset
      FROM orders o JOIN firsts f USING (o_custkey)
    )
    SELECT strftime(cohort_month, '%Y-%m') AS cohort,
           month_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity GROUP BY cohort_month, month_offset
    """,
    "cohort retention: first-order month per customer (one groupBy), month "
    "offsets of later orders, distinct customers per (cohort, offset) — the "
    "classic retention triangle as two shuffles on the customer key",
)
def q_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    activity = (
        o.join(firsts, "o_custkey")
        .select(
            "o_custkey",
            "cohort_month",
            (
                (F.year(F.date_trunc("month", F.col("o_orderdate"))) - F.year("cohort_month")) * 12
                + (F.month(F.date_trunc("month", F.col("o_orderdate"))) - F.month("cohort_month"))
            ).alias("month_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_month", "month_offset").agg(
        F.count("*").alias("n_users")
    ).select(
        F.date_format("cohort_month", "yyyy-MM").alias("cohort"), "month_offset", "n_users"
    )


@_q(
    "approx_distinct_sketch",
    None,
    "HLL++ approximate distinct users + approximate percentile per "
    "event_type — the sketch tier for 100 TB cardinality questions "
    "(estimates are engine-specific → rows-only)",
)
def q_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.round(F.percentile_approx("value", 0.5, 1000), 2).alias("approx_p50"),
    )


@_q(
    "range_join_events",
    """
    SELECT c.user_id, c.event_id AS l_event_id, p.event_id AS r_event_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
    FROM events c JOIN events p ON c.user_id = p.user_id
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      AND epoch_us(p.ts) >= epoch_us(c.ts)
      AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
    """,
    "time-range join (purchase within 30min after a click, same user) via "
    "the binning trick: W-wide buckets, left side fans out to (bin, bin+1), "
    "EQUI join on (key, bin) + exact interval filter — O(local density), "
    "never the O(n*m) nested loop; integer-microsecond comparisons",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.joins import range_join_within

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    res = range_join_within(clicks, purchases, key="user_id", ts_col="ts", window_seconds=1800)
    return res.select("user_id", "l_event_id", "r_event_id", "delta_us")


@_q(
    "gopher_quality_rules",
    """
    WITH m AS (
      SELECT doc_id,
             CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '[ \\t\\n\\r\\f\\x0B]+', '', 'g')) AS DOUBLE) AS n_nonspace,
             CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE) AS n_symbols,
             CAST(len(regexp_extract_all(text, '[^ \\t\\n\\r\\f\\x0B]*[A-Za-z가-힣][^ \\t\\n\\r\\f\\x0B]*')) AS DOUBLE) AS n_alpha_words
      FROM documents
    )
    SELECT doc_id, n_words,
           round(n_nonspace / greatest(n_words, 1), 6) AS mean_word_len,
           round(n_symbols / greatest(n_words, 1), 6) AS symbol_ratio,
           round(n_alpha_words / greatest(n_words, 1), 6) AS alpha_word_frac,
           (n_words BETWEEN 5 AND 100000
            AND n_nonspace / greatest(n_words, 1) BETWEEN 2 AND 12
            AND n_symbols / greatest(n_words, 1) < 0.1
            AND n_alpha_words / greatest(n_words, 1) > 0.7) AS passes
    FROM m
    """,
    "Gopher quality rules: word count bounds, mean word length, "
    "symbol-to-word ratio, alphabetic-word fraction + the combined pass "
    "flag — all scan-collapsed regexp/arithmetic, zero exchanges",
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_words = token_count("text")
    n_nonspace = F.length(F.regexp_replace(F.col("text"), r"\s+", "")).cast("double")
    n_symbols = F.regexp_count(F.col("text"), F.lit(r"#|\.\.\.")).cast("double")
    n_alpha = F.regexp_count(F.col("text"), F.lit(r"\S*[A-Za-z가-힣]\S*")).cast("double")
    nw = F.greatest(n_words, F.lit(1))
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(n_nonspace / nw, 6).alias("mean_word_len"),
        F.round(n_symbols / nw, 6).alias("symbol_ratio"),
        F.round(n_alpha / nw, 6).alias("alpha_word_frac"),
        (
            n_words.between(5, 100000)
            & (n_nonspace / nw).between(2, 12)
            & ((n_symbols / nw) < 0.1)
            & ((n_alpha / nw) > 0.7)
        ).alias("passes"),
    )


# ---------------------------------------------------------------------------
# Near-dup cluster resolution: candidate pairs -> connected components ->
# one survivor per cluster.  The Spark side is ITERATIVE (alternating
# large-star/small-star, O(log n) rounds independent of diameter); the
# oracle is a recursive CTE computing min reachable id — an iterative
# distributed algorithm verified against a SQL fixpoint.
# ---------------------------------------------------------------------------


@_q(
    "dedup_components",
    f"""
    WITH RECURSIVE {_minhash_sha_ctes()},
    e2 AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM e2
      UNION
      SELECT e.u, r.r FROM e2 e JOIN reach r ON e.v = r.node
    )
    SELECT node, min(r) AS component FROM reach GROUP BY node
    """,
    "connected components over MinHash-LSH candidate pairs via alternating "
    "large/small-star rounds (O(log n), diameter-independent; driver sees "
    "only a 1-row edge-set signature) — oracle is a recursive-CTE fixpoint",
)
def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        connected_components,
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents")
    return connected_components(minhash_lsh_candidates_sha(d))


@_q(
    "dedup_cluster_survivors",
    f"""
    WITH RECURSIVE {_minhash_sha_ctes()},
    e2 AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM e2
      UNION
      SELECT e.u, r.r FROM e2 e JOIN reach r ON e.v = r.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    losers AS (SELECT node FROM comp WHERE node <> component)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.node = d.doc_id)
    """,
    "end of the near-dup pipeline: keep the min-id document per duplicate "
    "cluster (everything not in a cluster survives untouched); anti-join "
    "ships only ids",
)
def q_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        dedup_cluster_survivors,
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents")
    edges = minhash_lsh_candidates_sha(d)
    return dedup_cluster_survivors(d, edges).select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# Training-corpus assembly: deterministic split, source-mix rebalancing,
# n-gram profiling, per-group outlier trimming.  All hash/rank based so
# the oracle reproduces them bit-for-bit (no randomSplit / sample()).
# ---------------------------------------------------------------------------

from wellmeet_data_pipeline_spark.operators.corpus import (  # noqa: E402
    hash_split,
    rebalance_sources,
    split_thresholds,
    top_ngrams_per_group,
    trim_outliers_per_group,
)

_SPLIT_FRACTIONS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def _split_oracle() -> str:
    ths = split_thresholds(_SPLIT_FRACTIONS)
    bucket = "substr(sha256(concat_ws('|', 'split', CAST(doc_id AS VARCHAR))), 1, 8)"
    whens = "\n           ".join(
        f"WHEN {bucket} < '{th}' THEN '{name}'" for name, th in ths[:-1]
    )
    return f"""
    SELECT doc_id, lang, source,
           CASE {whens}
                ELSE '{ths[-1][0]}' END AS split
    FROM documents
    """


@_q(
    "corpus_split",
    _split_oracle(),
    "deterministic train/val/test assignment by sha256(salt|id) hex-prefix "
    "thresholds — stable under reruns, retries, and corpus growth (a doc "
    "never migrates splits); narrow, no shuffle",
)
def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return hash_split(d, _SPLIT_FRACTIONS).select("doc_id", "lang", "source", "split")


@_q(
    "rebalance_sources",
    """
    WITH ranked AS (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
             count(*) OVER () AS total
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars
    FROM ranked WHERE rk <= CAST(ceil(total * 0.03) AS BIGINT)
    """,
    "cap any source at 3% of the corpus (training-mix rebalancing): "
    "survivors are the first ceil(share*total) per source in sha256(id) "
    "order; rank window shuffles on source only, global count broadcast "
    "as a one-row frame",
)
def q_rebalance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return rebalance_sources(d, 0.03).select("doc_id", "lang", "source", "n_chars")


@_q(
    "top_ngrams_per_lang",
    f"""
    WITH norm AS (
      SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, greatest(len(words) - 1, 0) + 1),
                                   i -> array_to_string(words[i:i+1], ' '))) AS ngram
      FROM norm
    ),
    counts AS (SELECT lang, ngram, count(*) AS n_occurrences FROM sh GROUP BY 1, 2),
    ranked AS (
      SELECT lang, ngram, n_occurrences,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_occurrences DESC, ngram) AS rk
      FROM counts
    )
    SELECT lang, ngram, n_occurrences, rk FROM ranked WHERE rk <= 10
    """,
    "top-10 bigrams per language (corpus profiling / stop-list mining); "
    "lang rides through the shingle explode so no join back to documents — "
    "shuffles: per-doc lead window + (lang, ngram) count + per-lang top-k",
)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return top_ngrams_per_group(d, "lang", n=2, k=10).withColumn(
        "rk", F.col("rk").cast("long")
    )


@_q(
    "corpus_length_trim",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars
    FROM ranked
    WHERE rk > floor(n * 0.05) AND rk <= floor(n * 0.95)
    """,
    "drop the shortest 5% and longest 5% of docs per language — rank cuts, "
    "not interpolated percentiles, so the boundary is exact integer "
    "arithmetic on both engines; one shuffle on lang",
)
def q_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return trim_outliers_per_group(d, "n_chars", "lang", 0.05, 0.95).select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Line-grain curation: global line dedup (C4/RefinedWeb boilerplate
# removal) + Gopher duplicate-line fractions + training-sequence packing.
# The synthetic docs are single-line, so queries first chunk each doc
# into 3-word pseudo-lines with a regexp shared byte-for-byte with the
# oracle — the operators themselves take any delimiter.
# ---------------------------------------------------------------------------

# Spark side keeps Java \s/\S; the oracle spells the Java classes out
# (RE2 \s lacks \x0B — the same divergence as the token-count sweep;
# this raw-string pair was missed by the round-5 `\\s` sweep because it
# single-backslashes)
_CHUNK_RE = r"((\S+\s+){2}\S+)\s+"
_CHUNK_SQL = (
    r"regexp_replace(text, '(([^ \t\n\r\f\x0B]+[ \t\n\r\f\x0B]+){2}"
    r"[^ \t\n\r\f\x0B]+)[ \t\n\r\f\x0B]+', '\1' || chr(10), 'g')"
)
_LINES_CTES = f"""chunked AS (
      SELECT doc_id, {_CHUNK_SQL} AS text FROM documents
    ),
    arrs AS (
      SELECT doc_id, string_split(text, chr(10)) AS arr FROM chunked
    ),
    lines AS (
      SELECT doc_id, i AS line_no, arr[i] AS line
      FROM arrs, LATERAL unnest(generate_series(1, len(arr))) AS t(i)
    )"""


def _chunked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.regexp_replace(F.col("text"), _CHUNK_RE, "$1\n").alias("text"))


@_q(
    "line_dedup_global",
    f"""
    WITH {_LINES_CTES},
    kept AS (
      SELECT doc_id, line_no, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      FROM lines
    )
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY line_no) AS text,
           CAST(count(*) AS INT) AS n_lines
    FROM kept WHERE rn = 1 GROUP BY doc_id
    """,
    "corpus-wide keep-first line dedup (C4/RefinedWeb boilerplate removal) "
    "with per-doc reassembly in original order; one shuffle keyed on the "
    "line text + one groupBy(doc_id) — docs fully consumed by earlier "
    "docs vanish",
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import line_dedup_global

    return line_dedup_global(_chunked_docs(spark, sf_dir))


@_q(
    "dup_line_stats",
    f"""
    WITH {_LINES_CTES},
    per_line AS (
      SELECT doc_id, line, count(*) AS cnt, length(line) AS chars
      FROM lines GROUP BY doc_id, line
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round((sum(cnt) - count(*)) / sum(cnt), 6) AS dup_line_frac,
           round(sum((cnt - 1) * chars) / greatest(sum(cnt * chars), 1), 6) AS dup_char_frac
    FROM per_line GROUP BY doc_id
    """,
    "Gopher duplicate-line fractions per doc (occurrence- and char-"
    "weighted); two-level agg keyed inside the doc so line text never "
    "shuffles past level 1",
)
def q_dup_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import duplicate_line_stats

    return duplicate_line_stats(_chunked_docs(spark, sf_dir))


@_q(
    "pack_sequences",
    """
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS stream_id,
             CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, stream_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (PARTITION BY stream_id ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM t
    )
    SELECT doc_id, stream_id, n_tokens,
           CAST(cb // 64 AS BIGINT) AS pack_id,
           CAST(cb % 64 AS BIGINT) AS pack_offset
    FROM c
    """,
    "concat-and-chunk training-sequence packing: docs shard into 8 "
    "deterministic streams (doc_id % 8, retry-stable), each stream packed "
    "by a running-token-count window — per-stream windows, never one "
    "global single-task sort",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import pack_sequences

    d = table(spark, sf_dir, "documents")
    res = pack_sequences(d, seq_len=64, n_streams=8)
    return res.withColumnRenamed("offset", "pack_offset")


@_q(
    "minhash_jaccard_verify",
    f"""
    WITH {_minhash_sha_ctes()},
    est AS (
      SELECT p.id_a, p.id_b,
             round(({" + ".join(f"CAST(a.h{i} = b.h{i} AS INT)" for i in range(_MINHASH_SHA_NH))}) / {_MINHASH_SHA_NH}.0, 6) AS est_jaccard
      FROM pairs p JOIN sig a ON p.id_a = a.doc_id JOIN sig b ON p.id_b = b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.id_a, p.id_b, count(*) AS i
      FROM pairs p
      JOIN sh a ON a.doc_id = p.id_a
      JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
      GROUP BY p.id_a, p.id_b
    )
    SELECT e.id_a, e.id_b, e.est_jaccard,
           round(COALESCE(i.i, 0) / (sa.n + sb.n - COALESCE(i.i, 0)), 6) AS jaccard
    FROM est e
    JOIN sizes sa ON sa.doc_id = e.id_a
    JOIN sizes sb ON sb.doc_id = e.id_b
    LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    """,
    "MinHash verify stage: signature-agreement Jaccard estimate next to "
    "exact shingle Jaccard for every LSH candidate pair — candidate-"
    "bounded joins only (pairs ⋈ signatures, pairs ⋈ shingles), the "
    "two-phase recall/precision topology near-dup runs at 100 TB",
)
def q_minhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import minhash_verify_sha

    d = table(spark, sf_dir, "documents")
    return minhash_verify_sha(d)


# ---------------------------------------------------------------------------
# Bucketed co-located join: the repeated-big⋈big answer at 100 TB.
# ---------------------------------------------------------------------------


def _source_tag(sf_dir: str, *tables: str) -> str:
    """Cache tag for derived layouts (bucketed/partitioned copies) keyed on
    the SOURCE files' identity (path + mtime + size), so a regenerated
    testdata dir can never be served a stale derived copy."""
    import hashlib
    import os

    parts = [sf_dir]
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        st = os.stat(p)
        parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def _prune_stale_layouts(parent: str, prefix: str, live_tag: str) -> None:
    """Remove sibling derived layouts with the same prefix but a different
    (superseded) source tag — without this, every testdata regeneration
    orphans a full bucketed/partitioned copy on disk forever."""
    import glob
    import os
    import shutil

    for d in glob.glob(os.path.join(parent, f"{prefix}*")):
        if os.path.isdir(d) and not os.path.basename(d).endswith(live_tag):
            shutil.rmtree(d, ignore_errors=True)


def _ensure_bucketed_tpch(spark: SparkSession, sf_dir: str, n_buckets: int = 8) -> tuple[str, str]:
    """Write orders+lineitem bucketed by orderkey ONCE per (session, sf)
    into repo-local external tables; every later join/agg on the key is
    then exchange-free.  This is the write-time amortization bucketing
    buys: pay one shuffle at ingest, never again."""
    from wellmeet_data_pipeline_spark.operators.bucketing import write_bucketed

    tag = _source_tag(sf_dir, "orders", "lineitem")
    sf_key = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    o_name, l_name = f"b_orders_{sf_key}_{tag}", f"b_lineitem_{sf_key}_{tag}"
    base = "/root/repo/spark-warehouse/bucketed"
    _prune_stale_layouts(base, f"b_orders_{sf_key}_", tag)
    _prune_stale_layouts(base, f"b_lineitem_{sf_key}_", tag)
    if not spark.catalog.tableExists(o_name):
        write_bucketed(
            table(spark, sf_dir, "orders"),
            o_name,
            ["o_orderkey"],
            n_buckets,
            path=f"{base}/{o_name}",
        )
    if not spark.catalog.tableExists(l_name):
        write_bucketed(
            table(spark, sf_dir, "lineitem"),
            l_name,
            ["l_orderkey"],
            n_buckets,
            path=f"{base}/{l_name}",
        )
    return o_name, l_name


@_q(
    "bucketed_order_revenue",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100))) AS BIGINT) AS revenue_micros
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate
    """,
    "orders⋈lineitem + groupBy, both keyed on the bucket column over "
    "bucketed tables — SortMergeJoin AND final aggregation run with ZERO "
    "Exchange (plan-asserted in tests/test_plans.py); revenue summed in "
    "exact-integer micros (cents × pct) so the hash is accumulation-"
    "order-proof",
)
def q_bucketed_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_name, l_name = _ensure_bucketed_tpch(spark, sf_dir)
    o = spark.table(o_name).select("o_orderkey", "o_orderdate")
    li = spark.table(l_name).select("l_orderkey", "l_extendedprice", "l_discount")
    j = o.join(
        li.hint("merge"), o["o_orderkey"] == li["l_orderkey"], "inner"
    )  # merge hint: keep the bucket-aligned SortMergeJoin even where
    # broadcast would win at toy scale — the 100 TB plan is the point
    return (
        j.groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100)
                * (F.lit(100) - F.round(F.col("l_discount") * 100))
            )
            .cast("long")
            .alias("revenue_micros"),
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "n_items",
            "revenue_micros",
        )
    )


@_q(
    "temperature_mix",
    """
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    z AS (SELECT sum(sqrt(n)) AS z, CAST(sum(n) AS BIGINT) AS total FROM counts),
    quota AS (
      SELECT lang, least(n, CAST(ceil(total * sqrt(n) / z) AS BIGINT)) AS q
      FROM counts, z
    ),
    ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang
                                ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT r.doc_id, r.lang, r.source
    FROM ranked r JOIN quota q ON r.lang = q.lang
    WHERE r.rk <= q.q
    """,
    "temperature-based language mixing (sample ∝ n^0.5, the multilingual-"
    "mix flattening rule — the dominant lang downsamples, the tail keeps "
    "everything): per-lang sha-rank quota, downsample-only; sqrt not pow "
    "because IEEE requires sqrt correctly rounded — bit-identical across "
    "engines where pow's libm ulps could flip a ceil boundary",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import temperature_sample_sources

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return temperature_sample_sources(d, alpha=0.5, source_col="lang")


@_q(
    "unicode_nfc",
    "SELECT doc_id, nfc_normalize(text) AS nfc_text FROM documents",
    "Unicode NFC normalization via Arrow-batched mapInPandas (no JVM "
    "normalizer in pyspark.sql.functions) — one Python hop per batch; "
    "oracle is DuckDB's nfc_normalize, byte-identical",
)
def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import normalize_nfc

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return normalize_nfc(d).select("doc_id", "nfc_text")


@_q(
    "chunk_documents",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+') AS words
      FROM documents WHERE trim(text) <> ''
    ),
    s AS (SELECT doc_id, words, len(words) AS n FROM w),
    c AS (
      SELECT doc_id, words, unnest(range(0, n, 16)) AS start FROM s
    )
    SELECT doc_id,
           start // 16 AS chunk_no,
           array_to_string(words[start + 1 : start + 32], ' ') AS chunk_text,
           CAST(len(words[start + 1 : start + 32]) AS BIGINT) AS n_chunk_tokens
    FROM c
    """,
    "overlapping word-window chunking (32-word windows, stride 16 — the "
    "RAG/context-prep pass): split → sequence → explode → slice, all "
    "codegen, zero shuffles; last chunk clamps, never empty",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import chunk_documents

    return chunk_documents(table(spark, sf_dir, "documents"), window=32, stride=16)


@_q(
    "contamination_report",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                   i -> array_to_string(words[i:i+2], ' '))) AS shingle
      FROM norm
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0),
    totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM sh GROUP BY doc_id),
    hits AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
      FROM sh WHERE shingle IN (SELECT shingle FROM bench) GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           round(COALESCE(h.n_contaminated, 0) / t.n_shingles, 6) AS contamination_frac
    FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
    "per-doc benchmark-overlap measurement (decontaminate's reporting "
    "twin): distinct-shingle totals vs benchmark-matched counts, benchmark "
    "side broadcast, bodies never shuffle",
)
def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import contamination_report

    d = table(spark, sf_dir, "documents")
    bench = d.filter((F.col("doc_id") % 37) == 0)
    return contamination_report(d, bench)


@_q(
    "char_entropy",
    f"""
    WITH s AS (
      SELECT doc_id, replace({_NORM_SQL}, ' ', '') AS cs FROM documents
    ),
    s2 AS (SELECT doc_id, cs, CAST(length(cs) AS BIGINT) AS n FROM s WHERE length(cs) > 0),
    ch AS (
      SELECT doc_id, n,
             unnest(list_transform(range(1, length(cs) + 1), i -> substr(cs, i, 1))) AS c
      FROM s2
    ),
    cc AS (SELECT doc_id, n, c, CAST(count(*) AS BIGINT) AS k FROM ch GROUP BY doc_id, n, c),
    t AS (
      SELECT doc_id, n,
             CAST(floor(-(CAST(k AS DOUBLE) / n) * ln(CAST(k AS DOUBLE) / n)
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS e
      FROM cc
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_chars_nospace,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           CAST(sum(e) AS BIGINT) / CAST(1000000 AS DOUBLE) AS entropy_nats
    FROM t GROUP BY doc_id
    """,
    "per-document Shannon char entropy (nats, whitespace excluded) — "
    "gibberish/compressibility quality signal; ZERO-shuffle on the Spark "
    "side (distinct chars + counts + entropy all inside one JVM "
    "projection via array lambdas), each -p*ln(p) term snapped to the "
    "integer micro-nat grid so the sum is order-independent",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import char_entropy

    return char_entropy(table(spark, sf_dir, "documents"))


@_q(
    "weighted_sample_docs",
    """
    WITH u AS (
      SELECT doc_id, lang, source, n_chars,
             (CAST(list_sum(list_transform(range(1, 9),
                     i -> CAST(strpos('0123456789abcdef',
                               substr(sha256(concat('ws|', doc_id)), i, 1)) - 1
                               AS BIGINT) << (4 * (8 - i)))) AS DOUBLE)
              + CAST(1 AS DOUBLE)) / CAST(4294967296 AS DOUBLE) AS unif
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars,
           round(CASE WHEN n_chars <= 0 THEN 0
                      ELSE pow(unif, CAST(1 AS DOUBLE) / n_chars) END, 8) AS es_key
    FROM u
    ORDER BY CASE WHEN n_chars <= 0 THEN 0
                  ELSE pow(unif, CAST(1 AS DOUBLE) / n_chars) END DESC, doc_id
    LIMIT 20
    """,
    "deterministic weighted sampling WITHOUT replacement "
    "(Efraimidis-Spirakis A-ES): per-doc key = u^(1/weight) with u a "
    "sha256-derived uniform and weight = n_chars, top-k by key — "
    "longer docs proportionally likelier, yet the sample is a pure "
    "function of the data (retry/repartition-stable, the "
    "stratified_sample_exact family's weighted sibling); top-k is "
    "per-partition heaps, never a global sort",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    hx = F.sha2(F.concat(F.lit("ws|"), F.col("doc_id").cast("string")), 256)
    hv = F.conv(F.substring(hx, 1, 8), 16, 10).cast("double")
    unif = (hv + F.lit(1.0)) / F.lit(4294967296.0)
    # weight-0 docs draw key 0 — never sampled ahead of any weighted doc,
    # and no ANSI DIVIDE_BY_ZERO on a zero-length document
    es = F.when(F.col("n_chars") <= 0, F.lit(0.0)).otherwise(
        F.pow(unif, F.lit(1.0) / F.col("n_chars"))
    )
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.round(es, 8).alias("es_key"),
            es.alias("__k"),
        )
        .orderBy(F.desc("__k"), "doc_id")
        .limit(20)
        .drop("__k")
    )


@_q(
    "column_null_profile",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
           CAST(sum(CASE WHEN text IS NOT NULL AND trim(text) = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS empty_text,
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_lang,
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_source,
           CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS bad_n_chars,
           CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_chars_mismatch
    FROM documents
    """,
    "column-level data-quality profile in ONE scan: null/empty counts "
    "per column plus a derived-column consistency check (n_chars vs "
    "length(text)) — the ingest-gate audit that runs before any "
    "downstream op trusts the table; pure conditional tallies, "
    "map-side combined",
)
def q_column_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    b = lambda c: c.cast("long")
    return d.agg(
        F.count("*").alias("n_rows"),
        F.sum(b(F.col("text").isNull())).alias("null_text"),
        F.sum(b(F.col("text").isNotNull() & (F.trim("text") == ""))).alias(
            "empty_text"
        ),
        F.sum(b(F.col("lang").isNull())).alias("null_lang"),
        F.sum(b(F.col("source").isNull())).alias("null_source"),
        F.sum(b(F.col("n_chars").isNull() | (F.col("n_chars") < 0))).alias(
            "bad_n_chars"
        ),
        F.sum(b(F.col("n_chars") != F.length("text"))).alias("n_chars_mismatch"),
    )


@_q(
    "corpus_datacard",
    f"""
    WITH q AS (
      SELECT source, lang,
             CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END) AS BIGINT) AS toks,
             CAST(floor(round(
               (least((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END) / CAST(20 AS DOUBLE), CAST(1 AS DOUBLE))
                + (CAST(1 AS DOUBLE) - least(len(regexp_extract_all(text, '[^\\w \\t\\n\\r\\f\\x0B]'))
                        / greatest(CAST(length(text) AS DOUBLE), CAST(1 AS DOUBLE)) * CAST(5 AS DOUBLE), CAST(1 AS DOUBLE)))
                + least(len(regexp_extract_all(text, '(?i)\\b(the|a|an|and|or|of|to|in|is|it)\\b'))
                        / greatest(CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END) AS DOUBLE), CAST(1 AS DOUBLE))
                        * CAST(10 AS DOUBLE), CAST(1 AS DOUBLE))
               ) / CAST(3 AS DOUBLE), 6) * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qg,
             sha256({_NORM_SQL}) AS fp
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           round(CAST(sum(toks) AS DOUBLE) / count(*), 2) AS mean_tokens,
           round(CAST(sum(qg) AS DOUBLE) / count(*) / CAST(1000000 AS DOUBLE), 6)
             AS mean_quality,
           round(CAST(count(*) - count(DISTINCT fp) AS DOUBLE) / count(*), 6)
             AS dup_rate
    FROM q GROUP BY source
    """,
    "per-source corpus data card — the summary table a dataset release "
    "ships: doc/lang counts, token volume, mean heuristic quality "
    "(quality_score values live on a 1e-6 grid, so the mean rides an "
    "exact integer sum), and exact-dup rate from content fingerprints; "
    "one scan, one map-side-combined aggregation per source",
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    enriched = d.select(
        "source",
        "lang",
        token_count("text").alias("toks"),
        F.floor(quality_score("text") * F.lit(1e6) + F.lit(0.5)).cast("long").alias("__qg"),
        document_fingerprint("text").alias("__fp"),
    )
    return enriched.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("toks").alias("total_tokens"),
        F.round(F.sum("toks").cast("double") / F.count("*"), 2).alias("mean_tokens"),
        F.round(
            F.sum("__qg").cast("double") / F.count("*") / F.lit(1e6), 6
        ).alias("mean_quality"),
        F.round(
            (F.count("*") - F.countDistinct("__fp")).cast("double") / F.count("*"),
            6,
        ).alias("dup_rate"),
    )


@_q(
    "ngram_novelty",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shs
      FROM norm
    ),
    ex AS (SELECT doc_id, unnest(shs) AS shingle FROM sh),
    firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM ex GROUP BY shingle)
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS novelty
    FROM ex e JOIN firsts f USING (shingle)
    GROUP BY e.doc_id
    """,
    "per-document n-gram novelty: the share of a doc's distinct 3-gram "
    "shingles first seen (min doc_id) in that doc — content-freshness "
    "scoring for curriculum ordering / crawl prioritization; inverted "
    "shingle index, only (shingle, id) pairs shuffle, min() map-side "
    "combines",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import ngram_novelty

    return ngram_novelty(table(spark, sf_dir, "documents"))


@_q(
    "repeated_span_removal",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+') AS words
      FROM documents WHERE trim(text) <> ''
    ),
    toks AS (
      SELECT doc_id, i - 1 AS pos, words[i] AS tok
      FROM w, LATERAL unnest(generate_series(1, len(words))) t(i)
    ),
    grams AS (
      SELECT doc_id, s AS pos, array_to_string(words[s + 1 : s + 3], ' ') AS gram,
             row_number() OVER (PARTITION BY array_to_string(words[s + 1 : s + 3], ' ')
                                ORDER BY doc_id, s) AS rn
      FROM w, LATERAL unnest(generate_series(0, len(words) - 3)) g(s)
      WHERE len(words) >= 3
    ),
    covered AS (
      SELECT DISTINCT doc_id, pos + j AS pos
      FROM grams, LATERAL unnest(generate_series(0, 2)) c(j)
      WHERE rn > 1
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM toks t
      WHERE NOT EXISTS (SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
    )
    SELECT k.doc_id,
           string_agg(k.tok, ' ' ORDER BY k.pos) AS text,
           CAST(len(any_value(w.words)) - count(*) AS BIGINT) AS n_tokens_removed
    FROM kept k JOIN w ON w.doc_id = k.doc_id
    GROUP BY k.doc_id
    """,
    "ExactSubstr-style repeated-span removal (token grain, w=3): tokens "
    "covered by any span seen earlier in the corpus are cut, docs "
    "reassembled — one gram-keyed window shuffle, bounded w-fanout for "
    "coverage, anti-join on (id, pos)",
)
def q_repeated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import remove_repeated_spans

    return remove_repeated_spans(table(spark, sf_dir, "documents"), span_w=3)


@_q(
    "event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    "behavioral transition matrix: lag(event_type) per user in (ts, "
    "event_id) order → (from, to) counts — ONE shuffle on user_id for the "
    "window, the (from,to) agg collapses map-side to ≤25 rows",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_transitions"))
    )


@_q(
    "funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage_no, 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
      UNION ALL
      SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p
    )
    """,
    "ordered funnel (view → click → purchase, strict ts order per user): "
    "each stage is a min-ts groupBy joined forward on (user, ts > prev) — "
    "user_id-keyed shuffles only, stage outputs are one row each",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def stage(etype: str, prev: DataFrame | None, tcol: str, prev_tcol: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_tcol))
        return e.groupBy("user_id").agg(F.min("ts").alias(tcol))

    v = stage("view", None, "t1", "")
    c = stage("click", v, "t2", "t1")
    p = stage("purchase", c, "t3", "t2")

    def count_row(df: DataFrame, no: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_users"),
        )

    return count_row(v, 1, "view").unionAll(count_row(c, 2, "click")).unionAll(
        count_row(p, 3, "purchase")
    )


# ---------------------------------------------------------------------------
# Partition pruning: the other half of write-time layout (with bucketing).
# ---------------------------------------------------------------------------


def _ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write events date-partitioned ONCE per (session, sf) — the standard
    time-series layout at 100 TB, where a day-range query must touch only
    its partitions' files (directory-level pruning, before any row group
    or footer is read)."""
    import os

    tag = _source_tag(sf_dir, "events")
    sf_key = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    _prune_stale_layouts(
        "/root/repo/spark-warehouse", f"events_by_day_{sf_key}_", tag
    )
    path = f"/root/repo/spark-warehouse/events_by_day_{sf_key}_{tag}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        ev = table(spark, sf_dir, "events")
        (
            ev.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
    return path


@_q(
    "partition_pruned_week",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-08' AND '2024-01-14'
    GROUP BY 1, 2
    """,
    "one-week slice over a date-partitioned layout: the filter prunes at "
    "the DIRECTORY level (PartitionFilters, plan-asserted) — 23 of 30 "
    "day-partitions are never opened; sums in exact-integer cents",
)
def q_partition_pruned_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter(F.col("event_date").between("2024-01-08", "2024-01-14"))
        .groupBy("event_date", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100)).cast("long").alias("value_cents"),
        )
    )


@_q(
    "corpus_end_to_end",
    f"""
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars_d,
             CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END) AS DOUBLE) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\r\\f\\x0B]')) AS DOUBLE) AS n_punct,
             CAST(len(regexp_extract_all(text,
                  '(?i)\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS DOUBLE) AS n_stop
      FROM documents
    ),
    q AS (
      SELECT doc_id, n_tokens,
             round((least(n_tokens / 20.0, 1.0)
                  + (1.0 - least(n_punct / greatest(n_chars_d, 1.0) * 5.0, 1.0))
                  + least(n_stop / greatest(n_tokens, 1.0) * 10.0, 1.0)) / 3.0, 6) AS quality
      FROM m
    ),
    gated AS (
      SELECT d.doc_id, d.lang, d.source, d.text, CAST(q.n_tokens AS BIGINT) AS n_tokens
      FROM documents d JOIN q USING (doc_id)
      WHERE q.quality >= 0.5 AND q.n_tokens BETWEEN 5 AND 500
    ),
    fp AS (SELECT doc_id, sha256({_NORM_SQL}) AS fingerprint FROM gated),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
    deduped AS (
      SELECT g.* FROM gated g WHERE EXISTS (SELECT 1 FROM keep k WHERE k.doc_id = g.doc_id)
    ),
    counts AS (SELECT lang, count(*) AS n FROM deduped GROUP BY lang),
    z AS (SELECT sum(sqrt(n)) AS z, CAST(sum(n) AS BIGINT) AS total FROM counts),
    quota AS (
      SELECT lang, least(n, CAST(ceil(total * sqrt(n) / z) AS BIGINT)) AS q
      FROM counts, z
    ),
    ranked AS (
      SELECT doc_id, lang, source, n_tokens,
             row_number() OVER (PARTITION BY lang
                                ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM deduped
    ),
    mixed AS (
      SELECT r.doc_id, r.lang, r.source, r.n_tokens
      FROM ranked r JOIN quota q ON r.lang = q.lang WHERE r.rk <= q.q
    ),
    c AS (
      SELECT doc_id, lang, source, n_tokens, doc_id % 8 AS stream_id,
             COALESCE(sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM mixed
    )
    SELECT doc_id, lang, source, stream_id, n_tokens,
           CAST(cb // 64 AS BIGINT) AS pack_id,
           CAST(cb % 64 AS BIGINT) AS pack_offset
    FROM c
    """,
    "the WHOLE curation DAG as one declarative plan: quality+length gate → "
    "exact dedup (fingerprint groupBy + semi-join) → temperature language "
    "mix (sqrt quotas) → per-stream sequence packing — Catalyst fuses the "
    "gate into the scan and every shuffle is keyed on what the next stage "
    "groups on (fingerprint, lang, stream)",
)
def q_corpus_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import (
        pack_sequences,
        temperature_sample_sources,
    )
    from wellmeet_data_pipeline_spark.operators.dedup import exact_dedup_documents

    d = table(spark, sf_dir, "documents")
    gated = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("__q"),
    ).filter((F.col("__q") >= 0.5) & F.col("n_tokens").between(5, 500))
    # after dedup the text column is DONE — mixing and packing need only
    # (id, lang, source, n_tokens).  Materialize that narrow frame once
    # instead of re-running the quality regexes + fingerprint lineage in
    # each of the three downstream consumers (mix counts, mix rank, pack)
    deduped = (
        exact_dedup_documents(gated)
        .select("doc_id", "lang", "source", "n_tokens")
        .localCheckpoint(eager=False)
    )
    mixed = temperature_sample_sources(deduped, alpha=0.5, source_col="lang")
    packed = pack_sequences(mixed, seq_len=64, n_streams=8, tokens_col="n_tokens")
    return packed.join(mixed.select("doc_id", "lang", "source"), "doc_id").select(
        "doc_id",
        "lang",
        "source",
        "stream_id",
        "n_tokens",
        "pack_id",
        F.col("offset").alias("pack_offset"),
    )


@_q(
    "salted_type_totals",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
    FROM events GROUP BY event_type
    """,
    "skew-safe two-phase aggregation (salt = pmod(xxhash64(row), 16): "
    "content-derived, retry-deterministic, partitioning-independent) "
    "proven EQUAL to the plain groupBy "
    "oracle — sums ride exact-integer cents so the two accumulation "
    "orders cannot diverge by a ulp",
)
def q_salted_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.skew import salted_count_sum

    ev = table(spark, sf_dir, "events").withColumn(
        "__cents", F.round(F.col("value") * 100)
    )
    res = salted_count_sum(ev, ["event_type"], "__cents", salt_buckets=16)
    return res.select(
        "event_type", "n_rows", F.col("sum_value").cast("long").alias("value_cents")
    )


@_q(
    "heavy_hitter_users",
    """
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT user_id, n, round(CAST(n AS DOUBLE) / total, 6) AS share
    FROM c CROSS JOIN tot
    WHERE n >= total * 0.007
    """,
    "exact phi-heavy-hitters over the event key (users holding >= 0.7% "
    "of all events) — the exact form of what Misra-Gries/count-min "
    "approximate, and the frame a skew-mitigation pass reads to decide "
    "which keys to salt (salted_type_totals is the consumer).  One "
    "map-side-combined groupBy + a 1-row total broadcast; output is "
    "bounded at 1/phi rows regardless of corpus size",
)
def q_heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import heavy_hitters

    return heavy_hitters(table(spark, sf_dir, "events"), "user_id", min_share=0.007)


@_q(
    "order_priority_check",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    "TPC-H Q4 shape (order-priority checking): quarter of orders having "
    "at least one lineitem shipped more than 60 days after order date, "
    "counted per priority — a LEFT SEMI join whose equi-key (orderkey) "
    "drives the shuffle and whose date predicate rides as a join-side "
    "filter; order-date range is pushed to the parquet scan",
)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@_q(
    "negative_samples_per_customer",
    """
    WITH purch AS (
      SELECT DISTINCT o.o_custkey, l.l_partkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    users AS (SELECT DISTINCT o_custkey FROM orders),
    ni AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM part),
    cand AS (
      SELECT u.o_custkey, s.seq, ni.n_items,
             sha256(concat_ws('|', u.o_custkey, s.seq)) AS hx
      FROM users u
      CROSS JOIN (SELECT unnest(range(1, 9)) AS seq) s
      CROSS JOIN ni
    ),
    hv AS (
      SELECT o_custkey, seq,
             CAST(list_sum(list_transform(range(1, 9),
                    i -> CAST(strpos('0123456789abcdef', substr(hx, i, 1)) - 1
                              AS BIGINT) << (4 * (8 - i)))) AS BIGINT)
               % n_items AS l_partkey
      FROM cand
    ),
    dd AS (
      SELECT o_custkey, l_partkey, min(seq) AS seq
      FROM hv GROUP BY o_custkey, l_partkey
    ),
    neg AS (
      SELECT h.o_custkey, h.seq, h.l_partkey
      FROM dd h
      LEFT JOIN purch p
        ON p.o_custkey = h.o_custkey AND p.l_partkey = h.l_partkey
      WHERE p.o_custkey IS NULL
    )
    SELECT o_custkey, CAST(seq AS INTEGER) AS seq, l_partkey
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY seq) AS rk
      FROM neg
    ) WHERE rk <= 3
    """,
    "deterministic negative sampling for contrastive/recsys training: "
    "per customer, 3 parts they never bought, drawn from a sha256-keyed "
    "candidate stream (8 draws, same-item collisions collapse to the "
    "lowest draw, anti-join misses, keep first 3) — no users-x-items "
    "cartesian anywhere, retry/repartition-stable, per-user window "
    "bounded by the draw count",
)
def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import (
        negative_sample_candidates,
    )

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    purch = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    n_items = table(spark, sf_dir, "part").agg(F.count("*").alias("n_items"))
    return negative_sample_candidates(
        purch, o, n_items, user_col="o_custkey", item_col="l_partkey", m=8, k=3
    )


@_q(
    "supplier_concentration_hhi",
    """
    WITH r AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey,
             CAST(sum(round(l.l_extendedprice * 100)) AS BIGINT) AS rev
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    )
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(rev) AS BIGINT) AS revenue_cents,
           round(CAST(sum(CAST(rev AS HUGEINT) * rev) AS DOUBLE)
                 / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE)), 6)
             AS hhi
    FROM r GROUP BY nationkey
    """,
    "supplier concentration per nation (Herfindahl-Hirschman index): "
    "HHI = sum(share^2) computed as sum(rev^2)/total^2 with rev^2 "
    "accumulated in 128-bit integer space (decimal(38,0) / HUGEINT — "
    "cents squared overflow int64 at scale) — exact sums, one double "
    "division; HHI -> 1 means a nation's supply rides one supplier, "
    "the concentration read behind sourcing-risk dashboards",
)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    r = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev")
        )
    )
    sq = (F.col("rev").cast("decimal(38,0)") * F.col("rev")).alias("__sq")
    return (
        r.select("nationkey", "rev", sq)
        .groupBy("nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("rev").alias("revenue_cents"),
            F.round(
                F.sum("__sq").cast("double")
                / (F.sum("rev").cast("double") * F.sum("rev").cast("double")),
                6,
            ).alias("hhi"),
        )
    )


@_q(
    "basket_part_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    np AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY 1),
    tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, support,
           round(CAST(support AS DOUBLE) / na.n, 6) AS confidence,
           round(CAST(support AS DOUBLE) * t.n_orders / (na.n * nb.n), 6) AS lift
    FROM pairs
    JOIN np na ON na.l_partkey = part_a
    JOIN np nb ON nb.l_partkey = part_b
    CROSS JOIN tot t
    ORDER BY support DESC, part_a, part_b LIMIT 20
    """,
    "market-basket mining: top co-occurring part pairs with support, "
    "confidence and lift — the within-order self-join is quadratic only "
    "in ORDER SIZE (bounded ~7 lineitems), never in table size; counts "
    "are exact integers, ratios divide once at the end; top-20 via "
    "TakeOrderedAndProject",
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    np_ = items.groupBy("l_partkey").agg(F.count("*").alias("n"))
    tot = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, (a["l_orderkey"] == b["ok2"]) & (a["part_a"] < b["part_b"]))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
    )
    na = np_.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("__na"))
    nb = np_.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("__nb"))
    return (
        pairs.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(F.col("support").cast("double") / F.col("__na"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(20)
    )


@_q(
    "snapshot_diff",
    """
    WITH v1 AS (
      SELECT o_orderkey AS k,
             sha256(concat_ws('|', o_orderstatus, o_orderpriority,
                              CAST(round(o_totalprice * 100) AS BIGINT))) AS h
      FROM orders WHERE o_orderkey % 50 <> 0
    ),
    v2 AS (
      SELECT o_orderkey AS k,
             sha256(concat_ws('|', o_orderstatus, o_orderpriority,
                              CAST(round(o_totalprice * 100)
                                   + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END
                                   AS BIGINT))) AS h
      FROM orders WHERE o_orderkey % 40 <> 0
    ),
    j AS (
      SELECT coalesce(a.k, b.k) AS k,
             CASE WHEN a.k IS NULL THEN 'added'
                  WHEN b.k IS NULL THEN 'removed'
                  WHEN a.h <> b.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM v1 a FULL OUTER JOIN v2 b ON a.k = b.k
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_rows
    FROM j GROUP BY status
    """,
    "snapshot diff for data versioning: two table versions (synthesized "
    "here by key filters + a planted value drift) compared by FULL "
    "OUTER join on key + content-hash equality — added / removed / "
    "changed / unchanged counts without shipping row payloads, the "
    "companion read to table_checksums when the checksums disagree",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")

    def content(extra):
        return F.sha2(
            F.concat_ws(
                "|",
                F.col("o_orderstatus"),
                F.col("o_orderpriority"),
                (F.round(F.col("o_totalprice") * 100).cast("long") + extra).cast(
                    "long"
                ),
            ),
            256,
        )

    v1 = o.filter(F.col("o_orderkey") % 50 != 0).select(
        F.col("o_orderkey").alias("k"), content(F.lit(0)).alias("h1")
    )
    drift = F.when(F.col("o_orderkey") % 7 == 0, F.lit(1)).otherwise(F.lit(0))
    v2 = o.filter(F.col("o_orderkey") % 40 != 0).select(
        F.col("o_orderkey").alias("k2"), content(drift).alias("h2")
    )
    j = v1.join(v2, v1["k"] == v2["k2"], "full_outer")
    status = (
        F.when(F.col("k").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "changed")
        .otherwise("unchanged")
    )
    return j.select(status.alias("status")).groupBy("status").agg(
        F.count("*").alias("n_rows")
    )


@_q(
    "table_checksums",
    """
    WITH h AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             sha256(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                              CAST(round(o_totalprice * 100) AS BIGINT),
                              strftime(o_orderdate, '%Y-%m-%d'),
                              o_orderpriority)) AS hx
      FROM orders
    ),
    v AS (
      SELECT month,
             CAST(list_sum(list_transform(range(1, 16),
                    i -> CAST(strpos('0123456789abcdef', substr(hx, i, 1)) - 1
                              AS BIGINT) << (4 * (15 - i)))) AS BIGINT) AS hv
      FROM h
    )
    SELECT month, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(hv) AS BIGINT) AS checksum
    FROM v GROUP BY month
    """,
    "anti-entropy table checksums per month partition: 60-bit "
    "sha256-derived row digests xor-folded per group — order- and "
    "partitioning-independent, so two replicas (or a migration "
    "source/target pair) compare equal iff contents match, without "
    "moving rows; floats enter the digest as exact integer cents so "
    "the digest is rendering-stable across engines",
)
def q_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    content = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("long"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    hv = F.conv(F.substring(F.sha2(content, 256), 1, 15), 16, 10).cast("long")
    return (
        o.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"), hv.alias("__h"))
        .groupBy("month")
        .agg(
            F.count("*").alias("n_rows"),
            F.bit_xor("__h").alias("checksum"),
        )
    )


@_q(
    "skew_split_join_revenue",
    """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(round(e.value * 100)) AS BIGINT) AS value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    "hot/cold split skew join proven EQUAL to the plain-join oracle: "
    "keys detected by heavy_hitters take a broadcast path (hot rows "
    "never shuffle), the cold remainder takes the normal shuffle path "
    "free of stragglers — the composition story: the skew DETECTOR "
    "(heavy_hitter_users) feeds the skew TREATMENT; exact-integer cents",
)
def q_skew_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import heavy_hitters
    from wellmeet_data_pipeline_spark.operators.skew import split_hot_cold_join

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("__cents")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    hot = heavy_hitters(ev, "user_id", min_share=0.007).select("user_id")
    joined = split_hot_cold_join(ev, cust, "user_id", "c_custkey", hot)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum("__cents").alias("value_cents"),
    )


@_q(
    "orders_reconciliation",
    """
    WITH o AS (SELECT DISTINCT o_custkey FROM orders),
    j AS (
      SELECT c.c_custkey AS ck, o.o_custkey AS ok
      FROM customer c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    )
    SELECT CASE WHEN ck IS NULL THEN 'orphan_order'
                WHEN ok IS NULL THEN 'no_orders'
                ELSE 'matched' END AS status,
           CAST(count(*) AS BIGINT) AS n_custkeys
    FROM j GROUP BY 1
    """,
    "referential-integrity audit via FULL OUTER join (customers without "
    "orders / orders pointing at missing customers / matched) — the "
    "reconciliation read every warehouse runs after ingest",
)
def q_orders_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "full_outer")
    return (
        j.select(
            F.when(F.col("c_custkey").isNull(), "orphan_order")
            .when(F.col("o_custkey").isNull(), "no_orders")
            .otherwise("matched")
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count("*").alias("n_custkeys"))
    )


@_q(
    "event_debounce",
    """
    WITH seq AS (
      SELECT event_id, user_id, event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                                    ORDER BY ts NULLS FIRST, event_id) AS gap_us
      FROM events
    )
    SELECT event_id, user_id, event_type FROM seq
    WHERE gap_us IS NULL OR gap_us >= 259200000000
    """,
    "successive-gap thinning: drop an event when the PREVIOUS (user, type) "
    "event — kept or not — was under 3 days earlier (the one-window lag "
    "rule; a kept-anchored cooldown is iterative and belongs to the "
    "stateful streaming tier) — integer-microsecond arithmetic",
)
def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.withColumn("__gap", gap)
        .filter(F.col("__gap").isNull() | (F.col("__gap") >= 259200000000))
        .select("event_id", "user_id", "event_type")
    )


@_q(
    "unpivot_user_counts",
    """
    WITH wide AS (
      SELECT user_id,
             CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
             CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id, metric, n FROM (
      SELECT user_id, 'click' AS metric, n_click AS n FROM wide
      UNION ALL SELECT user_id, 'view', n_view FROM wide
      UNION ALL SELECT user_id, 'purchase', n_purchase FROM wide
    )
    """,
    "unpivot/melt: conditional-count wide frame stacked back to long form "
    "via F.stack — the wide→long half of the pivot pair, one agg shuffle, "
    "stack is a zero-shuffle projection",
)
def q_unpivot_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
    )
    return wide.select(
        "user_id",
        F.expr(
            "stack(3, 'click', n_click, 'view', n_view, 'purchase', n_purchase) AS (metric, n)"
        ),
    )


@_q(
    "daily_revenue_trend",
    """
    WITH d AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
             CAST(sum(round(value * 100)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM d GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE), 6) END
             AS slope_cents_per_day,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE round((CAST(sy AS DOUBLE)
                            - CAST(n * sxy - sx * sy AS DOUBLE)
                              / CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 2) END
             AS intercept_cents
    FROM s
    """,
    "per-type least-squares trend of daily revenue: slope/intercept from "
    "the normal equations computed on EXACT integer sums (day index x "
    "integer cents — n*Sxy - Sx*Sy etc. stay below 2^63 at bench SFs), "
    "one double division at the end, so both engines agree bit-for-bit "
    "where regr_slope()'s streaming-covariance accumulation order would "
    "not; two map-side-combined aggregations, no window",
)
def q_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
    s = d.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(slope, 6))
        .alias("slope_cents_per_day"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(intercept, 2))
        .alias("intercept_cents"),
    )


@_q(
    "user_interarrival_stats",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
               AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           round(quantile_cont(gap_us, 0.5), 1) AS p50_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    "per-user event inter-arrival gaps (integer microseconds via lag "
    "over (ts, event_id) — the compound order key makes same-timestamp "
    "rows deterministic): count/min/median/max — the burstiness read "
    "behind rate-limit sizing and bot detection; the window partitions "
    "by user (bounded per-user history), the median is the exact "
    "interpolated percentile both engines share",
)
def q_user_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.round(F.percentile("gap_us", F.lit(0.5)), 1).alias("p50_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


@_q(
    "daily_anomaly_flags",
    """
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY day NULLS FIRST
                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s,
             sum(n * n) OVER (PARTITION BY event_type ORDER BY day NULLS FIRST
                              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS ss,
             count(n) OVER (PARTITION BY event_type ORDER BY day NULLS FIRST
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS c
      FROM d
    )
    SELECT event_type, day, n,
           CASE WHEN c < 3 THEN NULL
                ELSE (c * n - s) * (c * n - s) > 4 * (c * ss - s * s)
           END AS is_anomaly
    FROM w
    """,
    "daily volume anomaly flags: a day is anomalous when its count "
    "deviates from the trailing-7-day baseline by more than 2 "
    "population sigma — the test (c*n - s)^2 > 4*(c*ss - s^2) is the "
    "z-score inequality cleared of divisions, so the flag is EXACT "
    "integer arithmetic with no float variance/sqrt to diverge between "
    "engines; the window is post-agg over day-grain rows (bounded, the "
    "daily_event_delta contract), NULL until 3 days of history",
)
def q_daily_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    d = d.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("__s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("__ss"),
        F.count("n").over(w).alias("__c"),
    )
    dev = F.col("__c") * F.col("n") - F.col("__s")
    var4 = 4 * (F.col("__c") * F.col("__ss") - F.col("__s") * F.col("__s"))
    return d.select(
        "event_type",
        "day",
        "n",
        F.when(F.col("__c") < 3, F.lit(None).cast("boolean"))
        .otherwise(dev * dev > var4)
        .alias("is_anomaly"),
    )


@_q(
    "daily_event_delta",
    """
    WITH d AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT day, n, n - lag(n) OVER (ORDER BY day NULLS FIRST) AS delta
    FROM d
    """,
    "day-over-day deltas: the lag window runs AFTER aggregation over ~30 "
    "rows — a single-partition window is fine post-agg (and only "
    "post-agg); the scan-side work is one date-keyed groupBy",
)
def q_daily_event_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("day")
    return d.select("day", "n", (F.col("n") - F.lag("n").over(w)).alias("delta"))


@_q(
    "event_validity_intervals",
    """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(ts) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts NULLS FIRST, event_id),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts NULLS FIRST, event_id) IS NULL AS BOOLEAN) AS is_current
    FROM events
    """,
    "SCD2-shape validity intervals: each (user, type) observation is valid "
    "until the next one (lead window, half-open intervals, NULL = current "
    "version) — the dimension-history layout every warehouse keeps; one "
    "(user,type)-keyed shuffle, timestamps rendered to fixed strings",
)
def q_event_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    nxt = F.lead("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", _EV_TS_FMT).alias("valid_from"),
        F.date_format(nxt, _EV_TS_FMT).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@_q(
    "vocab_coverage",
    """
    WITH counts AS (
      SELECT unnest(string_split({norm}, ' ')) AS token
      FROM documents
    ),
    freq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n
      FROM counts WHERE token <> '' GROUP BY token
    ),
    tot AS (SELECT sum(n) AS t FROM freq),
    ranked AS (
      SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rank,
             sum(n) OVER (ORDER BY n DESC, token
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM freq
    )
    SELECT token, n, rank, round(cum / t, 6) AS cum_coverage
    FROM ranked, tot
    """.format(norm=_NORM_SQL),
    "vocabulary building: global token frequencies + rank + cumulative "
    "corpus coverage (the choose-vocab-size curve every tokenizer build "
    "reads) — map-side-combined token counts; rank/coverage via the "
    "two-pass range-partitioned prefix sum (global_rank_cumsum), never a "
    "single-partition window: a 100 TB corpus has 10^8+ distinct tokens",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import normalized_text
    from wellmeet_data_pipeline_spark.operators.windows import global_rank_cumsum

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    freq = toks.groupBy("token").agg(F.count("*").alias("n"))
    tot = freq.agg(F.sum("n").alias("t"))
    ranked = global_rank_cumsum(
        freq, [F.col("n").desc(), F.col("token").asc()], sum_col="n"
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "token",
        "n",
        F.col("rank").cast("int").alias("rank"),
        F.round(F.col("cum") / F.col("t"), 6).alias("cum_coverage"),
    )


@_q(
    "lsh_quality_metrics",
    f"""
    WITH {_minhash_sha_ctes()},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
      SELECT i.id_a, i.id_b
      FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.i / (sa.n + sb.n - i.i) >= 0.5
    )
    SELECT
      CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_candidates,
      CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
      CAST((SELECT count(*) FROM pairs p JOIN truth t ON p.id_a = t.id_a AND p.id_b = t.id_b) AS BIGINT) AS n_hit
    """,
    "LSH quality audit: candidate count vs ground-truth near-dup pairs "
    "(exact Jaccard ≥ 0.5) vs their intersection — recall = n_hit/n_true, "
    "precision = n_hit/n_candidates, the two numbers that justify band/"
    "row parameters before a 100 TB run (truth side is corpus-squared in "
    "general: run it on a SAMPLE at scale; here the shingle join bounds it)",
)
def q_lsh_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates_sha,
        ngram_jaccard_pairs,
    )

    d = table(spark, sf_dir, "documents")
    # both frames are consumed twice (own count + the hit join) —
    # materialize once instead of re-walking the corpus lineage.
    # threshold/DF-cap must MATCH the oracle (>= 0.5, uncapped): the
    # operator's own defaults (0.8, capped) would silently hide every
    # truth pair in [0.5, 0.8) from the Spark side only
    pairs = minhash_lsh_candidates_sha(d).localCheckpoint(eager=False)
    truth = (
        ngram_jaccard_pairs(d, threshold=0.5, max_shingle_df=None)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    hit = pairs.join(truth, ["id_a", "id_b"], "inner")
    return (
        pairs.agg(F.count("*").alias("n_candidates"))
        .crossJoin(truth.agg(F.count("*").alias("n_true")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
    )


@_q(
    "embedding_mean_pool",
    """
    WITH e AS (
      SELECT label, i - 1 AS pos, embedding[i] AS v
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) t(i)
    )
    SELECT label, pos, round(avg(v), 6) + 0.0 AS mean_v,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM e GROUP BY label, pos
    """,
    "mean pooling over vector columns (class prototypes here; the same "
    "shape pools chunk embeddings back to doc embeddings in the RAG "
    "store): posexplode → (group, dim) avg, map-side combined — the "
    "vector never moves as a blob, only (dim, partial-sum) pairs "
    "shuffle; `+ 0.0` canonicalizes -0.0 across engines",
)
def q_embedding_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return ex.groupBy("label", "pos").agg(
        (F.round(F.avg("v"), 6) + F.lit(0.0)).alias("mean_v"),
        F.count("*").alias("n_vectors"),
    )


@_q(
    "clean_web_text",
    """
    SELECT doc_id,
           trim(regexp_replace(
             replace(replace(replace(replace(replace(replace(
               regexp_replace(text, '<[^>]*>', ' ', 'g'),
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
             '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS clean_text
    FROM documents
    """,
    "web-corpus HTML cleaning: strip tags, decode predefined entities, "
    "collapse whitespace — a regexp_replace chain fused into the scan "
    "(identity on this plain-text corpus; the regex parity is what the "
    "oracle checks, tag/entity behavior is unit-tested on HTML fixtures)",
)
def q_clean_web_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import strip_html

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", strip_html("text").alias("clean_text"))


@_q(
    "zscore_by_type",
    """
    WITH s AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 6) AS zscore
    FROM events e JOIN s USING (event_type)
    """,
    "per-group z-score standardization (feature scaling): one stats "
    "groupBy broadcast back onto the fact — mean/std computed once per "
    "group, never a per-row window over the full table",
)
def q_zscore_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6).alias("zscore"),
    )


@_q(
    "late_shipment_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 shape: orders having ≥1 lineitem shipped >90 days after "
    "order date, counted per priority — EXISTS with a cross-table "
    "predicate becomes ONE left-semi join carrying the condition; the "
    "lineitem side ships only (orderkey, shipdate)",
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.date_add(o["o_orderdate"], 90)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@_q(
    "small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey, avg(l_quantity) AS aq FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(round(l.l_extendedprice * 100)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.2 * pa.aq
    """,
    "TPC-H Q17 shape: items below 20% of their part's average quantity — "
    "the correlated scalar subquery re-expressed as a groupBy + equi-join "
    "back (one partkey-keyed shuffle); safe to hash-compare because "
    "l_quantity is integer-valued so per-part sums are EXACT doubles and "
    "the average is bit-identical on both engines",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    j = li.join(pa, "l_partkey").filter(F.col("l_quantity") < 0.2 * F.col("aq"))
    return j.agg(
        F.count("*").alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100)).cast("long").alias("revenue_cents"),
    )


@_q(
    "daily_moving_average",
    """
    WITH d AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, n,
           round(avg(n) OVER (PARTITION BY event_type ORDER BY day NULLS FIRST
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
    FROM d
    """,
    "7-day trailing moving average per event type — the rolling window "
    "runs AFTER the date×type aggregation (~150 rows), partitioned by "
    "type so no single-partition window on anything scan-sized; avg of "
    "BIGINTs rounds identically on both engines",
)
def q_daily_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return d.select(
        "day", "event_type", "n", F.round(F.avg("n").over(w), 6).alias("ma7")
    )


def _ntile_from_rank(rn, N, k: int):
    """SQL-standard ntile(k) recovered arithmetically from a global row
    number: the first N%k buckets hold ceil(N/k) rows, the rest floor(N/k)
    — matches both Spark's and DuckDB's ntile bit-for-bit on a total
    order, without the single-partition window ntile() itself needs."""
    base, big = F.floor(N / k), N % k
    threshold = big * (base + 1)
    return F.when(rn <= threshold, F.floor((rn - 1) / (base + 1)) + 1).otherwise(
        big + F.floor((rn - threshold - 1) / base) + 1
    )


@_q(
    "user_value_quartiles",
    """
    WITH t AS (
      SELECT user_id, CAST(sum(round(value * 100)) AS BIGINT) AS total_cents
      FROM events GROUP BY user_id
    )
    SELECT user_id, total_cents,
           ntile(4) OVER (ORDER BY total_cents, user_id) AS quartile,
           round(percent_rank() OVER (ORDER BY total_cents, user_id), 6) AS pct_rank
    FROM t
    """,
    "ranking-window completeness: ntile quartile buckets + percent_rank "
    "over per-user spend — user-cardinality data (unbounded at scale), so "
    "no global window: two-pass distributed row_number, then ntile and "
    "percent_rank derived arithmetically from (rank, N); ties broken by "
    "user_id so bucket edges are deterministic; spend in exact-integer "
    "cents",
)
def q_user_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.windows import global_rank_cumsum

    ev = table(spark, sf_dir, "events")
    t = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100)).cast("long").alias("total_cents")
    )
    ranked = global_rank_cumsum(
        t, [F.col("total_cents").asc(), F.col("user_id").asc()]
    )
    # N from the checkpointed ranked frame, not from t: counting t would
    # re-run the whole upstream aggregation a second time
    ncnt = ranked.agg(F.count("*").alias("_N"))
    rn, N = F.col("rank"), F.col("_N")
    pct_rank = F.when(N == 1, F.lit(0.0)).otherwise(F.round((rn - 1) / (N - 1), 6))
    return ranked.crossJoin(F.broadcast(ncnt)).select(
        "user_id",
        "total_cents",
        _ntile_from_rank(rn, N, 4).cast("int").alias("quartile"),
        pct_rank.alias("pct_rank"),
    )


@_q(
    "busiest_day_per_type",
    """
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           arg_max(day, lpad(CAST(n AS VARCHAR), 20, '0') || day) AS busiest_day,
           max(n) AS peak_events
    FROM d GROUP BY event_type
    """,
    "argmax aggregation (max_by): the busiest day per event type in ONE "
    "aggregation pass — no rank-window detour; ties break toward the "
    "later day via a lexicographic (zero-padded count ‖ day) key, the "
    "compound-ordering form both engines' arg_max accept",
)
def q_busiest_day_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n"))
    key = F.concat(F.lpad(F.col("n").cast("string"), 20, "0"), F.col("day"))
    return d.groupBy("event_type").agg(
        F.max_by("day", key).alias("busiest_day"),
        F.max("n").alias("peak_events"),
    )


@_q(
    "sql_api_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS price_cents
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "the SQL facade: the engine accepts raw ANSI SQL via temp views + "
    "spark.sql — same Catalyst plan as the DataFrame form (filter pushed, "
    "partial aggs), proving both API surfaces hit identical physical "
    "strategies",
)
def q_sql_api_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS price_cents
        FROM v_lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# Model-based corpus scoring (operators/scoring.py)
# ---------------------------------------------------------------------------

# token stream with positions, shared by the scoring oracles: zip-unnest of
# the normalized word list against its index range (DuckDB aligns parallel
# unnests); the lone empty token of an empty document is filtered out, so
# positions stay contiguous — same contract as scoring._tokens_with_pos
_TOKPOS_SQL = f"""
      w0 AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ws FROM documents),
      toks AS (
        SELECT doc_id, unnest(ws) AS term, unnest(range(1, len(ws) + 1)) AS pos
        FROM w0
      ),
      t2 AS (SELECT * FROM toks WHERE term <> '')
"""


@_q(
    "bigram_cond_entropy",
    f"""
    WITH {_TOKPOS_SQL},
    bi AS (
      SELECT term, lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM t2
    ),
    c2 AS (
      SELECT prev, term, CAST(count(*) AS BIGINT) AS c2
      FROM bi WHERE prev IS NOT NULL GROUP BY prev, term
    ),
    c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY prev),
    t AS (SELECT CAST(sum(c2) AS BIGINT) AS t2 FROM c2),
    terms AS (
      SELECT CAST(floor(-(CAST(c2.c2 AS DOUBLE) / t.t2)
                        * ln(CAST(c2.c2 AS DOUBLE) / c1.c1)
                        * CAST(1000000000000 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS e
      FROM c2 JOIN c1 USING (prev) CROSS JOIN t
    )
    SELECT (SELECT t2 FROM t) AS n_bigrams,
           CAST((SELECT count(*) FROM c1) AS BIGINT) AS n_contexts,
           round(CAST(sum(e) AS DOUBLE) / CAST(1000000000000 AS DOUBLE), 6)
             AS cond_entropy_nats
    FROM terms
    """,
    "corpus bigram conditional entropy H(w2|w1) in nats — the "
    "information-theoretic complexity statistic behind compression/"
    "memorization estimates (low entropy = templated/boilerplate "
    "corpus); each -p(w1,w2)*ln p(w2|w1) term snaps to a 1e-12 grid "
    "and integer-sums, so the scalar is aggregation-order-independent; "
    "count frames are vocabulary-sized, the token stream shuffles once",
)
def q_bigram_cond_entropy(
    spark: SparkSession, sf_dir: str, shared_tokens: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import _tokens_with_pos

    d = table(spark, sf_dir, "documents")
    toks = (
        shared_tokens if shared_tokens is not None else _tokens_with_pos(d, "text", "doc_id")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = toks.withColumn("prev", F.lag("term").over(w)).filter(
        F.col("prev").isNotNull()
    )
    c2 = bi.groupBy("prev", "term").agg(F.count("*").alias("c2"))
    c2 = c2.localCheckpoint(eager=True)  # feeds c1, totals, and the term sum
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    t2 = c2.agg(F.sum("c2").alias("t2"))
    scale = 1e12
    joined = c2.join(c1, "prev").crossJoin(F.broadcast(t2))
    term = F.floor(
        -(F.col("c2").cast("double") / F.col("t2"))
        * F.log(F.col("c2").cast("double") / F.col("c1"))
        * F.lit(scale)
        + F.lit(0.5)
    ).cast("long")
    n_contexts = c1.agg(F.count("*").alias("nc"))
    return (
        joined.withColumn("__e", term)
        .agg(F.sum("__e").alias("__se"), F.max("t2").alias("n_bigrams"))
        .crossJoin(F.broadcast(n_contexts))
        .select(
            "n_bigrams",
            F.col("nc").alias("n_contexts"),
            F.round(F.col("__se").cast("double") / F.lit(scale), 6).alias(
                "cond_entropy_nats"
            ),
        )
    )


# shared LM-scoring CTE chain (documents scored by the add-0.1-smoothed
# bigram LM counted on the doc_id % 5 == 0 reference fifth), ending at
# agg = (doc_id, n_tokens, s) with s the exact integer micro-nat sum —
# the base of both the fixed-band and the per-language-tercile oracles
_LM_AGG_SQL = f"""{_TOKPOS_SQL},
    lmtok AS (SELECT * FROM t2 WHERE doc_id % 5 = 0),
    c1 AS (SELECT term, CAST(count(*) AS BIGINT) AS c1 FROM lmtok GROUP BY term),
    lmbi AS (
      SELECT term, lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM lmtok
    ),
    c2 AS (
      SELECT prev, term, CAST(count(*) AS BIGINT) AS c2
      FROM lmbi WHERE prev IS NOT NULL GROUP BY prev, term
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS lm_total,
             CAST(count(*) AS BIGINT) AS lm_vocab
      FROM c1
    ),
    dtok AS (
      SELECT doc_id, pos, term,
             lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM t2
    ),
    lp AS (
      SELECT d.doc_id, d.pos,
             CAST(floor(ln(CASE WHEN d.prev IS NULL
               THEN (coalesce(cs.c1, 0) + CAST(0.1 AS DOUBLE))
                    / (t.lm_total + CAST(0.1 AS DOUBLE) * t.lm_vocab)
               ELSE (coalesce(cc.c2, 0) + CAST(0.1 AS DOUBLE))
                    / (coalesce(cp.c1, 0) + CAST(0.1 AS DOUBLE) * t.lm_vocab)
             END) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lp
      FROM dtok d
      LEFT JOIN c1 cs ON cs.term = d.term
      LEFT JOIN c1 cp ON cp.term = d.prev
      LEFT JOIN c2 cc ON cc.prev = d.prev AND cc.term = d.term
      CROSS JOIN tot t
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(lp) AS BIGINT) AS s
      FROM lp GROUP BY doc_id
    )"""


@_q(
    "ngram_lm_perplexity",
    f"""
    WITH {_LM_AGG_SQL}
    SELECT doc_id, n_tokens,
           CAST(floor(-CAST(s AS DOUBLE) / n_tokens + CAST(0.5 AS DOUBLE)) AS BIGINT)
             / CAST(1000000 AS DOUBLE) AS nll,
           CASE WHEN CAST(floor(-CAST(s AS DOUBLE) / n_tokens + CAST(0.5 AS DOUBLE)) AS BIGINT)
                     / CAST(1000000 AS DOUBLE) <= CAST(3.42 AS DOUBLE) THEN 'head'
                WHEN CAST(floor(-CAST(s AS DOUBLE) / n_tokens + CAST(0.5 AS DOUBLE)) AS BIGINT)
                     / CAST(1000000 AS DOUBLE) <= CAST(3.50 AS DOUBLE) THEN 'middle'
                ELSE 'tail' END AS ppl_band
    FROM agg
    """,
    "CCNet-style LM perplexity scoring: add-0.1-smoothed bigram LM counted "
    "on the curated reference fifth of the corpus (doc_id % 5), every doc "
    "scored by nats/token and banded head/middle/tail; LM count frames are "
    "vocabulary-sized broadcasts, per-token log-probs snap to an integer "
    "micro-nat grid so the sums are order-independent and oracle-stable",
)
def q_ngram_lm_perplexity(
    spark: SparkSession, sf_dir: str, shared_tokens: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import ngram_lm_score

    d = table(spark, sf_dir, "documents")
    lm = d.filter((F.col("doc_id") % 5) == 0)
    return ngram_lm_score(
        d,
        lm,
        alpha=0.1,
        head_nll=3.42,
        tail_nll=3.50,
        docs_tokens=shared_tokens,
        lm_tokens=None
        if shared_tokens is None
        else shared_tokens.filter((F.col("doc_id") % 5) == 0),
    )


@_q(
    "perplexity_lang_buckets",
    f"""
    WITH {_LM_AGG_SQL},
    docm AS (
      SELECT a.doc_id, d.lang,
             CAST(floor(-CAST(s AS DOUBLE) / n_tokens + CAST(0.5 AS DOUBLE)) AS BIGINT) AS m
      FROM agg a JOIN documents d ON d.doc_id = a.doc_id
    ),
    grid AS (SELECT lang, m, CAST(count(*) AS BIGINT) AS c FROM docm GROUP BY lang, m),
    cumg AS (
      SELECT lang, m, c,
             sum(c) OVER (PARTITION BY lang ORDER BY m
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY lang) AS n
      FROM grid
    ),
    cuts AS (
      SELECT lang,
             min(CASE WHEN cum >= (n + 2) // 3 THEN m END) AS cut1,
             min(CASE WHEN cum >= (2 * n + 2) // 3 THEN m END) AS cut2
      FROM cumg GROUP BY lang
    )
    SELECT d.lang,
           CASE WHEN d.m <= c.cut1 THEN 'head'
                WHEN d.m <= c.cut2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(d.m) AS DOUBLE) / count(*) / CAST(1000000 AS DOUBLE), 6)
             AS mean_nll
    FROM docm d JOIN cuts c USING (lang)
    GROUP BY 1, 2
    """,
    "CCNet's real bucketing rule: per-LANGUAGE head/middle/tail cutoffs "
    "from the corpus's own perplexity distribution (discrete terciles), "
    "not fixed thresholds; cutoffs computed in integer micro-nat space "
    "over the (lang, nll-value) GRID — the cumulative window is bounded "
    "by value-grid cardinality, never doc cardinality, so nothing "
    "resembles a global sort at 100 TB",
)
def q_perplexity_lang_buckets(
    spark: SparkSession, sf_dir: str, shared_tokens: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import perplexity_lang_buckets

    d = table(spark, sf_dir, "documents")
    lm = d.filter((F.col("doc_id") % 5) == 0)
    return perplexity_lang_buckets(
        d,
        lm,
        alpha=0.1,
        docs_tokens=shared_tokens,
        lm_tokens=None
        if shared_tokens is None
        else shared_tokens.filter((F.col("doc_id") % 5) == 0),
    )


@_q(
    "doremi_weight_step",
    f"""
    WITH {_LM_AGG_SQL},
    docm AS (
      SELECT a.doc_id, d.source,
             CAST(floor(-CAST(s AS DOUBLE) / n_tokens + CAST(0.5 AS DOUBLE)) AS BIGINT) AS m
      FROM agg a JOIN documents d ON d.doc_id = a.doc_id
    ),
    dom AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(m) AS BIGINT) AS sm
      FROM docm GROUP BY source
    ),
    dtot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS tn, CAST(sum(sm) AS BIGINT) AS tm
      FROM dom
    ),
    st AS (
      SELECT d.source, d.n_docs,
             CAST(d.sm AS DOUBLE) / d.n_docs / CAST(1000000 AS DOUBLE) AS mean_raw,
             CAST(floor(exp(CAST(1.0 AS DOUBLE) * greatest(
                    CAST(d.sm AS DOUBLE) / d.n_docs / CAST(1000000 AS DOUBLE)
                    - CAST(t.tm AS DOUBLE) / t.tn / CAST(1000000 AS DOUBLE),
                    CAST(0.0 AS DOUBLE)))
                  * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS w
      FROM dom d CROSS JOIN dtot t
    ),
    wt AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM st)
    SELECT source, n_docs, round(mean_raw, 6) AS mean_nll,
           round(CAST(w AS DOUBLE) / wt, 6) AS weight
    FROM st CROSS JOIN wt
    """,
    "DoReMi-style domain reweighting step: domains whose LM perplexity "
    "exceeds the corpus baseline get weight ∝ exp(eta * excess_nll) — "
    "the excess-loss mixture update runnable from the bigram scorer; "
    "per-domain sums ride the integer micro-nat grid, exp() output "
    "snaps to a 1e-9 grid before the exact-bigint normalizer, so "
    "weights are aggregation-order-independent",
)
def q_doremi_weight_step(
    spark: SparkSession, sf_dir: str, shared_tokens: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import doremi_weight_step

    d = table(spark, sf_dir, "documents")
    lm = d.filter((F.col("doc_id") % 5) == 0)
    return doremi_weight_step(
        d,
        lm,
        eta=1.0,
        alpha=0.1,
        docs_tokens=shared_tokens,
        lm_tokens=None
        if shared_tokens is None
        else shared_tokens.filter((F.col("doc_id") % 5) == 0),
    )


@_q(
    "quality_classifier_score",
    f"""
    WITH {_TOKPOS_SQL},
    h AS (SELECT doc_id, sha256(term) AS hx FROM t2),
    b AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS bucket
      FROM h
    ),
    wtd AS (
      SELECT doc_id,
             CAST((bucket * 2654435761) % 65536 - 32768 AS BIGINT) AS w_int
      FROM b
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(w_int) AS BIGINT) AS s
      FROM wtd GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(floor(CAST(s AS DOUBLE) / (CAST(32768 AS DOUBLE) * n_tokens)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             / CAST(1000000 AS DOUBLE) AS logit,
           s >= 0 AS keep
    FROM agg
    """,
    "fastText-shaped hashed linear quality classifier: tokens feature-hash "
    "into 2^16 buckets (first four sha256 hex chars, decoded via instr so "
    "the oracle matches byte-for-byte), the (bucket, weight) model table is "
    "broadcast-joined onto the exploded tokens, and the doc logit is the "
    "exact-integer mean weight — the production shape for shipping a "
    "trained text classifier into the pipeline (weights here are a "
    "deterministic stand-in; no training libs in the container)",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import (
        hashed_linear_score,
        model_weights_table,
    )

    d = table(spark, sf_dir, "documents")
    return hashed_linear_score(d, model_weights_table(spark))


def _shard_case_sql(n_shards: int, hex_col: str) -> str:
    from wellmeet_data_pipeline_spark.operators.corpus import split_thresholds

    ths = split_thresholds([(str(i), 1.0 / n_shards) for i in range(n_shards)])
    whens = " ".join(
        f"WHEN {hex_col} < '{th}' THEN {name}" for name, th in ths[:-1]
    )
    return f"CASE {whens} ELSE {ths[-1][0]} END"


@_q(
    "corpus_shuffle_shards",
    f"""
    WITH hashed AS (
      SELECT doc_id,
             substr(sha256('shard|' || CAST(doc_id AS VARCHAR)), 1, 8) AS hp
      FROM documents
    ),
    sharded AS (
      SELECT doc_id, hp,
             CAST({_shard_case_sql(8, "hp")} AS INTEGER) AS shard
      FROM hashed
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY hp, doc_id) AS BIGINT)
             AS pos_in_shard
    FROM sharded
    """,
    "deterministic global shuffle into 8 training shards: shard = "
    "growth-stable sha hex-prefix range (narrow, no shuffle to assign), "
    "within-shard position = sha rank — a uniform reproducible permutation "
    "of the corpus with an N-way window instead of a global single-task "
    "sort",
)
def q_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import shuffle_to_shards

    d = table(spark, sf_dir, "documents").select("doc_id")
    out = shuffle_to_shards(d, 8)
    return out.select(
        "doc_id", "shard", F.col("pos_in_shard").cast("long").alias("pos_in_shard")
    )


@_q(
    "dedup_vs_reference",
    f"""
    WITH {_minhash_sha_ctes()},
    cpairs AS (
      SELECT DISTINCT CASE WHEN id_a % 4 <> 0 THEN id_a ELSE id_b END AS new_id,
                      CASE WHEN id_a % 4 = 0 THEN id_a ELSE id_b END AS ref_id
      FROM pairs
      WHERE (id_a % 4 = 0) <> (id_b % 4 = 0)
    ),
    inter AS (
      SELECT p.new_id, p.ref_id, CAST(count(*) AS BIGINT) AS i
      FROM cpairs p
      JOIN sh a ON a.doc_id = p.new_id
      JOIN sh b ON b.doc_id = p.ref_id AND b.shingle = a.shingle
      GROUP BY p.new_id, p.ref_id
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    cross_hits AS (
      SELECT DISTINCT i.new_id
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.new_id
      JOIN sizes sb ON sb.doc_id = i.ref_id
      WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= CAST(0.5 AS DOUBLE)
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id % 4 <> 0
      AND NOT EXISTS (SELECT 1 FROM cross_hits c WHERE c.new_id = d.doc_id)
    """,
    "cross-corpus dedup: drop new-crawl docs near-dup'ing the reference "
    "corpus (the 'already in the training set' scan) — banded LSH recall, "
    "then exact shingle-Jaccard >= 0.5 verify on candidate-bounded joins "
    "(a raw band collision alone fires ~23% on Jaccard-0.5 pairs — too "
    "loose to destroy data on); sha-prefix family keeps banding AND "
    "verify oracle-checked (cross pairs = partition-filtered subset of "
    "the union self-join, exact because signatures are corpus-"
    "membership-independent)",
)
def q_dedup_vs_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import dedup_against_reference_sha

    d = table(spark, sf_dir, "documents")
    ref = d.filter((F.col("doc_id") % 4) == 0)
    new = d.filter((F.col("doc_id") % 4) != 0)
    return dedup_against_reference_sha(new, ref).select("doc_id", "lang", "source")


@_q(
    "hard_negatives_topk",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    n AS (
      SELECT vec_id, label, e,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
      FROM v
    ),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, len(a.e) + 1),
                                           i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) AS cosine_sim
      FROM n a JOIN n b ON a.vec_id <> b.vec_id AND a.label <> b.label
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
      FROM scored)
    WHERE rank <= 3
    """,
    "hard-negative mining for contrastive training: per vector, the top-3 "
    "most-similar DIFFERENT-label neighbors — the blocked-BNL exact tier "
    "with a label-aware tile mask; at scale the same contract runs over "
    "LSH/IVF candidates",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import hard_negative_top_k

    e = table(spark, sf_dir, "embeddings")
    return hard_negative_top_k(e, k=3, round_digits=4)


# ---------------------------------------------------------------------------
# Round-4 additions: training-prep and corpus-ops queries
# ---------------------------------------------------------------------------

_BPE_SQL = "regexp_extract_all(text, '[A-Za-z가-힣]+|[0-9]+|[^A-Za-z가-힣0-9 \\t\\n\\r\\f\\x0B]')"


@_q(
    "fim_split",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n_tokens,
             CAST(floor(len(words) * 2.0 / 5) AS BIGINT) AS p,
             CAST(floor(len(words) * 7.0 / 10) AS BIGINT) AS m
      FROM w WHERE len(words) >= 5
    )
    SELECT doc_id, n_tokens,
           array_to_string(words[1:p], ' ') AS fim_prefix,
           array_to_string(words[p + 1:m], ' ') AS fim_middle,
           array_to_string(words[m + 1:n_tokens], ' ') AS fim_suffix
    FROM s
    """,
    "fill-in-middle transform for code/infilling training: deterministic "
    "40/30/30 token split of each document into (prefix, middle, suffix) "
    "— pure projection, collapses into the scan (integer-arithmetic "
    "boundaries so both engines cut at the same token)",
)
def q_fim_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import normalized_text

    d = table(spark, sf_dir, "documents")
    words = F.split(normalized_text(F.col("text")), " ")
    base = d.select(F.col("doc_id"), words.alias("words")).filter(
        F.size("words") >= 5
    )
    n = F.size("words").cast("long")
    p = F.floor(n * 2 / 5).cast("int")
    m = F.floor(n * 7 / 10).cast("int")
    return base.select(
        "doc_id",
        n.alias("n_tokens"),
        F.array_join(F.slice("words", F.lit(1), p), " ").alias("fim_prefix"),
        F.array_join(F.slice("words", p + 1, m - p), " ").alias("fim_middle"),
        F.array_join(F.slice("words", m + 1, n.cast("int") - m), " ").alias("fim_suffix"),
    )


@_q(
    "tokenizer_fertility",
    f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(n_chars) AS DOUBLE)
                 / sum((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END)), 4) AS chars_per_word,
           round(CAST(sum(n_chars) AS DOUBLE)
                 / sum(len({_BPE_SQL})), 4) AS chars_per_token,
           round(CAST(sum(len({_BPE_SQL})) AS DOUBLE)
                 / sum((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END)), 4) AS fertility
    FROM documents
    GROUP BY lang
    """,
    "tokenizer fertility audit per language: chars/word, chars/BPE-token "
    "and tokens-per-word — the numbers that decide whether a tokenizer "
    "under-serves a language; exact integer sums, one map-side-combined "
    "aggregation",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("__ws"),
        F.sum(bpe_ish_token_count("text")).alias("__bpe"),
        F.sum("n_chars").alias("__chars"),
    )
    return g.select(
        "lang",
        "n_docs",
        F.round(F.col("__chars") / F.col("__ws"), 4).alias("chars_per_word"),
        F.round(F.col("__chars") / F.col("__bpe"), 4).alias("chars_per_token"),
        F.round(F.col("__bpe") / F.col("__ws"), 4).alias("fertility"),
    )


@_q(
    "bpe_pair_counts",
    f"""
    WITH wf AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    p AS (
      SELECT unnest(list_transform(range(1, length(word)),
                                   i -> substr(word, i, 2))) AS pair,
             freq
      FROM wf WHERE length(word) >= 2
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
    "BPE tokenizer training, iteration-1 argmax input: adjacent char-pair "
    "counts weighted by word frequency over the WORD VOCABULARY (types "
    "not tokens — the frame every merge iteration touches is "
    "vocabulary-sized, independent of corpus size); top-20 via "
    "TakeOrderedAndProject, never a global sort.  The full iterated "
    "trainer (train_bpe_merges: 1-row argmax collect + JVM array-fold "
    "rewrite per merge) is pytest-verified against an independent "
    "pure-Python BPE in tests/test_tokenizer.py",
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.tokenizer import bpe_pair_counts

    return bpe_pair_counts(table(spark, sf_dir, "documents"), top_n=20)


@_q(
    "seqlen_histogram",
    f"""
    WITH t AS (
      SELECT CAST(len({_BPE_SQL}) AS BIGINT) AS n FROM documents
    )
    SELECT CAST(pow(2, floor(log2(n))) AS BIGINT) AS len_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS sum_tokens,
           CAST(sum((256 - n % 256) % 256) AS BIGINT) AS pad_waste_256
    FROM t WHERE n >= 1
    GROUP BY 1
    """,
    "sequence-length histogram in power-of-2 buckets + the padding waste "
    "a naive pad-to-256 batching would pay per bucket — the distribution "
    "every packing/curriculum decision reads; log2 is exact on the "
    "bucket boundaries (powers of two) so both engines bucket "
    "identically",
)
def q_seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n = bpe_ish_token_count("text")
    t = d.select(n.alias("n")).filter(F.col("n") >= 1)
    return (
        t.groupBy(
            F.pow(F.lit(2.0), F.floor(F.log2("n"))).cast("long").alias("len_bucket")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("sum_tokens"),
            F.sum((F.lit(256) - F.col("n") % 256) % 256).alias("pad_waste_256"),
        )
    )


@_q(
    "dup_rate_by_source",
    f"""
    WITH f AS (
      SELECT source, sha256({_NORM_SQL}) AS fp FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
           round((count(*) - count(DISTINCT fp)) * 1.0 / count(*), 6) AS dup_share
    FROM f GROUP BY source
    """,
    "per-source exact-duplication pressure: the share of docs whose "
    "content fingerprint repeats within the source — the ops metric that "
    "flags a crawler re-ingesting its own output; distinct-count on the "
    "64-hex fingerprint, partial-agged",
)
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import document_fingerprint

    d = table(spark, sf_dir, "documents")
    f = d.select("source", document_fingerprint(F.col("text")).alias("fp"))
    return f.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("fp").alias("n_unique"),
        F.round(
            (F.count("*") - F.count_distinct("fp")) * 1.0 / F.count("*"), 6
        ).alias("dup_share"),
    )


@_q(
    "length_curriculum",
    f"""
    WITH t AS (
      -- COALESCE 0: a NULL text is a 0-token doc on both engines — bare
      -- NULLs would rank NULLS FIRST in Spark but NULLS LAST in DuckDB,
      -- shifting every quartile boundary
      SELECT doc_id, CAST(COALESCE(len({_BPE_SQL}), 0) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(ntile(4) OVER (ORDER BY n_tokens, doc_id) AS INTEGER) AS stage
    FROM t
    """,
    "length-based curriculum staging: exact quartile of every document "
    "by token count (train short→long) — ntile derived from the two-pass "
    "distributed rank (global_rank_cumsum), no global window over the "
    "corpus-cardinality frame",
)
def q_length_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.windows import global_rank_cumsum

    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.coalesce(bpe_ish_token_count("text"), F.lit(0)).alias("n_tokens"),
    )
    ranked = global_rank_cumsum(
        t, [F.col("n_tokens").asc(), F.col("doc_id").asc()]
    )
    # N from the checkpointed ranked frame: counting t would re-run the
    # per-document regexp token count over the whole corpus a second time
    ncnt = ranked.agg(F.count("*").alias("_N"))
    return ranked.crossJoin(F.broadcast(ncnt)).select(
        "doc_id",
        "n_tokens",
        _ntile_from_rank(F.col("rank"), F.col("_N"), 4).cast("int").alias("stage"),
    )


@_q(
    "pack_efficiency_by_seqlen",
    f"""
    WITH t AS (
      SELECT CAST(len({_BPE_SQL}) AS BIGINT) AS n FROM documents
    ),
    lens AS (SELECT unnest([128, 256, 512, 1024]) AS seq_len)
    SELECT CAST(seq_len AS INTEGER) AS seq_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n > seq_len THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
           round(CAST(sum(seq_len - least(n, seq_len)) AS DOUBLE)
                 / (seq_len * count(*)), 6) AS pad_fraction,
           round(CAST(sum(greatest(n - seq_len, 0)) AS DOUBLE) / sum(n), 6) AS trunc_fraction
    FROM t, lens GROUP BY seq_len
    """,
    "choose-the-sequence-length audit: for each candidate seq_len, the "
    "padding waste of one-doc-per-sequence batching and the token loss "
    "of truncation — exact integer sums over a broadcast 4-row literal "
    "frame, one pass over the corpus",
)
def q_pack_efficiency_by_seqlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = d.select(bpe_ish_token_count("text").alias("n"))
    lens = spark.createDataFrame([(128,), (256,), (512,), (1024,)], "seq_len int")
    c = t.crossJoin(F.broadcast(lens))
    return c.groupBy("seq_len").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n") > F.col("seq_len"), 1).otherwise(0))
        .cast("long")
        .alias("n_truncated"),
        F.round(
            F.sum(F.col("seq_len") - F.least("n", "seq_len"))
            / (F.col("seq_len") * F.count("*")),
            6,
        ).alias("pad_fraction"),
        F.round(
            F.sum(F.greatest(F.col("n") - F.col("seq_len"), F.lit(0))) / F.sum("n"), 6
        ).alias("trunc_fraction"),
    )


_BUCKET_SQL = (
    "(strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 4096"
    " + (strpos('0123456789abcdef', substr({h}, 2, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr({h}, 3, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr({h}, 4, 1)) - 1)"
)


# shared DSIR CTE chain (hashed-ngram features, target = doc_id%7,
# add-0.1-smoothed bucket log-ratios on the micro-nat grid) ending at
# agg = (doc_id, n_features, s) — base of dsir_importance and
# dsir_ess_by_source
_DSIR_AGG_SQL = f"""{_TOKPOS_SQL},
    bi AS (
      SELECT doc_id, pos, term,
             lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM t2
    ),
    feats AS (
      SELECT doc_id, {_BUCKET_SQL.format(h="sha256(term)")} AS bucket FROM t2
      UNION ALL
      SELECT doc_id, {_BUCKET_SQL.format(h="sha256(prev || ' ' || term)")} AS bucket
      FROM bi WHERE prev IS NOT NULL
    ),
    c_t AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS c_t
      FROM feats WHERE doc_id % 7 = 0 GROUP BY bucket
    ),
    c_r AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_r FROM feats GROUP BY bucket),
    tot AS (
      SELECT (SELECT CAST(sum(c_t) AS BIGINT) FROM c_t) AS t_total,
             (SELECT CAST(sum(c_r) AS BIGINT) FROM c_r) AS r_total
    ),
    lr AS (
      SELECT f.doc_id,
             CAST(floor(ln(
               ((coalesce(t.c_t, 0) + CAST(0.1 AS DOUBLE))
                / (tt.t_total + CAST(0.1 AS DOUBLE) * 65536))
               / ((coalesce(r.c_r, 0) + CAST(0.1 AS DOUBLE))
                  / (tt.r_total + CAST(0.1 AS DOUBLE) * 65536))
             ) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lr
      FROM feats f
      LEFT JOIN c_t t ON t.bucket = f.bucket
      LEFT JOIN c_r r ON r.bucket = f.bucket
      CROSS JOIN tot tt
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
             CAST(sum(lr) AS BIGINT) AS s
      FROM lr GROUP BY doc_id
    )"""


@_q(
    "dsir_importance",
    f"""
    WITH {_DSIR_AGG_SQL}
    SELECT doc_id, n_features,
           CAST(floor(CAST(s AS DOUBLE) / n_features + CAST(0.5 AS DOUBLE)) AS BIGINT)
             / CAST(1000000 AS DOUBLE) AS dsir_weight,
           s >= 0 AS keep
    FROM agg
    """,
    "DSIR importance resampling weights (Xie et al.): mean hashed-ngram "
    "log-ratio ln(p_target/p_raw) per document, target = the doc_id%7 "
    "partition, raw = the whole corpus — bucket-count frames bounded by "
    "the 2^16 feature space broadcast onto the feature stream; "
    "integer micro-nat grid for oracle exactness",
)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import dsir_importance_weight

    d = table(spark, sf_dir, "documents")
    target = d.filter((F.col("doc_id") % 7) == 0)
    return dsir_importance_weight(d, target, target_within_docs=True)


_REV_CENTS_SQL = "round(l_extendedprice * 100) * (100 - round(l_discount * 100))"


def _rev_cents():
    """Exact-integer revenue term (cents x pct): the repo's standard
    money-sum discipline (module docstring)."""
    return F.round(F.col("l_extendedprice") * 100, 0) * (
        F.lit(100) - F.round(F.col("l_discount") * 100, 0)
    )


@_q(
    "market_share_by_year",
    f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_1' THEN {_REV_CENTS_SQL} ELSE 0 END)
                 / sum({_REV_CENTS_SQL}), 6) AS mkt_share,
           round(sum({_REV_CENTS_SQL}) / 10000.0, 4) AS total_revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY year(o_orderdate)
    """,
    "TPC-H Q8-shaped market share: one supplier nation's revenue share "
    "per year inside a region's market — conditional sum over a six-way "
    "join (every dimension broadcast, nation under two roles), ratio of "
    "two exact-integer sums so the share is order-independent",
)
def q_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _rev_cents()
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n2.n_name") == "NATION_1", rev).otherwise(0))
                / F.sum(rev),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(rev) / F.lit(10000.0), 4).alias("total_revenue"),
        )
    )


@_q(
    "customer_order_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    "TPC-H Q13-shaped customer distribution: how many customers placed "
    "exactly k orders, INCLUDING the zero-order customers a plain inner "
    "join would drop — left-outer count(null-skipping) then a second "
    "small aggregation",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    c_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_q(
    "promo_revenue_share",
    f"""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS_SQL} ELSE 0 END)
                 / sum({_REV_CENTS_SQL}), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    "TPC-H Q14-shaped promo revenue share: percentage of each month's "
    "revenue from PROMO-type parts — broadcast part join, conditional "
    "exact-integer sums, month rendered as a fixed string",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = _rev_cents()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                / F.sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


@_q(
    "large_order_customers",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(round(l_quantity)) > 150
    )
    SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(o_totalprice, 2) AS total_price,
           CAST((SELECT sum(round(l_quantity)) FROM lineitem
                 WHERE l_orderkey = o_orderkey) AS BIGINT) AS total_qty
    FROM orders
    JOIN big ON o_orderkey = big.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
    "TPC-H Q18-shaped large-volume orders: HAVING on an exact-integer "
    "quantity sum, then join the qualifying keys back to orders and "
    "customers — the group-filter-then-rejoin shape; the qualifying set "
    "is small so both joins broadcast it",
)
def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity", 0)).cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
    )


@_q(
    "disjunctive_filter_revenue",
    f"""
    SELECT round(sum({_REV_CENTS_SQL}) / 10000.0, 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_type = 'PROMO' AND p_size <= 20 AND round(l_quantity) <= 25)
       OR (p_type = 'ECONOMY' AND p_size <= 10 AND round(l_quantity) <= 15)
       OR (p_brand = 'BRAND_1' AND round(l_quantity) >= 40)
    """,
    "TPC-H Q19-shaped disjunctive predicate revenue: three OR-branches "
    "mixing part and lineitem attributes — the join-then-filter form "
    "Catalyst handles by pushing each side's common conjuncts into the "
    "scans; exact-integer quantity comparisons",
)
def q_disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    qty = F.round("l_quantity", 0)
    cond = (
        ((F.col("p_type") == "PROMO") & (F.col("p_size") <= 20) & (qty <= 25))
        | ((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10) & (qty <= 15))
        | ((F.col("p_brand") == "BRAND_1") & (qty >= 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(_rev_cents()) / F.lit(10000.0), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@_q(
    "inactive_rich_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(sum(round(c_acctbal * 100)) AS BIGINT) AS s_cents,
             CAST(count(*) AS BIGINT) AS n_pos
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_custs,
           round(sum(round(c_acctbal * 100)) / 100.0, 2) AS total_bal
    FROM customer, avg_bal
    WHERE round(c_acctbal * 100) * n_pos > s_cents
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
    "TPC-H Q22-shaped sales opportunity: above-average-balance customers "
    "with no RECENT order (this synthetic data gives every customer some "
    "order, so the lapsed-since-2000 form keeps the result non-trivial) "
    "— scalar-subquery threshold broadcast onto the scan, anti join "
    "against the filtered orders keys (filter pushed to that scan); the "
    "above-average comparison is restated in exact-integer cents "
    "(bal*100*n > sum) so summation-order ulp noise can never flip a "
    "boundary customer (the customer_above_avg discipline)",
)
def q_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    cents = F.round(F.col("c_acctbal") * 100, 0)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).cast("long").alias("s_cents"),
        F.count("*").alias("n_pos"),
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(cents * F.col("n_pos") > F.col("s_cents"))
        .join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 100, 0)) / F.lit(100.0), 2
            ).alias("total_bal"),
        )
    )


@_q(
    "semdedup_survivors",
    """
    WITH RECURSIVE anchors AS (
      SELECT label, list_transform(arg_min(embedding, vec_id), x -> CAST(x AS DOUBLE)) AS a
      FROM embeddings WHERE embedding IS NOT NULL GROUP BY label
    ),
    v AS (
      SELECT e.vec_id, list_transform(range(1, len(e.embedding) + 1),
             i -> an.a[i] * 0.75 + CAST(e.embedding[i] AS DOUBLE) * 0.25) AS e
      FROM embeddings e JOIN anchors an ON e.label = an.label
      WHERE e.embedding IS NOT NULL
    ),
    n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
    cents AS (SELECT vec_id AS cid, e AS c, nrm AS cnrm FROM n
              WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT 16),
    scored AS (
      SELECT a.vec_id, c.cid,
             round(CASE WHEN a.nrm * c.cnrm = 0 THEN 0
                        ELSE list_sum(list_transform(range(1, len(a.e)+1),
                                      i -> a.e[i] * c.c[i])) / (a.nrm * c.cnrm)
                   END, 4) AS sim
      FROM n a CROSS JOIN cents c
    ),
    assign AS (
      SELECT vec_id, cid AS cluster_id, sim AS centroid_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cid ASC) rk FROM scored)
      WHERE rk = 1
    ),
    pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM assign ja JOIN assign jb
        ON ja.cluster_id = jb.cluster_id AND ja.vec_id < jb.vec_id
      JOIN n a ON a.vec_id = ja.vec_id JOIN n b ON b.vec_id = jb.vec_id
      WHERE round(CASE WHEN a.nrm * b.nrm = 0 THEN 0
                       ELSE list_sum(list_transform(range(1, len(a.e)+1),
                                     i -> a.e[i]*b.e[i]))/(a.nrm*b.nrm)
                  END, 4) >= 0.95
    ),
    e2 AS (SELECT ia AS u, ib AS v FROM pairs UNION SELECT ib, ia FROM pairs),
    reach(node, r) AS (
      SELECT u, u FROM e2
      UNION
      SELECT e.u, r.r FROM e2 e JOIN reach r ON e.v = r.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    ranked AS (
      SELECT c.node, row_number() OVER (PARTITION BY c.component
                                        ORDER BY a.centroid_sim ASC, c.node ASC) AS rk
      FROM comp c JOIN assign a ON a.vec_id = c.node
    )
    SELECT a.vec_id, a.cluster_id, a.centroid_sim,
           coalesce(r.rk = 1, TRUE) AS kept
    FROM assign a LEFT JOIN ranked r ON r.node = a.vec_id
    """,
    "SemDeDup (Abbas et al. 2023): semantic dedup over the clustered "
    "embedding fixture — deterministic coarse clusters, within-cluster "
    "cosine>=0.95 edges, connected components, keep the least-central "
    "member per duplicate group; the quadratic term is confined within "
    "clusters (per-task bound (N/n_centroids)^2, n_centroids~sqrt(N) at "
    "scale) and the oracle replays assignment, edges, the component "
    "fixpoint, and the survivor rule exactly",
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import (
        clustered_embeddings,
        semantic_dedup,
    )

    e = clustered_embeddings(table(spark, sf_dir, "embeddings"))
    return semantic_dedup(e, threshold=0.95, n_centroids=16, seed_mod=31)


@_q(
    "forecast_revenue_change",
    """
    SELECT round(sum(round(l_extendedprice * 100) * round(l_discount * 100)) / 10000.0, 4)
             AS revenue_increase,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND round(l_discount * 100) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    "TPC-H Q6 shape: revenue increase from dropping small-quantity "
    "mid-discount items in one shipping year — a pure filter+agg whose "
    "entire predicate reaches the parquet scan (PushedFilters on "
    "shipdate/quantity); discount restated on its integer pct grid so "
    "the band edges are exact on both engines",
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.round(F.col("l_discount") * 100, 0).between(5, 7)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0)
                    * F.round(F.col("l_discount") * 100, 0)
                )
                / F.lit(10000.0),
                4,
            ).alias("revenue_increase"),
            F.count("*").alias("n_items"),
        )
    )


@_q(
    "product_profit_by_nation",
    f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum({_REV_CENTS_SQL}
                     - round(p_retailprice * 100) * round(l_quantity) * 100) / 10000.0, 4)
             AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    "TPC-H Q9 shape: per-(supplier nation, order year) profit on parts "
    "matching a name pattern, with retail cost standing in for the "
    "missing partsupp supplycost — revenue and cost both restated on the "
    "common 1/10000 grid (cents x pct vs cents x qty x 100) so the sum "
    "is exact-integer and order-independent; dims broadcast, one "
    "orderkey-side shuffle",
)
def q_product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    amount = _rev_cents() - (
        F.round(F.col("p_retailprice") * 100, 0) * F.round("l_quantity", 0) * 100
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount) / F.lit(10000.0), 4).alias("profit"))
    )


@_q(
    "returned_item_report",
    f"""
    WITH per_cust AS (
      SELECT c_custkey, c_name, n_name,
             CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS rev_tt
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
    )
    SELECT c_custkey, c_name, n_name AS nation,
           round(rev_tt / 10000.0, 4) AS revenue
    FROM (SELECT *, row_number() OVER (ORDER BY rev_tt DESC, c_custkey ASC) AS rk
          FROM per_cust)
    WHERE rk <= 20
    """,
    "TPC-H Q10 shape: top-20 customers by revenue lost to returned items "
    "in one quarter — the rank cut happens on the exact-integer revenue "
    "(ties broken by custkey) so the top-20 frontier is identical on "
    "both engines; Spark side is orderBy+limit (TakeOrderedAndProject — "
    "distributed partial top-k), never a global row_number window",
)
def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_cents()).cast("long").alias("rev_tt"))
    )
    # top-20 via orderBy+limit -> TakeOrderedAndProject: a distributed
    # per-partition partial top-k + single merge of 20-row heaps, never a
    # row_number() window (which would single-partition the whole customer
    # frame — unbounded at scale, exactly the WindowExec warning class)
    return (
        per_cust.orderBy(F.col("rev_tt").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.round(F.col("rev_tt") / F.lit(10000.0), 4).alias("revenue"),
        )
    )


@_q(
    "top_supplier_revenue",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS rev_tt
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(rev_tt / 10000.0, 4) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE rev_tt = (SELECT max(rev_tt) FROM rev)
    """,
    "TPC-H Q15 shape: the supplier(s) achieving maximum revenue in one "
    "quarter — the view-plus-scalar-max form becomes an agg reused by "
    "both the max subquery and the probe (exact-integer revenue makes "
    "the equality safe; a double sum could miss the max row by one ulp)",
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_cents()).cast("long").alias("rev_tt"))
        .localCheckpoint()  # reused by the max subquery AND the probe
    )
    mx = rev.agg(F.max("rev_tt").alias("mx"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("rev_tt") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_tt") / F.lit(10000.0), 4).alias("total_revenue"),
        )
    )


@_q(
    "waiting_supplier_orders",
    """
    WITH per_os AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    per_o AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp, max(s_max) AS o_max
      FROM per_os GROUP BY l_orderkey
    ),
    at_max AS (
      SELECT p.l_orderkey, CAST(count(*) AS BIGINT) AS n_at_max
      FROM per_os p JOIN per_o o
        ON p.l_orderkey = o.l_orderkey AND p.s_max = o.o_max
      GROUP BY p.l_orderkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per_os p
    JOIN per_o o ON p.l_orderkey = o.l_orderkey
    JOIN at_max m ON p.l_orderkey = m.l_orderkey
    JOIN supplier ON p.l_suppkey = s_suppkey
    WHERE o.n_supp > 1 AND p.s_max = o.o_max AND m.n_at_max = 1
    GROUP BY s_name
    """,
    "TPC-H Q21 shape: suppliers who alone shipped last on multi-supplier "
    "orders (the reshaped 'kept the order waiting' — shipdate stands in "
    "for the missing commit/receipt dates) — the EXISTS / NOT-EXISTS "
    "pair becomes two per-order aggregates (supplier count, count at the "
    "max shipdate) joined back; everything shuffles once on orderkey",
)
def q_waiting_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    ).localCheckpoint()  # feeds per_o, at_max, and the probe
    per_o = (
        per_os.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_supp"), F.max("s_max").alias("o_max"))
        .select(F.col("l_orderkey").alias("ok_o"), "n_supp", "o_max")
    )
    at_max = (
        per_os.join(
            per_o,
            (F.col("l_orderkey") == F.col("ok_o")) & (F.col("s_max") == F.col("o_max")),
        )
        .groupBy(F.col("l_orderkey").alias("ok_m"))
        .agg(F.count("*").alias("n_at_max"))
    )
    return (
        per_os.join(per_o, F.col("l_orderkey") == F.col("ok_o"))
        .join(at_max, F.col("l_orderkey") == F.col("ok_m"))
        .filter(
            (F.col("n_supp") > 1)
            & (F.col("s_max") == F.col("o_max"))
            & (F.col("n_at_max") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@_q(
    "cross_doc_spans",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    grams0 AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(words) - 7, 0) + 1)) AS pos1,
             unnest(list_transform(range(1, greatest(len(words) - 7, 0) + 1),
                                   i -> array_to_string(words[i:i+7], ' '))) AS g
      FROM norm
    ),
    grams AS (SELECT doc_id, pos1 - 1 AS pos, g FROM grams0),
    df_ok AS (
      SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS d FROM grams GROUP BY g)
      WHERE d <= 10
    ),
    seeds AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      WHERE a.g IN (SELECT g FROM df_ok)
    ),
    islands AS (
      SELECT doc_a, doc_b, pa - pb AS diag, pa,
             pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                     ORDER BY pa) AS grp
      FROM seeds
    )
    SELECT doc_a, doc_b, min(pa) AS start_a,
           CAST(min(pa) - diag AS BIGINT) AS start_b,
           CAST(max(pa) - min(pa) + 8 AS BIGINT) AS span_tokens
    FROM islands GROUP BY doc_a, doc_b, diag, grp
    """,
    "ExactSubstr-style cross-document duplicate spans (Lee et al. 2021): "
    "maximal verbatim token spans >= 8 words shared by two docs — "
    "seed-and-extend re-expressed set-based (positioned 8-gram seed "
    "join with a DF<=10 hot-gram cap, then diagonal run-length islands "
    "per doc pair); the within-doc twin is repeated_span_removal",
)
def q_cross_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import cross_doc_spans

    d = table(spark, sf_dir, "documents")
    return cross_doc_spans(d, min_tokens=8, max_gram_df=10)


@_q(
    "decontaminate_bloom",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                   i -> array_to_string(words[i:i+2], ' '))) AS shingle
      FROM norm
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0),
    contam AS (
      SELECT DISTINCT doc_id FROM sh WHERE shingle IN (SELECT shingle FROM bench)
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = d.doc_id)
    """,
    "decontaminate_benchmark behind a distributed Bloom pre-filter: the "
    "benchmark shingle set collapses to a bitmap frame (bit_or agg, "
    "~10 bits/member — broadcastable where 10^9 raw shingle strings are "
    "not), corpus shingles probe it with k map-side joins (zero "
    "shuffle), and only might-member candidates reach the exact "
    "semi-join — same oracle as the exact form because the Bloom stage "
    "is pure pruning (no false negatives by construction)",
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import decontaminate_bloom

    d = table(spark, sf_dir, "documents")
    bench = d.filter((F.col("doc_id") % 37) == 0)
    return decontaminate_bloom(d, bench, verify=True).select(
        "doc_id", "lang", "source", "n_chars"
    )


@_q(
    "embedding_label_outliers",
    """
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, label,
             unnest(range(1, len(e) + 1)) AS pos,
             unnest(e) AS x
      FROM v
    ),
    cent AS (SELECT label, pos, avg(x) AS m FROM ex GROUP BY label, pos),
    pv AS (
      SELECT e.vec_id, e.label, sum(e.x * c.m) AS dot, sum(e.x * e.x) AS v2
      FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
      GROUP BY e.vec_id, e.label
    ),
    cn AS (SELECT label, sum(m * m) AS c2 FROM cent GROUP BY label),
    scored AS (
      SELECT pv.label, vec_id,
             round(CASE WHEN v2 * c2 = 0 THEN 0
                        ELSE dot / sqrt(v2 * c2) END, 4) AS centroid_sim
      FROM pv JOIN cn ON pv.label = cn.label
    )
    SELECT label, vec_id, centroid_sim, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY label
                                       ORDER BY centroid_sim ASC, vec_id ASC) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
    "per-label outlier mining: cosine of each vector to its label "
    "centroid (element-wise mean), 5 least-central per label — the "
    "prototype-distance detector for mislabeled/noisy supervised "
    "examples; all JVM expressions (posexplode + partial-agg means, "
    "broadcast centroid join, per-label rank window)",
)
def q_embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import (
        embedding_label_outliers,
    )

    e = table(spark, sf_dir, "embeddings")
    return embedding_label_outliers(e, k=5)


@_q(
    "epoch_budget_allocation",
    """
    WITH per_source AS (
      SELECT source,
             CAST(sum(CASE WHEN trim(text) = '' THEN 0
                           ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) END)
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT source, n_tokens, n_tokens * 4 AS cap,
             row_number() OVER (ORDER BY n_tokens * 4 ASC, source ASC) AS i,
             sum(n_tokens * 4) OVER (ORDER BY n_tokens * 4 ASC, source ASC
                                     ROWS UNBOUNDED PRECEDING) AS cum
      FROM per_source
    ),
    totals AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST((sum(n_tokens) * 2) // 1 AS BIGINT) AS b
      FROM per_source
    ),
    sized AS (
      SELECT r.*, t.n, t.b,
             (r.cap * (t.n - r.i + 1) + (r.cum - r.cap)) < t.b AS bound
      FROM ranked r CROSS JOIN totals t
    ),
    thresh AS (
      SELECT coalesce(max(CASE WHEN bound THEN i END), 0) AS k,
             CAST(coalesce(max(CASE WHEN bound THEN cum END), 0) AS BIGINT) AS ck
      FROM sized
    ),
    alloc AS (
      SELECT s.*, th.k, th.ck,
             CASE WHEN s.n > th.k
                  THEN CAST((s.b - th.ck) // (s.n - th.k) AS BIGINT) END AS share
      FROM sized s CROSS JOIN thresh th
    )
    SELECT source, n_tokens, CAST(cap AS BIGINT) AS cap_tokens,
           CAST(CASE WHEN bound THEN cap ELSE least(cap, share) END AS BIGINT)
             AS alloc_tokens,
           round(CAST(CASE WHEN bound THEN cap ELSE least(cap, share) END AS DOUBLE)
                 / n_tokens, 4) AS epochs
    FROM alloc
    """,
    "data-constrained token-budget allocation (Muennighoff et al. 2023): "
    "water-fill a 2x-corpus training budget across sources, each capped "
    "at 4 epochs of its unique tokens — closed-form (rank + prefix sums "
    "+ one scalar threshold, no iteration), integer div end-to-end, and "
    "every window ranks the per-SOURCE frame (bounded by source count)",
)
def q_epoch_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import epoch_budget_allocation

    d = table(spark, sf_dir, "documents")
    return epoch_budget_allocation(d, budget_num=2, budget_den=1, max_epochs=4)


def _pagerank_oracle(iters: int = 3) -> str:
    """Unrolled power-method CTE chain over the MinHash candidate graph.
    The damping constants are CAST(... AS DOUBLE) BEFORE any arithmetic
    (a bare 0.85 parses as DECIMAL in DuckDB and 1 - 0.85 would yield
    decimal 0.15, not the IEEE 0.15000000000000002 Spark computes)."""
    d = "CAST(0.85 AS DOUBLE)"
    parts = [
        "pr0 AS (SELECT u AS node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM deg)"
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""pr{t} AS (
      SELECT e.v AS node,
             (CAST(1 AS DOUBLE) - {d}) / (SELECT n FROM nn)
               + {d} * sum(p.pr / d2.deg) AS pr
      FROM e2 e JOIN deg d2 ON e.u = d2.u JOIN pr{t-1} p ON p.node = e.u
      GROUP BY e.v)"""
        )
    return ",\n    ".join(parts) + f"""
    SELECT p.node, d3.deg AS degree, round(p.pr, 6) AS pagerank
    FROM pr{iters} p JOIN deg d3 ON p.node = d3.u"""


@_q(
    "dedup_graph_pagerank",
    f"""
    WITH {_minhash_sha_ctes()},
    e2 AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e2 GROUP BY u),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    {_pagerank_oracle(3)}
    """,
    "PageRank centrality over the MinHash near-dup candidate graph "
    "(3 power-method rounds, damping 0.85): the highest-rank node of a "
    "duplicate cluster is its most-connected variant — a principled "
    "canonical-document choice; iterate localCheckpoint'ed per round "
    "(the connected-components plan-doubling lesson), oracle unrolled "
    "CTE-per-iteration",
)
def q_dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        graph_pagerank,
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents")
    return graph_pagerank(minhash_lsh_candidates_sha(d), iters=3)


# Shared classifier CTEs: tokens -> sha256 feature buckets -> integer model
# weights -> per-doc exact-bigint sum (doc_id, n_tokens, s).  Used by both
# quality_classifier_score (the scores) and classifier_auc (the eval).
_CLS_CTES = f"""{_TOKPOS_SQL},
    h AS (SELECT doc_id, sha256(term) AS hx FROM t2),
    b AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS bucket
      FROM h
    ),
    wtd AS (
      SELECT doc_id,
             CAST((bucket * 2654435761) % 65536 - 32768 AS BIGINT) AS w_int
      FROM b
    ),
    cls_agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(w_int) AS BIGINT) AS s
      FROM wtd GROUP BY doc_id
    )"""


@_q(
    "classifier_auc",
    f"""
    WITH {_CLS_CTES},
    sc AS (
      SELECT doc_id,
             CAST(floor(CAST(s AS DOUBLE) / (CAST(32768 AS DOUBLE) * n_tokens)
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS si
      FROM cls_agg
    ),
    lab AS (
      SELECT sc.si, CAST(d.lang = 'en' AS INT) AS y
      FROM sc JOIN documents d USING (doc_id)
    ),
    hist AS (
      SELECT si, CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(1 - y) AS BIGINT) AS n_neg
      FROM lab GROUP BY si
    ),
    c AS (
      SELECT si, n_pos, n_neg,
             COALESCE(sum(n_neg) OVER (ORDER BY si
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS negs_below
      FROM hist
    ),
    t AS (
      SELECT CAST(sum(2 * n_pos * negs_below + n_pos * n_neg) AS BIGINT) AS u2,
             CAST(sum(n_pos) AS BIGINT) AS p,
             CAST(sum(n_neg) AS BIGINT) AS n
      FROM c
    )
    SELECT round(CAST(u2 AS DOUBLE) / (CAST(2 AS DOUBLE) * p * n), 6) AS auc,
           p AS n_pos, n AS n_neg
    FROM t
    """,
    "exact ROC-AUC (Mann-Whitney rank-sum) of the hashed linear classifier "
    "against an is-English relevance label — the retrain eval gate. Scores "
    "collapse to a (score, n_pos, n_neg) histogram before any ordering and "
    "the negatives-below prefix sum rides global_rank_cumsum (range-"
    "partitioned two-pass), so no unpartitioned window at any cardinality; "
    "exact bigint numerators, one final division",
)
def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import (
        exact_auc,
        hashed_linear_score,
        model_weights_table,
    )

    d = table(spark, sf_dir, "documents")
    scored = hashed_linear_score(d, model_weights_table(spark)).select(
        "doc_id", F.round(F.col("logit") * F.lit(1e6)).cast("long").alias("si")
    )
    labeled = scored.join(
        d.select("doc_id", (F.col("lang") == "en").cast("int").alias("y")), "doc_id"
    )
    return exact_auc(labeled, "si", "y")


@_q(
    "bitext_mine_margin",
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    n AS (
      SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
    ),
    a AS (SELECT * FROM n WHERE vec_id % 2 = 0),
    b AS (SELECT * FROM n WHERE vec_id % 2 = 1),
    sc AS (
      SELECT a.vec_id AS qa, b.vec_id AS qb,
             CAST(round(CASE WHEN a.nrm * b.nrm = 0 THEN 0
                             ELSE list_sum(list_transform(range(1, len(a.e) + 1),
                                                          i -> a.e[i] * b.e[i]))
                                  / (a.nrm * b.nrm) END * 1000000) AS BIGINT) AS mc
      FROM a JOIN b ON true
    ),
    ra AS (SELECT qa, qb, mc, row_number() OVER (PARTITION BY qa
                 ORDER BY mc DESC, qb ASC) AS rk FROM sc),
    rb AS (SELECT qa, qb, mc, row_number() OVER (PARTITION BY qb
                 ORDER BY mc DESC, qa ASC) AS rk FROM sc),
    suma AS (SELECT qa, CAST(sum(mc) AS BIGINT) AS sa,
                    CAST(count(*) AS BIGINT) AS ka FROM ra WHERE rk <= 4 GROUP BY qa),
    sumb AS (SELECT qb, CAST(sum(mc) AS BIGINT) AS sb,
                    CAST(count(*) AS BIGINT) AS kb FROM rb WHERE rk <= 4 GROUP BY qb),
    bf AS (SELECT qa, qb, mc FROM ra WHERE rk = 1),
    bb AS (SELECT qa, qb FROM rb WHERE rk = 1),
    mutual AS (SELECT bf.* FROM bf JOIN bb ON bf.qa = bb.qa AND bf.qb = bb.qb)
    SELECT m.qa AS src_id, m.qb AS tgt_id,
           CAST(m.mc AS DOUBLE) / 1000000 AS cosine_sim,
           round((CAST(2 AS DOUBLE) * m.mc * suma.ka * sumb.kb)
                 / (suma.sa * sumb.kb + sumb.sb * suma.ka), 6) AS margin
    FROM mutual m JOIN suma ON m.qa = suma.qa JOIN sumb ON m.qb = sumb.qb
    """,
    "margin-based bitext mining (Artetxe & Schwenk: the CCMatrix/LASER "
    "parallel-pair harvest): mutual nearest neighbors between two embedding "
    "corpora scored by ratio margin — cosine over the mean of each side's "
    "top-4 neighborhood, cancelling hubness. Two cogrouped block-nested-"
    "loop top-k passes (no driver collect, IVF-swappable), exact bigint "
    "micro-cos margin arithmetic with one final division",
)
def q_bitext_mine_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import bitext_margin_mine

    emb = table(spark, sf_dir, "embeddings")
    side_a = emb.filter(F.col("vec_id") % 2 == 0)
    side_b = emb.filter(F.col("vec_id") % 2 == 1)
    return bitext_margin_mine(side_a, side_b, k=4)


@_q(
    "incremental_agg_refresh",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(round(value * 100)) AS BIGINT) AS value_cents
    FROM events GROUP BY user_id
    """,
    "incremental materialized-aggregate maintenance: the stored per-user "
    "rollup (events before Jan 20, localCheckpoint'ed to stand in for the "
    "persisted MV — the base log is NOT rescanned) merged with the delta "
    "batch by monoid re-reduction; the oracle is the full recompute the "
    "refresh must equal. Refresh cost scales with |delta| + |keys|, not "
    "history; exact-integer cents",
)
def q_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import merge_agg_states

    ev = table(spark, sf_dir, "events").withColumn(
        "__cents", F.round(F.col("value") * 100).cast("long")
    )
    cutoff = F.lit("2024-01-20").cast("timestamp")

    def rollup(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.sum("__cents").alias("value_cents")
        )

    # the stored MV: aggregated once, pinned — downstream must not re-derive
    base = rollup(ev.filter(F.col("ts") < cutoff)).localCheckpoint(eager=False)
    # null event times are unroutable by the cutoff predicate (NULL < x is
    # NULL -> dropped by BOTH filters) — they ride the delta leg, so the
    # refresh still equals the full recompute the oracle runs
    delta = rollup(ev.filter((F.col("ts") >= cutoff) | F.col("ts").isNull()))
    return merge_agg_states(base, delta, ["user_id"])


@_q(
    "interval_overlap_sessions",
    """
    WITH l AS (
      SELECT user_id, CAST(ts AS DATE) AS l_day,
             CAST(min(epoch_us(ts)) AS BIGINT) AS l_start_us,
             CAST(max(epoch_us(ts)) AS BIGINT) AS l_end_us
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, CAST(ts AS DATE) AS r_day,
             CAST(min(epoch_us(ts)) AS BIGINT) AS r_start_us,
             CAST(max(epoch_us(ts)) AS BIGINT) AS r_end_us
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT l.user_id, CAST(l.l_day AS VARCHAR) AS l_day,
           CAST(r.r_day AS VARCHAR) AS r_day,
           l_start_us, l_end_us, r_start_us, r_end_us,
           least(l_end_us, r_end_us) - greatest(l_start_us, r_start_us)
             AS overlap_us
    FROM l JOIN r ON l.user_id = r.user_id
     AND l_start_us <= r_end_us AND r_start_us <= l_end_us
    """,
    "interval x interval overlap join (click bursts vs purchase bursts per "
    "user-day) via grid blocking: each interval fans out to the 6h buckets "
    "it covers, EQUI join on (user, bucket), exact predicate filter, and "
    "first-shared-bucket emission for exactly-once — O(local density), "
    "never the O(n*m) theta nested loop the oracle runs",
)
def q_interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.joins import interval_overlap_join

    ev = table(spark, sf_dir, "events")

    def bursts(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(
                "user_id",
                F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
            )
            .agg(
                F.min(F.unix_micros("ts")).alias("start_us"),
                F.max(F.unix_micros("ts")).alias("end_us"),
            )
        )

    res = interval_overlap_join(
        bursts("click"),
        bursts("purchase"),
        key="user_id",
        bucket_width_us=6 * 3_600_000_000,
    )
    return res.select(
        "user_id",
        "l_day",
        "r_day",
        F.col("l_start_us"),
        F.col("l_end_us"),
        F.col("r_start_us"),
        F.col("r_end_us"),
        "overlap_us",
    )


@_q(
    "rolling_7day_active_users",
    """
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    cov AS (
      SELECT DISTINCT d.day AS as_of_day, u.user_id
      FROM ud u JOIN days d ON d.day BETWEEN u.day AND u.day + 6
    )
    SELECT CAST(as_of_day AS VARCHAR) AS as_of_day,
           CAST(count(*) AS BIGINT) AS n_active
    FROM cov GROUP BY 1
    """,
    "rolling 7-day distinct active users per observed day (the WAU "
    "denominator): (user, day) dedup first, bounded 7x fan-out of THAT "
    "frame to the as-of days each active day feeds, second pair dedup, "
    "count per day — exact sliding distinct with no per-day re-scan and "
    "no single-task window; the oracle's BETWEEN join is the O(days x "
    "users) form this replaces",
)
def q_rolling_7day_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.windows import rolling_distinct_active

    ev = table(spark, sf_dir, "events")
    res = rolling_distinct_active(ev, "ts", "user_id", window_days=7)
    return res.select(
        F.date_format("as_of_day", "yyyy-MM-dd").alias("as_of_day"), "n_active"
    )


@_q(
    "classifier_calibration",
    f"""
    WITH {_CLS_CTES},
    sc AS (
      SELECT doc_id,
             CAST(floor(CAST(s AS DOUBLE) / (CAST(32768 AS DOUBLE) * n_tokens)
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS si
      FROM cls_agg
    ),
    lab AS (
      SELECT sc.si,
             least(9, greatest(0, CAST(floor((CAST(sc.si AS DOUBLE) / 1000000
                                              - CAST(-1.0 AS DOUBLE)) / CAST(0.2 AS DOUBLE))
                                       AS INT))) AS bin,
             CAST(d.lang = 'en' AS INT) AS y
      FROM sc JOIN documents d USING (doc_id)
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           round(CAST(sum(si) AS DOUBLE) / count(*) / 1000000, 6) AS mean_score,
           round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos
    FROM lab GROUP BY bin
    """,
    "reliability-diagram calibration bins for the hashed linear classifier "
    "(10 equal-width logit bins over [-1, 1]): per-bin count, mean score "
    "(exact bigint micro-score sum), and positive fraction — the companion "
    "read to classifier_auc; one groupBy on a 10-ary key, trivially "
    "broadcastable at any corpus size",
)
def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import (
        calibration_bins,
        hashed_linear_score,
        model_weights_table,
    )

    d = table(spark, sf_dir, "documents")
    scored = hashed_linear_score(d, model_weights_table(spark)).join(
        d.select("doc_id", (F.col("lang") == "en").cast("int").alias("y")), "doc_id"
    )
    return calibration_bins(scored, "logit", "y", n_bins=10, lo=-1.0, hi=1.0)


@_q(
    "cdc_latest_state",
    """
    WITH ranked AS (
      SELECT user_id, event_type, ts, round(value * 100) AS cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           event_type AS last_op,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           CAST(cents AS BIGINT) AS value_cents
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
    "CDC apply: materialize latest state from a changelog — per key the "
    "greatest (ts, event_id) row wins, delete tombstones ('error' here) "
    "erase the key. One shuffle on the key, per-key frame bounded by that "
    "key's change history; (ts, event_id) compound order so same-instant "
    "updates cannot tie-break nondeterministically",
)
def q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import cdc_apply_latest

    ev = table(spark, sf_dir, "events")
    latest = cdc_apply_latest(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        op_col="event_type",
        delete_op="error",
    )
    return latest.select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )


def _hex_int_sql(hx: str, start: int, n: int) -> str:
    """DuckDB SQL decoding `n` hex chars of expression `hx` (1-based
    `start`) into a BIGINT — DuckDB has no conv(); nibble-by-nibble
    strpos decode, the same trick the classifier oracle uses."""
    terms = [
        f"(strpos('0123456789abcdef', substr({hx}, {start + i}, 1)) - 1)"
        + (f" * {16 ** (n - 1 - i)}" if n - 1 - i > 0 else "")
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


_HLL_ALPHA_NUM = repr((0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 * float(1 << 52))


@_q(
    "hll_distinct_users",
    f"""
    WITH h AS (
      -- NULL keys excluded (matches the Spark side and COUNT(DISTINCT))
      SELECT sha256(CAST(user_id AS VARCHAR)) AS hx FROM events
      WHERE user_id IS NOT NULL
    ),
    rv AS (
      SELECT {_hex_int_sql('hx', 1, 2)} AS reg,
             {_hex_int_sql('hx', 3, 13)} AS v
      FROM h
    ),
    regs AS (
      -- rho capped at 52 (matches the Spark side): the v=0 register's
      -- 2^(52-53) contribution is fractional and would corrupt the exact
      -- bigint accumulator on both engines
      SELECT reg,
             max(CASE WHEN v = 0 THEN 52 ELSE 53 - length(bin(v)) END) AS M
      FROM rv GROUP BY reg
    ),
    stats AS (
      SELECT CAST(sum(CAST(1 AS BIGINT) << (52 - M)) AS BIGINT) AS zsum,
             CAST(count(*) AS BIGINT) AS nreg
      FROM regs
    ),
    est AS (
      SELECT CAST({_HLL_ALPHA_NUM} AS DOUBLE)
               / (zsum + (256 - nreg) * CAST({float(1 << 52)!r} AS DOUBLE)) AS raw,
             CAST(256 - nreg AS DOUBLE) AS zeros
      FROM stats
    ),
    fin AS (
      SELECT CASE WHEN raw < 640.0 AND zeros > 0
                  THEN 256.0 * ln(256.0 / zeros) ELSE raw END AS e
      FROM est
    )
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_exact,
           round(e, 4) AS estimate,
           round((e - (SELECT count(DISTINCT user_id) FROM events))
                 / (SELECT count(DISTINCT user_id) FROM events), 4) AS rel_error
    FROM fin
    """,
    "HyperLogLog distinct-user sketch (256 registers, sha256-derived so "
    "the oracle reproduces it bit-for-bit; production swaps xxhash64): "
    "register-wise MAX state merges across partitions/days without raw "
    "re-reads, harmonic mean on an exact bigint 2^(52-M) accumulator, "
    "linear-counting small-range correction; output pairs the estimate "
    "with the exact count for the evaluation read",
)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import hll_distinct

    ev = table(spark, sf_dir, "events")
    return hll_distinct(ev, "user_id", b=8)


@_q(
    "countmin_heavy_hitters",
    f"""
    WITH rows_ AS (
      -- NULL keys excluded on both engines: sha2(NULL) -> NULL bucket would
      -- silently drop a NULL-key top row at the probe join while the
      -- engines' NULL sort orders disagree on whether it enters the top-N
      SELECT user_id,
             {_hex_int_sql("sha256('0|' || CAST(user_id AS VARCHAR))", 1, 4)} % 1024 AS b0,
             {_hex_int_sql("sha256('1|' || CAST(user_id AS VARCHAR))", 1, 4)} % 1024 AS b1
      FROM events WHERE user_id IS NOT NULL
    ),
    s0 AS (SELECT b0, CAST(count(*) AS BIGINT) AS e0 FROM rows_ GROUP BY b0),
    s1 AS (SELECT b1, CAST(count(*) AS BIGINT) AS e1 FROM rows_ GROUP BY b1),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact,
             arg_min(b0, user_id) AS b0, arg_min(b1, user_id) AS b1
      FROM rows_ GROUP BY user_id
    ),
    top AS (
      SELECT * FROM exact ORDER BY n_exact DESC, user_id ASC LIMIT 10
    )
    SELECT t.user_id, t.n_exact,
           least(s0.e0, s1.e1) AS estimate,
           least(s0.e0, s1.e1) - t.n_exact AS overcount
    FROM top t JOIN s0 ON t.b0 = s0.b0 JOIN s1 ON t.b1 = s1.b1
    """,
    "count-min sketch frequency estimates vs exact counts for the top-10 "
    "users: 2 x 1024 integer cells regardless of input size, cell-wise "
    "additive merge, min-over-rows point estimates that only ever "
    "overcount — the fixed-state answer when the key space outgrows a "
    "groupBy; sha256 row hashes keep the sketch oracle-reproducible",
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        countmin_heavy_hitters,
    )

    ev = table(spark, sf_dir, "events")
    return countmin_heavy_hitters(ev, "user_id", width=1024, depth=2, top_n=10)


@_q(
    "k_anonymity_audit",
    """
    SELECT c_mktsegment, c_nationkey,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           CAST(count(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY 1, 2, 3
    HAVING count(*) < 5
    """,
    "k-anonymity release audit (k=5) over the quasi-identifier tuple "
    "(segment, nation, account-balance band): every combination shared by "
    "fewer than k customers is linkable against outside data and must be "
    "suppressed/generalized before the dataset ships. Map-side-combined "
    "groupBy; output bounded by the RARE combinations only",
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.projections import k_anonymity_audit

    c = table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return k_anonymity_audit(c, ["c_mktsegment", "c_nationkey", "bal_band"], k=5)


@_q(
    "join_size_from_histograms",
    """
    WITH a AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS na
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    b AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS nb
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT CAST(sum(a.na * b.nb) AS BIGINT) AS join_rows,
           CAST(count(*) AS BIGINT) AS matched_keys,
           CAST(max(a.na * b.nb) AS BIGINT) AS hottest_key_rows
    FROM a JOIN b USING (user_id)
    """,
    "join-size accounting from per-key histograms: |A ⋈ B| = Σ_k "
    "cntA(k)·cntB(k) computed WITHOUT materializing the join — the "
    "pre-flight a pipeline runs before an expensive equi-join to size "
    "shuffle partitions and spot the hottest key (skew salting "
    "decision). Two map-side-combined groupBys + a key-cardinality "
    "join; the oracle proves the arithmetic equals the real join",
)
def q_join_size_from_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def hist(etype: str, alias: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.count("*").alias(alias))
        )

    joined = hist("click", "na").join(hist("purchase", "nb"), "user_id")
    return joined.agg(
        F.sum(F.col("na") * F.col("nb")).alias("join_rows"),
        F.count("*").alias("matched_keys"),
        F.max(F.col("na") * F.col("nb")).alias("hottest_key_rows"),
    )


def _zorder_oracle() -> str:
    from wellmeet_data_pipeline_spark.operators.bucketing import (
        norm_to_grid_sql,
        zorder_bits_sql,
    )

    gx = norm_to_grid_sql("user_id", "xmin", "xmax", 8)
    gy = norm_to_grid_sql("cents", "ymin", "ymax", 8)
    z = zorder_bits_sql(gx, gy, 8)
    return f"""
    WITH e AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ),
    rng AS (
      SELECT min(user_id) AS xmin, max(user_id) AS xmax,
             min(cents) AS ymin, max(cents) AS ymax
      FROM e
    )
    SELECT ({z}) >> 10 AS zbucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(user_id) AS BIGINT) AS x_min,
           CAST(max(user_id) AS BIGINT) AS x_max,
           CAST(min(cents) AS BIGINT) AS y_min,
           CAST(max(cents) AS BIGINT) AS y_max
    FROM e CROSS JOIN rng
    GROUP BY 1
    """


@_q(
    "zorder_layout_stats",
    _zorder_oracle(),
    "Z-order (Morton) layout audit over (user_id, value_cents): rows map "
    "onto a 256x256 equi-width grid (exact integer division), bits "
    "interleave into a Z value, and per Z-bucket min/max bounds show the "
    "TIGHT two-dimensional boxes that make parquet footer stats skip "
    "files under conjunctive predicates — the multi-column layout lever "
    "at 100 TB; the Spark plan and the oracle share ONE generated SQL "
    "expression for the interleave",
)
def q_zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.bucketing import zorder_bucket_stats

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return zorder_bucket_stats(ev, "user_id", "cents", bits=8, bucket_shift=10)


@_q(
    "dup_cluster_size_histogram",
    f"""
    WITH RECURSIVE {_minhash_sha_ctes()},
    e2 AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM e2
      UNION
      SELECT e.u, r.r FROM e2 e JOIN reach r ON e.v = r.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    sizes AS (
      SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY component
    )
    SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(count(*) * (cluster_size - 1) AS BIGINT) AS removable_docs
    FROM sizes GROUP BY cluster_size
    """,
    "duplicate-cluster size distribution (the standard pre-dedup corpus "
    "report): connected components over the MinHash candidate graph → "
    "cluster sizes → histogram with per-size removable-doc counts (size-1 "
    "per cluster under keep-one) — the number that forecasts corpus "
    "shrinkage BEFORE committing the destructive pass. Star-contraction "
    "components + two tiny groupBys; oracle is the recursive-CTE fixpoint",
)
def q_dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        connected_components,
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents")
    comp = connected_components(minhash_lsh_candidates_sha(d))
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.count("*") * (F.col("cluster_size") - 1)).alias("removable_docs"),
    )


@_q(
    "bitext_mine_margin_ivf",
    None,
    "the SCALE tier of bitext_mine_margin: the two mutual-NN top-k passes "
    "run on two-sided IVF (index trained on each direction's candidate "
    "corpus) instead of the quadratic exact BNL — smoke-measured 26x "
    "cheaper at 64x with slope 0.55; approximate candidate source makes "
    "the pair set data-dependent (rows-only check), the margin arithmetic "
    "and the exact oracle-backed twin are unchanged",
)
def q_bitext_mine_margin_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import bitext_margin_mine

    emb = table(spark, sf_dir, "embeddings")
    side_a = emb.filter(F.col("vec_id") % 2 == 0)
    side_b = emb.filter(F.col("vec_id") % 2 == 1)
    return bitext_margin_mine(side_a, side_b, k=4, method="ivf", nprobe=4)


@_q(
    "hll_distinct_by_type",
    f"""
    WITH h AS (
      SELECT event_type, sha256(CAST(user_id AS VARCHAR)) AS hx FROM events
      WHERE user_id IS NOT NULL
    ),
    rv AS (
      SELECT event_type,
             {_hex_int_sql('hx', 1, 2)} AS reg,
             {_hex_int_sql('hx', 3, 13)} AS v
      FROM h
    ),
    regs AS (
      SELECT event_type, reg,
             max(CASE WHEN v = 0 THEN 52 ELSE 53 - length(bin(v)) END) AS M
      FROM rv GROUP BY event_type, reg
    ),
    stats AS (
      SELECT event_type,
             CAST(sum(CAST(1 AS BIGINT) << (52 - M)) AS BIGINT) AS zsum,
             CAST(count(*) AS BIGINT) AS nreg
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             CAST({_HLL_ALPHA_NUM} AS DOUBLE)
               / (zsum + (256 - nreg) * CAST({float(1 << 52)!r} AS DOUBLE)) AS raw,
             CAST(256 - nreg AS DOUBLE) AS zeros
      FROM stats
    ),
    fin AS (
      SELECT event_type,
             CASE WHEN raw < 640.0 AND zeros > 0
                  THEN 256.0 * ln(256.0 / zeros) ELSE raw END AS e
      FROM est
    ),
    ex AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT f.event_type, ex.n_exact, round(f.e, 4) AS estimate,
           round((f.e - ex.n_exact) / ex.n_exact, 4) AS rel_error
    FROM fin f JOIN ex ON f.event_type IS NOT DISTINCT FROM ex.event_type
    """,
    "per-group HyperLogLog distinct users by event_type — the mergeable-"
    "rollup shape in action: each group's 256-register frame is the "
    "rollup unit that later MAX-merges into coarser periods without "
    "touching raw data; same exact-bigint harmonic accumulator and "
    "linear-counting correction as the global sketch",
)
def q_hll_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import hll_distinct

    ev = table(spark, sf_dir, "events")
    return hll_distinct(ev, "user_id", b=8, group_cols=["event_type"])


@_q(
    "decayed_user_value",
    """
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(round(value * 100)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT max(day) AS mday FROM d),
    wtd AS (
      SELECT user_id,
             cents,
             CAST(floor(pow(0.9, date_diff('day', day, mday))
                        * 1000000000 + 0.5) AS BIGINT) AS w9
      FROM d CROSS JOIN mx
    )
    SELECT user_id,
           CAST(sum(cents * w9) AS BIGINT) AS decayed_micro,
           round(CAST(sum(cents * w9) AS DOUBLE) / 1000000000 / 100, 2)
             AS decayed_value
    FROM wtd GROUP BY user_id
    """,
    "time-decayed per-user value (0.9^age_days half-life weighting — the "
    "recency-weighted LTV / hot-user score every analytics stack keeps): "
    "day-grain exact-cent sums first, then ONE decay weight per distinct "
    "age snapped to a 1e-9 integer grid, so the weighted sum is an exact "
    "bigint regardless of aggregation order; the lone pow() carries the "
    "same measure-zero 1-ulp caveat as ln()/exp() elsewhere",
)
def q_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    mx = d.agg(F.max("day").alias("mday"))
    wtd = d.crossJoin(F.broadcast(mx)).withColumn(
        "w9",
        F.floor(
            F.pow(F.lit(0.9), F.datediff(F.col("mday"), F.col("day")))
            * F.lit(1_000_000_000.0)
            + F.lit(0.5)
        ).cast("long"),
    )
    micro = F.sum(F.col("cents") * F.col("w9"))
    return wtd.groupBy("user_id").agg(
        micro.alias("decayed_micro"),
        F.round(micro / F.lit(1_000_000_000.0) / F.lit(100.0), 2).alias(
            "decayed_value"
        ),
    )


# ---------------------------------------------------------------------------
# Driver-evidence rotation (round 4).
#
_SIMHASH_SHA_BITS = 48


def _simhash_sha_oracle() -> str:
    votes = ",\n             ".join(
        f"sum(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(_SIMHASH_SHA_BITS)
    )
    acc = "\n           + ".join(
        f"(CASE WHEN v{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE CAST(0 AS BIGINT) END)"
        for i in range(_SIMHASH_SHA_BITS)
    )
    return f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(words) - 1, 0) + 1),
                                   i -> array_to_string(words[i:i+1], ' '))) AS shingle
      FROM norm
    ),
    hx AS (SELECT doc_id, sha256(shingle) AS sx FROM sh),
    hv AS (SELECT doc_id, {_hex_int_sql('sx', 1, 12)} AS h FROM hx),
    votes AS (
      SELECT doc_id,
             {votes}
      FROM hv GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id,
           CAST({acc} AS BIGINT) AS simhash
      FROM votes
    ),
    banded AS (
      SELECT doc_id, simhash, b.band,
             ((simhash >> (b.band * 12)) & 4095) AS slice
      FROM sig, (SELECT unnest(range(0, 4)) AS band) b
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.slice = b.slice
      WHERE a.doc_id < b.doc_id
        AND bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    deg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near_dups
      FROM (SELECT id_a AS doc_id FROM pairs UNION ALL SELECT id_b FROM pairs)
      GROUP BY doc_id
    )
    SELECT s.doc_id, s.simhash, COALESCE(d.n_near_dups, 0) AS n_near_dups
    FROM sig s LEFT JOIN deg d USING (doc_id)
    """


@_q(
    "dedup_simhash_sha",
    _simhash_sha_oracle(),
    "sha256-derived 48-bit SimHash near-dup profile — the oracle-checkable "
    "twin of the xxhash64 SimHash (which stays the scale default): every "
    "doc's fingerprint + its hamming<=3 near-dup degree through the banded-"
    "prefix candidate join (4 bands x 12 bits, pigeonhole-complete), so "
    "the whole fingerprint->band->bucket-join->bit_count topology is hash-"
    "verified on full-corpus output",
)
def q_simhash_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        simhash_sha_near_dup_profile,
    )

    d = table(spark, sf_dir, "documents")
    return simhash_sha_near_dup_profile(d)


def _embedding_lsh_sha_oracle() -> str:
    sign_nibble = _hex_int_sql(
        "sha256(CAST(p.p AS VARCHAR) || '|' || CAST(d.d AS VARCHAR))", 1, 1
    )
    return f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                      AS BIGINT)) AS q
      FROM embeddings
      WHERE embedding IS NOT NULL
        AND len(embedding) = (SELECT max(len(embedding)) FROM embeddings
                              WHERE embedding IS NOT NULL)
    ),
    dims AS (
      SELECT unnest(range(0, (SELECT max(len(q)) FROM qv))) AS d
    ),
    signs AS (
      SELECT p.p, d.d,
             CASE WHEN ({sign_nibble}) % 2 = 0 THEN 1 ELSE -1 END AS s
      FROM (SELECT unnest(range(0, 16)) AS p) p, (SELECT d FROM dims) d
    ),
    qd AS (
      SELECT vec_id, d.d AS d, q[CAST(d.d AS INTEGER) + 1] AS qx
      FROM qv, dims d
    ),
    dots AS (
      SELECT qd.vec_id, signs.p, CAST(sum(qd.qx * signs.s) AS BIGINT) AS dot
      FROM qd JOIN signs ON qd.d = signs.d
      GROUP BY 1, 2
    ),
    sig AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p)
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
      FROM dots GROUP BY vec_id
    ),
    banded AS (
      SELECT vec_id, simhash, b.band,
             ((simhash >> (b.band * 4)) & 15) AS slice
      FROM sig, (SELECT unnest(range(0, 4)) AS band) b
    ),
    pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      FROM banded a JOIN banded b ON a.band = b.band AND a.slice = b.slice
      WHERE a.vec_id < b.vec_id
        AND bit_count(xor(a.simhash, b.simhash)) <= 3
    )
    SELECT p.id_a, p.id_b, p.hamming,
           round(CASE WHEN sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)) = 0
                      THEN 0
                      ELSE CAST(dq AS DOUBLE)
                           / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))
                 END, 6) AS cosine_sim
    FROM (
      SELECT p.id_a, p.id_b, p.hamming,
             CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                                          i -> a.q[i] * b.q[i])) AS BIGINT) AS dq,
             CAST(list_sum(list_transform(a.q, x -> x * x)) AS BIGINT) AS na2,
             CAST(list_sum(list_transform(b.q, x -> x * x)) AS BIGINT) AS nb2
      FROM pairs p JOIN qv a ON p.id_a = a.vec_id JOIN qv b ON p.id_b = b.vec_id
    ) p
    """


@_q(
    "dedup_embedding_lsh_sha",
    _embedding_lsh_sha_oracle(),
    "oracle-checkable embedding-cosine LSH twin: integer-quantized vectors "
    "(floor(x*1e6 + 0.5)), 16 sha-derived ±1 Rademacher hyperplane sign "
    "bits as EXACT integer dot signs, 4x4-bit banding (pigeonhole-complete "
    "for hamming<4), candidate self-join, exact quantized-cosine verify — "
    "every stage integer arithmetic up to one final division, so the "
    "signature, candidate set, and cosine are hash-verified; the Gaussian-"
    "hyperplane Arrow form (dedup_embedding_lsh) stays the scale default",
)
def q_embedding_lsh_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import (
        embedding_lsh_sha_pairs,
    )

    e = table(spark, sf_dir, "embeddings")
    return embedding_lsh_sha_pairs(e)


# ---------------------------------------------------------------------------
# North-star: retrieval over the corpus (BM25 / hybrid RRF / readability)
# ---------------------------------------------------------------------------

# Pinned query term sets for the lexical retrieval queries.  Literal and
# tiny by design: the query side of retrieval is user input, not data —
# pinning makes the oracle a pure VALUES clause and keeps results stable
# across SFs (the generator vocabulary contains every term).
_RETRIEVAL_QUERIES = {
    0: ["fast", "query", "scan"],
    1: ["join", "hash", "merge"],
    2: ["stream", "window", "batch"],
    3: ["customer", "order", "value"],
}

_RETRIEVAL_QT_VALUES = ", ".join(
    f"({q}, '{t}')" for q, terms in sorted(_RETRIEVAL_QUERIES.items()) for t in terms
)

# Shared BM25 CTE chain (tokenize -> tf/dl/df -> exact micro-grid scores).
# Mirrors operators/retrieval.py:bm25_scores expression-tree-for-
# expression-tree: idf is snapped to the micro grid BEFORE the product,
# (k1+1)/(1-b) are COMPUTED from literals on both engines (never
# pre-evaluated, so IEEE tie-to-even on the addition cannot split them),
# and dl/avgdl is the exact bigint product dl*N over total_dl.
_BM25_CTES = f"""
    tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
    ),
    tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    st AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
                  (SELECT CAST(COALESCE(sum(dl), 0) AS BIGINT) FROM dl) AS total_dl),
    qt(query_id, term) AS (VALUES {_RETRIEVAL_QT_VALUES}),
    co AS (
      SELECT qt.query_id, tf.doc_id,
             CAST(floor(
               CAST(CAST(floor(ln(CAST(1 AS DOUBLE)
                     + (CAST(st.n_docs AS DOUBLE) - CAST(dfr.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       / (CAST(dfr.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS DOUBLE)
                 / CAST(1000000 AS DOUBLE)
               * ((CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE)))
                  / (CAST(tf.tf AS DOUBLE)
                     + CAST(1.2 AS DOUBLE) * ((CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE))
                        + CAST(0.75 AS DOUBLE)
                          * (CAST(dl.dl * st.n_docs AS DOUBLE) / CAST(st.total_dl AS DOUBLE)))))
               * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS ci
      FROM qt JOIN tf USING (term) JOIN dfr USING (term)
           JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
    ),
    bs AS (
      SELECT query_id, doc_id, CAST(sum(ci) AS BIGINT) AS s
      FROM co GROUP BY query_id, doc_id
    )"""


@_q(
    "bm25_topk",
    f"""
    WITH {_BM25_CTES}
    SELECT query_id, doc_id,
           CAST(s AS DOUBLE) / CAST(1000000 AS DOUBLE) AS score,
           CAST(rnk AS INTEGER) AS rank
    FROM (
      SELECT query_id, doc_id, s,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, doc_id ASC) AS rnk
      FROM bs)
    WHERE rnk <= 10
    """,
    "Okapi BM25 top-10 per pinned query over the document corpus: one "
    "token pass feeds tf/dl/df, query terms broadcast, scores summed on "
    "the exact micro-integer grid, per-query rank window — the lexical "
    "tier of a RAG retrieval stack (north-star §2.11 extension)",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.retrieval import bm25_topk

    return bm25_topk(table(spark, sf_dir, "documents"), _RETRIEVAL_QUERIES, k=10)


@_q(
    "hybrid_rrf_topk",
    f"""
    WITH {_BM25_CTES},
    bm AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id ASC) AS rnk
        FROM bs)
      WHERE rnk <= 20
    ),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    nn AS (
      SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
    ),
    qv AS (SELECT * FROM nn WHERE vec_id IN (0, 1, 2, 3)),
    sc AS (
      SELECT CAST(a.vec_id AS INTEGER) AS query_id, b.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, len(a.e) + 1),
                                           i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) AS cs
      FROM qv a JOIN nn b ON a.vec_id <> b.vec_id
    ),
    cosleg AS (
      SELECT query_id, neighbor_id, rnk FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, neighbor_id ASC) AS rnk
        FROM sc)
      WHERE rnk <= 20
    ),
    f AS (
      SELECT COALESCE(b.query_id, c.query_id) AS query_id,
             COALESCE(b.doc_id, c.neighbor_id) AS doc_id,
             b.rnk AS rb, c.rnk AS rc
      FROM bm b FULL OUTER JOIN cosleg c
        ON b.query_id = c.query_id AND b.doc_id = c.neighbor_id
    ),
    scored AS (
      SELECT query_id, doc_id, rb, rc,
             COALESCE(CAST(1 AS DOUBLE) / CAST(60 + rb AS DOUBLE), CAST(0 AS DOUBLE))
               + COALESCE(CAST(1 AS DOUBLE) / CAST(60 + rc AS DOUBLE), CAST(0 AS DOUBLE))
               AS rrf_score
      FROM f
    )
    SELECT query_id, doc_id, rrf_score,
           CAST(rb AS INTEGER) AS bm25_rank,
           CAST(rc AS INTEGER) AS cosine_rank,
           CAST(rnk AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id ASC) AS rnk
      FROM scored)
    WHERE rnk <= 10
    """,
    "hybrid retrieval: BM25 top-20 (lexical) fused with exact cosine "
    "top-20 (vector, pinned query ids 0-3 sharing the doc_id domain) by "
    "reciprocal-rank fusion 1/(60+r) — the standard two-tier RAG serving "
    "stack as ONE declarative plan; fusion joins are top-k-list-sized",
)
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.retrieval import bm25_topk, rrf_fuse
    from wellmeet_data_pipeline_spark.operators.similarity import brute_force_top_k

    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id").isin(list(_RETRIEVAL_QUERIES)))
    cos = brute_force_top_k(qv, e, k=20, round_digits=4).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    bm = bm25_topk(d, _RETRIEVAL_QUERIES, k=20).select("query_id", "doc_id", "rank")
    fused = rrf_fuse([bm, cos], k=10)
    return fused.select(
        "query_id",
        "doc_id",
        "rrf_score",
        F.col("rank_0").alias("bm25_rank"),
        F.col("rank_1").alias("cosine_rank"),
        "rank",
    )


@_q(
    "readability_scores",
    """
    WITH r AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s_raw,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
      FROM documents
    ),
    g AS (
      SELECT doc_id, n_words,
             CASE WHEN n_words > 0 THEN greatest(s_raw, CAST(1 AS BIGINT)) END AS n_sentences,
             n_syllables
      FROM r
    ),
    f AS (
      SELECT doc_id, n_words, n_sentences, n_syllables,
             CASE WHEN n_words > 0 THEN
               CAST(floor((CAST(206.835 AS DOUBLE)
                 - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS fl,
             CASE WHEN n_words > 0 THEN
               CAST(floor((CAST(0.39 AS DOUBLE) * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 + CAST(11.8 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
                 - CAST(15.59 AS DOUBLE))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS fk
      FROM g
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(fl AS DOUBLE) / CAST(1000000 AS DOUBLE) AS flesch,
           CAST(fk AS DOUBLE) / CAST(1000000 AS DOUBLE) AS fk_grade,
           CASE WHEN fl IS NULL THEN NULL
                WHEN fl >= 60000000 THEN 'easy'
                WHEN fl >= 30000000 THEN 'standard'
                ELSE 'difficult' END AS readability_band
    FROM f
    """,
    "Flesch reading ease + FK grade per document from regex count proxies "
    "(words / sentence runs / vowel-group syllables) on the exact micro "
    "grid — the cheapest corpus quality signal: zero shuffle, pure "
    "codegen over the scan; NULL/empty docs emit NULL scores",
)
def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.retrieval import readability_scores

    return readability_scores(table(spark, sf_dir, "documents"))


@_q(
    "l_diversity_audit",
    """
    SELECT c_mktsegment, c_nationkey,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT)
             AS distinct_sensitive
    FROM customer
    GROUP BY 1, 2
    HAVING count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 3
    """,
    "l-diversity release audit (l=3), the k-anonymity companion: a "
    "quasi-identifier group (segment, nation) whose sensitive attribute "
    "(balance band) takes fewer than l distinct values leaks it to anyone "
    "who can link the group — one groupBy + count-distinct, output "
    "bounded by the homogeneous groups",
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.projections import l_diversity_audit

    c = table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return l_diversity_audit(c, ["c_mktsegment", "c_nationkey"], "bal_band", l=3)


@_q(
    "trimmed_mean_by_type",
    """
    WITH m AS (
      SELECT event_type,
             CAST(floor(value * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mv
      FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT event_type, mv, CAST(count(*) AS BIGINT) AS cnt FROM m GROUP BY 1, 2),
    c AS (
      SELECT event_type, mv, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY mv
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM g
    ),
    k AS (
      SELECT event_type, mv, cnt, cum, n,
             CAST(floor(CAST(n AS DOUBLE) * CAST(0.1 AS DOUBLE)) AS BIGINT) AS lo
      FROM c
    ),
    kept AS (
      SELECT event_type, mv, n,
             greatest(CAST(0 AS BIGINT),
                      least(cum, n - lo) - greatest(cum - cnt, lo)) AS kc
      FROM k
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_rows,
           CAST(sum(kc) AS BIGINT) AS n_kept,
           (CAST(sum(CAST(mv AS HUGEINT) * kc) AS DOUBLE) / CAST(sum(kc) AS DOUBLE))
             / CAST(1000000 AS DOUBLE) AS trimmed_mean
    FROM kept GROUP BY event_type
    """,
    "10%-trimmed per-type mean of event value — the outlier-resistant "
    "quality rollup: rows collapse to the distinct VALUE GRID, the trim "
    "boundary resolves via integer cumulative counts over that grid "
    "(windows over grid-sized partitions, never row-sized), weighted sum "
    "on an exact wide-integer accumulator, one final division",
)
def q_trimmed_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        trimmed_mean_by_group,
    )

    ev = table(spark, sf_dir, "events")
    return trimmed_mean_by_group(ev, "event_type", "value", trim_frac=0.1)


@_q(
    "bootstrap_mean_ci",
    """
    WITH base AS (
      SELECT event_type, event_id,
             CAST(floor(value * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mv
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
    ),
    rep AS (
      SELECT base.*, t.b
      FROM base, LATERAL (SELECT unnest(range(0, 40)) AS b) t
    ),
    u AS (
      -- one sha256 = 64 hex chars = EIGHT 32-bit uniforms: replica b
      -- reads slice (b % 8) of hash group (b // 8) — mirrors the Spark
      -- side's 8x sha-call reduction exactly
      SELECT event_type, b, mv,
             (CAST(list_sum(list_transform(range(1, 9),
                     i -> CAST(strpos('0123456789abcdef',
                               substr(sha256(concat('bb|', event_id, '|', b // 8)),
                                      CAST(1 + 8 * (b % 8) AS BIGINT) + i - 1, 1)) - 1
                               AS BIGINT) << (4 * (8 - i)))) AS DOUBLE)
              + CAST(1 AS DOUBLE)) / CAST(4294967296 AS DOUBLE) AS unif
      FROM rep
    ),
    wt AS (
      SELECT event_type, b, mv,
             CASE WHEN unif < CAST(0.36787944117144233 AS DOUBLE) THEN CAST(0 AS BIGINT)
                  WHEN unif < CAST(0.7357588823428847 AS DOUBLE) THEN CAST(1 AS BIGINT)
                  WHEN unif < CAST(0.9196986029286058 AS DOUBLE) THEN CAST(2 AS BIGINT)
                  WHEN unif < CAST(0.9810118431238462 AS DOUBLE) THEN CAST(3 AS BIGINT)
                  WHEN unif < CAST(0.9963401531726563 AS DOUBLE) THEN CAST(4 AS BIGINT)
                  WHEN unif < CAST(0.9994058151824183 AS DOUBLE) THEN CAST(5 AS BIGINT)
                  ELSE CAST(6 AS BIGINT) END AS w
      FROM u
    ),
    pr AS (
      SELECT event_type, b,
             CAST(sum(w * mv) AS BIGINT) AS smw, CAST(sum(w) AS BIGINT) AS sw
      FROM wt GROUP BY 1, 2
    ),
    pv AS (
      SELECT event_type, b, CAST(smw AS DOUBLE) / CAST(sw AS DOUBLE) AS mean_b
      FROM pr WHERE sw > 0
    ),
    rk AS (
      SELECT event_type, b, mean_b,
             row_number() OVER (PARTITION BY event_type ORDER BY mean_b ASC, b ASC) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nb
      FROM pv
    ),
    -- alpha is COMPUTED from the same literals as the Spark side
    -- ((1 - 0.95)/2 in doubles is 0.025000000000000022, NOT the literal
    -- 0.025 — at nb = 40 the two ceil() to different order statistics)
    al AS (SELECT (CAST(1 AS DOUBLE) - CAST(0.95 AS DOUBLE)) / CAST(2 AS DOUBLE) AS alpha),
    ci AS (
      SELECT event_type,
             max(CASE WHEN rn = greatest(CAST(1 AS BIGINT),
                          CAST(ceil(CAST(nb AS DOUBLE) * alpha) AS BIGINT))
                      THEN mean_b END) / CAST(1000000 AS DOUBLE) AS ci_lo,
             max(CASE WHEN rn = CAST(ceil(CAST(nb AS DOUBLE)
                          * (CAST(1 AS DOUBLE) - alpha)) AS BIGINT)
                      THEN mean_b END) / CAST(1000000 AS DOUBLE) AS ci_hi,
             CAST(max(nb) AS BIGINT) AS n_replicas_used
      FROM rk CROSS JOIN al GROUP BY event_type
    ),
    pt AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
             (CAST(sum(mv) AS DOUBLE) / CAST(count(*) AS DOUBLE))
               / CAST(1000000 AS DOUBLE) AS mean_value
      FROM base GROUP BY event_type
    )
    SELECT pt.event_type, pt.n_rows, pt.mean_value, ci.ci_lo, ci.ci_hi,
           ci.n_replicas_used
    FROM pt LEFT JOIN ci USING (event_type)
    """,
    "per-type mean with a Poisson-bootstrap 95% CI (bag-of-little-"
    "bootstraps): every row draws a sha-derived Poisson(1) weight per "
    "replica (no resample ever materializes), replica means ride exact "
    "integer grids, CI = order statistics of the 40 replica means; the "
    "40x fan-out feeds a map-side-combined agg so the shuffle carries "
    "|groups| x 40 partials, never 40 x N rows",
)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import bootstrap_mean_ci

    ev = table(spark, sf_dir, "events")
    return bootstrap_mean_ci(
        ev, "event_type", "value", "event_id", n_replicas=40, ci=0.95
    )


@_q(
    "fuzzy_link_records",
    """
    WITH clean AS (
      SELECT c_custkey AS entity_id,
             substr(sha256(CAST(c_custkey AS VARCHAR)), 1, 16) AS name
      FROM customer
    ),
    dirty AS (
      SELECT entity_id AS record_id,
             substr(name, 1, CAST(entity_id % 16 AS INTEGER))
               || substr(name, CAST(entity_id % 16 AS INTEGER) + 2) AS name
      FROM clean WHERE entity_id % 3 = 0
    ),
    dk AS (
      SELECT record_id, name, len(name) AS m, (len(name) + 1) // 2 AS h
      FROM dirty
    ),
    ck AS (
      SELECT entity_id, name, len(name) - 1 AS m, ((len(name) - 1) + 1) // 2 AS h
      FROM clean
    ),
    cand AS (
      SELECT dk.record_id, ck.entity_id, dk.name AS dn, ck.name AS cn
      FROM dk JOIN ck ON dk.m = ck.m
        AND substr(dk.name, 1, CAST(dk.h AS INTEGER))
            = substr(ck.name, 1, CAST(ck.h AS INTEGER))
      UNION
      SELECT dk.record_id, ck.entity_id, dk.name, ck.name
      FROM dk JOIN ck ON dk.m = ck.m
        AND substr(dk.name, CAST(dk.h AS INTEGER) + 1)
            = substr(ck.name, CAST(ck.h AS INTEGER) + 2)
    )
    SELECT record_id, entity_id AS matched_id,
           CAST(levenshtein(dn, cn) AS INTEGER) AS edit_dist,
           record_id = entity_id AS is_true_match
    FROM cand
    WHERE levenshtein(dn, cn) <= 1
    """,
    "record linkage via deletion-neighborhood split-blocking: a dirty "
    "registry (one sha-derived character deleted per name at a key-derived "
    "position) links back to the clean entity table through TWO equi-joins "
    "— (length, prefix half) and (length, suffix half) — which by "
    "pigeonhole cover every single-deletion position (h + s = m < n), "
    "then an exact levenshtein<=1 verify; the naive form is an O(n*m) "
    "cross join with an edit-distance theta filter",
)
def q_fuzzy_link_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.linkage import fuzzy_link_edit1

    c = table(spark, sf_dir, "customer")
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
    return fuzzy_link_edit1(dirty, clean).select(
        "record_id",
        F.col("entity_id").alias("matched_id"),
        "edit_dist",
        (F.col("record_id") == F.col("entity_id")).alias("is_true_match"),
    )


def _source_drift_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT source AS grp, unnest(string_split({_NORM_SQL}, ' ')) AS term
      FROM documents WHERE source IS NOT NULL
    ),
    sc AS (
      SELECT grp, term, CAST(count(*) AS BIGINT) AS a
      FROM toks WHERE term <> '' GROUP BY 1, 2
    ),
    gc AS (SELECT term, CAST(sum(a) AS BIGINT) AS b FROM sc GROUP BY 1),
    ga AS (SELECT grp, CAST(sum(a) AS BIGINT) AS tot_a FROM sc GROUP BY 1),
    gb AS (SELECT CAST(sum(b) AS BIGINT) AS tot_b FROM gc),
    j AS (
      SELECT sc.grp, sc.a, gc.b, ga.tot_a, gb.tot_b,
             CAST(floor(ln((2 * sc.a * gb.tot_b)
                           / CAST(sc.a * gb.tot_b + gc.b * ga.tot_a AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT) AS t1,
             CAST(floor(ln((2 * gc.b * ga.tot_a)
                           / CAST(sc.a * gb.tot_b + gc.b * ga.tot_a AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT) AS t2
      FROM sc JOIN gc USING (term) JOIN ga USING (grp) CROSS JOIN gb
    ),
    agg AS (
      SELECT grp,
             CAST(max(tot_a) AS BIGINT) AS n_tokens,
             CAST(max(tot_b) AS BIGINT) AS tot_b,
             CAST(count(*) AS BIGINT) AS n_terms,
             CAST(sum(a * t1) AS BIGINT) AS s1,
             CAST(sum(b * t2) AS BIGINT) AS s2p,
             CAST(sum(b) AS BIGINT) AS b_present
      FROM j GROUP BY grp
    ),
    fin AS (
      SELECT grp, n_tokens, n_terms, tot_b, s1,
             s2p + CAST(floor(ln(2.0) * 1000000 + 0.5) AS BIGINT)
                   * (tot_b - b_present) AS s2
      FROM agg
    ),
    mic AS (
      SELECT grp, n_tokens, n_terms,
             CAST(floor(0.5 * (s1 / CAST(n_tokens AS DOUBLE)
                               + s2 / CAST(tot_b AS DOUBLE)) + 0.5)
                  AS BIGINT) AS js_micro_nats
      FROM fin
    )
    SELECT grp AS source, n_tokens, n_terms, js_micro_nats,
           js_micro_nats / 1000000.0 AS js_divergence
    FROM mic
    """


@_q(
    "source_drift_js",
    _source_drift_oracle(),
    "per-source Jensen-Shannon divergence vs the whole-corpus unigram "
    "distribution — the mixture-drift monitor for a multi-source corpus; "
    "absent-term mass of the P_g leg folds into ln(2)*(B - sum b_present) "
    "analytically so the plan never builds the dense source x vocab frame; "
    "each KL term is an exact-bigint-ratio ln() snapped to the integer "
    "micro-nat grid, weighted and summed in bigint, divided once per leg",
)
def q_source_drift_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import js_divergence_by_group

    d = table(spark, sf_dir, "documents")
    return js_divergence_by_group(d, "source", "text")


def _dup_triangles_oracle() -> str:
    return f"""
    WITH {_minhash_sha_ctes()},
    e AS (SELECT DISTINCT id_a, id_b FROM pairs),
    tri AS (
      SELECT e1.id_a AS a, e1.id_b AS m, e2.id_b AS c
      FROM e e1
      JOIN e e2 ON e1.id_b = e2.id_a
      JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ),
    tn AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT m FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT id_a AS node FROM e UNION ALL SELECT id_b FROM e
      ) GROUP BY node
    )
    SELECT deg.node, deg.degree, COALESCE(tn.n_triangles, 0) AS n_triangles
    FROM deg LEFT JOIN tn USING (node)
    """


@_q(
    "dup_triangle_count",
    _dup_triangles_oracle(),
    "per-doc triangle participation + degree on the MinHash-LSH candidate "
    "graph — the clustering read CC/PageRank don't give: triangles mark "
    "tight duplicate cliques (template spam), a high-degree zero-triangle "
    "node marks a hub minted by a bad band/boilerplate shingle; each "
    "triangle a<b<c enumerated once via the id-ordered edge self-join, "
    "closing edge checked by semi-join",
)
def q_dup_triangle_count(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates_sha,
        triangle_counts,
    )

    # shared_lsh_edges: a pre-materialized minhash_lsh_candidates_sha(d)
    # frame (bench.py builds it ONCE for the whole dup-graph family and
    # times the build as its own entry); standalone calls — the driver's
    # correctness runs — build their own.
    d = table(spark, sf_dir, "documents")
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d)
    )
    return triangle_counts(edges)


def _vocab_overlap_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT source AS grp, unnest(string_split({_NORM_SQL}, ' ')) AS term
      FROM documents WHERE source IS NOT NULL
    ),
    v AS (SELECT DISTINCT grp, term FROM toks WHERE term <> ''),
    sizes AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_terms FROM v GROUP BY grp),
    inter AS (
      SELECT a.grp AS g1, b.grp AS g2, CAST(count(*) AS BIGINT) AS n_shared
      FROM v a JOIN v b ON a.term = b.term
      WHERE a.grp < b.grp
      GROUP BY 1, 2
    ),
    j AS (
      SELECT g1, g2, sa.n_terms AS n_terms_a, sb.n_terms AS n_terms_b, n_shared,
             CAST(floor(1000000 * n_shared
                        / CAST(sa.n_terms + sb.n_terms - n_shared AS DOUBLE)
                        + 0.5) AS BIGINT) AS jaccard_micro
      FROM inter
      JOIN sizes sa ON sa.grp = g1
      JOIN sizes sb ON sb.grp = g2
    )
    SELECT g1 AS source_a, g2 AS source_b, n_terms_a, n_terms_b, n_shared,
           jaccard_micro, jaccard_micro / 1000000.0 AS jaccard
    FROM j
    """


@_q(
    "source_vocab_overlap",
    _vocab_overlap_oracle(),
    "pairwise vocabulary Jaccard between sources — the companion to "
    "source_drift_js (JS says how far a source drifted from the blend, "
    "the overlap matrix says WHICH sources share vocabulary); one distinct "
    "(source, term) frame self-joined on term, so cost is sum over terms "
    "of k_t^2 with |sources| the small axis; Jaccard on the micro grid",
)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import vocab_overlap_pairs

    d = table(spark, sf_dir, "documents")
    return vocab_overlap_pairs(d, "source", "text")


def _containment_ctes() -> str:
    """Shared CTE chain: documents -> capped shingle index -> co-occurring
    pair stats (`co` + `sizes`) — used by the containment pair query and
    its connected-components rollup."""
    return f"""norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shs
      FROM norm
    ),
    ex0 AS (SELECT doc_id, unnest(shs) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) <= 10000),
    ex AS (SELECT e.doc_id, e.shingle FROM ex0 e JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM ex GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""


@_q(
    "ngram_containment_pairs",
    f"""
    WITH {_containment_ctes()}
    SELECT id_a, id_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
           round(inter / sa.n_sh, 6) AS containment_a_in_b,
           round(inter / sb.n_sh, 6) AS containment_b_in_a
    FROM co
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE greatest(inter / sa.n_sh, inter / sb.n_sh) >= 0.5
    """,
    "asymmetric shingle-containment near-dup pairs — catches the subset-"
    "duplicate class symmetric Jaccard misses (a short doc embedded in a "
    "long one has containment ~1 but Jaccard ~|A|/|B|); same inverted-"
    "index topology and document-frequency cap as ngram_jaccard_pairs "
    "(shared _shingle_pair_stats core)",
)
def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import ngram_containment_pairs

    d = table(spark, sf_dir, "documents")
    return ngram_containment_pairs(d, threshold=0.5)


@_q(
    "containment_components",
    f"""
    WITH RECURSIVE {_containment_ctes()},
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT co.id_a, co.id_b,
               greatest(inter / sa.n_sh, inter / sb.n_sh) AS g
        FROM co
        JOIN sizes sa ON sa.doc_id = co.id_a
        JOIN sizes sb ON sb.doc_id = co.id_b
      ) WHERE g >= 0.5
    ),
    e2 AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM e2
      UNION
      SELECT e.u, r.r FROM e2 e JOIN reach r ON e.v = r.node
    )
    SELECT node, min(r) AS component FROM reach GROUP BY node
    """,
    "containment clusters: the asymmetric-containment pairs resolved into "
    "connected components (same alternating-star CC core as the MinHash "
    "family), so chunk-embedded duplicate FAMILIES — a doc plus every "
    "superset that swallowed it — collapse to one canonical group; oracle "
    "is the recursive-CTE fixpoint over the shared containment CTE chain",
)
def q_containment_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        connected_components,
        ngram_containment_pairs,
    )

    d = table(spark, sf_dir, "documents")
    return connected_components(
        ngram_containment_pairs(d, threshold=0.5).select("id_a", "id_b")
    )


@_q(
    "vocab_growth_curve",
    f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL),
    r AS (
      SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) AS rk,
             count(*) OVER () AS n
      FROM base
    ),
    b AS (
      SELECT doc_id, text,
             CAST(floor((rk - 1) * 10 / n) + 1 AS INTEGER) AS bucket
      FROM r
    ),
    tk AS (
      SELECT bucket, term FROM (
        SELECT bucket, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM b
      ) WHERE term <> ''
    ),
    pbd AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs FROM b GROUP BY bucket),
    pbt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens FROM tk GROUP BY bucket),
    fs AS (SELECT term, min(bucket) AS bucket FROM tk GROUP BY term),
    pbn AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_new_terms FROM fs GROUP BY bucket
    ),
    per AS (
      SELECT pbd.bucket, n_docs, COALESCE(n_tokens, 0) AS n_tokens,
             COALESCE(n_new_terms, 0) AS n_new_terms
      FROM pbd LEFT JOIN pbt USING (bucket) LEFT JOIN pbn USING (bucket)
    )
    SELECT hi.bucket,
           CAST(sum(lo.n_docs) AS BIGINT) AS n_docs_cum,
           CAST(sum(lo.n_tokens) AS BIGINT) AS n_tokens_cum,
           CAST(sum(lo.n_new_terms) AS BIGINT) AS n_terms_cum
    FROM per hi JOIN per lo ON lo.bucket <= hi.bucket
    GROUP BY hi.bucket
    """,
    "Heaps'-law vocabulary-growth curve: cumulative distinct terms vs "
    "cumulative tokens over 10 equal-rank corpus prefixes — the datacard "
    "read for lexical redundancy of later data; doc ranks via the two-pass "
    "distributed prefix rank (no unpartitioned window), per-term "
    "first-appearance min() so no prefix is re-scanned, 10-row triangular "
    "broadcast cumulation",
)
def q_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import vocab_growth_curve

    d = table(spark, sf_dir, "documents")
    return vocab_growth_curve(d)


@_q(
    "geo_grid_neighbors",
    """
    WITH pts AS (
      SELECT DISTINCT user_id AS id,
             (user_id * 7919) % 500000 AS x,
             (user_id * 104729) % 500000 AS y
      FROM events WHERE user_id IS NOT NULL AND user_id >= 0
    ),
    home AS (
      SELECT id AS id_b, x AS xb, y AS yb, x // 10000 AS cx, y // 10000 AS cy
      FROM pts
    ),
    fan AS (
      SELECT id AS id_a, x AS xa, y AS ya,
             x // 10000 + dx.d AS cx, y // 10000 + dy.d AS cy
      FROM pts,
           (SELECT unnest([-1, 0, 1]) AS d) dx,
           (SELECT unnest([-1, 0, 1]) AS d) dy
    )
    SELECT id_a, id_b,
           CAST(greatest(abs(xa - xb), abs(ya - yb)) AS BIGINT) AS chebyshev
    FROM fan JOIN home USING (cx, cy)
    WHERE id_a < id_b AND greatest(abs(xa - xb), abs(ya - yb)) <= 10000
    """,
    "the geo family's oracle row: within-radius pairs over exact integer "
    "planar coordinates (sha-free key-derived micro-grid positions) via "
    "the SAME 3x3 cell-blocking join topology as geo_within_km — the "
    "scale-critical piece hash-verified; the haversine/adaptive-lon-fanout "
    "refinement stays pytest-verified (libm trig is not oracle-exact)",
)
def q_geo_grid_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.geo import grid_neighbor_pairs

    ev = table(spark, sf_dir, "events")
    pts = (
        ev.filter(F.col("user_id").isNotNull() & (F.col("user_id") >= 0))
        .select("user_id")
        .distinct()
        .select(
            F.col("user_id").alias("id"),
            (F.col("user_id") * 7919 % 500_000).alias("x"),
            (F.col("user_id") * 104729 % 500_000).alias("y"),
        )
    )
    return grid_neighbor_pairs(pts, radius=10_000)


@_q(
    "dedup_audit_summary",
    f"""
    WITH {_minhash_sha_ctes()},
    cn_norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    cn_sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shs
      FROM cn_norm
    ),
    cn_ex0 AS (SELECT doc_id, unnest(shs) AS shingle FROM cn_sh),
    cn_keep AS (SELECT shingle FROM cn_ex0 GROUP BY shingle HAVING count(*) <= 10000),
    cn_ex AS (SELECT e.doc_id, e.shingle FROM cn_ex0 e JOIN cn_keep USING (shingle)),
    cn_sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM cn_ex GROUP BY doc_id
    ),
    cn_co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM cn_ex a JOIN cn_ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    contained AS (
      SELECT DISTINCT doc_id FROM (
        SELECT id_a AS doc_id FROM cn_co
        JOIN cn_sizes sa ON sa.doc_id = cn_co.id_a
        WHERE inter / sa.n_sh >= 0.5
        UNION ALL
        SELECT id_b FROM cn_co
        JOIN cn_sizes sb ON sb.doc_id = cn_co.id_b
        WHERE inter / sb.n_sh >= 0.5
      )
    ),
    fp AS (SELECT sha256({_NORM_SQL}) AS fingerprint FROM documents),
    lsh_nodes AS (
      SELECT DISTINCT doc_id FROM (
        SELECT id_a AS doc_id FROM pairs UNION ALL SELECT id_b FROM pairs
      )
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(count(DISTINCT fingerprint) AS BIGINT) FROM fp)
             AS n_exact_unique,
           (SELECT CAST(count(*) AS BIGINT) FROM contained) AS n_contained,
           (SELECT CAST(count(*) AS BIGINT) FROM lsh_nodes) AS n_lsh_clustered
    """,
    "one-row dedup audit datacard: total docs, exact-unique fingerprints, "
    "docs >=50%-contained in another doc (asymmetric shingle containment, "
    "either direction), and docs touching a MinHash-LSH candidate pair — "
    "the three dedup tiers' independent reads over the full corpus, each "
    "through its existing hash-verified machinery",
)
def q_dedup_audit_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import document_fingerprint
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates_sha,
        ngram_containment_pairs,
    )

    d = table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count("*").alias("n_docs"))
    n_exact = d.select(document_fingerprint("text").alias("fp")).agg(
        F.countDistinct("fp").alias("n_exact_unique")
    )
    cp = ngram_containment_pairs(d, threshold=0.5)
    # Filter on the UNROUNDED ratio (inter/n_a), exactly as the operator's
    # own threshold and the oracle's inter/n_sh comparison do: the emitted
    # containment_* columns are rounded to 6 digits, and a ratio in
    # [0.4999995, 0.5) would round UP and pass only on the rounded side.
    contained = (
        cp.filter(F.col("inter") / F.col("n_a") >= 0.5)
        .select(F.col("id_a").alias("doc_id"))
        .unionAll(
            cp.filter(F.col("inter") / F.col("n_b") >= 0.5).select(
                F.col("id_b").alias("doc_id")
            )
        )
        .distinct()
        .agg(F.count("*").alias("n_contained"))
    )
    lsh = minhash_lsh_candidates_sha(d)
    nodes = (
        lsh.select(F.col("id_a").alias("doc_id"))
        .unionAll(lsh.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .agg(F.count("*").alias("n_lsh_clustered"))
    )
    return (
        n_docs.crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(contained))
        .crossJoin(F.broadcast(nodes))
    )


@_q(
    "ivf_index_merge",
    """
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1000000 AS DOUBLE)
                                            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS q
      FROM embeddings
      WHERE embedding IS NOT NULL
        AND len(embedding) = (SELECT max(len(embedding)) FROM embeddings
                              WHERE embedding IS NOT NULL)
    ),
    oldv AS (SELECT vec_id, q, 0 AS is_new FROM qv WHERE vec_id % 4 <> 0),
    newv AS (SELECT vec_id, q, 1 AS is_new FROM qv WHERE vec_id % 4 = 0),
    seeds AS (SELECT vec_id AS sid, q AS sq FROM oldv ORDER BY vec_id LIMIT 8),
    allv AS (SELECT * FROM oldv UNION ALL SELECT * FROM newv),
    d AS (
      SELECT v.vec_id, v.q, v.is_new, s.sid,
             CAST(list_sum(list_transform(range(1, len(v.q) + 1),
                                          i -> v.q[i] * s.sq[i])) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(v.q, x -> x * x)) AS BIGINT) AS n1,
             CAST(list_sum(list_transform(s.sq, x -> x * x)) AS BIGINT) AS n2
      FROM allv v CROSS JOIN seeds s
    ),
    scored AS (
      SELECT vec_id, q, is_new, sid,
             CASE WHEN sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)) = 0 THEN 0
                  ELSE CAST(dot AS DOUBLE)
                       / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))
             END AS cosv
      FROM d
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosv DESC, sid) AS rn
      FROM scored
    ),
    mem AS (SELECT sid, vec_id, q, is_new FROM best WHERE rn = 1),
    counts AS (
      SELECT sid,
             CAST(sum(CASE WHEN is_new = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
             CAST(sum(CASE WHEN is_new = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_added
      FROM mem GROUP BY sid
    ),
    dims AS (
      SELECT sid, is_new, t.i AS dim_i, q[t.i] AS qx
      FROM mem, LATERAL unnest(generate_series(1, len(q))) t(i)
    ),
    per_dim AS (
      SELECT sid, dim_i,
             sum(CASE WHEN is_new = 0 THEN qx ELSE 0 END) AS so,
             sum(qx) AS sa
      FROM dims GROUP BY sid, dim_i
    ),
    shift AS (
      SELECT sid, sum(so * sa) AS dd, sum(so * so) AS nn1, sum(sa * sa) AS nn2
      FROM per_dim GROUP BY sid
    )
    SELECT c.sid AS centroid_id, c.n_before, c.n_added,
           round(CASE WHEN sqrt(CAST(nn1 AS DOUBLE)) * sqrt(CAST(nn2 AS DOUBLE)) = 0
                      THEN 0
                      ELSE CAST(dd AS DOUBLE)
                           / (sqrt(CAST(nn1 AS DOUBLE)) * sqrt(CAST(nn2 AS DOUBLE)))
                 END, 6) AS mean_shift_cos
    FROM counts c JOIN shift USING (sid)
    """,
    "incremental IVF index maintenance: merge a new vector batch (vec_id "
    "% 4 = 0) into the index trained on the rest — nearest-EXISTING-"
    "centroid assignment by exact quantized cosine, per-centroid before/"
    "added counts, and the retrain trigger: cosine between the bucket's "
    "old and merged mean directions, computed on exact DECIMAL(38,0) "
    "integer sums (means and sums share a cosine) so both engines agree "
    "bit-for-bit up to the one final division",
)
def q_ivf_index_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import ivf_index_merge

    e = table(spark, sf_dir, "embeddings")
    old = e.filter(F.col("vec_id") % 4 != 0)
    new = e.filter(F.col("vec_id") % 4 == 0)
    return ivf_index_merge(old, new, k=8)


@_q(
    "dup_graph_kcore",
    f"""
    WITH RECURSIVE {_minhash_sha_ctes()},
    und AS (
      SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
      FROM pairs WHERE id_a <> id_b
    ),
    e2 AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
    peel(ns) AS (
      SELECT list_sort(list(DISTINCT u)) FROM e2
      UNION
      SELECT list_sort(list(u)) FROM (
        SELECT e.u FROM e2 e, peel p
        WHERE list_contains(p.ns, e.u) AND list_contains(p.ns, e.v)
        GROUP BY e.u HAVING count(*) >= 2
      )
    ),
    fixpoint AS (
      SELECT ns FROM peel ORDER BY coalesce(len(ns), 0) ASC LIMIT 1
    ),
    core AS (SELECT unnest(ns) AS node FROM fixpoint)
    SELECT e.u AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM e2 e
    JOIN core cu ON e.u = cu.node
    JOIN core cv ON e.v = cv.node
    GROUP BY e.u
    """,
    "2-core of the MinHash-LSH duplicate graph: the maximal subgraph "
    "where every doc keeps >= 2 near-dup neighbors after iteratively "
    "stripping the fringe — the DENSITY read (template/boilerplate "
    "nests, not chance pairs) that components/PageRank/triangles don't "
    "give.  Spark side peels set-based with per-round checkpoints; the "
    "oracle iterates the survivor LIST through a recursive CTE to the "
    "same fixpoint (monotone, so the shortest accumulated list IS it)",
)
def q_dup_graph_kcore(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        kcore_decomposition,
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents")
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d)
    )
    return kcore_decomposition(edges, k=2)


def _band_plan_oracle(n_hashes: int = 32, threshold: str = "0.5") -> str:
    """Config legs are generated with UNROLLED repeated-squaring
    expressions (r and b are powers of two), so every float op is a
    fixed IEEE multiplication chain DuckDB evaluates bit-identically to
    Spark — pow() would diverge by libm ulps.  Midpoints are sqrt
    chains (IEEE-exact).  Per-pair probabilities snap to the micro grid
    and sum as BIGINTs."""
    legs = []
    r = 1
    while r <= n_hashes:
        b = n_hashes // r
        x = "j6"
        for _ in range(r.bit_length() - 1):
            x = f"({x} * {x})"
        y = f"(CAST(1 AS DOUBLE) - {x})"
        for _ in range(b.bit_length() - 1):
            y = f"({y} * {y})"
        p_int = (
            f"CAST(floor((CAST(1 AS DOUBLE) - {y}) * CAST(1000000 AS DOUBLE)"
            f" + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        )
        mid = f"(CAST(1 AS DOUBLE) / CAST({b} AS DOUBLE))"
        for _ in range(r.bit_length() - 1):
            mid = f"sqrt({mid})"
        legs.append(
            f"""
    SELECT CAST({b} AS INTEGER) AS bands, CAST({r} AS INTEGER) AS rows_per_band,
           {mid} AS midpoint_j,
           CAST(coalesce(sum(CASE WHEN j6 >= CAST({threshold} AS DOUBLE)
                                  THEN 1 END), 0) AS BIGINT) AS n_pairs_above,
           CAST(coalesce(sum(CASE WHEN j6 >= CAST({threshold} AS DOUBLE)
                                  THEN {p_int} END), 0) AS BIGINT)
             AS caught_above_micro,
           CAST(coalesce(sum(CASE WHEN j6 < CAST({threshold} AS DOUBLE)
                                  THEN 1 END), 0) AS BIGINT) AS n_pairs_below,
           CAST(coalesce(sum(CASE WHEN j6 < CAST({threshold} AS DOUBLE)
                                  THEN {p_int} END), 0) AS BIGINT)
             AS false_cand_micro
    FROM jp"""
        )
        r *= 2
    union = "\n    UNION ALL\n".join(legs)
    return f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shs
      FROM norm
    ),
    ex0 AS (SELECT doc_id, unnest(shs) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) <= 10000),
    ex AS (SELECT e.doc_id, e.shingle FROM ex0 e JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM ex GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT CAST(floor(inter / (sa.n_sh + sb.n_sh - inter)
                        * CAST(1000000 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT)
             / CAST(1000000 AS DOUBLE) AS j6
      FROM co
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    )
    {union}
    """


@_q(
    "minhash_band_plan",
    _band_plan_oracle(),
    "MinHash band-tuning from the corpus's measured Jaccard distribution: "
    "per (bands, rows) factorization of a 32-hash signature, the S-curve "
    "catch probability 1-(1-j^r)^b summed over every co-occurring pair's "
    "exact Jaccard — expected recall mass above the 0.5 threshold and "
    "false-candidate mass below it, plus the folklore (1/b)^(1/r) "
    "midpoint; all float work is repeated-squaring / sqrt chains on the "
    "micro grid so both engines agree bit-for-bit",
)
def q_minhash_band_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import minhash_band_plan

    d = table(spark, sf_dir, "documents")
    return minhash_band_plan(d, n_hashes=32, threshold=0.5)


@_q(
    "exact_substring_repeats",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    grams0 AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(words) - 7, 0) + 1)) AS pos1,
             unnest(list_transform(range(1, greatest(len(words) - 7, 0) + 1),
                                   i -> array_to_string(words[i:i+7], ' '))) AS g
      FROM norm
    ),
    grams AS (SELECT doc_id, pos1 - 1 AS pos, g FROM grams0),
    dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    starts AS (SELECT doc_id, pos FROM grams JOIN dupg USING (g)),
    gaps AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS gap
      FROM starts
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(gap) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp
      FROM gaps
    )
    SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + 8 AS BIGINT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM islands GROUP BY doc_id, grp
    """,
    "ExactSubstr per-doc removal spans (Lee et al. 2021 suffix-array "
    "dedup read): MAXIMAL token spans covered by 8-token windows "
    "occurring >= 2 times anywhere in the corpus (same doc or across "
    "docs) — starts merge whenever their windows overlap or adjoin "
    "(gap <= 8), so covers are contiguous, disjoint, and maximal, and "
    "per-doc span_tokens sums never double-count.  Duplication is a "
    "map-side-combined groupBy(gram) count with a left_anti exclusion "
    "of the count-1 singletons on (doc, pos) — hot boilerplate never "
    "enters a pair join OR a single-task gram-key window — and the key "
    "is the exact gram content (no hashing).  A distributed prefix-"
    "doubling suffix-rank construction was implemented, measured "
    "bit-identical and ~9x slower at fixed L=8, and rejected (operator "
    "docstring)",
)
def q_exact_substring_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import exact_substring_repeats

    d = table(spark, sf_dir, "documents")
    return exact_substring_repeats(d, min_tokens=8)


# ---------------------------------------------------------------------------
# URL / domain curation family (round 8): canonical URL keys + RefinedWeb
# domain frequency caps.  The synthesized URL recipe is deterministic from
# (doc_id, source, lang) and deliberately exercises every clause of the
# canonicalization contract (operators/web.py module docstring): mixed-case
# scheme/host, userinfo, default and non-default ports, tracking params,
# unsorted params, trailing slashes, empty paths, fragments, and a
# scheme-less branch that must canonicalize to NULL.
# ---------------------------------------------------------------------------


def _synth_url_frame(d: DataFrame) -> DataFrame:
    """Materialized (doc_id, url) frame.  The checkpoint is load-bearing:
    canonical_url/url_domain reference their input ~8x each and sit
    inside when/otherwise branches, where Spark DISABLES common-
    subexpression elimination (conditional branches evaluate lazily) —
    and CollapseProject inlines a staged select right back into the
    consumer, so without materialization the synth CASE re-evaluates
    per reference (measured 42s -> 0.9s on 320k rows at the 64x smoke).
    Real pipelines read URLs as a STORED column, which this models."""
    return d.select("doc_id", _synth_url_spark().alias("url")).localCheckpoint(
        eager=True
    )


def _synth_url_spark():
    m = F.col("doc_id") % 5
    src = F.coalesce(F.col("source"), F.lit("nul"))
    lng = F.coalesce(F.col("lang"), F.lit("xx"))
    return (
        F.when(
            m == 0,
            F.concat(
                F.lit("HTTPS://User:Pw@WWW."), src, F.lit(".Example.COM:443/Articles/"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit("/?utm_source=rss&b="), lng, F.lit("&a=1#top"),
            ),
        )
        .when(m == 1, F.concat(F.lit("http://"), src, F.lit(".example.com:80?gclid=abc")))
        .when(
            m == 2,
            F.concat(
                F.lit("https://cdn."), src, F.lit(".example.org:8443/static/img_"),
                F.col("doc_id").cast("string"),
            ),
        )
        .when(
            m == 3,
            F.concat(
                F.lit("HTTP://"), src, F.lit(".EXAMPLE.net/path/"),
                (F.col("doc_id") % 7).cast("string"), F.lit("/?ref=tw&z=9&y=8"),
            ),
        )
        .otherwise(F.concat(F.lit("www."), src, F.lit(".example.com/x")))
    )


_URL_SYNTH_SQL = """CASE doc_id % 5
      WHEN 0 THEN 'HTTPS://User:Pw@WWW.' || coalesce(source, 'nul')
                  || '.Example.COM:443/Articles/' || CAST(doc_id % 50 AS VARCHAR)
                  || '/?utm_source=rss&b=' || coalesce(lang, 'xx') || '&a=1#top'
      WHEN 1 THEN 'http://' || coalesce(source, 'nul') || '.example.com:80?gclid=abc'
      WHEN 2 THEN 'https://cdn.' || coalesce(source, 'nul')
                  || '.example.org:8443/static/img_' || CAST(doc_id AS VARCHAR)
      WHEN 3 THEN 'HTTP://' || coalesce(source, 'nul') || '.EXAMPLE.net/path/'
                  || CAST(doc_id % 7 AS VARCHAR) || '/?ref=tw&z=9&y=8'
      ELSE 'www.' || coalesce(source, 'nul') || '.example.com/x'
    END"""


def _canon_ctes() -> str:
    """DuckDB CTE chain mirroring operators/web.py's canonicalization
    contract clause-for-clause (scheme case-fold, userinfo strip, default
    ports, trailing-slash/empty path, tracking-param drop + byte-sort,
    fragment drop, scheme-less -> NULL).  Regexes avoid both `\\s` (the
    ledger rule) and tail-capturing `.` (Java excludes \\r, RE2 doesn't);
    the tracking predicate is pure starts_with chains on both engines."""
    from wellmeet_data_pipeline_spark.operators.web import TRACKING_KEYS

    track = " OR ".join(
        ["starts_with(x, 'utm_')"]
        + [f"x = '{k}' OR starts_with(x, '{k}=')" for k in TRACKING_KEYS]
    )
    return f"""
    u AS (SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM documents),
    p1 AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme
      FROM u
    ),
    p2 AS (SELECT *, substr(url, length(scheme) + 4, length(url)) AS after_s FROM p1),
    p3 AS (SELECT *, regexp_extract(after_s, '^([^/?#]*)', 1) AS authority FROM p2),
    p4 AS (
      SELECT *,
             substr(after_s, length(authority) + 1, length(after_s)) AS rest,
             regexp_replace(authority, '^[^@]*@', '') AS auth2
      FROM p3
    ),
    p5 AS (
      SELECT *,
             lower(regexp_extract(auth2, '^([^:]*)', 1)) AS host,
             regexp_extract(auth2, ':([0-9]+)$', 1) AS port,
             -- fragment strips FIRST: a '?' inside the fragment is
             -- fragment text, not a query (mirrors operators/web.py)
             regexp_extract(rest, '^([^#]*)', 1) AS defrag
      FROM p4
    ),
    p6 AS (
      SELECT *,
             CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443')
                  THEN host ELSE host || ':' || port END AS netloc,
             CASE WHEN regexp_replace(regexp_extract(defrag, '^([^?]*)', 1), '/+$', '') = ''
                  THEN '/'
                  ELSE regexp_replace(regexp_extract(defrag, '^([^?]*)', 1), '/+$', '')
             END AS path,
             -- coalesce: DuckDB array_to_string([]) is NULL where Spark
             -- array_join([]) is '' (round-8 ledger fact)
             coalesce(array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(defrag, '\\?([^#]*)', 1), '&'),
                 x -> x <> '' AND NOT ({track}))), '&'), '') AS qs
      FROM p5
    ),
    canon AS (
      SELECT doc_id, url,
             CASE WHEN scheme = '' THEN NULL
                  ELSE scheme || '://' || netloc || path ||
                       CASE WHEN qs = '' THEN '' ELSE '?' || qs END
             END AS canonical_url,
             CASE WHEN scheme = '' THEN NULL
                  ELSE regexp_replace(host, '^www\\.', '')
             END AS domain
      FROM p6
    )"""


@_q(
    "url_canonicalize",
    f"""
    WITH {_canon_ctes()}
    SELECT doc_id, url, canonical_url, domain FROM canon
    """,
    "URL canonicalization (generalizes F7's key decode, save-reviews/"
    "lambda_function.py:43, into the RefinedWeb URL-dedup key): case-fold "
    "scheme+host, strip userinfo/fragment/default ports/trailing slashes, "
    "drop tracking params, byte-sort survivors; scheme-less inputs -> "
    "NULL.  Pure codegen string/array expressions — no UDF, no regex "
    "inside HOF lambdas",
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.web import canonical_url, url_domain

    d = table(spark, sf_dir, "documents")
    u = _synth_url_frame(d)
    return u.select(
        "doc_id",
        "url",
        canonical_url(F.col("url")).alias("canonical_url"),
        url_domain(F.col("url")).alias("domain"),
    )


@_q(
    "domain_doc_caps",
    f"""
    WITH {_canon_ctes()},
    d AS (SELECT doc_id, domain FROM canon WHERE domain IS NOT NULL),
    r AS (
      SELECT doc_id, domain,
             row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS domain_rank,
             count(*) OVER (PARTITION BY domain) AS n_domain_docs
      FROM d
    )
    SELECT doc_id, domain, CAST(domain_rank AS BIGINT) AS domain_rank,
           CAST(n_domain_docs AS BIGINT) AS n_domain_docs,
           CAST(CASE WHEN domain_rank <= 3 THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM r
    """,
    "RefinedWeb-style per-domain frequency cap (Penedo et al. 2023): at "
    "most 3 docs per domain survive, lowest doc_id first.  The per-domain "
    "rank is global_rank_cumsum's two-pass range-partitioned rank over "
    "(domain, doc_id) — NO domain-partitioned window anywhere, so a "
    "mega-domain spreads across every range partition instead of one task",
)
def q_domain_doc_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.web import domain_doc_caps

    d = table(spark, sf_dir, "documents")
    return domain_doc_caps(_synth_url_frame(d), url_col="url", cap=3)


@_q(
    "url_dedup_by_canonical",
    f"""
    WITH {_canon_ctes()}
    SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS kept_doc_id,
           CAST(count(*) AS BIGINT) AS n_variants
    FROM canon WHERE canonical_url IS NOT NULL
    GROUP BY canonical_url
    """,
    "Exact URL dedup on the canonical key (the RefinedWeb §3.1 URL-dedup "
    "pass): syntactic variants (case, ports, param order, tracking "
    "params, fragments) collapse to one key; keep-lowest-id survivor + "
    "variant count per key.  One map-side-combined aggregation on the "
    "canonical string",
)
def q_url_dedup_by_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.web import canonical_url

    d = table(spark, sf_dir, "documents")
    u = _synth_url_frame(d)
    return (
        u.select("doc_id", canonical_url(F.col("url")).alias("canonical_url"))
        .filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").cast("long").alias("kept_doc_id"),
            F.count("*").cast("long").alias("n_variants"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (round 8): DDSketch-shaped on the exact integer
# grid, so the whole sketch-build + merge + quantile-read path is
# hash-verifiable against ANSI SQL (aggregations.py:quantile_sketch).
# ---------------------------------------------------------------------------


def _sketch_ctes(sub_bits: int, split_filter: str = "") -> str:
    """Shared oracle CTEs: cents grid -> signed bucket_lb -> (group,
    bucket, cnt) sketch -> cumulative.  Integer ops only: length(bin())
    for the bit length (the HLL rho trick), %/<< fully parenthesized
    (DuckDB gives << >> & | equal left-assoc precedence — ledger rule)."""
    return f"""
    base AS (
      SELECT event_type, CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL{split_filter}
    ),
    s AS (
      SELECT event_type,
             CASE WHEN cents < 0 THEN -1 ELSE 1 END AS sgn,
             abs(cents) AS a,
             greatest(length(bin(abs(cents))) - {1 + sub_bits}, 0) AS shift
      FROM base
    ),
    k AS (
      SELECT event_type,
             CAST(sgn * (a - (a % (CAST(1 AS BIGINT) << shift))) AS BIGINT) AS bucket_lb
      FROM s
    ),
    sk AS (
      SELECT event_type, bucket_lb, CAST(count(*) AS BIGINT) AS cnt
      FROM k GROUP BY 1, 2
    ),
    n AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS nrows FROM sk GROUP BY 1),
    c AS (
      SELECT event_type, bucket_lb,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket_lb
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM sk
    )"""


def _sketch_leg_sql(num: int, den: int, label: str) -> str:
    return f"""
    SELECT event_type, '{label}' AS quantile,
           CAST(min(bucket_lb) AS BIGINT) AS est,
           CAST(nrows AS BIGINT) AS n_rows
    FROM c JOIN n USING (event_type)
    WHERE cum >= (CAST({num} AS BIGINT) * nrows + {den - 1}) // {den}
    GROUP BY event_type, nrows"""


@_q(
    "sketch_value_quantiles",
    f"""
    WITH {_sketch_ctes(5)}
    {_sketch_leg_sql(1, 2, "p50")}
    UNION ALL
    {_sketch_leg_sql(9, 10, "p90")}
    UNION ALL
    {_sketch_leg_sql(99, 100, "p99")}
    """,
    "Mergeable quantile sketch (DDSketch shape, Masson et al. VLDB'19, on "
    "the exact integer cents grid): per event_type, p50/p90/p99 from a "
    "(group, bucket, cnt) frame where a value keeps sign + top 6 "
    "significant bits — values under 64 exact, relative error < 2^-5 "
    "otherwise.  ONE map-side-combined aggregation builds the sketch "
    "(bounded <= ~63*32 buckets/group at ANY row count); rank targets are "
    "integer rationals, never float interpolation.  The 100 TB percentile "
    "answer — exact value_percentiles needs a global rank pass",
)
def q_sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        quantile_sketch,
        quantiles_from_sketch,
    )

    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    sk = quantile_sketch(cents, "cents", group_cols=("event_type",), sub_bits=5)
    return quantiles_from_sketch(sk, group_cols=("event_type",))


@_q(
    "sketch_merge_parity",
    f"""
    WITH {_sketch_ctes(6)}
    {_sketch_leg_sql(1, 4, "p25")}
    UNION ALL
    {_sketch_leg_sql(3, 4, "p75")}
    """,
    "Quantile-sketch MONOID evidence: Spark builds three sketches over "
    "disjoint event_id%3 splits and merges them (unionByName + "
    "re-aggregate) before reading p25/p75; the oracle computes the "
    "one-shot sketch directly.  Hash-match proves merge(split sketches) "
    "== sketch(all rows) — the property that lets per-source / per-day "
    "sketches roll up at 100 TB without touching raw rows",
)
def q_sketch_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        quantile_sketch,
        quantile_sketch_merge,
        quantiles_from_sketch,
    )

    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    # pmod + coalesce so the three splits PARTITION all value-non-null
    # rows: bare % maps negative ids to negative remainders (no split)
    # and NULL ids to NULL — either would silently drop rows from the
    # Spark side only, faking a monoid failure (review catch)
    split_key = F.pmod(F.coalesce(F.col("event_id"), F.lit(0)), F.lit(3))
    parts = [
        quantile_sketch(
            cents.filter(split_key == i),
            "cents",
            group_cols=("event_type",),
            sub_bits=6,
        )
        for i in range(3)
    ]
    merged = quantile_sketch_merge(parts, group_cols=("event_type",))
    return quantiles_from_sketch(
        merged,
        quantiles=((1, 4, "p25"), (3, 4, "p75")),
        group_cols=("event_type",),
    )


@_q(
    "sample_users_bottomk",
    f"""
    WITH ids AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    kk AS (
      SELECT event_type, user_id,
             {_hex_int_sql("sha256('bk1|' || CAST(user_id AS VARCHAR))", 1, 15)} AS dk
      FROM ids
    ),
    r AS (
      SELECT event_type, user_id,
             row_number() OVER (PARTITION BY event_type ORDER BY dk, user_id)
               AS draw_rank
      FROM kk
    )
    SELECT event_type, user_id, CAST(draw_rank AS BIGINT) AS draw_rank
    FROM r WHERE draw_rank <= 5
    """,
    "Deterministic bottom-k sample sketch (Cohen-Kaplan mergeable uniform "
    "sample): per event_type, the 5 distinct user_ids with the smallest "
    "sha-derived draw keys — duplication-invariant (members, not rows), "
    "engine-reproducible, and a monoid (bottom-k of union == bottom-k of "
    "per-part bottom-ks).  Two-phase rank: (group, key mod 64) first, so "
    "a hot group spreads across salt partitions before the bounded final "
    "rank",
)
def q_sample_users_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import bottomk_sample

    ev = table(spark, sf_dir, "events")
    return bottomk_sample(ev, "user_id", group_cols=("event_type",), k=5)


_KMV_SK_SQL = f"""
    ids AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    kk AS (
      SELECT event_type, user_id,
             {_hex_int_sql("sha256('bk1|' || CAST(user_id AS VARCHAR))", 1, 15)} AS dk
      FROM ids
    ),
    rr AS (
      SELECT event_type, user_id, dk,
             row_number() OVER (PARTITION BY event_type ORDER BY dk, user_id) AS rk
      FROM kk
    ),
    sk AS (SELECT event_type, user_id, dk FROM rr WHERE rk <= 64)"""


@_q(
    "kmv_distinct_users",
    f"""
    WITH {_KMV_SK_SQL},
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_sketch, max(dk) AS vk
      FROM sk GROUP BY 1
    )
    SELECT event_type, n_sketch,
           CASE WHEN n_sketch < 64 THEN n_sketch
                ELSE CAST(CAST(63 AS HUGEINT)
                          * CAST(1152921504606846976 AS HUGEINT)
                          // CAST(greatest(vk, 1) AS HUGEINT) AS BIGINT)
           END AS est_distinct
    FROM agg
    """,
    "KMV (k-minimum-values / theta-sketch) distinct estimate per "
    "event_type from the bottom-k sample: n_hat = (k-1)*2^60 // v_k on "
    "exact 128-bit integers (Bar-Yossef et al. 2002, stderr ~ "
    "1/sqrt(k-2)); groups under k distinct members report their EXACT "
    "count.  Deterministic sha keys make the whole estimate "
    "hash-verifiable — the oracle-checkable complement to the "
    "engine-internal HLL++ (approx_distinct_sketch)",
)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        kmv_distinct_estimate,
    )

    ev = table(spark, sf_dir, "events")
    return kmv_distinct_estimate(ev, "user_id", group_cols=("event_type",), k=64)


@_q(
    "kmv_type_overlap",
    f"""
    WITH {_KMV_SK_SQL},
    gs AS (SELECT DISTINCT event_type FROM sk),
    gp AS (
      SELECT a.event_type AS ga, b.event_type AS gb
      FROM gs a JOIN gs b ON a.event_type < b.event_type
    ),
    uni AS (
      SELECT DISTINCT ga, gb, user_id, dk FROM (
        SELECT gp.ga, gp.gb, s.user_id, s.dk FROM gp JOIN sk s ON s.event_type = gp.ga
        UNION ALL
        SELECT gp.ga, gp.gb, s.user_id, s.dk FROM gp JOIN sk s ON s.event_type = gp.gb
      )
    ),
    tk AS (
      SELECT * FROM (
        SELECT ga, gb, user_id, dk,
               row_number() OVER (PARTITION BY ga, gb ORDER BY dk, user_id) AS r2
        FROM uni
      ) WHERE r2 <= 64
    ),
    fl AS (
      SELECT t.ga, t.gb, t.dk,
             CASE WHEN sa.user_id IS NOT NULL THEN 1 ELSE 0 END AS ia,
             CASE WHEN sb.user_id IS NOT NULL THEN 1 ELSE 0 END AS ib
      FROM tk t
      LEFT JOIN sk sa ON sa.event_type = t.ga AND sa.user_id = t.user_id
      LEFT JOIN sk sb ON sb.event_type = t.gb AND sb.user_id = t.user_id
    ),
    st AS (
      SELECT ga AS group_a, gb AS group_b,
             CAST(count(*) AS BIGINT) AS k_union,
             CAST(sum(ia * ib) AS BIGINT) AS n_shared,
             max(dk) AS vk
      FROM fl GROUP BY 1, 2
    ),
    est AS (
      SELECT group_a, group_b, k_union, n_shared,
             CAST(floor(CAST(n_shared * 1000000 AS DOUBLE) / k_union) AS BIGINT)
               AS jaccard_micro,
             CASE WHEN k_union < 64 THEN k_union
                  ELSE CAST(CAST(k_union - 1 AS HUGEINT)
                            * CAST(1152921504606846976 AS HUGEINT)
                            // CAST(greatest(vk, 1) AS HUGEINT) AS BIGINT)
             END AS est_union
      FROM st
    )
    SELECT group_a, group_b, k_union, n_shared, jaccard_micro, est_union,
           CAST(CAST(jaccard_micro AS HUGEINT) * CAST(est_union AS HUGEINT)
                // CAST(1000000 AS HUGEINT) AS BIGINT) AS est_inter
    FROM est
    """,
    "Theta-sketch-style pairwise set overlap between event types' user "
    "sets, from their bottom-k sketches alone: the union sketch's k "
    "smallest keys are scanned for two-sided membership — jaccard_hat = "
    "shared/k on the micro grid, inter_hat = jaccard_hat * KMV(union).  "
    "Every post-sketch frame is pairs x k rows, independent of corpus "
    "size; 128-bit exact integer estimates keep it hash-verifiable",
)
def q_kmv_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.aggregations import kmv_group_overlap

    ev = table(spark, sf_dir, "events")
    return kmv_group_overlap(ev, "user_id", "event_type", k=64)


# ---------------------------------------------------------------------------
# SFT / conversation prep (round 8): synthesize a deterministic 3-turn
# conversation JSON per document (control chars stripped, JSON-escaped),
# parse it TYPED on both engines (from_json vs TRY_CAST(... AS STRUCT[])),
# and read structure/tokens/template through array lambdas.
# ---------------------------------------------------------------------------


def _synth_conv_spark():
    from wellmeet_data_pipeline_spark.functions.text import normalized_text

    safe = F.regexp_replace(normalized_text(F.col("text")), r"[\x00-\x1f]", "")
    esc = F.replace(
        F.replace(safe, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )
    words = F.split(esc, " ")
    n = F.size(words)
    m = F.expr("(size(split(__esc, ' ')) + 2) div 3")
    return (
        F.concat(
            F.lit('[{"role":"user","content":"'),
            F.array_join(F.slice(words, 1, m), " "),
            F.lit('"},{"role":"assistant","content":"'),
            F.array_join(F.slice(words, m + F.lit(1), m), " "),
            F.lit('"},{"role":"user","content":"'),
            F.array_join(
                F.slice(words, 2 * m + F.lit(1), F.greatest(n - 2 * m, F.lit(0))),
                " ",
            ),
            F.lit('"}]'),
        ),
        esc,
    )


def _conv_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    conv, esc = _synth_conv_spark()
    return d.withColumn("__esc", esc).select("doc_id", conv.alias("conv"))


_CONV_SQL = f"""
    base AS (
      SELECT doc_id,
             -- 'g': DuckDB regexp_replace is first-match-only by default
             -- where Spark replaces all (review catch — latent until
             -- _NORM_SQL's keep-set widens past [\\w ])
             replace(replace(regexp_replace({_NORM_SQL}, '[\\x00-\\x1f]', '', 'g'),
                             '\\', '\\\\'), '"', '\\"') AS esc
      FROM documents
    ),
    wd AS (
      SELECT doc_id, string_split(esc, ' ') AS words,
             (len(string_split(esc, ' ')) + 2) // 3 AS m,
             len(string_split(esc, ' ')) AS n
      FROM base
    ),
    conv AS (
      -- NULL text stays NULL end-to-end (Spark's concat nulls the whole
      -- JSON; coalescing slices here would fabricate an empty conv)
      SELECT doc_id,
             CASE WHEN words IS NULL THEN NULL ELSE
             '[{{"role":"user","content":"'
             || coalesce(array_to_string(words[1:m], ' '), '')
             || '"}},{{"role":"assistant","content":"'
             || coalesce(array_to_string(words[m+1:2*m], ' '), '')
             || '"}},{{"role":"user","content":"'
             || coalesce(array_to_string(words[2*m+1:n], ' '), '')
             || '"}}]' END AS j
      FROM wd
    ),
    parsed AS (
      SELECT doc_id,
             TRY_CAST(j AS STRUCT(role VARCHAR, content VARCHAR)[]) AS t
      FROM conv
    )"""

# The rendered-training-string expression, shared by the render query and
# the conversation-grain dedup oracle so the two can never desynchronize
# (fingerprints must hash the exact bytes the render emits).  Coalesce per
# field matches the Spark fold: a NULL role/content renders as '' (|| would
# NULL the element and array_to_string would silently drop the turn).
_RENDER_SQL = """CASE WHEN t IS NULL THEN NULL
                WHEN len(t) = 0 THEN '<|end|>'
                ELSE '<|' || array_to_string(
                       list_transform(t, x -> coalesce(x.role, '') || '|>'
                                              || coalesce(x.content, '')),
                       '<|') || '<|end|>'
           END"""



@_q(
    "sft_turn_stats",
    f"""
    WITH {_CONV_SQL},
    rr AS (SELECT doc_id, t, list_transform(t, x -> x.role) AS roles FROM parsed)
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_turns,
           CASE WHEN t IS NULL THEN NULL
                WHEN len(t) = 0 THEN 0
                ELSE CAST((roles[1] = 'user' AND NOT list_contains(
                       list_transform(range(1, len(t)),
                                      i -> roles[i] = roles[i + 1]), true))
                     AS INTEGER)
           END AS alternating,
           CASE WHEN t IS NULL THEN NULL ELSE CAST(coalesce(list_sum(
             list_transform(list_filter(t, x -> x.role = 'user'),
               x -> len(list_filter(string_split(x.content, ' '),
                                    w -> w <> '')))), 0) AS BIGINT)
           END AS n_user_tokens,
           CASE WHEN t IS NULL THEN NULL ELSE CAST(coalesce(list_sum(
             list_transform(list_filter(t, x -> x.role = 'assistant'),
               x -> len(list_filter(string_split(x.content, ' '),
                                    w -> w <> '')))), 0) AS BIGINT)
           END AS n_assistant_tokens,
           CASE WHEN t IS NULL THEN NULL ELSE CAST(coalesce(list_sum(
             list_transform(t, x -> length(x.content))), 0) AS BIGINT)
           END AS n_content_chars
    FROM rr
    """,
    "SFT conversation structure audit (per doc: turn count, strict "
    "user-first role alternation — the gate every instruction-tuning "
    "trainer applies — per-side whitespace token counts, content chars) "
    "over a TYPED from_json parse of chat-structured JSON; every read is "
    "an array lambda over one parsed column, zero shuffle/explode.  "
    "Generalizes F8's typed extract to message grain",
)
def q_sft_turn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.sft import turn_stats

    return turn_stats(_conv_frame(spark, sf_dir), "conv")


@_q(
    "sft_render_template",
    f"""
    WITH {_CONV_SQL}
    SELECT doc_id,
           {_RENDER_SQL} AS rendered
    FROM parsed
    """,
    "Chat-template rendering: conversations flatten into the training "
    "string ('<|role|>content' segments + eos) via a left fold over the "
    "parsed turn array — one codegen expression per row, no explode, no "
    "window; array order IS the sequence order a shuffle would have to "
    "re-establish",
)
def q_sft_render_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.sft import render_chat_template

    return render_chat_template(_conv_frame(spark, sf_dir), "conv")


@_q(
    "preference_pairs",
    """
    WITH r AS (
      SELECT user_id, event_id,
             CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS score
      FROM events
      WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND value IS NOT NULL
    ),
    hi AS (
      SELECT user_id, event_id AS chosen, score AS chosen_score FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY score DESC, event_id DESC) AS rk
        FROM r
      ) WHERE rk = 1
    ),
    lo AS (
      SELECT user_id, event_id AS rejected, score AS rejected_score FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY score ASC, event_id ASC) AS rk
        FROM r
      ) WHERE rk = 1
    )
    SELECT h.user_id, h.chosen, l.rejected,
           CAST(h.chosen_score - l.rejected_score AS BIGINT) AS margin
    FROM hi h JOIN lo l ON h.user_id = l.user_id
    WHERE h.chosen_score - l.rejected_score >= 1
    """,
    "Reward-model preference-pair construction: per prompt (user), the "
    "(highest, lowest) scored responses with deterministic struct "
    "tie-breaks, kept when the margin clears the floor — two map-side-"
    "combined max_by/min_by aggregations, ONE prompt-grain shuffle, no "
    "window or self-join on the Spark side",
)
def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.sft import preference_pairs

    ev = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            "user_id",
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("score"),
        )
    )
    return preference_pairs(ev, "user_id", "event_id", "score", min_margin=1)


@_q(
    "compression_quality",
    None,
    "zlib compression-ratio quality signal per doc (templated/repetitive "
    "text compresses far below prose — the classic cheap redundancy "
    "filter next to the Gopher rules).  Rows-only by necessity: zlib "
    "bytes are not SQL-expressible and not version-stable across zlib "
    "builds; evidence is an exact pytest differential against an "
    "independent direct zlib call plus ordering invariants "
    "(tests/test_sft.py::test_compression_ratio_*)",
)
def q_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import compression_ratio

    d = table(spark, sf_dir, "documents")
    return compression_ratio(d)


_DCG_TERM_SQL = (
    "CAST(floor(CAST(1000000 AS DOUBLE)"
    " * (ln(CAST(2 AS DOUBLE)) / ln(CAST({r} + 1 AS DOUBLE)))"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


@_q(
    "retrieval_eval_bm25",
    f"""
    WITH {_BM25_CTES},
    rk AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id ASC) AS rnk
        FROM bs
      ) WHERE rnk <= 10
    ),
    dt AS (SELECT DISTINCT doc_id, term FROM tk),
    qr AS (
      SELECT qt.query_id, dt.doc_id
      FROM qt JOIN dt USING (term)
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel FROM qr GROUP BY 1),
    hits AS (
      SELECT r.query_id, r.rnk
      FROM rk r JOIN qr ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id
    ),
    hq AS (
      SELECT query_id,
             CAST(count(*) AS BIGINT) AS n_hits,
             CAST(min(rnk) AS BIGINT) AS first_rank,
             CAST(sum({_DCG_TERM_SQL.format(r="rnk")}) AS BIGINT) AS dcg_micro
      FROM hits GROUP BY 1
    ),
    base AS (
      SELECT n.query_id, n.n_rel,
             coalesce(h.n_hits, 0) AS n_hits,
             h.first_rank,
             coalesce(h.dcg_micro, 0) AS dcg_micro,
             CAST(coalesce(list_sum(list_transform(
               range(1, CAST(least(n.n_rel, 10) AS BIGINT) + 1),
               r -> {_DCG_TERM_SQL.format(r="r")})), 0) AS BIGINT) AS idcg_micro
      FROM nrel n LEFT JOIN hq h USING (query_id)
    )
    SELECT CAST(query_id AS INTEGER) AS query_id,
           CAST(n_rel AS BIGINT) AS n_rel,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits * 1000000 // n_rel AS BIGINT) AS recall_micro,
           CAST(CASE WHEN first_rank IS NULL THEN 0
                     ELSE 1000000 // first_rank END AS BIGINT) AS mrr_micro,
           CAST(dcg_micro * 1000000 // idcg_micro AS BIGINT) AS ndcg_micro
    FROM base
    """,
    "IR evaluation of the BM25 run against exact term-containment "
    "relevance (doc relevant iff it holds >= 2 distinct query terms): "
    "per-query recall@10, MRR@10, nDCG@10 — every metric an exact micro-"
    "grid integer (counts, integer divisions, micro-snapped binary-log "
    "discounts via the same ln() recipe as the BM25 idf).  The retrieval "
    "stack's measuring twin: rankers get judged with the same "
    "hash-verified discipline as the rankers themselves",
)
def q_retrieval_eval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import normalized_text
    from wellmeet_data_pipeline_spark.operators.retrieval import (
        _query_terms_df,
        bm25_topk,
        ir_eval_metrics,
    )

    d = table(spark, sf_dir, "documents")
    run = bm25_topk(d, _RETRIEVAL_QUERIES, k=10)
    qt = _query_terms_df(spark, _RETRIEVAL_QUERIES)
    # broadcast semi-join on the ~12 query terms FIRST, dedup the
    # survivors after: a corpus-grain distinct before the join would
    # shuffle every token (the BM25 scale-shape rule; review catch)
    toks = d.select(
        "doc_id",
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("term"),
    ).filter(F.col("term") != "")
    qrels = (
        toks.join(F.broadcast(qt), "term")
        .select("query_id", "doc_id", "term")
        .distinct()
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("__m"))
        .filter(F.col("__m") >= 2)
        .select("query_id", "doc_id")
    )
    return ir_eval_metrics(run, qrels, k=10)



def _mmr_oracle(k: int = 5) -> str:
    """Unrolled greedy-MMR CTE chain (the _pagerank_oracle pattern: k is
    a bounded hyperparameter, so the iteration unrolls instead of WITH
    RECURSIVE).  State per query = (picked list, scores list); each step
    joins the not-yet-picked candidates, resolves max-similarity-to-
    picked from the pair frame, and picks via a row_number window on the
    exact-integer mmr score (DESC, doc_id ASC — ties -> lowest doc).
    Queries whose candidates are exhausted before step k carry their
    state through the NOT EXISTS branch unchanged."""
    lam = "CAST(500000 AS BIGINT)"
    m = "CAST(1000000 AS BIGINT)"
    parts = [
        f"""sel1 AS MATERIALIZED (
      SELECT query_id, [doc_id] AS picked, [sc] AS scores
      FROM (
        SELECT query_id, doc_id, {lam} * rel_norm + {lam} * {m} AS sc,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {lam} * rel_norm + {lam} * {m} DESC,
                                           doc_id ASC) AS rk
        FROM rn)
      WHERE rk = 1)"""
    ]
    for t in range(2, k + 1):
        parts.append(
            f"""step{t} AS MATERIALIZED (
      SELECT s.query_id, s.picked, s.scores, c.doc_id,
             any_value(c.rel_norm) AS rel_norm,
             coalesce(max(CASE WHEN (j.a = c.doc_id AND list_contains(s.picked, j.b))
                                 OR (j.b = c.doc_id AND list_contains(s.picked, j.a))
                               THEN j.jac END), CAST(0 AS BIGINT)) AS mj
      FROM sel{t-1} s
      JOIN rn c ON c.query_id = s.query_id AND NOT list_contains(s.picked, c.doc_id)
      LEFT JOIN jp j ON j.query_id = s.query_id
      GROUP BY s.query_id, s.picked, s.scores, c.doc_id),
    sel{t} AS MATERIALIZED (
      SELECT query_id, list_append(picked, doc_id) AS picked,
             list_append(scores, sc) AS scores
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sc DESC, doc_id ASC) AS rk
        FROM (SELECT *, {lam} * rel_norm + {lam} * ({m} - mj) AS sc FROM step{t}))
      WHERE rk = 1
      UNION ALL
      SELECT s.query_id, s.picked, s.scores FROM sel{t-1} s
      WHERE NOT EXISTS (SELECT 1 FROM step{t} t2 WHERE t2.query_id = s.query_id))"""
        )
    return ",\n    ".join(parts) + f"""
    SELECT CAST(query_id AS INTEGER) AS query_id,
           CAST(unnest(picked) AS BIGINT) AS doc_id,
           CAST(unnest(range(1, len(picked) + 1)) AS INTEGER) AS rank,
           CAST(unnest(scores) AS BIGINT) AS mmr_micro
    FROM sel{k}"""


@_q(
    "mmr_diversified_topk",
    f"""
    WITH {_BM25_CTES},
    cand AS (
      SELECT query_id, doc_id, s FROM (
        SELECT query_id, doc_id, s,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id ASC) AS rnk
        FROM bs) WHERE rnk <= 10
    ),
    rn AS MATERIALIZED (
      SELECT query_id, doc_id,
             CAST(s * 1000000 // max(s) OVER (PARTITION BY query_id) AS BIGINT)
               AS rel_norm
      FROM cand
    ),
    cd AS (SELECT DISTINCT doc_id FROM cand),
    norm2 AS (
      SELECT d.doc_id, string_split({_NORM_SQL}, ' ') AS words
      FROM documents d JOIN cd USING (doc_id)
    ),
    sh2 AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shs
      FROM norm2
    ),
    ex2 AS (SELECT doc_id, unnest(shs) AS shingle FROM sh2),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM ex2 GROUP BY 1),
    mco AS (
      SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS inter
      FROM ex2 a JOIN ex2 b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS MATERIALIZED (
      SELECT ca.query_id, ca.doc_id AS a, cb.doc_id AS b,
             CASE WHEN coalesce(sa.n_sh, 0) + coalesce(sb.n_sh, 0)
                       - coalesce(mco.inter, 0) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(coalesce(mco.inter, 0) * 1000000
                            // (coalesce(sa.n_sh, 0) + coalesce(sb.n_sh, 0)
                                - coalesce(mco.inter, 0)) AS BIGINT) END AS jac
      FROM cand ca JOIN cand cb
        ON ca.query_id = cb.query_id AND ca.doc_id < cb.doc_id
      LEFT JOIN sz sa ON sa.doc_id = ca.doc_id
      LEFT JOIN sz sb ON sb.doc_id = cb.doc_id
      LEFT JOIN mco ON mco.da = ca.doc_id AND mco.db = cb.doc_id
    ),
    {_mmr_oracle(5)}
    """,
    "Greedy MMR diversified top-5 per query over the BM25 top-10 run "
    "(Carbonell-Goldstein: lam*rel - (1-lam)*max_sim_to_picked, lam=0.5) "
    "with 3-gram-Jaccard redundancy — relevance normalized per query and "
    "every score an exact integer micro product, so the greedy argmax "
    "chain is engine-reproducible.  The greedy runs per query over the "
    "TOP-N CUT only (state is n-bounded, never corpus-bounded); the "
    "redundancy frame is candidate-pairs-bounded via the inverted "
    "shingle index of the candidates alone",
)
def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import shingles_df
    from wellmeet_data_pipeline_spark.operators.retrieval import (
        bm25_scores,
        mmr_diversify,
    )

    d = table(spark, sf_dir, "documents")
    sc = bm25_scores(d, _RETRIEVAL_QUERIES)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_int").desc(), F.col("doc_id").asc()
    )
    # candidates materialized once: they feed the rel-norm window, the
    # candidate-doc semi-join AND both sides of the pair frame — without
    # the checkpoint each consumer re-runs the whole BM25 lineage
    cand = (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "doc_id", "score_int")
        .localCheckpoint(eager=True)
    )
    wq = Window.partitionBy("query_id")
    rn = cand.withColumn("max_s", F.max("score_int").over(wq)).select(
        "query_id",
        "doc_id",
        F.expr("score_int * 1000000 div max_s").cast("long").alias("rel_norm_micro"),
    )
    cd = cand.select("doc_id").distinct()
    sh = (
        shingles_df(d.join(F.broadcast(cd), "doc_id"), n=3)
        .select("doc_id", "shingle")
        .distinct()
        .localCheckpoint(eager=True)  # feeds sizes AND both self-join sides
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    co = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    pairs = (
        cand.alias("ca")
        .join(cand.alias("cb"), "query_id")
        .filter(F.col("ca.doc_id") < F.col("cb.doc_id"))
        .select(
            "query_id",
            F.col("ca.doc_id").alias("a"),
            F.col("cb.doc_id").alias("b"),
        )
        .join(F.broadcast(sz).withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "sa"), "a", "left")
        .join(F.broadcast(sz).withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "sb"), "b", "left")
        .join(F.broadcast(co).withColumnRenamed("da", "a").withColumnRenamed("db", "b"), ["a", "b"], "left")
        .select(
            "query_id",
            "a",
            "b",
            F.expr(
                "CASE WHEN coalesce(sa, 0) + coalesce(sb, 0) - coalesce(inter, 0) = 0 "
                "THEN CAST(0 AS BIGINT) "
                "ELSE coalesce(inter, 0) * 1000000 div "
                "(coalesce(sa, 0) + coalesce(sb, 0) - coalesce(inter, 0)) END"
            ).cast("long").alias("jac_micro"),
        )
    )
    return mmr_diversify(rn, pairs, k=5, lam_micro=500_000)



_BLOOM_M = 4096
_BLOOM_K = 3
_BLOOM_BITS_SQL = " UNION ".join(
    f"SELECT DISTINCT ({_hex_int_sql('hx', 1 + 8 * i, 8)}) % {_BLOOM_M} AS pos FROM bh"
    for i in range(_BLOOM_K)
)
_BLOOM_PPOS_SQL = " UNION ALL ".join(
    f"SELECT k, ({_hex_int_sql('hx', 1 + 8 * i, 8)}) % {_BLOOM_M} AS pos FROM ph"
    for i in range(_BLOOM_K)
)


@_q(
    "bloom_prefilter_stats",
    f"""
    WITH bk AS (
      SELECT DISTINCT c_custkey AS k FROM customer
      WHERE c_acctbal < 0 AND c_custkey IS NOT NULL
    ),
    bh AS (SELECT k, sha256(CAST(k AS VARCHAR)) AS hx FROM bk),
    bits AS ({_BLOOM_BITS_SQL}),
    pk AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL),
    ph AS (SELECT k, sha256(CAST(k AS VARCHAR)) AS hx FROM pk),
    ppos AS ({_BLOOM_PPOS_SQL}),
    pass AS (
      SELECT k FROM ppos JOIN bits USING (pos)
      GROUP BY k HAVING count(*) = {_BLOOM_K}
    ),
    tm AS (SELECT pk.k FROM pk JOIN bk ON pk.k = bk.k)
    SELECT CAST((SELECT count(*) FROM bk) AS BIGINT) AS n_build,
           CAST((SELECT count(*) FROM pk) AS BIGINT) AS n_probe,
           CAST((SELECT count(*) FROM pass) AS BIGINT) AS n_pass,
           CAST((SELECT count(*) FROM tm) AS BIGINT) AS n_true_match,
           CAST((SELECT count(*) FROM pass) - (SELECT count(*) FROM tm) AS BIGINT)
             AS n_false_pos,
           CAST((SELECT count(*) FROM bits) AS BIGINT) AS n_bits_set,
           CAST(CASE WHEN (SELECT count(*) FROM pk) = (SELECT count(*) FROM tm)
                     THEN 0
                     ELSE ((SELECT count(*) FROM pass) - (SELECT count(*) FROM tm))
                          * 1000000
                          // ((SELECT count(*) FROM pk) - (SELECT count(*) FROM tm))
                END AS BIGINT) AS fp_rate_micro
    """,
    "Bloom-filter join prefilter with EXACT false-positive accounting: "
    "delinquent customers (the build side) set 3 sha-derived bits each "
    "in a 4096-bit filter; distinct order custkeys probe it, and passes "
    "minus the exact semi-join matches = rows a Bloom-gated shuffle "
    "would still move for nothing.  The runtime-filter pushdown pattern "
    "(probe rows drop BEFORE the exchange, shuffle volume = matches + "
    "the measured FP mass) made hash-verifiable by deriving positions "
    "from sha256 both engines can compute; the deliberately small m "
    "shows measurable saturation as SF grows — the sizing signal the "
    "operator exists to provide",
)
def q_bloom_prefilter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.joins import bloom_prefilter_stats

    return bloom_prefilter_stats(
        table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0),
        table(spark, sf_dir, "orders"),
        build_key="c_custkey",
        probe_key="o_custkey",
        m_bits=_BLOOM_M,
        k_hashes=_BLOOM_K,
    )



@_q(
    "token_pmi_collocations",
    f"""
    WITH nw AS (
      SELECT list_filter(string_split({_NORM_SQL}, ' '), w -> w <> '') AS words
      FROM documents
    ),
    uni AS (SELECT unnest(words) AS term FROM nw),
    c1 AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
    ntok AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
    bg0 AS (
      SELECT unnest(words[1:len(words)-1]) AS w1,
             unnest(words[2:len(words)]) AS w2
      FROM nw WHERE len(words) >= 2
    ),
    npair AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg0),
    c2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy FROM bg0
      GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT w1, w2, c_xy,
           CAST(floor(ln((CAST(c_xy AS DOUBLE) * (SELECT n FROM ntok)
                          * (SELECT n FROM ntok))
                         / (CAST((SELECT n FROM npair) AS DOUBLE) * a.c * b.c))
                      * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS pmi_micro
    FROM c2
    JOIN c1 a ON a.term = c2.w1
    JOIN c1 b ON b.term = c2.w2
    ORDER BY pmi_micro DESC, w1 ASC, w2 ASC
    LIMIT 30
    """,
    "Top-30 PMI collocations (pointwise mutual information of adjacent "
    "word pairs, min count 5): pmi = ln(c_xy * N_tok^2 / (N_pairs * c_x "
    "* c_y)) — every argument an exact bigint, one IEEE division, the "
    "micro-grid ln() snap — the classic collocation / stop-phrase mining "
    "read over the corpus.  Scale shape: bigrams come from the zero-"
    "shuffle word-array zip (no lag window), both count frames are "
    "map-side-combined vocabulary aggregations, and the min-count filter "
    "shrinks the pair frame BEFORE the unigram joins; top-30 is a "
    "TakeOrdered, never a global sort",
)
def q_token_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import normalized_text

    d = table(spark, sf_dir, "documents")
    base = d.select(
        F.filter(
            F.split(normalized_text(F.col("text")), " "), lambda x: x != ""
        ).alias("w")
    ).localCheckpoint(eager=True)  # words feed unigram, bigram AND scalar
    # consumers; without this each re-runs the normalization scan
    uni = base.select(F.explode("w").alias("term"))
    c1 = uni.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    ntok = uni.agg(F.count("*").cast("long").alias("n_tok"))
    bg0 = base.filter(F.size("w") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(w, 1, size(w) - 1)"), F.expr("slice(w, 2, size(w) - 1)")
            )
        ).alias("z")
    ).select(F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    npair = bg0.agg(F.count("*").cast("long").alias("n_pair"))
    c2 = (
        bg0.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
    )
    joined = (
        c2.join(c1.withColumnRenamed("term", "w1").withColumnRenamed("c", "ca"), "w1")
        .join(c1.withColumnRenamed("term", "w2").withColumnRenamed("c", "cb"), "w2")
        .crossJoin(F.broadcast(ntok))
        .crossJoin(F.broadcast(npair))
    )
    pmi = F.floor(
        F.log(
            (F.col("c_xy").cast("double") * F.col("n_tok") * F.col("n_tok"))
            / (F.col("n_pair").cast("double") * F.col("ca") * F.col("cb"))
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        joined.select("w1", "w2", "c_xy", pmi.alias("pmi_micro"))
        .orderBy(F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(30)
    )



@_q(
    "calibration_ece",
    f"""
    WITH {_CLS_CTES},
    sc AS (
      SELECT doc_id,
             CAST(floor(CAST(s AS DOUBLE) / (CAST(32768 AS DOUBLE) * n_tokens)
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS si
      FROM cls_agg
    ),
    lab AS (
      SELECT sc.si,
             least(9, greatest(0, CAST(floor((CAST(sc.si AS DOUBLE) / 1000000
                                              - CAST(-1.0 AS DOUBLE)) / CAST(0.2 AS DOUBLE))
                                       AS INT))) AS bin,
             CAST(d.lang = 'en' AS INT) AS y
      FROM sc JOIN documents d USING (doc_id)
    ),
    pb AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS pos,
             CAST(sum(si) AS BIGINT) AS ssum
      FROM lab GROUP BY bin
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(abs(pos * 1000000 - ssum)) // sum(n) AS BIGINT) AS ece_micro,
           CAST(max(abs(pos * 1000000 - ssum) // n) AS BIGINT) AS mce_micro
    FROM pb
    """,
    "Expected / maximum calibration error of the hashed linear "
    "classifier vs the lang='en' label — the single-number calibration "
    "gate next to classifier_calibration's reliability diagram.  The "
    "per-bin gap n_b*|p_b - s_b| reduces to |pos_b*1e6 - ssum_b| (exact "
    "bigint), so ECE/MCE involve ZERO float summation; one 10-ary "
    "groupBy then a scalar fold",
)
def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import (
        expected_calibration_error,
        hashed_linear_score,
        model_weights_table,
    )

    d = table(spark, sf_dir, "documents")
    scored = hashed_linear_score(d, model_weights_table(spark)).join(
        d.select("doc_id", (F.col("lang") == "en").cast("int").alias("y")), "doc_id"
    )
    return expected_calibration_error(scored, "logit", "y", n_bins=10, lo=-1.0, hi=1.0)



@_q(
    "rag_context_pack",
    f"""
    WITH {_BM25_CTES},
    run AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id ASC) AS rnk
        FROM bs) WHERE rnk <= 10
    ),
    pk AS (
      SELECT r.query_id, r.doc_id, r.rnk,
             CAST(d.dl AS BIGINT) AS n_tokens,
             CAST(sum(d.dl) OVER (PARTITION BY r.query_id ORDER BY r.rnk
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM run r JOIN dl d USING (doc_id)
    )
    SELECT CAST(query_id AS INTEGER) AS query_id, doc_id,
           CAST(rnk AS INTEGER) AS rank, n_tokens, cum_tokens
    FROM pk WHERE cum_tokens <= 220
    """,
    "RAG context assembly: the BM25 top-10 run packed into a 220-token "
    "context budget per query — documents keep rank order while the "
    "running token total (the BM25 dl, exact integers) stays within "
    "budget (contiguous-prefix rule: deterministic, no knapsack "
    "reordering).  The post-retrieval step every RAG serving path runs; "
    "token counting reuses the candidate-bounded dl frame, so packing "
    "adds one rank-partitioned window over queries x 10 rows, nothing "
    "corpus-grain",
)
def q_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.retrieval import (
        _doc_tokens,
        bm25_topk,
    )

    d = table(spark, sf_dir, "documents")
    run = bm25_topk(d, _RETRIEVAL_QUERIES, k=10).localCheckpoint(eager=True)
    cand = run.select("doc_id").distinct()
    n_tokens = (
        _doc_tokens(d.join(F.broadcast(cand), "doc_id"), "text", "doc_id")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_tokens"))
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        run.join(n_tokens, "doc_id")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= 220)
        .select("query_id", "doc_id", "rank", "n_tokens", "cum_tokens")
    )



def _lpa_oracle(iters: int = 3) -> str:
    """Unrolled synchronous label-propagation CTE chain (same pattern as
    _pagerank_oracle): per round, each node adopts the MODE of its
    neighbors' round-(t-1) labels, ties to the lowest label, via a
    row_number pick.  Each lp{t} references lp{t-1} exactly once, so no
    MATERIALIZED hints are needed (cf. the MMR oracle)."""
    parts = ["lp0 AS (SELECT u AS node, u AS label FROM deg)"]
    for t in range(1, iters + 1):
        parts.append(
            f"""lp{t} AS (
      SELECT node, label FROM (
        SELECT e.v AS node, p.label, count(*) AS n,
               row_number() OVER (PARTITION BY e.v
                                  ORDER BY count(*) DESC, p.label ASC) AS rk
        FROM e2 e JOIN lp{t-1} p ON p.node = e.u
        GROUP BY e.v, p.label
      ) WHERE rk = 1)"""
        )
    return ",\n    ".join(parts) + f"""
    SELECT node, label FROM lp{iters}"""


@_q(
    "dedup_graph_communities",
    f"""
    WITH {_minhash_sha_ctes()},
    e2 AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT u FROM e2 GROUP BY u),
    {_lpa_oracle(3)}
    """,
    "Deterministic synchronous label propagation (3 rounds, neighbor-"
    "mode labels, ties to lowest) over the MinHash near-dup candidate "
    "graph — community detection at the grain BETWEEN pair and "
    "component: CC merges everything reachable, LPA splits a component "
    "along sparse cuts, the natural 'variants of one underlying page' "
    "read.  Per round one map-side-combined vote count + one node-"
    "partitioned rank window; label frame checkpointed per round",
)
def q_dedup_graph_communities(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        label_propagation,
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents")
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d)
    )
    return label_propagation(edges, iters=3)



@_q(
    "matryoshka_prefix_recall",
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS p
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    n AS (
      SELECT vec_id, e, p,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS ne,
             sqrt(list_sum(list_transform(p, x -> x * x))) AS np
      FROM v
    ),
    fs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, len(a.e) + 1),
                                           i -> a.e[i] * b.e[i])) / (a.ne * b.ne), 4) AS cs
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    ),
    ps AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, len(a.p) + 1),
                                           i -> a.p[i] * b.p[i])) / (a.np * b.np), 4) AS cs
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    ),
    ft AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cs DESC, neighbor_id ASC) AS rk
        FROM fs) WHERE rk <= 5
    ),
    pt AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cs DESC, neighbor_id ASC) AS rk
        FROM ps) WHERE rk <= 5
    ),
    base AS (
      SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_full,
             CAST(coalesce(sum(CASE WHEN p.neighbor_id IS NOT NULL
                                    THEN 1 END), 0) AS BIGINT) AS n_common
      FROM ft f LEFT JOIN pt p
        ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
      GROUP BY f.query_id
    )
    SELECT query_id, n_full, n_common,
           CAST(n_common * 1000000 // n_full AS BIGINT) AS recall_micro
    FROM base
    """,
    "Matryoshka prefix-search quality: exact cosine top-5 with only the "
    "FIRST 16 of 64 dims vs the full-dim truth, per-query recall@5 on "
    "the micro grid — the measurement behind MRL-style tiered vector "
    "search (short prefixes drive the cheap first pass at 100 TB; this "
    "query says what that truncation costs on YOUR corpus).  Both tiers "
    "run the same tile-blocked exact operator, prefix slicing is a "
    "zero-copy array slice before the matmul",
)
def q_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import brute_force_top_k

    e = table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    pre = e.select(
        "vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding")
    )
    full_tk = brute_force_top_k(e, e, k=5, round_digits=4).select(
        "query_id", "neighbor_id"
    )
    pre_tk = brute_force_top_k(pre, pre, k=5, round_digits=4).select(
        F.col("query_id").alias("pq"), F.col("neighbor_id").alias("pn")
    )
    joined = full_tk.join(
        pre_tk,
        (F.col("query_id") == F.col("pq")) & (F.col("neighbor_id") == F.col("pn")),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_full"),
            F.sum(F.when(F.col("pn").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_common"),
        )
        .select(
            "query_id",
            "n_full",
            "n_common",
            F.expr("n_common * 1000000 div n_full").cast("long").alias("recall_micro"),
        )
    )



@_q(
    "sft_exact_dedup",
    f"""
    WITH {_CONV_SQL},
    rendered AS (
      SELECT doc_id,
             {_RENDER_SQL} AS r
      FROM parsed
    )
    SELECT sha256(r) AS fingerprint,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS kept_doc
    FROM rendered WHERE r IS NOT NULL
    GROUP BY 1
    """,
    "Exact dedup at the CONVERSATION grain: the rendered chat-template "
    "string (the exact bytes a trainer would consume) is fingerprinted "
    "with sha256 and collapsed keep-lowest-doc — instruction-tuning's "
    "twin of dedup_exact_documents (duplicate prompts with re-ordered "
    "metadata or duplicate source texts collapse at the training-string "
    "level, where they actually matter).  One map-side-combined groupBy "
    "on the 64-hex key; render is a per-row fold, zero shuffle before "
    "the aggregate",
)
def q_sft_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.sft import render_chat_template

    r = render_chat_template(_conv_frame(spark, sf_dir), "conv")
    return (
        r.filter(F.col("rendered").isNotNull())
        .select("doc_id", F.sha2(F.col("rendered"), 256).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("kept_doc"),
        )
    )


@_q(
    "quality_psi_by_source",
    """
    WITH b AS (
      SELECT source,
             least(9, greatest(0, CAST(n_chars // 64 AS INT))) AS bin
      FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
    ),
    bins(bin) AS (SELECT unnest(range(0, 10))),
    src AS (SELECT DISTINCT source FROM b),
    cs AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
    ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
    cq AS (SELECT bin, CAST(count(*) AS BIGINT) AS cc FROM b GROUP BY 1),
    nq AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM b),
    grid AS (
      SELECT s.source, bn.bin,
             coalesce(cs.c, 0) + 1 AS c1,
             coalesce(cq.cc, 0) + 1 AS cc1,
             ns.n + 10 AS n10,
             (SELECT nn FROM nq) + 10 AS nn10
      FROM src s CROSS JOIN bins bn
      LEFT JOIN cs ON cs.source = s.source AND cs.bin = bn.bin
      LEFT JOIN cq ON cq.bin = bn.bin
      JOIN ns ON ns.source = s.source
    ),
    terms AS (
      SELECT source,
             c1 * nn10 AS a,
             cc1 * n10 AS bb,
             n10, nn10
      FROM grid
    )
    SELECT source,
           CAST(sum((a - bb) * CAST(floor(ln(CAST(a AS DOUBLE) / CAST(bb AS DOUBLE))
                                          * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT))
                // (CAST(any_value(n10) AS BIGINT) * any_value(nn10)) AS BIGINT)
             AS psi_micro
    FROM terms GROUP BY source
    """,
    "Population stability index of each source's length distribution vs "
    "the corpus blend (10 fixed 64-char bins, Laplace +1 smoothing) — "
    "the scorecard-standard drift gate next to source_drift_js.  Every "
    "term is exact: p-q = (a-b)/D with bigint a, b; ln(p/q) = ln(a/b) "
    "micro-snapped; sum of bigint products, ONE division at the end.  "
    "Two map-side-combined counts + a sources x 10 grid — nothing "
    "corpus-grain shuffles",
)
def q_quality_psi_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import (
        length_bins,
        psi_from_source_bin_counts,
    )

    b = length_bins(table(spark, sf_dir, "documents"))
    cs = b.groupBy("source", "bin").agg(F.count("*").alias("c"))
    return psi_from_source_bin_counts(cs)



@_q(
    "daily_anomaly_mad",
    """
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    r1 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY n ASC, day ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS c
      FROM d
    ),
    m AS (
      SELECT event_type, any_value(c) AS c,
             CAST(sum(CASE WHEN rn = (c + 1) // 2 THEN n ELSE 0 END)
                  + sum(CASE WHEN rn = c // 2 + 1 THEN n ELSE 0 END)
                  AS BIGINT) AS m2
      FROM r1 GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, d.n, m.c,
             abs(2 * d.n - m.m2) AS dev2
      FROM d JOIN m USING (event_type)
    ),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY dev2 ASC, day ASC) AS rn
      FROM dev
    ),
    mad AS (
      SELECT event_type,
             CAST(sum(CASE WHEN rn = (c + 1) // 2 THEN dev2 ELSE 0 END)
                  + sum(CASE WHEN rn = c // 2 + 1 THEN dev2 ELSE 0 END)
                  AS BIGINT) AS d4
      FROM r2 GROUP BY event_type
    )
    SELECT v.event_type, v.day, v.n,
           -- greatest(d4, 2) floors MAD at half a count: a degenerate
           -- type where most days share the median (MAD = 0) must not
           -- flag every 1-count wobble as anomalous (review catch)
           CASE WHEN v.c < 5 THEN NULL
                ELSE 2 * v.dev2 > 3 * greatest(mad.d4, 2) END AS is_anomaly
    FROM dev v JOIN mad USING (event_type)
    """,
    "Robust daily-volume anomaly flags: |n - median| > 3 * MAD per event "
    "type — the heavy-tail-safe twin of daily_anomaly_flags' 2-sigma "
    "rule (one outlier day inflates a sigma baseline but not a MAD "
    "one).  Medians are EXACT on the doubled integer grid (m2 = "
    "lower+upper order statistic, d4 likewise for deviations), so the "
    "flag 2*dev2 > 3*d4 is pure bigint comparison — no interpolated "
    "float median anywhere.  Windows partition by event type (day-count "
    "sized groups); nothing event-grain shuffles twice",
)
def q_daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    wt = Window.partitionBy("event_type")
    w1 = Window.partitionBy("event_type").orderBy(F.col("n").asc(), F.col("day").asc())
    r1 = d.withColumn("rn", F.row_number().over(w1)).withColumn(
        "c", F.count("*").over(wt)
    )
    m = r1.groupBy("event_type").agg(
        F.first("c").alias("c"),
        (
            F.sum(F.expr("CASE WHEN rn = (c + 1) div 2 THEN n ELSE 0 END"))
            + F.sum(F.expr("CASE WHEN rn = c div 2 + 1 THEN n ELSE 0 END"))
        ).cast("long").alias("m2"),
    )
    dev = d.join(F.broadcast(m), "event_type").select(
        "event_type", "day", "n", "c",
        F.abs(F.lit(2) * F.col("n") - F.col("m2")).alias("dev2"),
    )
    w2 = Window.partitionBy("event_type").orderBy(F.col("dev2").asc(), F.col("day").asc())
    r2 = dev.withColumn("rn", F.row_number().over(w2))
    mad = r2.groupBy("event_type").agg(
        (
            F.sum(F.expr("CASE WHEN rn = (c + 1) div 2 THEN dev2 ELSE 0 END"))
            + F.sum(F.expr("CASE WHEN rn = c div 2 + 1 THEN dev2 ELSE 0 END"))
        ).cast("long").alias("d4"),
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "day",
        "n",
        F.when(F.col("c") < 5, F.lit(None).cast("boolean"))
        .otherwise(
            F.lit(2) * F.col("dev2") > F.lit(3) * F.greatest(F.col("d4"), F.lit(2))
        )
        .alias("is_anomaly"),
    )



@_q(
    "dedup_best_of_cluster",
    f"""
    WITH RECURSIVE {_minhash_sha_ctes()},
    e2 AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM e2
      UNION
      SELECT e.u, r.r FROM e2 e JOIN reach r ON e.v = r.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    {_CLS_CTES},
    sc AS (
      SELECT doc_id,
             CAST(floor(CAST(s AS DOUBLE) / (CAST(32768 AS DOUBLE) * n_tokens)
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS si
      FROM cls_agg
    ),
    members AS (
      SELECT c.component, c.node, coalesce(sc.si, CAST(0 AS BIGINT)) AS si
      FROM comp c LEFT JOIN sc ON sc.doc_id = c.node
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY component
                                   ORDER BY si DESC, node ASC) AS rk,
             count(*) OVER (PARTITION BY component) AS nm
      FROM members
    )
    SELECT component,
           CAST(nm AS BIGINT) AS n_members,
           CAST(node AS BIGINT) AS survivor_doc,
           CAST(si AS BIGINT) AS survivor_si
    FROM ranked WHERE rk = 1
    """,
    "Quality-aware dedup survivorship: within each MinHash near-dup "
    "cluster keep the HIGHEST-classifier-score copy (ties -> lowest "
    "doc), not the arbitrary min-id — the survivor rule real curation "
    "pipelines use ('keep the best copy'); composes the CC machinery "
    "with the hashed-linear quality scorer, both already hash-verified.  "
    "Empty-doc members score coalesce(0); per-cluster argmax on the "
    "exact (si, -doc) composite",
)
def q_dedup_best_of_cluster(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        connected_components,
        minhash_lsh_candidates_sha,
    )
    from wellmeet_data_pipeline_spark.operators.scoring import (
        hashed_linear_score,
        model_weights_table,
    )

    d = table(spark, sf_dir, "documents")
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d)
    )
    comp = connected_components(edges)
    si = hashed_linear_score(d, model_weights_table(spark)).select(
        "doc_id",
        F.floor(F.col("logit") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("si"),
    )
    members = comp.join(
        si.withColumnRenamed("doc_id", "node"), "node", "left"
    ).select(
        "component", "node", F.coalesce(F.col("si"), F.lit(0)).cast("long").alias("si")
    )
    best = members.groupBy("component").agg(
        F.count("*").cast("long").alias("n_members"),
        F.max_by("node", F.struct(F.col("si"), (-F.col("node")).alias("nd")))
        .cast("long")
        .alias("survivor_doc"),
        F.max(F.struct(F.col("si"), (-F.col("node")).alias("nd")))["si"]
        .cast("long")
        .alias("survivor_si"),
    )
    return best.select("component", "n_members", "survivor_doc", "survivor_si")



@_q(
    "benford_first_digit",
    """
    WITH cents AS (
      SELECT CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS c
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    pos AS (SELECT c FROM cents WHERE c > 0),
    d AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit FROM pos
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM d),
    grid AS (SELECT unnest(range(1, 10)) AS digit)
    SELECT g.digit,
           coalesce(o.n_obs, 0) AS n_obs,
           CAST(floor(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / g.digit)
                      / ln(CAST(10 AS DOUBLE)) * 1000000
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS expected_micro,
           CAST((coalesce(o.n_obs, 0) * 1000000
                 - (SELECT nn FROM n)
                   * CAST(floor(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / g.digit)
                                / ln(CAST(10 AS DOUBLE)) * 1000000
                                + CAST(0.5 AS DOUBLE)) AS BIGINT))
                // (SELECT nn FROM n) AS BIGINT) AS dev_micro
    FROM grid g LEFT JOIN obs o ON o.digit = g.digit
    """,
    "Benford first-digit audit of order totals: observed leading-digit "
    "counts (on the exact integer cents grid — digit extraction from the "
    "bigint's decimal string, never float formatting) vs the Benford "
    "expectation ln(1+1/d)/ln(10) micro-snapped; dev_micro is the signed "
    "per-digit probability gap — the classic fabricated-data / "
    "unit-mixing detector for financial columns.  One 9-ary groupBy; "
    "nothing order-grain shuffles",
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    cents = o.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("c")
    ).filter(F.col("c") > 0)
    d = cents.select(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"))
    obs = d.groupBy("digit").agg(F.count("*").cast("long").alias("n_obs"))
    nn = d.agg(F.count("*").cast("long").alias("nn"))
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    e_micro = F.floor(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
        * F.lit(1000000)
        + F.lit(0.5)
    ).cast("long")
    return (
        grid.join(obs, "digit", "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            e_micro.alias("expected_micro"),
            "nn",
        )
        .select(
            "digit",
            "n_obs",
            "expected_micro",
            F.expr("(n_obs * 1000000 - nn * expected_micro) div nn")
            .cast("long")
            .alias("dev_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Round 10 additions
# ---------------------------------------------------------------------------

_SHARD_SALT = "shard"


def _rendezvous_digest_sql(shard: int) -> str:
    return (
        f"sha256(concat_ws('|', '{_SHARD_SALT}', '{shard}', "
        "CAST(doc_id AS VARCHAR)))"
    )


def _rendezvous_case_sql(n_shards: int) -> str:
    mx = "greatest(" + ", ".join(_rendezvous_digest_sql(s) for s in range(n_shards)) + ")"
    whens = "\n             ".join(
        f"WHEN {_rendezvous_digest_sql(s)} = {mx} THEN {s}"
        for s in range(n_shards - 1)
    )
    return f"CASE {whens}\n             ELSE {n_shards - 1} END"


@_q(
    "rendezvous_sharding",
    f"""
    SELECT doc_id,
           CAST({_rendezvous_case_sql(8)} AS INT) AS shard
    FROM documents
    """,
    "rendezvous (highest-random-weight) shard assignment over 8 shards: "
    "winner = argmax over shards of sha256(salt|shard|id), lowest shard "
    "on (cryptographically impossible) ties — a PURE PROJECTION (no "
    "join, no shuffle, whole-stage codegen), and the assignment a key "
    "keeps as the fleet grows unless its new shard outright wins",
)
def q_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.sharding import rendezvous_shard

    d = table(spark, sf_dir, "documents")
    return rendezvous_shard(d, 8, salt=_SHARD_SALT).select("doc_id", "shard")


@_q(
    "reshard_movement_stats",
    f"""
    WITH s AS (
      SELECT CAST({_rendezvous_case_sql(8)} AS INT) AS s8,
             CAST({_rendezvous_case_sql(9)} AS INT) AS s9
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
           CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS moved_micro
    FROM s
    """,
    "the reason rendezvous hashing earns its 8 digests per key: growing "
    "the fleet 8 -> 9 shards moves only ~1/9 of keys (a key moves ONLY "
    "if the new shard wins its rendezvous), where hash(id) % N moves "
    "~8/9 — the difference between an incremental copy and a full "
    "petabyte rewrite; one-row exact audit of that movement fraction",
)
def q_reshard_movement_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.sharding import reshard_movement

    d = table(spark, sf_dir, "documents")
    return reshard_movement(d, 8, 9, salt=_SHARD_SALT)


@_q(
    "ttr_lexical_diversity",
    f"""
    WITH norm AS (
      SELECT lang, string_split({_NORM_SQL}, ' ') AS words
      FROM documents WHERE text IS NOT NULL
    ),
    per AS (
      SELECT lang,
             CAST(len(words) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(words)) AS BIGINT) AS n_types
      FROM norm
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_types) AS BIGINT) AS total_types,
           CAST(sum(n_types * 1000000 // n_tokens) // count(*) AS BIGINT)
             AS mean_ttr_micro
    FROM per GROUP BY lang
    """,
    "type-token ratio (lexical diversity) per language: distinct "
    "normalized words / words per doc on the exact integer micro grid, "
    "averaged per lang — the cheap richness signal quality filters pair "
    "with length (templated/spun text scores low TTR at normal length); "
    "narrow projection + one lang-ary groupBy",
)
def q_ttr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import normalized_text

    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.split(normalized_text(F.col("text")), " ")
    per = d.select(
        "lang",
        F.size(words).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("n_types"),
    )
    return per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_types").cast("long").alias("total_types"),
        F.expr("sum(n_types * 1000000 div n_tokens) div count(*)")
        .cast("long")
        .alias("mean_ttr_micro"),
    )


@_q(
    "split_leakage_audit",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shs
      FROM norm
    ),
    ex0 AS (SELECT doc_id, unnest(shs) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) <= 10000),
    ex AS (SELECT e.doc_id, e.shingle FROM ex0 e JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM ex GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM co
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5
    ),
    sp AS ({_split_oracle()}),
    lab AS (
      SELECT least(x.split, y.split) AS split_a,
             greatest(x.split, y.split) AS split_b
      FROM pairs p
      JOIN sp x ON x.doc_id = p.id_a
      JOIN sp y ON y.doc_id = p.id_b
    )
    SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs
    FROM lab GROUP BY 1, 2
    """,
    "train/eval leakage audit: near-dup pairs (exact n-gram Jaccard >= "
    "0.5, the hash-verified inverted-index tier) labeled with each "
    "side's corpus_split assignment and counted per split pair — the "
    "off-diagonal rows ARE eval contamination, the check every training "
    "run needs BEFORE the split ships (hash split makes membership a "
    "pure id function, so the audit never materializes the split)",
)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import hash_split
    from wellmeet_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    d = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.5).select("id_a", "id_b")
    sp = hash_split(d, _SPLIT_FRACTIONS).select("doc_id", "split")
    lab = (
        pairs.join(
            sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("__sa")),
            "id_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("__sb")),
            "id_b",
        )
        .select(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
    )
    return lab.groupBy("split_a", "split_b").agg(
        F.count("*").cast("long").alias("n_pairs")
    )


@_q(
    "span_corruption_plan",
    """
    WITH base AS (
      SELECT doc_id,
             (CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'))
              END) AS n
      FROM documents WHERE text IS NOT NULL
    ),
    blocks AS (
      SELECT doc_id, unnest(range(0, n // 20)) AS b FROM base WHERE n >= 20
    ),
    h AS (
      SELECT doc_id, b,
             list_sum(list_transform(range(1, 9),
                 i -> CAST(strpos('0123456789abcdef',
                      substr(sha256(concat_ws('|', 'span', CAST(doc_id AS VARCHAR),
                                              CAST(b AS VARCHAR))), i, 1)) - 1
                      AS BIGINT) << (4 * (8 - i)))) AS hv
      FROM blocks
    )
    SELECT doc_id,
           CAST(b * 20 + hv % 18 AS BIGINT) AS span_start,
           CAST(3 AS INT) AS span_len
    FROM h
    """,
    "deterministic T5-style span-corruption plan: one 3-token mask per "
    "complete 20-token block (exactly the 15% rate, mean span 3), offset "
    "sha256(salt|doc|block)-derived — the plan is a pure function of "
    "content identity, so every loader worker regenerates identical "
    "masks with no stored mask table and no coordination; narrow "
    "explode, zero shuffle",
)
def q_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.corpus import span_corruption_plan

    return span_corruption_plan(table(spark, sf_dir, "documents"))


@_q(
    "quality_pareto_frontier",
    f"""
    WITH m AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(len(list_distinct(string_split({_NORM_SQL}, ' '))) AS BIGINT)
               AS n_types
      FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL
    )
    SELECT doc_id, n_chars, n_types FROM m d
    WHERE NOT EXISTS (
      SELECT 1 FROM m e
      WHERE e.n_chars >= d.n_chars AND e.n_types >= d.n_types
        AND (e.n_chars > d.n_chars OR e.n_types > d.n_types)
    )
    """,
    "documents Pareto-optimal in (length, lexical richness) — the set no "
    "curation rule trading the two can ever discard first.  Spark plan "
    "is O(n log n): bucket-local frontiers prune the corpus in parallel "
    "(local domination implies global), then one serial window pass over "
    "the ~|frontier| survivors; the oracle is the O(n^2) EXISTS "
    "definition, so the window algebra is verified against the spec",
)
def q_quality_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import normalized_text
    from wellmeet_data_pipeline_spark.operators.scoring import pareto_frontier

    d = table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    m = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(F.array_distinct(F.split(normalized_text(F.col("text")), " ")))
        .cast("long")
        .alias("n_types"),
    )
    return pareto_frontier(m, "n_chars", "n_types")


@_q(
    "winnowing_fingerprints",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
      FROM documents WHERE text IS NOT NULL
    ),
    g AS (
      SELECT doc_id,
             unnest(range(0, greatest(len(words) - 2, 0))) AS pos,
             unnest(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                    i -> array_to_string(words[i:i+2], ' '))) AS gram
      FROM norm
    ),
    h AS (
      SELECT doc_id, pos,
             list_sum(list_transform(range(1, 9),
                 j -> CAST(strpos('0123456789abcdef',
                      substr(sha256(concat('win|', gram)), j, 1)) - 1
                      AS BIGINT) << (4 * (8 - j)))) AS fp
      FROM g
    ),
    n AS (SELECT doc_id, max(pos) AS max_pos FROM h GROUP BY doc_id),
    wins AS (
      SELECT doc_id, unnest(range(0, max_pos - 2)) AS w
      FROM n WHERE max_pos >= 3
    ),
    j AS (
      SELECT w.doc_id, w.w, h.pos, h.fp
      FROM wins w JOIN h ON h.doc_id = w.doc_id AND h.pos BETWEEN w.w AND w.w + 3
    ),
    pick AS (
      SELECT doc_id, w, pos, fp,
             row_number() OVER (PARTITION BY doc_id, w
                                ORDER BY fp ASC, pos DESC) AS rn
      FROM j
    ),
    fps AS (SELECT DISTINCT doc_id, pos, fp FROM pick WHERE rn = 1)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
           CAST(sum(fp) AS BIGINT) AS fp_sum,
           CAST(min(fp) AS BIGINT) AS fp_min,
           CAST(max(fp) AS BIGINT) AS fp_max
    FROM fps GROUP BY doc_id
    """,
    "winnowing fingerprints (the MOSS algorithm): rightmost-minimal gram "
    "hash per 4-gram window, deduped — the selection guarantees any "
    "shared run of >= 6 words between documents shares a fingerprint "
    "(completeness LSH can't give) at ~2/(w+1) density; per-doc count/"
    "sum/min/max digest of the selected set, everything on the exact "
    "integer grid",
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import winnowing_fingerprints

    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fp = winnowing_fingerprints(d)
    return fp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fp"),
        F.sum("fp").cast("long").alias("fp_sum"),
        F.min("fp").cast("long").alias("fp_min"),
        F.max("fp").cast("long").alias("fp_max"),
    )


@_q(
    "hamming_exact_neardup",
    """
    WITH e0 AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64
    ),
    corpus AS (
      SELECT vec_id, v FROM e0
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(range(1, 65),
                 i -> CASE WHEN (i - 1) % 23 = vec_id % 23 THEN -v[i]
                           ELSE v[i] END)
      FROM e0 WHERE vec_id % 50 = 0
    ),
    packed AS (
      SELECT vec_id,
             list_sum(list_transform(range(1, 33),
                 i -> CAST(CASE WHEN v[i] > 0 THEN 1 ELSE 0 END AS BIGINT)
                      << (i - 1))) AS lo,
             list_sum(list_transform(range(33, 65),
                 i -> CAST(CASE WHEN v[i] > 0 THEN 1 ELSE 0 END AS BIGINT)
                      << (i - 33))) AS hi
      FROM corpus
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST((bit_count(xor(a.lo, b.lo))) + (bit_count(xor(a.hi, b.hi)))
                AS INT) AS hamming
    FROM packed a JOIN packed b ON a.vec_id < b.vec_id
    WHERE (bit_count(xor(a.lo, b.lo))) + (bit_count(xor(a.hi, b.hi))) <= 6
    """,
    "EXACT hamming-<=6 near-dup pairs of sign-quantized embeddings via "
    "the pigeonhole equi-join (d_max+1 signature blocks: pairs within "
    "d_max agree exactly on >= 1 block, so the banded join is COMPLETE — "
    "the zero-recall-loss guarantee banded LSH trades away); planted "
    "sign-flipped copies of every 50th vector are all recovered.  The "
    "oracle is the exhaustive O(n^2) definition, so the Spark plan's "
    "completeness is verified against the spec.  Candidates ride as two "
    "packed bigints (16 B), never float vectors",
)
def q_hamming_exact_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import hamming_exact_pairs

    e = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    )
    # rename BEFORE the flip: with the output alias also named vec_id,
    # Spark's lateral-column-alias resolution would bind the transform's
    # F.col("vec_id") to the SHIFTED id and flip the wrong dims
    planted = (
        e.filter((F.col("vec_id") % 50) == 0)
        .select(F.col("vec_id").alias("__orig_id"), "embedding")
        .select(
            (F.col("__orig_id") + F.lit(1_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i % F.lit(23) == F.col("__orig_id") % F.lit(23), -x
                ).otherwise(x),
            ).alias("embedding"),
        )
    )
    corpus = e.select("vec_id", "embedding").unionByName(planted)
    return hamming_exact_pairs(corpus, d_max=6, dim=64)


def _bm25_co_sql(qt_name: str) -> str:
    """The _BM25_CTES `co` scoring CTE body, parameterized by the query-
    terms table so the PRF second pass scores through the SAME formula
    text as the first (digit-for-digit the bm25_topk oracle)."""
    return f"""
      SELECT {qt_name}.query_id, tf.doc_id,
             CAST(floor(
               CAST(CAST(floor(ln(CAST(1 AS DOUBLE)
                     + (CAST(st.n_docs AS DOUBLE) - CAST(dfr.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       / (CAST(dfr.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS DOUBLE)
                 / CAST(1000000 AS DOUBLE)
               * ((CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE)))
                  / (CAST(tf.tf AS DOUBLE)
                     + CAST(1.2 AS DOUBLE) * ((CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE))
                        + CAST(0.75 AS DOUBLE)
                          * (CAST(dl.dl * st.n_docs AS DOUBLE) / CAST(st.total_dl AS DOUBLE)))))
               * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS ci
      FROM {qt_name} JOIN tf USING (term) JOIN dfr USING (term)
           JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
    """


@_q(
    "bm25_prf_topk",
    f"""
    WITH {_BM25_CTES},
    rk1 AS (
      SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id ASC) AS rn
        FROM bs) WHERE rn <= 5
    ),
    candtf AS (
      SELECT r.query_id, t.term, CAST(count(*) AS BIGINT) AS stf
      FROM rk1 r
      JOIN tk t ON t.doc_id = r.doc_id
      LEFT JOIN qt q0 ON q0.query_id = r.query_id AND q0.term = t.term
      WHERE q0.term IS NULL
      GROUP BY 1, 2
    ),
    capped AS (
      SELECT c.query_id, c.term, c.stf
      FROM candtf c JOIN dfr USING (term) CROSS JOIN st
      WHERE dfr.df * 10 <= st.n_docs
    ),
    expt AS (
      SELECT query_id, term FROM (
        SELECT query_id, term,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY stf DESC, term ASC) AS rn
        FROM capped) WHERE rn <= 3
    ),
    qt2 AS (SELECT query_id, term FROM qt
            UNION SELECT query_id, term FROM expt),
    co2 AS ({_bm25_co_sql("qt2")}),
    bs2 AS (
      SELECT query_id, doc_id, CAST(sum(ci) AS BIGINT) AS s
      FROM co2 GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id,
           CAST(s AS DOUBLE) / CAST(1000000 AS DOUBLE) AS score,
           CAST(rnk AS INTEGER) AS rank
    FROM (
      SELECT query_id, doc_id, s,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, doc_id ASC) AS rnk
      FROM bs2) WHERE rnk <= 5
    """,
    "BM25 with pseudo-relevance-feedback expansion (deterministic "
    "Rocchio/RM1): promote the 3 most frequent non-query, "
    "non-quasi-stopword (corpus df <= N/10) terms from each query's "
    "top-5 first-pass docs, rescore the expanded query, cut top-5 — "
    "both passes on the exact micro grid through the shared scoring "
    "core, so retrieval-with-feedback is hash-verified end to end; the "
    "corpus (doc, term) frame never shuffles (broadcast semi-joins on "
    "bounded term sets only)",
)
def q_bm25_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.retrieval import bm25_prf_topk

    d = table(spark, sf_dir, "documents")
    return bm25_prf_topk(d, _RETRIEVAL_QUERIES, k=5, fb_docs=5, fb_terms=3)


@_q(
    "kmeans_silhouette",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    seeds AS (SELECT vec_id AS sid, e AS se FROM v ORDER BY vec_id LIMIT 8),
    d AS (
      SELECT v.vec_id, s.sid,
             round(list_sum(list_transform(range(1, len(v.e) + 1),
                            i -> (v.e[i] - s.se[i]) * (v.e[i] - s.se[i]))), 4) AS dist
      FROM v CROSS JOIN seeds s
    ),
    r AS (
      SELECT vec_id, sid, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, sid) AS rn
      FROM d
    ),
    per AS (
      SELECT vec_id,
             max(CASE WHEN rn = 1 THEN sid END) AS cluster_id,
             max(CASE WHEN rn = 1 THEN dist END) AS a,
             max(CASE WHEN rn = 2 THEN dist END) AS b
      FROM r WHERE rn <= 2 GROUP BY vec_id
    ),
    s AS (
      SELECT cluster_id,
             CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor((b - a) / greatest(a, b) * 1000000
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS sm
      FROM per
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(sm) // count(*) AS BIGINT) AS mean_silhouette_micro
    FROM s GROUP BY cluster_id
    """,
    "simplified (centroid-based) silhouette per k-means cluster: "
    "s = (b - a)/max(a, b) with a = own-seed distance, b = nearest "
    "other seed, on the exact micro grid (0 on the duplicate-seed "
    "degenerate case) — the O(n*k) clustering-quality read that "
    "replaces the O(n^2) pairwise silhouette at scale; same "
    "model-sized seed broadcast as kmeans_cluster_step",
)
def q_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import kmeans_silhouette

    return kmeans_silhouette(table(spark, sf_dir, "embeddings"), k=8)


@_q(
    "cluster_label_purity",
    """
    WITH lv AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    seeds AS (SELECT vec_id AS sid, e AS se FROM lv ORDER BY vec_id LIMIT 8),
    d AS (
      SELECT lv.vec_id, lv.label, s.sid,
             round(list_sum(list_transform(range(1, len(lv.e) + 1),
                            i -> (lv.e[i] - s.se[i]) * (lv.e[i] - s.se[i]))), 4) AS dist
      FROM lv CROSS JOIN seeds s
    ),
    best AS (
      SELECT vec_id, label, sid FROM (
        SELECT vec_id, label, sid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, sid) AS rn
        FROM d) WHERE rn = 1
    ),
    grp AS (
      SELECT sid, label, CAST(count(*) AS BIGINT) AS c
      FROM best GROUP BY sid, label
    ),
    tot AS (SELECT sid, CAST(sum(c) AS BIGINT) AS n FROM grp GROUP BY sid),
    top AS (
      SELECT sid, label, c FROM (
        SELECT sid, label, c,
               row_number() OVER (PARTITION BY sid
                                  ORDER BY c DESC, label ASC) AS rn
        FROM grp) WHERE rn = 1
    )
    SELECT CAST(t.sid AS BIGINT) AS cluster_id,
           CAST(tot.n AS BIGINT) AS n_members,
           t.label AS top_label,
           CAST(t.c * 1000000 // tot.n AS BIGINT) AS purity_micro
    FROM top t JOIN tot ON tot.sid = t.sid
    """,
    "majority-label purity per k-means cluster (do embedding clusters "
    "track the supervised facet?): NULL-labeled vectors excluded before "
    "assignment, majority ties break label-ascending; per-cluster "
    "(size, top label, exact purity fraction) — two tiny groupBys over "
    "the same assignment frame as kmeans_cluster_step",
)
def q_cluster_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import cluster_label_purity

    return cluster_label_purity(table(spark, sf_dir, "embeddings"), k=8)


@_q(
    "tail_index_hill",
    """
    WITH pos AS (
      SELECT CAST(n_chars AS BIGINT) AS x
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    topk AS (
      SELECT x, row_number() OVER (ORDER BY x DESC) AS rk FROM pos
    ),
    thr AS (SELECT x AS xk FROM topk WHERE rk = 100),
    terms AS (
      SELECT CAST(floor(ln(CAST(t.x AS DOUBLE) / CAST(thr.xk AS DOUBLE))
                        * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lt
      FROM topk t CROSS JOIN thr WHERE t.rk < 100
    )
    SELECT CAST(100 AS INT) AS k,
           (SELECT xk FROM thr) AS x_k,
           CAST(sum(lt) AS BIGINT) AS sum_log_micro,
           CAST(sum(lt) // 99 AS BIGINT) AS inv_alpha_micro,
           CAST(CASE WHEN sum(lt) // 99 = 0 THEN 0
                     ELSE 1000000000000 // (sum(lt) // 99) END AS BIGINT)
             AS alpha_micro
    FROM terms
    """,
    "Hill tail-index estimator over document lengths: alpha-hat = "
    "1 / mean(ln(x_(i)/x_(k))) across the top k=100 order statistics, "
    "every log term snapped to the micro grid so the sum is "
    "order-independent — the standard heavy-tail exponent read that "
    "decides trimming thresholds and partition-size headroom (alpha <= 2 "
    "means variance is infinite and mean-based capacity planning lies).  "
    "One TakeOrderedAndProject for the top-k, everything else on a "
    "100-row frame",
)
def q_tail_index_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
    )
    k = 100
    topk = (
        d.select(F.col("n_chars").cast("long").alias("x"))
        .orderBy(F.col("x").desc())
        .limit(k)
    )
    w = Window.orderBy(F.col("x").desc())
    rk = topk.withColumn("rk", F.row_number().over(w))
    thr = rk.filter(F.col("rk") == k).select(F.col("x").alias("xk"))
    lt = F.floor(
        F.log(F.col("x").cast("double") / F.col("xk").cast("double"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    terms = rk.filter(F.col("rk") < k).crossJoin(F.broadcast(thr)).select(
        lt.alias("lt"), "xk"
    )
    return terms.groupBy().agg(
        F.lit(k).cast("int").alias("k"),
        F.max("xk").cast("long").alias("x_k"),
        F.sum("lt").cast("long").alias("sum_log_micro"),
        F.expr(f"sum(lt) div {k - 1}").cast("long").alias("inv_alpha_micro"),
        F.expr(
            f"CASE WHEN sum(lt) div {k - 1} = 0 THEN 0 "
            f"ELSE 1000000000000 div (sum(lt) div {k - 1}) END"
        )
        .cast("long")
        .alias("alpha_micro"),
    )


@_q(
    "minhash_union_parity",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ),
    shl AS (
      SELECT doc_id % 2 AS shard,
             unnest(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                   i -> array_to_string(words[i:i+2], ' '))) AS shingle
      FROM norm
    ),
    g AS (SELECT unnest(range(0, 16)) AS h_idx),
    agg AS (
      SELECT shard, g.h_idx,
             min(substr(sha256(concat_ws('|', shingle, CAST(g.h_idx AS VARCHAR))),
                        1, 16)) AS h
      FROM shl CROSS JOIN g GROUP BY shard, g.h_idx
    ),
    uni AS (
      SELECT g.h_idx,
             min(substr(sha256(concat_ws('|', shingle, CAST(g.h_idx AS VARCHAR))),
                        1, 16)) AS h
      FROM shl CROSS JOIN g GROUP BY g.h_idx
    )
    SELECT CAST(a.h_idx AS INT) AS h_idx,
           a.h AS h_a, b.h AS h_b, u.h AS h_union,
           CAST(CASE WHEN least(a.h, b.h) = u.h THEN 1 ELSE 0 END AS INT)
             AS merged_matches
    FROM agg a
    JOIN agg b ON b.h_idx = a.h_idx AND b.shard = 1
    JOIN uni u ON u.h_idx = a.h_idx
    WHERE a.shard = 0
    """,
    "MinHash sketch MERGEABILITY, verified: the signature of a shard "
    "UNION equals the elementwise min of the shard signatures — both "
    "sides computed INDEPENDENTLY (union sig re-scans all shingles) and "
    "compared per hash slot.  This is the algebra that lets a 100 TB "
    "corpus keep per-shard sketches and answer cross-shard Jaccard / "
    "novelty questions by merging 16 hex strings instead of re-scanning "
    "— the same monoid discipline as the KMV/HLL family, over the "
    "sha256 hash family the LSH tier already uses",
)
def q_minhash_union_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import shingles_df

    d = table(spark, sf_dir, "documents")
    shl = shingles_df(d).select(
        (F.col("doc_id") % 2).alias("shard"), "shingle"
    )
    ex = shl.select(
        "shard", "shingle", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("h_idx")
    )
    h = F.substring(
        F.sha2(F.concat_ws("|", F.col("shingle"), F.col("h_idx").cast("string")), 256),
        1,
        16,
    )
    hashed = ex.select("shard", "h_idx", h.alias("__h"))
    agg = hashed.groupBy("shard", "h_idx").agg(F.min("__h").alias("h"))
    uni = hashed.groupBy("h_idx").agg(F.min("__h").alias("h_union"))
    a = agg.filter(F.col("shard") == 0).select("h_idx", F.col("h").alias("h_a"))
    b = agg.filter(F.col("shard") == 1).select("h_idx", F.col("h").alias("h_b"))
    return (
        a.join(b, "h_idx")
        .join(uni, "h_idx")
        .select(
            F.col("h_idx").cast("int").alias("h_idx"),
            "h_a",
            "h_b",
            "h_union",
            F.when(F.least("h_a", "h_b") == F.col("h_union"), 1)
            .otherwise(0)
            .cast("int")
            .alias("merged_matches"),
        )
    )


@_q(
    "min_k_prob_score",
    f"""
    WITH {_LM_AGG_SQL},
    rk AS (
      SELECT doc_id, lp,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY lp ASC, pos ASC) AS rn,
             CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
      FROM lp
    ),
    sel AS (
      SELECT doc_id, n, greatest(1, n * 20 // 100) AS n_keep, lp, rn FROM rk
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_tokens,
           CAST(max(n_keep) AS BIGINT) AS n_keep,
           CAST((-sum(CASE WHEN rn <= n_keep THEN lp ELSE 0 END))
                // max(n_keep) AS BIGINT) AS min_k_nll_micro
    FROM sel GROUP BY doc_id
    """,
    "Min-K% Prob membership/contamination score (Shi et al.): mean NLL "
    "of each doc's 20% lowest-probability tokens under the reference "
    "bigram LM — memorized/benchmark text lacks low-probability outlier "
    "tokens, the signal whole-doc perplexity averages away.  Selection "
    "and mean are exact-integer (snapped log-prob rank, positive int "
    "division); shares the token-logprob frame with ngram_lm_perplexity "
    "so both reads price one LM pass",
)
def q_min_k_prob_score(
    spark: SparkSession, sf_dir: str, shared_tokens: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import min_k_prob_score

    d = table(spark, sf_dir, "documents")
    lm = d.filter((F.col("doc_id") % 5) == 0)
    return min_k_prob_score(
        d,
        lm,
        k_pct=20,
        alpha=0.1,
        docs_tokens=shared_tokens,
        lm_tokens=None
        if shared_tokens is None
        else shared_tokens.filter((F.col("doc_id") % 5) == 0),
    )


@_q(
    "self_bleu_pairs",
    f"""
    WITH {_minhash_sha_ctes()},
    uni AS (
      SELECT doc_id, unnest(words) AS term FROM norm
    ),
    utf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
      FROM uni WHERE term <> '' GROUP BY doc_id, term
    ),
    ulen AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n1 FROM utf GROUP BY doc_id),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(words) - 1, 0) + 1),
                                   i -> array_to_string(words[i:i+1], ' '))) AS gram
      FROM norm
    ),
    btf AS (
      SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
      FROM big GROUP BY doc_id, gram
    ),
    c1 AS (
      SELECT p.id_a, p.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m1
      FROM pairs p
      JOIN utf a ON a.doc_id = p.id_a
      JOIN utf b ON b.doc_id = p.id_b AND b.term = a.term
      GROUP BY 1, 2
    ),
    c2 AS (
      SELECT p.id_a, p.id_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m2
      FROM pairs p
      JOIN btf a ON a.doc_id = p.id_a
      JOIN btf b ON b.doc_id = p.id_b AND b.gram = a.gram
      GROUP BY 1, 2
    ),
    base AS (
      SELECT p.id_a, p.id_b, la.n1 AS n1_a, lb.n1 AS n1_b,
             coalesce(c1.m1, 0) AS m1, coalesce(c2.m2, 0) AS m2
      FROM pairs p
      JOIN ulen la ON la.doc_id = p.id_a
      JOIN ulen lb ON lb.doc_id = p.id_b
      LEFT JOIN c1 ON c1.id_a = p.id_a AND c1.id_b = p.id_b
      LEFT JOIN c2 ON c2.id_a = p.id_a AND c2.id_b = p.id_b
      WHERE la.n1 >= 2 AND lb.n1 >= 2
    )
    SELECT id_a, id_b, n1_a, n1_b, m1, m2,
           CAST(CASE WHEN m1 = 0 OR m2 = 0 THEN -99000000
                ELSE -(((-CAST(floor(ln(CAST(m1 AS DOUBLE) / n1_a) * 1000000
                                + CAST(0.5 AS DOUBLE)) AS BIGINT))
                        + (-CAST(floor(ln(CAST(m2 AS DOUBLE) / (n1_a - 1)) * 1000000
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT))) // 2)
                     + least(CAST(0 AS BIGINT),
                             CAST(floor((CAST(1 AS DOUBLE)
                                         - CAST(n1_b AS DOUBLE) / n1_a) * 1000000
                                        + CAST(0.5 AS DOUBLE)) AS BIGINT))
                END AS BIGINT) AS bleu_ab_log_micro,
           CAST(CASE WHEN m1 = 0 OR m2 = 0 THEN -99000000
                ELSE -(((-CAST(floor(ln(CAST(m1 AS DOUBLE) / n1_b) * 1000000
                                + CAST(0.5 AS DOUBLE)) AS BIGINT))
                        + (-CAST(floor(ln(CAST(m2 AS DOUBLE) / (n1_b - 1)) * 1000000
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT))) // 2)
                     + least(CAST(0 AS BIGINT),
                             CAST(floor((CAST(1 AS DOUBLE)
                                         - CAST(n1_a AS DOUBLE) / n1_b) * 1000000
                                        + CAST(0.5 AS DOUBLE)) AS BIGINT))
                END AS BIGINT) AS bleu_ba_log_micro
    FROM base
    """,
    "self-BLEU-2 over the MinHash candidate pairs (the corpus-diversity "
    "read: high pairwise BLEU = template/boilerplate redundancy near-dup "
    "Jaccard underweights because BLEU clips by reference counts): "
    "clipped unigram+bigram precision and brevity penalty, entirely in "
    "LOG space on the micro grid — geometric means and exp() never "
    "materialize, so the score is exact-integer end to end; sentinel "
    "-99 for zero-overlap false-positive candidates.  Negative-int "
    "averaging is done on negated positives (DuckDB // floors, Spark "
    "div truncates — they agree only on nonnegatives)",
)
def q_self_bleu_pairs(
    spark: SparkSession,
    sf_dir: str,
    shared_tokens: DataFrame | None = None,
    shared_lsh_edges: DataFrame | None = None,
) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import normalized_text
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates_sha,
        shingles_df,
    )

    d = table(spark, sf_dir, "documents")
    pairs = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d).localCheckpoint(eager=False)
    )
    words = F.split(normalized_text(F.col("text")), " ")
    utf = (
        (
            shared_tokens.select("doc_id", "term")
            if shared_tokens is not None
            else d.select("doc_id", F.explode(words).alias("term")).filter(
                F.col("term") != ""
            )
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)  # both join sides below
    )
    ulen = utf.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n1"))
    btf = (
        shingles_df(d, n=2)
        .groupBy("doc_id", F.col("shingle").alias("gram"))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    c1 = (
        pairs.join(utf.select(F.col("doc_id").alias("id_a"), "term", F.col("c").alias("__ca")), "id_a")
        .join(
            utf.select(F.col("doc_id").alias("id_b"), "term", F.col("c").alias("__cb")),
            ["id_b", "term"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("__ca", "__cb")).cast("long").alias("m1"))
    )
    c2 = (
        pairs.join(btf.select(F.col("doc_id").alias("id_a"), "gram", F.col("c").alias("__ca")), "id_a")
        .join(
            btf.select(F.col("doc_id").alias("id_b"), "gram", F.col("c").alias("__cb")),
            ["id_b", "gram"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("__ca", "__cb")).cast("long").alias("m2"))
    )
    base = (
        pairs.join(ulen.select(F.col("doc_id").alias("id_a"), F.col("n1").alias("n1_a")), "id_a")
        .join(ulen.select(F.col("doc_id").alias("id_b"), F.col("n1").alias("n1_b")), "id_b")
        .join(c1, ["id_a", "id_b"], "left")
        .join(c2, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            "n1_a",
            "n1_b",
            F.coalesce("m1", F.lit(0)).cast("long").alias("m1"),
            F.coalesce("m2", F.lit(0)).cast("long").alias("m2"),
        )
        .filter((F.col("n1_a") >= 2) & (F.col("n1_b") >= 2))
    )

    def _snap_ln(num, den):
        return F.floor(
            F.log(num.cast("double") / den.cast("double")) * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long")

    def _bleu(cand_len, ref_len):
        lp1 = _snap_ln(F.col("m1"), cand_len)
        lp2 = _snap_ln(F.col("m2"), cand_len - 1)
        bp = F.least(
            F.lit(0).cast("long"),
            F.floor(
                (F.lit(1.0) - ref_len.cast("double") / cand_len.cast("double"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("long"),
        )
        avg = -(F.floor(((-lp1) + (-lp2)) / F.lit(2)).cast("long"))
        return F.when(
            (F.col("m1") == 0) | (F.col("m2") == 0), F.lit(-99000000).cast("long")
        ).otherwise((avg + bp).cast("long"))

    return base.select(
        "id_a",
        "id_b",
        "n1_a",
        "n1_b",
        "m1",
        "m2",
        _bleu(F.col("n1_a"), F.col("n1_b")).alias("bleu_ab_log_micro"),
        _bleu(F.col("n1_b"), F.col("n1_a")).alias("bleu_ba_log_micro"),
    )


# ---------------------------------------------------------------------------
# Statistical monitoring family (operators/stats.py): two-sample tests,
# conformal calibration, per-group OLS, changepoint — the reads a corpus
# pipeline's monitoring layer runs next to quality scoring.
# ---------------------------------------------------------------------------

_EVENT_CENTS_SQL = "CAST(round(value * 100) AS BIGINT)"


@_q(
    "source_drift_ks",
    f"""
    WITH hist AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL
      GROUP BY 1, 2
    ),
    vh AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt_all FROM hist GROUP BY v),
    vc AS (
      SELECT v, CAST(sum(cnt_all) OVER (ORDER BY v) AS BIGINT) AS cum_all FROM vh
    ),
    g AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_g FROM hist GROUP BY source),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM hist),
    frame AS (
      SELECT g.source, vc.v, vc.cum_all, g.n_g, coalesce(h.cnt, 0) AS cnt
      FROM vc CROSS JOIN g
      LEFT JOIN hist h ON h.source = g.source AND h.v = vc.v
    ),
    cg AS (
      SELECT source, v, n_g, cum_all,
             CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum_g
      FROM frame
    ),
    dev AS (
      SELECT cg.source, cg.v, cg.n_g, t.n_all - cg.n_g AS n_r,
             abs(cg.cum_g * (t.n_all - cg.n_g)
                 - (cg.cum_all - cg.cum_g) * cg.n_g) AS dev
      FROM cg CROSS JOIN tot t
    ),
    pk AS (
      SELECT source, max(dev) AS dev_max,
             max(n_g) AS n_group, max(n_r) AS n_rest
      FROM dev GROUP BY source
    )
    SELECT p.source, p.n_group, p.n_rest,
           CAST(floor(CAST(p.dev_max AS DOUBLE)
                      / nullif(CAST(p.n_group AS DOUBLE)
                               * CAST(p.n_rest AS DOUBLE), 0)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS ks_micro,
           (SELECT min(d.v) FROM dev d
            WHERE d.source = p.source AND d.dev = p.dev_max) AS ks_at_value
    FROM pk p
    """,
    "two-sample Kolmogorov-Smirnov drift of each source's doc-length "
    "distribution vs the pooled rest — the monitoring read behind 'which "
    "source moved'.  The ECDF sup runs on cross-multiplied BIGINTs over "
    "the pooled value grid (histogram grain, global cumsum through the "
    "range-partitioned two-pass prefix sum), so the max and its argmin "
    "grid value are exact; one final double division, micro-snapped",
)
def q_source_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import ks_drift_by_group

    d = table(spark, sf_dir, "documents")
    return ks_drift_by_group(d, "source", "n_chars")


@_q(
    "source_mann_whitney",
    """
    WITH hist AS (
      SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL
      GROUP BY 1, 2
    ),
    vh AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt_all FROM hist GROUP BY v),
    vc AS (
      SELECT v, cnt_all,
             CAST(2 * (sum(cnt_all) OVER (ORDER BY v) - cnt_all)
                  + cnt_all + 1 AS BIGINT) AS rank2
      FROM vh
    ),
    ties AS (
      SELECT CAST(sum(cnt_all * cnt_all * cnt_all - cnt_all) AS BIGINT) AS tie_sum,
             CAST(sum(cnt_all) AS BIGINT) AS n_all
      FROM vh
    ),
    pg AS (
      SELECT h.source, CAST(sum(h.cnt) AS BIGINT) AS n_group,
             CAST(sum(h.cnt * vc.rank2) AS BIGINT) AS r2
      FROM hist h JOIN vc ON vc.v = h.v GROUP BY 1
    )
    SELECT source, n_group,
           CAST(r2 - n_group * (n_group + 1) AS BIGINT) AS u2,
           CAST(floor(
             CAST((r2 - n_group * (n_group + 1)) - n_group * (n_all - n_group)
                  AS DOUBLE)
             / (CAST(2 AS DOUBLE) * sqrt(
                 CAST(n_group AS DOUBLE) * CAST(n_all - n_group AS DOUBLE)
                 / CAST(12 AS DOUBLE)
                 * ((CAST(n_all AS DOUBLE) + CAST(1 AS DOUBLE))
                    - CAST(tie_sum AS DOUBLE)
                      / (CAST(n_all AS DOUBLE) * (CAST(n_all AS DOUBLE)
                                                  - CAST(1 AS DOUBLE))))))
             * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS z_micro
    FROM pg CROSS JOIN ties
    """,
    "Mann-Whitney rank-sum U of each source's doc lengths vs the pooled "
    "rest, from ONE shared global average-ranking (doubled ranks stay "
    "integer under ties; u2 = 2*U is exact BIGINT); the tie-corrected "
    "normal z is the only double, computed from exact integer moments "
    "and micro-snapped — the nonparametric sibling of source_drift_ks",
)
def q_source_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import mann_whitney_by_group

    d = table(spark, sf_dir, "documents")
    return mann_whitney_by_group(d, "source", "n_chars")


@_q(
    "event_welch_ttest",
    f"""
    WITH m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_EVENT_CENTS_SQL}) AS BIGINT) AS s1,
             CAST(sum({_EVENT_CENTS_SQL} * {_EVENT_CENTS_SQL}) AS BIGINT) AS s2
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT a.event_type AS group_a, b.event_type AS group_b,
             a.n AS na, a.s1 AS s1a, a.s2 AS s2a,
             b.n AS nb, b.s1 AS s1b, b.s2 AS s2b
      FROM m a JOIN m b ON a.event_type < b.event_type
    ),
    v AS (
      SELECT *,
             (CAST(na AS DOUBLE) * CAST(s2a AS DOUBLE)
              - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
             / nullif(CAST(na AS DOUBLE)
                      * (CAST(na AS DOUBLE) - CAST(1 AS DOUBLE)), 0) AS va,
             (CAST(nb AS DOUBLE) * CAST(s2b AS DOUBLE)
              - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
             / nullif(CAST(nb AS DOUBLE)
                      * (CAST(nb AS DOUBLE) - CAST(1 AS DOUBLE)), 0) AS vb,
             CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE)
             - CAST(s1b AS DOUBLE) / CAST(nb AS DOUBLE) AS md
      FROM p
    ),
    s AS (
      SELECT *, va / CAST(na AS DOUBLE) AS sa, vb / CAST(nb AS DOUBLE) AS sb
      FROM v
    )
    SELECT group_a, group_b, na AS n_a, nb AS n_b,
           CAST(floor(md * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS mean_diff_micro,
           CAST(floor(md / nullif(sqrt(sa + sb), 0)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS t_micro,
           CAST(floor((sa + sb) * (sa + sb)
                      / nullif(sa * sa / (CAST(na AS DOUBLE) - CAST(1 AS DOUBLE))
                               + sb * sb / (CAST(nb AS DOUBLE) - CAST(1 AS DOUBLE)),
                               0)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS df_micro
    FROM s
    """,
    "Welch's unequal-variance t-test between every pair of event types "
    "on the cents-exact value (the A/B read): per-group (n, sum, sumsq) "
    "BIGINT moments collapse map-side, the pair frame is |types|^2 "
    "broadcast rows, and t / Welch-Satterthwaite df are doubles computed "
    "from the exact integers only at the final projection, micro-snapped",
)
def q_event_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import welch_t_pairs

    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return welch_t_pairs(e, "event_type", cents)


@_q(
    "event_conformal_coverage",
    f"""
    WITH b AS (
      SELECT event_type, event_id AS id, {_EVENT_CENTS_SQL} AS v FROM events
    ),
    cal AS (SELECT * FROM b WHERE ((id % 2) + 2) % 2 = 0),
    tst AS (SELECT * FROM b WHERE ((id % 2) + 2) % 2 = 1),
    pred AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
             CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS pred
      FROM cal GROUP BY 1
    ),
    pk AS (
      SELECT *, least((90 * (n_cal + 1) + 99) // 100, n_cal) AS k FROM pred
    ),
    sc AS (
      SELECT c.event_type, abs(c.v - p.pred) AS nc, c.id, p.k
      FROM cal c JOIN pk p USING (event_type)
    ),
    q AS (
      SELECT event_type, nc AS q_cents FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY nc, id) AS rn
        FROM sc) WHERE rn = k
    ),
    cov AS (
      SELECT t.event_type, CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN abs(t.v - p.pred) <= q.q_cents
                           THEN 1 ELSE 0 END) AS BIGINT) AS ncov
      FROM tst t JOIN pk p USING (event_type) JOIN q USING (event_type)
      GROUP BY 1
    )
    SELECT p.event_type, p.n_cal, c.n_test, p.pred AS pred_cents, q.q_cents,
           CAST((1000000 * c.ncov) // c.n_test AS BIGINT) AS cov_micro
    FROM pk p JOIN q USING (event_type) JOIN cov c USING (event_type)
    """,
    "split-conformal calibration per event type: even event_ids "
    "calibrate (integer-mean point prediction, exact k-th-smallest "
    "nonconformity at the finite-sample 90% index), odd ids test; "
    "coverage is exact-integer 1e6*covered//n_test.  The uncertainty "
    "read a serving pipeline runs to check its intervals actually cover",
)
def q_event_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import conformal_coverage

    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return conformal_coverage(e, "event_type", cents, "event_id", q_pct=90)


@_q(
    "brand_price_regression",
    """
    WITH j AS (
      SELECT p_brand,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    m AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM j GROUP BY 1
    )
    SELECT p_brand, n,
           CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS slope_micro,
           CAST(floor((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS intercept_micro,
           CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS r2_micro
    FROM m
    """,
    "per-brand OLS of line price on quantity from exact BIGINT moment "
    "sums (regr_slope/regr_r2 builtins accumulate doubles in partition "
    "order — not oracle-stable); slope/intercept/R^2 close in doubles "
    "from the integers at the final projection, micro-snapped.  Part "
    "dimension broadcasts; y sits on the dollar grid so the syy sum "
    "stays under 2^63 far past the benchmark scales",
)
def q_brand_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import grouped_regression

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("__x"),
        F.floor(F.col("l_extendedprice") + F.lit(0.5)).cast("long").alias("__y"),
    )
    return grouped_regression(j, "p_brand", F.col("__x"), F.col("__y"))


@_q(
    "event_cusum_changepoint",
    f"""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(sum({_EVENT_CENTS_SQL}) AS BIGINT) AS x
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, day,
             CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS s,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS k
      FROM d
    ),
    t AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_periods,
             CAST(sum(x) AS BIGINT) AS total
      FROM d GROUP BY 1
    ),
    dv AS (
      SELECT c.event_type, c.day, t.n_periods, t.total,
             abs(t.n_periods * c.s - c.k * t.total) AS dev
      FROM c JOIN t USING (event_type)
    ),
    pk AS (SELECT event_type, max(dev) AS dev_max FROM dv GROUP BY 1)
    SELECT dv.event_type, min(dv.day) AS cp_period,
           max(dv.n_periods) AS n_periods, max(dv.total) AS total,
           CAST(max(dv.dev) AS BIGINT) AS dev_max
    FROM dv JOIN pk ON dv.event_type = pk.event_type AND dv.dev = pk.dev_max
    GROUP BY dv.event_type
    """,
    "CUSUM changepoint of each event type's daily cents total: argmax_k "
    "|n*S_k - k*T| over the day-ordered series (the scaled form keeps "
    "the whole statistic BIGINT-exact — no mean division, no snapping); "
    "ties resolve to the earliest day.  Collapses to (type, day) grain "
    "before any window, so the running sum is calendar-bounded",
)
def q_event_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import cusum_changepoint

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("__cents"),
    )
    return cusum_changepoint(e, "event_type", "day", F.col("__cents"))


@_q(
    "classifier_avg_precision",
    f"""
    WITH {_CLS_CTES},
    sc AS (
      SELECT doc_id,
             CAST(floor(CAST(s AS DOUBLE) / (CAST(32768 AS DOUBLE) * n_tokens)
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS si
      FROM cls_agg
    ),
    lab AS (
      SELECT sc.doc_id, sc.si, CAST(d.lang = 'en' AS BIGINT) AS y
      FROM sc JOIN documents d USING (doc_id)
    ),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY si DESC, doc_id ASC) AS rnk,
             sum(y) OVER (ORDER BY si DESC, doc_id ASC) AS cp
      FROM lab
    ),
    t AS (
      SELECT CAST(sum(CASE WHEN y = 1 THEN
               CAST(floor(CAST(cp AS DOUBLE) / CAST(rnk AS DOUBLE)
                          * CAST(1000000000 AS DOUBLE)
                          + CAST(0.5 AS DOUBLE)) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS s_nano,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM r
    )
    SELECT CASE WHEN n_pos > 0
                THEN CAST(s_nano // (1000 * n_pos) AS BIGINT) END AS ap_micro,
           n_pos, n_docs
    FROM t
    """,
    "exact average precision (step-definition PR-curve area) of the "
    "hashed-linear quality classifier against the lang='en' label — the "
    "imbalance-robust companion of classifier_auc (same score frame, "
    "one LM pass prices both).  Ranks pin to (score DESC, doc_id ASC) "
    "so tie conventions can't diverge; each positive's precision term "
    "snaps to the nano grid before the integer sum; the global ranking "
    "runs through the range-partitioned two-pass prefix sum",
)
def q_classifier_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import (
        average_precision,
        hashed_linear_score,
        model_weights_table,
    )

    d = table(spark, sf_dir, "documents")
    scored = hashed_linear_score(d, model_weights_table(spark)).select(
        "doc_id", F.round(F.col("logit") * F.lit(1e6)).cast("long").alias("si")
    )
    labeled = scored.join(
        d.select("doc_id", (F.col("lang") == "en").cast("long").alias("y")), "doc_id"
    )
    return average_precision(labeled, "si", "y", "doc_id")


@_q(
    "embedding_binary_quant_recall",
    """
    WITH v AS (
      SELECT vec_id, embedding AS f,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    n AS (
      SELECT vec_id, f, e,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
    ),
    q AS (SELECT * FROM n WHERE vec_id % 50 = 0),
    ex AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY round(list_sum(list_transform(range(1, len(a.e) + 1),
                                i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) DESC,
                          b.vec_id ASC) AS rank
        FROM q a JOIN n b ON a.vec_id <> b.vec_id)
      WHERE rank <= 10
    ),
    bq AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_sum(list_transform(range(1, len(a.f) + 1),
                            i -> CASE WHEN (a.f[i] > 0) <> (b.f[i] > 0)
                                 THEN 1 ELSE 0 END)) ASC,
                          b.vec_id ASC) AS rank
        FROM q a JOIN n b ON a.vec_id <> b.vec_id)
      WHERE rank <= 10
    ),
    ne AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact FROM ex GROUP BY 1
    ),
    ov AS (
      SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_overlap
      FROM ex e JOIN bq b
        ON b.query_id = e.query_id AND b.neighbor_id = e.neighbor_id
      GROUP BY 1
    )
    SELECT ne.query_id, ne.n_exact,
           CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap
    FROM ne LEFT JOIN ov USING (query_id)
    """,
    "recall@10 of the sign-bit binary-quantization scan (64-dim float32 "
    "-> 64 bits, XOR+popcount distance, entirely JVM-side) against the "
    "exact cosine top-10 on the same query set — the quality gate before "
    "shipping the cheapest index tier.  Spark packs sign bits into "
    "32-bit halves (ANSI-safe MSB-first fold), broadcasts the packed "
    "queries over ONE candidate scan, and cuts top-k with a partial-"
    "then-global window pair; both sides pin the neighbor-id tie order "
    "so the compared sets are exact",
)
def q_embedding_binary_quant_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import binary_quant_recall

    e = table(spark, sf_dir, "embeddings")
    return binary_quant_recall(e, k=10, every=50, dim=64)


@_q(
    "stupid_backoff_nll",
    f"""
    WITH {_TOKPOS_SQL},
    lmtok AS (SELECT * FROM t2 WHERE doc_id % 5 = 0),
    c1 AS (SELECT term, CAST(count(*) AS BIGINT) AS c1 FROM lmtok GROUP BY term),
    lmctx AS (
      SELECT term,
             lag(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
             lag(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
      FROM lmtok
    ),
    c2 AS (
      SELECT p1, term, CAST(count(*) AS BIGINT) AS c2
      FROM lmctx WHERE p1 IS NOT NULL GROUP BY 1, 2
    ),
    c3 AS (
      SELECT p2, p1, term, CAST(count(*) AS BIGINT) AS c3
      FROM lmctx WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS lm_total,
             CAST(count(*) AS BIGINT) AS lm_vocab
      FROM c1
    ),
    dtok AS (
      SELECT doc_id, pos, term,
             lag(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
             lag(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
      FROM t2
    ),
    j AS (
      SELECT d.doc_id, d.term, d.p1, d.p2,
             c3.c3, cb.c2, cc.c2 AS c2ctx, c1p.c1 AS c1ctx, c1s.c1 AS c1self,
             t.lm_total, t.lm_vocab
      FROM dtok d
      LEFT JOIN c3 ON c3.p2 = d.p2 AND c3.p1 = d.p1 AND c3.term = d.term
      LEFT JOIN c2 cb ON cb.p1 = d.p1 AND cb.term = d.term
      LEFT JOIN c2 cc ON cc.p1 = d.p2 AND cc.term = d.p1
      LEFT JOIN c1 c1p ON c1p.term = d.p1
      LEFT JOIN c1 c1s ON c1s.term = d.term
      CROSS JOIN tot t
    ),
    lps AS (
      SELECT doc_id,
             CAST(floor(ln(
               CASE
                 WHEN p2 IS NOT NULL AND c3 IS NOT NULL
                   THEN CAST(c3 AS DOUBLE) / CAST(c2ctx AS DOUBLE)
                 WHEN p1 IS NOT NULL AND c2 IS NOT NULL
                   THEN (CASE WHEN p2 IS NOT NULL THEN 0.4 ELSE 1.0 END)
                        * (CAST(c2 AS DOUBLE) / CAST(c1ctx AS DOUBLE))
                 ELSE (CASE WHEN p2 IS NOT NULL THEN 0.4 * 0.4
                            WHEN p1 IS NOT NULL THEN 0.4 ELSE 1.0 END)
                      * ((CAST(coalesce(c1self, 0) AS DOUBLE)
                          + CAST(1 AS DOUBLE))
                         / CAST(lm_total + lm_vocab AS DOUBLE))
               END) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS lp
      FROM j
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST((-sum(lp)) // count(*) AS BIGINT) AS sb_nll_micro
    FROM lps GROUP BY doc_id
    """,
    "per-doc NLL under a TRIGRAM stupid-backoff LM (Brants et al. 2007) "
    "counted on the doc_id %% 5 reference fifth: relative frequencies "
    "with a fixed 0.4 penalty per backoff level, add-one only at the "
    "unigram floor — the web-scale scoring rule that skips "
    "normalization.  Longer-context sibling of ngram_lm_perplexity; "
    "per-token ln(p) snaps to the micro grid from exact BIGINT counts, "
    "so doc scores are aggregation-order-independent",
)
def q_stupid_backoff_nll(
    spark: SparkSession, sf_dir: str, shared_tokens: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import stupid_backoff_nll

    d = table(spark, sf_dir, "documents")
    lm = d.filter((F.col("doc_id") % 5) == 0)
    return stupid_backoff_nll(
        d,
        lm,
        docs_tokens=shared_tokens,
        lm_tokens=None
        if shared_tokens is None
        else shared_tokens.filter((F.col("doc_id") % 5) == 0),
    )


@_q(
    "nation_revenue_gini",
    """
    WITH cr AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(coalesce(sum(round(o.o_totalprice * 100)), 0) AS BIGINT) AS x
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT cr.*, n.n_name,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY x, c_custkey) AS BIGINT) AS r
      FROM cr JOIN nation n ON cr.c_nationkey = n.n_nationkey
    ),
    m AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(x) AS BIGINT) AS total,
             CAST(sum(r * x) AS BIGINT) AS srx
      FROM r GROUP BY 1
    )
    SELECT n_name, n_members, total,
           CAST(floor(CAST(2 * srx - (n_members + 1) * total AS DOUBLE)
                      / CAST(n_members * total AS DOUBLE)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS gini_micro
    FROM m
    """,
    "Gini coefficient of customer lifetime revenue within each nation — "
    "the inequality read next to supplier_concentration_hhi's "
    "concentration.  Orders pre-aggregate to customer grain (cents-"
    "exact) before the broadcast nation join; ranks are a per-nation "
    "window on (revenue, custkey) — tie-stable because equal values "
    "permute freely in sum r*x; numerator and denominator stay BIGINT "
    "to the single snapped division.  Zero-order customers count at 0",
)
def q_nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import gini_by_group

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    rev = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0)).alias("__rx"))
    )
    base = (
        c.join(rev, c.c_custkey == rev.o_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            F.coalesce(F.col("__rx"), F.lit(0)).cast("long").alias("__x"),
        )
    )
    return gini_by_group(base, "n_name", "c_custkey", F.col("__x"))


@_q(
    "quality_length_spearman",
    f"""
    WITH {_CLS_CTES},
    sc AS (
      SELECT doc_id,
             CAST(floor(CAST(s AS DOUBLE) / (CAST(32768 AS DOUBLE) * n_tokens)
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS si
      FROM cls_agg
    ),
    pr AS (
      SELECT d.n_chars AS a, sc.si AS b
      FROM sc JOIN documents d USING (doc_id)
      WHERE d.n_chars IS NOT NULL
    ),
    ha AS (SELECT a, CAST(count(*) AS BIGINT) AS c FROM pr GROUP BY a),
    ra AS (
      SELECT a, CAST(2 * (sum(c) OVER (ORDER BY a) - c) + c + 1 AS BIGINT) AS ra
      FROM ha
    ),
    hb AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM pr GROUP BY b),
    rb AS (
      SELECT b, CAST(2 * (sum(c) OVER (ORDER BY b) - c) + c + 1 AS BIGINT) AS rb
      FROM hb
    ),
    j AS (SELECT ra.ra, rb.rb FROM pr JOIN ra USING (a) JOIN rb USING (b)),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ra) AS BIGINT) AS sa, CAST(sum(rb) AS BIGINT) AS sb,
             CAST(sum(ra * ra) AS BIGINT) AS saa,
             CAST(sum(rb * rb) AS BIGINT) AS sbb,
             CAST(sum(ra * rb) AS BIGINT) AS sab
      FROM j
    )
    SELECT n,
           CAST(floor((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                       - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                      / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS rho_micro
    FROM m
    """,
    "tie-aware Spearman rank correlation between doc length and the "
    "hashed-linear quality score (does the classifier just track "
    "length?) — Pearson on DOUBLED average ranks so every aggregate is "
    "exact BIGINT; the two rankings run on value histograms through the "
    "range-partitioned prefix sum; rho closes in one double expression, "
    "micro-snapped.  Monotone-association sibling of stats_correlation",
)
def q_quality_length_spearman(
    spark: SparkSession, sf_dir: str, shared_tokens: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import (
        hashed_linear_score,
        model_weights_table,
    )
    from wellmeet_data_pipeline_spark.operators.stats import spearman_rho

    d = table(spark, sf_dir, "documents")
    tc = (
        None
        if shared_tokens is None
        # same frame doc_term_counts builds: tokens are already non-empty
        else shared_tokens.groupBy("doc_id", "term").agg(
            F.count("*").alias("__tc")
        )
    )
    scored = hashed_linear_score(d, model_weights_table(spark), term_counts=tc).select(
        "doc_id", F.round(F.col("logit") * F.lit(1e6)).cast("long").alias("si")
    )
    pairs = scored.join(d.select("doc_id", "n_chars"), "doc_id").select(
        F.col("n_chars").alias("__a"), F.col("si").alias("__b")
    )
    return spearman_rho(pairs, "__a", "__b")


@_q(
    "user_event_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    np AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_items
      FROM c GROUP BY 1
    ),
    t AS (
      SELECT c.user_id, np.n_events, np.n_items,
             CAST(floor(-(CAST(c.c AS DOUBLE) / np.n_events)
                        * ln(CAST(c.c AS DOUBLE) / np.n_events)
                        * CAST(1000000000000 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS e
      FROM c JOIN np USING (user_id)
    )
    SELECT user_id, max(n_events) AS n_events, max(n_items) AS n_items,
           round(CAST(sum(e) AS DOUBLE) / CAST(1000000000000 AS DOUBLE), 6)
             AS entropy_nats
    FROM t GROUP BY user_id
    """,
    "Shannon entropy (nats) of each user's event-type mix — the "
    "behavioral-diversity read (H = 0 single-type, ln k uniform over "
    "k).  Each -(c/n)ln(c/n) term snaps to the 1e-12 grid and integer-"
    "sums per user (the bigram_cond_entropy discipline); collapses to "
    "(user, type) grain map-side before any join",
)
def q_user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import shannon_entropy_by_group

    e = table(spark, sf_dir, "events")
    return shannon_entropy_by_group(e, "user_id", "event_type")


@_q(
    "bloom_size_plan",
    """
    WITH n AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1
    ),
    m AS (
      SELECT event_type, n_keys,
             CAST(ceil(-CAST(n_keys AS DOUBLE) * (-4.605170185988091)
                       / (0.6931471805599453 * 0.6931471805599453)) AS BIGINT)
               AS m_bits
      FROM n
    ),
    k AS (
      SELECT *, greatest(CAST(1 AS BIGINT),
                         CAST(floor(CAST(m_bits AS DOUBLE)
                                    / CAST(n_keys AS DOUBLE)
                                    * 0.6931471805599453
                                    + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS k_hashes
      FROM m
    )
    SELECT event_type, n_keys, m_bits, k_hashes,
           CAST(floor(pow(CAST(1 AS DOUBLE)
                          - exp(-(CAST(k_hashes AS DOUBLE)
                                  * CAST(n_keys AS DOUBLE))
                                / CAST(m_bits AS DOUBLE)),
                          CAST(k_hashes AS DOUBLE))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS fpp_micro
    FROM k
    """,
    "Bloom-filter sizing per event type at 1%% target FPP from the "
    "EXACT distinct-user count — the planning read run before "
    "provisioning the streaming dedup filters (streaming/bloom.py); "
    "ln(2)/ln(0.01) are pinned numeric literals so both engines fold "
    "the identical double constants, and the realized (1-e^{-kn/m})^k "
    "micro-snaps.  Planning sibling of lsh_cost_estimate",
)
def q_bloom_size_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import bloom_parameter_plan

    e = table(spark, sf_dir, "events")
    return bloom_parameter_plan(e, "event_type", "user_id")


@_q(
    "weekday_seasonal_anomalies",
    f"""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(sum({_EVENT_CENTS_SQL}) AS BIGINT) AS x
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    dd AS (SELECT *, isodow(CAST(day AS DATE)) AS dow FROM d),
    b AS (
      SELECT event_type, dow, CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(x) AS BIGINT) AS sd
      FROM dd GROUP BY 1, 2
    ),
    r AS (
      SELECT dd.event_type, dd.day, dd.x AS day_cents,
             CAST(dd.dow AS BIGINT) AS dow,
             CAST(floor(CAST(b.sd AS DOUBLE) / CAST(b.nd AS DOUBLE)
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS baseline_micro,
             CAST(floor((CAST(dd.x AS DOUBLE)
                         - CAST(b.sd AS DOUBLE) / CAST(b.nd AS DOUBLE))
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS resid_micro
      FROM dd JOIN b USING (event_type, dow)
    )
    SELECT * FROM r
    ORDER BY abs(resid_micro) DESC, day, event_type
    LIMIT 20
    """,
    "top-20 seasonality-adjusted daily anomalies: each (type, day) cents "
    "total measured against its OWN weekday's baseline mean (Monday "
    "compares to Mondays), the adjustment daily_anomaly_mad's raw "
    "day-over-day read can't make.  Weekday bridges the engines as "
    "Spark weekday()+1 == DuckDB isodow (both ISO, Monday=1); residuals "
    "snap from exact integer sums; the cut is a deterministic "
    "TakeOrdered on (|resid|, day, type)",
)
def q_weekday_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0)).cast("long").alias("x"))
    dd = d.withColumn("dow", (F.weekday(F.to_date("day")) + 1).cast("long"))
    b = dd.groupBy("event_type", "dow").agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("x").cast("long").alias("sd"),
    )
    baseline = F.col("sd").cast("double") / F.col("nd").cast("double")
    r = dd.join(b, ["event_type", "dow"]).select(
        "event_type",
        "day",
        F.col("x").alias("day_cents"),
        "dow",
        F.floor(baseline * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("baseline_micro"),
        F.floor(
            (F.col("x").cast("double") - baseline) * F.lit(1000000.0) + F.lit(0.5)
        )
        .cast("long")
        .alias("resid_micro"),
    )
    return r.orderBy(
        F.abs(F.col("resid_micro")).desc(), F.col("day"), F.col("event_type")
    ).limit(20)


@_q(
    "length_quantile_normalize",
    """
    WITH base AS (
      SELECT doc_id, source, n_chars AS v
      FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL
    ),
    gh AS (
      SELECT source, v, CAST(count(*) AS BIGINT) AS cnt
      FROM base GROUP BY 1, 2
    ),
    gr AS (
      SELECT source, v,
             CAST(2 * (sum(cnt) OVER (PARTITION BY source ORDER BY v) - cnt)
                  + cnt + 1 AS BIGINT) AS rank2
      FROM gh
    ),
    gt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_g FROM base GROUP BY 1),
    vh AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt_all FROM base GROUP BY v),
    vc AS (
      SELECT v, cnt_all,
             CAST(sum(cnt_all) OVER (ORDER BY v) AS BIGINT) AS cum_all
      FROM vh
    ),
    pooled AS (
      SELECT v AS norm_v,
             unnest(range(cum_all - cnt_all + 1, cum_all + 1)) AS target
      FROM vc
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM base),
    tagged AS (
      SELECT b.doc_id, b.source, b.v,
             (gr.rank2 * t.n_all + 2 * gt.n_g - 1) // (2 * gt.n_g) AS target
      FROM base b
      JOIN gr ON gr.source = b.source AND gr.v = b.v
      JOIN gt ON gt.source = b.source
      CROSS JOIN tot t
    )
    SELECT tg.doc_id, tg.source, tg.v AS n_chars,
           CAST(p.norm_v AS BIGINT) AS norm_value
    FROM tagged tg JOIN pooled p ON p.target = tg.target
    """,
    "quantile normalization of doc length across sources (microarray-"
    "lineage batch-effect remover): each doc's length maps to the "
    "POOLED length at its within-source quantile position — exact-"
    "integer end to end (doubled average ranks, ceil via integer "
    "division, pooled rank->value map by exploding histogram cum "
    "ranges; no interpolation doubles).  Puts every source's marginal "
    "on one scale while preserving within-source order",
)
def q_length_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import (
        quantile_normalize_by_group,
    )

    d = table(spark, sf_dir, "documents")
    out = quantile_normalize_by_group(d, "source", "doc_id", "n_chars")
    return out.select(
        "doc_id", "source", "n_chars", F.col("norm_value").cast("long")
    )


@_q(
    "source_keyness_chi2",
    f"""
    WITH {_TOKPOS_SQL},
    st AS (
      SELECT t2.doc_id, t2.term, d.source
      FROM t2 JOIN documents d USING (doc_id)
      WHERE d.source IS NOT NULL
    ),
    gt AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS a
      FROM st GROUP BY 1, 2
    ),
    ng AS (SELECT source, CAST(sum(a) AS BIGINT) AS n_g FROM gt GROUP BY 1),
    tt AS (SELECT term, CAST(sum(a) AS BIGINT) AS t FROM gt GROUP BY 1),
    tot AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM gt),
    f AS (
      SELECT gt.source, gt.term, gt.a, ng.n_g, tt.t, tot.n
      FROM gt JOIN ng USING (source) JOIN tt USING (term) CROSS JOIN tot
      WHERE gt.a >= 5 AND gt.a * tot.n > tt.t * ng.n_g
        AND tt.t < tot.n AND ng.n_g < tot.n
    ),
    d2 AS (
      SELECT source, term, a,
             CAST(a AS DOUBLE) AS ad_,
             CAST(n_g - a AS DOUBLE) AS bd_,
             CAST(t - a AS DOUBLE) AS cd_,
             CAST(n - n_g - (t - a) AS DOUBLE) AS dd_,
             CAST(n AS DOUBLE) AS nd_
      FROM f
    ),
    sc AS (
      SELECT source, term, a AS term_count,
             CAST(floor(nd_ * (ad_ * dd_ - bd_ * cd_) * (ad_ * dd_ - bd_ * cd_)
                        / ((ad_ + bd_) * (cd_ + dd_) * (ad_ + cd_) * (bd_ + dd_))
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS chi2_micro
      FROM d2
    )
    SELECT source, term, term_count, chi2_micro, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY chi2_micro DESC, term ASC) AS rank
      FROM sc)
    WHERE rank <= 10
    """,
    "top-10 KEY terms per source by chi-square keyness against the rest "
    "of the corpus (corpus-linguistics keyword extraction): 2x2 "
    "contingency per (term, source), positive-association and min-count "
    "filters decided on exact-integer cross-multiplies, chi2 formed in "
    "doubles from the exact counts (the products overflow int64 at "
    "corpus scale), micro-snapped, deterministic (chi2, term) rank cut.  "
    "Evidence-mass-weighted complement of token_pmi_collocations' lift",
)
def q_source_keyness_chi2(
    spark: SparkSession, sf_dir: str, shared_tokens: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import keyness_chi2_top_terms

    d = table(spark, sf_dir, "documents")
    return keyness_chi2_top_terms(d, "source", k=10, min_count=5, tokens=shared_tokens)


from wellmeet_data_pipeline_spark.operators.stats import (  # noqa: E402
    TWO_Z_SUM_SQ as _TWO_Z_SUM_SQ,
)


@_q(
    "dsir_ess_by_source",
    f"""
    WITH {_DSIR_AGG_SQL},
    w AS (
      SELECT doc_id,
             CAST(floor(CAST(s AS DOUBLE) / n_features
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS wi
      FROM agg
    ),
    e AS (
      SELECT doc_id,
             least(CAST(floor(exp(CAST(wi AS DOUBLE) / CAST(1000000 AS DOUBLE))
                              * CAST(1000 AS DOUBLE)
                              + CAST(0.5 AS DOUBLE)) AS BIGINT),
                   CAST(20000 AS BIGINT)) AS w
      FROM w
    ),
    g AS (
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(e.w) AS BIGINT) AS sw,
             CAST(sum(e.w * e.w) AS BIGINT) AS sww
      FROM e JOIN documents d USING (doc_id)
      WHERE d.source IS NOT NULL
      GROUP BY 1
    )
    SELECT source, n_docs,
           CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                      / (CAST(n_docs AS DOUBLE) * CAST(sww AS DOUBLE))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS ess_micro
    FROM g
    """,
    "effective sample size (ESS/n) of the exp(DSIR) importance weights "
    "per source — the resampling health read: near 1 = flat weights, "
    "near 0 = a few docs dominate the resampled set.  Truncated "
    "importance sampling (ratio capped at 20) on the 1e-3 grid keeps "
    "both weight sums exact BIGINT; shares the DSIR CTE chain (and the "
    "Spark-side feature pass) with dsir_importance",
)
def q_dsir_ess_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import dsir_importance_weight
    from wellmeet_data_pipeline_spark.operators.stats import importance_ess_by_group

    d = table(spark, sf_dir, "documents")
    target = d.filter((F.col("doc_id") % 7) == 0)
    weighted = dsir_importance_weight(d, target, target_within_docs=True).join(
        d.select("doc_id", "source"), "doc_id"
    )
    return importance_ess_by_group(weighted, "source", "dsir_weight", cap=20.0)


@_q(
    "ab_sample_size_plan",
    f"""
    WITH m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_EVENT_CENTS_SQL}) AS BIGINT) AS s1,
             CAST(sum({_EVENT_CENTS_SQL} * {_EVENT_CENTS_SQL}) AS BIGINT) AS s2
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT a.event_type AS group_a, b.event_type AS group_b,
             a.n AS na, a.s1 AS s1a, a.s2 AS s2a,
             b.n AS nb, b.s1 AS s1b, b.s2 AS s2b
      FROM m a JOIN m b ON a.event_type < b.event_type
    ),
    v AS (
      SELECT *,
             (CAST(na AS DOUBLE) * CAST(s2a AS DOUBLE)
              - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
             / nullif(CAST(na AS DOUBLE)
                      * (CAST(na AS DOUBLE) - CAST(1 AS DOUBLE)), 0) AS va,
             (CAST(nb AS DOUBLE) * CAST(s2b AS DOUBLE)
              - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
             / nullif(CAST(nb AS DOUBLE)
                      * (CAST(nb AS DOUBLE) - CAST(1 AS DOUBLE)), 0) AS vb,
             CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE)
             - CAST(s1b AS DOUBLE) / CAST(nb AS DOUBLE) AS md
      FROM p
    )
    SELECT group_a, group_b, na AS n_a, nb AS n_b,
           CAST(floor(md * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS delta_micro,
           CASE WHEN md = 0 THEN NULL
                ELSE CAST(ceil({_TWO_Z_SUM_SQ!r} * ((va + vb) / CAST(2 AS DOUBLE))
                               / (md * md)) AS BIGINT) END AS n_required
    FROM v
    """,
    "per-arm sample size to confirm each observed pairwise mean "
    "difference at two-sided alpha=5%% with 80%% power — the experiment-"
    "planning read after an exploratory Welch pass; same exact BIGINT "
    "moments as event_welch_ttest, z constants folded in Python and "
    "injected as one pinned literal into both engines; zero observed "
    "delta emits NULL",
)
def q_ab_sample_size_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import ab_sample_size_plan

    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return ab_sample_size_plan(e, "event_type", cents)


@_q(
    "survival_km_conversion",
    """
    WITH b AS (
      SELECT user_id, event_type, ts FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    s AS (
      SELECT user_id, min(ts) AS s_ts FROM b
      WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
      SELECT b.user_id, min(b.ts) AS p_ts
      FROM b JOIN s USING (user_id)
      WHERE b.event_type = 'purchase' AND b.ts >= s.s_ts
      GROUP BY 1
    ),
    l AS (SELECT user_id, max(ts) AS l_ts FROM b GROUP BY 1),
    dur AS (
      SELECT s.user_id,
             CAST((epoch_us(coalesce(p.p_ts, l.l_ts)) - epoch_us(s.s_ts))
                  // 3600000000 AS BIGINT) AS t,
             CAST(p.p_ts IS NOT NULL AS BIGINT) AS obs
      FROM s LEFT JOIN p USING (user_id) JOIN l USING (user_id)
    ),
    hist AS (
      SELECT t, CAST(sum(obs) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS tot
      FROM dur GROUP BY t
    ),
    na AS (SELECT CAST(sum(tot) AS BIGINT) AS n_all FROM hist),
    c AS (
      SELECT t, d, tot, CAST(sum(tot) OVER (ORDER BY t) AS BIGINT) AS cumt
      FROM hist
    ),
    ar AS (
      SELECT t, d,
             CAST((SELECT n_all FROM na) - (cumt - tot) AS BIGINT) AS n_risk
      FROM c WHERE d > 0
    ),
    ev AS (
      SELECT t, d, n_risk,
             CASE WHEN d = n_risk THEN NULL
                  ELSE CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
                                     / CAST(n_risk AS DOUBLE))
                                  * CAST(1000000 AS DOUBLE)
                                  + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS li
      FROM ar
    ),
    sv AS (SELECT *, CAST(sum(li) OVER (ORDER BY t) AS BIGINT) AS cum_l FROM ev)
    SELECT t, n_risk, d AS d_events,
           CASE WHEN d = n_risk THEN NULL ELSE cum_l END AS surv_log_micro,
           CASE WHEN d = n_risk THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(exp(CAST(cum_l AS DOUBLE)
                                    / CAST(1000000 AS DOUBLE))
                                * CAST(1000000 AS DOUBLE)
                                + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS surv_micro
    FROM sv
    """,
    "Kaplan-Meier survival curve of signup-to-purchase conversion on the "
    "hour grid: per user, first signup -> first subsequent purchase, "
    "right-censored at the user's last observed event (dropping "
    "non-converters would bias toward fast converters).  The product-"
    "limit estimator runs in log space on the micro grid from exact "
    "(n_risk, d) BIGINTs; the risk-set countdown and the log-survival "
    "cumsum both go through the range-partitioned two-pass prefix sum; "
    "a dying risk set pins S = 0 exactly instead of ln(0)",
)
def q_survival_km_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import kaplan_meier

    b = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts")
    )
    s = (
        b.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        b.join(s, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("s_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    last = b.groupBy("user_id").agg(F.max("ts").alias("l_ts"))
    dur = (
        s.join(p, "user_id", "left")
        .join(last, "user_id")
        .select(
            F.expr(
                "(unix_micros(coalesce(p_ts, l_ts)) - unix_micros(s_ts))"
                " div 3600000000"
            )
            .cast("long")
            .alias("__t"),
            F.col("p_ts").isNotNull().cast("long").alias("__obs"),
        )
    )
    return kaplan_meier(dur, "__t", "__obs").withColumnRenamed("t", "t")


@_q(
    "dup_graph_clustering",
    f"""
    WITH {_minhash_sha_ctes()},
    e AS (SELECT DISTINCT id_a, id_b FROM pairs),
    tri AS (
      SELECT e1.id_a AS a, e1.id_b AS m, e2.id_b AS c
      FROM e e1
      JOIN e e2 ON e1.id_b = e2.id_a
      JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ),
    tn AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT m FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT id_a AS node FROM e UNION ALL SELECT id_b FROM e
      ) GROUP BY node
    ),
    per AS (
      SELECT deg.node, deg.degree, COALESCE(tn.n_triangles, 0) AS tr
      FROM deg LEFT JOIN tn USING (node)
    ),
    ag AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(degree) AS BIGINT) AS deg2,
             CAST(sum(tr) AS BIGINT) AS tri3,
             CAST(sum(degree * (degree - 1)) AS BIGINT) AS w2
      FROM per
    )
    SELECT n_nodes,
           CAST(deg2 // 2 AS BIGINT) AS n_edges,
           CAST(tri3 // 3 AS BIGINT) AS n_triangles,
           CAST(w2 // 2 AS BIGINT) AS n_wedges,
           CASE WHEN w2 = 0 THEN NULL
                ELSE CAST(floor(CAST(2 * tri3 AS DOUBLE) / CAST(w2 AS DOUBLE)
                                * CAST(1000000 AS DOUBLE)
                                + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS gcc_micro
    FROM ag
    """,
    "global clustering coefficient of the MinHash-LSH candidate graph "
    "(3*triangles / wedges): one scalar separating clique-like template "
    "spam (gcc -> 1) from hub-like band pollution (gcc -> 0) — the "
    "rollup of dup_triangle_count's per-node read, from the same "
    "triangle/degree frame (per-node sums give exactly 3T and 2W); all "
    "exact BIGINT to the single snapped division",
)
def q_dup_graph_clustering(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates_sha,
        triangle_counts,
    )

    d = table(spark, sf_dir, "documents")
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d)
    )
    per = triangle_counts(edges)
    ag = per.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("degree").cast("long").alias("__deg2"),
        F.sum("n_triangles").cast("long").alias("__tri3"),
        F.sum(F.col("degree") * (F.col("degree") - 1)).cast("long").alias("__w2"),
    )
    return ag.select(
        "n_nodes",
        F.expr("__deg2 div 2").cast("long").alias("n_edges"),
        F.expr("__tri3 div 3").cast("long").alias("n_triangles"),
        F.expr("__w2 div 2").cast("long").alias("n_wedges"),
        F.floor(
            F.try_divide(
                (2 * F.col("__tri3")).cast("double"), F.col("__w2").cast("double")
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("gcc_micro"),
    )


@_q(
    "embedding_int8_recall",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    n AS (
      SELECT vec_id, e,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
    ),
    q AS (SELECT * FROM n WHERE vec_id % 50 = 0),
    ex AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY round(list_sum(list_transform(range(1, len(a.e) + 1),
                                i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 4) DESC,
                          b.vec_id ASC) AS rank
        FROM q a JOIN n b ON a.vec_id <> b.vec_id)
      WHERE rank <= 10
    ),
    st AS (
      SELECT i, min(e[i]) AS vmin, max(e[i]) AS vmax
      FROM v, range(1, 65) t(i) GROUP BY i
    ),
    sl AS (
      SELECT list(vmin ORDER BY i) AS vmins, list(vmax ORDER BY i) AS vmaxs
      FROM st
    ),
    q8 AS (
      SELECT vec_id,
             list_transform(range(1, 65), i ->
               CASE WHEN vmaxs[i] - vmins[i] = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor((e[i] - vmins[i]) / (vmaxs[i] - vmins[i])
                                    * CAST(255 AS DOUBLE)
                                    + CAST(0.5 AS DOUBLE)) AS BIGINT) END) AS c
      FROM v CROSS JOIN sl
    ),
    qq AS (SELECT * FROM q8 WHERE vec_id % 50 = 0),
    bq AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_sum(list_transform(range(1, 65),
                            i -> a.c[i] * b.c[i])) DESC,
                          b.vec_id ASC) AS rank
        FROM qq a JOIN q8 b ON a.vec_id <> b.vec_id)
      WHERE rank <= 10
    ),
    ne AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact FROM ex GROUP BY 1
    ),
    ov AS (
      SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_overlap
      FROM ex e JOIN bq b
        ON b.query_id = e.query_id AND b.neighbor_id = e.neighbor_id
      GROUP BY 1
    )
    SELECT ne.query_id, ne.n_exact,
           CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap
    FROM ne LEFT JOIN ov USING (query_id)
    """,
    "recall@10 of the int8 scalar-quantized dot-product scan against "
    "exact cosine top-10 — the 4x-compression middle rung of the "
    "quantization ladder (binary 32x, matryoshka truncation), scored by "
    "BIGINT-exact integer dot products over 0..255 codes (no snapping "
    "anywhere on the quantized side).  Queries quantize with the "
    "candidate-set quantizer (the serving contract); same per-dim "
    "(min, max) bounds embedding_int8_stats audits",
)
def q_embedding_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.similarity import int8_quant_recall

    e = table(spark, sf_dir, "embeddings")
    return int8_quant_recall(e, k=10, every=50)


@_q(
    "daily_revenue_acf",
    f"""
    WITH d AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
             CAST(sum({_EVENT_CENTS_SQL}) AS BIGINT) AS x
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    lags AS (SELECT unnest([1, 2, 3, 7]) AS lag),
    p AS (
      SELECT a.event_type, l.lag, a.x AS xa, b.x AS xb
      FROM d a
      CROSS JOIN lags l
      JOIN d b ON b.event_type = a.event_type AND b.di = a.di + l.lag
    ),
    m AS (
      SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb,
             CAST(sum(xa * xa) AS BIGINT) AS saa,
             CAST(sum(xb * xb) AS BIGINT) AS sbb,
             CAST(sum(xa * xb) AS BIGINT) AS sab
      FROM p GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
           CAST(floor((CAST(n_pairs AS DOUBLE) * CAST(sab AS DOUBLE)
                       - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                      / sqrt((CAST(n_pairs AS DOUBLE) * CAST(saa AS DOUBLE)
                              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                             * (CAST(n_pairs AS DOUBLE) * CAST(sbb AS DOUBLE)
                                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS acf_micro
    FROM m
    """,
    "autocorrelation of each event type's daily cents total at lags "
    "1/2/3/7 (the is-there-weekly-structure read behind forecast "
    "residual checks): lagged pairs by exact epoch-day join, Pearson "
    "from exact BIGINT cents moments, the correlation closed in doubles "
    "at the final projection and micro-snapped.  Calendar-bounded "
    "frames throughout (day grain x 4 lags)",
)
def q_daily_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.groupBy(
        "event_type", F.unix_date(F.to_date("ts")).cast("long").alias("di")
    ).agg(F.sum(F.round(F.col("value") * 100, 0)).cast("long").alias("x"))
    lags = spark.createDataFrame([(1,), (2,), (3,), (7,)], "lag int")
    a = d.select("event_type", "di", F.col("x").alias("xa")).crossJoin(
        F.broadcast(lags)
    )
    b = d.select(
        F.col("event_type").alias("__et"),
        F.col("di").alias("__dib"),
        F.col("x").alias("xb"),
    )
    p = a.join(
        b,
        (F.col("__et") == F.col("event_type"))
        & (F.col("__dib") == F.col("di") + F.col("lag")),
    )
    m = p.groupBy("event_type", "lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("xa").cast("long").alias("__sa"),
        F.sum("xb").cast("long").alias("__sb"),
        F.sum(F.col("xa") * F.col("xa")).cast("long").alias("__saa"),
        F.sum(F.col("xb") * F.col("xb")).cast("long").alias("__sbb"),
        F.sum(F.col("xa") * F.col("xb")).cast("long").alias("__sab"),
    )
    n = F.col("n_pairs").cast("double")
    sa, sb = F.col("__sa").cast("double"), F.col("__sb").cast("double")
    saa, sbb, sab = (
        F.col("__saa").cast("double"),
        F.col("__sbb").cast("double"),
        F.col("__sab").cast("double"),
    )
    return m.select(
        "event_type",
        F.col("lag").cast("long"),
        "n_pairs",
        F.floor(
            F.try_divide(
                n * sab - sa * sb,
                F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("acf_micro"),
    )


@_q(
    "zipf_rank_frequency",
    f"""
    WITH {_TOKPOS_SQL},
    tf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS f FROM t2 GROUP BY term
    ),
    r AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS rk
      FROM tf
    ),
    sel AS (
      SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * CAST(1000000 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS x,
             CAST(floor(ln(CAST(f AS DOUBLE)) * CAST(1000000 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS y
      FROM r WHERE rk <= 200 AND f >= 2
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM sel
    )
    SELECT n,
           CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS slope_micro,
           CAST(floor((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS intercept_micro,
           CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS r2_micro
    FROM m
    """,
    "Zipf rank-frequency fit of the corpus vocabulary: OLS of ln(freq) "
    "on ln(rank) over the top-200 terms with freq >= 2 — natural text "
    "slopes near -1; templated/synthetic corpora drift, making this a "
    "generation-artifact detector next to tail_index_hill's value-side "
    "read.  Ranks by (freq DESC, term) through the range-partitioned "
    "prefix sum; each ln snaps to the micro grid from exact BIGINTs and "
    "the OLS reuses grouped_regression on those integer grids (slope is "
    "grid-unit-free)",
)
def q_zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import _tokens_with_pos
    from wellmeet_data_pipeline_spark.operators.stats import grouped_regression
    from wellmeet_data_pipeline_spark.operators.windows import global_rank_cumsum

    d = table(spark, sf_dir, "documents")
    tf = _tokens_with_pos(d, "text", "doc_id").groupBy("term").agg(
        F.count("*").cast("long").alias("f")
    )
    ranked = global_rank_cumsum(tf, [F.col("f").desc(), F.col("term").asc()])
    sel = ranked.filter((F.col("rank") <= 200) & (F.col("f") >= 2)).select(
        F.lit("all").alias("__g"),
        F.floor(F.log(F.col("rank").cast("double")) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("__x"),
        F.floor(F.log(F.col("f").cast("double")) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("__y"),
    )
    return grouped_regression(sel, "__g", F.col("__x"), F.col("__y")).select(
        "n", "slope_micro", "intercept_micro", "r2_micro"
    )


@_q(
    "dup_graph_assortativity",
    f"""
    WITH {_minhash_sha_ctes()},
    e AS (SELECT DISTINCT id_a, id_b FROM pairs),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT id_a AS node FROM e UNION ALL SELECT id_b FROM e
      ) GROUP BY node
    ),
    ends AS (
      SELECT da.degree AS ka, db.degree AS kb
      FROM e
      JOIN deg da ON da.node = e.id_a
      JOIN deg db ON db.node = e.id_b
      UNION ALL
      SELECT db.degree AS ka, da.degree AS kb
      FROM e
      JOIN deg da ON da.node = e.id_a
      JOIN deg db ON db.node = e.id_b
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ka) AS BIGINT) AS sa, CAST(sum(kb) AS BIGINT) AS sb,
             CAST(sum(ka * ka) AS BIGINT) AS saa,
             CAST(sum(kb * kb) AS BIGINT) AS sbb,
             CAST(sum(ka * kb) AS BIGINT) AS sab
      FROM ends
    )
    SELECT CAST(n // 2 AS BIGINT) AS n_edges,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) = 0 THEN NULL
                ELSE CAST(floor((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                                 - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                                / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                                        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                                       * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                                          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
                                * CAST(1000000 AS DOUBLE)
                                + CAST(0.5 AS DOUBLE)) AS BIGINT) END
             AS assortativity_micro
    FROM m
    """,
    "degree assortativity of the MinHash-LSH candidate graph (Newman r: "
    "Pearson correlation of endpoint degrees over both edge "
    "orientations): r > 0 = clique-of-clique duplicate neighborhoods, "
    "r < 0 = hub-and-spoke band pollution — the mixing-pattern scalar "
    "next to dup_graph_clustering's closure read.  Exact BIGINT degree "
    "moments, one snapped double; degree-regular graphs (zero variance) "
    "emit NULL",
)
def q_dup_graph_assortativity(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents")
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d)
    )
    e = (
        edges.select(
            F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)  # degree agg + two endpoint joins
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("__ka"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("__kb"))
    half = e.join(da, "a").join(db, "b").select("__ka", "__kb")
    ends = half.unionAll(
        half.select(F.col("__kb").alias("__ka"), F.col("__ka").alias("__kb"))
    )
    m = ends.agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("__ka").cast("long").alias("__sa"),
        F.sum("__kb").cast("long").alias("__sb"),
        F.sum(F.col("__ka") * F.col("__ka")).cast("long").alias("__saa"),
        F.sum(F.col("__kb") * F.col("__kb")).cast("long").alias("__sbb"),
        F.sum(F.col("__ka") * F.col("__kb")).cast("long").alias("__sab"),
    )
    n = F.col("__n").cast("double")
    sa, sb = F.col("__sa").cast("double"), F.col("__sb").cast("double")
    saa, sbb, sab = (
        F.col("__saa").cast("double"),
        F.col("__sbb").cast("double"),
        F.col("__sab").cast("double"),
    )
    return m.select(
        F.expr("__n div 2").cast("long").alias("n_edges"),
        F.floor(
            F.try_divide(
                n * sab - sa * sb,
                F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("assortativity_micro"),
    )


# ---------------------------------------------------------------------------
# Round 11: one-way group-difference tests (the k-sample siblings of the
# r10 pairwise stats), robust location, and the product-analytics /
# corpus-planning reads (cohorts, funnel, RFM, repetition rate, dedup
# savings).
# ---------------------------------------------------------------------------

_ONEWAY_TAIL_SQL = """
    tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
                   CAST(sum(s) AS BIGINT) AS ss, CAST(sum(q) AS BIGINT) AS qq
            FROM m),
    t AS (SELECT k, nn, ss, qq,
            CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / nullif(CAST(n AS DOUBLE) * CAST(qq AS DOUBLE), 0)
                       * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
              AS tm
          FROM m CROSS JOIN tot),
    a AS (SELECT k, nn, ss, qq, CAST(sum(tm) AS BIGINT) AS ts
          FROM t GROUP BY 1, 2, 3, 4),
    b AS (SELECT nn, k,
            ts - CAST(floor(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                            / nullif(CAST(nn AS DOUBLE) * CAST(qq AS DOUBLE), 0)
                            * CAST(1000000 AS DOUBLE)
                            + CAST(0.5 AS DOUBLE)) AS BIGINT) AS ssb_frac_micro,
            CAST(1000000 AS BIGINT)
              - CAST(floor(CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                           / nullif(CAST(nn AS DOUBLE) * CAST(qq AS DOUBLE), 0)
                           * CAST(1000000 AS DOUBLE)
                           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS sst_frac_micro
          FROM a)
    SELECT nn AS n_all, k AS n_groups, ssb_frac_micro, sst_frac_micro,
           CAST(floor(
             (CAST(ssb_frac_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
              / nullif(CAST(k AS DOUBLE) - CAST(1 AS DOUBLE), 0))
             / nullif(CAST(sst_frac_micro - ssb_frac_micro AS DOUBLE)
                      / CAST(1000000 AS DOUBLE)
                      / nullif(CAST(nn AS DOUBLE) - CAST(k AS DOUBLE), 0), 0)
             * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS f_micro,
           CAST(floor(CAST(ssb_frac_micro AS DOUBLE)
                      / nullif(CAST(sst_frac_micro AS DOUBLE), 0)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS eta2_micro
    FROM b
"""


@_q(
    "event_anova_f",
    f"""
    WITH m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_EVENT_CENTS_SQL}) AS BIGINT) AS s,
             CAST(sum({_EVENT_CENTS_SQL} * {_EVENT_CENTS_SQL}) AS BIGINT) AS q
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ),
    {_ONEWAY_TAIL_SQL}
    """,
    "one-way ANOVA F + eta^2 of the cents-exact event value across all "
    "event types at once — the k-sample 'does the group explain the "
    "variance' read next to event_welch_ttest's pairwise version.  "
    "Per-group S^2/n terms are doubles from exactly-representable "
    "BIGINTs, micro-snapped then BIGINT-summed, so group aggregation "
    "order cannot move the result; degenerate inputs emit NULL via "
    "try_divide / nullif",
)
def q_event_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import oneway_anova_f

    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return oneway_anova_f(e, "event_type", cents)


@_q(
    "event_levene_bf",
    f"""
    WITH h AS (
      SELECT event_type AS g, {_EVENT_CENTS_SQL} AS v, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cm,
             sum(c) OVER (PARTITION BY g) AS ng
      FROM h
    ),
    med AS (SELECT g, min(v) AS med FROM cum WHERE cm >= (ng + 1) // 2 GROUP BY g),
    z AS (
      SELECT e.event_type AS g, abs({_EVENT_CENTS_SQL} - m.med) AS z
      FROM events e JOIN med m ON m.g = e.event_type
    ),
    m AS (
      SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(z) AS BIGINT) AS s, CAST(sum(z * z) AS BIGINT) AS q
      FROM z GROUP BY 1
    ),
    {_ONEWAY_TAIL_SQL}
    """,
    "Brown-Forsythe Levene test of variance homogeneity across event "
    "types: one-way ANOVA F on |x - group median| (exact lower median "
    "off the per-group value histogram; Z stays on the integer grid, so "
    "the moment discipline of event_anova_f applies unchanged).  The "
    "variance-difference read that decides whether Welch (not pooled t) "
    "is required downstream",
)
def q_event_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import levene_brown_forsythe

    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return levene_brown_forsythe(e, "event_type", cents)


@_q(
    "event_kruskal_wallis",
    f"""
    WITH hist AS (
      SELECT event_type AS g, {_EVENT_CENTS_SQL} AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    vh AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt_all FROM hist GROUP BY v),
    vc AS (
      SELECT v, cnt_all,
             2 * (sum(cnt_all) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  - cnt_all) + cnt_all + 1 AS rank2
      FROM vh
    ),
    ties AS (
      SELECT CAST(sum(cnt_all * cnt_all * cnt_all - cnt_all) AS BIGINT) AS tie_sum,
             CAST(sum(cnt_all) AS BIGINT) AS n_all
      FROM vc
    ),
    pg AS (
      SELECT g, CAST(sum(cnt) AS BIGINT) AS ng,
             CAST(sum(cnt * rank2) AS BIGINT) AS r2
      FROM hist JOIN vc USING (v) GROUP BY g
    ),
    tm AS (
      SELECT ng, tie_sum, n_all,
             CAST(floor(CAST(12 AS DOUBLE)
                        * CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
                        / (CAST(4 AS DOUBLE) * CAST(ng AS DOUBLE)
                           * CAST(n_all AS DOUBLE)
                           * (CAST(n_all AS DOUBLE) + CAST(1 AS DOUBLE)))
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS t
      FROM pg CROSS JOIN ties
    ),
    ag AS (SELECT n_all, tie_sum, CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(t) AS BIGINT) AS ts
           FROM tm GROUP BY 1, 2)
    SELECT n_all, k AS n_groups,
           CASE WHEN k < 2 OR n_all < 2 THEN NULL ELSE
             CAST(floor(
               (CAST(ts AS DOUBLE) / CAST(1000000 AS DOUBLE)
                - CAST(3 AS DOUBLE) * (CAST(n_all AS DOUBLE) + CAST(1 AS DOUBLE)))
               / nullif(CAST(1 AS DOUBLE)
                        - CAST(tie_sum AS DOUBLE)
                          / (CAST(n_all AS DOUBLE) * CAST(n_all AS DOUBLE)
                             * CAST(n_all AS DOUBLE) - CAST(n_all AS DOUBLE)), 0)
               * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) END
             AS h_micro
    FROM ag
    """,
    "tie-corrected Kruskal-Wallis H across all event types — the "
    "k-sample extension of source_mann_whitney from the SAME one-global-"
    "average-ranking machinery (doubled integer ranks over the pooled "
    "value histogram, range-partitioned prefix sum); per-group R^2/n "
    "terms micro-snapped and BIGINT-summed so group order cannot move "
    "the result",
)
def q_event_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import kruskal_wallis_h

    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return kruskal_wallis_h(e.select("event_type", cents.alias("v")), "event_type", "v")


@_q(
    "event_winsorized_mean",
    f"""
    WITH h AS (
      SELECT event_type AS g, {_EVENT_CENTS_SQL} AS v, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cm,
             sum(c) OVER (PARTITION BY g) AS ng
      FROM h
    ),
    cuts AS (
      SELECT g, CAST(max(ng) AS BIGINT) AS n,
             min(CASE WHEN cm >= (5 * ng + 99) // 100 THEN v END) AS lo,
             min(CASE WHEN cm >= (95 * ng + 99) // 100 THEN v END) AS hi
      FROM cum GROUP BY g
    ),
    w AS (
      SELECT h.g, n, lo, hi, h.c * greatest(least(h.v, cuts.hi), cuts.lo) AS wv
      FROM h JOIN cuts USING (g)
    )
    SELECT g AS event_type, n, CAST(lo AS BIGINT) AS lo_cents,
           CAST(hi AS BIGINT) AS hi_cents,
           CAST(floor(CAST(sum(wv) AS DOUBLE) / CAST(n AS DOUBLE)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS wmean_micro
    FROM w GROUP BY 1, 2, 3, 4
    """,
    "per-type 5/95-winsorized mean of the cents-exact value — the "
    "robust location read next to daily_anomaly_mad's scale read: "
    "exact ECDF order-statistic cutoffs off the per-group value "
    "histogram, outliers CLAMPED (not dropped), clamped sum exact "
    "BIGINT, one deterministic division at the end",
)
def q_event_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import winsorized_mean_by_group

    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return winsorized_mean_by_group(e, "event_type", cents)


@_q(
    "user_retention_cohorts",
    """
    WITH uw AS (
      SELECT DISTINCT user_id,
             (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    coh AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY 1),
    sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort FROM coh GROUP BY 1),
    act AS (
      SELECT c.cohort, uw.wk - c.cohort AS week_offset,
             CAST(count(*) AS BIGINT) AS n_active
      FROM uw JOIN coh c USING (user_id) GROUP BY 1, 2
    )
    SELECT CAST(a.cohort AS BIGINT) AS cohort_week,
           CAST(a.week_offset AS BIGINT) AS week_offset,
           s.n_cohort, a.n_active,
           (1000000 * a.n_active) // s.n_cohort AS retention_micro
    FROM act a JOIN sizes s USING (cohort)
    """,
    "weekly retention cohorts over the event stream: users grouped by "
    "first-active epoch-week, retention at offset k = active users / "
    "cohort size (exact integer micro-division).  The classic product-"
    "analytics triangle, all integer epoch-week arithmetic — no "
    "timestamp rendering crosses the engines.  Scale: user-grain "
    "distinct + two group-bys; the output is cohort x offset grain",
)
def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    uw = e.select(
        "user_id",
        F.expr("datediff(to_date(ts), DATE'1970-01-01') div 7").cast("long").alias("wk"),
    ).distinct()
    coh = uw.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    sizes = coh.groupBy("cohort").agg(F.count("*").cast("long").alias("n_cohort"))
    act = (
        uw.join(coh, "user_id")
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("week_offset"))
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    return act.join(sizes, "cohort").select(
        F.col("cohort").cast("long").alias("cohort_week"),
        F.col("week_offset").cast("long"),
        "n_cohort",
        "n_active",
        F.expr("(1000000 * n_active) div n_cohort").cast("long").alias("retention_micro"),
    )


@_q(
    "event_funnel_conversion",
    """
    WITH u1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1
    ),
    u2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN u1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1
    ),
    u3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN u2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1
    ),
    c AS (
      SELECT CAST((SELECT count(*) FROM u1) AS BIGINT) AS n1,
             CAST((SELECT count(*) FROM u2) AS BIGINT) AS n2,
             CAST((SELECT count(*) FROM u3) AS BIGINT) AS n3
    )
    SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, n1 AS n_users,
           (1000000 * n1) // nullif(n1, 0) AS conv_micro FROM c
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click', n2, (1000000 * n2) // nullif(n1, 0) FROM c
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', n3, (1000000 * n3) // nullif(n1, 0) FROM c
    """,
    "ordered funnel conversion view -> click -> purchase: each step's "
    "timestamp must STRICTLY FOLLOW the user's previous step (min-ts "
    "per step, re-filtered per stage — the sessionless ordered-funnel "
    "semantics).  conv_micro is exact integer division against the "
    "step-1 population.  Scale: three user-grain aggs, each a semi-"
    "join narrower than the last",
)
def q_event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u1 = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    u2 = (
        e.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    u3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c = (
        u1.agg(F.count("*").cast("long").alias("n1"))
        .crossJoin(u2.agg(F.count("*").cast("long").alias("n2")))
        .crossJoin(u3.agg(F.count("*").cast("long").alias("n3")))
    )
    steps = []
    for idx, name, ncol in ((1, "view", "n1"), (2, "click", "n2"), (3, "purchase", "n3")):
        steps.append(
            c.select(
                F.lit(idx).cast("long").alias("step_idx"),
                F.lit(name).alias("step"),
                F.col(ncol).alias("n_users"),
                F.expr(f"(1000000 * {ncol}) div nullif(n1, 0)")
                .cast("long")
                .alias("conv_micro"),
            )
        )
    return steps[0].unionByName(steps[1]).unionByName(steps[2])


@_q(
    "customer_rfm_segments",
    """
    WITH base AS (
      SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
             CAST(count(*) AS BIGINT) AS fq,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mc
      FROM orders GROUP BY 1
    ),
    mx AS (SELECT max(last_d) AS maxd FROM base),
    b AS (
      SELECT o_custkey, CAST(mx.maxd - last_d AS BIGINT) AS r, fq, mc
      FROM base CROSS JOIN mx
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM b),
    rh AS (SELECT r, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY r),
    rb AS (SELECT r, (5 * sum(c) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
                      + (SELECT nt FROM n) - 1) // (SELECT nt FROM n) AS r_seg FROM rh),
    fh AS (SELECT fq, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY fq),
    fb AS (SELECT fq, (5 * sum(c) OVER (ORDER BY fq ROWS UNBOUNDED PRECEDING)
                       + (SELECT nt FROM n) - 1) // (SELECT nt FROM n) AS f_seg FROM fh),
    mh AS (SELECT mc, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY mc),
    mb AS (SELECT mc, (5 * sum(c) OVER (ORDER BY mc ROWS UNBOUNDED PRECEDING)
                       + (SELECT nt FROM n) - 1) // (SELECT nt FROM n) AS m_seg FROM mh)
    SELECT CAST(r_seg AS BIGINT) AS r_seg, CAST(f_seg AS BIGINT) AS f_seg,
           CAST(m_seg AS BIGINT) AS m_seg,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(mc) AS BIGINT) AS monetary_cents
    FROM b JOIN rb USING (r) JOIN fb USING (fq) JOIN mb USING (mc)
    GROUP BY 1, 2, 3
    """,
    "RFM segmentation of customers from their orders: recency (days "
    "since last order vs the corpus max date), frequency, monetary "
    "(cents-exact), each quintile-bucketed by its exact ECDF rank "
    "(bucket = ceil(5*cum/n) off the metric's value histogram — ties "
    "share a bucket, fully deterministic, no ntile()).  The Spark "
    "cumulatives run through the range-partitioned prefix sum, so the "
    "monetary grid (customer-cardinality) never hits a global window",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.windows import global_rank_cumsum

    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    base = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_d"),
        F.count("*").cast("long").alias("fq"),
        F.sum(cents).cast("long").alias("mc"),
    )
    mx = base.agg(F.max("last_d").alias("maxd"))
    b = base.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        F.datediff("maxd", "last_d").cast("long").alias("r"),
        "fq",
        "mc",
    )
    b = b.localCheckpoint(eager=False)  # feeds three histograms + the join
    nt = b.agg(F.count("*").cast("long").alias("nt"))

    def bucket(metric: str, seg: str) -> DataFrame:
        hist = b.groupBy(metric).agg(F.count("*").cast("long").alias("__c"))
        cum = global_rank_cumsum(
            hist, [F.col(metric).asc()], sum_col="__c", cum_col="__cum"
        )
        return cum.crossJoin(F.broadcast(nt)).select(
            metric,
            F.expr("(5 * __cum + nt - 1) div nt").cast("long").alias(seg),
        )

    return (
        b.join(bucket("r", "r_seg"), "r")
        .join(bucket("fq", "f_seg"), "fq")
        .join(bucket("mc", "m_seg"), "mc")
        .groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("mc").cast("long").alias("monetary_cents"),
        )
    )


@_q(
    "source_repeated_ngram_rate",
    f"""
    WITH norm AS (
      SELECT source, string_split({_NORM_SQL}, ' ') AS words
      FROM documents WHERE source IS NOT NULL
    ),
    gr AS (
      SELECT source,
             unnest(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                   i -> array_to_string(words[i:i+2], ' '))) AS g
      FROM norm
    ),
    gc AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c FROM gr GROUP BY 1, 2)
    SELECT source, CAST(sum(c) AS BIGINT) AS n_occurrences,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(floor((CAST(1 AS DOUBLE)
                       - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE))
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS repeat_micro
    FROM gc GROUP BY source
    """,
    "per-source repeated word-3gram rate (1 - distinct/total gram "
    "occurrences) — the corpus-level memorization-risk read that "
    "complements gopher_repetition's per-doc one and "
    "exact_substring_repeats' span output: which SOURCE contributes "
    "boilerplate mass.  Two-level exact distinct (gram-grain partial "
    "collapses map-side); never a count(DISTINCT) over raw rows",
)
def q_source_repeated_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import shingles_df

    d = table(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    sh = shingles_df(d, n=3, carry_cols=["source"])
    gc = sh.groupBy("source", "shingle").agg(F.count("*").cast("long").alias("__c"))
    return gc.groupBy("source").agg(
        F.sum("__c").cast("long").alias("n_occurrences"),
        F.count("*").cast("long").alias("n_distinct"),
        F.floor(
            (
                F.lit(1.0)
                - F.count("*").cast("double") / F.sum("__c").cast("double")
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("repeat_micro"),
    )


@_q(
    "dedup_char_savings",
    f"""
    WITH RECURSIVE {_minhash_sha_ctes()},
    e2 AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM e2
      UNION
      SELECT e.u, r.r FROM e2 e JOIN reach r ON e.v = r.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    losers AS (SELECT node AS doc_id FROM comp WHERE node <> component),
    tot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS total_chars
      FROM documents WHERE source IS NOT NULL GROUP BY 1
    ),
    lost AS (
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_dropped,
             CAST(sum(coalesce(d.n_chars, 0)) AS BIGINT) AS saved_chars
      FROM documents d JOIN losers l USING (doc_id)
      WHERE d.source IS NOT NULL GROUP BY 1
    )
    SELECT t.source, t.n_docs, coalesce(l.n_dropped, 0) AS n_dropped,
           t.total_chars, coalesce(l.saved_chars, 0) AS saved_chars,
           (1000000 * coalesce(l.saved_chars, 0)) // nullif(t.total_chars, 0)
             AS savings_micro
    FROM tot t LEFT JOIN lost l USING (source)
    """,
    "per-source char savings if MinHash near-dup dedup keeps one doc "
    "per cluster (min-id survivor): the capacity-planning read before "
    "paying for the dedup pass — composes the hash-verified CC "
    "machinery; joins the bench shared-edge family.  Integer micro-"
    "division; sources with zero chars emit NULL",
)
def q_dedup_char_savings(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        connected_components,
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(table(spark, sf_dir, "documents"))
    )
    comp = connected_components(edges)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    tot = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).cast("long").alias("total_chars"),
    )
    lost = (
        d.join(losers, "doc_id", "left_semi")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_dropped"),
            F.sum(F.coalesce(F.col("n_chars"), F.lit(0)))
            .cast("long")
            .alias("saved_chars"),
        )
    )
    return (
        tot.join(lost, "source", "left")
        .na.fill({"n_dropped": 0, "saved_chars": 0})
        .select(
            "source",
            "n_docs",
            "n_dropped",
            "total_chars",
            "saved_chars",
            F.expr("(1000000 * saved_chars) div nullif(total_chars, 0)")
            .cast("long")
            .alias("savings_micro"),
        )
    )


# The correctness driver snapshots the FIRST 50 entries of REGISTRY order at
# each round. Rounds 1-3 registered queries roughly chronologically, so the 63
# queries added in rounds 2-3 (corpus curation, scoring, cross-corpus dedup,
# hard negatives, ...) sat past position 50 and never received driver-side
# evidence despite passing the full local oracle gate. Reorder so the window
# holds: (a) the SURVEY §2-critical core — the reference's own operator
# surface, kept so the scoreboard never loses its anchor — and (b) the
# strongest oracle-backed queries that have never had a driver row. Rows-only
# queries (oracle=None) are deliberately excluded from the window: they would
# spend a slot on a weaker check. Rotate again next round for the remainder.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW: list[str] = [
    # -- r11 window: CORRECTNESS_r10 landed 50/50, so driver evidence now
    # covers everything through the round-9 additions.  The 39 round-10
    # additions (stats family, quantization rungs, winnowing / hamming /
    # PRF, dup-graph clustering + assortativity, ...) have never had a
    # driver row — they lead.  Then the 11 oldest-evidence anchors
    # (r6-green, re-proven on fresh data).  Precomputed at NOTES.md §r11
    # rotation list; the anchors displaced by the round-10b wave move to
    # the r12 rotation. --
    "rendezvous_sharding",
    "reshard_movement_stats",
    "ttr_lexical_diversity",
    "split_leakage_audit",
    "span_corruption_plan",
    "quality_pareto_frontier",
    "winnowing_fingerprints",
    "hamming_exact_neardup",
    "bm25_prf_topk",
    "kmeans_silhouette",
    "cluster_label_purity",
    "tail_index_hill",
    "minhash_union_parity",
    "min_k_prob_score",
    "self_bleu_pairs",
    "source_drift_ks",
    "source_mann_whitney",
    "event_welch_ttest",
    "event_conformal_coverage",
    "brand_price_regression",
    "event_cusum_changepoint",
    "classifier_avg_precision",
    "embedding_binary_quant_recall",
    "stupid_backoff_nll",
    "nation_revenue_gini",
    "quality_length_spearman",
    "user_event_entropy",
    "bloom_size_plan",
    "weekday_seasonal_anomalies",
    "length_quantile_normalize",
    "source_keyness_chi2",
    "dsir_ess_by_source",
    "ab_sample_size_plan",
    "survival_km_conversion",
    "dup_graph_clustering",
    "embedding_int8_recall",
    "daily_revenue_acf",
    "zipf_rank_frequency",
    "dup_graph_assortativity",
    # -- oldest-evidence anchors (oldest r6-green) --
    "late_shipment_priority",
    "length_curriculum",
    "market_share_by_year",
    "pack_efficiency_by_seqlen",
    "perplexity_lang_buckets",
    "product_profit_by_nation",
    "promo_revenue_share",
    "returned_item_report",
    "rolling_7day_active_users",
    "semdedup_survivors",
    "seqlen_histogram",
]


def _rotate_registry() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_DRIVER_WINDOW names absent from REGISTRY: {missing}")
    window = set(_DRIVER_WINDOW)
    rows_only_in_window = [n for n in _DRIVER_WINDOW if REGISTRY[n].oracle is None]
    if rows_only_in_window:
        raise RuntimeError(
            f"rows-only queries waste driver-window slots: {rows_only_in_window}"
        )
    ordered = [*_DRIVER_WINDOW, *[n for n in REGISTRY if n not in window]]
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)


_rotate_registry()

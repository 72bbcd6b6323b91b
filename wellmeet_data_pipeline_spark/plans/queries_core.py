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
           -- NOT (v >= 50), not (v < 50): a NULL value is NEITHER success
           -- nor failure (mirrors Spark's when(~flag).otherwise(0) — the
           -- ELSE-branch form counted NULLs as failures, r11 hostile catch)
           CAST(sum(CASE WHEN NOT (value >= 50) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_failed
    FROM events GROUP BY event_type
    """,
    "A2 (save-reviews/lambda_function.py:60-98): success/failure tallies as "
    "one-pass sum(when); NULL values count in n_total but in neither tally",
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
    -- HAVING: on EMPTY input DuckDB emits the () grouping-set row
    -- (ANSI) while Spark emits none — no-op on non-empty input
    HAVING count(*) > 0
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
    -- HAVING: on EMPTY input DuckDB emits the () grouping-set row
    -- (ANSI) while Spark emits none — no-op on non-empty input
    HAVING count(*) > 0
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
def q_jaccard(
    spark: SparkSession, sf_dir: str, shared_pair_stats: DataFrame | None = None
) -> DataFrame:
    # bench PAIR_STATS_SHARED: the (id_a, id_b, inter, n_a, n_b) frame
    # is built once per session (billed shingle_pair_stats_build);
    # threshold + rounding here are a pure projection over it
    d = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.15, stats_frame=shared_pair_stats)


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
    -- HAVING: empty-input () row, see rollup_subtotals
    HAVING count(*) > 0
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
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
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
    "(estimates are engine-specific → rows-only).  Paired evidence: "
    "tests/test_plans.py::test_approx_distinct_sketch_within_rsd_bound "
    "holds every per-type estimate within 5x the configured 2% rsd of "
    "the exact countDistinct on the same data",
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
def q_minhash_verify(
    spark: SparkSession, sf_dir: str, shared_verify_counts: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_verify_from_raw,
        minhash_verify_sha,
    )

    # bench VERIFY_SHARED: the raw-counts verify frame is built once per
    # session (billed as dedup_verify_counts_build) and the rounded form
    # here is a bit-identical projection over it — shared == standalone
    # pinned by tests/test_shared_verify_counts.py
    if shared_verify_counts is not None:
        return minhash_verify_from_raw(shared_verify_counts)
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



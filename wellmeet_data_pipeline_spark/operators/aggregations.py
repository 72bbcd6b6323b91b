"""Aggregation operators (SURVEY.md §2.7 A1-A4 + cube/rollup extensions).

All plain groupBy().agg() — Catalyst plans hash aggregation with
partial (map-side) + final phases, so every one of these ships one
combined row per (partition, group) into the shuffle, which is what
keeps grouped tallies viable at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conditional_counts(df: DataFrame, flag_col, group_cols: Sequence[str]) -> DataFrame:
    """A2 (save-reviews/lambda_function.py:60-98): success/failure tallies.
    sum(when(flag,1)) keeps it one pass / one shuffle instead of two counts."""
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(flag_col, 1).otherwise(0)).alias("n_success"),
        F.sum(F.when(~flag_col, 1).otherwise(0)).alias("n_failed"),
    )


def grouped_sample(df: DataFrame, group_cols: Sequence[str], payload_col: str, k: int) -> DataFrame:
    """A4 (save-reviews/lambda_function.py:109-110): keep at most k payloads
    per group — slice(collect_list) after a sort inside the group via
    sort_array for determinism."""
    return df.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_list(payload_col)), 1, k).alias("sample")
    )


def rollup_counts(df: DataFrame, dims: Sequence[str], measure: str) -> DataFrame:
    """Hierarchical subtotals (reference has none — free Catalyst extension,
    SURVEY.md §2.7)."""
    return df.rollup(*dims).agg(
        F.count("*").alias("n_rows"), F.round(F.sum(measure), 2).alias("sum_measure")
    )


def cube_counts(df: DataFrame, dims: Sequence[str], measure: str) -> DataFrame:
    return df.cube(*dims).agg(
        F.count("*").alias("n_rows"), F.round(F.sum(measure), 2).alias("sum_measure")
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_share: float,
    round_digits: int = 6,
) -> DataFrame:
    """Exact phi-heavy-hitters: keys whose frequency is >= min_share of
    all rows — the exact form of what Misra-Gries / count-min sketches
    approximate, and the frame a skew-mitigation pass (salting, hot-key
    broadcast) reads to decide WHICH keys to salt.

    Plan: one map-side-combined groupBy on the key + a 1-row total
    broadcast (scalar agg cross-joined back, the tfidf_top_terms idiom).
    Output is at most 1/min_share rows by construction — bounded
    regardless of corpus size."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("n"))
    return threshold_heavy_hitters(counts, key_col, min_share, round_digits)


def threshold_heavy_hitters(
    counts: DataFrame,
    key_col: str,
    min_share: float,
    round_digits: int = 6,
) -> DataFrame:
    """The threshold/share half of heavy_hitters over a PRE-AGGREGATED
    (key, n) frame — shared with the streaming tracker, whose counts
    come from an incrementally-maintained store instead of a scan."""
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") >= F.col("__total") * F.lit(min_share))
        .select(
            key_col,
            "n",
            F.round(F.col("n") / F.col("__total"), round_digits).alias("share"),
        )
    )


def merge_agg_states(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    count_col: str = "n_events",
    sum_col: str = "value_cents",
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: refresh a stored
    (count, sum) rollup with a delta batch WITHOUT rescanning the base
    data — union the two partial-state frames and re-reduce.  Sound
    because count/sum are commutative monoids (the same algebra Spark's
    own partial aggregation exploits per-shuffle); avg/stddev derive from
    (count, sum, sum-of-squares) states the same way.

    This is the nightly-rollup shape at 100 TB: the base frame is
    key-cardinality (already aggregated, typically 10^3-10^6x smaller
    than the event log) and the delta aggregates map-side before its
    rows move, so the refresh cost scales with |delta| + |keys|, not
    with the full history.  MIN/MAX also merge; distinct-count requires
    a mergeable sketch state (HLL) instead of a scalar."""
    return (
        base.select(*keys, count_col, sum_col)
        .unionByName(delta.select(*keys, count_col, sum_col))
        .groupBy(*keys)
        .agg(
            F.sum(count_col).alias(count_col),
            F.sum(sum_col).alias(sum_col),
        )
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    b: int = 8,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """HyperLogLog distinct-count over `key_col` with 2^b registers —
    the mergeable fixed-size sketch that replaces COUNT(DISTINCT) when
    the key set itself no longer fits anywhere (every register frame is
    2^b rows regardless of input size, and two sketches merge by
    register-wise MAX — the property that lets per-partition/per-day
    sketches roll up without re-touching raw data).

    Hashing is sha256-derived so the DuckDB oracle reproduces the sketch
    BIT-FOR-BIT (a production deployment swaps in xxhash64 — same shape,
    cheaper hash; the repo's MinHash twins set the precedent): register =
    first b bits (2 hex chars for b=8), rho = leading-zero count of the
    next 52 bits + 1, computed via length(bin(v)) — pure integer, no
    float log.  The harmonic mean rides an exact bigint: sum over
    registers of 2^(52 - M_j) (M_j <= 53), one double division at the
    end, and the standard small-range linear-counting correction when
    E < 2.5m with empty registers.

    Output: one row (n_exact, estimate, rel_error) — n_exact is included
    for the evaluation read; a real pipeline emits only the registers.
    With `group_cols`, one row per group from per-group register frames —
    the mergeable-rollup shape itself: group sketches ARE the daily/
    partition units that later MAX-merge into coarser rollups.

    NULL keys are excluded before hashing — COUNT(DISTINCT) ignores them
    on both engines, and hashing them would mint a phantom register
    (sha2(NULL) is NULL: counted into nreg but contributing NULL to the
    harmonic sum) that biases the estimate.  A group whose keys are all
    NULL therefore has no row in the output.  Group joins are null-SAFE,
    so a NULL-valued group KEY (e.g. event_type NULL) keeps its row."""
    if b != 8:
        raise ValueError("register addressing is pinned to b=8 (2 hex chars)")
    m = 1 << b
    hx = F.sha2(F.col(key_col).cast("string"), 256)
    reg = F.conv(F.substring(hx, 1, 2), 16, 10).cast("int")
    # 52 bits after the register bits; conv -> bigint < 2^52 (exact)
    v = F.conv(F.substring(hx, 3, 13), 16, 10).cast("long")
    # rho = (#leading zeros of the 52-bit string) + 1 = 53 - bit_length(v),
    # CAPPED at 52: the all-zero suffix would give rho=53, whose 2^(52-53)
    # contribution is fractional — it would corrupt the bigint accumulator
    # (Spark shiftleft(1, -1) wraps to Long.MIN_VALUE; DuckDB ** returns
    # 0.5).  Capping costs a one-register bias of 2^-53 — far below the
    # estimator's own error — and keeps both engines exactly integral.
    rho = F.when(F.col("__v") == 0, F.lit(52)).otherwise(
        F.lit(53) - F.length(F.bin(F.col("__v")))
    )
    groups = list(group_cols) if group_cols else []
    dfk = df.filter(F.col(key_col).isNotNull())
    regs = (
        dfk.select(*groups, reg.alias("__reg"), v.alias("__v"))
        .withColumn("__rho", rho)
        .groupBy(*groups, "__reg")
        .agg(F.max("__rho").alias("__M"))
    )
    # exact-integer harmonic accumulator: Z * 2^52 = sum(2^(52 - M_j));
    # empty registers contribute 2^52 each (M = 0)
    stats = regs.groupBy(*groups).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 52 - __M)")).alias("__zsum"),
        F.count("*").alias("__nreg"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    two52 = float(1 << 52)
    est_raw = (
        F.lit(alpha * m * m * two52)
        / (F.col("__zsum") + (F.lit(m) - F.col("__nreg")) * F.lit(two52))
    )
    zeros = (F.lit(m) - F.col("__nreg")).cast("double")
    est = F.when(
        (est_raw < 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(est_raw)
    exact = dfk.groupBy(*groups).agg(
        F.count_distinct(F.col(key_col)).alias("n_exact")
    )
    if groups:
        st = stats
        for g in groups:
            st = st.withColumnRenamed(g, f"__st_{g}")
        cond = None
        for g in groups:
            c = F.col(g).eqNullSafe(F.col(f"__st_{g}"))
            cond = c if cond is None else (cond & c)
        joined = exact.join(F.broadcast(st), cond).drop(
            *[f"__st_{g}" for g in groups]
        )
    else:
        joined = exact.crossJoin(F.broadcast(stats))
    return joined.select(
        *groups,
        "n_exact",
        F.round(est, 4).alias("estimate"),
        F.round((est - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_error"
        ),
    )


def countmin_heavy_hitters(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 2,
    top_n: int = 10,
) -> DataFrame:
    """Count-min sketch frequency estimates, evaluated against exact
    counts for the top-N keys — the fixed-size alternative to a full
    groupBy when the key space explodes: the sketch is depth x width
    cells regardless of input, merges cell-wise by +, and every estimate
    is an UPPER bound (collisions only inflate).

    sha256-derived row hashes (bucket_j = 4 hex chars of sha256(j||key)
    mod width) keep the sketch oracle-reproducible; estimates are
    min over rows of the collided cell sums — all integer arithmetic.
    The exact join is evaluation scaffolding: a real deployment keeps
    only the (depth x width) cell frame.

    One input scan builds ALL depth rows (inline_outer over the per-row
    bucket structs) — a per-depth-row union would rescan the input
    depth times, d-1 redundant full passes at the corpus sizes this
    operator targets.

    NULL keys are excluded up front: sha2(NULL) is NULL, so a NULL key
    can never probe its sketch cells (the bucket equi-join drops it),
    and Spark/DuckDB disagree on NULL placement in the top-N order-by —
    excluding on both engines is the only consistent contract."""

    df = df.filter(F.col(key_col).isNotNull())

    def bucket_expr(j: int):
        return (
            F.conv(
                F.substring(
                    F.sha2(
                        F.concat(
                            F.lit(str(j) + "|"), F.col(key_col).cast("string")
                        ),
                        256,
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % width
        )

    sketch = (
        df.select(
            F.inline_outer(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("__row"),
                            bucket_expr(j).alias("__bucket"),
                        )
                        for j in range(depth)
                    ]
                )
            )
        )
        .groupBy("__row", "__bucket")
        .agg(F.count("*").alias("__c"))
    )

    exact = df.groupBy(key_col).agg(F.count("*").alias("n_exact"))
    top = exact.orderBy(F.col("n_exact").desc(), F.col(key_col).asc()).limit(top_n)
    probes = top
    for j in range(depth):
        probes = probes.withColumn(f"__b{j}", bucket_expr(j))
    est = None
    for j in range(depth):
        s = sketch.filter(F.col("__row") == j).select(
            F.col("__bucket").alias(f"__b{j}"), F.col("__c").alias(f"__e{j}")
        )
        probes = probes.join(F.broadcast(s), f"__b{j}")
        e = F.col(f"__e{j}")
        est = e if est is None else F.least(est, e)
    return probes.select(
        key_col,
        "n_exact",
        est.alias("estimate"),
        (est - F.col("n_exact")).alias("overcount"),
    )


def trimmed_mean_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_frac: float = 0.1,
    micro: int = 1_000_000,
) -> DataFrame:
    """Robust per-group mean: drop the floor(n*trim_frac) lowest and
    highest ROWS of `value_col` per group, average the rest — the
    standard outlier-resistant aggregate for quality-metric rollups
    (a handful of junk documents shouldn't move a source's score).

    Exactness and scale share one trick: rows collapse to the DISTINCT
    VALUE GRID first (value snapped to the micro-integer grid, counted
    per (group, value)), so the trim boundary is resolved by CUMULATIVE
    COUNTS over distinct values — windows run over grid-sized
    partitions, never row-sized ones, and the kept-row count per value
    is pure integer arithmetic:
        kept(v) = max(0, min(cum(v), n-lo) - max(cum(v)-cnt(v), lo)).
    Ties at the boundary therefore trim deterministically (any lo
    lowest rows share the same value multiset).  trim_frac must sit in
    [0, 0.5) — at 0.5 every row would be trimmed.  The weighted sum rides
    an exact wide-integer accumulator (decimal 38,0 — sums of
    micro-values stay exact far past bigint), and the single division
    at the end makes the mean bit-identical across engines.  NULL
    values are excluded; a group of only NULLs does not appear."""
    if not 0.0 <= trim_frac < 0.5:
        raise ValueError(f"trim_frac must be in [0, 0.5), got {trim_frac}")
    mv = F.floor(F.col(value_col) * F.lit(float(micro)) + F.lit(0.5)).cast("long")
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col), mv.alias("mv"))
        .agg(F.count("*").alias("cnt"))
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("mv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    c = g.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )
    lo = F.floor(F.col("n").cast("double") * F.lit(trim_frac)).cast("long")
    hi = F.col("n") - lo
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), hi) - F.greatest(F.col("cum") - F.col("cnt"), lo),
    )
    k = c.withColumn("kc", kept)
    return (
        k.groupBy(group_col)
        .agg(
            F.max("n").alias("n_rows"),
            F.sum("kc").alias("n_kept"),
            F.sum(F.col("mv").cast("decimal(38,0)") * F.col("kc")).alias("__t"),
        )
        .select(
            group_col,
            "n_rows",
            "n_kept",
            (
                (F.col("__t").cast("double") / F.col("n_kept").cast("double"))
                / F.lit(float(micro))
            ).alias("trimmed_mean"),
        )
    )


# Poisson(1) inverse-CDF thresholds: P(X <= k) = e^-1 * sum_{j<=k} 1/j!.
# Literal constants (not computed) so both engines compare against the
# SAME doubles; weights cap at 6 (P(X > 6) ~ 8e-5 — negligible bias).
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_replicas: int = 40,
    ci: float = 0.95,
    salt: str = "bb",
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-group mean with a Poisson-bootstrap confidence interval — the
    distributed form of the bag-of-little-bootstraps: resampling with
    replacement is simulated by giving every row an independent
    Poisson(1) weight per replica, so no replica ever materializes a
    resample; replica means are weighted means, and the CI is the
    (1±ci)/2 order statistics of the replica means.

    Determinism: the per-(row, replica) weight is the Poisson(1)
    inverse CDF of a sha256-derived uniform (the A-ES sampling idiom —
    a pure function of the data, retry/repartition-stable and
    reproducible by the DuckDB oracle).  Replica sums ride exact
    integer grids (weight x micro-value), so each replica mean is one
    exact division; replicas are ranked on that double with the replica
    id as tie-break.

    Scale shape: the B-fold fan-out exists only inside the map stage —
    it feeds a map-side-combined groupBy((group, replica)), so the
    shuffle carries |groups| x B partial rows, never B x N.  The rank
    window runs over B-sized partitions.  Rows with NULL values are
    excluded; replicas whose weights all drew 0 are dropped and the
    order statistics use the surviving replica count."""
    if not 0.0 < ci < 1.0:
        raise ValueError(f"ci must be in (0, 1), got {ci}")
    alpha = (1.0 - ci) / 2.0
    mv = F.floor(F.col(value_col) * F.lit(float(micro)) + F.lit(0.5)).cast("long")
    # NULL ids are excluded: Spark concat() nulls out on any NULL operand
    # while DuckDB concat() skips it, so a NULL id would draw ENGINE-
    # DEPENDENT weights (w=6 via the NULL-comparison else-branch on one
    # side, a real hash on the other)
    from wellmeet_data_pipeline_spark.operators.skew import fanout_small_scan

    # The B-fold sha fan-out below multiplies per-row CPU ~ceil(B/8)x
    # (one sha256 per digest group) before any exchange, so a source
    # that scans in fewer splits than the cluster has slots serializes
    # the dominant stage on those few cores (guide §2.5 input skew /
    # §2.6 single-task stages).  fanout_small_scan is an exact no-op on
    # wide scans (the 100 TB case) and a cheap round-robin of the
    # pre-fan rows otherwise.
    base = fanout_small_scan(df).filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(F.col(group_col), F.col(id_col).alias("__id"), mv.alias("mv"))

    # one sha256 yields 64 hex chars = EIGHT independent 32-bit uniforms,
    # so replica b reads slice (b mod 8) of hash group (b div 8).  The
    # explode is TWO-STAGE so the sha executes once per DIGEST, not once
    # per replica (r13 optimization round, guide §1.2 per-task work):
    # stage 1 generates the ceil(B/8) hash groups per id and evaluates
    # the sha there (5 digests at B=40, down from 40 evaluations — the
    # dominant CPU of this query); stage 2 turns each digest into its 8
    # weights inside ONE projection and posexplodes the 8-long weight
    # array, so the 64-char digest itself never rides a Generate.  The
    # two shapes the r11 re-measure rejected both made Generate copy
    # heavy payloads (a 5x64-char digest array into all 40 generated
    # rows: 13-15s; a 40-wide weight projection past codegen limits:
    # 19-23s) — this one copies 8 longs.  Weights are bit-identical:
    # same digest string, same slice, same conv/CDF chain, with
    # b = 8*bh + bl reconstructing the replica id exactly.
    rep_hi = base.select(
        group_col,
        "__id",
        "mv",
        F.explode(
            F.sequence(F.lit(0), F.lit((int(n_replicas) + 7) // 8 - 1))
        ).alias("bh"),
    )
    # the digest is materialized as a NAMED column before the 8 weight
    # expressions reference it — as an inline expression it would be
    # embedded (and re-evaluated) once per array slot, re-running the
    # sha 8x and losing the whole reduction (measured: 10.6s vs 5.0s)
    rep_hi = rep_hi.select(
        group_col,
        "mv",
        "bh",
        F.sha2(
            F.concat(
                F.lit(f"{salt}|"),
                F.col("__id").cast("string"),
                F.lit("|"),
                F.col("bh").cast("string"),
            ),
            256,
        ).alias("__hx"),
    )

    def _w_of_slice(bl: int):
        unif = (
            F.conv(F.substring(F.col("__hx"), 1 + 8 * bl, 8), 16, 10).cast("double")
            + F.lit(1.0)
        ) / F.lit(4294967296.0)
        w = F.lit(6).cast("long")
        for k in range(len(POISSON1_CDF) - 1, -1, -1):
            w = F.when(
                unif < F.lit(POISSON1_CDF[k]), F.lit(k).cast("long")
            ).otherwise(w)
        return w

    rep = rep_hi.select(
        group_col,
        "mv",
        "bh",
        F.posexplode(
            F.array(*[_w_of_slice(bl) for bl in range(8)])
        ).alias("bl", "w"),
    ).select(
        group_col,
        "mv",
        (F.col("bh") * 8 + F.col("bl")).alias("b"),
        "w",
    )
    if int(n_replicas) % 8 != 0:
        rep = rep.filter(F.col("b") < int(n_replicas))

    per_rep = (
        rep.groupBy(group_col, "b")
        .agg(
            F.sum(F.col("w") * F.col("mv")).alias("smw"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .withColumn(
            "mean_b", F.col("smw").cast("double") / F.col("sw").cast("double")
        )
    )
    w_rank = Window.partitionBy(group_col).orderBy(F.col("mean_b").asc(), F.col("b").asc())
    w_all = Window.partitionBy(group_col)
    ranked = per_rep.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "nb", F.count("*").over(w_all)
    )
    lo_idx = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("nb").cast("double") * F.lit(alpha)).cast("long"),
    )
    hi_idx = F.ceil(F.col("nb").cast("double") * F.lit(1.0 - alpha)).cast("long")
    cis = ranked.groupBy(group_col).agg(
        (
            F.max(F.when(F.col("rn") == lo_idx, F.col("mean_b")))
            / F.lit(float(micro))
        ).alias("ci_lo"),
        (
            F.max(F.when(F.col("rn") == hi_idx, F.col("mean_b")))
            / F.lit(float(micro))
        ).alias("ci_hi"),
        F.max("nb").alias("n_replicas_used"),
    )

    point = base.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        (
            (F.sum("mv").cast("double") / F.count("*").cast("double"))
            / F.lit(float(micro))
        ).alias("mean_value"),
    )
    return point.join(cis, group_col, "left").select(
        group_col, "n_rows", "mean_value", "ci_lo", "ci_hi", "n_replicas_used"
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (DDSketch-shaped, integer-exact)
# ---------------------------------------------------------------------------

def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    sub_bits: int = 5,
) -> DataFrame:
    """Mergeable quantile sketch frame — the 100 TB percentile answer
    (exact grid percentiles need a global rank pass; this needs one
    map-side-combined aggregation).

    DDSketch-shaped (Masson et al., VLDB'19) but on an exact INTEGER
    grid so both engines reproduce it bit-for-bit: a value keeps its
    sign and its top (sub_bits+1) significant bits; the rest zero out.
    bucket_lb = sign * (|v| - |v| mod 2^max(bitlen(|v|)-1-sub_bits, 0))
    is monotone in v, values under 2^(sub_bits+1) are EXACT, and the
    relative error toward zero is < 2^-sub_bits.  The sketch is the
    (group, bucket_lb, cnt) frame itself:

    - bounded: <= ~63 * 2^sub_bits buckets per group regardless of rows;
    - a MONOID: merge = unionByName + re-aggregate (quantile_sketch_merge)
      — per-source / per-day sketches roll up without touching raw rows;
    - skew-free: one groupBy with partial aggregation, no windows, no
      joins; a hot group collapses map-side like any grouped count.

    Input must be integer-valued (cast upstream to cents/micros — the
    money convention everywhere in this repo).  NULLs are dropped."""
    v = F.col(value_col).cast("long")
    a = F.abs(v)
    shift = F.greatest(
        F.length(F.bin(a)) - F.lit(1 + sub_bits), F.lit(0)
    ).cast("int")
    base = df.filter(v.isNotNull()).select(
        *group_cols,
        v.alias("__v"),
        a.alias("__a"),
        shift.alias("__shift"),
    )
    lb = F.col("__a") - F.col("__a") % F.expr(
        "shiftleft(CAST(1 AS BIGINT), __shift)"
    )
    signed_lb = F.when(F.col("__v") < 0, -lb).otherwise(lb)
    return (
        base.select(*group_cols, signed_lb.cast("long").alias("bucket_lb"))
        .groupBy(*group_cols, "bucket_lb")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def quantile_sketch_merge(
    sketches: Sequence[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Monoid merge: counts add per (group, bucket).  Associative and
    commutative by construction, so per-partition / per-source / per-day
    sketches combine in any order and any tree shape."""
    from functools import reduce

    merged = reduce(lambda x, y: x.unionByName(y), sketches)
    return merged.groupBy(*group_cols, "bucket_lb").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def quantiles_from_sketch(
    sketch: DataFrame,
    quantiles: Sequence[tuple[int, int, str]] = (
        (1, 2, "p50"),
        (9, 10, "p90"),
        (99, 100, "p99"),
    ),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Quantile estimates from a sketch frame: per group, the smallest
    bucket_lb whose cumulative count reaches rank ceil(q*N) (1-based,
    lower-bound representative — the estimate is exact for values under
    2^(sub_bits+1) and within 2^-sub_bits relative error otherwise).

    Quantiles are RATIONALS (num, den, label): the rank target is
    (num*N + den - 1) div den — integer end-to-end, no float quantile
    interpolation to diverge between engines.  The cumulative window is
    bucket-grain (sketch cardinality, never row cardinality) and is
    checkpointed once for all quantile legs."""
    n = sketch.groupBy(*group_cols).agg(F.sum("cnt").cast("long").alias("__n"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket_lb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        sketch.withColumn("__cum", F.sum("cnt").over(w))
        .join(n, list(group_cols)) if group_cols
        else sketch.withColumn("__cum", F.sum("cnt").over(w)).crossJoin(F.broadcast(n))
    )
    cum = cum.localCheckpoint(eager=True)  # one layout for every leg
    legs = []
    for num, den, label in quantiles:
        target = F.expr(f"(CAST({num} AS BIGINT) * __n + {den - 1}) div {den}")
        legs.append(
            cum.filter(F.col("__cum") >= target)
            .groupBy(*group_cols, "__n")
            .agg(F.min("bucket_lb").alias("est"))
            .select(
                *group_cols,
                F.lit(label).alias("quantile"),
                F.col("est").cast("long").alias("est"),
                F.col("__n").alias("n_rows"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# ---------------------------------------------------------------------------
# Deterministic bottom-k sample sketch (mergeable uniform group sample)
# ---------------------------------------------------------------------------

def bottomk_sample(
    df: DataFrame,
    id_col: str,
    group_cols: Sequence[str] = (),
    k: int = 5,
    n_salts: int = 64,
    salt: str = "bk1",
) -> DataFrame:
    """Bottom-k sampling (Cohen & Kaplan's mergeable uniform-sample
    sketch): per group, the k DISTINCT ids with the smallest sha-derived
    draw keys.  Because the draw key is a pure function of the id, the
    sample is (a) deterministic across runs and engines, (b) invariant
    to row duplication (members, not rows, are sampled), and (c) a
    MONOID — the bottom-k of a union is the bottom-k of the union of
    per-part bottom-ks, so per-partition / per-day samples merge without
    seeing raw data again (bottomk_sample_merge).

    Skew discipline: the per-group rank runs in TWO phases — first a
    row_number inside (group, draw_key mod n_salts) so a hot group's
    members spread over n_salts partitions (any global bottom-k member
    is necessarily in its salt's bottom-k), then the final rank over the
    <= n_salts*k survivors per group.  No unbounded group ever meets a
    single window task.

    Output: (group..., id, draw_rank) with draw_rank in 1..k."""
    ids = (
        df.select(*group_cols, id_col)
        .filter(F.col(id_col).isNotNull())
        .distinct()
    )
    for g in group_cols:
        ids = ids.filter(F.col(g).isNotNull())
    keyed = ids.withColumn("__dk", _bottomk_draw_key(id_col, salt))
    w1 = Window.partitionBy(
        *group_cols, F.pmod(F.col("__dk"), F.lit(n_salts))
    ).orderBy("__dk", id_col)
    cand = (
        keyed.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("__dk", id_col)
    return (
        cand.withColumn("draw_rank", F.row_number().over(w2))
        .filter(F.col("draw_rank") <= k)
        .select(*group_cols, id_col, F.col("draw_rank").cast("long").alias("draw_rank"))
    )


def bottomk_sample_merge(
    samples: Sequence[DataFrame],
    id_col: str,
    group_cols: Sequence[str] = (),
    k: int = 5,
    salt: str = "bk1",
) -> DataFrame:
    """Monoid merge: union the per-part samples (each already <= k per
    group), recompute the deterministic draw keys, and re-take the
    bottom k.  Inputs are sample-sized, so the re-rank window is bounded
    by parts*k rows per group."""
    from functools import reduce

    merged = reduce(
        lambda x, y: x.unionByName(y),
        [s.select(*group_cols, id_col) for s in samples],
    ).distinct()
    return bottomk_sample(
        merged, id_col, group_cols=group_cols, k=k, n_salts=1, salt=salt
    )


def _bottomk_draw_key(id_col: str, salt: str):
    """The bottom-k family's deterministic 60-bit draw key (uniform on
    [0, 2^60) via 15 sha256 hex chars) — pure function of the id, shared
    by bottomk_sample and the KMV estimators so sketches and estimates
    can never disagree on a member's key."""
    return F.conv(
        F.substring(
            F.sha2(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")), 256),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def kmv_distinct_estimate(
    df: DataFrame,
    id_col: str,
    group_cols: Sequence[str] = (),
    k: int = 64,
    n_salts: int = 64,
    salt: str = "bk1",
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimate per group — the
    theta-sketch read of the bottom-k sample: n_hat = (k-1) * 2^60 //
    v_k, where v_k is the k-th smallest draw key (Bar-Yossef et al.
    2002; relative stderr ~ 1/sqrt(k-2)).  Groups with fewer than k
    distinct members hold ALL of them, so the estimate is their EXACT
    count.  Deterministic end-to-end (sha keys, exact 128-bit integer
    division), hence fully oracle-checkable — unlike HLL++, whose
    register layout is engine-internal.  Mergeable for free: the union
    sketch is the bottom-k of unioned samples (bottomk_sample_merge).

    Output: (group..., n_sketch, est_distinct)."""
    sample = bottomk_sample(
        df, id_col, group_cols=group_cols, k=k, n_salts=n_salts, salt=salt
    )
    agg = sample.withColumn("__dk", _bottomk_draw_key(id_col, salt)).groupBy(
        *group_cols
    ).agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.max("__dk").alias("__vk"),  # ranks order by dk: max == k-th smallest
    )
    kmv = F.expr(
        f"CAST(CAST({k - 1} AS DECIMAL(38,0))"
        f" * CAST(1152921504606846976 AS DECIMAL(38,0))"  # 2^60
        f" div CAST(greatest(__vk, 1) AS DECIMAL(38,0)) AS BIGINT)"
    )
    return agg.select(
        *group_cols,
        "n_sketch",
        F.when(F.col("n_sketch") < k, F.col("n_sketch")).otherwise(kmv).alias(
            "est_distinct"
        ),
    )


def kmv_group_overlap(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int = 64,
    n_salts: int = 64,
    salt: str = "bk1",
) -> DataFrame:
    """Pairwise set-overlap estimates between groups' member sets from
    their bottom-k sketches alone (never the raw sets) — the
    theta-sketch intersection read: for each unordered group pair, the
    k smallest keys of the SKETCH UNION are scanned for membership in
    both sides; jaccard_hat = n_shared / k_union on the micro grid and
    inter_hat = jaccard_hat * union_distinct_hat (KMV estimate on the
    union sketch).  Every frame after the sketches is sketch-grain
    (pairs x k rows), so cost is independent of corpus size.

    Output: (group_a, group_b, k_union, n_shared, jaccard_micro,
    est_union, est_inter) for group_a < group_b."""
    sample = bottomk_sample(
        df, id_col, group_cols=(group_col,), k=k, n_salts=n_salts, salt=salt
    ).withColumn("__dk", _bottomk_draw_key(id_col, salt))
    groups = sample.select(F.col(group_col).alias("g")).distinct()
    gp = (
        groups.alias("x")
        .join(groups.alias("y"), F.col("x.g") < F.col("y.g"))
        .select(F.col("x.g").alias("group_a"), F.col("y.g").alias("group_b"))
    )
    mem_a = sample.select(
        F.col(group_col).alias("group_a"), F.col(id_col).alias("__id"), "__dk"
    )
    mem_b = sample.select(
        F.col(group_col).alias("group_b"), F.col(id_col).alias("__id"), "__dk"
    )
    uni = (
        gp.join(mem_a, "group_a")
        .select("group_a", "group_b", "__id", "__dk")
        .unionByName(
            gp.join(mem_b, "group_b").select("group_a", "group_b", "__id", "__dk")
        )
        .distinct()
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("__dk", "__id")
    topk = uni.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k)
    flagged = topk.join(
        sample.select(
            F.col(group_col).alias("group_a"),
            F.col(id_col).alias("__id"),
            F.lit(1).alias("__in_a"),
        ),
        ["group_a", "__id"],
        "left",
    ).join(
        sample.select(
            F.col(group_col).alias("group_b"),
            F.col(id_col).alias("__id"),
            F.lit(1).alias("__in_b"),
        ),
        ["group_b", "__id"],
        "left",
    )
    stats = flagged.groupBy("group_a", "group_b").agg(
        F.count("*").cast("long").alias("k_union"),
        F.sum(
            F.when((F.col("__in_a") == 1) & (F.col("__in_b") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_shared"),
        F.max("__dk").alias("__vk"),
    )
    est_union = F.expr(
        "CAST(CAST(k_union - 1 AS DECIMAL(38,0))"
        " * CAST(1152921504606846976 AS DECIMAL(38,0))"
        " div CAST(greatest(__vk, 1) AS DECIMAL(38,0)) AS BIGINT)"
    )
    return (
        stats.select(
            "group_a",
            "group_b",
            "k_union",
            "n_shared",
            F.floor(F.col("n_shared") * F.lit(1_000_000) / F.col("k_union"))
            .cast("long")
            .alias("jaccard_micro"),
            F.when(F.col("k_union") < k, F.col("k_union"))
            .otherwise(est_union)
            .alias("est_union"),
        )
        .withColumn(
            # decimal path: jaccard_micro * est_union can pass 2^53 at
            # web-scale distinct counts, where the double product would
            # silently lose exactness
            "est_inter",
            F.expr(
                "CAST(CAST(jaccard_micro AS DECIMAL(38,0))"
                " * CAST(est_union AS DECIMAL(38,0))"
                " div CAST(1000000 AS DECIMAL(38,0)) AS BIGINT)"
            ),
        )
    )

"""Property-based checks (hypothesis) for operators/stats.py: each
property drives the distributed implementation with random inputs and
compares against a naive single-machine reference that replicates the
exact-integer arithmetic.  max_examples kept tiny — randomized
structure, not volume (one Spark job per example)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

GROUPED_VALUES = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=4,
    max_size=30,
)


def _snap(x: float) -> int:
    return math.floor(x * 1e6 + 0.5)


@settings(max_examples=8, deadline=None)
@given(rows=GROUPED_VALUES)
def test_ks_matches_naive_ecdf(spark, rows):
    from wellmeet_data_pipeline_spark.operators.stats import ks_drift_by_group

    groups = {g for g, _ in rows}
    if len(groups) < 2:
        rows = rows + [("zz", 99)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r["ks_micro"] for r in ks_drift_by_group(df, "g", "v").collect()}
    grid = sorted({v for _, v in rows})
    for g in {x for x, _ in rows}:
        mine = sorted(v for x, v in rows if x == g)
        rest = sorted(v for x, v in rows if x != g)
        if not rest:
            continue
        dev = max(
            abs(
                sum(1 for v in mine if v <= t) * len(rest)
                - sum(1 for v in rest if v <= t) * len(mine)
            )
            for t in grid
        )
        assert got[g] == _snap(dev / (len(mine) * len(rest)))


@settings(max_examples=8, deadline=None)
@given(rows=GROUPED_VALUES)
def test_mann_whitney_u2_matches_naive(spark, rows):
    from wellmeet_data_pipeline_spark.operators.stats import mann_whitney_by_group

    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r["u2"] for r in mann_whitney_by_group(df, "g", "v").collect()}
    for g in {x for x, _ in rows}:
        mine = [v for x, v in rows if x == g]
        rest = [v for x, v in rows if x != g]
        # 2U = #wins*2 + #ties (each pairwise comparison doubled)
        u2 = sum(
            2 * (a > b) + (a == b) for a in mine for b in rest
        )
        assert got[g] == u2


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=4,
        max_size=25,
    )
)
def test_gini_matches_naive_and_bounds(spark, rows):
    from wellmeet_data_pipeline_spark.operators.stats import gini_by_group

    rows_id = [(g, i, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(rows_id, "g string, id long, x long")
    got = {r["g"]: r for r in gini_by_group(df, "g", "id", F.col("x")).collect()}
    for g in {x for x, _ in rows}:
        xs = sorted(v for x, v in rows if x == g)
        n, sx = len(xs), sum(xs)
        if sx == 0:
            assert got[g]["gini_micro"] is None
            continue
        srx = sum((i + 1) * v for i, v in enumerate(xs))
        expect = _snap((2 * srx - (n + 1) * sx) / (n * sx))
        assert got[g]["gini_micro"] == expect
        assert 0 <= got[g]["gini_micro"] < 1_000_000


@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=3,
        max_size=25,
    )
)
def test_spearman_matches_naive_average_ranks(spark, pairs):
    from wellmeet_data_pipeline_spark.operators.stats import spearman_rho

    df = spark.createDataFrame(pairs, "a long, b long")
    got = spearman_rho(df, "a", "b").collect()[0]["rho_micro"]

    def avg_ranks(vals):
        s = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(s):
            j = i
            while j < len(s) and vals[s[j]] == vals[s[i]]:
                j += 1
            r = (i + 1 + j) / 2
            for k in range(i, j):
                ranks[s[k]] = r
            i = j
        return ranks

    ra = avg_ranks([a for a, _ in pairs])
    rb = avg_ranks([b for _, b in pairs])
    n = len(pairs)
    sa, sb = sum(ra), sum(rb)
    num = n * sum(x * y for x, y in zip(ra, rb)) - sa * sb
    den = math.sqrt(
        (n * sum(x * x for x in ra) - sa * sa)
        * (n * sum(y * y for y in rb) - sb * sb)
    )
    if den == 0:
        assert got is None
    else:
        assert got == _snap(num / den)
        assert -1_000_000 <= got <= 1_000_000


@settings(max_examples=6, deadline=None)
@given(
    durs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.booleans(),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_kaplan_meier_matches_naive(spark, durs):
    from wellmeet_data_pipeline_spark.operators.stats import kaplan_meier

    rows = [(t, int(o)) for t, o in durs]
    df = spark.createDataFrame(rows, "t long, obs long")
    got = {r["t"]: r for r in kaplan_meier(df, "t", "obs").collect()}

    times = sorted({t for t, o in rows if o})
    cum_l = 0
    for t in times:
        d = sum(1 for tt, o in rows if tt == t and o)
        n_risk = sum(1 for tt, _ in rows if tt >= t)
        assert got[t]["n_risk"] == n_risk and got[t]["d_events"] == d
        if d == n_risk:
            assert got[t]["surv_micro"] == 0
            assert got[t]["surv_log_micro"] is None
        else:
            cum_l += math.floor(math.log((n_risk - d) / n_risk) * 1e6 + 0.5)
            assert got[t]["surv_log_micro"] == cum_l
            assert got[t]["surv_micro"] == math.floor(
                math.exp(cum_l / 1e6) * 1e6 + 0.5
            )
    assert set(got) == set(times)

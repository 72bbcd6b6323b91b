"""Property-based checks (hypothesis) for the round-5 operators: each
property drives the distributed implementation with random inputs and
compares against a naive single-machine reference.  One Spark job per
example set (max_examples kept tiny — the point is randomized structure,
not volume)."""

from __future__ import annotations

import itertools

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.dedup import cdc_apply_latest
from wellmeet_data_pipeline_spark.operators.joins import interval_overlap_join
from wellmeet_data_pipeline_spark.operators.scoring import exact_auc
from wellmeet_data_pipeline_spark.operators.windows import rolling_distinct_active

INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=500),    # start
        st.integers(min_value=0, max_value=200),    # length
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(left=INTERVALS, right=INTERVALS, width=st.sampled_from([7, 50, 100_000]))
def test_interval_overlap_matches_naive_all_pairs(spark, left, right, width):
    l_rows = [(k, s, s + ln, i) for i, (k, s, ln) in enumerate(left)]
    r_rows = [(k, s, s + ln, i) for i, (k, s, ln) in enumerate(right)]
    ldf = spark.createDataFrame(l_rows, ["k", "start_us", "end_us", "tag"])
    rdf = spark.createDataFrame(r_rows, ["k", "start_us", "end_us", "tag"])
    got = {
        (r["l_tag"], r["r_tag"])
        for r in interval_overlap_join(
            ldf, rdf, key="k", bucket_width_us=width
        ).collect()
    }
    want = {
        (lt, rt)
        for (lk, ls, le, lt), (rk, rs, re_, rt) in itertools.product(l_rows, r_rows)
        if lk == rk and ls <= re_ and rs <= le
    }
    assert got == want


EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # user
        st.integers(min_value=0, max_value=20),   # day offset
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(events=EVENTS, window=st.sampled_from([1, 3, 7]))
def test_rolling_distinct_matches_naive(spark, events, window):
    import datetime

    base = datetime.date(2024, 5, 1)
    rows = [
        (datetime.datetime(2024, 5, 1 + d, 12, 0, 0), u) for u, d in events
    ]
    df = spark.createDataFrame(rows, ["ts", "user_id"])
    got = {
        str(r["as_of_day"]): r["n_active"]
        for r in rolling_distinct_active(df, window_days=window).collect()
    }
    days = sorted({d for _, d in events})
    want = {}
    for d in days:
        active = {u for u, du in events if d - window + 1 <= du <= d}
        want[str(base + datetime.timedelta(days=d))] = len(active)
    assert got == want


CHANGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),            # key
        st.integers(min_value=0, max_value=30),           # ts
        st.sampled_from(["I", "U", "D"]),                 # op
        st.integers(min_value=0, max_value=99),           # value
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(changes=CHANGES)
def test_cdc_apply_matches_naive_replay(spark, changes):
    rows = [(k, ts, seq, op, v) for seq, (k, ts, op, v) in enumerate(changes)]
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "op", "v"])
    got = {
        r["k"]: (r["op"], r["v"])
        for r in cdc_apply_latest(df, ["k"], ["ts", "seq"], "op", "D").collect()
    }
    want = {}
    for k, ts, seq, op, v in sorted(rows, key=lambda r: (r[1], r[2])):
        want[k] = (op, v)
    want = {k: ov for k, ov in want.items() if ov[0] != "D"}
    assert got == want


SCORES = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),  # score
        st.booleans(),                           # label
    ),
    min_size=2,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(scored=SCORES)
def test_exact_auc_matches_pair_counting(spark, scored):
    pos = [s for s, y in scored if y]
    neg = [s for s, y in scored if not y]
    if not pos or not neg:
        return  # AUC undefined; operator would divide by zero by contract
    df = spark.createDataFrame(
        [(s, int(y)) for s, y in scored], ["score", "y"]
    )
    got = exact_auc(df, "score", "y").collect()[0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert abs(got["auc"] - round(want, 6)) < 1e-9

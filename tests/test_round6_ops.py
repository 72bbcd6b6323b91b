"""Round-6 operators: l-diversity audit, trimmed mean by group."""

from __future__ import annotations

import pytest

from wellmeet_data_pipeline_spark.operators.aggregations import trimmed_mean_by_group
from wellmeet_data_pipeline_spark.operators.projections import l_diversity_audit


def test_l_diversity_flags_homogeneous_groups(spark):
    rows = [
        # group A: 3 rows, all the same sensitive value -> flagged (l=2)
        ("A", 1, 10), ("A", 1, 10), ("A", 1, 10),
        # group B: 2 distinct sensitive values -> clean at l=2
        ("B", 1, 10), ("B", 1, 20),
        # group C: sensitive NULL everywhere -> 0 distinct -> flagged
        ("C", 2, None), ("C", 2, None),
    ]
    df = spark.createDataFrame(rows, "seg string, nat int, sens int")
    got = {
        (r.seg, r.nat): (r.group_size, r.distinct_sensitive)
        for r in l_diversity_audit(df, ["seg", "nat"], "sens", l=2).collect()
    }
    assert got == {("A", 1): (3, 1), ("C", 2): (2, 0)}


def test_trimmed_mean_hand_computed(spark):
    # 10 rows: trim floor(10*0.1)=1 from each end of [0..8, 100]
    vals = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0]
    df = spark.createDataFrame([("t", v) for v in vals], "g string, v double")
    r = trimmed_mean_by_group(df, "g", "v", trim_frac=0.1).collect()[0]
    # kept: 1..8 -> mean 4.5; the 100.0 outlier is gone
    assert (r.n_rows, r.n_kept) == (10, 8)
    assert r.trimmed_mean == pytest.approx(4.5, abs=0)


def test_trimmed_mean_boundary_ties_deterministic(spark):
    # 10 rows with ties AT the trim boundary: values [1,1,1,5,5,5,5,9,9,9]
    # lo = 1 -> drop one 1 and one 9; kept sum = 2*1 + 4*5 + 2*9 = 40 / 8
    vals = [1.0] * 3 + [5.0] * 4 + [9.0] * 3
    df = spark.createDataFrame([("t", v) for v in vals], "g string, v double")
    r = trimmed_mean_by_group(df, "g", "v", trim_frac=0.1).collect()[0]
    assert (r.n_rows, r.n_kept) == (10, 8)
    assert r.trimmed_mean == pytest.approx(5.0, abs=0)


def test_trimmed_mean_nulls_and_small_groups(spark):
    rows = [("a", 7.0), ("a", None), ("b", None), ("c", -3.5)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.g: r for r in trimmed_mean_by_group(df, "g", "v").collect()}
    # NULL rows excluded; all-NULL group absent; n=1 -> lo=0 -> identity
    assert set(got) == {"a", "c"}
    assert got["a"].n_rows == 1 and got["a"].trimmed_mean == 7.0
    assert got["c"].trimmed_mean == pytest.approx(-3.5, abs=0)


def test_trimmed_mean_matches_numpy_reference(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vals = np.round(rng.normal(50, 20, 200), 3)
    df = spark.createDataFrame(
        [("x", float(v)) for v in vals], "g string, v double"
    )
    r = trimmed_mean_by_group(df, "g", "v", trim_frac=0.1).collect()[0]
    s = np.sort(vals)
    lo = int(np.floor(len(s) * 0.1))
    want = float(np.mean(np.floor(s[lo: len(s) - lo] * 1e6 + 0.5) / 1e6))
    assert r.n_kept == len(s) - 2 * lo
    assert r.trimmed_mean == pytest.approx(want, rel=1e-12)


def _py_bootstrap(rows, n_replicas=8, ci=0.95, salt="bb", micro=10**6):
    """Independent reference for bootstrap_mean_ci on (group, id, value)."""
    import hashlib
    import math

    from wellmeet_data_pipeline_spark.operators.aggregations import POISSON1_CDF

    alpha = (1.0 - ci) / 2.0
    by_g = {}
    for g, i, v in rows:
        if v is None or i is None:
            continue
        by_g.setdefault(g, []).append((i, math.floor(v * micro + 0.5)))
    out = {}
    for g, items in by_g.items():
        means = []
        for b in range(n_replicas):
            smw = sw = 0
            for i, mv in items:
                hx = hashlib.sha256(f"{salt}|{i}|{b // 8}".encode()).hexdigest()
                o = 8 * (b % 8)
                u = (int(hx[o:o + 8], 16) + 1.0) / 4294967296.0
                w = 6
                for k, t in enumerate(POISSON1_CDF):
                    if u < t:
                        w = k
                        break
                smw += w * mv
                sw += w
            if sw > 0:
                means.append((smw / sw, b))
        means.sort()
        nb = len(means)
        lo = max(1, math.ceil(nb * alpha))
        hi = math.ceil(nb * (1.0 - alpha))
        out[g] = (
            len(items),
            sum(mv for _, mv in items) / len(items) / micro,
            means[lo - 1][0] / micro,
            means[hi - 1][0] / micro,
            nb,
        )
    return out


def test_bootstrap_ci_matches_pure_python(spark):
    from wellmeet_data_pipeline_spark.operators.aggregations import bootstrap_mean_ci

    rows = [("a", i, float(i % 13) + 0.25) for i in range(60)] + [
        ("b", 100 + i, 5.0) for i in range(5)
    ] + [("a", 999, None), ("c", None, 1.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        r.g: (r.n_rows, r.mean_value, r.ci_lo, r.ci_hi, r.n_replicas_used)
        for r in bootstrap_mean_ci(df, "g", "v", "id", n_replicas=8).collect()
    }
    want = _py_bootstrap(rows, n_replicas=8)
    assert set(got) == set(want)  # NULL-id group 'c' has no valid rows -> absent
    for g in want:
        assert got[g] == pytest.approx(want[g], rel=1e-12), g


def test_bootstrap_ci_brackets_mean_and_validates(spark):
    from wellmeet_data_pipeline_spark.operators.aggregations import bootstrap_mean_ci

    rows = [("t", i, 10.0 + (i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    r = bootstrap_mean_ci(df, "g", "v", "id", n_replicas=40).collect()[0]
    assert r.ci_lo <= r.mean_value <= r.ci_hi
    assert r.n_replicas_used == 40
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "g", "v", "id", ci=1.5)

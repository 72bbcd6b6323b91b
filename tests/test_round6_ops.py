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


# ---------------------------------------------------------------------------
# fuzzy_link_edit1 — deletion-neighborhood split-block record linkage
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _link(spark, dirty_rows, clean_rows):
    from wellmeet_data_pipeline_spark.operators.linkage import fuzzy_link_edit1

    d = spark.createDataFrame(dirty_rows, "record_id long, record_name string")
    c = spark.createDataFrame(clean_rows, "entity_id long, entity_name string")
    return sorted(
        (r.record_id, r.entity_id, r.edit_dist)
        for r in fuzzy_link_edit1(d, c).collect()
    )


def test_fuzzy_link_covers_every_deletion_position(spark):
    # the pigeonhole claim: EVERY single-deletion of a clean name must be
    # found, whichever half the deleted character sat in
    name = "abcdef"
    dirty = [(p, name[:p] + name[p + 1 :]) for p in range(len(name))]
    clean = [(100, name), (200, "uvwxyz")]  # decoy shares no block key
    got = _link(spark, dirty, clean)
    assert got == [(p, 100, 1) for p in range(len(name))]


def test_fuzzy_link_rejects_distance_two(spark):
    # two deletions away -> blocked candidates may appear, verify must kill
    assert _link(spark, [(1, "abdf")], [(100, "abcdef")]) == []


def test_fuzzy_link_empty_and_short_strings(spark):
    # "" links to every single-char entity; "x" links to "xy" and "zx"
    got = _link(spark, [(1, ""), (2, "x")], [(10, "a"), (11, "b"), (12, "xy"), (13, "zx")])
    assert got == [(1, 10, 1), (1, 11, 1), (2, 12, 1), (2, 13, 1)]


def test_fuzzy_link_matches_brute_force(spark):
    import hashlib

    clean = [
        (i, hashlib.sha256(str(i).encode()).hexdigest()[: 8 + i % 5])
        for i in range(40)
    ]
    dirty = [
        (i, n[: i % len(n)] + n[i % len(n) + 1 :]) for i, n in clean if i % 2 == 0
    ]
    want = sorted(
        (di, ci, 1)
        for di, dn in dirty
        for ci, cn in clean
        if len(cn) == len(dn) + 1 and _lev(dn, cn) == 1
    )
    assert _link(spark, dirty, clean) == want


# ---------------------------------------------------------------------------
# js_divergence_by_group — per-source drift vs the corpus blend
# ---------------------------------------------------------------------------


def _js_reference(groups: dict[str, list[str]]) -> dict[str, float]:
    """Exact JS(P_s || P_global) per group, plain floats."""
    import math
    from collections import Counter

    per = {g: Counter(t for txt in docs for t in txt.split()) for g, docs in groups.items()}
    glob = Counter()
    for c in per.values():
        glob.update(c)
    B = sum(glob.values())
    out = {}
    for g, c in per.items():
        A = sum(c.values())
        kl_s = sum((a / A) * math.log((a / A) / (0.5 * (a / A + glob[t] / B))) for t, a in c.items())
        kl_g = sum(
            (b / B) * math.log((b / B) / (0.5 * (c.get(t, 0) / A + b / B)))
            for t, b in glob.items()
        )
        out[g] = 0.5 * (kl_s + kl_g)
    return out


def test_js_zero_when_sources_identical(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import js_divergence_by_group

    rows = [(g, "alpha beta beta gamma") for g in ("s1", "s2") for _ in range(3)]
    df = spark.createDataFrame(rows, "source string, text string")
    got = js_divergence_by_group(df).collect()
    assert {r.source for r in got} == {"s1", "s2"}
    assert all(r.js_micro_nats == 0 for r in got)
    assert all(r.n_tokens == 12 and r.n_terms == 3 for r in got)


def test_js_matches_exact_reference(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import js_divergence_by_group

    groups = {
        "web": ["the cat sat", "the dog ran fast", "cat and dog"],
        "code": ["def foo return", "class bar def init", "return return foo"],
        "mixed": ["the def cat return", "dog class and"],
    }
    rows = [(g, t) for g, docs in groups.items() for t in docs]
    df = spark.createDataFrame(rows, "source string, text string")
    want = _js_reference(groups)
    got = {r.source: r.js_divergence for r in js_divergence_by_group(df).collect()}
    assert got.keys() == want.keys()
    for g in want:
        # micro-nat snapping error: <= 0.5e-6 per weighted leg + final snap
        assert abs(got[g] - want[g]) < 5e-6, g


def test_js_ignores_null_source_and_null_text(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import js_divergence_by_group

    rows = [
        ("s1", "alpha beta"),
        ("s1", None),
        (None, "should not count"),
        ("s2", "alpha beta"),
        ("s2", ""),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r.source: r for r in js_divergence_by_group(df).collect()}
    assert set(got) == {"s1", "s2"}
    assert got["s1"].n_tokens == 2 and got["s2"].n_tokens == 2
    assert got["s1"].js_micro_nats == 0 and got["s2"].js_micro_nats == 0


# ---------------------------------------------------------------------------
# triangle_counts — clustering read on the dup candidate graph
# ---------------------------------------------------------------------------


def test_triangle_counts_k4_plus_pendant(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import triangle_counts

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(k4, "id_a long, id_b long")
    got = {r.node: (r.degree, r.n_triangles) for r in triangle_counts(df).collect()}
    # every K4 node sits in C(3,2)=3 triangles; the pendant in none
    assert got == {1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (4, 3), 5: (1, 0)}


def test_triangle_counts_square_has_none(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import triangle_counts

    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(square, "id_a long, id_b long")
    got = triangle_counts(df).collect()
    assert all(r.n_triangles == 0 for r in got)
    assert {r.node: r.degree for r in got} == {1: 2, 2: 2, 3: 2, 4: 2}


def test_triangle_counts_matches_brute_force(spark):
    from itertools import combinations

    from wellmeet_data_pipeline_spark.operators.dedup import triangle_counts

    # deterministic pseudo-random graph on 12 nodes
    edges = sorted(
        {(a, b) for a, b in combinations(range(12), 2) if (a * 7 + b * 13) % 3 == 0}
    )
    es = set(edges)
    tri_per_node = {n: 0 for n in range(12)}
    for a, b, c in combinations(range(12), 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                tri_per_node[n] += 1
    deg = {n: sum(1 for e in edges if n in e) for n in range(12)}
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: (r.degree, r.n_triangles) for r in triangle_counts(df).collect()}
    want = {n: (deg[n], tri_per_node[n]) for n in range(12) if deg[n] > 0}
    assert got == want


# ---------------------------------------------------------------------------
# vocab_overlap_pairs
# ---------------------------------------------------------------------------


def test_vocab_overlap_hand_computed(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import vocab_overlap_pairs

    rows = [
        ("a", "cat dog fish"),
        ("a", "dog bird"),          # vocab a = {cat, dog, fish, bird}
        ("b", "dog fish lizard"),   # vocab b = {dog, fish, lizard}
        ("c", "quartz"),            # vocab c disjoint
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.source_a, r.source_b): (r.n_terms_a, r.n_terms_b, r.n_shared, r.jaccard_micro)
        for r in vocab_overlap_pairs(df).collect()
    }
    # a∩b = {dog, fish} -> J = 2/5; pairs sharing NOTHING emit no row
    # (the pair frame comes from the term join — never a groups^2 cross)
    assert got == {("a", "b"): (4, 3, 2, 400000)}


def test_vocab_overlap_identical_sources_full_jaccard(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import vocab_overlap_pairs

    rows = [("x", "same words here"), ("y", "here same words")]
    df = spark.createDataFrame(rows, "source string, text string")
    r = vocab_overlap_pairs(df).collect()[0]
    assert (r.n_shared, r.jaccard_micro, r.jaccard) == (3, 1000000, 1.0)


def test_triangle_counts_normalizes_unordered_edges(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import triangle_counts

    # same triangle given in mixed orientation + a duplicate + a self-loop
    edges = [(5, 3), (3, 4), (4, 5), (4, 3), (7, 7)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: (r.degree, r.n_triangles) for r in triangle_counts(df).collect()}
    assert got == {3: (2, 1), 4: (2, 1), 5: (2, 1)}


def test_ngram_containment_catches_subset_docs_jaccard_misses(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    chunk = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [
        (1, chunk),                      # short doc
        (2, chunk + " " + filler),       # the same chunk embedded in a long doc
        (3, "totally different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r.id_a, r.id_b): (r.containment_a_in_b, r.containment_b_in_a)
        for r in ngram_containment_pairs(df, threshold=0.9).collect()
    }
    # every shingle of doc 1 appears in doc 2 -> containment(1 in 2) = 1.0
    assert set(cont) == {(1, 2)}
    assert cont[(1, 2)][0] == 1.0 and cont[(1, 2)][1] < 0.1
    # symmetric Jaccard never fires at any usable threshold
    assert ngram_jaccard_pairs(df, threshold=0.15).count() == 0


def test_ngram_containment_direction_and_threshold(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import ngram_containment_pairs

    rows = [
        (10, "a b c d e f"),      # 4 3-shingles
        (20, "a b c d x y z"),    # shares 'a b c' and 'b c d' -> inter=2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = ngram_containment_pairs(df, threshold=0.5).collect()
    assert len(r) == 1 and r[0].inter == 2 and r[0].n_a == 4 and r[0].n_b == 5
    assert r[0].containment_a_in_b == 0.5 and r[0].containment_b_in_a == 0.4
    # raising the threshold above both directions drops the pair
    assert ngram_containment_pairs(df, threshold=0.6).count() == 0


def test_vocab_growth_curve_hand_computed(spark):
    from wellmeet_data_pipeline_spark.operators.corpus import vocab_growth_curve

    # 4 docs into 2 buckets (2 docs each, doc_id order)
    rows = [
        (1, "a b a"),        # terms {a,b}, 3 tokens
        (2, "b c"),          # new term c
        (3, None),           # null text: counts as a doc, 0 tokens
        (4, "c d d"),        # new term d
        (None, "ignored"),   # null id excluded entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.bucket: (r.n_docs_cum, r.n_tokens_cum, r.n_terms_cum)
        for r in vocab_growth_curve(df, n_buckets=2).collect()
    }
    assert got == {1: (2, 5, 3), 2: (4, 8, 4)}


def test_vocab_growth_curve_monotone_on_real_docs(spark):
    from wellmeet_data_pipeline_spark.operators.corpus import vocab_growth_curve
    from wellmeet_data_pipeline_spark.plans.queries import table

    d = table(spark, "/root/testdata/sf0.001", "documents")
    rows = sorted(
        (r.bucket, r.n_docs_cum, r.n_tokens_cum, r.n_terms_cum)
        for r in vocab_growth_curve(d).collect()
    )
    assert [b for b, *_ in rows] == list(range(1, 11))
    for (b1, d1, t1, v1), (b2, d2, t2, v2) in zip(rows, rows[1:]):
        assert d2 > d1 and t2 >= t1 and v2 >= v1
    # distinct terms never exceed tokens seen
    assert all(v <= t for _, _, t, v in rows)


def test_dedup_audit_summary_invariants(spark):
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    r = REGISTRY["dedup_audit_summary"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert 0 < r.n_exact_unique <= r.n_docs
    assert 0 <= r.n_contained <= r.n_docs
    assert 0 <= r.n_lsh_clustered <= r.n_docs


def test_exact_substring_repeats_semantics(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import exact_substring_repeats

    rows = [
        (1, "a b c d e f g h i j"),                      # shares 10-token run w/ 2
        (2, "z a b c d e f g h i j y"),
        (3, "one two three four five six seven eight"),  # unique -> no span
        (4, "p q r s t u v w p q r s t u v w"),          # SAME-DOC repeat
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_tokens"], r["n_windows"])
        for r in exact_substring_repeats(df, min_tokens=8).collect()
    }
    assert got == {
        (1, 0, 10, 3),   # maximal cover of starts {0,1,2}
        (2, 1, 10, 3),
        (4, 0, 16, 2),   # within-doc: starts {0, 8} — windows [0,7] and
    }                    # [8,15] ADJOIN (gap == L), so one maximal cover


def test_exact_substring_repeats_overlap_merge(spark):
    # the ADVICE r7 contract defect: starts with gap 2..L used to emit
    # two OVERLAPPING spans (double-counting tokens on per-doc sums);
    # maximal-cover semantics merges them into one span
    from wellmeet_data_pipeline_spark.operators.dedup import exact_substring_repeats

    # doc 1: duplicated 8-windows start at 0 and 2 (copies live in docs
    # 2 and 3) — cover = tokens 0..9, ONE span of 10
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h"),          # copy of doc 1's window @0
        (3, "c d e f g h i j"),          # copy of doc 1's window @2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_tokens"], r["n_windows"])
        for r in exact_substring_repeats(df, min_tokens=8).collect()
    }
    assert got == {
        (1, 0, 10, 2),   # merged maximal cover of starts {0, 2}
        (2, 0, 8, 1),
        (3, 0, 8, 1),
    }
    # per-doc token sums are exact (no overlap double-count)
    assert sum(s for d, _, s, _ in got if d == 1) == 10


def test_exact_substring_repeats_duplicate_doc_ids(spark):
    # the singleton exclusion keys on (id, pos, GRAM): with duplicate
    # doc_ids, two different grams can share coordinates, and a
    # coordinate-only anti join would knock out the other copy's
    # duplicated start (review catch).  Doc 1 appears twice: copy A's
    # window @0 is corpus-unique, copy B's window @0 occurs twice.
    from wellmeet_data_pipeline_spark.operators.dedup import exact_substring_repeats

    rows = [
        (1, "u1 u2 u3 u4 u5 u6 u7 u8"),   # copy A: unique gram @0
        (1, "d1 d2 d3 d4 d5 d6 d7 d8"),   # copy B: duplicated gram @0
        (2, "d1 d2 d3 d4 d5 d6 d7 d8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_tokens"], r["n_windows"])
        for r in exact_substring_repeats(df, min_tokens=8).collect()
    }
    assert got == {(1, 0, 8, 1), (2, 0, 8, 1)}


def test_exact_substring_repeats_no_pair_join(spark):
    # duplication is a map-side-combined groupBy(gram) count + an anti
    # join on near-unique (id, pos) keys — never a self-join, never a
    # single-task gram-key window: hot boilerplate must create neither
    # an O(occ^2) pair term nor a one-reducer hot spot
    from wellmeet_data_pipeline_spark.operators.dedup import exact_substring_repeats

    df = spark.createDataFrame(
        [(i, "same old boilerplate line repeated verbatim here truly") for i in range(40)],
        "doc_id long, text string",
    )
    out = exact_substring_repeats(df, min_tokens=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only windows are doc-partitioned island merges; the gram key
    # must never be a window partition (that ships every occurrence of
    # the hottest gram to ONE task)
    assert "windowspecdefinition(shingle" not in plan
    assert out.count() == 40  # every doc fully covered by one span


def test_minhash_band_plan_matches_reference_scurve(spark):
    # independent check: brute-force the expected S-curve masses in python
    # from the exact pairwise jaccards of a tiny corpus
    from itertools import combinations

    from wellmeet_data_pipeline_spark.operators.dedup import minhash_band_plan

    texts = {
        1: "a b c d e f",
        2: "a b c d e g",      # high overlap with 1
        3: "a b x y z w",      # low overlap with 1/2
        4: "q r s t u v",      # disjoint
    }

    def shingles(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    js = []
    for x, y in combinations(sorted(texts), 2):
        a, b = shingles(texts[x]), shingles(texts[y])
        inter = len(a & b)
        if inter:  # co-occurring pairs only — absent pairs have p = 0
            j = inter / (len(a) + len(b) - inter)
            js.append(round(j * 1e6 + 1e-9) / 1e6)  # micro snap (floor(x+.5))

    import math

    expected = {}
    r = 1
    while r <= 32:
        b = 32 // r
        ca = na = fc = nb = 0
        for j in js:
            p = 1.0 - (1.0 - j ** r) ** b
            pi = math.floor(p * 1e6 + 0.5)
            if j >= 0.5:
                ca, na = ca + pi, na + 1
            else:
                fc, nb = fc + pi, nb + 1
        expected[(b, r)] = (na, ca, nb, fc)
        r *= 2

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (row["bands"], row["rows_per_band"]): (
            row["n_pairs_above"],
            row["caught_above_micro"],
            row["n_pairs_below"],
            row["false_cand_micro"],
        )
        for row in minhash_band_plan(df, n_hashes=32, threshold=0.5).collect()
    }
    assert got == expected
    # folklore midpoint sanity: r=1/b=32 curve catches low-j pairs easily
    # (midpoint 1/32), r=32/b=1 only near-exact dups (midpoint -> 1)


def test_minhash_band_plan_rejects_non_power_of_two(spark):
    import pytest as _pytest

    from wellmeet_data_pipeline_spark.operators.dedup import minhash_band_plan

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        minhash_band_plan(df, n_hashes=24)


def test_kcore_decomposition_semantics(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import kcore_decomposition

    # triangle {1,2,3} + pendant 4 + path 5-6: 2-core = the triangle only
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6), (2, 1)],  # dup edge reversed
        "id_a long, id_b long",
    )
    got = {
        (r["node"], r["core_degree"])
        for r in kcore_decomposition(edges, k=2).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 2)}
    # 3-core of the same graph is empty
    assert kcore_decomposition(edges, k=3).count() == 0
    # two triangles sharing node 3: node 3's core degree counts BOTH
    edges2 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)],
        "id_a long, id_b long",
    )
    got2 = {
        (r["node"], r["core_degree"])
        for r in kcore_decomposition(edges2, k=2).collect()
    }
    assert got2 == {(1, 2), (2, 2), (3, 4), (4, 2), (5, 2)}

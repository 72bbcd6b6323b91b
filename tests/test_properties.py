"""Property-based checks (hypothesis) for the invariants the dedup and
text layers rely on.  Batched: each property collects its examples and
runs ONE Spark job over all of them, keeping runtime sane."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.functions.text import (
    normalized_text,
    quality_score,
    token_count,
)

TEXTS = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"), max_codepoint=0x2FFF),
    max_size=200,
)


def _eval_many(spark, texts, col_builder):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [r["v"] for r in df.select(col_builder(F.col("t")).alias("v")).collect()]


@settings(max_examples=1, deadline=None)
@given(st.lists(TEXTS, min_size=30, max_size=30))
def test_normalized_text_is_idempotent_and_canonical(spark, texts):
    once = _eval_many(spark, texts, normalized_text)
    twice = _eval_many(spark, once, normalized_text)
    assert once == twice  # idempotent
    for v in once:
        assert v == v.lower()
        assert not re.search(r"\s\s", v)
        assert v == v.strip()


@settings(max_examples=1, deadline=None)
@given(st.lists(TEXTS, min_size=30, max_size=30))
def test_quality_score_bounded(spark, texts):
    scores = _eval_many(spark, texts, quality_score)
    assert all(s is None or 0.0 <= s <= 1.0 for s in scores)


ASCII_TEXTS = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=200
)


@settings(max_examples=1, deadline=None)
@given(st.lists(ASCII_TEXTS, min_size=30, max_size=30))
def test_token_count_nonnegative_and_split_consistent(spark, texts):
    # ASCII only: Java's \s (used by split()) is ASCII while Python's
    # str.split() is Unicode-aware — the engine contract is the Java one
    counts = _eval_many(spark, texts, token_count)
    expected = [len(t.split()) for t in texts]
    assert counts == expected


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=6),
        min_size=1,
        max_size=25,
    )
)
def test_line_dedup_preserves_distinct_lines_and_order(spark, docs):
    """Invariants: (1) the multiset of output lines == the SET of distinct
    input lines (every distinct line survives exactly once corpus-wide);
    (2) each doc's surviving lines are a subsequence of its original
    lines."""
    from wellmeet_data_pipeline_spark.operators.corpus import line_dedup_global

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"].split("\n") for r in line_dedup_global(df).collect()}

    all_out = [ln for lines in out.values() for ln in lines]
    assert sorted(all_out) == sorted({ln for lines in docs for ln in lines})

    for doc_id, kept in out.items():
        orig = docs[doc_id]
        it = iter(orig)
        assert all(any(o == k for o in it) for k in kept)  # subsequence


@settings(max_examples=1, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=40))
def test_pack_sequences_offsets_consistent(spark, token_counts):
    """Per stream: doc offsets/pack_ids must equal the running token sum,
    and 0 <= offset < seq_len."""
    from wellmeet_data_pipeline_spark.operators.corpus import pack_sequences

    seq_len = 16
    rows = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        pack_sequences(df, seq_len=seq_len, n_streams=3).collect(),
        key=lambda r: (r["stream_id"], r["doc_id"]),
    )
    cum: dict[int, int] = {}
    for r in got:
        before = cum.get(r["stream_id"], 0)
        assert r["pack_id"] == before // seq_len
        assert r["offset"] == before % seq_len
        assert 0 <= r["offset"] < seq_len
        cum[r["stream_id"]] = before + r["n_tokens"]


def test_global_rank_cumsum_property(spark):
    """Property: for arbitrary (key, value) multisets and partition
    counts, the two-pass distributed rank/cumsum agrees with the
    single-partition window form."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wellmeet_data_pipeline_spark.operators.windows import global_rank_cumsum

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=60),
        n_parts=st.integers(min_value=1, max_value=9),
    )
    def check(vals, n_parts):
        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "key long, n long")
        order = [F.col("n").desc(), F.col("key").asc()]
        got = {
            r["key"]: (r["rank"], r["cum"])
            for r in global_rank_cumsum(
                df, order, sum_col="n", num_partitions=n_parts
            ).collect()
        }
        w = Window.orderBy(*order)
        want = {
            r["key"]: (r["rank"], r["cum"])
            for r in df.withColumn("rank", F.row_number().over(w))
            .withColumn(
                "cum", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
            )
            .collect()
        }
        assert got == want

    check()


@settings(max_examples=2, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=30,
    )
)
def test_bpe_trainer_matches_pure_python_reference(spark, words):
    """train_bpe_merges == an independent pure-Python BPE (same argmax
    tie-break, same greedy left-to-right replacement) on arbitrary small
    corpora — including adversarial repeat patterns like 'aaaaaa' where
    overlap handling and merge non-cascading are easy to get wrong."""
    from collections import Counter

    from wellmeet_data_pipeline_spark.operators.tokenizer import train_bpe_merges

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    merges, vocab = train_bpe_merges(docs, n_merges=4)

    freqs = Counter(words)
    py_vocab = {w: list(w) for w in freqs}
    py_merges = []
    for _ in range(4):
        c = Counter()
        for w, f in freqs.items():
            s = py_vocab[w]
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += f
        if not c:
            break
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        py_merges.append(best)
        l, r = best
        for w, s in py_vocab.items():
            out = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            py_vocab[w] = out
    assert merges == py_merges
    got = {row["word"]: list(row["syms"]) for row in vocab.collect()}
    assert got == py_vocab


NAMES = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=24
)


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(NAMES, st.integers(0, 1_000_000)), min_size=40, max_size=40))
def test_fuzzy_link_always_finds_the_deletion_parent(spark, cases):
    """Pigeonhole completeness under arbitrary names and deletion
    positions: every single-character deletion of a registered name must
    link back to it, whatever half the deleted character sat in."""
    from wellmeet_data_pipeline_spark.operators.linkage import fuzzy_link_edit1

    clean = [(i, name) for i, (name, _) in enumerate(cases)]
    dirty = [
        (i, name[: pos % len(name)] + name[pos % len(name) + 1 :])
        for i, (name, pos) in enumerate(cases)
    ]
    d = spark.createDataFrame(dirty, "record_id long, record_name string")
    c = spark.createDataFrame(clean, "entity_id long, entity_name string")
    got = {
        (r.record_id, r.entity_id)
        for r in fuzzy_link_edit1(d, c).collect()
    }
    missing = [(i, n, p) for (i, n), (_, (nm, p)) in zip(clean, enumerate(cases))
               if (i, i) not in got for n in [nm]]
    assert not missing, f"parents not found: {missing[:5]}"


WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "kappa", "zeta"]),
    min_size=1, max_size=12,
)


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2", "s3"]), WORDS),
                min_size=20, max_size=20))
def test_js_divergence_bounds_and_zero_iff_blend(spark, docs):
    """0 <= JS(P_s || P_global) <= ln 2 for every source, and a corpus
    where every source shares one identical distribution scores 0."""
    import math

    from wellmeet_data_pipeline_spark.operators.scoring import js_divergence_by_group

    rows = [(g, " ".join(ws)) for g, ws in docs]
    df = spark.createDataFrame(rows, "source string, text string")
    for r in js_divergence_by_group(df).collect():
        assert 0 <= r.js_divergence <= math.log(2) + 1e-9, r
    same = spark.createDataFrame(
        [(g, "alpha beta gamma") for g in ("s1", "s2", "s3")],
        "source string, text string",
    )
    assert all(r.js_micro_nats == 0 for r in js_divergence_by_group(same).collect())


@settings(max_examples=1, deadline=None)
@given(st.lists(WORDS, min_size=12, max_size=12))
def test_containment_bounds_and_jaccard_dominance(spark, docs):
    """Containment values sit in (0, 1], and for every surfaced pair
    max-containment >= the pair's Jaccard (|A∩B|/min >= |A∩B|/|A∪B|)."""
    from wellmeet_data_pipeline_spark.operators.dedup import ngram_containment_pairs

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in ngram_containment_pairs(df, threshold=0.0).collect():
        assert 0 < r.containment_a_in_b <= 1 and 0 < r.containment_b_in_a <= 1
        jac = r.inter / (r.n_a + r.n_b - r.inter)
        assert max(r.containment_a_in_b, r.containment_b_in_a) >= jac - 1e-9


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=20),
        min_size=8,
        max_size=16,
    )
)
def test_exact_substring_repeats_brute_force_parity(spark, token_lists):
    """Every reported span is a MAXIMAL cover of duplicated L-windows
    (starts merge whenever their windows overlap or adjoin — gap <= L),
    and every duplicated window start is covered by exactly one span —
    pinned against a brute-force python implementation on tiny-alphabet
    corpora (small alphabets force plenty of repeats)."""
    from collections import Counter

    from wellmeet_data_pipeline_spark.operators.dedup import exact_substring_repeats

    L = 4
    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]

    # brute force: count every L-window across the corpus, mark duplicated
    # starts, merge starts whose covers overlap or adjoin per doc
    counts = Counter()
    for _, text in docs:
        w = text.split()
        for p in range(len(w) - L + 1):
            counts[" ".join(w[p:p + L])] += 1
    want = set()
    for i, text in docs:
        w = text.split()
        starts = [
            p for p in range(len(w) - L + 1)
            if counts[" ".join(w[p:p + L])] >= 2
        ]
        run = []
        for p in starts:
            if run and p <= run[-1] + L:
                run.append(p)
            else:
                if run:
                    want.add((i, run[0], run[-1] - run[0] + L, len(run)))
                run = [p]
        if run:
            want.add((i, run[0], run[-1] - run[0] + L, len(run)))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_tokens"], r["n_windows"])
        for r in exact_substring_repeats(df, min_tokens=L).collect()
    }
    assert got == want


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=5,
        max_size=40,
    )
)
def test_kcore_invariants(spark, raw_edges):
    """k-core output invariants on random graphs: every member keeps
    degree >= k inside the core (consistency), re-peeling the core is a
    no-op (fixpoint), and no node outside the core could survive with
    the core plus itself (a weak maximality probe via brute force)."""
    from wellmeet_data_pipeline_spark.operators.dedup import kcore_decomposition

    k = 2
    edges = {(min(a, b), max(a, b)) for a, b in raw_edges if a != b}
    if not edges:
        edges = {(0, 1)}
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    core = {
        r["node"]: r["core_degree"] for r in kcore_decomposition(df, k=k).collect()
    }

    # brute-force peel in python
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    want = {n: len(adj[n] & alive) for n in alive}
    assert core == want
    for n, d in core.items():
        assert d >= k


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.integers(-1_000_000, 1_000_000),
        min_size=20,
        max_size=300,
    )
)
def test_quantile_sketch_error_bound_and_monoid(spark, values):
    """DDSketch-shape guarantees, pinned generatively: (1) every quantile
    estimate's relative error toward zero is < 2^-sub_bits vs the exact
    order statistic (and EXACT for |v| < 2^(sub_bits+1)); (2) merging
    split sketches is byte-identical to the one-shot sketch (monoid)."""
    import math

    from wellmeet_data_pipeline_spark.operators.aggregations import (
        quantile_sketch,
        quantile_sketch_merge,
        quantiles_from_sketch,
    )

    sub_bits = 5
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "rid long, v long"
    )
    sk = quantile_sketch(df, "v", sub_bits=sub_bits)

    # monoid: 3-way split merge == one-shot, exactly
    parts = [
        quantile_sketch(df.filter(F.col("rid") % 3 == i), "v", sub_bits=sub_bits)
        for i in range(3)
    ]
    merged = quantile_sketch_merge(parts)
    one = {(r["bucket_lb"], r["cnt"]) for r in sk.collect()}
    mrg = {(r["bucket_lb"], r["cnt"]) for r in merged.collect()}
    assert one == mrg

    qs = [(1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")]
    got = {
        r["quantile"]: r["est"] for r in quantiles_from_sketch(sk, quantiles=qs).collect()
    }
    ordered = sorted(values)
    n = len(ordered)
    for num, den, label in qs:
        exact = ordered[(num * n + den - 1) // den - 1]  # rank ceil(qN), 1-based
        est = got[label]
        if abs(exact) < 2 ** (sub_bits + 1):
            assert est == exact, (label, est, exact)
        else:
            # lower-bound representative: est between exact shrunk toward
            # zero by < 2^-sub_bits and exact itself
            assert abs(est) <= abs(exact) and abs(exact) - abs(est) < math.ldexp(
                abs(exact), -sub_bits
            ), (label, est, exact)
            assert (est >= 0) == (exact >= 0) or exact == 0


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 400)),
        min_size=10,
        max_size=120,
    )
)
def test_bottomk_sample_duplication_invariant_and_monoid(spark, pairs):
    """Bottom-k sample invariants: (1) duplicating every row leaves the
    sample identical (members are sampled, not rows); (2) a 3-way
    split-merge equals the one-shot sample (monoid); (3) per-group size
    is min(k, distinct members)."""
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        bottomk_sample,
        bottomk_sample_merge,
    )

    k = 4
    df = spark.createDataFrame(
        [(g, u, i) for i, (g, u) in enumerate(pairs)], "grp string, uid long, rid long"
    )
    one = {
        (r["grp"], r["uid"], r["draw_rank"])
        for r in bottomk_sample(df, "uid", group_cols=("grp",), k=k).collect()
    }

    doubled = df.unionByName(df)
    two = {
        (r["grp"], r["uid"], r["draw_rank"])
        for r in bottomk_sample(doubled, "uid", group_cols=("grp",), k=k).collect()
    }
    assert one == two

    parts = [
        bottomk_sample(
            df.filter(F.col("rid") % 3 == i), "uid", group_cols=("grp",), k=k
        )
        for i in range(3)
    ]
    merged = {
        (r["grp"], r["uid"], r["draw_rank"])
        for r in bottomk_sample_merge(parts, "uid", group_cols=("grp",), k=k).collect()
    }
    assert merged == one

    from collections import Counter
    distinct = {(g, u) for g, u in pairs}
    per_group = Counter(g for g, _ in distinct)
    got_sizes = Counter(g for g, _, _ in one)
    for g, n in per_group.items():
        assert got_sizes[g] == min(k, n)


@settings(max_examples=1, deadline=None)
@given(st.integers(500, 3000))
def test_kmv_distinct_estimate_error_bound(spark, n):
    """KMV estimate within 5 standard errors (stderr ~ 1/sqrt(k-2)) of
    the true distinct count, and EXACT below k."""
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        kmv_distinct_estimate,
    )

    k = 64
    rows = [("big", i) for i in range(n)] + [("small", i) for i in range(k - 5)]
    df = spark.createDataFrame(rows * 2, "grp string, uid long")  # dup rows
    got = {
        r["grp"]: (r["n_sketch"], r["est_distinct"])
        for r in kmv_distinct_estimate(df, "uid", group_cols=("grp",), k=k).collect()
    }
    assert got["small"] == (k - 5, k - 5)  # under k: exact
    n_sk, est = got["big"]
    assert n_sk == k
    tol = 5.0 / (k - 2) ** 0.5
    assert abs(est - n) <= tol * n, (est, n)

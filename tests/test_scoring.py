"""Model-based scoring operators (operators/scoring.py): bigram-LM
perplexity, hashed linear classifier, deterministic shard shuffle.
Expected values are recomputed independently in pure Python (math.log /
hashlib) — not by re-running the Spark expressions."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.scoring import (
    N_FEATURE_BUCKETS,
    hashed_linear_score,
    model_weights_table,
    ngram_lm_score,
    shuffle_to_shards,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_lm_score_matches_hand_computed_bigram_model(spark):
    # LM corpus: one doc, "a b a b a"; scored doc: "a b c"
    lm = _docs(spark, [(0, "a b a b a")])
    docs = _docs(spark, [(1, "a b c")])
    out = {r["doc_id"]: r for r in ngram_lm_score(docs, lm, alpha=0.5).collect()}

    # counts: c1 = {a:3, b:2}, T=5, V=2; c2 = {(a,b):2, (b,a):2}
    a, T, V = 0.5, 5, 2

    def snap(x):
        return math.floor(x * 1e6 + 0.5)

    lp = (
        snap(math.log((3 + a) / (T + a * V)))  # p(a)
        + snap(math.log((2 + a) / (3 + a * V)))  # p(b|a)
        + snap(math.log((0 + a) / (2 + a * V)))  # p(c|b) unseen bigram
    )
    expected_nll = math.floor(-lp / 3 + 0.5) / 1e6
    r = out[1]
    assert r["n_tokens"] == 3
    assert r["nll"] == pytest.approx(expected_nll, abs=0)


def test_ngram_lm_score_unseen_words_fall_back_to_smoothing_mass(spark):
    lm = _docs(spark, [(0, "x y")])
    docs = _docs(spark, [(1, "q q")])  # q never seen: p(q)=(0+a)/(T+aV), p(q|q)=(0+a)/(0+aV)
    a, T, V = 0.1, 2, 2
    r = ngram_lm_score(docs, lm, alpha=a).collect()[0]
    lp = math.floor(math.log(a / (T + a * V)) * 1e6 + 0.5) + math.floor(
        math.log(a / (a * V)) * 1e6 + 0.5
    )
    assert r["nll"] == math.floor(-lp / 2 + 0.5) / 1e6


def test_ngram_lm_bands_partition_by_thresholds(spark):
    lm = _docs(spark, [(0, "a a a a a a a a")])
    # doc 1 is pure LM material (low nll), doc 2 is all-unseen (high nll)
    docs = _docs(spark, [(1, "a a a a"), (2, "z w v u")])
    rows = {r["doc_id"]: r for r in
            ngram_lm_score(docs, lm, head_nll=0.2, tail_nll=0.5).collect()}
    assert rows[1]["nll"] < rows[2]["nll"]
    assert rows[1]["ppl_band"] == "head"
    assert rows[2]["ppl_band"] == "tail"


def _py_bucket(term: str) -> int:
    return int(hashlib.sha256(term.encode()).hexdigest()[:4], 16)


def _py_weight(bucket: int) -> int:
    return (bucket * 2654435761) % 65536 - 32768


def test_hashed_linear_score_matches_python_reference(spark):
    docs = _docs(spark, [(1, "Hello, World! hello")])
    w = model_weights_table(spark)
    r = hashed_linear_score(docs, w).collect()[0]
    # normalized tokens: "hello world hello"
    s = _py_weight(_py_bucket("hello")) * 2 + _py_weight(_py_bucket("world"))
    assert r["n_tokens"] == 3
    assert r["logit"] == math.floor(s / (32768.0 * 3) * 1e6 + 0.5) / 1e6
    assert r["keep"] == (s >= 0)


def test_model_weights_table_covers_full_bucket_space(spark):
    w = model_weights_table(spark)
    stats = w.agg(
        F.count("*").alias("n"),
        F.countDistinct("bucket").alias("nb"),
        F.min("w_int").alias("lo"),
        F.max("w_int").alias("hi"),
    ).collect()[0]
    assert stats["n"] == stats["nb"] == N_FEATURE_BUCKETS
    assert -32768 <= stats["lo"] and stats["hi"] <= 32767


def test_shuffle_to_shards_is_a_permutation_with_contiguous_positions(spark):
    df = spark.range(200).select(F.col("id").alias("doc_id"))
    out = shuffle_to_shards(df, 4).collect()
    assert len(out) == 200
    assert {r["doc_id"] for r in out} == set(range(200))
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shuffle_to_shards_shard_assignment_is_growth_stable(spark):
    small = spark.range(100).select(F.col("id").alias("doc_id"))
    big = spark.range(300).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shard"] for r in shuffle_to_shards(small, 8).collect()}
    b = {r["doc_id"]: r["shard"] for r in shuffle_to_shards(big, 8).collect()}
    # a doc's shard never changes when the corpus grows (hex-range bucketing)
    assert all(b[k] == v for k, v in a.items())


def test_shuffle_to_shards_deterministic_under_repartition(spark):
    df = spark.range(150).select(F.col("id").alias("doc_id"))
    one = sorted(map(tuple, shuffle_to_shards(df, 4).collect()))
    two = sorted(map(tuple, shuffle_to_shards(df.repartition(7), 4).collect()))
    assert one == two


def test_shuffle_to_shards_rejects_bad_n(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        shuffle_to_shards(df, 0)


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs sharing vocabulary with the target corpus must score higher
    than docs that only match the raw background."""
    from wellmeet_data_pipeline_spark.operators.scoring import dsir_importance_weight

    target = spark.createDataFrame(
        [(100, "high quality encyclopedia article about physics and chemistry"),
         (101, "another encyclopedia article discussing physics in detail")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(200, "buy cheap deals now click here amazing offer"),
         (201, "free spam offer click now buy cheap"),
         (202, "encyclopedia article about physics")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "encyclopedia article about physics and chemistry"),
         (2, "buy cheap offer click now")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dsir_importance_weight(docs, target, raw).collect()}
    assert out[1]["dsir_weight"] > out[2]["dsir_weight"]
    assert out[1]["keep"] and not out[2]["keep"]


def test_dsir_weight_deterministic_across_partitionings(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import dsir_importance_weight

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared words and token{i % 3}") for i in range(20)],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id % 4 = 0")
    a = {r["doc_id"]: r["dsir_weight"]
         for r in dsir_importance_weight(docs, target, docs).collect()}
    b = {r["doc_id"]: r["dsir_weight"]
         for r in dsir_importance_weight(docs.repartition(7), target, docs).collect()}
    assert a == b


def test_dsir_model_scoring_matches_inline_form(spark):
    """Scoring with a prebuilt dense model must be bit-identical to
    dsir_importance_weight at the same (alpha, round_digits) — the
    log-ratio depends only on the bucket."""
    from wellmeet_data_pipeline_spark.operators.scoring import (
        build_dsir_model,
        dsir_importance_weight,
        dsir_score_with_model,
    )

    docs = spark.createDataFrame(
        [(i, f"words shared across docs plus token{i % 5} and token{i % 3}") for i in range(24)],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id % 4 = 0")
    inline = {
        tuple(r) for r in dsir_importance_weight(
            docs, target, target_within_docs=True
        ).collect()
    }
    model = build_dsir_model(target, docs)
    via_model = {
        tuple(r) for r in dsir_score_with_model(docs, model).collect()
    }
    assert inline == via_model and len(inline) == 24


def test_perplexity_lang_buckets_terciles_per_language(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import perplexity_lang_buckets

    # lang "aa": 6 docs with increasingly unseen content -> distinct nll
    # values -> exact 2/2/2 tercile split; lang "bb": 3 docs -> 1/1/1.
    rows = [
        (1, "a b a b a b", "aa"),
        (2, "a b a b q q", "aa"),
        (3, "a b q q q q", "aa"),
        (4, "q q q q q q", "aa"),
        (5, "a b a b a q", "aa"),
        (6, "q a q b q a", "aa"),
        (7, "a b a b", "bb"),
        (8, "a q a q", "bb"),
        (9, "q q q q", "bb"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    lm = docs.filter("doc_id = 1")  # LM trained on "a b a b a b"
    out = perplexity_lang_buckets(docs, lm, alpha=0.1)
    got = {(r["lang"], r["ppl_bucket"]): r for r in out.collect()}
    assert {k: v["n_docs"] for k, v in got.items()} == {
        ("aa", "head"): 2, ("aa", "middle"): 2, ("aa", "tail"): 2,
        ("bb", "head"): 1, ("bb", "middle"): 1, ("bb", "tail"): 1,
    }
    for lang in ("aa", "bb"):
        assert (
            got[(lang, "head")]["mean_nll"]
            < got[(lang, "middle")]["mean_nll"]
            < got[(lang, "tail")]["mean_nll"]
        )


def test_doremi_weight_step_upweights_high_perplexity_domain(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import doremi_weight_step

    # LM trained on "a b" patterns; domain "easy" repeats them, domain
    # "hard" is unseen vocabulary -> higher nll -> higher weight
    rows = [
        (0, "a b a b", "easy"),
        (1, "a b a b a b", "easy"),
        (2, "q r s t u v", "hard"),
        (3, "w x y z q r", "hard"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    lm = docs.filter("doc_id = 0")
    out = {r["source"]: r for r in doremi_weight_step(docs, lm, eta=1.0).collect()}
    assert set(out) == {"easy", "hard"}
    assert out["hard"]["mean_nll"] > out["easy"]["mean_nll"]
    assert out["hard"]["weight"] > out["easy"]["weight"]
    # weights normalize to ~1 (rounding slack only)
    assert abs(out["easy"]["weight"] + out["hard"]["weight"] - 1.0) < 1e-5
    # a below-baseline domain's excess clamps at 0 -> raw weight exp(0)=1
    assert out["easy"]["weight"] > 0


def test_token_pmi_collocations_pure_python(spark, tmp_path):
    """Third-engine differential for the PMI query: pure-python PMI over
    a synthetic corpus written as a documents table (the query reads the
    table contract, so the test drives the registered entry itself)."""
    import math

    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    texts = [
        "new york is big and new york is far",
        "new york has new ideas and old ideas",
        "big data and new york data",
        "york new is not a collocation but new york is",
        "new york new york new york",  # pushes c(new york) over min_count
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        (tmp_path / f"{t}.parquet").mkdir(exist_ok=True)

    toks = [w for t in texts for w in t.split()]
    pairs = [p for t in texts for p in zip(t.split(), t.split()[1:])]
    c1: dict = {}
    for w in toks:
        c1[w] = c1.get(w, 0) + 1
    c2: dict = {}
    for p in pairs:
        c2[p] = c2.get(p, 0) + 1
    want = []
    for (w1, w2), cxy in c2.items():
        if cxy < 5:
            continue
        pmi = math.floor(
            math.log(cxy * len(toks) * len(toks) / (len(pairs) * c1[w1] * c1[w2]))
            * 1e6 + 0.5
        )
        want.append((w1, w2, cxy, pmi))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert want, "fixture must produce at least one qualifying pair"

    got = [
        (r["w1"], r["w2"], r["c_xy"], r["pmi_micro"])
        for r in REGISTRY["token_pmi_collocations"].fn(spark, str(tmp_path)).collect()
    ]
    assert got == want[:30]


def test_expected_calibration_error_hand_computed(spark):
    """ECE/MCE pinned against hand math on a 2-bin fixture: bin gaps are
    exact bigint numerators, no float summation anywhere."""
    from wellmeet_data_pipeline_spark.operators.scoring import (
        expected_calibration_error,
    )

    rows = [
        # bin 0 (scores near -1): mean si = -900000, 1 of 2 positive
        (-0.9, 1), (-0.9, 0),
        # bin 9 (scores near 1): mean si = 800000, all 3 positive
        (0.8, 1), (0.8, 1), (0.8, 1),
    ]
    df = spark.createDataFrame(rows, "logit double, y int")
    got = expected_calibration_error(df, "logit", "y").collect()[0]
    # bin0 gap = |1*1e6 - (-1800000)| = 2_800_000; bin9 = |3e6 - 2400000| = 600000
    assert got["n_docs"] == 5
    assert got["ece_micro"] == (2_800_000 + 600_000) // 5
    assert got["mce_micro"] == max(2_800_000 // 2, 600_000 // 3)


def test_quality_psi_pure_python(spark, tmp_path):
    """Third-engine PSI differential: pure-python Laplace-smoothed PSI
    over a synthetic documents table, exact micro-grid parity."""
    import math

    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    rows = []
    # source A skews short, source B skews long, C matches the blend-ish
    for i in range(40):
        rows.append((i, "t", "en", "A", 30 + (i % 3) * 10))
    for i in range(40, 70):
        rows.append((i, "t", "en", "B", 400 + (i % 4) * 30))
    for i in range(70, 100):
        rows.append((i, "t", "en", "C", (i * 37) % 600))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))

    def bin_of(n):
        return min(9, max(0, n // 64))

    from collections import Counter
    per = {}
    tot = Counter()
    ns = Counter()
    for _, _, _, s, n in rows:
        per.setdefault(s, Counter())[bin_of(n)] += 1
        tot[bin_of(n)] += 1
        ns[s] += 1
    N = len(rows)
    want = {}
    for s in per:
        acc = 0
        for b in range(10):
            a = (per[s].get(b, 0) + 1) * (N + 10)
            bb = (tot.get(b, 0) + 1) * (ns[s] + 10)
            lm = math.floor(math.log(a / bb) * 1e6 + 0.5)
            acc += (a - bb) * lm
        want[s] = acc // ((ns[s] + 10) * (N + 10))

    got = {
        r["source"]: r["psi_micro"]
        for r in REGISTRY["quality_psi_by_source"].fn(spark, str(tmp_path)).collect()
    }
    assert got == want
    assert got["A"] > got["C"] and got["B"] > got["C"]  # skewed sources drift more

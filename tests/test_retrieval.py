"""Retrieval operators: BM25 top-k, reciprocal-rank fusion, readability.

Differential strategy mirrors test_scoring.py: every score is re-derived
by an independent pure-Python implementation on a small corpus, and the
degenerate corners (NULL/empty text, missing-leg fusion, ties) are pinned
explicitly.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.retrieval import (
    MICRO,
    bm25_scores,
    bm25_topk,
    readability_scores,
    rrf_fuse,
)

DOCS = [
    (0, "fast query scan fast table"),
    (1, "join hash join merge join"),
    (2, "slow scan of the big table"),
    (3, ""),
    (4, None),
    (5, "fast fast fast fast fast fast fast fast"),
]
QUERIES = {0: ["fast", "scan"], 1: ["join"]}


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent reference: same normalization (lowercase, strip
    punctuation, split on whitespace), exact micro-grid snapping."""
    import re

    tok = {}
    for i, t in docs:
        if t is None:
            tok[i] = []
        else:
            norm = re.sub(r"\s+", " ", re.sub(r"[^\w\s]", "", t.lower())).strip()
            tok[i] = [w for w in norm.split(" ") if w]
    n_docs = len(docs)
    total_dl = sum(len(v) for v in tok.values())
    df = {}
    for ws in tok.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    out = {}
    for q, terms in queries.items():
        for d, ws in tok.items():
            s = 0
            for t in terms:
                tf = ws.count(t)
                if tf == 0:
                    continue
                idf = math.floor(
                    math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)) * MICRO + 0.5
                ) / MICRO
                dlr = (len(ws) * n_docs) / total_dl
                tfn = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dlr))
                s += math.floor(idf * tfn * MICRO + 0.5)
            if s:
                out[(q, d)] = s
    return out


def test_bm25_matches_pure_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.query_id, r.doc_id): r.score_int
        for r in bm25_scores(df, QUERIES).collect()
    }
    assert got == _py_bm25(DOCS, QUERIES)


def test_bm25_topk_rank_and_tiebreak(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(df, QUERIES, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    ref = _py_bm25(DOCS, QUERIES)
    for q, lst in by_q.items():
        want = sorted(
            [(d, s) for (qq, d), s in ref.items() if qq == q],
            key=lambda x: (-x[1], x[0]),
        )[:2]
        assert [(d, s) for _, d, s in sorted(lst)] == [(d, s / MICRO) for d, s in want]
    # doc 5 spams 'fast' but doc 0 matches two terms — both rank, scores
    # strictly ordered (saturation keeps the spam from running away)
    assert by_q[0][0][1] in (0, 5)


def test_bm25_empty_and_null_docs_excluded(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs_seen = {r.doc_id for r in bm25_scores(df, QUERIES).collect()}
    assert 3 not in docs_seen and 4 not in docs_seen
    # ...but they still count toward N / avgdl (parity with the oracle):
    # removing them changes scores
    df2 = spark.createDataFrame(
        [r for r in DOCS if r[0] not in (3, 4)], "doc_id long, text string"
    )
    s_all = {(r.query_id, r.doc_id): r.score_int for r in bm25_scores(df, QUERIES).collect()}
    s_sub = {(r.query_id, r.doc_id): r.score_int for r in bm25_scores(df2, QUERIES).collect()}
    assert s_all != s_sub


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id int, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "query_id int, doc_id long, rank int"
    )
    got = {r.doc_id: r for r in rrf_fuse([a, b], k=10).collect()}
    # doc 11 in both: 1/62 + 1/61; doc 10 only in a: 1/61; 13 only in b: 1/62
    assert got[11].rrf_score == pytest.approx(1 / 62 + 1 / 61, abs=0)
    assert got[10].rrf_score == pytest.approx(1 / 61, abs=0)
    assert got[13].rrf_score == pytest.approx(1 / 62, abs=0)
    assert got[11].rank == 1
    # 10 (1/61) beats 13 (1/62)
    assert got[10].rank == 2 and got[13].rank == 3
    assert got[10].rank_1 is None and got[13].rank_0 is None


def test_rrf_symmetric_tie_breaks_by_doc_id(spark):
    a = spark.createDataFrame([(0, 20, 3)], "query_id int, doc_id long, rank int")
    b = spark.createDataFrame([(0, 7, 3)], "query_id int, doc_id long, rank int")
    rows = sorted(rrf_fuse([a, b], k=10).collect(), key=lambda r: r.rank)
    assert [r.doc_id for r in rows] == [7, 20]  # equal 1/63 — id asc wins


def test_rrf_requires_two_rankings(spark):
    a = spark.createDataFrame([(0, 1, 1)], "query_id int, doc_id long, rank int")
    with pytest.raises(ValueError):
        rrf_fuse([a])


def test_readability_hand_computed(spark):
    text = "The cat sat on the mat. It was happy! Was it?"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = readability_scores(df).collect()[0]
    # words: 11; sentences: 3; vowel runs of lowercased text:
    # the(1) cat(1) sat(1) on(1) the(1) mat(1) it(1) was(1) happy(2) was(1) it(1) = 12
    assert (r.n_words, r.n_sentences, r.n_syllables) == (11, 3, 12)
    wps, spw = 11 / 3, 12 / 11
    want_fl = math.floor((206.835 - 1.015 * wps - 84.6 * spw) * MICRO + 0.5) / MICRO
    want_fk = math.floor((0.39 * wps + 11.8 * spw - 15.59) * MICRO + 0.5) / MICRO
    assert r.flesch == want_fl and r.fk_grade == want_fk
    assert r.readability_band == "easy"


def test_readability_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "word word word")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in readability_scores(df).collect()}
    assert rows[0].n_words == 0 and rows[0].flesch is None
    assert rows[0].readability_band is None
    assert rows[1].n_words is None and rows[1].flesch is None
    assert rows[1].readability_band is None
    # no sentence punctuation -> floor at 1 sentence
    assert rows[2].n_sentences == 1 and rows[2].flesch is not None


def test_readability_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(0, "a word.")], "doc_id long, text string")
    plan = readability_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bm25_broadcasts_query_terms(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = bm25_topk(df, QUERIES, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_lexical_index_stream_matches_batch(spark, tmp_path):
    """Stream-built postings/doclen store scores identically to the batch
    BM25 operator on the same corpus (shared _bm25_score_frames core)."""
    import json

    from pyspark.sql.types import StructType

    from wellmeet_data_pipeline_spark.streaming.retrieval import (
        bm25_topk_from_store,
        run_lexical_index_pipeline,
    )

    landing = tmp_path / "lex_landing"
    landing.mkdir()
    store, ckpt = str(tmp_path / "lex_store"), str(tmp_path / "lex_ckpt")
    schema = StructType.fromDDL("doc_id long, text string")

    batch1 = [{"doc_id": d, "text": t} for d, t in DOCS[:3]]
    batch2 = [{"doc_id": 3, "text": ""}, {"doc_id": 5, "text": DOCS[5][1]}]
    (landing / "b1.json").write_text(json.dumps(batch1))
    run_lexical_index_pipeline(spark, str(landing), store, ckpt, schema)
    (landing / "b2.json").write_text(json.dumps(batch2))
    run_lexical_index_pipeline(spark, str(landing), store, ckpt, schema)

    all_docs = [r for r in DOCS if r[0] != 4]  # null-text doc not landed
    df = spark.createDataFrame(all_docs, "doc_id long, text string")
    want = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in bm25_topk(df, QUERIES, k=10).collect()
    )
    got = sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in bm25_topk_from_store(spark, store, QUERIES, k=10).collect()
    )
    assert got == want


def test_lexical_index_replay_idempotent(spark, tmp_path):
    """Re-delivering the same landing file must not change the index
    (first version wins per posting/doc)."""
    import json

    from pyspark.sql.types import StructType

    from wellmeet_data_pipeline_spark.sinks.merge import read_current
    from wellmeet_data_pipeline_spark.streaming.retrieval import (
        run_lexical_index_pipeline,
    )

    landing = tmp_path / "lex2_landing"
    landing.mkdir()
    store, ckpt = str(tmp_path / "lex2_store"), str(tmp_path / "lex2_ckpt")
    schema = StructType.fromDDL("doc_id long, text string")

    payload = json.dumps([{"doc_id": 1, "text": "fast fast scan"}])
    (landing / "b1.json").write_text(payload)
    run_lexical_index_pipeline(spark, str(landing), store, ckpt, schema)
    before = sorted(
        (r.posting_key, r.tf)
        for r in read_current(spark, store + "/postings", id_col="posting_key").collect()
    )
    assert before == [("1:fast", 2), ("1:scan", 1)]

    (landing / "b2.json").write_text(payload)  # exact re-delivery
    run_lexical_index_pipeline(spark, str(landing), store, ckpt, schema)
    after = sorted(
        (r.posting_key, r.tf)
        for r in read_current(spark, store + "/postings", id_col="posting_key").collect()
    )
    assert after == before
    dl = read_current(spark, store + "/doclen", id_col="doc_id").collect()
    assert [(r.doc_id, r.dl) for r in dl] == [(1, 3)]


def test_hybrid_from_stores_matches_batch(spark, tmp_path):
    """Hybrid retrieval served from the streamed lexical + embedding
    stores equals the batch BM25+cosine RRF fusion on the same corpus."""
    import json

    from pyspark.sql.types import StructType

    from wellmeet_data_pipeline_spark.functions.enrichment import embed_text
    from wellmeet_data_pipeline_spark.operators.similarity import brute_force_top_k
    from wellmeet_data_pipeline_spark.streaming.embedding import run_embedding_pipeline
    from wellmeet_data_pipeline_spark.streaming.retrieval import (
        hybrid_topk_from_stores,
        run_lexical_index_pipeline,
    )

    landing = tmp_path / "hyb_landing"
    landing.mkdir()
    lex, lex_ckpt = str(tmp_path / "hyb_lex"), str(tmp_path / "hyb_lex_ckpt")
    emb, emb_ckpt = str(tmp_path / "hyb_emb"), str(tmp_path / "hyb_emb_ckpt")
    schema = StructType.fromDDL("doc_id long, text string")

    docs = [r for r in DOCS if r[1]]  # non-empty, non-null
    (landing / "b1.json").write_text(
        json.dumps([{"doc_id": d, "text": t} for d, t in docs])
    )
    run_lexical_index_pipeline(spark, str(landing), lex, lex_ckpt, schema)
    run_embedding_pipeline(spark, str(landing), emb, emb_ckpt, schema,
                           text_col="text", id_col="doc_id", dim=8)

    got = sorted(
        tuple(r) for r in hybrid_topk_from_stores(
            spark, lex, emb, QUERIES, query_vec_ids=[0, 1], k=5,
            k_candidates=3, vec_id_col="doc_id",
        ).collect()
    )

    from wellmeet_data_pipeline_spark.operators.retrieval import rrf_fuse

    df = spark.createDataFrame(docs, "doc_id long, text string")
    bm = bm25_topk(df, QUERIES, k=3).select("query_id", "doc_id", "rank")
    e = embed_text(df, text_col="text", dim=8)
    qv = e.filter(F.col("doc_id").isin([0, 1]))
    cos = brute_force_top_k(e.sparkSession.createDataFrame(qv.collect(), qv.schema),
                            e, k=3, query_id="doc_id", cand_id="doc_id",
                            round_digits=4).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    want = sorted(
        tuple(r) for r in rrf_fuse([bm, cos], k=5).select(
            "query_id", "doc_id", "rrf_score",
            F.col("rank_0").alias("bm25_rank"),
            F.col("rank_1").alias("cosine_rank"), "rank",
        ).collect()
    )
    assert got == want


def test_readability_whitespace_only_and_padded_docs(spark):
    """trim() strips only spaces — tab/newline-padded and whitespace-only
    docs must still count words correctly (code-review regression pin)."""
    df = spark.createDataFrame(
        [(0, "\ta\t"), (1, "\n"), (2, "  a b  ")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in readability_scores(df).collect()}
    assert rows[0].n_words == 1
    assert rows[1].n_words == 0 and rows[1].flesch is None
    assert rows[1].readability_band is None
    assert rows[2].n_words == 2


def test_lexical_index_grown_doc_keeps_first_version(spark, tmp_path):
    """A re-crawled doc whose term set GREW must not append new postings:
    first version wins at the doc grain (code-review regression pin)."""
    import json

    from pyspark.sql.types import StructType

    from wellmeet_data_pipeline_spark.sinks.merge import read_current
    from wellmeet_data_pipeline_spark.streaming.retrieval import (
        run_lexical_index_pipeline,
    )

    landing = tmp_path / "lex3_landing"
    landing.mkdir()
    store, ckpt = str(tmp_path / "lex3_store"), str(tmp_path / "lex3_ckpt")
    schema = StructType.fromDDL("doc_id long, text string")

    (landing / "b1.json").write_text(json.dumps([{"doc_id": 7, "text": "fast scan"}]))
    run_lexical_index_pipeline(spark, str(landing), store, ckpt, schema)
    (landing / "b2.json").write_text(
        json.dumps([{"doc_id": 7, "text": "fast scan merge"},
                    {"doc_id": 8, "text": "merge"}])
    )
    run_lexical_index_pipeline(spark, str(landing), store, ckpt, schema)

    posts = sorted(
        r.posting_key
        for r in read_current(spark, store + "/postings", id_col="posting_key").collect()
    )
    assert posts == ["7:fast", "7:scan", "8:merge"]  # no chimera '7:merge'
    dl = {r.doc_id: r.dl for r in
          read_current(spark, store + "/doclen", id_col="doc_id").collect()}
    assert dl == {7: 2, 8: 1}


def test_trimmed_mean_rejects_bad_trim_frac(spark):
    from wellmeet_data_pipeline_spark.operators.aggregations import (
        trimmed_mean_by_group,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    for bad in (0.5, -0.1, 1.0):
        with pytest.raises(ValueError):
            trimmed_mean_by_group(df, "g", "v", trim_frac=bad)


def test_hybrid_ivf_agrees_with_exact_on_clustered(spark):
    """The IVF-backed hybrid (100 TB form) matches the exact hybrid on
    clustered embeddings at the measured nprobe operating point."""
    from wellmeet_data_pipeline_spark.catalog import table as cat_table
    from wellmeet_data_pipeline_spark.operators.retrieval import (
        hybrid_rrf_topk_ivf,
        rrf_fuse,
    )
    from wellmeet_data_pipeline_spark.operators.similarity import (
        brute_force_top_k,
        clustered_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    d = cat_table(spark, sf, "documents")
    e = clustered_embeddings(cat_table(spark, sf, "embeddings")).localCheckpoint()
    qids = [0, 1, 2, 3]
    queries = {0: ["fast", "query"], 1: ["join", "hash"],
               2: ["stream", "window"], 3: ["customer", "order"]}

    got = hybrid_rrf_topk_ivf(d, e, queries, qids, k=10, nprobe=4).collect()

    qv = e.filter(F.col("vec_id").isin(qids))
    cos = brute_force_top_k(qv, e, k=20, round_digits=4).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    bm = bm25_topk(d, queries, k=20).select("query_id", "doc_id", "rank")
    want = rrf_fuse([bm, cos], k=10).select(
        "query_id", "doc_id", "rrf_score",
        F.col("rank_0").alias("bm25_rank"),
        F.col("rank_1").alias("cosine_rank"), "rank",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_ir_eval_metrics_hand_computed(spark):
    """recall/MRR/nDCG pinned against hand math: q0 has rel docs
    {1,2,9} with hits at ranks 1 and 3 (doc 9 missed); q1 has one rel
    doc found at rank 2; q2 has rel docs but NO hits -> zeros."""
    import math

    from wellmeet_data_pipeline_spark.operators.retrieval import ir_eval_metrics

    run = spark.createDataFrame(
        [
            (0, 1, 1), (0, 5, 2), (0, 2, 3), (0, 6, 4),
            (1, 7, 1), (1, 3, 2),
            (2, 8, 1),
        ],
        "query_id int, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 9), (1, 3), (2, 4)],
        "query_id int, doc_id long",
    )
    got = {r["query_id"]: r.asDict() for r in ir_eval_metrics(run, qrels, k=10).collect()}

    def term(r):
        return math.floor(1e6 * (math.log(2.0) / math.log(r + 1.0)) + 0.5)

    # q0: hits at ranks 1, 3 of 3 relevant
    dcg0 = term(1) + term(3)
    idcg0 = term(1) + term(2) + term(3)
    assert got[0]["n_rel"] == 3 and got[0]["n_hits"] == 2
    assert got[0]["recall_micro"] == 2 * 1_000_000 // 3
    assert got[0]["mrr_micro"] == 1_000_000
    assert got[0]["ndcg_micro"] == dcg0 * 1_000_000 // idcg0
    # q1: single relevant found at rank 2
    assert got[1]["recall_micro"] == 1_000_000
    assert got[1]["mrr_micro"] == 500_000
    assert got[1]["ndcg_micro"] == term(2) * 1_000_000 // term(1)
    # q2: relevant exists, nothing found
    assert got[2] == {
        "query_id": 2, "n_rel": 1, "n_hits": 0,
        "recall_micro": 0, "mrr_micro": 0, "ndcg_micro": 0,
    }


def test_ir_eval_metrics_duplicate_qrels_invariant(spark):
    """ir_eval_metrics dedups qrels internally (ADVICE r8): replicating
    every judgment row 3x must not change a single metric (duplicates
    would otherwise double-count n_rel/n_hits/dcg while idcg stays
    capped, inflating nDCG)."""
    from wellmeet_data_pipeline_spark.operators.retrieval import ir_eval_metrics

    run = spark.createDataFrame(
        [(0, 1, 1), (0, 5, 2), (0, 2, 3), (1, 7, 1), (1, 3, 2)],
        "query_id int, doc_id long, rank int",
    )
    base = [(0, 1), (0, 2), (0, 9), (1, 3)]
    qrels = spark.createDataFrame(base, "query_id int, doc_id long")
    qrels_dup = spark.createDataFrame(base * 3, "query_id int, doc_id long")
    want = sorted(map(tuple, ir_eval_metrics(run, qrels, k=10).collect()))
    got = sorted(map(tuple, ir_eval_metrics(run, qrels_dup, k=10).collect()))
    assert got == want


def test_mmr_diversify_hand_computed(spark):
    """Greedy MMR pinned against hand math (lam=0.5, micro grid):
    q0 has a near-duplicate pair (7, 8) — after 7 is picked, 8's high
    relevance is beaten by the diverse doc 9; q1 has fewer candidates
    than k and returns them all."""
    from wellmeet_data_pipeline_spark.operators.retrieval import mmr_diversify

    cand = spark.createDataFrame(
        [
            (0, 7, 1_000_000), (0, 8, 990_000), (0, 9, 500_000),
            (1, 3, 1_000_000), (1, 4, 400_000),
        ],
        "query_id int, doc_id long, rel_norm_micro long",
    )
    pairs = spark.createDataFrame(
        [(0, 7, 8, 950_000), (0, 7, 9, 10_000), (0, 8, 9, 20_000)],
        "query_id int, a long, b long, jac_micro long",
    )
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["mmr_micro"])
        for r in mmr_diversify(cand, pairs, k=3, lam_micro=500_000).collect()
    }
    M = 1_000_000
    # q0 step 1: no picks yet -> mmr = .5*rel + .5*1.0; doc 7 wins
    assert got[(0, 1)] == (7, 500_000 * M + 500_000 * M)
    # step 2: 8 -> .5*.99 + .5*(1-.95)=0.52; 9 -> .5*.5 + .5*(1-.01)=0.745
    assert got[(0, 2)] == (9, 500_000 * 500_000 + 500_000 * (M - 10_000))
    # step 3: only 8 left; max sim to {7,9} = .95
    assert got[(0, 3)] == (8, 500_000 * 990_000 + 500_000 * (M - 950_000))
    # q1 exhausts its 2 candidates before k=3
    assert got[(1, 1)] == (3, 500_000 * M + 500_000 * M)
    assert got[(1, 2)][0] == 4 and (1, 3) not in got
    assert len(got) == 5


def test_mmr_diversify_tie_breaks_on_lowest_doc(spark):
    from wellmeet_data_pipeline_spark.operators.retrieval import mmr_diversify

    cand = spark.createDataFrame(
        [(0, 20, 800_000), (0, 10, 800_000)],
        "query_id int, doc_id long, rel_norm_micro long",
    )
    pairs = spark.createDataFrame([], "query_id int, a long, b long, jac_micro long")
    got = {r["rank"]: r["doc_id"] for r in mmr_diversify(cand, pairs, k=2).collect()}
    assert got == {1: 10, 2: 20}


def test_mmr_diversify_null_inputs(spark):
    """NULL jac_micro rows honor the 'missing pair = 0' rule; a NULL
    rel_norm_micro candidate drops instead of crashing the UDF."""
    from wellmeet_data_pipeline_spark.operators.retrieval import mmr_diversify

    cand = spark.createDataFrame(
        [(0, 1, 900_000), (0, 2, None), (0, 3, 500_000)],
        "query_id int, doc_id long, rel_norm_micro long",
    )
    pairs = spark.createDataFrame(
        [(0, 1, 3, None)], "query_id int, a long, b long, jac_micro long"
    )
    got = {r["rank"]: r["doc_id"] for r in mmr_diversify(cand, pairs, k=3).collect()}
    assert got == {1: 1, 2: 3}  # doc 2 dropped; null pair scored as 0


def test_bm25_prf_expansion_retrieves_term_disjoint_doc(spark):
    """The PRF loop's point: a document sharing NO original query term
    but rich in the feedback docs' vocabulary enters the second-pass
    top-k; and the expansion skips quasi-stopwords (df cap)."""
    from wellmeet_data_pipeline_spark.operators.retrieval import (
        bm25_prf_topk,
        bm25_topk,
    )

    # enough filler that the expansion terms clear the quasi-stopword
    # df cap (df * 10 <= n_docs)
    filler = [(100 + i, f"filler text number {i} about unrelated matters entirely")
              for i in range(40)]
    docs = spark.createDataFrame(
        [
            # feedback docs: match 'spark' and carry the expansion term 'catalyst'
            (1, "spark engine catalyst catalyst optimizer"),
            (2, "spark catalyst catalyst planning"),
            # the term-disjoint target: only reachable via expansion
            (3, "catalyst catalyst catalyst rewrite rules"),
            *filler,
        ],
        "doc_id long, text string",
    )
    q = {0: ["spark"]}
    plain = {r["doc_id"] for r in bm25_topk(docs, q, k=5).collect()}
    assert 3 not in plain  # no shared term with the raw query
    prf = {r["doc_id"]: r["rank"] for r in bm25_prf_topk(docs, q, k=5).collect()}
    assert 3 in prf  # expansion pulled it in
    # determinism under repartitioning
    again = {r["doc_id"]: r["rank"]
             for r in bm25_prf_topk(docs.repartition(7), q, k=5).collect()}
    assert again == prf

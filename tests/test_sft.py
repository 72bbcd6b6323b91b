"""SFT / conversation-prep semantics (round 8)."""

from pyspark.sql import functions as F


def _stats(spark, convs):
    from wellmeet_data_pipeline_spark.operators.sft import turn_stats

    df = spark.createDataFrame(list(enumerate(convs)), "doc_id long, conv string")
    return {r["doc_id"]: r.asDict() for r in turn_stats(df, "conv").collect()}


def test_turn_stats_alternation_and_tokens(spark):
    convs = [
        # 0: proper user/assistant/user
        '[{"role":"user","content":"a b"},{"role":"assistant","content":"c"},{"role":"user","content":"d e f"}]',
        # 1: assistant-first -> not alternating
        '[{"role":"assistant","content":"x"},{"role":"user","content":"y"}]',
        # 2: adjacent same roles -> not alternating
        '[{"role":"user","content":"x"},{"role":"user","content":"y"}]',
        # 3: single user turn -> alternating (trivially)
        '[{"role":"user","content":"one two three"}]',
        # 4: empty conversation
        "[]",
        # 5: malformed JSON -> NULL stats
        '[{"role":"user"',
        # 6: empty contents count zero tokens but chars still zero
        '[{"role":"user","content":""},{"role":"assistant","content":""}]',
    ]
    got = _stats(spark, convs)
    assert got[0]["n_turns"] == 3 and got[0]["alternating"] == 1
    assert got[0]["n_user_tokens"] == 5 and got[0]["n_assistant_tokens"] == 1
    assert got[0]["n_content_chars"] == 3 + 1 + 5
    assert got[1]["alternating"] == 0
    assert got[2]["alternating"] == 0
    assert got[3]["alternating"] == 1 and got[3]["n_user_tokens"] == 3
    assert got[4] == {
        "doc_id": 4, "n_turns": 0, "alternating": 0,
        "n_user_tokens": 0, "n_assistant_tokens": 0, "n_content_chars": 0,
    }
    assert got[5]["n_turns"] is None and got[5]["alternating"] is None
    assert got[6]["n_user_tokens"] == 0 and got[6]["n_content_chars"] == 0


def test_render_chat_template(spark):
    from wellmeet_data_pipeline_spark.operators.sft import render_chat_template

    convs = [
        '[{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]',
        "[]",
        "not json",
    ]
    df = spark.createDataFrame(list(enumerate(convs)), "doc_id long, conv string")
    got = {r["doc_id"]: r["rendered"] for r in render_chat_template(df, "conv").collect()}
    assert got[0] == "<|user|>hi<|assistant|>yo<|end|>"
    assert got[1] == "<|end|>"
    assert got[2] is None


def test_render_chat_template_null_fields(spark):
    """A turn with a missing content (or role) key parses to a NULL
    struct field; the fold coalesces it to '' instead of letting
    concat() NULL the entire rendered string (ADVICE r8) — same rule
    turn_stats applies to NULL content."""
    from wellmeet_data_pipeline_spark.operators.sft import render_chat_template

    convs = [
        '[{"role":"user"},{"role":"assistant","content":"yo"}]',
        '[{"content":"hi"},{"role":"assistant","content":"yo"}]',
    ]
    df = spark.createDataFrame(list(enumerate(convs)), "doc_id long, conv string")
    got = {r["doc_id"]: r["rendered"] for r in render_chat_template(df, "conv").collect()}
    assert got[0] == "<|user|><|assistant|>yo<|end|>"
    assert got[1] == "<||>hi<|assistant|>yo<|end|>"


def test_preference_pairs_margins_and_ties(spark):
    from wellmeet_data_pipeline_spark.operators.sft import preference_pairs

    rows = [
        # prompt 1: clear margin
        (1, 10, 500), (1, 11, 100), (1, 12, 300),
        # prompt 2: all equal -> filtered (margin 0)
        (2, 20, 50), (2, 21, 50),
        # prompt 3: tied best -> highest id chosen; tied worst -> lowest id
        (3, 30, 900), (3, 31, 900), (3, 32, 100), (3, 33, 100),
    ]
    df = spark.createDataFrame(rows, "prompt long, resp long, score long")
    got = {
        r["prompt"]: (r["chosen"], r["rejected"], r["margin"])
        for r in preference_pairs(df, "prompt", "resp", "score").collect()
    }
    assert got[1] == (10, 11, 400)
    assert 2 not in got
    assert got[3] == (31, 32, 800)


def test_compression_ratio_exact_differential(spark):
    import zlib

    from wellmeet_data_pipeline_spark.operators.scoring import compression_ratio

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "spam spam spam spam spam spam spam spam spam spam",
        "",
        None,
        "한국어 텍스트 with mixed scripts and ünïcödé",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in compression_ratio(df).collect()}
    for i, t in enumerate(texts):
        raw = (t or "").encode("utf-8")
        comp = len(zlib.compress(raw, 6)) if raw else 0
        assert got[i]["n_bytes"] == len(raw)
        assert got[i]["n_compressed"] == comp
        assert got[i]["ratio_micro"] == comp * 1_000_000 // max(len(raw), 1)
    # the redundancy signal orders as expected: spam << prose
    assert got[1]["ratio_micro"] < got[0]["ratio_micro"]


def test_compression_ratio_registry_row_count(spark):
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    out = REGISTRY["compression_quality"].fn(spark, "/root/testdata/sf0.001")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert out.count() == docs.count()  # every doc reports, incl. null text


def test_turn_stats_null_content_contributes_zero(spark):
    # a turn missing "content" parses to NULL content on both engines;
    # totals must skip it (the oracle's list_sum semantics), not null out
    from wellmeet_data_pipeline_spark.operators.sft import turn_stats

    conv = '[{"role":"user","content":"a b"},{"role":"assistant"}]'
    df = spark.createDataFrame([(1, conv)], "doc_id long, conv string")
    r = turn_stats(df, "conv").collect()[0]
    assert r["n_turns"] == 2 and r["n_user_tokens"] == 2
    assert r["n_assistant_tokens"] == 0 and r["n_content_chars"] == 3


def test_compression_ratio_string_ids(spark):
    from wellmeet_data_pipeline_spark.operators.scoring import compression_ratio

    df = spark.createDataFrame(
        [("u1", "aaa bbb"), ("u2", None)], "url string, text string"
    )
    got = {r["url"]: r["n_bytes"] for r in compression_ratio(df, id_col="url").collect()}
    assert got == {"u1": 7, "u2": 0}


def test_cohens_kappa_hand_computed(spark):
    """kappa pinned against hand math, including the perfect-agreement,
    chance-level, and single-class-undefined cases."""
    from wellmeet_data_pipeline_spark.operators.scoring import cohens_kappa

    # 2x2: a=(x,x,x,y,y,y,x,y), b=(x,x,y,y,y,x,x,y)
    rows = list(zip("xxxyyyxy", "xxyyyxxy"))
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n, agree = 8, 6
    s = 4 * 4 + 4 * 4  # row/col marginals are 4/4 for both labels
    assert r["n_docs"] == n and r["n_agree"] == agree
    assert r["po_micro"] == agree * 1_000_000 // n
    assert r["pe_micro"] == s * 1_000_000 // (n * n)
    assert r["kappa_micro"] == (agree * n - s) * 1_000_000 // (n * n - s)  # 0.5

    # perfect agreement -> kappa 1.0
    perfect = spark.createDataFrame(list(zip("xyxy", "xyxy")), "a string, b string")
    assert cohens_kappa(perfect, "a", "b").collect()[0]["kappa_micro"] == 1_000_000

    # both raters emit ONE identical class -> pe = 1 -> kappa undefined
    single = spark.createDataFrame([("x", "x")] * 3, "a string, b string")
    assert cohens_kappa(single, "a", "b").collect()[0]["kappa_micro"] is None

    # systematic disagreement below chance -> NEGATIVE kappa
    anti = spark.createDataFrame(list(zip("xxyy", "yyxx")), "a string, b string")
    k = cohens_kappa(anti, "a", "b").collect()[0]["kappa_micro"]
    assert k == (0 * 4 - 8) * 1_000_000 // (16 - 8)  # -1.0 truncation path

"""URL canonicalization + domain-cap edge cases (round 8)."""

from pyspark.sql import functions as F


def _canon_one(spark, url):
    from wellmeet_data_pipeline_spark.operators.web import canonical_url

    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonical_url(F.col("url")).alias("c")).collect()[0]["c"]


def _domain_one(spark, url):
    from wellmeet_data_pipeline_spark.operators.web import url_domain

    df = spark.createDataFrame([(url,)], "url string")
    return df.select(url_domain(F.col("url")).alias("d")).collect()[0]["d"]


def test_canonical_url_cases(spark):
    cases = {
        # scheme + host case-fold
        "HTTPS://WWW.Example.COM/A/b": "https://www.example.com/A/b",
        # default ports dropped, either scheme
        "http://x.com:80/p": "http://x.com/p",
        "https://x.com:443/p": "https://x.com/p",
        # non-default port kept
        "https://x.com:8443/p": "https://x.com:8443/p",
        # the OTHER scheme's default port is NOT dropped
        "http://x.com:443/p": "http://x.com:443/p",
        # userinfo stripped
        "https://user:pw@x.com/p": "https://x.com/p",
        # empty path -> "/", with and without query
        "https://x.com": "https://x.com/",
        "https://x.com?b=2&a=1": "https://x.com/?a=1&b=2",
        # trailing slash runs stripped (root slash survives)
        "https://x.com/a/b///": "https://x.com/a/b",
        "https://x.com///": "https://x.com/",
        # fragment dropped
        "https://x.com/p#frag": "https://x.com/p",
        # tracking params dropped: utm_* prefix, bare key, key=value
        "https://x.com/p?utm_source=rss&id=3": "https://x.com/p?id=3",
        "https://x.com/p?ref": "https://x.com/p",
        "https://x.com/p?gclid=abc": "https://x.com/p",
        # params byte-sorted; empty params dropped
        "https://x.com/p?z=9&&a=1": "https://x.com/p?a=1&z=9",
        # a NON-tracking param that merely contains a tracking substring
        # must survive ("referrer" is not "ref")
        "https://x.com/p?referrer=1": "https://x.com/p?referrer=1",
        # a '?' INSIDE the fragment is fragment text, not a query — the
        # fragment strips first (review catch: fragment-only variants
        # must share one canonical key)
        "https://x.com/p#sec?a=1": "https://x.com/p",
        "https://x.com/p?id=3#tab?b=2": "https://x.com/p?id=3",
    }
    for url, want in cases.items():
        assert _canon_one(spark, url) == want, url


def test_canonical_url_non_urls_are_null(spark):
    for url in ["www.x.com/p", "not a url", "", "x.com:80"]:
        assert _canon_one(spark, url) is None, url
    from wellmeet_data_pipeline_spark.operators.web import canonical_url

    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(canonical_url(F.col("url")).alias("c")).collect()[0]["c"] is None


def test_canonical_url_idn_hosts_casefold_not_punycode(spark):
    # contract: IDN hosts are case-folded, NOT punycoded (module docstring)
    assert (
        _canon_one(spark, "https://MÜNCHEN.example/Straße")
        == "https://münchen.example/Straße"
    )
    assert _domain_one(spark, "https://WWW.MÜNCHEN.example/x") == "münchen.example"


def test_url_domain_strips_www_and_port(spark):
    assert _domain_one(spark, "https://WWW.News.Example.COM:8080/a") == (
        "news.example.com"
    )
    assert _domain_one(spark, "https://u:p@www.x.com/a") == "x.com"
    # www-less host unchanged; wwwx is not www.
    assert _domain_one(spark, "https://wwwx.com/a") == "wwwx.com"
    assert _domain_one(spark, "nota url") is None


def test_domain_doc_caps_semantics_and_plan(spark):
    from wellmeet_data_pipeline_spark.operators.web import domain_doc_caps

    rows = [(i, f"https://{'a' if i < 5 else 'b'}.com/p{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = domain_doc_caps(df, cap=3)
    got = {
        r["doc_id"]: (r["domain"], r["domain_rank"], r["n_domain_docs"], r["keep"])
        for r in out.collect()
    }
    # domain a.com: ids 0-4 -> ranks 1..5, first 3 kept; b.com: 5-7 all kept
    assert got[0] == ("a.com", 1, 5, 1) and got[2] == ("a.com", 3, 5, 1)
    assert got[3] == ("a.com", 4, 5, 0) and got[4] == ("a.com", 5, 5, 0)
    assert all(got[i][3] == 1 for i in (5, 6, 7))
    # skew-free contract: no window partitioned by the domain key — every
    # windowspecdefinition is pid-scoped (global_rank_cumsum's local pass)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(domain" not in plan


def test_streaming_domain_caps_matches_batch_and_replays(spark, tmp_path):
    """In ascending-id arrival the streaming admission gate reproduces
    batch domain_doc_caps' survivor set exactly; the cap holds ACROSS
    batches (a domain filled in batch 1 admits nothing later); replays
    and re-deliveries are no-ops because rejected docs are stored too."""
    import json

    from pyspark.sql.types import StructType

    from wellmeet_data_pipeline_spark.operators.web import domain_doc_caps
    from wellmeet_data_pipeline_spark.streaming.web import (
        current_domain_survivors,
        run_streaming_domain_caps,
    )

    landing = tmp_path / "dc_landing"
    landing.mkdir()
    store = str(tmp_path / "dc_store")
    schema = StructType.fromDDL("doc_id long, url string")

    docs = [(i, f"https://{'a' if i % 2 == 0 else 'b'}.com/p{i}") for i in range(10)]
    docs.append((10, "no scheme here"))  # non-URL: rejected tombstone row
    # doc 0 delivered TWICE in batch 1: within-batch dedup must yield one
    # decision row, not two rows tying on _batch_seq (review catch)
    (landing / "b1.json").write_text(
        json.dumps([{"doc_id": i, "url": u} for i, u in docs[:4] + [docs[0]]])
    )
    run_streaming_domain_caps(
        spark, str(landing), store, str(tmp_path / "dc_c1"), schema, cap=3
    )
    (landing / "b2.json").write_text(
        json.dumps([{"doc_id": i, "url": u} for i, u in docs[4:]])
    )
    run_streaming_domain_caps(
        spark, str(landing), store, str(tmp_path / "dc_c2"), schema, cap=3
    )

    got = {
        (r["doc_id"], r["domain"])
        for r in current_domain_survivors(spark, store).collect()
    }
    df = spark.createDataFrame(docs, "doc_id long, url string")
    want = {
        (r["doc_id"], r["domain"])
        for r in domain_doc_caps(df, cap=3).filter(F.col("keep") == 1).collect()
    }
    assert got == want
    # cap held across batches: ids 0,2,4 for a.com (6, 8 arrived after the
    # domain filled), 1,3,5 for b.com
    assert got == {(0, "a.com"), (2, "a.com"), (4, "a.com"),
                   (1, "b.com"), (3, "b.com"), (5, "b.com")}

    # fresh-checkpoint full replay: every doc already has a decision row,
    # so the store is unchanged — including the REJECTED rows and the
    # non-URL tombstone (doc 10: keep=0, domain NULL — without it every
    # replay would re-examine the doc forever)
    rows_before = sorted(
        (r["doc_id"], r["keep"])
        for r in spark.read.parquet(store).select("doc_id", "keep").collect()
    )
    assert len(rows_before) == 11  # one decision per doc, none duplicated
    assert (10, 0) in rows_before and (0, 1) in rows_before
    run_streaming_domain_caps(
        spark, str(landing), store, str(tmp_path / "dc_c3"), schema, cap=3
    )
    rows_after = sorted(
        (r["doc_id"], r["keep"])
        for r in spark.read.parquet(store).select("doc_id", "keep").collect()
    )
    assert rows_after == rows_before


def test_canonical_url_is_idempotent(spark):
    """Canonicalization is a FIXPOINT: canonical(canonical(u)) ==
    canonical(u), and the grouping domain is invariant under
    canonicalization — the contract that makes the canonical form a
    stable dedup key across repeated pipeline passes."""
    from wellmeet_data_pipeline_spark.operators.web import canonical_url, url_domain

    urls = [
        "HTTPS://User:Pw@WWW.Ex.COM:443/A/b///?utm_source=r&z=2&a=1#f",
        "http://x.com:80?gclid=1",
        "https://cdn.x.org:8443/static/img_9",
        "HTTP://a.NET/p/3/?ref=tw&z=9&y=8",
        "https://x.com/p#sec?a=1",
        "https://münchen.example/Straße?b=2&a=1",
        "https://x.com",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(
        canonical_url(F.col("url")).alias("c1"),
        url_domain(F.col("url")).alias("d1"),
    ).localCheckpoint(eager=True)
    twice = once.select(
        "c1",
        "d1",
        canonical_url(F.col("c1")).alias("c2"),
        url_domain(F.col("c1")).alias("d2"),
    )
    for r in twice.collect():
        assert r["c2"] == r["c1"], r
        assert r["d2"] == r["d1"], r

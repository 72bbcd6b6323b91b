import hashlib

from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.functions.text import (
    clean_address,
    document_fingerprint,
    extract_place_id,
    language_guess,
    normalized_text,
    review_surrogate_id,
    token_count,
    url_decode,
    word_shingles,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_clean_address_strips_building_suffix(spark):
    # shape from restaurant-crawler/restaurant-crawler.py:20-37
    got = _one(spark, clean_address(F.lit("서울특별시 마포구 마포대로 109 롯데캐슬프레지던트 101동 2층")))
    assert got == "서울특별시 마포구 마포대로 109"


def test_clean_address_no_match_empty(spark):
    assert _one(spark, clean_address(F.lit("no korean address here"))) == ""


def test_extract_place_id(spark):
    got = _one(spark, extract_place_id(F.lit("https://map.naver.com/v5/entry/place/31238198?c=15")))
    assert got == "31238198"


def test_review_surrogate_id_matches_reference_hash(spark):
    # review-crawler/naver_crawler.py:172-177: sha256("author|content|date")
    expected = hashlib.sha256("김철수|맛있어요|7.25.금".encode()).hexdigest()
    got = _one(
        spark, review_surrogate_id(F.lit("김철수"), F.lit("맛있어요"), F.lit("7.25.금"))
    )
    assert got == expected


def test_token_count(spark):
    assert _one(spark, token_count(F.lit("  a b   c  "))) == 3
    assert _one(spark, token_count(F.lit(""))) == 0


def test_language_guess_scripts(spark):
    assert _one(spark, language_guess(F.lit("안녕하세요 맛집입니다"))) == "ko"
    assert _one(spark, language_guess(F.lit("das ist nicht gut und"))) == "de"
    assert _one(spark, language_guess(F.lit("the cat is on the mat"))) == "en"


def test_normalized_text_and_fingerprint(spark):
    a = _one(spark, document_fingerprint(F.lit("Hello,   World!")))
    b = _one(spark, document_fingerprint(F.lit("hello world")))
    assert a == b
    assert _one(spark, normalized_text(F.lit("Hello,   World!"))) == "hello world"


def test_word_shingles(spark):
    got = _one(spark, word_shingles(F.lit("a b c d"), 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, word_shingles(F.lit("a b"), 3)) == []


def test_url_decode_unquote_plus(spark):
    assert _one(spark, url_decode(F.lit("%EA%B3%B5%EB%8D%95+%EC%8B%9D%EB%8B%B9.json"))) == "공덕 식당.json"


def test_clean_address_reference_parity(spark):
    # differential test: Spark (?U)-ported regex vs the reference's Python
    # re behavior (restaurant-crawler.py:20-37)
    import re as _re

    regex = (
        r"(\w+[원,산,남,울,북,천,주,기,시,도]\s*)?"
        r"(\w+[구,시,군]\s*)?(\w+[구,시]\s*)?"
        r"(\w+[면,읍]\s*)"
        r"?(\w+\d*\w*[동,리,로,길]\s*)"
        r"?(\w*\d+-?\d*)?"
    )

    def reference_clean(address):
        if not address:
            return ""
        m = _re.search(regex, address)
        return m.group().strip() if m else address

    samples = [
        "서울특별시 마포구 마포대로 109 롯데캐슬프레지던트 101동 2층",
        "경기도 수원시 팔달구 인계로 123-45 스타빌딩",
        "부산광역시 해운대구 센텀중앙로 55",
        "강원도 춘천시 동면 장학리 123",
        "서울 강남구 테헤란로 427",
        "공덕동 310-3",
        "",
        "no korean at all 123",
    ]
    from wellmeet_data_pipeline_spark.functions.text import clean_address_reference

    df = spark.createDataFrame([(s,) for s in samples], "addr string")
    got = [r["v"] for r in df.select(clean_address_reference(F.col("addr")).alias("v")).collect()]
    expected = [reference_clean(s) for s in samples]
    assert got == expected


def test_normalize_nfc_composes_combining_marks(spark):
    from wellmeet_data_pipeline_spark.functions.text import normalize_nfc

    decomposed = "Café"          # e + COMBINING ACUTE
    composed = "Café"             # é precomposed
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["nfc_text"] for r in normalize_nfc(df).collect()}
    assert got[1] == composed == got[2]
    assert got[3] is None


def test_strip_html_tags_entities_whitespace(spark):
    from wellmeet_data_pipeline_spark.functions.text import strip_html

    df = spark.createDataFrame(
        [
            (1, "<div class='x'>Hello <b>world</b>&nbsp;&amp; friends</div>"),
            (2, "plain text stays"),
            (3, "a &lt;tag&gt; literal &#39;quoted&#39;"),
            (4, "escaped: &amp;lt;b&amp;gt; stays text"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["clean"] for r in df.select("doc_id", strip_html("text").alias("clean")).collect()}
    assert got[1] == "Hello world & friends"
    assert got[2] == "plain text stays"
    assert got[3] == "a <tag> literal 'quoted'"
    # author-escaped entities must decode ONE level, not two: &amp;lt;
    # renders as the literal text &lt;, never as a fake <b> tag
    assert got[4] == "escaped: &lt;b&gt; stays text"


def test_script_mix_counts_and_flag(spark):
    from wellmeet_data_pipeline_spark.functions.text import script_counts
    from pyspark.sql import functions as F

    rows = [
        (1, "hello world"),            # pure latin
        (2, "안녕 hello"),              # hangul + latin, mixed
        (3, "Привет"),                 # pure cyrillic
        (4, "12345 !!"),               # no script chars at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in df.select("doc_id", *script_counts("text")).collect()}
    assert (got[1]["n_latin"], got[1]["n_hangul"]) == (10, 0)
    assert (got[2]["n_hangul"], got[2]["n_latin"]) == (2, 5)
    assert got[3]["n_cyrillic"] == 6
    assert sum(got[4][c] for c in ("n_hangul", "n_cjk", "n_cyrillic", "n_latin")) == 0

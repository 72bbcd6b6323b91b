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

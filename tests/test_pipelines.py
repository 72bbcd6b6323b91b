from wellmeet_data_pipeline_spark.functions.enrichment import (
    embed_text,
    geocode_via_reference,
    geocode_with_cache,
)
from wellmeet_data_pipeline_spark.pipelines import (
    discover_restaurants,
    ingest_reviews,
    process_landed_restaurants,
    project_payloads,
)
from wellmeet_data_pipeline_spark.sinks.merge import read_current


def _restaurant_fetcher():
    def fetch(query: str, page: int):
        return [
            {
                "place_id": f"{hash(query) % 1000}{page}{i}",
                "name": f"식당 {query}-{page}-{i}",
                "thumbnail_url": "",
                "category": "한식",
                "page": page,
                "origin_address": "서울특별시 마포구 마포대로 109 롯데캐슬 2층",
            }
            for i in range(2)
        ]

    return fetch


def _review_fetcher():
    def fetch(place_id: str, page: int):
        return [
            {"author": "a", "content": f"review {i} of {place_id}", "visit_date": "7.25.금", "place_id": place_id}
            for i in range(3)
        ]

    return fetch


def test_discover_restaurants_incremental(spark, tmp_path):
    store = str(tmp_path / "restaurants")
    first = discover_restaurants(spark, ["공덕역 식당"], _restaurant_fetcher(), store, pages=2)
    assert first.count() == 4
    # second run: same feed → zero new rows (J1 anti join vs store)
    second = discover_restaurants(
        spark, ["공덕역 식당"], _restaurant_fetcher(), store, pages=2, batch_seq=1
    )
    assert second.count() == 0
    cur = read_current(spark, store, id_col="place_id")
    assert cur.count() == 4
    addr = cur.select("address").first()["address"]
    assert addr == "서울특별시 마포구 마포대로 109"


def test_ingest_reviews_incremental(spark, tmp_path):
    store = str(tmp_path / "reviews")
    first = ingest_reviews(spark, ["p1", "p2"], _review_fetcher(), store)
    assert first.count() == 6
    again = ingest_reviews(spark, ["p1", "p2"], _review_fetcher(), store, batch_seq=1)
    assert again.count() == 0


def test_process_landed_restaurants(spark):
    landed = spark.createDataFrame(
        [
            ("1", "r1", None, None, None, None, None, None, None),
            (None, "r2", None, None, None, None, None, None, None),  # dropped: P4
            ("3", "r3", None, None, None, "addr", "addr", 1.0, 2.0),
        ],
        "place_id string, name string, thumbnail_url string, category string, page int, "
        "origin_address string, address string, latitude double, longitude double",
    )
    existing = spark.createDataFrame([("r3", "addr")], "name string, address string")
    out = process_landed_restaurants(landed, existing)
    rows = {r["name"]: r for r in out.collect()}
    assert set(rows) == {"r1"}
    assert rows["r1"]["address"] == "" and rows["r1"]["latitude"] == 0.0  # P7 defaults


def test_project_payloads_limit(spark):
    reviews = spark.createDataFrame(
        [(f"h{i}", str(i), "c") for i in range(20)], "id string, place_id string, content string"
    )
    assert project_payloads(reviews, limit_per_event=10).count() == 10


def test_geocode_with_cache_and_reference(spark):
    df = spark.createDataFrame([("addr1",), ("addr1",), ("miss",)], "address string")

    def geo(addr):
        return (37.5, 126.9) if addr == "addr1" else None

    out = {r["address"]: (r["latitude"], r["longitude"]) for r in geocode_with_cache(df, geo).collect()}
    assert out["addr1"] == (37.5, 126.9)
    assert out["miss"] == (None, None)

    ref = spark.createDataFrame([("addr1", 37.5, 126.9)], "address string, latitude double, longitude double")
    out2 = geocode_via_reference(df, ref)
    assert out2.filter("latitude IS NOT NULL").count() == 2


def test_embed_text_deterministic_unit_norm(spark):
    df = spark.createDataFrame([("1", "hello"), ("2", "hello"), ("3", "other")], "id string, content string")
    rows = {r["id"]: r["embedding"] for r in embed_text(df, dim=16).collect()}
    assert rows["1"] == rows["2"]
    assert rows["1"] != rows["3"]
    assert abs(sum(x * x for x in rows["1"]) - 1.0) < 1e-5

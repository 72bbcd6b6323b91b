import math

from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.geo import (
    geo_within_km,
    haversine_km,
    resolve_nearby_places,
)


def test_haversine_known_distance(spark):
    # Seoul City Hall -> Gangnam station: great-circle 8.78 km
    df = spark.createDataFrame(
        [(37.5663, 126.9779, 37.4979, 127.0276)], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    d = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()[0]["d"]
    assert abs(d - 8.778) < 0.01


def test_geo_within_km_bin_join_matches_bruteforce(spark):
    # ring of points around a center; radius filter must match brute force
    center = (37.5663, 126.9779)
    pts = []
    for i in range(24):
        ang = 2 * math.pi * i / 24
        # points at 0.5, 1.5, 2.5 km from center
        for j, r_km in enumerate((0.5, 1.5, 2.5)):
            dlat = (r_km / 111.195) * math.cos(ang)
            dlon = (r_km / (111.195 * math.cos(math.radians(center[0])))) * math.sin(ang)
            pts.append((i * 3 + j, center[0] + dlat, center[1] + dlon))
    left = spark.createDataFrame([(0, center[0], center[1])], "l_id long, lat double, lon double")
    right = spark.createDataFrame(pts, "r_id long, lat double, lon double")

    got = {r["r_id"] for r in geo_within_km(left, right, km=2.0).collect()}
    # brute force truth
    truth = set()
    for rid, la, lo in pts:
        d = 2 * 6371.0088 * math.asin(
            math.sqrt(
                math.sin(math.radians(la - center[0]) / 2) ** 2
                + math.cos(math.radians(center[0]))
                * math.cos(math.radians(la))
                * math.sin(math.radians(lo - center[1]) / 2) ** 2
            )
        )
        if d <= 2.0:
            truth.add(rid)
    assert got == truth and len(truth) == 48  # the 0.5 and 1.5 km rings


def test_geo_within_km_high_latitude(spark):
    # at 75°N one km spans ~3.9x more longitude — adaptive lon fan-out
    # must still find the pair a fixed 3x3 neighborhood would miss
    left = spark.createDataFrame([(1, 75.0, 20.0)], "l_id long, lat double, lon double")
    # ~1.8 km due east at 75N: dlon = 1.8 / (111.195*cos(75))
    dlon = 1.8 / (111.195 * math.cos(math.radians(75.0)))
    right = spark.createDataFrame([(2, 75.0, 20.0 + dlon)], "r_id long, lat double, lon double")
    got = geo_within_km(left, right, km=2.0).collect()
    assert len(got) == 1 and abs(got[0]["distance_km"] - 1.8) < 0.05


def test_geo_within_km_secant_breakpoint_cell_straddle(spark):
    # Regression net for the lon fan-out margin: near the sec(lat)=2
    # breakpoint the widest within-2km pair spans ~2.004 lon cells (maximum
    # over lat placements lands at 60.069°N, found numerically), and floor
    # binning across a cell boundary puts such a pair THREE cells apart.
    # Constructed exactly: left sits 1e-9° inside the right edge of cell
    # 1000, right sits 2.0038 cells east (floor -> cell 1003); haversine
    # 1.998 km < 2.0 so it is a true pair the join must emit.
    cell_deg = 2.0 / 111.195
    lat = 60.069
    lon_l = 1001 * cell_deg - 1e-9        # floor -> cell 1000
    lon_r = lon_l + 0.036042              # 2.0038 cells -> floor cell 1003
    assert math.floor(lon_r / cell_deg) - math.floor(lon_l / cell_deg) == 3
    left = spark.createDataFrame([(1, lat, lon_l)], "l_id long, lat double, lon double")
    right = spark.createDataFrame([(2, lat, lon_r)], "r_id long, lat double, lon double")
    got = geo_within_km(left, right, km=2.0).collect()
    assert len(got) == 1 and got[0]["distance_km"] <= 2.0


def test_geo_within_km_scatter_matches_bruteforce_60N(spark):
    # deterministic scatter around 60°N spanning several cells in both
    # axes; the grid join must reproduce the brute-force pair set exactly
    pts = []
    for i in range(60):
        la = 59.98 + (i * 7 % 60) * 0.0016         # 59.98 .. 60.074
        lo = 18.0 + (i * 13 % 60) * 0.002          # 18.0 .. 18.12
        pts.append((i, la, lo))
    left = spark.createDataFrame(pts, "l_id long, lat double, lon double")
    right = spark.createDataFrame(
        [(i + 1000, la, lo) for i, la, lo in pts], "r_id long, lat double, lon double"
    )
    got = {
        (r["l_id"], r["r_id"])
        for r in geo_within_km(left, right, km=2.0).collect()
    }
    truth = set()
    for i, la1, lo1 in pts:
        for j, la2, lo2 in pts:
            d = 2 * 6371.0088 * math.asin(
                math.sqrt(
                    math.sin(math.radians(la2 - la1) / 2) ** 2
                    + math.cos(math.radians(la1))
                    * math.cos(math.radians(la2))
                    * math.sin(math.radians(lo2 - lo1) / 2) ** 2
                )
            )
            if round(d, 6) <= 2.0:
                truth.add((i, j + 1000))
    assert got == truth and len(truth) > 100


def test_resolve_nearby_places_entity_resolution(spark):
    places = spark.createDataFrame(
        [
            ("A1", "Cafe Luna", 37.56630, 126.97790),
            ("A2", "Cafe Luna ", 37.56655, 126.97810),   # ~30m away, name variant
            ("B1", "Cafe Luna", 37.58000, 126.99000),    # same name, 1.9km away: distinct
            ("C1", "Burger Haus", 37.56630, 126.97800),  # 9m from A1, different name
        ],
        "place_id string, name string, latitude double, longitude double",
    )
    kept = {r["place_id"] for r in resolve_nearby_places(places, meters=50).collect()}
    assert kept == {"A1", "B1", "C1"}  # A2 collapses into A1


def test_geo_within_km_antimeridian_and_pole_guard(spark):
    left = spark.createDataFrame(
        [
            (1, 0.0, 179.9955),   # ~1 km from the seam partner
            (2, 90.0, 0.0),       # bad-geocode sentinel: must be dropped, not explode
        ],
        "l_id long, lat double, lon double",
    )
    right = spark.createDataFrame(
        [(10, 0.0, -179.9955), (11, 89.9, 10.0)],
        "r_id long, lat double, lon double",
    )
    got = {(r["l_id"], r["r_id"]) for r in geo_within_km(left, right, km=2.0).collect()}
    assert got == {(1, 10)}  # seam pair found; polar rows silently excluded


def test_resolve_nearby_places_normalizes_names(spark):
    places = spark.createDataFrame(
        [
            ("A1", "CAFE LUNA", 37.56630, 126.97790),
            ("A2", "Cafe Luna!", 37.56640, 126.97795),  # case+punct variant, ~12m
        ],
        "place_id string, name string, latitude double, longitude double",
    )
    kept = {r["place_id"] for r in resolve_nearby_places(places, meters=50).collect()}
    assert kept == {"A1"}


def test_grid_neighbor_pairs_matches_brute_force(spark):
    from itertools import combinations

    from wellmeet_data_pipeline_spark.operators.geo import grid_neighbor_pairs

    pts = [(i, (i * 379) % 1000, (i * 613) % 1000) for i in range(60)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    want = sorted(
        (a, b, max(abs(xa - xb), abs(ya - yb)))
        for (a, xa, ya), (b, xb, yb) in combinations(pts, 2)
        if max(abs(xa - xb), abs(ya - yb)) <= 150
    )
    got = sorted(
        (r.id_a, r.id_b, r.chebyshev)
        for r in grid_neighbor_pairs(df, radius=150).collect()
    )
    assert got == want and len(got) > 0


def test_grid_neighbor_pairs_guards(spark):
    import pytest as _pytest

    from wellmeet_data_pipeline_spark.operators.geo import grid_neighbor_pairs

    df = spark.createDataFrame(
        [(1, 0, 0), (2, 5, 5), (None, 1, 1), (3, None, 2)],
        "id long, x long, y long",
    )
    got = grid_neighbor_pairs(df, radius=10).collect()
    # NULL id / NULL coord rows dropped; the surviving pair found once
    assert [(r.id_a, r.id_b, r.chebyshev) for r in got] == [(1, 2, 5)]
    with _pytest.raises(ValueError):
        grid_neighbor_pairs(df, radius=10, cell=5)

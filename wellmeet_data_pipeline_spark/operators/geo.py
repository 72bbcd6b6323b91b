"""Geo operators for the reference's geocoded-restaurant domain
(restaurant-crawler.py:39-53 produces latitude/longitude; SURVEY §2.11
F10/X2).  The scale piece is the WITHIN-DISTANCE JOIN: naive is an
O(n·m) cross join with a trig filter; the distributed form bins points
into lat/lon grid cells sized to the search radius and equi-joins on
cell — the same bin-then-verify topology as range_join_within and the
LSH families: candidates by equi-join, exactness by a cheap verify
predicate."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG_LAT = 111.195  # pi/180 * mean earth radius


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — pure JVM trig, stays in codegen."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_within_km(
    left: DataFrame,
    right: DataFrame,
    km: float,
    left_id: str = "l_id",
    right_id: str = "r_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(left_id, right_id, distance_km) for every cross-frame pair within
    `km`.  Grid cells are km-sized in latitude; the LEFT side explodes
    into its neighbor cells — 3 lat cells x (2·ceil(1/cos lat)+1) lon
    cells, so the fan-out adapts to longitude convergence.  Only (cell,
    id, lat, lon) tuples shuffle; the haversine verify runs per
    candidate, never per cross pair.

    Robustness: rows with |lat| > 85° are DROPPED on both sides — above
    that the lon fan-out grows without bound (a single bad-geocode
    sentinel like lat=90 would otherwise explode ~10^16 cells and kill
    the job; polar data needs a polar-cap cell scheme, not a lat/lon
    grid).  The antimeridian IS handled: left rows within the search
    margin of ±180° get a second cell-computation copy shifted by 360°,
    so pairs straddling the seam still meet — haversine itself is
    wrap-correct (sin²(Δλ/2) is periodic), so the verify needs no
    change."""
    cell_deg = km / KM_PER_DEG_LAT

    def cells(df: DataFrame, idc: str, explode_neighbors: bool) -> DataFrame:
        df = df.filter(F.abs(F.col(lat_col)) <= 85.0)
        lat_cell = F.floor(F.col(lat_col) / cell_deg)
        if not explode_neighbors:
            return df.select(
                F.col(idc),
                F.col(lat_col).alias("__lat"),
                F.col(lon_col).alias("__lon"),
                lat_cell.alias("__clat"),
                F.floor(F.col(lon_col) / cell_deg).alias("__clon"),
            )
        # Lon fan-out must cover the WORST latitude either partner can sit
        # at, not this row's: the partner may be up to one lat cell closer
        # to the pole (|lat|+cell_deg), where convergence is stronger, and
        # floor-binning lets two points Δlon apart land floor(Δ/cell)+1
        # cells apart (a within-2km pair near 60°N spans up to ~2.004 lon
        # cells — numerically maximized at 60.069°N — i.e. THREE cells
        # after the floor straddle).  ceil(sec(own lat)) happens to cover
        # every realizable pair at this radius only by razor-thin float
        # margins, so take the conservative bound instead:
        # n_lon = ceil(sec(|lat|+cell_deg)) + 1.  Clamped below 89.5° so a
        # large radius near the 85° cutoff can't push sec() negative.
        worst_lat = F.least(F.abs(F.col(lat_col)) + F.lit(cell_deg), F.lit(89.5))
        n_lon = F.ceil(1.0 / F.cos(F.radians(worst_lat))) + 1
        margin = (n_lon + 1) * cell_deg
        seam_lon = F.when(F.col(lon_col) > 0, F.col(lon_col) - 360).otherwise(
            F.col(lon_col) + 360
        )
        lons = F.when(
            F.lit(180.0) - F.abs(F.col(lon_col)) <= margin,
            F.array(F.col(lon_col), seam_lon),
        ).otherwise(F.array(F.col(lon_col)))
        return (
            df.select(
                F.col(idc),
                F.col(lat_col).alias("__lat"),
                F.col(lon_col).alias("__lon"),
                F.explode(F.sequence(lat_cell - 1, lat_cell + 1)).alias("__clat"),
                lons.alias("__lons"),
                n_lon.alias("__n"),
            )
            .select(
                idc, "__lat", "__lon", "__clat", "__n",
                F.explode("__lons").alias("__cell_lon"),
            )
            .select(
                idc,
                "__lat",
                "__lon",
                "__clat",
                F.explode(
                    F.sequence(
                        F.floor(F.col("__cell_lon") / cell_deg) - F.col("__n"),
                        F.floor(F.col("__cell_lon") / cell_deg) + F.col("__n"),
                    )
                ).alias("__clon"),
            )
        )

    lc = cells(left, left_id, explode_neighbors=True)
    rc = cells(right, right_id, explode_neighbors=False)
    dist = haversine_km(
        F.col("a.__lat"), F.col("a.__lon"), F.col("b.__lat"), F.col("b.__lon")
    )
    return (
        lc.alias("a")
        .join(rc.alias("b"), on=["__clat", "__clon"], how="inner")
        .withColumn("distance_km", F.round(dist, 6))
        .filter(F.col("distance_km") <= km)
        .select(left_id, right_id, "distance_km")
        .distinct()
    )


def resolve_nearby_places(
    places: DataFrame,
    meters: float = 50.0,
    max_name_edits: int = 2,
    id_col: str = "place_id",
    name_col: str = "name",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Place entity resolution: the same venue crawled twice lands with a
    slightly different geocode and a name variant (the reference's
    crawler re-discovers places across runs; its sha-identity can't
    catch this).  Pipeline: grid-binned self-join for pairs within
    `meters` -> name-edit-distance verify (levenshtein, JVM-side) ->
    connected components -> keep the min-id survivor per cluster.  The
    same candidates-then-verify-then-cluster topology as the text
    near-dup family, with geography as the blocking key."""
    from wellmeet_data_pipeline_spark.operators.dedup import dedup_cluster_survivors

    pts = places.select(
        F.col(id_col), F.col(name_col), F.col(lat_col).alias("lat"), F.col(lon_col).alias("lon")
    )
    l = pts.select(F.col(id_col).alias("l_id"), "lat", "lon")
    r = pts.select(F.col(id_col).alias("r_id"), "lat", "lon")
    cand = geo_within_km(l, r, km=meters / 1000.0).filter(F.col("l_id") < F.col("r_id"))
    # levenshtein over NORMALIZED names (lowercase, punctuation stripped,
    # whitespace collapsed): 'CAFE LUNA' vs 'Cafe Luna' is the most common
    # re-crawl variant and must count as 0 edits, not 7
    from wellmeet_data_pipeline_spark.functions.text import normalized_text

    names_l = pts.select(
        F.col(id_col).alias("l_id"), normalized_text(F.col(name_col)).alias("__ln")
    )
    names_r = pts.select(
        F.col(id_col).alias("r_id"), normalized_text(F.col(name_col)).alias("__rn")
    )
    verified = (
        cand.join(names_l, "l_id")
        .join(names_r, "r_id")
        .filter(F.levenshtein(F.col("__ln"), F.col("__rn")) <= max_name_edits)
        .select(F.col("l_id").alias("id_a"), F.col("r_id").alias("id_b"))
    )
    return dedup_cluster_survivors(places, verified, id_col=id_col)


def grid_neighbor_pairs(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    radius: int = 10_000,
    cell: int | None = None,
) -> DataFrame:
    """Within-radius pairs over exact INTEGER planar coordinates
    (micro-degrees, metres, grid units) via 3x3 cell blocking — the
    oracle-checkable integer twin of geo_within_km: identical
    candidates-by-cell-equi-join topology, but the verify predicate is
    exact integer Chebyshev distance instead of libm haversine, so both
    engines agree bit-for-bit.  One side explodes to its 3x3 neighbor
    cells (cell >= radius guarantees coverage), the other joins on its
    home cell; each unordered pair meets exactly twice (A's explosion
    finds B's home and vice versa), so id_a < id_b keeps exactly one.

    Coordinates must be NON-NEGATIVE integers: integer cell ids come
    from division, and floor-division (DuckDB //) vs truncation agree
    only above zero.  NULL ids/coords are dropped.
    """
    c = cell or radius
    if c < radius:
        raise ValueError(f"cell {c} < radius {radius} breaks 3x3 coverage")
    pts = (
        points.filter(
            F.col(id_col).isNotNull()
            & F.col(x_col).isNotNull()
            & F.col(y_col).isNotNull()
        )
        .select(
            F.col(id_col).alias("__id"),
            F.col(x_col).cast("long").alias("__x"),
            F.col(y_col).cast("long").alias("__y"),
        )
        # both join legs consume this frame
        .localCheckpoint(eager=True)
    )
    home = pts.select(
        F.col("__id").alias("id_b"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        (F.col("__x") / F.lit(c)).cast("long").alias("__cx"),
        (F.col("__y") / F.lit(c)).cast("long").alias("__cy"),
    )
    off = F.explode(F.lit([-1, 0, 1]))
    fan = (
        pts.withColumn("__dx", off)
        .withColumn("__dy", F.explode(F.lit([-1, 0, 1])))
        .select(
            F.col("__id").alias("id_a"),
            F.col("__x").alias("__xa"),
            F.col("__y").alias("__ya"),
            ((F.col("__x") / F.lit(c)).cast("long") + F.col("__dx")).alias("__cx"),
            ((F.col("__y") / F.lit(c)).cast("long") + F.col("__dy")).alias("__cy"),
        )
    )
    cheb = F.greatest(
        F.abs(F.col("__xa") - F.col("__xb")), F.abs(F.col("__ya") - F.col("__yb"))
    )
    return (
        fan.join(home, ["__cx", "__cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (cheb <= F.lit(radius)))
        .select("id_a", "id_b", cheb.alias("chebyshev"))
    )

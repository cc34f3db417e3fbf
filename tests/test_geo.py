"""Geo operators: haversine parity and blocked proximity join
completeness (vs in-test brute force), incl. the polar edge a lat/lon
grid blocking would miss."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators import geo


def _brute_pairs(points, radius_km):
    def hav(a, b):
        la1, lo1, la2, lo2 = map(math.radians, (a[1], a[2], b[1], b[2]))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * geo.EARTH_RADIUS_KM * math.asin(math.sqrt(h))

    out = set()
    for i, a in enumerate(points):
        for b in points[i + 1 :]:
            d = round(hav(a, b), 6)
            if d <= radius_km:
                out.add((min(a[0], b[0]), max(a[0], b[0]), d))
    return out


def test_haversine_known_distances(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 90.0)], "lat_a double, lon_a double, lat_b double, lon_b double"
    )
    d = df.select(
        geo.haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        ).alias("d")
    ).collect()[0].d
    # quarter of the equatorial great circle
    assert abs(d - math.pi * geo.EARTH_RADIUS_KM / 2) < 1e-6


def test_proximity_matches_brute_force(spark):
    rng = random.Random(42)
    points = [
        (i, rng.uniform(-80, 80), rng.uniform(-180, 180)) for i in range(300)
    ]
    df = spark.createDataFrame(points, "id long, lat double, lon double")
    got = {
        (r.id_a, r.id_b, r.distance_km)
        for r in geo.proximity_self_join(df, "id", "lat", "lon", 1500.0).collect()
    }
    assert got == _brute_pairs(points, 1500.0)
    assert got  # non-trivial at this density


def test_proximity_polar_pairs_not_lost(spark):
    # Two points 0.5 km apart at lat 89.9 but ~179 degrees of longitude
    # apart: a +-1-neighbor lat/lon grid at radius-sized cells would
    # never co-bucket them; the 3D chord grid must.
    points = [
        (1, 89.9, 0.0),
        (2, 89.9, 179.0),
        (3, 0.0, 0.0),
    ]
    df = spark.createDataFrame(points, "id long, lat double, lon double")
    got = {
        (r.id_a, r.id_b)
        for r in geo.proximity_self_join(df, "id", "lat", "lon", 50.0).collect()
    }
    assert got == {(1, 2)}


def test_proximity_ignores_null_coordinates(spark):
    points = [(1, 0.0, 0.0), (2, None, 0.0), (3, 0.001, 0.001)]
    df = spark.createDataFrame(points, "id long, lat double, lon double")
    got = geo.proximity_self_join(df, "id", "lat", "lon", 10.0).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 3)}


def test_proximity_each_pair_once(spark):
    rng = random.Random(7)
    # a dense cluster so many pairs share many neighbor cells
    points = [
        (i, 45.0 + rng.uniform(-0.5, 0.5), 7.0 + rng.uniform(-0.5, 0.5))
        for i in range(100)
    ]
    df = spark.createDataFrame(points, "id long, lat double, lon double")
    rows = geo.proximity_self_join(df, "id", "lat", "lon", 200.0).collect()
    keys = [(r.id_a, r.id_b) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_proximity_rejects_bad_radius(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
    with pytest.raises(ValueError, match="radius_km"):
        geo.proximity_self_join(df, "id", "lat", "lon", 0.0)


def test_grid_heatmap_cells_clamp_and_drop_nulls(spark):
    from animaltrackingetls_spark.operators import geo

    pts = spark.createDataFrame(
        [(1, 10.0, -50.0), (2, 10.0, -50.0), (3, 80.0, 80.0),
         (4, None, 5.0), (5, 95.0, 200.0)],
        "id long, lat double, lon double",
    )
    grid = {(r.row, r.col): r.n for r in geo.grid_heatmap(
        pts, "lat", "lon", width=8, height=4,
        lat_min=0, lat_max=90, lon_min=-90, lon_max=90).collect()}
    # two points share a cell; out-of-range clamps to the far edge cell;
    # the NULL-latitude point vanishes
    assert grid == {(0, 1): 2, (3, 7): 2}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        geo.grid_heatmap(pts, "lat", "lon", width=0, height=4)

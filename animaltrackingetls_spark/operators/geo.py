"""Geospatial operators: haversine distance and a blocked radius
self-join ("all sighting pairs within R km").

The reference's data is point observations (decimalLatitude/Longitude,
monarch_etl/cleaning.py:204-218) and its only spatial op is a per-row
reverse-geocode lookup (enrichment.py:28-61). A real engine over the
same data needs the proximity query — which animals were seen near each
other — and that must never be the all-pairs cross join at scale.

Blocking strategy — 3D chord grid, not a lat/lon grid. A lat/lon grid
needs ever-wider longitude neighborhoods toward the poles (one degree
of longitude shrinks to zero), so a fixed ±1-cell neighbor join silently
loses pairs at high latitude. Instead each point maps to the unit
sphere (x, y, z); two points within great-circle distance d are within
EUCLIDEAN chord ``2·sin(d/2R)`` of each other, uniformly everywhere on
the sphere. Gridding xyz at that chord length makes the ±1-neighbor
property exact at every latitude, poles included.

Plan shape: the left side keeps its home cell; the right side explodes
to its 27 neighbor cells (a map-side Generate); one shuffle joins on
the cell triple; the exact haversine filter runs on candidates only.
Each qualifying pair is produced exactly once (the left row's home cell
is unique, ``id_a < id_b`` halves the symmetry) — no dropDuplicates
needed. At 100 TB: candidate volume is governed by cell occupancy, so
dense urban cells are the skew risk — AQE skew-join (on in session.py)
splits them; sub-gridding (smaller cells, more neighbor copies) trades
replication for balance.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in km (haversine form — numerically stable
    for the small angles a radius query cares about)."""
    dlat = F.radians(lat_b - lat_a) / 2
    dlon = F.radians(lon_b - lon_a) / 2
    h = F.sin(dlat) * F.sin(dlat) + F.cos(F.radians(lat_a)) * F.cos(
        F.radians(lat_b)
    ) * F.sin(dlon) * F.sin(dlon)
    # clamp: float rounding can push h a ulp past 1.0 near antipodes,
    # and asin(sqrt(>1)) is NaN — which then compares false against any
    # radius instead of failing loudly
    h = F.least(F.lit(1.0), h)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def unit_xyz(lat: Column, lon: Column) -> tuple[Column, Column, Column]:
    """Unit-sphere Cartesian coordinates of a lat/lon point."""
    rlat, rlon = F.radians(lat), F.radians(lon)
    return (
        F.cos(rlat) * F.cos(rlon),
        F.cos(rlat) * F.sin(rlon),
        F.sin(rlat),
    )


def chord_length(radius_km: float) -> float:
    """Euclidean chord (unit sphere) subtending a great-circle distance."""
    return 2.0 * math.sin(radius_km / (2.0 * EARTH_RADIUS_KM))


def proximity_self_join(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    round_digits: int = 6,
) -> DataFrame:
    """All point pairs within ``radius_km``: ``(id_a, id_b, distance_km)``
    with ``id_a < id_b``, distance rounded BEFORE the threshold compare
    so the boundary set is reproducible across engines.

    Rows with a NULL coordinate are ignored (they have no position).
    """
    if radius_km <= 0:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    # Grid with slack past the query radius: the threshold compares the
    # ROUNDED haversine, so a pair at true distance radius + 0.5 ulp of
    # the rounding still qualifies; cover it (plus xyz/floor float error)
    # so the ±1-neighbor guarantee holds on the rounded boundary.
    cell = chord_length(radius_km + 0.5 * 10.0 ** (-round_digits)) * (
        1.0 + 1e-12
    )

    pts = df.filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    )
    x, y, z = unit_xyz(F.col("lat"), F.col("lon"))
    with_cells = pts.select(
        "id", "lat", "lon",
        F.floor(x / cell).cast("long").alias("cx"),
        F.floor(y / cell).cast("long").alias("cy"),
        F.floor(z / cell).cast("long").alias("cz"),
    )

    left = with_cells.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        "cx", "cy", "cz",
    )
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    right = (
        with_cells.select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            "cx", "cy", "cz",
        )
        .withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .withColumn("dz", F.explode(offsets))
        .select(
            "id_b", "lat_b", "lon_b",
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            (F.col("cz") + F.col("dz")).alias("cz"),
        )
    )

    dist = F.round(
        haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        ),
        round_digits,
    )
    return (
        left.join(right, ["cx", "cy", "cz"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("distance_km"))
        .filter(F.col("distance_km") <= F.lit(float(radius_km)))
    )


def grid_heatmap(
    points: DataFrame,
    lat_col: str,
    lon_col: str,
    width: int,
    height: int,
    lat_min: float = -90.0,
    lat_max: float = 90.0,
    lon_min: float = -180.0,
    lon_max: float = 180.0,
) -> DataFrame:
    """Aggregate points onto a width × height grid — the Spark-first
    analog of the reference's overlay-sightings-on-a-basemap step
    (openweatherbasicmap.py:36-83): instead of a driver-side image
    library compositing pixels, the raster IS a groupBy — one shuffle of
    (row, col) pairs, counts per cell. NULL coordinates drop; points on
    or beyond the max edge clamp to the last cell (closed outer edges,
    same posture as histogram_rollup). Returns sparse ``(row, col, n)``
    with row 0 at ``lat_min``. Feed :func:`multimodal.render_pgm` to
    materialize actual image bytes.
    """
    if width < 1 or height < 1 or not (lat_max > lat_min and lon_max > lon_min):
        raise ValueError("need positive dims and max > min bounds")
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    r = F.least(
        F.greatest(
            F.floor((lat - F.lit(lat_min)) / F.lit((lat_max - lat_min) / height)),
            F.lit(0),
        ),
        F.lit(height - 1),
    ).cast("int")
    c = F.least(
        F.greatest(
            F.floor((lon - F.lit(lon_min)) / F.lit((lon_max - lon_min) / width)),
            F.lit(0),
        ),
        F.lit(width - 1),
    ).cast("int")
    return (
        points.filter(lat.isNotNull() & lon.isNotNull())
        .groupBy(r.alias("row"), c.alias("col"))
        .agg(F.count(F.lit(1)).alias("n"))
    )

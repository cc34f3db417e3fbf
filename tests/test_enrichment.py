"""Enrichment: broadcast geocode join, batched service, JSON parse."""

from __future__ import annotations

from pyspark.sql import functions as F

from animaltrackingetls_spark.enrichment import (
    enrich_batched,
    geocode_broadcast_join,
    geocode_eligible,
    parse_geocode_response,
    stub_geocode_service,
)
from animaltrackingetls_spark.plans.audit import assert_broadcast_join


def _pts(spark):
    return spark.createDataFrame(
        [(1, 40.3, -74.2), (2, 41.9, -87.6), (3, None, 5.0)],
        "id long, decimalLatitude double, decimalLongitude double",
    )


def test_broadcast_join_left_outer_and_plan(spark):
    dim = spark.createDataFrame(
        [(40.0, -74.0, "Mercer", "Trenton")],
        "cell_lat double, cell_lon double, county string, cityOrTown string",
    )
    out = geocode_broadcast_join(_pts(spark), dim)
    assert_broadcast_join(out)
    rows = {r.id: r.county for r in out.collect()}
    assert rows == {1: "Mercer", 2: None, 3: None}


def test_enrich_batched_positional_mapback(spark):
    out = {r.id: (r.county, r.cityOrTown) for r in
           enrich_batched(_pts(spark), stub_geocode_service).collect()}
    assert out[1] == ("county_40_-75", "city_40_-75")
    assert out[2] == ("county_41_-88", "city_41_-88")
    assert out[3] == (None, None)  # ineligible row left NULL


def test_enrich_batched_service_failure_leaves_nulls(spark):
    def broken(payload):
        raise RuntimeError("service down")

    out = enrich_batched(_pts(spark), broken).collect()
    assert all(r.county is None for r in out)  # job survives, rows NULL


def test_parse_geocode_response(spark):
    df = spark.createDataFrame(
        [
            ('{"features":[{"properties":{"county":"Kent","city":"Dover"}}]}',),
            ('{"features":[]}',),
            ("not json",),
            (None,),
        ],
        "raw string",
    )
    out = df.select(parse_geocode_response(F.col("raw")).alias("g")).select(
        "g.county", "g.city"
    ).collect()
    assert [(r.county, r.city) for r in out] == [
        ("Kent", "Dover"), (None, None), (None, None), (None, None)
    ]


def test_geocode_eligible(spark):
    df = _pts(spark).select(
        "id", geocode_eligible(F.col("decimalLatitude"), F.col("decimalLongitude")).alias("e")
    )
    assert {r.id: r.e for r in df.collect()} == {1: True, 2: True, 3: False}


def test_enrich_batched_on_aligned_frame_with_existing_columns(spark):
    """The aligned 35-column schema already carries county/cityOrTown as
    NULLs — enrichment must fill them in place, not crash on a
    duplicate-field output schema."""
    from animaltrackingetls_spark.enrichment import (
        enrich_batched,
        stub_geocode_service,
    )

    df = spark.createDataFrame(
        [(1, 40.1, -75.2, None, None)],
        "id long, decimalLatitude double, decimalLongitude double, "
        "county string, cityOrTown string",
    )
    out = enrich_batched(df, stub_geocode_service).collect()
    assert len(out[0].asDict()) == 5  # no duplicated columns
    assert out[0].county is not None


def test_enrich_batched_rejects_misaligned_service_response(spark):
    """A response shorter than the payload must NULL the batch, never
    shift results onto the wrong rows."""
    from animaltrackingetls_spark.enrichment import enrich_batched

    def short_service(payload):
        return [("X", "Y")] * (len(payload) - 1)

    df = spark.createDataFrame(
        [(1, 40.0, -75.0), (2, 41.0, -76.0)],
        "id long, decimalLatitude double, decimalLongitude double",
    ).coalesce(1)
    rows = {r.id: r for r in enrich_batched(df, short_service).collect()}
    assert rows[1].county is None and rows[2].county is None


def test_enrich_batched_preserves_preexisting_values(spark):
    """Rows the service can't improve keep their pre-existing enrichment:
    an ineligible row (NULL coords) and a row in a failed batch must NOT
    have a prior non-null county overwritten with NULL."""
    df = spark.createDataFrame(
        [
            (1, 40.1, -75.2, "OldCounty", "OldCity"),  # eligible: overwritten
            (2, None, None, "KeepCounty", "KeepCity"),  # ineligible: preserved
        ],
        "id long, decimalLatitude double, decimalLongitude double, "
        "county string, cityOrTown string",
    ).coalesce(1)
    rows = {r.id: r for r in enrich_batched(df, stub_geocode_service).collect()}
    assert rows[1].county == "county_40_-76"  # successful lookup overwrites
    assert rows[2].county == "KeepCounty"  # ineligible row preserved
    assert rows[2].cityOrTown == "KeepCity"

    def broken(payload):
        raise RuntimeError("service down")

    rows = {r.id: r for r in enrich_batched(df, broken).collect()}
    assert rows[1].county == "OldCounty"  # failed batch preserves too
    assert rows[2].county == "KeepCounty"


def test_enrich_batched_rejects_nonstring_inplace_column(spark):
    """A non-string pre-existing county column fails fast with a typed
    error instead of deep inside Arrow conversion."""
    import pytest

    df = spark.createDataFrame(
        [(1, 40.0, -75.0, 7)],
        "id long, decimalLatitude double, decimalLongitude double, county long",
    )
    with pytest.raises(TypeError, match="string-typed"):
        enrich_batched(df, stub_geocode_service)

"""align_to_schema: completion, casting, canonical order."""

from __future__ import annotations

from animaltrackingetls_spark.schema import FINAL_COLUMNS, align_to_schema


def test_align_adds_missing_and_orders(spark):
    df = spark.createDataFrame([(5, "x")], "gbifID int, county string")
    out = align_to_schema(df)
    assert out.columns == FINAL_COLUMNS
    row = out.collect()[0]
    assert row.gbifID == "5"          # cast int → canonical string
    assert row.county == "x"
    assert row.scientificName is None  # completed as NULL


def test_align_casts_types(spark):
    df = spark.createDataFrame(
        [("1", "40.5", "7")],
        "gbifID string, decimalLatitude string, individualCount string",
    )
    out = align_to_schema(df)
    field_types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert field_types["decimalLatitude"] == "double"
    assert field_types["individualCount"] == "bigint"
    row = out.collect()[0]
    assert row.decimalLatitude == 40.5 and row.individualCount == 7

"""Cleaning kernel: split invariant, reasons, schema, histogram."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.cleaning import (
    REASON_BAD_COORDS,
    REASON_BAD_DATE,
    clean_occurrences,
    rejection_histogram,
)
from animaltrackingetls_spark.schema import FAILURE_REASON, FINAL_COLUMNS

ROWS = [
    # gbifID, eventDate, lat, lon, count
    ("1", "2021-06-15", "40.1", "-74.2", "2"),
    ("2", "2021/2022", "41.0", "-75.0", None),       # rescued range date
    ("3", "garbage", "41.0", "-75.0", "1"),          # bad date
    ("4", "2021-06-15", None, "-75.0", "1"),         # bad lat
    ("5", "2021-06-15", "40.0", "zzz", "3"),         # bad lon
]
SCHEMA = (
    "gbifID string, eventDate string, decimalLatitude string, "
    "decimalLongitude string, individualCount string"
)


@pytest.fixture(scope="module")
def result(spark):
    return clean_occurrences(spark.createDataFrame(ROWS, SCHEMA))


def test_split_invariant(spark, result):
    assert result.good.count() + result.rejected.count() == len(ROWS)


def test_good_rows_and_values(result):
    good = {r.gbifID: r for r in result.good.collect()}
    assert set(good) == {"1", "2"}
    assert good["1"].individualCount == 2
    assert good["2"].individualCount == 1          # default for absent count
    assert str(good["2"].date_only) == "2021-01-01"  # range rescued to first year


def test_reject_reasons(result):
    rejected = {r.gbifID: r[FAILURE_REASON] for r in result.rejected.collect()}
    assert rejected == {
        "3": REASON_BAD_DATE,
        "4": REASON_BAD_COORDS,
        "5": REASON_BAD_COORDS,
    }


def test_good_is_canonical_schema(result):
    assert result.good.columns == FINAL_COLUMNS


def test_rejection_histogram(result):
    hist = {r[FAILURE_REASON]: r.n for r in rejection_histogram(result.rejected).collect()}
    assert hist == {REASON_BAD_COORDS: 2, REASON_BAD_DATE: 1}


def test_bad_date_takes_precedence_over_bad_coords(spark):
    df = spark.createDataFrame([("9", "junk", None, None, None)], SCHEMA)
    res = clean_occurrences(df)
    assert res.rejected.collect()[0][FAILURE_REASON] == REASON_BAD_DATE

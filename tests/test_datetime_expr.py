"""C1/C2/C5 semantics: date rescue, permissive parse, pandas conventions."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.functions.datetime_expr import (
    date_rescue,
    parse_event_timestamp,
    temporal_columns,
)


def _parse_one(spark, s):
    df = spark.createDataFrame([(s,)], "d string")
    return df.select(parse_event_timestamp(F.col("d")).alias("p")).collect()[0].p


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("2021/2022", datetime.datetime(2021, 1, 1)),          # range → first year
        ("2021", datetime.datetime(2021, 1, 1)),               # year-only pad
        ("2021-06", datetime.datetime(2021, 6, 1)),            # year-month pad
        ("2021-5", datetime.datetime(2021, 5, 1)),             # single-digit month
        ("2021-5-3", datetime.datetime(2021, 5, 3)),           # narrow y-m-d
        ("2021-06-15", datetime.datetime(2021, 6, 15)),
        ("2021-06-15T12:34:56", datetime.datetime(2021, 6, 15, 12, 34, 56)),
        ("2021-06-15 12:34:56", datetime.datetime(2021, 6, 15, 12, 34, 56)),
        ("  2021-07-04  ", datetime.datetime(2021, 7, 4)),     # trim
        ("garbage", None),
        ("2021-13", None),                                      # invalid month
        ("2021-06-31", None),                                   # invalid day
        ("", None),
        ("nan", None),
        (None, None),
    ],
)
def test_parse_event_timestamp_cases(spark, raw, expected):
    assert _parse_one(spark, raw) == expected


def test_parse_normalizes_timezone_to_utc(spark):
    # +05:00 instant normalized to UTC (pandas utc=True parity)
    assert _parse_one(spark, "2021-06-01T12:34:56+05:00") == datetime.datetime(
        2021, 6, 1, 7, 34, 56
    )


def test_date_rescue_leaves_nullish_untouched(spark):
    df = spark.createDataFrame([("nan",), ("NaT",), ("",), ("none",)], "d string")
    out = [r.r for r in df.select(date_rescue(F.col("d")).alias("r")).collect()]
    assert out == ["nan", "NaT", "", "none"]


def test_temporal_conventions(spark):
    # 2024-01-02 is a Tuesday → pandas weekday 1; 2021-01-01 is ISO week 53.
    df = spark.createDataFrame(
        [("2024-01-02 10:30:45",), ("2021-01-01 00:00:00",)], "d string"
    ).select(F.col("d").cast("timestamp").alias("ts"))
    out = df.select(
        *[v.alias(k) for k, v in temporal_columns(F.col("ts")).items()]
    ).collect()
    tue = next(r for r in out if r.year == 2024)
    assert (tue.day_of_week, tue.week_of_year, tue.time_only) == (1, 1, "10:30:45")
    nye = next(r for r in out if r.year == 2021)
    assert (nye.day_of_week, nye.week_of_year) == (4, 53)  # Friday, ISO week 53


def test_monday_is_zero(spark):
    df = spark.createDataFrame([("2024-01-01",)], "d string").select(
        F.col("d").cast("timestamp").alias("ts")
    )
    row = df.select(temporal_columns(F.col("ts"))["day_of_week"].alias("w")).collect()[0]
    assert row.w == 0  # 2024-01-01 is a Monday

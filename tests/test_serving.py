"""Serving surface: dynamic filters, date match, JSON sink, empty guard."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from animaltrackingetls_spark.serving import (
    dynamic_filters,
    filter_for_date,
    is_empty,
    to_json_records,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, 2024, 1, 5, "a"), (2, 2024, 1, 6, "b"), (3, 2023, 1, 5, "c")],
        "id long, year int, month int, day int, v string",
    )


def test_dynamic_filters_apply_only_supplied(spark):
    df = _df(spark)
    assert {r.id for r in dynamic_filters(df, year=2024).collect()} == {1, 2}
    assert {r.id for r in dynamic_filters(df, year=2024, day=5).collect()} == {1}
    assert {r.id for r in dynamic_filters(df).collect()} == {1, 2, 3}


def test_dynamic_filters_accept_request_strings(spark):
    assert {r.id for r in dynamic_filters(_df(spark), year="2023").collect()} == {3}


def test_dynamic_filters_ignore_missing_columns(spark):
    df = _df(spark).drop("day")
    assert {r.id for r in dynamic_filters(df, year=2024, day=5).collect()} == {1, 2}


def test_filter_for_date_skips_null_ts(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 5)), (2, None)], "id long, ts timestamp"
    )
    out = filter_for_date(df, "ts", 2024, 1, 5)
    assert [r.id for r in out.collect()] == [1]


def test_to_json_records_caps_rows(spark):
    out = to_json_records(_df(spark).select("id", "v"), limit=2)
    assert len(out) == 2 and set(out[0]) == {"id", "v"}


def test_is_empty(spark):
    df = _df(spark)
    assert not is_empty(df)
    assert is_empty(df.filter(F.col("year") == 1900))

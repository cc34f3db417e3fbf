"""C3/C4/C7 coercion semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from animaltrackingetls_spark.functions.coercion import (
    count_with_default,
    scrub_na_strings,
    try_double,
)


def test_count_with_default_numeric_double_column(spark):
    # double-typed counts must keep their value (truncated), not default
    df = spark.createDataFrame([(2.0,), (2.5,), (None,)], "c double")
    out = [r.v for r in df.select(count_with_default(F.col("c")).alias("v")).collect()]
    assert out == [2, 2, 1]


def test_count_with_default_string_inputs(spark):
    df = spark.createDataFrame(
        [(" 2.5 ",), ("-3",), ("1e2",), ("abc",), ("",), (None,)], "c string"
    )
    out = [r.v for r in df.select(count_with_default(F.col("c")).alias("v")).collect()]
    assert out == [2, -3, 100, 1, 1, 1]


def test_count_with_default_absent_column(spark):
    df = spark.createDataFrame([(1,)], "x int")
    assert df.select(count_with_default(None).alias("v")).collect()[0].v == 1


def test_try_double_coerces_or_nulls(spark):
    df = spark.createDataFrame([("1.5",), (" 2 ",), ("xx",), (None,)], "c string")
    out = [r.v for r in df.select(try_double(F.col("c")).alias("v")).collect()]
    assert out == [1.5, 2.0, None, None]


def test_scrub_na_strings(spark):
    df = spark.createDataFrame([("None",), ("nan",), ("NaT",), ("ok",)], "c string")
    out = [r.v for r in df.select(scrub_na_strings(F.col("c")).alias("v")).collect()]
    assert out == [None, None, None, "ok"]

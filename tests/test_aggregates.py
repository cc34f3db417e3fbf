"""UDAF surface, catalog introspection, table counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from animaltrackingetls_spark.operators.aggregates import (
    catalog_columns,
    median_udaf,
    table_counts,
    weighted_mean_udaf,
)


def test_median_udaf(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 9.0), ("a", 2.0), ("b", 5.0), ("b", 7.0)], "g string, v double"
    )
    out = {r.g: r.m for r in df.groupBy("g").agg(median_udaf("v").alias("m")).collect()}
    assert out == {"a": 2.0, "b": 6.0}  # even count → mean of middle pair


def test_weighted_mean_udaf(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 10.0, 3.0), ("a", None, 5.0)], "g string, v double, w double"
    )
    out = df.groupBy("g").agg(weighted_mean_udaf("v", "w").alias("m")).collect()[0].m
    assert abs(out - (1.0 * 1 + 10.0 * 3) / 4.0) < 1e-12  # null v row excluded


def test_catalog_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, name string")
    out = catalog_columns(spark, {"t_cat_a": a}).collect()
    assert [(r.column_name, r.ordinal_position) for r in out] == [("id", 1), ("name", 2)]


def test_table_counts(spark):
    a = spark.createDataFrame([(1,), (2,)], "id long")
    b = spark.createDataFrame([(1,)], "id long")
    out = {r.table_name: r.n_rows for r in table_counts({"ta": a, "tb": b}).collect()}
    assert out == {"ta": 2, "tb": 1}


def test_table_counts_includes_empty_tables(spark):
    a = spark.createDataFrame([(1,)], "id long")
    empty = a.filter(F.col("id") < 0)
    out = {r.table_name: r.n_rows for r in table_counts({"a": a, "e": empty}).collect()}
    assert out == {"a": 1, "e": 0}  # COUNT(*)=0 row, not a missing row

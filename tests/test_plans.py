"""Plan audits: pushdown, pruning, join-shape assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.io import load_table
from animaltrackingetls_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_cartesian,
    pushed_filters,
    scan_read_schema,
)

SF = "/root/testdata/sf0.001"


def test_parquet_filter_pushdown_visible(spark):
    df = load_table(spark, SF, "orders").filter(F.col("o_orderkey") == 7)
    pushed = pushed_filters(df)
    assert any("o_orderkey" in p for p in pushed)


def test_column_pruning_reaches_scan(spark):
    df = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    cols = scan_read_schema(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}  # 2 of 11, not all


def test_assert_no_cartesian_raises_on_cross_join(spark):
    # both sides too big to broadcast → genuine CartesianProduct in the plan
    a = spark.range(10_000_000)
    b = spark.range(10_000_000).withColumnRenamed("id", "id2")
    with pytest.raises(AssertionError):
        assert_no_cartesian(a.crossJoin(b))


def test_assert_broadcast_join_detects(spark):
    n = load_table(spark, SF, "nation")
    r = load_table(spark, SF, "region")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    assert_broadcast_join(joined)
    with pytest.raises(AssertionError):
        assert_broadcast_join(n.select("n_name"))

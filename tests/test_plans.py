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


def test_bucketed_tables_eliminate_join_shuffle(spark, tmp_path):
    # The co-located-join technique for repeated 100 TB joins: both
    # sides bucketed on the join key into the same bucket count means
    # the sort-merge join reads pre-partitioned data — ZERO Exchange
    # nodes in the join plan (vs 2 for unbucketed SMJ).
    import re

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = spark.range(1000).selectExpr("id AS o_orderkey", "id % 7 AS o_flag")
    li = spark.range(3000).selectExpr(
        "id % 1000 AS l_orderkey", "id AS l_lineno"
    )
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .mode("overwrite").saveAsTable("b_lineitem"))

    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        spark.table("b_orders").o_orderkey
        == spark.table("b_lineitem").l_orderkey,
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges == 0, plan[:2000]
    assert joined.count() == 3000

    # control: the same join over plain parquet shuffles both sides
    o.write.mode("overwrite").parquet(str(tmp_path / "po"))
    li.write.mode("overwrite").parquet(str(tmp_path / "pl"))
    po, pl = spark.read.parquet(str(tmp_path / "po")), spark.read.parquet(str(tmp_path / "pl"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        control = po.join(pl, po.o_orderkey == pl.l_orderkey)
        cplan = control._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", cplan)) >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_global_topk_window_gets_group_limit_pushdown(spark):
    """Global (unpartitioned) top-k windows — bm25_topk's pool, the
    similarity re-ranks — LOOK like single-partition funnels (Spark
    even warns 'No Partition Defined for Window'), but Spark 4
    rewrites them into a distributed partial top-k: either
    TakeOrderedAndProject (per-partition take, then a merge of at most
    k×partitions rows) or WindowGroupLimit (per-partition rank prune
    before the final window), so the funnel carries at most k rows per
    upstream partition at any corpus size. Pin that so a regression
    back to a true global sort fails loudly."""
    from animaltrackingetls_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(i, f"fox jumps over dog {i} " * (i % 7 + 1)) for i in range(500)],
        "doc_id long, text string",
    ).repartition(8)
    topk = retrieval.bm25_topk(docs, ["fox", "dog"], 10)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, plan[:2000]
    assert topk.count() == 10

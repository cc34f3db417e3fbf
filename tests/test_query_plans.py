"""Plan-shape assertions for headline queries — the 100 TB design
properties (broadcasts, pruning, no cartesians, top-k physical op) kept
as regression tests, not one-time explain() eyeballs."""

from __future__ import annotations

import __spark_entry__ as entry
from animaltrackingetls_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_cartesian,
    formatted_plan,
    scan_read_schema,
)

SF = "/root/testdata/sf0.001"


def test_q5_broadcasts_dims_no_cartesian(spark):
    df = entry._q_q5_local_supplier(spark, SF)
    assert_no_cartesian(df)
    assert_broadcast_join(df)


def test_geocode_join_is_broadcast(spark):
    df = entry._q_geocode_broadcast(spark, SF)
    assert_broadcast_join(df)


def test_minhash_plan_shuffles_only_band_keys(spark):
    df = entry._q_minhash_lsh_pairs(spark, SF)
    assert_no_cartesian(df)


def test_topk_orders_uses_take_ordered(spark):
    df = entry._q_topk_orders(spark, SF)
    # top-k must be TakeOrderedAndProject (per-partition heap + merge),
    # never a global sort of the whole table
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_q1_scan_prunes_columns(spark):
    df = entry._q_q1_pricing_summary(spark, SF)
    cols = set(scan_read_schema(df))
    # 7 needed columns of lineitem's 11 — projection reached the reader
    assert cols == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }


def test_flagship_runs_and_has_no_cartesian(spark):
    df = entry.entry(spark)
    assert_no_cartesian(df)
    assert df.count() > 0


def test_pack_documents_window_is_partitioned(spark):
    """The registered pack query must NOT use a global (single-partition)
    window — the scale-killer flagged in round 2."""
    df = entry._q_pack_documents(spark, SF)
    plan = formatted_plan(df)
    spec = "\n".join(l for l in plan.splitlines() if "windowspecdefinition" in l)
    assert "windowspecdefinition(source" in spec  # partitioned, not global


def test_rollup_cube_single_pass_and_rollup_operator_identity(spark):
    """The folded rollup+cube query computes ONE cube aggregate (one
    parquet scan; the second branch reuses the exchange) and its derived
    rollup rows equal a literal df.rollup() — so the native operator's
    semantics stay pinned while the plan stays single-scan."""
    import re

    from pyspark.sql import functions as F

    df = entry._q_rollup_cube_orders(spark, SF)
    plan = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    # one 4-set cube Expand, not rollup(3)+cube(4)
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1

    o = entry._t(spark, SF, "orders")
    native = {
        (r.o_orderstatus, r.o_orderpriority, r.n_orders, r.sum_price)
        for r in o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .collect()
    }
    derived = {
        (r.o_orderstatus, r.o_orderpriority, r.n_orders, r.sum_price)
        for r in df.filter(F.col("mode") == "rollup").collect()
    }
    assert derived == native


def test_driver_window_is_fully_oracle_backed():
    # The driver verifies the leading DRIVER_WINDOW entries of
    # queries() against oracle_sql() (CORRECTNESS_r08 covered exactly
    # 50). Since round 9 the window must be FULLY oracle-backed (no
    # slot wasted on a rows-only query), and any oracle-backed query
    # past the window must instead be hash-compared every suite run by
    # tests/test_entry_oracles.py — which derives its target list from
    # the same position arithmetic, so nothing can fall between the
    # two gates.
    names = list(entry.queries())
    oracles = set(entry.oracle_sql())
    window = names[: entry.DRIVER_WINDOW]
    missing = [n for n in window if n not in oracles]
    assert missing == [], f"window slots without oracle: {missing}"
    dangling = [n for n in oracles if n not in names]
    assert dangling == [], f"oracles without queries: {dangling}"


def test_folded_event_projection_is_single_scan(spark):
    import re

    df = entry._q_temporal_rescue_derive(spark, SF)
    plan = formatted_plan(df)
    # the fold's point: temporal derivation, date rescue, JSON extract,
    # and NA scrub all ride ONE parquet scan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_no_query_plan_contains_a_cartesian_product(spark):
    # Two suite-enforced invariants over every registered query, one
    # build pass (streaming queries execute on construction, so
    # building them twice would double two full AvailableNow drains):
    # 1. audit_plans.py's property: every physical plan is
    #    cartesian-free.
    # 2. Driver hashability: no IN-WINDOW query schema may contain
    #    Array/Map/Struct columns. The driver's canonicalizer sorts
    #    raw column values and dies on array cells ('unhashable type:
    #    list' — the single red row of CORRECTNESS_r09, invisible to
    #    every local gate because check_oracles/_canon stringify
    #    object columns first). Scalar-only schemas keep the local
    #    gates and the driver comparing the same thing.
    from pyspark.sql.types import ArrayType, MapType, StructType

    window = set(list(entry.queries())[: entry.DRIVER_WINDOW])
    cartesian, complex_cols = [], []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF)
        except Exception:
            cartesian.append(name)
            continue
        try:
            assert_no_cartesian(df)
        except AssertionError:
            cartesian.append(name)
        if name in window:
            bad = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if bad:
                complex_cols.append((name, bad))
    assert cartesian == [], f"cartesian product in: {cartesian}"
    assert complex_cols == [], (
        f"in-window queries with driver-unhashable columns: {complex_cols}"
    )

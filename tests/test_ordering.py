"""global_order_index: parity with the (unscalable) global window,
determinism across input partitionings, edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from animaltrackingetls_spark.operators.ordering import global_order_index


def _frame(spark, n=500, parts=7):
    # deliberately scrambled insert order + skewed sort key (heavy ties)
    rows = [((i * 7919) % n, (i * 7919) % 13, f"d{i}") for i in range(n)]
    return spark.createDataFrame(
        rows, "uid long, grp long, payload string"
    ).repartition(parts)


def test_matches_global_window(spark):
    df = _frame(spark)
    got = global_order_index(df, ["grp", "uid"], num_partitions=5)
    w = Window.orderBy("grp", "uid")
    exp = df.withColumn("global_idx", F.row_number().over(w).cast("long") - 1)
    assert sorted(got.select("uid", "global_idx").collect()) == sorted(
        exp.select("uid", "global_idx").collect()
    )


def test_deterministic_across_partitionings(spark):
    base = _frame(spark)
    a = global_order_index(base.repartition(3), ["grp", "uid"], num_partitions=4)
    b = global_order_index(base.repartition(17), ["grp", "uid"], num_partitions=9)
    assert sorted(a.select("uid", "global_idx").collect()) == sorted(
        b.select("uid", "global_idx").collect()
    )


def test_index_is_dense_and_start_offset(spark):
    df = _frame(spark, n=100)
    got = global_order_index(df, ["uid"], start=1000, num_partitions=3)
    idx = sorted(r.global_idx for r in got.collect())
    assert idx == list(range(1000, 1100))


def test_empty_input(spark):
    df = _frame(spark).filter(F.lit(False))
    got = global_order_index(df, ["uid"])
    assert got.count() == 0
    assert "global_idx" in got.columns


def test_rejects_existing_column_and_empty_order(spark):
    df = _frame(spark, n=10)
    with pytest.raises(ValueError, match="already exists"):
        global_order_index(df.withColumn("global_idx", F.lit(0)), ["uid"])
    with pytest.raises(ValueError, match="non-empty"):
        global_order_index(df, [])


def test_no_single_partition_global_sort_in_plan(spark):
    """The point of the operator: the plan must contain a RANGE
    repartitioning (parallel), not an unpartitioned window sort."""
    df = _frame(spark)
    got = global_order_index(df, ["grp", "uid"], num_partitions=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 5)),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t,  # total order guaranteed by uniqueness
    ),
    st.integers(1, 6),
)
def test_global_index_equals_sorted_enumeration(spark, rows, parts):
    """Property: for ANY unique (key, grp) set and ANY partition count,
    the index is exactly the position in the sorted order."""
    df = spark.createDataFrame(rows, "key long, grp long").repartition(3)
    got = global_order_index(df, ["grp", "key"], num_partitions=parts)
    out = {(r.key, r.grp): r.global_idx for r in got.collect()}
    for i, (k, g) in enumerate(sorted(rows, key=lambda t: (t[1], t[0]))):
        assert out[(k, g)] == i


def test_export_ordered_shards_contiguous_balanced_roundtrip(spark, tmp_path):
    from animaltrackingetls_spark.operators.ordering import export_ordered_shards

    df = _frame(spark, n=103)  # deliberately not divisible by num_shards
    path = str(tmp_path / "shards")
    manifest = export_ordered_shards(df, ["grp", "uid"], 4, path).collect()
    assert [r.shard for r in manifest] == [0, 1, 2, 3]
    sizes = [r.n_rows for r in manifest]
    assert sum(sizes) == 103 and max(sizes) - min(sizes) <= 1
    # contiguity: each shard's index range touches the next
    for a, b in zip(manifest, manifest[1:]):
        assert a.max_idx + 1 == b.min_idx
    assert manifest[0].min_idx == 0 and manifest[-1].max_idx == 102
    # reading shards in order reproduces the exact global order
    back = spark.read.parquet(path)
    got = [
        r.uid
        for r in back.orderBy("shard", "global_idx").collect()
    ]
    exp = [
        r.uid for r in df.orderBy("grp", "uid").collect()
    ]
    assert got == exp
    # the ON-FILE contract, checked WITHOUT re-sorting: concatenating
    # each shard dir's parquet files in filename order yields the index
    # in strictly increasing order
    import os

    import pyarrow.parquet as pq

    streamed = []
    for shard_dir in sorted(
        d for d in os.listdir(path) if d.startswith("shard=")
    ):
        for f in sorted(os.listdir(os.path.join(path, shard_dir))):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(path, shard_dir, f))
                streamed.extend(t.column("global_idx").to_pylist())
    assert streamed == list(range(103))


def test_export_ordered_shards_rejects_empty_and_bad_k(spark, tmp_path):
    from animaltrackingetls_spark.operators.ordering import export_ordered_shards

    df = _frame(spark, n=10)
    with pytest.raises(ValueError, match="num_shards"):
        export_ordered_shards(df, ["uid"], 0, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="empty"):
        export_ordered_shards(
            df.filter(F.lit(False)), ["uid"], 2, str(tmp_path / "y")
        )

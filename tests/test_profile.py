"""Column profiling: aggregate semantics, NULL handling, approx mode."""

from __future__ import annotations

import pytest

from animaltrackingetls_spark.operators.profile import profile_columns


def _frame(spark):
    rows = [
        (1, "a", None),
        (2, "b", 10),
        (3, "a", 20),
        (4, None, 20),
        (5, "c", None),
    ]
    return spark.createDataFrame(rows, "id long, cat string, val long")


def test_profile_exact_stats(spark):
    out = {r.col_name: r for r in profile_columns(_frame(spark)).collect()}
    assert set(out) == {"id", "cat", "val"}
    for r in out.values():
        assert r.n_rows == 5
    assert (out["id"].n_null, out["id"].n_distinct) == (0, 5)
    assert (out["cat"].n_null, out["cat"].n_distinct) == (1, 3)
    assert (out["val"].n_null, out["val"].n_distinct) == (2, 2)
    assert (out["id"].min_value, out["id"].max_value) == ("1", "5")
    assert (out["cat"].min_value, out["cat"].max_value) == ("a", "c")
    assert (out["val"].min_value, out["val"].max_value) == ("10", "20")


def test_profile_column_subset_and_validation(spark):
    df = _frame(spark)
    out = profile_columns(df, ["cat"]).collect()
    assert [r.col_name for r in out] == ["cat"]
    with pytest.raises(ValueError, match="not in frame"):
        profile_columns(df, ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        profile_columns(df, [])


def test_profile_approx_mode_shape(spark):
    df = _frame(spark)
    out = {r.col_name: r for r in profile_columns(df, exact_distinct=False).collect()}
    # HLL on tiny cardinalities is exact in practice; shape must match
    assert out["id"].n_distinct == 5
    assert out["cat"].n_distinct == 3


def test_profile_single_aggregation_pass(spark):
    # the profile must be ONE aggregate over the scan, not one scan per
    # column: assert a single Aggregate chain in the optimized plan
    df = _frame(spark)
    plan = profile_columns(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2  # partial+final, never per-column

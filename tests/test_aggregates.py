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


# ---------------------------------------------------------------------------
# hll_rollup / hll_union
# ---------------------------------------------------------------------------


def test_hll_union_of_daily_sketches_equals_whole_period_sketch(spark):
    from animaltrackingetls_spark.operators.aggregates import hll_rollup, hll_union

    rows = [(d, u) for d in range(10) for u in range(d * 50, d * 50 + 400)]
    df = spark.createDataFrame(rows, "day int, user_id long")

    daily = hll_rollup(df, ["day"], "user_id")
    assert daily.count() == 10
    merged = hll_union(daily.withColumn("all", F.lit(1)), ["all"]).first()

    whole = hll_rollup(df.withColumn("all", F.lit(1)), ["all"], "user_id").first()
    # sketch merge is lossless vs sketching the whole set directly
    assert merged.n_distinct_est == whole.n_distinct_est

    exact = df.select("user_id").distinct().count()
    assert abs(merged.n_distinct_est - exact) / exact < 0.05


def test_hll_estimates_stable_within_tolerance_across_partitionings(spark):
    # DataSketches' HIP estimator is merge-order-sensitive, so estimates
    # are NOT bit-stable under repartitioning — only close. Pin the
    # accuracy envelope, not equality (documented in hll_rollup).
    from animaltrackingetls_spark.operators.aggregates import hll_rollup

    df = spark.createDataFrame(
        [(i % 3, i * 7 % 1000) for i in range(5000)], "g int, v long"
    )
    exact = {
        r.g: r.n
        for r in df.groupBy("g").agg(
            F.countDistinct("v").alias("n")
        ).collect()
    }
    a = {r.g: r.n_distinct_est for r in hll_rollup(df, ["g"], "v").collect()}
    b = {
        r.g: r.n_distinct_est
        for r in hll_rollup(df.repartition(17), ["g"], "v").collect()
    }
    for g in exact:
        assert abs(a[g] - exact[g]) / exact[g] < 0.05
        assert abs(b[g] - exact[g]) / exact[g] < 0.05
        assert abs(a[g] - b[g]) / exact[g] < 0.02  # drift is small, not zero


# ---------------------------------------------------------------------------
# grouped_ols (applyInPandas GROUPED_MAP)
# ---------------------------------------------------------------------------


def test_grouped_ols_exact_fit_and_degenerate_groups(spark):
    from animaltrackingetls_spark.operators.aggregates import grouped_ols

    rows = (
        [("lin", float(i), 3.0 * i + 2.0) for i in range(10)]   # exact line
        + [("one", 1.0, 5.0)]                                   # n=1 → NULL
        + [("flat", 2.0, 1.0), ("flat", 2.0, 9.0)]              # zero x-var → NULL
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    assert out["lin"].slope == 3.0 and out["lin"].intercept == 2.0
    assert out["lin"].n == 10
    assert out["one"].slope is None and out["one"].n == 1
    assert out["flat"].slope is None and out["flat"].n == 2


def test_grouped_ols_matches_duckdb_regression(spark):
    import duckdb

    from animaltrackingetls_spark.operators.aggregates import grouped_ols

    rows = [
        (f"g{i % 3}", float(i % 17), float((i * 7) % 23) + 0.5 * (i % 17))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r.g: (r.slope, r.intercept, r.n)
        for r in grouped_ols(df, ["g"], "x", "y").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    oracle = {
        g: (s, i, n)
        for g, s, i, n in con.execute(
            "SELECT g, round(regr_slope(y, x), 6), round(regr_intercept(y, x), 6),"
            " count(*) FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == oracle


def test_calendar_spine_fill_zero_fills_gaps(spark):
    import datetime

    from animaltrackingetls_spark.operators.aggregates import calendar_spine_fill

    d = datetime.date
    df = spark.createDataFrame(
        [(d(2024, 3, 1),), (d(2024, 3, 1),), (d(2024, 3, 4),)],
        "day date",
    )
    out = {str(r.day): r.n for r in calendar_spine_fill(df, "day").collect()}
    assert out == {
        "2024-03-01": 2, "2024-03-02": 0, "2024-03-03": 0, "2024-03-04": 1,
    }


def test_calendar_spine_fill_custom_aggregate(spark):
    import datetime

    from animaltrackingetls_spark.operators.aggregates import calendar_spine_fill
    from pyspark.sql import functions as F

    d = datetime.date
    df = spark.createDataFrame(
        [(d(2024, 1, 1), 10.0), (d(2024, 1, 3), 4.0), (d(2024, 1, 3), 6.0)],
        "day date, v double",
    )
    out = {
        str(r.day): r.total
        for r in calendar_spine_fill(
            df, "day", F.sum("v").cast("long"), "total"
        ).collect()
    }
    assert out == {"2024-01-01": 10, "2024-01-02": 0, "2024-01-03": 10}


# ---------------------------------------------------------------------------
# Mergeable histogram rollups
# ---------------------------------------------------------------------------


def test_histogram_rollup_merge_equals_direct(spark):
    """Daily histograms merged to group grain must equal the histogram
    computed directly over the raw data — the exactness property that
    makes fixed-bin vectors the re-aggregatable quantile sketch."""
    from animaltrackingetls_spark.operators import aggregates as A

    rows = (
        [("a", "d1", float(v)) for v in range(0, 50)]
        + [("a", "d2", float(v)) for v in range(25, 100)]
        + [("b", "d1", 200.0), ("b", "d1", None), ("b", "d2", -5.0)]
    )
    df = spark.createDataFrame(rows, "grp string, day string, value double")
    daily = A.histogram_rollup(df, ["grp", "day"], "value", lo=0.0, hi=100.0, n_bins=10)
    merged = {r.grp: (r.bins, r.n) for r in
              A.histogram_merge(daily, ["grp"], n_bins=10).collect()}
    direct = {r.grp: (r.bins, r.n) for r in
              A.histogram_rollup(df, ["grp"], "value", lo=0.0, hi=100.0,
                                 n_bins=10).collect()}
    assert merged == direct
    # closed outer edges: 200 clamps to the last bin, -5 to bin 0; NULL drops
    assert direct["b"] == ([1, 0, 0, 0, 0, 0, 0, 0, 0, 1], 2)


def test_histogram_quantile_within_one_bin_of_exact(spark):
    """quantile_from_histogram's error bound is one bin width by
    construction; check against numpy percentiles on a skewed sample."""
    import numpy as np

    from animaltrackingetls_spark.operators import aggregates as A

    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.uniform(0, 20, 600), rng.uniform(60, 100, 400)])
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    h = A.histogram_rollup(df.withColumn("g", __import__("pyspark").sql.functions.lit("x")),
                           ["g"], "value", lo=0.0, hi=100.0, n_bins=50).collect()[0]
    width = 100.0 / 50
    for q in (0.1, 0.5, 0.9, 0.99):
        est = A.quantile_from_histogram(h.bins, h.n, q, 0.0, 100.0)
        exact = float(np.percentile(vals, q * 100))
        assert abs(est - exact) <= width + 1e-9

    import pytest as _pytest

    with _pytest.raises(ValueError):
        A.quantile_from_histogram(h.bins, h.n, 1.5, 0.0, 100.0)
    with _pytest.raises(ValueError):
        A.histogram_rollup(df, [], "value", lo=5.0, hi=5.0)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.sampled_from(["d1", "d2", "d3"]),
                  st.floats(min_value=-50, max_value=150, allow_nan=False)),
        min_size=1, max_size=60,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_histogram_merge_equals_direct_property(spark, rows, n_bins):
    """For arbitrary values (including out-of-range, which clamp) and
    arbitrary bin counts, per-day histograms merged to group grain must
    equal the direct group histogram, and total counts must equal the
    row count."""
    from animaltrackingetls_spark.operators import aggregates as A

    df = spark.createDataFrame(rows, "grp string, day string, value double")
    daily = A.histogram_rollup(df, ["grp", "day"], "value", lo=0.0, hi=100.0,
                               n_bins=n_bins)
    merged = {r.grp: (tuple(r.bins), r.n)
              for r in A.histogram_merge(daily, ["grp"], n_bins=n_bins).collect()}
    direct = {r.grp: (tuple(r.bins), r.n)
              for r in A.histogram_rollup(df, ["grp"], "value", lo=0.0, hi=100.0,
                                          n_bins=n_bins).collect()}
    assert merged == direct
    assert sum(n for _, n in direct.values()) == len(rows)
    for bins, n in direct.values():
        assert sum(bins) == n


def test_approx_top_k_matches_exact_on_skew(spark):
    """Zipf-ish skew over many partitions: candidate+recount must equal
    the exact groupBy top-k, and the certificate must hold."""
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    rows = [(f"w{i % (1 + i % 97)}",) for i in range(20000)]
    df = spark.createDataFrame(rows, "tok string").repartition(16)
    stats = {}
    got = approx_top_k(df, "tok", k=10, stats=stats)
    exact = (
        df.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(10)
    )
    assert [(r.tok, r.n) for r in got.collect()] == [
        (r.tok, r.n) for r in exact.collect()
    ]
    assert stats["proven_exact"] is True
    assert stats["n_rows"] == 20000


def test_approx_top_k_ignores_nulls_and_handles_few_distinct(spark):
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "tok string"
    ).repartition(4)
    stats = {}
    got = approx_top_k(df, "tok", k=5, stats=stats)
    assert [(r.tok, r.n) for r in got.collect()] == [("a", 2), ("b", 1)]
    assert stats["proven_exact"] is True  # all distinct values recounted


def test_approx_top_k_certificate_fails_loud_when_m_too_small(spark):
    """Near-uniform data with tiny m: the certificate must be honest
    (proven_exact False), not silently wrong."""
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    rows = [(f"u{i % 5000}",) for i in range(10000)]
    df = spark.createDataFrame(rows, "tok string").repartition(8)
    stats = {}
    approx_top_k(df, "tok", k=10, per_partition_m=10, stats=stats)
    assert stats["proven_exact"] is False


def test_approx_top_k_long_column(spark):
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    df = spark.createDataFrame([(i % 7,) for i in range(700)], "uid long")
    got = approx_top_k(df, "uid", k=3)
    assert [r.n for r in got.collect()] == [100, 100, 100]
    assert got.schema["uid"].dataType.simpleString() == "bigint"


def test_approx_top_k_rejects_m_below_k(spark):
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    df = spark.createDataFrame([("a",)], "tok string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must be >= k"):
        approx_top_k(df, "tok", k=10, per_partition_m=2)


def test_approx_top_k_partitioning_independent(spark):
    """Candidate sets differ per layout, but the certified result must
    not: identical top-k at 2 and 16 partitions."""
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    rows = [(f"w{i % (1 + i % 37)}",) for i in range(8000)]
    base = spark.createDataFrame(rows, "tok string")
    a = [(r.tok, r.n) for r in approx_top_k(base.repartition(2), "tok", k=8).collect()]
    b = [(r.tok, r.n) for r in approx_top_k(base.repartition(16), "tok", k=8).collect()]
    assert a == b and len(a) == 8


def test_approx_top_k_treats_nan_as_missing(spark):
    """NaN would pass isNotNull but vanish from pandas value_counts —
    it must be excluded from counts AND n_rows so the certificate stays
    sound."""
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    rows = [(float("nan"),)] * 500 + [(1.0,)] * 30 + [(2.0,)] * 20
    df = spark.createDataFrame(rows, "v double").repartition(4)
    stats = {}
    got = [(r.v, r.n) for r in approx_top_k(df, "v", k=2, stats=stats).collect()]
    assert got == [(1.0, 30), (2.0, 20)]
    assert stats["n_rows"] == 50  # NaN rows not counted
    assert stats["proven_exact"] is True

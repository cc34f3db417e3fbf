"""As-of and range joins."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators import joins


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T10:00:00")),
            (2, "A", _ts("2024-01-01T11:00:00")),
            (3, "B", _ts("2024-01-01T10:30:00")),
            (4, "C", _ts("2024-01-01T10:00:00")),  # no quotes for C
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T09:59:00"), 10.0),
            ("A", _ts("2024-01-01T10:30:00"), 11.0),
            ("B", _ts("2024-01-01T10:31:00"), 20.0),  # after the B trade
        ],
        "q_sym string, q_ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = {r.trade_id: r.px for r in joins.asof_join(
        trades, quotes, "ts", "q_ts", "sym", "q_sym", left_id="trade_id"
    ).collect()}
    assert out == {1: 10.0, 2: 11.0, 3: None, 4: None}


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = {r.trade_id: r.px for r in joins.asof_join(
        trades, quotes, "ts", "q_ts", "sym", "q_sym",
        left_id="trade_id", direction="forward",
    ).collect()}
    assert out == {1: 11.0, 2: None, 3: 20.0, 4: None}


def test_asof_without_left_id_synthesizes(trades_quotes):
    trades, quotes = trades_quotes
    out = joins.asof_join(trades, quotes, "ts", "q_ts", "sym", "q_sym")
    assert sorted(out.columns) == sorted(["trade_id", "sym", "ts", "q_ts", "px"])
    assert out.count() == trades.count()


def test_asof_suffixes_colliding_columns(spark):
    left = spark.createDataFrame([(1, "A", _ts("2024-01-01T10:00:00"))], "id long, sym string, ts timestamp")
    right = spark.createDataFrame([("A", _ts("2024-01-01T09:00:00"))], "sym string, ts timestamp")
    out = joins.asof_join(left, right, "ts", "ts", "sym", "sym", left_id="id",
                          right_cols=["ts"])
    assert "ts_r" in out.columns  # collision suffixed, selectable by name
    assert out.select("ts_r").collect()[0][0] == _ts("2024-01-01T09:00:00")


def test_merge_asof_handles_null_timestamps(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T10:00:00")), (2, "A", None)],
        "trade_id long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01T09:00:00"), 10.0), ("A", None, 99.0)],
        "q_sym string, q_ts timestamp, px double",
    )
    out = {r.trade_id: r.px for r in joins.merge_asof_grouped(
        left, right, "ts", "q_ts", "sym", "q_sym", ["px"]
    ).collect()}
    # null-ts left row survives with NULL match; null-ts quote never matches
    assert out == {1: 10.0, 2: None}


def test_merge_asof_grouped_matches_join_form(trades_quotes):
    trades, quotes = trades_quotes
    a = {r.trade_id: r.px for r in joins.asof_join(
        trades, quotes, "ts", "q_ts", "sym", "q_sym", left_id="trade_id"
    ).collect()}
    b = {r.trade_id: r.px for r in joins.merge_asof_grouped(
        trades, quotes, "ts", "q_ts", "sym", "q_sym", ["px"]
    ).collect()}
    assert a == b


def test_range_join(spark):
    points = spark.createDataFrame([(1, 5), (2, 15)], "id long, v int")
    bands = spark.createDataFrame([(1, 0), (1, 10)], "id long, lo int")
    out = joins.range_join(
        points, bands, ["id"], (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("lo") + 10)
    )
    assert out.count() == 1  # only (v=5, lo=0) matches on id=1


def test_range_join_left_outer_preserves_unmatched(spark):
    points = spark.createDataFrame([(1, 5), (2, 99)], "id long, v int")
    bands = spark.createDataFrame([(1, 0), (2, 0)], "id long, lo int")
    out = joins.range_join(
        points, bands, ["id"],
        (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("lo") + 10),
        how="left",
    )
    rows = {r.id: r.lo for r in out.collect()}
    assert rows == {1: 0, 2: None}  # id=2 out of band → survives null-extended


def test_salted_join_refuses_full_outer(spark):
    l = spark.createDataFrame([(1, "a")], "k long, v string")
    r = spark.createDataFrame([(2, "x")], "k long, tag string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        joins.salted_join(l, r, ["k"], how="full")


def test_merge_asof_refuses_column_collision(spark):
    l = spark.createDataFrame([(1, "A", 1.0)], "id long, sym string, px double")
    r = spark.createDataFrame([("A", 2.0)], "sym string, px double")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        joins.merge_asof_grouped(l, r, "px", "px", "sym", "sym", ["px"])


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k % 3, i) for i, k in enumerate(range(30))], "k long, v long"
    )
    right = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k long, tag string")
    plain = {(r.k, r.v, r.tag) for r in left.join(right, ["k"]).collect()}
    salted = {(r.k, r.v, r.tag) for r in joins.salted_join(left, right, ["k"]).collect()}
    assert salted == plain


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    right = spark.createDataFrame([(1, "x")], "k long, tag string")
    out = {r.v: r.tag for r in joins.salted_join(left, right, ["k"], how="left").collect()}
    assert out == {"a": "x", "b": None}


def test_bucketized_range_join(spark):
    pts = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 3)), (2, datetime.date(2024, 2, 1))],
        "id long, p date",
    )
    iv = spark.createDataFrame(
        [(datetime.date(2024, 1, 1), datetime.date(2024, 1, 7))],
        "ws date, we date",
    )
    out = joins.bucketized_range_join(pts, iv, "p", "ws", "we")
    assert [r.id for r in out.collect()] == [1]


def test_salted_join_preserves_user_salt_column(spark):
    """A pre-existing `_salt` column must pass through unharmed."""
    left = spark.createDataFrame([(1, "keep_l")], "k long, _salt string")
    right = spark.createDataFrame([(1, "tag")], "k long, tag string")
    out = joins.salted_join(left, right, ["k"]).collect()
    assert [(r.k, r._salt, r.tag) for r in out] == [(1, "keep_l", "tag")]


def test_asof_join_tolerance_bounds_match_gap(spark):
    import datetime

    from animaltrackingetls_spark.operators import joins

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 7, t0)], "lid long, uid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, t0 - datetime.timedelta(seconds=90), 1.0),
         (7, t0 - datetime.timedelta(seconds=30), 2.0)],
        "uid long, rts timestamp, val double",
    )
    # no tolerance: latest prior row (30s ago) matches
    out = joins.asof_join(left, right, "ts", "rts", "uid", "uid", left_id="lid").collect()
    assert out[0].val == 2.0
    # 60s tolerance still admits the 30s-ago row
    out = joins.asof_join(
        left, right, "ts", "rts", "uid", "uid", left_id="lid",
        tolerance_seconds=60,
    ).collect()
    assert out[0].val == 2.0
    # 10s tolerance excludes everything → NULL match
    out = joins.asof_join(
        left, right, "ts", "rts", "uid", "uid", left_id="lid",
        tolerance_seconds=10,
    ).collect()
    assert out[0].val is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        joins.asof_join(
            left, right, "ts", "rts", "uid", "uid", tolerance_seconds=-1
        )

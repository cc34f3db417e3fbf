"""Validation rules: counts, NULL semantics, single-scan plan."""

from __future__ import annotations

import pytest

from animaltrackingetls_spark.operators.validate import (
    in_range,
    in_set,
    matches,
    not_null,
    unique_violations,
    validate,
    validation_report,
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", "x1"),
            (2, -5.0, "B", "x2"),     # range violation
            (3, None, "A", "yy"),     # null + range(null) + regex violations
            (3, 50.0, "C", "x3"),     # dup id + set violation
            (5, 200.0, None, "x4"),   # range + set(null) violations
        ],
        "id long, v double, cat string, code string",
    )


def test_rule_counts_and_null_semantics(frame):
    out = {
        r.rule: (r.n_violations, r.n_rows)
        for r in validate(
            frame,
            [
                not_null("v"),
                in_range("v", 0.0, 100.0),
                in_set("cat", ["A", "B"]),
                matches("code", "^x[0-9]$"),
            ],
        ).collect()
    }
    assert out["v:not_null"] == (1, 5)
    assert out["v:in_range"] == (3, 5)   # -5, NULL, 200
    assert out["cat:in_set"] == (2, 5)   # C and NULL
    assert out["code:matches"] == (1, 5)  # yy


def test_unique_violations_counts_all_rows_of_dup_keys(frame):
    row = unique_violations(frame, ["id"]).first()
    assert row.rule == "id:unique"
    assert row.n_violations == 2  # both rows of id=3
    assert row.n_rows == 5


def test_report_unions_and_value_rules_share_one_scan(spark, frame):
    from animaltrackingetls_spark.plans.audit import formatted_plan

    rules = [not_null("v"), in_range("v", 0.0, 100.0), in_set("cat", ["A"])]
    value_only = validate(frame, rules)
    # all value rules ride ONE aggregate over one scan
    import re

    plan = formatted_plan(value_only)
    assert len(re.findall(r"\(\d+\) Scan", plan)) == 1

    report = validation_report(frame, rules, unique_keys=[["id"], ["code"]])
    assert report.count() == 5  # 3 value rules + 2 uniqueness rules

    with pytest.raises(ValueError):
        validate(frame, [])


def test_iqr_outliers_flags_tails_only(spark):
    from animaltrackingetls_spark.operators.validate import iqr_outliers

    rows = [(float(v),) for v in range(1, 101)] + [(1000.0,), (-500.0,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    row = iqr_outliers(df, "v").first()
    assert row.rule == "v:iqr_outliers"
    assert row.n_violations == 2      # only the planted extremes; NULL exempt
    assert row.n_rows == 103

    # k=0 collapses the fence to [q1, q3]: ~half the uniform data flagged
    tight = iqr_outliers(df, "v", k=0.0).first()
    assert tight.n_violations > 40

    import pytest as _pytest

    with _pytest.raises(ValueError):
        iqr_outliers(df, "v", k=-1)


def test_expectation_gated_upsert_three_modes(spark, tmp_path):
    """The DLT expectation modes on the versioned writer: fail aborts
    atomically with per-rule counts, drop filters, quarantine routes
    tagged rows to a keyed diagnostic table exactly-once — and a
    replayed quarantine batch is a no-op on BOTH tables."""
    import pytest as _pytest

    from animaltrackingetls_spark.inventory import (
        list_versions,
        read_versioned,
    )
    from animaltrackingetls_spark.operators.validate import (
        in_range,
        not_null,
        split_expectations,
        upsert_versioned_with_expectations,
    )

    rules = [not_null("v"), in_range("score", 0.0, 1.0)]
    good = [(1, "a", 0.5), (2, "b", 0.9)]
    bad = [(3, None, 0.5), (4, "d", 7.0)]
    df = spark.createDataFrame(good + bad, "k long, v string, score double")

    # split: first violated rule wins the tag
    sp = split_expectations(df, rules)
    tags = {r.k: r._failure_reason for r in sp.failed.collect()}
    assert tags == {3: "v:not_null", 4: "score:in_range"}
    assert {r.k for r in sp.passed.collect()} == {1, 2}

    # fail: nothing published
    t = str(tmp_path / "t_fail")
    with _pytest.raises(ValueError, match="nothing was written"):
        upsert_versioned_with_expectations(
            spark, t, df, ["k"], rules, on_violation="fail",
        )
    import os

    assert not os.path.exists(os.path.join(t, "_CURRENT"))
    out, rep = upsert_versioned_with_expectations(
        spark, t, spark.createDataFrame(good, "k long, v string, score double"),
        ["k"], rules, on_violation="fail",
    )
    assert out.count() == 2 and rep["n_failed"] == 0

    # drop
    t2 = str(tmp_path / "t_drop")
    out, rep = upsert_versioned_with_expectations(
        spark, t2, df, ["k"], rules, on_violation="drop",
    )
    assert {r.k for r in out.collect()} == {1, 2}
    assert rep["n_passed"] == 2 and rep["n_failed"] == 2
    assert rep["by_rule"]["v:not_null"] == 1

    # quarantine, exactly-once
    t3, q = str(tmp_path / "t_q"), str(tmp_path / "quarantine")
    out, rep = upsert_versioned_with_expectations(
        spark, t3, df, ["k"], rules, on_violation="quarantine",
        quarantine_dir=q, txn_app_id="g", txn_version=1,
    )
    assert {r.k for r in out.collect()} == {1, 2}
    qrows = {r.k: r._failure_reason
             for r in read_versioned(spark, q).collect()}
    assert set(qrows) == {3, 4}
    v_main, v_q = list_versions(t3), list_versions(q)
    # replay: both tables' watermarks no-op (no new versions)
    upsert_versioned_with_expectations(
        spark, t3, df, ["k"], rules, on_violation="quarantine",
        quarantine_dir=q, txn_app_id="g", txn_version=1,
    )
    assert list_versions(t3) == v_main and list_versions(q) == v_q

    with _pytest.raises(ValueError, match="quarantine_dir"):
        upsert_versioned_with_expectations(
            spark, t3, df, ["k"], rules, on_violation="quarantine",
        )
    with _pytest.raises(ValueError, match="fail|drop|quarantine"):
        upsert_versioned_with_expectations(
            spark, t3, df, ["k"], rules, on_violation="explode",
        )


def test_quarantine_summary_and_prune(spark, tmp_path):
    """Round-12 quarantine ergonomics: counts by rule x day with sample
    keys, NULL keys visible; retention drops aged rows."""
    import datetime as dt

    from animaltrackingetls_spark.inventory import (
        read_versioned,
        upsert_parquet_versioned,
    )
    from animaltrackingetls_spark.operators.validate import (
        FAILED_RULE,
        prune_quarantine,
        quarantine_summary,
    )

    q = str(tmp_path / "q")
    old_ts = dt.datetime(2020, 1, 2, 3, 0, 0)
    new_ts = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    rows = [
        (1, "v:in_range", old_ts),
        (2, "v:in_range", old_ts),
        (None, "k:not_null", old_ts),
        (4, "v:in_range", new_ts),
    ]
    df = spark.createDataFrame(
        rows, f"k long, {FAILED_RULE} string, ts timestamp")
    upsert_parquet_versioned(spark, q, df, ["k"], keep_versions=2)

    got = quarantine_summary(
        read_versioned(spark, q), ["k"], ts_col="ts").collect()
    by = {(r["rule"], str(r["day"])): (r["n"], list(r["sample_keys"]))
          for r in got}
    assert by[("v:in_range", "2020-01-02")] == (2, ["1", "2"])
    assert by[("k:not_null", "2020-01-02")] == (1, ["NULL"])
    assert by[("v:in_range", str(new_ts.date()))][0] == 1

    # no-ts variant + not-a-quarantine guard
    flat = {r["rule"]: r["n"] for r in quarantine_summary(
        read_versioned(spark, q), ["k"]).collect()}
    assert flat == {"v:in_range": 3, "k:not_null": 1}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a quarantine table"):
        quarantine_summary(df.drop(FAILED_RULE), ["k"])

    # retention: the 2020 rows age out, today's row survives
    prune_quarantine(spark, q, "ts", older_than_days=30)
    left = read_versioned(spark, q)
    assert {r["k"] for r in left.collect()} == {4}

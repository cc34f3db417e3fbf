"""Deterministic sampling: partitioning-independence and rates."""

from __future__ import annotations

from animaltrackingetls_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)


def _docs(spark):
    rows = [(i, "en" if i % 3 else "zh") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_sample_is_partitioning_independent(spark):
    df = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.25).collect()}
    b = {r.doc_id for r in deterministic_sample(df.repartition(17), "doc_id", 0.25).collect()}
    assert a == b  # df.sample() would NOT survive this


def test_sample_rate_approximate(spark):
    df = _docs(spark)
    n = deterministic_sample(df, "doc_id", 0.25).count()
    assert 0.20 * 2000 < n < 0.30 * 2000


def test_sample_monotone_in_rate(spark):
    df = _docs(spark)
    small = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5).collect()}
    assert small <= big  # nested samples: raising the rate only adds rows


def test_stratified_rates_and_dropped_strata(spark):
    df = _docs(spark)
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.5})
    langs = {r.lang for r in out.collect()}
    assert langs == {"en"}  # zh absent from rates → dropped
    n_en = out.count()
    total_en = df.filter("lang = 'en'").count()
    assert 0.4 * total_en < n_en < 0.6 * total_en


def test_rate_one_keeps_everything(spark):
    df = _docs(spark)
    assert deterministic_sample(df, "doc_id", 1.0).count() == df.count()
    out = stratified_sample(df, "doc_id", "lang", {"en": 1.0})
    assert out.count() == df.filter("lang = 'en'").count()


def test_rate_zero_keeps_nothing(spark):
    assert deterministic_sample(_docs(spark), "doc_id", 0.0).count() == 0


def test_sample_rejects_bad_rate(spark):
    import pytest

    with pytest.raises(ValueError):
        deterministic_sample(_docs(spark), "doc_id", 1.5)

"""PII redaction: pattern hits, rewrite order, filter policy, plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from animaltrackingetls_spark.operators.privacy import (
    pii_document_filter,
    redact_pii,
)

ROWS = [
    (0, "mail me at jane.doe+spam@corp.example.org thanks"),
    (1, "call 212-555-012-3456 or 33-123-456-7890"),
    (2, "server at 10.0.42.7 and 192.168.1.254"),
    (3, "ssn 123-45-6789 on file"),
    (4, "clean text, nothing to hide"),
    (5, "both a@b.io and 1.2.3.4 here"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, text string")


def test_counts_per_type(spark):
    out = {r.id: r for r in redact_pii(_df(spark)).collect()}
    assert (out[0].n_email, out[1].n_phone, out[2].n_ipv4, out[3].n_ssn) == (
        1, 2, 2, 1,
    )
    assert out[4].n_email == out[4].n_phone == out[4].n_ipv4 == out[4].n_ssn == 0
    assert out[5].n_email == 1 and out[5].n_ipv4 == 1


def test_redaction_replaces_with_tokens(spark):
    out = {r.id: r.text for r in redact_pii(_df(spark)).collect()}
    assert out[0] == "mail me at [EMAIL] thanks"
    assert out[1] == "call [PHONE] or [PHONE]"
    assert out[2] == "server at [IPV4] and [IPV4]"
    assert out[3] == "ssn [SSN] on file"
    assert out[4] == "clean text, nothing to hide"


def test_ssn_inside_phone_not_double_redacted(spark):
    # a phone-shaped string contains no SSN match and vice versa;
    # application order must leave exactly one token.
    df = spark.createDataFrame([(0, "num 12-345-678-9012 end")], "id long, text string")
    out = redact_pii(df).collect()[0]
    assert out.text == "num [PHONE] end"
    assert out.n_phone == 1 and out.n_ssn == 0


def test_out_col_keeps_original(spark):
    out = redact_pii(_df(spark), out_col="redacted").collect()
    by_id = {r.id: r for r in out}
    assert "@" in by_id[0].text and by_id[0].redacted == "mail me at [EMAIL] thanks"


def test_document_filter_policy(spark):
    kept = {r.id for r in pii_document_filter(_df(spark)).collect()}
    assert kept == {4}
    loose = {r.id for r in pii_document_filter(_df(spark), max_hits=1).collect()}
    assert loose == {0, 3, 4}


def test_redaction_stays_in_codegen(spark):
    # map-only stage: no exchange, no python worker in the plan
    plan = redact_pii(_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan

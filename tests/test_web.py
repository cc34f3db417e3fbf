"""URL/domain curation: host extraction, eTLD+1, list gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators import web


def test_url_host_strips_userinfo_port_and_survives_garbage(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.Blog.Spam.CO.UK:8080/p/1?q=x",),
            ("https://user:pw@a.b.Example.com/x",),
            ("http://localhost/x",),
            ("https://example.org",),
            ("not a url at all ::",),
            (None,),
        ],
        "url string",
    )
    got = [
        r.h
        for r in df.select(web.url_host(F.col("url")).alias("h")).collect()
    ]
    assert got == [
        "WWW.Blog.Spam.CO.UK",  # port stripped, case preserved by parse
        "a.b.Example.com",      # userinfo stripped
        "localhost",
        "example.org",
        None,                   # invalid -> NULL, never an exception
        None,
    ]


def test_registered_domain_multipart_suffixes_and_casefold(spark):
    cases = [
        ("WWW.Blog.Spam.CO.UK", "spam.co.uk"),    # 3 labels for co.uk
        ("a.b.example.com", "example.com"),       # 2 labels otherwise
        ("site1.co.uk", "site1.co.uk"),           # already eTLD+1
        ("example.org", "example.org"),
        ("localhost", "localhost"),               # single label as-is
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r.d
        for r in df.select(
            web.registered_domain(F.col("host")).alias("d")
        ).collect()
    ]
    assert got == [d for _, d in cases]


def test_domain_gate_block_allow_and_fail_closed(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.spam.co.uk/x"),   # blocked via subdomain
            (2, "https://ok.example.net/y"),
            (3, "https://spam.co.uk:443/z"),   # blocked, port noise
            (4, "::: not a url"),              # unparseable -> dropped
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame([("spam.co.uk",)], "domain string")
    kept = {r.id for r in web.domain_gate(df, "url", bl, mode="block").collect()}
    assert kept == {2}
    allowed = {
        r.id for r in web.domain_gate(df, "url", bl, mode="allow").collect()
    }
    assert allowed == {1, 3}
    with pytest.raises(ValueError, match="block|allow"):
        web.domain_gate(df, "url", bl, mode="deny")


def test_domain_gate_rejects_reserved_dom_column(spark):
    """A caller-owned '_dom' column must raise, not be silently
    clobbered and dropped (r7 ADVICE; matches sampling's
    _reject_reserved_columns convention, case-insensitive)."""
    bl = spark.createDataFrame([("example.com",)], "domain string")
    for col in ("_dom", "_DOM"):
        df = spark.createDataFrame(
            [(1, "https://a.example.com/x", "keepme")],
            f"id long, url string, {col} string",
        )
        with pytest.raises(ValueError, match="_dom"):
            web.domain_gate(df, "url", bl, mode="block")


def test_domain_gate_is_broadcast(spark):
    """The gate must not shuffle: the list side broadcasts."""
    from animaltrackingetls_spark.plans.audit import assert_broadcast_join

    df = spark.createDataFrame([(1, "https://a.example.com/x")], "id long, url string")
    bl = spark.createDataFrame([("example.com",)], "domain string")
    assert_broadcast_join(web.domain_gate(df, "url", bl, mode="block"))

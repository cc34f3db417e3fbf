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


# rule set exercising every PSL construct: plain, multi-part, wildcard,
# exception, comments/blanks (format per publicsuffix.org/list)
_PSL_LINES = [
    "// ===BEGIN ICANN DOMAINS===",
    "",
    "com",
    "uk",
    "co.uk",
    "jp",
    "ac.jp",
    "*.kawasaki.jp",
    "!city.kawasaki.jp",
    "*.ck",
    "!www.ck",
    "us",
    "k12.ak.us",
]

# (host, expected registered domain) — drawn from the official
# checkPublicSuffix test vectors for these rules
_PSL_CASES = [
    ("example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("com", None),                      # host IS a public suffix
    ("example.co.uk", "example.co.uk"),
    ("www.example.co.uk", "example.co.uk"),
    ("co.uk", None),
    ("uk", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    # wildcard *.kawasaki.jp: 'test.kawasaki.jp' is a public suffix
    ("test.kawasaki.jp", None),
    ("www.test.kawasaki.jp", "www.test.kawasaki.jp"),
    # exception !city.kawasaki.jp beats the wildcard
    ("city.kawasaki.jp", "city.kawasaki.jp"),
    ("www.city.kawasaki.jp", "city.kawasaki.jp"),
    ("test.ck", None),                  # *.ck
    ("www.test.ck", "www.test.ck"),
    ("www.ck", "www.ck"),               # exception !www.ck
    ("www.www.ck", "www.ck"),
    # no matching rule -> implicit '*' default
    ("example.pvt", "example.pvt"),
    ("a.example.pvt", "example.pvt"),
    ("pvt", None),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
    # case folding + trailing dot normalization
    ("WwW.Example.COM", "example.com"),
    ("example.com.", "example.com"),
    # IP literals -> NULL
    ("192.168.0.1", None),
    ("[2001:db8::1]", None),
    (None, None),
]


def test_registered_domain_psl_official_vectors(spark):
    """Full PSL semantics against the official checkPublicSuffix
    vectors for a rule set spanning plain/multi-part/wildcard/
    exception rules, the implicit '*' default, public-suffix hosts,
    normalization, and IP literals."""
    rows = [(i, h) for i, (h, _) in enumerate(_PSL_CASES)]
    df = spark.createDataFrame(rows, "id long, host string")
    out = web.registered_domain_psl(df, "host", _PSL_LINES, out_col="rd")
    got = {r.id: r.rd for r in out.collect()}
    for i, (host, want) in enumerate(_PSL_CASES):
        assert got[i] == want, f"host {host!r}: got {got[i]!r}, want {want!r}"
    # output columns: input + out_col, no _psl_* residue
    assert out.columns == ["id", "host", "rd"]


def test_registered_domain_psl_accepts_table_and_is_shuffle_free(spark):
    """The production shape: rules shipped as a DataFrame (broadcast
    table); the derivation must add zero exchanges to a scan."""
    rules_df = spark.createDataFrame([(l,) for l in _PSL_LINES], "rule string")
    df = spark.createDataFrame(
        [(1, "www.example.co.uk"), (2, "test.ck")], "id long, host string"
    )
    out = web.registered_domain_psl(df, "host", rules_df, out_col="rd")
    got = {r.id: r.rd for r in out.collect()}
    assert got == {1: "example.co.uk", 2: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # broadcast exchanges ship the rule tables (fine); what must be
    # absent is any shuffle of the corpus side
    import re as _re

    assert not _re.search(r"Exchange (hash|range)partitioning", plan), plan
    # pre-parsed dict form matches too
    parsed = web.parse_psl_rules(rules_df)
    out2 = web.registered_domain_psl(df, "host", parsed, out_col="rd")
    assert {r.id: r.rd for r in out2.collect()} == got


def _psl_reference(host: str | None, lines: list[str]) -> str | None:
    """Independent pure-Python implementation of the published PSL
    algorithm (rule labels matched right-to-left, '*' consumes one
    label, exception prevails then longest match then implicit '*'),
    used only to cross-check the Spark join-based form."""
    rules = []
    for line in lines:
        line = (line or "").strip()
        if not line or line.startswith("//"):
            continue
        token = line.split()[0].lower().strip(".")
        is_exc = token.startswith("!")
        if is_exc:
            token = token[1:]
        if not token:
            continue
        rules.append((token.split("."), is_exc))
    if host is None:
        return None
    h = host.lower().rstrip(".")
    import re

    if not h or re.fullmatch(r"\d{1,3}(\.\d{1,3}){3}", h) or ":" in h:
        return None
    labels = h.split(".")
    if "" in labels:
        return None

    def matches(rl):
        if len(rl) > len(labels):
            return False
        return all(
            r == "*" or r == l
            for r, l in zip(reversed(rl), reversed(labels))
        )

    exc = [rl for rl, e in rules if e and matches(rl)]
    if exc:
        pub_len = max(len(rl) for rl in exc) - 1
    else:
        norm = [rl for rl, e in rules if not e and matches(rl)]
        pub_len = max((len(rl) for rl in norm), default=1)
    if len(labels) > pub_len:
        return ".".join(labels[len(labels) - pub_len - 1:])
    return None


def test_registered_domain_psl_randomized_vs_reference(spark):
    """400 seeded-random hosts built from labels that collide with
    every rule construct in _PSL_LINES (plus IPs, trailing dots, case,
    deep subdomains) must agree exactly with an independent Python
    implementation of the published algorithm."""
    import random

    rng = random.Random(42)
    parts = [
        "a", "b", "ck", "uk", "co", "www", "test", "kawasaki", "jp",
        "com", "ac", "city", "k12", "ak", "us", "x1", "example", "pvt",
    ]
    hosts: list[str | None] = []
    for _ in range(380):
        n = rng.randint(1, 5)
        h = ".".join(rng.choice(parts) for _ in range(n))
        roll = rng.random()
        if roll < 0.05:
            h = h.upper()
        elif roll < 0.10:
            h = h + "."
        hosts.append(h)
    hosts += ["10.0.0.1", "[::1]", "a:b:c", None, "com.", "WWW.CK",
              "x1." * 6 + "ck", "ck", "us", "k12.ak.us"]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "id long, host string"
    )
    out = web.registered_domain_psl(df, "host", _PSL_LINES, out_col="rd")
    got = {r.id: r.rd for r in out.collect()}
    for i, h in enumerate(hosts):
        want = _psl_reference(h, _PSL_LINES)
        assert got[i] == want, f"host {h!r}: got {got[i]!r}, want {want!r}"


def test_registered_domain_psl_handles_real_psl_sized_rule_table(spark):
    """The production PSL is ~10k rules across ≤5 label counts. The
    join form must stay one-join-per-length with rules in broadcast
    DATA — a rules-in-the-expression-tree design would melt down in
    analysis at this size (the Catalyst expression-size lesson). 9k
    synthetic rules + wildcard/exception spot checks, matched against
    the independent reference implementation."""
    import random

    rng = random.Random(7)
    rules = ["com", "org", "uk", "co.uk"]
    for i in range(9000):
        ln = rng.randint(1, 4)
        rules.append(".".join(f"s{rng.randint(0, 400)}" for _ in range(ln)))
    rules += ["*.wild9k", "!keep.wild9k"]
    hosts = []
    for i in range(60):
        ln = rng.randint(1, 5)
        hosts.append(".".join(f"s{rng.randint(0, 400)}" for _ in range(ln)))
    hosts += ["a.b.wild9k", "keep.wild9k", "x.keep.wild9k", "www.a.co.uk"]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "id long, host string"
    )
    out = web.registered_domain_psl(df, "host", rules, out_col="rd")
    got = {r.id: r.rd for r in out.collect()}
    for i, h in enumerate(hosts):
        want = _psl_reference(h, rules)
        assert got[i] == want, f"host {h!r}: got {got[i]!r}, want {want!r}"


def test_registered_domain_psl_rejects_colliding_columns(spark):
    df = spark.createDataFrame([(1, "a.com", "x")], "id long, host string, rd string")
    with pytest.raises(ValueError, match="rd"):
        web.registered_domain_psl(df, "host", _PSL_LINES, out_col="rd")
    df2 = spark.createDataFrame(
        [(1, "a.com", "x")], "id long, host string, _psl_n string"
    )
    with pytest.raises(ValueError, match="_psl_"):
        web.registered_domain_psl(df2, "host", _PSL_LINES)


def test_domain_gate_with_psl_rules_and_ip_guard(spark):
    """domain_gate(psl_rules=...): blocking a wildcard-suffix
    registrable domain must catch subdomains; IP-hosted URLs fail
    closed in both modes; the heuristic path now also NULLs IP hosts
    instead of inventing a last-two-octet 'domain'."""
    df = spark.createDataFrame(
        [
            (1, "https://www.test.ck/x"),        # reg dom www.test.ck
            (2, "https://sub.www.test.ck/y"),    # same reg dom via subdomain
            (3, "https://other.ck/z"),           # reg dom NULL (public suffix)
            (4, "https://ok.example.com/w"),
            (5, "http://192.168.0.1/ip"),        # IP -> dropped both modes
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame([("www.test.ck",)], "domain string")
    blocked = {
        r.id
        for r in web.domain_gate(
            df, "url", bl, mode="block", psl_rules=_PSL_LINES
        ).collect()
    }
    assert blocked == {4}  # 1,2 blocked; 3 unattributable; 5 IP
    allowed = {
        r.id
        for r in web.domain_gate(
            df, "url", bl, mode="allow", psl_rules=_PSL_LINES
        ).collect()
    }
    assert allowed == {1, 2}
    # heuristic path: IP host -> NULL -> dropped
    heur = {r.id for r in web.domain_gate(df, "url", bl, mode="block").collect()}
    assert 5 not in heur


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

"""URL / domain curation for web-corpus pipelines.

A pretraining crawl is keyed by URL: the standard gates — blocklist the
spam domains, cap pages per site, group by registered domain for
quotas and dedup — all need (host → registered domain) extraction that
is correct on the messy parts of real URLs (ports, userinfo, uppercase
hosts, multi-part public suffixes like ``co.uk``).

Spark-first shape: host extraction is the JVM built-in ``try_parse_url``
(java.net.URI semantics: strips scheme, userinfo, port, path);
registered-domain derivation is pure string expressions over the label
array; list gates are broadcast semi/anti joins on the registered
domain — blocking ``spam.co.uk`` must also block ``www.spam.co.uk``,
which a raw-host match silently misses. Everything is codegen on the
scan; the only shuffle a gate introduces is none (broadcast).

The suffix table is a HEURISTIC subset of the public-suffix list — the
common multi-part commercial/academic suffixes — not the full
Mozilla PSL (thousands of entries, updated continuously; in production
ship the real PSL as a broadcast table and swap it in via
``multi_part_suffixes=``). The fallback is classic eTLD+1: last two
labels.

Reference behavior anchor: the reference's enrichment tier keys its
geocode cache by URL-shaped API endpoints (monarch_etl/enrichment.py);
this module is the curation-side generalization a 100 TB web corpus
needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# common multi-part public suffixes (heuristic subset; see module doc)
MULTI_PART_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr", "com.sg",
    "co.in", "co.nz", "co.za", "co.kr",
)


def url_host(c: Column) -> Column:
    """Host of a URL — java.net.URI semantics via the JVM ``parse_url``:
    no scheme, no ``user:pw@`` userinfo, no ``:port``, no path. NULL for
    unparseable strings via ``try_parse_url`` — Spark 4's plain
    ``parse_url`` THROWS on an invalid URL, and a corrupt URL in a
    100 TB crawl column must not kill the job."""
    return F.try_parse_url(c, F.lit("HOST"))


def url_path(c: Column) -> Column:
    return F.try_parse_url(c, F.lit("PATH"))


def url_query(c: Column) -> Column:
    return F.try_parse_url(c, F.lit("QUERY"))


def registered_domain(
    host: Column,
    multi_part_suffixes: tuple[str, ...] = MULTI_PART_SUFFIXES,
) -> Column:
    """eTLD+1 from a host: ``www.blog.spam.co.uk`` → ``spam.co.uk``,
    ``a.b.example.com`` → ``example.com``; a bare or two-label host is
    returned as-is. Case-folded (hosts are case-insensitive). Pure
    string expressions — no UDF. IP-literal hosts come out as their
    last two octets (a meaningless "domain"); gate IP-hosted URLs by
    the raw host instead if they matter to your blocklist."""
    labels = F.split(F.lower(host), r"\.")
    k = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return F.when(host.isNull(), F.lit(None).cast("string")).when(
        k <= 2, F.lower(host)
    ).when(last2.isin(*multi_part_suffixes), last3).otherwise(last2)


def domain_gate(
    df: DataFrame,
    url_col: str,
    domains: DataFrame,
    mode: str = "block",
    domain_col: str = "domain",
) -> DataFrame:
    """Blocklist/allowlist gate on the REGISTERED domain of a URL
    column: ``mode='block'`` drops rows whose eTLD+1 is in ``domains``
    (subdomains included — the evasion a raw-host match misses);
    ``mode='allow'`` keeps only those. Unparseable URLs (NULL host) are
    DROPPED in both modes: an unattributable page fails a curation gate
    closed, not open.

    ``domains`` is broadcast — blocklists are thousands-to-millions of
    rows, never corpus-sized; the gate adds zero shuffles.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be block|allow, got {mode!r}")
    # same convention as sampling._reject_reserved_columns: the staging
    # column must not silently clobber caller data (case-insensitive,
    # matching spark.sql.caseSensitive=false resolution)
    clash = [c for c in df.columns if c.lower() == "_dom"]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with domain_gate's reserved "
            "working column '_dom'; rename them first"
        )
    dom = registered_domain(url_host(F.col(url_col)))
    keyed = df.withColumn("_dom", dom).filter(F.col("_dom").isNotNull())
    side = F.broadcast(
        domains.select(F.lower(F.col(domain_col)).alias("_dom")).distinct()
    )
    how = "left_anti" if mode == "block" else "left_semi"
    return keyed.join(side, "_dom", how).drop("_dom")

"""Paginated REST source: pagination, pushdown, caps, slices, retry."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.sources import (
    FixtureTransport,
    PagedRestDataSource,
    fetch_all_pages,
    fetch_page_with_retry,
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    for i in range(3):
        recs = [
            {
                "gbifID": str(i * 5 + k), "eventDate": f"2024-01-{i + 1:02d}",
                "decimalLatitude": 40.0 + k, "decimalLongitude": -74.0,
                "individualCount": k, "year": 2024, "month": 1, "day": i + 1,
                "country": "US" if k % 2 == 0 else "MX", "basisOfRecord": "OBS",
            }
            for k in range(5)
        ]
        (d / f"page_{i}.json").write_text(
            json.dumps({"results": recs, "endOfRecords": i == 2})
        )
    return str(d)


@pytest.fixture(scope="module")
def reader(spark, fixture_dir):
    spark.dataSource.register(PagedRestDataSource)

    def read(**opts):
        r = spark.read.format("paged_rest").option("fixture_dir", fixture_dir)
        r = r.option("limit_per_request", 5)
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    return read


def test_full_scan_partition_per_page(reader):
    assert reader(max_pages=10).count() == 15


def test_filter_pushdown_reaches_source(reader):
    # the fixture transport filters server-side: 3 US records per page
    assert reader(max_pages=10).filter(F.col("country") == "US").count() == 9


def test_unpushable_filter_still_correct(reader):
    out = reader(max_pages=10).filter(F.col("decimalLatitude") > 42.0)
    assert out.count() == 6  # post-scan filter on a non-pushable column


def test_page_cap(reader):
    assert reader(max_pages=1).count() == 5


def test_records_limitation_slice(reader):
    assert reader(records_limitation=2, max_pages=10).count() == 6


def test_fetch_all_pages_loop_semantics(fixture_dir):
    t = FixtureTransport(fixture_dir)
    assert len(fetch_all_pages(t, limit_per_request=5, max_pages=None)) == 15
    assert len(fetch_all_pages(t, limit_per_request=5, max_pages=2)) == 10
    # server-side filter THEN paginate: 9 distinct US records exist and
    # two 5-record pages cover them all — and none may repeat (the old
    # filter-after-paging fixture re-served page 0 forever)
    us = fetch_all_pages(t, {"country": "US"}, limit_per_request=5, max_pages=2)
    assert len(us) == 9
    ids = [r["key"] if "key" in r else tuple(sorted(r.items())) for r in us]
    assert len(ids) == len(set(map(str, ids)))
    assert len(fetch_all_pages(t, limit_per_request=5, max_pages=None,
                               records_limitation=1)) == 3


def test_retry_backoff_sequence():
    calls, sleeps = [], []

    def flaky(params):
        calls.append(params)
        if len(calls) < 3:
            raise ConnectionError("transient")
        return {"results": [1], "endOfRecords": True}

    page = fetch_page_with_retry(flaky, {}, attempts=5, sleep=sleeps.append)
    assert page["results"] == [1]
    assert len(calls) == 3
    assert sleeps == [2.0, 4.0]  # exponential, base 2


def test_retry_exhaustion_raises():
    def always_down(params):
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        fetch_page_with_retry(always_down, {}, attempts=3, sleep=lambda s: None)


def test_retry_rejects_nonpositive_attempts():
    import pytest

    with pytest.raises(ValueError, match="attempts"):
        fetch_page_with_retry(lambda p: {}, {}, attempts=0)


# --- HTTP transport (recorded fixtures through an injected opener) ---


def _page_server(fixture_dir):
    """(url, timeout) -> bytes opener serving the recorded fixture pages
    the way the live API would: parses offset/limit + filter params from
    the request URL, reuses FixtureTransport's addressing."""
    from urllib.parse import parse_qsl, urlsplit

    calls = []

    def opener(url, timeout):
        calls.append(url)
        params = dict(parse_qsl(urlsplit(url).query))
        return json.dumps(FixtureTransport(fixture_dir).fetch(params)).encode()

    return opener, calls


def test_http_transport_builds_url_and_parses_json(fixture_dir):
    from animaltrackingetls_spark.sources import HttpTransport

    opener, calls = _page_server(fixture_dir)
    t = HttpTransport("https://api.example.org/v1/occurrence/search", opener=opener)
    page = t.fetch({"limit": 5, "offset": 0, "country": "US"})
    # server-side filter applies BEFORE pagination: the first page holds
    # the first `limit` of the 9 filtered records
    assert len(page["results"]) == 5
    assert all(r["country"] == "US" for r in page["results"])
    assert calls == [
        "https://api.example.org/v1/occurrence/search?country=US&limit=5&offset=0"
    ]


def test_http_transport_full_pagination_matches_fixture(fixture_dir):
    from animaltrackingetls_spark.sources import HttpTransport

    opener, calls = _page_server(fixture_dir)
    via_http = fetch_all_pages(
        HttpTransport("https://api.example.org/s", opener=opener),
        limit_per_request=5,
    )
    via_fixture = fetch_all_pages(FixtureTransport(fixture_dir), limit_per_request=5)
    assert via_http == via_fixture and len(via_http) == 15
    assert len(calls) == 3  # one GET per page, stop on endOfRecords


def test_http_transport_retries_transient_errors(fixture_dir):
    from urllib.error import URLError

    from animaltrackingetls_spark.sources import HttpTransport

    good_opener, _ = _page_server(fixture_dir)
    failures = [URLError("boom"), URLError("boom")]

    def flaky(url, timeout):
        if failures:
            raise failures.pop(0)
        return good_opener(url, timeout)

    sleeps = []
    page = fetch_page_with_retry(
        HttpTransport("https://api.example.org/s", opener=flaky).fetch,
        {"limit": 5, "offset": 0},
        sleep=sleeps.append,
    )
    assert len(page["results"]) == 5
    assert sleeps == [2.0, 4.0]  # exponential backoff between attempts


def test_transport_selection_by_option_string(fixture_dir):
    from animaltrackingetls_spark.sources import (
        HttpTransport,
        transport_from_options,
    )

    assert isinstance(
        transport_from_options({"fixture_dir": fixture_dir}), FixtureTransport
    )
    t = transport_from_options(
        {"base_url": "https://api.example.org/s", "timeout": "7"}
    )
    assert isinstance(t, HttpTransport) and t.timeout == 7.0
    explicit = transport_from_options(
        {"transport": "fixture", "fixture_dir": fixture_dir, "base_url": "x"}
    )
    assert isinstance(explicit, FixtureTransport)
    with pytest.raises(ValueError):
        transport_from_options({})  # neither configured
    with pytest.raises(ValueError):
        transport_from_options({"fixture_dir": fixture_dir, "base_url": "x"})
    with pytest.raises(ValueError):
        transport_from_options({"transport": "carrier_pigeon"})
    with pytest.raises(ValueError):
        transport_from_options({"transport": "http"})  # missing base_url


# ---------------------------------------------------------------------------
# fetch_all_pages_cursor
# ---------------------------------------------------------------------------


class _CursorTransport:
    """Serves pages addressed by opaque tokens; records requests."""

    def __init__(self, pages, loop_forever=False):
        # pages: list of record-lists; token for page i is f"tok{i}"
        self.pages = pages
        self.loop_forever = loop_forever
        self.requests = []

    def fetch(self, params):
        self.requests.append(dict(params))
        tok = params.get("cursor")
        idx = 0 if tok is None else int(tok[3:])
        if idx >= len(self.pages):
            return {"results": []}
        nxt = f"tok{idx + 1}" if idx + 1 < len(self.pages) else None
        if self.loop_forever:
            nxt = tok or "tok0"  # malicious server: re-serves the same cursor
        return {"results": self.pages[idx], "next_cursor": nxt}


def test_cursor_pagination_walks_all_pages():
    from animaltrackingetls_spark.sources.rest import fetch_all_pages_cursor

    t = _CursorTransport([[{"i": 1}, {"i": 2}], [{"i": 3}], [{"i": 4}]])
    out = fetch_all_pages_cursor(t, max_pages=None)
    assert [r["i"] for r in out] == [1, 2, 3, 4]
    assert "cursor" not in t.requests[0]          # first page has no token
    assert t.requests[1]["cursor"] == "tok1"      # echoed back verbatim


def test_cursor_pagination_respects_caps_and_slice():
    from animaltrackingetls_spark.sources.rest import fetch_all_pages_cursor

    t = _CursorTransport([[{"i": 1}, {"i": 2}], [{"i": 3}], [{"i": 4}]])
    out = fetch_all_pages_cursor(t, max_pages=2, records_limitation=1)
    assert [r["i"] for r in out] == [1, 3]        # 2 pages, 1 record each


def test_cursor_pagination_terminates_on_repeated_cursor():
    from animaltrackingetls_spark.sources.rest import fetch_all_pages_cursor

    t = _CursorTransport([[{"i": 1}], [{"i": 2}]], loop_forever=True)
    out = fetch_all_pages_cursor(t, max_pages=None)
    assert len(out) <= 2                          # no infinite loop

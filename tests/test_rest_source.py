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
    assert len(fetch_all_pages(t, {"country": "US"}, limit_per_request=5,
                               max_pages=2)) == 6
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

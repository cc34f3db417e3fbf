"""Paginated REST source (SURVEY.md §2.1 S1/S2, §2.5 L1/L2, §2.4 F6).

Reference semantics (studied, not ported — monarch_etl/gbif_client.py:56-164):
offset/limit pagination of ≤``limit_per_request`` JSON records per page;
server-side predicates sent as query params (F6 — year/month/day/
taxonKey/country and friends are *pushed*, not post-filtered); page-count
cap (L2); per-page record slice (L1, the ``records_limitation`` test
knob); stop on ``endOfRecords`` or an empty page; politeness delay
between calls; retry with exponential backoff on transient failures
(S2 — gbif_client.py:29-49 + retry_config.py:28-37).

Two Spark-first forms:

* ``PagedRestDataSource`` — a PySpark custom ``DataSource`` with
  **partition-per-page**: each Spark task fetches one page, so a
  1000-executor cluster drains a deep scan in parallel, and
  ``pushFilters`` turns Catalyst equality predicates into API query
  params (the source-pushed filter the reference hand-codes).
* ``fetch_all_pages`` — the sequential driver-loop fallback with the
  exact reference stop/cap/slice semantics, for politeness-constrained
  APIs where parallel fetch is rude.

Transports are injectable and string-configurable (workers rebuild them
from options via :func:`transport_from_options`): ``FixtureTransport``
replays recorded pages from a local directory (network-free tests);
``HttpTransport`` urlopens the endpoint with the reference's politeness
headers (gbif_client.py:29-49). Tests exercise the HTTP transport with an
injected opener against recorded fixtures — correctness never depends on
a network.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

DEFAULT_PAGE_SIZE = 300          # GBIF max page size (gbif_client.py:61)
DEFAULT_MAX_PAGES = 10           # reference page cap (etl.py:52-54)
DEFAULT_RETRY_ATTEMPTS = 5       # retry_config.py:28-37
DEFAULT_BACKOFF_BASE = 2.0
DEFAULT_BACKOFF_CAP = 10.0

# Predicates the source can push into API query params (F6).
PUSHABLE_ATTRIBUTES = frozenset(
    {"year", "month", "day", "taxonKey", "country", "basisOfRecord"}
)


# ---------------------------------------------------------------------------
# Transports
# ---------------------------------------------------------------------------


@dataclass
class FixtureTransport:
    """Replays recorded pages from ``dir/page_<N>.json``.

    Each file holds ``{"results": [...], "endOfRecords": bool}``. Filter
    params narrow by simple equality BEFORE offset/limit slicing — the
    way a real API serves filtered pagination — so pushdown is
    observable in tests and page windows never re-serve rows.
    """

    fixture_dir: str

    def fetch(self, params: dict) -> dict:
        limit = int(params.get("limit", DEFAULT_PAGE_SIZE))
        offset = int(params.get("offset", 0))
        # A real API applies filters BEFORE pagination: offset/limit
        # address positions in the FILTERED result set. Filtering each
        # stored page after deriving its index from offset would re-serve
        # page 0 forever (the client advances offset by the records it
        # received), duplicating rows — so load all pages, filter, slice.
        all_results: list = []
        page_idx = 0
        while True:
            path = os.path.join(self.fixture_dir, f"page_{page_idx}.json")
            if not os.path.exists(path):
                break
            with open(path) as f:
                page = json.load(f)
            all_results.extend(page.get("results", []))
            if page.get("endOfRecords", False):
                break
            page_idx += 1
        for key, val in params.items():
            if key in ("limit", "offset"):
                continue
            all_results = [r for r in all_results if str(r.get(key)) == str(val)]
        window = all_results[offset : offset + limit]
        return {
            "results": window,
            "endOfRecords": offset + limit >= len(all_results),
        }


@dataclass
class HttpTransport:
    """Live-API transport: GET ``base_url?<params>`` and parse the JSON
    body (reference behavior: monarch_etl/gbif_client.py:29-49 — a
    requests.get with params, User-Agent, timeout; errors surface as
    exceptions for :func:`fetch_page_with_retry` to back off on).

    ``opener`` is injectable for tests: a ``(url, timeout) -> bytes``
    callable replacing ``urllib.request.urlopen`` so recorded fixture
    bodies can be served without any network. Left as ``None`` (the
    default, picklable — workers can rebuild the transport from string
    options), real urlopen is used.
    """

    base_url: str
    timeout: float = 30.0
    user_agent: str = "animaltrackingetls-spark/0.1"
    opener: Callable[[str, float], bytes] | None = None

    def fetch(self, params: dict) -> dict:
        from urllib.parse import urlencode

        qs = urlencode(sorted(params.items()))
        url = f"{self.base_url}?{qs}" if qs else self.base_url
        if self.opener is not None:
            raw = self.opener(url, self.timeout)
        else:  # pragma: no cover - exercised only against a live API
            from urllib.request import Request, urlopen

            req = Request(url, headers={"User-Agent": self.user_agent})
            with urlopen(req, timeout=self.timeout) as resp:
                raw = resp.read()
        return json.loads(raw)


def transport_from_options(options: dict):
    """Build a transport from string options (the only thing that crosses
    the driver→worker boundary for a custom DataSource).

    ``transport=fixture`` needs ``fixture_dir``; ``transport=http`` needs
    ``base_url`` (plus optional ``timeout``/``user_agent``). With no
    explicit ``transport``, ``fixture_dir`` implies fixture and
    ``base_url`` implies http — ambiguity or absence raises.
    """
    kind = options.get("transport")
    if kind is None:
        has_fixture, has_http = "fixture_dir" in options, "base_url" in options
        if has_fixture == has_http:
            raise ValueError(
                "paged_rest needs 'fixture_dir' (fixture transport) or "
                "'base_url' (http transport) — exactly one, or an explicit "
                "'transport' option"
            )
        kind = "fixture" if has_fixture else "http"
    if kind == "fixture":
        if not options.get("fixture_dir"):
            raise ValueError("transport=fixture requires option 'fixture_dir'")
        return FixtureTransport(options["fixture_dir"])
    if kind == "http":
        if not options.get("base_url"):
            raise ValueError("transport=http requires option 'base_url'")
        return HttpTransport(
            options["base_url"],
            timeout=float(options.get("timeout", 30.0)),
            user_agent=options.get("user_agent", HttpTransport.user_agent),
        )
    raise ValueError(f"unknown paged_rest transport {kind!r}")


def fetch_page_with_retry(
    fetch: Callable[[dict], dict],
    params: dict,
    attempts: int = DEFAULT_RETRY_ATTEMPTS,
    backoff_base: float = DEFAULT_BACKOFF_BASE,
    backoff_cap: float = DEFAULT_BACKOFF_CAP,
    sleep: Callable[[float], None] = time.sleep,
) -> dict:
    """S2: single-page fetch under the reference's retry policy —
    ``attempts`` tries, exponential backoff ``base^n`` capped at
    ``backoff_cap`` seconds (retry_config.py:28-37).

    Only TRANSIENT failures retry (the policy's own contract): an HTTP
    4xx other than 429, or a parse error on the body (``ValueError`` /
    ``JSONDecodeError`` — the server answered, the answer is just not a
    page), cannot succeed on retry and would otherwise burn the full
    backoff budget PER PARTITION on a misconfigured URL."""
    if attempts < 1:
        # Without this, zero iterations would reach `raise last_err` with
        # last_err still None — a baffling TypeError instead of the real
        # problem.
        raise ValueError(f"attempts must be >= 1 (got {attempts})")

    def _is_transient(err: Exception) -> bool:
        code = getattr(err, "code", None)  # urllib HTTPError
        if code is not None:
            return int(code) >= 500 or int(code) == 429
        if isinstance(err, ValueError):  # includes JSONDecodeError
            return False
        return True  # timeouts, connection resets, URLError, ...

    last_err: Exception | None = None
    for attempt in range(attempts):
        try:
            return fetch(params)
        except Exception as err:
            last_err = err
            if not _is_transient(err):
                raise
            if attempt < attempts - 1:
                sleep(min(backoff_cap, backoff_base ** (attempt + 1)))
    raise last_err  # type: ignore[misc]


# ---------------------------------------------------------------------------
# Driver-loop scan (sequential, reference-exact semantics)
# ---------------------------------------------------------------------------


def fetch_all_pages(
    transport,
    params: dict | None = None,
    limit_per_request: int = DEFAULT_PAGE_SIZE,
    max_pages: int | None = DEFAULT_MAX_PAGES,
    records_limitation: int | None = None,
    delay_seconds: float = 0.0,
    sleep: Callable[[float], None] = time.sleep,
) -> list[dict]:
    """S1: sequential paginated scan with the reference's exact loop:
    offset advances by ``len(records)``; stop on ``endOfRecords``, empty
    page, or the L2 page cap; L1 slices each page to
    ``records_limitation``; optional politeness delay between pages."""
    all_records: list[dict] = []
    offset = 0
    page_count = 0
    while True:
        if max_pages is not None and page_count >= max_pages:
            break
        page_params = dict(params or {})
        page_params["limit"] = limit_per_request
        page_params["offset"] = offset
        page = fetch_page_with_retry(transport.fetch, page_params)
        records = page.get("results", [])
        if not records:
            break
        offset += len(records)
        page_count += 1
        if records_limitation is not None:
            records = records[: int(records_limitation)]
        all_records.extend(records)
        if page.get("endOfRecords", False):
            break
        if delay_seconds:
            sleep(delay_seconds)
    return all_records


def fetch_all_pages_cursor(
    transport,
    params: dict | None = None,
    limit_per_request: int = DEFAULT_PAGE_SIZE,
    max_pages: int | None = DEFAULT_MAX_PAGES,
    records_limitation: int | None = None,
    delay_seconds: float = 0.0,
    sleep: Callable[[float], None] = time.sleep,
    cursor_param: str = "cursor",
    next_cursor_key: str = "next_cursor",
) -> list[dict]:
    """S1 variant: cursor-token pagination — the other common REST
    contract (the server hands back an opaque ``next_cursor``; the
    client echoes it; no offsets exist). Same page cap / record slice /
    politeness / retry knobs as the offset loop.

    Cursor scans are INHERENTLY sequential — page N+1's address exists
    only inside page N's response — so there is no partition-per-page
    parallel form (that's why ``PagedRestDataSource`` keeps the offset
    style). At scale a cursor feed is the single-writer ingest edge:
    land pages to files, and parallelism starts at the landed data.
    Defensive stop: a server that re-serves the same cursor would loop
    forever; repeating a cursor terminates the scan.
    """
    all_records: list[dict] = []
    cursor = None
    seen_cursors: set = set()
    page_count = 0
    while True:
        if max_pages is not None and page_count >= max_pages:
            break
        page_params = dict(params or {})
        page_params["limit"] = limit_per_request
        if cursor is not None:
            page_params[cursor_param] = cursor
        page = fetch_page_with_retry(transport.fetch, page_params)
        records = page.get("results", [])
        if not records:
            break
        page_count += 1
        if records_limitation is not None:
            records = records[: int(records_limitation)]
        all_records.extend(records)
        cursor = page.get(next_cursor_key)
        if not cursor or cursor in seen_cursors:
            break
        seen_cursors.add(cursor)
        if delay_seconds:
            sleep(delay_seconds)
    return all_records


# ---------------------------------------------------------------------------
# Custom DataSource: partition-per-page
# ---------------------------------------------------------------------------


@dataclass
class _PagePartition(InputPartition):
    page_index: int


class _PagedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._options = dict(options)
        self._pushed_params: dict[str, str] = {}

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """F6: accept EqualTo on pushable attributes as API params; yield
        back everything else for Spark to evaluate post-scan."""
        for flt in filters:
            if (
                isinstance(flt, EqualTo)
                and len(flt.attribute) == 1
                and flt.attribute[0] in PUSHABLE_ATTRIBUTES
            ):
                self._pushed_params[flt.attribute[0]] = str(flt.value)
            else:
                yield flt

    def partitions(self) -> Sequence[InputPartition]:
        max_pages = int(self._options.get("max_pages", DEFAULT_MAX_PAGES))
        return [_PagePartition(i) for i in range(max_pages)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        limit = int(self._options.get("limit_per_request", DEFAULT_PAGE_SIZE))
        records_limitation = self._options.get("records_limitation")
        delay = float(self._options.get("delay_seconds", 0.0))
        transport = transport_from_options(self._options)
        if delay:
            # staggered politeness, bounded: offset task STARTS within a
            # wave of ~slots concurrent fetches. delay * absolute index
            # would add O(max_pages * delay) dead wall-clock for pages
            # scheduled long after the first wave anyway.
            slots = 32
            time.sleep(delay * (partition.page_index % slots))
        params: dict = {
            "limit": limit,
            "offset": partition.page_index * limit,
            **self._pushed_params,
        }
        page = fetch_page_with_retry(transport.fetch, params)
        records = page.get("results", [])
        if records_limitation is not None:
            records = records[: int(records_limitation)]  # L1 slice per page
        field_names = [f.name for f in self._schema.fields]
        for rec in records:
            yield tuple(rec.get(name) for name in field_names)


class PagedRestDataSource(DataSource):
    """``spark.read.format("paged_rest")`` — register with
    ``spark.dataSource.register(PagedRestDataSource)``.

    Options: ``transport`` (``fixture``/``http``, inferable),
    ``fixture_dir`` (fixture page store) or ``base_url`` (+ ``timeout``,
    ``user_agent``) for live HTTP, ``schema_ddl`` (row schema),
    ``limit_per_request``, ``max_pages``, ``records_limitation``,
    ``delay_seconds``. Equality filters on year/month/day/taxonKey/
    country/basisOfRecord are pushed into the page request (observable:
    the fixture transport filters server-side).
    """

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self):
        return self.options.get(
            "schema_ddl",
            "gbifID string, eventDate string, decimalLatitude double, "
            "decimalLongitude double, individualCount bigint, year int, "
            "month int, day int, country string, basisOfRecord string",
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _PagedRestReader(schema, self.options)

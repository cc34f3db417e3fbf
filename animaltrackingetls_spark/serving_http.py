"""HTTP serving shell over the serving-layer queries.

The reference exposes its date-filtered sightings query as a Flask
endpoint (butterflyetl.py:53-116: parse year/month/day request args →
filter → JSON records response). This is the same surface on the
stdlib's threading HTTP server — no web framework ships in this
environment, and the engine only needs a thin edge: every request
composes `serving.dynamic_filters` onto a DataFrame the caller provides
and collects through the capped `serving.to_json_records` edge.

Spark posture: the server holds a zero-argument DataFrame *provider*
(not a materialized result), so each request plans a fresh filtered
query and Catalyst pushes the request's predicates into the scan. Spark
sessions are thread-safe for concurrent actions; ThreadingHTTPServer
handlers may overlap freely.

Routes:
  GET /health                  → {"status": "ok"}
  GET /sightings?year=&month=&day=&limit=&<col>=<val>
                               → JSON array of records (capped)
"""

from __future__ import annotations

import json
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit

from pyspark.sql import DataFrame

from .serving import dynamic_filters, to_json_records

DEFAULT_LIMIT = 1_000
MAX_LIMIT = 10_000
_RESERVED_PARAMS = {"year", "month", "day", "limit"}


def plan_for_params(df: DataFrame, params: dict[str, str]) -> DataFrame:
    """Request params → filtered (uncollected) frame: year/month/day go
    through F4 dynamic filters, any other parameter becomes an extra
    equality filter on a same-named column. Split from
    :func:`handle_sightings` so the PLAN is testable: against a parquet
    provider the request predicates must reach the scan as
    PushedFilters (asserted in test_serving_http.py) — the whole point
    of holding a provider instead of a materialized frame."""
    extra = {k: v for k, v in params.items() if k not in _RESERVED_PARAMS}
    unknown = [k for k in extra if k not in df.columns]
    if unknown:
        # a typo'd filter must be a 400, not a silent full-table answer
        # masquerading as a filtered one
        raise ValueError(f"unknown filter column(s): {unknown}")
    return dynamic_filters(
        df,
        year=params.get("year"),
        month=params.get("month"),
        day=params.get("day"),
        extra=extra,
    )


def handle_sightings(
    df: DataFrame, params: dict[str, str], max_limit: int = MAX_LIMIT
) -> list[dict]:
    """Pure request → records function (testable without sockets):
    :func:`plan_for_params` + the capped ``serving.to_json_records``
    edge (limit ≤ ``max_limit``, so a crafted request cannot pull a
    table through the driver)."""
    limit = min(int(params.get("limit", DEFAULT_LIMIT)), max_limit)
    if limit < 0:
        raise ValueError(f"limit must be >= 0, got {limit}")
    return to_json_records(plan_for_params(df, params), limit=limit)


def make_server(
    df_provider: Callable[[], DataFrame],
    host: str = "127.0.0.1",
    port: int = 0,
) -> ThreadingHTTPServer:
    """Build (not start) the serving shell; ``port=0`` binds an ephemeral
    port (read it back from ``server.server_address``). Run with
    ``server.serve_forever()`` — typically on a daemon thread next to the
    driver — and stop with ``server.shutdown()``."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self) -> None:  # noqa: N802 (stdlib API name)
            split = urlsplit(self.path)
            if split.path == "/health":
                self._reply(200, {"status": "ok"})
                return
            if split.path != "/sightings":
                self._reply(404, {"error": f"no route {split.path}"})
                return
            try:
                records = handle_sightings(
                    df_provider(),
                    dict(parse_qsl(split.query, keep_blank_values=True)),
                )
            except ValueError as err:  # bad int() / unknown column / limit
                self._reply(400, {"error": str(err)})
                return
            except Exception as err:  # noqa: BLE001 — a handler thread
                # must ANSWER (500), never die with a connection reset:
                # Spark analysis errors are request errors here, not
                # server-fatal conditions
                self._reply(500, {"error": f"{type(err).__name__}: {err}"})
                return
            self._reply(200, records)

        def _reply(self, status: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt: str, *args) -> None:  # quiet test runs
            pass

    return ThreadingHTTPServer((host, port), Handler)

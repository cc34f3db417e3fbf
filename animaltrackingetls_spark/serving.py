"""Serving-layer surface: dynamic filters, date match, JSON edge sink.

Reference semantics (studied, not ported):
* F4 — conditional equality filters on year/month/day, each applied only
  when the request supplies the parameter (butterflyetl.py:83-108). The
  reference fetches the whole table then filters in pandas and comments
  that a WHERE clause would be better (butterflyetl.py:69-74) — here the
  filters compose onto the DataFrame *before* the action, so Catalyst
  pushes them into the scan (parquet row-group skip / JDBC WHERE) by
  construction.
* F5 — row-wise date match on a raw timestamp column
  (usamonarchbutterflies.py:97-167): parse then compare components.
* F7 — empty-input short-circuit guards (etl.py:56-58, 69-71).
* K6 — JSON records response (butterflyetl.py:110-112): collect at the
  serving edge only, always bounded by an explicit row cap.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dynamic_filters(
    df: DataFrame,
    year: int | str | None = None,
    month: int | str | None = None,
    day: int | str | None = None,
    extra: dict[str, object] | None = None,
) -> DataFrame:
    """F4: apply equality filters for exactly the supplied parameters.

    Missing columns are ignored (the reference guards on column dtype the
    same way). Values arrive as request strings; cast to int like the
    reference's ``int(req_year)``.
    """
    for col_name, val in [("year", year), ("month", month), ("day", day)]:
        if val is not None and col_name in df.columns:
            df = df.filter(F.col(col_name) == int(val))
    for col_name, val in (extra or {}).items():
        if val is not None and col_name in df.columns:
            df = df.filter(F.col(col_name) == F.lit(val))
    return df


def filter_for_date(
    df: DataFrame,
    ts_col: str,
    year: int | None = None,
    month: int | None = None,
    day: int | None = None,
) -> DataFrame:
    """F5: component-wise date match against a timestamp column.

    The reference parses each record then string-compares Y/M/D
    (usamonarchbutterflies.py:146-153); the Spark form compares the
    extracted components, and rows with an unparseable/NULL timestamp are
    skipped — same semantics as the reference's try/except-continue.
    """
    ts = F.col(ts_col)
    pred = ts.isNotNull()
    if year is not None:
        pred = pred & (F.year(ts) == year)
    if month is not None:
        pred = pred & (F.month(ts) == month)
    if day is not None:
        pred = pred & (F.dayofmonth(ts) == day)
    return df.filter(pred)


def is_empty(df: DataFrame) -> bool:
    """F7: empty-input short-circuit predicate. ``isEmpty`` looks at one
    partition's first row — O(1)-ish, no full count."""
    return df.isEmpty()


def to_json_records(df: DataFrame, limit: int = 10_000) -> list[dict]:
    """K6: records-orient JSON at the serving edge.

    This is the ONE place a collect is legitimate — the result of an
    already-filtered serving query, capped by ``limit`` so an unfiltered
    request cannot pull a whole table through the driver.
    """
    rows = df.limit(limit).toJSON().collect()
    return [json.loads(r) for r in rows]

"""Property tests: the cleaning kernel vs the reference's actual engine.

The reference cleans with pandas (``_fix`` string repair →
``pd.to_datetime(errors='coerce', format='mixed', utc=True)`` →
``pd.to_numeric(...).fillna(1).astype(int)``). These tests run a faithful
re-statement of that semantic in pandas (not copied code — the behavior
per SURVEY.md §2.9 C1/C2/C4) against our Spark expressions over a
hypothesis-generated corpus of realistic-and-messy inputs, proving
row-level parity rather than example-level parity.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from animaltrackingetls_spark.functions.coercion import count_with_default
from animaltrackingetls_spark.functions.datetime_expr import parse_event_timestamp

# -- reference-semantic oracles (behavioral re-statement, not a port) --------


def _ref_fix(val):
    """C1 semantics: range split, year pad, year-month pad, null-ish kept."""
    if val is None:
        return None
    s = str(val).strip()
    if s.lower() in ("", "nan", "nat", "none", "null"):
        return None
    if "/" in s:
        s = s.split("/")[0].strip()
    if len(s) == 4 and s.isdigit():
        return f"{s}-01-01"
    if len(s) == 7 and s[4] == "-":
        return f"{s}-01"
    return s


def _ref_parse(vals):
    """C2 semantics: permissive parse, coerce to NaT, normalize to UTC."""
    fixed = [_ref_fix(v) for v in vals]
    out = pd.to_datetime(pd.Series(fixed), errors="coerce", format="mixed", utc=True)
    return [None if pd.isna(t) else t.tz_localize(None).to_pydatetime() for t in out]


# -- input grammar: the ISO family + the reference's messy cases -------------

_year = st.integers(1990, 2030)
_month = st.integers(1, 12)
_day = st.integers(1, 28)


@st.composite
def _date_strings(draw):
    y, m, d = draw(_year), draw(_month), draw(_day)
    form = draw(st.integers(0, 9))
    if form == 0:
        return f"{y}"
    if form == 1:
        return f"{y}-{m:02d}"
    if form == 2:
        return f"{y}/{y + 1}"
    if form == 3:
        return f"{y}-{m:02d}-{d:02d}"
    if form == 4:
        return f"{y}-{m:02d}-{d:02d}T{draw(st.integers(0, 23)):02d}:{draw(st.integers(0, 59)):02d}:{draw(st.integers(0, 59)):02d}"
    if form == 5:
        return f"{y}-{m:02d}-{d:02d} {draw(st.integers(0, 23)):02d}:{draw(st.integers(0, 59)):02d}"
    if form == 6:
        return draw(st.sampled_from(["", "nan", "NaT", "None", "garbage", "12 monkeys"]))
    if form == 7:
        return f"  {y}-{m:02d}-{d:02d}  "
    if form == 8:
        return None
    return f"{y}-{m}-{d}"  # narrow month/day


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_date_strings(), min_size=1, max_size=60))
def test_parse_matches_pandas_mixed(spark, vals):
    expected = _ref_parse(vals)
    df = spark.createDataFrame([(v,) for v in vals], "d string")
    got = [
        r.p
        for r in df.select(parse_event_timestamp(F.col("d")).alias("p"))
        .toPandas()
        .itertuples()
    ]
    got = [None if pd.isna(p) else p.to_pydatetime() for p in pd.Series(got)]
    assert got == expected


@st.composite
def _countish(draw):
    form = draw(st.integers(0, 5))
    if form == 0:
        return draw(st.integers(-100, 100))
    if form == 1:
        return float(draw(st.integers(-1000, 1000))) / 10.0
    if form == 2:
        return draw(st.sampled_from(["3", " 7 ", "2.5", "1e2", "-4"]))
    if form == 3:
        return draw(st.sampled_from(["", "abc", "NaN"]))
    if form == 4:
        return None
    return float(draw(st.integers(0, 50)))


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_countish(), min_size=1, max_size=60))
def test_count_default_matches_pandas_to_numeric(spark, vals):
    # reference semantics: to_numeric(errors='coerce').fillna(1).astype(int)
    expected = [
        int(x) if not pd.isna(x) else 1
        for x in pd.to_numeric(pd.Series(vals, dtype="object"), errors="coerce")
    ]
    df = spark.createDataFrame([(str(v) if v is not None else None,) for v in vals], "c string")
    got = [r.v for r in df.select(count_with_default(F.col("c")).alias("v")).collect()]
    assert got == expected

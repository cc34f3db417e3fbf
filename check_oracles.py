"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry through Spark AND its ``oracle_sql()``
twin through DuckDB at sf0.01 (or a given sf dir), then compares
row count, column-name-sorted schema, and order-insensitive values.

Usage: python check_oracles.py [query_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

import __spark_entry__ as entry
from animaltrackingetls_spark.io import TABLES
from animaltrackingetls_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # DRIVER-PARITY PROBE (r10): the driver sorts RAW column values —
    # no object stringify — and r9's one red row was a frame every
    # local gate passed because _canon stringified the unsortable
    # array column first. Probe the raw sort so the local gate fails
    # exactly where the driver would.
    try:
        df.sort_values(by=list(df.columns), kind="mergesort")
    except TypeError as err:
        raise TypeError(
            f"driver-canonicalizer hazard: raw sort_values failed ({err}) "
            "— a column holds values the driver cannot sort (arrays/maps/"
            "structs?); project them to scalars in query AND oracle"
        ) from err
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif str(df[c].dtype) in ("float64", "float32"):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                pass
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(names: list[str] | None = None) -> int:
    spark = get_spark(
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    targets = names or list(qs)
    n_pass = n_fail = n_rows_only = 0
    for name in targets:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as err:
            print(f"FAIL {name}: spark error: {str(err).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as err:
            print(f"FAIL {name}: oracle error: {str(err).splitlines()[0][:200]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            a, b = _canon(sdf), _canon(odf)
            if not a.equals(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if diff[c].any()]
                ex = ""
                if bad_cols:
                    c0 = bad_cols[0]
                    i = diff[c0].idxmax()
                    ex = f" e.g. {c0}[{i}]: {a[c0][i]!r} != {b[c0][i]!r}"
                problems.append(f"values differ in {bad_cols}{ex}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))

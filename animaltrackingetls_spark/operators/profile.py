"""Column profiling — the data-quality audit a pipeline runs before it
trusts a table (null rates, cardinalities, value ranges per column).

The reference audits its tables ad hoc (full-table duplicate scan,
catch_duplicates_script.py:55-67; per-load record counts into the
inventory, inventory.py:28-66); this operator is the systematic form.

Plan shape: ONE aggregation pass over the scan computes every
column's statistics as parallel aggregate expressions (count / count
distinct / min / max are all partial-aggregatable, so map-side combine
reduces each partition to one row before the single-row final
aggregate); the per-column unpivot then happens on that one row —
driver-trivial. The exact ``countDistinct`` over k columns plans as an
Expand (k rows per input row) feeding one shuffle; at 100 TB switch
``exact_distinct=False`` for ``approx_count_distinct`` (HLL sketches,
no Expand, mergeable map-side) — same output shape, estimated
cardinalities (and no DuckDB oracle, since the sketch isn't portable).

Values are surfaced as strings so one result schema covers all column
types; doubles are NOT formatting-stable across engines (Java
scientific notation differs from C printf), so profile numeric columns
as ints/decimals or accept engine-local min/max rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_null, n_distinct,
    min_value, max_value)`` — one output row per profiled column.
    NULLs are excluded from n_distinct/min/max (SQL aggregate
    semantics); min/max are rendered as strings.
    """
    cols = columns if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")

    distinct_of = (
        F.countDistinct if exact_distinct else F.approx_count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"_nn_{c}"),
            distinct_of(col).alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_mn_{c}"),
            F.max(col).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)

    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"_nn_{c}")).alias("n_null"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_mn_{c}").alias("min_value"),
            F.col(f"_mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def _quote_ident(name: str) -> str:
    """Double-quote an SQL identifier (DuckDB/ANSI escaping) so names
    with spaces, quotes, or reserved words round-trip."""
    return '"' + name.replace('"', '""') + '"'


def _quote_literal(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def profile_oracle_sql(table: str, columns: list[str]) -> str:
    """DuckDB twin of :func:`profile_columns` (exact mode): one UNION ALL
    branch per column, same aggregate semantics and string rendering.
    Identifiers are quoted so any valid Spark column name is
    expressible."""
    branches = []
    t = _quote_ident(table)
    for c in columns:
        qc = _quote_ident(c)
        branches.append(
            f"""
            SELECT {_quote_literal(c)} AS col_name,
                   count(*) AS n_rows,
                   count(*) - count({qc}) AS n_null,
                   count(DISTINCT {qc}) AS n_distinct,
                   CAST(min({qc}) AS VARCHAR) AS min_value,
                   CAST(max({qc}) AS VARCHAR) AS max_value
            FROM {t}
            """
        )
    return " UNION ALL ".join(branches)

"""Canonical occurrence schema + schema alignment.

Parity target: the reference enumerates a fixed 35-column output schema
(monarch_etl/config.py:89-98 FINAL_COLUMNS; dtypes config.py:46-84 and
monarch_etl/schema.py:46-85) and enforces it just before load by adding
missing columns as NULL and reordering (monarch_etl/schema.py:28-37).

Spark posture: one StructType, dynamic-in / fixed-out. ``align_to_schema``
is a pure projection (``select``) — Catalyst folds it into the scan, so at
100 TB it costs nothing beyond column pruning, which it *enables*.

Note ``class`` and ``order`` are reserved-word column names on purpose —
they exist in the GBIF taxonomy and stress identifier quoting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical output order (reference FINAL_COLUMNS, config.py:89-98).
FINAL_COLUMNS: list[str] = [
    "gbifID", "datasetKey", "publishingOrgKey", "eventDate", "eventDateParsed",
    "year", "month", "day", "day_of_week", "week_of_year", "date_only",
    "scientificName", "vernacularName", "taxonKey", "kingdom", "phylum",
    "class", "order", "family", "genus", "species", "decimalLatitude",
    "decimalLongitude", "coordinateUncertaintyInMeters", "countryCode",
    "stateProvince", "individualCount", "basisOfRecord", "recordedBy",
    "occurrenceID", "collectionCode", "catalogNumber", "county", "cityOrTown",
    "time_only",
]

_STRING_COLS = {
    "gbifID", "datasetKey", "publishingOrgKey", "eventDate", "scientificName",
    "vernacularName", "kingdom", "phylum", "class", "order", "family",
    "genus", "species", "countryCode", "stateProvince", "basisOfRecord",
    "recordedBy", "occurrenceID", "collectionCode", "catalogNumber",
    "county", "cityOrTown", "time_only",
}

_TYPE_FOR: dict[str, T.DataType] = {
    **{c: T.StringType() for c in _STRING_COLS},
    "eventDateParsed": T.TimestampType(),       # UTC (session TZ pinned)
    "taxonKey": T.LongType(),
    "individualCount": T.LongType(),
    "week_of_year": T.LongType(),
    "year": T.IntegerType(),
    "month": T.IntegerType(),
    "day": T.IntegerType(),
    "day_of_week": T.IntegerType(),             # pandas convention: Mon=0
    "decimalLatitude": T.DoubleType(),
    "decimalLongitude": T.DoubleType(),
    "coordinateUncertaintyInMeters": T.DoubleType(),
    "date_only": T.DateType(),
}

OCCURRENCE_SCHEMA = T.StructType(
    [T.StructField(c, _TYPE_FOR[c], nullable=True) for c in FINAL_COLUMNS]
)

# Reject-sidecar columns (reference cleaning.py:62-69 tags dropped rows
# with reason + detail before appending to the rejection accumulator).
FAILURE_REASON = "_failure_reason"
FAILURE_DETAIL = "_failure_detail"


def align_to_schema(df: DataFrame, schema: T.StructType = OCCURRENCE_SCHEMA) -> DataFrame:
    """Project ``df`` onto ``schema``: missing columns become typed NULLs,
    present columns are cast, order is canonical (≡ schema.py:28-37
    ``enforce_schema`` in the reference).
    """
    present = set(df.columns)
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in present
         else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)

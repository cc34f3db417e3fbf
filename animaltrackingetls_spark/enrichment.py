"""Geocode enrichment: broadcast lookup join + batched-service variant.

Reference semantics (studied, not ported):
* J1 — per-row reverse-geocode HTTP lookup, failures leave NULLs
  (monarch_etl/enrichment.py:28-61, geocode_client.py:27-76). Here the
  deterministic form is a **broadcast left join** against a geocode
  dimension keyed on rounded (lat, lon) cells: the dimension is tiny
  relative to the fact side, so Catalyst's BroadcastHashJoin runs it with
  zero shuffle of the 100 TB fact table.
* J2 — batched enrichment with index map-back
  (monarch_etl_gemini_ai.py:315-375, BATCH_SIZE=14 chunks): an Arrow
  batch IS the chunk, so `mapInPandas` reproduces the batching pattern
  with the service call swapped in per batch; per-row failures leave the
  row NULL, never fail the job.
* F3 — eligibility predicate lat/lon NOT NULL (enrichment.py:40).
* C11 — geocode response JSON `features[0].properties.{county, city}`
  extraction (geocode_client.py:83-96) as a native `from_json` +
  `element_at` expression — no Python in the parse path.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of a GeoJSON-ish reverse-geocode response (the fields the
# reference extracts; everything else is ignored by from_json).
GEOCODE_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "properties",
                            T.StructType(
                                [
                                    T.StructField("county", T.StringType()),
                                    T.StructField("city", T.StringType()),
                                ]
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def geocode_eligible(lat: Column, lon: Column) -> Column:
    """F3: rows eligible for enrichment — both coordinates present."""
    return lat.isNotNull() & lon.isNotNull()


def parse_geocode_response(c: Column) -> Column:
    """C11: extract (county, city) from a raw JSON response string.

    Returns a struct<county string, city string>; an empty/missing
    features array yields NULLs — the reference's no-features branch
    (geocode_client.py:92-96).
    """
    parsed = F.from_json(c, GEOCODE_RESPONSE_SCHEMA)
    # try_element_at: empty features → NULL (ANSI element_at would throw).
    props = F.try_element_at(parsed.getField("features"), F.lit(1)).getField("properties")
    return F.struct(
        props.getField("county").alias("county"),
        props.getField("city").alias("city"),
    )


def cell_key(lat: Column, lon: Column, precision: int = 0) -> tuple[Column, Column]:
    """Rounded (lat, lon) cell key used to join facts to the geocode dim.

    precision=0 → 1-degree cells; the dimension cardinality is bounded by
    360*180*10^(2*precision), independent of fact-table size.
    """
    return (
        F.round(lat, precision).alias("cell_lat"),
        F.round(lon, precision).alias("cell_lon"),
    )


def geocode_broadcast_join(
    df: DataFrame,
    dim: DataFrame,
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    precision: int = 0,
) -> DataFrame:
    """J1 (deterministic form): broadcast left join against a geocode
    dimension keyed on (cell_lat, cell_lon) with columns
    (county, cityOrTown). Ineligible rows (F3) keep NULLs — left-outer
    semantics match the reference's failure behavior.
    """
    lat, lon = F.col(lat_col), F.col(lon_col)
    clat, clon = cell_key(lat, lon, precision)
    keyed = df.withColumns({"cell_lat": clat, "cell_lon": clon})
    out = keyed.join(F.broadcast(dim), ["cell_lat", "cell_lon"], "left")
    return out.drop("cell_lat", "cell_lon")


def enrich_batched(
    df: DataFrame,
    service: Callable[[list[tuple[float, float]]], list[tuple[str | None, str | None]]],
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
) -> DataFrame:
    """J2: batched service enrichment via mapInPandas.

    Each Arrow batch plays the role of the reference's BATCH_SIZE chunk:
    the payload is built from the batch, the service is called once per
    batch, and results map back by position (the reference's
    original_index map-back collapses to positional alignment because the
    batch never leaves the worker). A failing service call leaves the
    whole batch NULL rather than failing the job.

    ``service`` takes [(lat, lon), ...] → [(county, city), ...]; swap in
    an HTTP client in production, a deterministic stub in tests. A
    response whose length doesn't match the payload is treated as a
    failed call (whole batch NULL) — positional map-back with a shifted
    list would silently attach results to the WRONG rows, which is worse
    than no enrichment.

    Frames that already carry county/cityOrTown (the aligned 35-column
    schema adds them as NULLs) are enriched IN PLACE — the output schema
    must not grow duplicate fields. Pre-existing non-null values are
    PRESERVED for rows the service can't improve (ineligible rows and
    rows in a failed batch); only successful lookups overwrite. The two
    in-place columns must be string-typed — anything else is rejected up
    front rather than failing deep inside Arrow conversion.
    """
    existing = set(df.columns)
    for name in ("county", "cityOrTown"):
        if name in existing and not isinstance(df.schema[name].dataType, T.StringType):
            raise TypeError(
                f"enrich_batched enriches {name!r} in place and requires it to be "
                f"string-typed; got {df.schema[name].dataType.simpleString()}"
            )
    out_fields = list(df.schema.fields) + [
        T.StructField(name, T.StringType())
        for name in ("county", "cityOrTown")
        if name not in existing
    ]
    out_schema = T.StructType(out_fields)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            eligible = pdf[lat_col].notna() & pdf[lon_col].notna()
            # seed from pre-existing values so ineligible/failed rows keep
            # whatever enrichment they already carried
            counties = (
                list(pdf["county"]) if "county" in pdf.columns else [None] * len(pdf)
            )
            cities = (
                list(pdf["cityOrTown"])
                if "cityOrTown" in pdf.columns
                else [None] * len(pdf)
            )
            counties = [None if pd.isna(v) else v for v in counties]
            cities = [None if pd.isna(v) else v for v in cities]
            idx = [i for i, ok in enumerate(eligible) if ok]
            if idx:
                payload = [
                    (float(pdf[lat_col].iloc[i]), float(pdf[lon_col].iloc[i]))
                    for i in idx
                ]
                try:
                    results = service(payload)
                    if len(results) != len(payload):
                        # a shifted zip would enrich the WRONG rows
                        results = None
                except Exception:
                    results = None
                if results is not None:
                    for i, (county, city) in zip(idx, results):
                        counties[i] = county
                        cities[i] = city
            out = pdf.copy()
            out["county"] = pd.array(counties, dtype="object")
            out["cityOrTown"] = pd.array(cities, dtype="object")
            yield out

    return df.mapInPandas(run, out_schema)


def stub_geocode_service(
    payload: list[tuple[float, float]],
) -> list[tuple[str | None, str | None]]:
    """Deterministic offline stand-in for the reverse-geocode service:
    names the 1-degree cell. Real deployments swap in an HTTP client with
    retry/backoff (the reference's tenacity policy, retry_config.py)."""
    out = []
    for lat, lon in payload:
        clat, clon = int(lat // 1), int(lon // 1)
        out.append((f"county_{clat}_{clon}", f"city_{clat}_{clon}"))
    return out

"""End-to-end §3.1 lifecycle: REST fixture source → clean → enrich →
load → register → rejects, all through the public pipeline API."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.pipeline import occurrence_scan
from animaltrackingetls_spark.sources import PagedRestDataSource


@pytest.fixture(scope="module")
def raw_from_rest(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pipeline_pages")
    recs = [
        {"gbifID": "1", "eventDate": "2024-06-01T10:00:00", "decimalLatitude": 40.2,
         "decimalLongitude": -74.3, "individualCount": 2, "basisOfRecord": "OBS"},
        {"gbifID": "2", "eventDate": "2024-06-02", "decimalLatitude": 40.7,
         "decimalLongitude": -74.1, "individualCount": None, "basisOfRecord": "OBS"},
        {"gbifID": "3", "eventDate": "garbage", "decimalLatitude": 40.0,
         "decimalLongitude": -74.0, "individualCount": 1, "basisOfRecord": "OBS"},
        {"gbifID": "4", "eventDate": "2024-06-01", "decimalLatitude": None,
         "decimalLongitude": -74.0, "individualCount": 1, "basisOfRecord": "OBS"},
    ]
    (d / "page_0.json").write_text(json.dumps({"results": recs, "endOfRecords": True}))
    spark.dataSource.register(PagedRestDataSource)
    return (
        spark.read.format("paged_rest")
        .option("fixture_dir", str(d))
        .option(
            "schema_ddl",
            "gbifID string, eventDate string, decimalLatitude double, "
            "decimalLongitude double, individualCount bigint, basisOfRecord string",
        )
        .load()
    )


def test_full_lifecycle(spark, raw_from_rest, tmp_path):
    out_dir = os.path.join(str(tmp_path), "occ")
    rej_dir = os.path.join(str(tmp_path), "rejects")
    inv_path = os.path.join(str(tmp_path), "inventory")
    dim = spark.createDataFrame(
        [(40.0, -74.0, "Mercer", "Trenton"), (41.0, -74.0, "Bergen", "Hackensack")],
        "cell_lat double, cell_lon double, county string, cityOrTown string",
    )
    res = occurrence_scan(
        spark, raw_from_rest,
        output_dir=out_dir, rejects_dir=rej_dir, inventory_path=inv_path,
        geocode_dim=dim, processed_at="run1",
    )

    # clean split: 2 good (1, 2), 2 rejected (3: bad date, 4: bad coords)
    good = {r.gbifID: r for r in res.good.collect()}
    assert set(good) == {"1", "2"}
    assert good["2"].individualCount == 1  # defaulted
    assert good["1"].county == "Mercer"    # enriched via broadcast dim
    assert good["2"].county == "Bergen"

    hist = {r["_failure_reason"]: r.n for r in res.reject_histogram.collect()}
    assert hist == {"unparseable_eventDate": 1, "invalid_coordinates": 1}

    # load: partitioned by date_only, both days present
    loaded = spark.read.parquet(out_dir)
    assert res.loaded_rows == 2
    assert {str(r.date_only) for r in loaded.collect()} == {"2024-06-01", "2024-06-02"}

    # register: one inventory row per day with month-name table names
    inv = {str(r.available_date): (r.table_name, r.record_count)
           for r in res.inventory.collect()}
    assert inv == {"2024-06-01": ("june012024", 1), "2024-06-02": ("june022024", 1)}

    # rejects sidecar on disk
    back = spark.read.option("header", True).csv(rej_dir)
    assert back.count() == 2


def test_rerun_is_idempotent(spark, raw_from_rest, tmp_path):
    out_dir = os.path.join(str(tmp_path), "occ")
    inv_path = os.path.join(str(tmp_path), "inventory")
    for run in ("run1", "run2"):
        res = occurrence_scan(
            spark, raw_from_rest, output_dir=out_dir,
            inventory_path=inv_path, processed_at=run,
        )
    # re-run overwrote, not duplicated — counts unchanged, batch2 wins
    assert res.loaded_rows == 2
    inv = {str(r.available_date): r.processed_at for r in res.inventory.collect()}
    assert set(inv.values()) == {"run2"}


def test_empty_input_short_circuits(spark):
    from animaltrackingetls_spark.schema import FINAL_COLUMNS

    empty = spark.createDataFrame(
        [], "gbifID string, eventDate string, decimalLatitude string, "
            "decimalLongitude string, individualCount string",
    )
    res = occurrence_scan(spark, empty)
    assert res.loaded_rows == 0 and res.inventory is None
    assert res.good.count() == 0 and res.rejected.count() == 0
    # schema contract holds on the empty path too
    assert res.good.columns == FINAL_COLUMNS
    assert res.reject_histogram.columns == ["_failure_reason", "n"]
    assert "_failure_reason" in res.rejected.columns


def test_loaded_rows_counts_this_run_only(spark, raw_from_rest, tmp_path):
    out_dir = os.path.join(str(tmp_path), "occ")
    first = occurrence_scan(spark, raw_from_rest, output_dir=out_dir)
    assert first.loaded_rows == 2
    # a second run into the same dir must not count surviving partitions twice
    day2 = raw_from_rest.filter(F.col("gbifID") == "1").withColumn(
        "eventDate", F.lit("2024-07-09")
    )
    second = occurrence_scan(spark, day2, output_dir=out_dir)
    assert second.loaded_rows == 1
    # and the physical dataset now holds both days' partitions
    assert spark.read.parquet(out_dir).count() == 3

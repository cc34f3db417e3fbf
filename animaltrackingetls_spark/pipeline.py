"""End-to-end occurrence pipeline — the reference's flagship lifecycle
(SURVEY.md §3.1, ``monarch_etl_day_scan``) as one lazy Spark DAG.

Reference stages → Spark form:
1.  extract   paginated REST scan → any occurrence-shaped DataFrame
              (the ``paged_rest`` source, a parquet landing dir, JDBC…)
2.  clean     rescue dates, parse, coerce coords/counts, split
              good/reject (cleaning.clean_occurrences — one tagged
              projection, two filters, zero shuffles)
3.  enrich    geocode broadcast join (deterministic) or batched service
4.  time_only + temporal derivation (inside the cleaning kernel)
5.  schema    canonical 35-column alignment (inside the cleaning kernel)
6.  rejects   CSV sidecar export (io.write_rejects_csv)
7.  load      partitioned parquet, dynamic overwrite per date_only —
              the scalable replacement for table-per-day
8.  register  inventory upsert keyed on available_date

Stages 2-5 are narrow transformations — Catalyst plans the whole thing
as a single scan with two output branches; the only shuffles are the
inventory count and the (tiny) broadcast build. The reference's
empty-input short-circuits (F7, etl.py:56-58) are preserved.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .cleaning import CleanResult, clean_occurrences, rejection_histogram
from .enrichment import geocode_broadcast_join
from .inventory import INVENTORY_COLUMNS, register_load, upsert_parquet
from .io import write_partitioned, write_rejects_csv
from .serving import is_empty


@dataclass
class PipelineResult:
    good: DataFrame
    rejected: DataFrame
    reject_histogram: DataFrame
    inventory: DataFrame | None
    loaded_rows: int


def occurrence_scan(
    spark: SparkSession,
    raw: DataFrame,
    output_dir: str | None = None,
    rejects_dir: str | None = None,
    inventory_path: str | None = None,
    geocode_dim: DataFrame | None = None,
    processed_at: str | None = None,
) -> PipelineResult:
    """Run the full §3.1 lifecycle over ``raw`` occurrence records.

    All sinks are optional so the same function serves tests (no writes),
    the day-scan job (all three sinks), and serving backfills. A
    multi-day input needs no loop — the partitioned write and the
    group-wise inventory registration handle any number of days in one
    pass (the reference's ``monarch_etl_multi_day_scan`` sequential loop
    collapses into this).
    """
    if is_empty(raw):  # F7: abort before planning any downstream work
        # Preserve the normal-path schema contract even for empty input:
        # good is canonical 35-column, rejected is raw+failure columns,
        # histogram is (reason, n) — so unionByName across days and
        # downstream selects never break on an empty day.
        from pyspark.sql import types as T

        from .schema import FAILURE_DETAIL, FAILURE_REASON, OCCURRENCE_SCHEMA

        empty_good = spark.createDataFrame([], OCCURRENCE_SCHEMA)
        rej_schema = T.StructType(
            list(raw.schema.fields)
            + [
                T.StructField(FAILURE_REASON, T.StringType()),
                T.StructField(FAILURE_DETAIL, T.StringType()),
            ]
        )
        empty_rej = spark.createDataFrame([], rej_schema)
        empty_hist = spark.createDataFrame(
            [], T.StructType([
                T.StructField(FAILURE_REASON, T.StringType()),
                T.StructField("n", T.LongType(), False),
            ])
        )
        return PipelineResult(empty_good, empty_rej, empty_hist, None, 0)

    # cache only when two or more sinks will each trigger an action over
    # the tagged frame; a single consumer (or the no-sink test path)
    # should keep the one-pass shared scan — and the cache is RELEASED
    # before returning, so looped day runs don't accrete a copy of the
    # whole input per invocation
    n_consumers = sum(
        x is not None for x in (output_dir, rejects_dir, inventory_path)
    )
    use_cache = n_consumers >= 2
    result: CleanResult = clean_occurrences(raw, cache=use_cache)
    good = result.good
    if geocode_dim is not None:
        enriched = geocode_broadcast_join(
            good.drop("county", "cityOrTown"), geocode_dim
        )
        good = enriched.select(*good.columns)

    if rejects_dir is not None and not is_empty(result.rejected):
        write_rejects_csv(result.rejected, rejects_dir)

    loaded_rows = 0
    if output_dir is not None:
        write_partitioned(good, output_dir, ["date_only"])
        # count THIS run's rows (cached tagged frame) — counting the
        # output dir would include surviving partitions from prior days
        loaded_rows = good.count()

    inventory = None
    if inventory_path is not None:
        # register_load against an empty inventory yields just this run's
        # update rows; upsert_parquet does the (single) merge with disk
        from .inventory import empty_inventory as _empty_inventory

        empty_inventory = _empty_inventory(spark)
        updates = register_load(empty_inventory, good, processed_at=processed_at)
        inventory = upsert_parquet(
            spark, inventory_path, updates.select(*INVENTORY_COLUMNS), ["available_date"]
        )

    if use_cache:
        result.tagged.unpersist()

    return PipelineResult(
        good=good,
        rejected=result.rejected,
        reject_histogram=rejection_histogram(result.rejected),
        inventory=inventory,
        loaded_rows=loaded_rows,
    )

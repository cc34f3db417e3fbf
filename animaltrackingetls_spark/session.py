"""SparkSession factory.

UTC session timezone is load-bearing: the reference normalizes every
parsed timestamp to UTC (monarch_etl/cleaning.py:177-182, ``utc=True``),
so all date/time derivations here must run under UTC to match.

AQE is on so runtime statistics re-plan shuffles (partition coalescing,
skew-join splitting, dynamic broadcast) — at 100 TB these matter far more
than any static tuning we could hard-code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "animaltrackingetls_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local mode for tests; on a real cluster the same conf applies minus
    ``master`` (spark-submit supplies it). ``shuffle_partitions`` defaults
    to core count locally; on a cluster, leave AQE to coalesce from a
    larger initial number.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Datetime parity with external engines (no Julian rebasing surprises)
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # pandas/pyarrow-written parquet often carries TIMESTAMP(NANOS),
        # which Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL). Read the
        # raw int64 instead; io.load_table casts ns → timestamp.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Let Python DataSources (sources/rest.py) receive pushFilters.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Source/sink helpers (SURVEY.md §2.1/§2.2).

Parquet is the canonical storage here; JDBC read/write mirror the
reference's S3/K1/K2 operators and are exercised only when a JDBC URL is
supplied (no database ships in the test environment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    """K1-analog: idempotent partitioned write. With
    ``partitionOverwriteMode=dynamic`` a day re-run replaces only its own
    partition — the Spark answer to the reference's drop-and-recreate
    table-per-day load (db_loader.py:23-59)."""
    (
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_rejects_csv(rejected: DataFrame, path: str) -> None:
    """K5: rejection sidecar as CSV (reference etl.py:64-67)."""
    rejected.write.mode("overwrite").option("header", True).csv(path)


def read_jdbc(spark: SparkSession, url: str, table: str, properties: dict | None = None) -> DataFrame:
    """S3: JDBC table scan — filters composed on top of this reader are
    pushed into the database by Catalyst (the optimization the reference
    notes it lacks, butterflyetl.py:69-74)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite", properties: dict | None = None) -> None:
    """K1/K2: JDBC overwrite/append load."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()

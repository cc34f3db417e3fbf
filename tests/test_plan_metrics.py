"""Measured physical metrics: shuffle/broadcast bytes as testable facts."""

from __future__ import annotations

from pyspark.sql import functions as F

from animaltrackingetls_spark.plans.metrics import execution_metrics


def test_map_side_combine_shrinks_shuffle(spark):
    """groupBy on a 100-value key over 1M rows: partial aggregation must
    make the exchange carry per-partition partials (~parts x keys rows),
    not the 1M input rows — the scale property that keeps wide aggs
    cheap, proven in bytes and records rather than plan text."""
    df = (
        spark.range(1_000_000)
        .groupBy((F.col("id") % 100).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()
    m = execution_metrics(df)
    assert m["shuffle_records_written"] > 0
    assert m["shuffle_records_written"] <= 100 * 64  # keys x max partitions
    assert m["shuffle_bytes_written"] < 1_000_000  # ≪ the ~8 MB of input ids


def test_broadcast_join_moves_dim_not_fact(spark):
    """Broadcast join: exchange bytes are the DIMENSION's, the fact side
    never shuffles."""
    fact = spark.range(200_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    j = fact.join(F.broadcast(dim), "k")
    # metrics live on THIS frame's QueryExecution: the action must run on
    # j itself (count() would build and execute a different plan)
    j.collect()
    m = execution_metrics(j)
    assert m["broadcast_bytes"] > 0
    assert not [
        e for e in m["exchanges"] if e["node"].startswith("ShuffleExchange")
    ]  # fact side never shuffles


def test_zero_shuffle_for_narrow_pipeline(spark):
    df = spark.range(100_000).select((F.col("id") * 2).alias("x")).filter(
        F.col("x") % 3 == 0
    )
    df.collect()
    m = execution_metrics(df)
    assert m["shuffle_records_written"] == 0  # narrow end to end

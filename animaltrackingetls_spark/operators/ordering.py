"""Global total-order indexing without a single-partition bottleneck.

The naive way to number rows globally — ``row_number().over(Window
.orderBy(...))`` with no partitionBy — funnels the ENTIRE dataset
through one task (Spark even warns); at 100 TB that is the job. The
scalable classic is two passes over a range-partitioned layout:

1. range-exchange on the order keys (each partition owns a contiguous
   key range, ascending with partition id), sort within partitions;
2. count rows per partition — a tiny driver-side list, one entry per
   partition — prefix-sum it into per-partition offsets;
3. global index = partition offset + position within the partition.

Everything stays JVM-side: partition ids come from
``spark_partition_id()`` (the physical partition index — reliable even
when a partition is oversized), within-partition positions from
``monotonically_increasing_id``'s low 33 bits (a 0-based consecutive
record number, valid because partition sizes are guard-checked first),
so no Python, no extra shuffle beyond the one range exchange, and the
offset attach is a broadcast of #partitions rows.

This is the same pattern RDD ``zipWithIndex`` uses internally, kept in
DataFrame land so column pruning and codegen survive, plus an explicit
ORDER: the index follows ``order_cols``, not arbitrary partition layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_POS_MASK = (1 << 33) - 1


def global_order_index(
    df: DataFrame,
    order_cols: list[str | Column],
    index_col: str = "global_idx",
    num_partitions: int | None = None,
    start: int = 0,
    stats: dict | None = None,
) -> DataFrame:
    """Append a dense 0-based (``start``-based) global index in
    ``order_cols`` order — the scalable replacement for an unpartitioned
    ``row_number()`` window.

    ``order_cols`` MUST be a total order (append a unique id as the last
    key): ties straddling a range boundary would otherwise make the
    index depend on the sampled boundaries. With a total order the
    result is fully deterministic — range boundaries only decide WHERE
    the work happens, never the index a row gets. Ordering is Spark's
    ascending default, which puts NULL keys FIRST — SQL engines default
    to NULLS LAST, so filter or coalesce NULL keys when an external
    oracle replays the order.

    Cost: one range exchange (sampled, so skewed key distributions still
    balance), a per-partition count job over the pinned layout, and a
    broadcast join of #partitions offset rows. The layout is pinned with
    ``localCheckpoint`` because positions are read in two separate jobs
    (counts, then index) and must see identical partitioning; on a real
    cluster prefer ``df.checkpoint()`` to a reliable store —
    ``localCheckpoint`` blocks die with their executor.

    Partition count sizing: ≤ 2^31 partitions and ≤ 2^33 rows per
    partition (the id layout's limits — enforced); pick
    ``num_partitions`` so each partition's sort fits executor memory.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if index_col in df.columns:
        raise ValueError(f"column {index_col!r} already exists")
    reserved = {"_mid", "_pid", "_pos", "_off"} & set(df.columns)
    if reserved:
        raise ValueError(f"columns {sorted(reserved)} are reserved here")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    part = df.repartitionByRange(*([num_partitions] if num_partitions else []), *cols)
    pinned = part.sortWithinPartitions(*cols).localCheckpoint(eager=True)

    # partition ids come from spark_partition_id() — the REAL physical
    # partition index — not from monotonically_increasing_id's upper
    # bits: an oversized partition spills its record counter INTO those
    # bits, aliasing neighbors, so sizes derived from them could never
    # catch the overflow they are supposed to guard against
    sizes = (
        pinned.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )  # one row per partition — driver-tiny by construction
    acc = start
    offsets = []
    for row in sorted(sizes, key=lambda r: r["_pid"]):
        if row["_n"] > _POS_MASK + 1:
            raise ValueError(
                f"partition {row['_pid']} holds {row['_n']} rows, over the "
                f"2^33 per-partition id limit; raise num_partitions"
            )
        offsets.append((row["_pid"], acc))
        acc += row["_n"]
    if stats is not None:
        stats["n_rows"] = acc - start
        stats["partition_sizes"] = [int(r["_n"]) for r in
                                    sorted(sizes, key=lambda r: r["_pid"])]
    if not offsets:
        return df.withColumn(index_col, F.lit(start).cast("long")).limit(0)

    off_df = pinned.sparkSession.createDataFrame(
        offsets, "_pid bigint, _off bigint"
    )
    # within-partition position from monotonically_increasing_id's low
    # 33 bits — safe ONLY because the size guard above already bounded
    # every partition; materialized into a column before derivation so
    # the nondeterministic expression is evaluated exactly once per row
    return (
        pinned.withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id().cast("long"))
        .withColumn("_pos", F.col("_mid").bitwiseAND(F.lit(_POS_MASK)))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(index_col, (F.col("_off") + F.col("_pos")).cast("long"))
        .drop("_mid", "_pid", "_pos", "_off")
    )


def export_ordered_shards(
    df: DataFrame,
    order_cols: list[str | Column],
    num_shards: int,
    path: str,
    index_col: str = "global_idx",
    shard_col: str = "shard",
) -> DataFrame:
    """Write ``df`` as ``num_shards`` CONTIGUOUS, near-equal parquet
    shards in ``order_cols`` order and return a manifest — the
    deterministic training-data export: readers stream shards in shard
    order, rows within a shard in ``index_col`` order, and the
    concatenation is exactly the global order (curriculum ordering,
    reproducible across engines and cluster sizes).

    Shard assignment is ``floor(global_idx · num_shards / n)`` — equal
    ±1 row counts by construction, unlike hash sharding (balanced only
    in expectation). The write range-partitions on (shard, index) and
    sorts within tasks the same way, so the writer's required ordering
    (the partition column) is ALREADY satisfied — no re-sort happens,
    and every parquet file's row order is the index order by
    construction, not by sort-stability luck. Reader contract: files
    within a shard directory concatenate in filename order (task order
    == range order); shards concatenate in shard order.

    Returns the manifest (one row per shard, driver-tiny):
    ``(shard, n_rows, min_idx, max_idx, xor64)`` where ``xor64`` is the
    order-independent xxhash64 XOR of the shard's index values — enough
    for a reader to verify it got every row of exactly its shard.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    gstats: dict = {}
    indexed = global_order_index(df, order_cols, index_col=index_col, stats=gstats)
    n = gstats["n_rows"]  # already measured by the index pass — no extra job
    if n == 0:
        raise ValueError("cannot export an empty dataset")
    # integer DIV, not float division: idx·k/n through a double loses
    # exactness past 2^53 — real at 1e12 rows × 1e4 shards — and a
    # boundary row misassigned by 1 ulp breaks shard contiguity
    shard = F.expr(f"CAST(({index_col} * {int(num_shards)}) DIV {n} AS INT)")
    out = indexed.withColumn(shard_col, shard)
    (
        out.repartitionByRange(num_shards, F.col(shard_col), F.col(index_col))
        .sortWithinPartitions(shard_col, index_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(path)
    )
    written = indexed.sparkSession.read.parquet(path)
    return (
        written.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(index_col).alias("min_idx"),
            F.max(index_col).alias("max_idx"),
            F.expr(f"bit_xor(xxhash64({index_col}))").alias("xor64"),
        )
        .orderBy(shard_col)
    )

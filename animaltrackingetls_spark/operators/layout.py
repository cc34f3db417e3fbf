"""Physical data layout: bucketed tables (shuffle-free co-located
joins) and Z-order (Morton) clustering for multi-dimensional parquet
row-group pruning.

Reference context: the reference's one physical-layout device is
table-per-day naming (monarch_etl/table_naming.py:24-43), which SURVEY
§1.1 maps to date-partitioned tables. At 100 TB two further layout
levers dominate repeated-query cost, and this module provides both:

* **Bucketing** — fact tables joined repeatedly on one key (orders ⋈
  lineitem on the order key; events ⋈ users on user_id) should be
  written ``bucketBy(N, key)`` ONCE: the scan then reports its
  hash-partitioning to Catalyst and every subsequent equi-join or
  aggregation on that key plans with NO Exchange on the bucketed side —
  one write-time shuffle amortized over every downstream query. This is
  the cluster answer to "co-located joins" (SURVEY §7 Phase 4); the
  local-mode tests assert the Exchange-free plan directly.

* **Z-order clustering** — a single-column sort tightens parquet
  row-group min/max statistics for ONE predicate column. Interleaving
  the bits of two quantized dimensions (the Morton / Z-curve) and
  range-sorting by that code gives BOTH columns locality at once: a
  ``lat BETWEEN … AND lon BETWEEN …`` box predicate then skips most
  row-groups on their plain per-column stats — the z column itself
  never needs to appear in the predicate, it only shapes the layout.

Scale posture: ``write_bucketed`` repartitions to exactly one file per
bucket before writing (the same fix SCALING.md round 9 measured for IVF
partitioned writes — a naive bucketed write emits tasks×buckets files);
``write_zordered`` range-partitions by z so files tile the curve
without overlap. Neither path collects anything on the driver except
``write_zordered``'s optional bounds probe (a 4-value aggregate row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_bucketed",
    "assert_exchange_free",
    "ensure_scan_parallelism",
    "zvalue_expr",
    "zvalue_expr_nd",
    "write_zordered",
    "write_zordered_nd",
]


# --------------------------------------------------------------------------
# Bucketed tables
# --------------------------------------------------------------------------

def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: str | list[str],
    n_buckets: int,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an EXTERNAL bucketed parquet table.

    Bucket metadata must live in a catalog (Spark cannot express it in
    bare parquet paths), so this registers ``table``; ``path`` keeps the
    data outside the warehouse dir so tests and callers control the
    location. ``sort_cols`` defaults to the bucket columns — sorted
    buckets let Spark drop the per-side Sort too when every bucket is a
    single file (which the pre-repartition below guarantees).

    The ``repartition(n_buckets, *bucket_cols)`` is load-bearing: Spark's
    bucket assignment is the same Murmur3 ``HashPartitioning`` that
    ``repartition`` uses, so after it each task holds exactly the rows of
    its own bucket and the write emits ONE file per bucket instead of
    (parallelism × buckets) small files — the write pathology SCALING.md
    round 9 measured on the IVF layout applies identically here.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    bc = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sc = (
        bc
        if sort_cols is None
        else ([sort_cols] if isinstance(sort_cols, str) else list(sort_cols))
    )
    (
        df.repartition(n_buckets, *[F.col(c) for c in bc])
        .write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bc)
        .sortBy(*sc)
        .saveAsTable(table)
    )


def assert_exchange_free(df: DataFrame, require: str | None = None) -> None:
    """Raise if the physical plan of ``df`` contains any Exchange.

    ``require`` optionally names a node that MUST be present (e.g.
    ``"SortMergeJoin"``) so a test can pin both "the join happened" and
    "it happened without a shuffle". Used to certify that a join or
    aggregation over co-bucketed tables planned Exchange-free.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"plan contains an Exchange:\n{plan}")
    if require is not None and require not in plan:
        raise AssertionError(f"plan lacks required node {require!r}:\n{plan}")


def ensure_scan_parallelism(
    df: DataFrame,
    floor: int | None = None,
) -> DataFrame:
    """Round-robin repartition ``df`` up to ``floor`` partitions when —
    and only when — its current layout has fewer (optimization guide
    §2.5: one huge unsplittable file → "repartition immediately after
    the read").

    Why this exists: a parquet file is splittable only at ROW-GROUP
    boundaries, so a single-row-group file (pandas/pyarrow writers
    default to one group for small tables) scans as ONE task no matter
    how many cores the cluster has — and every expression-dense map or
    partial-agg stage fused onto that scan runs single-threaded. The
    repartition pays one narrow shuffle of the projected input to buy
    full parallelism for the expensive work above it.

    Scale posture: ``floor`` defaults to ``defaultParallelism`` (total
    scheduler cores — local AND cluster), and the repartition is a
    structural NO-OP whenever the scan already carries that many
    partitions, which any real multi-file/multi-row-group dataset does.
    It can never REDUCE parallelism (only repartitions upward), so it
    is not a local-mode constant baked into the plan — the same code
    path degrades to identity at 100 TB. Callers should project to the
    needed columns FIRST so the shuffle moves only those bytes.

    The partition-count probe reads the physical plan's partitioning
    (no job, no data); round-robin (not keyed) repartition is used so
    no synthetic skew is possible (guide §2.5), and Spark's
    sort-before-repartition keeps it deterministic under task retry.
    """
    sess = df.sparkSession
    if floor is None:
        floor = sess.sparkContext.defaultParallelism
    if floor <= 1:
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= floor:
        return df
    return df.repartition(floor)


# --------------------------------------------------------------------------
# Z-order (Morton) clustering
# --------------------------------------------------------------------------

# Bit-spread masks: v (<=16 bits) -> 32-bit with a zero between every bit.
_SPREAD_STEPS: list[tuple[int, int]] = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_bits(v: Column) -> Column:
    """Interleave-ready spread of a <=16-bit long: abcd -> 0a0b0c0d."""
    for shift, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def _quantize(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a double in [lo, hi] to an integer cell in [0, 2^bits - 1].

    ``floor`` (not a bare cast) keeps Spark/DuckDB parity — Spark's
    double->bigint cast truncates while DuckDB's rounds; ``floor`` is the
    same function in both. Out-of-range values clamp to the edge cells,
    NULLs stay NULL (and sort last under ``asc_nulls_last``).
    """
    n_cells = (1 << bits) - 1
    scaled = F.floor((c - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n_cells + 1)))
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(n_cells)).cast("long")
    # greatest/least SKIP nulls (Spark and DuckDB alike), so without an
    # explicit guard a NULL coordinate silently clamps to cell 0.
    return F.when(c.isNotNull(), clamped)


def zvalue_expr(
    x: Column,
    y: Column,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 16,
) -> Column:
    """Morton (Z-curve) code of two doubles as a single long.

    Each coordinate quantizes to ``bits`` cells over its range, the two
    bit strings interleave (x in the even positions), and the result is
    a 2×``bits``-bit long whose sort order walks the Z curve. Pure JVM
    arithmetic — shiftleft/bitwiseOR/bitwiseAND inside whole-stage
    codegen, no UDF — and exactly replayable in ANSI SQL with
    ``<< | &`` (the ``zorder_curve`` oracle does).
    """
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    for name, (lo, hi) in (("x_range", x_range), ("y_range", y_range)):
        if not hi > lo:
            raise ValueError(f"{name} must satisfy hi > lo, got ({lo}, {hi})")
    qx = _quantize(x, x_range[0], x_range[1], bits)
    qy = _quantize(y, y_range[0], y_range[1], bits)
    return _spread_bits(qx).bitwiseOR(F.shiftleft(_spread_bits(qy), 1))


def zvalue_expr_nd(
    cols: list[Column],
    ranges: list[tuple[float, float]],
    bits: int | None = None,
) -> Column:
    """N-dimensional Morton code — the spatiotemporal layout key
    ((lat, lon, time) is the classic 3-D case the 2-D form can't
    serve: sorting 2-D z then time gives time no row-group locality).

    Each of the N coordinates quantizes to ``bits`` cells (default
    ``63 // N`` — 21 bits/dim at N=3, 15 at N=4 — keeping the code in
    a non-negative long); bit b of dimension d lands at position
    ``b*N + d`` (dimension 0 in the lowest lane, matching
    :func:`zvalue_expr`'s x-even convention at N=2). The interleave is
    an OR-fold of ``bits × N`` shift/and terms — bigger codegen than
    the 2-D magic-mask spread but still pure JVM integer arithmetic,
    evaluated once per row at WRITE time; keep :func:`zvalue_expr` for
    the 2-D hot path. Exactly replayable in ANSI SQL with ``<< | &``
    (pinned against DuckDB in tests/test_layout.py). NULL in any
    coordinate -> NULL code (sorts last under ``asc_nulls_last``),
    matching the 2-D form's contract.

    Measured guidance (SCALING.md round 10): N-D locality costs
    interleave bits — effective resolution is (log2 #row-groups)/N per
    dimension, so on SMALL tables (few row groups) 3-D z can READ MORE
    than 2-D z (9.1% vs 5.7% of rows at ~75 groups); the crossover
    arrives with group count (1.0% vs 1.8% at ~640 groups), and 100 TB
    tables sit far past it. Pick N by the table's row-group budget,
    not by how many columns have predicates.
    """
    n = len(cols)
    if n < 2:
        raise ValueError(f"zvalue_expr_nd needs >= 2 dims, got {n}")
    if len(ranges) != n:
        raise ValueError(f"{n} cols but {len(ranges)} ranges")
    if bits is None:
        bits = 63 // n
    if not 1 <= bits <= 63 // n:
        raise ValueError(
            f"bits must be in [1, {63 // n}] for {n} dims, got {bits}"
        )
    for d, (lo, hi) in enumerate(ranges):
        if not hi > lo:
            raise ValueError(f"ranges[{d}] must satisfy hi > lo, got ({lo}, {hi})")
    qs = [
        _quantize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, ranges)
    ]
    z: Column | None = None
    for b in range(bits):
        for d, q in enumerate(qs):
            term = F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + d
            )
            z = term if z is None else z.bitwiseOR(term)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float] | None = None,
    y_range: tuple[float, float] | None = None,
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
    row_group_bytes: int | None = None,
) -> None:
    """Write ``df`` to parquet clustered along the (x, y) Z-curve.

    Ranges default to a one-row min/max probe (the only driver-side
    collect here — 4 scalars). ``repartitionByRange`` on the z value
    tiles the curve across ``n_files`` non-overlapping files and
    ``sortWithinPartitions`` orders rows inside each, so BOTH coordinate
    columns carry tight row-group min/max stats; a later box predicate
    on (x, y) prunes row-groups without the z column ever being read.
    ``row_group_bytes`` (parquet.block.size) controls pruning
    granularity — at 100 TB leave the 128 MB default; tests shrink it to
    get many row-groups from small data.
    """
    if x_range is None or y_range is None:
        probe = df.agg(
            F.min(x_col).alias("x0"), F.max(x_col).alias("x1"),
            F.min(y_col).alias("y0"), F.max(y_col).alias("y1"),
        ).first()
        x_range = x_range or (float(probe["x0"]), float(probe["x1"]))
        y_range = y_range or (float(probe["y0"]), float(probe["y1"]))
    z = zvalue_expr(F.col(x_col), F.col(y_col), x_range, y_range, bits)
    out = df.withColumn("_z", z)
    if n_files:
        out = out.repartitionByRange(n_files, F.col("_z").asc_nulls_last())
    else:
        out = out.repartitionByRange(F.col("_z").asc_nulls_last())
    writer = (
        out.sortWithinPartitions(F.col("_z").asc_nulls_last())
        .drop("_z")
        .write.mode(mode)
    )
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)


def write_zordered_nd(
    df: DataFrame,
    path: str,
    cols: list[str],
    ranges: list[tuple[float, float]] | None = None,
    bits: int | None = None,
    n_files: int | None = None,
    mode: str = "overwrite",
    row_group_bytes: int | None = None,
) -> None:
    """N-dimensional :func:`write_zordered` — cluster along the
    :func:`zvalue_expr_nd` curve so ALL listed coordinate columns get
    row-group min/max locality. Ranges default to one min/max probe
    (2·N scalars on the driver). Before reaching for N > 2, read the
    measured guidance on :func:`zvalue_expr_nd`: the per-dimension
    resolution is (log2 #row-groups)/N, so small tables can prune
    BETTER with fewer dimensions — size ``row_group_bytes``/``n_files``
    so the group count grants ≥4-5 bits per dimension."""
    if len(cols) < 2:
        raise ValueError(f"write_zordered_nd needs >= 2 cols, got {cols}")
    if ranges is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"{c}__lo"), F.max(c).alias(f"{c}__hi")]
        probe = df.agg(*aggs).first()
        ranges = [
            (float(probe[f"{c}__lo"]), float(probe[f"{c}__hi"])) for c in cols
        ]
    z = zvalue_expr_nd([F.col(c) for c in cols], ranges, bits)
    out = df.withColumn("_z", z)
    if n_files:
        out = out.repartitionByRange(n_files, F.col("_z").asc_nulls_last())
    else:
        out = out.repartitionByRange(F.col("_z").asc_nulls_last())
    writer = (
        out.sortWithinPartitions(F.col("_z").asc_nulls_last())
        .drop("_z")
        .write.mode(mode)
    )
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file layout profile of a parquet directory: ``(file, bytes,
    row_groups, rows)`` — the observability half of compaction (see
    ``inventory.compact_versioned``). A table whose median file is far
    below the row-group target (128 MB) is paying per-file open/footer/
    task costs on every read; this makes that visible as a frame you
    can aggregate, join to read timings, or threshold in a maintenance
    job.

    Footer decodes are metadata-scale (KB per file, no data pages
    read). Listing and footer reads run driver-side, which is right for
    the maintenance cadence this serves; at object-store scale the same
    numbers come from the catalog/FileIndex manifest instead of os.walk.
    """
    import os

    import pyarrow.parquet as pq

    rows = []
    for root, _, fs in os.walk(path):
        for f in sorted(fs):
            if not (f.endswith(".parquet") or f.startswith("part-")):
                continue
            full = os.path.join(root, f)
            meta = pq.ParquetFile(full).metadata
            rows.append((
                os.path.relpath(full, path),
                os.path.getsize(full),
                meta.num_row_groups,
                meta.num_rows,
            ))
    return spark.createDataFrame(
        rows, "file string, bytes long, row_groups int, rows long"
    )

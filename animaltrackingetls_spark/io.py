"""Source/sink helpers (SURVEY.md §2.1/§2.2).

Parquet is the canonical storage here; JDBC read/write mirror the
reference's S3/K1/K2 operators and are exercised only when a JDBC URL is
supplied (no database ships in the test environment).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401 — Column is referenced by annotations
from pyspark.sql import functions as F


def local_df_single_partition(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-local rows as a ONE-partition DataFrame.

    The default ``createDataFrame`` parallelizes even a tiny row list
    across ``defaultParallelism`` slices; a later single-task action on
    it (``coalesce(1)`` write of a sidecar/catalog file is the common
    shape) then pays every slice's Python-serving handshake SERIALLY in
    that one task — measured ~3.5 s for a 64-row frame on local[32]
    versus ~0.15 s this way (SCALING.md round 9). One slice from the
    start: one handshake, one output file, no shuffle and no coalesce."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


_TS_KINDS_CACHE: dict[tuple, dict[str, str]] = {}


def _footer_signature(path: str, glob_pat: str = "*.parquet") -> tuple:
    """(file, mtime, size) fingerprint of the parquet file set at ``path``
    — the cache key, so a path rewritten in place (e.g. by upsert_parquet)
    is re-inspected instead of served a stale answer."""
    files: list[str]
    if os.path.isdir(path):
        # recursive: hive-partitioned tables keep their parquet under
        # key=value subdirectories — a top-level-only glob would return
        # nothing and silently skip the rescue classification
        files = sorted(
            _glob.glob(os.path.join(path, glob_pat))
            + _glob.glob(os.path.join(path, "**", glob_pat), recursive=True)
        )
        files = sorted(dict.fromkeys(files))
    else:
        files = [path] if os.path.exists(path) else []
    sig = []
    for f in files:
        try:
            st = os.stat(f)
            sig.append((f, st.st_mtime_ns, st.st_size))
        except OSError:
            sig.append((f, 0, 0))
    return (path, tuple(sig))


def timestamp_rescue_kinds(path: str, glob_pat: str = "*.parquet") -> dict[str, str]:
    """Classify parquet timestamp columns at ``path`` that need a read-time
    rescue: ``{'col': 'nanos' | 'ntz'}``.

    * ``nanos`` — INT64 TIMESTAMP(NANOS). Spark 4 cannot read these
      natively; with ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in
      session.py) they surface as raw int64 nanoseconds and must be cast
      back to a timestamp.
    * ``ntz`` — INT64 TIMESTAMP(isAdjustedToUTC=false, micros/millis).
      Spark 4 infers TIMESTAMP_NTZ for these, which breaks epoch
      arithmetic (``cast(ts AS BIGINT)`` is illegal on NTZ); under the
      engine's UTC session zone a cast to TIMESTAMP is wall-clock
      lossless, so callers normalize them.

    The driver's testdata generator has shipped BOTH encodings across
    rounds, so the loaders inspect the footer instead of assuming one.
    Footer-only inspection via pyarrow — no data read. ALL footers are
    scanned (a directory may hold mixed writer schemas) and the memo key
    carries the file list + mtimes, so in-place rewrites invalidate the
    cache.

    Recognized-but-native encodings pass silently (INT96; INT64
    utc-adjusted millis/micros — Spark reads both directly; NTZ-millis
    joins NTZ-micros in the ``ntz`` class). Anything ELSE that claims to
    be a timestamp — an unexpected physical type, or an INT64 unit this
    classifier doesn't know — raises ``ValueError`` immediately: the
    generator has changed encodings twice already, and a silent
    pass-through here surfaces later as 50 mysteriously-failing oracle
    queries instead of one loud line naming the column.
    """
    key = _footer_signature(path, glob_pat)
    if key in _TS_KINDS_CACHE:
        return _TS_KINDS_CACHE[key]
    found: dict[str, str] = {}
    try:
        import pyarrow.parquet as pq
    except Exception:
        _TS_KINDS_CACHE[key] = found
        return found
    for target, _mt, _sz in key[1]:
        try:
            meta = pq.read_metadata(target).schema
        except Exception:
            continue  # unreadable footer: Spark's own reader will complain
        for i in range(len(meta)):
            col = meta.column(i)
            logical = str(col.logical_type).lower()
            if "timestamp" not in logical:
                continue  # includes INT96 (logical None): Spark-native
            compact = logical.replace(" ", "")
            if col.physical_type != "INT64":
                # Must check the PHYSICAL parquet type: pyarrow reports
                # Spark-written INT96 timestamps as timestamp[ns] at the
                # *arrow* level, but their parquet logical type is None,
                # so reaching here means a genuinely novel encoding.
                raise ValueError(
                    f"{target}: column {col.name!r} is a TIMESTAMP with "
                    f"physical type {col.physical_type} — not a layout this "
                    "loader knows; extend timestamp_rescue_kinds before "
                    "trusting any query over it"
                )
            if "nanos" in logical:
                found[col.name] = "nanos"
            elif "isadjustedtoutc=false" in compact:
                # NTZ in any unit (micros r4+, millis future): Spark infers
                # TIMESTAMP_NTZ; load_table casts to session-UTC timestamp
                found[col.name] = "ntz"
            elif "millis" in logical or "micros" in logical:
                pass  # utc-adjusted INT64: Spark reads natively, no rescue
            else:
                raise ValueError(
                    f"{target}: column {col.name!r} has unrecognized INT64 "
                    f"timestamp unit ({col.logical_type}) — extend "
                    "timestamp_rescue_kinds before trusting any query over it"
                )
    _TS_KINDS_CACHE[key] = found
    return found


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Back-compat shim: columns stored as TIMESTAMP(NANOS) at ``path``."""
    return sorted(
        c for c, kind in timestamp_rescue_kinds(path).items() if kind == "nanos"
    )


def _is_long(df: DataFrame, col: str) -> bool:
    from pyspark.sql import types as T

    try:
        return isinstance(df.schema[col].dataType, T.LongType)
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for c, kind in timestamp_rescue_kinds(path).items():
        if kind == "nanos" and _is_long(df, c):
            # int64 nanos → microseconds → timestamp (UTC session zone).
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            # Session zone is UTC, so NTZ→TIMESTAMP keeps the wall clock
            # and restores epoch arithmetic (cast-to-long, unix_timestamp).
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every dataset table as a temp view (through
    ``load_table``, so timestamp-encoding rescue applies) and return the
    view names — the one-call setup that makes the pure-SQL surface
    first-class: after this, ``spark.sql("SELECT ... FROM lineitem
    JOIN orders ...")`` works exactly like the DataFrame API, Catalyst
    plans and all."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TABLES)


def union_append(a: DataFrame, b: DataFrame) -> DataFrame:
    """J3: union by column name, NULL-filling columns absent on one side
    (the reference's pd.concat accumulation, usamonarchbutterflies.py:57-69)."""
    return a.unionByName(b, allowMissingColumns=True)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    drift_reference: DataFrame | None = None,
    drift_columns: list[str] | None = None,
) -> None:
    """K1-analog: idempotent partitioned write. With
    ``partitionOverwriteMode=dynamic`` a day re-run replaces only its own
    partition — the Spark answer to the reference's drop-and-recreate
    table-per-day load (db_loader.py:23-59).

    The mode is a per-write option, not session conf: a session-level
    dynamic setting would silently change overwrite semantics for every
    later write on the shared session.

    ``drift_reference`` arms the drift gate: the batch is profiled
    against the reference snapshot before anything is written, and a
    flagged check (null-ratio jump, cardinality collapse, schema drift)
    raises ``DriftDetected`` INSTEAD of loading — the load-side twin of
    the cleaning tier's flag-rows-to-reject-sink convention."""
    if drift_reference is not None:
        from .operators.profile import assert_no_drift

        assert_no_drift(drift_reference, df, columns=drift_columns)
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_optimized(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    target_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-optimizing write: hash-repartition on the partition
    columns, sort WITHIN each task, write partitioned parquet.

    Why each step matters at 100 TB:

    * ``repartition(partition_cols)`` — without it every task writes a
      file into every hive partition it happens to hold rows for:
      tasks × partitions small files, the classic layout killer.
      Co-locating first gives one file per (task, partition).
    * ``sortWithinPartitions(sort_cols)`` — a task-local sort (NO global
      shuffle/range exchange) that tightens parquet row-group min/max
      bounds on the sort keys, so selective scans skip row groups
      entirely; a hive-partition filter prunes directories before any
      I/O (asserted plan-level in tests via PartitionFilters).
    * ``target_partitions`` caps file count when the write follows a
      wide shuffle (AQE may otherwise leave hundreds of tiny outputs).
    """
    out = df.repartition(*([target_partitions] if target_partitions else []),
                         *[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    # per-write option, not session conf: a session-level
    # partitionOverwriteMode=dynamic would silently change overwrite
    # semantics for every later write on the shared session
    (
        out.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Permissive JSON-lines scan → (good, rejected) — the raw-landing
    form of the reference's REST-page JSON ingestion: a malformed line
    (truncated upload, junk bytes, schema break) lands in the rejected
    frame with the raw line preserved, instead of failing the job or
    silently vanishing.

    With an explicit ``schema`` the scan is single-pass and the columns
    prune/push down; without one, Spark samples to infer (fine for
    exploration, pin the schema in production). Spark requires the
    corrupt-record column to be part of the schema to populate it —
    handled here. The split is the cleaning kernel's pattern: tag once,
    filter twice; rejected carries only (raw_line,) + NULLs.
    """
    from pyspark.sql import types as T

    if schema is not None:
        read_schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
        )
        reader = spark.read.schema(read_schema)
    else:
        reader = spark.read.option("columnNameOfCorruptRecord", corrupt_col)
    df = (
        reader.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    if corrupt_col not in df.columns:  # inferred-schema scan, zero bad lines
        empty_rejected = df.limit(0).select(
            F.lit(None).cast("string").alias("raw_line")
        )
        return df, empty_rejected
    # Spark refuses a query whose only referenced column is the internal
    # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN): the raw
    # line isn't a real column of the scan, so the reject branch must
    # read a materialized parse. cache() is the documented fix; at scale
    # write the parsed frame to a landing parquet once and split from
    # there (same two-branch shape, no memory pin).
    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    rejected = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, rejected


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet table into ~``target_file_mb`` files — the
    operational fix for small-file buildup (streaming micro-batches,
    per-task writes after wide shuffles). Returns the output file count.

    File count is sized from the CURRENT on-disk bytes (footer-free
    os.stat walk), not a guess: ``ceil(total_bytes / target)``. With
    ``partition_cols`` the repartition keys on them so each hive
    partition lands in as few tasks as possible (the write_optimized
    layout rule); the rewrite goes through a temp directory and a
    rename swap. The swap is TWO renames, so there is a small window
    (and a crash case) where ``path`` does not exist; a subsequent call
    detects the stranded ``__old_*`` sibling and restores it before
    doing anything else, so no data is ever lost — but readers racing
    the swap can see ENOENT, and a crash between the renames needs that
    one recovery call. True single-rename atomicity needs a pointer
    scheme (see ``inventory.upsert_parquet_versioned``) or a lake
    format. At 100 TB run this per-partition (pass the partition
    subdirectory as ``path``), never whole-table.
    """
    import math
    import shutil
    import uuid

    # crash recovery: a previous run that died between its two renames
    # left the table under __old_* with nothing at `path` — restore it
    if not os.path.exists(path):
        parent = os.path.dirname(path.rstrip("/")) or "."
        base = os.path.basename(path.rstrip("/"))
        stranded = sorted(
            d for d in os.listdir(parent) if d.startswith(f"{base}__old_")
        )
        if stranded:
            os.rename(os.path.join(parent, stranded[0]), path)
            for extra in stranded[1:]:
                shutil.rmtree(os.path.join(parent, extra))

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.stat(os.path.join(root, f)).st_size
    if total == 0:
        return 0
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out = (
        df.repartition(n_files, *[F.col(c) for c in partition_cols])
        if partition_cols
        else df.repartition(n_files)
    )
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


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


def jdbc_column_types(
    schema, overrides: dict[str, str] | None = None
) -> str:
    """Explicit target-table column DDL for a JDBC load — the Spark twin
    of the reference's SQLAlchemy dtype map passed to ``to_sql`` on every
    load (monarch_etl/db_loader.py:58, monarch_etl/schema.py:46-85), so
    the database table is created with intentional types rather than the
    driver defaults.

    Returns the ``createTableColumnTypes`` option string: a comma-joined
    ```col` TYPE`` list in Spark-SQL DDL (Spark parses it with its own
    parser, then maps each type through the JDBC dialect). Reserved-word
    columns (the canonical schema deliberately contains ``class`` and
    ``order``) are backtick-quoted. ``overrides`` swaps the DDL type for
    named columns (e.g. ``{"countryCode": "VARCHAR(2)"}``).
    """
    parts = []
    for f in schema.fields:
        ddl = (overrides or {}).get(f.name) or f.dataType.simpleString().upper()
        parts.append(f"`{f.name}` {ddl}")
    return ", ".join(parts)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict | None = None,
    column_types: str | dict[str, str] | None = None,
) -> None:
    """K1/K2: JDBC overwrite/append load.

    ``column_types`` pins the created table's column DDL (reference
    parity: the dtype map of monarch_etl/db_loader.py:58): pass a full
    ``createTableColumnTypes`` string, or a per-column override dict that
    is completed from ``df.schema`` via :func:`jdbc_column_types`.
    """
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    if column_types is not None:
        if isinstance(column_types, dict):
            column_types = jdbc_column_types(df.schema, column_types)
        writer = writer.option("createTableColumnTypes", column_types)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def create_table_sql(table: str, schema, column_types: str | dict | None = None) -> str:
    """``CREATE TABLE`` statement from the SAME column DDL that
    :func:`write_jdbc` hands Spark's JDBC writer — one source of truth
    for target-table types whichever transport executes them."""
    cols = (
        column_types
        if isinstance(column_types, str)
        else jdbc_column_types(schema, column_types)
    )
    return f"CREATE TABLE {table} ({cols})"


def write_dbapi(
    df: DataFrame,
    conn_factory,
    table: str,
    mode: str = "overwrite",
    column_types: str | dict[str, str] | None = None,
    batch_size: int = 500,
) -> None:
    """K1/K2's database form through any DB-API connection — the
    EXECUTABLE mirror of :func:`write_jdbc` for environments without a
    JDBC driver jar (this sandbox; also DuckDB/SQLite targets that have
    no JDBC URL from Python). Same semantics: overwrite drops and
    recreates from the :func:`jdbc_column_types` DDL, append creates
    only if missing; inserts run distributed, one connection per
    partition, executemany'd in ``batch_size`` chunks.

    ``conn_factory`` must be a zero-arg picklable callable (executors
    open their own connections — never serialize one). DDL runs once on
    the driver before the distributed insert.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    ddl = create_table_sql(table, df.schema, column_types)
    conn = conn_factory()
    try:
        cur = conn.cursor()
        if mode == "overwrite":
            cur.execute(f"DROP TABLE IF EXISTS {table}")
            cur.execute(ddl)
        else:
            cur.execute(ddl.replace("CREATE TABLE", "CREATE TABLE IF NOT EXISTS", 1))
        conn.commit()
    finally:
        conn.close()

    cols = list(df.columns)
    insert = (
        f"INSERT INTO {table} ({', '.join(cols)}) "
        f"VALUES ({', '.join(['?'] * len(cols))})"
    )

    def write_partition(rows) -> None:
        pconn = conn_factory()
        try:
            pcur = pconn.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(row[c] for c in cols))
                if len(batch) >= batch_size:
                    pcur.executemany(insert, batch)
                    batch = []
            if batch:
                pcur.executemany(insert, batch)
            pconn.commit()
        finally:
            pconn.close()

    df.foreachPartition(write_partition)


def read_dbapi(
    spark: SparkSession,
    conn_factory,
    table: str,
    schema,
    partition_col: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """S3's executable mirror of :func:`read_jdbc`: a typed, PARALLEL
    table scan through DB-API connections, with the same partitioning
    contract as Spark's JDBC source — ``num_partitions`` stride clauses
    over ``[lower_bound, upper_bound)`` of ``partition_col``, first and
    last clauses open-ended (and NULLs routed to the first) so the union
    of partitions is exactly the table regardless of out-of-range rows.

    Each Spark task executes its own bounded SELECT on its own
    connection (``mapInPandas`` over one clause per partition), so the
    database sees ``num_partitions`` concurrent range queries — the
    JDBC source's behavior, minus the driver jar. ``schema`` (a
    StructType or DDL string) makes the readback typed: Arrow coerces
    the fetched rows to it, failing loudly on mismatch rather than
    inferring drifted types.
    """
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    col_list = ", ".join(f.name for f in schema.fields)
    if partition_col is None or num_partitions <= 1:
        clauses = ["1=1"]
    else:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower_bound and upper_bound")
        stride = max(1, (upper_bound - lower_bound) // num_partitions)
        bounds = [lower_bound + i * stride for i in range(1, num_partitions)]
        clauses = [f"{partition_col} < {bounds[0]} OR {partition_col} IS NULL"]
        clauses += [
            f"{partition_col} >= {bounds[i - 1]} AND {partition_col} < {bounds[i]}"
            for i in range(1, len(bounds))
        ]
        clauses.append(f"{partition_col} >= {bounds[-1]}")

    clause_df = spark.createDataFrame(
        [(c,) for c in clauses], "clause string"
    ).repartition(len(clauses))
    # round-robin, NOT hash-by-clause: hashing can collide two range
    # clauses into one task (serializing their queries) and leave
    # another task empty, breaking the num_partitions-concurrent-scans
    # contract

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            for clause in pdf["clause"]:
                conn = conn_factory()
                try:
                    cur = conn.cursor()
                    cur.execute(f"SELECT {col_list} FROM {table} WHERE {clause}")
                    rows = cur.fetchall()
                finally:
                    conn.close()
                yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return clause_df.mapInPandas(fetch, schema)


# ---------------------------------------------------------------------------
# Clustered layout: range-cluster writes + footer-stats pruning diagnostics
# ---------------------------------------------------------------------------


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-CLUSTERED on ``cluster_cols``: rows are
    range-partitioned then sorted within each file on the cluster key,
    so every file's footer min/max statistics cover a narrow, disjoint
    key range — the layout step that turns predicate pushdown into FILE
    skipping at 100 TB (Delta/Iceberg call this clustering/ordering;
    plain parquet gets the same effect because Spark's scan prunes
    row-groups/files whose stats exclude the predicate).

    Unlike ``partitionBy`` (one DIRECTORY per value — wrong for
    high-cardinality keys), clustering keeps file count a free choice
    (``n_files``, default: current partitioning) and handles skew via
    range-partitioner sampling. Verify the effect with
    :func:`layout_prune_stats` — a layout claim without a pruning
    measurement is a hope, not a design.
    """
    cols = [F.col(c) for c in cluster_cols]
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def layout_prune_stats(path: str, col: str, value) -> dict:
    """How many parquet files could a point predicate ``col == value``
    skip on this layout? Reads ONLY footers (pyarrow), no data pages —
    the same min/max stats Spark's scan uses for row-group pruning, so
    this is a direct, engine-independent measurement of layout quality:
    clustered layouts prune nearly all files, unclustered ones prune
    none. Returns ``{"n_files", "n_prunable", "prune_fraction"}``.
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    files = sorted(
        _glob.glob(_os.path.join(path, "*.parquet"))
        + _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    files = sorted(set(files))
    n_prunable = 0
    for f in files:
        md = _pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        keep = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                keep = True  # no stats → cannot prune
                break
            if st.min <= value <= st.max:
                keep = True
                break
        if not keep:
            n_prunable += 1
    n = len(files)
    return {
        "n_files": n,
        "n_prunable": n_prunable,
        "prune_fraction": (n_prunable / n) if n else 0.0,
    }


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Morton (Z-order) key for 2-D clustering: interleave the low
    ``bits`` bits of two non-negative integer columns, JVM-side. Rows
    sorted by this key place 2-D neighbors in the same files, so BOTH
    columns' footer ranges stay narrow — use as
    ``write_clustered(df.withColumn("_z", zorder_key(...)), path,
    ["_z"])`` when queries filter on either/both dimensions (a single-
    column sort gives perfect pruning on one dimension and none on the
    other). Callers bin floats/timestamps to ints first (e.g.
    ``floor((lat + 90) * 100)``).
    """
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    a = c1.cast("long")
    b = c2.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(a, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
            + (F.shiftright(b, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
        )
    return z

"""Write-time change-data capture for versioned tables — the Delta
``enableChangeDataFeed`` analog: the MERGE/DELETE that publishes a
version also materializes the change rows it made, so downstream
consumers read churn-sized change files instead of diffing snapshots.

Why this exists next to :func:`..operators.versioning.table_changes`
(the DERIVED feed): deriving re-joins two snapshots per poll — file/
bucket churn pruning (round 12) bounds the scan, but the diff join and
the digest shuffle remain, and the consumer pays them on EVERY poll.
Logging at write time moves that cost to the commit (where the writer
has already read the touched rows — under copy-on-write the preimages
come from the exact files being rewritten), making the steady-state
consumption path a plain parquet scan of churn-sized files. This is
the design Delta ships: MERGE writes ``_change_data/`` files, CDF
readers scan them, and snapshot-diff is only the fallback for commits
that didn't log.

Reference parity note: the reference has no versioned store — its
change tracking is "re-extract the full day and reconcile by counts"
(monarch_etl/inventory.py:28-66). Both the derived and the logged feed
are the systematic replacements; this module is the one whose
steady-state cost tracks churn with NO read-time join at all.

Layout (per version directory, alongside the data files — published
and retention-pruned atomically WITH the version):

    table_dir/v-000007-ab12cd34/
        part-*.parquet            the snapshot (or its rewritten files)
        _changes/part-*.parquet   full change rows, _change_type column
        _changes.json             marker: {"v":1,"files":[...]}
    table_dir/_cdc_enabled.json   table-level pin (first writer sets)

Change rows are Delta-shaped: the FULL row plus ``_change_type`` in
``insert | update_preimage | update_postimage | delete``. A no-op
upsert row (the update equals the existing row over every non-key
column, by the same length-prefixed NULL-sentinel digest
:func:`..operators.versioning.corpus_diff` uses) logs NOTHING — so the
logged feed classifies exactly like the derived feed, and the two are
pinned equal in tests. Readers attach ``_commit_seq``/``_commit_version``
from the version that logged the change.

Holes: versions published before the pin, and RESTORE commits (which
change data but know no key columns), carry no marker. Readers treat a
hole per ``on_missing``: ``"fail"`` (default — exactly-once consumers
must not silently skip data) or ``"skip"`` (Delta's
``skipChangeCommits`` posture). Compaction and OPTIMIZE log an EMPTY
change set — they provably change no data. Retention prunes change
logs with their versions: a consumer must keep up within
``keep_versions`` commits, the same contract as the derived feed.

Scale: logging cost is churn-sized by construction — preimages are
``touched-scope ⋉ batch-keys`` (touched files under CoW, touched
buckets on the bucketed layout, one extra base scan only on the full-
rewrite path that already rewrites the table), postimages re-read only
the freshly WRITTEN files, and the classifying full-outer join runs
over those churn-sized sides. Consumption is a parquet scan of the
change files — zero joins, no digest shuffle, no snapshot read.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.versioning import _SEP, _rendered, row_digest

_CHANGES_DIR = "_changes"
_MARKER = "_changes.json"
_PIN = "_cdc_enabled.json"
CHANGE_TYPE_COL = "_change_type"
COMMIT_SEQ_COL = "_commit_seq"
COMMIT_VERSION_COL = "_commit_version"
CHANGE_PATH_COL = "_cf_path"  # paths-transport stream: file per row

INSERT = "insert"
UPDATE_PRE = "update_preimage"
UPDATE_POST = "update_postimage"
DELETE = "delete"


# ---------------------------------------------------------------- pin


def cdc_enabled(table_dir: str) -> bool:
    """Whether the table is pinned to log change data on every commit."""
    try:
        with open(os.path.join(table_dir, _PIN)) as f:
            return bool(json.load(f).get("enabled"))
    except FileNotFoundError:
        return False


def resolve_cdc(table_dir: str, want: bool | None) -> bool:
    """Resolve a writer's ``write_change_data`` argument against the
    table pin, mirroring the link-mode pin discipline: ``True`` pins
    the table ON (idempotent), ``None`` inherits, and ``False`` on a
    pinned table RAISES — a single unlogged commit would put a silent
    hole in every downstream consumer's feed, which is never what a
    caller passing an explicit flag meant."""
    pinned = cdc_enabled(table_dir)
    if want is None:
        return pinned
    if want:
        if not pinned:
            os.makedirs(table_dir, exist_ok=True)
            _atomic_json(os.path.join(table_dir, _PIN), {"enabled": True})
        return True
    if pinned:
        raise ValueError(
            f"{table_dir} is pinned to change-data capture; refusing "
            "write_change_data=False — an unlogged commit is a silent "
            "hole in every consumer's feed (holes are for RESTORE only)"
        )
    return False


def _atomic_json(path: str, payload: dict) -> None:
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


# ------------------------------------------------------ change rows


def _null_filled_union(pre: DataFrame, post: DataFrame):
    """Align two snapshots of the SAME table across schema evolution:
    each side gains the other's missing columns as typed NULLs — the
    exact semantics :func:`..operators.versioning.table_changes` applies
    before diffing, so a back-filled column's change churns identically
    in both feeds."""
    for col, typ in post.dtypes:
        if col not in pre.columns:
            pre = pre.withColumn(col, F.lit(None).cast(typ))
    for col, typ in pre.dtypes:
        if col not in post.columns:
            post = post.withColumn(col, F.lit(None).cast(typ))
    return pre, post.select(*pre.columns)


def classify_changes(
    pre: DataFrame | None,
    post: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Turn (preimage rows, postimage rows) — both restricted to the
    batch's keys, both key-unique snapshot slices — into Delta-shaped
    change rows: ``insert`` for keys absent from ``pre``,
    ``update_preimage``/``update_postimage`` pairs for keys whose
    non-key digest differs, NOTHING for no-op rows. One NULL-safe
    full-outer join on the rendered key (the corpus_diff join shape),
    classification and the pre/post fan-out as an ``explode`` over a
    per-key array — a single pass, no re-evaluation of either side.

    ``pre=None`` (first write) short-circuits: every row is an insert.
    Output columns: the union schema, then ``_change_type``.
    """
    reserved = {CHANGE_TYPE_COL, "_jk", "_dg", "_row"} & set(post.columns)
    if reserved:
        raise ValueError(
            f"change capture reserves columns {sorted(reserved)}; "
            "rename them in the input"
        )
    if pre is None:
        return post.withColumn(CHANGE_TYPE_COL, F.lit(INSERT))
    pre, post = _null_filled_union(pre, post)
    vcols = [c for c in post.columns if c not in set(key_cols)]

    def _side(df: DataFrame, tag: str) -> DataFrame:
        jk = F.concat_ws(_SEP, *[_rendered(k) for k in key_cols])
        dg = (
            row_digest(vcols, "_dg") if vcols
            # key-only table: presence diff, 'changed' impossible
            else F.lit("-").alias("_dg")
        )
        return df.select(
            jk.alias("_jk"), dg,
            F.struct(*[F.col(c) for c in post.columns]).alias("_row"),
        ).alias(tag)

    o, n = _side(pre, "o"), _side(post, "n")
    j = o.join(n, F.col("o._jk") == F.col("n._jk"), "full_outer")
    tagged = F.struct(
        F.col("n._row").alias("_row"), F.lit(INSERT).alias("_ct")
    )
    pair = F.array(
        F.struct(F.col("o._row").alias("_row"),
                 F.lit(UPDATE_PRE).alias("_ct")),
        F.struct(F.col("n._row").alias("_row"),
                 F.lit(UPDATE_POST).alias("_ct")),
    )
    empty = F.slice(pair, 1, 0)  # [] of pair's element type
    arr = (
        F.when(F.col("o._jk").isNull(), F.array(tagged))
        # a key only in pre cannot happen for an upsert (updates win,
        # never vanish); emitted as nothing rather than asserted so the
        # classifier stays total
        .when(F.col("n._jk").isNull(), empty)
        .when(F.col("o._dg") != F.col("n._dg"), pair)
        .otherwise(empty)
    )
    ex = j.select(F.explode(arr).alias("_e"))
    return ex.select(
        *[F.col(f"_e._row.{c}").alias(c) for c in post.columns],
        F.col("_e._ct").alias(CHANGE_TYPE_COL),
    )


def upsert_change_rows(
    spark: SparkSession,
    base_scope: DataFrame | None,
    new_files_df: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Change rows for a keyed upsert commit. ``base_scope`` is the
    narrowest pre-commit slice GUARANTEED to contain every matched
    key's old row (touched files under CoW, touched buckets on the
    bucketed layout, the full snapshot on a full rewrite, ``None`` on
    first write); ``new_files_df`` reads the files the commit WROTE
    (postimages live there and only there — carried/linked files hold
    no batch keys by construction). Both sides restrict to the batch's
    distinct keys before the classifying join, so every input to that
    join is churn-sized. ``updates`` is re-evaluated for its key set —
    same determinism contract the writer's retry loop already imposes.

    No forced broadcast on the key list: it is BATCH-sized, not
    erasure-list-sized — a bulk ingest batch can carry millions of
    keys, and a broadcast hint would ship them through the driver
    regardless of Spark's size threshold (the round-11 advisory's
    exact failure mode on the pump's key lists). AQE picks BHJ when
    the keys genuinely fit.
    """
    upd_keys = updates.select(*key_cols).dropDuplicates(key_cols)
    post = new_files_df.join(
        upd_keys,
        on=_keys_cond(new_files_df, upd_keys, key_cols),
        how="left_semi",
    )
    pre = None
    if base_scope is not None:
        pre = base_scope.join(
            upd_keys,
            on=_keys_cond(base_scope, upd_keys, key_cols),
            how="left_semi",
        )
    return classify_changes(pre, post, key_cols)


def delete_change_rows(
    doomed: DataFrame,
) -> DataFrame:
    """Change rows for a DELETE commit: the doomed rows themselves,
    tagged ``delete`` — the caller (who just computed the anti-join's
    complement) passes the matched side."""
    return doomed.withColumn(CHANGE_TYPE_COL, F.lit(DELETE))


def _keys_cond(left: DataFrame, right: DataFrame, key_cols: list[str]):
    cond = None
    for k in key_cols:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    return cond


# ------------------------------------------------------------ writing


def write_change_log(
    table_dir: str,
    version: str,
    changes: DataFrame | None,
) -> None:
    """Materialize a commit's change rows under its (not yet published)
    version directory and stamp the marker. Runs BEFORE the pointer
    swap, inside the writer's try block: a crash leaves only
    unreferenced debris, and a published version either carries its
    full change log + marker or isn't published at all.
    ``changes=None`` logs a provably-empty commit (compaction,
    OPTIMIZE) as a marker with no files."""
    vdir = os.path.join(table_dir, version)
    files: list[str] = []
    if changes is not None:
        cdir = os.path.join(vdir, _CHANGES_DIR)
        changes.write.mode("error").parquet(cdir)
        files = sorted(
            f for f in os.listdir(cdir)
            if not f.startswith((".", "_"))
        )
    _atomic_json(os.path.join(vdir, _MARKER), {"v": 1, "files": files})


def change_log(table_dir: str, version: str) -> list[str] | None:
    """Absolute paths of a version's logged change files, ``None`` when
    the version carries no marker (a hole: pre-pin or RESTORE)."""
    vdir = os.path.join(table_dir, version)
    try:
        with open(os.path.join(vdir, _MARKER)) as f:
            marker = json.load(f)
    except FileNotFoundError:
        return None
    return [
        os.path.join(vdir, _CHANGES_DIR, name)
        for name in marker.get("files", [])
    ]


def _seq_of(version: str) -> int:
    return int(version.split("-")[1])


# ------------------------------------------------------------ reading


def read_change_data(
    spark: SparkSession,
    table_dir: str,
    from_version: str | None = None,
    to_version: str | None = None,
    on_missing: str = "fail",
    versions: list[str] | None = None,
) -> DataFrame:
    """Batch-read the LOGGED change feed over the retained window
    ``(from_version, to_version]`` — ``from`` EXCLUSIVE to match
    :func:`..operators.versioning.table_changes`'s "commits after the
    snapshot I already have" semantics; ``from_version=None`` includes
    every retained logged commit (the creation commit too — something
    the derived feed can never reconstruct once the pre-image is
    pruned). Attaches ``_commit_seq``/``_commit_version`` per file.

    Plain JVM parquet scans of churn-sized files — no join, no digest
    shuffle, no snapshot read; the window is retention-bounded so the
    per-version union stays a handful of children.

    ``versions`` overrides the retained-version list (publish order) —
    GROUP MEMBER tables have no per-table ``_HISTORY`` ledger, so their
    caller passes the group state's member history instead of letting
    the raw directory fallback offer crash debris as committed history.
    """
    from .inventory import list_versions

    if on_missing not in ("fail", "skip"):
        raise ValueError(f"on_missing must be fail|skip, got {on_missing!r}")
    if versions is None:
        versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no versions under {table_dir}")
    named = [v for v in (from_version, to_version) if v is not None]
    missing = [v for v in named if v not in versions]
    if missing:
        raise FileNotFoundError(
            f"version(s) {missing} not retained under {table_dir} "
            f"(have: {versions})"
        )
    lo = _seq_of(from_version) if from_version else 0
    hi = _seq_of(to_version) if to_version else _seq_of(versions[-1])
    window = [v for v in versions if lo < _seq_of(v) <= hi]
    parts: list[DataFrame] = []
    for v in window:
        files = change_log(table_dir, v)
        if files is None:
            if on_missing == "skip":
                continue
            raise FileNotFoundError(
                f"{table_dir}/{v} logged no change data (published "
                "before the CDC pin, or a RESTORE) — the window has a "
                "hole; pass on_missing='skip' to read past it, or use "
                "the derived table_changes feed for this span"
            )
        if not files:
            continue
        parts.append(
            spark.read.parquet(*files)
            .withColumn(COMMIT_SEQ_COL, F.lit(_seq_of(v)).cast("long"))
            .withColumn(COMMIT_VERSION_COL, F.lit(v))
        )
    if parts:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out
    # empty window: a stable, correctly-typed empty frame
    return _empty_changes_frame(spark, table_dir, versions)


def _empty_changes_frame(
    spark: SparkSession, table_dir: str, versions: list[str]
) -> DataFrame:
    """A zero-row frame with the logged feed's schema. Typed from the
    newest logged change file, else the newest snapshot resolved
    through the PASSED version list — never read_versioned, whose
    _CURRENT lookup group-member table dirs don't have (they publish
    through the group pointer; round-12 ADVICE #3)."""
    from .inventory import _snapshot_files

    for v in reversed(versions):
        files = change_log(table_dir, v)
        if files:
            return (
                spark.read.parquet(files[-1]).limit(0)
                .withColumn(COMMIT_SEQ_COL, F.lit(None).cast("long"))
                .withColumn(COMMIT_VERSION_COL, F.lit(None).cast("string"))
            )
    snap_files = _snapshot_files(table_dir, versions[-1])
    if not snap_files:
        raise FileNotFoundError(
            f"no data files in {table_dir}/{versions[-1]}"
        )
    return (
        spark.read.parquet(sorted(snap_files.values())[0]).limit(0)
        .withColumn(CHANGE_TYPE_COL, F.lit(None).cast("string"))
        .withColumn(COMMIT_SEQ_COL, F.lit(None).cast("long"))
        .withColumn(COMMIT_VERSION_COL, F.lit(None).cast("string"))
    )


# -------------------------------------------- structured streaming


def _changes_arrow_schema(table_dir: str):
    """Arrow schema of the logged feed (data columns +
    ``_change_type``), from the NEWEST non-empty change log's footer —
    the most-evolved schema; older files' missing columns NULL-pad at
    read. Falls back to the newest snapshot's data-file footer plus a
    string ``_change_type`` when nothing has logged yet (a freshly
    pinned table a stream attaches to before the next commit).
    Timestamp columns normalize to microseconds (Spark's unit;
    parquet INT96 footers read as nanoseconds)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .inventory import _snapshot_files, list_versions

    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no versions under {table_dir}")
    schema = None
    for v in reversed(versions):
        files = change_log(table_dir, v)
        if files:
            schema = pq.read_schema(files[-1])
            break
    if schema is None:
        snap = _snapshot_files(table_dir, versions[-1])
        if not snap:
            raise FileNotFoundError(
                f"no data files in {table_dir}/{versions[-1]}"
            )
        schema = pq.read_schema(sorted(snap.values())[0])
        schema = schema.append(pa.field(CHANGE_TYPE_COL, pa.string()))
    fields = []
    for f in schema:
        if pa.types.is_timestamp(f.type) and f.type.unit != "us":
            f = f.with_type(pa.timestamp("us", tz=f.type.tz))
        fields.append(f)
    return pa.schema(fields)


def _stream_reader_cls():
    """Build the DataSource classes lazily: pyspark.sql.datasource
    exists on every supported pyspark here, but keeping the import out
    of module load keeps batch-only users decoupled from it."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _ChangeFilePartition(InputPartition):
        def __init__(self, path: str, seq: int, version: str):
            self.path, self.seq, self.version = path, seq, version

    class _VersionedChangesStreamReader(DataSourceStreamReader):
        """Offsets are the table's committed version SEQUENCE — the
        same monotone integer the exactly-once sinks key their
        watermarks on. ``partitions(start, end)`` lists the logged
        change files of versions in ``(start.seq, end.seq]`` (driver:
        marker JSON reads only); ``read`` opens ONE change file with
        pyarrow on the executor and yields its batches NULL-padded /
        cast to the stream schema — no join, no snapshot read, no
        Python row loop (Arrow batches end to end). Exactly-once falls
        out of Spark's offset log: a replayed range re-lists the same
        immutable files. Retention bounds recovery exactly like the
        cursor pump: a checkpoint older than ``keep_versions`` raises
        rather than silently skipping commits."""

        def __init__(self, spark_schema, options):
            self._table_dir = options.get("path")
            if not self._table_dir:
                raise ValueError(
                    "versioned_changes needs .option('path', table_dir)"
                )
            self._on_missing = options.get("onmissing", "fail")
            if self._on_missing not in ("fail", "skip"):
                raise ValueError(
                    f"onMissing must be fail|skip, got {self._on_missing!r}"
                )
            self._starting = options.get("startingversion", "latest")
            self._mode = options.get("mode", "rows")
            if self._mode not in ("rows", "paths"):
                raise ValueError(
                    f"mode must be rows|paths, got {self._mode!r}"
                )
            limit = options.get("maxcommitspertrigger")
            self._max_commits = int(limit) if limit else None
            if self._max_commits is not None and self._max_commits < 1:
                raise ValueError(
                    "maxCommitsPerTrigger must be >= 1, got "
                    f"{self._max_commits}"
                )
            # rate-limit bookkeeping: the end offset of the last range
            # partitions() planned. latestOffset() has no start
            # argument in this API, so the cap anchors here; the first
            # batch after a restart is uncapped (the anchor is unknown
            # until partitions() runs), every later batch advances at
            # most max_commits — the same first-batch caveat Delta's
            # option docs carry for restored streams.
            self._last_planned_end: int | None = None
            self._schema = spark_schema

        def initialOffset(self) -> dict:
            from .inventory import _current_version, list_versions

            if self._starting == "latest":
                cur = _current_version(self._table_dir)
                if cur is None:
                    raise FileNotFoundError(
                        f"no published snapshot under {self._table_dir}"
                    )
                return {"seq": _seq_of(cur)}
            if self._starting == "earliest":
                versions = list_versions(self._table_dir)
                if not versions:
                    raise FileNotFoundError(
                        f"no versions under {self._table_dir}"
                    )
                return {"seq": _seq_of(versions[0]) - 1}
            # explicit version sequence, INCLUSIVE (Delta's
            # startingVersion): offset sits just below it
            return {"seq": int(self._starting) - 1}

        def latestOffset(self) -> dict:
            from .inventory import _current_version

            cur = _current_version(self._table_dir)
            if cur is None:
                raise FileNotFoundError(
                    f"no published snapshot under {self._table_dir}"
                )
            seq = _seq_of(cur)
            if (
                self._max_commits is not None
                and self._last_planned_end is not None
            ):
                seq = min(seq, self._last_planned_end + self._max_commits)
            return {"seq": seq}

        def partitions(self, start: dict, end: dict):
            from .inventory import list_versions

            lo, hi = int(start["seq"]), int(end["seq"])
            self._last_planned_end = hi  # rate-limit anchor
            if hi <= lo:
                return []
            by_seq = {
                _seq_of(v): v for v in list_versions(self._table_dir)
            }
            parts = []
            for seq in range(lo + 1, hi + 1):
                v = by_seq.get(seq)
                if v is None:
                    raise FileNotFoundError(
                        f"commit seq {seq} is no longer retained under "
                        f"{self._table_dir} — retention outran the "
                        "stream's checkpoint; re-bootstrap from a "
                        "snapshot read"
                    )
                files = change_log(self._table_dir, v)
                if files is None:
                    if self._on_missing == "skip":
                        continue
                    raise FileNotFoundError(
                        f"{self._table_dir}/{v} logged no change data "
                        "(pre-pin commit or RESTORE) — hole in the "
                        "feed; .option('onMissing','skip') to read "
                        "past it"
                    )
                parts.extend(
                    _ChangeFilePartition(p, seq, v) for p in files
                )
            return parts

        def read(self, partition):
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            from pyspark.sql.pandas.types import to_arrow_schema

            if self._mode == "paths":
                # paths transport (round 13): one row per change FILE
                # — the Python data phase carries only metadata; the
                # consumer JVM-scans the named files (see
                # expand_change_paths), retiring the 5-10× Python
                # batch-transfer tax SCALING.md r12 measured
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([partition.path], pa.string()),
                        pa.array([partition.seq], pa.int64()),
                        pa.array([partition.version], pa.string()),
                    ],
                    names=[CHANGE_PATH_COL, COMMIT_SEQ_COL,
                           COMMIT_VERSION_COL],
                )
                return

            target = to_arrow_schema(self._schema)
            pf = pq.ParquetFile(partition.path)
            names = set(pf.schema_arrow.names)
            read_cols = [f.name for f in target if f.name in names]
            # stream row-group-sized batches instead of materializing
            # the file; constant columns build via fill_null over a
            # null array (C speed — the first cut's [value] * n Python
            # list measured 0.2M rows/s end to end, see SCALING.md)
            for batch in pf.iter_batches(columns=read_cols,
                                         batch_size=1 << 18):
                n = batch.num_rows
                by_name = {
                    name: batch.column(i)
                    for i, name in enumerate(batch.schema.names)
                }
                arrays = []
                for field in target:
                    if field.name == COMMIT_SEQ_COL:
                        arrays.append(pc.fill_null(
                            pa.nulls(n, pa.int64()), partition.seq
                        ))
                    elif field.name == COMMIT_VERSION_COL:
                        arrays.append(pc.fill_null(
                            pa.nulls(n, pa.string()), partition.version
                        ))
                    elif field.name in by_name:
                        col = by_name[field.name]
                        if col.type != field.type:
                            # evolution widened a type / INT96 read as
                            # ns: values originated in Spark, so the
                            # cast to Spark's own unit cannot truncate
                            col = col.cast(field.type, safe=False)
                        arrays.append(col)
                    else:
                        arrays.append(pa.nulls(n, field.type))
                yield pa.RecordBatch.from_arrays(arrays, schema=target)

        def commit(self, end: dict) -> None:
            pass  # retention, not the consumer, reclaims change logs

    class VersionedChangesDataSource(DataSource):
        """``spark.readStream.format("versioned_changes")`` — the
        versioned table's logged change feed as a native Structured
        Streaming source (the Delta CDF streaming-source analog).
        Options: ``path`` (table dir, required), ``startingVersion``
        (``latest`` default | ``earliest`` | an integer commit seq,
        inclusive), ``onMissing`` (``fail`` default | ``skip``),
        ``maxCommitsPerTrigger`` (bound each micro-batch to N source
        commits on a LONG-RUNNING trigger — a stream falling far behind
        must not plan one giant catch-up batch. The anchor is the last
        planned range, so the first batch after any (re)start is
        uncapped — the Python offset API gives latestOffset no start to
        cap against — which also means the AvailableNow single-batch
        fallback is always uncapped; use processingTime triggers when
        the limit matters).

        Schema is resolved at STREAM START (the most-evolved logged
        schema); change files from after a later evolution NULL-pad /
        cast to it, and columns added after the start are not surfaced
        until the stream restarts — restart to pick up evolution (the
        non-failing variant of Delta's stop-on-schema-change)."""

        @classmethod
        def name(cls) -> str:
            return "versioned_changes"

        def schema(self):
            import pyarrow as pa

            from pyspark.sql.pandas.types import from_arrow_schema
            from pyspark.sql.types import (
                LongType, StringType, StructField, StructType,
            )

            table_dir = self.options.get("path")
            if not table_dir:
                raise ValueError(
                    "versioned_changes needs .option('path', table_dir)"
                )
            if self.options.get("mode", "rows") == "paths":
                return StructType([
                    StructField(CHANGE_PATH_COL, StringType()),
                    StructField(COMMIT_SEQ_COL, LongType()),
                    StructField(COMMIT_VERSION_COL, StringType()),
                ])
            base = from_arrow_schema(_changes_arrow_schema(table_dir))
            return base.add(
                StructField(COMMIT_SEQ_COL, LongType())
            ).add(StructField(COMMIT_VERSION_COL, StringType()))

        def streamReader(self, schema):
            return _VersionedChangesStreamReader(schema, self.options)

    return VersionedChangesDataSource


def register_change_source(spark: SparkSession) -> None:
    """Register (or re-register) the ``versioned_changes`` streaming
    source on this session — idempotent."""
    spark.dataSource.register(_stream_reader_cls())


def read_changes_stream(
    spark: SparkSession,
    table_dir: str,
    starting: str | int = "latest",
    on_missing: str = "fail",
    max_commits_per_trigger: int | None = None,
    transport: str = "rows",
) -> DataFrame:
    """The logged change feed as a streaming DataFrame: registers the
    source and returns ``spark.readStream.format("versioned_changes")``
    over ``table_dir``. Compose with any Structured Streaming sink; for
    exactly-once materialization pair foreachBatch with the versioned
    writers' ``txn_app_id``/``txn_version`` as everywhere else.

    ``Trigger.AvailableNow`` note: Spark's Python-source wrapper
    (PythonMicroBatchStream) doesn't implement the AvailableNow
    capability, so Spark falls back to ONE batch spanning
    initial→latest — same data, one batch instead of several; the
    offset checkpoint and exactly-once restart semantics are unchanged
    (pinned in tests).

    ``transport`` (round 13): ``"rows"`` (default) streams the change
    ROWS through the Python source's Arrow batches — fully
    self-contained, any sink works. ``"paths"`` streams ONE ROW PER
    CHANGE FILE (``_cf_path, _commit_seq, _commit_version``) and the
    consumer expands them to rows with :func:`expand_change_paths`
    inside foreachBatch — the data phase becomes native JVM parquet
    scans, retiring the Python batch-transfer tax (SCALING.md r12
    measured the rows transport at 5-10× the JVM twin; the offset
    protocol, checkpointing and exactly-once semantics are identical
    because the file list per offset range is immutable)."""
    if transport not in ("rows", "paths"):
        raise ValueError(f"transport must be rows|paths, got {transport!r}")
    register_change_source(spark)
    reader = (
        spark.readStream.format("versioned_changes")
        .option("path", table_dir)
        .option("startingVersion", str(starting))
        .option("onMissing", on_missing)
        .option("mode", transport)
    )
    if max_commits_per_trigger is not None:
        reader = reader.option(
            "maxCommitsPerTrigger", str(max_commits_per_trigger)
        )
    return reader.load()


def expand_change_paths(
    spark: SparkSession, batch_df: DataFrame, table_dir: str
) -> DataFrame:
    """Turn a ``transport="paths"`` micro-batch into its change ROWS
    via native JVM parquet scans — call inside foreachBatch. The
    driver collects only the file list (churn-sized by construction:
    one row per logged change file in the batch's offset range), then
    plans ONE ``spark.read.parquet`` over every file with the schema
    pinned to the table's most-evolved LOGGED schema (earlier files'
    missing columns read as NULL — the same pad the rows transport
    applies), and attaches ``_commit_seq``/``_commit_version`` through
    a broadcast-joined path map. A catch-up batch from
    ``starting='earliest'`` over N retained commits therefore plans
    one scan, not an O(N)-deep unionByName chain with per-commit
    footer inference (round-13 advisory). An empty batch returns the
    typed empty frame; colliding file basenames (vanishing — Spark
    part names embed a per-job uuid) fall back to per-commit scans, as
    do batches whose files carry a PHYSICAL type narrower than the
    pinned schema (a type-widening merge_schema commit, e.g.
    float→double: older change files keep the narrow footer type and
    the single pinned scan would depend on the parquet reader's upcast
    support — the per-commit path infers each file's own type and
    coerces; round-14 advisory). The footer probe is metadata-only and
    churn-sized, same as the file-list collect."""
    import os

    from pyspark.sql.pandas.types import from_arrow_schema

    from .inventory import list_versions

    rows = batch_df.select(
        CHANGE_PATH_COL, COMMIT_SEQ_COL, COMMIT_VERSION_COL
    ).collect()
    if not rows:
        return _empty_changes_frame(
            spark, table_dir, list_versions(table_dir)
        )
    arrow_target = _changes_arrow_schema(table_dir)
    target = from_arrow_schema(arrow_target)
    by_base: dict[str, tuple[int, str]] = {}
    for r in rows:
        bn = os.path.basename(r[0])
        if bn in by_base:
            return _expand_per_commit(spark, rows, target)
        by_base[bn] = (int(r[1]), r[2])
    if any(
        _footer_type_drift(r[0], arrow_target) for r in rows
    ):
        return _expand_per_commit(spark, rows, target)
    scan = spark.read.schema(target).parquet(*[r[0] for r in rows])
    map_df = spark.createDataFrame(
        [(bn, seq, ver) for bn, (seq, ver) in by_base.items()],
        f"_cf_bn string, {COMMIT_SEQ_COL} long, "
        f"{COMMIT_VERSION_COL} string",
    )
    return scan.withColumn(
        "_cf_bn",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
    ).join(F.broadcast(map_df), on="_cf_bn").drop("_cf_bn")


def _footer_type_drift(path: str, arrow_target) -> bool:
    """True when a change file's parquet footer carries a field whose
    physical type differs from the pinned (most-evolved) schema —
    the type-widening shape the single pinned scan can't promise to
    upcast. Missing columns are NOT drift (they NULL-pad); timestamp
    units normalize to microseconds before comparing, mirroring
    :func:`_changes_arrow_schema`. Unreadable footers report drift so
    the conservative per-commit path handles them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        fschema = pq.read_schema(path)
    except Exception:  # noqa: BLE001 — conservative fallback
        return True
    for f in fschema:
        t = f.type
        if pa.types.is_timestamp(t) and t.unit != "us":
            t = pa.timestamp("us", tz=t.tz)
        idx = arrow_target.get_field_index(f.name)
        if idx >= 0 and not t.equals(arrow_target.field(idx).type):
            return True
    return False


def _expand_per_commit(spark: SparkSession, rows, target) -> DataFrame:
    """Fallback expansion: one scan per source commit with literal
    seq/version columns, NULL-padded to the logged schema and columns
    coerced (upcast) to the pinned types — a pre-widening commit's
    narrow physical column (e.g. float before a float→double
    merge_schema) reads with its own inferred type, then casts."""
    by_commit: dict[tuple[int, str], list[str]] = {}
    for r in rows:
        by_commit.setdefault((int(r[1]), r[2]), []).append(r[0])
    parts = []
    for (seq, version), paths in sorted(by_commit.items()):
        parts.append(
            spark.read.parquet(*paths)
            .withColumn(COMMIT_SEQ_COL, F.lit(seq).cast("long"))
            .withColumn(COMMIT_VERSION_COL, F.lit(version))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    for f in target.fields:
        if f.name not in out.columns:
            out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
        elif out.schema[f.name].dataType != f.dataType:
            out = out.withColumn(f.name, F.col(f.name).cast(f.dataType))
    return out

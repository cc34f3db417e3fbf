"""Table constraints for the versioned layer — Delta-parity CHECK
constraints and generated columns, enforced at commit time.

The reference hardcodes its row-validity rules inside the cleaning
pass (monarch_etl/cleaning.py:205-216 drops rows failing the
coordinate-range rule; the date-validity split works the same way) —
every pipeline that writes the table must remember to apply them.
This module turns the same idea into DECLARATIVE table metadata the
engine enforces on every versioned write, the way Delta's
``ALTER TABLE ... ADD CONSTRAINT ... CHECK (...)`` and generated
columns do:

* ``add_check_constraint`` first proves the CURRENT table satisfies
  the expression (one distributed aggregation — no collect), then
  publishes a METADATA-ONLY commit: the snapshot's files are
  re-linked zero-copy (:func:`..inventory._relink_snapshot`, the
  RESTORE building block) and a ``_constraints.json`` sidecar rides
  in the new version directory, so time travel sees each version's
  own constraint set and RESTORE adopts the restored version's.
* every subsequent ``upsert_parquet_versioned`` /
  ``upsert_parquet_versioned_partitioned`` evaluates ALL checks and
  generated-column invariants over the incoming batch in ONE
  aggregation pass (per-constraint violation counts as a single
  collected row — nothing row-sized reaches the driver) and refuses
  the commit on violation. Enforcement re-reads the sidecar on every
  CAS attempt, so a constraint added by a concurrent writer binds the
  retried merge — the serialization Delta's metadata-conflict
  detection provides.
* CHECK semantics are ANSI SQL (and Delta): a row violates only when
  the expression evaluates to FALSE; NULL/UNKNOWN passes. NOT NULL
  is therefore just ``CHECK (col IS NOT NULL)``.
* generated columns (``set_generated_column``): absent in a batch →
  computed from the expression; present → must satisfy
  ``col <=> (expr)`` (Delta's null-safe generated-column invariant).

Scale posture: validation is a map-side conjunction folded into one
``agg`` over the batch (whole-stage codegen, no shuffle beyond the
single partial-agg exchange); the metadata commit is O(files)
hardlinks / O(1) manifest, never a data rewrite.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CONSTRAINTS_SIDECAR = "_constraints.json"

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class ConstraintViolationError(ValueError):
    """A batch (or the existing table, for ADD CONSTRAINT) contains
    rows that violate a CHECK constraint or a generated-column
    invariant. Carries ``violations``: {constraint name: row count}."""

    def __init__(self, msg: str, violations: dict[str, int]):
        super().__init__(msg)
        self.violations = violations


def read_constraints(table_dir: str, version: str | None = None) -> dict:
    """The constraint set of ``version`` (default: CURRENT):
    ``{"checks": {name: sql_expr}, "generated": {col: sql_expr}}``.
    Missing sidecar / unpublished table → empty families."""
    from .inventory import _current_version

    empty = {"checks": {}, "generated": {}}
    if version is None:
        version = _current_version(table_dir)
    if version is None:
        return empty
    path = os.path.join(table_dir, version, _CONSTRAINTS_SIDECAR)
    if not os.path.exists(path):
        return empty
    with open(path) as f:
        raw = json.load(f)
    return {
        "checks": dict(raw.get("checks", {})),
        "generated": dict(raw.get("generated", {})),
    }


def carry_constraints(table_dir: str, version: str,
                      base_version: str | None) -> None:
    """Publish-time carry (:func:`..inventory._publish_version`):
    a data commit that didn't write its own constraint sidecar
    inherits the base snapshot's — dropping it would silently disarm
    enforcement. A version that DID write one (a constraint ALTER)
    keeps its own. Follows ``dv_base`` semantics: RESTORE passes the
    restored version, so a rollback adopts THAT constraint set."""
    if base_version is None:
        return
    dst = os.path.join(table_dir, version, _CONSTRAINTS_SIDECAR)
    if os.path.exists(dst):
        return
    src = os.path.join(table_dir, base_version, _CONSTRAINTS_SIDECAR)
    if not os.path.exists(src):
        return
    with open(src) as f:
        payload = f.read()
    tmp = os.path.join(table_dir, version,
                       f".{_CONSTRAINTS_SIDECAR}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, dst)


def _write_sidecar(table_dir: str, version: str, constraints: dict) -> None:
    tmp = os.path.join(table_dir, version,
                       f".{_CONSTRAINTS_SIDECAR}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        json.dump(constraints, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(table_dir, version, _CONSTRAINTS_SIDECAR))


def _check_violated(expr: str):
    """Column: TRUE iff a row VIOLATES the check — ANSI semantics,
    false-only (NULL passes)."""
    return ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))


def _generated_violated(col: str, expr: str):
    """Column: TRUE iff a provided generated-column value breaks the
    null-safe invariant ``col <=> (expr)``."""
    return ~F.col(col).eqNullSafe(F.expr(expr))


def _raise_if_violated(df: DataFrame, violated: dict[str, "F.Column"],
                       where: str) -> None:
    """ONE aggregation pass over ``df`` counting every constraint's
    violations (a single collected row — per-constraint longs, never
    row data); raises :class:`ConstraintViolationError` naming each
    violated constraint and its count."""
    if not violated:
        return
    counts = df.agg(*[
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(name)
        for name, cond in violated.items()
    ]).collect()[0].asDict()
    bad = {k: int(v) for k, v in counts.items() if v}
    if bad:
        detail = ", ".join(f"{k} ({v} rows)" for k, v in sorted(bad.items()))
        raise ConstraintViolationError(
            f"{where}: constraint violation — {detail}", bad
        )


def _resolves(df: DataFrame, cond) -> bool:
    """Whether ``cond`` analyzes against ``df``'s schema (no job —
    analysis only). Partial update batches (merge_schema contract:
    old columns SURVIVE a batch that stopped carrying them) may lack
    columns a constraint references."""
    try:
        df.select(cond)
        return True
    except Exception:
        return False


def _violation_conditions(updates: DataFrame, cons: dict):
    """(possibly-augmented updates, {name: violated-cond}) — generated
    columns computed when absent-and-resolvable, every resolvable rule
    as a never-NULL boolean condition (TRUE iff the row violates)."""
    checks, generated = cons["checks"], cons["generated"]
    violated: dict[str, "F.Column"] = {}
    for col, expr in sorted(generated.items()):
        if col in updates.columns:
            cond = _generated_violated(col, expr)
            if _resolves(updates, cond):
                violated[f"generated:{col}"] = cond
        elif _resolves(updates, F.expr(expr)):
            updates = updates.withColumn(col, F.expr(expr))
    for name, expr in sorted(checks.items()):
        cond = _check_violated(expr)
        if _resolves(updates, cond):
            violated[f"check:{name}"] = cond
    return updates, violated


def split_violations(spark: SparkSession, table_dir: str,
                     df: DataFrame, version: str | None = None
                     ) -> tuple[DataFrame, DataFrame]:
    """Quarantine splitter (the DLT expectation pattern's third mode):
    ``(clean, dirty)`` where ``dirty`` carries a ``_violations``
    column naming every rule each row breaks (comma-joined). Generated
    columns are computed on both sides exactly as the write path
    would. Feed ``clean`` to the upsert and ``dirty`` to a quarantine
    sink — same scale posture as enforcement (one codegen'd predicate,
    no extra shuffle)."""
    cons = read_constraints(table_dir, version)
    df, violated = _violation_conditions(df, cons)
    if not violated:
        return df, df.limit(0).withColumn("_violations", F.lit(""))
    from functools import reduce
    from operator import or_

    any_bad = reduce(or_, violated.values())
    tags = F.concat_ws(",", *[
        F.when(cond, F.lit(name)) for name, cond in sorted(violated.items())
    ])
    return (
        df.filter(~any_bad),
        df.filter(any_bad).withColumn("_violations", tags),
    )


def enforce_constraints(spark: SparkSession, table_dir: str,
                        base_version: str | None,
                        updates: DataFrame,
                        on_violation: str = "fail") -> DataFrame:
    """The write-path hook: apply/validate generated columns, then
    validate every CHECK over the batch — one aggregation job total.
    Reads the sidecar of the CAS base each attempt so a concurrently
    added constraint binds the retried merge. Fast path: no sidecar →
    the batch passes through untouched (one ``os.path`` probe).

    Partial batches (the merge_schema contract: a batch may stop
    carrying columns, whose old values then survive the merge)
    validate WHAT THEY CARRY: a check or generated-column rule whose
    expression does not resolve against the batch schema is skipped
    for that batch — sound because a matched row's surviving column
    values were validated when they were written, and an inserted
    row's absent column is NULL, which passes ANSI CHECK semantics.
    (Round-15 review finding: unconditional evaluation bricked
    previously-legal partial-batch writes with an analysis error.)

    ``on_violation`` (the DLT expectation modes): ``"fail"`` (default,
    Delta CHECK semantics) refuses the whole commit; ``"drop"``
    filters violating rows out and commits the rest — the operative
    posture for always-on streaming ingestion, where one bad record
    must not kill the pipeline (pair with :func:`split_violations`
    for a quarantine sink instead of silent drops)."""
    if on_violation not in ("fail", "drop"):
        raise ValueError(
            f"on_violation must be fail|drop, got {on_violation!r}"
        )
    cons = read_constraints(table_dir, base_version)
    if not cons["checks"] and not cons["generated"]:
        return updates
    updates, violated = _violation_conditions(updates, cons)
    if not violated:
        return updates
    if on_violation == "drop":
        from functools import reduce
        from operator import or_

        return updates.filter(~reduce(or_, violated.values()))
    _raise_if_violated(updates, violated, table_dir)
    return updates


def _metadata_commit(spark: SparkSession, table_dir: str, mutate,
                     operation: str, keep_versions: int,
                     validate=None) -> dict:
    """Publish a METADATA-ONLY commit: re-link the CURRENT snapshot
    zero-copy into a new version, write the mutated constraint
    sidecar, and CAS-publish. ``validate(current_version, constraints)``
    runs per attempt BEFORE the link (ADD CONSTRAINT proves the
    existing data satisfies the new rule against the same base the
    commit will CAS on). CDC-pinned tables log a provably-empty change
    commit — a constraint ALTER changes no visible rows."""
    import shutil

    from .cdc import resolve_cdc, write_change_log
    from .inventory import (
        ConcurrentWriteError,
        _publish_version,
        _read_commit_state,
        _relink_snapshot,
    )

    last_err: ConcurrentWriteError | None = None
    for _attempt in range(3):
        try:
            current, marks = _read_commit_state(table_dir)
        except ConcurrentWriteError as err:
            last_err = err
            continue
        if current is None:
            raise FileNotFoundError(
                f"no published snapshot under {table_dir} — constraints "
                "attach to an existing versioned table"
            )
        cons = read_constraints(table_dir, current)
        cons = mutate(cons)
        if validate is not None:
            validate(current, cons)
        seq = int(current.split("-")[1]) + 1
        new_version = f"v-{seq:06d}-{uuid.uuid4().hex[:8]}"
        _relink_snapshot(table_dir, current, new_version)
        _write_sidecar(table_dir, new_version, cons)
        if resolve_cdc(table_dir, None):
            write_change_log(table_dir, new_version, None)
        try:
            _publish_version(table_dir, new_version, marks, keep_versions,
                             expected_base=current, operation=operation,
                             dv_base=current)
            return cons
        except ConcurrentWriteError as err:
            shutil.rmtree(os.path.join(table_dir, new_version),
                          ignore_errors=True)
            last_err = err
    raise last_err  # pragma: no cover - loop always sets it


def _require_name(name: str) -> None:
    if not _NAME_RE.match(name or ""):
        raise ValueError(
            f"constraint name {name!r} must be an identifier "
            "([A-Za-z_][A-Za-z0-9_]*)"
        )


def add_check_constraint(spark: SparkSession, table_dir: str, name: str,
                         expr: str, keep_versions: int = 2) -> dict:
    """Delta's ``ALTER TABLE ADD CONSTRAINT name CHECK (expr)``:
    proves every CURRENT row satisfies ``expr`` (one distributed agg),
    then publishes the metadata-only commit. Raises
    :class:`ConstraintViolationError` if existing rows violate,
    ``ValueError`` on a duplicate name or unparseable expression."""
    from .inventory import read_versioned

    _require_name(name)
    F.expr(expr)  # parse eagerly — reject garbage before any commit

    def mutate(cons: dict) -> dict:
        if name in cons["checks"]:
            raise ValueError(
                f"check constraint {name!r} already exists on {table_dir} "
                f"({cons['checks'][name]!r}); DROP it first"
            )
        cons["checks"][name] = expr
        return cons

    def validate(current: str, cons: dict) -> None:
        # pinned to the CAS base: validating whatever CURRENT resolves
        # to mid-flight would be either the same version (fine) or a
        # newer one (the publish CAS would fail anyway) — pinning makes
        # the proof and the commit base one and the same
        _raise_if_violated(
            read_versioned(spark, table_dir, version=current),
            {f"check:{name}": _check_violated(expr)},
            f"{table_dir} ADD CONSTRAINT {name}",
        )

    return _metadata_commit(spark, table_dir, mutate,
                            f"ADD CONSTRAINT {name}", keep_versions,
                            validate=validate)


def drop_check_constraint(spark: SparkSession, table_dir: str, name: str,
                          keep_versions: int = 2) -> dict:
    """``ALTER TABLE DROP CONSTRAINT name`` — unknown names raise
    ``KeyError`` (Delta errors likewise without IF EXISTS)."""

    def mutate(cons: dict) -> dict:
        if name not in cons["checks"]:
            raise KeyError(
                f"no check constraint {name!r} on {table_dir} "
                f"(have: {sorted(cons['checks'])})"
            )
        del cons["checks"][name]
        return cons

    return _metadata_commit(spark, table_dir, mutate,
                            f"DROP CONSTRAINT {name}", keep_versions)


def set_generated_column(spark: SparkSession, table_dir: str, col: str,
                         expr: str, keep_versions: int = 2) -> dict:
    """Declare ``col`` GENERATED ALWAYS AS (expr): future batches that
    omit it get it computed; batches that provide it must satisfy the
    null-safe invariant ``col <=> (expr)``. The column must exist in
    the CURRENT snapshot and every existing row must already satisfy
    the invariant (proven with one agg before the commit)."""
    from .inventory import read_versioned

    _require_name(col)
    F.expr(expr)

    def mutate(cons: dict) -> dict:
        cons["generated"][col] = expr
        return cons

    def validate(current: str, cons: dict) -> None:
        table = read_versioned(spark, table_dir, version=current)
        if col not in table.columns:
            raise ValueError(
                f"generated column {col!r} not in {table_dir}'s schema "
                f"{table.columns} — generated columns attach to an "
                "existing column"
            )
        _raise_if_violated(
            table,
            {f"generated:{col}": _generated_violated(col, expr)},
            f"{table_dir} SET GENERATED {col}",
        )

    return _metadata_commit(spark, table_dir, mutate,
                            f"SET GENERATED {col}", keep_versions,
                            validate=validate)


def drop_generated_column(spark: SparkSession, table_dir: str, col: str,
                          keep_versions: int = 2) -> dict:
    """Remove ``col``'s generated-column invariant (the column and its
    data stay — only the write-time rule is dropped)."""

    def mutate(cons: dict) -> dict:
        if col not in cons["generated"]:
            raise KeyError(
                f"no generated column {col!r} on {table_dir} "
                f"(have: {sorted(cons['generated'])})"
            )
        del cons["generated"][col]
        return cons

    return _metadata_commit(spark, table_dir, mutate,
                            f"DROP GENERATED {col}", keep_versions)

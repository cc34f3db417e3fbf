"""Deletion vectors (round 13) — merge-on-read deletes, the Delta
deletion-vector analog: ``delete_versioned(dv=True)`` publishes a
``.dv/`` sidecar of (file identity, row index) pairs instead of
rewriting data files; every reader anti-joins it, every writer carries
surviving entries forward, and rewriting maintenance purges it.

Reference parity note: the reference engine deletes via Postgres
DELETE (monarch_etl/inventory.py); this mode is part of the 100 TB
surface the Spark build adds — a small erasure writes kilobytes where
even copy-on-write rewrites whole files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark import inventory as inv
from animaltrackingetls_spark.inventory import (
    clone_versioned,
    compact_versioned,
    delete_versioned,
    list_versions,
    optimize_versioned,
    read_versioned,
    restore_versioned,
    upsert_parquet_versioned,
)


def _rows(df, *cols):
    return sorted((tuple(r) for r in df.select(*cols).collect()), key=repr)


def _mk(spark, tmp_path, name="t", n=1000, files=4, **kw):
    t = str(tmp_path / name)
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        F.col("id").cast("double").alias("x"),
    )
    upsert_parquet_versioned(spark, t, df, ["k"], keep_versions=10,
                             target_files=files, **kw)
    return t


def _dele(spark, t, ks, **kw):
    return delete_versioned(
        spark, t, spark.createDataFrame([(k,) for k in ks], "k long"),
        ["k"], keep_versions=10, **kw)


def test_dv_delete_semantics_and_zero_rewrite(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = list_versions(t)[-1]
    files_before = set(inv._snapshot_files(t, v1).values())
    idents_before = {(os.stat(p).st_ino, os.stat(p).st_size)
                     for p in files_before}

    _dele(spark, t, range(0, 100, 10), dv=True)
    v2 = list_versions(t)[-1]
    got = read_versioned(spark, t)
    assert got.count() == 990
    assert got.filter(F.col("k").isin(list(range(0, 100, 10)))).count() == 0
    # zero data-file rewrites: every file of v2 shares physical
    # identity with v1 (the whole point of merge-on-read)
    idents_after = {
        (os.stat(p).st_ino, os.stat(p).st_size)
        for p in inv._snapshot_files(t, v2).values()
    }
    assert idents_after == idents_before
    assert inv._dv_files(t, v2)  # the sidecar is the only new content
    # time travel: the pre-delete snapshot still reads in full
    assert read_versioned(spark, t, v1).count() == 1000
    # equality with the rewrite-based delete on a twin table
    t2 = _mk(spark, tmp_path, "twin")
    _dele(spark, t2, range(0, 100, 10))
    assert _rows(read_versioned(spark, t), "k", "g", "x") == \
        _rows(read_versioned(spark, t2), "k", "g", "x")


def test_dv_accumulates_and_writers_carry(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _dele(spark, t, [1, 2], dv=True)
    _dele(spark, t, [3], dv=True)  # second DV unions with the first
    assert read_versioned(spark, t).count() == 997

    # a CoW upsert on a DV table: rewritten file loses its entries
    # (rows merged DV-filtered), carried files keep theirs — deleted
    # rows never resurrect
    upsert_parquet_versioned(
        spark, t,
        spark.createDataFrame([(10, 0, 10.5), (2000, 1, 1.0)],
                              "k long, g long, x double"),
        ["k"], keep_versions=10, cow=True)
    r = read_versioned(spark, t)
    assert r.count() == 998  # 997 + 1 insert, update in place
    assert r.filter("k in (1, 2, 3)").count() == 0
    assert r.filter("k = 10").first().x == 10.5

    # plain full-rewrite upsert drops the DV entirely (nothing carries)
    upsert_parquet_versioned(
        spark, t,
        spark.createDataFrame([(2001, 1, 1.0)], "k long, g long, x double"),
        ["k"], keep_versions=10)
    v = list_versions(t)[-1]
    assert not inv._dv_files(t, v)
    assert read_versioned(spark, t).filter("k in (1,2,3)").count() == 0


def test_dv_cdc_and_derived_diff_see_the_delete(spark, tmp_path):
    from animaltrackingetls_spark.cdc import read_change_data
    from animaltrackingetls_spark.operators.versioning import table_changes

    t = _mk(spark, tmp_path, write_change_data=True, cow=True)
    v1 = list_versions(t)[-1]
    _dele(spark, t, [5, 6], dv=True)
    v2 = list_versions(t)[-1]
    # the derived diff runs through identity churn pruning — which must
    # NOT treat the identically-shared files as unchanged (their DV
    # entry sets differ)
    d = table_changes(spark, t, ["k"], v1, v2)
    assert _rows(d, "k", "change") == [(5, "removed"), (6, "removed")]
    # the logged feed carries the doomed preimages
    feed = read_change_data(spark, t, v1, v2)
    assert _rows(feed, "k", "_change_type") == [(5, "delete"),
                                                (6, "delete")]


def test_dv_purged_by_rewriting_maintenance(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _dele(spark, t, [7, 8], dv=True)
    compact_versioned(spark, t, keep_versions=10)
    v = list_versions(t)[-1]
    assert not inv._dv_files(t, v)  # REORG PURGE: deletes materialized
    assert read_versioned(spark, t).count() == 998
    _dele(spark, t, [9], dv=True)
    optimize_versioned(spark, t, ["k"], keep_versions=10)
    v = list_versions(t)[-1]
    assert not inv._dv_files(t, v)
    assert read_versioned(spark, t).count() == 997


def test_dv_restore_and_clone_adopt_the_right_dv(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _dele(spark, t, [1], dv=True)
    v_dv = list_versions(t)[-1]
    _dele(spark, t, [2], dv=True)

    # RESTORE to the one-delete version: exactly k=1 missing (CURRENT's
    # larger DV must not leak into the restored snapshot)
    restore_versioned(spark, t, v_dv, keep_versions=10)
    r = read_versioned(spark, t)
    assert r.count() == 999
    assert r.filter("k = 2").count() == 1 and r.filter("k = 1").count() == 0

    # CLONE of a DV-bearing snapshot carries its deletions
    c = str(tmp_path / "clone")
    clone_versioned(spark, t, c)
    assert read_versioned(spark, c).count() == 999
    assert read_versioned(spark, c).filter("k = 1").count() == 0


def test_dv_stats_pruned_read_applies_dv(spark, tmp_path):
    t = _mk(spark, tmp_path, n=60_000, files=6)
    optimize_versioned(spark, t, ["k"], target_bytes=60_000,
                       keep_versions=10)
    _dele(spark, t, [5, 100_000_000], dv=True)  # absent key no-ops
    pruned = read_versioned(spark, t, predicates=[("k", "<", 100)])
    assert pruned.count() == 99  # k=5 deleted, stats-pruned path too
    kept, total = inv.files_scanned(t, predicates=[("k", "<", 100)])
    assert kept < total  # skipping still works on a DV table


def test_dv_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="mutually exclusive"):
        _dele(spark, t, [1], dv=True, cow=True)
    # bucketed tables refuse dv
    tb = str(tmp_path / "b")
    df = spark.range(0, 100).select(F.col("id").alias("k"),
                                    F.col("id").cast("double").alias("x"))
    inv.upsert_parquet_versioned_partitioned(
        spark, tb, df, ["k"], n_buckets=4, keep_versions=10)
    with pytest.raises(ValueError, match="plain tables only"):
        _dele(spark, tb, [1], dv=True)


def test_dv_null_keys_deletable(spark, tmp_path):
    t = str(tmp_path / "t")
    upsert_parquet_versioned(
        spark, t,
        spark.createDataFrame([(1, "a"), (None, "n"), (2, "b")],
                              "k int, v string"),
        ["k"], keep_versions=10)
    delete_versioned(
        spark, t, spark.createDataFrame([(None,)], "k int"), ["k"],
        keep_versions=10, dv=True)
    assert _rows(read_versioned(spark, t), "k", "v") == [
        (1, "a"), (2, "b")]


def test_dv_watermark_replay_no_op(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _dele(spark, t, [1], dv=True, txn_app_id="er", txn_version=1)
    n_vers = len(list_versions(t))
    _dele(spark, t, [2], dv=True, txn_app_id="er", txn_version=1)  # replay
    assert len(list_versions(t)) == n_vers
    assert read_versioned(spark, t).count() == 999  # k=2 NOT deleted


def test_dv_describe_history_stamp(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _dele(spark, t, [1, 2, 3], dv=True)
    hist = inv.describe_history(spark, t).collect()
    ops = [r["operation"] for r in hist]
    assert "DELETE (dv)" in ops
    by_op = {r["operation"]: r for r in hist}
    assert by_op["DELETE (dv)"]["dv_rows"] == 3
    assert by_op["MERGE"]["dv_rows"] == 0


def test_dv_manifest_mode(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("x"))
    upsert_parquet_versioned(spark, t, df, ["k"], keep_versions=10,
                             target_files=4, cow=True,
                             link_mode="manifest")
    _dele(spark, t, [1, 2], dv=True)
    assert read_versioned(spark, t).count() == 998
    # another manifest-carried commit keeps the DV
    upsert_parquet_versioned(
        spark, t, spark.createDataFrame([(5000, 5.0)], "k long, x double"),
        ["k"], keep_versions=10, cow=True)
    r = read_versioned(spark, t)
    assert r.count() == 999 and r.filter("k in (1,2)").count() == 0


def test_dv_delete_where(spark, tmp_path):
    """Predicate DV delete: SQL DELETE semantics (NULL predicate rows
    kept), equality with the rewrite form, CDC visibility, retention
    shape (DELETE WHERE ts < cutoff as a zero-rewrite commit)."""
    from animaltrackingetls_spark.cdc import read_change_data
    from animaltrackingetls_spark.inventory import delete_versioned_where

    t = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id").cast("double")).alias("x"),
    )
    upsert_parquet_versioned(spark, t, df, ["k"], keep_versions=10,
                             target_files=4, write_change_data=True)
    v1 = list_versions(t)[-1]
    files_before = {
        (os.stat(p).st_ino, os.stat(p).st_size)
        for p in inv._snapshot_files(t, v1).values()
    }
    delete_versioned_where(spark, t, "x < 100", keep_versions=10, dv=True)
    v2 = list_versions(t)[-1]
    got = read_versioned(spark, t)
    # x < 100 is NULL for the NULL-x rows -> they are KEPT
    assert got.count() == 1000 - 90  # 99 matched minus 9 NULL-skipped
    assert got.filter("x < 100").count() == 0
    assert got.filter("x is null").count() == 100
    # zero rewrites
    assert {
        (os.stat(p).st_ino, os.stat(p).st_size)
        for p in inv._snapshot_files(t, v2).values()
    } == files_before
    # CDC logged the doomed preimages
    feed = read_change_data(spark, t, v1, v2)
    assert feed.count() == 90
    assert set(r[0] for r in feed.select("_change_type").distinct()
               .collect()) == {"delete"}
    # equality with the rewrite form on a twin
    t2 = str(tmp_path / "t2")
    upsert_parquet_versioned(spark, t2, df, ["k"], keep_versions=10,
                             target_files=4)
    delete_versioned_where(spark, t2, "x < 100", keep_versions=10)
    assert _rows(read_versioned(spark, t), "k", "x") == \
        _rows(read_versioned(spark, t2), "k", "x")
    # guards
    with pytest.raises(ValueError, match="mutually exclusive"):
        delete_versioned_where(spark, t, "x < 0", dv=True,
                               key_range=(0, 1))
    ops = [r["operation"] for r in inv.describe_history(spark, t).collect()]
    assert "DELETE WHERE (dv)" in ops


def test_dv_source_drives_cdc_pump_and_replication(spark, tmp_path):
    """A CDC-pinned table whose history includes DV deletes feeds the
    pump's logged fast path and the streaming replication identically
    to rewrite deletes — the change log is the contract, the delete
    mode is invisible downstream."""
    from animaltrackingetls_spark.cdc import resolve_cdc
    from animaltrackingetls_spark.operators.versioning import (
        pump_changes_once,
    )
    from animaltrackingetls_spark.streaming.jobs import (
        run_changes_replication,
    )

    src = str(tmp_path / "src")
    resolve_cdc(src, True)
    upsert_parquet_versioned(
        spark, src,
        spark.createDataFrame([(i, f"v{i}") for i in range(20)],
                              "k int, v string"),
        ["k"], keep_versions=10, cow=True)

    # pump bootstrap, then a DV delete + an upsert in one window
    dst, cur = str(tmp_path / "dst"), str(tmp_path / "cur")
    r = pump_changes_once(spark, src, dst, cur, ["k"])
    assert r["source"] == "bootstrap"
    delete_versioned(spark, src, spark.createDataFrame(
        [(3,), (4,)], "k int"), ["k"], keep_versions=10, dv=True)
    upsert_parquet_versioned(
        spark, src, spark.createDataFrame([(5, "V5"), (50, "v50")],
                                          "k int, v string"),
        ["k"], keep_versions=10, cow=True)
    r = pump_changes_once(spark, src, dst, cur, ["k"])
    assert r["source"] == "logged" and r["removed"] == 2
    assert _rows(read_versioned(spark, dst), "k", "v") == \
        _rows(read_versioned(spark, src), "k", "v")

    # streaming replication from scratch across the same history
    dst2, ck = str(tmp_path / "dst2"), str(tmp_path / "ck")
    run_changes_replication(spark, src, dst2, ck, ["k"])
    assert _rows(read_versioned(spark, dst2), "k", "v") == \
        _rows(read_versioned(spark, src), "k", "v")


def test_row_index_stable_under_rowgroup_skipping(spark, tmp_path):
    """The DV foundation: ``_metadata.row_index`` must report the same
    per-file physical position whether or not predicate pushdown skips
    row groups — otherwise a selective read over a DV table would
    anti-join the wrong rows. Pinned on a many-row-group file with a
    filter that provably skips the leading groups."""
    import pyarrow.parquet as pq

    p = str(tmp_path / "f")
    (
        spark.range(0, 200_000)
        .select(F.col("id"), F.md5(F.col("id").cast("string")).alias("pad"))
        .coalesce(1).write.option("parquet.block.size", 64 * 1024)
        .parquet(p)
    )
    f = [os.path.join(p, x) for x in os.listdir(p)
         if x.startswith("part-")][0]
    assert pq.ParquetFile(f).metadata.num_row_groups > 10
    full = {
        r.id: r.ri for r in spark.read.parquet(p)
        .select("id", F.col("_metadata.row_index").alias("ri")).collect()
    }
    sel = (
        spark.read.parquet(p).filter("id >= 190000")
        .select("id", F.col("_metadata.row_index").alias("ri")).collect()
    )
    assert len(sel) == 10_000
    assert all(full[r.id] == r.ri for r in sel)

    # and end to end: a DV delete stays exact under a selective read
    t = str(tmp_path / "t")
    df = spark.range(0, 50_000).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("x"))
    upsert_parquet_versioned(spark, t, df, ["k"], keep_versions=5,
                             target_files=3)
    _dele(spark, t, [49_999, 49_998], dv=True)
    got = read_versioned(spark, t).filter("k >= 49990")
    assert got.count() == 8


def test_dv_summary_sidecar_written_and_carried(spark, tmp_path):
    """Round 14: every DV writer publishes a ``_summary.json`` beside
    the parquet — per-file-identity row counts + content digests — so
    churn pruning and read planning are O(files) on the driver, never
    O(deleted rows)."""
    import json

    t = _mk(spark, tmp_path)
    _dele(spark, t, [1, 2, 3], dv=True)
    v = list_versions(t)[-1]
    sp = os.path.join(inv._dv_path(t, v), inv._DV_SUMMARY)
    assert os.path.exists(sp)
    with open(sp) as f:
        s = json.load(f)
    assert sum(e["rows"] for e in s["entries"].values()) == 3
    # a carrying commit (CoW upsert) writes a fresh summary for the
    # filtered carry
    upsert_parquet_versioned(
        spark, t,
        spark.createDataFrame([(500, 0, 1.0)], "k long, g long, x double"),
        ["k"], keep_versions=10, cow=True)
    v2 = list_versions(t)[-1]
    assert os.path.exists(os.path.join(inv._dv_path(t, v2),
                                       inv._DV_SUMMARY))
    # digest equality == row-set equality: the carried summary matches
    # the original for file identities that survived
    s2 = inv._dv_summary(t, v2)
    s1 = inv._dv_summary(t, v)
    for ident, e in s2.items():
        assert s1[ident]["digest"] == e["digest"]
    # pre-summary sidecar (older table) falls back to recompute
    os.unlink(os.path.join(inv._dv_path(t, v2), inv._DV_SUMMARY))
    assert inv._dv_summary(t, v2) == s2


def test_dv_read_scoped_to_affected_files(spark, tmp_path, monkeypatch):
    """Round 14 (r13 verdict #2): only files that actually carry DV
    entries pay the DV tax — clean files scan plain. A small DV
    (total rows <= _DV_INLINE_MAX) inlines per-file NOT-IN row-index
    filters: 2 parquet scans, ZERO joins; a large DV falls back to
    the scoped broadcast anti-join (pinned by forcing the cap to 0).
    A stats-pruned read that excludes the affected file carries no DV
    machinery at all."""
    t = _mk(spark, tmp_path)  # range(0,1000) split over 4 files
    _dele(spark, t, range(6), dv=True)  # all doomed keys in file 1
    v = list_versions(t)[-1]
    ident, affected, dvsum = inv._dv_resolved(t, v)
    assert len(ident) == 4 and len(affected) == 1
    assert sum(e["rows"] for e in dvsum.values()) == 6

    r = read_versioned(spark, t)
    assert r.count() == 994
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2  # clean branch + affected
    assert "BroadcastHashJoin" not in plan  # inlined InSet filter

    # the join fallback (DV too big to inline) stays scoped and exact
    monkeypatch.setattr(inv, "_DV_INLINE_MAX", 0)
    rj = read_versioned(spark, t)
    assert rj.count() == 994
    jplan = rj._jdf.queryExecution().executedPlan().toString()
    assert jplan.count("Scan parquet") == 3  # + the DV sidecar scan
    assert jplan.count("BroadcastHashJoin") == 2  # ident map + anti
    monkeypatch.undo()

    # predicate read whose surviving files are all clean: no DV filter
    pruned = read_versioned(spark, t, predicates=[("k", ">", 800)])
    assert pruned.count() == 199
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in pplan
    # and a pruned read that DOES include the affected file stays exact
    lo = read_versioned(spark, t, predicates=[("k", "<", 100)])
    assert lo.count() == 94

    # FILE-COUNT axis (round 15 — r14 verdict #3): a wide-churn small
    # DV (rows under the 16k cap but spread over more files than
    # _DV_INLINE_MAX_FILES) must pick the single-scan broadcast
    # anti-join, not build one scan branch + one NOT-IN per file —
    # plan width, not data, is the cost there
    t2 = _mk(spark, tmp_path, name="wide", n=1000, files=4)
    v0 = list_versions(t2)[-1]
    by_f = _keys_by_file(spark, t2, v0)
    doomed = [ks[0] for ks in by_f.values()]  # 1 key in EVERY file
    _dele(spark, t2, doomed, dv=True)
    monkeypatch.setattr(inv, "_DV_INLINE_MAX_FILES", 2)
    rw = read_versioned(spark, t2)
    assert rw.count() == 1000 - len(doomed)
    wplan = rw._jdf.queryExecution().executedPlan().toString()
    assert wplan.count("BroadcastHashJoin") == 2  # the join fallback
    monkeypatch.undo()
    # above the (restored) 64-file cap threshold, 4 files inline again
    ri = read_versioned(spark, t2)
    assert ri.count() == 1000 - len(doomed)
    iplan = ri._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in iplan


def test_dv_orphaned_identities_fail_closed(spark, tmp_path):
    """Round 14 (r13 ADVICE medium): DV identities are (inode, size);
    an inode-changing but content-preserving copy of the table dir
    (cp/rsync restore) orphans every entry, and a read that silently
    dropped them would RESURRECT deleted rows. The read must fail
    closed instead."""
    import shutil

    t = _mk(spark, tmp_path)
    _dele(spark, t, [1, 2], dv=True)
    assert read_versioned(spark, t).count() == 998

    c = str(tmp_path / "copied")
    shutil.copytree(t, c)  # fresh inodes for every data file
    with pytest.raises(RuntimeError, match="fails closed"):
        read_versioned(spark, c).count()
    # the original table is untouched and still reads DV-filtered
    assert read_versioned(spark, t).count() == 998


def _keys_by_file(spark, t, v):
    rows = (
        inv._snapshot_df(spark, t, v, identity=True)
        .select("k", inv._DV_FP_COL).collect()
    )
    by_f: dict = {}
    for r in rows:
        by_f.setdefault(r[1], []).append(r[0])
    return {f: sorted(ks) for f, ks in by_f.items()}


def test_reorg_purge_density_targeting(spark, tmp_path):
    """Round 14 (r13 verdict #3): REORG PURGE rewrites exactly the
    files whose DV density crosses the threshold; below-threshold
    files carry untouched WITH their DV entries (partial purge exact);
    a full purge drops the sidecar entirely."""
    from animaltrackingetls_spark.inventory import reorg_purge_versioned

    t = _mk(spark, tmp_path)
    v0 = list_versions(t)[-1]
    by_f = _keys_by_file(spark, t, v0)
    files = sorted(by_f)
    dense = by_f[files[0]][: int(len(by_f[files[0]]) * 0.6)]
    sparse = by_f[files[1]][:5]
    _dele(spark, t, dense + sparse, dv=True)

    r = reorg_purge_versioned(spark, t, min_density=0.5, keep_versions=10)
    assert r["purged"] and r["purged_files"] == 1
    assert r["dv_rows_purged"] == len(dense)
    v2 = list_versions(t)[-1]
    left = inv._dv_summary(t, v2)
    assert sum(e["rows"] for e in left.values()) == len(sparse)
    got = read_versioned(spark, t)
    assert got.count() == 1000 - len(dense) - len(sparse)
    assert got.filter(F.col("k").isin(dense + sparse)).count() == 0
    # untouched files keep their physical identity across the purge
    idents = lambda v: {  # noqa: E731
        os.path.basename(p): (os.stat(p).st_ino, os.stat(p).st_size)
        for p in inv._snapshot_files(t, v).values()
    }
    shared = set(idents(v2).items()) & set(idents(v0).items())
    assert len(shared) == 3  # all but the purged file

    # threshold-0 purge: everything DV-carrying rewrites, DV gone
    r2 = reorg_purge_versioned(spark, t, keep_versions=10)
    assert r2["purged"] and r2["purged_files"] == 1
    v3 = list_versions(t)[-1]
    assert not inv._dv_files(t, v3)
    assert read_versioned(spark, t).count() == 1000 - len(dense) - len(sparse)
    # no-op when no DV remains
    assert reorg_purge_versioned(spark, t, keep_versions=10)["purged"] is False


def test_reorg_purge_unknown_rows_reads_footer(spark, tmp_path):
    """Round-14 advisory (low): a missing/stale stats sidecar must NOT
    make every DV-carrying file look fully dense — that silently
    degenerates merge-on-read into copy-on-write on every auto_compact
    commit. With the sidecar gone, the planner reads the parquet
    footer's num_rows (metadata only) and a 2%-dense file stays
    untouched at min_density=0.5."""
    from animaltrackingetls_spark.inventory import reorg_purge_versioned

    t = _mk(spark, tmp_path)
    v0 = list_versions(t)[-1]
    by_f = _keys_by_file(spark, t, v0)
    sparse = by_f[sorted(by_f)[0]][:5]  # ~2% of one file's rows
    _dele(spark, t, sparse, dv=True)
    v1 = list_versions(t)[-1]
    # kill the stats sidecar: the density planner has no rows_of map
    from animaltrackingetls_spark import filestats

    sidecar = os.path.join(t, v1, filestats.STATS_SIDECAR)
    if os.path.exists(sidecar):
        os.remove(sidecar)
    assert filestats.read_stats(t, v1) is None

    r = reorg_purge_versioned(spark, t, min_density=0.5, keep_versions=10)
    assert r["purged"] is False and r["purged_files"] == 0
    # DV intact, read still correct
    assert inv._dv_files(t, list_versions(t)[-1])
    assert read_versioned(spark, t).count() == 1000 - len(sparse)
    # explicit full REORG still rewrites it (threshold 0)
    r2 = reorg_purge_versioned(spark, t, keep_versions=10)
    assert r2["purged"] and r2["purged_files"] == 1


def test_reorg_purge_auto_trigger(spark, tmp_path):
    """The auto-compaction hook self-heals the DV read tax: a commit
    with ``auto_compact`` set purges files past _DV_PURGE_DENSITY."""
    t = _mk(spark, tmp_path, cow=True)
    v0 = list_versions(t)[-1]
    by_f = _keys_by_file(spark, t, v0)
    f0 = sorted(by_f)[0]
    dense = by_f[f0][: int(len(by_f[f0]) * 0.7)]
    _dele(spark, t, dense, dv=True)
    assert inv._dv_files(t, list_versions(t)[-1])

    upsert_parquet_versioned(
        spark, t,
        spark.createDataFrame([(5000, 0, 1.0)], "k long, g long, x double"),
        ["k"], keep_versions=10, cow=True, auto_compact=999)
    v = list_versions(t)[-1]
    assert not inv._dv_files(t, v)  # purged by the density trigger
    ops = [r["operation"] for r in inv.describe_history(spark, t).collect()]
    assert "REORG (purge)" in ops
    got = read_versioned(spark, t)
    assert got.count() == 1000 - len(dense) + 1
    assert got.filter(F.col("k").isin(dense)).count() == 0


def test_mor_update_equality_with_cow(spark, tmp_path):
    """Round 14 (r13 verdict #4): merge-on-read UPDATE — matched
    preimages are DV'd in place, postimages append as new files. Same
    final snapshot and same CDC classification as the CoW merge,
    O(churn) write volume (zero pre-existing files rewritten)."""
    from animaltrackingetls_spark.cdc import read_change_data

    t = _mk(spark, tmp_path, write_change_data=True)
    t2 = _mk(spark, tmp_path, "twin", write_change_data=True)
    v0 = list_versions(t)[-1]
    idents = lambda tb, v: {  # noqa: E731
        (os.stat(p).st_ino, os.stat(p).st_size)
        for p in inv._snapshot_files(tb, v).values()
    }
    before = idents(t, v0)
    batch = spark.createDataFrame(
        [(3, 9, 99.5), (500, 9, 42.0), (2000, 9, 7.0)],
        "k long, g long, x double")
    upsert_parquet_versioned(spark, t, batch, ["k"], keep_versions=10,
                             dv=True)
    upsert_parquet_versioned(spark, t2, batch, ["k"], keep_versions=10,
                             cow=True)
    assert _rows(read_versioned(spark, t), "k", "g", "x") == \
        _rows(read_versioned(spark, t2), "k", "g", "x")
    v1 = list_versions(t)[-1]
    # every pre-existing file carried physically untouched
    assert before <= idents(t, v1)
    # DV marks exactly the matched preimages (k=2000 is a pure insert)
    assert sum(e["rows"] for e in inv._dv_summary(t, v1).values()) == 2
    ops = [r["operation"] for r in inv.describe_history(spark, t).collect()]
    assert "MERGE (dv)" in ops
    # identical CDC classification on both tables
    cols = ["k", "g", "x", "_change_type"]
    a = _rows(read_change_data(spark, t, v0, v1), *cols)
    b = _rows(read_change_data(spark, t2, list_versions(t2)[0],
                               list_versions(t2)[-1]), *cols)
    assert a == b and len(a) == 5  # 1 insert + 2 pre/post pairs


def test_mor_update_composes_with_dv_delete_and_replay(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _dele(spark, t, [10, 11], dv=True)
    upsert_parquet_versioned(
        spark, t,
        spark.createDataFrame([(12, 0, 1.5)], "k long, g long, x double"),
        ["k"], keep_versions=10, dv=True,
        txn_app_id="m", txn_version=1)
    r = read_versioned(spark, t)
    assert r.count() == 998  # 1000 - 2 deleted, k=12 updated in place
    assert r.filter("k = 12").first().x == 1.5
    assert r.filter("k in (10, 11)").count() == 0
    # watermark replay: same txn no-ops
    n = len(list_versions(t))
    upsert_parquet_versioned(
        spark, t,
        spark.createDataFrame([(13, 0, 9.9)], "k long, g long, x double"),
        ["k"], keep_versions=10, dv=True,
        txn_app_id="m", txn_version=1)
    assert len(list_versions(t)) == n
    assert read_versioned(spark, t).filter("k = 13").first().x != 9.9


def test_mor_update_schema_evolution_falls_back(spark, tmp_path):
    t = _mk(spark, tmp_path)
    batch = spark.createDataFrame([(3, 0, 1.0, "new")],
                                  "k long, g long, x double, extra string")
    upsert_parquet_versioned(spark, t, batch, ["k"], keep_versions=10,
                             dv=True, merge_schema=True)
    v = list_versions(t)[-1]
    assert not inv._dv_files(t, v)  # full rewrite, no DV
    r = read_versioned(spark, t)
    assert r.count() == 1000 and "extra" in r.columns
    assert r.filter("k = 3").first().extra == "new"
    # guards
    with pytest.raises(ValueError, match="mutually exclusive"):
        upsert_parquet_versioned(spark, t, batch, ["k"], dv=True, cow=True)


def test_dv_manifest_mode_mor_update_and_purge(spark, tmp_path):
    """Manifest link mode (object-store posture) through the round-14
    additions: a MoR update appends into the manifest snapshot, the
    REORG purge rewrites only the DV-affected files and re-references
    the rest."""
    from animaltrackingetls_spark.inventory import reorg_purge_versioned

    t = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("x"))
    upsert_parquet_versioned(spark, t, df, ["k"], keep_versions=10,
                             target_files=4, cow=True,
                             link_mode="manifest")
    _dele_keys = spark.createDataFrame([(1,), (2,)], "k long")
    delete_versioned(spark, t, _dele_keys, ["k"], keep_versions=10,
                     dv=True)
    upsert_parquet_versioned(
        spark, t,
        spark.createDataFrame([(3, 33.0), (2, 2.5), (5000, 1.0)],
                              "k long, x double"),
        ["k"], keep_versions=10, dv=True)
    r = read_versioned(spark, t)
    # 1000 - {1,2} deleted + k=2 re-inserted (2.5) + k=5000 new
    assert r.count() == 1000
    assert r.filter("k = 1").count() == 0
    assert r.filter("k = 2").first().x == 2.5
    assert r.filter("k = 3").first().x == 33.0

    rep = reorg_purge_versioned(spark, t, keep_versions=10)
    assert rep["purged"]
    v = list_versions(t)[-1]
    assert not inv._dv_files(t, v)
    r2 = read_versioned(spark, t)
    assert _rows(r2, "k", "x") == _rows(r, "k", "x")

"""Write-time change-data capture (cdc.py) — the Delta
``enableChangeDataFeed`` analog: logged-at-commit change rows, pinned
EQUAL to the derived snapshot-diff feed, plus the native Structured
Streaming source over them."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.cdc import (
    CHANGE_TYPE_COL,
    COMMIT_SEQ_COL,
    cdc_enabled,
    change_log,
    read_change_data,
    read_changes_stream,
    resolve_cdc,
)
from animaltrackingetls_spark.inventory import (
    clone_versioned,
    compact_versioned,
    delete_versioned,
    delete_versioned_where,
    list_versions,
    optimize_versioned,
    read_versioned,
    restore_versioned,
    upsert_parquet_versioned,
    upsert_parquet_versioned_partitioned,
)
from animaltrackingetls_spark.operators.versioning import table_changes

# logged _change_type -> derived corpus_diff change tag
_TO_DERIVED = {
    "insert": "added",
    "update_postimage": "changed",
    "delete": "removed",
}


def _rows(df, *cols):
    # repr-keyed: NULL keys sort stably (None < int is a TypeError)
    return sorted(
        (tuple(r) for r in df.select(*cols).collect()), key=repr
    )


def _logged_vs_derived(spark, tdir, key_cols, from_v, to_v):
    """Pin the LOGGED feed's classification equal to the DERIVED diff
    over the same commit window: same keys, same change tags (pre-images
    excluded — the derived feed has no pre-image concept)."""
    logged = read_change_data(spark, tdir, from_v, to_v)
    derived = table_changes(spark, tdir, key_cols, from_v, to_v)
    got = sorted(
        (
            (tuple(r[k] for k in key_cols),
             _TO_DERIVED[r[CHANGE_TYPE_COL]])
            for r in logged.filter(
                F.col(CHANGE_TYPE_COL) != "update_preimage"
            ).collect()
        ),
        key=repr,
    )
    want = sorted(
        (
            (tuple(r[k] for k in key_cols), r["change"])
            for r in derived.collect()
        ),
        key=repr,
    )
    assert got == want
    return logged


@pytest.fixture()
def base_batches(spark):
    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (None, "n", 0.0)],
        "k int, v string, x double",
    )
    # update k=2, NO-OP k=3, insert k=4, update the NULL key
    b2 = spark.createDataFrame(
        [(2, "B", 20.0), (3, "c", 30.0), (4, "d", 40.0), (None, "N", 0.0)],
        "k int, v string, x double",
    )
    return b1, b2


def _writer_variants():
    def plain(spark, tdir, df, key_cols, **kw):
        return upsert_parquet_versioned(spark, tdir, df, key_cols,
                                        keep_versions=10, **kw)

    def cow(spark, tdir, df, key_cols, **kw):
        return upsert_parquet_versioned(spark, tdir, df, key_cols,
                                        keep_versions=10, cow=True, **kw)

    def cow_manifest(spark, tdir, df, key_cols, **kw):
        return upsert_parquet_versioned(
            spark, tdir, df, key_cols, keep_versions=10, cow=True,
            link_mode="manifest", **kw,
        )

    def bucketed(spark, tdir, df, key_cols, **kw):
        return upsert_parquet_versioned_partitioned(
            spark, tdir, df, key_cols, n_buckets=4, scheme="hash",
            keep_versions=10, **kw,
        )

    return [("plain", plain), ("cow", cow),
            ("cow_manifest", cow_manifest), ("bucketed", bucketed)]


@pytest.mark.parametrize("name,writer", _writer_variants())
def test_upsert_logging_matches_derived_feed(
    spark, tmp_path, base_batches, name, writer
):
    tdir = str(tmp_path / name)
    b1, b2 = base_batches
    writer(spark, tdir, b1, ["k"], write_change_data=True)
    v1 = list_versions(tdir)[-1]
    writer(spark, tdir, b2, ["k"])  # pin inherited
    v2 = list_versions(tdir)[-1]

    # creation commit: every row logs as insert (the derived feed can
    # never reconstruct this once the empty pre-image is gone)
    creation = read_change_data(spark, tdir, to_version=v1)
    assert _rows(creation, CHANGE_TYPE_COL) == [("insert",)] * 4

    logged = _logged_vs_derived(spark, tdir, ["k"], v1, v2)
    by_type = {
        r[0]: r[1]
        for r in logged.groupBy(CHANGE_TYPE_COL).count().collect()
    }
    # k=2 and NULL-key update (pre+post each), k=4 insert, k=3 silent
    assert by_type == {
        "insert": 1, "update_preimage": 2, "update_postimage": 2,
    }
    pre = logged.filter(F.col(CHANGE_TYPE_COL) == "update_preimage")
    assert _rows(pre, "k", "v") == [(2, "b"), (None, "n")]
    post = logged.filter(F.col(CHANGE_TYPE_COL) == "update_postimage")
    assert _rows(post, "k", "v") == [(2, "B"), (None, "N")]
    # table data itself is untouched by logging
    assert _rows(read_versioned(spark, tdir), "k", "v") == [
        (1, "a"), (2, "B"), (3, "c"), (4, "d"), (None, "N"),
    ]


@pytest.mark.parametrize(
    "cow,kwargs", [(False, {}), (True, {}), (True, {"link_mode": "manifest"})]
)
def test_delete_logging(spark, tmp_path, base_batches, cow, kwargs):
    tdir = str(tmp_path / "t")
    b1, _ = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True, cow=cow, **kwargs)
    v1 = list_versions(tdir)[-1]
    doomed = spark.createDataFrame([(1,), (None,), (99,)], "k int")
    delete_versioned(spark, tdir, doomed, ["k"], keep_versions=10, cow=cow)
    v2 = list_versions(tdir)[-1]
    logged = _logged_vs_derived(spark, tdir, ["k"], v1, v2)
    # full pre-image rows, NULL key included, absent key (99) no-ops
    assert _rows(logged, "k", "v", CHANGE_TYPE_COL) == [
        (1, "a", "delete"), (None, "n", "delete"),
    ]


def test_delete_where_logging_bucketed(spark, tmp_path):
    tdir = str(tmp_path / "t")
    rows = [(i, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "k int, x double")
    upsert_parquet_versioned_partitioned(
        spark, tdir, df, ["k"], n_buckets=4, scheme="range",
        keep_versions=10, write_change_data=True,
    )
    v1 = list_versions(tdir)[-1]
    delete_versioned_where(spark, tdir, "x >= 35.0", keep_versions=10)
    v2 = list_versions(tdir)[-1]
    logged = _logged_vs_derived(spark, tdir, ["k"], v1, v2)
    assert _rows(logged, "k", CHANGE_TYPE_COL) == [
        (k, "delete") for k in range(35, 40)
    ]


def test_maintenance_logs_empty_and_restore_is_a_hole(
    spark, tmp_path, base_batches
):
    tdir = str(tmp_path / "t")
    b1, _ = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True, cow=True)
    v1 = list_versions(tdir)[-1]
    # pure-insert CoW commits ACCRETE files (rewrite one, carry the
    # rest) — the exact state compaction exists for
    for lo in (10, 20):
        ins = spark.createDataFrame(
            [(lo + i, "z", 1.0) for i in range(3)],
            "k int, v string, x double",
        )
        upsert_parquet_versioned(spark, tdir, ins, ["k"],
                                 keep_versions=10, cow=True)
    rep = compact_versioned(spark, tdir, keep_versions=10)
    assert rep["compacted"]
    v_compact = list_versions(tdir)[-1]
    assert change_log(tdir, v_compact) == []  # logged, provably empty
    optimize_versioned(spark, tdir, ["k"], keep_versions=10)
    v_opt = list_versions(tdir)[-1]
    assert change_log(tdir, v_opt) == []
    # the whole window (seq 2..5) reads through maintenance commits
    # without holes; only the data commits (seq 2,3) contribute rows
    feed = read_change_data(spark, tdir, from_version=v1)
    assert sorted(
        r[0] for r in feed.select(COMMIT_SEQ_COL).distinct().collect()
    ) == [2, 3]

    restore_versioned(spark, tdir, v1, keep_versions=10)
    v_restore = list_versions(tdir)[-1]
    # RESTORE is an honest hole: no marker, and no stale _changes files
    # dragged along from the restored version's own log
    assert change_log(tdir, v_restore) is None
    assert not os.path.exists(
        os.path.join(tdir, v_restore, "_changes")
    )
    with pytest.raises(FileNotFoundError, match="hole"):
        read_change_data(spark, tdir, from_version=v1)
    skipped = read_change_data(spark, tdir, from_version=v1,
                               on_missing="skip")
    assert sorted(
        r[0] for r in skipped.select(COMMIT_SEQ_COL).distinct().collect()
    ) == [2, 3]


def test_pin_semantics(spark, tmp_path, base_batches):
    tdir = str(tmp_path / "t")
    b1, b2 = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10)
    v1 = list_versions(tdir)[-1]
    assert not cdc_enabled(tdir)
    assert change_log(tdir, v1) is None
    # pin mid-life: later commits log, the pre-pin commit is a hole
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10,
                             write_change_data=True)
    assert cdc_enabled(tdir)
    assert change_log(tdir, list_versions(tdir)[-1]) is not None
    with pytest.raises(FileNotFoundError, match="hole"):
        read_change_data(spark, tdir)
    # explicit off on a pinned table refuses (a silent feed hole)
    with pytest.raises(ValueError, match="pinned"):
        upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10,
                                 write_change_data=False)
    # resolve is idempotent
    assert resolve_cdc(tdir, True) and resolve_cdc(tdir, None)


def test_schema_evolution_pads_nulls(spark, tmp_path):
    tdir = str(tmp_path / "t")
    b1 = spark.createDataFrame([(1, "a")], "k int, v string")
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    b2 = spark.createDataFrame([(1, "a", 5), (2, "b", 7)],
                               "k int, v string, extra int")
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10,
                             merge_schema=True)
    feed = read_change_data(spark, tdir)
    assert "extra" in feed.columns
    # the evolved batch: k=1 CHANGES (extra back-fills NULL->5, same
    # semantics as the derived feed's union-schema diff), k=2 inserts;
    # the creation commit's row pads extra as NULL
    assert _rows(feed, COMMIT_SEQ_COL, "k", "extra", CHANGE_TYPE_COL) == [
        (1, 1, None, "insert"),
        (2, 1, 5, "update_postimage"),
        (2, 1, None, "update_preimage"),
        (2, 2, 7, "insert"),
    ]


def test_read_window_and_retention(spark, tmp_path, base_batches):
    tdir = str(tmp_path / "t")
    b1, b2 = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=2,
                             write_change_data=True)
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=2)
    upsert_parquet_versioned(
        spark, tdir,
        spark.createDataFrame([(5, "e", 1.0)], "k int, v string, x double"),
        ["k"], keep_versions=2,
    )  # prunes v1
    versions = list_versions(tdir)
    assert len(versions) == 2
    with pytest.raises(FileNotFoundError, match="not retained"):
        read_change_data(spark, tdir, from_version="v-000001-deadbeef")
    # defaults cover every RETAINED commit
    feed = read_change_data(spark, tdir)
    assert sorted(
        r[0] for r in feed.select(COMMIT_SEQ_COL).distinct().collect()
    ) == [2, 3]
    # empty window returns a typed empty frame
    empty = read_change_data(spark, tdir, versions[-1], versions[-1])
    assert empty.count() == 0
    assert CHANGE_TYPE_COL in empty.columns


def test_clone_carries_pin_not_logs(spark, tmp_path, base_batches):
    tdir, cdir = str(tmp_path / "t"), str(tmp_path / "c")
    b1, b2 = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    clone_versioned(spark, tdir, cdir)
    assert cdc_enabled(cdir)
    cv1 = list_versions(cdir)[0]
    assert change_log(cdir, cv1) is None  # clone v1 is a hole
    assert not os.path.exists(os.path.join(cdir, cv1, "_changes"))
    upsert_parquet_versioned(spark, cdir, b2, ["k"], keep_versions=10)
    logged = read_change_data(spark, cdir, from_version=cv1)
    assert logged.count() > 0


def test_changes_invisible_to_snapshot_machinery(spark, tmp_path,
                                                 base_batches):
    """The _changes sidecar dir must never surface as data: snapshot
    reads, file stats, CoW planning, and compaction sizing all ignore
    it."""
    from animaltrackingetls_spark import filestats
    from animaltrackingetls_spark.inventory import _snapshot_files

    tdir = str(tmp_path / "t")
    b1, b2 = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True, cow=True)
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10,
                             cow=True)
    v2 = list_versions(tdir)[-1]
    files = _snapshot_files(tdir, v2)
    assert all("_changes" not in k for k in files)
    stats = filestats.read_stats(tdir, v2)
    assert stats and all("_changes" not in k for k in stats["files"])
    assert _rows(read_versioned(spark, tdir), "k", "v") == [
        (1, "a"), (2, "B"), (3, "c"), (4, "d"), (None, "N"),
    ]


def test_marker_lists_real_files(spark, tmp_path, base_batches):
    tdir = str(tmp_path / "t")
    b1, _ = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    v1 = list_versions(tdir)[-1]
    with open(os.path.join(tdir, v1, "_changes.json")) as f:
        marker = json.load(f)
    assert marker["files"]
    for p in change_log(tdir, v1):
        assert os.path.isfile(p)


def test_cdc_log_reclassifies_on_cas_retry(spark, tmp_path, monkeypatch):
    """A CAS-losing writer's retry must RE-LOG against the new base:
    the winning concurrent commit's value is the preimage, not the
    stale base the first attempt merged — and the losing attempt's
    change log dies with its version directory."""
    import animaltrackingetls_spark.inventory as inv

    t = str(tmp_path / "race")
    upsert_parquet_versioned(
        spark, t, spark.createDataFrame([(1, "a")], "k int, v string"),
        ["k"], keep_versions=10, write_change_data=True,
    )
    real_publish = inv._publish_version

    def racing_publish(table_dir, version, marks, keep_versions, **kw):
        monkeypatch.setattr(inv, "_publish_version", real_publish)
        upsert_parquet_versioned(
            spark, t,
            spark.createDataFrame([(1, "bee")], "k int, v string"), ["k"],
            keep_versions=10,
        )
        return real_publish(table_dir, version, marks, keep_versions, **kw)

    monkeypatch.setattr(inv, "_publish_version", racing_publish)
    upsert_parquet_versioned(
        spark, t, spark.createDataFrame([(1, "ay")], "k int, v string"),
        ["k"], keep_versions=10, retries=2,
    )
    vs = list_versions(t)
    assert len(vs) == 3  # base, interleaved winner, retried commit
    final = read_change_data(spark, t, vs[-2], vs[-1])
    pre = {r.v for r in final.filter(
        F.col(CHANGE_TYPE_COL) == "update_preimage").collect()}
    post = {r.v for r in final.filter(
        F.col(CHANGE_TYPE_COL) == "update_postimage").collect()}
    assert pre == {"bee"} and post == {"ay"}  # reclassified, not stale
    # every retained version's log is consistent with its own commit
    mid = read_change_data(spark, t, vs[0], vs[-2])
    assert {r.v for r in mid.filter(
        F.col(CHANGE_TYPE_COL) == "update_preimage").collect()} == {"a"}


def test_group_commit_logs_pinned_members(spark, tmp_path):
    """Group-committed members log change data when their table dir is
    CDC-pinned: upsert classification + delete preimages in one log;
    unpinned members stay silent."""
    from animaltrackingetls_spark.inventory import upsert_group_versioned

    g = str(tmp_path / "grp")
    docs, bands = os.path.join(g, "docs"), os.path.join(g, "bands")
    resolve_cdc(docs, True)  # pin ONE member before its first commit
    b1 = {
        "docs": (spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, v string"), ["k"]),
        "bands": (spark.createDataFrame(
            [(10, 1), (11, 2)], "band int, k int"), ["band", "k"]),
    }
    upsert_group_versioned(spark, g, b1, keep_versions=10)
    # batch 2: update k=2, insert k=3, delete k=1 — atomically
    b2 = {
        "docs": (spark.createDataFrame(
            [(2, "B"), (3, "c")], "k int, v string"), ["k"]),
    }
    dels = {"docs": spark.createDataFrame([(1,)], "k int")}
    upsert_group_versioned(spark, g, b2, keep_versions=10, deletes=dels)

    v1, v2 = list_versions(docs)
    assert change_log(docs, v1) is not None
    logged = read_change_data(spark, docs, v1, v2)
    assert _rows(logged, "k", CHANGE_TYPE_COL) == [
        (1, "delete"), (2, "update_postimage"), (2, "update_preimage"),
        (3, "insert"),
    ]
    # classification equals the derived feed over the same window
    _logged_vs_derived(spark, docs, ["k"], v1, v2)
    # the unpinned member logged nothing
    assert change_log(bands, list_versions(bands)[-1]) is None


# ------------------------------------------------- logged pump fast path


def _dst_state(spark, dst):
    return {r.k: r.v for r in read_versioned(spark, dst).collect()}


def test_pump_logged_fast_path_converges(spark, tmp_path):
    from animaltrackingetls_spark.operators.versioning import (
        pump_changes_once,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cur = str(tmp_path / "cursor")

    def up(rows, keep=10):
        upsert_parquet_versioned(
            spark, src, spark.createDataFrame(rows, "k long, v string"),
            ["k"], keep_versions=keep, write_change_data=True, cow=True,
        )

    up([(1, "a"), (2, "b"), (3, "c")])
    r = pump_changes_once(spark, src, dst, cur, ["k"])
    assert r["source"] == "bootstrap" and r["added"] == 3

    # idle poll takes the logged path and applies nothing
    r = pump_changes_once(spark, src, dst, cur, ["k"])
    assert r == {"applied": False, "to_version": r["to_version"],
                 "added": 0, "changed": 0, "removed": 0,
                 "source": "logged"}

    # a MULTI-COMMIT window with an insert-then-delete (nets to a
    # no-op delete), an update chain (nets to the last value), and a
    # fresh insert — the netting window's whole casuistry in one poll
    up([(2, "b2"), (4, "d"), (9, "ghost")])
    up([(2, "b3")])
    delete_versioned(spark, src, spark.createDataFrame([(9,)], "k long"),
                     ["k"], keep_versions=10)
    r = pump_changes_once(spark, src, dst, cur, ["k"])
    assert r["source"] == "logged" and r["applied"]
    assert _dst_state(spark, dst) == {1: "a", 2: "b3", 3: "c", 4: "d"}
    assert r["removed"] == 1  # ghost nets to a (no-op) delete

    # crash-before-advance replay: logged path is exactly-once via the
    # same per-app-id watermarks
    with open(cur) as f:
        cursor_before = f.read()
    up([(5, "e")])
    pump_changes_once(spark, src, dst, cur, ["k"])
    vers_after = list_versions(dst)
    with open(cur, "w") as f:
        f.write(cursor_before)
    r = pump_changes_once(spark, src, dst, cur, ["k"])
    assert r["applied"] and r["source"] == "logged"
    assert list_versions(dst) == vers_after  # pure watermark no-op
    assert _dst_state(spark, dst) == {
        1: "a", 2: "b3", 3: "c", 4: "d", 5: "e",
    }

    # a RESTORE punches a hole -> the poll FALLS BACK to deriving and
    # still converges (endpoints retained)
    v_now = list_versions(src)[-1]
    up([(6, "f")])
    restore_versioned(spark, src, v_now, keep_versions=10)
    r = pump_changes_once(spark, src, dst, cur, ["k"])
    assert r["source"] == "derived"
    assert _dst_state(spark, dst) == {
        1: "a", 2: "b3", 3: "c", 4: "d", 5: "e",
    }
    # post-restore commits log again -> the fast path resumes
    up([(7, "g")])
    r = pump_changes_once(spark, src, dst, cur, ["k"])
    assert r["source"] == "logged"
    assert _dst_state(spark, dst)[7] == "g"


def test_group_pump_logged_members(spark, tmp_path):
    """The group pump's per-member logged fast path: a pinned member's
    window applies from its netted change files (no diff, no payload
    fetch), an unpinned member derives — mixed in ONE atomic group
    commit; the dest group converges and replays no-op."""
    from animaltrackingetls_spark.inventory import (
        read_versioned_group,
        upsert_group_versioned,
    )
    from animaltrackingetls_spark.operators.versioning import (
        pump_group_changes_once,
    )

    sg, dg = str(tmp_path / "sg"), str(tmp_path / "dg")
    cur = str(tmp_path / "cur")
    resolve_cdc(os.path.join(sg, "docs"), True)  # pin docs only
    keys = {"docs": ["k"], "bands": ["band", "k"]}
    upsert_group_versioned(spark, sg, {
        "docs": (spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, v string"), ["k"]),
        "bands": (spark.createDataFrame(
            [(10, 1), (11, 2)], "band int, k int"), ["band", "k"]),
    }, keep_versions=10)
    r = pump_group_changes_once(spark, sg, dg, cur, keys)
    assert r["tables"]["docs"]["bootstrapped"]

    upsert_group_versioned(spark, sg, {
        "docs": (spark.createDataFrame(
            [(2, "B"), (3, "c")], "k int, v string"), ["k"]),
        "bands": (spark.createDataFrame(
            [(12, 3)], "band int, k int"), ["band", "k"]),
    }, keep_versions=10,
        deletes={"docs": spark.createDataFrame([(1,)], "k int")})
    r = pump_group_changes_once(spark, sg, dg, cur, keys)
    assert r["tables"]["docs"]["source"] == "logged"
    assert r["tables"]["bands"]["source"] == "derived"
    assert (r["tables"]["docs"]["added"],
            r["tables"]["docs"]["changed"],
            r["tables"]["docs"]["removed"]) == (1, 1, 1)
    got = {
        (row.k, row.v)
        for row in read_versioned_group(spark, dg, "docs").collect()
    }
    assert got == {(2, "B"), (3, "c")}
    assert read_versioned_group(spark, dg, "bands").count() == 3

    # crash-before-advance replay: the logged member's group window
    # no-ops under the group watermark
    import json as _json

    with open(cur) as f:
        cursor_before = f.read()
    upsert_group_versioned(spark, sg, {
        "docs": (spark.createDataFrame(
            [(4, "d")], "k int, v string"), ["k"]),
    }, keep_versions=10)
    pump_group_changes_once(spark, sg, dg, cur, keys)
    state_after = _json.dumps(
        sorted((row.k, row.v) for row in
               read_versioned_group(spark, dg, "docs").collect())
    )
    with open(cur, "w") as f:
        f.write(cursor_before)
    r = pump_group_changes_once(spark, sg, dg, cur, keys)
    assert r["applied"] and r["tables"]["docs"]["source"] == "logged"
    assert _json.dumps(
        sorted((row.k, row.v) for row in
               read_versioned_group(spark, dg, "docs").collect())
    ) == state_after


def test_maintain_aggregate_incremental_view(spark, tmp_path):
    """Incremental materialized-view maintenance over the logged feed:
    the view equals the full groupBy recompute after every poll —
    through inserts, value updates, GROUP MOVES (a key changing its
    group contributes -1 to the old and +1 to the new), NULL groups,
    NULL sum values (all-NULL groups sum to NULL, not 0), group
    deletion at count 0, crash replay, and a RESTORE-hole recompute."""
    from animaltrackingetls_spark.operators.versioning import (
        maintain_aggregate_once,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    cur = str(tmp_path / "cursor")
    schema = "k long, g string, x double"

    def up(rows):
        upsert_parquet_versioned(
            spark, src, spark.createDataFrame(rows, schema), ["k"],
            keep_versions=10, write_change_data=True, cow=True,
        )

    def full():
        return _rows(
            read_versioned(spark, src).groupBy("g").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("x").alias("n_x"),
                F.sum("x").alias("sum_x"),
            ), "g", "n_rows", "n_x", "sum_x",
        )

    def materialized():
        return _rows(read_versioned(spark, view),
                     "g", "n_rows", "n_x", "sum_x")

    def poll():
        return maintain_aggregate_once(
            spark, src, view, cur, ["g"], sum_cols=["x"],
        )

    # bootstrap: NULL group key, an all-NULL-x group ('z'), plain groups
    up([(1, "a", 1.0), (2, "a", 2.0), (3, "b", 4.0),
        (4, None, 8.0), (5, "z", None), (6, "z", None)])
    assert poll()["source"] == "bootstrap"
    assert materialized() == full()

    # one multi-commit window: insert, value update, a group MOVE
    # (k=3 b->a), a NULL-x insert into a live group
    up([(3, "a", 4.0), (7, "b", 16.0)])
    up([(1, "a", 1.5), (8, "a", None)])
    r = poll()
    assert r["source"] == "logged" and r["applied"]
    assert materialized() == full()

    # deletes: empty group 'b' entirely (count 0 -> row leaves the
    # view), and thin group 'a'
    delete_versioned(spark, src, spark.createDataFrame(
        [(7,), (2,)], "k long"), ["k"], keep_versions=10, cow=True)
    r = poll()
    assert r["source"] == "logged" and r["groups_deleted"] == 1
    assert materialized() == full()
    assert ("b",) not in {(row.g,) for row in
                          read_versioned(spark, view).collect()}

    # crash replay: roll the cursor back, re-poll -> watermark no-op
    with open(cur) as f:
        before = f.read()
    up([(9, "a", 32.0)])
    poll()
    n_vers = len(list_versions(view))
    with open(cur, "w") as f:
        f.write(before)
    r = poll()
    assert r["applied"] and list_versions(view)[-1:] and \
        len(list_versions(view)) == n_vers
    assert materialized() == full()

    # a RESTORE hole flips the poll to a full recompute, still exact
    v_keep = list_versions(src)[-1]
    up([(10, "c", 64.0)])
    restore_versioned(spark, src, v_keep, keep_versions=10)
    r = poll()
    assert r["source"] == "recomputed"
    assert materialized() == full()
    # and the logged fast path resumes after the hole
    up([(11, "d", 128.0)])
    assert poll()["source"] == "logged"
    assert materialized() == full()


def test_streaming_view_maintenance(spark, tmp_path):
    """run_aggregate_maintenance: the view builds FROM NOTHING out of
    the creation commit's logged inserts, tracks later commits across
    checkpoint restarts (group move + delete included), and equals the
    full recompute after every drain."""
    from animaltrackingetls_spark.streaming.jobs import (
        run_aggregate_maintenance,
    )

    src, vw = str(tmp_path / "src"), str(tmp_path / "vw")
    ck = str(tmp_path / "ck")
    schema = "k long, g string, x double"

    def up(rows):
        upsert_parquet_versioned(
            spark, src, spark.createDataFrame(rows, schema), ["k"],
            keep_versions=10, write_change_data=True, cow=True,
        )

    def full():
        return _rows(
            read_versioned(spark, src).groupBy("g").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("x").alias("n_x"),
                F.sum("x").alias("sum_x"),
            ), "g", "n_rows", "n_x", "sum_x",
        )

    def drain():
        run_aggregate_maintenance(spark, src, vw, ck, ["g"],
                                  sum_cols=["x"])
        return _rows(read_versioned(spark, vw),
                     "g", "n_rows", "n_x", "sum_x")

    up([(1, "a", 1.0), (2, "a", 2.0), (3, "b", 4.0)])
    assert drain() == full()  # built from deltas alone, no bootstrap
    up([(3, "a", 4.0), (4, "c", None)])  # group move + NULL-sum group
    delete_versioned(spark, src, spark.createDataFrame([(1,)], "k long"),
                     ["k"], keep_versions=10, cow=True)
    assert drain() == full()
    assert ("b",) not in {(r.g,) for r in
                          read_versioned(spark, vw).collect()}
    # idle drain: no new commits, view gains no versions
    n = len(list_versions(vw))
    assert drain() == full()
    assert len(list_versions(vw)) == n


def test_pump_prefer_logged_off_derives(spark, tmp_path):
    from animaltrackingetls_spark.operators.versioning import (
        pump_changes_once,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cur = str(tmp_path / "cursor")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    upsert_parquet_versioned(spark, src, df, ["k"], keep_versions=10,
                             write_change_data=True)
    pump_changes_once(spark, src, dst, cur, ["k"])
    upsert_parquet_versioned(
        spark, src, spark.createDataFrame([(2, "b")], "k long, v string"),
        ["k"], keep_versions=10,
    )
    r = pump_changes_once(spark, src, dst, cur, ["k"],
                          prefer_logged=False)
    assert r["source"] == "derived" and r["added"] == 1
    assert _dst_state(spark, dst) == {1: "a", 2: "b"}


def test_streaming_replication_end_to_end(spark, tmp_path):
    """run_changes_replication: a CDC-pinned table replicates from
    scratch through nothing but its own change log, stays converged
    across later commits (restarting from the stream checkpoint), and
    handles deletes."""
    from animaltrackingetls_spark.streaming.jobs import (
        run_changes_replication,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    def up(rows):
        upsert_parquet_versioned(
            spark, src, spark.createDataFrame(rows, "k long, v string"),
            ["k"], keep_versions=10, write_change_data=True, cow=True,
        )

    up([(1, "a"), (2, "b"), (3, "c")])
    up([(2, "b2"), (4, "d")])
    run_changes_replication(spark, src, dst, ck, ["k"])
    assert {r.k: r.v for r in read_versioned(spark, dst).collect()} == {
        1: "a", 2: "b2", 3: "c", 4: "d",
    }
    # later commits, incl. a delete: the restart drains only new offsets
    up([(5, "e")])
    delete_versioned(spark, src, spark.createDataFrame([(1,)], "k long"),
                     ["k"], keep_versions=10)
    run_changes_replication(spark, src, dst, ck, ["k"])
    assert {r.k: r.v for r in read_versioned(spark, dst).collect()} == {
        2: "b2", 3: "c", 4: "d", 5: "e",
    }
    # idle restart: nothing new, dest gains no versions
    n = len(list_versions(dst))
    run_changes_replication(spark, src, dst, ck, ["k"])
    assert len(list_versions(dst)) == n


# ----------------------------------------------------- streaming source


def test_stream_availablenow_and_exactly_once_restart(
    spark, tmp_path, base_batches
):
    tdir = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    b1, b2 = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10)

    def drain():
        q = (
            read_changes_stream(spark, tdir, starting="earliest")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    got = spark.read.parquet(out)
    assert got.count() == 4 + 5  # 4 creation inserts + (1 ins, 2x2 upd)
    # new commits land; the restart reads ONLY them (offset checkpoint)
    delete_versioned(spark, tdir, spark.createDataFrame([(1,)], "k int"),
                     ["k"], keep_versions=10)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 10
    assert _rows(
        got.filter(F.col(CHANGE_TYPE_COL) == "delete"), "k", "v"
    ) == [(1, "a")]
    # exactly once: no commit seq appears with duplicated rows
    per_seq = _rows(got.groupBy(COMMIT_SEQ_COL).count(), COMMIT_SEQ_COL,
                    "count")
    assert per_seq == [(1, 4), (2, 5), (3, 1)]


def test_stream_starting_latest_sees_only_new(spark, tmp_path,
                                              base_batches):
    tdir = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    b1, b2 = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10)

    def drain():
        q = (
            read_changes_stream(spark, tdir)  # latest (resolved at start)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120)

    # first start: offset = current seq (2) -> NOTHING replayed
    drain()
    assert spark.read.parquet(out).count() == 0  # empty sink batch only
    # a commit after the checkpoint exists IS seen (latest only skips
    # history before the FIRST start)
    delete_versioned(spark, tdir, spark.createDataFrame([(1,)], "k int"),
                     ["k"], keep_versions=10)
    drain()
    got = spark.read.parquet(out)
    assert sorted(
        r[0] for r in got.select(COMMIT_SEQ_COL).distinct().collect()
    ) == [3]


def test_stream_hole_fails_and_skip_reads_past(spark, tmp_path,
                                               base_batches):
    tdir = str(tmp_path / "t")
    b1, b2 = base_batches
    # v1 unlogged (pre-pin), v2 logged
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10)
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10,
                             write_change_data=True)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        read_changes_stream(spark, tdir, starting="earliest")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="no change data"):
        q.awaitTermination(120)
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    q = (
        read_changes_stream(spark, tdir, starting="earliest",
                            on_missing="skip")
        .writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", ck2)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    got = spark.read.parquet(out2)
    assert sorted(
        r[0] for r in got.select(COMMIT_SEQ_COL).distinct().collect()
    ) == [2]


def test_stream_rate_limit_offsets(spark, tmp_path, base_batches):
    """maxCommitsPerTrigger caps latestOffset at (last planned range's
    end + N) once an anchor exists; the first range after a (re)start
    is uncapped by API construction (latestOffset receives no start)."""
    from animaltrackingetls_spark.cdc import _stream_reader_cls

    tdir = str(tmp_path / "t")
    b1, b2 = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    for _ in range(4):
        upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10)
    ds_cls = _stream_reader_cls()
    ds = ds_cls(options={"path": tdir, "startingversion": "earliest",
                         "maxcommitspertrigger": "1"})
    reader = ds.streamReader(ds.schema())
    assert reader.initialOffset() == {"seq": 0}
    # no anchor yet: uncapped (current seq = 5)
    assert reader.latestOffset() == {"seq": 5}
    # plan a range; the next latestOffset caps at its end + 1
    parts = reader.partitions({"seq": 0}, {"seq": 1})
    assert parts  # the creation commit's change files
    assert reader.latestOffset() == {"seq": 2}
    reader.partitions({"seq": 1}, {"seq": 2})
    assert reader.latestOffset() == {"seq": 3}
    # never beyond CURRENT
    reader.partitions({"seq": 2}, {"seq": 5})
    assert reader.latestOffset() == {"seq": 5}
    with pytest.raises(ValueError, match="maxCommitsPerTrigger"):
        bad = ds_cls(options={"path": tdir, "maxcommitspertrigger": "0"})
        bad.streamReader(bad.schema())


def test_stream_starting_explicit_seq(spark, tmp_path, base_batches):
    tdir = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    b1, b2 = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10)
    q = (
        read_changes_stream(spark, tdir, starting=2)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert sorted(
        r[0] for r in got.select(COMMIT_SEQ_COL).distinct().collect()
    ) == [2]


def test_netting_delete_reinsert_same_commit(spark, tmp_path):
    """Round-12 ADVICE #1: a group commit logs BOTH a delete and an
    insert for a deleted-and-reinserted key at ONE _commit_seq (upsert
    classification runs against the post-delete base). The netting
    tie-break must pick the INSERT as the key's final state — commit
    sequence alone breaks the tie nondeterministically and can drop a
    live key at the destination."""
    from animaltrackingetls_spark.inventory import (
        read_versioned_group,
        upsert_group_versioned,
    )
    from animaltrackingetls_spark.operators.versioning import (
        _netted_logged_changes,
        pump_group_changes_once,
    )

    sg, dg = str(tmp_path / "sg"), str(tmp_path / "dg")
    cur = str(tmp_path / "cur")
    resolve_cdc(os.path.join(sg, "docs"), True)
    keys = {"docs": ["k"]}
    # many keys so a lucky nondeterministic tie can't mask the bug
    ks = list(range(8))
    upsert_group_versioned(spark, sg, {
        "docs": (spark.createDataFrame(
            [(k, "old") for k in ks], "k int, v string"), ["k"]),
    }, keep_versions=10)
    r = pump_group_changes_once(spark, sg, dg, cur, keys)
    assert r["tables"]["docs"]["bootstrapped"]

    # ONE group commit: delete every key AND reinsert it with a new
    # value -> the change log holds delete + insert per key, same seq
    upsert_group_versioned(spark, sg, {
        "docs": (spark.createDataFrame(
            [(k, "new") for k in ks], "k int, v string"), ["k"]),
    }, keep_versions=10,
        deletes={"docs": spark.createDataFrame(
            [(k,) for k in ks], "k int")})

    # the netted feed itself: every key's final state is the insert
    import json as _json

    with open(os.path.join(sg, "_CURRENT_GROUP")) as f:
        hist = _json.load(f)["history"]["docs"]
    netted = _netted_logged_changes(
        spark, os.path.join(sg, "docs"), hist[-2], hist[-1], ["k"],
        versions=hist,
    )
    got = {(r.k, r[CHANGE_TYPE_COL]) for r in netted.collect()}
    assert got == {(k, "insert") for k in ks}

    # and end to end through the group pump's logged fast path
    r = pump_group_changes_once(spark, sg, dg, cur, keys)
    assert r["tables"]["docs"]["source"] == "logged"
    dest = {(row.k, row.v)
            for row in read_versioned_group(spark, dg, "docs").collect()}
    assert dest == {(k, "new") for k in ks}


def test_ivm_replay_after_crash_with_new_commit(spark, tmp_path,
                                                monkeypatch):
    """Round-12 ADVICE #2: signed deltas are not idempotent across
    DIFFERENT windows. A poll that crashes after applying but before
    advancing, followed by a NEW source commit, must NOT widen the
    retry window past what was applied (that would re-apply the old
    deltas under a higher txn_version and double-count). The pending
    plan clamps the retry to the crashed poll's exact window."""
    from animaltrackingetls_spark.operators import versioning as V

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    cur = str(tmp_path / "cursor")

    def up(rows):
        upsert_parquet_versioned(
            spark, src, spark.createDataFrame(rows, "k long, g string, x double"),
            ["k"], keep_versions=10, write_change_data=True, cow=True,
        )

    def full():
        return _rows(
            read_versioned(spark, src).groupBy("g").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("x").alias("n_x"),
                F.sum("x").alias("sum_x"),
            ), "g", "n_rows", "n_x", "sum_x")

    def materialized():
        return _rows(read_versioned(spark, view),
                     "g", "n_rows", "n_x", "sum_x")

    up([(1, "a", 1.0), (2, "a", 2.0), (3, "b", 4.0)])
    assert V.maintain_aggregate_once(
        spark, src, view, cur, ["g"], sum_cols=["x"],
    )["source"] == "bootstrap"

    # a delta commit, then a poll that CRASHES after applying it
    up([(4, "a", 8.0)])
    real_apply = V._apply_aggregate_delta

    def crash_after_apply(*a, **kw):
        out = real_apply(*a, **kw)
        raise RuntimeError("simulated crash before advance()")

    monkeypatch.setattr(V, "_apply_aggregate_delta", crash_after_apply)
    with pytest.raises(RuntimeError, match="simulated crash"):
        V.maintain_aggregate_once(spark, src, view, cur, ["g"],
                                  sum_cols=["x"])
    monkeypatch.setattr(V, "_apply_aggregate_delta", real_apply)
    assert os.path.exists(cur + ".pending")

    # the source moves on BEFORE the retry
    up([(5, "b", 16.0)])

    # retry: clamped to the crashed poll's window (watermark no-op),
    # then a second poll applies the genuinely-new commit
    r1 = V.maintain_aggregate_once(spark, src, view, cur, ["g"],
                                   sum_cols=["x"])
    assert r1["applied"] and r1["source"] == "logged"
    r2 = V.maintain_aggregate_once(spark, src, view, cur, ["g"],
                                   sum_cols=["x"])
    assert r2["applied"] and r2["source"] == "logged"
    assert not os.path.exists(cur + ".pending")
    assert materialized() == full()  # no double-counted sum_a

    # idle poll stays idle
    assert not V.maintain_aggregate_once(
        spark, src, view, cur, ["g"], sum_cols=["x"])["applied"]


def test_read_change_data_empty_window_without_current(spark, tmp_path):
    """Round-12 ADVICE #3: the empty-window typed fallback must not
    need a _CURRENT pointer — group-member dirs publish through the
    group pointer and have none. A window whose commits all logged
    empty change sets returns an empty, correctly-typed frame."""
    tdir = str(tmp_path / "t")
    for k in (1, 2, 3):
        upsert_parquet_versioned(
            spark, tdir,
            spark.createDataFrame([(k, "a", 1.0)],
                                  "k int, v string, x double"),
            ["k"], keep_versions=10, write_change_data=True, cow=True,
        )
    v1 = list_versions(tdir)[-1]
    rep = compact_versioned(spark, tdir, keep_versions=10)
    assert rep["compacted"]
    v2 = list_versions(tdir)[-1]
    assert change_log(tdir, v2) == []  # provably-empty logged commit
    vs = list_versions(tdir)
    os.remove(os.path.join(tdir, "_CURRENT"))  # now a member-like dir

    feed = read_change_data(spark, tdir, v1, v2, versions=vs)
    assert feed.count() == 0
    cols = set(feed.columns)
    assert {"k", "v", "x", CHANGE_TYPE_COL, COMMIT_SEQ_COL,
            "_commit_version"} <= cols


def test_ivm_minmax_maintenance(spark, tmp_path):
    """Round-13: min/max in the maintained view. Inserts tighten
    monotonically; a delete touching a group's extremum triggers the
    affected-group rescan. The view is pinned EQUAL to the full
    groupBy recompute through: extremum deletion, DUPLICATE extrema
    (deleting one copy must keep the other), interior deletes (no
    rescan needed), group moves, all-NULL columns, in-window
    insert-then-delete on a brand-new group, crash replay, and
    view-schema evolution (minmax added to an existing view)."""
    from animaltrackingetls_spark.operators.versioning import (
        maintain_aggregate_once,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    cur = str(tmp_path / "cursor")
    schema = "k long, g string, x double"

    def up(rows):
        upsert_parquet_versioned(
            spark, src, spark.createDataFrame(rows, schema), ["k"],
            keep_versions=20, write_change_data=True, cow=True,
        )

    def dele(ks):
        delete_versioned(spark, src, spark.createDataFrame(
            [(k,) for k in ks], "k long"), ["k"], keep_versions=20,
            cow=True)

    def full():
        return _rows(
            read_versioned(spark, src).groupBy("g").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("x").alias("n_x"),
                F.sum("x").alias("sum_x"),
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
            ), "g", "n_rows", "n_x", "sum_x", "min_x", "max_x")

    def materialized():
        return _rows(read_versioned(spark, view),
                     "g", "n_rows", "n_x", "sum_x", "min_x", "max_x")

    def poll():
        return maintain_aggregate_once(
            spark, src, view, cur, ["g"], sum_cols=["x"],
            minmax_cols=["x"],
        )

    # bootstrap: duplicates at the extremum (k=1,2 both x=1.0),
    # all-NULL group 'z', NULL group key
    up([(1, "a", 1.0), (2, "a", 1.0), (3, "a", 5.0), (4, "b", 7.0),
        (5, None, 3.0), (6, "z", None)])
    assert poll()["source"] == "bootstrap"
    assert materialized() == full()

    # pure-insert tighten: new max for 'a', new min for 'b'
    up([(7, "a", 9.0), (8, "b", 2.0)])
    r = poll()
    assert r["source"] == "logged" and r["applied"]
    assert materialized() == full()

    # delete ONE duplicate of the min (k=1): rescan keeps min=1.0
    dele([1])
    poll()
    assert materialized() == full()
    got = {row.g: (row.min_x, row.max_x)
           for row in read_versioned(spark, view).collect()
           if row.g == "a"}
    assert got["a"] == (1.0, 9.0)

    # delete the true max of 'a' (k=7, x=9.0): rescan finds 5.0
    dele([7])
    poll()
    assert materialized() == full()

    # interior delete (k=3, x=5.0 is now the max — so delete k=2
    # first to get an interior value...): delete x=1.0 when min is
    # also 1.0 -> extremum touch; then insert interior and delete it
    up([(9, "a", 3.0)])
    poll()
    dele([9])  # 3.0 interior? min=1.0 max=5.0 -> interior, no rescan
    poll()
    assert materialized() == full()

    # group move: k=4 moves b->a (delete pre, insert post)
    up([(4, "a", 7.0)])
    poll()
    assert materialized() == full()
    # 'b' now holds only k=8 (x=2.0)

    # in-window insert-then-delete on a BRAND-NEW group: two commits
    # in one poll window
    up([(20, "q", 11.0), (21, "q", 13.0)])
    dele([21])
    poll()
    assert materialized() == full()

    # empty a group entirely -> its row leaves the view
    dele([8])
    r = poll()
    assert materialized() == full()
    assert "b" not in {row.g for row in
                       read_versioned(spark, view).collect()}

    # crash replay: cursor rolled back, re-poll converges identically
    with open(cur) as f:
        before = f.read()
    up([(30, "a", 0.5)])  # new min via insert
    poll()
    with open(cur, "w") as f:
        f.write(before)
    poll()
    assert materialized() == full()

    # NULL-valued deletes never rescan or disturb min/max
    up([(31, "z", None)])
    poll()
    dele([31])
    poll()
    assert materialized() == full()


def test_ivm_minmax_view_schema_evolution(spark, tmp_path):
    """A count/sum-only view later polled with minmax_cols: one
    recompute re-bases the schema, then incremental again."""
    from animaltrackingetls_spark.operators.versioning import (
        maintain_aggregate_once,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    cur = str(tmp_path / "cursor")

    def up(rows):
        upsert_parquet_versioned(
            spark, src, spark.createDataFrame(rows, "k long, g string, x double"),
            ["k"], keep_versions=10, write_change_data=True, cow=True,
        )

    up([(1, "a", 1.0), (2, "b", 2.0)])
    maintain_aggregate_once(spark, src, view, cur, ["g"], sum_cols=["x"])
    assert "min_x" not in read_versioned(spark, view).columns

    up([(3, "a", 3.0)])
    r = maintain_aggregate_once(spark, src, view, cur, ["g"],
                                sum_cols=["x"], minmax_cols=["x"])
    assert r["source"] == "recomputed"
    got = _rows(read_versioned(spark, view),
                "g", "n_rows", "n_x", "sum_x", "min_x", "max_x")
    want = _rows(
        read_versioned(spark, src).groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("x").alias("n_x"),
            F.sum("x").alias("sum_x"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
        ), "g", "n_rows", "n_x", "sum_x", "min_x", "max_x")
    assert got == want

    # and the NEXT poll is logged-incremental again
    up([(4, "c", 4.0)])
    r = maintain_aggregate_once(spark, src, view, cur, ["g"],
                                sum_cols=["x"], minmax_cols=["x"])
    assert r["source"] == "logged"


def test_streaming_view_maintenance_minmax(spark, tmp_path):
    """The streaming runner with minmax_cols: rescans pin at the
    batch's last commit version; the drained view equals the full
    recompute including an extremum deletion."""
    from animaltrackingetls_spark.streaming.jobs import (
        run_aggregate_maintenance,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    ck = str(tmp_path / "ck")
    resolve_cdc(src, True)

    def up(rows):
        upsert_parquet_versioned(
            spark, src, spark.createDataFrame(rows, "k long, g string, x double"),
            ["k"], keep_versions=20, cow=True,
        )

    up([(1, "a", 1.0), (2, "a", 9.0), (3, "b", 4.0)])
    up([(4, "a", 5.0)])
    delete_versioned(spark, src, spark.createDataFrame(
        [(2,)], "k long"), ["k"], keep_versions=20, cow=True)  # max gone
    run_aggregate_maintenance(
        spark, src, view, ck, ["g"], sum_cols=["x"],
        minmax_cols=["x"],
    )
    got = _rows(read_versioned(spark, view),
                "g", "n_rows", "n_x", "sum_x", "min_x", "max_x")
    want = _rows(
        read_versioned(spark, src).groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("x").alias("n_x"),
            F.sum("x").alias("sum_x"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
        ), "g", "n_rows", "n_x", "sum_x", "min_x", "max_x")
    assert got == want


def test_changes_stream_paths_transport(spark, tmp_path, base_batches):
    """transport='paths': the stream carries one row per change FILE;
    expand_change_paths turns a batch into the exact change rows via
    JVM parquet scans — equal to the batch read_change_data feed."""
    from animaltrackingetls_spark.cdc import (
        CHANGE_PATH_COL,
        expand_change_paths,
    )

    tdir = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    b1, b2 = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10)

    raw_cols = {}

    def sink(bdf, bid):
        raw_cols["cols"] = bdf.columns
        rows = expand_change_paths(bdf.sparkSession, bdf, tdir)
        rows.write.mode("append").parquet(out)

    q = (
        read_changes_stream(spark, tdir, starting="earliest",
                            transport="paths")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    # the raw stream is metadata-only (no data columns crossed Python)
    assert set(raw_cols["cols"]) == {
        CHANGE_PATH_COL, COMMIT_SEQ_COL, "_commit_version",
    }
    got = _rows(spark.read.parquet(out),
                "k", "v", "x", CHANGE_TYPE_COL, COMMIT_SEQ_COL)
    want = _rows(read_change_data(spark, tdir),
                 "k", "v", "x", CHANGE_TYPE_COL, COMMIT_SEQ_COL)
    assert got == want


def test_expand_change_paths_empty_batch(spark, tmp_path, base_batches):
    from animaltrackingetls_spark.cdc import expand_change_paths

    tdir = str(tmp_path / "t")
    b1, _ = base_batches
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    empty = spark.createDataFrame(
        [], "_cf_path string, _commit_seq long, _commit_version string")
    got = expand_change_paths(spark, empty, tdir)
    assert got.count() == 0
    assert {CHANGE_TYPE_COL, COMMIT_SEQ_COL} <= set(got.columns)


def test_expand_change_paths_type_widening(spark, tmp_path):
    """Round-14 advisory: a type-widening merge_schema commit (float→
    double) leaves older change files with the NARROW physical type;
    the single pinned scan can't promise the upcast, so the paths
    transport must detect the footer drift and fall back to per-commit
    expansion — coerced to the pinned (widened) types, equal to the
    batch feed."""
    from animaltrackingetls_spark.cdc import (
        _footer_type_drift,
        expand_change_paths,
    )

    tdir = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    b1 = spark.createDataFrame([(1, 1.5), (2, 2.5)], "k long, x float")
    upsert_parquet_versioned(spark, tdir, b1, ["k"], keep_versions=10,
                             write_change_data=True)
    b2 = spark.createDataFrame([(2, 9.25), (3, 3.5)], "k long, x double")
    upsert_parquet_versioned(spark, tdir, b2, ["k"], keep_versions=10,
                             merge_schema=True)
    # the first commit's change file really is narrow vs the pinned
    # schema (else this test pins nothing)
    from animaltrackingetls_spark.cdc import _changes_arrow_schema

    target = _changes_arrow_schema(tdir)
    old_files = change_log(tdir, list_versions(tdir)[0])
    assert any(_footer_type_drift(p, target) for p in old_files)

    def sink(bdf, bid):
        rows = expand_change_paths(bdf.sparkSession, bdf, tdir)
        rows.write.mode("append").parquet(out)

    q = (
        read_changes_stream(spark, tdir, starting="earliest",
                            transport="paths")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    got_df = spark.read.parquet(out)
    # widened everywhere: the expansion coerced the narrow files up
    assert dict(got_df.dtypes)["x"] == "double"
    got = _rows(got_df, "k", "x", CHANGE_TYPE_COL, COMMIT_SEQ_COL)
    want = _rows(read_change_data(spark, tdir),
                 "k", "x", CHANGE_TYPE_COL, COMMIT_SEQ_COL)
    assert got == want


def test_replication_rows_transport_still_converges(spark, tmp_path):
    """The pre-round-13 rows transport stays a supported path."""
    from animaltrackingetls_spark.streaming.jobs import (
        run_changes_replication,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    resolve_cdc(src, True)
    upsert_parquet_versioned(
        spark, src,
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        ["k"], keep_versions=10, cow=True)
    delete_versioned(spark, src, spark.createDataFrame(
        [(1,)], "k int"), ["k"], keep_versions=10, cow=True)
    run_changes_replication(spark, src, dst, ck, ["k"],
                            transport="rows")
    assert _rows(read_versioned(spark, dst), "k", "v") == [(2, "b")]


def test_ivm_schema_evolution_through_logged_feed(spark, tmp_path):
    """Round-13 (r12 verdict task #7a): a sum_col that APPEARS
    mid-history. A view maintained without it recomputes once when the
    caller starts requesting it (schema re-base), then the logged feed
    maintains it incrementally — pre-evolution change rows NULL-pad
    the column, so they contribute nothing to n_<c>/sum_<c>, exactly
    the full-aggregate semantics."""
    from animaltrackingetls_spark.operators.versioning import (
        maintain_aggregate_once,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    cur = str(tmp_path / "cursor")

    upsert_parquet_versioned(
        spark, src,
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)],
                              "k long, g string, x double"),
        ["k"], keep_versions=10, write_change_data=True, cow=True,
    )
    maintain_aggregate_once(spark, src, view, cur, ["g"], sum_cols=["x"])

    # evolution: x2 appears; old rows NULL-pad
    upsert_parquet_versioned(
        spark, src,
        spark.createDataFrame([(3, "a", 3.0, 30.0)],
                              "k long, g string, x double, x2 double"),
        ["k"], keep_versions=10, cow=True, merge_schema=True,
    )
    r = maintain_aggregate_once(spark, src, view, cur, ["g"],
                                sum_cols=["x", "x2"])
    assert r["source"] == "recomputed"  # view schema re-base

    # post-evolution commits maintain x2 incrementally: the update of
    # pre-evolution key k=1 logs a preimage whose x2 is NULL (padded),
    # so its -1 delta touches n_x2/sum_x2 not at all — NULL
    # contributions fall out of the count-non-null algebra
    upsert_parquet_versioned(
        spark, src,
        spark.createDataFrame([(1, "a", 1.5, None), (4, "b", 4.0, 40.0)],
                              "k long, g string, x double, x2 double"),
        ["k"], keep_versions=10, cow=True,
    )
    r = maintain_aggregate_once(spark, src, view, cur, ["g"],
                                sum_cols=["x", "x2"])
    assert r["source"] == "logged"
    got = _rows(read_versioned(spark, view),
                "g", "n_rows", "n_x", "sum_x", "n_x2", "sum_x2")
    want = _rows(
        read_versioned(spark, src).groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("x").alias("n_x"), F.sum("x").alias("sum_x"),
            F.count("x2").alias("n_x2"), F.sum("x2").alias("sum_x2"),
        ), "g", "n_rows", "n_x", "sum_x", "n_x2", "sum_x2")
    assert got == want
    # the all-NULL-x2 group ('a' has x2 NULL everywhere? no — k=3 has
    # 30.0; assert the NULL-exact corner explicitly on group 'b')
    b = {row.g: (row.n_x2, row.sum_x2)
         for row in read_versioned(spark, view).collect()}
    assert b["b"] == (1, 40.0)


def test_replication_evolves_dest_schema(spark, tmp_path):
    """Round-13 (r12 verdict task #7b): a replication destination that
    PREDATES a source column gains it (NULL-padded old rows) on the
    first drained post-evolution batch, instead of failing."""
    from animaltrackingetls_spark.streaming.jobs import (
        run_changes_replication,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    resolve_cdc(src, True)
    upsert_parquet_versioned(
        spark, src,
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        ["k"], keep_versions=10, cow=True)
    run_changes_replication(spark, src, dst, ck, ["k"])
    assert "v2" not in read_versioned(spark, dst).columns

    upsert_parquet_versioned(
        spark, src,
        spark.createDataFrame([(2, "B", 20.0), (3, "c", 30.0)],
                              "k int, v string, v2 double"),
        ["k"], keep_versions=10, cow=True, merge_schema=True)
    run_changes_replication(spark, src, dst, ck, ["k"])
    got = _rows(read_versioned(spark, dst), "k", "v", "v2")
    want = _rows(read_versioned(spark, src), "k", "v", "v2")
    assert got == want
    assert got == [(1, "a", None), (2, "B", 20.0), (3, "c", 30.0)]


def test_ivm_variance_maintenance(spark, tmp_path):
    """Round-13 var_cols: sum of squares is delta-maintainable, so the
    view carries n/sum/sumsq per variance column and stddev derives
    downstream with no rescan. Pinned equal to the full recompute
    through updates, deletes, NULL values, group emptying, and a
    min/max-triggered rescan (which recomputes sumsq absolutely)."""
    from animaltrackingetls_spark.operators.versioning import (
        maintain_aggregate_once,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    cur = str(tmp_path / "cursor")

    def up(rows):
        upsert_parquet_versioned(
            spark, src, spark.createDataFrame(rows, "k long, g string, x double"),
            ["k"], keep_versions=20, write_change_data=True, cow=True,
        )

    def dele(ks):
        delete_versioned(spark, src, spark.createDataFrame(
            [(k,) for k in ks], "k long"), ["k"], keep_versions=20,
            cow=True)

    def full():
        return _rows(
            read_versioned(spark, src).groupBy("g").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("x").alias("n_x"),
                F.sum("x").alias("sum_x"),
                F.sum(F.col("x") * F.col("x")).alias("sumsq_x"),
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
            ), "g", "n_rows", "n_x", "sum_x", "sumsq_x",
            "min_x", "max_x")

    def materialized():
        return _rows(read_versioned(spark, view),
                     "g", "n_rows", "n_x", "sum_x", "sumsq_x",
                     "min_x", "max_x")

    def poll():
        return maintain_aggregate_once(
            spark, src, view, cur, ["g"], var_cols=["x"],
            minmax_cols=["x"],
        )

    up([(1, "a", 1.0), (2, "a", 3.0), (3, "b", 2.0), (4, "z", None)])
    assert poll()["source"] == "bootstrap"
    assert materialized() == full()

    up([(5, "a", 5.0), (1, "a", 2.0)])  # insert + interior update
    r = poll()
    assert r["source"] == "logged"
    assert materialized() == full()

    dele([2])  # interior delete: -v, -v^2, no rescan needed for sumsq
    poll()
    assert materialized() == full()

    dele([5])  # extremum delete -> rescan; sumsq recomputed absolutely
    poll()
    assert materialized() == full()

    dele([3])  # group 'b' empties
    poll()
    assert materialized() == full()
    assert "b" not in {row.g for row in read_versioned(spark, view).collect()}

    # variance derives: sample stddev of group 'a' matches Spark's
    import math

    up([(10, "a", 4.0), (11, "a", 7.0)])  # n back above 1
    poll()
    assert materialized() == full()
    row = {r.g: r for r in read_versioned(spark, view).collect()}["a"]
    var = (row.sumsq_x - row.sum_x ** 2 / row.n_x) / (row.n_x - 1)
    want = read_versioned(spark, src).filter("g = 'a'").agg(
        F.stddev("x")).first()[0]
    assert abs(math.sqrt(var) - want) < 1e-9


def test_stream_maintenance_fails_closed_on_pruned_rescan_pin(
    spark, tmp_path, monkeypatch
):
    """Round 14 (r13 advisory #3): a min/max-maintaining stream whose
    rescan pin (the batch's last commit version) is no longer retained
    must fail DETERMINISTICALLY at batch start with re-bootstrap
    guidance — not intermittently, only when a rescan happens to fire.
    The pruned state is simulated by patching the driver-side
    list_versions the guard consults (the reader runs in its own
    worker process and is unaffected)."""
    import os as _os

    import animaltrackingetls_spark.inventory as inv_mod
    from animaltrackingetls_spark.streaming.jobs import (
        run_aggregate_maintenance,
    )

    src, vw = str(tmp_path / "src"), str(tmp_path / "vw")
    ck = str(tmp_path / "ck")
    upsert_parquet_versioned(
        spark, src,
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)],
                              "k long, g string, x double"),
        ["k"], keep_versions=10, write_change_data=True, cow=True,
    )
    real = inv_mod.list_versions
    target = _os.path.abspath(src)
    monkeypatch.setattr(
        inv_mod, "list_versions",
        lambda d: [] if _os.path.abspath(d) == target else real(d),
    )
    with pytest.raises(Exception, match="no longer retained"):
        run_aggregate_maintenance(
            spark, src, vw, ck, ["g"], sum_cols=["x"],
            minmax_cols=["x"], timeout_seconds=120,
        )


def test_ivm_sketch_maintenance(spark, tmp_path):
    """Round-14 sketch_cols: per-group HLL distinct sketches maintained
    like min/max — inserts hll_union monotonically (order-insensitive:
    same value set => same registers), any removal of a non-NULL value
    rescans the group absolutely. Pinned equal (on the ESTIMATE) to the
    full recompute through duplicate inserts, updates, deletes, NULL
    values, group emptying, and a brand-new-group insert-then-delete
    window."""
    from animaltrackingetls_spark.operators.versioning import (
        maintain_aggregate_once,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    cur = str(tmp_path / "cursor")

    def up(rows):
        upsert_parquet_versioned(
            spark, src,
            spark.createDataFrame(rows, "k long, g string, x double"),
            ["k"], keep_versions=20, write_change_data=True, cow=True,
        )

    def dele(ks):
        delete_versioned(spark, src, spark.createDataFrame(
            [(k,) for k in ks], "k long"), ["k"], keep_versions=20,
            cow=True)

    def full():
        return _rows(
            read_versioned(spark, src).groupBy("g").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.hll_sketch_estimate(
                    F.hll_sketch_agg(F.col("x").cast("string"))).alias("nd_x"),
            ), "g", "n_rows", "nd_x")

    def materialized():
        return _rows(
            read_versioned(spark, view).select(
                "g", "n_rows",
                F.hll_sketch_estimate("hll_x").alias("nd_x"),
            ), "g", "n_rows", "nd_x")

    def poll():
        return maintain_aggregate_once(
            spark, src, view, cur, ["g"], sketch_cols=["x"],
        )

    # duplicates within a group (distinct 2 of 3 rows) + NULL value
    up([(1, "a", 1.0), (2, "a", 1.0), (3, "a", 2.0), (4, "z", None)])
    assert poll()["source"] == "bootstrap"
    assert materialized() == full()

    # insert-only window: pure hll_union tighten, no rescan
    up([(5, "a", 9.0), (6, "b", 4.0)])
    assert poll()["source"] == "logged"
    assert materialized() == full()

    # duplicate-value delete: distinct must NOT shrink (k=1 leaves,
    # k=2 still holds x=1.0) — only the rescan can know that
    dele([1])
    poll()
    assert materialized() == full()

    # last-copy delete: distinct shrinks
    dele([3])
    poll()
    assert materialized() == full()

    # update changes a value: old value removal + new value insert
    up([(5, "a", 10.0)])
    poll()
    assert materialized() == full()

    # group empties entirely
    dele([6])
    poll()
    assert materialized() == full()
    assert "b" not in {r.g for r in read_versioned(spark, view).collect()}

    # brand-new group whose FIRST window already contains a delete
    up([(20, "c", 1.0), (21, "c", 2.0)])
    dele([21])
    poll()
    assert materialized() == full()

    # schema evolution: a view predating sketch_cols re-bases once
    cur2, view2 = str(tmp_path / "cur2"), str(tmp_path / "view2")
    maintain_aggregate_once(spark, src, view2, cur2, ["g"])
    up([(30, "d", 3.0)])
    r = maintain_aggregate_once(spark, src, view2, cur2, ["g"],
                                sketch_cols=["x"])
    assert r["source"] == "recomputed"
    assert "hll_x" in read_versioned(spark, view2).columns


def test_streaming_sketch_maintenance(spark, tmp_path):
    """The streaming twin maintains sketch columns through the same
    apply kernel; the delete-bearing batch takes the rescan at the
    batch pin."""
    from animaltrackingetls_spark.streaming.jobs import (
        run_aggregate_maintenance,
    )

    src, vw = str(tmp_path / "src"), str(tmp_path / "vw")
    ck = str(tmp_path / "ck")
    upsert_parquet_versioned(
        spark, src,
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 1.0), (3, "b", 2.0)],
            "k long, g string, x double"),
        ["k"], keep_versions=10, write_change_data=True, cow=True)
    delete_versioned(spark, src, spark.createDataFrame(
        [(1,)], "k long"), ["k"], keep_versions=10, cow=True)

    run_aggregate_maintenance(spark, src, vw, ck, ["g"],
                              sketch_cols=["x"])
    got = _rows(
        read_versioned(spark, vw).select(
            "g", "n_rows",
            F.hll_sketch_estimate("hll_x").alias("nd_x")),
        "g", "n_rows", "nd_x")
    want = _rows(
        read_versioned(spark, src).groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.hll_sketch_estimate(F.hll_sketch_agg(F.col("x").cast("string"))).alias("nd_x")),
        "g", "n_rows", "nd_x")
    assert got == want

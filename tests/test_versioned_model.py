"""Model-based property test for the versioned-table layer.

The lakehouse semantics (upsert wins per key, delete removes, restore
rolls data back, replay watermarks suppress duplicate batch ids, clone
forks) are each pinned by example tests in test_inventory.py; this file
pins their COMPOSITION: a hypothesis-generated random sequence of
operations runs against both the real table and a trivial Python dict
model, and after EVERY commit the table must equal the model exactly.
Any interaction bug between the operations (a restore resurrecting a
deleted key, a bucketed merge dropping an untouched bucket, a replayed
batch applying after a restore) surfaces as a model divergence with the
generating sequence minimized by hypothesis.

Spark actions are slow, so the search is shallow (few examples, short
sequences) — the value is breadth across operation ORDERINGS, which
example tests cannot enumerate.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from animaltrackingetls_spark.inventory import (
    delete_versioned,
    list_versions,
    read_versioned,
    restore_versioned,
    upsert_parquet_versioned,
    upsert_parquet_versioned_partitioned,
)

KEYS = st.integers(min_value=0, max_value=14)  # small domain -> collisions

_op = st.one_of(
    st.tuples(st.just("upsert"),
              st.lists(st.tuples(KEYS, st.integers(0, 99)),
                       min_size=1, max_size=4)),
    st.tuples(st.just("delete"), st.lists(KEYS, min_size=1, max_size=3)),
    st.tuples(st.just("replay"), st.just(None)),
    st.tuples(st.just("restore"), st.just(None)),
)


def _table_state(spark, table_dir) -> dict[int, int]:
    return {
        r.k: r.v for r in read_versioned(spark, table_dir).collect()
    }


@pytest.mark.parametrize("layout", ["plain", "hardlink", "manifest"])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=6), data=st.data())
def test_versioned_table_matches_dict_model(
    spark, tmp_path_factory, layout, ops, data
):
    table = str(tmp_path_factory.mktemp("model") / "t")
    model: dict[int, int] = {0: 0, 1: 1, 7: 7}
    history: list[dict[int, int]] = []  # model states of RETAINED versions
    last_batch: list[tuple[int, int]] | None = None
    txn = 0

    def up(rows, txn_id=None):
        df = spark.createDataFrame(rows, "k long, v long")
        kw = {}
        if txn_id is not None:
            kw = {"txn_app_id": "m", "txn_version": txn_id}
        if layout != "plain":
            upsert_parquet_versioned_partitioned(
                spark, table, df, ["k"], n_buckets=4, scheme="range",
                keep_versions=3, link_mode=layout, **kw,
            )
        else:
            upsert_parquet_versioned(
                spark, table, df, ["k"], keep_versions=3, **kw,
            )

    up(list(model.items()))
    history.append(dict(model))

    for op, arg in ops:
        if op == "upsert":
            # dedupe keys inside one batch the way the writer's window
            # would (any one of the values may win; use last for the
            # model by making keys unique first)
            batch = {k: v for k, v in arg}
            rows = sorted(batch.items())
            txn += 1
            up(rows, txn_id=txn)
            last_batch = ("up", rows, txn)
            model.update(batch)
            history.append(dict(model))
        elif op == "delete":
            keys = sorted(set(arg))
            if set(keys) >= set(model):
                continue  # keep the table non-empty (read contract)
            txn += 1
            delete_versioned(
                spark, table,
                spark.createDataFrame([(k,) for k in keys], "k long"),
                ["k"], keep_versions=3, txn_app_id="m", txn_version=txn,
            )
            last_batch = ("del", keys, txn)
            for k in keys:
                model.pop(k, None)
            history.append(dict(model))
        elif op == "replay" and last_batch is not None:
            # re-apply the LAST transactional batch verbatim: the
            # watermark must make it a no-op (model unchanged)
            kind, payload, t_id = last_batch
            if kind == "up":
                up(payload, txn_id=t_id)
            else:
                delete_versioned(
                    spark, table,
                    spark.createDataFrame([(k,) for k in payload], "k long"),
                    ["k"], keep_versions=3, txn_app_id="m", txn_version=t_id,
                )
        elif op == "restore":
            versions = list_versions(table)
            if len(versions) < 2:
                continue
            idx = data.draw(
                st.integers(0, len(versions) - 2), label="restore_to"
            )
            # retained versions correspond to the TAIL of history
            restore_versioned(spark, table, versions[idx], keep_versions=3)
            model = dict(history[len(history) - len(versions) + idx])
            history.append(dict(model))
        assert _table_state(spark, table) == model, (
            f"diverged after {op} (layout={layout})"
        )

"""One-call pretraining build: stage composition + ordered shard export."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.io import load_table
from animaltrackingetls_spark.pretrain import (
    build_pretraining_corpus,
    export_pretraining_shards,
)

SF = "/root/testdata/sf0.001"


def test_build_filters_dedups_and_packs(spark):
    docs = load_table(spark, SF, "documents")
    out = build_pretraining_corpus(docs)
    rows = out.collect()
    assert rows  # non-degenerate on real data
    assert set(out.columns) == {"doc_id", "n_tokens", "source", "bin_id"}
    # packing invariant: per (source, bin) token totals fit the budget
    # except single-doc overflow bins
    per_bin = (
        out.groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    assert all(b.t <= 2048 or b.c == 1 for b in per_bin)
    # dedup invariant: no doc appears twice
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))


def test_export_shards_roundtrip_order(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "corpus")
    manifest = export_pretraining_shards(docs, path, num_shards=3)
    m = manifest.collect()
    assert [r.shard for r in m] == [0, 1, 2]
    total = sum(r.n_rows for r in m)
    back = spark.read.parquet(path)
    assert back.count() == total
    # the shard order is the curriculum order: (source, bin_id, doc_id)
    ordered = back.orderBy("shard", "global_idx").collect()
    resorted = sorted(ordered, key=lambda r: (r.source, r.bin_id, r.doc_id))
    assert [r.doc_id for r in ordered] == [r.doc_id for r in resorted]


def test_threshold_knobs_change_selectivity(spark):
    docs = load_table(spark, SF, "documents")
    strict = build_pretraining_corpus(docs, min_tokens=100000)
    assert strict.count() == 0


def test_build_with_bestfit_packing(spark):
    """packing='bestfit': same gates and dedup, but documents pack
    whole — NO bin exceeds the budget (oversize docs are flagged
    single-doc bins), and the kept doc set matches the offset build."""
    docs = load_table(spark, SF, "documents")
    out = build_pretraining_corpus(docs, packing="bestfit")
    rows = out.collect()
    assert rows
    assert set(out.columns) == {"doc_id", "n_tokens", "source", "bin_id", "oversize"}
    per_bin = (
        out.filter(~F.col("oversize"))
        .groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    assert per_bin and all(b.t <= 2048 for b in per_bin)
    offset_ids = {
        r.doc_id for r in build_pretraining_corpus(docs).collect()
    }
    assert {r.doc_id for r in rows} == offset_ids
    with pytest.raises(ValueError, match="packing"):
        build_pretraining_corpus(docs, packing="magic")

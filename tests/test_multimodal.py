"""Multimodal plumbing: media table metadata, batched feature extraction."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators import multimodal


def _media(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world!!")], "id long, payload_src string")
    return multimodal.to_media_table(
        df, "id", F.encode(F.col("payload_src"), "utf-8"), "text/plain"
    )


def test_media_table_metadata_jvm_side(spark):
    rows = {r.media_id: r for r in _media(spark).collect()}
    assert rows[1].n_bytes == 5 and rows[2].n_bytes == 7
    assert rows[1].sha256_hex == hashlib.sha256(b"hello").hexdigest()
    assert rows[1].content_type == "text/plain"


def test_extract_features_shape_and_determinism(spark):
    feats = multimodal.extract_features(_media(spark)).collect()
    by_id = {r.media_id: r for r in feats}
    assert set(by_id) == {1, 2}
    assert len(by_id[1].feature) == 8
    assert abs(sum(by_id[1].feature) - 1.0) < 1e-9  # histogram normalized
    assert by_id[1].feature == multimodal.decode_stub(b"hello", "text/plain")


def test_decode_stub_strict_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"x", "image/png", strict=True)

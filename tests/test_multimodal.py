"""Multimodal plumbing: media table metadata, batched feature extraction."""

from __future__ import annotations

import base64
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


# A genuine 1x1 RGBA PNG (full file, zlib-compressed pixel data) — the
# parser must read REAL image bytes, not just our own synthesized ones.
_REAL_1x1_PNG = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
    "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_decode_png_header_real_file_bytes():
    assert multimodal.decode_png_header(_REAL_1x1_PNG) == (1, 1, 8, 6)
    assert multimodal.decode_png_header(b"not a png at all......") is None
    assert multimodal.decode_png_header(b"") is None


def test_png_ihdr_jvm_parser_matches_python(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_REAL_1x1_PNG)), (2, bytearray(b"JUNKJUNKJUNKJUNKJUNKJUNKJUNK"))],
        "media_id long, payload binary",
    )
    rows = {
        r.media_id: r
        for r in df.select(
            "media_id", multimodal.png_ihdr(F.col("payload")).alias("h")
        ).collect()
    }
    assert rows[1].h.asDict() == {
        "width": 1, "height": 1, "bit_depth": 8, "color_type": 6
    }
    assert rows[2].h is None


def test_synthesize_png_roundtrip_both_parsers(spark):
    df = spark.createDataFrame(
        [(101, 640, 480), (102, 1, 99999)], "media_id long, w long, h long"
    )
    made = df.select(
        "media_id", "w", "h",
        multimodal.synthesize_png_header(F.col("w"), F.col("h")).alias("payload"),
        F.lit("image/png").alias("content_type"),
    )
    parsed = {r.media_id: r for r in multimodal.image_dimensions(made).collect()}
    assert (parsed[101].width, parsed[101].height) == (640, 480)
    assert (parsed[102].width, parsed[102].height) == (1, 99999)
    assert parsed[101].bit_depth == 8 and parsed[101].color_type == 6
    # Python twin agrees on the same bytes, and strict decode no longer stubs
    payload = bytes(made.filter(F.col("media_id") == 101).collect()[0].payload)
    assert multimodal.decode_png_header(payload) == (640, 480, 8, 6)
    assert multimodal.decode_stub(payload, "image/png", strict=True) == [
        640.0, 480.0, 8.0, 6.0
    ]

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


# ---------------------------------------------------------------------------
# resize_dims / frame_sample / extract_frame_features
# ---------------------------------------------------------------------------


def test_resize_dims_clamps_long_side_never_upscales(spark):
    from animaltrackingetls_spark.operators.multimodal import resize_dims

    df = spark.createDataFrame(
        [(1, 4000, 3000), (2, 100, 50), (3, 512, 2048), (4, None, 10), (5, 0, 10)],
        "id long, w int, h int",
    )
    out = {
        r.id: (r.d.out_w, r.d.out_h) if r.d else None
        for r in df.select(
            "id", resize_dims(F.col("w"), F.col("h"), 512).alias("d")
        ).collect()
    }
    assert out[1] == (512, 384)      # 4000x3000 → long side 512, aspect kept
    assert out[2] == (100, 50)       # already small: NOT upscaled
    assert out[3] == (128, 512)      # portrait
    assert out[4] is None and out[5] is None  # invalid dims → NULL plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        resize_dims(F.col("w"), F.col("h"), 0)


def test_frame_sample_even_spacing_and_dedup(spark):
    from animaltrackingetls_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 100), 100, 25.0), (2, bytearray(b"y" * 10), 3, 10.0),
         (3, bytearray(b"z"), 0, 30.0)],
        "media_id long, payload binary, n_frames long, fps double",
    )
    out = frame_sample(df, n_samples=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append((r.frame_idx, r.frame_ts_s))
    assert [i for i, _ in sorted(by_id[1])] == [0, 25, 50, 75]  # even over 100
    assert sorted(by_id[1])[1][1] == 1.0                        # 25/25fps = 1s
    assert [i for i, _ in sorted(by_id[2])] == [0, 1, 2]        # 3 frames < 4 samples: dedup
    assert 3 not in by_id                                       # zero-frame media filtered


def test_extract_frame_features_deterministic_and_payload_free(spark):
    from animaltrackingetls_spark.operators.multimodal import (
        extract_frame_features,
        frame_sample,
    )

    payload = bytearray(bytes(range(256)) * 8)
    df = spark.createDataFrame(
        [(7, payload, 64, 30.0)],
        "media_id long, payload binary, n_frames long, fps double",
    )
    frames = frame_sample(df, n_samples=3)
    feats = extract_frame_features(frames)
    assert set(feats.columns) == {"media_id", "frame_idx", "feature"}  # payload dropped
    rows = feats.collect()
    assert len(rows) == 3
    for r in rows:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-9
    again = {(r.media_id, r.frame_idx): r.feature for r in feats.collect()}
    assert {(r.media_id, r.frame_idx): r.feature for r in rows} == again


def test_jpeg_sof_parses_synthesized_header_and_skips_app1_trap(spark):
    """The synthesized stream embeds FFC0 inside the APP1 payload; a
    naive byte search would parse garbage dims from it. Correct dims
    prove the segment walk advances by declared lengths."""
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.multimodal import (
        jpeg_sof,
        synthesize_jpeg_header,
    )

    df = spark.range(6).select(
        F.col("id").alias("media_id"),
        synthesize_jpeg_header(
            (F.col("id") * 13 % 500 + 20).cast("long"),
            (F.col("id") * 7 % 300 + 20).cast("long"),
        ).alias("payload"),
    )
    got = {r.media_id: r.d for r in df.select("media_id", jpeg_sof(F.col("payload")).alias("d")).collect()}
    for i in range(6):
        assert got[i].width == i * 13 % 500 + 20
        assert got[i].height == i * 7 % 300 + 20
        assert got[i].bit_depth == 8   # sample precision
        assert got[i].color_type == 3  # component count


def test_jpeg_sof_null_on_malformed(spark):
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.multimodal import jpeg_sof

    rows = [
        (1, bytearray(b"hello world")),          # no SOI
        (2, bytearray(b"\xff\xd8\xff\xe0")),     # truncated after APP0 marker
        (3, bytearray(b"\xff\xd8\xff\xd9")),     # EOI before any SOF
        (4, bytearray(b"\xff\xd8\xff\xda\x00\x04\x01\x02")),  # SOS before SOF
        (5, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = df.select(jpeg_sof(F.col("payload")).alias("d")).collect()
    assert all(r.d is None for r in out)


def test_jpeg_python_twin_matches_jvm(spark):
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.multimodal import (
        decode_jpeg_header,
        jpeg_sof,
        synthesize_jpeg_header,
    )

    df = spark.range(4).select(
        F.col("id").alias("media_id"),
        synthesize_jpeg_header(
            (F.col("id") + 100).cast("long"), (F.col("id") + 50).cast("long"),
            n_components=1,
        ).alias("payload"),
    )
    jvm = {r.media_id: r.d for r in df.select("media_id", jpeg_sof(F.col("payload")).alias("d")).collect()}
    for r in df.collect():
        py = decode_jpeg_header(bytes(r.payload))
        j = jvm[r.media_id]
        assert py == (j.width, j.height, j.bit_depth, j.color_type)
        assert py[3] == 1  # grayscale component count honored
    assert decode_jpeg_header(b"\xff\xd8" + b"\xff\xc0\x00\x03") is None  # truncated SOF


def test_image_dimensions_mixed_png_jpeg_and_other(spark):
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.multimodal import (
        image_dimensions,
        synthesize_jpeg_header,
        synthesize_png_header,
    )

    png = spark.range(1).select(
        F.lit(1).cast("long").alias("media_id"),
        F.lit("image/png").alias("content_type"),
        synthesize_png_header(F.lit(640), F.lit(480)).alias("payload"),
    )
    jpeg = spark.range(1).select(
        F.lit(2).cast("long").alias("media_id"),
        F.lit("image/jpeg").alias("content_type"),
        synthesize_jpeg_header(F.lit(320), F.lit(200)).alias("payload"),
    )
    other = spark.createDataFrame(
        [(3, "application/pdf", bytearray(b"%PDF-1.4"))],
        "media_id long, content_type string, payload binary",
    )
    out = {r.media_id: r for r in image_dimensions(png.union(jpeg).union(other)).collect()}
    assert (out[1].width, out[1].height) == (640, 480)
    assert (out[2].width, out[2].height) == (320, 200)
    assert out[3].width is None and out[3].height is None


def test_decode_stub_jpeg_real_branch():
    from animaltrackingetls_spark.operators.multimodal import decode_stub

    # build bytes via the python twin's expectations: SOI + SOF0 directly
    payload = (
        b"\xff\xd8"
        + b"\xff\xc0\x00\x0b\x08" + (77).to_bytes(2, "big") + (99).to_bytes(2, "big")
        + b"\x01\x01\x11\x00"
    )
    assert decode_stub(payload, "image/jpeg") == [99.0, 77.0, 8.0, 1.0]
    # strict still raises for genuinely un-decodable formats
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_stub(b"RIFFxxxx", "audio/wav", strict=True)


def test_gif_screen_roundtrip_and_twin(spark):
    """Synthesized GIF89a headers parse back to the exact little-endian
    dims in both the JVM parser and the Python twin; non-GIF bytes and
    truncated headers yield NULL/None."""
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.multimodal import (
        decode_gif_header,
        gif_screen,
        synthesize_gif_header,
    )

    df = spark.range(6).select(
        F.col("id").alias("media_id"),
        synthesize_gif_header(
            (F.col("id") * 300 % 70000 % 640 + 1).cast("long"),
            (F.col("id") * 251 % 480 + 1).cast("long"),
        ).alias("payload"),
    )
    got = {r.media_id: r.d for r in df.select("media_id", gif_screen(F.col("payload")).alias("d")).collect()}
    for r in df.collect():
        i = r.media_id
        d = got[i]
        assert (d.width, d.height) == (i * 300 % 70000 % 640 + 1, i * 251 % 480 + 1)
        assert d.bit_depth == 8 and d.color_type == 1
        assert decode_gif_header(bytes(r.payload)) == (d.width, d.height, 8, 1)
    bad = spark.createDataFrame(
        [(1, bytearray(b"GIF90a\x01\x00\x01\x00\xf7")),   # unknown version
         (2, bytearray(b"GIF89a\x01\x00")),               # truncated
         (3, bytearray(b""))],
        "media_id long, payload binary",
    )
    assert all(r.d is None for r in bad.select(gif_screen(F.col("payload")).alias("d")).collect())
    assert decode_gif_header(b"GIF89a\x01\x00") is None


def test_wav_fmt_walks_past_decoy_list_chunk(spark):
    """The synthesized RIFF stream puts a LIST chunk before "fmt " — a
    fixed-offset parser reads garbage there. Correct audio params prove
    the chunk walk advances by declared sizes; duration is derived from
    the declared data size and byte rate."""
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.multimodal import (
        decode_wav_header,
        synthesize_wav_header,
        wav_fmt,
    )

    df = spark.range(6).select(
        F.col("id").alias("media_id"),
        synthesize_wav_header(
            (F.col("id") % 2 + 1).cast("long"),
            (F.col("id") % 3 * 8000 + 8000).cast("long"),
            (F.col("id") * 997 + 4000).cast("long"),
        ).alias("payload"),
    )
    got = {r.media_id: r.d for r in df.select("media_id", wav_fmt(F.col("payload")).alias("d")).collect()}
    for r in df.collect():
        i = r.media_id
        d = got[i]
        ch, rate, frames = i % 2 + 1, i % 3 * 8000 + 8000, i * 997 + 4000
        assert d.audio_format == 1 and d.n_channels == ch
        assert d.sample_rate == rate and d.bits_per_sample == 16
        assert d.n_data_bytes == frames * ch * 2
        assert d.duration_ms == frames * ch * 2 * 1000 // (rate * ch * 2)
        assert decode_wav_header(bytes(r.payload)) == (
            1, ch, rate, 16, d.n_data_bytes, d.duration_ms
        )


def test_wav_fmt_null_on_malformed(spark):
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.multimodal import decode_wav_header, wav_fmt

    rows = [
        (1, bytearray(b"RIFFxxxx")),                       # no WAVE tag
        (2, bytearray(b"RIFF\x00\x00\x00\x00WAVE")),       # no chunks at all
        # fmt chunk declaring size 4 (< 16): malformed
        (3, bytearray(b"RIFF\x24\x00\x00\x00WAVEfmt \x04\x00\x00\x00\x01\x00\x01\x00")),
        # data chunk but never a fmt chunk
        (4, bytearray(b"RIFF\x14\x00\x00\x00WAVEdata\x04\x00\x00\x00abcd")),
        (5, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = df.select(wav_fmt(F.col("payload")).alias("d")).collect()
    assert all(r.d is None for r in out)
    for _, p in rows:
        assert decode_wav_header(bytes(p)) is None


def test_image_dimensions_detects_gif_and_decode_stub_real_branches(spark):
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.multimodal import (
        decode_stub,
        image_dimensions,
        synthesize_gif_header,
        synthesize_wav_header,
    )

    media = spark.createDataFrame(
        [(1, "image/gif")], "media_id long, content_type string"
    ).select(
        "media_id",
        "content_type",
        synthesize_gif_header(F.lit(320).cast("long"), F.lit(200).cast("long")).alias("payload"),
    )
    out = image_dimensions(media).collect()[0]
    assert (out.width, out.height, out.bit_depth, out.color_type) == (320, 200, 8, 1)

    gif_bytes = bytes(media.collect()[0].payload)
    assert decode_stub(gif_bytes, "image/gif") == [320.0, 200.0, 8.0, 1.0]

    wav_df = spark.range(1).select(
        synthesize_wav_header(
            F.lit(2).cast("long"), F.lit(16000).cast("long"), F.lit(48000).cast("long")
        ).alias("payload")
    )
    wav_bytes = bytes(wav_df.collect()[0].payload)
    # [n_channels, sample_rate, bits, duration_ms]; 48000 frames @16 kHz = 3 s
    assert decode_stub(wav_bytes, "audio/wav") == [2.0, 16000.0, 16.0, 3000.0]


def test_wav_zero_byte_rate_and_truncated_fmt(spark):
    """byte_rate 0 → parseable header but no duration: decode_stub falls
    back to the stub instead of crashing on float(None). A fmt chunk
    declaring 16 bytes but truncated mid-chunk yields NULL from the JVM
    parser, matching the Python twin, never a half-populated struct."""
    import struct as _struct

    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.multimodal import (
        decode_stub,
        decode_wav_header,
        wav_fmt,
    )

    # RIFF/WAVE + fmt(16, byte_rate=0) + data(4)
    fmt = _struct.pack("<HHIIHH", 1, 2, 16000, 0, 4, 16)
    zero_br = (b"RIFF" + _struct.pack("<I", 40) + b"WAVE"
               + b"fmt " + _struct.pack("<I", 16) + fmt
               + b"data" + _struct.pack("<I", 4) + b"abcd")
    hdr = decode_wav_header(zero_br)
    assert hdr is not None and hdr[5] is None    # duration undefined
    feat = decode_stub(zero_br, "audio/wav")     # must NOT raise
    assert len(feat) == 8                        # histogram fallback

    # data chunk first, then fmt declaring 16 bytes but truncated
    truncated = (b"RIFF" + _struct.pack("<I", 30) + b"WAVE"
                 + b"data" + _struct.pack("<I", 4) + b"abcd"
                 + b"fmt " + _struct.pack("<I", 16) + b"\x01\x00\x02\x00")
    assert decode_wav_header(truncated) is None
    df = spark.createDataFrame([(1, bytearray(truncated))],
                               "media_id long, payload binary")
    out = df.select(wav_fmt(F.col("payload")).alias("d")).collect()[0]
    assert out.d is None


def test_render_pgm_roundtrip_and_python_parity(spark):
    """render_pgm writes a genuine P5 image (header + row-major raster,
    counts clamped at 255) that pgm_parse recovers from the raw bytes —
    and plain-Python byte inspection agrees on every field."""
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators import geo, multimodal

    pts = spark.createDataFrame(
        [(i, 10.0, -50.0) for i in range(300)] + [(1000, 80.0, 80.0)],
        "id long, lat double, lon double",
    )
    grid = geo.grid_heatmap(pts, "lat", "lon", width=8, height=4,
                            lat_min=0, lat_max=90, lon_min=-90, lon_max=90)
    img = multimodal.render_pgm(grid, 8, 4)
    row = img.select("payload", "n_bytes",
                     multimodal.pgm_parse(F.col("payload")).alias("p")).collect()[0]
    raw = bytes(row.payload)
    assert raw[:3] == b"P5\n" and row.n_bytes == len(raw)
    body = raw[raw.index(b"255\n") + 4:]
    assert len(body) == 8 * 4
    assert max(body) == 255                    # 300-count cell clamps
    assert (row.p.width, row.p.height, row.p.maxval) == (8, 4, 255)
    assert row.p.raster_sum == sum(body) == 255 + 1

    # non-PGM bytes parse to NULL
    junk = spark.createDataFrame([(1, bytearray(b"P6\n2 2\n255\nXXXX"))],
                                 "id long, payload binary")
    assert junk.select(multimodal.pgm_parse(F.col("payload")).alias("p")
                       ).collect()[0].p is None


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=3, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=12, max_size=12))
def test_byte_parsers_never_throw_on_garbage(spark, payloads):
    """Fuzz: every header parser must return NULL for arbitrary bytes,
    never raise — a corrupt blob in a 100 TB media column must not kill
    the job. (Prefix-corrupted REAL headers are covered by the directed
    malformed-input tests; this is the pure-garbage envelope.)

    Batched (r16): each hypothesis example carries 12 payloads through
    ONE DataFrame/job — the per-example cost was dominated by planning
    the seven parser expression trees (~3 s/example), so 15 one-row
    examples burned ~45 s of suite wall time for 15 probes; 3 batched
    examples probe 36 payloads in a fraction of it."""
    from animaltrackingetls_spark.operators import multimodal as M

    df = spark.createDataFrame(
        list(enumerate(payloads)), "media_id long, payload binary"
    )
    rows = df.select(
        M.png_ihdr(F.col("payload")).alias("png"),
        M.jpeg_sof(F.col("payload")).alias("jpeg"),
        M.gif_screen(F.col("payload")).alias("gif"),
        M.wav_fmt(F.col("payload")).alias("wav"),
        M.pgm_parse(F.col("payload")).alias("pgm"),
        M.bmp_header(F.col("payload")).alias("bmp"),
        M.tiff_ifd(F.col("payload")).alias("tiff"),
    ).collect()
    for row in rows:
        # random short bytes can't be a valid header of any format
        assert row.png is None and row.jpeg is None and row.gif is None
        assert row.wav is None and row.pgm is None
        assert row.bmp is None and row.tiff is None


def test_bmp_header_roundtrip_topdown_and_twin(spark):
    """BMP: bottom-up and TOP-DOWN (negative s32le height) rows both
    decode to the magnitude dims; the Python twin agrees byte-for-byte;
    planes != 1 and a sub-40-byte DIB header are rejected."""
    from animaltrackingetls_spark.operators import multimodal as M

    df = spark.range(8).select(
        "id",
        M.synthesize_bmp_header(
            (F.col("id") * 31 % 500 + 1).cast("long"),
            (F.col("id") * 37 % 400 + 1).cast("long"),
            F.lit(24),
            F.col("id") % 2 == 1,
        ).alias("payload"),
    )
    rows = df.select("id", "payload", M.bmp_header(F.col("payload")).alias("b")).collect()
    for r in rows:
        i = r.id
        assert (r.b.width, r.b.height, r.b.bit_depth, r.b.color_type) == (
            i * 31 % 500 + 1, i * 37 % 400 + 1, 24, 0
        )
        assert M.decode_bmp_header(r.payload) == (
            r.b.width, r.b.height, r.b.bit_depth, r.b.color_type
        )
    # directed traps: planes=2, DIB header size 12 (BITMAPCOREHEADER)
    good = bytes(rows[0].payload)
    planes2 = good[:26] + b"\x02\x00" + good[28:]
    core12 = good[:14] + b"\x0c\x00\x00\x00" + good[18:]
    bad = spark.createDataFrame(
        [(1, bytearray(planes2)), (2, bytearray(core12))], "id long, payload binary"
    )
    assert all(
        r.b is None
        for r in bad.select(M.bmp_header(F.col("payload")).alias("b")).collect()
    )
    assert M.decode_bmp_header(planes2) is None
    assert M.decode_bmp_header(core12) is None


def test_tiff_ifd_both_endians_pointer_read_and_twin(spark):
    """TIFF: the same logical image must decode identically from an
    Intel ("II") and a Motorola ("MM") file; BitsPerSample is a count-3
    SHORT stored behind an offset (the through-the-pointer read); decoy
    tags (254, 259) must be skipped by tag matching; the Python twin
    agrees; a truncated header is rejected."""
    from animaltrackingetls_spark.operators import multimodal as M

    df = spark.range(6).select(
        "id",
        M.synthesize_tiff_header(
            (F.col("id") * 41 % 3000 + 1).cast("long"),
            (F.col("id") * 43 % 3000 + 1).cast("long"),
            F.lit(16),
            (F.col("id") % 4).cast("long"),
            F.col("id") % 2 == 0,
        ).alias("payload"),
    )
    rows = df.select("id", "payload", M.tiff_ifd(F.col("payload")).alias("t")).collect()
    for r in rows:
        i = r.id
        assert (r.t.width, r.t.height, r.t.bit_depth, r.t.color_type) == (
            i * 41 % 3000 + 1, i * 43 % 3000 + 1, 16, i % 4
        )
        assert M.decode_tiff_header(r.payload) == (
            r.t.width, r.t.height, r.t.bit_depth, r.t.color_type
        )
    # same image, both endians -> same decode
    one = spark.createDataFrame([(1,)], "id long").select(
        M.tiff_ifd(M.synthesize_tiff_header(
            F.lit(77), F.lit(55), F.lit(8), F.lit(2), F.lit(True))).alias("be"),
        M.tiff_ifd(M.synthesize_tiff_header(
            F.lit(77), F.lit(55), F.lit(8), F.lit(2), F.lit(False))).alias("le"),
    ).first()
    assert one.be == one.le == (77, 55, 8, 2)
    # truncated: valid signature, IFD offset past the payload end
    trunc = spark.createDataFrame(
        [(1, bytearray(b"II*\x00\x08\x00\x00\x00"))], "id long, payload binary"
    )
    assert trunc.select(M.tiff_ifd(F.col("payload")).alias("t")).first().t is None
    # Python twin must reject (None), not raise, on every truncation
    # point: IFD offset past end, entry cut mid-way, BitsPerSample
    # offset-pointer past end (r7 ADVICE: twin diverged from JVM side)
    full = bytes(rows[0].payload)
    assert M.decode_tiff_header(b"II*\x00\x08\x00\x00\x00") is None
    assert M.decode_tiff_header(full[:20]) is None  # first entry truncated
    assert M.decode_tiff_header(full[:60]) is None  # mid-IFD truncation
    assert M.decode_tiff_header(full[:86]) is None  # BPS pointer past end
    assert M.decode_tiff_header(b"") is None
    assert M.decode_tiff_header(b"II+\x00\x08\x00\x00\x00") is None


def test_multimodal_features_oracle_is_byte_accurate():
    """The multimodal_features DuckDB oracle replays decode_stub's byte
    histogram EXACTLY — including the three divergences the round-8
    oracle had (4096-byte cap ignored, high buckets hardcoded 0, empty
    docs dropped): multibyte UTF-8 pushes bytes into buckets 4-7,
    >4096-byte payloads exercise the cap, and the empty doc must emit
    an all-zero feature row, not vanish."""
    import duckdb

    import __spark_entry__ as entry
    from animaltrackingetls_spark.operators.multimodal import decode_stub

    rows = [
        (0, "hello world \x01\x02 ABC abc"),
        (1, "café naïve 中文 text " * 10),  # 2- and 3-byte UTF-8
        (2, "x" * 5000),  # past the 4096-byte cap
        (3, ""),  # empty payload -> all-zero features
        (4, "ÿ" * 100),  # 0xC3 0xBF bytes -> buckets 6 and 5
        (5, "Z" * 16),  # exactly one frame group
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = con.execute(
        entry.oracle_sql()["multimodal_features"]
    ).fetchall()

    # expected, straight from the Python implementation
    exp = []
    for doc_id, text in rows:
        p = text.encode("utf-8")
        exp.append(("doc", doc_id, len(p), decode_stub(p, "text/plain")))
        nf = len(p) // 16
        if nf > 0:
            for idx in sorted({i * nf // 4 for i in range(4)}):
                start = idx * 64 % max(1, len(p))
                window = p[start : start + 4096] or p[:4096]
                buckets = [0] * 8
                for b in window:
                    buckets[b >> 5] += 1
                total = max(1, len(window))
                exp.append(
                    ("frame", doc_id, idx, [b / total for b in buckets])
                )
    # round 10: the oracle emits exploded (kind, media_id, k, bucket,
    # value) scalar rows (the driver's canonicalizer cannot sort array
    # cells) — explode the expected features the same way
    exp_rows = [
        (kind, mid, k, b, v)
        for kind, mid, k, feature in exp
        for b, v in enumerate(feature)
    ]
    assert sorted(got) == sorted(exp_rows)


def test_parse_media_headers_matches_jvm_expression_path(spark):
    """The r16 Arrow-batched parse (parse_media_headers) must reproduce
    the JVM expression path (image_header / wav_fmt) field-for-field on
    a synthesized corpus that exercises every trap: BMP both signs of
    the s32le height, TIFF both endians + 16-bit BitsPerSample behind
    the pointer, JPEG's APP1 false-SOF, the WAV LIST decoy."""
    ids = spark.range(0, 64).select(F.col("id").alias("doc_id"))
    base = ids.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("text/plain").alias("content_type"),
        F.lit(0).cast("long").alias("n_bytes"),
        F.lit("-").alias("sha256_hex"),
        multimodal.synthesize_png_header(
            (F.col("doc_id") % 1024 + 16).cast("long"),
            (F.col("doc_id") * 7 % 768 + 16).cast("long"),
        ).alias("_p_png"),
        multimodal.synthesize_jpeg_header(
            (F.col("doc_id") * 13 % 512 + 32).cast("long"),
            (F.col("doc_id") * 3 % 512 + 32).cast("long"),
        ).alias("_p_jpeg"),
        multimodal.synthesize_gif_header(
            (F.col("doc_id") * 11 % 640 + 8).cast("long"),
            (F.col("doc_id") * 5 % 480 + 8).cast("long"),
        ).alias("_p_gif"),
        multimodal.synthesize_bmp_header(
            (F.col("doc_id") * 17 % 320 + 4).cast("long"),
            (F.col("doc_id") * 19 % 240 + 4).cast("long"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(8)).otherwise(F.lit(24)),
            F.col("doc_id") % 2 == 1,
        ).alias("_p_bmp"),
        multimodal.synthesize_tiff_header(
            (F.col("doc_id") * 23 % 2048 + 1).cast("long"),
            (F.col("doc_id") * 29 % 2048 + 1).cast("long"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(16)).otherwise(F.lit(8)),
            (F.col("doc_id") % 3).cast("long"),
            F.col("doc_id") % 2 == 0,
        ).alias("_p_tiff"),
        multimodal.synthesize_wav_header(
            (F.col("doc_id") % 2 + 1).cast("long"),
            (F.col("doc_id") % 3 * 8000 + 16000).cast("long"),
            (F.col("doc_id") * 997 % 100000 + 8000).cast("long"),
        ).alias("_p_wav"),
    )
    arrow = multimodal.parse_media_headers(base)
    jvm = base.select(
        "media_id", "content_type", "n_bytes", "sha256_hex",
        multimodal.image_header(F.col("_p_png")).alias("_d"),
        multimodal.image_header(F.col("_p_jpeg")).alias("_j"),
        multimodal.image_header(F.col("_p_gif")).alias("_g"),
        multimodal.image_header(F.col("_p_bmp")).alias("_b"),
        multimodal.image_header(F.col("_p_tiff")).alias("_t"),
        multimodal.wav_fmt(F.col("_p_wav")).alias("_w"),
    ).select(
        "media_id", "content_type", "n_bytes", "sha256_hex",
        F.col("_d.width").alias("width"),
        F.col("_d.height").alias("height"),
        F.col("_d.bit_depth").alias("bit_depth"),
        F.col("_d.color_type").alias("color_type"),
        F.col("_j.width").alias("jpeg_w"),
        F.col("_j.height").alias("jpeg_h"),
        F.col("_j.bit_depth").alias("jpeg_precision"),
        F.col("_j.color_type").alias("jpeg_ncomp"),
        F.col("_g.width").alias("gif_w"),
        F.col("_g.height").alias("gif_h"),
        F.col("_b.width").alias("bmp_w"),
        F.col("_b.height").alias("bmp_h"),
        F.col("_b.bit_depth").alias("bmp_bits"),
        F.col("_t.width").alias("tiff_w"),
        F.col("_t.height").alias("tiff_h"),
        F.col("_t.bit_depth").alias("tiff_bits"),
        F.col("_t.color_type").alias("tiff_photo"),
        F.col("_w.n_channels").alias("wav_channels"),
        F.col("_w.sample_rate").alias("wav_rate"),
        F.col("_w.bits_per_sample").alias("wav_bits"),
        F.col("_w.duration_ms").alias("wav_ms"),
    )
    # nullability differs (mapInArrow declares everything nullable;
    # lit()/range() columns are not) — names and types are the contract
    assert [(f.name, f.dataType) for f in arrow.schema.fields] == [
        (f.name, f.dataType) for f in jvm.schema.fields
    ]
    a = sorted(map(tuple, arrow.collect()))
    j = sorted(map(tuple, jvm.collect()))
    assert a == j


def test_parse_media_headers_null_and_garbage_payloads(spark):
    """NULL payloads and non-media bytes yield NULL header fields (the
    JVM coalesce's behavior), never an exception."""
    rows = [
        (1, None, b"not an image", None, None, None, b"junk"),
        (2, b"", b"", b"", b"", b"", b""),
    ]
    base = spark.createDataFrame(
        rows,
        "media_id long, _p_png binary, _p_jpeg binary, _p_gif binary, "
        "_p_bmp binary, _p_tiff binary, _p_wav binary",
    ).select(
        "media_id",
        F.lit("text/plain").alias("content_type"),
        F.lit(0).cast("long").alias("n_bytes"),
        F.lit("-").alias("sha256_hex"),
        "_p_png", "_p_jpeg", "_p_gif", "_p_bmp", "_p_tiff", "_p_wav",
    )
    out = {r.media_id: r for r in multimodal.parse_media_headers(base).collect()}
    for mid in (1, 2):
        r = out[mid]
        assert r.width is None and r.jpeg_w is None and r.gif_w is None
        assert r.bmp_w is None and r.tiff_w is None and r.wav_channels is None

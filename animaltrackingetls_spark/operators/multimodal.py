"""Multimodal (binary) column plumbing.

Images/audio/video travel as opaque ``binary`` columns plus a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker touches a whole batch of payloads
at once. The actual codec step is STUBBED (media libraries are not in
this environment): ``decode_stub`` either raises ``NotImplementedError``
(strict mode) or produces a deterministic fake decode — the Spark-side
plumbing (schema, batching, partition sizing) is real and tested.

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` moderate, never groupBy/shuffle the
payload itself (shuffle metadata + an id and re-join), and let
``spark.read.format("binaryFile")`` do the scan for file-backed corpora
(analogous to the reference's PNG tile fetch,
openweatherbasicmap.py:23-34 — SURVEY.md §2.1 S6).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256_hex", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_expr, content_type: str) -> DataFrame:
    """Wrap any source into the canonical media-table shape:
    (media_id, content_type, payload binary, n_bytes, sha256_hex).
    Metadata is computed JVM-side — no Python touches the payload here."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(content_type).alias("content_type"),
        payload_expr.cast("binary").alias("payload"),
        F.octet_length(payload_expr.cast("binary")).cast("long").alias("n_bytes"),
        F.lower(F.sha2(payload_expr.cast("binary"), 256)).alias("sha256_hex"),
    )


def read_binary_dir(spark, path: str, glob: str | None = None) -> DataFrame:
    """File-backed media corpus via the built-in binaryFile source."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def decode_stub(payload: bytes, content_type: str, strict: bool = False) -> list[float]:
    """STUB decode/feature-extract. Real deployments swap in PIL/ffmpeg
    etc.; this container has neither, so strict mode raises and the
    default returns a deterministic 8-dim byte-histogram feature."""
    if strict:
        raise NotImplementedError(
            f"media decode for {content_type} requires codec libraries not "
            "present in this environment"
        )
    buckets = [0] * 8
    for byte in payload[:4096]:
        buckets[byte >> 5] += 1
    total = max(1, min(len(payload), 4096))
    return [b / total for b in buckets]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas: each batch arrives as a pandas DataFrame of payloads;
    decode runs per element inside the batch (vectorize further inside a
    real codec). Output drops the payload — features only travel onward.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                decode_stub(p, ct)
                for p, ct in zip(pdf["payload"], pdf["content_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)

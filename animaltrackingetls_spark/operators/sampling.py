"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-deterministic only for a fixed partitioning —
repartition the input and the sample changes, which is unacceptable for
reproducible dataset builds. These operators decide membership from a
content hash of the row's id: the same row is in or out regardless of
partitioning, cluster size, or engine (md5 is universal, so the exact
sample is reproducible in any SQL engine for auditing).

Mechanism: the first 4 hex chars of md5(id) are a uniform draw over
65536 buckets; a rate maps to a hex threshold and membership is a
string comparison — pure codegen, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 65536


def _threshold_hex(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sample rate must be in [0, 1], got {rate}")
    return format(int(round(rate * _BUCKETS)), "04x")


def sample_hash_bucket(c: Column) -> Column:
    """The row's 4-hex-digit md5 bucket (uniform over 65536)."""
    return F.substring(F.md5(c.cast("string")), 1, 4)


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ≈``rate`` of rows, membership decided by md5(id) bucket —
    partitioning-independent and reproducible across engines."""
    return df.filter(sample_hash_bucket(F.col(id_col)) < _threshold_hex(rate))


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` semantics, but
    reproducible): each stratum keeps its own rate; strata absent from
    ``rates`` are dropped (matching ``sampleBy``)."""
    bucket = sample_hash_bucket(F.col(id_col))
    pred = F.lit(False)
    for stratum, rate in rates.items():
        pred = pred | (
            (F.col(strata_col) == stratum) & (bucket < _threshold_hex(rate))
        )
    return df.filter(pred)

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


def _threshold_hex(rate: float) -> str | None:
    """4-hex-digit exclusive upper bound, or None for keep-everything.

    rate≈1.0 rounds to 65536 → '10000', a 5-char string that compares
    lexicographically BELOW 'ffff' and would silently keep ~6% — so full
    rates return None and callers skip the filter entirely.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sample rate must be in [0, 1], got {rate}")
    bucket = int(round(rate * _BUCKETS))
    if bucket >= _BUCKETS:
        return None
    return format(bucket, "04x")


def sample_hash_bucket(c: Column) -> Column:
    """The row's 4-hex-digit md5 bucket (uniform over 65536)."""
    return F.substring(F.md5(c.cast("string")), 1, 4)


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ≈``rate`` of rows, membership decided by md5(id) bucket —
    partitioning-independent and reproducible across engines."""
    thr = _threshold_hex(rate)
    if thr is None:
        return df
    return df.filter(sample_hash_bucket(F.col(id_col)) < thr)


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` semantics, but
    reproducible): each stratum keeps its own rate; strata absent from
    ``rates`` are dropped (matching ``sampleBy``)."""
    bucket = sample_hash_bucket(F.col(id_col))
    pred = F.lit(False)
    for stratum, rate in rates.items():
        thr = _threshold_hex(rate)
        stratum_pred = F.col(strata_col) == stratum
        if thr is not None:
            stratum_pred = stratum_pred & (bucket < thr)
        pred = pred | stratum_pred
    return df.filter(pred)

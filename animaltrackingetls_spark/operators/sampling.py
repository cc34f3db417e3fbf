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


def mixture_resample(
    df: DataFrame, id_col: str, group_col: str, rates: dict[str, float]
) -> DataFrame:
    """Domain-mixture resampling: per-group rates that may EXCEED 1.

    Training mixes are specified as per-source weights ("2.3 epochs of
    src0, 0.4 of src1"); a rate r decomposes into ``floor(r)`` full
    replications plus a fractional epoch decided by the row's md5
    bucket — the same partitioning-independent draw as
    :func:`deterministic_sample`, so the exact resampled set is
    reproducible in any engine. Groups absent from ``rates`` are
    dropped (they're not in the mix).

    Output adds an ``epoch`` column (1-based) distinguishing the
    replicas — downstream shuffles/packing treat each replica as a row.

    Scale shape: replication is ``explode(sequence(...))`` on the scan
    (a Generate — map-only, no shuffle); membership is a string compare
    on a hash prefix. The output is ~sum(r_g·|g|) rows; nothing is
    materialized driver-side. NOTE ``F.sequence(1, 0)`` silently
    DESCENDS instead of returning empty, so the zero-copy case is
    guarded with an explicit empty array.
    """
    bucket = sample_hash_bucket(F.col(id_col))
    n_copies: Column = F.lit(None).cast("int")
    for group, rate in rates.items():
        if rate < 0:
            raise ValueError(f"mixture rate must be >= 0, got {rate} for {group!r}")
        whole = int(rate)
        frac_thr = _threshold_hex(rate - whole)
        copies = F.lit(whole)
        if frac_thr is not None and frac_thr != "0000":
            copies = copies + F.when(bucket < frac_thr, 1).otherwise(0)
        n_copies = F.when(F.col(group_col) == group, copies).otherwise(n_copies)
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") >= 1)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(1), F.col("_n_copies"))),
        )
        .drop("_n_copies")
    )


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

"""Product quantization (PQ) for embedding similarity at memory scale.

The similarity tier's existing paths trade recall for compute (LSH,
IVF partition pruning) or halve wire bytes (int8 scalar quantization,
similarity.py:811). PQ attacks the third axis — STORAGE: split each
``dim``-dimensional vector into ``m`` subspaces, k-means each subspace
to ``2^nbits`` centroids, and store only the ``m`` centroid ids
(``m`` bytes at ``nbits=8``). A 64-dim float64 corpus compresses
512 B → 8 B per vector (64x): at 100 TB of raw embeddings, the PQ
codes for the WHOLE corpus fit on a modest cluster's RAM, which is
what makes exhaustive re-ranking candidate scans feasible at all
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 2011 — public literature, not reference code;
the reference repo has no similarity tier at all).

Search is ADC (asymmetric distance computation): the query stays
full-precision, one ``(m, k)`` lookup table of query-subvector →
centroid distances is built driver-side (k·m ≤ 2048 floats — broadcast
by closure), and each corpus vector's approximate distance is ``m``
table lookups summed — a vectorized Arrow batch op, no JVM→Python
per-row cost, no shuffle until the final distributed top-k
(TakeOrderedAndProject, same shape as similarity.brute_force_topk).

Scale posture: training collects a bounded sample (``max_train_rows``,
same md5-bucket thinning as similarity.ivf_index); encode is one
mapInArrow-class pass over the corpus (embarrassingly parallel, no
shuffle); codes persist next to the id column as an 8-byte binary —
at serving time the float vectors never need to be read again.
Composes with the IVF layout: encode each cell's residuals or raw
vectors and store ``pq_code`` as a column of the partitioned index to
scan only probed cells (the docstring of ivf_search documents cell
pruning; PQ shrinks what each probed partition reads).
"""

# NOTE: no ``from __future__ import annotations`` here — pandas_udf
# infers UDF types from *evaluated* annotations; stringified ones raise
# UNSUPPORTED_SIGNATURE (same constraint as operators/aggregates.py).
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, DoubleType, LongType

from .similarity import _as_double, _check_dim, _kmeanspp_lloyd

__all__ = [
    "PQCodebooks",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "pq_topk_rerank",
]


@dataclass(frozen=True)
class PQCodebooks:
    """Trained PQ codebooks: ``m`` subspaces × ``k`` centroids each of
    ``dim // m`` dims, as plain nested lists (picklable, ships inside
    UDF closures without a broadcast round-trip)."""

    m: int
    k: int
    dim: int
    metric: str  # "l2" | "ip"
    books: list[list[list[float]]]  # m × k × (dim // m)

    @property
    def dsub(self) -> int:
        return self.dim // self.m


def _np_books(cb: PQCodebooks):
    return [np.asarray(b, dtype=np.float64) for b in cb.books]


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    nbits: int = 8,
    metric: str = "l2",
    seed: int = 42,
    max_train_rows: int = 25_000,
    id_col: str = "vec_id",
) -> PQCodebooks:
    """Train PQ codebooks on a bounded, deterministic corpus sample.

    ``m`` must divide ``dim``; ``k = 2^nbits ≤ 256`` keeps one code in
    one byte. Training runs ``m`` INDEPENDENT sample-local k-means fits
    (kmeans++ + Lloyd, best of restarts — similarity._kmeanspp_lloyd),
    one per subspace, on at most ``max_train_rows`` rows thinned by the
    same partitioning-independent md5-bucket rule ivf_index uses. The
    driver work is O(max_train_rows · dim) — independent of corpus
    size; the corpus itself is touched only by the sampling filter.
    """
    if dim % m != 0:
        raise ValueError(f"pq_train: m={m} must divide dim={dim}")
    if not 1 <= nbits <= 8:
        raise ValueError(f"pq_train: nbits must be in [1, 8], got {nbits}")
    if metric not in ("l2", "ip"):
        raise ValueError(f"pq_train: metric must be l2|ip, got {metric!r}")
    _check_dim(corpus, vec_col, dim, "pq_train")
    k = 1 << nbits

    c = corpus.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    )
    n = c.count()
    if n == 0:
        raise ValueError("pq_train: corpus is empty")
    train = c
    if n > max_train_rows:
        frac_hex = int(65536 * max_train_rows / n)
        train = c.filter(
            F.conv(
                F.substring(F.md5(F.col("n_id").cast("string")), 1, 4), 16, 10
            ).cast("long")
            < F.lit(frac_hex)
        )
    sample = np.asarray(
        [r["n_vec"] for r in train.select("n_vec").collect()], dtype=np.float64
    )
    if len(sample) < k:
        raise ValueError(
            f"pq_train: training sample ({len(sample)} rows) smaller than "
            f"k={k} centroids — lower nbits or raise max_train_rows"
        )
    dsub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = np.ascontiguousarray(sample[:, j * dsub : (j + 1) * dsub])
        centers = _kmeanspp_lloyd(sub, k, seed + j, max_iter=25)
        books.append([[float(x) for x in row] for row in centers])
    return PQCodebooks(m=m, k=k, dim=dim, metric=metric, books=books)


def pq_encode(
    df: DataFrame,
    codebooks: PQCodebooks,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
    layout: str = "long",
) -> DataFrame:
    """Append the PQ code of ``vec_col``.

    ``layout="long"`` (default when ``m * nbits <= 64``) packs the
    ``m`` centroid ids big-endian into ONE BIGINT — byte j is
    ``(code >> 8*(m-1-j)) & 255``, extractable by pure integer
    arithmetic under every scorer impl, and the faster layout under
    both (1M×64d measured, SCALING.md round 9: arrow 0.56 s vs 0.68 s
    binary, expr 1.43 s vs 1.76 s binary; on-disk 12.1 MB vs the
    520 MB float corpus, 43×). ``layout="binary"`` stores the raw
    ``m`` bytes — required when ``m * nbits > 64`` and the
    wire-compatible form for external consumers of standard PQ codes.

    One vectorized Arrow pass either way: each batch argmin-assigns
    every subvector to its nearest subspace centroid (||v_j − c||² via
    the expanded form, one small GEMM per subspace per batch). No
    shuffle; the output column is what a serving layout persists so the
    raw floats never need to be scanned again.
    """
    if layout not in ("long", "binary"):
        raise ValueError(f"pq_encode: layout must be long|binary, got {layout!r}")
    if layout == "long" and codebooks.m * 8 > 64:
        raise ValueError(
            f"pq_encode: layout='long' packs m bytes into 64 bits; "
            f"m={codebooks.m} needs layout='binary'"
        )
    cb = codebooks
    books = None  # lazily materialized numpy views inside the worker
    as_long = layout == "long"

    @F.pandas_udf(LongType() if as_long else BinaryType())
    def _encode(vecs: pd.Series) -> pd.Series:
        nonlocal books
        if books is None:
            books = _np_books(cb)
        out: list = [None] * len(vecs)
        live = [i for i, v in enumerate(vecs) if v is not None]
        if not live:
            return pd.Series(out, dtype=object)
        V = np.asarray(
            [np.asarray(vecs.iloc[i], dtype=np.float64) for i in live]
        )
        codes = np.empty((len(V), cb.m), dtype=np.uint8)
        for j in range(cb.m):
            sub = V[:, j * cb.dsub : (j + 1) * cb.dsub]
            B = books[j]  # (k, dsub)
            # ||v - c||^2 = ||v||^2 - 2 v·c + ||c||^2 ; ||v||^2 is
            # constant per row, drop it from the argmin
            d = sub @ B.T  # (b, k)
            d = (B * B).sum(axis=1)[None, :] - 2.0 * d
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        if as_long:
            packed = np.zeros(len(V), dtype=np.uint64)
            for j in range(cb.m):
                packed = (packed << np.uint64(8)) | codes[:, j].astype(
                    np.uint64
                )
            # two's-complement reinterpretation: m=8 codes with a high
            # first byte exceed Long.MAX as unsigned — the scorer's
            # shiftrightunsigned reads the bit pattern, not the sign
            signed = packed.view(np.int64)
            for row, i in enumerate(live):
                out[i] = int(signed[row])
        else:
            for row, i in enumerate(live):
                out[i] = codes[row].tobytes()
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col, _encode(_as_double(F.col(vec_col))))


def _adc_lut(codebooks: PQCodebooks, query: list[float]):
    """(m, k) ADC lookup table: distance/score of the query's j-th
    subvector to every centroid of book j. Driver-side, ≤ m·k floats."""
    cb = codebooks
    q = np.asarray(query, dtype=np.float64)
    if q.shape != (cb.dim,):
        raise ValueError(
            f"pq_topk: query has {q.shape[0] if q.ndim == 1 else '?'} dims, "
            f"codebooks expect {cb.dim}"
        )
    lut = np.empty((cb.m, cb.k), dtype=np.float64)
    books = _np_books(cb)
    for j in range(cb.m):
        qj = q[j * cb.dsub : (j + 1) * cb.dsub]
        B = books[j]
        if cb.metric == "l2":
            diff = B - qj[None, :]
            lut[j] = (diff * diff).sum(axis=1)
        else:  # inner product
            lut[j] = B @ qj
    return lut


def pq_adc_score_expr(
    codebooks: PQCodebooks,
    query: list[float],
    code_col: Column,
    impl: str = "arrow",
    layout: str = "long",
) -> Column:
    """ADC score of a PQ code column against one full-precision query.
    L2 returns a distance (smaller = closer); ip returns a score
    (larger = closer); a NULL code yields a NULL score under every
    impl × layout combination.

    ``impl="arrow"`` (default) scores each Arrow batch with one numpy
    fancy-gather over the (m, k) lookup table — the measured fast path
    (1M×64d codes, SCALING.md round 9: 0.56 s vs 1.43 s for expr over
    long codes; numpy's vectorized gather beats per-row codegen
    lookups even though the expr plan is fully whole-stage-compiled).
    ``impl="expr"`` embeds the lookup table as ``m`` constant-folded
    array literals and scores with ``m`` byte-extract + element_at
    lookups summed — ~2.5× slower, but zero Python workers in the
    plan: use it where the score must stay inside a single codegen
    stage or Python workers are unavailable. Over ``layout="long"``
    codes the byte extract is ``shiftrightunsigned & 255`` (pure
    integer arithmetic); over ``layout="binary"`` it round-trips hex
    strings per row (1.76 s measured) — prefer long codes for expr.
    """
    if impl not in ("expr", "arrow"):
        raise ValueError(f"pq_adc_score_expr: impl must be expr|arrow, got {impl!r}")
    if layout not in ("long", "binary"):
        raise ValueError(
            f"pq_adc_score_expr: layout must be long|binary, got {layout!r}"
        )
    cb = codebooks
    lut = _adc_lut(codebooks, query)
    if impl == "expr":
        total = None
        for j in range(cb.m):
            if layout == "long":
                # big-endian pack: byte j sits at bit offset 8*(m-1-j);
                # unsigned shift reads the bit pattern even when m=8
                # codes went negative under two's complement
                shift = 8 * (cb.m - 1 - j)
                byte_j = (
                    F.shiftrightunsigned(code_col, shift)
                    .bitwiseAND(F.lit(255))
                    .cast("int")
                )
            else:
                # byte j of the code as an int 0..255: substring is
                # 1-based on binary, hex → 2-char string, conv → long
                byte_j = F.conv(
                    F.hex(F.substring(code_col, j + 1, 1)), 16, 10
                ).cast("int")
            arr = F.array(*[F.lit(float(x)) for x in lut[j]])
            term = F.element_at(arr, byte_j + F.lit(1))
            total = term if total is None else total + term
        # the isNotNull guard is LOAD-BEARING: element_at with a NULL
        # index does not return NULL — it resolves like index -1 and
        # returns the LAST element (observed on Spark 4.1), so without
        # the guard a NULL code would score as the k-1 centroid sum
        return F.when(code_col.isNotNull(), total)

    if layout == "long":
        # do NOT ship the long into Python: Arrow→pandas renders a
        # nullable int64 column as float64, which NaNs the nulls and —
        # worse — silently rounds packed codes above 2^53. Re-expand to
        # the m raw bytes JVM-side (hex drops leading zeros; lpad
        # restores them; negative m=8 codes hex to the full 16 chars)
        # and reuse the binary scorer.
        code_col = F.unhex(F.lpad(F.hex(code_col), 2 * cb.m, "0"))

    @F.pandas_udf(DoubleType())
    def _score(codes: pd.Series) -> pd.Series:
        # object dtype so a NULL code yields a NULL score (NaN would
        # sort FIRST under the ip metric's descending order)
        out: list = [None] * len(codes)
        live = [i for i, c in enumerate(codes) if c is not None]
        if live:
            C = np.frombuffer(
                b"".join(codes.iloc[i] for i in live), dtype=np.uint8
            ).reshape(-1, cb.m)
            scores = lut[np.arange(cb.m)[None, :], C].sum(axis=1)
            for row, i in enumerate(live):
                out[i] = float(scores[row])
        return pd.Series(out, dtype=object)

    return _score(code_col)


def pq_topk(
    encoded: DataFrame,
    codebooks: PQCodebooks,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    impl: str = "arrow",
) -> DataFrame:
    """Top-k by ADC over an encoded corpus → (id, pq_score).

    The scan reads (id, m-byte code) ONLY — 64x fewer bytes than the
    float corpus — and the only shuffle is the distributed partial
    top-k (each partition keeps k, TakeOrderedAndProject merges).
    L2 sorts ascending (distance), ip descending (score); ties break
    on id for determinism.
    """
    if k < 1:
        raise ValueError(f"pq_topk: k must be >= 1, got {k}")
    layout = (
        "long"
        if isinstance(encoded.schema[code_col].dataType, LongType)
        else "binary"
    )
    scored = encoded.select(
        F.col(id_col),
        pq_adc_score_expr(
            codebooks, query, F.col(code_col), impl=impl, layout=layout
        ).alias("pq_score"),
    )
    order = (
        [F.col("pq_score").asc_nulls_last(), F.col(id_col).asc()]
        if codebooks.metric == "l2"
        else [F.col("pq_score").desc_nulls_last(), F.col(id_col).asc()]
    )
    return scored.orderBy(*order).limit(k)


def pq_topk_rerank(
    encoded: DataFrame,
    codebooks: PQCodebooks,
    query: list[float],
    k: int = 10,
    oversample: int = 5,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    vec_col: str = "embedding",
    impl: str = "arrow",
    fetch: str = "pushdown",
) -> DataFrame:
    """PQ shortlist → exact rerank: the production serving shape.

    Plain ADC ranking degrades exactly where it matters least — among
    near-tied neighbors whose true distances are smaller than the
    quantization error (measured on tight clusters: recall@10 is 0.44
    at nbits=4 but the exact top-10 sits INSIDE the ADC top-50 93% of
    the time, and 100% at nbits=8 — tests/test_pq.py). So serve in two
    stages: (1) ADC over the m-byte codes picks ``k * oversample``
    candidates — the corpus-wide pass touches only id + code bytes;
    (2) the true metric is computed on the candidates ONLY, then exact
    top-k. How the candidates' float vectors are fetched is the whole
    game at scale:

    ``fetch="pushdown"`` (default) collects the ≤ k·oversample
    shortlist ids driver-side (a bounded eager action at plan-
    construction time — same documented precedent as
    ivf_search(prune_cells=True)) and filters the corpus with an
    ``isin`` IN-list that parquet receives as a pushed filter, so
    row-group statistics skip everything but the shortlist's groups
    when the layout is id-sorted. ``fetch="join"`` keeps the
    fully-lazy broadcast semi-join — correct everywhere but must READ
    the whole float column on sources without dynamic pruning (1M×64d
    measured, SCALING.md round 9: pushdown 1.59 s vs join 1.75 s on
    local NVMe where the extra read is cheap; end-to-end either form
    beats the 14.1 s full-precision brute-force scan ~9× because the
    corpus-wide work is the 12 MB code scan, not the 520 MB float
    scan).
    """
    if oversample < 1:
        raise ValueError(f"pq_topk_rerank: oversample must be >= 1, got {oversample}")
    if fetch not in ("pushdown", "join"):
        raise ValueError(
            f"pq_topk_rerank: fetch must be pushdown|join, got {fetch!r}"
        )
    shortlist = pq_topk(
        encoded, codebooks, query, k=k * oversample,
        id_col=id_col, code_col=code_col, impl=impl,
    ).select(id_col)
    qlit = F.array(*[F.lit(float(x)) for x in query])
    vec = _as_double(F.col(vec_col))
    if codebooks.metric == "l2":
        diff = F.zip_with(vec, qlit, lambda a, b: (a - b) * (a - b))
        exact = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
        order = [F.col("exact_score").asc_nulls_last(), F.col(id_col).asc()]
    else:
        prod = F.zip_with(vec, qlit, lambda a, b: a * b)
        exact = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        order = [F.col("exact_score").desc_nulls_last(), F.col(id_col).asc()]
    if fetch == "pushdown":
        ids = [r[id_col] for r in shortlist.collect()]
        if not ids:
            candidates = encoded.filter(F.lit(False))
        else:
            candidates = encoded.filter(F.col(id_col).isin(ids))
    else:
        candidates = encoded.join(F.broadcast(shortlist), id_col)
    return (
        candidates.select(F.col(id_col), exact.alias("exact_score"))
        .orderBy(*order)
        .limit(k)
    )

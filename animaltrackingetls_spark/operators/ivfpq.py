"""IVF-PQ: coarse cells × product-quantized residuals — the 100 TB
ANN serving composition.

The two ANN tiers each attack ONE axis: IVF (similarity.py) prunes
WHICH rows a search reads (partition-pruned probe cells) but stores
full-precision vectors; PQ (pq.py) shrinks WHAT a scan reads per row
(m code bytes vs dim floats) but still scans the whole corpus. IVF-PQ
composes them the way Jégou et al.'s IVFADC system does (public
literature, "Product Quantization for Nearest Neighbor Search", IEEE
TPAMI 2011 §V; the reference repo has no similarity tier at all):

* a coarse k-means quantizer assigns every vector to a cell;
* PQ encodes the RESIDUAL ``v − centroid(cell)`` — residuals
  concentrate near zero, so the same codebook budget quantizes them
  with far less error than raw vectors (measured in tests: residual
  recall strictly dominates raw-vector recall at equal m/nbits);
* the index on disk is ``partitionBy(cell)`` over ``(id, pq_code)``
  ONLY — no float column in the serving table;
* a search probes ``n_probe`` cells (partition pruning lists just
  those directories), builds one per-cell ADC lookup table driver-side
  (the query's residual differs per cell — LUTs are ``n_probe × m × k``
  floats, closure-shipped), scores each candidate with one numpy
  gather per Arrow batch, and returns the global top-k.

Scale posture: the corpus-wide costs are all build-time (one coarse
train on a bounded sample, one residual-encode Arrow pass, one
clustered partitioned write). A search reads ``n_probe/n_cells`` of
the code bytes — at 100 TB of float embeddings that is n_probe cells
of an ~2 TB code table — and every per-query driver artifact (probe
list, LUTs) is bounded by ``n_probe·m·k``, never by corpus size.
Exact re-ranking composes via :func:`pq.pq_topk_rerank`'s pushdown
pattern against a separately-stored float table.
"""

# NOTE: no ``from __future__ import annotations`` — pandas_udf needs
# evaluated annotations (same constraint as operators/aggregates.py).
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .pq import PQCodebooks, _adc_lut, _np_books, pq_train
from .similarity import _as_double, _check_dim, _kmeanspp_lloyd

__all__ = ["ivfpq_build", "ivfpq_search", "ivfpq_search_rerank", "load_ivfpq_meta"]


def _md5_thin(df: DataFrame, id_col: str, n: int, cap: int) -> DataFrame:
    """Partitioning-independent deterministic thinning to ~cap rows —
    the same md5-bucket rule ivf_index/pq_train use."""
    if n <= cap:
        return df
    frac_hex = int(65536 * cap / n)
    return df.filter(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
        ).cast("long")
        < F.lit(frac_hex)
    )


def ivfpq_build(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 16,
    m: int = 8,
    nbits: int = 8,
    seed: int = 42,
    max_train_rows: int = 25_000,
    residual: bool = True,
) -> None:
    """Build and persist an IVF-PQ index at ``path``.

    Layout: ``path/codes`` — ``(n_id, pq_code)`` partitioned by
    ``cell`` (long-packed codes, one file per cell via the clustered
    write — same write pathology fix as save_ivf_index); ``path/meta``
    — one tiny JSON sidecar holding the coarse centroids and the PQ
    codebooks (≤ n_cells·dim + m·2^nbits·dim/m floats — KBs, not
    data).

    Training is driver-bounded twice over: the coarse k-means AND the
    PQ fit each see at most ``max_train_rows`` md5-thinned rows; the
    full corpus is touched by exactly two narrow passes (cell
    assignment, residual encode — fused into one Arrow UDF) plus the
    partitioned write's cell-clustering shuffle.

    ``residual=False`` encodes raw vectors instead (cells then only
    prune, sharing one global codebook quality-wise with pq.py) —
    kept for A/B because residual encoding is strictly better on
    every corpus measured (tests pin the dominance).
    """
    if dim % m != 0:
        raise ValueError(f"ivfpq_build: m={m} must divide dim={dim}")
    if m * 8 > 64:
        raise ValueError(
            f"ivfpq_build: codes are long-packed (m bytes ≤ 8), got m={m}"
        )
    _check_dim(corpus, vec_col, dim, "ivfpq_build")

    c = corpus.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).filter(F.col("n_vec").isNotNull())
    n = c.count()
    if n == 0:
        raise ValueError("ivfpq_build: corpus is empty")

    # 1) coarse quantizer on a bounded sample
    sample = np.asarray(
        [
            r["n_vec"]
            for r in _md5_thin(c, "n_id", n, max_train_rows)
            .select("n_vec")
            .collect()
        ],
        dtype=np.float64,
    )
    if len(sample) < n_cells:
        raise ValueError(
            f"ivfpq_build: training sample ({len(sample)} rows) smaller "
            f"than n_cells={n_cells} — lower n_cells or raise max_train_rows"
        )
    centers = _kmeanspp_lloyd(sample, n_cells, seed, max_iter=25)
    centers_list = [[float(x) for x in row] for row in centers]

    # 2) PQ books on the SAME sample's residuals (or raw vectors):
    # sample-local, no second corpus pass
    C = np.asarray(centers, dtype=np.float64)
    c2 = np.einsum("ij,ij->i", C, C)
    cells_s = (c2[None, :] - 2.0 * (sample @ C.T)).argmin(axis=1)
    train_vecs = sample - C[cells_s] if residual else sample
    spark = corpus.sparkSession
    from ..io import local_df_single_partition

    train_df = local_df_single_partition(
        spark,
        [(i, [float(x) for x in v]) for i, v in enumerate(train_vecs)],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(
        train_df, dim=dim, m=m, nbits=nbits, seed=seed,
        max_train_rows=len(train_vecs),
    )

    # 3) one fused Arrow pass: assign cell + encode (residual) code
    cb = books
    use_res = residual

    @F.pandas_udf("cell int, pq_code long")
    def _assign_encode(vecs: pd.Series) -> pd.DataFrame:
        V = np.asarray(vecs.tolist(), dtype=np.float64)
        cells = (c2[None, :] - 2.0 * (V @ C.T)).argmin(axis=1)
        E = V - C[cells] if use_res else V
        nb = _np_books(cb)
        packed = np.zeros(len(V), dtype=np.uint64)
        for j in range(cb.m):
            sub = E[:, j * cb.dsub : (j + 1) * cb.dsub]
            B = nb[j]
            d = (B * B).sum(axis=1)[None, :] - 2.0 * (sub @ B.T)
            packed = (packed << np.uint64(8)) | d.argmin(axis=1).astype(
                np.uint64
            )
        return pd.DataFrame(
            {"cell": cells.astype("int32"), "pq_code": packed.view(np.int64)}
        )

    coded = c.select(
        "n_id", _assign_encode(F.col("n_vec")).alias("a")
    ).select("n_id", F.col("a.cell").alias("cell"), F.col("a.pq_code").alias("pq_code"))
    (
        coded.repartition(n_cells, "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    meta = {
        "dim": dim, "n_cells": n_cells, "m": m, "nbits": nbits,
        "seed": seed, "residual": residual, "metric": "l2",
        "centers": centers_list, "books": books.books,
    }
    os.makedirs(path, exist_ok=True)
    tmp = f"{path}/meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{path}/meta.json")


def load_ivfpq_meta(path: str) -> dict:
    """The index's sidecar: coarse centroids + PQ books + params.
    KB-sized by construction — never corpus data."""
    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    need = {"dim", "n_cells", "m", "nbits", "residual", "centers", "books"}
    missing = need - set(meta)
    if missing:
        raise ValueError(f"corrupt IVF-PQ meta at {path!r}: missing {sorted(missing)}")
    return meta


def ivfpq_search(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Search a built IVF-PQ index → ``(vec_id, pq_score)``, L2
    ascending (approximate distances; ties break on id).

    Driver work is index-metadata-sized: rank the coarse centroids to
    pick the ``n_probe`` probe cells, then build one ADC lookup table
    PER PROBED CELL from the query's cell-relative residual
    (``n_probe × m × 2^nbits`` floats, closure-shipped). The scan
    carries a static ``cell IN (...)`` that the partitionBy("cell")
    layout turns into PartitionFilters — only the probed directories
    are listed or read, and what they hold is (id, 8-byte code), not
    floats. Scoring is one numpy LUT-gather per Arrow batch keyed by
    the row's cell; the only shuffle is the final distributed top-k.
    ``residual=False`` indexes degenerate to one shared LUT (query vs
    raw-vector books) — same code path, cell key ignored by value.
    """
    if k < 1:
        raise ValueError(f"ivfpq_search: k must be >= 1, got {k}")
    meta = load_ivfpq_meta(path)
    dim, m, nbits = meta["dim"], meta["m"], meta["nbits"]
    q = np.asarray(query, dtype=np.float64)
    if q.shape != (dim,):
        raise ValueError(
            f"ivfpq_search: query has {q.shape[0] if q.ndim == 1 else '?'} "
            f"dims, index expects {dim}"
        )
    C = np.asarray(meta["centers"], dtype=np.float64)
    n_probe = max(1, min(int(n_probe), len(C)))
    d2 = np.einsum("ij,ij->i", C, C) - 2.0 * (C @ q)
    probe_cells = [int(x) for x in np.argsort(d2, kind="stable")[:n_probe]]

    books = PQCodebooks(
        m=m, k=1 << nbits, dim=dim, metric="l2", books=meta["books"],
    )
    # per-cell LUTs over the query's cell residual; ||q−x||² ≈
    # ||(q−c) − r||² with x = c + r, so the ADC table for cell c is the
    # plain PQ table of (q − c). Raw-vector indexes use q itself.
    luts = {
        cell: _adc_lut(
            books, (q - C[cell]) if meta["residual"] else q
        )
        for cell in probe_cells
    }

    @F.pandas_udf(DoubleType())
    def _score(cells: pd.Series, codes: pd.Series) -> pd.Series:
        out: list = [None] * len(codes)
        cell_arr = cells.to_numpy()
        live = [i for i, c in enumerate(codes) if c is not None]
        if live:
            packed = np.asarray(
                [codes.iloc[i] for i in live], dtype=np.int64
            ).view(np.uint64)
            Cd = np.empty((len(live), m), dtype=np.intp)
            for j in range(m):
                Cd[:, j] = (
                    (packed >> np.uint64(8 * (m - 1 - j))) & np.uint64(255)
                ).astype(np.intp)
            L = np.stack([luts[c] for c in probe_cells])  # (p, m, k)
            cell_to_slot = {c: s for s, c in enumerate(probe_cells)}
            slots = np.asarray(
                [cell_to_slot[int(cell_arr[i])] for i in live], dtype=np.intp
            )
            scores = L[slots[:, None], np.arange(m)[None, :], Cd].sum(axis=1)
            for row, i in enumerate(live):
                out[i] = float(scores[row])
        return pd.Series(out, dtype=object)

    codes = spark.read.parquet(f"{path}/codes").select(
        "n_id", "pq_code", F.col("cell").cast("int").alias("cell")
    )
    # codes are non-null by construction (build drops null vectors);
    # the filter ENFORCES it so no Arrow batch ever carries a null —
    # a nullable int64 batch would land in pandas as float64 and
    # silently round codes above 2^53 (same hazard pq.py documents)
    scored = codes.filter(
        F.col("cell").isin(probe_cells) & F.col("pq_code").isNotNull()
    ).select(
        F.col("n_id").alias("vec_id"),
        _score(F.col("cell"), F.col("pq_code")).alias("pq_score"),
    )
    return scored.orderBy(
        F.col("pq_score").asc_nulls_last(), F.col("vec_id").asc()
    ).limit(k)


def ivfpq_search_rerank(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    oversample: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ shortlist → exact rerank — the full IVFADC serving shape
    (coarse cells prune rows, residual codes prune bytes, exact math
    only on the shortlist).

    Stage 1 is :func:`ivfpq_search` with ``k * oversample``: the
    corpus-wide work reads only the probed cells' 8-byte codes. Stage 2
    collects the ≤ k·oversample shortlist ids (bounded driver action,
    the pq_topk_rerank precedent) and fetches ONLY those rows' float
    vectors from ``corpus`` via an ``isin`` IN-list parquet receives as
    a pushed filter — on an id-sorted layout that is a row-group point
    read, so the float column is never scanned corpus-wide. Exact L2
    is computed with codegen ``zip_with``/``aggregate`` (no Python),
    ties break on id.

    Residual-ADC ranks well but its distances are approximations; the
    rerank restores exact ordering among near-ties at the cost of
    reading k·oversample float rows — recall@k of the reranked result
    can only improve over raw ADC (pinned in tests/test_ivfpq.py).
    """
    if oversample < 1:
        raise ValueError(
            f"ivfpq_search_rerank: oversample must be >= 1, got {oversample}"
        )
    missing = [c for c in (id_col, vec_col) if c not in corpus.columns]
    if missing:
        raise ValueError(f"ivfpq_search_rerank: corpus lacks {missing}")
    shortlist = ivfpq_search(
        spark, path, query, k=k * oversample, n_probe=n_probe
    )
    ids = [r["vec_id"] for r in shortlist.select("vec_id").collect()]
    if not ids:
        candidates = corpus.filter(F.lit(False))
    else:
        candidates = corpus.filter(F.col(id_col).isin(ids))
    qlit = F.array(*[F.lit(float(x)) for x in query])
    vec = F.col(vec_col).cast("array<double>")
    diff = F.zip_with(vec, qlit, lambda a, b: (a - b) * (a - b))
    exact = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
    return (
        candidates.select(
            F.col(id_col).alias("vec_id"), exact.alias("exact_score")
        )
        .orderBy(F.col("exact_score").asc_nulls_last(), F.col("vec_id").asc())
        .limit(k)
    )

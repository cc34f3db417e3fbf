"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — corpus scanned once, query side
broadcast (queries ≪ corpus always holds for ANN serving), ranking via a
per-query window. The dot product is a JVM-side ``aggregate`` over
``zip_with`` — sequential fold in array order, so results are
bit-deterministic (important for oracle comparison and for reproducible
top-k cuts).

Scale path: random-hyperplane LSH bucketing — each vector lands in
2^p sign-buckets (with multi-probe via several tables); candidates are
bucket-joined, exact cosine re-ranks. Corpus bucketing is a narrow map;
the join shuffles only (table, bucket) keys. An IVF variant would swap
hyperplanes for k-means centroids; hyperplanes keep it dependency-free
and fully deterministic.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine given precomputed norms. Higher-order functions
    (zip_with/aggregate) are CodegenFallback — interpreted per call — so
    a pair expression must run ONE of them (the dot), not three: compute
    each vector's norm once per row upstream and reference it here.
    Numerically identical to ``cosine_expr`` (same fold order)."""
    return dot_expr(a, b) / (na * nb)


def _as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: one scan of the corpus, broadcast-nested-loop join against
    the (small) query set, window row_number per query. No corpus shuffle
    until the final per-query ranking, which AQE coalesces.

    ``round_digits`` rounds similarities BEFORE ranking — use when
    comparing against an external engine whose floating-point reduction
    order differs (ranking on rounded values is cross-engine stable).
    """
    c = corpus.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumn("n_nrm", norm_expr(F.col("n_vec")))
    q = queries.select(
        F.col(query_id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", norm_expr(F.col("q_vec")))
    sim = cosine_with_norms(
        F.col("q_vec"), F.col("n_vec"), F.col("q_nrm"), F.col("n_nrm")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = c.join(F.broadcast(q), F.col("n_id") != F.col("q_id")).select(
        "q_id", "n_id", sim.alias("cosine_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cosine_sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side constants,
    shipped into the plan as literals — tiny, no broadcast needed)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def _check_dim(df: DataFrame, vec_col, dim: int, caller: str) -> None:
    """Refuse a dim mismatch: zip_with pads with NULLs, every dot goes
    NULL, every vector lands in bucket 0 — the 'blocked' join silently
    becomes an all-pairs cartesian. One-row probe, fails loudly instead."""
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is not None and row.d is not None and row.d != dim:
        raise ValueError(
            f"{caller}: dim={dim} but vectors have {row.d} elements — "
            "a mismatch degenerates every LSH bucket to 0 (all-pairs join)"
        )


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i = (vec · plane_i) >= 0."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x).cast("double") for x in p])
        bit = F.when(dot_expr(vec, plane) >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return bucket


def _kmeanspp_lloyd(V, k: int, seed: int, max_iter: int, n_init: int = 4):
    """Seeded k-means++ init + Lloyd iterations over a bounded in-memory
    sample (numpy), with ``n_init`` restarts keeping the lowest-inertia
    run — the cheap compensation for k-means++'s seeding variance that a
    distributed trainer can't afford but a sample-local one gets for
    ~milliseconds. Deterministic for a given (sample, k, seed, max_iter,
    n_init); empty cells keep their previous centroid. Returns a k × dim
    float64 array."""
    import numpy as np

    n = len(V)
    k = min(k, n)
    v2 = np.einsum("ij,ij->i", V, V)

    def one_run(run_seed: int):
        rng = np.random.RandomState(run_seed)
        idx = [int(rng.randint(n))]
        d2 = np.full(n, np.inf)
        for _ in range(1, k):
            c = V[idx[-1]]
            d2 = np.minimum(d2, v2 - 2.0 * (V @ c) + c @ c)
            d2c = np.clip(d2, 0.0, None)
            tot = d2c.sum()
            if tot <= 0:
                idx.append(int(rng.randint(n)))
            else:
                idx.append(int(rng.choice(n, p=d2c / tot)))
        C = V[idx].copy()
        for _ in range(max_iter):
            d = np.einsum("ij,ij->i", C, C)[None, :] - 2.0 * (V @ C.T)
            a = d.argmin(axis=1)
            newC = C.copy()
            for j in range(k):
                members = V[a == j]
                if len(members):
                    newC[j] = members.mean(axis=0)
            if np.allclose(newC, C, rtol=0.0, atol=1e-12):
                C = newC
                break
            C = newC
        d = np.einsum("ij,ij->i", C, C)[None, :] - 2.0 * (V @ C.T)
        inertia = float((v2 + d.min(axis=1)).sum())
        return C, inertia

    best, best_inertia = None, np.inf
    for i in range(max(1, n_init)):
        C, inertia = one_run(seed + 7919 * i)
        if inertia < best_inertia:
            best, best_inertia = C, inertia
    return best


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 8,
    train_fraction: float = 1.0,
    fit_impl: str = "mllib",
    max_train_rows: int = 25_000,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index ONCE: ``(cell_assignment_frame, centroids)``.

    The expensive part of IVF is centroid TRAINING (an eager k-means
    fit); searches at different probe budgets / query sets should share
    it — the production shape is index-once, search-many
    (:func:`ivf_search`). The returned frame is the lazy corpus→cell
    assignment ``(n_id, n_vec, n_nrm, cell)``; persist it (ideally
    written ``partitionBy(cell)``) when serving many query batches so
    assignment isn't recomputed per search.

    ``train_fraction`` / ``fit_impl`` / ``max_train_rows`` semantics are
    documented on :func:`ivf_topk`, which is now a thin
    index-then-search wrapper.
    """
    if not (0.0 < train_fraction <= 1.0):
        raise ValueError(f"train_fraction must be in (0, 1], got {train_fraction}")
    if fit_impl not in ("driver", "mllib"):
        raise ValueError(f"fit_impl must be driver|mllib, got {fit_impl!r}")

    c = corpus.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumn("n_nrm", norm_expr(F.col("n_vec")))

    if fit_impl == "mllib":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        full = c.withColumn("features", array_to_vector(F.col("n_vec")))
        train = (
            full if train_fraction >= 1.0 else full.sample(train_fraction, seed=seed)
        )
        model = KMeans(
            k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="features"
        ).fit(train)
        c_cells = model.transform(full).select(
            "n_id", "n_vec", "n_nrm", F.col("prediction").alias("cell")
        )
        centers_list = [
            [float(x) for x in center] for center in model.clusterCenters()
        ]
    else:
        import numpy as np

        train = (
            c if train_fraction >= 1.0 else c.sample(train_fraction, seed=seed)
        )
        n_train = train.count()
        if n_train > max_train_rows:
            # deterministic, partitioning-independent thinning: keep ids
            # whose md5 bucket falls under the target fraction
            frac_hex = int(65536 * max_train_rows / n_train)
            train = train.filter(
                F.conv(
                    F.substring(F.md5(F.col("n_id").cast("string")), 1, 4), 16, 10
                ).cast("long")
                < F.lit(frac_hex)
            )
        sample = np.asarray(
            [r["n_vec"] for r in train.select("n_vec").collect()], dtype=np.float64
        )
        if len(sample) == 0:
            raise ValueError(
                "ivf_index: training sample is empty (corpus empty or "
                "train_fraction too small)"
            )
        from .aggregates import make_cell_assigner

        # sample-local iterations are ~free: run Lloyd to at least 25
        # rounds and take the best of 4 seeded restarts (max_iter keeps
        # its distributed meaning for the mllib path)
        centers = _kmeanspp_lloyd(sample, n_centroids, seed, max(max_iter, 25))
        centers_list = [[float(x) for x in row] for row in centers]
        assigner = make_cell_assigner(centers)
        c_cells = c.withColumn("cell", assigner(F.col("n_vec")))
    return c_cells, centers_list


def save_ivf_index(
    index: tuple[DataFrame, list[list[float]]], path: str
) -> None:
    """Persist an :func:`ivf_index` for serving: the corpus→cell
    assignment written ``partitionBy("cell")`` (so a search touching
    ``n_probe`` cells READS only those directories — the IVF promise
    made physical) and the centroid table as a tiny sidecar parquet.
    This is the index-once/search-many shape: training and assignment
    are paid at build time; every later search is probe-bound.

    Also writes a ``stats`` sidecar — per-cell row count and mean L2
    quantization error at BUILD time (one extra aggregation over the
    assignment, paid once) — so :func:`ivf_append` can report index
    staleness in O(batch) without rescanning the corpus."""
    assignment, centers = index
    # cluster rows by cell before the partitioned write (same reasoning
    # as ivf_append's write, measured there): unclustered, every task
    # writes one file into every cell directory it holds — tasks×cells
    # files; clustered it is one file per cell. Parquet files split on
    # row groups, so a big cell is still read in parallel.
    (
        assignment.repartition(len(centers), "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/assignment")
    )
    spark = assignment.sparkSession
    from ..io import local_df_single_partition

    cent = local_df_single_partition(
        spark,
        [(i, [float(x) for x in v]) for i, v in enumerate(centers)],
        "cell int, cv array<double>",
    )
    cent.write.mode("overwrite").parquet(f"{path}/centroids")
    _write_ivf_stats(
        spark.read.parquet(f"{path}/assignment"), centers, path
    )


def _write_ivf_stats(assignment: DataFrame, centers, path: str) -> None:
    """(Re)compute and overwrite the per-cell staleness baseline:
    (cell, n, mean_dist) over the given assignment frame."""
    from .aggregates import make_cell_assigner_with_dist

    ad = make_cell_assigner_with_dist(centers)
    stats = (
        assignment.select(ad(F.col("n_vec")).alias("a"))
        .groupBy(F.col("a.cell").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("a.dist").alias("mean_dist"),
        )
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def ivf_append(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_staleness_ratio: float | None = None,
) -> dict:
    """Incremental IVF maintenance: append a batch of new vectors to a
    :func:`save_ivf_index` layout WITHOUT retraining — each new row is
    assigned to its nearest EXISTING centroid and appended to that
    cell's partition directory (``mode("append")`` on the
    ``partitionBy("cell")`` layout adds files to the probed
    directories; no existing file is rewritten). This is the serving
    shape for a growing corpus: train once, append per ingest batch,
    retrain only when the index goes stale.

    Staleness is measured, not guessed: the returned dict carries the
    batch's mean L2 quantization error against the BUILD-time baseline
    from the ``stats`` sidecar —
    ``staleness_ratio = mean_dist_new / mean_dist_train``. A ratio
    near 1 means the new data still matches the trained cell geometry;
    a climbing ratio means the centroids no longer describe the data
    and recall at a fixed probe budget is degrading — time to rebuild.
    If ``max_staleness_ratio`` is set, the append RAISES above it
    (ingest-pipeline guard) instead of silently degrading the index.
    The sidecar is then updated by count-weighted merge (O(cells), no
    corpus rescan); a pre-stats index (round-8 layout) gets its
    baseline computed from the existing assignment once, on first
    append.

    The caller owns id uniqueness (appending an id already indexed
    would duplicate it in search results — the same contract as any
    append-only sink); dimensions must match the trained centroids.

    Cost shape: one Arrow-batched GEMM + one partitioned write over
    the BATCH only; the existing index is never read (except the
    one-time stats backfill). Returns
    ``{"n_appended", "mean_dist_new", "mean_dist_train",
    "staleness_ratio"}``.
    """
    cent_rows = (
        spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    )
    if [r["cell"] for r in cent_rows] != list(range(len(cent_rows))):
        raise ValueError(
            f"corrupt IVF index at {path!r}: centroid cells not contiguous"
        )
    centers = [list(r["cv"]) for r in cent_rows]
    dim = len(centers[0])

    batch = new_vectors.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumn("n_nrm", norm_expr(F.col("n_vec")))
    # dim probe BEFORE the assigner runs: a mismatched batch would blow
    # up inside the GEMM with a numpy shape error instead of a message
    _check_dim(batch, "n_vec", dim, "ivf_append")
    from .aggregates import make_cell_assigner_with_dist

    ad = make_cell_assigner_with_dist(centers)
    assigned = batch.withColumn("a", ad(F.col("n_vec"))).select(
        "n_id",
        "n_vec",
        "n_nrm",
        F.col("a.cell").alias("cell"),
        F.col("a.dist").alias("dist"),
    ).localCheckpoint(eager=True)  # one materialization: stats + write

    batch_stats = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("bn"), F.avg("dist").alias("bmean")
    )
    try:
        train_stats = spark.read.parquet(f"{path}/stats")
    except Exception:
        # round-8 layout without the sidecar: backfill the baseline
        # from the current assignment (one scan, once)
        _write_ivf_stats(
            spark.read.parquet(f"{path}/assignment"), centers, path
        )
        train_stats = spark.read.parquet(f"{path}/stats")
    # both sides are <= n_cells rows — driver math, no join planning
    t = {r["cell"]: (r["n"], r["mean_dist"]) for r in train_stats.collect()}
    b = {r["cell"]: (r["bn"], r["bmean"]) for r in batch_stats.collect()}
    n_new = sum(n for n, _ in b.values())
    if n_new == 0:
        return {
            "n_appended": 0,
            "mean_dist_new": None,
            "mean_dist_train": None,
            "staleness_ratio": None,
        }
    mean_new = sum(n * m for n, m in b.values()) / n_new
    n_train = sum(n for n, _ in t.values())
    mean_train = (
        sum(n * m for n, m in t.values()) / n_train if n_train else None
    )
    if mean_train is None:
        ratio = None
    elif mean_train > 0:
        ratio = mean_new / mean_train
    else:
        # a zero baseline means the centroids reproduced the training
        # data exactly; ANY new quantization error is then maximal
        # staleness signal, not an undefined one
        ratio = float("inf") if mean_new > 0 else 1.0
    if (
        max_staleness_ratio is not None
        and ratio is not None
        and ratio > max_staleness_ratio
    ):
        raise RuntimeError(
            f"ivf_append: batch staleness ratio {ratio:.3f} exceeds "
            f"max_staleness_ratio={max_staleness_ratio} — the trained "
            "centroids no longer describe the incoming data; rebuild the "
            "index (ivf_index + save_ivf_index) before appending further."
        )

    # one task per cell before the partitioned write: without it every
    # task writes a file into every cell directory it holds rows for —
    # measured at 1M vectors / 64 cells: a 10k-row append emitted
    # ~2,400 files and took 9-10 s, nearly the cost of a full rebuild;
    # repartitioned it adds at most ONE file per touched cell and the
    # append is seconds-per-batch O(batch) as claimed (SCALING.md r9
    # ivfgrow). The 10k-row shuffle this inserts is noise.
    (
        assigned.drop("dist")
        .repartition(len(centers), "cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path}/assignment")
    )
    # count-weighted merge of the baseline sidecar (keeps later appends'
    # ratios anchored to the blended population the index now holds)
    merged = []
    for cell in sorted(set(t) | set(b)):
        tn, tm = t.get(cell, (0, 0.0))
        bn, bm = b.get(cell, (0, 0.0))
        n = tn + bn
        merged.append(
            (int(cell), int(n), (tn * tm + bn * bm) / n if n else 0.0)
        )
    from ..io import local_df_single_partition

    local_df_single_partition(
        spark, merged, "cell int, n long, mean_dist double"
    ).write.mode("overwrite").parquet(f"{path}/stats")
    return {
        "n_appended": int(n_new),
        "mean_dist_new": float(mean_new),
        "mean_dist_train": float(mean_train) if mean_train else None,
        "staleness_ratio": float(ratio) if ratio is not None else None,
    }


def ivf_compact(
    spark: SparkSession, path: str, max_files_per_cell: int = 4
) -> dict:
    """Compact the small files :func:`ivf_append` accumulates: each
    append adds one file per written cell directory, so a cell that
    has seen N ingest batches holds N files and every probe of it pays
    N footer reads + N tiny row groups — the classic small-files tax,
    and the reason real ANN services run background segment merges.

    Cells are listed through the Hadoop FileSystem API (portable to
    HDFS/S3A; O(files) driver metadata, never a data scan). Only cells
    whose file count exceeds ``max_files_per_cell`` are touched: their
    rows are read back partition-pruned (static ``cell IN (...)`` →
    PartitionFilters), repartitioned one-task-per-cell, and rewritten
    via DYNAMIC partition overwrite — untouched cells' files are not
    rewritten, relisted, or read. Search results are unchanged (same
    rows, fewer files); the ``stats`` sidecar is row-count-based and
    unaffected.

    Maintenance ops serialize with each other (an append racing a
    compact of the same cell would be lost to the overwrite) — the
    usual contract for file-layout tables without a transaction log.

    Returns ``{"cells_compacted", "files_before", "files_after"}``
    (file counts over the compacted cells only)."""
    jvm = spark._jvm
    apath = f"{path}/assignment"
    hpath = jvm.org.apache.hadoop.fs.Path(apath)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def _n_data_files(d) -> int:
        n = 0
        for st in fs.listStatus(d):
            nm = st.getPath().getName()
            if st.isFile() and not nm.startswith(("_", ".")):
                n += 1
        return n

    frag: dict[int, int] = {}
    for st in fs.listStatus(hpath):
        nm = st.getPath().getName()
        if st.isDirectory() and nm.startswith("cell="):
            n = _n_data_files(st.getPath())
            if n > max_files_per_cell:
                frag[int(nm.split("=", 1)[1])] = n
    if not frag:
        return {"cells_compacted": 0, "files_before": 0, "files_after": 0}

    cells = sorted(frag)
    (
        spark.read.parquet(apath)
        .filter(F.col("cell").isin(cells))
        .repartition(len(cells), "cell")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(apath)
    )
    after = sum(
        _n_data_files(jvm.org.apache.hadoop.fs.Path(f"{apath}/cell={c}"))
        for c in cells
    )
    return {
        "cells_compacted": len(cells),
        "files_before": sum(frag.values()),
        "files_after": after,
    }


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[float]]]:
    """Load a :func:`save_ivf_index` layout back into the
    ``(assignment, centroids)`` shape :func:`ivf_search` takes. The
    assignment scan stays lazy — with ``prune_cells=True`` the search
    filters on the partition column and Spark lists only the probed
    cell directories (PartitionFilters in the scan node)."""
    assignment = spark.read.parquet(f"{path}/assignment").select(
        "n_id", "n_vec", "n_nrm", F.col("cell").cast("int").alias("cell")
    )
    cent = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    if [r["cell"] for r in cent] != list(range(len(cent))):
        raise ValueError(
            f"corrupt IVF index at {path!r}: centroid cells not contiguous"
        )
    return assignment, [list(r["cv"]) for r in cent]


def ivf_search(
    index: tuple[DataFrame, list[list[float]]],
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
    prune_cells: bool = False,
) -> DataFrame:
    """Search a prebuilt :func:`ivf_index`: each query probes its
    ``n_probe`` nearest cells and exact cosine re-ranks the candidates
    — scores within the candidate set are EXACT, so a result can be
    wrong only by omission (a true neighbor in an unprobed cell).

    ``prune_cells=True`` (the serving path over a
    :func:`save_ivf_index` assignment) first resolves the probed cell
    SET on the driver — bounded by n_centroids, never by corpus or
    query size — and filters the assignment with a static
    ``cell IN (...)`` predicate, which Spark turns into partition
    pruning on the ``partitionBy("cell")`` layout: the scan lists and
    reads ONLY the probed cells' directories. Without it the full
    assignment is scanned and the probe join filters rows after the
    read — correct, but paying corpus-scan cost for a probe-bound
    question."""
    c_cells, centers_list = index
    q = queries.select(
        F.col(query_id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", norm_expr(F.col("q_vec")))

    # probe selection: each query's n_probe nearest cells via ONE
    # Arrow-batched numpy GEMM against the centroid matrix (the FAISS
    # coarse-quantizer shape), then a map-side explode. This replaces
    # (r8) a query×centroid product + row_number window: the product is
    # either an unconditioned BNLJ (flagged by the no-cartesian audit)
    # or an n_centroids×dim LITERAL expression tree — which melts down
    # in analysis at production index sizes (the round-7 Catalyst
    # lesson: put bulk data in data, not in expressions) — and the
    # window shuffled on query id. Now probe selection adds zero
    # shuffles and zero joins.
    from .aggregates import make_cell_ranker

    ranker = make_cell_ranker(centers_list, n_probe)
    probes = q.select(
        "q_id", "q_vec", "q_nrm",
        F.explode(ranker(F.col("q_vec"))).alias("cell"),
    )

    corpus_side = c_cells
    if prune_cells:
        # the probe pipeline is executed twice on this path — once for
        # the IN-list collect below, once in the candidate join — so pin
        # ONE materialization first (bounded: |queries| × n_probe rows):
        # a nondeterministically-rebuilt queries frame (sample()/rand())
        # could otherwise probe cells the collected set missed, silently
        # dropping candidates. This also makes the eager plan-time job
        # explicit rather than hidden inside the collect.
        probes = probes.localCheckpoint(eager=True)
        # bounded collect: distinct probed cells ≤ n_centroids (a
        # serving index has tens-to-thousands of cells, never corpus
        # cardinality). The static IN-list becomes PartitionFilters on
        # a partitionBy("cell") assignment scan.
        cells = sorted(
            {r["cell"] for r in probes.select("cell").distinct().collect()}
        )
        corpus_side = c_cells.filter(F.col("cell").isin(cells))
    # no dropDuplicates here: a corpus vector is assigned to exactly ONE
    # cell and probes holds one row per (query, cell), so a (q_id, n_id)
    # pair cannot repeat — the dedup was a full shuffle of the candidate
    # set for nothing (removed r8; pair-uniqueness pinned in tests)
    cand = corpus_side.join(F.broadcast(probes), "cell").filter(
        F.col("n_id") != F.col("q_id")
    )
    sim = cosine_with_norms(
        F.col("q_vec"), F.col("n_vec"), F.col("q_nrm"), F.col("n_nrm")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = cand.select("q_id", "n_id", sim.alias("cosine_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cosine_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    round_digits: int | None = None,
    max_iter: int = 8,
    train_fraction: float = 1.0,
    fit_impl: str = "mllib",
    max_train_rows: int = 25_000,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning — the
    one-call form of :func:`ivf_index` + :func:`ivf_search` (use those
    directly to reuse one trained index across probe budgets or query
    batches; training is the dominant cost).

    ``max_iter`` is deliberately modest: cells only need to be *good*,
    not converged — the exact re-rank absorbs assignment slop, and
    training is the dominant cost (measured 4.3 s @ 20 iters vs 1.4 s
    @ 8 on 5 k×64 with indistinguishable recall).

    k-means centroids (Spark ML) define the cells; each corpus vector
    lands in its nearest cell, each query probes its ``n_probe`` nearest
    cells, and exact cosine re-ranks the candidates. Versus hyperplane
    LSH: data-adaptive cells give better recall on clustered corpora at
    the same candidate budget; the tradeoff is the training pass.

    ``train_fraction < 1`` fits the centroids on a seeded Bernoulli
    sample — the 100 TB posture, where k-means never sees the full
    corpus: cells only need to approximate the density, and the FULL
    corpus is still assigned to cells afterwards (assignment is one
    narrow pass). ``fit_impl`` picks the trainer:

    * ``"mllib"`` (default) — Spark ML KMeans over the (sampled)
      corpus: distributed training, and the registered queries' pinned
      recall envelope.
    * ``"driver"`` — numpy k-means++ (best of 4 seeded restarts by
      inertia) + Lloyd on a driver-collected sample hard-capped at
      ``max_train_rows`` (deterministic md5-bucket thinning above the
      cap, so the sample — and therefore the centroids — is independent
      of partitioning). This is how production ANN indexes (FAISS
      et al.) train coarse quantizers: centroid fitting needs a density
      sketch, not the corpus, and the bounded collect
      (≤ max_train_rows × dim doubles) replaces a multi-job distributed
      k-means whose per-iteration overhead dominates when k is small —
      measured 2.2 s → 1.4 s end-to-end at sf0.1. Corpus cell
      ASSIGNMENT stays distributed (one Arrow-batched argmin pass).
      Caveat, measured (SCALING.md): on near-uniform random embeddings
      the two trainers' cells score different recall@10 at the same
      probe budget (0.58 mllib vs 0.46 driver here) — cell geometry on
      structureless data is seeding luck, so the registered query keeps
      the mllib envelope and ``driver`` is the opt-in fast path.

    Persist the assignment partitioned by cell and queries touch only
    ``n_probe`` cells' partitions.
    """
    index = ivf_index(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        seed=seed,
        max_iter=max_iter,
        train_fraction=train_fraction,
        fit_impl=fit_impl,
        max_train_rows=max_train_rows,
    )
    return ivf_search(
        index,
        queries,
        k=k,
        n_probe=n_probe,
        query_id_col=query_id_col,
        vec_col=vec_col,
        round_digits=round_digits,
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 4,
    seed: int = 42,
    round_digits: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidates + exact re-rank.

    Recall grows with n_tables (independent hash tables OR-ed together);
    cost per query shrinks by ~2^n_planes versus brute force. At 100 TB
    the corpus bucketing is computed once and persisted partitioned by
    (table, bucket) so queries touch only matching partitions.
    """
    c = corpus.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumn("n_nrm", norm_expr(F.col("n_vec")))
    q = queries.select(
        F.col(query_id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", norm_expr(F.col("q_vec")))
    _check_dim(c, F.col("n_vec"), dim, "lsh_topk")

    # ONE scan per side, buckets for every table via a single numpy GEMM
    # per Arrow batch (the n_tables×n_planes interpreted dot products
    # would otherwise dominate the whole query), then posexplode.
    from .aggregates import make_bucket_assigner

    assigner = make_bucket_assigner(
        [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    )

    def with_buckets(df: DataFrame, vec: str) -> DataFrame:
        return df.select(
            "*", F.posexplode(assigner(F.col(vec))).alias("tbl", "bkt")
        )

    cb = with_buckets(c, "n_vec")
    qb = with_buckets(q, "q_vec")

    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "q_vec", "q_nrm", "n_id", "n_vec", "n_nrm")
        .dropDuplicates(["q_id", "n_id"])
    )
    sim = cosine_with_norms(
        F.col("q_vec"), F.col("n_vec"), F.col("q_nrm"), F.col("n_nrm")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = cand.select("q_id", "n_id", sim.alias("cosine_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# Int8 quantization — the storage/shuffle scale lever for ANN at 100 TB
# ---------------------------------------------------------------------------


def quantize_embeddings_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float | None = None,
    qvec_col: str = "qvec",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column:
    ``q_i = clamp(floor(x_i · 127 / s + 0.5), -127, 127)`` with a single
    global scale ``s`` (given, or computed as max |x| over the corpus in
    one aggregate attached as a scalar subquery — no join node).

    Why it matters at 100 TB: an ``array<double>`` embedding is 8 bytes
    per dimension ON THE WIRE — every broadcast, shuffle, and cache of
    the corpus pays it. Int8 cuts that 8× with a measured ~1% recall@10
    cost at 64 dims (test-pinned), and integer dot products are EXACT,
    so ranking is bit-stable across engines — no floating-point
    reduction-order caveats until the final norm division.

    floor(x + 0.5) (not round()) because half-up-vs-banker's rounding
    differs across engines; floor is identical everywhere, making the
    quantized vectors — and everything derived from them — portable.

    Returns (id_col, qvec_col: array<int>, scale: double). NULL vectors
    pass through as NULL qvecs.
    """
    from .joins import attach_scalar

    base = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    if scale is None:
        mx = base.agg(
            F.max(
                F.array_max(F.transform(F.col("_v"), lambda x: F.abs(x)))
            ).alias("_raw_scale")
        )
        base = attach_scalar(base, mx)
        # an all-zero / all-NULL corpus computes scale 0 (or NULL): x/0
        # is NaN in Spark double math, which would quantize to garbage
        # SILENTLY — fail loudly like the explicit-scale path. (A truly
        # EMPTY corpus has no rows for this expression to evaluate on
        # and simply returns an empty frame — empty in, empty out.)
        base = base.withColumn(
            "_scale",
            F.when(F.col("_raw_scale") > 0, F.col("_raw_scale")).otherwise(
                F.raise_error(
                    F.lit(
                        "quantize_embeddings_int8: computed scale is 0/NULL "
                        "(all-zero or all-NULL embedding corpus)"
                    )
                )
            ),
        ).drop("_raw_scale")
    else:
        if scale <= 0:
            raise ValueError(f"scale must be > 0, got {scale}")
        base = base.withColumn("_scale", F.lit(float(scale)))
    q = F.transform(
        F.col("_v"),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(x * F.lit(127.0) / F.col("_scale") + F.lit(0.5)).cast("int"),
            ),
        ),
    )
    return base.select(
        F.col(id_col),
        q.alias(qvec_col),
        F.col("_scale").alias("scale"),
    )


def int_dot_expr(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int arrays (long accumulator:
    127² · dim stays far under 2^63 for any real embedding width)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def brute_force_topk_quantized(
    corpus_q: DataFrame,
    queries_q: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
    query_id_col: str = "vec_id",
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k cosine over QUANTIZED vectors (same plan shape as
    :func:`brute_force_topk`: corpus scanned once, query side broadcast,
    per-query window ranking) — the dot products and squared norms are
    exact integers, so the only float op is the final normalization.

    Inputs are :func:`quantize_embeddings_int8` outputs; the shared
    scale cancels in the cosine, so it is not needed here.
    """
    c = corpus_q.select(
        F.col(id_col).alias("n_id"), F.col(qvec_col).alias("n_vec")
    ).withColumn("n_nrm", F.sqrt(int_dot_expr(F.col("n_vec"), F.col("n_vec"))))
    q = queries_q.select(
        F.col(query_id_col).alias("q_id"), F.col(qvec_col).alias("q_vec")
    ).withColumn("q_nrm", F.sqrt(int_dot_expr(F.col("q_vec"), F.col("q_vec"))))
    sim = int_dot_expr(F.col("q_vec"), F.col("n_vec")) / (
        F.col("q_nrm") * F.col("n_nrm")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = c.join(F.broadcast(q), F.col("n_id") != F.col("q_id")).select(
        "q_id", "n_id", sim.alias("cosine_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cosine_sim")
    )

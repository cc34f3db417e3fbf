"""Round-9 measurements.

1. ``widecap`` — the ``broadcast_counts=False`` escape hatch at
   corpus-scale KEY CARDINALITY (the round-8 fix made broadcasting the
   per-key counts the prefilter default; this measures where that
   stops winning): fixed total row count, distinct-key count swept
   over decades, prefilter arm with the broadcast hint vs the escape
   hatch (shuffle join + AQE). Kept counts asserted identical.

2. ``dedupanat`` — anatomy of the most expensive bench query,
   ``dedup_clusters`` (LSH candidates -> connected components ->
   size join), at sf0.1: per-stage wall clock so the expensive stage
   is named, not guessed. Stages are pinned with localCheckpoint so
   each timing covers exactly one stage's work.

3. ``bpecurve`` — growth of the BPE trainer's driver-side merge loop
   (the one sequential loop left in the repo): fixed 1M-doc corpus,
   merges swept 500/2k/8k, the distributed word-count pass timed
   separately from the driver loop — the claim under test is that
   driver work scales with merges x alphabet (vocab-table-local), not
   with the corpus.

4. ``ivfgrow`` — incremental IVF maintenance at 1M vectors: per-batch
   ivf_append cost vs the full rebuild it avoids, staleness ratios on
   in-distribution batches, and ivf_compact after 5 appends.

5. ``zorder`` — Z-order layout vs single-column sort vs unsorted at
   20M points: parquet row-group hit fraction and warm box-filter
   wall clock for the same 1%-area predicate over each layout.

6. ``bucketed`` — bucketed-table amortization at 5M x 20M rows: one
   write-time shuffle (bucketBy) vs re-shuffling both join sides on
   every query; per-query join+agg cost with the Exchange-free plan
   asserted.

7. ``diffscale`` — corpus_diff digest form vs a naive payload-carrying
   full outer join at 5M/20M rows per side: proves the shuffle carries
   (key, digest), not documents.

8. ``scd2scale`` — SCD2 history collapse at 10M/50M events: wall clock
   plus an executed-plan Exchange count pinning the one-shuffle claim.

9. ``quantscale`` — profile_quantiles exact vs GK at 10M/100M rows on
   bounded-cardinality and ~unique columns: measures the documented
   exact-mode hazard instead of asserting it.

10. ``upsertscale`` — versioned exactly-once upsert at a 10M-row base:
    merge+publish cost, and the transactional replay no-op which must
    stay ~0 s regardless of table size.

Run: python r9_experiments.py widecap|dedupanat|bpecurve|ivfgrow|zorder|bucketed|pqscale|ivfpqscale|diffscale|scd2scale|quantscale|upsertscale [sizes...]
"""
from __future__ import annotations

import sys
import time

from animaltrackingetls_spark.session import get_spark
from pyspark.sql import functions as F


def widecap(spark, sizes):
    from animaltrackingetls_spark.operators.sampling import cap_per_key_random

    def arm(df, broadcast):
        t0 = time.time()
        n = cap_per_key_random(
            df, "dom", 5, "id", seed=0, mode="prefilter",
            broadcast_counts=broadcast,
        ).count()
        return n, time.time() - t0

    # JVM/codegen warm-up outside the timed region
    warm = spark.range(1_000_000).select(
        F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")).alias("dom"),
        "id",
    )
    arm(warm, True)
    arm(warm, False)

    total = 40_000_000
    for n_keys in sizes:
        rows_per_key = max(total // n_keys, 1)
        df = spark.range(n_keys * rows_per_key).select(
            F.concat(
                F.lit("k"), (F.col("id") % n_keys).cast("string")
            ).alias("dom"),
            "id",
        )
        # interleave the arms (B,E,B,E) and keep each arm's MIN so a
        # one-off GC pause or compile burst can't flip the comparison
        res: dict[bool, list[float]] = {True: [], False: []}
        kept = set()
        for _ in range(2):
            for bc in (True, False):
                n, dt = arm(df, bc)
                res[bc].append(dt)
                kept.add(n)
        assert len(kept) == 1, kept
        print(
            f"widecap keys={n_keys:>11,} rows/key={rows_per_key}: "
            f"broadcast {min(res[True]):7.2f}s  "
            f"escape-hatch {min(res[False]):7.2f}s  "
            f"(kept {kept.pop():,})",
            flush=True,
        )


def dedupanat(spark, sizes):
    import __spark_entry__ as entry
    from animaltrackingetls_spark.operators import dedup

    sf_dir = "/root/testdata/sf0.1"
    for _ in range(max(1, sizes[0] if sizes else 1)):
        d = entry._docs_with_dups(spark, sf_dir).localCheckpoint(eager=True)
        t0 = time.time()
        edges = dedup.minhash_candidate_pairs_portable(
            d, n=2, bands=2, rows_per_band=3, threshold=0.6
        ).localCheckpoint(eager=True)
        n_edges = edges.count()
        t1 = time.time()
        stats: dict = {}
        cc = dedup.connected_components(edges, stats=stats).localCheckpoint(
            eager=True
        )
        n_nodes = cc.count()
        t2 = time.time()
        sizes_df = cc.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        n_out = cc.join(sizes_df, "cluster_id").count()
        t3 = time.time()
        print(
            f"dedupanat sf0.1: candidates {t1-t0:6.2f}s ({n_edges:,} edges)  "
            f"cc[{stats.get('mode')},{stats.get('rounds')}r] {t2-t1:6.2f}s "
            f"({n_nodes:,} nodes)  size-join {t3-t2:6.2f}s ({n_out:,} rows)  "
            f"total {t3-t0:6.2f}s",
            flush=True,
        )


def bpecurve(spark, sizes):
    from animaltrackingetls_spark.operators.textstats import (
        _bpe_merges_from_vocab,
        tokens,
    )

    n_docs = 1_000_000
    # deterministic synthetic corpus: ~12 hash-mixed pseudo-words per
    # doc over a ~40k-form vocabulary with Zipf-ish repetition
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("id"), i)
                        % (F.pmod(F.xxhash64(i), F.lit(39)) * 1000 + 1000),
                        F.lit(40_000),
                    ).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    t0 = time.time()
    wc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(100_000)
    )
    vocab = {r["w"]: int(r["n"]) for r in wc.collect()}
    t1 = time.time()
    print(
        f"bpecurve corpus=1M docs: word-count pass {t1-t0:6.2f}s "
        f"({len(vocab):,} vocab rows) — paid ONCE for any merge count",
        flush=True,
    )
    for merges in sizes:
        t2 = time.time()
        out = _bpe_merges_from_vocab(vocab, merges, min_pair_count=2)
        t3 = time.time()
        print(
            f"bpecurve merges={merges:>6,}: driver loop {t3-t2:6.2f}s "
            f"({len(out):,} merges learned)",
            flush=True,
        )


def ivfgrow(spark, sizes):
    """Incremental IVF maintenance at serving scale: build a 1M-vector
    index once, then time (a) ivf_append of a 10k in-distribution
    batch — the per-ingest cost, claimed O(batch) — against (b) a full
    rebuild over the grown corpus — the cost append avoids; then (c)
    ivf_compact after 5 appends. Staleness ratio printed for the
    in-distribution batch (should sit near 1). Same synthetic vector
    family as r8's ivfserve."""
    import tempfile

    from animaltrackingetls_spark.operators import similarity

    n_cells = 64

    def vecs_between(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)) - 1000.0
                ) / 1000.0,
            ).alias("embedding"),
        )

    for n in sizes:
        base = vecs_between(0, n)
        path = tempfile.mkdtemp(prefix="ivfgrow_") + "/idx"
        t0 = time.time()
        similarity.save_ivf_index(
            similarity.ivf_index(
                base, n_centroids=n_cells, fit_impl="driver",
                max_train_rows=20_000,
            ),
            path,
        )
        t1 = time.time()
        batch = 10_000
        ratios = []
        t_app = []
        for j in range(5):
            lo = n + j * batch
            ta = time.time()
            out = similarity.ivf_append(spark, path, vecs_between(lo, lo + batch))
            t_app.append(time.time() - ta)
            ratios.append(out["staleness_ratio"])
        t2 = time.time()
        comp = similarity.ivf_compact(spark, path, max_files_per_cell=2)
        t3 = time.time()
        grown = vecs_between(0, n + 5 * batch)
        t4 = time.time()
        similarity.save_ivf_index(
            similarity.ivf_index(
                grown, n_centroids=n_cells, fit_impl="driver",
                max_train_rows=20_000,
            ),
            tempfile.mkdtemp(prefix="ivfgrow_rb_") + "/idx",
        )
        t5 = time.time()
        print(
            f"ivfgrow n={n:,} cells={n_cells}: build+save {t1-t0:6.1f}s  "
            f"append 10k x5 {min(t_app):.2f}-{max(t_app):.2f}s/batch "
            f"(staleness {min(ratios):.3f}-{max(ratios):.3f})  "
            f"compact {t3-t2:5.2f}s "
            f"({comp['files_before']}->{comp['files_after']} files, "
            f"{comp['cells_compacted']} cells)  "
            f"REBUILD over grown corpus {t5-t4:6.1f}s",
            flush=True,
        )


def zorder(spark, sizes):
    """Z-order layout vs plain layout at scale: write N uniform (x, y)
    points both ways (same file count, same row-group size), then run
    the SAME 1%-area box-filter count over each and read the scan-level
    effect from parquet row-group statistics plus wall clock. The claim
    under test: the z-sorted layout's row-group min/max stats prune in
    BOTH dimensions, so the scan reads a small fraction of row groups
    while the plain layout reads ~all of them."""
    import glob as g
    import tempfile

    import pyarrow.parquet as pq

    from animaltrackingetls_spark.operators.layout import write_zordered

    def rg_hits(path, box):
        x0, x1, y0, y1 = box
        hit = total = rows_hit = rows = 0
        for f in sorted(g.glob(path + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            xi, yi = names.index("x"), names.index("y")
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                sx, sy = rg.column(xi).statistics, rg.column(yi).statistics
                total += 1
                rows += rg.num_rows
                if sx.min <= x1 and sx.max >= x0 and sy.min <= y1 and sy.max >= y0:
                    hit += 1
                    rows_hit += rg.num_rows
        return hit, total, rows_hit, rows

    box = (0.40, 0.50, 0.40, 0.50)
    pred = "x >= 0.40 AND x <= 0.50 AND y >= 0.40 AND y <= 0.50"
    for n in sizes:
        base = tempfile.mkdtemp(prefix=f"zorder_{n}_")
        df = spark.range(n).select(
            "id", F.rand(seed=7).alias("x"), F.rand(seed=11).alias("y")
        ).localCheckpoint()
        n_files = max(n // 2_000_000, 4)
        rg_bytes = 8 * 1024 * 1024  # ~6 row groups per file at 20M rows
        t0 = time.time()
        write_zordered(
            df, base + "/z", "x", "y", (0.0, 1.0), (0.0, 1.0),
            n_files=n_files, row_group_bytes=rg_bytes,
        )
        t1 = time.time()
        (
            df.repartition(n_files)
            .sortWithinPartitions("x")  # best SINGLE-column rival layout
            .write.option("parquet.block.size", str(rg_bytes))
            .parquet(base + "/x")
        )
        (
            df.repartition(n_files)
            .write.option("parquet.block.size", str(rg_bytes))
            .parquet(base + "/plain")
        )
        t2 = time.time()

        timings = {}
        for label in ("z", "x", "plain"):
            # warm then time the box-filter count over each layout
            path = f"{base}/{label}"
            spark.read.parquet(path).where(pred).count()
            tq = time.time()
            cnt = spark.read.parquet(path).where(pred).count()
            timings[label] = (time.time() - tq, cnt)
        zh, zt, zr, ztot = rg_hits(base + "/z", box)
        xh, xt, xr, _ = rg_hits(base + "/x", box)
        ph, pt, pr, _ = rg_hits(base + "/plain", box)
        print(
            f"zorder n={n:,} files={n_files}: zwrite {t1-t0:5.1f}s "
            f"plainwrite(2x) {t2-t1:5.1f}s | row-groups hit "
            f"z {zh}/{zt} ({zr/ztot:5.1%} rows)  "
            f"xsort {xh}/{xt} ({xr/ztot:5.1%})  "
            f"plain {ph}/{pt} ({pr/ztot:5.1%}) | box-count warm "
            f"z {timings['z'][0]:5.2f}s  xsort {timings['x'][0]:5.2f}s  "
            f"plain {timings['plain'][0]:5.2f}s  "
            f"(counts equal: {len({v[1] for v in timings.values()}) == 1})",
            flush=True,
        )


def bucketed(spark, sizes):
    """Bucketed-layout amortization at scale: orders(N) join
    lineitem-like(4N) on the key, (a) plain parquet (shuffle both
    sides every query) vs (b) bucketed tables (one write-time shuffle,
    then Exchange-free SMJ). Reports write cost and per-query join
    cost, warm runs — the ratio times queries-per-day is the
    amortization argument."""
    import tempfile

    from animaltrackingetls_spark.operators.layout import (
        assert_exchange_free,
        write_bucketed,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for n in sizes:
            base = tempfile.mkdtemp(prefix=f"bucketed_{n}_")
            n_buckets = 32
            dim = spark.range(n).select(
                F.col("id").alias("k"), (F.col("id") % 1000).alias("attr")
            )
            fact = spark.range(4 * n).select(
                (F.col("id") % n).alias("k"), F.col("id").alias("v")
            )
            t0 = time.time()
            dim.write.mode("overwrite").parquet(base + "/dim_p")
            fact.write.mode("overwrite").parquet(base + "/fact_p")
            t1 = time.time()
            write_bucketed(dim, "bx_dim", base + "/dim_b", "k", n_buckets)
            write_bucketed(fact, "bx_fact", base + "/fact_b", "k", n_buckets)
            t2 = time.time()

            def join_cost(left, right):
                q = (
                    left.join(right, "k")
                    .groupBy("k", "attr")
                    .agg(F.count("*").alias("c"), F.sum("v").alias("s"))
                    .groupBy("attr")
                    .agg(F.sum("c").alias("n"), F.sum("s").alias("sv"))
                )
                q.count()  # warm
                tq = time.time()
                q.count()
                return time.time() - tq, q

            tp, _ = join_cost(
                spark.read.parquet(base + "/dim_p"),
                spark.read.parquet(base + "/fact_p"),
            )
            tb, qb = join_cost(spark.table("bx_dim"), spark.table("bx_fact"))
            # certify the bucketed per-key stage is Exchange-free
            assert_exchange_free(
                spark.table("bx_dim").join(spark.table("bx_fact"), "k")
                .groupBy("k", "attr")
                .agg(F.count("*").alias("c")),
                require="SortMergeJoin",
            )
            print(
                f"bucketed n={n:,} x4 buckets={n_buckets}: "
                f"plain write {t1-t0:5.1f}s  bucketed write {t2-t1:5.1f}s "
                f"(+{(t2-t1)/max(t1-t0,1e-9)-1:+.0%}) | join+agg warm: "
                f"plain {tp:5.2f}s  bucketed {tb:5.2f}s "
                f"({tp/max(tb,1e-9):.2f}x)",
                flush=True,
            )
            spark.sql("DROP TABLE IF EXISTS bx_dim")
            spark.sql("DROP TABLE IF EXISTS bx_fact")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def pqscale(spark, sizes):
    """PQ at 1M vectors: encode throughput, on-disk bytes vs the float
    corpus, and warm search cost — ADC over 8-byte codes and ADC+exact
    rerank vs a full-precision brute-force scan of the float vectors.
    The claim under test: the corpus-wide cost of serving drops to a
    code-bytes scan; full-precision work is bounded by the shortlist."""
    import tempfile

    from animaltrackingetls_spark.operators.pq import (
        pq_encode, pq_topk, pq_topk_rerank, pq_train,
    )

    def du(path):
        import os
        total = 0
        for root, _, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total

    dim = 64
    for n in sizes:
        base = tempfile.mkdtemp(prefix=f"pqscale_{n}_")
        # clustered corpus: 256 centers + noise, built JVM-side
        centers = F.array(*[
            F.element_at(
                F.array(*[F.lit(float(((c * 37 + d * 11) % 100) / 100.0))
                          for c in range(8)]),
                (F.col("id") % 8 + 1).cast("int"),
            )
            for d in range(dim)
        ])
        df = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                centers,
                lambda x, i: x + F.rand(seed=13) * 0.1,
            ).alias("embedding"),
        ).localCheckpoint()
        df.write.mode("overwrite").parquet(base + "/raw")

        t0 = time.time()
        books = pq_train(df, dim=dim, m=8, nbits=8, seed=42,
                         max_train_rows=16384)
        t1 = time.time()
        # sortWithinPartitions(vec_id) gives each row group a tight
        # vec_id min/max band -> the rerank IN-list prunes row groups
        pq_encode(df, books).sortWithinPartitions("vec_id").write.mode(
            "overwrite"
        ).parquet(base + "/enc")
        t2 = time.time()
        enc = spark.read.parquet(base + "/enc")
        enc.select("vec_id", "pq_code").write.mode("overwrite").parquet(
            base + "/codes"
        )
        pq_encode(df, books, layout="binary").select(
            "vec_id", "pq_code"
        ).write.mode("overwrite").parquet(base + "/codes_b")

        q = [float(x) for x in df.first()["embedding"]]

        def warm(fn):
            fn()
            tq = time.time()
            fn()
            return time.time() - tq

        codes_l = spark.read.parquet(base + "/codes")
        codes_b = spark.read.parquet(base + "/codes_b")
        enc_disk = spark.read.parquet(base + "/enc")
        raw_disk = spark.read.parquet(base + "/raw")
        t_el = warm(lambda: pq_topk(codes_l, books, q, k=10,
                                    impl="expr").collect())
        t_al = warm(lambda: pq_topk(codes_l, books, q, k=10,
                                    impl="arrow").collect())
        t_eb = warm(lambda: pq_topk(codes_b, books, q, k=10,
                                    impl="expr").collect())
        t_ab = warm(lambda: pq_topk(codes_b, books, q, k=10,
                                    impl="arrow").collect())
        t_rp = warm(lambda: pq_topk_rerank(enc_disk, books, q, k=10,
                                           oversample=5).collect())
        t_rj = warm(lambda: pq_topk_rerank(enc_disk, books, q, k=10,
                                           oversample=5,
                                           fetch="join").collect())
        from animaltrackingetls_spark.operators.similarity import (
            brute_force_topk,
        )
        qdf = df.limit(1)
        t_bf = warm(lambda: brute_force_topk(raw_disk, qdf, k=10).collect())
        print(
            f"pqscale n={n:,} dim={dim} m=8 nbits=8: train {t1-t0:5.1f}s  "
            f"encode+write {t2-t1:5.1f}s | bytes raw {du(base+'/raw')/1e6:,.0f}MB "
            f"codes(long) {du(base+'/codes')/1e6:,.1f}MB "
            f"({du(base+'/raw')/max(du(base+'/codes'),1):.0f}x) | warm "
            f"disk-read search: adc expr/long {t_el:5.2f}s  "
            f"arrow/long {t_al:5.2f}s  expr/binary {t_eb:5.2f}s  "
            f"arrow/binary {t_ab:5.2f}s | rerank pushdown {t_rp:5.2f}s  "
            f"join {t_rj:5.2f}s | float brute-force {t_bf:5.2f}s",
            flush=True,
        )


def ivfpqscale(spark, sizes):
    """IVF-PQ at 1M vectors vs its two parents: build cost once, then
    warm disk-read search where the corpus-wide read is n_probe cells
    of 8-byte codes — vs full-scan ADC over all codes (pq) and vs the
    float-reading partition-pruned ivf serving path."""
    import tempfile

    from animaltrackingetls_spark.operators.ivfpq import (
        ivfpq_build, ivfpq_search,
    )
    from animaltrackingetls_spark.operators.pq import (
        pq_encode, pq_topk, pq_train,
    )
    from animaltrackingetls_spark.operators import similarity as sim

    def du(path):
        import os
        total = 0
        for root, _, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total

    dim = 64
    for n in sizes:
        base = tempfile.mkdtemp(prefix=f"ivfpqscale_{n}_")
        centers = F.array(*[
            F.element_at(
                F.array(*[F.lit(float(((c * 37 + d * 11) % 100) / 100.0))
                          for c in range(8)]),
                (F.col("id") % 8 + 1).cast("int"),
            )
            for d in range(dim)
        ])
        df = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                centers,
                lambda x, i: x + F.rand(seed=13) * 0.1,
            ).alias("embedding"),
        ).localCheckpoint()
        q = [float(x) for x in df.first()["embedding"]]

        t0 = time.time()
        ivfpq_build(df, base + "/ivfpq", dim=dim, n_cells=64, m=8,
                    nbits=8, seed=42, max_train_rows=16384)
        t1 = time.time()
        books = pq_train(df, dim=dim, m=8, nbits=8, seed=42,
                         max_train_rows=16384)
        pq_encode(df, books).select("vec_id", "pq_code").write.mode(
            "overwrite"
        ).parquet(base + "/codes")
        t2 = time.time()
        with_float_ivf = n <= 2_000_000  # 5+ GB float write at 10M
        if with_float_ivf:
            idx = sim.ivf_index(df, n_centroids=64, seed=42,
                                fit_impl="driver", max_train_rows=16384)
            sim.save_ivf_index(idx, base + "/ivf")
        t3 = time.time()

        def warm(fn):
            fn()
            tq = time.time()
            fn()
            return time.time() - tq

        codes = spark.read.parquet(base + "/codes")
        t_ivfpq = warm(lambda: ivfpq_search(
            spark, base + "/ivfpq", q, k=10, n_probe=4).collect())
        t_pq = warm(lambda: pq_topk(codes, books, q, k=10).collect())
        if with_float_ivf:
            qdf = df.limit(1).localCheckpoint()
            ivf_loaded = sim.load_ivf_index(spark, base + "/ivf")
            t_ivf = warm(lambda: sim.ivf_search(
                ivf_loaded, qdf, k=10, n_probe=4,
                prune_cells=True).collect())
            ivf_part = (f"ivf {t3-t2:5.1f}s | ivf(float) "
                        f"{du(base+'/ivf')/1e6:,.0f}MB | ivf-float "
                        f"{t_ivf:5.2f}s")
        else:
            ivf_part = "ivf-float skipped (>2M)"
        print(
            f"ivfpqscale n={n:,} dim={dim} cells=64 m=8 nbits=8 probe=4: "
            f"build ivfpq {t1-t0:5.1f}s  pq {t2-t1:5.1f}s | "
            f"bytes ivfpq {du(base+'/ivfpq')/1e6:,.1f}MB  "
            f"pq-codes {du(base+'/codes')/1e6:,.1f}MB | warm search: "
            f"ivfpq {t_ivfpq:5.2f}s  pq-fullscan {t_pq:5.2f}s | {ivf_part}",
            flush=True,
        )


def diffscale(spark, sizes):
    """corpus_diff at snapshot scale: the claim under test is that
    digesting the compared columns INSIDE the scan projection makes the
    full-outer join shuffle (key, 32-hex digest) rows instead of the
    document payloads. Arms, interleaved: the digest form vs a naive
    full outer join that carries the ~192-byte payload through the
    shuffle and compares it post-join. Change-tag counts asserted
    identical; fixed churn = 1% changed + 0.5% added + 0.5% removed."""
    import shutil
    import tempfile

    def snapshots(n, base_dir):
        shift = n // 200  # 0.5% of keys enter/leave between snapshots
        # high-entropy 192B payload (6 distinct md5 blocks) so shuffle
        # compression can't hide the width difference between the arms
        payload = F.concat(*[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#{i}")))
            for i in range(6)
        ])
        spark.range(n).select(
            F.col("id").alias("k"), payload.alias("payload"),
        ).write.mode("overwrite").parquet(base_dir + "/old")
        spark.range(shift, n + shift).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 100 == 0,
                   F.concat(payload, F.lit("X")))
            .otherwise(payload).alias("payload"),
        ).write.mode("overwrite").parquet(base_dir + "/new")
        return (spark.read.parquet(base_dir + "/old"),
                spark.read.parquet(base_dir + "/new"))

    from animaltrackingetls_spark.operators.versioning import corpus_diff
    from animaltrackingetls_spark.plans.metrics import execution_metrics

    def digest_arm(old, new):
        return (corpus_diff(old, new, ["k"], ["payload"])
                .groupBy("change").count())

    def naive_arm(old, new):
        o = old.select("k", F.col("payload").alias("old_p"))
        nn = new.select("k", F.col("payload").alias("new_p"))
        j = o.join(nn, on="k", how="full_outer")
        change = (
            F.when(F.col("old_p").isNull(), F.lit("added"))
            .when(F.col("new_p").isNull(), F.lit("removed"))
            .when(F.col("old_p") != F.col("new_p"), F.lit("changed"))
        )
        return (j.select(change.alias("change"))
                .filter(F.col("change").isNotNull())
                .groupBy("change").count())

    wdir = tempfile.mkdtemp(prefix="diffscale_warm_")
    w_old, w_new = snapshots(200_000, wdir)  # warm-up, untimed
    digest_arm(w_old, w_new).collect()
    naive_arm(w_old, w_new).collect()
    shutil.rmtree(wdir, ignore_errors=True)

    for n in sizes:
        ndir = tempfile.mkdtemp(prefix=f"diffscale_{n}_")
        old, new = snapshots(n, ndir)
        for side in (old, new):  # pull the parquet into page cache
            side.agg(F.sum(F.length("payload"))).collect()
        res: dict[str, list[float]] = {"digest": [], "naive": []}
        tags: dict[str, dict] = {}
        shuf: dict[str, int] = {}
        for _ in range(3):
            for name, fn in (("digest", digest_arm), ("naive", naive_arm)):
                out = fn(old, new)
                t0 = time.time()
                rows = out.collect()
                res[name].append(time.time() - t0)
                tags[name] = {r["change"]: r["count"] for r in rows}
                shuf[name] = execution_metrics(out)["shuffle_bytes_written"]
        assert tags["digest"] == tags["naive"], tags
        print(
            f"diffscale n={n:>11,}/side (~192B payload): "
            f"digest {min(res['digest']):6.2f}s "
            f"({shuf['digest'] / 1e6:,.0f}MB shuffled)  "
            f"naive-payload-shuffle {min(res['naive']):6.2f}s "
            f"({shuf['naive'] / 1e6:,.0f}MB shuffled)  "
            f"churn {tags['digest']}",
            flush=True,
        )
        shutil.rmtree(ndir, ignore_errors=True)


def scd2scale(spark, sizes):
    """scd2_from_history at history scale: n events over n/10 keys,
    10 observations per key collapsing to 4 versions. The plan claim
    (one exchange on the key; the (key, version) aggregate and the
    valid_to lead both reuse that partitioning) is asserted by counting
    Exchange nodes in the executed plan, not just read off a comment."""
    from animaltrackingetls_spark.operators.versioning import (
        scd2_from_history,
    )

    def build(n):
        n_keys = max(n // 10, 1)
        return spark.range(n).select(
            (F.col("id") % n_keys).alias("k"),
            (F.col("id") / n_keys).cast("int").alias("ts"),
            # 10 observations -> states 0,0,0,1,1,1,2,2,2,3 = 4 versions
            ((F.col("id") / n_keys) / 3).cast("int").alias("attr"),
        )

    scd2_from_history(build(100_000), ["k"], ["attr"], "ts").count()  # warm

    for n in sizes:
        df = build(n)
        out = scd2_from_history(df, ["k"], ["attr"], "ts")
        times = []
        rows = set()
        for _ in range(3):
            t0 = time.time()
            rows.add(out.count())
            times.append(time.time() - t0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange hashpartitioning")
        assert len(rows) == 1
        print(
            f"scd2scale events={n:>12,} keys={n // 10:,}: "
            f"collapse {min(times):6.2f}s -> {rows.pop():,} versions  "
            f"exchanges={n_exch}",
            flush=True,
        )


def quantscale(spark, sizes):
    """profile_quantiles' honest scale split, measured: exact
    ``percentile`` buffers value->count maps (memory ~ DISTINCT
    cardinality), GK ``approx_percentile`` buffers O(accuracy). Two
    column shapes per size: bounded cardinality (10k distinct) where
    exact is safe at any row count, and ~unique doubles where exact
    degrades with n (the documented 100 TB-wrong case; measured here,
    capped at 20M rows so the hazard is shown without an OOM)."""
    from animaltrackingetls_spark.operators.profile import (
        profile_quantiles,
    )

    def build(n):
        return spark.range(n).select(
            ((F.col("id") % 10_000).cast("double") / 7.0).alias("bounded"),
            F.rand(seed=7).alias("uniq"),
        )

    for exact in (True, False):
        profile_quantiles(build(100_000), ["bounded", "uniq"],
                          exact=exact).collect()  # warm

    probs = (0.01, 0.25, 0.5, 0.75, 0.99)
    for n in sizes:
        df = build(n)
        line = [f"quantscale n={n:>12,}:"]
        for label, cols, exact in (
            ("exact/bounded", ["bounded"], True),
            ("gk/bounded", ["bounded"], False),
            ("gk/uniq", ["uniq"], False),
            ("exact/uniq", ["uniq"], True),
        ):
            if label == "exact/uniq" and n > 20_000_000:
                line.append("exact/uniq SKIPPED(map~n rows)")
                continue
            times = []
            for _ in range(2):
                t0 = time.time()
                profile_quantiles(df, cols, probs=probs,
                                  exact=exact).collect()
                times.append(time.time() - t0)
            line.append(f"{label} {min(times):6.2f}s")
        print("  ".join(line), flush=True)


def upsertscale(spark, sizes):
    """Versioned exactly-once upsert at table scale: base of n keyed
    rows, batch = 10% of n (half updates to existing keys, half new
    keys). Timed: initial publish, the merge+publish, the transactional
    REPLAY of the same (app, version) — which must cost ~0 regardless
    of table size because the watermark check short-circuits before
    any Spark job — and the pointer-resolved read."""
    import shutil
    import tempfile

    from animaltrackingetls_spark.inventory import (
        read_versioned, upsert_parquet_versioned,
    )

    for n in sizes:
        base_dir = tempfile.mkdtemp(prefix=f"upsertscale_{n}_")
        tdir = base_dir + "/t"
        base = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("val"))
        b = n // 10
        batch = spark.range(b).select(
            # half hit existing keys (fresh val), half are brand-new
            F.when(F.col("id") % 2 == 0, F.col("id"))
            .otherwise(n + F.col("id")).alias("k"),
            F.lit(-1).cast("bigint").alias("val"),
        )
        t0 = time.time()
        upsert_parquet_versioned(spark, tdir, base, ["k"],
                                 txn_app_id="app", txn_version=1)
        t1 = time.time()
        upsert_parquet_versioned(spark, tdir, batch, ["k"],
                                 txn_app_id="app", txn_version=2)
        t2 = time.time()
        out = upsert_parquet_versioned(  # replay: must be a no-op
            spark, tdir, batch, ["k"], txn_app_id="app", txn_version=2)
        t3 = time.time()
        cnt = read_versioned(spark, tdir).count()
        t4 = time.time()
        assert cnt == n + b // 2, (cnt, n + b // 2)
        assert out.count() == cnt  # replay returned current, unchanged
        print(
            f"upsertscale base={n:>11,} batch={b:,}: "
            f"init {t1-t0:5.1f}s  merge+publish {t2-t1:5.1f}s  "
            f"replay-noop {t3-t2:6.3f}s  read {t4-t3:5.2f}s  "
            f"rows {cnt:,}",
            flush=True,
        )
        shutil.rmtree(base_dir, ignore_errors=True)


def compactscale(spark, sizes):
    """Small-file compaction payoff, swept over FILE COUNT at a fixed
    10M-row table (the accumulation shape of per-micro-batch upserts:
    p part files per batch, forever). Warm full-scan agg cost before vs
    after ``compact_versioned``, plus the compaction cost itself. The
    claim: per-file overheads (open, footer decode, one scheduler task
    per file) grow linearly in file count while the data cost is
    constant — and a single repartition rewrite buys them back
    permanently. Local NVMe + warm page cache is the FLOOR of the
    effect; object-store per-file latency multiplies it ~100x."""
    import shutil
    import tempfile

    from animaltrackingetls_spark.inventory import (
        compact_versioned, read_versioned, upsert_parquet_versioned,
    )

    n = 10_000_000

    def scan_cost(t):
        times = []
        for _ in range(3):
            t0 = time.time()
            read_versioned(spark, t).agg(
                F.sum("v"), F.count(F.lit(1))).collect()
            times.append(time.time() - t0)
        return min(times)

    for nfiles in sizes:
        base = tempfile.mkdtemp(prefix=f"compactscale_{nfiles}_")
        t = base + "/t"
        df = spark.range(n).selectExpr("id AS k", "id * 3 AS v")
        upsert_parquet_versioned(
            spark, t, df.repartition(nfiles), ["k"],
            txn_app_id="a", txn_version=1,
        )
        before = scan_cost(t)
        t0 = time.time()
        rep = compact_versioned(spark, t, target_bytes=128 * 1024 * 1024)
        dt = time.time() - t0
        after = scan_cost(t)
        print(
            f"compactscale rows={n:,} files={nfiles:>6,}: "
            f"scan before {before:5.2f}s  after {after:5.2f}s "
            f"(-> {rep['files_after']} files, "
            f"{rep['bytes_before']/1e6:,.0f}MB, compact {dt:5.1f}s)",
            flush=True,
        )
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "widecap"
    sizes = [int(x) for x in sys.argv[2:]] or {
        "widecap": [100_000, 1_000_000, 10_000_000],
        "dedupanat": [1],
        "bpecurve": [500, 2_000, 8_000],
        "ivfgrow": [1_000_000],
        "zorder": [20_000_000],
        "bucketed": [5_000_000],
        "pqscale": [1_000_000],
        "ivfpqscale": [1_000_000],
        "diffscale": [5_000_000, 20_000_000],
        "scd2scale": [10_000_000, 50_000_000],
        "quantscale": [10_000_000, 100_000_000],
        "upsertscale": [10_000_000],
        "compactscale": [512, 2_048, 8_192],
    }[which]
    s = get_spark(
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "48g",
        }
    )
    {
        "widecap": widecap,
        "dedupanat": dedupanat,
        "bpecurve": bpecurve,
        "ivfgrow": ivfgrow,
        "zorder": zorder,
        "bucketed": bucketed,
        "pqscale": pqscale,
        "ivfpqscale": ivfpqscale,
        "diffscale": diffscale,
        "scd2scale": scd2scale,
        "quantscale": quantscale,
        "upsertscale": upsertscale,
        "compactscale": compactscale,
    }[which](s, sizes)

"""Round-10 measurements.

1. ``streamupsert`` — the exactly-once streaming upsert sink
   (``run_available_now_upsert_versioned``) exercised END TO END at
   scale: a multi-batch AvailableNow stream of keyed aggregates is
   upserted into a versioned base table of 1M/3M/10M rows
   (append -> merge-upsert per micro-batch -> compaction), with an
   injected duplicate-batch replay after the drain. Measured claims:

   * per-batch merge+publish cost is FLAT ACROSS THE BATCH SEQUENCE
     (no per-version accumulation pathology — keep_versions prunes and
     each merge reads exactly one snapshot), and scales with the BASE
     table (the merge must rewrite the snapshot, same as a lake-format
     MERGE without partition pruning) — both curves printed;
   * the replayed batch is a watermark no-op at every base size
     (~0.1 s, never re-merging);
   * compaction bounds the file count after the batch sequence and
     carries the txn watermarks forward (replay STILL no-ops after
     compaction — the end-to-end exactly-once property).

2. ``partupsert`` — the partition-pruned versioned upsert
   (``upsert_parquet_versioned_partitioned``) against the plain sink
   at 1M/10M/30M-row bases: 6 batches of 1,000 KEY-LOCALIZED keys each
   (drawn from the top 2% of key space — the dimension-maintenance
   norm: recent/active entities cluster in key order). Three arms:

   * plain — full merge per batch (cost grows with base);
   * hash-bucketed — measured FIRST CUT, kept as the negative result:
     1k keys hash into ~all 64 buckets, nothing prunes, and the sink
     pays full merge + partitioned-write overhead (slower than plain
     at every size). Hash prunes only when batch DISTINCT keys ≪
     n_buckets;
   * range-bucketed (the fix the hash measurement forced) — localized
     batches touch ~1-2 of 64 range buckets, the rest hardlink:
     per-batch cost measured FLAT in base size.

   All three final tables asserted row-identical.

3. ``zorder3d`` — the N-D Morton code (``zvalue_expr_nd``) measured
   the way r9 measured 2-D: N uniform (x, y, t) points written four
   ways (3-D z-sorted; 2-D z(x,y)-sorted — what you'd do without the
   N-D form; single-column x-sorted; unsorted), then the SAME
   10%-per-dim box predicate over each, reading row-group min/max hit
   fractions from the footers plus warm wall clock. Finding (both
   sides measured): the N-D curve pays off only when the ROW-GROUP
   COUNT grants enough interleave bits per dimension — at ~75 groups
   (8 MB groups) 3-D READS MORE than 2-D (9.1% vs 5.7% of rows: each
   group spans ~23% of every dim, so the third dim's pruning gain is
   smaller than the resolution the first two lose); at ~640 groups
   (1 MB) 3-D wins 1.0% vs 1.8%. At 100 TB with 128 MB groups the
   group count is ~10^6 (≈20 interleave bits), far past the
   crossover — but the small-group regime is the honest caveat for
   modest tables, documented in zvalue_expr_nd's guidance.

4. ``dedupindex`` — the persisted dedup index
   (``dedup.dedup_index_ingest``) at 100k/300k/1M-doc index sizes: a
   10k-doc batch (80% novel, 10% exact dups, 10% near dups) ingests
   with the bloom sidecar on vs off; per-ingest wall and the
   classification counts (identical across arms — exactness) printed.
   Claim: the bloom collapses the exact-confirm join input for the
   mostly-novel stream, so the on-arm's cost grows slower with index
   size.

5. ``benchdrift`` — the round-9 verdict's adjudication protocol for
   the +20.7% r8->r9 bench drift, runnable once BENCH_r10.json exists:
   reads two bench JSON lines, normalizes every shared per-query delta
   by the calibration-block shift (gemm + range-agg mean ratio), and
   prints the queries whose NORMALIZED delta still exceeds their own
   kept-run spread. Pure JSON arithmetic — no Spark session.

Run: python r10_experiments.py streamupsert [sizes...]
     python r10_experiments.py partupsert [sizes...]
     python r10_experiments.py benchdrift BENCH_r09.json BENCH_r10.json
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _mk_events_files(spark, path: str, n_rows: int, n_files: int) -> None:
    """n_files parquet files of keyed values — one file per micro-batch
    under maxFilesPerTrigger=1."""
    from pyspark.sql import functions as F

    for i in range(n_files):
        (
            spark.range(n_rows // n_files)
            .select(
                (F.col("id") % 50_000).alias("user_id"),
                (F.col("id") % 997).cast("double").alias("value"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{path}/f{i:03d}")
        )


def streamupsert(sizes: list[int]) -> None:
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.inventory import (
        compact_versioned,
        list_versions,
        read_versioned,
        txn_watermarks,
        upsert_parquet_versioned,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    n_batches = 8
    batch_rows = 400_000  # 50k updates per batch after the rollup

    for base_n in sizes:
        work = tempfile.mkdtemp(prefix="r10_streamupsert_")
        table = os.path.join(work, "table")
        src = os.path.join(work, "src")
        ckpt = os.path.join(work, "ckpt")
        try:
            # base versioned table: base_n keyed rows
            base = spark.range(base_n).select(
                F.col("id").alias("user_id"),
                F.lit(1).cast("long").alias("n_events"),
                (F.col("id") % 13).cast("double").alias("total_value"),
            )
            t0 = time.monotonic()
            upsert_parquet_versioned(spark, table, base, ["user_id"])
            t_base = time.monotonic() - t0

            _mk_events_files(spark, src, n_batches * batch_rows, n_batches)

            # drive the sink by hand (one foreachBatch call per file via
            # maxFilesPerTrigger=1) so each batch's wall is measured;
            # the semantics are exactly run_available_now_upsert_versioned's
            stream = (
                spark.readStream.schema("user_id long, value double")
                .option("maxFilesPerTrigger", "1")
                .parquet(src + "/*")
            )
            per_batch: list[float] = []

            def _sink(batch_df, batch_id):
                t = time.monotonic()
                updates = batch_df.groupBy("user_id").agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum("value").alias("total_value"),
                )
                upsert_parquet_versioned(
                    batch_df.sparkSession, table, updates, ["user_id"],
                    txn_app_id="r10stream", txn_version=batch_id,
                )
                per_batch.append(time.monotonic() - t)

            q = (
                stream.writeStream.foreachBatch(_sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(1800), "stream did not drain"
            assert len(per_batch) == n_batches, per_batch

            rows_after = read_versioned(spark, table).count()
            marks = txn_watermarks(table)
            assert marks.get("r10stream") == n_batches - 1, marks

            # injected duplicate-batch replay (foreachBatch's
            # at-least-once edge): same app id, LAST batch id, garbage
            # values — must be a watermark no-op
            garbage = spark.range(10).select(
                F.col("id").alias("user_id"),
                F.lit(-999).cast("long").alias("n_events"),
                F.lit(-999.0).alias("total_value"),
            )
            t0 = time.monotonic()
            upsert_parquet_versioned(
                spark, table, garbage, ["user_id"],
                txn_app_id="r10stream", txn_version=n_batches - 1,
            )
            t_replay = time.monotonic() - t0
            assert read_versioned(spark, table).count() == rows_after
            assert (
                read_versioned(spark, table)
                .filter(F.col("n_events") == -999).count() == 0
            ), "replayed batch was re-applied"

            # compaction bounds the file count; watermarks carried
            t0 = time.monotonic()
            rep = compact_versioned(spark, table, target_bytes=256 << 20)
            t_compact = time.monotonic() - t0
            cur_files = rep["files_after"] if rep["compacted"] else rep[
                "files_before"
            ]
            assert cur_files <= rep["target_files"], rep
            assert txn_watermarks(table).get("r10stream") == n_batches - 1
            # and the replay must STILL no-op post-compaction
            upsert_parquet_versioned(
                spark, table, garbage, ["user_id"],
                txn_app_id="r10stream", txn_version=n_batches - 1,
            )
            assert read_versioned(spark, table).count() == rows_after
            assert len(list_versions(table)) <= 2

            print(
                json.dumps(
                    {
                        "exp": "streamupsert",
                        "base_rows": base_n,
                        "rows_after": rows_after,
                        "n_batches": n_batches,
                        "batch_rows": batch_rows,
                        "t_base_load_s": round(t_base, 2),
                        "per_batch_s": [round(x, 2) for x in per_batch],
                        "batch_first_vs_last": round(
                            per_batch[-1] / per_batch[1], 2
                        ),
                        "t_replay_noop_s": round(t_replay, 3),
                        "t_compact_s": round(t_compact, 2),
                        "compact": rep,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


def partupsert(sizes: list[int]) -> None:
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.inventory import (
        read_versioned,
        upsert_parquet_versioned,
        upsert_parquet_versioned_partitioned,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    n_batches, batch_keys = 6, 1_000

    for base_n in sizes:
        work = tempfile.mkdtemp(prefix="r10_partupsert_")
        try:
            base = spark.range(base_n).select(
                F.col("id").alias("k"),
                (F.col("id") % 13).cast("double").alias("v"),
            )
            results = {}
            hot_lo = int(base_n * 0.98)  # the "active entities" key band
            for mode in ("plain", "hash", "range"):
                table = os.path.join(work, mode)

                def sink(updates, txn):
                    if mode == "plain":
                        upsert_parquet_versioned(
                            spark, table, updates, ["k"],
                            txn_app_id="p", txn_version=txn,
                        )
                    else:
                        upsert_parquet_versioned_partitioned(
                            spark, table, updates, ["k"], n_buckets=64,
                            txn_app_id="p", txn_version=txn, scheme=mode,
                        )

                t0 = time.monotonic()
                sink(base, -1)
                t_load = time.monotonic() - t0
                per_batch = []
                for b in range(n_batches):
                    # deterministic KEY-LOCALIZED working set: 1k keys
                    # per batch inside the top-2% key band
                    upd = spark.range(batch_keys).select(
                        (hot_lo + (F.col("id") * 7919 + b * 104729)
                         % (base_n - hot_lo)).alias("k"),
                        F.lit(float(100 + b)).alias("v"),
                    ).dropDuplicates(["k"])
                    t0 = time.monotonic()
                    sink(upd, b)
                    per_batch.append(time.monotonic() - t0)
                results[mode] = {
                    "t_load_s": round(t_load, 2),
                    "per_batch_s": [round(x, 2) for x in per_batch],
                }
            a = read_versioned(spark, os.path.join(work, "plain"))
            for mode in ("hash", "range"):
                b_ = read_versioned(spark, os.path.join(work, mode))
                assert a.count() == b_.count(), mode
                assert a.exceptAll(b_).count() == 0, f"{mode} diverges"
            print(json.dumps({"exp": "partupsert", "base_rows": base_n,
                              "batch_keys": batch_keys, **results}),
                  flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)


def zorder3d(sizes: list[int]) -> None:
    import glob as g

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.layout import zvalue_expr_nd
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    R = (0.0, 1.0)
    box = {c: (0.40, 0.50) for c in ("x", "y", "t")}
    pred = " AND ".join(
        f"{c} >= {lo} AND {c} <= {hi}" for c, (lo, hi) in box.items()
    )

    def rg_hits(path):
        hit = total = rows_hit = rows = 0
        for f in sorted(g.glob(path + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            idx = {c: names.index(c) for c in box}
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                total += 1
                rows += rg.num_rows
                ok = all(
                    rg.column(idx[c]).statistics.min <= hi
                    and rg.column(idx[c]).statistics.max >= lo
                    for c, (lo, hi) in box.items()
                )
                if ok:
                    hit += 1
                    rows_hit += rg.num_rows
        return hit, total, rows_hit, rows

    rg_mb = float(os.environ.get("ZORDER3D_RG_MB", "8"))
    for n in sizes:
        base = tempfile.mkdtemp(prefix=f"zorder3d_{n}_")
        try:
            df = spark.range(n).select(
                "id",
                F.rand(seed=7).alias("x"),
                F.rand(seed=11).alias("y"),
                F.rand(seed=13).alias("t"),
            ).localCheckpoint()
            n_files = max(n // 2_000_000, 4) * max(1, int(8 / rg_mb))
            rg_bytes = int(rg_mb * 1024 * 1024)

            def write_sorted(path, sort_col):
                (
                    df.withColumn("_k", sort_col)
                    .repartitionByRange(n_files, F.col("_k").asc_nulls_last())
                    .sortWithinPartitions(F.col("_k").asc_nulls_last())
                    .drop("_k")
                    .write.option("parquet.block.size", str(rg_bytes))
                    .parquet(path)
                )

            write_sorted(
                base + "/z3",
                zvalue_expr_nd(
                    [F.col("x"), F.col("y"), F.col("t")], [R, R, R]
                ),
            )
            from animaltrackingetls_spark.operators.layout import zvalue_expr

            write_sorted(
                base + "/z2", zvalue_expr(F.col("x"), F.col("y"), R, R)
            )
            write_sorted(base + "/x", F.col("x"))
            (
                df.repartition(n_files)
                .write.option("parquet.block.size", str(rg_bytes))
                .parquet(base + "/plain")
            )

            report = {"exp": "zorder3d", "rows": n, "rg_mb": rg_mb,
                      "layouts": {}}
            expect = None
            for name in ("z3", "z2", "x", "plain"):
                path = f"{base}/{name}"
                hit, total, rows_hit, rows = rg_hits(path)
                # warm wall: min of 3 counts after one discard
                ts = []
                for _ in range(4):
                    t0 = time.monotonic()
                    c = spark.read.parquet(path).where(pred).count()
                    ts.append(time.monotonic() - t0)
                if expect is None:
                    expect = c
                assert c == expect, f"layout {name} changed the answer"
                report["layouts"][name] = {
                    "rg_hit_frac": round(hit / total, 4),
                    "rows_read_frac": round(rows_hit / rows, 4),
                    "warm_s": round(min(ts[1:]), 3),
                }
            report["matched_rows"] = expect
            print(json.dumps(report), flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)


def dedupindex(sizes: list[int]) -> None:
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.dedup import dedup_index_ingest
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})

    def text_of(idc):
        # 12 deterministic pseudo-words per doc; the first word carries
        # the FULL id so text_of is injective (distinct ids -> distinct
        # texts), the rest draw from a small shared vocabulary so
        # shingles still collide across docs like real text
        return F.concat_ws(
            " ",
            F.concat(F.lit("u"), idc.cast("string")),
            *[
                F.concat(F.lit("w"), ((idc * p) % 95_819).cast("string"))
                for p in (3, 7, 11, 17, 23, 31, 41, 47, 59, 67, 73)
            ],
        )

    batch_n = 10_000
    for n in sizes:
        corpus = spark.range(n).select(
            F.col("id").alias("doc_id"), text_of(F.col("id")).alias("text")
        )
        # novel docs draw from a DISJOINT vocabulary ('x' prefix): the
        # w-words are a function of id mod 95,819, so any same-generator
        # id collides wholesale with some corpus id
        novel = spark.range(int(batch_n * 0.8)).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.regexp_replace(
                text_of(F.col("id") + 10_000_000), "w", "x"
            ).alias("text"),
        )
        exact = spark.range(int(batch_n * 0.1)).select(
            (F.col("id") + 20_000_000).alias("doc_id"),
            text_of(F.col("id") % n).alias("text"),
        )
        near = spark.range(int(batch_n * 0.1)).select(
            (F.col("id") + 30_000_000).alias("doc_id"),
            F.concat(
                text_of((F.col("id") * 7) % n), F.lit(" extraword")
            ).alias("text"),
        )
        batch = novel.unionByName(exact).unionByName(near).localCheckpoint()

        report = {"exp": "dedupindex", "index_docs": n, "batch": batch_n}
        for flag in (True, False):
            work = tempfile.mkdtemp(prefix=f"dedupidx_{n}_{flag}_")
            try:
                t0 = time.monotonic()
                dedup_index_ingest(spark, corpus, work, use_bloom=flag)
                t_boot = time.monotonic() - t0
                t0 = time.monotonic()
                out = dedup_index_ingest(
                    spark, batch, work, sig_agree=0.4, use_bloom=flag
                )
                counts = {
                    r["status"]: r["n"]
                    for r in out.groupBy("status").agg(
                        F.count(F.lit(1)).alias("n")
                    ).collect()
                }
                t_ingest = time.monotonic() - t0
                report[f"bloom_{flag}"] = {
                    "t_bootstrap_s": round(t_boot, 2),
                    "t_ingest_s": round(t_ingest, 2),
                    "counts": counts,
                }
            finally:
                shutil.rmtree(work, ignore_errors=True)
        assert (
            report["bloom_True"]["counts"] == report["bloom_False"]["counts"]
        ), "bloom changed the classification"
        print(json.dumps(report), flush=True)


def benchdrift(old_path: str, new_path: str) -> None:
    import re

    def _load(p: str) -> dict:
        with open(p) as f:
            txt = f.read()
        # driver files wrap the JSON line in {"tail": "..."} and may
        # TRUNCATE its head; bare bench output is the line itself
        try:
            d = json.loads(txt)
        except json.JSONDecodeError:
            for line in reversed(txt.splitlines()):
                if line.startswith('{"metric"'):
                    return json.loads(line)
            raise
        if isinstance(d, dict) and "queries" in d:
            return d
        tail = d.get("tail", "")
        start = tail.find('{"metric"')
        if start >= 0:
            return json.loads(tail[start:].strip())
        # truncated head: recover the complete trailing dicts by name
        # and whatever per-query medians survive in the fragment
        out: dict = {"queries": {}}
        for key in ("spread", "noise"):
            m = re.search(rf'"{key}": ', tail)
            if m:
                dec = json.JSONDecoder()
                out[key], _ = dec.raw_decode(tail[m.end():])
        frag = tail[: re.search(r'"spread": ', tail).start()
                    ] if '"spread": ' in tail else tail
        for name, val in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)[,}]', frag):
            out["queries"][name] = float(val)
        # medians lost to truncation: fall back to the kept-run spread
        # midpoint (the median lies inside the spread by construction)
        for name, (lo, hi) in out.get("spread", {}).items():
            out["queries"].setdefault(name, (lo + hi) / 2.0)
        if not out["queries"]:
            raise ValueError(f"no bench JSON found in {p}")
        return out

    old, new = _load(old_path), _load(new_path)
    calib_ratio = 1.0
    if "noise" in old and "noise" in new:
        co, cn = old["noise"]["calib"], new["noise"]["calib"]
        rg = cn["gemm_1024_s"] / co["gemm_1024_s"]
        rr = cn["range_agg_20m_s"] / co["range_agg_20m_s"]
        calib_ratio = (rg + rr) / 2.0
    print(f"# calibration shift new/old: {calib_ratio:.4f} "
          f"(normalize old by this before comparing)")
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    rows = []
    for name in shared:
        o, n = old["queries"][name], new["queries"][name]
        expected = o * calib_ratio
        delta = (n - expected) / expected
        sp = new.get("spread", {}).get(name)
        spread_frac = (sp[1] - sp[0]) / n if sp and n else None
        signal = (
            spread_frac is not None and abs(delta) > max(spread_frac, 0.05)
        )
        rows.append((name, o, n, delta, spread_frac, signal))
    rows.sort(key=lambda r: -abs(r[3]))
    print(f"# {len(shared)} shared queries; sum old {sum(r[1] for r in rows):.2f}s"
          f" -> new {sum(r[2] for r in rows):.2f}s")
    for name, o, n, delta, spread_frac, signal in rows:
        flag = "SIGNAL" if signal else "noise"
        sf = f"{spread_frac:.0%}" if spread_frac is not None else "?"
        print(f"{flag:6s} {name:28s} {o:7.3f} -> {n:7.3f}  "
              f"norm-delta {delta:+.1%}  own-spread {sf}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "streamupsert"
    if cmd == "streamupsert":
        sizes = [int(x) for x in sys.argv[2:]] or [1_000_000, 3_000_000,
                                                   10_000_000]
        streamupsert(sizes)
    elif cmd == "partupsert":
        sizes = [int(x) for x in sys.argv[2:]] or [1_000_000, 10_000_000,
                                                   30_000_000]
        partupsert(sizes)
    elif cmd == "zorder3d":
        sizes = [int(x) for x in sys.argv[2:]] or [20_000_000]
        zorder3d(sizes)
    elif cmd == "dedupindex":
        sizes = [int(x) for x in sys.argv[2:]] or [100_000, 300_000,
                                                   1_000_000]
        dedupindex(sizes)
    elif cmd == "benchdrift":
        benchdrift(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown experiment {cmd!r}")

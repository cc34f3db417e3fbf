"""Round-16 isolated experiments (guide §1.1/§1.4 protocol).

Each experiment uses the noop sink, interleaves arms A/B/A/B... so
slow-host drift hits both arms equally, times DataFrame construction +
execution as one unit, and prints medians plus a gemm floor probe.

Usage: python r16_experiments.py <experiment>
  media        — media_metadata: coalesce-probed image_header vs a
                 magic-byte when/otherwise dispatch (verdict #3).
  media_parts  — media_metadata decomposition: which parser branch
                 carries the seconds.
  grams        — dup_gram_positions: shuffle leftsemi vs broadcast
                 leftsemi on the duplicated-gram key set (verdict #4).
  segments     — segments_chunks decomposition by branch.
  quantile2    — quantile_profile: current single-agg vs unpivoted
                 groupBy(col) percentile (two-level merge, verdict #5).
  stream_dedup — stream_dedup_keys drain with noDataMicroBatches
                 on (current) vs off (verdict #6).
  ivf_train    — ivf_topk: KMeans fit on the single-partition train
                 input vs a floored layout (verdict #7).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

from pyspark.sql import functions as F

from animaltrackingetls_spark.session import get_spark

import __spark_entry__ as entry
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CLEANUP: list = []


def _spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _timed_arm(fn) -> float:
    """Construction + noop execution in one timed unit (an arm that
    materializes inside fn() must not escape the timer)."""
    t0 = time.monotonic()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    while _CLEANUP:
        try:
            _CLEANUP.pop().unpersist()
        except Exception:
            pass
    return dt


def _interleave(arms: dict, runs: int = 5) -> None:
    spark = _spark()
    sc = spark.sparkContext
    print(f"gemm floor: {bench.gemm_probe(5):.4f}s  loadavg {os.getloadavg()}")
    for name, fn in arms.items():
        sc.setJobDescription(f"warm:{name}")
        _timed_arm(fn)
    walls: dict = {name: [] for name in arms}
    for i in range(runs):
        for name, fn in arms.items():
            sc.setJobDescription(f"run{i}:{name}")
            walls[name].append(_timed_arm(fn))
    sc.setJobDescription(None)
    print(f"gemm floor after: {bench.gemm_probe(5):.4f}s")
    for name, ws in walls.items():
        print(
            f"{name}: median {statistics.median(ws):.3f}s "
            f"min {min(ws):.3f}s walls={[round(w, 3) for w in ws]}"
        )


# ---------------------------------------------------------------------------
# media_metadata (verdict #3)
# ---------------------------------------------------------------------------


def _dispatched_image_header(payload):
    """Magic-byte when/otherwise dispatch over the same five parsers —
    the candidate replacement for image_header's coalesce. Each parser's
    own guard implies its (pairwise-distinct) 2-byte prefix, so at most
    one coalesce branch can ever be non-NULL and it is exactly the
    branch the prefix selects: bytewise-equal output by construction."""
    from animaltrackingetls_spark.operators import multimodal as mm

    sig2 = F.hex(F.substring(payload, 1, 2))
    return (
        F.when(sig2 == F.lit("8950"), mm.png_ihdr(payload))
        .when(sig2 == F.lit(mm.JPEG_SOI_HEX), mm.jpeg_sof(payload))
        .when(sig2 == F.lit("4749"), mm.gif_screen(payload))
        .when(sig2 == F.lit("424D"), mm.bmp_header(payload))
        .when(sig2.isin("4949", "4D4D"), mm.tiff_ifd(payload))
    )


def media() -> None:
    from unittest import mock

    from animaltrackingetls_spark.operators import multimodal as mm

    spark = _spark()
    qs = entry.queries()

    def current():
        return qs["media_metadata"](spark, SF_DIR)

    def dispatched():
        with mock.patch.object(mm, "image_header", _dispatched_image_header):
            return qs["media_metadata"](spark, SF_DIR)

    _interleave({"current": current, "dispatched": dispatched}, runs=5)


def media_parts() -> None:
    from animaltrackingetls_spark.operators import multimodal as mm

    spark = _spark()

    docs = entry._t(spark, SF_DIR, "documents")

    def payload(kind: str):
        d = docs.select(F.col("doc_id").cast("long").alias("media_id"))
        if kind == "png":
            return d.select(
                "media_id",
                mm.synthesize_png_header(
                    (F.col("media_id") % 1024 + 16).cast("long"),
                    (F.col("media_id") * 7 % 768 + 16).cast("long"),
                ).alias("p"),
            )
        if kind == "jpeg":
            return d.select(
                "media_id",
                mm.synthesize_jpeg_header(
                    (F.col("media_id") * 13 % 512 + 32).cast("long"),
                    (F.col("media_id") * 3 % 512 + 32).cast("long"),
                ).alias("p"),
            )
        if kind == "gif":
            return d.select(
                "media_id",
                mm.synthesize_gif_header(
                    (F.col("media_id") * 11 % 640 + 8).cast("long"),
                    (F.col("media_id") * 5 % 480 + 8).cast("long"),
                ).alias("p"),
            )
        if kind == "bmp":
            return d.select(
                "media_id",
                mm.synthesize_bmp_header(
                    (F.col("media_id") * 17 % 320 + 4).cast("long"),
                    (F.col("media_id") * 19 % 240 + 4).cast("long"),
                    F.when(F.col("media_id") % 3 == 0, F.lit(8)).otherwise(F.lit(24)),
                    F.col("media_id") % 2 == 1,
                ).alias("p"),
            )
        return d.select(
            "media_id",
            mm.synthesize_tiff_header(
                (F.col("media_id") * 23 % 2048 + 1).cast("long"),
                (F.col("media_id") * 29 % 2048 + 1).cast("long"),
                F.when(F.col("media_id") % 4 == 0, F.lit(16)).otherwise(F.lit(8)),
                (F.col("media_id") % 3).cast("long"),
                F.col("media_id") % 2 == 0,
            ).alias("p"),
        )

    arms = {}
    for kind in ("png", "jpeg", "gif", "bmp", "tiff"):
        arms[f"synth_{kind}"] = (lambda k=kind: payload(k))
        arms[f"coalesce_{kind}"] = (
            lambda k=kind: payload(k).select(
                "media_id",
                entry.multimodal.image_header(F.col("p")).alias("h"),
            )
        )
        arms[f"dispatch_{kind}"] = (
            lambda k=kind: payload(k).select(
                "media_id", _dispatched_image_header(F.col("p")).alias("h")
            )
        )
    _interleave(arms, runs=3)


# ---------------------------------------------------------------------------
# dup_gram_positions broadcast semi-join (verdict #4)
# ---------------------------------------------------------------------------


def _sdocs(spark):
    return entry._t(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % 3 == 0
    ).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit(" the quick brown fox jumps over the lazy dog today"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def grams() -> None:
    from animaltrackingetls_spark.operators import dedup
    from animaltrackingetls_spark.operators.dedup import tokens

    spark = _spark()

    def gram_frame():
        toked = _sdocs(spark).select(
            F.col("doc_id").alias("id"),
            F.explode(
                F.array(F.coalesce(tokens(F.col("text")),
                                   F.array().cast("array<string>")))
            ).alias("tk"),
        )
        gram_hashes = F.when(
            F.size("tk") >= 5,
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - F.lit(4)),
                lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("tk"), i, 5))),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return toked.select("id", F.posexplode(gram_hashes).alias("pos0", "gh"))

    def current():
        return dedup.dup_gram_positions(_sdocs(spark), k=5, min_docs=2)

    def bcast_semi():
        g = gram_frame()
        dup = (
            g.groupBy("gh")
            .agg(F.count_distinct("id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("gh")
        )
        return g.join(F.broadcast(dup), "gh", "leftsemi").select(
            "id", "pos0", "gh"
        )

    _interleave({"current": current, "bcast_semi": bcast_semi}, runs=5)


def segments() -> None:
    spark = _spark()
    qs = entry.queries()

    def whole():
        return qs["segments_chunks"](spark, SF_DIR)

    def seg():
        return entry._q_segment_dedup(spark, SF_DIR)

    def chunk():
        return entry._q_chunk_documents(spark, SF_DIR)

    def boiler():
        from animaltrackingetls_spark.operators import dedup

        mdocs = entry._t(spark, SF_DIR, "documents").select(
            "doc_id",
            F.concat(
                F.lit("HDR: subscribe to our newsletter\n"),
                F.col("text"),
                F.lit("\nSRC: "),
                F.col("source"),
            ).alias("text"),
        )
        return dedup.remove_boilerplate_lines(mdocs, min_docs=10)

    def spans():
        from animaltrackingetls_spark.operators import dedup

        sd = _sdocs(spark)
        g = dedup.dup_gram_positions(sd, k=5, min_docs=2).localCheckpoint(
            eager=True
        )
        _CLEANUP.append(g)
        a = dedup.duplicate_spans(sd, k=5, min_docs=2, gram_positions=g)
        b = dedup.remove_duplicate_spans(sd, k=5, min_docs=2, gram_positions=g)
        return a.select("id").unionByName(b.select("id"))

    def html():
        from animaltrackingetls_spark.operators import textstats

        hdocs = entry._t(spark, SF_DIR, "documents").filter(
            F.col("doc_id") % 4 == 1
        ).select(
            "doc_id",
            F.concat(
                F.lit('<html><head><title>D</title><style>p{color:#000}</style>'
                      '<script>var t="<p>trap</p>";</script></head>'
                      '<body><!-- menu<b>x</b> --><div>Home &gt; Docs</div><p>'),
                F.col("text"),
                F.lit('</p><footer>&amp;copy 2024</footer></body></html>'),
            ).alias("html"),
        )
        return hdocs.select(
            "doc_id",
            F.length("html").alias("n1"),
            textstats.html_to_text(F.col("html")).alias("txt"),
        )

    _interleave(
        {"whole": whole, "seg": seg, "chunk": chunk, "boiler": boiler,
         "spans": spans, "html": html},
        runs=3,
    )


# ---------------------------------------------------------------------------
# quantile_profile two-level merge (verdict #5)
# ---------------------------------------------------------------------------


def quantile2() -> None:
    from animaltrackingetls_spark.operators import layout, profile

    spark = _spark()
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    probs = (0.01, 0.25, 0.5, 0.75, 0.99)

    def li():
        return layout.ensure_scan_parallelism(
            entry._t(spark, SF_DIR, "lineitem").select(*cols)
        )

    def current():
        return profile.profile_quantiles(li(), cols, probs).orderBy(
            "col_name", "prob"
        )

    def grouped():
        # unpivot -> groupBy(col_name).agg(percentile) : partial maps
        # build map-side per (partition, column), the shuffle carries
        # maps not rows, and the final merge is one task PER COLUMN
        # instead of one task for all four
        plist = ", ".join(repr(float(p)) for p in probs)
        stacked = li().select(
            F.expr(
                "stack(4, 'l_quantity', l_quantity, "
                "'l_extendedprice', l_extendedprice, "
                "'l_discount', CAST(l_discount AS DOUBLE), "
                "'l_tax', CAST(l_tax AS DOUBLE)) AS (col_name, v)"
            )
        )
        q = stacked.groupBy("col_name").agg(
            F.expr(f"percentile(v, array({plist}))").alias("qs")
        )
        entries = F.posexplode(F.col("qs"))
        return q.select("col_name", entries.alias("i", "q")).orderBy(
            "col_name", "i"
        )

    _interleave({"current": current, "grouped": grouped}, runs=5)


# ---------------------------------------------------------------------------
# stream_dedup_keys noDataMicroBatches (verdict #6)
# ---------------------------------------------------------------------------


def stream_dedup() -> None:
    spark = _spark()
    qs = entry.queries()

    def run(flag: str) -> float:
        prev = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled",
                              "true")
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", flag)
        try:
            t0 = time.monotonic()
            n = qs["stream_dedup_keys"](spark, SF_DIR).count()
            return time.monotonic() - t0, n
        finally:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev
            )

    print(f"gemm floor: {bench.gemm_probe(5):.4f}s  loadavg {os.getloadavg()}")
    walls = {"on": [], "off": []}
    rows = {}
    for i in range(6):
        for flag, key in (("true", "on"), ("false", "off")):
            dt, n = run(flag)
            walls[key].append(dt)
            rows[key] = n
    print(f"rows: {rows}")
    for key, ws in walls.items():
        kept = ws[1:]
        print(
            f"noData={key}: median {statistics.median(kept):.3f}s "
            f"min {min(kept):.3f}s walls={[round(w, 3) for w in ws]}"
        )


# ---------------------------------------------------------------------------
# ivf_topk train layout (verdict #7)
# ---------------------------------------------------------------------------


def ivf_train() -> None:
    from animaltrackingetls_spark.operators import similarity

    spark = _spark()
    emb = entry._t(spark, SF_DIR, "embeddings")

    def fit_current():
        index = similarity.ivf_index(emb, n_centroids=8)
        return index.assignment.select("vec_id", "cell")

    _interleave({"fit_current": fit_current}, runs=5)


if __name__ == "__main__":
    globals()[sys.argv[1]]()

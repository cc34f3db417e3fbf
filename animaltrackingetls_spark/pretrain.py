"""One-call pretraining corpus build — the LLM-data tier end-to-end.

The reference's lifecycle (SURVEY.md §3.1) is extract→clean→enrich→load
for occurrence records; this is the same composition discipline applied
to a training corpus: quality gate → LM filter → exact dedup → sequence
packing → ordered shard export, all one lazy Catalyst plan up to the
write. Static filters push to the scan; the only shuffles are the LM
word-count, the per-doc score reduce, the dedup window, the per-source
pack window, and the export's range exchange.

Stage provenance: the filter thresholds and stage order mirror the
oracle-checked `pretrain_pipeline` driver query, which calls this
function — one implementation, hash-verified against DuckDB at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import dedup, textstats


def build_pretraining_corpus(
    docs: DataFrame,
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.8,
    min_stopword_ratio: float = 0.01,
    lang: str = "en",
    min_lm_logprob: float = -3.45,
    max_tokens: int = 2048,
    partition_col: str = "source",
    packing: str = "offset",
    reference_snapshot: DataFrame | None = None,
    drift_columns: list[str] | None = None,
    null_ratio_tolerance: float = 0.05,
    distinct_ratio_tolerance: float = 0.5,
) -> DataFrame:
    """documents → packed pretraining sequences, one declarative plan:

    1. quality + language gate (`textstats.quality_columns` /
       `language_id` — pure codegen, pushes to the scan);
    2. unigram-LM perplexity filter (corpus-self-trained, broadcast
       vocab — the CCNet-style stage); the score is ROUNDED before
       thresholding so a float boundary cannot flip keep/drop across
       engines;
    3. exact dedup on the md5 text fingerprint (min-id canonical);
    4. token-budget sequence packing, partition-parallel per
       ``partition_col``. ``packing="offset"`` (default) streams token
       ranges into bins and lets a boundary document straddle (the
       pretokenized-shard shape); ``packing="bestfit"`` packs each
       document WHOLE via best-fit-decreasing
       (:func:`~.operators.textstats.pack_documents_bestfit` — the
       sample-packing shape, adds an ``oversize`` flag column).

    Returns (doc_id, n_tokens, ``partition_col``, bin_id[, oversize]).

    ``reference_snapshot`` arms the DRIFT GATE (step 0): the incoming
    ``docs`` batch is profiled against the snapshot
    (:func:`~.operators.profile.assert_no_drift`) and the build refuses
    to start — raising ``DriftDetected`` with the flagged checks — if
    the upstream shape changed outside tolerance (null-ratio jump,
    cardinality collapse, schema add/drop). At 100 TB a silently
    drifted source poisons every downstream shard for days; blocking
    the load is the cheap failure. The gate's two profile passes are
    single-aggregation scans; its collect is bounded at
    checks × columns rows.
    """
    if reference_snapshot is not None:
        from .operators.profile import assert_no_drift

        assert_no_drift(
            reference_snapshot,
            docs,
            columns=drift_columns,
            null_ratio_tolerance=null_ratio_tolerance,
            distinct_ratio_tolerance=distinct_ratio_tolerance,
        )
    lm = textstats.unigram_lm_scores(docs)
    q = textstats.quality_columns(textstats.language_id(docs))
    kept = (
        q.filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("alpha_ratio") >= min_alpha_ratio)
            & (F.col("stopword_ratio") >= min_stopword_ratio)
            & (F.col("predicted_lang") == lang)
        )
        .join(lm, F.col("doc_id") == lm["id"])
        .filter(F.round("lm_logprob", 6) >= min_lm_logprob)
        .withColumn("md5_fp", F.md5("text"))
    )
    if packing not in ("offset", "bestfit"):
        raise ValueError(f"packing must be offset|bestfit, got {packing!r}")
    deduped = dedup.drop_exact_duplicates(kept, ["md5_fp"], "doc_id")
    if packing == "bestfit":
        return textstats.pack_documents_bestfit(
            deduped, max_tokens, token_col="n_tokens", group_col=partition_col
        ).select(
            F.col("id").alias("doc_id"),
            F.col("tokens").alias("n_tokens"),
            F.col("group").alias(partition_col),
            "bin_id",
            "oversize",
        )
    return textstats.pack_documents(
        deduped, max_tokens=max_tokens, partition_col=partition_col
    )


def export_pretraining_shards(
    docs: DataFrame,
    path: str,
    num_shards: int,
    **corpus_kwargs,
) -> DataFrame:
    """Build the corpus and write it as contiguous ordered shards
    (``ordering.export_ordered_shards``): global order is
    (partition_col, bin_id, doc_id) — sources stay contiguous, bins in
    order within a source, so a reader streaming shard files gets whole
    training sequences in a deterministic curriculum order. Returns the
    per-shard verification manifest.
    """
    from .operators.ordering import export_ordered_shards

    partition_col = corpus_kwargs.get("partition_col", "source")
    corpus = build_pretraining_corpus(docs, **corpus_kwargs)
    return export_ordered_shards(
        corpus, [partition_col, "bin_id", "doc_id"], num_shards, path
    )

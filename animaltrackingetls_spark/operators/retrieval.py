"""Distributed lexical retrieval (TF-IDF / BM25) over a document corpus.

A training-data pipeline needs query-driven corpus slicing — "pull the
top-k documents about X" — next to its filters and dedup. This module
implements Okapi BM25 as a pure DataFrame composition, shaped so the
expensive parts scale:

* **Filter before aggregate.** Tokens are exploded and immediately
  filtered to the query's terms, so only (doc, query-term) pairs enter
  the shuffle — at 100 TB the full corpus token stream never shuffles;
  the per-document scan emits at most ``|query|`` distinct terms per doc.
* **Corpus statistics are O(1) rows.** N and the average document length
  reduce to a single row (map-side partial aggregation) and re-enter the
  plan as a scalar subquery (`joins.attach_scalar`) — computed once,
  injected as a literal, no join node and no shuffle.
* **Document frequencies are O(|query|) rows** — aggregated from the
  already-filtered tf frame and broadcast back for the idf join.
* **Top-k is TakeOrderedAndProject**, never a global sort: each
  partition keeps k candidates, the driver merges k × partitions rows.

Scores are rounded before ranking so the ordering (and therefore the
k-boundary) is reproducible across engines despite float-sum ordering
differences; ties break on document id.

The tokenizer is shared with :mod:`.textstats` (lower-cased non-whitespace runs
runs) so retrieval, quality scoring, and dedup all agree on what a
"word" is.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .joins import attach_scalar

from .textstats import token_count, tokens

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def term_frequencies(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, term, tf)`` for the query's terms only.

    The ``isin`` filter sits between the Generate (explode) and the
    aggregation, so rows for non-query terms die in the same stage that
    produced them — the shuffle carries only matching pairs.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term").isin(query_terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Okapi BM25 top-k: ``(doc_id, bm25, n_query_terms)``.

    ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the non-negative
    Robertson–Sparck-Jones form) and the standard saturation/length
    normalization ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Only documents containing ≥1 query term are scored (disjunctive
    retrieval); everything else is pruned before any shuffle.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # Per-document length rides INSIDE the tf pass as a grouping key
    # (constant per document), so the corpus-wide (id, dl) shuffle join
    # the previous shape paid is gone entirely — the only corpus-sized
    # shuffle is the pruned (doc, query-term) stream, now 8 bytes/row
    # wider. The token array is bound once (explode of a 1-element
    # array) so size() and the explode read an attribute, not two
    # regexp passes.
    bound = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(tokens(F.col(text_col)))).alias("tk"),
    )
    tf = (
        bound.select("id", F.size("tk").alias("dl"), F.explode("tk").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    # Corpus constants: one row, re-entering as a scalar subquery.
    stats = docs.select(token_count(F.col(text_col)).alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # Document frequency per query term: ≤ |query| rows, broadcast.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    k1_l, b_l = F.lit(float(k1)), F.lit(float(b))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    saturation = (F.col("tf") * (k1_l + F.lit(1.0))) / (
        F.col("tf")
        + k1_l * (F.lit(1.0) - b_l + b_l * F.col("dl") / F.col("avgdl"))
    )

    scored = (
        attach_scalar(tf.join(F.broadcast(dfreq), "term"), stats)
        .groupBy("id")
        .agg(
            F.sum(idf * saturation).alias("score"),
            F.count(F.lit(1)).alias("n_query_terms"),
        )
    )
    return (
        scored.select(
            F.col("id").alias(id_col),
            F.round("score", 6).alias("bm25"),
            F.col("n_query_terms").cast("long").alias("n_query_terms"),
        )
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def tf_idf_vectors(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Sparse TF-IDF weights ``(id, term, weight)`` for the whole corpus
    — the feature-extraction sibling of :func:`bm25_topk` (which prunes
    to a query). ``weight = tf · ln(N / df)``; terms below ``min_df``
    are dropped.

    This one DOES shuffle the corpus token stream (it must — every term
    is kept); the aggregation is two hash-agg stages with map-side
    partial combine, the same shape as the wordcount in
    ``textstats.repetition_signals``. The df side is aggregated once and
    joined back on term — at web scale that join key is Zipf-skewed, so
    AQE skew-join (enabled in session.py) is the mitigation.
    """
    tf = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # N as a broadcast single-row frame, not a driver-side .count() —
    # keeps the operator lazy and the whole thing one job.
    stats = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    return (
        attach_scalar(tf.join(dfreq, "term"), stats)
        .select(
            "id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("weight"),
        )
    )


def bm25_oracle_sql(
    query_terms: list[str],
    k: int,
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """The DuckDB twin of :func:`bm25_topk` — same tokenizer, same
    formula, same rounding and tie-break, for the correctness gate."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    assert math.isfinite(k1) and math.isfinite(b)
    return f"""
        WITH tok AS (
          SELECT {id_col}, regexp_extract_all(lower({text_col}), '[^ \\t\\n\\x0b\\f\\r]+') AS toks
          FROM {table}
        ),
        dl AS (SELECT {id_col}, len(toks) AS dl FROM tok),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        tf AS (
          SELECT {id_col}, w AS term, count(*) AS tf
          FROM (SELECT {id_col}, unnest(toks) AS w FROM tok)
          WHERE w IN ({terms})
          GROUP BY {id_col}, w
        ),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.{id_col},
                 sum(ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))
                 ) AS score,
                 count(*) AS n_query_terms
          FROM tf
          JOIN dfreq USING (term)
          JOIN dl USING ({id_col})
          CROSS JOIN stats
          GROUP BY tf.{id_col}
        )
        SELECT {id_col}, round(score, 6) AS bm25,
               CAST(n_query_terms AS BIGINT) AS n_query_terms
        FROM scored
        ORDER BY round(score, 6) DESC, {id_col}
        LIMIT {int(k)}
    """


def rrf_fusion(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    *,
    pool: int = 50,
    k_rrf: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    lex_pool: DataFrame | None = None,
) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical
    top-``pool`` and the dense cosine top-``pool`` (query = the
    ``query_vec_id`` embedding; doc ids and vec ids are the same key
    space) merge with the standard RRF score
    ``sum(1 / (k_rrf + rank))`` and the fused top-k survives.

    Returns ``(doc_id, rrf, lex_rank, vec_rank)`` — NULL rank means the
    document reached the fused list through one retriever only.

    Scale shape: each retriever prunes to ``pool`` rows BEFORE fusion
    (BM25 via TakeOrderedAndProject, cosine via its per-query window),
    so the fusion join touches 2·pool rows no matter the corpus size;
    both sides broadcast. The single-partition rank windows run on
    those pool-sized frames, not the corpus.

    ``lex_pool`` lets a caller who ALREADY has a BM25 result (e.g. a
    fold running the lexical top-k next to the fusion, or a cached
    retriever output) feed it in instead of rescoring the corpus: any
    frame with (``id_col``, ``bm25``) columns and ≥ ``pool`` of the
    top documents works — it is re-ranked with the same (score desc,
    id) tie-break and cut to ``pool``. Inside one query plan the shared
    subtree's exchanges are reused, so the corpus is tokenized and
    aggregated once for both branches.
    """
    from .similarity import brute_force_topk

    if k_rrf < 1:
        raise ValueError(f"k_rrf must be >= 1, got {k_rrf}")
    bm = lex_pool if lex_pool is not None else bm25_topk(
        docs, query_terms, pool, text_col=text_col, id_col=id_col
    )
    # rank over the already-limited pool frame (<= pool rows; the window
    # is single-partition by construction and bounded by `pool`).
    w_lex = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    lex = bm.select(
        F.col(id_col).alias("id"), F.row_number().over(w_lex).alias("lex_rank")
    ).filter(F.col("lex_rank") <= pool)
    q = emb.filter(F.col(vec_id_col) == query_vec_id)
    cos = brute_force_topk(
        emb, q, k=pool, id_col=vec_id_col, vec_col=vec_col,
        query_id_col=vec_id_col, round_digits=6,
    ).select(F.col("n_id").alias("id"), F.col("rank").alias("vec_rank"))

    # RRF is a SUM of per-retriever contributions, so the fusion is an
    # aggregation, not a join: union the two rank streams and groupBy id
    # — one exchange over ≤ 2·pool rows, vs the full-outer join's two,
    # and the same shape generalizes to any number of retrievers.
    contrib = lex.select(
        "id",
        (F.lit(1.0) / (F.lit(k_rrf) + F.col("lex_rank"))).alias("c"),
        F.col("lex_rank").cast("int").alias("lex_rank"),
        F.lit(None).cast("int").alias("vec_rank"),
    ).unionByName(
        cos.select(
            "id",
            (F.lit(1.0) / (F.lit(k_rrf) + F.col("vec_rank"))).alias("c"),
            F.lit(None).cast("int").alias("lex_rank"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
        )
    )
    fused = contrib.groupBy("id").agg(
        F.round(F.sum("c"), 9).alias("rrf"),
        F.max("lex_rank").alias("lex_rank"),
        F.max("vec_rank").alias("vec_rank"),
    )
    return (
        fused.select(
            F.col("id").alias(id_col), "rrf", "lex_rank", "vec_rank"
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def rrf_oracle_sql(
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    *,
    pool: int = 50,
    k_rrf: int = 60,
) -> str:
    """DuckDB twin of :func:`rrf_fusion` over the pre-registered
    ``documents``/``embeddings`` views — same pools, ranks, rounding,
    and tie-breaks."""
    bm25 = bm25_oracle_sql(query_terms, pool)
    return f"""
        WITH bm_pool AS ({bm25}),
        lex AS (
          SELECT doc_id AS id,
                 row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
          FROM bm_pool
        ),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT * FROM e WHERE vec_id = {int(query_vec_id)}),
        scored AS (
          SELECT c.vec_id AS id,
                 round(list_dot_product(q.v, c.v)
                       / (sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine_sim
          FROM q JOIN e c ON c.vec_id != q.vec_id
        ),
        vec AS (
          SELECT id, vec_rank FROM (
            SELECT id, row_number() OVER (ORDER BY cosine_sim DESC, id) AS vec_rank
            FROM scored
          ) WHERE vec_rank <= {int(pool)}
        ),
        fused AS (
          SELECT coalesce(lex.id, vec.id) AS doc_id,
                 round(coalesce(1.0 / ({int(k_rrf)} + lex.lex_rank), 0)
                       + coalesce(1.0 / ({int(k_rrf)} + vec.vec_rank), 0), 9) AS rrf,
                 CAST(lex.lex_rank AS INT) AS lex_rank,
                 CAST(vec.vec_rank AS INT) AS vec_rank
          FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
        )
        SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT {int(k)}
    """

"""Linear quality scorer: hand-computed parity, broadcast plan, edges."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from animaltrackingetls_spark.operators.quality_model import (
    linear_quality_scores,
    synthetic_weights,
    token_bucket,
)


def _py_bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % n_buckets


def _py_weight(bucket: int, seed: str = "qw") -> float:
    h = hashlib.md5(f"{seed}:{bucket}".encode()).hexdigest()
    return round((int(h[:4], 16) % 2001 - 1000) / 1000.0, 3)


def test_scores_match_hand_computed_reference(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "THE the the"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    w = synthetic_weights(spark, 256)
    out = {r.id: r for r in linear_quality_scores(docs, w, 256).collect()}
    assert len(out) == 4

    for doc_id, text in [(1, "the quick brown fox"), (2, "THE the the")]:
        toks = text.lower().split()
        logit = round(sum(_py_weight(_py_bucket(t, 256)) for t in toks), 6)
        assert out[doc_id].n_feat == len(toks)
        assert out[doc_id].logit == logit
        assert out[doc_id].score == round(1 / (1 + math.exp(-logit)), 4)

    for empty_id in (3, 4):  # tokenless docs: untrained prior
        assert out[empty_id].n_feat == 0
        assert out[empty_id].logit == 0.0
        assert out[empty_id].score == 0.5


def test_duplicate_tokens_count_term_frequency(spark):
    docs = spark.createDataFrame([(1, "a a a"), (2, "a")], "doc_id long, text string")
    w = synthetic_weights(spark, 64)
    out = {r.id: r.logit for r in linear_quality_scores(docs, w, 64).collect()}
    assert abs(out[1] - 3 * out[2]) < 1e-9


def test_weight_join_is_broadcast_and_bucket_in_range(spark):
    from animaltrackingetls_spark.plans.audit import assert_broadcast_join

    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    w = synthetic_weights(spark, 128)
    df = linear_quality_scores(docs, w, 128)
    assert_broadcast_join(df)

    buckets = [
        r.b
        for r in spark.createDataFrame([(t,) for t in "abcdefgh"], "tok string")
        .select(token_bucket(F.col("tok"), 32).alias("b"))
        .collect()
    ]
    assert all(0 <= b < 32 for b in buckets)


def test_train_weights_learns_separable_vocab(spark):
    from animaltrackingetls_spark.operators.quality_model import (
        linear_quality_scores,
        train_weights,
    )

    good_words = ["insightful", "thorough", "rigorous"]
    bad_words = ["spam", "clickbait", "scam"]
    rows = []
    for i in range(60):
        w = good_words if i % 2 == 0 else bad_words
        text = " ".join(w[(i + j) % 3] for j in range(5))
        rows.append((i, text, 1 if i % 2 == 0 else 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")

    weights = train_weights(docs, "label", n_buckets=512)
    assert weights.filter("bucket >= 0").count() > 0

    # trained weights drop straight into the broadcast-join scorer
    scored = linear_quality_scores(
        docs, weights.filter("bucket >= 0"), n_buckets=512
    )
    got = {r.id: r.score for r in scored.collect()}
    good_scores = [got[i] for i in range(60) if i % 2 == 0]
    bad_scores = [got[i] for i in range(60) if i % 2 == 1]
    assert min(good_scores) > max(bad_scores)  # separable vocab → separated scores

def test_training_feature_plan_has_no_python_row_udf(spark):
    """The densify + array_to_vector feature assembly must stay JVM-side:
    no BatchEvalPython (row UDF) node anywhere in the training frame's
    plan (ArrowEvalPython would also indicate a Python detour)."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.quality_model import token_bucket
    from animaltrackingetls_spark.operators.textstats import tokens
    from animaltrackingetls_spark.plans.audit import formatted_plan

    docs = spark.createDataFrame(
        [(1, "alpha beta", 1), (2, "gamma delta", 0)],
        "doc_id long, text string, label int",
    )
    n_buckets = 64
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.col("label").cast("double").alias("label"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).withColumn("bucket", token_bucket(F.col("tok"), n_buckets))
    rows = (
        toks.groupBy("id", "label", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("id", "label")
        .agg(
            F.map_from_arrays(
                F.collect_list("bucket"), F.collect_list(F.col("tf").cast("double"))
            ).alias("feats")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.coalesce(F.element_at(F.col("feats"), i), F.lit(0.0)),
    )
    train_df = rows.select("label", array_to_vector(dense).alias("features"))
    plan = formatted_plan(train_df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # and it still yields usable vectors
    vecs = train_df.collect()
    assert all(v.features.size == n_buckets for v in vecs)

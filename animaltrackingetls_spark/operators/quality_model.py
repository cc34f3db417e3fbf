"""Linear text-quality classifier — model inference as a broadcast join.

The fastText-style quality gate of a pretraining pipeline (a linear
model over hashed bag-of-token features) expressed Spark-first: tokens
hash to feature buckets JVM-side, bucket weights arrive as a BROADCAST
frame (a model is just a small dimension table), and the per-document
logit is one hash aggregation. No UDFs anywhere — inference is a join.

Scale shape: explode(tokens) → broadcast-hash join on bucket →
groupBy(doc) partial+final sum. The only shuffle is the per-doc reduce,
sized by documents not tokens; the weight table is O(n_buckets) rows
regardless of corpus size. Swapping in real trained weights is a data
change, not a code change.

Hashing is the portable md5-prefix idiom (cf. operators/sampling.py), so
a SQL oracle replays bucket assignment and scores exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import tokens

DEFAULT_BUCKETS = 4096

# DuckDB-side hex→int for the first 4 md5 chars (no conv() there); the
# sharded_shuffle precedent. {col} is the md5-hex string expression.
_SQL_HEX4 = (
    "((strpos('0123456789abcdef', substr({col}, 1, 1)) - 1) * 4096"
    " + (strpos('0123456789abcdef', substr({col}, 2, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr({col}, 3, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr({col}, 4, 1)) - 1))"
)


def token_bucket(tok: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Feature-hash a token to [0, n_buckets): first 16 bits of md5."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("long") % n_buckets
    ).cast("int")


def synthetic_weights(
    spark: SparkSession, n_buckets: int = DEFAULT_BUCKETS, seed: str = "qw"
) -> DataFrame:
    """Deterministic stand-in weight vector: (bucket, weight) with
    weight in [-1, 1], derived from md5 so ANY engine regenerates the
    identical model. Production replaces this with trained weights read
    from a table — same join, same plan."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col("id").cast("string")))
    w = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 2001 - 1000) / 1000.0
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"), F.round(w, 3).alias("weight")
    )


def synthetic_weights_sql(n_buckets: int = DEFAULT_BUCKETS, seed: str = "qw") -> str:
    """DuckDB twin of :func:`synthetic_weights` (a CTE body)."""
    hex4 = _SQL_HEX4.format(col=f"md5('{seed}:' || CAST(i AS VARCHAR))")
    return (
        f"SELECT CAST(i AS INT) AS bucket,"
        f" round(({hex4} % 2001 - 1000) / 1000.0, 3) AS weight"
        f" FROM (SELECT unnest(range(0, {n_buckets})) AS i)"
    )


def linear_quality_scores(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document linear score: ``(id, n_feat, logit, score)``.

    logit = Σ weight[bucket(token)] over ALL token occurrences (term
    frequency weighting — duplicates count); score = sigmoid(logit).
    Documents with no tokens keep logit 0 → score 0.5 (the untrained
    prior), via the left join back to the full document set.

    The logit is rounded to 6 dp BEFORE the sigmoid on both engines:
    float partial-sum order differs between engines, and the sigmoid
    must see identical inputs for the scores to hash-match.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("bucket", token_bucket(F.col("tok"), n_buckets))
    per_doc = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feat"),
            F.round(F.sum("weight"), 6).alias("logit"),
        )
    )
    base = docs.select(F.col(id_col).alias("id"))
    out = base.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_feat", F.lit(0)).alias("n_feat"),
        F.coalesce("logit", F.lit(0.0)).alias("logit"),
    )
    return out.withColumn(
        "score", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 4)
    )


def train_weights(
    docs: DataFrame,
    label_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    reg_param: float = 0.0,
    max_iter: int = 50,
) -> DataFrame:
    """Train the bucket weights with Spark MLlib logistic regression —
    closing the loop: ``train_weights`` → (bucket, weight) table →
    :func:`linear_quality_scores` broadcast-join inference. The
    feature space is the SAME hashed bag-of-tokens (term-frequency
    counts per md5 bucket) the scorer reads, so trained weights drop in
    for the synthetic ones with no inference change.

    Returns (bucket, weight) for every bucket the model saw, plus the
    intercept as bucket = -1 (callers who ignore it get the
    uncalibrated ranking, which is unchanged by a constant).

    Scale shape: feature assembly is the scorer's explode + hash agg
    (one shuffle), densified JVM-side and converted with the built-in
    ``array_to_vector`` (no Python UDF in the plan); LBFGS then iterates
    via MLlib's distributed aggregation. Training is the rare, offline
    step on a labeled sample — inference never touches MLlib.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("double").alias("label"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("bucket", token_bucket(F.col("tok"), n_buckets))
    counts = toks.groupBy("id", "label", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
    rows = counts.groupBy("id", "label").agg(
        F.map_from_arrays(
            F.collect_list("bucket"), F.collect_list(F.col("tf").cast("double"))
        ).alias("feats")
    )

    # Densify the bucket→tf map JVM-side (transform over a 0..n_buckets-1
    # sequence) and hand MLlib the vector via the built-in
    # `array_to_vector` — no Python row UDF anywhere in the plan (the
    # training path stays whole-stage-codegen until LBFGS takes over).
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.coalesce(F.element_at(F.col("feats"), i), F.lit(0.0)),
    )
    train_df = rows.select("label", array_to_vector(dense).alias("features"))
    model = LogisticRegression(
        regParam=reg_param, maxIter=max_iter, standardization=False
    ).fit(train_df)

    spark = docs.sparkSession
    coef = model.coefficients
    if hasattr(coef, "indices"):  # SparseVector
        nonzero = [(int(i), float(coef[int(i)])) for i in coef.indices]
    else:  # DenseVector — keep only buckets the model actually weighted
        nonzero = [(i, float(v)) for i, v in enumerate(coef) if v != 0.0]
    weight_rows = [(-1, float(model.intercept))] + nonzero
    return spark.createDataFrame(weight_rows, "bucket int, weight double")

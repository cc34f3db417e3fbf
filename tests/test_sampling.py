"""Deterministic sampling: partitioning-independence and rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from animaltrackingetls_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)


def _docs(spark):
    rows = [(i, "en" if i % 3 else "zh") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_sample_is_partitioning_independent(spark):
    df = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.25).collect()}
    b = {r.doc_id for r in deterministic_sample(df.repartition(17), "doc_id", 0.25).collect()}
    assert a == b  # df.sample() would NOT survive this


def test_sample_rate_approximate(spark):
    df = _docs(spark)
    n = deterministic_sample(df, "doc_id", 0.25).count()
    assert 0.20 * 2000 < n < 0.30 * 2000


def test_sample_monotone_in_rate(spark):
    df = _docs(spark)
    small = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5).collect()}
    assert small <= big  # nested samples: raising the rate only adds rows


def test_stratified_rates_and_dropped_strata(spark):
    df = _docs(spark)
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.5})
    langs = {r.lang for r in out.collect()}
    assert langs == {"en"}  # zh absent from rates → dropped
    n_en = out.count()
    total_en = df.filter("lang = 'en'").count()
    assert 0.4 * total_en < n_en < 0.6 * total_en


def test_rate_one_keeps_everything(spark):
    df = _docs(spark)
    assert deterministic_sample(df, "doc_id", 1.0).count() == df.count()
    out = stratified_sample(df, "doc_id", "lang", {"en": 1.0})
    assert out.count() == df.filter("lang = 'en'").count()


def test_rate_zero_keeps_nothing(spark):
    assert deterministic_sample(_docs(spark), "doc_id", 0.0).count() == 0


def test_sample_rejects_bad_rate(spark):
    import pytest

    with pytest.raises(ValueError):
        deterministic_sample(_docs(spark), "doc_id", 1.5)


def test_mixture_resample_epochs_and_fractions(spark):
    from animaltrackingetls_spark.operators.sampling import mixture_resample

    df = _docs(spark).withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b")
    )
    out = mixture_resample(df, "doc_id", "source", {"a": 2.5, "b": 0.25})
    per = {
        (r.source, r.epoch): r.n
        for r in out.groupBy("source", "epoch").agg(F.count("*").alias("n")).collect()
    }
    # 'a' (1000 rows): every row twice, ~50% a third time
    assert per[("a", 1)] == per[("a", 2)] == 1000
    assert 0.42 * 1000 < per[("a", 3)] < 0.58 * 1000
    # 'b': only a fractional epoch
    assert ("b", 2) not in per
    assert 0.18 * 1000 < per[("b", 1)] < 0.32 * 1000


def test_mixture_resample_is_partitioning_independent(spark):
    from animaltrackingetls_spark.operators.sampling import mixture_resample

    df = _docs(spark).withColumn("source", F.lit("a"))
    rates = {"a": 1.5}
    a = sorted(
        (r.doc_id, r.epoch) for r in mixture_resample(df, "doc_id", "source", rates).collect()
    )
    b = sorted(
        (r.doc_id, r.epoch)
        for r in mixture_resample(df.repartition(13), "doc_id", "source", rates).collect()
    )
    assert a == b


def test_mixture_resample_drops_unlisted_and_zero_groups(spark):
    from animaltrackingetls_spark.operators.sampling import mixture_resample

    df = _docs(spark).withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b")
    )
    out = mixture_resample(df, "doc_id", "source", {"a": 0.0})
    assert out.count() == 0  # a: rate 0; b: not in the mix


def test_mixture_resample_negative_rate_raises(spark):
    import pytest

    from animaltrackingetls_spark.operators.sampling import mixture_resample

    with pytest.raises(ValueError):
        mixture_resample(_docs(spark), "doc_id", "lang", {"en": -0.5})


def test_mixture_resample_no_shuffle(spark):
    from animaltrackingetls_spark.operators.sampling import mixture_resample

    df = _docs(spark).withColumn("source", F.lit("a"))
    plan = (
        mixture_resample(df, "doc_id", "source", {"a": 2.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # replication is map-only (Generate)


# ---------------------------------------------------------------------------
# cap_per_key / sharded_shuffle
# ---------------------------------------------------------------------------


def test_cap_per_key_quota_and_preference(spark):
    from animaltrackingetls_spark.operators.sampling import cap_per_key

    rows = [(i, f"d{i % 3}", 100 - i) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, domain string, score long")
    out = cap_per_key(df, "domain", 4, [F.desc("score")], id_col="id").collect()
    by_domain = {}
    for r in out:
        by_domain.setdefault(r.domain, []).append(r.id)
    assert all(len(v) <= 4 for v in by_domain.values())
    # highest scores (lowest ids here) win per domain
    assert sorted(by_domain["d0"]) == [0, 3, 6, 9]


def test_cap_per_key_partitioning_independent(spark):
    from animaltrackingetls_spark.operators.sampling import cap_per_key

    rows = [(i, f"d{i % 5}", i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, domain string, score long")
    a = {r.id for r in cap_per_key(df, "domain", 3, [F.desc("score")], id_col="id").collect()}
    b = {
        r.id
        for r in cap_per_key(
            df.repartition(13), "domain", 3, [F.desc("score")], id_col="id"
        ).collect()
    }
    assert a == b  # the id tiebreak makes the kept set deterministic


def test_cap_per_key_rejects_bad_args(spark):
    import pytest

    from animaltrackingetls_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame([(1, "a")], "id long, domain string")
    with pytest.raises(ValueError, match="cap"):
        cap_per_key(df, "domain", 0, id_col="id")
    with pytest.raises(ValueError, match="order_cols"):
        cap_per_key(df, "domain", 1)


def test_sharded_shuffle_is_partitioning_independent(spark):
    from animaltrackingetls_spark.operators.sampling import sharded_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    a = {(r.id, r.shard, r.shard_pos) for r in sharded_shuffle(df, "id", 8, seed=3).collect()}
    b = {
        (r.id, r.shard, r.shard_pos)
        for r in sharded_shuffle(df.repartition(11), "id", 8, seed=3).collect()
    }
    assert a == b


def test_sharded_shuffle_positions_are_dense_per_shard(spark):
    from animaltrackingetls_spark.operators.sampling import sharded_shuffle

    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    out = sharded_shuffle(df, "id", 4, seed=0).collect()
    assert len(out) == 300
    shards = {}
    for r in out:
        assert 0 <= r.shard < 4
        shards.setdefault(r.shard, []).append(r.shard_pos)
    for positions in shards.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_sharded_shuffle_seed_changes_permutation(spark):
    from animaltrackingetls_spark.operators.sampling import sharded_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    a = {(r.id, r.shard, r.shard_pos) for r in sharded_shuffle(df, "id", 8, seed=0).collect()}
    b = {(r.id, r.shard, r.shard_pos) for r in sharded_shuffle(df, "id", 8, seed=1).collect()}
    assert a != b


def test_sharded_shuffle_rejects_bad_shards(spark):
    import pytest

    from animaltrackingetls_spark.operators.sampling import sharded_shuffle

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="num_shards"):
        sharded_shuffle(df, "id", 0)


# ---------------------------------------------------------------------------
# temperature_rates
# ---------------------------------------------------------------------------


def test_temperature_rates_flatten_toward_uniform():
    from animaltrackingetls_spark.operators.sampling import temperature_rates

    counts = {"big": 9000, "small": 1000}
    natural = temperature_rates(counts, alpha=1.0, total_budget=10000)
    assert abs(natural["big"] - 1.0) < 1e-9  # alpha=1: natural proportions
    assert abs(natural["small"] - 1.0) < 1e-9

    flat = temperature_rates(counts, alpha=0.0, total_budget=10000)
    assert abs(flat["small"] - 5.0) < 1e-9  # uniform: each group gets 5000
    assert abs(flat["big"] - 5000 / 9000) < 1e-9

    mid = temperature_rates(counts, alpha=0.3, total_budget=10000)
    assert natural["small"] < mid["small"] < flat["small"]


def test_temperature_rates_default_normalization_never_upsamples():
    from animaltrackingetls_spark.operators.sampling import temperature_rates

    rates = temperature_rates({"a": 100, "b": 10000, "c": 500}, alpha=0.3)
    assert max(rates.values()) == 1.0
    assert all(0 < r <= 1.0 for r in rates.values())
    assert rates["a"] == 1.0  # smallest group carries the max rate


def test_temperature_rates_compose_with_mixture_resample(spark):
    from animaltrackingetls_spark.operators.sampling import (
        mixture_resample,
        temperature_rates,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string",
    )
    counts = {r.source: r.n for r in df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    rates = temperature_rates(counts, alpha=0.0, total_budget=1000)
    out = mixture_resample(df, "doc_id", "source", rates).groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    got = {r.source: r.n for r in out.collect()}
    # uniform target: ~500 rows per source (md5-bucket granularity)
    assert abs(got["big"] - 500) < 50
    assert abs(got["small"] - 500) < 50


def test_temperature_rates_input_validation():
    import pytest as _pytest

    from animaltrackingetls_spark.operators.sampling import temperature_rates

    with _pytest.raises(ValueError):
        temperature_rates({})
    with _pytest.raises(ValueError):
        temperature_rates({"a": 0})
    with _pytest.raises(ValueError):
        temperature_rates({"a": 10}, alpha=-1)


# ---------------------------------------------------------------------------
# dataset_split
# ---------------------------------------------------------------------------


def test_dataset_split_is_disjoint_exhaustive_and_stable(spark):
    from animaltrackingetls_spark.operators.sampling import dataset_split

    df = spark.range(20000).selectExpr("id AS doc_id")
    out = dataset_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20000           # exhaustive
    assert abs(counts["train"] - 16000) < 400      # ~fractions
    assert abs(counts["val"] - 2000) < 200

    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split) for r in dataset_split(df.repartition(13), "doc_id",
         {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == b                                   # partitioning-independent


def test_dataset_split_validation():
    import pytest as _pytest

    from animaltrackingetls_spark.operators.sampling import dataset_split

    with _pytest.raises(ValueError):
        dataset_split(None, "id", {})
    with _pytest.raises(ValueError):
        dataset_split(None, "id", {"a": 0.5, "b": 0.4})


# ---------------------------------------------------------------------------
# Property tests: the md5-bucket idioms hold for arbitrary rates/fractions
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_threshold_hex_is_monotone_and_bounded(rate):
    from animaltrackingetls_spark.operators.sampling import _threshold_hex

    thr = _threshold_hex(rate)
    if thr is None:
        assert rate > 0.9999  # only ~full rates collapse to keep-everything
    else:
        assert len(thr) == 4 and int(thr, 16) <= 0xFFFF
        # monotone: a strictly smaller bucket count never gets a larger threshold
        smaller = _threshold_hex(rate / 2)
        if smaller is not None:
            assert smaller <= thr


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
        min_size=2,
        max_size=5,
    )
)
def test_dataset_split_always_disjoint_and_exhaustive(spark, raw):
    from animaltrackingetls_spark.operators.sampling import dataset_split

    total = sum(raw)
    fractions = {f"s{i}": v / total for i, v in enumerate(raw)}
    # normalize the residual rounding into the last split
    fractions[f"s{len(raw)-1}"] += 1.0 - sum(fractions.values())
    df = spark.range(500).selectExpr("id AS doc_id")
    out = dataset_split(df, "doc_id", fractions)
    assert out.count() == 500                      # exhaustive
    assert out.select("doc_id").distinct().count() == 500  # disjoint (1 row/id)
    assert {r.split for r in out.select("split").distinct().collect()} <= set(fractions)


def test_mixture_rate_fraction_rounding_to_full_epoch(spark):
    """A fractional epoch that rounds to the whole bucket space is one
    more FULL copy, not zero (2.9999999 ~ 3 epochs for every row)."""
    from animaltrackingetls_spark.operators.sampling import mixture_resample

    df = spark.createDataFrame([(i, "s") for i in range(50)], "doc_id long, src string")
    out = mixture_resample(df, "doc_id", "src", {"s": 2.9999999})
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in per_doc)


def test_cap_per_key_random_exact_and_skew_safe(spark):
    """cap_per_key_random's kept set must EQUAL the plain md5-priority
    window's (the prefilter provably never drops a true top-n row),
    survive a pathologically tight oversample via the per-key fallback,
    and be partitioning-independent."""
    from animaltrackingetls_spark.operators.sampling import (
        cap_per_key,
        cap_per_key_random,
    )

    df = (
        spark.range(20000).select(F.lit("big").alias("dom"), F.col("id"))
        .unionByName(
            spark.range(20000, 20030).select(F.lit("small").alias("dom"), F.col("id"))
        )
        .unionByName(
            spark.range(30000, 30003).select(F.lit("tiny").alias("dom"), F.col("id"))
        )
    )
    pri = F.md5(F.concat(F.lit("0:"), F.col("id").cast("string")))
    direct = {
        (r.dom, r.id)
        for r in cap_per_key(
            df.withColumn("_p", pri), "dom", 5, [F.asc("_p")], id_col="id"
        ).drop("_p").collect()
    }
    safe = {
        (r.dom, r.id)
        for r in cap_per_key_random(
            df, "dom", 5, "id", seed=0, mode="prefilter"
        ).collect()
    }
    assert safe == direct
    # a key smaller than the cap keeps everything
    assert sum(1 for d, _ in safe if d == "tiny") == 3
    # oversample barely above 1 forces the fallback path for some keys;
    # the result must stay identical
    tight = {
        (r.dom, r.id)
        for r in cap_per_key_random(
            df, "dom", 5, "id", seed=0, oversample=1.05, mode="prefilter"
        ).collect()
    }
    assert tight == direct
    # partitioning independence (the whole module's contract)
    repart = {
        (r.dom, r.id)
        for r in cap_per_key_random(
            df.repartition(17), "dom", 5, "id", seed=0, mode="prefilter"
        ).collect()
    }
    assert repart == direct


def test_cap_per_key_random_guards(spark):
    import pytest

    from animaltrackingetls_spark.operators.sampling import cap_per_key_random

    df = spark.createDataFrame([("a", 1)], "dom string, id long")
    with pytest.raises(ValueError, match="cap"):
        cap_per_key_random(df, "dom", 0, "id")
    with pytest.raises(ValueError, match="oversample"):
        cap_per_key_random(df, "dom", 3, "id", oversample=1.0)
    clash = spark.createDataFrame([("a", 1, 2)], "dom string, id long, _pri long")
    with pytest.raises(ValueError, match="reserved"):
        cap_per_key_random(clash, "dom", 3, "id")


def test_token_budget_sample_exact_vs_window_oracle(spark):
    """token_budget_sample's kept set must equal the hash-ordered
    cumulative-sum window replay (greedy prefix, overshoot at most one
    doc), survive a forced-fallback oversample, and be
    partitioning-independent."""
    import random

    from pyspark.sql import Window

    from animaltrackingetls_spark.operators.sampling import token_budget_sample

    random.seed(1)
    rows = (
        [("a", i, random.randint(1, 50)) for i in range(2000)]
        + [("b", 10_000 + i, random.randint(200, 400)) for i in range(30)]
        + [("c", 20_000, 5)]  # total below budget: kept whole
    )
    df = spark.createDataFrame(rows, "src string, doc_id long, toks long")
    pri = F.md5(F.concat(F.lit("3:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("src").orderBy(F.asc("_p"), F.asc("doc_id"))
    expected = {
        (r.src, r.doc_id)
        for r in df.withColumn("_p", pri)
        .withColumn(
            "_cum",
            F.sum("toks").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("_cum") - F.col("toks") < 1000)
        .collect()
    }

    def kept(frame, **kw):
        kw.setdefault("mode", "prefilter")
        return {
            (r.src, r.doc_id)
            for r in token_budget_sample(
                frame, "src", "toks", 1000, "doc_id", seed=3, **kw
            ).collect()
        }

    got = kept(df)
    assert got == expected
    # budget semantics: each group lands in [budget, budget + max_doc)
    # unless the whole group is smaller
    sums: dict[str, int] = {}
    toks = {(r.src, r.doc_id): r.toks for r in df.collect()}
    for k in got:
        sums[k[0]] = sums.get(k[0], 0) + toks[k]
    assert 1000 <= sums["a"] < 1050
    assert 1000 <= sums["b"] < 1400
    assert sums["c"] == 5
    assert kept(df, oversample=1.01) == expected  # fallback path, same set
    assert kept(df.repartition(13)) == expected


def test_sampler_auto_mode_parity_both_sides_of_threshold(spark):
    """mode='auto' must return the IDENTICAL kept set whichever
    physical form the skew probe selects: skew_threshold=1 forces the
    prefilter branch, a huge threshold forces the plain window, and
    both must equal the explicit-mode results (r7 VERDICT: callers
    needn't know their skew)."""
    import random

    from animaltrackingetls_spark.operators.sampling import (
        cap_per_key_random,
        token_budget_sample,
    )

    random.seed(9)
    rows = [("hot", i, random.randint(1, 60)) for i in range(3000)] + [
        ("cold", 10_000 + i, random.randint(1, 60)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, toks long")

    def cap_set(**kw):
        return {
            (r.src, r.doc_id)
            for r in cap_per_key_random(df, "src", 4, "doc_id", seed=2, **kw).collect()
        }

    want = cap_set(mode="window")
    assert cap_set(mode="prefilter") == want
    assert cap_set(mode="auto", skew_threshold=1) == want        # auto->prefilter
    assert cap_set(mode="auto", skew_threshold=10**9) == want    # auto->window
    assert cap_set() == want                                     # default auto

    def tok_set(**kw):
        return {
            (r.src, r.doc_id)
            for r in token_budget_sample(
                df, "src", "toks", 500, "doc_id", seed=2, **kw
            ).collect()
        }

    twant = tok_set(mode="window")
    assert tok_set(mode="prefilter") == twant
    assert tok_set(mode="auto", skew_threshold=1) == twant
    assert tok_set(mode="auto", skew_threshold=10**9) == twant
    assert tok_set() == twant
    # same output SCHEMA from every mode (window path must not leak
    # working columns)
    cols = set(df.columns)
    for kw in ({"mode": "window"}, {"mode": "prefilter"}, {}):
        assert set(
            cap_per_key_random(df, "src", 4, "doc_id", seed=2, **kw).columns
        ) == cols
        assert set(
            token_budget_sample(df, "src", "toks", 500, "doc_id", seed=2, **kw).columns
        ) == cols
    import pytest

    with pytest.raises(ValueError, match="mode"):
        cap_per_key_random(df, "src", 4, "doc_id", mode="magic")
    with pytest.raises(ValueError, match="mode"):
        token_budget_sample(df, "src", "toks", 500, "doc_id", mode="magic")


def test_token_budget_sample_guards(spark):
    import pytest

    from animaltrackingetls_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame([("a", 1, 10)], "src string, doc_id long, toks long")
    with pytest.raises(ValueError, match="budget"):
        token_budget_sample(df, "src", "toks", 0, "doc_id")
    with pytest.raises(ValueError, match="oversample"):
        token_budget_sample(df, "src", "toks", 5, "doc_id", oversample=0.5)
    nulls = spark.createDataFrame(
        [("a", 1, None)], "src string, doc_id long, toks long"
    )
    # the NULL/negative guard is an inline raise_error (no validation
    # pass) — it surfaces as a Spark runtime error at first contact
    # with the data, i.e. when the plan executes (the window form is
    # fully lazy; the prefilter form hits it in its internal audit)
    with pytest.raises(Exception, match=r"NULL or\s+negative"):
        token_budget_sample(nulls, "src", "toks", 5, "doc_id").collect()
    with pytest.raises(Exception, match=r"NULL or\s+negative"):
        token_budget_sample(
            nulls, "src", "toks", 5, "doc_id", mode="prefilter"
        ).collect()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=4),
    budget=st.integers(min_value=1, max_value=300),
    cap=st.integers(min_value=1, max_value=7),
)
def test_samplers_match_window_oracles_on_random_inputs(spark, sizes, budget, cap):
    """Property: for arbitrary group sizes/budgets/caps, both skew-safe
    samplers return exactly the window-replay kept set (empty groups,
    groups under budget, caps above group size included)."""
    from pyspark.sql import Window

    from animaltrackingetls_spark.operators.sampling import (
        cap_per_key_random,
        token_budget_sample,
    )

    rows = [
        (f"g{gi}", gi * 1000 + i, (i * 7 + gi) % 23 + 1)
        for gi, size in enumerate(sizes)
        for i in range(size)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "src string, doc_id long, toks long")
    pri = F.md5(F.concat(F.lit("5:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("src").orderBy(F.asc("_p"), F.asc("doc_id"))
    base = df.withColumn("_p", pri)
    tok_expected = {
        (r.src, r.doc_id)
        for r in base.withColumn(
            "_cum",
            F.sum("toks").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("_cum") - F.col("toks") < budget)
        .collect()
    }
    tok_got = {
        (r.src, r.doc_id)
        for r in token_budget_sample(
            df, "src", "toks", budget, "doc_id", seed=5, mode="prefilter"
        ).collect()
    }
    assert tok_got == tok_expected
    cap_expected = {
        (r.src, r.doc_id)
        for r in base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .collect()
    }
    cap_got = {
        (r.src, r.doc_id)
        for r in cap_per_key_random(
            df, "src", cap, "doc_id", seed=5, mode="prefilter"
        ).collect()
    }
    assert cap_got == cap_expected


def test_auto_broadcast_counts_follows_key_cardinality(spark, monkeypatch):
    """broadcast_counts=None resolves from the auto probe: the counts
    join-back gets the broadcast hint (BroadcastHashJoin in the join's
    plan) while distinct keys fit the shippable bound, and becomes a
    plain shuffle join past it — same kept set either way (the round-9
    widecap curve is the bound's evidence). The join-back is observed
    at the _counts_join_back seam because the prefilter pins survivors
    with an eager localCheckpoint, so the returned frame's plan starts
    at a Scan ExistingRDD and cannot show the join."""
    import random

    from animaltrackingetls_spark.operators import sampling

    random.seed(4)
    rows = [(f"k{i % 10}", i, random.randint(1, 9)) for i in range(400)]
    df = spark.createDataFrame(rows, "src string, doc_id long, toks long")

    seen: list = []
    real = sampling._counts_join_back

    def spy(d, counts, key, broadcast):
        out = real(d, counts, key, broadcast)
        seen.append((broadcast, out))
        return out

    monkeypatch.setattr(sampling, "_counts_join_back", spy)

    def run(fn, patched_max, **kw):
        monkeypatch.setattr(
            sampling, "_COUNTS_BROADCAST_MAX_KEYS", patched_max
        )
        seen.clear()
        out = fn(mode="auto", skew_threshold=1, **kw)
        kept = {(r.src, r.doc_id) for r in out.collect()}
        assert len(seen) == 1
        flag, joined = seen[0]
        plan = joined._jdf.queryExecution().executedPlan().toString()
        return kept, flag, plan

    def cap(**kw):
        return sampling.cap_per_key_random(df, "src", 2, "doc_id", seed=1, **kw)

    kept_b, flag_b, plan_b = run(cap, patched_max=1000)  # 10 keys <= 1000
    kept_s, flag_s, plan_s = run(cap, patched_max=5)     # 10 keys  >  5
    assert kept_b == kept_s
    assert flag_b is True and "BroadcastHashJoin" in plan_b
    assert flag_s is False and "BroadcastHashJoin" not in plan_s
    # explicit override beats the bound
    kept_f, flag_f, _ = run(cap, patched_max=1000, broadcast_counts=False)
    assert kept_f == kept_b and flag_f is False

    def tok(**kw):
        return sampling.token_budget_sample(
            df, "src", "toks", 40, "doc_id", seed=1, **kw
        )

    tkept_b, tflag_b, tplan_b = run(tok, patched_max=1000)
    tkept_s, tflag_s, tplan_s = run(tok, patched_max=5)
    assert tkept_b == tkept_s
    assert tflag_b is True and "BroadcastHashJoin" in tplan_b
    assert tflag_s is False and "BroadcastHashJoin" not in tplan_s

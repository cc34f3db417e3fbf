"""Dedup operators: exact, Jaccard, MinHash LSH, SimHash, embedding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators import dedup
from animaltrackingetls_spark.plans.audit import assert_no_cartesian

BASE = "the quick brown fox jumps over the lazy dog again and again today"
DOCS = [
    (1, BASE),
    (2, BASE),                                   # exact dup of 1
    (3, BASE + " tomorrow"),                     # near dup of 1
    (4, "completely different content about spark query engines at scale"),
    (5, "completely different content about spark query engines at scale"),  # dup of 4
    (6, "unrelated short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates_groups(docs):
    d = docs.withColumn("fp", F.md5("text"))
    groups = dedup.exact_duplicates(d, ["fp"], "doc_id").collect()
    got = {(r.canonical_id, r.n_copies) for r in groups}
    assert got == {(1, 2), (4, 2)}


def test_drop_exact_duplicates_keeps_min_id(docs):
    d = docs.withColumn("fp", F.md5("text"))
    kept = {r.doc_id for r in dedup.drop_exact_duplicates(d, ["fp"], "doc_id").collect()}
    assert kept == {1, 3, 4, 6}


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got and (4, 5) in got and (1, 3) in got
    exact = {(r.id_a, r.id_b): r.jaccard_sim for r in pairs}
    assert exact[(1, 2)] == 1.0


def test_minhash_lsh_finds_dups_and_plan_is_joined(docs):
    cand = dedup.minhash_candidate_pairs(docs, threshold=0.5)
    assert_no_cartesian(cand)
    got = {(r.id_a, r.id_b) for r in cand.collect()}
    assert (1, 2) in got and (4, 5) in got


def test_minhash_signature_forms_agree(spark, docs):
    from animaltrackingetls_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures,
        shingle_hash_frame,
    )

    k = 8
    arr = shingle_hash_frame(docs).select("id", *minhash_signature(F.col("sh"), k))
    agg = minhash_signatures(docs, num_hashes=k)
    a = {r.id: tuple(r[f"mh_{i}"] for i in range(k)) for r in arr.collect()}
    b = {r.id: tuple(r[f"mh_{i}"] for i in range(k)) for r in agg.collect()}
    assert a == b


def test_simhash_near_dups_have_small_hamming(spark, docs):
    sh = {r.id: r.simhash for r in dedup.simhash64(docs).collect()}
    d = spark.createDataFrame(
        [(sh[1], sh[3]), (sh[1], sh[4])], "a long, b long"
    ).select(dedup.hamming64(F.col("a"), F.col("b")).alias("h"))
    near, far = [r.h for r in d.collect()]
    assert near < far
    assert near <= 8


def test_minhash_rejects_bad_band_split(docs):
    with pytest.raises(ValueError):
        dedup.minhash_candidate_pairs(docs, num_hashes=32, bands=5)


def test_lsh_neardup_rejects_dim_mismatch(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        dedup.embedding_neardup_lsh(emb, dim=64).collect()


def test_simhash_keeps_empty_documents(spark):
    df = spark.createDataFrame(
        [(1, "real content here"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = {r.id: r.simhash for r in dedup.simhash64(df).collect()}
    assert set(out) == {1, 2, 3}      # empty docs get a row, not dropped
    assert out[2] == out[3]            # ...and the same deterministic hash


def test_embedding_neardup_requires_block(spark):
    emb = spark.createDataFrame([(1, [1.0, 0.0], 0)], "vec_id long, embedding array<double>, label int")
    with pytest.raises(ValueError):
        dedup.embedding_neardup_pairs(emb, block_col=None)


def test_embedding_neardup_lsh_blockless(spark):
    import random

    rng = random.Random(3)
    rows = []
    for i in range(30):
        base = [1.0, 0.0, 0.0, 0.0]
        rows.append((i, [x + rng.gauss(0, 0.005) for x in base]))   # tight cluster
    for i in range(30, 60):
        rows.append((i, [rng.gauss(0, 1) for _ in range(4)]))       # noise
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = dedup.embedding_neardup_lsh(df, dim=4, threshold=0.99, n_planes=3).collect()
    in_cluster = {(r.id_a, r.id_b) for r in pairs if r.id_a < 30 and r.id_b < 30}
    cross = [(r.id_a, r.id_b) for r in pairs if (r.id_a < 30) != (r.id_b < 30)]
    assert len(in_cluster) > 100   # most of the 435 cluster pairs recovered
    assert not cross               # no noise vector passes 0.99 cosine


def test_embedding_neardup_pairs(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [0.999, 0.01, 0.0], 0),   # near dup of 1
            (3, [0.0, 1.0, 0.0], 0),
            (4, [1.0, 0.0, 0.0], 1),      # same vector, different block → no pair
        ],
        "vec_id long, embedding array<double>, label int",
    )
    pairs = {(r.id_a, r.id_b) for r in dedup.embedding_neardup_pairs(emb, threshold=0.95).collect()}
    assert pairs == {(1, 2)}


def test_minhash_cache_handles_returned(docs):
    handles = []
    out = dedup.minhash_candidate_pairs(docs, threshold=0.5, cache_handles=handles)
    out.count()
    assert len(handles) == 1 and handles[0].is_cached
    handles[0].unpersist()
    assert not handles[0].is_cached


# ---------------------------------------------------------------------------
# Connected components / dedup clusters
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chain_edges(spark):
    # Two components: a 5-node CHAIN 10-20-30-40-50 (min label must
    # propagate 4 hops — exercises the iteration, not just one join)
    # and a 2-node pair {60, 70}; 80 is isolated (no edges → absent).
    return spark.createDataFrame(
        [(20, 10), (20, 30), (40, 30), (40, 50), (70, 60)],
        "id_a long, id_b long",
    )


def test_connected_components_multi_hop_chain(chain_edges):
    got = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components(chain_edges).collect()
    }
    assert got == {
        (10, 10), (20, 10), (30, 10), (40, 10), (50, 10),
        (60, 60), (70, 60),
    }


def test_connected_components_partitioning_independent(chain_edges):
    one = dedup.connected_components(chain_edges.repartition(1))
    many = dedup.connected_components(chain_edges.repartition(7))
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_connected_components_max_iter_caps_rounds(chain_edges):
    # One round only propagates one hop: the far chain end cannot reach
    # the min label yet, proving the loop (not a lucky plan) does the work.
    partial = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components(chain_edges, max_iter=1).collect()
    }
    assert (50, 10) not in partial
    assert (50, 40) in partial


def test_dedup_clusters_sizes(chain_edges):
    rows = dedup.dedup_clusters(None, chain_edges).collect()
    sizes = {r.id: r.cluster_size for r in rows}
    assert sizes[50] == 5 and sizes[60] == 2
    keep = {r.id for r in rows if r.id == r.cluster_id}
    assert keep == {10, 60}


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def test_contamination_overlap_counts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # contains bench 3-grams
            (2, "zeta eta theta iota kappa"),        # no overlap
            (3, "alpha beta gamma zeta eta theta"),  # one bench 3-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "totally separate words here")],
        "bench_id long, text string",
    )
    out = {
        r.id: (r.n_shingles, r.n_hits, r.contaminated)
        for r in dedup.contamination_overlap(corpus, bench, n=3).collect()
    }
    # doc 1: 3 shingles, 2 hit ("alpha beta gamma", "beta gamma delta")
    assert out[1] == (3, 2, True)
    assert out[2] == (3, 0, False)
    assert out[3] == (4, 1, True)


def test_contamination_overlap_no_cartesian(spark):
    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c")], "bench_id long, text string")
    assert_no_cartesian(dedup.contamination_overlap(corpus, bench, n=3))


def test_minhash_portable_finds_planted_near_dups(docs):
    d = docs.withColumn("n_chars", F.length("text"))
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_candidate_pairs_portable(
            d, n=2, threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs      # exact dup: identical signatures
    assert (4, 5) in pairs      # exact dup
    assert (1, 3) in pairs      # near dup: one appended word
    assert not any(6 in p for p in pairs)


def test_minhash_portable_no_cartesian_and_form(docs):
    out = dedup.minhash_candidate_pairs_portable(docs)
    assert_no_cartesian(out)
    assert out.columns == ["id_a", "id_b", "jaccard_sim"]


# ---------------------------------------------------------------------------
# Incremental dedup (batch vs existing corpus)
# ---------------------------------------------------------------------------


def test_incremental_dedup_statuses(spark):
    corpus = spark.createDataFrame(
        [(1, BASE), (2, "completely different content about spark query engines at scale")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, BASE),                    # exact dup of corpus 1
            (11, BASE + " tomorrow"),      # near dup of corpus 1
            (12, "wholly novel words never seen in any corpus document today"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.id: (r.status, r.matched_id)
        for r in dedup.incremental_dedup(new, corpus, n=2, threshold=0.5).collect()
    }
    assert out[10] == ("exact_dup", 1)
    assert out[11] == ("near_dup", 1)
    assert out[12] == ("kept", None)
    assert_no_cartesian(dedup.incremental_dedup(new, corpus, n=2, threshold=0.5))


def test_incremental_dedup_never_flags_corpus_rows(spark):
    # the corpus is not re-examined: output ids are exactly the batch ids
    corpus = spark.createDataFrame([(1, BASE), (5, BASE)], "doc_id long, text string")
    new = spark.createDataFrame([(9, "something else entirely")], "doc_id long, text string")
    ids = {r.id for r in dedup.incremental_dedup(new, corpus).collect()}
    assert ids == {9}

"""Text analysis: counts, ratios, language ID, fingerprints."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from animaltrackingetls_spark.operators import textstats


def test_quality_columns(spark):
    df = spark.createDataFrame([(1, "The cat  and the dog!")], "doc_id long, text string")
    row = textstats.quality_columns(df).collect()[0]
    assert row.n_tokens == 5
    assert row.n_chars_m == 21
    # stopwords among [the, cat, and, the, dog!]: the, and, the → 3/5
    assert abs(row.stopword_ratio - 0.6) < 1e-12
    # non [A-Za-z ] chars: '!' and one of the double spaces count as space → 20/21
    assert abs(row.alpha_ratio - 20 / 21) < 1e-12


def test_language_id_languages(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in town"),
            (2, "el perro y la casa de los amigos"),
            (3, "le chat et les amis des villes"),
            (4, "der hund und das haus ist nicht hier"),
            (5, "你好世界"),
            (6, "zxcv qwer asdf 12345"),
            (7, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.predicted_lang for r in textstats.language_id(df).collect()}
    assert out[1] == "en" and out[2] == "es" and out[3] == "fr" and out[4] == "de"
    assert out[5] == "zh"
    assert out[6] == "und"  # zero marker hits must NOT default to en
    assert out[7] == "und"


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abc"), (3, "x")], "doc_id long, text string")
    rows = {r.doc_id: (r.md5_fp, r.xx64_fp) for r in textstats.fingerprint(df).collect()}
    assert rows[1] == rows[2] != rows[3]
    assert rows[1][0] == "900150983cd24fb0d6963f7d28e17f72"  # md5('abc')


def test_token_count_bpeish_splits_runs(spark):
    df = spark.createDataFrame([("Hello, world42!",)], "t string")
    out = df.select(textstats.token_count_bpeish(F.col("t")).alias("n")).collect()[0].n
    # hello | , | world | 42 | !
    assert out == 5


def test_winnow_shared_substring_shares_fingerprint(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB"),
            (2, "CCCC " + shared + " DDDD"),
            (3, "totally unrelated content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    fps = {r.id: set(r.fps) for r in textstats.winnow_fingerprint_frame(df).collect()}
    assert fps[1] & fps[2]          # shared substring → shared fingerprint
    assert not (fps[1] & fps[3])    # unrelated docs → disjoint
    assert all(len(v) > 0 for v in fps.values())


def test_winnow_short_text_falls_back(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    out = textstats.winnow_fingerprint_frame(df, k=8, window=4).collect()[0]
    assert out.fps == []  # shorter than k → no k-grams, empty set


def test_pack_documents_respects_budget(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 250), (5, 10)],
        "doc_id long, n_tokens long",
    )
    bins = {r.doc_id: r.bin_id for r in textstats.pack_documents(df, 300).collect()}
    # cumsum-exclusive: 0,100,200,300,550 → bins 0,0,0,1,1
    assert bins == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    # no bin except an oversized-single exceeds budget before its last doc
    assert bins[4] != bins[3]


def test_pack_documents_oversized_doc_gets_own_progression(spark):
    df = spark.createDataFrame([(1, 1000), (2, 10)], "doc_id long, n_tokens long")
    bins = {r.doc_id: r.bin_id for r in textstats.pack_documents(df, 300).collect()}
    assert bins == {1: 0, 2: 3}  # 1000-token doc pushes cumsum past 3 budgets


def test_pack_documents_partitioned_parallel(spark):
    df = spark.createDataFrame(
        [(1, 300, "a"), (2, 300, "a"), (3, 300, "b"), (4, 300, "b")],
        "doc_id long, n_tokens long, src string",
    )
    out = textstats.pack_documents(df, 300, partition_col="src").collect()
    bins = {r.doc_id: (r.src, r.bin_id) for r in out}
    # packing is per-partition: docs 1,2 split across a's bins; 3,4 across b's
    assert bins[1][1] != bins[2][1] and bins[3][1] != bins[4][1]
    # the (partition, local bin) PAIR is the unique bin key
    assert len(set(bins.values())) == 4


def test_normalize_whitespace_and_controls(spark):
    df = spark.createDataFrame([("  a\t\tb\x00c \n d  ",)], "t string")
    out = df.select(
        textstats.normalize_whitespace(
            textstats.strip_control_chars(F.col("t"))
        ).alias("n")
    ).collect()[0].n
    assert out == "a bc d"


def test_tokens_are_lowercased_whitespace_split(spark):
    df = spark.createDataFrame([("Foo  BAR\tbaz",)], "t string")
    out = df.select(textstats.tokens(F.col("t")).alias("tk")).collect()[0].tk
    assert out == ["foo", "bar", "baz"]


def test_repetition_signals_values(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),        # 4 words, 1 distinct, bigram "spam spam" x3
            (2, "all words here are unique"),  # no repetition
            (3, "go go stop go go stop"),      # top word "go" 4/6; "go go" 2/5
            (4, "solo"),                       # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    from animaltrackingetls_spark.operators.textstats import repetition_signals

    out = {r.id: r for r in repetition_signals(df).collect()}
    r1 = out[1]
    assert (r1.n_words, r1.n_distinct_words) == (4, 1)
    assert r1.dup_word_frac == pytest.approx(0.75)
    assert r1.top_word_frac == pytest.approx(1.0)
    assert r1.top_bigram_frac == pytest.approx(1.0)
    r2 = out[2]
    assert r2.dup_word_frac == 0.0 and r2.top_word_frac == pytest.approx(0.2)
    r3 = out[3]
    assert r3.top_word_frac == pytest.approx(4 / 6)
    assert r3.top_bigram_frac == pytest.approx(2 / 5)
    r4 = out[4]
    assert (r4.n_words, r4.top_bigram_frac) == (1, 0.0)


def test_unigram_lm_scores_exact(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "c")],
        "doc_id long, text string",
    )
    from animaltrackingetls_spark.operators.textstats import unigram_lm_scores

    # corpus counts: a=2, b=1, c=1; N=4, V=3
    out = {r.id: r.lm_logprob for r in unigram_lm_scores(df).collect()}
    lp = lambda c: math.log((c + 1.0) / (4 + 3))
    assert out[1] == pytest.approx((lp(2) + lp(2) + lp(1)) / 3)
    assert out[2] == pytest.approx(lp(1))
    # common-word docs score higher than rare-word docs
    assert out[1] > out[2]


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_documents_windows_and_stride(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        textstats.chunk_documents(df, chunk_tokens=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts 0,3,6,9 — last two chunks are short, never padded
    assert [(r.chunk_id, r.start, r.n_tokens) for r in out] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1),
    ]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[3].chunk_text == "t9"


def test_chunk_documents_every_token_covered(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(i + 1))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.chunk_documents(df, chunk_tokens=8, stride=5).collect()
    covered = {}
    for r in out:
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_tokens <= 8
        for off, t in enumerate(toks):
            covered.setdefault(r.doc_id, set()).add((r.start + off, t))
    for i in range(40):
        expect = {(j, f"w{i}_{j}") for j in range(i + 1)}
        assert covered[i] >= expect  # every token appears at its position


def test_chunk_documents_empty_text_no_rows(spark):
    df = spark.createDataFrame([(1, ""), (2, "a b")], "doc_id long, text string")
    out = textstats.chunk_documents(df, chunk_tokens=4, stride=4).collect()
    assert {r.doc_id for r in out} == {2}


def test_chunk_documents_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        textstats.chunk_documents(df, chunk_tokens=0, stride=1)
    with pytest.raises(ValueError, match="stride"):
        textstats.chunk_documents(df, chunk_tokens=4, stride=0)


def test_tokenizer_class_agrees_with_duckdb_on_exotic_whitespace(spark):
    # Java \S and RE2 \S disagree on U+000B; the explicit WS_CHARS class
    # must tokenize identically in both engines (ADVICE r4 fix).
    import duckdb

    from animaltrackingetls_spark.operators.textstats import tokens

    cases = [
        "a\x0bb",          # vertical tab: the engine-divergent char
        "a\fb",            # form feed
        "a\tb  c\nd\re",   # the ordinary class members
        "\x0b\x0b",        # whitespace-only
        "a b",        # NBSP: NOT whitespace in either engine
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = {r.text: list(r.toks) for r in df.select("text", tokens(F.col("text")).alias("toks")).collect()}

    con = duckdb.connect()
    for c in cases:
        oracle = con.execute(
            "SELECT regexp_extract_all(lower(?), '[^ \t\n\x0b\f\r]+')", [c]
        ).fetchone()[0]
        assert got[c] == oracle, (repr(c), got[c], oracle)


def test_normalize_nfc_composes_decomposed_forms(spark):
    import unicodedata

    from animaltrackingetls_spark.operators.textstats import normalize_nfc

    decomposed = "café résumé"       # e + combining acute
    composed = unicodedata.normalize("NFC", decomposed)  # é precomposed
    assert decomposed != composed
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, None), (4, "ascii only")],
        "id long, text string",
    )
    got = {r.id: r.norm for r in df.select("id", normalize_nfc(F.col("text")).alias("norm")).collect()}
    assert got[1] == got[2] == composed  # both forms hash/dedup identically
    assert got[3] is None
    assert got[4] == "ascii only"

    # cross-engine: DuckDB nfc_normalize applies the same UCD mapping
    import duckdb

    assert duckdb.connect().execute(
        "SELECT nfc_normalize(?)", [decomposed]
    ).fetchone()[0] == composed


def test_dedup_lines_keeps_first_occurrence_order(spark):
    from animaltrackingetls_spark.operators.textstats import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "Home | About\nreal content\nHome | About\nmore text\nreal content"),
            (2, "only line"),
            (3, "a\n\nb\n\na"),
        ],
        "id long, text string",
    )
    got = {r.id: r.out for r in df.select("id", dedup_lines(F.col("text")).alias("out")).collect()}
    assert got[1] == "Home | About\nreal content\nmore text"
    assert got[2] == "only line"
    assert got[3] == "a\n\nb"  # empty lines dedup too; order preserved


# ---------------------------------------------------------------------------
# BPE trainer + apply
# ---------------------------------------------------------------------------


def _ref_bpe_merges(word_counts: dict, num_merges: int, min_pair_count: int = 2):
    """O(merges × vocab) reference trainer (no incremental updates):
    most-frequent pair, ties to lexicographically smallest."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + word_counts[w]
        if not pairs:
            break
        m = max(pairs.values())
        if m < min_pair_count:
            break
        best = min(p for p, c in pairs.items() if c == m)
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_reference_trainer(spark):
    """The incremental driver trainer must produce the identical merge
    sequence as the brute-force reference over the same word counts —
    and those counts must be the corpus's (distributed pass, lowercase
    tokens)."""
    from animaltrackingetls_spark.operators.textstats import (
        _bpe_merges_from_vocab,
        bpe_train,
    )

    rows = [
        (1, "low lower lowest low low"),
        (2, "newer newest new lower Low"),
        (3, "widest wide wider new"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    counts: dict = {}
    for _, text in rows:
        for w in text.lower().split():
            counts[w] = counts.get(w, 0) + 1
    for n in (1, 5, 12, 50):
        assert bpe_train(docs, num_merges=n) == _ref_bpe_merges(counts, n)
    # incremental == reference on a larger random vocab too
    import random

    rng = random.Random(5)
    vocab = {
        "".join(rng.choice("abcd") for _ in range(rng.randint(1, 8))): rng.randint(1, 9)
        for _ in range(200)
    }
    assert _bpe_merges_from_vocab(vocab, 40) == _ref_bpe_merges(vocab, 40)


def test_bpe_apply_reconstructs_and_handles_null(spark):
    """Concatenating a word's subwords must reproduce the word (BPE
    only merges, never rewrites); NULL text → empty array; longest
    learned units actually win (rank-greedy)."""
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.textstats import (
        bpe_train,
        make_bpe_apply_udf,
    )

    docs = spark.createDataFrame(
        [(1, "banana bandana ban banana"), (2, "bandana banana band"), (3, None)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=20)
    udf = make_bpe_apply_udf(merges)
    out = {r.doc_id: r.subs for r in docs.select(
        "doc_id", udf(F.col("text")).alias("subs")).collect()}
    assert out[3] == []
    # reconstruction: subwords joined with no separator == tokens joined
    assert "".join(out[1]) == "bananabandanabanbanana"
    # 'banana' is frequent enough to become a single learned unit
    assert "banana" in out[1]


def test_html_to_text_strips_traps_and_unescapes_once(spark):
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.textstats import html_to_text

    cases = [
        # script/style contents must vanish entirely, not just the tags
        (1, '<p>keep</p><script>var x="<p>leak</p>";</script><style>p{}</style>',
         "keep"),
        # comments (even containing tags) vanish; entities decode ONCE
        (2, '<!-- <b>menu</b> -->A &amp;amp; B &lt;ok&gt; &#39;q&#39;&nbsp;end',
         "A &amp; B <ok> 'q' end"),
        # multi-line elements, case-insensitive tag names
        (3, '<SCRIPT>\nline1\nline2\n</SCRIPT><DIV>text\nacross</DIV>',
         "text across"),
        # plain text untouched beyond whitespace collapse
        (4, "  no   markup\there  ", "no markup here"),
        (5, None, None),
    ]
    df = spark.createDataFrame([(i, h) for i, h, _ in cases], "id long, html string")
    got = {r.id: r.t for r in df.select("id", html_to_text(F.col("html")).alias("t")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i])


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.text(alphabet="abcdef ,.", min_size=0, max_size=40),
                min_size=1, max_size=8))
def test_html_to_text_roundtrips_wrapped_text(spark, texts):
    """Wrapping arbitrary tag-free text in the trap template and
    extracting must return exactly the whitespace-normalized text —
    no template fragment may leak, no content may be lost."""
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.textstats import (
        html_to_text,
        normalize_whitespace,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    wrapped = df.select(
        "id",
        F.concat(
            F.lit('<html><head><style>p{}</style><script>var x="<b>t</b>";'
                  '</script></head><body><!-- <i>c</i> --><p>'),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
        normalize_whitespace(F.col("text")).alias("want"),
    )
    got = wrapped.select("id", html_to_text(F.col("html")).alias("t"), "want").collect()
    for r in got:
        assert r.t == r.want, (r.t, r.want)


def test_pack_documents_with_bpe_token_counts(spark):
    """Packing on BPE subword counts (the actual training-token budget)
    composes directly: count subwords with the learned tokenizer, pass
    the column as token_col — every doc assigned exactly once, bins
    start on the cumulative BPE budget."""
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.textstats import (
        bpe_train,
        make_bpe_apply_udf,
        pack_documents,
    )

    docs = spark.createDataFrame(
        [(i, "low lower lowest new newer banana band " * (1 + i % 3))
         for i in range(12)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=30)
    udf = make_bpe_apply_udf(merges)
    counted = docs.withColumn("n_bpe", F.size(udf(F.col("text"))))
    packed = pack_documents(counted, max_tokens=40, token_col="n_bpe")
    rows = packed.collect()
    assert len(rows) == 12                       # every doc exactly once
    by_bin: dict = {}
    for r in rows:
        by_bin.setdefault(r.bin_id, []).append(r)
    # reconstruct the exclusive cumsum: each bin's first doc starts at a
    # multiple boundary of the 40-subword budget
    ordered = sorted(rows, key=lambda r: r.doc_id)
    cum = 0
    for r in ordered:
        assert r.bin_id == cum // 40
        cum += r.n_bpe


def test_dedup_lines_metacharacter_separator_is_literal(spark):
    from animaltrackingetls_spark.operators.textstats import dedup_lines

    df = spark.createDataFrame([("a|b|a|c",), ("x.y.x",)], "t string")
    got = [
        (r.p, r.d)
        for r in df.select(
            dedup_lines(F.col("t"), "|").alias("p"),
            dedup_lines(F.col("t"), ".").alias("d"),
        ).collect()
    ]
    assert got[0][0] == "a|b|c"     # '|' is literal, not regex alternation
    assert got[1][1] == "x.y"       # '.' is literal, not any-char


def test_pack_bestfit_invariants_and_determinism(spark):
    """Best-fit-decreasing sample packing: no bin exceeds the budget
    (except single-oversize bins, flagged), every doc lands in exactly
    one bin, the assignment is identical under repartitioning, and BFD
    beats naive id-order first-next-fit on a crafted adversarial mix."""
    import random

    from animaltrackingetls_spark.operators.textstats import (
        pack_documents_bestfit,
    )

    rng = random.Random(5)
    rows = [(i, rng.choice([60, 270, 331, 950, 1200])) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_documents_bestfit(df, 1000, group_col=None, num_groups=4)
    got = [(r.group, r.id, r.tokens, r.bin_id, r.oversize) for r in out.collect()]
    assert len(got) == 400 and len({(g, i) for g, i, *_ in got}) == 400
    fills: dict = {}
    for g, _i, t, b, over in got:
        if over:
            assert t > 1000
            continue
        fills[(g, b)] = fills.get((g, b), 0) + t
    assert fills and all(v <= 1000 for v in fills.values())
    # oversize bins hold exactly one doc
    oversize_bins = [(g, b) for g, _i, t, b, over in got if over]
    assert len(oversize_bins) == len(set(oversize_bins))
    assert all((g, b) not in fills for g, b in oversize_bins)
    # determinism across partitionings
    again = {
        (r.group, r.id): (r.bin_id, r.oversize)
        for r in pack_documents_bestfit(
            df.repartition(13), 1000, group_col=None, num_groups=4
        ).collect()
    }
    assert again == {(g, i): (b, o) for g, i, _t, b, o in got}

    # crafted: sizes 600,500,500,400 with budget 1000 — BFD packs 2 bins
    # (600+400, 500+500); id-order next-fit would need 3
    one = spark.createDataFrame(
        [(1, 600), (2, 500), (3, 500), (4, 400)], "doc_id long, n_tokens long"
    ).withColumn("src", F.lit("s"))
    packed = pack_documents_bestfit(one, 1000, group_col="src")
    by_bin: dict = {}
    for r in packed.collect():
        by_bin.setdefault(r.bin_id, []).append(r.tokens)
    assert len(by_bin) == 2
    assert sorted(sorted(v) for v in by_bin.values()) == [[400, 600], [500, 500]]


def test_pack_bestfit_natural_group_and_guards(spark):
    import pytest

    from animaltrackingetls_spark.operators.textstats import (
        pack_documents_bestfit,
    )

    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 995, "a")],
        "doc_id long, n_tokens long, src string",
    )
    out = {
        (r.group, r.id): r.bin_id
        for r in pack_documents_bestfit(df, 1000, group_col="src").collect()
    }
    # groups pack independently: doc 2 in its own group's bin 0
    assert out[("b", 2)] == 0
    # 995 packs first (bin 0, remaining 5); 10 does not fit -> bin 1
    assert out[("a", 3)] == 0 and out[("a", 1)] == 1
    with pytest.raises(ValueError, match="max_tokens"):
        pack_documents_bestfit(df, 0, group_col="src")


def test_pack_bestfit_matches_reference_bfd_on_random_inputs(spark):
    """Exact bin-assignment parity with an independent Python BFD
    (same order and tie rules) over seeded random groups, sizes up to
    1.4x budget (exercising oversize), through a repartitioned input."""
    import bisect
    import random

    from animaltrackingetls_spark.operators.textstats import (
        pack_documents_bestfit,
    )

    def ref_bfd(items, budget):
        items = sorted(items, key=lambda t: (-t[1], t[0]))
        open_bins, out, nxt = [], {}, 0
        for i, s in items:
            if s > budget:
                out[i] = (nxt, True)
                nxt += 1
                continue
            j = bisect.bisect_left(open_bins, (s, -1))
            if j < len(open_bins):
                rem, b = open_bins.pop(j)
                if rem - s > 0:
                    bisect.insort(open_bins, (rem - s, b))
                out[i] = (b, False)
            else:
                if budget - s > 0:
                    bisect.insort(open_bins, (budget - s, nxt))
                out[i] = (nxt, False)
                nxt += 1
        return out

    rng = random.Random(41)
    for _ in range(5):
        budget = rng.choice([7, 100, 1000])
        rows, expected = [], {}
        for g in range(rng.randint(1, 3)):
            items = [
                (g * 10000 + i, rng.randint(1, int(budget * 1.4)))
                for i in range(rng.randint(0, 120))
            ]
            rows += [(f"g{g}", i, s) for i, s in items]
            for i, bo in ref_bfd(items, budget).items():
                expected[(f"g{g}", i)] = bo
        if not rows:
            continue
        df = spark.createDataFrame(rows, "src string, doc_id long, n_tokens long")
        got = {
            (r.group, r.id): (r.bin_id, r.oversize)
            for r in pack_documents_bestfit(
                df.repartition(7), budget, group_col="src"
            ).collect()
        }
        assert got == expected


def test_normalize_for_matching(spark):
    """NFKC + casefold: the tokenizer-prep form — compatibility
    variants and case fold to ONE matching key; NFC alone must NOT
    fold them (the two functions serve different stages)."""
    import pytest as _pytest

    from animaltrackingetls_spark.operators.textstats import (
        normalize_for_matching,
        normalize_nfc,
    )

    rows = [
        (0, "ﬁle"),          # ﬁle -> file (ligature, NFKC-only)
        (1, "ＡBC"),          # Ａ (full-width) -> abc after casefold
        (2, "straße"),       # ß -> ss under casefold
        (3, "café"),        # decomposed é -> composed, casefolded
        (4, None),
        (5, "x²"),           # superscript ² -> x2
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r.i: r.m
        for r in df.select(
            "i", normalize_for_matching(F.col("t")).alias("m")
        ).collect()
    }
    assert got == {
        0: "file", 1: "abc", 2: "strasse", 3: "café", 4: None, 5: "x2",
    }
    # NFC preserves compatibility variants (ligature survives) but
    # composes the accent — the canonical-vs-compat split
    nfc = {
        r.i: r.m
        for r in df.select("i", normalize_nfc(F.col("t")).alias("m")).collect()
    }
    assert nfc[0] == "ﬁle" and nfc[3] == "café"
    # matching keys now collide where they should: composed == decomposed
    both = spark.createDataFrame(
        [(0, "café"), (1, "café")], "i long, t string"
    ).select(normalize_for_matching(F.col("t")).alias("m"))
    assert both.distinct().count() == 1
    with _pytest.raises(ValueError, match="NFC\\|NFD"):
        normalize_for_matching(F.col("t"), form="bogus")

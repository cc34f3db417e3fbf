"""Text-analysis operators for a training-data pipeline over `documents`.

All hot-path expressions are JVM-side (`pyspark.sql.functions`) so they
stay inside whole-stage codegen — at 100 TB these run per-document on the
scan, and a Python UDF here would dominate the job. Tokenization is a
regexp over non-whitespace runs (``\\S+``) so the count is
whitespace-shape-insensitive and reproducible in ANSI SQL engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .joins import attach_scalar

# Marker stopwords for the n-gram-free language-ID heuristic. Scores are
# token-set intersections — deterministic and expressible in plain SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los", "una"],
    "fr": ["le", "la", "de", "et", "les", "des", "une"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]


# Regex engines disagree on \s: Java (Spark) counts U+000B vertical tab
# as whitespace while RE2 (DuckDB) does not, so '\S+' tokenizes 'a\x0Bb'
# differently across engines. Every whitespace-driven pattern therefore
# uses this EXPLICIT character class, on which both engines agree (the
# class is Java's \s set; oracle SQL mirrors it via entry._portable_ws).
WS_CHARS = r" \t\n\x0B\f\r"
TOKEN_PATTERN = rf"[^{WS_CHARS}]+"
WS_RUN_PATTERN = rf"[{WS_CHARS}]+"


def tokens(c: Column) -> Column:
    """Lower-cased non-whitespace tokens."""
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), F.lit(0))


def token_count(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), F.lit(0)))


def char_count(c: Column) -> Column:
    return F.length(c)


def alpha_ratio(c: Column) -> Column:
    """Fraction of characters that are ASCII letters or space — a cheap
    quality signal (binary/garbled text scores low)."""
    clean = F.length(F.regexp_replace(c, r"[^A-Za-z ]", ""))
    return clean.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_ratio(c: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are common stopwords — natural prose sits
    around 0.2-0.5; keyword spam and boilerplate sit near 0."""
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(c)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the quality-scoring feature columns."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c).cast("long"),
            "n_chars_m": char_count(c).cast("long"),
            "alpha_ratio": alpha_ratio(c),
            "stopword_ratio": stopword_ratio(c),
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language ID (deterministic heuristic).

    Scores each language by |tokens ∩ markers|; CJK codepoints short-cut
    to ``zh``. Ties resolve in fixed language order (en, es, fr, de).
    """
    toks = tokens(F.col(text_col))
    scores = {
        lang: F.size(F.array_intersect(F.array_distinct(toks),
                                       F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    best = F.greatest(*scores.values())
    # best == 0 (no marker hit at all) must resolve to 'und' BEFORE the
    # per-language equality chain — otherwise scores['en'] == 0 == best
    # matches first and zero-signal text is mislabeled 'en'.
    pred = F.when(has_cjk, F.lit("zh")).when(best == 0, F.lit("und"))
    for lang in ("en", "es", "fr", "de"):  # fixed tie order
        pred = pred.when(scores[lang] == best, F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    out = df.withColumn("predicted_lang", pred)
    return out


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 (portable) + xxhash64 (fast 64-bit)."""
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("md5_fp"),
        F.xxhash64(F.col(text_col)).alias("xx64_fp"),
    )


def normalize_whitespace(c: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim — pure codegen
    (the cheap 90% of text normalization; NFC is the Python-side 10%)."""
    return F.trim(F.regexp_replace(c, WS_RUN_PATTERN, " "))


def html_to_text(c: Column) -> Column:
    """HTML → visible text, entirely JVM-side — the web-corpus
    extraction stage (trafilatura-lite): script and style elements go
    WITH their contents (a bare tag-stripper leaks JavaScript and CSS
    into the training text — the classic web-corpus contamination bug),
    then comments, then remaining tags; the five XML entities plus
    ``&nbsp;`` unescape ONCE (``&amp;`` last, so double-escaped text
    stays single-escaped rather than over-decoding); whitespace
    collapses via the explicit cross-engine class. Every regex here is
    supported identically by Java regex and RE2 (non-greedy spans,
    (?is) flags), so the whole extraction replays in the SQL oracle.
    """
    x = F.regexp_replace(c, r"(?is)<script\b.*?</script>", " ")
    x = F.regexp_replace(x, r"(?is)<style\b.*?</style>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return normalize_whitespace(x)


def strip_control_chars(c: Column) -> Column:
    """Remove C0/C1 control characters (keep \\t\\n via the whitespace
    collapse running first if composed)."""
    return F.regexp_replace(c, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]", "")


def normalize_nfc(c: Column) -> Column:
    """Unicode NFC normalization — the Python-side 10% of text
    normalization (`normalize_whitespace` is the codegen 90%): composed
    and decomposed forms of the same text ("é" as U+00E9 vs e+U+0301)
    must hash/dedup identically, or visually-equal near-dups survive
    every digest-keyed stage.

    Spark has no builtin NFC (it would need an ICU JVM UDF), so this is
    a documented Arrow-batched exception to the JVM-only rule: one
    `unicodedata.normalize` pass per batch, NULL-safe. Cross-engine
    checkable — DuckDB's `nfc_normalize` applies the identical UCD
    mapping (verified byte-equal through the oracle gate)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _nfc(s):  # pd.Series -> pd.Series
        # pandas' vectorized .str.normalize is unicodedata.normalize
        # under the hood (identical UCD mapping), NULL-propagating
        return s.str.normalize("NFC")

    return _nfc(c)


def normalize_for_matching(
    c: Column, form: str = "NFKC", casefold: bool = True
) -> Column:
    """Tokenizer-prep / matching normalization: Unicode COMPATIBILITY
    normalization plus full casefolding — the standard text-pipeline
    step before dedup keys, BPE training, or contamination n-grams.

    NFKC goes beyond :func:`normalize_nfc`'s canonical form: ligatures
    (ﬁ→fi), full-width forms (Ａ→A), superscripts (²→2) and other
    compatibility variants fold to one representation, so visually-
    interchangeable spellings stop defeating digest-keyed dedup.
    ``casefold=True`` applies Unicode case FOLDING (stronger than
    lower(): ß→ss, ﬅ→st), the correct case-insensitive matching form.

    Arrow-batched like normalize_nfc (vectorized pandas
    .str.normalize/.str.casefold, NULL-propagating) — the documented
    Python exception; everything downstream of it stays codegen. Keep
    the ORIGINAL text column alongside for display — this form is for
    KEYS, not for humans."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(
            f"form must be NFC|NFD|NFKC|NFKD, got {form!r}"
        )
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _norm(s):  # pd.Series -> pd.Series
        out = s.str.normalize(form)
        if casefold:
            out = out.str.casefold()
        return out

    return _norm(c)


def pack_documents(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    order_col: str | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Sequence packing: assign documents to token-budget bins.

    Deterministic offset packing in ``order_col`` order (defaults to the
    id): running token total via a window cumsum, bin = floor of the
    *exclusive* cumsum / budget. A document belongs to the bin where its
    token range STARTS — so a boundary-straddling document overflows its
    bin by its tail (the standard pretokenized-shard semantics, where
    the consumer splits or truncates at the boundary); a bin never
    starts mid-document.

    Scale: the default global window funnels all rows through ONE
    partition — fine to ~10^7 rows, a bottleneck beyond. Pass
    ``partition_col`` (a coarse natural key like source/shard) to pack
    each partition independently in parallel; ``bin_id`` is then the
    LOCAL bin and the unique bin key is the (partition_col, bin_id)
    PAIR — both are output columns (a hashed combination would risk
    silent birthday collisions at billions of bins). Cost: bins never
    span partitions, so tail bins (one per partition) may run
    under-budget.
    """
    order = order_col or id_col
    # id tiebreak: a non-unique order_col would make the cumsum — and
    # every bin assignment — nondeterministic across runs/partitionings
    order_by = [F.asc(order)] + ([F.asc(id_col)] if order != id_col else [])
    if partition_col is None:
        w = Window.orderBy(*order_by)
    else:
        w = Window.partitionBy(partition_col).orderBy(*order_by)
    cum_excl = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    local_bin = F.floor(cum_excl / max_tokens).cast("long")
    out_cols = [F.col(id_col), F.col(token_col), local_bin.alias("bin_id")]
    if partition_col is not None:
        out_cols.insert(2, F.col(partition_col))
    return df.select(*out_cols)


def pack_documents_bestfit(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    group_col: str | None = None,
    num_groups: int = 64,
) -> DataFrame:
    """Sample-level packing WITHOUT splitting: best-fit-decreasing bin
    packing — the SFT/sample-packing sibling of :func:`pack_documents`
    (which streams token ranges into bins and lets a boundary document
    straddle). Here a document lands wholly in one bin, bins never
    exceed ``max_tokens`` (an oversize document gets a bin of its own,
    flagged), and BFD's waste is within 11/9·OPT+1 bins per group.

    Deterministic: documents sort (tokens desc, id asc); each goes to
    the open bin with the SMALLEST sufficient remaining capacity, ties
    to the lowest bin id; bins are numbered in creation order. The same
    inputs pack identically on any partitioning or cluster size.

    Scale shape: packing is sequential per bin-set by nature, so it
    runs per GROUP via ``applyInPandas`` — pass a natural coarse key
    (``group_col``: source, shard, language) or let the default salt
    by ``md5(id) % num_groups`` (partitioning-independent). Each group
    packs locally in one Arrow batch; the unique bin key is the
    (group, bin_id) PAIR. Tail waste: ≤ one under-full bin per group.

    Output: (group, id, tokens, bin_id, oversize). Rows-only in the
    oracle gate (sequential bin state is not ANSI-SQL-replayable);
    the invariants — no bin over budget, determinism, waste bound —
    are pinned by tests.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if group_col is None and not (1 <= num_groups <= 1_000_000):
        raise ValueError(f"num_groups out of range: {num_groups}")
    _forbidden = {"group", "bin_id", "oversize"}
    clash = [c for c in (id_col, token_col) if c.lower() in _forbidden]
    if clash:
        raise ValueError(f"rename columns {clash}: reserved output names")

    if group_col is None:
        grp = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
            .cast("long")
            % num_groups
        ).cast("string")
    else:
        grp = F.col(group_col).cast("string")
    base = df.select(
        grp.alias("group"),
        F.col(id_col).alias("id"),
        F.col(token_col).cast("long").alias("tokens"),
    )

    schema = (
        "group string, id long, tokens long, bin_id long, oversize boolean"
    )

    def pack(pdf):
        import bisect

        import pandas as pd

        pdf = pdf.sort_values(
            ["tokens", "id"], ascending=[False, True], kind="mergesort"
        )
        # open bins sorted by (remaining, bin_id) for true best-fit
        open_bins: list[tuple[int, int]] = []
        bins, flags = [], []
        next_bin = 0
        for tok in pdf.itertuples(index=False):
            size = int(tok.tokens)
            if size > max_tokens:
                bins.append(next_bin)
                flags.append(True)
                next_bin += 1  # oversize: own (closed) bin
                continue
            i = bisect.bisect_left(open_bins, (size, -1))
            if i < len(open_bins):
                rem, b = open_bins.pop(i)
                left = rem - size
                if left > 0:
                    open_bins.insert(
                        bisect.bisect_left(open_bins, (left, b)), (left, b)
                    )
                bins.append(b)
                flags.append(False)
            else:
                bins.append(next_bin)
                flags.append(False)
                rem = max_tokens - size
                if rem > 0:
                    open_bins.insert(
                        bisect.bisect_left(open_bins, (rem, next_bin)),
                        (rem, next_bin),
                    )
                next_bin += 1
        out = pdf.copy()
        out["bin_id"] = pd.Series(bins, index=pdf.index, dtype="int64")
        out["oversize"] = pd.Series(flags, index=pdf.index, dtype="bool")
        return out

    return base.groupBy("group").applyInPandas(pack, schema)


# A no-lookaround approximation of the GPT-2/BPE pre-tokenizer split:
# letter runs, digit runs, punctuation runs (RE2-safe, so the same
# pattern is reusable in SQL engines for oracle parity).
BPEISH_PATTERN = rf"[a-z]+|[0-9]+|[^a-z0-9{WS_CHARS}]+"


def token_count_bpeish(c: Column) -> Column:
    """Subword-ish token count: splits letter/digit/punct runs — a
    deterministic stand-in for a BPE pre-tokenizer's segment count."""
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPEISH_PATTERN), F.lit(0)))


def winnow_fingerprint_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    hash_fn: str = "xx64",
) -> DataFrame:
    """(id, fps: array<long>) — winnowing document fingerprints.

    Classic rolling-hash scheme: hash every character k-gram, slide a
    window of ``window`` consecutive k-gram hashes, keep each window's
    minimum, distinct the kept set. Two documents sharing a substring of
    length ≥ k + window - 1 share at least one fingerprint, so
    containment/plagiarism candidates fall out of a fingerprint join.

    ``hash_fn``: ``'xx64'`` (default — one JVM hash per gram, the fast
    path) or ``'md5'`` (first 15 hex chars → 60-bit int; ~2× the hash
    cost but reproducible in any SQL engine, so the whole winnow is
    oracle-checkable — DuckDB replays it via ('0x'||substr(md5(g),1,15))
    casts). Identical selection structure either way.

    The k-gram hash array is bound through ``explode(array(...))`` so the
    window-min pass references an attribute instead of re-computing the
    hash array per window (no let-binding in Catalyst).
    """
    if hash_fn not in ("xx64", "md5"):
        raise ValueError(f"hash_fn must be 'xx64' or 'md5', got {hash_fn!r}")
    s = F.lower(F.col(text_col))
    n_grams = F.greatest(F.length(s) - (k - 1), F.lit(0))

    def gram_hash(i):
        g = s.substr(i, F.lit(k))
        if hash_fn == "xx64":
            return F.xxhash64(g)
        return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")

    # guard: sequence(1, 0) auto-descends ([1, 0]) instead of being empty
    kh = F.when(
        n_grams >= 1,
        F.transform(F.sequence(F.lit(1), n_grams), gram_hash),
    ).otherwise(F.array().cast("array<long>"))
    bound = df.select(F.col(id_col).alias("id"), F.explode(F.array(kh)).alias("kh"))
    n_windows = F.greatest(F.size(F.col("kh")) - (window - 1), F.lit(0))
    # r15: per-window minimum as least() over direct element_at reads —
    # array_min(slice(...)) allocated a fresh window-sized array PER
    # WINDOW (O(n·window) allocations per doc, pure GC churn); least()
    # over non-null longs is the identical minimum with zero
    # allocation. Elements are never NULL here (md5/xxhash64 of a
    # non-null gram), so least == array_min on every window.
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.least(*[F.element_at(F.col("kh"), j + i) for i in range(window)]),
    )
    fps = F.when(n_windows > 0, F.array_distinct(mins)).otherwise(
        F.array_distinct(F.col("kh"))
    )
    return bound.select("id", fps.alias("fps"))


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family): what
    fraction of a document is the same few words said again and again —
    high values flag boilerplate, keyword spam, and generation loops.

    Per document: ``n_words``, ``n_distinct_words``,
    ``dup_word_frac`` (1 − distinct/total),
    ``top_word_frac`` (most frequent word's share of all words),
    ``top_bigram_frac`` (most frequent word 2-gram's share of all
    2-grams — the Gopher "top n-gram fraction" with n=2).

    Shape: the classic distributed wordcount — explode to (id, term),
    hash-aggregate twice (term level, then doc level). Both shuffles key
    on the doc id and benefit from map-side partial aggregation, so
    shuffled rows are bounded by per-doc distinct-term counts, never raw
    corpus size. The token array is bound through a Generate node
    (``explode(array(...))``) because Catalyst has no let-binding — a
    derived expression referenced by both the word and bigram branches
    would be tokenized twice per row.
    """
    toks = tokens(F.col(text_col))
    bound = df.select(F.col(id_col).alias("id"), F.explode(F.array(toks)).alias("tk"))

    words = bound.select("id", F.explode("tk").alias("w"))
    wc = words.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c"))
    word_stats = wc.groupBy("id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").alias("top_word_n"),
    )

    # Non-distinct bigram list; guarded because sequence(1, 0) in Spark
    # yields a DESCENDING [1, 0], not an empty array.
    big_expr = F.when(
        F.size("tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("tk"), i), F.element_at(F.col("tk"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigs = bound.select("id", F.explode(big_expr).alias("g"))
    gc = bigs.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    big_stats = gc.groupBy("id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram_n")
    )

    ids = df.select(F.col(id_col).alias("id"))
    out = ids.join(word_stats, "id", "left").join(big_stats, "id", "left")
    n_words = F.coalesce(F.col("n_words"), F.lit(0)).cast("long")
    n_distinct = F.coalesce(F.col("n_distinct_words"), F.lit(0)).cast("long")
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    safe_bigrams = F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)).cast(
        "double"
    )
    return out.select(
        "id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        (F.lit(1.0) - n_distinct.cast("double") / safe_words).alias("dup_word_frac"),
        (F.coalesce(F.col("top_word_n"), F.lit(0)).cast("double") / safe_words).alias(
            "top_word_frac"
        ),
        (
            F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("double") / safe_bigrams
        ).alias("top_bigram_frac"),
    )


def unigram_lm_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean token log-probability under a corpus-self-trained
    unigram LM with add-one smoothing — the cheap, fully-declarative
    stand-in for the perplexity quality filter (the CCNet-style stage) a
    pretraining pipeline runs: documents whose tokens are improbable
    under the corpus distribution score low and get dropped.

    Two passes, both shuffle-light: a wordcount aggregate builds the
    vocabulary (the only global state — MBs even at corpus scale, so it
    is broadcast), then each token probes the broadcast map and a
    per-doc mean reduces on the id. Swap the self-trained vocab for a
    reference-corpus count table and the same plan scores against an
    external LM.

    The mean is a floating reduction whose order differs between
    engines; consumers thresholding the score must round first
    (log values are not decimal-exact, so rounding ties are measure-
    zero — unlike money sums, where coarse rounding hits real
    half-points).
    """
    words = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(
        F.sum("c").cast("double").alias("n"), F.count(F.lit(1)).cast("double").alias("v")
    )
    return (
        attach_scalar(words.join(F.broadcast(vocab), "w"), tot)
        .groupBy("id")
        .agg(
            F.avg(F.log((F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v")))).alias(
                "lm_logprob"
            )
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window token chunking — the context-window splitter that
    feeds tokenized documents into fixed-length training sequences
    (stride < chunk_tokens gives the standard overlapping windows so no
    span is ever cut without a covering chunk).

    Chunk starts are ``0, stride, 2*stride, ...`` while start < n_tokens;
    each chunk takes up to ``chunk_tokens`` tokens from its start (the
    final chunks are short, not padded — padding is the trainer's job).
    Output: ``(id, chunk_id, start, n_tokens, chunk_text)``, one row per
    chunk; empty-text documents produce no chunks.

    Scale shape: pure map-side — a Generate (posexplode of the start
    sequence) over the scan, token slicing per emitted row, NO shuffle
    anywhere. The expansion factor is ~n_tokens/stride rows per document,
    each bounded by chunk_tokens tokens.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    # Case-preserving token extraction (same family as tokens()): no
    # empty tokens for whitespace-only text; the explicit class makes
    # cross-engine agreement with the oracle exact (see WS_CHARS).
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), F.lit(0))
    starts = F.when(
        F.size(F.col("_toks")) > 0,
        F.sequence(
            F.lit(0), F.size(F.col("_toks")) - 1, F.lit(stride)
        ),
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice(F.col("_toks"), F.col("start") + 1, chunk_tokens)
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .select("id", "_toks", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            F.col("id").alias(id_col),
            "chunk_id",
            "start",
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def dedup_lines(c: Column, sep: str = "\n") -> Column:
    """Remove repeated lines WITHIN a document, keeping first occurrence
    order — the boilerplate-collapse step (nav menus, repeated footers)
    that runs before corpus-level dedup. Pure codegen: split →
    array_distinct (order-preserving, first wins) → rejoin. Whitespace
    inside lines is untouched; empty lines dedup like any other line.

    ``sep`` is treated as a LITERAL on both sides: ``F.split`` takes a
    Java regex, so the separator is \\Q…\\E-quoted — without that, a
    separator like ``'|'`` or ``'.'`` splits between every character
    while the rejoin inserts it literally, destroying the text."""
    return F.array_join(
        F.array_distinct(F.split(c, "\\Q" + sep + "\\E")), sep
    )


# ---------------------------------------------------------------------------
# BPE tokenizer: distributed word-count pass + driver-side merge learning
# + Arrow-batched apply
# ---------------------------------------------------------------------------


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_vocab_rows: int = 100_000,
    min_word_count: int = 1,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn byte-pair-encoding merges from a corpus — the standard
    trainer decomposition (Sennrich et al. 2016; GPT-2's trainer has
    the same shape): ONE distributed pass aggregates the word-frequency
    table, and the merge loop runs driver-side over that table with
    incremental pair-count maintenance. The corpus text is never
    collected — only (word, count) rows, deterministically capped at
    ``max_vocab_rows`` (by count desc, then word: regeneration-stable),
    which is how real tokenizer trainers bound memory too (a frequency
    table, not the corpus, is the training input).

    Words are :func:`tokens` units (lowercased, whitespace-split — the
    same pre-tokenizer the apply side uses); symbols start as single
    characters, no end-of-word marker. Merges are deterministic: the
    most frequent pair wins, count ties break to the lexicographically
    smallest pair. Stops early when no pair reaches ``min_pair_count``.

    Returns the ordered merge list (rank = list position) for
    :func:`make_bpe_apply_udf`.
    """
    wc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_word_count)
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_vocab_rows)
    )
    vocab = {r["w"]: int(r["n"]) for r in wc.collect()}
    return _bpe_merges_from_vocab(vocab, num_merges, min_pair_count)


def _bpe_merges_from_vocab(
    vocab: dict, num_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Driver-side BPE merge loop over a (word → count) table with
    incremental pair-count updates: each merge touches only the words
    that contain the merged pair (classic trainer optimization — a full
    vocab re-scan per merge would be O(merges × vocab))."""
    from collections import Counter, defaultdict

    words = {w: list(w) for w in vocab}
    pair_counts: Counter = Counter()
    where: dict = defaultdict(set)
    for w, syms in words.items():
        n = vocab[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += n
            where[p].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        m = max(pair_counts.values())
        if m < min_pair_count:
            break
        best = min(p for p, c in pair_counts.items() if c == m)
        merges.append(best)
        a, b = best
        for w in list(where.get(best, ())):
            syms = words[w]
            n = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
            out: list = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += n
                where[p].add(w)
        where.pop(best, None)
    return merges


def bpe_encode_word(word: str, rank: dict, cache: dict | None = None) -> list[str]:
    """Apply learned merges to one word, lowest-rank-first (the standard
    greedy BPE segmenter). Pure Python so the Spark UDF and tests share
    one body; ``cache`` memoizes per distinct word."""
    if cache is not None and word in cache:
        return cache[word]
    syms = list(word)
    while len(syms) > 1:
        best_r, best_pair = None, None
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            r = rank.get(p)
            if r is not None and (best_r is None or r < best_r):
                best_r, best_pair = r, p
        if best_r is None:
            break
        a, b = best_pair
        out: list = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    if cache is not None:
        cache[word] = syms
    return syms


def make_bpe_apply_udf(merges: list):
    """Arrow-batched BPE segmentation: text → array<string> of subwords.

    Pre-tokenizes with the SAME pattern the trainer's word-count pass
    used (``TOKEN_PATTERN``, lowercased — Python `re` and Java regex
    agree on the explicit class), then applies merges rank-greedily per
    word with a per-batch memo of distinct words (Zipf: a batch's
    distinct-word count is far below its token count). NULL text → [].
    The merges list is captured in the UDF closure and ships to
    executors once per task via the normal broadcast of the serialized
    function — at 100 TB the list is a few hundred KB, not a join.
    """
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    rank = {tuple(p): i for i, p in enumerate(merges)}
    pat = _re.compile(TOKEN_PATTERN)

    @pandas_udf(ArrayType(StringType()))
    def apply(texts):  # pd.Series -> pd.Series (hints omitted: __future__
        # annotations stringifies them, breaking pandas_udf inference)
        cache: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            subs: list = []
            for w in pat.findall(t.lower()):
                subs.extend(bpe_encode_word(w, rank, cache))
            out.append(subs)
        return pd.Series(out)

    return apply

"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-deterministic only for a fixed partitioning —
repartition the input and the sample changes, which is unacceptable for
reproducible dataset builds. These operators decide membership from a
content hash of the row's id: the same row is in or out regardless of
partitioning, cluster size, or engine (md5 is universal, so the exact
sample is reproducible in any SQL engine for auditing).

Mechanism: the first 4 hex chars of md5(id) are a uniform draw over
65536 buckets; a rate maps to a hex threshold and membership is a
string comparison — pure codegen, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 65536


def _reject_reserved_columns(df: DataFrame, reserved: tuple[str, ...]) -> None:
    """Working/output column names must not collide with input columns —
    withColumn would silently REPLACE the caller's data. Spark resolves
    names case-insensitively by default (spark.sql.caseSensitive=false),
    so the comparison is casefolded: an input column 'Epoch' would be
    clobbered by withColumn('epoch', ...) just the same."""
    reserved_cf = {r.lower() for r in reserved}
    clash = [c for c in df.columns if c.lower() in reserved_cf]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with reserved working/output "
            f"column names {list(reserved)}; rename them first"
        )


def _threshold_hex(rate: float) -> str | None:
    """4-hex-digit exclusive upper bound, or None for keep-everything.

    rate≈1.0 rounds to 65536 → '10000', a 5-char string that compares
    lexicographically BELOW 'ffff' and would silently keep ~6% — so full
    rates return None and callers skip the filter entirely.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sample rate must be in [0, 1], got {rate}")
    bucket = int(round(rate * _BUCKETS))
    if bucket >= _BUCKETS:
        return None
    return format(bucket, "04x")


def sample_hash_bucket(c: Column) -> Column:
    """The row's 4-hex-digit md5 bucket (uniform over 65536)."""
    return F.substring(F.md5(c.cast("string")), 1, 4)


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ≈``rate`` of rows, membership decided by md5(id) bucket —
    partitioning-independent and reproducible across engines."""
    thr = _threshold_hex(rate)
    if thr is None:
        return df
    return df.filter(sample_hash_bucket(F.col(id_col)) < thr)


def mixture_resample(
    df: DataFrame, id_col: str, group_col: str, rates: dict[str, float]
) -> DataFrame:
    """Domain-mixture resampling: per-group rates that may EXCEED 1.

    Training mixes are specified as per-source weights ("2.3 epochs of
    src0, 0.4 of src1"); a rate r decomposes into ``floor(r)`` full
    replications plus a fractional epoch decided by the row's md5
    bucket — the same partitioning-independent draw as
    :func:`deterministic_sample`, so the exact resampled set is
    reproducible in any engine. Groups absent from ``rates`` are
    dropped (they're not in the mix).

    Output adds an ``epoch`` column (1-based) distinguishing the
    replicas — downstream shuffles/packing treat each replica as a row.

    Scale shape: replication is ``explode(sequence(...))`` on the scan
    (a Generate — map-only, no shuffle); membership is a string compare
    on a hash prefix. The output is ~sum(r_g·|g|) rows; nothing is
    materialized driver-side. NOTE ``F.sequence(1, 0)`` silently
    DESCENDS instead of returning empty, so the zero-copy case is
    guarded with an explicit empty array.
    """
    _reject_reserved_columns(df, ("_n_copies", "epoch"))
    bucket = sample_hash_bucket(F.col(id_col))
    n_copies: Column = F.lit(None).cast("int")
    for group, rate in rates.items():
        if rate < 0:
            raise ValueError(f"mixture rate must be >= 0, got {rate} for {group!r}")
        whole = int(rate)
        frac_thr = _threshold_hex(rate - whole)
        copies = F.lit(whole)
        if frac_thr is None:
            # the fractional epoch rounded UP to the whole bucket space
            # (rate like 2.9999999): that is one more FULL copy for every
            # row, not zero — dropping it would silently under-sample the
            # group by a whole epoch
            copies = copies + F.lit(1)
        elif frac_thr != "0000":
            copies = copies + F.when(bucket < frac_thr, 1).otherwise(0)
        n_copies = F.when(F.col(group_col) == group, copies).otherwise(n_copies)
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") >= 1)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(1), F.col("_n_copies"))),
        )
        .drop("_n_copies")
    )


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` semantics, but
    reproducible): each stratum keeps its own rate; strata absent from
    ``rates`` are dropped (matching ``sampleBy``)."""
    bucket = sample_hash_bucket(F.col(id_col))
    pred = F.lit(False)
    for stratum, rate in rates.items():
        thr = _threshold_hex(rate)
        stratum_pred = F.col(strata_col) == stratum
        if thr is not None:
            stratum_pred = stratum_pred & (bucket < thr)
        pred = pred | stratum_pred
    return df.filter(pred)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    order_cols: list[Column] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Per-key quota: keep at most ``n`` rows per ``key_col`` value,
    preferring rows by ``order_cols`` (ties MUST be broken — pass
    ``id_col`` or make the last order column unique, or the kept set is
    nondeterministic under re-partitioning).

    The pretraining use case is the per-domain cap ("at most N pages per
    host"), a standard counterweight to boilerplate-heavy domains.

    Scale shape: one shuffle on the key, then a partitioned row_number —
    no global window. Hot keys are naturally bounded by the cap on the
    OUTPUT side but still sort their full input partition. For
    pathologically hot keys (a domain with 10^9 pages) and a RANDOM
    preference order, use :func:`cap_per_key_random` — its hash-threshold
    prefilter bounds every window to a constant factor of ``n`` while
    staying provably exact. (A prefilter cannot help an ARBITRARY
    preference order like "longest first": the top-n by an arbitrary key
    can live anywhere in the distribution, so this form keeps the full
    window.)
    """
    if n < 1:
        raise ValueError(f"cap must be >= 1, got {n}")
    order = list(order_cols) if order_cols else []
    if id_col is not None:
        order.append(F.col(id_col).asc())
    if not order:
        raise ValueError("cap_per_key needs order_cols and/or id_col")
    _reject_reserved_columns(df, ("_rank_in_key",))
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("_rank_in_key", F.row_number().over(w))
        .filter(F.col("_rank_in_key") <= n)
        .drop("_rank_in_key")
    )


# auto switch point for cap_per_key_random. NOT a local wall-clock
# crossover: the round-8 curve (SCALING.md capcurve) shows the plain
# top-n window beating the prefilter's extra corpus scans through a
# 100M-row hot key on local[32] with 128 GB — a top-5 sort is cheap
# when it fits. The threshold encodes the ROBUSTNESS bound instead:
# past ~30M rows a single window task's sort buffer is spill/straggler
# territory on real executors (not a 128 GB dev box), and the
# prefilter's bounded ~oversample·n per-task working set is what
# survives a 10^9-row key. Callers optimizing pure local wall-clock
# with generous memory can raise it.
_CAP_SKEW_THRESHOLD = 30_000_000
# token budgeting funnels the hot group's EVERY row through one
# sort+running-sum task, so its crossover sits far lower — measured
# (SCALING.md round-8 tokcurve row): window wins at a 300k-row hot
# key, the forms tie around 1M, prefilter wins 1.7x at 3M and 1.6x
# at 30M
_TOK_SKEW_THRESHOLD = 1_000_000
# auto switch point for broadcast_counts=None: broadcast the per-key
# counts join-back while the counts table is SHIPPABLE, fall back to
# the shuffle join (AQE) past it. A transfer-size robustness bound,
# not a wall-clock crossover: locally the shuffle join already wins
# from ~100k UNIFORM keys (SCALING.md round-9 widecap: -12% at 100k,
# -37% at 1M, -31% at 10M), but wrongly shuffling a SKEWED key costs
# 4-10x (round-8 capcurve: 300M hot key 109.8 s vs 27.6 s) while
# wrongly broadcasting a uniform counts table costs ~1.4x — so auto
# keeps the skew insurance until the counts relation itself becomes
# cluster-hostile (5M keys ≈ 200-400 MB serialized, per executor).
_COUNTS_BROADCAST_MAX_KEYS = 5_000_000


def _counts_join_back(
    df: DataFrame, counts: DataFrame, key_col: str, broadcast: bool
) -> DataFrame:
    """The prefilter samplers' counts join-back. ``broadcast=True``
    pins the <=1-row-per-key aggregate map-side — without the hint the
    planner sizes the aggregate like its INPUT and plans sort-merge on
    the (skewed) key, the exact single-task funnel the prefilter form
    exists to avoid (round-8: 300M-row hot key 109.8 s -> 27.6 s).
    ``broadcast=False`` is the corpus-cardinality escape hatch: a
    shuffle join AQE can split, for when the counts relation itself is
    too big to ship (round-9 widecap curve, SCALING.md). One seam so
    both samplers share the rule and tests can observe the decision."""
    return df.join(F.broadcast(counts) if broadcast else counts, key_col)


def cap_per_key_random(
    df: DataFrame,
    key_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
    oversample: float = 4.0,
    mode: str = "auto",
    skew_threshold: int = _CAP_SKEW_THRESHOLD,
    broadcast_counts: bool | None = None,
) -> DataFrame:
    """Skew-safe EXACT per-key random cap: keep the ``n`` rows with the
    smallest ``md5(seed:id)`` per key — the deterministic "at most N
    random pages per domain" quota of a web-corpus build, built so a
    pathologically hot key (one domain holding 10^9 of the corpus's
    rows) never funnels through a single window task.

    Two-phase plan:

    1. **Hash-threshold prefilter.** Per-key counts (one partial-agg'd
       shuffle) join back on the key; a row survives when its priority
       hash falls below ``tau = min(1, oversample*n / count)`` — each
       key keeps ~``oversample*n`` rows regardless of its size, all in
       the same exchange the window needs anyway.
    2. **Exactness check + bounded window.** The kept set must be the n
       SMALLEST hashes per key, and it provably is whenever a key's
       survivor count reaches ``min(n, count)``: survivors are exactly
       every row below the threshold, so if ≥ n of them exist, the n
       smallest hashes are all among them. Keys whose survivor count
       falls short (P ≈ exp(-n·(oversample−1)²/(2·oversample)) per key,
       ~e⁻ⁿ at the default oversample — and ONLY possible while
       tau < 1, i.e. count > oversample·n) fall back to a full window
       for those keys alone; every other key's window sorts a
       constant-sized survivor set.

    The kept SET is identical to ``cap_per_key(df, key, n,
    [md5-priority], id_col)`` — pinned by test — and reproducible on
    any partitioning or engine (the priority is a content hash, so a
    SQL oracle can replay the exact selection).

    Cost vs the plain window: one extra counts aggregation and one
    survivor-count aggregation, all on the SAME key partitioning; what
    it buys is per-window work bounded by ``oversample·n`` instead of
    the hottest key's row count. Use the plain :func:`cap_per_key` when
    keys are known to be roughly balanced or the preference order is
    not random.

    ``mode`` picks the physical form — the kept SET is identical in
    all three (pinned both sides of the threshold by test):

    * ``"auto"`` (default) — measure the hottest key from the per-key
      counts the prefilter needs anyway (one extra 1-row agg job) and
      choose: plain window below ``skew_threshold`` rows, prefilter at
      or above it (the default threshold is a bounded-task robustness
      bound, not a pure wall-clock crossover — see the constant's
      comment and SCALING.md capcurve). Callers needn't know their
      skew.
    * ``"window"`` — the plain md5-priority window, no counts pass at
      all. Cheapest when keys are known balanced.
    * ``"prefilter"`` — always the skew-safe two-phase plan. Right
      when any key can dominate and the extra passes are acceptable
      insurance (or the auto probe's eager count job is unwanted).

    ``broadcast_counts`` picks the physical form of the counts
    join-back (the kept set is identical): ``None`` (default) decides
    from the same auto probe — broadcast while the counts table is
    shippable (≤ ``_COUNTS_BROADCAST_MAX_KEYS`` distinct keys, see the
    constant's comment for the measured asymmetry), shuffle join + AQE
    past it. Outside auto mode ``None`` means broadcast (the skew
    insurance; no probe job is run on your behalf) — corpus-cardinality
    callers on explicit ``mode="prefilter"`` should pass ``False``.
    """
    if n < 1:
        raise ValueError(f"cap must be >= 1, got {n}")
    if oversample <= 1.0:
        raise ValueError(f"oversample must be > 1, got {oversample}")
    if mode not in ("auto", "window", "prefilter"):
        raise ValueError(f"mode must be auto|window|prefilter, got {mode!r}")
    _reject_reserved_columns(df, ("_pri", "_kn", "_sn", "_rank_in_key"))
    pri = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w_plain = Window.partitionBy(key_col).orderBy(F.asc("_pri"), F.asc(id_col))
    if mode != "window":
        # pass 1: per-key counts — partial-agg'd, no priority hash needed
        counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_kn"))
    if mode == "auto":
        hottest, n_keys = counts.agg(
            F.max("_kn"), F.count(F.lit(1))
        ).first()
        mode = "prefilter" if (hottest or 0) >= skew_threshold else "window"
        if broadcast_counts is None:
            broadcast_counts = n_keys <= _COUNTS_BROADCAST_MAX_KEYS
    if broadcast_counts is None:
        broadcast_counts = True
    if mode == "window":
        return (
            df.withColumn("_pri", pri)
            .withColumn("_rank_in_key", F.row_number().over(w_plain))
            .filter(F.col("_rank_in_key") <= n)
            .select(*df.columns)
        )
    # pass 2: the prefilter. counts is one row per key — orders of
    # magnitude smaller than the data — but the planner CANNOT know
    # that (an aggregate's size estimate tracks its input), so without
    # a hint it plans sort-merge: the corpus shuffled AND sorted on the
    # skewed key — the exact single-task funnel this operator exists to
    # avoid (measured: the 100M-row hot key's prefilter went 88 s->9 s
    # when the hint landed, SCALING.md round-8 capcurve). broadcast()
    # keeps the corpus side map-side. With corpus-scale key
    # cardinality (counts itself too big to broadcast) set
    # broadcast_counts=False and let AQE's skew-join splitting handle
    # the shuffle. Priority is a 32-hex string; its leading 15 hex
    # digits (60 bits) compare numerically against tau scaled to the
    # same space.
    joined = _counts_join_back(
        df.withColumn("_pri", pri), counts, key_col, broadcast_counts
    )
    frac = F.conv(F.substring(F.col("_pri"), 1, 15), 16, 10).cast("double") / F.lit(
        float(1 << 60)
    )
    tau = F.least(F.lit(1.0), F.lit(float(oversample * n)) / F.col("_kn"))
    # survivors are ~oversample·n per key by construction — bounded, so
    # pinning them is cheap and every later stage (the exactness audit,
    # the window, the final projection) reads the pinned frame instead
    # of re-scanning and re-hashing the corpus
    survivors = joined.filter(frac < tau).localCheckpoint(eager=True)
    surv_counts = survivors.groupBy(key_col).agg(F.count(F.lit(1)).alias("_sn"))
    # a key is UNSAFE only when its survivors can miss one of the true
    # top-n: fewer survivors than min(n, count). Possible only while
    # tau < 1 and then with per-key probability ~e^-n, so the list is
    # expected EMPTY — collect it (bounded by #keys, in practice zero
    # rows) and skip the corpus-rescanning fallback branch entirely
    # when it is.
    unsafe = (
        counts.join(surv_counts, key_col, "left")
        .filter(
            F.coalesce(F.col("_sn"), F.lit(0)) < F.least(F.lit(n), F.col("_kn"))
        )
        .select(key_col)
    )
    unsafe_rows = unsafe.limit(1001).collect()
    w = Window.partitionBy(key_col).orderBy(F.asc("_pri"), F.asc(id_col))
    safe = survivors
    if unsafe_rows:
        if len(unsafe_rows) > 1000:
            # pathological: fall back to join-form exclusion
            safe = survivors.join(unsafe, key_col, "left_anti")
        else:
            keys = [r[key_col] for r in unsafe_rows]
            safe = survivors.filter(~F.col(key_col).isin(keys))
    safe_kept = (
        safe.withColumn("_rank_in_key", F.row_number().over(w))
        .filter(F.col("_rank_in_key") <= n)
    )
    out = safe_kept
    if unsafe_rows:
        fb = joined.join(unsafe, key_col, "left_semi")
        if len(unsafe_rows) <= 1000:
            keys = [r[key_col] for r in unsafe_rows]
            fb = joined.filter(F.col(key_col).isin(keys))
        fallback_kept = (
            fb.withColumn("_rank_in_key", F.row_number().over(w))
            .filter(F.col("_rank_in_key") <= n)
        )
        out = safe_kept.unionByName(fallback_kept)
    # identical column ORDER on every physical form: the prefilter's
    # counts join moves the key column first, so without this
    # projection mode="auto" would return a data-dependent schema
    # order and break positional consumers (union/insertInto) the day
    # a dataset crosses the skew threshold
    return out.select(*df.columns)


def sharded_shuffle(
    df: DataFrame, id_col: str, num_shards: int = 64, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle for training-data output: every row
    gets a ``(shard, shard_pos)`` address decided purely by
    ``md5(seed:id)`` — the same permutation on any cluster size, any
    partitioning, any engine (md5 is universal; the draw is auditable in
    SQL).

    Training pipelines need this where ``orderBy(rand())`` fails them:
    rand() is partitioning-dependent and unreproducible, and a true
    global sort is one giant range shuffle. Here the order key is
    content-derived, so the "sort" decomposes into independent shards:
    readers stream shards in index order, rows within a shard in
    shard_pos order, and the concatenation is the documented permutation.

    Scale shape: shard assignment is pure codegen on the scan; the only
    shuffle is the partition-by-shard window, and each shard sorts
    locally (~|rows|/num_shards each). Size num_shards so a shard fits
    an executor's sort buffer; the output is naturally written
    ``partitionBy(shard)``.
    """
    if num_shards < 1 or num_shards > 65536:
        raise ValueError(f"num_shards must be in [1, 65536], got {num_shards}")
    _reject_reserved_columns(df, ("_shuffle_key", "shard", "shard_pos"))
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % num_shards
    ).cast("int")
    out = df.withColumn("_shuffle_key", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(
        F.asc("_shuffle_key"), F.asc(F.col(id_col))
    )
    return (
        out.withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("_shuffle_key")
    )


def temperature_rates(
    group_counts: dict[str, int],
    alpha: float = 0.3,
    total_budget: int | None = None,
) -> dict[str, float]:
    """Per-group mixture rates from a temperature-scaled distribution —
    the standard multilingual/multi-domain sampling scheme (sample
    probability p_g ∝ n_g^alpha): alpha=1 keeps natural proportions,
    alpha→0 flattens toward uniform, upweighting small groups.

    Returns rates consumable by :func:`mixture_resample`
    (rate_g = p_g · budget / n_g, i.e. epochs over group g). With no
    ``total_budget`` the output is normalized so the LARGEST implied
    rate is 1.0 — small groups repeat fractionally less than their
    flattened share demands, nothing is ever upsampled past the corpus
    without an explicit budget asking for it.

    Driver-side math over group COUNTS (a dict of ~#domains entries,
    from one groupBy), not data — composes with the distributed
    resampler without adding any plan nodes.
    """
    if not group_counts:
        raise ValueError("group_counts must be non-empty")
    if any(n <= 0 for n in group_counts.values()):
        raise ValueError(f"group counts must be positive: {group_counts}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    weights = {g: float(n) ** alpha for g, n in group_counts.items()}
    z = sum(weights.values())
    probs = {g: w / z for g, w in weights.items()}
    budget = total_budget if total_budget is not None else sum(group_counts.values())
    rates = {g: probs[g] * budget / group_counts[g] for g in group_counts}
    if total_budget is None:
        top = max(rates.values())
        rates = {g: r / top for g, r in rates.items()}
    return rates


def split_upper_bounds(fractions: dict[str, float]) -> list[int]:
    """Inclusive md5-bucket upper bound for each NON-final split, in dict
    order — THE bound arithmetic of :func:`dataset_split`, exported so an
    external oracle replays the exact same rounding/clamping instead of
    re-implementing it (drift between the two would silently re-route
    rows). A bound of -1 marks a zero-width split."""
    names = list(fractions)
    bounds, acc = [], 0.0
    for name in names[:-1]:
        acc += fractions[name]
        bounds.append(min(_BUCKETS, int(round(acc * _BUCKETS))) - 1)
    return bounds


def dataset_split(
    df: DataFrame, id_col: str, fractions: dict[str, float], split_col: str = "split"
) -> DataFrame:
    """Deterministic DISJOINT train/val/test assignment: consecutive
    md5-bucket ranges partition [0, 65536) by the given fractions, so
    every row lands in exactly one split, independent of partitioning,
    cluster size, or engine — and unlike three independent
    deterministic_sample calls, splits can never overlap or leak.

    Fractions must sum to 1 (±1e-9). Assignment order follows dict
    order; the last split absorbs the rounding remainder so the ranges
    exactly cover the bucket space.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"fractions must be >= 0: {fractions}")
    _reject_reserved_columns(df, (split_col,))
    bucket = sample_hash_bucket(F.col(id_col))
    names = list(fractions)
    # Inclusive bound on the last bucket of each range: a cumulative
    # fraction that rounds to _BUCKETS would render as the 5-char hex
    # '10000' under an exclusive compare and misroute every '1xxx'
    # bucket lexicographically; clamping to _BUCKETS-1 ('ffff') keeps
    # every bound a 4-char literal. Shared with the oracle mirror.
    bounds = split_upper_bounds(fractions)
    expr = None
    for name, ub in zip(names[:-1], bounds):
        # ranges are consecutive, so "first upper bound the bucket is at
        # or below" is exactly the range membership test; ub < 0 means a
        # zero-width range (fraction rounded to nothing)
        cond = F.lit(False) if ub < 0 else (bucket <= format(ub, "04x"))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget: int,
    id_col: str,
    seed: int = 0,
    oversample: float = 4.0,
    mode: str = "auto",
    skew_threshold: int = _TOK_SKEW_THRESHOLD,
    broadcast_counts: bool | None = None,
) -> DataFrame:
    """Per-group TOKEN-budget sampling — the data-mixture primitive
    ("take ~10M tokens per source"): walk each group's rows in
    deterministic random order (md5 priority) and keep rows while the
    tokens accumulated BEFORE the row are under ``budget``, so the kept
    mass overshoots by at most one document. Deterministic on any
    partitioning/engine; a SQL window over (priority, id) replays the
    exact kept set, which is what the oracle does.

    Skew shape (same structure as :func:`cap_per_key_random`): the kept
    set is a PREFIX of the group's hash-ordered stream, so a
    hash-threshold prefilter bounds the window without changing the
    answer. tau = oversample·budget / group_token_sum is a ROW fraction
    whose expected surviving token mass is oversample·budget regardless
    of how tokens distribute across rows (the hash draw is independent
    of row size); exactness audit: if a group's survivors hold ≥ budget
    tokens — or the whole group survived (tau = 1) — the true prefix is
    provably inside the survivor set (the prefix's rows all hash below
    the point where the budget is first reached, which is below tau
    whenever survivor mass ≥ budget). Groups failing the audit (token
    mass concentrated in a few huge docs plus hash bad luck) fall back
    to a full window for that group alone — detected by a bounded collect
    that is expected empty.

    Rows with NULL or negative token counts fail the job at first
    contact (an inline ``raise_error`` guard on the token column — no
    extra validation pass over a 100 TB input): a NULL would silently
    vanish from the cumulative sum and a negative would un-spend
    budget. Clean or default them first (coercion.count_default).

    ``mode`` (``"auto"`` | ``"window"`` | ``"prefilter"``) picks the
    physical form exactly as in :func:`cap_per_key_random`; the kept
    set is identical in all three. Auto measures the hottest group's
    ROW count (carried in the same per-group aggregation as the token
    sums — window cost is driven by rows sorted, not tokens) against
    ``skew_threshold``, whose default is the measured local crossover
    (SCALING.md round-8 tokcurve row).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if oversample <= 1.0:
        raise ValueError(f"oversample must be > 1, got {oversample}")
    if mode not in ("auto", "window", "prefilter"):
        raise ValueError(f"mode must be auto|window|prefilter, got {mode!r}")
    _reject_reserved_columns(
        df, ("_pri", "_tsum", "_gn", "_ssum", "_cum", "_before")
    )
    checked = F.when(
        F.col(token_col).isNull() | (F.col(token_col) < 0),
        F.raise_error(
            F.lit(
                f"token_budget_sample: {token_col!r} contains NULL or "
                "negative values; clean or default them first "
                "(coercion.count_default)"
            )
        ).cast(df.schema[token_col].dataType),
    ).otherwise(F.col(token_col))
    df = df.withColumn(token_col, checked)
    pri = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w_plain = Window.partitionBy(group_col).orderBy(F.asc("_pri"), F.asc(id_col))
    sums = None
    if mode == "auto":
        # the probe rides the SAME per-group aggregation the prefilter
        # needs (token sums + row counts in one pass); window cost is
        # driven by rows sorted, so the switch reads the row count.
        # Running it here also surfaces the NULL/negative token guard
        # at call time in auto mode.
        both = df.groupBy(group_col).agg(
            F.sum(token_col).alias("_tsum"), F.count(F.lit(1)).alias("_gn")
        )
        hottest, n_groups = both.agg(
            F.max("_gn"), F.count(F.lit(1))
        ).first()
        mode = "prefilter" if (hottest or 0) >= skew_threshold else "window"
        if broadcast_counts is None:
            broadcast_counts = n_groups <= _COUNTS_BROADCAST_MAX_KEYS
        sums = both.drop("_gn")
    if mode == "window":
        before = (
            F.sum(F.col(token_col)).over(
                w_plain.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col(token_col)
        )
        return (
            df.withColumn("_pri", pri)
            .withColumn("_before", before)
            .filter(F.col("_before") < budget)
            .select(*df.columns)
        )
    if sums is None:
        sums = df.groupBy(group_col).agg(F.sum(token_col).alias("_tsum"))
    if broadcast_counts is None:
        broadcast_counts = True
    # broadcast for the same reason as cap_per_key_random: the planner
    # sizes the aggregate like its input and would sort-merge the
    # corpus on the skewed group key; broadcast_counts=None resolves
    # from the auto probe's distinct-group count (shippable -> ship)
    joined = _counts_join_back(
        df.withColumn("_pri", pri), sums, group_col, broadcast_counts
    )
    frac = F.conv(F.substring(F.col("_pri"), 1, 15), 16, 10).cast("double") / F.lit(
        float(1 << 60)
    )
    tau = F.least(
        F.lit(1.0), F.lit(float(oversample * budget)) / F.col("_tsum")
    )
    survivors = joined.filter(frac < tau).localCheckpoint(eager=True)
    audits = survivors.groupBy(group_col).agg(F.sum(token_col).alias("_ssum"))
    unsafe = (
        sums.join(audits, group_col, "left")
        .filter(
            (F.coalesce(F.col("_ssum"), F.lit(0)) < budget)
            & (F.col("_tsum") > F.coalesce(F.col("_ssum"), F.lit(0)))
        )
        .select(group_col)
    )
    unsafe_rows = unsafe.limit(1001).collect()

    w = Window.partitionBy(group_col).orderBy(F.asc("_pri"), F.asc(id_col))

    def kept(frame: DataFrame) -> DataFrame:
        before = (
            F.sum(F.col(token_col)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col(token_col)
        )
        return (
            frame.withColumn("_before", before)
            .filter(F.col("_before") < budget)
            .drop("_pri", "_tsum", "_before")
        )

    safe = survivors
    out_parts = []
    if unsafe_rows:
        if len(unsafe_rows) > 1000:
            safe = survivors.join(unsafe, group_col, "left_anti")
            out_parts.append(kept(joined.join(unsafe, group_col, "left_semi")))
        else:
            keys = [r[group_col] for r in unsafe_rows]
            safe = survivors.filter(~F.col(group_col).isin(keys))
            out_parts.append(kept(joined.filter(F.col(group_col).isin(keys))))
    out = kept(safe)
    for part in out_parts:
        out = out.unionByName(part)
    # same column-order pin as cap_per_key_random: the sums join moves
    # the group column first on the prefilter path only
    return out.select(*df.columns)

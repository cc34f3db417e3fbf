"""Join operators beyond vanilla equi-joins: as-of and range joins.

Spark has no native as-of join; the two distributed strategies are
(a) equi-join on the `by` key + window pick of the closest match — one
shuffle per side on the key, correct for any data, used here; and
(b) `applyInPandas` with `pd.merge_asof` per key-group — faster when the
per-key history is long (sorted merge instead of join+rank) but requires
the group to fit in memory. Both are exposed.

Range joins use an equi-key plus a band predicate; Catalyst executes the
equi part as a normal shuffled/broadcast hash join and post-filters the
band, which is the right plan when the equi key is selective. Keyless
band joins (pure interval overlap) should bucketize the range dimension
first — see `bucketized_range_join`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    left_id: str | None = None,
    direction: str = "backward",
    right_cols: list[str] | None = None,
    tiebreak: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (backward; ``>=`` + earliest for forward),
    matching on the `by` key. Left rows with no match keep NULLs.

    ``left_id`` is a unique left key for the dedup window; when omitted a
    ``monotonically_increasing_id`` is synthesized (never partition the
    window by every left column — wide shuffle key, and wrong when left
    has genuine duplicate rows). ``tiebreak`` breaks right-side ts ties
    deterministically. ``tolerance_seconds`` bounds the match gap
    (pandas merge_asof's ``tolerance``): a right row further than that
    from the left timestamp does not match, leaving NULLs — and at
    scale it also shrinks the pre-window join fan-out, which is the
    real cost of the join+window as-of form. Right columns whose names
    collide with left columns are suffixed ``_r`` in the output
    (default keep-list excludes the join key ``by_right`` to avoid a
    redundant duplicate).
    """
    if tolerance_seconds is not None and tolerance_seconds < 0:
        raise ValueError(f"tolerance_seconds must be >= 0, got {tolerance_seconds}")
    synthesized = left_id is None
    if synthesized:
        left_id = "_asof_lid"
        left = left.withColumn(left_id, F.monotonically_increasing_id())
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (F.col(f"l.{by_left}") == F.col(f"r.{by_right}")) & (
        rt <= lt if direction == "backward" else rt >= lt
    )
    if tolerance_seconds is not None:
        gap = F.abs(lt.cast("double") - rt.cast("double"))
        cond = cond & (gap <= F.lit(float(tolerance_seconds)))
    keep = right_cols or [c for c in right.columns if c != by_right]
    l, r = left.alias("l"), right.alias("r")
    joined = l.join(r, cond, "left")
    if direction == "backward":
        order = [rt.desc_nulls_last()] + [F.col(f"r.{c}").desc_nulls_last() for c in (tiebreak or [])]
    else:
        order = [rt.asc_nulls_last()] + [F.col(f"r.{c}").asc_nulls_last() for c in (tiebreak or [])]
    w = Window.partitionBy(F.col(f"l.{left_id}")).orderBy(*order)
    ranked = joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    out_left = [c for c in left.columns if not (synthesized and c == left_id)]
    return ranked.select(
        *[F.col(f"l.{c}").alias(c) for c in out_left],
        *[
            F.col(f"r.{c}").alias(f"{c}_r" if c in out_left else c)
            for c in keep
        ],
    )


def merge_asof_grouped(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """pd.merge_asof per co-grouped key — the long-history fast path.

    cogroup shuffles each side once on the key; within a group the match
    is a linear sorted merge (no rank materialization). Arrow moves the
    batches; keep per-key groups bounded (salt years/months into the key
    for unbounded histories).

    ``right_value_cols`` must not collide with left column names:
    pd.merge_asof would suffix the right column and the positional select
    would silently return left-side values (or clobber the left column)
    — refused up front instead.
    """
    collisions = set(right_value_cols) & set(left.columns)
    if right_ts in left.columns and right_ts != left_ts:
        collisions.add(right_ts)
    if collisions:
        raise ValueError(
            f"right_value_cols collide with left columns: {sorted(collisions)}; "
            "rename the right-side columns before the as-of merge"
        )
    import pandas as pd

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`{c}` {dict((fl.name, fl.dataType.simpleString()) for fl in right.schema.fields)[c]}"
           for c in right_value_cols]
    )

    lcols = list(left.columns)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=lcols + right_value_cols)
        # pd.merge_asof raises on NULL merge keys; mirror asof_join's
        # semantics instead: null-ts left rows keep NULL matches, null-ts
        # right rows can never match.
        l_null = l[l[left_ts].isna()]
        l = l[l[left_ts].notna()].sort_values(left_ts)
        r = r[r[right_ts].notna()]
        if l.empty or r.empty:
            out = pd.concat([l, l_null]) if not l_null.empty else l
            out = out.copy()
            for c in right_value_cols:
                out[c] = None
            return out[lcols + right_value_cols]
        r = r.sort_values(right_ts)[[right_ts] + [c for c in right_value_cols if c != right_ts]]
        merged = pd.merge_asof(
            l, r, left_on=left_ts, right_on=right_ts, direction=direction,
            suffixes=("", "_r"),
        )
        for c in right_value_cols:
            if c == right_ts and f"{c}_r" in merged.columns:
                merged[c] = merged[f"{c}_r"]
        if not l_null.empty:
            nulls = l_null.copy()
            for c in right_value_cols:
                nulls[c] = None
            merged = pd.concat([merged, nulls])
        return merged[lcols + right_value_cols]

    return (
        left.groupBy(by_left)
        .cogroup(right.groupBy(by_right))
        .applyInPandas(lambda _key, l, r: merge(l, r), out_schema)
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    band,
    how: str = "inner",
) -> DataFrame:
    """Equi-key + band-predicate join: the equi part runs as a hash join
    and ``band`` (a Column over the joined columns) restricts the range.

    For ``how='inner'`` the band is an equivalent post-join filter. For
    outer joins a post-filter would be WRONG (it drops null-extended
    rows, silently degrading to inner), so the band goes into the join
    condition itself; the duplicate key columns are then resolved
    (kept from the preserved side, coalesced for full outer).
    """
    if how == "inner":
        return left.join(right, on, how).filter(band)
    cond = None
    for c in on:
        e = left[c] == right[c]  # standard semantics: NULL keys never match
        cond = e if cond is None else cond & e
    joined = left.join(right, cond & band, how)
    if how in ("left", "left_outer"):
        for c in on:
            joined = joined.drop(right[c])
    elif how in ("right", "right_outer"):
        for c in on:
            joined = joined.drop(left[c])
    elif how in ("full", "full_outer", "outer"):
        for c in on:
            joined = joined.withColumn(f"_k_{c}", F.coalesce(left[c], right[c]))
            joined = joined.drop(left[c]).drop(right[c]).withColumnRenamed(f"_k_{c}", c)
    return joined


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-mitigated equi-join: hot keys on the big (left) side spread
    over ``salt_buckets`` sub-keys; the small/replicable (right) side is
    exploded ×buckets so every salted sub-key finds its match.

    Use when one join key dominates (AQE's skew-join split handles sort-
    merge skew, but salting also works for aggregations-after-join and
    for engines/paths AQE doesn't cover). Results are identical to the
    unsalted join for inner/left/semi/anti; cost is ×buckets replication
    of the right side. Right/full outer joins are refused: the exploded
    right copies would null-extend once per unmatched salt bucket.
    """
    if how.replace("_outer", "") in ("right", "full", "outer"):
        raise ValueError(
            "salted_join supports inner/left/semi/anti joins only; a "
            "right/full outer join over exploded salt copies emits one "
            "null-extended row per unmatched bucket. Swap the sides or "
            "use AQE skew handling for outer joins."
        )
    # Collision-free internal salt name: silently reusing a user column
    # called `_salt` would corrupt (overwrite, then drop) that column.
    salt_col = "_salt"
    taken = set(left.columns) | set(right.columns)
    while salt_col in taken:
        salt_col = "_" + salt_col
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).cast("int")
    l = left.withColumn(salt_col, salt)
    r = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return l.join(r, on + [salt_col], how).drop(salt_col)


def bucketized_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width_days: int = 7,
) -> DataFrame:
    """Keyless interval join at scale: assign each left point to a
    time bucket, explode each right interval over the buckets it spans,
    equi-join on bucket, then post-filter the exact containment. Turns an
    O(n·m) broadcast-nested-loop into a shuffled hash join keyed by time.
    """
    width = F.lit(bucket_width_days)
    lb = left.withColumn("_bkt", (F.datediff(F.col(left_point), F.lit("1970-01-01")) / width).cast("long"))
    rb = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.datediff(F.col(right_start), F.lit("1970-01-01")) / width).cast("long"),
                (F.datediff(F.col(right_end), F.lit("1970-01-01")) / width).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "_bkt")
        .filter((F.col(left_point) >= F.col(right_start)) & (F.col(left_point) <= F.col(right_end)))
        .drop("_bkt")
    )


def attach_scalar(df: DataFrame, scalar_df: DataFrame) -> DataFrame:
    """Attach every column of a single-row aggregate frame to each row of
    ``df`` via a scalar subquery (``DataFrame.scalar()``, Spark 4+).

    The canonical "broadcast one global statistic onto the stream" shape
    (corpus size, avg doc length, IQR fences). Compiles to a
    ``ScalarSubquery``: the aggregate runs once and its value is injected
    into the main plan as a literal — no join node at all. The
    ``crossJoin(F.broadcast(one_row))`` alternative is semantically
    identical but plans as an unconditioned BroadcastNestedLoopJoin,
    which the plan audit (``plans.audit.assert_no_cartesian``) rejects
    because it is indistinguishable in the plan text from an accidental
    O(n·m) product.

    ``scalar_df`` must be exactly one row (an ungrouped ``agg``); Spark
    enforces this at runtime (scalar subqueries fail on >1 row). Column
    names must not collide with ``df``'s.
    """
    overlap = set(df.columns) & set(scalar_df.columns)
    if overlap:
        raise ValueError(f"scalar columns collide with df columns: {sorted(overlap)}")
    packed = scalar_df.select(
        F.struct(*[F.col(c) for c in scalar_df.columns]).alias("_scalar")
    )
    out = df.withColumn("_scalar", packed.scalar())
    for c in scalar_df.columns:
        out = out.withColumn(c, F.col(f"_scalar.{c}"))
    return out.drop("_scalar")

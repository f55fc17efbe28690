"""Two-stream join operators (SURVEY.md §2.6, J1/J2).

J1 — the reference's event-time interval join (``order-pay-detect/.../
TxMatchByJoin.scala:68-71``: equi on txId, receipt time within ±5 s of
pay time) is an equi-join with a residual range predicate. Declared
that way, Catalyst hashes/sorts on the equi key and applies the time
bound as a post-join filter — the join state never fans out beyond the
key match, and in streaming mode the same expression plus watermarks
lets Spark evict state by time bound.

J2 — the reference's CoProcessFunction reconciliation (``TxMatchDetect.
scala:88-138``) with matched + unmatched-pay + unmatched-receipt side
outputs is a full-outer join plus a tag column; side outputs become
filters over one DataFrame instead of OutputTags.

Scale note: both shuffle once on the join key. For skewed tx keys AQE
skew-join splits oversized partitions; a broadcast hint is applied
automatically by Catalyst when one side is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_join(left: DataFrame, right: DataFrame, on: list[str],
                  left_ts: str, right_ts: str,
                  lower_s: int, upper_s: int,
                  how: str = "inner") -> DataFrame:
    """J1: equi-join on ``on`` with right_ts ∈ [left_ts+lower, left_ts+upper].

    Columns must be pre-aliased to avoid ambiguity (caller selects).
    """
    cond: Column = None  # type: ignore[assignment]
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    lo = right[right_ts] >= left[left_ts] + F.expr(f"INTERVAL {lower_s} SECOND")
    hi = right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper_s} SECOND")
    return left.join(right, cond & lo & hi, how)


def salted_join(facts: DataFrame, dim: DataFrame, on: str,
                buckets: int = 16, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join for hot keys: the fact side gets a per-row
    salt in [0, buckets) derived from the whole row (deterministic for
    identical rows, but spreading a hot key's rows across buckets); the
    dim side is replicated once per salt. The shuffle then distributes a
    hot key over ``buckets`` reducers instead of one.

    Use when a handful of keys dominate (power-law item ids, null-ish
    sentinel keys) and AQE skew-join splitting isn't enough — e.g. the
    dim side is modest but too big to broadcast. Join result is
    identical to ``facts.join(dim, on, how)`` for how ∈ {inner, left}.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]),
                  F.lit(buckets)).cast("int")
    fs = facts.withColumn("_salt", salt)
    ds = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    return fs.join(ds, [on, "_salt"], how).drop("_salt")


def reconcile_full_outer(left: DataFrame, right: DataFrame, key: str,
                         tag_col: str = "tag",
                         matched: str = "matched",
                         left_only: str = "unmatched_left",
                         right_only: str = "unmatched_right") -> DataFrame:
    """J2: full-outer reconciliation with a tag column replacing the
    reference's two OutputTag side channels. Downstream splits with
    ``where(tag = ...)`` — one plan, three logical outputs."""
    from functools import reduce

    joined = left.join(right, on=key, how="full_outer")
    # Presence = ANY payload column non-null (OR-reduce). NOT coalesce:
    # isNotNull() is never NULL, so coalesce would only ever test the
    # first column and mis-tag a matched row whose first payload column
    # is legitimately NULL.
    some_left = reduce(
        lambda a, b: a | b,
        [left[c].isNotNull() for c in left.columns if c != key])
    some_right = reduce(
        lambda a, b: a | b,
        [right[c].isNotNull() for c in right.columns if c != key])
    tag = (
        F.when(some_left & some_right, F.lit(matched))
         .when(some_left, F.lit(left_only))
         .otherwise(F.lit(right_only))
    )
    return joined.withColumn(tag_col, tag)


def band_join(fact: DataFrame, bands: DataFrame, *, value_col: str,
              lo_col: str, hi_col: str, bucket_width: float,
              broadcast_bands: bool = True) -> DataFrame:
    """Numeric band (interval-dimension) join: every fact row matched to
    every band with ``lo <= value < hi`` — overlapping bands yield one
    output row per match.

    Declared naively (``fact.join(bands, (v >= lo) & (v < hi))``) this
    is an inequality-only join, which Catalyst can only execute as
    BroadcastNestedLoopJoin: O(|fact| x |bands|) comparisons and a
    mandatory broadcast — the classic theta-join scale cliff. Instead
    the bands are decomposed into the fixed-width buckets they cover
    (``floor(lo/w) .. ceil(hi/w)-1``, an explode whose fan-out is
    band_width/w, bounded by construction) and the join becomes an
    EQUI-join on the fact's ``floor(value/w)`` bucket with the exact
    band predicate as a residual filter. Catalyst then plans a hash
    join: broadcast when the exploded band table is dimension-sized
    (default), shuffle-on-bucket otherwise — either way, no nested
    loop, and the bucket key distributes evenly because it inherits the
    fact value distribution at ``w`` granularity.

    ``bucket_width`` trades fan-out for residual selectivity: smaller w
    → more exploded band rows, fewer false bucket matches. Pick w near
    the typical band width so each band explodes to O(1..10) buckets.
    """
    w = float(bucket_width)
    lo, hi = F.col(lo_col), F.col(hi_col)
    # Malformed bands fail fast instead of fanning out junk: a band with
    # hi <= lo matches nothing under `lo <= v < hi`, but its bucket
    # sequence (floor(lo/w) .. ceil(hi/w)-1) would be DESCENDING —
    # F.sequence defaults the step to -1 — exploding spurious rows that
    # only the residual filter later discards. Empty/inverted bands are
    # dropped up front; the explicit +1 step makes any future widening
    # of the pre-filter an error, not a silent fan-out.
    exploded = bands.where(hi > lo).withColumn(
        "_bj_bucket",
        F.explode(F.sequence(
            F.floor(lo / w).cast("long"),
            (F.ceil(hi / w) - 1).cast("long"),
            F.lit(1).cast("long"))))
    if broadcast_bands:
        exploded = F.broadcast(exploded)
    else:
        exploded = exploded.hint("shuffle_hash")
    v = F.col(value_col)
    return (fact.withColumn("_bj_bucket", F.floor(v / w).cast("long"))
                .join(exploded, "_bj_bucket")
                .where((v >= lo) & (v < hi))
                .drop("_bj_bucket"))


def interval_overlap_join(left: DataFrame, right: DataFrame, *,
                          left_cols: tuple[str, str],
                          right_cols: tuple[str, str],
                          bucket_width: int,
                          extra_cond: Column | None = None,
                          pin_shuffle: bool = True) -> DataFrame:
    """Interval × interval OVERLAP join: every (l, r) pair whose CLOSED
    intervals [l_start, l_end], [r_start, r_end] intersect — the
    operator behind "which sessions/outages/campaigns ran concurrently",
    which Spark's API lacks (declared as a raw theta join it plans as a
    BroadcastNestedLoopJoin: O(|L|×|R|) comparisons and a mandatory
    broadcast).

    Bucket decomposition like ``band_join``, extended to two interval
    sides: BOTH relations explode into the fixed-width time buckets
    they cover, the join is an EQUI-join on the bucket, and the exact
    overlap predicate is a residual filter. Dedup is FREE: a pair whose
    intervals overlap shares every bucket in the overlap region, so the
    residual keeps only the bucket containing greatest(l_start,
    r_start) — the overlap's first bucket, which both sides cover by
    construction — and each qualifying pair is emitted exactly once
    with no distinct/groupBy exchange.

    ``bucket_width`` trades explode fan-out (interval_span / width rows
    per interval) against bucket selectivity, exactly as in band_join:
    pick ~ the typical interval length. Both exploded relations ride
    the fact's scale, so the join is pinned shuffle-hash by default
    (``pin_shuffle=False`` lets a genuinely dimension-sized right side
    broadcast).

    ``extra_cond`` joins additional predicates into the join condition
    (e.g. ``col("user_a") < col("user_b")`` for a self-join's pair
    ordering) so they apply before the shuffle output materializes.
    """
    w = int(bucket_width)
    ls, le = (F.col(c).cast("long") for c in left_cols)
    rs, re_ = (F.col(c).cast("long") for c in right_cols)
    # Inverted intervals (end < start) are semantically empty under the
    # closed-interval overlap predicate, and their bucket range would be
    # DESCENDING — F.sequence with the pinned +1 step raises on that
    # (band_join precedent, joins.py:122): drop them up front. Point
    # intervals (end == start) stay — they explode to one bucket.
    lb = left.where(le >= ls).withColumn(
        "_oj_b", F.explode(F.sequence(
            F.floor(ls / w), F.floor(le / w), F.lit(1).cast("long"))))
    rb = right.where(re_ >= rs).withColumn(
        "_oj_b2", F.explode(F.sequence(
            F.floor(rs / w), F.floor(re_ / w), F.lit(1).cast("long"))))
    if pin_shuffle:
        rb = rb.hint("shuffle_hash")
    cond = ((F.col("_oj_b") == F.col("_oj_b2"))
            & (ls <= re_) & (rs <= le)
            & (F.col("_oj_b") == F.floor(F.greatest(ls, rs) / w)))
    if extra_cond is not None:
        cond = cond & extra_cond
    return lb.join(rb, cond).drop("_oj_b", "_oj_b2")

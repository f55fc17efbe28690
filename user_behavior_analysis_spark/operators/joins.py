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

"""As-of (point-in-time) join — the temporal operator Spark's DataFrame
API lacks natively.

For every left row, attach the payload of the latest right row with the
same key whose timestamp is at-or-before the left timestamp. The
reference engine has no such operator either; it is the natural
generalization of its interval join (`TxMatch.scala`, SURVEY.md §2.6 J1)
to "most recent prior fact", and the workhorse of last-touch attribution,
slowly-changing-dimension lookups, and feature-store point-in-time
correctness.

Implementation is the union-tag trick, not a Pandas UDF: tag right rows
0 and left rows 1, union by name, then one window per key ordered by
(ts, tag) carrying `last(payload, ignorenulls)` forward — right rows at
the same timestamp sort before left rows, making the match inclusive.
Scale shape: ONE shuffle on the join key (the window's partitionBy), an
in-partition sort that spills, and no per-row Python anywhere. A
broadcast or bucketed variant is unnecessary: the union is linear and
the window is the same machinery sessionization already uses.

Ties: if several right rows share (key, ts), `last()` picks the one
latest in sort order, which is nondeterministic across engines — callers
that need oracle-exactness must pre-dedupe the right side to one row per
(key, ts) (see queries.last_touch_attribution: max_by on event_id).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, *,
              left_on: str, right_on: str,
              left_ts: str, right_ts: str,
              payload: Sequence[str]) -> DataFrame:
    """Left as-of join: every left row, plus ``payload`` columns from the
    latest right row with ``right_on == left_on`` and
    ``right_ts <= left_ts`` (NULL payload when no prior right row).

    ``payload`` names must not collide with left column names.

    Matches merge_asof/ASOF JOIN edge semantics: right rows with a NULL
    key or NULL timestamp never match anything (dropped up front), and
    the carried value is the latest right ROW as a unit — payload
    columns are packed into one struct before the window, so a matched
    row whose payload is legitimately NULL yields NULL (never a stale
    value resurrected from an older row) and multi-column payloads can
    never mix fields from different right rows.
    """
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left side: {clash}")

    r = right.where(
        F.col(right_on).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(right_on).alias(left_on),
        F.col(right_ts).alias("_asof_ts"),
        F.struct(*[F.col(c) for c in payload]).alias("_asof_pack"),
    ).withColumn("_asof_side", F.lit(0))
    l = left.withColumn("_asof_ts", F.col(left_ts)) \
            .withColumn("_asof_side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (Window.partitionBy(left_on)
               .orderBy("_asof_ts", "_asof_side")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "_asof_hit", F.last("_asof_pack", ignorenulls=True).over(w))
    return (carried.where(F.col("_asof_side") == 1)
                   .select(*left.columns,
                           *[F.col(f"_asof_hit.{c}").alias(c)
                             for c in payload]))

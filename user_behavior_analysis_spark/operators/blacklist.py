"""Threshold blacklist with daily reset (SURVEY.md §2.7, T1/T2).

The reference's FilterBlackListUser (``market-analysis/.../
AdStatisticsByGeo.scala:68-113``) keys by (userId, adId), counts clicks
in per-key state, emits a one-shot BlackListWarning side output when the
count reaches the threshold, and clears all state at the next midnight
via a processing-time timer.

Batch semantics are exact and declarative: the "daily reset timer" IS a
group-by on the UTC day bucket, the "one-shot side output" IS the set of
(user, ad, day) groups at/over threshold, and the "pass-through main
stream" IS the first `threshold` clicks of each group (row_number over
event time). The streaming version with real timers lives in
``streaming/stateful.py``; this module is the batch/oracle form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _with_day(df: DataFrame, ts_col: str) -> DataFrame:
    # epoch-day bucket as BIGINT — the reference's midnight arithmetic
    # (AdStatisticsByGeo.scala:86) without stringified dates.
    return df.withColumn(
        "day_start",
        (F.floor(F.col(ts_col).cast("double") / 86400) * 86400).cast("long"))


def blacklist_warnings(df: DataFrame, keys: Sequence[str], ts_col: str,
                       threshold: int) -> DataFrame:
    """T1 side output: keys whose daily click count reached threshold."""
    return (
        _with_day(df, ts_col)
        .groupBy("day_start", *keys)
        .agg(F.count(F.lit(1)).alias("click_cnt"))
        .where(F.col("click_cnt") >= threshold)
        .withColumn("msg", F.lit(f"Click over {threshold} times today."))
    )


def blacklist_passthrough(df: DataFrame, keys: Sequence[str], ts_col: str,
                          threshold: int, order_tiebreak: str) -> DataFrame:
    """T2 main stream: per (day, keys) the first `threshold` events pass
    downstream; later ones are suppressed — exactly the reference's
    "count < maxCount → collect" path (AdStatisticsByGeo.scala:97-102).

    WindowGroupLimit (rank pushdown) keeps this one shuffle; tiebreak on
    a unique id makes the cut deterministic.
    """
    w = (Window.partitionBy("day_start", *keys)
         .orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc()))
    return (
        _with_day(df, ts_col)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= threshold)
        .drop("_rn")
    )

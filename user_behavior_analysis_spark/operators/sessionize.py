"""Gap-based sessionization — engine extension beyond the reference.

Not present in the reference (its windows are all fixed-size), but a
core user-behavior primitive: group a user's events into sessions split
at inactivity gaps. Batch form: lag + cumulative-sum-of-gap-breaks per
key — one shuffle on the key, linear per-partition work, no state
explosion at 100 TB. Streaming form: ``session_window`` (see
streaming/jobs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(df: DataFrame, key: str, ts_col: str, gap_s: int) -> DataFrame:
    """One row per (key, session): start/end epoch sec + event count."""
    w = Window.partitionBy(key).orderBy(ts_col)
    ts_l = F.col(ts_col).cast("long")
    marked = (
        df.withColumn("_gap", ts_l - F.lag(ts_l).over(w))
          .withColumn("_new", F.when(F.col("_gap").isNull()
                                     | (F.col("_gap") > gap_s), 1).otherwise(0))
          .withColumn("_sid", F.sum("_new").over(w))
    )
    return (
        marked.groupBy(key, "_sid")
        .agg(F.min(ts_l).alias("session_start"),
             F.max(ts_l).alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
        .drop("_sid")
    )

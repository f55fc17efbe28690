"""Distributed rank / ntile without a global sort.

A windowed ``row_number()``/``ntile()`` with no PARTITION BY collapses
the whole frame into ONE task — the classic scale cliff hiding inside
every "assign quartiles" requirement. This module computes the same
integers with the two-phase histogram pattern (the training_shards
prefix-sum trick, applied to ranking):

1. bucket every row by a coarse, deterministic, ORDER-PRESERVING
   function of its sort key (``floor(key)``);
2. per-bucket counts get a prefix sum over |buckets| rows (a genuinely
   tiny single-partition window);
3. global rank = bucket offset + row_number within the bucket — the
   heavy window now runs PARTITIONED by bucket.

The result is bit-identical to the single-partition form for any total
order, so it can be oracled against plain SQL NTILE — two independent
algorithms, same integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def distributed_rank(df: DataFrame, key: Column,
                     tiebreak: str, out: str = "rank") -> DataFrame:
    """Dense global row_number over (key ASC, tiebreak ASC) — without a
    single-partition sort. ``key`` must be numeric; for descending
    metrics pass the negated column. ``tiebreak`` must make the order
    total (an id column).
    """
    b = df.withColumn("_bk", F.floor(key).cast("long")) \
          .withColumn("_ky", key)
    cnt = b.groupBy("_bk").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    off = cnt.select("_bk",
                     F.coalesce(F.sum("_n").over(woff), F.lit(0))
                      .alias("_off"))
    win = Window.partitionBy("_bk").orderBy("_ky", tiebreak)
    return (b.join(F.broadcast(off), "_bk")
             .withColumn(out, F.col("_off") + F.row_number().over(win))
             .drop("_bk", "_ky", "_off"))


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL NTILE(n) reconstructed from (rank, total): the first
    ``total % n`` tiles hold ``total div n + 1`` rows, the rest hold
    ``total div n``. All arithmetic is on exact integer-valued columns
    (float division only where the result is an exact integer or feeds
    a ceil), bit-identical to the window function it replaces."""
    q = ((total - total % n) / n).cast("long")
    r = (total % n).cast("long")
    big = q + 1
    cut = r * big  # rows covered by the (q+1)-sized leading tiles
    return (F.when(rank <= cut, F.ceil(rank / big))
             .otherwise(r + F.ceil((rank - cut) / F.greatest(q, F.lit(1))))
             .cast("int"))

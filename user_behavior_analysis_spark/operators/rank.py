"""Distributed rank / ntile without a global sort.

A windowed ``row_number()``/``ntile()`` with no PARTITION BY collapses
the whole frame into ONE task — the classic scale cliff hiding inside
every "assign quartiles" requirement. This module computes the same
integers with the two-phase histogram pattern (the training_shards
prefix-sum trick, applied to ranking):

1. bucket every row by a coarse, deterministic, ORDER-PRESERVING
   function of its sort key — quantile cut points from a
   Greenwald-Khanna sketch (``approxQuantile``), NOT ``floor(key)``:
   floor collapses any key confined to one unit interval (a [0,1)
   score, a ratio) into a single bucket and silently degenerates to
   the global sort this module exists to avoid;
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


def bucket_cuts(df: DataFrame, col: str, buckets: int,
                relative_error: float) -> list[float]:
    """Deduped ascending quantile cut points for ``col`` — the bucket
    boundary derivation behind ``distributed_rank``, exposed so tests
    can assert pathological key distributions (all keys inside one
    unit interval, heavy skew) still yield real partitioning."""
    probs = [i / buckets for i in range(1, buckets)]
    return sorted(set(df.approxQuantile(col, probs, relative_error)))


def distributed_rank(df: DataFrame, key: Column,
                     tiebreak: str, out: str = "rank",
                     buckets: int = 64,
                     relative_error: float = 1e-3) -> DataFrame:
    """Dense global row_number over (key ASC, tiebreak ASC) — without a
    single-partition sort. ``key`` must be numeric (NaN unsupported —
    bucket comparison and sort order disagree on NaN); for descending
    metrics pass the negated column. ``tiebreak`` must make the order
    total (an id column).

    Bucket boundaries come from ``approxQuantile`` over a monotone
    double cast of the key (one extra bounded-memory aggregation pass).
    The cast is order-preserving, so bucket(x) <= bucket(y) whenever
    x <= y regardless of precision loss, and within-bucket ordering
    uses the ORIGINAL key — the result stays bit-identical to the
    single-partition form for any key distribution, including keys
    confined to an arbitrarily narrow range (the floor(key) failure
    mode) and heavy skew (duplicate cut points are deduped; a single
    dominant value degenerates gracefully to fewer buckets, never to a
    wrong answer).
    """
    b = df.withColumn("_ky", key).withColumn("_kyd", key.cast("double"))
    cuts = bucket_cuts(b, "_kyd", buckets, relative_error)
    bk = F.lit(0)
    for c in cuts:  # chained codegen-able +1s: #cuts <= key
        bk = bk + F.when(F.col("_kyd") >= F.lit(c), 1).otherwise(0)
    b = b.withColumn("_bk", bk)
    cnt = b.groupBy("_bk").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    off = cnt.select("_bk",
                     F.coalesce(F.sum("_n").over(woff), F.lit(0))
                      .alias("_off"))
    win = Window.partitionBy("_bk").orderBy("_ky", tiebreak)
    return (b.join(F.broadcast(off), "_bk")
             .withColumn(out, F.col("_off") + F.row_number().over(win))
             .drop("_bk", "_ky", "_kyd", "_off"))


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

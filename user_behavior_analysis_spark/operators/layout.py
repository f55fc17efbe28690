"""Multi-dimensional data layout for scan pruning (Z-order clustering).

At 100 TB the cheapest query is the one that never reads the data:
parquet row-group min/max statistics prune scans, but only if the
writer clustered rows so the stats are TIGHT. A linear sort is tight on
one column and useless on the second; a Z-order (Morton) curve
interleaves the bits of both keys so every contiguous range of
z-values is a small rectangle in (a, b) space — both columns get tight
bounds, and predicates on either (or both) prune.

This module keeps the whole computation inside whole-stage codegen:
the z-value is a pure scan expression (no shuffle to build), and the
layout evaluation is one aggregate over the z-range bucket. The public
technique (Morton 1966; used by every lakehouse OPTIMIZE ZORDER BY)
carries no reference-repo counterpart — it is part of the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_value", "zorder_layout_stats"]

#: bits kept per dimension after range-normalization (z fits in 2*BITS).
BITS = 16


def _normalize(col: Column, lo: Column, hi: Column) -> Column:
    """Rank-free range normalization of an integer key to [0, 2^BITS):
    the offset is cast to double BEFORE the 65535 multiply (a span
    ≥ 2^48 would overflow int64 under ANSI mode; the double path is
    exact below 2^53 and stays monotone above, which is all the
    bucketing contract needs). Both engines compute the identical
    cell; degenerate (constant) dimensions map to 0."""
    span = hi - lo
    scaled = (col - lo).cast("double") * F.lit((1 << BITS) - 1)
    return F.when(span == 0, F.lit(0)).otherwise(
        F.floor(scaled / span)).cast("long")


def zorder_value(a: Column, b: Column) -> Column:
    """Morton interleave of two BITS-bit integers: bit i of ``a`` lands
    at position 2i, bit i of ``b`` at 2i+1. A static 2*BITS-term
    expression — codegen-friendly, no UDF, no loop at runtime."""
    z = None
    for i in range(BITS):
        ta = F.shiftright(a, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        tb = F.shiftright(b, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        term = ta + tb
        z = term if z is None else z + term
    return z.cast("long")


def zorder_layout_stats(df: DataFrame, col_a: str, col_b: str,
                        buckets_log2: int = 6) -> DataFrame:
    """Evaluate a Z-order layout: assign every row to one of
    2**buckets_log2 fixed z-range buckets (≙ the files a
    ``repartitionByRange(z).sortWithinPartitions(z)`` write would
    produce) and report per-bucket min/max of BOTH dimensions — i.e.
    exactly the parquet footer stats a reader would prune on.

    ``span_ppm`` is the bucket's covered rectangle area as ppm of the
    full (a, b) domain: the pruning-quality metric (a linear sort
    yields ~10^6 on the second column; Z-order stays small on both).

    100 TB shape: one 6-value global aggregate broadcast back into the
    scan (min/max/count per dimension — a 1-row build side), the
    z/bucket computation entirely map-side, then a single exchange of
    2**buckets_log2 groups. Fixed arithmetic bucket boundaries — not
    sampled ones — keep the assignment deterministic and oracle-able;
    a production writer would use repartitionByRange for balance and
    accept sampling nondeterminism.
    """
    bounds = df.agg(F.min(col_a).alias("alo"), F.max(col_a).alias("ahi"),
                    F.min(col_b).alias("blo"), F.max(col_b).alias("bhi"))
    ua = _normalize(F.col(col_a), F.col("alo"), F.col("ahi"))
    ub = _normalize(F.col(col_b), F.col("blo"), F.col("bhi"))
    z = zorder_value(ua, ub)
    bucket = F.shiftright(z, 2 * BITS - buckets_log2).cast("int")
    # rectangle areas in DOUBLE: two wide key domains multiply past
    # int64 (found by the 10x key-offset scale probe — ANSI mode
    # overflows where DuckDB silently promotes to HUGEINT); each span
    # is < 2^53 so the doubles are exact and both engines round the
    # product identically.
    area = ((F.max(col_a) - F.min(col_a) + 1).cast("double")
            * (F.max(col_b) - F.min(col_b) + 1).cast("double"))
    domain = ((F.first("ahi") - F.first("alo") + 1).cast("double")
              * (F.first("bhi") - F.first("blo") + 1).cast("double"))
    return (df.join(F.broadcast(bounds))
              .select(F.col(col_a), F.col(col_b), bucket.alias("bucket"),
                      "alo", "ahi", "blo", "bhi")
              .groupBy("bucket")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.min(col_a).alias("a_min"), F.max(col_a).alias("a_max"),
                   F.min(col_b).alias("b_min"), F.max(col_b).alias("b_max"),
                   F.floor(F.lit(1000000) * area / domain)
                   .cast("long").alias("span_ppm")))

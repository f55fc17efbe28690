"""Distinct-count operators (SURVEY.md §2.4, A6/A7).

The reference computes hourly unique visitors two ways: an exact
in-memory ``Set[Long]`` per window (``network-flow-analysis/.../
UniqueVisitor.scala:71-83``) and a hand-rolled 3-hash Bloom filter over
Redis bitmaps for scale (``UvWithBloomFilter.scala:103-121``). Spark
replaces both with built-ins:

* exact — ``countDistinct`` (partial aggregation dedupes before the
  shuffle; no driver-side set);
* approximate — ``approx_count_distinct`` (HyperLogLog++, sub-linear
  state with a *quantified* error bound, strictly better-understood than
  the reference's Bloom-probe scheme, which undercounts by design once
  the bitmap saturates).

At 100 TB the exact variant still works because the dedupe happens
distributed under the (window, user) grouping; the HLL variant is the
recommended path since its state is O(1) per window regardless of
cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .windows import _window_bounds


def windowed_distinct(df: DataFrame, ts_col: str, duration: str,
                      id_col: str, out_col: str = "uv") -> DataFrame:
    """A6: exact distinct count per tumbling window."""
    agg = df.groupBy(F.window(ts_col, duration)).agg(
        F.countDistinct(id_col).alias(out_col))
    return _window_bounds(agg)


def sliding_windowed_distinct(df: DataFrame, ts_col: str, duration: str,
                              slide: str, id_col: str,
                              out_col: str = "uv") -> DataFrame:
    """Exact distinct count per SLIDING window (e.g. 7-day WAU advancing
    daily). The window explode is map-side (duration/slide copies per
    row); the distinct is one exchange on (window, id) + final count."""
    agg = df.groupBy(F.window(ts_col, duration, slide)).agg(
        F.countDistinct(id_col).alias(out_col))
    return _window_bounds(agg)


def windowed_approx_distinct(df: DataFrame, ts_col: str, duration: str,
                             id_col: str, rsd: float = 0.01,
                             out_col: str = "uv_approx") -> DataFrame:
    """A7: HLL++ distinct count per tumbling window (reference's Bloom)."""
    agg = df.groupBy(F.window(ts_col, duration)).agg(
        F.approx_count_distinct(id_col, rsd).alias(out_col))
    return _window_bounds(agg)

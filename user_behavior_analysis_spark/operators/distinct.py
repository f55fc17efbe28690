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


def kmv_pair_overlap(sk: DataFrame, nd: DataFrame, k: int,
                     domain: int) -> DataFrame:
    """Pairwise day-overlap matrix from KMV sketches — the estimator
    core of the ``kmv_day_overlap`` registry query, factored out
    (round 9, VERDICT r8 #3) so the PERSISTED sketch table
    (``streaming.jobs.kmv_rollup_sink``) can answer the same pair
    question with zero fact rescan. Inputs: ``sk`` = (day, h) — each
    day's k smallest distinct hashes; ``nd`` = (day, n) — the per-day
    count column reported alongside (exact distinct-hash counts in the
    registered query; the KMV estimate when serving from sketches,
    where exact counts no longer exist). The union/jaccard/intersect
    estimators depend ONLY on the sketch rows, so a sketch-served
    matrix is bit-identical to the from-facts build on those columns
    (pinned in tests).

    Everything here is |days|- and |days|²-bounded: the day-pair cross
    is a bounded BNLJ over two |days|-row aggregates, the sketch
    relation broadcasts into it, and the estimators are integer
    floor-division arithmetic (order-free, engine-exact)."""
    from .topn import top_n_per_group
    a = nd.select(F.col("day").alias("day_a"), F.col("n").alias("n_a"))
    b = nd.select(F.col("day").alias("day_b"), F.col("n").alias("n_b"))
    dp = a.join(b, F.col("day_a") < F.col("day_b"))  # |days|^2 bounded
    pairs = dp.select("day_a", "day_b")
    ur = (pairs.join(F.broadcast(sk), sk.day == F.col("day_a"))
               .select("day_a", "day_b", "h")
          .unionByName(
              pairs.join(F.broadcast(sk), sk.day == F.col("day_b"))
                   .select("day_a", "day_b", "h")))
    uh = (ur.groupBy("day_a", "day_b", "h")
            .agg(F.count(F.lit(1)).alias("sides")))
    m = top_n_per_group(uh, ["day_a", "day_b"], [F.asc("h")],
                        n=k, rank_col="rk")
    agg = (m.groupBy("day_a", "day_b")
             .agg(F.count(F.lit(1)).alias("u"),
                  F.max("h").alias("tau"),
                  F.sum(F.when(F.col("sides") == 2, 1).otherwise(0))
                   .alias("common")))
    est = agg.selectExpr(
        "day_a", "day_b",
        f"CAST(CASE WHEN u < {k} THEN u "
        f"     ELSE CAST({k - 1} AS DECIMAL(38,0)) * {domain} "
        f"          div tau END AS BIGINT) AS union_est",
        "CAST((common * 1000000) div u AS BIGINT) AS jaccard_scaled",
        f"CAST(CASE WHEN u < {k} THEN common "
        f"     ELSE (CAST((common * 1000000) div u AS DECIMAL(38,0)) "
        f"           * (CAST({k - 1} AS DECIMAL(38,0)) "
        f"              * {domain} div tau)) div 1000000 "
        f"     END AS BIGINT) AS inter_est")
    return (dp.join(est, ["day_a", "day_b"])
              .select("day_a", "day_b", "n_a", "n_b",
                      "union_est", "jaccard_scaled", "inter_est"))

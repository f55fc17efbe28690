"""Batch CEP pattern operators (SURVEY.md §2.6, J3-J6).

The reference uses Flink CEP for two pattern shapes; both have exact
declarative batch equivalents (the streaming stateful versions live in
``streaming/stateful.py``):

* **strict pair** (`begin("fail").next("fail").within(t)`,
  ``login-fail-detect/.../LoginFailWithCep.scala:50-57``): two strictly
  consecutive matching events on one key within ``t``. Batch: ``lag``
  over (key, event-time) + filter — strict contiguity is exactly
  "previous row in the per-key order".
* **followed-by with timeout** (`begin("create").followedBy("pay")
  .within(t)` + timeout side output, ``order-pay-detect/.../
  OrderTimeout.scala:50-64``): per key, a create event and the first
  later pay event; matched within ``t`` → success, else timeout. Batch:
  conditional aggregation per key + CASE.

Note: the reference has two hand-rolled variants with bugs
(``LoginFail.scala:86`` inverts the gap comparison;
``OrderTimeoutWithoutCep.scala:79`` arms the timer from default state
0). We implement the intended semantics — the CEP variants, which are
internally consistent (SURVEY.md §5).

The generalized "N fails in T seconds" (the reference's commented
``LoginFail.scala:103-118`` variant) is ``consecutive_count_ge``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def strict_pair(df: DataFrame, key: str, ts_col: str, flag,
                within_s: int) -> DataFrame:
    """J5: rows where this event and the strictly-previous event on the
    same key both satisfy ``flag`` (a Column) and are ≤ within_s apart.

    Returns key, first/last event times (epoch sec) of the pair.
    Deterministic: per-key order is (ts, tiebreak on all lag inputs
    comes from ts uniqueness in the fixture; add an id to ``ts_col``
    ordering upstream if ts can tie).
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    flagged = df.withColumn("_is_match", flag)
    paired = (
        flagged
        .withColumn("_prev_match", F.lag("_is_match").over(w))
        .withColumn("_prev_ts", F.lag(ts_col).over(w))
    )
    return (
        paired
        .where(F.col("_is_match") & F.col("_prev_match")
               & (F.col(ts_col).cast("long") - F.col("_prev_ts").cast("long")
                  <= within_s))
        .select(
            F.col(key),
            F.col("_prev_ts").cast("long").alias("first_fail"),
            F.col(ts_col).cast("long").alias("last_fail"),
        )
    )


def consecutive_count_ge(df: DataFrame, key: str, ts_col: str, flag,
                         n: int, within_s: int) -> DataFrame:
    """Generalized J6: ≥ n consecutive flag events within within_s.

    Run-length encode per key (cumulative count of non-matches =
    run id), then aggregate runs; a run qualifies if it has ≥ n events
    and its first n events span ≤ within_s. Emits one row per
    qualifying run with the run's first/last event times.
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    runs = (
        df.withColumn("_m", flag.cast("int"))
          .withColumn("_run", F.sum(1 - F.col("_m")).over(w))
          .where(F.col("_m") == 1)
    )
    agg = (
        runs.groupBy(key, "_run")
        .agg(F.count(F.lit(1)).alias("fail_cnt"),
             F.min(F.col(ts_col).cast("long")).alias("first_fail"),
             F.max(F.col(ts_col).cast("long")).alias("last_fail"))
        .where((F.col("fail_cnt") >= n)
               & (F.col("last_fail") - F.col("first_fail") <= within_s))
    )
    return agg.drop("_run")


def followed_by_with_timeout(df: DataFrame, key: str, ts_col: str,
                             begin_flag, follow_flag,
                             within_s: int) -> DataFrame:
    """J3/J4: per key, earliest begin event and first follow event at or
    after it; classify matched-in-time / matched-late / timed-out.

    Output: key, create_ts, pay_ts (epoch sec; -1 when absent), status ∈
    {'payed successfully', 'payed but already timeout', 'timeout'} —
    the reference's OrderResult messages (OrderTimeout.scala:80,91;
    OrderTimeoutWithoutCep.scala:90-95).

    Scale shape: two-pass conditional aggregation — pass 1 takes the
    per-key min begin time (O(1) agg state); pass 2 joins the pay events
    against that one-row-per-key relation and takes the conditional min
    pay ≥ create (again O(1) agg state). No per-key array is ever
    materialized, so a power-law hot key with millions of follow events
    streams through the aggregation buffer instead of collecting into it.
    """
    ts_l = F.col(ts_col).cast("long")
    begins = (
        df.where(begin_flag)
          .groupBy(key).agg(F.min(ts_l).alias("create_ts"))
    )
    pays = df.where(follow_flag).select(F.col(key), ts_l.alias("_pay_ts"))
    per_key = (
        begins.join(pays, on=key, how="left")
        .groupBy(key, "create_ts")
        .agg(F.min(F.when(F.col("_pay_ts") >= F.col("create_ts"),
                          F.col("_pay_ts"))).alias("_first_pay"))
    )
    return (
        per_key.withColumn("pay_ts", F.coalesce(F.col("_first_pay"), F.lit(-1)))
        .withColumn(
            "status",
            F.when(F.col("pay_ts") < 0, F.lit("timeout"))
             .when(F.col("pay_ts") - F.col("create_ts") <= within_s,
                   F.lit("payed successfully"))
             .otherwise(F.lit("payed but already timeout")))
        .select(key, "create_ts", "pay_ts", "status")
    )

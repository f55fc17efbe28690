"""Event-time window aggregations (SURVEY.md §2.4, A1/A5/A9-A11).

The reference hand-builds each window job from a keyBy + WindowAssigner +
incremental AggregateFunction + WindowFunction (e.g. reference
``hot-item-analysis/.../HotItems.scala:78-82``). In Spark the whole
stack is one ``groupBy(window(...), keys).agg(...)`` — Catalyst plans
partial/final HashAggregate around a single hash exchange, which is the
incremental-aggregation optimization the reference wrote by hand (A2)
plus map-side combine it never had.

Window bounds are returned as epoch-second BIGINT columns
(``window_start`` / ``window_end``): timestamps are epoch-absolute
internally, so the cast is timezone-proof and hash-stable against the
DuckDB oracle.

Scale note: sliding windows multiply each row by duration/slide
(``window()`` physically explodes). At 100 TB keep that factor bounded
(≤ ~12 here) and rely on partial aggregation to collapse rows before the
shuffle — the exchange carries one row per (window × key), not per event.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _window_bounds(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("window_start", F.col("window.start").cast("bigint"))
          .withColumn("window_end", F.col("window.end").cast("bigint"))
          .drop("window")
    )


def windowed_agg(df: DataFrame, ts_col: str, duration: str,
                 slide: str | None = None,
                 keys: Sequence[str] = (),
                 aggs: Sequence[Column] | None = None) -> DataFrame:
    """Tumbling (slide=None) or sliding event-time window aggregation.

    Covers A1 (1h/5m by item), A5 (1h tumble PV), A9 (1h/10s global),
    A10 (1h/10s by channel+behavior), A11 (1h/10m by province).
    """
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("cnt")]
    win = F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    grouped = df.groupBy(win, *keys).agg(*aggs)
    return _window_bounds(grouped)


def sliding_oracle_from(table_expr: str, ts_col: str, duration_s: int,
                        slide_s: int, where: str = "TRUE") -> str:
    """DuckDB FROM-fragment replicating Spark's sliding-window explode.

    Spark assigns a row to every window ``w`` with ``w ≡ 0 (mod slide)``
    and ``w <= ts < w + duration`` (epoch-aligned). The fragment yields
    ``window_start`` / ``window_end`` epoch-second BIGINTs per input row;
    compose with GROUP BY in the caller's SQL.
    """
    n = -(-duration_s // slide_s)  # ceil: max windows a row can fall in
    return f"""
      (SELECT e.*,
              (CAST(floor(epoch(e.{ts_col}) / {slide_s}) AS BIGINT) * {slide_s}
               - g.i * {slide_s}) AS window_start,
              (CAST(floor(epoch(e.{ts_col}) / {slide_s}) AS BIGINT) * {slide_s}
               - g.i * {slide_s} + {duration_s}) AS window_end
       FROM {table_expr} e
       CROSS JOIN (SELECT unnest(range({n})) AS i) g
       WHERE ({where})
         AND epoch(e.{ts_col}) >= (CAST(floor(epoch(e.{ts_col}) / {slide_s}) AS BIGINT) * {slide_s} - g.i * {slide_s})
         AND epoch(e.{ts_col}) <  (CAST(floor(epoch(e.{ts_col}) / {slide_s}) AS BIGINT) * {slide_s} - g.i * {slide_s} + {duration_s}))
    """


def tumbling_oracle_start(ts_col: str, duration_s: int) -> str:
    """DuckDB expression for Spark's tumbling window_start (epoch sec)."""
    return f"CAST(floor(epoch({ts_col}) / {duration_s}) AS BIGINT) * {duration_s}"

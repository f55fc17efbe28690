"""Per-group top-N ranking (SURVEY.md §2.5, K1/K2).

The reference implements windowed top-N as a KeyedProcessFunction that
buffers every ItemViewCount of a window in ListState, fires an
event-time timer at window_end+1, sorts the buffer and takes N
(reference ``hot-item-analysis/.../HotItems.scala:132-175``). Batch/
micro-batch Spark expresses the same thing declaratively: rank over a
window partitioned by the group key, keep ``rank <= n`` — no buffered
state, and Catalyst pushes the ranking into a single sort per partition
group (``WindowGroupLimit`` keeps only N rows per key pre-shuffle in
Spark 3.5+/4.x, so the exchange carries O(groups × N), not O(rows)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_n_per_group(df: DataFrame, partition_keys: Sequence[str],
                    order_by: Sequence[Column], n: int,
                    rank_col: str = "rn") -> DataFrame:
    """Deterministic top-N: pass a full tiebreak in ``order_by`` so batch,
    streaming-foreachBatch, and the SQL oracle agree on ties."""
    w = Window.partitionBy(*partition_keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
          .where(F.col(rank_col) <= n)
    )

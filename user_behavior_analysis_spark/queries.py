"""Query registry: every implemented operator as a (Spark, oracle-SQL) pair.

Each entry re-expresses one reference analysis (SURVEY.md §2) over the
driver testdata. The ``events`` table stands in for the reference's six
event-stream fixtures (FIXTURES.md): ``event_type`` plays the behavior
domain, ``props`` (JSON) carries per-fixture extras like item id.

Conventions (driver contract, __spark_entry__.py):
* identical column names + aliases on both sides;
* window bounds and event times as epoch-second BIGINTs (tz-proof);
* counts BIGINT both sides; DuckDB integer sums cast (HUGEINT → BIGINT);
* rank/row_number cast to INTEGER in DuckDB (Spark emits int32);
* deterministic tiebreaks on every ranking/limit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.topn import top_n_per_group
from .operators.windows import sliding_oracle_from, tumbling_oracle_start, windowed_agg
from .session import tune
from .sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped
    return deco


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# K1/A1/A2/A4 — HotItems: top-5 items per 1h window sliding every 5 min.
# Reference: hot-item-analysis/.../HotItems.scala:78-84,97-105,126-175.
# 'pv' behavior ≙ event_type 'view'; item id ≙ props.k (FIXTURES.md §1).
# ---------------------------------------------------------------------------

_HOT_ITEMS_ORACLE = f"""
WITH pv AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS item_id, ts
  FROM events WHERE lower(event_type) = 'view'
), exploded AS (
  SELECT * FROM {sliding_oracle_from('pv', 'ts', 3600, 300)}
), counts AS (
  SELECT window_start, window_end, item_id, COUNT(*) AS cnt
  FROM exploded GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY window_start ORDER BY cnt DESC, item_id) AS INTEGER) AS rn
  FROM counts
)
SELECT window_start, window_end, item_id, cnt, rn FROM ranked WHERE rn <= 5
"""


@query("hot_items_topn", _HOT_ITEMS_ORACLE)
def hot_items_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hot items per sliding hour — the reference flagship.

    Plan shape at scale: scan (props/ts/event_type pruned+filtered at
    parquet) → window explode (×12) → partial count → single hash
    exchange on (window, item) → final count → per-window top-N via
    WindowGroupLimit (only 5 rows/window survive to the rank shuffle).
    """
    pv = (
        _events(spark, sf_dir)
        .where(F.lower("event_type") == "view")
        .select(
            F.get_json_object("props", "$.k").cast("int").alias("item_id"),
            "ts",
        )
    )
    agg = windowed_agg(pv, "ts", "1 hour", "5 minutes", keys=["item_id"],
                       aggs=[F.count(F.lit(1)).alias("cnt")])
    top = top_n_per_group(agg, ["window_start"],
                          [F.desc("cnt"), F.asc("item_id")], n=5)
    return top.select("window_start", "window_end", "item_id", "cnt", "rn")

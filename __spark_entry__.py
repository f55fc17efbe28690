"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hot-items query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry from
``user_behavior_analysis_spark.queries`` (one entry per implemented
operator from SURVEY.md §2, each aliased identically to its oracle SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from user_behavior_analysis_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["hot_items_topn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)

"""SparkSession construction and per-session tuning.

Two concerns:

* ``get_spark`` — build a tuned local session for tests/bench.
* ``tune`` — apply the runtime-settable confs we rely on to a session we
  did NOT build (the correctness driver hands us its own session); only
  touches confs that are legal to set at runtime.

Scale posture: on a real cluster the static confs (AQE, Kryo, shuffle
compression) come from spark-defaults; everything here degrades
gracefully to that case.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session that runs our queries.
# - UTC session timezone: the DuckDB oracle compares timestamp values as
#   UTC-naive; Spark timestamps are session-TZ (guide: pitfalls).
# - Adaptive execution: runtime partition coalescing + skew-join splitting,
#   the main line of defense at 100 TB where static tuning is impossible.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # testdata events.parquet stores ts as TIMESTAMP(NANOS); Spark has no
    # nanos timestamp — read as long and convert in sources.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf locked down on some deployments - keep going
            pass
    return spark


def get_spark(app_name: str = "user-behavior-analysis-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a tuned session.

    Local mode uses ``$SPARK_GRAFT_CPUS`` threads (default all cores) and
    sizes shuffle partitions to the core count — the default 200 is wrong
    in both directions (guide: pitfalls). On a cluster the master/mem
    settings are ignored in favor of the deploy environment.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return tune(builder.getOrCreate())

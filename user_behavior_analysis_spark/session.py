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
import tempfile

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session that runs our queries.
# - UTC session timezone: the DuckDB oracle compares timestamp values as
#   UTC-naive; Spark timestamps are session-TZ (guide: pitfalls).
# - Adaptive execution: runtime partition coalescing + skew-join splitting,
#   the main line of defense at 100 TB where static tuning is impossible.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # testdata timestamps are parquet TIMESTAMP(isAdjustedToUTC=false);
    # read them as session-TZ TimestampType (UTC above), NOT TIMESTAMP_NTZ:
    # NTZ cannot cast to BIGINT, and every query/oracle pair compares
    # epoch-second longs. load_table also casts defensively in case this
    # conf is locked down.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # older testdata generations stored ts as TIMESTAMP(NANOS); harmless
    # where unsupported — sources.load_table converts the long if seen.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Off-heap RocksDB-backed streaming state (SURVEY §4 posture). The
    # default HDFSBackedStateStoreProvider keeps every version of every
    # key's state on the executor heap — fine at test scale, an OOM
    # driver at 100x state (per-user state over unbounded key spaces).
    # RocksDB spills to local disk and bounds memory via block cache.
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    # changelog checkpointing: upload per-batch deltas instead of full
    # RocksDB snapshots — the recommended production setting.
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
        "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-built session and
    ship this package to the executors (pandas-UDF closures reference
    module-level functions, which pickle by reference — workers must be
    able to import the package)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf locked down on some deployments - keep going
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """addPyFile a zip of user_behavior_analysis_spark (once per SC)."""
    sc = spark.sparkContext
    if getattr(sc, "_uba_pkg_shipped", False):
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(),
                         f"uba_spark_pkg_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    try:
        sc.addPyFile(zpath)
        sc._uba_pkg_shipped = True
    except Exception:
        pass


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

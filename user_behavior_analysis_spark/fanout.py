"""Scale-adaptive map-side fan-out.

The test parquet files are single-row-group, so a scan yields ONE input
partition and every map-heavy pipeline stage (tokenize → explode →
hash → partial aggregate) runs on one core until the first shuffle.
``maxPartitionBytes``/``minPartitionNum`` cannot split a row group, so
the only way to parallelize that stage is an explicit round-robin
exchange of the (projected, narrow) input.

``fan_out`` adds that exchange ONLY when the input has fewer partitions
than the cluster's default parallelism — i.e. exactly the small-scan
case. At production scale the scan already carries >= one partition per
core and the function is an identity: zero plan change, no added
shuffle. This is the inverse of AQE partition coalescing — a floor on
map parallelism where AQE only provides a ceiling — and is applied
selectively at operator entries whose per-row map work is expensive
(tokenization, shingling, vector featurization); for cheap columnar
scans the exchange costs more than the single-task map (measured:
lineitem full-scan agg 0.24 s single-task vs 0.97 s through a
repartition of all 16 columns), so plain aggregation queries do NOT
fan out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: A/B toggle for candidate optimizations under measurement
#: (scripts/ab_patch.py): candidate code keeps both paths behind
#: ``ab_on("<tag>")`` until the interleaved A/B lands, then the losing
#: path is deleted. Always empty in production.
AB_DISABLE: set[str] = set()


def ab_on(tag: str) -> bool:
    return tag not in AB_DISABLE


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across ``defaultParallelism`` partitions iff it
    currently has fewer — a no-op on any production-sized scan. Call it
    AFTER projecting to the columns the map stage needs (guide §2.3:
    project before the exchange), so the added exchange carries narrow
    rows. Results are unchanged: every consumer is partition-layout
    independent (hash-oracled), and Spark's sort-before-repartition
    keeps the round-robin deterministic under task retry."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # exotic plan with no RDD translation - leave as is
        return df
    return df.repartition(target) if cur < target else df

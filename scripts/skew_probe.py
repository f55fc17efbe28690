"""Skew evidence at bench scale (VERDICT r2 item 8).

Three probes, all at sf0.1-comparable sizes, printed as one JSON blob
for BASELINE.md:

1. salted-join partition placement at 1.2M fact rows (100x the unit
   fixture): observed per-shuffle-partition row counts for the plain
   key vs the salted key — the hot key must go from 1 partition holding
   ~50% of rows to an even spread.
2. AQE skew-join on the same fixture: run a sort-merge join with
   spark.sql.adaptive.skewJoin thresholds low enough to trigger, then
   read ``skew=true`` out of the executed plan — demonstrating the
   built-in path the salted join backstops.
3. MinHash-LSH band self-join on documents at sf0.1: bucket-size
   distribution before the ``max_bucket`` cap, rows the cap prunes, and
   the candidate-pair count — showing the cap bounds the quadratic
   blow-up of degenerate (boilerplate) buckets at real corpus scale.

Run: python scripts/skew_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from user_behavior_analysis_spark.operators.joins import salted_join  # noqa: E402
from user_behavior_analysis_spark.sources import load_table  # noqa: E402

N_FACTS = 1_200_000
N_KEYS = 100
SHUFFLE_PARTS = 32


def partition_histogram(df, key_cols):
    """Row count per shuffle partition after hash-partitioning on key_cols."""
    rows = (df.repartition(SHUFFLE_PARTS, *key_cols)
              .withColumn("pid", F.spark_partition_id())
              .groupBy("pid").count().collect())
    counts = sorted((r["count"] for r in rows), reverse=True)
    total = sum(counts)
    return {
        "partitions_nonempty": len(counts),
        "max_rows": counts[0],
        "median_rows": counts[len(counts) // 2],
        "max_share_pct": round(100.0 * counts[0] / total, 1),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .appName("skew_probe")
             .config("spark.sql.shuffle.partitions", str(SHUFFLE_PARTS))
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "n_facts": N_FACTS}

    # -- probe 1: placement, plain vs salted ---------------------------------
    hot = spark.range(N_FACTS // 2).select(
        F.lit(1).alias("k"), F.col("id").alias("payload"))
    cold = spark.range(N_FACTS // 2).select(
        (F.col("id") % (N_KEYS - 1) + 2).alias("k"),
        F.col("id").alias("payload"))
    facts = hot.union(cold).persist()
    facts.count()
    out["plain_partitioning"] = partition_histogram(facts, ["k"])
    buckets = 8
    salted = facts.withColumn(
        "salt", (F.abs(F.hash("payload")) % buckets))
    out["salted_partitioning"] = partition_histogram(salted, ["k", "salt"])
    out["salt_buckets"] = buckets

    # -- probe 2: AQE skew-join handles the same key -------------------------
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    dim = spark.range(1, N_KEYS + 2).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dval"))
    joined = facts.hint("merge").join(dim, "k")
    # execute the DataFrame's OWN plan tree (count() would spawn a new
    # QueryExecution and leave this one isFinalPlan=false)
    n_joined = joined._jdf.queryExecution().executedPlan().execute().count()
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    out["aqe_skew_join"] = {
        "joined_rows": n_joined,
        "plan_marks_skew": "SortMergeJoin(skew=true)" in final_plan,
        "aqe_read_skewed": "coalesced and skewed" in final_plan,
    }
    # salted result must agree with the plain join
    n_salted = salted_join(facts, dim, "k", buckets=buckets).count()
    out["salted_join_rows_match"] = (n_salted == n_joined)
    facts.unpersist()

    # -- probe 3: LSH band bucket distribution at sf0.1 ----------------------
    from user_behavior_analysis_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_signatures)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    sig = minhash_signatures(docs, "text", "doc_id")
    rows_per = 12 // 4
    band_cols = []
    for b in range(4):
        parts = [F.col(f"mh{b * rows_per + r}").cast("string")
                 for r in range(rows_per)]
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  F.md5(F.concat_ws("_", *parts)).alias("bh")))
    bucket_sizes = (
        sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb"))
           .groupBy(F.col("bb.band"), F.col("bb.bh"))
           .agg(F.count(F.lit(1)).alias("n")))
    cap = 1000
    stats = bucket_sizes.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("n").alias("max_bucket"),
        F.expr("percentile(n, 0.5)").alias("median_bucket"),
        F.sum(F.when(F.col("n") > cap, F.col("n"))).alias("rows_over_cap"),
        F.sum(F.when(F.col("n") > 1, F.col("n") * (F.col("n") - 1) / 2)
              ).alias("pairs_uncapped")).collect()[0]
    n_pairs = minhash_lsh_pairs(docs, "text", "doc_id",
                                max_bucket=cap).count()
    out["lsh_bands_sf"] = {
        "docs": n_docs,
        "buckets": stats["buckets"],
        "max_bucket": stats["max_bucket"],
        "median_bucket": float(stats["median_bucket"]),
        "rows_over_cap": int(stats["rows_over_cap"] or 0),
        "pairs_if_uncapped_upper": int(stats["pairs_uncapped"] or 0),
        "candidate_pairs_emitted": n_pairs,
        "max_bucket_cap": cap,
    }

    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()

"""Sinks and multi-output splitting (SURVEY.md §2.1 S5/S6, §2.7 T2).

The reference's sinks are ``print()`` (S5) and a Redis bitmap/hash
writer (S6, ``UvWithBloomFilter.scala:136-156``). Here: console/memory
for dev parity, parquet/kafka for real pipelines, and ``split_by_tag``
— the DataFrame equivalent of Flink side outputs (one tagged plan,
N filtered readers; Catalyst shares the upstream subplan when the
consumer materializes them in one action via ``foreachBatch``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def split_by_tag(df: DataFrame, tag_col: str = "tag",
                 tags: tuple[str, ...] = ()) -> dict[str, DataFrame]:
    """Side-output split: one tagged DataFrame → {tag: filtered view}.

    ``tags`` is REQUIRED: side-output tags are a static property of the
    producing operator (the reference declares its OutputTags at compile
    time, ``TxMatchDetect.scala:60-63``), so discovering them with a
    distinct+collect job would both hide a driver-side action in a sink
    helper and be illegal on streaming plans. Callers pass the tag set
    their operator emits.
    """
    if not tags:
        raise ValueError(
            "split_by_tag requires explicit tags — the tag vocabulary is "
            "a static property of the producing operator; discovering it "
            "via distinct().collect() is a hidden driver action and "
            "impossible on streaming plans")
    return {t: df.where(F.col(tag_col) == t).drop(tag_col) for t in tags}


def write_bucketed(df: DataFrame, table: str, keys: tuple[str, ...],
                   buckets: int, sort_cols: tuple[str, ...] | None = None,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table —
    the co-located-join primitive for repeated fact⋈fact joins.

    Two tables bucketed by the same keys into the same bucket count join
    WITHOUT any Exchange: each scan's output partitioning already
    satisfies the join's distribution requirement, so at 100 TB the
    shuffle that dominates a fact-fact join is paid once at write time
    and amortized over every subsequent join/aggregation on those keys
    (see SCALING.md). ``path`` makes the table external (data at
    ``path``, bucketing metadata in the session catalog); omitted, the
    table lands in the warehouse dir.

    Bucketing is a catalog property, so readers must come through
    ``spark.table(table)`` — a raw ``spark.read.parquet(path)`` sees the
    files but not the bucket spec.
    """
    w = (df.write.format("parquet").mode(mode)
           .bucketBy(buckets, *keys).sortBy(*(sort_cols or keys)))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_console(df: DataFrame, label: str = "", num_rows: int = 20,
                  mode: str = "append") -> StreamingQuery | None:
    """S5 print sink: ``show()`` for batch, console stream otherwise.
    ``label`` mirrors the reference's print prefixes (HotItems.scala:87).
    """
    if df.isStreaming:
        return (df.writeStream.format("console").outputMode(mode)
                .option("numRows", num_rows)
                .queryName(label or "console").start())
    if label:
        print(f"=== {label} ===")
    df.show(num_rows, truncate=False)
    return None


def write_parquet(df: DataFrame, path: str, partition_by: tuple[str, ...] = (),
                  checkpoint: str | None = None,
                  mode: str = "append") -> StreamingQuery | None:
    """Parquet sink, batch or streaming. ``partition_by`` sets the
    physical layout — at scale partition by a low-cardinality pruning
    key (day, source), never a high-cardinality id."""
    if df.isStreaming:
        w = df.writeStream.format("parquet").option("path", path)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        if partition_by:
            w = w.partitionBy(*partition_by)
        return w.outputMode(mode).start()
    w2 = df.write.mode("overwrite" if mode == "overwrite" else "append")
    if partition_by:
        w2 = w2.partitionBy(*partition_by)
    w2.parquet(path)
    return None


def write_kafka(df: DataFrame, topic: str,
                bootstrap: str = "localhost:9092",
                checkpoint: str | None = None,
                value_builder: Callable[[DataFrame], DataFrame] | None = None,
                ) -> StreamingQuery | None:
    """S7 analog: publish rows to Kafka. ``value_builder`` maps the frame
    to a single ``value`` string column (default: JSON of all columns).
    Requires the Kafka connector jars (not in the test image)."""
    out = (value_builder(df) if value_builder
           else df.select(F.to_json(F.struct(*df.columns)).alias("value")))
    if out.isStreaming:
        w = (out.writeStream.format("kafka")
             .option("kafka.bootstrap.servers", bootstrap)
             .option("topic", topic))
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.start()
    (out.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic).save())
    return None


def write_optimized_layout(df: DataFrame, path: str,
                           partition_by: tuple[str, ...],
                           sort_by: tuple[str, ...],
                           files_per_partition: int = 1,
                           mode: str = "overwrite") -> None:
    """Write parquet with a query-optimized physical layout: directory
    partitioning on pruning keys, a controlled file count per
    directory, and rows SORTED on ``sort_by`` within every file.

    Why each piece matters at 100 TB:

    * ``partitionBy`` dirs → partition pruning: a filter on the
      partition key skips whole directories before any I/O.
    * the repartition on (partition keys, hash(sort keys) % files)
      → compaction: exactly ``files_per_partition`` files per dir
      instead of one shard per upstream task — the small-files problem
      is a metadata DoS on real lakes.
    * ``sortWithinPartitions`` → data skipping: parquet row-group
      min/max stats on the sort keys become tight disjoint ranges, so
      a range predicate prunes row groups inside the files that
      survive partition pruning.

    The combination is the poor-man's Z-order: linear clustering on
    one sort dimension, which is the right call when one predicate
    column dominates (ts, id). Readers need nothing special —
    ``spark.read.parquet(path)`` + filters; Catalyst does the rest
    (assert via PartitionFilters/PushedFilters in the scan node).
    """
    parts = [F.col(c) for c in partition_by]
    file_slot = F.pmod(F.hash(*[F.col(c) for c in sort_by]),
                       F.lit(files_per_partition))
    (df.repartition(*parts, file_slot)
       .sortWithinPartitions(*list(partition_by) + list(sort_by))
       .write.mode(mode).partitionBy(*partition_by).parquet(path))


def write_zorder_layout(df: DataFrame, path: str,
                        cols: tuple[str, str],
                        n_files: int = 64,
                        mode: str = "overwrite") -> None:
    """Write parquet clustered on the Z-order (Morton) curve of two
    integer keys — multi-dimensional data skipping, the step past
    ``write_optimized_layout``'s linear sort.

    Linear clustering makes row-group min/max stats tight on ONE
    column; Z-order interleaves the bits of both keys so every file is
    a small rectangle in (a, b) space and predicates on EITHER column
    prune files and row groups. This is what lakehouse
    ``OPTIMIZE ... ZORDER BY (a, b)`` does; readers need nothing
    special — plain ``spark.read.parquet`` + filters.

    Mechanics: one 1-row bounds aggregate (broadcast back into the
    scan) range-normalizes both keys to 16 bits; the z-value is a pure
    32-term codegen expression; ``repartitionByRange(z)`` makes each
    output file one contiguous z-range (sampled boundaries keep file
    sizes balanced under skew — the writer, unlike the oracle-able
    stats op in operators/layout.py, prefers balance over
    determinism); the within-file sort tightens row-group stats
    further. The helper columns are projected away before the write —
    the layout is invisible in the schema.
    """
    from .operators.layout import BITS, _normalize, zorder_value

    a, b = cols
    bounds = df.agg(F.min(a).alias("_alo"), F.max(a).alias("_ahi"),
                    F.min(b).alias("_blo"), F.max(b).alias("_bhi"))
    z = zorder_value(
        _normalize(F.col(a), F.col("_alo"), F.col("_ahi")),
        _normalize(F.col(b), F.col("_blo"), F.col("_bhi")))
    (df.join(F.broadcast(bounds))
       .withColumn("_z", z)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z", "_alo", "_ahi", "_blo", "_bhi")
       .write.mode(mode).parquet(path))


def write_jsonl(df: DataFrame, path: str,
                partition_by: tuple[str, ...] = (),
                compression: str = "gzip",
                mode: str = "overwrite") -> None:
    """JSON-lines writer (LLM-corpus interchange). Compressed by
    default — JSONL is the one format where the 5-10x gzip ratio on
    text is nearly free against the decode cost downstream."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def upsert_partitioned(batch_df: DataFrame, path: str,
                       keys: tuple[str, ...],
                       partition_col: str) -> None:
    """Key-level upsert into a partitioned parquet serving table — the
    foreachBatch tail that turns an update-mode streaming aggregate
    into a continuously-maintained materialized view without a table
    format.

    Update mode emits only CHANGED keys, so blind dynamic-partition
    overwrite would drop a partition's unchanged keys. This does the
    classic partition-scoped merge instead (what MERGE INTO lowers to):
    read ONLY the touched partitions, anti-join out the keys the batch
    replaces, union the batch, rewrite just those partitions
    (``partitionOverwriteMode=dynamic``).

    The touched-partition collect is bounded by |partitions per
    micro-batch| (windows in flight), not data size. At 100 TB the cost
    per trigger is proportional to the hot partitions — the cold ones
    are never read or written.
    """
    spark = batch_df.sparkSession
    touched = [r[0] for r in
               batch_df.select(partition_col).distinct().collect()]
    if not touched:
        return
    batch_df = batch_df.localCheckpoint(eager=True)  # plan reused 2x
    # Only the first-batch missing-path case may skip the merge. Any
    # OTHER read failure (corrupt footer, schema drift, transient
    # storage error) must propagate so the micro-batch retries —
    # swallowing it would rewrite the touched partitions with only the
    # batch's changed keys, silently dropping the unchanged ones.
    try:
        existing = (spark.read.parquet(path)
                    .where(F.col(partition_col).isin(touched)))
    except AnalysisException as e:
        cond = ""
        get_cond = getattr(e, "getCondition", None) \
            or getattr(e, "getErrorClass", None)
        if get_cond is not None:
            cond = get_cond() or ""
        if "PATH_NOT_FOUND" not in cond and "PATH_NOT_FOUND" not in str(e):
            raise
        merged = batch_df  # first batch: nothing to merge yet
    else:
        keep = existing.join(batch_df.select(*keys).distinct(),
                             list(keys), "left_anti")
        merged = batch_df.unionByName(keep)
    (merged.repartition(F.col(partition_col)).write.mode("overwrite")
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy(partition_col).parquet(path))

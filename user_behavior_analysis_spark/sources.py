"""Sources: parquet testdata, headerless CSV event logs, Kafka, rate.

Maps the reference's source surface (SURVEY.md §2.1, S1-S4) onto Spark
readers. The reference reads headerless comma CSVs with epoch-second
timestamps and silently drops dirty rows (reference
``hot-item-analysis/.../HotItems.scala:57-68``); here the CSV reader
declares an explicit schema (never inferSchema), converts epoch seconds
with ``timestamp_seconds``, and drops rows whose required columns failed
to cast — same policy, but executed JVM-side by the CSV datasource
instead of a per-row try/catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver parquet table. Columnar scan → pushdown + pruning free.

    ``events.ts`` is TIMESTAMP(NANOS) on disk, which Spark reads as a
    nanos LongType under ``spark.sql.legacy.parquet.nanosAsLong``; it is
    converted here with truncating integer division to microseconds —
    the same ns→µs truncation DuckDB applies, so oracle values agree.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            # Parquet TIMESTAMP(isAdjustedToUTC=false) infers as NTZ on
            # Spark 4.1+ unless inferTimestampNTZ is off (session.py).
            # Normalize to session-TZ TimestampType (UTC): NTZ cannot
            # cast to BIGINT, and the whole query surface (and the
            # DuckDB oracle) works in epoch-second longs.
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def read_event_csv(spark: SparkSession, path: str, schema: T.StructType,
                   ts_col: str = "ts",
                   required: tuple[str, ...] | None = None) -> DataFrame:
    """Headerless CSV of one reference event type → typed DataFrame.

    ``schema`` is one of ``schemas.*`` with a TimestampType ``ts_col``;
    on disk that column is epoch seconds (reference parses with
    ``.toLong * 1000`` — HotItems.scala:61). Unparseable numerics become
    NULL under PERMISSIVE mode and the row is dropped, matching the
    reference's log-and-null-out policy (P1/P2 in SURVEY.md §2.2).

    ``required`` restricts which columns trigger the drop (default: all).
    The reference's OrderLog legitimately carries an empty txId on
    create rows (OrderLog.csv:2) — there ``required`` must exclude
    ``tx_id`` or every create event vanishes.
    """
    csv_fields = [
        T.StructField(f.name, T.LongType() if f.name == ts_col else f.dataType)
        for f in schema.fields
    ]
    raw = spark.read.csv(path, schema=T.StructType(csv_fields), mode="PERMISSIVE")
    df = raw.withColumn(ts_col, F.timestamp_seconds(F.col(ts_col)))
    subset = list(required) if required is not None \
        else [f.name for f in schema.fields]
    return df.na.drop(subset=subset)


def read_kafka_stream(spark: SparkSession, topic: str,
                      bootstrap: str = "localhost:9092",
                      starting_offsets: str = "earliest") -> DataFrame:
    """S1: Kafka source (reference HotItems.scala:46-54).

    Returns the raw ``value`` as string, one line per record — feed it to
    ``parse_csv_lines`` with an event schema. Requires the Kafka
    connector jars on the classpath (not in the test image).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("line"))
    )


def parse_csv_lines(lines: DataFrame, schema: T.StructType,
                    ts_col: str = "ts",
                    required: tuple[str, ...] | None = None) -> DataFrame:
    """Parse a ``line: string`` column of headerless CSV into ``schema``.

    ``from_csv`` runs JVM-side; dirty rows null out and are dropped, the
    streaming analog of read_event_csv's policy. ``required`` as in
    ``read_event_csv`` (OrderLog's create rows carry an empty tx_id).
    """
    csv_fields = [
        T.StructField(f.name, T.LongType() if f.name == ts_col else f.dataType)
        for f in schema.fields
    ]
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in csv_fields)
    parsed = lines.select(F.from_csv("line", ddl).alias("r")).select("r.*")
    parsed = parsed.withColumn(ts_col, F.timestamp_seconds(F.col(ts_col)))
    subset = list(required) if required is not None \
        else [f.name for f in schema.fields]
    return parsed.na.drop(subset=subset)


def simulated_marketing_stream(spark: SparkSession,
                               rows_per_second: int = 100) -> DataFrame:
    """S4: the reference's in-process random marketing generator
    (market-analysis/.../source/SimulatedEventSource.scala:19-52) as a
    ``rate`` source + column synthesis: ~`rows_per_second` events/s,
    uniform behavior/channel, monotone wall-clock timestamps.
    """
    behaviors = F.array(*[F.lit(x) for x in
                          ("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")])
    channels = F.array(*[F.lit(x) for x in
                         ("wechat", "weibo", "appstore", "huaweistore")])
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    return rate.select(
        F.sha1(F.concat(F.lit("u"), F.col("value"))).alias("user_id"),
        behaviors[(F.xxhash64("value", F.lit(1)) % 4 + 4) % 4].alias("behavior"),
        channels[(F.xxhash64("value", F.lit(2)) % 4 + 4) % 4].alias("channel"),
        F.col("timestamp").alias("ts"),
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType,
               corrupt_col: str = "_corrupt_record",
               streaming: bool = False) -> DataFrame:
    """JSON-lines corpus reader — the interchange format LLM datasets
    actually ship in. Explicit schema (never inferSchema: inference is
    an extra full scan at 100 TB and non-deterministic under dirty
    data) + PERMISSIVE corrupt-record capture: malformed lines land in
    ``corrupt_col`` with every data field NULL, so the caller chooses
    quarantine vs drop instead of the job dying at row 4 billion.

    Returns the frame WITH the corrupt column; ``jsonl_quarantine``
    splits it.
    """
    full = T.StructType(list(schema.fields)
                        + [T.StructField(corrupt_col, T.StringType())])
    reader = (spark.readStream if streaming else spark.read)
    return (reader.schema(full)
                  .option("mode", "PERMISSIVE")
                  .option("columnNameOfCorruptRecord", corrupt_col)
                  .json(path))


def jsonl_quarantine(df: DataFrame, corrupt_col: str = "_corrupt_record"
                     ) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split of a ``read_jsonl`` frame. Clean rows
    drop the corrupt column; quarantined rows keep ONLY the raw line
    for repair/re-parse.

    The batch frame is cached first: Spark refuses plans whose scan
    references ONLY the corrupt column (QUERY_ONLY_CORRUPT_RECORD_
    COLUMN — the parser never materializes it alone), and the split
    reads the input twice anyway, so the cache is both the documented
    workaround and the cheaper plan.

    Streaming frames (``read_jsonl(streaming=True)``) cannot cache —
    there the quarantine side keeps ALL columns (data fields NULL by
    construction) so the scan's required schema is never corrupt-only,
    and the double scan is accepted (each micro-batch is small)."""
    if df.isStreaming:
        clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
        bad = df.where(F.col(corrupt_col).isNotNull())
        return clean, bad
    df = df.cache()
    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, bad

"""Streaming forms of the window analyses (SURVEY.md §2.3-2.5).

Each reference job's DataStream pipeline maps to: ``readStream`` →
``withWatermark`` (W1-W4: the bounded-out-of-orderness watermarks) →
``groupBy(window(...), keys)`` → sink. The SAME aggregation expressions
as the batch queries are reused, so batch/stream parity is structural,
not re-implemented.

Semantics deltas vs the reference, documented per SURVEY.md §2.4:
* A8's per-element FIRE_AND_PURGE trigger has no micro-batch equivalent;
  ``update`` output mode (one emission per key per micro-batch) is the
  honest mapping.
* W5 allowedLateness (commented out in the reference) maps onto the
  watermark delay itself.

Top-N over a streaming aggregate (K1) is not allowed mid-stream; the
reference's timer-at-window-end trick corresponds to ranking inside
``foreachBatch``, provided here as ``topn_foreach_batch``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.topn import top_n_per_group


def stream_table(spark: SparkSession, path: str, schema,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based streaming source over a parquet DIRECTORY — the
    stand-in for the reference's Kafka/CSV replay sources (S1-S3).
    ``path`` must be a directory (Spark's file stream source rejects a
    bare file as basePath); replay tests stage table files into a tmp
    dir, optionally with ``maxFilesPerTrigger=1`` to force multi-batch
    chopping. Schema is explicit — streaming readers cannot infer."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_count_stream(events: DataFrame, ts_col: str, duration: str,
                          slide: str | None, keys: Sequence[str],
                          watermark: str = "5 seconds") -> DataFrame:
    """A1/A5/A9-A11 streaming: watermarked sliding/tumbling count."""
    win = (F.window(ts_col, duration, slide) if slide
           else F.window(ts_col, duration))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, *keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("window_start", F.col("window.start").cast("bigint"))
        .withColumn("window_end", F.col("window.end").cast("bigint"))
        .drop("window")
    )


def uv_exact_stream(events: DataFrame, ts_col: str, duration: str,
                    id_col: str, watermark: str = "5 seconds",
                    slide: str | None = None,
                    out_col: str = "uv") -> DataFrame:
    """A6 streaming: exact distinct via pre-window dropDuplicates —
    watermark evicts dedupe state once the window closes. With ``slide``
    this is the streaming twin of ``sliding_windowed_distinct`` (the
    7-day WAU shape): the explode multiplies dedupe state by
    duration/slide, which is the honest cost of exact sliding distinct —
    the HLL path (uv_approx_stream) is the cheap alternative."""
    win = (F.window(ts_col, duration, slide) if slide
           else F.window(ts_col, duration))
    deduped = (
        events.withWatermark(ts_col, watermark)
        .select(win.alias("window"), id_col)
        .dropDuplicates(["window", id_col])
    )
    return (
        deduped.groupBy("window").agg(F.count(F.lit(1)).alias(out_col))
        .withColumn("window_start", F.col("window.start").cast("bigint"))
        .withColumn("window_end", F.col("window.end").cast("bigint"))
        .drop("window")
    )


def uv_approx_stream(events: DataFrame, ts_col: str, duration: str,
                     id_col: str, rsd: float = 0.02,
                     watermark: str = "5 seconds") -> DataFrame:
    """A7 streaming: HLL++ in place of the reference's Redis Bloom —
    O(1) state per window (UvWithBloomFilter.scala:103-121)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration))
        .agg(F.approx_count_distinct(id_col, rsd).alias("uv_approx"))
        .withColumn("window_start", F.col("window.start").cast("bigint"))
        .withColumn("window_end", F.col("window.end").cast("bigint"))
        .drop("window")
    )


def bucket_count_stream(events: DataFrame, ts_col: str, slide: str,
                        keys: Sequence[str],
                        watermark: str = "5 seconds") -> DataFrame:
    """Stage 1 of the TWO-LEVEL sliding aggregate: tumbling
    ``slide``-width bucket counts — 1 state row per (key, bucket)
    instead of the native sliding window's duration/slide replicas per
    event (the r6 throughput re-measure put that amplification at 360×
    for the reference's 1 h/10 s shape: ~70-80k ev/s sliding vs 339k
    ev/s tumbling on the same box). Update mode; sink the changed
    buckets with ``upsert_sink`` into a TxTable keyed
    (bucket_start, *keys), then roll any sliding geometry from the
    bucket table with ``sliding_from_buckets`` — the window length is
    a READ-time choice, not baked into stream state."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, slide), *keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bucket_start", F.col("window.start").cast("bigint"))
        .drop("window")
    )


def sliding_from_buckets(buckets: DataFrame, duration_s: int,
                         slide_s: int, keys: Sequence[str],
                         bucket_s: int | None = None) -> DataFrame:
    """Stage 2: roll sliding windows from the bucket table. Each
    bucket feeds the duration_s/slide_s sliding windows that contain
    it — the same explode the batch oracles use, but over BUCKET rows
    (|keys| × span/slide of them), not events, so the amplification is
    over an already-reduced relation. One hash exchange on
    (window_start, keys).

    ``bucket_s`` is the grain the bucket table was built at (defaults
    to ``slide_s`` — the two-level streaming shape where the bucket
    grid IS the slide grid). A FINER bucket table serves COARSER
    geometries too: any (duration, slide) with ``slide_s`` and
    ``duration_s`` whole multiples of ``bucket_s`` tiles exactly in
    buckets (window boundaries land on the bucket grid, so every
    bucket lies wholly inside or wholly outside each window) — one
    finest-grain persisted table answers the 1h/5m flagship, the
    hourly tumbling PV, and any dashboard geometry on the same grid
    with zero fact rescan. Non-tiling geometries are rejected:
    silently flooring would emit windows shorter than requested under
    a window_end label that still claims ``window_start +
    duration_s``."""
    if bucket_s is None:
        bucket_s = slide_s
    if duration_s % bucket_s != 0 or slide_s % bucket_s != 0:
        raise ValueError(
            f"duration_s={duration_s}/slide_s={slide_s} is not a "
            f"multiple of bucket_s={bucket_s}: the {bucket_s}s bucket "
            "table can only roll windows whose length and slide are "
            "whole numbers of buckets")
    # candidate window count per bucket: ceil(duration/slide) slide
    # steps cover every grid window that can contain the bucket
    n = (duration_s + slide_s - 1) // slide_s
    # executor-side alignment check (one modulo per already-reduced
    # bucket row): a bucket whose start isn't on the bucket grid would
    # silently land in the wrong windows. assert_true-as-filter so
    # column pruning can't drop the check.
    aligned = F.assert_true(
        F.col("bucket_start") % bucket_s == 0,
        F.concat(F.lit(f"bucket_start not aligned to bucket_s={bucket_s}: "),
                 F.col("bucket_start").cast("string")))
    # w_hi: the largest slide-grid start <= bucket_start. Fixtures pin
    # ts >= 0 (FIXTURES.md epoch-0 invariant), so plain % is floor.
    w_hi = F.col("bucket_start") - F.col("bucket_start") % slide_s
    exploded = buckets.where(aligned.isNull()).select(
        *keys, "cnt", "bucket_start",
        F.explode(F.sequence(
            w_hi - (n - 1) * slide_s, w_hi,
            F.lit(slide_s))).alias("window_start"))
    # keep only windows that CONTAIN the whole bucket: w <= b (by
    # construction) and b + bucket_s <= w + duration. When bucket_s ==
    # slide_s and duration % slide == 0 every candidate provably
    # passes, so the filter is elided and the plan keeps the pinned
    # round-8 shape.
    if not (bucket_s == slide_s and duration_s % slide_s == 0):
        exploded = exploded.where(
            F.col("bucket_start") + bucket_s
            <= F.col("window_start") + duration_s)
    return (exploded
            .groupBy("window_start", *keys)
            .agg(F.sum("cnt").alias("cnt"))
            .withColumn("window_end",
                        F.col("window_start") + duration_s))


def rules_gate(table, on, apply_fn):
    """foreachBatch tail implementing Flink's BROADCAST-STATE pattern
    on Spark's terms: a small, mutable RULES relation (here a TxTable)
    is re-resolved at EVERY epoch and broadcast-semi-joined against the
    batch, so rule changes committed mid-stream take effect from the
    next micro-batch — no restart, no stale broadcast variable (a
    stream-static join would freeze the file list at plan time; the
    per-epoch snapshot read is what makes the rules dynamic).

    ``on``: join column(s) the rules key on; ``apply_fn(kept_df,
    epoch_id)`` receives the surviving rows. Rules are assumed small
    (broadcast); the batch side never shuffles."""
    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        rules = table.read()
        kept = batch_df.join(F.broadcast(rules), on, "left_semi")
        apply_fn(kept, epoch_id)
    return fn


def ivf_maintenance_stream(feed: DataFrame, index_table, centroids,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           app: str = "ivf_maint",
                           catalog_name: str | None = None):
    """CDC-MAINTAINED ANN INDEX (round 7): keep an IVF posting table
    current from a change feed instead of rebuilding it per batch job.
    Each micro-batch's vectors are assigned to their nearest FROZEN
    centroid map-side (``similarity.ivf_assign`` — pure expressions,
    no model object, no shuffle) and keyed-MERGEd into the index
    TxTable exactly-once (``upsert_sink``'s txn markers). The probe
    path (``similarity.ivf_probe_topk``) reads the table unchanged —
    queries never wait for an index rebuild, and a re-embedded vector
    (same id, new embedding) lands as a key-level upsert.

    Centroids are the FROZEN coarse quantizer: the maintained-index
    contract is assign-only between retrains; a retrain is a full
    rebuild (new table), exactly like production IVF services. At
    100 TB the feed is O(delta) parquet reads, assignment is map-side
    (cells × dim multiply-adds per vector), and the MERGE rewrites
    only files whose key range the delta touches.

    With ``catalog_name`` set, the (frozen centroids, table-read
    loader) pair is registered in ``similarity.ANN_INDEX_CATALOG`` so
    stateless consumers (the registered ``ann_ivf_topk`` query) serve
    this maintained index instead of retraining per call (VERDICT r7
    #1/#3). The loader re-reads the table per call — probes always see
    the latest committed snapshot, never a pinned DataFrame.

    Returns the ``writeStream`` builder (caller adds checkpoint /
    trigger and ``.start()``)."""
    from ..operators.similarity import ivf_assign, register_ivf_index
    from ..tables import upsert_sink

    if catalog_name is not None:
        register_ivf_index(catalog_name, centroids, index_table.read)

    assigned = ivf_assign(
        feed.select(F.col(id_col).alias("c_id"),
                    F.col(vec_col).alias("c_vec")),
        "c_vec", centroids)
    return (assigned.select("c_id", "c_vec", "cell")
            .writeStream.foreachBatch(upsert_sink(index_table, app=app)))


def bm25_maintenance_stream(feed: DataFrame, fwd, stats, scalars,
                            app: str = "bm25_maint",
                            catalog_name: str | None = None):
    """CDC-MAINTAINED BM25 INDEX (VERDICT r8 #1): keep the forward
    postings / df deltas / corpus scalars current from a documents
    change feed instead of re-tokenizing the corpus per query — the
    retrieval twin of ``ivf_maintenance_stream`` (same classify-then-
    absorb + exactly-once discipline; see
    ``operators.retrieval.bm25_maintenance_sink`` for the per-epoch
    algebra and the additive-before-merge replay proof).

    With ``catalog_name`` set, zero-arg loaders for the three tables
    are registered in ``retrieval.BM25_INDEX_CATALOG`` so the
    stateless registered query (``bm25_topk``) probes this maintained
    index train-free; loaders re-read per call, so probes always see
    the latest committed snapshots.

    Returns the ``writeStream`` builder (caller adds checkpoint /
    trigger and ``.start()``)."""
    from ..operators.retrieval import (bm25_maintenance_sink,
                                       register_bm25_index)

    if catalog_name is not None:
        register_bm25_index(catalog_name, fwd.read, stats.read,
                            scalars.read)
    return feed.writeStream.foreachBatch(
        bm25_maintenance_sink(fwd, stats, scalars, app=app))


def sketch_rollup_sink(table, ts_col: str = "ts", id_col: str = "user_id",
                       lg_k: int = 12, app: str = "uv_sketch"):
    """foreachBatch tail maintaining a MERGEABLE-AGGREGATE TABLE: each
    micro-batch reduces to one Datasketches HLL sketch row per (day,
    epoch) and APPENDS it — no read-modify-write, no per-key merge, one
    blind-append commit per epoch (txn marker makes replays no-ops).
    Correct because HLL union is a monoid: the day's true sketch is the
    union of its partials, taken lazily at READ time
    (``sketch_rollup_estimates``) and physically collapsed on a
    maintenance cadence (``collapse_sketch_rollup``) exactly like
    small-file compaction. This is the production shape for
    distinct-counting at 100 TB: the firehose reduces map-side to
    KB-sized partials, the table stores partials, and every consumer
    (day, week, ad-hoc range) unions what it needs — the fact stream is
    never rescanned.

    Table schema: (day_start long, epoch long, sk binary), keys
    [day_start]. Replayed epochs drain through the noop sink before
    short-circuiting (same reason as tables.upsert_sink: a stateful
    upstream only commits its state if the micro-batch plan runs)."""
    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if table._txn_already_applied(app, epoch_id):
            batch_df.write.format("noop").mode("overwrite").save()
            return
        part = (batch_df
                .select((F.col(ts_col).cast("long")
                         - (F.col(ts_col).cast("long") % 86400))
                        .alias("day_start"), id_col)
                .groupBy("day_start")
                .agg(F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("sk"))
                .withColumn("epoch", F.lit(int(epoch_id))))
        if part.isEmpty():
            return
        table.append(part.select("day_start", "epoch", "sk"),
                     txn_app=app, txn_version=epoch_id)
    return fn


def sketch_rollup_estimates(table) -> DataFrame:
    """Read path of the sketch table: per-day UV estimates from the
    union of that day's partial sketches, plus the period total as
    day_start = -1 — identical output contract to the batch
    ``uv_sketch_rollup`` query. Constant-size exchanges: the table
    holds O(days x epochs-since-collapse) KB rows."""
    daily = (table.read()
             .groupBy("day_start")
             .agg(F.hll_union_agg("sk", F.lit(False)).alias("sk")))
    daily = daily.localCheckpoint(eager=True)
    per_day = daily.select(
        "day_start",
        F.hll_sketch_estimate("sk").cast("long").alias("uv_est"))
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False)))
         .cast("long").alias("uv_est")).select(
        F.lit(-1).cast("long").alias("day_start"), "uv_est")
    return per_day.unionByName(total)


def _collapse_with_retry(table, derive, grain_col: str,
                         max_retries: int = 5) -> int:
    """Concurrency-safe collapse loop shared by every sketch-table
    maintenance job: derive the collapsed relation FROM a pinned
    snapshot version and commit under replace_where's
    ``expected_version`` precondition. Without the precondition, a
    sink appending a new epoch's partials between the derive read and
    the commit would have those rows deleted by the predicate but
    absent from the stale collapsed relation — silent sketch loss
    (latent in every collapse since the first sketch sink; the race
    is reproduced deterministically in tests). On conflict the loop
    re-derives from the fresh snapshot; collapse is idempotent, so
    retries are safe."""
    from ..tables import CommitConflict
    for _ in range(max_retries):
        v = table.latest_version()
        collapsed = derive(table.read(version=v)) \
            .localCheckpoint(eager=True)
        grains = sorted({r[0] for r in
                         collapsed.select(grain_col).distinct()
                         .collect()})
        if not grains:
            return table.latest_version()
        pred = f"{grain_col} IN ({', '.join(str(g) for g in grains)})"
        try:
            return table.replace_where(pred, collapsed,
                                       expected_version=v)
        except CommitConflict:
            continue
    raise CommitConflict("collapse retries exhausted")


def collapse_sketch_rollup(table) -> int:
    """Maintenance: physically union each day's partials into ONE row
    (epoch = -1) in a single atomic replace_where commit over the
    touched days — the monoid-table analog of small-file compaction.
    Estimates are unchanged (union is associative + lossless); read
    cost drops from O(days x epochs) rows to O(days)."""
    return _collapse_with_retry(
        table,
        lambda rows: (rows.groupBy("day_start")
                      .agg(F.hll_union_agg("sk", F.lit(False))
                           .alias("sk"))
                      .withColumn("epoch", F.lit(-1).cast("long"))
                      .select("day_start", "epoch", "sk")),
        "day_start")


def kmv_rollup_sink(table, ts_col: str = "ts", id_col: str = "user_id",
                    k: int = 64, seed: int = 7, app: str = "uv_kmv"):
    """foreachBatch tail persisting PER-DAY KMV SKETCHES (VERDICT r8
    #3 — the intersectable twin of ``sketch_rollup_sink``'s HLL rows):
    each micro-batch reduces to its days' ≤k smallest distinct 60-bit
    id-hashes and APPENDS them as (day, epoch, h) rows — no
    read-modify-write, one blind-append commit per epoch (txn marker
    makes replays no-ops). Correct because KMV min-k union is a lossy-
    truncation-free monoid at read time: the k smallest of a union of
    per-epoch k-smallest partials EQUAL the k smallest over all rows
    (any hash in the true day-sketch is among its own epoch's k
    smallest), so streamed sketches == batch sketches bit-for-bit
    (pinned in tests). Unlike HLL, KMV sketches answer INTERSECTION
    questions — any day-pair/range overlap is served from this table
    with zero fact rescan (``kmv_estimates``).

    Table schema: (day long, epoch long, h long), keys [day]."""
    from ..functions.text import md5_prefix_hash
    from ..operators.topn import top_n_per_group

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if table._txn_already_applied(app, epoch_id):
            batch_df.write.format("noop").mode("overwrite").save()
            return
        du = (batch_df
              .selectExpr(f"CAST({ts_col} AS LONG) div 86400 AS day",
                          id_col)
              .select("day",
                      md5_prefix_hash(F.col(id_col).cast("string"),
                                      seed=seed).alias("h"))
              .distinct())
        part = (top_n_per_group(du, ["day"], [F.asc("h")],
                                n=k, rank_col="rk")
                .select("day", "h")
                .withColumn("epoch", F.lit(int(epoch_id)).cast("long")))
        if part.isEmpty():
            return
        table.append(part.select("day", "epoch", "h"),
                     txn_app=app, txn_version=epoch_id)
    return fn


def kmv_sketches(table, k: int = 64) -> DataFrame:
    """Read path: collapse the per-epoch partials to each day's true
    k-smallest sketch (day, h) — distinct over the partial rows, then
    min-k per day. O(days × epochs-since-collapse × k) rows in, O(days
    × k) out; the facts are never touched."""
    from ..operators.topn import top_n_per_group
    rows = table.read().select("day", "h").distinct()
    return (top_n_per_group(rows, ["day"], [F.asc("h")],
                            n=k, rank_col="rk")
            .select("day", "h"))


def kmv_estimates(table, k: int = 64,
                  domain: int = 1 << 60) -> DataFrame:
    """Day-pair overlap matrix served ENTIRELY from the sketch table —
    the union/jaccard/intersection estimators are bit-identical to the
    from-facts ``kmv_day_overlap`` build (they depend only on sketch
    rows); the per-day n columns are the KMV per-day estimates, since
    exact counts are exactly what the table no longer stores."""
    from ..operators.distinct import kmv_pair_overlap
    sk = kmv_sketches(table, k).localCheckpoint(eager=True)
    nd = (sk.groupBy("day")
            .agg(F.count(F.lit(1)).alias("u"), F.max("h").alias("tau"))
            .selectExpr(
                "day",
                f"CAST(CASE WHEN u < {k} THEN u "
                f"     ELSE CAST({k - 1} AS DECIMAL(38,0)) * {domain} "
                f"          div tau END AS BIGINT) AS n"))
    return kmv_pair_overlap(sk, nd, k, domain)


def collapse_kmv_rollup(table, k: int = 64) -> int:
    """Maintenance: physically collapse each day's partials to the
    k-smallest rows (epoch = -1) in one atomic replace_where commit —
    estimates unchanged (min-k union is associative and read-time
    collapse already takes the same min-k); read cost drops to
    O(days × k) rows."""
    from ..operators.topn import top_n_per_group
    return _collapse_with_retry(
        table,
        lambda rows: (top_n_per_group(
            rows.select("day", "h").distinct(), ["day"],
            [F.asc("h")], n=k, rank_col="rk")
            .select("day", "h")
            .withColumn("epoch", F.lit(-1).cast("long"))
            .select("day", "epoch", "h")),
        "day")


def bottomk_sample_sink(table, ts_col: str = "ts",
                        id_col: str = "event_id",
                        value_col: str = "value",
                        k: int = 128, seed: int = 37,
                        app: str = "value_qsk"):
    """foreachBatch tail persisting PER-DAY BOTTOM-K VALUE SAMPLES —
    the serving state behind ``value_quantile_sketch`` (the fourth
    sketch sink: HLL rows, KMV hashes, det-HLL registers, and now a
    hash-sample carrying a value payload): each micro-batch reduces to
    its days' ≤k smallest (id-hash, value) rows and APPENDS them —
    blind append, txn marker no-ops replays. Min-k union with a
    payload is lossless for the same reason KMV's is (every row of the
    true day sample is inside its own epoch's k smallest), so streamed
    samples == batch samples bit-for-bit and the served quantiles
    match the registered query exactly (pinned in tests).

    Table schema: (day_start long, epoch long, h long, value double),
    keys [day_start]."""
    from ..functions.text import md5_prefix_hash
    from ..operators.topn import top_n_per_group

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if table._txn_already_applied(app, epoch_id):
            batch_df.write.format("noop").mode("overwrite").save()
            return
        src = batch_df.select(
            F.expr(f"CAST({ts_col} AS LONG) - CAST({ts_col} AS LONG) "
                   f"% 86400").alias("day_start"),
            md5_prefix_hash(F.col(id_col).cast("string"),
                            seed=seed).alias("h"),
            F.col(value_col).alias("value"))
        part = (top_n_per_group(src, ["day_start"], [F.asc("h")],
                                n=k, rank_col="rk")
                .select("day_start", "h", "value")
                .withColumn("epoch", F.lit(int(epoch_id)).cast("long")))
        if part.isEmpty():
            return
        table.append(part.select("day_start", "epoch", "h", "value"),
                     txn_app=app, txn_version=epoch_id)
    return fn


def bottomk_samples(table, k: int = 128) -> DataFrame:
    """Read path: collapse per-epoch partials to each day's true
    bottom-k sample (day_start, h, value). The facts are never
    touched; cost is O(days × epochs-since-collapse × k) rows."""
    from ..operators.topn import top_n_per_group
    rows = table.read().select("day_start", "h", "value")
    return (top_n_per_group(rows, ["day_start"], [F.asc("h")],
                            n=k, rank_col="rk")
            .select("day_start", "h", "value"))


def collapse_bottomk_samples(table, k: int = 128) -> int:
    """Maintenance: physically collapse each day's partials to its
    k-smallest rows (epoch = -1) in one atomic replace_where commit —
    served quantiles unchanged (the read path already takes the same
    min-k)."""
    from ..operators.topn import top_n_per_group
    return _collapse_with_retry(
        table,
        lambda rows: (top_n_per_group(
            rows.select("day_start", "h", "value"), ["day_start"],
            [F.asc("h")], n=k, rank_col="rk")
            .select("day_start", "h", "value")
            .withColumn("epoch", F.lit(-1).cast("long"))
            .select("day_start", "epoch", "h", "value")),
        "day_start")


def hll_det_rollup_sink(table, ts_col: str = "ts",
                        id_col: str = "user_id",
                        app: str = "uv_hll_det"):
    """foreachBatch tail persisting PER-DAY DETERMINISTIC-HLL REGISTER
    partials — the third member of the sketch-sink family
    (``sketch_rollup_sink``'s native HLL, ``kmv_rollup_sink``'s min-k
    rows): each micro-batch reduces to its days' (register, max-rho)
    rows and APPENDS them — blind append, one commit per epoch, txn
    marker no-ops replays. Correct under the same monoid-at-read
    argument: register MAX is associative/commutative/idempotent, so
    max-of-per-epoch-maxes == max over all rows, and the served
    estimates are bit-identical to the batch ``uv_hll_det_rollup``
    (pinned in tests). Unlike the native sketch sink, everything here
    is hash-oracle-able integers end to end.

    Table schema: (day_start long, epoch long, idx int, m_reg int),
    keys [day_start]. ≤ 512 rows per (day, epoch) regardless of
    cardinality."""
    from ..operators.distinct import hll_det_registers

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if table._txn_already_applied(app, epoch_id):
            batch_df.write.format("noop").mode("overwrite").save()
            return
        src = batch_df.selectExpr(
            f"CAST({ts_col} AS LONG) - CAST({ts_col} AS LONG) % 86400 "
            f"AS day_start", id_col)
        part = (hll_det_registers(src, ["day_start"], id_col)
                .withColumn("epoch", F.lit(int(epoch_id)).cast("long")))
        if part.isEmpty():
            return
        table.append(part.select("day_start", "epoch", "idx", "m_reg"),
                     txn_app=app, txn_version=epoch_id)
    return fn


def hll_det_registers_read(table) -> DataFrame:
    """Read path: collapse per-epoch register partials to each day's
    true register relation (day_start, idx, m_reg) by MAX. O(days ×
    epochs-since-collapse × 512) rows in, O(days × 512) out; the facts
    are never touched."""
    return (table.read()
                 .groupBy("day_start", "idx")
                 .agg(F.max("m_reg").cast("int").alias("m_reg")))


def hll_det_estimates(table) -> DataFrame:
    """Per-day UV estimates plus the period total (day_start = -1)
    served ENTIRELY from the register table — identical output
    contract to, and bit-identical values with, the batch
    ``uv_hll_det_rollup`` query on the same facts — definitional:
    both call the same ``hll_det_day_and_total``."""
    from ..operators.distinct import hll_det_day_and_total
    return hll_det_day_and_total(hll_det_registers_read(table))


def collapse_hll_det_rollup(table) -> int:
    """Maintenance: physically collapse each day's register partials
    to one MAX-merged relation (epoch = -1) in a single atomic
    replace_where commit — estimates unchanged (max is associative and
    the read path already takes the same max); read cost drops to
    O(days × 512) rows."""
    return _collapse_with_retry(
        table,
        lambda rows: (rows.groupBy("day_start", "idx")
                      .agg(F.max("m_reg").cast("int").alias("m_reg"))
                      .withColumn("epoch", F.lit(-1).cast("long"))
                      .select("day_start", "epoch", "idx", "m_reg")),
        "day_start")


def count_rollup_sink(table, ts_col: str = "ts", slide_s: int = 300,
                      keys: Sequence[str] = ("item_id",),
                      app: str = "hot_buckets"):
    """foreachBatch tail persisting TUMBLING-BUCKET COUNTS — the
    serving-table form of the reference flagship (HotItems.scala:78-84
    keyed 1h/5m count): each micro-batch reduces to its
    (bucket_start, *keys) partial counts and APPENDS them with an
    epoch column — no read-modify-write, one blind-append commit per
    epoch (txn marker makes replays no-ops). Counts are the simplest
    additive monoid, so streamed partials SUM-collapse on read to
    exactly the batch bucket relation, and any sliding geometry whose
    duration tiles the bucket grid is a READ-time choice over this
    table (``topn_from_buckets``) with zero fact rescan — the
    two-level rollup (``bucket_count_stream``/``sliding_from_buckets``)
    argument, made durable. The caller pre-shapes the stream (filter +
    key projection) so one sink body serves any keyed count.

    Table schema: (bucket_start long, *keys, epoch long, cnt long)."""
    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if table._txn_already_applied(app, epoch_id):
            batch_df.write.format("noop").mode("overwrite").save()
            return
        part = (batch_df
                .withColumn(
                    "bucket_start",
                    F.col(ts_col).cast("long")
                    - F.col(ts_col).cast("long") % slide_s)
                .groupBy("bucket_start", *keys)
                .agg(F.count(F.lit(1)).alias("cnt"))
                .withColumn("epoch", F.lit(int(epoch_id)).cast("long")))
        if part.isEmpty():
            return
        table.append(part.select("bucket_start", *keys, "epoch", "cnt"),
                     txn_app=app, txn_version=epoch_id)
    return fn


def bucket_counts(table, keys: Sequence[str] = ("item_id",)) -> DataFrame:
    """Read path: SUM-collapse the per-epoch count partials to the
    true bucket relation (bucket_start, *keys, cnt). O(buckets ×
    epochs-since-collapse) rows in, O(buckets × keys) out; the facts
    are never touched."""
    return (table.read()
                 .groupBy("bucket_start", *keys)
                 .agg(F.sum("cnt").alias("cnt")))


def topn_from_buckets(table, duration_s: int, slide_s: int,
                      keys: Sequence[str] = ("item_id",),
                      n: int = 5, bucket_s: int | None = None) -> DataFrame:
    """Serve the reference flagship (top-N per sliding window) ENTIRELY
    from the persisted bucket table: roll the requested sliding
    geometry with ``sliding_from_buckets`` (which rejects a duration
    that doesn't tile the bucket grid), then rank per window. Output
    contract matches the batch ``hot_items_topn`` / the registered
    ``hot_items_bucket_rollup`` twin: (window_start, window_end,
    *keys, cnt, rn) — bit-identical on the same facts because an
    event's containing windows are exactly its bucket's containing
    windows (the bucket grid IS the slide grid)."""
    win = sliding_from_buckets(bucket_counts(table, keys),
                               duration_s, slide_s, keys,
                               bucket_s=bucket_s)
    top = top_n_per_group(
        win, ["window_start"],
        [F.desc("cnt")] + [F.asc(k) for k in keys], n=n)
    return top.select("window_start", "window_end", *keys, "cnt", "rn")


def collapse_count_rollup(table,
                          keys: Sequence[str] = ("item_id",)) -> int:
    """Maintenance: physically collapse each bucket's count partials
    to one SUMMED row (epoch = -1) in a single atomic replace_where
    commit — served counts unchanged (sum is associative and the read
    path already takes the same sum); read cost drops to O(buckets ×
    keys) rows."""
    return _collapse_with_retry(
        table,
        lambda rows: (rows.groupBy("bucket_start", *keys)
                      .agg(F.sum("cnt").alias("cnt"))
                      .withColumn("epoch", F.lit(-1).cast("long"))
                      .select("bucket_start", *keys, "epoch", "cnt")),
        "bucket_start")


def expire_buckets(table, before_start: int) -> int:
    """Retention for the serving-table lifecycle (append → collapse →
    EXPIRE): atomically drop every bucket row with ``bucket_start <
    before_start`` via an empty-relation replace_where — one commit,
    file-granular copy-on-write, time travel intact (the dropped
    horizon is still readable at older versions until vacuum). At
    100 TB this is what keeps the bucket table O(horizon), not
    O(history): a dashboard that serves the trailing week never pays
    for the year, and the range-partitioned layout means expiry
    rewrites only the files that straddle the cutoff."""
    empty = table.read().limit(0)
    return table.replace_where(f"bucket_start < {int(before_start)}",
                               empty)


def session_window_stream(events: DataFrame, ts_col: str, key: str,
                          gap: str, watermark: str = "5 seconds") -> DataFrame:
    """Streaming sessionization via the native session_window —
    state merges adjacent windows and closes on watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col(key),
                F.col("w.start").cast("bigint").alias("session_start"),
                F.col("w.end").cast("bigint").alias("session_end"),
                "n_events")
    )


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key: str | tuple[str, str],
                         left_ts: str, right_ts: str,
                         lower_s: int, upper_s: int,
                         watermark: str = "5 seconds") -> DataFrame:
    """J1 streaming: stream-stream inner interval join
    (TxMatchByJoin.scala:68-71). Watermarks on BOTH sides plus the time
    bound in the join condition let Spark evict join state once
    ``right_ts`` can no longer fall inside a live left row's interval —
    the same pruning the reference gets from its interval-join state
    cleanup. ``key`` is one column name present on both sides, or a
    (left_name, right_name) pair; all other columns must be disjoint.
    """
    lk, rk = (key, key) if isinstance(key, str) else key
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[lk] == rw[rk])
        & (rw[right_ts] >= lw[left_ts] + F.expr(f"INTERVAL {lower_s} SECOND"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper_s} SECOND"))
    )
    return lw.join(rw, cond, "inner")


def reconcile_stream(left: DataFrame, right: DataFrame,
                     key: str | tuple[str, str],
                     left_ts: str, right_ts: str, within_s: int,
                     watermark: str = "5 seconds",
                     left_only: str = "unmatched_left",
                     right_only: str = "unmatched_right") -> DataFrame:
    """J2 streaming twin: full-outer stream-stream join with a ±within_s
    event-time bound (TxMatchDetect.scala:88-138's matched + two
    side-output channels as one tagged stream).

    The range condition + watermarks on BOTH inputs bound the join
    state: a row's partner must carry an event time within ±within_s, so
    once the other side's watermark passes that horizon the row either
    matched or is emitted as unmatched with the partner columns NULL —
    exactly the reference's timer-driven unmatched side outputs, driven
    by watermark instead of timers. State is O(rows within the horizon),
    not O(stream).

    Returns the joined frame plus a ``tag`` column
    (matched/left_only/right_only); route with ``sinks.split_by_tag``.
    """
    lk, rk = (key, key) if isinstance(key, str) else key
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[lk] == rw[rk])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {within_s} SECOND"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within_s} SECOND"))
    )
    joined = lw.join(rw, cond, "full_outer")
    tag = (
        F.when(rw[rk].isNull(), F.lit(left_only))
         .when(lw[lk].isNull(), F.lit(right_only))
         .otherwise(F.lit("matched"))
    )
    return joined.withColumn("tag", tag)


def ad_stats_pipeline_stream(clicks: DataFrame, threshold: int,
                             window_duration: str = "1 hour",
                             watermark: str = "5 seconds") -> DataFrame:
    """The composed AdStatisticsByGeo topology (reference entry point,
    SURVEY.md §3.2): stateful per-(user, ad) blacklist filter → main-
    stream pass-through → event-time windowed count — two stateful
    operators chained in one streaming plan (supported natively in
    Spark 4's multi-stateful-operator mode; watermark re-attached on the
    stateful output's event time).

    clicks: (user_id, ad_id, ts timestamp). Returns closed-window counts
    of non-blacklisted clicks.
    """
    from .stateful import blacklist_stream
    tagged = blacklist_stream(clicks, threshold)
    main = (
        tagged.where(F.col("tag") == "main")
        .withColumn("ts", F.timestamp_seconds("ts_sec"))
        .withWatermark("ts", watermark)
    )
    agg = main.groupBy(F.window("ts", window_duration)).agg(
        F.count(F.lit(1)).alias("cnt"))
    return (
        agg.withColumn("window_start", F.col("window.start").cast("bigint"))
           .withColumn("window_end", F.col("window.end").cast("bigint"))
           .drop("window")
    )


def dedup_exact_stream(df: DataFrame, ts_col: str, text_col: str,
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of ``operators.dedup.dedup_exact``: keep the FIRST
    arrival per normalized-text fingerprint, drop later duplicates.

    ``dropDuplicatesWithinWatermark`` keeps one state row per fingerprint
    and evicts it once the watermark passes the row's event time +
    delay — bounded state, unlike a plain streaming dropDuplicates whose
    state grows forever. The guarantee is correspondingly windowed:
    duplicates separated by more than the watermark delay can re-emit,
    which is the honest contract for an infinite stream (batch dedup
    over the accumulated output remains the exactness backstop).
    """
    from ..functions.text import fingerprint

    return (
        df.withColumn("fp", fingerprint(text_col))
          .withWatermark(ts_col, watermark)
          .dropDuplicatesWithinWatermark(["fp"])
    )


def decontam_stream(doc_stream: DataFrame, benchmark: DataFrame,
                    text_col: str, id_col: str, on_batch,
                    ngram: int = 8, drop_at: int = 3):
    """Streaming twin of ``queries.benchmark_decontam``: every arriving
    document is annotated with its word-n-gram overlap against a STATIC
    benchmark set and routed keep / flag / drop — the decontamination
    gate a crawler pipeline runs before admitting documents.

    STATELESS by design: a document's verdict depends only on itself
    and the benchmark, so there is no watermark, no streaming state,
    and a replayed epoch is idempotent (same input rows → same
    verdicts) — none of the absorb/replay machinery
    ``incremental_dedup_stream`` needs. The benchmark's distinct
    n-gram relation is computed ONCE (eager localCheckpoint, so the
    lineage is severed and per-epoch plans don't re-derive it) and
    BROADCAST into every micro-batch — the benchmark is
    constant-cardinality by contract (a benchmark file does not grow
    with the corpus), which makes broadcast the permanently-correct
    side at any stream rate. Per-epoch work is one broadcast-hash
    probe plus a per-doc aggregate over MATCHED rows only.

    ``on_batch(annotated_df, epoch_id)`` receives each batch with the
    original columns plus ``n_overlap``/``n_eval_docs``/``verdict``
    ('keep' rows pass through — unlike the batch query, which reports
    only contaminated docs, the stream is the admission filter and
    must emit everything).
    """
    from ..functions.text import tokens, word_ngrams

    ev = (benchmark
          .withColumn("toks", tokens(text_col))
          .select(F.col(id_col).alias("eval_doc"),
                  F.explode(word_ngrams("toks", ngram)).alias("g"))
          .distinct()
          .localCheckpoint(eager=True))

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        ng = (batch_df
              .withColumn("toks", tokens(text_col))
              .select(F.col(id_col).alias("_did"),
                      F.explode(word_ngrams("toks", ngram)).alias("g")))
        hits = (ng.join(F.broadcast(ev), "g")
                  .groupBy("_did")
                  .agg(F.countDistinct("g").alias("n_overlap"),
                       F.countDistinct("eval_doc").alias("n_eval_docs")))
        out = (batch_df
               .join(hits, batch_df[id_col] == F.col("_did"), "left")
               .drop("_did")
               .withColumn("n_overlap",
                           F.coalesce("n_overlap", F.lit(0)).cast("bigint"))
               .withColumn("n_eval_docs",
                           F.coalesce("n_eval_docs", F.lit(0)).cast("bigint"))
               .withColumn("verdict",
                           F.when(F.col("n_overlap") >= drop_at, "drop")
                            .when(F.col("n_overlap") > 0, "flag")
                            .otherwise("keep")))
        on_batch(out, epoch_id)

    return doc_stream.writeStream.foreachBatch(fn)


def incremental_dedup_stream(doc_stream: DataFrame, corpus: DataFrame,
                             text_col: str, id_col: str,
                             on_batch, ngram: int = 3,
                             threshold: float = 0.8,
                             refresh_index: bool = False,
                             state_dir: str | None = None):
    """Streaming incremental dedup — the stream-static probe shape: a
    document stream is classified per micro-batch against a pre-staged
    corpus index (``operators.dedup.corpus_dedup_index``, built ONCE
    with eager localCheckpoint — the maintained-index posture a
    production crawler pipeline runs with).

    ``refresh_index=False`` probes the FROZEN snapshot (every doc's
    verdict depends only on itself and the original corpus — chop-
    invariant). ``refresh_index=True`` (VERDICT r4 item 6) ABSORBS each
    batch's unique survivors into the index between epochs
    (``operators.dedup.IncrementalDedupIndex``): later batches dedup
    against corpus ∪ all prior batches, converging to the
    batch-over-union classifier — the semantics a crawler actually
    wants (today's crawl must not re-admit a doc yesterday's DELTA
    already admitted). Verdicts then depend on batch order (that IS the
    semantics), but not on how a given prefix was chopped: absorb
    happens strictly between epochs, so doc verdicts are a function of
    the set of docs in strictly-earlier epochs.

    foreachBatch rather than a native stream-static join because the
    classifier needs batch-only shapes (the per-doc shingle-count
    window, multi-join status resolution); each micro-batch runs the
    EXACT batch operator, so batch/stream parity holds bit-for-bit.

    ``on_batch(result_df, epoch_id)`` receives each classified batch;
    returns the started-query handle builder (caller adds sink opts /
    trigger and ``.start()``).

    **At-least-once safety of the maintained index** (ADVICE r5):
    foreachBatch may REPLAY an epoch (sink failure, driver retry).
    With ``refresh_index=True`` a naive replay would re-classify
    against an index that already absorbed that epoch's survivors —
    flipping its own docs from "unique" to "exact_dup" — and absorb a
    second time, duplicating fingerprint/shingle rows. The guard
    tracks the last-absorbed epoch: a replayed epoch skips
    classify/absorb entirely and re-delivers the RECORDED verdicts
    (kept in memory for the latest epoch — the only one foreachBatch
    retries within a run).

    ``state_dir`` extends the guard across driver restarts with a
    write-ahead log: each epoch persists its verdicts and unique
    survivors as parquet BEFORE absorbing, and advances a marker file
    atomically AFTER. On construction the index is rebuilt by
    re-absorbing the recorded survivors of every epoch at-or-below the
    marker, in epoch order — so a restarted query (same streaming
    checkpoint, same state_dir) resumes with exactly the index state
    its offsets imply, and a replayed epoch reads its recorded
    verdicts back from the WAL. A crash BETWEEN absorb and the marker
    write loses only the in-memory absorb — the rebuilt index excludes
    that epoch, so its replay re-classifies against the correct
    pre-epoch state.
    """
    import json as _json
    import os as _os
    import uuid as _uuid

    from ..operators.dedup import IncrementalDedupIndex

    index = IncrementalDedupIndex(corpus, text_col, id_col, ngram)
    spark = corpus.sparkSession
    state: dict = {"last_absorbed": -1, "verdicts": None}
    if state_dir:
        _os.makedirs(state_dir, exist_ok=True)

    def _vdir(e: int) -> str:
        return _os.path.join(state_dir, f"verdicts_{e}")

    def _sdir(e: int) -> str:
        return _os.path.join(state_dir, f"survivors_{e}")

    def _marker() -> str:
        return _os.path.join(state_dir, "_last_absorbed.json")

    if refresh_index and state_dir and _os.path.exists(_marker()):
        with open(_marker()) as fh:
            last = _json.load(fh)["epoch"]
        recorded = sorted(
            int(d.rsplit("_", 1)[1]) for d in _os.listdir(state_dir)
            if d.startswith("survivors_"))
        for e in recorded:
            if e <= last:
                index.absorb(spark.read.parquet(_sdir(e)))
        state["last_absorbed"] = last

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if refresh_index and epoch_id <= state["last_absorbed"]:
            # replayed epoch: re-deliver recorded verdicts, but still
            # DRAIN the batch through the noop sink — a stateful
            # upstream only commits its state if the micro-batch plan
            # executes (same contract as tables.upsert_sink)
            rec = state["verdicts"]
            if rec is not None and rec[0] == epoch_id:
                batch_df.write.format("noop").mode("overwrite").save()
                on_batch(rec[1], epoch_id)
                return
            if state_dir and _os.path.isdir(_vdir(epoch_id)):
                batch_df.write.format("noop").mode("overwrite").save()
                on_batch(spark.read.parquet(_vdir(epoch_id)), epoch_id)
                return
            raise RuntimeError(
                f"epoch {epoch_id} already absorbed but its verdicts "
                f"are not recorded (replay beyond the retained window)")
        batch_df = batch_df.localCheckpoint(eager=True)  # read 2-3x
        out = index.classify(batch_df, threshold=threshold)
        if refresh_index:
            out = out.localCheckpoint(eager=True)  # verdicts, then merge
            uniq_ids = (out.where(F.col("status") == "unique")
                           .select(F.col("doc_id").alias("_uid")))
            uniq = batch_df.join(
                uniq_ids, batch_df[id_col] == F.col("_uid"), "left_semi")
            if state_dir:  # WAL before the in-memory state mutates
                out.write.mode("overwrite").parquet(_vdir(epoch_id))
                uniq.write.mode("overwrite").parquet(_sdir(epoch_id))
            index.absorb(uniq)
            if state_dir:
                tmp = _marker() + f".{_uuid.uuid4().hex}.tmp"
                with open(tmp, "w") as fh:
                    _json.dump({"epoch": epoch_id}, fh)
                _os.replace(tmp, _marker())
            state["last_absorbed"] = epoch_id
            state["verdicts"] = (epoch_id, out)
        on_batch(out, epoch_id)

    return doc_stream.writeStream.foreachBatch(fn)


def observe_input(df: DataFrame, name: str = "input") -> DataFrame:
    """Attach an ``observe()`` metric point counting rows (and their
    event-time span) flowing past this node — read back per micro-batch
    from ``StreamingQueryProgress.observedMetrics[name]``."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"))


def _progress_dicts(query) -> list[dict]:
    """recentProgress as PLAIN nested dicts. Spark 4's
    StreamingQueryProgress subclasses dict but nests Row objects (e.g.
    observedMetrics values), so go through the json form when present."""
    import json

    return [json.loads(p.json) if hasattr(p, "json") else p
            for p in query.recentProgress]


def watermark_drop_count(query) -> int:
    """Total rows dropped as too-late by stateful operators across a
    query's retained progress events — the W5 allowedLateness stand-in
    (SURVEY.md §2.3): the reference's side-output of late rows becomes a
    first-class metric (``stateOperators[].numRowsDroppedByWatermark``).
    Pair with ``observe_input`` to get dropped/total visibility.

    Counting caveat: the metric counts rows REACHING the state store —
    after map-side partial aggregation — so for a windowed count it is
    "late window-groups per micro-batch", a lower bound on raw late
    input rows (observe the pre-agg node if exact row counts matter)."""
    total = 0
    for p in _progress_dicts(query):
        for op in p.get("stateOperators", []):
            total += op.get("numRowsDroppedByWatermark", 0)
    return total


def observed_input_rows(query, name: str = "input") -> int:
    """Sum of the ``observe_input`` counter across progress events."""
    total = 0
    for p in _progress_dicts(query):
        m = p.get("observedMetrics", {}).get(name)
        if m:
            total += m.get("rows", 0)
    return total


def topn_foreach_batch(n: int, partition_keys: Sequence[str],
                       order_col: str, tiebreak: str,
                       sink: Callable[[DataFrame, int], None]):
    """K1 streaming tail: rank the micro-batch's aggregate state and hand
    top-N to ``sink`` — rank-over-agg is not allowed mid-stream, so this
    runs per epoch exactly like the reference's timer-fired TopN
    (HotItems.scala:132-175)."""
    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        ranked = top_n_per_group(
            batch_df, partition_keys,
            [F.desc(order_col), F.asc(tiebreak)], n=n)
        sink(ranked, epoch_id)
    return fn


class LateRowRouter:
    """W5's actual semantics — the late-row SIDE OUTPUT the reference
    builds with ``allowedLateness`` + ``sideOutputLateData``
    (HotItems.scala uses the 60s lateness window) — rebuilt at the
    micro-batch boundary, where Structured Streaming has no native
    equivalent.

    A ``foreachBatch`` callable holding the stream's watermark as
    driver state: batch rows with event time below the LOW watermark
    (the maximum event time seen in all PRIOR batches minus ``delay``)
    route to ``on_late``; everything else routes to ``on_main``. This
    is Flink's watermark contract at batch granularity: a row is late
    iff it arrives after the watermark already passed it, and the
    watermark only advances between batches — so routing is
    deterministic given the batch sequence, and re-processing a batch
    after failure routes identically (the watermark is advanced AFTER
    routing, from data, not wall clock).

    Restart durability (``state_dir``): the watermark is persisted per
    EPOCH as a tiny JSON next to the checkpoint — ``wm-{epoch}.json``
    holding the watermark the epoch routed WITH (``wm_in``) and the one
    it advanced TO (``wm_out``), written atomically (temp + rename)
    BEFORE any side output runs. foreachBatch is at-least-once: a
    replayed epoch finds its own file and re-routes with the SAME
    ``wm_in`` — bit-identical routing — while a restart into a fresh
    epoch re-seeds from the highest prior epoch's ``wm_out`` instead of
    re-seeding at zero. Files older than 32 epochs are garbage-collected
    (the source checkpoint never replays further back than its own
    retained offsets). Without ``state_dir`` the watermark is held on
    the driver only (the pre-round-5 behavior, fine for tests/demos).

    Scale notes: the per-batch driver work is one max() aggregate and
    one ≤100-byte local-file write (jobs are batch-local, no state
    store).
    """

    #: epochs of watermark files retained for replay re-seeding
    KEEP_EPOCHS = 32

    def __init__(self, ts_col: str, delay_s: int, on_main, on_late,
                 state_dir: str | None = None):
        self.ts_col = ts_col
        self.delay_s = delay_s
        self.on_main = on_main
        self.on_late = on_late
        self.state_dir = state_dir
        self.watermark: float | None = None
        if state_dir is not None:
            import os

            os.makedirs(state_dir, exist_ok=True)
            last = self._latest_epoch()
            if last is not None:
                self.watermark = self._read(last).get("wm_out")

    # -- tiny epoch-file log ------------------------------------------------
    def _epochs(self) -> list[int]:
        import os
        import re as _re

        out = []
        for f in os.listdir(self.state_dir):
            m = _re.fullmatch(r"wm-(\d+)\.json", f)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _latest_epoch(self) -> int | None:
        eps = self._epochs()
        return eps[-1] if eps else None

    def _path(self, epoch: int) -> str:
        import os

        return os.path.join(self.state_dir, f"wm-{epoch}.json")

    def _read(self, epoch: int) -> dict:
        import json

        with open(self._path(epoch)) as fh:
            return json.load(fh)

    def _write(self, epoch: int, rec: dict) -> None:
        import json
        import os

        tmp = self._path(epoch) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, self._path(epoch))  # atomic on POSIX
        for e in self._epochs():
            if e < epoch - self.KEEP_EPOCHS:
                os.remove(self._path(e))

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        import os

        if self.state_dir is not None:
            if os.path.exists(self._path(epoch_id)):
                # at-least-once replay of this epoch: route with the
                # recorded wm_in, not the (already advanced) in-memory
                # watermark — identical output to the first attempt.
                self.watermark = self._read(epoch_id).get("wm_in")
        ts = F.col(self.ts_col).cast("double")
        batch_df = batch_df.localCheckpoint(eager=True)  # routed 3 ways
        # advance BEFORE side effects so wm_out is durable by the time
        # anything external observes this epoch; routing still uses the
        # pre-advance watermark (wm_in), preserving the Flink contract.
        wm_in = self.watermark
        row = batch_df.agg(F.max(ts).alias("mx")).collect()[0]
        wm_out = wm_in
        if row["mx"] is not None:
            cand = row["mx"] - self.delay_s
            if wm_out is None or cand > wm_out:
                wm_out = cand
        if self.state_dir is not None:
            self._write(epoch_id, {"wm_in": wm_in, "wm_out": wm_out})
        if wm_in is not None:
            # null event-times match NEITHER comparison (both predicates
            # null) — route them explicitly to main, matching the
            # first-batch (watermark None) behavior, so null-ts rows are
            # never silently dropped from both side outputs.
            late = batch_df.where(ts < F.lit(wm_in))
            main = batch_df.where(ts.isNull() | (ts >= F.lit(wm_in)))
        else:
            late = batch_df.limit(0)
            main = batch_df
        self.on_late(late, epoch_id)
        self.on_main(main, epoch_id)
        self.watermark = wm_out

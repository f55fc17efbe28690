"""Transaction-log table format (tables.TxTable): snapshot isolation,
file-pruned MERGE, time travel, idempotent streaming sink, optimistic
concurrent writers, vacuum."""

import os
import threading

import pytest
from pyspark.sql import functions as F

from user_behavior_analysis_spark.tables import (CommitConflict, TxTable,
                                                 upsert_sink)


def rows(df):
    return sorted(map(tuple, df.select("k", "v").collect()))


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string")


def test_create_read_append_merge_timetravel(spark, base, tmp_path):
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    assert rows(t.read()) == [(i, f"v{i}") for i in range(100)]

    v1 = t.append(spark.createDataFrame([(100, "v100")], "k long, v string"))
    assert v1 == 1
    assert len(rows(t.read())) == 101

    # merge: update 3 keys, insert 1
    batch = spark.createDataFrame(
        [(0, "NEW0"), (50, "NEW50"), (99, "NEW99"), (200, "v200")],
        "k long, v string")
    v2 = t.merge(batch)
    assert v2 == 2
    got = dict(rows(t.read()))
    assert got[0] == "NEW0" and got[50] == "NEW50" and got[99] == "NEW99"
    assert got[200] == "v200" and got[1] == "v1"
    assert len(got) == 102

    # time travel: every historical snapshot intact
    assert len(rows(t.read(version=0))) == 100
    assert dict(rows(t.read(version=1)))[0] == "v0"
    assert dict(rows(t.read(version=2)))[0] == "NEW0"
    hist = t.history()
    assert [h["op"] for h in hist] == ["create", "append", "merge"]
    # as-of-time resolves to the version committed before the stamp
    assert len(rows(t.read_as_of(hist[1]["ts"]))) == 101


def test_merge_prunes_cold_files(spark, tmp_path):
    """File-level min/max pruning: a merge touching only the high key
    range must NOT rewrite (remove) the low-range files."""
    lo = spark.createDataFrame(
        [(i, "lo") for i in range(100)], "k long, v string")
    hi = spark.createDataFrame(
        [(i, "hi") for i in range(1000, 1100)], "k long, v string")
    t = TxTable.create(spark, str(tmp_path / "t"),
                       lo.repartitionByRange(2, "k"), ["k"])
    t.append(hi.repartitionByRange(2, "k"))
    v0_files = {f["path"] for f in t.snapshot_files(0)}
    t.merge(spark.createDataFrame([(1050, "NEW")], "k long, v string"))
    removed = self_removed = t._read_manifest(t.latest_version())["removed"]
    assert removed, "merge must rewrite the intersecting file(s)"
    assert not (set(removed) & v0_files), \
        "low-range files must carry over untouched"
    got = dict(rows(t.read()))
    assert got[1050] == "NEW" and got[0] == "lo" and len(got) == 200
    assert self_removed is removed  # keep linters honest about the alias


def test_snapshot_isolation_under_concurrent_merge(spark, base, tmp_path):
    """A reader pinned to a version sees identical rows before and
    after later commits; latest() advances."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    pinned = t.read(version=0)
    before = rows(pinned)
    t.merge(spark.createDataFrame([(0, "CHANGED")], "k long, v string"))
    assert rows(t.read(version=0)) == before
    assert dict(rows(t.read()))[0] == "CHANGED"


def test_concurrent_appends_both_land(spark, base, tmp_path):
    """Two writers appending concurrently: the exclusive-create commit
    serializes them; both rows land, no version is lost."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    errs = []

    def add(i):
        try:
            TxTable(spark, str(tmp_path / "t")).append(
                spark.createDataFrame([(1000 + i, f"w{i}")],
                                      "k long, v string"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ws = [threading.Thread(target=add, args=(i,)) for i in range(4)]
    [w.start() for w in ws]
    [w.join() for w in ws]
    assert not errs
    got = dict(rows(t.read()))
    assert all(got[1000 + i] == f"w{i}" for i in range(4))
    assert t.latest_version() == 4  # v0 create + 4 serialized appends


def test_commit_conflict_raises_on_manual_race(spark, base, tmp_path):
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    t._commit(1, {"op": "append", "added": [], "removed": []})
    with pytest.raises(CommitConflict):
        t._commit(1, {"op": "append", "added": [], "removed": []})


def test_streaming_upsert_sink_exactly_once(spark, base, tmp_path):
    """foreachBatch replay: applying the same epoch twice via the
    (txn_app, epoch_id) marker is a no-op the second time — the table
    neither duplicates rows nor advances a version."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    sink = upsert_sink(t, app="job1")
    e0 = spark.createDataFrame([(0, "E0"), (500, "E0new")],
                               "k long, v string")
    sink(e0, 0)
    v_after = t.latest_version()
    state = rows(t.read())
    sink(e0, 0)  # at-least-once replay
    assert t.latest_version() == v_after
    assert rows(t.read()) == state
    sink(e0.withColumn("v", F.lit("E1")), 1)  # next epoch applies
    assert dict(rows(t.read()))[0] == "E1"


def test_vacuum_drops_unreferenced_files_only(spark, base, tmp_path):
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    t.merge(spark.createDataFrame([(0, "X")], "k long, v string"))
    live_before = rows(t.read())
    assert t.vacuum() == 0, "retention window must protect young files"
    n = t.vacuum(retention_s=0.0)  # no writer in flight here
    assert n > 0, "the rewritten file must be collectible"
    assert rows(t.read()) == live_before
    # time travel to v0 is now (honestly) broken for vacuumed files
    with pytest.raises(Exception):
        t.read(version=0).collect()


def test_empty_snapshot_reads_schema(spark, tmp_path):
    empty = spark.createDataFrame([], "k long, v string")
    t = TxTable.create(spark, str(tmp_path / "t"), empty, ["k"])
    out = t.read()
    assert out.count() == 0 and set(out.columns) == {"k", "v"}


def test_compact_preserves_content_and_reduces_files(spark, base, tmp_path):
    """OPTIMIZE: many small commits -> one compaction; rows identical,
    file count drops, pinned history still readable, and the z-ordered
    variant tightens per-file min/max stats on both columns."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    for i in range(5):  # streamed-in small files
        t.append(spark.createDataFrame(
            [(1000 + 10 * i + j, "s") for j in range(10)],
            "k long, v string"))
    before = rows(t.read())
    n_before = len(t.snapshot_files(None))
    v = t.compact(n_files=2)
    assert rows(t.read()) == before
    assert len(t.snapshot_files(None)) < n_before
    assert rows(t.read(version=v - 1)) == before  # history intact
    hist = [h["op"] for h in t.history()]
    assert hist[-1] == "compact"


def test_compact_zorder_tightens_stats(spark, tmp_path):
    """Z-order compaction: after clustering on (a, b), each file's key
    range must cover a small fraction of the domain on the FIRST key
    too (row-hash layout leaves every file spanning ~the whole
    domain)."""
    import random

    rnd = random.Random(7)
    df = spark.createDataFrame(
        [(i, rnd.randrange(1000), f"p{i}") for i in range(4000)],
        "k long, b long, v string").repartition(8)  # scattered layout
    t = TxTable.create(spark, str(tmp_path / "t"), df, ["k"])
    scattered = [f["stats"]["k"][1] - f["stats"]["k"][0]
                 for f in t.snapshot_files(None)]
    assert min(scattered) > 2000, "precondition: files span ~all of k"
    t.compact(n_files=32, zorder_cols=("k", "b"))
    spans = sorted(f["stats"]["k"][1] - f["stats"]["k"][0]
                   for f in t.snapshot_files(None))
    # 32 z-ranges fix the top ~5 interleaved bits -> each file covers
    # ~1/8 of the k domain (~500), up to ~2 cells at sampled range
    # boundaries. Files straddling a high-a-bit flip legitimately span
    # wide (the classic Morton boundary artifact), so the claim is on
    # the distribution: 3/4 of the files must be range-tight, far below
    # the scattered layout's near-full spans.
    assert spans[len(spans) // 2] <= 1100, spans
    assert spans[len(spans) * 3 // 4] < min(scattered) // 2, \
        (spans, scattered)


def test_changes_feed(spark, base, tmp_path):
    """CDC read path: (since, to] added-row feed with version/op
    metadata; compaction commits are layout-only and excluded."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    t.append(spark.createDataFrame([(500, "a")], "k long, v string"))
    t.merge(spark.createDataFrame([(0, "UPD")], "k long, v string"))
    t.compact(n_files=2)
    feed = t.changes(since_version=0).toPandas()
    assert set(feed["_op"]) == {"append", "merge"}
    assert (500, "a") in set(zip(feed["k"], feed["v"]))
    assert (0, "UPD") in set(zip(feed["k"], feed["v"]))
    assert 3 not in set(feed["_version"])  # the compact commit
    only_merge = t.changes(since_version=1, to_version=2).toPandas()
    assert set(only_merge["_version"]) == {2}
    assert t.changes(since_version=t.latest_version()).count() == 0


def test_checkpointed_log_bounds_snapshot_reads(spark, tmp_path):
    """The round-6 log checkpoint (Delta _last_checkpoint pattern): a
    per-epoch streaming writer commits 100+ times; snapshot
    construction must read ONE checkpoint plus at most
    checkpoint_interval suffix manifests — O(interval), not
    O(commits) — and vacuum may truncate pre-checkpoint manifests
    without changing the snapshot, the change-feed tail, or the
    (txn_app, epoch) idempotence checks."""
    base = spark.createDataFrame([(k, "base") for k in range(8)],
                                 "k long, v string")
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"],
                       checkpoint_interval=10)
    sink = upsert_sink(t, app="epochs")
    n_epochs = 101
    for e in range(n_epochs):
        sink(spark.createDataFrame([(e % 8, f"e{e}")], "k long, v string"),
             e)
    assert t.latest_version() == n_epochs
    expected = {k: f"e{[e for e in range(n_epochs) if e % 8 == k][-1]}"
                for k in range(8)}
    assert dict(rows(t.read())) == expected

    # a FRESH handle (cold reader) reconstructs the snapshot from the
    # latest checkpoint + suffix, never the full log
    t2 = TxTable(spark, str(tmp_path / "t"))
    reads = []
    orig = TxTable._read_manifest
    try:
        TxTable._read_manifest = (
            lambda self, v: (reads.append(v), orig(self, v))[1])
        t2.snapshot_files()
    finally:
        TxTable._read_manifest = orig
    assert len(reads) <= t2.checkpoint_interval + 1, reads
    assert min(reads, default=10**9) > 90, reads

    # replayed epoch stays a no-op through the checkpointed txn marks
    v_before = t.latest_version()
    sink(spark.createDataFrame([(0, "REPLAY")], "k long, v string"), 50)
    assert t.latest_version() == v_before
    assert dict(rows(t.read())) == expected

    # truncation: manifests below the checkpoint go; state is unchanged
    t.vacuum(retention_s=0.0)
    assert t.versions()[0] >= 100
    assert dict(rows(t.read())) == expected
    ck_v = t.versions()[0]
    feed = t.changes(since_version=ck_v - 1).toPandas()
    assert len(feed) >= 1
    with pytest.raises(ValueError, match="truncated"):
        t.changes(since_version=0)
    # time travel below the checkpoint is gone — the documented trade
    with pytest.raises(Exception):
        t.read(version=5).collect()


def test_merge_raises_on_duplicate_batch_keys(spark, base, tmp_path):
    """A batch with two rows per key violates the key-level upsert
    invariant: default is Delta's multiple-source-rows-match error,
    BEFORE any file is rewritten or any version committed."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    dup = spark.createDataFrame([(1, "A"), (1, "B"), (2, "C")],
                                "k long, v string")
    v_before = t.latest_version()
    with pytest.raises(ValueError, match="duplicate-key"):
        t.merge(dup)
    assert t.latest_version() == v_before
    assert dict(rows(t.read()))[1] == "v1"


def test_merge_resolve_dedupes_deterministically(spark, base, tmp_path):
    """on_dup='resolve': one row per key survives, chosen by greatest
    non-key tuple — an order-free tie-break, so the outcome is
    independent of batch partitioning."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    dup = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "zz"), (2, "aa"), (3, "only")],
        "k long, v string")
    t.merge(dup, on_dup="resolve")
    got = dict(rows(t.read()))
    assert got[1] == "B" and got[2] == "zz" and got[3] == "only"
    t2 = TxTable.create(spark, str(tmp_path / "t2"), base, ["k"])
    t2.merge(dup.repartition(7), on_dup="resolve")
    assert dict(rows(t2.read())) == got


def test_txtable_changes_streaming_source(spark, tmp_path):
    """The CDC loop closed as a real stream (tables_cdc): readStream
    over the transaction log, offsets = versions, paged by
    maxVersionsPerTrigger. Drained with processAllAvailable (the
    source idles at the table head), the downstream aggregate over the
    change feed must equal the batch aggregate over the snapshot
    (append-only table → feed IS the table), with correct per-version
    metadata; a commit made WHILE the query runs is picked up by the
    next trigger."""
    import time as _time

    from user_behavior_analysis_spark.tables_cdc import (
        txtable_changes_stream)

    base = spark.createDataFrame([(k, 10) for k in range(4)],
                                 "k long, amt long")
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    for v in range(1, 6):
        t.append(spark.createDataFrame([(100 * v + j, v) for j in range(3)],
                                       "k long, amt long"))

    got = []
    feed = txtable_changes_stream(spark, str(tmp_path / "t"),
                                  max_versions_per_trigger=2)
    q = (feed.writeStream
         .foreachBatch(lambda df, eid: got.extend(
             map(tuple, df.select("k", "amt", "_version", "_op").collect())))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        q.processAllAvailable()
        n_after_drain = len(got)
        # feed == every added row since the create commit
        assert n_after_drain == 15
        assert {r[2] for r in got} == set(range(1, 6))
        assert {r[3] for r in got} == {"append"}
        # downstream aggregate parity: feed total == snapshot total
        # minus the pre-feed base (version 0 is before sinceVersion)
        snap_total = t.read().agg(F.sum("amt")).first()[0]
        assert sum(r[1] for r in got) == snap_total - 4 * 10
        # a live commit lands in a later trigger
        t.append(spark.createDataFrame([(999, 7)], "k long, amt long"))
        deadline = _time.time() + 60
        while len(got) < 16 and _time.time() < deadline:
            q.processAllAvailable()
            _time.sleep(0.2)
        assert (999, 7, 6, "append") in got
    finally:
        q.stop()


def test_txtable_changes_stream_resumes_from_checkpoint(spark, tmp_path):
    """Offsets are durable versions: a stopped-and-restarted query
    (same checkpoint) must NOT re-emit drained versions, and must pick
    up commits made while it was down."""
    from user_behavior_analysis_spark.tables_cdc import (
        txtable_changes_stream)

    base = spark.createDataFrame([(0, 0)], "k long, amt long")
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    t.append(spark.createDataFrame([(1, 1)], "k long, amt long"))

    def run(sink):
        q = (txtable_changes_stream(spark, str(tmp_path / "t"))
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .start())
        q.processAllAvailable()
        q.stop()

    first, second = [], []
    run(lambda df, eid: first.extend(
        map(tuple, df.select("k", "_version").collect())))
    assert first == [(1, 1)]
    t.append(spark.createDataFrame([(2, 2)], "k long, amt long"))
    run(lambda df, eid: second.extend(
        map(tuple, df.select("k", "_version").collect())))
    assert second == [(2, 2)], second


def test_txtable_changes_restart_past_paging_horizon(spark, tmp_path):
    """ADVICE r6 (high): a restarted reader whose CHECKPOINTED offset
    exceeds maxVersionsPerTrigger must not regress — a regressed end
    offset in the offset log makes later triggers re-page through and
    re-emit versions delivered before the restart. Safe because on
    every restart path Spark's FIRST call to the fresh reader is
    partitions(checkpointed range) — which anchors the paging cursor
    to max(start, end) before any latestOffset fires (the protocol
    order is pinned by test_python_streaming_source_call_order).
    Here committed offset 7 > max_versions_per_trigger 2; the restart
    must emit exactly the two down-time commits, zero duplicates."""
    from user_behavior_analysis_spark.tables_cdc import (
        txtable_changes_stream)

    base = spark.createDataFrame([(0, 0)], "k long, amt long")
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    for v in range(1, 8):
        t.append(spark.createDataFrame([(v, v)], "k long, amt long"))

    def run(sink):
        q = (txtable_changes_stream(spark, str(tmp_path / "t"),
                                    max_versions_per_trigger=2)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .start())
        q.processAllAvailable()
        q.stop()

    first, second = [], []
    run(lambda df, eid: first.extend(
        map(tuple, df.select("k", "_version").collect())))
    assert sorted(first) == [(v, v) for v in range(1, 8)]
    # two commits while the query is down; the restarted query's
    # catch-up batch must cover EXACTLY these
    t.append(spark.createDataFrame([(8, 8)], "k long, amt long"))
    t.append(spark.createDataFrame([(9, 9)], "k long, amt long"))
    run(lambda df, eid: second.extend(
        map(tuple, df.select("k", "_version").collect())))
    assert sorted(second) == [(8, 8), (9, 9)], second


def test_python_streaming_source_call_order(spark, tmp_path):
    """Pins the Python-streaming-source driver protocol the CDC
    source's offset-regression defense relies on (tables_cdc class
    comment): on a FRESH query the reader may see latestOffset before
    initialOffset (so paging must be safe from `since` alone), and on
    a RESTART the first call on the fresh reader is partitions() over
    the checkpointed range — BEFORE any latestOffset — so the paging
    cursor is anchored to the restored frontier in time. If a Spark
    upgrade reorders this protocol, this test fails loudly instead of
    the change feed silently re-emitting versions."""
    import json as _json

    from pyspark.sql.datasource import (DataSource,
                                        DataSourceStreamReader,
                                        InputPartition)
    from pyspark.sql.types import LongType, StructField, StructType

    log = str(tmp_path / "calls.log")

    class _Reader(DataSourceStreamReader):
        def __init__(self, path):
            self._p = path

        def _w(self, msg):
            with open(self._p, "a") as fh:
                fh.write(msg + "\n")

        def initialOffset(self):
            self._w("initialOffset")
            return {"v": 0}

        def latestOffset(self):
            self._w("latestOffset")
            return {"v": 3}

        def partitions(self, s, e):
            self._w(f"partitions {_json.dumps([s['v'], e['v']])}")
            return [InputPartition(0)]

        def read(self, partition):
            return iter([(1,)])

        def commit(self, end):
            self._w("commit")

    class _DS(DataSource):
        @classmethod
        def name(cls):
            return "callorder_probe"

        def schema(self):
            return StructType([StructField("a", LongType())])

        def streamReader(self, schema):
            return _Reader(self.options["log"])

    spark.dataSource.register(_DS)
    open(log, "w").close()

    def run():
        q = (spark.readStream.format("callorder_probe")
             .option("log", log).load()
             .writeStream.format("noop")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .start())
        q.processAllAvailable()
        q.stop()

    run()
    fresh = open(log).read().splitlines()
    # fresh query: the first offset call may be latestOffset (no
    # initialOffset before it) — which is why paging from `since` must
    # be restart-safe by a different mechanism
    assert "latestOffset" in fresh and "initialOffset" in fresh
    open(log, "w").close()
    run()
    restart = [ln for ln in open(log).read().splitlines()]
    offset_calls = [ln for ln in restart
                    if ln.startswith(("partitions", "latestOffset",
                                      "initialOffset"))]
    assert offset_calls, restart
    assert offset_calls[0].startswith("partitions"), \
        ("restart protocol changed: partitions() no longer precedes "
         "latestOffset — the CDC paging anchor is unsafe", restart)
    assert "initialOffset" not in restart, restart


def test_cdc_incremental_curation_loop(spark, sf_dir, tmp_path):
    """The loop VERDICT r5 item 4 exists for, closed end-to-end: raw
    documents land in a TxTable over three commits; the curation job
    consumes its CDC STREAM (tables_cdc), classifies each delta
    against a maintained corpus index (refresh_index=True — later
    deltas dedup against earlier deltas' survivors), and MERGEs the
    verdicts into a curated TxTable exactly-once via txn markers.
    Cross-delta dedup must hold through the whole chain (a twin planted
    two commits after its original classifies as its dup), and
    re-running the drained stream must not move the curated table."""
    from user_behavior_analysis_spark.operators.dedup import (
        incremental_dedup_status)
    from user_behavior_analysis_spark.sources import load_table
    from user_behavior_analysis_spark.streaming.jobs import (
        incremental_dedup_stream)
    from user_behavior_analysis_spark.tables_cdc import (
        txtable_changes_stream)

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    cands = docs.where(F.col("doc_id") % 10 == 0)
    uniq_ids = (incremental_dedup_status(corpus, cands, "text", "doc_id")
                .where(F.col("status") == "unique")
                .orderBy("doc_id").limit(3)
                .select(F.col("doc_id").alias("_uid")))
    uniqs = cands.join(uniq_ids, cands["doc_id"] == F.col("_uid"),
                       "left_semi").orderBy("doc_id") \
                 .localCheckpoint(eager=True)
    d0 = uniqs.limit(2)
    d1 = uniqs.subtract(d0).limit(1).localCheckpoint(eager=True)
    twin = d1.withColumn("doc_id", F.col("doc_id") + 9_000_000)

    raw = TxTable.create(spark, str(tmp_path / "raw"), docs.limit(0),
                         ["doc_id"])
    for delta in (d0, d1, twin):
        raw.append(delta)
    verdict_schema = incremental_dedup_status(
        corpus, docs.limit(0), "text", "doc_id").schema
    curated = TxTable.create(
        spark, str(tmp_path / "curated"),
        spark.createDataFrame([], verdict_schema), ["doc_id"])

    def run():
        feed = txtable_changes_stream(spark, str(tmp_path / "raw"),
                                      max_versions_per_trigger=1) \
            .drop("_version", "_op")
        q = incremental_dedup_stream(
            feed, corpus, "text", "doc_id",
            on_batch=lambda out, eid: curated.merge(
                out, txn_app="curation", txn_version=eid),
            refresh_index=True,
        ).option("checkpointLocation", str(tmp_path / "ck")).start()
        q.processAllAvailable()
        q.stop()

    run()
    got = {r["doc_id"]: (r["status"], r["match_id"])
           for r in curated.read().collect()}
    orig = d1.first()["doc_id"]
    tid = twin.first()["doc_id"]
    assert len(got) == 4
    assert got[orig][0] == "unique"
    assert got[tid] == ("exact_dup", orig), got
    # exactly-once: draining again (same checkpoint — no new versions)
    # must leave the curated table at the same version
    v = curated.latest_version()
    run()
    assert curated.latest_version() == v


def test_read_pruned_skips_files(spark, base, tmp_path):
    """Data skipping on the READ path: a narrow key-range read over a
    range-partitioned table must scan only the intersecting files
    (manifest min/max stats decide driver-side), and return exactly
    what the full scan + filter returns."""
    t = TxTable.create(spark, str(tmp_path / "t"),
                       base.repartitionByRange(8, "k"), ["k"])
    n_files = len(t.snapshot_files(None))
    assert n_files >= 8
    got = t.read_pruned({"k": (10, 12)})
    assert len(got.inputFiles()) <= 2, got.inputFiles()
    expect = rows(t.read().where((F.col("k") >= 10) & (F.col("k") <= 12)))
    assert rows(got) == expect == [(10, "v10"), (11, "v11"), (12, "v12")]
    # disjoint range -> empty result, zero files
    assert t.read_pruned({"k": (10_000, 20_000)}).count() == 0


def test_collapse_append_race_re_derives(spark, tmp_path):
    """The collapse×append race (code-review r9s2): a sink appending a
    new epoch's partials between a collapse job's snapshot read and
    its replace_where commit used to have those rows DELETED by the
    predicate while absent from the stale collapsed relation — silent
    sketch loss. Reproduced deterministically: the first replace_where
    attempt is intercepted to inject a concurrent append; the
    expected_version precondition must refuse it (CommitConflict), the
    collapse loop re-derives from the fresh snapshot, and the raced-in
    row survives the committed collapse."""
    from user_behavior_analysis_spark.streaming.jobs import (
        bottomk_samples, collapse_bottomk_samples)

    schema = "day_start long, epoch long, h long, value double"
    t = TxTable.create(spark, str(tmp_path / "t"),
                       spark.createDataFrame([], schema), ["day_start"])
    t.append(spark.createDataFrame([(0, 0, 50, 5.0), (0, 0, 60, 6.0)],
                                   schema))
    raced = {"n_attempts": 0}
    orig = t.replace_where

    def racing_replace(pred, df, **kw):
        raced["n_attempts"] += 1
        if raced["n_attempts"] == 1:
            TxTable(spark, str(tmp_path / "t")).append(
                spark.createDataFrame([(0, 1, 1, 0.5)], schema))
        return orig(pred, df, **kw)

    t.replace_where = racing_replace
    collapse_bottomk_samples(t, k=128)
    assert raced["n_attempts"] == 2, raced  # first attempt refused
    got = sorted(tuple(r) for r in bottomk_samples(t, k=128).collect())
    assert (0, 1, 0.5) in got, got  # the raced-in row survived
    assert (0, 50, 5.0) in got and (0, 60, 6.0) in got

    # the precondition itself: stale expected_version refuses outright
    v = t.latest_version()
    with pytest.raises(CommitConflict, match="advanced"):
        orig("day_start IN (0)",
             spark.createDataFrame([(0, -1, 50, 5.0)], schema),
             expected_version=v - 1)


def test_bloom_point_lookup_skips_files(spark, tmp_path):
    """Bloom file skipping where range stats are powerless: keys are
    HASH-scattered across files, so every file's min/max covers every
    lookup and read_pruned keeps all of them — the per-file Bloom
    still skips the definite misses. Pins: (1) result == full scan +
    filter for present AND absent keys; (2) the candidate set is a
    strict subset of the files while range stats prune nothing;
    (3) no false negatives across a key sweep (Bloom's guarantee);
    (4) files appended WITHOUT a bloom-configured handle stay
    candidates (mixed manifests are safe, never wrong)."""
    df = (spark.range(0, 4096)
               .selectExpr("id AS k", "CAST(id AS STRING) AS v")
               .repartition(8, "k"))  # hash layout: ranges all overlap
    t = TxTable.create(spark, str(tmp_path / "t"), df, ["k"],
                       bloom_cols=["k"])
    files = t.snapshot_files(None)
    assert len(files) == 8
    assert all("bloom" in f and f["bloom"]["cols"].get("k")
               for f in files)
    # range stats cannot prune a mid-range key: every file qualifies
    st_keep = [f for f in files
               if f["stats"]["k"][0] <= 2048 <= f["stats"]["k"][1]]
    assert len(st_keep) == 8
    kept = t._bloom_candidate_files("k", 2048)
    assert 1 <= len(kept) < 8, [f["path"] for f in kept]
    assert rows(t.read_point("k", 2048)) == [(2048, "2048")]
    # absent key: typically zero candidate files, always zero rows
    assert t.read_point("k", 999_999).count() == 0
    # no false negatives: the true file is always a candidate
    for key in range(0, 4096, 257):
        got = t.read_point("k", key).collect()
        assert [(r["k"], r["v"]) for r in got] == [(key, str(key))]
    # a bloom-less writer handle appends files without blooms; lookups
    # keep those files as candidates and stay correct
    t2 = TxTable(spark, str(tmp_path / "t"))
    t2.append(spark.createDataFrame([(9000, "x")], "k long, v string"))
    assert rows(t.read_point("k", 9000)) == [(9000, "x")]
    kept2 = t._bloom_candidate_files("k", 9000)
    assert any("bloom" not in f for f in kept2)


def test_append_schema_evolution_additive_only(spark, base, tmp_path):
    """Schema contract on append: exact columns by default; additive
    evolution behind merge_schema=True (old files read as nulls for
    the new column — the declared-schema read, no footer merging);
    dropping columns always refused. The change feed and a
    post-evolution MERGE must see the widened schema too."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    widened = spark.createDataFrame([(500, "w", 0.9)],
                                    "k long, v string, score double")
    with pytest.raises(ValueError, match="adds columns"):
        t.append(widened)
    with pytest.raises(ValueError, match="lacks table columns"):
        t.append(spark.createDataFrame([(501,)], "k long"))
    v = t.append(widened, merge_schema=True)
    assert v == 1
    out = t.read()
    assert "score" in out.columns
    vals = {r["k"]: r["score"] for r in out.collect()}
    assert vals[500] == 0.9 and vals[0] is None
    # post-evolution merge carries the widened schema
    t.merge(spark.createDataFrame([(0, "upd", 0.5)],
                                  "k long, v string, score double"))
    vals = {r["k"]: (r["v"], r["score"]) for r in t.read().collect()}
    assert vals[0] == ("upd", 0.5) and vals[1] == ("v1", None)
    # change feed unifies across the evolution (nulls for old commits)
    feed = t.changes(since_version=0).toPandas()
    assert "score" in feed.columns
    # CDC streaming source sees the widened schema and null-fills
    from user_behavior_analysis_spark.tables_cdc import (
        txtable_changes_stream)
    got = []
    q = (txtable_changes_stream(spark, str(tmp_path / "t"))
         .writeStream.foreachBatch(lambda df, e: got.extend(
             map(tuple, df.select("k", "score", "_version").collect())))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    by_k = {g[0]: g for g in got}
    assert by_k[500][1] == 0.9
    assert any(g[1] is None for g in got if g[0] != 500)


def test_concurrent_merges_serialize(spark, base, tmp_path):
    """Four writers MERGE different keys concurrently — the hot files
    overlap, so losers must re-run against the winner's snapshot (the
    optimistic read-validate-retry loop). All four updates land, no
    update is lost, exactly four versions commit."""
    t = TxTable.create(spark, str(tmp_path / "t"),
                       base.repartitionByRange(4, "k"), ["k"])
    errs = []

    def upd(i):
        try:
            TxTable(spark, str(tmp_path / "t")).merge(
                spark.createDataFrame([(i * 25, f"m{i}")],
                                      "k long, v string"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ws = [threading.Thread(target=upd, args=(i,)) for i in range(4)]
    [w.start() for w in ws]
    [w.join() for w in ws]
    assert not errs
    got = dict(rows(t.read()))
    assert all(got[i * 25] == f"m{i}" for i in range(4)), got
    assert len(got) == 100  # pure updates: no row gained or lost
    assert t.latest_version() == 4


def test_concurrent_replace_where_vs_merge_serialize(spark, base,
                                                     tmp_path):
    """VERDICT r6 #6: RACING MIXED WRITERS on overlapping key ranges —
    a replace_where over k in [40, 60) races a merge touching keys
    45, 50 (inside the region) and 120 (outside). The optimistic
    commit loop must serialize them: the final state equals ONE of the
    two serial orders exactly — never a blend that silently loses the
    loser's rows, never a torn region."""
    t = TxTable.create(spark, str(tmp_path / "t"),
                       base.repartitionByRange(4, "k"), ["k"])
    repl = spark.createDataFrame([(k, f"R{k}") for k in range(40, 60)],
                                 "k long, v string")
    mrg = spark.createDataFrame([(45, "M45"), (50, "M50"), (120, "M120")],
                                "k long, v string")
    errs, start = [], threading.Barrier(2)

    def do_replace():
        try:
            start.wait()
            TxTable(spark, str(tmp_path / "t")).replace_where(
                "k >= 40 AND k < 60", repl)
        except Exception as e:
            errs.append(e)

    def do_merge():
        try:
            start.wait()
            TxTable(spark, str(tmp_path / "t")).merge(mrg)
        except Exception as e:
            errs.append(e)

    ws = [threading.Thread(target=do_replace),
          threading.Thread(target=do_merge)]
    [w.start() for w in ws]
    [w.join() for w in ws]
    assert not errs, errs

    base_rows = {k: f"v{k}" for k in range(100)}
    # serial order 1: merge, then replace_where (replace wipes the
    # merged keys inside its region; the outside insert survives)
    s1 = dict(base_rows)
    s1.update({45: "M45", 50: "M50", 120: "M120"})
    for k in range(40, 60):
        s1[k] = f"R{k}"
    # serial order 2: replace_where, then merge (merge overwrites two
    # replaced keys)
    s2 = dict(base_rows)
    for k in range(40, 60):
        s2[k] = f"R{k}"
    s2.update({45: "M45", 50: "M50", 120: "M120"})
    got = dict(rows(t.read()))
    assert got in (s1, s2), {
        k: (got.get(k), s1.get(k), s2.get(k))
        for k in set(got) | set(s1) | set(s2)
        if not (got.get(k) == s1.get(k) == s2.get(k))}
    assert t.latest_version() == 2, t.history()


def test_txtable_model_based_random_ops(spark, tmp_path):
    """Model-based property test: arbitrary interleavings of append /
    merge / compact / vacuum, replayed against a plain in-memory model
    (append = add rows; merge = keyed replace+insert; compact = no
    content change), with a small checkpoint interval so the
    checkpointed-log read path engages mid-sequence. The final
    snapshot AND a historical version must match the model's state."""
    import uuid as _uuid

    from hypothesis import given, settings, strategies as st

    batch = st.lists(
        st.tuples(st.integers(0, 14), st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=4, unique_by=lambda t: t[0])
    op = st.one_of(st.tuples(st.just("append"), batch),
                   st.tuples(st.just("merge"), batch),
                   st.tuples(st.just("compact"), st.none()),
                   st.tuples(st.just("vacuum"), st.none()),
                   st.tuples(st.just("replace_where"),
                             st.tuples(st.integers(0, 14), batch)))

    @settings(max_examples=6, deadline=None)
    @given(st.lists(op, min_size=1, max_size=6),
           st.sampled_from([1, 2, 4]))
    def check(ops, ck_interval):
        path = str(tmp_path / f"m{_uuid.uuid4().hex[:8]}")
        t = TxTable.create(
            spark, path,
            spark.createDataFrame([(100, "base")], "k long, v string"),
            ["k"], checkpoint_interval=ck_interval)
        model = [(100, "base")]
        history = {0: sorted(model)}
        for kind, data in ops:
            if kind == "append":
                t.append(spark.createDataFrame(data, "k long, v string"))
                model = model + data
            elif kind == "merge":
                t.merge(spark.createDataFrame(data, "k long, v string"))
                keys = {k for k, _ in data}
                model = [r for r in model if r[0] not in keys] + data
            elif kind == "replace_where":
                thresh, rows_ = data
                region = [r for r in rows_ if r[0] >= thresh]
                t.replace_where(
                    f"k >= {thresh}",
                    spark.createDataFrame(region, "k long, v string"))
                model = [r for r in model if r[0] < thresh] + region
            elif kind == "compact":
                t.compact(n_files=2)
            else:
                # vacuum: content- and version-preserving (default
                # retention keeps every young artifact); interleaving
                # it mid-sequence pins that later reads, time travel
                # and checkpointed replay survive it (VERDICT r7 #6)
                t.vacuum()
            history[t.latest_version()] = sorted(model)
        assert rows(t.read()) == sorted(model), (ops, ck_interval)
        # time travel to the middle of the sequence
        mid = sorted(history)[len(history) // 2]
        assert rows(t.read(version=mid)) == history[mid], (ops, mid)

    check()


def test_replace_where_backfill(spark, tmp_path):
    """replace_where: one commit deletes the predicate region and
    inserts the batch; files wholly outside the region carry over by
    reference; rows outside the predicate in the batch are refused;
    time travel still sees the pre-backfill region; the change feed
    carries the commit."""
    lo = spark.createDataFrame(
        [(i, "old") for i in range(100)], "k long, v string")
    hi = spark.createDataFrame(
        [(i, "old") for i in range(1000, 1100)], "k long, v string")
    t = TxTable.create(spark, str(tmp_path / "t"),
                       lo.repartitionByRange(2, "k"), ["k"])
    t.append(hi.repartitionByRange(2, "k"))
    v0_files = {f["path"] for f in t.snapshot_files(0)}

    # refuse out-of-region writes
    bad = spark.createDataFrame([(5, "X"), (2000, "X")], "k long, v string")
    with pytest.raises(ValueError, match="outside predicate"):
        t.replace_where("k >= 1000", bad)

    # backfill the high region with half the rows, new values
    fresh = spark.createDataFrame(
        [(i, "new") for i in range(1000, 1050)], "k long, v string")
    v = t.replace_where("k >= 1000", fresh)
    got = dict(rows(t.read()))
    assert len(got) == 150
    assert got[0] == "old" and got[1000] == "new" and 1099 not in got
    # low-range files never rewritten
    m = t._read_manifest(v)
    assert m["op"] == "replace_where" and m["predicate"] == "k >= 1000"
    assert not (set(m["removed"]) & v0_files), \
        "files outside the predicate region must carry over untouched"
    assert m["removed"], "the matching file(s) must be rewritten"
    # time travel: pre-backfill snapshot intact
    before = dict(rows(t.read(version=v - 1)))
    assert before[1099] == "old" and len(before) == 200
    # change feed carries the commit (inserted region rows)
    ch = t.changes(since_version=v - 1, to_version=v)
    assert ch.where("_op = 'replace_where'").count() >= 50
    # idempotent replay via txn marker
    again = t.replace_where("k >= 1000", fresh, txn_app="bf", txn_version=1)
    assert again == v + 1
    assert t.replace_where("k >= 1000", fresh,
                           txn_app="bf", txn_version=1) is None


def test_streaming_restatement_sink_converges(spark, tmp_path):
    """restatement_sink: an update-mode windowed aggregate streamed
    through replace_where restates each reopened window WHOLESALE —
    after the drain the table equals the batch aggregate (the late
    event that reopened the first window is counted exactly once, not
    merged twice), commits carry op=replace_where, and epoch replay is
    a no-op via the txn marker."""
    import pandas as pd

    from user_behavior_analysis_spark.streaming import jobs
    from user_behavior_analysis_spark.tables import restatement_sink

    src = tmp_path / "ev"
    src.mkdir()
    # window [0,3600) gets 2 events in batch 0 and REOPENS with 1 more
    # in batch 1; window [3600,7200) closes with 1 event
    pd.DataFrame({"ts_s": [100, 200, 4000]}).to_parquet(
        src / "part-000.parquet", index=False)
    pd.DataFrame({"ts_s": [300, 8000]}).to_parquet(
        src / "part-001.parquet", index=False)

    t = TxTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([], "window_start long, window_end long, "
                                  "cnt long"),
        ["window_start"])
    ev = (spark.readStream.schema("ts_s long")
          .option("maxFilesPerTrigger", 1).parquet(str(src))
          .withColumn("ts", F.timestamp_seconds(F.col("ts_s"))))
    agg = jobs.windowed_count_stream(ev, "ts", "1 hour", None, [],
                                     watermark="2 hours")
    q = (agg.writeStream.outputMode("update")
         .foreachBatch(restatement_sink(t, "window_start"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {r["window_start"]: r["cnt"] for r in t.read().collect()}
    assert got == {0: 3, 3600: 1, 7200: 1}, got
    ops = [h["op"] for h in t.history()]
    assert "replace_where" in ops, ops
    # replay the last epoch by hand: marker makes it a no-op
    v = t.latest_version()
    last_epoch = max(h["txn_version"] for h in t.history()
                     if h.get("txn_app") == "restate")
    restatement_sink(t, "window_start")(
        spark.createDataFrame([(0, 3600, 999)],
                              "window_start long, window_end long, "
                              "cnt long"), last_epoch)
    assert t.latest_version() == v and dict(got)[0] == 3


def test_diff_between_versions(spark, tmp_path):
    """diff(v_from, v_to): end-state row diff keyed on key_cols —
    inserts carry the new row, deletes the old, a key rewritten twice
    shows once as a single update, untouched keys don't show, and
    null-valued fields compare null-safely (no phantom updates)."""
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(0, "a"), (1, "b"), (2, None), (3, "d")],
                              "k long, v string"), ["k"])
    # v1: update k1 (first time); v2: update k1 again + insert k9
    t.merge(spark.createDataFrame([(1, "B1")], "k long, v string"))
    t.merge(spark.createDataFrame([(1, "B2"), (9, "z")],
                                  "k long, v string"))
    # v3: delete k3 region wholesale
    t.replace_where("k = 3", spark.createDataFrame([],
                                                   "k long, v string"))
    got = {r["k"]: (r["v"], r["_change"])
           for r in t.diff(0).collect()}
    assert got == {1: ("B2", "update"), 9: ("z", "insert"),
                   3: ("d", "delete")}, got
    # intermediate window: only what changed between v1 and v2
    mid = {r["k"]: (r["v"], r["_change"])
           for r in t.diff(1, 2).collect()}
    assert mid == {1: ("B2", "update"), 9: ("z", "insert")}, mid
    # null-safe: k2 (v NULL both sides) must never appear
    assert 2 not in got and 2 not in mid


def test_restore_reverts_by_reference(spark, base, tmp_path):
    """RESTORE: after a bad merge + replace_where, restore(1) makes the
    next version read exactly as v1 did with ZERO data rewrite (the
    restore manifest's added paths are the old snapshot's files by
    reference); the bad versions stay time-travelable; diff across the
    restore is empty vs the restored target."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    t.append(spark.createDataFrame([(100, "v100")], "k long, v string"))
    good = rows(t.read())
    v1_files = {f["path"] for f in t.snapshot_files(1)}
    t.merge(spark.createDataFrame([(0, "BAD")], "k long, v string"))
    t.replace_where("k >= 90",
                    spark.createDataFrame([], "k long, v string"))
    assert rows(t.read()) != good
    v = t.restore(1)
    assert rows(t.read()) == good
    m = t._read_manifest(v)
    assert m["op"] == "restore" and m["restored_version"] == 1
    assert {f["path"] for f in t.snapshot_files(v)} == v1_files, \
        "restore must reference the old files, not rewrite them"
    # bad history still time-travelable; diff(v1, latest) is empty
    assert dict(rows(t.read(version=2)))[0] == "BAD"
    assert t.diff(1, v).count() == 0


def test_diff_across_schema_evolution(spark, tmp_path):
    """diff across an additive schema evolution: pre-evolution rows
    compare the new column as NULL, so only rows whose evolved value is
    actually non-null (or otherwise changed) surface."""
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(0, "a"), (1, "b")], "k long, v string"),
        ["k"])
    t.append(spark.createDataFrame([(2, "c", 7)],
                                   "k long, v string, w long"),
             merge_schema=True)
    got = {r["k"]: (r["v"], r["w"], r["_change"])
           for r in t.diff(0).collect()}
    assert got == {2: ("c", 7, "insert")}, got


def test_vacuum_after_restore_keeps_restored_files(spark, base, tmp_path):
    """restore() re-references OLD files; a subsequent vacuum must
    treat them as live (they are the current snapshot) and only drop
    the reverted versions' uniquely-referenced files."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    good = rows(t.read())
    t.merge(spark.createDataFrame([(0, "BAD")], "k long, v string"))
    t.restore(0)
    t.vacuum(retention_s=0.0)
    assert rows(t.read()) == good, "vacuum deleted restored files"
    # the bad version is no longer readable (its rewrite was collected)
    with pytest.raises(Exception):
        t.read(version=1).collect()


def test_restore_restores_schema(spark, tmp_path):
    """ADVICE r6: restoring to a pre-evolution version must read with
    THAT version's schema — the restore manifest records the target's
    schema/key_cols, so the restored head doesn't gain the evolved
    columns as nulls (Delta RESTORE restores the schema too)."""
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(0, "a")], "k long, v string"), ["k"])
    t.append(spark.createDataFrame([(1, "b", 7)],
                                   "k long, v string, w long"),
             merge_schema=True)
    assert "w" in t.read().columns
    t.restore(0)
    assert t.read().columns == ["k", "v"], t.read().columns
    assert sorted(map(tuple, t.read().collect())) == [(0, "a")]
    # post-restore writes conform to the RESTORED schema; the evolved
    # history stays time-travelable with its own schema
    t.append(spark.createDataFrame([(2, "c")], "k long, v string"))
    assert t.read().columns == ["k", "v"]
    assert t.read(version=1).columns == ["k", "v", "w"]


def test_vacuum_retention_guards_log_artifacts(spark, base, tmp_path):
    """ADVICE r6: manifests/checkpoints below the latest checkpoint are
    only truncated once OLDER than the retention window — a reader that
    just listed versions() can finish its replay. retention_s=0 keeps
    the old truncate-now behavior."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"],
                       checkpoint_interval=2)
    for i in range(4):
        t.append(spark.createDataFrame([(200 + i, "x")],
                                       "k long, v string"))
    all_vs = t.versions()
    assert t._checkpoint_versions(), "test needs a checkpoint"
    t.vacuum(retention_s=3600.0)
    assert t.versions() == all_vs, \
        "young manifests must survive a retention-window vacuum"
    t.vacuum(retention_s=0.0)
    ck = t._latest_checkpoint_le(None)
    assert all(v >= ck for v in t.versions())


def test_replay_retries_once_when_manifest_vanishes(spark, base,
                                                    tmp_path):
    """A manifest vanishing between versions() listing and its read
    (concurrent vacuum) must not fail the reader: _replay re-lists and
    retries once."""
    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"])
    t.append(spark.createDataFrame([(100, "v100")], "k long, v string"))
    expected = rows(t.read())
    orig, calls = t._read_manifest, {"n": 0}

    def flaky(i):
        if calls["n"] == 0:
            calls["n"] += 1
            raise FileNotFoundError("vacuumed under the reader")
        return orig(i)

    t._read_manifest = flaky
    try:
        assert rows(t.read()) == expected
    finally:
        t._read_manifest = orig
    assert calls["n"] == 1


def test_concurrent_compact_vs_merge_serialize(spark, base, tmp_path):
    """VERDICT r7 #6 (writer-conflict matrix): a compact racing a merge
    must serialize through the optimistic commit loop — compact is
    content-preserving, so EITHER serial order yields base+merge; what
    must never happen is a blend that drops the merge's rows or
    resurrects a pre-merge file set. Both writers retry internally, so
    neither may surface an error."""
    t = TxTable.create(spark, str(tmp_path / "t"),
                      base.repartitionByRange(4, "k"), ["k"])
    mrg = spark.createDataFrame([(5, "M5"), (55, "M55"), (200, "M200")],
                                "k long, v string")
    errs, start = [], threading.Barrier(2)

    def do_compact():
        try:
            start.wait()
            TxTable(spark, str(tmp_path / "t")).compact(n_files=2)
        except Exception as e:
            errs.append(e)

    def do_merge():
        try:
            start.wait()
            TxTable(spark, str(tmp_path / "t")).merge(mrg)
        except Exception as e:
            errs.append(e)

    ws = [threading.Thread(target=do_compact),
          threading.Thread(target=do_merge)]
    [w.start() for w in ws]
    [w.join() for w in ws]
    assert not errs, errs
    expect = {k: f"v{k}" for k in range(100)}
    expect.update({5: "M5", 55: "M55", 200: "M200"})
    assert dict(rows(t.read())) == expect
    assert t.latest_version() == 2, t.history()
    assert {h["op"] for h in t.history()} == {"create", "compact", "merge"}


def test_concurrent_vacuum_vs_merge_safe(spark, base, tmp_path):
    """VERDICT r7 #6: a vacuum (default retention) racing a merge must
    never delete a file the merge's commit references — the retention
    window is exactly what makes just-written files untouchable — and
    the merge's result plus every retained snapshot must stay fully
    readable afterwards."""
    t = TxTable.create(spark, str(tmp_path / "t"),
                      base.repartitionByRange(4, "k"), ["k"])
    # build some history so vacuum has candidate garbage
    t.merge(spark.createDataFrame([(1, "A1")], "k long, v string"))
    t.compact(n_files=2)
    mrg = spark.createDataFrame([(2, "B2"), (300, "B300")],
                                "k long, v string")
    errs, got_n, start = [], [], threading.Barrier(2)

    def do_vacuum():
        try:
            start.wait()
            got_n.append(TxTable(spark, str(tmp_path / "t")).vacuum())
        except Exception as e:
            errs.append(e)

    def do_merge():
        try:
            start.wait()
            TxTable(spark, str(tmp_path / "t")).merge(mrg)
        except Exception as e:
            errs.append(e)

    ws = [threading.Thread(target=do_vacuum),
          threading.Thread(target=do_merge)]
    [w.start() for w in ws]
    [w.join() for w in ws]
    assert not errs, errs
    assert got_n and isinstance(got_n[0], int)
    expect = {k: f"v{k}" for k in range(100)}
    expect.update({1: "A1", 2: "B2", 300: "B300"})
    assert dict(rows(t.read())) == expect
    # every version inside the retention window stays replayable
    for v in t.versions():
        t.read(version=v).count()


def test_vacuum_tolerates_vanishing_artifacts(spark, base, tmp_path,
                                              monkeypatch):
    """ADVICE r7: two vacuums racing (or a checkpoint writer's own
    cleanup) can remove an artifact between vacuum's listdir and its
    getmtime — deterministically reproduced here by a getmtime wrapper
    that deletes its target first. vacuum must treat the vanished file
    as already handled and finish, leaving the table readable."""
    import os as _os
    import time as _time

    t = TxTable.create(spark, str(tmp_path / "t"), base, ["k"],
                       checkpoint_interval=2)
    for i in range(4):  # several versions -> superseded manifests + data
        t.merge(spark.createDataFrame([(i, f"m{i}")], "k long, v string"))
    # age everything past the retention cutoff
    for dirpath, _dirs, files in _os.walk(str(tmp_path / "t")):
        for fn in files:
            p = _os.path.join(dirpath, fn)
            _os.utime(p, (_time.time() - 7200, _time.time() - 7200))

    real_getmtime = _os.path.getmtime
    zapped = []

    def racing_getmtime(p):
        if str(p).startswith(str(tmp_path)) and not zapped:
            zapped.append(p)
            _os.remove(p)  # the "other vacuum" wins this artifact
        return real_getmtime(p)

    monkeypatch.setattr("os.path.getmtime", racing_getmtime)
    n = t.vacuum(retention_s=3600)
    monkeypatch.undo()
    assert zapped, "the race wrapper never engaged"
    assert isinstance(n, int)
    expect = {k: f"v{k}" for k in range(100)}
    expect.update({i: f"m{i}" for i in range(4)})
    assert dict(rows(t.read())) == expect

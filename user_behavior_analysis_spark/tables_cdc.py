"""TxTable change feed as a native Spark *streaming source* (VERDICT
r5 "next round" #4): ``spark.readStream.format("txtable_changes")``
over a ``tables.TxTable``, closing the CDC loop — a downstream job
consumes commits incrementally (dedup-classify, aggregate, merge-back)
instead of rescanning snapshots.

Built on the Spark 4 Python data source API (SPARK-44076), the same
public surface `sources_pyds.MarketingSimDataSource` uses. The design
maps the table's transaction log onto the streaming offset contract:

* **Offsets ARE versions.** The offset log stores ``{"version": N}``;
  a micro-batch covers the manifests in ``(start, end]``. Offsets are
  durable table versions, so a restarted query resumes exactly where
  its checkpoint says — replaying a batch re-reads the SAME immutable
  manifests and parquet files (commits never mutate), giving
  exactly-once feed contents with no extra bookkeeping.
* **maxVersionsPerTrigger** (default 10) bounds each micro-batch, the
  ``maxFilesPerTrigger`` analog — a consumer that fell behind pages
  through the backlog instead of materializing it in one batch.
* **One input partition per ADDED FILE** — executors read files in
  parallel via Arrow record batches (``pyarrow.parquet`` →
  ``pa.RecordBatch`` yields, the data-source fast path; no per-row
  Python). ``compact`` commits are layout-only and skipped, matching
  ``TxTable.changes``; ``merge`` commits re-add carried-over rows
  (copy-on-write), so the feed serves keyed-upsert consumers — the
  same contract ``changes()`` documents.
* **Bounded drain.** ``latestOffset`` never advances past the table's
  latest committed version, so ``processAllAvailable()`` terminates —
  tests drain deterministically, and a live pipeline simply idles at
  the head until the next commit.

100 TB shape: the driver touches only manifest JSON (O(versions per
trigger)); all row movement is executor-parallel Arrow file reads, one
task per added file — the same division of labor as the batch
snapshot reader.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _manifest_versions(path: str) -> list[int]:
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[1:13]) for f in os.listdir(d)
                  if f.startswith("v") and f.endswith(".json"))


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_log_dir(path), f"v{version:012d}.json")) as fh:
        return json.load(fh)


def _table_schema(path: str) -> StructType:
    """LATEST table schema without a SparkSession: the highest-version
    log artifact (manifest or checkpoint) carrying a schema wins —
    schema-evolving appends update it, checkpoints carry it past
    truncation (tables.TxTable._meta's contract)."""
    best_v, best = -1, None
    for v in _manifest_versions(path):
        m = _read_manifest(path, v)
        if m.get("schema") and v > best_v:
            best_v, best = v, m["schema"]
    d = _log_dir(path)
    cks = sorted(f for f in os.listdir(d)
                 if f.startswith("c") and f.endswith(".checkpoint.json")) \
        if os.path.isdir(d) else []
    if cks:
        with open(os.path.join(d, cks[-1])) as fh:
            ck = json.load(fh)
        if ck["version"] > best_v:
            best_v, best = ck["version"], ck["schema"]
    if best is None:
        raise FileNotFoundError(f"not a TxTable: {path}")
    return StructType.fromJson(json.loads(best))


class _FilePart(InputPartition):
    def __init__(self, file_path: str | None, version: int, op: str):
        self.file_path, self.version, self.op = file_path, version, op


class _ChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.max_versions = int(options.get("maxversionspertrigger", 10))
        self.since = int(options.get("sinceversion", 0))
        self._cur = self.since
        self._schema = _table_schema(self.path)

    # Offset-regression safety (ADVICE r6 high). A paged latestOffset
    # must never return a value below a restored checkpoint: Spark only
    # checks offset inequality, so a regressed end offset lands in the
    # offset log and later triggers re-page through it — re-emitting
    # versions delivered before the restart. The defense is the
    # _anchor ratchet, and it is SUFFICIENT because of the (empirically
    # pinned — test_python_streaming_source_call_order) driver
    # protocol: on EVERY restart path, Spark's first call to the fresh
    # reader is partitions(checkpointed_start, checkpointed_end) —
    # recovering the last logged batch, committed or not — BEFORE any
    # latestOffset; on a fresh query latestOffset comes first but no
    # checkpoint exists, so paging from `since` cannot regress past
    # anything. partitions anchors to max(start, end) (not just end),
    # which also disarms a hypothetically poisoned end<start log range:
    # the range resolves empty and the next page resumes from the true
    # frontier. A Spark upgrade that reorders the protocol fails the
    # call-order pin test loudly rather than corrupting feeds.

    def initialOffset(self):
        return {"version": self.since}

    def latestOffset(self):
        vs = _manifest_versions(self.path)
        head = vs[-1] if vs else self.since
        self._cur = min(max(self._cur, self.since) + self.max_versions,
                        max(head, self._cur))
        return {"version": self._cur}

    def _anchor(self, version: int) -> None:
        self._cur = max(self._cur, version)

    def partitions(self, start: dict, end: dict):
        s, e = start["version"], end["version"]
        # restart-safety ratchet: on driver recovery this is the FIRST
        # call on the fresh reader (see class comment) and start/end
        # are checkpointed truth — anchor to both, so a later
        # latestOffset can never page below the restored frontier
        self._anchor(max(s, e))
        parts = []
        for v in range(s + 1, e + 1):
            m = _read_manifest(self.path, v)
            if m.get("op") == "compact":
                continue
            for f in m.get("added", []):
                parts.append(_FilePart(
                    os.path.join(self.path, "_data", f["path"]),
                    v, m.get("op") or ""))
        return parts or [_FilePart(None, e, "")]

    def read(self, partition: _FilePart):
        if partition.file_path is None:
            return iter([])
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        tbl = pq.read_table(partition.file_path)
        target = to_arrow_schema(self._schema)
        for i, name in enumerate(target.names):
            if name not in tbl.column_names:
                # file predates an additive schema evolution: null-fill
                tbl = tbl.append_column(
                    name, pa.nulls(tbl.num_rows, target.types[i]))
        tbl = tbl.select(target.names).cast(target)
        n = tbl.num_rows
        tbl = tbl.append_column(
            "_version", pa.array([partition.version] * n, pa.int64()))
        tbl = tbl.append_column(
            "_op", pa.array([partition.op] * n, pa.string()))
        return iter(tbl.to_batches())

    def commit(self, end: dict) -> None:
        self._anchor(end["version"])

    def stop(self) -> None:
        pass


class TxTableChangesDataSource(DataSource):
    """``spark.readStream.format("txtable_changes").option("path", p)``
    after ``spark.dataSource.register(TxTableChangesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "txtable_changes"

    def schema(self) -> StructType:
        base = _table_schema(self.options["path"])
        return StructType(list(base.fields) + [
            StructField("_version", LongType()),
            StructField("_op", StringType())])

    def streamReader(self, schema) -> _ChangesStreamReader:
        return _ChangesStreamReader(self.options)


_PICKLED_BY_VALUE = False


def _self_contain() -> None:
    """Make the data source's pickle SELF-CONTAINED: Spark cloudpickles
    the DataSource class into separate python worker processes (the
    planner/offset runner and the executors), and by default an
    importable module pickles BY REFERENCE — a driver running outside
    the repo root (the external harness, any user script that
    sys.path-hacked its own interpreter only) hits
    ModuleNotFoundError in those workers. register_pickle_by_value on
    THIS module makes cloudpickle serialize the class and its
    module-level helpers by value, so the workers need no import.
    (addPyFile is not sufficient: the data-source planner process does
    not pick up late file additions.)"""
    global _PICKLED_BY_VALUE
    if _PICKLED_BY_VALUE:
        return
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    _PICKLED_BY_VALUE = True


def txtable_changes_stream(spark, path: str,
                           max_versions_per_trigger: int = 10,
                           since_version: int = 0):
    """Register the source and open the change-feed stream."""
    _self_contain()
    spark.dataSource.register(TxTableChangesDataSource)
    return (spark.readStream.format("txtable_changes")
            .option("path", path)
            .option("maxVersionsPerTrigger", str(max_versions_per_trigger))
            .option("sinceVersion", str(since_version))
            .load())

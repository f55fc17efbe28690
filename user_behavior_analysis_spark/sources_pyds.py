"""S4 as a native Spark 4 *Python data source* (batch + micro-batch).

The reference implements its marketing simulator as a custom Flink
``SourceFunction`` (market-analysis/.../source/SimulatedEventSource.scala:19-52):
an in-process generator pushing random (user, behavior, channel, ts)
events. ``sources.simulated_marketing_stream`` already re-expresses it
over the built-in ``rate`` source; this module is the idiomatic
Spark-4 counterpart of the *custom source itself* — the
``pyspark.sql.datasource`` API (SPARK-44076, public since 4.0) that
lets a pure-Python class participate in Catalyst as a first-class
format, with planned partitions, a real offset log, and exactly-once
micro-batch replay.

Design points that matter at scale:

* **Deterministic generation from the index.** Every event is a pure
  function of its global row index (md5 of ``ev{i}``), so (a) batch
  and streaming produce bit-identical rows for the same index range,
  (b) a failed/replayed micro-batch regenerates EXACTLY the same
  events (the offset log stores plain row indices), and (c) tests can
  hash-compare without fixtures.
* **Partition-parallel.** ``partitions()`` splits the index range into
  ``n_partitions`` (batch) / one slice per 1000 rows (stream); each
  executor generates its slice independently — no driver-side row
  materialization, unlike SimpleDataSourceStreamReader.
* **Bounded offsets.** ``latestOffset`` never advances past
  ``max_rows``, so ``processAllAvailable`` terminates and tests can
  drain the stream deterministically.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

BEHAVIORS: Sequence[str] = ("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")
CHANNELS: Sequence[str] = ("wechat", "weibo", "appstore", "huaweistore")

_SCHEMA = "user_id string, behavior string, channel string, ts_sec bigint"


def gen_event(i: int, base_ts: int = 1_600_000_000,
              rows_per_sec: int = 100) -> tuple[str, str, str, int]:
    """The shared deterministic generator: one md5 per event index."""
    h = hashlib.md5(f"ev{i}".encode()).hexdigest()
    return ("u" + h[:12],
            BEHAVIORS[int(h[12:14], 16) % len(BEHAVIORS)],
            CHANNELS[int(h[14:16], 16) % len(CHANNELS)],
            base_ts + i // rows_per_sec)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _gen_range(start: int, end: int) -> Iterator[tuple]:
    for i in range(start, end):
        yield gen_event(i)


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_partitions))
        return [_Range(s, min(s + step, self.n_rows))
                for s in range(0, self.n_rows, step)]

    def read(self, partition: _Range):
        return _gen_range(partition.start, partition.end)


class _StreamReader(DataSourceStreamReader):
    ROWS_PER_SLICE = 1000

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", 1000))
        self.max_rows = int(options.get("max_rows", 10_000))
        self._cur = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._cur = min(self._cur + self.batch_rows, self.max_rows)
        return {"index": self._cur}

    def partitions(self, start: dict, end: dict):
        s, e = start["index"], end["index"]
        # Restart-safety: after a driver recovery this reader is a fresh
        # instance with _cur = 0, but Structured Streaming re-plans from
        # the CHECKPOINTED offsets — observed ranges are the truth.
        # Ratcheting the cursor to every offset seen here (and in
        # commit()) keeps latestOffset monotone past the restored
        # position, so a recovered query resumes forward instead of
        # re-announcing row ranges behind the committed offset.
        self._cur = max(self._cur, e)
        return [_Range(a, min(a + self.ROWS_PER_SLICE, e))
                for a in range(s, e, self.ROWS_PER_SLICE)] or [_Range(s, e)]

    def read(self, partition: _Range):
        return _gen_range(partition.start, partition.end)

    def commit(self, end: dict) -> None:
        self._cur = max(self._cur, end["index"])

    def stop(self) -> None:
        pass


class MarketingSimDataSource(DataSource):
    """``spark.read.format("marketing_sim")`` /
    ``spark.readStream.format("marketing_sim")`` after
    ``register_marketing_sim(spark)`` (or a manual
    ``spark.dataSource.register`` when the driver runs from the repo
    root)."""

    @classmethod
    def name(cls) -> str:
        return "marketing_sim"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


_PICKLED_BY_VALUE = False


def register_marketing_sim(spark) -> None:
    """Register the source with a SELF-CONTAINED pickle: Spark's
    data-source planner/runner worker processes import the pickled
    class, and an importable module pickles BY REFERENCE — a driver
    running outside the repo root hits ModuleNotFoundError there
    (addPyFile is not honored by the planner; same lesson as
    tables_cdc._self_contain). register_pickle_by_value makes the
    class and its module-level generator helpers travel by value."""
    global _PICKLED_BY_VALUE
    if not _PICKLED_BY_VALUE:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
        _PICKLED_BY_VALUE = True
    spark.dataSource.register(MarketingSimDataSource)

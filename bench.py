#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query is forced through the noop sink (full JVM-side materialization
— no driver collect, no Python transfer), which is the honest analog of
writing results to a table at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The bench universe IS the registry: every registered query is timed, so
# BENCH_r{N} and CORRECTNESS cover the same set by construction (a static
# headliner list drifted 12 queries behind the registry by round 2).
def bench_queries() -> list[str]:
    from user_behavior_analysis_spark.queries import QUERIES
    return list(QUERIES)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from user_behavior_analysis_spark.queries import QUERIES
    from user_behavior_analysis_spark.session import get_spark

    spark = get_spark("uba-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM + codegen warmup on the smallest SF so per-query numbers
    # measure the plan, not first-call overhead. Three engine paths
    # need separate first-call warmup (measured round 9: the TxTable
    # commit stack and the Arrow/pandas worker path each pay ~5 s of
    # one-time JIT + Python-worker spawn on whichever query hits them
    # first — bench order billed txtable_point_lookup 7.2 s for a
    # 1.7 s plan and media_mixed_neardup 8.9 s for a 2.9 s plan).
    # Warmup runs on sf0.001 (different inputs, outputs discarded):
    # nothing computed here is reusable by a timed query — both
    # TxTable queries build fresh tempfile.mkdtemp state per call.
    for _warm in ("hot_items_topn", "txtable_point_lookup",
                  "media_byte_histogram"):
        QUERIES[_warm](spark, "/root/testdata/sf0.001").write \
            .format("noop").mode("overwrite").save()

    # Best-of-N per query (default 2; SPARK_GRAFT_BENCH_RUNS=3 for the
    # re-anchor tables): this box is a shared VM and transient CPU
    # throttling has been observed to inflate identical plans 10x; the
    # min of N back-to-back runs measures the plan, not the neighbor.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    times: dict[str, float] = {}
    for name in bench_queries():
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The driver captures only the LAST stdout line and has truncated
    # the per-query dict before (BENCH_r05 "parsed": null) — so also
    # persist the full record to a stable machine-readable artifact
    # next to this script (committed per round as BENCH_LOCAL_r{N}).
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LAST.json"), "w") as fh:
            json.dump(out, fh, indent=1)
    except OSError:
        pass  # read-only checkout: the stdout line is still the contract
    print(json.dumps(out))


if __name__ == "__main__":
    main()

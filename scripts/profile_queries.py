"""Per-query profile: split wall time into BUILD (the query function
call — includes any driver actions it performs: counts, collects,
approxQuantile, eager checkpoints, TxTable commits) and EXEC (the noop
sink write of the returned plan), plus the Spark job count each phase
issued. The split tells where optimization effort goes: a query slow in
BUILD is serialized on driver-side barriers; slow in EXEC is plan shape.

Usage: python scripts/profile_queries.py [out.json] [sf_dir] [only] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = {n for n in (sys.argv[3].split(",") if len(sys.argv) > 3
                        else []) if n}
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from user_behavior_analysis_spark.queries import QUERIES
    from user_behavior_analysis_spark.session import get_spark

    spark = get_spark("uba-profile")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    QUERIES["hot_items_topn"](spark, "/root/testdata/sf0.001").write \
        .format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()

    def job_count() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    prof: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        best = None
        for _ in range(runs):
            sc.setJobDescription(f"{name}: build")
            j0, t0 = job_count(), time.perf_counter()
            df = fn(spark, sf_dir)
            t1, j1 = time.perf_counter(), job_count()
            sc.setJobDescription(f"{name}: exec")
            df.write.format("noop").mode("overwrite").save()
            t2, j2 = time.perf_counter(), job_count()
            sc.setJobDescription(None)
            row = {"build_s": round(t1 - t0, 3), "exec_s": round(t2 - t1, 3),
                   "total_s": round(t2 - t0, 3),
                   "build_jobs": j1 - j0, "exec_jobs": j2 - j1}
            if best is None or row["total_s"] < best["total_s"]:
                best = row
        prof[name] = best
        print(name, json.dumps(best))
    with open(out_path, "w") as fh:
        json.dump(prof, fh, indent=1, sort_keys=True)
    tot = sum(v["total_s"] for v in prof.values())
    b = sum(v["build_s"] for v in prof.values())
    print(f"TOTAL {tot:.1f}s  build {b:.1f}s  exec {tot - b:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

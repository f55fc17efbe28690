"""Dump .explain("formatted") for every registered query to a directory.

Usage: python scripts/dump_plans.py plans/r09 _before [sf_dir] [only]

Writes <dir>/<query><suffix>.txt per query. Building a query may run
driver-side actions (counts, checkpoints, TxTable commits); the explain
itself is plan-only. ``only`` is a comma-separated query-name filter.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "_before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = {n for n in (sys.argv[4].split(",") if len(sys.argv) > 4
                        else []) if n}
    os.makedirs(out_dir, exist_ok=True)

    from user_behavior_analysis_spark.queries import QUERIES
    from user_behavior_analysis_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # keep going; record the failure
            plan = f"EXPLAIN FAILED: {exc}\n"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

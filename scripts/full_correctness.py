"""Driver-style correctness artifact over the FULL query registry.

The external driver's CORRECTNESS_r{N}.json caps at 50 entries (first 50
in registry iteration order). This script runs the SAME comparison —
Spark result vs DuckDB oracle at sf0.01: row count, schema, and
order-insensitive value equality with columns sorted by name — over
every registered query, and writes an artifact in the driver's exact
row format so the uncapped evidence is inspectable next to the capped
hard signal.

Usage:  python scripts/full_correctness.py [out.json] [sf_dir] [only]

``only`` is an optional comma-separated query-name list: run just
those queries and MERGE their rows into an existing ``out.json``
(new-query delta runs between full sweeps; the full sweep remains the
per-round close discipline).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_FULL.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = {n for n in (sys.argv[3].split(",") if len(sys.argv) > 3
                        else []) if n}

    from pyspark.sql import SparkSession

    # vanilla session, driver-like: per-query tune() must do all the work
    spark = (SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
             .appName("full-correctness").getOrCreate())

    from user_behavior_analysis_spark.oracle import compare_query
    from user_behavior_analysis_spark.queries import ORACLES, QUERIES

    report: dict[str, dict] = {}
    if only and os.path.exists(out_path):
        with open(out_path) as fh:
            report = json.load(fh)
    failed = 0
    for name in (n for n in QUERIES if not only or n in only):
        row: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        try:
            res = compare_query(spark, name, sf_dir)
            row["spark_rows"] = res.rows_spark
            if name not in ORACLES:
                row["err"] = "no_oracle"
            else:
                row["oracle_rows"] = res.rows_oracle
                row["rows_match"] = res.rows_spark == res.rows_oracle
                schema_bad = any("column mismatch" in e or "dtype" in e
                                 for e in res.errors)
                row["schema_match"] = not schema_bad
                row["hash_match"] = res.ok
                if not res.ok:
                    failed += 1
                    row["err"] = "; ".join(res.errors)[:500]
        except Exception as exc:  # noqa: BLE001 — artifact must be complete
            failed += 1
            row["err"] = f"{type(exc).__name__}: {exc}"[:500]
        report[name] = row
        status = ("PASS" if row["hash_match"]
                  else row["err"] or "FAIL")
        print(f"{name}: {status}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2)
    n_oracled = sum(1 for r in report.values() if r["err"] != "no_oracle")
    print(f"\nwrote {out_path}: {len(report)} queries, "
          f"{n_oracled} oracled, {failed} failures")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Generic interleaved A/B of an uncommitted optimization: for each
named query, time the full build+exec (noop sink) with the candidate
change ACTIVE vs DISABLED, alternating within one session so box drift
cannot fake a difference (the ab_fanout.py discipline, generalized).

Two toggle mechanisms:

* ``attr:<name>`` — patch ``queries.<name>`` (a function used by the
  candidate sites, e.g. a fan_out alias) to identity for the OFF arm.
* ``tag:<name>`` — add <name> to ``fanout.AB_DISABLE`` for the OFF arm;
  candidate code keeps both paths behind ``fanout.ab_on("<name>")``
  until the decision lands (then the loser path is deleted).

Usage: python scripts/ab_patch.py <toggle> <q1,q2,...> [runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    toggle = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"

    from user_behavior_analysis_spark import fanout
    from user_behavior_analysis_spark import queries as Q
    from user_behavior_analysis_spark.session import get_spark

    kind, _, name = toggle.partition(":")
    if kind == "attr":
        from user_behavior_analysis_spark.operators import dedup as D
        targets = [(m, getattr(m, name)) for m in (Q, D)
                   if hasattr(m, name)]

        def set_mode(on: bool) -> None:
            for m, real in targets:
                setattr(m, name, real if on else (lambda df: df))
    else:
        def set_mode(on: bool) -> None:
            fanout.AB_DISABLE = set() if on else {name}

    spark = get_spark("uba-ab-patch")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    Q.QUERIES["hot_items_topn"](spark, "/root/testdata/sf0.001").write \
        .format("noop").mode("overwrite").save()

    res: dict[str, dict] = {}
    for qname in names:
        best = {"off": float("inf"), "on": float("inf")}
        for _ in range(runs):
            for mode in ("off", "on"):
                set_mode(mode == "on")
                sc.setJobDescription(f"{qname}:{name}:{mode}")
                t0 = time.perf_counter()
                Q.QUERIES[qname](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best[mode] = min(best[mode], time.perf_counter() - t0)
        sc.setJobDescription(None)
        set_mode(True)
        res[qname] = {k: round(v, 3) for k, v in best.items()}
        print(f"{qname:30s} off={best['off']:6.2f}  on={best['on']:6.2f}  "
              f"delta={best['on'] - best['off']:+6.2f}", flush=True)
    out = f"/tmp/ab_{name}.json"
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    tot_off = sum(v["off"] for v in res.values())
    tot_on = sum(v["on"] for v in res.values())
    print(f"TOTAL off={tot_off:.1f}s on={tot_on:.1f}s -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

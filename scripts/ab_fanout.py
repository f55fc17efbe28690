"""Interleaved A/B of the uncommitted fan_out change: for each affected
query, time the noop-sink exec with fan_out ACTIVE vs patched to
identity, alternating within the same session so box drift cannot fake
a difference. Usage: python scripts/ab_fanout.py [runs] [sf_dir]."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_UNDER_TEST = [
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "simhash_neardup",
    "paragraph_dedup", "line_dedup", "substring_containment",
    "bm25_topk", "rrf_fusion", "ann_bruteforce_topk", "ann_blocked_topk",
    "ann_ivf_topk", "ann_lsh_topk", "ann_pq_topk", "embedding_neardup",
    "semantic_dedup_clusters", "knn_join", "media_neardup",
    "media_mixed_neardup",
]


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from user_behavior_analysis_spark import fanout
    from user_behavior_analysis_spark.operators import dedup, similarity
    from user_behavior_analysis_spark.queries import QUERIES
    from user_behavior_analysis_spark.session import get_spark

    spark = get_spark("uba-ab-fanout")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    QUERIES["hot_items_topn"](spark, "/root/testdata/sf0.001").write \
        .format("noop").mode("overwrite").save()

    real = fanout.fan_out

    def identity(df):
        return df

    def set_mode(on: bool) -> None:
        f = real if on else identity
        fanout.fan_out = f          # call-time importers (retrieval, multimodal)
        dedup.fan_out = f           # import-time binders
        similarity.fan_out = f

    res: dict[str, dict] = {}
    for name in QUERIES_UNDER_TEST:
        best = {"off": float("inf"), "on": float("inf")}
        for _ in range(runs):
            for mode in ("off", "on"):
                set_mode(mode == "on")
                sc.setJobDescription(f"{name}:{mode}")
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best[mode] = min(best[mode], time.perf_counter() - t0)
        sc.setJobDescription(None)
        res[name] = {k: round(v, 3) for k, v in best.items()}
        print(f"{name:28s} off={best['off']:6.2f}  on={best['on']:6.2f}  "
              f"delta={best['on'] - best['off']:+6.2f}", flush=True)
    set_mode(True)
    with open("/tmp/ab_fanout.json", "w") as fh:
        json.dump(res, fh, indent=1)
    tot_off = sum(v["off"] for v in res.values())
    tot_on = sum(v["on"] for v in res.values())
    print(f"TOTAL off={tot_off:.1f}s on={tot_on:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

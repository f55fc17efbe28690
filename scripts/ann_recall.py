"""Machine-readable recall evidence for the three no-oracle ANN queries
(VERDICT r3 item 6). Until now recall@k lived only inside pytest
assertions; this script measures it against the brute-force truth at
BOTH verification scale factors and writes ANN_RECALL_r0N.json next to
the CORRECTNESS artifacts, so the approximate-by-design queries carry
inspectable per-round evidence the same way the oracled ones do.

Usage: python scripts/ann_recall.py [r04]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from user_behavior_analysis_spark.queries import QUERIES  # noqa: E402
from user_behavior_analysis_spark.session import get_spark  # noqa: E402

#: asserted bound per query — same numbers the unit tests enforce.
#: IVF probes half its cells; IVF-PQ re-ranks with true cosines; RP-LSH
#: is the training-free sanity twin on weak-signal (near-random)
#: embeddings, hence the looser bound.
THRESHOLDS = {
    "ann_ivf_topk": 0.7,
    "ann_pq_topk": 0.7,
    "ann_lsh_topk": 0.2,
}

SF_DIRS = {"0.01": "/root/testdata/sf0.01", "0.1": "/root/testdata/sf0.1"}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r04"
    spark = get_spark("ann-recall")
    out: dict = {"k": 5, "thresholds": THRESHOLDS, "sf": {}}
    for sf, sf_dir in SF_DIRS.items():
        t0 = time.time()
        brute = QUERIES["ann_bruteforce_topk"](spark, sf_dir).toPandas()
        truth = set(zip(brute["q_id"], brute["c_id"]))
        per_sf: dict = {"truth_pairs": len(truth)}
        for name in THRESHOLDS:
            pdf = QUERIES[name](spark, sf_dir).toPandas()
            got = set(zip(pdf["q_id"], pdf["c_id"]))
            per_sf[name] = {
                "recall_at_k": round(len(truth & got) / len(truth), 4),
                "returned_pairs": len(got),
            }
        per_sf["wall_s"] = round(time.time() - t0, 1)
        out["sf"][sf] = per_sf
        print(sf, per_sf, flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"ANN_RECALL_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    bad = [(n, v[n]["recall_at_k"]) for sf, v in out["sf"].items()
           for n in THRESHOLDS if v[n]["recall_at_k"] < THRESHOLDS[n]]
    if bad:
        print("BELOW THRESHOLD:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()

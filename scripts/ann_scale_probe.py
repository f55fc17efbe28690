"""ANN scale-stress probe (VERDICT r3 item 10): do the blocked/probed
embedding scans stay subquadratic when the corpus is replicated 10x/30x
— the way scripts/corpus_scale_probe.py proves it for the text-dedup
family?

Builds replicas of the sf0.1 embeddings table IN MEMORY. Each copy's
vec_id is offset and its vector perturbed by a tiny copy-dependent
delta, so copies are dense NEAR-neighbors (the worst case for blocked
pair generation: every block's population multiplies with the factor)
while cosine ordering stays non-degenerate. Measures wall time for:

- pq_topk       (IVF-PQ, registered ann_pq_topk geometry): cost model
                 O(n_queries * N * n_probe / n_cells) -> linear in N
- ivf_topk      (trained IVF, registered geometry): same linear model
- embedding_neardup_pairs: within-block pairs -> quadratic in BLOCK
                 size by construction; the probe quantifies the blow-up
                 so the operator's contract ("block first, this is the
                 verify stage") stays an informed one

A quadratic blow-up in the topk scans would show wall growing with the
SQUARE of the factor; linear-ish ratios (wall_x30 / wall_x1 ~ 30 or
much less, given fixed per-query overheads) are the pass signal.

Run: python scripts/ann_scale_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from user_behavior_analysis_spark.operators.similarity import (  # noqa: E402
    embedding_neardup_lsh_pairs, embedding_neardup_pairs, ivf_topk, pq_topk)
from user_behavior_analysis_spark.session import get_spark  # noqa: E402
from user_behavior_analysis_spark.sources import load_table  # noqa: E402


def replicate(emb, factor: int):
    copies = emb.sparkSession.range(factor).select(
        F.col("id").alias("copy"))
    return (emb.crossJoin(F.broadcast(copies))
               .select((F.col("vec_id") + F.col("copy") * 10_000_000)
                        .alias("vec_id"),
                       F.expr("transform(embedding, "
                              "x -> x + copy * 0.0001d)")
                        .alias("embedding"),
                       "label"))


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding", "label")
    q = (base.where(F.col("vec_id") < 10)
             .select(F.col("vec_id").alias("q_id"),
                     F.col("embedding").alias("q_vec"))
             .localCheckpoint(eager=True))
    out: dict = {"sf_dir": sf_dir}
    for factor in (1, 10, 30):
        emb = (base if factor == 1 else replicate(base, factor)) \
            .localCheckpoint(eager=True)  # isolate gen cost from probes
        c = emb.select(F.col("vec_id").alias("c_id"),
                       F.col("embedding").alias("c_vec"))
        row: dict = {"vectors": emb.count()}
        row["pq_topk_s"], _ = timed(
            lambda: pq_topk(q, c, k=5, m=8, n_centroids=32, rerank=256,
                            n_cells=16, n_probe=10).count())
        row["ivf_topk_s"], _ = timed(
            lambda: ivf_topk(q, c, k=5, n_cells=8, n_probe=4).count())
        if factor <= 10:
            # the label-block predecessor, kept for the A/B: its block
            # population multiplies with the factor (O(ΣB²) — 217× wall
            # at 30× in r4), so the 30× leg is skipped by design.
            row["neardup_label_s"], row["neardup_label_pairs"] = timed(
                lambda: embedding_neardup_pairs(
                    emb, "vec_id", "embedding", "label",
                    threshold=0.999).count())
        # the round-5 re-key: RP-LSH cell blocks with the planes knob
        # sized 2^planes ∝ N/100 (target ~100 vectors/bucket) — the way
        # the operator is driven at scale. Candidates then track
        # N×bucket_size (linear), not block_population² (quadratic).
        import math
        n = row["vectors"]
        planes = max(6, math.ceil(math.log2(max(n, 2) / 100)))
        row["neardup_lsh_planes"] = planes
        row["neardup_lsh_s"], row["neardup_lsh_pairs"] = timed(
            lambda: embedding_neardup_lsh_pairs(
                emb, "vec_id", "embedding", threshold=0.999,
                n_tables=8, n_planes=planes, residual_col="label").count())
        emb.unpersist()
        out[f"x{factor}"] = row
        print(json.dumps({f"x{factor}": row}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

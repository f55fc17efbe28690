"""Corpus scale-stress probe: do the candidate-bucketed dedup shapes
stay subquadratic when near-duplicate density goes pathological?

Builds 10x / 30x replicas of the sf0.1 documents table IN MEMORY (each
copy's doc_id offset, text perturbed with a copy suffix so copies are
near-dups, not exact dups — the worst case for LSH/SimHash banding:
every bucket's size multiplies with the replication factor while the
caps fight back). Measures wall time and emitted candidate counts for
the operator cores. A quadratic blow-up shows up as runtime growing
with the SQUARE of the factor; the caps + banding should hold growth
near-linear in rows + linear in (capped) candidates.

Run: python scripts/corpus_scale_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from user_behavior_analysis_spark.operators.dedup import (  # noqa: E402
    allpairs_jaccard_join, minhash_lsh_pairs, simhash_neardup_pairs)
from user_behavior_analysis_spark.session import get_spark  # noqa: E402
from user_behavior_analysis_spark.sources import load_table  # noqa: E402


def replicate(docs, factor: int):
    # copy 0 keeps the base text VERBATIM (no " c0" suffix) so the
    # unreplicated x1 corpus and copy 0 of the xN corpus are identical
    # — token-sensitive queries then measure pure scale growth, not a
    # one-token text delta (ADVICE r8).
    copies = docs.sparkSession.range(factor).select(
        F.col("id").alias("copy"))
    return (docs.crossJoin(F.broadcast(copies))
                .select((F.col("doc_id") + F.col("copy") * 10_000_000)
                         .alias("doc_id"),
                        F.when(F.col("copy") == 0, F.col("text"))
                         .otherwise(F.concat_ws(
                             " ", "text",
                             F.concat(F.lit("c"), "copy")))
                         .alias("text"),
                        "lang", "source"))


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("corpus-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "lang", "source")
    out: dict = {"sf_dir": sf_dir}
    for factor in (1, 10, 30):
        docs = (base if factor == 1 else replicate(base, factor)) \
            .localCheckpoint(eager=True)  # isolate gen cost from probes
        n_docs = docs.count()
        row: dict = {"docs": n_docs}
        row["minhash_lsh_s"], row["minhash_pairs"] = timed(
            lambda: minhash_lsh_pairs(docs, "text", "doc_id").count())
        row["simhash_s"], row["simhash_pairs"] = timed(
            lambda: simhash_neardup_pairs(docs, "text", "doc_id").count())
        if factor <= 10:
            # The lossless join's OUTPUT is Θ(families x k^2) by
            # definition (every true pair must be emitted) — the probe
            # checks wall time tracks the output+input size, i.e. no
            # blow-up beyond what the answer itself costs. x30's 2M+
            # mandatory output rows measure printer speed, not the
            # algorithm, so the probe stops at x10.
            row["allpairs_s"], row["allpairs_pairs"] = timed(
                lambda: allpairs_jaccard_join(docs, "text", "doc_id",
                                              threshold=0.6).count())
        docs.unpersist()
        out[f"x{factor}"] = row
        print(json.dumps({f"x{factor}": row}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

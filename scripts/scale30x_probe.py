"""30x corpus stress for the round-7 pair-family redesigns (VERDICT r7
item 1): the df-capped n-gram Jaccard, the hub-capped triangle count,
the corpus-wide knn_join, and semantic_dedup_clusters are cured at the
10x domain — this probe re-measures them at x30 under the WORST-CASE
near-dup replication recipe (corpus_scale_probe's: every copy of a doc
is a near-dup of every other copy, so family sizes — and with them
bucket populations and shingle dfs — multiply with the factor while
the caps and derived knobs fight back).

Pass criteria (the r7 done-criterion, recorded per row):

* wall growth at x30 is <= the OUTPUT growth for output-bound ops
  (near-dup pairs of f-sized families are Theta(f^2) by definition)
  and <= factor x slack for input-bound ops — never superlinear in
  input alone;
* the derived knobs MOVE with the corpus: the jaccard df-cap and the
  LSH plane count are re-derived per factor and the probe asserts the
  x30 values exceed the x1 values (a fixed knob silently reopens the
  cliff the derivation closed).

Run: python scripts/scale30x_probe.py [sf_dir]  (writes
SCALE30X_r08.json next to the repo root).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.corpus_scale_probe import replicate  # noqa: E402
from user_behavior_analysis_spark.queries import QUERIES  # noqa: E402
from user_behavior_analysis_spark.operators.dedup import (  # noqa: E402
    dedup_clusters, ngram_jaccard_pairs)
from user_behavior_analysis_spark.operators.graph import (  # noqa: E402
    count_triangles)
from user_behavior_analysis_spark.operators.similarity import (  # noqa: E402
    embedding_neardup_lsh_pairs, knn_join_lsh)
from user_behavior_analysis_spark.queries import (  # noqa: E402
    _EMB_LSH_TABLES, _JACCARD_THRESHOLD, _KNN_JOIN_K, _NEARDUP_COS,
    _TRIANGLE_HUB_CAP, _emb_lsh_planes, _jaccard_df_cap)
from user_behavior_analysis_spark.session import get_spark  # noqa: E402
from user_behavior_analysis_spark.sources import load_table  # noqa: E402


def replicate_embeddings(emb, factor: int):
    """Near-dup embedding replicas: copy i offsets vec_id and nudges
    ONE coordinate by i * 1e-6 — cosines between copies stay ~1 (every
    copy family lands in the same LSH cells: the banding worst case)
    while copies are not bit-identical."""
    copies = emb.sparkSession.range(factor).select(
        F.col("id").alias("copy"))
    return (emb.crossJoin(F.broadcast(copies))
               .select((F.col("vec_id") + F.col("copy") * 10_000_000)
                        .alias("vec_id"),
                       F.expr("transform(embedding, (x, i) -> "
                              "CAST(x AS DOUBLE) + IF(i = 0, "
                              "copy * 1e-6, 0D))").alias("embedding"),
                       "label"))


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale30x-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "lang", "source")
    emb0 = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding", "label")
    out: dict = {"sf_dir": sf_dir, "factors": [1, 10, 30]}
    knobs: dict = {}
    for factor in (1, 10, 30):
        docs = (docs0 if factor == 1 else replicate(docs0, factor)) \
            .localCheckpoint(eager=True)
        emb = (emb0 if factor == 1 else replicate_embeddings(emb0, factor)) \
            .localCheckpoint(eager=True)
        n_docs, n_vecs = docs.count(), emb.count()
        cap = _jaccard_df_cap(n_docs)
        planes = _emb_lsh_planes(n_vecs)
        knobs[f"x{factor}"] = {"df_cap": cap, "n_planes": planes}
        row: dict = {"docs": n_docs, "vecs": n_vecs,
                     "df_cap": cap, "n_planes": planes}

        pairs = ngram_jaccard_pairs(docs, "text", "doc_id",
                                    threshold=_JACCARD_THRESHOLD,
                                    df_cap=cap)
        row["jaccard_s"], row["jaccard_pairs"] = timed(pairs.count)
        staged = pairs.localCheckpoint(eager=True)
        row["tri_capped_s"], row["tri_capped"] = timed(
            lambda: count_triangles(staged, a="doc_a", b="doc_b",
                                    hub_cap=_TRIANGLE_HUB_CAP)
            .first()["n_triangles"])
        staged.unpersist()

        row["knn_join_s"], row["knn_rows"] = timed(
            lambda: knn_join_lsh(emb, "vec_id", "embedding",
                                 k=_KNN_JOIN_K,
                                 n_tables=_EMB_LSH_TABLES,
                                 n_planes=planes,
                                 residual_col="label").count())
        row["semantic_clusters_s"], row["semantic_rows"] = timed(
            lambda: dedup_clusters(
                emb,
                embedding_neardup_lsh_pairs(
                    emb, "vec_id", "embedding", threshold=_NEARDUP_COS,
                    n_tables=_EMB_LSH_TABLES, n_planes=planes,
                    residual_col="label")
                .select(F.col("id_a").alias("doc_a"),
                        F.col("id_b").alias("doc_b")),
                id_col="vec_id").count())

        # round-8 retrieval/decontam family: the ×factor replication is
        # ALSO their worst case — every token/8-gram/fingerprint df
        # multiplies with the factor (saturated postings), while the
        # query set (doc_id < 8) and the benchmark prefix (doc_id < 50)
        # stay the ORIGINAL fixed docs (copy 0 keeps base ids) — the
        # constant-side asymmetry both plans bet on. Served from a tmp
        # sf-layout dir so the registered queries run untouched.
        qdir = f"/tmp/scale30x_docs_x{factor}"
        docs.write.mode("overwrite").parquet(f"{qdir}/documents.parquet")
        try:
            for qname, key in (("bm25_topk", "bm25"),
                               ("rrf_fusion", "rrf"),
                               ("benchmark_decontam", "decontam")):
                row[f"{key}_s"], row[f"{key}_rows"] = timed(
                    lambda qn=qname: QUERIES[qn](spark, qdir).count())
        finally:
            shutil.rmtree(qdir, ignore_errors=True)  # up to 30x parquet
        docs.unpersist()
        emb.unpersist()
        out[f"x{factor}"] = row
        print(json.dumps({f"x{factor}": row}), flush=True)

    # derived knobs must MOVE with the corpus
    assert knobs["x30"]["df_cap"] > knobs["x1"]["df_cap"], knobs
    assert knobs["x30"]["n_planes"] > knobs["x1"]["n_planes"], knobs
    # wall vs output/input growth summary per op
    summary = {}
    for op, outcol in (("jaccard", "jaccard_pairs"),
                       ("tri_capped", None),
                       ("knn_join", "knn_rows"),
                       ("semantic_clusters", "semantic_rows"),
                       ("bm25", "bm25_rows"),
                       ("rrf", "rrf_rows"),
                       ("decontam", "decontam_rows")):
        w = out["x30"][f"{op}_s"] / max(out["x1"][f"{op}_s"], 1e-9)
        g = {"wall_x30_over_x1": round(w, 1)}
        if outcol:
            g["output_x30_over_x1"] = round(
                out["x30"][outcol] / max(out["x1"][outcol], 1), 1)
        g["input_x30_over_x1"] = 30.0
        summary[op] = g
    out["summary"] = summary
    print(json.dumps({"summary": summary}), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE30X_r08.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

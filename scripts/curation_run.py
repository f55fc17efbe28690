"""End-to-end corpus curation run — the engine as a PRODUCT, not a
query registry: the full RefinedWeb-style funnel over a raw documents
table:

1. quality gate           (doc-level filter)
2. paragraph/unit dedup   (BODY REWRITE — repeated units stripped,
                           emptied docs dropped)
3. substring containment  (excerpt screen: docs mostly contained in an
                           earlier/larger doc are dropped)
4. near-dup removal       (LSH candidates → Jaccard verify →
                           connected components, keep-first)
5. multimodal screen      (codec-free byte-payload near-dup: exact
                           byte-dups dropped keep-lowest, histogram
                           near-dups reported — round 9, VERDICT r8 #6)
6. eval-set gate          (benchmark 8-gram decontamination: ≥3 shared
                           grams with the constant benchmark prefix →
                           dropped — round 9, VERDICT r8 #6)
7. materialize            (lang-partitioned sorted parquet + gzip
                           JSONL interchange)

Every stage is one of the registry's oracled operators — this script
only composes and materializes. Stage survivors are intersected with
left-semi joins (no payload duplication); stage 2 REWRITES the text
column, and all later stages (and the layout write) consume the
rewritten bodies. The final write goes through
sinks.write_optimized_layout so the output is directory-pruned +
row-group-sorted for downstream trainers.

Run: python scripts/curation_run.py [sf_dir] [out_dir]
Prints one JSON report line:
{"input": N, "quality_kept": N, "para_kept": N, "containment_kept": N,
 "dedup_kept": N, "written": N, ...}
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from user_behavior_analysis_spark.operators.dedup import (  # noqa: E402
    containment_pairs, dedup_clusters, minhash_lsh_pairs,
    unit_dedup_reconstruct, verify_pairs_jaccard)
from user_behavior_analysis_spark.queries import QUERIES  # noqa: E402
from user_behavior_analysis_spark.session import get_spark  # noqa: E402
from user_behavior_analysis_spark.sinks import (  # noqa: E402
    write_jsonl, write_optimized_layout)
from user_behavior_analysis_spark.sources import load_table  # noqa: E402


def run(spark, sf_dir: str, out_dir: str,
        jaccard_threshold: float = 0.8,
        containment_permille: int = 800,
        table_path: str | None = None) -> dict:
    t0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")
    n_input = docs.count()

    # 1. quality gate (zero-shuffle scan; same operator the
    #    quality_filter registry query runs)
    quality = QUERIES["quality_filter"](spark, sf_dir)
    q_keep = quality.where(F.col("keep")).select("doc_id")
    survivors = docs.join(q_keep, "doc_id", "left_semi") \
                    .localCheckpoint(eager=True)
    n_quality = survivors.count()

    # 2. paragraph/unit dedup — the BODY REWRITE stage: repeated units
    #    keep only their globally first occurrence, every later stage
    #    reads the cleaned bodies. Docs whose every unit first appeared
    #    elsewhere collapse to '' and are dropped here (they carry no
    #    novel text). Token-chunk units on this corpus; split_lines=True
    #    on real newline-bearing crawls — same operator either way.
    rewritten = unit_dedup_reconstruct(survivors, "text", "doc_id",
                                       unit_tokens=20)
    survivors = (survivors.drop("text")
                 .join(rewritten.where(F.col("n_kept") > 0)
                                .select("doc_id",
                                        F.col("cleaned_text")
                                         .alias("text")),
                       "doc_id")
                 .localCheckpoint(eager=True))
    n_para = survivors.count()
    n_para_rewritten = rewritten.where(
        (F.col("n_kept") > 0) & (F.col("n_kept") < F.col("n_units"))
    ).count()

    # 3. substring-containment excerpt screen on the cleaned bodies:
    #    a doc ≥80% contained (by winnowing fingerprints) in another is
    #    the quote/excerpt/template case whole-doc MinHash misses —
    #    drop the CONTAINED side (fewer fingerprints; tiebreak: the
    #    later doc_id), keep the containing original.
    cont = containment_pairs(survivors, "text", "doc_id") \
        .where(F.col("containment_permille") >= containment_permille)
    drop_contained = cont.select(
        F.when(F.col("na") < F.col("nb"), F.col("doc_a"))
         .when(F.col("nb") < F.col("na"), F.col("doc_b"))
         .otherwise(F.greatest("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    survivors = survivors.join(drop_contained, "doc_id", "left_anti") \
                         .localCheckpoint(eager=True)
    n_containment = survivors.count()

    # 4. near-dup removal on the screened survivors: LSH candidates →
    #    candidate-restricted exact Jaccard → connected components →
    #    keep the smallest doc_id per cluster
    cand = minhash_lsh_pairs(survivors, "text", "doc_id")
    verified = verify_pairs_jaccard(survivors, cand, "text", "doc_id",
                                    threshold=jaccard_threshold)
    clusters = dedup_clusters(survivors, verified)
    d_keep = clusters.where(F.col("keep")).select("doc_id")
    curated = survivors.join(d_keep, "doc_id", "left_semi") \
                       .localCheckpoint(eager=True)
    n_dedup = curated.count()

    # 5. multimodal screen on the survivors' byte payloads (utf-8 text
    #    bytes here — the media_metadata convention; on a real media
    #    corpus this column is the binary payload): byte-identical
    #    payloads drop keep-lowest; histogram near-dups (cos >= 0.999,
    #    not byte-equal) are REPORTED, not dropped — on a single-format
    #    corpus the histogram signal is a screen, not a verdict.
    from user_behavior_analysis_spark.operators.multimodal import (
        media_neardup_topk)
    from user_behavior_analysis_spark.queries import (
        _MEDIA_ND_CAP, _MEDIA_ND_K, _MEDIA_ND_PLANES, _MEDIA_ND_SEED,
        _MEDIA_ND_TABLES)
    payloads = curated.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    nd = media_neardup_topk(payloads, "doc_id", "payload",
                            k=_MEDIA_ND_K, n_tables=_MEDIA_ND_TABLES,
                            n_planes=_MEDIA_ND_PLANES,
                            bucket_cap=_MEDIA_ND_CAP,
                            seed=_MEDIA_ND_SEED) \
        .localCheckpoint(eager=True)
    exact = nd.where(F.col("exact_dup"))
    n_media_exact_pairs = exact.count()
    n_media_near_pairs = nd.where(
        (~F.col("exact_dup")) & (F.col("cos") >= 0.999)).count()
    drop_media = exact.select(
        F.greatest("doc_a", "doc_b").alias("doc_id")).distinct()
    curated = curated.join(drop_media, "doc_id", "left_anti") \
                     .localCheckpoint(eager=True)
    n_media = curated.count()

    # 6. eval-set gate (the benchmark_decontam registry query's algebra
    #    on the curated bodies): the constant benchmark prefix's
    #    distinct 8-grams broadcast against the survivors' n-gram
    #    stream; >= DROP_AT distinct shared grams -> dropped.
    from user_behavior_analysis_spark.functions.text import (
        tokens, word_ngrams)
    from user_behavior_analysis_spark.queries import (
        _DECONTAM_DROP_AT, _DECONTAM_EVAL_MAX, _DECONTAM_N)
    ng = (curated.withColumn("toks", tokens("text"))
                 .select("doc_id",
                         F.explode(word_ngrams("toks", _DECONTAM_N))
                          .alias("g")))
    ev = (ng.where(F.col("doc_id") < _DECONTAM_EVAL_MAX)
            .select("g").distinct())
    contaminated = (ng.where(F.col("doc_id") >= _DECONTAM_EVAL_MAX)
                      .join(F.broadcast(ev), "g")
                      .groupBy("doc_id")
                      .agg(F.countDistinct("g").alias("n_overlap")))
    n_decontam_flagged = contaminated.count()
    drop_eval = contaminated.where(
        F.col("n_overlap") >= _DECONTAM_DROP_AT).select("doc_id")
    curated = curated.join(drop_eval, "doc_id", "left_anti") \
                     .localCheckpoint(eager=True)
    n_decontam = curated.count()

    # 7. materialize: lang-partitioned, doc_id-sorted parquet (pruned
    #    scans for per-language trainers) + gzip JSONL interchange
    write_optimized_layout(curated, f"{out_dir}/parquet", ("lang",),
                           ("doc_id",))
    write_jsonl(curated.select("doc_id", "lang", "source", "text"),
                f"{out_dir}/jsonl")
    n_written = spark.read.parquet(f"{out_dir}/parquet").count()

    # 5b. optional INCREMENTAL serving table: MERGE the curated docs
    #     into a transaction-log table keyed on doc_id — re-running the
    #     funnel over a grown corpus upserts (rewritten bodies replace,
    #     new survivors insert, prior survivors carry over), giving the
    #     pipeline a versioned, time-travelable output instead of a
    #     fire-and-forget directory.
    table_info = None
    if table_path is not None:
        from user_behavior_analysis_spark.tables import TxTable

        cols = curated.select("doc_id", "lang", "source", "text")
        if os.path.isdir(os.path.join(table_path, "_log")):
            t = TxTable(spark, table_path)
            v = t.merge(cols)
        else:
            t = TxTable.create(spark, table_path,
                               cols.repartitionByRange(8, "doc_id"),
                               ["doc_id"])
            v = 0
        table_info = {"path": table_path, "version": v,
                      "rows": t.read().count()}

    by_lang = {r["lang"]: r["n"] for r in
               curated.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                      .collect()}
    report = {
        "sf_dir": sf_dir, "out_dir": out_dir,
        "input": n_input, "quality_kept": n_quality,
        "para_kept": n_para, "para_rewritten": n_para_rewritten,
        "containment_kept": n_containment,
        "dedup_kept": n_dedup,
        "media_kept": n_media,
        "media_exact_pairs": n_media_exact_pairs,
        "media_near_pairs": n_media_near_pairs,
        "decontam_kept": n_decontam,
        "decontam_flagged": n_decontam_flagged,
        "written": n_written,
        "by_lang": by_lang,
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    if table_info is not None:
        report["table"] = table_info
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark("curation-run")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, sf_dir, out_dir)))
    spark.stop()


if __name__ == "__main__":
    main()

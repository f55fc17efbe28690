"""Registry-wide physical-plan lint: build every registered query's
plan and flag the shapes that do not survive 100 TB — the global guard
behind the per-query pins in tests/test_plans.py (pins cover the
queries someone thought to pin; this sweeps all of them, every round).

Banned outright:
* CartesianProduct — an unbounded×unbounded cross never ships.
* Row-at-a-time Python UDFs (BatchEvalPython) — Arrow-batched
  mapInPandas/applyInPandas* are the only sanctioned Python surfaces.

Flagged unless allowlisted with a reason:
* BroadcastNestedLoopJoin — the theta-join cliff when BOTH sides are
  data-scaled (every interval/band/similarity join here has a
  bucketed equi-join form instead). Legitimate as the SCALAR-SUBQUERY
  shape: BuildRight/Cross with a 1-row (or otherwise bounded)
  aggregate build side — broadcasting one row is free at any scale.
  Spot-verified for every allowlisted query (all are
  `BuildRight, Cross` over a partial_count/partial_sum scalar).
* Exchange SinglePartition — a serialization point. Legitimate only
  for provably-bounded relations (a final 1-row aggregate, a
  <=|days|-row sketch union, a global-rank tail over pre-limited
  rows); every allowlisted query documents why.

Writes PLANLINT_r{N}.json: {query: {flags: [...], allowed: reason?}}
and exits non-zero on any unallowlisted finding.

Usage: python scripts/plan_lint.py [out.json] [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANNED = ("CartesianProduct", "BatchEvalPython")

#: BroadcastNestedLoopJoin allowlist: query -> why the build side is
#: bounded (all verified BuildRight, Cross over a scalar aggregate).
BNLJ_OK = {
    "zorder_layout": "1-row global-bounds aggregate cross",
    "temperature_mix_weights": "1-row normalizer scalar cross",
    "customer_spend_deciles": "1-row decile-threshold array cross",
    "funnel_steps": "1-row funnel-total scalar cross",
    "rfm_segments": "1-row quartile-threshold scalar cross",
    "heavy_hitters_cms": "1-row sketch scalar cross",
    "curation_pipeline": "1-row stage-threshold scalar cross",
    "domain_rebalance_sample": "1-row min-source-count scalar cross",
    "important_parts": "1-row value-share total scalar cross",
    "part_pagerank": "1-row dangling-mass scalar per iteration",
    "neardup_triangles": "1-row edge/wedge-count scalar cross",
    "neardup_triangles_capped": "1-row edge/wedge-count scalar cross",
    "tfidf_top_terms": "1-row corpus-size (IDF N) scalar cross",
    "bm25_topk": "two 1-row scalar crosses (corpus size N, total "
                 "token count L) onto the tiny query-terms relation",
    "rrf_fusion": "inherits bm25_topk's two 1-row scalar crosses "
                  "(corpus size N, total token count L)",
    "lapsed_rich_customers": "1-row average-balance scalar cross",
    "ann_bruteforce_topk": "deliberate baseline: bounded 10-query "
                           "side broadcast against the corpus",
    "kmv_day_overlap": "|days|x|days| day-pair cross over two "
                       "|days|-row checkpointed aggregates (<= 435 "
                       "rows at 30 days); non-equi a<b by design",
}

#: SinglePartition allowlist: query -> why the 1-partition exchange is
#: bounded. Keep this HONEST — a new entry needs a cardinality argument.
SINGLE_PARTITION_OK = {
    # final scalar / tiny-relation aggregates (<= a few rows reach it)
    "revenue_forecast": "1-row OLS scalar over per-day partials",
    "important_parts": "broadcast-scalar total: 1-row aggregate",
    "lapsed_rich_customers": "scalar average subquery: 1-row aggregate",
    "small_qty_revenue": "per-part averages partial'd; final scalar row",
    "market_share": "per-year shares: <=2 rows reach the final agg",
    "top_supplier": "max-of-aggregate scalar: 1-row",
    "temperature_mix_weights": "normalizer over |sources| rows",
    "domain_rebalance_sample": "per-source mins over |sources| rows",
    "ab_test_conversion": "2-variant funnel: 4-row final agg",
    "data_quality_report": "6-expectation report: 6 rows",
    "event_anomaly_days": "per-day stats: |days| rows, 2-row moments",
    "uv_sketch_rollup": "period union over |days| KB sketches",
    "curation_pipeline": "per-stage survival report: |stages| rows",
    "corpus_heavy_hitters": "top-50 global rank over df-capped terms",
    "heavy_hitters_cms": "constant-size sketch merge",
    "collocation_pmi": "top-50 global rank over candidate bigrams",
    "tokenizer_fertility": "per-language ratios: |langs| rows",
    "lang_id_confusion": "|langs|^2 confusion cells",
    "histogram_quantiles": "|langs|x|bins| histogram rows",
    "lexical_diversity": "pooled TTR: |langs| rows",
    "boilerplate_ngrams": "per-source top rank over df-capped trigrams",
    "lm_bigram_surprisal": "vocab clamp: 1-row count aggregate",
    "bm25_topk": "corpus-size / total-token-count scalars: two 1-row "
                 "aggregates",
    "rrf_fusion": "inherits bm25_topk's two 1-row scalar aggregates",
    "training_shards": "two-phase prefix sum: |shards| boundary rows",
    "sequence_pack": "per-shard offsets: |shards| boundary rows",
    "stratified_split_sample": "per-language counts: |langs| rows",
    "quality_weighted_sample": "global top-k tail: k rows",
    "customer_spend_deciles": "decile thresholds: 9-row percentile agg",
    "rfm_segments": "quartile thresholds: bounded histogram rows",
    "order_value_stats": "exact percentiles: 1-row final",
    "discount_quantity_corr": "co-moment scalar: 1-row",
    "cust_order_distribution": "distribution rows: |counts| buckets",
    "revenue_trend": "per-nation OLS: |nations| rows",
    "zorder_layout": "per-bucket footer stats: |buckets| rows",
    "media_byte_histogram": "256-bin histogram merge",
    "signups_hourly_gapfilled": "1-row bounds aggregate",
    "dedup_pipeline": "survival report tail: |stages| rows",
    "txtable_change_feed": "version-window agg: |versions| rows",
    "event_transitions": "|event_types|^2 transition cells",
    "events_dow_hour_profile": "7x24 heatmap cells",
    "monthly_returns_pivot": "|months| pivoted rows",
    "returns_unpivot": "|priorities|x3 long rows",
    "funnel_steps": "3-step funnel scalar: 1 row",
    "view_purchase_funnel": "windowed funnel: |windows| rows",
    "day1_retention": "|days| cohort rows",
    "cohort_retention": "|weeks|^2 retention cells",
    "purchase_intervals": "gap histogram: |buckets| rows",
    "tx_reconciliation": "channel counts: 4 rows",
    "document_profile": "no shuffle: plan-local",
    "label_centroid_report": "|labels| centroid rows",
    "semantic_diversity_sample": "per-cell quota rows: |cells|",
    "part_pagerank": "per-iteration 1-row convergence/mass scalars",
    "neardup_triangles": "1-row global wedge/triangle count",
    "neardup_triangles_capped": "1-row global wedge/triangle count",
    "tfidf_top_terms": "1-row corpus-size scalar",
    "disjunctive_revenue": "1-row revenue scalar",
    "promo_revenue": "1-row promo-share scalar",
    "value_quantile_sketch": "period min-k merge over |days| x k "
                             "checkpointed sketch rows (<= 4k at 31 "
                             "days, k=128)",
}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANLINT.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    # optional comma-separated subset: lint just those queries and
    # MERGE into an existing artifact (full_correctness.py convention)
    only = {n for n in (sys.argv[3].split(",") if len(sys.argv) > 3
                        else []) if n}

    from user_behavior_analysis_spark.queries import QUERIES
    from user_behavior_analysis_spark.session import get_spark

    spark = get_spark("plan-lint")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {}
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            report = json.load(f)["queries"]
    hard_fail = 0
    for name, fn in ((n, f) for n, f in QUERIES.items()
                     if not only or n in only):
        row: dict = {"flags": []}
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple")
        except Exception as exc:  # noqa: BLE001 — lint must complete
            row["flags"].append(f"PLAN_ERROR: {type(exc).__name__}")
            hard_fail += 1
            report[name] = row
            continue
        for bad in BANNED:
            if bad in plan:
                row["flags"].append(bad)
                hard_fail += 1
        if "BroadcastNestedLoopJoin" in plan:
            why = BNLJ_OK.get(name)
            if why:
                row["allowed_bnlj"] = why
            else:
                row["flags"].append("BroadcastNestedLoopJoin (no "
                                    "allowlist reason)")
                hard_fail += 1
        if "Exchange SinglePartition" in plan:
            why = SINGLE_PARTITION_OK.get(name)
            if why:
                row["allowed"] = why
            else:
                row["flags"].append("Exchange SinglePartition (no "
                                    "allowlist reason)")
                hard_fail += 1
        report[name] = row
    n_flagged = sum(1 for r in report.values() if r["flags"])
    summary = {"queries": len(report), "flagged": n_flagged,
               "allowlisted_single_partition": sum(
                   1 for r in report.values() if "allowed" in r),
               "allowlisted_bnlj": sum(
                   1 for r in report.values() if "allowed_bnlj" in r)}
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": report}, f, indent=1)
    print(json.dumps(summary))
    for name, r in report.items():
        if r["flags"]:
            print(f"FLAG {name}: {r['flags']}")
    return 1 if hard_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

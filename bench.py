#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query is forced through the noop sink (full JVM-side materialization
— no driver collect, no Python transfer), which is the honest analog of
writing results to a table at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headliners: the reference-parity flagship plus one per operator family.
BENCH_QUERIES = [
    "hot_items_topn",
    "page_view_hourly",
    "unique_visitors_hourly",
    "marketing_by_channel",
    "ad_stats_by_geo",
    "ad_blacklist_passthrough",
    "login_fail_cep",
    "order_timeout",
    "tx_match_interval_join",
    "tx_reconciliation",
    "user_sessions",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "revenue_forecast",
    "order_priority_count",
    "returned_item_losses",
    "promo_revenue",
    "nation_rollup",
    "repeat_buyers",
    "order_value_stats",
    "marketing_total",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_pipeline",
    "simhash_neardup",
    "big_spender_orders",
    "day1_retention",
    "event_transitions",
    "rolling_active_users",
    "funnel_steps",
    "bilateral_trade",
    "discount_quantity_corr",
    "customer_spend_deciles",
    "dedup_ngram_jaccard",
    "simhash_fingerprints",
    "ann_bruteforce_topk",
    "market_share",
    "cust_order_distribution",
    "top_supplier",
    "small_qty_revenue",
    "disjunctive_revenue",
    "sole_return_supplier",
    "lapsed_rich_customers",
    "corpus_heavy_hitters",
    "stratified_split_sample",
    "tfidf_top_terms",
    "cross_source_contamination",
    "last_touch_attribution",
    "props_key_stats",
    "ann_pq_topk",
    "neardup_triangles",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "document_profile",
    "token_stats",
    "rolling_fingerprints",
    "quality_filter",
    "basket_pairs",
    "part_pagerank",
    "cohort_retention",
    "purchase_intervals",
    "event_anomaly_days",
    "collocation_pmi",
    "doc_repetition",
    "semantic_dedup_clusters",
    "customer_running_spend",
    "events_dow_hour_profile",
    "part_supplier_diversity",
    "monthly_returns_pivot",
    "returns_unpivot",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from user_behavior_analysis_spark.queries import QUERIES
    from user_behavior_analysis_spark.session import get_spark

    spark = get_spark("uba-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM + codegen warmup on the smallest SF so per-query numbers
    # measure the plan, not first-call overhead.
    QUERIES["hot_items_topn"](spark, "/root/testdata/sf0.001").write \
        .format("noop").mode("overwrite").save()

    # Best-of-2 per query: this box is a shared VM and transient CPU
    # throttling has been observed to inflate identical plans 10x; the
    # min of two back-to-back runs measures the plan, not the neighbor.
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Physical-plan shape assertions (the 100 TB posture, checked cheaply).

These tests never execute the queries — they assert on explain output
("simple" mode: operator arguments inline), locking in the properties
that matter at scale: filters reaching the parquet scan, column pruning,
dimension broadcasts, and facts never becoming broadcast builds.
"""

import re

from pyspark.sql import functions as F

from user_behavior_analysis_spark.queries import QUERIES


def plan_of(spark, name, sf_dir, mode: str = "simple") -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def test_revenue_forecast_pushdown_and_pruning(spark, sf_dir):
    # formatted mode: simple truncates PushedFilters at 100 chars
    plan = plan_of(spark, "revenue_forecast", sf_dir, mode="formatted")
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan).group(1)
    # all the predicates must reach the parquet reader
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    read = re.search(r"ReadSchema: struct<(.*?)>", plan).group(1)
    cols = {c.split(":")[0] for c in read.split(",")}
    assert cols == {"l_shipdate", "l_discount", "l_quantity",
                    "l_extendedprice"}, f"over-read: {cols}"


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, "pricing_summary", sf_dir)
    # partial + final HashAggregate pair around one exchange — the
    # map-side combine the reference hand-built (SURVEY.md §2.4 A2)
    assert plan.count("HashAggregate") >= 2
    assert "hashpartitioning(l_returnflag" in plan


def test_shipping_priority_fact_join_is_shuffle(spark, sf_dir):
    plan = plan_of(spark, "shipping_priority", sf_dir)
    # orders⋈customer is fact-derived (~10% of orders): it must NOT be a
    # broadcast build — the orderkey fact-fact join is pinned shuffle-hash
    # so both facts exchange once and the plan survives a 100× scale-up
    assert re.search(
        r"ShuffledHashJoin \[l_orderkey#\d+L?\], \[o_orderkey#\d+L?\]",
        plan), plan
    # the only BroadcastHashJoin allowed is the true dim (customer)
    assert not re.search(
        r"BroadcastHashJoin \[l_orderkey#\d+L?\]", plan), plan


def test_local_supplier_volume_fact_join_is_shuffle(spark, sf_dir):
    plan = plan_of(spark, "local_supplier_volume", sf_dir)
    # the orderkey fact-fact join is pinned to shuffle-hash: both sides
    # exchange on orderkey, neither becomes a broadcast build
    assert re.search(
        r"ShuffledHashJoin \[l_orderkey#\d+L?\], \[o_orderkey#\d+L?\]",
        plan), plan


def test_hot_items_rank_uses_window_group_limit(spark, sf_dir):
    plan = plan_of(spark, "hot_items_topn", sf_dir)
    # top-N must prune before the final sort: WindowGroupLimit keeps 5
    # rows per window partition ahead of the rank shuffle
    assert "WindowGroupLimit" in plan


def test_token_stats_is_scan_only(spark, sf_dir):
    plan = plan_of(spark, "token_stats", sf_dir)
    assert "Exchange" not in plan, "token_stats must not shuffle"


def test_order_priority_is_semi_join(spark, sf_dir):
    plan = plan_of(spark, "order_priority_count", sf_dir)
    assert "LeftSemi" in plan

def test_big_spender_fact_joins_are_shuffle(spark, sf_dir):
    plan = plan_of(spark, "big_spender_orders", sf_dir)
    # the HAVING-filtered per-order rollup is fact-derived: tiny at test
    # scale, fact-sized at 100× — both downstream joins must be pinned
    # shuffle-hash builds, never BroadcastExchange
    assert re.search(
        r"ShuffledHashJoin \[l_orderkey#\d+L?\], \[o_orderkey#\d+L?\]",
        plan), plan
    assert re.search(
        r"ShuffledHashJoin \[o_custkey#\d+L?\], \[c_custkey#\d+L?\]",
        plan), plan
    assert "BroadcastExchange" not in plan, plan


def test_simhash_neardup_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, "simhash_neardup", sf_dir)
    # band-bucket equality must drive the self-join (hash exchange on
    # band+bucket), with the Hamming check as a residual — never a
    # cartesian/BNLJ all-pairs stage
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan

def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    """Co-located join: two tables bucketed by the join key into the
    same bucket count must join with ZERO Exchange in the plan — the
    write-once/join-many primitive for repeated fact-fact joins."""
    from pyspark.sql import functions as F

    from user_behavior_analysis_spark.sinks import write_bucketed
    from user_behavior_analysis_spark.sources import load_table
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    write_bucketed(li, "bk_lineitem", ("l_orderkey",), 8,
                   path=str(base / "li"))
    write_bucketed(orders, "bk_orders", ("o_orderkey",), 8,
                   path=str(base / "ord"))
    abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("bk_lineitem")
             .join(spark.table("bk_orders"),
                   F.col("l_orderkey") == F.col("o_orderkey")))
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j.queryExecution() if hasattr(j, "queryExecution")
            else j._jdf.queryExecution(), "simple")
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan, plan
        # and the data actually joins correctly
        n = j.count()
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")
        spark.sql("DROP TABLE IF EXISTS bk_orders")


def test_disjunctive_revenue_pushes_per_side_weakenings(spark, sf_dir):
    # Q19 shape: the OR's per-table weakenings must reach BOTH scans —
    # quantity bounds on lineitem, brand/size disjunction on part.
    plan = plan_of(spark, "disjunctive_revenue", sf_dir, mode="formatted")
    pushed = re.findall(r"PushedFilters: \[(.*?)\]\n", plan)
    li_pushed = [p for p in pushed if "l_quantity" in p]
    part_pushed = [p for p in pushed if "p_brand" in p]
    assert li_pushed and "LessThanOrEqual(l_quantity,30.0)" in li_pushed[0], pushed
    assert part_pushed and "Brand#12" in part_pushed[0], pushed


def test_cust_order_distribution_join_and_agg_share_shuffle(spark, sf_dir):
    # Q13 shape: orders (the fact) must not broadcast; the left-outer
    # join shuffles on custkey and the per-customer count reuses that
    # partitioning — exactly 2 exchanges feed the first agg (one per
    # join side), plus 1 for the tiny final distribution agg.
    plan = plan_of(spark, "cust_order_distribution", sf_dir)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 3, plan


def test_sole_return_supplier_stats_never_broadcast(spark, sf_dir):
    # Q21 shape: the per-order stats aggregate is order-cardinality
    # (grows with the fact) — it must stay a shuffle build.
    plan = plan_of(spark, "sole_return_supplier", sf_dir)
    assert re.search(
        r"ShuffledHashJoin \[l_orderkey#\d+L?\], \[st_orderkey#\d+L?\]",
        plan), plan


def test_sole_return_supplier_no_distinct_expand(spark, sf_dir):
    # r9: both correlation sides derive from ONE (orderkey, suppkey)
    # grouping — the two-countDistinct Expand (2x every lineitem row
    # through the aggregate) must stay gone, and the two branch scans
    # must stay byte-identical (same pushed not-null filters) so AQE
    # stage-reuses the shared shuffle instead of scanning twice.
    plan = plan_of(spark, "sole_return_supplier", sf_dir)
    assert "Expand" not in plan, plan
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    lineitem = [s for s in scans if "l_orderkey" in s]
    assert len(lineitem) == 2 and lineitem[0] == lineitem[1], scans


def test_market_share_single_fact_fact_shuffle(spark, sf_dir):
    # Q8 shape: every dim chain broadcasts; lineitem⋈orders is the only
    # shuffle join and it is pinned (a fact must never broadcast).
    plan = plan_of(spark, "market_share", sf_dir)
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert not re.search(
        r"BroadcastHashJoin \[l_orderkey#\d+L?\]", plan), plan


def test_asof_join_is_single_exchange(spark, sf_dir):
    # the union-tag as-of join must cost exactly ONE exchange (the window's
    # partitionBy) before its aggregate — no join exchanges, no broadcast
    plan = plan_of(spark, "last_touch_attribution", sf_dir)
    assert "Window" in plan, plan
    # exchanges: one pre-agg for touch dedupe reuses the window's? count all:
    # (1) groupBy(user_id, ts) dedupe, (2) window on user_id, (3) final
    # touch-keyed aggregate — and nothing else
    assert plan.count("Exchange hashpartitioning") == 3, plan
    assert "BroadcastHashJoin" not in plan and "SortMergeJoin" not in plan, plan


def test_tfidf_vocabulary_join_is_shuffle(spark, sf_dir):
    # the document-frequency side grows with the corpus vocabulary — it
    # must never become a broadcast build; per-doc top-3 must prune via
    # WindowGroupLimit before the rank
    plan = plan_of(spark, "tfidf_top_terms", sf_dir)
    assert "ShuffledHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_basket_pairs_no_cartesian(spark, sf_dir):
    """The basket self-join is an equi-join on the basket key — any
    cartesian/nested-loop here would be quadratic in lineitems."""
    plan = plan_of(spark, "basket_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_event_anomaly_stats_are_broadcast(spark, sf_dir):
    """The per-type stats table (|event_type| rows) must broadcast back
    onto the daily counts — never shuffle the daily side for a 5-row
    join."""
    plan = plan_of(spark, "event_anomaly_days", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_doc_repetition_is_scan_only(spark, sf_dir):
    plan = plan_of(spark, "doc_repetition", sf_dir)
    # the repetition gate is row-local array math: no KEYED shuffle
    # anywhere — the only data movement allowed is the round-robin
    # map-parallelism floor (fanout.fan_out, round 9), which is an
    # identity at production scan widths; a hashpartitioning exchange
    # would mean the per-doc filter started shuffling the corpus
    assert "hashpartitioning" not in plan, plan
    assert plan.count("Exchange") <= 1, plan
    if "Exchange" in plan:
        assert "RoundRobinPartitioning".lower() in plan.lower(), plan


def test_collocation_vocabulary_joins_are_shuffle(spark, sf_dir):
    plan = plan_of(spark, "collocation_pmi", sf_dir)
    # both unigram-count joins are against the corpus VOCABULARY, which
    # grows with the corpus: they must be shuffle-hash, never broadcast
    # builds (the shipping_priority lesson applied to text)
    assert plan.count("ShuffledHashJoin") >= 2, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_running_spend_single_window_operator(spark, sf_dir):
    plan = plan_of(spark, "customer_running_spend", sf_dir)
    # all three window frames must share one (partition, order) spec —
    # differently-sorted specs would multiply the sort cost at scale.
    # Asserted directionally (robust to explain-rendering changes):
    # exactly one Window OPERATOR (word-bounded so WindowGroupLimit
    # can't satisfy it), and every shuffle in the plan is a custkey
    # hash exchange (i.e. the single one that feeds the Window).
    assert len(re.findall(r"\bWindow \[", plan)) == 1, plan
    exchanges = re.findall(r"\bExchange \w+\([^)]*\)", plan)
    assert exchanges and all("o_custkey" in e for e in exchanges), plan


def test_part_diversity_joins_never_broadcast(spark, sf_dir):
    plan = plan_of(spark, "part_supplier_diversity", sf_dir)
    # the supplier exclusion list is fact-derived and part scales with
    # SF — both joins must stay shuffle-hash, no broadcast builds
    assert plan.count("ShuffledHashJoin") >= 2, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_pq_scoring_joins_on_cell_key(spark, sf_dir):
    plan = plan_of(spark, "ann_pq_topk", sf_dir)
    # IVF-PQ: ADC scoring must hash-join on the coarse cell id so each
    # query touches O(N * n_probe / n_cells) codes — the flat variant's
    # non-equi broadcast degenerated to a nested-loop scan of ALL codes
    assert re.search(r"BroadcastHashJoin \[cell#\d+\]", plan), plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_boilerplate_df_join_is_shuffle(spark, sf_dir):
    """The trigram document-frequency table is corpus-scaled: its join
    back onto the instance stream must be shuffle-hash, never a
    broadcast build that OOMs at 100x."""
    plan = plan_of(spark, "boilerplate_ngrams", sf_dir)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_best_supplier_has_no_window_sort(spark, sf_dir):
    """Q2's correlated max collapses to a map-side-combinable max_by:
    the plan must contain no Window operator (a row_number plan would
    sort every partkey group) and no fact-side SortMergeJoin."""
    plan = plan_of(spark, "best_supplier_per_part", sf_dir)
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan or "max_by" in plan, plan


def test_rebalance_sample_never_shuffles_the_fact(spark, sf_dir):
    """domain_rebalance_sample gates the scan with broadcast counts:
    the doc relation itself must reach the filter without a shuffle
    join (broadcast joins only on the kept path)."""
    plan = plan_of(spark, "domain_rebalance_sample", sf_dir)
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_training_shards_prefix_sum_is_two_phase(spark, sf_dir):
    """The global running sum must NOT funnel the corpus through one
    partition: the doc-level window is partitioned by bucket, and the
    only single-partition exchange feeds the 16-row bucket-total scan."""
    plan = plan_of(spark, "training_shards", sf_dir)
    assert "windowspecdefinition(bucket" in plan, plan
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_session_paths_reuses_user_partitioning(spark, sf_dir):
    """Sessionization (lag + cumsum windows) and the per-session
    collect_list must share ONE user_id exchange — hashpartitioning on
    user_id satisfies the (user_id, sid) aggregate's distribution."""
    plan = plan_of(spark, "session_paths", sf_dir)
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_substring_containment_joins_stay_shuffle(spark, sf_dir):
    """Every relation in the containment pipeline is corpus-scaled
    (fingerprints, df table, sizes): no join may become a broadcast
    build that OOMs at 100x."""
    plan = plan_of(spark, "substring_containment", sf_dir)
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_rfm_heavy_windows_are_bucket_partitioned(spark, sf_dir):
    """All three quartile ranks must come from bucket-PARTITIONED
    windows (distributed_rank); only the tiny |buckets|-row prefix
    scans may run single-partition."""
    plan = plan_of(spark, "rfm_segments", sf_dir)
    assert plan.count("row_number() windowspecdefinition(_bk") == 3, plan


def test_revenue_trend_broadcasts_all_dims(spark, sf_dir):
    """Q9-style trend: customer and nation broadcast into the fact
    scan; no fact-fact join exists, so no shuffle join may appear."""
    plan = plan_of(spark, "revenue_trend", sf_dir)
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_data_quality_fk_join_shapes(spark, sf_dir):
    """FK checks: the customer dim anti-join broadcasts; the orders
    (fact-scaled) anti-join is pinned shuffle-hash — a broadcast there
    OOMs at 100x (the shipping_priority rule)."""
    plan = plan_of(spark, "data_quality_report", sf_dir)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_ab_test_single_user_exchange(spark, sf_dir):
    """First-view window, conversion filter, and per-user aggregate
    must share ONE user_id exchange."""
    plan = plan_of(spark, "ab_test_conversion", sf_dir)
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_curation_pipeline_no_sort_merge(spark, sf_dir):
    """The funnel's assembly joins are |sources|-sized (broadcast) and
    the dedup stage is an aggregate, not a join — no sort-merge join
    may appear anywhere in the pipeline."""
    plan = plan_of(spark, "curation_pipeline", sf_dir)
    assert "SortMergeJoin" not in plan, plan


def test_byte_histogram_shuffles_partials_only(spark, sf_dir):
    """The Python stage pre-aggregates: the only exchange after
    MapInPandas carries (grp, bin) partials, never payload bytes."""
    plan = plan_of(spark, "media_byte_histogram", sf_dir)
    assert "MapInPandas" in plan, plan
    assert plan.count("Exchange hashpartitioning(grp") == 1, plan
    assert plan.count("Exchange") == 1, plan


def test_important_parts_reuses_partkey_shuffle(spark, sf_dir):
    """The grand-total branch must reuse the per-part aggregate's
    shuffle, not rescan lineitem: AQE dedupes the identical exchanges
    at runtime, so the EXECUTED final plan shows a ReusedExchange."""
    from user_behavior_analysis_spark.queries import QUERIES
    df = QUERIES["important_parts"](spark, sf_dir)
    df._jdf.queryExecution().executedPlan().execute().count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "ReusedExchange" in plan, plan


def test_cross_source_contamination_join_shapes(spark, sf_dir):
    """Bench-creeper pin (VERDICT r3 item 7): the winnowing-fingerprint
    self-join must stay a shuffle join (fingerprint side scales with
    the corpus — a broadcast build OOMs at 100x) and never go
    cartesian."""
    plan = plan_of(spark, "cross_source_contamination", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("ShuffledHashJoin" in plan) or ("SortMergeJoin" in plan), plan


def test_dedup_ngram_jaccard_inverted_index_shapes(spark, sf_dir):
    """Bench-creeper pin: the df-capped candidate self-join (r7) is
    corpus-scaled on both sides — shuffle join only, no cartesian, and
    the aggregations must map-side combine (partial+final pairs)."""
    plan = plan_of(spark, "dedup_ngram_jaccard", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("ShuffledHashJoin" in plan) or ("SortMergeJoin" in plan), plan
    assert plan.count("HashAggregate") >= 2, plan


def test_neardup_triangles_capped_shapes(spark, sf_dir):
    """The bounded triangle count must keep the exact form's plan
    hygiene (no cartesian, no corpus-side broadcast NLJ) while adding
    only the per-source WindowGroupLimit-able row_number cap."""
    plan = plan_of(spark, "neardup_triangles_capped", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "row_number" in plan or "RunningWindowFunction" in plan \
        or "Window" in plan, plan


def test_ann_ivf_topk_probe_join_shapes(spark, sf_dir):
    """Bench-creeper pin: IVF scoring joins the tiny probed-cells side
    into the corpus-scaled assignment — the corpus side must never be
    the broadcast build, and no cartesian may appear."""
    plan = plan_of(spark, "ann_ivf_topk", sf_dir)
    assert "CartesianProduct" not in plan, plan
    # per-query cell probe list is tiny -> broadcast IS expected; the
    # guard is that a join exists at all (not a nested-loop fallback)
    assert "Join" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_context_chunks_is_scan_only(spark, sf_dir):
    # chunking is row-local array math: one codegen scan, ZERO shuffles
    plan = plan_of(spark, "context_chunks", sf_dir)
    assert "Exchange" not in plan, plan


def test_paragraph_dedup_two_exchanges_hash_bucketed(spark, sf_dir):
    # keep-first ranking shuffles once on (xxhash64(unit), unit); the
    # doc reconstruction shuffles once on doc_id — nothing else
    plan = plan_of(spark, "paragraph_dedup", sf_dir)
    exchanges = re.findall(r"Exchange hashpartitioning\([^)]*", plan)
    assert len(exchanges) == 2, plan
    # the ranking exchange keys on the projected xxhash64(unit) bucket
    # (shows as a _w window expr) alongside the full unit string
    assert any("unit#" in e for e in exchanges), plan
    assert "xxhash64" in plan, plan


def test_lm_surprisal_vocab_is_broadcast_counts_are_shuffled(spark, sf_dir):
    # the per-lang vocab-size table (|langs| rows) must broadcast; the
    # unigram/bigram count tables are corpus-scaled and must NOT become
    # broadcast builds pinned only by test-scale size estimates
    plan = plan_of(spark, "lm_bigram_surprisal", sf_dir)
    assert plan.count("BroadcastExchange") == 1, plan


def test_price_band_revenue_is_hash_join_not_nested_loop(spark, sf_dir):
    # the whole point of band_join: the theta join must become a hash
    # join on the bucket key — never a BroadcastNestedLoopJoin
    plan = plan_of(spark, "price_band_revenue", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime Bloom-filter join pruning (Spark's runtime semi-join
    reduction): a selectively-filtered creation side must inject a
    might_contain(bloom) predicate ABOVE the fact scan, so shuffle
    input shrinks before the join. Thresholds are lowered to make the
    sf-scale sizes qualify — at 100 TB the defaults (10 GB application
    side) qualify on their own; the test pins that the MECHANISM
    engages on this build and that results are unchanged by it."""
    from pyspark.sql import functions as F

    from user_behavior_analysis_spark.sources import load_table
    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT")
        li = load_table(spark, sf_dir, "lineitem")
        j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
               .groupBy("o_orderpriority").count())
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple")
        assert "might_contain" in plan, plan
        with_bloom = {tuple(r) for r in j.collect()}
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT")
    li = load_table(spark, sf_dir, "lineitem")
    plain = {tuple(r) for r in
             (li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority").count()).collect()}
    assert with_bloom == plain


def test_semantic_diversity_sample_single_cell_exchange(spark, sf_dir):
    # the semantic cell is a pure scan expression (no shuffle to build
    # the "clustering"); the only exchange is the per-cell window
    plan = plan_of(spark, "semantic_diversity_sample", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "cell" in re.search(
        r"Exchange hashpartitioning\(([^,]*)", plan).group(1), plan


def test_allpairs_joins_stay_shuffle(spark, sf_dir):
    """Every allpairs relation (df table, prefix posting lists, verify
    sets) is vocabulary- or corpus-scaled: no broadcast build may
    appear, however small the test-scale estimate."""
    plan = plan_of(spark, "setjoin_allpairs", sf_dir)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_zorder_layout_single_data_exchange(spark, sf_dir):
    """The z-value is a scan expression: the only data exchange carries
    the 64 bucket groups; the bounds side is a broadcast 1-row
    aggregate, never a shuffle join."""
    plan = plan_of(spark, "zorder_layout", sf_dir)
    assert "ShuffledHashJoin" not in plan and "SortMergeJoin" not in plan, plan
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 1, plan


def test_incremental_dedup_joins_stay_shuffle(spark, sf_dir):
    """Fingerprint and shingle index probes build against corpus-scaled
    relations — all pinned shuffle-hash."""
    plan = plan_of(spark, "incremental_dedup", sf_dir)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_weighted_sample_is_topk_not_global_sort(spark, sf_dir):
    """The global k must plan as TakeOrderedAndProject (per-partition
    heaps), never a full sort or a corpus-wide Window."""
    plan = plan_of(spark, "quality_weighted_sample", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan


def test_salted_segment_join_physical_shape(spark, sf_dir):
    """The salted join must execute as a shuffle-hash join on
    (key, salt) with the dimension replicated map-side (explode of the
    salt sequence) — no broadcast build (the operator's scenario is a
    dim too big to broadcast), no nested-loop fallback."""
    plan = plan_of(spark, "segment_revenue_salted", sf_dir)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "explode" in plan.lower() or "Generate" in plan, plan


def test_embedding_neardup_cell_join_shape(spark, sf_dir):
    """The RP-LSH candidate self-join keys on (tab, bucket, label) —
    both sides are the exploded corpus, so the join is pinned
    shuffle-hash: no broadcast build (corpus-scaled), and the re-key
    must never fall back to a nested-loop/cartesian plan (the label-
    block predecessor's failure mode at scale). The bucket expression
    is a scan expression: exactly one corpus-scaled exchange pair feeds
    the join, plus the pair-dedup aggregation."""
    plan = plan_of(spark, "embedding_neardup", sf_dir)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # join key carries the LSH cell, not a coarse attribute block alone
    m = re.search(r"ShuffledHashJoin \[([^\]]*)\]", plan)
    assert m and "tab" in m.group(1) and "bucket" in m.group(1), plan


def test_concurrent_sessions_overlap_join_shape(spark, sf_dir):
    """The session×session overlap self-join must execute as a hash
    join on the exploded interval bucket — both sides are corpus-scaled
    (every session explodes), so the join is pinned shuffle-hash: no
    broadcast build flipping at scale, and never the BNLJ/cartesian the
    raw theta declaration would plan (band_join precedent). Exactly-
    once emission means no distinct/dedup aggregation may appear above
    the join."""
    plan = plan_of(spark, "concurrent_sessions", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # join keys on the interval bucket, dedup-free (residual keeps the
    # overlap's first bucket) — no Aggregate above the join output
    m = re.search(r"ShuffledHashJoin \[([^\]]*)\]", plan)
    assert m and "_oj_b" in m.group(1), plan


def test_sequence_pack_no_global_sort(spark, sf_dir):
    """The packing offset is a PER-SHARD window — the classic mistake
    is one global cumsum (a single-partition window that serializes
    the corpus). Pin: the window partitions by shard, no
    SinglePartition exchange anywhere, exactly two hash exchanges
    (shard window + (shard, bin) aggregate)."""
    plan = plan_of(spark, "sequence_pack", sf_dir)
    assert "Exchange SinglePartition" not in plan, plan
    assert re.search(r"Window .*windowspecdefinition\(shard", plan), plan
    # ONE exchange: the (shard, bin) aggregate reuses the shard-hash
    # partitioning the window already established (shard is a prefix
    # of the grouping keys), so no second shuffle exists to pin
    assert plan.count("Exchange hashpartitioning") == 1, plan
    m = re.search(r"Exchange hashpartitioning\(([^,]*)", plan)
    assert m and "shard" in m.group(1), plan


def test_semantic_dedup_clusters_no_nested_loop(spark, sf_dir):
    """Round-6 re-key: the edge stage rides the SAME pinned LSH-cell
    self-join as embedding_neardup (its own shape test pins SHJ on
    (tab, bucket)); this pin guards the query-level composition — the
    final assembled plan (CC output joined back to the corpus) must
    never contain a nested-loop/cartesian fallback or a corpus-scaled
    broadcast build."""
    plan = plan_of(spark, "semantic_dedup_clusters", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_histogram_quantiles_two_hash_aggregations(spark, sf_dir):
    """Two hash aggregations (docs → (lang, bin) partial+final →
    per-lang quantile rows) with map-side combine; the cumulative
    window partitions by lang over |langs|×|bins| rows only — no sort
    of the corpus, no corpus-wide single-partition window."""
    plan = plan_of(spark, "histogram_quantiles", sf_dir)
    assert plan.count("HashAggregate") >= 4, plan  # 2 aggs × partial+final
    assert "Exchange SinglePartition" not in plan, plan
    assert re.search(r"Window .*windowspecdefinition\(lang", plan), plan


def test_gapfilled_series_generates_the_time_dimension(spark, sf_dir):
    """The hour dimension is GENERATED (explode of a sequence from a
    1-row bounds aggregate), never scanned; the events fact is read
    exactly once (the count aggregate — staged via localCheckpoint so
    the bounds side and the join side reuse it)."""
    plan = plan_of(spark, "signups_hourly_gapfilled", sf_dir)
    assert "Generate explode(sequence" in plan, plan
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 1, plan
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan \
        or "Checkpoint" in plan or plan.count("Scan parquet") == 1, plan


def test_knn_join_cell_join_and_group_limit(spark, sf_dir):
    """knn_join rides the pinned embedding_neardup LSH-cell self-join
    (SHJ on (tab, bucket) — both sides corpus-scaled, never broadcast,
    never BNLJ) and adds exactly one ranking stage; the rank<=k filter
    must plan as WindowGroupLimit so only k rows per vector survive to
    the rank exchange's reduce side — a corpus-wide sort-then-filter
    would ship every candidate pair twice."""
    plan = plan_of(spark, "knn_join", sf_dir)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    m = re.search(r"ShuffledHashJoin \[([^\]]*)\]", plan)
    assert m and "tab" in m.group(1) and "bucket" in m.group(1), plan
    assert "WindowGroupLimit" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_scd2_dimension_single_user_exchange(spark, sf_dir):
    """SCD2 compresses runs WITHOUT a (user, run_id) re-aggregation:
    run starts survive a lag() filter, then lead()/row_number() rank
    them — all three windows partition by user_id, so exactly ONE hash
    exchange exists, no HashAggregate, and never a corpus-wide
    single-partition window."""
    plan = plan_of(spark, "scd2_dimension", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    m = re.search(r"Exchange hashpartitioning\(([^,]*)", plan)
    assert m and "user_id" in m.group(1), plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_uv_sketch_rollup_scans_facts_once(spark, sf_dir):
    """The rollup's contract: the fact table feeds the daily sketches
    ONCE (one parquet scan, one day-keyed exchange building
    ObjectHashAggregate sketch buffers); both consumers — per-day
    estimates and the period union — reuse the staged sketch relation,
    whose union exchange is constant-size (|days| rows of KB
    sketches)."""
    plan = plan_of(spark, "uv_sketch_rollup", sf_dir)
    assert plan.count("FileScan") + plan.count("Scan parquet") <= 1, plan
    assert "hll_union_agg" in plan, plan
    assert "hll_sketch_agg" not in plan.replace("partial_hll_sketch_agg",
                                                ""), \
        "daily sketches must come from the staged relation, not a rebuild"


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The 100 TB skew defense the session confs promise: with AQE
    skew-join on, a sort-merge join whose probe side is dominated by
    one hot key must be re-planned at RUNTIME into a skew-split join
    (final adaptive plan reports skew=true) — no salting needed.
    Thresholds are lowered so test-sized data qualifies; the salted
    variant (segment_revenue_salted) remains the explicit fallback for
    engines/paths without AQE."""
    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes", "65536")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(300_000).select(
            F.when(F.col("id") % 100 < 98, F.lit(7))
             .otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("pad"))
        dim = spark.range(2000).select(F.col("id").alias("k"),
                                       F.lit("d").alias("dv"))
        # execute THIS DataFrame (a write/count builds its own query
        # execution whose AQE state we couldn't inspect), then read its
        # final adaptive plan
        # execute the JOIN itself: a downstream aggregate would add a
        # shuffle above the join, and AQE declines skew-splitting when
        # that breaks a required distribution (unless forced)
        # keep the wide payload in the OUTPUT: a pruned/pushed-down
        # projection would shrink the hot partition below the threshold
        j = big.join(dim, "k").select("pad")
        assert len(j.collect()) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:2000]
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bm25_topk_broadcast_queries_pinned_postings(spark, sf_dir):
    """bm25_topk (r8): the tiny query-terms relation BROADCASTS against
    the token-keyed posting index (the corpus-scaled postings never
    shuffle to meet the queries); per-term df and per-doc length join
    pinned shuffle-hash (vocabulary and corpus both grow with input —
    a broadcast build there OOMs at 100x); the per-query top-5 plans
    as WindowGroupLimit; no cartesian beyond the two 1-row scalar
    crosses (N, L)."""
    plan = plan_of(spark, "bm25_topk", sf_dir)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # qterms onto postings
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    # the broadcast build must be the query-term side: every broadcast
    # exchange in the plan sits under a join whose stream side is the
    # postings relation — assert no corpus table is broadcast by
    # checking the only broadcast HASH joins key on the token column
    m = re.findall(r"BroadcastHashJoin \[([^\]]*)\]", plan)
    assert m and all("tok" in g for g in m), m


def test_benchmark_decontam_broadcasts_eval_side(spark, sf_dir):
    """benchmark_decontam (r8): the benchmark set is constant-cardinality
    by construction, so its distinct n-gram relation must be the
    BROADCAST build (BuildRight under the n-gram equi-join) and the
    corpus side must stream through it map-side — a corpus-wide n-gram
    shuffle (the global-distinct shape) must not appear before the
    join; the only post-join shuffle keys on doc_id for the bounded
    matched set."""
    plan = plan_of(spark, "benchmark_decontam", sf_dir)
    assert "CartesianProduct" not in plan, plan
    m = re.findall(r"BroadcastHashJoin \[([^\]]*)\].*?(BuildLeft|BuildRight)",
                   plan)
    assert m, plan
    # word-boundary match on the n-gram column itself (g#<exprId>) —
    # a bare substring "g" would also pass on e.g. lang#12 (ADVICE r8)
    assert all(re.search(r"\bg#\d+", keys) and side == "BuildRight"
               for keys, side in m), m
    # the corpus n-gram explode feeds the join directly: no exchange
    # may sit between the generate (explode) of the >= eval-max side
    # and the broadcast join probe
    assert "ShuffledHashJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rrf_fusion_bounded_fuse(spark, sf_dir):
    """rrf_fusion (r8): corpus-scaled work stays inside the two
    upstream rankers (BM25 broadcast-queries shape, fingerprint-overlap
    pinned shuffle-hash); the fuse itself is a FULL OUTER join of two
    per-query top-5 relations (driver-constant rows) re-ranked through
    WindowGroupLimit; no cartesian anywhere."""
    plan = plan_of(spark, "rrf_fusion", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "FullOuter" in plan, plan
    assert "ShuffledHashJoin" in plan, plan  # fp-keyed overlap join
    assert "WindowGroupLimit" in plan, plan


def test_kmv_day_overlap_bounded_downstream(spark, sf_dir):
    """kmv_day_overlap (r8): the corpus-scaled work (the (day, hash)
    dedup feeding per-day counts and k-smallest sketches) is
    materialized ONCE into two checkpointed |days|-bounded relations —
    the downstream plan must contain ZERO parquet scans (five branches
    re-deriving the dedup would re-scan the facts per branch), its
    only non-equi joins are the bounded day-pair crosses, and the
    sketch relation joins back equi-keyed."""
    plan = plan_of(spark, "kmv_day_overlap", sf_dir)
    assert "Scan parquet" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    m = re.findall(r"BroadcastNestedLoopJoin BuildRight, Inner, "
                   r"\(day_a#\d+L? < day_b#\d+L?\)", plan)
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    assert n_bnlj == len(m), plan  # every BNLJ is the bounded day cross
    assert "BroadcastHashJoin" in plan, plan  # sketch joins stay equi


def test_media_neardup_no_pair_distinct_exchange(spark, sf_dir):
    """media_neardup (r9, VERDICT r8 finding 2): the pair-level
    distinct() is gone — candidate duplicates collapse inside the
    doc_a-partitioned ranking window (a lag() sharing the window's
    exchange + sort), so the plan must contain NO exchange keyed on
    the (doc_a, doc_b) pair, and the dedup + rank must ride one
    window partitioning."""
    plan = plan_of(spark, "media_neardup", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert not re.search(r"hashpartitioning\(doc_a#\d+, doc_b#\d+",
                         plan), plan
    # both window passes (lag dedup + row_number rank) must appear,
    # keyed on doc_a alone
    assert plan.count("Window") >= 2 or "RunningWindowFunction" in plan


def test_hot_items_bucket_rollup_explodes_reduced_relation(spark, sf_dir):
    """hot_items_bucket_rollup (r9): the x12 window explode must run
    over the ALREADY-REDUCED bucket relation, never the raw events —
    in the top-down plan text the Generate sits ABOVE the bucket-grain
    count aggregate (deeper = later), both aggregates keep their
    partial/final map-side-combine pairs, the top-N rides the
    WindowGroupLimit partial/final pair, and the event_type filter
    reaches the parquet scan."""
    plan = plan_of(spark, "hot_items_bucket_rollup", sf_dir)
    gen = plan.index("Generate explode")
    bucket_agg = plan.index("HashAggregate(keys=[bucket_start")
    assert gen < bucket_agg, plan  # explode consumes the aggregate
    assert "partial_count" in plan and "partial_sum" in plan, plan
    assert plan.count("WindowGroupLimit") == 2, plan  # partial+final
    assert "PushedFilters: [IsNotNull(event_type)" in plan, plan
    assert "CartesianProduct" not in plan, plan


# --- Runtime exchange-reuse pins (round 9) ----------------------------------
# Unlike the static assertions above, these two EXECUTE the query: AQE
# exchange reuse is only visible in the post-execution adaptive plan
# (the static explain shows every branch unreused). They pin the
# round-9 canonicalization work — branch subtrees kept byte-identical
# so the corpus-tokenize shuffle materializes once.

def _executed_plan(df) -> str:
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    return full.split("== Initial Plan ==")[0]


def test_bm25_tokenize_shuffle_reused(spark, sf_dir):
    """bm25_topk cold path: postings, df and lt all derive from one tf
    relation whose scan -> tokenize -> partial-agg -> exchange subtree
    must stay canonically identical across the three branches (explicit
    doc_id not-null, tf >= 1 pruning guard), so the corpus tokenize
    runs ONCE and the other branches read the reused shuffle."""
    df = QUERIES["bm25_topk"](spark, sf_dir)
    plan = _executed_plan(df)
    assert "ReusedExchange" in plan, plan
    scans = plan.count("documents.parquet")
    assert scans <= 3, f"tf subtree de-canonicalized: {scans} scans"


def test_lm_bigram_unigram_shuffle_reused(spark, sf_dir):
    """lm_bigram_surprisal: the vocab-size aggregate must reuse the
    unigram count exchange (c1 >= 1 pruning guard) instead of
    re-tokenizing the corpus."""
    df = QUERIES["lm_bigram_surprisal"](spark, sf_dir)
    plan = _executed_plan(df)
    assert "ReusedExchange" in plan, plan
    scans = plan.count("documents.parquet")
    assert scans <= 3, f"unigram subtree de-canonicalized: {scans} scans"


def test_cms_grouping_shuffle_reused(spark, sf_dir):
    """heavy_hitters_cms: sketch and candidate set both derive from one
    (tok, h1, h2) grouping (sketch = sum of its counts — exact
    integers), guarded against pruning divergence, so the corpus is
    tokenized ONCE and the grouping exchange is stage-reused."""
    df = QUERIES["heavy_hitters_cms"](spark, sf_dir)
    plan = _executed_plan(df)
    assert "ReusedExchange" in plan, plan
    scans = plan.count("documents.parquet")
    assert scans <= 1, f"cms grouping de-canonicalized: {scans} scans"


def test_funnel_steps_aggregates_reused(spark, sf_dir):
    """funnel_steps: the v and c per-user aggregates each feed a join
    AND a count — the not-null guards keep their subtrees canonical so
    each computes once (3 events scans: the intrinsic complementary
    event_type slices, not 5)."""
    df = QUERIES["funnel_steps"](spark, sf_dir)
    plan = _executed_plan(df)
    assert "ReusedExchange" in plan, plan
    scans = plan.count("events.parquet")
    assert scans <= 3, f"funnel aggregates de-canonicalized: {scans} scans"


def test_dominant_suppliers_single_fact_scan(spark, sf_dir):
    """dominant_suppliers: the per-part total re-aggregates the
    (partkey, suppkey) share aggregate through a reused exchange — one
    lineitem scan, and the share/total join stays shuffle-hash."""
    df = QUERIES["dominant_suppliers"](spark, sf_dir)
    plan = _executed_plan(df)
    assert "ReusedExchange" in plan, plan
    scans = plan.count("lineitem.parquet")
    assert scans <= 1, f"share subtree de-canonicalized: {scans} scans"
    assert "ShuffledHashJoin" in plan, plan


def test_small_qty_window_single_scan(spark, sf_dir):
    """small_qty_revenue: the per-part average rides a partkey window
    over the brand-joined rows (whole parts survive the brand filter,
    so window == decorrelated aggregate) — one lineitem scan, one
    Window operator, and no fact-fact join left in the plan."""
    df = QUERIES["small_qty_revenue"](spark, sf_dir)
    plan = _executed_plan(df)
    scans = plan.count("lineitem.parquet")
    assert scans == 1, f"expected one lineitem scan: {scans}"
    assert re.search(r"\bWindow \[", plan), plan
    assert "ShuffledHashJoin" not in plan, plan

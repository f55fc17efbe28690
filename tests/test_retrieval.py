"""Maintained BM25 index tests (VERDICT r8 #1): the staged
posting/df/scalar relations maintained from a documents change feed
must serve EXACTLY the scores the from-scratch build computes — parity
is bit-for-bit, not approximate, because both paths share
``retrieval.BM25_SCORE_EXPR`` and the maintenance algebra is exact
(+new/-old df deltas, per-doc forward-row replacement)."""

import shutil

import pytest
from pyspark.sql import functions as F

from user_behavior_analysis_spark.operators.retrieval import (
    BM25_INDEX_CATALOG, bm25_index_bootstrap, bm25_maintenance_sink,
    bm25_probe_topk, register_bm25_index)
from user_behavior_analysis_spark.queries import (
    _BM25_K, _BM25_N_QUERIES, _bm25_from_docs, QUERIES)
from user_behavior_analysis_spark.sources import load_table


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _corpus_and_epochs(spark, sf_dir):
    """Base 2/3 of the documents + two delta epochs: epoch 0 ingests
    the remaining third (new doc_ids), epoch 1 RE-INGESTS every 7th
    base doc with changed text — the update case that exercises the
    old-image subtraction (tokens lost by the rewrite must leave df).
    Returns (base, [epoch0, epoch1], final_corpus)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 3 != 2)
    e0 = docs.where(F.col("doc_id") % 3 == 2)
    e1 = (base.where(F.col("doc_id") % 7 == 0)
              .select("doc_id",
                      F.concat_ws(" ", "text",
                                  F.lit("refreshed edition")).alias("text")))
    final = (docs.join(e1.select("doc_id"), "doc_id", "anti")
                 .unionByName(e1))
    return base, [e0, e1], final


@pytest.fixture()
def bm25_index(spark, sf_dir, tmp_path):
    base, epochs, final = _corpus_and_epochs(spark, sf_dir)
    root = str(tmp_path / "bm25idx")
    fwd, stats, scalars = bm25_index_bootstrap(spark, root, base)
    fn = bm25_maintenance_sink(fwd, stats, scalars)
    for i, batch in enumerate(epochs):
        fn(batch, i)
    yield fwd, stats, scalars, final
    shutil.rmtree(root, ignore_errors=True)


def test_bm25_maintained_matches_from_scratch(spark, bm25_index):
    """After bootstrap + a new-docs epoch + an update epoch, the
    maintained probe equals the from-scratch build on the final corpus
    bit-for-bit (the VERDICT r8 #1 done-criterion)."""
    fwd, stats, scalars, final = bm25_index
    qdocs = spark.range(_BM25_N_QUERIES).select(
        F.col("id").alias("doc_id"))
    got = bm25_probe_topk(fwd.read(), stats.read(), scalars.read(),
                          qdocs, k=_BM25_K)
    ref = _bm25_from_docs(final)
    assert _collect(got) == _collect(ref)


def test_bm25_maintained_df_and_scalars_exact(spark, bm25_index):
    """Stronger than end-scores: the reconstructed df relation (sum of
    the per-epoch deltas) and the (n, lt) scalars must equal the
    from-scratch values for EVERY token — a df drift that happens not
    to flip a top-5 would still poison future queries."""
    from user_behavior_analysis_spark.functions.text import tokens
    fwd, stats, scalars, final = bm25_index
    got_df = (stats.read().groupBy("tok")
                   .agg(F.sum("ddf").alias("df"))
                   .where(F.col("df") != 0))
    tf = (final.select("doc_id", F.explode(tokens("text")).alias("tok"))
               .where(F.col("tok") != "")
               .groupBy("doc_id", "tok").count())
    ref_df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    assert _collect(got_df) == _collect(ref_df)
    n, lt = scalars.read().agg(F.sum("dn"), F.sum("dlt")).first()
    ref_n, ref_lt = final.count(), tf.agg(F.sum("count")).first()[0]
    assert (n, lt) == (ref_n, ref_lt)


def test_bm25_maintenance_replay_idempotent(spark, bm25_index):
    """At-least-once foreachBatch: replaying an already-applied epoch
    must change nothing — all three tables' versions hold (txn
    markers) and the probe result is identical."""
    fwd, stats, scalars, final = bm25_index
    fn = bm25_maintenance_sink(fwd, stats, scalars)
    versions = [t.latest_version() for t in (fwd, stats, scalars)]
    qdocs = spark.range(_BM25_N_QUERIES).select(
        F.col("id").alias("doc_id"))
    before = _collect(bm25_probe_topk(fwd.read(), stats.read(),
                                      scalars.read(), qdocs, k=_BM25_K))
    # replay epoch 1 (the update epoch) with the SAME batch contents
    upd = (final.where((F.col("doc_id") % 3 != 2)
                       & (F.col("doc_id") % 7 == 0)))
    fn(upd, 1)
    assert [t.latest_version() for t in (fwd, stats, scalars)] == versions
    after = _collect(bm25_probe_topk(fwd.read(), stats.read(),
                                     scalars.read(), qdocs, k=_BM25_K))
    assert after == before


def test_bm25_registered_query_serves_index_train_free(
        spark, sf_dir, bm25_index, monkeypatch):
    """With an index registered under documents:{sf_dir}, the
    registered bm25_topk query must serve it WITHOUT the from-scratch
    build (monkeypatch-proven, the ann_ivf_topk precedent) and return
    exactly the from-scratch result on the index's corpus — the hash
    oracle is path-independent."""
    import user_behavior_analysis_spark.queries as Q
    fwd, stats, scalars, final = bm25_index
    # the fixture's index tracks the MODIFIED corpus (epoch 1 rewrote
    # every 7th base doc), so the parity reference is from-scratch on
    # that corpus — computed BEFORE the monkeypatch
    ref = _collect(_bm25_from_docs(final))

    def _boom(docs):
        raise AssertionError("from-scratch build ran with index present")

    name = f"documents:{sf_dir}"
    register_bm25_index(name, fwd.read, stats.read, scalars.read)
    try:
        monkeypatch.setattr(Q, "_bm25_from_docs", _boom)
        served = _collect(QUERIES["bm25_topk"](spark, sf_dir))
    finally:
        BM25_INDEX_CATALOG.pop(name, None)
    assert served == ref


def test_bm25_probe_plan_never_tokenizes(spark, bm25_index):
    """Plan pin: the maintained probe must not tokenize anything (no
    regex split in the plan — terms come from the index), must not
    sort-merge join, and the query-term join onto the exploded forward
    postings must be a broadcast hash join keyed on the token."""
    import re
    fwd, stats, scalars, _ = bm25_index
    qdocs = spark.range(_BM25_N_QUERIES).select(
        F.col("id").alias("doc_id"))
    df = bm25_probe_topk(fwd.read(), stats.read(), scalars.read(),
                         qdocs, k=_BM25_K)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert "split(" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    m = re.findall(r"BroadcastHashJoin \[([^\]]*)\]", plan)
    assert m and any(re.search(r"\btok#\d+", keys) for keys in m), plan


def test_bm25_maintenance_stream_end_to_end(spark, sf_dir, tmp_path):
    """The real streaming path: documents land in a source TxTable,
    txtable_changes_stream feeds bm25_maintenance_stream
    (availableNow), and the drained index both registers in the
    catalog and matches the from-scratch build bit-for-bit."""
    from user_behavior_analysis_spark.streaming.jobs import (
        bm25_maintenance_stream)
    from user_behavior_analysis_spark.tables import TxTable
    from user_behavior_analysis_spark.tables_cdc import (
        txtable_changes_stream)

    base, epochs, final = _corpus_and_epochs(spark, sf_dir)
    root = str(tmp_path / "bm25stream")
    fwd, stats, scalars = bm25_index_bootstrap(
        spark, f"{root}/idx", base)
    src = TxTable.create(spark, f"{root}/src", epochs[0].limit(1),
                         ["doc_id"])
    src.append(epochs[0])
    src.merge(epochs[1], on_dup="resolve")
    name = f"documents:{root}"
    try:
        q = (bm25_maintenance_stream(
                txtable_changes_stream(spark, src.path),
                fwd, stats, scalars, catalog_name=name)
             .option("checkpointLocation", f"{root}/ck")
             .trigger(availableNow=True).start())
        q.awaitTermination(600)
        assert name in BM25_INDEX_CATALOG
        idx = BM25_INDEX_CATALOG[name]
        qdocs = spark.range(_BM25_N_QUERIES).select(
            F.col("id").alias("doc_id"))
        got = bm25_probe_topk(idx["fwd"](), idx["stats"](),
                              idx["scalars"](), qdocs, k=_BM25_K)
        assert _collect(got) == _collect(_bm25_from_docs(final))
    finally:
        BM25_INDEX_CATALOG.pop(name, None)
        shutil.rmtree(root, ignore_errors=True)

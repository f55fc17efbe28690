"""Maintained BM25 retrieval index (VERDICT r8 #1): the posting /
df / doc-length relations BM25 needs are STAGED in TxTables and kept
current from the documents change feed, so the query path probes a
servable index train-free instead of re-tokenizing the corpus per call
— the retrieval twin of the CDC-maintained IVF index
(``streaming.jobs.ivf_maintenance_stream``), and the Spark-first
re-expression of the reference's "maintain a derived relation
incrementally, query it cheaply" production shape
(hot-item-analysis/.../HotItems.scala:46-82 — Kafka -> windowed counts,
never a rescan of history).

Index layout (three TxTables under one root):

* ``fwd`` — FORWARD postings, one row per document:
  ``(doc_id, postings: array<struct<tok,tf>> sorted by tok, dl)``,
  keyed on ``doc_id``. A re-ingested document is ONE key-level MERGE
  (tokens that vanished from the new text vanish with the old array —
  no per-(doc,tok) delete problem, which is why the maintained layout
  is doc-keyed rather than token-keyed). The probe explodes it
  map-side; the corpus never shuffles.
* ``stats`` — APPEND-ONLY per-token df deltas ``(tok, epoch, ddf)``:
  each maintenance epoch blind-appends +1/-1 rows for tokens gained /
  lost by the epoch's documents, and read-time ``SUM(ddf) GROUP BY
  tok`` reconstructs df exactly — the mergeable-partials discipline of
  ``sketch_rollup_sink`` (append beats read-modify-write: no merge
  races, replays no-op via txn markers).
* ``scalars`` — append-only corpus scalars ``(epoch, dn, dlt)``:
  document-count and total-token-length deltas; ``SUM`` at read time.

Exactly-once under at-least-once foreachBatch: the additive tables
(stats, scalars) commit BEFORE the fwd MERGE, and every commit carries
the (app, epoch) txn marker. The epoch's deltas are computed by
diffing the batch against fwd's CURRENT rows — so the ordering is
load-bearing: on a replay after a crash between the delta appends and
the fwd merge, fwd is still the OLD image, the recomputed deltas are
identical, the appends no-op on their markers, and the merge applies.
Committing fwd first would poison the replayed delta computation.

Deletes are out of scope (the change feed is add/upsert-only, matching
``TxTable.changes``); a corpus rebuild is a new index root, exactly
like an IVF retrain.

100 TB shape: maintenance cost is O(changed docs) tokenize + one
file-pruned MERGE (only fwd files whose doc_id range the delta touches
rewrite) + KB-scale delta appends. The probe reads fwd once (explode
is pipelined, no exchange), semi-joins the broadcast query tokens, and
aggregates partial map-side — the only corpus-scaled exchange left is
the per-(q_id, doc_id) partial-sum combine, versus the from-scratch
path's tokenize + two corpus-wide groupBys per call.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .topn import top_n_per_group

#: exact-rational BM25 per-(query,doc,term) contribution, scaled 1e9
#: and floor-divided to an integer — identical constants and algebra to
#: the from-scratch query (queries.py ``_BM25_ORACLE`` constants note:
#: k1=6/5, b=3/4, rational Robertson idf, DECIMAL(38,0) widening).
#: Shared verbatim by both paths so maintained == from-scratch is
#: structural, not coincidental.
BM25_SCORE_EXPR = (
    "CAST((CAST(2 * n - 2 * df + 1 AS DECIMAL(38,0)) * 22"
    " * CAST(lt AS DECIMAL(38,0)) * tf * 1000000000)"
    " div (CAST(2 * df + 1 AS DECIMAL(38,0))"
    "      * (CAST(10 AS DECIMAL(38,0)) * lt * tf + 3 * lt"
    "         + CAST(9 AS DECIMAL(38,0)) * n * dl)"
    "      * n) AS BIGINT)")


def bm25_score_topk(qterms: DataFrame, postings: DataFrame,
                    k: int) -> DataFrame:
    """Shared scoring core: broadcast the (tiny) query-term relation
    ``(q_id, q_tok, df, n, lt)`` onto the corpus-scaled posting
    relation ``(doc_id, tok, tf, dl)``, floor-scale each term
    contribution to an integer, SUM per (q_id, doc_id) (map-side
    partials; order-free by integer exactness) and keep the top ``k``
    docs per query via WindowGroupLimit."""
    sc = (postings.join(F.broadcast(qterms),
                        (postings["tok"] == qterms["q_tok"])
                        & (postings["doc_id"] != qterms["q_id"]))
                  .select("q_id", "doc_id",
                          F.expr(BM25_SCORE_EXPR).alias("s"))
                  .groupBy("q_id", "doc_id")
                  .agg(F.sum("s").alias("score_scaled")))
    top = top_n_per_group(sc, ["q_id"],
                          [F.desc("score_scaled"), F.asc("doc_id")],
                          n=k, rank_col="rn")
    return top.select("q_id", "doc_id", "score_scaled",
                      F.col("rn").cast("int").alias("rn"))


def tokenize_postings(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(doc_id, postings array<struct<tok,tf>> sorted by tok, dl) per
    document — the forward-index row shape. Documents whose text
    yields no tokens keep an empty array and dl=0 (they still count
    toward n). sort_array makes the row bit-deterministic across
    shuffle orders (TxTable rows must be value-stable for parity
    tests and change-feed consumers)."""
    from ..functions.text import tokens
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    tf = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(tokens(text_col)).alias("tok"))
              .where(F.col("tok") != "")
              .groupBy("doc_id", "tok")
              .agg(F.count(F.lit(1)).alias("tf")))
    rows = (tf.groupBy("doc_id")
              .agg(F.sort_array(F.collect_list(
                       F.struct("tok", "tf"))).alias("postings"),
                   F.sum("tf").alias("dl")))
    return (ids.join(rows, "doc_id", "left")
               .select("doc_id",
                       F.coalesce("postings", F.array().cast(
                           "array<struct<tok:string,tf:bigint>>"))
                        .alias("postings"),
                       F.coalesce("dl", F.lit(0).cast("bigint"))
                        .alias("dl")))


def explode_postings(fwd: DataFrame) -> DataFrame:
    """Forward rows -> (doc_id, tok, tf, dl) posting stream. Pure
    generate: pipelined into whatever consumes it, no exchange."""
    return (fwd.select("doc_id", "dl",
                       F.explode("postings").alias("p"))
               .select("doc_id", F.col("p.tok").alias("tok"),
                       F.col("p.tf").alias("tf"), "dl"))


# --- index lifecycle ---------------------------------------------------------

def bm25_index_bootstrap(spark: SparkSession, root: str,
                         docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n_files: int = 16):
    """Create the three index TxTables from a base corpus (the batch
    bootstrap; the IVF train-on-base analog). The base's df counts ARE
    its deltas from empty, recorded at epoch -1 so stream epochs
    (>= 0) stay monotonic for the txn markers. The forward table is
    RANGE-partitioned on doc_id so a delta touching a narrow id range
    (new documents arrive with new ids) rewrites only the intersecting
    files — MERGE's min/max pruning needs disjoint per-file key ranges
    to bite. Returns (fwd, stats, scalars)."""
    import os

    from ..tables import TxTable

    fwd_rows = tokenize_postings(docs, id_col, text_col) \
        .repartitionByRange(n_files, "doc_id")
    fwd = TxTable.create(spark, os.path.join(root, "fwd"),
                         fwd_rows, ["doc_id"])
    df0 = (explode_postings(fwd.read())
           .groupBy("tok")
           .agg(F.count(F.lit(1)).cast("bigint").alias("ddf"))
           .withColumn("epoch", F.lit(-1).cast("bigint"))
           .select("tok", "epoch", "ddf"))
    stats = TxTable.create(spark, os.path.join(root, "stats"),
                           df0, ["tok"])
    sc0 = fwd.read().agg(
        F.lit(-1).cast("bigint").alias("epoch"),
        F.count(F.lit(1)).cast("bigint").alias("dn"),
        F.sum("dl").cast("bigint").alias("dlt"))
    scalars = TxTable.create(spark, os.path.join(root, "scalars"),
                             sc0, ["epoch"])
    return fwd, stats, scalars


def bm25_maintenance_sink(fwd, stats, scalars, app: str = "bm25_maint",
                          id_col: str = "doc_id",
                          text_col: str = "text"):
    """foreachBatch body keeping the index current from a document
    change feed. Per epoch: tokenize the changed docs, read their OLD
    forward rows (file-pruned point read on the batch's doc_id range),
    append the +new/-old df and scalar deltas, then MERGE the new
    forward rows — additive tables strictly before the merge (see the
    module docstring's replay proof). Duplicate doc_ids within one
    micro-batch (a feed replaying several versions of one doc in one
    trigger) resolve deterministically to the greatest text — the
    order-free tie-break ``TxTable.merge(on_dup='resolve')`` uses."""
    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if all(t._txn_already_applied(app, epoch_id)
               for t in (stats, scalars, fwd)):
            batch_df.write.format("noop").mode("overwrite").save()
            return
        batch = (batch_df.select(F.col(id_col).alias("doc_id"),
                                 F.col(text_col).alias("text"))
                         .groupBy("doc_id")
                         .agg(F.max("text").alias("text")))
        new = tokenize_postings(batch).localCheckpoint(eager=True)
        b = new.agg(F.min("doc_id"), F.max("doc_id")).first()
        if b[0] is None:
            batch_df.write.format("noop").mode("overwrite").save()
            return
        old = (fwd.read_pruned({"doc_id": (b[0], b[1])})
                  .join(new.select("doc_id"), "doc_id", "semi")
                  .localCheckpoint(eager=True))
        ddf = (explode_postings(new).select("tok", F.lit(1).alias("d"))
               .unionByName(explode_postings(old)
                            .select("tok", F.lit(-1).alias("d")))
               .groupBy("tok")
               .agg(F.sum("d").cast("bigint").alias("ddf"))
               .where(F.col("ddf") != 0)
               .withColumn("epoch", F.lit(int(epoch_id)).cast("bigint"))
               .select("tok", "epoch", "ddf"))
        stats.append(ddf, txn_app=app, txn_version=epoch_id)
        n_new, lt_new = new.agg(F.count(F.lit(1)), F.sum("dl")).first()
        n_old, lt_old = old.agg(F.count(F.lit(1)), F.sum("dl")).first()
        sc = stats.spark.createDataFrame(
            [(int(epoch_id), int(n_new) - int(n_old or 0),
              int(lt_new or 0) - int(lt_old or 0))],
            "epoch bigint, dn bigint, dlt bigint")
        scalars.append(sc, txn_app=app, txn_version=epoch_id)
        fwd.merge(new, txn_app=app, txn_version=epoch_id)
    return fn


def bm25_probe_topk(fwd_df: DataFrame, stats_df: DataFrame,
                    scalars_df: DataFrame, qdocs: DataFrame,
                    k: int) -> DataFrame:
    """Serve BM25 top-k from the maintained relations, train-free and
    corpus-groupBy-free. ``qdocs`` is a tiny (q_id) relation naming
    the query documents; their terms come FROM the index (the probe
    never touches the raw corpus). df for the query tokens reconstructs
    by summing the delta rows AFTER a broadcast semi-join on the query
    tokens — only matching delta rows reach the aggregate."""
    qt = (explode_postings(
              fwd_df.join(F.broadcast(qdocs), "doc_id"))
          .select(F.col("doc_id").alias("q_id"),
                  F.col("tok").alias("q_tok")))
    dfreq = (stats_df
             .join(F.broadcast(qt.select(F.col("q_tok").alias("tok"))
                                 .distinct()), "tok")
             .groupBy("tok")
             .agg(F.sum("ddf").cast("bigint").alias("df")))
    nl = scalars_df.agg(F.sum("dn").cast("bigint").alias("n"),
                        F.sum("dlt").cast("bigint").alias("lt"))
    qterms = (qt.join(F.broadcast(dfreq), qt.q_tok == dfreq.tok)
                .crossJoin(F.broadcast(nl))
                .select("q_id", "q_tok", "df", "n", "lt"))
    return bm25_score_topk(qterms, explode_postings(fwd_df), k)


#: maintained BM25 index catalog — the retrieval twin of
#: ``similarity.ANN_INDEX_CATALOG``: a maintenance stream registers
#: zero-arg loaders for the three relations so the stateless
#: registered query (``bm25_topk``) serves the maintained index
#: train-free; each call re-reads the tables' current snapshots.
BM25_INDEX_CATALOG: dict[str, dict] = {}


def register_bm25_index(name: str, fwd_loader, stats_loader,
                        scalars_loader) -> None:
    BM25_INDEX_CATALOG[name] = {
        "fwd": fwd_loader, "stats": stats_loader,
        "scalars": scalars_loader,
    }


def resolve_bm25_index(name: str) -> dict | None:
    return BM25_INDEX_CATALOG.get(name)

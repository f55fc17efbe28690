"""Golden replay of the reference's own bundled fixtures (SURVEY.md §5,
strategy item 2): the four CSVs shipped in the reference's
``src/main/resources`` flow through the engine — batch operators AND the
stateful streaming operators via per-event micro-batches — and the
asserted rows are hand-derived from the reference's semantics:

* LoginFailWithCep.scala:50-57 — fail `next` fail `within(2 s)`. Flink
  CEP's within() is EXCLUSIVE (the NFA prunes a partial match when
  ``ts - start_ts >= windowTime``), so a pair exactly 2 s apart times
  out; with the fixture's integer-second timestamps an exclusive 2 s
  bound is the inclusive 1 s bound passed below. Intended warnings:
  user 3012018 pairs (…881, …882) and (…882, …883) — user 95279527's
  (…893 → …896) and (…896 → …898) gaps (3 s, 2 s) both miss the window.
* OrderTimeout.scala:50-64 — create followedBy pay within(15 min),
  timeout side output. Orders 34756/34757 pay in time; 34758 never pays
  → timeout; pays without create (34740/34749/34753/34755) are silent.
* TxMatchByJoin.scala:68-71 — receipt within ±5 s of pay on txId;
  TxMatchDetect.scala:88-138 — matched/unmatched side outputs.
* AdStatisticsByGeo.scala:68-113 — FilterBlackListUser(15): user 931766
  hammers ad 1715 twenty times; first 15 clicks pass, one warning, the
  rest suppressed.
"""

import os
import pathlib

import pandas as pd
from pyspark.sql import functions as F

from user_behavior_analysis_spark.schemas import (
    AD_CLICK, LOGIN_EVENT, ORDER_EVENT, RECEIPT_EVENT)
from user_behavior_analysis_spark.sources import (
    parse_csv_lines, read_event_csv)
from user_behavior_analysis_spark.streaming import stateful

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

#: Flink CEP within(2 s) is exclusive; integer-second fixture timestamps
#: make that the inclusive 1 s bound our <= operators take.
LOGIN_WITHIN_S = 1

EXPECTED_LOGIN_WARNINGS = {
    (3012018, 1558430881, 1558430882),
    (3012018, 1558430882, 1558430883),
}

EXPECTED_ORDER_RESULTS = {
    (34756, 1558430913, 1558430919, "payed successfully"),
    (34757, 1558430915, 1558430932, "payed successfully"),
    (34758, 1558430930, -1, "timeout"),
}

EXPECTED_TX = {
    "matched": {"8x0zvy8z3", "7a0zvz4lk"},
    "unmatched_pay": {"392094j32", "8c6vd8dd", "324n0239", "8x0zvy8w3"},
    "unmatched_receipt": {"ewr342as4", "sd76f87d6"},
}

BLACKLIST_THRESHOLD = 15  # AdStatisticsByGeo.scala:54


def _per_event_stream(spark, tmp_path, csv_name, schema, required=None,
                      extra_lines=()):
    """One text file per CSV line in event-time order with strictly
    increasing mtimes + maxFilesPerTrigger=1 → one micro-batch per event,
    the closest Structured Streaming analog of the reference's
    element-at-a-time DataStream replay. ``extra_lines`` are merged into
    the event-time order (e.g. a far-future watermark-advancing
    sentinel)."""
    lines = (FIXTURES / csv_name).read_text().strip().splitlines()
    lines += list(extra_lines)
    lines.sort(key=lambda ln: int(ln.rsplit(",", 1)[1]))
    d = tmp_path / csv_name.replace(".csv", "")
    d.mkdir()
    for i, ln in enumerate(lines):
        f = d / f"ev-{i:04d}.txt"
        f.write_text(ln + "\n")
        os.utime(f, (1_000_000_000 + i, 1_000_000_000 + i))
    raw = (spark.readStream.format("text").option("maxFilesPerTrigger", 1)
           .load(str(d)).withColumnRenamed("value", "line"))
    return parse_csv_lines(raw, schema, required=required)


def _drain(spark, df, mode, name):
    q = (df.writeStream.outputMode(mode).format("memory")
         .queryName(name).trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def test_login_log_batch_golden(spark):
    from user_behavior_analysis_spark.operators.cep import strict_pair
    ev = read_event_csv(spark, str(FIXTURES / "LoginLog.csv"), LOGIN_EVENT)
    assert ev.count() == 44  # every fixture row parses (incl. the 1974 ts)
    out = strict_pair(ev, "user_id", "ts",
                      F.col("event_type") == "fail", LOGIN_WITHIN_S).toPandas()
    got = set(map(tuple, out[["user_id", "first_fail", "last_fail"]]
                  .itertuples(index=False)))
    assert got == EXPECTED_LOGIN_WARNINGS


def test_login_log_stream_golden(spark, tmp_path):
    ev = _per_event_stream(spark, tmp_path, "LoginLog.csv", LOGIN_EVENT)
    out = _drain(spark, stateful.login_fail_stream(ev, "fail", LOGIN_WITHIN_S),
                 "append", "golden_login")
    got = set(map(tuple, out[["user_id", "first_fail", "last_fail"]]
                  .itertuples(index=False)))
    assert got == EXPECTED_LOGIN_WARNINGS


def test_order_log_batch_golden(spark):
    from user_behavior_analysis_spark.operators.cep import (
        followed_by_with_timeout)
    ev = read_event_csv(spark, str(FIXTURES / "OrderLog.csv"), ORDER_EVENT,
                        required=("order_id", "event_type", "ts"))
    assert ev.count() == 9
    out = followed_by_with_timeout(
        ev, "order_id", "ts",
        begin_flag=F.col("event_type") == "create",
        follow_flag=F.col("event_type") == "pay",
        within_s=900).toPandas()
    got = set(map(tuple, out.itertuples(index=False)))
    assert got == EXPECTED_ORDER_RESULTS


def test_order_log_stream_golden(spark, tmp_path):
    ev = _per_event_stream(spark, tmp_path, "OrderLog.csv", ORDER_EVENT,
                           required=("order_id", "event_type", "ts"))
    keyed = ev.withColumnRenamed("order_id", "user_id")
    out = _drain(spark,
                 stateful.order_timeout_stream(keyed, "create", "pay", 900),
                 "append", "golden_order")
    got = set(map(tuple,
                  out[["user_id", "create_ts", "pay_ts", "status"]]
                  .itertuples(index=False)))
    # processing-time timeouts don't fire under availableNow: the paid
    # channel must be exact; the timeout row is the batch-only channel
    expected_paid = {r for r in EXPECTED_ORDER_RESULTS if r[3] != "timeout"}
    assert got == expected_paid


def test_tx_match_golden(spark):
    from user_behavior_analysis_spark.operators.joins import (
        interval_join, reconcile_full_outer)
    orders = read_event_csv(spark, str(FIXTURES / "OrderLog.csv"),
                            ORDER_EVENT,
                            required=("order_id", "event_type", "ts"))
    pays = (orders.where(F.col("event_type") == "pay")
            .select(F.col("tx_id"), F.col("ts").alias("pay_t")))
    receipts = (read_event_csv(spark, str(FIXTURES / "ReceiptLog.csv"),
                               RECEIPT_EVENT)
                .select(F.col("tx_id").alias("r_tx_id"),
                        F.col("ts").alias("receipt_t")))
    # J1: the ±5 s interval join must pair exactly the two tx ids whose
    # receipt lands 1 s after the pay (8x0zvy8z3 has a duplicated receipt
    # row in the fixture → two join rows, same tx)
    rr = receipts.withColumnRenamed("r_tx_id", "tx_id")
    joined = (interval_join(pays, rr, ["tx_id"], "pay_t", "receipt_t", -5, 5)
              .select(pays["tx_id"]).toPandas())
    assert len(joined) == 3
    assert set(joined["tx_id"]) == EXPECTED_TX["matched"]
    # J2: full-outer reconciliation side outputs
    p = pays.groupBy("tx_id").agg(F.min("pay_t").cast("long").alias("pay_ts"))
    r = (receipts.groupBy("r_tx_id")
         .agg(F.min("receipt_t").cast("long").alias("receipt_ts"))
         .withColumnRenamed("r_tx_id", "tx_id"))
    rec = reconcile_full_outer(p, r, "tx_id",
                               left_only="unmatched_pay",
                               right_only="unmatched_receipt").toPandas()
    for tag, txs in EXPECTED_TX.items():
        assert set(rec[rec["tag"] == tag]["tx_id"]) == txs, tag


def test_tx_reconcile_stream_golden(spark, tmp_path):
    """J2 streaming twin over the reference's own fixtures: the
    watermarked full-outer stream-stream join must produce the exact
    matched / unmatched-pay / unmatched-receipt channels of
    TxMatchDetect's side outputs. A far-future sentinel row per stream
    closes both watermarks so unmatched state flushes before the
    availableNow drain ends; sentinel ids are filtered from assertions."""
    from user_behavior_analysis_spark.streaming import jobs

    SENT = 9_999_999_999  # epoch far beyond every fixture timestamp
    orders = (FIXTURES / "OrderLog.csv").read_text().strip().splitlines()
    pays = [ln for ln in orders if ",pay," in ln]
    receipts = (FIXTURES / "ReceiptLog.csv").read_text().strip().splitlines()

    def _stream(lines, name, fmt):
        d = tmp_path / name
        d.mkdir()
        lines = sorted(lines, key=lambda ln: int(ln.rsplit(",", 1)[1]))
        lines.append(fmt)  # sentinel last → final watermark advance
        for i, ln in enumerate(lines):
            f = d / f"ev-{i:04d}.txt"
            f.write_text(ln + "\n")
            os.utime(f, (1_000_000_000 + i, 1_000_000_000 + i))
        return (spark.readStream.format("text")
                .option("maxFilesPerTrigger", 1).load(str(d))
                .withColumnRenamed("value", "line"))

    pay_raw = _stream(pays, "pays", f"0,pay,zz-sent-l,{SENT}")
    rec_raw = _stream(receipts, "receipts", f"zz-sent-r,none,{SENT}")
    pay = (parse_csv_lines(pay_raw, ORDER_EVENT)
           .select(F.col("tx_id").alias("p_tx"), F.col("ts").alias("pay_t")))
    rec = (parse_csv_lines(rec_raw, RECEIPT_EVENT)
           .select(F.col("tx_id").alias("r_tx"),
                   F.col("ts").alias("receipt_t")))
    out = _drain(
        spark,
        jobs.reconcile_stream(pay, rec, ("p_tx", "r_tx"),
                              "pay_t", "receipt_t", within_s=5,
                              watermark="1 second",
                              left_only="unmatched_pay",
                              right_only="unmatched_receipt"),
        "append", "golden_reconcile")
    out = out[~(out["p_tx"].fillna("").str.startswith("zz-sent")
                | out["r_tx"].fillna("").str.startswith("zz-sent"))]
    matched = out[out["tag"] == "matched"]
    # the duplicated 8x0zvy8z3 receipt row yields two matched rows
    assert len(matched) == 3
    assert set(matched["p_tx"]) == EXPECTED_TX["matched"]
    assert set(out[out["tag"] == "unmatched_pay"]["p_tx"]) == \
        EXPECTED_TX["unmatched_pay"]
    assert set(out[out["tag"] == "unmatched_receipt"]["r_tx"]) == \
        EXPECTED_TX["unmatched_receipt"]


def test_ad_click_log_stream_golden(spark, tmp_path):
    clicks = (_per_event_stream(spark, tmp_path, "AdClickLog.csv", AD_CLICK)
              .select("user_id", F.col("ad_id").cast("int").alias("ad_id"),
                      "ts"))
    out = _drain(spark,
                 stateful.blacklist_stream(clicks, BLACKLIST_THRESHOLD),
                 "append", "golden_adclick")
    warns = out[out["tag"] == "warn"]
    mains = out[out["tag"] == "main"]
    # exactly one blacklisted (user, ad): 931766 on ad 1715
    assert set(map(tuple, warns[["user_id", "ad_id"]]
                   .itertuples(index=False))) == {(931766, 1715)}
    # the hot key's first 15 clicks pass through (1511658600..614),
    # clicks 16-20 are suppressed; all other keys pass untouched
    hot = mains[(mains["user_id"] == 931766) & (mains["ad_id"] == 1715)]
    assert sorted(hot["ts_sec"]) == list(range(1511658600, 1511658615))
    assert len(mains) == 23  # 28 fixture rows - 5 suppressed


def test_order_log_stream_event_time_golden(spark, tmp_path):
    """J3 with REAL event-time timers: the timeout channel must fire by
    WATERMARK passage of create+15min — OrderTimeout.scala:53's
    semantics — not by wall-clock quiet. A far-future sentinel event
    (key 1, type 'noop': touches no order state) advances event time
    past 34758's create+900 during the replay, so ALL THREE reference
    channels emerge from the availableNow run with no wall-clock wait —
    exactly the channel the processing-time fallback cannot produce
    under replay (see test_order_log_stream_golden above)."""
    sentinel = "1,noop,,1558431900"
    ev = _per_event_stream(spark, tmp_path, "OrderLog.csv", ORDER_EVENT,
                           required=("order_id", "event_type", "ts"),
                           extra_lines=[sentinel])
    keyed = ev.withColumnRenamed("order_id", "user_id")
    out = _drain(
        spark,
        stateful.order_timeout_stream_event_time(
            keyed, "create", "pay", 900),
        "append", "golden_order_event_time")
    got = set(map(tuple,
                  out[["user_id", "create_ts", "pay_ts", "status"]]
                  .itertuples(index=False)))
    assert got == EXPECTED_ORDER_RESULTS

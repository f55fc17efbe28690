"""Schemas for the reference's six event types and the driver testdata.

The reference declares each input as a flat Scala case class with epoch-
second Long timestamps (SURVEY.md §1.1; e.g. reference
``user-behavior-common/.../UserBehavior.scala:11-15``). Here every event
type is a ``StructType`` with a real ``TimestampType`` event-time column
— keeping event time typed unlocks ``withWatermark``/``window()`` and
lets Catalyst fold time predicates into scans.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference event types (SURVEY.md §1.1) --------------------------------

#: reference UserBehavior.scala:11-15 (userId,itemId,categoryId,behavior,ts)
USER_BEHAVIOR = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("item_id", T.LongType()),
    T.StructField("category_id", T.IntegerType()),
    T.StructField("behavior", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

#: reference market-analysis/.../pojos/AdClickEvent.scala:6
AD_CLICK = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ad_id", T.LongType()),
    T.StructField("province", T.StringType()),
    T.StructField("city", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

#: reference market-analysis/.../pojos/MarketingUserBehavior.scala:11
MARKETING = T.StructType([
    T.StructField("user_id", T.StringType()),
    T.StructField("behavior", T.StringType()),
    T.StructField("channel", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

#: reference login-fail-detect/.../pojos/LoginEvent.scala:6
LOGIN_EVENT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ip", T.StringType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

#: reference order-pay-detect/.../pojos/OrderEvent.scala:6
ORDER_EVENT = T.StructType([
    T.StructField("order_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("tx_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

#: reference order-pay-detect/.../pojos/ReceiptEvent.scala:6
RECEIPT_EVENT = T.StructType([
    T.StructField("tx_id", T.StringType()),
    T.StructField("pay_channel", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

#: driver `events` table (TESTDATA.md) — the stand-in event stream for all
#: six fixtures; `props` is a JSON string carrying per-fixture extras.
EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

"""Port of the reference's single test, plus the edge cases it lacks.

Golden fixture: ApplicationTest.java:32-59 — 12 out-of-order
ElectronicOrders in, the same 12 sorted ascending by `time` out
(order_id sequence 1,2,3,6,4,8,11,5,10,7,9,12). Assertion is on
values and order only, matching readValuesToList
(ApplicationTest.java:126).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from kafka_streams_reorder_timestamp_spark.operators.reorder import reorder_batch
from kafka_streams_reorder_timestamp_spark.schemas import ELECTRONIC_ORDER


def ts(iso: str) -> int:
    """ISO-8601 instant -> epoch millis (ApplicationTest.java:24-26)."""
    return int(
        datetime.fromisoformat(iso.replace("Z", "+00:00"))
        .astimezone(timezone.utc)
        .timestamp()
        * 1000
    )


# (order_id, electronic_id, user_id, price, time) — ApplicationTest.java:32-44
GOLDEN_INPUT = [
    ("1", "one", "vandeley", 5.0, ts("2021-11-03T23:00:00Z")),
    ("2", "one", "penny-packer", 15.0, ts("2021-11-04T01:05:00Z")),
    ("3", "one", "romanov", 25.0, ts("2021-11-04T01:10:00Z")),
    ("4", "one", "david", 35.0, ts("2021-11-04T01:40:00Z")),
    ("5", "one", "jerry", 45.0, ts("2021-11-04T02:25:00Z")),
    ("6", "one", "natalie", 55.0, ts("2021-11-04T01:20:00Z")),
    ("7", "one", "lisa", 65.0, ts("2021-11-04T02:45:00Z")),
    ("8", "one", "gavin", 75.0, ts("2021-11-04T02:00:00Z")),
    ("9", "one", "paul", 85.0, ts("2021-11-04T03:00:00Z")),
    ("10", "one", "martin", 95.0, ts("2021-11-04T02:40:00Z")),
    ("11", "one", "rebecca", 105.0, ts("2021-11-04T02:20:00Z")),
    ("12", "one", "jessica", 115.0, ts("2021-11-05T00:00:00Z")),
]

EXPECTED_ORDER_IDS = ["1", "2", "3", "6", "4", "8", "11", "5", "10", "7", "9", "12"]


def make_orders_df(spark, rows):
    return spark.createDataFrame(rows, schema=ELECTRONIC_ORDER)


def test_golden_reorder(spark):
    df = make_orders_df(spark, GOLDEN_INPUT)
    out = reorder_batch(df, ts_col="time", arrival_col=None)
    got = [r.order_id for r in out.collect()]
    assert got == EXPECTED_ORDER_IDS
    # values untouched (ApplicationTest asserts full record equality)
    got_rows = [tuple(r) for r in out.collect()]
    assert sorted(got_rows, key=lambda r: r[4]) == got_rows
    assert set(got_rows) == set(GOLDEN_INPUT)


def test_duplicate_timestamps_first_wins(spark):
    """Edge case missing from the reference suite (FIXTURES.md §3):
    identical `time` -> only the first-arriving row is emitted
    (Application.java:89-93)."""
    t = ts("2021-11-04T01:00:00Z")
    rows = [
        ("1", "one", "first", 1.0, t),
        ("2", "one", "second", 2.0, t),
        ("3", "one", "other", 3.0, t + 1),
    ]
    df = make_orders_df(spark, rows).withColumn(
        "arrival", F.monotonically_increasing_id()
    )
    out = reorder_batch(df, ts_col="time", arrival_col="arrival").drop("arrival")
    got = [(r.order_id, r.user_id) for r in out.collect()]
    assert got == [("1", "first"), ("3", "other")]


def test_reorder_without_dedup_keeps_all(spark):
    t = ts("2021-11-04T01:00:00Z")
    rows = [
        ("1", "one", "a", 1.0, t),
        ("2", "one", "b", 2.0, t),
    ]
    df = make_orders_df(spark, rows)
    out = reorder_batch(df, ts_col="time", drop_duplicate_timestamps=False)
    assert out.count() == 2


def test_null_event_time_rows_dropped_batch(spark):
    """Batch twin of the streaming NULL-event-time contract: a row
    whose event time is NULL cannot be sequenced and is dropped —
    never emitted first by NULLS FIRST sort order."""
    from pyspark.sql import functions as F

    df = make_orders_df(spark, GOLDEN_INPUT).withColumn(
        "time_ts",
        F.when(
            F.col("order_id") != "3", F.timestamp_millis(F.col("time"))
        ),
    )
    out = reorder_batch(df, ts_col="time_ts", arrival_col=None)
    got = [r.order_id for r in out.collect()]
    assert got == [i for i in EXPECTED_ORDER_IDS if i != "3"]


def test_reorder_events_table(spark, sf_dir):
    """The driver's events table through the same operator: output must
    be ascending in ts with unique timestamps."""
    from kafka_streams_reorder_timestamp_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    out = reorder_batch(events, ts_col="ts", arrival_col="event_id")
    rows = out.select("ts").collect()
    tss = [r.ts for r in rows]
    assert tss == sorted(tss)
    assert len(tss) == len(set(tss))
    assert len(tss) <= events.count()

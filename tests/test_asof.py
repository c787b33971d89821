"""Unit tests for the as-of join operator (operators/asof.py).

The registered query `purchase_last_signup` is oracle-checked against
DuckDB's native ASOF JOIN in test_oracle_parity; these tests pin the
operator's own semantics on hand-built frames where every edge is
visible: inclusive ties, forward direction, unmatched-left handling,
and key isolation.
"""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_streams_reorder_timestamp_spark.operators.asof import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts(10), "l-a"),
            ("u1", _ts(20), "l-b"),
            ("u1", _ts(5), "l-early"),
            ("u2", _ts(10), "l-c"),
        ],
        "key string, lts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(10), "r-tie"),
            ("u1", _ts(15), "r-mid"),
            ("u2", _ts(30), "r-late"),
        ],
        "key string, rts timestamp, rval string",
    )
    return left, right


def _rows(df):
    return {
        (r["key"], r["lval"]): r.asDict() for r in df.collect()
    }


def test_backward_inclusive_ties(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts")
    got = _rows(out)
    # l-a at :10 matches the right row AT :10 (inclusive tie)
    assert got[("u1", "l-a")]["rval"] == "r-tie"
    # l-b at :20 matches the latest prior right row (:15)
    assert got[("u1", "l-b")]["rval"] == "r-mid"
    # l-early at :05 has no prior right row -> dropped under inner
    assert ("u1", "l-early") not in got
    # u2's only right row is later -> dropped; keys never cross
    assert ("u2", "l-c") not in got


def test_left_outer_keeps_unmatched(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on=["key"], left_ts="lts", right_ts="rts", how="left"
    )
    got = _rows(out)
    assert len(got) == 4
    assert got[("u1", "l-early")]["rval"] is None
    assert got[("u2", "l-c")]["rval"] is None


def test_forward_direction(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on=["key"], left_ts="lts", right_ts="rts",
        direction="forward",
    )
    got = _rows(out)
    # forward: earliest right row at-or-after left_ts
    assert got[("u1", "l-early")]["rval"] == "r-tie"  # :05 -> :10
    assert got[("u1", "l-a")]["rval"] == "r-tie"      # :10 -> :10 tie
    assert got[("u2", "l-c")]["rval"] == "r-late"     # :10 -> :30
    assert ("u1", "l-b") not in got                    # :20 -> nothing after


def test_right_ts_column_carried(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts")
    assert set(out.columns) == {"key", "lts", "lval", "rts", "rval"}
    got = _rows(out)
    assert got[("u1", "l-b")]["rts"] == _ts(15)


def test_overlapping_payload_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left,
            right.withColumnRenamed("rval", "lval"),
            on=["key"],
            left_ts="lts",
            right_ts="rts",
        )


def test_single_shuffle_plan(spark, frames):
    from kafka_streams_reorder_timestamp_spark import plans

    left, right = frames
    out = asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts")
    # union + window = ONE hash-partition exchange on the join keys —
    # the property that makes this shape survive 100 TB (no range
    # fan-out, no per-key broadcast).
    assert plans.shuffle_count(out) == 1


def test_right_order_resolves_equal_ts_ties(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "l")], "key string, lts timestamp, lval string"
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), "a-first"), ("u1", _ts(10), "z-last")],
        "key string, rts timestamp, rval string",
    )
    out = asof_join(
        left, right, on=["key"], left_ts="lts", right_ts="rts",
        right_order=["rval"],
    ).collect()
    # equal-ts right rows: ties resolve to the MAX under right_order
    assert out[0]["rval"] == "z-last"

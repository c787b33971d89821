"""Property-based tests (hypothesis): the reorder operator's semantics
and the Avro codec hold for ALL inputs, not just the golden fixture.

Spark jobs per example are expensive, so the Spark property uses few,
large examples; the pure-Python codec gets the full default budget.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_streams_reorder_timestamp_spark.operators.reorder import reorder_batch
from kafka_streams_reorder_timestamp_spark.sources.avro_codec import (
    decode_order,
    encode_order,
)

# --------------------------------------------------------------------------
# Avro codec: encode/decode is the identity for every valid record.

orders = st.fixed_dictionaries(
    {
        "order_id": st.text(min_size=0, max_size=40),
        "electronic_id": st.text(min_size=0, max_size=40),
        "user_id": st.text(min_size=0, max_size=40),
        "price": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "time": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    }
)


@given(orders)
def test_avro_roundtrip_property(rec):
    assert decode_order(encode_order(rec)) == rec


@given(orders, st.integers(min_value=0, max_value=2**31 - 1))
def test_avro_confluent_framing_property(rec, schema_id):
    buf = encode_order(rec, confluent_framing=True, schema_id=schema_id)
    assert buf[0] == 0
    assert decode_order(buf, confluent_framing=True) == rec


# --------------------------------------------------------------------------
# Batch reorder: for any multiset of (arrival, ts) rows the output is
# (a) chronologically sorted, (b) one row per distinct ts, and (c) the
# surviving row per ts is the first arrival (min arrival id).

rows_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**12)),  # ts values
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows_strategy)
def test_reorder_batch_property(spark, ts_values):
    rows = [(i, t[0]) for i, t in enumerate(ts_values)]
    df = spark.createDataFrame(rows, ["arrival", "t"])
    got = reorder_batch(df, ts_col="t", arrival_col="arrival").collect()

    ts_out = [r.t for r in got]
    assert ts_out == sorted(ts_out), "output must be chronological"
    assert len(ts_out) == len(set(ts_out)), "one row per distinct ts"
    first_arrival = {}
    for arrival, t in rows:
        if t not in first_arrival or arrival < first_arrival[t]:
            first_arrival[t] = arrival
    assert {(r.arrival, r.t) for r in got} == {
        (a, t) for t, a in first_arrival.items()
    }, "survivor must be the first arrival per ts"

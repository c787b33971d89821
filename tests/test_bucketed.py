"""Bucketed-storage tests: writing both fact tables bucketed on the
join key must remove every Exchange from the join plan (the co-located
join that makes orderkey joins survive 100 TB), while producing the
same rows as the shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_reorder_timestamp_spark import plans
from kafka_streams_reorder_timestamp_spark.sources import load_table
from kafka_streams_reorder_timestamp_spark.sources.bucketed import (
    bucketed_table,
    write_bucketed,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_facts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], N_BUCKETS)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        N_BUCKETS,
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _joined(spark, bucketed_facts):
    o_t, l_t = bucketed_facts
    o = bucketed_table(spark, o_t).select("o_orderkey", "o_orderdate")
    li = bucketed_table(spark, l_t).select("o_orderkey", "l_quantity")
    return o.join(li, "o_orderkey")


def test_bucketed_join_has_no_exchange(spark, bucketed_facts):
    df = _joined(spark, bucketed_facts)
    # co-located buckets: the whole join plan must be exchange-free
    assert plans.shuffle_count(df) == 0, plans.physical_plan(df, "simple")


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_facts):
    got = _joined(spark, bucketed_facts).count()
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    assert got == o.join(li, "o_orderkey").count()


def test_bucketed_agg_has_no_exchange(spark, bucketed_facts):
    _, l_t = bucketed_facts
    li = bucketed_table(spark, l_t)
    agg = li.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    # group-by on the bucket key: partial agg IS the final agg
    assert plans.shuffle_count(agg) == 0, plans.physical_plan(agg, "simple")

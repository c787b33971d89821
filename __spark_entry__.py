"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``kafka_streams_reorder_timestamp_spark``;
this module only adapts the engine's query registry to the driver's
calling convention.

Cache contract (see ``operators/registry.py``): a few builders persist
a shared intermediate; long-lived sessions enumerating many queries
should ``spark.catalog.clearCache()`` between query actions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the operator modules runs their @register decorators and
# populates the registry.
from kafka_streams_reorder_timestamp_spark.operators import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 shape: full lineitem scan + filter + hash aggregation —
    exercises parquet pushdown, partial aggregation, and AQE in one
    plan.
    """
    from kafka_streams_reorder_timestamp_spark.operators.relational import (
        q1_pricing_summary,
    )

    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; ops without an entry
    (non-SQL-expressible) get the driver's weaker rows-only check."""
    return registry.all_oracles()

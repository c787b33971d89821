"""Bucketed-table storage: the shuffle-free path for fact-fact joins.

The engine's biggest repeated shuffle at 100 TB is orders ⋈ lineitem on
orderkey (q3/q10 shapes — operators/relational.py notes it per query).
Hash-bucketing both tables on the join key at write time makes every
subsequent join/aggregate on that key a ZERO-exchange plan: each task
reads bucket i of both sides and joins locally. Write cost is paid
once; the shuffle disappears from every downstream query.

Spark specifics encoded here:
  - bucketing requires ``saveAsTable`` (bucket metadata lives in the
    catalog, not the parquet files);
  - both sides must have the SAME bucket count or one side re-shuffles;
  - ``sortBy`` within buckets lets the join skip its local sort too
    (sort-merge join reads pre-sorted runs).

The reference has no storage layer at all (Kafka topics are its only
persistence), so this is extension surface — but it is the canonical
answer to "would this join survive 100×?" for co-located keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist `df` as a parquet table hash-bucketed (and optionally
    sorted) on `bucket_cols`. Joins/aggregations keyed on those columns
    then run without an Exchange."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact."""
    return spark.table(table)

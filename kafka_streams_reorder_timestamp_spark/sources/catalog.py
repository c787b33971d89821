"""Table catalog over the driver-provided parquet directories.

One parquet file per table (TESTDATA.md). Reads are plain
``spark.read.parquet`` so Catalyst gets full pushdown/pruning; at
cluster scale the same call reads a partitioned directory tree and
partition pruning applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region=5 rows, nation=25 rows at every SF).
BROADCASTABLE = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. No schema inference: parquet carries its
    own schema and the engine's schemas module documents the contract."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong it surfaces as LongType epoch
    # nanos. The data is microsecond-granular (verified: epoch_ns % 1000
    # == 0 for every row), so converting to Spark's micros timestamp is
    # lossless. Done here once so every operator sees a TimestampType.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register catalog tables as temp views so operators can be written
    in SQL where that is clearer."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

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
    # Every DATE/TIMESTAMP → epoch conversion in the registry (not just
    # on `events` — e.g. orders_scd2_history's valid_from_us from
    # `orders` alone) must agree with the DuckDB oracle's naive-UTC
    # reading — pin the session timezone on EVERY load (runtime-
    # settable) so results don't depend on who built the SparkSession
    # or on which table a query happens to touch first.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark cannot read
        # natively ([PARQUET_TYPE_ILLEGAL]); the legacy conf surfaces it
        # as LongType epoch nanos. Set it here (runtime-settable) so the
        # catalog works in ANY session, including the driver's.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dtype = df.schema["ts"].dataType
        # The generator has shipped `ts` as TIMESTAMP(NANOS) (surfaced
        # as LongType epoch nanos via the legacy conf) and as
        # timestamp[us] with no zone (surfaced as TIMESTAMP_NTZ).
        # Normalize both to Spark's TIMESTAMP: the engine's event-time
        # surface (unix_micros, watermarks, window()) is typed on LTZ,
        # and with the session pinned to UTC the NTZ->LTZ cast is the
        # identity on values.
        if isinstance(dtype, T.LongType):
            # `div` keeps the ns->us arithmetic in exact long integers —
            # `/ 1000` would round-trip through double, whose 2^53
            # mantissa truncates ~1.5% of 2021-era nanosecond values.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dtype, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register catalog tables as temp views so operators can be written
    in SQL where that is clearer."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

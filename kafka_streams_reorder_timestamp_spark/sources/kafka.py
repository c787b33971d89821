"""Kafka source/sink boundary — the analog of `builder.stream` /
`.to()` (reference: src/main/java/org/example/Application.java:140,147).

Reads produce the engine's canonical order DataFrame (ELECTRONIC_ORDER
columns + `event_time`); writes re-split into Kafka's (key, value)
byte columns, value Avro-encoded — the key/value duality the reference
gets from its serdes (StreamsUtils.java:29-33).

Serde selection: the JVM `from_avro`/`to_avro` (spark-avro package) is
used when present — that is the production path, fully
codegen/pushdown friendly; otherwise the pure-Python Avro binary codec
(avro_codec.py) keeps the boundary functional and byte-compatible.
The Kafka *connector* (spark-sql-kafka) likewise may be absent in dev
containers; `kafka_available()` lets callers and tests gate on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ELECTRONIC_ORDER_AVRO
from .avro_codec import from_avro_binary, to_avro_binary

_ORDER_COLS = ("order_id", "electronic_id", "user_id", "price", "time")


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def spark_avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro package (JVM from_avro/to_avro) exists."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


def decode_value(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Kafka-shaped DataFrame (binary `value` [+ `key`]) → order columns
    + `event_time` derived from the payload's `time` field — the
    timestamp-extractor semantics of Application.java:99-108 (event
    time comes from the value, not broker metadata)."""
    if spark_avro_available(spark):
        from pyspark.sql.avro.functions import from_avro

        rec = from_avro(F.col("value"), ELECTRONIC_ORDER_AVRO)
    else:
        rec = from_avro_binary(F.col("value"))
    return df.select(rec.alias("r")).select("r.*").withColumn(
        "event_time", F.timestamp_millis(F.col("time"))
    )


def encode_value(df: DataFrame, spark: SparkSession, key_col: str | None = None) -> DataFrame:
    """Order columns → Kafka sink shape: binary `value` (Avro) and
    string `key` (default serde `Serdes.String()`, Application.java:120)."""
    if spark_avro_available(spark):
        from pyspark.sql.avro.functions import to_avro

        value = to_avro(F.struct(*[F.col(c) for c in _ORDER_COLS]))
    else:
        value = to_avro_binary(df)
    key = F.col(key_col).cast("string") if key_col else F.col("electronic_id")
    return df.select(key.alias("key"), value.alias("value"))


def read_order_stream(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    """`builder.stream(inputTopic)` (Application.java:140)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return decode_value(raw, spark)


def order_sink_options(bootstrap: str, topic: str, checkpoint_dir: str) -> dict:
    """The exact option set the Kafka sink writer is configured with —
    exposed as data so tests (and operators embedding the sink) can pin
    the contract without a broker."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def build_order_sink(
    df: DataFrame,
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    checkpoint_dir: str,
):
    """Un-started Kafka sink writer: encode to (key, value) bytes, then
    `writeStream.format("kafka")` with `order_sink_options`. Split from
    `write_order_stream` so the construction is unit-testable in
    broker-less environments (start() is the only side-effecting step)."""
    return (
        encode_value(df, spark)
        .writeStream.format("kafka")
        .options(**order_sink_options(bootstrap, topic, checkpoint_dir))
    )


def write_order_stream(
    df: DataFrame,
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    checkpoint_dir: str,
):
    """`reordered.to(outputTopic)` (Application.java:147). Returns the
    started StreamingQuery; checkpointing supplies the restart story
    the reference gets from changelog topics (Application.java:160)."""
    return build_order_sink(df, spark, bootstrap, topic, checkpoint_dir).start()

"""Fixed, hand-declared schemas — the engine never infers schemas.

Mirrors the reference's externally-registered Avro schema approach
(reference: src/main/avro/electronic_order.avsc:1-12, compiled at build
time; SpecificAvroSerde at StreamsUtils.java:29-33). In Spark the
schema is a StructType constant and `from_avro` enforces it at the
Kafka boundary.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

# The reference's single record type (electronic_order.avsc:6-10):
#   order_id string, electronic_id string, user_id string,
#   price double (default 0.0), time long (epoch millis, event time).
ELECTRONIC_ORDER = T.StructType(
    [
        T.StructField("order_id", T.StringType(), False),
        T.StructField("electronic_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("time", T.LongType(), False),
    ]
)

# Avro schema JSON for the from_avro/to_avro Kafka boundary — same
# field set as electronic_order.avsc.
ELECTRONIC_ORDER_AVRO = json.dumps(
    {
        "namespace": "io.spark.engine",
        "type": "record",
        "name": "ElectronicOrder",
        "fields": [
            {"name": "order_id", "type": "string"},
            {"name": "electronic_id", "type": "string"},
            {"name": "user_id", "type": "string"},
            {"name": "price", "type": "double", "default": 0.0},
            {"name": "time", "type": "long"},
        ],
    }
)

# Driver-provided events table (TESTDATA.md): the streaming-reorder
# test surface. `ts` plays the role of the Avro `time` field. The
# catalog normalizes the on-disk type (epoch-nanos long or
# timestamp_ntz, depending on generator vintage) to TIMESTAMP with the
# session pinned to UTC.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal blob rows: media payloads are opaque binary columns with
# typed metadata, so Spark shuffles/stores them without decoding.
MEDIA_BLOB = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

"""Avro binary serde for the ElectronicOrder record.

Mirrors the reference's value serde (SpecificAvroSerde,
reference: src/main/java/org/example/StreamsUtils.java:29-33; schema
src/main/avro/electronic_order.avsc:1-12). Two paths:

- With the `spark-avro` package on the classpath, the JVM
  ``from_avro``/``to_avro`` functions are the production path
  (`kafka.py` selects them automatically).
- Without it (this container), a pure-Python implementation of the
  Avro 1.x binary encoding for this flat record — zigzag-varint longs,
  length-prefixed UTF-8 strings, little-endian IEEE-754 doubles, fields
  in schema order, no framing (publicly specified at
  avro.apache.org/docs/current/specification) — wrapped in Arrow-batched
  pandas UDFs. Byte-compatible with any standard Avro binary decoder
  using the same schema.

The Confluent wire format (magic byte 0x0 + 4-byte schema id before the
body) used by the reference's Schema Registry serde is supported via
``confluent_framing=True``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import ELECTRONIC_ORDER

_FIELDS = ("order_id", "electronic_id", "user_id", "price", "time")


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def encode_order(row: dict, confluent_framing: bool = False, schema_id: int = 1) -> bytes:
    """ElectronicOrder dict → Avro binary body (schema field order)."""
    out = bytearray()
    if confluent_framing:
        out += b"\x00" + struct.pack(">I", schema_id)
    for name in ("order_id", "electronic_id", "user_id"):
        raw = row[name].encode("utf-8")
        out += _zigzag_encode(len(raw)) + raw
    out += struct.pack("<d", float(row["price"]))
    out += _zigzag_encode(int(row["time"]))
    return bytes(out)


def decode_order(buf: bytes, confluent_framing: bool = False) -> dict:
    """Avro binary body → ElectronicOrder dict."""
    pos = 5 if confluent_framing else 0
    rec: dict = {}
    for name in ("order_id", "electronic_id", "user_id"):
        ln, pos = _zigzag_decode(buf, pos)
        rec[name] = buf[pos : pos + ln].decode("utf-8")
        pos += ln
    (rec["price"],) = struct.unpack_from("<d", buf, pos)
    pos += 8
    rec["time"], pos = _zigzag_decode(buf, pos)
    return rec


def to_avro_binary(df: DataFrame, confluent_framing: bool = False) -> Column:
    """Column: the ElectronicOrder fields of `df` encoded to Avro binary
    (the Kafka `value` payload). Arrow-batched."""

    @F.pandas_udf(T.BinaryType())
    def enc(s: pd.DataFrame) -> pd.Series:
        return s.apply(
            lambda r: encode_order(r.to_dict(), confluent_framing), axis=1
        )

    return enc(F.struct(*[F.col(c) for c in _FIELDS]))


def from_avro_binary(value: Column, confluent_framing: bool = False) -> Column:
    """Column: Avro binary `value` payload → ElectronicOrder struct."""

    @F.pandas_udf(ELECTRONIC_ORDER)
    def dec(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in it:
            yield pd.DataFrame(
                [decode_order(b, confluent_framing) for b in s],
                columns=list(_FIELDS),
            )

    return dec(value)

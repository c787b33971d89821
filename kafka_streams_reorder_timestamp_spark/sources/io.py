"""File-format readers/writers beyond the parquet catalog.

The reference's only IO is Kafka (SURVEY §2.2 marks file scans and
non-Kafka sinks Absent); this module is the engine's general file
boundary. Policy choices that matter at 100 TB:

  - **No schema inference, ever** (mirrors the reference's
    externally-registered Avro schema): CSV/JSON readers REQUIRE a
    StructType — inference costs an extra full pass over the data and
    can silently drift between runs.
  - **Writers default to snappy parquet**, the only format whose scans
    give pushdown + pruning + vectorized decode; CSV/JSON writers exist
    for interchange, not for the hot path.
  - **Partitioned layout** via `partition_by` produces the
    directory-tree layout partition pruning needs (verified by the
    PartitionFilters plan test).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("parquet", "csv", "json", "orc")

# Text formats default to millisecond timestamp rendering, silently
# truncating Spark's microsecond timestamps on a round-trip; pin a
# lossless format on both reader and writer.
_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a file/directory in `fmt`. Self-describing formats
    (parquet/orc) carry their schema; text formats (csv/json) must be
    given one explicitly."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(
                f"{fmt} reads require an explicit schema — the engine "
                "never infers (inference = an extra full data pass and "
                "run-to-run drift)"
            )
        reader = (
            reader.schema(schema)
            .option("timestampFormat", _TS_FORMAT)
            # NTZ columns are parsed via a separate option; without it
            # the default NTZ pattern drops sub-second precision and
            # PERMISSIVE mode nulls every unparsable cell.
            .option("timestampNTZFormat", _TS_FORMAT)
        )
        if fmt == "csv":
            reader = reader.option("header", "true")
    elif schema is not None:
        reader = reader.schema(schema)
    return reader.format(fmt).load(path)


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    compression: str | None = None,
) -> None:
    """Write `df` under `path`. `partition_by` yields the hive-style
    directory tree that partition pruning (and incremental rewrites of
    single partitions) rely on."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt in ("csv", "json"):
        writer = writer.option("timestampFormat", _TS_FORMAT).option(
            "timestampNTZFormat", _TS_FORMAT
        )
    if fmt == "csv":
        writer = writer.option("header", "true")
    if compression is not None:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)

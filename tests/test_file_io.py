"""File-format boundary: round-trips with explicit schemas, partitioned
layout + partition pruning, and the no-inference policy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_reorder_timestamp_spark import plans
from kafka_streams_reorder_timestamp_spark.schemas import EVENTS
from kafka_streams_reorder_timestamp_spark.sources.catalog import load_table
from kafka_streams_reorder_timestamp_spark.sources.io import read_files, write_files


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "events").limit(100)
    path = str(tmp_path / fmt)
    write_files(src, path, fmt=fmt)
    back = read_files(spark, path, fmt=fmt, schema=EVENTS)
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_files(spark, str(tmp_path), fmt="csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_files(spark, str(tmp_path), fmt="json")


def test_partitioned_write_enables_pruning(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "by_type")
    write_files(src, path, partition_by=["event_type"])
    df = read_files(spark, path).filter(F.col("event_type") == "click")
    plan = plans.physical_plan(df)
    # the partition predicate must prune directories at the scan, not
    # filter rows after reading every partition
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    got_types = {r.event_type for r in df.select("event_type").distinct().collect()}
    assert got_types == {"click"}


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        read_files(spark, str(tmp_path), fmt="xml")

"""Query registry: the driver-facing inventory of implemented operators.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) ->
DataFrame`` with an equivalent ANSI-SQL oracle string runnable by
DuckDB over the same parquet tables (or None for ops that are not
SQL-expressible — the driver then records a weaker rows-only check).

Parity rules (so the driver's order-insensitive value-hash matches):
  - every computed column is aliased identically on both sides;
  - floating aggregates are ROUND()ed identically on both sides (sum
    order differs between engines by a few ulps otherwise);
  - timestamps are emitted as epoch microseconds (BIGINT) because the
    DuckDB views carry nanosecond timestamps while Spark uses micros.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None (rows-only check)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query builder to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}

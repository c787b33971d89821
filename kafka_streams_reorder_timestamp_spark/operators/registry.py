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

Cache contract: a few builders ``.persist()`` an intermediate that is
consumed by more than one downstream branch (e.g.
``customer_rfm_scores``, ``q11_important_parts``). The builder cannot
unpersist it — the plan it returns is lazy and still references the
cached table when the CALLER finally runs an action. Harness-style
consumers that enumerate many queries in one long-lived session must
therefore call ``spark.catalog.clearCache()`` after each query's
action completes (``bench.py`` and ``parity.py`` both do); otherwise
cached partitions accumulate in executor storage memory for the
session's lifetime and are reclaimed only by the ContextCleaner.
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
    # Exact-twin SQL for queries whose output is engine-specific by
    # nature (Spark-internal sketches) and can therefore NEVER
    # hash-match an oracle at any SF. Consumed ONLY by parity.py's
    # APPROX_GUARANTEES checkers, which verify the sketch's published
    # error bound against these exact values; intentionally NOT
    # exported through ``all_oracles()``/``oracle_sql()`` — the
    # driver's bit-hash comparison would mis-read bounded estimation
    # error as failure, so the driver keeps its rows-only check.
    approx_oracle: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    approx_oracle: str | None = None,
):
    """Decorator: add a query builder to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=doc,
            approx_oracle=approx_oracle,
        )
        return fn

    return wrap


def _driver_history() -> tuple[dict[str, int], set[str], set[str]]:
    """(latest round with any CORRECTNESS_r{N}.json row per query,
    names whose LATEST row was a failure,
    names whose LATEST row was the weaker rows-only check).

    A row is a failure when it carries a real error (anything but the
    by-design ``no_oracle``) or any axis explicitly came back False.
    A ``no_oracle`` row means the driver ran the query but could only
    count rows — either because the query had no oracle back then, or
    because it is approx-by-design and never exports one.

    The driver's correctness gate checks only the FIRST 50 entries of
    ``queries()``; with 100+ registered queries a fixed order would leave
    the tail permanently unchecked. Ordering least-recently-verified
    first rotates coverage so every query gets a driver-verified row
    within a couple of rounds — and a query whose latest row FAILED is
    treated as never verified, so the gate keeps observing known
    failures instead of rotating them out of the window for a full
    cycle. tests/test_oracle_parity.py still checks the FULL registry
    locally every round regardless of this order.
    """
    import glob
    import json
    import os
    import re

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    seen: dict[str, int] = {}
    latest_row: dict[str, tuple[int, dict]] = {}
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            seen[name] = max(seen.get(name, -1), rnd)
            if not isinstance(row, dict):
                row = {}
            if name not in latest_row or rnd > latest_row[name][0]:
                latest_row[name] = (rnd, row)
    failed = set()
    rows_only = set()
    for name, (_, row) in latest_row.items():
        err = row.get("err")
        bad_err = err is not None and err != "no_oracle"
        bad_axis = any(
            row.get(k) is False
            for k in ("rows_match", "schema_match", "hash_match")
        )
        if bad_err or bad_axis:
            failed.add(name)
        elif err == "no_oracle":
            rows_only.add(name)
    return seen, failed, rows_only


_ROTATION_CACHE: tuple[tuple[str, ...], list[str]] | None = None


def _rotated_names() -> list[str]:
    """Registry names, least-recently-driver-verified first (failures
    first of all). A query whose LATEST driver row was the weaker
    rows-only check but which NOW exports an exact oracle sorts just
    after failures: the driver has never hash-confirmed it even though
    it can, so it must re-enter the 50-query window immediately. The
    pin is self-expiring — the next hash-green driver row clears the
    ``no_oracle`` marker and the query rotates normally again; the
    approx-by-design queries never export an oracle and are therefore
    never pinned. Cached per process — the CORRECTNESS_r*.json scan is
    file I/O and its result cannot change mid-run; callers therefore
    see one stable, reproducible order for the whole session."""
    global _ROTATION_CACHE
    names = tuple(REGISTRY)
    if _ROTATION_CACHE is not None and _ROTATION_CACHE[0] == names:
        return _ROTATION_CACHE[1]
    seen, failed, rows_only = _driver_history()
    order = {name: i for i, name in enumerate(REGISTRY)}

    def rank(n: str) -> int:
        if n in failed:
            return -3
        if n in rows_only and REGISTRY[n].oracle is not None:
            return -2  # oracle landed since the driver's last look
        return seen.get(n, -1)  # never-seen (-1) ≺ oldest round ≺ newest

    rotated = sorted(REGISTRY, key=lambda n: (rank(n), order[n]))
    _ROTATION_CACHE = (names, rotated)
    return rotated


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].builder for name in _rotated_names()}


def all_oracles() -> dict[str, str]:
    return {
        n: REGISTRY[n].oracle
        for n in _rotated_names()
        if REGISTRY[n].oracle is not None
    }

"""Finite-value guards for exact-arithmetic entry points.

The engine's money/measure parity convention routes every
order-sensitive double aggregate through exact decimal
(``ROUND(SUM(CAST(x AS DECIMAL(25,6))), 2)`` — see
operators/relational.py).  That cast is the one place a corrupt
NaN/±Inf measure can KILL a job instead of flowing through: Spark 4
runs in ANSI mode, where ``CAST(NaN AS DECIMAL)`` (and ``AS BIGINT``)
raises CAST_OVERFLOW / CAST_INVALID_INPUT, and DuckDB's decimal cast
fails the same way.  At 100 TB a single corrupt row from a broken
encoder must not abort the stage.

Contract (adversarial-values gate, tests/test_adversarial_values.py):
**in exact-arithmetic space a non-finite measure is unknown** — it
becomes NULL before the cast, so SQL aggregates skip it, identically
on both engines (oracle mirror: ``CASE WHEN isfinite(x) THEN x END``).
Comparisons/filters are NOT guarded: Spark and DuckDB share the same
IEEE total order (NaN largest and self-equal, ±Inf ordered), so
predicate semantics already agree cross-engine without intervention.

On real data every measure is finite, so the guard is hash-neutral
and codegen-only (one BETWEEN on two double literals — no UDF, no
extra exchange, whole-stage-codegen keeps the scan fused).
"""

from __future__ import annotations

import sys

from pyspark.sql import Column
from pyspark.sql import functions as F

_DBL_MAX = sys.float_info.max


def is_finite(expr: Column | str) -> Column:
    """Boolean form of the same guard, for scan filters: TRUE only
    for finite values (NaN/±Inf/NULL all fail).  Pushes to the
    parquet scan as two plain double comparisons."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return c.between(-_DBL_MAX, _DBL_MAX)


def finite(expr: Column | str) -> Column:
    """``expr`` when finite, else NULL (NaN, +Inf, -Inf → NULL;
    NULL stays NULL).  A single codegen'd BETWEEN: NaN fails both
    bounds under Spark's total order (NaN > DBL_MAX) and ±Inf fall
    outside them, so no isnan()/abs() chain is needed."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.when(c.between(-_DBL_MAX, _DBL_MAX), c)


# DuckDB oracle mirror for the same guard, as a format helper so the
# oracle SQL stays greppable next to its builder:
#   f"CAST({ORACLE_FINITE.format('x')} AS DECIMAL(25,6))"
ORACLE_FINITE = "CASE WHEN isfinite({0}) THEN {0} END"

"""Vector math over ``array<float|double>`` columns, all JVM-side.

Arithmetic is done in double with a strict left-to-right fold
(``F.aggregate``), which matches DuckDB's sequential list reduction —
that is what makes the similarity queries value-hash-identical against
the oracle instead of differing by summation-order ulps.

At scale: these are ordinary Catalyst expressions — they vectorize,
pipeline inside whole-stage codegen, and never cross into Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    """Cast array<float> to array<double> once, up front — float32
    multiplies accumulate error differently per engine."""
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast(
        "array<double>"
    )


def vector_lit(values: Sequence[float]) -> Column:
    """A literal query vector (e.g. an ANN probe) as array<double>."""
    return F.array(*[F.lit(float(v)) for v in values])


def dot(a: Column, b: Column) -> Column:
    """Dot product: left fold over zip — O(d), no shuffle, codegen'd."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))

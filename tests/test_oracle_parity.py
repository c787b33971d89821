"""Driver-style correctness gate, run locally on every pytest.

Mimics the driver's CORRECTNESS check: for every registry entry with an
oracle, run the Spark builder AND the DuckDB oracle at sf0.01 and
compare row-count + column names + order-insensitive values (columns
sorted by name, rows sorted, exact equality — doubles must be
bit-identical, which the engine guarantees via exact decimal sums).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd
import pytest

from kafka_streams_reorder_timestamp_spark.operators import registry
from kafka_streams_reorder_timestamp_spark.sources.catalog import TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, cells normalized to
    hashable primitives, rows sorted."""
    out = pd.DataFrame()
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).astype("datetime64[us]").astype("int64")
        else:
            s = s.map(_cell)
        out[c] = s
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def _cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, dt.datetime):
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_cell(x) for x in v)
    return v


ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, oracle_sf_dir, name):
    spec = registry.REGISTRY[name]
    sdf = spec.builder(spark, oracle_sf_dir).toPandas()
    with duckdb.connect() as con:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{oracle_sf_dir}/{t}.parquet'"
            )
        odf = con.execute(spec.oracle).fetch_df()

    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs oracle {len(odf)}"
    assert len(sdf) > 0, f"{name}: empty result — vacuous check"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    a, b = _canon(sdf), _canon(odf)
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        diff = pd.concat(
            [a[bad].head(5).add_suffix("_spark"), b[bad].head(5).add_suffix("_oracle")],
            axis=1,
        )
        raise AssertionError(f"{name}: {int(bad.sum())} mismatched rows\n{diff}")

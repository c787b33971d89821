"""Ad-hoc parity check for a subset of registered queries.

Usage: python tools/check_queries.py q1 q2 ...   [env: SPARK_GRAFT_SF_DIR]

Same canonicalization as parity.py, but only the named queries — the
fast inner loop when adding or fixing an operator (the full harness
re-runs all 180+).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from parity import _canon  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: check_queries.py <query> [...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from kafka_streams_reorder_timestamp_spark.operators import registry
    from kafka_streams_reorder_timestamp_spark.session import get_spark
    from kafka_streams_reorder_timestamp_spark.sources.catalog import TABLES

    spark = get_spark(app_name="check_queries")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad = 0
    for name in names:
        spec = registry.REGISTRY[name]
        spark.catalog.clearCache()
        sdf = spec.builder(spark, sf_dir).toPandas()
        if spec.oracle is None:
            print(f"{name}: no_oracle spark_rows={len(sdf)}")
            continue
        odf = con.execute(spec.oracle).fetch_df()
        ok = (
            len(sdf) == len(odf)
            and sorted(sdf.columns) == sorted(odf.columns)
            and _canon(sdf).equals(_canon(odf))
        )
        print(
            f"{name}: {'OK' if ok else 'FAIL'} "
            f"spark={len(sdf)} oracle={len(odf)} "
            f"cols={sorted(sdf.columns)}/{sorted(odf.columns)}"
        )
        if not ok:
            bad += 1
            a, b = _canon(sdf), _canon(odf)
            if len(a) == len(b) and list(a.columns) == list(b.columns):
                neq = (a != b) & ~(a.isna() & b.isna())
                rows = neq.any(axis=1)
                print(a[rows].head(5))
                print(b[rows].head(5))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

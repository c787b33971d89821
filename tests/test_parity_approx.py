"""Pins for parity.py's approx-regime guarantee checkers.

Above the sketches' exact regime (sf0.1+), `events_weekly_users_hll`
and `events_cms_user_counts` hash-diverge from their exact-twin
oracles by design; parity.py then verifies the published sketch
guarantee numerically (APPROX_GUARANTEES). These tests pin both
directions of each checker with synthetic frames: in-bound estimates
pass, out-of-bound / undercounting / exact-column-drift estimates
fail — so the checker can never silently become a rubber stamp.
Pure pandas; no SparkSession needed.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parity import (  # noqa: E402
    APPROX_GUARANTEES,
    _check_approx_sketches,
    _check_cms_counts,
    _check_hll_weekly,
    _check_pca_projection,
    _check_selection_approx,
)


class _FakeCon:
    """DuckDB stand-in: answers the single COUNT(*) probe the CMS
    checker issues."""

    def __init__(self, n_total: int):
        self._n = n_total

    def execute(self, _sql: str):
        return self

    def fetchone(self):
        return (self._n,)


def _hll_frames(est_values):
    oracle = pd.DataFrame(
        {
            "event_type": ["click", "view"],
            "week_us": [1_000, 2_000],
            "approx_weekly_users": [1000, 2000],
            "n_days_merged": [7, 7],
        }
    )
    spark = oracle.copy()
    spark["approx_weekly_users"] = est_values
    return spark, oracle


def test_hll_checker_accepts_within_three_rse():
    # 3 * RSE at lgConfigK=12 is ~4.88%; +3% everywhere is in bound.
    spark, oracle = _hll_frames([1030, 2060])
    out = _check_hll_weekly(spark, oracle, con=None)
    assert out["within_bound"] is True
    assert out["max_rel_err"] <= out["bound"]


def test_hll_checker_rejects_out_of_bound_estimate():
    spark, oracle = _hll_frames([1100, 2000])  # +10% > 3*RSE
    assert _check_hll_weekly(spark, oracle, con=None)["within_bound"] is False


def test_hll_checker_rejects_exact_column_drift():
    # n_days_merged is exact-by-construction: any drift is a real
    # grouping/merge bug, never sketch noise.
    spark, oracle = _hll_frames([1000, 2000])
    spark["n_days_merged"] = [7, 6]
    out = _check_hll_weekly(spark, oracle, con=None)
    assert out["within_bound"] is False
    assert "n_days_merged" in out["reason"]


def test_hll_checker_rejects_key_set_mismatch():
    spark, oracle = _hll_frames([1000, 2000])
    spark.loc[1, "event_type"] = "purchase"
    assert _check_hll_weekly(spark, oracle, con=None)["within_bound"] is False


def _cms_frames(est_values):
    oracle = pd.DataFrame(
        {"user_id": [1, 2, 3], "est_count": [100, 200, 300]}
    )
    spark = pd.DataFrame({"user_id": [1, 2, 3], "est_count": est_values})
    return spark, oracle


def test_cms_checker_accepts_bounded_overshoot():
    from kafka_streams_reorder_timestamp_spark.operators.events_queries import (
        CMS_WIDTH,
    )

    n_total = 10_000
    cap = math.e / CMS_WIDTH * n_total  # ~26.6 at width 1024
    spark, oracle = _cms_frames([100 + int(cap) - 1, 200, 300])
    out = _check_cms_counts(spark, oracle, _FakeCon(n_total))
    assert out["within_bound"] is True
    assert out["max_overshoot"] <= out["overshoot_cap"]


def test_cms_checker_rejects_undercount():
    # CMS can NEVER undercount; an estimate below exact is a fold or
    # hashing bug, not approximation.
    spark, oracle = _cms_frames([99, 200, 300])
    assert (
        _check_cms_counts(spark, oracle, _FakeCon(10_000))["within_bound"]
        is False
    )


def test_cms_checker_rejects_overshoot_beyond_cap():
    spark, oracle = _cms_frames([100 + 1_000, 200, 300])
    assert (
        _check_cms_counts(spark, oracle, _FakeCon(10_000))["within_bound"]
        is False
    )


def _sketch_frames(approx_users, p50s):
    oracle = pd.DataFrame(
        {
            "event_type": ["click", "view"],
            "exact_users": [1000, 2000],
            "lo_p50": [10.0, 20.0],
            "hi_p50": [11.0, 21.0],
            "lo_p95": [90.0, 95.0],
            "hi_p95": [91.0, 96.0],
            "lo_p99": [99.0, 100.0],
            "hi_p99": [99.5, 101.0],
            "n_events": [5000, 9000],
        }
    )
    spark = pd.DataFrame(
        {
            "event_type": ["click", "view"],
            "approx_users": approx_users,
            "p50": p50s,
            "p95": [90.5, 95.5],
            "p99": [99.2, 100.5],
            "n_events": [5000, 9000],
        }
    )
    return spark, oracle


def test_sketch_checker_accepts_in_bound_estimates():
    # HLL++ off by 2% (under the 3*rsd = 3% bound at rsd=0.01), and
    # every percentile inside its rank-bound bracket.
    spark, oracle = _sketch_frames([1020, 2040], [10.5, 20.5])
    out = _check_approx_sketches(spark, oracle, con=None)
    assert out["within_bound"] is True
    assert out["max_hll_rel_err"] <= out["hll_bound"]


def test_sketch_checker_rejects_hll_out_of_bound():
    spark, oracle = _sketch_frames([1050, 2000], [10.5, 20.5])  # +5% > 3%
    assert (
        _check_approx_sketches(spark, oracle, con=None)["within_bound"]
        is False
    )


def test_sketch_checker_rejects_percentile_outside_rank_bounds():
    spark, oracle = _sketch_frames([1000, 2000], [12.0, 20.5])  # p50 > hi
    out = _check_approx_sketches(spark, oracle, con=None)
    assert out["within_bound"] is False
    assert out["percentiles_in_rank_bounds"] is False


def test_sketch_checker_rejects_exact_count_drift():
    spark, oracle = _sketch_frames([1000, 2000], [10.5, 20.5])
    spark["n_events"] = [5000, 9001]
    out = _check_approx_sketches(spark, oracle, con=None)
    assert out["within_bound"] is False
    assert "n_events" in out["reason"]


def _selection_frames(cutoffs, n_kept):
    oracle = pd.DataFrame(
        {
            "source": ["web", "wiki"],
            "n_docs": [400, 800],
            "quota": [100, 200],
            "lo_cut": [1.0, 2.0],
            "hi_cut": [1.5, 2.5],
            "n_kept_min": [98, 198],
            "n_kept_max": [104, 206],
        }
    )
    spark = pd.DataFrame(
        {
            "source": ["web", "wiki"],
            "n_docs": [400, 800],
            "quota": [100, 200],
            "n_kept": n_kept,
            "logit_cutoff": cutoffs,
        }
    )
    return spark, oracle


def test_selection_checker_accepts_in_bracket():
    spark, oracle = _selection_frames([1.2, 2.3], [101, 202])
    out = _check_selection_approx(spark, oracle, con=None)
    assert out["within_bound"] is True


def test_selection_checker_rejects_cutoff_outside_rank_bounds():
    spark, oracle = _selection_frames([0.9, 2.3], [101, 202])
    out = _check_selection_approx(spark, oracle, con=None)
    assert out["within_bound"] is False
    assert out["cutoff_in_rank_bounds"] is False


def test_selection_checker_rejects_kept_outside_bracket():
    spark, oracle = _selection_frames([1.2, 2.3], [90, 202])
    out = _check_selection_approx(spark, oracle, con=None)
    assert out["within_bound"] is False
    assert out["kept_in_bracket"] is False


def test_selection_checker_rejects_exact_column_drift():
    spark, oracle = _selection_frames([1.2, 2.3], [101, 202])
    spark["quota"] = [100, 201]
    out = _check_selection_approx(spark, oracle, con=None)
    assert out["within_bound"] is False
    assert "quota" in out["reason"]


def _pca_fixture(scale_pc1=1.0, shift=0.0):
    """Synthetic embeddings -> exact micro-unit moments frame (the
    approx_oracle shape) + the true top-4 projection frame, optionally
    corrupted."""
    import numpy as np

    from kafka_streams_reorder_timestamp_spark.operators.similarity import (
        DIM,
    )

    rng = np.random.default_rng(7)
    n = 300
    x = np.round(rng.normal(size=(n, DIM)), 6)
    v = np.round(x * 1_000_000).astype(np.int64)
    rows = [(0, 0, str(n))]
    rows += [(i + 1, 0, str(int(v[:, i].sum()))) for i in range(DIM)]
    g = v.T @ v
    rows += [
        (i + 1, j + 1, str(int(g[i, j])))
        for i in range(DIM)
        for j in range(i, DIM)
    ]
    odf = pd.DataFrame(rows, columns=["dim_i", "dim_j", "moment"])
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / n
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, np.argsort(evals)[::-1][:4]].T
    p = np.round((x - mean + shift) @ comps.T, 4)
    p[:, 0] *= scale_pc1
    sdf = pd.DataFrame(p, columns=["pc1", "pc2", "pc3", "pc4"])
    sdf.insert(0, "vec_id", range(n))
    return sdf, odf


def test_pca_checker_accepts_true_projection():
    sdf, odf = _pca_fixture()
    out = _check_pca_projection(sdf, odf, con=None)
    assert out["within_bound"] is True
    assert out["max_rel_var_err"] <= out["tol"]


def test_pca_checker_rejects_wrong_scaling():
    # An unnormalized eigenvector (pc1 scaled 1.1x) breaks the
    # variance-equals-eigenvalue identity by ~21%.
    sdf, odf = _pca_fixture(scale_pc1=1.1)
    assert _check_pca_projection(sdf, odf, con=None)["within_bound"] is False


def test_pca_checker_rejects_missing_centering():
    sdf, odf = _pca_fixture(shift=0.5)
    assert _check_pca_projection(sdf, odf, con=None)["within_bound"] is False


def test_pca_checker_rejects_row_count_drift():
    sdf, odf = _pca_fixture()
    assert (
        _check_pca_projection(sdf.iloc[:-1], odf, con=None)["within_bound"]
        is False
    )


def test_approx_registry_covers_exactly_the_regime_bounded_oracles():
    # The set is intentionally minimal: the two queries whose
    # exact-twin oracles leave validity at sf0.1 (PARITY_SF0.1.json)
    # plus the three with no exact regime at all (engine-specific
    # sketch/eigensolve output, twins riding QuerySpec.approx_oracle;
    # the driver keeps rows-only checks for those). Growing the set
    # requires the same measured justification.
    assert set(APPROX_GUARANTEES) == {
        "events_weekly_users_hll",
        "events_cms_user_counts",
        "events_approx_sketches",
        "quality_selection_approx",
        "embedding_pca_project",
    }
    assert APPROX_GUARANTEES["events_weekly_users_hll"] is _check_hll_weekly
    assert APPROX_GUARANTEES["events_cms_user_counts"] is _check_cms_counts
    assert (
        APPROX_GUARANTEES["events_approx_sketches"] is _check_approx_sketches
    )
    assert (
        APPROX_GUARANTEES["quality_selection_approx"]
        is _check_selection_approx
    )
    assert (
        APPROX_GUARANTEES["embedding_pca_project"] is _check_pca_projection
    )


def test_approx_guarantees_hold_end_to_end_at_oracle_sf(
    spark, oracle_sf_dir
):
    """Run the REAL approx-oracle SQL + checker for every
    APPROX_GUARANTEES query whose twin rides QuerySpec.approx_oracle
    (the three with no exact regime), at the driver's oracle SF — so
    a regression in the twin SQL or the checker wiring fails pytest,
    not just the next parity sweep. The two exact-regime queries
    (HLL weekly / CMS) are hash-green at this SF and covered by
    test_oracle_parity; their checkers only engage above it."""
    import duckdb

    from kafka_streams_reorder_timestamp_spark.operators import registry
    from kafka_streams_reorder_timestamp_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{oracle_sf_dir}/{t}.parquet'"
        )
    ran = 0
    for name, checker in APPROX_GUARANTEES.items():
        spec = registry.REGISTRY[name]
        if spec.approx_oracle is None:
            continue
        spark.catalog.clearCache()
        sdf = spec.builder(spark, oracle_sf_dir).toPandas()
        odf = con.execute(spec.approx_oracle).fetch_df()
        out = checker(sdf, odf, con)
        assert out["within_bound"] is True, (name, out)
        ran += 1
    spark.catalog.clearCache()
    assert ran == 3


def test_approx_oracle_never_exported_to_the_driver():
    # The driver hash-compares oracle_sql() bit-for-bit; an
    # approx_oracle leaking there would turn bounded estimation error
    # into recorded failures. It must stay parity-internal.
    from kafka_streams_reorder_timestamp_spark.operators import registry

    for name in (
        "events_approx_sketches",
        "quality_selection_approx",
        "embedding_pca_project",
    ):
        assert registry.REGISTRY[name].approx_oracle is not None, name
        assert registry.REGISTRY[name].oracle is None, name
        assert name not in registry.all_oracles(), name

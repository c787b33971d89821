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
    _check_cms_counts,
    _check_hll_weekly,
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


def test_approx_registry_covers_exactly_the_regime_bounded_oracles():
    # The set is intentionally minimal: exactly the two queries whose
    # exact-twin oracles leave validity at sf0.1 (PARITY_SF0.1.json).
    # Growing it requires the same measured justification.
    assert set(APPROX_GUARANTEES) == {
        "events_weekly_users_hll",
        "events_cms_user_counts",
    }
    assert APPROX_GUARANTEES["events_weekly_users_hll"] is _check_hll_weekly
    assert APPROX_GUARANTEES["events_cms_user_counts"] is _check_cms_counts

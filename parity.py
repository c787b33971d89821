"""Full-registry DuckDB parity harness — the driver's CORRECTNESS
check, run locally over EVERY registered query (the driver itself caps
at the first 50 registry entries per round).

Writes PARITY_FULL.json next to this script: one row per query with
rows/schema/hash match flags (driver format). Queries without an
oracle record spark_rows and err="no_oracle".

Usage:  python parity.py [--only name1,name2,...] [--heavy]
        [env: SPARK_GRAFT_SF_DIR, default sf0.01]

--only restricts the run to the named queries (comma-separated) for
fast iteration; PARITY_FULL.json is NOT written in that mode so a
partial run can never masquerade as a full-registry result.
--heavy is shorthand for --only over HEAVY_ORACLES (below).

DuckDB memory envelope (round 10, VERDICT r9 task 8): the oracles in
HEAVY_ORACLES are the ones whose DuckDB side is closest to the
engine's memory ceiling at sf0.01 — recursive-CTE connected
components over pair sets and multi-referenced signature CTEs. Each
already carries `AS MATERIALIZED` hints on its multi-referenced CTEs
(without them DuckDB re-inlines the subplan inside the recursion;
semdedup_clusters OOM'd that way in round 9 with the 384-term cosine
join re-evaluated per recursion step). If a future testdata bump
flips any of these from green to crashed, run `python parity.py
--heavy` first: a crash here is a DuckDB-side cost problem (add
MATERIALIZED hints / bound the oracle corpus), NOT a Spark
correctness regression. Measured headroom (round 10): all 11 ran
hash-green at sf0.1 too (the full-registry sf0.1 sweep covers the
whole list, including dedup_clusters_sampled's recursive CTE over
the induced half-corpus subgraph) — one full decade above the
sf0.01 the driver checks at, so a same-order testdata bump is safe.

SF-scoped sketch oracles (round 10, full sf0.1 sweep —
PARITY_SF0.1.json): 194/199 hash-green a decade above the driver's
SF; the only two divergences are `events_weekly_users_hll` and
`events_cms_user_counts`, BY THEIR DOCUMENTED DESIGN — each oracle is
the exact twin valid while the sketch is in its exact regime
(HLL coupon mode / collision-free CMS counters), which holds at
sf0.01 but not at sf0.1 (~1,400 weekly users puts HLL in estimation
mode, ~0.3% error — the sketch WORKING as specified). If the
driver's oracle SF ever rises, expect exactly these two to flip
hash-red first, and read that as the regime boundary, not a bug.

Approx-regime verification (round 10): instead of leaving those two
as bare hash-reds above the exact regime, APPROX_GUARANTEES maps
each sketch query to a numeric checker that verifies the sketch's
PUBLISHED guarantee against the exact-oracle values row by row —
HLL estimates within 3 relative standard errors (RSE = 1.04 /
sqrt(2^lgConfigK), Datasketches default lgConfigK=12), Count-Min
estimates never below the exact count and overshooting by at most
(e / width) * N. A hash mismatch on one of these queries therefore
resolves to `approx_verified` (counted separately, exit 0) when the
bound holds, and stays a hard failure when it does not — so the
sweep distinguishes "the sketch is estimating as specified" from
"the sketch is broken" mechanically, not by prose. Exact-by-
construction companion columns (merge counts, key columns) must
still match bit-for-bit inside the checker.

The same mechanism retires the registry's last `no_oracle` rows:
queries whose output is engine-specific at EVERY SF (Spark-internal
HLL++/GK sketches, the LAPACK eigensolve) carry their exact twin in
QuerySpec.approx_oracle — consumed only here, never exported to the
driver, whose bit-hash would mis-read bounded estimation error as
failure — and parity routes them through their checker instead of
recording `no_oracle`: events_approx_sketches (HLL++ 3*rsd +
GK rank brackets), quality_selection_approx (GK cutoff rank bracket
+ the exact kept-count interval it implies), embedding_pca_project
(projection variance spectrum vs an independent eigensolve of the
exact micro-unit moments). Net: every registered query is
mechanically verified against DuckDB every sweep — bit-hash where
exactness is possible, published-guarantee bounds where it is not.
"""

from __future__ import annotations

# Oracles nearest DuckDB's memory envelope at sf0.01 (see module
# docstring): recursive-CTE clustering + multi-referenced
# MATERIALIZED signature machinery.
HEAVY_ORACLES = [
    "dedup_clusters",
    "dedup_clusters_sampled",
    "dedup_clusters_lsh",
    "semdedup_clusters",
    "semdedup_pairs",
    "ann_pq_adc_topk",
    "dedup_minhash_lsh",
    "dedup_lsh_recall_audit",
    "dedup_lsh_recall_audit_sampled",
    "dedup_jaccard_shingles",
    "bpe_train_merges",
    "bpe_tokenize_corpus",
]

import datetime as dt
import json
import math
import os
import sys
import traceback

import duckdb
import pandas as pd


def _check_hll_weekly(sdf: pd.DataFrame, odf: pd.DataFrame, con) -> dict:
    """Guarantee check for events_weekly_users_hll beyond the exact
    regime: Datasketches HLL with the default lgConfigK=12 has
    relative standard error 1.04/sqrt(2^12) ~= 1.625%; require every
    weekly estimate within 3 RSE of the exact COUNT(DISTINCT), and
    the exact-by-construction n_days_merged column bit-equal."""
    keys = ["event_type", "week_us"]
    m = sdf.merge(odf, on=keys, suffixes=("_s", "_o"))
    if not (len(m) == len(sdf) == len(odf)):
        return {"within_bound": False, "reason": "key sets differ"}
    if not (
        m["n_days_merged_s"].astype("int64")
        == m["n_days_merged_o"].astype("int64")
    ).all():
        return {
            "within_bound": False,
            "reason": "exact column n_days_merged differs",
        }
    exact = m["approx_weekly_users_o"].astype("float64")
    est = m["approx_weekly_users_s"].astype("float64")
    rel = ((est - exact).abs() / exact.clip(lower=1.0)).max()
    bound = 3 * 1.04 / math.sqrt(2**12)
    return {
        "within_bound": bool(rel <= bound),
        "guarantee": "HLL lgConfigK=12: |est-exact|/exact <= 3*RSE",
        "max_rel_err": round(float(rel), 6),
        "bound": round(bound, 6),
    }


def _check_cms_counts(sdf: pd.DataFrame, odf: pd.DataFrame, con) -> dict:
    """Guarantee check for events_cms_user_counts beyond the
    collision-free regime: Count-Min never undercounts, and each
    estimate overshoots the exact count by at most (e/width)*N with
    high probability, N = rows sketched (non-null user_id events).
    Width imported from the single source of truth, not retyped
    (the ADVICE r9 lesson on forked constants)."""
    from kafka_streams_reorder_timestamp_spark.operators.events_queries import (
        CMS_WIDTH,
    )

    m = sdf.merge(odf, on=["user_id"], suffixes=("_s", "_o"))
    if not (len(m) == len(sdf) == len(odf)):
        return {"within_bound": False, "reason": "probe key sets differ"}
    n_total = con.execute(
        "SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL"
    ).fetchone()[0]
    over = m["est_count_s"].astype("int64") - m["est_count_o"].astype(
        "int64"
    )
    cap = math.e / CMS_WIDTH * n_total
    ok = bool((over >= 0).all() and (over <= cap).all())
    return {
        "within_bound": ok,
        "guarantee": "CMS: exact <= est <= exact + (e/width)*N",
        "max_overshoot": int(over.max()),
        "overshoot_cap": round(cap, 2),
        "n_sketched": int(n_total),
    }


def _check_approx_sketches(sdf: pd.DataFrame, odf: pd.DataFrame, con) -> dict:
    """Guarantee check for events_approx_sketches, whose output is
    engine-specific at EVERY SF (HLL++ rsd=0.01 estimates 151 for an
    exact 150 already at sf0.01), so it carries approx_oracle instead
    of oracle: per event_type, the HLL++ distinct estimate must sit
    within 3 relative standard errors (rsd=0.01) of the exact count,
    each approx_percentile(accuracy=10000) estimate between the exact
    values at rank q -/+ 1/accuracy (the GK rank-error guarantee),
    and the exact-by-construction n_events column bit-equal."""
    m = sdf.merge(odf, on=["event_type"], suffixes=("", "_o"))
    if not (len(m) == len(sdf) == len(odf)):
        return {"within_bound": False, "reason": "event_type sets differ"}
    if not (
        m["n_events"].astype("int64") == m["n_events_o"].astype("int64")
    ).all():
        return {
            "within_bound": False,
            "reason": "exact column n_events differs",
        }
    exact = m["exact_users"].astype("float64")
    rel = (
        (m["approx_users"].astype("float64") - exact).abs()
        / exact.clip(lower=1.0)
    ).max()
    hll_bound = 3 * 0.01
    pct_ok = True
    for q in ("p50", "p95", "p99"):
        pct_ok = pct_ok and bool(
            ((m[f"lo_{q}"] <= m[q]) & (m[q] <= m[f"hi_{q}"])).all()
        )
    return {
        "within_bound": bool(rel <= hll_bound) and pct_ok,
        "guarantee": "HLL++ rsd=0.01: 3*rsd; GK acc=10000: rank +/- 1e-4",
        "max_hll_rel_err": round(float(rel), 6),
        "hll_bound": hll_bound,
        "percentiles_in_rank_bounds": pct_ok,
    }


def _check_selection_approx(sdf: pd.DataFrame, odf: pd.DataFrame, con) -> dict:
    """Guarantee check for quality_selection_approx (GK-sketch
    per-source cutoff; engine-specific at every SF, so approx_oracle):
    n_docs/quota bit-equal; the cutoff between the exact logits at
    ranks 0.75n -/+ (n/10000 + 1); n_kept inside the exact kept-count
    bracket those two cutoffs imply (count >= c is monotone in c)."""
    m = sdf.merge(odf, on=["source"], suffixes=("", "_o"))
    if not (len(m) == len(sdf) == len(odf)):
        return {"within_bound": False, "reason": "source sets differ"}
    for c in ("n_docs", "quota"):
        if not (
            m[c].astype("int64") == m[f"{c}_o"].astype("int64")
        ).all():
            return {
                "within_bound": False,
                "reason": f"exact column {c} differs",
            }
    cut_ok = bool(
        (
            (m["lo_cut"] <= m["logit_cutoff"])
            & (m["logit_cutoff"] <= m["hi_cut"])
        ).all()
    )
    kept_ok = bool(
        (
            (m["n_kept_min"] <= m["n_kept"])
            & (m["n_kept"] <= m["n_kept_max"])
        ).all()
    )
    return {
        "within_bound": cut_ok and kept_ok,
        "guarantee": "GK acc=10000: cutoff rank +/- (1e-4*n + 1); "
        "n_kept in the implied exact bracket",
        "cutoff_in_rank_bounds": cut_ok,
        "kept_in_bracket": kept_ok,
        "max_kept_bracket": int(
            (m["n_kept_max"] - m["n_kept_min"]).max()
        ),
    }


def _check_pca_projection(sdf: pd.DataFrame, odf: pd.DataFrame, con) -> dict:
    """Guarantee check for embedding_pca_project (eigensolve is
    LAPACK-bound, so approx_oracle): reconstruct the covariance from
    the EXACT DuckDB micro-unit moments (the hash-green
    embedding_pca_moments SQL), eigensolve it independently, and
    require the registered projection to have that spectrum's
    variance structure — per-component population variance equal to
    the top-k eigenvalues, components centered and pairwise
    uncorrelated. Tolerance 1e-3 relative: observed error is ~1e-5
    (micro-unit quantization + the projection's 4-decimal rounding);
    any real defect — unnormalized eigenvectors, missing centering,
    wrong component order, a non-eigenvector direction — shows at
    1e-2 or far above."""
    import numpy as np

    from kafka_streams_reorder_timestamp_spark.operators.similarity import (
        DIM,
    )

    o = {
        (int(r.dim_i), int(r.dim_j)): int(r.moment)
        for r in odf.itertuples()
    }
    n = o[(0, 0)]
    if len(sdf) != n:
        return {"within_bound": False, "reason": "row count != moments n"}
    s = np.array([o[(i, 0)] for i in range(1, DIM + 1)], dtype=np.float64)
    g = np.zeros((DIM, DIM))
    for i in range(1, DIM + 1):
        for j in range(i, DIM + 1):
            g[i - 1, j - 1] = g[j - 1, i - 1] = o[(i, j)]
    mean_q = s / n
    cov = (g / n - np.outer(mean_q, mean_q)) / 1e12
    k = sum(1 for c in sdf.columns if c.startswith("pc"))
    evals = np.linalg.eigvalsh(cov)[::-1][:k]
    p = sdf[[f"pc{i}" for i in range(1, k + 1)]].to_numpy(dtype=np.float64)
    rel_var = float(np.abs(p.var(axis=0) - evals).max() / evals.max())
    mean_rel = float(np.abs(p.mean(axis=0)).max() / math.sqrt(evals[0]))
    c = np.cov(p.T, bias=True)
    offdiag_rel = float(
        np.abs(c - np.diag(np.diag(c))).max()
        / math.sqrt(evals[0] * evals[k - 1])
    )
    tol = 1e-3
    return {
        "within_bound": bool(
            rel_var <= tol and mean_rel <= tol and offdiag_rel <= tol
        ),
        "guarantee": "proj variance spectrum == eigh(exact moments), "
        "centered, uncorrelated (rel tol 1e-3)",
        "max_rel_var_err": round(rel_var, 8),
        "max_rel_mean": round(mean_rel, 8),
        "max_rel_offdiag": round(offdiag_rel, 8),
        "tol": tol,
    }


# Sketch queries whose registered oracle is the EXACT twin, valid
# only inside the sketch's exact regime (sparse/coupon HLL,
# collision-free CMS counters — see each query's @register comment).
# Above that regime the hash mismatch is the sketch estimating as
# specified; the checker verifies the published bound numerically.
# events_approx_sketches has NO exact regime at all (HLL++ estimation
# bias shows at sf0.01 already), so its exact twin lives in
# QuerySpec.approx_oracle — parity always routes it through the
# checker, and the driver keeps the rows-only check. The Theta set-op
# queries (events_audience_theta_setops, audience_overlap_matrix_theta)
# stay hash-exact through sf0.1 (nominal entries 4096 > the user
# universe); add checkers here the day a testdata bump pushes them
# into estimation mode.
APPROX_GUARANTEES = {
    "events_weekly_users_hll": _check_hll_weekly,
    "events_cms_user_counts": _check_cms_counts,
    "events_approx_sketches": _check_approx_sketches,
    "quality_selection_approx": _check_selection_approx,
    "embedding_pca_project": _check_pca_projection,
}


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


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame()
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).astype("datetime64[us]").astype("int64")
        else:
            s = s.map(_cell)
        out[c] = s
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only: set[str] | None = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    if "--heavy" in sys.argv:
        only = (only or set()) | set(HEAVY_ORACLES)
    out_name = "PARITY_FULL.json"
    if "--out" in sys.argv:
        out_name = os.path.basename(sys.argv[sys.argv.index("--out") + 1])

    from kafka_streams_reorder_timestamp_spark.operators import registry
    from kafka_streams_reorder_timestamp_spark.session import get_spark
    from kafka_streams_reorder_timestamp_spark.sources.catalog import TABLES

    if only is not None:
        unknown = only - set(registry.REGISTRY)
        if unknown:
            # Fail fast: a typo'd --only would otherwise run zero
            # queries and exit 0, masquerading as a passing check.
            print(
                f"parity: unknown query names in --only: {sorted(unknown)}",
                file=sys.stderr,
            )
            return 1

    spark = get_spark(app_name="parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    results: dict[str, dict] = {}
    n_green = n_no_oracle = n_bad = n_approx = 0
    for name, spec in registry.REGISTRY.items():
        if only is not None and name not in only:
            continue
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spark.catalog.clearCache()
            sdf = spec.builder(spark, sf_dir).toPandas()
            row["spark_rows"] = len(sdf)
            if spec.oracle is None:
                approx_sql = getattr(spec, "approx_oracle", None)
                if approx_sql is not None and name in APPROX_GUARANTEES:
                    # Engine-specific output with an exact twin: no
                    # hash is ever expected; verify the published
                    # bound instead. Row/schema comparisons are
                    # twin-specific (the twin carries exact values +
                    # bounds, sometimes at a different granularity),
                    # so key-set/row checks live inside the checker.
                    odf = con.execute(approx_sql).fetch_df()
                    row["oracle_rows"] = len(odf)
                    check = APPROX_GUARANTEES[name](sdf, odf, con)
                    row["approx"] = check
                    if check.get("within_bound"):
                        row["err"] = "approx_regime"
                        n_approx += 1
                    else:
                        n_bad += 1
                else:
                    row["err"] = "no_oracle"
                    n_no_oracle += 1
            else:
                odf = con.execute(spec.oracle).fetch_df()
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(sdf) == len(odf)
                row["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                row["hash_match"] = bool(
                    row["rows_match"]
                    and row["schema_match"]
                    and _canon(sdf).equals(_canon(odf))
                )
                if row["hash_match"]:
                    n_green += 1
                elif name in APPROX_GUARANTEES:
                    check = APPROX_GUARANTEES[name](sdf, odf, con)
                    row["approx"] = check
                    if check.get("within_bound"):
                        row["err"] = "approx_regime"
                        n_approx += 1
                    else:
                        n_bad += 1
                else:
                    n_bad += 1
        except Exception as e:
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            n_bad += 1
            traceback.print_exc(limit=3, file=sys.stderr)
        results[name] = row
        tag = (
            "OK"
            if row["hash_match"]
            else (
                "no_oracle"
                if row["err"] == "no_oracle"
                else (
                    "approx_verified"
                    if row["err"] == "approx_regime"
                    else "FAIL"
                )
            )
        )
        print(f"parity: {name}: {tag}", file=sys.stderr)

    repo_root = os.path.dirname(os.path.abspath(__file__))
    summary = {
        "n_queries": len(results),
        "n_hash_green": n_green,
        "n_approx_verified": n_approx,
        "n_no_oracle": n_no_oracle,
        "n_failed": n_bad,
    }
    if only is not None:
        print(json.dumps(summary))
        return 0 if n_bad == 0 else 1
    with open(os.path.join(repo_root, out_name), "w") as f:
        json.dump(
            {"sf_dir": sf_dir, **summary, "queries": results},
            f,
            indent=1,
        )
    print(json.dumps(summary))
    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

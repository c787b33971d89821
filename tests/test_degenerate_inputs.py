"""Degenerate-input robustness (round-11, VERDICT r10 task 7).

The approx checkers and the integer-bp audit divisions historically
assumed non-empty legs — at sf0.01 the planted corpus guaranees
n_true > 0, so a future SF or fixture change could turn a silent
assumption into a DIVIDE_BY_ZERO mid-pipeline. These tests pin the
contract for the two degenerate regimes the suite never exercised:

1. **Zero-row tables** — every one of the 199 registered builders must
   run to completion on a dataset where all ten catalog tables are
   empty (exact on-disk schemas, zero rows). No crash, no ANSI
   arithmetic error; audits emit NULL basis-points, not exceptions.
2. **All-null text** — the documents-reading families must survive a
   documents table whose every `text` (and `n_chars`) is NULL: the
   `text IS NOT NULL` guards reduce it to the empty-corpus case.

Cross-engine: the audit rows at zero input are ALSO checked against
their own DuckDB oracles, so the NULL-bp semantics agree between the
Spark plan and the oracle SQL (`// NULLIF(..., 0)`).

Round 12 (VERDICT r11 task 6 + ADVICE): every sweep now VALUE-checks
the oracled subset against DuckDB on the same degenerate tables
(`_oracle_compare`) — a query that silently emits wrong non-empty
output on degenerate input fails, not just one that crashes — and the
relational/TPC-H family gains its own corrupt-payload sweep
(`allnull_relational_dir`: join keys survive, every
measure/date/flag NULL).
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_reorder_timestamp_spark.operators.registry import REGISTRY

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

SRC = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Modules whose queries read the documents table (directly or through
# the planted/dedup corpora) — the all-null-text sweep's scope.
_DOC_MODULES = {
    "text",
    "dedup",
    "simhash",
    "chunking",
    "pipeline",
    "classifier",
    "sampling",
    "graph",
    "multimodal",
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    """All ten catalog tables with their exact on-disk schemas, 0 rows."""
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{SRC}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def allnull_text_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but every documents.text / n_chars is NULL."""
    out = tmp_path_factory.mktemp("sf_allnull")
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        if t != "documents":
            tbl = pq.read_table(src)
        else:
            base = pq.read_table(src)
            n = base.num_rows
            schema = base.schema
            tbl = pa.table(
                {
                    "doc_id": base["doc_id"],
                    "text": pa.nulls(n, schema.field("text").type),
                    "lang": base["lang"],
                    "source": base["source"],
                    "n_chars": pa.nulls(n, schema.field("n_chars").type),
                },
                schema=pa.schema(
                    [schema.field(name) for name in
                     ("doc_id", "text", "lang", "source", "n_chars")]
                ),
            )
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


def _oracle_compare(sf_dir: str, name, sdf) -> None:
    """Value-level degenerate check (round 12, ADVICE r11): run the
    query's DuckDB oracle over the SAME degenerate tables and require
    the canonical frames to be equal — a query that silently emits
    wrong non-empty output on degenerate input fails here, not just
    one that crashes. Reuses the driver-style canonicalization from
    test_oracle_parity (columns sorted by name, rows sorted,
    NaN == NULL)."""
    from test_oracle_parity import _canon

    spec = REGISTRY[name]
    if spec.oracle is None:
        return
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        odf = con.execute(spec.oracle).fetch_df()
    finally:
        con.close()
    assert len(sdf) == len(odf), (
        f"{name}: degenerate rows {len(sdf)} vs oracle {len(odf)}"
    )
    assert sorted(sdf.columns) == sorted(odf.columns)
    if len(sdf) == 0:
        # Both empty with matching columns — equal by definition.
        # (pandas .equals also compares dtypes, which differ
        # meaninglessly between an empty Arrow->pandas frame and an
        # empty DuckDB fetch_df.)
        return
    a, b = _canon(sdf), _canon(odf)
    assert a.equals(b), f"{name}: degenerate value mismatch\n{a}\nvs\n{b}"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_every_query_survives_zero_row_tables(spark, empty_sf_dir, name):
    """The plan must succeed on fully-empty inputs — 0..n rows is
    fine, an exception (DIVIDE_BY_ZERO, IndexError, ...) is not — and
    for every oracled query the VALUES must match the DuckDB oracle on
    the same empty tables (most shapes reduce to zero rows; global
    aggregates to one all-zero/NULL row; either way both engines must
    agree by construction, not by luck)."""
    try:
        sdf = REGISTRY[name].builder(spark, empty_sf_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(empty_sf_dir, name, sdf)


@pytest.fixture(scope="module")
def allnull_emb_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but every embeddings.embedding vector is NULL."""
    out = tmp_path_factory.mktemp("sf_nullemb")
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        tbl = pq.read_table(src)
        if t == "embeddings":
            schema = tbl.schema
            cols = {
                f.name: (
                    pa.nulls(tbl.num_rows, f.type)
                    if f.name == "embedding"
                    else tbl[f.name]
                )
                for f in schema
            }
            tbl = pa.table(cols, schema=schema)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def emptystr_text_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but every documents.text is the EMPTY STRING —
    distinct from NULL: it survives IS NOT NULL guards and tokenizes
    to zero tokens, the classic divide-by-len shape (two zero-token
    docs in one block → Jaccard 0/0)."""
    out = tmp_path_factory.mktemp("sf_emptystr")
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        tbl = pq.read_table(src)
        if t == "documents":
            schema = tbl.schema
            n = tbl.num_rows
            cols = {}
            for f in schema:
                if f.name == "text":
                    cols[f.name] = pa.array([""] * n, type=f.type)
                elif f.name == "n_chars":
                    cols[f.name] = pa.array([0] * n, type=f.type)
                else:
                    cols[f.name] = tbl[f.name]
            tbl = pa.table(cols, schema=schema)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, spec in REGISTRY.items()
        if spec.builder.__module__.split(".")[-1] in _DOC_MODULES
    ),
)
def test_document_queries_survive_empty_string_text(
    spark, emptystr_text_dir, name
):
    """Zero-token (but non-NULL) text must reduce to empty token sets
    everywhere — the Jaccard engines exclude zero-token docs (their
    similarity is 0/0, and the oracles' DuckDB x/0 → NULL fails the
    threshold filter), never raise DIVIDE_BY_ZERO — and the oracled
    subset must value-match DuckDB on the same tables."""
    try:
        sdf = REGISTRY[name].builder(spark, emptystr_text_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(emptystr_text_dir, name, sdf)


@pytest.fixture(scope="module")
def allnull_events_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but events.ts / value / props are all NULL —
    the corrupt-ingest shape (ids survive, payload fields don't)."""
    out = tmp_path_factory.mktemp("sf_nullev")
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        tbl = pq.read_table(src)
        if t == "events":
            schema = tbl.schema
            cols = {
                f.name: (
                    pa.nulls(tbl.num_rows, f.type)
                    if f.name in ("ts", "value", "props")
                    else tbl[f.name]
                )
                for f in schema
            }
            tbl = pa.table(cols, schema=schema)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


_EVENT_MODULES = {"events_queries", "timeseries", "breadth", "graph"}


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, spec in REGISTRY.items()
        if spec.builder.__module__.split(".")[-1] in _EVENT_MODULES
    ),
)
def test_event_queries_survive_all_null_payload(
    spark, allnull_events_dir, name
):
    """NULL event time / value / props must flow through the event
    family (windows, sketches, sessionization, reorder) as SQL NULLs —
    dropped or grouped per NULL semantics, never a crash — and the
    oracled subset must value-match DuckDB on the same tables (this is
    exactly the sweep that pins the reorder_events `ts IS NOT NULL`
    oracle guard: both engines must drop un-sequenceable rows)."""
    try:
        sdf = REGISTRY[name].builder(spark, allnull_events_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(allnull_events_dir, name, sdf)


# Every query that scans the embeddings table (the similarity module
# plus the two cross-module consumers of similarity._embeddings).
_EMB_QUERIES = sorted(
    {
        n
        for n, spec in REGISTRY.items()
        if spec.builder.__module__.split(".")[-1] == "similarity"
    }
    | {"dedup_embedding_pairs", "decontaminate_semantic"}
)


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_embedding_queries_survive_all_null_vectors(
    spark, allnull_emb_dir, name
):
    """A NULL embedding is not a point in the vector space — the
    similarity family excludes it at the scan (similarity._embeddings)
    so the Arrow/numpy paths never see np.asarray(None). All-null
    vectors must therefore reduce to the empty-corpus case, and the
    oracled subset must value-match DuckDB on the same tables."""
    try:
        sdf = REGISTRY[name].builder(spark, allnull_emb_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(allnull_emb_dir, name, sdf)


@pytest.fixture(scope="module")
def nullprobe_emb_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but ONLY vec_id 0's embedding is NULL — the
    mixed-corruption shape (round 13, ADVICE r12): the corpus is
    intact, the designated PROBE vector is missing. Distinct from the
    all-null and zero-row sweeps, both of which empty the outer scan
    too; here probe-anchored queries (hybrid_rrf_search's dense leg,
    ann_*_query) must drop their probe-dependent output while
    corpus-wide queries are untouched."""
    out = tmp_path_factory.mktemp("sf_nullprobe")
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        tbl = pq.read_table(src)
        if t == "embeddings":
            schema = tbl.schema
            vec_ids = tbl["vec_id"].to_pylist()
            emb = tbl["embedding"].to_pylist()
            cols = {
                f.name: (
                    pa.array(
                        [None if v == 0 else e for v, e in zip(vec_ids, emb)],
                        type=f.type,
                    )
                    if f.name == "embedding"
                    else tbl[f.name]
                )
                for f in schema
            }
            tbl = pa.table(cols, schema=schema)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_embedding_queries_survive_null_probe_vector(
    spark, nullprobe_emb_dir, name
):
    """A missing PROBE embedding (vec 0 NULL, corpus intact) must make
    probe-anchored legs vanish on BOTH engines — the engine's probe
    DataFrame is empty, so the oracle's scalar probe subquery must not
    leave NULL-scored rows alive through ROW_NUMBER/QUALIFY (the
    hybrid_rrf_search dense-leg divergence, ADVICE r12) — and the
    oracled subset must value-match DuckDB on the same tables."""
    try:
        sdf = REGISTRY[name].builder(spark, nullprobe_emb_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(nullprobe_emb_dir, name, sdf)


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, spec in REGISTRY.items()
        if spec.builder.__module__.split(".")[-1] in _DOC_MODULES
    ),
)
def test_document_queries_survive_all_null_text(spark, allnull_text_dir, name):
    """The text IS NOT NULL guards must reduce an all-null corpus to
    the empty-corpus case everywhere — never a mid-plan crash — and
    the oracled subset must value-match DuckDB on the same tables."""
    try:
        sdf = REGISTRY[name].builder(spark, allnull_text_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(allnull_text_dir, name, sdf)


# --------------------------------------------------------------------------
# Relational / TPC-H family (round 12, VERDICT r11 task 6): the
# orders/lineitem/customer-reading modules previously saw only the
# zero-row sweep; this fixture is the corrupt-payload shape for the
# relational side — join keys survive, every measure/date/flag is NULL
# (Pareto cutoffs, decile windows, date filters, group-by flags all
# over NULL input).

_REL_MODULES = {"relational", "subqueries", "breadth", "asof", "timeseries"}

_NULL_PAYLOAD = {
    "orders": {"o_orderstatus", "o_totalprice", "o_orderdate",
               "o_orderpriority"},
    "lineitem": {"l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"},
    "customer": {"c_name", "c_acctbal", "c_mktsegment"},
}


@pytest.fixture(scope="module")
def allnull_relational_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but every non-key orders/lineitem/customer
    payload column is NULL (keys kept so joins still fan out)."""
    out = tmp_path_factory.mktemp("sf_nullrel")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        nulled = _NULL_PAYLOAD.get(t)
        if nulled:
            schema = tbl.schema
            cols = {
                f.name: (
                    pa.nulls(tbl.num_rows, f.type)
                    if f.name in nulled
                    else tbl[f.name]
                )
                for f in schema
            }
            tbl = pa.table(cols, schema=schema)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, spec in REGISTRY.items()
        if spec.builder.__module__.split(".")[-1] in _REL_MODULES
    ),
)
def test_relational_queries_survive_all_null_payload(
    spark, allnull_relational_dir, name
):
    """NULL measures/dates/flags must flow through the relational
    family per SQL NULL semantics (filters drop them, SUMs go NULL,
    group keys collapse to the NULL group) — never a crash — and the
    oracled subset must value-match DuckDB on the same tables."""
    try:
        sdf = REGISTRY[name].builder(spark, allnull_relational_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(allnull_relational_dir, name, sdf)


# Round 12 (second axis extension): corrupt JOIN topology. Two shapes
# a 100 TB ingest actually produces — NULL foreign keys (failed
# lookups written as NULL) and all-orphan foreign keys (parent
# partition lost; every child points at a missing parent). SQL NULL
# join semantics (NULL never equals NULL) and outer-join NULL
# propagation must agree cross-engine through every downstream
# window/percentile/rollup.

_NULL_FKEYS = {
    "orders": {"o_custkey"},
    "lineitem": {"l_partkey", "l_suppkey"},
    "customer": {"c_nationkey"},
}


@pytest.fixture(scope="module")
def nullkey_relational_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but every relational FOREIGN key is NULL
    (primary keys and payloads survive — the failed-lookup shape)."""
    out = tmp_path_factory.mktemp("sf_nullkey")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        nulled = _NULL_FKEYS.get(t)
        if nulled:
            schema = tbl.schema
            cols = {
                f.name: (
                    pa.nulls(tbl.num_rows, f.type)
                    if f.name in nulled
                    else tbl[f.name]
                )
                for f in schema
            }
            tbl = pa.table(cols, schema=schema)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def orphan_relational_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but every relational foreign key is offset by
    10^9 — all children orphaned, no parent row matches (the
    lost-parent-partition shape)."""
    import pyarrow.compute as pc

    out = tmp_path_factory.mktemp("sf_orphan")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        orphaned = _NULL_FKEYS.get(t)
        if orphaned:
            schema = tbl.schema
            cols = {
                f.name: (
                    pc.add(tbl[f.name], 1_000_000_000)
                    if f.name in orphaned
                    else tbl[f.name]
                )
                for f in schema
            }
            tbl = pa.table(cols, schema=schema)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, spec in REGISTRY.items()
        if spec.builder.__module__.split(".")[-1] in _REL_MODULES
    ),
)
def test_relational_queries_survive_all_null_fkeys(
    spark, nullkey_relational_dir, name
):
    """NULL foreign keys never join (NULL <> NULL), so inner joins go
    empty and outer joins carry NULL-extended rows — both engines must
    agree on every downstream aggregate/window, never crash."""
    try:
        sdf = REGISTRY[name].builder(spark, nullkey_relational_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(nullkey_relational_dir, name, sdf)


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, spec in REGISTRY.items()
        if spec.builder.__module__.split(".")[-1] in _REL_MODULES
    ),
)
def test_relational_queries_survive_all_orphan_fkeys(
    spark, orphan_relational_dir, name
):
    """All-orphan foreign keys: every child row points at a missing
    parent — inner joins empty, anti joins full, left joins
    NULL-extended. Cross-engine agreement, value-checked."""
    try:
        sdf = REGISTRY[name].builder(spark, orphan_relational_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(orphan_relational_dir, name, sdf)


@pytest.mark.parametrize(
    "name", ["dedup_lsh_recall_audit", "dedup_lsh_recall_audit_sampled"]
)
def test_audit_bp_null_not_crash_on_empty(spark, empty_sf_dir, name):
    """Zero true/found pairs → counts 0 and NULL basis-points (the
    downstream alert sees NULL, a loud signal), and the DuckDB oracle
    agrees field-for-field on the same empty tables."""
    row = REGISTRY[name].builder(spark, empty_sf_dir).collect()
    spark.catalog.clearCache()
    assert len(row) == 1
    r = row[0].asDict()
    assert r["n_true"] == 0 and r["n_found"] == 0 and r["n_hit"] == 0
    assert r["recall_bp"] is None and r["precision_bp"] is None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{empty_sf_dir}/{t}.parquet'"
        )
    cur = con.execute(REGISTRY[name].oracle)
    cols = [d[0] for d in cur.description]
    oracle = dict(zip(cols, cur.fetchone()))
    assert oracle == r


def test_pca_fit_raises_loudly_on_empty(spark, empty_sf_dir):
    """Model fitting on an empty corpus is undefined: a clear
    ValueError, never an IndexError deep in the moment unpack."""
    from kafka_streams_reorder_timestamp_spark.functions.vectors import (
        as_double,
    )
    from kafka_streams_reorder_timestamp_spark.operators.similarity import (
        DIM,
        pca_fit,
    )
    from kafka_streams_reorder_timestamp_spark.sources.catalog import (
        load_table,
    )

    e = load_table(spark, empty_sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    with pytest.raises(ValueError, match="no non-null vectors"):
        pca_fit(e, "emb", k=4, dim=DIM)


def test_pca_project_empty_in_empty_out(spark, empty_sf_dir):
    """The registered projection keeps SQL semantics: empty corpus →
    empty relation with the full pc1..pc4 schema."""
    df = REGISTRY["embedding_pca_project"].builder(spark, empty_sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "vec_id",
        "label",
        "pc1",
        "pc2",
        "pc3",
        "pc4",
    ]
    assert df.collect() == []

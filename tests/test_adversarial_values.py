"""Adversarial-VALUE robustness (round 13, VERDICT r12 task 5).

Round 12 extended the degenerate gate from "collect() succeeds" to
value-checks vs the DuckDB oracles, but every sweep so far corrupts
STRUCTURE (NULL payloads, NULL/orphan keys, zero rows).  This suite
corrupts VALUES — the shapes a 100 TB ingest actually produces when
upstream encoders misbehave:

1. **Non-finite doubles** — NaN / +Inf / -Inf in every relational
   measure (``l_quantity``/``l_extendedprice``/``l_discount``/
   ``l_tax``/``o_totalprice``) and in ``events.value``.  Both engines
   use the same NaN total order (NaN is the largest double and equal
   to itself in GROUP BY), so filters/rollups must agree; what the
   sweep really hunts is ANSI-mode cast errors (CAST(NaN AS DECIMAL)
   raises in Spark 4) and Python/numpy paths that apply IEEE NaN
   semantics where the SQL legs apply total-order semantics.
2. **Non-finite embedding components** — a single NaN/Inf coordinate
   inside otherwise-valid vectors (the corrupt-encoder shape;
   distinct from r12's NULL-vector sweep, which the scan guards
   already exclude).  Dot products through such a component go
   NaN/Inf on both engines; ranking and threshold legs must agree.
3. **Extreme event timestamps** — pre-1970 (negative epoch) and
   beyond year 2286.  The REFERENCE breaks there: its 13-digit
   lexicographic store key (SURVEY §2.1 note 5) mis-sorts negative
   epochs and rolls over at 10^13 ms (2286-11-20).  This engine
   orders numerically, so the sweep proves reorder/window/sessionize
   semantics survive both regimes.  All registered event queries
   export epoch-µs ints (never raw timestamps), so the standard
   toPandas compare path stays in-bounds even at year 2553.
4. **Adversarial unicode** — astral-plane (surrogate-pair) symbols,
   ZWJ emoji sequences, zero-width spaces/joiners, combining marks,
   and RTL runs through the tokenizer/shingle/quality families.
   Spark (Java UTF-16 with code-point semantics) and DuckDB
   (utf8proc) agree on length/lower/regex for these probes — the
   sweep pins that agreement through all 80+ document queries.

Every sweep VALUE-checks the oracled subset via the shared
``_oracle_compare`` (columns sorted, rows sorted, NaN == NULL): a
query that silently emits wrong non-empty output on corrupt values
fails, not just one that crashes.  All fixture mutations are
deterministic (row-position modulus — parquet row order is stable),
so failures reproduce bit-for-bit.
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# Exhaustive sweep tier: deselected from the default run (tests/conftest.py)
pytestmark = pytest.mark.slow

from kafka_streams_reorder_timestamp_spark.operators.registry import REGISTRY

from test_degenerate_inputs import (  # noqa: F401  (shared sweep plumbing)
    SRC,
    TABLES,
    _DOC_MODULES,
    _oracle_compare,
)

_NAN = float("nan")
_PINF = float("inf")
_NINF = float("-inf")

# Non-finite injection: row position mod 11 → 0: NaN, 1: +Inf, 2: -Inf
# (~27% of rows corrupted, the rest untouched so joins/groups still
# produce real output alongside the poisoned rows).
_NONFINITE_COLS = {
    "lineitem": {"l_quantity", "l_extendedprice", "l_discount", "l_tax"},
    "orders": {"o_totalprice"},
    "events": {"value"},
}


def _poison_doubles(tbl: pa.Table, cols: set[str]) -> pa.Table:
    schema = tbl.schema
    out = {}
    for f in schema:
        if f.name in cols:
            vals = tbl[f.name].to_pylist()
            poisoned = [
                _NAN if i % 11 == 0
                else _PINF if i % 11 == 1
                else _NINF if i % 11 == 2
                else v
                for i, v in enumerate(vals)
            ]
            out[f.name] = pa.array(poisoned, type=f.type)
        else:
            out[f.name] = tbl[f.name]
    return pa.table(out, schema=schema)


@pytest.fixture(scope="module")
def naninf_measures_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but ~27% of every relational measure and
    events.value is NaN/+Inf/-Inf (keys, dates, flags intact)."""
    out = tmp_path_factory.mktemp("sf_naninf")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        cols = _NONFINITE_COLS.get(t)
        if cols:
            tbl = _poison_doubles(tbl, cols)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


# The sweep scope: every module reading the poisoned measures.
_MEASURE_MODULES = {
    "relational",
    "subqueries",
    "breadth",
    "asof",
    "timeseries",
    "events_queries",
    "graph",
}


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n, spec in REGISTRY.items()
        if spec.builder.__module__.split(".")[-1] in _MEASURE_MODULES
    ),
)
def test_queries_survive_nonfinite_measures(
    spark, naninf_measures_dir, name
):
    """NaN/Inf measures must flow through filters, rollups, windows
    and percentiles under the SAME total order on both engines (NaN
    largest, NaN==NaN in grouping) — never an ANSI cast error or an
    IEEE-vs-total-order filter divergence."""
    try:
        sdf = REGISTRY[name].builder(spark, naninf_measures_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(naninf_measures_dir, name, sdf)


@pytest.fixture(scope="module")
def naninf_emb_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but vec_id%13∈{0,1,2} embeddings carry one
    NaN / +Inf / -Inf component (vector present, one coordinate
    corrupt — the broken-encoder shape)."""
    out = tmp_path_factory.mktemp("sf_naninf_emb")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "embeddings":
            schema = tbl.schema
            vec_ids = tbl["vec_id"].to_pylist()
            embs = tbl["embedding"].to_pylist()
            poisoned = []
            for v, e in zip(vec_ids, embs):
                if e is not None and v % 13 == 0:
                    e = [_NAN] + e[1:]
                elif e is not None and v % 13 == 1:
                    e = [e[0], _PINF] + e[2:]
                elif e is not None and v % 13 == 2:
                    e = [e[0], e[1], _NINF] + e[3:]
                poisoned.append(e)
            cols = {
                f.name: (
                    pa.array(poisoned, type=f.type)
                    if f.name == "embedding"
                    else tbl[f.name]
                )
                for f in schema
            }
            tbl = pa.table(cols, schema=schema)
        pq.write_table(tbl, str(out / f"{t}.parquet"))
    return str(out)


_EMB_QUERIES = sorted(
    {
        n
        for n, spec in REGISTRY.items()
        if spec.builder.__module__.split(".")[-1] == "similarity"
    }
    | {"dedup_embedding_pairs", "decontaminate_semantic"}
)


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_embedding_queries_survive_nonfinite_components(
    spark, naninf_emb_dir, name
):
    """A NaN/Inf coordinate poisons every dot product through it on
    BOTH engines identically (NaN similarity, ±Inf norms); ranking
    legs and threshold filters must agree cross-engine, and Arrow/
    numpy paths must not let IEEE comparisons (NaN > t → False)
    diverge from the SQL legs' total order (NaN > t → True)."""
    try:
        sdf = REGISTRY[name].builder(spark, naninf_emb_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(naninf_emb_dir, name, sdf)


# Extreme timestamps: row position mod 17 → 0: −150 years (negative
# epoch, pre-1970), 1: +240 years (~2258, inside the reference's
# 13-digit window but far future), 2: +280 years (~2298 — PAST the
# reference's 2286-11-20 rollover).  ~18% of events shifted, the rest
# untouched, so windows mix corrupt and clean rows.
_US_PER_YEAR = 31_557_600_000_000  # 365.25 d


@pytest.fixture(scope="module")
def extreme_ts_dir(tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("sf_extremets")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "events":
            schema = tbl.schema
            ts = tbl["ts"]
            us = ts.cast(pa.int64()).to_pylist()
            shifted = []
            for i, v in enumerate(us):
                if v is None:
                    shifted.append(None)
                elif i % 17 == 0:
                    shifted.append(v - 150 * _US_PER_YEAR)
                elif i % 17 == 1:
                    shifted.append(v + 240 * _US_PER_YEAR)
                elif i % 17 == 2:
                    shifted.append(v + 280 * _US_PER_YEAR)
                else:
                    shifted.append(v)
            cols = {
                f.name: (
                    pa.array(shifted, type=pa.int64()).cast(f.type)
                    if f.name == "ts"
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
def test_event_queries_survive_extreme_timestamps(
    spark, extreme_ts_dir, name
):
    """Negative-epoch and beyond-2286 event times must sort, window,
    sessionize and reorder NUMERICALLY on both engines — exactly the
    regimes where the reference's 13-digit lexicographic store key
    breaks (SURVEY §2.1 note 5: negative epochs mis-sort, 10^13 ms
    rolls over on 2286-11-20).  Every registered event query exports
    epoch-µs ints, so the value compare itself stays exact."""
    try:
        sdf = REGISTRY[name].builder(spark, extreme_ts_dir).toPandas()
    finally:
        spark.catalog.clearCache()
    _oracle_compare(extreme_ts_dir, name, sdf)


def test_reorder_preserves_numeric_order_across_2286(spark, extreme_ts_dir):
    """The reference-parity claim, asserted directly: reorder_events'
    output must be non-decreasing in ts_us even when the input mixes
    pre-1970, contemporary, and post-rollover timestamps — the
    engine's ORDER BY is numeric, so the 13-digit boundary is
    invisible to it."""
    rows = (
        REGISTRY["reorder_events"].builder(spark, extreme_ts_dir).collect()
    )
    spark.catalog.clearCache()
    ts = [r.ts_us for r in rows]
    assert ts == sorted(ts)
    assert ts[0] < 0, "fixture must exercise a negative epoch"
    assert ts[-1] > 10_000_000_000_000_000, (
        "fixture must exercise a post-2286 (>10^16 µs) timestamp"
    )


# Adversarial unicode probes, keyed by doc_id % 7:
#   0: ZWJ family-emoji prefix + astral math-fraktur suffix
#   1: first space replaced by ZERO WIDTH SPACE (word fusion)
#   2: combining acute after char 1 + RTL mark + Arabic suffix
#   3: zero-width joiner spliced into the first word
#   4: astral CJK-extension + variation selector prefix
#   5/6: untouched controls.
_ZWJ = "‍"  # ZERO WIDTH JOINER
_ZWSP = "​"  # ZERO WIDTH SPACE
_RLM = "‏"  # RIGHT-TO-LEFT MARK
_COMBINING_ACUTE = "́"
_VS16 = "️"  # VARIATION SELECTOR-16
_ZWJ_FAMILY = _ZWJ.join(
    ["\U0001f469", "\U0001f469", "\U0001f467", "\U0001f466"]
)
_FRAKTUR = "\U0001d518\U0001d52b\U0001d526\U0001d520"
_ARABIC = "مرحبا"


def _mangle_text(doc_id: int, text: str) -> str:
    k = doc_id % 7
    if k == 0:
        return f"{_ZWJ_FAMILY} {text} {_FRAKTUR}"
    if k == 1:
        return text.replace(" ", _ZWSP, 1)
    if k == 2:
        head = text[:1] + _COMBINING_ACUTE + text[1:]
        return f"{head} {_RLM}{_ARABIC}"
    if k == 3:
        return text[:2] + _ZWJ + text[2:]
    if k == 4:
        return f"\U00020000{_VS16} {text}"
    return text


@pytest.fixture(scope="module")
def adversarial_unicode_dir(tmp_path_factory) -> str:
    """sf0.001 tables, but ~71% of documents.text carries astral /
    zero-width / combining / RTL probes (n_chars kept consistent:
    python code-point length, same convention as the generator)."""
    out = tmp_path_factory.mktemp("sf_unicode")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t == "documents":
            schema = tbl.schema
            doc_ids = tbl["doc_id"].to_pylist()
            texts = tbl["text"].to_pylist()
            new_texts = [
                None if x is None else _mangle_text(d, x)
                for d, x in zip(doc_ids, texts)
            ]
            cols = {}
            for f in schema:
                if f.name == "text":
                    cols[f.name] = pa.array(new_texts, type=f.type)
                elif f.name == "n_chars":
                    cols[f.name] = pa.array(
                        [None if x is None else len(x) for x in new_texts],
                        type=f.type,
                    )
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
def test_document_queries_survive_adversarial_unicode(
    spark, adversarial_unicode_dir, name
):
    """Surrogate-pair astral symbols, ZWJ sequences, zero-width
    spaces, combining marks and RTL runs must tokenize, shingle,
    hash, and score IDENTICALLY on Spark (UTF-16 code-point
    semantics) and DuckDB (utf8proc) — length(), lower(), and the
    ASCII-class regex tokenizers were probed to agree; this sweep
    pins that agreement through every document query."""
    try:
        sdf = (
            REGISTRY[name].builder(spark, adversarial_unicode_dir).toPandas()
        )
    finally:
        spark.catalog.clearCache()
    _oracle_compare(adversarial_unicode_dir, name, sdf)

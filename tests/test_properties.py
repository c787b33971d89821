"""Property-based tests (hypothesis): the reorder operator's semantics
and the Avro codec hold for ALL inputs, not just the golden fixture.

Spark jobs per example are expensive, so the Spark property uses few,
large examples; the pure-Python codec gets the full default budget.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Exhaustive sweep tier: deselected from the default run (tests/conftest.py)
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from kafka_streams_reorder_timestamp_spark.operators.reorder import reorder_batch
from kafka_streams_reorder_timestamp_spark.sources.avro_codec import (
    decode_order,
    encode_order,
)

# --------------------------------------------------------------------------
# Avro codec: encode/decode is the identity for every valid record.

orders = st.fixed_dictionaries(
    {
        "order_id": st.text(min_size=0, max_size=40),
        "electronic_id": st.text(min_size=0, max_size=40),
        "user_id": st.text(min_size=0, max_size=40),
        "price": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "time": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    }
)


@given(orders)
def test_avro_roundtrip_property(rec):
    assert decode_order(encode_order(rec)) == rec


@given(orders, st.integers(min_value=0, max_value=2**31 - 1))
def test_avro_confluent_framing_property(rec, schema_id):
    buf = encode_order(rec, confluent_framing=True, schema_id=schema_id)
    assert buf[0] == 0
    assert decode_order(buf, confluent_framing=True) == rec


# --------------------------------------------------------------------------
# Batch reorder: for any multiset of (arrival, ts) rows the output is
# (a) chronologically sorted, (b) one row per distinct ts, and (c) the
# surviving row per ts is the first arrival (min arrival id).

rows_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**12)),  # ts values
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows_strategy)
def test_reorder_batch_property(spark, ts_values):
    rows = [(i, t[0]) for i, t in enumerate(ts_values)]
    df = spark.createDataFrame(rows, ["arrival", "t"])
    got = reorder_batch(df, ts_col="t", arrival_col="arrival").collect()

    ts_out = [r.t for r in got]
    assert ts_out == sorted(ts_out), "output must be chronological"
    assert len(ts_out) == len(set(ts_out)), "one row per distinct ts"
    first_arrival = {}
    for arrival, t in rows:
        if t not in first_arrival or arrival < first_arrival[t]:
            first_arrival[t] = arrival
    assert {(r.arrival, r.t) for r in got} == {
        (a, t) for t, a in first_arrival.items()
    }, "survivor must be the first arrival per ts"


# --------------------------------------------------------------------------
# As-of join: for every generated pair of keyed, timestamped frames the
# operator must agree with pandas.merge_asof (the de-facto reference
# implementation of backward-inclusive as-of semantics).

asof_inputs = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=25,
    ),
    st.lists(  # right: (key, ts) — deduped per (key, ts) below
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=25,
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(asof_inputs)
def test_asof_join_matches_pandas_merge_asof(spark, data):
    import pandas as pd

    from kafka_streams_reorder_timestamp_spark.operators.asof import asof_join

    left_rows, right_rows = data
    right_rows = sorted({(k, t) for k, t in right_rows})  # dedup ties
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        "key long, lts long, lrow long",
    ).withColumn("lts", F.timestamp_seconds(F.col("lts")))
    right = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(right_rows)],
        "key long, rts long, rrow long",
    ).withColumn("rts", F.timestamp_seconds(F.col("rts")))

    got = (
        asof_join(left, right, on=["key"], left_ts="lts", right_ts="rts",
                  how="left")
        .toPandas()
        .sort_values("lrow")
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="s"), i) for i, (k, t) in enumerate(left_rows)],
        columns=["key", "lts", "lrow"],
    ).sort_values(["lts", "lrow"])
    rp = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="s"), 100 + i)
         for i, (k, t) in enumerate(right_rows)],
        columns=["key", "rts", "rrow"],
    ).sort_values(["rts", "rrow"])
    exp = (
        pd.merge_asof(lp, rp, left_on="lts", right_on="rts", by="key",
                      direction="backward", allow_exact_matches=True)
        .sort_values("lrow")
        .reset_index(drop=True)
    )
    assert list(got["lrow"]) == list(exp["lrow"])
    assert [None if pd.isna(v) else int(v) for v in got["rrow"]] == [
        None if pd.isna(v) else int(v) for v in exp["rrow"]
    ]


# --------------------------------------------------------------------------
# Salted blocked Jaccard: for ANY corpus and any (block_cap, max_salt),
# the triangle-grid salted self-join returns exactly the pairs a
# brute-force per-block Jaccard finds — salting changes the partition
# layout, never the result.

_corpus_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # block id (forces collisions)
        st.lists(
            st.integers(min_value=0, max_value=12),  # token universe
            min_size=1,
            max_size=8,
            unique=True,
        ),
    ),
    min_size=2,
    max_size=24,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_corpus_strategy, st.sampled_from([1, 2, 100]))
def test_salted_jaccard_equals_bruteforce_property(spark, corpus, cap):
    from kafka_streams_reorder_timestamp_spark.operators.dedup import (
        blocked_jaccard_pairs,
    )

    rows = [
        (i, f"blk{blk}", [f"w{t}" for t in toks])
        for i, (blk, toks) in enumerate(corpus)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "blk", "t"])
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in blocked_jaccard_pairs(
            df, ["blk"], threshold=0.5, block_cap=cap, max_salt=4
        ).collect()
    }

    expect = {}
    for i, (blk_a, ta) in enumerate(corpus):
        for j in range(i + 1, len(corpus)):
            blk_b, tb = corpus[j]
            if blk_a != blk_b:
                continue
            sa, sb = set(ta), set(tb)
            jac = len(sa & sb) / len(sa | sb)
            if jac >= 0.5:
                expect[(i, j)] = round(jac, 4)
    assert got == expect


# --------------------------------------------------------------------------
# Streaming Misra-Gries fold: for ANY token stream and ANY micro-batch
# split, folding batches through carried state equals one fold of the
# concatenation (the exact claim the streaming operator rests on), and
# the classic MG guarantees hold over the whole stream.

mg_streams = st.lists(
    st.integers(min_value=0, max_value=30).map(lambda i: f"t{i}"),
    min_size=0,
    max_size=400,
)


@given(
    mg_streams,
    st.integers(min_value=1, max_value=12),  # capacity
    st.data(),
)
def test_streaming_mg_fold_properties(stream, capacity, data):
    from collections import Counter

    from kafka_streams_reorder_timestamp_spark.streaming.stateful import (
        _mg_fold,
    )

    # one-shot fold over the concatenated stream
    whole, n_whole = _mg_fold({}, 0, stream, capacity)

    # arbitrary micro-batch split of the same stream
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(stream)), max_size=8
            )
        )
    )
    counters, n_seen = {}, 0
    for lo, hi in zip([0] + cuts, cuts + [len(stream)]):
        counters, n_seen = _mg_fold(counters, n_seen, stream[lo:hi], capacity)

    # (a) micro-batching is invisible: identical state either way
    assert counters == whole and n_seen == n_whole == len(stream)

    # (b) candidate set never exceeds capacity
    assert len(whole) <= capacity

    truth = Counter(stream)
    err = len(stream) / (capacity + 1)  # max decrement rounds
    for tok, cnt in truth.items():
        c = whole.get(tok, 0)
        # (c) reported count is a lower bound within N/(cap+1) of truth
        assert c <= cnt <= c + err
        # (d) every token with true count > N/(cap+1) survives
        if cnt > err:
            assert tok in whole


# --------------------------------------------------------------------------
# DDSketch fold: split-invariance and the relative-error guarantee for
# ANY positive value stream; non-positives are counted, never binned.

dd_values = st.lists(
    st.floats(
        min_value=1e-6,
        max_value=1e12,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=1,
    max_size=300,
)


@given(dd_values, st.sampled_from([0.01, 0.05, 0.1]), st.data())
def test_dd_fold_properties(vals, alpha, data):
    from kafka_streams_reorder_timestamp_spark.streaming.stateful import (
        _dd_fold,
        _dd_quantile,
    )

    gamma = (1.0 + alpha) / (1.0 - alpha)
    whole, n_pos, n_np = _dd_fold({}, vals, gamma)
    assert n_pos == len(vals) and n_np == 0

    # arbitrary micro-batch split folds to identical counters
    cuts = sorted(
        data.draw(
            st.lists(st.integers(min_value=0, max_value=len(vals)), max_size=6)
        )
    )
    counts, tot = {}, 0
    for lo, hi in zip([0] + cuts, cuts + [len(vals)]):
        counts, dp, _ = _dd_fold(counts, vals[lo:hi], gamma)
        tot += dp
    assert counts == whole and tot == n_pos

    # relative-error guarantee at every decile (no collapse here:
    # bins <= len(vals) <= 300 < 1024)
    srt = sorted(vals)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = _dd_quantile(whole, n_pos, q, gamma)
        true = srt[max(0, math.ceil(q * n_pos) - 1)]
        assert abs(est - true) <= alpha * true + 1e-15, (q, est, true)


def test_dd_fold_collapse_preserves_upper_quantiles():
    """Force the 1024-bin cap: a range spanning more bins than the cap
    must still estimate upper quantiles within alpha; only the low
    tail coarsens (and non-positives are tallied separately)."""
    from kafka_streams_reorder_timestamp_spark.streaming.stateful import (
        _dd_fold,
        _dd_quantile,
    )

    alpha = 0.05
    gamma = (1 + alpha) / (1 - alpha)
    # geometric sweep over ~28 decades -> ~6.6k distinct bins
    vals = [10.0 ** (k / 100.0) for k in range(-1400, 1400)]
    counts, n_pos, n_np = _dd_fold({}, vals, gamma)
    assert len(counts) <= 1024
    assert n_pos == len(vals) and n_np == 0
    srt = sorted(vals)
    for q in (0.7, 0.9, 0.99):
        est = _dd_quantile(counts, n_pos, q, gamma)
        true = srt[math.ceil(q * n_pos) - 1]
        assert abs(est - true) <= alpha * true, (q, est, true)

    counts2, n_pos2, n_np2 = _dd_fold(counts, [0.0, -3.5, None], gamma)
    assert n_pos2 == 0 and n_np2 == 2 and counts2 == counts


# ---------------------------------------------------------------------------
# Cross-document duplicate n-gram spans vs brute force


def _brute_ngram_spans(docs: dict[int, str], n: int):
    """Pure-Python reference for duplicate_ngram_spans: per doc, dup
    windows merged into runs, same semantics as the operator/oracle."""
    toks = {i: [t for t in txt.strip().lower().split() if t] for i, txt in docs.items()}
    grams = {
        i: [" ".join(t[j : j + n]) for j in range(len(t) - n + 1)]
        for i, t in toks.items()
        if len(t) >= n
    }
    owners: dict[str, set[int]] = {}
    for i, gs in grams.items():
        for g in gs:
            owners.setdefault(g, set()).add(i)
    out = {}
    for i, gs in grams.items():
        offs = [j for j, g in enumerate(gs) if len(owners[g]) > 1]
        if not offs:
            continue
        runs, start = [], offs[0]
        for prev, cur in zip(offs, offs[1:]):
            if cur != prev + 1:
                runs.append((start, prev))
                start = cur
        runs.append((start, offs[-1]))
        out[i] = {
            "n_windows": len(gs),
            "n_dup_windows": len(offs),
            "n_dup_runs": len(runs),
            "max_run_tokens": max(b - a + 1 for a, b in runs) + n - 1,
        }
    return out


doc_texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=0,
        max_size=14,
    ).map(" ".join),
    min_size=2,
    max_size=6,
)


@given(doc_texts)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_duplicate_ngram_spans_matches_brute_force(spark, texts):
    """Random tiny-vocabulary corpora (dense accidental overlaps, runs,
    within-doc repeats) must agree with the pure-Python reference on
    every per-doc statistic."""
    from kafka_streams_reorder_timestamp_spark.operators.dedup import (
        duplicate_ngram_spans,
    )

    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: {
            "n_windows": r["n_windows"],
            "n_dup_windows": r["n_dup_windows"],
            "n_dup_runs": r["n_dup_runs"],
            "max_run_tokens": r["max_run_tokens"],
        }
        for r in duplicate_ngram_spans(df, n=3).collect()
    }
    assert got == _brute_ngram_spans(docs, 3)


# ---------------------------------------------------------------------------
# Containment prefix-filter losslessness vs brute force


def _brute_containment(docs: dict[int, str], threshold: float, n: int = 3):
    """All ordered pairs (a, b), a != b, with |Sa n Sb| / |Sa| >=
    threshold over n-token string shingle sets (docs shorter than n
    tokens use their full token string as one shingle, matching
    word_shingles)."""
    sh = {}
    for i, txt in docs.items():
        t = [x for x in txt.strip().lower().split() if x]
        if not t:
            continue
        if len(t) >= n:
            sh[i] = {" ".join(t[j : j + n]) for j in range(len(t) - n + 1)}
        else:
            sh[i] = {" ".join(t)}
    out = set()
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a != b and len(sa & sb) / len(sa) >= threshold:
                out.add((a, b))
    return out


containment_corpus = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]),
        min_size=1,
        max_size=12,
    ).map(" ".join),
    min_size=2,
    max_size=5,
)


@given(containment_corpus)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_containment_prefix_filter_lossless(spark, texts):
    """The probe-side containment prefix + positional bound must be
    LOSSLESS: on adversarial tiny-vocabulary corpora (dense shingle
    overlaps, subset relations both directions), the pair set must
    equal brute force exactly — no pair pruned, none invented."""
    from kafka_streams_reorder_timestamp_spark.operators.dedup import (
        shingle_containment_pairs,
    )

    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_contained"], r["doc_container"])
        for r in shingle_containment_pairs(
            df, "text", "doc_id", threshold=0.9
        ).collect()
    }
    assert got == _brute_containment(docs, 0.9)


def test_short_doc_shingle_order_sensitive(spark):
    """Round-12 regression pin: two sub-shingle-length documents that
    are PERMUTATIONS of each other ('aa bb' vs 'bb aa') must NOT be
    reported as containments/duplicates. The pre-r12 short-doc fallback
    hashed tokens commutatively ((c * _C2).sum()), so permutation pairs
    collided; the Hypothesis corpus above can draw this, but this pin
    makes the case deterministic so it can't silently un-trigger."""
    from kafka_streams_reorder_timestamp_spark.functions.texthash import (
        _shingle_hash_set,
    )
    from kafka_streams_reorder_timestamp_spark.operators.dedup import (
        shingle_containment_pairs,
        shingle_jaccard_pairs,
    )

    a = _shingle_hash_set("aa bb", 3)
    b = _shingle_hash_set("bb aa", 3)
    assert a.tolist() != b.tolist()  # order-sensitive hash
    docs = {0: "aa bb", 1: "bb aa", 2: "aa bb", 3: "cc"}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got_c = {
        (r["doc_contained"], r["doc_container"])
        for r in shingle_containment_pairs(
            df, "text", "doc_id", threshold=0.9
        ).collect()
    }
    assert got_c == _brute_containment(docs, 0.9) == {(0, 2), (2, 0)}
    got_j = {
        (r["doc_a"], r["doc_b"])
        for r in shingle_jaccard_pairs(
            df, "text", "doc_id", threshold=0.7
        ).collect()
    }
    assert got_j == {(0, 2)}


# --------------------------------------------------------------------------
# Cross-engine hash bridge: eight oracles (SimHash, MinHash LSH x3,
# and transitively every signature built on _md5_32/_md5_64) depend on
# the Python md5-prefix integers equalling DuckDB's hex-slice cast.
# Property-pin the contract itself so an innocent refactor of either
# side can't silently fork the engines.


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=30, deadline=None)
def test_md5_prefix_bridge_matches_duckdb(tokens_sample):
    import duckdb

    from kafka_streams_reorder_timestamp_spark.functions.texthash import (
        _md5_32,
    )
    from kafka_streams_reorder_timestamp_spark.operators.simhash import (
        _md5_64,
    )

    con = duckdb.connect()
    for t in tokens_sample:
        row = con.execute(
            "SELECT ('0x' || substring(md5(?), 1, 8))::BIGINT,"
            "       ('0x' || substring(md5(?), 1, 16))::UBIGINT",
            [t, t],
        ).fetchone()
        assert _md5_32(t) == row[0], t
        assert _md5_64(t) == row[1], t


# --------------------------------------------------------------------------
# BPE oracle machinery: the double-space replace() encoding must equal
# the sequential left-to-right merge for EVERY vocabulary, not just the
# corpus the registered queries see. Tiny alphabets force the
# adversarial shapes: back-to-back overlaps ([a,a,a,a]), tie-broken
# argmaxes, merged symbols that are substrings of other symbols.


@given(
    st.dictionaries(
        st.text(alphabet="ab¢d", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=25, deadline=None)
def test_bpe_oracle_unroll_matches_reference(word_counts):
    import duckdb

    from kafka_streams_reorder_timestamp_spark.operators.text import (
        _BPE_V0_SS,
        _bpe_oracle_rounds,
        bpe_merges_local,
    )

    ref = bpe_merges_local(word_counts, n_merges=8)
    placeholders = ", ".join("(?, ?)" for _ in word_counts)
    params = [x for w, c in word_counts.items() for x in (w, c)]
    sql = f"""
    WITH v0 AS MATERIALIZED (
      SELECT word, wcount::BIGINT AS wcount, {_BPE_V0_SS} AS ss
      FROM (VALUES {placeholders}) v(word, wcount)
    ), {_bpe_oracle_rounds(8)}
    SELECT merge_rank, a, b, c
    FROM ({' UNION ALL '.join(f'SELECT * FROM m{r}' for r in range(1, 9))})
    ORDER BY merge_rank
    """
    got = [tuple(r) for r in duckdb.execute(sql, params).fetchall()]
    assert got == [tuple(m) for m in ref], word_counts


# --------------------------------------------------------------------------
# The recall audit's sampling predicate claims DuckDB replayability in
# its docstring (('0x' || substring(md5(id::VARCHAR), 1, 8))::BIGINT %
# 10000) — pin the bucket function itself so a future oracle for the
# sampled audit can rely on it.


@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
@settings(max_examples=20, deadline=None)
def test_audit_sample_bucket_matches_duckdb(ids):
    import duckdb
    import hashlib

    for i in ids:
        py = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10000
        duck = duckdb.execute(
            "SELECT ('0x' || substring(md5(?::VARCHAR), 1, 8))"
            "::BIGINT % 10000",
            [i],
        ).fetchone()[0]
        assert py == duck, i

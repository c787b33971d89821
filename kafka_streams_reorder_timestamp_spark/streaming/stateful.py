"""Custom stateful streaming operators beyond the reorder buffer —
the `applyInPandasWithState` surface generalized to numeric state.

Reference tie-in: the reference's only stateful op is the reorder
store (Application.java:58,132-136); this module is extension surface
showing the same Spark API carries arbitrary per-key state machines.

Design for scale: state per key is O(1) (a float and two longs — no
buffering), so a billion keys cost ~tens of GB of RocksDB state across
the cluster; each micro-batch touches only the keys present in it.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_EMA_STATE = T.StructType(
    [
        T.StructField("ema", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def streaming_ema(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key exponential moving average maintained across
    micro-batches: after each batch, emit one snapshot row per key
    with the updated EMA, total count, and last event time.

    The EMA recurrence ``ema <- alpha*x + (1-alpha)*ema`` is a fold,
    and folds COMPOSE: applying it to batch 2 starting from batch 1's
    result equals applying it to the concatenation — so WHEN micro-batch
    boundaries respect event-time order (each batch's rows are no
    earlier than the previous batch's), the streamed answer equals the
    batch recurrence over the full ordered input (pinned by test).
    Rows are sorted by event time WITHIN each batch, but a late row
    that lands in a LATER micro-batch is folded at arrival position —
    as the most recent observation — not retroactively inserted at its
    event-time slot; ``last_ts_us`` in the emitted snapshot lets a
    consumer detect that regression (snapshot's last_ts_us decreases or
    repeats). Retroactive insertion would need O(history) state, which
    this operator deliberately avoids. Within a batch the fold is
    evaluated in closed form with one numpy dot product (weights
    (1-alpha)^(m-1-i)), not a Python loop per row.

    State per key is O(1): (ema, n, last_ts_us). No timers — the
    snapshot cadence is the micro-batch cadence; keys absent from a
    batch emit nothing and their state persists untouched.
    """
    keys = list(key_cols)
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in keys]
        + [
            T.StructField("ema", T.DoubleType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("last_ts_us", T.LongType()),
        ]
    )

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ema, n, last_us = state.get
        else:
            ema, n, last_us = None, 0, -1

        parts = [p for p in pdfs if not p.empty]
        if not parts:
            return
        batch = pd.concat(parts) if len(parts) > 1 else parts[0]
        micros = batch[ts_col].astype("datetime64[us]").astype("int64")
        order = np.lexsort((np.arange(len(batch)), micros.values))
        xs = batch[value_col].to_numpy(dtype="float64")[order]
        m = len(xs)
        decay = (1.0 - alpha) ** np.arange(m - 1, -1, -1)
        contrib = float(np.dot(alpha * decay, xs))
        if ema is None:
            # Seed with the first observation (the standard EMA init),
            # then fold the remaining m-1 values in closed form.
            ema = float(xs[0])
            if m > 1:
                rest = xs[1:]
                d = (1.0 - alpha) ** np.arange(m - 2, -1, -1)
                ema = ema * (1.0 - alpha) ** (m - 1) + float(
                    np.dot(alpha * d, rest)
                )
        else:
            ema = ema * (1.0 - alpha) ** m + contrib
        n += m
        last_us = int(micros.values[order][-1])
        state.update((ema, n, last_us))
        yield pd.DataFrame(
            {
                **{k: [key[i]] for i, k in enumerate(keys)},
                "ema": [ema],
                "n_events": [n],
                "last_ts_us": [last_us],
            }
        )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=_EMA_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_HH_STATE = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _mg_fold(
    counters: dict, n_seen: int, tokens, capacity: int
) -> tuple[dict, int]:
    """One Misra-Gries pass of `tokens` into an existing counter set.

    Pure so the property suite can drive it directly: because MG is a
    sequential one-pass summary, folding a stream in ANY micro-batch
    split yields byte-identical state to one fold of the
    concatenation (hypothesis-pinned), which is exactly why the
    streaming operator inherits the batch error bound."""
    for tok in tokens:
        n_seen += 1
        if tok in counters:
            counters[tok] += 1
        elif len(counters) < capacity:
            counters[tok] = 1
        else:
            counters = {t: c - 1 for t, c in counters.items() if c > 1}
    return counters, n_seen


def streaming_heavy_hitters(
    df: DataFrame,
    tokens_col: str,
    key_cols: Sequence[str] = (),
    capacity: int = 400,
) -> DataFrame:
    """Misra-Gries frequent tokens maintained ACROSS micro-batches —
    the canonical one-pass streaming frequent-items algorithm as a
    keyed stateful operator (the streaming twin of the batch two-pass
    `operators.text.heavy_hitter_tokens`).

    State per key group is O(capacity) counters REGARDLESS of stream
    length or vocabulary: each batch's tokens fold into the counter
    set with the classic MG step (increment known, insert while room,
    else decrement-all). Because MG is a sequential one-pass summary,
    folding batch k into batch k-1's state is EXACTLY the algorithm
    over the concatenated stream — micro-batching changes nothing —
    so after N tokens the counters provably contain every token with
    true frequency > N/capacity, and each surviving counter value c
    is a lower bound with true_count - N/capacity <= c <= true_count
    (the standard MG error bound; pinned by the stream-vs-truth test).

    Emits one snapshot per key per micro-batch: every current
    candidate token with its counter value, the tokens-seen total, and
    a per-key batch sequence number (consumers take the max-seq
    snapshot as "current"). Tokenization happens BEFORE this operator,
    JVM-side (pass an array<string> column) — the same
    engine-tokenizer-parity rule as the batch operator.

    At scale: key groups spread over executors exactly like the
    reorder buffer; a global (unkeyed) summary uses one group — the
    deliberate serial point — and stays KB-sized in RocksDB. For a
    global view over high-rate streams, key by a hash-salt and merge
    the per-salt summaries downstream (MG summaries are mergeable
    with counter addition + trim, the same recall guarantee at 2x
    capacity)."""
    keys = list(key_cols)
    kdf = df
    if not keys:
        kdf = df.withColumn("_g", F.lit(0))
        keys = ["_g"]
    out_schema = T.StructType(
        [f for f in kdf.schema.fields if f.name in keys]
        + [
            T.StructField("token", T.StringType()),
            T.StructField("count_lb", T.LongType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("seq", T.LongType()),
        ]
    )

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, counts, n_seen, seq = state.get
            counters = dict(zip(toks, counts))
        else:
            counters, n_seen, seq = {}, 0, 0

        for pdf in pdfs:
            for arr in pdf[tokens_col]:
                if arr is None:
                    continue
                counters, n_seen = _mg_fold(counters, n_seen, arr, capacity)
        seq += 1
        state.update(
            (list(counters.keys()), list(counters.values()), n_seen, seq)
        )
        if counters:
            m = len(counters)
            yield pd.DataFrame(
                {
                    **{k: [key[i]] * m for i, k in enumerate(keys)},
                    "token": list(counters.keys()),
                    "count_lb": list(counters.values()),
                    "n_seen": [n_seen] * m,
                    "seq": [seq] * m,
                }
            )

    return kdf.groupBy(*keys).applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType=_HH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HLL_STATE = T.StructType(
    [
        T.StructField("registers", T.BinaryType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _hll_update(registers: "np.ndarray", values) -> None:
    """Fold values into a dense HLL register array in place.

    64-bit value hash = first 8 bytes of md5 (engine-portable and
    stable across runs/processes — Python's built-in hash() is
    per-process salted and numpy has no stable string hash; a
    production build would swap in vectorized xxhash64, which changes
    speed, not semantics)."""
    import hashlib

    p = int(np.log2(len(registers)))
    rest_bits = 64 - p
    for v in values:
        # pd.isna covers None (object dtype) AND NaN/NaT (numeric /
        # datetime dtypes — pandas surfaces SQL NULL as NaN there);
        # str(nan) would otherwise register a phantom 'nan' distinct
        # that n_rows' notna() count excludes.
        if v is None or pd.isna(v):
            continue
        h = int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[:8], "big"
        )
        j = h >> rest_bits
        w = h & ((1 << rest_bits) - 1)
        # rho = position of the leftmost 1-bit of w within rest_bits
        rho = rest_bits - w.bit_length() + 1
        if rho > registers[j]:
            registers[j] = rho


def _hll_estimate(registers: "np.ndarray") -> float:
    """Classic HyperLogLog estimator with linear-counting small-range
    correction (Flajolet et al. 2007)."""
    m = float(len(registers))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.power(2.0, -registers.astype("float64")).sum())
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def streaming_distinct_hll(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """Per-key approximate COUNT(DISTINCT value) maintained across
    micro-batches — streaming cardinality with FIXED-SIZE state.

    State per key group is one dense HLL register array of 2^p bytes
    (p=12 → 4 KB, ~1.6% standard error) no matter how many distinct
    values or rows the stream carries; exact streaming distinct would
    need the full value set in state. Register-wise max is the HLL
    merge, and folding a batch into the registers is exactly the
    one-pass algorithm over the concatenated stream, so the streamed
    estimate equals a batch HLL over all data seen (same property as
    the streaming Misra-Gries above; accuracy pinned vs exact distinct
    in the stream test). Emits one snapshot row per key per batch:
    (keys, estimate, n_rows, seq) — consumers take max seq.

    The batch twin is `events_weekly_users_hll` (JVM Datasketches
    HLL); this operator is the state-store form the 4 KB-per-key
    mergeable sketch was designed for.
    """
    keys = list(key_cols)
    kdf = df
    if not keys:
        kdf = df.withColumn("_g", F.lit(0))
        keys = ["_g"]
    m = 1 << p
    out_schema = T.StructType(
        [f for f in kdf.schema.fields if f.name in keys]
        + [
            T.StructField("approx_distinct", T.DoubleType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("seq", T.LongType()),
        ]
    )

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            raw, n_rows, seq = state.get
            registers = np.frombuffer(raw, dtype="uint8").copy()
        else:
            registers, n_rows, seq = np.zeros(m, dtype="uint8"), 0, 0

        for pdf in pdfs:
            vals = pdf[value_col]
            n_rows += int(vals.notna().sum())
            _hll_update(registers, vals)
        seq += 1
        state.update((bytearray(registers.tobytes()), n_rows, seq))
        yield pd.DataFrame(
            {
                **{k: [key[i]] for i, k in enumerate(keys)},
                "approx_distinct": [round(_hll_estimate(registers), 2)],
                "n_rows": [n_rows],
                "seq": [seq],
            }
        )

    return kdf.groupBy(*keys).applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType=_HLL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DD_STATE = T.StructType(
    [
        T.StructField("bin_idx", T.ArrayType(T.IntegerType())),
        T.StructField("bin_cnt", T.ArrayType(T.LongType())),
        T.StructField("n_values", T.LongType()),
        T.StructField("n_nonpos", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _dd_fold(
    counts: dict, values, gamma: float, max_bins: int = 1024
) -> tuple[dict, int, int]:
    """One pass of `values` into a DDSketch-style log-bin counter map
    (Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable quantile
    sketch with relative-error guarantees", VLDB 2019 — public
    algorithm). Positive v lands in bin ceil(log_gamma(v)); bin i
    covers (gamma^(i-1), gamma^i], so estimating with the bin midpoint
    2*gamma^i/(gamma+1) keeps relative error <= (gamma-1)/(gamma+1).
    Returns (counts, n_pos_added, n_nonpos_added).

    Pure and sequential-composable: folding micro-batches through
    carried counts equals one fold of the concatenation (counts just
    add — hypothesis-pinned), the same property the MG and HLL state
    ops rest on. State is bounded by `max_bins`: on overflow the
    LOWEST bins collapse into the smallest kept bin (the paper's
    collapsing variant), which degrades only the lowest quantiles —
    upper-quantile guarantees (the latency-style use case) survive."""
    log_g = math.log(gamma)
    n_pos = n_nonpos = 0
    for v in values:
        if v is None or pd.isna(v):
            continue
        v = float(v)
        if v <= 0.0:
            n_nonpos += 1
            continue
        i = math.ceil(math.log(v) / log_g)
        counts[i] = counts.get(i, 0) + 1
        n_pos += 1
    if len(counts) > max_bins:
        idx = sorted(counts)
        keep_from = idx[len(idx) - max_bins]
        spill = sum(c for i, c in counts.items() if i < keep_from)
        counts = {i: c for i, c in counts.items() if i >= keep_from}
        counts[keep_from] += spill
    return counts, n_pos, n_nonpos


def _dd_quantile(counts: dict, n: int, q: float, gamma: float) -> float:
    """q-quantile estimate from the bin counters: walk bins in index
    order to the ceil(q*n)-th positive value, return that bin's
    midpoint 2*gamma^i/(gamma+1)."""
    if n <= 0:
        return float("nan")
    rank = max(1, int(math.ceil(q * n)))
    seen = 0
    for i in sorted(counts):
        seen += counts[i]
        if seen >= rank:
            return 2.0 * (gamma**i) / (gamma + 1.0)
    return float("nan")


def streaming_quantiles_dd(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
    alpha: float = 0.05,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-key approximate quantiles maintained across micro-batches
    with a RELATIVE-error guarantee and bounded state — the quantile
    member of the streaming sketch trio (cardinality =
    streaming_distinct_hll, frequency = streaming_heavy_hitters).

    State per key is a map of log-scale bin counters (gamma =
    (1+alpha)/(1-alpha); at alpha=0.05 a value's bin is known to
    ~10% width) capped at 1024 bins — double-precision positives span
    at most ~14k bins at this gamma, and the cap collapses the lowest
    bins first, so p50+ estimates keep the guarantee while a
    pathological range only coarsens the low tail. Counters ADD, so
    folding a batch into carried state is exactly the one-pass sketch
    over the concatenated stream; every emitted estimate is within
    alpha relative error of the true quantile of ALL values seen
    (non-positive values are counted separately, not binned — the
    relative-error contract only exists for v > 0).

    Emits one snapshot per key per batch: (keys, p<q> columns,
    n_values, n_nonpos, seq); consumers take max seq. The batch twin
    is `lineitem_quantity_percentiles` (exact percentile_approx);
    this operator is the state-store form for unbounded streams."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    keys = list(key_cols)
    kdf = df
    if not keys:
        kdf = df.withColumn("_g", F.lit(0))
        keys = ["_g"]
    qcols = [f"p{str(q).replace('0.', '').ljust(2, '0')}" for q in quantiles]
    out_schema = T.StructType(
        [f for f in kdf.schema.fields if f.name in keys]
        + [T.StructField(c, T.DoubleType()) for c in qcols]
        + [
            T.StructField("n_values", T.LongType()),
            T.StructField("n_nonpos", T.LongType()),
            T.StructField("seq", T.LongType()),
        ]
    )

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bi, bc, n_values, n_nonpos, seq = state.get
            counts = dict(zip(bi, bc))
        else:
            counts, n_values, n_nonpos, seq = {}, 0, 0, 0

        for pdf in pdfs:
            counts, d_pos, d_np = _dd_fold(counts, pdf[value_col], gamma)
            n_values += d_pos
            n_nonpos += d_np
        seq += 1
        state.update(
            (
                list(counts.keys()),
                list(counts.values()),
                n_values,
                n_nonpos,
                seq,
            )
        )
        yield pd.DataFrame(
            {
                **{k: [key[i]] for i, k in enumerate(keys)},
                **{
                    c: [round(_dd_quantile(counts, n_values, q, gamma), 6)]
                    for c, q in zip(qcols, quantiles)
                },
                "n_values": [n_values],
                "n_nonpos": [n_nonpos],
                "seq": [seq],
            }
        )

    return kdf.groupBy(*keys).applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType=_DD_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_NDC_STATE = T.StructType(
    [T.StructField("ids", T.ArrayType(T.LongType()))]
)


def streaming_near_dup_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Streaming MinHash+LSH near-duplicate CANDIDATES — the in-stream
    form of the stored-band-table incremental dedup
    (`operators.dedup.minhash_band_rows` + bucketed join is the batch
    shape; here the inverted index lives in the state store instead).

    Each arriving document is signed once (the same Arrow-batched
    minhash_features pass as the batch path — pandas UDFs run
    unchanged on streaming DataFrames), exploded to (band, bucket)
    rows, and grouped BY BUCKET into `applyInPandasWithState`: the
    per-key state is simply the list of doc ids previously seen in
    that bucket, and every new arrival emits one candidate row per
    stored id (plus id-ordered pairs among same-batch arrivals). A
    pair agreeing on several bands is emitted once per agreeing band —
    downstream dedups with `dropDuplicates` and verifies candidates
    with exact shingle Jaccard where the text lives (the same
    candidate-only verify as the batch path); LSH guarantees recall,
    the verify step restores precision.

    State honesty at scale: the state IS the dedup index, so total
    state grows linearly with the corpus — exactly like the stored
    band table it replaces (RocksDB-backed, keyed by (band, bucket),
    uniform 32-bit bucket keys, each key's list bounded by bucket
    size). An index over history is the irreducible cost of
    dedup-against-history; what stays bounded is per-KEY state and
    per-batch work (candidates are generated only for buckets touched
    by the batch)."""
    from ..operators.dedup import minhash_band_rows

    band_rows = minhash_band_rows(
        df, text_col, id_col, num_hashes, bands, shingle_n
    ).withColumnRenamed(id_col, "_doc")

    out_schema = T.StructType(
        [
            T.StructField("band", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("first_doc", T.LongType()),
            T.StructField("new_doc", T.LongType()),
        ]
    )

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = list(state.get[0]) if state.exists else []
        known = set(seen)
        firsts, news = [], []
        for pdf in pdfs:
            for doc in sorted(int(x) for x in pdf["_doc"]):
                if doc in known:
                    continue
                for old in seen:
                    firsts.append(old)
                    news.append(doc)
                seen.append(doc)
                known.add(doc)
        state.update((seen,))
        if news:
            yield pd.DataFrame(
                {
                    "band": [key[0]] * len(news),
                    "bucket": [key[1]] * len(news),
                    "first_doc": firsts,
                    "new_doc": news,
                }
            )

    return band_rows.groupBy("band", "bucket").applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType=_NDC_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_CMS_STATE = T.StructType(
    [
        T.StructField("matrix", T.BinaryType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def streaming_freq_cms(
    df: DataFrame,
    value_col: str,
    probes: Sequence[int],
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key Count-Min frequency estimates for a fixed probe set,
    maintained across micro-batches — streaming point-frequency with
    FIXED-SIZE state, completing the streaming sketch family
    (Misra-Gries = top-k, HLL = cardinality, DDSketch = quantiles,
    this = arbitrary-key frequency).

    State per key group is one CMS_DEPTH x CMS_WIDTH int64 counter
    matrix (32 KB) regardless of how many distinct values the stream
    carries. Counters add, so folding each micro-batch into the
    matrix IS the one-pass sketch over the concatenated stream: the
    streamed estimate equals a batch CMS over all data seen, and the
    standard guarantee (never undercounts; overshoot <= e/width * N
    w.h.p.) holds end-to-end — pinned against exact counts in the
    stream test. Emits one snapshot row per (key, probe) per batch;
    consumers take max seq. Batch twin: events_cms_user_counts.
    """
    from ..operators.events_queries import (
        CMS_DEPTH,
        CMS_WIDTH,
        _cms_cols,
        cms_estimate,
    )

    keys = list(key_cols)
    kdf = df
    if not keys:
        kdf = df.withColumn("_g", F.lit(0))
        keys = ["_g"]
    probe_arr = np.asarray(list(probes), dtype=np.int64)
    out_schema = T.StructType(
        [f for f in kdf.schema.fields if f.name in keys]
        + [
            T.StructField("probe", T.LongType()),
            T.StructField("est_count", T.LongType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("seq", T.LongType()),
        ]
    )

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            raw, n_rows, seq = state.get
            matrix = (
                np.frombuffer(raw, dtype=np.int64)
                .reshape(CMS_DEPTH, CMS_WIDTH)
                .copy()
            )
        else:
            matrix = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
            n_rows, seq = 0, 0

        for pdf in pdfs:
            vals = pdf[value_col].dropna().to_numpy(dtype=np.int64)
            if len(vals) == 0:
                continue
            n_rows += len(vals)
            cols = _cms_cols(vals)
            for i in range(CMS_DEPTH):
                np.add.at(matrix[i], cols[i], 1)
        seq += 1
        state.update((bytearray(matrix.tobytes()), n_rows, seq))
        ests = cms_estimate(matrix, probe_arr)
        k = len(probe_arr)
        yield pd.DataFrame(
            {
                **{c: [key[i]] * k for i, c in enumerate(keys)},
                "probe": probe_arr,
                "est_count": ests.astype("int64"),
                "n_rows": [n_rows] * k,
                "seq": [seq] * k,
            }
        )

    return kdf.groupBy(*keys).applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType=_CMS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""SimHash near-dup and salted-join tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_reorder_timestamp_spark.functions.skew import salted_join
from kafka_streams_reorder_timestamp_spark.operators.simhash import (
    dedup_simhash,
    simhash64,
    simhash_near_dups,
)


def test_simhash_identical_texts_equal_sigs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        ["doc_id", "text"],
    )
    sigs = {r.doc_id: r.sig for r in df.select("doc_id", simhash64(F.col("text")).alias("sig")).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_simhash_near_dups_finds_close_pairs(spark):
    # 12 docs sharing a 40-token base; each "b" variant drops one token
    # (tiny signature perturbation); unrelated docs use disjoint vocab.
    base_tokens = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(6):
        rows.append((i, " ".join(base_tokens)))
        rows.append((100 + i, " ".join(t for t in base_tokens if t != f"w{i}")))
    unrelated = [(200 + i, " ".join(f"z{i}_{j}" for j in range(40))) for i in range(4)]
    df = spark.createDataFrame(rows + unrelated, ["doc_id", "text"])
    got = simhash_near_dups(df, "text", "doc_id", max_hamming=8).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in got}
    # every base/variant pair must be detected with small hamming
    for i in range(6):
        assert (i, 100 + i) in pairs, f"missing pair {(i, 100+i)}"
    # unrelated docs never pair with the base cluster
    for (a, b) in pairs:
        assert not (a >= 200 or b >= 200) or (a >= 200 and b >= 200)
    # hamming bound respected
    assert all(h <= 8 for h in pairs.values())


def test_simhash_registry_query_runs(spark, sf_dir):
    out = dedup_simhash(spark, sf_dir).collect()
    planted = {(r.doc_a, r.doc_b) for r in out if r.doc_b >= 1_000_000_000}
    # dropping one token from a >=50-token doc flips few signature bits:
    # most planted pairs must be found (all, for this deterministic data)
    assert len(planted) >= 15


def test_salted_join_equals_plain_join(spark, sf_dir):
    from kafka_streams_reorder_timestamp_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    plain = li.join(o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
    salted = salted_join(
        li, o.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"], salt=8
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_spreads_identical_duplicate_rows(spark):
    """Fully identical duplicate rows (the common hot-key case) must
    spread across the salt range — a content-only salt maps them all to
    one value, a no-op exactly where the mitigation matters."""
    from kafka_streams_reorder_timestamp_spark.functions.skew import _SALT

    big = spark.createDataFrame([(1, "hot")] * 64, ["k", "v"]).repartition(8)
    salted = big.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns])
            + F.monotonically_increasing_id(),
            F.lit(16),
        ),
    )
    n_salts = salted.select(_SALT).distinct().count()
    assert n_salts >= 8, f"identical rows landed on only {n_salts} salt values"
    # and the join result is still exactly the plain join
    small = spark.createDataFrame([(1, "dim")], ["k", "d"])
    out = salted_join(big, small, ["k"], salt=16).collect()
    assert len(out) == 64 and all(r.d == "dim" for r in out)


def test_salted_join_left(spark):
    big = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], ["k", "v"])
    small = spark.createDataFrame([(1, "dim1")], ["k", "d"])
    out = salted_join(big, small, ["k"], how="left").collect()
    got = {(r.k, r.v, r.d) for r in out}
    assert got == {(1, "x", "dim1"), (1, "y", "dim1"), (2, "z", None)}


def test_blocked_jaccard_salting_is_exact_and_spreads_hot_block(spark):
    """One hot block far above block_cap: the triangle-grid salted
    self-join must (a) return exactly the pairs a brute-force in-block
    Jaccard finds, and (b) spread the block over multiple grid-cell
    join keys — the no-single-block-straggler property. Small blocks
    (S=1) must reduce to the plain blocked join."""
    from kafka_streams_reorder_timestamp_spark.operators.dedup import (
        blocked_jaccard_pairs,
    )
    from kafka_streams_reorder_timestamp_spark.plans import physical_plan

    # 60 docs in ONE block; 10 planted near-dup pairs (drop last word of
    # a 25-token doc -> J = 24/25 = 0.96), the rest disjoint vocab.
    rows = []
    for i in range(10):
        toks = [f"t{i}_{j}" for j in range(25)]
        rows.append((i, "hot", toks))
        rows.append((1000 + i, "hot", toks[:-1]))
    for i in range(40):
        rows.append((2000 + i, "hot", [f"z{i}_{j}" for j in range(25)]))
    # plus a small block that must stay unsalted (S=1)
    small = [(3000, "cold", ["a", "b", "c"]), (3001, "cold", ["a", "b", "c"])]
    df = spark.createDataFrame(rows + small, ["doc_id", "blk", "t"])

    got = blocked_jaccard_pairs(
        df, ["blk"], threshold=0.8, block_cap=10, max_salt=4
    )
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in got.collect()}
    expect = {(i, 1000 + i) for i in range(10)} | {(3000, 3001)}
    assert set(pairs) == expect, sorted(set(pairs) ^ expect)
    for (a, b), j in pairs.items():
        assert j >= 0.8

    # structural: the probe side is hash-partitioned on the grid keys,
    # so the hot block occupies S(S+1)/2 join keys, not one.
    plan = physical_plan(got)
    assert "i_a" in plan and "j_a" in plan
    assert "hashpartitioning" in plan

    # exactness against an unsalted run of the same helper (cap high
    # enough that S=1 everywhere — the plain blocked join)
    plain = blocked_jaccard_pairs(df, ["blk"], threshold=0.8, block_cap=10_000)
    plain_pairs = {(r.doc_a, r.doc_b) for r in plain.collect()}
    assert plain_pairs == set(pairs)

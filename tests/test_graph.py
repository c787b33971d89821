"""Connected-components clustering: correctness of the iterative
min-label + pointer-jumping algorithm, independent of the documents
corpus (the registry query `dedup_clusters` is oracle-checked
separately in test_oracle_parity.py)."""

from __future__ import annotations

from kafka_streams_reorder_timestamp_spark.operators.graph import (
    connected_components,
)


def _labels(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df, "src", "dst")
    return {r["id"]: r["label"] for r in out.collect()}


def test_transitive_chain_merges_into_one_cluster(spark):
    # A~B, B~C, C~D: one component even though A!~C etc.
    got = _labels(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_path_converges_within_logarithmic_rounds(spark):
    # A 64-node path is the worst case for plain min-propagation
    # (diameter 63). Pointer jumping must still converge inside the
    # round cap — and produce one component labeled by the min id.
    n = 64
    got = _labels(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_edge_direction_is_irrelevant(spark):
    # Edges given high->low and low->high mix freely.
    got = _labels(spark, [(5, 2), (2, 9), (7, 3)])
    assert got == {2: 2, 5: 2, 9: 2, 3: 3, 7: 3}


def test_dense_clique_single_round_shape(spark):
    got = _labels(spark, [(a, b) for a in range(6) for b in range(a + 1, 6)])
    assert got == {i: 0 for i in range(6)}

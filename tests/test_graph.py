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


def test_lsh_clusters_match_exact_clusters_on_planted_corpus(spark, sf_dir):
    """dedup_clusters_lsh (the 100 TB path: LSH candidate edges) must
    co-cluster every planted near-duplicate with its source and agree
    with clustering over the exact shingle-Jaccard edge set at >= 0.95
    same-cluster pair recall — closing the loop LSH edges -> exact
    edges -> DuckDB oracle (dedup_jaccard_shingles)."""
    from kafka_streams_reorder_timestamp_spark.operators.dedup import (
        _planted_corpus,
        shingle_jaccard_pairs,
    )
    from kafka_streams_reorder_timestamp_spark.operators.graph import (
        _clusters_from_pairs,
        dedup_clusters_lsh,
    )
    from kafka_streams_reorder_timestamp_spark.sources.catalog import load_table

    from pyspark.sql import functions as F

    lsh_rows = dedup_clusters_lsh(spark, sf_dir).collect()
    lsh_label = {r.doc_id: r.cluster_id for r in lsh_rows}
    # every planted perturbation (doc_id >= 1e9) clusters with its source
    planted = [r.doc_id for r in lsh_rows if r.doc_id >= 1_000_000_000]
    assert len(planted) >= 20, "planted near-dups missing from LSH clusters"
    for pid in planted:
        src = pid - 1_000_000_000
        assert lsh_label.get(src) == lsh_label[pid], (src, pid)

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    exact_pairs = shingle_jaccard_pairs(
        _planted_corpus(d), "text", "doc_id", threshold=0.7
    ).select("doc_a", "doc_b")
    exact_rows = _clusters_from_pairs(exact_pairs).collect()
    exact_label = {r.doc_id: r.cluster_id for r in exact_rows}

    def same_cluster_pairs(label):
        from collections import defaultdict

        groups = defaultdict(list)
        for doc, lab in label.items():
            groups[lab].append(doc)
        out = set()
        for docs in groups.values():
            docs.sort()
            out.update(
                (a, b) for i, a in enumerate(docs) for b in docs[i + 1 :]
            )
        return out

    truth = same_cluster_pairs(exact_label)
    got = same_cluster_pairs(lsh_label)
    assert truth, "exact clustering found no co-clustered pairs — vacuous"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"LSH cluster pair-recall {recall:.3f} < 0.95"


def test_sampled_clusters_induced_subgraph(spark, sf_dir):
    """The 100 TB audit knob on the exact twin (round 10, mirroring
    lsh_recall_audit): dedup_clusters(sample_frac/id_bound) runs the
    exact blocked-Jaccard edges + components on a deterministic
    md5-bucket doc sample. Pins: defaults reproduce the registered
    full twin, sampling is deterministic and a genuine sub-universe,
    every sampled doc is in the documented md5 bucket, sampled
    components REFINE the full components (an induced subgraph can
    split a component, never merge two), and the registered
    dedup_clusters_sampled is exactly the sample_frac=0.5 point."""
    import hashlib

    from kafka_streams_reorder_timestamp_spark.operators.graph import (
        dedup_clusters,
    )
    from kafka_streams_reorder_timestamp_spark.operators.registry import (
        REGISTRY,
    )

    full = {
        r.doc_id: r for r in dedup_clusters(spark, sf_dir).collect()
    }
    reg = {
        r.doc_id: r
        for r in REGISTRY["dedup_clusters"].builder(spark, sf_dir).collect()
    }
    assert {k: v.asDict() for k, v in full.items()} == {
        k: v.asDict() for k, v in reg.items()
    }

    s1 = {
        r.doc_id: r
        for r in dedup_clusters(spark, sf_dir, sample_frac=0.5).collect()
    }
    s2 = {
        r.doc_id: r
        for r in REGISTRY["dedup_clusters_sampled"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert {k: v.asDict() for k, v in s1.items()} == {
        k: v.asDict() for k, v in s2.items()
    }  # registered query IS the knob's 0.5 point (and determinism)
    assert 0 < len(s1) < len(full)  # genuinely sub-universe

    for doc in s1:
        assert (
            int(hashlib.md5(str(doc).encode()).hexdigest()[:8], 16) % 10000
            < 5000
        ), doc

    # refinement: same sampled cluster -> same full cluster (sampling
    # can only split components by removing bridge docs, never merge).
    # O(n): group docs by sampled cluster once, then each group must
    # map into a single full cluster.
    by_sampled: dict = {}
    for r in s1.values():
        by_sampled.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, docs in by_sampled.items():
        full_cids = {full[d].cluster_id for d in docs if d in full}
        assert len(full_cids) <= 1, (cid, docs, full_cids)

    # id_bound composes: every surviving doc id is below the cutoff
    bounded = dedup_clusters(spark, sf_dir, id_bound=300).collect()
    assert all(r.doc_id < 300 for r in bounded)

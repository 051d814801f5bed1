"""Incremental connected components (operators/components.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators.components import (
    connected_components,
    incremental_components,
)


def _labels(df):
    return sorted(map(tuple, df.collect()))


def _full(spark, edges, nodes):
    e = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id bigint")
    return connected_components(e, nodes=n, node_col="doc_id")


def _inc(spark, old_edges, old_nodes, delta_edges, delta_nodes):
    old = _full(spark, old_edges, old_nodes)
    de = spark.createDataFrame(
        delta_edges or [(None, None)], "doc_a bigint, doc_b bigint"
    )
    if not delta_edges:
        de = de.filter(F.col("doc_a").isNotNull())
    dn = spark.createDataFrame(
        [(x,) for x in delta_nodes] or [(None,)], "doc_id bigint"
    )
    if not delta_nodes:
        dn = dn.filter(F.col("doc_id").isNotNull())
    return incremental_components(old, de, dn, "doc_id")


def test_merge_attach_and_new_component(spark):
    """One delta batch exercising all three cases: merging two old
    components, attaching a new node to an old one, and a brand-new
    all-delta component — plus untouched components and singletons."""
    old_edges = [(10, 11), (20, 21), (30, 31), (40, 41)]
    old_nodes = list(range(10, 12)) + list(range(20, 22)) + \
        list(range(30, 32)) + list(range(40, 42)) + [50]  # 50 singleton
    delta_edges = [
        (11, 20),   # merges comp(10) with comp(20) -> label 10
        (31, 60),   # attaches new node 60 to comp(30)
        (61, 62),   # brand-new component -> label 61
    ]
    delta_nodes = [60, 61, 62, 63]  # 63: new singleton
    got = _labels(
        _inc(spark, old_edges, old_nodes, delta_edges, delta_nodes)
    )
    want = _labels(
        _full(spark, old_edges + delta_edges, old_nodes + delta_nodes)
    )
    assert got == want
    d = dict(got)
    assert d[20] == 10 and d[21] == 10     # merged
    assert d[60] == 30                     # attached
    assert d[61] == 61 and d[62] == 61     # new comp
    assert d[50] == 50 and d[63] == 63     # singletons untouched/new
    assert d[40] == 40                     # untouched comp


def test_new_node_with_smaller_id_relabels_old_component(spark):
    """A new node whose id undercuts the old component's min must pull
    the WHOLE old component onto the new global minimum."""
    got = dict(
        _labels(_inc(spark, [(10, 11)], [10, 11], [(2, 11)], [2]))
    )
    assert got == {2: 2, 10: 2, 11: 2}


def test_chain_merge_through_delta(spark):
    """Delta edges can merge MANY old components transitively in one
    batch (a ~ b ~ c through contracted edges)."""
    old_edges = [(10, 11), (20, 21), (30, 31)]
    old_nodes = [10, 11, 20, 21, 30, 31]
    delta_edges = [(11, 21), (21, 31)]
    got = _labels(_inc(spark, old_edges, old_nodes, delta_edges, []))
    want = _labels(_full(spark, old_edges + delta_edges, old_nodes))
    assert got == want
    assert set(dict(got).values()) == {10}


def test_random_splits_equal_full_recompute(spark):
    """Property: for the real SimHash near-dup graph at sf0.001, ANY
    node split (old/new) with the induced edge split folds back to the
    full labeling exactly."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.neardup import (
        simhash_components_edges,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    edges = simhash_components_edges(docs, max_hamming=3).cache()
    try:
        full = _labels(
            connected_components(edges, nodes=docs, node_col="doc_id")
        )
        for mod in (3, 7):
            is_new = F.col("doc_id") % mod == 0
            old_docs = docs.filter(~is_new)
            old_edges = edges.filter(
                (F.col("doc_a") % mod != 0) & (F.col("doc_b") % mod != 0)
            )
            delta_edges = edges.filter(
                (F.col("doc_a") % mod == 0) | (F.col("doc_b") % mod == 0)
            )
            old = connected_components(
                old_edges, nodes=old_docs, node_col="doc_id"
            )
            got = _labels(
                incremental_components(
                    old, delta_edges, docs.filter(is_new), "doc_id"
                )
            )
            assert got == full, f"mod={mod}"
    finally:
        edges.unpersist()


def test_empty_delta_is_identity(spark):
    old_edges = [(1, 2), (3, 4)]
    old_nodes = [1, 2, 3, 4, 5]
    old = _full(spark, old_edges, old_nodes)
    got = _labels(_inc(spark, old_edges, old_nodes, [], []))
    assert got == _labels(old)


# --- frontier-iterative BFS (bfs_hops) ---------------------------------------

def _bfs_frames(spark, edges, seeds):
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return e, s


def test_bfs_hops_chain_distances(spark):
    from example_kafkastreams_spark.operators.components import bfs_hops

    # 0-1-2-3-4-5 chain, seed 0, budget 4: node 5 is out of reach
    e, s = _bfs_frames(
        spark, [(i, i + 1) for i in range(5)], [0]
    )
    got = {r.node: (r.root, r.hop) for r in bfs_hops(e, s, 4).collect()}
    assert got == {i: (0, i) for i in range(5)}


def test_bfs_hops_shortest_path_wins(spark):
    from example_kafkastreams_spark.operators.components import bfs_hops

    # 0-1-2-3 chain plus shortcut 0-3: node 3 is hop 1, not 3
    e, s = _bfs_frames(spark, [(0, 1), (1, 2), (2, 3), (0, 3)], [0])
    got = {r.node: r.hop for r in bfs_hops(e, s, 4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1}


def test_bfs_hops_undirected_and_multi_seed(spark):
    from example_kafkastreams_spark.operators.components import bfs_hops

    # two disjoint components, seeds at their canonical min nodes;
    # edges stored one direction only — traversal must symmetrize
    e, s = _bfs_frames(
        spark, [(11, 10), (12, 11), (20, 21)], [10, 20]
    )
    got = {r.node: (r.root, r.hop) for r in bfs_hops(e, s, 4).collect()}
    assert got == {
        10: (10, 0), 11: (10, 1), 12: (10, 2),
        20: (20, 0), 21: (20, 1),
    }


def test_bfs_hops_partition_independent(spark):
    from example_kafkastreams_spark.operators.components import bfs_hops

    edges = [(i, (i * 7 + 3) % 40) for i in range(40) if i != (i * 7 + 3) % 40]
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    s = spark.createDataFrame([(0,), (1,)], "node long")
    a = bfs_hops(e.repartition(1), s, 3)
    b = bfs_hops(e.repartition(16), s, 3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bfs_hops_broadcast_matches_shuffle_regime(spark):
    from example_kafkastreams_spark.operators.components import bfs_hops

    edges = [(i, (i * 7 + 3) % 40) for i in range(40) if i != (i * 7 + 3) % 40]
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    s = spark.createDataFrame([(0,), (1,)], "node long")
    a = bfs_hops(e, s, 3, broadcast=True)
    b = bfs_hops(e, s, 3, broadcast=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- identical-sketch-contracted chain audit (simhash_chain_hops) ------------

def test_simhash_chain_hops_equals_full_graph_bfs(spark):
    """The contraction must be EXACT: same (node, root, hop) set as
    the full-pair-graph BFS, on a corpus with heavy identical-sketch
    duplicate groups (exact copies) AND near-dup chains."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.operators.components import (
        bfs_hops,
        connected_components,
    )
    from example_kafkastreams_spark.operators.neardup import (
        simhash_chain_hops,
        simhash_components_edges,
        simhash_neardup_pairs,
    )

    base = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon eta",
        "alpha beta gamma delta theta eta",
        "completely different words entirely here now",
        "unique singleton document with own words",
    ]
    rows = []
    did = 0
    for text in base:
        for _ in range(6):  # 6-way exact-duplicate groups
            rows.append((did, text))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    comp = connected_components(
        simhash_components_edges(docs, max_hamming=3),
        nodes=docs, node_col="doc_id",
    )
    seeds = comp.filter(F.col("doc_id") == F.col("component_id")).select(
        F.col("doc_id").alias("node")
    )
    full = bfs_hops(
        simhash_neardup_pairs(docs, max_hamming=3).select("doc_a", "doc_b"),
        seeds, max_hops=4,
    )
    contracted = simhash_chain_hops(docs, seeds, max_hamming=3, max_hops=4)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, contracted.collect())
    )


def test_simhash_chain_hops_hop_budget_and_seed_group(spark):
    """Members of the seed's own group land at hop 1 (never 0), and
    the hop budget still cuts at max_hops."""
    from pyspark.sql import functions as F

    from example_kafkastreams_spark.operators.components import bfs_hops
    from example_kafkastreams_spark.operators.neardup import (
        simhash_chain_hops,
        simhash_neardup_pairs,
    )

    rows = [(0, "alpha beta gamma"), (1, "alpha beta gamma"),
            (2, "alpha beta gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: (r.root, r.hop)
           for r in simhash_chain_hops(docs, seeds).collect()}
    assert got == {0: (0, 0), 1: (0, 1), 2: (0, 1)}
    full = {r.node: (r.root, r.hop) for r in bfs_hops(
        simhash_neardup_pairs(docs).select("doc_a", "doc_b"),
        seeds).collect()}
    assert got == full

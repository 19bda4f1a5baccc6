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

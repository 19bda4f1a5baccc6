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

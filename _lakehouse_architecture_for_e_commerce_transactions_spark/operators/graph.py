"""Connected components over a pair graph — near-duplicate *resolution*.

Pair detection (MinHash/SimHash/cosine) yields edges; deduplication needs
clusters: if A~B and B~C, one canonical document must represent {A,B,C}.
Components are computed by iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

until a fixpoint. Each iteration is one join + one aggregation (both on the
node key); ``localCheckpoint`` truncates lineage per round so plans stay
flat. Iteration count is the graph diameter (near-dup clusters are shallow
— a handful of rounds), and convergence is detected with a cheap sum-of-
labels fixpoint probe rather than a full comparison join.

At 100 TB-corpus scale this is the standard large-graph CC shape (hash
partition by node); for billion-edge graphs swap in the large-star/small-
star variant — the operator contract (edges in, (node, component) out) is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Returns (node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough).
    """
    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize: the edge list is re-joined every iteration and its
        # lineage may be an expensive pipeline (e.g. MinHash candidate
        # generation) that must not recompute per round
        .localCheckpoint(eager=True)
    )
    # size the per-round shuffles to the graph, not the session default:
    # a fixpoint loop pays task-scheduling overhead × partitions × rounds,
    # so small graphs run on few partitions (large ones keep parallelism)
    n_edges = both.count()
    n_parts = max(2, min(both.rdd.getNumPartitions(), n_edges // 100_000 + 2))
    both = both.repartition(n_parts, "b")
    nodes = both.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)

    prev_sum = None
    for _ in range(max_iterations):
        neighbor_min = (
            both.join(labels, both.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = updated.agg(F.sum("component").alias("s")).collect()[0]["s"]
        labels = updated
        if prev_sum is not None and cur_sum == prev_sum:
            break  # labels only ever decrease; equal sum ⇒ fixpoint
        prev_sum = cur_sum
    return labels


def dedup_clusters(
    pairs: DataFrame, id1: str = "doc1", id2: str = "doc2"
) -> DataFrame:
    """(node, component, is_canonical): canonical = cluster-min id — the
    row a curation pipeline keeps; the rest are the removable duplicates."""
    cc = connected_components(pairs, id1, id2)
    return cc.withColumn("is_canonical", (F.col("node") == F.col("component")))

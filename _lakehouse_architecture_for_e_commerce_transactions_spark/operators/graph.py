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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, in integer
    micro-units so the result is bit-identical under any partitioning or
    summation order (and mirrorable in an external SQL oracle).

    Per iteration (the Pregel shape as two relational ops):

        contrib(v) = Σ over in-edges (u,v) of  r(u) div out_deg(u)
        r'(v)      = base + damping·(contrib(v) + dangling div N) div 100

    where ``base = (100-damping)·scale div (100·N)``, ``dangling`` is the
    summed rank of sink nodes, and every division is integer floor — no
    float ever enters, so there is no last-ulp drift to converge away.

    Scale shape: one equi-join (edges ⋈ ranks on src) + one groupBy(dst)
    per round; the dangling total rides in as a 1-row broadcast.
    ``localCheckpoint`` truncates lineage per round (plans stay flat).
    At billion-edge scale, pre-partition edges by src once and reuse that
    partitioning every round; ranks are |V| rows, edges never move after
    the first shuffle.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint(eager=True)
    )
    # size per-round shuffles to the graph, not the session default (the
    # connected_components rule): an iterative loop pays scheduling
    # overhead × partitions × rounds
    n_edges = e.count()
    n_parts = max(2, min(e.rdd.getNumPartitions(), n_edges // 100_000 + 2))
    e = e.repartition(n_parts, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(n_parts, "node")
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_micro", F.lit(0).cast("long"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    init = scale // n
    base = (100 - damping_pct) * scale // (100 * n)
    ranks = nodes.withColumn("r", F.lit(init).cast("long"))
    for _ in range(iterations):
        ranks = ranks.localCheckpoint(eager=True)
        dang = (
            ranks.join(deg, ranks.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dang"))
        )
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct} * (coalesce(contrib, 0L) "
                        f"+ (dang div {n}))) div 100"
                    )
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def dedup_clusters(
    pairs: DataFrame, id1: str = "doc1", id2: str = "doc2"
) -> DataFrame:
    """(node, component, is_canonical): canonical = cluster-min id — the
    row a curation pipeline keeps; the rest are the removable duplicates."""
    cc = connected_components(pairs, id1, id2)
    return cc.withColumn("is_canonical", (F.col("node") == F.col("component")))

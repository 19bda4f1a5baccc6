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

The operator is scale-adaptive at BOTH ends, same contract throughout
(edges in, (node, component) out):

* tiny graphs (≤ ``small_graph_threshold`` deduped directed edges, a
  driver-bounded few MB) skip the loop entirely — a driver union-find
  answers in one collect instead of diameter-many Spark jobs, which is
  the difference between ~0.1 s and ~2 s when near-dup clusters are
  sparse;
* billion-edge graphs use ``connected_components_star`` (Kiveris et
  al.'s large-star/small-star alternation), whose round count is
  O(log d) in the component diameter d instead of O(d) — the long-chain
  killer for min-label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _driver_union_find(rows) -> list[tuple]:
    """Union-find over a collected edge list; component = min member.
    Only reached under ``small_graph_threshold`` — memory is bounded by
    the threshold, never by corpus size."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(n, find(n)) for n in parent]


def _local_result_frame(spark, out: list[tuple], typ) -> DataFrame:
    """(node, component) frame from a driver-computed labeling, via the
    Arrow ``createDataFrame`` path — the pickled-parallelize default
    serializes row by row, which at the 200k-edge routing threshold is
    driver time a bounded result does not need to spend."""
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("node", typ), StructField("component", typ)]
    )
    if not out:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(out, columns=["node", "component"]), schema
        )
    except Exception:  # pragma: no cover — arrow/pandas unavailable
        return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    small_graph_threshold: int = 200_000,
) -> DataFrame:
    """Returns (node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough).
    """
    # Materialize the one-sided edge list FIRST: its lineage may be an
    # expensive pipeline (e.g. MinHash candidate generation + Jaccard
    # verification), and building the symmetric union straight off that
    # lineage puts the whole chain in BOTH union branches — measured as a
    # full re-execution (~1.2 s at sf0.1 curation) that ReuseExchange does
    # not always collapse. After the checkpoint, mirror + distinct run on
    # edge-count-sized data only. The edge list is then re-joined every
    # iteration, so the second checkpoint keeps the loop's plans flat.
    one = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    both_plan = one.unionByName(
        one.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    # Small-graph routing (r14): decide from the CHEAP one-sided count
    # (checkpointed blocks, a metadata-scale job) and, when small,
    # collect the mirrored+deduped edges straight out of the distinct
    # job — the former flow paid a second eager checkpoint plus a count
    # before the same collect. Both routes compute the identical
    # min-reachable labeling, so the routing boundary only picks a plan.
    # Accepted tradeoff (r14 advice): an input whose ONE-SIDED count
    # exceeds the threshold but whose mirrored+deduped edge set is
    # still small (duplicate/bidirectional-heavy lists, n_one ≤
    # threshold < 2·n_one with most pairs repeated) runs the
    # distributed loop where the old flow took the driver fast path —
    # the limit()-probe branch below covers the common half of that
    # corner (n_one ≤ threshold), and no in-repo caller feeds
    # duplicate-heavy edge lists past it, so a third count on the
    # deduped set is not worth its extra always-paid job.
    n_one = one.count()
    rows = None
    if 2 * n_one <= small_graph_threshold:
        rows = both_plan.collect()  # |both| ≤ 2·|one|: certainly small
    elif n_one <= small_graph_threshold:
        probe = both_plan.limit(small_graph_threshold + 1).collect()
        if len(probe) <= small_graph_threshold:
            rows = probe
    if rows is not None:
        spark = one.sparkSession
        typ = one.schema["a"].dataType
        out = _driver_union_find((r["a"], r["b"]) for r in rows)
        return _local_result_frame(spark, out, typ)
    both = both_plan.localCheckpoint(eager=True)
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


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the billion-edge
    variant promised by the module docstring, same contract as
    ``connected_components``: (node, component = min reachable id).

    Each round alternates two neighborhood rewrites, every one a single
    groupBy(node) + explode — no joins inside the loop at all:

    * large-star: every neighbor LARGER than the center re-attaches to
      the center's neighborhood minimum (keeps smaller neighbors as is);
    * small-star: every neighbor ≤ the center re-attaches to the
      neighborhood minimum.

    Both preserve connectivity exactly; their alternation contracts every
    component onto its minimum in O(log d) rounds (d = diameter) versus
    min-label propagation's O(d) — the difference that matters for long
    chains at billion-edge scale. Convergence is detected with an
    order-independent edge-set checksum (count + hash sum), and the
    converged state is a star forest whose centers are component minima,
    so the answer reads off the final edge list with one aggregation.
    """
    # checkpoint the doubled edge list FIRST: both the working edge set
    # and the node universe derive from it, and the upstream lineage may
    # be the expensive pipeline (e.g. the MinHash-LSH self-join) — an
    # un-checkpointed base would execute it once per derivation
    doubled = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=True)
    )
    # all input nodes — a self-loop-only node leaves the working edge set
    # below but must still appear in the output (component = itself)
    all_nodes = doubled.select(F.col("a").alias("node")).distinct()
    both = (
        doubled.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = both.count()
    n_parts = max(2, min(both.rdd.getNumPartitions(), n_edges // 100_000 + 2))
    nodes = all_nodes.repartition(n_parts, "node").localCheckpoint(eager=True)

    def star(e: DataFrame, large: bool) -> DataFrame:
        # per-center neighborhood minimum as a (|V|-row) aggregate joined
        # back onto the edges — NEVER a collected neighbor array, which
        # for a star center would be component-sized (the OOM at scale)
        nmin = e.groupBy("a").agg(F.min("b").alias("nmin"))
        cond = (
            (F.col("b") > F.col("a")) if large else (F.col("b") <= F.col("a"))
        )
        out = (
            e.join(nmin, "a")
            .withColumn("m", F.least(F.col("nmin"), F.col("a")))
            .filter(cond & (F.col("b") != F.col("m")))
            .select(F.col("b").alias("x"), F.col("m"))
        )
        if not large:
            # small-star also re-attaches the CENTER to its minimum —
            # without this a path like 2—1—3 loses every edge (each
            # neighbor emission is skipped as b == m)
            out = out.unionByName(
                nmin.withColumn("m", F.least(F.col("nmin"), F.col("a")))
                .filter(F.col("a") != F.col("m"))
                .select(F.col("a").alias("x"), F.col("m"))
            )
        # keep edges symmetric for the next neighborhood pass
        sym = out.select(F.col("x").alias("a"), F.col("m").alias("b")).unionByName(
            out.select(F.col("m").alias("a"), F.col("x").alias("b"))
        )
        # ONE exchange per star pass (r15, guide §2.4): the explicit
        # repartition(a) ALREADY satisfies the dedup aggregate's
        # clustering requirement ({a} ⊆ {a, b}), so dropDuplicates
        # after it plans as a single complete-mode HashAggregate with
        # no second shuffle — the former distinct().repartition(a)
        # paid Exchange(a, b) + Exchange(a) per pass, ×2 passes ×
        # O(log d) rounds. The next pass's groupBy("a") and join on
        # "a" also reuse this partitioning.
        return sym.repartition(n_parts, "a").dropDuplicates(["a", "b"])

    def checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    e = both
    prev = checksum(e)
    rounds = 0
    for _ in range(max_iterations):
        e = star(e, large=True).localCheckpoint(eager=True)
        e = star(e, large=False).localCheckpoint(eager=True)
        rounds += 1
        cur = checksum(e)
        if cur == prev:
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds  # O(log d) — pinned by test
    # converged: stars centered at component minima — component(v) =
    # min neighbor (or self for the center / isolated components)
    parents = e.groupBy("a").agg(F.min("b").alias("p"))
    return nodes.join(parents, nodes.node == parents.a, "left").select(
        "node",
        F.coalesce(
            F.least(F.col("p"), F.col("node")), F.col("node")
        ).alias("component"),
    )


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


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts — (node, triangles), every node of the
    graph listed, zero included.

    Algorithm: degree-ordered edge orientation (the node-iterator++ /
    compact-forward scheme). Each undirected edge is directed from the
    lower to the higher endpoint under the total order (degree, node);
    wedges are oriented edge pairs (a→b, a→c) with ord(b) < ord(c), and
    a wedge closes into a triangle iff the oriented edge b→c exists.
    Every triangle is found exactly once, at its lowest-order corner.

    Scale shape: orientation caps out-degree at O(sqrt(2m)) for ANY
    degree distribution, so the wedge join's fan-out is O(m^1.5) total —
    the celebrity-node quadratic blowup of a naive adjacency self-join
    never happens. Three shuffles: degree groupBy, wedge self-join on
    the common corner, closing semi-join on the (b, c) edge key. The
    canonical edge list is checkpointed once so the (possibly expensive)
    upstream pair pipeline doesn't re-run per consumer branch.

    Input may contain duplicates, self-loops, or both orientations —
    canonicalized first.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionByName(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    withdeg = (
        canon.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed(
                "deg", "dv"
            ),
            "v",
        )
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("hi_deg"),
    )
    e1 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("b"), F.col("hi_deg").alias("db")
    )
    e2 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("c"), F.col("hi_deg").alias("dc")
    )
    wedges = e1.join(e2, "a").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(
        F.col("lo").alias("b"), F.col("hi").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"], "left_semi")
    per_node = (
        tris.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.select("node")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias(
                "triangles"
            ),
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Fixed-iteration synchronous label propagation (Raghavan et al.
    2007) over a directed edge list — community detection by a
    DIFFERENT rule than connected_components' min-label spread: each
    round, every node adopts the label carried by the PLURALITY of its
    OUT-neighbors — the nodes it points at (the join fetches labels at
    ``dst`` and groups by ``src``; tie → smallest label) — so dense
    clusters converge to
    one label while a single bridge edge between two dense regions
    does NOT merge them (the min-label rule would). Undirected graphs:
    supply both edge directions.

    Deterministic by construction: labels start as node ids, the
    per-node winner is picked by a (count DESC, label ASC) window —
    a pure function of the edge list, independent of partitioning, and
    replayable as unrolled relational iterations by a SQL oracle.
    Synchronous updates can oscillate on bipartite structures; a FIXED
    iteration count makes that a determinism non-issue (both engines
    replay the same rounds).

    Scale shape per round: one equi-join (edges ⋈ labels on dst) +
    one groupBy(src, label) + one per-node bounded window — the Pregel
    message pattern as relational ops. Edges are shuffled onto a
    src-keyed partitioning once and reused every round;
    ``localCheckpoint`` truncates lineage so plans stay flat."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint(eager=True)
    )
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
    labels = nodes.withColumn("lbl", F.col("node"))
    w = Window.partitionBy("src").orderBy(
        F.col("c").desc(), F.col("lbl").asc()
    )
    for _ in range(iterations):
        labels = labels.localCheckpoint(eager=True)
        counts = (
            e.join(labels, e.dst == labels.node)
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pick = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"), F.col("lbl").alias("new"))
        )
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node", F.coalesce("new", "lbl").alias("lbl")
            )
        )
    return labels.select("node", F.col("lbl").alias("community"))


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling (Seidman 1983; the Batagelj-Zaversnik
    iteration relationalized): each round drops every node with degree
    < ``k`` in the CURRENT subgraph, together with its edges — after
    enough rounds the survivor set is exactly the k-core (cohesive
    subgraph where everyone keeps >= k neighbors). A FIXED ``rounds``
    makes the result a pure function of the edge list (both engines
    replay the same peels); callers needing the true fixpoint raise
    ``rounds`` — peeling is monotone, so extra rounds are no-ops once
    converged. Undirected graphs: supply both edge directions.

    Returns (node, degree): survivors with their degree in the
    surviving subgraph. Scale shape per round: one groupBy(src) degree
    count + two semi-joins — all equi-joins on the edge key, no window,
    no collect; ``localCheckpoint`` keeps the iterated plan flat."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select(F.col("src").alias("node"))
        )
        e = (
            e.join(keep, e.src == keep.node, "left_semi")
            .join(keep, e.dst == keep.node, "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("src").alias("node"), "degree")
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round multi-source BFS: shortest hop count from ANY source
    node, for every node reachable within ``max_hops``. Returns
    (node, hops) — sources at 0, even sources with no edges. The
    reachability primitive behind supply-chain blast-radius, fraud-ring
    proximity, and recommendation walks; a FIXED round count keeps the
    result a pure function of (edges, sources), replayable by a SQL
    oracle as unrolled iterations. Undirected graphs: supply both edge
    directions.

    Scale shape per round: one equi-join (edges ⋈ frontier on src) +
    one distinct + one anti-join against settled distances — all
    frontier-sized, never graph-sized; the frontier shrinks to empty
    once the component is exhausted, making extra rounds free no-ops.
    ``localCheckpoint`` truncates lineage so the iterated plan stays
    flat. First-discovery = shortest distance is the BFS invariant, so
    no min() re-aggregation is ever needed."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint(eager=True)
    )
    dist = (
        sources.select(F.col("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    for i in range(1, max_hops + 1):
        new = (
            e.join(frontier, e.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(i))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(new)
        frontier = new.select("node")
    return dist


def sssp_costs(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Fixed-round multi-source Bellman-Ford: minimum path COST from
    any source node using at most ``rounds`` edges. Returns
    (node, cost) for every node reachable within the horizon — the
    weighted sibling of ``bfs_hops`` (cheapest supply route, lowest-
    friction referral path). A FIXED round count keeps the result a
    pure function of (edges, sources): after k rounds it is EXACTLY
    min-cost-over-≤k-edge-paths, replayable by a SQL oracle as k
    unrolled relax steps; with rounds ≥ |V|−1 and non-negative
    weights it is the true shortest path.

    Per-round shape: one equi-join (edges ⋈ dist on src) + one
    groupBy-min over (settled ∪ relaxed) — the frontier never
    materializes all paths, only the current best cost per node.
    Integer weights keep the relaxation exact and engine-portable
    (double costs would carry summation order in the last ulp).
    ``localCheckpoint`` keeps the iterated plan flat."""
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    dist = (
        sources.select(F.col("node"))
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        cand = e.join(dist, e.src == dist.node).select(
            F.col("dst").alias("node"),
            (F.col("cost") + F.col("w")).alias("cost"),
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
    return dist

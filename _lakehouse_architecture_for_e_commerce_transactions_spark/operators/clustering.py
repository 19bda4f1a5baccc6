"""Distributed k-means (Lloyd iteration) over an embedding column.

The reference has no vector operators (SURVEY.md §2.8); this is part of
the LLM-data-pipeline extension set — embedding-space clustering backs
semantic dedup sharding, topic-balanced mixture sampling, and the IVF
coarse quantizer in ``operators/similarity.py`` (a trained IVF index is
exactly the centroid set this iteration converges to).

Scale shape (the only one that survives 100 TB):

* centroids are O(k·dim) — inlined as literal expressions; the corpus
  never shuffles for assignment (a pure per-row argmin inside whole-stage
  codegen: ``zip_with`` + ``aggregate`` + ``array_min``, no UDF, no join).
* the update step is one shuffle of (cluster, dim, partial-sum) with
  map-side combine — traffic is O(partitions · k · dim), independent of
  row count.
* iteration happens on the driver *loop*, not driver *data*: each pass
  collects only the k×dim centroid matrix.

Determinism: seeds are the k lowest-id vectors; assignment ties break to
the lowest centroid id; dimension sums use fixed-point accumulation
(``floor(v·10⁶ + 0.5)`` as BIGINT) so the result is a pure function of
the row *set*, independent of partitioning and summation order — the
property the oracle gate hashes against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance between two float arrays, accumulated in
    doubles in array order (engine-portable: same sequential fold as
    DuckDB's list_reduce)."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic seeds: the k lowest-id vectors as (cid, cvec).
    Production would use k-means|| sampling; lowest-id keeps every engine
    and every run on the same start point."""
    return (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame | list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment as a pure per-row expression: the k×dim
    centroid matrix is inlined as literals (k-means centroids are driver
    state between iterations — O(k·dim), never data-sized), so assignment
    is ``array_min`` over k (d2, cid) structs inside whole-stage codegen.
    ZERO shuffles and zero joins — the corpus never moves; a cross-join +
    groupBy formulation would re-shuffle every vector each iteration.
    Ties break to the lowest cid via the struct's (d2, cid) ordering.

    A DataFrame ``centroids`` (cid, cvec) is collected first — bounded by
    contract, like the query side of ``similarity.cosine_topk``.
    """
    if isinstance(centroids, DataFrame):
        centroids = [
            (r["cid"], list(r["cvec"])) for r in centroids.collect()
        ]
    if not centroids:
        raise ValueError("assign_clusters: empty centroid set")
    # spread first (r15, guide §2.5): the per-row cost is k×dim distance
    # terms and the Lloyd update explodes ×dim — a small embeddings
    # parquet arrives as 1-2 input splits and would run it all on 1-2
    # cores. No-op once the input has cluster parallelism.
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.util import (
        spread,
    )

    df = spread(df)
    v = F.col(vec_col)
    scored = F.array(
        *[
            F.struct(
                _sq_l2(
                    v, F.array(*[F.lit(float(x)) for x in cvec])
                ).alias("d2"),
                F.lit(int(cid)).cast("long").alias("cid"),
            )
            for cid, cvec in centroids
        ]
    )
    best = F.array_min(scored)
    return df.select(
        F.col(id_col),
        v,
        best["cid"].alias("cid"),
        best["d2"].alias("d2"),
    )


def update_centroid_dims(
    assigned: DataFrame, vec_col: str = "embedding", scale: int = 1_000_000
) -> DataFrame:
    """Lloyd update in (cluster, dim) long form: fixed-point dimension
    sums → exact means, one shuffle keyed by (cid, dim) with map-side
    combine. Long form keeps the output oracle-hashable and the shuffle
    rows tiny; reassembling the k×dim matrix is a driver-side collect of
    k·dim rows (bounded, never data-sized)."""
    exploded = assigned.select(
        "cid", F.posexplode(vec_col).alias("dim", "val")
    )
    fx = F.floor(F.col("val").cast("double") * scale + F.lit(0.5)).cast(
        "long"
    )
    return (
        exploded.groupBy("cid", "dim")
        .agg(
            F.sum(fx).alias("_sum_fx"),
            F.count(F.lit(1)).cast("long").alias("n_points"),
        )
        .select(
            "cid",
            F.col("dim").cast("long").alias("dim"),
            "n_points",
            F.round(
                F.col("_sum_fx") / F.lit(float(scale)) / F.col("n_points"), 6
            ).alias("centroid_val"),
        )
    )


def _unit_py(v: list[float]) -> list[float]:
    n = sum(x * x for x in v) ** 0.5
    return [x / n for x in v] if n > 0 else v


def unit_vec(col: Column) -> Column:
    """L2-normalize a float array in codegen (transform + aggregate)."""
    sq = F.aggregate(
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(sq)
    return F.when(
        nrm > 0, F.transform(col, lambda x: x.cast("double") / nrm)
    ).otherwise(F.transform(col, lambda x: x.cast("double")))


def kmeans_fit(
    df: DataFrame,
    k: int | None = None,
    seeds: list[tuple[int, list[float]]] | DataFrame | None = None,
    max_iter: int = 10,
    tol: float = 1e-4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spherical: bool = False,
) -> tuple[list[tuple[int, list[float]]], int]:
    """Full Lloyd loop: iterate assignment + fixed-point update until the
    max per-dimension centroid shift falls under ``tol`` or ``max_iter``
    passes. Returns (centroids, iterations-run).

    The driver holds only the k×dim centroid matrix between passes (each
    pass collects k·dim long-form rows — bounded, never data-sized); the
    corpus itself is scanned once per iteration with zero shuffles for
    assignment and an O(partitions·k·dim) exchange for the update. A
    cluster left empty by an iteration keeps its previous centroid
    (standard Lloyd practice; dropping it would shrink k mid-fit).

    ``spherical=True`` fits spherical k-means — vectors and centroids are
    L2-normalized, so squared-L2 assignment is monotonically equivalent
    to max-cosine (‖a−b‖² = 2−2·cos for unit vectors). Use this when the
    downstream metric is cosine (IVF probe, semantic dedup).
    """
    if seeds is None:
        if k is None:
            raise ValueError("kmeans_fit needs k or explicit seeds")
        seeds = seed_centroids(df, k, id_col, vec_col)
    if isinstance(seeds, DataFrame):
        seeds = [(r["cid"], list(r["cvec"])) for r in seeds.collect()]
    cents = [(int(c), [float(x) for x in v]) for c, v in seeds]
    if spherical:
        df = df.select(
            F.col(id_col), unit_vec(F.col(vec_col)).alias(vec_col)
        )
        cents = [(c, _unit_py(v)) for c, v in cents]

    iters = 0
    for iters in range(1, max_iter + 1):
        assigned = assign_clusters(df, cents, id_col, vec_col)
        rows = update_centroid_dims(assigned, vec_col).collect()
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["dim"]] = r["centroid_val"]
        shift = 0.0
        nxt = []
        for cid, old in cents:
            dims = by_cid.get(cid)
            if dims is None:  # emptied cluster: keep previous centroid
                nxt.append((cid, old))
                continue
            vec = [dims[d] for d in range(len(old))]
            if spherical:
                vec = _unit_py(vec)
            shift = max(
                shift, max(abs(a - b) for a, b in zip(vec, old))
            )
            nxt.append((cid, vec))
        cents = nxt
        if shift <= tol:
            break
    return cents, iters

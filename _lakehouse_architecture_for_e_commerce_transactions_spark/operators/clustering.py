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

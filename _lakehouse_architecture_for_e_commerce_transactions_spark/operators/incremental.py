"""Incremental aggregate maintenance (materialized-view delta merge).

The 100 TB shape: a grouped aggregate (cnt + sum per key) over a fact
table is kept as a materialized table; when a change batch arrives
(inserts / deletes / updates with pre- and post-images — the CDC feed
shape of `sources/snapshots.table_changes` and the reference's MERGE
source, `src/glue_scripts/orders_etl.py:67-71`), the aggregate is
advanced by aggregating ONLY the batch and merging key-wise deltas into
the stored aggregate — the fact table is never rescanned. Cost is
O(|batch|) + one join on the (dimension-sized) aggregate key space,
versus O(|fact|) for recompute.

COUNT and SUM are self-maintainable under inserts AND deletes (no
auxiliary state needed); sums ride the repo's integer fixed-point
discipline (``plans/catalog.money_sum``) so delta addition is exact and
order-independent — maintained state never drifts from recompute, which
is exactly what the oracle asserts. Updates that MOVE a row between
groups must arrive as delete+insert pairs (the standard IVM contract);
same-group updates carry old/new images.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fx(col: str, scale: int):
    """The module's single fixed-point quantization: floor(x·scale+0.5)
    as int64 — shared by every maintained aggregate so SUM and MIN/MAX
    can never quantize the same CDC feed differently."""
    return F.floor(F.col(col) * scale + F.lit(0.5)).cast("long")


def agg_deltas(
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    old_val: str = "old_val",
    new_val: str = "new_val",
    scale: int = 100,
) -> DataFrame:
    """Per-key (d_cnt, d_sum_scaled) from a change batch.

    ``changes`` rows: key columns + ``op`` ∈ {'I','U','D'} + pre/post
    images (``old_val`` meaningful for U/D, ``new_val`` for I/U).
    Values are quantized to ``scale`` fixed-point BEFORE differencing so
    the delta is the exact integer the recomputed aggregate would move
    by. One shuffle, on the batch only.
    """
    fx_new = _fx(new_val, scale)
    fx_old = _fx(old_val, scale)
    d_cnt = (
        F.when(F.col(op_col) == "I", F.lit(1))
        .when(F.col(op_col) == "D", F.lit(-1))
        .otherwise(F.lit(0))
    )
    d_sum = (
        F.when(F.col(op_col) == "I", fx_new)
        .when(F.col(op_col) == "D", -fx_old)
        .otherwise(fx_new - fx_old)
    )
    return (
        changes.select(
            *keys, d_cnt.alias("_dc"), d_sum.alias("_ds")
        )
        .groupBy(*keys)
        .agg(
            F.sum("_dc").alias("d_cnt"),
            F.sum("_ds").alias("d_sum_scaled"),
        )
    )


def apply_agg_deltas(
    base_agg: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    cnt_col: str = "cnt",
    sum_scaled_col: str = "sum_scaled",
) -> DataFrame:
    """Merge key-wise deltas into a stored (cnt, sum_scaled) aggregate.

    Full-outer on the key: new keys appear, keys whose count reaches
    zero disappear (their sum is necessarily zero too under exact
    integer arithmetic). Both sides are aggregate-table-sized — the
    fact table is not involved.
    """
    merged = base_agg.join(deltas, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col(cnt_col), F.lit(0))
            + F.coalesce(F.col("d_cnt"), F.lit(0))
        ).alias(cnt_col),
        (
            F.coalesce(F.col(sum_scaled_col), F.lit(0))
            + F.coalesce(F.col("d_sum_scaled"), F.lit(0))
        ).alias(sum_scaled_col),
    )
    return merged.filter(F.col(cnt_col) > 0)


def maintain_join_view(
    view: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str],
    dim_updates: DataFrame | None = None,
    fact_inserts: DataFrame | None = None,
    fact_delete_keys: DataFrame | None = None,
    dim_current: DataFrame | None = None,
) -> DataFrame:
    """Incrementally maintain a materialized fact⋈dim enrichment view.

    The production shape: an enriched fact table (fact columns +
    denormalized dimension attributes) must track three change kinds
    without re-running the big join —

    * dimension updates (late-arriving attribute changes): PATCH the
      view in place — key-wise join of the view with the (small) update
      set, coalescing each dimension column. No fact scan: the view
      already holds every affected row.
    * fact deletes: anti-join on the fact key.
    * fact inserts: only the NEW rows join the current dimension.

    Cost: O(|view| patch join, key-wise) + O(|inserts| ⋈ dim) +
    O(|deletes|) — the delta rules of incremental view maintenance
    specialized to the enrichment join, where Δdim ⋈ fact never needs
    the fact table because the view itself is that join's materialized
    result. Updates must not change a fact row's dimension KEY (model
    key moves as fact delete+insert, the standard IVM contract).
    """
    out = view
    if dim_updates is not None:
        upd = dim_updates.select(
            dim_key, *[F.col(c).alias(f"_u_{c}") for c in dim_cols]
        )
        out = out.join(upd, dim_key, "left").select(
            *[c for c in view.columns if c not in dim_cols],
            *[
                F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c)
                for c in dim_cols
            ],
        )
    if fact_delete_keys is not None:
        out = out.join(fact_delete_keys, fact_key, "left_anti")
    if fact_inserts is not None:
        if dim_current is None:
            raise ValueError("fact_inserts requires dim_current")
        fresh = fact_inserts.join(
            dim_current.select(dim_key, *dim_cols), dim_key
        ).select(*out.columns)
        out = out.unionByName(fresh)
    return out


def maintain_min_max(
    base_agg: DataFrame,
    changes: DataFrame,
    fact_final: DataFrame,
    keys: list[str],
    val: str,
    op_col: str = "op",
    old_val: str = "old_val",
    new_val: str = "new_val",
    scale: int = 100,
) -> DataFrame:
    """Incrementally maintain per-key MIN/MAX — the textbook
    NON-self-maintainable aggregate: inserts only ever tighten the
    envelope (new_min = min(old_min, batch_min) — O(batch)), but a
    delete that removes the CURRENT extremum needs the second-best
    value, which the aggregate doesn't hold. This operator takes the
    standard hybrid: groups whose removed values stay strictly INSIDE
    the stored envelope merge deltas like SUM/COUNT; groups whose
    delete/update-old touches an endpoint are recomputed from
    ``fact_final`` — but only those groups' rows, via a key semi-join
    (AQE broadcasts the unsafe-key set), so rescan cost follows the
    affected groups, not the table.

    ``base_agg``: keys + ``min_scaled``/``max_scaled`` (fixed-point
    longs, same quantization as ``agg_deltas``). ``fact_final``: the
    post-change fact rows (keys + ``val`` double). Returns the new
    keys + min_scaled/max_scaled; keys with no surviving rows drop out.
    """
    fx_new = _fx(new_val, scale)
    fx_old = _fx(old_val, scale)
    fx_val = _fx(val, scale)
    added = F.when(F.col(op_col).isin("I", "U"), fx_new)
    removed = F.when(F.col(op_col).isin("D", "U"), fx_old)
    batch = changes.groupBy(*keys).agg(
        F.min(added).alias("i_min"),
        F.max(added).alias("i_max"),
        F.min(removed).alias("r_min"),
        F.max(removed).alias("r_max"),
    )
    j = base_agg.join(batch, keys, "full_outer")
    # safe ⇔ every removed value sits strictly inside the stored
    # envelope (endpoints untouched, second-best irrelevant); a key
    # absent from base (insert-only new group) is trivially safe
    safe = (
        F.col("r_min").isNull()
        | (
            F.col("min_scaled").isNotNull()
            & (F.col("r_min") > F.col("min_scaled"))
            & (F.col("r_max") < F.col("max_scaled"))
        )
    )
    # merged feeds three branches (fast filter, unsafe keys, rescan
    # semi-join); it is aggregate+batch-scale, so a lazy checkpoint
    # shares the changes aggregation and the full-outer join instead of
    # re-running them per branch
    merged = j.withColumn("_safe", safe).localCheckpoint(eager=False)
    fast = merged.filter(F.col("_safe")).select(
        *keys,
        F.least(
            F.coalesce(F.col("min_scaled"), F.col("i_min")),
            F.coalesce(F.col("i_min"), F.col("min_scaled")),
        ).alias("min_scaled"),
        F.greatest(
            F.coalesce(F.col("max_scaled"), F.col("i_max")),
            F.coalesce(F.col("i_max"), F.col("max_scaled")),
        ).alias("max_scaled"),
    ).filter(F.col("min_scaled").isNotNull())
    unsafe_keys = merged.filter(~F.col("_safe")).select(*keys)
    rescan = (
        fact_final.join(unsafe_keys, keys, "left_semi")
        .groupBy(*keys)
        .agg(
            F.min(fx_val).alias("min_scaled"),
            F.max(fx_val).alias("max_scaled"),
        )
        # groups whose surviving values are all NULL drop out, matching
        # the fast path's contract: the maintained envelope tracks
        # non-NULL values only, whichever path classified the group
        .filter(F.col("min_scaled").isNotNull())
    )
    return fast.unionByName(rescan)


def maintain_topk(
    stored: DataFrame,
    changes: DataFrame,
    fact_final: DataFrame,
    keys: list[str],
    val: str,
    k: int,
    buffer: int = 2,
    op_col: str = "op",
    old_val: str = "old_val",
    new_val: str = "new_val",
    scale: int = 100,
) -> DataFrame:
    """Incrementally maintain per-key TOP-K values (the materialized
    leaderboard) with a ``buffer`` of extra ranks — top-k is not
    self-maintainable under deletes (removing the k-th value needs the
    (k+1)-th), so the stored state keeps the top ``k + buffer`` values
    per key and the maintenance pass is:

    * multiset-subtract the batch's removed values from the stored rows
      (occurrence-paired anti-join — duplicates removed one-for-one;
      removals below the buffer aren't stored and correctly no-op);
    * union the batch's added values; re-rank; keep ``k + buffer``.

    The result's top-k is PROVABLY correct while a key retains >= k
    stored rows; keys squeezed below k by removals (buffer exhausted —
    values beyond it are unknown) are rebuilt from ``fact_final`` via a
    key semi-join, so rescan cost follows the squeezed keys only.

    ``stored``: keys + ``val_scaled`` rows (<= k+buffer per key, the
    fixed-point longs of ``_fx``). Returns the same shape. Read the
    top-k off it with ``topk_rows``. Output is deterministic as a
    multiset per key — equal values are interchangeable, so
    (key, pos, val) rows are identical whichever source row took which
    pos.
    """
    fx_new = _fx(new_val, scale)
    fx_old = _fx(old_val, scale)
    added = changes.filter(F.col(op_col).isin("I", "U")).select(
        *keys, fx_new.alias("val_scaled")
    )
    removed = changes.filter(F.col(op_col).isin("D", "U")).select(
        *keys, fx_old.alias("val_scaled")
    )
    occ = Window.partitionBy(*keys, "val_scaled").orderBy(F.lit(1))
    sr = stored.withColumn("occ", F.row_number().over(occ))
    rr = removed.withColumn("occ", F.row_number().over(occ))
    survived = sr.join(
        rr, [*keys, "val_scaled", "occ"], "left_anti"
    ).select(*keys, "val_scaled")
    merged = survived.unionByName(added)
    rk = Window.partitionBy(*keys).orderBy(F.col("val_scaled").desc())
    ranked = merged.withColumn("rk", F.row_number().over(rk))
    kept = ranked.filter(F.col("rk") <= k + buffer)
    counts = kept.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    # keys that saw a removal AND now hold < k rows can no longer prove
    # their top-k; anything else is safe (insert-only keys can only have
    # grown, and a key with >= k rows has its top-k inside the buffer).
    # Join FROM the removal keys: a key whose stored rows were ALL
    # removed has no `kept` row at all and must still rescan (its
    # below-buffer survivors are unknown).
    squeezed = (
        removed.select(*keys)
        .distinct()
        .join(counts, keys, "left")
        .filter(F.coalesce(F.col("_n"), F.lit(0)) < k)
        .select(*keys)
    )
    safe = kept.join(squeezed, keys, "left_anti").select(
        *keys, "val_scaled"
    )
    rescan = (
        fact_final.join(squeezed, keys, "left_semi")
        .select(*keys, _fx(val, scale).alias("val_scaled"))
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= k + buffer)
        .select(*keys, "val_scaled")
    )
    return safe.unionByName(rescan)


def topk_rows(stored: DataFrame, keys: list[str], k: int) -> DataFrame:
    """(keys..., pos, val_scaled) — the top-k leaderboard view of the
    maintained state."""
    w = Window.partitionBy(*keys).orderBy(F.col("val_scaled").desc())
    return (
        stored.withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= k)
        .select(*keys, "pos", "val_scaled")
    )

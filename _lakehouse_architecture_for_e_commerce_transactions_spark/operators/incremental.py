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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    fx_new = F.floor(F.col(new_val) * scale + F.lit(0.5)).cast("long")
    fx_old = F.floor(F.col(old_val) * scale + F.lit(0.5)).cast("long")
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

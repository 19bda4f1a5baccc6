"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row (key, ts) find the most recent right row (key, ts') with
ts' <= ts. Implemented as the union-window algorithm, not a fan-out join:

1. tag left and right rows, union them on (key, ts)
2. one shuffle: window partitioned by key, ordered by (ts, right-first)
3. ``last(right_payload, ignorenulls=True)`` over the unbounded-preceding
   frame carries the latest right row forward
4. keep left rows

Cost is a single hash exchange + per-key sort — at 100 TB this beats the
join-then-rank formulation (which fans out |left| × |right-per-key| rows
before pruning). Ties (right ts == left ts) match, like SQL ASOF ``<=``;
right-side duplicates at the same ts resolve to the greatest tiebreak
column value, so results are deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + latest ``right_payload`` columns
    (null when no right row at or before the left timestamp exists)."""
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(right_payload)

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    # right rows (is_left=0) sort before left rows at equal ts so ties match
    # (ASOF <=); among same-ts right rows the greatest tiebreak wins (last in
    # frame). Tiebreak must come AFTER is_left or left rows (null payload)
    # would sort before their same-ts right matches.
    order = [F.col("_asof_ts").asc(), F.col("_is_left").asc()]
    if tiebreak:
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_is_left"),
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(c)
            for c in payload
        ],
    )
    return carried.filter(F.col("_is_left") == 1).drop("_is_left")

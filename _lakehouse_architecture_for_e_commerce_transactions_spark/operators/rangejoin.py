"""Range (interval) join: left rows matched to right intervals.

Naive formulation — ``l.ts BETWEEN r.start AND r.end`` — plans as a
(broadcast) nested-loop join: O(|L|·|R|) comparisons, a non-starter at
scale. The scalable shape *bucketizes time*: every interval is exploded to
the fixed-width buckets it overlaps, points map to their bucket, and the
join becomes a hash equi-join on (key, bucket) followed by the exact
BETWEEN filter. Cost: |R| × avg-buckets-per-interval replicated rows, one
hash shuffle, no quadratic blowup. Bucket width should be chosen near the
median interval length (one knob, same trade-off as any spatial grid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "_rj_bucket"


def _bucket_of(ts: Column, width_s: int) -> Column:
    return (F.unix_timestamp(ts) / width_s).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bucket_width_s: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join left points to right intervals (optionally also equi-keyed by
    ``on``): all left columns + all right columns for each containment.

    ``how='inner'`` only; outer variants compose from an anti join.
    """
    b_lo = _bucket_of(F.col(right_start), bucket_width_s)
    b_hi = _bucket_of(F.col(right_end), bucket_width_s)
    r = right.withColumn(
        _BUCKET, F.explode(F.sequence(b_lo, b_hi))
    )
    l = left.withColumn(_BUCKET, _bucket_of(F.col(left_ts), bucket_width_s))
    keys = [_BUCKET] if on is None else [on, _BUCKET]
    return (
        l.join(r, on=keys, how=how)
        .filter(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) <= F.col(right_end))
        )
        .drop(_BUCKET)
    )

"""Gap-based sessionization over event streams (batch form).

Classic two-window construction, one shuffle total (both windows share the
same partitioning + ordering, so Catalyst plans a single sort + exchange):

1. lag(ts) per key ordered by (ts, tiebreak) → gap to previous event
2. is_new_session = gap is null or gap > timeout
3. running sum of is_new_session → session index per key

The streaming twin of this operator is ``F.session_window`` /
``applyInPandasWithState`` in streaming/; this batch form is
oracle-checkable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str,
) -> DataFrame:
    """Adds ``session_id`` (1-based per key) to each event row."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(tiebreak))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_id", F.sum(new_session).over(wsum))


def session_stats(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str,
) -> DataFrame:
    """Per-session rollup: event count and span in seconds."""
    s = sessionize(events, key, ts_col, gap_seconds, tiebreak)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.unix_timestamp(F.col(ts_col)))
            - F.min(F.unix_timestamp(F.col(ts_col)))
        ).alias("span_s"),
    )

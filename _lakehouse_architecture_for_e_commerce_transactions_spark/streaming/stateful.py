"""Custom stateful streaming operators.

* ``stream_dedup`` — exactly-once-per-key emission within a watermark
  (Spark's state-store-backed ``dropDuplicatesWithinWatermark``): the
  streaming twin of the batch PK dedup in the ETL path.
* ``running_totals`` — per-key running aggregates maintained across
  micro-batches with ``applyInPandasWithState`` (GroupState), the escape
  hatch for operators Spark's built-in streaming aggs can't express.
  The batch function is self-contained (cloudpickle-by-value; executors
  need no PYTHONPATH setup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
    ]
)


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark window; state for a
    key is dropped once the watermark passes it, so state size is bounded by
    arrival rate × watermark, not by history."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key event count + value sum carried across micro-batches."""

    def update(key, pdfs, state):  # self-contained: no module globals
        n = 0
        total = 0.0
        if state.exists:
            n, total = state.get
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as _pd

        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    renamed = events.select(
        events[key_col].alias("user_id"), events[value_col].alias("value")
    )
    return renamed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

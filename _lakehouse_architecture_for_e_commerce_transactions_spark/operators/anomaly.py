"""Rolling z-score anomaly flags over an event stream — the monitoring
primitive for metric streams (order values, sensor feeds): flag a value
deviating more than z standard deviations from ITS OWN trailing window.

The z-test runs entirely in integers. With S = Σx, Q = Σx² over the n
trailing values (x in centi-units):

    |x − S/n| > z·σ   ⇔   (n·x − S)² > z²·(n·Q − S²)

— both sides are exact BIGINT products, so the flag is a pure function
of the row set (no float, no partitioning drift) and any engine agrees.
Centi-unit scaling keeps every intermediate inside int64 for
n ≤ ~100 window rows with |value| ≤ ~10⁵ (dominant term n·Σx² ≈
n²·(100·v)²); widen by lowering the scale if the domain is larger.

Plan: one window over (partition key, time order) with two running sums
— a single Exchange on the key, no self-join, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore_flags(
    df: DataFrame,
    key: str,
    order_by: list[str],
    value: str,
    window_rows: int = 20,
    min_rows: int = 10,
    z: int = 2,
) -> DataFrame:
    """Appends (n_window, is_anomaly): is_anomaly is true when the value
    deviates > z·σ from the mean of the ``window_rows`` PRECEDING rows
    (the current row never contaminates its own baseline); rows with
    fewer than ``min_rows`` trailing samples are never flagged."""
    w = (
        Window.partitionBy(key)
        .orderBy(*order_by)
        .rowsBetween(-window_rows, -1)
    )
    x = F.floor(F.col(value) * 100 + F.lit(0.5)).cast("long")
    # one select evaluates the three running aggregates in a single
    # Window node (re-deriving them per consumer expression would stack
    # a second Window with duplicated aggregate columns)
    with_sums = df.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.sum(x).over(w).alias("_s"),
        F.sum(x * x).over(w).alias("_q"),
    )
    n, s, q = F.col("n_window"), F.col("_s"), F.col("_q")
    dev = n * x - s
    bound = F.lit(z * z) * (n * q - s * s)
    return with_sums.withColumn(
        "is_anomaly",
        F.when(n < min_rows, F.lit(False)).otherwise(dev * dev > bound),
    ).drop("_s", "_q")

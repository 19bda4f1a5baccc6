"""Small operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster parallelism)
    before a fan-out-heavy stage (explode, cross join, wide per-row compute).

    A small parquet file arrives as 1-2 input splits; an explode that
    multiplies rows 100× would then run on 2 cores while 30 idle. At real
    scale inputs already have many splits and this is a no-op — the check is
    on the *current* partition count, so no gratuitous shuffle is added.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

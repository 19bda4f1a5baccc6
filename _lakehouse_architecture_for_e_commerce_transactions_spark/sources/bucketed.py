"""Bucketed tables: co-located joins without per-query shuffles.

A fact table joined repeatedly on the same key (lineitem⋈orders on orderkey,
the reference's FK probes at warehouse scale) should pay the partitioning
shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions files so a
sort-merge join of two tables bucketed on the same key with the same bucket
count needs no Exchange at query time. At 100 TB that turns every
fact-to-fact join from a full network shuffle into a local merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets lets the merge join skip its sort too.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(n_buckets, *cols)
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a shuffle-free sort-merge join (verify: no Exchange in the plan).
    The merge hint stops AQE from 'helpfully' broadcasting a small side in
    tests — at real scale neither side is broadcastable anyway."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    keys = [on] if isinstance(on, str) else list(on)
    return lt.join(rt, on=keys, how=how)

"""Incremental materialized aggregate maintenance.

Dashboards over a 100 TB fact table cannot re-aggregate on every query OR
every ingest batch. For **additive** aggregates (count, sum — and avg as
sum/count at read time) the summary after a new batch is
``old summary ⊎ batch partial``, touching only the groups present in the
batch: aggregate the batch, join it with the current summary rows for
those groups, add, and MERGE. Work scales with batch size, never with
table size — the same contract as Delta Live Tables / incremental view
maintenance in the literature.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    merge as M,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import TableSpec


def _summary_spec(keys: Sequence[str], template: DataFrame) -> TableSpec:
    assert len(keys) == 1, "composite summary keys: pre-concat into one column"
    return TableSpec(
        name="summary", schema=template.schema, primary_key=keys[0]
    )


def batch_partial(
    batch: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]
    return batch.groupBy(*keys).agg(*aggs)


def update_summary(
    spark: SparkSession,
    batch: DataFrame,
    summary_path: str,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> None:
    """Fold one ingest batch into the summary table at ``summary_path``."""
    partial = batch_partial(batch, keys, sum_cols)
    spec = _summary_spec(keys, partial)
    if not M.table_exists(spark, summary_path):
        M.merge_upsert(spark, partial, summary_path, spec)
        return
    current = spark.read.parquet(summary_path)
    key = keys[0]
    # only groups present in the batch are read-modified (broadcast semi
    # scope), everything else is untouched on disk
    touched = current.join(
        F.broadcast(partial.select(key)), on=key, how="left_semi"
    )
    metric_cols = [c for c in partial.columns if c != key]
    merged_groups = (
        partial.alias("b")
        .join(touched.alias("t"), on=key, how="left")
        .select(
            F.col(key),
            *[
                (
                    F.col(f"b.{c}") + F.coalesce(F.col(f"t.{c}"), F.lit(0))
                ).alias(c)
                for c in metric_cols
            ],
        )
    )
    M.merge_upsert(spark, merged_groups, summary_path, spec)


def read_summary(
    spark: SparkSession, summary_path: str, avg_of: Sequence[str] = ()
) -> DataFrame:
    """Summary with derived averages (avg = sum/count at read time — avg is
    not additive, its parts are)."""
    df = spark.read.parquet(summary_path)
    for c in avg_of:
        df = df.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("n_rows"))
    return df

"""Structured Streaming ingest: the reference's event-driven envelope,
Spark-native (SURVEY.md §2.9).

Reference: S3 ObjectCreated → SQS → availability Lambda → Step Functions →
batch Glue jobs. Rebuild: a file-source stream discovers new CSVs per
micro-batch; ``foreachBatch`` applies the same validate→dedup→merge pipeline
with exactly-once bookkeeping from the checkpoint (replaces SQS redelivery),
and ``Trigger.AvailableNow`` reproduces the batch-per-arrival semantics of
the availability gate.

At scale: file listing is incremental (``maxFilesPerTrigger`` bounds batch
size), state is only the file log (no aggregation state), and MERGE
idempotence makes replay after failure safe.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    dedup as D,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    merge as M,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    validation as V,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources.rejects import (
    write_rejects,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import TableSpec


def stream_ingest(
    spark: SparkSession,
    spec: TableSpec,
    raw_dir: str,
    warehouse_path: str,
    rejected_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    on_batch: Callable[[int, int, int], None] | None = None,
) -> StreamingQuery:
    """Stream raw CSVs from ``raw_dir`` into the curated table.

    ``on_batch(batch_id, n_valid, n_rejected)`` is an observability hook
    (the SNS-notification slot in the reference)."""
    reader = (
        spark.readStream.schema(spec.schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.csv(raw_dir)

    table_path = f"{warehouse_path}/{spec.name}"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        res = V.validate(batch_df, spec, cache=True)
        valid = D.dedup_deterministic(res.valid, [spec.primary_key])
        M.merge_upsert(spark, valid, table_path, spec)
        n_rej = res.rejected.count()
        if n_rej:
            write_rejects(
                res.rejected, rejected_path, spec.name, f"batch_{batch_id}"
            )
        if on_batch is not None:
            on_batch(batch_id, valid.count(), n_rej)
        res.unpersist()  # bounded executor memory across micro-batches

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window streaming aggregation with late-data handling — the
    streaming operator surface (watermark + windowed agg) the reference
    lacks; works on both batch and streaming frames."""
    from pyspark.sql import functions as F

    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )

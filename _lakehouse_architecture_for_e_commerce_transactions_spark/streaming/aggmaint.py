"""Streaming materialized-view maintenance: a grouped (cnt, sum)
aggregate kept current from a CDC change stream, exactly-once.

Each micro-batch advances the stored aggregate with
``operators/incremental.agg_deltas`` + ``apply_agg_deltas`` — O(batch)
work plus an aggregate-key-space join, never a fact rescan — and
publishes the new state atomically via ``sources/snapshots.commit``.
State lives in the snapshot TABLE, not in Spark streaming state: the
checkpoint stays tiny however large the key space grows, the view is
queryable/time-travelable like any other table, and a restarted stream
resumes from the table head.

Exactly-once across checkpoint replays: every committed state carries
the producing ``batch_id`` in a ``_last_batch`` column (on data rows AND
on one always-present marker row with a NULL key and cnt = 0, so the
watermark survives even a state with zero live groups). Because the
marker travels inside the same atomic snapshot commit as the data, a
replayed batch sees ``batch_id <= _last_batch`` and skips — there is no
window where state and watermark disagree, the failure mode of keeping
the applied-batch marker in a side file.

This is the streaming face of the same contract the batch operator
proves by property test (tests/test_incremental.py): maintained state
is bit-equal to a recompute of the post-change data.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    incremental as INC,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)

CHANGE_STREAM_SCHEMA = StructType(
    [
        StructField("k", StringType(), False),
        StructField("op", StringType(), False),
        StructField("old_val", DoubleType(), True),
        StructField("new_val", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("k", StringType(), True),
        StructField("cnt", LongType(), True),
        StructField("sum_scaled", LongType(), True),
        StructField("_last_batch", LongType(), True),
    ]
)


def read_maintained_agg(spark: SparkSession, table_path: str) -> DataFrame:
    """The queryable view of the maintained aggregate (marker row and
    bookkeeping column stripped)."""
    return (
        S.read(spark, table_path)
        .filter(F.col("cnt") > 0)
        .select("k", "cnt", "sum_scaled")
    )


def stream_agg_maintenance(
    spark: SparkSession,
    raw_dir: str,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    on_batch: Callable[[int, int], None] | None = None,
) -> StreamingQuery:
    """Maintain the (k → cnt, sum) aggregate from change-row CSVs
    (``k, op ∈ {I,U,D}, old_val, new_val``) arriving in ``raw_dir``.

    ``on_batch(batch_id, n_changes)`` is the observability hook (called
    only for applied, non-replayed batches).
    """
    reader = (
        spark.readStream.schema(CHANGE_STREAM_SCHEMA)
        .option("header", True)
        .csv(raw_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            cur = S.read(spark, table_path)
            last = cur.agg(F.max("_last_batch")).first()[0]
            state = cur.filter(F.col("k").isNotNull()).select(
                "k", "cnt", "sum_scaled"
            )
        except FileNotFoundError:
            last = None
            state = spark.createDataFrame([], _STATE_SCHEMA).select(
                "k", "cnt", "sum_scaled"
            )
        if last is not None and batch_id <= last:
            return  # checkpoint replay of an already-published batch
        n_changes = batch_df.count()
        if n_changes:
            deltas = INC.agg_deltas(batch_df, ["k"])
            state = INC.apply_agg_deltas(state, deltas, ["k"])
        marker = spark.createDataFrame(
            [(None, 0, 0, batch_id)], _STATE_SCHEMA
        )
        out = state.withColumn(
            "_last_batch", F.lit(batch_id).cast("long")
        ).unionByName(marker)
        S.commit(spark, out, table_path, mode="overwrite")
        if on_batch is not None:
            on_batch(batch_id, n_changes)

    writer = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

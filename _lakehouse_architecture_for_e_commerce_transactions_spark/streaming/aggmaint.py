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


MIXED_CHANGE_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),  # DU | FI | FD
        StructField("fact_key", LongType(), True),
        StructField("dim_key", LongType(), True),
        StructField("val", DoubleType(), True),
        StructField("attr", StringType(), True),
    ]
)

_DIM_SCHEMA = StructType(
    [
        StructField("dim_key", LongType(), True),
        StructField("attr", StringType(), True),
        StructField("_last_batch", LongType(), True),
    ]
)

_VIEW_SCHEMA = StructType(
    [
        StructField("fact_key", LongType(), True),
        StructField("dim_key", LongType(), True),
        StructField("val", DoubleType(), True),
        StructField("attr", StringType(), True),
        StructField("_last_batch", LongType(), True),
    ]
)


def _table_state(spark, path, schema, cols):
    """(state_df_without_bookkeeping, last_applied_batch | None)."""
    try:
        cur = S.read(spark, path)
        last = cur.agg(F.max("_last_batch")).first()[0]
        return cur.filter(
            F.col(cols[0]).isNotNull()
        ).select(*cols), last
    except FileNotFoundError:
        return spark.createDataFrame([], schema).select(*cols), None


def _commit_with_marker(spark, df, path, batch_id, marker_row, schema):
    marker = spark.createDataFrame([marker_row], schema)
    out = df.withColumn(
        "_last_batch", F.lit(batch_id).cast("long")
    ).unionByName(marker)
    S.commit(spark, out, path, mode="overwrite")


def read_maintained_view(spark, view_path: str) -> DataFrame:
    return (
        S.read(spark, view_path)
        .filter(F.col("fact_key").isNotNull())
        .select("fact_key", "dim_key", "val", "attr")
    )


def read_maintained_dim(spark, dim_path: str) -> DataFrame:
    return (
        S.read(spark, dim_path)
        .filter(F.col("dim_key").isNotNull())
        .select("dim_key", "attr")
    )


def stream_join_view_maintenance(
    spark: SparkSession,
    raw_dir: str,
    dim_path: str,
    view_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming IVM for a fact⋈dim enrichment view: one change feed
    (``kind`` ∈ DU dim-upsert / FI fact-insert / FD fact-delete) keeps
    BOTH the dimension table and the enriched view current, exactly-once.

    Per batch, dimension first: DU rows upsert the dim snapshot table.
    Then the view: DU rows PATCH enriched rows key-wise (the view is the
    materialized Δdim⋈fact — no fact table exists to rescan), FD rows
    anti-join, FI rows join the just-updated dimension and append.

    Each table carries its own ``_last_batch`` watermark inside its
    atomic commit, so a crash BETWEEN the two commits replays into
    "dim skips, view applies" — the pair reconverges with no
    double-application. Commit order (dim before view) guarantees the
    view's new facts always see the batch's own dimension updates.
    """
    reader = (
        spark.readStream.schema(MIXED_CHANGE_SCHEMA)
        .option("header", True)
        .csv(raw_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        du = batch_df.filter(F.col("kind") == "DU").select(
            "dim_key", "attr"
        )
        fi = batch_df.filter(F.col("kind") == "FI").select(
            "fact_key", "dim_key", "val"
        )
        fd = batch_df.filter(F.col("kind") == "FD").select("fact_key")

        dim, dim_last = _table_state(
            spark, dim_path, _DIM_SCHEMA, ["dim_key", "attr"]
        )
        if dim_last is None or batch_id > dim_last:
            upd = du.withColumnRenamed("attr", "_new")
            dim_next = (
                dim.join(upd, "dim_key", "full_outer")
                .select(
                    "dim_key",
                    F.coalesce(F.col("_new"), F.col("attr")).alias(
                        "attr"
                    ),
                )
            )
            _commit_with_marker(
                spark, dim_next, dim_path, batch_id,
                (None, None, batch_id), _DIM_SCHEMA,
            )

        view, view_last = _table_state(
            spark, view_path, _VIEW_SCHEMA,
            ["fact_key", "dim_key", "val", "attr"],
        )
        if view_last is None or batch_id > view_last:
            dim_now = read_maintained_dim(spark, dim_path)
            patched = (
                view.join(
                    du.withColumnRenamed("attr", "_new"),
                    "dim_key",
                    "left",
                )
                .select(
                    "fact_key",
                    "dim_key",
                    "val",
                    F.coalesce(F.col("_new"), F.col("attr")).alias(
                        "attr"
                    ),
                )
                .join(fd, "fact_key", "left_anti")
            )
            fresh = fi.join(dim_now, "dim_key").select(
                "fact_key", "dim_key", "val", "attr"
            )
            _commit_with_marker(
                spark, patched.unionByName(fresh), view_path, batch_id,
                (None, None, None, None, batch_id), _VIEW_SCHEMA,
            )
        batch_df.unpersist()

    writer = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

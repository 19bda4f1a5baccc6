"""Maintained aggregates DRIVEN BY a table's change feed.

`streaming/aggmaint.py` keeps per-key aggregates exactly-once current
from a change-row transport (CSV drops); `streaming/cdf.py` turns a
snapshot table's commits into change rows. This module is the jack
between them: point a maintenance twin AT A TABLE and the aggregate
tracks every committed insert, delete, and update — the
materialized-view-over-Delta shape (`CREATE MATERIALIZED VIEW ... AS
SELECT k, min(v), max(v) FROM t GROUP BY k`, kept fresh incrementally),
with no rescan of the source table and no bespoke feed-writer.

Change-type mapping: ``insert → I(new)``, ``delete → D(old)``,
``update_preimage → D(old)`` + ``update_postimage → I(new)`` — an
update is algebraically remove-then-add to every maintained aggregate
here, so splitting the images loses nothing. Partition-rewrite commits
arrive as carried-row D/I pairs (the feed's documented coarseness);
the maintenance treats them as no-op churn on the touched keys —
correct, costed by rewrite size, not table size.

Exactly-once composes: the CDF source replays a checkpointed version
range deterministically from immutable manifests, and the maintenance
sink's batch-id guard turns replays into no-ops — end-to-end each
commit affects the aggregate exactly once.

The order-strict EWMA twin is deliberately NOT wired: a change feed
carries no event-time ordering contract across commits, and retrofitting
a recurrence is the batch job's job (see ``stream_ewma_maintenance``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming import (
    aggmaint as AM,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.cdf import (
    read_changes_stream,
)

_ADDS = ("insert", "update_postimage")


def changes_as_ops(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    val_col: str,
    starting_version: int | str | None = "earliest",
    max_versions_per_trigger: int | None = None,
) -> DataFrame:
    """A snapshot table's change feed re-shaped to the maintenance
    twins' ``CHANGE_STREAM_SCHEMA`` (``k string, op I|D, old_val,
    new_val double``). Key and value casts happen here so any
    key/value column types ride the same downstream core."""
    ch = read_changes_stream(
        spark,
        table_path,
        starting_version=starting_version,
        max_versions_per_trigger=max_versions_per_trigger,
    )
    is_add = F.col("_change_type").isin(*_ADDS)
    v = F.col(val_col).cast("double")
    return ch.select(
        F.col(key_col).cast("string").alias("k"),
        F.when(is_add, F.lit("I")).otherwise(F.lit("D")).alias("op"),
        F.when(~is_add, v).alias("old_val"),
        F.when(is_add, v).alias("new_val"),
    )


def table_minmax_maintenance(
    spark: SparkSession,
    table_path: str,
    fact_path: str,
    state_path: str,
    checkpoint_dir: str,
    key_col: str,
    val_col: str,
    starting_version: int | str | None = "earliest",
    **kw,
) -> StreamingQuery:
    """Per-key MIN/MAX of ``val_col`` grouped by ``key_col``, kept
    current from ``table_path``'s commits. Read the result with
    ``aggmaint.read_maintained_minmax(spark, state_path)``."""
    return AM.stream_minmax_maintenance(
        spark,
        changes_as_ops(
            spark, table_path, key_col, val_col,
            starting_version=starting_version,
        ),
        fact_path,
        state_path,
        checkpoint_dir,
        **kw,
    )


def table_topk_maintenance(
    spark: SparkSession,
    table_path: str,
    fact_path: str,
    state_path: str,
    checkpoint_dir: str,
    key_col: str,
    val_col: str,
    starting_version: int | str | None = "earliest",
    **kw,
) -> StreamingQuery:
    """Per-key TOP-K of ``val_col`` kept current from ``table_path``'s
    commits; read with ``aggmaint.read_maintained_topk``."""
    return AM.stream_topk_maintenance(
        spark,
        changes_as_ops(
            spark, table_path, key_col, val_col,
            starting_version=starting_version,
        ),
        fact_path,
        state_path,
        checkpoint_dir,
        **kw,
    )


def table_agg_maintenance(
    spark: SparkSession,
    table_path: str,
    state_path: str,
    checkpoint_dir: str,
    key_col: str,
    val_col: str,
    starting_version: int | str | None = "earliest",
    **kw,
) -> StreamingQuery:
    """Per-key COUNT/SUM (the self-maintainable aggregates — no fact
    mirror needed) kept current from ``table_path``'s commits; read
    with ``aggmaint.read_maintained_agg``."""
    return AM.stream_agg_maintenance(
        spark,
        changes_as_ops(
            spark, table_path, key_col, val_col,
            starting_version=starting_version,
        ),
        state_path,
        checkpoint_dir,
        **kw,
    )


def table_cm_maintenance(
    spark: SparkSession,
    table_path: str,
    state_path: str,
    checkpoint_dir: str,
    key_col: str,
    val_col: str,
    starting_version: int | str | None = "earliest",
    **kw,
) -> StreamingQuery:
    """Count-Min frequency sketch of ``val_col`` items per ``key_col``
    group, kept current from ``table_path``'s commits. The sketch is
    delete-capable (turnstile counters), so DV deletes and rewrites
    maintain exactly; read with
    ``aggmaint.read_maintained_cm_estimate``."""
    return AM.stream_cm_maintenance(
        spark,
        changes_as_ops(
            spark, table_path, key_col, val_col,
            starting_version=starting_version,
        ),
        state_path,
        checkpoint_dir,
        **kw,
    )

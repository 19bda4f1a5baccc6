"""Slowly-changing-dimension type 2 (SCD2) history merge.

The reference's MERGE (``product_etl.py:65-69`` etc.) is SCD1 — matched
rows are overwritten and history is lost. A lakehouse curating dimensions
for analytics/training usually needs the SCD2 form instead: every change
closes the previous version (``effective_to`` stamped, ``is_current``
false) and opens a new one, so any past state can be reconstructed with
``WHERE effective_from <= t AND (effective_to IS NULL OR effective_to > t)``.

Plan shape (scales to billions of history rows):

* Only **open** rows (``is_current = true``) join the update batch — one
  hash exchange per side on the business key (the join must be full-outer
  to see brand-new keys, and Spark cannot broadcast a full-outer join, so
  both sides shuffle; AQE picks shuffled-hash over sort-merge for the
  small batch side). Closed history is untouched and passes through
  unchanged; store it partitioned by ``is_current`` (or bucket by key) so
  the rewrite only touches the open partition.
* Change detection compares the tracked columns null-safely (``<=>``), so
  ``NULL → value`` and ``value → NULL`` transitions version correctly.
* Updates that change nothing produce no new version (idempotent replay —
  the same batch applied twice converges, which makes driver-level retries
  safe, mirroring ``merge_upsert``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EFFECTIVE_FROM = "effective_from"
EFFECTIVE_TO = "effective_to"
IS_CURRENT = "is_current"


def scd2_init(snapshot: DataFrame, ts_col: str) -> DataFrame:
    """Bootstrap an SCD2 history table from a plain snapshot: every row
    becomes the open version, effective from its own timestamp."""
    return snapshot.select(
        "*",
        F.col(ts_col).alias(EFFECTIVE_FROM),
        F.lit(None).cast("timestamp").alias(EFFECTIVE_TO),
        F.lit(True).alias(IS_CURRENT),
    )


def _changed(tracked: Sequence[str]) -> F.Column:
    """True when any tracked attribute differs (null-safe)."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
    return cond


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: Sequence[str],
    ts_col: str,
    check_updates_unique: bool = True,
) -> DataFrame:
    """Apply an update batch to an SCD2 history table; returns the new
    history (same schema as ``history``).

    ``updates`` carries the business columns plus ``ts_col`` (the change
    timestamp). The batch must hold at most one row per key — pre-collapse
    multi-change batches with ``dedup.latest_by_key`` first (same contract
    as Delta MERGE's unique-source rule, SURVEY.md §7.3).
    ``check_updates_unique=True`` probes that eagerly (one extra execution
    of the updates plan); disable it in pipelines that already guarantee
    uniqueness upstream, mirroring ``merge_upsert(check_source_unique=)``.

    A *stale* update — one whose ``ts_col`` precedes the open version's
    ``effective_from`` — is rejected per-row (the open version is newer
    information): it neither closes the open version (which would write an
    inverted interval with ``effective_to < effective_from``) nor opens a
    new one. Late-arriving history rewrites are a backfill migration, not
    a merge.
    """
    if check_updates_unique:
        dup = (
            updates.groupBy(key)
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
        )
        if dup.limit(1).count() > 0:
            raise ValueError(
                f"scd2_apply: update batch has duplicate {key!r} keys; "
                "collapse to latest-per-key first"
            )

    data_cols = [c for c in history.columns if c not in
                 (EFFECTIVE_FROM, EFFECTIVE_TO, IS_CURRENT)]
    closed = history.filter(~F.col(IS_CURRENT))
    open_rows = history.filter(F.col(IS_CURRENT))

    j = open_rows.alias("cur").join(
        updates.alias("upd"), on=F.col(f"cur.{key}") == F.col(f"upd.{key}"),
        how="full_outer",
    )
    changed = _changed(tracked)
    matched = F.col(f"cur.{key}").isNotNull() & F.col(f"upd.{key}").isNotNull()
    stale = matched & (
        F.col(f"upd.{ts_col}") < F.col(f"cur.{EFFECTIVE_FROM}")
    )
    supersedes = matched & changed & ~stale

    # 1. open rows that stay open: no update, no change, or stale update
    unchanged = j.filter(
        F.col(f"upd.{key}").isNull() | (matched & ~changed) | stale
    ).select([F.col(f"cur.{c}") for c in data_cols] + [
        F.col(f"cur.{EFFECTIVE_FROM}"),
        F.col(f"cur.{EFFECTIVE_TO}"),
        F.col(f"cur.{IS_CURRENT}"),
    ])

    # 2. open rows superseded by a real change: closed at the update ts
    now_closed = j.filter(supersedes).select(
        [F.col(f"cur.{c}") for c in data_cols] + [
            F.col(f"cur.{EFFECTIVE_FROM}"),
            F.col(f"upd.{ts_col}").alias(EFFECTIVE_TO),
            F.lit(False).alias(IS_CURRENT),
        ]
    )

    # 3. new open versions: changed rows + brand-new keys
    fresh = j.filter(
        supersedes | F.col(f"cur.{key}").isNull()
    ).select(
        [F.col(f"upd.{c}").alias(c) for c in data_cols] + [
            F.col(f"upd.{ts_col}").alias(EFFECTIVE_FROM),
            F.lit(None).cast("timestamp").alias(EFFECTIVE_TO),
            F.lit(True).alias(IS_CURRENT),
        ]
    )

    return (
        closed.select(*history.columns)
        .unionByName(unchanged)
        .unionByName(now_closed)
        .unionByName(fresh)
    )


def as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time view: the version of each key effective at ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return history.filter(
        (F.col(EFFECTIVE_FROM) <= t)
        & (F.col(EFFECTIVE_TO).isNull() | (F.col(EFFECTIVE_TO) > t))
    ).drop(EFFECTIVE_FROM, EFFECTIVE_TO, IS_CURRENT)

"""Referential-integrity joins.

The reference detects FK orphans with a left-outer join followed by a
null-filter on a right-side column, then re-projects the left columns
(``order_items_etl.py:70-90`` — SURVEY.md §2.3 J1-J4). Idiomatic Spark
expresses the same semantics directly as ``left_semi`` (keep) and
``left_anti`` (orphans): no right-side columns survive the join, so no
re-projection, and Catalyst plans a broadcast semi/anti join when the
dimension side is small — the FK dimension (products, 1k rows in the
reference; part/customer at bench scale) should never shuffle the fact table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import ForeignKey


def _keys(ref: DataFrame, fk: ForeignKey) -> DataFrame:
    # project to the single key column before the join so the broadcast side
    # is as small as possible (column pruning made explicit)
    return ref.select(F.col(fk.ref_column).alias(fk.column))


def fk_valid(df: DataFrame, ref: DataFrame, fk: ForeignKey, broadcast: bool = True) -> DataFrame:
    """Rows of ``df`` whose FK exists in ``ref`` (semi join, J4)."""
    keys = _keys(ref, fk)
    if broadcast:
        keys = F.broadcast(keys)
    return df.join(keys, on=fk.column, how="left_semi")


def fk_orphans(df: DataFrame, ref: DataFrame, fk: ForeignKey, broadcast: bool = True) -> DataFrame:
    """Rows of ``df`` whose FK is absent from ``ref`` (anti join, J3).

    Note: like the reference (a null FK never matches the left join at
    ``order_items_etl.py:72``), rows with a *null* FK come out as orphans —
    run validation first if nulls should be claimed by the null rules.
    """
    keys = _keys(ref, fk)
    if broadcast:
        keys = F.broadcast(keys)
    return df.join(keys, on=fk.column, how="left_anti")


def fk_check(
    df: DataFrame,
    refs: dict[str, DataFrame],
    fks: tuple[ForeignKey, ...],
    broadcast: bool = True,
    cache: bool = True,
) -> tuple[DataFrame, DataFrame, Callable[[], None]]:
    """Chain all FK probes: returns (rows passing every FK, all orphans
    tagged with the failing FK, cleanup) — call ``cleanup()`` after both
    outputs are consumed to release the cached intermediates.

    The reference runs each probe as join + count + write + re-filter (two
    passes per FK, SURVEY.md §4.3-2); here each probe is one semi + one anti
    join over a cached intermediate, and orphans carry a ``_reject_reason``
    compatible with the validation quarantine sink.
    """
    orphan_parts: list[DataFrame] = []
    persisted: list[DataFrame] = []
    current = df
    if cache:
        current = current.persist()
        persisted.append(current)
    for fk in fks:
        ref = refs[fk.ref_table]
        bad = fk_orphans(current, ref, fk, broadcast).withColumn(
            "_reject_reason", F.lit(f"fk_violation_{fk.column}")
        )
        orphan_parts.append(bad)
        current = fk_valid(current, ref, fk, broadcast)
        if cache:
            current = current.persist()
            persisted.append(current)
    if orphan_parts:
        orphans = orphan_parts[0]
        for p in orphan_parts[1:]:
            orphans = orphans.unionByName(p)
    else:
        orphans = df.limit(0).withColumn("_reject_reason", F.lit(None).cast("string"))

    def cleanup() -> None:
        for p in persisted:
            p.unpersist()

    return current, orphans, cleanup

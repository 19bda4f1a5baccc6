"""Quarantine replay: reprocess rejected rows after an upstream fix.

The reference's rejected/ zone is write-only — nothing ever reads it
(SURVEY.md §2.1 S6). A real lakehouse closes the loop: read a quarantined
batch, apply a caller-supplied fix (corrected mapping, default fill,
re-parsed timestamps), re-run the SAME validation the main path uses, merge
the now-valid rows, and re-quarantine the still-bad remainder under a new
run id. MERGE idempotence makes replay safe to repeat.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

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


def read_rejects(
    spark: SparkSession, rejected_path: str, table: str, run_id: str | None = None
) -> DataFrame:
    """Load quarantined rows (header CSV, schema-on-read as strings —
    re-validation re-applies the declared types)."""
    scope = f"run_id={run_id}" if run_id else "run_id=*"
    return spark.read.option("header", True).csv(
        f"{rejected_path}/{table}/{scope}"
    )


def replay_rejects(
    spark: SparkSession,
    spec: TableSpec,
    rejected_path: str,
    warehouse_path: str,
    source_run_id: str,
    replay_run_id: str,
    fixer: Callable[[DataFrame], DataFrame] | None = None,
) -> tuple[int, int]:
    """Returns (rows recovered into the table, rows re-quarantined)."""
    raw = read_rejects(spark, rejected_path, spec.name, source_run_id).drop(
        V.REASON_COL
    )
    if fixer is not None:
        raw = fixer(raw)
    res = V.validate(raw, spec)
    valid = D.dedup_deterministic(res.valid, [spec.primary_key])
    n_ok = valid.count()
    if n_ok:
        M.merge_upsert(spark, valid, f"{warehouse_path}/{spec.name}", spec)
    n_bad = res.rejected.count()
    if n_bad:
        write_rejects(res.rejected, rejected_path, spec.name, replay_run_id)
    res.unpersist()
    return n_ok, n_bad

"""Quarantine sink for rejected rows (SURVEY.md §2.1 S6).

The reference appends rejected rows as headerless CSV straight under a shared
``rejected/`` prefix (``validation.py:26,36,47,58``), so reruns double-write
the same rejects (SURVEY.md §4.3-6). The rebuild namespaces each batch by a
caller-supplied run id (idempotent reruns overwrite their own namespace) and
keeps the reject *reason* as a column so the quarantine zone is queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_rejects(
    rejected: DataFrame,
    base_path: str,
    table: str,
    run_id: str,
    fmt: str = "csv",
) -> str:
    path = f"{base_path}/{table}/run_id={run_id}"
    writer = rejected.write.mode("overwrite")
    if fmt == "csv":
        # header on, unlike the reference's headerless append — queryability
        # beats byte-parity for a quarantine zone
        writer = writer.option("header", True)
    writer.format(fmt).save(path)
    return path

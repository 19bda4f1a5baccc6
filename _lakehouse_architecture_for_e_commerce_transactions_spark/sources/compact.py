"""Small-file compaction for curated tables.

Incremental MERGE batches leave many small parquet files per partition; scan
throughput at 100 TB is dominated by file-open overhead once files fall
below ~tens of MB. ``compact_table`` rewrites each partition's data into
⌈bytes / target⌉ files. Like the merge writer it materializes before
overwriting (parquet has no transaction log; a Delta/Iceberg deployment
swaps this for OPTIMIZE)."""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_table(
    spark: SparkSession,
    path: str,
    partition_by: tuple[str, ...] = (),
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the table at ``path`` with right-sized files; returns the
    resulting parquet file count. Uses repartition (round-robin) so output
    files are even-sized, not coalesce (which can skew)."""
    n_files = max(1, math.ceil(_dir_bytes(path) / target_file_bytes))
    df = spark.read.parquet(path)
    if partition_by:
        # spread rows of each partition value together so dynamic overwrite
        # writes n_files total, clustered by partition dirs
        out = df.repartition(n_files, *[c for c in partition_by])
    else:
        out = df.repartition(n_files)
    out = out.localCheckpoint(eager=True)
    writer = out.write.mode("overwrite").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    return parquet_file_count(path)

"""Schema-on-read CSV source (SURVEY.md §2.1 S1).

The reference reads every job's input as ``spark.read.schema(s).csv(prefix +
"*.csv", header=True)`` (``orders_etl.py:46`` etc.): explicit schema (no
inference pass over the data), header row, PERMISSIVE mode so a value that
fails its declared type parses as null and is then claimed by the validation
rules (SURVEY.md §7.3 "CSV edge semantics"). A multi-file glob is an implicit
UNION ALL of the daily files.

This reader keeps those semantics and makes PERMISSIVE explicit. At scale,
CSV files are split by byte ranges automatically (uncompressed CSV is
splittable), so a 100 TB raw zone parallelizes without help.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType,
    header: bool = True,
    timestamp_format: str | None = None,
    multiline: bool = False,
    quote: str = '"',
    escape: str = "\\",
) -> DataFrame:
    """``multiline=True`` parses quoted fields containing record
    separators (RFC-4180 embedded newlines). Caveat for scale: multiline
    CSV files are NOT byte-range splittable (one task per file) — keep
    the default off unless the data needs it, and prefer many medium
    files when it does."""
    reader = (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("multiLine", multiline)
        .option("quote", quote)
        .option("escape", escape)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    if isinstance(paths, str):
        paths = [paths]
    return reader.csv(list(paths))

"""Schema-on-read JSONL source — the de-facto training-corpus exchange
format (one JSON document per line: CommonCrawl derivatives, instruction
sets, eval suites).

Same contract as the CSV source (sources/csv.py): explicit schema — no
inference pass over 100 TB — and PERMISSIVE mode, with the corrupt-record
column made explicit so unparseable lines flow to the quarantine path
instead of vanishing (Spark's default PERMISSIVE silently nulls them
unless the column is declared).

Scale notes:
* Uncompressed and zstd/bzip2 JSONL split by byte range; **gzip does
  not** — a 10 GB .jsonl.gz is one task. Corpora shipped as many ~100 MB
  .gz shards parallelize by file count, which is the layout to demand.
* The schema should declare only needed fields: Spark's JSON reader
  prunes parsing to the declared subtree (full-line parse only when
  ``_corrupt_record`` is selected, which the quarantine split does once).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType,
    multiline: bool = False,
) -> DataFrame:
    """Read JSONL with explicit schema + explicit corrupt-record column.
    The returned frame carries ``_corrupt_record`` (null for clean rows);
    split it with :func:`quarantine_corrupt`."""
    if not any(f.name == CORRUPT_COL for f in schema.fields):
        schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
        )
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
    )
    if isinstance(paths, str):
        paths = [paths]
    return reader.json(list(paths))


def quarantine_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt): clean rows lose the corrupt column; corrupt rows
    keep only the raw line (for the rejects sink). Spark requires a
    cache/materialization boundary before filtering on the corrupt column
    of a just-parsed frame — handled here so callers can't hit the
    AnalysisException footgun."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, corrupt


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write JSONL shards (one file per partition — pre-size partitions
    with rebalance/repartition upstream; zstd recommended: splittable on
    read, unlike gzip)."""
    w = df.write.mode("errorifexists")
    if compression:
        w = w.option("compression", compression)
    w.json(path)

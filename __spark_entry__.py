"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual query surface lives in
``_lakehouse_architecture_for_e_commerce_transactions_spark/plans/catalog.py`` — one
entry per operator from SURVEY.md §2 plus the training-data-pipeline
extensions. This module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (  # noqa: E402
    catalog as _catalog,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary: scan → filter →
    group-agg, the shape Athena ran against the curated tables) on sf0.001."""
    return _catalog.q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()

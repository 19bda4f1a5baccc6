"""One-pass table profiling — the data-quality summary a pipeline runs
before trusting a new drop: per-column null counts, exact distinct
cardinality, and min/max.

Plan shape: the row is melted into (column, value) structs with ONE
explode (the same explicit expand a multi-countDistinct agg would build
implicitly, but with a single distinct aggregate instead of one per
column), then one groupBy(column). Shuffle traffic is the per-partition
partial-agg state, not the melted stream. Values travel as strings for
the distinct count (cardinality is representation-independent) and as
doubles for numeric min/max; date/string min/max stay lexicographic
(ISO dates order chronologically).

At 100 TB: profile a `deterministic_sample` slice for the distinct
estimate or swap the exact distinct for approx_count_distinct — the
operator contract is unchanged; null/min/max stay exact either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUM_PREFIXES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "double",
    "float",
    "decimal",
)


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Returns one row per profiled column:
    (column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str) — numeric bounds for numeric columns, string bounds
    otherwise (each null for the other kind)."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    entries = []
    for c in cols:
        is_num = dtypes[c].startswith(_NUM_PREFIXES)
        num_v = (
            F.col(c).cast("double")
            if is_num
            else F.lit(None).cast("double")
        )
        str_v = (
            F.lit(None).cast("string")
            if is_num
            else F.col(c).cast("string")
        )
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).isNull().cast("long").alias("is_null"),
                F.col(c).cast("string").alias("v_all"),
                num_v.alias("v_num"),
                str_v.alias("v_str"),
            )
        )
    melted = df.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.*"
    )
    return melted.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("is_null").alias("n_nulls"),
        F.countDistinct("v_all").alias("n_distinct"),
        F.min("v_num").alias("min_num"),
        F.max("v_num").alias("max_num"),
        F.min("v_str").alias("min_str"),
        F.max("v_str").alias("max_str"),
    )

"""Sequential time-series smoothing — the one operator family whose
recursion genuinely cannot be a window aggregate.

EWMA carries y_{t-1} into y_t: a cumulative-window SUM of decayed terms
would need per-term float pow() and an order-dependent float sum, both
of which break cross-engine determinism (the repo's detmath notes).
``ewma_halving`` sidesteps both: alpha fixed at 1/2 and INTEGER floor
arithmetic — y_1 = x_1, y_t = (x_t + y_{t-1}) // 2 — make the whole
recursion exact 64-bit math a DuckDB recursive CTE replays bit-for-bit.

Scale shape: groups are distributed (one Arrow batch per group via
``applyInPandas`` — the sanctioned Pandas path, never a row-at-a-time
Python UDF); the sequential walk is O(rows-in-group) INSIDE one task,
which is the inherent lower bound for a recurrence. At 100 TB the
parallelism axis is the number of series, not the length of one — the
same contract as Spark's own stateful streaming operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def ewma_halving(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average with alpha = 1/2
    over integer values: rows are ordered by ``order_col`` within each
    key group and smoothed by the exact recursion
    ``y_1 = x_1; y_t = (x_t + y_{t-1}) // 2`` (Python floor division —
    round toward negative infinity, matching SQL integer ``//``).
    Returns the input columns plus ``out_col``. NULL values are
    rejected (a NULL breaks the recursion silently); ties in
    ``order_col`` within a key are rejected too — the recursion's
    result would depend on their arbitrary order."""
    import pandas as pd  # noqa: F401 — documents the Arrow path

    if df.filter(F.col(value_col).isNull()).take(1):
        raise ValueError(f"ewma_halving: NULL in {value_col!r}")
    dup = (
        df.groupBy(*keys, order_col)
        .count()
        .filter(F.col("count") > 1)
        .take(1)
    )
    if dup:
        raise ValueError(
            f"ewma_halving: duplicate {order_col!r} within a key group "
            f"({tuple(dup[0])!r}) — the recursion is order-ambiguous"
        )
    in_fields = [df.schema[c] for c in [*keys, order_col]]
    schema = StructType(
        [
            *in_fields,
            StructField(value_col, LongType(), False),
            StructField(out_col, LongType(), False),
        ]
    )

    def walk(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        out = []
        prev = None
        for x in pdf[value_col]:
            x = int(x)
            prev = x if prev is None else (x + prev) // 2
            out.append(prev)
        pdf[out_col] = out
        return pdf[[*keys, order_col, value_col, out_col]]

    src = df.select(
        *keys, order_col, F.col(value_col).cast("long").alias(value_col)
    )
    return src.groupBy(*keys).applyInPandas(walk, schema)

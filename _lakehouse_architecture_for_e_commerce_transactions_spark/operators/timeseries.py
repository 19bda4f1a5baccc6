"""Sequential time-series smoothing — the one operator family whose
recursion genuinely cannot be a window aggregate.

EWMA carries y_{t-1} into y_t: a cumulative-window SUM of decayed terms
would need per-term float pow() and an order-dependent float sum, both
of which break cross-engine determinism (the repo's detmath notes).
``ewma_halving`` sidesteps both: alpha fixed at 1/2 and INTEGER
truncating-division arithmetic — y_1 = x_1, y_t = (x_t + y_{t-1}) DIV 2
— make the whole recursion exact 64-bit math a DuckDB recursive CTE
replays bit-for-bit (DIV truncates toward zero in both engines).

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


def _half(v: int) -> int:
    """Truncating halving — SQL integer-division semantics (DuckDB
    ``//``, Spark ``DIV`` both truncate toward zero; Python ``//``
    floors, which diverges on negatives)."""
    return -((-v) >> 1) if v < 0 else v >> 1


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
    ``y_1 = x_1; y_t = (x_t + y_{t-1}) DIV 2`` (TRUNCATING integer
    division — SQL DIV / DuckDB ``//`` semantics, toward zero).
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
            prev = x if prev is None else _half(x + prev)
            out.append(prev)
        pdf[out_col] = out
        return pdf[[*keys, order_col, value_col, out_col]]

    src = df.select(
        *keys, order_col, F.col(value_col).cast("long").alias(value_col)
    )
    return src.groupBy(*keys).applyInPandas(walk, schema)


def holt_linear_halving(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Per-key Holt double smoothing (level + linear trend) with
    alpha = beta = 1/2 in exact integer arithmetic:
    ``l_1 = x_1, b_1 = 0;  l_t = (x_t + l_{t-1} + b_{t-1}) DIV 2;
    b_t = (b_{t-1} + (l_t - l_{t-1})) DIV 2`` (truncating DIV —
    see ``_half``). The h-step forecast is
    ``level + h·trend`` — plain column math for the caller. Same
    execution contract as ``ewma_halving`` (one Arrow batch per
    series; NULLs and order ties rejected); a DuckDB RECURSIVE CTE
    replays both coupled recursions bit-for-bit."""
    if df.filter(F.col(value_col).isNull()).take(1):
        raise ValueError(f"holt_linear_halving: NULL in {value_col!r}")
    dup = (
        df.groupBy(*keys, order_col)
        .count()
        .filter(F.col("count") > 1)
        .take(1)
    )
    if dup:
        raise ValueError(
            f"holt_linear_halving: duplicate {order_col!r} within a key "
            f"group ({tuple(dup[0])!r}) — the recursion is "
            "order-ambiguous"
        )
    in_fields = [df.schema[c] for c in [*keys, order_col]]
    schema = StructType(
        [
            *in_fields,
            StructField(value_col, LongType(), False),
            StructField(level_col, LongType(), False),
            StructField(trend_col, LongType(), False),
        ]
    )

    def walk(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        levels, trends = [], []
        lv = tr = None
        for x in pdf[value_col]:
            x = int(x)
            if lv is None:
                lv, tr = x, 0
            else:
                nl = _half(x + lv + tr)
                tr = _half(tr + (nl - lv))
                lv = nl
            levels.append(lv)
            trends.append(tr)
        pdf[level_col] = levels
        pdf[trend_col] = trends
        return pdf[[*keys, order_col, value_col, level_col, trend_col]]

    src = df.select(
        *keys, order_col, F.col(value_col).cast("long").alias(value_col)
    )
    return src.groupBy(*keys).applyInPandas(walk, schema)

"""Heavy-hitter detection with bounded state — frequent items over key
spaces too large to aggregate exactly in one pass.

A plain ``groupBy(term).count()`` shuffles (and spills) the FULL distinct
key space — at 100 TB a token column easily has billions of distinct
keys of which only thousands matter. The classic two-pass plan bounds
that:

1. **Candidate generation** (Arrow batches, no shuffle): within each
   batch, any item with global frequency > n/k must have local frequency
   > n_batch/k in at least one batch (pigeonhole), so per-batch local
   filtering yields a small superset of the true heavy hitters. State
   per batch is one bounded value_counts.
2. **Exact counting pass** (shuffle of candidates only): broadcast
   semi-join the candidate set, then an exact groupBy over the filtered
   stream. Output counts are exact, not approximate — the sketchy pass
   only narrows *where* to count.

Determinism: output = all items with ``count · k > n`` — a pure function
of the data (integer comparison, no sketch error surfaces), so any
engine agrees row-for-row.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-Arrow-batch pigeonhole candidates: a superset of every item
    with global frequency > n/k. One projected column in, bounded
    distinct values out, zero shuffles."""
    import pandas as pd

    field = df.schema[col]
    schema = f"{field.name} {field.dataType.simpleString()}"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vc = pdf[col].value_counts()
            local = vc[vc * k > len(pdf)]
            yield pd.DataFrame({col: local.index})

    return df.select(col).mapInPandas(gen, schema=schema)


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact frequent items: every value of ``col`` with
    ``count · k > total_rows`` (frequency > 1/k), found without ever
    shuffling the full key space. Returns (col, cnt).

    The total rides in as a 1-row broadcast rather than an eager
    ``count()`` — the whole operator stays one lazy plan (no extra
    driver-blocking job; Spark overlaps the total-count scan with the
    candidate scan)."""
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    cands = candidate_heavy_hitters(df, col, k).distinct()
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("_n"))
        .drop("_n")
    )

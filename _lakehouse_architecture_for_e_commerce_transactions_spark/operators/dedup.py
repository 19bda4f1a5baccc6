"""Key-based deduplication operators.

The reference dedups with ``dropDuplicates([pk])`` (``product_etl.py:57``,
``orders_etl.py:59``, ``order_items_etl.py:94``) — which keeps an *arbitrary*
row per key (SURVEY.md §2.4 A2, §4.3-4). Both forms are provided:

* ``dedup_exact`` — the reference's semantics (hash aggregation on key,
  first-seen row wins; cheapest, map-side partial aggregation).
* ``dedup_deterministic`` — ``row_number() OVER (PARTITION BY key ORDER BY
  tiebreak)`` so the surviving row is well-defined; required for
  oracle-hash-stable results and idempotent reruns.

Content-based near-duplicate detection for document corpora (MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine) lives in ``textdedup.py`` /
``similarity.py`` — this module is the relational key surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "_dedup_rn"


def dedup_exact(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``dropDuplicates(keys)`` — nondeterministic survivor, no sort.

    Physical plan: partial hash-aggregate per input partition (map-side
    combine drops most duplicates before the shuffle), exchange on ``keys``,
    final aggregate. Preferred at 100 TB when any-survivor semantics are
    acceptable: unlike the window variant it never materializes per-key row
    order.
    """
    return df.dropDuplicates(list(keys))


def dedup_deterministic(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] | None = None,
    descending: bool = False,
) -> DataFrame:
    """Keep exactly one row per key, chosen by ``order_by`` (ties broken by
    every remaining column so the result is a pure function of the data).

    One shuffle on ``keys`` (same as dedup_exact's exchange); the per-key
    sort is bounded by group size, not partition size. ``descending=True``
    keeps the greatest row (e.g. latest timestamp = last-writer-wins).
    """
    order_cols = list(order_by) if order_by else []
    tail = [c for c in df.columns if c not in keys and c not in order_cols]
    ordering = [
        F.col(c).desc_nulls_last() if descending else F.col(c).asc_nulls_first()
        for c in order_cols + tail
    ]
    if not ordering:  # keys cover every column: plain distinct
        return df.distinct()
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*ordering)
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keys occurring more than once, with their multiplicity — the audit
    query behind "how many duplicates did dedup remove" log lines
    (``orders_etl.py:59-61``) without running dedup twice."""
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )

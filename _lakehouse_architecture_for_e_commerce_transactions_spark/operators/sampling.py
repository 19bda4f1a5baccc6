"""Deterministic hash-based sampling and dataset splitting.

Training pipelines need repeatable samples and train/val/test splits that
are (a) stable across runs and engines, (b) driven by the row's identity,
not its physical placement. ``df.sample()`` fails both. These operators
bucket rows by a Knuth multiplicative hash of an integer key — pure int64
arithmetic, so any engine reproduces the assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / φ, classic multiplicative-hash constant
BUCKETS = 1000


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from an integer key column."""
    return F.pmod(key.cast("long") * F.lit(KNUTH), F.lit(buckets))


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep ≈fraction of rows, chosen by key hash — the same rows every run,
    every engine, regardless of partitioning."""
    return df.filter(hash_bucket(F.col(key), buckets) < int(fraction * buckets))


def train_test_split(
    df: DataFrame,
    key: str,
    test_fraction: float = 0.1,
    val_fraction: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'val' | 'test') by key hash.

    Filtering beats multi-output here: one scan serves any consumer, and
    the assignment stays joinable (the same key always lands in the same
    split even across dataset versions)."""
    b = hash_bucket(F.col(key), buckets)
    test_hi = int(test_fraction * buckets)
    val_hi = test_hi + int(val_fraction * buckets)
    return df.withColumn(
        "split",
        F.when(b < test_hi, F.lit("test"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def weighted_sample(
    df: DataFrame, key: str, weight: str, k: int, seed: int = 104729
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row draws priority ``-ln(u)/w`` — an Exponential(w) race — and
    the k smallest win, giving inclusion probability proportional to
    weight. ``u`` comes from the same Knuth integer hash as the other
    samplers (placement-independent), and the priority is floored to
    integer micro-units with a key tie-break, so the selected set is
    stable across runs, partitionings, and engines.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each task
    keeps its own top-k and only k rows per task reach the driver-side
    merge, never a full sort."""
    h = F.pmod(
        F.col(key).cast("long") * F.lit(KNUTH) + F.lit(seed),
        F.lit(1 << 32),
    )
    u = (h + 1) / F.lit(float((1 << 32) + 2))  # uniform in (0, 1)
    pri = F.floor(
        F.lit(-1e6) * F.log(u) / F.col(weight).cast("double")
    ).cast("long")
    return (
        df.withColumn("_pri", pri)
        .orderBy("_pri", key)
        .limit(k)
        .drop("_pri")
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (class rebalancing): each stratum
    value keeps its own fraction of rows, chosen by the same key hash as
    ``deterministic_sample`` — so strata rates can be tuned independently
    while membership stays stable across runs/engines. The per-stratum
    threshold is a CASE expression on the stratum column: no join, no
    shuffle, fully pushdown-friendly."""
    b = hash_bucket(F.col(key), buckets)
    thresh = F.lit(int(default_fraction * buckets))
    for value, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(frac * buckets))
        ).otherwise(thresh)
    return df.filter(b < thresh)

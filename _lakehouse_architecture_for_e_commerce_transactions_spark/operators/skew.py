"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles most
cases at runtime; these operators are the explicit form for when the skew is
known and extreme (a null-key flood, one celebrity user), or when the
skewed operation is an aggregation with heavy per-group state where
map-side partial aggregation doesn't collapse values (collect_list,
count distinct).

* ``salted_join``: replicate the small side n× (one copy per salt), give
  each big-side row a uniform salt, join on (key, salt) — a hot key's rows
  spread over n tasks instead of one straggler.
* ``salted_agg``: two-phase aggregation through a salt column.

Salting changes physical distribution only; both operators are
result-identical to their naive forms (tested).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def with_salt(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Uniform pseudo-random salt in [0, n) — rand-based: the salt value
    never affects results, only placement, so nondeterminism is harmless."""
    return df.withColumn(_SALT, (F.rand(seed) * n).cast("int"))


def replicate(df: DataFrame, n: int) -> DataFrame:
    """Cross the frame with salts 0..n-1 (explode of a literal array — no
    shuffle, rows are generated where the input partition lives)."""
    return df.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n: int = 8,
    how: str = "inner",
) -> DataFrame:
    keys = [on] if isinstance(on, str) else list(on)
    b = with_salt(big, n)
    s = replicate(small, n)
    return b.join(s, on=keys + [_SALT], how=how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial: list[Column],
    final: Callable[[DataFrame], DataFrame],
    n: int = 8,
) -> DataFrame:
    """groupBy(keys+salt).agg(partial) → final(df grouped by keys).

    Example (count):
        salted_agg(df, ["k"], [F.count(F.lit(1)).alias("c")],
                   lambda d: d.groupBy("k").agg(F.sum("c").alias("c")))
    """
    partial_df = with_salt(df, n).groupBy(*keys, _SALT).agg(*partial)
    return final(partial_df.drop(_SALT))

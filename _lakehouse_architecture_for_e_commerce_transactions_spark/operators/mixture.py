"""Domain-mixture weighting: per-source sampling rates for a token budget.

Training mixtures up- or down-weight sources by a tempered token share
(weight_i ∝ tokens_i^alpha — alpha < 1 flattens the natural distribution,
the standard multilingual/domain-balancing trick), then realize the
mixture as per-source keep rates against a total token budget.

Determinism: the tempered sizes are rounded to fixed-point *before* the
cross-source total, so the normalization denominator is an exact integer
sum (order-independent) and every derived double is a pure function of
the per-source token counts — oracle-reproducible on any engine.

Scale shape: one groupBy(shard) over the corpus (map-side partial sums of
a long), then arithmetic on |shards| rows against a broadcast 1-row
total. The corpus is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    text as T,
)

_FIX = 1_000_000  # 6-dp fixed point for the tempered sizes


def domain_mixture(
    docs: DataFrame,
    budget_tokens: int,
    alpha: float = 0.5,
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Per-shard mixture table: ``(shard, n_docs, n_tokens, weight,
    keep_rate, target_tokens)``.

    ``weight`` = tokens^alpha / Σ tokens^alpha (6-dp fixed-point);
    ``target_tokens`` = weight × budget; ``keep_rate`` = min(1, target /
    tokens) — the per-shard Bernoulli rate a sampler (e.g.
    ``sampling.deterministic_sample``) applies to hit the budget without
    oversampling any shard beyond its actual size.
    """
    per = docs.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col(text_col)).cast("long")).alias("n_tokens"),
    )
    # IEEE-754 requires sqrt to be correctly rounded (pow is not), so the
    # default alpha=0.5 is bit-identical across engines; other alphas rely
    # on the platform's pow agreeing to ~1 ulp before the fixed-point snap.
    x = F.col("n_tokens").cast("double")
    powed = F.sqrt(x) if alpha == 0.5 else F.pow(x, F.lit(alpha))
    tempered = F.floor(powed * _FIX + F.lit(0.5)).cast("long")
    per = per.withColumn("_temp_c", tempered)
    total = per.agg(F.sum("_temp_c").alias("_total_c"))
    out = per.crossJoin(F.broadcast(total))
    weight = F.col("_temp_c") / F.col("_total_c")
    target = F.floor(weight * budget_tokens + F.lit(0.5)).cast("long")
    keep = F.least(F.lit(1.0), target / F.col("n_tokens"))
    return out.select(
        F.col(shard_col),
        "n_docs",
        "n_tokens",
        F.round(weight, 6).alias("weight"),
        F.round(keep, 6).alias("keep_rate"),
        target.alias("target_tokens"),
    )

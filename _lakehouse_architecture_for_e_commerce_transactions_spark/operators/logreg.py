"""Logistic-regression quality scoring — the trainable statistical text
filter (fastText-style quality classifiers in C4/CCNet-like pipelines),
as a Spark-first driver-loop:

* **Weights are driver state** (O(d) floats — the kmeans_fit pattern);
  the data never shuffles. Each GD iteration is ONE aggregation with
  map-side partials: per-row gradient contributions quantized to BIGINT
  micro-units (``floor(g·10⁶ + 0.5)``) so their sum — and therefore the
  whole fit — is independent of partitioning and summation order.
* **Scoring is a pure Column expression** (whole-stage codegen): the
  learned weights inline as literals; output is ``floor(10⁶·σ(w·x))``
  micro-probabilities, engine-portable.

The fit is a pure function of the row *set*: a SQL engine can replay it
exactly by unrolling the same iterations (see the catalog oracle).
Batch (full) gradient descent is deliberate — per-iteration cost is one
scan, and at 100 TB you run few iterations over a sampled slice rather
than many over everything; swap in deterministic_sample for the slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _margin(features: list[str], weights: list[float]) -> Column:
    """w0 + Σ wj·xj, built left-associated so any engine reproduces the
    exact IEEE addition order."""
    expr: Column = F.lit(float(weights[0]))
    for j, name in enumerate(features):
        expr = expr + F.lit(float(weights[j + 1])) * F.col(name)
    return expr


def _sigmoid(m: Column) -> Column:
    # det_exp, not F.exp: libm exp may differ by an ulp across engines
    # and flip a fixed-point floor; the polynomial is bit-identical on
    # any engine mirroring its operation order (the catalog oracle does)
    from _lakehouse_architecture_for_e_commerce_transactions_spark.functions.detmath import (
        det_exp,
    )

    return F.lit(1.0) / (F.lit(1.0) + det_exp(-m))


def logreg_fit(
    df: DataFrame,
    features: list[str],
    label: str,
    iterations: int = 5,
    lr: float = 0.5,
) -> list[float]:
    """Fit [intercept, w1..wd] by batch gradient descent. One aggregate
    job per iteration; gradient sums are fixed-point BIGINT."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.functions.detmath import (
        det_exp_fold,
    )

    n = df.count()
    if n == 0:
        raise ValueError("logreg_fit: empty input")
    w = [0.0] * (len(features) + 1)
    # The fit's sigmoid uses det_exp_FOLD (r15): the unrolled det_exp
    # doubles its expression tree per squaring (×64), and each GD
    # iteration plans a FRESH aggregate over that expanded tree —
    # measured ~2 s/iteration of pure plan/codegen walk on a 200-row
    # input. The fold keeps the tree tiny; values are bit-identical by
    # construction (same multiplies, same order — see det_exp_fold's
    # docstring and test_fit_matches_literal_iteration), so the
    # unrolled SQL oracle still replays the fit exactly. Scoring keeps
    # the unrolled form: one plan, scan-scale rows, codegen-bound.
    for _ in range(iterations):
        m = _margin(features, w)
        sig = F.lit(1.0) / (F.lit(1.0) + det_exp_fold(-m))
        err = sig - F.col(label).cast("double")
        aggs = [
            F.sum(
                F.floor(err * SCALE + F.lit(0.5)).cast("long")
            ).alias("g0")
        ]
        for j, name in enumerate(features):
            aggs.append(
                F.sum(
                    F.floor(
                        (err * F.col(name)) * SCALE + F.lit(0.5)
                    ).cast("long")
                ).alias(f"g{j + 1}")
            )
        g = df.agg(*aggs).first()
        w = [
            w[j] - lr * (g[f"g{j}"] / SCALE) / n
            for j in range(len(w))
        ]
    return w


def logreg_score(
    df: DataFrame,
    features: list[str],
    weights: list[float],
    out_col: str = "p_micro",
) -> DataFrame:
    """Append ``floor(10⁶·σ(w·x))`` as a BIGINT micro-probability column
    — a pure projection, no shuffle, no UDF."""
    p = _sigmoid(_margin(features, weights))
    return df.withColumn(
        out_col, F.floor(F.lit(float(SCALE)) * p).cast("long")
    )

"""Logistic-regression quality scorer: driver-loop GD with fixed-point
gradient accumulation."""

from __future__ import annotations

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    logreg as LR,
)


def _separable(spark, n=200):
    # class 1 clusters at x≈2, class 0 at x≈-2 (plus a noise feature)
    rows = [
        (i, 1.0, 2.0 + (i % 7) * 0.1, (i % 5) * 0.01) for i in range(n // 2)
    ] + [
        (i + n // 2, 0.0, -2.0 - (i % 7) * 0.1, (i % 5) * 0.01)
        for i in range(n // 2)
    ]
    return spark.createDataFrame(rows, "id long, y double, x1 double, x2 double")


def test_fit_separates_classes(spark):
    df = _separable(spark)
    w = LR.logreg_fit(df, ["x1", "x2"], "y", iterations=20, lr=0.5)
    assert w[1] > 0.5  # learned the separating direction
    scored = LR.logreg_score(df, ["x1", "x2"], w)
    rows = scored.collect()
    pos = [r["p_micro"] for r in rows if r["y"] == 1.0]
    neg = [r["p_micro"] for r in rows if r["y"] == 0.0]
    assert min(pos) > 800_000 and max(neg) < 200_000


def test_fit_partitioning_invariant(spark):
    df = _separable(spark)
    w1 = LR.logreg_fit(df, ["x1", "x2"], "y", iterations=5)
    w2 = LR.logreg_fit(df.repartition(11), ["x1", "x2"], "y", iterations=5)
    assert w1 == w2  # bit-identical: gradients sum in BIGINT micro-units


def test_score_is_pure_projection(spark):
    df = _separable(spark, 20)
    w = [0.1, 0.3, -0.2]
    plan = LR.logreg_score(df, ["x1", "x2"], w)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: scoring is a projection


def test_fit_matches_literal_iteration(spark):
    """The r15 broadcast-weight-row fit must be BIT-identical to the
    original literal-inlined gradient step (the SQL oracle unrolls the
    literal form, so any drift breaks quality_logreg's parity): replay
    the literal expression per iteration and compare exactly."""
    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.logreg import (
        SCALE,
        _margin,
        _sigmoid,
    )

    df = _separable(spark, 60)
    n = df.count()
    feats, lr = ["x1", "x2"], 0.5
    w_ref = [0.0, 0.0, 0.0]
    for _ in range(3):
        err = _sigmoid(_margin(feats, w_ref)) - F.col("y").cast("double")
        aggs = [
            F.sum(F.floor(err * SCALE + F.lit(0.5)).cast("long")).alias("g0")
        ]
        for j, name in enumerate(feats):
            aggs.append(
                F.sum(
                    F.floor((err * F.col(name)) * SCALE + F.lit(0.5)).cast(
                        "long"
                    )
                ).alias(f"g{j + 1}")
            )
        g = df.agg(*aggs).first()
        w_ref = [
            w_ref[j] - lr * (g[f"g{j}"] / SCALE) / n for j in range(3)
        ]
    assert LR.logreg_fit(df, feats, "y", iterations=3, lr=lr) == w_ref

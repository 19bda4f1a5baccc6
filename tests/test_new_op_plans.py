"""Plan-shape pins for the round-2 operators: the physical plan each one
was designed around, asserted so regressions surface as test failures
rather than silent slowdowns at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    frequency as FQ,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.anomaly import (
    rolling_zscore_flags,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.sampling import (
    weighted_sample,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
    executed_plan_text,
)


def test_weighted_sample_is_take_ordered(spark):
    """Top-k must compile to TakeOrderedAndProject (per-task partial
    top-k, k rows to the driver merge) — never a full global Sort."""
    df = spark.createDataFrame(
        [(i, (i % 5) + 1) for i in range(100)], "id long, w long"
    )
    plan = executed_plan_text(weighted_sample(df, "id", "w", 5))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_heavy_hitters_exact_pass_broadcasts_candidates(spark):
    """The exact counting pass must semi-join the (bounded) candidate
    set via broadcast — a shuffled join would defeat the design."""
    df = spark.createDataFrame([("a",)] * 50 + [("b",)] * 3, "term string")
    plan = executed_plan_text(FQ.heavy_hitters(df, "term", 4))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_anomaly_single_window_single_exchange(spark):
    """All three running sums share one window spec → exactly one Window
    node and one hash Exchange on the partition key."""
    df = spark.createDataFrame(
        [(i, i % 3, float(i), float(i * 7 % 13)) for i in range(60)],
        "event_id long, user_id long, t double, value double",
    )
    plan = executed_plan_text(
        rolling_zscore_flags(df, "user_id", ["t", "event_id"], "value")
    ).split("== Initial Plan ==")[0]
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 1

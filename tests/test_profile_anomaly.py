"""Table profiling and rolling z-score anomaly detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.anomaly import (
    rolling_zscore_flags,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.profile import (
    profile_table,
)


def test_profile_counts_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -3.0), (3, None, 1.5), (3, "a", None)],
        "k long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["k"]["n_rows"] == 4 and prof["k"]["n_nulls"] == 0
    assert prof["k"]["n_distinct"] == 3
    assert (prof["k"]["min_num"], prof["k"]["max_num"]) == (1.0, 3.0)
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2
    assert (prof["s"]["min_str"], prof["s"]["max_str"]) == ("a", "b")
    assert prof["s"]["min_num"] is None
    assert prof["v"]["n_nulls"] == 1
    assert (prof["v"]["min_num"], prof["v"]["max_num"]) == (-3.0, 1.5)


def test_profile_single_explode_plan(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    plan = (
        profile_table(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Generate explode") == 1  # one melt, no per-column scans


def test_rolling_zscore_flags_spike(spark):
    # steady baseline of 100s, one 10× spike at the end
    rows = [(i, 1, float(i), 100.0 + (i % 3)) for i in range(30)]
    rows.append((30, 1, 30.0, 1000.0))
    df = spark.createDataFrame(rows, "event_id long, user_id long, t double, value double")
    out = rolling_zscore_flags(df, "user_id", ["t", "event_id"], "value")
    flags = {r["event_id"]: r["is_anomaly"] for r in out.collect()}
    assert flags[30] is True
    assert sum(flags.values()) == 1  # nothing else flagged
    # early rows (thin baseline) are never flagged
    assert all(flags[i] is False for i in range(10))


def test_rolling_zscore_partitioning_invariant(spark):
    rows = [
        (i, i % 3, float(i), float((i * 37) % 97)) for i in range(300)
    ]
    a = spark.createDataFrame(rows, "event_id long, user_id long, t double, value double")
    b = a.repartition(17)
    fa = sorted(
        r["event_id"]
        for r in rolling_zscore_flags(a, "user_id", ["t", "event_id"], "value")
        .filter(F.col("is_anomaly"))
        .collect()
    )
    fb = sorted(
        r["event_id"]
        for r in rolling_zscore_flags(b, "user_id", ["t", "event_id"], "value")
        .filter(F.col("is_anomaly"))
        .collect()
    )
    assert fa == fb

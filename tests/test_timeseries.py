"""Sequential EWMA smoothing — exact integer recursion, Arrow-batched
per series."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.timeseries import (
    ewma_halving,
)


def test_ewma_recursion_matches_hand_walk(spark):
    rows = [("a", 1, 100), ("a", 2, 50), ("a", 3, 51), ("b", 1, 7)]
    df = spark.createDataFrame(rows, "g string, t int, x long")
    got = {
        (r["g"], r["t"]): r["ewma"]
        for r in ewma_halving(df, ["g"], "t", "x").collect()
    }
    # a: 100 -> (50+100)//2=75 -> (51+75)//2=63 ; b: 7
    assert got == {
        ("a", 1): 100,
        ("a", 2): 75,
        ("a", 3): 63,
        ("b", 1): 7,
    }


def test_ewma_truncating_semantics_on_negatives_and_determinism(spark):
    # SQL DIV truncates toward zero (DuckDB // agrees): (-3 + 0) DIV 2
    # == -1, NOT Python floor's -2
    df = spark.createDataFrame(
        [("g", 1, -3), ("g", 2, 0)], "g string, t int, x long"
    )
    [_, r2] = sorted(
        ewma_halving(df, ["g"], "t", "x").collect(),
        key=lambda r: r["t"],
    )
    assert r2["ewma"] == -1
    # partitioning-invariant: same result at any parallelism
    wide = spark.createDataFrame(
        [("g", t, t * 13 % 97) for t in range(200)],
        "g string, t int, x long",
    ).repartition(16)
    a = sorted(map(tuple, ewma_halving(wide, ["g"], "t", "x").collect()))
    b = sorted(
        map(
            tuple,
            ewma_halving(wide.coalesce(1), ["g"], "t", "x").collect(),
        )
    )
    assert a == b


def test_ewma_rejects_nulls_and_order_ties(spark):
    with pytest.raises(ValueError, match="NULL"):
        ewma_halving(
            spark.createDataFrame(
                [("g", 1, None)], "g string, t int, x long"
            ),
            ["g"],
            "t",
            "x",
        )
    with pytest.raises(ValueError, match="order-ambiguous"):
        ewma_halving(
            spark.createDataFrame(
                [("g", 1, 5), ("g", 1, 6)], "g string, t int, x long"
            ),
            ["g"],
            "t",
            "x",
        )

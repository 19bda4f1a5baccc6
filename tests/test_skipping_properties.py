"""Property-based checks: data skipping and heavy hitters must be pure
optimizations — results identical to the naive plan on arbitrary data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    frequency as FQ,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=60,
)

_ops = st.sampled_from(["==", "<", "<=", ">", ">="])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, op=_ops, lit=st.integers(min_value=-60, max_value=60))
def test_read_where_equals_plain_filter(spark, tmp_path_factory, rows, op, lit):
    path = str(tmp_path_factory.mktemp("prop") / "t")
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k long, v long"
    )
    S.commit(
        spark,
        df.repartitionByRange(3, "v"),
        path,
        stats_for=["v"],
    )
    got = sorted(
        r["id"] for r in S.read_where(spark, path, [("v", op, lit)]).collect()
    )
    cond = {
        "==": F.col("v") == lit,
        "<": F.col("v") < lit,
        "<=": F.col("v") <= lit,
        ">": F.col("v") > lit,
        ">=": F.col("v") >= lit,
    }[op]
    want = sorted(r["id"] for r in S.read(spark, path).filter(cond).collect())
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=8), min_size=1, max_size=120
    ),
    k=st.integers(min_value=2, max_value=6),
)
def test_heavy_hitters_equals_groupby(spark, vals, k):
    df = spark.createDataFrame([(f"v{x}",) for x in vals], "term string")
    n = len(vals)
    want = {
        (r["term"], r["cnt"])
        for r in df.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > n)
        .collect()
    }
    got = {
        (r["term"], r["cnt"]) for r in FQ.heavy_hitters(df, "term", k).collect()
    }
    assert got == want

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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target_keys=st.sets(st.integers(0, 20), max_size=12),
    feed=st.lists(
        st.tuples(
            st.integers(0, 20),                       # key
            st.sampled_from(["I", "U", "D"]),         # op
            st.integers(0, 5),                        # ts
        ),
        max_size=15,
    ),
)
def test_apply_changes_matches_reference_semantics(spark, target_keys, feed):
    """apply_changes == the obvious sequential interpretation: collapse
    the feed to the latest (ts, op) per key, then delete/upsert."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.merge import (
        apply_changes,
    )

    target = spark.createDataFrame(
        [(k, f"t{k}") for k in sorted(target_keys)] or [(None, None)],
        "k int, v string",
    ).filter(F.col("k").isNotNull())
    changes = spark.createDataFrame(
        [(k, f"c{k}_{ts}", op, ts) for k, op, ts in feed]
        or [(None, None, None, None)],
        "k int, v string, op string, ts int",
    ).filter(F.col("k").isNotNull())
    got = {
        r["k"]: r["v"]
        for r in apply_changes(target, changes, "k", ts_col="ts").collect()
    }
    # reference: python dict replay
    latest: dict = {}
    for k, op, ts in feed:
        cur = latest.get(k)
        # tie-break matches the operator: (ts, op) descending
        if cur is None or (ts, op) > (cur[0], cur[1]):
            latest[k] = (ts, op)
    want = {k: f"t{k}" for k in target_keys}
    for k, (ts, op) in latest.items():
        want.pop(k, None)
        if op != "D":
            want[k] = f"c{k}_{ts}"
    assert got == want

"""KMV distinct-count sketches: exact merge algebra (sketch of a union
equals the merge of the parts' sketches), exact small groups, bounded
estimator error, and partitioning invariance."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    sketches as SK,
)


def test_small_groups_are_exact_and_large_groups_bounded(spark):
    df = spark.range(5000).select(
        F.when(F.col("id") % 4 == 0, "big")
        .otherwise(F.concat(F.lit("small"), (F.col("id") % 3).cast("string")))
        .alias("g"),
        # big: 1250 distinct values; smallN: ~20 distinct each
        F.when(F.col("id") % 4 == 0, F.col("id"))
        .otherwise(F.col("id") % 20)
        .alias("v"),
    )
    est = {
        r["g"]: r["est_distinct"]
        for r in SK.kmv_estimate(
            SK.kmv_sketch(df, ["g"], "v", k=64), ["g"], k=64
        ).collect()
    }
    # sub-k groups are exact (the sketch IS the distinct set)
    for g in ("small0", "small1", "small2"):
        exact = (
            df.filter(F.col("g") == g).select("v").distinct().count()
        )
        assert est[g] == float(exact)
    # the big group estimates within ~3 standard errors (1/sqrt(62))
    assert abs(est["big"] - 1250) / 1250 < 0.4


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=0, max_size=60),
    st.lists(st.integers(0, 500), min_size=0, max_size=60),
)
def test_merge_of_sketches_equals_sketch_of_union(spark, xs, ys):
    """The exactness property that makes KMV state maintainable without
    rescans: merge(sketch(A), sketch(B)) == sketch(A ∪ B), row for row
    — including overlapping values and sub-k groups."""
    K = 8

    def frame(vals):
        if not vals:
            return spark.createDataFrame([], "g string, v long")
        return spark.createDataFrame(
            [("g", v) for v in vals], "g string, v long"
        )

    a, b = frame(xs), frame(ys)
    merged = {
        r["h"]
        for r in SK.kmv_merge(
            SK.kmv_sketch(a, ["g"], "v", k=K),
            SK.kmv_sketch(b, ["g"], "v", k=K),
            ["g"],
            k=K,
        ).collect()
    }
    direct = {
        r["h"]
        for r in SK.kmv_sketch(
            a.unionByName(b), ["g"], "v", k=K
        ).collect()
    }
    assert merged == direct


def test_sketch_is_partitioning_invariant(spark):
    df = spark.range(2000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") * 7919 % 997).alias("v"),
    )
    one = {
        (r["g"], r["h"])
        for r in SK.kmv_sketch(
            df.coalesce(1), ["g"], "v", k=32
        ).collect()
    }
    many = {
        (r["g"], r["h"])
        for r in SK.kmv_sketch(
            df.repartition(13), ["g"], "v", k=32
        ).collect()
    }
    assert one == many

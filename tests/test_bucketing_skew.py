from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    skew,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import explain
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, sort_cols="l_orderkey")
    write_bucketed(o, "b_orders", "l_orderkey", 8, sort_cols="l_orderkey")
    joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
    text = explain.executed_plan_text(joined)
    # co-located buckets: the join itself needs no shuffle
    assert "Exchange" not in text, text[:1500]
    # sanity: result matches the plain join
    plain = li.join(o, "l_orderkey").count()
    assert joined.count() == plain


def test_salted_join_equivalent_to_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = li.join(part, "l_partkey")
    salted = skew.salted_join(li, part, "l_partkey", n=4)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.groupBy("p_brand").count().collect()}
    b = {tuple(r) for r in salted.groupBy("p_brand").count().collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    small = spark.createDataFrame([(1, "X")], "k int, w string")
    out = skew.salted_join(big, small, "k", n=4, how="left").collect()
    assert len(out) == 3
    got = {r["k"]: r["w"] for r in out}
    assert got == {1: "X", 2: None, 3: None}


def test_salted_agg_counts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    salted = {
        r["l_returnflag"]: r["c"]
        for r in skew.salted_agg(
            li,
            ["l_returnflag"],
            [F.count(F.lit(1)).alias("c")],
            lambda d: d.groupBy("l_returnflag").agg(F.sum("c").alias("c")),
            n=4,
        ).collect()
    }
    assert plain == salted

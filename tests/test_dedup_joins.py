from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    dedup as D,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    joins as J,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import explain
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import ForeignKey


def test_dedup_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [(1, "2025-01-02", 20.0), (1, "2025-01-01", 10.0), (2, "2025-01-01", 5.0)],
        "pk int, d string, amt double",
    )
    latest = D.dedup_deterministic(df, ["pk"], order_by=["d"], descending=True)
    got = {r["pk"]: r["d"] for r in latest.collect()}
    assert got == {1: "2025-01-02", 2: "2025-01-01"}
    earliest = D.dedup_deterministic(df, ["pk"], order_by=["d"])
    got = {r["pk"]: r["d"] for r in earliest.collect()}
    assert got == {1: "2025-01-01", 2: "2025-01-01"}


def test_dedup_exact_counts(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "pk int, v string")
    assert D.dedup_exact(df, ["pk"]).count() == 2
    dups = D.duplicate_keys(df, ["pk"]).collect()
    assert len(dups) == 1 and dups[0]["pk"] == 1 and dups[0]["dup_count"] == 2


def test_fk_check_chain_and_reasons(spark):
    items = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 999), (3, 99, 100), (4, 99, 999)],
        "id int, order_id int, product_id int",
    )
    orders = spark.createDataFrame([(10,)], "order_id int")
    products = spark.createDataFrame([(100,)], "product_id int")
    fks = (
        ForeignKey("order_id", "orders", "order_id"),
        ForeignKey("product_id", "products", "product_id"),
    )
    valid, orphans, cleanup = J.fk_check(
        items, {"orders": orders, "products": products}, fks
    )
    assert [r["id"] for r in valid.collect()] == [1]
    reasons = {r["id"]: r["_reject_reason"] for r in orphans.collect()}
    # first FK in chain claims rows failing both (reject-once semantics)
    assert reasons == {
        3: "fk_violation_order_id",
        4: "fk_violation_order_id",
        2: "fk_violation_product_id",
    }
    cleanup()


def test_fk_semi_join_broadcasts(spark, sf_dir):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    out = J.fk_valid(li, part, ForeignKey("l_partkey", "part", "p_partkey"))
    explain.assert_broadcast_join(out)
    explain.assert_no_shuffle_join(out)

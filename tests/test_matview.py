from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.matview import (
    read_summary,
    update_summary,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "date string, amount double")


def test_incremental_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "summary")
    b1 = _batch(
        spark,
        [("d1", 10.0), ("d1", 20.0), ("d2", 5.0)],
    )
    b2 = _batch(
        spark,
        [("d1", 1.0), ("d3", 7.0)],
    )
    update_summary(spark, b1, path, keys=["date"], sum_cols=["amount"])
    update_summary(spark, b2, path, keys=["date"], sum_cols=["amount"])

    got = {
        r["date"]: (r["n_rows"], r["sum_amount"], r["avg_amount"])
        for r in read_summary(spark, path, avg_of=["amount"]).collect()
    }
    full = b1.unionByName(b2).groupBy("date").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("amount").alias("s"),
        F.avg("amount").alias("a"),
    )
    want = {r["date"]: (r["n"], r["s"], r["a"]) for r in full.collect()}
    assert got == want


def test_untouched_groups_not_rewritten(spark, tmp_path):
    import os

    # partitioned summary so per-group file sets are observable
    from _lakehouse_architecture_for_e_commerce_transactions_spark.etl import matview

    path = str(tmp_path / "s2")
    update_summary(spark, _batch(spark, [("d1", 1.0), ("d2", 2.0)]), path,
                   keys=["date"], sum_cols=["amount"])
    before = {r["date"]: r["sum_amount"]
              for r in spark.read.parquet(path).collect()}
    update_summary(spark, _batch(spark, [("d1", 9.0)]), path,
                   keys=["date"], sum_cols=["amount"])
    after = {r["date"]: r["sum_amount"]
             for r in spark.read.parquet(path).collect()}
    assert before == {"d1": 1.0, "d2": 2.0}
    assert after == {"d1": 10.0, "d2": 2.0}

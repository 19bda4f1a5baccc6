"""Iceberg-style hidden partitioning: partition columns derived by a
declared transform (days, bucket); read_where transposes predicates on
the SOURCE column into partition pruning — queries never mention the
derived column."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
    TableSpec,
)


def _events(spark, n=200):
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, base + datetime.timedelta(hours=i), float(i % 97))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id int, ts timestamp, v double")


def test_days_transform_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = S.derive_partition_column(
        _events(spark), "days", "ts", "p_day"
    )
    spec = TableSpec(
        name="t",
        schema=StructType(
            [
                StructField("id", IntegerType(), False),
                StructField("ts", TimestampType(), False),
                StructField("v", DoubleType(), False),
                StructField("p_day", IntegerType(), False),
            ]
        ),
        primary_key="id",
        partition_by=("p_day",),
    )
    S.merge_commit(spark, df, path, spec)
    S.set_partition_transform(path, "p_day", "days", "ts")

    cutoff = datetime.datetime(2024, 3, 7)
    rep: dict = {}
    got = S.read_where(spark, path, [("ts", ">=", cutoff)], report=rep)
    want = S.read(spark, path).filter(F.col("ts") >= cutoff)
    assert got.count() == want.count() > 0
    # 200 hourly events span ~9 days; >= day 6 keeps ~1/3 of partitions
    assert rep["files_kept"] < rep["files_total"] // 2

    # equality on a single timestamp → exactly one day partition
    one = datetime.datetime(2024, 3, 2, 5)
    rep2: dict = {}
    got2 = S.read_where(spark, path, [("ts", "==", one)], report=rep2)
    assert got2.count() == 1
    assert rep2["files_kept"] == 1


def test_bucket_transform_prunes_point_lookup(spark, tmp_path):
    path = str(tmp_path / "t")
    n_buckets = 8
    df = S.derive_partition_column(
        _events(spark), "bucket", "id", "p_bucket", n=n_buckets
    )
    spec = TableSpec(
        name="t",
        schema=StructType(
            [
                StructField("id", IntegerType(), False),
                StructField("ts", TimestampType(), False),
                StructField("v", DoubleType(), False),
                StructField("p_bucket", IntegerType(), False),
            ]
        ),
        primary_key="id",
        partition_by=("p_bucket",),
    )
    S.merge_commit(spark, df, path, spec)
    S.set_partition_transform(path, "p_bucket", "bucket", "id", n=n_buckets)

    rep: dict = {}
    got = S.read_where(spark, path, [("id", "==", 57)], report=rep)
    assert [r["id"] for r in got.collect()] == [57]
    assert rep["files_kept"] * n_buckets <= rep["files_total"] * 2
    # range predicates on the source don't map through bucket: unpruned
    # but correct
    got2 = S.read_where(spark, path, [("id", "<", 10)])
    assert got2.count() == 10

"""Validation engine contracts, mirroring the reference's test semantics
(``src/tests/test_validation.py:77-84,190-205``: of a 4-row frame with a
null PK, a null required column and an invalid timestamp, exactly 1 row
survives) — but against a real SparkSession instead of pandas mocks."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    validation as V,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
    ORDERS,
    TableSpec,
)

SPEC = TableSpec(
    name="t",
    schema=StructType(
        [
            StructField("pk", IntegerType(), False),
            StructField("amount", DoubleType(), False),
            StructField("ts", TimestampType(), False),
            StructField("tag", StringType(), True),
        ]
    ),
    primary_key="pk",
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "pk string, amount string, ts string, tag string"
    )


def test_four_row_contract(spark):
    """Reference contract: null PK, null required, bad timestamp, 1 clean."""
    rows = [
        ("1", "10.5", "2025-04-01 10:00:00", "ok"),
        (None, "10.5", "2025-04-01 10:00:00", "null-pk"),
        ("3", None, "2025-04-01 10:00:00", "null-required"),
        ("4", "10.5", "invalid_timestamp", "bad-ts"),
    ]
    res = V.validate(_df(spark, rows), SPEC)
    valid = res.valid.collect()
    rejected = {r["tag"]: r[V.REASON_COL] for r in res.rejected.collect()}
    assert len(valid) == 1 and valid[0]["tag"] == "ok"
    assert rejected == {
        "null-pk": V.SCHEMA_MISMATCH,  # first failing rule claims the row
        "null-required": V.SCHEMA_MISMATCH,
        "bad-ts": V.SCHEMA_MISMATCH,  # cast-to-null then claimed by null rule
    }


def test_reject_once_priority_without_pk_in_required(spark):
    spec = TableSpec(
        name="t2",
        schema=SPEC.schema,
        primary_key="pk",
        required_columns=("amount",),
    )
    rows = [
        (None, "1.0", "2025-04-01 10:00:00", "only-pk-null"),
        (None, None, "2025-04-01 10:00:00", "both-null"),
    ]
    res = V.validate(_df(spark, rows), spec)
    rejected = {r["tag"]: r[V.REASON_COL] for r in res.rejected.collect()}
    assert rejected["only-pk-null"] == V.NULL_PRIMARY_KEY
    assert rejected["both-null"] == V.SCHEMA_MISMATCH


def test_cast_failures_become_rejects(spark):
    rows = [("xyz", "1.0", "2025-04-01 10:00:00", "bad-int-cast")]
    res = V.validate(_df(spark, rows), SPEC)
    assert res.valid.count() == 0
    assert res.rejected.count() == 1


def test_enforce_schema_types(spark):
    out = V.enforce_schema(_df(spark, [("1", "2.5", "2025-04-01 10:00:00", "x")]), SPEC)
    assert [f.dataType for f in out.schema.fields] == [
        f.dataType for f in SPEC.schema.fields
    ]


def test_observe_metrics(spark):
    rows = [
        ("1", "10.5", "2025-04-01 10:00:00", "ok"),
        (None, "10.5", "2025-04-01 10:00:00", "bad"),
    ]
    res = V.validate(_df(spark, rows), SPEC, observe=True)
    # metrics materialize once an action runs over the observed frame
    assert res.valid.count() + res.rejected.count() == 2
    m = res.metrics()
    assert m["rows_in"] == 2 and m["rows_valid"] == 1
    assert m[V.SCHEMA_MISMATCH] == 1


def test_clean_orders_spec_passthrough(spark):
    df = spark.createDataFrame(
        [("1", "101", "1001", "2025-04-01T10:00:00", "42.5", "2025-04-01")],
        "order_num string, order_id string, user_id string, "
        "order_timestamp string, total_amount string, date string",
    )
    res = V.validate(df, ORDERS)
    assert res.valid.count() == 1
    row = res.valid.collect()[0]
    assert row["total_amount"] == 42.5
    assert str(row["order_timestamp"]).startswith("2025-04-01 10:00:00")

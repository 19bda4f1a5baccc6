"""Property-based checks (hypothesis): the validation engine against an
independent pandas re-implementation of the reject-once contract, over
randomized dirty frames. Few examples (Spark job per example), wide
randomness per example."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
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
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import TableSpec

SPEC = TableSpec(
    name="p",
    schema=StructType(
        [
            StructField("pk", IntegerType(), False),
            StructField("amt", DoubleType(), False),
            StructField("ts", TimestampType(), False),
            StructField("note", StringType(), True),
        ]
    ),
    primary_key="pk",
    required_columns=("amt", "ts"),
)

cell_pk = st.one_of(st.none(), st.integers(0, 99).map(str), st.just("oops"))
cell_amt = st.one_of(st.none(), st.floats(0, 1e6, allow_nan=False).map(str), st.just("x"))
cell_ts = st.one_of(
    st.none(), st.just("2025-04-01 10:00:00"), st.just("invalid_timestamp")
)
row = st.tuples(cell_pk, cell_amt, cell_ts)


def expected_reason(pk, amt, ts):
    def intish(v):
        try:
            int(v)
            return True
        except (TypeError, ValueError):
            return False

    def floatish(v):
        try:
            float(v)
            return True
        except (TypeError, ValueError):
            return False

    amt_null = amt is None or not floatish(amt)
    ts_null = ts is None or ts == "invalid_timestamp"
    pk_null = pk is None or not intish(pk)
    if amt_null or ts_null:
        return V.SCHEMA_MISMATCH
    if pk_null:
        return V.NULL_PRIMARY_KEY
    return None


@given(st.lists(row, min_size=1, max_size=30))
@settings(max_examples=12, deadline=None)
def test_reject_once_matches_model(rows):
    # getOrCreate reuses the suite's shared session (fixtures can't be
    # injected into @given-wrapped tests)
    from _lakehouse_architecture_for_e_commerce_transactions_spark.session import (
        get_spark,
    )

    spark = get_spark("tests")
    df = spark.createDataFrame(
        [(pk, amt, ts, f"row{i}") for i, (pk, amt, ts) in enumerate(rows)],
        "pk string, amt string, ts string, note string",
    )
    res = V.validate(df, SPEC, cache=False)
    got = {r["note"]: None for r in res.valid.collect()}
    got.update({r["note"]: r[V.REASON_COL] for r in res.rejected.collect()})
    want = {
        f"row{i}": expected_reason(pk, amt, ts)
        for i, (pk, amt, ts) in enumerate(rows)
    }
    assert got == want

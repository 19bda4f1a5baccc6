"""operators/util.in_list — the one-round-trip IN-list builder.

Pins semantic equivalence with ``Column.isin`` (the form it replaces on
the hot snapshot/streaming paths) across every fast-path type, the
escaping edge cases, and the fallback classes. The r14 motivation:
``isin`` pays one py4j call per literal (~ms each), so the capped
streaming IN-lists cost ~0.4 s of driver time per use; ``in_list``
renders one SQL expression.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    util as U,
)


def _same(df, col, vals):
    a = sorted(repr(r[0]) for r in df.filter(F.col(col).isin(vals)).collect())
    b = sorted(repr(r[0]) for r in df.filter(U.in_list(col, vals)).collect())
    assert a == b, (vals, a, b)


def test_string_equivalence_and_escaping(spark):
    rows = [
        ("a'b",), ("x\\y",), ("plain",), (None,),
        ("O'Brien; DROP TABLE t; --",), ("back`tick",), ("",),
        ("new\nline",), ("tab\tsep",),
    ]
    df = spark.createDataFrame(rows, "s string")
    for vals in (
        ["a'b", "x\\y"],
        ["O'Brien; DROP TABLE t; --", ""],
        ["back`tick", "new\nline", "tab\tsep"],
        ["absent"],
        [],
        [None, "plain"],
    ):
        _same(df, "s", vals)


def test_numeric_bool_date_equivalence(spark):
    ints = spark.createDataFrame([(1,), (2,), (None,), (5,)], "i long")
    for vals in ([1, 5], [3], [1, None], []):
        _same(ints, "i", vals)
    floats = spark.createDataFrame(
        [(1.5,), (2.25,), (float("nan"),), (None,)], "f double"
    )
    for vals in ([1.5], [2.25, 99.0], [float("nan")], [float("inf")]):
        _same(floats, "f", vals)
    bools = spark.createDataFrame([(True,), (False,), (None,)], "b boolean")
    for vals in ([True], [False], [True, False]):
        _same(bools, "b", vals)
    dates = spark.createDataFrame(
        [(datetime.date(2024, 1, 1),), (datetime.date(2024, 2, 2),)],
        "d date",
    )
    _same(dates, "d", [datetime.date(2024, 1, 1)])
    _same(dates, "d", [datetime.date(1999, 12, 31)])


def test_fallback_types_still_correct(spark):
    # timestamps are NOT fast-pathed (tz rendering risk): must fall back
    # to isin and still agree with it
    ts = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 12, 30),),
         (datetime.datetime(2024, 6, 1, 0, 0),)],
        "t timestamp",
    )
    _same(ts, "t", [datetime.datetime(2024, 1, 1, 12, 30)])


def test_quoted_column_names(spark):
    df = spark.createDataFrame([("v1",), ("v2",)], ["weird name"])
    got = sorted(
        r[0]
        for r in df.filter(U.in_list("weird name", ["v1"])).collect()
    )
    assert got == ["v1"]

"""RFC-4180 CSV edge semantics: quoted separators, embedded newlines,
escapes — the dirty-input surface a raw zone actually receives."""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources.csv import (
    read_csv,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("note", StringType(), True),
        StructField("qty", IntegerType(), True),
    ]
)


def test_quoted_commas_and_escapes(spark, tmp_path):
    p = tmp_path / "a.csv"
    p.write_text(
        'id,note,qty\n'
        '1,"hello, world",3\n'
        '2,"she said \\"hi\\"",4\n'
        '3,plain,5\n'
    )
    rows = {
        r["id"]: (r["note"], r["qty"])
        for r in read_csv(spark, str(p), SCHEMA).collect()
    }
    assert rows == {
        1: ("hello, world", 3),
        2: ('she said "hi"', 4),
        3: ("plain", 5),
    }


def test_multiline_quoted_records(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text('id,note,qty\n1,"line one\nline two",7\n2,single,8\n')
    got = read_csv(spark, str(p), SCHEMA, multiline=True)
    rows = {r["id"]: r["note"] for r in got.collect()}
    assert rows[1] == "line one\nline two"
    assert rows[2] == "single"


def test_permissive_bad_cast_is_null_not_crash(spark, tmp_path):
    p = tmp_path / "b.csv"
    p.write_text("id,note,qty\nx,oops,notanint\n9,ok,2\n")
    rows = {
        (r["id"], r["qty"])
        for r in read_csv(spark, str(p), SCHEMA).collect()
    }
    assert rows == {(9, 2), (None, None)}

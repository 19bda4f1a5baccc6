"""JSONL source: schema enforcement, corrupt-line quarantine, roundtrip."""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    jsonl as J,
)

SCHEMA = StructType(
    [
        StructField("doc_id", IntegerType()),
        StructField("text", StringType()),
    ]
)


def test_read_clean_and_quarantine_corrupt(spark, tmp_path):
    p = tmp_path / "part-0.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        "{not json at all\n"
        '{"doc_id": "not-an-int", "text": "typed null"}\n'
    )
    df = J.read_jsonl(spark, str(p), SCHEMA)
    clean, corrupt = J.quarantine_corrupt(df)
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: "hello world", 2: "ok"}
    bad = [r["raw_line"] for r in corrupt.collect()]
    # the unparseable line AND the type-violating line both quarantine
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert J.CORRUPT_COL not in clean.columns


def test_multifile_glob_unions(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"shard-{i}.jsonl").write_text(
            f'{{"doc_id": {i}, "text": "doc {i}"}}\n'
        )
    df = J.read_jsonl(spark, str(tmp_path / "*.jsonl"), SCHEMA)
    assert df.count() == 3


def test_write_read_roundtrip(spark, tmp_path):
    d = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id int, text string"
    )
    out = str(tmp_path / "out")
    J.write_jsonl(d, out)
    back, corrupt = J.quarantine_corrupt(
        J.read_jsonl(spark, out + "/*.json", SCHEMA)
    )
    assert {r["doc_id"] for r in back.collect()} == {1, 2}
    assert corrupt.count() == 0

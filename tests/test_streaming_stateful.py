from __future__ import annotations

import os

from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.stateful import (
    running_totals,
    stream_dedup,
)


def _write_csv(path: str, header: str, rows: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(header + "\n" + "\n".join(rows) + "\n")


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_csv(
        f"{src}/a.csv",
        "id,ts,v",
        [
            "1,2024-01-01T00:00:00,a",
            "1,2024-01-01T00:05:00,b",  # duplicate id within watermark
            "2,2024-01-01T00:10:00,c",
        ],
    )
    stream = (
        spark.readStream.schema("id long, ts timestamp, v string")
        .option("header", True)
        .csv(src)
    )
    q = (
        stream_dedup(stream, ["id"], "ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT id FROM dedup_out").collect()
    assert sorted(r["id"] for r in rows) == [1, 2]


def test_running_totals_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    _write_csv(
        f"{src}/b1.csv", "user_id,value", ["1,10.0", "1,5.0", "2,1.0"]
    )
    out_dir = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    out = running_totals(stream)

    def run_once():
        # foreachBatch sink: supports checkpoint recovery (memory sink
        # doesn't), mirroring the engine's own foreachBatch ingest path
        q = (
            out.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {1: (2, 15.0), 2: (1, 1.0)}

    # second batch arrives: state must carry over via the checkpoint
    _write_csv(f"{src}/b2.csv", "user_id,value", ["1,100.0", "3,7.0"])
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    latest = {}
    for r in rows:  # keep the highest event count per user (latest state)
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            latest[r["user_id"]] = (r["n_events"], r["total_value"])
    assert latest[1] == (3, 115.0)  # accumulated across restarts
    assert latest[3] == (1, 7.0)
    assert latest[2] == (1, 1.0)


def test_compact_table(spark, tmp_path):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.sources.compact import (
        compact_table,
        parquet_file_count,
    )

    path = str(tmp_path / "t")
    # many tiny files: 20 single-row writes
    df = spark.range(200).withColumnRenamed("id", "k")
    df.repartition(20).write.mode("overwrite").parquet(path)
    before = parquet_file_count(path)
    assert before >= 20
    after = compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert after < before
    assert spark.read.parquet(path).count() == 200

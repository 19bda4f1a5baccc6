"""End-to-end streaming correctness beyond structure: out-of-order replay
of the dirty fixture must converge to the batch pipeline's exact output,
and late (but in-watermark) events must land in their event-time windows.

These pin the semantics the structural tests in test_streaming.py assume:
checkpointed exactly-once file processing + MERGE idempotence make arrival
order irrelevant, and watermarked aggregation is event-time, not
arrival-time.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    dedup as D,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    merge as M,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    validation as V,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.ingest import (
    stream_ingest,
    windowed_event_counts,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import ORDERS
from tests.conftest import ORDERS_HEADER

# the dirty orders fixture split into three arrival files: dup PK and the
# two reject rows live in distinct files so every micro-batch sees work
_FILES = {
    "a.csv": [
        "1,101,1001,2025-04-01T10:00:00,10.00,2025-04-01",
        "2,102,1002,2025-04-01T11:00:00,20.00,2025-04-01",
        "3,105,1005,2025-04-01T12:00:00,50.00,2025-04-01",
        "4,105,9999,2025-04-01T23:59:59,999.99,2025-04-01",  # dup PK in-file
    ],
    "b.csv": [
        "5,103,1003,2025-04-02T09:00:00,30.00,2025-04-02",
        "6,131,2131,invalid_timestamp,42.00,2025-04-02",  # ts → null → reject
    ],
    "c.csv": [
        "7,104,1004,2025-04-03T08:00:00,40.00,2025-04-03",
        "8,132,2132,2025-04-03T09:00:00,,2025-04-03",  # null amount → reject
    ],
}


def _write(path: str, rows: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(ORDERS_HEADER + "\n" + "\n".join(rows) + "\n")


def _rows(spark, path):
    return sorted(map(tuple, spark.read.parquet(path).collect()))


def test_stream_out_of_order_replay_matches_batch(spark, tmp_path):
    # batch reference: all files in one read → validate → dedup → merge
    batch_raw = str(tmp_path / "batch_raw")
    for name, rows in _FILES.items():
        _write(f"{batch_raw}/{name}", rows)
    res = V.validate(
        spark.read.schema(ORDERS.schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(batch_raw),
        ORDERS,
    )
    valid = D.dedup_deterministic(res.valid, [ORDERS.primary_key])
    batch_path = str(tmp_path / "wh_batch" / "orders")
    M.merge_upsert(spark, valid, batch_path, ORDERS)
    assert res.rejected.count() == 2

    # streaming: same files arrive in REVERSE order, one stream run per
    # arrival, resuming from the same checkpoint each time
    stream_raw = str(tmp_path / "stream_raw")
    wh = str(tmp_path / "wh_stream")
    rej = str(tmp_path / "rej")
    ckpt = str(tmp_path / "ckpt")
    rejects: list[int] = []
    for name in ["c.csv", "b.csv", "a.csv"]:
        _write(f"{stream_raw}/{name}", _FILES[name])
        q = stream_ingest(
            spark, ORDERS, stream_raw, wh, rej, ckpt,
            on_batch=lambda b, v, r: rejects.append(r),
        )
        q.awaitTermination(120)

    assert _rows(spark, f"{wh}/orders") == _rows(spark, batch_path)
    assert sum(rejects) == 2


def test_windowed_agg_late_events_match_batch(spark, tmp_path):
    """Late-but-in-watermark events, arriving a whole file AFTER newer
    events, must still aggregate into their event-time windows: the final
    streaming state equals the batch aggregation over the union."""
    src = str(tmp_path / "events")
    os.makedirs(src)
    header = "event_id,ts,event_type,value"
    on_time = [
        "1,2025-04-01T10:05:00,view,1.0",
        "2,2025-04-01T10:55:00,click,2.0",
        "3,2025-04-01T11:10:00,view,3.0",
    ]
    late = [  # older timestamps than file 1, within the 2h watermark
        "4,2025-04-01T10:20:00,view,4.0",
        "5,2025-04-01T10:40:00,click,5.0",
    ]
    _schema = "event_id long, ts timestamp, event_type string, value double"
    with open(f"{src}/f1.csv", "w") as f:
        f.write(header + "\n" + "\n".join(on_time) + "\n")
    time.sleep(1.1)  # distinct mtimes: the file source orders by mod time
    with open(f"{src}/f2.csv", "w") as f:
        f.write(header + "\n" + "\n".join(late) + "\n")

    stream = (
        spark.readStream.schema(_schema)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .csv(src)
    )
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_e2e")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        map(tuple, spark.sql("SELECT * FROM win_e2e").collect())
    )
    batch = sorted(
        map(
            tuple,
            windowed_event_counts(
                spark.read.schema(_schema).option("header", True).csv(src),
                window="1 hour",
            ).collect(),
        )
    )
    assert got == batch
    # the late file's events really did merge into earlier windows
    by_window = {(r[0], r[2]): r[3] for r in got}
    assert by_window[(min(w for w, _ in by_window), "view")] == 2

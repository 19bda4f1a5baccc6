from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.asof import (
    asof_join,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _ts(s: str):
    return s


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", "2025-01-10 00:00:00"),  # after both right rows
            (2, "u1", "2025-01-05 00:00:00"),  # exactly at right ts (tie → match)
            (3, "u1", "2025-01-01 00:00:00"),  # before all right rows → null
            (4, "u2", "2025-01-10 00:00:00"),  # no right rows for u2 → null
        ],
        "event_id int, user string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("u1", "2025-01-05 00:00:00", 100),
            ("u1", "2025-01-08 00:00:00", 200),
        ],
        "user string, ots string, val int",
    ).withColumn("ots", F.col("ots").cast("timestamp"))
    out = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ots",
        right_payload=["val"], tiebreak="val",
    )
    got = {r["event_id"]: r["val"] for r in out.collect()}
    assert got == {1: 200, 2: 100, 3: None, 4: None}
    assert out.count() == left.count()  # left join: every left row survives


def test_asof_same_ts_duplicates_resolve_to_max_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "u", "2025-01-05 00:00:00")], "event_id int, user string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u", "2025-01-05 00:00:00", 7), ("u", "2025-01-05 00:00:00", 9)],
        "user string, ots string, val int",
    ).withColumn("ots", F.col("ots").cast("timestamp"))
    out = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ots",
        right_payload=["val"], tiebreak="val",
    )
    assert out.collect()[0]["val"] == 9


def test_sessionize_gap_splits(spark):
    ev = spark.createDataFrame(
        [
            (1, "u", "2025-01-01 10:00:00"),
            (2, "u", "2025-01-01 10:10:00"),  # 10 min → same session
            (3, "u", "2025-01-01 11:00:00"),  # 50 min gap → new session
            (4, "v", "2025-01-01 10:00:00"),  # other user: own session
        ],
        "event_id int, user string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    s = sessionize(ev, "user", "ts", gap_seconds=1800, tiebreak="event_id")
    got = {r["event_id"]: r["session_id"] for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}
    stats = session_stats(ev, "user", "ts", 1800, "event_id").collect()
    by_key = {(r["user"], r["session_id"]): (r["n_events"], r["span_s"]) for r in stats}
    assert by_key[("u", 1)] == (2, 600)
    assert by_key[("u", 2)] == (1, 0)
    assert by_key[("v", 1)] == (1, 0)

"""Sequential EWMA smoothing — exact integer recursion, Arrow-batched
per series."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.timeseries import (
    ewma_halving,
)


def test_ewma_recursion_matches_hand_walk(spark):
    rows = [("a", 1, 100), ("a", 2, 50), ("a", 3, 51), ("b", 1, 7)]
    df = spark.createDataFrame(rows, "g string, t int, x long")
    got = {
        (r["g"], r["t"]): r["ewma"]
        for r in ewma_halving(df, ["g"], "t", "x").collect()
    }
    # a: 100 -> (50+100)//2=75 -> (51+75)//2=63 ; b: 7
    assert got == {
        ("a", 1): 100,
        ("a", 2): 75,
        ("a", 3): 63,
        ("b", 1): 7,
    }


def test_ewma_truncating_semantics_on_negatives_and_determinism(spark):
    # SQL DIV truncates toward zero (DuckDB // agrees): (-3 + 0) DIV 2
    # == -1, NOT Python floor's -2
    df = spark.createDataFrame(
        [("g", 1, -3), ("g", 2, 0)], "g string, t int, x long"
    )
    [_, r2] = sorted(
        ewma_halving(df, ["g"], "t", "x").collect(),
        key=lambda r: r["t"],
    )
    assert r2["ewma"] == -1
    # partitioning-invariant: same result at any parallelism
    wide = spark.createDataFrame(
        [("g", t, t * 13 % 97) for t in range(200)],
        "g string, t int, x long",
    ).repartition(16)
    a = sorted(map(tuple, ewma_halving(wide, ["g"], "t", "x").collect()))
    b = sorted(
        map(
            tuple,
            ewma_halving(wide.coalesce(1), ["g"], "t", "x").collect(),
        )
    )
    assert a == b


def test_ewma_rejects_nulls_and_order_ties(spark):
    with pytest.raises(ValueError, match="NULL"):
        ewma_halving(
            spark.createDataFrame(
                [("g", 1, None)], "g string, t int, x long"
            ),
            ["g"],
            "t",
            "x",
        )
    with pytest.raises(ValueError, match="order-ambiguous"):
        ewma_halving(
            spark.createDataFrame(
                [("g", 1, 5), ("g", 1, 6)], "g string, t int, x long"
            ),
            ["g"],
            "t",
            "x",
        )


def test_streaming_ewma_maintenance_exactly_once(spark, tmp_path):
    """Streamed per-key EWMA state equals the batch operator's
    endpoint over the concatenated feed after every batch; replays
    no-op; a fresh checkpoint rebuilds; out-of-order data is rejected
    loudly."""
    import os

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
        read_maintained_ewma,
        stream_ewma_maintenance,
    )

    raw = str(tmp_path / "raw")
    state = str(tmp_path / "ewma")
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        os.makedirs(raw, exist_ok=True)
        with open(os.path.join(raw, name), "w") as f:
            f.write("k,t,x\n")
            for k, t, x in rows:
                f.write(f"{k},{t},{x}\n")

    feed: dict[str, list] = {}
    batches = [
        [("a", 1, 100), ("a", 2, 50), ("b", 1, 7)],
        [("a", 3, 51), ("b", 2, 9), ("c", 1, 40)],
        [("c", 2, 44), ("c", 3, 48)],
    ]
    for i, rows in enumerate(batches, start=1):
        write(f"b{i}.csv", rows)
        q = stream_ewma_maintenance(spark, raw, state, ckpt)
        q.awaitTermination(120)
        for k, t, x in rows:
            feed.setdefault(k, []).append((t, x))
        got = {
            r["k"]: (r["t"], r["ewma"])
            for r in read_maintained_ewma(spark, state).collect()
        }
        full = spark.createDataFrame(
            [(k, t, x) for k, ts in feed.items() for t, x in ts],
            "k string, t long, x long",
        )
        endpoint = {}
        for r in ewma_halving(full, ["k"], "t", "x").collect():
            cur = endpoint.get(r["k"])
            if cur is None or r["t"] > cur[0]:
                endpoint[r["k"]] = (r["t"], r["ewma"])
        assert got == endpoint, f"after batch {i}"

    # replay no-op; fresh checkpoint rebuilds to the same state
    q = stream_ewma_maintenance(spark, raw, state, ckpt)
    q.awaitTermination(120)
    q = stream_ewma_maintenance(spark, raw, state, str(tmp_path / "ck2"))
    q.awaitTermination(120)
    rebuilt = {
        r["k"]: (r["t"], r["ewma"])
        for r in read_maintained_ewma(spark, state).collect()
    }
    assert rebuilt == endpoint

    # out-of-order arrival fails the batch loudly (on the checkpoint
    # that now owns the table — the rebuild stamped its app id)
    write("b9.csv", [("a", 2, 999)])
    q = stream_ewma_maintenance(spark, raw, state, str(tmp_path / "ck2"))
    with pytest.raises(Exception, match="out-of-order"):
        q.awaitTermination(120)
        q.processAllAvailable()
    # the failed batch must not have corrupted state
    assert {
        r["k"]: (r["t"], r["ewma"])
        for r in read_maintained_ewma(spark, state).collect()
    } == endpoint

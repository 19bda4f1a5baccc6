"""Maintained aggregates driven by a table's change feed
(`streaming/cdfmaint.py`): a snapshot table's commits — appends, DV
deletes, DV updates, partition rewrites — flow through the snapshot_cdf
source into the exactly-once maintenance twins, and the maintained
state always equals the batch aggregate of the table's live rows."""

from __future__ import annotations

from pyspark.sql import Row

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming import (
    aggmaint as AM,
    cdfmaint as CM,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(g=g, amt=float(a)) for g, a in rows]
    )


def _expected_minmax(spark, path):
    import pyspark.sql.functions as F

    return {
        r["g"]: (r["mn"], r["mx"])
        for r in S.read(spark, path)
        .groupBy("g")
        .agg(
            F.min(F.floor(F.col("amt") * 100 + F.lit(0.5)).cast("long"))
            .alias("mn"),
            F.max(F.floor(F.col("amt") * 100 + F.lit(0.5)).cast("long"))
            .alias("mx"),
        )
        .collect()
    }


def _run_minmax(spark, tmp, src):
    q = CM.table_minmax_maintenance(
        spark,
        src,
        str(tmp / "fact"),
        str(tmp / "state"),
        str(tmp / "ckpt"),
        key_col="g",
        val_col="amt",
    )
    q.awaitTermination()


def _got_minmax(spark, tmp):
    return {
        r["k"]: (r["min_scaled"], r["max_scaled"])
        for r in AM.read_maintained_minmax(
            spark, str(tmp / "state")
        ).collect()
    }


def test_minmax_tracks_table_through_all_commit_kinds(spark, tmp_path):
    src = str(tmp_path / "src")
    S.commit(
        spark, _df(spark, [("a", 10), ("a", 30), ("b", 20)]), src
    )
    _run_minmax(spark, tmp_path, src)
    assert _got_minmax(spark, tmp_path) == {
        "a": (1000, 3000),
        "b": (2000, 2000),
    }

    # DV delete of the current MAX of group a: endpoint must retreat
    S.delete_where_dv(spark, src, "amt = 30.0")
    # DV update moves b's value
    S.update_where_dv(spark, src, "g = 'b'", {"amt": "amt + 5.0"})
    # append a fresh group
    S.commit(spark, _df(spark, [("c", 7)]), src, mode="append")
    _run_minmax(spark, tmp_path, src)
    assert _got_minmax(spark, tmp_path) == _expected_minmax(spark, src)
    assert _got_minmax(spark, tmp_path) == {
        "a": (1000, 1000),
        "b": (2500, 2500),
        "c": (700, 700),
    }

    # OPTIMIZE must not perturb the state (no change rows)
    S.compact(spark, src)
    _run_minmax(spark, tmp_path, src)
    assert _got_minmax(spark, tmp_path) == _expected_minmax(spark, src)


def test_replay_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    S.commit(spark, _df(spark, [("a", 10)]), src)
    _run_minmax(spark, tmp_path, src)
    before = _got_minmax(spark, tmp_path)
    # no new commits: a second availableNow pass must change nothing
    _run_minmax(spark, tmp_path, src)
    assert _got_minmax(spark, tmp_path) == before


def test_agg_count_sum_tracks_table(spark, tmp_path):
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    S.commit(
        spark, _df(spark, [("a", 10), ("a", 20), ("b", 5)]), src
    )
    S.delete_where_dv(spark, src, "g = 'b'")
    q = CM.table_agg_maintenance(
        spark,
        src,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        key_col="g",
        val_col="amt",
    )
    q.awaitTermination()
    got = {
        r["k"]: (r["cnt"], r["sum_scaled"])
        for r in AM.read_maintained_agg(
            spark, str(tmp_path / "state")
        ).collect()
    }
    want = {
        r["g"]: (r["n"], r["s"])
        for r in S.read(spark, src)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("amt") * 100 + F.lit(0.5)).cast("long")
            ).alias("s"),
        )
        .collect()
    }
    assert got == want == {"a": (2, 3000)}


def test_partition_rewrite_churn_is_absorbed(spark, tmp_path):
    """A matched MERGE rewrites its partition; the coarse D/I pairs for
    carried rows must leave the aggregate exactly at the batch truth."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        TableSpec,
    )

    spec = TableSpec(
        name="t",
        schema=StructType(
            [
                StructField("id", LongType(), False),
                StructField("g", StringType(), False),
                StructField("amt", DoubleType(), True),
            ]
        ),
        primary_key="id",
        partition_by=("g",),
    )
    src = str(tmp_path / "src")
    S.merge_commit(
        spark,
        spark.createDataFrame(
            [Row(id=1, g="a", amt=10.0), Row(id=2, g="a", amt=30.0)]
        ),
        src,
        spec,
    )
    _run_minmax(spark, tmp_path, src)
    # matched MERGE: id=2 drops to 5, id=3 joins — partition a rewrites
    S.merge_commit(
        spark,
        spark.createDataFrame(
            [Row(id=2, g="a", amt=5.0), Row(id=3, g="a", amt=8.0)]
        ),
        src,
        spec,
    )
    _run_minmax(spark, tmp_path, src)
    assert _got_minmax(spark, tmp_path) == _expected_minmax(spark, src)
    assert _got_minmax(spark, tmp_path) == {"a": (500, 1000)}


def test_topk_tracks_table_with_deletes(spark, tmp_path):
    src = str(tmp_path / "src")
    S.commit(
        spark,
        _df(
            spark,
            [("a", 10), ("a", 30), ("a", 20), ("a", 40), ("b", 5)],
        ),
        src,
    )
    S.delete_where_dv(spark, src, "amt = 40.0")  # evict a's current top
    q = CM.table_topk_maintenance(
        spark,
        src,
        str(tmp_path / "fact"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        key_col="g",
        val_col="amt",
        k=2,
    )
    q.awaitTermination()
    got = {
        (r["k"], r["pos"]): r["val_scaled"]
        for r in AM.read_maintained_topk(
            spark, str(tmp_path / "state"), k=2
        ).collect()
    }
    assert got == {
        ("a", 1): 3000,
        ("a", 2): 2000,
        ("b", 1): 500,
    }


def test_hll_from_table_appends_and_refuses_changes(spark, tmp_path):
    """Monotone sketches maintain from the APPEND tail: NDV tracks
    appended rows, and a delete in the source fails the stream loudly
    (registers cannot retract) instead of serving a stale estimate."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row
    from pyspark.sql.streaming import StreamingQueryException

    import pytest as _pytest

    src = str(tmp_path / "src")
    rows = [Row(g="a", item=f"i{n}") for n in range(40)] + [
        Row(g="b", item="x")
    ]
    S.commit(spark, spark.createDataFrame(rows), src)
    S.commit(
        spark,
        spark.createDataFrame([Row(g="b", item="y"), Row(g="b", item="x")]),
        src,
        mode="append",
    )
    q = CM.table_hll_maintenance(
        spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        key_col="g", val_col="item",
    )
    q.awaitTermination()
    got = {
        r["k"]: (r["present_regs"], r["est_distinct"])
        for r in AM.read_maintained_hll_estimate(
            spark, str(tmp_path / "state")
        ).collect()
    }
    # present_regs is exact (the raw estimator is deliberately served
    # uncorrected — small-range linear counting is table_ndv's job)
    assert got["b"][0] == 2
    assert 25 <= got["a"][0] <= 40  # 40 items over 64 registers
    assert got["a"][1] > got["b"][1]

    S.delete_where_dv(spark, src, "item = 'x'")
    q2 = CM.table_hll_maintenance(
        spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        key_col="g", val_col="item",
    )
    with _pytest.raises(StreamingQueryException, match="change commit"):
        q2.awaitTermination()

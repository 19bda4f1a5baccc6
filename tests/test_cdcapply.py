"""APPLY CHANGES INTO (`streaming/cdfmaint.apply_changes_into`): a
destination table tracks a source snapshot table as a live keyed
replica through appends, DV deletes, DV updates, and partition
rewrites — exactly-once in effect across checkpointed restarts — plus
the join-based `delete_matching_dv` primitive it rides on."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming import (
    cdfmaint as CM,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
    TableSpec,
)


def _spec(partitioned: bool = False) -> TableSpec:
    return TableSpec(
        name="replica",
        schema=StructType(
            [
                StructField("id", LongType(), False),
                StructField("g", StringType(), True),
                StructField("amt", DoubleType(), True),
            ]
        ),
        primary_key="id",
        partition_by=("g",) if partitioned else (),
    )


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, g=g, amt=float(a)) for i, g, a in rows]
    )


def _sync(spark, src, dst, ckpt, spec, **kw):
    q = CM.apply_changes_into(spark, src, dst, spec, ckpt, **kw)
    q.awaitTermination()


def _rows(spark, path):
    try:
        return sorted(
            (r.id, r.g, r.amt) for r in S.read(spark, path).collect()
        )
    except FileNotFoundError:
        return []


def test_delete_matching_dv_joins_not_inlists(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(
        spark, _df(spark, [(1, "a", 1), (2, "a", 2), (3, "b", 3)]), path
    )
    keys = spark.createDataFrame([Row(id=2), Row(id=3), Row(id=99)])
    v = S.delete_matching_dv(spark, path, keys, ["id"])
    assert v == 1
    assert _rows(spark, path) == [(1, "a", 1.0)]
    # nothing left to match: unchanged head, no empty commit
    assert S.delete_matching_dv(spark, path, keys, ["id"]) == 1


def test_replica_tracks_source_through_all_commit_kinds(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    spec = _spec()
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "a", 20)]), src)
    _sync(spark, src, dst, ckpt, spec)
    assert _rows(spark, dst) == _rows(spark, src)

    S.commit(spark, _df(spark, [(3, "b", 30)]), src, mode="append")
    S.delete_where_dv(spark, src, "id = 2")
    S.update_where_dv(spark, src, "id = 1", {"amt": "amt + 1.0"})
    _sync(spark, src, dst, ckpt, spec)
    assert _rows(spark, dst) == _rows(spark, src) == [
        (1, "a", 11.0),
        (3, "b", 30.0),
    ]


def test_exactly_once_marker_skips_replayed_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    spec = _spec()
    S.commit(spark, _df(spark, [(1, "a", 10)]), src)
    _sync(spark, src, dst, ckpt, spec)
    v_after = S.load_snapshot(dst).version
    # same checkpoint, no new source commits: no destination commit
    _sync(spark, src, dst, ckpt, spec)
    assert S.load_snapshot(dst).version == v_after
    # a fresh checkpoint replays history, but the batch-id marker is
    # 0-based again and <= the recorded one: still no double apply
    _sync(spark, src, dst, str(tmp_path / "ckpt2"), spec)
    assert S.load_snapshot(dst).version == v_after
    assert _rows(spark, dst) == [(1, "a", 10.0)]


def test_partitioned_replica_and_rewrite_commits(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    spec = _spec(partitioned=True)
    S.merge_commit(
        spark, _df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]),
        src, spec,
    )
    _sync(spark, src, dst, ckpt, spec)
    # matched MERGE rewrites partition a (coarse delete+insert in the
    # feed): the netting must upsert the carried row, not delete it
    S.merge_commit(
        spark, _df(spark, [(1, "a", 15), (4, "a", 40)]), src, spec
    )
    _sync(spark, src, dst, ckpt, spec)
    assert _rows(spark, dst) == _rows(spark, src) == [
        (1, "a", 15.0),
        (2, "a", 20.0),
        (3, "b", 30.0),
        (4, "a", 40.0),
    ]


def test_batched_history_nets_per_key(spark, tmp_path):
    """One version per micro-batch (maxVersionsPerTrigger=1): the
    replica passes through intermediate states and still lands exactly
    on the source's final rowset."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    spec = _spec()
    import time as _time

    S.commit(spark, _df(spark, [(1, "a", 10), (2, "a", 20)]), src)
    S.delete_where_dv(spark, src, "id = 1")
    S.commit(spark, _df(spark, [(1, "a", 99)]), src, mode="append")
    want = [(1, "a", 99.0), (2, "a", 20.0)]
    q = CM.apply_changes_into(
        spark, src, dst, spec, ckpt,
        max_versions_per_trigger=1,
        trigger={"processingTime": "0 seconds"},
    )
    try:
        deadline = _time.time() + 90
        while _time.time() < deadline:
            if _rows(spark, dst) == want:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    assert _rows(spark, dst) == _rows(spark, src) == want


def test_crash_between_delete_and_marker_merge_replays_clean(
    spark, tmp_path, monkeypatch
):
    """The crash window the marker design exists for: deletes land
    (non-marker op), the process dies before the marker MERGE, the
    batch replays — the delete re-run must be a no-op and the merge
    must complete, leaving the replica exact with no double-apply."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spec = _spec()
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "a", 20)]), src)
    _sync(spark, src, dst, str(tmp_path / "ckpt"), spec)

    # one batch carrying BOTH a delete (id=2) and an upsert (id=3)
    batch = spark.createDataFrame(
        [
            Row(id=2, g="a", amt=20.0, _change_type="delete",
                _commit_version=1),
            Row(id=3, g="b", amt=30.0, _change_type="insert",
                _commit_version=1),
        ]
    )

    real_merge = S.merge_commit
    calls = {"n": 0}

    def dying_merge(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before the marker merge")
        return real_merge(*a, **kw)

    monkeypatch.setattr(S, "merge_commit", dying_merge)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        CM.apply_changes_batch(spark, dst, spec, batch, batch_id=1)
    # the delete landed without a marker; the replica is mid-batch
    assert _rows(spark, dst) == [(1, "a", 10.0)]
    assert CM.last_applied_changes_batch(dst) == 0

    # replay (what the restarted stream does): delete no-ops, merge
    # completes with the marker
    assert CM.apply_changes_batch(spark, dst, spec, batch, batch_id=1)
    assert _rows(spark, dst) == [(1, "a", 10.0), (3, "b", 30.0)]
    assert CM.last_applied_changes_batch(dst) == 1
    dv_deletes = [
        v
        for v in S._versions(dst)
        if "DELETE" in (S.load_snapshot(dst, v).op or "")
    ]
    assert len(dv_deletes) == 1  # the replayed delete committed nothing

    # a second replay of the marked batch is a full no-op
    assert not CM.apply_changes_batch(spark, dst, spec, batch, batch_id=1)


def test_first_batch_with_net_deletes_creates_replica(spark, tmp_path):
    """A fresh replica whose FIRST batch nets both deletes and upserts
    (insert@v0 + delete@v2 for the same key in one availableNow pass)
    must skip the deletes against the not-yet-existing destination and
    create it from the upserts alone."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spec = _spec()
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "a", 20)]), src)
    S.delete_where_dv(spark, src, "id = 1")
    _sync(spark, src, dst, str(tmp_path / "ckpt"), spec)
    assert _rows(spark, dst) == _rows(spark, src) == [(2, "a", 20.0)]


def test_literal_key_delete_prunes_files(spark, tmp_path):
    """The small-key delete path: with per-file id stats + Blooms on a
    multi-file table, the tombstone scan opens only files that can
    hold the keys — and the result is identical to the join path."""
    path = str(tmp_path / "t")
    lo = _df(spark, [(i, "a", i) for i in range(0, 50)]).coalesce(1)
    hi = _df(spark, [(i, "b", i) for i in range(1000, 1050)]).coalesce(1)
    S.commit(spark, lo, path, stats_for=["id"], bloom_for=["id"])
    S.commit(
        spark, hi, path, mode="append", stats_for=["id"], bloom_for=["id"]
    )
    keys = spark.createDataFrame([Row(id=1001), Row(id=1007)])
    v = S.delete_matching_dv(spark, path, keys, ["id"])
    assert v == 2
    got = sorted(r.id for r in S.read(spark, path).collect())
    assert 1001 not in got and 1007 not in got and len(got) == 98
    # keys no file can hold: unchanged head, zero scan
    ghost = spark.createDataFrame([Row(id=999999)])
    assert S.delete_matching_dv(spark, path, ghost, ["id"]) == 2

"""Snapshot-table protocol: atomic publication, snapshot isolation, time
travel, optimistic concurrency, vacuum of unreferenced data."""

from __future__ import annotations

import os

import pytest

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_commit_read_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    v0 = S.commit(spark, _df(spark, [(1, "a"), (2, "b")]), path)
    v1 = S.commit(spark, _df(spark, [(1, "a2"), (3, "c")]), path)  # overwrite
    assert (v0, v1) == (0, 1)
    assert {r["k"]: r["v"] for r in S.read(spark, path).collect()} == {
        1: "a2", 3: "c"
    }
    assert {r["k"]: r["v"] for r in S.read(spark, path, 0).collect()} == {
        1: "a", 2: "b"
    }
    assert [s.version for s in S.history(path)] == [0, 1]


def test_append_carries_parent_files(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a")]), path)
    S.commit(spark, _df(spark, [(2, "b")]), path, mode="append")
    assert S.read(spark, path).count() == 2
    assert S.read(spark, path, 0).count() == 1  # old snapshot untouched


def test_losing_writer_retries_on_top_of_winner(spark, tmp_path):
    """Simulate the race: the version the writer wants is published first
    by someone else; the commit must land on the next version, and for
    append mode must include the winner's rows."""
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a")]), path)
    # adversary publishes v1 directly through the same protocol
    S.commit(spark, _df(spark, [(2, "adv")]), path, mode="append")
    v = S.commit(spark, _df(spark, [(3, "late")]), path, mode="append")
    assert v == 2
    assert {r["k"] for r in S.read(spark, path).collect()} == {1, 2, 3}


def test_reader_snapshot_is_immune_to_concurrent_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a")]), path)
    pinned = S.read(spark, path)  # resolves the v0 manifest now
    S.commit(spark, _df(spark, [(9, "z")]), path)  # overwrite commits v1
    assert {r["k"] for r in pinned.collect()} == {1}  # still v0's files


def test_vacuum_drops_unreferenced_dirs_and_orphans(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a")]), path)
    S.commit(spark, _df(spark, [(2, "b")]), path)  # v0's dir now dead
    # orphan from a "crashed" writer: data written, never published
    orphan = os.path.join(path, "data", "commit-deadbeef")
    _df(spark, [(99, "orphan")]).write.parquet(orphan)
    deleted = S.vacuum(path, keep_last=1)
    assert any("deadbeef" in d for d in deleted)
    assert len(deleted) == 2  # v0's dir + the orphan
    assert {r["k"] for r in S.read(spark, path).collect()} == {2}
    with pytest.raises(ValueError):
        S.read(spark, path, 0)  # vacuumed history is gone


def test_crashed_writer_leaves_table_readable(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a")]), path)
    # a data dir with no manifest (crash between write and publish)
    _df(spark, [(2, "b")]).write.parquet(
        os.path.join(path, "data", "commit-crash")
    )
    assert {r["k"] for r in S.read(spark, path).collect()} == {1}

"""Vacuum vs time-travel interlock: a reader targeting a vacuumed
version or a timestamp outside the retention window gets a TYPED,
actionable error at resolution time — never a FileNotFoundError from
deep inside a Spark scan — and restore refuses vacuumed targets the
same way. Retention-window versions stay fully readable."""

from __future__ import annotations

import time

import pytest

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import snapshots as S
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources.snapshots import (
    VacuumedVersionError,
)


def _mk(spark, path, n_versions=4):
    ts = []
    for i in range(n_versions):
        S.commit(
            spark,
            spark.range(10 * (i + 1)).selectExpr("id AS k"),
            path,
            mode="overwrite" if i == 0 else "append",
        )
        ts.append(S.load_snapshot(path).committed_at)
    return ts


def test_read_vacuumed_version_raises_typed(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    S.vacuum(path, keep_last=2)
    # surviving versions read fine
    assert S.read(spark, path, 2).count() == 60
    assert S.read(spark, path, 3).count() == 100
    with pytest.raises(VacuumedVersionError, match="removed by vacuum"):
        S.read(spark, path, 0)
    with pytest.raises(VacuumedVersionError, match="oldest surviving"):
        S.load_snapshot(path, 1)
    # a version that NEVER existed is a different error
    with pytest.raises(ValueError, match="not in"):
        S.load_snapshot(path, 99)
    # and the typed error is still a ValueError for broad handlers
    assert issubclass(VacuumedVersionError, ValueError)


def test_timestamp_before_retention_raises_typed(spark, tmp_path):
    path = str(tmp_path / "t")
    ts = _mk(spark, path)
    S.vacuum(path, keep_last=2)
    # a timestamp inside the window resolves
    assert S.version_at_timestamp(path, ts[2]) == 2
    assert S.read(spark, path, timestamp=ts[3]).count() == 100
    with pytest.raises(
        VacuumedVersionError, match="predates the retention window"
    ):
        S.version_at_timestamp(path, ts[0] - 1)
    # a fresh table (nothing vacuumed) keeps the plain too-early error
    fresh = str(tmp_path / "fresh")
    S.commit(spark, spark.range(3).selectExpr("id AS k"), fresh)
    with pytest.raises(ValueError, match="at or before"):
        S.version_at_timestamp(fresh, time.time() - 10_000)


def test_restore_refuses_vacuumed_targets(spark, tmp_path):
    path = str(tmp_path / "t")
    ts = _mk(spark, path)
    S.vacuum(path, keep_last=2)
    with pytest.raises(VacuumedVersionError):
        S.restore(path, version=0)
    with pytest.raises(VacuumedVersionError):
        S.restore(path, timestamp=ts[0] - 1)
    # restoring a surviving version still works and is O(1) metadata
    S.restore(path, version=2)
    assert S.read(spark, path).count() == 60


def test_retention_hours_keeps_window_alive(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    # everything committed moments ago falls inside a 1h window: vacuum
    # must keep ALL versions even with keep_last=1
    S.vacuum(path, keep_last=1, retention_hours=1.0)
    for v in range(4):
        assert S.read(spark, path, v).count() == [10, 30, 60, 100][v]

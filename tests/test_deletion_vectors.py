"""Deletion vectors: row-level DELETE with zero file rewrites — readers
anti-join tombstones, time travel is unaffected, appends carry vectors
forward, compaction materializes and clears them, metadata-only COUNT
stays exact via delete-time dead counts (per-column min/max fail open),
and the whole mechanism works identically on merge-committed
(partitioned) tables."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)


def _mk(spark, tmp_path, stats=False):
    path = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )
    S.commit(
        spark, df, path,
        stats_for=["k"] if stats else None,
    )
    return path


def _data_dirs(path):
    root = os.path.join(path, "data")
    return {
        d for d in os.listdir(root) if not d.startswith("dv-")
    }


def test_dv_delete_filters_reads_without_rewrites(spark, tmp_path):
    path = _mk(spark, tmp_path)
    before_dirs = _data_dirs(path)
    v = S.delete_where_dv(spark, path, "k % 10 = 3")
    assert v == 1
    assert _data_dirs(path) == before_dirs  # no data rewrite
    got = {r["k"] for r in S.read(spark, path).collect()}
    assert got == {i for i in range(100) if i % 10 != 3}
    # time travel: version 0 still has every row
    assert S.read(spark, path, 0).count() == 100


def test_dv_deletes_accumulate_and_no_match_is_noop(spark, tmp_path):
    path = _mk(spark, tmp_path)
    S.delete_where_dv(spark, path, "k < 10")
    v = S.delete_where_dv(spark, path, "k >= 90")
    assert v == 2
    assert S.delete_where_dv(spark, path, "k > 1000") == 2  # no-op
    got = {r["k"] for r in S.read(spark, path).collect()}
    assert got == set(range(10, 90))
    # already-deleted rows never re-tombstone: deleting the same range
    # again is a no-op too
    assert S.delete_where_dv(spark, path, "k < 10") == 2


def test_dv_respected_by_read_where_and_stats_fail_open(spark, tmp_path):
    path = _mk(spark, tmp_path, stats=True)
    assert S.table_stats(path)["rows"] == 100
    S.delete_where_dv(spark, path, "k = 5")
    got = {
        r["k"]
        for r in S.read_where(spark, path, [("k", "<", 10)]).collect()
    }
    assert got == {0, 1, 2, 3, 4, 6, 7, 8, 9}
    st = S.table_stats(path)
    # COUNT stays exact via delete-time dead counts; column min/max
    # fail open (the deleted row may have held the extremum)
    assert st["rows"] == 99
    assert st["cols"] == {"k": None}


def test_append_carries_dv_and_compact_materializes(spark, tmp_path):
    path = _mk(spark, tmp_path, stats=True)
    S.delete_where_dv(spark, path, "k < 50")
    extra = spark.range(100, 120).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )
    S.commit(spark, extra, path, mode="append", stats_for=["k"])
    got = {r["k"] for r in S.read(spark, path).collect()}
    assert got == set(range(50, 120))

    v = S.compact(spark, path)
    snap = S.load_snapshot(path, v)
    assert not snap.dv_files  # vectors materialized away
    assert {r["k"] for r in S.read(spark, path).collect()} == set(
        range(50, 120)
    )
    assert S.table_stats(path)["rows"] == 70  # metadata path restored

    # vacuum to the head keeps exactly the live data (dv dirs of dropped
    # versions are reclaimed with them)
    S.vacuum(path, keep_last=1)
    assert {r["k"] for r in S.read(spark, path).collect()} == set(
        range(50, 120)
    )


def _part_spec():
    from pyspark.sql.types import LongType, StructField, StructType

    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        TableSpec,
    )

    return TableSpec(
        name="pt",
        schema=StructType(
            [
                StructField("k", LongType(), False),
                StructField("p", LongType(), False),
            ]
        ),
        primary_key="k",
        partition_by=("p",),
    )


def _mk_part(spark, tmp_path, n=20, mod=2):
    """A merge-committed (hive-partitioned) table — the shape every
    curated table of the reference ships."""
    path = str(tmp_path / "pt")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % mod).alias("p")
    )
    S.merge_commit(spark, df, path, _part_spec())
    return path


def test_dv_delete_on_partitioned_table(spark, tmp_path):
    path = _mk_part(spark, tmp_path)
    before_dirs = _data_dirs(path)
    v = S.delete_where_dv(spark, path, "k % 4 = 1")
    assert v == 1
    assert _data_dirs(path) == before_dirs  # no data rewrite
    assert {r["k"] for r in S.read(spark, path).collect()} == {
        i for i in range(20) if i % 4 != 1
    }
    # time travel to the pre-delete version
    assert S.read(spark, path, 0).count() == 20
    # partition-pruned reads see the tombstones too
    got = {
        r["k"]
        for r in S.read_where(spark, path, [("p", "==", 1)]).collect()
    }
    assert got == {i for i in range(20) if i % 2 == 1 and i % 4 != 1}
    # only partitions holding tombstoned files are marked changed (both
    # here: k%4==1 hits odd k only, but both parities share... p = k%2,
    # k%4==1 → k odd → only partition p=1 is affected)
    snap = S.load_snapshot(path)
    changed = {
        tuple(e["parts"]) for e in snap.part_entries if e["changed"]
    }
    assert changed == {("1",)}
    # metadata-only aggregates fail open while vectors exist
    assert S.table_stats(path)["rows"] is None


def test_dv_update_on_partitioned_table_and_partition_move(
    spark, tmp_path
):
    path = _mk_part(spark, tmp_path)
    v = S.update_where_dv(spark, path, "k = 6", {"k": "k + 100"})
    assert v == 1
    got = {(r["k"], r["p"]) for r in S.read(spark, path).collect()}
    want = {(i, i % 2) for i in range(20) if i != 6} | {(106, 0)}
    assert got == want

    # an update that CHANGES the partition column moves the row: the
    # tombstone kills the old location, the image lands in partition 1
    S.update_where_dv(spark, path, "k = 106", {"p": "1"})
    got = {(r["k"], r["p"]) for r in S.read(spark, path).collect()}
    assert got == {(i, i % 2) for i in range(20) if i != 6} | {(106, 1)}
    assert {
        r["k"]
        for r in S.read_where(spark, path, [("p", "==", 1)]).collect()
    } == {i for i in range(20) if i % 2 == 1} | {106}


def test_merge_after_partitioned_dv_delete_carries_vectors(
    spark, tmp_path
):
    """A MERGE that rewrites one partition must carry the head's
    deletion vectors for the partitions it leaves by reference —
    dropping them would resurrect the DV-deleted rows."""
    path = _mk_part(spark, tmp_path)
    S.delete_where_dv(spark, path, "k IN (3, 5)")  # partition p=1
    src = spark.createDataFrame([(100, 0), (2, 0)], "k long, p long")
    S.merge_commit(spark, src, path, _part_spec())  # touches p=0 only
    got = {r["k"] for r in S.read(spark, path).collect()}
    assert got == (set(range(20)) - {3, 5}) | {100}
    # and a partition-bounded DELETE likewise carries them
    S.delete_where(spark, path, "k = 8")  # rewrites p=0
    got = {r["k"] for r in S.read(spark, path).collect()}
    assert got == (set(range(20)) - {3, 5, 8}) | {100}


def test_partitioned_compact_materializes_dvs(spark, tmp_path):
    path = _mk_part(spark, tmp_path)
    S.delete_where_dv(spark, path, "k < 4")
    v = S.compact(spark, path)
    snap = S.load_snapshot(path, v)
    assert not snap.dv_files  # vectors materialized away
    assert {r["k"] for r in S.read(spark, path).collect()} == set(
        range(4, 20)
    )
    # vacuum reclaims the dv dirs with the dropped versions
    S.vacuum(path, keep_last=1)
    assert {r["k"] for r in S.read(spark, path).collect()} == set(
        range(4, 20)
    )


def test_partitioned_snapshot_diff_sees_dv_deletes(spark, tmp_path):
    """Dir-identity pruning must not hide DV changes: tombstones change
    rows without touching any dir, so the CDF between pre- and post-
    delete versions compares content and reports the deletes."""
    path = _mk_part(spark, tmp_path)
    S.delete_where_dv(spark, path, "k IN (2, 7)")
    d = S.snapshot_diff(spark, path, "k", 0, 1)
    got = {(r["k"], r["_change_type"]) for r in d.collect()}
    assert got == {(2, "delete"), (7, "delete")}
    # and between two versions with the SAME vectors, unchanged
    # partitions still prune (zero changes reported)
    src = spark.createDataFrame([(200, 0)], "k long, p long")
    S.merge_commit(spark, src, path, _part_spec())
    d2 = S.snapshot_diff(spark, path, "k", 1, 2)
    assert {(r["k"], r["_change_type"]) for r in d2.collect()} == {
        (200, "insert")
    }


def test_partitioned_restore_clone_preserve_dvs(spark, tmp_path):
    path = _mk_part(spark, tmp_path)
    S.delete_where_dv(spark, path, "k < 10")  # v1: 10 rows live
    src = spark.createDataFrame([(300, 0)], "k long, p long")
    S.merge_commit(spark, src, path, _part_spec())  # v2: 11 rows

    v = S.restore(path, 1)
    assert S.read(spark, path, v).count() == 10  # not 20

    dst = str(tmp_path / "cl")
    S.clone(path, dst, version=1)
    assert S.read(spark, dst).count() == 10


def test_dv_update_rewrites_nothing_and_is_atomic_versioned(
    spark, tmp_path
):
    path = _mk(spark, tmp_path)
    before_dirs = _data_dirs(path)
    v = S.update_where_dv(
        spark, path, "k % 10 = 7", {"g": "g + 100"}
    )
    assert v == 1
    # originals tombstoned, updated images appended in a NEW dir — the
    # original data dirs are untouched
    assert before_dirs < _data_dirs(path)
    got = {(r["k"], r["g"]) for r in S.read(spark, path).collect()}
    want = {
        (i, (i % 10) + (100 if i % 10 == 7 else 0)) for i in range(100)
    }
    assert got == want
    # time travel pre-update
    assert {
        (r["k"], r["g"]) for r in S.read(spark, path, 0).collect()
    } == {(i, i % 10) for i in range(100)}
    # updating already-updated rows touches the appended images
    S.update_where_dv(spark, path, "g >= 100", {"g": "g + 1000"})
    got = {r["g"] for r in S.read(spark, path).filter("k % 10 = 7").collect()}
    assert got == {1107}
    # no-match no-op
    assert S.update_where_dv(spark, path, "k < 0", {"g": "0"}) == 2


def test_dv_update_rejects_unknown_column(spark, tmp_path):
    import pytest

    path = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown columns"):
        S.update_where_dv(spark, path, "k = 1", {"nope": "1"})


def test_restore_and_clone_preserve_deletion_vectors(spark, tmp_path):
    """RESTORE to a DV-bearing version and CLONE of a DV-bearing head
    must keep the tombstones — dropping them would resurrect deleted
    rows (the erasure-undo failure mode)."""
    path = _mk(spark, tmp_path)
    S.delete_where_dv(spark, path, "k < 10")           # v1 (90 rows)
    extra = spark.range(200, 205).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )
    S.commit(spark, extra, path, mode="overwrite")     # v2 (5 rows)

    v = S.restore(path, 1)
    assert S.read(spark, path, v).count() == 90        # not 100

    dst = str(tmp_path / "cl")
    S.clone(path, dst, version=1)
    assert S.read(spark, dst).count() == 90


def test_dv_update_enforces_check_constraint(spark, tmp_path):
    import pytest

    path = _mk(spark, tmp_path)
    S.set_check_constraint(path, "nonneg", "g >= 0")
    with pytest.raises(Exception, match="nonneg|CHECK|constraint"):
        S.update_where_dv(spark, path, "k = 1", {"g": "-5"})
    # the failed write never published: table unchanged
    assert S.load_snapshot(path).version == 0
    assert S.read(spark, path).count() == 100


def test_snapshot_diff_classifies_dv_deletes(spark, tmp_path):
    """The CDF between a pre- and post-DV-delete version must report the
    tombstoned rows as deletes — the change feed reads through the same
    DV-filtered scan as any other reader."""
    path = _mk(spark, tmp_path)
    S.delete_where_dv(spark, path, "k IN (3, 7)")
    d = S.snapshot_diff(spark, path, "k", 0, 1)
    got = {
        (r["k"], r["_change_type"]) for r in d.collect()
    }
    assert got == {(3, "delete"), (7, "delete")}


def test_concurrent_dv_deletes_both_land(spark, tmp_path):
    """Two real threads issue DV deletes concurrently: the optimistic
    manifest race makes one retry (re-evaluating its predicate against
    the winner's head), and the final state reflects BOTH deletes with a
    linear two-version history on top of the base."""
    import threading

    path = _mk(spark, tmp_path)
    errs = []

    def dv(pred):
        try:
            S.delete_where_dv(spark, path, pred)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=dv, args=("k < 10",))
    t2 = threading.Thread(target=dv, args=("k >= 90",))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert {r["k"] for r in S.read(spark, path).collect()} == set(
        range(10, 90)
    )
    assert S.load_snapshot(path).version == 2


def test_metadata_count_stays_exact_under_dvs(spark, tmp_path):
    """Delete-time per-file dead counts keep the metadata-only COUNT
    exact (and O(manifest)) while deletion vectors exist; per-column
    min/max still fail open (a deleted row may have held the extremum);
    a merge that rewrites one partition orphans its tombstones and the
    count stays exact for the carried rest."""
    path = _mk(spark, tmp_path, stats=True)
    S.delete_where_dv(spark, path, "k % 10 = 3")      # −10 rows
    st = S.table_stats(path)
    assert st["rows"] == 90
    assert st["cols"] == {"k": None}  # min/max correctly fail open
    S.delete_where_dv(spark, path, "k IN (4, 14)")    # −2 more, same files
    assert S.table_stats(path)["rows"] == 88
    # update: tombstone + append — count unchanged
    S.update_where_dv(spark, path, "k = 5", {"g": "g + 1"})
    assert S.table_stats(path)["rows"] == 88
    # compact materializes: vectors cleared, full stats path restored
    S.compact(spark, path)
    st = S.table_stats(path)
    assert st["rows"] == 88 and st["cols"]["k"] is not None

    # partitioned: carried partitions subtract their dead rows; a merge
    # rewriting one partition drops that partition's tombstones from
    # the live set without breaking the count
    pp = str(tmp_path / "pt")
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    S.merge_commit(spark, df, pp, _part_spec(), stats_for=["k"])
    S.delete_where_dv(spark, pp, "k IN (1, 3, 4)")
    assert S.table_stats(pp)["rows"] == 17
    src = spark.createDataFrame([(100, 0)], "k long, p long")
    S.merge_commit(spark, src, pp, _part_spec())  # rewrites p=0 only
    # p=0 rewrite materialized k=4's delete; p=1 still counts its 2
    assert S.table_stats(pp)["rows"] == 18
    assert S.read(spark, pp).count() == 18


def test_partitioned_dv_read_plan_broadcasts_tombstones(
    spark, tmp_path
):
    """Plan-shape pin for the 100 TB read path: the DV filter on a
    partitioned table must execute as a BROADCAST anti-join (tombstones
    are deletion-scale) — never a cartesian/nested-loop, and never a
    sort-merge shuffle of the fact side at this size."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
        executed_plan_text,
    )

    path = _mk_part(spark, tmp_path, n=200)
    S.delete_where_dv(spark, path, "k % 10 = 3")
    plan = executed_plan_text(S.read(spark, path))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_dv_exact_paths_with_encodable_characters(spark, tmp_path):
    """_metadata.file_path is URL-encoded ('my table' →
    'file:/...my%20table...'): the dead-count live-set match and the
    partitioned changed-flag mapping must decode before comparing, or
    counts silently overcount and DV commits mark no partition changed."""
    # table path with a space AND a literal percent sign
    base = tmp_path / "enc dir" / "100%t"
    path = str(base)
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    S.merge_commit(spark, df, path, _part_spec(), stats_for=["k"])
    S.delete_where_dv(spark, path, "k % 5 = 1")  # 10 rows, both parities
    # exact metadata COUNT through the encoded-path round-trip
    assert S.table_stats(path)["rows"] == 40
    # changed flags found their partitions despite the encoding
    snap = S.load_snapshot(path)
    changed = {
        tuple(e["parts"]) for e in snap.part_entries if e["changed"]
    }
    assert changed == {("0",), ("1",)}
    assert {r["k"] for r in S.read(spark, path).collect()} == {
        i for i in range(50) if i % 5 != 1
    }

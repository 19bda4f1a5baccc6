"""Metadata-only RENAME/DROP COLUMN via column mapping (Delta's
columnMapping name mode re-expressed on the manifest log): renames
never touch data files, every read/write path — plain and partitioned
MERGE/DELETE, replaceWhere, scoped OPTIMIZE, DV ops — translates
logical↔physical at one seam, and compact() materializes the
mapping. Racing RENAMEs conflict instead of mislabeling files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, amt double")


def _data_file_count(path):
    return len(S.data_files(path))


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10.0), (2, "b", 20.0)]), path)
    files_before = sorted(S.data_files(path))
    v = S.rename_column(path, "v", "name")
    assert v == 1
    # zero data movement: identical file set, one new manifest
    assert sorted(S.data_files(path)) == files_before
    got = {r["k"]: r["name"] for r in S.read(spark, path).collect()}
    assert got == {1: "a", 2: "b"}
    assert "v" not in S.read(spark, path).columns
    # time travel shows the pre-rename name (mapping is per-manifest)
    assert "v" in S.read(spark, path, 0).columns
    hist = S.describe_history(path)  # newest first
    assert hist[0]["op"] == "RENAME COLUMN"


def test_writes_after_rename_keep_physical_names(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10.0)]), path)
    S.rename_column(path, "v", "name")
    appended = spark.createDataFrame(
        [(2, "b", 20.0)], "k int, name string, amt double"
    )
    S.commit(spark, appended, path, mode="append")
    # on-disk: EVERY file (old and new) carries the physical name "v"
    for f in S.data_files(path):
        cols = set(pq.ParquetFile(f).schema_arrow.names)
        assert "v" in cols and "name" not in cols
    got = {r["k"]: r["name"] for r in S.read(spark, path).collect()}
    assert got == {1: "a", 2: "b"}
    # overwrite after rename also round-trips through the mapping
    S.commit(spark, appended, path, mode="overwrite")
    assert S.read(spark, path).columns == ["k", "name", "amt"]
    assert S.read(spark, path).count() == 1


def test_read_where_prunes_and_filters_on_new_name(spark, tmp_path):
    path = str(tmp_path / "t")
    lo = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(10)],
        "k int, v string, amt double",
    )
    hi = spark.createDataFrame(
        [(i, "y", float(i)) for i in range(100, 110)],
        "k int, v string, amt double",
    )
    S.commit(spark, lo, path, stats_for=["k"])
    S.commit(spark, hi, path, mode="append", stats_for=["k"])
    S.rename_column(path, "k", "id")
    report = {}
    out = S.read_where(
        spark, path, [("id", ">=", 100)], report=report
    )
    assert out.count() == 10
    assert report["files_kept"] < report["files_total"]
    assert set(out.columns) == {"id", "v", "amt"}


def test_drop_column_retires_physical_name(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10.0)]), path)
    S.drop_column(path, "v")
    assert S.read(spark, path).columns == ["k", "amt"]
    # re-introducing a column named after retired physical data must
    # fail — old files would resurrect the dropped values under it
    readd = spark.createDataFrame(
        [(2, 20.0, "ghost")], "k int, amt double, v string"
    )
    with pytest.raises(ValueError, match="retired|collide"):
        S.commit(spark, readd, path, mode="overwrite")
    # compact materializes the drop; afterwards the name is free again
    S.compact(spark, path)
    snap = S.load_snapshot(path)
    assert not snap.column_mapping and not snap.retired_physical
    S.commit(spark, readd, path, mode="overwrite")
    assert set(S.read(spark, path).columns) == {"k", "amt", "v"}


def test_compact_materializes_rename_into_files(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    S.commit(
        spark,
        _df(spark, [(1, "a", 10.0), (2, "b", 20.0)]),
        path,
        stats_for=["k", "v"],
    )
    S.rename_column(path, "v", "name")
    S.compact(spark, path)
    snap = S.load_snapshot(path)
    assert snap.column_mapping is None
    # fresh files now carry the LOGICAL name; stats re-keyed to it
    for f in S.data_files(path):
        assert "name" in set(pq.ParquetFile(f).schema_arrow.names)
    assert set(snap.stats_cols) == {"k", "name"}
    got = {r["k"]: r["name"] for r in S.read(spark, path).collect()}
    assert got == {1: "a", 2: "b"}


def test_dv_delete_and_update_use_logical_names(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(
        spark,
        _df(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]),
        path,
    )
    S.rename_column(path, "amt", "price")
    S.delete_where_dv(spark, path, "price >= 30.0")
    S.update_where_dv(
        spark, path, "price = 20.0", {"price": "price * 2"}
    )
    got = {r["k"]: r["price"] for r in S.read(spark, path).collect()}
    assert got == {1: 10.0, 2: 40.0}
    # the updated-image commit wrote PHYSICAL names: a plain read of
    # every data dir must merge without producing a stray 'price' col
    import pyarrow.parquet as pq

    for f in S.data_files(path):
        assert "amt" in set(pq.ParquetFile(f).schema_arrow.names)


def test_restore_and_clone_carry_the_right_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10.0)]), path)  # v0
    S.rename_column(path, "v", "name")  # v1
    clone_path = str(tmp_path / "c")
    S.clone(path, clone_path)
    assert S.read(spark, clone_path).columns == ["k", "name", "amt"]
    assert {r["name"] for r in S.read(spark, clone_path).collect()} == {"a"}
    # restore to v0: head shows the ORIGINAL column name again
    S.restore(path, 0)
    assert S.read(spark, path).columns == ["k", "v", "amt"]
    # restore back to v1: mapping returns
    S.restore(path, 1)
    assert S.read(spark, path).columns == ["k", "name", "amt"]


def test_table_stats_surface_logical_names(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(
        spark,
        _df(spark, [(1, "a", 10.0), (2, "b", 25.0)]).coalesce(1),
        path,
        stats_for=["amt"],
    )
    S.rename_column(path, "amt", "price")
    st = S.table_stats(path)
    assert st["rows"] == 2
    assert st["cols"]["price"] == {"min": 10.0, "max": 25.0}


def test_guards_refuse_referenced_and_partition_columns(spark, tmp_path):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        TableSpec,
    )

    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10.0)]), path)
    S.set_check_constraint(path, "amt_pos", "amt >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        S.rename_column(path, "amt", "price")
    with pytest.raises(ValueError, match="CHECK constraint"):
        S.drop_column(path, "amt")
    S.drop_check_constraint(path, "amt_pos")
    # unknown / duplicate names
    with pytest.raises(ValueError, match="no column"):
        S.rename_column(path, "zz", "q")
    with pytest.raises(ValueError, match="already exists"):
        S.rename_column(path, "v", "k")
    # MERGE goes through the mapping seam for real; the one refusal
    # left is RE-partitioning by a column that is itself mapped (the
    # hive dir layout cannot carry a logical→physical translation)
    S.rename_column(path, "v", "name")
    import pyarrow.parquet as pq

    spec = TableSpec(
        name="t",
        schema=spark.createDataFrame(
            [], "k int, name string, amt double"
        ).schema,
        primary_key="k",
        partition_by=(),
    )
    src = spark.createDataFrame(
        [(1, "a2", 11.0), (9, "z", 1.0)],
        "k int, name string, amt double",
    )
    S.merge_commit(spark, src, path, spec)
    got = {r["k"]: (r["name"], r["amt"]) for r in S.read(spark, path).collect()}
    assert got == {1: ("a2", 11.0), 9: ("z", 1.0)}
    for f in S.data_files(path):
        cols = set(pq.ParquetFile(f).schema_arrow.names)
        assert "v" in cols and "name" not in cols
    pspec = TableSpec(
        name="t",
        schema=spark.createDataFrame(
            [], "k int, name string, amt double"
        ).schema,
        primary_key="k",
        partition_by=("name",),
    )
    with pytest.raises(ValueError, match="column mapping"):
        S.merge_commit(spark, src, path, pspec)


def test_rename_chain_and_cdf_boundary(spark, tmp_path):
    """A→B→C rename chain keeps pointing at the original physical
    column; a second rename composes, not stacks."""
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10.0)]), path)
    S.rename_column(path, "v", "mid")
    S.rename_column(path, "mid", "final")
    snap = S.load_snapshot(path)
    assert snap.column_mapping == {"final": "v"}
    assert {r["final"] for r in S.read(spark, path).collect()} == {"a"}
    # renaming BACK to the physical name drops the mapping entry
    S.rename_column(path, "final", "v")
    assert not (S.load_snapshot(path).column_mapping or {})


# ---------------------------------------------------------------------------
# Partition-scoped OPTIMIZE (compact_where) — kept in this file because
# it shares the snapshot-layer maintenance surface added this round.
# ---------------------------------------------------------------------------


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


def test_compact_where_rewrites_only_matching_partitions(spark, tmp_path):
    path = str(tmp_path / "pt")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )
    S.merge_commit(spark, df, path, _part_spec())
    # fragment partition p=1 with several single-row merges
    for i in range(3):
        src = spark.createDataFrame([(100 + i, 1)], "k long, p long")
        S.merge_commit(spark, src, path, _part_spec())
    before = S.load_snapshot(path)
    carried_dirs = {
        e["dir"] for e in before.part_entries if e["parts"] != ["1"]
    }
    v = S.compact_where(spark, path, [("p", "==", 1)])
    snap = S.load_snapshot(path)
    assert snap.version == v and snap.op == "OPTIMIZE"
    # non-matching partitions carried BY REFERENCE (same dirs)
    after_dirs = {
        e["dir"] for e in snap.part_entries if e["parts"] != ["1"]
    }
    assert after_dirs == carried_dirs
    # matching partition rewritten into ONE fresh dir, changed=False
    p1 = [e for e in snap.part_entries if e["parts"] == ["1"]]
    assert len(p1) == 1 and p1[0]["changed"] is False
    assert p1[0]["dir"] not in {
        e["dir"] for e in before.part_entries
    }
    # logical rows untouched
    assert {r["k"] for r in S.read(spark, path).collect()} == set(
        range(40)
    ) | {100, 101, 102}


def test_compact_where_materializes_dv_in_scope_keeps_rest(
    spark, tmp_path
):
    path = str(tmp_path / "pt")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    S.merge_commit(spark, df, path, _part_spec())
    S.delete_where_dv(spark, path, "k IN (0, 1, 2, 3)")  # both partitions
    S.compact_where(spark, path, [("p", "==", 0)])
    snap = S.load_snapshot(path)
    # tombstones still referenced (p=1 needs them); reads stay correct
    assert snap.dv_files
    assert {r["k"] for r in S.read(spark, path).collect()} == set(
        range(4, 40)
    )
    # rewritten p=0 files no longer contain the deleted rows even
    # when scanned raw (DVs materialized in scope)
    p0 = [e for e in snap.part_entries if e["parts"] == ["0"]]
    raw = spark.read.parquet(p0[0]["dir"])
    assert {r["k"] for r in raw.collect()} == {
        k for k in range(4, 40) if k % 2 == 0
    }


def test_compact_where_guards_and_no_match(spark, tmp_path):
    path = str(tmp_path / "pt")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    S.merge_commit(spark, df, path, _part_spec())
    with pytest.raises(ValueError, match="partition columns"):
        S.compact_where(spark, path, [("k", "==", 1)])
    assert S.compact_where(spark, path, [("p", "==", 99)]) is None
    # plain tables refuse the scoped form
    plain = str(tmp_path / "plain")
    S.commit(spark, df, plain)
    with pytest.raises(ValueError, match="merge-committed"):
        S.compact_where(spark, plain, [("p", "==", 0)])


def test_describe_detail_surfaces_mapping_and_ndv(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(
        spark,
        _df(spark, [(1, "a", 10.0)]),
        path,
        ndv_for=["k"],
    )
    S.rename_column(path, "v", "name")
    d = S.describe_detail(path)
    assert d["column_mapping"] == {"name": "v"}
    assert d["retired_physical"] == []
    assert d["ndv_columns"] == ["k"]


def test_compact_where_restarts_when_a_merge_races_its_scope(
    spark, tmp_path, monkeypatch
):
    """A MERGE into the scoped partition landing between the rewrite
    and the publish must NOT be erased: compact_where detects the
    conflicting head, abandons the stale rewrite, and restarts from
    the new head — the merged row survives the compaction."""
    path = str(tmp_path / "pt")
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    S.merge_commit(spark, df, path, _part_spec())

    fired = {"n": 0}
    orig = S._hive_leaf_dirs

    def hooked(commit_dir, parts):
        if fired["n"] == 0:
            fired["n"] += 1
            src = spark.createDataFrame([(500, 0)], "k long, p long")
            S.merge_commit(spark, src, path, _part_spec())
        return orig(commit_dir, parts)

    monkeypatch.setattr(S, "_hive_leaf_dirs", hooked)
    v = S.compact_where(spark, path, [("p", "==", 0)])
    snap = S.load_snapshot(path)
    assert snap.version == v and snap.op == "OPTIMIZE"
    got = {r["k"] for r in S.read(spark, path).collect()}
    assert got == set(range(20)) | {500}


# ---------------------------------------------------------------------------
# Round 6: the partitioned write paths learned the mapping seam — the
# reference's curated tables are ALL partitioned (orders_etl.py:74), so
# rename-then-merge on a partitioned table is the first thing a real
# user does.
# ---------------------------------------------------------------------------


def _vspec(spark, label_col: str):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        TableSpec,
    )

    return TableSpec(
        name="t",
        schema=spark.createDataFrame(
            [], f"k long, p long, {label_col} string"
        ).schema,
        primary_key="k",
        partition_by=("p",),
    )


def test_partitioned_lifecycle_on_mapped_table(spark, tmp_path):
    """rename → partitioned MERGE → partition DELETE → DV delete →
    scoped OPTIMIZE → read, all through the mapping seam; compact()
    finally materializes the rename into the files."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "pt")
    df = spark.range(20).selectExpr(
        "id AS k", "id % 2 AS p", "concat('L', id) AS label"
    )
    S.merge_commit(spark, df, path, _vspec(spark, "label"), stats_for=["k"])
    S.rename_column(path, "label", "tag")

    def phys_names():
        cols = set()
        for f in S.data_files(path):
            cols |= set(pq.ParquetFile(f).schema_arrow.names)
        return cols

    # partitioned MERGE under the mapping: upsert + insert
    src = spark.createDataFrame(
        [(1, 1, "X1"), (100, 0, "X100")], "k long, p long, tag string"
    )
    S.merge_commit(spark, src, path, _vspec(spark, "tag"))
    got = {r["k"]: r["tag"] for r in S.read(spark, path).collect()}
    assert got[1] == "X1" and got[100] == "X100" and got[2] == "L2"
    assert "label" in phys_names() and "tag" not in phys_names()

    # partition-granular DELETE with the predicate on the LOGICAL name
    S.delete_where(spark, path, "tag = 'X100'")
    assert 100 not in {r["k"] for r in S.read(spark, path).collect()}
    assert "label" in phys_names() and "tag" not in phys_names()

    # row-level DV delete, then scoped OPTIMIZE over the mapped table
    S.delete_where_dv(spark, path, "k = 3")
    v = S.compact_where(spark, path, [("p", "==", 1)])
    snap = S.load_snapshot(path)
    assert snap.version == v and snap.op == "OPTIMIZE"
    assert snap.column_mapping == {"tag": "label"}
    got = {r["k"] for r in S.read(spark, path).collect()}
    assert got == set(range(20)) - {3, 100} | {1}
    # scoped compaction keeps PHYSICAL names (carried partitions agree)
    assert "label" in phys_names() and "tag" not in phys_names()

    # data-skipping read on the mapped table still prunes
    rep = {}
    assert (
        S.read_where(spark, path, [("k", "==", 5)], report=rep).count()
        == 1
    )

    # full compact materializes: files renamed, mapping cleared
    S.compact(spark, path)
    assert "tag" in phys_names() and "label" not in phys_names()
    assert not (S.load_snapshot(path).column_mapping or {})


def test_replace_where_on_mapped_table(spark, tmp_path):
    """replaceWhere with both scope forms (predicates and keys) on a
    renamed table — the streaming twins' commit path unblocked."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr(
        "id AS k", "concat('v', id) AS label"
    )
    S.commit(spark, df, path, stats_for=["k"], bloom_for=["k"])
    S.rename_column(path, "label", "tag")

    repl = spark.range(5).selectExpr("id AS k", "concat('R', id) AS tag")
    rep = {}
    S.replace_where_commit(
        spark, repl, path, predicates=[("k", "<", 5)], report=rep
    )
    got = {r["k"]: r["tag"] for r in S.read(spark, path).collect()}
    assert got[0] == "R0" and got[4] == "R4" and got[5] == "v5"
    assert len(got) == 100
    for f in S.data_files(path):
        names = set(pq.ParquetFile(f).schema_arrow.names)
        assert "label" in names and "tag" not in names

    # keys-form scope joins on the LOGICAL key column
    keys = spark.createDataFrame([(7,), (8,)], "k long")
    repl2 = spark.createDataFrame(
        [(7, "K7"), (8, "K8")], "k long, tag string"
    )
    S.replace_where_commit(spark, repl2, path, keys=keys, key_cols=["k"])
    got = {r["k"]: r["tag"] for r in S.read(spark, path).collect()}
    assert got[7] == "K7" and got[8] == "K8" and len(got) == 100

    # a predicate on the renamed column itself transposes to the
    # physical stats/blooms (no pruning assertion needed — correctness)
    repl3 = spark.createDataFrame([(0, "Z0")], "k long, tag string")
    S.replace_where_commit(
        spark, repl3, path, predicates=[("tag", "==", "R0")]
    )
    got = {r["k"]: r["tag"] for r in S.read(spark, path).collect()}
    assert got[0] == "Z0" and len(got) == 100


def test_merge_conflicts_on_racing_rename(spark, tmp_path, monkeypatch):
    """A RENAME landing between a partitioned merge's data write and
    its publish must conflict — publishing would mislabel the freshly
    written files under the new mapping."""
    path = str(tmp_path / "pt")
    df = spark.range(10).selectExpr(
        "id AS k", "id % 2 AS p", "concat('L', id) AS label"
    )
    S.merge_commit(spark, df, path, _vspec(spark, "label"))

    fired = {"n": 0}
    orig = S._hive_leaf_dirs

    def hooked(commit_dir, parts):
        if fired["n"] == 0:
            fired["n"] += 1
            S.rename_column(path, "label", "tag")
        return orig(commit_dir, parts)

    monkeypatch.setattr(S, "_hive_leaf_dirs", hooked)
    src = spark.createDataFrame(
        [(1, 1, "X1")], "k long, p long, label string"
    )
    with pytest.raises(RuntimeError, match="concurrent RENAME"):
        S.merge_commit(spark, src, path, _vspec(spark, "label"))
    # the losing merge left no trace; the rename won
    assert "tag" in S.read(spark, path).columns
    assert {r["tag"] for r in S.read(spark, path).collect()} == {
        f"L{i}" for i in range(10)
    }

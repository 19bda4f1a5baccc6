"""Streaming change-data feed over snapshot tables (`streaming/cdf.py`):
inserts, deletion-vector deletes (row-precise), DV updates (pre+post
images), partition rewrites (net-effect delete+insert), OPTIMIZE and
metadata commits emitting nothing, baselines with tombstones excluding
dead rows, and exactly-once delivery across checkpointed restarts —
capped by a feed-replay test that reconstructs the table from changes
alone."""

from __future__ import annotations

from pyspark.sql import Row

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.cdf import (
    read_changes_stream,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, amt=float(a)) for k, v, a in rows]
    )


def _part_spec():
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        TableSpec,
    )

    return TableSpec(
        name="pt",
        schema=StructType(
            [
                StructField("k", LongType(), False),
                StructField("p", LongType(), False),
                StructField("v", StringType(), True),
            ]
        ),
        primary_key="k",
        partition_by=("p",),
    )


def _drain(spark, path, ckpt, **kw):
    """Run one availableNow pass; return the change rows it emitted."""
    got: list = []
    q = (
        read_changes_stream(spark, path, **kw)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _bid: got.extend(df.collect()))
        .start()
    )
    q.awaitTermination()
    return got


def _ct(rows, ct):
    return [r for r in rows if r._change_type == ct]


def test_appends_emit_inserts_with_version(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), path)
    S.commit(spark, _df(spark, [(3, "c", 30)]), path, mode="append")
    got = _drain(
        spark, path, str(tmp_path / "ckpt"), starting_version="earliest"
    )
    assert {r._change_type for r in got} == {"insert"}
    assert sorted((r.k, r._commit_version) for r in got) == [
        (1, 0),
        (2, 0),
        (3, 1),
    ]


def test_dv_delete_emits_precise_delete_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(
        spark, _df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]), path
    )
    _drain(spark, path, ckpt, starting_version="earliest")
    S.delete_where_dv(spark, path, "k = 2")
    got = _drain(spark, path, ckpt)
    assert [(r.k, r.v, r.amt, r._change_type, r._commit_version)
            for r in got] == [(2, "b", 20.0, "delete", 1)]


def test_dv_update_emits_pre_and_post_images(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), path)
    _drain(spark, path, ckpt, starting_version="earliest")
    S.update_where_dv(spark, path, "k = 1", {"amt": "amt + 5"})
    got = _drain(spark, path, ckpt)
    pre = _ct(got, "update_preimage")
    post = _ct(got, "update_postimage")
    assert [(r.k, r.amt) for r in pre] == [(1, 10.0)]
    assert [(r.k, r.amt) for r in post] == [(1, 15.0)]
    assert {r._commit_version for r in got} == {1}


def test_partition_rewrite_is_net_effect_exact(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    spec = _part_spec()
    S.merge_commit(
        spark,
        spark.createDataFrame([Row(k=1, p=10, v="a"), Row(k=2, p=10, v="b")]),
        path,
        spec,
    )
    _drain(spark, path, ckpt, starting_version="earliest")
    # rewrites partition p=10: k=1 updated, k=2 carried, k=3 new
    S.merge_commit(
        spark,
        spark.createDataFrame([Row(k=1, p=10, v="A"), Row(k=3, p=10, v="c")]),
        path,
        spec,
    )
    got = _drain(spark, path, ckpt)
    # coarse but net-effect exact: old partition rows deleted, new
    # partition rows inserted, partition column comes back typed
    assert sorted((r.k, r.v) for r in _ct(got, "delete")) == [
        (1, "a"),
        (2, "b"),
    ]
    assert sorted((r.k, r.v) for r in _ct(got, "insert")) == [
        (1, "A"),
        (2, "b"),
        (3, "c"),
    ]
    assert all(r.p == 10 for r in got)


def test_optimize_and_metadata_emit_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), path)
    S.commit(spark, _df(spark, [(3, "c", 30)]), path, mode="append")
    _drain(spark, path, ckpt, starting_version="earliest")
    S.compact(spark, path)  # rewrites bytes, not rows
    S.rename_column(path, "v", "name")  # metadata-only
    assert _drain(spark, path, ckpt) == []


def test_starting_version_means_changes_from_there(spark, tmp_path):
    """Delta's startingVersion=N contract: version N's COMMIT streams
    as changes (not the snapshot at N as a baseline)."""
    path = str(tmp_path / "t")
    S.commit(
        spark, _df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]), path
    )
    S.delete_where_dv(spark, path, "k = 2")
    got = _drain(
        spark, path, str(tmp_path / "ckpt"), starting_version=1
    )
    assert [(r.k, r._change_type) for r in got] == [(2, "delete")]


def test_vacuumed_baseline_with_tombstones_excludes_dead_rows(
    spark, tmp_path
):
    """Where the tail source must REFUSE (a baseline carrying live
    tombstones would resurrect deleted rows), the change feed can
    represent it: the earliest surviving snapshot emits live rows
    only, dead positions excluded executor-side."""
    path = str(tmp_path / "t")
    S.commit(
        spark, _df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]), path
    )
    S.delete_where_dv(spark, path, "k = 2")
    S.vacuum(path, keep_last=1)  # head (with live tombstones) survives
    got = _drain(
        spark, path, str(tmp_path / "ckpt"), starting_version="earliest"
    )
    assert sorted(r.k for r in got) == [1, 3]
    assert {r._change_type for r in got} == {"insert"}


def test_delete_of_dv_surviving_rows_only(spark, tmp_path):
    """A partition-rewrite delete after a DV delete must not re-report
    the already-dead row."""
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    spec = _part_spec()
    S.merge_commit(
        spark,
        spark.createDataFrame(
            [Row(k=1, p=10, v="a"), Row(k=2, p=10, v="b"),
             Row(k=3, p=20, v="c")]
        ),
        path,
        spec,
    )
    S.delete_where_dv(spark, path, "k = 1")
    _drain(spark, path, ckpt, starting_version="earliest")
    S.delete_where(spark, path, "p = 10")
    got = _drain(spark, path, ckpt)
    # k=1 was already dead at the previous version: only k=2 dies here
    assert [(r.k, r._change_type) for r in got] == [(2, "delete")]


def test_feed_replay_reconstructs_table(spark, tmp_path):
    """Net-effect correctness, end-to-end: applying the whole change
    feed (inserts minus deletes, updates as pre-out/post-in) rebuilds
    exactly the table's final live rowset."""
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), path)
    S.commit(spark, _df(spark, [(3, "c", 30), (4, "d", 40)]), path,
             mode="append")
    S.delete_where_dv(spark, path, "k = 2")
    S.update_where_dv(spark, path, "k = 3", {"amt": "amt * 2"})
    S.compact(spark, path)
    S.commit(spark, _df(spark, [(5, "e", 50)]), path, mode="append")
    got = _drain(
        spark, path, str(tmp_path / "ckpt"), starting_version="earliest"
    )
    state: dict = {}
    for r in sorted(got, key=lambda r: r._commit_version):
        key = (r.k, r.v, r.amt)
        if r._change_type in ("insert", "update_postimage"):
            state[key] = state.get(key, 0) + 1
        else:
            state[key] = state.get(key, 0) - 1
    live = sorted(k for k, n in state.items() if n > 0)
    expect = sorted(
        (r.k, r.v, r.amt) for r in S.read(spark, path).collect()
    )
    assert live == expect


def test_exactly_once_across_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)
    got1 = _drain(spark, path, ckpt, starting_version="earliest")
    assert len(got1) == 1
    # same checkpoint, no new commits: nothing re-emits
    assert _drain(spark, path, ckpt, starting_version="earliest") == []
    S.delete_where_dv(spark, path, "k = 1")
    got2 = _drain(spark, path, ckpt, starting_version="earliest")
    assert [(r.k, r._change_type) for r in got2] == [(1, "delete")]
    assert _drain(spark, path, ckpt, starting_version="earliest") == []


def test_change_data_merge_is_row_precise(spark, tmp_path):
    """merge_commit(change_data=True) writes Delta-style _change_data
    files; the feed emits THOSE (matched keys as update pre+post, new
    keys as insert) instead of whole-partition delete+insert churn."""
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    spec = _part_spec()
    S.merge_commit(
        spark,
        spark.createDataFrame(
            [Row(k=1, p=10, v="a"), Row(k=2, p=10, v="b")]
        ),
        path,
        spec,
        change_data=True,
    )
    _drain(spark, path, ckpt, starting_version="earliest")
    # k=1 updated, k=2 carried (must NOT appear at all), k=3 new
    S.merge_commit(
        spark,
        spark.createDataFrame([Row(k=1, p=10, v="A"), Row(k=3, p=10, v="c")]),
        path,
        spec,
        change_data=True,
    )
    got = _drain(spark, path, ckpt)
    by = sorted((r._change_type, r.k, r.v) for r in got)
    assert by == [
        ("insert", 3, "c"),
        ("update_postimage", 1, "A"),
        ("update_preimage", 1, "a"),
    ]
    assert all(r.p == 10 and r._commit_version == 1 for r in got)


def test_change_data_files_never_leak_into_data_scans(spark, tmp_path):
    """_change_data lives inside the commit dir but is invisible to
    batch reads AND the append-tail stream."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
        read_table_stream,
    )

    path = str(tmp_path / "t")
    spec = _part_spec()
    S.merge_commit(
        spark,
        spark.createDataFrame(
            [Row(k=1, p=10, v="a"), Row(k=2, p=20, v="b")]
        ),
        path,
        spec,
        change_data=True,
    )
    assert sorted(r.k for r in S.read(spark, path).collect()) == [1, 2]
    got: list = []
    q = (
        read_table_stream(spark, path, starting_version="earliest")
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "tc"))
        .foreachBatch(lambda df, _b: got.extend(df.collect()))
        .start()
    )
    q.awaitTermination()
    assert sorted(r.k for r in got) == [1, 2]  # not doubled by CDC rows


def test_feed_replay_reconstructs_through_cdc_merges(spark, tmp_path):
    path = str(tmp_path / "t")
    spec = _part_spec()
    S.merge_commit(
        spark,
        spark.createDataFrame([Row(k=1, p=10, v="a"), Row(k=2, p=20, v="b")]),
        path, spec, change_data=True,
    )
    S.merge_commit(
        spark,
        spark.createDataFrame([Row(k=1, p=10, v="A"), Row(k=4, p=20, v="d")]),
        path, spec, change_data=True,
    )
    S.delete_where_dv(spark, path, "k = 2")
    got = _drain(
        spark, path, str(tmp_path / "ckpt"), starting_version="earliest"
    )
    state: dict = {}
    for r in sorted(got, key=lambda r: r._commit_version):
        key = (r.k, r.p, r.v)
        if r._change_type in ("insert", "update_postimage"):
            state[key] = state.get(key, 0) + 1
        else:
            state[key] = state.get(key, 0) - 1
    live = sorted(k for k, n in state.items() if n > 0)
    expect = sorted(
        (r.k, r.p, r.v) for r in S.read(spark, path).collect()
    )
    assert live == expect == [(1, 10, "A"), (4, 20, "d")]


def test_change_data_delete_is_row_precise(spark, tmp_path):
    """delete_where(change_data=True): the feed emits exactly the
    deleted rows — survivors in the rewritten partition stay silent."""
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    spec = _part_spec()
    S.merge_commit(
        spark,
        spark.createDataFrame(
            [Row(k=1, p=10, v="a"), Row(k=2, p=10, v="b"),
             Row(k=3, p=20, v="c")]
        ),
        path,
        spec,
    )
    _drain(spark, path, ckpt, starting_version="earliest")
    S.delete_where(spark, path, "k = 1", change_data=True)
    got = _drain(spark, path, ckpt)
    assert [(r.k, r.p, r.v, r._change_type) for r in got] == [
        (1, 10, "a", "delete")
    ]


def test_replace_where_is_already_row_precise(spark, tmp_path):
    """replaceWhere commits via deletion vectors + an appended dir, so
    the feed gets row-precise deletes (tombstone positions) and
    inserts (the replacement) with NO write-time change files."""
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(
        spark, _df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]), path
    )
    _drain(spark, path, ckpt, starting_version="earliest")
    S.replace_where_commit(
        spark,
        _df(spark, [(9, "a", 99)]),
        path,
        predicates=[("v", "==", "a")],
    )
    got = _drain(spark, path, ckpt)
    assert sorted((r.k, r._change_type) for r in got) == [
        (1, "delete"),
        (2, "delete"),
        (9, "insert"),
    ]


def test_batch_table_changes_equals_stream(spark, tmp_path):
    """The batch table_changes read plans with the SAME per-version
    classifier as the stream: identical rows for the same range, and
    version-range selection works."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.cdf import (
        table_changes,
    )

    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), path)
    S.commit(spark, _df(spark, [(3, "c", 30)]), path, mode="append")
    S.delete_where_dv(spark, path, "k = 1")
    S.update_where_dv(spark, path, "k = 3", {"amt": "amt * 2"})

    streamed = sorted(
        (r.k, r.v, r.amt, r._change_type, r._commit_version)
        for r in _drain(
            spark, path, str(tmp_path / "ckpt"),
            starting_version="earliest",
        )
    )
    batch = sorted(
        (r.k, r.v, r.amt, r._change_type, r._commit_version)
        for r in table_changes(spark, path).collect()
    )
    assert batch == streamed and len(batch) == 6

    # a bounded range: only the delete commit (version 2)
    ranged = table_changes(
        spark, path, starting_version=2, ending_version=2
    ).collect()
    assert [(r.k, r._change_type) for r in ranged] == [(1, "delete")]

    # refusing an uncommitted ending version, typed like time travel
    import pytest as _pytest

    with _pytest.raises(Exception):
        table_changes(spark, path, ending_version=99).collect()


def test_schema_evolution_null_fills_old_change_rows(spark, tmp_path):
    """The feed reads every version onto the HEAD logical schema:
    change rows from commits predating an added column null-fill it
    (same contract as the tail source), including DV-delete rows read
    back from the old files."""
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), path)
    S.commit(
        spark,
        spark.createDataFrame([Row(k=3, v="c", amt=30.0, extra=99)]),
        path,
        mode="append",
        merge_schema=True,
    )
    S.delete_where_dv(spark, path, "k = 1")
    got = _drain(
        spark, path, str(tmp_path / "ckpt"), starting_version="earliest"
    )
    by = {(r.k, r._change_type): r for r in got}
    assert by[(1, "insert")].extra is None
    assert by[(3, "insert")].extra == 99
    # the delete row re-reads a pre-evolution file: still null-filled
    assert by[(1, "delete")].extra is None
    assert by[(1, "delete")].amt == 10.0


def test_cdf_rename_then_compact_replay_resolves_old_names(
    spark, tmp_path
):
    """Round-6 ADVICE: the change feed must resolve pre-compact files
    under THEIR era's mapping on a rename-then-compact replay (the
    head mapping is cleared by compact, so a head capture null-fills
    the renamed column)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.cdf import (
        table_changes,
    )

    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)  # v0: phys "v"
    S.rename_column(path, "v", "name")  # v1
    S.commit(
        spark,
        spark.createDataFrame([Row(k=2, name="b", amt=20.0)]),
        path,
        mode="append",
    )  # v2: phys "v"
    S.delete_where_dv(spark, path, "k = 1")  # v3: row-precise delete
    S.compact(spark, path)  # v4: logical files, mapping cleared

    got = table_changes(spark, path, starting_version="earliest")
    rows = sorted(
        (r.k, r.name, r._change_type, r._commit_version)
        for r in got.collect()
    )
    assert rows == [
        (1, "a", "delete", 3),
        (1, "a", "insert", 0),
        (2, "b", "insert", 2),
    ]

"""Snapshot tables as a Structured Streaming SOURCE (`streaming/
tablesource.py`): append commits emit exactly once across checkpointed
restarts, OPTIMIZE and metadata-only commits emit nothing, change
commits refuse loudly (or skip on request), hive partition columns and
column-mapped logical names come back typed, and a vacuumed baseline
carrying deletion vectors refuses rather than resurrecting deleted
rows."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
    read_table_stream,
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
    """Run one availableNow pass; return the rows it emitted."""
    got: list = []
    q = (
        read_table_stream(spark, path, **kw)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _bid: got.extend(df.collect()))
        .start()
    )
    q.awaitTermination()
    return got


def test_tail_appends_exactly_once(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), path)
    S.commit(
        spark, _df(spark, [(3, "c", 30)]), path, mode="append"
    )

    got = _drain(spark, path, ckpt, starting_version="earliest")
    assert sorted(r.k for r in got) == [1, 2, 3]
    assert {r.v for r in got} == {"a", "b", "c"}

    # nothing new: a second pass over the same checkpoint emits nothing
    assert _drain(spark, path, ckpt, starting_version="earliest") == []

    # two more appends, one pass: both arrive, prior rows do NOT repeat
    S.commit(spark, _df(spark, [(4, "d", 40)]), path, mode="append")
    S.commit(spark, _df(spark, [(5, "e", 50)]), path, mode="append")
    got2 = _drain(spark, path, ckpt, starting_version="earliest")
    assert sorted(r.k for r in got2) == [4, 5]


def test_default_start_is_current_head(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)
    # no startingVersion: the existing snapshot is NOT replayed
    assert _drain(spark, path, ckpt) == []
    S.commit(spark, _df(spark, [(2, "b", 20)]), path, mode="append")
    got = _drain(spark, path, ckpt)
    assert [r.k for r in got] == [2]


def test_change_commit_refuses_then_skips(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), path)
    S.commit(spark, _df(spark, [(3, "c", 30)]), path, mode="append")
    S.delete_where_dv(spark, path, "k = 2")
    S.commit(spark, _df(spark, [(4, "d", 40)]), path, mode="append")

    with pytest.raises(Exception, match="change commit"):
        _drain(
            spark,
            path,
            str(tmp_path / "ckpt1"),
            starting_version="earliest",
        )

    # skip_change_commits tails the INSERT history only: the deleted
    # row still appears (it was inserted before the delete) — Delta's
    # skipChangeCommits contract, documented, not a bug
    got = _drain(
        spark,
        path,
        str(tmp_path / "ckpt2"),
        starting_version="earliest",
        skip_change_commits=True,
    )
    assert sorted(r.k for r in got) == [1, 2, 3, 4]


def test_optimize_and_metadata_commits_emit_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)
    S.commit(spark, _df(spark, [(2, "b", 20)]), path, mode="append")
    S.commit(spark, _df(spark, [(3, "c", 30)]), path, mode="append")
    S.compact(spark, path)  # OPTIMIZE: bytes rewritten, rows unchanged
    S.commit(spark, _df(spark, [(4, "d", 40)]), path, mode="append")

    got = _drain(spark, path, ckpt, starting_version="earliest")
    # each row exactly once: the compacted rewrite is not re-emitted
    assert sorted(r.k for r in got) == [1, 2, 3, 4]


def test_partitioned_appends_return_typed_partition_columns(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [Row(k=1, p=10, v="a"), Row(k=2, p=20, v="b")]
    )
    spec = _part_spec()
    S.merge_commit(spark, df, path, spec)
    # insert-only into a FRESH partition: structurally append-only
    S.merge_commit(
        spark,
        spark.createDataFrame([Row(k=3, p=30, v="c")]),
        path,
        spec,
    )
    got = _drain(spark, path, ckpt, starting_version="earliest")
    assert sorted((r.k, r.p, r.v) for r in got) == [
        (1, 10, "a"),
        (2, 20, "b"),
        (3, 30, "c"),
    ]
    assert all(isinstance(r.p, int) for r in got)


def test_merge_into_existing_partition_is_a_change_commit(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    spec = _part_spec()
    S.merge_commit(
        spark,
        spark.createDataFrame([Row(k=1, p=10, v="a")]),
        path,
        spec,
    )
    # rewrites partition p=10 (removed dir) even though k=2 is new
    S.merge_commit(
        spark,
        spark.createDataFrame([Row(k=2, p=10, v="b")]),
        path,
        spec,
    )
    with pytest.raises(Exception, match="change commit"):
        _drain(
            spark,
            path,
            str(tmp_path / "ckpt"),
            starting_version="earliest",
        )


def test_column_mapped_table_streams_logical_names(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)
    S.rename_column(path, "v", "name")  # metadata-only
    appended = spark.createDataFrame([Row(k=2, name="b", amt=20.0)])
    S.commit(spark, appended, path, mode="append")

    got = _drain(spark, path, ckpt, starting_version="earliest")
    by_k = {r.k: r for r in got}
    assert set(by_k) == {1, 2}
    # old file's physical column surfaces under the LOGICAL name
    assert by_k[1].name == "a" and by_k[2].name == "b"
    assert "v" not in got[0].asDict()


def test_schema_evolution_null_fills_old_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, spark.createDataFrame([Row(k=1, v="a")]), path)
    S.commit(
        spark,
        spark.createDataFrame([Row(k=2, v="b", extra=99)]),
        path,
        mode="append",
        merge_schema=True,
    )
    got = _drain(spark, path, ckpt, starting_version="earliest")
    by_k = {r.k: r for r in got}
    assert by_k[1].extra is None and by_k[2].extra == 99


def test_vacuumed_dv_baseline_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), path)
    S.delete_where_dv(spark, path, "k = 1")
    S.vacuum(path, keep_last=1)  # head (with live tombstones) survives
    with pytest.raises(Exception, match="tombstone"):
        _drain(
            spark,
            path,
            str(tmp_path / "ckpt"),
            starting_version="earliest",
        )


def test_starting_version_mid_history(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)  # v0
    S.commit(spark, _df(spark, [(2, "b", 20)]), path, mode="append")
    S.commit(spark, _df(spark, [(3, "c", 30)]), path, mode="append")
    got = _drain(spark, path, ckpt, starting_version=1)
    assert sorted(r.k for r in got) == [2, 3]


# --- medallion hop: bronze -> silver, continuously, exactly-once ---------


def _silver_ops(path):
    return [
        S.load_snapshot(path, v).op or ""
        for v in S._versions(path)
    ]


def test_stream_table_to_table_exactly_once(spark, tmp_path):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
        stream_table_to_table,
    )

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10), (2, "b", 20)]), bronze)
    S.commit(spark, _df(spark, [(3, "c", 30)]), bronze, mode="append")

    q = stream_table_to_table(
        spark,
        bronze,
        silver,
        ckpt,
        transform=lambda df: df.filter("amt >= 20"),
    )
    q.awaitTermination()
    assert sorted(
        r.k for r in S.read(spark, silver).collect()
    ) == [2, 3]

    # more bronze commits; rerun from the same checkpoint
    S.commit(spark, _df(spark, [(4, "d", 40)]), bronze, mode="append")
    S.commit(spark, _df(spark, [(5, "e", 5)]), bronze, mode="append")
    q2 = stream_table_to_table(
        spark,
        bronze,
        silver,
        ckpt,
        transform=lambda df: df.filter("amt >= 20"),
    )
    q2.awaitTermination()
    assert sorted(
        r.k for r in S.read(spark, silver).collect()
    ) == [2, 3, 4]

    # a third run with nothing new leaves silver untouched
    before = S._versions(silver)
    q3 = stream_table_to_table(
        spark,
        bronze,
        silver,
        ckpt,
        transform=lambda df: df.filter("amt >= 20"),
    )
    q3.awaitTermination()
    assert S._versions(silver) == before


def test_apply_tail_batch_replay_is_idempotent(spark, tmp_path):
    """A crash between the sink commit and the checkpoint advance makes
    the engine replay the batch: the second apply with the same batch
    id must publish nothing (the id rides the destination manifest)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
        apply_tail_batch,
        last_applied_tail_batch,
    )

    silver = str(tmp_path / "silver")
    batch = _df(spark, [(1, "a", 10), (2, "b", 20)])
    assert apply_tail_batch(spark, silver, batch, 0) is True
    assert last_applied_tail_batch(silver) == 0
    v0 = S._versions(silver)
    # replay of batch 0: no new version, no duplicate rows
    assert apply_tail_batch(spark, silver, batch, 0) is False
    assert S._versions(silver) == v0
    assert len(S.read(spark, silver).collect()) == 2
    # the NEXT batch still lands, and survives an OPTIMIZE on top
    assert apply_tail_batch(
        spark, silver, _df(spark, [(3, "c", 30)]), 1
    )
    S.compact(spark, silver)
    assert last_applied_tail_batch(silver) == 1  # marker found below head
    assert apply_tail_batch(
        spark, silver, _df(spark, [(3, "c", 30)]), 1
    ) is False


def test_max_versions_per_trigger_paces_backfill(spark, tmp_path):
    import time as _time

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
        stream_table_to_table,
    )

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), bronze)
    for i in range(2, 5):
        S.commit(
            spark,
            _df(spark, [(i, chr(96 + i), i * 10)]),
            bronze,
            mode="append",
        )
    q = stream_table_to_table(
        spark,
        bronze,
        silver,
        ckpt,
        max_versions_per_trigger=1,
        trigger={"processingTime": "0 seconds"},
    )
    try:
        deadline = _time.time() + 90
        while _time.time() < deadline:
            try:
                if len(S.read(spark, silver).collect()) >= 4:
                    break
            except FileNotFoundError:
                pass
            _time.sleep(0.5)
    finally:
        q.stop()
    rows = sorted(r.k for r in S.read(spark, silver).collect())
    assert rows == [1, 2, 3, 4]
    # one bounded batch per bronze version: four separate silver commits
    tail_ops = [op for op in _silver_ops(silver) if "@tailbatch=" in op]
    assert len(tail_ops) == 4


def test_max_files_per_trigger_paces_by_file_count(spark, tmp_path):
    """The Delta maxFilesPerTrigger analog: offset advancement stops
    once a batch's cumulative added-file budget is spent, but always
    admits at least one version so the stream never stalls."""
    import time as _time

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
        stream_table_to_table,
    )

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    S.commit(spark, _df(spark, [(1, "a", 10)]), bronze)
    for i in range(2, 5):
        S.commit(
            spark,
            _df(spark, [(i, chr(96 + i), i * 10)]),
            bronze,
            mode="append",
        )
    q = stream_table_to_table(
        spark,
        bronze,
        silver,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        trigger={"processingTime": "0 seconds"},
    )
    try:
        deadline = _time.time() + 90
        while _time.time() < deadline:
            try:
                if len(S.read(spark, silver).collect()) >= 4:
                    break
            except FileNotFoundError:
                pass
            _time.sleep(0.5)
    finally:
        q.stop()
    assert sorted(r.k for r in S.read(spark, silver).collect()) == [
        1, 2, 3, 4,
    ]
    # a 1-file budget admits one bronze version per batch: four hops
    tail_ops = [op for op in _silver_ops(silver) if "@tailbatch=" in op]
    assert len(tail_ops) == 4


def test_rename_then_compact_replay_resolves_old_physical_names(
    spark, tmp_path
):
    """Round-6 ADVICE: compact() materializes logical names and CLEARS
    the column mapping while pre-compact manifests survive, so a
    head-pinned mapping null-fills the renamed column on a replay from
    'earliest'. Era-composed resolution (`_mapping_for`) must surface
    the old physical values under the logical name."""
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)  # v0: physical "v"
    S.rename_column(path, "v", "name")  # v1: mapping {name: v}
    S.commit(
        spark,
        spark.createDataFrame([Row(k=2, name="b", amt=20.0)]),
        path,
        mode="append",
    )  # v2: still physical "v"
    S.compact(spark, path)  # v3: logical-named files, mapping cleared

    got = _drain(spark, path, ckpt, starting_version="earliest")
    # the replay emits v0+v2 (v3 is OPTIMIZE-skipped) — both eras'
    # files must resolve, never null-fill
    by_k = {r.k: r.name for r in got}
    assert by_k == {1: "a", 2: "b"}


def test_two_era_replay_composes_mappings_across_compact(spark, tmp_path):
    """Rename → compact → rename again: resolving the head-logical
    name against first-era files requires composing the head mapping
    with the pre-compact era's final mapping."""
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)  # v0: phys "v"
    S.rename_column(path, "v", "name")  # v1
    S.commit(
        spark,
        spark.createDataFrame([Row(k=2, name="b", amt=20.0)]),
        path,
        mode="append",
    )  # v2: phys "v"
    S.compact(spark, path)  # v3: files now "name", mapping cleared
    S.commit(
        spark,
        spark.createDataFrame([Row(k=3, name="c", amt=30.0)]),
        path,
        mode="append",
    )  # v4: phys "name"
    S.rename_column(path, "name", "label")  # v5: mapping {label: name}
    S.commit(
        spark,
        spark.createDataFrame([Row(k=4, label="d", amt=40.0)]),
        path,
        mode="append",
    )  # v6: phys "name"

    got = _drain(spark, path, ckpt, starting_version="earliest")
    by_k = {r.k: r.label for r in got}
    assert by_k == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_restart_recovery_warms_pacing_cursor(spark, tmp_path):
    """Round-6 ADVICE (high): after a restart the paced reader's first
    latestOffset must never return an offset behind the engine's
    checkpointed position. The engine reconstructs the last
    checkpointed batch first — both the partitions() bounds and
    commit() must warm the cursor, so pacing resumes FROM the
    checkpoint, not from the startingVersion seed."""
    import json as _json

    from pyspark.sql.types import StructType

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
        SnapshotTailReader,
    )

    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)
    for i in range(2, 5):
        S.commit(
            spark,
            _df(spark, [(i, chr(96 + i), i * 10)]),
            path,
            mode="append",
        )  # head = v3
    schema = StructType.fromJson(
        _json.loads(S.load_snapshot(path).schema_json)
    )
    opts = {
        "path": path,
        "startingversion": "earliest",
        "maxversionspertrigger": "1",
    }

    # restart shape 1: clean restart — engine re-plans the committed
    # batch as an empty range (start == end == checkpoint position)
    r = SnapshotTailReader(schema, dict(opts))
    r.partitions({"version": 2}, {"version": 2})
    assert r.latestOffset() == {"version": 3}  # paced from 2, not -1

    # restart shape 2: crash mid-batch — engine re-plans the pending
    # range, then commits it
    r = SnapshotTailReader(schema, dict(opts))
    r.partitions({"version": 1}, {"version": 2})
    r.commit({"version": 2})
    assert r.latestOffset() == {"version": 3}

    # fresh start stays paced: cold cursor seeds from startingVersion
    r = SnapshotTailReader(schema, dict(opts))
    assert r.latestOffset() == {"version": 0}


def test_paced_restart_is_exactly_once(spark, tmp_path):
    """E2E for the round-6 ADVICE (high) offset-regression bug: stop a
    paced backfill stream, append more commits, restart from the same
    checkpoint — every source row must land in the sink EXACTLY once
    (a regressed offset re-delivers committed versions under new batch
    ids, which the @tailbatch marker cannot dedup)."""
    import time as _time

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
        stream_table_to_table,
    )

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), bronze)
    for i in range(2, 5):
        S.commit(
            spark,
            _df(spark, [(i, chr(96 + i), i * 10)]),
            bronze,
            mode="append",
        )

    def _run(expect):
        q = stream_table_to_table(
            spark,
            bronze,
            silver,
            ckpt,
            starting_version="earliest",
            max_versions_per_trigger=1,
            trigger={"processingTime": "0 seconds"},
        )
        try:
            deadline = _time.time() + 90
            while _time.time() < deadline:
                try:
                    if len(S.read(spark, silver).collect()) >= expect:
                        break
                except FileNotFoundError:
                    pass
                _time.sleep(0.5)
            # grace window: a regressing stream would now be busily
            # re-delivering old versions as extra rows
            _time.sleep(3)
        finally:
            q.stop()

    _run(4)
    for i in range(5, 7):
        S.commit(
            spark,
            _df(spark, [(i, chr(96 + i), i * 10)]),
            bronze,
            mode="append",
        )
    _run(6)  # restart from the same checkpoint
    rows = sorted(r.k for r in S.read(spark, silver).collect())
    assert rows == [1, 2, 3, 4, 5, 6]  # no duplicates, nothing lost


def test_post_anchor_rename_then_compact_raises_schema_change(
    spark, tmp_path
):
    """Round-7 ADVICE (low): a rename committed AFTER a long-running
    stream's anchor and then compacted used to silently null-fill the
    renamed column (its anchored name matches neither the post-compact
    mapping nor the materialized file columns). The reader now detects
    the mismatch at the compact boundary and raises a
    restart-required schema-change error; a post-anchor compact with
    NO rename (and a compact of a PRE-anchor rename) stay
    transparent."""
    import json as _json

    from pyspark.sql.types import StructType

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
        ChangeCommitError,
        SnapshotTailReader,
    )

    path = str(tmp_path / "t")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path)  # v0
    schema = StructType.fromJson(
        _json.loads(S.load_snapshot(path).schema_json)
    )
    opts = {"path": path, "startingversion": "earliest"}
    r = SnapshotTailReader(schema, dict(opts))  # anchored at v0
    S.rename_column(path, "v", "name")  # v1: post-anchor rename
    S.compact(spark, path)  # v2: materializes "name"
    with pytest.raises(ChangeCommitError, match="Restart the stream"):
        r.partitions({"version": -1}, {"version": 2})

    # transparent case 1: post-anchor compact without any rename
    path2 = str(tmp_path / "t2")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path2)
    r2 = SnapshotTailReader(schema, {**opts, "path": path2})
    S.commit(
        spark, _df(spark, [(2, "b", 20)]), path2, mode="append"
    )
    S.compact(spark, path2)
    parts = r2.partitions({"version": -1}, {"version": 2})
    assert parts  # plans, no raise

    # transparent case 2: PRE-anchor rename compacted after the anchor
    path3 = str(tmp_path / "t3")
    S.commit(spark, _df(spark, [(1, "a", 10)]), path3)
    S.rename_column(path3, "v", "name")
    schema3 = StructType.fromJson(
        _json.loads(S.load_snapshot(path3).schema_json)
    )
    r3 = SnapshotTailReader(schema3, {**opts, "path": path3})
    S.compact(spark, path3)
    parts3 = r3.partitions({"version": -1}, {"version": 2})
    assert parts3


def test_restart_protocol_reconstructs_before_paced_latest_offset(
    spark, tmp_path
):
    """SPARK-UPGRADE PIN (round-8 ADVICE, low): the cold-cursor
    pacing seed in latestOffset is safe on restart ONLY because the
    engine reconstructs the last checkpointed batch (a
    partitions(start, end) call) before the first paced latestOffset
    consults the cursor. That is observed Spark 4.1 behavior, not an
    API contract — this test records the reader's driver-side call
    order through the traceFile seam and fails loudly if a Spark
    version bump ever reorders it (which would reopen the
    offset-regression hole test_paced_restart_is_exactly_once covers
    end to end)."""
    bronze = str(tmp_path / "b")
    ckpt = str(tmp_path / "ck")
    trace = str(tmp_path / "trace.txt")
    S.commit(spark, _df(spark, [(1, "a", 10)]), bronze)
    for i in range(2, 4):
        S.commit(
            spark, _df(spark, [(i, "b", i)]), bronze, mode="append"
        )
    # paced availableNow advances one version per drain, so the
    # second drain below is a genuine restart from the checkpoint
    # with more versions still pending
    got = _drain(
        spark, bronze, ckpt,
        starting_version="earliest", max_versions_per_trigger=1,
    )
    assert sorted(r.k for r in got) == [1]
    got2 = _drain(
        spark, bronze, ckpt,
        starting_version="earliest", max_versions_per_trigger=1,
        trace_file=trace,
    )
    assert sorted(r.k for r in got2) == [2]
    with open(trace) as fh:
        events = [ln.strip() for ln in fh if ln.strip()]
    latest = [
        i for i, e in enumerate(events) if e.startswith("latestOffset")
    ]
    assert latest, events
    first = latest[0]
    # the engine revealed its checkpointed position (a partitions or
    # commit call) BEFORE the first latestOffset ran...
    assert any(
        e.startswith(("partitions", "commit")) for e in events[:first]
    ), events
    # ...so that latestOffset was NOT cold: the defensive resolve-
    # start seed never decided the restarted stream's first offset
    assert events[first].endswith("cold=False"), events


def test_post_anchor_type_widening_raises_schema_change(
    spark, tmp_path
):
    """Round-8 ADVICE (medium): a stream anchored before a
    type-widening commit used to read post-widening files through an
    arrow cast against the anchored schema — silently NARROWING
    fitting values and raising a raw ArrowInvalid on overflowing
    ones. The reader now raises the typed restart-required
    schema-change error at the widening commit; an appended COLUMN
    (additive change) stays transparent."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
        ChangeCommitError,
        SnapshotTailReader,
    )

    path = str(tmp_path / "tw")
    narrow = _df(spark, [(1, "a", 10)]).select(
        F.col("k").cast("int").alias("k"), "v",
        F.col("amt").cast("float").alias("amt"),
    )
    S.commit(spark, narrow, path)  # v0: int k, float amt
    schema = StructType.fromJson(
        _json.loads(S.load_snapshot(path).schema_json)
    )
    opts = {"path": path, "startingversion": "earliest"}
    r = SnapshotTailReader(schema, dict(opts))  # anchored at v0
    wide = _df(spark, [(2, "b", 20)]).select(
        (F.col("k") + F.lit(10_000_000_000)).alias("k"), "v", "amt",
    )
    S.commit(
        spark, wide, path, mode="append", merge_schema=True
    )  # v1: k widens int->bigint, amt float->double
    with pytest.raises(
        ChangeCommitError, match="Restart the stream"
    ) as ei:
        r.partitions({"version": -1}, {"version": 1})
    assert "k" in str(ei.value) and "bigint" in str(ei.value)

    # additive change (new column) stays transparent: the anchored
    # schema simply never selects it
    path2 = str(tmp_path / "tw2")
    S.commit(spark, narrow, path2)
    r2 = SnapshotTailReader(schema, {**opts, "path": path2})
    extra = narrow.withColumn("note", F.lit("x")).withColumn(
        "k", F.col("k") + 1
    )
    S.commit(spark, extra, path2, mode="append", merge_schema=True)
    parts = r2.partitions({"version": -1}, {"version": 1})
    assert parts  # plans, no raise
    rows = [row for p in parts for row in r2.read(p)]
    assert rows  # and the anchored-read path still decodes the files

"""Streaming IVF index maintenance: appended batches land exactly once,
the maintained index loses no vector (full-probe query equals an
independent brute-force ranking), replays are no-ops, and a lost
checkpoint rebuilds the index from the re-delivered feed."""

from __future__ import annotations

import json
import math
import os

from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming import (
    annindex as AI,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.annindex import (
    build_ivf_codebook,
    ivf_index_topk,
    read_index,
    stream_ivf_index_maintenance,
)


def _vec(i: int) -> list[float]:
    # deterministic, well-spread unit-ish vectors
    return [
        math.sin(i * 1.7 + d) + 0.1 * d for d in range(8)
    ]


def _write(path: str, ids: list[int]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for i in ids:
            f.write(
                json.dumps({"vec_id": i, "embedding": _vec(i)}) + "\n"
            )


def _brute_topk(corpus_ids, query_ids, k):
    """Independent python reference: cosine rounded to 5, ties by cid."""
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(num / (na * nb), 5)

    out = {}
    for q in query_ids:
        scored = sorted(
            ((cos(_vec(q), _vec(c)), c) for c in corpus_ids),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (s, c) in enumerate(scored[:k], start=1):
            out[(q, rank)] = (c, s)
    return out


def test_streaming_ivf_index_exactly_once_and_lossless(spark, tmp_path):
    raw = str(tmp_path / "raw")
    cb = str(tmp_path / "codebook")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    seed_ids = list(range(0, 40))
    seed = spark.createDataFrame(
        [(i, _vec(i)) for i in seed_ids],
        "vec_id long, embedding array<double>",
    )
    build_ivf_codebook(spark, seed, cb, stride=10)  # 4 cells
    n_cells = 4

    b1, b2 = list(range(100, 130)), list(range(130, 150))
    _write(os.path.join(raw, "b1.json"), b1)
    q = stream_ivf_index_maintenance(spark, raw, cb, idx, ckpt)
    q.awaitTermination(120)
    assert read_index(spark, idx).count() == len(b1)

    _write(os.path.join(raw, "b2.json"), b2)
    q = stream_ivf_index_maintenance(spark, raw, cb, idx, ckpt)
    q.awaitTermination(120)
    assert read_index(spark, idx).count() == len(b1) + len(b2)

    # full-probe query == independent brute force: nothing was lost or
    # duplicated by the incremental appends
    queries = spark.createDataFrame(
        [(i, _vec(i)) for i in (7, 8, 9)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["qid"], r["rank"]): (r["cid"], r["cos"])
        for r in ivf_index_topk(
            spark, idx, cb, queries, k=3, nprobe=n_cells
        ).collect()
    }
    assert got == _brute_topk(b1 + b2, [7, 8, 9], 3)

    # pruned probe returns a subset drawn from the probed cells only
    pruned = ivf_index_topk(spark, idx, cb, queries, k=3, nprobe=1)
    assert 0 < pruned.count() <= 9

    # replay: rerun on the same checkpoint with no new files — no-op
    q = stream_ivf_index_maintenance(spark, raw, cb, idx, ckpt)
    q.awaitTermination(120)
    assert read_index(spark, idx).count() == len(b1) + len(b2)

    # lost checkpoint: fresh one re-reads the feed and REBUILDS the
    # index to the same contents (no double-append)
    q = stream_ivf_index_maintenance(
        spark, raw, cb, idx, str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    assert read_index(spark, idx).count() == len(b1) + len(b2)
    got2 = {
        (r["qid"], r["rank"]): (r["cid"], r["cos"])
        for r in ivf_index_topk(
            spark, idx, cb, queries, k=3, nprobe=n_cells
        ).collect()
    }
    assert got2 == got


def test_drift_triggers_recluster_and_recall_recovers(spark, tmp_path):
    """The IVF lifecycle loop: a frozen codebook trained on the seed
    region splits a later, drifted vector cluster across far-apart
    cells (assignment decided by tiny noise), so nprobe=1 recall
    against the brute-force twin decays; check_and_recluster observes
    the decay, retrains the codebook on the current index and
    re-assigns every row, recall recovers, compaction bounds the file
    count, and the maintenance stream resumes seamlessly (watermark
    re-stamped through the rebuild)."""
    import math

    from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
        snapshots as S,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.annindex import (
        check_and_recluster,
        ivf_index_recall,
    )

    raw = str(tmp_path / "raw")
    cb = str(tmp_path / "codebook")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    def seed_vec(i: int) -> list[float]:
        th = math.radians(i * 6.0)  # xy-plane directions
        return [math.cos(th), math.sin(th), 0.0]

    def drift_vec(i: int) -> list[float]:
        # a single tight +z cluster; the ±x noise is what the FROZEN
        # xy-plane codebook keys on, splitting near-identical vectors
        # into opposite cells
        s = 0.001 if i % 2 == 0 else -0.001
        return [s, 0.0, 1.0]

    def write(path, rows):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            for i, v in rows:
                f.write(json.dumps({"vec_id": i, "embedding": v}) + "\n")

    seed = [(i, seed_vec(i)) for i in range(60)]
    # codebook: every 10th seed id -> 6 xy centroids at 0..300 degrees
    build_ivf_codebook(
        spark,
        spark.createDataFrame(
            [(i, v) for i, v in seed],
            "vec_id long, embedding array<double>",
        ),
        cb, stride=10,
    )

    write(os.path.join(raw, "b1.json"), seed)
    q = stream_ivf_index_maintenance(
        spark, raw, cb, idx, ckpt, compact_every=2
    )
    q.awaitTermination(120)

    drifted = [(i, drift_vec(i)) for i in range(101, 201)]
    write(os.path.join(raw, "b2.json"), drifted[:50])
    q = stream_ivf_index_maintenance(
        spark, raw, cb, idx, ckpt, compact_every=2
    )
    q.awaitTermination(120)
    write(os.path.join(raw, "b3.json"), drifted[50:])
    q = stream_ivf_index_maintenance(
        spark, raw, cb, idx, ckpt, compact_every=2
    )
    q.awaitTermination(120)

    # compaction cadence bounded the append debt: batch id 1 compacted,
    # so the head references at most the compacted dir + one append
    assert len(S.load_snapshot(idx).dirs) <= 2

    probes = spark.createDataFrame(
        [(9000 + j, drift_vec(9000 + j)) for j in range(4)],
        "vec_id long, embedding array<double>",
    )
    recall, rebuilt = check_and_recluster(
        spark, idx, cb, probes, k=5, nprobe=1, threshold=0.8, stride=10
    )
    assert recall < 0.8, f"drift did not decay recall: {recall}"
    assert rebuilt
    after = ivf_index_recall(spark, idx, cb, probes, k=5, nprobe=1)
    assert after >= 0.95, f"recall did not recover: {after}"

    # the stream resumes on the rebuilt table: a late batch applies
    # exactly once on top of the re-stamped watermark
    late = [(i, drift_vec(i)) for i in range(301, 311)]
    write(os.path.join(raw, "b4.json"), late)
    q = stream_ivf_index_maintenance(
        spark, raw, cb, idx, ckpt, compact_every=2
    )
    q.awaitTermination(120)
    assert read_index(spark, idx).count() == 60 + 100 + 10
    # replay: no growth
    q = stream_ivf_index_maintenance(
        spark, raw, cb, idx, ckpt, compact_every=2
    )
    q.awaitTermination(120)
    assert read_index(spark, idx).count() == 170


def test_pq_drift_decays_adc_recall_and_retrain_recovers(
    spark, tmp_path
):
    """The IVF-PQ lifecycle loop (round-5 verdict task 7): PQ
    codebooks trained on the seed region quantize drifted vectors
    onto far-away centroids, so the COMPRESSED probe path (ADC +
    exact refine) loses the true neighbors — both because the frozen
    IVF centroids probe the wrong cells and because the stale PQ
    books misrank; check_and_retrain_pq observes the ADC recall decay
    with the recall evaluator and recovers by retraining BOTH
    artifacts (recluster_ivf + PQ codebook retrain, each an atomic
    replace); post-retrain recall is perfect on the probe set."""
    import math

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.annindex import (
        check_and_retrain_pq,
        commit_pq_codebooks,
        ivf_pq_index_recall,
    )

    raw = str(tmp_path / "raw")
    cb = str(tmp_path / "codebook")
    pq = str(tmp_path / "pq")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    def seed_vec(i: int) -> list[float]:
        th = math.radians(i * 6.0)
        return [math.cos(th), math.sin(th), 0.0]

    def drift_vec(i: int) -> list[float]:
        s = 0.001 if i % 2 == 0 else -0.001
        return [s, 0.0, 1.0]

    def write(path, rows):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            for i, v in rows:
                f.write(
                    json.dumps({"vec_id": i, "embedding": v}) + "\n"
                )

    seed = [(i, seed_vec(i)) for i in range(60)]
    seed_df = spark.createDataFrame(
        seed, "vec_id long, embedding array<double>"
    )
    build_ivf_codebook(spark, seed_df, cb, stride=10)
    commit_pq_codebooks(spark, pq, seed_df, m=1, k_codes=8)

    write(os.path.join(raw, "b1.json"), seed)
    q = stream_ivf_index_maintenance(spark, raw, cb, idx, ckpt)
    q.awaitTermination(120)

    probes_seed = spark.createDataFrame(
        [(9000 + j, seed_vec(3 * j + 1)) for j in range(4)],
        "vec_id long, embedding array<double>",
    )
    base = ivf_pq_index_recall(
        spark, idx, cb, pq, probes_seed, k=5, nprobe=2, rerank=10
    )
    assert base >= 0.8, f"healthy-index ADC recall too low: {base}"

    drifted = [(i, drift_vec(i)) for i in range(101, 201)]
    write(os.path.join(raw, "b2.json"), drifted)
    q = stream_ivf_index_maintenance(spark, raw, cb, idx, ckpt)
    q.awaitTermination(120)

    probes = spark.createDataFrame(
        [(9100 + j, drift_vec(9100 + j)) for j in range(4)],
        "vec_id long, embedding array<double>",
    )
    recall, retrained = check_and_retrain_pq(
        spark, idx, cb, pq, probes,
        k=5, nprobe=1, threshold=0.8, stride=10, m=1, k_codes=8,
        rerank=10,
    )
    assert recall < 0.8, f"drift did not decay ADC recall: {recall}"
    assert retrained
    after = ivf_pq_index_recall(
        spark, idx, cb, pq, probes, k=5, nprobe=1, rerank=10
    )
    assert after == 1.0, f"retrain did not recover ADC recall: {after}"
    # healthy index: the trigger does NOT fire twice
    recall2, retrained2 = check_and_retrain_pq(
        spark, idx, cb, pq, probes,
        k=5, nprobe=1, threshold=0.8, stride=10, m=1, k_codes=8,
        rerank=10,
    )
    assert recall2 == 1.0 and not retrained2


def test_table_index_tracks_deletes_and_updates(spark, tmp_path):
    """The IVF index as a secondary index of a vectors TABLE: DV
    deletes remove ids from the index, DV updates reassign them, and
    after every pass the index holds exactly the table's live vectors."""
    from pyspark.sql import Row

    from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
        snapshots as S,
    )

    src = str(tmp_path / "vectors")
    cb = str(tmp_path / "codebook")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        Row(vec_id=i, embedding=[float(i), float(i % 3), 1.0])
        for i in range(12)
    ]
    S.commit(spark, spark.createDataFrame(rows), src)
    AI.build_ivf_codebook(
        spark, S.read(spark, src), cb, stride=5
    )

    def run():
        q = AI.table_ivf_index_maintenance(
            spark, src, cb, idx, ckpt
        )
        q.awaitTermination()

    def index_ids():
        return sorted(
            r.id for r in AI.read_index(spark, idx).collect()
        )

    def table_ids():
        return sorted(r.vec_id for r in S.read(spark, src).collect())

    run()
    assert index_ids() == table_ids() == list(range(12))

    S.delete_where_dv(spark, src, "vec_id IN (2, 7)")
    S.update_where_dv(
        spark, src, "vec_id = 4", {"embedding": "array(9.0D, 9.0D, 9.0D)"}
    )
    S.commit(
        spark,
        spark.createDataFrame(
            [Row(vec_id=20, embedding=[0.5, 0.5, 0.5])]
        ),
        src,
        mode="append",
    )
    run()
    assert index_ids() == table_ids()
    assert 2 not in set(index_ids()) and 20 in set(index_ids())
    # the updated vector reindexed with its NEW value
    v4 = [
        r.v
        for r in AI.read_index(spark, idx).collect()
        if r.id == 4
    ]
    assert v4 == [[9.0, 9.0, 9.0]]

    # replay with no new commits: nothing changes
    before = sorted(
        (r.cell, r.id) for r in AI.read_index(spark, idx).collect()
    )
    run()
    after = sorted(
        (r.cell, r.id) for r in AI.read_index(spark, idx).collect()
    )
    assert before == after

def test_long_cdc_stream_index_growth_bounded(spark, tmp_path):
    """A long run of maintenance batches against a churning vectors
    table: with a compact_every cadence the index table's live dir
    count and dead-row fraction stay BOUNDED (no per-batch monotone
    growth from upsert-by-delete tombstones and watermark markers),
    answers stay exact after every compaction, and the compaction
    commit publishes as MAINTENANCE — a row-changing label the index
    table's own CDF consumers classify structurally instead of
    silently skipping (streaming/aggmaint._compact_state contract).
    r15: 26 batches at cadence 4 (was 50 at cadence 8) — same ≥5
    fold-and-verify cycles, every bound still cadence-relative, half
    the wall (this was the suite's slowest test at 324 s; the driver's
    verify budget is finite)."""
    from pyspark.sql import Row

    from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
        snapshots as S,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.cdf import (
        table_changes,
    )

    src = str(tmp_path / "vectors")
    cb = str(tmp_path / "codebook")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    EVERY = 4

    def v3(i: int) -> list[float]:
        return [float(i % 7), float(i % 3), 1.0 + (i % 5)]

    S.commit(
        spark,
        spark.createDataFrame(
            [Row(vec_id=i, embedding=v3(i)) for i in range(10)]
        ),
        src,
    )
    build_ivf_codebook(spark, S.read(spark, src), cb, stride=4)

    def drain():
        q = AI.table_ivf_index_maintenance(
            spark, src, cb, idx, ckpt, compact_every=EVERY
        )
        q.awaitTermination(120)

    def idx_stats():
        head = S.load_snapshot(idx)
        dead = sum((head.dv_dead or {}).values())
        total = sum(
            st.get("rows", 0) for st in (head.file_stats or {}).values()
        )
        return head, len(head.dirs), dead, total

    drain()  # batch 0: baseline
    next_id = 10
    max_dirs = 0
    max_dead_frac = 0.0
    compact_ops = []
    for b in range(1, 26):
        mode = b % 3
        if mode == 0:
            S.delete_where_dv(
                spark, src, f"vec_id = {(b * 13) % next_id}"
            )
        elif mode == 1:
            S.commit(
                spark,
                spark.createDataFrame(
                    [Row(vec_id=next_id, embedding=v3(next_id))]
                ),
                src,
                mode="append",
            )
            next_id += 1
        else:
            S.update_where_dv(
                spark, src,
                f"vec_id = {(b * 7) % next_id}",
                {"embedding": f"array({float(b)}D, 1.0D, 2.0D)"},
            )
        drain()
        head, ndirs, dead, total = idx_stats()
        max_dirs = max(max_dirs, ndirs)
        if total:
            max_dead_frac = max(max_dead_frac, dead / total)
        if head.op == "MAINTENANCE":
            # the fold just ran: tombstones gone, layout re-folded,
            # exactly one surviving marker row, honest MAINTENANCE op
            compact_ops.append(head.version)
            assert not head.dv_files
            assert ndirs <= 2, ndirs
            live = S.read(spark, idx)
            markers = live.filter("cell is null").count()
            assert markers == 1, markers

    # bounded growth: between folds the dir count and dead fraction
    # may climb, but never past what one EVERY-batch window can add
    assert max_dirs <= 2 * EVERY + 4, max_dirs
    assert max_dead_frac <= 0.9, max_dead_frac
    assert len(compact_ops) >= 5

    # the index still holds exactly the table's live vectors, and the
    # index answer for every live vector is itself (recall green)
    table_rows = {
        r.vec_id: list(r.embedding)
        for r in S.read(spark, src).collect()
    }
    index_rows = {
        r.id: list(r.v) for r in read_index(spark, idx).collect()
    }
    assert index_rows == table_rows
    probes = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=table_rows[i])
            for i in sorted(table_rows)[:6]
        ]
    )
    top1 = {
        r.qid: r.cid
        for r in ivf_index_topk(
            spark, idx, cb, probes, k=1, nprobe=4
        ).collect()
    }
    assert top1 == {i: i for i in sorted(table_rows)[:6]}

    # CDF-consumer pin: the MAINTENANCE fold is a CHANGE commit — a
    # change feed over the index table spanning the fold emits its
    # structural delete+insert rows rather than skipping it the way
    # a true bytes-only OPTIMIZE is skipped
    vc = compact_ops[-1]
    ch = table_changes(spark, idx, vc, vc)
    kinds = {
        r["_change_type"]
        for r in ch.select("_change_type").distinct().collect()
    }
    assert "insert" in kinds and "delete" in kinds, kinds

    # replay with nothing new: a no-op (watermark survived the folds)
    before = S.load_snapshot(idx).version
    drain()
    assert S.load_snapshot(idx).version == before

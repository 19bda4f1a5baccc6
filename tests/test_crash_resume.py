"""Kill-and-resume: mid-commit crash between state write and manifest
publish (r12 verdict task 5).

The streaming twins' exactly-once claim rests on the atomic manifest
publish: a batch's data/sidecar files may hit disk, but until
``snapshots._try_publish_manifest`` renames the manifest into place the
table is unchanged and the checkpoint has not committed the batch. These
tests inject a crash at EXACTLY that point (files written, manifest not
published) during batch 2 of each twin family, then resume on the same
checkpoint — with a third batch already waiting — and require the final
state to be bit-identical to an uncrashed control run of the same feed.

For the two-table families (MIN/MAX, TOP-K) the injected crash targets
the STATE table, which commits AFTER the fact mirror — so the resume
replays a batch whose fact advance already landed: the fact guard must
skip (its watermark already carries the batch id) while the state guard
applies. A separate variant crashes the FACT publish, the
nothing-committed interleaving. The r12 commit-shape changes (rebalanced
writes, in-plan guards, manifest-stat watermarks) all sit on this path.
"""

from __future__ import annotations

import os

import pytest

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as SNAP,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming import (
    aggmaint as AM,
)


def _write(raw: str, name: str, header: str, rows: list[str]) -> None:
    os.makedirs(raw, exist_ok=True)
    with open(os.path.join(raw, name), "w") as f:
        f.write(header + "\n" + "\n".join(rows) + "\n")


class _CrashOnce:
    """Patch snapshots._try_publish_manifest to raise on the ``nth``
    publish attempt for ``target`` table, then pass through forever.
    ``nth`` > 1 selects a LATER commit of a multi-commit batch (e.g. the
    annindex append after its DV delete, or a compaction fold after the
    batch append) — the partial-commit interleavings."""

    MSG = "injected crash: files written, manifest not published"

    def __init__(self, target: str, nth: int = 1):
        self.target = os.path.abspath(target)
        self.real = SNAP._try_publish_manifest
        self.fired = False
        self.nth = nth
        self.seen = 0

    def __enter__(self):
        def fake(path, version, manifest):
            if not self.fired and os.path.abspath(path) == self.target:
                self.seen += 1
                if self.seen == self.nth:
                    self.fired = True
                    raise RuntimeError(self.MSG)
            return self.real(path, version, manifest)

        SNAP._try_publish_manifest = fake
        return self

    def __exit__(self, *exc):
        SNAP._try_publish_manifest = self.real
        return False


CHANGE_HEADER = "k,op,old_val,new_val"
CHANGE_BATCHES = [
    ["a,I,,10.0", "a,I,,20.5", "b,I,,5.0", "c,I,,7.0"],
    ["a,U,10.0,12.0", "b,D,5.0,", "d,I,,9.25"],   # crash lands here
    ["c,U,7.0,7.75", "a,D,20.5,", "d,I,,1.5"],
]

# (family, start(spark, raw, work) -> (query_starter, crash_target_path),
#  read_state(spark, work) -> sorted rows, feed header, batches)


def _minmax(spark, work, crash_table):
    fact, state = f"{work}/fact", f"{work}/state"

    def start(raw, ckpt):
        return AM.stream_minmax_maintenance(spark, raw, fact, state, ckpt)

    target = fact if crash_table == "fact" else state

    def read():
        s = sorted(
            tuple(r) for r in AM.read_maintained_minmax(spark, state).collect()
        )
        f = sorted(
            tuple(r) for r in AM.read_maintained_fact(spark, fact).collect()
        )
        return (s, f)

    return start, target, read


def _topk(spark, work, crash_table):
    fact, state = f"{work}/fact", f"{work}/state"

    def start(raw, ckpt):
        return AM.stream_topk_maintenance(
            spark, raw, fact, state, ckpt, k=2, buffer=2
        )

    target = fact if crash_table == "fact" else state

    def read():
        s = sorted(
            tuple(r)
            for r in AM.read_maintained_topk(spark, state, k=2).collect()
        )
        f = sorted(
            tuple(r) for r in AM.read_maintained_fact(spark, fact).collect()
        )
        return (s, f)

    return start, target, read


def _cm(spark, work, _crash_table):
    state = f"{work}/state"

    def start(raw, ckpt):
        return AM.stream_cm_maintenance(spark, raw, state, ckpt, depth=3, width=32)

    def read():
        items = spark.createDataFrame(
            [
                ("a", 10.0), ("a", 12.0), ("a", 20.5), ("b", 5.0),
                ("c", 7.0), ("c", 7.75), ("d", 9.25), ("d", 1.5),
            ],
            "k string, v double",
        )
        return sorted(
            tuple(r)
            for r in AM.read_maintained_cm_estimate(
                spark, state, items, "v", depth=3, width=32
            ).collect()
        )

    return start, state, read


def _hll(spark, work, _crash_table):
    state = f"{work}/state"

    def start(raw, ckpt):
        return AM.stream_hll_maintenance(spark, raw, state, ckpt, p=6)

    def read():
        return sorted(
            tuple(r)
            for r in AM.read_maintained_hll_estimate(spark, state, p=6).collect()
        )

    return start, state, read


def _ewma(spark, work, _crash_table):
    state = f"{work}/state"

    def start(raw, ckpt):
        return AM.stream_ewma_maintenance(spark, raw, state, ckpt)

    def read():
        return sorted(
            tuple(r) for r in AM.read_maintained_ewma(spark, state).collect()
        )

    return start, state, read


def _kmv(spark, work, _crash_table):
    state = f"{work}/state"

    def start(raw, ckpt):
        return AM.stream_kmv_maintenance(spark, raw, state, ckpt, kmv_k=8)

    def read():
        return sorted(
            tuple(r)
            for r in AM.read_maintained_kmv_estimate(
                spark, state, kmv_k=8
            ).collect()
        )

    return start, state, read


def _hist(spark, work, _crash_table):
    state = f"{work}/state"

    def start(raw, ckpt):
        return AM.stream_hist_maintenance(
            spark, raw, state, ckpt, bin_width=100
        )

    def read():
        return sorted(
            tuple(r)
            for r in AM.read_maintained_quantiles(
                spark, state, [0.5, 0.9], bin_width=100
            ).collect()
        )

    return start, state, read


HLL_BATCHES = [
    [f"a,u{i}" for i in range(40)] + ["b,x", "b,y"],
    [f"a,u{i}" for i in range(30, 70)] + ["b,x", "c,w0"],
    [f"c,w{i}" for i in range(10)],
]
EWMA_BATCHES = [
    ["a,1,100", "b,1,7"],
    ["a,2,50", "b,2,9", "c,2,40"],
    ["a,3,51", "c,3,44"],
]

KMV_BATCHES = [
    [f"a,u{i}" for i in range(30)] + ["b,x", "b,y"],
    [f"a,u{i}" for i in range(20, 50)] + ["b,x"],
    [f"c,w{i}" for i in range(5)],
]


def _agg(spark, work, _crash_table):
    state = f"{work}/state"

    def start(raw, ckpt):
        return AM.stream_agg_maintenance(spark, raw, state, ckpt)

    def read():
        return sorted(
            tuple(r) for r in AM.read_maintained_agg(spark, state).collect()
        )

    return start, state, read


def _joinview(spark, work, crash_table):
    dim, view = f"{work}/dim", f"{work}/view"

    def start(raw, ckpt):
        return AM.stream_join_view_maintenance(spark, raw, dim, view, ckpt)

    # the dimension commits FIRST each batch; crashing the VIEW publish
    # leaves the dim advanced and the view behind — the two-table
    # partial-commit interleaving for this family
    target = dim if crash_table == "fact" else view

    def read():
        v = sorted(
            tuple(r) for r in AM.read_maintained_view(spark, view).collect()
        )
        d = sorted(
            tuple(r) for r in AM.read_maintained_dim(spark, dim).collect()
        )
        return (v, d)

    return start, target, read


MIX_HEADER = "seq,kind,fact_key,dim_key,val,attr"
MIX_BATCHES = [
    ["1,DU,,1,,red", "2,DU,,2,,blue", "3,FI,100,1,5.0,", "4,FI,101,2,6.0,"],
    ["5,DU,,1,,green", "6,FI,102,1,7.0,", "7,FD,101,,,"],   # crash here
    ["8,DU,,2,,black", "9,FI,103,2,8.0,"],
]

FAMILIES = {
    "minmax": (_minmax, CHANGE_HEADER, CHANGE_BATCHES),
    "topk": (_topk, CHANGE_HEADER, CHANGE_BATCHES),
    "cm": (_cm, CHANGE_HEADER, CHANGE_BATCHES),
    "hll": (_hll, "k,v", HLL_BATCHES),
    "ewma": (_ewma, "k,t,x", EWMA_BATCHES),
    "kmv": (_kmv, "k,v", KMV_BATCHES),
    "hist": (_hist, CHANGE_HEADER, CHANGE_BATCHES),
    "agg": (_agg, CHANGE_HEADER, CHANGE_BATCHES),
    "joinview": (_joinview, MIX_HEADER, MIX_BATCHES),
}


def _run_crash_resume(spark, tmp_path, family: str, crash_table: str):
    make, header, batches = FAMILIES[family]

    # --- crashed-and-resumed side -------------------------------------
    work = str(tmp_path / "crashed")
    raw, ckpt = f"{work}/raw", f"{work}/ckpt"
    start, target, read = make(spark, work, crash_table)

    _write(raw, "b1.csv", header, batches[0])
    start(raw, ckpt).awaitTermination(120)

    _write(raw, "b2.csv", header, batches[1])
    with _CrashOnce(target) as crash:
        q = start(raw, ckpt)
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(120)
            raise AssertionError(
                f"query survived the injected {crash_table} publish crash"
            )
    assert crash.fired, "fault never armed — wrong crash target path?"

    # the aborted batch wrote data files but no manifest: the table
    # still reads as the pre-crash state (readers resolve manifests,
    # never directory listings)
    pre_crash = read()

    # resume on the SAME checkpoint with one more batch already waiting:
    # the failed batch replays from its logged offsets, then batch 3
    _write(raw, "b3.csv", header, batches[2])
    start(raw, ckpt).awaitTermination(120)
    resumed = read()

    # --- uncrashed control over the identical feed ---------------------
    cwork = str(tmp_path / "control")
    craw, cckpt = f"{cwork}/raw", f"{cwork}/ckpt"
    cstart, _t, cread = make(spark, cwork, crash_table)
    for i, rows in enumerate(batches, start=1):
        _write(craw, f"b{i}.csv", header, rows)
        cstart(craw, cckpt).awaitTermination(120)

    assert resumed == cread(), (
        f"{family}: resumed state diverged from uncrashed control"
    )
    assert resumed != pre_crash, (
        f"{family}: resume applied nothing — replay was lost"
    )


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_crash_between_state_write_and_manifest_publish(
    spark, tmp_path, family
):
    _run_crash_resume(spark, tmp_path, family, crash_table="state")


def test_minmax_crash_on_fact_publish_replays_both_tables(spark, tmp_path):
    # the other interleaving: NOTHING committed for the batch (the fact
    # mirror publishes first) — resume must apply fact AND state once
    _run_crash_resume(spark, tmp_path, "minmax", crash_table="fact")


def test_joinview_crash_on_dim_publish_replays_both_tables(spark, tmp_path):
    # join-view twin, nothing-committed interleaving: the dimension
    # publishes first; crashing it leaves neither table advanced
    _run_crash_resume(spark, tmp_path, "joinview", crash_table="fact")


def test_state_crash_leaves_fact_advanced_and_guard_skips(spark, tmp_path):
    """Pin the partial-commit interleaving directly: after the state
    publish crash, the fact mirror must already carry batch 2 (its
    commit landed first), the state must not — and the resume must not
    double-apply the fact batch."""
    work = str(tmp_path / "w")
    raw, ckpt = f"{work}/raw", f"{work}/ckpt"
    fact, state = f"{work}/fact", f"{work}/state"

    _write(raw, "b1.csv", CHANGE_HEADER, CHANGE_BATCHES[0])
    AM.stream_minmax_maintenance(
        spark, raw, fact, state, ckpt
    ).awaitTermination(120)

    _write(raw, "b2.csv", CHANGE_HEADER, CHANGE_BATCHES[1])
    with _CrashOnce(state):
        q = AM.stream_minmax_maintenance(spark, raw, fact, state, ckpt)
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(120)

    fact_wm = AM._fact_watermark(spark, fact)
    state_rows, state_wm, _app = AM._table_state(
        spark, state, AM._MINMAX_SCHEMA, ["k", "min_scaled", "max_scaled"]
    )
    assert fact_wm[0] == 1, f"fact should carry batch 1, has {fact_wm[0]}"
    assert state_wm == 0, f"state should still be at batch 0, has {state_wm}"

    # d was inserted in batch 2: visible in the fact mirror, absent from
    # the crashed state table
    fact_keys = {r["k"] for r in AM.read_maintained_fact(spark, fact).collect()}
    assert "d" in fact_keys
    assert "d" not in {r[0] for r in state_rows.collect()}

    AM.stream_minmax_maintenance(
        spark, raw, fact, state, ckpt
    ).awaitTermination(120)
    # exactly-once on both tables: b's delete applied once, d present
    # once with its single value, a's update applied once
    got = {
        r["k"]: (r["min_scaled"], r["max_scaled"])
        for r in AM.read_maintained_minmax(spark, state).collect()
    }
    assert got == {
        "a": (1200, 2050),
        "c": (700, 700),
        "d": (925, 925),
    }
    facts = sorted(
        (r["k"], r["val"])
        for r in AM.read_maintained_fact(spark, fact).collect()
    )
    assert facts == [
        ("a", 12.0), ("a", 20.5), ("c", 7.0), ("d", 9.25)
    ]


# --- ANN secondary-index maintenance (streaming/annindex.py) -----------------
# r13 verdict task 5: the aggmaint twin families above are covered; the
# IVF index maintenance has its own multi-commit batches (DV delete +
# marker append; append + compaction fold; codebook + index recluster
# pair) — each interleaving gets a kill-and-resume pin here.

import json as _json
import math as _math

from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming import (
    annindex as AI,
)


def _ann_vec(i: int) -> list[float]:
    return [_math.sin(i * 1.7 + d) + 0.1 * d for d in range(6)]


def _write_jsonl(raw: str, name: str, ids: list[int]) -> None:
    os.makedirs(raw, exist_ok=True)
    with open(os.path.join(raw, name), "w") as f:
        for i in ids:
            f.write(
                _json.dumps({"vec_id": i, "embedding": _ann_vec(i)}) + "\n"
            )


ANN_BATCHES = [
    list(range(100, 120)),
    list(range(120, 135)),  # crash lands here
    list(range(135, 150)),
]


def _ann_stream_setup(spark, work: str, compact_every=None):
    cb, idx = f"{work}/cb", f"{work}/idx"
    seed = spark.createDataFrame(
        [(i, _ann_vec(i)) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    AI.build_ivf_codebook(spark, seed, cb, stride=10)

    def start(raw, ckpt):
        return AI.stream_ivf_index_maintenance(
            spark, raw, cb, idx, ckpt, compact_every=compact_every
        )

    def read():
        return sorted(
            (r["cell"], r["id"], tuple(r["v"]))
            for r in AI.read_index(spark, idx).collect()
        )

    return start, idx, read


@pytest.mark.parametrize("compact_every", [None, 1])
def test_annindex_stream_crash_between_write_and_publish(
    spark, tmp_path, compact_every
):
    """File-fed index stream: crash the batch-2 append publish
    (compact_every=None) or the compaction-fold publish right after a
    landed append (compact_every=1, nth=2 — the layout-maintenance
    interleaving: the batch is applied, the fold is not); resume with a
    third batch waiting; final logical index must equal the uncrashed
    control's."""
    nth = 2 if compact_every else 1

    work = str(tmp_path / "crashed")
    raw, ckpt = f"{work}/raw", f"{work}/ckpt"
    start, idx, read = _ann_stream_setup(spark, work, compact_every)

    _write_jsonl(raw, "b1.json", ANN_BATCHES[0])
    start(raw, ckpt).awaitTermination(120)

    _write_jsonl(raw, "b2.json", ANN_BATCHES[1])
    with _CrashOnce(idx, nth=nth) as crash:
        q = start(raw, ckpt)
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(120)
            raise AssertionError("query survived the injected crash")
    assert crash.fired, "fault never armed — wrong crash target path?"
    pre_crash = read()
    if nth == 2:
        # the append LANDED before the fold crashed: batch 2's rows are
        # already in the table (the fold changes layout, never contents)
        assert {t[1] for t in pre_crash} == set(
            ANN_BATCHES[0] + ANN_BATCHES[1]
        )

    _write_jsonl(raw, "b3.json", ANN_BATCHES[2])
    start(raw, ckpt).awaitTermination(120)
    resumed = read()

    cwork = str(tmp_path / "control")
    craw, cckpt = f"{cwork}/raw", f"{cwork}/ckpt"
    cstart, _i, cread = _ann_stream_setup(spark, cwork, compact_every)
    for i, ids in enumerate(ANN_BATCHES, start=1):
        _write_jsonl(craw, f"b{i}.json", ids)
        cstart(craw, cckpt).awaitTermination(120)

    assert resumed == cread(), "resumed index diverged from control"
    assert {t[1] for t in resumed} == set(
        ANN_BATCHES[0] + ANN_BATCHES[1] + ANN_BATCHES[2]
    )
    if nth == 1:
        assert resumed != pre_crash, "resume applied nothing"


def _ann_table_setup(spark, work: str):
    from pyspark.sql import Row

    src, cb, idx = f"{work}/vectors", f"{work}/cb", f"{work}/idx"
    SNAP.commit(
        spark,
        spark.createDataFrame(
            [Row(vec_id=i, embedding=_ann_vec(i)) for i in range(12)]
        ),
        src,
    )
    AI.build_ivf_codebook(spark, SNAP.read(spark, src), cb, stride=5)

    def drain(ckpt):
        AI.table_ivf_index_maintenance(
            spark, src, cb, idx, ckpt
        ).awaitTermination(120)

    def mutate():
        from pyspark.sql import Row as R

        SNAP.delete_where_dv(spark, src, "vec_id IN (2, 7)")
        SNAP.update_where_dv(
            spark, src, "vec_id = 4",
            {"embedding": "array(9.0D, 9.0D, 9.0D, 9.0D, 9.0D, 9.0D)"},
        )
        SNAP.commit(
            spark,
            spark.createDataFrame(
                [R(vec_id=20, embedding=[0.5] * 6)]
            ),
            src,
            mode="append",
        )

    def read():
        return sorted(
            (r["id"], tuple(r["v"]))
            for r in AI.read_index(spark, idx).collect()
        )

    return src, idx, drain, mutate, read


@pytest.mark.parametrize("nth", [1, 2])
def test_annindex_table_crash_interleavings(spark, tmp_path, nth):
    """CDF-fed secondary index, the two-commit batch (DV delete of the
    netted ids, then the marker append). nth=1 crashes the DV publish —
    nothing committed, the replay applies delete+append once. nth=2
    crashes the append AFTER the DV landed — the docstring's
    interleaving: the resume must replay into a no-op delete + the
    marker append, never a double delete or double insert."""
    work = str(tmp_path / "crashed")
    ckpt = f"{work}/ckpt"
    src, idx, drain, mutate, read = _ann_table_setup(spark, work)

    drain(ckpt)  # batch 0: index build
    assert [i for i, _ in read()] == list(range(12))

    mutate()
    with _CrashOnce(idx, nth=nth) as crash:
        q = AI.table_ivf_index_maintenance(
            spark, src, f"{work}/cb", idx, ckpt
        )
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(120)
            raise AssertionError("query survived the injected crash")
    assert crash.fired, "fault never armed — wrong crash target path?"

    mid_ids = {i for i, _ in read()}
    if nth == 1:
        # nothing committed: the index still serves the pre-batch state
        assert mid_ids == set(range(12))
    else:
        # DV landed, append did not: netted ids are gone, nothing added
        assert mid_ids == set(range(12)) - {2, 4, 7}

    drain(ckpt)  # resume on the same checkpoint
    resumed = read()

    # exactly-once: the index holds exactly the table's live vectors
    live = sorted(
        (r["vec_id"], tuple(r["embedding"]))
        for r in SNAP.read(spark, src).collect()
    )
    assert resumed == live
    assert {i for i, _ in resumed} == (set(range(12)) - {2, 7}) | {20}
    assert dict(resumed)[4] == (9.0,) * 6

    # and an uncrashed control over the same source history agrees
    cwork = str(tmp_path / "control")
    csrc, cidx, cdrain, cmutate, cread = _ann_table_setup(spark, cwork)
    cdrain(f"{cwork}/ckpt")
    cmutate()
    cdrain(f"{cwork}/ckpt")
    assert [t for t in cread()] == resumed

    # replay with nothing new: a no-op
    drain(ckpt)
    assert read() == resumed


def test_annindex_recluster_crash_leaves_valid_index_and_converges(
    spark, tmp_path
):
    """recluster_ivf commits the codebook FIRST, then the re-assigned
    index. Crashing the index publish leaves a new codebook over the
    OLD assignment — the documented degraded-but-valid window: index
    CONTENTS are untouched, a query still ranks real rows. A rerun
    converges to the fully reclustered state, and the maintenance
    stream resumes exactly-once on the re-stamped watermark."""
    work = str(tmp_path / "w")
    raw, ckpt = f"{work}/raw", f"{work}/ckpt"
    start, idx, read = _ann_stream_setup(spark, work)
    cb = f"{work}/cb"

    _write_jsonl(raw, "b1.json", ANN_BATCHES[0])
    start(raw, ckpt).awaitTermination(120)
    _write_jsonl(raw, "b2.json", ANN_BATCHES[1])
    start(raw, ckpt).awaitTermination(120)
    before = read()

    cb_version_before = SNAP.load_snapshot(cb).version
    with _CrashOnce(idx) as crash:
        with pytest.raises(Exception, match="injected crash"):
            AI.recluster_ivf(spark, idx, cb, stride=7)
    assert crash.fired
    # codebook advanced, index contents untouched (old assignment)
    assert SNAP.load_snapshot(cb).version == cb_version_before + 1
    assert read() == before

    # rerun completes the recluster: same ids, cells re-derived from
    # the CURRENT codebook (stride-7 pick over the index vectors)
    AI.recluster_ivf(spark, idx, cb, stride=7)
    after = read()
    assert {t[1] for t in after} == {t[1] for t in before}
    expected_cells = {
        (r["cell"], r["id"])
        for r in SIM_assign_current(spark, idx, cb).collect()
    }
    assert {(c, i) for c, i, _ in after} == expected_cells

    # the stream resumes exactly-once on the re-stamped watermark
    _write_jsonl(raw, "b3.json", ANN_BATCHES[2])
    start(raw, ckpt).awaitTermination(120)
    assert {t[1] for t in read()} == set(
        ANN_BATCHES[0] + ANN_BATCHES[1] + ANN_BATCHES[2]
    )
    # replay: no growth
    start(raw, ckpt).awaitTermination(120)
    assert len(read()) == sum(len(b) for b in ANN_BATCHES)


def SIM_assign_current(spark, idx, cb):
    """Reference re-assignment of the CURRENT index rows against the
    CURRENT codebook (what a completed recluster must equal)."""
    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        similarity as SIM,
    )

    rows = AI.read_index(spark, idx).select("id", "v")
    return SIM._assign_cells(rows, SNAP.read(spark, cb), 1).select(
        "cell", "id"
    )

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
    """Patch snapshots._try_publish_manifest to raise on the first
    publish attempt for ``target`` table, then pass through forever."""

    MSG = "injected crash: files written, manifest not published"

    def __init__(self, target: str):
        self.target = os.path.abspath(target)
        self.real = SNAP._try_publish_manifest
        self.fired = False

    def __enter__(self):
        def fake(path, version, manifest):
            if not self.fired and os.path.abspath(path) == self.target:
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

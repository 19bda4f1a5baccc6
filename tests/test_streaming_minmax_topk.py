"""Streaming twins of the NON-self-maintainable aggregates (MIN/MAX and
TOP-K): maintained state must equal a batch recompute of the post-change
fact for any batch split of the feed, survive replays untouched, apply
late files exactly once, and rebuild from a lost checkpoint."""

from __future__ import annotations

import math
import os

from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
    read_maintained_fact,
    read_maintained_minmax,
    read_maintained_topk,
    stream_minmax_maintenance,
    stream_topk_maintenance,
)

HEADER = "k,op,old_val,new_val"

# batch 1 seeds; batch 2 deletes the CURRENT MAX of a (endpoint →
# rescan) and does a same-batch insert+delete pair on b; batch 3
# squeezes c below k by removing its top values
_B1 = ["a,I,,10.0", "a,I,,20.5", "a,I,,3.0",
       "b,I,,5.0", "c,I,,7.0", "c,I,,9.0", "c,I,,1.0"]
_B2 = ["a,D,20.5,", "b,I,,6.0", "b,D,6.0,"]
_B3 = ["c,D,9.0,", "c,D,7.0,", "a,U,3.0,4.0"]


def _fx(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def _write(path: str, rows: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(HEADER + "\n" + "\n".join(rows) + "\n")


def _apply(log: dict[str, list[float]], rows: list[str]):
    for r in rows:
        k, op, old, new = r.split(",")
        if op in ("I", "U"):
            log.setdefault(k, []).append(float(new))
        if op in ("D", "U"):
            log[k].remove(float(old))
    return log


def _want_minmax(log):
    return {
        k: (_fx(min(v)), _fx(max(v)))
        for k, v in log.items()
        if v
    }


def _want_topk(log, k_):
    want = {}
    for kk, vals in log.items():
        for i, v in enumerate(sorted(vals, reverse=True)[:k_], start=1):
            want[(kk, i)] = _fx(v)
    return want


def test_minmax_twin_equals_recompute_across_batches(spark, tmp_path):
    raw = str(tmp_path / "raw")
    factp = str(tmp_path / "fact")
    statep = str(tmp_path / "mm")
    ckpt = str(tmp_path / "ckpt")
    log: dict[str, list[float]] = {}
    for i, rows in enumerate([_B1, _B2, _B3], start=1):
        _write(os.path.join(raw, f"b{i}.csv"), rows)
        q = stream_minmax_maintenance(spark, raw, factp, statep, ckpt)
        q.awaitTermination(120)
        _apply(log, rows)
        got = {
            r["k"]: (r["min_scaled"], r["max_scaled"])
            for r in read_maintained_minmax(spark, statep).collect()
        }
        assert got == _want_minmax(log), f"after batch {i}"
        fact = sorted(
            (r["k"], _fx(r["val"]))
            for r in read_maintained_fact(spark, factp).collect()
        )
        assert fact == sorted(
            (k, _fx(v)) for k, vs in log.items() for v in vs
        ), f"fact mirror after batch {i}"

    # replay: same checkpoint, no new files — state untouched
    before = {
        r["k"]: (r["min_scaled"], r["max_scaled"])
        for r in read_maintained_minmax(spark, statep).collect()
    }
    q = stream_minmax_maintenance(spark, raw, factp, statep, ckpt)
    q.awaitTermination(120)
    assert {
        r["k"]: (r["min_scaled"], r["max_scaled"])
        for r in read_maintained_minmax(spark, statep).collect()
    } == before

    # lost checkpoint: fresh one rebuilds both tables to the same state
    q = stream_minmax_maintenance(
        spark, raw, factp, statep, str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    assert {
        r["k"]: (r["min_scaled"], r["max_scaled"])
        for r in read_maintained_minmax(spark, statep).collect()
    } == before


def test_topk_twin_equals_recompute_across_batches(spark, tmp_path):
    K = 2
    raw = str(tmp_path / "raw")
    factp = str(tmp_path / "fact")
    statep = str(tmp_path / "tk")
    ckpt = str(tmp_path / "ckpt")
    log: dict[str, list[float]] = {}
    for i, rows in enumerate([_B1, _B2, _B3], start=1):
        _write(os.path.join(raw, f"b{i}.csv"), rows)
        q = stream_topk_maintenance(
            spark, raw, factp, statep, ckpt, k=K, buffer=1
        )
        q.awaitTermination(120)
        _apply(log, rows)
        got = {
            (r["k"], r["pos"]): r["val_scaled"]
            for r in read_maintained_topk(spark, statep, K).collect()
        }
        assert got == _want_topk(log, K), f"after batch {i}"

    # late file applied exactly once (a squeezes again; c refills)
    _write(os.path.join(raw, "b4.csv"), ["a,D,10.0,", "c,I,,2.5"])
    q = stream_topk_maintenance(
        spark, raw, factp, statep, ckpt, k=K, buffer=1
    )
    q.awaitTermination(120)
    _apply(log, ["a,D,10.0,", "c,I,,2.5"])
    got = {
        (r["k"], r["pos"]): r["val_scaled"]
        for r in read_maintained_topk(spark, statep, K).collect()
    }
    assert got == _want_topk(log, K)

    # replay is a no-op; a fresh checkpoint rebuilds to the same answer
    q = stream_topk_maintenance(
        spark, raw, factp, statep, ckpt, k=K, buffer=1
    )
    q.awaitTermination(120)
    assert {
        (r["k"], r["pos"]): r["val_scaled"]
        for r in read_maintained_topk(spark, statep, K).collect()
    } == got
    q = stream_topk_maintenance(
        spark, raw, factp, statep, str(tmp_path / "ckpt2"), k=K, buffer=1
    )
    q.awaitTermination(120)
    assert {
        (r["k"], r["pos"]): r["val_scaled"]
        for r in read_maintained_topk(spark, statep, K).collect()
    } == got


def test_arbitrary_batch_splits_converge(spark, tmp_path):
    """Batch boundaries are delivery artifacts: the same change log cut
    into 1, 2, or 4 files must leave the maintained MIN/MAX and TOP-K
    states identical to each other and to a recompute."""
    log = (
        [f"k{i % 3},I,,{(i * 7) % 40}.5" for i in range(24)]
        + ["k0,D,0.5,", "k1,D,7.5,", "k2,U,14.5,2.0",
           "k0,D,21.5,", "k0,I,,50.0", "k1,D,28.5,"]
    )
    live: dict[str, list[float]] = {}
    _apply(live, log)

    results_mm, results_tk = [], []
    for n_files, label in ((1, "one"), (2, "two"), (4, "four")):
        raw = str(tmp_path / f"raw_{label}")
        factp = str(tmp_path / f"fact_{label}")
        mmp = str(tmp_path / f"mm_{label}")
        tkp = str(tmp_path / f"tk_{label}")
        per = (len(log) + n_files - 1) // n_files
        # deliver file-by-file, re-running the stream after each one,
        # so every split is a genuine separate micro-batch (a single
        # availableNow run would fold all present files into one batch)
        for j in range(n_files):
            _write(
                os.path.join(raw, f"b{j}.csv"),
                log[j * per : (j + 1) * per],
            )
            q = stream_minmax_maintenance(
                spark, raw, factp, mmp, str(tmp_path / f"cm_{label}")
            )
            q.awaitTermination(180)
            q = stream_topk_maintenance(
                spark, raw, factp + "2", tkp,
                str(tmp_path / f"ct_{label}"), k=2, buffer=1,
            )
            q.awaitTermination(180)
        results_mm.append({
            r["k"]: (r["min_scaled"], r["max_scaled"])
            for r in read_maintained_minmax(spark, mmp).collect()
        })
        results_tk.append({
            (r["k"], r["pos"]): r["val_scaled"]
            for r in read_maintained_topk(spark, tkp, 2).collect()
        })
    assert results_mm[0] == results_mm[1] == results_mm[2]
    assert results_mm[0] == _want_minmax(live)
    assert results_tk[0] == results_tk[1] == results_tk[2]
    assert results_tk[0] == _want_topk(live, 2)

"""Interleaved, anchor-normalized A/B of two source trees (r14 verdict
task 1: "anchor-normalized interleaved A/B ... pinned in-repo").

Runs ``scripts/bench_subset.py --calib`` as a FRESH subprocess per run,
alternating sides in an A B B A A B B A ... pattern so slow host phases
hit both sides equally, then reports per-leg raw minima AND
anchor-normalized minima. Normalization: each run carries bench.py's
3-float calibration vector (cpu_agg_10m, io_write_5m, io_scan_5m); a
run's host-speed factor is the geometric mean of its anchors relative
to the first run's, and each leg second is divided by that factor —
completed-run min anchors only, per the r14 lesson that a crashed run's
start-only anchors produce nonsense ratios.

Usage:
  python scripts/ab_trees.py --tree-a /root/r13tree --tree-b /root/repo \
      --rounds 3 --reps 2 --out /tmp/ab_cdc.json merge_cdc_sim ...

Side A's tree must contain scripts/bench_subset.py (copy the current
one in for historic trees — it only uses catalog legs + bench.py's
_calibration, both present since r12).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys


def run_side(tree: str, legs: list[str], reps: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(tree, "scripts", "bench_subset.py"),
            "--reps",
            str(reps),
            "--calib",
            *legs,
        ],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if p.returncode != 0:
        print(p.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"side {tree} run failed rc={p.returncode}")
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True)
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("legs", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    runs: list[dict] = []
    # A B B A A B B A: each adjacent pair brackets a side switch, so
    # monotone host drift cancels to first order.
    order = []
    for i in range(args.rounds):
        order += ["ab"[i % 2], "ba"[i % 2]]
    for i, side in enumerate(order):
        tree = args.tree_a if side == "a" else args.tree_b
        print(f"# run {i + 1}/{len(order)} side={side} tree={tree}",
              file=sys.stderr, flush=True)
        rec = run_side(tree, args.legs, args.reps, sf_dir)
        rec["side"] = side
        runs.append(rec)
        print(f"#   -> {rec['legs']} calib={rec['calib']}",
              file=sys.stderr, flush=True)

    ref = runs[0]["calib"]
    for rec in runs:
        f = math.exp(
            sum(math.log(c / r) for c, r in zip(rec["calib"], ref)) / 3
        )
        rec["host_factor"] = round(f, 4)
        rec["norm"] = {
            k: round(v / f, 3) for k, v in rec["legs"].items()
        }

    summary: dict = {"sf_dir": sf_dir, "runs": runs, "per_leg": {}}
    for leg in args.legs:
        row: dict = {}
        for side in "ab":
            sel = [r for r in runs if r["side"] == side]
            row[f"{side}_raw_min"] = min(r["legs"][leg] for r in sel)
            row[f"{side}_norm_min"] = min(r["norm"][leg] for r in sel)
            row[f"{side}_norm_all"] = [r["norm"][leg] for r in sel]
        row["speedup_b_over_a_norm"] = round(
            row["a_norm_min"] / row["b_norm_min"], 3
        )
        summary["per_leg"][leg] = row
        print(f"{leg}: {row}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()

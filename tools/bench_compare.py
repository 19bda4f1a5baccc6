"""Compare two bench.py JSON records with calibration normalization.

    python tools/bench_compare.py BENCH_rOLD.json BENCH_rNEW.json [--top N]

BENCH absolute walls on this host swing 10-33% on frozen code (TUNING.md
round 12), so raw round-over-round deltas are ambient-dominated. From
round 13 every bench run records a ``calibration`` block — three
deterministic micro-legs (CPU agg, parquet write, parquet scan-agg)
timed at the start and end of the run, no code under test. This tool
divides the new run's leg walls by the host-speed ratio

    ratio = geomean over legs of (new min(start,end) / old min(start,end))

before diffing, so a 1.3x-slower host does not read as a 1.3x
regression. Runs without calibration blocks (pre-r13) fall back to raw
deltas with a warning. Output: legs sorted by normalized delta,
biggest regressions first.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


_CALIB_LEGS = ("cpu_agg_10m", "io_write_5m", "io_scan_5m")


def _calib_vec(d: dict) -> list[float] | None:
    """Per-leg anchor minimums from either record shape: the compact r14
    ``"calib": [cpu, io_write, io_scan]`` line vector, or the verbose
    r13 ``"calibration": {"start": {...}, "end": {...}}`` block."""
    c = d.get("calib")
    if isinstance(c, list) and len(c) == len(_CALIB_LEGS):
        return [float(x) for x in c]
    cv = d.get("calibration")
    if not cv:
        return None
    out = []
    for leg in _CALIB_LEGS:
        out.append(
            min(
                cv.get("start", {}).get(leg, math.inf),
                cv.get("end", {}).get(leg, math.inf),
            )
        )
    return out


def _calib_ratio(old: dict, new: dict) -> float | None:
    co, cn = _calib_vec(old), _calib_vec(new)
    if co is None or cn is None:
        return None
    ratios = [
        n / o
        for o, n in zip(co, cn)
        if math.isfinite(o) and math.isfinite(n) and o > 0
    ]
    if not ratios:
        return None
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=0, help="show only N rows")
    args = ap.parse_args()
    # the driver's BENCH_r*.json wraps the bench.py line under "parsed"
    # (null when the line outgrew the driver's 2000-char tail capture —
    # r13's record is like that; bench.py now keeps the line compact)
    old = json.load(open(args.old))
    new = json.load(open(args.new))
    if "parsed" in old:
        old = old["parsed"] or {}
    if "parsed" in new:
        new = new["parsed"] or {}
    for name, rec in (("old", old), ("new", new)):
        if not rec.get("queries"):
            print(
                f"# WARNING: {name} record has no parsed queries "
                f"(truncated driver capture?) — nothing to compare there"
            )

    ratio = _calib_ratio(old, new)
    if ratio is None:
        print(
            "# WARNING: no calibration block in one of the runs — raw "
            "deltas only (ambient host drift NOT separated)"
        )
        ratio = 1.0
    else:
        print(
            f"# host-speed ratio (new/old, geomean of calibration legs): "
            f"{ratio:.3f} — normalized = new_wall / {ratio:.3f}"
        )

    legs_old = {**old.get("queries", {}), **old.get("extra_queries", {})}
    legs_new = {**new.get("queries", {}), **new.get("extra_queries", {})}
    rows = []
    for name in sorted(set(legs_old) & set(legs_new)):
        o, n = legs_old[name], legs_new[name]
        norm = n / ratio
        rows.append((norm / o if o else math.inf, name, o, n, norm))
    rows.sort(reverse=True)
    if args.top:
        rows = rows[: args.top]
    print(f"{'leg':40s} {'old':>8s} {'new':>8s} {'norm':>8s} {'norm/old':>9s}")
    for rel, name, o, n, norm in rows:
        print(f"{name:40s} {o:8.2f} {n:8.2f} {norm:8.2f} {rel:8.2f}x")
    only_old = sorted(set(legs_old) - set(legs_new))
    only_new = sorted(set(legs_new) - set(legs_old))
    if only_old:
        print(f"# legs only in old: {only_old}")
    if only_new:
        print(f"# legs only in new: {only_new}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

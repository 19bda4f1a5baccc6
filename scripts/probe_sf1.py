"""Once-per-round sf1.0 scale probe (r11 verdict task 3): ONE command
that regenerates the 10x dataset, times the scale-sensitive legs at
sf0.1 and sf1.0, and prints a ready-to-paste TUNING.md table.

    python scripts/probe_sf1.py [--out /tmp/sf1.0] [--reps 2]

Legs (the five the verdicts track):
  * embedding_near_dup_scaled  — adaptive-split ANN near-dup
  * jpeg_arith_stats           — QM arithmetic JPEG decode (mapInPandas)
  * minhash_fast               — banded MinHash dedup
  * er_golden_records          — FastSS entity resolution + survivorship
  * stream_minmax_maintenance  — snapshot-commit streaming IVM twin
    (3-batch bench feed derived from each scale's orders table)

Scale claims in TUNING.md must be reproducible by re-running this file;
the sf1.0 data is transient (/root/testdata is read-only), regenerated
deterministically by scripts/make_scaled_sf.py.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from _lakehouse_architecture_for_e_commerce_transactions_spark.session import (  # noqa: E402
    get_spark,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (  # noqa: E402
    load_table,
)

SF01 = "/root/testdata/sf0.1"
CATALOG_LEGS = [
    "embedding_near_dup_scaled",
    "jpeg_arith_stats",
    "minhash_fast",
    "er_golden_records",
]


def time_catalog_leg(spark, name: str, sf: str, reps: int) -> float:
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.catalog import (
        CATALOG,
    )

    builder = CATALOG[name].builder
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        builder(spark, sf).count()
        best = min(best, time.time() - t0)
    return best


def stream_feed(spark, sf: str) -> list[list[str]]:
    rows = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderkey") % 8 == 0)
        .select(
            (F.col("o_custkey") % 500).cast("string").alias("k"),
            F.col("o_totalprice").cast("double").alias("v"),
            F.col("o_orderkey").alias("ok"),
        )
        .collect()
    )
    b1 = [f"{r['k']},I,,{r['v']!r}" for r in rows]
    b2 = [f"{r['k']},D,{r['v']!r}," for r in rows if r["ok"] % 40 == 0] + [
        f"{r['k']},I,,{r['v'] + 1000.0!r}" for r in rows if r["ok"] % 56 == 0
    ]
    b3 = [f"{r['k']},U,{r['v']!r},{r['v'] / 2!r}" for r in rows if r["ok"] % 48 == 8]
    return [b1, b2, b3]


def time_stream_leg(spark, sf: str, reps: int) -> float:
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
        stream_minmax_maintenance,
    )

    batches = stream_feed(spark, sf)
    best = float("inf")
    for _ in range(reps):
        work = tempfile.mkdtemp(prefix="probe_sf1_stream_")
        try:
            raw = os.path.join(work, "raw")
            os.makedirs(raw)
            total = 0.0
            for bi, rows in enumerate(batches, start=1):
                with open(os.path.join(raw, f"b{bi}.csv"), "w") as f:
                    f.write("k,op,old_val,new_val\n")
                    f.write("\n".join(rows) + "\n")
                t0 = time.time()
                q = stream_minmax_maintenance(
                    spark, raw, os.path.join(work, "fact"),
                    os.path.join(work, "state"), os.path.join(work, "ckpt"),
                )
                q.awaitTermination(600)
                total += time.time() - t0
            best = min(best, total)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1.0")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--keep", action="store_true", help="keep the sf1.0 dir")
    args = ap.parse_args()

    t0 = time.time()
    shutil.rmtree(args.out, ignore_errors=True)
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "make_scaled_sf.py"),
            SF01,
            args.out,
            "10",
        ],
        check=True,
        stdout=subprocess.DEVNULL,
    )
    regen_wall = time.time() - t0
    spark = get_spark("probe-sf1")

    results: list[tuple[str, float, float]] = []
    for name in CATALOG_LEGS:
        a = time_catalog_leg(spark, name, SF01, args.reps)
        b = time_catalog_leg(spark, name, args.out, args.reps)
        results.append((name, a, b))
        print(f"# {name}: sf0.1 {a:.2f}s  sf1.0 {b:.2f}s", file=sys.stderr)
    a = time_stream_leg(spark, SF01, args.reps)
    b = time_stream_leg(spark, args.out, args.reps)
    results.append(("stream_minmax_maintenance (3 batches)", a, b))
    print(f"# stream_minmax: sf0.1 {a:.2f}s  sf1.0 {b:.2f}s", file=sys.stderr)

    print(f"\nsf1.0 regen: `make_scaled_sf.py {SF01} {args.out} 10` "
          f"in {regen_wall:.1f}s; min-of-{args.reps} walls:\n")
    print("| leg | sf0.1 | sf1.0 | ratio (10x data) |")
    print("|---|---|---|---|")
    for name, a, b in results:
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

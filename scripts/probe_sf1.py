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
# r12 verdict task 3: the two legs whose 10x ratio looked superlinear on
# a degraded host get min-of-3 (the others keep --reps) and an optional
# sf10 datum (--sf10; documents-only build, both legs read only that
# table)
MIN3_LEGS = {"jpeg_arith_stats", "minhash_fast"}
SF10_LEGS = ["jpeg_arith_stats", "minhash_fast"]
# r12 verdict task 6: the O(1)-files-per-commit claim, checked at every
# probed scale (same bound the sf0.1 suite pins in
# tests/test_streaming_aggmaint.py::test_maintenance_commits_write_o1_files_per_batch)
FILES_PER_COMMIT_CAP = 12


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


def time_stream_leg(spark, sf: str, reps: int) -> tuple[float, int]:
    """(best wall over reps, max data files in any one commit dir).

    The file count checks the O(1)-files-per-commit claim (r12 verdict
    task 6) at every probed scale: the rebalance hint must keep each
    batch-sized commit at a handful of AQE-sized files however large
    the feed — deletion-vector sidecars (dv-*/) are excluded, only
    commit-*/ data files count."""
    import glob as globmod

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
        stream_minmax_maintenance,
    )

    batches = stream_feed(spark, sf)
    best = float("inf")
    max_files = 0
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
            for table in ("fact", "state"):
                for cdir in globmod.glob(
                    os.path.join(work, table, "data", "commit-*")
                ):
                    n = len(globmod.glob(os.path.join(cdir, "*.parquet")))
                    max_files = max(max_files, n)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    assert max_files <= FILES_PER_COMMIT_CAP, (
        f"files-per-commit pin violated at {sf}: {max_files} > "
        f"{FILES_PER_COMMIT_CAP}"
    )
    return best, max_files


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1.0")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--keep", action="store_true", help="keep the sf1.0 dir")
    ap.add_argument(
        "--sf10", action="store_true",
        help="also time jpeg_arith_stats/minhash_fast at sf10 "
             "(documents-only 10x build from the sf1.0 dir)",
    )
    args = ap.parse_args()
    if args.sf10:
        # the sf10 array aggregations need real heap on this single-JVM
        # host (8g OOMs; all executor state is one heap in local mode) —
        # an explicit SPARK_GRAFT_DRIVER_MEM still wins
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

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

    results: list[tuple[str, int, float, float]] = []
    for name in CATALOG_LEGS:
        reps = max(args.reps, 3) if name in MIN3_LEGS else args.reps
        a = time_catalog_leg(spark, name, SF01, reps)
        b = time_catalog_leg(spark, name, args.out, reps)
        results.append((name, reps, a, b))
        print(f"# {name}: sf0.1 {a:.2f}s  sf1.0 {b:.2f}s", file=sys.stderr)
    a, files_a = time_stream_leg(spark, SF01, args.reps)
    b, files_b = time_stream_leg(spark, args.out, args.reps)
    results.append(
        ("stream_minmax_maintenance (3 batches)", args.reps, a, b)
    )
    print(
        f"# stream_minmax: sf0.1 {a:.2f}s  sf1.0 {b:.2f}s; max data "
        f"files/commit {files_a} (sf0.1) / {files_b} (sf1.0), "
        f"cap {FILES_PER_COMMIT_CAP}",
        file=sys.stderr,
    )

    # optional sf10 datum for the two ratio-suspect legs: both read only
    # the documents table, so the 100x-of-sf0.1 dir is documents-only
    sf10: dict[str, float] = {}
    if args.sf10:
        src10 = tempfile.mkdtemp(prefix="probe_sf10_src_")
        out10 = tempfile.mkdtemp(prefix="probe_sf10_")
        try:
            shutil.copy(
                os.path.join(args.out, "documents.parquet"),
                os.path.join(src10, "documents.parquet"),
            )
            t0 = time.time()
            subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(__file__), "make_scaled_sf.py"
                    ),
                    src10, out10, "10",
                ],
                check=True, stdout=subprocess.DEVNULL,
            )
            print(
                f"# sf10 documents-only regen: {time.time() - t0:.1f}s",
                file=sys.stderr,
            )
            for name in SF10_LEGS:
                sf10[name] = time_catalog_leg(
                    spark, name, out10, max(args.reps, 3)
                )
                print(
                    f"# {name}: sf10 {sf10[name]:.2f}s", file=sys.stderr
                )
        finally:
            shutil.rmtree(src10, ignore_errors=True)
            shutil.rmtree(out10, ignore_errors=True)

    print(f"\nsf1.0 regen: `make_scaled_sf.py {SF01} {args.out} 10` "
          f"in {regen_wall:.1f}s; per-leg min-of-N walls:\n")
    print("| leg | reps | sf0.1 | sf1.0 | ratio (10x) | sf10 | ratio (10x) |")
    print("|---|---|---|---|---|---|---|")
    for name, reps, a, b in results:
        c = sf10.get(name)
        tail = f"{c:.2f} s | {c / b:.1f}x" if c else "— | —"
        print(
            f"| {name} | {reps} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x "
            f"| {tail} |"
        )
    print(
        f"\nstream_minmax max data files/commit: {files_a} (sf0.1), "
        f"{files_b} (sf1.0) — cap {FILES_PER_COMMIT_CAP} (O(1) per "
        "commit, dv sidecars excluded)"
    )
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

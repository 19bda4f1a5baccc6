"""Subset bench runner for A/B measurements (guide §1).

Times ONLY the named bench legs with bench.py's exact methodology
(same feeds, same reps/min policy, fresh dirs for stream legs) so a
candidate change can be measured in minutes instead of a full bench
run. Catalog legs are timed as build+collect; stream legs replicate
bench.py's feed construction verbatim.

Usage:
  python scripts/bench_subset.py [--reps 2] [--calib] leg [leg ...]
Prints one JSON line {"legs": {leg: sec, ...}, "calib": [...]} on
stdout (r15: wrapped record; ``--calib`` runs bench.py's host-speed
anchors at start and end so interleaved A/B runs can be normalized
for ambient host drift — the r14 verdict's required methodology for
closing the merge_cdc_sim question).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import catalog
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import get_spark
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import load_table

STREAM_LEGS = {
    "stream_minmax_maintenance",
    "stream_topk_maintenance",
    "stream_cm_maintenance",
    "stream_hll_maintenance",
    "stream_ewma_maintenance",
}


def _stream_feeds(spark, sf_dir):
    feed_rows = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 8 == 0)
        .select(
            (F.col("o_custkey") % 500).cast("string").alias("k"),
            F.col("o_totalprice").cast("double").alias("v"),
            F.col("o_orderkey").alias("ok"),
        )
        .collect()
    )
    b1 = [f"{r['k']},I,,{r['v']!r}" for r in feed_rows]
    b2 = [
        f"{r['k']},D,{r['v']!r}," for r in feed_rows if r["ok"] % 40 == 0
    ] + [
        f"{r['k']},I,,{r['v'] + 1000.0!r}"
        for r in feed_rows
        if r["ok"] % 56 == 0
    ]
    b3 = [
        f"{r['k']},U,{r['v']!r},{r['v'] / 2!r}"
        for r in feed_rows
        if r["ok"] % 48 == 8
    ]
    keyvals: dict[str, int] = {}
    for r in feed_rows:
        keyvals.setdefault(r["k"], int(r["v"] * 100))
    hll = [
        [f"{r['k']},u{r['ok']}" for r in feed_rows],
        [f"{r['k']},u{r['ok'] + (r['ok'] % 2)}" for r in feed_rows],
        [f"{r['k']},w{r['ok']}" for r in feed_rows if r["ok"] % 4 == 0],
    ]
    ewma = [
        [f"{k},{t},{x + 13 * t}" for k, x in sorted(keyvals.items())]
        for t in (1, 2, 3)
    ]
    return {
        "stream_minmax_maintenance": ("k,op,old_val,new_val", [b1, b2, b3]),
        "stream_topk_maintenance": ("k,op,old_val,new_val", [b1, b2, b3]),
        "stream_cm_maintenance": ("k,op,old_val,new_val", [b1, b2, b3]),
        "stream_hll_maintenance": ("k,v", hll),
        "stream_ewma_maintenance": ("k,t,x", ewma),
    }


def _run_stream(spark, leg, header, batches, work):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (  # noqa: E501
        stream_cm_maintenance,
        stream_ewma_maintenance,
        stream_hll_maintenance,
        stream_minmax_maintenance,
        stream_topk_maintenance,
    )

    raw = os.path.join(work, "raw")
    os.makedirs(raw)
    fp, sp, ck = (os.path.join(work, d) for d in ("fact", "state", "ckpt"))
    batch_times = []
    for bi, rows in enumerate(batches, start=1):
        with open(os.path.join(raw, f"b{bi}.csv"), "w") as f:
            f.write(header + "\n")
            f.write("\n".join(rows) + "\n")
        t0 = time.time()
        if leg == "stream_minmax_maintenance":
            q = stream_minmax_maintenance(spark, raw, fp, sp, ck)
        elif leg == "stream_topk_maintenance":
            q = stream_topk_maintenance(spark, raw, fp, sp, ck, k=3, buffer=2)
        elif leg == "stream_cm_maintenance":
            q = stream_cm_maintenance(spark, raw, sp, ck, depth=4, width=256)
        elif leg == "stream_hll_maintenance":
            q = stream_hll_maintenance(spark, raw, sp, ck)
        else:
            q = stream_ewma_maintenance(spark, raw, sp, ck)
        q.awaitTermination(600)
        batch_times.append(round(time.time() - t0, 3))
    return batch_times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--calib",
        action="store_true",
        help="record bench.py calibration anchors at start and end",
    )
    ap.add_argument("legs", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-subset")
    # same warmup as bench.py (session machinery, not leg code)
    from pyspark.sql import Window as _W

    warm = spark.range(10_000).select("id", (F.col("id") % 7).alias("k"))
    (
        warm.groupBy("k")
        .agg(F.sum("id").alias("s"))
        .join(F.broadcast(spark.range(7).withColumnRenamed("id", "k")), "k")
        .withColumn("r", F.row_number().over(_W.partitionBy("k").orderBy("s")))
        .collect()
    )
    warm.limit(64).mapInPandas(lambda it: it, "id long, k long").count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).limit(1).collect()

    calib_start = calib_end = None
    if args.calib:
        from bench import _calibration

        calib_start = _calibration(spark)

    feeds = (
        _stream_feeds(spark, sf_dir)
        if any(l in STREAM_LEGS for l in args.legs)
        else {}
    )
    out: dict[str, float] = {}
    for rep in range(args.reps):
        for leg in args.legs:
            if leg in STREAM_LEGS:
                work = tempfile.mkdtemp(prefix=f"bsub_{leg}_")
                try:
                    t0 = time.time()
                    bt = _run_stream(spark, leg, *feeds[leg], work)
                    took = round(sum(bt), 3)
                    print(
                        f"# [{rep + 1}/{args.reps}] {leg}: {took:.3f}s "
                        f"(per-batch {bt})",
                        file=sys.stderr,
                    )
                finally:
                    shutil.rmtree(work, ignore_errors=True)
            else:
                qd = catalog.CATALOG[leg]
                t0 = time.time()
                n = len(qd.builder(spark, sf_dir).collect())
                took = round(time.time() - t0, 3)
                print(
                    f"# [{rep + 1}/{args.reps}] {leg}: {took:.3f}s ({n} rows)",
                    file=sys.stderr,
                )
            out[leg] = min(out.get(leg, took), took)
    if args.calib:
        from bench import _calibration

        calib_end = _calibration(spark)
        print(
            json.dumps(
                {
                    "legs": out,
                    "calib": [
                        round(min(calib_start[k], calib_end[k]), 3)
                        for k in ("cpu_agg_10m", "io_write_5m", "io_scan_5m")
                    ],
                    "calib_start": calib_start,
                    "calib_end": calib_end,
                }
            )
        )
    else:
        print(json.dumps(out))


if __name__ == "__main__":
    main()

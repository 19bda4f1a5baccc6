"""Job-level decomposition of one stream-twin bench leg (guide §1).

Replicates bench.py's stream_* legs (same feed rows, same 3 batches,
fresh dirs), then dumps EVERY succeeded Spark job with submission time,
duration and name, plus per-batch wall clocks — so a ~7 s/batch leg
decomposes into its driver actions instead of being one opaque number.

Usage: python scripts/probe_stream_jobs.py [--leg minmax|topk|cm|hll|ewma]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.session import get_spark
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
    stream_cm_maintenance,
    stream_ewma_maintenance,
    stream_hll_maintenance,
    stream_minmax_maintenance,
    stream_topk_maintenance,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import load_table


def _jobs(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded",
        timeout=10,
    ) as r:
        return json.loads(r.read())


def _ts(s: str) -> float:
    t = time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")
    return time.mktime(t) + float(s[20:23] or 0) / 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", default="minmax",
                    choices=["minmax", "topk", "cm", "hll", "ewma"])
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()
    spark = get_spark("probe-stream")

    feed_rows = (
        load_table(spark, args.sf_dir, "orders")
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
    header, batches = "k,op,old_val,new_val", [b1, b2, b3]
    if args.leg == "hll":
        header = "k,v"
        batches = [
            [f"{r['k']},u{r['ok']}" for r in feed_rows],
            [f"{r['k']},u{r['ok'] + (r['ok'] % 2)}" for r in feed_rows],
            [f"{r['k']},w{r['ok']}" for r in feed_rows if r["ok"] % 4 == 0],
        ]
    elif args.leg == "ewma":
        header = "k,t,x"
        keyvals: dict[str, int] = {}
        for r in feed_rows:
            keyvals.setdefault(r["k"], int(r["v"] * 100))
        batches = [
            [f"{k},{t},{x + 13 * t}" for k, x in sorted(keyvals.items())]
            for t in (1, 2, 3)
        ]

    work = tempfile.mkdtemp(prefix=f"probe_stream_{args.leg}_")
    try:
        raw = os.path.join(work, "raw")
        os.makedirs(raw)
        fp, sp, ck = (os.path.join(work, d) for d in ("fact", "state", "ckpt"))
        marks = [time.time()]
        for bi, rows in enumerate(batches, start=1):
            with open(os.path.join(raw, f"b{bi}.csv"), "w") as f:
                f.write(header + "\n")
                f.write("\n".join(rows) + "\n")
            if args.leg == "minmax":
                q = stream_minmax_maintenance(spark, raw, fp, sp, ck)
            elif args.leg == "topk":
                q = stream_topk_maintenance(spark, raw, fp, sp, ck,
                                            k=3, buffer=2)
            elif args.leg == "cm":
                q = stream_cm_maintenance(spark, raw, sp, ck,
                                          depth=4, width=256)
            elif args.leg == "hll":
                q = stream_hll_maintenance(spark, raw, sp, ck)
            else:
                q = stream_ewma_maintenance(spark, raw, sp, ck)
            q.awaitTermination(600)
            marks.append(time.time())
        jobs = _jobs(spark)
        t0 = marks[0]
        for bi in range(1, len(marks)):
            wall = marks[bi] - marks[bi - 1]
            bjobs = [
                j for j in jobs
                if marks[bi - 1] - t0
                <= _ts(j["submissionTime"]) - t0
                < marks[bi] - t0
            ]
            tot = 0.0
            lines = []
            for j in sorted(bjobs, key=lambda j: j["submissionTime"]):
                d = _ts(j["completionTime"]) - _ts(j["submissionTime"])
                tot += d
                lines.append(f"    {d:6.3f}s  {j.get('name', '?')[:90]}")
            print(f"batch {bi}: wall {wall:.2f}s, {len(bjobs)} jobs, "
                  f"job-sum {tot:.2f}s")
            for ln in lines:
                print(ln)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

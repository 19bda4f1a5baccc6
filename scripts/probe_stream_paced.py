"""Verify the r15 bench stream-leg restructure (verdict task 4): ONE
paced availableNow query (maxFilesPerTrigger=1) over a pre-written
3-file feed must produce byte-identical final state — and the same
number of state commits — as the r14 methodology of starting a fresh
availableNow query per feed file. Also reports wall-clock and Spark
job counts per side, the start/teardown saving being the point.

Usage: python scripts/probe_stream_paced.py [leg ...]
Legs default to all five twins.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.session import get_spark
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
    stream_cm_maintenance,
    stream_ewma_maintenance,
    stream_hll_maintenance,
    stream_minmax_maintenance,
    stream_topk_maintenance,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import load_table

CHG_DDL = "k string, op string, old_val double, new_val double"


def feeds(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
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
    b3 = [
        f"{r['k']},U,{r['v']!r},{r['v'] / 2!r}"
        for r in rows
        if r["ok"] % 48 == 8
    ]
    keyvals: dict[str, int] = {}
    for r in rows:
        keyvals.setdefault(r["k"], int(r["v"] * 100))
    hll = [
        [f"{r['k']},u{r['ok']}" for r in rows],
        [f"{r['k']},u{r['ok'] + (r['ok'] % 2)}" for r in rows],
        [f"{r['k']},w{r['ok']}" for r in rows if r["ok"] % 4 == 0],
    ]
    ewma = [
        [f"{k},{t},{x + 13 * t}" for k, x in sorted(keyvals.items())]
        for t in (1, 2, 3)
    ]
    return {
        "stream_minmax_maintenance": ("k,op,old_val,new_val", CHG_DDL, [b1, b2, b3]),
        "stream_topk_maintenance": ("k,op,old_val,new_val", CHG_DDL, [b1, b2, b3]),
        "stream_cm_maintenance": ("k,op,old_val,new_val", CHG_DDL, [b1, b2, b3]),
        "stream_hll_maintenance": ("k,v", "k string, v string", hll),
        "stream_ewma_maintenance": (
            "k,t,x", "k string, t long, x long", ewma,
        ),
    }


def starter(leg, spark):
    if leg == "stream_minmax_maintenance":
        return lambda raw, w: stream_minmax_maintenance(
            spark, raw, f"{w}/fact", f"{w}/state", f"{w}/ckpt"
        )
    if leg == "stream_topk_maintenance":
        return lambda raw, w: stream_topk_maintenance(
            spark, raw, f"{w}/fact", f"{w}/state", f"{w}/ckpt", k=3, buffer=2
        )
    if leg == "stream_cm_maintenance":
        return lambda raw, w: stream_cm_maintenance(
            spark, raw, f"{w}/state", f"{w}/ckpt", depth=4, width=256
        )
    if leg == "stream_hll_maintenance":
        return lambda raw, w: stream_hll_maintenance(
            spark, raw, f"{w}/state", f"{w}/ckpt"
        )
    return lambda raw, w: stream_ewma_maintenance(
        spark, raw, f"{w}/state", f"{w}/ckpt"
    )


def table_fingerprint(spark, path):
    if not os.path.isdir(path):
        return None
    df = S.read(spark, path)
    # _app_id is an md5 of the CHECKPOINT PATH — different per side by
    # construction; everything else (including _last_batch) must match
    df = df.select(*[c for c in df.columns if c != "_app_id"])
    rows = sorted(repr(tuple(r)) for r in df.collect())
    return (len(S._versions(path)), len(rows), hash(tuple(rows)))


def job_count(spark) -> int:
    return spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None).length


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("probe-stream-paced")
    legs = sys.argv[1:] or list(feeds(spark, sf_dir).keys())
    fd = feeds(spark, sf_dir)
    for leg in legs:
        header, ddl, batches = fd[leg]
        start = starter(leg, spark)
        # side A: r14 methodology — fresh query per feed file
        wa = tempfile.mkdtemp(prefix=f"paced_a_{leg}_")
        rawa = os.path.join(wa, "raw")
        os.makedirs(rawa)
        ta = time.time()
        for bi, rows in enumerate(batches, start=1):
            with open(os.path.join(rawa, f"b{bi}.csv"), "w") as f:
                f.write(header + "\n" + "\n".join(rows) + "\n")
            q = start(rawa, wa)
            q.awaitTermination(600)
        ta = time.time() - ta
        fa = table_fingerprint(spark, f"{wa}/state")
        ffa = table_fingerprint(spark, f"{wa}/fact")
        # side B: r15 methodology — one paced availableNow run
        wb = tempfile.mkdtemp(prefix=f"paced_b_{leg}_")
        rawb = os.path.join(wb, "raw")
        os.makedirs(rawb)
        now = time.time()
        for bi, rows in enumerate(batches, start=1):
            p = os.path.join(rawb, f"b{bi}.csv")
            with open(p, "w") as f:
                f.write(header + "\n" + "\n".join(rows) + "\n")
            os.utime(p, (now, now - 2.0 * (len(batches) - bi)))
        tb = time.time()
        reader = (
            spark.readStream.schema(ddl)
            .option("header", True)
            .option("maxFilesPerTrigger", "1")
            .csv(rawb)
        )
        q = start(reader, wb)
        q.awaitTermination(600)
        tb = time.time() - tb
        nb = len(q.recentProgress)
        fb = table_fingerprint(spark, f"{wb}/state")
        ffb = table_fingerprint(spark, f"{wb}/fact")
        ok = fa == fb and ffa == ffb
        print(
            f"{leg}: identical={ok} micro_batches={nb} "
            f"state A={fa} B={fb} fact A={ffa} B={ffb} "
            f"wall A={ta:.2f}s B={tb:.2f}s",
            flush=True,
        )
        shutil.rmtree(wa, ignore_errors=True)
        shutil.rmtree(wb, ignore_errors=True)
        if not ok:
            sys.exit(1)
    print("ALL IDENTICAL")


if __name__ == "__main__":
    main()

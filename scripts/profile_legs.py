"""Per-leg profiler for the optimization rounds (guide §1).

For each requested leg this tool:

* captures ``df.explain("formatted")`` to ``plans/r15/<leg>_<tag>.txt (override: $SPARK_GRAFT_PLANS_DIR)``
  (catalog legs only — the job legs are imperative, no single plan),
* times the leg exactly like bench.py (build + collect, min over reps),
* labels the leg's jobs with ``setJobDescription`` and, after each rep,
  reads the local Spark UI REST API to report how many jobs the leg ran
  and where the time went (job count × per-job wall — the local-mode
  protocol floor is ~0.1 s/job, so job COUNT is itself a first-class
  optimization target: every job is a driver round-trip at any scale),
* optionally times the computation through the noop sink (guide §1.4)
  so collect/driver transfer cost is visible separately.

Usage:
  python scripts/profile_legs.py [--tag before] [--reps 2] [--noop]
      [--no-plans] leg [leg ...]
  python scripts/profile_legs.py --headline   # the bench headline set
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import catalog
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import get_spark


def _jobs_api(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded", timeout=10
        ) as r:
            return json.loads(r.read())
    except Exception as e:  # UI disabled or port oddity: degrade gracefully
        print(f"# REST API unavailable: {e}", file=sys.stderr)
        return []


def _leg_jobs(spark, desc: str) -> tuple[int, float, list[tuple[float, str]]]:
    """(n_jobs, total_job_seconds, [(sec, jobname) slowest-first])."""
    jobs = [j for j in _jobs_api(spark) if j.get("description") == desc]
    durs = []
    for j in jobs:
        try:
            t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ms0 = float(j["submissionTime"][20:23] or 0)
            ms1 = float(j["completionTime"][20:23] or 0)
            d = (time.mktime(t1) + ms1 / 1e3) - (time.mktime(t0) + ms0 / 1e3)
        except Exception:
            d = 0.0
        durs.append((round(d, 3), j.get("name", "?")[:60]))
    durs.sort(reverse=True)
    return len(jobs), round(sum(d for d, _ in durs), 3), durs


def profile_leg(
    spark, name: str, sf_dir: str, reps: int, tag: str,
    noop: bool, plans_dir: str | None,
) -> dict:
    qd = catalog.CATALOG[name]
    out: dict = {"leg": name}
    if plans_dir is not None:
        df = qd.builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        os.makedirs(plans_dir, exist_ok=True)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        plan = buf.getvalue()
        out["exchanges"] = plan.count("Exchange")
        out["python_nodes"] = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("MapInArrow")
        )
    for rep in range(reps):
        desc = f"profile:{name}:{tag}:{rep}"
        spark.sparkContext.setJobDescription(desc)
        t0 = time.time()
        df = qd.builder(spark, sf_dir)
        nrows = len(df.collect())
        took = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        out["collect_s"] = min(out.get("collect_s", took), took)
        njobs, jobsec, durs = _leg_jobs(spark, desc)
        if rep == reps - 1:
            out.update(n_jobs=njobs, job_seconds=jobsec, rows=nrows,
                       slowest_jobs=durs[:6])
        if noop:
            desc = f"profile-noop:{name}:{tag}:{rep}"
            spark.sparkContext.setJobDescription(desc)
            t0 = time.time()
            qd.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            took = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            out["noop_s"] = min(out.get("noop_s", took), took)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("legs", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()
    legs = list(args.legs)
    if args.headline:
        legs += [n for n, qd in catalog.CATALOG.items() if qd.headline]
    plans_dir = None if args.no_plans else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    spark = get_spark("profile")
    # identical warmup to bench.py so first-leg numbers are comparable
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    warm = spark.range(10_000).select("id", (_F.col("id") % 7).alias("k"))
    (
        warm.groupBy("k").agg(_F.sum("id").alias("s"))
        .join(_F.broadcast(spark.range(7).withColumnRenamed("id", "k")), "k")
        .withColumn("r", _F.row_number().over(_W.partitionBy("k").orderBy("s")))
        .collect()
    )
    warm.limit(64).mapInPandas(lambda it: it, "id long, k long").count()
    spark.read.parquet(
        os.path.join(args.sf_dir, "region.parquet")
    ).limit(1).collect()

    results = []
    for leg in legs:
        r = profile_leg(spark, leg, args.sf_dir, args.reps, args.tag,
                        args.noop, plans_dir)
        results.append(r)
        print(json.dumps(r), flush=True)
    print("# total collect_s:",
          round(sum(r["collect_s"] for r in results), 3), file=sys.stderr)


if __name__ == "__main__":
    main()

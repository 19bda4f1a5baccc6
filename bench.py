"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {"pricing_summary": <sec>, ...}, "sf": <float>}

Per-query time is wall-clock of plan construction + execution + collect on a
warm session (JVM/session startup excluded — the reference's baseline is
dominated by orchestration overhead we deliberately do not reproduce).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import catalog
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    # warm the session (JVM codegen, parquet footer caches) with a trivial job
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name, qd in catalog.CATALOG.items():
        if not qd.headline:
            continue
        t0 = time.time()
        df = qd.builder(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Candidate-growth probe for the FastSS entity-resolution path.

The sf1.0 scale probe measured ``er_golden_records`` at 14.3x wall for 10x
data and DIAGNOSED it as linear x ambient x denser digit-neighbor structure
— but on min-of-1 timing with no candidate counter. This tool turns that
argument into a measurement: for each sf dir it counts every intermediate
of the exact pipeline behind ``q_er_golden_records`` (shared code —
``plans.catalog.er_fastss_stages``) and times the full query min-of-REPS.

Usage: python tools/er_probe.py [sf_dir ...]   (default sf0.1)

Prints one table row per sf dir:
  customers, signature rows, raw signature collisions (the number that
  decides linearity — everything downstream filters or dedups it),
  distinct verified candidate pairs, golden records, min wall seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (  # noqa: E402
    catalog,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import (  # noqa: E402
    get_spark,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (  # noqa: E402
    load_table,
)


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("er-probe")
    print(
        f"{'sf_dir':<24} {'customers':>10} {'sig_rows':>10} "
        f"{'collisions':>11} {'candidates':>11} {'golden':>8} {'wall_s':>7}"
    )
    for sf in sf_dirs:
        c = load_table(spark, sf, "customer").select(
            "c_custkey", "c_name", "c_nationkey", "c_acctbal"
        )
        stages = catalog.er_fastss_stages(c)
        n_cust = c.count()
        n_sig = stages["signatures"].count()
        n_coll = stages["collisions"].count()
        n_cand = stages["candidates"].count()
        best, golden = None, 0
        for _ in range(reps):
            t0 = time.time()
            golden = len(catalog.q_er_golden_records(spark, sf).collect())
            took = time.time() - t0
            best = took if best is None else min(best, took)
        print(
            f"{sf:<24} {n_cust:>10} {n_sig:>10} {n_coll:>11} "
            f"{n_cand:>11} {golden:>8} {best:>7.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

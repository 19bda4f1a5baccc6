"""Plan audit: physical-plan health summary for every catalog query.

Per query: exchanges, join strategies, scan pushdown presence, Python eval
nodes, codegen stage count — the checklist from the 100 TB design notes.
Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (  # noqa: E402
    catalog,
    explain,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    spark.range(10).count()
    print(f"{'query':34} {'exch':>4} {'bhj':>3} {'smj':>3} {'py':>3} "
          f"{'wsc':>3}  flags")
    for name, qd in catalog.CATALOG.items():
        try:
            df = qd.builder(spark, sf)
            text = explain.executed_plan_text(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34} ERROR {e}")
            continue
        exch = len(re.findall(r"Exchange (hash|range|Single)", text))
        bhj = text.count("BroadcastHashJoin")
        smj = text.count("SortMergeJoin")
        py_nodes = len(re.findall(r"BatchEvalPython", text))
        wsc = len(set(re.findall(r"\*\((\d+)\)", text)))
        flags = []
        if "BatchEvalPython" in text:
            flags.append("ROW-PYTHON!")
        if smj and not bhj:
            flags.append("smj-only")
        if "CartesianProduct" in text:
            flags.append("cartesian")
        if "BroadcastNestedLoopJoin" in text:
            flags.append("bnlj")
        print(f"{name:34} {exch:>4} {bhj:>3} {smj:>3} {py_nodes:>3} {wsc:>3}  "
              f"{' '.join(flags)}")


if __name__ == "__main__":
    main()

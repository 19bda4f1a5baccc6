"""r15 (verdict task 3): interleaved A/B of the md5 minhash_lsh_pairs
leg's two substrates at a LARGE scale factor — the r14 arrays +
explicit-repartition path vs the pre-r14 exploded-index path — to
settle which wins where the work is data-bound rather than
overhead-bound (at sf0.1 the driver measured the arrays path 0.72x,
inside host noise but unproven).

Both paths are value-identical (same md5 hash family, same band keys;
pinned by tests/test_textdedup_arrays.py), so the catalog leg's RESULT
does not change whichever is kept — this probe only picks the plan.

Usage:
  SPARK_GRAFT_SF_DIR=/tmp/sf1.0 python scripts/probe_minhash_sf1.py \
      [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    textdedup as TD,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import get_spark
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import load_table


def doubled_corpus(spark, sf_dir):
    # the catalog leg's exact corpus shape (plans/catalog._doubled_corpus)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    variants = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.substring(
            F.col("text"),
            1,
            F.floor(F.length("text") * 4.0 / 5).cast("int"),
        ).alias("text"),
        "source",
    )
    return d.unionByName(variants)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")
    spark = get_spark("probe-minhash-sf1")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(
        1
    ).collect()  # warm reader stack
    corpus = doubled_corpus(spark, sf_dir)

    res: dict[str, list[float]] = {"arrays": [], "index": []}
    counts: dict[str, int] = {}
    for rep in range(args.reps):
        for side in ("arrays", "index") if rep % 2 == 0 else ("index", "arrays"):
            spark.sparkContext.setJobDescription(f"lsh_pairs:{side}:{rep}")
            t0 = time.time()
            if side == "arrays":
                out = TD.minhash_lsh_pairs(
                    corpus, "doc_id", "text", n=3, k=8, rows_per_band=2
                )
            else:
                idx = TD.shingle_index(corpus, "doc_id", "text", 3)
                out = TD.minhash_lsh_pairs(
                    corpus, "doc_id", "text", n=3, k=8, rows_per_band=2,
                    index=idx,
                )
            n = len(out.collect())
            took = round(time.time() - t0, 3)
            res[side].append(took)
            counts[side] = n
            print(f"# rep {rep + 1} {side}: {took:.3f}s ({n} pairs)",
                  flush=True)
    assert counts["arrays"] == counts["index"], counts
    print(
        f"RESULT arrays min={min(res['arrays'])} all={res['arrays']} | "
        f"index min={min(res['index'])} all={res['index']} | "
        f"pairs={counts['arrays']}"
    )


if __name__ == "__main__":
    main()

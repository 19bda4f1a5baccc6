"""Phase-level timing of the two imperative bench legs (guide §1).

Replicates bench.py's etl_orders_batch and curation_job_batch setups, but
wraps each driver action inside the job with a jobGroup label and times the
phases from the driver, so the 12.65 s (r13) curation leg decomposes into
its stages instead of being one opaque number. Read-only with respect to
the engine: imports the same entry points bench.py uses.

Usage: python scripts/probe_job_phases.py [--leg curation|etl] [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.session import get_spark
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
    ORDERS,
    load_table,
)


def probe_curation(spark, sf_dir: str, reps: int) -> None:
    """Phase copy of etl/datapipe.run_curation_job with per-phase walls."""
    from pyspark.sql import Window

    from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.datapipe import (
        run_curation_job,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
        text as T,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        contamination as CON,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        graph as G,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        packing as PK,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        textdedup as TD,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
        snapshots as S,
    )

    docs_all = load_table(spark, sf_dir, "documents")
    ev = docs_all.filter(F.col("doc_id") % 50 == 17)
    docs = docs_all.filter(F.col("doc_id") % 50 != 17)

    for rep in range(reps):
        work = tempfile.mkdtemp(prefix="probe_curation_")
        marks: list[tuple[str, float]] = []

        def mark(label: str, _m=marks) -> None:
            _m.append((label, time.time()))

        try:
            out_path = os.path.join(work, "snap")
            mark("start")
            scored = docs.select(
                "doc_id", "text", "source", "n_chars",
                T.quality_score(F.col("text")).alias("quality"),
                T.fingerprint(F.col("text")).alias("fp"),
            ).withColumn(
                "gate_ok",
                (F.col("quality") >= 0.3) & (F.col("n_chars") >= 100),
            )
            w = Window.partitionBy("fp")
            flagged = scored.withColumn(
                "is_keeper",
                F.col("gate_ok")
                & (
                    F.col("doc_id")
                    == F.min(F.when(F.col("gate_ok"), F.col("doc_id"))).over(w)
                ),
            ).cache()
            survivors = flagged.filter(F.col("is_keeper"))
            idx = TD.shingle_arrays(
                survivors, "doc_id", "text", n=3
            ).persist()
            pairs = TD.minhash_dedup_verified(
                survivors, "doc_id", "text", n=3, k=8, threshold=0.5,
                arrays=idx,
            ).select("doc1", "doc2")
            near_drop = (
                G.dedup_clusters(pairs, "doc1", "doc2")
                .filter(~F.col("is_canonical"))
                .select(F.col("node").alias("doc_id"))
                .cache()
            )
            n_near = near_drop.count()
            mark("lsh+components (n_near count)")
            deduped = survivors.join(near_drop, "doc_id", "left_anti")
            ratios = CON.contamination_ratios(deduped, ev, n=3, arrays=idx)
            dirty = (
                ratios.filter(F.col("contamination") > 0.5)
                .select("doc_id")
                .cache()
            )
            n_cont = dirty.count()
            mark("contamination (dirty count)")
            idx.unpersist()
            deduped = deduped.join(dirty, "doc_id", "left_anti")
            packed = PK.pack_sequences(deduped, ctx_tokens=64)
            version = S.commit(spark, packed, out_path, mode="overwrite")
            mark("pack + snapshot commit")
            out = S.read(spark, out_path, version)
            counts = flagged.agg(
                F.count(F.lit(1)).alias("n_input"),
                F.sum((~F.col("gate_ok")).cast("long")).alias("n_gated_out"),
                F.sum(
                    (F.col("gate_ok") & ~F.col("is_keeper")).cast("long")
                ).alias("n_exact_dups"),
            ).first()
            mark("stat counts agg")
            per_shard = out.groupBy("source").agg(
                (F.max("last_pack") + 1).alias("shard_packs")
            )
            n_packs = int(per_shard.agg(F.sum("shard_packs")).first()[0] or 0)
            mark("pack count agg")
            for fr in (flagged, near_drop, dirty):
                fr.unpersist()
            total = marks[-1][1] - marks[0][1]
            print(f"# rep {rep}: total {total:.2f}s  "
                  f"(n_near={n_near} n_cont={n_cont} n_packs={n_packs})")
            for (la, ta), (lb, tb) in zip(marks, marks[1:]):
                print(f"#   {tb - ta:6.2f}s  {lb}")
        finally:
            shutil.rmtree(work, ignore_errors=True)

        # reference wall of the real entry point, same session
        work = tempfile.mkdtemp(prefix="probe_curation_ref_")
        try:
            t0 = time.time()
            run_curation_job(
                spark, docs, os.path.join(work, "snap"), ctx_tokens=64,
                eval_docs=ev, contamination_max=0.5, contamination_ngram=3,
            )
            print(f"# rep {rep}: run_curation_job wall "
                  f"{time.time() - t0:.2f}s")
        finally:
            shutil.rmtree(work, ignore_errors=True)


def probe_etl(spark, sf_dir: str, reps: int) -> None:
    from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.jobs import (
        run_etl_job,
    )

    work = tempfile.mkdtemp(prefix="probe_etl_")
    try:
        raw = (
            load_table(spark, sf_dir, "orders")
            .select(
                (F.col("o_orderkey") % 100).alias("order_num"),
                F.col("o_orderkey").alias("order_id"),
                F.col("o_custkey").alias("user_id"),
                F.col("o_orderdate").alias("order_timestamp"),
                F.col("o_totalprice").alias("total_amount"),
                F.date_format("o_orderdate", "yyyy-MM").alias("date"),
            )
        )
        raw.write.option("header", True).mode("overwrite").csv(f"{work}/raw")
        for rep in range(reps):
            t0 = time.time()
            res = run_etl_job(
                spark, ORDERS, f"{work}/raw/*.csv", f"{work}/wh{rep}",
                f"{work}/rej{rep}", "probe",
            )
            print(f"# rep {rep}: run_etl_job wall {time.time() - t0:.2f}s "
                  f"({res.rows_written} rows)")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", default="curation",
                    choices=["curation", "etl"])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()
    spark = get_spark("probe-phases")
    if args.leg == "curation":
        probe_curation(spark, args.sf_dir, args.reps)
    else:
        probe_etl(spark, args.sf_dir, args.reps)


if __name__ == "__main__":
    main()

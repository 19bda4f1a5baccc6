"""r13 verdict task 6: dense-regime scale probes for the longest-
unprobed heavy legs — graph at 100x edges with skewed degree, BM25 +
indexed phrase search at 100x documents, and the composed curation
pipeline at sf1.0.

    python scripts/probe_r14_heavy.py --leg graph|bm25|curation [--reps 2]

Each leg times its queries at sf0.1 first (same session, warm) and then
at the scaled build, printing a ready-to-paste TUNING.md table with the
wall ratio. Scaled data is transient, regenerated deterministically by
scripts/make_scaled_sf.py (events-only / documents-only partial sources
are supported — the scaler skips absent key spaces).

Skew note (graph): user_id is replica-offset, so user nodes are
disjoint across replicas, but event_type hub nodes are SHARED — their
degree grows 100x, exactly the skewed-key regime a 1000-executor
cluster would see on a power-law graph.
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

SRC = "/root/testdata/sf0.1"


def build_scaled(dst: str, tables: list[str] | None, factor: int) -> None:
    """Replicate SRC (optionally a subset of tables) by ``factor``."""
    src = tempfile.mkdtemp(prefix="probe_src_")
    try:
        names = tables or [
            f[: -len(".parquet")]
            for f in os.listdir(SRC)
            if f.endswith(".parquet")
        ]
        for t in names:
            shutil.copy(
                os.path.join(SRC, f"{t}.parquet"),
                os.path.join(src, f"{t}.parquet"),
            )
        subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "make_scaled_sf.py"),
                src,
                dst,
                str(factor),
            ],
            check=True,
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def timed(label: str, fn, reps: int):
    walls, rows = [], 0
    for _ in range(reps):
        t0 = time.time()
        rows = len(fn().collect())
        walls.append(round(time.time() - t0, 1))
    print(f"#   {label}: {min(walls)} s (reps {walls}), {rows} rows")
    return min(walls), rows


def leg_graph(spark, reps: int) -> None:
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (
        catalog,
    )

    names = [
        "pagerank_events",
        "k_core_nodes",
        "lp_communities",
        "triangle_counts",
        "bfs_reachability",
        "sssp_min_costs",
    ]
    names = [n for n in names if n in catalog.CATALOG]
    dst = tempfile.mkdtemp(prefix="events100x_")
    try:
        t0 = time.time()
        build_scaled(dst, ["events"], 100)
        print(f"# events 100x build: {time.time() - t0:.1f}s")
        n = spark.read.parquet(os.path.join(dst, "events.parquet")).count()
        print(f"# events rows at 100x: {n}")
        print("\n| leg | sf0.1 | 100x | ratio |")
        print("|---|---|---|---|")
        for name in names:
            b = catalog.CATALOG[name].builder
            base, _ = timed(f"{name} sf0.1", lambda: b(spark, SRC), reps)
            big, rows = timed(f"{name} 100x", lambda: b(spark, dst), reps)
            print(
                f"| {name} | {base} s | {big} s | "
                f"{big / max(base, 0.001):.1f}x ({rows} rows) |"
            )
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def leg_bm25(spark, reps: int) -> None:
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.ranking import (
        build_postings,
        phrase_search,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (
        catalog,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
        snapshots as SNAP,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        load_table,
    )

    dst = tempfile.mkdtemp(prefix="docs100x_")
    work = tempfile.mkdtemp(prefix="postings100x_")
    try:
        t0 = time.time()
        build_scaled(dst, ["documents"], 100)
        print(f"# documents 100x build: {time.time() - t0:.1f}s")
        print("\n| leg | sf0.1 | 100x | ratio / detail |")
        print("|---|---|---|---|")
        b = catalog.CATALOG["bm25_search"].builder
        base, _ = timed("bm25 sf0.1", lambda: b(spark, SRC), reps)
        big, _ = timed("bm25 100x", lambda: b(spark, dst), reps)
        print(f"| bm25_search | {base} s | {big} s | {big / base:.1f}x |")

        docs = load_table(spark, dst, "documents")
        t0 = time.time()
        SNAP.commit(
            spark,
            build_postings(docs),
            os.path.join(work, "postings"),
            stats_for=["term"],
            cluster_by=["term"],
            n_files=64,
        )
        built = time.time() - t0
        phrase = ["slow", "hash", "batch"]
        walls = []
        stats = {}
        for _ in range(reps):
            stats = {}
            t0 = time.time()
            pruned = SNAP.read_where(
                spark,
                os.path.join(work, "postings"),
                [("term", "in", phrase)],
                report=stats,
            )
            nd = len(phrase_search(pruned, phrase).collect())
            walls.append(round(time.time() - t0, 1))
        print(
            f"| phrase_search_indexed 100x | build {built:.1f} s | "
            f"{min(walls)} s | files {stats.get('files_kept')}/"
            f"{stats.get('files_total')} kept, {nd} docs |"
        )
    finally:
        shutil.rmtree(dst, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


def leg_curation(spark, reps: int) -> None:
    from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.datapipe import (
        run_curation_job,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        load_table,
    )

    dst = tempfile.mkdtemp(prefix="sf1_")
    try:
        t0 = time.time()
        build_scaled(dst, ["documents"], 10)
        print(f"# documents sf1.0 build: {time.time() - t0:.1f}s")
        print("\n| leg | sf0.1 | sf1.0 (10x docs) | ratio |")
        print("|---|---|---|---|")

        def run(sf_dir):
            def f():
                out = tempfile.mkdtemp(prefix="curated_")
                try:
                    # same parameterization as bench.py's
                    # curation_job_batch leg, for comparability
                    docs = load_table(spark, sf_dir, "documents")
                    ev = docs.filter(F.col("doc_id") % 50 == 17)
                    tr = docs.filter(F.col("doc_id") % 50 != 17)
                    res = run_curation_job(
                        spark,
                        tr,
                        os.path.join(out, "t"),
                        ctx_tokens=64,
                        eval_docs=ev,
                        contamination_max=0.5,
                        contamination_ngram=3,
                    )
                    # shape the result as a 1-row frame so timed() fits
                    return spark.createDataFrame(
                        [
                            (
                                res.n_input,
                                res.n_curated,
                                res.n_near_dups,
                                res.n_packs,
                            )
                        ],
                        "n_input long, n_curated long, n_near long, n_packs long",
                    )
                finally:
                    shutil.rmtree(out, ignore_errors=True)

            return f

        base, _ = timed("curation sf0.1", run(SRC), reps)
        big, _ = timed("curation sf1.0", run(dst), reps)
        print(
            f"| curation_job_batch | {base} s | {big} s | "
            f"{big / base:.1f}x on 10x docs |"
        )
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", required=True, choices=["graph", "bm25", "curation"])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark(f"probe_r14_{args.leg}")
    {"graph": leg_graph, "bm25": leg_bm25, "curation": leg_curation}[
        args.leg
    ](spark, args.reps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

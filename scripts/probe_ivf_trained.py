"""r13 verdict task 3: measure the scale-safe IVF assignment shapes at
the 100x embeddings probe (the r13 sweep left the stride-37 default's
N²/37 FLOPs as the documented remaining wall of ivf_pq_refined).

    python scripts/probe_ivf_trained.py [--reps 2] [--keep DIR]

Builds a 100x embeddings corpus (scripts/make_scaled_sf.py on an
embeddings-only source — ~200k vectors, queries = vec_id%50==0) and
times, warm and min-of-reps:

  * ivf_ann / stride=37          — the oracle-default quadratic shape
  * ivf_ann / stride=sqrt(N)     — assignment N^1.5
  * ivf_ann / trained k=256      — stride=N/256 seeds + 2 spherical
                                   Lloyd passes: assignment O(N·k),
                                   the production-IVF shape
  * ivf_pq_refined at the same three parameterizations

Recall@5 of each variant is evaluated against the same exact
brute-force baseline (cosine_topk_fast) on a 200-query sample so the
speed table carries its quality column. Output: a ready-to-paste
TUNING.md table. The 100x data is transient and deterministic.
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (  # noqa: E402
    pq as PQ,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (  # noqa: E402
    similarity as SIM,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import (  # noqa: E402
    get_spark,
)

SRC = "/root/testdata/sf0.1"


def build_100x(dst: str) -> None:
    src = tempfile.mkdtemp(prefix="emb_src_")
    try:
        shutil.copy(
            os.path.join(SRC, "embeddings.parquet"),
            os.path.join(src, "embeddings.parquet"),
        )
        subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "make_scaled_sf.py"),
                src,
                dst,
                "100",
            ],
            check=True,
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--keep", default=None, help="reuse/keep the 100x dir")
    args = ap.parse_args()

    dst = args.keep or tempfile.mkdtemp(prefix="emb100x_")
    if not os.path.exists(os.path.join(dst, "embeddings.parquet")):
        t0 = time.time()
        build_100x(dst)
        print(f"# 100x build: {time.time() - t0:.1f}s -> {dst}")

    spark = get_spark("probe_ivf_trained")
    emb = spark.read.parquet(os.path.join(dst, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    corpus = emb.filter(F.col("vec_id") % 50 != 0)
    n = corpus.count()
    nq = queries.count()
    sqrt_stride = max(1, int(math.isqrt(n)))
    k256_stride = max(1, n // 256)
    print(
        f"# corpus {n} vectors, {nq} queries; sqrt stride {sqrt_stride} "
        f"(~{n // sqrt_stride} cells), trained stride {k256_stride} "
        f"(~{n // k256_stride} seed cells)"
    )
    books = PQ.pq_codebooks_head(corpus, m=8, k_codes=16)

    # exact baseline for recall (one run, sampled queries)
    probe_q = queries.filter(F.col("vec_id") % (50 * 20) == 0)
    npq = probe_q.count()
    t0 = time.time()
    exact = {
        (r["qid"], r["cid"])
        for r in SIM.cosine_topk_fast(probe_q, corpus, k=5).collect()
    }
    print(f"# exact baseline on {npq} queries: {time.time() - t0:.1f}s")

    def leg(name, fn, recall_fn=None):
        walls = []
        rows = 0
        for _ in range(args.reps):
            t0 = time.time()
            rows = len(fn().collect())
            walls.append(round(time.time() - t0, 1))
        rec = ""
        if recall_fn is not None:
            got = {
                (r["qid"], r["cid"]) for r in recall_fn().collect()
            }
            hit = len(got & exact)
            rec = f"{hit / max(1, len(exact)):.3f}"
        print(
            f"| {name} | {min(walls)} s (reps {walls}) | {rows} rows "
            f"| recall@5 {rec or 'n/a'} |"
        )

    train_sample = corpus.filter(F.col("vec_id") % 10 == 3)
    variants = [
        ("stride=37 (default)", dict(centroid_stride=37)),
        (f"stride=sqrt(N)={sqrt_stride}", dict(centroid_stride=sqrt_stride)),
        (
            f"trained k~256 (stride={k256_stride}, 2 Lloyd passes)",
            dict(centroid_stride=k256_stride, train_iters=2, train_tol=0.0),
        ),
        (
            f"trained k~256 on 10% sample (stride={k256_stride})",
            dict(
                centroid_stride=k256_stride,
                train_iters=2,
                train_tol=0.0,
                train_on=train_sample,
            ),
        ),
    ]
    print("\n| leg | wall (min of reps) | rows | recall |")
    print("|---|---|---|---|")
    for label, kw in variants:
        leg(
            f"ivf_ann / {label}",
            lambda kw=kw: SIM.ivf_topk(queries, corpus, k=5, nprobe=2, **kw),
            lambda kw=kw: SIM.ivf_topk(probe_q, corpus, k=5, nprobe=2, **kw),
        )
    for label, kw in variants:
        leg(
            f"ivf_pq_refined / {label}",
            lambda kw=kw: PQ.ivf_pq_refined(
                spark, queries, corpus, books, k=5, rerank=20, nprobe=2, **kw
            ),
            lambda kw=kw: PQ.ivf_pq_refined(
                spark, probe_q, corpus, books, k=5, rerank=20, nprobe=2, **kw
            ),
        )
    if not args.keep:
        shutil.rmtree(dst, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

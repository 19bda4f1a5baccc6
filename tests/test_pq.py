"""Product quantization: encode vs numpy argmin, ADC top-k vs numpy
reference, trained-codebook path, shuffle-free encode plan."""

from __future__ import annotations

import numpy as np
import pytest

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    pq as PQ,
)


def _corpus(spark, n=40, d=8, seed=7):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(d)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_encode_matches_numpy_argmin(spark):
    df, rows = _corpus(spark)
    books = PQ.pq_codebooks_head(df, m=2, k_codes=4)
    got = {r["id"]: r["codes"] for r in PQ.pq_encode(df, books).collect()}
    sub_d = 4
    for i, v in rows:
        v = np.array(v)
        for j in range(2):
            sub = v[j * sub_d : (j + 1) * sub_d]
            d2 = [
                float(((sub - np.array(c)) ** 2).sum())
                for c in books[j]
            ]
            assert got[i][j] == int(np.argmin(d2))


def test_adc_topk_matches_numpy(spark):
    df, rows = _corpus(spark)
    books = PQ.pq_codebooks_head(df, m=2, k_codes=4)
    codes_df = PQ.pq_encode(df, books)
    queries = df.filter("vec_id IN (3, 17)")
    got = [
        (r["qid"], r["cid"], r["rank"])
        for r in PQ.pq_adc_topk(spark, queries, codes_df, books, k=3)
        .orderBy("qid", "rank")
        .collect()
    ]
    # numpy reference: same quantization (micro-units, per-entry round)
    codes = {r["id"]: r["codes"] for r in codes_df.collect()}
    sub_d = 4
    expect = []
    for qid in (3, 17):
        qv = np.array(dict(rows)[qid])
        lut = [
            [
                int(round(float(((qv[j * sub_d : (j + 1) * sub_d] - np.array(c)) ** 2).sum()) * 1e6))
                for c in books[j]
            ]
            for j in range(2)
        ]
        scored = sorted(
            (sum(lut[j][cs[j]] for j in range(2)), i)
            for i, cs in codes.items()
        )
        expect.extend((qid, i, r + 1) for r, (_, i) in enumerate(scored[:3]))
    assert sorted(got) == sorted(expect)


def test_trained_codebooks_shape_and_usable(spark):
    df, _ = _corpus(spark, n=30)
    books = PQ.pq_codebooks_kmeans(df, m=2, k_codes=3, iters=2)
    assert len(books) == 2 and len(books[0]) == 3 and len(books[0][0]) == 4
    enc = PQ.pq_encode(df, books)
    assert enc.count() == 30
    assert all(0 <= c <= 2 for r in enc.collect() for c in r["codes"])


def test_dim_not_divisible_raises(spark):
    df, _ = _corpus(spark, d=6)
    with pytest.raises(ValueError, match="divisible"):
        PQ.pq_codebooks_head(df, m=4, k_codes=2)


def test_encode_plan_is_shuffle_free(spark):
    df, _ = _corpus(spark)
    books = PQ.pq_codebooks_head(df, m=2, k_codes=4)
    plan = (
        PQ.pq_encode(df, books)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_ivf_pq_allprobe_equals_full_adc(spark):
    """Probing every cell makes IVF-PQ candidate-complete, so its output
    must equal the unpruned ADC ranking exactly."""
    df, _ = _corpus(spark, n=40)
    books = PQ.pq_codebooks_head(df, m=2, k_codes=4)
    queries = df.filter("vec_id % 10 = 0")
    corpus = df.filter("vec_id % 10 != 0")
    n_cells = corpus.filter("vec_id % 7 = 0").count()
    full = PQ.pq_adc_topk(
        spark, queries, PQ.pq_encode(corpus, books), books, k=3
    )
    ivf = PQ.ivf_pq_topk(
        spark, queries, corpus, books, k=3,
        centroid_stride=7, nprobe=n_cells,
    )
    want = sorted(map(tuple, full.collect()))
    got = sorted(map(tuple, ivf.collect()))
    assert got == want and len(got) > 0


def test_ivf_pq_prunes_candidates(spark):
    """With nprobe=1 each query ranks only one cell's codes — results
    keep the (k per query, ranks 1..k) contract."""
    df, _ = _corpus(spark, n=40)
    books = PQ.pq_codebooks_head(df, m=2, k_codes=4)
    queries = df.filter("vec_id % 10 = 0")
    corpus = df.filter("vec_id % 10 != 0")
    out = PQ.ivf_pq_topk(
        spark, queries, corpus, books, k=3, centroid_stride=7, nprobe=1
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_ivf_pq_refined_reranks_exactly_and_helps_recall(spark):
    """The refine stage: (a) the returned cos values equal the exact
    cosine of each (query, candidate) pair; (b) refined top-k recall
    against exact ground truth is >= the raw ADC top-k recall (the
    whole point of fetching raw vectors for the shortlist)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        similarity as SIM,
    )

    df, rows = _corpus(spark)
    queries = df.filter("vec_id IN (3, 17)")
    corpus = df.filter("vec_id NOT IN (3, 17)")
    books = PQ.pq_codebooks_head(corpus, m=2, k_codes=4)
    K = 3
    refined = PQ.ivf_pq_refined(
        spark, queries, corpus, books,
        k=K, rerank=10, centroid_stride=7, nprobe=3,
    ).collect()
    adc = PQ.ivf_pq_topk(
        spark, queries, corpus, books,
        k=K, centroid_stride=7, nprobe=3,
    ).collect()
    exact = {
        (r["qid"], r["cid"])
        for r in SIM.cosine_topk(queries, corpus, k=K).collect()
    }

    byq = {}
    for r in rows:
        byq[r[0]] = np.array(r[1], dtype=float)
    for r in refined:
        want = float(
            byq[r["qid"]] @ byq[r["cid"]]
            / (np.linalg.norm(byq[r["qid"]]) * np.linalg.norm(byq[r["cid"]]))
        )
        assert abs(r["cos"] - round(want, 6)) < 1e-9

    hit_ref = len({(r["qid"], r["cid"]) for r in refined} & exact)
    hit_adc = len({(r["qid"], r["cid"]) for r in adc} & exact)
    assert hit_ref >= hit_adc
    # sanity: both return exactly k per query
    assert len(refined) == 2 * K and len(adc) == 2 * K

"""Unit tests for the round-2 batch-3 operators: substring-span duplicate
pairs and the k-means Lloyd iteration. Both also carry DuckDB oracle rows
in the catalog (dup_span_pairs, kmeans_iteration); these tests pin the
semantics against brute-force NumPy/Python recomputation on small inputs.
"""

from __future__ import annotations

import numpy as np

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    clustering as CL,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    textdedup as TD,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_span_pairs_planted(spark):
    # docs 1 and 2 share one 4-token window ("c d e f"); doc 3 is disjoint;
    # docs 4 and 5 are identical 6-token docs → 3 shared windows.
    docs = _docs(
        spark,
        [
            (1, "a b c d e f"),
            (2, "x c d e f y"),
            (3, "p q r s t u"),
            (4, "m n o p2 q2 r2"),
            (5, "m n o p2 q2 r2"),
        ],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_spans"]
        for r in TD.duplicate_span_pairs(docs, span_tokens=4).collect()
    }
    assert got == {(1, 2): 1, (4, 5): 3}


def test_dup_span_pairs_boilerplate_cap(spark):
    # a span shared by 3 docs is dropped when the cap is 2
    rows = [(i, "same four token span") for i in range(1, 4)]
    docs = _docs(spark, rows)
    assert (
        TD.duplicate_span_pairs(docs, span_tokens=4, max_span_docs=2).count()
        == 0
    )
    assert (
        TD.duplicate_span_pairs(docs, span_tokens=4, max_span_docs=3).count()
        == 3  # all C(3,2) pairs
    )


def test_kmeans_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    k = 4
    cents = CL.seed_centroids(df, k=k)
    assigned = CL.assign_clusters(df, cents)

    # brute-force reference: argmin of squared L2 against the k lowest-id
    # vectors, in double precision
    cmat = vecs[:k].astype(np.float64)
    d2 = ((vecs[:, None, :].astype(np.float64) - cmat[None]) ** 2).sum(-1)
    want_assign = d2.argmin(axis=1)  # ids 0..k-1 are the seeds
    got_assign = {
        r["vec_id"]: r["cid"] for r in assigned.select("vec_id", "cid").collect()
    }
    assert got_assign == {i: int(want_assign[i]) for i in range(60)}

    # update step: fixed-point means per (cluster, dim)
    got = {
        (r["cid"], r["dim"]): (r["n_points"], r["centroid_val"])
        for r in CL.update_centroid_dims(assigned).collect()
    }
    for c in range(k):
        members = vecs[want_assign == c].astype(np.float64)
        for dim in range(8):
            n, val = got[(c, dim)]
            assert n == len(members)
            want = np.floor(members[:, dim] * 1e6 + 0.5).sum() / 1e6 / n
            assert abs(val - round(want, 6)) < 1e-9, (c, dim)


def test_kmeans_iteration_reduces_inertia(spark, sf_dir):
    """One Lloyd step must not increase total inertia (textbook
    monotonicity) — checked on the real embeddings table."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    c0 = CL.seed_centroids(e, k=8)
    a0 = CL.assign_clusters(e, c0)
    inertia0 = a0.agg(F.sum("d2")).first()[0]

    dims = CL.update_centroid_dims(a0)
    # reassemble centroid vectors from long form
    c1 = (
        dims.groupBy("cid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "centroid_val"))
            ).alias("s")
        )
        .select(
            "cid",
            F.transform(
                "s", lambda x: x["centroid_val"].cast("float")
            ).alias("cvec"),
        )
    )
    a1 = CL.assign_clusters(e, c1)
    inertia1 = a1.agg(F.sum("d2")).first()[0]
    assert inertia1 <= inertia0 + 1e-6


def test_kmeans_fit_spherical_improves_cosine_objective(spark, sf_dir):
    """Spherical k-means monotonicity: mean cosine of each unit vector to
    its assigned (unit) centroid must not decrease from seed to fitted."""
    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        load_table,
    )

    e = load_table(spark, sf_dir, "embeddings")
    unit = e.select("vec_id", CL.unit_vec(F.col("embedding")).alias("embedding"))
    seeds = [
        (r["cid"], CL._unit_py(list(r["cvec"])))
        for r in CL.seed_centroids(e, k=8).collect()
    ]

    def mean_cos(cents):
        # for unit vectors cos = 1 - d2/2
        a = CL.assign_clusters(unit, cents)
        return a.agg(F.avg(1 - F.col("d2") / 2)).first()[0]

    fitted, iters = CL.kmeans_fit(
        e, seeds=seeds, max_iter=5, spherical=True
    )
    assert 1 <= iters <= 5
    assert mean_cos(fitted) >= mean_cos(seeds) - 1e-6


def test_ivf_trained_returns_valid_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        similarity as SIM,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    r = SIM.ivf_topk(q, emb, k=5, train_iters=2).collect()
    per_q = {}
    for row in r:
        per_q.setdefault(row["qid"], []).append(row)
    assert set(per_q) == {0, 1, 2, 3, 4}
    for qid, rows in per_q.items():
        assert len(rows) == 5
        assert all(-1.0 <= row["cos"] <= 1.0 for row in rows)


def test_semantic_dedup_drops_all_planted_twins(spark, sf_dir):
    """Every exact twin (ids+100000) shares cosine 1.0 with its original
    in the same cluster, so SemDeDup must drop it; originals survive
    unless they near-dup a lower-id original."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.catalog import (
        CATALOG,
    )

    rows = CATALOG["semantic_dedup"].builder(spark, sf_dir).collect()
    twins = [r for r in rows if r["vec_id"] >= 100000]
    assert twins and all(not r["keep"] for r in twins)
    originals_kept = [r for r in rows if r["vec_id"] < 100000 and r["keep"]]
    assert len(originals_kept) > 0
    assert any(r["vec_id"] == 0 for r in originals_kept)  # lowest id kept


def test_dup_span_cap_enforced_before_collect(spark):
    """Structural pin for the r13 viral-key fix: the max_span_docs cap
    must be enforced BEFORE the collect_list aggregation (count →
    semi-filter → collect), so no aggregation buffer ever holds more
    than the cap. The old filter-after-collect form compiled to a plan
    with NO join at all (one straight explode → aggregate chain); the
    bounded form necessarily joins the span rows to the surviving keys.
    Combined with the output tests above (identical semantics, cap
    honored) this mechanically distinguishes the bounded plan from the
    unbounded one."""
    docs = _docs(spark, [(i, "m n o p q r") for i in range(6)])
    df = TD.duplicate_span_pairs(docs, span_tokens=4, max_span_docs=5)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan, plan  # keep-keys semi-filter present
    # the viral-key cap is a filter over the COUNT aggregate (bounded
    # state), feeding the join below the collect_list aggregate
    assert "count(1) AS nd" in plan, plan
    assert "(nd" in plan and "<= 5)" in plan, plan

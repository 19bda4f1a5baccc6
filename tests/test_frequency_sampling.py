"""Heavy hitters (bounded-state two-pass) and weighted sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    frequency as FQ,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.sampling import (
    weighted_sample,
)


def _skewed(spark):
    # 'hot' 600×, 'warm' 200×, 200 singletons → n = 1000
    rows = (
        [("hot",)] * 600 + [("warm",)] * 200 + [(f"cold{i}",) for i in range(200)]
    )
    return spark.createDataFrame(rows, "term string")


def test_heavy_hitters_exact(spark):
    df = _skewed(spark)
    # k=10 → threshold n/k = 100: hot & warm qualify, no singleton does
    got = {r["term"]: r["cnt"] for r in FQ.heavy_hitters(df, "term", 10).collect()}
    assert got == {"hot": 600, "warm": 200}


def test_heavy_hitters_matches_plain_groupby(spark):
    df = _skewed(spark).repartition(8)
    k = 3
    n = df.count()
    want = {
        (r["term"], r["cnt"])
        for r in df.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > n)
        .collect()
    }
    got = {(r["term"], r["cnt"]) for r in FQ.heavy_hitters(df, "term", k).collect()}
    assert got == want


def test_candidates_superset_and_bounded(spark):
    df = _skewed(spark).repartition(4)
    cands = set(
        r["term"]
        for r in FQ.candidate_heavy_hitters(df, "term", 10).distinct().collect()
    )
    assert {"hot", "warm"} <= cands
    # pigeonhole bound: ≤ k candidates per batch; 4 partitions → ≤ 40
    assert len(cands) <= 40


def test_weighted_sample_prefers_heavy_rows(spark):
    rows = [(i, 1000 if i < 10 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = {r["id"] for r in weighted_sample(df, "id", "w", 20).collect()}
    # the ten 1000× heavier rows should essentially all be drawn
    assert len(got & set(range(10))) >= 8
    assert len(got) == 20


def test_weighted_sample_partitioning_invariant(spark):
    rows = [(i, (i % 7) + 1) for i in range(500)]
    a = spark.createDataFrame(rows, "id long, w long")
    b = spark.createDataFrame(rows, "id long, w long").repartition(13)
    sa = sorted(r["id"] for r in weighted_sample(a, "id", "w", 50).collect())
    sb = sorted(r["id"] for r in weighted_sample(b, "id", "w", 50).collect())
    assert sa == sb


def test_empty_inputs_yield_empty_outputs(spark):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        pagerank,
    )

    empty_terms = spark.createDataFrame([], "term string")
    assert FQ.heavy_hitters(empty_terms, "term", 5).count() == 0
    empty_edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty_edges).count() == 0
    empty_w = spark.createDataFrame([], "id long, w long")
    assert weighted_sample(empty_w, "id", "w", 3).count() == 0

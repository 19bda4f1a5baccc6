"""Partitioning-determinism: catalog results must be a pure function of
the DATA — identical under different shuffle partitioning, which changes
task boundaries and float summation order. This is the property the
fixed-point arithmetic discipline (money_sum, micro-nat logprobs,
integer PageRank/z-scores) exists to guarantee; a violation here is
exactly the class of bug that passes one oracle run and flakes the next.
"""

from __future__ import annotations

import pytest

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (
    catalog,
)

SF = "/root/testdata/sf0.001"

# the float-risk set: aggregating doubles, iterative numerics, sketches
SENSITIVE = [
    "pricing_summary",
    "revenue_7d_moving_avg",
    "pagerank_events",
    "unigram_logprob",
    "bigram_logprob",
    "domain_mixture_weights",
    "kmeans_iteration",
    "anomaly_events",
    "quality_logreg",
    "incremental_agg",
    "ann_recall_eval",
    "tfidf_topk_terms",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(repr(r[c]) for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_shuffle_partitioning(spark, name):
    qd = catalog.CATALOG[name]
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(qd.builder(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(qd.builder(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert a == b

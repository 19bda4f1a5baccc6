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
    # r12 verdict task 7: the hash-seeded sampling legs — their oracle
    # parity depends on the sample being a pure function of row VALUES,
    # never of task boundaries or row order within a partition
    "stratified_sample",
    "deterministic_sample",
    "weighted_sample_docs",
]

# the sampling legs additionally must not depend on HOW THE INPUT IS
# SPLIT into scan partitions (a value-hash seed is split-invariant; a
# rand()-per-partition or monotonically_increasing_id seed is not)
SAMPLING = ["stratified_sample", "deterministic_sample", "weighted_sample_docs"]


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


@pytest.mark.parametrize("name", SAMPLING)
def test_sampling_invariant_under_input_splits(spark, name):
    qd = catalog.CATALOG[name]
    base_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    base_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # one wide-open scan partitioning vs one that fragments the
        # parquet into many tiny splits, crossed with different shuffle
        # widths — the sample membership must be bit-identical
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        a = _rows(qd.builder(spark, SF))
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16k")
        spark.conf.set("spark.sql.shuffle.partitions", "23")
        b = _rows(qd.builder(spark, SF))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", base_split)
        spark.conf.set("spark.sql.shuffle.partitions", base_shuf)
    assert a == b

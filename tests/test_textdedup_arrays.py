"""Value-identity pins for the r14 array-substrate MinHash paths.

The optimization replaced the exploded shingle index + groupBy
aggregations (signatures, verification sets) with per-row array
reductions over ``shingle_arrays``. These tests pin the claimed
bit-identities on a corpus that exercises the edge semantics:

* blank text / text shorter than ``n`` tokens (empty shingle array —
  absent from the exploded index via explode, absent from the array
  substrate via the ``size > 0`` filter),
* exact duplicates (identical shingle sets ⇒ jaccard 1.0 pairs),
* near duplicates straddling the 0.5 threshold,
* duplicate n-grams inside one doc (array_distinct dedup).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    hashing as H,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    textdedup as TD,
)

pytestmark = pytest.mark.usefixtures("spark")


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumps over a sleepy dog"),  # near dup of 1
    (4, "completely different text about spark optimization rounds"),
    (5, ""),  # blank: zero shingles
    (6, "two words"),  # shorter than n=3: zero shingles
    (7, "alpha beta gamma alpha beta gamma alpha beta gamma"),  # repeats
    (8, None),  # NULL text
]


def _corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shingle_index_equals_explode_of_arrays(spark):
    df = _corpus(spark)
    idx = TD.shingle_index(df, "doc_id", "text", n=3)
    arr = TD.shingle_arrays(df, "doc_id", "text", n=3)
    exploded = arr.select("doc", F.explode("sh").alias("shingle"))
    assert _rows(idx) == _rows(exploded)
    # blank/short/NULL docs appear in neither representation
    docs = {r["doc"] for r in arr.select("doc").distinct().collect()}
    assert docs == {1, 2, 3, 4, 7}


def test_md5_signatures_match_exploded_aggregation(spark):
    df = _corpus(spark)
    k = 8
    arr_sig = TD.minhash_signatures(df, "doc_id", "text", n=3, k=k)
    legacy = (
        TD.shingle_index(df, "doc_id", "text", n=3)
        .groupBy("doc")
        .agg(*H.minhash_aggs("shingle", k))
    )
    assert _rows(arr_sig) == _rows(legacy)


def test_xxhash_signatures_match_exploded_aggregation(spark):
    df = _corpus(spark)
    k = 8
    idx = TD.shingle_index(df, "doc_id", "text", n=3)
    legacy = idx.groupBy("doc").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
            for i in range(k)
        ]
    )
    arr = TD.shingle_arrays(df, "doc_id", "text", n=3)

    def _mh(i):
        return F.array_min(
            F.transform(F.col("sh"), lambda s: F.xxhash64(F.lit(i), s))
        )

    fast_sig = arr.select("doc", *[_mh(i).alias(f"mh{i}") for i in range(k)])
    assert _rows(fast_sig) == _rows(legacy)


@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("threshold", [0.5, 1.0])
def test_verified_pairs_match_legacy_index_path(spark, fast, threshold):
    df = _corpus(spark)
    via_arrays = TD.minhash_dedup_verified(
        df, "doc_id", "text", n=3, k=8, threshold=threshold, fast=fast
    )
    legacy_idx = TD.shingle_index(df, "doc_id", "text", n=3)
    via_index = TD.minhash_dedup_verified(
        df, "doc_id", "text", n=3, k=8, threshold=threshold, fast=fast,
        index=legacy_idx,
    )
    assert _rows(via_arrays) == _rows(via_index)
    # the exact dup must always be found
    pair_ids = {(r["doc1"], r["doc2"]) for r in via_arrays.collect()}
    assert (1, 2) in pair_ids


def test_verified_dense_regime_matches(spark):
    # force the dense branch (no candidate-doc semi filter) on both paths
    df = _corpus(spark)
    via_arrays = TD.minhash_dedup_verified(
        df, "doc_id", "text", n=3, k=8, threshold=0.5,
        verify_filter_threshold=0,
    )
    via_index = TD.minhash_dedup_verified(
        df, "doc_id", "text", n=3, k=8, threshold=0.5,
        index=TD.shingle_index(df, "doc_id", "text", n=3),
        verify_filter_threshold=0,
    )
    assert _rows(via_arrays) == _rows(via_index)


def test_contamination_arrays_matches_index_and_direct(spark):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        contamination as CON,
    )

    train = _corpus(spark)
    ev = spark.createDataFrame(
        [(100, "the quick brown fox went home"), (101, "spark optimization")],
        "doc_id long, text string",
    )
    direct = CON.contamination_ratios(train, ev, n=3)
    via_index = CON.contamination_ratios(
        train, ev, n=3, index=TD.shingle_index(train, "doc_id", "text", n=3)
    )
    via_arrays = CON.contamination_ratios(
        train, ev, n=3, arrays=TD.shingle_arrays(train, "doc_id", "text", n=3)
    )
    # index/arrays cover only shingle-bearing docs; the direct path also
    # emits (0, 0, 0.0) rows for blank/short docs it sees in `train` —
    # compare on the docs the substrate covers, plus the documented
    # zero-row contract for the rest
    d_rows = {r["doc_id"]: tuple(r) for r in direct.collect()}
    i_rows = {r["doc_id"]: tuple(r) for r in via_index.collect()}
    a_rows = {r["doc_id"]: tuple(r) for r in via_arrays.collect()}
    assert i_rows == a_rows
    for doc, row in a_rows.items():
        if row[1] > 0:
            assert d_rows[doc] == row

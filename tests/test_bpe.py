"""BPE learning and encoding: hand-verifiable merges on a controlled
corpus; encode ≡ sequential expression-fold application."""

from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    bpe as B,
)


def test_learn_bpe_hand_corpus(spark):
    # "a b" occurs 4x, "b c" 2x; after merging (a,b), pair ("a b", "c")
    # occurs 2x -> second merge
    rows = [
        (1, "a b c a b"),
        (2, "a b c a b"),
        (3, "x y"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    merges = B.learn_bpe(spark, d, n_merges=3, min_count=2)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("a b", "c")


def test_learn_stops_below_min_count(spark):
    d = spark.createDataFrame(
        [(1, "p q"), (2, "r s")], "doc_id int, text string"
    )
    assert B.learn_bpe(spark, d, n_merges=5, min_count=2) == []


def test_apply_merge_leftmost_greedy(spark):
    d = spark.createDataFrame([(1, ["a", "a", "a"])], "id int, toks array<string>")
    got = d.select(B.apply_merge(F.col("toks"), "a", "a").alias("t")).first()["t"]
    assert got == ["a a", "a"]  # leftmost pair merges; no overlap reuse


def test_encode_equals_sequential_fold(spark):
    rows = [(i, t) for i, t in enumerate(
        ["a b c a b", "c a b a", "b c c a b c", "a", "", "x a b y"]
    )]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    merges = [("a", "b"), ("a b", "c"), ("c", "a b c")]
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in B.bpe_encode(d, merges).collect()
    }
    folded = d.select(
        "doc_id",
        F.split(F.trim(F.col("text")), r"\s+").alias("toks"),
    )
    for a, b in merges:
        folded = folded.select(
            "doc_id", B.apply_merge(F.col("toks"), a, b).alias("toks")
        )
    ref = {r["doc_id"]: r["toks"] for r in folded.collect()}
    # empty text: split yields [""] but encode yields [] — normalize
    ref = {k: [t for t in v if t] for k, v in ref.items()}
    assert {k: [t for t in v if t] for k, v in enc.items()} == ref


def test_encode_roundtrip_preserves_text(spark):
    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, "c a b")], "doc_id int, text string"
    )
    merges = B.learn_bpe(spark, d, n_merges=2, min_count=1)
    out = B.bpe_encode(d, merges).select(
        "text", F.array_join("bpe_tokens", " ").alias("joined")
    )
    for r in out.collect():
        assert r["joined"] == r["text"]

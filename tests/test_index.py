"""Incremental MinHash index: batch-vs-corpus dedup without corpus
rescans, with atomic index versioning."""

from __future__ import annotations

from _lakehouse_architecture_for_e_commerce_transactions_spark.etl import index as IX
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew distinct potions under a bright autumn moon tonight"
)
OTHER = (
    "colorless green ideas sleep furiously as the orchestra rehearses "
    "twelve entirely different melodies beside the frozen harbor wall"
)
THIRD = (
    "a completely unrelated treatise on the thermodynamics of small "
    "island climates and their seasonal monsoon precipitation cycles"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_against_index_and_within_batch(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _docs(spark, [(1, BASE), (2, OTHER)])
    assert IX.build_minhash_index(spark, corpus, idx) == 0

    batch = _docs(
        spark,
        [
            (10, BASE + " extra"),   # near-dup of indexed doc 1
            (11, THIRD),             # novel
            (12, THIRD + " suffix"), # near-dup of 11 (same batch)
        ],
    )
    cand = {
        (r["new_doc"], r["dup_of"])
        for r in IX.incremental_near_dup(spark, batch, idx).collect()
    }
    assert (10, 1) in cand
    assert (12, 11) in cand
    assert all(d != 11 or n == 12 for n, d in cand)  # 11 itself is novel

    # publish the batch into the index; the next batch dedups against it
    assert IX.update_minhash_index(spark, batch, idx) == 1
    batch2 = _docs(spark, [(20, THIRD + " another suffix")])
    cand2 = {
        (r["new_doc"], r["dup_of"])
        for r in IX.incremental_near_dup(spark, batch2, idx).collect()
    }
    assert (20, 11) in cand2

    # index versions are atomic snapshots: v0 has only the first corpus
    v0_docs = {r["doc"] for r in S.read(spark, idx, 0).collect()}
    assert v0_docs == {1, 2}


def test_index_params_are_recorded_and_reused(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _docs(spark, [(1, BASE)])
    IX.build_minhash_index(spark, corpus, idx, k=4, rows_per_band=2)
    # a batch probe uses the stored k: band rows per doc = k/rows_per_band
    rows = S.read(spark, idx).collect()
    assert len(rows) == 2  # 4/2 bands for the single doc

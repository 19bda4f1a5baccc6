"""Incremental MinHash-LSH index: dedup new batches against an existing
corpus WITHOUT rescanning it.

The production pattern for continuous ingestion (crawl snapshots, stream
batches): the corpus's LSH band rows — ``(doc, band_id, bkey)``,
k/rows_per_band rows per document — live in a snapshot table; each new
batch hashes only itself, probes the index with one equi-join, and
appends its own band rows as the next index version. Cost per batch is
O(batch) hashing + a join against index rows matching the batch's band
keys — never O(corpus) text processing. The snapshot table gives the
index atomic versions: a reader never sees a half-appended batch, and
an aborted ingest leaves the index at its previous version.

Index hygiene at scale: the band-row table grows by n_bands rows per
document; ``sources/snapshots.vacuum`` bounds manifest history and
``compact`` retires the small appends each batch creates.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    textdedup as TD,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)

_META = "_index_meta.json"


def _meta_path(index_path: str) -> str:
    return os.path.join(index_path, _META)


def build_minhash_index(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    rows_per_band: int = 2,
) -> int:
    """Create the index table from the initial corpus; records the hash
    parameters so later batches can't silently probe with mismatched
    signatures. Returns the snapshot version (0)."""
    rows = TD.melted_band_keys(docs, id_col, text_col, n, k, rows_per_band)
    # meta first, atomically (tmp + rename): params are inputs, not
    # derived state, so a crash before the data commit leaves a harmless
    # meta file; the reverse order would leave a committed index that
    # _params() rejects
    os.makedirs(index_path, exist_ok=True)
    tmp = _meta_path(index_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n": n, "k": k, "rows_per_band": rows_per_band}, f)
    os.replace(tmp, _meta_path(index_path))
    return S.commit(spark, rows, index_path, mode="overwrite")


def _params(index_path: str) -> dict:
    with open(_meta_path(index_path)) as f:
        return json.load(f)


def index_exists(index_path: str) -> bool:
    """True only when both the params file and a committed snapshot
    version exist (a crash between the two leaves a rebuildable stub,
    not a probe-able index)."""
    try:
        _params(index_path)
        S.load_snapshot(index_path)
        return True
    except (FileNotFoundError, json.JSONDecodeError):
        return False


def verify_near_dup(
    cand: DataFrame,
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of ``incremental_near_dup`` candidates:
    joins each (new_doc, dup_of) pair back to its texts (batch side for
    new docs, ``corpus_docs`` for indexed ones) and keeps pairs with true
    shingle Jaccard ≥ threshold. Candidate count is LSH-bounded, so the
    verification join touches only candidate texts, never the corpus."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
        text as T,
    )

    texts = corpus_docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).unionByName(
        new_docs.select(
            F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
        )
    )
    sh = texts.select(
        "_id", T.shingles(F.col("_text"), n).alias("_sh")
    )
    a = sh.select(F.col("_id").alias("new_doc"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("_id").alias("dup_of"), F.col("_sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "new_doc")
        .join(b, "dup_of")
        .withColumn(
            "jaccard",
            F.round(
                F.when(union > 0, inter / union.cast("double")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ),
        )
        # exact rational threshold (inter >= t·union), not the rounded
        # display value — same rule as minhash_dedup_verified, so
        # threshold=1.0 admits only identical shingle sets
        .filter((union > 0) & (inter >= F.lit(threshold) * union))
        .select("new_doc", "dup_of", "jaccard")
    )


def incremental_near_dup(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs for a new batch: ``(new_doc, dup_of)``
    where ``dup_of`` is an indexed doc (or an earlier doc of the same
    batch) sharing at least one LSH band. The batch side is hashed here;
    the corpus side is ONLY the stored band rows — new-batch band keys
    are typically few, so Catalyst broadcasts the batch side and the
    index scan streams past it. Verify candidates with exact Jaccard
    (``minhash_dedup_verified`` pattern) before dropping."""
    p = _params(index_path)
    batch = TD.melted_band_keys(
        new_docs, id_col, text_col, p["n"], p["k"], p["rows_per_band"]
    )
    index_rows = S.read(spark, index_path)
    on = ["band_id", "bkey"]
    # vs-index: an indexed doc always wins (the new arrival is the dup),
    # whatever the ids; within-batch: the lower batch id wins
    vs_index = (
        batch.alias("b")
        .join(index_rows.alias("i"), on)
        .filter(F.col("b.doc") != F.col("i.doc"))
        .select(
            F.col("b.doc").alias("new_doc"), F.col("i.doc").alias("dup_of")
        )
    )
    in_batch = (
        batch.alias("b")
        .join(batch.alias("i"), on)
        .filter(F.col("b.doc") > F.col("i.doc"))
        .select(
            F.col("b.doc").alias("new_doc"), F.col("i.doc").alias("dup_of")
        )
    )
    return vs_index.unionByName(in_batch).distinct()


def update_minhash_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Append the batch's band rows as the next index version."""
    p = _params(index_path)
    rows = TD.melted_band_keys(
        new_docs, id_col, text_col, p["n"], p["k"], p["rows_per_band"]
    )
    return S.commit(spark, rows, index_path, mode="append")

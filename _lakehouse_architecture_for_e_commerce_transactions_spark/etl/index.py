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
    version = S.commit(spark, rows, index_path, mode="overwrite")
    with open(_meta_path(index_path), "w") as f:
        json.dump({"n": n, "k": k, "rows_per_band": rows_per_band}, f)
    return version


def _params(index_path: str) -> dict:
    with open(_meta_path(index_path)) as f:
        return json.load(f)


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

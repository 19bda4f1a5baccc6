"""Streaming corpus ingestion with ONLINE near-dup filtering.

The continuous-crawl shape: document batches arrive as files; each
micro-batch is deduplicated against everything ingested so far via the
incremental MinHash index (`etl/index.py`) — the corpus itself is never
rescanned — and survivors are appended atomically to a snapshot table.
Index and corpus advance in lockstep, one version per non-empty batch.
A crashed batch leaves each table at a published version; on checkpoint
replay, near-dups are dropped via the index and already-committed docs
via an id anti-join against the column-pruned corpus — ingestion is
exactly-once by doc_id even when the crash fell between the corpus and
index commits.

Per-batch cost: O(batch) hashing + one equi-join against matching index
band rows + two snapshot commits. State lives in the index *table*, not
in Spark streaming state — unbounded corpus growth never inflates the
checkpoint, and the index is queryable/compactable offline like any
other table.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from _lakehouse_architecture_for_e_commerce_transactions_spark.etl import (
    index as IX,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("source", StringType(), True),
    ]
)


def stream_corpus_ingest(
    spark: SparkSession,
    raw_dir: str,
    corpus_path: str,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    on_batch: Callable[[int, int, int], None] | None = None,
    jaccard_threshold: float = 0.5,
    quality_min: float | None = None,
    min_chars: int | None = None,
    eval_docs: DataFrame | None = None,
    contamination_max: float = 0.2,
    contamination_ngram: int = 3,
) -> StreamingQuery:
    """Stream document CSVs from ``raw_dir``; drop near-dups of anything
    already ingested (or earlier in the same batch); append survivors to
    the corpus snapshot table and their band rows to the index. LSH
    candidates are verified with exact Jaccard ≥ ``jaccard_threshold``
    before anything is dropped.

    With the optional gates this is CONTINUOUS CURATION — the batch
    curation job's stages applied per micro-batch, cheapest first:
    ``quality_min``/``min_chars`` gate each arriving batch BEFORE any
    hashing (quality heuristics are pure column expressions — rejects
    never pay MinHash cost); ``eval_docs`` decontaminates the deduped
    survivors (n-gram overlap > ``contamination_max`` drops the doc)
    before they are committed. The eval side's distinct n-grams are
    bounded and broadcast per batch. All gates are deterministic
    filters, so the exactly-once replay reasoning is unchanged.

    ``on_batch(batch_id, n_kept, n_dropped)`` is the observability hook.
    """
    reader = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(raw_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.filter(
            F.col("doc_id").isNotNull() & F.col("text").isNotNull()
        )
        if quality_min is not None:
            from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
                text as T,
            )

            batch_df = batch_df.filter(
                T.quality_score(F.col("text")) >= quality_min
            )
        if min_chars is not None:
            batch_df = batch_df.filter(
                F.length(F.col("text")) >= min_chars
            )
        if not batch_df.take(1):
            return
        batch_df = batch_df.cache()
        have_index = IX.index_exists(index_path)
        try:
            corpus_docs = S.read(spark, corpus_path).select(
                "doc_id", "text"
            )
        except FileNotFoundError:
            corpus_docs = None  # first batch, or crash before 1st commit
        if have_index:
            cand = IX.incremental_near_dup(spark, batch_df, index_path)
            # LSH candidates are probabilistic — verify with exact
            # Jaccard before dropping (band collisions would otherwise
            # delete unique documents)
            ref = (
                corpus_docs
                if corpus_docs is not None
                else batch_df.select("doc_id", "text").limit(0)
            )
            dups = (
                IX.verify_near_dup(
                    cand, batch_df, ref, threshold=jaccard_threshold
                )
                .select(F.col("new_doc").alias("doc_id"))
                .distinct()
            )
            kept = batch_df.join(dups, "doc_id", "left_anti")
            # replay guard: docs already committed to the corpus drop by
            # id (exactly-once by doc_id across checkpoint replays)
            if corpus_docs is not None:
                kept = kept.join(
                    corpus_docs.select("doc_id"), "doc_id", "left_anti"
                )
        else:
            kept = batch_df
        if eval_docs is not None:
            from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
                contamination as CON,
            )

            dirty = (
                CON.contamination_ratios(
                    kept, eval_docs, n=contamination_ngram
                )
                .filter(F.col("contamination") > contamination_max)
                .select("doc_id")
            )
            kept = kept.join(dirty, "doc_id", "left_anti")
        kept = kept.cache()
        n_kept = kept.count()
        n_total = batch_df.count()
        if n_kept:
            # index FIRST: if the crash falls between the two commits,
            # replay re-offers the docs (not yet in the corpus), their
            # duplicate band rows are benign (candidates are distinct),
            # and both tables reconverge. Corpus-first would strand
            # committed docs without band rows — permanently invisible
            # to future dedup probes.
            if have_index:
                IX.update_minhash_index(spark, kept, index_path)
            else:
                IX.build_minhash_index(spark, kept, index_path)
            S.commit(
                spark,
                kept,
                corpus_path,
                mode="overwrite" if corpus_docs is None else "append",
            )
        if on_batch is not None:
            on_batch(batch_id, n_kept, n_total - n_kept)
        kept.unpersist()
        batch_df.unpersist()

    writer = reader.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(process_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

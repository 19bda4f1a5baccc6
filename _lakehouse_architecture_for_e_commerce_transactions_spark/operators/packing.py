"""Sequence packing: concat-and-split documents into fixed training windows.

The standard GPT-style packing scheme: within a shard, documents are
concatenated in a deterministic order into one token stream, which is cut
into consecutive ``ctx_tokens``-token training sequences ("packs"); a
document can straddle a pack boundary. This operator computes each
document's placement — its token offset and the pack range it lands in —
which is all a downstream tokenizer/writer needs to materialize packs.

Scale shape: one window (sum over (shard, doc order)) = one shuffle keyed
by shard. Shards are the parallelism unit — a production run shards to
~10k units so no single window partition exceeds an executor; the cumsum
itself is O(rows) per shard. No explode, no state, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    text as T,
)


def pack_sequences(
    docs: DataFrame,
    ctx_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Per-document pack placement: ``(shard, id, n_tokens, start_tok,
    first_pack, last_pack, n_packs)``.

    ``start_tok`` is the document's offset in its shard's concatenated
    token stream (ordered by ``id_col``); packs are 0-based within shard.
    Empty documents (0 tokens after trim) occupy no packs and are dropped.
    """
    # split("") yields [''] (size 1), so blank documents need the explicit
    # zero before the n_tokens > 0 drop
    n_tok = (
        F.when(F.trim(F.col(text_col)) == "", F.lit(0))
        .otherwise(T.token_count(F.col(text_col)))
        .cast("long")
    )
    w = Window.partitionBy(shard_col).orderBy(id_col)
    d = (
        docs.select(F.col(shard_col), F.col(id_col), n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("_end_tok", F.sum("n_tokens").over(w))
    )
    start = F.col("_end_tok") - F.col("n_tokens")
    first = F.floor(start / ctx_tokens)
    last = F.floor((F.col("_end_tok") - 1) / ctx_tokens)
    return d.select(
        F.col(shard_col),
        F.col(id_col),
        "n_tokens",
        start.alias("start_tok"),
        first.cast("long").alias("first_pack"),
        last.cast("long").alias("last_pack"),
        (last - first + 1).cast("long").alias("n_packs"),
    )

"""Document chunking: sliding token-window splits for training pipelines.

The reference has no text operators at all (SURVEY.md §2.8 — its scalar
surface is cast/isNull only); this module is part of the LLM-data-pipeline
extension set (BASELINE.json north star), alongside
``functions/text.py`` and ``operators/textdedup.py``.

Scale notes: chunking is a pure per-row transform — tokenize, enumerate
window starts, explode. No shuffle, no state, no driver round-trip; the
fan-out factor is ~n_tokens/step per document, so output partitions grow by
that constant factor and AQE never needs to intervene. At 100 TB the only
knob that matters is keeping the explode *after* any filter that drops
whole documents (cheaper rows into the fan-out).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def remove_boilerplate(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_tokens: int = 16,
    min_docs: int = 3,
):
    """C4/CCNet-style boilerplate removal: split each document into
    NON-overlapping ``block_tokens``-token blocks, fingerprint them, and
    drop every block whose exact content appears in ≥ ``min_docs``
    distinct documents (navigation chrome, license banners, templated
    headers); surviving blocks reassemble in order into cleaned text.

    Returns (id, clean_text, n_blocks, n_dropped). Plan: one explode to
    blocks, one fingerprint groupBy (partial-aggregated — traffic is
    distinct blocks, not the token stream), one join back, one ordered
    re-assembly groupBy. No UDFs; the md5 fingerprints make the whole
    transform a pure function of the corpus (oracle-checkable).
    """
    from pyspark.sql import functions as F

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    blocks = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.size(toks) / block_tokens).cast("int") - 1,
                        F.lit(0),
                    ),
                ),
                lambda i: F.array_join(
                    F.slice(toks, i * block_tokens + 1, block_tokens), " "
                ),
            )
        ).alias("bidx", "btext"),
    ).withColumn("fp", F.md5("btext"))
    counts = blocks.groupBy("fp").agg(
        F.count_distinct("_id").alias("ndocs")
    )
    flagged = blocks.join(counts, "fp").withColumn(
        "drop", F.col("ndocs") >= min_docs
    )
    return (
        flagged.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("drop"),
                                F.struct("bidx", "btext"),
                            )
                        )
                    ),
                    lambda s: s["btext"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("drop").cast("long")).alias("n_dropped"),
        )
        .select(
            F.col("_id").alias(id_col), "clean_text", "n_blocks", "n_dropped"
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Split each document into overlapping windows of whitespace tokens.

    Window ``i`` covers tokens ``[i*step, i*step + chunk_tokens)`` with
    ``step = chunk_tokens - overlap``; the final windows may be shorter.
    Output is one row per (document, window): ``(id_col, chunk_id,
    n_chunk_tokens, chunk_text, *keep_cols)``. Deterministic — a pure
    function of each input row, independent of partitioning.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks: Column = F.split(F.trim(F.col(text_col)), r"\s+")
    d = df.select(
        F.col(id_col), *(F.col(c) for c in keep_cols), toks.alias("_toks")
    ).withColumn(
        "_start",
        F.explode(F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(step))),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(chunk_tokens))
    return d.select(
        F.col(id_col),
        (F.col("_start") / F.lit(step)).cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
        *(F.col(c) for c in keep_cols),
    )

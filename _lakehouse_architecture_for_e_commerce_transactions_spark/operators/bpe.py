"""BPE tokenizer training and encoding at corpus scale.

``bpe_pair_merges`` (plans/catalog.py) computes the first iteration's
merge-candidate ranking; this module runs the full loop: learn a merge
table over the corpus, then encode documents with it.

Spark-first shape (mirrors ``clustering.kmeans_fit``):

* **Learning** is a driver loop over bounded state (the merge list —
  n_merges pairs, kilobytes). Each iteration counts adjacent pairs with
  one explode + map-side-combined groupBy, takes the top pair on the
  driver (a 1-row collect), and applies the merge to the cached token
  arrays as a pure expression fold — a narrow transformation, no
  shuffle. The corpus-sized token state stays distributed end to end;
  re-caching every iteration keeps lineage O(1) instead of O(n_merges).
* **Encoding** is an Arrow-batched pandas UDF carrying the learned
  ranks dict (broadcast-by-closure, bounded). Standard BPE encode —
  apply merges in learned order — matches sequential expression-fold
  application exactly (pytest-pinned), but does n_merges passes in
  tight Python-over-Arrow instead of n_merges nested Column folds that
  would blow past codegen limits.

This is *token-level* BPE (merges over whitespace tokens — phrase
merges), matching the corpus shape; character-level BPE is the same
algorithm seeded with ``split(text, '')``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    text as T,
)

SEP = " "  # merged tokens join with the pair separator ("a" + "b" -> "a b")


def apply_merge(toks: Column, a: str, b: str) -> Column:
    """Apply one merge (a, b) leftmost-greedy to a token array — a pure
    expression fold (aggregate), no shuffle, no UDF."""
    merged = F.lit(a + SEP + b)
    return F.aggregate(
        toks,
        F.lit(None).cast("array<string>"),
        lambda acc, x: F.when(acc.isNull(), F.array(x)).otherwise(
            F.when(
                (F.element_at(acc, -1) == a) & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
                ),
            ).otherwise(F.concat(acc, F.array(x)))
        ),
        lambda acc: F.coalesce(acc, F.array().cast("array<string>")),
    )


def adjacent_pair_counts(tok_df: DataFrame, col: str = "toks") -> DataFrame:
    """(a, b, n) counts of adjacent token pairs — one explode + one
    map-side-combined aggregation. Rows with fewer than two tokens are
    filtered BEFORE sequence(): sequence(1, 0) yields a DESCENDING
    [1, 0], whose out-of-range index throws under ANSI mode (the default
    on a bare Spark 4 session)."""
    pairs = tok_df.filter(F.size(F.col(col)) >= 2).select(
        F.explode(
            F.expr(
                f"transform(sequence(1, size({col}) - 1),"
                f" i -> struct({col}[i - 1] AS a, {col}[i] AS b))"
            )
        ).alias("p")
    )
    return pairs.groupBy("p.a", "p.b").agg(F.count(F.lit(1)).alias("n"))


def learn_bpe(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the merge
    list in learned (rank) order. Deterministic: ties break on (count
    desc, a asc, b asc). Stops early when no pair reaches ``min_count``.
    """
    toks = docs.select(T.tokens(F.col(text_col)).alias("toks")).cache()
    toks.count()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                adjacent_pair_counts(toks)
                .orderBy(F.desc("n"), "a", "b")
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_count:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            nxt = toks.select(
                apply_merge(F.col("toks"), a, b).alias("toks")
            ).cache()
            nxt.count()  # materialize before dropping the parent cache
            toks.unpersist()
            toks = nxt
    finally:
        toks.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode ``text_col`` with a learned merge list: adds ``out_col``
    (array<string>). Arrow-batched ``mapInPandas``; the ranks dict rides
    in the closure (bounded by n_merges, not data) and payloads never
    shuffle — encoding is a narrow transformation."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    ranks = {pair: i for i, pair in enumerate(merges)}

    def enc(text) -> list[str]:
        toks = text.strip().split() if text and text.strip() else []
        while len(toks) > 1:
            best_rank, best_i = None, -1
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            toks[best_i : best_i + 2] = [
                toks[best_i] + SEP + toks[best_i + 1]
            ]
        return toks

    out_schema = StructType(
        docs.schema.fields + [StructField(out_col, ArrayType(StringType()))]
    )

    def run(batches):
        for pdf in batches:
            pdf[out_col] = pdf[text_col].map(enc)
            yield pdf

    return docs.mapInPandas(run, out_schema)

"""Full-text relevance ranking and statistical quality scoring over the
documents table — the retrieval/scoring layer a training-data pipeline
puts in front of its corpus (BM25 keyword search; unigram language-model
log-probability, the classic perplexity-style quality filter).

Everything is pure Column expressions over one tokenize pass — no UDFs,
no collect. Scale shape:

* BM25: the exploded token stream is filtered to the query's terms
  BEFORE any shuffle, so the aggregation moves |query|·|matching docs|
  rows, never the corpus's full token stream. Corpus-level scalars
  (N, avgdl) ride in via a 1-row broadcast cross join.
* Unigram LM: one groupBy(term) builds the model (vocab-sized, ~ZipF
  — far smaller than the token stream); scoring joins tokens to the
  model on term. Per-doc accumulation is a BIGINT sum of micro-nat
  log-probs — fixed-point, so the result is identical under any
  partitioning / summation order (the float-sum nondeterminism class
  is designed out, see TUNING.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    text as T,
)


def _terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) token stream, lowercased — one narrow explode."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("term"),
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Okapi BM25 over whitespace tokens: returns the ``top_n`` docs by
    summed per-term score, with the Lucene-style always-positive idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Output: (id_col, score, n_matched) ordered by (score desc, id) —
    the id tie-break keeps top-n stable across partitionings. Per-doc
    score sums |query_terms| doubles (bounded, not data-sized), rounded
    to 6 — safely inside double accumulation error for any real query.
    """
    toks = _terms(docs, id_col, text_col)
    # filter to query terms BEFORE the shuffle: the agg input is
    # |terms|·|docs containing them|, not the corpus token stream
    qt = [t.lower() for t in query_terms]
    matched = toks.filter(F.col("term").isin(qt))
    tf = matched.groupBy("_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = docs.select(
        F.col(id_col).alias("_id"),
        T.token_count(F.col(text_col)).alias("dl"),
    )
    # N/avgdl derive from the dl projection — the corpus is scanned
    # twice total (token stream + doc lengths), not three times
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(dfreq, "term")
        .join(dl, "_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("term_score", idf * norm)
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.round(F.sum("term_score"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
        .orderBy(F.col("score").desc(), F.col("_id"))
        .limit(top_n)
        .select(F.col("_id").alias(id_col), "score", "n_matched")
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean token log-probability under an add-one-smoothed
    unigram model trained on the corpus itself — the cheap statistical
    stand-in for perplexity filtering (docs of improbable tokens score
    low; boilerplate scores high).

    Fixed-point accumulation: each token's ``ln((c+1)/(T+V))`` is
    quantized to BIGINT micro-nats before the per-doc sum, so results
    are bit-identical under any summation order. Output: (id, n_tokens,
    mean_logprob rounded to 6).
    """
    toks = _terms(docs, id_col, text_col)
    model = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = model.agg(
        F.sum("c").alias("t_tokens"), F.count(F.lit(1)).alias("v_size")
    )
    lp_micro = F.round(
        F.log(
            (F.col("c") + 1)
            / (F.col("t_tokens") + F.col("v_size")).cast("double")
        )
        * 1e6,
        0,
    ).cast("long")
    model = model.crossJoin(F.broadcast(totals)).select(
        "term", lp_micro.alias("lp_micro")
    )
    return (
        toks.join(model, "term")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp_micro").alias("sum_micro"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.round(
                F.col("sum_micro") / F.col("n_tokens") / 1e6, 6
            ).alias("mean_logprob"),
        )
    )


def build_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted index: (term, doc, pos) rows, pos 0-based.

    The storable/joinable search-index form (commit it as a snapshot
    table partitioned or z-ordered by term): a phrase query then reads
    ONLY its terms' postings — term-predicate pushdown into the index
    scan — instead of tokenizing the corpus per query."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(T.tokens(F.lower(F.col(text_col)))).alias(
            "pos", "term"
        ),
    ).select("term", "doc", "pos")


def phrase_search(
    postings: DataFrame, phrase: list[str]
) -> DataFrame:
    """Exact phrase match over a positional index: (doc, n_matches) for
    every doc containing the phrase's terms consecutively.

    Plan: filter the postings to the phrase's terms (pushed into the
    index scan), then chain (m-1) equi-joins on (doc, pos + offset) —
    each join input is a single term's postings list, so the work is
    proportional to the PHRASE terms' document frequency, never corpus
    size. Duplicate terms inside the phrase are handled naturally (the
    same postings rows join at different offsets)."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    anchor = (
        postings.filter(F.col("term") == phrase[0])
        .select("doc", F.col("pos").alias("p0"))
    )
    matched = anchor
    for i, term in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == term).select(
            "doc", (F.col("pos") - i).alias("p0")
        )
        matched = matched.join(nxt, ["doc", "p0"], "left_semi")
    return matched.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_matches")
    )

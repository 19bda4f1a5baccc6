"""Property-based checks for the round-3 text operators: each against an
independent pure-Python reference on randomized documents. Few examples
(a Spark job per example), wide randomness per example."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

word = st.text(
    alphabet="ab1#.!ABZ", min_size=1, max_size=4
)
doc = st.lists(word, min_size=0, max_size=30).map(" ".join)
docs_strategy = st.lists(doc, min_size=1, max_size=12)


def _norm_ref(text: str) -> str:
    s = re.sub(r"[^a-z0-9\s]", "", text.lower())
    s = re.sub(r"\s+", " ", s)
    return s.strip()


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_normalize_dedup_matches_python_reference(spark, texts):
    """Keeper/copies per normalized fingerprint must equal a pure-Python
    normalize-and-group over the same corpus ∪ dirtied twins."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    dirty = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("  !!")).alias("text"),
    )
    corpus = d.unionByName(dirty)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    got = {
        r["norm"]: (r["keeper"], r["copies"])
        for r in corpus.withColumn("norm", norm)
        .groupBy("norm")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("copies"))
        .collect()
    }
    ref: dict = defaultdict(list)
    for i, t in rows:
        ref[_norm_ref(t)].append(i)
        ref[_norm_ref(t.upper() + "  !!")].append(i + 100000)
    want = {k: (min(v), len(v)) for k, v in ref.items()}
    assert got == want
    # every doc collapses with its dirty twin
    assert all(c >= 2 for _, c in got.values())


def _gopher_ref(text: str) -> dict:
    toks = text.strip().lower().split()
    n_words = len(toks) if toks else 1  # split of "" -> [''] in Spark
    if not text.strip():
        toks = [""]
        n_words = 1
    n_alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
    n_nospace = len(re.sub(r"\s", "", text))
    stop = {"and", "be", "have", "of", "that", "the", "to", "with"}
    n_stop = len(stop & set(toks))
    n_sym = text.count("#") + len(re.findall(r"\.\.\.", text))
    return {
        "len_ok": 50 <= n_words <= 100000,
        "word_len_ok": 3 * n_words <= n_nospace <= 10 * n_words,
        "alpha_ok": 10 * n_alpha >= 8 * n_words,
        "stop_ok": n_stop >= 2,
        "symbol_ok": 10 * n_sym <= n_words,
    }


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_gopher_flags_match_python_reference(spark, texts):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.catalog import (
        _GOPHER_STOPWORDS,
    )
    from pyspark.sql import functions as F
    from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
        text as T,
    )

    assert set(_GOPHER_STOPWORDS) == {
        "and", "be", "have", "of", "that", "the", "to", "with",
    }
    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    toks = T.tokens(F.lower(F.col("text")))
    n_words = F.size(toks)
    n_nospace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    n_alpha = F.expr(
        "size(filter(split(trim(lower(text)), '\\\\s+'),"
        " t -> t rlike '[a-z]'))"
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )
    n_hash = F.size(F.split(F.col("text"), "#", -1)) - 1
    n_ell = F.size(F.split(F.col("text"), r"\.\.\.", -1)) - 1
    got = {
        r["doc_id"]: r.asDict()
        for r in d.select(
            "doc_id",
            ((n_words >= 50) & (n_words <= 100000)).alias("len_ok"),
            (
                (n_nospace >= 3 * n_words) & (n_nospace <= 10 * n_words)
            ).alias("word_len_ok"),
            (10 * n_alpha >= 8 * n_words).alias("alpha_ok"),
            (n_stop >= 2).alias("stop_ok"),
            (10 * (n_hash + n_ell) <= n_words).alias("symbol_ok"),
        ).collect()
    }
    for i, t in rows:
        want = _gopher_ref(t)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, t)

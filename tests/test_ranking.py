"""BM25 and unigram-LM scoring: exact small-corpus verification against
hand-computed values, plus plan-shape guards (filter-before-shuffle)."""

from __future__ import annotations

import math

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    ranking as R,
)


def _docs(spark):
    rows = [
        (1, "hash join hash join hash"),
        (2, "scan filter scan filter scan filter"),
        (3, "hash scan"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_bm25_matches_hand_computation(spark):
    got = {
        r["doc_id"]: (r["score"], r["n_matched"])
        for r in R.bm25_search(
            _docs(spark), ["hash"], top_n=10
        ).collect()
    }
    n, avgdl = 3, (5 + 6 + 2) / 3
    df = 2
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def s(tf, dl):
        return round(
            idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6
        )

    assert got == {1: (s(3, 5), 1), 3: (s(1, 2), 1)}
    assert 2 not in got  # no query term -> no row


def test_bm25_rarer_term_outranks_common(spark):
    rows = [(i, "common filler text here") for i in range(20)] + [
        (100, "rare common"),
        (101, "common word"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    top = R.bm25_search(d, ["rare", "common"], top_n=1).collect()[0]
    assert top["doc_id"] == 100  # matching the rare term dominates


def test_unigram_logprob_hand_computed(spark):
    d = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
        for r in R.unigram_logprob(d).collect()
    }
    # counts: a=2 b=2 c=1, T=5, V=3
    def lp(c):
        return round(math.log((c + 1) / 8.0) * 1e6)

    m1 = (lp(2) * 2 + lp(2)) / 3 / 1e6
    m2 = (lp(2) + lp(1)) / 2 / 1e6
    # Python round() is banker's; Spark ROUND is HALF_UP — compare to
    # the unrounded value within one quantum instead
    assert got[1][0] == 3 and abs(got[1][1] - m1) <= 1e-6
    assert got[2][0] == 2 and abs(got[2][1] - m2) <= 1e-6


def test_bm25_filters_before_shuffle(spark):
    """The exchange input must be the query-term-filtered stream: the
    term filter sits below the first aggregate's exchange in the plan."""
    d = _docs(spark)
    df = R.bm25_search(d, ["hash"], top_n=5)
    df.collect()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # tree prints parent-first: the term filter must sit directly above
    # the explode (below the tf aggregate's shuffle), i.e. the partial
    # aggregate prints before the filter, the filter before Generate
    i_partial = plan.index("partial_count")
    i_filter = plan.index("Filter (term")
    i_gen = plan.index("Generate explode")
    assert i_partial < i_filter < i_gen

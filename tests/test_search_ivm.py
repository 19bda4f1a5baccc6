"""Property tests: phrase search over the positional index equals a
pure-Python sliding-window scan, and the maintained enrichment view
equals a recomputed join for any change batch."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

word = st.sampled_from(["slow", "hash", "batch", "row", "scan"])
doc = st.lists(word, min_size=0, max_size=15).map(" ".join)
docs_strategy = st.lists(doc, min_size=1, max_size=8)
phrase_strategy = st.lists(word, min_size=1, max_size=3)


@settings(max_examples=8, deadline=None)
@given(docs_strategy, phrase_strategy)
def test_phrase_search_equals_sliding_window(spark, texts, phrase):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        ranking as RK,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc"]: r["n_matches"]
        for r in RK.phrase_search(
            RK.build_postings(d), phrase
        ).collect()
    }
    want = {}
    m = len(phrase)
    for i, t in rows:
        toks = t.split()
        n = sum(
            1
            for j in range(len(toks) - m + 1)
            if toks[j : j + m] == phrase
        )
        if n:
            want[i] = n
    assert got == want


fact = st.tuples(
    st.integers(min_value=0, max_value=30),  # fact key (unique-ified)
    st.integers(min_value=0, max_value=5),   # dim key
)
dim_key = st.integers(min_value=0, max_value=5)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(fact, min_size=0, max_size=10),
    st.lists(fact, min_size=0, max_size=5),
    st.lists(st.integers(min_value=0, max_value=30), max_size=5),
    st.lists(dim_key, max_size=3),
)
def test_maintained_join_view_equals_recompute(
    spark, base_facts, raw_inserts, delete_keys, updated_dims
):
    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        incremental as INC,
    )

    # unique fact keys; inserts get keys disjoint from the base
    base = {k: d for k, d in base_facts}
    inserts = {
        k + 100: d for k, d in raw_inserts
    }
    dim = {k: f"seg{k}" for k in range(6)}
    dim_new = dict(dim)
    for k in updated_dims:
        dim_new[k] = f"upd{k}"

    # python reference: final join state
    final_facts = {
        **{k: d for k, d in base.items() if k not in set(delete_keys)},
        **inserts,
    }
    want = {
        (k, d, dim_new[d]) for k, d in final_facts.items()
    }

    def df_facts(d):
        rows = [(k, v) for k, v in d.items()]
        if not rows:
            return spark.createDataFrame([], "fk long, dk long")
        return spark.createDataFrame(rows, "fk long, dk long")

    dim0 = spark.createDataFrame(
        list(dim.items()), "dk long, seg string"
    )
    view = df_facts(base).join(dim0, "dk")
    upd_rows = [(k, f"upd{k}") for k in set(updated_dims)]
    dim_updates = (
        spark.createDataFrame(upd_rows, "dk long, seg string")
        if upd_rows
        else None
    )
    dim_current = spark.createDataFrame(
        list(dim_new.items()), "dk long, seg string"
    )
    dels = (
        spark.createDataFrame(
            [(k,) for k in set(delete_keys)], "fk long"
        )
        if delete_keys
        else None
    )
    out = INC.maintain_join_view(
        view,
        fact_key="fk",
        dim_key="dk",
        dim_cols=["seg"],
        dim_updates=dim_updates,
        fact_inserts=df_facts(inserts) if inserts else None,
        fact_delete_keys=dels,
        dim_current=dim_current if inserts else None,
    )
    got = {(r["fk"], r["dk"], r["seg"]) for r in out.collect()}
    assert got == want


def test_postings_persist_zordered_and_phrase_search_skips_files(
    spark, tmp_path
):
    """The documented 100 TB shape of the search index, end to end:
    build_postings → snapshots.commit(cluster_by=['term'],
    stats_for=['term']) → read_where with the phrase's term predicate
    must SKIP files (manifest-level pruning, asserted via the report
    hook) and phrase_search over the pruned scan must equal the search
    over the full postings frame."""
    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.ranking import (
        build_postings,
        phrase_search,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
        snapshots as S,
    )

    # vocabulary wide enough that z-ordered files separate term ranges
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(
                    f"w{(i * 11 + j) % 97}" for j in range(30)
                )
                + (" alpha beta gamma" if i % 5 == 0 else ""),
            )
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    postings = build_postings(docs)
    path = str(tmp_path / "postings")
    S.commit(
        spark, postings, path,
        stats_for=["term"], cluster_by=["term"], n_files=16,
    )

    phrase = ["alpha", "beta", "gamma"]
    rep: dict = {}
    pruned = S.read_where(
        spark, path, [("term", "in", phrase)], report=rep
    )
    assert rep["files_total"] == 16
    assert 0 < rep["files_kept"] < rep["files_total"], rep

    got = {
        (r["doc"], r["n_matches"])
        for r in phrase_search(pruned, phrase).collect()
    }
    want = {
        (r["doc"], r["n_matches"])
        for r in phrase_search(postings, phrase).collect()
    }
    assert got == want
    assert got == {(i, 1) for i in range(0, 200, 5)}

"""Property tests for the prefix-filtered similarity join and
degree-ordered triangle counting: each against an independent
pure-Python brute-force reference on randomized inputs. Prefix
filtering and edge orientation are pure optimizations — results must
equal the naive computation exactly."""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

word = st.sampled_from(["spark", "row", "agg", "key", "scan", "x1", "b#"])
doc = st.lists(word, min_size=0, max_size=20).map(" ".join)
docs_strategy = st.lists(doc, min_size=1, max_size=10)

edge = st.tuples(
    st.integers(min_value=0, max_value=12),
    st.integers(min_value=0, max_value=12),
)
edges_strategy = st.lists(edge, min_size=0, max_size=40)


def _shingles(text: str, n: int = 3) -> set:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=6, deadline=None)
@given(docs_strategy)
def test_jaccard_prefix_equals_brute_force(spark, texts):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        textdedup as TD,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc1"], r["doc2"]): (r["inter"], r["union_size"])
        for r in TD.jaccard_prefix_pairs(
            d, "doc_id", "text", n=3, threshold_num=2, threshold_den=5
        ).collect()
    }
    sets = {i: _shingles(t) for i, t in rows}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        # exact rational threshold, same as the operator: 5*i >= 2*u
        # (empty-shingle docs have union 0 and never pair)
        if union > 0 and 5 * inter >= 2 * union:
            want[(a, b)] = (inter, union)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(edges_strategy)
def test_triangle_counts_equal_brute_force(spark, raw_edges):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        triangle_counts,
    )

    if not raw_edges:
        raw_edges = [(0, 0)]  # createDataFrame needs >= 1 row
    e = spark.createDataFrame(raw_edges, "src long, dst long")
    got = {
        r["node"]: r["triangles"] for r in triangle_counts(e).collect()
    }
    undirected = {
        (min(a, b), max(a, b)) for a, b in raw_edges if a != b
    }
    nodes = {n for pair in undirected for n in pair}
    adj = {n: set() for n in nodes}
    for a, b in undirected:
        adj[a].add(b)
        adj[b].add(a)
    want = {n: 0 for n in nodes}
    for a, b, c in combinations(sorted(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                want[n] += 1
    assert got == want

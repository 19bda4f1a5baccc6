"""Unit tests for tools/touched.py — the --touched static scoping scan.

Hermetic: exercises the ast layer on synthetic sources only (no git, no
Spark). The end-to-end behavior (window reorder -> 0 queries, helper edit
-> dependent queries) was verified against the live repo and is recorded
in TUNING.md round 13.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from touched import _CatalogSource, _closure, _module_name  # noqa: E402

SRC_V1 = '''\
HELPER_SQL = "SELECT 1 AS one"


def money(x):
    return x * 100


def q_alpha(spark, sf):
    return money(spark.range(1))


def q_beta(spark, sf):
    queries = [1, 2, 3]  # local shadowing the top-level queries()
    return len(queries)


_WINDOW_FRONT = ["q_alpha", "q_beta"]

_CATALOG_DEFS = {
    "alpha": QueryDef(q_alpha, HELPER_SQL),
    "beta": QueryDef(q_beta, "SELECT 2 AS two"),
}


def queries():
    return {n: d for n, d in _CATALOG_DEFS.items() if n in _WINDOW_FRONT}
'''


def _touched_between(old_src: str, new_src: str) -> set[str]:
    old, new = _CatalogSource(old_src), _CatalogSource(new_src)
    changed = {
        n for n, seg in new.segments.items() if old.segments.get(n) != seg
    }
    out = set()
    for q, (entry_src, entry_names) in new.registrations.items():
        old_reg = old.registrations.get(q)
        if old_reg is None or old_reg[0] != entry_src:
            out.add(q)
        elif _closure(entry_names, new.refs) & changed:
            out.add(q)
    return out


def test_registrations_and_refs_extracted():
    cs = _CatalogSource(SRC_V1)
    assert set(cs.registrations) == {"alpha", "beta"}
    _, names = cs.registrations["alpha"]
    assert "q_alpha" in names and "HELPER_SQL" in names
    assert "money" in cs.refs["q_alpha"]


def test_local_shadowing_does_not_alias_top_level():
    # q_beta's local `queries` must not pull in the top-level queries()
    # (whose body reaches _WINDOW_FRONT) — the bug that made a pure
    # window reorder flag 8 unrelated queries.
    cs = _CatalogSource(SRC_V1)
    assert "queries" not in cs.refs["q_beta"]
    assert "_WINDOW_FRONT" not in _closure(
        cs.registrations["beta"][1], cs.refs
    )


def test_window_reorder_touches_nothing():
    reordered = SRC_V1.replace(
        '_WINDOW_FRONT = ["q_alpha", "q_beta"]',
        '_WINDOW_FRONT = ["q_beta", "q_alpha"]',
    )
    assert _touched_between(SRC_V1, reordered) == set()


def test_helper_edit_touches_dependents_only():
    edited = SRC_V1.replace("return x * 100", "return x * 1000")
    assert _touched_between(SRC_V1, edited) == {"alpha"}


def test_oracle_constant_edit_touches_its_query():
    edited = SRC_V1.replace("SELECT 1 AS one", "SELECT 10 AS one")
    assert _touched_between(SRC_V1, edited) == {"alpha"}


def test_inline_oracle_edit_touches_its_query():
    edited = SRC_V1.replace("SELECT 2 AS two", "SELECT 20 AS two")
    assert _touched_between(SRC_V1, edited) == {"beta"}


def test_new_registration_is_touched():
    added = SRC_V1.replace(
        '"beta": QueryDef(q_beta, "SELECT 2 AS two"),',
        '"beta": QueryDef(q_beta, "SELECT 2 AS two"),\n'
        '    "gamma": QueryDef(q_alpha, None),',
    )
    assert _touched_between(SRC_V1, added) == {"gamma"}


def test_package_graph_inits_resolved():
    # Live-repo (but git-free, Spark-free) pin of the import-graph rules:
    # init modules contribute no outgoing edges, and init re-exports
    # resolve to the defining module.
    from touched import PKG, _PackageGraph

    pg = _PackageGraph()
    ops_init = f"{PKG}.operators"
    assert ops_init in pg.inits
    assert pg.graph[ops_init] == set()
    # `from pkg.operators import validate` must resolve to the
    # validation module, not the init.
    assert pg.exports[ops_init]["validate"] == f"{PKG}.operators.validation"
    resolved = pg.resolve(ops_init, ["validate"])
    assert f"{PKG}.operators.validation" in resolved
    # a real submodule import resolves to the submodule
    assert f"{PKG}.operators.bpe" in pg.resolve(ops_init, ["bpe"])


def test_module_name_mapping():
    pkg = "_lakehouse_architecture_for_e_commerce_transactions_spark"
    assert _module_name(f"{pkg}/operators/similarity.py") == (
        f"{pkg}.operators.similarity"
    )
    assert _module_name(f"{pkg}/operators/__init__.py") == f"{pkg}.operators"
    assert _module_name("tests/test_touched.py") is None
    assert _module_name("bench.py") is None

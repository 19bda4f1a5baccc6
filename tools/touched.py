"""Map changed files -> dependent catalog queries (static scan).

Scopes mid-round parity gates (r12 verdict task 4): instead of re-running
all 197 query/oracle pairs after every source edit, compute which catalog
queries can OBSERVE the diff and gate only those. The full gate remains
the closing-run requirement; this tool only scopes interim runs.

Two layers of static analysis, both conservative (over-approximate):

1. **Package modules.** Every ``.py`` under the package is ast-scanned for
   imports of sibling package modules, giving an import graph. A changed
   module "affects" every module that can reach it through imports. Each
   query's builder is introspected (``co_names`` of its code object and
   all nested code objects, resolved in the catalog module's globals) to
   the set of package modules it uses; a query is touched when that set
   intersects the affected closure.

2. **catalog.py internals.** The catalog is one 9k-line module, so a
   whole-module granularity would re-run everything on every window
   rotation. Instead both the base-ref and worktree versions are
   ast-parsed into per-top-level-name source segments (functions and
   assignments); a query is touched when the transitive closure of
   catalog-level names reachable from its ``_CATALOG_DEFS`` registration
   (builder function, oracle constant, helpers they reference) contains a
   name whose segment text differs between the two versions. Reordering
   ``_WINDOW_FRONT`` therefore touches nothing; editing ``money()``
   touches every query whose builder or oracle uses it.

Changes outside the package (tests/, tools/, bench.py, docs) map to no
queries. Changes to ``session.py`` / ``tables.py`` map to essentially the
whole catalog — which is honest, since every builder loads tables.

Usage:
    python tools/touched.py [BASE_REF]           # list touched queries
    python tools/verify_parity.py --touched[=REF] [sf_dir]
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys
import types

PKG = "_lakehouse_architecture_for_e_commerce_transactions_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CATALOG_REL = f"{PKG}/plans/catalog.py"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def changed_files(base: str = "HEAD") -> set[str]:
    """Repo-relative paths that differ from *base* (incl. untracked)."""
    out = set(_git("diff", "--name-only", base).splitlines())
    out |= set(_git("ls-files", "--others", "--exclude-standard").splitlines())
    return {p for p in out if p}


def _module_name(relpath: str) -> str | None:
    if not relpath.startswith(PKG + "/") or not relpath.endswith(".py"):
        return None
    mod = relpath[: -len(".py")].replace("/", ".")
    return mod[: -len(".__init__")] if mod.endswith(".__init__") else mod


class _PackageGraph:
    """Static import structure of the package.

    - ``graph``: module -> package modules it imports, with ``__init__``
      re-exports RESOLVED to the defining module: ``from pkg.operators
      import validate`` becomes an edge to ``pkg.operators.validation``
      (via the init's own import list), not to the init. Init modules
      keep an edge from their importers (so editing the init itself
      re-gates them) but contribute NO outgoing edges — otherwise every
      init importer would be affected by a change to ANY module the init
      re-exports, marking ~a third of the catalog touched for any
      operator edit.
    - ``inits``: package ``__init__`` module names.
    - ``exports``: init module -> {exported name -> defining module}.
    """

    def __init__(self) -> None:
        raw: dict[str, list[tuple[str, list[str]]]] = {}
        self.inits: set[str] = set()
        for dirpath, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fn), REPO)
                mod = _module_name(rel)
                if mod is None:
                    continue
                if fn == "__init__.py":
                    self.inits.add(mod)
                with open(os.path.join(REPO, rel)) as f:
                    tree = ast.parse(f.read())
                entries: list[tuple[str, list[str]]] = []
                pkg_parts = mod.split(".")[:-1]
                for node in ast.walk(tree):
                    if isinstance(node, ast.Import):
                        for a in node.names:
                            if a.name.startswith(PKG):
                                entries.append((a.name, []))
                    elif isinstance(node, ast.ImportFrom):
                        if node.level:
                            base = pkg_parts[
                                : len(pkg_parts) - node.level + 1
                            ]
                            root = ".".join(
                                base
                                + (
                                    node.module.split(".")
                                    if node.module
                                    else []
                                )
                            )
                        else:
                            root = node.module or ""
                        if root.startswith(PKG) or root == PKG:
                            entries.append(
                                (root, [a.name for a in node.names])
                            )
                raw[mod] = entries
        self.modules: set[str] = set(raw)
        # init export maps: binding name -> defining module
        self.exports: dict[str, dict[str, str]] = {}
        for init in self.inits:
            table: dict[str, str] = {}
            for root, names in raw.get(init, []):
                for n in names:
                    sub = f"{root}.{n}"
                    table[n] = sub if sub in self.modules else root
            self.exports[init] = table
        # resolved edges
        self.graph: dict[str, set[str]] = {}
        for mod, entries in raw.items():
            deps: set[str] = set()
            if mod not in self.inits:
                for root, names in entries:
                    deps.update(self.resolve(root, names))
            self.graph[mod] = deps & self.modules

    def resolve(self, root: str, names: list[str]) -> set[str]:
        """Modules bound by `from root import names` / `import root`."""
        if root not in self.modules:
            return set()
        out = {root}
        for n in names:
            sub = f"{root}.{n}"
            if sub in self.modules:
                out.add(sub)
            elif root in self.exports and n in self.exports[root]:
                out.add(self.exports[root][n])
        return out


def _affected_modules(changed_mods: set[str], pg: _PackageGraph) -> set[str]:
    """Modules that can reach a changed module through imports."""
    affected = set(changed_mods) & pg.modules
    grew = True
    while grew:
        grew = False
        for m, deps in pg.graph.items():
            if m not in affected and deps & affected:
                affected.add(m)
                grew = True
    return affected


def _code_names(fn) -> set[str]:
    """All global/attr names referenced by fn's code, incl. nested code."""
    names: set[str] = set()
    stack = [fn.__code__]
    while stack:
        code = stack.pop()
        names.update(code.co_names)
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return names


def _builder_modules(builder, catalog_globals: dict, pg: _PackageGraph) -> set[str]:
    """Package modules the builder's code can reach via catalog globals.

    Names resolving to catalog-level helper FUNCTIONS are recursed into
    (their code may call other package modules) rather than reported as a
    dependency on the catalog module itself — catalog.py edits are
    handled by the per-name segment diff, and reporting ``plans.catalog``
    here would mark every helper-using query touched whenever ANY module
    catalog imports changes.
    """
    catalog_mod = f"{PKG}.plans.catalog"
    mods: set[str] = set()
    seen: set[str] = set()
    frontier = [builder]
    while frontier:
        fn = frontier.pop()
        code_names = _code_names(fn)
        # In-function imports surface as dotted module paths in co_names
        # (`from PKG.operators import bpe as B` -> "PKG.operators" plus an
        # IMPORT_FROM name "bpe"); resolve through the package graph the
        # same way top-level imports are (submodules and init re-exports
        # land on the defining module).
        for n in code_names:
            for dotted in (n, f"{PKG}.{n}" if "." in n else None):
                if not dotted or not dotted.startswith(PKG + "."):
                    continue
                if dotted in pg.modules:
                    mods.update(pg.resolve(dotted, list(code_names)))
        for n in code_names:
            if n in seen:
                continue
            seen.add(n)
            obj = catalog_globals.get(n)
            if obj is None:
                continue
            if isinstance(obj, types.ModuleType):
                name = obj.__name__
            else:
                name = getattr(obj, "__module__", None) or ""
            if not name.startswith(PKG):
                continue
            if name == catalog_mod:
                if hasattr(obj, "__code__"):
                    frontier.append(obj)
                continue
            mods.add(name)
    mods.discard(catalog_mod)
    return mods


class _CatalogSource:
    """One parse of a catalog.py version: segments, refs, registrations.

    ``ast.get_source_segment`` re-splits the whole source per call (34 s
    for one pass over the 9.8k-line catalog), so segments are sliced
    directly from a precomputed line list instead.
    """

    def __init__(self, src: str):
        self._lines = src.splitlines(keepends=True)
        tree = ast.parse(src)
        # name -> source segment for every top-level def / assign target
        self.segments: dict[str, str] = {}
        node_names: list[tuple[ast.AST, list[str]]] = []
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                names = [node.name]
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = (
                    node.targets if isinstance(node, ast.Assign)
                    else [node.target]
                )
                names = [t.id for t in targets if isinstance(t, ast.Name)]
            else:
                continue
            seg = self._segment(node)
            node_names.append((node, names))
            for n in names:
                self.segments[n] = seg
        # name -> top-level names referenced inside its segment. Names
        # BOUND inside the node (params, assignments, comprehension
        # targets, nested defs) are excluded — a builder's local variable
        # `queries` must not alias the top-level `queries()` function,
        # whose CATALOG reference would otherwise pull _WINDOW_FRONT into
        # every closure and mark the whole catalog touched on a window
        # reorder.
        self.refs: dict[str, set[str]] = {}
        top = self.segments
        for node, names in node_names:
            used: set[str] = set()
            bound: set[str] = set()
            for n in ast.walk(node):
                if isinstance(n, ast.Name):
                    if isinstance(n.ctx, ast.Load):
                        if n.id in top:
                            used.add(n.id)
                    else:
                        bound.add(n.id)
                elif isinstance(n, ast.arg):
                    bound.add(n.arg)
                elif isinstance(
                    n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
                ) and n is not node:
                    bound.add(n.name)
                elif isinstance(n, (ast.Import, ast.ImportFrom)):
                    for a in n.names:
                        bound.add(a.asname or a.name.split(".")[0])
            for name in names:
                self.refs[name] = used - bound - {name}
        # query -> (registration entry source, top-level names referenced).
        # The _CATALOG_DEFS dict literal's values are QueryDef(...) calls
        # naming the builder function and oracle constant (inline oracles
        # are part of the entry source and diff naturally).
        self.registrations: dict[str, tuple[str, set[str]]] = {}
        for node, names in node_names:
            if "_CATALOG_DEFS" not in names:
                continue
            value = node.value
            if not isinstance(value, ast.Dict):
                continue
            for k, v in zip(value.keys, value.values):
                if not isinstance(k, ast.Constant) or not isinstance(
                    k.value, str
                ):
                    continue
                used = {
                    n.id
                    for n in ast.walk(v)
                    if isinstance(n, ast.Name) and n.id in top
                }
                self.registrations[k.value] = (self._segment(v), used)

    def _segment(self, node: ast.AST) -> str:
        lines = self._lines[node.lineno - 1 : node.end_lineno]
        if not lines:
            return ""
        if len(lines) == 1:
            return lines[0][node.col_offset : node.end_col_offset]
        return (
            lines[0][node.col_offset :]
            + "".join(lines[1:-1])
            + lines[-1][: node.end_col_offset]
        )


def _closure(seed: set[str], refs: dict[str, set[str]]) -> set[str]:
    out = set(seed)
    frontier = list(seed)
    while frontier:
        n = frontier.pop()
        for dep in refs.get(n, ()):
            if dep not in out:
                out.add(dep)
                frontier.append(dep)
    return out


def _catalog_touched(base: str) -> set[str] | None:
    """Queries whose reachable catalog.py segments differ vs *base*.

    Returns None when the base version can't be read (new file / rename) —
    callers should treat that as "all queries touched".
    """
    with open(os.path.join(REPO, CATALOG_REL)) as f:
        new_src = f.read()
    try:
        old_src = _git("show", f"{base}:{CATALOG_REL}")
    except subprocess.CalledProcessError:
        return None
    try:
        old = _CatalogSource(old_src)
    except SyntaxError:
        return None
    new = _CatalogSource(new_src)
    changed_names = {
        n for n, seg in new.segments.items() if old.segments.get(n) != seg
    }
    touched: set[str] = set()
    for q, (entry_src, entry_names) in new.registrations.items():
        old_reg = old.registrations.get(q)
        if old_reg is None or old_reg[0] != entry_src:
            touched.add(q)
            continue
        if _closure(entry_names, new.refs) & changed_names:
            touched.add(q)
    return touched


def touched_queries(base: str = "HEAD") -> tuple[set[str], list[str]]:
    """(touched query names, human-readable notes). Conservative."""
    # import here so the tool works from any cwd
    sys.path.insert(0, REPO)
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (
        catalog,
    )

    files = changed_files(base)
    notes = [f"changed files vs {base}: {len(files)}"]
    changed_mods = {m for p in files if (m := _module_name(p))}
    catalog_mod = f"{PKG}.plans.catalog"
    touched: set[str] = set()

    pkg_changes = changed_mods - {catalog_mod}
    if pkg_changes:
        pg = _PackageGraph()
        affected = _affected_modules(pkg_changes, pg)
        notes.append(
            f"package modules changed: {sorted(changed_mods)} -> "
            f"{len(affected)} affected via import graph"
        )
        cat_globals = vars(catalog)
        for name, qd in catalog._CATALOG_DEFS.items():
            if _builder_modules(qd.builder, cat_globals, pg) & affected:
                touched.add(name)

    if catalog_mod in changed_mods:
        cat = _catalog_touched(base)
        if cat is None:
            notes.append("catalog.py unreadable at base -> ALL queries")
            return set(catalog._CATALOG_DEFS), notes
        notes.append(f"catalog.py internal diff -> {len(cat)} queries")
        touched |= cat

    non_pkg = [p for p in sorted(files) if not _module_name(p)]
    if non_pkg:
        notes.append(f"ignored (outside package): {non_pkg[:10]}")
    return touched, notes


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    touched, notes = touched_queries(base)
    for n in notes:
        print(f"# {n}")
    for q in sorted(touched):
        print(q)
    print(f"# {len(touched)} touched queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

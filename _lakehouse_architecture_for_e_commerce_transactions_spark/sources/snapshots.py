"""Versioned snapshot tables: atomic commits + time travel on plain parquet.

The reference's curated zone is Delta (`src/requirements.txt:6`,
`src/glue_scripts/orders_etl.py:67-74`), whose `_delta_log` gives atomic
commits, snapshot-isolated readers, and time travel. delta-spark is not
installable in this environment, so this module provides the same
*protocol* shape with a JSON manifest log — the moral core of Delta/
Iceberg metadata layers, small enough to audit:

* Every commit writes its data files under a fresh immutable directory
  ``data/commit-<uuid>/`` — no file is ever rewritten in place.
* A commit is *published* by creating ``_manifests/v<N>.json`` with
  ``O_CREAT | O_EXCL`` — an atomic create-if-absent. Two concurrent
  writers racing for the same version: exactly one wins, the loser
  retries against the next version on top of the winner's manifest
  (optimistic concurrency, Delta-style).
* Readers resolve ONE manifest and only read directories it lists —
  snapshot isolation: a concurrent commit can never produce a torn read,
  because published manifests and their data dirs are immutable.
* Time travel = reading an old manifest (``version=``).

Scale notes: the manifest lists commit *directories*, not individual
files, so manifest size grows with commit count, not data size; `vacuum`
bounds history. At real scale the manifest store moves from a local dir
to an object store with if-none-match puts — same protocol, one I/O
primitive swapped.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_DATA = "data"


@dataclass(frozen=True)
class Snapshot:
    version: int
    dirs: list[str]
    schema_json: str
    committed_at: float


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFESTS, f"v{version:012d}.json")


def _versions(path: str) -> list[int]:
    mdir = os.path.join(path, _MANIFESTS)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    )


def load_snapshot(path: str, version: int | None = None) -> Snapshot:
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshot table at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {path} (have {vs})")
    with open(_manifest_path(path, v)) as f:
        m = json.load(f)
    return Snapshot(m["version"], m["dirs"], m["schema"], m["committed_at"])


def commit(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_retries: int = 10,
) -> int:
    """Atomically commit ``df`` as the table's next version; returns it.

    ``overwrite`` publishes a manifest listing only this commit's data
    dir; ``append`` carries the parent snapshot's dirs forward. The data
    write happens BEFORE publication, so a crashed writer leaves only an
    unreferenced orphan dir (cleaned by ``vacuum``), never a torn table.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode {mode!r}")
    commit_dir = os.path.join(path, _DATA, f"commit-{uuid.uuid4().hex}")
    df.write.mode("errorifexists").parquet(commit_dir)

    for _ in range(max_retries):
        vs = _versions(path)
        next_v = (vs[-1] + 1) if vs else 0
        dirs = [commit_dir]
        if mode == "append" and vs:
            dirs = load_snapshot(path, vs[-1]).dirs + [commit_dir]
        manifest = {
            "version": next_v,
            "dirs": dirs,
            "schema": df.schema.json(),
            "committed_at": time.time(),
        }
        os.makedirs(os.path.join(path, _MANIFESTS), exist_ok=True)
        try:
            fd = os.open(
                _manifest_path(path, next_v),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            continue  # lost the race: recompute on top of the winner
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        return next_v
    raise RuntimeError(f"commit contention at {path}: {max_retries} retries")


def read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot-isolated read of the latest (or a time-traveled) version."""
    snap = load_snapshot(path, version)
    return spark.read.parquet(*snap.dirs)


def history(path: str) -> list[Snapshot]:
    return [load_snapshot(path, v) for v in _versions(path)]


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Drop manifests older than the last ``keep_last`` versions and delete
    data dirs no surviving manifest references (including orphans from
    crashed writers). Returns the deleted data dirs."""
    import shutil

    vs = _versions(path)
    keep_vs = vs[-keep_last:] if vs else []
    live: set[str] = set()
    for v in keep_vs:
        live.update(load_snapshot(path, v).dirs)
    for v in vs:
        if v not in keep_vs:
            os.remove(_manifest_path(path, v))
    deleted = []
    data_root = os.path.join(path, _DATA)
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if full not in live:
                shutil.rmtree(full)
                deleted.append(full)
    return deleted

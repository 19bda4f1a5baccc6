"""Row-level CHANGE DATA FEED over snapshot tables, as a stream.

``streaming/tablesource.py`` tails APPEND commits and refuses change
commits — the right contract for a mirror, but a downstream consumer
that must *react to deletes and updates* (GDPR propagation, cache
invalidation, incremental-view maintenance outside this repo) needs the
changes themselves. This module is the Delta ``readChangeFeed``
streaming shape: ``spark.readStream.format("snapshot_cdf")`` emits one
row per change with ``_change_type`` in ``insert | delete |
update_preimage | update_postimage`` plus ``_commit_version`` — exactly
once per commit, resumable from the checkpoint, built on the same
public Python Data Source API (SPARK-44076).

How each commit class becomes change rows (classification is
structural — immutable manifests in — except where a commit opted in
to write-time CDC, which then wins):

- **Append commits** (WRITE/APPEND/insert-only MERGE): every row of
  every added file → ``insert``.
- **Deletion-vector DELETE** (``delete_where_dv``): the tombstones the
  commit added address (file, row_idx) pairs — the feed re-reads
  exactly those row positions from the (immutable) data files and
  emits them as ``delete``. Row-precise, cost O(rows deleted).
- **Deletion-vector UPDATE** (``update_where_dv``): the added
  tombstones → ``update_preimage``, the added image dir →
  ``update_postimage``. Row-precise.
- **Partition rewrites** (matched MERGE, partition-rewrite DELETE,
  REPLACE WHERE, RESTORE): the rewritten/dropped dirs' LIVE rows
  (previous version's tombstones excluded) → ``delete``; the new
  dirs' rows → ``insert``. This is COARSE — an untouched row inside a
  rewritten partition emits a delete+insert pair — but net-effect
  exact: applying the feed reproduces the table. For ROW-PRECISE
  rewrites, commit with ``merge_commit(change_data=True)`` /
  ``delete_where(change_data=True)`` (Delta's
  ``delta.enableChangeDataFeed``): the commit records its exact
  change rows in a ``_change_data`` dir and the feed emits those
  instead of the churn. Key-level pairing without write-time files
  remains the batch ``snapshots.snapshot_diff``'s job.
- **OPTIMIZE emits nothing** (bytes rewritten, not rows — Delta's
  ``dataChange=false``), metadata-only commits emit nothing.
- **Baselines carry tombstones fine**: a ``startingVersion`` whose
  snapshot has deletion vectors emits live rows only (dead positions
  excluded executor-side) — unlike the tail source, which must refuse.

Scale: driver work per commit is O(what the commit touched) — added
dirs are listed, added tombstone dirs are read (delete-sized by
construction; positions above ``_DV_EMBED_CAP`` per file stay on the
executors). Each emitted file is one ``InputPartition``; ``read()`` is
executor-side pyarrow → Arrow batches, no Python row loop.

Reference: the reference repo (Glue ETL) has no change-feed surface;
this extends the rebuild's §2.9 streaming envelope the same way
``snapshot_tail`` does.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.tablesource import (
    SnapshotTailReader,
    _coerce_hive,
    _hive_pairs_under,
    _HIVE_NULL,
    _parquet_files,
)

CDF_SOURCE_NAME = "snapshot_cdf"

_META_COLS = ("_change_type", "_commit_version")

# Tombstone positions per file above this ride to executors as dv-dir
# paths (re-read there) instead of inline in the partition descriptor.
_DV_EMBED_CAP = 200_000


class _ChangeSlice(InputPartition):
    """One data file's contribution to one commit's change rows.

    kind:
      - ``add``            whole file (minus ``exclude_dv_dirs`` dead
                           positions), emitted as ``change_type``
      - ``positions``      only ``positions`` (or the positions found
                           for this file in ``dv_dirs`` when they were
                           too many to embed), as ``change_type``
      - ``cdc``            a write-time ``_change_data`` file: every
                           row rides out under the ``_change_type``
                           it carries in the file itself
    """

    def __init__(
        self,
        kind: str,
        file_path: str,
        hive_pairs: list,
        mapping: dict,
        version: int,
        change_type: str,
        positions: list | None = None,
        dv_dirs: list | None = None,
        exclude_dv_dirs: list | None = None,
    ) -> None:
        self.kind = kind
        self.file_path = file_path
        self.hive_pairs = hive_pairs
        self.mapping = mapping
        self.version = version
        self.change_type = change_type
        self.positions = positions
        self.dv_dirs = dv_dirs
        self.exclude_dv_dirs = exclude_dv_dirs


def _dv_positions(dv_dirs: list[str]) -> dict[str, list[int]]:
    """{local data-file path: sorted dead row positions} across the
    given tombstone dirs — plain pyarrow (runs on driver for freshly
    added tombstones, on executors for over-cap or exclusion sets).
    Tombstone dirs are delete-sized by construction."""
    import pyarrow.parquet as pq

    out: dict[str, list[int]] = {}
    for d in dv_dirs or []:
        for fp in _parquet_files(d):
            t = pq.read_table(fp, columns=["file", "row_idx"])
            files = t.column("file").to_pylist()
            idxs = t.column("row_idx").to_pylist()
            for f, i in zip(files, idxs):
                out.setdefault(S._strip_file_scheme(f), []).append(int(i))
    for k in out:
        out[k] = sorted(set(out[k]))
    return out


class SnapshotCDFReader(SnapshotTailReader):
    """Offset plumbing (versions as offsets, startingVersion,
    maxVersionsPerTrigger admission control) is inherited verbatim from
    the tail reader; only what a version BECOMES differs."""

    def __init__(self, schema: StructType, options: dict) -> None:
        super().__init__(schema, options)
        # the logical data schema = full schema minus the meta columns
        self._data_schema = StructType(
            [f for f in schema.fields if f.name not in _META_COLS]
        )

    # -- driver-side: classify one version into change slices ---------

    def _version_partitions(self, v: int) -> list[InputPartition]:
        snap = S.load_snapshot(self._path, v)
        try:
            prev = S.load_snapshot(self._path, v - 1)
        except (S.VacuumedVersionError, ValueError, FileNotFoundError):
            prev = None

        self._note_version(v, snap, prev)
        if snap.op == "OPTIMIZE":
            return []  # rewrite of bytes, not rows (dataChange=false)

        # logical -> physical resolved per naming ERA (inherited
        # `_mapping_for`): a head capture breaks rename-then-compact
        # replays — compact clears the mapping but the surviving
        # pre-compact manifests still need theirs composed in. Files
        # referenced at v (adds) and at v-1 (structural removes,
        # DV-tombstoned rows) are always same-era here: the only
        # era-crossing transition is the compact itself, OPTIMIZE-
        # skipped above.
        mapping = self._mapping_for(v, snap)
        prev_mapping = (
            self._mapping_for(v - 1, prev) if prev is not None else mapping
        )
        out: list[InputPartition] = []

        cdc_dir = S._raw_manifest(self._path, v).get("change_data")
        if cdc_dir is not None and prev is not None:
            # the commit recorded its PRECISE row-level changes at
            # write time (merge_commit(change_data=True)): emit those
            # and skip the structural classification — the rewrite's
            # whole-partition delete+insert churn is exactly what the
            # change files exist to replace. (A baseline version still
            # emits the snapshot: the net state IS the feed's start.)
            return [
                _ChangeSlice("cdc", fp, [], mapping, v, "")
                for fp in _parquet_files(cdc_dir)
            ]

        if prev is None:
            # baseline: the whole snapshot as inserts, dead rows excluded
            excl = list(snap.dv_files or [])
            for fp, hive in self._snapshot_files(snap):
                out.append(
                    _ChangeSlice(
                        "add", fp, hive, mapping, v, "insert",
                        exclude_dv_dirs=excl,
                    )
                )
            return out

        prev_dv = list(prev.dv_files or [])
        new_dv_dirs = [d for d in (snap.dv_files or []) if d not in prev_dv]
        # prefix match: ops may carry batch markers ("UPDATE@...")
        is_update = (snap.op or "").startswith("UPDATE")
        pre_ct = "update_preimage" if is_update else "delete"
        post_ct = "update_postimage" if is_update else "insert"

        added_files, removed_files = self._structural_delta(snap, prev)

        for fp, hive in added_files:
            out.append(
                _ChangeSlice("add", fp, hive, mapping, v, post_ct)
            )
        for fp, hive in removed_files:
            # live rows only: rows already dead at v-1 were reported by
            # the commit that killed them
            out.append(
                _ChangeSlice(
                    "add", fp, hive, prev_mapping, v, "delete",
                    exclude_dv_dirs=prev_dv,
                )
            )

        if new_dv_dirs:
            pos = _dv_positions(new_dv_dirs)
            dir_hive = self._dir_hive_map(prev)
            for fp, idxs in sorted(pos.items()):
                hive = self._owner_hive(dir_hive, fp)
                if hive is None:
                    # tombstone for a file outside the previous
                    # snapshot (rewritten away in the same commit):
                    # its rows were already reported structurally
                    continue
                if len(idxs) <= _DV_EMBED_CAP:
                    out.append(
                        _ChangeSlice(
                            "positions", fp, hive, prev_mapping, v, pre_ct,
                            positions=idxs,
                        )
                    )
                else:
                    out.append(
                        _ChangeSlice(
                            "positions", fp, hive, prev_mapping, v, pre_ct,
                            dv_dirs=new_dv_dirs,
                        )
                    )
        return out

    # -- structural helpers (driver-side, O(commit footprint)) --------

    def _snapshot_files(self, snap) -> list[tuple[str, list]]:
        """Every data file of a snapshot with its hive pairs."""
        out: list[tuple[str, list]] = []
        for d, hive in sorted(self._dir_hive_map(snap).items()):
            out.extend(self._dir_files(d, hive))
        return out

    @staticmethod
    def _dir_hive_map(snap) -> dict[str, list]:
        """{data dir: hive pairs source} for a snapshot. Merge-committed
        tables carry partition values in their entries; plain tables
        decode them from ``k=v`` path segments (marked by a None value
        here and resolved per file)."""
        if snap.part_entries is not None:
            pby = list(snap.partition_by or [])
            return {
                e["dir"]: [
                    (c, None if raw == _HIVE_NULL else raw)
                    for c, raw in zip(pby, e["parts"])
                ]
                for e in snap.part_entries
            }
        return {d: None for d in snap.dirs}

    def _dir_files(self, d: str, hive) -> list[tuple[str, list]]:
        if hive is not None:
            return [(fp, hive) for fp in _parquet_files(d)]
        return [
            (fp, _hive_pairs_under(d, os.path.dirname(fp)))
            for fp in _parquet_files(d)
        ]

    def _structural_delta(self, snap, prev):
        """(added files, removed files) between consecutive versions,
        each with hive pairs. Dir identity is the authority — commit
        dirs are immutable, so the same dir referenced by both versions
        proves the same rows, whatever the manifest layout (plain dirs,
        partition entries, or a transition between them)."""
        cur = self._dir_hive_map(snap)
        old = self._dir_hive_map(prev)
        added: list[tuple[str, list]] = []
        removed: list[tuple[str, list]] = []
        for d in sorted(set(cur) - set(old)):
            added.extend(self._dir_files(d, cur[d]))
        for d in sorted(set(old) - set(cur)):
            removed.extend(self._dir_files(d, old[d]))
        return added, removed

    @staticmethod
    def _owner_hive(dir_hive: dict, fp: str) -> list | None:
        """Hive pairs of the snapshot dir owning file ``fp`` (None if
        no dir of the snapshot contains it) — dir-PREFIX matching
        against the manifest's dir list, so resolving a DV commit's
        tombstoned files costs O(files tombstoned × manifest dirs),
        never an os.walk of the table."""
        for d, hive in dir_hive.items():
            if fp.startswith(d.rstrip(os.sep) + os.sep):
                if hive is not None:
                    return hive
                return _hive_pairs_under(d, os.path.dirname(fp))
        return None

    # -- executor-side read -------------------------------------------

    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        assert isinstance(partition, _ChangeSlice)
        target = to_arrow_schema(self._schema)
        tbl = pq.read_table(partition.file_path)

        if partition.kind == "positions":
            idxs = partition.positions
            if idxs is None:
                idxs = _dv_positions(partition.dv_dirs).get(
                    partition.file_path, []
                )
            tbl = tbl.take(pa.array(sorted(idxs), type=pa.int64()))
        elif partition.exclude_dv_dirs:
            dead = _dv_positions(partition.exclude_dv_dirs).get(
                partition.file_path
            )
            if dead:
                import numpy as np

                keep = np.ones(tbl.num_rows, dtype=bool)
                keep[np.asarray(dead, dtype=np.int64)] = False
                tbl = tbl.filter(pa.array(keep))

        hive = dict(partition.hive_pairs)
        n = tbl.num_rows
        cols = []
        for f in self._schema.fields:
            af = target.field(f.name)
            if f.name == "_change_type":
                if partition.kind == "cdc":
                    # write-time change files carry their own types
                    cols.append(
                        tbl.column("_change_type")
                        .combine_chunks()
                        .cast(af.type)
                    )
                else:
                    cols.append(
                        pa.array([partition.change_type] * n).cast(af.type)
                    )
                continue
            if f.name == "_commit_version":
                cols.append(
                    pa.array([partition.version] * n).cast(af.type)
                )
                continue
            phys = partition.mapping.get(f.name, f.name)
            if phys not in tbl.column_names and f.name in tbl.column_names:
                phys = f.name  # materialized-logical file (restore edge)
            if phys in tbl.column_names:
                col = tbl.column(phys).combine_chunks()
                if (
                    pa.types.is_timestamp(col.type)
                    and col.type.tz is None
                    and pa.types.is_timestamp(af.type)
                    and af.type.tz is not None
                ):
                    col = pc.assume_timezone(col, af.type.tz)
                if col.type != af.type:
                    col = col.cast(af.type)
            elif f.name in hive:
                val = _coerce_hive(hive[f.name], f.dataType.simpleString())
                col = pa.array([val] * n).cast(af.type)
            else:
                col = pa.nulls(n, type=af.type)
            cols.append(col)
        out = pa.Table.from_arrays(cols, schema=target)
        yield from out.to_batches(max_chunksize=1 << 16)


class SnapshotCDFBatchReader(DataSourceReader):
    """BATCH change read (Delta's ``table_changes(t, a, b)`` TVF
    shape): every change of versions ``(startingVersion−1,
    endingVersion]`` in one DataFrame, planned by the SAME per-version
    classifier as the stream — structural adds, row-precise DV
    deletes, write-time change files — so batch and streaming
    consumers see byte-identical change rows."""

    def __init__(self, schema: StructType, options: dict) -> None:
        opts = dict(options)
        opts.setdefault("startingversion", "earliest")
        self._inner = SnapshotCDFReader(schema, opts)
        self._ending = options.get("endingversion")

    def partitions(self) -> Sequence[InputPartition]:
        lo = self._inner._resolve_start()
        vs = S._versions(self._inner._path)
        hi = vs[-1]
        if self._ending is not None:
            hi = int(self._ending)
            if hi not in vs:
                # same typed refusals as batch time travel
                S.load_snapshot(self._inner._path, hi)
        out: list[InputPartition] = []
        for v in vs:
            if lo < v <= hi:
                out.extend(self._inner._version_partitions(v))
        return out

    def read(self, partition: InputPartition) -> Iterator:
        return self._inner.read(partition)


class SnapshotCDFDataSource(DataSource):
    """``spark.readStream.format("snapshot_cdf").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return CDF_SOURCE_NAME

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                f"{CDF_SOURCE_NAME}: .option('path', <table dir>) is "
                "required"
            )
        snap = S.load_snapshot(path)
        base = StructType.fromJson(json.loads(snap.schema_json))
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def streamReader(self, schema: StructType) -> SnapshotCDFReader:
        return SnapshotCDFReader(schema, dict(self.options))

    def reader(self, schema: StructType) -> SnapshotCDFBatchReader:
        return SnapshotCDFBatchReader(schema, dict(self.options))


def register(spark: SparkSession) -> None:
    """Register the source under ``snapshot_cdf`` (idempotent)."""
    spark.dataSource.register(SnapshotCDFDataSource)


def read_changes_stream(
    spark: SparkSession,
    path: str,
    starting_version: int | str | None = None,
    max_versions_per_trigger: int | None = None,
) -> DataFrame:
    """The one-call wrapper: a streaming change feed for ``path``."""
    register(spark)
    r = spark.readStream.format(CDF_SOURCE_NAME).option("path", path)
    if starting_version is not None:
        r = r.option("startingVersion", str(starting_version))
    if max_versions_per_trigger is not None:
        r = r.option("maxVersionsPerTrigger", str(max_versions_per_trigger))
    return r.load()


def table_changes(
    spark: SparkSession,
    path: str,
    starting_version: int | str = "earliest",
    ending_version: int | None = None,
) -> DataFrame:
    """Delta's ``table_changes(t, from, to)`` as a BATCH DataFrame:
    every change row of versions ``[starting_version, ending_version]``
    (default: earliest through head), identical to what the stream
    would emit for the same range. ``starting_version='earliest'``
    replays from the oldest surviving snapshot (its rows as the
    baseline inserts)."""
    register(spark)
    r = (
        spark.read.format(CDF_SOURCE_NAME)
        .option("path", path)
        .option("startingVersion", str(starting_version))
    )
    if ending_version is not None:
        r = r.option("endingVersion", str(ending_version))
    return r.load()

"""Snapshot tables as a first-class Structured Streaming SOURCE.

The round-5 layer could stream INTO snapshot tables (`streaming/
ingest.py`, `streaming/corpus.py`) but not OUT of one: a downstream
consumer of a curated table had to batch-poll `snapshot_diff` by hand.
This module closes the loop with the Delta-streaming-source shape —
``spark.readStream`` over a snapshot table emits each APPEND commit's
rows exactly once, resumable from the streaming checkpoint — built on
the public PySpark Python Data Source API
(``pyspark.sql.datasource.DataSource`` / ``DataSourceStreamReader``,
SPARK-44076, Spark 4.0+).

Semantics (matching Delta's streaming source contract):

- **Offsets are commit versions.** ``{"version": N}`` means "everything
  through manifest vN has been emitted". A micro-batch covers the
  version range ``(start, end]``; replay after a crash re-plans the
  same range from the same immutable manifests, so delivery is
  exactly-once end-to-end when the sink is (foreachBatch into another
  snapshot table, or any idempotent sink keyed by batch).
- **Append commits stream.** A version that only ADDS data dirs (op
  WRITE/APPEND/MERGE insert-only is still structurally append-only)
  becomes one ``InputPartition`` per added parquet FILE — read
  parallelism equals file count, and a 1000-executor cluster fans the
  batch out with zero shuffle.
- **OPTIMIZE commits are skipped** (compaction/z-order rewrite bytes,
  not rows — Delta's ``dataChange=false``), and metadata-only commits
  (RENAME/DROP COLUMN, NDV refresh) emit nothing.
- **Change commits refuse loudly.** A version that removes dirs or
  grows deletion vectors (DELETE/UPDATE/MERGE-with-matches/REPLACE
  WHERE/RESTORE) raises :class:`ChangeCommitError` — silently
  re-emitting rewritten partitions would double-count. Pass
  ``skip_change_commits=True`` (Delta's ``skipChangeCommits``) to
  skip them and keep tailing inserts only.
- **startingVersion.** Default starts at the current head (future
  commits only, Delta's default). ``starting_version=N`` replays
  history from vN; ``"earliest"`` replays from the oldest surviving
  version, whose snapshot is emitted as the baseline. A baseline that
  carries deletion-vector tombstones refuses loudly (emitting its raw
  files would resurrect deleted rows) — ``compact()`` first.

Column mapping: files store PHYSICAL names; every emitted batch is
projected onto the table's LOGICAL schema (rename + null-fill +
cast) — the same contract as the batch read seam
(``snapshots._logical_select``). Partition columns come back from the
hive path segments (they are never mappable — ``_guard_mapping_refs``
refuses renaming them — so path names are logical names).

Scale: ``partitions()`` work is O(files ADDED by the commit) — the
driver never lists the table, only the new commit dirs; ``read()``
is executor-side pyarrow → Arrow RecordBatches, no Python row loop.

Reference: the reference repo (Glue ETL, `orders_etl.py` /
`product_etl.py`) has no streaming surface at all — this is part of
the rebuild's §2.9 streaming envelope, not a ported behavior.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)

SOURCE_NAME = "snapshot_tail"


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class ChangeCommitError(ValueError):
    """The stream reached a commit that rewrote or deleted existing
    rows (DELETE/UPDATE/matched MERGE/REPLACE WHERE/RESTORE). An
    append-tail source cannot represent it without double-emitting the
    rewritten partitions. Actionable: restart with
    ``skip_change_commits=True`` to tail inserts only, or consume the
    full change feed via ``snapshots.snapshot_diff``."""


class _FileSlice(InputPartition):
    """One appended parquet file: the unit of read parallelism."""

    def __init__(
        self,
        file_path: str,
        hive_pairs: list,  # [(name, raw-string-or-None), ...] from path
        mapping: dict,  # logical -> physical at the emitting version
    ) -> None:
        self.file_path = file_path
        self.hive_pairs = hive_pairs
        self.mapping = mapping


def _hive_pairs_under(root_dir: str, file_dir: str) -> list:
    """Decode ``k=v`` path segments between a commit dir and a file."""
    rel = os.path.relpath(file_dir, root_dir)
    pairs = []
    if rel and rel != ".":
        for seg in rel.split(os.sep):
            if "=" in seg:
                k, raw = seg.split("=", 1)
                pairs.append((k, None if raw == _HIVE_NULL else raw))
    return pairs


def _parquet_files(d: str) -> list[str]:
    out = []
    for root, dirs, files in os.walk(d):
        # Hadoop convention: _-/.-prefixed dirs are metadata, not data
        # (e.g. a commit's _change_data CDC files must never stream as
        # table rows)
        dirs[:] = sorted(
            x for x in dirs if not x.startswith(("_", "."))
        )
        for fn in sorted(files):
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                out.append(os.path.join(root, fn))
    return out


def _coerce_hive(raw, spark_type_name: str):
    """Hive path string -> Python value for the partition column's
    declared type (the streaming twin of ``snapshots._part_coerce``,
    which coerces toward a sample VALUE; here we have the TYPE)."""
    if raw is None:
        return None
    t = spark_type_name
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return int(raw)
    if t in ("float", "double"):
        return float(raw)
    if t == "boolean":
        low = raw.lower()
        if low in ("true", "false"):
            return low == "true"
        raise ValueError(f"bad boolean partition value {raw!r}")
    if t == "date":
        import datetime

        return datetime.date.fromisoformat(raw)
    return raw  # string-family: the path segment IS the value


class SnapshotTailReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError(
                f"{SOURCE_NAME}: .option('path', <table dir>) is required"
            )
        self._path = path
        self._schema = schema
        self._skip_change = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        self._starting = options.get("startingversion")
        # Admission control (Delta's maxFilesPerTrigger analog, in
        # commit units): cap how many VERSIONS one micro-batch may
        # cover, so replaying a long history ("earliest" over 10k
        # commits) proceeds in bounded, checkpointed steps instead of
        # one giant batch. A throughput valve, not a correctness
        # device (Spark's own file-source limit is best-effort the
        # same way): after a driver restart the cursor re-warms from
        # the engine's own recovery calls (see latestOffset), so
        # resumption stays paced AND never regresses the offset.
        mvpt = options.get("maxversionspertrigger")
        self._max_versions = int(mvpt) if mvpt is not None else None
        # Delta's maxFilesPerTrigger analog: stop advancing the offset
        # once the batch's cumulative ADDED-file count would exceed the
        # budget (always admitting at least one version so progress
        # never stalls). Same best-effort contract as max_versions.
        mfpt = options.get("maxfilespertrigger")
        self._max_files = int(mfpt) if mfpt is not None else None
        self._cursor: int | None = None
        # Column-mapping resolution is ERA-based (see _mapping_for):
        # anchor at the head snapshot the stream schema was captured
        # from; full compacts found while scanning older history become
        # composition boundaries.
        _head = S.load_snapshot(self._path)
        self._ref_version: int = _head.version
        self._ref_mapping: dict = dict(_head.column_mapping or {})
        self._down_boundaries: list[tuple[int, dict]] = []
        self._down_scanned_to: int = self._ref_version + 1
        self._post_ref_boundary = False
        self._eff_cache: dict = {}
        # last post-anchor schema_json verified type-compatible with
        # the anchored schema (see _note_version); avoids reparsing
        # an unchanged schema on every version
        self._type_ok_json: str | None = None
        # option-gated protocol trace (traceFile): a test seam that
        # records the ENGINE's driver-side call order, pinning the
        # restart behavior the cold-cursor pacing seed depends on
        # (see the SPARK-UPGRADE NOTE in latestOffset)
        self._trace_path = options.get("tracefile")

    def _tr(self, event: str) -> None:
        if self._trace_path:
            with open(self._trace_path, "a") as fh:
                fh.write(event + "\n")

    # -- offset plumbing (driver-side) --------------------------------

    def _resolve_start(self) -> int:
        vs = S._versions(self._path)
        if not vs:
            raise FileNotFoundError(
                f"{SOURCE_NAME}: no snapshot table at {self._path}"
            )
        if self._starting is None:
            # Delta default: tail future commits only
            return vs[-1]
        if str(self._starting).lower() == "earliest":
            return vs[0] - 1
        v = int(self._starting)
        if v not in vs:
            # same typed refusals as batch time travel
            S.load_snapshot(self._path, v)
        return v - 1

    def initialOffset(self) -> dict:
        self._tr(f"initialOffset cold={self._cursor is None}")
        off = self._resolve_start()
        self._cursor = off
        return {"version": off}

    def latestOffset(self) -> dict:
        self._tr(f"latestOffset cold={self._cursor is None}")
        vs = S._versions(self._path)
        head = vs[-1] if vs else -1
        if self._max_versions is None and self._max_files is None:
            self._cursor = head
            return {"version": head}
        if self._cursor is None:
            # Cold cursor. On a FRESH stream the runner calls
            # latestOffset before initialOffset (observed, Spark 4.1
            # python_streaming_source_runner), so seeding from the
            # starting option is what makes the FIRST batch paced. On
            # a RESTART this seed may sit BELOW the checkpointed
            # offset — returning it then would REGRESS the offset
            # (Spark plans a batch whenever latest DIFFERS from the
            # committed offset, commits the regression, and the
            # ratchet would re-deliver already-committed versions
            # under NEW batch ids that no @tailbatch/@cdcbatch marker
            # dedups). That cannot happen because the engine always
            # reconstructs the last checkpointed batch FIRST on
            # restart — a partitions(start, end) call that the
            # ratchet below (which reads BOTH bounds) and commit()
            # use to warm the cursor to the engine's position before
            # the first paced latestOffset runs. Pinned by
            # test_paced_restart_is_exactly_once.
            #
            # SPARK-UPGRADE NOTE: "reconstructs the checkpointed batch
            # first" is observed engine behavior (Spark 4.1), not API
            # contract. If an upgrade ever skips that re-plan, the
            # cold seed below would again be the first offset the
            # engine sees after restart — re-run
            # test_paced_restart_is_exactly_once against the new
            # runner before trusting a version bump. The max-bound
            # ratchet (partitions()/commit() both raise the cursor,
            # latestOffset never returns below it) is the defensive
            # layer that has to keep holding either way.
            self._cursor = self._resolve_start()
        end = head
        if self._max_versions is not None:
            end = min(end, self._cursor + self._max_versions)
        if self._max_files is not None:
            # admit versions until the file budget is spent; always at
            # least one so the stream never stalls. Planning cost is
            # O(versions admitted) manifest loads — the work
            # partitions() pays anyway.
            budget = self._max_files
            v = self._cursor
            while v < end:
                n = len(self._version_partitions(v + 1))
                if v > self._cursor and n > budget:
                    break
                budget -= n
                v += 1
                if budget <= 0:
                    break
            end = v
        if end > self._cursor:
            self._cursor = end
        return {"version": end}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._tr(f"partitions {start['version']} {end['version']}")
        out: list[InputPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            out.extend(self._version_partitions(v))
        # keep the admission-control cursor honest under replay: the
        # engine re-plans the last checkpointed range on restart, and
        # BOTH bounds reveal its position (start == end == committed
        # for the clean-restart reconstruction), so ratchet on the max
        # — this is what guarantees the first paced latestOffset after
        # a restart never returns an offset behind the checkpoint.
        seen = max(int(start["version"]), int(end["version"]))
        if self._cursor is None or seen > self._cursor:
            self._cursor = seen
        return out

    def commit(self, end: dict) -> None:
        """Engine notification that everything through ``end`` is
        checkpoint-committed: ratchet the pacing cursor so a later
        ``latestOffset()`` can never return an offset behind the
        engine's own position."""
        self._tr(f"commit {end['version']}")
        v = int(end["version"])
        if self._cursor is None or v > self._cursor:
            self._cursor = v

    # -- column-mapping eras -------------------------------------------

    def _note_version(self, v: int, snap, prev) -> None:
        """Track full compacts committed AFTER the reader's anchor
        head: they start a new naming era (files materialized to
        then-logical names, mapping cleared), after which each
        version's OWN mapping is authoritative.

        Guard: if a column was RENAMED after the anchor and then
        compacted, the materialized file column matches neither the
        anchored stream-schema name nor the post-compact mapping —
        continuing would silently null-fill that column for every
        subsequent version. That is a non-additive schema change under
        the anchored schema, so it raises (Delta's behavior: the
        stream must be restarted to pick up the new schema); a
        post-anchor compact whose materialized names all still equal
        the anchored names stays transparent.

        Second guard: a post-anchor TYPE CHANGE on an anchored column
        (type widening: int→long / float→double) writes files the
        anchored schema cannot read safely — the executor-side arrow
        cast would silently NARROW fitting values and raise a raw
        ArrowInvalid on overflowing ones. Both are worse than
        stopping, so this raises the same restart-required error
        (Delta's non-additive schema-change behavior). Checked only
        when schema_json differs from the last verified one, so an
        unchanged schema costs one string compare per version."""
        if (
            v > self._ref_version
            and snap.schema_json != self._type_ok_json
        ):
            by_name = {
                f.name: f.dataType
                for f in StructType.fromJson(
                    json.loads(snap.schema_json)
                ).fields
            }
            changed = sorted(
                f"{f.name} ({f.dataType.simpleString()} -> "
                f"{by_name[f.name].simpleString()})"
                for f in self._schema.fields
                if f.name in by_name and by_name[f.name] != f.dataType
            )
            if changed:
                raise ChangeCommitError(
                    f"{SOURCE_NAME}: version {v} of {self._path} "
                    f"changed the type of anchored stream column(s) "
                    f"{changed} — e.g. type widening. Reading the "
                    "post-change files through the anchored schema "
                    "would silently narrow fitting values and fail "
                    "on overflowing ones. Restart the stream to "
                    "adopt the new schema."
                )
            self._type_ok_json = snap.schema_json
        if (
            v > self._ref_version
            and prev is not None
            and snap.op == "OPTIMIZE"
            and (snap.column_mapping or {}) != (prev.column_mapping or {})
        ):
            # pre-compact era: logical -> physical; invert to map the
            # anchored physical names onto the names the compact
            # materialized (its then-logical names)
            inv = {
                p: l for l, p in (prev.column_mapping or {}).items()
            }
            moved = sorted(
                f.name
                for f in self._schema.fields
                if inv.get(
                    self._ref_mapping.get(f.name, f.name),
                    self._ref_mapping.get(f.name, f.name),
                )
                != f.name
            )
            if moved:
                raise ChangeCommitError(
                    f"{SOURCE_NAME}: version {v} of {self._path} "
                    f"compacted a post-anchor column rename; column(s) "
                    f"{moved} of the anchored stream schema no longer "
                    "exist under their anchored names in the "
                    "materialized files. Restart the stream to adopt "
                    "the renamed schema."
                )
            self._post_ref_boundary = True

    def _mapping_for(self, v: int, snap) -> dict:
        """Logical (stream-schema) name -> PHYSICAL file column name
        for files referenced by version ``v``'s manifest.

        Physical names are immutable WITHIN a naming era, but a full
        ``compact()`` starts a new era: it materializes the then-
        logical names into fresh files and clears the mapping, while
        the pre-compact manifests (and their old-physical files)
        survive for replay. A single head-pinned mapping therefore
        null-fills renamed columns on a rename-then-compact replay,
        and a version's OWN mapping null-fills files written before a
        rename. The correct resolution composes across eras: start
        from the anchor head's mapping and, at every full-compact
        boundary in ``(v, head]``, translate through the pre-compact
        era's final mapping (whose keys are exactly the names the
        compact materialized). Boundary scan is lazy, one manifest
        read per history version at most once per reader — the same
        O(history) the replay's own planning pays.

        Known limit (documented, matches the head-pinned behavior this
        replaces): a RESTORE that jumps backward across a compact
        re-references files whose era no longer matches their version
        order; ``read()``'s logical-name fallback covers the
        materialized-name side of that edge."""
        if v >= self._ref_version:
            if self._post_ref_boundary:
                return dict(snap.column_mapping or {})
            return dict(self._ref_mapping)
        while self._down_scanned_to - 1 > v:
            c = self._down_scanned_to - 1
            sc = S.load_snapshot(self._path, c)
            try:
                pm = S.load_snapshot(self._path, c - 1)
            except (S.VacuumedVersionError, ValueError, FileNotFoundError):
                pm = None
            if (
                pm is not None
                and sc.op == "OPTIMIZE"
                and (sc.column_mapping or {})
                != (pm.column_mapping or {})
            ):
                self._down_boundaries.append(
                    (c, dict(pm.column_mapping or {}))
                )
            self._down_scanned_to = c
        era = min(
            (c for c, _ in self._down_boundaries if c > v), default=None
        )
        if era in self._eff_cache:
            return self._eff_cache[era]
        eff = {
            f.name: self._ref_mapping.get(f.name, f.name)
            for f in self._schema.fields
        }
        for c, pre in sorted(self._down_boundaries, reverse=True):
            if c > v:
                eff = {f: pre.get(p, p) for f, p in eff.items()}
        eff = {f: p for f, p in eff.items() if f != p}
        self._eff_cache[era] = eff
        return eff

    def _version_partitions(self, v: int) -> list[InputPartition]:
        snap = S.load_snapshot(self._path, v)
        try:
            prev = S.load_snapshot(self._path, v - 1)
        except (S.VacuumedVersionError, ValueError, FileNotFoundError):
            prev = None  # v is the stream's baseline snapshot
        self._note_version(v, snap, prev)
        if prev is None and snap.dv_dead and any(snap.dv_dead.values()):
            raise ChangeCommitError(
                f"{SOURCE_NAME}: baseline version {v} of "
                f"{self._path} carries deletion-vector tombstones; "
                "raw files would resurrect deleted rows. compact() "
                "the table or start from a later version."
            )
        if snap.op == "OPTIMIZE":
            return []  # rewrite of bytes, not rows (dataChange=false)
        dv_changed = prev is not None and (
            sorted(snap.dv_files or []) != sorted(prev.dv_files or [])
            or (snap.dv_dead or {}) != (prev.dv_dead or {})
        )
        if snap.part_entries is not None:
            # merge-committed table: partition entries are the
            # authority (`dirs` only names the newest commit dir).
            # Carried entries keep their immutable dir by reference,
            # so a same-parts entry with a DIFFERENT dir is a rewrite.
            cur = {tuple(e["parts"]): e for e in snap.part_entries}
            prev_map = (
                {tuple(e["parts"]): e for e in prev.part_entries}
                if prev is not None and prev.part_entries is not None
                else {}
            )
            added_entries = [
                e for k, e in sorted(cur.items()) if k not in prev_map
            ]
            rewritten = [
                k
                for k in cur
                if k in prev_map and cur[k]["dir"] != prev_map[k]["dir"]
            ]
            dropped = [k for k in prev_map if k not in cur]
            changed_detail = (
                f"rewrote {len(rewritten)} and dropped {len(dropped)} "
                "partition(s)"
                if (rewritten or dropped)
                else "grew deletion vectors"
            )
            if rewritten or dropped or dv_changed:
                if self._skip_change:
                    return []
                raise ChangeCommitError(
                    f"{SOURCE_NAME}: version {v} of {self._path} is a "
                    f"change commit (op={snap.op}): it {changed_detail}"
                    ". Restart with skip_change_commits=True to tail "
                    "inserts only, or consume snapshots.snapshot_diff "
                    "for the full change feed."
                )
            mapping = self._mapping_for(v, snap)
            pby = list(snap.partition_by or [])
            parts: list[InputPartition] = []
            for e in added_entries:
                hive = [
                    (c, None if raw == _HIVE_NULL else raw)
                    for c, raw in zip(pby, e["parts"])
                ]
                for fp in _parquet_files(e["dir"]):
                    parts.append(_FileSlice(fp, hive, mapping))
            return parts
        if prev is None:
            added = list(snap.dirs)
            removed: set = set()
        else:
            prev_dirs = set(prev.dirs)
            added = [d for d in snap.dirs if d not in prev_dirs]
            removed = prev_dirs - set(snap.dirs)
        if removed or dv_changed:
            if self._skip_change:
                return []
            raise ChangeCommitError(
                f"{SOURCE_NAME}: version {v} of {self._path} is a "
                f"change commit (op={snap.op}): it "
                + (
                    f"removed {len(removed)} data dir(s)"
                    if removed
                    else "grew deletion vectors"
                )
                + ". Restart with skip_change_commits=True to tail "
                "inserts only, or consume snapshots.snapshot_diff for "
                "the full change feed."
            )
        if not added:
            return []  # metadata-only commit
        mapping = self._mapping_for(v, snap)
        parts = []
        for d in added:
            for fp in _parquet_files(d):
                parts.append(
                    _FileSlice(
                        fp,
                        _hive_pairs_under(d, os.path.dirname(fp)),
                        mapping,
                    )
                )
        return parts

    # -- executor-side read -------------------------------------------

    def read(self, partition: InputPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        assert isinstance(partition, _FileSlice)
        target = to_arrow_schema(self._schema)
        tbl = pq.read_table(partition.file_path)
        hive = dict(partition.hive_pairs)
        n = tbl.num_rows
        cols = []
        for f, af in zip(self._schema.fields, target):
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
                val = _coerce_hive(
                    hive[f.name], f.dataType.simpleString()
                )
                col = pa.array([val] * n).cast(af.type)
            else:
                # a column this commit predates (schema evolution)
                col = pa.nulls(n, type=af.type)
            cols.append(col)
        out = pa.Table.from_arrays(cols, schema=target)
        yield from out.to_batches(max_chunksize=1 << 16)


class SnapshotTailDataSource(DataSource):
    """``spark.readStream.format("snapshot_tail").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                f"{SOURCE_NAME}: .option('path', <table dir>) is required"
            )
        snap = S.load_snapshot(path)
        # manifest schema fields are LOGICAL names (mapping only
        # redirects them to physical file columns)
        return StructType.fromJson(json.loads(snap.schema_json))

    def streamReader(self, schema: StructType) -> SnapshotTailReader:
        return SnapshotTailReader(schema, dict(self.options))


def register(spark: SparkSession) -> None:
    """Register the source under ``snapshot_tail`` (idempotent)."""
    spark.dataSource.register(SnapshotTailDataSource)


def read_table_stream(
    spark: SparkSession,
    path: str,
    starting_version: int | str | None = None,
    skip_change_commits: bool = False,
    max_versions_per_trigger: int | None = None,
    max_files_per_trigger: int | None = None,
    trace_file: str | None = None,
) -> DataFrame:
    """The one-call wrapper: a streaming DataFrame tailing ``path``."""
    register(spark)
    r = (
        spark.readStream.format(SOURCE_NAME)
        .option("path", path)
        .option("skipChangeCommits", str(skip_change_commits).lower())
    )
    if starting_version is not None:
        r = r.option("startingVersion", str(starting_version))
    if max_versions_per_trigger is not None:
        r = r.option("maxVersionsPerTrigger", str(max_versions_per_trigger))
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if trace_file is not None:
        r = r.option("traceFile", trace_file)
    return r.load()


def last_applied_tail_batch(dst_path: str) -> int:
    """Newest ``@tailbatch=N`` marker in the destination's commit log
    (−1 if none). Walk cost is bounded by ops since the last tail
    batch — 0 in steady state, where the marker IS the head."""
    try:
        vs = S._versions(dst_path)
    except FileNotFoundError:
        return -1
    for v in reversed(vs):
        op = S.load_snapshot(dst_path, v).op or ""
        if "@tailbatch=" in op:
            try:
                return int(op.rsplit("@tailbatch=", 1)[1])
            except ValueError:
                return -1
    return -1


def apply_tail_batch(
    spark: SparkSession,
    dst_path: str,
    batch_df: DataFrame,
    batch_id: int,
    transform=None,
) -> bool:
    """Idempotently publish one tailed micro-batch into ``dst_path``;
    True if a commit was published, False for an empty or replayed
    batch. The batch id rides the destination manifest's op string, so
    the dedup check and the data land in ONE atomic publish — a crash
    between sink commit and checkpoint advance replays into a no-op."""
    if batch_df.isEmpty():
        return False
    if batch_id <= last_applied_tail_batch(dst_path):
        return False  # replayed batch: already published atomically
    out = transform(batch_df) if transform is not None else batch_df
    try:
        exists = bool(S._versions(dst_path))
    except FileNotFoundError:
        exists = False
    S.commit(
        spark,
        out,
        dst_path,
        mode="append" if exists else "overwrite",
        op=f"APPEND@tailbatch={batch_id}",
    )
    return True


def stream_table_to_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint: str,
    transform=None,
    starting_version: int | str | None = "earliest",
    skip_change_commits: bool = False,
    max_versions_per_trigger: int | None = None,
    max_files_per_trigger: int | None = None,
    trigger: dict | None = None,
):
    """The medallion hop as one call: tail ``src_path``, apply
    ``transform(df) -> df`` (default: identity), append each micro-batch
    to the ``dst_path`` snapshot table — continuously, exactly-once.

    Exactly-once: the foreachBatch sink skips a replayed batch id. The
    last applied batch id is recorded IN the destination table's commit
    (a ``__tail_batch`` column would pollute the schema, so it rides the
    manifest op string: ``APPEND@tailbatch=N``) — after a crash between
    sink commit and checkpoint advance, the replayed batch sees its own
    id already published and becomes a no-op, the same idempotence
    contract `streaming/corpus.py` uses.

    Returns the StreamingQuery (caller owns awaitTermination/stop)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_tail_batch(spark, dst_path, batch_df, batch_id, transform)

    src = read_table_stream(
        spark,
        src_path,
        starting_version=starting_version,
        skip_change_commits=skip_change_commits,
        max_versions_per_trigger=max_versions_per_trigger,
        max_files_per_trigger=max_files_per_trigger,
    )
    w = src.writeStream.option("checkpointLocation", checkpoint).foreachBatch(
        _sink
    )
    w = w.trigger(**(trigger or {"availableNow": True}))
    return w.start()

"""Snapshot tables as a Structured Streaming SOURCE — the public
Delta-streaming-source contract on our manifest format, implemented
with PySpark 4's Python data source API (``pyspark.sql.datasource``).

A streaming query over a snapshot table sees, per micro-batch, exactly
the rows ADDED by the versions committed since its last offset:
offsets are version numbers (checkpointed by Spark, so a restarted
query resumes exactly where it stopped — versions are immutable, so
replanning a batch from its offset range is deterministic), and the
files of one batch are each version's manifest-diff against its
parent. Appends (and a clone's initial version) stream their new
files; any other commit that ADDS files — merge/delete/optimize/
update rewrote rows, an overwrite replaced them, a restore
resurrected them — raises by default — exactly Delta's "source table
was changed" error — or streams those files when ``ignore_changes``
is set (Delta's ``ignoreChanges``, re-emission documented). A table's
first version streams whatever operation created it.

Scale: the driver-side planner touches only MANIFESTS (KBs per
version); the data files are read by executors via Arrow record
batches, one task per file group. Rename chains
(``snapshot_rename_column``) are applied per file at read time: the
rename commit itself adds no files (the running stream sails past
it), and a RESTARTED stream resolves the new schema and still reads
pre-rename files through their chains. Files appended AFTER a rename
carry the new physical name, so a stream started before the rename
fails on them with a column error — the restart-on-schema-change
contract the public sources document.

The reference (`cl-data-frame.lisp:1-583`) has no I/O; Tier S
streaming x sources extension (SURVEY.md §2.2).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql.types import StructType

FORMAT_NAME = "cdf_snapshot"

#: operations whose manifest-diff files are pure row ADDITIONS
#: (clone: a cloned table's v1 is its initial data, nothing rewritten)
_APPEND_OPS = {"append", "clone"}


@dataclass
class _FilesPartition(InputPartition):
    table_dir: str
    files: list = field(default_factory=list)
    renames: list = field(default_factory=list)
    columns: list = field(default_factory=list)
    schema_json: str = ""


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._table_dir = options.get("path") or options.get("table_dir")
        if not self._table_dir:
            raise ValueError(
                "cdf_snapshot stream requires .option('path', table_dir)"
                " or .load(table_dir)")
        self._schema = schema
        self._ignore_changes = str(
            options.get("ignorechanges",
                        options.get("ignore_changes", "false"))
        ).lower() == "true"
        start = options.get("startingversion",
                            options.get("starting_version"))
        self._starting_version = int(start) if start is not None else 0
        # one Spark task per file by default; tune with maxFilesPerTask
        self._files_per_task = int(options.get("maxfilespertask", 1))
        # Delta's maxFilesPerTrigger-style admission control: cap how
        # many files one micro-batch admits (best effort — a single
        # version bigger than the cap is still admitted whole so the
        # stream always progresses; a post-restart first trigger may
        # overshoot since planning state is rebuilt from the offset)
        mf = options.get("maxfilesperbatch",
                         options.get("max_files_per_batch"))
        self._max_files = int(mf) if mf is not None else None
        self._last_planned: int | None = None
        self._last_emitted: int | None = None

    # -- offset planning (driver, manifest metadata only) --------------
    def initialOffset(self) -> dict:
        # versions <= startingVersion-1 are considered consumed; the
        # default 0 streams the table from its first commit. Spark
        # calls this ONLY for a fresh query (a restart resumes from
        # the checkpoint), so it doubles as the pacing base signal:
        # a fresh stream rate-limits from here, a restarted one
        # admits everything on its first trigger (see latestOffset)
        return {"version": self._starting_version - 1
                if self._starting_version > 0 else 0}

    def latestOffset(self) -> dict:
        from cl_data_frame_spark.sources.snapshots import (
            _latest_version, _read_manifest)
        latest = _latest_version(self._table_dir) or 0
        if self._max_files is None:
            return {"version": latest}
        known = [v for v in (self._last_planned,
                             self._last_emitted) if v is not None]
        if not known:
            # first trigger on this reader instance: the consumed
            # offset lives in Spark's checkpoint and is unknown here,
            # so admit everything — capping from a guess could hand
            # Spark an offset BEHIND the checkpoint, and a regressed
            # offset re-emits consumed versions into the sink. Pacing
            # therefore applies from the SECOND trigger on (the
            # initial backfill arrives in one batch — the documented
            # divergence from Delta: safety over pacing).
            self._last_emitted = latest
            return {"version": latest}
        base = max(known)
        if latest <= base:
            return {"version": latest}
        total, end = 0, base
        for v in range(base + 1, latest + 1):
            m = _read_manifest(self._table_dir, v)
            parent = m.get("parent")
            pfiles = set(
                _read_manifest(self._table_dir, parent)["files"]
            ) if parent is not None else set()
            n_new = sum(1 for f in m["files"] if f not in pfiles)
            if total and total + n_new > self._max_files:
                break
            total += n_new
            end = v
            if total >= self._max_files:
                break
        self._last_emitted = max(self._last_emitted or 0, end)
        return {"version": end}

    def partitions(self, start: dict, end: dict):
        from cl_data_frame_spark.sources.snapshots import _read_manifest
        sv, ev = int(start["version"]), int(end["version"])
        self._last_planned = max(self._last_planned or 0, ev)
        added: list[str] = []
        renames_map: dict = {}
        for v in range(sv + 1, ev + 1):
            m = _read_manifest(self._table_dir, v)
            op = m.get("operation", "append")
            parent = m.get("parent")
            pfiles = set(
                _read_manifest(self._table_dir, parent)["files"]
            ) if parent is not None else set()
            new = [f for f in m["files"] if f not in pfiles]
            # a table's FIRST version is its initial data whatever
            # operation created it (an initial overwrite/clone is not
            # a change); after that, ANY non-append commit that adds
            # files changed the table: an overwrite replaced rows, a
            # restore resurrected them, merge/delete/optimize/update
            # rewrote them — streaming those files would emit rows the
            # sink already holds, so Delta's contract is to fail
            initial = parent is None
            if (op not in _APPEND_OPS and not initial and new
                    and not self._ignore_changes):
                raise RuntimeError(
                    f"snapshot stream source: version {v} is a "
                    f"{op!r} commit that rewrote, replaced, or "
                    "resurrected files; streaming them would re-emit "
                    "rows the sink already received. Pass "
                    ".option('ignoreChanges', 'true') to stream them "
                    "anyway (downstream dedup required), or start a "
                    "fresh stream.")
            added.extend(new)
            renames_map.update(m.get("renamed_files") or {})
        if not added:
            return []
        cols = [f.name for f in self._schema.fields]
        n = self._files_per_task
        parts = []
        for i in range(0, len(added), n):
            chunk = added[i:i + n]
            parts.append(_FilesPartition(
                table_dir=self._table_dir, files=chunk,
                renames=[renames_map.get(f) or [] for f in chunk],
                columns=cols, schema_json=self._schema.json()))
        return parts

    # -- executor-side read (Arrow batches) ----------------------------
    def read(self, partition: _FilesPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        schema = StructType.fromJson(json.loads(partition.schema_json))
        for f, chain in zip(partition.files, partition.renames):
            path = os.path.join(partition.table_dir, f)
            tbl = pq.read_table(path)
            for old, new in chain:
                if old in tbl.column_names:
                    tbl = tbl.rename_columns(
                        [new if c == old else c
                         for c in tbl.column_names])
            # columns this file's era predates surface as typed NULLs
            # (merge-schema evolution), mirroring the batch reader
            for name in partition.columns:
                if name not in tbl.column_names:
                    tbl = tbl.append_column(
                        name, pa.nulls(tbl.num_rows,
                                       type=to_arrow_type(
                                           schema[name].dataType)))
            tbl = tbl.select(partition.columns)
            yield from tbl.to_batches()

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class SnapshotStreamDataSource(DataSource):
    """``spark.readStream.format('cdf_snapshot').load(table_dir)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        from cl_data_frame_spark.sources.snapshots import (
            _latest_version, _read_manifest)
        table_dir = self.options.get("path") \
            or self.options.get("table_dir")
        if not table_dir:
            raise ValueError(
                "cdf_snapshot requires .option('path', table_dir) or "
                ".load(table_dir)")
        v = _latest_version(table_dir)
        if v is None:
            raise FileNotFoundError(
                f"no snapshot versions in {table_dir}")
        st = StructType.fromJson(
            json.loads(_read_manifest(table_dir, v)["schema"]))
        # every field nullable: files from eras predating a
        # merge-schema-added column surface NULLs for it by design,
        # even when the adding batch recorded the field non-nullable
        from pyspark.sql.types import StructField
        return StructType([StructField(f.name, f.dataType, True,
                                       f.metadata)
                           for f in st.fields])

    def streamReader(self, schema: StructType):
        return SnapshotStreamReader(schema, dict(self.options))


def register_snapshot_source(spark: SparkSession) -> None:
    """Idempent registration of the ``cdf_snapshot`` format."""
    spark.dataSource.register(SnapshotStreamDataSource)


def read_stream_snapshot(spark: SparkSession, table_dir: str,
                         ignore_changes: bool = False,
                         starting_version: int | None = None):
    """Convenience wrapper: register the source and open the stream."""
    register_snapshot_source(spark)
    reader = (spark.readStream.format(FORMAT_NAME)
              .option("path", table_dir)
              .option("ignoreChanges", str(ignore_changes).lower()))
    if starting_version is not None:
        reader = reader.option("startingVersion", str(starting_version))
    return reader.load()

"""SnapshotStore — versioned, time-travelable tables on plain parquet.

TableIO (io/tables.py) gives the pipeline Iceberg MERGE semantics but
keeps exactly one live version per table: every commit physically
replaces the previous files. Real Iceberg keeps the previous versions
too — snapshot isolation, time travel, rollback, snapshot expiry, and
data-file compaction are the operational half of "partitioned Iceberg
node/edge tables" a production deployment leans on (audit "what did
the graph say last Tuesday", undo a bad ingest batch, bound storage
growth, fix small-file buildup). This module reproduces that half on
parquet directories with the same single-writer discipline as the
reference's episodic ingest (graphiti_core/graphiti.py add_episode —
one writer, many readers):

layout::

    <root>/<table>/
        data files (uuid-named; hive ``part=<v>/`` subdirs when
        partitioned) — IMMUTABLE once written, never edited in place
        _manifests/v{N}.json — the file list + schema of version N

commit protocol (crash-consistent, the Iceberg commit point moved to
a single ``os.replace``):

1. write the new data files into the table dir under names no prior
   manifest references (staging dir → move);
2. atomically publish ``_manifests/v{N}.json`` (tmp + ``os.replace``).

A crash between 1 and 2 leaves ORPHAN files that no manifest names:
readers never observe them (reads resolve strictly through a
manifest's file list) and ``expire_snapshots`` sweeps them. The
current version is simply the largest N present — there is no
separate HEAD pointer to corrupt.

Reads pass the manifest's explicit file list to the parquet reader
with ``basePath`` pinned to the table dir, so hive partition columns
survive file-list reads and Catalyst still partition-prunes on them.

Scale notes: manifests store file PATHS, not row data — a manifest is
O(#files) bytes and a commit is O(files-in-batch) renames, matching
Iceberg's metadata-scaling story. Compaction (``compact``) is the
standard small-file rewrite: read current → coalesce → commit as a
full replacement whose rows are byte-identical, so time travel to the
pre-compaction version still works until expired.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["SnapshotStore"]

_MANIFEST_DIR = "_manifests"


def _unescape_path_name(s: str) -> str:
    """Invert Spark's hive partition-path escaping (percent-encoded
    ``%XX`` for ':' '/' '%' control chars etc. —
    ExternalCatalogUtils.unescapePathName): decoding the directory
    name Spark actually wrote is drift-proof, where re-implementing
    the ESCAPE char set here could silently diverge from the engine."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%" and i + 3 <= len(s):
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------------
    # paths + manifest plumbing
    # ------------------------------------------------------------------

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _mdir(self, name: str) -> str:
        return os.path.join(self.path(name), _MANIFEST_DIR)

    def versions(self, name: str) -> list[int]:
        d = self._mdir(name)
        if not os.path.isdir(d):
            return []
        out = []
        for f in os.listdir(d):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def current_version(self, name: str) -> int | None:
        vs = self.versions(name)
        return vs[-1] if vs else None

    def _manifest(self, name: str, version: int) -> dict:
        with open(os.path.join(self._mdir(name), f"v{version}.json")) as fh:
            return json.load(fh)

    def _publish(self, name: str, manifest: dict) -> int:
        """The commit point: write the manifest to a tmp file, then
        os.replace it into place — readers see the old version or the
        new one, never a torn state."""
        d = self._mdir(name)
        os.makedirs(d, exist_ok=True)
        v = manifest["version"]
        tmp = os.path.join(d, f".tmp-{_uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(d, f"v{v}.json"))
        return v

    def _stage_files(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None,
    ) -> list[str]:
        """Write df's files into the table dir under fresh uuid names
        (inside their hive partition subdirs when partitioned); return
        the table-relative paths. No manifest is touched — an
        interrupted stage leaves only invisible orphans."""
        final = self.path(name)
        os.makedirs(final, exist_ok=True)
        staging = final + ".staging-" + _uuid.uuid4().hex[:8]
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        moved: list[str] = []
        tag = _uuid.uuid4().hex[:8]
        for dirpath, _dirs, files in os.walk(staging):
            rel = os.path.relpath(dirpath, staging)
            for f in files:
                if not f.endswith(".parquet") or f.startswith((".", "_")):
                    continue
                sub = "" if rel == "." else rel
                os.makedirs(os.path.join(final, sub), exist_ok=True)
                newname = f"{tag}-{f}"
                relpath = os.path.join(sub, newname) if sub else newname
                os.rename(
                    os.path.join(dirpath, f), os.path.join(final, relpath)
                )
                moved.append(relpath)
        shutil.rmtree(staging, ignore_errors=True)
        return sorted(moved)

    def _next_manifest(
        self,
        name: str,
        files: list[str],
        df: DataFrame,
        operation: str,
        partition_by: list[str] | None,
    ) -> dict:
        cur = self.current_version(name)
        # the replay guard is MONOTONE: every manifest carries the full
        # set of committed batch ids so far, so committed_batch_ids is
        # one read of the newest manifest and survives compaction,
        # rollback, and snapshot expiry
        prior_ids = (
            self._manifest(name, cur).get("batch_ids", []) if cur is not None else []
        )
        return {
            "version": (cur or 0) + 1 if cur is not None else 1,
            "parent": cur,
            "operation": operation,
            "ts": time.time(),
            "schema": df.schema.json(),
            "partition_by": partition_by or [],
            "files": files,
            "batch_ids": prior_ids,
        }

    # ------------------------------------------------------------------
    # commits
    # ------------------------------------------------------------------

    def commit_overwrite(
        self, name: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> int:
        """Full-table replacement as a new snapshot (prior versions
        stay readable until expired)."""
        files = self._stage_files(name, df, partition_by)
        return self._publish(
            name, self._next_manifest(name, files, df, "overwrite", partition_by)
        )

    def commit_append(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        batch_id: int | None = None,
    ) -> int | None:
        """Iceberg fast-append: the new snapshot = parent's files plus
        the batch's files; nothing is rewritten.

        ``batch_id`` makes the append TRANSACTIONALLY idempotent for
        streaming sinks: if any surviving manifest already carries this
        batch_id the call is a no-op returning None — so foreachBatch
        re-delivery after a crash (at-least-once) lands exactly once
        even for pure append tables where keyed merges can't dedupe.
        Structured Streaming only ever re-delivers the most recent
        uncommitted batch, so the guard holds as long as snapshot
        expiry keeps ≥ 1 manifest (it always does)."""
        if batch_id is not None and batch_id in self.committed_batch_ids(name):
            return None
        cur = self.current_version(name)
        prior = self._manifest(name, cur)["files"] if cur is not None else []
        files = self._stage_files(name, df, partition_by)
        m = self._next_manifest(
            name, sorted(prior + files), df, "append", partition_by
        )
        if batch_id is not None:
            m["batch_ids"] = sorted(set(m["batch_ids"]) | {batch_id})
        return self._publish(name, m)

    def committed_batch_ids(self, name: str) -> set[int]:
        """The streaming sink's replay guard: one read of the NEWEST
        manifest — every manifest carries the cumulative batch-id set,
        so the guard is O(1) per commit and survives compaction,
        rollback, and snapshot expiry."""
        cur = self.current_version(name)
        if cur is None:
            return set()
        return set(self._manifest(name, cur).get("batch_ids", []))

    def commit_overwrite_partitions(
        self,
        name: str,
        df: DataFrame,
        partition_col: str,
        parts: list | None = None,
    ) -> int:
        """Partition-level replacement in ONE atomic snapshot (the
        TableIO.overwrite_partitions semantics, minus its cross-
        partition non-atomicity caveat — here the manifest swap IS
        atomic across partitions): every partition present in ``df``
        PLUS every partition named in ``parts`` gets df's content
        (a part in ``parts`` with no rows in ``df`` becomes empty);
        every other partition keeps the parent's files."""
        cur = self.current_version(name)
        prior_m = self._manifest(name, cur) if cur is not None else None
        if prior_m is not None and prior_m["partition_by"] != [partition_col]:
            # a parent committed unpartitioned (or on another column)
            # has root-level / differently-named files no part= filter
            # can replace — keeping them would silently duplicate rows
            raise ValueError(
                f"snapshot {name!r} is partitioned by "
                f"{prior_m['partition_by']!r}; overwrite_partitions on "
                f"[{partition_col!r}] would keep the parent's files "
                "alongside the replacement. Re-commit the table "
                "partitioned by the same column first."
            )
        files = self._stage_files(name, df, [partition_col])
        prefix = partition_col + "="
        written_parts = {f.split(os.sep, 1)[0] for f in files}
        # every partition the batch WROTE is replaced too (TableIO.
        # overwrite_partitions swaps expected|written) — otherwise a df
        # carrying rows for a partition not named in ``parts`` would add
        # its new files while the parent's files for that partition
        # survive, duplicating those rows. Named ``parts`` are matched
        # by UNESCAPING the hive directory names Spark wrote (Spark
        # percent-escapes ':' '/' '%' etc. in partition values) rather
        # than interpolating f"part={p}" — a raw-value comparison would
        # silently miss any value Spark escaped and keep stale rows.
        want = {str(p) for p in parts} if parts is not None else set()
        prior = prior_m["files"] if prior_m is not None else []
        kept = []
        for f in prior:
            d = f.split(os.sep, 1)[0]
            if d in written_parts:
                continue
            if d.startswith(prefix) and _unescape_path_name(d[len(prefix):]) in want:
                continue
            kept.append(f)
        m = self._next_manifest(
            name, sorted(kept + files), df, "overwrite_partitions", [partition_col]
        )
        return self._publish(name, m)

    # ------------------------------------------------------------------
    # reads + history
    # ------------------------------------------------------------------

    def read(
        self, name: str, version: int | None = None, merge_schema: bool = False
    ) -> DataFrame:
        """Read a snapshot (default: current). Resolves strictly
        through the manifest's file list — orphans from interrupted
        commits are invisible by construction.

        ``merge_schema=True`` enables Iceberg-style schema evolution
        on read: a snapshot whose appends carry ADDED columns unions
        the footer schemas (older files surface NULL for columns they
        predate) instead of sampling one file's schema."""
        v = self.current_version(name) if version is None else version
        if v is None or v not in self.versions(name):
            raise ValueError(f"{name}: no such snapshot version {version!r}")
        m = self._manifest(name, v)
        base = self.path(name)
        if not m["files"]:
            schema = StructType.fromJson(json.loads(m["schema"]))
            return self.spark.createDataFrame([], schema)
        r = self.spark.read.option("basePath", base)
        if merge_schema:
            r = r.option("mergeSchema", "true")
        return r.parquet(*[os.path.join(base, f) for f in m["files"]])

    def read_as_of(self, name: str, ts: float) -> DataFrame:
        """Time travel by wall clock: the latest snapshot committed at
        or before ``ts``."""
        vs = [v for v in self.versions(name) if self._manifest(name, v)["ts"] <= ts]
        if not vs:
            raise ValueError(f"{name}: no snapshot at or before {ts}")
        return self.read(name, vs[-1])

    def history(self, name: str) -> list[dict]:
        """Snapshot log, oldest first: version, parent, operation, ts,
        file count (the Iceberg ``table.history()`` analogue)."""
        out = []
        for v in self.versions(name):
            m = self._manifest(name, v)
            out.append(
                {
                    "version": m["version"],
                    "parent": m["parent"],
                    "operation": m["operation"],
                    "ts": m["ts"],
                    "n_files": len(m["files"]),
                }
            )
        return out

    # ------------------------------------------------------------------
    # rollback / expiry / compaction
    # ------------------------------------------------------------------

    def rollback(self, name: str, version: int) -> int:
        """Publish a NEW snapshot whose content is exactly ``version``'s
        (roll-forward undo, like Iceberg rollback: history is never
        rewritten, so the bad version stays auditable until expired)."""
        if version not in self.versions(name):
            raise ValueError(f"{name}: no such snapshot version {version}")
        src = self._manifest(name, version)
        cur = self.current_version(name)
        m = {
            "version": cur + 1,
            "parent": cur,
            "operation": f"rollback_to_v{version}",
            "ts": time.time(),
            "schema": src["schema"],
            "partition_by": src["partition_by"],
            "files": src["files"],
            # replay guard stays monotone: ids come from the HEAD being
            # rolled away from, not the older content — a replayed batch
            # whose rows were undone must still be recognized, or it
            # would re-append into the rolled-back table
            "batch_ids": self._manifest(name, cur).get("batch_ids", []),
        }
        return self._publish(name, m)

    def expire_snapshots(self, name: str, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` manifests, then delete
        every data file no surviving manifest references — including
        orphans from interrupted commits. Returns counts. The only
        operation that deletes data, and it never touches a file a
        live snapshot can still resolve."""
        vs = self.versions(name)
        keep = set(vs[-max(keep_last, 1):])
        live: set[str] = set()
        for v in keep:
            live.update(self._manifest(name, v)["files"])
        n_manifests = 0
        for v in vs:
            if v not in keep:
                os.remove(os.path.join(self._mdir(name), f"v{v}.json"))
                n_manifests += 1
        base = self.path(name)
        n_files = 0
        for dirpath, _dirs, files in os.walk(base):
            if os.path.basename(dirpath) == _MANIFEST_DIR:
                continue
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, f), base)
                if rel not in live:
                    os.remove(os.path.join(dirpath, f))
                    n_files += 1
        # prune now-empty partition dirs
        for dirpath, dirs, files in os.walk(base, topdown=False):
            if dirpath != base and not dirs and not files:
                os.rmdir(dirpath)
        # sweep staging dirs abandoned by crashes DURING _stage_files
        # (siblings of the table dir, never reachable from a manifest).
        # Reported under their own keys — a swept dir may hold many
        # files, so folding "1 per dir" into deleted_files would
        # under-count (and conflate) the space actually reclaimed.
        n_staging_dirs = 0
        n_staging_files = 0
        for d in os.listdir(self.root):
            if d.startswith(f"{name}.staging-"):
                path = os.path.join(self.root, d)
                n_staging_files += sum(
                    len(fs) for _, _, fs in os.walk(path)
                )
                shutil.rmtree(path, ignore_errors=True)
                n_staging_dirs += 1
        return {
            "expired_manifests": n_manifests,
            "deleted_files": n_files,
            "swept_staging_dirs": n_staging_dirs,
            "swept_staging_files": n_staging_files,
        }

    def compact(self, name: str, target_files: int = 1) -> int:
        """Small-file compaction: rewrite the current snapshot's rows
        into ``target_files`` files and commit the result as a full
        replacement. Row content is unchanged (byte-equal read), so
        the pre-compaction snapshot remains time-travelable until
        expired."""
        m = self._manifest(name, self.current_version(name))
        df = self.read(name).coalesce(max(target_files, 1))
        pb = m["partition_by"] or None
        files = self._stage_files(name, df, pb)
        nm = self._next_manifest(name, files, df, "compact", pb)
        return self._publish(name, nm)

"""Manifest-committed parquet table — atomic commits over plain files.

Round 1 committed data with directory renames (retention/compaction
swap) plus a separate seq-state JSON. That leaves three holes the
round-1 review called out:

1. a reader listing a partition dir mid-swap can transiently fail
   (the reference never breaks readers — SQLite MVCC, logger.rs:314-318);
2. a crash between the parquet append and the state save replays the
   batch → duplicate rows (plain append + separate JSON is
   at-least-once, not the exactly-once the reference gets from
   BEGIN/END TRANSACTION, logger.rs:155-219);
3. compaction's listing→rename window silently discards files a
   concurrent streaming append lands in the same partition.

One mechanism closes all three: the table's live file set and the
ingest state are ONE versioned manifest, committed by atomic rename.
This is the commit protocol of Delta Lake / Apache Iceberg in
miniature (public designs; see PAPERS.md) — at production scale you'd
adopt one of those formats wholesale; the point here is that the
engine's semantics are already shaped for it.

Layout::

    table/
      _manifests/00000001.json ...   # versioned snapshots
      _current                        # text: latest generation number
      _commit.lock                    # O_EXCL writer lock (single node)
      _staging/<uuid>/...             # writer scratch, never read
      container_id=<c>/date=<d>/*.parquet   # data files (immutable)

Manifest::

    {"generation": N,
     "files": [relative paths...],          # THE live file set
     "batch_ids": {scope: last_committed},  # exactly-once per stream
     "high_water": {container: max_seq},    # ROWID parity state
     "last_file": {container: spool_name}}  # spool replay watermark

Invariants:
- Data files are immutable once referenced; removal = dropping the
  reference. Physical deletion happens only in :meth:`gc`, which keeps
  every file referenced by the last ``keep_generations`` manifests —
  an in-flight reader holding a recent snapshot never 404s.
- Commits serialize on the lock and re-apply against the *latest*
  manifest, so a maintenance rewrite commits "snapshot minus rewritten
  plus replacement" and preserves files appended concurrently.
- Readers never list directories: they read ``_current`` → manifest →
  explicit file list. A torn commit is impossible to observe (rename
  is atomic; a crashed commit leaves only unreferenced staging files).

Scale note (100 TB): one JSON manifest listing ~10^6 files is the real
bottleneck this design hits at cluster scale — the production answer
is Delta/Iceberg (chunked manifests + log compaction), which this
module's API maps onto 1:1 (commit_append → AddFile txn,
commit_replace → OPTIMIZE/DELETE txn, gc → VACUUM).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from logsqlite_spark.schema import LOGS_SCHEMA

_LOCK_STALE_S = 300.0


class CommitConflict(RuntimeError):
    """change_fn declined the commit (e.g. replayed batch id)."""


class ManifestTable:
    def __init__(self, table_dir: str):
        self.dir = Path(table_dir)
        self.manifests = self.dir / "_manifests"
        self.current_ptr = self.dir / "_current"
        self.lock_path = self.dir / "_commit.lock"
        self.staging_root = self.dir / "_staging"

    # -- snapshot access ------------------------------------------------------

    def exists(self) -> bool:
        return self.current_ptr.exists()

    def manifest(self) -> dict:
        """Latest committed snapshot (empty table if none)."""
        if not self.current_ptr.exists():
            return {"generation": 0, "files": [], "batch_ids": {},
                    "high_water": {}, "last_file": {}}
        gen = int(self.current_ptr.read_text().strip())
        return json.loads((self.manifests / f"{gen:08d}.json").read_text())

    def import_existing(self) -> dict:
        """Adopt a plain partitioned-parquet tree written out-of-band:
        build generation 1 from a one-time directory listing. After
        this, all reads/commits go through the manifest. No-op when a
        manifest already exists."""
        if self.exists():
            return self.manifest()
        if not self.dir.exists():
            return self.manifest()
        found = sorted(
            str(f.relative_to(self.dir)) for f in self.dir.rglob("*.parquet")
            if f.relative_to(self.dir).parts[0] not in ("_staging", "_manifests")
        )
        if not found:
            return self.manifest()

        def change(m: dict) -> dict:
            m["files"] = m["files"] + [f for f in found if f not in set(m["files"])]
            return m

        return self.commit(change)

    def generations(self) -> list[int]:
        """Snapshots still readable (``gc`` keeps the newest
        ``keep_generations`` manifests and every file they reference)."""
        if not self.manifests.exists():
            return []
        return sorted(int(p.stem) for p in self.manifests.glob("*.json"))

    def manifest_at(self, generation: int) -> dict:
        """Time travel: the table snapshot as of ``generation`` —
        pass it to :meth:`read_df` to query the table as it was before
        any later retention / compaction / erasure commit. Valid while
        the generation is inside the ``gc`` retention window
        (``FileNotFoundError`` after); note the compliance corollary:
        an erasure (``erase_matching``) is only physically complete
        once ``gc`` has aged the pre-erasure snapshots out."""
        p = self.manifests / f"{generation:08d}.json"
        return json.loads(p.read_text())

    def data_files(self, manifest: dict | None = None) -> list[str]:
        m = manifest or self.manifest()
        return [str(self.dir / f) for f in m["files"]]

    def read_df(self, spark: SparkSession,
                manifest: dict | None = None) -> DataFrame:
        """Snapshot-consistent DataFrame over the live file set.

        No directory listing — maintenance rewrites can never produce
        reader FileNotFound. Partition columns come from the paths via
        basePath, same physical layout as a plain partitioned write.
        """
        files = self.data_files(manifest)
        if not files:
            return spark.createDataFrame([], LOGS_SCHEMA)
        return (spark.read.option("basePath", str(self.dir)).parquet(*files))

    # -- commit protocol ------------------------------------------------------

    def _acquire_lock(self, timeout_s: float = 60.0) -> None:
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return
            except FileExistsError:
                try:
                    age = time.time() - self.lock_path.stat().st_mtime
                    if age > _LOCK_STALE_S:  # crashed holder
                        self.lock_path.unlink(missing_ok=True)
                        continue
                except FileNotFoundError:
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(f"commit lock busy: {self.lock_path}")
                time.sleep(0.05)

    def _release_lock(self) -> None:
        self.lock_path.unlink(missing_ok=True)

    def commit(self, change_fn: Callable[[dict], dict]) -> dict:
        """Serialize: lock → re-read latest → change_fn → publish.

        ``change_fn`` receives the freshest manifest (NOT the caller's
        snapshot) and returns the next one; raise :class:`CommitConflict`
        inside it to abort (e.g. batch already committed by a replay).
        """
        self.dir.mkdir(parents=True, exist_ok=True)
        self.manifests.mkdir(exist_ok=True)
        self._acquire_lock()
        try:
            cur = self.manifest()
            new = change_fn(dict(cur))
            new["generation"] = cur["generation"] + 1
            new["committed_at"] = time.time()
            target = self.manifests / f"{new['generation']:08d}.json"
            tmp = target.with_suffix(".tmp")
            tmp.write_text(json.dumps(new))
            os.rename(tmp, target)
            ptr_tmp = self.current_ptr.with_suffix(".tmp")
            ptr_tmp.write_text(str(new["generation"]))
            os.rename(ptr_tmp, self.current_ptr)  # THE commit point
            return new
        finally:
            self._release_lock()

    # -- writer helpers -------------------------------------------------------

    def new_staging_dir(self) -> Path:
        d = self.staging_root / uuid.uuid4().hex
        d.mkdir(parents=True, exist_ok=True)
        return d

    def adopt_staged(self, staging_dir: Path) -> list[str]:
        """Move a partitioned spark write's files into the live tree.

        Files keep their partition subpaths; names are already unique
        (spark part-<task>-<uuid>). The moved files stay *unreferenced*
        (invisible, GC-able) until a subsequent :meth:`commit` lists
        them — adoption is not publication.
        """
        moved: list[str] = []
        for f in sorted(staging_dir.rglob("*.parquet")):
            rel = f.relative_to(staging_dir)
            dest = self.dir / rel
            dest.parent.mkdir(parents=True, exist_ok=True)
            os.rename(f, dest)
            moved.append(str(rel))
        import shutil

        shutil.rmtree(staging_dir, ignore_errors=True)
        return moved

    def commit_append(self, new_files: list[str], scope: str, batch_id: int | None,
                      seq_increments: dict[str, int],
                      last_files: dict[str, str]) -> dict | None:
        """Exactly-once append: data files + seq/batch state in ONE
        atomic commit (the transactionality the reference gets from
        SQLite transactions). Returns None when the batch was already
        committed (crash replay)."""

        def change(m: dict) -> dict:
            if batch_id is not None and batch_id <= m["batch_ids"].get(scope, -1):
                raise CommitConflict(f"batch {batch_id} already committed")
            m["files"] = m["files"] + new_files
            if batch_id is not None:
                m["batch_ids"] = {**m["batch_ids"], scope: batch_id}
            hw = dict(m["high_water"])
            for cid, inc in seq_increments.items():
                hw[cid] = hw.get(cid, 0) + inc
            m["high_water"] = hw
            m["last_file"] = {**m["last_file"], **last_files}
            return m

        try:
            return self.commit(change)
        except CommitConflict:
            return None

    def commit_replace(self, remove_files: list[str],
                       new_files: list[str]) -> dict:
        """Maintenance commit (retention / compaction): swap a rewritten
        file set. Applied against the freshest manifest, so files
        appended between the writer's snapshot and this commit are
        preserved — the round-1 compaction lost-append race is
        structurally impossible."""
        remove = set(remove_files)

        def change(m: dict) -> dict:
            m["files"] = [f for f in m["files"] if f not in remove] + new_files
            return m

        return self.commit(change)

    def update_state(self, **updates) -> dict:
        """State-only commit (e.g. spool watermark bump with no rows)."""

        def change(m: dict) -> dict:
            for key, val in updates.items():
                m[key] = {**m.get(key, {}), **val}
            return m

        return self.commit(change)

    # -- maintenance ----------------------------------------------------------

    def gc(self, keep_generations: int = 2, grace_s: float = 0.0) -> dict:
        """Physically delete files no recent snapshot references.

        Keeps every file referenced by the newest ``keep_generations``
        manifests, so readers holding those snapshots stay valid;
        ``grace_s`` additionally spares anything recently modified
        (in-flight adoptions). Run on the cleaner cadence.
        """
        if not self.current_ptr.exists():
            return {"deleted_files": 0, "deleted_manifests": 0}
        gen = int(self.current_ptr.read_text().strip())
        keep_from = max(1, gen - keep_generations + 1)
        referenced: set[str] = set()
        deleted_manifests = 0
        for mf in sorted(self.manifests.glob("*.json")):
            g = int(mf.stem)
            if g >= keep_from:
                referenced.update(json.loads(mf.read_text())["files"])
            else:
                mf.unlink()
                deleted_manifests += 1
        now = time.time()
        deleted = 0
        for f in self.dir.rglob("*.parquet"):
            rel = str(f.relative_to(self.dir))
            if rel.startswith("_staging/") or rel in referenced:
                continue
            if now - f.stat().st_mtime < grace_s:
                continue
            f.unlink()
            deleted += 1
        # empty partition dirs + stale staging
        for d in sorted((p for p in self.dir.rglob("*") if p.is_dir()),
                        reverse=True):
            rel = d.relative_to(self.dir)
            if rel.parts and rel.parts[0] in ("_manifests", "_staging"):
                continue
            try:
                d.rmdir()  # only succeeds when empty
            except OSError:
                pass
        if self.staging_root.exists():
            for d in self.staging_root.iterdir():
                if now - d.stat().st_mtime > max(grace_s, 3600.0):
                    import shutil

                    shutil.rmtree(d, ignore_errors=True)
        return {"deleted_files": deleted, "deleted_manifests": deleted_manifests}

    def drop_container(self, container_id: str) -> int:
        """delete_when_stopped parity (statehandler.rs:176-181): drop
        every reference to the container's files; space returns on the
        next :meth:`gc`."""
        prefix = f"container_id={container_id}/"

        def change(m: dict) -> dict:
            m["files"] = [f for f in m["files"] if not f.startswith(prefix)]
            m["high_water"] = {k: v for k, v in m["high_water"].items()
                               if k != container_id}
            m["last_file"] = {k: v for k, v in m["last_file"].items()
                              if k != container_id}
            return m

        before = len(self.manifest()["files"])
        after = len(self.commit(change)["files"])
        return before - after

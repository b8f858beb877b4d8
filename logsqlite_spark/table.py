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

Scale note (100 TB): since round 12 the file list is CHUNKED — the
Delta/Iceberg answer (manifest lists + log compaction) applied to this
protocol. The head manifest stores ``file_chunks`` (names of immutable
chunk JSONs under ``_manifests/chunks/``) instead of the inline list;
a pure append WRITES one new chunk (the batch's files) plus an
O(#chunks)-sized head, never re-serializing the table's full file
list, and a replace rewrites only the chunks it touches. When the
chunk count passes ``_CHUNK_COMPACT_AT`` the commit squashes them to
``_CHUNK_TARGET``-sized chunks — amortized log compaction. Chunks are
immutable and content-cached; ``gc`` deletes chunks no kept head
references. Pre-round-12 heads (inline ``files``) read and upgrade
transparently on their next commit. The public surface is unchanged:
``manifest()`` returns the MATERIALIZED dict (with ``files``), and
``commit(change_fn)`` still hands change_fn the full list — only the
persistence is chunked (commit_append → AddFile txn, commit_replace →
OPTIMIZE/DELETE txn, gc → VACUUM).
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

# chunked-manifest knobs: squash when a head references more than
# _CHUNK_COMPACT_AT chunks, into _CHUNK_TARGET-file chunks.  Chunk
# JSONs are immutable, so a small process-wide content cache makes
# repeated manifest() materialization cheap (ingest reads the
# manifest at every micro-batch).
_CHUNK_COMPACT_AT = 64
_CHUNK_TARGET = 10_000
_CHUNK_CACHE: dict[str, list[str]] = {}
_CHUNK_CACHE_MAX = 512


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

    def _chunks_dir(self) -> Path:
        return self.manifests / "chunks"

    def _load_chunk(self, name: str) -> list[str]:
        path = self._chunks_dir() / name
        key = str(path)
        cached = _CHUNK_CACHE.get(key)
        if cached is not None:
            return cached
        files = json.loads(path.read_text())
        if len(_CHUNK_CACHE) >= _CHUNK_CACHE_MAX:
            _CHUNK_CACHE.pop(next(iter(_CHUNK_CACHE)))
        _CHUNK_CACHE[key] = files
        return files

    def _write_chunk(self, files: list[str], generation: int) -> str:
        self._chunks_dir().mkdir(parents=True, exist_ok=True)
        name = f"c{generation:08d}-{uuid.uuid4().hex[:8]}.json"
        target = self._chunks_dir() / name
        tmp = target.with_suffix(".tmp")
        tmp.write_text(json.dumps(files))
        os.rename(tmp, target)
        _CHUNK_CACHE[str(target)] = list(files)
        return name

    def _materialize(self, head: dict) -> dict:
        """A head dict -> the public manifest shape (inline ``files``).
        Pre-round-12 heads already carry the inline list."""
        if "file_chunks" not in head:
            return head
        files: list[str] = []
        for name in head["file_chunks"]:
            files.extend(self._load_chunk(name))
        out = dict(head)
        out["files"] = files
        return out

    def _read_head(self, generation: int | None = None) -> dict:
        if generation is None:
            if not self.current_ptr.exists():
                return {"generation": 0, "files": [], "batch_ids": {},
                        "high_water": {}, "last_file": {}}
            generation = int(self.current_ptr.read_text().strip())
        return json.loads(
            (self.manifests / f"{generation:08d}.json").read_text())

    def manifest(self) -> dict:
        """Latest committed snapshot (empty table if none)."""
        return self._materialize(self._read_head())

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
        return self._materialize(self._read_head(generation))

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
            cur_head = self._read_head()
            cur = self._materialize(cur_head)
            new = change_fn(dict(cur))
            new["generation"] = cur["generation"] + 1
            new["committed_at"] = time.time()
            gen = new["generation"]

            # --- chunked persistence: re-serialize ONLY what changed.
            # Old chunks whose membership is intact are referenced
            # by name; a legacy inline head reads as one unnamed chunk
            # that rewrites once (transparent upgrade).  Appended
            # files (present in the new list, absent from every old
            # chunk) become one fresh chunk — the pure-append commit
            # writes O(batch + #chunks) bytes, never the table's full
            # file list.
            new_files = new.pop("files")
            new_set = set(new_files)
            if "file_chunks" in cur_head:
                old_entries = [(n, self._load_chunk(n))
                               for n in cur_head["file_chunks"]]
            elif cur_head.get("files"):
                old_entries = [(None, list(cur_head["files"]))]
            else:
                old_entries = []
            chunk_names: list[str] = []
            covered: set[str] = set()
            for name, lst in old_entries:
                kept = [f for f in lst if f in new_set]
                covered.update(kept)
                if not kept:
                    continue
                if name is not None and len(kept) == len(lst):
                    chunk_names.append(name)
                else:
                    chunk_names.append(self._write_chunk(kept, gen))
            appended = [f for f in new_files if f not in covered]
            if appended:
                chunk_names.append(self._write_chunk(appended, gen))
            if len(chunk_names) > _CHUNK_COMPACT_AT:
                # amortized log compaction: squash to target-size
                # chunks; old chunk files stay for older generations
                # until gc ages them out
                allf: list[str] = []
                for n in chunk_names:
                    allf.extend(self._load_chunk(n))
                chunk_names = [
                    self._write_chunk(allf[i:i + _CHUNK_TARGET], gen)
                    for i in range(0, len(allf), _CHUNK_TARGET)
                ] or []
            head = dict(new)
            head["file_chunks"] = chunk_names
            head["n_files"] = len(new_files)

            target = self.manifests / f"{gen:08d}.json"
            tmp = target.with_suffix(".tmp")
            tmp.write_text(json.dumps(head))
            os.rename(tmp, target)
            ptr_tmp = self.current_ptr.with_suffix(".tmp")
            ptr_tmp.write_text(str(gen))
            os.rename(ptr_tmp, self.current_ptr)  # THE commit point
            new["files"] = new_files  # callers see the public shape
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
        live_chunks: set[str] = set()
        deleted_manifests = 0
        for mf in sorted(self.manifests.glob("*.json")):
            g = int(mf.stem)
            if g >= keep_from:
                head = json.loads(mf.read_text())
                live_chunks.update(head.get("file_chunks", []))
                referenced.update(self._materialize(head)["files"])
            else:
                mf.unlink()
                deleted_manifests += 1
        # chunk files no kept head references (immutable, so any
        # referenced one is still byte-identical); grace_s spares
        # chunks an in-flight commit wrote but hasn't published yet —
        # the same rule adopted-but-unreferenced data files get
        if self._chunks_dir().exists():
            now0 = time.time()
            for cf in self._chunks_dir().glob("*.json"):
                if cf.name in live_chunks:
                    continue
                if now0 - cf.stat().st_mtime < grace_s:
                    continue
                _CHUNK_CACHE.pop(str(cf), None)
                cf.unlink()
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

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
      _commit.lock                    # flock writer lock (single node)
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

# chunked-manifest knobs: squash when a head references more than
# _CHUNK_COMPACT_AT chunks, into _CHUNK_TARGET-file chunks.  Chunk
# JSONs are immutable, so a small process-wide content cache makes
# repeated manifest() materialization cheap (ingest reads the
# manifest at every micro-batch).
_CHUNK_COMPACT_AT = 64
_CHUNK_TARGET = 10_000
_CHUNK_CACHE: dict[str, list[str]] = {}
_CHUNK_CACHE_MAX = 512

# Spark writes partition dirs through Hive's escapePathName (see
# org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils): ASCII
# 01-1F, the chars below, and DEL become %XX (uppercase hex). Any
# code that BUILDS a `container_id=<cid>` dir string or PARSES a cid
# back out of one must round-trip through these two helpers, or a cid
# containing ':'/'%'/'=' etc. silently keys watermarks under a name
# assign_seq will never look up.
_ESCAPE_CHARS = frozenset(
    [chr(c) for c in range(1, 0x20)] + list('"#%\'*/:=?\\{[]^')
    + ["\x7f"])


def escape_partition_value(v: str) -> str:
    return "".join(f"%{ord(c):02X}" if c in _ESCAPE_CHARS else c
                   for c in v)


_HEX = frozenset("0123456789abcdefABCDEF")


def unescape_partition_value(v: str) -> str:
    """Hive unescapePathName: decode %XX for exactly two hex digits —
    int()'s tolerance for sign/whitespace ('%+a', '% 1') must NOT
    decode; Hive leaves such sequences literal."""
    out, i, n = [], 0, len(v)
    while i < n:
        c = v[i]
        if (c == "%" and i + 3 <= n
                and v[i + 1] in _HEX and v[i + 2] in _HEX):
            out.append(chr(int(v[i + 1:i + 3], 16)))
            i += 3
            continue
        out.append(c)
        i += 1
    return "".join(out)


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
        if len(_CHUNK_CACHE) >= _CHUNK_CACHE_MAX:
            _CHUNK_CACHE.pop(next(iter(_CHUNK_CACHE)))
        _CHUNK_CACHE[str(target)] = list(files)
        return name

    @staticmethod
    def _stats_of(files: list[str]) -> dict:
        """Head-resident chunk summary: file count + the set of
        partition DIRS the chunk's files live in.  ``commit_replace``
        and ``drop_container`` prune on these — a chunk whose dirs
        are disjoint from the dirs of the files being removed cannot
        contain any of them, so its body is never loaded (the
        round-13 'commits touch only the chunks they change in
        MEMORY too' fix; min/max-style pruning as in Iceberg manifest
        lists)."""
        return {"n": len(files),
                "pfx": sorted({f.rsplit("/", 1)[0] if "/" in f else ""
                               for f in files})}

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

    def head(self) -> dict:
        """Latest committed HEAD only — state keys (generation,
        batch_ids, high_water, last_file) plus chunk names, WITHOUT
        materializing the file list.  O(head bytes); the read for
        pollers that only need watermarks (follow_tail checks it every
        50 ms)."""
        return self._read_head()

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
        """Exclusive commit lock via ``flock``: the kernel releases it
        the instant the holder dies — including SIGKILL mid-commit —
        so a crashed committer never blocks restart recovery.  (The
        O_EXCL lockfile this replaces orphaned on a kill: every later
        committer then stalled for the 300 s staleness window, raising
        TimeoutError at 60 s along the way — exactly the restart path
        a crash-recovering daemon needs to be fast.)  The lock file is
        created once and never unlinked: unlink-on-release lets a
        waiter blocked on the old inode and a creator of the new one
        both "hold" the lock.  Single-node by design (module
        docstring); flock on a local fs is the right primitive for
        that scope.  Two opens of the same path — even in one process
        — get distinct open file descriptions, so threads exclude each
        other too."""
        import fcntl

        deadline = time.monotonic() + timeout_s
        fd = os.open(self.lock_path, os.O_CREAT | os.O_WRONLY)
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.monotonic() > deadline:
                    os.close(fd)
                    raise TimeoutError(
                        f"commit lock busy: {self.lock_path}")
                # short poll: at 16 concurrent committers a 50 ms poll
                # quantized every queue pass into ~50 ms per waiter
                # (measured p95 ~52 ms, max ~0.9 s in bench
                # commit_contention); commits themselves are ~1-2 ms
                time.sleep(0.004)
        os.ftruncate(fd, 0)
        os.write(fd, str(os.getpid()).encode())  # diagnostics only
        self._lock_fd = fd

    def _release_lock(self) -> None:
        fd = getattr(self, "_lock_fd", None)
        if fd is None:
            return
        self._lock_fd = None
        os.close(fd)  # closing the fd drops the flock

    def _publish(self, head: dict) -> dict:
        gen = head["generation"]
        target = self.manifests / f"{gen:08d}.json"
        tmp = target.with_suffix(".tmp")
        tmp.write_text(json.dumps(head))
        os.rename(tmp, target)
        ptr_tmp = self.current_ptr.with_suffix(".tmp")
        ptr_tmp.write_text(str(gen))
        os.rename(ptr_tmp, self.current_ptr)  # THE commit point
        return head

    def _begin(self) -> dict:
        """Lock + freshest head (call under try/finally release)."""
        self.dir.mkdir(parents=True, exist_ok=True)
        self.manifests.mkdir(exist_ok=True)
        self._acquire_lock()
        return self._read_head()

    def _head_chunks(self, head: dict, gen: int):
        """(chunk_names, chunk_stats, n_files) for ``head``, upgrading
        a legacy inline head (its file list becomes one chunk, written
        once at ``gen``)."""
        if "file_chunks" in head:
            names = list(head["file_chunks"])
            stats = dict(head.get("chunk_stats", {}))
            n = head.get("n_files")
            if n is None:
                n = sum(len(self._load_chunk(c)) for c in names)
            return names, stats, n
        inline = list(head.get("files", []))
        if not inline:
            return [], {}, 0
        nm = self._write_chunk(inline, gen)
        return [nm], {nm: self._stats_of(inline)}, len(inline)

    def _maybe_squash(self, chunk_names: list[str], stats: dict,
                      gen: int):
        """Amortized log compaction past _CHUNK_COMPACT_AT chunks —
        the ONE commit in ~32 that pays an O(table-files) chunk
        reload; old chunk files stay for older generations until gc
        ages them out.

        The squash target SCALES with the table (round 13): a fixed
        10k-file target stops helping past 640k files — the squashed
        chunk count itself exceeds the threshold, so every subsequent
        commit re-squashes, silently turning appends O(table).  Sizing
        chunks to land at half the threshold keeps the next ~32
        appends pure O(batch) at any table size (measured: 16-file
        append median 0.7 ms at 10^5 AND 10^6 manifest entries)."""
        if len(chunk_names) <= _CHUNK_COMPACT_AT:
            return chunk_names, stats
        allf: list[str] = []
        for n in chunk_names:
            allf.extend(self._load_chunk(n))
        target = max(_CHUNK_TARGET,
                     -(-2 * len(allf) // _CHUNK_COMPACT_AT))
        names = [self._write_chunk(allf[i:i + target], gen)
                 for i in range(0, len(allf), target)] or []
        return names, {n: self._stats_of(self._load_chunk(n))
                       for n in names}

    def commit(self, change_fn: Callable[[dict], dict]) -> dict:
        """Serialize: lock → re-read latest → change_fn → publish.

        ``change_fn`` receives the freshest MATERIALIZED manifest (NOT
        the caller's snapshot) and returns the next one; raise
        :class:`CommitConflict` inside it to abort.  This generic path
        costs O(table files) per commit by construction (change_fn
        sees the full list); the hot callers — :meth:`commit_append`,
        :meth:`update_state`, :meth:`commit_replace`,
        :meth:`drop_container` — have chunk-aware paths below that
        never materialize untouched chunks.
        """
        cur_head = self._begin()
        try:
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
            # chunk) become one fresh chunk.
            new_files = new.pop("files")
            new_set = set(new_files)
            if "file_chunks" in cur_head:
                old_entries = [(n, self._load_chunk(n))
                               for n in cur_head["file_chunks"]]
            elif cur_head.get("files"):
                old_entries = [(None, list(cur_head["files"]))]
            else:
                old_entries = []
            cur_stats = cur_head.get("chunk_stats", {})
            chunk_names: list[str] = []
            stats: dict = {}
            ordered: list[str] = []
            covered: set[str] = set()
            for name, lst in old_entries:
                kept = [f for f in lst if f in new_set]
                covered.update(kept)
                if not kept:
                    continue
                if name is not None and len(kept) == len(lst):
                    chunk_names.append(name)
                    stats[name] = cur_stats.get(name) or self._stats_of(kept)
                else:
                    nn = self._write_chunk(kept, gen)
                    chunk_names.append(nn)
                    stats[nn] = self._stats_of(kept)
                ordered.extend(kept)
            appended = [f for f in new_files if f not in covered]
            if appended:
                nn = self._write_chunk(appended, gen)
                chunk_names.append(nn)
                stats[nn] = self._stats_of(appended)
                ordered.extend(appended)
            if ordered != new_files:
                # change_fn REORDERED the list (not just drop/append):
                # persist in its order so a later manifest() returns
                # exactly what this caller observed (round-13 ADVICE)
                chunk_names = [
                    self._write_chunk(new_files[i:i + _CHUNK_TARGET], gen)
                    for i in range(0, len(new_files), _CHUNK_TARGET)
                ] or []
                stats = {n: self._stats_of(self._load_chunk(n))
                         for n in chunk_names}
            else:
                chunk_names, stats = self._maybe_squash(
                    chunk_names, stats, gen)
            head = dict(new)
            head["file_chunks"] = chunk_names
            head["chunk_stats"] = stats
            head["n_files"] = len(new_files)
            self._publish(head)
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
        committed (crash replay).

        O(batch + #chunks) in TIME AND MEMORY (round-13: the r12
        chunked persistence had already made the BYTES O(batch), but
        every commit still materialized the full file list in memory):
        a pure append reads no chunk bodies at all — the head's
        ``file_chunks``/``chunk_stats``/``n_files`` carry everything
        it needs — and writes one new chunk plus the new head.  The
        returned dict is the new HEAD (state keys + ``n_files``; no
        materialized ``files`` list — no caller wants the table's
        file list back from an append)."""
        head = self._begin()
        try:
            if batch_id is not None and \
                    batch_id <= head.get("batch_ids", {}).get(scope, -1):
                return None
            gen = head["generation"] + 1
            chunk_names, stats, n_files = self._head_chunks(head, gen)
            if new_files:
                nm = self._write_chunk(list(new_files), gen)
                chunk_names.append(nm)
                stats[nm] = self._stats_of(new_files)
                n_files += len(new_files)
            chunk_names, stats = self._maybe_squash(chunk_names, stats, gen)
            new_head = {k: v for k, v in head.items() if k != "files"}
            new_head.update(
                generation=gen, committed_at=time.time(),
                file_chunks=chunk_names, chunk_stats=stats,
                n_files=n_files)
            if batch_id is not None:
                new_head["batch_ids"] = {**head.get("batch_ids", {}),
                                         scope: batch_id}
            hw = dict(head.get("high_water", {}))
            for cid, inc in seq_increments.items():
                hw[cid] = hw.get(cid, 0) + inc
            new_head["high_water"] = hw
            new_head["last_file"] = {**head.get("last_file", {}),
                                     **last_files}
            return self._publish(new_head)
        finally:
            self._release_lock()

    def _commit_filtered(self, touched_dirs: set[str],
                         drop: Callable[[str], bool],
                         new_files: list[str],
                         extra_head_fn: Callable[[dict], None] | None = None,
                         expect_removed: int | None = None,
                         ) -> tuple[dict, int]:
        """Shared chunk-pruned replace: drop files matching ``drop``
        from chunks whose stats intersect ``touched_dirs``, append
        ``new_files``.  Chunks provably disjoint (their ``pfx`` dir
        summary misses every touched dir) pass through BY NAME — body
        never loaded; the commit materializes only the chunks it
        touches.  Returns (new_head, n_removed).

        ``expect_removed``: rewrite-conflict detection (round 14, found
        by the kill soak in 8 cycles).  A rewrite commit's ``new_files``
        are DERIVED from the files it removes; if a concurrent commit
        already removed any of them (retention racing compaction, two
        cleaners), publishing would resurrect deleted rows and
        duplicate the surviving ones — the exact Iceberg/Delta
        validate-referenced-files rule.  When set and fewer than
        ``expect_removed`` inputs are still live, the commit raises
        :class:`CommitConflict` before publishing (staged chunks/files
        stay unreferenced; gc reclaims them); the caller recomputes
        from a fresh snapshot, typically on its next cadence pass."""
        head = self._begin()
        try:
            gen = head["generation"] + 1
            names, cur_stats, _ = self._head_chunks(head, gen)
            chunk_names: list[str] = []
            stats: dict = {}
            n_files = 0
            n_removed = 0
            for name in names:
                st = cur_stats.get(name)
                if st is not None and touched_dirs.isdisjoint(st["pfx"]):
                    chunk_names.append(name)
                    stats[name] = st
                    n_files += st["n"]
                    continue
                lst = self._load_chunk(name)
                kept = [f for f in lst if not drop(f)]
                n_removed += len(lst) - len(kept)
                if not kept:
                    continue
                if len(kept) == len(lst):
                    chunk_names.append(name)
                    stats[name] = st or self._stats_of(kept)
                else:
                    nn = self._write_chunk(kept, gen)
                    chunk_names.append(nn)
                    stats[nn] = self._stats_of(kept)
                n_files += len(kept)
            if new_files:
                nm = self._write_chunk(list(new_files), gen)
                chunk_names.append(nm)
                stats[nm] = self._stats_of(new_files)
                n_files += len(new_files)
            if expect_removed is not None and n_removed != expect_removed:
                raise CommitConflict(
                    f"{expect_removed - n_removed} of {expect_removed} "
                    "files to replace are no longer live (concurrent "
                    "rewrite); recompute from a fresh snapshot")
            chunk_names, stats = self._maybe_squash(chunk_names, stats, gen)
            new_head = {k: v for k, v in head.items() if k != "files"}
            new_head.update(
                generation=gen, committed_at=time.time(),
                file_chunks=chunk_names, chunk_stats=stats,
                n_files=n_files)
            if extra_head_fn is not None:
                extra_head_fn(new_head)
            return self._publish(new_head), n_removed
        finally:
            self._release_lock()

    def commit_replace(self, remove_files: list[str],
                       new_files: list[str]) -> dict:
        """Maintenance commit (retention / compaction): swap a rewritten
        file set. Applied against the freshest manifest, so files
        appended between the writer's snapshot and this commit are
        preserved — the round-1 compaction lost-append race is
        structurally impossible.  Raises :class:`CommitConflict` if any
        of ``remove_files`` is no longer live — the rewrite was derived
        from a snapshot a concurrent rewrite has invalidated, and
        publishing it would resurrect deleted rows / duplicate
        surviving ones (round-14 soak finding; see _commit_filtered).
        Chunk-pruned: only chunks whose partition dirs intersect the
        removed files' dirs are loaded; the rest pass through by name.
        Returns the new HEAD (no materialized ``files``)."""
        remove = set(remove_files)
        touched = {f.rsplit("/", 1)[0] if "/" in f else ""
                   for f in remove_files}
        new_head, _ = self._commit_filtered(
            touched, lambda f: f in remove, new_files,
            expect_removed=len(remove))
        return new_head

    def update_state(self, **updates) -> dict:
        """State-only commit (e.g. spool watermark bump with no rows).
        Never touches chunks — reads and writes the head only."""
        head = self._begin()
        try:
            new_head = dict(head)
            new_head["generation"] = head["generation"] + 1
            new_head["committed_at"] = time.time()
            for key, val in updates.items():
                new_head[key] = {**head.get(key, {}), **val}
            return self._publish(new_head)
        finally:
            self._release_lock()

    # -- maintenance ----------------------------------------------------------

    def gc(self, keep_generations: int = 2, grace_s: float = 60.0) -> dict:
        """Physically delete files no recent snapshot references.

        Keeps every file referenced by the newest ``keep_generations``
        manifests, so readers holding those snapshots stay valid;
        ``grace_s`` additionally spares anything recently modified.
        The grace is a CORRECTNESS defense, not a nicety: a concurrent
        commit's files are adopted (moved into the live tree) before
        the manifest publishes, so for a few milliseconds — longer
        under lock contention — they are unreferenced-by-any-manifest
        with a fresh mtime, and a zero-grace gc running beside a live
        ingest stream (the engine's default topology: cleaner loop +
        mux stream) would delete them, leaving the published manifest
        pointing at vanished files (round-14 audit).  The safe default
        spares anything newer than 60 s; pass ``grace_s=0`` only when
        no commit can be in flight (tests, offline maintenance).
        Run on the cleaner cadence.
        """
        if not self.current_ptr.exists():
            return {"deleted_files": 0, "deleted_manifests": 0}
        gen = int(self.current_ptr.read_text().strip())
        keep_from = max(1, gen - keep_generations + 1)
        referenced: set[str] = set()
        live_chunks: set[str] = set()
        deleted_manifests = 0
        # CONCURRENT gc tolerance (round-15 duo-soak finding, 6 kill
        # cycles): two engine PROCESSES run gc on the same warehouse
        # with no shared lock, so anything this pass globbed can
        # vanish before it is read or unlinked.  A vanished OLD
        # manifest/chunk was by definition collectible under the
        # peer's (same-or-newer) keep window — skipping it keeps this
        # pass conservative (a smaller referenced set only for
        # generations the peer already expired; the current head is
        # always inside every keep window, so its references are never
        # lost).  Data files and empty dirs race the same way.
        newest_read = 0
        for mf in sorted(self.manifests.glob("*.json")):
            g = int(mf.stem)
            if g >= keep_from:
                try:
                    head = json.loads(mf.read_text())
                    live_chunks.update(head.get("file_chunks", []))
                    referenced.update(self._materialize(head)["files"])
                    newest_read = max(newest_read, g)
                except FileNotFoundError:
                    continue  # peer collected an expired generation
            else:
                try:
                    mf.unlink()
                    deleted_manifests += 1
                except FileNotFoundError:
                    pass  # peer got there first
        if newest_read < gen:
            # the head this pass pinned was never read (vanished
            # before/within the pass): either >= keep_generations
            # commits landed AND a peer gc expired it inside this
            # pass's window, or real corruption (which readers hit
            # loudly regardless).  The referenced set may miss
            # carried-forward files, so deleting ANYTHING is unsafe —
            # abort; the next cadence pass re-pins a fresh head.
            return {"deleted_files": 0,
                    "deleted_manifests": deleted_manifests,
                    "aborted_stale_head": True}
        # chunk files no kept head references (immutable, so any
        # referenced one is still byte-identical); grace_s spares
        # chunks an in-flight commit wrote but hasn't published yet —
        # the same rule adopted-but-unreferenced data files get
        if self._chunks_dir().exists():
            now0 = time.time()
            for cf in self._chunks_dir().glob("*.json"):
                if cf.name in live_chunks:
                    continue
                try:
                    if now0 - cf.stat().st_mtime < grace_s:
                        continue
                    _CHUNK_CACHE.pop(str(cf), None)
                    cf.unlink()
                except FileNotFoundError:
                    continue  # peer collected it mid-pass
        now = time.time()
        deleted = 0
        # os.walk, not Path.rglob: rglob RAISES when a directory it
        # listed vanishes before it descends (a peer's commit adoption
        # removes _staging/<uuid> dirs constantly — the duo soak died
        # there in 27 cycles); os.walk ignores scandir errors by
        # design.  _staging/_manifests are pruned from the walk
        # entirely instead of per-file filtering.
        data_dirs: list[Path] = []
        for dirpath, dirnames, filenames in os.walk(self.dir):
            if Path(dirpath) == self.dir:
                dirnames[:] = [d for d in dirnames
                               if d not in ("_staging", "_manifests")]
            else:
                data_dirs.append(Path(dirpath))
            for fn in filenames:
                if not fn.endswith(".parquet"):
                    continue
                f = Path(dirpath) / fn
                rel = str(f.relative_to(self.dir))
                if rel in referenced:
                    continue
                try:
                    if now - f.stat().st_mtime < grace_s:
                        continue
                    f.unlink()
                    deleted += 1
                except FileNotFoundError:
                    continue  # peer collected it mid-pass
        # empty partition dirs
        for d in sorted(data_dirs, reverse=True):
            try:
                d.rmdir()  # only succeeds when empty
            except OSError:
                pass
        if self.staging_root.exists():
            for d in self.staging_root.iterdir():
                try:
                    expired = now - d.stat().st_mtime > max(grace_s, 3600.0)
                except FileNotFoundError:
                    continue  # peer collected it mid-pass
                if expired:
                    import shutil

                    shutil.rmtree(d, ignore_errors=True)
        return {"deleted_files": deleted, "deleted_manifests": deleted_manifests}

    def drop_container(self, container_id: str) -> int:
        """delete_when_stopped parity (statehandler.rs:176-181): drop
        every reference to the container's files; space returns on the
        next :meth:`gc`.  Chunk-pruned like :meth:`commit_replace`:
        chunks whose dir summary has no dir under the container's
        partition prefix pass through by name."""
        prefix = f"container_id={escape_partition_value(container_id)}/"
        bare = f"container_id={escape_partition_value(container_id)}"

        def in_container(f: str) -> bool:
            return f.startswith(prefix)

        def scrub_state(head: dict) -> None:
            head["high_water"] = {k: v for k, v in
                                  head.get("high_water", {}).items()
                                  if k != container_id}
            head["last_file"] = {k: v for k, v in
                                 head.get("last_file", {}).items()
                                 if k != container_id}

        # a chunk is touched iff any of its dirs belongs to the
        # container — encode that as the touched-dirs test by matching
        # on dir prefix instead of equality
        class _PrefixDirs:
            def isdisjoint(self, dirs):
                return not any(d == bare or d.startswith(prefix)
                               for d in dirs)

        _, n_removed = self._commit_filtered(
            _PrefixDirs(), in_container, [], extra_head_fn=scrub_state)
        return n_removed

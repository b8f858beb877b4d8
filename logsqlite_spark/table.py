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


# Test-only gc race-injection hook (r16, VERDICT r15 #6): the two
# cross-process gc races round 15 found by soak luck (cycles 6 and 27)
# are now DETERMINISTICALLY reproducible — tests install a hook that
# deletes the peer's files at EXACTLY the stage a concurrent gc/commit
# would, instead of hoping a kill lands in the µs-wide window.  Stages:
#   "manifest_read"  — after the glob, before reading one manifest
#   "chunk_unlink"   — before unlinking an unreferenced chunk
#   "walk_dir"       — on entering a directory of the data walk
#   "data_unlink"    — before unlinking an unreferenced data file
# Production: None (zero cost beyond one attribute check).
GC_TEST_HOOK = None


def _gc_hook(stage: str, path) -> None:
    if GC_TEST_HOOK is not None:
        GC_TEST_HOOK(stage, path)


# Opt-in lock-wait telemetry (bench only): when RECORD_LOCK_WAITS is
# true, every _acquire_lock appends its wait time here — the evidence
# separating "the flock queued" from "the filesystem/CPU was busy" in
# the commit-contention table.
RECORD_LOCK_WAITS = False
LOCK_WAIT_LOG: list[float] = []


class CommitConflict(RuntimeError):
    """change_fn declined the commit (e.g. replayed batch id)."""


class ManifestTable:
    def __init__(self, table_dir: str, meta_dir: str | None = None):
        """``meta_dir`` (r16, VERDICT r15 #1): where the manifest
        protocol state lives (_manifests/_current/_commit.lock).
        Defaults to the table dir itself — the historical layout.  A
        :class:`ShardedManifestTable` gives each shard its own meta
        dir under ``<table>/_shards/`` while all shards share the one
        data tree, so commits to different shards take different
        flocks."""
        self.dir = Path(table_dir)
        self.meta = Path(meta_dir) if meta_dir is not None else self.dir
        self.manifests = self.meta / "_manifests"
        self.current_ptr = self.meta / "_current"
        self.lock_path = self.meta / "_commit.lock"
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

        t_entry = time.monotonic()
        deadline = t_entry + timeout_s
        fd = os.open(self.lock_path, os.O_CREAT | os.O_WRONLY)
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                if RECORD_LOCK_WAITS:
                    LOCK_WAIT_LOG.append(time.monotonic() - t_entry)
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
        # NOTE: no pid-stamp write here — the old ftruncate+write
        # diagnostics dirtied the lock inode on every acquire, costing
        # ~0.7 ms of fs-journal work per commit (r16 contention
        # profiling) for a byte nobody consumed
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
        self.manifests.mkdir(parents=True, exist_ok=True)
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
            # MONOTONIC per-container watermark (r16, VERDICT r15 #2):
            # FileStreamSource orders micro-batches by file MTIME, so
            # a sub-ms writer burst can deliver an older-NAMED spool
            # file in a later batch.  A plain dict overwrite would
            # then REGRESS last_file — under-protecting the stale
            # guard (an older replay slips past `path <= last_file`)
            # and breaking the drain invariant that every consumed
            # leftover's name is <= the watermark.  max() makes the
            # watermark order-independent: it is "the largest name
            # ever consumed", whatever order batches landed in.
            lf = dict(head.get("last_file", {}))
            for cid, name in last_files.items():
                old = lf.get(cid)
                lf[cid] = name if old is None or name > old else old
            new_head["last_file"] = lf
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
        meta = self.gc_meta(keep_generations, grace_s)
        if meta.get("aborted_stale_head"):
            return {"deleted_files": 0,
                    "deleted_manifests": meta["deleted_manifests"],
                    "aborted_stale_head": True}
        if not meta["ran"]:
            return {"deleted_files": 0, "deleted_manifests": 0}
        deleted = _gc_data_walk(self.dir, meta["referenced"], grace_s)
        return {"deleted_files": deleted,
                "deleted_manifests": meta["deleted_manifests"]}

    def gc_meta(self, keep_generations: int = 2,
                grace_s: float = 60.0) -> dict:
        """The manifest/chunk phase of :meth:`gc`: age out old
        manifest generations and unreferenced chunk files, and return
        the set of data files the kept generations reference — WITHOUT
        touching the data tree.  Split out (r16) so
        :class:`ShardedManifestTable` can run it per shard, union the
        referenced sets, and make ONE pass over the shared data tree.
        Returns ``{"ran", "referenced", "deleted_manifests",
        "aborted_stale_head"}``; when ``aborted_stale_head`` is set
        the referenced set may be incomplete and NO data owned by this
        manifest may be deleted."""
        if not self.current_ptr.exists():
            return {"ran": False, "referenced": set(),
                    "deleted_manifests": 0,
                    "aborted_stale_head": False}
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
                    _gc_hook("manifest_read", mf)
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
            return {"ran": True, "referenced": set(),
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
                    _gc_hook("chunk_unlink", cf)
                    _CHUNK_CACHE.pop(str(cf), None)
                    cf.unlink()
                except FileNotFoundError:
                    continue  # peer collected it mid-pass
        return {"ran": True, "referenced": referenced,
                "deleted_manifests": deleted_manifests,
                "aborted_stale_head": False}


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


def _gc_data_walk(root: Path, referenced: set[str], grace_s: float,
                  skip_rel=None) -> int:
    """The data phase of gc: delete unreferenced parquet under
    ``root``, prune empty partition dirs, expire stale staging.
    ``skip_rel(rel_path) -> bool`` (r16) spares files a sharded gc
    may not judge (their owning shard's meta pass aborted).  Returns
    the deleted-file count."""
    now = time.time()
    deleted = 0
    # os.walk, not Path.rglob: rglob RAISES when a directory it
    # listed vanishes before it descends (a peer's commit adoption
    # removes _staging/<uuid> dirs constantly — the duo soak died
    # there in 27 cycles); os.walk ignores scandir errors by
    # design.  _staging/_manifests/_shards are pruned from the walk
    # entirely instead of per-file filtering.
    data_dirs: list[Path] = []
    for dirpath, dirnames, filenames in os.walk(root):
        _gc_hook("walk_dir", dirpath)
        if Path(dirpath) == root:
            dirnames[:] = [d for d in dirnames
                           if d not in ("_staging", "_manifests",
                                        "_shards")]
        else:
            data_dirs.append(Path(dirpath))
        for fn in filenames:
            if not fn.endswith(".parquet"):
                continue
            f = Path(dirpath) / fn
            rel = str(f.relative_to(root))
            if rel in referenced:
                continue
            if skip_rel is not None and skip_rel(rel):
                continue
            try:
                if now - f.stat().st_mtime < grace_s:
                    continue
                _gc_hook("data_unlink", f)
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
    staging_root = root / "_staging"
    if staging_root.exists():
        for d in staging_root.iterdir():
            try:
                expired = now - d.stat().st_mtime > max(grace_s, 3600.0)
            except FileNotFoundError:
                continue  # peer collected it mid-pass
            if expired:
                import shutil

                shutil.rmtree(d, ignore_errors=True)
    return deleted


# ---------------------------------------------------------------------------
# Sharded manifests (r16, VERDICT r15 #1)
# ---------------------------------------------------------------------------
#
# BENCH_SELF's commit_contention trendline showed the single warehouse
# flock going from p95 0.95 ms at one committer to 93 ms (max 385 ms)
# at just 16 — the one measured scale cliff in the engine.  The
# reference's unit of isolation is the CONTAINER (one logger per FIFO,
# one SQLite tx stream per log, logger.rs:250-251); this mirrors it:
# the manifest state is hash-sharded BY CONTAINER into N independent
# ManifestTables that share one data tree.  Commits to different
# shards take different flocks and publish different heads, so
# concurrent per-container writers stop queuing on each other
# entirely; cross-container operations (mux batch commits, retention,
# gc) decompose into per-shard commits — each shard keeps the full
# single-manifest crash contract, and the cross-shard protocol adds
# exactly one rule (below).
#
# Layout (marker selects the protocol; absent = classic single
# manifest, so every pre-r16 warehouse keeps working untouched)::
#
#     table/
#       _shards.json                  # {"n": N} — written once at init
#       _shards/s000/_manifests/...   # shard 0's manifest state
#       _shards/s000/_current
#       _shards/s000/_commit.lock
#       ...
#       _staging/<uuid>/...           # shared writer scratch
#       container_id=<c>/date=<d>/*.parquet   # shared data tree
#
# Semantics vs the single manifest:
#
# - Container state (high_water, last_file, data files) lives in
#   exactly ONE shard (crc32(container) % N), so per-container
#   invariants (seq contiguity, spool watermark monotonicity, reader
#   snapshot consistency per container) are untouched — they were
#   always per-container facts.
# - Batch exactly-once becomes a two-level rule: every data shard a
#   batch touches dedupes on ITS OWN batch_ids[scope], and the
#   scope's AUTHORITATIVE shard (crc32(scope) % N) is committed LAST.
#   The merged head reports batch_ids[scope] from the authoritative
#   shard only, so a caller's replay pre-check says "committed" iff
#   every shard of that batch committed.  A crash mid-fanout replays
#   the batch; already-committed shards dedupe (their files stay
#   referenced, their seq increments don't re-apply), the rest commit
#   — per-container exactly-once, like the reference's per-container
#   SQLite transactions.
# - Readers materialize the union of shard snapshots: snapshot
#   consistency is per shard (≥ per container), not global — the
#   reference never had a cross-container snapshot either.
# - Global time travel (manifest_at/generations over one generation
#   counter) does not exist in sharded mode; per-shard time travel
#   remains via .shards[k].
#
# 100 TB note: N is a small constant (16-64).  Contention falls by
# ~N for uniformly-hashed writers; a single hot container still
# serializes on its shard — which is the reference's semantics (one
# writer per container) and the correct floor.

_SHARD_MARKER = "_shards.json"


def _shard_of(key: str, n: int) -> int:
    """Stable shard routing (crc32 — stable across processes/runs,
    unlike hash())."""
    import zlib

    return zlib.crc32(key.encode("utf-8")) % n


def table_shard_count(table_dir: str) -> int:
    """The shard count a warehouse was initialized with (1 = classic
    single manifest; the marker is absent for every pre-r16 table)."""
    try:
        return int(json.loads(
            (Path(table_dir) / _SHARD_MARKER).read_text())["n"])
    except (FileNotFoundError, KeyError, ValueError):
        return 1


def init_sharded_table(table_dir: str, n_shards: int) -> None:
    """Stamp a warehouse as N-sharded (idempotent; refuses to change
    an existing stamp or to shard a table that already has classic
    single-manifest state — resharding would strand committed
    manifests)."""
    if n_shards <= 1:
        return
    root = Path(table_dir)
    cur = table_shard_count(table_dir)
    if (root / _SHARD_MARKER).exists():
        if cur != n_shards:
            raise ValueError(
                f"table {table_dir} already sharded n={cur}; "
                f"cannot re-shard to {n_shards}")
        return
    if (root / "_current").exists():
        raise ValueError(
            f"table {table_dir} already has single-manifest state; "
            "resharding an existing table is not supported")
    root.mkdir(parents=True, exist_ok=True)
    tmp = root / (_SHARD_MARKER + ".tmp")
    tmp.write_text(json.dumps({"n": int(n_shards)}))
    os.rename(tmp, root / _SHARD_MARKER)


def open_table(table_dir: str):
    """THE constructor call sites use: returns the classic
    ManifestTable or the sharded wrapper, as the warehouse's marker
    says.  Every component (ingest, retention, compaction, erase, gc,
    follow) works against either through the same surface."""
    n = table_shard_count(table_dir)
    if n <= 1:
        return ManifestTable(table_dir)
    return ShardedManifestTable(table_dir, n)


class ShardedManifestTable:
    """N independent per-container-hash manifest shards over one data
    tree — see the module-section comment above for the protocol."""

    def __init__(self, table_dir: str, n_shards: int):
        self.dir = Path(table_dir)
        self.n = int(n_shards)
        self.shards = [
            ManifestTable(table_dir,
                          meta_dir=self.dir / "_shards" / f"s{k:03d}")
            for k in range(self.n)
        ]
        self.staging_root = self.shards[0].staging_root

    # -- routing --------------------------------------------------------------

    def shard_for_container(self, container_id: str) -> int:
        return _shard_of(container_id, self.n)

    @staticmethod
    def _cid_of_rel(rel: str) -> str:
        """Owning container of a data file's relative path ('' for
        files outside the partition layout — routed to shard 0)."""
        first = rel.split("/", 1)[0]
        if first.startswith("container_id="):
            return unescape_partition_value(first[len("container_id="):])
        return ""

    def _shard_of_rel(self, rel: str) -> int:
        return _shard_of(self._cid_of_rel(rel), self.n)

    # -- scope watermarks (batch exactly-once) --------------------------------
    #
    # The cross-shard batch rule: data shards each dedupe on their OWN
    # batch_ids[scope]; the scope's COMPLETION watermark is a tiny
    # per-scope file written by atomic rename AFTER every data shard
    # committed.  The replay pre-check reads the scope file, so it
    # says "committed" iff the whole fan-out finished — a crash
    # mid-fanout replays the batch and the done shards dedupe.  No
    # flock: a scope is one writer by construction (one StreamingQuery
    # per query-name scope; pulls use batch_id=None).  One file per
    # scope, bounded by the number of streams ever run.

    def _scopes_dir(self) -> Path:
        return self.dir / "_shards" / "_scopes"

    def _scope_file(self, scope: str) -> Path:
        import hashlib

        h = hashlib.sha1(scope.encode("utf-8")).hexdigest()
        # two-level layout: renames into one shared dir serialize on
        # that directory's inode mutex in the kernel — spread scopes
        # over 256 subdirs so concurrent writers rarely share one
        return self._scopes_dir() / h[:2] / (h + ".json")

    def _scope_batch(self, scope: str) -> int:
        try:
            d = json.loads(self._scope_file(scope).read_text())
            return int(d["batch_id"])
        except (FileNotFoundError, KeyError, ValueError):
            return -1

    def _write_scope_batch(self, scope: str, batch_id: int) -> None:
        target = self._scope_file(scope)
        target.parent.mkdir(parents=True, exist_ok=True)
        tmp = target.with_suffix(f".tmp{os.getpid()}")
        tmp.write_text(json.dumps({"scope": scope,
                                   "batch_id": int(batch_id)}))
        os.rename(tmp, target)

    def _all_scope_batches(self) -> dict[str, int]:
        d = self._scopes_dir()
        if not d.exists():
            return {}
        out: dict[str, int] = {}
        for f in d.glob("*/*.json"):
            try:
                rec = json.loads(f.read_text())
                out[rec["scope"]] = int(rec["batch_id"])
            except (OSError, KeyError, ValueError, json.JSONDecodeError):
                continue
        return out

    def _group_by_shard(self, new_files, seq_increments, last_files):
        groups: dict[int, dict] = {}

        def g(k: int) -> dict:
            return groups.setdefault(
                k, {"files": [], "incs": {}, "lf": {}})

        for f in new_files or []:
            g(self._shard_of_rel(f))["files"].append(f)
        for cid, inc in (seq_increments or {}).items():
            g(self.shard_for_container(cid))["incs"][cid] = inc
        for cid, lf in (last_files or {}).items():
            g(self.shard_for_container(cid))["lf"][cid] = lf
        return groups

    # -- snapshot access ------------------------------------------------------

    def exists(self) -> bool:
        return any(s.exists() for s in self.shards)

    def _merged(self, materialize: bool) -> dict:
        files: list[str] = []
        hw: dict = {}
        lf: dict = {}
        bid: dict = {}
        gen = 0
        n_files = 0
        for sh in self.shards:
            h = sh.manifest() if materialize else sh.head()
            gen += h.get("generation", 0)
            hw.update(h.get("high_water", {}))
            lf.update(h.get("last_file", {}))
            if materialize:
                files.extend(h.get("files", []))
            n_files += h.get("n_files", len(h.get("files", [])))
        # batch completion watermarks come from the scope files, NOT
        # the per-shard batch_ids (those prove only per-shard commits)
        bid = self._all_scope_batches()
        out = {"generation": gen, "batch_ids": bid, "high_water": hw,
               "last_file": lf, "n_files": n_files}
        if materialize:
            out["files"] = files
        return out

    def manifest(self) -> dict:
        return self._merged(materialize=True)

    def head(self) -> dict:
        return self._merged(materialize=False)

    def import_existing(self) -> dict:
        if self.exists():
            return self.manifest()
        if not self.dir.exists():
            return self.manifest()
        found = sorted(
            str(f.relative_to(self.dir))
            for f in self.dir.rglob("*.parquet")
            if f.relative_to(self.dir).parts[0] not in ("_staging",
                                                        "_manifests",
                                                        "_shards"))
        by_shard: dict[int, list[str]] = {}
        for f in found:
            by_shard.setdefault(self._shard_of_rel(f), []).append(f)
        for k, lst in sorted(by_shard.items()):
            self.shards[k].commit_append(lst, "__import__", None, {}, {})
        return self.manifest()

    def generations(self):
        raise NotImplementedError(
            "sharded tables have per-shard generations; use "
            ".shards[k].generations()")

    def manifest_at(self, generation: int):
        raise NotImplementedError(
            "sharded tables have per-shard time travel; use "
            ".shards[k].manifest_at(gen)")

    def data_files(self, manifest: dict | None = None) -> list[str]:
        m = manifest or self.manifest()
        return [str(self.dir / f) for f in m["files"]]

    def read_df(self, spark: SparkSession,
                manifest: dict | None = None) -> DataFrame:
        # same shared data tree / basePath as the single manifest
        return self.shards[0].read_df(
            spark, manifest or self.manifest())

    # -- writer surface -------------------------------------------------------

    def new_staging_dir(self) -> Path:
        return self.shards[0].new_staging_dir()

    def adopt_staged(self, staging_dir: Path) -> list[str]:
        return self.shards[0].adopt_staged(staging_dir)

    def commit_append(self, new_files: list[str], scope: str,
                      batch_id: int | None,
                      seq_increments: dict[str, int],
                      last_files: dict[str, str]) -> dict | None:
        """Per-shard fan-out append; authoritative shard LAST (the
        exactly-once rule in the module-section comment)."""
        groups = self._group_by_shard(new_files, seq_increments,
                                      last_files)
        if batch_id is not None and batch_id <= self._scope_batch(scope):
            return None  # fully-committed batch (scope watermark)
        committed_any = False
        hw: dict = {}
        lf: dict = {}
        for k in sorted(groups):
            grp = groups[k]
            res = self.shards[k].commit_append(
                grp["files"], scope, batch_id, grp["incs"], grp["lf"])
            if res is not None:
                committed_any = True
                hw.update(res.get("high_water", {}))
                lf.update(res.get("last_file", {}))
        if batch_id is not None:
            # completion watermark LAST — the whole fan-out is now
            # durable, so the replay pre-check may say "committed"
            self._write_scope_batch(scope, batch_id)
            if not committed_any and groups:
                # crash-window replay: every data shard had already
                # committed this batch and only the watermark was
                # missing — finishing it is not a new commit, and the
                # caller must NOT re-publish the batch's rows
                return None
            committed_any = True
        # the returned view covers the shards this batch TOUCHED — a
        # superset of the batch's containers, which is what callers
        # consume (follow seams, ingest results); merging all N shards
        # here would put O(N) head reads on every commit's critical
        # path for state no caller reads
        out = {"high_water": hw, "last_file": lf,
               "batch_ids": ({scope: batch_id}
                             if batch_id is not None else {})}
        return out

    def update_state(self, **updates) -> dict:
        """Container-keyed state updates route to owning shards; any
        non-container key (batch_ids) routes per scope."""
        by_shard: dict[int, dict] = {}
        for key, val in updates.items():
            for sub, v in val.items():
                if key == "batch_ids":
                    self._write_scope_batch(sub, v)
                    continue
                k = self.shard_for_container(sub)
                by_shard.setdefault(k, {}).setdefault(key, {})[sub] = v
        out: dict = {}
        for k, upd in sorted(by_shard.items()):
            res = self.shards[k].update_state(**upd)
            for key in updates:
                out.setdefault(key, {}).update(res.get(key, {}))
        return out

    def commit_replace(self, remove_files: list[str],
                       new_files: list[str]) -> dict:
        """Per-shard replace.  Each shard keeps the all-or-nothing
        conflict contract; across shards the op is per-container
        atomic: every shard is ATTEMPTED (no starvation of
        independent containers behind one conflicted shard), then a
        single CommitConflict reports any that declined — the caller
        recomputes from a fresh snapshot on its next cadence, exactly
        as with the single manifest."""
        rm_by: dict[int, list[str]] = {}
        for f in remove_files:
            rm_by.setdefault(self._shard_of_rel(f), []).append(f)
        new_by: dict[int, list[str]] = {}
        for f in new_files:
            new_by.setdefault(self._shard_of_rel(f), []).append(f)
        conflicts: list[str] = []
        for k in sorted(set(rm_by) | set(new_by)):
            try:
                self.shards[k].commit_replace(rm_by.get(k, []),
                                              new_by.get(k, []))
            except CommitConflict as e:
                conflicts.append(f"shard {k}: {e}")
        if conflicts:
            raise CommitConflict(
                f"{len(conflicts)} shard(s) declined: "
                + "; ".join(conflicts))
        # callers ignore the return (maintenance ops re-read the
        # manifest on their next pass); keep it cheap
        return {"replaced_shards": sorted(set(rm_by) | set(new_by))}

    def drop_container(self, container_id: str) -> int:
        return self.shards[self.shard_for_container(container_id)] \
            .drop_container(container_id)

    # -- maintenance ----------------------------------------------------------

    def gc(self, keep_generations: int = 2, grace_s: float = 60.0) -> dict:
        """Per-shard meta aging + ONE pass over the shared data tree.
        A shard whose meta pass aborted (stale pinned head — see
        ManifestTable.gc_meta) contributes nothing to the referenced
        set AND its containers' files are spared entirely."""
        referenced: set[str] = set()
        aborted: set[int] = set()
        deleted_manifests = 0
        ran = False
        for k, sh in enumerate(self.shards):
            meta = sh.gc_meta(keep_generations, grace_s)
            deleted_manifests += meta["deleted_manifests"]
            if meta.get("aborted_stale_head"):
                aborted.add(k)
            if meta["ran"]:
                ran = True
            referenced |= meta["referenced"]
        if not ran:
            return {"deleted_files": 0, "deleted_manifests": 0}
        deleted = _gc_data_walk(
            self.dir, referenced, grace_s,
            skip_rel=(None if not aborted
                      else lambda rel: self._shard_of_rel(rel) in aborted))
        out = {"deleted_files": deleted,
               "deleted_manifests": deleted_manifests}
        if aborted:
            out["aborted_stale_head"] = True
        return out

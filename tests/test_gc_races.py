"""Deterministic cross-process gc race reproductions (r16, VERDICT
r15 #6).

Round 15's duo soak found two real gc-vs-gc / gc-vs-commit races by
kill LUCK (cycles 6 and 27 of seed 23).  These tests reproduce each
race DETERMINISTICALLY via table.GC_TEST_HOOK — the hook deletes the
peer's files at exactly the stage a concurrent process would, the
same direct-crash-state construction the IVF swap pins use.  With the
r15 fixes reverted (manifest-read FileNotFoundError swallow; os.walk
instead of Path.rglob), each test fails; with them, gc stays green
and conservative.
"""

import shutil
from pathlib import Path

import pytest

import logsqlite_spark.table as T


@pytest.fixture
def hook():
    yield
    T.GC_TEST_HOOK = None  # never leak into other tests


def _mk(tmp_path) -> T.ManifestTable:
    t = T.ManifestTable(str(tmp_path / "t"))
    for k in range(5):
        rel = f"container_id=a/date=2024-01-01/f{k}.parquet"
        p = t.dir / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
        t.commit_append([rel], "s", k, {"a": 1}, {})
    return t


def test_gc_vs_gc_expired_manifest_vanishes_mid_pass(tmp_path, hook):
    """Race (a), r15 duo cycle 6: a peer gc collects an EXPIRED
    generation between this pass's glob and its read.  The pass must
    skip it (it was collectible under the peer's same-or-newer keep
    window) and still delete correctly."""
    t = _mk(tmp_path)
    gen = int(t.current_ptr.read_text())
    victim = t.manifests / f"{gen - 2:08d}.json"  # old, outside keep=2
    assert victim.exists()

    def peer(stage, path):
        # the peer's unlink lands exactly when THIS pass reaches the
        # old generation's read
        if stage == "manifest_read" and Path(path) == victim:
            victim.unlink()

    T.GC_TEST_HOOK = peer
    res = t.gc(keep_generations=3, grace_s=0.0)  # keep window covers victim
    assert not res.get("aborted_stale_head")
    # live files intact
    m = t.manifest()
    assert all((t.dir / f).exists() for f in m["files"])


def test_gc_vs_gc_pinned_head_vanishes_aborts_conservatively(tmp_path, hook):
    """Race (a) hard case: the generation this pass PINNED from
    _current vanishes before it is read — the referenced set would
    miss carried-forward files, so the pass must delete NOTHING."""
    t = _mk(tmp_path)
    gen = int(t.current_ptr.read_text())
    head_mf = t.manifests / f"{gen:08d}.json"

    def peer(stage, path):
        if stage == "manifest_read" and Path(path) == head_mf:
            head_mf.unlink()

    # make an unreferenced data file that a non-aborting gc WOULD delete
    orphan = t.dir / "container_id=a/date=2024-01-01/orphan.parquet"
    orphan.write_bytes(b"x")
    T.GC_TEST_HOOK = peer
    res = t.gc(keep_generations=1, grace_s=0.0)
    assert res.get("aborted_stale_head") is True
    assert res["deleted_files"] == 0
    assert orphan.exists()  # conservative: nothing deleted


def test_gc_vs_commit_staging_dir_vanishes_mid_walk(tmp_path, hook):
    """Race (b), r15 duo cycle 27: a peer's commit ADOPTION removes a
    _staging/<uuid> dir while this gc's data walk is running.  The
    r15 fix (os.walk with scandir errors ignored, _staging pruned)
    must survive directories vanishing mid-walk anywhere in the
    tree."""
    t = _mk(tmp_path)
    staging = t.new_staging_dir()
    (staging / "container_id=a").mkdir()
    (staging / "container_id=a" / "part-x.parquet").write_bytes(b"x")
    # a second data dir that vanishes between listing and descent
    doomed = t.dir / "container_id=zz" / "date=2024-01-02"
    doomed.mkdir(parents=True)
    (doomed / "gone.parquet").write_bytes(b"x")

    state = {"fired": False}

    def peer(stage, path):
        if stage == "walk_dir" and not state["fired"]:
            state["fired"] = True
            # peer adoption + peer gc land NOW: the staging uuid dir
            # and a whole partition dir vanish under the walk
            shutil.rmtree(staging, ignore_errors=True)
            shutil.rmtree(doomed.parent, ignore_errors=True)

    T.GC_TEST_HOOK = peer
    res = t.gc(keep_generations=2, grace_s=0.0)  # must not raise
    assert state["fired"]
    m = t.manifest()
    assert all((t.dir / f).exists() for f in m["files"])
    assert "deleted_files" in res


def test_gc_vs_gc_chunk_vanishes_before_unlink(tmp_path, hook):
    """A peer collects the same unreferenced chunk first — the unlink
    must tolerate FileNotFoundError (same conservative-skip rule)."""
    t = _mk(tmp_path)
    # a replace rewrites the touched chunks, so the pre-replace chunk
    # files become unreferenced once their generations age out
    old = f"container_id=a/date=2024-01-01/f0.parquet"
    new = f"container_id=a/date=2024-01-01/f9.parquet"
    (t.dir / new).write_bytes(b"x")
    t.commit_replace([old], [new])
    fired = {"n": 0}

    def peer(stage, path):
        if stage == "chunk_unlink":
            fired["n"] += 1
            Path(path).unlink()  # peer wins the unlink race

    T.GC_TEST_HOOK = peer
    res = t.gc(keep_generations=1, grace_s=0.0)
    assert fired["n"] >= 1
    m = t.manifest()
    assert all((t.dir / f).exists() for f in m["files"])


def test_gc_vs_gc_data_file_vanishes_before_unlink(tmp_path, hook):
    """Peer deletes the same unreferenced data file first."""
    t = _mk(tmp_path)
    orphan = t.dir / "container_id=a/date=2024-01-01/orphan.parquet"
    orphan.write_bytes(b"x")

    def peer(stage, path):
        if stage == "data_unlink" and Path(path) == orphan:
            orphan.unlink()

    T.GC_TEST_HOOK = peer
    res = t.gc(keep_generations=2, grace_s=0.0)  # must not raise
    assert not orphan.exists()

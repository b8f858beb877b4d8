"""Shared build-once/serve-many protocol for fingerprint-keyed
corpus-side artifacts (round 9).

Four operator families persist a derived table (or table set) keyed on
the corpus fingerprint: the IVF/SQ index (``operators/similarity.py``),
winnow fingerprints, minhash bands, simhash fingerprints, and the
jaccard/exact dedup index (``operators/dedup.py``,
``operators/textstats.py``).  They all need the same concurrency story
— one build ever per (corpus, params) key across threads AND processes,
a completion marker so readers never see a half-written dir, and
keep-newest GC so iterating dev boxes don't strand a corpus copy per
rewrite.  That protocol lives in the similarity module (it grew there
with the IVF index); this module is the thin generic entry point so
every new artifact reuses it instead of re-pasting the lock dance.

``build_or_serve(spark, key_parts, write)`` returns ``(path, built)``:
``write(path)`` is invoked at most once per key machine-wide, under the
module thread lock + the cross-process flock; ``built`` tells the
caller whether THIS call did the build (the per-module build counters
the scale tests pin).
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Sequence

from pyspark.sql import SparkSession


def artifact_path(key_parts: Sequence[str]) -> str:
    from logsqlite_spark.operators import similarity as _SIM

    key = hashlib.sha256("|".join(key_parts).encode()).hexdigest()[:16]
    return os.path.join(_SIM._ivf_index_root(), key)


_ISIN_MAX = 1000

# Artifact writes size their output files from the SOURCE corpus bytes
# (guide §6: aim for large parquet files; derived tables are smaller
# than their source, so ~256 MB of source text per output file lands
# artifact files comfortably inside the 10-100 MB+ range).  The r16
# layout hardcoded the write parallelism to the session core count,
# which at bench scale produced 32 files of ~2 KB each — and every
# serve of the artifact then paid 32 task launches + 32 footer reads
# PER QUERY REP (the dedup_incremental_banded regression's largest
# inherited term).  Scale-adaptive by construction: a 100 TB corpus
# divides into ~400k write partitions (parallel build, prunable
# files), a 100 MB corpus into ONE.
ARTIFACT_SRC_BYTES_PER_FILE = int(os.environ.get(
    "SPARK_GRAFT_ARTIFACT_SRC_BYTES_PER_FILE", str(256 * 1024 * 1024)))


def input_bytes(files: Sequence[str]) -> int | None:
    """Total size of a DataFrame's backing files (``df.inputFiles()``
    URIs), or None when any size is unknowable (non-local scheme)."""
    total = 0
    for f in files:
        p = f
        if p.startswith("file://"):
            p = p[7:]
        elif "://" in p:
            return None
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return total


def write_parts(df_or_files, spark=None,
                src_bytes_per_file: int = ARTIFACT_SRC_BYTES_PER_FILE,
                ) -> int:
    """Partition count for an artifact write, derived from the source
    input size.  Falls back to the session default parallelism when
    the size cannot be determined (streaming/remote sources) — the
    pre-r17 behavior, which is only ever wrong in the direction of
    too-many-small-files."""
    if isinstance(df_or_files, (list, tuple)):
        files = df_or_files
    else:
        spark = spark or df_or_files.sparkSession
        try:
            files = df_or_files.inputFiles()
        except Exception:  # noqa: BLE001 — streaming frames
            files = None
    total = input_bytes(files) if files else None
    if total is None:
        return spark.sparkContext.defaultParallelism if spark else 8
    return max(1, -(-total // src_bytes_per_file))


def filter_ids(df, col: str, ids: Sequence[int], keep: bool):
    """Filter ``df`` by membership of ``col`` in ``ids`` — as an
    ``isin`` predicate for small lists (stays in codegen, pushes to
    the scan) and as a broadcast (semi/anti) join for large ones (a
    100k-id takedown batch as an ``isin`` literal would build a
    pathological expression tree).  ``keep=True`` keeps members,
    ``False`` drops them."""
    from pyspark.sql import functions as F

    vals = [int(x) for x in ids]
    if len(vals) <= _ISIN_MAX:
        pred = F.col(col).isin(vals)
        return df.filter(pred if keep else ~pred)
    spark = df.sparkSession
    ids_df = spark.createDataFrame([(v,) for v in vals], f"{col} long")
    how = "leftsemi" if keep else "left_anti"
    return df.join(F.broadcast(ids_df), col, how)


# Constructed-DataFrame memo for served artifacts (r16, guide §5
# driver work): a build_or_serve dir is written AT MOST ONCE per key
# ever (completion-marker protocol; the streaming twins grow their own
# state dirs, never these), so the post-build `spark.read.parquet`
# re-listing + footer read (~50-150 ms driver-side per sub-table per
# call) can be memoized exactly like tables.table / the IVF serve
# frames. Keyed by applicationId so a restarted session never serves a
# stale JVM's plan.
_SERVE_DF_CACHE: dict = {}


def serve_parquet(spark: SparkSession, path: str, sub: str):
    """Memoized `spark.read.parquet(f"{path}/{sub}")` for an immutable
    (marker-completed, fingerprint-keyed) artifact dir."""
    key = (spark.sparkContext.applicationId, path, sub)
    df = _SERVE_DF_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{path}/{sub}")
        _SERVE_DF_CACHE[key] = df
    return df


def build_or_serve(spark: SparkSession, key_parts: Sequence[str],
                   write: Callable[[str], None]) -> tuple[str, bool]:
    """Serve the artifact dir for ``key_parts``, building it with
    ``write(path)`` if absent.  Thread-safe and cross-process-safe on
    local roots (flock); scheme'd stores serialize via their own
    atomics exactly as the IVF index does."""
    from logsqlite_spark.operators import similarity as _SIM

    path = artifact_path(key_parts)
    built = False
    with _SIM._IVF_BUILD_LOCK:
        if not _SIM._index_marker_exists(spark, path):
            local = _SIM._local_fs_path(path)
            if local is not None:
                with _SIM._DirBuildLock(local):
                    if not _SIM._index_marker_exists(spark, path):
                        write(path)
                        _SIM._write_index_marker(spark, path)
                        built = True
            else:
                write(path)
                _SIM._write_index_marker(spark, path)
                built = True
            _SIM._gc_auto_index_root()
        else:
            _SIM._touch_index_marker(path)
    return path, built

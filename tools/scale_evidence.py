"""sf1-scale growth evidence for the dedup / winnow / ANN family.

VERDICT r4 stretch item: the per-round bench measures candidate-growth
exponents across sf0.01 -> sf0.1 (500 -> 5,000 docs). This tool checks
that those exponents hold ANOTHER decade up, at sf1-equivalent sizes
(5,000 -> 50,000 docs; 2,000 -> 20,000 vectors), using a locally
generated corpus because the driver ships no sf1 testdata (and
/root/testdata is read-only).

The generator mirrors the driver corpus's observable structure (same
31-word vocabulary, ~50-token docs, 5 langs / 20 sources, rare exact-
dup injection, 64-dim 10-cluster embeddings) so the measured exponents
are comparable to the bench's. Both scales come from the SAME
generator, which is all a growth exponent requires.

Usage:  python tools/scale_evidence.py [--lo 5000] [--hi 50000]
Prints one JSON line with per-path counts, timings, and exponents;
exits non-zero if any DEPLOYMENT path (jaccard capped, minhash banded,
simhash groups, winnow matches, ANN-LSH candidates) measures a growth
exponent above 1.15. The audit-only simhash_pairs lens is reported but
not gated (its pair output is intrinsically super-linear; see
operators/dedup.py:256 and SURVEY §6).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "fr", "es", "zh"]


def gen_documents(n: int, out_dir: Path, seed: int = 42,
                  p_exact: float = 0.002, p_near: float = 0.004) -> None:
    """Random-token docs with rare exact/near dup injection (copy a
    uniformly chosen earlier doc; near-dups perturb ~3 tokens). The
    uniform-target choice makes dup-cluster sizes grow with n, which
    is what made the driver corpus's simhash PAIR output super-linear
    — kept on purpose so the audit lens reproduces that signal.

    Beyond the driver corpus's 31-word vocabulary, each doc mixes in
    a handful of RARE tokens (hex ids drawn from a pool that grows
    with n — Heaps' law, the property every real log/text corpus
    has). A first cut without them measured degenerate: at 50k docs a
    31-word vocab puts every 5-char shingle and winnow fingerprint in
    thousands of docs, the absolute df cap filters them all, and the
    jaccard/winnow paths emit 0 rows — a correct linear bound but
    void as evidence. Rare tokens keep sub-cap blocking keys alive at
    any n (copies share their source's rare shingles, so true dups
    still collide)."""
    rng = np.random.default_rng(seed)
    pool = [f"x{v:08x}" for v in rng.integers(0, 1 << 32, max(n, 64))]
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < p_exact:
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 10 and r < p_exact + p_near:
            toks = texts[rng.integers(0, i)].split(" ")
            for _ in range(3):
                toks[rng.integers(0, len(toks))] = VOCAB[
                    rng.integers(0, len(VOCAB))]
            texts.append(" ".join(toks))
            continue
        ln = max(8, int(rng.normal(50, 12)))
        toks = [VOCAB[j] for j in rng.integers(0, len(VOCAB), ln)]
        for _ in range(6):
            toks[rng.integers(0, len(toks))] = pool[
                rng.integers(0, len(pool))]
        texts.append(" ".join(toks))
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([LANGS[j] for j in rng.integers(0, 5, n)]),
        "source": pa.array([f"src{j}" for j in rng.integers(0, 20, n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, out_dir / "documents.parquet")


def gen_embeddings(n: int, out_dir: Path, seed: int = 7,
                   dim: int = 64, n_labels: int = 10) -> None:
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_labels, dim))
    labels = rng.integers(0, n_labels, n)
    vecs = (centers[labels] + rng.normal(0, 0.35, (n, dim))).astype(
        np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, out_dir / "embeddings.parquet")


def measure(spark, d: Path) -> dict:
    from logsqlite_spark.operators.dedup import (
        minhash_band_pairs, minhash_band_pairs_incremental, minhash_bands,
        shingle_jaccard_pairs, simhash_band_pairs, simhash_dup_groups)
    from logsqlite_spark.operators.clustering import (
        auto_k, seed_centroids, semantic_dedup_pairs)
    from logsqlite_spark.operators.similarity import ann_lsh_portable_topk
    from logsqlite_spark.operators.textstats import (
        winnow_fingerprints, winnow_matches, winnow_matches_incremental)

    docs = spark.read.parquet(str(d / "documents.parquet"))
    emb = spark.read.parquet(str(d / "embeddings.parquet"))
    # fixed 32-query panel: the scale axis is the CORPUS, queries are
    # the bounded broadcast side at any sf
    qs = emb.filter("vec_id < 32")
    out = {"n_docs": docs.count(), "n_vecs": emb.count()}
    for key, df in (
        ("jaccard_cand", shingle_jaccard_pairs(docs, threshold=0.0,
                                               max_doc_freq=64)),
        ("minhash_cand", minhash_band_pairs(docs, band_size=8)),
        ("simhash_groups", simhash_dup_groups(docs)),
        ("simhash_pairs", simhash_band_pairs(docs, n_bits=60, n_bands=6)),
        ("winnow_matches", winnow_matches(docs, min_shared=8)),
        # incremental twins (r9): batch = a fixed 10% slice, history =
        # the rest as inline columnar tables — output is the full
        # candidate set restricted to batch-involving pairs, so the
        # deployment gate is the same linearity bound (simhash's
        # incremental twin emits exactly |batch| rows — linear by
        # construction, nothing to measure)
        ("minhash_inc_cand", minhash_band_pairs_incremental(
            docs.filter("doc_id % 10 = 0"),
            minhash_bands(docs.filter("doc_id % 10 != 0"), band_size=8),
            band_size=8)),
        ("winnow_inc_matches", winnow_matches_incremental(
            docs.filter("doc_id % 10 = 0"),
            winnow_fingerprints(docs.filter("doc_id % 10 != 0")),
            min_shared=8)),
        # k larger than any candidate set => row count == candidate
        # pairs surviving the (band, chunk) join
        ("ann_lsh_cand", ann_lsh_portable_topk(qs, emb, k=1 << 30)),
        # tau=-1 keeps every within-cluster candidate; auto_k keeps
        # cluster population constant so the bound is linear
        ("semdedup_cand", semantic_dedup_pairs(
            emb, seed_centroids(emb, auto_k(emb)), tau=-1.0)),
    ):
        t0 = time.perf_counter()
        out[key] = df.count()
        out[key + "_s"] = round(time.perf_counter() - t0, 3)
    # substring-dedup leg (VERDICT r7 #6): total duplicated positions
    # under the salted two-level-aggregate plan — linear in corpus
    # size when dup injection is rate-constant (bench measured 1.011
    # at sf0.01->0.1; this extends the evidence a decade up)
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.textstats import repeated_ngram_stats

    t0 = time.perf_counter()
    out["substring_dup_positions"] = int(
        repeated_ngram_stats(docs)
        .agg(F.sum("n_dup_positions")).collect()[0][0] or 0)
    out["substring_dup_positions_s"] = round(time.perf_counter() - t0, 3)
    return out


def measure_emb_xl(spark, d: Path, ivf_index_dir: Path) -> dict:
    """Embeddings-only measurement for the --xl decade (VERDICT r5
    #7): SemDeDup candidate growth (the 1.116 exponent with the least
    gate headroom — the cluster-population cap should bind harder as
    n grows, pushing it toward 1.0) and IVF probe-candidate growth
    (the inverted lists should keep per-query candidates ~n * n_probe
    / n_clusters — linear in corpus size at fixed config)."""
    from logsqlite_spark.operators.clustering import (
        auto_k, seed_centroids, semantic_dedup_pairs)
    from logsqlite_spark.operators.similarity import ivf_sq_topk, ivf_topk

    emb = spark.read.parquet(str(d / "embeddings.parquet"))
    qs = emb.filter("vec_id < 32")
    out = {"n_vecs": emb.count()}
    for key, df in (
        ("semdedup_cand", semantic_dedup_pairs(
            emb, seed_centroids(emb, auto_k(emb)), tau=-1.0)),
        # k larger than any list => rows == candidates surviving the
        # n_probe inverted-list scan
        ("ivf_cand", ivf_topk(qs, emb, k=1 << 30,
                              index_path=str(ivf_index_dir / d.name))),
        # SQ∘IVF leg (VERDICT r7 #6): uncapped c and k surface every
        # stage-1 candidate the codes-only probed-list scan emits —
        # by construction the same probed set as plain IVF, so its
        # exponent must track ivf_cand's (~1.0); shares the index
        # artifact built by the ivf_cand call above
        ("ivf_sq_cand", ivf_sq_topk(qs, emb, k=1 << 30, c=1 << 30,
                                    index_path=str(ivf_index_dir / d.name))),
    ):
        t0 = time.perf_counter()
        out[key] = df.count()
        out[key + "_s"] = round(time.perf_counter() - t0, 3)
    return out


def measure_inc(spark, root: Path, lo: int, hi: int,
                batch_n: int = 500, reps: int = 3) -> dict:
    """Per-batch WALL-TIME curve for the round-9 incremental family
    (VERDICT r9 #5): fixed ``batch_n``-doc batch, at-rest history
    growing a decade (lo -> hi docs), artifacts pre-built untimed —
    exactly the continuous-ingest deployment shape.  The claim under
    test is "per batch, only the batch is tokenized/hashed; history
    contributes columnar index scans": an O(corpus)-per-batch path
    (e.g. re-tokenizing history) measures a time exponent near 1.0
    across the decade, an O(batch) path near 0 (plus the bounded
    history-columnar-scan term).  min-of-``reps`` per point — wall
    time is noisier than the candidate counts the batch paths gate
    on, so the inc gate is looser (INC_GATE) while still excluding
    any linear-in-history path by a wide margin.

    One corpus of ``hi + batch_n`` docs; histories are id-prefix
    subsets written to their own parquet dirs (at-rest files, so the
    dedup-index artifact takes its persisted path), the batch is the
    disjoint id-suffix.
    """
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        cc_merge_delta, connected_components, dedup_index_artifact,
        doc_digests_artifact, incremental_dedup_banded,
        incremental_dedup_indexed, minhash_band_pairs,
        minhash_band_pairs_incremental, minhash_bands,
        read_components_bucketed, simhash_dedup,
        simhash_groups_incremental, write_components_bucketed)

    d = root / "inc"
    d.mkdir()
    gen_documents(hi + batch_n, d)
    full = spark.read.parquet(str(d / "documents.parquet"))
    batch_dir = d / "batch"
    full.filter(F.col("doc_id") >= hi).write.parquet(str(batch_dir))
    batch = spark.read.parquet(str(batch_dir))

    def timed(thunk) -> tuple[float, int]:
        thunk()  # untimed warmup: JIT/codegen must not land in the
        # lo point only (it inflated lo and measured NEGATIVE
        # exponents on the genuinely-flat paths)
        best, out = math.inf, 0
        for _ in range(reps):
            t0 = time.perf_counter()
            out = thunk()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), out

    out: dict = {"batch_docs": batch.count()}
    # cc's edge input is FIXED across the decade (round 11): the
    # generated corpus yields 0 batch pairs at lo and 2 at hi, so the
    # real-pairs leg compared an empty CC against a non-empty one and
    # measured the loop's fixed overhead as a bogus history exponent.
    # Synthetic edges referencing only ids < lo exist in BOTH
    # histories: 250 batch->history merges + 100 never-seen pairs —
    # per-batch cost vs history size at constant batch work.
    cc_edges = spark.createDataFrame(
        [(hi + i, (i * 7) % lo) for i in range(250)]
        + [(hi + 250 + i, hi + 300 + i) for i in range(100)],
        "a_id long, b_id long").localCheckpoint(eager=True)
    for tag, n in (("lo", lo), ("hi", hi)):
        hd = d / f"hist_{tag}"
        full.filter(F.col("doc_id") < n).write.parquet(str(hd))
        hist = spark.read.parquet(str(hd))
        # ---- untimed artifact builds (build-once/serve-many) ----
        minhash_bands(hist, band_size=8).write.parquet(
            str(d / f"bands_{tag}"))
        bands = spark.read.parquet(str(d / f"bands_{tag}"))
        simhash_dedup(hist).write.parquet(str(d / f"fps_{tag}"))
        fps = spark.read.parquet(str(d / f"fps_{tag}"))
        index = dedup_index_artifact(hist)
        index.inverted.count()  # force build outside the timed reps
        digests = doc_digests_artifact(hist)
        digests.count()  # force build outside the timed reps
        # deployment layout: bucketed on doc_id so the batch-endpoint
        # label lookup prunes files (the unbucketed table measured a
        # 0.382 per-batch time exponent — a full 2-column history
        # scan per batch)
        write_components_bucketed(
            connected_components(minhash_band_pairs(hist, band_size=8)),
            str(d / f"comp_{tag}"))
        comp = read_components_bucketed(spark, str(d / f"comp_{tag}"))
        # the cc delta's input edges: the batch's inc pairs,
        # materialized untimed so cc timing isn't pair generation
        inc_pairs = minhash_band_pairs_incremental(
            batch, bands, band_size=8).localCheckpoint(eager=True)

        r: dict = {"hist_docs": hist.count()}
        r["minhash_inc_s"], r["minhash_inc_rows"] = timed(
            lambda: minhash_band_pairs_incremental(
                batch, bands, band_size=8).count())
        r["simhash_inc_s"], r["simhash_inc_rows"] = timed(
            lambda: simhash_groups_incremental(batch, fps).count())
        # deployment config: the absolute df cap (same knob class as
        # jaccard_cand's max_doc_freq=64 above) — without it a token
        # with df ∝ corpus under frac·n contributes O(corpus) matched
        # postings per batch (measured 0.67 time exponent uncapped)
        r["idx_inc_s"], r["idx_inc_rows"] = timed(
            lambda: incremental_dedup_indexed(
                batch, index, max_df=64).count())
        # round 12: the O(batch) deployment path — candidates from the
        # persisted bands artifact, exact-Jaccard confirm on candidates
        r["banded_inc_s"], r["banded_inc_rows"] = timed(
            lambda: incremental_dedup_banded(
                batch, hist, band_size=8, history_bands=bands,
                history_digests=digests).count())

        def cc_once():
            m, new_rows = cc_merge_delta(cc_edges, comp)
            return m.count() + new_rows.count()

        r["cc_inc_s"], r["cc_inc_rows"] = timed(cc_once)
        out[tag] = r
        print(f"# inc/{tag} ({n} hist docs): {r}", file=sys.stderr)
    return out


def measure_inc3(spark, root: Path, lo: int = 500_000,
                 hi: int = 5_000_000, batch_n: int = 500,
                 reps: int = 3) -> dict:
    """Third decade for the DEPLOYMENT incremental-dedup gate
    (VERDICT r15 #5): banded_inc per-batch wall time at 500k -> 5M
    at-rest history — the same fixed-batch protocol as measure_inc,
    restricted to the one deployment path so the 5M-doc artifact
    builds stay tractable (the full inc family builds five artifact
    sets; banded needs only bands + digests).  Run OFFLINE (like the
    r12 cand2 5M leg — the corpus gen alone is ~10 min); bench.py
    merges the committed result into the scale dict with provenance.
    """
    import shutil

    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        doc_digests_artifact,
        incremental_dedup_banded,
        minhash_bands,
    )

    d = root / "inc3"
    d.mkdir()
    t0 = time.perf_counter()
    gen_documents(hi + batch_n, d)
    print(f"# inc3 corpus gen: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    full = spark.read.parquet(str(d / "documents.parquet"))
    full.filter(F.col("doc_id") >= hi).write.parquet(str(d / "batch"))
    batch = spark.read.parquet(str(d / "batch"))

    out: dict = {"batch_docs": batch.count(), "reps": reps}
    for tag, n in (("lo", lo), ("hi", hi)):
        hd = d / f"hist_{tag}"
        full.filter(F.col("doc_id") < n).write.parquet(str(hd))
        hist = spark.read.parquet(str(hd))
        t0 = time.perf_counter()
        b = minhash_bands(hist, band_size=8)
        # the deployment artifact layout (r16): range-sorted by key so
        # the batch's collected-key In probe row-group-prunes the scan
        (b.repartitionByRange(
            max(spark.sparkContext.defaultParallelism, 8), "key")
         .sortWithinPartitions("key")
         .write.parquet(str(d / f"bands_{tag}")))
        bands = spark.read.parquet(str(d / f"bands_{tag}"))
        digests = doc_digests_artifact(hist)
        digests.count()
        print(f"# inc3/{tag} artifacts: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

        def run():
            return incremental_dedup_banded(
                batch, hist, band_size=8, history_bands=bands,
                history_digests=digests).count()

        run()  # untimed warmup
        best, rows = math.inf, 0
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = run()
            best = min(best, time.perf_counter() - t0)
        out[tag] = {"hist_docs": n, "banded_inc_s": round(best, 3),
                    "banded_inc_rows": rows}
        print(f"# inc3/{tag}: {out[tag]}", file=sys.stderr)
    ratio = out["hi"]["hist_docs"] / out["lo"]["hist_docs"]
    out["banded_inc3_time_exp"] = round(
        math.log(out["hi"]["banded_inc_s"]
                 / out["lo"]["banded_inc_s"]) / math.log(ratio), 3)
    shutil.rmtree(d, ignore_errors=True)
    return out


def measure_cand2(spark, root: Path, lo: int, hi: int) -> dict:
    """Second-decade candidate-OUTPUT counts for the two deployment
    near-dup paths (minhash band pairs at the deployment band_size,
    simhash exact-fingerprint groups).  The default candidate decade
    caps at ~50k docs because it also measures the quarantined audit
    lenses (simhash radius pairs ~n^1.6) and the exact-jaccard
    blocking join; this leg two-point-verifies output linearity for
    the paths that actually deploy at 100 TB."""
    from logsqlite_spark.operators.dedup import (
        minhash_band_pairs, simhash_dup_groups)

    out: dict = {}
    for tag, n in (("lo", lo), ("hi", hi)):
        d = root / f"cand2_{tag}"
        d.mkdir()
        gen_documents(n, d)
        docs = spark.read.parquet(str(d / "documents.parquet"))
        r: dict = {"n_docs": n}
        t0 = time.perf_counter()
        r["minhash_cand"] = minhash_band_pairs(docs, band_size=8).count()
        r["minhash_cand_s"] = round(time.perf_counter() - t0, 3)
        # deployment config (dedup_minhash_capped): degenerate band
        # buckets dropped at df > 16 BEFORE any doc list exists — the
        # knob that bounds pair output under dup-cluster growth (the
        # uncapped lens measures the corpus's intrinsic ~n·ln n pair
        # population; this one measures the engine's deployment path)
        t0 = time.perf_counter()
        r["minhash_cand_capped"] = minhash_band_pairs(
            docs, band_size=8, max_band_freq=16).count()
        r["minhash_cand_capped_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        r["simhash_groups"] = simhash_dup_groups(docs).count()
        r["simhash_groups_s"] = round(time.perf_counter() - t0, 3)
        out[tag] = r
        print(f"# cand2/{tag}: {r}", file=sys.stderr)
    d_ratio = hi / lo
    for key in ("minhash_cand", "minhash_cand_capped", "simhash_groups"):
        p_ratio = out["hi"][key] / max(out["lo"][key], 1)
        out[key + "_growth_exp"] = round(
            math.log(max(p_ratio, 1e-9)) / math.log(d_ratio), 3)
    return out


def gen_events(n: int, out_dir: Path, seed: int = 21) -> None:
    """Synthetic events in the driver corpus's shape (Jan 2024 span,
    5 types, positive values) for the drift/behavior decade legs."""
    rng = np.random.default_rng(seed)
    base = 1_704_067_200_000_000  # 2024-01-01 in µs
    span = 30 * 86_400_000_000
    types = np.array(["view", "click", "purchase", "signup", "error"])
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        # epoch-NANOS long — the engine's normalized ts representation
        "ts": pa.array((base + rng.integers(0, span, n)) * 1000,
                       pa.int64()),
        "user_id": pa.array(rng.integers(0, max(10, n // 40), n),
                            pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.lognormal(3, 1, n), 2)),
    })
    pq.write_table(tbl, out_dir / "events.parquet")


def measure_lex(spark, root: Path, lo: int, hi: int,
                reps: int = 3) -> dict:
    """Decade time-exponents for the round-10 tier: zipf / PMI /
    novelty over documents, PSI / entropy / gini over events — each is
    a one-scan (or vocab-bounded) shape that must stay ~linear
    (LEX_GATE on the wall-time exponent; output sizes are bounded by
    construction: per-lang / top-k / per-doc / per-type / per-user /
    one row)."""
    from logsqlite_spark.operators.anomaly import value_psi
    from logsqlite_spark.operators.analytics import (
        user_activity_entropy, user_activity_gini)
    from logsqlite_spark.operators.lexstats import (
        ngram_novelty, token_pmi_pairs, token_zipf_slope)

    def timed(thunk) -> tuple[float, int]:
        thunk()
        best, out = math.inf, 0
        for _ in range(reps):
            t0 = time.perf_counter()
            out = thunk()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), out

    out: dict = {}
    for tag, n in (("lo", lo), ("hi", hi)):
        d = root / f"lex_{tag}"
        d.mkdir()
        gen_documents(n, d)
        gen_events(n * 2, d)
        docs = spark.read.parquet(str(d / "documents.parquet"))
        ev = spark.read.parquet(str(d / "events.parquet"))
        r: dict = {"n_docs": n, "n_events": n * 2}
        r["zipf_s"], r["zipf_rows"] = timed(
            lambda: token_zipf_slope(docs).count())
        r["pmi_s"], r["pmi_rows"] = timed(
            lambda: token_pmi_pairs(docs).count())
        r["novelty_s"], r["novelty_rows"] = timed(
            lambda: ngram_novelty(docs).count())
        r["psi_s"], r["psi_rows"] = timed(
            lambda: value_psi(ev).count())
        r["entropy_s"], r["entropy_rows"] = timed(
            lambda: user_activity_entropy(ev).count())
        r["gini_s"], r["gini_rows"] = timed(
            lambda: user_activity_gini(ev).count())
        out[tag] = r
        print(f"# lex/{tag} ({n} docs): {r}", file=sys.stderr)
    return out


LEX_PATHS = ("zipf", "pmi", "novelty", "psi", "entropy", "gini")
LEX_GATE = 1.3

# gated deployment paths: per-batch time must stay ~flat across a
# history decade.  idx_inc (exact-Jaccard inverted postings) is
# REPORT-ONLY since round 12: its O(corpus-columnar-scan) term is
# structural (NOTES_r11 §8 — ~200 rows/doc postings, no layout can
# file-prune a uniform batch), measured 0.41-0.53 across decades, and
# banded_inc (bands-artifact candidates + confirm-on-candidates) is
# the deployment replacement at 0.056.  Kept as the bounded-corpus
# precision lens, reported under the same key for trend continuity.
INC_PATHS = ("minhash_inc", "simhash_inc", "cc_inc", "banded_inc")
INC_AUDIT_PATHS = ("idx_inc",)
INC_GATE = 0.5

DEPLOYMENT_PATHS = ("jaccard_cand", "minhash_cand", "simhash_groups",
                    "winnow_matches", "minhash_inc_cand",
                    "winnow_inc_matches", "ann_lsh_cand", "semdedup_cand",
                    "substring_dup_positions")
AUDIT_PATHS = ("simhash_pairs",)
XL_PATHS = ("semdedup_cand", "ivf_cand", "ivf_sq_cand")
GATE = 1.15


#: The cores-probe query set (VERDICT r16 #5): the top bench queries
#: by measured cost — the ones whose 100 TB story rests on parallel
#: scaling.  ingest_100k_lines rides along via bench._ingest_bench_once.
CORES_PROBE_QUERIES = [
    "dedup_incremental_banded",
    "dedup_lsh_precision",
    "semantic_dedup_pairs",
    "text_winnow_matches",
    "text_winnow_matches_inc",
    "token_pmi_pairs",
    "dedup_minhash_pairs",
    "dedup_minhash_inc",
]

_CORES_BLOCK = r"""
import json, os, statistics, sys, time
sys.path.insert(0, %(repo)r)
from logsqlite_spark.session import get_spark
from logsqlite_spark import registry
spark = get_spark("cores-probe")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
qs = registry.queries()
out = {}
for name in %(names)r:
    fn = qs[name]
    for _ in range(2):
        fn(spark, sf_dir).collect()  # warmups (artifact builds land here)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter(); len(fn(spark, sf_dir).collect())
        reps.append(time.perf_counter() - t0)
    out[name] = round(statistics.median(reps), 3)
    print("#", name, out[name], file=sys.stderr, flush=True)
import bench as B
B._ingest_bench_once(spark, "plog")  # untimed warmup
reps = []
for _ in range(3):
    dt, _d = B._ingest_bench_once(spark, "plog")
    reps.append(dt)
out["ingest_100k_lines"] = round(statistics.median(reps), 3)
print("CORESBLOCK " + json.dumps(out))
"""


def measure_cores_probe(root: Path, n_docs: int, cores_hi: int,
                        cores_lo: int) -> dict:
    """8-vs-32-core scaling at a SF where queries are compute-bound
    (VERDICT r16 #5): sf0.1 is overhead-dominated (every 8v32 ratio
    reads ~1 because each query is sub-3s of mostly fixed driver/JVM
    cost and single-split scans), so the bench's scaling block cannot
    demonstrate parallelism at all.  This probe generates a 10x corpus
    (the sf1-equivalent document/embedding tables) and times the
    heavy queries in FRESH subprocesses per core count (master
    local[N] from SPARK_GRAFT_CPUS — the same env contract the driver
    uses), 1+3 reps, median.  ratio = sec@lo_cores / sec@hi_cores;
    parallel-scaling paths must read well above 1 (perfect scaling
    would read cores_hi/cores_lo)."""
    import subprocess

    d = root / "cores"
    d.mkdir()
    gen_documents(n_docs, d)
    gen_embeddings(max(2000, (n_docs * 2) // 5), d)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    block = _CORES_BLOCK % {"repo": repo, "names": CORES_PROBE_QUERIES}
    out: dict = {"probe_docs": n_docs, "cores_hi": cores_hi,
                 "cores_lo": cores_lo}
    for tag, cores in (("hi", cores_hi), ("lo", cores_lo)):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cores)
        env.pop("SPARK_MASTER", None)
        env["SPARK_GRAFT_SF_DIR"] = str(d)
        t0 = time.perf_counter()
        p = subprocess.run([sys.executable, "-c", block], env=env,
                           capture_output=True, text=True,
                           timeout=7200, cwd=repo)
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("CORESBLOCK "):
                rec = json.loads(line[11:])
        if rec is None:
            raise RuntimeError(
                f"cores-probe block ({cores} cores) produced no "
                f"record:\n{p.stderr[-3000:]}")
        out[tag] = rec
        print(f"# cores/{tag} ({cores} cores) measured in "
              f"{time.perf_counter() - t0:.0f}s: {rec}",
              file=sys.stderr, flush=True)
    out["per_query"] = {
        q: {"hi_s": out["hi"][q], "lo_s": out["lo"][q],
            "ratio": round(out["lo"][q] / max(out["hi"][q], 1e-9), 3)}
        for q in out["hi"]
    }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=5000)
    ap.add_argument("--hi", type=int, default=50000)
    ap.add_argument("--keep", action="store_true",
                    help="keep the generated corpora on disk")
    ap.add_argument("--xl", action="store_true",
                    help="also run the embeddings-only decade above "
                         "--hi (hi -> 10*hi docs-equivalent, i.e. "
                         "2*hi/5 -> 4*hi vectors) for the SemDeDup "
                         "and IVF candidate paths")
    ap.add_argument("--inc", action="store_true",
                    help="also measure fixed-batch per-batch wall time "
                         "vs a decade of history growth for the "
                         "round-9 incremental family")
    ap.add_argument("--inc-only", action="store_true",
                    help="run ONLY the --inc legs (skips the candidate"
                         "-growth decade)")
    ap.add_argument("--lex", action="store_true",
                    help="also measure decade time exponents for the "
                         "round-10 tier (zipf/PMI/novelty over docs, "
                         "PSI/entropy/gini over events)")
    ap.add_argument("--lex-only", action="store_true",
                    help="run ONLY the --lex legs")
    ap.add_argument("--inc3", action="store_true",
                    help="run ONLY the banded_inc third decade "
                         "(500k -> 5M history; offline like --cand2 "
                         "at this size) and write SCALE_INC3.json")
    ap.add_argument("--cores-probe", action="store_true",
                    help="run ONLY the 8-vs-32-core scaling probe of "
                         "the heavy queries at a 10x corpus (the sf1 "
                         "equivalent; offline — corpus gen + two "
                         "fresh-JVM suites) and write SCALE_CORES.json")
    ap.add_argument("--probe-docs", type=int, default=50_000)
    ap.add_argument("--cores-hi", type=int, default=32)
    ap.add_argument("--cores-lo", type=int, default=8)
    ap.add_argument("--cand2", action="store_true",
                    help="run ONLY the second-decade candidate-output "
                         "leg for the two deployment near-dup paths "
                         "(minhash bands, simhash groups) — the full "
                         "candidate decade includes audit lenses that "
                         "are intentionally super-linear and "
                         "prohibitively large past ~100k docs")
    args = ap.parse_args()

    if args.cores_probe:
        # no parent Spark session: each core count runs in its own
        # fresh subprocess JVM (the probe IS the process boundary)
        root = Path(tempfile.mkdtemp(prefix="scale_cores_"))
        try:
            rec = measure_cores_probe(root, args.probe_docs,
                                      args.cores_hi, args.cores_lo)
        finally:
            if not args.keep:
                shutil.rmtree(root, ignore_errors=True)
        import subprocess as _sp
        try:
            rec["git_head"] = _sp.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
                capture_output=True, text=True,
                check=True).stdout.strip()
        except Exception:  # noqa: BLE001
            pass
        out_p = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_CORES.json")
        with open(out_p, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"# wrote {out_p}", file=sys.stderr)
        print(json.dumps({"per_query": rec["per_query"]}))
        return 0

    from logsqlite_spark.session import get_spark
    spark = get_spark()

    root = Path(tempfile.mkdtemp(prefix="scale_evidence_"))
    res: dict = {"lo_docs": args.lo, "hi_docs": args.hi}
    skip_decade = (args.inc_only or args.lex_only or args.cand2
                   or args.inc3)
    if args.inc_only:
        args.inc = True
    if args.lex_only:
        args.lex = True
    try:
        for tag, n in (() if skip_decade
                       else (("lo", args.lo), ("hi", args.hi))):
            d = root / tag
            d.mkdir()
            gen_documents(n, d)
            gen_embeddings(max(2000, (n * 2) // 5), d)
            t0 = time.perf_counter()
            res[tag] = measure(spark, d)
            print(f"# {tag} ({n} docs) measured in "
                  f"{time.perf_counter() - t0:.1f}s: {res[tag]}",
                  file=sys.stderr)
        if args.cand2:
            res["cand2"] = measure_cand2(spark, root, args.lo, args.hi)
        if args.inc3:
            import subprocess as _sp
            res["inc3"] = measure_inc3(spark, root)
            try:
                res["inc3"]["git_head"] = _sp.run(
                    ["git", "rev-parse", "--short", "HEAD"],
                    cwd=os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                    capture_output=True, text=True,
                    check=True).stdout.strip()
            except Exception:  # noqa: BLE001
                pass
            out_p = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "SCALE_INC3.json")
            with open(out_p, "w") as fh:
                json.dump(res["inc3"], fh, indent=1)
            print(f"# wrote {out_p}", file=sys.stderr)
        if args.inc and not args.lex_only:
            res["inc"] = measure_inc(spark, root, args.lo, args.hi)
        if args.lex:
            res["lex"] = measure_lex(spark, root, args.lo, args.hi)
        if args.xl:
            # the xl decade reuses hi's vector count as its LO so the
            # exponent spans exactly one decade of corpus growth
            for tag, nv in (("xlo", max(2000, (args.hi * 2) // 5)),
                            ("xhi", args.hi * 4)):
                d = root / tag
                d.mkdir()
                gen_embeddings(nv, d)
                t0 = time.perf_counter()
                res[tag] = measure_emb_xl(spark, d, root / "ivf_idx")
                print(f"# {tag} ({nv} vecs) measured in "
                      f"{time.perf_counter() - t0:.1f}s: {res[tag]}",
                      file=sys.stderr)
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)

    bad = []
    for key in () if skip_decade else DEPLOYMENT_PATHS + AUDIT_PATHS:
        axis = ("n_vecs" if key in ("ann_lsh_cand", "semdedup_cand")
                else "n_docs")
        d_ratio = res["hi"][axis] / res["lo"][axis]
        if res["hi"][key] == 0 or res["lo"][key] == 0:
            # 0-output is a (vacuously linear) bound, not evidence —
            # flag it so a degenerate corpus can't silently "pass"
            res[key + "_growth_exp"] = None
            if key in DEPLOYMENT_PATHS:
                bad.append((key, "degenerate: zero output"))
            continue
        p_ratio = res["hi"][key] / res["lo"][key]
        exp = round(math.log(p_ratio) / math.log(d_ratio), 3)
        res[key + "_growth_exp"] = exp
        if key in DEPLOYMENT_PATHS and exp > GATE:
            bad.append((key, exp))
    if args.xl:
        d_ratio = res["xhi"]["n_vecs"] / res["xlo"]["n_vecs"]
        for key in XL_PATHS:
            if res["xhi"][key] == 0 or res["xlo"][key] == 0:
                res[key + "_xl_growth_exp"] = None
                bad.append((key + "_xl", "degenerate: zero output"))
                continue
            p_ratio = res["xhi"][key] / res["xlo"][key]
            exp = round(math.log(p_ratio) / math.log(d_ratio), 3)
            res[key + "_xl_growth_exp"] = exp
            if exp > GATE:
                bad.append((key + "_xl", exp))
    if args.lex:
        lex = res["lex"]
        d_ratio = lex["hi"]["n_docs"] / lex["lo"]["n_docs"]
        for key in LEX_PATHS:
            t_lo, t_hi = lex["lo"][key + "_s"], lex["hi"][key + "_s"]
            exp = round(math.log(t_hi / t_lo) / math.log(d_ratio), 3)
            lex[key + "_time_exp"] = exp
            if exp > LEX_GATE:
                bad.append((key + "_lex_time", exp))
        lex["gate"] = LEX_GATE
    if args.inc and "inc" in res:
        inc = res["inc"]
        h_ratio = inc["hi"]["hist_docs"] / inc["lo"]["hist_docs"]
        for key in INC_PATHS + INC_AUDIT_PATHS:
            t_lo, t_hi = inc["lo"][key + "_s"], inc["hi"][key + "_s"]
            exp = round(math.log(t_hi / t_lo) / math.log(h_ratio), 3)
            inc[key + "_time_exp"] = exp
            if key in INC_PATHS and exp > INC_GATE:
                bad.append((key + "_inc_time", exp))
        inc["gate"] = INC_GATE
        inc["audit_only"] = list(INC_AUDIT_PATHS)
    res["gate"] = GATE
    res["deployment_ok"] = not bad
    print(json.dumps(res))
    if bad:
        print(f"# FAIL: deployment paths above gate {GATE}: {bad}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

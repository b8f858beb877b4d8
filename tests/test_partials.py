"""Partial-log reassembly (entry.proto partial metadata semantics)."""

import pytest

from logsqlite_spark.operators.partials import reassemble_partials

@pytest.fixture()
def logs_with_partials(spark):
    rows = [
        # whole lines
        (1, 10, "stdout", "short\n", False, None, "c1"),
        (5, 50, "stdout", "another\n", False, None, "c1"),
        # a 3-fragment long line (id p1), fragments arrive in order
        (2, 20, "stdout", "AAA\n", True, (False, "p1", 1), "c1"),
        (3, 21, "stdout", "BBB\n", True, (False, "p1", 2), "c1"),
        (4, 22, "stdout", "CCC\n", True, (True, "p1", 3), "c1"),
        # a 2-fragment line on another container, out-of-order arrival
        (1, 30, "stderr", "tail\n", True, (True, "q1", 2), "c2"),
        (2, 29, "stderr", "head-\n", True, (False, "q1", 1), "c2"),
    ]
    return spark.createDataFrame(
        rows,
        "seq long, ts_nanos long, source string, line string, partial boolean, "
        "partial_meta struct<last:boolean,id:string,ordinal:int>, container_id string",
    )

def test_reassembles_in_ordinal_order(logs_with_partials):
    out = {(r["container_id"], r["seq"]): r["line"]
           for r in reassemble_partials(logs_with_partials).collect()}
    assert out[("c1", 2)] == "AAABBBCCC\n"

def test_out_of_order_fragments_sort_by_ordinal(logs_with_partials):
    out = {(r["container_id"], r["seq"]): r["line"]
           for r in reassemble_partials(logs_with_partials).collect()}
    # merged row takes the first fragment's seq (min), text in ordinal order
    assert out[("c2", 1)] == "head-tail\n"

def test_whole_lines_pass_through(logs_with_partials):
    out = reassemble_partials(logs_with_partials)
    assert out.count() == 4  # 2 whole + 2 merged
    got = {(r["container_id"], r["seq"]): r["line"] for r in out.collect()}
    assert got[("c1", 1)] == "short\n"
    assert got[("c1", 5)] == "another\n"


def test_bigram_lm_sink_matches_one_shot_and_batch_api(spark, tmp_path):
    """Two micro-batches through the LM sink: the snapshot equals the
    one-shot LM tables over the union, and batch-2's emitted scores
    equal the batch API against the batch-1 LM."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.textstats import (
        bigram_lm_artifact,
        bigram_logprob_incremental,
    )
    from logsqlite_spark.streaming.partials import (
        bigram_lm_sink,
        snapshot_lm,
    )

    DOCS = "doc_id long, text string"
    b1_rows = [(1, "a a b c"), (2, "a b")]
    b2_rows = [(10, "a b z"), (11, "q")]
    root = str(tmp_path / "lm")
    scores = str(tmp_path / "scores")
    sink = bigram_lm_sink(root, scores_dir=scores)
    b1 = spark.createDataFrame(b1_rows, DOCS)
    b2 = spark.createDataFrame(b2_rows, DOCS)
    sink(b1, 0)
    sink(b2, 1)

    union = spark.createDataFrame(b1_rows + b2_rows, DOCS)
    want = bigram_lm_artifact(union)
    got = snapshot_lm(spark, root)
    for g, w in zip(got, want):
        assert sorted(map(tuple, g.collect())) == \
            sorted(map(tuple, w.collect()))

    emitted = spark.read.parquet(scores).filter(F.col("doc_id") >= 10)
    want2 = bigram_logprob_incremental(b2, *bigram_lm_artifact(b1))
    assert sorted(map(tuple, emitted.collect())) == \
        sorted(map(tuple, want2.collect()))

    # replay is a no-op
    sink(b2, 1)
    got2 = snapshot_lm(spark, root)
    assert sorted(map(tuple, got2[0].collect())) == \
        sorted(map(tuple, want[0].collect()))


def test_lm_snapshot_erase_equals_built_without(spark, tmp_path):
    """Erase leg of the LM lifecycle: retracting batch-1's texts
    leaves the snapshot value-identical to an LM built from batch 2
    alone; retracting never-ingested text is detected (negative
    counts) and refused without moving the pointer."""
    import pytest

    from logsqlite_spark.operators.textstats import bigram_lm_artifact
    from logsqlite_spark.streaming.partials import (
        bigram_lm_sink,
        erase_from_lm_snapshot,
        read_pointer,
        snapshot_lm,
    )

    DOCS = "doc_id long, text string"
    b1_rows = [(1, "a a b c"), (2, "a b")]
    b2_rows = [(10, "a b z"), (11, "q")]
    root = str(tmp_path / "lm")
    sink = bigram_lm_sink(root)
    b1 = spark.createDataFrame(b1_rows, DOCS)
    b2 = spark.createDataFrame(b2_rows, DOCS)
    sink(b1, 0)
    sink(b2, 1)

    erase_from_lm_snapshot(spark, root, b1)
    want = bigram_lm_artifact(b2)  # inline tables (no inputFiles)
    got = snapshot_lm(spark, root)
    for g, w in zip(got, want):
        assert sorted(map(tuple, g.collect())) == \
            sorted(map(tuple, w.collect()))

    ver_before = read_pointer(root)
    bogus = spark.createDataFrame([(99, "zzz zzz")], DOCS)
    with pytest.raises(ValueError, match="negative"):
        erase_from_lm_snapshot(spark, root, bogus)
    assert read_pointer(root) == ver_before
    got2 = snapshot_lm(spark, root)
    for g, w in zip(got2, want):
        assert sorted(map(tuple, g.collect())) == \
            sorted(map(tuple, w.collect()))


def _pca_rows(vals):
    return [(i, list(map(float, v))) for i, v in enumerate(vals)]


_PCA_SCHEMA = "vec_id long, embedding array<double>"
_B1 = [[0.11, -0.42, 0.30], [0.95, 0.27, -0.18], [-0.33, 0.64, 0.52]]
_B2 = [[0.48, -0.05, 0.77], [-0.81, 0.12, 0.09]]


def test_pca_stats_sink_exact_merge_and_replay(spark, tmp_path):
    """Two micro-batches through the PCA stats sink: the snapshot
    equals the one-shot quantized stats over the union BIT-IDENTICALLY
    (exact decimal sums), replay is a no-op, and the model fitted from
    the snapshot matches numpy PCA of the quantized union."""
    import numpy as np

    from logsqlite_spark.operators.linalg import (
        QUANT,
        fit_pca_from_stats,
        gramian_stats_df,
    )
    from logsqlite_spark.streaming.partials import (
        pca_stats_sink,
        snapshot_pca_stats,
    )

    root = str(tmp_path / "pca")
    sink = pca_stats_sink(root)
    b1 = spark.createDataFrame(_pca_rows(_B1), _PCA_SCHEMA)
    b2 = spark.createDataFrame(
        [(i + 10, v) for i, v in _pca_rows(_B2)], _PCA_SCHEMA)
    sink(b1, 0)
    sink(b2, 1)

    union = spark.createDataFrame(
        _pca_rows(_B1) + [(i + 10, v) for i, v in _pca_rows(_B2)],
        _PCA_SCHEMA)
    want = sorted(map(tuple, gramian_stats_df(union).collect()))
    got = sorted(map(tuple,
                     snapshot_pca_stats(spark, root).collect()))
    assert got == want

    sink(b2, 1)  # crash-replayed micro-batch: already merged
    assert sorted(map(tuple, snapshot_pca_stats(spark, root)
                      .collect())) == want

    # fit from the snapshot ≡ numpy PCA of the quantized union
    mu, W, ev, n = fit_pca_from_stats(
        snapshot_pca_stats(spark, root), k=2)
    X = np.floor(np.array(_B1 + _B2) * QUANT) / QUANT
    rmu = X.mean(axis=0)
    vals, vecs = np.linalg.eigh(np.cov(X.T))
    order = np.argsort(vals)[::-1][:2]
    rW, rev = vecs[:, order], vals[order]
    for j in range(2):
        i = int(np.argmax(np.abs(rW[:, j])))
        if rW[i, j] < 0:
            rW[:, j] = -rW[:, j]
    assert n == len(X)
    assert np.allclose(mu, rmu, atol=1e-9)
    assert np.allclose(ev, rev, atol=1e-9)
    assert np.allclose(W, rW, atol=1e-7)


def test_pca_snapshot_erase_equals_built_without(spark, tmp_path):
    """Erase leg: retracting batch 1 leaves the stats bit-identical to
    batch 2 alone; a never-ingested retraction drives a Gramian
    diagonal negative and is refused without moving the pointer; a
    dimension change is refused loudly."""
    import pytest

    from logsqlite_spark.operators.linalg import gramian_stats_df
    from logsqlite_spark.streaming.partials import (
        erase_from_pca_snapshot,
        pca_stats_sink,
        read_pointer,
        snapshot_pca_stats,
    )

    root = str(tmp_path / "pca")
    sink = pca_stats_sink(root)
    b1 = spark.createDataFrame(_pca_rows(_B1), _PCA_SCHEMA)
    b2 = spark.createDataFrame(
        [(i + 10, v) for i, v in _pca_rows(_B2)], _PCA_SCHEMA)
    sink(b1, 0)
    sink(b2, 1)

    erase_from_pca_snapshot(spark, root, b1)
    want = sorted(map(tuple, gramian_stats_df(b2).collect()))
    assert sorted(map(tuple, snapshot_pca_stats(spark, root)
                      .collect())) == want

    ver_before = read_pointer(root)
    bogus = spark.createDataFrame(
        [(99, [9.0, 9.0, 9.0])], _PCA_SCHEMA)
    with pytest.raises(ValueError, match="negative"):
        erase_from_pca_snapshot(spark, root, bogus)
    assert read_pointer(root) == ver_before
    assert sorted(map(tuple, snapshot_pca_stats(spark, root)
                      .collect())) == want

    wrong_d = spark.createDataFrame(
        [(100, [0.1, 0.2])], _PCA_SCHEMA)
    with pytest.raises(ValueError, match="dimension"):
        erase_from_pca_snapshot(spark, root, wrong_d)


_PSI_SCHEMA = "event_id long, ts long, event_type string, value double"
_PSI_SPLIT = 1705363200000000


def _psi_rows(vals, start_id=0, cur=False):
    ts = (_PSI_SPLIT + (10 if cur else -10)) * 1000
    return [(start_id + i, ts, "t", float(v)) for i, v in enumerate(vals)]


def test_psi_counts_sink_exact_merge_and_replay(spark, tmp_path):
    """Two micro-batches through the PSI sink: the snapshot serves a
    report bit-identical to one-shot value_psi over the union; a
    replayed batch id is a no-op."""
    from logsqlite_spark.operators.anomaly import (
        value_psi,
        value_psi_from_counts,
    )
    from logsqlite_spark.streaming.partials import (
        psi_counts_sink,
        snapshot_psi_counts,
    )

    root = str(tmp_path / "psi")
    sink = psi_counts_sink(root)
    r1 = _psi_rows([10, 60, 110], 0) + _psi_rows([10, 210], 100, cur=True)
    r2 = _psi_rows([60, 310], 200) + _psi_rows([410], 300, cur=True)
    b1 = spark.createDataFrame(r1, _PSI_SCHEMA)
    b2 = spark.createDataFrame(r2, _PSI_SCHEMA)
    sink(b1, 0)
    sink(b2, 1)
    sink(b1, 0)  # crash replay: already merged, must not double-count

    union = spark.createDataFrame(r1 + r2, _PSI_SCHEMA)
    got = sorted(map(tuple, value_psi_from_counts(
        snapshot_psi_counts(spark, root)).collect()))
    want = sorted(map(tuple, value_psi(union).collect()))
    assert got == want and len(want) == 1


def test_erase_from_psi_snapshot_bit_identical_and_refuses(spark, tmp_path):
    """Erasing batch 1 leaves the snapshot equal to built-without;
    retracting never-ingested events refuses and leaves the pointer
    on the pre-erase version."""
    import pytest as _pytest

    from logsqlite_spark.operators.anomaly import psi_bin_counts
    from logsqlite_spark.streaming.partials import (
        erase_from_psi_snapshot,
        psi_counts_sink,
        snapshot_psi_counts,
    )

    root = str(tmp_path / "psi")
    sink = psi_counts_sink(root)
    r1 = _psi_rows([10, 60], 0) + _psi_rows([210], 100, cur=True)
    r2 = _psi_rows([310, 310], 200)
    b1 = spark.createDataFrame(r1, _PSI_SCHEMA)
    b2 = spark.createDataFrame(r2, _PSI_SCHEMA)
    sink(b1, 0)
    sink(b2, 1)

    erase_from_psi_snapshot(spark, root, b1)
    got = sorted(map(tuple, snapshot_psi_counts(spark, root).collect()))
    want = sorted(map(tuple, psi_bin_counts(b2).collect()))
    assert got == want

    bogus = spark.createDataFrame(
        _psi_rows([10, 10, 10], 900), _PSI_SCHEMA)
    before = sorted(map(tuple, snapshot_psi_counts(spark, root).collect()))
    with _pytest.raises(ValueError, match="negative"):
        erase_from_psi_snapshot(spark, root, bogus)
    after = sorted(map(tuple, snapshot_psi_counts(spark, root).collect()))
    assert after == before

    # ADVICE r10: a rejected retraction must leave NO orphan version
    # dir (or staging residue) — only the pointer's version exists
    import os

    from logsqlite_spark.streaming.partials import read_pointer
    ver, _ = read_pointer(root)
    on_disk = {n for n in os.listdir(root)
               if n.startswith("v") and n[1:].isdigit()}
    assert on_disk <= {f"v{v:08d}" for v in range(1, ver + 1)}
    assert f"v{ver + 1:08d}" not in on_disk
    assert ".erase_stage" not in os.listdir(root)


_LEX_SCHEMA = "doc_id long, text string, lang string"


def _lex_docs(spark, rows):
    return spark.createDataFrame(rows, _LEX_SCHEMA)


def test_lex_counts_sink_exact_merge_and_replay(spark, tmp_path):
    """Two micro-batches through the lexical sink: the snapshot serves
    a Zipf report bit-identical to one-shot token_zipf_slope over the
    union; a replayed batch id is a no-op."""
    from logsqlite_spark.operators.lexstats import (
        token_zipf_slope,
        zipf_slope_from_counts,
    )
    from logsqlite_spark.streaming.partials import (
        lex_counts_sink,
        snapshot_lex_counts,
    )

    root = str(tmp_path / "lex")
    sink = lex_counts_sink(root)
    r1 = [(0, "the quick brown fox the fox", "en"),
          (1, "le renard brun le le", "fr")]
    r2 = [(2, "the lazy dog the dog and the fox", "en"),
          (3, "quick quick brown", "en")]
    sink(_lex_docs(spark, r1), 0)
    sink(_lex_docs(spark, r2), 1)
    sink(_lex_docs(spark, r1), 0)  # crash replay: must not double-count

    got = sorted(map(tuple, zipf_slope_from_counts(
        snapshot_lex_counts(spark, root)).collect()))
    want = sorted(map(tuple, token_zipf_slope(
        _lex_docs(spark, r1 + r2)).collect()))
    assert got == want and len(want) == 2


def test_erase_from_lex_snapshot_bit_identical_and_refuses(spark, tmp_path):
    """Erasing batch 1 leaves the snapshot equal to built-without;
    retracting never-ingested docs refuses, leaves the pointer on the
    pre-erase version, and leaves no orphan version dir."""
    import os

    import pytest as _pytest

    from logsqlite_spark.operators.lexstats import lang_token_counts
    from logsqlite_spark.streaming.partials import (
        erase_from_lex_snapshot,
        lex_counts_sink,
        read_pointer,
        snapshot_lex_counts,
    )

    root = str(tmp_path / "lex")
    sink = lex_counts_sink(root)
    r1 = [(0, "alpha beta alpha", "en")]
    r2 = [(1, "beta gamma", "en"), (2, "delta delta", "de")]
    sink(_lex_docs(spark, r1), 0)
    sink(_lex_docs(spark, r2), 1)

    erase_from_lex_snapshot(spark, root, _lex_docs(spark, r1))
    got = sorted(map(tuple, snapshot_lex_counts(spark, root).collect()))
    want = sorted(map(tuple, lang_token_counts(
        _lex_docs(spark, r2)).collect()))
    assert got == want

    bogus = _lex_docs(spark, [(9, "alpha alpha alpha alpha", "en")])
    before = sorted(map(tuple, snapshot_lex_counts(spark, root).collect()))
    with _pytest.raises(ValueError, match="negative"):
        erase_from_lex_snapshot(spark, root, bogus)
    after = sorted(map(tuple, snapshot_lex_counts(spark, root).collect()))
    assert after == before
    ver, _ = read_pointer(root)
    on_disk = {n for n in os.listdir(root)
               if n.startswith("v") and n[1:].isdigit()}
    assert f"v{ver + 1:08d}" not in on_disk
    assert ".erase_stage" not in os.listdir(root)


_DC_SCHEMA = "event_id long, ts long, event_type string, value double"
_DC_BASE = 1_704_067_200_000_000_000
_DC_DAY = 86_400_000_000_000


def _dc_events(spark, day_counts, start_id=0, etype="view"):
    rows = []
    eid = start_id
    for d, c in day_counts:
        for _ in range(c):
            rows.append((eid, _DC_BASE + d * _DC_DAY + eid, etype, 1.0))
            eid += 1
    return spark.createDataFrame(rows, _DC_SCHEMA)


def test_daily_counts_sink_exact_merge_replay_and_serving(spark, tmp_path):
    """Two micro-batches through the daily-counts sink: the burst
    report served from the snapshot is bit-identical to one-shot
    daily_burst_zscore over the union; replay is a no-op."""
    from logsqlite_spark.operators.anomaly import (
        daily_burst_from_counts,
        daily_burst_zscore,
    )
    from logsqlite_spark.streaming.partials import (
        daily_counts_sink,
        snapshot_daily_counts,
    )

    root = str(tmp_path / "dc")
    sink = daily_counts_sink(root)
    b1 = _dc_events(spark, [(0, 10), (1, 11), (2, 10), (3, 9)])
    b2 = _dc_events(spark, [(3, 2), (4, 10), (5, 60)], start_id=1000)
    sink(b1, 0)
    sink(b2, 1)
    sink(b1, 0)  # crash replay: must not double-count

    got = sorted(map(tuple, daily_burst_from_counts(
        snapshot_daily_counts(spark, root)).collect()))
    union = _dc_events(spark, [(0, 10), (1, 11), (2, 10), (3, 11),
                               (4, 10), (5, 60)])
    want = sorted(map(tuple, daily_burst_zscore(union).collect()))
    assert got == want and len(want) > 0
    assert any(r[4] == "burst" for r in got)


def test_erase_from_daily_counts_bit_identical_and_refuses(spark, tmp_path):
    """Erasing batch 1 leaves the snapshot equal to built-without;
    retracting never-ingested events refuses with no orphan dir."""
    import os

    import pytest as _pytest

    from logsqlite_spark.streaming.partials import (
        daily_counts_sink,
        erase_from_daily_counts,
        read_pointer,
        snapshot_daily_counts,
    )

    root = str(tmp_path / "dc")
    sink = daily_counts_sink(root)
    b1 = _dc_events(spark, [(0, 5), (1, 3)])
    b2 = _dc_events(spark, [(1, 2), (2, 7)], start_id=500)
    sink(b1, 0)
    sink(b2, 1)

    erase_from_daily_counts(spark, root, b1)
    got = sorted(map(tuple,
                     snapshot_daily_counts(spark, root).collect()))
    assert got == [("view", __import__("datetime").date(2024, 1, 2), 2),
                   ("view", __import__("datetime").date(2024, 1, 3), 7)]

    bogus = _dc_events(spark, [(2, 50)], start_id=900)
    before = got
    with _pytest.raises(ValueError, match="negative"):
        erase_from_daily_counts(spark, root, bogus)
    after = sorted(map(tuple,
                       snapshot_daily_counts(spark, root).collect()))
    assert after == before
    ver, _ = read_pointer(root)
    assert f"v{ver + 1:08d}" not in os.listdir(root)
    assert ".erase_stage" not in os.listdir(root)

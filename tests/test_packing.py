"""Sequence packing invariants (greedy per-bucket fill)."""

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.operators.packing import pack_sequences, pack_stats


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_packs_respect_budget_and_cover_all_docs(spark, sf_dir):
    from logsqlite_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=128)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc packed exactly once
    fills = {}
    for r in rows:
        if not r.truncated:
            fills[r.pack_id] = fills.get(r.pack_id, 0) + r.token_count
    assert fills and all(v <= 128 for v in fills.values())


def test_offsets_are_contiguous_within_pack(spark):
    docs = _docs(spark, ["a b c", "d e", "f g h i", "j"])
    # one bucket so everything packs together deterministically
    rows = sorted(pack_sequences(docs, budget=6, n_buckets=1).collect(),
                  key=lambda r: (r.pack_id, r.offset))
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r)
    for members in by_pack.values():
        expect = 0
        for m in members:
            assert m.offset == expect
            expect += m.token_count
        assert expect <= 6


def test_oversized_doc_gets_own_truncated_pack(spark):
    docs = _docs(spark, ["one two", " ".join(["t"] * 50), "three four"])
    rows = {r.doc_id: r for r in
            pack_sequences(docs, budget=10, n_buckets=1).collect()}
    assert rows[1].truncated
    # nothing else shares the oversized doc's pack
    assert [r.doc_id for r in rows.values()
            if r.pack_id == rows[1].pack_id] == [1]
    assert not rows[0].truncated and not rows[2].truncated


def test_packing_deterministic_under_repartition(spark, sf_dir):
    from logsqlite_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    a = sorted((r.doc_id, r.pack_id, r.offset)
               for r in pack_sequences(docs, budget=256).collect())
    b = sorted((r.doc_id, r.pack_id, r.offset)
               for r in pack_sequences(docs.repartition(11),
                                       budget=256).collect())
    assert a == b


def test_pack_stats_fill_rate(spark):
    docs = _docs(spark, ["a b c d", "e f g h", "i j"])
    packed = pack_sequences(docs, budget=4, n_buckets=1)
    stats = pack_stats(packed, budget=4).collect()[0]
    assert stats.n_packs == 3
    assert stats.sum_tokens == 10

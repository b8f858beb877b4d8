from __future__ import annotations

from logsqlite_spark.operators import sampling as SP
from logsqlite_spark.tables import table


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_split_is_deterministic_and_total(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id: r.split for r in SP.split_assign(docs).collect()}
    b = {r.doc_id: r.split for r in SP.split_assign(docs).collect()}
    assert a == b
    assert len(a) == docs.count()
    assert set(a.values()) <= {"train", "val", "test"}


def test_split_proportions_roughly_hold(spark, sf_dir):
    counts = {r.split: r.n_docs
              for r in SP.split_counts(_docs(spark, sf_dir)).collect()}
    total = sum(counts.values())
    # md5 buckets are uniform; allow wide slack on a small corpus
    assert counts.get("train", 0) / total > 0.6
    assert counts.get("val", 0) / total < 0.25
    assert counts.get("test", 0) / total < 0.25


def test_split_stable_under_repartition(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id: r.split for r in SP.split_assign(docs).collect()}
    b = {r.doc_id: r.split
         for r in SP.split_assign(docs.repartition(7)).collect()}
    assert a == b  # df.sample() fails this; hash split must not


def test_salt_changes_the_universe(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id: r.split for r in SP.split_assign(docs).collect()}
    b = {r.doc_id: r.split
         for r in SP.split_assign(docs, salt="other").collect()}
    assert a != b


def test_stratified_exact_k_per_stratum(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = SP.stratified_sample(docs, k=5).collect()
    by_stratum: dict[str, list] = {}
    for r in out:
        by_stratum.setdefault(r.stratum, []).append(r)
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert set(by_stratum) == langs
    for rows in by_stratum.values():
        assert len(rows) == 5
        assert sorted(r.rn for r in rows) == [1, 2, 3, 4, 5]


def test_stratified_deterministic(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = sorted((r.doc_id, r.rn) for r in SP.stratified_sample(docs).collect())
    b = sorted((r.doc_id, r.rn)
               for r in SP.stratified_sample(docs.repartition(5)).collect())
    assert a == b


def test_mixture_sample_quotas_shortfall_and_salts(spark, sf_dir):
    from logsqlite_spark.operators.sampling import mixture_sample
    from logsqlite_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents")
    quotas = {"src0": 3, "src1": 10_000, "src2": 1}
    rows = mixture_sample(docs, quotas).collect()
    per = {}
    for r in rows:
        per.setdefault(r["stratum"], []).append(r["doc_id"])
    avail = {r["source"]: r["n"] for r in docs.groupBy("source")
             .count().withColumnRenamed("count", "n").collect()}
    # exact quota where available, everything where short
    assert len(per["src0"]) == 3
    assert len(per["src1"]) == min(10_000, avail["src1"])
    assert len(per["src2"]) == 1
    assert set(per) == {"src0", "src1", "src2"}  # unlisted excluded

    # deterministic across runs; a different salt draws independently
    again = sorted(map(tuple, mixture_sample(docs, quotas).collect()))
    assert again == sorted(map(tuple, rows))
    other = mixture_sample(docs, {"src0": 3}, salt="mix-v2").collect()
    assert {r["doc_id"] for r in other} != set(per["src0"])


def test_corpus_shuffle_is_a_permutation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rows = SP.corpus_shuffle(docs).collect()
    n = docs.count()
    assert sorted(r.pos for r in rows) == list(range(1, n + 1))
    assert len({r.doc_id for r in rows}) == n


def test_corpus_shuffle_matches_driver_side_rank(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = {r.doc_id: r.pos for r in SP.corpus_shuffle(docs).collect()}
    keyed = docs.select(
        "doc_id",
        SP._bucket_col("doc_id", "shuffle-v1", 1_000_000_007).alias("h"),
    ).collect()
    expect = {
        d: i + 1
        for i, (h, d) in enumerate(
            sorted((r.h, r.doc_id) for r in keyed))
    }
    assert out == expect


def test_corpus_shuffle_boundary_and_layout_invariance(spark, sf_dir):
    # the global rank must not depend on the sampled range boundaries
    # (n_ranges) or the physical input layout
    docs = _docs(spark, sf_dir)
    a = {r.doc_id: r.pos for r in SP.corpus_shuffle(docs).collect()}
    b = {r.doc_id: r.pos
         for r in SP.corpus_shuffle(docs.repartition(7), n_ranges=3).collect()}
    c = {r.doc_id: r.pos
         for r in SP.corpus_shuffle(docs, n_ranges=11).collect()}
    assert a == b == c


def test_corpus_shuffle_seed_gives_independent_order(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r.doc_id: r.pos for r in SP.corpus_shuffle(docs).collect()}
    b = {r.doc_id: r.pos
         for r in SP.corpus_shuffle(docs, seed="epoch-2").collect()}
    assert a != b
    assert sorted(a.values()) == sorted(b.values())


def test_temperature_mixture_flattens_toward_tail(spark, sf_dir):
    import math

    docs = _docs(spark, sf_dir)
    rows = SP.temperature_mixture_sample(docs, total=100).collect()
    per = {}
    quota = {}
    for r in rows:
        per[r["stratum"]] = per.get(r["stratum"], 0) + 1
        quota[r["stratum"]] = r["quota"]
    n_s = {r["source"]: r["count"]
           for r in docs.groupBy("source").count().collect()}
    # each stratum delivers exactly its quota (corpus is large enough)
    assert per == {s: q for s, q in quota.items()}
    # quotas follow total*w_s div sum(w): recompute driver-side
    w = {s: math.floor(math.sqrt(n) * 1000) for s, n in n_s.items()}
    wsum = sum(w.values())
    assert quota == {s: (100 * ws) // wsum for s, ws in w.items()
                     if (100 * ws) // wsum >= 1}
    # τ=2 flattening on a skewed corpus: the tail stratum's sampled
    # share must exceed its corpus share (testdata sources are near-
    # uniform, so plant real skew)
    skewed = spark.createDataFrame(
        [(i, "head") for i in range(900)] + [(1000 + i, "tail")
                                             for i in range(100)],
        "doc_id long, source string")
    srows = SP.temperature_mixture_sample(skewed, total=50).collect()
    sper = {}
    for r in srows:
        sper[r["stratum"]] = sper.get(r["stratum"], 0) + 1
    sample_share = sper["tail"] / sum(sper.values())
    assert sample_share > 100 / 1000


def test_write_training_shards_layout_and_order(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    docs = _docs(spark, sf_dir)
    n = docs.count()
    path = str(tmp_path / "shards")
    manifest = {r["shard"]: (r["n_rows"], r["min_pos"], r["max_pos"])
                for r in SP.write_training_shards(
                    docs, path, rows_per_shard=100).collect()}
    n_shards = -(-n // 100)
    assert set(manifest) == set(range(n_shards))
    for k, (rows, lo, hi) in manifest.items():
        exp_rows = min(100, n - k * 100)
        assert (rows, lo, hi) == (exp_rows, k * 100 + 1, k * 100 + exp_rows)
    # one file per shard; rows inside the file are in position order
    # (the trainer streams files without sorting)
    expected = {r.pos: r.doc_id
                for r in SP.corpus_shuffle(docs).collect()}
    for k in range(n_shards):
        files = [f for f in glob.glob(f"{path}/shard={k}/*.parquet")]
        assert len(files) == 1, files
        t = pq.read_table(files[0], columns=["pos", "doc_id"])
        pos = t.column("pos").to_pylist()
        assert pos == sorted(pos)
        for p, d in zip(pos, t.column("doc_id").to_pylist()):
            assert expected[p] == d

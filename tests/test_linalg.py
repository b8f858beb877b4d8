"""PCA / per-dimension stats (operators/linalg.py): the one-pass
Gramian fit pinned against numpy PCA of the collected corpus, the
artifact build-once contract, and the exact integer dim stats."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logsqlite_spark.operators import linalg as LA
from logsqlite_spark.tables import table

SF = "/root/testdata/sf0.001"


def _collected(spark):
    rows = (table(spark, SF, "embeddings")
            .select("vec_id", "embedding").collect())
    rows.sort(key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    return ids, X


def _ref_pca(X, k):
    mu = X.mean(axis=0)
    cov = np.cov(X.T)  # n-1 normalized, like fit_pca
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    W, ev = vecs[:, order], vals[order]
    for j in range(k):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    return mu, W, ev


def test_dim_stats_hand_computed(spark):
    emb = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, [1.0, 0.125])],
        "vec_id long, embedding array<double>")
    got = {r["dim"]: (r["n"], r["sum_q"], r["sum_sq"])
           for r in LA.embedding_dim_stats(emb).collect()}
    # floor(x*1e4): 5000, 10000 | -2500, 1250
    assert got[0] == (2, 15000, 5000**2 + 10000**2)
    assert got[1] == (2, -1250, 2500**2 + 1250**2)


def test_fit_pca_matches_numpy(spark):
    """Distributed one-pass Gramian fit ≡ numpy PCA on the collected
    corpus: same μ, same sign-pinned components, same eigenvalues."""
    _ids, X = _collected(spark)
    k = 8
    mu, W, ev, n = LA.fit_pca(table(spark, SF, "embeddings"), k=k)
    rmu, rW, rev = _ref_pca(X, k)
    assert n == len(X)
    assert np.allclose(mu, rmu, atol=1e-9)
    assert np.allclose(ev, rev, rtol=1e-8, atol=1e-12)
    assert np.allclose(W, rW, atol=1e-6)
    # structural: orthonormal columns, descending eigenvalues
    assert np.allclose(W.T @ W, np.eye(k), atol=1e-9)
    assert all(ev[j] >= ev[j + 1] - 1e-12 for j in range(k - 1))


def test_pca_projection_matches_numpy(spark):
    ids, X = _collected(spark)
    k = 8
    got = {r["vec_id"]: np.array(r["pc"]) for r in
           LA.pca_project(table(spark, SF, "embeddings"), k=k).collect()}
    rmu, rW, _ = _ref_pca(X, k)
    P = (X - rmu) @ rW
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], P[i], atol=1e-6)


def test_pca_artifact_builds_once(spark):
    """Serving twice fits once — the fingerprint-keyed artifact is the
    one-corpus-scan-ever contract."""
    emb = table(spark, SF, "embeddings")
    before = LA._PCA_ARTIFACT_BUILDS
    m1 = LA.pca_model_artifact(emb, k=4)
    after_first = LA._PCA_ARTIFACT_BUILDS
    m2 = LA.pca_model_artifact(emb, k=4)
    assert LA._PCA_ARTIFACT_BUILDS == after_first <= before + 1
    assert np.allclose(m1[0], m2[0]) and np.allclose(m1[1], m2[1])


def test_pca_explained_variance_report(spark):
    rows = LA.pca_explained_variance(
        table(spark, SF, "embeddings"), k=4).collect()
    shares = [r["var_share"] for r in sorted(rows,
                                             key=lambda r: r["component"])]
    assert len(shares) == 4
    assert all(0 < s <= 1 for s in shares)
    assert shares == sorted(shares, reverse=True)


def test_fit_pca_validates_inputs(spark):
    emb = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least 2"):
        LA.fit_pca(emb, k=1)
    two = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.1])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="out of range"):
        LA.fit_pca(two, k=3)


def test_dim_stats_single_aggregation_scan(spark):
    """No explode: the d-expression agg is one scan + one exchange of
    partial-aggregate rows."""
    df = LA.embedding_dim_stats(table(spark, SF, "embeddings"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the stack-unpivot Generate sits ABOVE the aggregate (single-row
    # side, top-down in the plan string); the corpus is never exploded
    assert plan.index("Generate") < plan.index("HashAggregate")
    assert plan.count("Exchange") == 1     # partial -> final agg only


def test_gramian_stats_merge_associative_property(spark):
    """The exactness claim behind the PCA lifecycle: quantized-integer
    stats merged from ANY split of the corpus equal the one-shot table
    bit-for-bit (hypothesis over random vectors and split points)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from logsqlite_spark.operators.linalg import gramian_stats_df

    vecs = st.lists(
        st.lists(st.floats(min_value=-2.0, max_value=2.0,
                           allow_nan=False, width=32),
                 min_size=3, max_size=3),
        min_size=2, max_size=10)

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(vals=vecs, cut=st.integers(min_value=0, max_value=10))
    def check(vals, cut):
        cut = min(cut, len(vals))
        schema = "vec_id long, embedding array<double>"
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vals)]
        full = sorted(map(tuple,
                          gramian_stats_df(
                              spark.createDataFrame(rows, schema))
                          .collect()))
        parts = [rows[:cut], rows[cut:]]
        merged = {}
        for part in parts:
            if not part:
                continue
            for idx, val in gramian_stats_df(
                    spark.createDataFrame(part, schema)).collect():
                merged[idx] = merged.get(idx, 0) + int(val)
        assert sorted((i, v) for i, v in merged.items()) == \
            [(i, int(v)) for i, v in full]

    check()


def test_pca_inc_registry_query_matches_batch(spark):
    """The incremental-stats serving query (embedding_pca_inc) differs
    from the float-fit batch query only by the 1e-4 quantization of
    its sufficient statistics: per-coordinate projections agree within
    a loose tolerance, and the output shape is the scalar exploded
    (vec_id, component, value) harness contract."""
    from logsqlite_spark import registry

    SF = "/root/testdata/sf0.001"
    qs = registry.queries()
    batch = {(r["vec_id"], r["component"]): r["value"]
             for r in qs["embedding_pca"](spark, SF).collect()}
    inc = {(r["vec_id"], r["component"]): r["value"]
           for r in qs["embedding_pca_inc"](spark, SF).collect()}
    assert set(batch) == set(inc) and len(batch) > 0
    worst = max(abs(batch[k] - inc[k]) for k in batch)
    assert worst < 5e-3, f"quantized fit drifted {worst} from float fit"


def test_pca_var_registry_query_shares(spark):
    from logsqlite_spark import registry

    rows = registry.queries()["embedding_pca_var"](
        spark, "/root/testdata/sf0.001").collect()
    assert [r["component"] for r in rows] == list(range(len(rows)))
    shares = [r["var_share"] for r in rows]
    assert all(0 < s <= 1 for s in shares)
    assert shares == sorted(shares, reverse=True)
    evs = [r["eigval"] for r in rows]
    assert evs == sorted(evs, reverse=True) and evs[-1] > 0

"""linalg: exact Gram matrix + PCA fit/projection contracts."""

from __future__ import annotations

import numpy as np
import pytest

from esa_pfa_spark.operators.linalg import gram_matrix, pca_fit, pca_project


def _vec_df(spark, mat, extra_short=False):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    if extra_short:
        rows.append((len(rows), [1.0, 2.0]))   # shorter than dims: skipped
        rows.append((len(rows), None))         # NULL vector: skipped
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gram_matches_numpy(spark):
    rng = np.random.RandomState(7)
    mat = rng.randn(200, 6).astype(np.float32)
    df = _vec_df(spark, mat, extra_short=True)
    out = {(r["i"], r["j"]): r["gram"]
           for r in gram_matrix(df, dims=6).collect()}
    ref = mat.astype(np.float64).T @ mat.astype(np.float64)
    assert len(out) == 6 * 7 // 2
    for i in range(6):
        for j in range(i, 6):
            assert out[(i + 1, j + 1)] == pytest.approx(ref[i, j], rel=1e-9)


def test_gram_partitioning_invariant(spark):
    rng = np.random.RandomState(3)
    mat = rng.randn(500, 4).astype(np.float32)
    df = _vec_df(spark, mat)
    a = sorted(map(tuple, gram_matrix(df.coalesce(1), dims=4).collect()))
    b = sorted(map(tuple, gram_matrix(df.repartition(13), dims=4).collect()))
    assert a == b  # decimal accumulation: bit-identical, not just close


def test_pca_fit_matches_numpy_and_contracts(spark):
    rng = np.random.RandomState(11)
    # anisotropic data: variance concentrated in a known direction
    base = rng.randn(400, 8) * np.array([5.0, 3.0, 1.0, 1.0, 0.5, 0.5, 0.2, 0.1])
    mat = base.astype(np.float32)
    df = _vec_df(spark, mat)
    model = pca_fit(df, dim=8, k=4)
    comps = np.asarray(model["components"])
    evs = np.asarray(model["explained_variance"])
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-8)
    # variance sorted descending and positive
    assert all(evs[i] >= evs[i + 1] for i in range(3)) and evs[-1] > 0
    # matches numpy's eigh on the exact covariance (up to sign canon)
    x = mat.astype(np.float64)
    cov = np.cov(x, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    ref = v[:, order].T
    for r in range(4):
        ref_r = ref[r] if ref[r][np.argmax(np.abs(ref[r]))] > 0 else -ref[r]
        assert np.allclose(comps[r], ref_r, atol=1e-6)
    assert np.allclose(evs, w[order], rtol=1e-8)


def test_pca_fit_partitioning_stable(spark):
    rng = np.random.RandomState(5)
    mat = rng.randn(300, 6).astype(np.float32)
    m1 = pca_fit(_vec_df(spark, mat).coalesce(1), dim=6, k=3)
    m2 = pca_fit(_vec_df(spark, mat).repartition(7), dim=6, k=3)
    assert np.allclose(m1["components"], m2["components"], atol=1e-9)
    assert np.allclose(m1["mean"], m2["mean"], atol=1e-12)


def test_pca_project_reconstruction_improves_with_k(spark):
    rng = np.random.RandomState(13)
    mat = (rng.randn(300, 8) * np.array([5, 3, 1, 1, 0.5, 0.5, 0.2, 0.1])).astype(
        np.float32
    )
    df = _vec_df(spark, mat)
    x = mat.astype(np.float64)

    def recon_err(k):
        model = pca_fit(df, dim=8, k=k)
        rows = pca_project(df, model, round_to=None).orderBy("vec_id").collect()
        proj = np.asarray([r["pca"] for r in rows])
        comps = np.asarray(model["components"])
        mean = np.asarray(model["mean"])
        recon = proj @ comps + mean
        return float(((x - recon) ** 2).sum())

    e2, e4, e8 = recon_err(2), recon_err(4), recon_err(8)
    assert e2 > e4 > e8
    assert e8 == pytest.approx(0.0, abs=1e-12)  # full rank reconstructs exactly


def test_pca_project_whiten_unit_variance(spark):
    rng = np.random.RandomState(17)
    mat = (rng.randn(500, 5) * np.array([4, 2, 1, 0.5, 0.25])).astype(np.float32)
    df = _vec_df(spark, mat)
    model = pca_fit(df, dim=5, k=3)
    rows = pca_project(df, model, whiten=True, round_to=None).collect()
    proj = np.asarray([r["pca"] for r in rows])
    assert np.allclose(proj.var(axis=0, ddof=1), 1.0, rtol=1e-6)


def test_pca_project_null_and_short_rows(spark):
    mat = np.eye(4, dtype=np.float32) * 3.0
    df = _vec_df(spark, list(mat) * 3, extra_short=True)
    model = pca_fit(df, dim=4, k=2)
    rows = {r["vec_id"]: r["pca"] for r in pca_project(df, model).collect()}
    assert rows[12] is None and rows[13] is None  # short + NULL rows
    assert all(v is not None for k, v in rows.items() if k < 12)


def test_fan_out_semantics(spark):
    from esa_pfa_spark.operators.linalg import _fan_out

    par = spark.sparkContext.defaultParallelism
    small = spark.range(100).coalesce(1)
    assert _fan_out(small).rdd.getNumPartitions() == par
    wide = spark.range(1000).repartition(par + 3)
    # already at/above slot parallelism: no extra shuffle inserted
    assert _fan_out(wide) is wide
    # results unchanged (fan-out is pure repartitioning)
    assert sorted(r["id"] for r in _fan_out(small).collect()) == list(range(100))

"""Distributed PCA (stages/knn.pca_fit / pca_transform).

Oracle: exact numpy PCA (np.cov + eigh) on the gathered rows, with the same
largest-|coefficient|-positive sign canonicalization.  Cross-layout the
contract is allclose (float tree-sum order), the kmeans bar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from knowledgegraph_ray.stages.knn import pca_fit, pca_transform


def _make_ds(vecs: np.ndarray, parts: int = 4):
    flat = pa.array(vecs.reshape(-1), pa.float64())
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, vecs.shape[1]),
    })
    return rd.from_arrow(tbl).repartition(parts)


def _ref_pca(vecs: np.ndarray, k: int):
    mean = vecs.mean(axis=0)
    cov = np.cov(vecs, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    W = evecs[:, order].T
    piv = np.argmax(np.abs(W), axis=1)
    W[W[np.arange(len(W)), piv] < 0] *= -1.0
    return mean, W, np.maximum(evals[order], 0.0)


def _corpus(seed=2, n=300, dim=12):
    rng = np.random.default_rng(seed)
    # anisotropic: distinct variances per latent direction
    scales = np.linspace(5.0, 0.1, dim)
    Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    return (rng.standard_normal((n, dim)) * scales) @ Q.T + rng.standard_normal(dim)


def test_pca_fit_matches_numpy(ray_session):
    vecs = _corpus()
    m = pca_fit(_make_ds(vecs), 5)
    mean, W, ev = _ref_pca(vecs, 5)
    np.testing.assert_allclose(m["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(m["explained_variance"], ev, rtol=1e-9)
    np.testing.assert_allclose(m["components"], W, atol=1e-8)
    assert np.all(np.diff(m["explained_variance"]) <= 1e-12)  # descending


def test_pca_partition_invariance_allclose(ray_session):
    vecs = _corpus(seed=9)
    a = pca_fit(_make_ds(vecs, parts=1), 4)
    b = pca_fit(_make_ds(vecs, parts=11), 4)
    np.testing.assert_allclose(a["components"], b["components"], atol=1e-9)
    np.testing.assert_allclose(
        a["explained_variance"], b["explained_variance"], rtol=1e-12)


def test_pca_transform_projects_exactly(ray_session):
    vecs = _corpus(seed=4)
    ds = _make_ds(vecs)
    m = pca_fit(ds, 3)
    out = pca_transform(ds, m).take_all()
    got = np.array([r["pca"] for r in sorted(out, key=lambda r: r["vec_id"])])
    np.testing.assert_allclose(
        got, (vecs - m["mean"]) @ np.asarray(m["components"]).T, atol=1e-9)
    # projected variance per component == eigenvalue (ddof=1)
    np.testing.assert_allclose(
        got.var(axis=0, ddof=1), m["explained_variance"], rtol=1e-9)


def test_pca_low_rank_recovery(ray_session):
    rng = np.random.default_rng(6)
    basis = np.linalg.qr(rng.standard_normal((10, 2)))[0].T  # (2, 10)
    vecs = rng.standard_normal((200, 2)) @ (np.diag([4.0, 1.5]) @ basis)
    m = pca_fit(_make_ds(vecs), 4)
    assert m["explained_variance_ratio"][:2].sum() > 0.999999


def test_pca_fit_rejects_degenerate(ray_session):
    with pytest.raises(ValueError):
        pca_fit(_make_ds(np.zeros((1, 3)), parts=1), 1)


def test_q_pca_contract(ray_session):
    from knowledgegraph_ray.pipelines.queries import q_pca

    t = q_pca("/root/testdata/sf0.001")
    assert t.num_rows == 8
    evr = t.column("evr").to_numpy()
    assert (evr >= 0).all() and evr.sum() <= 1.0 + 1e-9

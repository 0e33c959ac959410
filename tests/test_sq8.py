"""SQ8 scalar-quantized ANN (stages/knn.sq8_fit/sq8_quantize/sq8_topk).

Oracles: quantization round-trip error bound (≤ scale/2 per dim), exact
equality with topk_cosine when the candidate pool covers the true top-k,
recall@k bound at the default oversample on clustered data, and partition
invariance of the final result.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from knowledgegraph_ray.stages.knn import (
    sq8_fit,
    sq8_quantize,
    sq8_topk,
    topk_cosine,
)


def _ds(vecs: np.ndarray, parts=4, ids=None):
    n, dim = vecs.shape
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    flat = pa.array(vecs.reshape(-1), pa.float64())
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, dim),
    })
    return rd.from_arrow(tbl).repartition(parts)


def test_quantize_roundtrip_error_bound(ray_session):
    rng = np.random.default_rng(5)
    V = rng.normal(size=(200, 16))
    p = sq8_fit(_ds(V))
    codes = sq8_quantize(_ds(V), p).take_all()
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    Vn = V / norms
    by_id = {r["vec_id"]: np.asarray(r["code"], np.int64) for r in codes}
    for i in range(200):
        deq = p["mn"] + (by_id[i] + 128) * p["scale"]
        assert np.all(np.abs(deq - Vn[i]) <= p["scale"] / 2 + 1e-12)


def test_sq8_topk_exact_when_pool_covers(ray_session):
    rng = np.random.default_rng(9)
    V = rng.normal(size=(60, 12))
    q = rng.normal(size=12)
    # oversample large enough that the pool is the whole set → EXACT
    got = sq8_topk(_ds(V), q, k=10, oversample=6).take_all()
    exact = topk_cosine(_ds(V), q, k=10).take_all()
    assert [(r["vec_id"], r["cos_r"]) for r in got] == [
        (r["vec_id"], r["cos_r"]) for r in exact
    ]


def test_sq8_recall_bound_clustered(ray_session):
    rng = np.random.default_rng(21)
    centers = rng.normal(size=(8, 32)) * 4
    V = np.vstack([
        centers[i % 8] + rng.normal(scale=0.3, size=32) for i in range(800)
    ])
    q = centers[3] + rng.normal(scale=0.2, size=32)
    got = {r["vec_id"] for r in sq8_topk(_ds(V, parts=8), q, k=10).take_all()}
    exact = {r["vec_id"] for r in topk_cosine(_ds(V, parts=8), q, k=10).take_all()}
    assert len(got & exact) >= 9  # recall@10 ≥ 0.9 at default oversample


def test_sq8_partition_invariance(ray_session):
    rng = np.random.default_rng(13)
    V = rng.normal(size=(300, 24))
    q = rng.normal(size=24)
    outs = []
    for parts in (1, 3, 8):
        p = sq8_fit(_ds(V, parts=parts))
        rows = sq8_topk(_ds(V, parts=parts), q, k=5, params=p).take_all()
        outs.append([(r["vec_id"], r["cos_r"]) for r in rows])
    assert outs[0] == outs[1] == outs[2]


def test_sq8_k_exceeds_n(ray_session):
    rng = np.random.default_rng(2)
    V = rng.normal(size=(6, 8))
    got = sq8_topk(_ds(V, parts=2), rng.normal(size=8), k=10).take_all()
    assert len(got) == 6


def test_pq_roundtrip_and_recall(ray_session):
    from knowledgegraph_ray.stages.knn import pq_encode, pq_fit, pq_topk

    rng = np.random.default_rng(19)
    centers = rng.normal(size=(6, 32)) * 4
    V = np.vstack([centers[i % 6] + rng.normal(scale=0.3, size=32)
                   for i in range(600)])
    q = centers[2] + rng.normal(scale=0.2, size=32)

    p = pq_fit(_ds(V, parts=4), m=8, n_centroids=32)
    assert p["codebooks"].shape == (8, 32, 4)
    codes = pq_encode(_ds(V, parts=4), p).take_all()
    assert len(codes) == 600 and all(len(r["code"]) == 8 for r in codes)

    got = {r["vec_id"] for r in
           pq_topk(_ds(V, parts=4), q, k=10, params=p).take_all()}
    exact = {r["vec_id"] for r in topk_cosine(_ds(V, parts=4), q, k=10).take_all()}
    assert len(got & exact) >= 9  # recall@10 ≥ 0.9 on clustered data


def test_pq_partition_invariance(ray_session):
    """Hash-sampled training + deterministic Lloyd's + fixed-order ADC sums
    → the whole pipeline is invariant to partitioning."""
    from knowledgegraph_ray.stages.knn import pq_fit, pq_topk

    rng = np.random.default_rng(29)
    V = rng.normal(size=(400, 16))
    q = rng.normal(size=16)
    outs = []
    for parts in (1, 4, 9):
        p = pq_fit(_ds(V, parts=parts), m=4, n_centroids=16)
        rows = pq_topk(_ds(V, parts=parts), q, k=5, params=p,
                       oversample=8).take_all()
        outs.append([(r["vec_id"], r["cos_r"]) for r in rows])
    assert outs[0] == outs[1] == outs[2]


def test_pq_rejects_indivisible_dim(ray_session):
    from knowledgegraph_ray.stages.knn import pq_fit

    rng = np.random.default_rng(1)
    V = rng.normal(size=(50, 10))
    try:
        pq_fit(_ds(V, parts=2), m=4, sample_mod=1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

"""SemDeDup (k-means + within-cluster cosine pruning, stages/knn.semdedup).

The pytest oracle is a sequential brute-force implementation of the exact
keep rule semdedup documents: item j is dropped iff some lower-id item i in
the SAME k-means cluster has cos(i, j) >= tau.  Clustering itself comes from
the shared `kmeans_fit` (already regime/partition-invariance tested), so the
oracle reuses its centroids and only re-derives assignment + pruning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from knowledgegraph_ray.stages.knn import kmeans_fit, semdedup


def _make_ds(vecs: np.ndarray, ids=None, parts: int = 4):
    n, dim = vecs.shape
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    flat = pa.array(vecs.reshape(-1), pa.float64())
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, dim),
    })
    return rd.from_arrow(tbl).repartition(parts)


def _ref_semdedup(ids: np.ndarray, vecs: np.ndarray, cents: np.ndarray,
                  tau: float) -> dict[int, tuple[int, bool]]:
    """Sequential oracle: id -> (cid, keep)."""
    score = vecs @ cents.T - 0.5 * (cents * cents).sum(axis=1)
    cid = np.argmax(score, axis=1)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    V = vecs / norms
    out: dict[int, tuple[int, bool]] = {}
    for c in np.unique(cid):
        idx = np.flatnonzero(cid == c)
        idx = idx[np.argsort(ids[idx])]
        for pos, j in enumerate(idx):
            dup = any(float(V[i] @ V[j]) >= tau for i in idx[:pos])
            out[int(ids[j])] = (int(c), not dup)
    return out


def _planted_corpus(seed: int = 5, n_base: int = 120, dim: int = 16):
    """Random unit-ish vectors plus planted near-duplicate chains."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    dups = []
    for src in range(0, n_base, 10):  # every 10th vector gets 2 near-copies
        for _ in range(2):
            dups.append(base[src] + 0.01 * rng.standard_normal(dim))
    return np.concatenate([base, np.array(dups)])


def test_semdedup_matches_bruteforce(ray_session):
    vecs = _planted_corpus()
    ds = _make_ds(vecs)
    tau, k = 0.9, 6
    cents = kmeans_fit(ds, k=k, iters=5, seed=7)
    expect = _ref_semdedup(np.arange(len(vecs)), vecs, cents, tau)

    got = {r["id"]: (r["cid"], r["keep"])
           for r in semdedup(ds, k=k, tau=tau, iters=5, seed=7).take_all()}
    assert got == expect
    # sanity: the planted near-copies actually caused drops
    assert sum(1 for _, kp in got.values() if not kp) >= 10


def test_semdedup_partition_invariance(ray_session):
    vecs = _planted_corpus(seed=9)
    rows = []
    for parts, nparts in ((1, 1), (7, 5)):
        ds = _make_ds(vecs, parts=parts)
        res = semdedup(ds, k=5, tau=0.9, num_partitions=nparts).take_all()
        rows.append(sorted((r["id"], r["cid"], r["keep"]) for r in res))
    assert rows[0] == rows[1]


def test_semdedup_keeps_lowest_id_per_duplicate_set(ray_session):
    # three exact copies of one direction, shuffled ids: identical vectors
    # are assigned identically, so exactly the lowest id survives.
    rng = np.random.default_rng(3)
    fill = rng.standard_normal((20, 8))
    v = rng.standard_normal(8)
    vecs = np.concatenate([fill, [v * 2.0, v * 2.0, v * 2.0]])
    ids = np.array(list(range(100, 120)) + [55, 9, 70], dtype=np.int64)
    ds = _make_ds(vecs, ids=ids, parts=3)
    got = {r["id"]: r["keep"] for r in semdedup(ds, k=3, tau=0.99).take_all()}
    assert got[9] and not got[55] and not got[70]


def test_q_semdedup_contract(ray_session):
    """One row per embedding row at sf0.001; some planted dups dropped."""
    from knowledgegraph_ray.pipelines.queries import q_semdedup

    out = q_semdedup("/root/testdata/sf0.001").take_all()
    assert len(out) == 500
    assert {r["id"] for r in out} == set(range(500))
    kept = sum(r["keep"] for r in out)
    assert 0 < kept < 500  # tau=0.45 has planted pairs at sf0.001

"""Graph-based ANN index (stages/nsw.py): build correctness, beam-search
recall vs the exact brute-force oracle, efs monotonicity, determinism,
shard pruning, and edge cases.

Reference anchor: Kuzu HNSW QUERY_VECTOR_INDEX with efs=200
(/root/reference/query_search.py:74-78); exact top-k is the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages.knn import _normalize, topk_cosine
from knowledgegraph_ray.stages.nsw import (
    _knn_graph,
    _long_range_edges,
    beam_search,
    build_shard_graph,
    nsw_build_index,
    nsw_query_index,
    nsw_recall_sweep,
)


def _clustered(n=3000, dim=32, n_clusters=12, seed=3):
    """Deterministic Gaussian-cluster corpus — the regime embedding models
    produce (and the one ANN indexes are for)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4.0
    labels = rng.integers(0, n_clusters, n)
    X = centers[labels] + rng.standard_normal((n, dim))
    return X


def _vec_table(X):
    return pa.table(
        {
            "vec_id": pa.array(range(len(X)), pa.int64()),
            "embedding": pa.array([row.tolist() for row in X],
                                  pa.list_(pa.float64())),
        }
    )


def _exact_topk(X, q, k):
    E = _normalize(X.astype(np.float64))
    qn = q / np.linalg.norm(q)
    sims = E @ qn
    return list(np.lexsort((np.arange(len(X)), -sims))[:k])


def test_knn_graph_exact_small():
    X = _clustered(n=60, dim=8, n_clusters=3)
    E = _normalize(X)
    g = _knn_graph(E, M=5)
    assert g.shape == (60, 5)
    sims = E @ E.T
    np.fill_diagonal(sims, -np.inf)
    for i in range(60):
        want = set(np.argpartition(-sims[i], 4)[:5])
        assert set(g[i]) == want  # exact neighbors, blockwise build
        assert i not in set(g[i])


def test_knn_graph_padding_and_empty():
    E = _normalize(np.random.default_rng(0).standard_normal((3, 4)))
    g = _knn_graph(E, M=8)  # only 2 possible neighbors -> pad with -1
    assert g.shape == (3, 8)
    assert (g[:, 2:] == -1).all()
    assert (g[:, :2] >= 0).all()
    assert _knn_graph(np.zeros((0, 4)), M=4).shape == (0, 4)


def test_long_range_edges_no_self_loops():
    for n in (1, 2, 7, 100):
        e = _long_range_edges(n)
        assert len(e) == n
        if n > 1:
            assert (e != np.arange(n)).all()
        assert (e >= 0).all() and (e < n).all()


def test_beam_search_full_pool_is_exact():
    """With efs >= n the pool holds every reachable node -> exact top-k
    (the graph is connected via the long-range column)."""
    X = _clustered(n=400, dim=16, n_clusters=4)
    tbl = _vec_table(X)
    g = build_shard_graph(tbl, M=8)
    E = np.asarray(
        g.column("_nvec").combine_chunks().values.to_numpy(zero_copy_only=False)
    ).reshape(400, 16)
    nbrs = np.asarray(
        g.column("_nbrs").combine_chunks().values.to_numpy(zero_copy_only=False)
    ).reshape(400, 9)
    q = X[17] / np.linalg.norm(X[17])
    idx, sims = beam_search(E, nbrs, q, k=10, efs=400)
    assert list(idx) == _exact_topk(X, q, 10)
    assert (np.diff(sims) <= 1e-12).all()  # best-first order


def test_beam_search_recall_at_efs200():
    X = _clustered()
    tbl = _vec_table(X)
    g = build_shard_graph(tbl, M=16)
    E = np.asarray(
        g.column("_nvec").combine_chunks().values.to_numpy(zero_copy_only=False)
    ).reshape(len(X), 32)
    nbrs = np.asarray(
        g.column("_nbrs").combine_chunks().values.to_numpy(zero_copy_only=False)
    ).reshape(len(X), 17)
    rng = np.random.default_rng(11)
    hits = total = 0
    for qi in rng.integers(0, len(X), 8):
        q = X[qi] + rng.standard_normal(32) * 0.1
        qn = q / np.linalg.norm(q)
        truth = set(_exact_topk(X, qn, 10))
        idx, _ = beam_search(E, nbrs, qn, k=10, efs=200)
        hits += len(set(idx.tolist()) & truth)
        total += 10
    assert hits / total >= 0.9  # HNSW-class recall at the reference's efs


def test_nsw_index_build_query_and_recall(tmp_path):
    X = _clustered(n=2000, dim=32, n_clusters=10, seed=5)
    ds = rd.from_arrow(_vec_table(X))
    from knowledgegraph_ray.stages.knn import kmeans_fit

    cents = kmeans_fit(ds, k=8, iters=3)
    index_dir = str(tmp_path / "nsw")
    counts = nsw_build_index(ds, cents, index_dir, M=12)
    assert sum(counts.values()) == 2000  # every vector in exactly one shard

    rng = np.random.default_rng(2)
    queries = [X[i] + rng.standard_normal(32) * 0.1 for i in rng.integers(0, 2000, 6)]

    sweep = nsw_recall_sweep(index_dir, cents, ds, queries, k=10,
                             efs_values=(50, 200, 2000))
    rec = dict(zip(sweep.column("efs").to_pylist(),
                   sweep.column("recall_at_k").to_pylist()))
    assert rec[200] >= 0.9
    assert rec[2000] >= rec[50]  # efs is a monotone recall knob (in practice)
    assert rec[2000] == 1.0      # full pool + all shards probed -> exact

    # determinism: identical query twice -> identical table
    t1 = nsw_query_index(index_dir, cents, queries[0], k=10, efs=200)
    t2 = nsw_query_index(index_dir, cents, queries[0], k=10, efs=200)
    assert t1.equals(t2)
    assert t1.column_names == ["vec_id", "cos_r"]
    cos = t1.column("cos_r").to_pylist()
    assert cos == sorted(cos, reverse=True)


def test_nsw_query_shard_pruning(tmp_path):
    """n_probe=1 restricts results to the single nearest shard's members."""
    X = _clustered(n=600, dim=16, n_clusters=6, seed=9)
    ds = rd.from_arrow(_vec_table(X))
    from knowledgegraph_ray.stages.knn import ivf_assign, seeded_centroids

    cents = seeded_centroids(16, 4, seed=3)
    index_dir = str(tmp_path / "nsw")
    nsw_build_index(ds, cents, index_dir, M=8)
    assigned = ivf_assign(ds, cents).take_all()
    q = X[0]
    qn = q / np.linalg.norm(q)
    C = _normalize(np.asarray(cents, dtype=np.float64))
    best_cid = int(np.argmax(C @ qn))
    members = {r["vec_id"] for r in assigned if r["centroid"] == best_cid}
    got = nsw_query_index(index_dir, cents, q, k=5, n_probe=1)
    assert set(got.column("vec_id").to_pylist()) <= members


def test_nsw_edge_cases(tmp_path):
    # k > n: returns all rows, no crash
    X = np.random.default_rng(1).standard_normal((7, 8))
    ds = rd.from_arrow(_vec_table(X))
    from knowledgegraph_ray.stages.knn import seeded_centroids

    cents = seeded_centroids(8, 2, seed=1)
    index_dir = str(tmp_path / "tiny")
    nsw_build_index(ds, cents, index_dir, M=4)
    got = nsw_query_index(index_dir, cents, X[0], k=50, efs=500)
    assert got.num_rows == 7
    # matches exact oracle completely at full scan
    exact = topk_cosine(ds, X[0], k=50).take_all()
    assert got.column("vec_id").to_pylist() == [r["vec_id"] for r in exact]
    assert got.column("cos_r").to_pylist() == pytest.approx(
        [r["cos_r"] for r in exact]
    )


def test_q_hnsw_knn_matches_exact_at_small_scale():
    """Driver-contract query: efs=200 on the sf0.001 embeddings (500
    near-random vectors — ANN's worst case) still recalls >=7/10 of the
    exact oracle's ids, and a full-pool probe (efs >= corpus) is EXACT."""
    from knowledgegraph_ray.pipelines.queries import (
        KNN_QUERY_VEC,
        q_hnsw_knn,
        q_knn_top10,
    )
    from knowledgegraph_ray.stages.knn import seeded_centroids
    from knowledgegraph_ray.stages.nsw import nsw_query_index

    sf_dir = "/root/testdata/sf0.001"
    got = q_hnsw_knn(sf_dir)  # builds/caches the index
    assert got.num_rows == 10
    cos = got.column("cos_r").to_pylist()
    assert cos == sorted(cos, reverse=True)
    exact = q_knn_top10(sf_dir).take_all()
    overlap = set(got.column("vec_id").to_pylist()) & {r["vec_id"] for r in exact}
    assert len(overlap) >= 7

    index_dir = "/tmp/kgray_cache/sf0.001-nsw-500"
    full = nsw_query_index(index_dir, seeded_centroids(64, 8), KNN_QUERY_VEC,
                           k=10, efs=500)
    assert full.column("vec_id").to_pylist() == [r["vec_id"] for r in exact]
    assert full.column("cos_r").to_pylist() == [r["cos_r"] for r in exact]

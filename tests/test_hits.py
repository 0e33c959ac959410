"""HITS hubs & authorities (stages/graph_query.hits).

Oracle: dense power iteration (numpy adjacency matmul) with identical L2
normalization.  Also asserts driver/distributed regime bit-equality
(pagerank's precedent), unmatched-endpoint dropping, and the edgeless case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from knowledgegraph_ray.stages.graph_query import hits


def _graph(names, e, parts=2):
    nodes = pa.table({"name": names, "type": ["person"] * len(names)})
    edges = pa.table({
        "src": [s for s, _ in e], "dst": [d for _, d in e],
        "src_type": ["person"] * len(e), "dst_type": ["person"] * len(e),
    })
    return (rd.from_arrow(nodes).repartition(parts),
            rd.from_arrow(edges).repartition(parts))


def _dense_ref(names, e, iters):
    idx = {n_: i for i, n_ in enumerate(names)}
    n = len(names)
    A = np.zeros((n, n))
    for s, d in e:
        A[idx[s], idx[d]] += 1.0  # multi-edges carry multiplicity

    def l2(v):
        s = np.sqrt((v * v).sum())
        return v / s if s > 0 else v

    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(iters):
        a = l2(A.T @ h)
        h = l2(A @ a)
    return h, a, idx


def test_hits_matches_dense_reference(ray_session):
    names = ["a", "b", "c", "d", "e"]
    # a,b,c all point at d (authority); a also surveys b,c,e (hub)
    e = [("a", "d"), ("b", "d"), ("c", "d"), ("a", "b"), ("a", "c"),
         ("a", "e"), ("e", "d")]
    nd, ed = _graph(names, e)
    got = hits(nd, ed, iters=40).to_pandas().set_index("name")
    h, a, idx = _dense_ref(names, e, 40)
    for n_ in names:
        assert abs(got.loc[n_, "hub_r"] - np.floor(h[idx[n_]] * 1e8) / 1e8) <= 1e-8
        assert abs(got.loc[n_, "auth_r"] - np.floor(a[idx[n_]] * 1e8) / 1e8) <= 1e-8
    assert got["auth_r"].idxmax() == "d"
    assert got["hub_r"].idxmax() == "a"


def test_hits_regime_equality(ray_session):
    rng = np.random.default_rng(3)
    names = [f"n{i}" for i in range(30)]
    e = [(names[int(rng.integers(30))], names[int(rng.integers(30))])
         for _ in range(120)]
    nd, ed = _graph(names, e, parts=4)
    small = hits(nd, ed, iters=25).to_pandas().set_index("name")
    nd, ed = _graph(names, e, parts=4)
    dist = hits(nd, ed, iters=25, small_graph_edges=0).to_pandas().set_index("name")
    for n_ in names:
        assert small.loc[n_, "hub_r"] == dist.loc[n_, "hub_r"], n_
        assert small.loc[n_, "auth_r"] == dist.loc[n_, "auth_r"], n_


def test_hits_drops_unmatched_endpoints(ray_session):
    nodes = pa.table({"name": ["a", "b"], "type": ["person"] * 2})
    edges = pa.table({
        "src": ["a", "ghost", "b"], "dst": ["b", "a", "ghost"],
        "src_type": ["person"] * 3, "dst_type": ["person"] * 3,
    })
    got = hits(rd.from_arrow(nodes), rd.from_arrow(edges),
               iters=10).to_pandas().set_index("name")
    assert set(got.index) == {"a", "b"}
    h, a, idx = _dense_ref(["a", "b"], [("a", "b")], 10)
    assert got.loc["a", "hub_r"] == np.floor(h[idx["a"]] * 1e8) / 1e8
    assert got.loc["b", "auth_r"] == np.floor(a[idx["b"]] * 1e8) / 1e8


def test_hits_no_edges(ray_session):
    nodes = pa.table({"name": ["a", "b"], "type": ["person"] * 2})
    edges = pa.table({
        "src": pa.array([], pa.string()), "dst": pa.array([], pa.string()),
        "src_type": pa.array([], pa.string()),
        "dst_type": pa.array([], pa.string()),
    })
    got = hits(rd.from_arrow(nodes), rd.from_arrow(edges), iters=5).take_all()
    assert len(got) == 2
    assert all(r["hub_r"] == 0.0 and r["auth_r"] == 0.0 for r in got)


def test_personalized_pagerank_matches_dense_reference(ray_session):
    from knowledgegraph_ray.stages.graph_query import pagerank

    names = ["a", "b", "c", "d", "e"]
    e = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    nd, ed = _graph(names, e)
    got = pagerank(nd, ed, damping=0.85, iters=30,
                   personalization=[("a", "person"), ("ghost", "person")]
                   ).to_pandas().set_index("name")["rank_r"]

    idx = {n_: i for i, n_ in enumerate(names)}
    n = len(names)
    deg = np.zeros(n)
    A = np.zeros((n, n))
    for s, d in e:
        deg[idx[s]] += 1
        A[idx[d], idx[s]] += 1.0
    p = np.zeros(n)
    p[idx["a"]] = 1.0  # the absent seed is ignored
    r = p.copy()
    for _ in range(30):
        w = r / np.maximum(deg, 1)
        contrib = A @ w
        dangling = r[deg == 0].sum()
        r = 0.15 * p + 0.85 * (contrib + dangling * p)
    for n_ in names:
        assert abs(got[n_] - np.floor(r[idx[n_]] * 1e8) / 1e8) <= 1e-8, n_
    # mass concentrates near the seed
    assert got["a"] > got["e"]

    # regime equality for the personalized path
    nd, ed = _graph(names, e)
    dist = pagerank(nd, ed, damping=0.85, iters=30, small_graph_edges=0,
                    personalization=[("a", "person")]
                    ).to_pandas().set_index("name")["rank_r"]
    for n_ in names:
        assert got[n_] == dist[n_], n_

    # all-absent seeds must raise, not silently rank uniformly
    nd, ed = _graph(names, e)
    try:
        pagerank(nd, ed, personalization=[("zz", "person")])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

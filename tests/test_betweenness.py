"""Betweenness centrality: exact Brandes vs an independent pure-Python
reference, known closed-form structures, pivot-estimator sanity, and
partition invariance (the CSR is a pure function of the edge set)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _reference_brandes(n, edge_set):
    """Textbook Brandes (2001) with dicts/queues — structurally unlike the
    vectorized engine path."""
    from collections import deque

    adj = {i: [] for i in range(n)}
    for a, b in edge_set:
        adj[a].append(b)
        adj[b].append(a)
    bc = {i: 0.0 for i in range(n)}
    for s in range(n):
        stack, pred = [], {i: [] for i in range(n)}
        sigma = {i: 0 for i in range(n)}
        dist = {i: -1 for i in range(n)}
        sigma[s], dist[s] = 1, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {i: 0.0 for i in range(n)}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {i: bc[i] / 2.0 for i in range(n)}


def test_betweenness_matches_reference_random_graph(ray_session):
    from knowledgegraph_ray.stages.graph_query import betweenness_centrality

    rng = np.random.default_rng(17)
    n = 40
    E = {(int(min(a, b)), int(max(a, b)))
         for a, b in rng.integers(0, n, (120, 2)) if a != b}
    want = _reference_brandes(n, E)
    tbl = pa.table({"src": [a for a, b in sorted(E)],
                    "dst": [b for a, b in sorted(E)]})
    got = betweenness_centrality(rd.from_arrow(tbl)).to_pandas()
    got_map = dict(zip(got["name"], got["betweenness"]))
    for i in range(n):
        assert got_map.get(i, 0.0) == pytest.approx(want[i], abs=1e-9), i


def test_betweenness_known_structures(ray_session):
    from knowledgegraph_ray.stages.graph_query import betweenness_centrality

    # path a-b-c-d: bc(b)=bc(c)=2, endpoints 0
    path = pa.table({"src": ["a", "b", "c"], "dst": ["b", "c", "d"]})
    got = betweenness_centrality(rd.from_arrow(path)).to_pandas()
    m = dict(zip(got["name"], got["betweenness"]))
    assert m == {"a": 0.0, "b": 2.0, "c": 2.0, "d": 0.0}

    # star with 5 leaves: hub = C(5,2) = 10, leaves 0
    star = pa.table({"src": ["h"] * 5, "dst": list("abcde")})
    got = betweenness_centrality(rd.from_arrow(star)).to_pandas()
    m = dict(zip(got["name"], got["betweenness"]))
    assert m["h"] == 10.0 and all(m[x] == 0.0 for x in "abcde")


def test_betweenness_partition_and_duplicate_invariance(ray_session):
    from knowledgegraph_ray.stages.graph_query import betweenness_centrality

    rng = np.random.default_rng(29)
    n = 30
    E = sorted({(int(min(a, b)), int(max(a, b)))
                for a, b in rng.integers(0, n, (90, 2)) if a != b})
    base = pa.table({"src": [a for a, b in E], "dst": [b for a, b in E]})
    ref = betweenness_centrality(rd.from_arrow(base)).to_pandas()
    # reversed duplicates + self loops + repartition: bit-identical output
    noisy = pa.table({
        "src": [a for a, b in E] + [b for a, b in E] + [7],
        "dst": [b for a, b in E] + [a for a, b in E] + [7],
    })
    for parts in (1, 5):
        got = betweenness_centrality(
            rd.from_arrow(noisy).repartition(parts)
        ).to_pandas()
        assert got["name"].tolist() == ref["name"].tolist()
        assert got["betweenness"].tolist() == ref["betweenness"].tolist()


def test_betweenness_pivot_estimator(ray_session):
    from knowledgegraph_ray.stages.graph_query import betweenness_centrality

    # two communities bridged by one articulation chain: the bridge nodes
    # must dominate the estimate even from a pivot subset
    left = [(f"l{i}", f"l{j}") for i in range(8) for j in range(i + 1, 8)]
    right = [(f"r{i}", f"r{j}") for i in range(8) for j in range(i + 1, 8)]
    bridge = [("l0", "m"), ("m", "r0")]
    tbl = pa.table({
        "src": [a for a, b in left + right + bridge],
        "dst": [b for a, b in left + right + bridge],
    })
    got = betweenness_centrality(
        rd.from_arrow(tbl), k_pivots=6, chunk_pivots=2
    ).to_pandas().sort_values("betweenness", ascending=False)
    # the three articulation nodes must dominate every interior node
    assert set(got.head(3)["name"]) == {"m", "l0", "r0"}
    exact = betweenness_centrality(rd.from_arrow(tbl)).to_pandas()
    em = dict(zip(exact["name"], exact["betweenness"]))
    assert em["m"] == 2 * 8 * 8 / 2  # all l×r pairs route through m

    # k_pivots >= n degenerates to exact
    full = betweenness_centrality(
        rd.from_arrow(tbl), k_pivots=10_000
    ).to_pandas()
    assert full["betweenness"].tolist() == exact["betweenness"].tolist()


def test_betweenness_empty_and_sf_contract(ray_session):
    from knowledgegraph_ray.stages.graph_query import betweenness_centrality

    empty = pa.table({"src": pa.array([], pa.large_string()),
                      "dst": pa.array([], pa.large_string())})
    got = betweenness_centrality(rd.from_arrow(empty))
    assert got.num_rows == 0
    assert got.schema.names == ["name", "betweenness"]

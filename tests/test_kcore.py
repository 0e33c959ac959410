"""k-core decomposition (stages/graph_query.core_numbers).

Oracle: the classic min-degree peeling algorithm (exact core numbers),
implemented independently here.  The operator computes coreness by the
H-index fixpoint (Lü et al. 2016) — both are exact, so equality is strict.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from knowledgegraph_ray.stages.graph_query import core_numbers


def _peel(edges: list[tuple[str, str]]) -> dict[str, int]:
    adj: dict[str, set] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {x: len(s) for x, s in adj.items()}
    remaining = set(adj)
    core, cur = {}, 0
    while remaining:
        x = min(remaining, key=lambda y: (deg[y], y))
        cur = max(cur, deg[x])
        core[x] = cur
        remaining.remove(x)
        for y in adj[x]:
            if y in remaining:
                deg[y] -= 1
    return core


def _ds(edges, parts=3):
    t = pa.table({
        "src": pa.array([a for a, _ in edges], pa.string()),
        "dst": pa.array([b for _, b in edges], pa.string()),
    })
    return rd.from_arrow(t).repartition(parts)


def _got(edges, **kw):
    return {r["node"]: r["core"]
            for r in core_numbers(_ds(edges), **kw).take_all()}


def test_kcore_known_structure(ray_session):
    # 5-clique (core 4) + pendant off it (core 1) + separate 4-cycle (core 2)
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    edges = clique + [("c0", "p"), ("x0", "x1"), ("x1", "x2"),
                      ("x2", "x3"), ("x3", "x0")]
    got = _got(edges)
    assert got == _peel(edges)
    assert got["c0"] == 4 and got["p"] == 1 and got["x0"] == 2


def test_kcore_random_graph_matches_peeling(ray_session):
    rng = np.random.default_rng(13)
    n = 60
    edges = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, n, size=(400, 2)) if a != b]
    # duplicates and both orientations present — operator must collapse them
    edges += [(b, a) for a, b in edges[:50]]
    assert _got(edges) == _peel(edges)


def test_kcore_path_graph_converges(ray_session):
    # worst-case propagation depth: n/2 rounds to reach the all-1 fixpoint
    edges = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(60)]
    got = _got(edges)
    assert set(got.values()) == {1}


def test_kcore_regime_equality(ray_session):
    rng = np.random.default_rng(4)
    edges = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 40, size=(200, 2)) if a != b]
    local = _got(edges)
    dist = _got(edges, small_graph_edges=0, num_partitions=5)
    assert local == dist == _peel(edges)


def test_kcore_max_rounds_cap(ray_session):
    edges = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(30)]
    capped = {r["node"]: r["core"] for r in core_numbers(
        _ds(edges), small_graph_edges=0, max_rounds=1).take_all()}
    # one round from degree init: interior stays 2, ends reach 1
    assert capped["v000"] == 1 and capped["v015"] == 2


def test_q_kg_kcore_contract(ray_session):
    from knowledgegraph_ray.pipelines.queries import q_kg_kcore

    rows = q_kg_kcore("/root/testdata/sf0.001").take_all()
    assert rows and all(r["core"] >= 1 for r in rows)
    assert sum(r["n_nodes"] for r in rows) > 0


def test_harmonic_centrality_matches_bfs_reference(ray_session):
    import collections

    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import (
        RA_SCALE,
        harmonic_centrality,
    )

    rng = np.random.default_rng(41)
    n = 40
    E = {(int(a), int(b)) for a, b in rng.integers(0, n, (90, 2)) if a != b}
    adj = collections.defaultdict(set)
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)

    def bfs(s):
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        del dist[s]
        return dist

    seeds = [0, 7, 13]
    tbl = pa.table({"src": pa.array([a for a, b in sorted(E)], pa.int64()),
                    "dst": pa.array([b for a, b in sorted(E)], pa.int64())})
    out = harmonic_centrality(
        rd.from_arrow(tbl).repartition(3), seeds
    )
    got = {r["name"]: (r["harmonic_s"], r["n_reachable"])
           for r in out.to_pylist()}
    for s in seeds:
        dist = bfs(s)
        want = sum(RA_SCALE // d for d in dist.values())
        assert got[s] == (want, len(dist)), s

    # max_hops truncation: only hop-1 neighbors counted
    out1 = harmonic_centrality(rd.from_arrow(tbl), [0], max_hops=1)
    r = out1.to_pylist()[0]
    assert r["n_reachable"] == len(adj[0])
    assert r["harmonic_s"] == len(adj[0]) * RA_SCALE


def test_harmonic_centrality_regime_equality(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import harmonic_centrality

    rng = np.random.default_rng(47)
    E = sorted({(int(a), int(b))
                for a, b in rng.integers(0, 35, (70, 2)) if a != b})
    tbl = pa.table({"src": pa.array([a for a, _ in E], pa.int64()),
                    "dst": pa.array([b for _, b in E], pa.int64())})
    seeds = [0, 5, 999]  # 999 absent -> zero row
    small = harmonic_centrality(
        rd.from_arrow(tbl).repartition(3), seeds
    ).to_pylist()
    dist = harmonic_centrality(
        rd.from_arrow(tbl).repartition(3), seeds, small_graph_edges=0
    ).to_pylist()
    assert small == dist
    z = [r for r in small if r["name"] == 999][0]
    assert z["harmonic_s"] == 0 and z["n_reachable"] == 0

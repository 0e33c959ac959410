"""Vertex-cut (hash-sharded rank vector) pagerank regime equality.

The sharded path (`graph_query._pagerank_sharded`) must agree with the
dense/broadcast path on every graph shape: same update formula, dangling
handling, personalization, endpoint-membership dropping, and the 1e-8
floor — only float summation order differs (per-shard contrib sums), so
comparisons allow at most one 1e-8 quantum.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages.graph_query import pagerank


def _rand_graph(rng, n_nodes=40, n_edges=160):
    names = [f"n{i:03d}" for i in range(n_nodes)]
    types = [("person", "org", "place")[i % 3] for i in range(n_nodes)]
    si = rng.integers(0, n_nodes, n_edges)
    di = rng.integers(0, n_nodes, n_edges)
    nodes = pa.table({"name": names, "type": types})
    edges = pa.table({
        "src": [names[i] for i in si], "src_type": [types[i] for i in si],
        "dst": [names[i] for i in di], "dst_type": [types[i] for i in di],
    })
    return nodes, edges


def _ranks(ds):
    df = ds.to_pandas()
    return df.set_index(df["name"] + "|" + df["type"])["rank_r"].sort_index()


@pytest.mark.parametrize("shard_size", [3, 7, 1_000_000])
def test_sharded_matches_dense(ray_session, shard_size):
    rng = np.random.default_rng(7)
    nodes, edges = _rand_graph(rng)
    nd = rd.from_arrow(nodes).repartition(3)
    ed = rd.from_arrow(edges).repartition(4)
    dense = _ranks(pagerank(nd, ed, damping=0.85, iters=25))
    shard = _ranks(pagerank(nd, ed, damping=0.85, iters=25, shard_size=shard_size))
    assert list(dense.index) == list(shard.index)
    # identical math, different summation order: at most one 1e-8 quantum
    assert np.max(np.abs(dense.values - shard.values)) <= 1.0000001e-8
    # shard count must follow the knob: at 40 nodes / shard_size=3 → 14 shards
    assert shard.size == 40


def test_sharded_personalization_matches_dense(ray_session):
    rng = np.random.default_rng(11)
    nodes, edges = _rand_graph(rng, n_nodes=30, n_edges=90)
    nd, ed = rd.from_arrow(nodes), rd.from_arrow(edges).repartition(3)
    seeds = [("n001", "org"), ("n004", "org"), ("zz_absent", "person")]
    dense = _ranks(pagerank(nd, ed, iters=20, personalization=seeds))
    shard = _ranks(pagerank(nd, ed, iters=20, personalization=seeds, shard_size=4))
    assert list(dense.index) == list(shard.index)
    assert np.max(np.abs(dense.values - shard.values)) <= 1.0000001e-8
    # all-absent seeds raise on the sharded path too
    with pytest.raises(ValueError):
        pagerank(nd, ed, iters=2, personalization=[("zz", "person")], shard_size=4)


def test_sharded_drops_unmatched_endpoints(ray_session):
    nodes = pa.table({"name": ["a", "b"], "type": ["person"] * 2})
    edges = pa.table({
        "src": ["a", "ghost", "b"], "dst": ["b", "a", "ghost"],
        "src_type": ["person"] * 3, "dst_type": ["person"] * 3,
    })
    nd, ed = rd.from_arrow(nodes), rd.from_arrow(edges)
    dense = _ranks(pagerank(nd, ed, iters=10))
    shard = _ranks(pagerank(nd, ed, iters=10, shard_size=1))
    assert list(dense.index) == list(shard.index) == ["a|person", "b|person"]
    assert np.max(np.abs(dense.values - shard.values)) <= 1.0000001e-8


def test_sharded_empty_and_edgeless(ray_session):
    empty_nodes = pa.table({"name": pa.array([], pa.string()),
                            "type": pa.array([], pa.string())})
    empty_edges = pa.table({
        "src": pa.array([], pa.string()), "dst": pa.array([], pa.string()),
        "src_type": pa.array([], pa.string()), "dst_type": pa.array([], pa.string()),
    })
    out = pagerank(rd.from_arrow(empty_nodes), rd.from_arrow(empty_edges),
                   shard_size=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"name", "type", "rank_r"}
    # edgeless graph: every node is dangling; rank must be uniform 1/n
    nodes = pa.table({"name": ["a", "b", "c"], "type": ["t"] * 3})
    got = _ranks(pagerank(rd.from_arrow(nodes), rd.from_arrow(empty_edges),
                          iters=5, shard_size=1))
    assert np.allclose(got.values, np.floor(1e8 / 3) / 1e8)


# ---------------------------------------------------------------------------
# khop dataset-frontier regime (hub-dense graphs: frontier off the driver)
# ---------------------------------------------------------------------------

def _bfs_reference(e, seeds, k, directed):
    import collections
    adj = collections.defaultdict(set)
    for s, d in e:
        adj[s].add(d)
        if not directed:
            adj[d].add(s)
    dist = {s: 0 for s in seeds}
    q = collections.deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] == k:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _khop_rows(out):
    rows = out.to_pylist() if isinstance(out, pa.Table) else out.take_all()
    return {r["name"]: r["hop"] for r in rows}


def test_khop_dataset_regime_matches_driver(ray_session):
    from knowledgegraph_ray.stages.graph_query import khop

    rng = np.random.default_rng(13)
    n = 60
    e = {(f"n{int(a)}", f"n{int(b)}")
         for a, b in rng.integers(0, n, (150, 2)) if a != b}
    edges = pa.table({"src": [s for s, _ in sorted(e)],
                      "dst": [d for _, d in sorted(e)]})
    ds = rd.from_arrow(edges).repartition(5)
    for k, direction, directed in ((2, "both", False), (3, "out", True),
                                   (2, "in", None)):
        driver = _khop_rows(khop(ds, ["n0", "n7"], k=k, direction=direction))
        forced = khop(ds, ["n0", "n7"], k=k, direction=direction,
                      frontier_limit=0)
        assert isinstance(forced, rd.Dataset)  # dataset regime engaged
        assert _khop_rows(forced) == driver, (k, direction)
        if directed is not None:
            assert driver == _bfs_reference(e, ["n0", "n7"], k, directed)


def test_khop_midflight_handoff_on_hub_graph(ray_session):
    """A hub graph whose hop-1 frontier explodes past the limit must hand
    off mid-BFS (hop 0 state built driver-side, hop 2 computed as
    datasets) and still match the all-driver result."""
    from knowledgegraph_ray.stages.graph_query import khop

    hub_edges = [("seed", f"h{i}") for i in range(50)]
    hub_edges += [(f"h{i}", f"leaf{i}") for i in range(50)]
    edges = pa.table({"src": [s for s, _ in hub_edges],
                      "dst": [d for _, d in hub_edges]})
    ds = rd.from_arrow(edges).repartition(3)
    driver = _khop_rows(khop(ds, ["seed"], k=2, direction="out"))
    handed = khop(ds, ["seed"], k=2, direction="out", frontier_limit=10)
    assert isinstance(handed, rd.Dataset)
    assert _khop_rows(handed) == driver
    assert driver["seed"] == 0 and driver["h3"] == 1 and driver["leaf3"] == 2
    assert len(driver) == 101


# ---------------------------------------------------------------------------
# hits vertex-cut regime
# ---------------------------------------------------------------------------

def _hits_frame(ds):
    df = ds.to_pandas()
    return df.set_index(df["name"] + "|" + df["type"]).sort_index()


@pytest.mark.parametrize("shard_size", [3, 1_000_000])
def test_hits_sharded_matches_dense(ray_session, shard_size):
    from knowledgegraph_ray.stages.graph_query import hits

    rng = np.random.default_rng(23)
    nodes, edges = _rand_graph(rng, n_nodes=35, n_edges=140)
    nd = rd.from_arrow(nodes).repartition(2)
    ed = rd.from_arrow(edges).repartition(3)
    dense = _hits_frame(hits(nd, ed, iters=20))
    shard = _hits_frame(hits(nd, ed, iters=20, shard_size=shard_size))
    assert list(dense.index) == list(shard.index)
    for col in ("hub_r", "auth_r"):
        assert np.max(np.abs(dense[col].values - shard[col].values)) \
            <= 1.0000001e-8, col


def test_hits_sharded_empty(ray_session):
    from knowledgegraph_ray.stages.graph_query import hits

    empty_nodes = pa.table({"name": pa.array([], pa.string()),
                            "type": pa.array([], pa.string())})
    empty_edges = pa.table({
        "src": pa.array([], pa.string()), "dst": pa.array([], pa.string()),
        "src_type": pa.array([], pa.string()), "dst_type": pa.array([], pa.string()),
    })
    out = hits(rd.from_arrow(empty_nodes), rd.from_arrow(empty_edges), shard_size=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"name", "type", "hub_r", "auth_r"}


def test_khop_callers_survive_dataset_regime(ray_session):
    """harmonic_centrality and ego_subgraph consume khop, which past
    frontier_limit returns a Dataset — both must handle it (code-review
    round-5 finding) and agree with the table-regime result."""
    from knowledgegraph_ray.stages.graph_query import ego_subgraph, khop

    hub_edges = [("seed", f"h{i}") for i in range(30)]
    hub_edges += [(f"h{i}", f"leaf{i}") for i in range(30)]
    edges = pa.table({"src": [s for s, _ in hub_edges],
                      "dst": [d for _, d in hub_edges]})
    ds = rd.from_arrow(edges).repartition(3)

    # ego_subgraph: broadcast-set regime vs dataset-membership regime
    small = ego_subgraph(ds, ["seed"], k=1)
    rows_small = {(r["src"], r["dst"]) for r in small.take_all()}
    import knowledgegraph_ray.stages.graph_query as gq
    orig = gq.khop
    try:
        gq.khop = lambda *a, **kw: orig(*a, **{**kw, "frontier_limit": 0})
        big = ego_subgraph(ds, ["seed"], k=1)
    finally:
        gq.khop = orig
    rows_big = {(r["src"], r["dst"]) for r in big.take_all()}
    assert rows_small == rows_big == {("seed", f"h{i}") for i in range(30)}


def test_harmonic_centrality_dataset_regime_matches(ray_session):
    from knowledgegraph_ray.stages.graph_query import harmonic_centrality
    import knowledgegraph_ray.stages.graph_query as gq

    rng = np.random.default_rng(31)
    n = 40
    e = {(f"n{int(a)}", f"n{int(b)}")
         for a, b in rng.integers(0, n, (120, 2)) if a != b}
    edges = pa.table({"src": [s for s, _ in sorted(e)],
                      "dst": [d for _, d in sorted(e)]})
    ds = rd.from_arrow(edges).repartition(4)
    base = harmonic_centrality(ds, ["n0", "n3"], max_hops=4,
                               small_graph_edges=0).to_pylist()
    orig = gq.khop
    try:
        gq.khop = lambda *a, **kw: orig(*a, **{**kw, "frontier_limit": 0})
        forced = harmonic_centrality(ds, ["n0", "n3"], max_hops=4,
                                     small_graph_edges=0).to_pylist()
    finally:
        gq.khop = orig
    assert base == forced


def test_ego_dataset_regime_schema_matches_input(ray_session):
    """Both ego regimes must return exactly the input edge columns (the
    shuffle-join path would otherwise leak the membership key column)."""
    from knowledgegraph_ray.stages.graph_query import ego_subgraph
    import knowledgegraph_ray.stages.graph_query as gq

    edges = pa.table({"src": ["a", "b", "c"], "dst": ["b", "c", "a"],
                      "w": [1, 2, 3]})
    ds = rd.from_arrow(edges).repartition(2)
    base = ego_subgraph(ds, ["a"], k=1)
    assert base.schema().names == ["src", "dst", "w"]
    orig = gq.khop
    try:
        gq.khop = lambda *a, **kw: orig(*a, **{**kw, "frontier_limit": 0})
        forced = ego_subgraph(ds, ["a"], k=1)
    finally:
        gq.khop = orig
    assert forced.schema().names == ["src", "dst", "w"]
    key = lambda r: (r["src"], r["dst"], r["w"])
    assert sorted(map(key, base.take_all())) == sorted(map(key, forced.take_all()))


def test_sharded_survives_degenerate_empty_blocks(ray_session):
    """A filter can leave zero-row blocks with a degenerate empty schema;
    the sharded node exchange must not crash on them (second-review
    finding — the dense path already guards with `if t.num_rows`)."""
    nodes = pa.table({"name": [f"n{i}" for i in range(12)] + ["DROP"] * 4,
                      "type": ["t"] * 16})
    edges = pa.table({
        "src": ["n0", "n1"], "dst": ["n1", "n2"],
        "src_type": ["t"] * 2, "dst_type": ["t"] * 2,
    })
    nd = (rd.from_arrow(nodes).repartition(4)
          .filter(lambda r: r["name"] != "DROP"))
    ed = rd.from_arrow(edges)
    dense = _ranks(pagerank(nd, ed, iters=5))
    shard = _ranks(pagerank(nd, ed, iters=5, shard_size=3))
    assert list(dense.index) == list(shard.index)
    assert np.max(np.abs(dense.values - shard.values)) <= 1.0000001e-8


def test_dense_pagerank_empty_node_table(ray_session):
    """Dense regime on an empty node table must return the empty schema,
    not crash in concat_tables (second-review finding; the sharded path
    already did)."""
    empty_nodes = pa.table({"name": pa.array([], pa.string()),
                            "type": pa.array([], pa.string())})
    edges = pa.table({
        "src": ["a"], "dst": ["b"],
        "src_type": ["t"], "dst_type": ["t"],
    })
    out = pagerank(rd.from_arrow(empty_nodes), rd.from_arrow(edges), iters=2)
    assert out.count() == 0
    assert set(out.schema().names) == {"name", "type", "rank_r"}


def test_khop_star_graph_hands_off_before_pulling_the_explosion(ray_session):
    """Star graph: hop-1 frontier is ONE hub node (passes any limit), hop 2
    explodes — the guard must fire on the round's OUTPUT size, before
    take_all, and the dataset regime must finish the round correctly."""
    from knowledgegraph_ray.stages.graph_query import khop

    star = [("seed", "hub")] + [("hub", f"leaf{i}") for i in range(40)]
    edges = pa.table({"src": [s for s, _ in star],
                      "dst": [d for _, d in star]})
    ds = rd.from_arrow(edges).repartition(3)
    out = khop(ds, ["seed"], k=2, direction="out", frontier_limit=5)
    assert isinstance(out, rd.Dataset)  # handed off mid-BFS at the hop-2 pull
    rows = _khop_rows(out)
    ref = _khop_rows(khop(ds, ["seed"], k=2, direction="out"))
    assert rows == ref
    assert rows["hub"] == 1 and rows["leaf7"] == 2 and len(rows) == 42


# ---------------------------------------------------------------------------
# weighted pagerank (weight_col): all three regimes
# ---------------------------------------------------------------------------

def _weighted_pr_reference(names, edges_w, iters=25, damping=0.85):
    """Dense numpy weighted power iteration with the engine's dangling
    handling: contribution i→j = r[i]·w(i,j)/Σ_out w(i,·)."""
    idx = {n_: i for i, n_ in enumerate(names)}
    n = len(names)
    wdeg = np.zeros(n)
    A = np.zeros((n, n))
    for s, d, w in edges_w:
        wdeg[idx[s]] += w
        A[idx[d], idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        wv = r / np.where(wdeg > 0, wdeg, 1)
        contrib = A @ wv
        dangling = r[wdeg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {nm: np.floor(r[idx[nm]] * 1e8) / 1e8 for nm in names}


def test_weighted_pagerank_matches_reference_all_regimes(ray_session):
    names = ["a", "b", "c", "d"]
    # c has no outgoing weight (dangling); heavy a->d edge dominates
    edges_w = [("a", "b", 1.0), ("a", "d", 9.0), ("b", "d", 2.0),
               ("d", "a", 0.5)]
    nodes = pa.table({"name": names, "type": ["t"] * 4})
    edges = pa.table({
        "src": [s for s, _, _ in edges_w],
        "dst": [d for _, d, _ in edges_w],
        "src_type": ["t"] * 4, "dst_type": ["t"] * 4,
        "strength": pa.array([w for _, _, w in edges_w], pa.float32()),
    })
    nd = rd.from_arrow(nodes).repartition(2)
    ed = rd.from_arrow(edges).repartition(2)
    ref = _weighted_pr_reference(names, edges_w)

    for kwargs in ({}, {"small_graph_edges": 0}, {"shard_size": 2}):
        got = pagerank(nd, ed, iters=25, weight_col="strength", **kwargs) \
            .to_pandas().set_index("name")["rank_r"]
        for nm in names:
            assert abs(got[nm] - ref[nm]) <= 1.0000001e-8, (kwargs, nm)
    # d (heavy in-weight) must outrank b
    assert ref["d"] > ref["b"]

    # weight_col=None still matches the original unweighted reference
    unw = pagerank(nd, ed, iters=25).to_pandas().set_index("name")["rank_r"]
    unw_s = pagerank(nd, ed, iters=25, shard_size=2) \
        .to_pandas().set_index("name")["rank_r"]
    assert np.max(np.abs(unw.sort_index().values - unw_s.sort_index().values)) \
        <= 1.0000001e-8


def test_weighted_pagerank_null_weights_default_to_one(ray_session):
    nodes = pa.table({"name": ["a", "b"], "type": ["t"] * 2})
    edges = pa.table({
        "src": ["a"], "dst": ["b"], "src_type": ["t"], "dst_type": ["t"],
        "strength": pa.array([None], pa.float32()),
    })
    nd, ed = rd.from_arrow(nodes), rd.from_arrow(edges)
    w = pagerank(nd, ed, iters=10, weight_col="strength") \
        .to_pandas().set_index("name")["rank_r"]
    u = pagerank(nd, ed, iters=10).to_pandas().set_index("name")["rank_r"]
    assert (w == u).all()  # null weight == 1.0 == the unweighted graph


def test_weighted_personalized_pagerank_combo(ray_session):
    """weight_col composes with personalization: teleport/dangling mass on
    the seeds, flow proportional to weights — dense vs sharded agree."""
    names = ["a", "b", "c", "d", "e"]
    edges_w = [("a", "b", 3.0), ("b", "c", 1.0), ("c", "a", 2.0),
               ("a", "d", 1.0), ("d", "e", 4.0)]
    nodes = pa.table({"name": names, "type": ["t"] * 5})
    edges = pa.table({
        "src": [s for s, _, _ in edges_w], "dst": [d for _, d, _ in edges_w],
        "src_type": ["t"] * 5, "dst_type": ["t"] * 5,
        "strength": pa.array([w for _, _, w in edges_w], pa.float64()),
    })
    nd, ed = rd.from_arrow(nodes), rd.from_arrow(edges).repartition(2)
    seeds = [("a", "t")]
    dense = pagerank(nd, ed, iters=20, weight_col="strength",
                     personalization=seeds).to_pandas() \
        .set_index("name")["rank_r"].sort_index()
    shard = pagerank(nd, ed, iters=20, weight_col="strength",
                     personalization=seeds, shard_size=2).to_pandas() \
        .set_index("name")["rank_r"].sort_index()
    assert np.max(np.abs(dense.values - shard.values)) <= 1.0000001e-8
    # seed-personalized: a (the seed) holds the most mass
    assert dense.idxmax() == "a"

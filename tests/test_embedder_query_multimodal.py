"""T2/T3 embedder actor pool, the graph query layer, and multimodal stages."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages.embedder import (
    Embedder,
    embed_nodes,
    entity_to_text,
    hash_embedding,
    relation_to_text,
)
from knowledgegraph_ray.stages.graph_query import details, relations, search, stats
from knowledgegraph_ray.stages.multimodal import (
    AudioFeaturizer,
    ImageDecoder,
    VideoFrameSampler,
    decode_images,
    featurize_audio,
    sample_video_frames,
    synth_media_table,
)


def test_hash_embedding_deterministic_unit_norm():
    a = hash_embedding("Sarah Jones", dim=64)
    b = hash_embedding("Sarah Jones", dim=64)
    c = hash_embedding("sarah jones", dim=64)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-5


def test_entity_to_text_shape():
    # ollama_embedder.py:53-77 — type + name + first-3 descriptions + attrs
    txt = entity_to_text(
        "Person", "Sarah Jones",
        ["d1", "d2", "d3", "d4"],
        {"role": ["Engineer"], "worksAt": "Acme"},
    )
    lines = txt.split("\n")
    assert lines[0] == "Type: Person"
    assert lines[1] == "Name: Sarah Jones"
    assert lines.count("Description: d4") == 0  # only first 3
    assert "role: Engineer" in lines
    assert "worksAt: Acme" in lines


def test_relation_to_text_shape():
    txt = relation_to_text("WORKS_AT", ["emp of Acme"], 8.0)
    assert txt.splitlines() == [
        "Relation: WORKS_AT", "Description: emp of Acme", "Strength: 8.0",
    ]


@pytest.fixture(scope="module")
def small_graph():
    nodes = pa.table(
        {
            "name": ["Sarah Jones", "Acme Corp", "Project X"],
            "type": ["Person", "Organization", "Project"],
            "rawDescriptions": [["engineer at acme"], ["a company"], []],
        }
    )
    edges = pa.table(
        {
            "relation_id": ["r1", "r2", "r3"],
            "src": ["Sarah Jones", "Sarah Jones", "Project X"],
            "dst": ["Acme Corp", "Project X", "Acme Corp"],
            "type": ["WORKS_AT", "LEADS", "OWNED_BY"],
            "strength": pa.array([8.0, 6.0, 5.0], pa.float32()),
        }
    )
    return rd.from_arrow(nodes), rd.from_arrow(edges)


def test_embed_nodes_actor_pool(small_graph):
    nodes, _ = small_graph
    out = embed_nodes(nodes, dim=32, concurrency=2, batch_size=2).take_all()
    assert all(len(r["embedding"]) == 32 for r in out)
    # embedding is a pure function of the serialized entity text
    direct = Embedder(dim=32, mode="node")(
        pa.table({"name": ["Sarah Jones"], "type": ["Person"],
                  "rawDescriptions": [["engineer at acme"]]})
    )
    by_name = {r["name"]: r["embedding"] for r in out}
    assert np.allclose(by_name["Sarah Jones"], direct.column("embedding")[0].as_py())


def test_search_finds_self(small_graph):
    nodes, _ = small_graph
    embedded = embed_nodes(nodes, dim=32, concurrency=2, batch_size=2).materialize()
    q = hash_embedding(entity_to_text("Person", "Sarah Jones", ["engineer at acme"]), 32)
    top = search(embedded, q, k=1).take_all()
    assert top[0]["name"] == "Sarah Jones"
    assert top[0]["cos_r"] >= 0.9999


def test_details_and_relations(small_graph):
    nodes, edges = small_graph
    d = details(nodes, "Acme Corp").take_all()
    assert len(d) == 1 and d[0]["type"] == "Organization"
    d2 = details(nodes, "Acme Corp", "Person").take_all()
    assert d2 == []
    out = relations(edges, "Sarah Jones", direction="out").take_all()
    assert {r["type"] for r in out} == {"WORKS_AT", "LEADS"}
    inc = relations(edges, "Acme Corp", direction="in").take_all()
    assert {r["type"] for r in inc} == {"WORKS_AT", "OWNED_BY"}
    both = relations(edges, "Project X", direction="both").take_all()
    assert len(both) == 2


def test_stats(small_graph):
    nodes, edges = small_graph
    s = stats(nodes, edges)
    assert s["total_entities"] == 3
    assert s["total_relations"] == 3
    assert s["entity_types"]["Person"] == 1


def test_image_decode_stub_and_fake():
    media = synth_media_table(6, media_type="image")
    feats = decode_images(rd.from_arrow(media), concurrency=2, batch_size=4).take_all()
    assert len(feats) == 6
    assert all(len(r["feature"]) == 6 for r in feats)  # mean+std per channel
    assert all(r["width"] == 32 and r["height"] == 32 for r in feats)
    # strict backend is the clearly-marked stub
    with pytest.raises(NotImplementedError):
        ImageDecoder(backend="strict")(media)


def test_image_features_deterministic():
    media = synth_media_table(3, media_type="image")
    a = ImageDecoder()(media).column("feature").to_pylist()
    b = ImageDecoder()(media).column("feature").to_pylist()
    assert a == b


def test_audio_featurizer():
    media = synth_media_table(4, media_type="audio")
    out = featurize_audio(rd.from_arrow(media), concurrency=2, batch_size=2).take_all()
    assert len(out) == 4
    assert all(len(r["feature"]) == 16 for r in out)
    assert all(r["sample_rate"] == 16000 for r in out)
    with pytest.raises(NotImplementedError):
        AudioFeaturizer(backend="ffmpeg")(media)


def test_video_frame_sampler_flat_maps():
    media = synth_media_table(3, media_type="video")
    out = sample_video_frames(
        rd.from_arrow(media), concurrency=2, batch_size=2, n_frames=4
    ).take_all()
    assert len(out) == 12  # 3 videos x 4 frames
    assert {r["frame_idx"] for r in out} == {0, 1, 2, 3}
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(backend="ffmpeg")(media)


# ---------------------------------------------------------------------------
# Embeddings as a first-class pipeline stage (schema.yaml:14 parity) + D4
# regenerate-on-change (systematic_merge_provider.py:687-696)
# ---------------------------------------------------------------------------


def _mini_nodes_table(descs):
    return pa.table(
        {
            "type": ["Person", "Company"],
            "name": ["Sarah Jones", "Acme"],
            "rawDescriptions": pa.array([descs, ["builds things"]], pa.list_(pa.string())),
        }
    )


def test_kg_build_embed_flag_writes_embeddings(tmp_path):
    from knowledgegraph_ray.pipelines.kg_build import kg_build
    from knowledgegraph_ray.sources.pages import write_pages

    paths = write_pages(str(tmp_path / "pages"), n_pages=60, seed=42, rows_per_file=30)
    res = kg_build(paths, str(tmp_path / "work"), batch_size=32, concurrency=2,
                   num_partitions=2, resume=False, embed=True, embed_dim=32)
    nodes = res.nodes()
    edges = res.edges()
    assert "embedding" in nodes.schema().names
    assert "embedding" in edges.schema().names
    row = nodes.take(1)[0]
    assert len(row["embedding"]) == 32
    erow = edges.take(1)[0]
    assert len(erow["embedding"]) == 32


def test_reembed_changed_nodes_reuses_unchanged_and_regenerates_changed():
    from knowledgegraph_ray.stages.embedder import (
        node_embed_texts,
        reembed_changed_nodes,
    )

    old_tbl = _mini_nodes_table(["engineer at acme"])
    # existing graph: embedded with backend v1 (value 1.0 everywhere)
    def backend_v1(texts):
        return np.full((len(texts), 4), 1.0, dtype=np.float32)

    def backend_v2(texts):
        return np.full((len(texts), 4), 2.0, dtype=np.float32)

    existing = rd.from_arrow(
        old_tbl.append_column(
            "embedding",
            pa.array([[1.0] * 4, [1.0] * 4], pa.list_(pa.float32())),
        )
    )
    # merged nodes: Sarah's description CHANGED, Acme unchanged
    new_tbl = pa.table(
        {
            "type": ["Person", "Company"],
            "name": ["Sarah Jones", "Acme"],
            "rawDescriptions": pa.array(
                [["now a manager"], ["builds things"]], pa.list_(pa.string())
            ),
        }
    )
    out = reembed_changed_nodes(
        rd.from_arrow(new_tbl), existing, dim=4, backend=backend_v2
    ).take_all()
    by_name = {r["name"]: r["embedding"] for r in out}
    # unchanged text → stored v1 embedding kept (backend v2 NOT invoked)
    assert by_name["Acme"] == [1.0] * 4
    # changed text → regenerated with the current backend
    assert by_name["Sarah Jones"] == [2.0] * 4


def test_incremental_merge_refreshes_embeddings(tmp_path, ray_session):
    """End-to-end D4: an incremental merge over an embedded graph keeps the
    embedding column and changes vectors only where the node text changed."""
    from knowledgegraph_ray.pipelines.kg_build import kg_build
    from knowledgegraph_ray.pipelines.incremental import incremental_merge
    from knowledgegraph_ray.sources.pages import write_pages

    paths = write_pages(str(tmp_path / "pages"), n_pages=40, seed=42, rows_per_file=20)
    res = kg_build(paths, str(tmp_path / "work"), batch_size=32, concurrency=2,
                   num_partitions=2, resume=False, embed=True, embed_dim=16)
    nodes, edges = res.nodes(), res.edges()
    extracted = rd.read_parquet(res.extract_dir)
    out = incremental_merge(nodes, edges, extracted, str(tmp_path / "incr"),
                            embed_dim=16)
    merged = rd.read_parquet(out["nodes_dir"])
    assert "embedding" in merged.schema().names
    # idempotent merge: same inputs → same embeddings as the original graph
    old = {(r["type"], r["name"]): r["embedding"] for r in nodes.take_all()}
    new = {(r["type"], r["name"]): r["embedding"] for r in merged.take_all()}
    assert old == new


def _ppm_bytes(px):
    h, w, _ = px.shape
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + px.tobytes()


def _bmp_bytes(px):
    import numpy as np

    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM" + (off + len(data)).to_bytes(4, "little") + b"\0\0\0\0"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + b"\0" * 16
    )
    return header + data


def _wav_bytes(samples_i16, rate=8000):
    data = samples_i16.tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_raw_image_decoders_roundtrip(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.multimodal import (
        decode_bmp,
        decode_images,
        decode_ppm,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(_ppm_bytes(px)), px)
    assert np.array_equal(decode_bmp(_bmp_bytes(px)), px)

    # end-to-end through the actor-pool stage with resize
    tbl = pa.table({
        "media_id": ["ppm-1", "bmp-1"],
        "media_type": ["image", "image"],
        "payload": [_ppm_bytes(px), _bmp_bytes(px)],
        "meta_json": ["{}", "{}"],
    })
    out = decode_images(rd.from_arrow(tbl), backend="raw", concurrency=1).take_all()
    assert {r["media_id"] for r in out} == {"ppm-1", "bmp-1"}
    for r in out:
        assert (r["height"], r["width"], r["channels"]) == (32, 32, 3)
        assert len(r["feature"]) == 6
    # same source pixels → identical pooled features from both formats
    feats = {r["media_id"]: r["feature"] for r in out}
    assert feats["ppm-1"] == feats["bmp-1"]


def test_raw_wav_decoder(ray_session):
    import numpy as np

    from knowledgegraph_ray.stages.multimodal import decode_wav_pcm16

    t = np.arange(800, dtype=np.float64)
    sig = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    samples, rate = decode_wav_pcm16(_wav_bytes(sig, rate=8000))
    assert rate == 8000 and len(samples) == 800
    assert np.allclose(samples, sig.astype(np.float32) / 32768.0)


def _y4m_bytes(frames_yuv, w, h):
    out = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n" % (w, h)
    for Y, U, V in frames_yuv:
        out += b"FRAME\n" + Y.tobytes() + U.tobytes() + V.tobytes()
    return out


def test_raw_y4m_video_decode_and_sampling(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.multimodal import decode_y4m, sample_video_frames

    w, h = 8, 6
    # 5 frames of flat gray ramp: Y=k*40, neutral chroma → R=G=B=Y
    frames = [
        (np.full((h, w), 40 * (k + 1), np.uint8),
         np.full((h // 2, w // 2), 128, np.uint8),
         np.full((h // 2, w // 2), 128, np.uint8))
        for k in range(5)
    ]
    payload = _y4m_bytes(frames, w, h)
    decoded, dw, dh = decode_y4m(payload)
    assert (dw, dh, len(decoded)) == (w, h, 5)
    for k, px in enumerate(decoded):
        assert px.shape == (h, w, 3)
        assert np.all(px == 40 * (k + 1))  # neutral chroma → gray

    tbl = pa.table({
        "media_id": ["v1"], "media_type": ["video"],
        "payload": [payload], "meta_json": ["{}"],
    })
    rows = sample_video_frames(
        rd.from_arrow(tbl), backend="raw", n_frames=3, concurrency=1
    ).take_all()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]  # uniform sampling
    assert all(abs(r["feature"][0] - 40 * (r["frame_idx"] + 1) / 255.0) < 1e-6
               for r in rows)


def test_pagerank_matches_dense_reference(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import pagerank

    # 4-node graph: chain a->b->c plus hub d<-a,b,c ; c dangling-free, d dangling
    names = ["a", "b", "c", "d"]
    nodes = pa.table({"name": names, "type": ["person"] * 4})
    e = [("a", "b"), ("b", "c"), ("a", "d"), ("b", "d"), ("c", "d")]
    edges = pa.table({
        "src": [s for s, _ in e], "dst": [d for _, d in e],
        "src_type": ["person"] * 5, "dst_type": ["person"] * 5,
    })
    got = pagerank(
        rd.from_arrow(nodes).repartition(2), rd.from_arrow(edges).repartition(2),
        damping=0.85, iters=30,
    ).to_pandas().set_index("name")["rank_r"]

    # dense power-iteration reference with identical dangling handling
    idx = {n_: i for i, n_ in enumerate(names)}
    n = 4
    deg = np.zeros(n); A = np.zeros((n, n))
    for s, d_ in e:
        deg[idx[s]] += 1
    for s, d_ in e:
        A[idx[d_], idx[s]] = 1.0
    r = np.full(n, 0.25)
    for _ in range(30):
        w = r / np.maximum(deg, 1)
        contrib = A @ w
        dangling = r[deg == 0].sum()
        r = 0.15 / n + 0.85 * (contrib + dangling / n)
    for name in names:
        assert abs(got[name] - np.floor(r[idx[name]] * 1e8) / 1e8) < 1e-12
    # hub d must rank highest
    assert got.idxmax() == "d"

    # distributed regime (forced past the small-graph threshold) must be
    # BIT-identical: same scatter/combine functions, same block order
    got_dist = pagerank(
        rd.from_arrow(nodes).repartition(2), rd.from_arrow(edges).repartition(2),
        damping=0.85, iters=30, small_graph_edges=0,
    ).to_pandas().set_index("name")["rank_r"]
    for name in names:
        assert got[name] == got_dist[name], name


def test_pagerank_drops_unmatched_endpoints(ray_session):
    """Public-operator safety (round-3 ADVICE): edges whose endpoint is
    absent from the nodes table must be DROPPED, not silently mapped to the
    searchsorted insertion-point node or crash with an IndexError."""
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import pagerank

    nodes = pa.table({"name": ["a", "b"], "type": ["person"] * 2})
    edges = pa.table({
        # a->b valid; ghost->a and b->ghost reference a node that isn't there
        "src": ["a", "ghost", "b"], "dst": ["b", "a", "ghost"],
        "src_type": ["person"] * 3, "dst_type": ["person"] * 3,
    })
    got = pagerank(rd.from_arrow(nodes), rd.from_arrow(edges),
                   damping=0.85, iters=10).to_pandas().set_index("name")["rank_r"]
    assert set(got.index) == {"a", "b"}
    # reference: 2-node graph with the single edge a->b (b dangling)
    import numpy as np
    r = np.full(2, 0.5)
    deg = np.array([1.0, 0.0])
    for _ in range(10):
        w = r / np.maximum(deg, 1)
        contrib = np.array([0.0, w[0]])
        dangling = r[1]
        r = 0.15 / 2 + 0.85 * (contrib + dangling / 2)
    assert abs(got["a"] - np.floor(r[0] * 1e8) / 1e8) < 1e-12
    assert abs(got["b"] - np.floor(r[1] * 1e8) / 1e8) < 1e-12


def test_khop_matches_bfs_reference(ray_session):
    import collections

    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import khop

    rng = np.random.default_rng(13)
    n = 60
    names = [f"n{i}" for i in range(n)]
    e = {(f"n{int(a)}", f"n{int(b)}")
         for a, b in rng.integers(0, n, (150, 2)) if a != b}
    edges = pa.table({"src": [s for s, _ in sorted(e)],
                      "dst": [d for _, d in sorted(e)]})

    def bfs(seeds, k, directed):
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

    ds = rd.from_arrow(edges).repartition(5)
    for k in (1, 2, 3):
        got = {r["name"]: r["hop"]
               for r in khop(ds, ["n0", "n7"], k=k).to_pylist()}
        assert got == bfs(["n0", "n7"], k, directed=False), k
    got_out = {r["name"]: r["hop"]
               for r in khop(ds, ["n0"], k=2, direction="out").to_pylist()}
    assert got_out == bfs(["n0"], 2, directed=True)


def test_triangle_count_matches_brute_force(ray_session):
    import itertools

    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import triangle_count

    rng = np.random.default_rng(5)
    n = 70
    E = {(int(a), int(b)) for a, b in rng.integers(0, n, (300, 2)) if a != b}
    adj = {i: set() for i in range(n)}
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    want = sum(
        1 for a, b, c in itertools.combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert want > 0
    tbl = pa.table({"src": [a for a, b in sorted(E)],
                    "dst": [b for a, b in sorted(E)]})
    for parts in (1, 3, 8):
        got = triangle_count(rd.from_arrow(tbl).repartition(parts))
        assert got.column("triangles")[0].as_py() == want, parts
    # string node ids take the same path; reversed duplicates + self loops
    # collapse in canonicalization
    with_noise = pa.table({
        "src": ([f"v{a}" for a, b in sorted(E)]
                + [f"v{b}" for a, b in sorted(E)] + ["v0"]),
        "dst": ([f"v{b}" for a, b in sorted(E)]
                + [f"v{a}" for a, b in sorted(E)] + ["v0"]),
    })
    got = triangle_count(rd.from_arrow(with_noise).repartition(4))
    assert got.column("triangles")[0].as_py() == want
    # triangle-free graph
    star = pa.table({"src": [0] * 10, "dst": list(range(1, 11))})
    got = triangle_count(rd.from_arrow(star))
    assert got.column("triangles")[0].as_py() == 0


def test_triangle_count_hot_hub(ray_session):
    # wheel graph: one hub connected to every leaf + a leaf ring — the
    # degree-ordered orientation charges every wedge to a LEAF (degree 3),
    # so the hub's 2000-degree fan-out never lands in one group
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import triangle_count

    n = 2000
    src = ["hub"] * n + [f"l{i}" for i in range(n)]
    dst = [f"l{i}" for i in range(n)] + [f"l{(i + 1) % n}" for i in range(n)]
    got = triangle_count(
        rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(6)
    )
    assert got.column("triangles")[0].as_py() == n


def test_label_propagation_matches_reference(ray_session):
    import collections

    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import label_propagation

    def reference(E, rounds):
        adj = collections.defaultdict(set)
        for u, v in E:
            adj[u].add(v)
            adj[v].add(u)
        lab = {n: n for n in adj}
        for _ in range(rounds):
            new = {}
            for n in adj:
                cnt = collections.Counter(lab[m] for m in adj[n])
                best = max(cnt.values())
                new[n] = min(l for l, c in cnt.items() if c == best)
            lab = new
        return lab

    # two cliques joined by one bridge edge
    a = [f"a{i}" for i in range(6)]
    b = [f"b{i}" for i in range(6)]
    E = {(x, y) for i, x in enumerate(a) for y in a[i + 1:]}
    E |= {(x, y) for i, x in enumerate(b) for y in b[i + 1:]}
    E.add((a[0], b[0]))
    # plus random noise graph (disjoint)
    rng = np.random.default_rng(3)
    E |= {(f"n{int(x)}", f"n{int(y)}")
          for x, y in rng.integers(0, 40, (80, 2)) if x != y}

    tbl = pa.table({"src": [u for u, v in sorted(E)],
                    "dst": [v for u, v in sorted(E)]})
    want = reference(E, rounds=4)
    for parts in (1, 5):
        # small-graph (driver) regime — the default at this size
        got = {r["node"]: r["community"] for r in label_propagation(
            rd.from_arrow(tbl).repartition(parts), rounds=4
        ).take_all()}
        assert got == want, parts
        # distributed regime (forced) must be EXACTLY equal
        got_dist = {r["node"]: r["community"] for r in label_propagation(
            rd.from_arrow(tbl).repartition(parts), rounds=4,
            small_graph_edges=0,
        ).take_all()}
        assert got_dist == want, parts
    # structure: each clique coalesces to one community, and they differ
    assert len({want[x] for x in a[1:]}) == 1
    assert len({want[x] for x in b[1:]}) == 1
    assert want[a[1]] != want[b[1]]


def test_random_walks_deterministic_and_valid(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.functions.hashing import hash_key_columns, mix64
    from knowledgegraph_ray.stages.graph_query import random_walks

    rng = np.random.default_rng(17)
    n = 50
    E = {(f"v{int(a)}", f"v{int(b)}")
         for a, b in rng.integers(0, n, (120, 2)) if a != b}
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    adj = {k: sorted(vs) for k, vs in adj.items()}

    def reference(length, seed):
        rows = set()
        for node in adj:
            h = hash_key_columns(pa.table({"node": [node]}), ["node"])
            wid = int((mix64(h ^ np.uint64(0)).view(np.int64) >> 1)[0])
            cur = node
            rows.add((wid, 0, cur))
            for step in range(length):
                r = mix64(np.array([wid], np.int64).view(np.uint64)
                          ^ (np.uint64(step + 1)
                             * np.uint64(0xD6E8FEB86659FD93))
                          ^ np.uint64(seed))[0]
                cur = adj[cur][int(r % np.uint64(len(adj[cur])))]
                rows.add((wid, step + 1, cur))
        return rows

    tbl = pa.table({"src": [u for u, v in sorted(E)],
                    "dst": [v for u, v in sorted(E)]})
    for parts, seed in ((1, 0), (4, 0), (4, 7)):
        got = {(r["walk_id"], r["step"], r["node"])
               for r in random_walks(
                   rd.from_arrow(tbl).repartition(parts),
                   length=4, seed=seed).take_all()}
        assert got == reference(4, seed), (parts, seed)
    # every consecutive hop is a real edge
    byw = {}
    for w, s, node in reference(4, 0):
        byw.setdefault(w, {})[s] = node
    und = {frozenset(p) for p in E}
    for w, path in byw.items():
        for s in range(4):
            assert frozenset((path[s], path[s + 1])) in und


def test_ego_subgraph_matches_reference(ray_session):
    import collections

    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import ego_subgraph

    rng = np.random.default_rng(29)
    n = 40
    E = {(f"v{int(a)}", f"v{int(b)}")
         for a, b in rng.integers(0, n, (90, 2)) if a != b}
    adj = collections.defaultdict(set)
    for u, v in E:
        adj[u].add(v)
        adj[v].add(u)
    dist = {"v0": 0}
    q = collections.deque(["v0"])
    while q:
        u = q.popleft()
        if dist[u] == 2:
            continue
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    want = {(u, v) for u, v in E if u in dist and v in dist}
    tbl = pa.table({"src": [u for u, v in sorted(E)],
                    "dst": [v for u, v in sorted(E)]})
    got = {(r["src"], r["dst"]) for r in ego_subgraph(
        rd.from_arrow(tbl).repartition(4), ["v0"], k=2
    ).take_all()}
    assert got == want
    assert 0 < len(got) < len(E)

    # custom endpoint column names must drive BOTH the BFS and the induced
    # filter — including when decoy src/dst columns exist — and integer
    # node ids must work (khop used to hardcode select_columns(["src",
    # "dst"]) and pa.string() frontiers)
    ids = {u: int(u[1:]) for u, v in E} | {v: int(v[1:]) for u, v in E}
    tbl2 = pa.table({
        "u": [ids[u] for u, v in sorted(E)],
        "v": [ids[v] for u, v in sorted(E)],
        # decoys: BFS over these would produce a different subgraph
        "src": ["zz"] * len(E), "dst": ["zz"] * len(E),
    })
    got2 = {(r["u"], r["v"]) for r in ego_subgraph(
        rd.from_arrow(tbl2).repartition(4), [0], k=2, src="u", dst="v"
    ).take_all()}
    assert got2 == {(ids[u], ids[v]) for u, v in want}


def test_link_predict_matches_brute_force(ray_session):
    import itertools

    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import (
        link_predict_common_neighbors,
    )

    rng = np.random.default_rng(11)
    n = 60
    E = {(int(min(a, b)), int(max(a, b)))
         for a, b in rng.integers(0, n, (220, 2)) if a != b}
    adj = {i: set() for i in range(n)}
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    scores = {}
    for u, w in itertools.combinations(range(n), 2):
        if (u, w) in E:
            continue
        c = len(adj[u] & adj[w])
        if c:
            scores[(u, w)] = c
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    want = [(u, w, c) for (u, w), c in want]
    assert want and want[0][2] >= 2

    tbl = pa.table({"src": [a for a, b in sorted(E)],
                    "dst": [b for a, b in sorted(E)]})
    for parts in (1, 4):
        got = link_predict_common_neighbors(
            rd.from_arrow(tbl).repartition(parts), k=25
        ).to_pandas()
        assert [tuple(r) for r in got[["u", "w", "cn"]].itertuples(index=False)] == want, parts

    # reversed duplicates and self loops collapse in canonicalization
    noisy = pa.table({
        "src": ([a for a, b in sorted(E)] + [b for a, b in sorted(E)] + [3]),
        "dst": ([b for a, b in sorted(E)] + [a for a, b in sorted(E)] + [3]),
    })
    got = link_predict_common_neighbors(rd.from_arrow(noisy), k=25).to_pandas()
    assert [tuple(r) for r in got[["u", "w", "cn"]].itertuples(index=False)] == want

    # max_degree skew guard: a star hub's wedges vanish when the cap
    # excludes the hub, so no leaf pair is predicted
    star = pa.table({"src": [0] * 12, "dst": list(range(1, 13))})
    uncapped = link_predict_common_neighbors(
        rd.from_arrow(star), k=100
    ).to_pandas()
    assert len(uncapped) == 12 * 11 // 2 and set(uncapped["cn"]) == {1}
    capped = link_predict_common_neighbors(
        rd.from_arrow(star), k=100, max_degree=5
    ).to_pandas()
    assert len(capped) == 0


def test_link_predict_resource_allocation_matches_brute_force(ray_session):
    import itertools

    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import (
        RA_SCALE,
        link_predict_common_neighbors,
    )

    rng = np.random.default_rng(23)
    n = 50
    E = {(int(min(a, b)), int(max(a, b)))
         for a, b in rng.integers(0, n, (180, 2)) if a != b}
    adj = {i: set() for i in range(n)}
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    scores = {}
    for u, w in itertools.combinations(range(n), 2):
        if (u, w) in E:
            continue
        s = sum(RA_SCALE // len(adj[v]) for v in adj[u] & adj[w])
        if s:
            scores[(u, w)] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    want = [(u, w, s) for (u, w), s in want]
    assert want

    tbl = pa.table({"src": [a for a, b in sorted(E)],
                    "dst": [b for a, b in sorted(E)]})
    for parts in (1, 4):
        got = link_predict_common_neighbors(
            rd.from_arrow(tbl).repartition(parts), k=25, method="ra"
        ).to_pandas()
        assert [tuple(r) for r in
                got[["u", "w", "ra"]].itertuples(index=False)] == want, parts


def test_link_predict_jaccard_matches_brute_force(ray_session):
    import itertools

    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.graph_query import (
        RA_SCALE,
        link_predict_common_neighbors,
    )

    rng = np.random.default_rng(31)
    n = 50
    E = {(int(min(a, b)), int(max(a, b)))
         for a, b in rng.integers(0, n, (180, 2)) if a != b}
    adj = {i: set() for i in range(n)}
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    scores = {}
    for u, w in itertools.combinations(range(n), 2):
        if (u, w) in E:
            continue
        c = len(adj[u] & adj[w])
        if c:
            scores[(u, w)] = (RA_SCALE * c) // (len(adj[u]) + len(adj[w]) - c)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    want = [(u, w, s) for (u, w), s in want]
    assert want

    tbl = pa.table({"src": [a for a, b in sorted(E)],
                    "dst": [b for a, b in sorted(E)]})
    for parts in (1, 4):
        got = link_predict_common_neighbors(
            rd.from_arrow(tbl).repartition(parts), k=25, method="jaccard"
        ).to_pandas()
        assert [tuple(r) for r in
                got[["u", "w", "jaccard"]].itertuples(index=False)] == want, parts

"""J1/D6/D8 — endpoint resolution joins + edge grouping/dedup."""

import json

import pyarrow as pa

import ray.data as rd

from knowledgegraph_ray.functions.ids import relation_id
from knowledgegraph_ray.stages.canonicalize import canonicalize
from knowledgegraph_ray.stages.edges import materialize_edges


def _mentions(rows):
    return pa.Table.from_pydict(
        {
            "mid": [r["mid"] for r in rows],
            "url": [r["url"] for r in rows],
            "ord": [r.get("ord", r["mid"] // 100) for r in rows],
            "entity_name": [r["name"] for r in rows],
            "entity_type": [r.get("type", "Person") for r in rows],
            "attributes_json": [json.dumps(r.get("attrs", {"name": r["name"]})) for r in rows],
            "permissions_json": [json.dumps(r.get("perms", [])) for r in rows],
        }
    )


def _triples(rows):
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "ord": [r.get("ord", 0) for r in rows],
            "source_entity": [r["src"] for r in rows],
            "target_entity": [r["dst"] for r in rows],
            "relationship_type": [r["type"] for r in rows],
            "description": [r.get("desc", "") for r in rows],
            "strength": pa.array([float(r.get("strength", 5.0)) for r in rows], pa.float32()),
            "sources_json": [json.dumps([r["url"]]) for r in rows],
            "permissions_json": [json.dumps(r.get("perms", [])) for r in rows],
        }
    )


def _run(mention_rows, triple_rows):
    mentions = rd.from_arrow(_mentions(mention_rows))
    nodes, with_comp = canonicalize(mentions, num_partitions=2)
    edges = materialize_edges(
        rd.from_arrow(_triples(triple_rows)), with_comp, nodes, num_partitions=2
    )
    return sorted(edges.take_all(), key=lambda e: (e["src"], e["type"], e["dst"]))


def test_duplicate_edges_merge_max_strength_union_arrays():
    mention_rows = [
        {"mid": 0, "url": "d1", "ord": 0, "name": "A",
         "attrs": {"name": "A", "email": "a@x.com"}},
        {"mid": 1, "url": "d1", "ord": 0, "name": "Acme", "type": "Organization",
         "attrs": {"name": "Acme"}},
        # second doc mentions the same person via alias surface + same email
        {"mid": 100, "url": "d2", "ord": 1, "name": "A. Person",
         "attrs": {"name": "A. Person", "email": "a@x.com"}},
        {"mid": 101, "url": "d2", "ord": 1, "name": "Acme", "type": "Organization",
         "attrs": {"name": "Acme"}},
    ]
    triple_rows = [
        {"url": "d1", "ord": 0, "src": "A", "dst": "Acme", "type": "WORKS_AT",
         "desc": "A works at Acme", "strength": 7, "perms": ["p1"]},
        {"url": "d2", "ord": 1, "src": "A. Person", "dst": "Acme", "type": "WORKS_AT",
         "desc": "employee of Acme", "strength": 9, "perms": ["p2"]},
    ]
    edges = _run(mention_rows, triple_rows)
    assert len(edges) == 1
    e = edges[0]
    assert (e["src"], e["dst"], e["type"]) == ("A", "Acme", "WORKS_AT")
    assert e["strength"] == 9.0  # max (systematic_merge_provider.py:1025)
    assert e["description"] == ["A works at Acme", "employee of Acme"]  # ord order
    assert e["sources"] == ["d1", "d2"]
    assert e["permissions"] == ["p1", "p2"]
    assert e["relation_id"] == relation_id("A", "Acme", "WORKS_AT")
    assert e["n_raw"] == 2


def test_unmapped_endpoint_drops_triple():
    # systematic_merge_provider.py:951-963 — unmapped endpoints dropped
    mention_rows = [
        {"mid": 0, "url": "d1", "name": "A", "attrs": {"name": "A"}},
    ]
    triple_rows = [
        {"url": "d1", "src": "A", "dst": "Ghost", "type": "KNOWS"},
        {"url": "d1", "src": "Ghost", "dst": "A", "type": "KNOWS"},
    ]
    assert _run(mention_rows, triple_rows) == []


def test_resolution_is_document_scoped():
    """Endpoint lookup uses the same-document mention map: a surface defined
    only in d1 does not resolve triples in d2."""
    mention_rows = [
        {"mid": 0, "url": "d1", "name": "A", "attrs": {"name": "A"}},
        {"mid": 1, "url": "d1", "name": "B", "attrs": {"name": "B"}},
    ]
    triple_rows = [
        {"url": "d2", "src": "A", "dst": "B", "type": "KNOWS"},
    ]
    assert _run(mention_rows, triple_rows) == []


def test_endpoints_rewritten_to_canonical_names():
    mention_rows = [
        {"mid": 0, "url": "d1", "ord": 0, "name": "Sarah Jones",
         "attrs": {"name": "Sarah Jones", "email": "s@x.com"}},
        {"mid": 100, "url": "d2", "ord": 1, "name": "S. Jones",
         "attrs": {"name": "S. Jones", "email": "s@x.com"}},
        {"mid": 101, "url": "d2", "ord": 1, "name": "Globex", "type": "Organization",
         "attrs": {"name": "Globex"}},
    ]
    triple_rows = [
        {"url": "d2", "ord": 1, "src": "S. Jones", "dst": "Globex", "type": "WORKS_AT"},
    ]
    edges = _run(mention_rows, triple_rows)
    assert len(edges) == 1
    assert edges[0]["src"] == "Sarah Jones"  # canonical (first-seen) name
    assert edges[0]["src_type"] == "Person"
    assert edges[0]["dst_type"] == "Organization"


def test_alias_map_cross_block_duplicate_last_wins():
    """Same (url, surface) in two different blocks → the max-mid mention's
    canonical wins (the reference dict's last-write-wins,
    systematic_merge_provider.py:444-459), resolved without a global sort."""
    from knowledgegraph_ray.stages.edges import build_alias_map

    a = _mentions([
        {"mid": 0, "url": "d1", "name": "X", "attrs": {"name": "P1"}},
        # earlier mention anchoring the winning component's canonical name
        {"mid": 10, "url": "d2", "name": "P2 Canonical", "attrs": {"name": "P2"}},
    ])
    b = _mentions([
        {"mid": 50, "url": "d1", "name": "X", "attrs": {"name": "P2"}},
    ])
    mentions = rd.from_arrow(a).union(rd.from_arrow(b))
    nodes, with_comp = canonicalize(mentions, num_partitions=2)
    alias = build_alias_map(with_comp, nodes, num_partitions=2)
    rows = {(r["url"], r["surface"]): r["canonical"] for r in alias.take_all()}
    assert len(rows) == 2
    # mid 50 beats mid 0: (d1, X) maps into the P2 component, whose
    # canonical name comes from its min-mid mention's surface
    assert rows[("d1", "X")] == "P2 Canonical"
    assert rows[("d2", "P2 Canonical")] == "P2 Canonical"


def test_loser_scan_distributed_matches_inline(ray_session):
    """The distributed cross-block duplicate scan (groupby + broadcast
    filter) must drop exactly the mids the inline lexsort scan drops,
    including multi-duplicate keys and blocks with no duplicates."""
    import numpy as np

    import ray

    from knowledgegraph_ray.functions.joins import PREHASH_COL
    from knowledgegraph_ray.stages.edges import (
        _loser_mids_distributed,
        _loser_mids_task_fn,
    )

    rng = np.random.default_rng(11)
    n = 5000
    # ~10% duplicate keys, some triplicates
    base = rng.integers(0, n // 2, size=n).astype(np.uint64)
    h1 = base * np.uint64(0x9E3779B97F4A7C15)
    h2 = base * np.uint64(0xFF51AFD7ED558CCD) + np.uint64(7)
    mid = np.arange(n, dtype=np.int64)
    rng.shuffle(mid)
    t = pa.Table.from_pydict(
        {
            PREHASH_COL: pa.array(h1, pa.uint64()),
            "h2": pa.array(h2, pa.uint64()),
            "mid": pa.array(mid, pa.int64()),
        }
    )
    proj = rd.from_arrow(t).repartition(7).materialize()
    inline = set(_loser_mids_task_fn(proj.to_arrow_refs()).tolist())
    dist = set(_loser_mids_distributed(proj).tolist())
    assert len(inline) > 0
    assert dist == inline


def test_merge_edge_block_matches_row_reducer(ray_session):
    """Block reducer == per-group row reducer on a multi-group block with
    duplicate descriptions, JSON payloads, and out-of-order ords."""
    import numpy as np

    from knowledgegraph_ray.stages.edges import (
        EDGES_SCHEMA,
        merge_edge_block,
        merge_edge_row,
    )

    rows = []
    for g in range(5):
        for i in range(4):
            rows.append({
                "canonical_src": f"S{g}", "canonical_dst": f"D{g}",
                "relationship_type": "works_with",
                "src_type": "Person", "dst_type": "Person",
                "description": f"desc-{i % 2}",
                "permissions_json": '["p1","p2"]' if i % 2 else '["p2"]',
                "sources_json": f'["u{i}"]',
                "strength": float(10 - i),
                "ord": 100 - i,  # descending: exercises the in-run sort
            })
    tbl = pa.Table.from_pylist(rows)
    # group runs are contiguous already; starts at multiples of 4
    starts = np.arange(0, 20, 4)
    # block path pre-sorts by (run, ord) — emulate grouped_apply
    run_id = np.repeat(np.arange(5), 4)
    ordv = tbl.column("ord").to_numpy(zero_copy_only=False)
    order = np.lexsort((ordv, run_id))
    got = merge_edge_block(tbl.take(pa.array(order, pa.int64())), starts)
    want = pa.Table.from_pylist(
        [merge_edge_row(tbl.slice(s, 4)) for s in starts], schema=EDGES_SCHEMA
    )
    assert got.equals(want)

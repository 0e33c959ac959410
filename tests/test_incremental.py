"""D4/J3 — incremental merge into an existing graph equals a from-scratch run."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from knowledgegraph_ray.pipelines import kg_build
from knowledgegraph_ray.pipelines.incremental import incremental_merge


@pytest.fixture(scope="module")
def split_build(pages_small, tmp_path_factory):
    """Graph from shards[:2]; extraction of shards[2:] kept for the merge."""
    base = str(tmp_path_factory.mktemp("incr_base"))
    later = str(tmp_path_factory.mktemp("incr_later"))
    full = str(tmp_path_factory.mktemp("incr_full"))
    paths = pages_small["paths"]
    first = kg_build(paths[:2], base, batch_size=64, concurrency=2, num_partitions=2)
    from knowledgegraph_ray.pipelines.kg_build import run_extraction

    run_extraction(paths[2:], later, batch_size=64, concurrency=2)
    full_res = kg_build(paths, full, batch_size=64, concurrency=2, num_partitions=2)
    return first, later, full_res


def test_incremental_equals_full_rebuild(split_build, tmp_path_factory):
    first, later, full_res = split_build
    out = str(tmp_path_factory.mktemp("incr_out"))
    new_extracted = rd.read_parquet(later + "/extracted")
    res = incremental_merge(
        first.nodes(), first.edges(), new_extracted, out, num_partitions=2
    )

    inc_edges = pq.read_table(res["edges_dir"]).to_pylist()
    full_edges = pq.read_table(full_res.edges_dir).to_pylist()

    def edge_key(e):
        return (e["src"], e["type"], e["dst"])

    inc_map = {edge_key(e): e for e in inc_edges}
    full_map = {edge_key(e): e for e in full_edges}
    missing = set(full_map) - set(inc_map)
    extra = set(inc_map) - set(full_map)
    assert not missing and not extra, f"missing={list(missing)[:4]} extra={list(extra)[:4]}"
    for k, fe in full_map.items():
        ie = inc_map[k]
        assert ie["strength"] == fe["strength"], k
        assert sorted(ie["sources"]) == sorted(fe["sources"]), k
        assert ie["relation_id"] == fe["relation_id"], k

    inc_nodes = {(n["type"], n["name"]) for n in pq.read_table(res["nodes_dir"]).to_pylist()}
    full_nodes = {(n["type"], n["name"]) for n in pq.read_table(full_res.nodes_dir).to_pylist()}
    assert inc_nodes == full_nodes


def test_incremental_preserves_primary_key_and_appends():
    """A new mention matching an existing entity by email merges into it —
    the primary name never changes (systematic_merge_provider.py:682-684)."""
    existing_nodes = rd.from_arrow(pa.Table.from_pylist([
        {"comp": 1, "min_ord": 0, "name": "Sarah Jones", "type": "Person",
         "emails": ["s@a.com"], "aliases": [], "rawDescriptions": ["engineer"],
         "permissions": [], "sources": ["d0"], "role": [], "location": [],
         "tags": [], "reviewers": [], "labels": [], "assignees": [],
         "keywords": [], "relatedThreads": [], "surfaces": ["Sarah Jones"],
         "n_mentions": 1},
    ]))
    existing_edges = rd.from_arrow(pa.Table.from_pylist([], schema=__import__(
        "knowledgegraph_ray.stages.edges", fromlist=["EDGES_SCHEMA"]).EDGES_SCHEMA))

    from knowledgegraph_ray.stages.extract import EXTRACTION_SCHEMA

    new_extracted = rd.from_arrow(pa.Table.from_pylist([
        {
            "url": "d1", "ord": 5, "lang": "en", "shard": "s0",
            "permissions": ["viewer@x"], "error": "",
            "entities": [{
                "entity_name": "S. Jones", "entity_type": "Person",
                "attributes_json": json.dumps(
                    {"name": "S. Jones", "email": "s@a.com",
                     "description": "new fact", "sources": ["d1"]}),
            }],
            "relationships": [],
            "entity_count": 1, "relationship_count": 0,
        },
    ], schema=EXTRACTION_SCHEMA))

    import tempfile

    with tempfile.TemporaryDirectory(dir="/tmp") as out:
        res = incremental_merge(existing_nodes, existing_edges, new_extracted, out,
                                num_partitions=2)
        nodes = pq.read_table(res["nodes_dir"]).to_pylist()
    assert len(nodes) == 1
    n = nodes[0]
    assert n["name"] == "Sarah Jones"        # PK preserved
    assert "S. Jones" in n["aliases"]        # new surface becomes alias
    assert n["rawDescriptions"] == ["engineer", "new fact"]
    assert "viewer@x" in n["permissions"]
    assert sorted(n["sources"]) == ["d0", "d1"]


def test_bridging_mention_merges_two_existing_entities(tmp_path_factory):
    """A new mention sharing keys with two previously distinct entities joins
    them; the earlier entity's name wins and existing edges are rewritten."""
    from knowledgegraph_ray.stages.edges import EDGES_SCHEMA
    from knowledgegraph_ray.stages.extract import EXTRACTION_SCHEMA

    base_node = {
        "comp": 0, "emails": [], "aliases": [], "rawDescriptions": [],
        "permissions": [], "sources": [], "role": [], "location": [],
        "tags": [], "reviewers": [], "labels": [], "assignees": [],
        "keywords": [], "relatedThreads": [], "n_mentions": 1,
    }
    existing_nodes = rd.from_arrow(pa.Table.from_pylist([
        {**base_node, "min_ord": 0, "name": "Sarah Jones", "type": "Person",
         "emails": ["s@a.com"], "surfaces": ["Sarah Jones"]},
        {**base_node, "min_ord": 7, "name": "S.J.", "type": "Person",
         "emails": ["sj@b.com"], "surfaces": ["S.J."]},
        {**base_node, "min_ord": 3, "name": "Acme", "type": "Organization",
         "surfaces": ["Acme"]},
    ]))
    existing_edges = rd.from_arrow(pa.Table.from_pylist([
        {"relation_id": "x", "src": "S.J.", "dst": "Acme", "type": "WORKS_AT",
         "relationTag": ["WORKS_AT"], "description": ["sj at acme"],
         "strength": 7.0, "permissions": [], "sources": ["d7"],
         "src_type": "Person", "dst_type": "Organization", "n_raw": 1},
    ], schema=EDGES_SCHEMA))

    # bridging mention: carries BOTH emails
    new_extracted = rd.from_arrow(pa.Table.from_pylist([
        {
            "url": "d9", "ord": 9, "lang": "en", "shard": "s0",
            "permissions": [], "error": "",
            "entities": [{
                "entity_name": "Sarah J.", "entity_type": "Person",
                "attributes_json": json.dumps(
                    {"name": "Sarah J.", "email": "s@a.com",
                     "emails": ["s@a.com", "sj@b.com"], "sources": ["d9"]}),
            }],
            "relationships": [],
            "entity_count": 1, "relationship_count": 0,
        },
    ], schema=EXTRACTION_SCHEMA))

    out = str(tmp_path_factory.mktemp("bridge"))
    res = incremental_merge(existing_nodes, existing_edges, new_extracted, out,
                            num_partitions=2)
    nodes = {n["name"]: n for n in pq.read_table(res["nodes_dir"]).to_pylist()}
    assert set(nodes) == {"Sarah Jones", "Acme"}
    merged = nodes["Sarah Jones"]
    assert "S.J." in merged["aliases"]
    assert sorted(merged["emails"]) == ["s@a.com", "sj@b.com"]

    edges = pq.read_table(res["edges_dir"]).to_pylist()
    assert len(edges) == 1
    e = edges[0]
    assert e["src"] == "Sarah Jones"  # rewritten to the surviving canonical
    assert e["dst"] == "Acme"
    from knowledgegraph_ray.functions.ids import relation_id

    assert e["relation_id"] == relation_id("Sarah Jones", "Acme", "WORKS_AT")
    assert e["sources"] == ["d7"]

"""Config system (entity_schema), normalizer, id generation, manifests."""

import hashlib

import pyarrow as pa

from knowledgegraph_ray.config import (
    ARRAY_NODE_COLUMNS,
    ENTITY_TYPES,
    SCALAR_NODE_COLUMNS,
    array_fields_for,
    get_spec,
    llm_to_db_field,
    match_rules_for,
    merge_strategy_for,
)
from knowledgegraph_ray.functions.ids import entity_content_id, relation_id
from knowledgegraph_ray.functions.normalize import norm_array, norm_string
from knowledgegraph_ray.state.manifests import (
    Manifest,
    completed_shards,
    load_manifests,
    shard_name,
    write_manifest,
)


def test_ten_entity_types_registered():
    assert set(ENTITY_TYPES) == {
        "Person", "Team", "Organization", "Project", "Repository", "Branch",
        "CodeChangeRequest", "Issue", "Event", "Topic",
    }


def test_llm_to_db_mapping():
    # entity_config.py:63-75 — email → emails, description → rawDescriptions
    assert llm_to_db_field("Person", "email") == "emails"
    assert llm_to_db_field("Person", "description") == "rawDescriptions"
    assert llm_to_db_field("Event", "title") == "name"
    # unmapped attrs fall through by name
    assert llm_to_db_field("Person", "nonexistent") == "nonexistent"


def test_merge_strategies():
    assert merge_strategy_for("Person", "name") == "preserve_existing"
    assert merge_strategy_for("Person", "role") == "append_unique"
    assert merge_strategy_for("Project", "status") == "replace_always"
    assert merge_strategy_for("Organization", "industry") == "replace_if_better"
    # default for unknown field (entity_config.py:83)
    assert merge_strategy_for("Person", "zzz") == "replace_if_better"


def test_array_fields_exclude_embedding():
    fields = array_fields_for("Person")
    assert "emails" in fields and "aliases" in fields
    assert "embedding" not in fields


def test_match_rules_sorted_by_priority():
    rules = match_rules_for("Person")
    assert [r.priority for r in rules] == sorted(r.priority for r in rules)
    assert rules[0].rule == "search" and rules[0].db == "emails"


def test_unified_node_columns():
    assert SCALAR_NODE_COLUMNS[:2] == ["name", "type"]
    assert "emails" in ARRAY_NODE_COLUMNS and "aliases" in ARRAY_NODE_COLUMNS
    assert get_spec("Nope") is None


def test_norm_string():
    assert norm_string("  Sarah JONES ") == "sarah jones"
    assert norm_string(None) == ""
    assert norm_string("") == ""


def test_norm_array_matches_scalar():
    vals = ["  Sarah JONES ", "ACME", ""]
    arr = norm_array(pa.array(vals))
    assert arr.to_pylist() == [norm_string(v) for v in vals]


def test_relation_id_is_reference_sha256():
    # systematic_merge_provider.py:1193-1196 — sha256("src::type::dst")
    expected = hashlib.sha256("A::WORKS_AT::B".encode()).hexdigest()
    assert relation_id("A", "B", "WORKS_AT") == expected


def test_entity_content_id_priority():
    by_email = entity_content_id("Person", {"emails": ["X@a.com"], "name": "X"})
    by_email2 = entity_content_id("Person", {"emails": ["x@A.COM"]})
    assert by_email == by_email2  # email wins, case-insensitive
    by_name = entity_content_id("Person", {"name": "X"})
    assert by_name != by_email


def test_manifest_roundtrip(tmp_path):
    d = str(tmp_path / "m")
    m = Manifest(stage="extract", input_file="/x/pages-00001.parquet",
                 shard="pages-00001", rows_in=60, rows_out=60,
                 entity_mentions=100, raw_triples=80, errors=1, wall_s=0.5)
    write_manifest(d, m)
    loaded = load_manifests(d, stage="extract")
    assert loaded["pages-00001"] == m
    assert completed_shards(d, "extract") == {"pages-00001"}
    assert completed_shards(d, "graph") == set()


def test_corrupt_manifest_ignored(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    (d / "extract--bad.json").write_text("{not json")
    assert load_manifests(str(d)) == {}


def test_shard_name():
    assert shard_name("/a/b/pages-00003.parquet") == "pages-00003"


# ---------------------------------------------------------------------------
# Runtime YAML config loading (entity_config.py:21-168 parity)
# ---------------------------------------------------------------------------


def test_yaml_loader_reproduces_frozen_table():
    """Loading the reference's own entity_config.yaml yields EXACTLY the
    committed Python specs — the transcription is proven, and YAML is a
    working extension surface."""
    from knowledgegraph_ray.config.entity_schema import ENTITY_TYPES
    from knowledgegraph_ray.config.yaml_config import load_entity_config

    loaded = load_entity_config("/root/reference/entity_config.yaml")
    assert sorted(loaded) == sorted(ENTITY_TYPES)
    for name, spec in ENTITY_TYPES.items():
        got = loaded[name]
        assert set(got.llm_fields) == set(spec.llm_fields), name
        fa, fb = got.field_map(), spec.field_map()
        assert set(fa) == set(fb), name
        for k in fa:
            assert (fa[k].is_array, fa[k].strategy, fa[k].llm_field) == (
                fb[k].is_array, fb[k].strategy, fb[k].llm_field
            ), (name, k)
        assert got.match_rules == spec.match_rules, name


def test_register_new_entity_type_from_yaml_and_canonicalize(tmp_path):
    """An 11th entity type is a YAML edit: register it, emit mentions of it,
    and the canonicalizer groups them by the YAML-declared match rules."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.config.entity_schema import ENTITY_TYPES
    from knowledgegraph_ray.config.yaml_config import register_entity_config
    from knowledgegraph_ray.stages.canonicalize import canonicalize

    cfg = tmp_path / "custom.yaml"
    cfg.write_text(
        """
entity_schemas:
  Dataset:
    llm_fields: [name, alias, description, url]
    mappings:
      name:
        type: "STRING PRIMARY KEY"
        merge_strategy: "preserve_existing"
        mapping: name
      aliases:
        type: "STRING[]"
        merge_strategy: "append_unique"
        mapping: aliases
      url:
        type: "STRING"
        merge_strategy: "preserve_existing"
        mapping: url
      rawDescriptions:
        type: "STRING[]"
        merge_strategy: "append_unique"
        mapping: description
systematic_merge:
  matching_rules:
    Dataset:
      - rule: "exact"
        match: "url"
        priority: 1
        confidence: 0.95
      - rule: "search"
        match: "alias"
        db: "aliases"
        type: "list"
        priority: 2
        confidence: 0.7
"""
    )
    added = register_entity_config(str(cfg))
    try:
        assert added == ["Dataset"]
        rows = [
            # same url → same entity despite different names
            (1, "CC-Main", {"url": "https://data.example/cc", "description": "crawl"}),
            (2, "CommonCrawl Main", {"url": "https://data.example/cc"}),
            # alias overlap chains a third mention in
            (3, "CC", {"aliases": ["CommonCrawl Main"]}),
            # unrelated dataset stays separate
            (4, "OtherSet", {"url": "https://data.example/other"}),
        ]
        mentions = rd.from_arrow(pa.table({
            "mid": pa.array([r[0] for r in rows], pa.int64()),
            "ord": pa.array([r[0] for r in rows], pa.int64()),
            "url": pa.array(["doc://1"] * len(rows), pa.string()),
            "entity_name": pa.array([r[1] for r in rows], pa.string()),
            "entity_type": pa.array(["Dataset"] * len(rows), pa.string()),
            "attributes_json": pa.array([json.dumps(r[2]) for r in rows], pa.string()),
            "permissions_json": pa.array(["[]"] * len(rows), pa.string()),
        }))
        nodes, with_comp = canonicalize(mentions, num_partitions=2)
        comp = {r["mid"]: r["comp"] for r in with_comp.take_all()}
        # url-exact merges 1+2; alias-search ("CommonCrawl Main" is mention 2's
        # primary name, emitted under the alias namespace by mention 3) — the
        # reference matches alias values against names only via the aliases
        # array namespace, so 3 joins iff a shared alias key exists
        assert comp[1] == comp[2]
        assert comp[4] not in (comp[1], comp[3])
        names = {r["name"] for r in nodes.take_all() if r["type"] == "Dataset"}
        assert "CC-Main" in names and "OtherSet" in names
    finally:
        ENTITY_TYPES.pop("Dataset", None)


def test_pyarrow_coalesce_chunk_bug_workaround():
    """pyarrow 16.1.0 regression guard: variadic coalesce over chunked inputs
    with differing chunk layouts resolves nulls to 0 instead of the fallback
    value; safe_coalesce must not."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from knowledgegraph_ray.functions.arrow_utils import safe_coalesce

    rng = np.random.default_rng(0)
    n = 18783
    comp_np = rng.integers(0, 1000, n)
    null_pos = [9000, 15000]
    comp_list = comp_np.tolist()
    for p in null_pos:
        comp_list[p] = None
    comp = pa.chunked_array([pa.array(comp_list, pa.int64())])
    mid_np = rng.integers(10_000, 20_000, n)
    chunks, off = [], 0
    while off < n:
        s = min(int(rng.integers(100, 1500)), n - off)
        chunks.append(pa.array(mid_np[off : off + s], pa.int64()))
        off += s
    mid = pa.chunked_array(chunks)
    out = safe_coalesce(comp, mid).to_pylist()
    for p in null_pos:
        assert out[p] == mid_np[p], f"null at {p} must take fallback, got {out[p]}"
    # everything else unchanged
    assert out[0] == comp_list[0] and out[-1] == comp_list[-1]


def test_json_int_field_edge_cases():
    import pyarrow as pa

    from knowledgegraph_ray.functions.json_utils import json_int_field

    col = pa.chunked_array([pa.array([
        '{"k": 7}',          # plain int
        '{"k": -3, "x": 1}', # extra keys
        '{"x": 1}',          # missing key -> null
        'not json',          # malformed -> null
        None,                # null row -> null
        '{"k": true}',       # bool is not an int -> null
        '{"k": 2.5}',        # float is not an int -> null
        '{"k": 7}',          # duplicate distinct string reuses the parse
    ])])
    out = json_int_field(col, "k").to_pylist()
    assert out == [7, -3, None, None, None, None, None, 7]
    assert json_int_field(pa.array([], pa.string()), "k").to_pylist() == []

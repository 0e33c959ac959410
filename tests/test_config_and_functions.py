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

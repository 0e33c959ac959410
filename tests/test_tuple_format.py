"""M7–M9 — tuple-grammar parser parity (entity_extractor.py:135-270)."""

from knowledgegraph_ray.functions.tuple_format import (
    COMPLETE_MARK,
    parse_entity_record,
    parse_relationship_record,
    parse_tuple_output,
    serialize_entity,
    serialize_relationship,
)

WELL_FORMED = (
    '("entity"<|>"Sarah Jones"<|>"Person"<|>"name": "Sarah Jones"'
    '<|>"email": "sarah.jones@acme.com"<|>"role": "Software Engineer")##\n'
    '("relationship"<|>"Sarah Jones"<|>"Acme Inc"<|>"WORKS_AT"'
    '<|>"Sarah is an employee of Acme Inc"<|>9)##\n' + COMPLETE_MARK
)


def test_well_formed_pair():
    ents, rels = parse_tuple_output(WELL_FORMED, item_id="doc-1")
    assert len(ents) == 1 and len(rels) == 1
    e = ents[0]
    assert e["entity_name"] == "Sarah Jones"
    assert e["entity_type"] == "Person"
    assert e["attributes"]["email"] == "sarah.jones@acme.com"
    assert e["attributes"]["name"] == "Sarah Jones"
    assert e["attributes"]["sources"] == ["doc-1"]
    r = rels[0]
    assert (r["source_entity"], r["target_entity"]) == ("Sarah Jones", "Acme Inc")
    assert r["relationship_type"] == "WORKS_AT"
    assert r["strength"] == 9.0
    assert r["sources"] == ["doc-1"]


def test_list_attribute_value():
    rec = '("entity"<|>"X"<|>"Team"<|>"aliases": "[a, b]")'
    e = parse_entity_record(rec, "i")
    assert e["attributes"]["aliases"] == ["a", "b"]


def test_empty_list_attribute_value():
    rec = '("entity"<|>"X"<|>"Team"<|>"aliases": "[]")'
    e = parse_entity_record(rec, "i")
    assert e["attributes"]["aliases"] == []


def test_missing_strength_defaults_to_5():
    # entity_extractor.py:256-257
    rec = '("relationship"<|>"A"<|>"B"<|>"REL"<|>"desc"<|>"strong")'
    r = parse_relationship_record(rec, "i")
    assert r["strength"] == 5.0


def test_short_relationship_dropped():
    assert parse_relationship_record('("relationship"<|>"A"<|>"B"<|>"REL")', "i") is None


def test_short_entity_dropped():
    assert parse_entity_record('("entity"<|>"A")', "i") is None


def test_three_part_entity_has_no_name_attr():
    """The reference injects attributes["name"] inside the attribute loop, so a
    record with zero attribute parts ends with only sources injected
    (entity_extractor.py:198-226 indentation quirk)."""
    e = parse_entity_record('("entity"<|>"A"<|>"Person")', "i")
    assert e is not None
    assert "name" not in e["attributes"]
    assert e["attributes"]["sources"] == ["i"]


def test_stray_prose_ignored_when_tuples_present():
    raw = "Here are the results:\n" + WELL_FORMED + "\nThat is all."
    ents, rels = parse_tuple_output(raw, "i")
    assert len(ents) == 1 and len(rels) == 1


def test_complete_marker_skipped():
    ents, rels = parse_tuple_output(COMPLETE_MARK, "i")
    assert ents == [] and rels == []


def test_serializer_round_trips():
    raw = (
        serialize_entity("Acme Inc", "Organization", {"domain": "acme.com", "location": ["Berlin", "Austin"]})
        + "\n"
        + serialize_relationship("A", "B", "REL", "d", 7)
        + "\n"
        + COMPLETE_MARK
    )
    ents, rels = parse_tuple_output(raw, "doc")
    assert ents[0]["attributes"]["domain"] == "acme.com"
    assert ents[0]["attributes"]["location"] == ["Berlin", "Austin"]
    assert rels[0]["strength"] == 7.0

"""T1/M6 — the extraction stage called directly on Arrow batches (no Ray)."""

import json

import pyarrow as pa

from knowledgegraph_ray.stages.extract import (
    EXTRACTION_SCHEMA,
    TripleExtractor,
    explode_mentions,
    explode_triples,
)


def _batch(rows):
    cols = {
        "url": [r.get("url", f"u{i}") for i, r in enumerate(rows)],
        "ord": [r.get("ord", i) for i, r in enumerate(rows)],
        "text": [r["text"] for r in rows],
        "lang": [r.get("lang", "en") for r in rows],
        "permissions": [r.get("permissions", []) for r in rows],
    }
    return pa.Table.from_pydict(cols)


def test_empty_content_short_circuit():
    # entity_extractor.py:57-67
    out = TripleExtractor()(_batch([{"text": "   "}]))
    assert out.column("error")[0].as_py() == "Empty content"
    assert out.column("entity_count")[0].as_py() == 0


def test_works_at_sentence():
    text = "Sarah Jones <sarah.jones@acme-corp.com> works at Acme Corp."
    out = TripleExtractor()(_batch([{"text": text, "url": "d1"}]))
    assert out.schema.equals(EXTRACTION_SCHEMA)
    ents = out.column("entities")[0].as_py()
    rels = out.column("relationships")[0].as_py()
    names = {(e["entity_type"], e["entity_name"]) for e in ents}
    assert names == {("Person", "Sarah Jones"), ("Organization", "Acme Corp")}
    person_attrs = json.loads(
        next(e for e in ents if e["entity_type"] == "Person")["attributes_json"]
    )
    assert person_attrs["email"] == "sarah.jones@acme-corp.com"
    # sources travel out-of-band: "" encodes exactly [url] (extract.ENTITY_T)
    assert "sources" not in person_attrs
    person = next(e for e in ents if e["entity_type"] == "Person")
    assert person["sources_json"] == ""
    assert len(rels) == 1
    r = rels[0]
    assert (r["source_entity"], r["relationship_type"], r["target_entity"]) == (
        "Sarah Jones", "WORKS_AT", "Acme Corp",
    )
    assert r["strength"] == 8.0


def test_mention_order_is_first_text_position():
    text = (
        "Repository acme/pay-svc is maintained by Acme Corp.\n"
        "Sarah Jones <s@acme.com> works at Acme Corp."
    )
    out = TripleExtractor()(_batch([{"text": text}]))
    ents = out.column("entities")[0].as_py()
    # Repo appears first in the text, then Acme Corp, then Sarah Jones.
    assert [e["entity_name"] for e in ents] == [
        "acme/pay-svc", "Acme Corp", "Sarah Jones",
    ]


def test_explode_carries_permissions_and_ordinals():
    text = "Sarah Jones <s@a.com> filed Issue AB-123 in acme/pay-svc."
    res = TripleExtractor()(
        _batch([{"text": text, "url": "d9", "ord": 7, "permissions": ["viewer@a.com"]}])
    )
    mentions = explode_mentions(res)
    triples = explode_triples(res)
    assert mentions.num_rows == 3  # Person, Issue, Repository
    cap = TripleExtractor.MENTIONS_PER_DOC_CAP
    assert mentions.column("mid").to_pylist() == [7 * cap, 7 * cap + 1, 7 * cap + 2]
    assert json.loads(mentions.column("permissions_json")[0].as_py()) == ["viewer@a.com"]
    assert triples.num_rows == 2  # FILED + BELONGS_TO
    assert set(triples.column("relationship_type").to_pylist()) == {"FILED", "BELONGS_TO"}
    assert json.loads(triples.column("permissions_json")[0].as_py()) == ["viewer@a.com"]
    # "" encodes exactly [url] (out-of-band source tracking)
    assert triples.column("sources_json")[0].as_py() == ""


def test_duplicate_surface_attrs_merge_first_wins_scalar_union_list():
    text = (
        "Sarah Jones <s@a.com> works at Acme Corp.\n"
        "Sarah Jones <other@b.com> filed Issue AB-100 in acme/pay-svc."
    )
    out = TripleExtractor()(_batch([{"text": text}]))
    ents = out.column("entities")[0].as_py()
    person = next(e for e in ents if e["entity_type"] == "Person")
    attrs = json.loads(person["attributes_json"])
    assert attrs["email"] == "s@a.com"  # first wins


def test_add_data_type_detection():
    """M4 (prompt_factory.py:48-74, reachable EMAIL/DOCUMENT semantics):
    explicit data_type wins when valid; email fields → email; default email."""
    import pyarrow as pa

    from knowledgegraph_ray.stages.extract import add_data_type

    batch = pa.table(
        {
            "url": ["a", "b", "c", "d", "e"],
            "data_type": [None, "DOCUMENT", "bogus", None, "email"],
            "subject": ["hi", None, None, None, None],
        }
    )
    out = add_data_type(batch)
    col = out.column("data_type")
    assert pa.types.is_dictionary(col.type)  # dictionary-encoded
    vals = col.to_pylist()
    assert vals == ["email", "document", "email", "email", "email"]
    # no explicit column at all → default email everywhere
    out2 = add_data_type(pa.table({"url": ["x"], "text": ["t"]}))
    assert out2.column("data_type").to_pylist() == ["email"]


def test_heavy_compute_backend_output_identical():
    from knowledgegraph_ray.stages.extract import (
        HeavyComputeBackend,
        RuleBasedBackend,
    )

    text = "Alice Johnson works at Acme Corp in Berlin. Bob met Alice."
    assert HeavyComputeBackend(200)(text) == RuleBasedBackend()(text)

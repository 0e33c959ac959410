"""The tuple-format extraction grammar: parser and serializer.

The reference's LLM returns records like

    ("entity"<|>"Sarah Jones"<|>"Person"<|>"name": "Sarah Jones"<|>"email": "s@x.com")##
    ("relationship"<|>"Sarah Jones"<|>"Acme Inc"<|>"WORKS_AT"<|>"employee of"<|>9)##
    <|COMPLETE|>

This module replicates the parsing semantics of
/root/reference/src/workspace_kg/components/entity_extractor.py:135-270
byte-for-byte on well-formed and malformed inputs:

* only lines starting ("entity" / ("relationship" are kept; if none, the whole
  output is parsed (entity_extractor.py:143-154)
* records split on "##", blank and <|COMPLETE|> records skipped (:156-161)
* entity records need >=3 <|>-separated parts (:188-190); attributes parsed
  with the `"key": "value"` regex (:201); "[a, b]" values become lists
  (:206-214); attributes["name"] is forced to the entity name only when at
  least one attribute part exists (:198-217 — the assignment lives inside the
  attribute loop); item_id appended to attributes["sources"] (:218-226)
* relationship records need >=6 parts (:245-247); strength is the first
  number found, defaulting to 5.0 (:255-257); sources=[item_id] (:265)

The serializer emits the same grammar so the deterministic rule-based
extractor and any LLM backend share one output contract.
"""

from __future__ import annotations

import re
from typing import Any

FIELD_SEP = "<|>"
RECORD_SEP = "##"
COMPLETE_MARK = "<|COMPLETE|>"

_ATTR_RE = re.compile(r'"([^"]+)":\s*"([^"]*)"')
_STRENGTH_RE = re.compile(r"(\d+(?:\.\d+)?)")


def _strip_quotes(s: str) -> str:
    return s.strip().strip('"')


def parse_entity_record(record: str, item_id: str) -> dict[str, Any] | None:
    """Parse one ("entity"<|>...) record. Returns None when malformed."""
    record = record.strip()
    if record.startswith('("entity"') and record.endswith(")"):
        record = record[1:-1]

    parts = record.split(FIELD_SEP)
    if len(parts) < 3:
        return None

    entity_name = _strip_quotes(parts[1])
    entity_type = _strip_quotes(parts[2])

    attributes: dict[str, Any] = {}
    for raw_part in parts[3:]:
        attr_part = raw_part.strip()
        if ":" in attr_part:
            m = _ATTR_RE.match(attr_part)
            if m:
                attr_name, attr_value = m.group(1), m.group(2)
                if attr_value.startswith("[") and attr_value.endswith("]"):
                    inner = attr_value[1:-1]
                    attr_value = (
                        [_strip_quotes(v) for v in inner.split(",")] if inner else []
                    )
                attributes[attr_name] = attr_value
        # Matches the reference's indentation quirk: "name" is injected once
        # per attribute part, so a 3-part record ends up with no name attr.
        attributes["name"] = entity_name

    sources = attributes.get("sources")
    if sources is None:
        attributes["sources"] = []
    elif not isinstance(sources, list):
        attributes["sources"] = [sources]
    if item_id not in attributes["sources"]:
        attributes["sources"].append(item_id)

    return {
        "entity_name": entity_name,
        "entity_type": entity_type,
        "attributes": attributes,
    }


def parse_relationship_record(record: str, item_id: str) -> dict[str, Any] | None:
    """Parse one ("relationship"<|>...) record. Returns None when malformed."""
    record = record.strip()
    if record.startswith('("relationship"') and record.endswith(")"):
        record = record[1:-1]

    parts = record.split(FIELD_SEP)
    if len(parts) < 6:
        return None

    m = _STRENGTH_RE.search(parts[5].strip())
    strength = float(m.group(1)) if m else 5.0

    return {
        "source_entity": _strip_quotes(parts[1]),
        "target_entity": _strip_quotes(parts[2]),
        "relationship_type": _strip_quotes(parts[3]),
        "description": _strip_quotes(parts[4]),
        "strength": strength,
        "sources": [item_id],
    }


def parse_tuple_output(
    raw: str, item_id: str
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Split raw extractor output into (entities, relationships)."""
    entities: list[dict[str, Any]] = []
    relationships: list[dict[str, Any]] = []

    tuple_section = ""
    for line in raw.split("\n"):
        line = line.strip()
        if line.startswith('("entity"') or line.startswith('("relationship"'):
            tuple_section += line + "\n"
    if not tuple_section:
        tuple_section = raw

    for record in tuple_section.split(RECORD_SEP):
        record = record.strip()
        if not record or record == COMPLETE_MARK:
            continue
        if record.startswith('("entity"'):
            ent = parse_entity_record(record, item_id)
            if ent:
                entities.append(ent)
        elif record.startswith('("relationship"'):
            rel = parse_relationship_record(record, item_id)
            if rel:
                relationships.append(rel)

    return entities, relationships


def _fmt_value(value: Any) -> str:
    if isinstance(value, (list, tuple)):
        return "[" + ", ".join(str(v) for v in value) + "]"
    return str(value)


def serialize_entity(name: str, entity_type: str, attributes: dict[str, Any]) -> str:
    """Emit one entity record in the tuple grammar (parse round-trips)."""
    parts = ['"entity"', f'"{name}"', f'"{entity_type}"']
    for k, v in attributes.items():
        parts.append(f'"{k}": "{_fmt_value(v)}"')
    return "(" + FIELD_SEP.join(parts) + ")" + RECORD_SEP


def serialize_relationship(
    source: str, target: str, rel_type: str, description: str, strength: float
) -> str:
    """Emit one relationship record in the tuple grammar (parse round-trips)."""
    strength_txt = (
        str(int(strength)) if float(strength) == int(strength) else str(strength)
    )
    parts = [
        '"relationship"',
        f'"{source}"',
        f'"{target}"',
        f'"{rel_type}"',
        f'"{description}"',
        strength_txt,
    ]
    return "(" + FIELD_SEP.join(parts) + ")" + RECORD_SEP

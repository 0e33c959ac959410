"""Runtime YAML entity-config loading (entity_config.py:21-168 parity).

The reference's entire extension surface is editing ``entity_config.yaml``
(entity schemas + systematic-merge matching rules).  This loader parses a
file of exactly that shape into the same frozen dataclasses the engine uses,
so an 11th entity type is a YAML edit, not an engine change:

    from knowledgegraph_ray.config.yaml_config import register_entity_config
    register_entity_config("my_entity_config.yaml")

The committed Python table in ``entity_schema.py`` (a transcription of the
reference's YAML) stays the default; ``load_entity_config`` on the
reference's own file reproduces it exactly (asserted in
tests/test_config_and_functions.py).
"""

from __future__ import annotations

from typing import Any

from .entity_schema import (
    DEFAULT_STRATEGY,
    ENTITY_TYPES,
    EntityTypeSpec,
    FieldSpec,
    MatchRule,
)


def _field_from_mapping(db_field: str, m: dict[str, Any]) -> FieldSpec:
    """One mappings entry → FieldSpec.

    is_array: declared type ends with "[]" (entity_config.py:102-115);
    strategy default replace_if_better (entity_config.py:83);
    llm_field: the ``mapping`` key (entity_config.py:63-75)."""
    typ = str(m.get("type", "STRING"))
    return FieldSpec(
        db_field=db_field,
        is_array=typ.rstrip().endswith("[]"),
        strategy=str(m.get("merge_strategy", DEFAULT_STRATEGY)),
        llm_field=str(m.get("mapping", "") or ""),
    )


def _rules_from_yaml(entries: list[dict[str, Any]]) -> tuple[MatchRule, ...]:
    rules = [
        MatchRule(
            rule=str(e.get("rule", "exact")),
            match=str(e.get("match", "")),
            db=str(e.get("db", "") or ""),
            priority=int(e.get("priority", 99)),
            confidence=float(e.get("confidence", 0.5)),
        )
        for e in entries or []
    ]
    return tuple(sorted(rules, key=lambda r: r.priority))


def load_entity_config(path: str) -> dict[str, EntityTypeSpec]:
    """Parse an entity_config.yaml-shaped file → {type name: spec}."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    schemas = doc.get("entity_schemas") or {}
    all_rules = (doc.get("systematic_merge") or {}).get("matching_rules") or {}
    out: dict[str, EntityTypeSpec] = {}
    for name, block in schemas.items():
        block = block or {}
        llm_fields = tuple(str(x) for x in (block.get("llm_fields") or []))
        mappings = block.get("mappings") or {}
        fields = tuple(
            _field_from_mapping(db_field, m or {}) for db_field, m in mappings.items()
        )
        out[name] = EntityTypeSpec(
            name=name,
            llm_fields=llm_fields,
            fields=fields,
            match_rules=_rules_from_yaml(all_rules.get(name)),
        )
    return out


def register_entity_config(path: str, *, replace: bool = False) -> list[str]:
    """Load a YAML config and register its entity types into the live
    registry (ENTITY_TYPES).  Existing types are kept unless ``replace``.
    Returns the list of type names registered."""
    loaded = load_entity_config(path)
    added: list[str] = []
    for name, spec in loaded.items():
        if name in ENTITY_TYPES and not replace:
            continue
        ENTITY_TYPES[name] = spec
        added.append(name)
    return added

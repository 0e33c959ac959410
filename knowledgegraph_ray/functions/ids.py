"""Deterministic id generation (sha256), mirroring the reference.

* relation_id = sha256("src::type::dst")
  (/root/reference/src/workspace_kg/components/systematic_merge_provider.py:1193-1196)
* entity_content_id = sha256 over type + identity keys
  (/root/reference/src/workspace_kg/utils/merge_pipeline.py:49-72)
"""

from __future__ import annotations

import hashlib
import json
from typing import Any


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def relation_id(source_id: str, target_id: str, rel_type: str) -> str:
    return _sha(f"{source_id}::{rel_type}::{target_id}")


def entity_content_id(entity_type: str, attributes: dict[str, Any]) -> str:
    """Content-addressed entity id over the type's identity keys."""
    key = entity_type
    if entity_type == "Person":
        emails = attributes.get("emails")
        if emails:
            key += f"::email::{emails[0].lower()}"
        elif "name" in attributes and "worksAt" in attributes:
            key += f"::name_worksAt::{attributes['name'].lower()}::{attributes['worksAt'].lower()}"
        elif "name" in attributes:
            key += f"::name::{attributes['name'].lower()}"
        else:
            key += f"::fallback::{json.dumps(attributes, sort_keys=True, default=str)}"
    elif entity_type == "Organization":
        if attributes.get("domain"):
            key += f"::domain::{attributes['domain'].lower()}"
        elif "name" in attributes:
            key += f"::name::{attributes['name'].lower()}"
        else:
            key += f"::fallback::{json.dumps(attributes, sort_keys=True, default=str)}"
    else:
        if "name" in attributes:
            key += f"::name::{attributes['name'].lower()}"
        else:
            key += f"::fallback::{json.dumps(attributes, sort_keys=True, default=str)}"
    return _sha(key)

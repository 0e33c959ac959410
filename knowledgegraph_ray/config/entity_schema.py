"""Entity-type configuration: fields, LLM→DB mappings, merge strategies, match rules.

Re-expresses the semantics of the reference's config-driven schema system
(/root/reference/entity_config.yaml + schema.yaml, loaded by
entity_config.py:21-168) as frozen Python structures.  The behavioral contract
mirrors:

* LLM field → DB field mapping           (entity_config.py:63-75)
* per-field merge strategy               (entity_config.py:77-83, default
                                          "replace_if_better")
* array-field detection (type ends "[]") (entity_config.py:102-115)
* description → always a list            (entity_config.py:141-150)
* systematic-merge matching rules        (entity_config.yaml:493-615)
* systematic-merge string/array fields   (entity_config.py:132-139)

10 entity types: Person, Team, Organization, Project, Repository, Branch,
CodeChangeRequest, Issue, Event, Topic (schema.yaml:1-139).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Merge strategies (entity_config.py:13-19).
PRESERVE = "preserve_existing"
APPEND = "append_unique"
BETTER = "replace_if_better"
ALWAYS = "replace_always"
AGENT = "agent_only"

DEFAULT_STRATEGY = BETTER  # entity_config.py:83


@dataclass(frozen=True)
class FieldSpec:
    """One DB column of an entity type."""

    db_field: str
    is_array: bool
    strategy: str
    llm_field: str  # LLM attribute that maps onto this column ("" = none)


@dataclass(frozen=True)
class MatchRule:
    """One systematic-merge matching rule (entity_config.yaml:493-615).

    rule      -- "exact" (scalar equality) or "search" (value-in-array /
                 array-overlap), semantics per systematic_merge_provider.py:72-137
    match     -- LLM attribute holding the probe value
    db        -- attribute holding the array to search (search rules)
    priority  -- lower = applied first (only matters for incremental DB probes)
    """

    rule: str
    match: str
    db: str = ""
    priority: int = 99
    confidence: float = 0.5


def _f(db_field: str, is_array: bool, strategy: str, llm_field: str) -> FieldSpec:
    return FieldSpec(db_field, is_array, strategy, llm_field)


# Columns shared by every entity type (schema.yaml: each type block).
def _common_tail() -> list[FieldSpec]:
    return [
        _f("rawDescriptions", True, APPEND, "description"),
        _f("permissions", True, APPEND, "permissions"),
        _f("sources", True, APPEND, "sources"),
        _f("lastUpdated", False, DEFAULT_STRATEGY, "lastUpdated"),
        _f("embedding", True, ALWAYS, "embedding"),
    ]


@dataclass(frozen=True)
class EntityTypeSpec:
    name: str
    llm_fields: tuple[str, ...]
    fields: tuple[FieldSpec, ...]
    match_rules: tuple[MatchRule, ...] = field(default_factory=tuple)

    def field_map(self) -> dict[str, FieldSpec]:
        return {f.db_field: f for f in self.fields}

    def llm_map(self) -> dict[str, str]:
        """LLM attribute name → DB column name (entity_config.py:63-75)."""
        return {f.llm_field: f.db_field for f in self.fields if f.llm_field}


ENTITY_TYPES: dict[str, EntityTypeSpec] = {}


def _register(
    name: str,
    llm_fields: list[str],
    own_fields: list[FieldSpec],
    rules: list[MatchRule],
) -> None:
    ENTITY_TYPES[name] = EntityTypeSpec(
        name=name,
        llm_fields=tuple(llm_fields),
        fields=tuple(own_fields + _common_tail()),
        match_rules=tuple(sorted(rules, key=lambda r: r.priority)),
    )


_register(
    "Person",
    ["name", "email", "role", "aliases", "sourceSystemId", "description", "worksAt"],
    [
        _f("name", False, PRESERVE, "name"),
        _f("emails", True, PRESERVE, "email"),
        _f("role", True, APPEND, "role"),
        _f("aliases", True, APPEND, "aliases"),
        _f("sourceSystemId", False, PRESERVE, "sourceSystemId"),
        _f("worksAt", False, PRESERVE, "worksAt"),
    ],
    [
        MatchRule("search", "email", "emails", 1, 0.90),
        MatchRule("exact", "name", priority=2, confidence=0.95),
        MatchRule("search", "alias", "aliases", 3, 0.80),
        MatchRule("exact", "sourceSystemId", priority=4, confidence=0.85),
    ],
)

_register(
    "Team",
    ["name", "description"],
    [
        _f("name", False, PRESERVE, "name"),
        _f("aliases", True, APPEND, "aliases"),
    ],
    [
        MatchRule("exact", "name", priority=1, confidence=0.90),
        MatchRule("search", "alias", "aliases", 2, 0.75),
    ],
)

_register(
    "Organization",
    ["name", "domain", "description", "industry", "location"],
    [
        _f("name", False, PRESERVE, "name"),
        _f("domain", False, PRESERVE, "domain"),
        _f("industry", False, BETTER, "industry"),
        _f("location", True, APPEND, "location"),
        _f("aliases", True, APPEND, "aliases"),
    ],
    [
        MatchRule("exact", "domain", priority=1, confidence=0.95),
        MatchRule("exact", "name", priority=2, confidence=0.80),
        MatchRule("search", "alias", "aliases", 3, 0.70),
    ],
)

_register(
    "Project",
    ["name", "description", "status", "startDate", "endDate", "client", "tags"],
    [
        _f("name", False, PRESERVE, "name"),
        _f("status", False, ALWAYS, "status"),
        _f("startDate", False, PRESERVE, "startDate"),
        _f("endDate", False, PRESERVE, "endDate"),
        _f("client", False, PRESERVE, "client"),
        _f("tags", True, APPEND, "tags"),
        _f("aliases", True, APPEND, "aliases"),
    ],
    [
        MatchRule("exact", "name", priority=1, confidence=0.85),
        MatchRule("search", "alias", "aliases", 2, 0.70),
    ],
)

_register(
    "Repository",
    ["name", "url", "description"],
    [
        _f("name", False, PRESERVE, "name"),
        _f("url", False, PRESERVE, "url"),
        _f("language", False, BETTER, "language"),
    ],
    [
        MatchRule("exact", "url", priority=1, confidence=0.95),
        MatchRule("exact", "name", priority=2, confidence=0.70),
    ],
)

_register(
    "Branch",
    ["name", "repo", "createdBy", "createdAt"],
    [
        _f("name", False, PRESERVE, "name"),
        _f("repo", False, PRESERVE, "repo"),
        _f("createdBy", False, PRESERVE, "createdBy"),
        _f("createdAt", False, PRESERVE, "createdAt"),
    ],
    [
        MatchRule("exact", "name", "name", 1, 0.80),
        MatchRule("exact", "repo", priority=2, confidence=0.75),
    ],
)

_register(
    "CodeChangeRequest",
    ["name", "description", "status", "author", "createdAt", "mergedAt", "repo", "branch"],
    [
        _f("name", False, PRESERVE, "name"),
        _f("status", False, ALWAYS, "status"),
        _f("author", False, PRESERVE, "author"),
        _f("repo", False, PRESERVE, "repo"),
        _f("branch", False, PRESERVE, "branch"),
        _f("createdAt", False, PRESERVE, "createdAt"),
        _f("mergedAt", False, PRESERVE, "mergedAt"),
        _f("reviewers", True, APPEND, "reviewers"),
    ],
    [
        MatchRule("exact", "name", priority=1, confidence=0.95),
        MatchRule("exact", "title", priority=2, confidence=0.80),
    ],
)

_register(
    "Issue",
    ["name", "title", "description", "status", "reporter", "labels", "createdAt", "closedAt"],
    [
        _f("name", False, PRESERVE, "name"),
        _f("status", False, ALWAYS, "status"),
        _f("reporter", False, PRESERVE, "reporter"),
        _f("createdAt", False, PRESERVE, "createdAt"),
        _f("closedAt", False, PRESERVE, "closedAt"),
        _f("labels", True, APPEND, "labels"),
        _f("assignees", True, APPEND, "assignees"),
    ],
    [
        MatchRule("exact", "name", priority=1, confidence=0.95),
        MatchRule("exact", "id", priority=2, confidence=0.90),
    ],
)

_register(
    "Event",
    ["id", "title", "description", "type", "startTime", "linkedProject"],
    [
        # Event maps LLM "title" onto the name PK (entity_config.yaml Event block).
        _f("name", False, PRESERVE, "title"),
        _f("type", False, PRESERVE, "type"),
        _f("startTime", False, PRESERVE, "startTime"),
        _f("linkedProject", False, PRESERVE, "linkedProject"),
    ],
    [MatchRule("exact", "name", priority=1, confidence=0.85)],
)

_register(
    "Topic",
    ["id", "name", "keywords", "relatedThreads"],
    [
        _f("name", False, PRESERVE, "name"),
        _f("keywords", True, APPEND, "keywords"),
        _f("relatedThreads", True, APPEND, "relatedThreads"),
        _f("aliases", True, APPEND, "aliases"),
    ],
    [
        MatchRule("exact", "name", priority=1, confidence=0.80),
        MatchRule("search", "alias", "aliases", 3, 0.65),
    ],
)


# systematic_merge.merge_fields (entity_config.yaml:614-631): scalar fields that
# participate in first-wins-with-aliases-overflow merging.
STRING_MERGE_FIELDS: tuple[str, ...] = (
    "name",
    "email",
    "worksAt",
    "industry",
    "domain",
    "url",
)


def get_spec(entity_type: str) -> EntityTypeSpec | None:
    return ENTITY_TYPES.get(entity_type)


def llm_to_db_field(entity_type: str, llm_field: str) -> str:
    """Target DB column for an LLM attribute; falls back to the same name
    (entity_config.py:63-75)."""
    spec = ENTITY_TYPES.get(entity_type)
    if spec:
        mapped = spec.llm_map().get(llm_field)
        if mapped:
            return mapped
    return llm_field


def merge_strategy_for(entity_type: str, db_field: str) -> str:
    spec = ENTITY_TYPES.get(entity_type)
    if spec:
        fs = spec.field_map().get(db_field)
        if fs:
            return fs.strategy
    return DEFAULT_STRATEGY


def array_fields_for(entity_type: str) -> list[str]:
    spec = ENTITY_TYPES.get(entity_type)
    if not spec:
        return []
    return [f.db_field for f in spec.fields if f.is_array and f.db_field != "embedding"]


def match_rules_for(entity_type: str) -> tuple[MatchRule, ...]:
    spec = ENTITY_TYPES.get(entity_type)
    return spec.match_rules if spec else ()


# ---------------------------------------------------------------------------
# Unified Nodes-table layout (schema.yaml folded into one wide table, as the
# reference's DDL generator does at kuzu_init.py:92-118).
# ---------------------------------------------------------------------------

def _node_columns() -> tuple[list[str], list[str]]:
    scalars: list[str] = ["name", "type"]
    arrays: list[str] = []
    for spec in ENTITY_TYPES.values():
        for f in spec.fields:
            if f.db_field in ("name", "embedding"):
                continue
            bucket = arrays if f.is_array else scalars
            if f.db_field not in bucket:
                bucket.append(f.db_field)
    return scalars, arrays


SCALAR_NODE_COLUMNS, ARRAY_NODE_COLUMNS = _node_columns()
# Stable overall column order: scalars then arrays (embedding appended by the
# embedder stage, not part of the core merge output).
NODE_COLUMNS: list[str] = SCALAR_NODE_COLUMNS + ARRAY_NODE_COLUMNS

# Edges-table layout (schema.yaml:143-155 Relation block).
EDGE_COLUMNS: list[str] = [
    "relation_id",
    "src",
    "dst",
    "type",
    "relationTag",
    "description",
    "strength",
    "permissions",
    "sources",
]

from .tuple_format import (
    parse_tuple_output,
    parse_entity_record,
    parse_relationship_record,
    serialize_entity,
    serialize_relationship,
    COMPLETE_MARK,
)
from .text_extract import extract_text
from .ids import relation_id, entity_content_id
from .normalize import norm_string

__all__ = [
    "parse_tuple_output",
    "parse_entity_record",
    "parse_relationship_record",
    "serialize_entity",
    "serialize_relationship",
    "COMPLETE_MARK",
    "extract_text",
    "relation_id",
    "entity_content_id",
    "norm_string",
]

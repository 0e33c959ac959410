"""Vectorized JSON field extraction for string columns.

Web-scale event/metadata tables carry semi-structured JSON string columns
whose DISTINCT value count is tiny relative to row count (the sf events
table: 100 distinct ``props`` strings over 100k rows; real clickstream
props/attribute columns behave the same way).  Parsing per row is O(rows)
Python; this kernel dictionary-encodes the column and parses each distinct
string ONCE, then projects the decoded values back by index take — the same
parse-once discipline as the canonicalize merge reducers
(stages/canonicalize.py::_dict_col).

Reference anchor: the reference stores LLM-extracted attributes as JSON
strings and re-parses them per row on every access
(/root/reference/utils/systematic_merge_provider.py); here the parse cost is
O(distinct strings) per batch regardless of row count.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def json_int_field(col, key: str) -> pa.Array:
    """Extract an integer field from a JSON-string column.

    Null-safe: null rows, unparsable strings, missing keys and non-integer
    values all yield null.  json.loads runs once per DISTINCT string in the
    batch, not once per row."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(col)
    vals = []
    for s in d.dictionary.to_pylist():
        try:
            v = json.loads(s).get(key)
        except (TypeError, ValueError, AttributeError):
            v = None
        vals.append(v if isinstance(v, int) and not isinstance(v, bool) else None)
    lut = pa.array(vals, pa.int64())
    return lut.take(d.indices)

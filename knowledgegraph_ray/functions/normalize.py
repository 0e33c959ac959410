"""String normalization used for all entity matching.

Mirrors the reference's single normalization rule — lowercase + strip
(/root/reference/src/workspace_kg/components/systematic_merge_provider.py:60-62)
— plus a vectorized Arrow variant for hot map_batches stages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def norm_string(s: str | None) -> str:
    return s.lower().strip() if s else ""


def norm_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized lowercase+trim over an Arrow string array."""
    return pc.utf8_trim_whitespace(pc.utf8_lower(arr))

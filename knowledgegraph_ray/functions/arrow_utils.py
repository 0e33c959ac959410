"""Workarounds for Arrow compute sharp edges.

``safe_coalesce`` exists because pyarrow 16.1.0's variadic ``coalesce``
kernel mis-resolves CHUNKED inputs whose chunk layouts differ: null slots in
the first input can resolve to the type's zero value instead of the fallback
input's value (reproduced in tests/test_config_and_functions.py::
test_pyarrow_coalesce_chunk_bug_workaround — a single-chunk column with
nulls coalesced against a ~20-chunk column returns 0 at the null positions).
In this engine that silently relabeled singleton mentions into component 0
(observed as a nondeterministic node-count drift between runs, since chunk
layouts depend on block boundaries).  Combining chunks first sidesteps the
kernel's chunked-alignment path entirely.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def safe_coalesce(*cols):
    """pc.coalesce over table columns with every chunked input collapsed to
    one chunk first (single-chunk inputs take the correct kernel path)."""
    fixed = [
        c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols
    ]
    return pc.coalesce(*fixed)

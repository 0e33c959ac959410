"""Streaming-style windowed operators over event tables.

The reference has no windowing (SURVEY.md §2.9); these are the beyond-
reference stream semantics a training-data/event pipeline needs, expressed
Ray-Data-first: a key-colocating sort, then fully vectorized per-partition
window math (no per-row Python).

* ``sessionize`` — gap-based session windows per user: a new session starts
  when the gap to the previous event exceeds ``gap``; emits per-user session
  and event counts.  Ties are broken by event_id so output is deterministic
  and matches the SQL-window oracle exactly.
* ``tumbling_counts`` — fixed-width buckets (see q_events_hourly in
  pipelines/queries.py, built on floor_temporal).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_sessions", pa.int64()),
        ("n_events", pa.int64()),
    ]
)


def sessionize(
    events: rd.Dataset,
    *,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> rd.Dataset:
    """events → (user_id, n_sessions, n_events).

    Sort colocates each user's events (ties cannot straddle a range-partition
    boundary) ordered by (ts, event_id); session starts are a vectorized
    diff over int64 timestamps."""
    gap_us = int(gap_minutes * 60 * 1_000_000)
    # Sort on the user key ONLY: range partitioning colocates equal sort
    # keys, but a composite (user, ts, id) sort may split one user across
    # partitions at a ts boundary. Event order within the block is restored
    # by an in-block C sort.
    s = events.select_columns([user_col, ts_col, order_col]).sort([user_col])

    def per_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return SESSION_SCHEMA.empty_table()
        import pyarrow.compute as pc

        order = pc.sort_indices(
            block,
            sort_keys=[(user_col, "ascending"), (ts_col, "ascending"),
                       (order_col, "ascending")],
        )
        block = block.take(order)
        users = block.column(user_col).to_numpy(zero_copy_only=False)
        ts = block.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_user = np.r_[True, users[1:] != users[:-1]]
        gap_break = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        new_sess = (new_user | gap_break).astype(np.int64)

        starts = np.flatnonzero(new_user)
        uid = users[starts]
        ends = np.r_[starts[1:], n]
        n_events = ends - starts
        n_sessions = np.add.reduceat(new_sess, starts)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(uid, pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
            },
            schema=SESSION_SCHEMA,
        )

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)

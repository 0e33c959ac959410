"""Temporal join operators: as-of join and bounded range join.

The reference has no temporal joins (SURVEY.md §2.9); these are
beyond-reference operators a large-scale event/training-data pipeline needs,
expressed Ray-Data-first:

* ``asof_join`` — for each left row, the single right row with the same key
  and the greatest right timestamp ≤ the left timestamp (inclusive), ties on
  the right timestamp broken by the greatest right order column.  Left join
  semantics: unmatched left rows keep nulls.
* ``range_join`` — all (a, b) pairs sharing a key with
  ``a.ts < b.ts <= a.ts + width`` (strictly-after, bounded lookahead).

Shape (both): ONE range sort on the key column colocates each key's rows in
a block (full-key ties never straddle a range-partition boundary — the same
guarantee sessionize and grouped_apply rely on), then fully vectorized
per-block window math: in-block C sort, run detection, searchsorted /
maximum.accumulate.  No per-row Python, no all-pairs blowup beyond the
output itself.

Scale note: the partitioning assumption is per-KEY locality, so one
pathologically hot key bounds a single block.  At 100 TB with skewed keys,
pre-split hot keys by time bucket (floor(ts / width)) and replicate the
boundary bucket — the bounded lookahead makes bucket-local output exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _ragged_arange(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ragged ranges: for each i emit arange(lo[i], hi[i]).
    Returns (row_idx, range_values) — row_idx[j] is the source i of value j."""
    counts = (hi - lo).clip(min=0)
    total = int(counts.sum())
    if total == 0:
        e = np.array([], dtype=np.int64)
        return e, e
    row_idx = np.repeat(np.arange(len(lo), dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    vals = np.arange(total, dtype=np.int64) - np.repeat(starts, counts) + np.repeat(
        lo, counts
    )
    return row_idx, vals


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_order: str,
    num_partitions: int = 256,
    direction: str = "backward",
) -> rd.Dataset:
    """Left as-of join: latest right row (same key, right_ts <= left_ts).

    ``right_cols`` are the right payload columns to attach (null when no
    right row qualifies); ``right_order`` breaks right-side timestamp ties
    deterministically (greatest value wins, matching a last-write register).

    ``direction="forward"`` flips the inequality: EARLIEST right row with
    right_ts >= left_ts (the "next event after" join) — implemented by
    negating the unified timestamp column, which maps forward semantics
    exactly onto the backward scan (ties still resolve to max
    ``right_order``).

    Columns are pruned to key/ts/payload before the union so the shuffle
    moves only what the join needs."""
    lt = left
    rt = right.select_columns(
        list(dict.fromkeys([right_key, right_ts, right_order, *right_cols]))
    )

    left_schema = lt.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_payload = list(dict.fromkeys(right_cols))
    right_sch = rt.schema()
    right_types = {n: t for n, t in zip(right_sch.names, right_sch.types)}
    out_fields = [(n, t) for n, t in zip(left_schema.names, left_schema.types)]
    out_fields += [(c, right_types[c]) for c in right_payload]
    out_schema = pa.schema(out_fields)

    # Tag sides and align to one unified schema so union() is a pure
    # metadata concat; right rows carry nulls in left columns and vice versa.
    fwd = direction == "forward"

    def tag_left(b: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array | pa.ChunkedArray] = {"_k": b.column(left_key)}
        ts_arr = pc.cast(b.column(left_ts), pa.int64())
        cols["_ts"] = pc.negate_checked(ts_arr) if fwd else ts_arr
        cols["_side"] = pa.array(np.ones(b.num_rows, np.int8))
        cols["_ord"] = pa.nulls(b.num_rows, pa.int64())
        for n in left_names:
            cols["l_" + n] = b.column(n)
        for c in right_payload:
            cols["r_" + c] = pa.nulls(b.num_rows, right_types[c])
        return pa.Table.from_pydict(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {"_k": b.column(right_key)}
        ts_arr = pc.cast(b.column(right_ts), pa.int64())
        cols["_ts"] = pc.negate_checked(ts_arr) if fwd else ts_arr
        cols["_side"] = pa.array(np.zeros(b.num_rows, np.int8))
        cols["_ord"] = pc.cast(b.column(right_order), pa.int64())
        for n in left_names:
            cols["l_" + n] = pa.nulls(b.num_rows, left_types[n])
        for c in right_payload:
            cols["r_" + c] = b.column(c)
        return pa.Table.from_pydict(cols)

    tagged = lt.map_batches(tag_left, batch_format="pyarrow").union(
        rt.map_batches(tag_right, batch_format="pyarrow")
    )

    def per_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        k = block.column("_k").to_numpy(zero_copy_only=False)
        ts = block.column("_ts").to_numpy(zero_copy_only=False)
        side = block.column("_side").to_numpy(zero_copy_only=False)
        ordv = block.column("_ord").to_numpy(zero_copy_only=False)
        ordv = np.where(side == 1, np.int64(0), ordv).astype(np.int64)
        # right rows (side 0) sort BEFORE left rows at equal ts → inclusive
        # match; among equal-(k, ts) right rows the LAST has max right_order
        order = np.lexsort((ordv, side, ts, k))
        ks, sides = k[order], side[order]
        # most recent right row at or before each position (global accumulate;
        # key-run membership is verified afterwards instead of re-segmenting)
        pos = np.arange(n, dtype=np.int64)
        ridx = np.where(sides == 0, pos, np.int64(-1))
        fill = np.maximum.accumulate(ridx)
        left_mask = sides == 1
        lfill = fill[left_mask]
        valid = lfill >= 0
        # the filled right row must belong to the same key
        valid &= np.where(valid, ks[lfill.clip(min=0)] == ks[left_mask], False)
        sorted_tbl = block.take(pa.array(order, pa.int64()))
        lrows = sorted_tbl.filter(pa.array(left_mask))
        cols = {}
        for nname in left_names:
            cols[nname] = lrows.column("l_" + nname)
        # gather right payloads from the matched right rows; null when invalid
        src = np.where(valid, lfill, np.int64(0))
        take_idx = pc.if_else(
            pa.array(valid), pa.array(src, pa.int64()), pa.nulls(len(src), pa.int64())
        )
        for c in right_payload:
            cols[c] = sorted_tbl.column("r_" + c).take(take_idx)
        return pa.Table.from_pydict(cols).cast(out_schema)

    # Exchange: key-hash map/reduce (grouped_apply exchange="hash") instead
    # of Ray's range sort — per_block only needs every row of a key in ONE
    # block (its own lexsort restores (k, ts, side, ord) order and the
    # key-membership check guards cross-key fills), so the sort's sampling
    # pass and sorted-run merge-concats buy nothing.  Measured sf0.1:
    # 3.4–6.6 s → ~1.5 s on identical output.
    from .canonicalize import grouped_apply

    # num_partitions is the CAP — the actual partition count follows data
    # size (~2^18 rows per reduce); 256 keeps 100-TB inputs from serializing
    # into 16 reduce tasks while local runs still pick 4-8
    return grouped_apply(
        tagged,
        ["_k"],
        None,
        out_schema,
        num_partitions=num_partitions,
        hash_sort=True,
        block_fn=lambda b, _starts: per_block(b),
        exchange="hash",
    )


def range_join(
    left: rd.Dataset,
    *,
    key: str,
    ts: str,
    id_col: str,
    width_us: int,
) -> rd.Dataset:
    """Self range join: pairs (id_a, id_b) sharing ``key`` with
    ``ts_a < ts_b <= ts_a + width_us`` (strictly after, bounded lookahead).

    Output: (key, id_a, id_b, gap_us).  Equal-timestamp rows never pair
    (strict inequality) so the result is deterministic without an id order.
    """
    out_schema = pa.schema(
        [
            (key, pa.int64()),
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )
    s = left.select_columns([key, ts, id_col]).sort([key])

    def per_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        k = pc.cast(block.column(key), pa.int64()).to_numpy(zero_copy_only=False)
        t = pc.cast(block.column(ts), pa.int64()).to_numpy(zero_copy_only=False)
        ids = pc.cast(block.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, t, k))
        ks, tss, idss = k[order], t[order], ids[order]
        run_start = np.r_[True, ks[1:] != ks[:-1]]
        run_id = np.cumsum(run_start) - 1
        starts_idx = np.flatnonzero(run_start)
        run_ends = np.r_[starts_idx[1:], n]
        # tss is sorted only WITHIN key runs — monotonize it across runs with
        # per-run shifts wide enough that a (+width_us) query can never reach
        # the next run, then one global searchsorted answers every row.
        rel = tss - tss.min()
        run_min = rel[starts_idx]
        run_max = rel[run_ends - 1]
        n_runs = len(starts_idx)
        shift = np.zeros(n_runs, dtype=np.int64)
        if n_runs > 1:
            delta = np.maximum(run_max[:-1] - run_min[1:] + width_us + 1, 0)
            shift[1:] = np.cumsum(delta)
        adj = rel + shift[run_id]
        # per row: matches are the sorted positions in (lo, hi]
        lo = np.searchsorted(adj, adj, side="right")
        hi = np.searchsorted(adj, adj + width_us, side="right")
        row_idx, match_pos = _ragged_arange(lo, hi)
        if len(row_idx) == 0:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {
                key: pa.array(ks[row_idx], pa.int64()),
                "id_a": pa.array(idss[row_idx], pa.int64()),
                "id_b": pa.array(idss[match_pos], pa.int64()),
                "gap_us": pa.array(tss[match_pos] - tss[row_idx], pa.int64()),
            },
            schema=out_schema,
        )

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def _segmented_cummax(x: np.ndarray, run_id: np.ndarray) -> np.ndarray:
    """Inclusive per-run prefix max, fully vectorized (guarded doubling:
    O(n log maxrun) int64 ops, exact — no float offsets, no per-run Python).
    After step d, x[i] holds the max over its run-clamped trailing window of
    length 2d; the run guard stops propagation across run boundaries."""
    x = x.copy()
    n = x.size
    d = 1
    while d < n:
        same = run_id[d:] == run_id[:-d]
        np.maximum(x[d:], np.where(same, x[:-d], x[d:]), out=x[d:])
        d *= 2
    return x


def interval_coverage(
    ds: rd.Dataset,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
    num_partitions: int = 64,
) -> rd.Dataset:
    """Merge overlapping-or-touching [start, end] intervals per key and
    report coverage (the log/trace "interval union" pass: dedup of
    overlapping spans, total busy time, island counts).

    Exact algorithm: one hash exchange colocates each key's rows
    (grouped_apply ``exchange="hash"``, ordered by start), a new island
    begins where start > the per-run prefix max of earlier ends
    (``_segmented_cummax``), and per-island / per-key stats reduce with
    ``np.add.reduceat`` — no per-row Python anywhere.  Inputs must be int64
    (epoch-us timestamps / integer durations) with end >= start; all outputs
    are exact integers so a SQL window-function oracle matches bit-for-bit.

    Returns one row per key: (key, n_islands, covered, first_start,
    last_end), where ``covered`` sums (island_end − island_start).
    """
    from .canonicalize import grouped_apply

    key_type = ds.schema().base_schema.field(key_col).type
    out_schema = pa.schema([
        pa.field(key_col, key_type),
        pa.field("n_islands", pa.int64()),
        pa.field("covered", pa.int64()),
        pa.field("first_start", pa.int64()),
        pa.field("last_end", pa.int64()),
    ])

    def cover_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        s = block.column(start_col).to_numpy(zero_copy_only=False).astype(np.int64)
        e = block.column(end_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cm = _segmented_cummax(e, run_id)
        new_island = np.ones(n, bool)
        # a row starts a new island unless it overlaps/touches the prefix
        # max end of EARLIER rows in its run (which always belongs to the
        # current island: islands are separated by gaps and e >= s)
        new_island[1:] = (run_id[1:] != run_id[:-1]) | (s[1:] > cm[:-1])
        isl_start_idx = np.flatnonzero(new_island)
        # island end = prefix max at the row before the next island start
        isl_end_idx = np.r_[isl_start_idx[1:] - 1, n - 1]
        isl_s = s[isl_start_idx]
        isl_e = cm[isl_end_idx]
        isl_run = run_id[isl_start_idx]
        run_first = np.flatnonzero(np.r_[True, isl_run[1:] != isl_run[:-1]])
        n_isl = np.diff(np.r_[run_first, isl_run.size])
        covered = np.add.reduceat(isl_e - isl_s, run_first)
        first_s = isl_s[run_first]                      # starts ascend in run
        last_e = np.maximum.reduceat(isl_e, run_first)  # == max e of run
        # one output row per run; `starts` already holds each run's first
        # block-row index in run order
        keys = block.column(key_col).take(pa.array(starts, pa.int64()))
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        return pa.Table.from_arrays(
            [keys,
             pa.array(n_isl, pa.int64()),
             pa.array(covered, pa.int64()),
             pa.array(first_s, pa.int64()),
             pa.array(last_e, pa.int64())],
            schema=out_schema,
        )

    return grouped_apply(
        ds.select_columns([key_col, start_col, end_col]),
        [key_col], None, out_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=cover_block, order_col=start_col, exchange="hash",
    )

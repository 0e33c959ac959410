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


def rolling_range_sum(
    events: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    width_us: int,
) -> rd.Dataset:
    """SQL RANGE-frame rolling sum: per row, the sum of ``value_col`` over
    rows with the same key and timestamp in ``[ts - width_us, ts]`` —
    inclusive both ends, so equal-timestamp peers are always included
    regardless of any secondary order (exactly DuckDB's
    ``RANGE BETWEEN <width> PRECEDING AND CURRENT ROW``).

    Output: (id_col, roll_sum) with int64 sums (canonicalize values to int
    before calling — float accumulation order would be nondeterministic).

    Shape: key-only range sort (key runs colocate), then per block an
    in-block C sort, a prefix sum, and two searchsorted calls over per-run
    monotonized timestamps (the same shift trick as stages/temporal.py — a
    ``-width`` query can never reach the previous key's run)."""
    import pyarrow.compute as pc

    out_schema = pa.schema([(id_col, pa.int64()), ("roll_sum", pa.int64())])
    s = events.select_columns([key_col, ts_col, value_col, id_col]).sort([key_col])

    def per_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        k = block.column(key_col).to_numpy(zero_copy_only=False)
        t = pc.cast(block.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.cast(block.column(value_col), pa.int64()).to_numpy(zero_copy_only=False)
        ids = pc.cast(block.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((t, k))
        ks, tss, vs, idss = k[order], t[order], v[order], ids[order]
        run_start = np.r_[True, ks[1:] != ks[:-1]]
        run_id = np.cumsum(run_start) - 1
        starts_idx = np.flatnonzero(run_start)
        run_ends = np.r_[starts_idx[1:], n]
        rel = tss - tss.min()
        run_min = rel[starts_idx]
        run_max = rel[run_ends - 1]
        shift = np.zeros(len(starts_idx), dtype=np.int64)
        if len(starts_idx) > 1:
            delta = np.maximum(run_max[:-1] - run_min[1:] + width_us + 1, 0)
            shift[1:] = np.cumsum(delta)
        adj = rel + shift[run_id]
        psum = np.concatenate([[0], np.cumsum(vs)])
        lo = np.searchsorted(adj, adj - width_us, side="left")
        hi = np.searchsorted(adj, adj, side="right")
        return pa.Table.from_pydict(
            {
                id_col: pa.array(idss, pa.int64()),
                "roll_sum": pa.array(psum[hi] - psum[lo], pa.int64()),
            },
            schema=out_schema,
        )

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def topn_per_group(
    ds: rd.Dataset,
    *,
    key_col: str,
    order_col: str,
    n: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> rd.Dataset:
    """Top-``n`` rows per key by ``order_col`` (``tiebreak_col`` ascending
    breaks order ties deterministically — required when order_col admits
    duplicates).  Emits the input columns plus an int64 ``rn`` rank (1-based),
    exactly SQL ``row_number() OVER (PARTITION BY key ORDER BY ...)`` ≤ n.

    Key-only range sort for colocation; rank is a vectorized
    position-minus-run-start inside each block.  The per-block output is at
    most n rows per key, so downstream stages see |keys| × n rows."""
    import pyarrow.compute as pc

    s = ds.sort([key_col])

    def per_block(block: pa.Table) -> pa.Table:
        m = block.num_rows
        if m == 0:
            return block.append_column("rn", pa.array([], pa.int64()))
        block = block.combine_chunks()
        keys = [(key_col, "ascending"),
                (order_col, "descending" if descending else "ascending")]
        if tiebreak_col is not None:
            keys.append((tiebreak_col, "ascending"))
        order = pc.sort_indices(block, sort_keys=keys)
        block = block.take(order)
        k = block.column(key_col).to_numpy(zero_copy_only=False)
        run_start = np.r_[True, k[1:] != k[:-1]]
        starts_idx = np.flatnonzero(run_start)
        run_id = np.cumsum(run_start) - 1
        rank = np.arange(m, dtype=np.int64) - starts_idx[run_id] + 1
        out = block.append_column("rn", pa.array(rank, pa.int64()))
        return out.filter(pa.array(rank <= n))

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def grouped_lag(
    events: rd.Dataset,
    *,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "lag_delta",
    id_cols: list[str] | None = None,
) -> rd.Dataset:
    """SQL ``x - lag(x) OVER (PARTITION BY key ORDER BY order_cols)`` →
    (id_cols..., out_col); the first row of each partition gets null.

    Same shape as sessionize: sort on the KEY ONLY (range partitioning
    colocates equal keys; a composite sort could split one key's rows at an
    order-column boundary), then an in-block C sort restores the window
    order and the lag is one vectorized shift per block."""
    import pyarrow.compute as pc

    id_cols = id_cols or order_cols[-1:]
    need = list(dict.fromkeys([key_col, *order_cols, value_col, *id_cols]))
    s = events.select_columns(need).sort([key_col])

    def per_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        out_fields = [(c, block.schema.field(c).type) for c in id_cols]
        out_schema = pa.schema(out_fields + [(out_col, pa.int64())])
        if n == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[(key_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
        block = block.take(order)
        keys = block.column(key_col).to_numpy(zero_copy_only=False)
        vcol = block.column(value_col)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        # SQL null semantics: x − lag(x) is NULL when either side is null
        # (a bare numpy cast turns nulls into NaN and then INT64_MIN
        # garbage for the null row AND its successor)
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(pc.cast(vcol, pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        delta = np.empty(n, np.int64)
        delta[1:] = vals[1:] - vals[:-1]
        delta[0] = 0
        null_mask = new_key | ~valid
        null_mask[1:] |= ~valid[:-1]
        out = {c: block.column(c) for c in id_cols}
        d = pa.array(delta, pa.int64())
        out[out_col] = pc.if_else(pa.array(null_mask), pa.scalar(None, pa.int64()), d)
        return pa.Table.from_pydict(out, schema=out_schema)

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def grouped_twap(
    events: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "twap",
) -> rd.Dataset:
    """Time-weighted average per key (TWAP / time-in-state):
    Σ value·Δt / (t_last − t_first), rows ordered by ``order_cols``, Δt in
    whole epoch SECONDS to the next row (the last row carries no
    duration), value as an exact integer (cents).  Numerator and span
    accumulate as exact int64 segment sums (order-independent — the
    repo's rational-aggregate rule), then ONE float division; keys whose
    span is zero (a single event, or all within one second) → NULL, and
    keys with NO non-null SUM term (a term = value·Δt needs a non-null
    value AND a successor row) → NULL — exact SQL SUM-over-no-terms
    semantics; null values inside a mixed key contribute 0, matching SUM
    skipping null terms.  Timestamps must be non-null (asserted — NULL
    ts would silently degrade the int64 epoch math to float NaN).

    Same shape as grouped_lag: key-only range sort colocates each key,
    one in-block C sort restores window order, and the per-key math is a
    single vectorized reduceat — no per-row Python, no second shuffle."""
    import pyarrow.compute as pc

    need = list(dict.fromkeys([key_col, *order_cols, ts_col, value_col]))
    s = events.select_columns(need).sort([key_col])
    ktype = pa.schema(
        [(f.name, f.type)
         for f in events.schema(fetch_if_missing=True).base_schema]
    ).field(key_col).type
    out_schema = pa.schema([(key_col, ktype), (out_col, pa.float64())])

    def per_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[(key_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
        block = block.take(order)
        keys_np = block.column(key_col).to_numpy(zero_copy_only=False)
        if block.column(ts_col).null_count:
            raise ValueError(
                f"grouped_twap: {ts_col} contains NULLs — timestamps are a "
                "non-null contract (NULL epoch math degrades to float NaN)"
            )
        ts_s = (
            pc.cast(block.column(ts_col), pa.int64())
            .to_numpy(zero_copy_only=False) // 1_000_000
        )
        vcol = block.column(value_col)
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(pc.cast(vcol, pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(np.r_[True, keys_np[1:] != keys_np[:-1]])
        ends = np.r_[starts[1:], n]
        dt = np.zeros(n, np.int64)
        dt[:-1] = ts_s[1:] - ts_s[:-1]
        dt[ends - 1] = 0  # last row of every key: no next row
        num = np.add.reduceat(vals * dt, starts)
        # a SUM term v·(lead(ts)−ts) is non-null iff v is non-null AND the
        # row has a successor in its key — count those (exact SQL parity)
        term_valid = valid.copy()
        term_valid[ends - 1] = False
        nonnull = np.add.reduceat(term_valid.astype(np.int64), starts)
        span = ts_s[ends - 1] - ts_s[starts]
        twap = pa.array(
            num.astype(np.float64)
            / np.where(span == 0, 1, span).astype(np.float64),
            pa.float64(),
        )
        return pa.Table.from_pydict(
            {
                key_col: block.column(key_col).take(
                    pa.array(starts, pa.int64())
                ),
                out_col: pc.if_else(
                    pa.array((span == 0) | (nonnull == 0)),
                    pa.scalar(None, pa.float64()), twap,
                ),
            },
            schema=out_schema,
        )

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def hopping_counts(
    events: rd.Dataset,
    *,
    width_minutes: int,
    hop_minutes: int,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> rd.Dataset:
    """OVERLAPPING (hopping/sliding) window counts per key: window [s, s+width)
    for every s on the hop grid → (window_us, key, n).

    width must be a multiple of hop, so every event belongs to exactly
    width/hop windows — the expansion is one np.repeat/tile per batch (no
    per-row Python) and the groupby runs through the map-side combiner, so
    the exchange is O(windows × keys × blocks), never events × windows.
    Window starts stay int64 epoch-microseconds (no timestamp formatting to
    diverge between engines)."""
    from .aggregates import partial_grouped_agg

    width_us = int(width_minutes) * 60_000_000
    hop_us = int(hop_minutes) * 60_000_000
    if width_us % hop_us:
        raise ValueError("width_minutes must be a multiple of hop_minutes")
    w = width_us // hop_us

    def expand(block: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = block.num_rows
        if n == 0:
            return pa.table({
                "window_us": pa.array([], pa.int64()),
                key_col: pa.array([], block.schema.field(key_col).type),
            })
        ts = block.column(ts_col)
        if pc.any(pc.is_null(ts)).as_py():
            # explicit contract (grouped_rank precedent): a null ts would
            # otherwise become NaN and die as an opaque ArrowInvalid deep
            # in the window arithmetic
            raise ValueError(
                f"hopping_counts: {ts_col!r} contains nulls — canonicalize "
                "or filter them upstream"
            )
        t = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
        # event at t is in windows with start (t//hop - j)*hop, j in [0, w)
        k_hi = t // hop_us
        starts = (np.repeat(k_hi, w) - np.tile(np.arange(w, dtype=np.int64), n)) * hop_us
        keys = block.column(key_col).take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), w), pa.int64())
        )
        return pa.table({"window_us": pa.array(starts, pa.int64()), key_col: keys})

    exp = events.select_columns([ts_col, key_col]).map_batches(
        expand, batch_format="pyarrow"
    )
    return partial_grouped_agg(exp, ["window_us", key_col], count_alias="n")

def grouped_rank(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    id_col: str,
    ntile_k: int = 4,
    descending: bool = False,
    extended: bool = False,
) -> rd.Dataset:
    """Four SQL ranking windows in ONE pass over the key-colocated sort:
    (id_col, rnk, drnk, tile, run_sum) per row, where

    * ``rnk``     = RANK()        OVER (PARTITION BY key ORDER BY value)
    * ``drnk``    = DENSE_RANK()  OVER (PARTITION BY key ORDER BY value)
    * ``tile``    = NTILE(k)      OVER (PARTITION BY key ORDER BY value, id)
    * ``run_sum`` = SUM(value)    OVER (PARTITION BY key ORDER BY value, id
                                        ROWS UNBOUNDED PRECEDING)

    rank/dense_rank are tie-insensitive (peers share); ntile and run_sum use
    the (value, id) TOTAL order so every output is deterministic (the SQL
    default RANGE frame for SUM is avoided on purpose — ROWS over a total
    order is the only frame two engines can agree on bit-for-bit).
    ``value_col`` must be non-null: the vectorized path casts it to a numpy
    int64 vector, where a null would silently become NaN/garbage — the
    kernel raises instead (canonicalize/filter nulls upstream).

    ``extended=True`` appends four more windows from the SAME pass (no new
    exchange, no re-sort):

    * ``pct_rnk`` = PERCENT_RANK() OVER (PARTITION BY key ORDER BY value)
                    = (rank-1)/(n-1), 0.0 for single-row partitions —
                    floored to 1e-8 cells (the q_kg_pagerank float
                    convention) so both engines' doubles hash identically
    * ``cume``    = CUME_DIST()  (peers share their tie-run's END offset),
                    same 1e-8 floor
    * ``fv``/``lv`` = FIRST_VALUE/LAST_VALUE(value) over the (value, id)
                    total order with the full ROWS UNBOUNDED PRECEDING..
                    UNBOUNDED FOLLOWING frame (the only frame the SQL
                    default gotcha can't bite)

    Same scale shape as the rest of this module: key-only range sort (equal
    keys can't straddle a partition), then one in-block C sort + vectorized
    run scans — no per-row Python, per-block memory O(block)."""
    import pyarrow.compute as pc

    need = list(dict.fromkeys([key_col, value_col, id_col]))
    s = ds.select_columns(need).sort([key_col])
    direction = "descending" if descending else "ascending"

    def per_block(block: pa.Table) -> pa.Table:
        fields = [(id_col, block.schema.field(id_col).type),
                  ("rnk", pa.int64()), ("drnk", pa.int64()),
                  ("tile", pa.int64()), ("run_sum", pa.int64())]
        if extended:
            fields += [("pct_rnk", pa.float64()), ("cume", pa.float64()),
                       ("fv", pa.int64()), ("lv", pa.int64())]
        out_schema = pa.schema(fields)
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        if block.column(value_col).null_count:
            raise ValueError(
                f"grouped_rank: {value_col!r} contains nulls — canonicalize "
                "or filter them upstream (a null would corrupt the int64 "
                "vector path)"
            )
        order = pc.sort_indices(
            block,
            sort_keys=[(key_col, "ascending"), (value_col, direction),
                       (id_col, "ascending")],
        )
        block = block.take(order)
        k = block.column(key_col).to_numpy(zero_copy_only=False)
        v = pc.cast(block.column(value_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        new_key = np.r_[True, k[1:] != k[:-1]]
        starts_idx = np.flatnonzero(new_key)
        run_id = np.cumsum(new_key) - 1
        rn0 = np.arange(n, dtype=np.int64) - starts_idx[run_id]  # 0-based

        # tie runs over (key, value): rank = tie-run start's rn0 + 1
        new_val = new_key | np.r_[True, v[1:] != v[:-1]]
        tie_start = np.flatnonzero(new_val)
        tie_id = np.cumsum(new_val) - 1
        rnk = rn0[tie_start][tie_id] + 1

        cnv = np.cumsum(new_val)
        drnk = cnv - cnv[starts_idx][run_id] + 1

        # NTILE(k): first n%k buckets get floor(n/k)+1 rows (SQL semantics)
        ends = np.r_[starts_idx[1:], n]
        n_run = (ends - starts_idx)[run_id]
        size = n_run // ntile_k
        rem = n_run % ntile_k
        big = rem * (size + 1)
        in_big = rn0 < big
        tile = np.where(
            in_big,
            rn0 // np.maximum(size + 1, 1) + 1,
            rem + (rn0 - big) // np.maximum(size, 1) + 1,
        )

        ps = np.cumsum(v)
        base = np.r_[0, ps][starts_idx][run_id]
        run_sum = ps - base

        cols = {id_col: block.column(id_col),
                "rnk": pa.array(rnk, pa.int64()),
                "drnk": pa.array(drnk, pa.int64()),
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
                "run_sum": pa.array(run_sum, pa.int64())}
        if extended:
            pct = np.where(
                n_run > 1,
                (rnk - 1).astype(np.float64) / np.maximum(n_run - 1, 1),
                0.0,
            )
            tie_end = np.r_[tie_start[1:], n][tie_id]
            cume = (tie_end - starts_idx[run_id]).astype(np.float64) / n_run
            cols["pct_rnk"] = pa.array(np.floor(pct * 1e8) / 1e8, pa.float64())
            cols["cume"] = pa.array(np.floor(cume * 1e8) / 1e8, pa.float64())
            cols["fv"] = pa.array(v[starts_idx][run_id], pa.int64())
            cols["lv"] = pa.array(v[ends - 1][run_id], pa.int64())
        return pa.Table.from_pydict(cols, schema=out_schema)

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def grouped_string_agg(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    order_cols: list[str],
    sep: str = ">",
    out_col: str = "agg",
) -> rd.Dataset:
    """SQL ``string_agg(value, sep ORDER BY order_cols)`` per key →
    (key, out_col) — the user-journey / path-string aggregate.

    Null values are SKIPPED within a key (SQL string_agg semantics — a
    null element would otherwise null the whole join), and a key whose
    values are ALL null yields the key with a NULL aggregate — exactly the
    SQL GROUP BY row (dropping such keys would be a row-count mismatch
    against any string_agg oracle on null-bearing data).

    Key-only range sort colocates each key's rows; per block an in-block C
    sort restores the order, then ONE ListArray re-window over the sorted
    values + one ``binary_join`` emits every key's concatenation — no
    per-row or per-group Python.  A hot key's rows land in one task (cost
    O(rows log rows) there); output is O(keys) rows."""
    import pyarrow.compute as pc

    need = list(dict.fromkeys([key_col, value_col, *order_cols]))
    s = ds.select_columns(need).sort([key_col])

    def per_block(block: pa.Table) -> pa.Table:
        key_type = block.schema.field(key_col).type
        out_schema = pa.schema([(key_col, key_type), (out_col, pa.string())])
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        order = pc.sort_indices(
            block,
            sort_keys=[(key_col, "ascending")]
            + [(c, "ascending") for c in order_cols],
        )
        block = block.take(order)
        k = block.column(key_col).to_numpy(zero_copy_only=False)
        new_run = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new_run)
        vals = block.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        # skip nulls WITHIN each run (order preserved); runs with zero
        # valid values join to NULL, not ""
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        run_id = np.cumsum(new_run) - 1
        n_runs = len(starts)
        vcounts = np.bincount(run_id[valid], minlength=n_runs)
        offsets = pa.array(
            np.r_[0, np.cumsum(vcounts)].astype(np.int32), pa.int32()
        )
        lists = pa.ListArray.from_arrays(
            offsets, vals.filter(pa.array(valid))
        )
        joined = pc.if_else(
            pa.array(vcounts == 0),
            pa.scalar(None, pa.string()),
            pc.binary_join(lists, sep),
        )
        return pa.Table.from_pydict(
            {key_col: block.column(key_col).take(pa.array(starts, pa.int64())),
             out_col: joined},
            schema=out_schema,
        )

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


# below this row count the whole prefix sum runs in ONE zero-CPU task
# (sort_by + cumsum): the range sort's fixed cost dwarfs an in-task C sort
_PREFIX_SUM_DRIVER_ROWS = 1 << 20


def ordered_prefix_sum(
    ds: rd.Dataset,
    *,
    order_col: str,
    value_col: str,
    out_col: str = "running",
    presorted: bool = False,
) -> rd.Dataset:
    """GLOBAL running total: SQL ``SUM(value) OVER (ORDER BY order_col)``
    with no partition — the distributed prefix-sum primitive (token-budget
    sharding, cumulative quota cutoffs, offset assignment).

    Classic two-phase block-offset construction: after a range sort on
    ``order_col`` (skipped when ``presorted``), phase 1 computes each
    block's value sum in a zero-CPU task (O(blocks) driver state — the ONLY
    cross-block exchange), phase 2 adds each block's exclusive offset to an
    in-block vectorized cumsum.  Work O(rows), exchange O(blocks); at 100 TB
    the offsets are one int per block.

    ``order_col`` must be UNIQUE (a doc/row id): equal order values that
    straddle a block boundary would make the running total depend on block
    layout.  The cumulative sum is inclusive (SQL default frame
    RANGE UNBOUNDED PRECEDING..CURRENT ROW over unique keys ≡ ROWS).
    Values must be non-null int64; sums are exact.
    """
    import ray

    import pyarrow.compute as pc

    if not presorted:
        pre = ds.materialize()
        if pre.count() == 0:
            # typed empty result derived from the INPUT schema — a block of
            # pre can be a degenerate column-less pass-through, so the
            # in-task tables are not a safe schema source
            base = ds.schema(fetch_if_missing=True).base_schema
            return rd.from_arrow(
                pa.schema(
                    list(base) + [pa.field(out_col, pa.int64())]
                ).empty_table()
            )
        if pre.count() <= _PREFIX_SUM_DRIVER_ROWS:
            # small-data regime: ONE zero-CPU task sorts and scans — the
            # range sort's fixed cost (sampling + barriers) dwarfs a
            # million-row in-task C sort (same rule as the small-graph
            # PageRank/LPA regimes); identical output, bit-exact int sums
            @ray.remote(num_cpus=0)
            def small(*tables: pa.Table) -> pa.Table:
                # count() > 0 upstream guarantees a non-empty survivor
                ts = [t for t in tables if t.num_rows]
                t = pa.concat_tables(ts).combine_chunks().sort_by(order_col)
                col = t.column(value_col)
                if pc.any(pc.is_null(col)).as_py():
                    raise ValueError(
                        f"ordered_prefix_sum: {value_col!r} contains nulls"
                        " — canonicalize or filter them upstream"
                    )
                v = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
                return t.append_column(
                    out_col, pa.array(np.cumsum(v, dtype=np.int64), pa.int64())
                )

            prefs = pre.to_arrow_refs()
            if not prefs:
                base = ds.schema(fetch_if_missing=True).base_schema
                return rd.from_arrow(
                    pa.schema(
                        list(base) + [pa.field(out_col, pa.int64())]
                    ).empty_table()
                )
            return rd.from_arrow_refs([small.remote(*prefs)])
        ds = pre

    s = ds if presorted else ds.sort([order_col])
    mat = s.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        base = ds.schema(fetch_if_missing=True).base_schema
        return rd.from_arrow(
            pa.schema(
                list(base) + [pa.field(out_col, pa.int64())]
            ).empty_table()
        )

    @ray.remote(num_cpus=0)
    def block_sum(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        col = t.column(value_col)
        if pc.any(pc.is_null(col)).as_py():
            raise ValueError(
                f"ordered_prefix_sum: {value_col!r} contains nulls — "
                "canonicalize or filter them upstream"
            )
        return int(pc.sum(col).as_py())

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.r_[np.int64(0), np.cumsum(sums, dtype=np.int64)[:-1]]

    @ray.remote(num_cpus=0)
    def block_cumsum(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        v = pc.cast(t.column(value_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        run = np.cumsum(v, dtype=np.int64) + np.int64(off)
        return t.append_column(out_col, pa.array(run, pa.int64()))

    return rd.from_arrow_refs(
        [block_cumsum.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


def grouped_transitions(
    events: rd.Dataset,
    *,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    prev_col: str = "prev",
    next_col: str = "nxt",
    count_col: str = "n",
) -> rd.Dataset:
    """Per-key ordered TRANSITION counts — the Markov / user-journey
    matrix: for consecutive rows within each key (SQL
    ``lead(v) OVER (PARTITION BY key ORDER BY order_cols)``), count every
    (value, next value) pair.  → (prev_col, next_col, count_col).

    asof_join's exchange: the key-hash map/reduce (grouped_apply
    exchange="hash") colocates each key's rows with no global order (a
    range sort's sampling pass + merge-concats buy nothing here — the
    in-block sort restores window order anyway); pair emission is two
    array slices + one adjacent-run equality mask (pairs never span
    keys); the count is the map-side-combined grouped count, so the
    second exchange moves O(distinct transitions × blocks) rows."""
    import numpy as np
    import pyarrow.compute as pc

    from .aggregates import partial_grouped_agg
    from .canonicalize import grouped_apply

    need = list(dict.fromkeys([key_col, *order_cols, value_col]))
    s = events.select_columns(need)
    vtype = pa.schema(
        [(f.name, f.type)
         for f in s.schema(fetch_if_missing=True).base_schema]
    ).field(value_col).type
    pair_schema = pa.schema([(prev_col, vtype), (next_col, vtype)])

    def pair_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n < 2:
            return pair_schema.empty_table()
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        block = block.append_column("_run", pa.array(run_id, pa.int64()))
        block = block.sort_by(
            [("_run", "ascending")] + [(c, "ascending") for c in order_cols]
        ).combine_chunks()
        r = block.column("_run").to_numpy(zero_copy_only=False)
        same = pa.array(r[:-1] == r[1:])
        v = block.column(value_col)
        return pa.Table.from_arrays(
            [v.slice(0, n - 1).filter(same), v.slice(1, n - 1).filter(same)],
            schema=pair_schema,
        )

    pairs = grouped_apply(
        s, [key_col], None, pair_schema,
        hash_sort=True, block_fn=pair_block, exchange="hash",
    )
    return partial_grouped_agg(
        pairs, [prev_col, next_col], count_alias=count_col
    )


def grouped_cumulative_distinct(
    events: rd.Dataset,
    *,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    id_col: str,
    out_col: str = "n_seen",
) -> rd.Dataset:
    """Running DISTINCT count per key: for every row, how many distinct
    ``value_col`` values its key has seen up to and including it in
    ``order_cols`` order (SQL: SUM(first-occurrence flag) OVER the
    cumulative window) → (id_col, out_col).

    Hash-exchange key colocation (no range sort); per reduce block TWO
    vectorized passes: a (run, value, order) lexsort marks each (key,
    value) pair's first occurrence, then a (run, order) sort + per-run
    cumsum of the flags — no per-row Python, rows never leave their
    block after the exchange."""
    import numpy as np
    import pyarrow.compute as pc

    from .canonicalize import grouped_apply

    need = list(dict.fromkeys([key_col, *order_cols, value_col, id_col]))
    s = events.select_columns(need)
    sch = pa.schema(
        [(f.name, f.type)
         for f in s.schema(fetch_if_missing=True).base_schema]
    )
    out_schema = pa.schema([(id_col, sch.field(id_col).type),
                            (out_col, pa.int64())])

    def per_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        block = block.append_column("_run", pa.array(run_id, pa.int64()))
        # window order within runs
        block = block.sort_by(
            [("_run", "ascending")] + [(c, "ascending") for c in order_cols]
        ).combine_chunks()
        r = block.column("_run").to_numpy(zero_copy_only=False)
        # first occurrence of each (run, value): group equal pairs, flag the
        # earliest WINDOW position (the lexsort is stable over current order)
        enc = pc.dictionary_encode(block.column(value_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        v = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((np.arange(n), v, r))
        first_sorted = np.empty(n, bool)
        first_sorted[0] = True
        first_sorted[1:] = (r[o][1:] != r[o][:-1]) | (v[o][1:] != v[o][:-1])
        flag = np.empty(n, np.int64)
        flag[o] = first_sorted
        cs = np.cumsum(flag)
        run_starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
        base = np.repeat(cs[run_starts] - flag[run_starts],
                         np.diff(np.r_[run_starts, n]))
        return pa.Table.from_arrays(
            [block.column(id_col), pa.array(cs - base, pa.int64())],
            schema=out_schema,
        )

    return grouped_apply(
        s, [key_col], None, out_schema,
        hash_sort=True, block_fn=per_block, exchange="hash",
    )

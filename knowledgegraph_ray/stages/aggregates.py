"""Grouped aggregates beyond Ray Data's built-in Sum/Min/Max/Count.

* ``grouped_median`` — exact per-group discrete median (SQL
  ``quantile_disc(x, 0.5)``: the element at index floor((n-1)/2) of the
  sorted group).  An exact quantile fundamentally needs the group's values
  together, so this colocates groups with ONE key-only range sort and picks
  medians vectorized per block (in-block C sort + run-boundary index math).
  At 100 TB with few huge groups, switch to a two-pass histogram sketch;
  this operator is the exact path.
* ``grouped_count_distinct`` — per-group distinct count with MAP-SIDE
  PARTIAL dedup: each block first collapses to its distinct (group, value)
  pairs (a C lexsort + run scan, no Python sets), so the shuffle moves only
  per-block-unique pairs, then two small C groupbys finish the job.  The
  wide exchange is bounded by the true distinct-pair count, not the row
  count — the pre-aggregation pattern every 100 TB groupby needs.

Call with integer-canonicalized values (cents / int codes); float medians
would reintroduce engine-specific ordering of NaNs and signed zeros.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count


def grouped_median(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    out_col: str = "median",
) -> rd.Dataset:
    """(key, value) → (key, out_col): per-key discrete lower median."""
    out_schema = pa.schema([(key_col, pa.string()), (out_col, pa.int64())])
    s = ds.select_columns([key_col, value_col]).sort([key_col])

    def per_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        enc = pc.dictionary_encode(block.column(key_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = pc.cast(block.column(value_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((vals, codes))
        cs, vs = codes[order], vals[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        ends = np.r_[starts[1:], n]
        med_idx = starts + (ends - starts - 1) // 2
        keys = enc.dictionary.take(pa.array(cs[starts], pa.int64()))
        return pa.Table.from_pydict(
            {key_col: pc.cast(keys, pa.string()),
             out_col: pa.array(vs[med_idx], pa.int64())},
            schema=out_schema,
        )

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def grouped_count_distinct(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    out_col: str = "n_distinct",
) -> rd.Dataset:
    """(key, value) → (key, out_col): per-key count of distinct values."""

    def block_distinct_pairs(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return block.select([key_col, value_col])
        block = block.select([key_col, value_col]).combine_chunks()
        enc = pc.dictionary_encode(block.column(key_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = pc.cast(block.column(value_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((vals, codes))
        cs, vs = codes[order], vals[order]
        first = np.r_[True, (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])]
        take = pa.array(order[first], pa.int64())
        return block.take(take)

    pairs = ds.map_batches(block_distinct_pairs, batch_format="pyarrow")
    # distinct pairs globally (C hash aggregate), then rows-per-key
    uniq = pairs.groupby([key_col, value_col]).aggregate(Count(alias_name="_c"))
    return (
        uniq.groupby(key_col)
        .aggregate(Count(alias_name=out_col))
        .select_columns([key_col, out_col])
    )

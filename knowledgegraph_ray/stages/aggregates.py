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
from ray.data.aggregate import Count, Sum

# ---------------------------------------------------------------------------
# Exact wide-value sums: int64 power/product columns (x², x³, x·y) sit near
# the int64 ceiling per ROW, so their grouped SUMS wrap silently long before
# the documented per-row bound is violated (Σx² overflows at ~2.3M rows/group
# for |x| ≤ 2e6; Σx³ at TWO rows of |x| = 2e6).  pyarrow group_by("sum") has
# no checked variant, so instead each wide column travels as an EXACT hi/lo
# 32-bit split: x = (x >> 32)·2³² + (x & 0xFFFFFFFF) holds in two's
# complement with the ARITHMETIC right shift, lo ∈ [0, 2³²) so Σlo is safe
# to ~2.1e9 rows/group and Σhi (|hi| ≤ 2³¹) to ~4.3e9 — reconstruction in
# arbitrary-precision Python ints is exact, so HUGEINT SQL mirrors still
# hash bit-identically.
# ---------------------------------------------------------------------------

_LO32 = (1 << 32) - 1


def _split64(arr: pa.Array) -> tuple[pa.Array, pa.Array]:
    """Exact (hi, lo) 32-bit split of an int64 array (see note above)."""
    return pc.shift_right(arr, 32), pc.bit_wise_and(arr, _LO32)


def _joined64(row, name: str) -> int:
    """Reconstruct the exact Python-int sum from hi/lo partial sums."""
    return (int(row[name + "_hi"]) << 32) + int(row[name + "_lo"])


def grouped_quantile(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    q_num: int,
    q_den: int,
    out_col: str = "quantile",
) -> rd.Dataset:
    """(key, value) → (key, out_col): per-key EXACT discrete quantile —
    the element at sorted index ceil(q·n) − 1, which is DuckDB's
    ``quantile_disc`` positioning (probed: [1..4]@0.9→4, [10..100]@0.9→90,
    medians at the lower element).  The quantile is rational (q_num/q_den)
    so the index is computed in exact integer arithmetic — float q·n sits
    above/below the integer boundary unpredictably (0.9 × 10 ≠ 9 in binary).
    Same shape as every exact order statistic here: ONE key-only range sort
    colocates groups, in-block C sort + run-boundary index math.  Null
    values are ignored (SQL quantile semantics); a group whose values are
    ALL null yields the key with a NULL quantile — exactly the SQL
    GROUP BY row (and the histogram path's behavior).  Nulls ride the
    sort with an INT64_MAX fill so they land at each run's tail; the
    rank is taken over the run's NON-NULL count, so the fill can never
    be selected (a genuine INT64_MAX value ties with the fill — both are
    the same value, so the pick is still correct)."""
    # preserve the key's input type (an int64 key stringified here would
    # silently type-mismatch every join/oracle built on the result)
    ktype = pa.schema(
        [(f.name, f.type)
         for f in ds.schema(fetch_if_missing=True).base_schema]
    ).field(key_col).type
    out_schema = pa.schema([(key_col, ktype), (out_col, pa.int64())])
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
        vcol = pc.cast(block.column(value_col), pa.int64())
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(vcol, np.iinfo(np.int64).max).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((vals, codes))
        cs, vs = codes[order], vals[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        nn = np.add.reduceat(valid[order].astype(np.int64), starts)
        # ceil(q*nn) - 1 in exact ints over the NON-NULL run prefix
        q_idx = np.maximum(-(-(q_num * nn) // q_den) - 1, 0)
        keys = enc.dictionary.take(pa.array(cs[starts], pa.int64()))
        picked = pa.array(vs[starts + q_idx], pa.int64())
        return pa.Table.from_pydict(
            {key_col: pc.cast(keys, ktype),
             out_col: pc.if_else(
                 pa.array(nn == 0), pa.scalar(None, pa.int64()), picked
             )},
            schema=out_schema,
        )

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def grouped_quantile_multi(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    qs: "list[tuple[int, int]]",
    out_cols: "list[str]",
) -> rd.Dataset:
    """Several exact discrete quantiles per key from ONE key-only range
    sort (grouped_quantile's semantics per column; quantile_disc
    positioning, exact rational index arithmetic, nulls ignored, all-null
    groups yield NULL in every quantile column).  Fusing the quantile set
    halves-or-better the exchange cost of fence-style consumers
    (q_outliers_iqr ran two full sorts for Q1/Q3)."""
    ktype = pa.schema(
        [(f.name, f.type)
         for f in ds.schema(fetch_if_missing=True).base_schema]
    ).field(key_col).type
    out_schema = pa.schema(
        [(key_col, ktype)] + [(c, pa.int64()) for c in out_cols]
    )
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
        vcol = pc.cast(block.column(value_col), pa.int64())
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(vcol, np.iinfo(np.int64).max).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((vals, codes))
        cs, vs = codes[order], vals[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        nn = np.add.reduceat(valid[order].astype(np.int64), starts)
        keys = enc.dictionary.take(pa.array(cs[starts], pa.int64()))
        cols = {key_col: pc.cast(keys, ktype)}
        empty_mask = pa.array(nn == 0)
        for (q_num, q_den), out_col in zip(qs, out_cols):
            q_idx = np.maximum(-(-(q_num * nn) // q_den) - 1, 0)
            picked = pa.array(vs[starts + q_idx], pa.int64())
            cols[out_col] = pc.if_else(
                empty_mask, pa.scalar(None, pa.int64()), picked
            )
        return pa.Table.from_pydict(cols, schema=out_schema)

    return s.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def grouped_median(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    out_col: str = "median",
) -> rd.Dataset:
    """(key, value) → (key, out_col): per-key discrete lower median
    (= quantile_disc at 1/2)."""
    return grouped_quantile(
        ds, key_col=key_col, value_col=value_col, q_num=1, q_den=2,
        out_col=out_col,
    )


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
    # distinct pairs globally (adaptive: zero-CPU task combine while the
    # per-block-unique pair set is small, Ray groupby past the bound), then
    # rows-per-key through the same adaptive combine
    uniq = distinct_keys(pairs, [key_col, value_col])
    return partial_grouped_agg(
        uniq, [key_col], count_alias=out_col
    ).select_columns([key_col, out_col])


# One zero-CPU task comfortably combines this many already-map-side-combined
# partial rows; past it (≈ a few hundred MB of small columns) the Ray
# groupby's real all-to-all earns its fixed cost.  At 100 TB a high-cardinality
# key blows past this bound and takes the shuffle path automatically.
_SMALL_COMBINE_ROWS = 4_000_000


def _combine_partials_small(
    mat: rd.Dataset,
    keys: list[str],
    combine_fns: list[tuple[str, str]],
) -> rd.Dataset:
    """Final combine of already map-side-combined partial rows in ONE
    zero-CPU task (concat + C++ hash group_by) — replaces Ray's sort-based
    groupby exchange, whose ~1–2 s fixed cost (sampling pass + two stage
    barriers) dominates when the partial set is O(groups × blocks) small
    (measured sf0.1: 4.2 s → 0.7 s for a 320-partial-row combine).
    ``combine_fns``: (partial_col, fn) with fn ∈ {sum, min, max} — the
    caller guarantees sum columns are INTEGER so the combine is exact and
    order-independent (float sums keep the shuffle path).  An EMPTY
    ``combine_fns`` makes this a pure distinct over ``keys``.  Refs ship
    as ONE list argument (resolved in-task): at 10^5+ blocks an unpacked
    arg list is its own overhead."""
    import ray as _ray

    out_names = [c for c, _ in combine_fns]
    gen = [f"{c}_{fn}" for c, fn in combine_fns]

    @_ray.remote(num_cpus=0)
    def combine(refs: list) -> pa.Table:
        ts = [t for t in _ray.get(refs) if t.num_rows]  # degenerate-schema guard
        t = pa.concat_tables(ts).combine_chunks()
        g = t.group_by(keys).aggregate(combine_fns)
        return g.select(keys + gen).rename_columns(keys + out_names)

    return rd.from_arrow_refs([combine.remote(list(mat.to_arrow_refs()))])


def partial_grouped_agg(
    ds: rd.Dataset,
    keys: list[str],
    *,
    sums: dict[str, str] | None = None,
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    count_alias: str | None = None,
) -> rd.Dataset:
    """Distributive grouped aggregate with MAP-SIDE combine.

    Each block first collapses to one partial row per in-block group
    (pyarrow C++ hash group_by), so the final exchange moves
    O(groups × blocks) rows instead of the input row count — the combiner
    pattern every wide aggregate needs at 100 TB.  Only distributive
    aggregates are offered (sum/min/max/count); their partial combine is
    exact.  ``sums``/``mins``/``maxs`` map source column → output name.

    The final combine is ADAPTIVE on the measured partial row count: a
    small, integer-exact partial set combines in one zero-CPU task
    (`_combine_partials_small` — no sort shuffle); a large or float-summed
    one takes the Ray groupby (float sums keep their current summation
    order; integer sums/mins/maxs/counts are order-independent, so the two
    paths are bit-identical wherever both apply)."""
    import numpy as np

    from ray.data.aggregate import Max, Min, Sum

    sums = dict(sums or {})
    mins = dict(mins or {})
    maxs = dict(maxs or {})
    aggs = (
        [(c, "sum") for c in sums]
        + [(c, "min") for c in mins]
        + [(c, "max") for c in maxs]
    )
    out_names = list(sums.values()) + list(mins.values()) + list(maxs.values())
    if count_alias:
        aggs.append(("_one", "sum"))
        out_names.append(count_alias)

    # pyarrow names each aggregate column "{col}_{fn}"; select by those
    # generated names instead of trusting column POSITION (keys-first,
    # declaration-ordered layout is an undocumented contract that a pyarrow
    # upgrade could silently break, mislabeling every output column)
    gen_names = [f"{c}_{fn}" for c, fn in aggs]

    def per_block(block: pa.Table) -> pa.Table:
        if count_alias:
            block = block.append_column(
                "_one", pa.array(np.ones(block.num_rows, np.int64))
            )
        g = block.group_by(keys).aggregate(aggs)
        return g.select(keys + gen_names).rename_columns(keys + out_names)

    mat = ds.map_batches(per_block, batch_format="pyarrow").materialize()
    n_partial = mat.count()
    if 0 < n_partial <= _SMALL_COMBINE_ROWS:
        try:
            sch = mat.schema(fetch_if_missing=True)
            types = dict(zip(sch.names, sch.types))
            sum_cols = list(sums.values()) + ([count_alias] if count_alias else [])
            ints_only = all(pa.types.is_integer(types[c]) for c in sum_cols)
        except Exception:
            ints_only = False
        if ints_only:
            combine_fns = [(o, "sum") for o in sums.values()]
            combine_fns += [(o, "min") for o in mins.values()]
            combine_fns += [(o, "max") for o in maxs.values()]
            if count_alias:
                combine_fns.append((count_alias, "sum"))
            return _combine_partials_small(mat, keys, combine_fns)

    final = [Sum(o, alias_name=o) for o in sums.values()]
    final += [Min(o, alias_name=o) for o in mins.values()]
    final += [Max(o, alias_name=o) for o in maxs.values()]
    if count_alias:
        final.append(Sum(count_alias, alias_name=count_alias))
    return mat.groupby(keys).aggregate(*final)


def distinct_keys(ds: rd.Dataset, keys: list[str]) -> rd.Dataset:
    """Global distinct key rows with NO all-to-all exchange: per-block
    unique (C++ hash group_by) collapses each block to its distinct keys,
    then ONE bounded zero-CPU task combines the partials — the same shape
    as the shared broadcast-index build in functions/joins.py.  Correct
    whenever the global distinct-key set fits one task's heap (semi/anti
    join key sets, dimension keys); past `_SMALL_COMBINE_ROWS` per-block
    partials it falls back to the Ray groupby automatically, so the
    operator is safe at any cardinality."""
    import ray

    def per_block(b: pa.Table) -> pa.Table:
        return b.select(keys).group_by(keys).aggregate([])

    per = ds.map_batches(per_block, batch_format="pyarrow").materialize()
    if per.count() > _SMALL_COMBINE_ROWS:
        return (
            per.groupby(keys)
            .aggregate(Count(alias_name="_dk_c"))
            .select_columns(keys)
        )
    per_schema = per.schema(fetch_if_missing=True)
    if per_schema is None:
        # fully-empty input (zero blocks survive materialize): derive the
        # key schema from the INPUT dataset instead so callers still get a
        # typed empty result
        in_schema = ds.schema(fetch_if_missing=True)
        base = (
            in_schema.base_schema
            if in_schema is not None
            else pa.schema([pa.field(k, pa.null()) for k in keys])
        )
        schema = pa.schema([base.field(k) for k in keys])
        return rd.from_arrow(schema.empty_table())
    if per.count() == 0:
        schema = per_schema.base_schema
        return rd.from_arrow(
            pa.schema([schema.field(k) for k in keys]).empty_table()
        )
    # same zero-CPU combine as every small final combine (empty fn list =
    # pure distinct)
    return _combine_partials_small(per, keys, [])


# ---------------------------------------------------------------------------
# HyperLogLog approximate count-distinct — the scale path next to the exact
# grouped_count_distinct above.  At 10^12 rows an exact distinct moves every
# distinct pair through a shuffle; HLL moves ONE 2^p-byte register vector per
# block through a tree of zero-CPU merge tasks (register merge = elementwise
# max, associative and idempotent), so the exchange is O(blocks × 2^p) bytes
# and the answer has a proven ~1.04/sqrt(2^p) standard error (p=14 → 0.8%).
# The reference has no sketch layer (it counts via DB aggregates); this is
# part of the large-scale-training-pipeline operator set.
# ---------------------------------------------------------------------------

# leading-zero count within one byte (index 0 → 8)
_LZ8 = np.array(
    [8] + [7 - int(i).bit_length() + 1 for i in range(1, 256)], dtype=np.uint8
)


def _hll_rho(w: np.ndarray, max_rho: int) -> np.ndarray:
    """Position of the leftmost 1-bit of each uint64 (1-based), all-zero words
    → max_rho.  Vectorized via an MSB-first byte view + per-byte LZ table —
    exact for the full 64-bit range (float log2 rounds 2^53+ wrongly)."""
    b = w.byteswap().view(np.uint8).reshape(-1, 8)
    nz = b != 0
    first = np.argmax(nz, axis=1)
    any_nz = nz.any(axis=1)
    clz = first.astype(np.int64) * 8 + _LZ8[b[np.arange(len(w)), first]]
    rho = np.where(any_nz, clz + 1, max_rho).astype(np.uint8)
    return np.minimum(rho, np.uint8(max_rho))


def hll_register_block(block: pa.Table, value_cols: list[str], p: int) -> np.ndarray:
    """2^p uint8 HLL registers of one block's value tuples (deterministic
    polynomial row hash — identical across processes and partitionings)."""
    from ..functions.hashing import hash_key_columns

    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if block.num_rows == 0:
        return regs
    h = hash_key_columns(block, value_cols)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # remaining 64-p bits, MSB-aligned
    rho = _hll_rho(w, 64 - p + 1)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet et al. estimator with the small-range (linear counting)
    correction; no large-range correction needed at 64-bit hash width."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_count_distinct(
    ds: rd.Dataset, value_cols: list[str], *, p: int = 14, fanin: int = 64
) -> rd.Dataset:
    """Approximate global distinct count of ``value_cols`` tuples.

    One map pass emits per-block register vectors; a fan-in tree of zero-CPU
    tasks max-merges them (depth log_fanin(blocks), never O(blocks) on any
    single process); the root row carries the estimate.  Returns a 1-row
    Dataset {n_distinct_approx: int64, hll_p: int64} so it composes like
    every other operator.  The register vector is a pure function of the
    VALUE SET — duplicates and partitioning cannot change the answer."""
    import ray

    m = 1 << p

    def per_block(b: pa.Table) -> pa.Table:
        # zero-row Ray blocks can carry a degenerate empty schema — emit the
        # identity registers without touching the (possibly absent) columns
        if b.num_rows == 0:
            regs = np.zeros(m, dtype=np.uint8)
        else:
            regs = hll_register_block(b.select(value_cols), value_cols, p)
        return pa.Table.from_pydict({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    refs = list(partials.to_arrow_refs())
    if not refs:
        return rd.from_arrow(
            pa.Table.from_pydict(
                {"n_distinct_approx": pa.array([0], pa.int64()),
                 "hll_p": pa.array([p], pa.int64())}
            )
        )

    @ray.remote(num_cpus=0)
    def merge(*tbls) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        for t in tbls:
            # empty input blocks pass through map_batches untouched (the UDF
            # is skipped), so tolerate regs-less degenerate tables
            if "regs" not in t.column_names:
                continue
            for buf in t.column("regs").to_pylist():
                np.maximum(regs, np.frombuffer(buf, dtype=np.uint8), out=regs)
        return pa.Table.from_pydict({"regs": pa.array([regs.tobytes()], pa.binary())})

    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i : i + fanin]) for i in range(0, len(refs), fanin)
        ]

    @ray.remote(num_cpus=0)
    def finish(t: pa.Table) -> pa.Table:
        if "regs" in t.column_names and t.num_rows:
            regs = np.frombuffer(t.column("regs")[0].as_py(), dtype=np.uint8)
        else:
            regs = np.zeros(m, dtype=np.uint8)
        return pa.Table.from_pydict(
            {
                "n_distinct_approx": pa.array([int(round(hll_estimate(regs)))], pa.int64()),
                "hll_p": pa.array([p], pa.int64()),
            }
        )

    return rd.from_arrow_refs([finish.remote(refs[0])])


def grouped_hll_count_distinct(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    out_col: str = "n_distinct_approx",
    p: int = 12,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Per-group approximate distinct count — the scale sibling of the exact
    ``grouped_count_distinct`` above.  Each block emits ONE register row per
    group it contains (2^p bytes, p=12 → 4 KB, ~1.6% s.e.), so the exchange
    moves O(groups × blocks × 2^p) bytes instead of every distinct
    (group, value) pair; register rows hash-colocate per group through
    ``grouped_apply(exchange="hash")`` and max-merge in one run scan.  Wins
    over the exact path when per-group distinct cardinality is large (user
    sets, url sets at 100 TB); duplicates and partitioning cannot change the
    registers, so the output is deterministic."""
    from ..functions.hashing import hash_key_columns
    from .canonicalize import grouped_apply

    m = 1 << p
    out_schema = pa.schema([(key_col, pa.string()), (out_col, pa.int64())])
    regs_schema = pa.schema([(key_col, pa.string()), ("regs", pa.binary())])

    def per_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return regs_schema.empty_table()
        b = b.select([key_col, value_col]).combine_chunks()
        enc = pc.dictionary_encode(b.column(key_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        gcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_groups = len(enc.dictionary)
        h = hash_key_columns(b, [value_col])
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rho = _hll_rho(h << np.uint64(p), 64 - p + 1)
        regs = np.zeros(n_groups * m, dtype=np.uint8)
        np.maximum.at(regs, gcodes * m + idx, rho)
        regs2 = regs.reshape(n_groups, m)
        return pa.Table.from_pydict(
            {
                key_col: pc.cast(enc.dictionary, pa.string()),
                "regs": pa.array([regs2[i].tobytes() for i in range(n_groups)],
                                 pa.binary()),
            },
            schema=regs_schema,
        )

    partials = ds.map_batches(per_block, batch_format="pyarrow")

    def merge_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        total = block.num_rows
        if total == 0:
            return out_schema.empty_table()
        keys = block.column(key_col)
        bufs = block.column("regs").to_pylist()
        ends = np.r_[starts[1:], total]
        out_keys, out_vals = [], []
        for s, e in zip(starts, ends):
            regs = np.frombuffer(bufs[s], dtype=np.uint8)
            if e - s > 1:
                regs = np.stack(
                    [np.frombuffer(bufs[i], dtype=np.uint8) for i in range(s, e)]
                ).max(axis=0)
            out_keys.append(keys[s].as_py())
            out_vals.append(int(round(hll_estimate(regs))))
        return pa.Table.from_pydict(
            {key_col: pa.array(out_keys, pa.string()),
             out_col: pa.array(out_vals, pa.int64())},
            schema=out_schema,
        )

    return grouped_apply(
        partials,
        [key_col],
        None,
        out_schema,
        num_partitions=num_partitions,
        hash_sort=True,
        block_fn=merge_block,
        exchange="hash",
    )


def grouping_sets_agg(
    ds: rd.Dataset,
    keys: list[str],
    sets: list[list[str]],
    *,
    sums: dict[str, str] | None = None,
    count_alias: str | None = None,
    sentinels: dict[str, object] | None = None,
    small_result_rows: int = 2_000_000,
) -> rd.Dataset:
    """GROUPING SETS aggregate: one row per group for every key subset in
    ``sets`` (each a sublist of ``keys``), with ``sentinels[key]`` filling
    the rolled-up key columns.  ROLLUP and CUBE are thin wrappers.

    100-TB shape: the INPUT is aggregated exactly once (the finest level —
    all of ``keys`` — via ``partial_grouped_agg``, map-side combined); every
    requested set is a re-aggregation of the finest RESULT (O(groups) rows),
    cascading sum partials the way a warehouse rollup does — no second pass
    over the data and no extra wide exchange beyond the single finest-level
    groupby.  Only distributive aggregates (sum/count) are offered; their
    level cascade is exact."""
    sums = dict(sums or {})
    sentinels = dict(sentinels or {})
    # validate up front: every key rolled up in ANY level needs a sentinel
    # fill value (otherwise the failure is a bare KeyError deep inside a
    # map_batches UDF with no hint at the API contract)
    rolled = {k for lvl in sets for k in keys if k not in lvl}
    missing = rolled - sentinels.keys()
    if missing:
        raise ValueError(
            f"grouping_sets_agg: rolled-up key(s) {sorted(missing)} need a "
            "sentinel fill value — pass sentinels={key: fill_value}"
        )
    out_vals = list(sums.values()) + ([count_alias] if count_alias else [])
    out_cols = list(keys) + out_vals

    # The finest level is consumed by every coarser level; materialize it so
    # the expensive input aggregation runs ONCE.  It is O(groups) rows — the
    # small-result exception to the no-mid-pipeline-materialize rule.
    finest = partial_grouped_agg(
        ds, keys, sums=sums, count_alias=count_alias
    ).materialize()

    def _sentinel_type(v) -> pa.DataType:
        if isinstance(v, str):
            return pa.string()
        if isinstance(v, float):
            return pa.float64()
        return pa.int64()

    def _with_sentinels(level_keys: list[str]):
        def fill(b: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                if k in level_keys:
                    cols[k] = b.column(k)
                else:
                    v = sentinels[k]
                    cols[k] = pa.array([v] * b.num_rows, type=_sentinel_type(v))
            for v in out_vals:
                cols[v] = pc.cast(b.column(v), pa.int64())
            return pa.Table.from_pydict(cols)

        return fill

    # SMALL-RESULT REGIME: the cascade's input is the O(groups) finest
    # table — when it fits the driver comfortably, the per-level Dataset
    # pipelines are pure scheduling overhead (~0.7 s each at sf0.1), so run
    # the SAME integer cascade in pyarrow group_by locally.  Both paths sum
    # exact int64 partials, so they are exactly equal (regime-tested).
    import ray

    if finest.count() <= small_result_rows:
        ft = [t for t in ray.get(finest.to_arrow_refs()) if t.num_rows]
        base = (pa.concat_tables(ft).combine_chunks() if ft else None)
        out_tbls = []
        for lvl_keys in sets:
            if base is None:
                continue
            lk = list(lvl_keys)
            if lk == list(keys):
                lvl_t = base
            elif lk:
                # select by the GENERATED aggregate names, never by column
                # position (same contract note as partial_grouped_agg)
                gen = [f"{v}_sum" for v in out_vals]
                lvl_t = base.group_by(lk).aggregate(
                    [(v, "sum") for v in out_vals]
                ).select(lk + gen).rename_columns(lk + out_vals)
            else:
                lvl_t = pa.table({
                    v: pa.array([pc.sum(base.column(v)).as_py() or 0],
                                pa.int64())
                    for v in out_vals
                })
            out_tbls.append(_with_sentinels(lk)(lvl_t).select(out_cols))
        if not out_tbls:
            # empty input → empty output (matches the distributed path,
            # where every level's groupby over zero rows yields zero rows)
            empty = pa.table({
                c: pa.array([], _sentinel_type(sentinels[c])
                            if c in sentinels else
                            (pa.string() if c in keys else pa.int64()))
                for c in out_cols
            })
            return rd.from_arrow(empty)
        return rd.from_arrow(pa.concat_tables(out_tbls))

    levels = []
    for lvl_keys in sets:
        if list(lvl_keys) == list(keys):
            lvl = finest
        elif lvl_keys:
            lvl = partial_grouped_agg(
                finest, list(lvl_keys), sums={v: v for v in out_vals}
            )
        else:
            def _const(b: pa.Table) -> pa.Table:
                return b.append_column(
                    "_all", pa.array(np.zeros(b.num_rows, np.int8))
                )

            lvl = partial_grouped_agg(
                finest.map_batches(_const, batch_format="pyarrow"),
                ["_all"],
                sums={v: v for v in out_vals},
            ).drop_columns(["_all"])
        levels.append(
            lvl.map_batches(_with_sentinels(list(lvl_keys)),
                            batch_format="pyarrow")
        )

    out = levels[0].union(*levels[1:]) if len(levels) > 1 else levels[0]
    return out.map_batches(lambda b: b.select(out_cols), batch_format="pyarrow")


def rollup_agg(
    ds: rd.Dataset,
    keys: list[str],
    *,
    sums: dict[str, str] | None = None,
    count_alias: str | None = None,
    sentinels: dict[str, object] | None = None,
) -> rd.Dataset:
    """ROLLUP (hierarchical grouping-sets): every prefix level of ``keys`` —
    (k1,k2), (k1), and the grand total."""
    sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return grouping_sets_agg(
        ds, keys, sets, sums=sums, count_alias=count_alias,
        sentinels=sentinels,
    )


def cube_agg(
    ds: rd.Dataset,
    keys: list[str],
    *,
    sums: dict[str, str] | None = None,
    count_alias: str | None = None,
    sentinels: dict[str, object] | None = None,
) -> rd.Dataset:
    """CUBE grouping-sets: one row per group for EVERY subset of ``keys``
    (2^k levels), all cascaded from the one materialized finest level."""
    k = len(keys)
    sets = [
        [keys[j] for j in range(k) if mask & (1 << j)]
        for mask in range(2 ** k - 1, -1, -1)
    ]
    return grouping_sets_agg(
        ds, keys, sets, sums=sums, count_alias=count_alias,
        sentinels=sentinels,
    )


def grouped_topk(
    ds: rd.Dataset,
    key_cols: list[str],
    *,
    value_col: str,
    tiebreak_cols: list[str] | None = None,
    k: int,
    descending: bool = True,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Top-``k`` rows per group by ``value_col`` (desc by default), ties
    broken by ``tiebreak_cols`` ascending — the grouped-heavy-hitter /
    per-domain-top-terms shape.

    SQL: ``row_number() OVER (PARTITION BY keys ORDER BY value DESC,
    ties) <= k``.  Ray-Data-first: the hash map/reduce exchange colocates
    each key's rows (two task waves, partition count follows data size);
    within each reduce partition ONE multi-key C++ ``sort_indices``
    (run, value, ties) orders every group at once and a grouped arange
    keeps each run's first ``k`` — no per-group Python.  Hot groups cost
    O(their rows log rows) inside one reduce task; the k-cap bounds the
    output skew."""
    from .canonicalize import grouped_apply

    tiebreak_cols = list(tiebreak_cols or [])
    schema = ds.schema(fetch_if_missing=True)
    out_schema = pa.schema([(f.name, f.type) for f in schema.base_schema])
    value_dir = "descending" if descending else "ascending"

    def topk_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        total = block.num_rows
        if total == 0:
            return out_schema.empty_table()
        sizes = np.diff(np.r_[starts, total])
        run_of = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        tmp = block.select([value_col] + tiebreak_cols).append_column(
            "_run", pa.array(run_of)
        )
        order = pc.sort_indices(
            tmp,
            sort_keys=[("_run", "ascending"), (value_col, value_dir)]
            + [(c, "ascending") for c in tiebreak_cols],
        ).to_numpy()
        # stable sort on _run keeps each run contiguous at its original slot
        pos_in_run = np.arange(total, dtype=np.int64) - np.repeat(
            starts.astype(np.int64), sizes
        )
        keep = order[np.flatnonzero(pos_in_run < k)]
        return block.take(pa.array(keep, pa.int64())).select(out_schema.names)

    return grouped_apply(
        ds,
        key_cols,
        None,
        out_schema,
        num_partitions=num_partitions,
        hash_sort=True,
        block_fn=topk_block,
        exchange="hash",
    )


def grouped_arg_extrema(
    ds: rd.Dataset,
    *,
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    payload_col: str,
    count_alias: str = "n_rows",
    num_partitions: int = 16,
) -> rd.Dataset:
    """FIRST_VALUE + LAST_VALUE + COUNT per key in ONE pass — the
    argmin/argmax combiner shape (first/last event per user, first/last
    capture per URL).

    SQL: ``first_value(payload) OVER (PARTITION BY key ORDER BY order,
    tiebreak)`` + the LAST_VALUE mirror + ``count(*)``, one row per key.
    ``(order, tiebreak)`` must be a total order within each key (pass a
    unique id as the tiebreak) so both engines pick the same row.

    Unlike ``grouped_topk`` (which ships every row through the exchange),
    each block first collapses to ONE partial row per in-block key — a
    single C++ multi-key sort + run scan finds both extrema — so the
    exchange moves O(keys × blocks) rows carrying (first_*, last_*, n).
    The arg-combine (first = min by (ord, tie), last = max, n = Σ) is
    associative, so any partition count yields identical rows.  Final
    combine is adaptive like ``partial_grouped_agg``: one zero-CPU task
    under ``_SMALL_COMBINE_ROWS`` partials, hash-exchange ``grouped_apply``
    past it (the 100 TB path).  ``key_col`` must cast to int64 (ids); the
    payload travels as its native Arrow type, never through Python.
    """
    from .canonicalize import grouped_apply

    f_ord, f_pay = f"first_{order_col}", f"first_{payload_col}"
    l_ord, l_pay = f"last_{order_col}", f"last_{payload_col}"

    def _runs(tbl: pa.Table, sort_cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(sorted row order, run-start offsets) of tbl grouped by key."""
        order = pc.sort_indices(
            tbl, sort_keys=[(c, "ascending") for c in sort_cols]
        ).to_numpy()
        k = (
            pc.cast(tbl.column(key_col), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
        )
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        return order, starts

    def per_block(b: pa.Table) -> pa.Table:
        t = b.select([key_col, order_col, tiebreak_col, payload_col]).combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: t.column(key_col),
                    f_ord: t.column(order_col),
                    "_f_tie": t.column(tiebreak_col),
                    f_pay: t.column(payload_col),
                    l_ord: t.column(order_col),
                    "_l_tie": t.column(tiebreak_col),
                    l_pay: t.column(payload_col),
                    count_alias: pa.array([], pa.int64()),
                }
            )
        order, starts = _runs(t, [key_col, order_col, tiebreak_col])
        n = t.num_rows
        sizes = np.diff(np.r_[starts, n])
        f_take = pa.array(order[starts], pa.int64())
        l_take = pa.array(order[np.r_[starts[1:], n] - 1], pa.int64())
        return pa.table(
            {
                key_col: t.column(key_col).take(f_take),
                f_ord: t.column(order_col).take(f_take),
                "_f_tie": t.column(tiebreak_col).take(f_take),
                f_pay: t.column(payload_col).take(f_take),
                l_ord: t.column(order_col).take(l_take),
                "_l_tie": t.column(tiebreak_col).take(l_take),
                l_pay: t.column(payload_col).take(l_take),
                count_alias: pa.array(sizes, pa.int64()),
            }
        )

    out_cols = [key_col, f_ord, f_pay, l_ord, l_pay, count_alias]

    def combine_tbl(p: pa.Table) -> pa.Table:
        p = p.combine_chunks()
        if p.num_rows == 0:
            return p.select(out_cols)
        o1, starts = _runs(p, [key_col, f_ord, "_f_tie"])
        o2, _ = _runs(p, [key_col, l_ord, "_l_tie"])
        n = p.num_rows
        f_take = pa.array(o1[starts], pa.int64())
        l_take = pa.array(o2[np.r_[starts[1:], n] - 1], pa.int64())
        counts = (
            p.column(count_alias)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[o1]
        )
        sums = np.add.reduceat(counts, starts)
        return pa.table(
            {
                key_col: p.column(key_col).take(f_take),
                f_ord: p.column(f_ord).take(f_take),
                f_pay: p.column(f_pay).take(f_take),
                l_ord: p.column(l_ord).take(l_take),
                l_pay: p.column(l_pay).take(l_take),
                count_alias: pa.array(sums, pa.int64()),
            }
        )

    mat = ds.map_batches(per_block, batch_format="pyarrow").materialize()
    n_partial = mat.count()
    if n_partial == 0:
        # fully-empty input may surface no partial schema at all — derive
        # the typed empty result from the INPUT dataset (distinct_keys
        # convention)
        sch = mat.schema(fetch_if_missing=True)
        if sch is not None:
            base = sch.base_schema
        else:
            in_base = ds.schema(fetch_if_missing=True).base_schema
            base = pa.schema(
                [
                    in_base.field(key_col),
                    in_base.field(order_col).with_name(f_ord),
                    in_base.field(payload_col).with_name(f_pay),
                    in_base.field(order_col).with_name(l_ord),
                    in_base.field(payload_col).with_name(l_pay),
                    pa.field(count_alias, pa.int64()),
                ]
            )
        return rd.from_arrow(
            pa.schema([base.field(c) for c in out_cols]).empty_table()
        )
    if n_partial <= _SMALL_COMBINE_ROWS:
        import ray as _ray

        @_ray.remote(num_cpus=0)
        def combine(refs: list) -> pa.Table:
            ts = [t for t in _ray.get(refs) if t.num_rows]
            return combine_tbl(pa.concat_tables(ts))

        return rd.from_arrow_refs([combine.remote(list(mat.to_arrow_refs()))])
    sch = mat.schema(fetch_if_missing=True).base_schema
    out_schema = pa.schema([sch.field(c) for c in out_cols])
    return grouped_apply(
        mat,
        [key_col],
        None,
        out_schema,
        num_partitions=num_partitions,
        hash_sort=True,
        block_fn=lambda block, starts: combine_tbl(block).select(out_cols),
        exchange="hash",
    )


def _grouped_order_stats(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    rank_fns,
    num_bins: int = 65536,
    max_rounds: int | None = None,
):
    """Engine behind the histogram quantiles: resolve, for every group, the
    order statistics at 0-based ranks ``[f(n) for f in rank_fns]`` in ONE
    shared iterative refinement — all slots of all groups walk the same
    per-round histogram stream.

    Each round streams the data once, emitting map-side-combined
    (key, slot, bin) counts over each slot's current [lo, hi] bracket
    (exchange O(groups × slots × bins × blocks) partials); a driver-side
    cumulative scan walks each rank into one bin and narrows its bracket
    ×num_bins.  Integer brackets converge in ceil(log_bins(range)) rounds
    (default 65536 bins: cents-range values 1–2 rounds, full int64 4 —
    each round is a full stream, so wider histograms buy wall-clock; the
    per-block partial emission only contains NONEMPTY bins, so it stays
    bounded by block rows regardless of num_bins).  NO group colocation,
    no sort shuffle — a hot group never lands in one task.

    Returns (n_map, vals): group key → row count, and group key →
    [resolved value per rank_fn].  Driver state is O(groups × slots);
    pre-aggregate or shard the key space beyond that."""
    B = int(num_bins)
    S = len(rank_fns)

    # ONE materialization of the 2-column slice feeds the base pass AND
    # every refinement round — the repeated full streams re-read the
    # object store (spill-backed at scale) instead of re-running the
    # caller's read+transform lineage each round (skipped when the caller
    # already hands exactly that materialized slice)
    if not (
        isinstance(ds, rd.dataset.MaterializedDataset)
        and set(ds.columns()) == {key_col, value_col}
    ):
        ds = ds.select_columns([key_col, value_col]).materialize()

    # rank basis = NON-NULL count (SQL quantile semantics ignore nulls;
    # counting them in n while the histogram bins exclude them either
    # walks a rank past the histogram or shifts every resolved element)
    def add_nn(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_nnc", pc.cast(pc.is_valid(b.column(value_col)), pa.int64())
        )

    base = partial_grouped_agg(
        ds.map_batches(add_nn, batch_format="pyarrow"),
        [key_col],
        sums={"_nnc": "_n"},
        mins={value_col: "_lo"},
        maxs={value_col: "_hi"},
    ).take_all()
    # state per (group, slot): bracket [lo, hi] and the 0-based rank of the
    # target within the bracket, exact ints throughout
    state: dict = {}
    done: dict = {}
    n_map: dict = {}
    for r in base:
        kv = r[key_col]
        n = int(r["_n"])
        n_map[kv] = n
        done[kv] = [None] * S
        if n == 0:  # all-null group → null order statistics (SQL)
            continue
        lo, hi = int(r["_lo"]), int(r["_hi"])
        for s, f in enumerate(rank_fns):
            if lo == hi:
                done[kv][s] = lo
            else:
                state[(kv, s)] = (lo, hi, int(f(n)))

    if max_rounds is None and state:
        # each round shrinks a bracket to <= ceil(width/B): log_B of the
        # widest initial bracket, plus slack for the +1-per-round residue
        w0 = max(hi - lo + 1 for lo, hi, _ in state.values())
        max_rounds = int(np.ceil(np.log(w0) / np.log(B))) + 8
    rounds = 0
    while state:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError("histogram quantile did not converge")
        snap = dict(state)  # small: O(groups x slots); shipped per task

        def bin_counts(batch: pa.Table) -> pa.Table:
            t = batch.select([key_col, value_col]).combine_chunks()
            key_type = t.column(key_col).type
            empty = pa.Table.from_pydict(
                {key_col: pa.array([], key_type),
                 "_slot": pa.array([], pa.int64()),
                 "_bin": pa.array([], pa.int64()),
                 "_c": pa.array([], pa.int64())}
            )
            if t.num_rows == 0:
                return empty
            enc = pc.dictionary_encode(t.column(key_col))
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            dict_vals = enc.dictionary.to_pylist()
            nd = len(dict_vals)
            # per-DISTINCT-key bracket lookup (O(distinct x slots), not rows)
            los = np.empty((S, nd), np.int64)
            his = np.empty((S, nd), np.int64)
            act = np.zeros((S, nd), bool)
            any_act = False
            for i, kv in enumerate(dict_vals):
                for s in range(S):
                    st = snap.get((kv, s))
                    if st is not None:
                        los[s, i], his[s, i], act[s, i] = st[0], st[1], True
                        any_act = True
            if not any_act:
                return empty
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            # null-safe int64 extraction: a bare to_numpy on a null-bearing
            # column degrades the WHOLE array to float64 (NaN slots), and
            # float64 silently rounds values past 2^53 — mask + fill keeps
            # every non-null value exact int64 (same fix as grouped_lag)
            vcol = pc.cast(t.column(value_col), pa.int64())
            v_ok = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
            v = pc.fill_null(vcol, 0).to_numpy(zero_copy_only=False)
            parts = []
            for s in range(S):
                if not act[s].any():
                    continue
                lo_r, hi_r = los[s][codes], his[s][codes]
                m = act[s][codes] & v_ok & (v >= lo_r) & (v <= hi_r)
                if not m.any():
                    continue
                width = hi_r[m] - lo_r[m] + 1
                b = (v[m] - lo_r[m]) * B // width
                parts.append(pa.Table.from_pydict(
                    {key_col: t.column(key_col).filter(pa.array(m)),
                     "_slot": pa.array(np.full(int(m.sum()), s, np.int64)),
                     "_bin": pa.array(b, pa.int64())}
                ))
            if not parts:
                return empty
            part = pa.concat_tables(parts)
            g = part.group_by([key_col, "_slot", "_bin"]).aggregate(
                [([], "count_all")]
            )
            # select by the GENERATED aggregate name, never by position
            # (the keys-first layout is an undocumented pyarrow contract —
            # same fix as partial_grouped_agg)
            return g.select([key_col, "_slot", "_bin", "count_all"]
                            ).rename_columns([key_col, "_slot", "_bin", "_c"])

        mapped = ds.map_batches(bin_counts, batch_format="pyarrow").materialize()
        ck = [key_col, "_slot", "_bin"]
        if 0 < mapped.count() <= _SMALL_COMBINE_ROWS:
            # int counts: the zero-CPU task combine is exact and skips the
            # per-round sort shuffle entirely
            counts = _combine_partials_small(
                mapped, ck, [("_c", "sum")]
            ).take_all()
        else:
            counts = (
                mapped.groupby(ck)
                .aggregate(Sum("_c", alias_name="_c"))
                .take_all()
            )
        # per-slot cumulative walk (O(groups x slots x bins) driver work)
        per_slot: dict = {}
        for r in counts:
            per_slot.setdefault((r[key_col], r["_slot"]), []).append(
                (r["_bin"], r["_c"])
            )
        new_state: dict = {}
        for (kv, s), (lo, hi, rank) in state.items():
            bins = sorted(per_slot.get((kv, s), ()))
            cum = 0
            width = hi - lo + 1
            for b, c in bins:
                if cum + c > rank:
                    # bin b holds exactly the integers x with
                    # x*B//width == b, i.e. x in
                    # [ceil(b*w/B), ceil((b+1)*w/B) - 1] — a tight
                    # consecutive partition (floor bounds would re-admit
                    # bin b-1 values and clip the bin top)
                    nlo = lo + -(-(b * width) // B)
                    nhi = lo + -(-((b + 1) * width) // B) - 1
                    rank -= cum
                    if nlo == nhi:
                        done[kv][s] = nlo
                    else:
                        new_state[(kv, s)] = (nlo, nhi, rank)
                    break
                cum += c
            else:
                raise RuntimeError(
                    f"rank walked past histogram for {kv!r} slot {s}"
                )
        state = new_state
    return n_map, done


def grouped_quantile_histogram(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    q_num: int,
    q_den: int,
    out_col: str = "quantile",
    num_bins: int = 65536,
    max_rounds: int | None = None,
) -> pa.Table:
    """Per-key EXACT discrete quantile via iterative histogram refinement —
    the 100-TB path `grouped_quantile`\'s docstring promises (see
    `_grouped_order_stats` for the mechanism).  Positioning matches DuckDB
    ``quantile_disc`` exactly: the element at sorted index ceil(q·n) − 1,
    rank arithmetic kept in exact integers.  Returns an Arrow table
    (key_col, out_col) — O(groups) rows."""
    _, done = _grouped_order_stats(
        ds, key_col=key_col, value_col=value_col,
        rank_fns=[lambda n: -(-(q_num * n) // q_den) - 1],
        num_bins=num_bins, max_rounds=max_rounds,
    )
    keys = sorted(done)
    return pa.Table.from_pydict(
        {key_col: pa.array(keys),
         out_col: pa.array([done[k][0] for k in keys], pa.int64())}
    )


def grouped_quantile_cont(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    q_num: int,
    q_den: int,
    out_col: str = "quantile",
    num_bins: int = 65536,
) -> pa.Table:
    """Per-key INTERPOLATED quantile (SQL ``percentile_cont`` / DuckDB
    ``quantile_cont``) through the histogram scale path: the continuous
    position is h = q·(n−1); the two bracketing order statistics (0-based
    ranks ⌊h⌋ and ⌈h⌉) resolve as two slots of ONE shared histogram walk,
    then blend lo + (hi − lo)·frac in float64 — bit-identical to DuckDB
    for integer inputs whenever frac is dyadic (e.g. the q=1/2 median) and
    |values| < 2^52, since every intermediate is exactly representable."""
    n_map, done = _grouped_order_stats(
        ds, key_col=key_col, value_col=value_col,
        rank_fns=[
            lambda n: ((n - 1) * q_num) // q_den,
            lambda n: -(-((n - 1) * q_num) // q_den),
        ],
        num_bins=num_bins,
    )
    keys = sorted(done)
    vals = []
    for k in keys:
        lo, hi = done[k]
        if lo is None or hi is None:  # all-null group
            vals.append(None)
            continue
        rem = ((n_map[k] - 1) * q_num) % q_den
        vals.append(float(lo) + (float(hi) - float(lo)) * (rem / q_den))
    return pa.Table.from_pydict(
        {key_col: pa.array(keys), out_col: pa.array(vals, pa.float64())}
    )


def profile_numeric(
    ds: rd.Dataset,
    cols: list[str],
) -> rd.Dataset:
    """Single-pass data-quality profile of int64-castable columns →
    (column, n, n_null, min_v, max_v), one output row per column.

    The Deequ/TFDV-style profiling pass every ingest pipeline runs before
    training: each block emits ONE tiny partial row per column (count,
    null count, min, max — all distributive), so the exchange is
    O(columns × blocks) regardless of row count, and every column is
    profiled in the same scan (no per-column re-read)."""
    from ray.data.aggregate import Max, Min, Sum

    def per_block(block: pa.Table) -> pa.Table:
        names, ns, nulls, mins_, maxs_ = [], [], [], [], []
        for c in cols:
            col = pc.cast(block.column(c), pa.int64())
            names.append(c)
            ns.append(block.num_rows)
            nulls.append(col.null_count)
            mm = pc.min_max(col)  # ignores nulls; null if all-null
            mins_.append(mm["min"].as_py())
            maxs_.append(mm["max"].as_py())
        return pa.Table.from_pydict(
            {"column": pa.array(names, pa.string()),
             "n": pa.array(ns, pa.int64()),
             "n_null": pa.array(nulls, pa.int64()),
             "min_v": pa.array(mins_, pa.int64()),
             "max_v": pa.array(maxs_, pa.int64())}
        )

    return (
        ds.map_batches(per_block, batch_format="pyarrow")
        .groupby("column")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
    )


def grouped_corr(
    ds: rd.Dataset,
    *,
    key_col: str,
    x_col: str,
    y_col: str,
    out_col: str = "corr_xy",
) -> pa.Table:
    """Per-key Pearson correlation with REPRODUCIBLE float output.

    Streaming float correlation (Welford / one-pass covariance) gives
    engine-specific low-order bits, so instead the six distributive sums
    (n, Σx, Σy, Σxy, Σx², Σy²) travel as EXACT int64 partials through the
    map-side-combined exchange, the driver forms
    r = (n·Σxy − ΣxΣy) / sqrt((n·Σx² − Σx²)(n·Σy² − Σy²)) in arbitrary-
    precision Python ints, and only the final division happens in float64 —
    an SQL engine computing the same formula over HUGEINT sums produces the
    bit-identical double.  Inputs must be integer-canonicalized (cents) and
    small enough that per-row x·y fits int64 (checked multiplies); the
    x·y/x²/y² partials travel as exact hi/lo 32-bit splits so the grouped
    SUMS cannot wrap either (see ``_split64``), and the n·Σ products that
    would overflow int64 are driver-side Python ints.  Returns O(groups)
    rows; null r for degenerate (zero-variance or n<2) groups."""
    import math

    def add_products(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(x_col), pa.int64())
        y = pc.cast(b.column(y_col), pa.int64())
        cols = {key_col: b.column(key_col), "_x": x, "_y": y}
        for name, prod in (("_xy", pc.multiply_checked(x, y)),
                           ("_xx", pc.multiply_checked(x, x)),
                           ("_yy", pc.multiply_checked(y, y))):
            cols[name + "_hi"], cols[name + "_lo"] = _split64(prod)
        return pa.Table.from_pydict(cols)

    wide = {f"_{p}_{h}": f"s{p}_{h}"
            for p in ("xy", "xx", "yy") for h in ("hi", "lo")}
    sums = partial_grouped_agg(
        ds.select_columns([key_col, x_col, y_col]).map_batches(
            add_products, batch_format="pyarrow"
        ),
        [key_col],
        sums={"_x": "sx", "_y": "sy", **wide},
        count_alias="n",
    ).take_all()
    keys, vals = [], []
    for r in sorted(sums, key=lambda r: r[key_col]):
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        num = n * _joined64(r, "sxy") - sx * sy
        dx = n * _joined64(r, "sxx") - sx * sx
        dy = n * _joined64(r, "syy") - sy * sy
        keys.append(r[key_col])
        if n < 2 or dx == 0 or dy == 0:
            vals.append(None)
        else:
            vals.append(float(num) / math.sqrt(float(dx) * float(dy)))
    return pa.Table.from_pydict(
        {key_col: pa.array(keys), out_col: pa.array(vals, pa.float64())}
    )


def grouped_ols(
    ds: rd.Dataset,
    *,
    key_col: str,
    x_col: str,
    y_col: str,
) -> pa.Table:
    """Per-key simple linear regression (OLS y = a·x + b) with
    REPRODUCIBLE float output — ``grouped_corr``'s recipe: the five
    distributive sums (n, Σx, Σy, Σxy, Σx²) travel as EXACT int64
    partials (products as hi/lo 32-bit splits so grouped sums cannot
    wrap), the driver forms

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
        intercept = (Σy·den − num·Σx) / (n·den)

    in arbitrary-precision Python ints, and each value needs exactly ONE
    float division of two exact integers — an SQL engine computing the
    same HUGEINT expressions yields the bit-identical doubles.  Inputs
    must be integer-canonicalized (cents).  Returns O(groups) rows
    (key, n, slope, intercept); nulls for degenerate (n<2 or zero-x-
    variance) groups."""
    def add_products(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(x_col), pa.int64())
        y = pc.cast(b.column(y_col), pa.int64())
        cols = {key_col: b.column(key_col), "_x": x, "_y": y}
        for name, prod in (("_xy", pc.multiply_checked(x, y)),
                           ("_xx", pc.multiply_checked(x, x))):
            cols[name + "_hi"], cols[name + "_lo"] = _split64(prod)
        return pa.Table.from_pydict(cols)

    wide = {f"_{p}_{h}": f"s{p}_{h}"
            for p in ("xy", "xx") for h in ("hi", "lo")}
    sums = partial_grouped_agg(
        ds.select_columns([key_col, x_col, y_col]).map_batches(
            add_products, batch_format="pyarrow"
        ),
        [key_col],
        sums={"_x": "sx", "_y": "sy", **wide},
        count_alias="n",
    ).take_all()
    keys, ns, slopes, icepts = [], [], [], []
    for r in sorted(sums, key=lambda r: r[key_col]):
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        num = n * _joined64(r, "sxy") - sx * sy
        den = n * _joined64(r, "sxx") - sx * sx
        keys.append(r[key_col])
        ns.append(n)
        if n < 2 or den == 0:
            slopes.append(None)
            icepts.append(None)
        else:
            slopes.append(float(num) / float(den))
            icepts.append(float(sy * den - num * sx) / float(n * den))
    return pa.Table.from_pydict({
        key_col: pa.array(keys),
        "n": pa.array(ns, pa.int64()),
        "slope": pa.array(slopes, pa.float64()),
        "intercept": pa.array(icepts, pa.float64()),
    })


def grouped_zscore(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "z",
) -> rd.Dataset:
    """Per-row z-score within its group — (id, z) with
    z = (x − mean) / stddev_samp, the feature-standardization staple —
    with REPRODUCIBLE float output.

    Same exactness recipe as ``grouped_corr``: the distributive sums
    (n, Σx, Σx²) travel as EXACT int64 partials through the
    map-side-combined exchange; each group's scale factor
    f = sqrt(n(n−1)) / (n·sqrt(n·Σx² − (Σx)²)) forms once from
    arbitrary-precision Python ints (floats only at the final sqrt /
    divide), and every row pays ONE exact int64 subtraction (n·x − Σx,
    never past 2^53 for cents-sized inputs) and ONE float multiply —
    z = (n·x − Σx)·f, algebraically (x − mean)/std but with a float
    expression tree an SQL engine reproduces bit-for-bit from HUGEINT
    sums.  Output floors to 1e-6 cells.  Degenerate groups (n<2 or zero
    variance) yield null.

    Scale shape: one map-side-combined groupby (O(groups × blocks)
    exchange), one broadcast join of the O(groups) factor table back onto
    the stream, one vectorized map — the corpus never shuffles."""
    import math

    from ..functions.joins import lookup_join

    def add_square(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(value_col), pa.int64())
        hi, lo = _split64(pc.multiply_checked(x, x))
        return pa.Table.from_pydict(
            {key_col: b.column(key_col), "_x": x,
             "_xx_hi": hi, "_xx_lo": lo}
        )

    sums = partial_grouped_agg(
        ds.select_columns([key_col, value_col]).map_batches(
            add_square, batch_format="pyarrow"
        ),
        [key_col],
        sums={"_x": "s1", "_xx_hi": "s2_hi", "_xx_lo": "s2_lo"},
        count_alias="n",
    ).take_all()

    keys, ns, s1s, fs = [], [], [], []
    for r in sums:
        n, s1, s2 = int(r["n"]), int(r["s1"]), _joined64(r, "s2")
        d = n * s2 - s1 * s1
        keys.append(r[key_col])
        ns.append(n)
        s1s.append(s1)
        fs.append(
            math.sqrt(n * (n - 1.0)) / (n * math.sqrt(float(d)))
            if n >= 2 and d > 0 else None
        )
    factors = pa.Table.from_pydict({
        key_col: pa.array(keys),
        "_n": pa.array(ns, pa.int64()),
        "_s1": pa.array(s1s, pa.int64()),
        "_f": pa.array(fs, pa.float64()),
    })

    joined = lookup_join(
        ds.select_columns([id_col, key_col, value_col]), factors,
        left_keys=[key_col], how="inner",
    )

    def zmap(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(value_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = b.column("_n").to_numpy(zero_copy_only=False)
        s1 = b.column("_s1").to_numpy(zero_copy_only=False)
        f = b.column("_f").to_numpy(zero_copy_only=False)  # NaN where null
        z = (n * x - s1).astype(np.float64) * f
        z = np.floor(z * 1e6) / 1e6
        return pa.Table.from_pydict({
            id_col: b.column(id_col),
            out_col: pa.array(z, pa.float64(), from_pandas=True),
        })

    return joined.map_batches(zmap, batch_format="pyarrow")


def grouped_skewness(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    out_col: str = "skew_r",
) -> pa.Table:
    """Per-key population skewness g1 = m3 / m2^(3/2) with REPRODUCIBLE
    float output — the third member of the exact-moments family
    (``grouped_corr``, ``grouped_zscore``).

    The distributive power sums (n, Σx, Σx², Σx³) travel as EXACT int64
    partials through the map-side-combined exchange; the driver forms the
    integer-exact numerators  A = n²Σx³ − 3nΣxΣx² + 2(Σx)³  and
    B = nΣx² − (Σx)²  in arbitrary-precision Python ints (g1 = A / (B·√B)
    algebraically — the n³ denominators cancel), converts each ONCE to
    float64 and
    finishes with sqrt/multiply/divide only — sqrt and the ring ops are
    IEEE-correctly-rounded, so an SQL engine evaluating the mirrored
    HUGEINT expression produces the bit-identical double (pow() is
    deliberately avoided: libm pow is NOT cross-engine deterministic).
    Floored to 1e-8 cells.  Inputs must be integer-canonicalized (cents)
    and small enough that per-row x³ fits int64 (|x| ≤ ~2 × 10⁶, enforced
    by checked multiplies); the x²/x³ partials travel as exact hi/lo
    32-bit splits so the grouped SUMS cannot wrap either (safe to ~2×10⁹
    rows per group — see ``_split64``).  Null for degenerate groups
    (n < 2 or zero variance)."""
    import math

    def add_powers(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(value_col), pa.int64())
        xx = pc.multiply_checked(x, x)
        cols = {key_col: b.column(key_col), "_x": x}
        cols["_xx_hi"], cols["_xx_lo"] = _split64(xx)
        cols["_xxx_hi"], cols["_xxx_lo"] = _split64(
            pc.multiply_checked(xx, x)
        )
        return pa.Table.from_pydict(cols)

    sums = partial_grouped_agg(
        ds.select_columns([key_col, value_col]).map_batches(
            add_powers, batch_format="pyarrow"
        ),
        [key_col],
        sums={"_xx_hi": "s2_hi", "_xx_lo": "s2_lo",
              "_xxx_hi": "s3_hi", "_xxx_lo": "s3_lo", "_x": "s1"},
        count_alias="n",
    ).take_all()
    keys, vals = [], []
    for r in sorted(sums, key=lambda r: r[key_col]):
        n, s1 = int(r["n"]), int(r["s1"])
        s2, s3 = _joined64(r, "s2"), _joined64(r, "s3")
        a = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        b = n * s2 - s1 * s1
        keys.append(r[key_col])
        if n < 2 or b <= 0:
            vals.append(None)
        else:
            g1 = float(a) / (float(b) * math.sqrt(float(b)))
            vals.append(math.floor(g1 * 1e8) / 1e8)
    return pa.Table.from_pydict(
        {key_col: pa.array(keys), out_col: pa.array(vals, pa.float64())}
    )


def grouped_iqr_outliers(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    out_col: str = "n_outliers",
) -> rd.Dataset:
    """Per-key Tukey-fence outlier counts → (key, out_col): a row is an
    outlier iff v < Q1 − 1.5·IQR or v > Q3 + 1.5·IQR, with Q1/Q3 the exact
    discrete quartiles (``grouped_quantile`` / quantile_disc positioning).
    The fence compare runs in EXACT integers (2v vs 2·Q1 − 3·IQR), so no
    float boundary row can diverge from the SQL mirror.

    Scale shape: two exact-quantile passes produce O(keys) rows; the fences
    broadcast back onto the stream (lookup join — the corpus never
    shuffles for the compare); outlier counts are map-side-combined.  Keys
    whose values are all NULL get NULL fences → zero outliers, matching
    SQL comparison semantics."""
    from ..functions.joins import _dataset_to_table, adaptive_join, lookup_join

    fences = _dataset_to_table(
        grouped_quantile_multi(
            ds, key_col=key_col, value_col=value_col,
            qs=[(1, 4), (3, 4)], out_cols=["_q1", "_q3"],
        )
    ).combine_chunks()
    q1v = fences.column("_q1")
    q3v = fences.column("_q3")
    iqr = pc.subtract(q3v, q1v)
    fences = (
        fences.append_column(
            "_lo2",
            pc.subtract(pc.multiply(q1v, pa.scalar(2, pa.int64())),
                        pc.multiply(iqr, pa.scalar(3, pa.int64()))),
        )
        .append_column(
            "_hi2",
            pc.add(pc.multiply(q3v, pa.scalar(2, pa.int64())),
                   pc.multiply(iqr, pa.scalar(3, pa.int64()))),
        )
        .drop_columns(["_q1", "_q3"])
    )

    tagged = lookup_join(ds, fences, left_keys=[key_col])

    def outlier_rows(b: pa.Table) -> pa.Table:
        v2 = pc.multiply(
            pc.cast(b.column(value_col), pa.int64()), pa.scalar(2, pa.int64())
        )
        is_out = pc.or_kleene(
            pc.less(v2, b.column("_lo2")), pc.greater(v2, b.column("_hi2"))
        )
        keep = pc.fill_null(is_out, False)
        return b.filter(keep).select([key_col])

    counts = partial_grouped_agg(
        tagged.map_batches(outlier_rows, batch_format="pyarrow"),
        [key_col],
        count_alias=out_col,
    )
    keys_only = rd.from_arrow(fences.select([key_col]))
    joined = adaptive_join(keys_only, counts, left_keys=[key_col], how="left")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b.column(key_col),
            out_col: pc.fill_null(pc.cast(b.column(out_col), pa.int64()), 0),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def melt(
    ds: rd.Dataset,
    *,
    id_cols: list[str],
    value_cols: list[str],
    var_col: str = "variable",
    value_col: str = "value",
) -> rd.Dataset:
    """UNPIVOT / melt: wide → long, one output row per (input row ×
    value column) → (id_cols…, var_col, value_col).

    Pure streaming map — per block one column-slice + concat per MEASURE
    (len(value_cols) kernel calls, never per row); the measure-name column
    is a dictionary array (one shared string per block) cast once.  Rows
    never shuffle; at 100 TB the long output writes partitioned by input
    shard like every exploded table here.  Measure columns must share one
    type (the long column's type — cast upstream)."""

    def per_block(b: pa.Table) -> pa.Table:
        n = b.num_rows
        parts = []
        for c in value_cols:
            name = pc.cast(
                pa.DictionaryArray.from_arrays(
                    pa.array(np.zeros(n, np.int32)), pa.array([c])
                ),
                pa.string(),
            )
            parts.append(
                b.select(id_cols)
                .append_column(var_col, name)
                .append_column(value_col, b.column(c))
            )
        return pa.concat_tables(parts)

    return ds.map_batches(per_block, batch_format="pyarrow")


def grouped_weighted_median(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    weight_col: str,
    out_col: str = "wmedian",
) -> rd.Dataset:
    """Per-key exact LOWER weighted median: the smallest v with
    2·cumW(≤v) ≥ totalW (integer weights, compared in exact ints — at
    equal total halves the lower value wins, the discrete-median
    convention everywhere in this repo).

    Scale shape: weights first collapse to O(distinct (key, value)) rows
    via `partial_grouped_agg` (map-side combine — raw rows never reach the
    exchange); the hash map/reduce exchange then colocates each key's
    DISTINCT values only, and one vectorized run scan per reduce partition
    (in-block sort by (run, v), cumsum with per-run offsets, reduceat
    totals, min-position pick) selects the median.  A key with a billion
    rows but few distinct values costs O(distinct) in the exchange."""
    from .canonicalize import grouped_apply

    base = ds.select_columns([key_col, value_col, weight_col])

    def drop_null(b: pa.Table) -> pa.Table:
        keep = pc.and_kleene(
            pc.is_valid(b.column(value_col)), pc.is_valid(b.column(weight_col))
        )
        return b.filter(keep)

    pairs = partial_grouped_agg(
        base.map_batches(drop_null, batch_format="pyarrow"),
        [key_col, value_col],
        sums={weight_col: "_w"},
    )

    ktype = pa.schema(
        [(f.name, f.type)
         for f in ds.schema(fetch_if_missing=True).base_schema]
    ).field(key_col).type
    out_schema = pa.schema([(key_col, ktype), (out_col, pa.int64())])

    def pick_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        block = block.append_column("_run", pa.array(run_id, pa.int64()))
        block = block.sort_by([("_run", "ascending"),
                               (value_col, "ascending")])
        v = pc.cast(block.column(value_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        w = pc.cast(block.column("_w"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cw = np.cumsum(w)
        lens = np.diff(np.r_[starts, n])
        run_off = np.repeat(cw[starts] - w[starts], lens)
        cw = cw - run_off
        tw = np.add.reduceat(w, starts)
        ok = 2 * cw >= np.repeat(tw, lens)
        pos = np.where(ok, np.arange(n, dtype=np.int64), np.iinfo(np.int64).max)
        first = np.minimum.reduceat(pos, starts)
        keys = block.column(key_col).take(pa.array(starts, pa.int64()))
        return pa.Table.from_pydict(
            {key_col: pc.cast(keys, ktype),
             out_col: pa.array(v[first], pa.int64())},
            schema=out_schema,
        )

    return grouped_apply(
        pairs, [key_col], None, out_schema,
        hash_sort=True, block_fn=pick_block, exchange="hash",
    )


def grouped_mad(
    ds: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    out_col: str = "mad",
) -> rd.Dataset:
    """Per-key Median Absolute Deviation (the robust dispersion measure):
    MAD = median(|v − median(v)|), both medians the exact DISCRETE lower
    median (quantile_disc 0.5 positioning) over integer values, so every
    step is exact-integer and order-independent.

    Two exact-quantile passes: per-key medians (O(keys) rows) broadcast
    back onto the stream (lookup join — no shuffle for the deviation map),
    then one more grouped quantile over |v − med|.  Null values are
    ignored; all-null keys yield a NULL mad."""
    from ..functions.joins import _dataset_to_table, lookup_join

    med = _dataset_to_table(
        grouped_quantile(ds, key_col=key_col, value_col=value_col,
                         q_num=1, q_den=2, out_col="_med")
    )
    tagged = lookup_join(ds, med, left_keys=[key_col])

    def absdev(b: pa.Table) -> pa.Table:
        d = pc.abs_checked(
            pc.subtract_checked(
                pc.cast(b.column(value_col), pa.int64()), b.column("_med")
            )
        )
        return pa.table({key_col: b.column(key_col), "_ad": d})

    devs = tagged.map_batches(absdev, batch_format="pyarrow")
    return grouped_quantile(
        devs, key_col=key_col, value_col="_ad", q_num=1, q_den=2,
        out_col=out_col,
    )


def cooccurrence_pairs(
    ds: rd.Dataset,
    *,
    group_col: str,
    item_col: str,
    out_a: str = "item_a",
    out_b: str = "item_b",
    count_col: str = "n",
    max_items_per_group: "int | None" = 1024,
    num_partitions: int = 64,
) -> rd.Dataset:
    """Within-group distinct-item pair counts (market-basket / co-visitation
    co-occurrence) — the edge-weight build of a co-occurrence graph.

    For every group (order, session, user) emit each unordered pair of
    DISTINCT items it contains (``out_a < out_b``) and count each pair's
    occurrences across groups.  Scale shape: one hash exchange colocates a
    group's rows (grouped_apply ``exchange="hash"``), in-group dedup and
    pair emission are fully vectorized (the triangular-inversion kernel the
    triangle counter's wedge emission uses, graph_query.py::pairs), and the
    counts flow through map-side-combined integer partials
    (``partial_grouped_agg``).  Returns the unsorted (out_a, out_b, n)
    Dataset; callers order/limit.

    Hot-key guard: a group larger than ``max_items_per_group`` contributes
    pairs only among its FIRST cap items in item order (the LSH
    ``max_bucket`` precedent) — quadratic blowup is bounded at cap² per
    group instead of unbounded.  Pass ``max_items_per_group=None`` for
    exact uncapped semantics (what the oracle-backed consumers do — their
    SQL self-join oracles are uncapped, so a silently truncated hot group
    would diverge with no signal).  Items must be non-null.
    """
    from .canonicalize import grouped_apply

    item_type = ds.schema().base_schema.field(item_col).type
    pair_schema = pa.schema([
        pa.field(out_a, item_type), pa.field(out_b, item_type)
    ])
    cap = None if max_items_per_group is None else int(max_items_per_group)

    def pair_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        iv = block.column(item_col).to_numpy(zero_copy_only=False)
        keep = np.ones(n, bool)
        keep[1:] = (iv[1:] != iv[:-1]) | (run_id[1:] != run_id[:-1])
        iv = iv[keep]
        run_id = run_id[keep]
        m = iv.size
        if m == 0:
            return pair_schema.empty_table()
        g_starts = np.flatnonzero(np.r_[True, run_id[1:] != run_id[:-1]])
        lens = np.diff(np.r_[g_starts, m])
        if cap is not None:
            lens = np.minimum(lens, cap)
        npair = lens * (lens - 1) // 2
        total = int(npair.sum())
        if total == 0:
            return pair_schema.empty_table()
        pair_off = np.r_[0, np.cumsum(npair)]
        k = np.arange(total, dtype=np.int64)
        r = np.searchsorted(pair_off, k, side="right") - 1
        kl = k - pair_off[r]
        # triangular inversion: j = largest with j(j-1)/2 <= kl, i < j
        j = ((1.0 + np.sqrt(1.0 + 8.0 * kl.astype(np.float64))) / 2.0).astype(
            np.int64
        )
        j -= (j * (j - 1) // 2 > kl)
        j += ((j + 1) * j // 2 <= kl)
        i = kl - j * (j - 1) // 2
        base = g_starts[r]
        # iv is sorted within each run (order_col below), so i < j means
        # iv[base+i] < iv[base+j]: the a<b canonical pair order is free
        return pa.Table.from_arrays(
            [pa.array(iv[base + i]).cast(item_type),
             pa.array(iv[base + j]).cast(item_type)],
            schema=pair_schema,
        )

    pairs = grouped_apply(
        ds.select_columns([group_col, item_col]),
        [group_col], None, pair_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=pair_block, order_col=item_col, exchange="hash",
    )
    return partial_grouped_agg(pairs, [out_a, out_b], count_alias=count_col)


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier)
# ---------------------------------------------------------------------------


def _skyline_filter(t: pa.Table, min_col: str, max_col: str) -> pa.Table:
    """Rows of ``t`` not dominated under (min_col ↓, max_col ↑), original
    order preserved.  One C sort + segmented prefix-max: sort by
    (min asc, max asc); a row survives iff its max equals its min-value
    group's max (the group's LAST element in sort order) AND that group
    max strictly exceeds the running max of every strictly-smaller min
    group (equal (min, max) duplicates are mutually non-dominating and
    all kept).  All comparisons stay in max_col's NATIVE dtype — a
    float64 cast would lose precision for int64 above 2^53 and could
    flip dominance on equal/greater comparisons."""
    if t.num_rows == 0:
        return t
    t = t.combine_chunks()
    mn = t.column(min_col).to_numpy(zero_copy_only=False)
    mx = t.column(max_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((mx, mn))
    smn, smx = mn[order], mx[order]
    gstart = np.r_[True, smn[1:] != smn[:-1]]
    gid = np.cumsum(gstart) - 1
    gend = np.r_[np.flatnonzero(gstart[1:]), smn.size - 1]
    gmax = smx[gend]  # groups sorted max-ascending: last element is the max
    run = np.maximum.accumulate(gmax)
    ok = np.r_[True, gmax[1:] > run[:-1]]
    keep = (smx == gmax[gid]) & ok[gid]
    return t.take(pa.array(np.sort(order[keep]), pa.int64()))


def skyline_2d(
    ds: rd.Dataset,
    *,
    min_col: str,
    max_col: str,
    id_cols: "list[str] | None" = None,
) -> rd.Dataset:
    """2-D skyline (Pareto frontier): rows not dominated under
    (``min_col`` lower-is-better, ``max_col`` higher-is-better) — the
    multi-objective selection rule of data curation (the best-quality
    document at every length budget).  x dominates r iff x.min ≤ r.min
    AND x.max ≥ r.max with at least one strict; fully-equal rows are
    mutually non-dominating and ALL kept (SQL NOT-EXISTS dominance
    semantics, the oracle shape).

    Distributed shape: per-block LOCAL skyline (any dominator of a row is
    itself undominated within its own block after transitive chasing, so
    the union of block skylines contains every global survivor), then ONE
    zero-CPU combine task re-applies the same filter to the union.  Only
    skyline candidates ever leave a block — a 2-D skyline is bounded by
    the distinct min-value count and is tiny on real data, so the combine
    never materializes the input."""
    import ray

    cols = list(dict.fromkeys((id_cols or []) + [min_col, max_col]))
    mat = ds.select_columns(cols).map_batches(
        lambda b: _skyline_filter(b, min_col, max_col),
        batch_format="pyarrow",
    ).materialize()
    sch = pa.schema(
        [(f.name, f.type) for f in mat.schema(fetch_if_missing=True).base_schema]
    )

    @ray.remote(num_cpus=0)
    def combine(refs: list) -> pa.Table:
        ts = [t for t in ray.get(refs) if t.num_rows]  # degenerate-schema guard
        if not ts:
            return sch.empty_table()
        return _skyline_filter(
            pa.concat_tables(ts).combine_chunks(), min_col, max_col
        )

    return rd.from_arrow_refs([combine.remote(list(mat.to_arrow_refs()))])

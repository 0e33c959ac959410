"""Deterministic sampling operators for training-data pipelines.

A 100-TB corpus is sampled constantly — eval holdouts, ablation subsets,
per-source quotas. Random sampling is not reproducible across runs/block
layouts; these operators sample by a *hash of the row id*, so the same row
set is selected at any parallelism, any block layout, any engine (the DuckDB
oracle expresses the identical predicate over md5).

* ``sample_uniform``  — keep rows whose id-hash bucket < fraction·buckets.
* ``sample_stratified`` — same predicate with the group column mixed into the
  hash, giving an (approximately) equal fraction *within every group* while
  remaining a pure per-row filter: no shuffle, no groupby, no state.

Two hash methods:

* ``md5``  (default) — bucket = first 16 hex chars of md5(str(id)) mod
  buckets. Matches DuckDB ``md5()`` exactly (the oracle), at per-row hashlib
  cost — fine for the correctness gate and for id-cardinality ≪ data bytes.
* ``fast`` — the engine's vectorized mix64 over the int64 id (one numpy pass
  per batch, no Python loop). Same determinism guarantees, not
  SQL-expressible; the 100-TB path.

Both are filters inside ``map_batches`` — streaming, zero shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.hashing import mix64

_BUCKETS = 1_000_000


def _md5_bucket(ids: list, salt: str = "") -> np.ndarray:
    """First 8 bytes of md5(salt + str(id)) as uint64 mod _BUCKETS —
    bit-identical to DuckDB:
    CAST(CONCAT('0x', substr(md5(<salt> || CAST(id AS VARCHAR)), 1, 16)) AS UBIGINT)
    % 1000000."""
    out = np.empty(len(ids), dtype=np.uint64)
    for i, v in enumerate(ids):
        h = hashlib.md5((salt + str(v)).encode()).hexdigest()[:16]
        out[i] = int(h, 16)
    return out % np.uint64(_BUCKETS)


def _fast_bucket(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    return mix64(ids.astype(np.uint64) ^ np.uint64(salt)) % np.uint64(_BUCKETS)


def _bucket_column(
    batch: pa.Table, id_col: str, method: str, salt: str | int
) -> np.ndarray:
    col = batch.column(id_col)
    if method == "md5":
        return _md5_bucket(col.to_pylist(), str(salt) if salt else "")
    ids = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
    return _fast_bucket(ids, int(salt) if salt else 0)


def sample_uniform(
    ds: rd.Dataset,
    fraction: float,
    *,
    id_col: str = "doc_id",
    method: str = "md5",
    salt: str | int = "",
) -> rd.Dataset:
    """Deterministic ~fraction sample: keep rows with hash-bucket(id) <
    fraction·1e6. Pure streaming filter — no shuffle, reproducible under any
    block layout or cluster size."""
    cut = int(fraction * _BUCKETS)

    def flt(batch: pa.Table) -> pa.Table:
        b = _bucket_column(batch, id_col, method, salt)
        return batch.filter(pa.array(b < cut))

    return ds.map_batches(flt, batch_format="pyarrow")


def sample_stratified(
    ds: rd.Dataset,
    fraction: float,
    *,
    group_col: str,
    id_col: str = "doc_id",
    method: str = "md5",
) -> rd.Dataset:
    """~fraction of every group, deterministically: the group value is the
    hash salt, so selection within one group is independent of every other
    group while staying a per-row filter (no groupby/shuffle; exact-count
    per-group sampling would need one)."""
    cut = int(fraction * _BUCKETS)

    def flt(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        col = batch.column(id_col)
        if method == "md5":
            ids = col.to_pylist()
            b = np.empty(len(ids), dtype=np.uint64)
            for i, (g, v) in enumerate(zip(groups, ids)):
                h = hashlib.md5((str(g) + "|" + str(v)).encode()).hexdigest()[:16]
                b[i] = int(h, 16)
            b %= np.uint64(_BUCKETS)
        else:
            # per-distinct-group salt from md5 (stable across processes —
            # never builtins.hash), vectorized mix64 over the int ids
            ids = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
            salts: dict = {}
            for g in groups:
                if g not in salts:
                    salts[g] = int(hashlib.md5(str(g).encode()).hexdigest()[:16], 16)
            gh = np.fromiter((salts[g] for g in groups), dtype=np.uint64,
                             count=len(groups))
            b = mix64(ids.astype(np.uint64) ^ gh) % np.uint64(_BUCKETS)
        return batch.filter(pa.array(b < cut))

    return ds.map_batches(flt, batch_format="pyarrow")


def sample_weighted(
    ds: rd.Dataset,
    *,
    weight_col: str,
    scale_num: int = 1,
    scale_den: int = 1,
    id_col: str = "doc_id",
    method: str = "md5",
    salt: str | int = "",
) -> rd.Dataset:
    """Weighted Bernoulli sample: keep a row with probability
    ``min(1, weight·scale_num/scale_den)`` — the training-data mixing
    primitive (sample ∝ length, ∝ quality, ∝ source weight) in the same
    deterministic-hash form as the uniform/stratified samplers: the
    id-hash bucket is the "coin", the per-row weight sets the cutoff, so
    the selected row set is reproducible at any parallelism / block layout
    and expressible as one SQL predicate (the oracle).  The scale is
    RATIONAL and the cutoff's float expression tree is exactly
    ``min((w·num)/den, 1.0)·1e6`` — a pre-folded float scale (``w·(1/den)``)
    rounds differently than the SQL mirror's ``w/den`` on boundary rows and
    flips their selection.  Pure streaming filter — no shuffle, no state."""
    num, den = float(scale_num), float(scale_den)

    def flt(batch: pa.Table) -> pa.Table:
        b = _bucket_column(batch, id_col, method, salt).astype(np.float64)
        w = pc.cast(batch.column(weight_col), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        cut = np.minimum((w * num) / den, 1.0) * _BUCKETS
        return batch.filter(pa.array(b < cut))

    return ds.map_batches(flt, batch_format="pyarrow")


def sample_stratified_exact(
    ds: rd.Dataset,
    frac_num: int,
    frac_den: int,
    *,
    group_col: str,
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> rd.Dataset:
    """EXACTLY ceil(n·frac) rows per group — the exact-count stratified
    sampler ``sample_stratified``'s docstring says needs a groupby; this is
    that groupby, done right: each row carries its full md5 id-hash as the
    deterministic "random" key, the hash map/reduce exchange colocates each
    group, and one in-block C sort (run, hash, id) + grouped-arange keeps
    each run's first ceil(num·n/den) rows.  The fraction is RATIONAL so
    the count is exact integer arithmetic; selection order (hash, id) is
    the predicate an SQL row_number window reproduces bit-for-bit."""
    from .canonicalize import grouped_apply

    schema = ds.schema(fetch_if_missing=True)
    out_schema = pa.schema([(f.name, f.type) for f in schema.base_schema])

    def add_hash(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        h = np.empty(len(ids), np.uint64)
        for i, v in enumerate(ids):
            h[i] = int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
        return b.append_column("_h", pa.array(h, pa.uint64()))

    def keep_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        block = block.append_column("_run", pa.array(run_id, pa.int64()))
        block = block.sort_by([("_run", "ascending"), ("_h", "ascending"),
                               (id_col, "ascending")])
        lens = np.diff(np.r_[starts, n])
        k = (lens * frac_num + frac_den - 1) // frac_den
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        keep = np.flatnonzero(pos < np.repeat(k, lens))
        return (
            block.take(pa.array(keep, pa.int64()))
            .select(out_schema.names)
        )

    withh = ds.map_batches(add_hash, batch_format="pyarrow")
    return grouped_apply(
        withh, [group_col], None, out_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=keep_block, exchange="hash",
    )


def assign_split(
    ds: rd.Dataset,
    splits: list[tuple[str, int]],
    *,
    id_col: str = "doc_id",
    method: str = "md5",
    salt: str | int = "",
) -> rd.Dataset:
    """Deterministic train/val/test split assignment — the partitioning
    every training pipeline runs once and must NEVER change across reruns:
    each row's id-hash bucket lands in one of the named weight ranges
    (weights are integer PERCENT-style shares of ``_BUCKETS``), appended
    as a ``split`` column.  Same id-hash machinery as the samplers, so the
    assignment is a pure streaming map (no shuffle, no state), identical
    at any parallelism / block layout, and expressible as one SQL CASE
    over md5 (the oracle).  A row's split depends only on its id and the
    CUMULATIVE weights before it — appending a new split at the END never
    reassigns existing rows of earlier splits."""
    total = sum(w for _, w in splits)
    if total <= 0 or any(w < 0 for _, w in splits):
        raise ValueError("split weights must be non-negative with a positive sum")
    # cumulative bucket cutoffs in exact integer arithmetic
    cuts, acc = [], 0
    for _, w in splits:
        acc += w
        cuts.append(acc * _BUCKETS // total)
    names = [n for n, _ in splits]

    def flt(batch: pa.Table) -> pa.Table:
        b = _bucket_column(batch, id_col, method, salt)
        lab = np.empty(len(b), dtype=object)
        lo = 0
        for name, hi in zip(names, cuts):
            lab[(b >= lo) & (b < hi)] = name
            lo = hi
        return batch.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(flt, batch_format="pyarrow")

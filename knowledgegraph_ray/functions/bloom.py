"""Distributed Bloom-filter build + membership prefilter.

The 100-TB semi-join pattern: when the probe-key set is too large to
broadcast as an exact index (``distinct_keys`` → ``lookup_join``) but the
big side still needs pruning BEFORE the shuffle, a Bloom filter compresses
the key set to a few bits per key (12 bits/key, k=7 → ~0.8% false-positive
rate) and ships once through the object store.  The filter admits false
positives but NEVER false negatives, so a bloom prefilter composed with an
exact join downstream is exact — the bloom only shrinks the rows that pay
for the exchange.

Build shape mirrors the HLL tree (stages/aggregates.py): each block sets
bits in a LOCAL bitmap (one vectorized double-hashing pass, no per-row
Python), partials OR-merge through a fan-in tree of zero-CPU tasks, and the
finished bitmap lives in plasma — every filter task reads it zero-copy via
the module-level worker cache (cloudpickle copies plain globals by value,
so the cache MUST be reached through the module import; see
functions/joins.py).

Sizing: ``m = 2^ceil(log2(bits_per_row × rows))`` capped at ``max_bits``.
Per-block bitmap partials are O(m/8) bytes each; past ~16 MB bitmaps the
position-list build (emit k×rows uint64 positions, OR once per tree leaf)
would be leaner — documented, not needed at the tested scales.

Reference parity note: the reference engine has no bloom stage (its joins
run in-database); this operator is part of the LLM-data-pipeline set the
engine adds for web-scale corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .hashing import hash2_key_columns, hash_key_columns

# Worker-process cache of resolved bloom bitmaps keyed by ref hex — reused
# across map tasks in the same worker, zero-copy views of plasma.
_BLOOM_CACHE: dict[str, tuple[np.ndarray, int, int]] = {}


def _bloom_geometry(n_rows: int, bits_per_row: int, max_bits: int) -> int:
    m = 64
    target = max(64, bits_per_row * max(1, n_rows))
    while m < target and m < max_bits:
        m <<= 1
    return m


def _set_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, m: int):
    """Double hashing (Kirsch–Mitzenmacher): pos_i = (h1 + i·h2) mod m."""
    mask = np.uint64(m - 1)
    h2 = h2 | np.uint64(1)  # odd stride → full-period mod power-of-two m
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(
            bits, (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)),
        )


def _test_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    mask = np.uint64(m - 1)
    h2 = h2 | np.uint64(1)
    ok = np.ones(len(h1), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) & mask
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
        ok &= (byte & bit) != 0
        if not ok.any():
            break
    return ok


@ray.remote(num_cpus=0)
def _or_merge(*parts):
    """Fan-in OR of bitmap partials; zero-CPU so the tree never queues
    behind the map tasks that feed it (same rationale as joins._build_*)."""
    out = None
    for p in parts:
        a = p if isinstance(p, np.ndarray) else ray.get(p)
        out = a.copy() if out is None else np.bitwise_or(out, a, out=out)
    return out


def build_bloom(
    ds: rd.Dataset,
    keys: list[str],
    *,
    bits_per_row: int = 12,
    k: int = 7,
    max_bits: int = 1 << 33,
    fanin: int = 8,
) -> tuple["ray.ObjectRef", int, int]:
    """Build a Bloom filter over ``keys`` of ``ds``.

    Returns ``(bitmap_ref, m, k)`` — the bitmap stays in plasma; the driver
    never holds the bytes.  ``bits_per_row`` is sized from the ROW count
    (an upper bound on distinct keys, known free from parquet metadata), so
    the realized false-positive rate is at or below the nominal one.
    """
    n_rows = ds.count()
    m = _bloom_geometry(n_rows, bits_per_row, max_bits)

    def per_block(b: pa.Table) -> pa.Table:
        bits = np.zeros(m >> 3, dtype=np.uint8)
        if b.num_rows:
            h1 = hash_key_columns(b, keys)
            h2 = hash2_key_columns(b, keys)
            _set_bits(bits, h1, h2, k, m)
        # one single-row binary payload per block; Arrow envelope so the
        # partial rides the normal block path
        return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    partials = ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()

    @ray.remote(num_cpus=0)
    def leaf(ref) -> np.ndarray:
        t = ray.get(ref) if not isinstance(ref, pa.Table) else ref
        out = np.zeros(m >> 3, dtype=np.uint8)
        for row in range(t.num_rows):
            buf = np.frombuffer(t.column("bits")[row].as_py(), dtype=np.uint8)
            np.bitwise_or(out, buf, out=out)
        return out

    level = [leaf.remote(r) for r in partials.to_arrow_refs()]
    if not level:
        empty = np.zeros(m >> 3, dtype=np.uint8)
        return ray.put(empty), m, k
    while len(level) > 1:
        level = [
            _or_merge.remote(*level[i : i + fanin])
            for i in range(0, len(level), fanin)
        ]
    return level[0], m, k


def _resolve_bloom(bloom_ref, m: int, k: int) -> tuple[np.ndarray, int, int]:
    key = bloom_ref.hex()
    hit = _BLOOM_CACHE.get(key)
    if hit is None:
        hit = (ray.get(bloom_ref), m, k)
        _BLOOM_CACHE[key] = hit
    return hit


def bloom_filter_dataset(
    ds: rd.Dataset,
    keys: list[str],
    bloom: tuple["ray.ObjectRef", int, int],
) -> rd.Dataset:
    """Keep rows whose key MAY be in the bloom (never drops a true match).

    Pure streaming map — no shuffle, no materialization; the bitmap is one
    zero-copy plasma read per worker process.
    """
    bloom_ref, m, k = bloom

    def prefilter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        bits, mm, kk = _resolve_bloom(bloom_ref, m, k)
        h1 = hash_key_columns(b, keys)
        h2 = hash2_key_columns(b, keys)
        keep = _test_bits(bits, h1, h2, kk, mm)
        if keep.all():
            return b
        return b.filter(pa.array(keep))

    return ds.map_batches(prefilter, batch_format="pyarrow")


def bloom_semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_keys: list[str],
    right_keys: list[str] | None = None,
    bits_per_row: int = 12,
    k: int = 7,
) -> rd.Dataset:
    """EXACT left-semi join with a bloom prefilter on the probe side.

    ``right`` is scanned once to build the filter; ``left`` streams through
    the membership test (dropping ~all non-matching rows before any
    exchange) and the survivors — matches plus the bloom's small false-
    positive residue — go through the exact ``adaptive_join`` to finish.
    Result is identical to a plain semi join; the bloom only cuts the bytes
    that reach the join's shuffle/broadcast machinery.
    """
    from ..stages.aggregates import distinct_keys
    from .joins import adaptive_join

    right_keys = right_keys or left_keys
    # key columns must hash identically on both sides: rename right→left.
    # Materialize ONCE: build_bloom consumes rk twice (count + partials
    # pass) and distinct_keys a third time — unmaterialized, each re-runs
    # the full right-side read lineage.
    rk = right.map_batches(
        lambda b: b.select(right_keys).rename_columns(left_keys),
        batch_format="pyarrow",
    ).materialize()
    bloom = build_bloom(rk, left_keys, bits_per_row=bits_per_row, k=k)
    survivors = bloom_filter_dataset(left, left_keys, bloom)
    keys_ds = distinct_keys(rk, left_keys)
    return adaptive_join(
        survivors, keys_ds, left_keys=left_keys, right_keys=left_keys, how="inner"
    )


def clear_bloom_cache() -> None:
    _BLOOM_CACHE.clear()


__all__ = [
    "build_bloom",
    "bloom_filter_dataset",
    "bloom_semi_join",
    "clear_bloom_cache",
]

"""Vectorized string hashing over Arrow buffers (shared by joins + dedup).

One rolling-polynomial pass over a string column's flat UTF-8 byte buffer
(modular-inverse prefix sums) + a splitmix64 finalizer — no per-row Python,
no hashlib.  All constants are fixed, so every worker/process/parallelism
level computes identical hashes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Rolling polynomial base (odd → invertible mod 2^64); uint64 numpy
# arithmetic wraps mod 2^64 by construction.
_POLY_B = np.uint64(0x100000001B3)
_POLY_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
# independent second base (odd) for 128-bit composite keys: a raw collision
# must happen under BOTH polynomials for the (kh, kl) pair to collide
_POLY_B2 = np.uint64(0x9E3779B97F4A7C15)
_POLY_B2INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized — decorrelates polynomial hashes."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def string_flat_bytes(col: "pa.Array | pa.ChunkedArray") -> tuple[np.ndarray, np.ndarray]:
    """(uint8 byte buffer, int64 offsets[n+1]) of a string column; nulls → ''.

    One zero-copy view of the Arrow values buffer — no per-row Python."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    arr = arr.cast(pa.large_string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset:]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offsets.astype(np.int64)


def prefix_arrays(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bpow, S): B^t for t∈[0,n] and prefix sums S[t] = Σ_{i<t} b[i]·Binv^i.

    Segment hash over [s,e) is then bpow[e-1]·(S[e]−S[s]) — every window /
    token / shingle hash in a batch reads off these two arrays."""
    n = data.size
    bpow = np.full(n + 1, _POLY_B, dtype=np.uint64)
    bpow[0] = 1
    np.cumprod(bpow, out=bpow)  # bpow[t] = B^t  (wraps mod 2^64)
    binv_pow = np.full(n, _POLY_BINV, dtype=np.uint64)
    if n:
        binv_pow[0] = 1
        np.cumprod(binv_pow, out=binv_pow)  # Binv^i
    S = np.zeros(n + 1, dtype=np.uint64)
    if n:
        np.cumsum(data.astype(np.uint64) * binv_pow, out=S[1:])
    return bpow, S


def segment_hashes(bpow: np.ndarray, S: np.ndarray,
                   starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Mixed 64-bit hash of each byte segment [s, e); empty segments → 0."""
    out = np.zeros(len(starts), dtype=np.uint64)
    nz = ends > starts
    out[nz] = bpow[ends[nz] - 1] * (S[ends[nz]] - S[starts[nz]])
    return mix64(out)


# String bytes per pass.  Sized so the scratch set (7 arrays × 8 B/byte)
# stays ~14 MB: on this host first-touch page faults run at 30-50 MB/s, and
# a 1 MB chunk's 56 MB scratch cost 6-7 s of cold faults in EVERY worker
# process (measured; warm throughput is identical at 256 KB).
_HASH_CHUNK = 1 << 18
_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(name: str, size: int) -> np.ndarray:
    # allocate at the fixed chunk ceiling once — size-chasing reallocations
    # pay first-touch page faults on EVERY chunk (measured 50× slowdown)
    buf = _SCRATCH.get(name)
    if buf is None or buf.size < size:
        buf = _SCRATCH[name] = np.empty(max(size, _HASH_CHUNK + 2), dtype=np.uint64)
    return buf[:size]


def _prefix_into(data: np.ndarray, variant: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """prefix_arrays into reused per-process scratch (no fresh allocations —
    the prefix machinery costs 24 B per input byte, which as first-touch
    page faults dominated the whole index build before reuse).  ``variant``
    selects the polynomial base (independent hash families)."""
    B, BINV = (_POLY_B, _POLY_BINV) if variant == 0 else (_POLY_B2, _POLY_B2INV)
    n = data.size
    bpow = _scratch(f"bpow{variant}", n + 1)
    bpow.fill(B)
    bpow[0] = 1
    np.cumprod(bpow, out=bpow)
    binv = _scratch(f"binv{variant}", n)
    if n:
        binv.fill(BINV)
        binv[0] = 1
        np.cumprod(binv, out=binv)
    S = _scratch(f"S{variant}", n + 1)
    S[0] = 0
    if n:
        tmp = _scratch("tmp", n)
        np.multiply(binv, data, out=tmp)
        np.cumsum(tmp, out=S[1:])
    return bpow, S


def mix64b(h: np.ndarray) -> np.ndarray:
    """Second, independent finalizer (murmur3 fmix constants) — combined with
    a segment hash it yields a 128-bit-effective key when paired with the
    splitmix variant (collisions must co-occur in both)."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def hash_string_array(col: "pa.Array | pa.ChunkedArray", variant: int = 0) -> np.ndarray:
    """Mixed 64-bit hash per row of a string column (nulls hash like '').

    ``variant=1`` produces an independent second hash (different pre-xor and
    finalizer) for 128-bit composite keys.  Processed in ~1 MB byte-buffer
    chunks over reused scratch arrays so the transient memory is O(chunk),
    not O(8 × column bytes)."""
    data, offsets = string_flat_bytes(col)
    n_rows = len(offsets) - 1
    out = np.empty(n_rows, dtype=np.uint64)
    row = 0
    while row < n_rows:
        start_byte = int(offsets[row])
        # rows whose bytes fit in one chunk (always ≥ 1 row)
        end_row = int(np.searchsorted(offsets, start_byte + _HASH_CHUNK, side="right")) - 1
        end_row = min(max(end_row, row + 1), n_rows)
        seg = data[start_byte : int(offsets[end_row])]
        bpow, S = _prefix_into(seg, variant)
        st = offsets[row:end_row] - start_byte
        en = offsets[row + 1 : end_row + 1] - start_byte
        out[row:end_row] = segment_hashes(bpow, S, st, en)
        row = end_row
    if variant:
        out = mix64b(out)
    return out


def hash_key_columns(table: pa.Table, keys: list[str]) -> np.ndarray:
    """Composite 64-bit row hash over key columns (column-wise hash + mix
    combine — no concatenation ambiguity, no string materialization).
    Non-string columns are cast to string, matching the legacy combined-key
    semantics so int/string key pairs hash consistently on both sides."""
    out: np.ndarray | None = None
    for k in keys:
        col = table.column(k)
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())
        h = hash_string_array(col)
        out = h if out is None else mix64(out * np.uint64(0x9E3779B97F4A7C15) ^ h)
    assert out is not None
    return out


def hash2_key_columns(table: pa.Table, keys: list[str]) -> np.ndarray:
    """Independent second composite row hash (variant-1 family).  Paired with
    hash_key_columns it forms a 128-bit row key: a cross-row collision needs
    both polynomial families to collide (~1e-19 at 10^10 rows)."""
    out: np.ndarray | None = None
    for k in keys:
        col = table.column(k)
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())
        h = hash_string_array(col, 1)
        out = h if out is None else mix64(out * np.uint64(0xFF51AFD7ED558CCD) ^ h)
    assert out is not None
    return out

"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (the 100 TB story):
  * exact dedup      — hash fingerprint inside map_batches, then ONE
                       groupby(fingerprint) with C++ Min/Count aggregates
                       (no map_groups, no Python per group)
  * MinHash + LSH    — signatures vectorized in numpy per batch; banding
                       emits (band, bucket, id) rows; near-dup components
                       reuse the same distributed label propagation as
                       entity canonicalization (stages/canonicalize.py)
  * SimHash          — 64-bit signatures; near-dup blocking by 16-bit bands
                       (hamming ≤ 3 guarantees a matching band by pigeonhole
                       over 4 bands)
  * n-gram Jaccard   — estimated from MinHash signature agreement for
                       candidate pairs (exact shingle sets never shuffle)

All hash coefficients are seeded module constants — every worker, process and
parallelism level computes identical signatures.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Min

from .canonicalize import connected_components
from .textops import add_md5_fingerprint

_MERSENNE = np.uint64((1 << 61) - 1)
_RNG = np.random.default_rng(0x5EED)
DEFAULT_NUM_PERM = 64
_A = _RNG.integers(1, _MERSENNE, size=DEFAULT_NUM_PERM, dtype=np.uint64)
_B = _RNG.integers(0, _MERSENNE, size=DEFAULT_NUM_PERM, dtype=np.uint64)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Deterministic 61-bit hashes of the k-byte shingles of text."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    out = np.empty(len(data) - k + 1, dtype=np.uint64)
    for i in range(len(data) - k + 1):
        d = hashlib.blake2b(data[i : i + k], digest_size=8).digest()
        out[i] = int.from_bytes(d, "little") & int(_MERSENNE)
    return np.unique(out)


def minhash_signature(text: str, num_perm: int = DEFAULT_NUM_PERM, k: int = 5) -> np.ndarray:
    """num_perm-wide MinHash signature over k-byte shingles."""
    s = _shingle_hashes(text, k)
    if s.size == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    # h_i(x) = (a_i * x + b_i) mod p, vectorized over (perm, shingle)
    prod = (_A[:num_perm, None] * s[None, :] + _B[:num_perm, None]) % _MERSENNE
    return prod.min(axis=1)


def add_minhash_bands(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = 16,
    k: int = 5,
) -> pa.Table:
    """→ (id, band, bucket) rows: one row per (doc, LSH band).

    Docs sharing a bucket within any band are near-dup candidates
    (r = num_perm/bands rows per band)."""
    rows_per_band = num_perm // bands
    ids_out: list[Any] = []
    bands_out: list[int] = []
    buckets_out: list[str] = []
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_pylist()
    for doc_id, text in zip(ids, texts):
        sig = minhash_signature(text or "", num_perm=num_perm, k=k)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            bucket = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            ids_out.append(doc_id)
            bands_out.append(b)
            buckets_out.append(bucket)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "band": pa.array(bands_out, pa.int32()),
            "bucket": pa.array(buckets_out, pa.string()),
        }
    )


def add_minhash_signature_column(
    batch: pa.Table,
    *,
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    k: int = 5,
) -> pa.Table:
    sigs = [
        minhash_signature(t or "", num_perm=num_perm, k=k).astype(np.int64).tolist()
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column("minhash", pa.array(sigs, pa.list_(pa.int64())))


def jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash estimator: fraction of agreeing signature positions."""
    return float(np.mean(sig_a == sig_b))


# ---------------------------------------------------------------------------
# Dataset-level operators
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """→ (fingerprint, keep_id, n_dups): md5 content groups, keeping the
    minimum id per group (hash-partitioned groupby; first-wins semantics like
    the reference's entity merge base item)."""
    fp = ds.map_batches(
        lambda b: add_md5_fingerprint(b, text_col).select(["fingerprint", id_col]),
        batch_format="pyarrow",
    )
    agg = fp.groupby("fingerprint").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups")
    )
    return agg


def exact_dedup(
    ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Rows of ds whose id is the keeper of its content group."""
    from ..functions.joins import adaptive_join

    keepers = exact_dedup_groups(ds, text_col=text_col, id_col=id_col).select_columns(
        ["keep_id"]
    )
    return adaptive_join(ds, keepers, left_keys=[id_col], right_keys=["keep_id"], how="inner")


def minhash_lsh_components(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = 16,
    k: int = 5,
    num_partitions: int = 16,
    driver_threshold: int = 500_000,
) -> rd.Dataset:
    """→ (mid, comp): near-duplicate clusters via MinHash banding + the same
    connected-components machinery entity canonicalization uses.  comp is the
    minimum doc id of the cluster; docs with no collisions are absent (treat
    as singletons)."""
    pairs = ds.map_batches(
        lambda b: add_minhash_bands(
            b, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, k=k
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "key": pa.array(
                    [f"{band}:{bucket}" for band, bucket in
                     zip(b.column("band").to_pylist(), b.column("bucket").to_pylist())],
                    pa.string(),
                ),
                "mid": b.column("doc_id"),
            }
        ),
        batch_format="pyarrow",
    )
    return connected_components(
        pairs,
        num_partitions=num_partitions,
        driver_threshold=driver_threshold,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (deterministic blake2b token
    hashes; sign of per-bit vote sum)."""
    toks = text.split()
    if not toks:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out & np.uint64(0x7FFFFFFFFFFFFFFF))  # int64-safe


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
    return batch.append_column("simhash", pa.array(hs, pa.int64()))


def simhash_band_pairs(batch: pa.Table, *, id_col: str = "doc_id") -> pa.Table:
    """(key, mid) rows for 16-bit-band blocking: docs within hamming distance
    3 share at least one of the 4 bands (pigeonhole), so the same
    connected-components pass clusters them."""
    ids = batch.column(id_col).to_pylist()
    hashes = batch.column("simhash").to_pylist()
    keys: list[str] = []
    mids: list[int] = []
    for doc_id, h in zip(ids, hashes):
        for b in range(4):
            band = (h >> (16 * b)) & 0xFFFF
            keys.append(f"{b}:{band:04x}")
            mids.append(doc_id)
    return pa.Table.from_pydict(
        {"key": pa.array(keys, pa.string()), "mid": pa.array(mids, pa.int64())}
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")

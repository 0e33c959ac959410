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

Signature kernels are fully vectorized: shingle hashes come from one numpy
rolling polynomial pass over the batch's whole UTF-8 byte buffer (modular-
inverse prefix sums — no per-byte Python, no per-shingle hashlib), token
hashes for SimHash from the same segmented-prefix machinery over the token
buffer of the entire batch.  All hash coefficients are seeded module
constants — every worker, process and parallelism level computes identical
signatures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min

from .canonicalize import connected_components
from .textops import add_md5_fingerprint

_MERSENNE = np.uint64((1 << 61) - 1)
_RNG = np.random.default_rng(0x5EED)
DEFAULT_NUM_PERM = 64

# Flat shingle payload cap for the broadcast-verify path of
# ngram_jaccard_join: one zero-copy object-store copy per node, so the cap
# is object-store-sized, not per-worker-heap-sized.
NGRAM_BROADCAST_BYTES = 4 << 30

# Sub-stage wall times of the last ngram_jaccard_join() call (driver-side,
# bench attribution; keys: sigs, cand, n_cand).
LAST_TIMINGS: dict = {}


def _sig_index_task_fn(refs: list):
    """(sorted doc ids, offsets, flat shingle values, value ranks) — one
    shared index.  ``rank`` is each flat value's position in the GLOBAL
    sorted-unique value domain (< 2^32 under the broadcast byte cap): the
    verify kernel packs (pair, rank) into one int64 so intersections need no
    sort at all.  The one-time unique+searchsorted here amortizes over every
    candidate batch."""
    import ray

    tbls = [t for t in ray.get(refs) if t.num_rows]
    t = pa.concat_tables(tbls).combine_chunks().sort_by("doc_id")
    sh = t.column("sh")
    if isinstance(sh, pa.ChunkedArray):
        sh = sh.combine_chunks()
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    offs = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = sh.values.to_numpy(zero_copy_only=False).astype(np.int64)
    vdom = np.unique(flat)
    rank = np.searchsorted(vdom, flat).astype(np.uint32)
    return ids, offs, flat, rank


import ray as _ray  # noqa: E402  (decorating the task needs the top module)

# num_cpus=0: must start immediately — a CPU reservation would queue behind
# the verify map tasks that block on its result (functions/joins.py lesson)
_sig_index_task = _ray.remote(num_cpus=0)(_sig_index_task_fn)

_SIG_INDEX_CACHE: dict = {}


def _resolve_sig_index(ref):
    """Worker-cached zero-copy view of the shared sig index.  Reached via
    module import — cloudpickle copies plain globals by value per task."""
    import ray

    from knowledgegraph_ray.stages import dedup as _mod

    key = ref.hex()
    hit = _mod._SIG_INDEX_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        _mod._SIG_INDEX_CACHE.clear()  # one live index per worker
        _mod._SIG_INDEX_CACHE[key] = hit
    return hit
_A = _RNG.integers(1, _MERSENNE, size=DEFAULT_NUM_PERM, dtype=np.uint64)
_B = _RNG.integers(0, _MERSENNE, size=DEFAULT_NUM_PERM, dtype=np.uint64)

from ..functions.hashing import (
    mix64 as _mix64,
    prefix_arrays as _prefix_arrays,
    segment_hashes as _segment_hashes,
    string_flat_bytes as _string_flat_bytes,
)


def _mod_mersenne(x: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """x mod (2^61−1) via folding (2^61 ≡ 1), no integer division."""
    if out is None:
        out = np.empty_like(x)
    np.bitwise_and(x, _MERSENNE, out=out)
    out += x >> np.uint64(61)
    hi = out >> np.uint64(61)          # second fold: out < 2^62
    np.bitwise_and(out, _MERSENNE, out=out)
    out += hi
    np.subtract(out, _MERSENNE, out=out, where=out >= _MERSENNE)
    return out






def _window_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """Mixed hashes of ALL k-byte windows of the buffer (length n-k+1)."""
    n = data.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    bpow, S = _prefix_arrays(data)
    i = np.arange(n - k + 1)
    return _mix64(bpow[i + k - 1] * (S[i + k] - S[i]))


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Deterministic 61-bit hashes of the k-byte shingles of text
    (vectorized rolling polynomial — one numpy pass, no per-shingle Python)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if data.size < k:
        data = np.concatenate([data, np.zeros(k - data.size, np.uint8)])
    return np.unique(_window_hashes(data, k) & _MERSENNE)


def _sig_from_hashes(h: np.ndarray, num_perm: int) -> np.ndarray:
    if h.size == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    prod = _mod_mersenne(_A[:num_perm, None] * h[None, :] + _B[:num_perm, None])
    return prod.min(axis=1)


def minhash_signature(text: str, num_perm: int = DEFAULT_NUM_PERM, k: int = 5) -> np.ndarray:
    """num_perm-wide MinHash signature over k-byte shingles."""
    return _sig_from_hashes(_shingle_hashes(text, k), num_perm)


def _batch_signatures(
    col: "pa.Array | pa.ChunkedArray", num_perm: int, k: int
) -> np.ndarray:
    """(n_docs, num_perm) MinHash signature matrix for a whole batch.

    One rolling-hash pass over the batch's flat byte buffer, then per-perm
    (a·x+b) mod p with in-place buffer reuse and one minimum.reduceat over
    the per-doc shingle segments — no per-doc Python in the main path (min is
    idempotent, so duplicate shingles need no dedup).  Docs shorter than k
    bytes (rare) hash their zero-padded bytes, matching _shingle_hashes."""
    data, offsets = _string_flat_bytes(col)
    n_docs = len(offsets) - 1
    sigs = np.zeros((n_docs, num_perm), dtype=np.uint64)
    if n_docs == 0:
        return sigs
    H_all = _window_hashes(data, k) & _MERSENNE
    starts, ends = offsets[:-1], offsets[1:]
    counts = np.maximum(ends - starts - k + 1, 0)
    long_docs = counts > 0
    if long_docs.any():
        # valid = positions whose k-window stays inside one doc, via a
        # range-mark diff scan (vectorized over doc boundaries only)
        marks = np.zeros(H_all.size + 1, dtype=np.int32)
        np.add.at(marks, starts[long_docs], 1)
        np.add.at(marks, (starts + counts)[long_docs], -1)
        valid = np.cumsum(marks[:-1]) > 0
        H_valid = np.ascontiguousarray(H_all[valid])
        seg_starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=seg_starts[1:])
        red_at = seg_starts[long_docs]
        buf = np.empty_like(H_valid)
        tmp = np.empty_like(H_valid)
        for p in range(num_perm):
            np.multiply(H_valid, _A[p], out=buf)
            np.add(buf, _B[p], out=buf)
            _mod_mersenne(buf, out=tmp)
            sigs[long_docs, p] = np.minimum.reduceat(tmp, red_at)
    # short docs: zero-padded single shingle (rare path, per-doc)
    for d in np.flatnonzero(~long_docs):
        seg = np.zeros(k, np.uint8)
        s, e = int(starts[d]), int(ends[d])
        seg[: e - s] = data[s:e]
        h = _window_hashes(seg, k) & _MERSENNE
        sigs[d] = _sig_from_hashes(h, num_perm)
    return sigs


def _band_buckets(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 bucket ids: the r signature values of each band
    folded through the mixer (vectorized replacement for per-band blake2b)."""
    n_docs, num_perm = sigs.shape
    r = num_perm // bands
    chunks = sigs[:, : bands * r].reshape(n_docs, bands, r)
    acc = np.zeros((n_docs, bands), dtype=np.uint64)
    for j in range(r):
        acc = _mix64(acc ^ chunks[:, :, j])
    return acc


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
    sigs = _batch_signatures(batch.column(text_col), num_perm, k)
    n_docs = sigs.shape[0]
    buckets = _band_buckets(sigs, bands)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n_docs), pa.int32()),
            "bucket": pa.array(buckets.reshape(-1).astype(np.int64), pa.int64()),
        }
    )


def add_minhash_signature_column(
    batch: pa.Table,
    *,
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    k: int = 5,
) -> pa.Table:
    sigs = _batch_signatures(batch.column(text_col), num_perm, k).astype(np.int64)
    return batch.append_column(
        "minhash", pa.FixedSizeListArray.from_arrays(pa.array(sigs.reshape(-1), pa.int64()), num_perm).cast(pa.list_(pa.int64()))
    )


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
    from ..stages.aggregates import partial_grouped_agg

    fp = ds.map_batches(
        lambda b: add_md5_fingerprint(b, text_col).select(["fingerprint", id_col]),
        batch_format="pyarrow",
    )
    return partial_grouped_agg(
        fp, ["fingerprint"], mins={id_col: "keep_id"}, count_alias="n_dups"
    )


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

    def band_keys(b: pa.Table) -> pa.Table:
        t = add_minhash_bands(
            b, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, k=k
        )
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = t.column("bucket").to_numpy(zero_copy_only=False).astype(np.uint64)
        # int (band, bucket) key — no string formatting in the hot path, and
        # the CC sort shuffles 8-byte ints instead of hex strings
        key = _mix64((band << np.uint64(56)) ^ bucket).astype(np.int64)
        return pa.Table.from_pydict(
            {"key": pa.array(key, pa.int64()), "mid": t.column("doc_id")}
        )

    pairs = ds.map_batches(band_keys, batch_format="pyarrow")
    return connected_components(
        pairs,
        num_partitions=num_partitions,
        driver_threshold=driver_threshold,
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard similarity join (prefix-filter + verify)
# ---------------------------------------------------------------------------

JACCARD_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard_r", pa.float64())]
)

# element budget per vectorized verify chunk: bounds the lexsort working set
# (3 int64 arrays x 4M ≈ 100 MB) independent of the candidate count
_VERIFY_CHUNK_ELEMS = 4 << 20


# Pairs whose combined set size is at or below this go through the
# vectorized rank-key kernel; larger pairs use a per-pair binary search.
# Rationale (measured on this host): the Python loop costs ~6-10 µs/pair of
# interpreter overhead + O(min log max) C work, so for MANY SMALL pairs
# (boilerplate/template corpora — the quadratic-candidate regime) the
# overhead IS the stage; for LARGE sets the per-pair binary search touches
# far fewer cache lines than any whole-chunk kernel and wins.
_SMALL_PAIR_ELEMS = 256


def _verify_jaccard_indexed(
    offs: np.ndarray, flat: np.ndarray, rank: np.ndarray,
    ia: np.ndarray, ib: np.ndarray,
) -> np.ndarray:
    """Exact Jaccard per candidate pair against the shared sorted-unique
    shingle index (intersections from ``_verify_inter_indexed``)."""
    na = (offs[ia + 1] - offs[ia]).astype(np.int64)
    nb = (offs[ib + 1] - offs[ib]).astype(np.int64)
    inter = _verify_inter_indexed(offs, flat, rank, ia, ib)
    union = na + nb - inter
    return np.divide(
        inter, union, out=np.zeros(len(ia), np.float64), where=union > 0
    )


def _verify_inter_indexed(
    offs: np.ndarray, flat: np.ndarray, rank: np.ndarray,
    ia: np.ndarray, ib: np.ndarray,
) -> np.ndarray:
    """Exact |S_a ∩ S_b| per candidate pair against the shared sorted-unique
    shingle index.  Hybrid regime split (_SMALL_PAIR_ELEMS):

    * SMALL pairs — pack (pair_in_chunk, global value rank) into one int64.
      Each side's packed keys are ALREADY sorted (pairs ascend, values —
      hence ranks — ascend within a segment), so the intersection is ONE
      np.searchsorted membership pass: zero sorting, zero per-pair Python.
      Chunked so the working set stays bounded at any candidate count.
    * LARGE pairs — per-pair sorted binary search of the smaller set in the
      larger (optimal element count for big sets; pair count is small by
      the prefix filter whenever sets are large)."""
    n = len(ia)
    na = (offs[ia + 1] - offs[ia]).astype(np.int64)
    nb = (offs[ib + 1] - offs[ib]).astype(np.int64)
    tot = na + nb
    out = np.zeros(n, dtype=np.int64)
    small = tot <= _SMALL_PAIR_ELEMS

    si = np.flatnonzero(small & (na > 0) & (nb > 0))
    if si.size:
        work = np.zeros(si.size + 1, np.int64)
        np.cumsum(tot[si], out=work[1:])
        lo = 0
        while lo < si.size:
            hi = int(np.searchsorted(work, work[lo] + _VERIFY_CHUNK_ELEMS))
            hi = max(lo + 1, min(hi, si.size))
            idx = si[lo:hi]
            m = hi - lo
            la, lb = na[idx], nb[idx]
            csa = np.zeros(m + 1, np.int64)
            np.cumsum(la, out=csa[1:])
            csb = np.zeros(m + 1, np.int64)
            np.cumsum(lb, out=csb[1:])
            # grouped-arange gathers + packed keys in one pass each side
            pos_a = np.arange(csa[-1]) + np.repeat(offs[ia[idx]] - csa[:-1], la)
            pos_b = np.arange(csb[-1]) + np.repeat(offs[ib[idx]] - csb[:-1], lb)
            base = np.arange(m, dtype=np.int64) << np.int64(32)
            a_keys = rank[pos_a] + np.repeat(base, la)
            b_keys = rank[pos_b] + np.repeat(base, lb)
            pos = np.minimum(np.searchsorted(b_keys, a_keys), len(b_keys) - 1)
            match = b_keys[pos] == a_keys
            # per-pair match counts: segments are nonempty (na, nb > 0), so
            # reduceat starts are strictly increasing
            out[idx] = np.add.reduceat(match, csa[:-1]).astype(np.int64)
            lo = hi

    for i in np.flatnonzero(~small):
        a = flat[offs[ia[i]]: offs[ia[i]] + na[i]]
        b = flat[offs[ib[i]]: offs[ib[i]] + nb[i]]
        if len(b) < len(a):
            a, b = b, a
        # sorted-membership count: one binary-search pass, ~3x cheaper than
        # intersect1d's concat+sort of both sets
        pos = np.searchsorted(b, a)
        pos[pos == len(b)] = len(b) - 1
        out[i] = int(np.count_nonzero(b[pos] == a))
    return out


def _doc_shingle_lists(
    batch: pa.Table, *, text_col: str, id_col: str, k: int
) -> pa.Table:
    """(doc_id, sh list<int64> ascending-unique, n) per doc — one rolling-hash
    pass over the batch's flat byte buffer (shared with MinHash), one C
    np.unique per doc segment."""
    col = batch.column(text_col)
    data, offsets = _string_flat_bytes(col)
    n_docs = len(offsets) - 1
    H_all = (_window_hashes(data, k) & _MERSENNE).astype(np.int64)
    starts, ends = offsets[:-1], offsets[1:]
    counts = np.maximum(ends - starts - k + 1, 0)
    seg_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(counts[:-1], out=seg_starts[1:])
    # valid-window mask via the same boundary-diff scan as MinHash
    marks = np.zeros(H_all.size + 1, dtype=np.int32)
    long_docs = counts > 0
    np.add.at(marks, starts[long_docs], 1)
    np.add.at(marks, (starts + counts)[long_docs], -1)
    valid = np.cumsum(marks[:-1]) > 0 if H_all.size else np.zeros(0, bool)
    H_valid = H_all[valid]
    # per-doc sorted-unique via ONE segmented lexsort + run scan (H_valid is
    # already grouped by doc, so a (doc, value) lexsort both sorts each doc's
    # segment and exposes duplicates as adjacent runs) — no per-doc Python
    if H_valid.size:
        doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        order = np.lexsort((H_valid, doc_ids))
        dv, vv = doc_ids[order], H_valid[order]
        first = np.r_[True, (dv[1:] != dv[:-1]) | (vv[1:] != vv[:-1])]
        flat = vv[first]
        sizes = np.bincount(dv[first], minlength=n_docs).astype(np.int64)
    else:
        flat = np.zeros(0, np.int64)
        sizes = np.zeros(n_docs, dtype=np.int64)
    offs = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum(sizes, out=offs[1:])
    sh = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(flat, pa.int64()))
    return pa.Table.from_pydict(
        {
            "doc_id": pc.cast(batch.column(id_col), pa.int64()),
            "sh": sh,
            "n_sh": pa.array(sizes, pa.int64()),
        }
    )


def ngram_jaccard_join(
    ds: rd.Dataset,
    *,
    threshold: float,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> rd.Dataset:
    """EXACT and COMPLETE set-similarity join: all doc pairs (a < b) with
    k-byte-shingle Jaccard ≥ threshold → (id_a, id_b, jaccard_r).

    Prefix-filter shape (PPJoin family, no all-pairs):
      1. one pass builds each doc's sorted-unique shingle-hash set;
      2. each doc emits only its PREFIX — the first ``|S| - ceil(t·|S|) + 1``
         hashes under the global ascending-hash order.  Theorem: two sets
         with Jaccard ≥ t must share at least one prefix element under ANY
         fixed total order, so candidate generation is complete;
      3. a range sort colocates equal prefix hashes (single sort key — full-
         key ties land in one block); per-run pair emission yields candidate
         (id_a, id_b) rows, deduped by a C++ groupby;
      4. candidates join back to the shingle sets (adaptive broadcast/shuffle
         on int keys) and verify with an exact sorted-array intersection.

    Shuffle bytes are prefix rows (16 B) + candidate pairs, never the corpus;
    the verify join's right side is O(corpus) and selects shuffle mode past
    the broadcast caps.  Hot shingles shared by many docs make quadratic
    runs in step 3 — inherent to exactness (every such pair IS a candidate);
    at 100 TB tune k upward or pre-drop boilerplate with exact dedup first."""
    import time as _time

    from ray.data.aggregate import Count

    from ..functions.joins import adaptive_join

    LAST_TIMINGS.clear()
    _t0 = _time.monotonic()
    sigs = ds.map_batches(
        lambda b: _doc_shingle_lists(b, text_col=text_col, id_col=id_col, k=k),
        batch_format="pyarrow",
    ).materialize()
    LAST_TIMINGS["sigs"] = round(_time.monotonic() - _t0, 3)

    def prefix_rows(batch: pa.Table) -> pa.Table:
        sh = batch.column("sh")
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        sizes = batch.column("n_sh").to_numpy(zero_copy_only=False)
        # epsilon guards the ceil against float threshold representation
        # (0.8 is slightly ABOVE 4/5 in binary): err on the LONGER prefix —
        # extra candidates are verified away, a short prefix loses pairs
        plen = sizes - np.ceil(threshold * sizes - 1e-9).astype(np.int64) + 1
        plen = np.clip(plen, 0, sizes)
        offs = sh.offsets.to_numpy(zero_copy_only=False)[:-1].astype(np.int64)
        flat = sh.values.to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # grouped arange (vectorized — no per-doc Python): pos = each prefix
        # hash's position within its doc's ascending set (the PPJoin
        # positional filter's input), idx = its index into the flat buffer
        cs = np.zeros(len(plen) + 1, np.int64)
        np.cumsum(plen, out=cs[1:])
        pos = (np.arange(cs[-1], dtype=np.int64)
               - np.repeat(cs[:-1], plen)) if len(offs) else np.zeros(0, np.int64)
        idx = (pos + np.repeat(offs, plen)) if len(offs) else np.zeros(0, np.int64)
        return pa.Table.from_pydict(
            {
                "psh": pa.array(flat[idx], pa.int64()),
                "doc_id": pa.array(np.repeat(ids, plen), pa.int64()),
                "n_sh": pa.array(np.repeat(sizes, plen), pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    # PPJoin positional filter: a pair meeting at prefix positions (pa, pb)
    # of sets sized (na, nb) can reach overlap at most 1 + min(na - pa - 1,
    # nb - pb - 1) (both sets ascend past the shared hash), while Jaccard
    # >= t needs overlap >= ceil(t/(1+t) * (na+nb)).  Applying it per
    # occurrence is complete: a qualifying pair's FIRST shared prefix hash
    # has maximal suffixes and always passes.
    t_req = threshold / (1.0 + threshold)

    def run_pairs(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]).empty_table()
        keys = block.column("psh").to_numpy(zero_copy_only=False)
        ids = block.column("doc_id").to_numpy(zero_copy_only=False)
        ns = block.column("n_sh").to_numpy(zero_copy_only=False)
        ps = block.column("pos").to_numpy(zero_copy_only=False)
        rem = ns - ps  # 1 + remaining-after = max overlap via this hash
        change = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        bounds = np.r_[change, n]
        outs_a, outs_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            L = e - s
            if L < 2:
                continue
            # AllPairs SIZE FILTER: Jaccard >= t forces min(na,nb) >=
            # t*max(na,nb), so after sorting the run by set size each row i
            # only pairs with rows j in [i+1, hi_b[i]) where z[j] <= z[i]/t.
            # On size-diverse corpora this cuts raw emission from L^2 to the
            # compatible-size windows; completeness is untouched (the filter
            # is size-only, independent of which hash the pair met at).
            order = np.argsort(ns[s:e], kind="stable")
            z_s = ns[s:e][order]
            id_s = ids[s:e][order]
            rem_s = rem[s:e][order]
            # never let float division round the size ceiling DOWN past the
            # exact rational bound — jaccard == threshold exactly (e.g.
            # 67/125 at t=0.536: fl(67/0.536) = 124.999…) must stay a
            # candidate.  The bump is RELATIVE (4e-16 ≈ 2 ulps) plus a tiny
            # absolute term: a constant 1e-9 alone is smaller than one ulp
            # once z/t exceeds ~2^23, silently re-dropping boundary pairs on
            # large shingle sets; over-admission is harmless (exact verify)
            bound = z_s / threshold
            hi_b = np.searchsorted(
                z_s, bound * (1.0 + 4e-16) + 1e-9, side="right"
            )
            c = np.maximum(hi_b - np.arange(L) - 1, 0)
            csum = np.zeros(L + 1, np.int64)
            np.cumsum(c, out=csum[1:])
            # chunked grouped-arange emission bounds peak allocation for
            # hot-shingle runs (surviving pairs ARE candidates — exactness
            # requires them — but never as one L² index block)
            lo = 0
            while lo < L:
                hi = int(np.searchsorted(csum, csum[lo] + (1 << 22)))
                hi = max(lo + 1, min(hi, L))
                tot = int(csum[hi] - csum[lo])
                if tot == 0:
                    lo = hi
                    continue
                cc = c[lo:hi]
                base = np.arange(lo, hi, dtype=np.int64)
                ii = np.repeat(base, cc)
                local_cs = csum[lo:hi] - csum[lo]
                jj = (np.arange(tot, dtype=np.int64)
                      - np.repeat(local_cs, cc) + np.repeat(base + 1, cc))
                a, b = id_s[ii], id_s[jj]
                # same epsilon rationale: never round the overlap requirement
                # UP past the exact rational bound (boundary pairs with
                # jaccard == threshold must stay candidates)
                req = np.ceil(t_req * (z_s[ii] + z_s[jj]) - 1e-9)
                keep = (a != b) & (np.minimum(rem_s[ii], rem_s[jj]) >= req)
                outs_a.append(np.minimum(a, b)[keep])
                outs_b.append(np.maximum(a, b)[keep])
                lo = hi
        if not outs_a:
            return pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]).empty_table()
        t = pa.Table.from_pydict(
            {
                "id_a": pa.array(np.concatenate(outs_a), pa.int64()),
                "id_b": pa.array(np.concatenate(outs_b), pa.int64()),
            }
        )
        # per-block dedup (C++ hash): a pair re-emitted by several shared
        # prefix hashes collapses here, before the candidate shuffle
        return t.group_by(["id_a", "id_b"]).aggregate([])

    _t0 = _time.monotonic()
    # No global candidate dedup here: verify is idempotent and cheap (shared
    # index, 16 B/candidate), so cross-block duplicate candidates re-verify
    # instead of paying an all-to-all groupby of the full candidate set; the
    # FINAL dedup groups only the survivors (orders of magnitude fewer).
    cand = (
        sigs.map_batches(prefix_rows, batch_format="pyarrow")
        .sort("psh")
        .map_batches(run_pairs, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    LAST_TIMINGS["cand"] = round(_time.monotonic() - _t0, 3)
    LAST_TIMINGS["n_cand"] = cand.count()

    def _dedup_survivors(verified: rd.Dataset) -> rd.Dataset:
        # duplicate survivors (same pair via several prefix runs) carry the
        # IDENTICAL floor-canonicalized jaccard_r (deterministic kernel), so
        # distinct over all three columns is an exact dedup
        from ..stages.aggregates import distinct_keys

        return distinct_keys(verified, ["id_a", "id_b", "jaccard_r"])

    # Verify mode selection.  Candidate counts are quadratic in hot-shingle
    # run lengths (low-vocabulary/template corpora approach all-pairs), so
    # joining the FULL shingle lists onto every candidate row multiplies a
    # small corpus into candidate x list-width bytes.  When the flat
    # signature payload fits the broadcast cap, build ONE shared zero-copy
    # index (ids/offsets/values in the object store, num_cpus=0 task — the
    # joins.py pattern) and verify candidates by lookup: shuffle stays at 16
    # B/candidate.  Past the cap, fall back to the shuffle join (corpus too
    # big to broadcast; candidates are then the smaller side).
    n_docs = sigs.count()
    total_sh = int(sigs.sum("n_sh") or 0)
    flat_bytes = total_sh * 8 + n_docs * 24
    if flat_bytes <= NGRAM_BROADCAST_BYTES:
        idx_ref = _sig_index_task.remote(sigs.to_arrow_refs())

        def verify_lookup(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return JACCARD_SCHEMA.empty_table()
            ids, offs, flat, rank = _resolve_sig_index(idx_ref)
            a_ids = batch.column("id_a").to_numpy(zero_copy_only=False)
            b_ids = batch.column("id_b").to_numpy(zero_copy_only=False)
            ia = np.searchsorted(ids, a_ids)
            ib = np.searchsorted(ids, b_ids)
            # hybrid exact intersection: sort-free rank-key kernel for
            # small-set candidates (the quadratic-candidate regime round 2
            # flagged), per-pair binary search where sets are large
            jac = _verify_jaccard_indexed(offs, flat, rank, ia, ib)
            keep = jac >= threshold
            return pa.Table.from_pydict(
                {
                    "id_a": batch.column("id_a").filter(pa.array(keep)),
                    "id_b": batch.column("id_b").filter(pa.array(keep)),
                    "jaccard_r": pa.array(
                        np.floor(jac[keep] * 10000.0) / 10000.0, pa.float64()
                    ),
                },
                schema=JACCARD_SCHEMA,
            )

        return _dedup_survivors(
            cand.map_batches(verify_lookup, batch_format="pyarrow")
        )

    def _side(side: str) -> rd.Dataset:
        return sigs.map_batches(
            lambda b, _s=side: pa.Table.from_pydict(
                {
                    f"id_{_s}": b.column("doc_id"),
                    f"sh_{_s}": b.column("sh"),
                    f"n_{_s}": b.column("n_sh"),
                }
            ),
            batch_format="pyarrow",
        )

    joined = adaptive_join(
        cand, _side("a"), left_keys=["id_a"], num_partitions=num_partitions
    )
    joined = adaptive_join(
        joined, _side("b"), left_keys=["id_b"], num_partitions=num_partitions
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return JACCARD_SCHEMA.empty_table()

        def _flat(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = col.values.to_numpy(zero_copy_only=False)
            return offs, vals

        # per-pair sorted binary search (no shared rank domain on this path;
        # past-cap corpora have large sets, where the loop kernel is optimal).
        # MEASURED negative results (round 3, this host): replacing the loop
        # with a whole-batch merged (seg, value) lexsort loses 3× on 200k
        # small pairs and 24× on 500 × 20k-element pairs; a per-batch
        # np.unique rank domain + the indexed packed-key kernel loses 4× /
        # 24× — building the value domain per batch is the cost the
        # broadcast path's ONE shared global rank (built once per run)
        # exists to amortize, and no per-batch vectorization beats paying it.
        offs_a, flat_a = _flat(batch.column("sh_a"))
        offs_b, flat_b = _flat(batch.column("sh_b"))
        jac = np.zeros(batch.num_rows, dtype=np.float64)
        for i in range(batch.num_rows):
            a = flat_a[offs_a[i]: offs_a[i + 1]]
            b = flat_b[offs_b[i]: offs_b[i + 1]]
            if len(b) < len(a):
                a, b = b, a
            pos = np.searchsorted(b, a)
            pos[pos == len(b)] = len(b) - 1
            inter = int(np.count_nonzero(b[pos] == a))
            jac[i] = inter / (len(a) + len(b) - inter)
        keep = jac >= threshold
        return pa.Table.from_pydict(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "jaccard_r": pa.array(
                    np.floor(jac[keep] * 10000.0) / 10000.0, pa.float64()
                ),
            },
            schema=JACCARD_SCHEMA,
        )

    return _dedup_survivors(joined.map_batches(verify, batch_format="pyarrow"))


CONTAINMENT_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("containment_r", pa.float64())]
)


def ngram_containment_join(
    ds: rd.Dataset,
    *,
    threshold: float,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> rd.Dataset:
    """EXACT asymmetric set-containment join: all ORDERED pairs (a, b),
    a ≠ b, with |S_a ∩ S_b| / |S_a| ≥ threshold — "a is (nearly) contained
    in b", the quote/inclusion/boilerplate relation a symmetric Jaccard
    join misses whenever the container is much larger than the quote.

    One-sided prefix filter: containment ≥ t forces |S_a ∩ S_b| ≥
    ⌈t·|S_a|⌉, so S_a's first |S_a| − ⌈t·|S_a|⌉ + 1 hashes under the global
    ascending order must hit S_b (the standard prefix lemma applied to the
    contained side only).  The CONTAINER side has no size bound, so every
    doc's FULL hash list enters the exchange as probe rows — candidate
    generation stays complete at O(total shingles × 25 B) shuffled bytes
    (linear, though wider than Jaccard's prefix-only stream).  Pruning per
    shared hash: a.doc ≠ b.doc, the size filter n_b ≥ ⌈t·n_a⌉, and the
    one-sided positional filter 1 + min(n_a−p_a−1, n_b−p_b−1) ≥ ⌈t·n_a⌉.
    Candidates verify exactly (inter / |S_a|) against the shared zero-copy
    shingle index; past NGRAM_BROADCAST_BYTES the verify joins the shingle
    lists onto candidates instead (same fallback as the Jaccard join).

    Returns (id_a, id_b, containment_r) with containment_r
    floor-canonicalized to 1e-4 — ordered pairs: (a,b) and (b,a) are
    independent results.  Hot shingles shared by many docs make quadratic
    runs — inherent to exactness; bound the input or raise k, as with the
    Jaccard join."""
    from ..functions.joins import adaptive_join
    from ..stages.aggregates import distinct_keys

    sigs = ds.map_batches(
        lambda b: _doc_shingle_lists(b, text_col=text_col, id_col=id_col, k=k),
        batch_format="pyarrow",
    ).materialize()

    def probe_rows(batch: pa.Table) -> pa.Table:
        """ALL hash positions per doc; pos < plen marks contained-side
        prefix rows (same epsilon as the Jaccard prefix: err LONGER)."""
        sh = batch.column("sh")
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        sizes = batch.column("n_sh").to_numpy(zero_copy_only=False)
        plen = sizes - np.ceil(threshold * sizes - 1e-9).astype(np.int64) + 1
        plen = np.clip(plen, 0, sizes)
        flat = sh.values.to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_all = int(sizes.sum())
        cs = np.zeros(len(sizes) + 1, np.int64)
        np.cumsum(sizes, out=cs[1:])
        pos = (np.arange(n_all, dtype=np.int64)
               - np.repeat(cs[:-1], sizes)) if len(sizes) else np.zeros(0, np.int64)
        return pa.Table.from_pydict({
            "psh": pa.array(flat, pa.int64()),
            "doc_id": pa.array(np.repeat(ids, sizes), pa.int64()),
            "n_sh": pa.array(np.repeat(sizes, sizes), pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "pref": pa.array(pos < np.repeat(plen, sizes), pa.bool_()),
        })

    def run_pairs(block: pa.Table) -> pa.Table:
        n = block.num_rows
        empty = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]).empty_table()
        if n == 0:
            return empty
        keys = block.column("psh").to_numpy(zero_copy_only=False)
        ids = block.column("doc_id").to_numpy(zero_copy_only=False)
        ns = block.column("n_sh").to_numpy(zero_copy_only=False)
        ps = block.column("pos").to_numpy(zero_copy_only=False)
        pref = block.column("pref").to_numpy(zero_copy_only=False)
        rem = ns - ps
        bounds = np.r_[np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]]), n]
        outs_a, outs_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            L = e - s
            pi = s + np.flatnonzero(pref[s:e])
            if L < 2 or pi.size == 0:
                continue
            # chunked (prefix-row × run-row) emission, 4M pairs per slab
            per = max(1, (1 << 22) // L)
            for lo in range(0, pi.size, per):
                ii = np.repeat(pi[lo:lo + per], L)
                jj = np.tile(np.arange(s, e, dtype=np.int64),
                             min(per, pi.size - lo))
                # same epsilon discipline as the Jaccard join: never round
                # the requirement UP past the exact rational bound
                req = np.ceil(threshold * ns[ii] - 1e-9)
                keep = (
                    (ids[ii] != ids[jj])
                    & (ns[jj] >= req)
                    & (1 + np.minimum(rem[ii] - 1, rem[jj] - 1) >= req)
                )
                outs_a.append(ids[ii][keep])
                outs_b.append(ids[jj][keep])
        if not outs_a:
            return empty
        t = pa.Table.from_pydict({
            "id_a": pa.array(np.concatenate(outs_a), pa.int64()),
            "id_b": pa.array(np.concatenate(outs_b), pa.int64()),
        })
        return t.group_by(["id_a", "id_b"]).aggregate([])

    cand = (
        sigs.map_batches(probe_rows, batch_format="pyarrow")
        .sort("psh")
        .map_batches(run_pairs, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    def _emit(batch: pa.Table, cont: np.ndarray) -> pa.Table:
        keep = cont >= threshold
        return pa.Table.from_pydict(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "containment_r": pa.array(
                    np.floor(cont[keep] * 10000.0) / 10000.0, pa.float64()
                ),
            },
            schema=CONTAINMENT_SCHEMA,
        )

    n_docs = sigs.count()
    total_sh = int(sigs.sum("n_sh") or 0)
    if total_sh * 8 + n_docs * 24 <= NGRAM_BROADCAST_BYTES:
        idx_ref = _sig_index_task.remote(sigs.to_arrow_refs())

        def verify_lookup(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return CONTAINMENT_SCHEMA.empty_table()
            ids, offs, flat, rank = _resolve_sig_index(idx_ref)
            ia = np.searchsorted(ids, batch.column("id_a").to_numpy(zero_copy_only=False))
            ib = np.searchsorted(ids, batch.column("id_b").to_numpy(zero_copy_only=False))
            inter = _verify_inter_indexed(offs, flat, rank, ia, ib)
            na = (offs[ia + 1] - offs[ia]).astype(np.int64)
            cont = np.divide(inter, na, out=np.zeros(len(ia), np.float64),
                             where=na > 0)
            return _emit(batch, cont)

        verified = cand.map_batches(verify_lookup, batch_format="pyarrow")
        return distinct_keys(verified, ["id_a", "id_b", "containment_r"])

    def _side(side: str) -> rd.Dataset:
        return sigs.map_batches(
            lambda b, _s=side: pa.Table.from_pydict({
                f"id_{_s}": b.column("doc_id"),
                f"sh_{_s}": b.column("sh"),
            }),
            batch_format="pyarrow",
        )

    joined = adaptive_join(cand, _side("a"), left_keys=["id_a"],
                           num_partitions=num_partitions)
    joined = adaptive_join(joined, _side("b"), left_keys=["id_b"],
                           num_partitions=num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return CONTAINMENT_SCHEMA.empty_table()

        def _flat(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return (col.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
                    col.values.to_numpy(zero_copy_only=False))

        offs_a, flat_a = _flat(batch.column("sh_a"))
        offs_b, flat_b = _flat(batch.column("sh_b"))
        cont = np.zeros(batch.num_rows, dtype=np.float64)
        for i in range(batch.num_rows):
            a = flat_a[offs_a[i]: offs_a[i + 1]]
            b = flat_b[offs_b[i]: offs_b[i + 1]]
            if len(a) == 0 or len(b) == 0:
                continue
            pos = np.searchsorted(b, a)
            pos[pos == len(b)] = len(b) - 1
            cont[i] = int(np.count_nonzero(b[pos] == a)) / len(a)
        return _emit(batch, cont)

    return distinct_keys(
        joined.map_batches(verify, batch_format="pyarrow"),
        ["id_a", "id_b", "containment_r"],
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SHIFTS = np.arange(64, dtype=np.uint64)


def _simhash_from_token_hashes(
    tok_hashes: np.ndarray, doc_token_counts: np.ndarray
) -> np.ndarray:
    """Per-doc 64-bit SimHash from flat token hashes (segmented by counts).

    signs: (n_tokens, 64) ±1 matrix; per-doc bit votes via one reduceat."""
    n_docs = len(doc_token_counts)
    out = np.zeros(n_docs, dtype=np.uint64)
    if tok_hashes.size == 0:
        return out
    # (n_tokens, 64) uint8 bit matrix in ONE pass (no 8-byte temporaries)
    bits = np.unpackbits(
        tok_hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    doc_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(doc_token_counts[:-1], out=doc_starts[1:])
    nonempty = doc_token_counts > 0
    # ones-count per (doc, bit); reduceat starts of nonempty docs are
    # strictly increasing, so segments span exactly each doc's tokens
    ones = np.add.reduceat(bits, doc_starts[nonempty], axis=0, dtype=np.int64)
    # sign-vote > 0  ⟺  ones > tokens/2 strictly (ties → 0)
    pos = (2 * ones) > doc_token_counts[nonempty, None]
    packed = np.packbits(pos, axis=1, bitorder="little")
    out[nonempty] = packed.reshape(-1).view(np.uint64)
    return out & np.uint64(0x7FFFFFFFFFFFFFFF)  # int64-safe


def _batch_simhash(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Vectorized SimHash for a string column: whitespace tokens via Arrow,
    token hashes via one segmented rolling-hash pass over the flat token
    buffer, bit votes via reduceat — no per-token Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.fill_null(col, ""))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    per_doc = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    data, offsets = _string_flat_bytes(flat)
    starts, ends = offsets[:-1], offsets[1:]
    # str.split() semantics: drop empty tokens (leading/trailing whitespace)
    keep = ends > starts
    if not keep.all():
        # per-doc counts of kept tokens
        doc_ids = np.repeat(np.arange(len(per_doc)), per_doc)
        per_doc = np.bincount(doc_ids[keep], minlength=len(per_doc)).astype(np.int64)
        starts, ends = starts[keep], ends[keep]
    bpow, S = _prefix_arrays(data)
    tok_hashes = _segment_hashes(bpow, S, starts, ends)
    return _simhash_from_token_hashes(tok_hashes, per_doc)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (deterministic vectorized
    rolling-polynomial token hashes; sign of per-bit vote sum)."""
    return int(_batch_simhash(pa.array([text], pa.string()))[0])


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = _batch_simhash(batch.column(text_col)).astype(np.int64)
    return batch.append_column("simhash", pa.array(hs, pa.int64()))


def simhash_band_pairs(batch: pa.Table, *, id_col: str = "doc_id") -> pa.Table:
    """(key, mid) rows for 16-bit-band blocking: docs within hamming distance
    3 share at least one of the 4 bands (pigeonhole), so the same
    connected-components pass clusters them."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    hashes = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    n = len(ids)
    bands = np.arange(4, dtype=np.uint64)
    # (n, 4) band values; int key = band index in the top byte + band bits
    vals = (hashes[:, None] >> (np.uint64(16) * bands[None, :])) & np.uint64(0xFFFF)
    key = ((bands[None, :] << np.uint64(56)) | vals).astype(np.int64)
    return pa.Table.from_pydict(
        {
            "key": pa.array(key.reshape(-1), pa.int64()),
            "mid": pa.array(np.repeat(ids, 4), pa.int64()),
        }
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def per_key_cap(
    ds: rd.Dataset,
    *,
    key_cols: list[str],
    order_col: str,
    n: int,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Keep at most ``n`` rows per key, the first by ``order_col`` — the
    URL/domain-level repetition cap every Common-Crawl-scale corpus pass
    runs (hub domains contribute millions of near-identical pages; capping
    per key bounds any single source's weight in the training mix).

    SQL shape: ``row_number() OVER (PARTITION BY keys ORDER BY order_col)
    <= n``.  Ray-Data-first: the hash map/reduce exchange colocates each
    key's rows (grouped_apply exchange="hash" — two task waves, partition
    count follows data size), and one vectorized pass per reduce partition
    selects each run's first ``n`` rows (grouped arange, no per-group
    Python).  Hot keys cost O(their rows) in ONE reduce task and are cut to
    ``n`` there — the cap itself is the skew relief."""
    from .canonicalize import grouped_apply

    schema = ds.schema()
    out_schema = pa.schema(
        [(f.name, f.type) for f in schema.base_schema]
    )

    def cap_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        total = block.num_rows
        if total == 0:
            return out_schema.empty_table()
        sizes = np.diff(np.r_[starts, total])
        pos_in_run = np.arange(total, dtype=np.int64) - np.repeat(
            starts.astype(np.int64), sizes
        )
        keep = np.flatnonzero(pos_in_run < n)
        return block.take(pa.array(keep, pa.int64())).select(out_schema.names)

    return grouped_apply(
        ds,
        key_cols,
        None,
        out_schema,
        num_partitions=num_partitions,
        hash_sort=True,
        block_fn=cap_block,
        order_col=order_col,
        exchange="hash",
    )


def contamination_hits(
    corpus: rd.Dataset,
    probe: rd.Dataset,
    *,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Benchmark decontamination (the GPT-3/FineWeb k-gram overlap filter):
    for every corpus doc, count its DISTINCT char k-grams that also occur
    anywhere in the probe (benchmark) set; docs with n_hits ≥ 1 are
    contamination candidates.

    Scale shape: the probe side is the benchmark suite — small by
    construction — so its sorted-unique k-gram hash set is built once
    (map partials + one zero-CPU union task) and broadcast via the object
    store; the corpus side is ONE streaming map pass (rolling-hash windows
    over each batch's flat byte buffer + a searchsorted membership probe),
    no shuffle, no join.  Hashes are the shared 61-bit rolling polynomial;
    a false hit needs a 61-bit collision (~1e-12 at 10^6 probe grams).
    Returns (doc_id, n_hits) for hit docs only."""
    import ray

    def probe_grams(batch: pa.Table) -> pa.Table:
        t = _doc_shingle_lists(batch, text_col=text_col, id_col=id_col, k=k)
        flat = np.unique(
            t.column("sh").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        )
        return pa.Table.from_pydict({"g": pa.array(flat, pa.int64())})

    parts = probe.map_batches(
        probe_grams, batch_format="pyarrow", batch_size=None
    ).materialize()

    @ray.remote(num_cpus=0)
    def union(refs: list) -> np.ndarray:
        arrs = [
            t.column("g").to_numpy(zero_copy_only=False)
            for t in ray.get(list(refs))
            if t.num_rows and "g" in t.column_names
        ]
        if not arrs:
            return np.zeros(0, np.int64)
        return np.unique(np.concatenate(arrs))

    grams_ref = union.remote(parts.to_arrow_refs())
    out_schema = pa.schema([(id_col, pa.int64()), ("n_hits", pa.int64())])

    def scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        g = ray.get(grams_ref)  # local object store, zero-copy after first get
        t = _doc_shingle_lists(batch, text_col=text_col, id_col=id_col, k=k)
        sh = t.column("sh").combine_chunks()
        flat = sh.flatten().to_numpy(zero_copy_only=False)
        sizes = np.diff(sh.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
        if g.size and flat.size:
            pos = np.searchsorted(g, flat).clip(max=g.size - 1)
            member = (g[pos] == flat).astype(np.int64)
        else:
            member = np.zeros(flat.size, np.int64)
        doc_of = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        hits = np.bincount(doc_of, weights=member, minlength=len(sizes)).astype(np.int64)
        keep = np.flatnonzero(hits > 0)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {id_col: pa.array(ids[keep], pa.int64()),
             "n_hits": pa.array(hits[keep], pa.int64())},
            schema=out_schema,
        )

    return corpus.map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Passage-level exact dedup (CCNet-style paragraph dedup)
# ---------------------------------------------------------------------------

PASSAGE_ORD_BASE = 1 << 20  # ordkey = doc_id * BASE + passage_pos


def explode_passages(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_passage: int = 20,
) -> pa.Table:
    """Explode each document into fixed-width word-window passages.

    Fully vectorized: one ``split_pattern`` per batch, then the passage
    strings are rebuilt with a single ``binary_join`` over a re-windowed
    ListArray — the chunk offsets are contiguous by construction (chunk j's
    end is chunk j+1's start within a doc, and doc boundaries meet exactly),
    so no per-row Python and no string copies beyond the joined output.

    Emits (passage:string, doc_id:int64, ordkey:int64) where
    ordkey = doc_id * 2^20 + position — a single int64 whose global MIN is
    the corpus-first occurrence of the passage (doc order, then offset).
    """
    W = int(words_per_passage)
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # null text ≡ empty doc (real corpora carry nulls; a null list slot would
    # desync the offset math below)
    col = pc.fill_null(col, "")
    words = pc.split_pattern(col, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    off = words.offsets.to_numpy().astype(np.int64)
    flat = words.values
    counts = np.diff(off)
    if counts.size and counts.max() >= W * PASSAGE_ORD_BASE:
        raise ValueError("document exceeds the 2^20-passage ordkey budget")
    n_chunks = (counts + W - 1) // W
    total = int(n_chunks.sum())
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if total == 0:
        return pa.Table.from_pydict(
            {
                "passage": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "ordkey": pa.array([], pa.int64()),
            }
        )
    doc_idx = np.repeat(np.arange(len(counts)), n_chunks)
    first_of_doc = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    k = np.arange(total, dtype=np.int64) - first_of_doc
    starts = off[:-1][doc_idx] + W * k
    chunk_off = np.append(starts, off[-1]).astype(np.int32)
    chunk_list = pa.ListArray.from_arrays(pa.array(chunk_off, pa.int32()), flat)
    passages = pc.binary_join(chunk_list, " ")
    ordkey = ids[doc_idx] * PASSAGE_ORD_BASE + k
    return pa.Table.from_pydict(
        {
            "passage": passages,
            "doc_id": pa.array(ids[doc_idx], pa.int64()),
            "ordkey": pa.array(ordkey, pa.int64()),
        }
    )


def passage_dedup_stats(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_passage: int = 20,
) -> rd.Dataset:
    """Passage-level exact dedup, the CCNet/RefinedWeb paragraph-dedup shape:
    every W-word window is a passage; a passage survives only at its
    corpus-FIRST occurrence (global min of doc_id·2^20+pos).  Returns one row
    per document: (doc_id, total_passages, kept_passages) — the retention
    profile a corpus pass uses to drop or rewrite boilerplate-heavy pages.

    100-TB shape: the explode is a streaming map; "first occurrence" is ONE
    grouped MIN over the passage string with map-side combine (the exchange
    moves O(distinct passages per block), not O(words)); per-doc totals come
    from a counting map over the docs (no second explode); the final join is
    doc-keyed aggregate × aggregate via the adaptive broadcast/shuffle join.
    Group key is the passage text itself — exact (no collision caveat); at
    extreme scale swap the key for a 128-bit strong hash, same topology.
    """
    from ..functions.joins import adaptive_join
    from .aggregates import partial_grouped_agg

    W = int(words_per_passage)

    chunks = ds.map_batches(
        lambda b: explode_passages(
            b, text_col=text_col, id_col=id_col, words_per_passage=W
        ),
        batch_format="pyarrow",
    )
    firsts = partial_grouped_agg(chunks, ["passage"], mins={"ordkey": "mo"})

    def decode_winner(b: pa.Table) -> pa.Table:
        mo = b.column("mo").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(mo // PASSAGE_ORD_BASE, pa.int64())}
        )

    kept = partial_grouped_agg(
        firsts.map_batches(decode_winner, batch_format="pyarrow"),
        ["doc_id"],
        count_alias="kept_passages",
    )

    def totals_block(b: pa.Table) -> pa.Table:
        col = pc.fill_null(b.column(text_col), "")
        n_words = pc.add(pc.count_substring(col, " "), 1)
        tot = pc.cast(
            pc.divide(pc.add(n_words, W - 1), W), pa.int64()
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pc.cast(b.column(id_col), pa.int64()),
                "total_passages": tot,
            }
        )

    tot = ds.map_batches(totals_block, batch_format="pyarrow")
    joined = adaptive_join(tot, kept, left_keys=["doc_id"], how="left")

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": b.column("doc_id"),
                "total_passages": b.column("total_passages"),
                "kept_passages": pc.fill_null(
                    pc.cast(b.column("kept_passages"), pa.int64()), 0
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def intra_doc_repetition(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_passage: int = 20,
) -> rd.Dataset:
    """Per-document passage repetition profile (Gopher-style intra-doc
    repetition signal): (doc_id, total_passages, distinct_passages) over
    fixed W-word windows.

    100-TB shape: NO shuffle at all — a document is one input row, so all
    its passages emerge from the same batch; the explode + per-doc distinct
    count (two C++ hash group_bys) run entirely inside one streaming map."""
    W = int(words_per_passage)

    def per_block(batch: pa.Table) -> pa.Table:
        chunks = explode_passages(
            batch, text_col=text_col, id_col=id_col, words_per_passage=W
        )
        per_pass = chunks.group_by(["doc_id", "passage"]).aggregate(
            [("ordkey", "count")]
        )
        # select by pyarrow's generated "{col}_{fn}" names, never by position
        dist = (
            per_pass.group_by("doc_id")
            .aggregate([("passage", "count")])
            .select(["doc_id", "passage_count"])
            .rename_columns(["doc_id", "distinct_passages"])
        )
        tot = (
            chunks.group_by("doc_id")
            .aggregate([("passage", "count")])
            .select(["doc_id", "passage_count"])
            .rename_columns(["doc_id", "total_passages"])
        )
        joined = tot.join(dist, keys="doc_id")
        return pa.Table.from_pydict(
            {
                "doc_id": joined.column("doc_id"),
                "total_passages": pc.cast(
                    joined.column("total_passages"), pa.int64()
                ),
                "distinct_passages": pc.cast(
                    joined.column("distinct_passages"), pa.int64()
                ),
            }
        )

    return ds.map_batches(per_block, batch_format="pyarrow")


def dedup_keep_best(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = 16,
    k: int = 5,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Near-dup dedup with KEEP-BEST representative selection — the policy a
    training-data pass actually ships (drop near-duplicates, keep each
    cluster's highest-quality member, not an arbitrary first).

    Composition of existing scale paths: MinHash-LSH connected components
    (banded int keys → distributed CC) left-joined onto per-doc quality
    scores (docs without collisions are singleton clusters of themselves),
    then ONE grouped_topk(k=1) per cluster by (quality desc, doc_id asc).
    Returns (cluster, doc_id, q_int): the kept representative per cluster.
    """
    from ..functions.joins import adaptive_join
    from .aggregates import grouped_topk
    from .textops import add_quality_score

    def score_block(b: pa.Table) -> pa.Table:
        t = add_quality_score(b, text_col=text_col)
        qi = pc.cast(
            pc.floor(
                pc.add(pc.multiply(t.column("quality_score"), 10000.0), 0.5)
            ),
            pa.int64(),
        )
        return pa.Table.from_pydict(
            {id_col: pc.cast(t.column(id_col), pa.int64()), "q_int": qi}
        )

    quality = ds.map_batches(score_block, batch_format="pyarrow")
    comps = minhash_lsh_components(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, k=k, num_partitions=num_partitions,
    )
    marked = adaptive_join(
        quality, comps, left_keys=[id_col], right_keys=["mid"], how="left",
        num_partitions=num_partitions,
    )

    def finish(b: pa.Table) -> pa.Table:
        from ..functions.arrow_utils import safe_coalesce

        cluster = safe_coalesce(
            pc.cast(b.column("comp"), pa.int64()),
            pc.cast(b.column(id_col), pa.int64()),
        )
        return pa.Table.from_pydict(
            {
                "cluster": cluster,
                id_col: b.column(id_col),
                "q_int": b.column("q_int"),
            }
        )

    clustered = marked.map_batches(finish, batch_format="pyarrow")
    return grouped_topk(
        clustered, ["cluster"], value_col="q_int", tiebreak_cols=[id_col],
        k=1, num_partitions=num_partitions,
    )


# ---------------------------------------------------------------------------
# Exact-substring self-dedup (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better" — the ExactSubstr check at window granularity)
# ---------------------------------------------------------------------------


def _window_strings(flat, starts: np.ndarray, n: int) -> pa.Array:
    """Exact n-token window strings for SELECTED window starts.

    ``flat`` is the batch-wide flat token array from
    ``textops._window_token_hashes``; window i's string is
    flat[starts[i] : starts[i]+n] joined by ' ' (string_split(' ')
    semantics, so the SQL mirror is array_to_string of a list slice).
    One vectorized take + one fixed-width list rewindow + one binary_join —
    no per-window Python."""
    if starts.size == 0:
        return pa.array([], pa.string())
    idx = (starts[:, None] + np.arange(n, dtype=np.int64)[None, :]).ravel()
    vals = flat.take(pa.array(idx, pa.int64()))
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    offs = np.arange(0, starts.size * n + 1, n, dtype=np.int64)
    la = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), vals)
    return pc.binary_join(la, " ")


def substring_dedup(
    ds: rd.Dataset,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Exact-substring SELF-deduplication profile: for every document, how
    many of its distinct n-token windows appear verbatim in an EARLIER
    document (smaller id).  Returns one row per doc:
    (doc_id, n_windows, n_dup_windows) — the per-doc overlap profile an
    ExactSubstr-style pass (Lee et al. 2021) thresholds to drop or trim
    documents that are substring-duplicates of earlier crawl content.
    Companion to ``contamination_hits``/``ngram_decontaminate`` (those
    check a CROSS-corpus probe set; this one is within-corpus).

    Scale shape (exact answers, hash-sized exchanges):
      1. per-doc stats are computed ENTIRELY in-block (a document is one
         row): distinct windows counted by 64-bit window hash, with an
         exact string verify of any multi-occurrence (doc, hash) group so
         a within-doc hash collision cannot undercount;
      2. the only all-to-all moves distinct (window-hash, doc) pairs
         (16 B/row) through `partial_grouped_agg` — window STRINGS never
         enter the first exchange;
      3. hashes seen in ≥2 docs (rare on non-degenerate corpora) are
         broadcast via ``ray.put``; a second streaming pass extracts the
         exact window strings for ONLY those candidates and a string-keyed
         grouped MIN settles first-occurrence exactly — a cross-doc hash
         collision is rejected by the string compare, so the result is
         bit-exact vs the SQL oracle with no probabilistic caveat.
    """
    import ray

    from ..functions.joins import _dataset_to_table, adaptive_join
    from .aggregates import partial_grouped_agg
    from .textops import _window_token_hashes

    def doc_stats(b: pa.Table) -> pa.Table:
        flat, ws, wd, wh = _window_token_hashes(b.column(text_col), n)
        ids = pc.cast(b.column(id_col), pa.int64())
        nw = np.zeros(b.num_rows, np.int64)
        if wh.size:
            order = np.lexsort((wh, wd))
            sd, sh, sstart = wd[order], wh[order], ws[order]
            new = np.empty(sd.size, bool)
            new[0] = True
            new[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
            run_id = np.cumsum(new) - 1
            run_doc = sd[new]
            np.add.at(nw, run_doc, 1)
            run_len = np.bincount(run_id)
            multi = run_len[run_id] > 1
            if multi.any():
                # exact within-doc collision guard: a multi-occurrence
                # (doc, hash) run is usually ONE repeated window (counted
                # once, correctly); distinct-string count >1 means a real
                # 64-bit collision — add the undercount back.
                occ = np.nonzero(multi)[0]
                s = _window_strings(flat, sstart[occ], n)
                t = pa.table(
                    {"r": pa.array(run_id[occ], pa.int64()), "s": s}
                )
                g = t.group_by(["r"]).aggregate([("s", "count_distinct")])
                rr = g.column("r").to_numpy(zero_copy_only=False)
                cd = g.column("s_count_distinct").to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                np.add.at(nw, run_doc[rr], cd - 1)
        return pa.table(
            {id_col: ids, "n_windows": pa.array(nw, pa.int64())}
        )

    _pairs_schema = {"wh": pa.int64(), id_col: pa.int64()}

    def pair_rows(b: pa.Table) -> pa.Table:
        flat, ws, wd, wh = _window_token_hashes(b.column(text_col), n)
        if not wh.size:
            return pa.table(
                {c: pa.array([], t) for c, t in _pairs_schema.items()}
            )
        ids = pc.cast(b.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        key = np.empty(wh.size, dtype=[("h", np.uint64), ("d", np.int64)])
        key["h"] = wh
        key["d"] = ids[wd]
        u = np.unique(key)
        return pa.table(
            {
                "wh": pa.array(u["h"].copy().view(np.int64), pa.int64()),
                id_col: pa.array(u["d"].copy(), pa.int64()),
            }
        )

    base = ds.map_batches(doc_stats, batch_format="pyarrow")

    pairs = ds.map_batches(pair_rows, batch_format="pyarrow")
    per_h = partial_grouped_agg(pairs, ["wh"], count_alias="n_docs")
    shared_tbl = _dataset_to_table(
        per_h.filter(expr="n_docs > 1").select_columns(["wh"])
    )

    def with_zero(b: pa.Table) -> pa.Table:
        return b.append_column(
            "n_dup_windows", pa.array(np.zeros(b.num_rows, np.int64))
        )

    if shared_tbl.num_rows == 0:
        return base.map_batches(with_zero, batch_format="pyarrow")

    sh_ref = ray.put(
        np.sort(shared_tbl.column("wh").to_numpy(zero_copy_only=False))
    )

    _cand_schema = {"w": pa.string(), id_col: pa.int64()}

    def cand_rows(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {c: pa.array([], t) for c, t in _cand_schema.items()}
        )
        flat, ws, wd, wh = _window_token_hashes(b.column(text_col), n)
        if not wh.size:
            return empty
        hs = ray.get(sh_ref)
        whi = wh.view(np.int64)
        pos = np.searchsorted(hs, whi)
        pos[pos == hs.size] = 0
        cand = np.nonzero(hs[pos] == whi)[0]
        if not cand.size:
            return empty
        ids = pc.cast(b.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "w": _window_strings(flat, ws[cand], n),
                id_col: pa.array(ids[wd[cand]], pa.int64()),
            }
        )
        return t.group_by(["w", id_col]).aggregate([])

    cands = ds.map_batches(cand_rows, batch_format="pyarrow").materialize()
    firsts = partial_grouped_agg(cands, ["w"], mins={id_col: "first_doc"})
    marked = adaptive_join(cands, firsts, left_keys=["w"], how="inner")

    def dup_rows(bt: pa.Table) -> pa.Table:
        keep = pc.greater(bt.column(id_col), bt.column("first_doc"))
        return pa.table({id_col: bt.column(id_col).filter(keep)})

    ndup = partial_grouped_agg(
        marked.map_batches(dup_rows, batch_format="pyarrow"),
        [id_col],
        count_alias="n_dup_windows",
    )
    joined = adaptive_join(base, ndup, left_keys=[id_col], how="left")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_windows": b.column("n_windows"),
                "n_dup_windows": pc.fill_null(
                    pc.cast(b.column("n_dup_windows"), pa.int64()), 0
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def boilerplate_strip(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_passage: int = 20,
    min_df: int = 2,
) -> rd.Dataset:
    """Cross-document boilerplate REMOVAL — the rewrite half of passage
    dedup (CCNet/RefinedWeb drop repeated nav/footer blocks, not just
    count them): any passage appearing in ≥ ``min_df`` distinct documents
    is stripped from every document; returns one row per doc
    (doc_id, clean_text, n_kept, n_dropped), clean_text = the kept
    passages re-joined in document order.

    Scale shape: passage document-frequency comes from ONE distinct
    (passage, doc) collapse + a map-side-combined count (exchange
    O(distinct passages), never words); the frequent set — bounded by the
    passages that actually repeat — broadcasts via ``ray.put``; the
    REWRITE is a second streaming map, fully in-block (a doc is one row):
    one explode, one C++ is_in, one ListArray re-window + binary_join.
    No shuffle touches document text."""
    import ray

    from ..functions.joins import _dataset_to_table
    from .aggregates import distinct_keys, partial_grouped_agg

    W = int(words_per_passage)

    chunks = ds.map_batches(
        lambda b: explode_passages(
            b, text_col=text_col, id_col=id_col, words_per_passage=W
        ),
        batch_format="pyarrow",
    )
    pairs = distinct_keys(
        chunks.map_batches(
            lambda t: t.select(["passage", "doc_id"]), batch_format="pyarrow"
        ),
        ["passage", "doc_id"],
    )
    df = partial_grouped_agg(pairs, ["passage"], count_alias="_df")
    freq_tbl = _dataset_to_table(
        df.filter(expr=f"_df >= {int(min_df)}").select_columns(["passage"])
    )
    freq_arr = freq_tbl.column("passage")
    if isinstance(freq_arr, pa.ChunkedArray):
        freq_arr = freq_arr.combine_chunks()
    freq_ref = ray.put(freq_arr)

    def rebuild(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_kept": pa.array([], pa.int64()),
                "n_dropped": pa.array([], pa.int64()),
            })
        freq = ray.get(freq_ref)
        ch = explode_passages(
            b, text_col=text_col, id_col=id_col, words_per_passage=W
        )
        ids = pc.cast(b.column(id_col), pa.int64())
        di = pc.index_in(ch.column("doc_id"), value_set=ids).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        kept_mask = pc.invert(
            pc.is_in(ch.column("passage"), value_set=freq)
        )
        km = kept_mask.to_numpy(zero_copy_only=False)
        total = np.bincount(di, minlength=n)
        keptc = np.bincount(di[km], minlength=n)
        kept_vals = ch.column("passage").filter(kept_mask)
        if isinstance(kept_vals, pa.ChunkedArray):
            kept_vals = kept_vals.combine_chunks()
        offs = np.r_[0, np.cumsum(keptc)].astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kept_vals)
        return pa.table({
            id_col: ids,
            "clean_text": pc.binary_join(la, " "),
            "n_kept": pa.array(keptc, pa.int64()),
            "n_dropped": pa.array(total - keptc, pa.int64()),
        })

    return ds.map_batches(rebuild, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Edit-distance-bounded fuzzy join (FastSS deletion-neighborhood blocking).
# ---------------------------------------------------------------------------


def levenshtein_bounded(a: str, b: str, k: int) -> int:
    """Banded Levenshtein DP (Ukkonen): exact distance if ≤ k, else k+1.
    O(k·min(len)) — the verify kernel for ``edit_distance_pairs``."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > k:
        return k + 1
    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        lo = max(1, j - k)
        hi = min(la, j + k)
        if lo > 1:
            cur[lo - 1] = k + 1  # outside the band
        bj = b[j - 1]
        best = k + 1 if lo > 1 else cur[0]
        for i in range(lo, hi + 1):
            if a[i - 1] == bj:
                c = prev[i - 1]
            else:
                c = 1 + min(prev[i - 1], prev[i], cur[i - 1])
            cur[i] = c
            if c < best:
                best = c
        if hi < la:
            cur[hi + 1 :] = [k + 1] * (la - hi)
        if best > k:
            return k + 1
        prev, cur = cur, prev
    return prev[la] if prev[la] <= k else k + 1


def _deletion_variants(s: str, k: int) -> set[str]:
    """All strings reachable by deleting ≤ k characters (FastSS
    neighborhood).  |N(s)| = 1 + L + L(L−1)/2 at k=2."""
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def edit_distance_pairs(
    ds: rd.Dataset,
    *,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    num_partitions: int = 16,
    max_bucket: int = 4096,
) -> rd.Dataset:
    """All pairs within Levenshtein distance ``max_dist`` — EXACT, via FastSS
    (Bocek et al. 2007): ed(a, b) ≤ k ⟹ their ≤k-deletion neighborhoods
    intersect, so grouping rows by hashed deletion variants yields a
    complete candidate set; a banded DP verify inside each bucket makes it
    exact.  Returns (a, b, dist) with a < b by id.

    Scale shape: each row fans out to |N(s)| (hash, id, string) rows —
    O(L²) per string at k=2, bounded for the name/title/key columns this
    targets — through the hash map/reduce exchange; per bucket, pairs are
    length-prefiltered then DP-verified (strings travel WITH the rows, no
    broadcast side); cross-bucket duplicates collapse in one distinct pass.
    ``max_bucket`` caps degenerate buckets (the LSH hot-bucket guard) —
    leave large when exactness vs an oracle is required."""
    from ..functions.hashing import hash_string_array
    from .aggregates import distinct_keys
    from .canonicalize import grouped_apply

    schema = pa.schema(
        [(f.name, f.type)
         for f in ds.schema(fetch_if_missing=True).base_schema]
    )
    id_type = schema.field(id_col).type
    k = int(max_dist)

    def variant_rows(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        out_id: list = []
        out_s: list[str] = []
        variants: list[str] = []
        for i, s in zip(ids, texts):
            s = s or ""
            vs = _deletion_variants(s, k)
            variants.extend(vs)
            out_id.extend([i] * len(vs))
            out_s.extend([s] * len(vs))
        key = hash_string_array(pa.array(variants, pa.string())).view(np.int64)
        return pa.table({
            "key": pa.array(key, pa.int64()),
            id_col: pa.array(out_id, id_type),
            text_col: pa.array(out_s, pa.string()),
        })

    banded = ds.map_batches(variant_rows, batch_format="pyarrow")
    pair_schema = pa.schema([
        pa.field("a", id_type), pa.field("b", id_type),
        pa.field("sa", pa.string()), pa.field("sb", pa.string()),
    ])

    def bucket_pairs(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        lens = np.diff(np.r_[starts, n])
        ids = block.column(id_col).to_pylist()
        txt = block.column(text_col).to_pylist()
        out_a, out_b, out_sa, out_sb = [], [], [], []
        for s, ln in zip(starts.tolist(), lens.tolist()):
            if ln < 2 or ln > max_bucket:
                continue
            seen = set()
            for i in range(s, s + ln):
                for j in range(i + 1, s + ln):
                    ia, ib = ids[i], ids[j]
                    if ia == ib:
                        continue  # the same row in several variants
                    if ia > ib:
                        ia, ib = ib, ia
                        wa, wb = txt[j], txt[i]
                    else:
                        wa, wb = txt[i], txt[j]
                    if (ia, ib) in seen or abs(len(wa) - len(wb)) > k:
                        continue
                    seen.add((ia, ib))
                    out_a.append(ia)
                    out_b.append(ib)
                    out_sa.append(wa)
                    out_sb.append(wb)
        return pa.table({
            "a": pa.array(out_a, id_type), "b": pa.array(out_b, id_type),
            "sa": pa.array(out_sa, pa.string()),
            "sb": pa.array(out_sb, pa.string()),
        }, schema=pair_schema)

    candidates = grouped_apply(
        banded, ["key"], None, pair_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=bucket_pairs, exchange="hash",
    )
    candidates = distinct_keys(candidates, ["a", "b", "sa", "sb"])

    out_schema = pa.schema([
        pa.field("a", id_type), pa.field("b", id_type),
        pa.field("dist", pa.int64()),
    ])

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        sa = b.column("sa").to_pylist()
        sb = b.column("sb").to_pylist()
        dist = np.fromiter(
            (levenshtein_bounded(x, y, k) for x, y in zip(sa, sb)),
            np.int64, count=len(sa),
        )
        keep = dist <= k
        return pa.table({
            "a": b.column("a").filter(pa.array(keep)),
            "b": b.column("b").filter(pa.array(keep)),
            "dist": pa.array(dist[keep], pa.int64()),
        }, schema=out_schema)

    return candidates.map_batches(verify, batch_format="pyarrow")

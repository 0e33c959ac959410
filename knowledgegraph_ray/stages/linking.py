"""Entity linking: fuzzy candidate generation + scoring (the north-star
capability beyond the reference's exact-only rules).

The reference's systematic matching rules are exact-key only
(/root/reference/src/workspace_kg/components/systematic_merge_provider.py:97-135
over the rule schema at entity_config.yaml:493-615), so typo'd or
transliterated surface forms of one real-world entity stay separate nodes.
This stage adds the north-star linking path — "scoring candidate mentions
against an alias dictionary plus embedding ANN index" — as an OPTIONAL
stage feeding extra connected-component pairs into canonicalization:

* **embedding ANN candidates** — every mention's normalized surface embeds
  as a character-{2,3}-gram feature-hashing vector (deterministic; a real
  model backend plugs into the same plumbing like stages/embedder.py);
  MinHash-LSH bands over the surface's 3-byte shingles (r=2 rows/band —
  the right operating point for the 0.3-0.6 Jaccard of typo pairs; band
  keys are salted WITH the entity type so only same-type mentions pair)
  generate candidates, and an exact cosine verify inside the band-sorted
  blocks scores them; pairs at or above ``threshold`` union the two
  mentions.
* **alias-dictionary candidates** — a mention's normalized name and its
  ``aliases`` attribute values emit keys in one shared namespace, linking
  "Bob Smith" to a mention whose aliases contain "Bob Smith" (the
  reference keeps name and alias namespaces separate, so exact rules never
  make this connection).

Both emit rows in canonicalize.PAIR_SCHEMA, so the SAME distributed CC /
merge machinery consumes them — linking changes which mentions share a
component, nothing downstream.  The stage is OFF by default: flagship
outputs are byte-identical with ``linking=None`` (reference parity).

Scale shape: banding emits (band-bucket key, mid, vec) rows through the
same range-sort colocation as every CC pass (vec = dim float32 ≈ 512 B/row
× bands — prune ``bands`` or raise ``shingle_k`` for very hot corpora);
candidate recall for a pair at 3-gram Jaccard j is 1-(1-j²)^bands (≥0.93
at j=0.29, ≥0.99 at j=0.4 with the default 32 bands).  Hot buckets (very
common surnames) verify quadratically within the bucket — inherent to LSH
blocking; the cosine verify is vectorized and chunked.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import hash_string_array, mix64, string_flat_bytes
from .canonicalize import PAIR_SCHEMA

# independent namespace separator (canonicalize.SEP is \x1e)
_NS = "\x1d__linkdict__\x1d"


@dataclass(frozen=True)
class LinkingConfig:
    """Knobs for the optional fuzzy-linking stage.

    threshold   — min cosine between char-{2,3}-gram vectors to union a
                  pair.  Measured on the default embedding: transliteration
                  /abbreviation/diacritic pairs 0.72-0.83, single-char
                  transpositions ~0.47, DIFFERENT people sharing a first
                  name ~0.59, unrelated names ≤0.15.  The 0.6 default
                  favors precision (a false merge corrupts a node; a missed
                  typo pair only leaves two nodes); a real model backend
                  with contextual embeddings separates these regimes far
                  better than any character statistic can.
    dim         — embedding width (feature-hashing buckets; estimator noise
                  shrinks as 1/sqrt(dim))
    ngram_sizes — character n-gram sizes folded into one vector
    num_perm / bands — MinHash-LSH layout for candidates (r = num_perm /
                  bands rows per band; default 64/32 → r=2)
    shingle_k   — byte-shingle size for the candidate MinHash
    alias_dictionary — also link name↔alias exact matches (one namespace)
    min_chars   — surfaces shorter than this never generate ANN candidates
                  (tiny strings make n-gram cosine meaningless)
    """

    threshold: float = 0.6
    dim: int = 128
    ngram_sizes: tuple = (2, 3)
    num_perm: int = 64
    bands: int = 32
    shingle_k: int = 3
    alias_dictionary: bool = True
    min_chars: int = 4
    # Buckets larger than this are skipped by the verify (hot buckets come
    # from low-information bands — a MinHash minimum landing on a shingle
    # every surface shares, e.g. a common prefix/suffix token — and their
    # pair count grows quadratically with the corpus).  A true pair is lost
    # only if EVERY band it collides in is hot; close variants collide in
    # most of the 32 bands, almost all keyed by content shingles.
    max_bucket: int = 64


def _norm_surfaces(col: "pa.Array | pa.ChunkedArray") -> pa.Array:
    import pyarrow.compute as pc

    s = pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(col, "")))
    return s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s


def char_ngram_vectors(
    col: "pa.Array | pa.ChunkedArray", *, dim: int = 128,
    sizes: tuple = (2, 3),
) -> np.ndarray:
    """(rows, dim) float32 unit vectors: signed feature hashing of each
    string's character (byte) n-grams over ALL the given sizes — one
    rolling-hash pass per size over the flat batch buffer, one bincount
    scatter; no per-row Python.  Two strings' cosine approximates their
    combined n-gram-multiset cosine (typos/transliterations ~0.6+,
    unrelated names ~0)."""
    from .dedup import _window_hashes

    data, offsets = string_flat_bytes(col)
    n_rows = len(offsets) - 1
    out = np.zeros((n_rows, dim), dtype=np.float32)
    if n_rows == 0 or data.size == 0:
        return out
    starts, ends = offsets[:-1], offsets[1:]
    acc = np.zeros(n_rows * dim, dtype=np.float64)
    for n in sizes:
        H = _window_hashes(data, n)
        counts = np.maximum(ends - starts - n + 1, 0)
        if not counts.any():
            continue
        # windows crossing row boundaries are invalid (range-mark diff scan)
        marks = np.zeros(H.size + 1, dtype=np.int32)
        nz = counts > 0
        np.add.at(marks, starts[nz], 1)
        np.add.at(marks, (starts + counts)[nz], -1)
        valid = np.cumsum(marks[:-1]) > 0
        Hv = mix64(H[valid] ^ np.uint64(0xA5A5A5A5 * n))  # size-salted family
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        bucket = (Hv % np.uint64(dim)).astype(np.int64)
        sign = np.where((Hv >> np.uint64(62)) & np.uint64(1), -1.0, 1.0)
        acc += np.bincount(rows * dim + bucket, weights=sign,
                           minlength=n_rows * dim)
    out = acc.reshape(n_rows, dim).astype(np.float32)
    norms = np.linalg.norm(out, axis=1)
    nz_rows = norms > 0
    out[nz_rows] /= norms[nz_rows, None]
    return out


def _pair_hashes(mid_a: np.ndarray, mid_b: np.ndarray):
    """Synthetic 128-bit CC key per linked mention pair: both mentions emit
    the key, so the pair unions in connected components."""
    lo = np.minimum(mid_a, mid_b).astype(np.uint64)
    hi = np.maximum(mid_a, mid_b).astype(np.uint64)
    kh = mix64(lo * np.uint64(0x9E3779B97F4A7C15) ^ mix64(hi))
    kl = mix64(hi * np.uint64(0xC4CEB9FE1A85EC53) ^ mix64(lo) ^ np.uint64(0x5EED))
    return kh.astype(np.int64), kl.astype(np.int64)


def _vec_index_task_fn(refs: list):
    """(sorted mids, (n, dim) float32 matrix) — ONE shared zero-copy vector
    index in the object store, so the banded shuffle carries 16 B/row and
    the verify gathers vectors locally (the functions/joins.py pattern)."""
    import ray

    tbls = [t for t in ray.get(refs) if t.num_rows]
    if not tbls:
        return np.empty(0, np.int64), np.empty((0, 0), np.float32)
    t = pa.concat_tables(tbls).combine_chunks().sort_by("mid")
    mids = t.column("mid").to_numpy(zero_copy_only=False).astype(np.int64)
    vec = t.column("vec")
    if isinstance(vec, pa.ChunkedArray):
        vec = vec.combine_chunks()
    dim = vec.type.list_size
    V = vec.values.to_numpy(zero_copy_only=False).reshape(len(mids), dim)
    return mids, V


import ray as _ray  # noqa: E402

_vec_index_task = _ray.remote(num_cpus=0)(_vec_index_task_fn)

_VEC_INDEX_CACHE: dict = {}


def _resolve_vec_index(ref):
    import ray

    from knowledgegraph_ray.stages import linking as _mod

    key = ref.hex()
    hit = _mod._VEC_INDEX_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        _mod._VEC_INDEX_CACHE.clear()  # one live index per worker
        _mod._VEC_INDEX_CACHE[key] = hit
    return hit


def scored_candidate_pairs(
    mentions: rd.Dataset, cfg: LinkingConfig
) -> rd.Dataset:
    """(mid_a, mid_b, cos_r) mention pairs whose normalized surfaces score
    at or above cfg.threshold under the char-n-gram embedding, generated by
    type-salted MinHash-LSH banding and verified exactly (the scoring half
    of the linking stage, exposed for tests and queries)."""

    def embed_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table({
            "mid": pa.array([], pa.int64()),
            "surf": pa.array([], pa.string()),
            "etype": pa.array([], pa.string()),
            "vec": pa.array([], pa.list_(pa.float32(), cfg.dim)),
        })
        if b.num_rows == 0:
            return empty
        surf = _norm_surfaces(b.column("entity_name"))
        vecs = char_ngram_vectors(surf, dim=cfg.dim, sizes=cfg.ngram_sizes)
        lens = pc.utf8_length(surf).to_numpy(zero_copy_only=False)
        keep = (lens >= cfg.min_chars) & (np.linalg.norm(vecs, axis=1) > 0)
        if not keep.any():
            return empty
        keep_arr = pa.array(keep)
        vecs = vecs[keep]
        flat_v = pa.array(vecs.reshape(-1), pa.float32())
        return pa.table({
            "mid": b.column("mid").filter(keep_arr),
            "surf": surf.filter(keep_arr),
            "etype": b.column("entity_type").filter(keep_arr),
            "vec": pa.FixedSizeListArray.from_arrays(flat_v, cfg.dim),
        })

    embedded = mentions.map_batches(embed_rows, batch_format="pyarrow").materialize()
    idx_ref = _vec_index_task.remote(
        embedded.select_columns(["mid", "vec"]).to_arrow_refs()
    )

    def band_rows(b: pa.Table) -> pa.Table:
        from .dedup import _band_buckets, _batch_signatures

        if b.num_rows == 0:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "mid": pa.array([], pa.int64()),
            })
        surf = b.column("surf")
        if isinstance(surf, pa.ChunkedArray):
            surf = surf.combine_chunks()
        mids = b.column("mid").to_numpy(zero_copy_only=False)
        et = hash_string_array(b.column("etype")).astype(np.uint64)
        sigs = _batch_signatures(surf, cfg.num_perm, cfg.shingle_k)
        buckets = _band_buckets(sigs, cfg.bands).astype(np.uint64)  # (n, bands)
        band_idx = np.arange(cfg.bands, dtype=np.uint64)
        key = mix64(
            (band_idx[None, :] << np.uint64(48))
            ^ buckets
            ^ et[:, None] * np.uint64(0x100000001B3)
        ).astype(np.int64)
        return pa.table({
            "key": pa.array(key.reshape(-1), pa.int64()),
            "mid": pa.array(np.repeat(mids, cfg.bands), pa.int64()),
        })

    banded = embedded.select_columns(["mid", "surf", "etype"]).map_batches(
        band_rows, batch_format="pyarrow"
    )

    out_schema = pa.schema([
        ("mid_a", pa.int64()), ("mid_b", pa.int64()), ("cos_r", pa.float64()),
    ])

    def verify_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return out_schema.empty_table()
        block = block.combine_chunks()
        keys = block.column("key").to_numpy(zero_copy_only=False)
        mids = block.column("mid").to_numpy(zero_copy_only=False)
        idx_mids, V = _resolve_vec_index(idx_ref)
        rows_in_idx = np.searchsorted(idx_mids, mids)
        # pair emission vectorized over ALL bucket runs at once (buckets are
        # mostly tiny — a per-run Python loop was the measured stage cost):
        # row r pairs with every later row of its run, so c[r] = run_end - r - 1
        change = np.r_[True, keys[1:] != keys[:-1]]
        run_id = np.cumsum(change) - 1
        run_start = np.flatnonzero(change)
        run_len = np.diff(np.r_[run_start, n])
        run_end = (run_start + run_len)[run_id]          # per row
        c = run_end - np.arange(n) - 1
        # hot-bucket cap (see LinkingConfig.max_bucket)
        c[run_len[run_id] > cfg.max_bucket] = 0
        csum = np.zeros(n + 1, np.int64)
        np.cumsum(c, out=csum[1:])
        outs_a, outs_b, outs_c = [], [], []
        lo = 0
        while lo < n:
            hi = int(np.searchsorted(csum, csum[lo] + (1 << 22)))
            hi = max(lo + 1, min(hi, n))
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
            a, b2 = mids[ii], mids[jj]
            ok = a != b2
            ii, jj, a, b2 = ii[ok], jj[ok], a[ok], b2[ok]
            cos = np.einsum(
                "ij,ij->i", V[rows_in_idx[ii]], V[rows_in_idx[jj]]
            )
            keep = cos >= cfg.threshold
            outs_a.append(np.minimum(a, b2)[keep])
            outs_b.append(np.maximum(a, b2)[keep])
            outs_c.append(cos[keep].astype(np.float64))
            lo = hi
        if not outs_a:
            return out_schema.empty_table()
        t = pa.table({
            "mid_a": pa.array(np.concatenate(outs_a), pa.int64()),
            "mid_b": pa.array(np.concatenate(outs_b), pa.int64()),
            "cos_r": pa.array(
                np.floor(np.concatenate(outs_c) * 1e4) / 1e4, pa.float64()),
        })
        # per-block dedup: a pair found by several bands collapses here
        return t.group_by(["mid_a", "mid_b", "cos_r"]).aggregate([])

    verified = (
        banded.sort("key")
        .map_batches(verify_block, batch_format="pyarrow", batch_size=None)
    )
    # cross-block dedup (a pair found by bands landing in different sort
    # blocks); survivors are tiny relative to the mention count —
    # adaptive distinct (zero-CPU task combine, groupby past the bound)
    from .aggregates import distinct_keys

    return distinct_keys(verified, ["mid_a", "mid_b", "cos_r"])


def alias_dict_pairs(batch: pa.Table) -> pa.Table:
    """(kh, kl, mid) rows in ONE name↔alias namespace: a mention links to
    another whose aliases contain its (normalized) name — the alias-
    dictionary half of the linking stage.  Attribute JSON parses once per
    distinct string (the _dict_col pattern)."""
    import json

    from ..functions.normalize import norm_string
    from .canonicalize import _dict_col

    if batch.num_rows == 0:
        return PAIR_SCHEMA.empty_table()

    et_v, et_i = _dict_col(batch, "entity_type")
    nm_v, nm_i = _dict_col(batch, "entity_name")
    aj_v, aj_i = _dict_col(batch, "attributes_json")
    aj_p = []
    for s in aj_v:
        try:
            d = json.loads(s) if s else {}
        except Exception:
            d = {}
        v = d.get("aliases")
        aj_p.append([x for x in v if x] if isinstance(v, list)
                    else ([v] if v else []))
    mids = batch.column("mid").to_numpy(zero_copy_only=False)
    keys: list[str] = []
    out_mids: list[int] = []
    for i in range(batch.num_rows):
        et = et_v[et_i[i]]
        vals = [nm_v[nm_i[i]]] + aj_p[aj_i[i]]
        for v in vals:
            nv = norm_string(str(v)) if v else ""
            if nv:
                keys.append(f"{et}{_NS}{nv}")
                out_mids.append(int(mids[i]))
    karr = pa.array(keys, pa.string())
    return pa.Table.from_pydict(
        {
            "kh": pa.array(hash_string_array(karr, 0).astype(np.int64), pa.int64()),
            "kl": pa.array(hash_string_array(karr, 1).astype(np.int64), pa.int64()),
            "mid": pa.array(out_mids, pa.int64()),
        },
        schema=PAIR_SCHEMA,
    )


def linking_pairs(mentions: rd.Dataset, cfg: LinkingConfig) -> rd.Dataset:
    """Extra CC pairs (canonicalize.PAIR_SCHEMA) from both linking sources;
    union with the exact-rule pairs before connected components."""
    scored = scored_candidate_pairs(mentions, cfg)

    def to_cc_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return PAIR_SCHEMA.empty_table()
        a = b.column("mid_a").to_numpy(zero_copy_only=False)
        c = b.column("mid_b").to_numpy(zero_copy_only=False)
        kh, kl = _pair_hashes(a, c)
        return pa.Table.from_pydict(
            {
                "kh": pa.array(np.concatenate([kh, kh]), pa.int64()),
                "kl": pa.array(np.concatenate([kl, kl]), pa.int64()),
                "mid": pa.array(np.concatenate([a, c]), pa.int64()),
            },
            schema=PAIR_SCHEMA,
        )

    pairs = scored.map_batches(to_cc_pairs, batch_format="pyarrow")
    if cfg.alias_dictionary:
        pairs = pairs.union(
            mentions.map_batches(alias_dict_pairs, batch_format="pyarrow")
        )
    return pairs

"""Similarity search over embedding columns (list<float>).

* Brute-force exact top-k: per-batch numpy matmul against a broadcast query
  matrix → local top-k prune → global sort + limit.  The broadcast matrix is
  `ray.put` once and read zero-copy in every task; the per-batch prune means
  the global sort sees k rows per block, not the corpus.
* IVF (inverted-file) variant: vectors assigned to their nearest of C seeded
  centroids at index time; a query probes only the top-p centroid partitions.
  This is the scale path — the probe reads 1/C of the data with p=1.
* All-pairs near-dup: blocked E @ E.T with only the upper triangle emitted.

The reference's analog is the Kuzu HNSW call QUERY_VECTOR_INDEX
(/root/reference/query_search.py:49-111, k=10, efs=200); brute-force cosine is
the exact oracle for it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """Zero-ish-copy (n, dim) float64 matrix from a list<float> column.
    Assumes equal-length vectors (enforced by the writer's schema)."""
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, flat.size // n) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def floor4(x: np.ndarray) -> np.ndarray:
    """Canonical 4-decimal floor — bit-identical to DuckDB floor(x*1e4)/1e4."""
    return np.floor(x * 10000.0) / 10000.0


def topk_cosine(
    ds: rd.Dataset,
    query_vec: np.ndarray | list[float],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Exact cosine top-k → (id_col, cos_r) sorted by (-cos_r, id)."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        E = _normalize(_batch_matrix(batch, vec_col))
        cos = floor4(E @ qv)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(cos) > k:  # local prune: only k candidates leave this block
            idx = np.argpartition(-cos, k - 1)[:k]
            cos, ids = cos[idx], ids[idx]
        return pa.Table.from_pydict(
            {id_col: pa.array(ids, pa.int64()), "cos_r": pa.array(cos, pa.float64())}
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["cos_r", id_col], descending=[True, False]).limit(k)


def allpairs_cosine_threshold(
    ds: rd.Dataset,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """All pairs (a < b) with cosine ≥ threshold → (id_a, id_b, cos_r).

    Blocked: the full normalized matrix is broadcast once; each task computes
    its block's rows against it (O(n·dim) per block, upper triangle only).
    The scale path replaces the broadcast side with LSH bucketing
    (minhash/simhash in stages/dedup.py) — documented tradeoff."""
    mat_ds = ds.select_columns([id_col, vec_col]).materialize()
    tables = ray.get(mat_ds.to_arrow_refs())
    full = pa.concat_tables([t for t in tables if t.num_columns], promote_options="default")
    all_ids = full.column(id_col).to_numpy(zero_copy_only=False)
    all_E = _normalize(_batch_matrix(full, vec_col))
    ref = ray.put((all_ids, all_E))

    def block(batch: pa.Table) -> pa.Table:
        ids_all, E_all = ray.get(ref)
        E = _normalize(_batch_matrix(batch, vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sims = E @ E_all.T
        out_a, out_b, out_c = [], [], []
        for i in range(len(ids)):
            mask = (sims[i] >= threshold) & (ids_all > ids[i])
            for j in np.nonzero(mask)[0]:
                out_a.append(int(ids[i]))
                out_b.append(int(ids_all[j]))
                out_c.append(float(np.floor(sims[i, j] * 10000.0) / 10000.0))
        return pa.Table.from_pydict(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "cos_r": pa.array(out_c, pa.float64()),
            }
        )

    return ds.map_batches(block, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF: centroid-partitioned approximate search (the 100 TB path)
# ---------------------------------------------------------------------------


def seeded_centroids(dim: int, n_centroids: int, seed: int = 7) -> np.ndarray:
    """Deterministic centroid matrix (unit rows)."""
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((n_centroids, dim)))


def ivf_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Add a `centroid` partition column (argmax cosine).  Writing the result
    with partition_cols=["centroid"] gives the probe-time pruning layout."""
    c_ref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        E = _normalize(_batch_matrix(batch, vec_col))
        best = (E @ C.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("centroid", pa.array(best, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_search(
    assigned: rd.Dataset,
    centroids: np.ndarray,
    query_vec: np.ndarray | list[float],
    *,
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Probe the n_probe centroids nearest the query, brute-force inside."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    probe = np.argsort(-(C @ qn))[:n_probe].tolist()
    subset = assigned.filter(expr=f"centroid in {probe}")
    return topk_cosine(subset, q, k=k, vec_col=vec_col, id_col=id_col)

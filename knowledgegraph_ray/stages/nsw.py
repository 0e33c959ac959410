"""Graph-based ANN index: sharded k-NN-graph small-world search.

This is the HNSW-class index the reference serves vector search from (Kuzu
HNSW with ``efs=200``, /root/reference/query_search.py:74-78).  Rather than
porting HNSW's sequential insert loop, the index is built Ray-first in the
style of partitioned graph-ANN systems (DiskANN/SPANN):

* **Sharding**: vectors are assigned to their nearest IVF centroid and laid
  out one directory per shard (same storage-pruning layout as
  ``ivf_build_index``), so the graph build is one Ray task per shard and a
  probe reads ONLY the probed shards' graph files from storage.  At 100 TB
  the centroid count C bounds the shard size (pick C so n/C stays ~1e5);
  shard builds are embarrassingly parallel.
* **Per-shard graph**: an exact k-NN graph of degree ``M`` built with
  blockwise matmuls (O(n_shard^2 * dim) flops, bounded by the shard size,
  no per-row Python), plus one deterministic long-range edge per node (a
  seeded permutation) for small-world navigability across the shard.
* **Query**: greedy best-first beam search with an ``efs``-sized candidate
  pool — exactly HNSW's efSearch semantic.  The frontier is expanded in
  batches: each iteration gathers all frontier neighbors with one fancy
  index and scores them against the query with one matmul.  Distance
  evaluations are O(efs * M) per shard instead of the shard's row count.

Exact brute force (``topk_cosine``) is the recall oracle; see
``nsw_recall_sweep`` and the measured table in BASELINE.md.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .knn import _batch_matrix, _normalize, floor4

GRAPH_FILE = "graph.parquet"
_BUILD_BLOCK = 1024  # rows per matmul block in the k-NN-graph build


def _knn_graph(E: np.ndarray, M: int) -> np.ndarray:
    """Exact cosine k-NN graph over normalized rows ``E`` -> (n, M) int32
    neighbor indices (self excluded).  Blockwise: one (B, n) matmul + one
    argpartition per block; rows with fewer than M neighbors pad with -1."""
    n = len(E)
    deg = min(M, max(n - 1, 0))
    out = np.full((n, M), -1, dtype=np.int32)
    if deg == 0:
        return out
    for lo in range(0, n, _BUILD_BLOCK):
        hi = min(lo + _BUILD_BLOCK, n)
        sims = E[lo:hi] @ E.T
        sims[np.arange(hi - lo), np.arange(lo, hi)] = -np.inf  # drop self
        idx = np.argpartition(-sims, deg - 1, axis=1)[:, :deg]
        # order each row's M picks best-first (stable tie order by index)
        row = np.arange(hi - lo)[:, None]
        order = np.lexsort((idx, -sims[row, idx]), axis=1)
        out[lo:hi, :deg] = np.take_along_axis(idx, order, axis=1).astype(np.int32)
    return out


def _long_range_edges(n: int, seed: int = 0xA5) -> np.ndarray:
    """One deterministic long-range edge per node (seeded permutation,
    self-loops rotated away) — the small-world shortcut column."""
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    perm = np.random.default_rng(seed).permutation(n).astype(np.int32)
    fix = perm == np.arange(n, dtype=np.int32)
    if fix.any():
        perm[fix] = (perm[fix] + 1) % n
    return perm


def build_shard_graph(tbl: pa.Table, *, M: int = 16, vec_col: str = "embedding",
                      id_col: str = "vec_id") -> pa.Table:
    """Graph table for one shard: (id, normalized vector, neighbor indices).
    Neighbor indices are LOCAL row positions within the shard (int32), degree
    M + 1 (k-NN edges plus the long-range column)."""
    E = _normalize(_batch_matrix(tbl, vec_col))
    n, dim = (E.shape if E.size else (len(tbl), 0))
    nbrs = _knn_graph(E, M)
    if n:
        nbrs = np.concatenate([nbrs, _long_range_edges(n)[:, None]], axis=1)
    else:
        nbrs = np.zeros((0, M + 1), dtype=np.int32)
    ids = tbl.column(id_col).cast(pa.int64())
    return pa.table(
        {
            id_col: ids,
            "_nvec": pa.FixedSizeListArray.from_arrays(
                pa.array(E.reshape(-1), pa.float64()), dim or 1
            )
            if n
            else pa.array([], pa.list_(pa.float64(), 1)),
            "_nbrs": pa.FixedSizeListArray.from_arrays(
                pa.array(nbrs.reshape(-1), pa.int32()), M + 1
            ),
        }
    )


@ray.remote
def _build_shard_task(paths: list, out_path: str, M: int, vec_col: str,
                      id_col: str) -> int:
    tbl = pa.concat_tables([pq.read_table(p, columns=[id_col, vec_col]) for p in paths])
    graph = build_shard_graph(tbl, M=M, vec_col=vec_col, id_col=id_col)
    pq.write_table(graph, out_path)
    return graph.num_rows


def nsw_build_index(ds, centroids: np.ndarray, index_dir: str, *, M: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> dict:
    """Build the sharded graph index: IVF-partitioned parquet layout, then one
    Ray task per shard writes ``centroid=<cid>/graph.parquet``.  Returns
    {cid: shard row count} (the probe-sizing map, also derivable from parquet
    footers at query time)."""
    from .knn import ivf_build_index

    ivf_build_index(ds, centroids, index_dir, vec_col=vec_col)
    futures, cids = [], []
    for name in sorted(os.listdir(index_dir)):
        d = os.path.join(index_dir, name)
        if not (name.startswith("centroid=") and os.path.isdir(d)):
            continue
        paths = [
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet") and f != GRAPH_FILE
        ]
        if not paths:
            continue
        cids.append(int(name.split("=", 1)[1]))
        futures.append(
            _build_shard_task.remote(paths, os.path.join(d, GRAPH_FILE), M, vec_col, id_col)
        )
    return dict(zip(cids, ray.get(futures)))


def beam_search(E: np.ndarray, nbrs: np.ndarray, qn: np.ndarray, *, k: int,
                efs: int, beam: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Best-first graph search with an efs-bounded candidate pool.

    Returns (row_indices, exact_cosines) of the top-k pool entries, best
    first.  Entry points are evenly spaced rows (deterministic); each
    iteration expands the ``beam`` best unexpanded pool nodes at once —
    neighbor gather is one fancy index, scoring is one matmul."""
    n = len(E)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    efs = max(int(efs), int(k), 1)
    n_entry = min(max(4, efs // 32), n)
    entries = np.unique((np.arange(n_entry) * max(n // n_entry, 1)) % n)
    visited = np.zeros(n, dtype=bool)
    expanded = np.zeros(n, dtype=bool)
    visited[entries] = True
    pool_idx = entries.astype(np.int64)
    pool_sims = E[pool_idx] @ qn
    order = np.lexsort((pool_idx, -pool_sims))[:efs]
    pool_idx, pool_sims = pool_idx[order], pool_sims[order]
    while True:
        unexp = ~expanded[pool_idx]
        if not unexp.any():
            break
        frontier = pool_idx[unexp][:beam]  # pool is sorted best-first
        expanded[frontier] = True
        neigh = nbrs[frontier].reshape(-1)
        neigh = neigh[neigh >= 0]
        neigh = np.unique(neigh).astype(np.int64)
        neigh = neigh[~visited[neigh]]
        if neigh.size == 0:
            continue
        visited[neigh] = True
        sims = E[neigh] @ qn
        pool_idx = np.concatenate([pool_idx, neigh])
        pool_sims = np.concatenate([pool_sims, sims])
        order = np.lexsort((pool_idx, -pool_sims))[:efs]
        pool_idx, pool_sims = pool_idx[order], pool_sims[order]
    return pool_idx[:k], pool_sims[:k]


@ray.remote
def _search_shard_task(graph_path: str, qn: np.ndarray, k: int, efs: int,
                       id_col: str) -> pa.Table:
    from .knn import _fixed_matrix

    tbl = pq.read_table(graph_path)
    E = _fixed_matrix(tbl, "_nvec")
    arr = tbl.column("_nbrs")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    deg = arr.type.list_size
    nbrs = arr.values.to_numpy(zero_copy_only=False).reshape(len(arr), deg)
    idx, sims = beam_search(E, nbrs, qn, k=k, efs=efs)
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)[idx]
    return pa.table(
        {id_col: pa.array(ids, pa.int64()), "cos_exact": pa.array(sims, pa.float64())}
    )


def nsw_query_index(index_dir: str, centroids: np.ndarray,
                    query_vec: np.ndarray | list, *, k: int = 10,
                    efs: int = 200, n_probe: int | None = None,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Probe the graph index: pick shards nearest the query (efs sizes the
    probe exactly as in ``ivf_query_index`` — parquet footers only, no data
    read), beam-search each probed shard's graph in a parallel Ray task with
    the same efs pool, merge + exact re-rank on the driver (k*n_probe rows).

    Returns (id_col, cos_r) sorted by (-cosine, id), cos_r floored to 4
    decimals like every other similarity surface in this repo."""
    from .knn import _efs_n_probe

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    order = np.argsort(-(C @ qn))
    counts: dict[int, int] = {}
    graph_paths: dict[int, str] = {}
    for name in os.listdir(index_dir):
        d = os.path.join(index_dir, name)
        gp = os.path.join(d, GRAPH_FILE)
        if name.startswith("centroid=") and os.path.isfile(gp):
            cid = int(name.split("=", 1)[1])
            graph_paths[cid] = gp
            counts[cid] = pq.ParquetFile(gp).metadata.num_rows
    if n_probe is None:
        n_probe = _efs_n_probe(order, counts, efs)
    probe = [int(c) for c in order[:n_probe] if int(c) in graph_paths]
    futures = [
        _search_shard_task.remote(graph_paths[cid], qn, k, efs, id_col)
        for cid in probe
    ]
    parts = [t for t in ray.get(futures) if t.num_rows] if futures else []
    if not parts:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cos_r": pa.array([], pa.float64())})
    merged = pa.concat_tables(parts)
    ids = merged.column(id_col).to_numpy(zero_copy_only=False)
    sims = merged.column("cos_exact").to_numpy(zero_copy_only=False)
    top = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {id_col: pa.array(ids[top], pa.int64()),
         "cos_r": pa.array(floor4(sims[top]), pa.float64())}
    )


def nsw_recall_sweep(index_dir: str, centroids: np.ndarray, ds,
                     query_vecs: list, *, k: int = 10,
                     efs_values: tuple = (50, 100, 200, 400),
                     vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Measured recall@k of the graph index vs the exact brute-force oracle
    (``topk_cosine`` over ``ds``) at each efs -> (efs, recall_at_k)."""
    from .knn import topk_cosine

    exact = [
        {r[id_col] for r in topk_cosine(ds, q, k=k, vec_col=vec_col,
                                        id_col=id_col).take_all()}
        for q in query_vecs
    ]
    rows = {"efs": [], "recall_at_k": []}
    for efs in efs_values:
        hits = 0
        for q, truth in zip(query_vecs, exact):
            got = nsw_query_index(index_dir, centroids, q, k=k, efs=efs,
                                  vec_col=vec_col, id_col=id_col)
            hits += len(set(got.column(id_col).to_pylist()) & truth)
        rows["efs"].append(int(efs))
        rows["recall_at_k"].append(hits / (k * len(query_vecs)))
    return pa.table(rows)

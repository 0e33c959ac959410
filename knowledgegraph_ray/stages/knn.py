"""Similarity search over embedding columns (list<float>).

* Brute-force exact top-k: per-batch numpy matmul against a broadcast query
  vector → local top-k prune → global sort + limit.  The per-batch prune
  means the global sort sees k rows per block, not the corpus.
* All-pairs near-dup (exact): distributed block-pair tasks — normalized
  matrix blocks live in the object store, one Ray task per unordered block
  pair; the driver holds only refs.  O(n²) compute is inherent to an exact
  cosine threshold-join; the subquadratic path is `neardup_pairs_lsh`.
* LSH near-dup (scale path): sign-random-projection sketches → banded
  buckets → within-bucket exact verify.  Tunable recall, linear shuffle.
* IVF (inverted-file): vectors assigned to their nearest of C seeded
  centroids; `ivf_build_index` persists the layout partitioned by centroid so
  a probe reads only the probed partitions' files from storage.

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

PAIRS_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("cos_r", pa.float64())]
)


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
    """Exact cosine top-k → (id_col, cos_r) sorted by (-cos, id).

    Ranking (local prune AND global sort) uses the EXACT cosine with an
    explicit id tiebreak; floor4 is applied only to the emitted cos_r column
    — floored ties at the k boundary therefore resolve identically to the
    SQL oracle's ORDER BY exact-similarity, vec_id."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        E = _normalize(_batch_matrix(batch, vec_col))
        cos = E @ qv
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(cos) > k:  # local prune on (-cos, id) — k candidates per block
            idx = np.lexsort((ids, -cos))[:k]
            cos, ids = cos[idx], ids[idx]
        return pa.Table.from_pydict(
            {id_col: pa.array(ids, pa.int64()), "cos_exact": pa.array(cos, pa.float64())}
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["cos_exact", id_col], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                id_col: b.column(id_col),
                "cos_r": pa.array(
                    floor4(b.column("cos_exact").to_numpy(zero_copy_only=False)),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def _norm_vec_block(batch: pa.Table, vec_col: str, id_col: str) -> pa.Table:
    """(id, fixed-size-list normalized vector) block for the pair tasks."""
    E = _normalize(_batch_matrix(batch, vec_col))
    n, dim = E.shape if E.size else (0, 0)
    flat = pa.array(E.reshape(-1), pa.float64())
    return pa.Table.from_pydict(
        {
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "_nvec": pa.FixedSizeListArray.from_arrays(flat, dim) if n else
            pa.array([], pa.list_(pa.float64(), 1)),
        }
    )


def _fixed_matrix(tbl: pa.Table, col: str) -> np.ndarray:
    arr = tbl.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dim = arr.type.list_size
    flat = arr.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), dim)


@ray.remote
def _block_pair_matches(ref_a, ref_b, same: bool, threshold: float,
                        id_col: str) -> pa.Table:
    """Matches between two normalized blocks; pair emission fully vectorized
    (one np.nonzero over the block mask, ids canonicalized a<b)."""
    ta: pa.Table = ref_a
    tb: pa.Table = ref_b
    A, B = _fixed_matrix(ta, "_nvec"), _fixed_matrix(tb, "_nvec")
    ids_a = ta.column(id_col).to_numpy(zero_copy_only=False)
    ids_b = tb.column(id_col).to_numpy(zero_copy_only=False)
    if not len(ids_a) or not len(ids_b):
        return PAIRS_SCHEMA.empty_table()
    sims = A @ B.T
    mask = sims >= threshold
    if same:
        mask &= np.triu(np.ones(sims.shape, dtype=bool), k=1)  # each index pair once
    else:
        mask &= ids_a[:, None] != ids_b[None, :]
    ii, jj = np.nonzero(mask)
    if not len(ii):
        return PAIRS_SCHEMA.empty_table()
    a, b = ids_a[ii], ids_b[jj]
    return pa.Table.from_pydict(
        {
            "id_a": pa.array(np.minimum(a, b), pa.int64()),
            "id_b": pa.array(np.maximum(a, b), pa.int64()),
            "cos_r": pa.array(floor4(sims[ii, jj]), pa.float64()),
        },
        schema=PAIRS_SCHEMA,
    )


def allpairs_cosine_threshold(
    ds: rd.Dataset,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_block_rows: int = 32768,
) -> rd.Dataset:
    """All pairs (a < b) with cosine ≥ threshold → (id_a, id_b, cos_r).

    Exact and complete: normalized blocks stay in the object store; one Ray
    task per unordered block pair matmuls the two blocks and emits matches
    via np.nonzero.  The driver holds only object refs — no whole-dataset
    materialization, no per-row Python.  O(n²/2) compute is inherent to the
    exact threshold-join; at corpus scale use `neardup_pairs_lsh` (tunable
    recall, linear shuffle) and keep this as the verification oracle."""
    mat = ds.map_batches(
        lambda b: _norm_vec_block(b, vec_col, id_col), batch_format="pyarrow"
    ).materialize()
    n = mat.count()
    nblocks = max(1, -(-n // target_block_rows))
    if mat.num_blocks() > nblocks * 2:
        mat = mat.repartition(nblocks).materialize()
    refs = mat.to_arrow_refs()
    out_refs = [
        _block_pair_matches.remote(refs[i], refs[j], i == j, threshold, id_col)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return rd.from_arrow_refs(out_refs)


# ---------------------------------------------------------------------------
# LSH near-dup: sign-random-projection sketch → banded buckets → exact verify
# ---------------------------------------------------------------------------


def _sign_planes(dim: int, n_planes: int, seed: int = 0x51C4) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def neardup_pairs_lsh(
    ds: rd.Dataset,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 64,
    bands: int = 16,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Near-duplicate pairs via sign-random-projection LSH + exact verify.

    Shape: one linear pass sketches every vector (E @ R > 0 bits, banded into
    `bands` bucket keys), a range-sort colocates bucket collisions, each
    bucket run verifies its candidates with an exact within-run matmul, and a
    final (id_a, id_b) groupby dedups pairs found in multiple bands.  Recall
    is tunable via bands×r (more bands → higher recall, more candidates);
    completeness is NOT guaranteed — `allpairs_cosine_threshold` is the
    exact oracle."""
    r = n_planes // bands
    planes_ref: "ray.ObjectRef | None" = None

    def sketch(batch: pa.Table) -> pa.Table:
        nonlocal planes_ref
        E = _normalize(_batch_matrix(batch, vec_col))
        if E.size == 0:
            return pa.Table.from_pydict(
                {"bkey": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                 "_nvec": pa.array([], pa.list_(pa.float64(), 1))}
            )
        R = _sign_planes(E.shape[1], n_planes)
        bits = (E @ R) > 0  # (n, n_planes)
        n = len(E)
        keys = np.zeros((n, bands), dtype=np.int64)
        for b in range(bands):
            chunk = bits[:, b * r : (b + 1) * r]
            val = np.zeros(n, dtype=np.int64)
            for j in range(r):
                val = (val << 1) | chunk[:, j]
            keys[:, b] = (np.int64(b) << np.int64(48)) | val
        flat = pa.array(E.reshape(-1), pa.float64())
        nvec = pa.FixedSizeListArray.from_arrays(flat, E.shape[1])
        ids = pc.cast(batch.column(id_col), pa.int64())
        idx = pa.array(np.repeat(np.arange(n), bands), pa.int64())
        return pa.Table.from_pydict(
            {
                "bkey": pa.array(keys.reshape(-1), pa.int64()),
                id_col: ids.take(idx),
                "_nvec": nvec.take(idx),
            }
        )

    def verify_runs(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return PAIRS_SCHEMA.empty_table()
        keys = block.column("bkey").to_numpy(zero_copy_only=False)
        change = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        bounds = np.r_[change, n]
        E = _fixed_matrix(block, "_nvec")
        ids = block.column(id_col).to_numpy(zero_copy_only=False)
        outs = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            sub = E[s:e]
            sims = sub @ sub.T
            m = (sims >= threshold) & np.triu(np.ones(sims.shape, bool), k=1)
            ii, jj = np.nonzero(m)
            if len(ii):
                a, b = ids[s:e][ii], ids[s:e][jj]
                outs.append((np.minimum(a, b), np.maximum(a, b), sims[ii, jj]))
        if not outs:
            return PAIRS_SCHEMA.empty_table()
        a = np.concatenate([o[0] for o in outs])
        b = np.concatenate([o[1] for o in outs])
        c = np.concatenate([o[2] for o in outs])
        keep = a != b
        return pa.Table.from_pydict(
            {"id_a": pa.array(a[keep], pa.int64()),
             "id_b": pa.array(b[keep], pa.int64()),
             "cos_r": pa.array(floor4(c[keep]), pa.float64())},
            schema=PAIRS_SCHEMA,
        )

    cand = (
        ds.map_batches(sketch, batch_format="pyarrow")
        .sort("bkey")
        .map_batches(verify_runs, batch_format="pyarrow", batch_size=None)
    )
    from .aggregates import partial_grouped_agg

    # min is order-independent, so the adaptive combine is exact here
    return partial_grouped_agg(cand, ["id_a", "id_b"], mins={"cos_r": "cos_r"})


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


def ivf_build_index(
    ds: rd.Dataset,
    centroids: np.ndarray,
    index_dir: str,
    *,
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF layout: parquet partitioned by centroid id, so a probe
    reads ONLY the probed centroids' files (directory-level pruning — the
    other partitions never leave storage)."""
    ivf_assign(ds, centroids, vec_col=vec_col).write_parquet(
        index_dir, partition_cols=["centroid"]
    )


def _efs_n_probe(order: np.ndarray, counts_by_cid: dict[int, int], efs: int) -> int:
    """HNSW-parity recall knob: probe the nearest centroids (in ``order``)
    until the scanned candidate pool reaches ``efs`` vectors — the same
    semantic as HNSW's efSearch (size of the candidate pool the search
    explores; reference query_search.py:74-78 uses efs=200)."""
    scanned = 0
    for i, cid in enumerate(order):
        scanned += counts_by_cid.get(int(cid), 0)
        if scanned >= efs:
            return i + 1
    return len(order)


def ivf_query_index(
    index_dir: str,
    centroids: np.ndarray,
    query_vec: np.ndarray | list[float],
    *,
    k: int = 10,
    n_probe: int = 2,
    efs: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Probe a persisted IVF index: read only the probed centroids'
    partition directories, brute-force inside.  ``efs`` (overrides
    n_probe) sets the minimum candidate-pool size — partition row counts
    come from parquet footers, so no data is read to size the probe."""
    import os

    import pyarrow.parquet as pq

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    order = np.argsort(-(C @ qn))
    if efs is not None:
        counts: dict[int, int] = {}
        for cid in range(len(C)):
            d = f"{index_dir}/centroid={cid}"
            if os.path.isdir(d):
                counts[cid] = sum(
                    pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
                    for f in os.listdir(d) if f.endswith(".parquet")
                )
        n_probe = _efs_n_probe(order, counts, efs)
    probe = order[:n_probe].tolist()
    paths = [
        os.path.join(d, f)
        for d in (f"{index_dir}/centroid={p}" for p in probe)
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    subset = rd.read_parquet(paths, columns=[id_col, vec_col])
    return topk_cosine(subset, q, k=k, vec_col=vec_col, id_col=id_col)


def ivf_search(
    assigned: rd.Dataset,
    centroids: np.ndarray,
    query_vec: np.ndarray | list[float],
    *,
    k: int = 10,
    n_probe: int = 2,
    efs: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Probe the centroids nearest the query, brute-force inside.

    In-memory variant (filter on the centroid column); the storage-pruning
    variant is ivf_build_index + ivf_query_index.  ``efs`` (overrides
    n_probe) is the HNSW-parity recall knob: minimum candidate-pool size."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    order = np.argsort(-(C @ qn))
    if efs is not None:
        from .aggregates import partial_grouped_agg

        cnt = partial_grouped_agg(
            assigned.select_columns(["centroid"]), ["centroid"],
            count_alias="n",
        ).take_all()
        counts = {int(r["centroid"]): int(r["n"]) for r in cnt}
        n_probe = _efs_n_probe(order, counts, efs)
    probe = order[:n_probe].tolist()
    subset = assigned.filter(expr=f"centroid in {probe}")
    return topk_cosine(subset, q, k=k, vec_col=vec_col, id_col=id_col)


def ivf_recall_sweep(
    assigned: rd.Dataset,
    centroids: np.ndarray,
    query_vecs: "list[np.ndarray]",
    *,
    k: int = 10,
    efs_values: tuple = (50, 100, 200, 400),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "pa.Table":
    """Measured recall@k vs the exact brute-force oracle at each efs value
    (the HNSW-parity table the reference exposes only implicitly through its
    efs knob) → (efs, mean_n_probe, recall_at_k, frac_scanned)."""
    total = assigned.count()
    rows = {"efs": [], "mean_n_probe": [], "recall_at_k": [], "frac_scanned": []}
    from .aggregates import partial_grouped_agg

    cnt = partial_grouped_agg(
        assigned.select_columns(["centroid"]), ["centroid"], count_alias="n"
    ).take_all()
    counts = {int(r["centroid"]): int(r["n"]) for r in cnt}
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    exact = [
        {r[id_col] for r in topk_cosine(
            assigned, q, k=k, vec_col=vec_col, id_col=id_col).take_all()}
        for q in query_vecs
    ]
    for efs in efs_values:
        hits, probes, scanned = 0, 0, 0
        for q, truth in zip(query_vecs, exact):
            qn = np.asarray(q, np.float64)
            qn = qn / (np.linalg.norm(qn) or 1.0)
            order = np.argsort(-(C @ qn))
            npb = _efs_n_probe(order, counts, efs)
            probes += npb
            scanned += sum(counts.get(int(c), 0) for c in order[:npb])
            got = {r[id_col] for r in ivf_search(
                assigned, centroids, q, k=k, n_probe=npb,
                vec_col=vec_col, id_col=id_col).take_all()}
            hits += len(got & truth)
        nq = len(query_vecs)
        rows["efs"].append(int(efs))
        rows["mean_n_probe"].append(probes / nq)
        rows["recall_at_k"].append(hits / (k * nq))
        rows["frac_scanned"].append(scanned / (total * nq) if total else 0.0)
    return pa.table(rows)


def _km_block_partials(E: np.ndarray, Cm: np.ndarray):
    """One block's fused assign+accumulate: (nonzero cids, their sum
    vectors, their counts).  Shared verbatim by the distributed and the
    small-data driver paths so both produce bit-identical float partials.
    argmin ||e − c||² = argmax (e·c − ||c||²/2); ties → lowest cid."""
    score = E @ Cm.T - 0.5 * (Cm * Cm).sum(axis=1)
    best = score.argmax(axis=1)
    sums = np.zeros((len(Cm), E.shape[1]), dtype=np.float64)
    np.add.at(sums, best, E)
    counts = np.bincount(best, minlength=len(Cm)).astype(np.int64)
    nz = np.flatnonzero(counts)
    return nz, sums[nz], counts[nz]


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 5,
    *,
    vec_col: str = "embedding",
    seed: int = 7,
    small_data_rows: int = 2_000_000,
) -> np.ndarray:
    """Distributed Lloyd's k-means over an embedding column → (k, dim)
    centroid matrix.  The iterative-algorithm pattern at scale:

      * assign + ACCUMULATE fused in one map_batches pass — each block emits
        at most k partial rows (cid, sum-vector, count) via np.add.at, so
        the per-iteration exchange is O(k x blocks) fixed-size rows, never
        the corpus;
      * the reduce is a tiny driver-side sum of those partials (k rows);
        empty clusters keep their previous centroid;
      * deterministic: seeded init (`seeded_centroids`), argmax ties break
        to the lowest cid, no wall clock — identical centroids at any
        parallelism.

    Euclidean objective on raw vectors (the standard Lloyd's update);
    assignment uses squared distance via the ||x||²-2x·c+||c||² expansion so
    each block does ONE matmul against the broadcast centroid matrix."""
    first = ds.take(1)
    if not first:
        return np.zeros((0, 0))
    dim = len(first[0][vec_col])
    C = seeded_centroids(dim, k, seed=seed)  # unit rows as the seed
    # materialize ONCE: every iteration streams the same rows, and a lazy
    # input would re-execute its whole read lineage per iteration
    mat = ds.materialize()

    if mat.count() <= small_data_rows:
        # SMALL-DATA REGIME (the pagerank/LPA precedent): below the row
        # threshold the per-iteration Dataset pass is pure scheduling
        # overhead.  Same per-block partials (_km_block_partials), combine
        # in block order — equal to the distributed path within float
        # summation order (kmeans' cross-layout contract has always been
        # allclose, not bit-exact; regime-equality tested at that bar).
        mats = [_batch_matrix(t, vec_col)
                for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
        for _ in range(iters):
            sums = np.zeros_like(C)
            counts = np.zeros(k, dtype=np.int64)
            for E in mats:
                nz, vs, cs = _km_block_partials(E, C)
                np.add.at(sums, nz, vs)
                np.add.at(counts, nz, cs)
            live = counts > 0
            C = C.copy()
            C[live] = sums[live] / counts[live, None]
        return C

    for _ in range(iters):
        c_ref = ray.put(C)

        def partials(batch: pa.Table) -> pa.Table:
            Cm = ray.get(c_ref)
            E = _batch_matrix(batch, vec_col)
            nz, vs, cs = _km_block_partials(E, Cm)
            flat = pa.array(vs.reshape(-1), pa.float64())
            return pa.Table.from_pydict(
                {
                    "cid": pa.array(nz, pa.int64()),
                    "vsum": pa.FixedSizeListArray.from_arrays(flat, E.shape[1]),
                    "n": pa.array(cs, pa.int64()),
                }
            )

        part = mat.map_batches(partials, batch_format="pyarrow").materialize()
        tbls = [t for t in ray.get(part.to_arrow_refs()) if t.num_rows]
        sums = np.zeros_like(C)
        counts = np.zeros(k, dtype=np.int64)
        for t in tbls:
            cids = t.column("cid").to_numpy(zero_copy_only=False)
            vs = _fixed_matrix(t, "vsum")
            np.add.at(sums, cids, vs)
            np.add.at(counts, cids, t.column("n").to_numpy(zero_copy_only=False))
        live = counts > 0
        C = C.copy()
        C[live] = sums[live] / counts[live, None]
    return C


def kmeans_assign_counts(
    ds: rd.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
) -> rd.Dataset:
    """(cid, n_vecs) histogram of the final k-means assignment (same
    argmax-expansion tie rule as kmeans_fit)."""
    from .aggregates import partial_grouped_agg

    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        E = _batch_matrix(batch, vec_col)
        score = E @ Cm.T - 0.5 * (Cm * Cm).sum(axis=1)
        return pa.table({"cid": pa.array(score.argmax(axis=1), pa.int64())})

    return partial_grouped_agg(
        ds.map_batches(assign, batch_format="pyarrow"), ["cid"], count_alias="n_vecs"
    )


def cross_neardup(
    ds: rd.Dataset,
    bench: pa.Table,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """SEMANTIC decontamination — the embedding-space companion to the
    exact token-overlap check (stages/textops.ngram_decontaminate): every
    (corpus id, bench id, cos_r) pair with cosine ≥ threshold between the
    streaming corpus and a SMALL benchmark table.

    Unlike the O(n²) within-corpus `allpairs_cosine_threshold`, this is
    LINEAR in the corpus: the benchmark matrix is normalized once and
    broadcast via ``ray.put``; each corpus block is one matmul against it
    (no shuffle, no pair tasks, no driver materialization of the corpus).
    Same floor4 cosine convention as the pairs oracle."""
    import ray

    B = _normalize(_batch_matrix(bench, vec_col))
    bench_ids = np.asarray(bench.column(id_col), dtype=np.int64)
    shared = ray.put((B, bench_ids))

    def scan(batch: pa.Table) -> pa.Table:
        Bm, bids = ray.get(shared)
        A = _normalize(_batch_matrix(batch, vec_col))
        ids_a = pc.cast(batch.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if not len(ids_a) or not len(bids):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos_r": pa.array([], pa.float64())})
        sims = A @ Bm.T
        ii, jj = np.nonzero(sims >= threshold)
        return pa.table({
            "id_a": pa.array(ids_a[ii], pa.int64()),
            "id_b": pa.array(bids[jj], pa.int64()),
            "cos_r": pa.array(floor4(sims[ii, jj]), pa.float64()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


_BESTS_SCHEMA = pa.schema(
    [("skey", pa.int64()), ("neg_cos", pa.float64()), ("cand", pa.int64()),
     ("pay", pa.int64())]  # = cand; grouped_arg_extrema needs tiebreak ≠ payload
)


@ray.remote
def _block_pair_bests(ref_a, ref_b, id_col: str) -> pa.Table:
    """One partial BEST per (row, opposite block) for a normalized block
    pair — the map side of the exact mutual-NN reduce.  ``skey`` packs
    (id << 1 | side) so one associative arg-extrema combine serves both
    directions; argmax ties break toward the smaller candidate id (the
    same rule the combine's tiebreak column applies across blocks)."""
    ta: pa.Table = ref_a
    tb: pa.Table = ref_b
    A, B = _fixed_matrix(ta, "_nvec"), _fixed_matrix(tb, "_nvec")
    ids_a = pc.cast(ta.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
    ids_b = pc.cast(tb.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
    if not len(ids_a) or not len(ids_b):
        return _BESTS_SCHEMA.empty_table()
    sims = A @ B.T
    big = np.iinfo(np.int64).max
    best_a = sims.max(axis=1)
    cand_a = np.where(sims == best_a[:, None], ids_b[None, :], big).min(axis=1)
    best_b = sims.max(axis=0)
    cand_b = np.where(sims == best_b[None, :], ids_a[:, None], big).min(axis=0)
    cand = pa.array(np.concatenate([cand_a, cand_b]), pa.int64())
    return pa.Table.from_pydict(
        {
            "skey": pa.array(
                np.concatenate([ids_a << 1, (ids_b << 1) | 1]), pa.int64()
            ),
            "neg_cos": pa.array(
                np.concatenate([-best_a, -best_b]), pa.float64()
            ),
            "cand": cand,
            "pay": cand,
        },
        schema=_BESTS_SCHEMA,
    )


def mutual_nn_pairs(
    ds_a: rd.Dataset,
    ds_b: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_block_rows: int = 32768,
) -> rd.Dataset:
    """Mutual (reciprocal) top-1 nearest neighbors across two vector sets
    → (id_a, id_b, cos_r): pairs where b is a's best cross-set match AND
    a is b's — the candidate rule of margin-based parallel-corpus mining
    (Artetxe & Schwenk 2019).  EXACT top-1 (every pair is scored — no
    candidate pruning) and partition-invariant UP TO FLOAT
    REPRODUCIBILITY: block-pair tasks matmul normalized blocks and emit
    ONE partial best per (row, opposite block); grouped_arg_extrema's
    associative first-by-(order, tiebreak) combine reduces them (cosine
    ties break toward the smaller candidate id, the in-block rule above);
    mutuality is a count == 2 filter on the (id_a, id_b) pair group — no
    join stage.  Caveat: argmax selection compares raw BLAS floats (floor4
    applies only to the emitted cos_r), so a cosine tie at dgemm
    accumulation-order granularity (~1 ulp) can resolve differently across
    block shapes or vs a serial oracle — selection-tie stability is only
    guaranteed for ties exact at float64.  O(|A|·|B|)
    compute is inherent to the exact top-1 — this is the oracle op; at
    corpus scale generate candidates with the NSW/IVF index and verify
    the survivors here."""
    from .aggregates import grouped_arg_extrema, partial_grouped_agg

    def prep(ds: rd.Dataset) -> list:
        mat = ds.map_batches(
            lambda b: _norm_vec_block(b, vec_col, id_col),
            batch_format="pyarrow",
        ).materialize()
        nblocks = max(1, -(-mat.count() // target_block_rows))
        if mat.num_blocks() > nblocks * 2:
            mat = mat.repartition(nblocks).materialize()
        return list(mat.to_arrow_refs())

    refs_a, refs_b = prep(ds_a), prep(ds_b)
    if not refs_a or not refs_b:
        return rd.from_arrow(PAIRS_SCHEMA.empty_table())
    partials = rd.from_arrow_refs(
        [_block_pair_bests.remote(ra, rb, id_col)
         for ra in refs_a for rb in refs_b]
    )
    best = grouped_arg_extrema(
        partials, key_col="skey", order_col="neg_cos",
        tiebreak_col="cand", payload_col="pay",
    )

    def decode(b: pa.Table) -> pa.Table:
        sk = pc.cast(b.column("skey"), pa.int64()).to_numpy(zero_copy_only=False)
        own, side = sk >> 1, sk & 1
        cand = b.column("first_pay").to_numpy(zero_copy_only=False)
        cos = -b.column("first_neg_cos").to_numpy(zero_copy_only=False)
        return pa.table({
            "id_a": pa.array(np.where(side == 0, own, cand), pa.int64()),
            "id_b": pa.array(np.where(side == 0, cand, own), pa.int64()),
            "cos": pa.array(cos, pa.float64()),
        })

    agg = partial_grouped_agg(
        best.map_batches(decode, batch_format="pyarrow"),
        ["id_a", "id_b"], mins={"cos": "cos"}, count_alias="n_dir",
    )

    def finish(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("n_dir"), 2))
        return pa.Table.from_pydict(
            {
                "id_a": pc.cast(t.column("id_a"), pa.int64()),
                "id_b": pc.cast(t.column("id_b"), pa.int64()),
                "cos_r": pa.array(
                    floor4(t.column("cos").to_numpy(zero_copy_only=False)),
                    pa.float64(),
                ),
            },
            schema=PAIRS_SCHEMA,
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def semdedup(
    ds: rd.Dataset,
    *,
    k: int = 8,
    tau: float = 0.95,
    iters: int = 5,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 16,
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means clustering + WITHIN-cluster cosine pruning — the scale answer
    to `allpairs_cosine_threshold`'s O(n²): pairwise work is confined to
    clusters, so total compute is Σ|c|² with k chosen so clusters stay
    small (the paper runs k≈10⁵ on LAION; here k scales with the caller).

    Deterministic keep rule (the paper keeps one exemplar per duplicate
    set; the exemplar choice varies by implementation): item j is DROPPED
    iff some item i with LOWER id in the SAME cluster has cos(i, j) ≥ tau
    — keep-first in id order, the same first-wins contract as
    `exact_dedup` (reference D3 base-item semantics).  The rule is a pure
    function of the (cluster, id, vector) sets: no dependence on block or
    scan order, so partition counts cannot change the answer.

    Distributed shape: `kmeans_fit` (fused assign+partial-sum iterations,
    O(k×blocks) exchange) → one assign map pass → hash exchange on cid
    (`grouped_apply`) → per-cluster vectorized upper-triangle max.  Skew:
    a cluster of size c costs c² — at corpus scale pick k ∝ n/(target
    cluster size); the per-cluster matmul is blockwise (8k rows) so memory
    stays bounded even on a fat cluster.

    → Dataset (id, cid:int32, keep:bool), one row per input row.
    """
    from .canonicalize import grouped_apply

    # materialize ONCE: kmeans_fit streams the rows `iters` times and the
    # assign pass once more — a lazy input would re-run its read lineage
    # per pass (kmeans_fit's own materialize() of this is then a no-op)
    ds = ds.materialize()
    cent = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col, seed=seed)
    c_ref = ray.put(np.asarray(cent, dtype=np.float64))

    id_t = ds.schema().base_schema.field(id_col).type

    def assign(batch: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        E = _batch_matrix(batch, vec_col)
        if not batch.num_rows:
            return pa.table({"id": pa.array([], id_t),
                             "cid": pa.array([], pa.int32()),
                             "vec": pa.array([], batch.schema.field(vec_col).type)})
        score = E @ Cm.T - 0.5 * (Cm * Cm).sum(axis=1)
        cid = np.argmax(score, axis=1).astype(np.int32)
        return pa.table({"id": batch.column(id_col),
                         "cid": pa.array(cid),
                         "vec": batch.column(vec_col)})

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    out_schema = pa.schema([
        pa.field("id", id_t), pa.field("cid", pa.int32()),
        pa.field("keep", pa.bool_()),
    ])

    def prune_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        block = block.append_column("_run", pa.array(run_id, pa.int64()))
        block = block.sort_by([("_run", "ascending"), ("id", "ascending")])
        V = _normalize(_batch_matrix(block, "vec"))
        lens = np.diff(np.r_[starts, n])
        keep = np.ones(n, bool)
        CHUNK = 8192
        for s, ln in zip(starts, lens):
            Vc = V[s:s + ln]
            # drop j iff any lower-id i in the cluster has cos >= tau;
            # chunked so a fat cluster never allocates a c x c matrix
            for lo in range(1, ln, CHUNK):
                hi = min(lo + CHUNK, ln)
                sims = Vc[lo:hi] @ Vc[:hi].T          # rows j, cols i<=j
                mask = np.tri(hi - lo, hi, k=lo - 1, dtype=bool)
                keep[s + lo:s + hi] = ~(np.where(mask, sims, -1.0).max(axis=1) >= tau)
        return pa.Table.from_arrays(
            [block.column("id"), block.column("cid"),
             pa.array(keep)],
            schema=out_schema,
        )

    return grouped_apply(
        assigned, ["cid"], None, out_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=prune_block, exchange="hash",
    )


@ray.remote
def _pca_partial(tbl: pa.Table, vec_col: str):
    """(n, Σx, XᵀX) of one block — the sufficient statistics of PCA."""
    if not tbl.num_rows:
        return None
    E = _batch_matrix(tbl, vec_col)
    return E.shape[0], E.sum(axis=0), E.T @ E


@ray.remote(num_cpus=0)
def _pca_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a[0] + b[0], a[1] + b[1], a[2] + b[2]


def pca_fit(
    ds: rd.Dataset,
    n_components: int,
    *,
    vec_col: str = "embedding",
):
    """Distributed PCA over an embedding column → (mean, components,
    explained_variance, explained_variance_ratio).

    ONE streaming pass: each block emits its sufficient statistics
    (n, Σx, XᵀX) — dim² floats per block, never rows — combined by a
    pairwise tree of zero-CPU tasks (O(log blocks) depth, so at 100 TB
    neither the driver nor any task sees more than two partials at once).
    The dim×dim covariance eigendecomposition is driver-side numpy (dim is
    model-embedding sized, 64–4096; the O(dim³) eigh is microseconds next
    to the scan).

    Deterministic per layout; cross-layout the contract is allclose (float
    tree-sum order), the same bar as `kmeans_fit`.  Component signs are
    canonicalized (largest-|coefficient| entry positive) so two fits of the
    same data agree even where eigenvectors are sign-ambiguous.
    """
    refs = [_pca_partial.remote(r, vec_col) for r in ds.materialize().to_arrow_refs()]
    if not refs:
        raise ValueError("pca_fit: empty dataset")
    while len(refs) > 1:
        refs = [_pca_add.remote(*refs[i:i + 2]) if i + 1 < len(refs) else refs[i]
                for i in range(0, len(refs), 2)]
    stats = ray.get(refs[0])
    if stats is None:
        raise ValueError("pca_fit: empty dataset")
    n, s, G = stats
    if n < 2:
        raise ValueError("pca_fit: need >= 2 rows")
    mean = s / n
    cov = (G - np.outer(s, s) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:n_components]
    ev = np.maximum(evals[order], 0.0)
    W = evecs[:, order].T                        # (k, dim) rows = components
    # deterministic sign: the largest-|coeff| entry of each component > 0
    piv = np.argmax(np.abs(W), axis=1)
    flip = W[np.arange(len(W)), piv] < 0
    W[flip] *= -1.0
    total = float(np.maximum(evals, 0.0).sum())
    ratio = ev / total if total > 0 else np.zeros_like(ev)
    return {"mean": mean, "components": W,
            "explained_variance": ev, "explained_variance_ratio": ratio}


def pca_transform(
    ds: rd.Dataset,
    model: dict,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> rd.Dataset:
    """Project onto the fitted components: (X − mean) @ Wᵀ, one matmul per
    block against the broadcast (mean, W) — pure streaming, no shuffle.
    Replaces `vec_col` with `out_col` (fixed_size_list<double, k>)."""
    m_ref = ray.put((np.asarray(model["mean"], np.float64),
                     np.asarray(model["components"], np.float64)))

    def project(batch: pa.Table) -> pa.Table:
        mean, W = ray.get(m_ref)
        k = W.shape[0]
        E = _batch_matrix(batch, vec_col)
        P = (E - mean) @ W.T if batch.num_rows else np.zeros((0, k))
        flat = pa.array(P.reshape(-1), pa.float64())
        col = pa.FixedSizeListArray.from_arrays(flat, k)
        batch = batch.drop_columns([vec_col])
        return batch.append_column(out_col, col)

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Scalar-quantized ANN (SQ8): int8 codes — a 4×-smaller hot index scanned
# approximately, with an exact full-precision rescore of candidates only.
# The storage/IO compression path real billion-vector deployments pair with
# IVF/graph indexes (here it composes with ivf_* and nsw the same way).
# ---------------------------------------------------------------------------


def sq8_fit(ds: rd.Dataset, *, vec_col: str = "embedding") -> dict:
    """Per-dimension quantization bounds over the NORMALIZED vectors: one
    streaming pass of per-block (min, max) partials (2·dim floats per
    block, never rows), combined on the driver — O(dim × blocks) exchange.
    Returns {"mn", "scale"} with scale = (max-min)/255 (constant dims get
    scale 1 so dequantization returns exactly mn)."""

    def partial(b: pa.Table) -> pa.Table:
        E = _normalize(_batch_matrix(b, vec_col))
        if not E.size:
            return pa.table({
                "mn": pa.array([], pa.list_(pa.float64())),
                "mx": pa.array([], pa.list_(pa.float64())),
            })
        return pa.table({
            "mn": pa.array([E.min(axis=0).tolist()]),
            "mx": pa.array([E.max(axis=0).tolist()]),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError("sq8_fit: empty dataset")
    mn = np.min(np.asarray([r["mn"] for r in rows], np.float64), axis=0)
    mx = np.max(np.asarray([r["mx"] for r in rows], np.float64), axis=0)
    scale = (mx - mn) / 255.0
    scale[scale == 0] = 1.0
    return {"mn": mn, "scale": scale}


def sq8_quantize(
    ds: rd.Dataset,
    params: dict,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """(id, int8 code) blocks — the compact index a scan reads instead of
    the float vectors (4× smaller at float32 sources, 8× at float64).
    Codes quantize the NORMALIZED vector: c = round((v̂-mn)/scale) - 128."""
    import ray

    p_ref = ray.put((params["mn"], params["scale"]))
    dim = int(params["mn"].size)

    def enc(b: pa.Table) -> pa.Table:
        mn, scale = ray.get(p_ref)
        E = _normalize(_batch_matrix(b, vec_col))
        n = E.shape[0] if E.size else 0
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "code": pa.array([], pa.list_(pa.int8(), dim)),
            })
        c = (np.clip(np.rint((E - mn) / scale), 0, 255)
             .astype(np.int16) - 128).astype(np.int8)
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(c.reshape(-1), pa.int8()), dim
            ),
        })

    return ds.map_batches(enc, batch_format="pyarrow")


def sq8_topk(
    ds: rd.Dataset,
    query_vec: "np.ndarray | list[float]",
    *,
    k: int = 10,
    params: dict | None = None,
    oversample: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """SQ8 approximate top-k with exact rescore → (id_col, cos_r), the same
    schema/tiebreak as ``topk_cosine``.

    Scan phase touches ONLY int8 codes: per block one dequantized matmul
    ((c+128)·(scale⊙q̂) + mn·q̂ — exact float64 given the codes, so ranking
    is partition-invariant), pruned to k·oversample per block; the global
    candidate merge moves O(k·oversample × blocks) rows.  The full-precision
    vectors are read ONLY for the k·oversample winning ids (broadcast id
    set → streaming semi-join filter → exact ``topk_cosine``), so the
    answer is the EXACT top-k whenever the candidate set covers it —
    recall is tunable by ``oversample`` exactly like IVF's n_probe."""
    import ray

    if params is None:
        params = sq8_fit(ds, vec_col=vec_col)
    codes = sq8_quantize(ds, params, vec_col=vec_col, id_col=id_col)

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    m = int(k) * int(oversample)
    w_ref = ray.put((params["scale"] * q, float(params["mn"] @ q)))

    def scan(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        w, const = ray.get(w_ref)
        C = _fixed_matrix(b, "code").astype(np.float64) + 128.0
        s = C @ w + const
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        if len(s) > m:
            idx = np.lexsort((ids, -s))[:m]
            s, ids = s[idx], ids[idx]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "s": pa.array(s, pa.float64())})

    cand = (codes.map_batches(scan, batch_format="pyarrow")
            .sort(["s", id_col], descending=[True, False]).limit(m))
    cand_ids = pa.array(sorted(r[id_col] for r in cand.take_all()), pa.int64())

    def keep_cands(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(pc.cast(b.column(id_col), pa.int64()),
                                 value_set=cand_ids))

    subset = ds.map_batches(keep_cands, batch_format="pyarrow")
    return topk_cosine(subset, q, k=k, vec_col=vec_col, id_col=id_col)


# ---------------------------------------------------------------------------
# Product quantization (PQ): m-byte codes + asymmetric-distance scan — the
# billion-vector ANN standard (Jégou et al. 2011).  Codebooks train on a
# deterministic HASH SAMPLE (partition-invariant, the FAISS practice);
# encoding and the ADC scan are distributed; the final rescore is exact.
# ---------------------------------------------------------------------------


def _seeded_lloyd(X: np.ndarray, k: int, *, iters: int = 15,
                  seed: int = 0xC0DE) -> np.ndarray:
    """Deterministic driver-side Lloyd's for PQ codebook training (the
    training set is a bounded sample by construction).  Seeded init,
    fixed iteration count, float64 — identical centroids every run."""
    rng = np.random.default_rng(seed)
    k = min(k, X.shape[0])
    C = X[rng.choice(X.shape[0], size=k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            sel = X[a == c]
            if len(sel):
                C[c] = sel.mean(axis=0)
    return C


def pq_fit(
    ds: rd.Dataset,
    *,
    m: int = 8,
    n_centroids: int = 64,
    sample_mod: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0xC0DE,
) -> dict:
    """Train per-subspace PQ codebooks on the NORMALIZED vectors of a
    deterministic hash sample (mix64(id) % sample_mod == 0 — the sample,
    and therefore the codebooks and every downstream answer, are invariant
    to partitioning).  The sample collects to the driver (bounded — PQ
    codebooks train on ~10^5 rows no matter the corpus size; raise
    ``sample_mod`` at scale).  Returns {"codebooks": (m, k, dsub)}."""
    from ..functions.joins import _dataset_to_table
    from .sampling import _fast_bucket

    def keep_sample(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sel = _fast_bucket(ids, 0) % np.uint64(sample_mod) == 0
        return b.filter(pa.array(sel))

    tbl = _dataset_to_table(
        ds.map_batches(keep_sample, batch_format="pyarrow")
    ).sort_by([(id_col, "ascending")])
    X = _normalize(_batch_matrix(tbl, vec_col))
    if X.shape[0] < 2:
        raise ValueError("pq_fit: sample too small — lower sample_mod")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.stack([
        _seeded_lloyd(X[:, j * dsub:(j + 1) * dsub], n_centroids,
                      seed=seed + j)
        for j in range(m)
    ])
    return {"codebooks": books, "m": m, "dsub": dsub}


def pq_encode(
    ds: rd.Dataset,
    params: dict,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """(id, m-byte PQ code) blocks — dim·4-to-m byte compression.  Per
    block and subspace: ONE ‖v−c‖² argmin via the matmul expansion (no
    per-row Python)."""
    import ray

    books = params["codebooks"]
    m, dsub = params["m"], params["dsub"]
    b_ref = ray.put(books)

    def enc(b: pa.Table) -> pa.Table:
        B = ray.get(b_ref)
        E = _normalize(_batch_matrix(b, vec_col))
        n = E.shape[0] if E.size else 0
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "code": pa.array([], pa.list_(pa.uint8(), m)),
            })
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            S = E[:, j * dsub:(j + 1) * dsub]
            C = B[j]
            d = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m
            ),
        })

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    ds: rd.Dataset,
    query_vec: "np.ndarray | list[float]",
    *,
    k: int = 10,
    params: dict | None = None,
    oversample: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """PQ approximate top-k with exact rescore → (id_col, cos_r), same
    schema/tiebreak as ``topk_cosine``.  The ADC scan touches only m-byte
    codes: one per-subspace lookup table q̂·c (m×k float64, built once and
    broadcast), per row the score is m gathers + a fixed-order sum
    (exact given the codes → partition-invariant ranking); per-block prune
    to k·oversample, then the winning ids' full vectors rescore exactly —
    recall tunable by ``oversample``, SQ8/IVF's knob."""
    import ray

    if params is None:
        params = pq_fit(ds, vec_col=vec_col, id_col=id_col)
    codes = pq_encode(ds, params, vec_col=vec_col, id_col=id_col)

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    books = params["codebooks"]
    m, dsub = params["m"], params["dsub"]
    lut = np.stack([
        books[j] @ q[j * dsub:(j + 1) * dsub] for j in range(m)
    ])  # (m, k) partial dot products
    mq = int(k) * int(oversample)
    lut_ref = ray.put(lut)

    def scan(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        L = ray.get(lut_ref)
        C = _fixed_matrix(b, "code").astype(np.int64)
        s = np.zeros(C.shape[0], np.float64)
        for j in range(L.shape[0]):  # fixed-order sum: exact given codes
            s += L[j][C[:, j]]
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        if len(s) > mq:
            idx = np.lexsort((ids, -s))[:mq]
            s, ids = s[idx], ids[idx]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "s": pa.array(s, pa.float64())})

    cand = (codes.map_batches(scan, batch_format="pyarrow")
            .sort(["s", id_col], descending=[True, False]).limit(mq))
    cand_ids = pa.array(sorted(r[id_col] for r in cand.take_all()), pa.int64())

    def keep_cands(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(pc.cast(b.column(id_col), pa.int64()),
                                 value_set=cand_ids))

    subset = ds.map_batches(keep_cands, batch_format="pyarrow")
    return topk_cosine(subset, q, k=k, vec_col=vec_col, id_col=id_col)

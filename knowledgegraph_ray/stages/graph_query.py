"""Query layer over the built graph (nodes/ + edges/ Parquet).

Re-expresses /root/reference/query_search.py as Dataset pipelines:

* ``search``      — vector top-k over node embeddings (K1; reference uses the
                    Kuzu HNSW CALL at :49-111; brute-force cosine is exact)
* ``details``     — point lookup by (name [, type]) (:153-184)
* ``relations``   — 1-hop neighborhood, direction flag, LIMIT 20 (:186-226)
* ``stats``       — per-type node histogram + edge count (:259-293, D9)

All functions take Datasets (or paths) and return Datasets; display
formatting (similarity %, :132) is left to callers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count

from .knn import topk_cosine


def _ds(x) -> rd.Dataset:
    return rd.read_parquet(x) if isinstance(x, str) else x


def search(nodes, query_vec: np.ndarray, k: int = 10):
    """Top-k nodes by embedding cosine → (name, cos_r).

    topk_cosine keys on an int id column; a stable one is derived from the
    sha256 of the name (names are the graph PK)."""
    import hashlib

    import pyarrow as pa

    def add_id(b):
        ids = [
            int.from_bytes(hashlib.sha256((n or "").encode()).digest()[:8], "little") >> 1
            for n in b.column("name").to_pylist()
        ]
        return b.append_column("vec_id", pa.array(ids, pa.int64()))

    with_ids = (
        _ds(nodes)
        .select_columns(["name", "embedding"])
        .map_batches(add_id, batch_format="pyarrow")
        .materialize()
    )
    top = topk_cosine(with_ids, query_vec, k=k, vec_col="embedding", id_col="vec_id")
    # map ids back to names via broadcast lookup
    from ..functions.joins import adaptive_join

    names = with_ids.select_columns(["vec_id", "name"])
    return adaptive_join(top, names, left_keys=["vec_id"], how="inner").select_columns(
        ["name", "cos_r"]
    )


def details(nodes, name: str, entity_type: str | None = None):
    """Point lookup by primary key (query_search.py:153-184)."""
    ds = _ds(nodes)
    expr = pc.field("name") == name
    if entity_type:
        expr = expr & (pc.field("type") == entity_type)
    return ds.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.equal(b.column("name"), name),
                pc.equal(b.column("type"), entity_type),
            )
            if entity_type
            else pc.equal(b.column("name"), name)
        ),
        batch_format="pyarrow",
    )


def relations(edges, name: str, direction: str = "both", limit: int = 20):
    """1-hop neighborhood with direction flag and LIMIT 20
    (query_search.py:186-226)."""
    ds = _ds(edges)

    def flt(b):
        src_m = pc.equal(b.column("src"), name)
        dst_m = pc.equal(b.column("dst"), name)
        if direction == "out":
            m = src_m
        elif direction == "in":
            m = dst_m
        else:
            m = pc.or_(src_m, dst_m)
        return b.filter(m)

    return ds.map_batches(flt, batch_format="pyarrow").limit(limit)


def stats(nodes, edges) -> dict:
    """DB statistics (D9): node count per type (count desc), total edges."""
    nd, ed = _ds(nodes), _ds(edges)
    from .aggregates import partial_grouped_agg

    by_type = (
        partial_grouped_agg(nd, ["type"], count_alias="n")
        .sort("n", descending=True)
        .take_all()
    )
    return {
        "entity_types": {r["type"]: r["n"] for r in by_type},
        "total_entities": sum(r["n"] for r in by_type),
        "total_relations": ed.count(),
    }


def _pr_scatter_fn(tbl, w):
    """One edge block (pre-sorted by di) → SPARSE (dst index, mass) partial:
    segment sums via one reduceat — output size is the block's DISTINCT dst
    count, never the node count.  Blocks carrying a ``we`` column (weighted
    pagerank) scale each edge's mass by its weight; unweighted blocks take
    the identical code path they always did."""
    # num_rows check BEFORE column access: a zero-row block that skipped
    # map_batches can carry a degenerate empty schema (no si/di columns)
    if tbl.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    di = tbl.column("di").to_numpy(zero_copy_only=False)
    si = tbl.column("si").to_numpy(zero_copy_only=False)
    vals = w[si]
    if "we" in tbl.column_names:
        vals = vals * tbl.column("we").to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, di[1:] != di[:-1]])
    return di[starts], np.add.reduceat(vals, starts)


def _pr_combine_fn(n, *parts):
    """Sum sparse (idx, mass) partials into ONE dense vector (each partial's
    indices are unique, so fancy-index += is exact).  Partials arrive as
    varargs so Ray resolves the refs in place (zero-copy local reads)."""
    acc = np.zeros(n, np.float64)
    for idx, mass in parts:
        acc[idx] += mass
    return acc


import ray as _ray  # noqa: E402

_pr_scatter = _ray.remote(_pr_scatter_fn)
# num_cpus=0: the combine must start as scatter partials arrive, not queue
# behind them (functions/joins.py _build_lookup_index rationale)
_pr_combine = _ray.remote(num_cpus=0)(_pr_combine_fn)


def pagerank(
    nodes,
    edges,
    *,
    damping: float = 0.85,
    iters: int = 20,
    small_graph_edges: int = 5_000_000,
    personalization: "list[tuple[str, str]] | None" = None,
    shard_size: int | None = None,
    large_graph_nodes: int = 50_000_000,
    weight_col: str | None = None,
) -> rd.Dataset:
    """Distributed PageRank over the built KG → (name, type, rank_r).

    ``personalization``: optional (name, type) seed list — teleport (and
    dangling) mass then concentrates uniformly on the seeds instead of all
    nodes (personalized PageRank, the GraphRAG neighborhood-relevance
    ranking).  Seeds absent from the nodes table are ignored; all-absent
    raises.  The unpersonalized path keeps its original scalar update
    expression so existing results stay bit-identical.

    ``weight_col``: optional edge-weight column (the KG's ``strength``) —
    node i then distributes rank proportionally to outgoing weights
    (r[i]·w(i,j)/Σ_out w(i,·)); zero-total-weight nodes are dangling.
    Nulls weigh 1.0.  All three regimes honor it (weighted regime-equality
    tested); with weight_col=None every code path and result is unchanged.

    The iterative-graph-algorithm pattern: the NODE VECTOR broadcasts (the
    canonical node table is orders of magnitude smaller than the corpus that
    produced it — one zero-copy object-store array per iteration), while the
    EDGE LIST stays distributed.  Each edge block is pre-sorted by dst index
    ONCE; per iteration a task per block emits a SPARSE (dst, mass) partial
    (one reduceat over the block's dst segments) and a single zero-CPU
    combine task sums the partials into one dense vector.  Per-iteration
    traffic: object store moves only the per-block distinct-dst partials
    (bounded by the edge count, typically far less); the driver receives ONE
    O(nodes) vector and broadcasts one back — never O(nodes × blocks).
    Dangling-node mass redistributes uniformly (standard); ranks
    floor-canonicalized at 1e-8 for stable comparisons.

    Endpoint membership is VALIDATED: pagerank() is a public operator also
    reachable from imported/merged graphs, so edges whose (name, type)
    endpoint is absent from the nodes table are dropped (searchsorted alone
    would silently misattribute their mass to the insertion-point node).

    THREE regimes (the CC precedent): below ``small_graph_edges`` the loop
    runs driver-side (bit-identical to the distributed-broadcast path, see
    below); above it the node vector broadcasts whole; and past
    ``large_graph_nodes`` (or whenever ``shard_size`` is passed) the rank
    vector itself is HASH-SHARDED — a vertex-cut where no process, driver
    included, ever holds the full O(nodes) vector (see
    `_pagerank_sharded`).  The sharded path floors identically and agrees
    with the dense path to float-summation order (regime-equality
    tested)."""
    import pyarrow as pa
    import ray

    from ..functions.hashing import hash_key_columns

    nodes_ds, edges_ds = _ds(nodes), _ds(edges)
    nodes_mat = nodes_ds.select_columns(["name", "type"]).materialize()
    if shard_size is not None or nodes_mat.count() > large_graph_nodes:
        return _pagerank_sharded(
            nodes_mat, edges_ds, damping=damping, iters=iters,
            shard_size=shard_size or 4_000_000,
            personalization=personalization,
            weight_col=weight_col,
        )

    # sorted node-key index (one bounded task; broadcast by ref)
    key_tbls = [
        t.select(["name", "type"])
        for t in ray.get(nodes_mat.to_arrow_refs())
        if t.num_rows
    ]
    if not key_tbls:  # empty node table: concat_tables([]) would raise
        return rd.from_arrow(_PR_OUT_SCHEMA.empty_table())
    keys_tbl = pa.concat_tables(key_tbls).combine_chunks()
    kh = np.sort(hash_key_columns(keys_tbl, ["name", "type"]))
    n = len(kh)
    if n == 0:
        return rd.from_arrow(
            pa.schema([("name", pa.string()), ("type", pa.string()),
                       ("rank_r", pa.float64())]).empty_table()
        )
    kh_ref = ray.put(kh)

    def edge_idx(b: pa.Table) -> pa.Table:
        khs = ray.get(kh_ref)
        b = b.combine_chunks()
        nn = len(khs)

        def lookup(cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
            h = hash_key_columns(
                b.select(cols).rename_columns(["name", "type"]), ["name", "type"]
            )
            idx = np.minimum(np.searchsorted(khs, h), nn - 1)
            return idx, khs[idx] == h  # membership: hash at slot must match

        src, src_ok = lookup(["src", "src_type"])
        dst, dst_ok = lookup(["dst", "dst_type"])
        keep = src_ok & dst_ok  # drop edges with unmatched endpoints
        src, dst = src[keep], dst[keep]
        order = np.argsort(dst, kind="stable")  # pre-sort ONCE for reduceat
        cols = {
            "si": pa.array(src[order], pa.int64()),
            "di": pa.array(dst[order], pa.int64()),
        }
        if weight_col is not None:
            we = pc.cast(
                pc.fill_null(b.column(weight_col), 1.0), pa.float64()
            ).to_numpy(zero_copy_only=False)[keep]
            cols["we"] = pa.array(we[order], pa.float64())
        return pa.table(cols)

    eidx = edges_ds.map_batches(edge_idx, batch_format="pyarrow").materialize()
    block_refs = [ref for ref in eidx.to_arrow_refs()]

    # out-degree: sparse per-block partials, ONE dense combine on the driver
    # (the driver holds r/deg — O(nodes) — by design; the scale bound is the
    # broadcastable node count, not blocks × nodes).  Weighted: the divisor
    # is each node's TOTAL outgoing weight instead of its edge count.
    def deg_partial(b: pa.Table) -> pa.Table:
        si = b.column("si").to_numpy(zero_copy_only=False)
        if weight_col is not None:
            order = np.argsort(si, kind="stable")
            s = si[order]
            we = b.column("we").to_numpy(zero_copy_only=False)[order]
            starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            return pa.table({
                "i": pa.array(s[starts], pa.int64()),
                "d": pa.array(np.add.reduceat(we, starts)
                              if s.size else np.empty(0, np.float64),
                              pa.float64()),
            })
        u, c = np.unique(si, return_counts=True)
        return pa.table({"i": pa.array(u, pa.int64()), "d": pa.array(c, pa.int64())})

    deg = np.zeros(n, np.float64 if weight_col is not None else np.int64)
    for t in ray.get(eidx.map_batches(deg_partial, batch_format="pyarrow").materialize().to_arrow_refs()):
        if t.num_rows:
            np.add.at(deg, t.column("i").to_numpy(zero_copy_only=False),
                      t.column("d").to_numpy(zero_copy_only=False))

    p = None
    if personalization is not None:
        seeds = pa.table({
            "name": pa.array([s for s, _ in personalization], pa.string()),
            "type": pa.array([t for _, t in personalization], pa.string()),
        })
        sh = hash_key_columns(seeds, ["name", "type"])
        pos = np.minimum(np.searchsorted(kh, sh), n - 1)
        pos = pos[kh[pos] == sh]  # drop seeds absent from the graph
        if pos.size == 0:
            raise ValueError("pagerank: no personalization seed is in the node table")
        p = np.zeros(n, np.float64)
        np.add.at(p, pos, 1.0 / pos.size)

    r = np.full(n, 1.0 / n) if p is None else p.copy()
    # np.where == np.maximum bit-exactly for the integer unweighted degree;
    # for weighted degrees < 1 the where form is the correct safe divisor
    safe_deg = np.where(deg > 0, deg, 1)
    m = eidx.count()
    if m <= small_graph_edges:
        # SMALL-GRAPH REGIME (the CC three-regime precedent): below the
        # threshold the per-iteration Ray task round-trips dominate (the
        # numpy math is microseconds), so run the same loop driver-side —
        # the SAME scatter/combine functions over the SAME blocks in the
        # SAME order, so every float op associates identically and the
        # output is bit-identical to the distributed path (regime-equality
        # tested).  16 B/edge ⇒ ≤ 80 MB driver-held at the default bound.
        blocks = ray.get(block_refs)
        for _ in range(iters):
            w = r / safe_deg
            parts = [_pr_scatter_fn(t, w) for t in blocks]
            contrib = _pr_combine_fn(n, *parts) if parts else np.zeros(n)
            dangling = r[deg == 0].sum()
            if p is None:
                r = (1.0 - damping) / n + damping * (contrib + dangling / n)
            else:
                r = (1.0 - damping) * p + damping * (contrib + dangling * p)
    else:
        for _ in range(iters):
            w_ref = ray.put(r / safe_deg)
            parts = [_pr_scatter.remote(bref, w_ref) for bref in block_refs]
            contrib = ray.get(_pr_combine.remote(n, *parts)) if parts else np.zeros(n)
            dangling = r[deg == 0].sum()
            if p is None:
                r = (1.0 - damping) / n + damping * (contrib + dangling / n)
            else:
                r = (1.0 - damping) * p + damping * (contrib + dangling * p)

    # ranks back onto names via the same key order
    ranks_for_rows = r[np.searchsorted(kh, hash_key_columns(keys_tbl, ["name", "type"]))]
    tbl = pa.table({
        "name": keys_tbl.column("name"),
        "type": keys_tbl.column("type"),
        "rank_r": pa.array(np.floor(ranks_for_rows * 1e8) / 1e8, pa.float64()),
    })
    return rd.from_arrow(tbl)


_PR_OUT_SCHEMA = pa.schema(
    [("name", pa.string()), ("type", pa.string()), ("rank_r", pa.float64())]
)


def _split_tbl_by_part(t: pa.Table, part: np.ndarray, S: int):
    """One table → S slices by an int partition vector: stable argsort +
    searchsorted bounds + compact per-slice take (None where empty) — the
    single split idiom every `_vertex_cut` exchange uses."""
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(S + 1))
    return tuple(
        t.take(pa.array(order[bounds[i]:bounds[i + 1]], pa.int64()))
        if bounds[i + 1] > bounds[i] else None
        for i in range(S)
    )


def _vertex_cut(
    nodes_ds: rd.Dataset,
    edges_ds: rd.Dataset,
    shard_size: int,
    *,
    with_reverse: bool = False,
    weight_col: str | None = None,
) -> "dict | None":
    """Shared vertex-cut layout for the iterative graph ops (pagerank,
    hits): the node set is HASH-SHARDED so no process — driver included —
    ever holds an O(nodes) structure.

    Built once:
      * NODE shards: (name, type) rows exchanged by ``keyhash % S`` (the
        canonicalize split/reduce idiom), each shard sorted by key hash and
        kept in the object store; the driver holds S refs + S sizes.
      * EDGE blocks: two exchanges — by src shard (source index + membership
        against that shard's sorted hashes), then by dst shard — into
        per-(src shard, dst shard) (si, di) blocks pre-sorted by di, the
        exact input shape `_pr_scatter_fn` already consumes.  Edges with an
        endpoint absent from the nodes table are dropped, same as the dense
        paths.  ``with_reverse`` also materializes the swapped orientation
        (si=dst index, di=src index, sorted by di) per pair — the hub
        half-step of HITS.
      * Out-degree sparse partials per src shard (pagerank's divisor).

    Returns None on an empty node set, else a dict:
      S, n, sizes, shard_refs, fwd {(s,d): block ref}, rev (same keys, only
      when with_reverse), deg_parts (list of per-src-shard partial refs).

    Scale shape: the pair grid is S² (10⁹ nodes at the default 4M
    shard_size → S=250 → ≤62.5k edge blocks) — task counts and driver-held
    REFS grow as S², actual bytes as the edge count; empty pairs are
    pruned before any iteration, and a ref is ~100 B, so even the full
    grid is MBs of driver state.  Raise shard_size to trade per-shard
    memory for a smaller grid.

    CONTRACT: ``nodes_ds`` must already be (name, type)-projected and
    materialized — both callers build it at dispatch; re-selecting here
    would rewrite the full node table through the object store a second
    time."""
    import pyarrow as pa
    import ray

    from ..functions.hashing import hash_key_columns

    nodes_mat = nodes_ds
    n = nodes_mat.count()
    if n == 0:
        return None
    S = max(1, -(-n // int(shard_size)))
    uS = np.uint64(S)

    # ---- node exchange: (name, type, keyhash) rows → S sorted shards ----
    @ray.remote
    def _split_by_hash(block: pa.Table, hash_cols: tuple, out_cols: tuple):
        """One block → S slices keyed by hash(hash_cols) % S; each slice is
        ``block.select(out_cols)`` plus the hash as column ``_kh``."""
        if block.num_rows == 0:
            # a zero-row block from a filter/repartition can carry a
            # DEGENERATE EMPTY SCHEMA (no name/type columns) — guard
            # before select, like the dense path's `if t.num_rows`
            return None if S == 1 else tuple(None for _ in range(S))
        h = hash_key_columns(
            block.select(list(hash_cols)).rename_columns(["name", "type"]),
            ["name", "type"],
        )
        t = block.select(list(out_cols)).append_column(
            "_kh", pa.array(h, pa.uint64())
        )
        if S == 1:
            return t
        return _split_tbl_by_part(t, (h % uS).astype(np.int64), S)

    @ray.remote(num_returns=2)
    def _build_node_shard(*slices):
        """→ (shard payload = keys table sorted by _kh, its size).  The
        sorted-hash membership index is the payload's _kh column."""
        tabs = [t for t in slices if t is not None and t.num_rows]
        if not tabs:
            return _PR_OUT_SCHEMA.empty_table().select([]), 0
        t = pa.concat_tables(tabs).combine_chunks()
        kh = t.column("_kh").to_numpy(zero_copy_only=False)
        t = t.take(pa.array(np.argsort(kh, kind="stable"), pa.int64()))
        return t, t.num_rows

    def _exchange(mat, hash_cols, out_cols):
        refs = [r for r in mat.to_arrow_refs()]
        opts = (
            _split_by_hash.options(num_returns=S) if S > 1 else _split_by_hash
        )
        splits = [opts.remote(r, tuple(hash_cols), tuple(out_cols)) for r in refs]
        if S == 1:
            splits = [[s] for s in splits]
        return splits

    node_splits = _exchange(nodes_mat, ("name", "type"), ("name", "type"))
    shard_refs, size_refs = [], []
    for p in range(S):
        sref, zref = _build_node_shard.remote(*[sp[p] for sp in node_splits])
        shard_refs.append(sref)
        size_refs.append(zref)
    sizes = ray.get(size_refs)  # S ints — the only per-shard driver state

    # ---- edge exchange 1: (src hash, dst hash[, weight]) rows → src shards ----
    def edge_hashes(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        sh = hash_key_columns(
            b.select(["src", "src_type"]).rename_columns(["name", "type"]),
            ["name", "type"],
        )
        dh = hash_key_columns(
            b.select(["dst", "dst_type"]).rename_columns(["name", "type"]),
            ["name", "type"],
        )
        cols = {"sh": pa.array(sh, pa.uint64()), "dh": pa.array(dh, pa.uint64())}
        if weight_col is not None:
            cols["we"] = pc.cast(
                pc.fill_null(b.column(weight_col), 1.0), pa.float64()
            )
        return pa.table(cols)

    emat = edges_ds.map_batches(edge_hashes, batch_format="pyarrow").materialize()

    @ray.remote
    def _split_edges(block: pa.Table):
        if block.num_rows == 0:
            return None if S == 1 else tuple(None for _ in range(S))
        if S == 1:
            return block
        sh = block.column("sh").to_numpy(zero_copy_only=False)
        return _split_tbl_by_part(block, (sh % uS).astype(np.int64), S)

    @ray.remote
    def _index_src(shard_tbl: pa.Table, *slices):
        """Source-shard pass: resolve si against shard_tbl's sorted hashes,
        drop non-members, re-split survivors by dst shard → tuple of S
        (si, dh) tables (None where empty)."""
        empty = tuple(None for _ in range(S)) if S > 1 else None
        tabs = [t for t in slices if t is not None and t.num_rows]
        if not tabs or shard_tbl.num_rows == 0:
            return empty
        t = pa.concat_tables(tabs).combine_chunks()
        khs = shard_tbl.column("_kh").to_numpy(zero_copy_only=False)
        sh = t.column("sh").to_numpy(zero_copy_only=False)
        si = np.minimum(np.searchsorted(khs, sh), len(khs) - 1)
        keep = khs[si] == sh
        si = si[keep]
        dh = t.column("dh").to_numpy(zero_copy_only=False)[keep]
        if si.size == 0:
            return empty
        cols = {"si": pa.array(si, pa.int64()),
                "dh": pa.array(dh, pa.uint64())}
        if "we" in t.column_names:
            cols["we"] = pa.array(
                t.column("we").to_numpy(zero_copy_only=False)[keep],
                pa.float64(),
            )
        out = pa.table(cols)
        if S == 1:
            return out
        return _split_tbl_by_part(out, (dh % uS).astype(np.int64), S)

    edge_splits = [
        (_split_edges.options(num_returns=S) if S > 1 else _split_edges).remote(r)
        for r in emat.to_arrow_refs()
    ]
    if S == 1:
        edge_splits = [[s] for s in edge_splits]
    src_opts = _index_src.options(num_returns=S) if S > 1 else _index_src
    sd_slices = []  # sd_slices[s][d] → (si, dh) slice ref
    for s in range(S):
        res = src_opts.remote(shard_refs[s], *[sp[s] for sp in edge_splits])
        sd_slices.append(list(res) if S > 1 else [res])

    @ray.remote(num_returns=4)
    def _finalize_sd(shard_tbl: pa.Table, sl):
        """Dst-shard pass for one (s, d) pair: resolve di, drop non-members,
        pre-sort by di → ((si, di) block, swapped block or None,
        src-degree sparse partial, rows)."""
        none_part = (np.empty(0, np.int64), np.empty(0, np.int64))
        if sl is None or sl.num_rows == 0 or shard_tbl.num_rows == 0:
            return None, None, none_part, 0
        khs = shard_tbl.column("_kh").to_numpy(zero_copy_only=False)
        dh = sl.column("dh").to_numpy(zero_copy_only=False)
        di = np.minimum(np.searchsorted(khs, dh), len(khs) - 1)
        keep = khs[di] == dh
        di = di[keep]
        si = sl.column("si").to_numpy(zero_copy_only=False)[keep]
        if di.size == 0:
            return None, None, none_part, 0
        we = (sl.column("we").to_numpy(zero_copy_only=False)[keep]
              if "we" in sl.column_names else None)
        order = np.argsort(di, kind="stable")
        cols = {"si": pa.array(si[order], pa.int64()),
                "di": pa.array(di[order], pa.int64())}
        if we is not None:
            cols["we"] = pa.array(we[order], pa.float64())
        blk = pa.table(cols)
        rev = None
        if with_reverse:
            # swapped orientation: lookup slot ← dst index, group slot ←
            # src index, pre-sorted by the new group slot (dense
            # reverse_idx's exact shape)
            rorder = np.argsort(si, kind="stable")
            rev = pa.table({"si": pa.array(di[rorder], pa.int64()),
                            "di": pa.array(si[rorder], pa.int64())})
        if we is not None:
            # weighted out-degree partial: per-src total outgoing weight
            sorder = np.argsort(si, kind="stable")
            s = si[sorder]
            starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            return blk, rev, (s[starts], np.add.reduceat(we[sorder], starts)), int(di.size)
        u, c = np.unique(si, return_counts=True)
        return blk, rev, (u, c.astype(np.int64)), int(di.size)

    fwd: dict[tuple[int, int], "ray.ObjectRef"] = {}
    rev: dict[tuple[int, int], "ray.ObjectRef"] = {}
    deg_parts: list[list] = [[] for _ in range(S)]
    row_refs = []
    for s in range(S):
        for d in range(S):
            blk, rblk, dp, nr = _finalize_sd.remote(shard_refs[d], sd_slices[s][d])
            fwd[(s, d)] = blk
            rev[(s, d)] = rblk
            deg_parts[s].append(dp)
            row_refs.append(((s, d), nr))
    # prune empty (s,d) pairs so iterations skip them entirely
    nrows = ray.get([r for _, r in row_refs])
    live = {sd for (sd, _), nr in zip(row_refs, nrows) if nr > 0}
    return {
        "S": S, "n": n, "sizes": sizes, "shard_refs": shard_refs,
        "fwd": {sd: b for sd, b in fwd.items() if sd in live},
        "rev": ({sd: b for sd, b in rev.items() if sd in live}
                if with_reverse else None),
        "deg_parts": deg_parts,
    }


def _pagerank_sharded(
    nodes_ds: rd.Dataset,
    edges_ds: rd.Dataset,
    *,
    damping: float,
    iters: int,
    shard_size: int,
    personalization: "list[tuple[str, str]] | None" = None,
    weight_col: str | None = None,
) -> rd.Dataset:
    """Vertex-cut PageRank over the `_vertex_cut` layout.

    Per iteration the driver launches O(S + nonempty (s,d) pairs) tasks and
    receives S dangling SCALARS; every vector (w_s, contrib_d, r_d) lives
    shard-sized in the object store.  Update formula, dangling handling,
    personalization semantics and the 1e-8 floor are identical to the dense
    path; only float summation order differs (contrib sums per shard rather
    than globally), which the regime-equality test bounds at one 1e-8
    quantum."""
    import pyarrow as pa
    import ray

    from ..functions.hashing import hash_key_columns

    vc = _vertex_cut(nodes_ds, edges_ds, shard_size, weight_col=weight_col)
    if vc is None:
        return rd.from_arrow(_PR_OUT_SCHEMA.empty_table())
    S, n, sizes = vc["S"], vc["n"], vc["sizes"]
    shard_refs, edge_blocks, deg_parts = vc["shard_refs"], vc["fwd"], vc["deg_parts"]
    uS = np.uint64(S)
    deg_dtype = np.float64 if weight_col is not None else np.int64

    @ray.remote
    def _deg_shard(size: int, *parts):
        deg = np.zeros(size, deg_dtype)
        for u, c in parts:
            if len(u):
                deg[u] += c  # indices unique within one partial
        return deg

    deg_refs = [_deg_shard.remote(sizes[s], *deg_parts[s]) for s in range(S)]

    # ---- personalization: seed hashes routed to their shards ----
    p_refs: "list | None" = None
    if personalization is not None:
        seeds = pa.table({
            "name": pa.array([s for s, _ in personalization], pa.string()),
            "type": pa.array([t for _, t in personalization], pa.string()),
        })
        sh_all = hash_key_columns(seeds, ["name", "type"])
        by_shard = [sh_all[(sh_all % uS).astype(np.int64) == s] for s in range(S)]

        @ray.remote(num_returns=2)
        def _seed_pos(shard_tbl: pa.Table, seed_h: np.ndarray):
            if shard_tbl.num_rows == 0 or seed_h.size == 0:
                return np.empty(0, np.int64), 0
            khs = shard_tbl.column("_kh").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(khs, seed_h), len(khs) - 1)
            pos = pos[khs[pos] == seed_h]
            return pos, int(pos.size)

        pos_refs, cnt_refs = [], []
        for s in range(S):
            pr, cr = _seed_pos.remote(shard_refs[s], by_shard[s])
            pos_refs.append(pr)
            cnt_refs.append(cr)
        matched = sum(ray.get(cnt_refs))
        if matched == 0:
            raise ValueError("pagerank: no personalization seed is in the node table")

        @ray.remote
        def _build_p(size: int, pos, total: int):
            p = np.zeros(size, np.float64)
            np.add.at(p, pos, 1.0 / total)
            return p

        p_refs = [_build_p.remote(sizes[s], pos_refs[s], matched) for s in range(S)]

    # ---- iterate: only shard-sized vectors + S scalars move ----
    @ray.remote(num_returns=2)
    def _w_and_dangling(r_s: np.ndarray, deg_s: np.ndarray):
        # where == maximum bit-exactly for integer degrees; correct for
        # weighted degrees < 1 (dense path's safe_deg)
        return r_s / np.where(deg_s > 0, deg_s, 1), float(r_s[deg_s == 0].sum())

    @ray.remote(num_cpus=0)
    def _shard_update(size: int, dangling: float, p_s, *parts):
        contrib = np.zeros(size, np.float64)
        for part in parts:
            if part is not None:
                idx, mass = part
                contrib[idx] += mass
        if p_s is None:
            return (1.0 - damping) / n + damping * (contrib + dangling / n)
        return (1.0 - damping) * p_s + damping * (contrib + dangling * p_s)

    @ray.remote
    def _init_r(size: int, p_s):
        return np.full(size, 1.0 / n) if p_s is None else p_s.copy()

    r_refs = [
        _init_r.remote(sizes[s], p_refs[s] if p_refs is not None else None)
        for s in range(S)
    ]
    for _ in range(iters):
        w_refs, d_refs = [], []
        for s in range(S):
            wr, dr = _w_and_dangling.remote(r_refs[s], deg_refs[s])
            w_refs.append(wr)
            d_refs.append(dr)
        dangling = float(sum(ray.get(d_refs)))
        parts_by_d: list[list] = [[] for _ in range(S)]
        for (s, d), blk in edge_blocks.items():
            parts_by_d[d].append(_pr_scatter.remote(blk, w_refs[s]))
        r_refs = [
            _shard_update.remote(
                sizes[d], dangling,
                p_refs[d] if p_refs is not None else None,
                *parts_by_d[d],
            )
            for d in range(S)
        ]

    @ray.remote
    def _emit(shard_tbl: pa.Table, r_s: np.ndarray) -> pa.Table:
        if shard_tbl.num_rows == 0:
            return _PR_OUT_SCHEMA.empty_table()
        return pa.table({
            "name": shard_tbl.column("name"),
            "type": shard_tbl.column("type"),
            "rank_r": pa.array(np.floor(r_s * 1e8) / 1e8, pa.float64()),
        })

    return rd.from_arrow_refs(
        [_emit.remote(shard_refs[s], r_refs[s]) for s in range(S)]
    )


_HITS_OUT_SCHEMA = pa.schema(
    [("name", pa.string()), ("type", pa.string()),
     ("hub_r", pa.float64()), ("auth_r", pa.float64())]
)


def _hits_sharded(
    nodes_ds: rd.Dataset,
    edges_ds: rd.Dataset,
    *,
    iters: int,
    shard_size: int,
) -> rd.Dataset:
    """Vertex-cut HITS over the `_vertex_cut` layout (with_reverse=True):
    both score vectors live hash-sharded; each half-step scatters one
    orientation's (s,d) blocks, accumulates per shard, and L2-normalizes
    with a GLOBAL norm combined from S per-shard sum-of-squares SCALARS —
    the only thing the driver ever holds per half-step.  Same math as the
    dense path to float-summation order (regime-equality tested)."""
    import pyarrow as pa
    import ray

    vc = _vertex_cut(nodes_ds, edges_ds, shard_size, with_reverse=True)
    if vc is None:
        return rd.from_arrow(_HITS_OUT_SCHEMA.empty_table())
    S, n, sizes = vc["S"], vc["n"], vc["sizes"]
    shard_refs, fwd, rev = vc["shard_refs"], vc["fwd"], vc["rev"]

    @ray.remote(num_cpus=0, num_returns=2)
    def _accum(size: int, *parts):
        v = np.zeros(size, np.float64)
        for part in parts:
            if part is not None:
                idx, mass = part
                v[idx] += mass
        return v, float((v * v).sum())

    @ray.remote(num_cpus=0)
    def _scale(v: np.ndarray, norm: float):
        return v / norm if norm > 0 else v

    @ray.remote
    def _init(size: int):
        return np.full(size, 1.0 / np.sqrt(n))

    def half_step(blocks, w_refs):
        """One normalized scatter: blocks[(s,d)] keyed by source shard s,
        emitting to shard d."""
        parts_by_d: list[list] = [[] for _ in range(S)]
        for (s, d), blk in blocks.items():
            parts_by_d[d].append(_pr_scatter.remote(blk, w_refs[s]))
        raw, sq = [], []
        for d in range(S):
            v, q = _accum.remote(sizes[d], *parts_by_d[d])
            raw.append(v)
            sq.append(q)
        norm = float(np.sqrt(sum(ray.get(sq))))  # S scalars to the driver
        return [_scale.remote(raw[d], norm) for d in range(S)]

    h_refs = [_init.remote(sizes[s]) for s in range(S)]
    a_refs = h_refs[:]
    # hub step reads a by dst index: rev blocks have si=dst, di=src, so the
    # "source shard" of a rev (s,d) block is d (where a lives) and it emits
    # to s — re-key the dict once for half_step's convention
    rev_keyed = {(d, s): blk for (s, d), blk in rev.items()}
    for _ in range(iters):
        a_refs = half_step(fwd, h_refs)
        h_refs = half_step(rev_keyed, a_refs)

    @ray.remote
    def _emit(shard_tbl: pa.Table, h_s: np.ndarray, a_s: np.ndarray) -> pa.Table:
        if shard_tbl.num_rows == 0:
            return _HITS_OUT_SCHEMA.empty_table()
        return pa.table({
            "name": shard_tbl.column("name"),
            "type": shard_tbl.column("type"),
            "hub_r": pa.array(np.floor(h_s * 1e8) / 1e8, pa.float64()),
            "auth_r": pa.array(np.floor(a_s * 1e8) / 1e8, pa.float64()),
        })

    return rd.from_arrow_refs(
        [_emit.remote(shard_refs[s], h_refs[s], a_refs[s]) for s in range(S)]
    )


def hits(
    nodes,
    edges,
    *,
    iters: int = 30,
    small_graph_edges: int = 5_000_000,
    shard_size: int | None = None,
    large_graph_nodes: int = 50_000_000,
) -> rd.Dataset:
    """HITS hubs & authorities (Kleinberg 1999) over the built KG →
    (name, type, hub_r, auth_r), L2-normalized, floor-canonicalized at 1e-8.

    Same topology as ``pagerank``: the node VECTORS broadcast (one
    object-store array per half-step), the EDGE LIST stays distributed as
    index blocks built once.  Two block sets are pre-sorted once — forward
    (grouped by dst, for the authority update a[j] = Σ_{i→j} h[i]) and
    reverse (grouped by src, for the hub update h[i] = Σ_{i→j} a[j]) — so
    both half-steps reuse the SAME sparse scatter (one reduceat per block)
    and zero-CPU combine as pagerank.  Below ``small_graph_edges`` the loop
    runs driver-side over the same blocks in the same order, so the two
    regimes are bit-identical (pagerank's regime-equality precedent).
    Endpoint membership is validated like pagerank: edges referencing a
    node absent from the nodes table are dropped.

    Past ``large_graph_nodes`` (or whenever ``shard_size`` is passed) the
    score vectors are HASH-SHARDED over the shared `_vertex_cut` layout —
    see `_hits_sharded`; the driver then holds only S per-shard
    sum-of-squares scalars per half-step."""
    import pyarrow as pa
    import ray

    from ..functions.hashing import hash_key_columns

    nodes_ds, edges_ds = _ds(nodes), _ds(edges)
    nodes_mat = nodes_ds.select_columns(["name", "type"]).materialize()
    if shard_size is not None or nodes_mat.count() > large_graph_nodes:
        return _hits_sharded(
            nodes_mat, edges_ds, iters=iters,
            shard_size=shard_size or 4_000_000,
        )

    key_tbls = [
        t.select(["name", "type"])
        for t in ray.get(nodes_mat.to_arrow_refs())
        if t.num_rows
    ]
    empty = rd.from_arrow(_HITS_OUT_SCHEMA.empty_table())
    if not key_tbls:
        return empty
    keys_tbl = pa.concat_tables(key_tbls).combine_chunks()
    kh = np.sort(hash_key_columns(keys_tbl, ["name", "type"]))
    n = len(kh)
    if n == 0:
        return empty
    kh_ref = ray.put(kh)

    def edge_idx(b: pa.Table) -> pa.Table:
        khs = ray.get(kh_ref)
        b = b.combine_chunks()
        nn = len(khs)

        def lookup(cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
            h = hash_key_columns(
                b.select(cols).rename_columns(["name", "type"]), ["name", "type"]
            )
            idx = np.minimum(np.searchsorted(khs, h), nn - 1)
            return idx, khs[idx] == h

        src, src_ok = lookup(["src", "src_type"])
        dst, dst_ok = lookup(["dst", "dst_type"])
        keep = src_ok & dst_ok
        src, dst = src[keep], dst[keep]
        order = np.argsort(dst, kind="stable")
        return pa.table({
            "si": pa.array(src[order], pa.int64()),
            "di": pa.array(dst[order], pa.int64()),
        })

    fwd = edges_ds.map_batches(edge_idx, batch_format="pyarrow").materialize()

    def reverse_idx(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"si": pa.array([], pa.int64()),
                             "di": pa.array([], pa.int64())})
        si = b.column("si").to_numpy(zero_copy_only=False)
        di = b.column("di").to_numpy(zero_copy_only=False)
        order = np.argsort(si, kind="stable")
        # swapped: group key (di slot) = src index, lookup (si slot) = dst
        return pa.table({
            "si": pa.array(di[order], pa.int64()),
            "di": pa.array(si[order], pa.int64()),
        })

    rev = fwd.map_batches(reverse_idx, batch_format="pyarrow").materialize()
    fwd_refs = list(fwd.to_arrow_refs())
    rev_refs = list(rev.to_arrow_refs())

    def l2(v: np.ndarray) -> np.ndarray:
        s = np.sqrt((v * v).sum())
        return v / s if s > 0 else v

    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.full(n, 1.0 / np.sqrt(n))
    if fwd.count() <= small_graph_edges:
        fblocks, rblocks = ray.get(fwd_refs), ray.get(rev_refs)
        for _ in range(iters):
            parts = [_pr_scatter_fn(t, h) for t in fblocks]
            a = l2(_pr_combine_fn(n, *parts) if parts else np.zeros(n))
            parts = [_pr_scatter_fn(t, a) for t in rblocks]
            h = l2(_pr_combine_fn(n, *parts) if parts else np.zeros(n))
    else:
        for _ in range(iters):
            h_ref = ray.put(h)
            parts = [_pr_scatter.remote(bref, h_ref) for bref in fwd_refs]
            a = l2(ray.get(_pr_combine.remote(n, *parts)) if parts else np.zeros(n))
            a_ref = ray.put(a)
            parts = [_pr_scatter.remote(bref, a_ref) for bref in rev_refs]
            h = l2(ray.get(_pr_combine.remote(n, *parts)) if parts else np.zeros(n))

    pos = np.searchsorted(kh, hash_key_columns(keys_tbl, ["name", "type"]))
    tbl = pa.table({
        "name": keys_tbl.column("name"),
        "type": keys_tbl.column("type"),
        "hub_r": pa.array(np.floor(h[pos] * 1e8) / 1e8, pa.float64()),
        "auth_r": pa.array(np.floor(a[pos] * 1e8) / 1e8, pa.float64()),
    })
    return rd.from_arrow(tbl)


def khop(edges, seeds: list, k: int, direction: str = "both",
         src: str = "src", dst: str = "dst",
         frontier_limit: int = 1_000_000):
    """k-hop neighborhood expansion (the GraphRAG retrieval shape, the
    multi-hop generalization of ``relations``): → (name, hop) for every
    node within k hops of the seed names, hop = BFS distance (seeds are
    hop 0).  Endpoint columns and node dtype are taken from ``src``/
    ``dst`` — string names and integer ids both work.

    TWO regimes.  While the frontier stays at or below ``frontier_limit``
    the BFS runs with a BROADCAST frontier: each round streams the edge
    table once through an ``is_in`` semi-join filter (the frontier ships
    with the task closure — it is the neighborhood, small by design) and
    emits per-block DISTINCT neighbors, so the exchange is
    O(distinct neighbors × blocks) and edge rows never shuffle; the
    visited map is O(result) on the driver and the return type is an
    Arrow table.  The moment a round's frontier EXCEEDS the limit — a
    hub-dense graph where the neighborhood approaches the graph — the
    driver state (≤ limit + one round's growth by construction) hands off
    to `_khop_dataset`: visited and frontier become Datasets, the
    semi-join/anti-join/distinct run distributed, and the RESULT IS A
    DATASET — the driver never holds O(graph).  Pass ``frontier_limit=0``
    to force the dataset regime from hop 1 (regime-equality tested)."""
    import pyarrow as pa

    ds = _ds(edges).select_columns([src, dst])
    ntype = pa.schema(
        [(f.name, f.type)
         for f in ds.schema(fetch_if_missing=True).base_schema]
    ).field(src).type
    visited: dict = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, int(k) + 1):
        if len(frontier) > frontier_limit:
            return _khop_dataset(
                ds, visited, frontier, hop, k,
                direction=direction, src=src, dst=dst, ntype=ntype,
            )
        fr = pa.array(sorted(frontier), ntype)

        def neighbors(b: pa.Table, fr=fr) -> pa.Table:
            outs = []
            if direction in ("out", "both"):
                outs.append(b.filter(pc.is_in(b.column(src), value_set=fr))
                            .column(dst))
            if direction in ("in", "both"):
                outs.append(b.filter(pc.is_in(b.column(dst), value_set=fr))
                            .column(src))
            cat = pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in outs]
            )
            return pa.Table.from_pydict({"name": pc.unique(cat)})

        nbr_ds = ds.map_batches(neighbors, batch_format="pyarrow").materialize()
        if nbr_ds.count() > frontier_limit:
            # the ROUND'S OUTPUT would blow the driver bound (a star hub
            # can explode hop h even when hop h-1 passed the check): hand
            # off BEFORE pulling it — the dataset regime recomputes this
            # round distributed from the pre-round state, which is ≤ the
            # limit by the entry check above.  The count is per-block
            # distinct (conservative ≥ the true frontier) — erring toward
            # an early handoff, never toward an unbounded take_all.
            return _khop_dataset(
                ds, visited, frontier, hop, k,
                direction=direction, src=src, dst=dst, ntype=ntype,
            )
        reached = set()
        for r in nbr_ds.take_all():
            reached.add(r["name"])
        frontier = reached - visited.keys()
        if not frontier:
            break
        for n in frontier:
            visited[n] = hop
    names = sorted(visited)
    return pa.Table.from_pydict({
        "name": pa.array(names, ntype),
        "hop": pa.array([visited[n] for n in names], pa.int64()),
    })


def _khop_dataset(ds, visited: dict, frontier: set, hop_start: int, k: int,
                  *, direction: str, src: str, dst: str, ntype) -> rd.Dataset:
    """Dataset-state BFS continuation for hub-dense graphs: visited and
    frontier live as Datasets, each round is

        neighbors  = edges semi-joined to the frontier (adaptive_join:
                     broadcast while small, hash shuffle past that),
                     both directions unioned
        distinct   = partial_grouped_agg on name (map-side combine — the
                     exchange moves O(distinct × blocks), never edge rows)
        fresh      = neighbors LEFT-joined to visited, hop-null kept
                     (the anti-join)
        visited   ∪= fresh at this hop

    State materializes once per round (bounded object-store tables); the
    driver holds refs and ONE count per round.  Returns the (name, hop)
    Dataset UNSORTED — same rows and dtypes as the driver regime,
    different container (that is the point: the result may be the whole
    graph, and both in-repo consumers are order-independent; sort at the
    call site if you need order)."""
    import pyarrow as pa

    from ..functions.joins import adaptive_join
    from .aggregates import partial_grouped_agg

    def name_tbl(names, hops=None) -> pa.Table:
        cols = {"name": pa.array(sorted(names), ntype)}
        if hops is not None:
            cols["hop"] = pa.array([hops[n] for n in sorted(names)], pa.int64())
        return pa.table(cols)

    visited_ds = rd.from_arrow(name_tbl(visited.keys(), visited)).materialize()
    frontier_ds = rd.from_arrow(name_tbl(frontier)).materialize()

    for hop in range(hop_start, int(k) + 1):
        def project(col):
            # in-map projection: lookup_join blocks can carry a stale
            # schema view that confuses select_columns/rename_columns
            return lambda b: pa.table({"name": b.column(col)})

        sides = []
        if direction in ("out", "both"):
            sides.append(
                adaptive_join(
                    ds, frontier_ds, left_keys=[src], right_keys=["name"],
                    how="inner",
                ).map_batches(project(dst), batch_format="pyarrow")
            )
        if direction in ("in", "both"):
            sides.append(
                adaptive_join(
                    ds, frontier_ds, left_keys=[dst], right_keys=["name"],
                    how="inner",
                ).map_batches(project(src), batch_format="pyarrow")
            )
        neighbors = sides[0].union(*sides[1:]) if len(sides) > 1 else sides[0]
        distinct = partial_grouped_agg(neighbors, ["name"], count_alias="_c")
        distinct = distinct.map_batches(
            lambda b: b.select(["name"]), batch_format="pyarrow"
        )
        fresh = (
            adaptive_join(distinct, visited_ds, left_keys=["name"], how="left")
            .map_batches(
                lambda b: b.filter(pc.is_null(b.column("hop")))
                           .select(["name"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if fresh.count() == 0:
            break
        frontier_ds = fresh
        visited_ds = visited_ds.union(
            fresh.map_batches(
                lambda b, h=hop: b.append_column(
                    "hop", pa.array(np.full(b.num_rows, h), pa.int64())
                ),
                batch_format="pyarrow",
            )
        ).materialize()
    return visited_ds


def harmonic_centrality(
    edges, seeds: list, *, max_hops: int = 64, direction: str = "both",
    src: str = "src", dst: str = "dst", small_graph_edges: int = 5_000_000,
):
    """Harmonic centrality of each SEED node: Σ_v 1/d(seed, v) over the
    nodes reachable within ``max_hops``, computed as the EXACT scaled
    integer Σ_d floor(2^40 / d) · |{v : d(seed, v) = d}|.
    → Arrow table (name, harmonic_s, n_reachable), one row per seed.
    Exact-integer weights make the score order-independent — the
    repo-wide rule that keeps reducers partition-invariant.

    Regimes (the iterative-graph-op pattern): at or below
    ``small_graph_edges`` the edge list materializes once on the driver as
    a CSR adjacency and each BFS is a numpy level sweep (per-round Dataset
    scheduling overhead IS the cost at query scale — measured 11 s → ~1 s
    at sf0.1); above it, one broadcast-frontier BFS per seed streams the
    edge table per round through an is_in semi-join (``khop``'s shape —
    edge rows never shuffle).  All-integer hop math → the regimes are
    EXACTLY equal.  Per-seed BFS is the right trade for centrality QUERIES
    over a seed set; an all-nodes sweep at 10^9 nodes wants
    HyperBall-style sketching instead (out of scope — this is the exact
    path)."""
    import pyarrow as pa
    import ray

    ds = _ds(edges).select_columns([src, dst]).materialize()
    ntype = pa.schema(
        [(f.name, f.type)
         for f in ds.schema(fetch_if_missing=True).base_schema]
    ).field(src).type

    def emit(rows: list[tuple]) -> pa.Table:
        return pa.Table.from_pydict({
            "name": pa.array([r[0] for r in rows], ntype),
            "harmonic_s": pa.array([r[1] for r in rows], pa.int64()),
            "n_reachable": pa.array([r[2] for r in rows], pa.int64()),
        })

    if ds.count() <= small_graph_edges:
        tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not tbls:
            return emit([(s, 0, 0) for s in seeds])
        t = pa.concat_tables(tbls).combine_chunks()
        sv, dv = t.column(src).combine_chunks(), t.column(dst).combine_chunks()
        names = pc.unique(pa.concat_arrays([sv, dv]))
        si = pc.index_in(sv, value_set=names).to_numpy(zero_copy_only=False)
        di = pc.index_in(dv, value_set=names).to_numpy(zero_copy_only=False)
        if direction == "out":
            u, v = si, di
        elif direction == "in":
            u, v = di, si
        else:
            u = np.concatenate([si, di])
            v = np.concatenate([di, si])
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        n = len(names)
        offs = np.searchsorted(u, np.arange(n + 1))
        seed_pos = pc.index_in(pa.array(seeds, ntype), value_set=names)
        rows = []
        for s, sp in zip(seeds, seed_pos.to_pylist()):
            if sp is None:  # seed absent from the edge list
                rows.append((s, 0, 0))
                continue
            sp = int(sp)
            dist = np.full(n, -1, np.int64)
            dist[sp] = 0
            frontier = np.array([sp], np.int64)
            hop = 0
            score = total = 0
            while frontier.size and hop < max_hops:
                hop += 1
                nbr = np.concatenate(
                    [v[offs[x]:offs[x + 1]] for x in frontier.tolist()]
                ) if frontier.size else np.empty(0, np.int64)
                nbr = np.unique(nbr)
                nbr = nbr[dist[nbr] < 0]
                if not nbr.size:
                    break
                dist[nbr] = hop
                score += int(RA_SCALE // hop) * int(nbr.size)
                total += int(nbr.size)
                frontier = nbr
            rows.append((s, score, total))
        return emit(rows)

    rows = []
    for seed in seeds:
        t = khop(ds, [seed], k=max_hops, direction=direction,
                 src=src, dst=dst)
        if isinstance(t, rd.Dataset):
            # khop handed off to the dataset regime (hub-dense frontier):
            # reduce to the O(distinct hops) histogram map-side — the
            # integer score needs only (hop, count), never the membership
            from .aggregates import partial_grouped_agg

            hist = partial_grouped_agg(t, ["hop"], count_alias="c").take_all()
            score = sum(int(RA_SCALE // r["hop"]) * r["c"]
                        for r in hist if r["hop"] > 0)
            total = sum(r["c"] for r in hist if r["hop"] > 0)
            rows.append((seed, int(score), int(total)))
            continue
        hops = t.column("hop").to_numpy(zero_copy_only=False)
        hops = hops[hops > 0]  # the seed itself (hop 0) contributes nothing
        score = int((RA_SCALE // hops).sum()) if hops.size else 0
        rows.append((seed, score, int(hops.size)))
    return emit(rows)


def _bc_chunk_deps(offs: np.ndarray, nbrs: np.ndarray, n: int,
                   pivots: np.ndarray) -> np.ndarray:
    """Σ of Brandes per-source dependency vectors over ``pivots``.
    Pure numpy, deterministic given (offs, nbrs, pivots): the forward
    level sweep expands concatenated CSR slices (harmonic_centrality's
    shape), sigma accumulates with np.add.at over the level-(d−1)→d edge
    set, and the backward pass replays the levels in reverse with the
    textbook δ(x) += σ(x)/σ(w)·(1+δ(w)) accumulation.  O(E) numpy work
    per source."""
    acc = np.zeros(n, np.float64)
    for s in pivots.tolist():
        dist = np.full(n, -1, np.int64)
        dist[s] = 0
        sigma = np.zeros(n, np.float64)
        sigma[s] = 1.0
        levels = [np.array([s], np.int64)]
        d = 0
        while True:
            frontier = levels[-1]
            d += 1
            cnts = offs[frontier + 1] - offs[frontier]
            if not cnts.sum():
                break
            nb = np.concatenate(
                [nbrs[offs[x]:offs[x + 1]] for x in frontier.tolist()]
            )
            srcs = np.repeat(frontier, cnts)
            m_new = dist[nb] == -1
            if m_new.any():
                dist[nb[m_new]] = d
            m_next = dist[nb] == d
            np.add.at(sigma, nb[m_next], sigma[srcs[m_next]])
            nxt = np.unique(nb[m_new])
            if not nxt.size:
                break
            levels.append(nxt)
        delta = np.zeros(n, np.float64)
        for depth in range(len(levels) - 1, 0, -1):
            W = levels[depth]
            cnts = offs[W + 1] - offs[W]
            nb = np.concatenate(
                [nbrs[offs[x]:offs[x + 1]] for x in W.tolist()]
            )
            ws = np.repeat(W, cnts)
            m = dist[nb] == depth - 1
            x, w = nb[m], ws[m]
            np.add.at(delta, x, sigma[x] / sigma[w] * (1.0 + delta[w]))
        delta[s] = 0.0
        acc += delta
    return acc


def betweenness_centrality(
    edges, *, k_pivots: int | None = None, src: str = "src",
    dst: str = "dst", chunk_pivots: int = 64,
):
    """Betweenness centrality over the undirected distinct edge set —
    exact Brandes (2001) when ``k_pivots`` is None, the Brandes & Pich
    (2007) pivot estimator otherwise (scores scaled by n/|pivots|; the
    published scale path — exact betweenness is inherently O(V·E) and no
    engine changes that).  → Arrow table (name, betweenness: float64).

    Distributed shape: the canonical CSR (names sorted, edges lexsorted →
    a pure function of the edge SET, so partition counts cannot change any
    score bit) is built once by a zero-CPU task from the edge block refs
    and broadcast via the object store; one Ray task per pivot CHUNK sums
    its sources' dependency vectors (`_bc_chunk_deps`); partials combine
    in a FIXED pairwise tree of zero-CPU tasks whose structure depends
    only on the chunk count — float summation order is therefore
    deterministic end to end.  Pivots are a deterministic grid over the
    sorted node order.  The broadcast CSR caps this at graphs whose edge
    arrays fit the object store (~10^9 edges at 16 B/edge) — beyond that
    betweenness wants landmark/sketch methods, out of scope for the exact
    path.  Undirected double-count halved at the end.

    The reference's graph layer exposes 1-hop listings only
    (query_search.py:186-226); centrality is part of the analysis surface
    a KG user asks for on top."""
    import pyarrow as pa
    import ray

    from .aggregates import distinct_keys

    ds = _ds(edges).select_columns([src, dst])
    ntype = pa.schema(
        [(f.name, f.type)
         for f in ds.schema(fetch_if_missing=True).base_schema]
    ).field(src).type

    def canon(b: pa.Table) -> pa.Table:
        s, d = b.column(src), b.column(dst)
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        t = pa.Table.from_arrays([lo, hi], names=["a", "b"])
        return t.group_by(["a", "b"]).aggregate([])

    e = distinct_keys(
        ds.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    ).materialize()

    @ray.remote(num_cpus=0)
    def build_csr(*tbls):
        live = [t for t in tbls if t.num_rows]
        if not live:
            return None
        t = pa.concat_tables(live).combine_chunks()
        av, bv = t.column("a").combine_chunks(), t.column("b").combine_chunks()
        uniq = pc.unique(pa.concat_arrays([av, bv]))
        names = uniq.take(pc.array_sort_indices(uniq))
        ai = pc.index_in(av, value_set=names).to_numpy(zero_copy_only=False)
        bi = pc.index_in(bv, value_set=names).to_numpy(zero_copy_only=False)
        u = np.concatenate([ai, bi]).astype(np.int64)
        v = np.concatenate([bi, ai]).astype(np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        n = len(names)
        offs = np.searchsorted(u, np.arange(n + 1))
        return names, offs, v

    csr_ref = build_csr.remote(*e.to_arrow_refs())
    csr = ray.get(csr_ref)
    if csr is None:
        return pa.Table.from_pydict({
            "name": pa.array([], ntype),
            "betweenness": pa.array([], pa.float64()),
        })
    names, offs, _ = csr
    n = len(names)
    if k_pivots is None or k_pivots >= n:
        pivots = np.arange(n, dtype=np.int64)
    else:
        pivots = np.unique(
            (np.arange(k_pivots, dtype=np.int64) * n) // k_pivots
        )
    scale = (n / len(pivots)) / 2.0  # n/k estimator; halve the undirected
    chunks = [pivots[i:i + chunk_pivots]
              for i in range(0, len(pivots), chunk_pivots)]

    @ray.remote
    def chunk_task(csr, pv):
        _, offs, nbrs = csr
        return _bc_chunk_deps(offs, nbrs, len(csr[0]), pv)

    @ray.remote(num_cpus=0)
    def add(a, b):
        return a + b

    refs = [chunk_task.remote(csr_ref, pv) for pv in chunks]
    while len(refs) > 1:  # fixed pairwise tree: order set by chunk count
        nxt = [add.remote(refs[i], refs[i + 1])
               for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    bc = ray.get(refs[0]) * scale
    return pa.Table.from_pydict({
        "name": pc.cast(names, ntype),
        "betweenness": pa.array(bc, pa.float64()),
    })


def _triangle_triples(edges, src: str = "src", dst: str = "dst",
                      num_partitions: int = 16):
    """Shared core of ``triangle_count`` / ``local_clustering``: returns
    ``(triples, deg)`` where ``triples`` is a Dataset with one row per
    triangle — (v1, v2, v3) with v1 the degree-order pivot — and ``deg``
    the (node, deg) Dataset of the distinct undirected graph.

    Degree-ordered wedge counting, the textbook distributed formulation (no
    per-node adjacency ever materializes in one place):

    1. canonicalize + DISTINCT the undirected edge set (map-side per-block
       distinct, then one C++ hash groupby — exchange is O(distinct edges));
    2. degrees via ``partial_grouped_agg`` count over the endpoint rows;
    3. orient every edge lo→hi by (degree, node) — each wedge is now charged
       to its LOWEST-degree vertex, so the per-group pair fan-out is bounded
       by O(sqrt(m)) neighbors even on power-law graphs (the skew story);
    4. wedges per lo-group through the hash map/reduce exchange
       (``grouped_apply(exchange="hash")``), pair emission fully vectorized
       (triangular-number inversion, no per-run Python);
    5. one inner join of wedges against the oriented edge set closes the
       triangles — each closed wedge row IS one triangle, exactly once."""
    import pyarrow as pa

    from ..functions.joins import adaptive_join
    from .aggregates import partial_grouped_agg
    from .canonicalize import grouped_apply

    ds = _ds(edges).select_columns([src, dst])

    def canon(b: pa.Table) -> pa.Table:
        s, d = b.column(src), b.column(dst)
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        t = pa.Table.from_arrays([lo, hi], names=["a", "b"])
        return t.group_by(["a", "b"]).aggregate([])

    # global distinct via the adaptive combine (zero-CPU task when the
    # distinct edge set is small, Ray groupby past _SMALL_COMBINE_ROWS)
    from .aggregates import distinct_keys

    e = distinct_keys(
        ds.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    )
    def _ends(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.Table.from_arrays(
            [pa.chunked_array([t.column("a"), t.column("b")])], names=["node"]
        )

    ends = e.map_batches(_ends, batch_format="pyarrow")
    deg = partial_grouped_agg(ends, ["node"], count_alias="deg")
    e = adaptive_join(e, deg, left_keys=["a"], right_keys=["node"],
                      how="inner", num_partitions=num_partitions)
    # select-by-name (not rename-in-place): the shuffle-path join may keep
    # the right key column, so pin the exact output surface after each join
    e = e.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("a"), t.column("b"), t.column("deg")],
            names=["a", "b", "da"],
        ),
        batch_format="pyarrow",
    )
    e = adaptive_join(e, deg, left_keys=["b"], right_keys=["node"],
                      how="inner", num_partitions=num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        da, db = t.column("da"), t.column("db")
        a, b = t.column("a"), t.column("b")
        a_first = pc.or_(pc.less(da, db),
                         pc.and_(pc.equal(da, db), pc.less(a, b)))
        lo = pc.if_else(a_first, a, b)
        hi = pc.if_else(a_first, b, a)
        hd = pc.if_else(a_first, db, da)
        return pa.Table.from_arrays(
            [lo, hi, pc.cast(hd, pa.int64())], names=["lo", "hi", "hd"]
        )

    oriented = e.map_batches(
        lambda t: orient(pa.Table.from_arrays(
            [t.column("a"), t.column("b"), t.column("da"), t.column("deg")],
            names=["a", "b", "da", "db"],
        )),
        batch_format="pyarrow",
    ).materialize()

    lo_type = oriented.schema().base_schema.field("lo").type
    wedge_schema = pa.schema([
        pa.field("wp", lo_type),
        pa.field("wa", oriented.schema().base_schema.field("hi").type),
        pa.field("wb", oriented.schema().base_schema.field("hi").type),
    ])

    def wedge_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        block = block.append_column("_run", pa.array(run_id, pa.int64()))
        block = block.sort_by([("_run", "ascending"), ("hd", "ascending"),
                               ("hi", "ascending")])
        lens = np.diff(np.r_[starts, n])
        m = lens * (lens - 1) // 2
        total = int(m.sum())
        if total == 0:
            return wedge_schema.empty_table()
        pair_off = np.r_[0, np.cumsum(m)]
        k = np.arange(total, dtype=np.int64)
        r = np.searchsorted(pair_off, k, side="right") - 1
        kl = k - pair_off[r]
        # triangular inversion: j = largest with j(j-1)/2 <= kl
        j = ((1.0 + np.sqrt(1.0 + 8.0 * kl.astype(np.float64))) / 2.0).astype(np.int64)
        j -= (j * (j - 1) // 2 > kl)        # float-edge correction
        j += ((j + 1) * j // 2 <= kl)
        i = kl - j * (j - 1) // 2
        base = starts[r]
        hi_col = block.column("hi")
        wp = block.column("lo").take(pa.array(base, pa.int64()))
        wa = hi_col.take(pa.array(base + i, pa.int64()))
        wb = hi_col.take(pa.array(base + j, pa.int64()))

        def _one(c):
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        return pa.Table.from_arrays(
            [_one(wp), _one(wa), _one(wb)], schema=wedge_schema,
        )

    wedges = grouped_apply(
        oriented, ["lo"], None, wedge_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=wedge_block, exchange="hash",
    )
    closed = adaptive_join(
        wedges, oriented.select_columns(["lo", "hi"]),
        left_keys=["wa", "wb"], right_keys=["lo", "hi"],
        how="inner", num_partitions=num_partitions,
    )
    triples = closed.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("wp"), t.column("wa"), t.column("wb")],
            names=["v1", "v2", "v3"],
        ),
        batch_format="pyarrow",
    )
    return triples, deg


def triangle_count(edges, src: str = "src", dst: str = "dst",
                   num_partitions: int = 16):
    """Global triangle count (degree-ordered wedge counting; see
    ``_triangle_triples``).  Orientation choice cannot change the COUNT, so
    the DuckDB oracle uses plain value order (least/greatest + b<b'
    self-joins) while the engine uses degree order.  Returns a 1-row Arrow
    table {triangles: int64}."""
    triples, _ = _triangle_triples(edges, src=src, dst=dst,
                                   num_partitions=num_partitions)
    return pa.table({"triangles": pa.array([triples.count()], pa.int64())})


def local_clustering(edges, src: str = "src", dst: str = "dst",
                     num_partitions: int = 16) -> "rd.Dataset":
    """Per-node local clustering coefficient cc(v) = 2·T(v) / (deg(v)·
    (deg(v)−1)) over the distinct undirected graph.

    T(v) comes from the shared degree-ordered triangle enumeration
    (``_triangle_triples``): each triangle row credits its three vertices
    via one endpoint explode + map-side-combined count — no per-node
    adjacency materialization, same skew bound as the triangle count.  The
    coefficient is ONE float division of exact integers (2·T < 2⁶³,
    deg·(deg−1) < 2⁶³ checked), so a HUGEINT→DOUBLE SQL oracle reproduces
    the doubles bit-for-bit.  Nodes with deg < 2 are dropped (cc undefined).
    Returns a Dataset (node, deg, tri, cc) — callers order/limit."""
    from ..functions.joins import adaptive_join
    from .aggregates import partial_grouped_agg

    triples, deg = _triangle_triples(edges, src=src, dst=dst,
                                     num_partitions=num_partitions)

    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.Table.from_arrays(
            [pa.chunked_array([t.column("v1"), t.column("v2"),
                               t.column("v3")])],
            names=["node"],
        )

    tcnt = partial_grouped_agg(
        triples.map_batches(explode, batch_format="pyarrow"),
        ["node"], count_alias="tri",
    )
    j = adaptive_join(deg, tcnt, left_keys=["node"], right_keys=["node"],
                      how="left", num_partitions=num_partitions)

    def score(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d >= 2
        t = t.filter(pa.array(keep))
        d = d[keep]
        tri = pc.fill_null(t.column("tri"), 0)
        trv = tri.to_numpy(zero_copy_only=False).astype(np.int64)
        num = 2 * trv
        den = d * (d - 1)
        # operands are exact in float64 (graph degrees and per-node triangle
        # counts sit far below 2^53); one correctly-rounded division each
        cc = num.astype(np.float64) / den.astype(np.float64)
        return pa.table({
            "node": t.column("node"),
            "deg": pc.cast(t.column("deg"), pa.int64()),
            "tri": pa.array(trv, pa.int64()),
            "cc": pa.array(cc, pa.float64()),
        })

    return j.map_batches(score, batch_format="pyarrow")


def _label_propagation_local(e, rounds: int):
    """SMALL-GRAPH LPA REGIME (the CC three-regime precedent): below the
    edge threshold the 5 Dataset ops per round are pure scheduling overhead
    (~5 s/round on a 100k-edge graph measured at sf0.1), so run the SAME
    deterministic rule driver-side in vectorized numpy.  The rule is
    all-integer (counts + min-label tiebreak; label-code order == string
    order because np.unique sorts), so the result is EXACTLY equal to the
    distributed path — regime-equality tested."""
    import pyarrow as pa
    import ray

    tbls = [t for t in ray.get(e.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return rd.from_arrow(pa.table(
            {"node": pa.array([], pa.string()),
             "community": pa.array([], pa.string())}
        ))
    et = pa.concat_tables(tbls).combine_chunks()
    ntype = et.column("u").type
    u = et.column("u").to_numpy(zero_copy_only=False)
    v = et.column("v").to_numpy(zero_copy_only=False)
    nodes_sorted, inv = np.unique(np.concatenate([u, v]),
                                  return_inverse=True)
    m = len(u)
    ui, vi = inv[:m].astype(np.int64), inv[m:].astype(np.int64)
    lab = np.arange(len(nodes_sorted), dtype=np.int64)
    mn = np.concatenate([ui, vi])  # message targets (fixed across rounds)
    for _ in range(int(rounds)):
        ml = np.concatenate([lab[vi], lab[ui]])  # neighbor labels
        order = np.lexsort((ml, mn))
        ns, ls = mn[order], ml[order]
        new_pair = np.r_[True, (ns[1:] != ns[:-1]) | (ls[1:] != ls[:-1])]
        starts = np.flatnonzero(new_pair)
        cnt = np.diff(np.r_[starts, len(ns)])
        pn, pl = ns[starts], ls[starts]
        # per node: max count, tie → min label (pairs are label-ascending
        # within each node, so first-of-max wins the tie)
        pick = np.lexsort((pl, -cnt, pn))
        first = pick[np.r_[True, pn[pick][1:] != pn[pick][:-1]]]
        lab = lab.copy()
        lab[pn[first]] = pl[first]
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes_sorted.tolist(), ntype),
        "community": pa.array(nodes_sorted[lab].tolist(), ntype),
    }))


def label_propagation(edges, src: str = "src", dst: str = "dst",
                      rounds: int = 5, num_partitions: int = 16,
                      small_graph_edges: int = 1_000_000):
    """Community detection by SYNCHRONOUS label propagation (LPA, the
    GraphFrames/Raghavan rule made deterministic): every node starts as its
    own community; each round every node adopts the label most frequent
    among its neighbors, ties broken by MIN label — fixed round count +
    synchronous updates + deterministic tiebreak ⇒ the output is a pure
    function of the edge set (reproducible at any parallelism).

    Per round, entirely Dataset ops: the O(nodes) label table broadcasts
    back onto one streamed pass of the edge table (two directions →
    (node, neighbor_label) messages), map-side-combined (node, label)
    counts, then ``grouped_topk`` k=1 (count desc, label asc) picks each
    node's vote — edge rows never shuffle; the wide exchanges are
    O(node-label pairs).  Returns a Dataset (node, community)."""
    import pyarrow as pa

    from ..functions.joins import adaptive_join
    from .aggregates import grouped_topk, partial_grouped_agg

    ds = _ds(edges).select_columns([src, dst])

    def canon(b: pa.Table) -> pa.Table:
        s, d = b.column(src), b.column(dst)
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        # undirected canonical order BEFORE distinct, or an edge present in
        # both orientations would cast two votes per round
        t = pa.Table.from_arrays(
            [pc.min_element_wise(s, d), pc.max_element_wise(s, d)],
            names=["u", "v"],
        )
        return t.group_by(["u", "v"]).aggregate([])

    from .aggregates import distinct_keys

    e = distinct_keys(
        ds.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
    ).materialize()

    if e.count() <= small_graph_edges:
        return _label_propagation_local(e, rounds)

    def ends(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.Table.from_arrays(
            [pa.chunked_array([t.column("u"), t.column("v")])], names=["node"]
        )

    labels = (
        partial_grouped_agg(
            e.map_batches(ends, batch_format="pyarrow"), ["node"],
            count_alias="_d",
        )
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"), t.column("node")],
                names=["node", "community"],
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _ in range(int(rounds)):
        def msgs_dir(key: str, other: str):
            j = adaptive_join(
                e, labels, left_keys=[other], right_keys=["node"],
                how="inner", num_partitions=num_partitions,
            )
            return j.map_batches(
                lambda t, k=key: pa.Table.from_arrays(
                    [t.column(k), t.column("community")],
                    names=["node", "label"],
                ),
                batch_format="pyarrow",
            )

        msgs = msgs_dir("u", "v").union(msgs_dir("v", "u"))
        counts = partial_grouped_agg(msgs, ["node", "label"],
                                     count_alias="c")
        labels = grouped_topk(
            counts, ["node"], value_col="c", tiebreak_cols=["label"], k=1,
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("node"), t.column("label")],
                names=["node", "community"],
            ),
            batch_format="pyarrow",
        ).materialize()
    return labels


def random_walks(edges, *, length: int = 5, walks_per_node: int = 1,
                 seed: int = 0, src: str = "src", dst: str = "dst",
                 num_partitions: int = 16):
    """DETERMINISTIC uniform random walks over an undirected graph — the
    DeepWalk/node2vec front-end that turns a graph into a training corpus.
    "Random" is a splitmix64 hash of (walk_id, step, seed), so the walk set
    is a pure function of (edge set, seed): reproducible at any
    parallelism, any block layout, and mirrorable by a reference
    implementation (the pytest oracle).

    Scale shape: the adjacency index (node → SORTED neighbor list) builds
    once through the hash map/reduce exchange (one ListArray per reduce
    partition, no per-group Python) and broadcasts as a shared zero-copy
    lookup (functions/joins.lookup_join); each of the ``length`` steps is
    one streaming map over the O(nodes × walks_per_node) walk table — the
    edge set itself never reshuffles after the index build.  Returns a
    Dataset (walk_id, step, node); step 0 is the start node."""
    import pyarrow as pa

    from ..functions.hashing import mix64
    from ..functions.joins import lookup_join
    from .canonicalize import grouped_apply

    ds = _ds(edges).select_columns([src, dst])

    def both_dirs(b: pa.Table) -> pa.Table:
        s, d = b.column(src), b.column(dst)
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        if isinstance(s, pa.ChunkedArray):
            s, d = s.combine_chunks(), d.combine_chunks()
        t = pa.Table.from_arrays(
            [pa.chunked_array([s, d]), pa.chunked_array([d, s])],
            names=["node", "nbr"],
        )
        return t.combine_chunks().group_by(["node", "nbr"]).aggregate([])

    pairs = ds.map_batches(both_dirs, batch_format="pyarrow")
    node_t = pairs.schema(fetch_if_missing=True).base_schema.field("node").type
    adj_schema = pa.schema([
        ("node", node_t), ("nbrs", pa.list_(node_t)), ("deg", pa.int64()),
    ])

    def adj_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        block = block.append_column("_run", pa.array(run_id, pa.int64()))
        # dedupe (node, nbr) repeats across input blocks, keep nbrs sorted
        block = block.sort_by([("_run", "ascending"), ("nbr", "ascending")])
        nb = block.column("nbr")
        nb = nb.combine_chunks() if isinstance(nb, pa.ChunkedArray) else nb
        rr = block.column("_run").to_numpy(zero_copy_only=False)
        arr = nb.to_numpy(zero_copy_only=False)
        first = np.r_[True, (rr[1:] != rr[:-1]) | (arr[1:] != arr[:-1])]
        keep = np.flatnonzero(first)
        nb = nb.take(pa.array(keep, pa.int64()))
        rk = rr[keep]
        run_starts = np.flatnonzero(np.r_[True, rk[1:] != rk[:-1]])
        offs = np.r_[run_starts, len(rk)].astype(np.int32)
        nodes = block.column("node").take(pa.array(keep[run_starts], pa.int64()))
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), nb)
        deg = np.diff(offs).astype(np.int64)
        return pa.Table.from_arrays(
            [nodes.combine_chunks() if isinstance(nodes, pa.ChunkedArray)
             else nodes, lists, pa.array(deg, pa.int64())],
            schema=adj_schema,
        )

    adj = grouped_apply(
        pairs, ["node"], None, adj_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=adj_block, exchange="hash",
    ).materialize()
    adj_refs = adj.to_arrow_refs()

    def start_walks(b: pa.Table) -> pa.Table:
        nodes = b.column("node")
        n = len(nodes)
        reps = pa.chunked_array([nodes] * walks_per_node).combine_chunks() \
            if walks_per_node > 1 else (
                nodes.combine_chunks() if isinstance(nodes, pa.ChunkedArray)
                else nodes)
        # walk_id = hash(start node) mixed with the replica index: unique,
        # deterministic, layout-independent
        from ..functions.hashing import hash_key_columns

        h = hash_key_columns(pa.table({"node": reps}), ["node"])
        rep = np.repeat(np.arange(walks_per_node, dtype=np.uint64), n)
        wid = mix64(h ^ (rep * np.uint64(0x9E3779B97F4A7C15)))
        return pa.Table.from_pydict({
            "walk_id": pa.array(wid.view(np.int64) >> 1, pa.int64()),
            "cur": reps,
        })

    walks = adj.select_columns(["node"]).map_batches(
        start_walks, batch_format="pyarrow"
    ).materialize()

    out_parts = []
    cur = walks
    for step in range(int(length) + 1):
        out_parts.append(cur.map_batches(
            lambda b, s=step: pa.Table.from_pydict({
                "walk_id": b.column("walk_id"),
                "step": pa.array(
                    np.full(b.num_rows, s, np.int64), pa.int64()
                ),
                "node": b.column("cur"),
            }),
            batch_format="pyarrow",
        ))
        if step == int(length):
            break
        j = lookup_join(cur, adj_refs, left_keys=["cur"],
                        right_keys=["node"], how="inner",
                        right_schema=adj_schema)

        def advance(b: pa.Table, s=step) -> pa.Table:
            b = b.combine_chunks()
            wid = b.column("walk_id").to_numpy(zero_copy_only=False)
            deg = b.column("deg").to_numpy(zero_copy_only=False)
            nbrs = b.column("nbrs")
            if isinstance(nbrs, pa.ChunkedArray):
                nbrs = nbrs.combine_chunks()
            r = mix64(
                wid.view(np.uint64)
                ^ (np.uint64(s + 1) * np.uint64(0xD6E8FEB86659FD93))
                ^ np.uint64(seed)
            )
            pick = (r % deg.astype(np.uint64)).astype(np.int64)
            offs = nbrs.offsets.to_numpy(zero_copy_only=False)[:-1]
            nxt = nbrs.values.take(pa.array(offs + pick, pa.int64()))
            return pa.Table.from_pydict(
                {"walk_id": b.column("walk_id"), "cur": nxt}
            )

        cur = j.map_batches(advance, batch_format="pyarrow").materialize()

    out = out_parts[0].union(*out_parts[1:])
    return out


def ego_subgraph(edges, seeds: list[str], k: int,
                 src: str = "src", dst: str = "dst"):
    """k-hop EGO SUBGRAPH — the GraphRAG context-retrieval shape: the
    edge rows whose BOTH endpoints lie within ``k`` hops of the seeds
    (``khop`` gives the node set; this returns the induced edges, ready to
    feed an LLM prompt or a sub-analysis).  One khop BFS, then one
    streaming ``is_in`` filter over the edge table with the broadcast
    member set — edge rows never shuffle.  Endpoint columns and node dtype
    follow ``src``/``dst`` (threaded through the BFS too).  Returns a
    Dataset of the original edge rows."""
    import pyarrow as pa

    members = khop(edges, seeds, k=k, src=src, dst=dst)
    ds = _ds(edges)
    if isinstance(members, rd.Dataset):
        # dataset-regime membership (hub-dense neighborhood): induce edges
        # by two adaptive semi-joins instead of broadcasting O(graph) names
        from ..functions.joins import adaptive_join

        edge_cols = list(ds.schema(fetch_if_missing=True).names)
        names = members.map_batches(
            lambda b: b.select(["name"]), batch_format="pyarrow"
        ).materialize()
        e = adaptive_join(ds, names, left_keys=[src], right_keys=["name"],
                          how="inner")
        e = adaptive_join(e, names, left_keys=[dst], right_keys=["name"],
                          how="inner")
        # the shuffle-join regime keeps the right key column; project back
        # to the input edge schema so both regimes return identical rows
        return e.map_batches(
            lambda b: b.select(edge_cols), batch_format="pyarrow"
        )
    mset = members.column("name").combine_chunks()

    def flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(
            pc.is_in(b.column(src), value_set=mset),
            pc.is_in(b.column(dst), value_set=mset),
        ))

    return ds.map_batches(flt, batch_format="pyarrow")


RA_SCALE = 1 << 40  # resource-allocation weights as exact scaled integers


def link_predict_common_neighbors(
    edges, *, k: int = 50, src: str = "src", dst: str = "dst",
    max_degree: int | None = None, num_partitions: int = 16,
    method: str = "cn",
):
    """Common-neighbor link prediction (the classic unsupervised baseline,
    Liben-Nowell & Kleinberg 2003): score every NON-adjacent node pair
    (u, w) by the number of shared neighbors, return the top-``k`` by
    (score desc, u, w).  The reference's graph layer has 1-hop listings
    only (query_search.py:186-226); this is the 2-hop generalization a KG
    user asks for next ("which entities should probably be connected?").

    Distributed shape (no adjacency ever in one place):

    1. DISTINCT undirected edge set (per-block canonicalize+distinct, one
       combined groupby — exchange O(distinct edges));
    2. adjacency rows (v, n) in both directions;
    3. per-center neighbor-pair emission through the hash map/reduce
       exchange (``grouped_apply(exchange="hash")``), fully vectorized via
       the same triangular-number inversion as ``triangle_count`` — each
       wedge (u, v, w) is charged to its center v, so the per-pair count
       IS the common-neighbor score;
    4. pair counts via ``partial_grouped_agg`` (map-side combine, adaptive
       zero-CPU final merge);
    5. existing edges removed with the marker-column anti-join;
    6. global (score desc, u, w) sort + limit(k).

    Skew guard: a hub of degree d emits d(d-1)/2 pairs.  ``max_degree``
    (None = unbounded) SKIPS centers above the cap — the standard
    truncation for power-law graphs; leave None when exactness vs an
    oracle is required (the derived doc graph's degrees are ~6).

    ``method``: "cn" scores a pair by its shared-neighbor COUNT;
    "ra" is the resource-allocation index (Zhou et al. 2009) —
    Σ 1/deg(v) over shared neighbors v — computed as the EXACT scaled
    integer Σ floor(2^40 / deg(v)) so the grouped sum is order-independent
    and the SQL mirror (``sum(2^40 // d)``) hashes bit-identically (the
    repo-wide float-summation-order rule).  The hash exchange colocates
    every adjacency row of a center, so the run length IS its full degree.
    "jaccard" is |N(u) ∩ N(w)| / |N(u) ∪ N(w)| = cn / (deg(u) + deg(w)
    − cn), as the EXACT scaled integer floor(2^40·cn / (du + dw − cn)) —
    one integer division AFTER the grouped count, so it shares cn's
    order-independence; degrees attach via two ``adaptive_join``s against
    the O(|V|)-row degree table (broadcast when small, hash shuffle past
    the byte cap).

    Returns a Dataset (u:int64-like, w, cn|ra|jaccard:int64) of k rows.
    """
    import pyarrow as pa

    from ..functions.joins import adaptive_join
    from .aggregates import distinct_keys, partial_grouped_agg
    from .canonicalize import grouped_apply

    ds = _ds(edges).select_columns([src, dst])

    def canon(b: pa.Table) -> pa.Table:
        s, d = b.column(src), b.column(dst)
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        t = pa.Table.from_arrays([lo, hi], names=["a", "b"])
        return t.group_by(["a", "b"]).aggregate([])

    e = distinct_keys(
        ds.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    ).materialize()
    node_t = e.schema().base_schema.field("a").type

    def adjacency(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        a, b = t.column("a"), t.column("b")
        return pa.Table.from_arrays(
            [pa.chunked_array([a, b]), pa.chunked_array([b, a])],
            names=["v", "n"],
        )

    adj = e.map_batches(adjacency, batch_format="pyarrow")
    fields = [pa.field("u", node_t), pa.field("w", node_t)]
    if method == "ra":
        fields.append(pa.field("s", pa.int64()))
    pair_schema = pa.schema(fields)

    def pair_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        run_id = np.zeros(n, np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        block = block.append_column("_run", pa.array(run_id, pa.int64()))
        block = block.sort_by([("_run", "ascending"), ("n", "ascending")])
        lens = np.diff(np.r_[starts, n])
        m = lens * (lens - 1) // 2
        if max_degree is not None:
            m[lens > max_degree] = 0
        total = int(m.sum())
        if total == 0:
            return pair_schema.empty_table()
        pair_off = np.r_[0, np.cumsum(m)]
        kk = np.arange(total, dtype=np.int64)
        r = np.searchsorted(pair_off, kk, side="right") - 1
        kl = kk - pair_off[r]
        j = ((1.0 + np.sqrt(1.0 + 8.0 * kl.astype(np.float64))) / 2.0).astype(np.int64)
        j -= (j * (j - 1) // 2 > kl)
        j += ((j + 1) * j // 2 <= kl)
        i = kl - j * (j - 1) // 2
        base = starts[r]
        nb = block.column("n")
        u = nb.take(pa.array(base + i, pa.int64()))
        w = nb.take(pa.array(base + j, pa.int64()))
        cols = [u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u,
                w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w]
        if method == "ra":
            cols.append(pa.array(RA_SCALE // lens[r], pa.int64()))
        return pa.Table.from_arrays(cols, schema=pair_schema)

    pairs = grouped_apply(
        adj, ["v"], None, pair_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=pair_block, exchange="hash",
    )
    score_col = {"ra": "ra", "jaccard": "jaccard"}.get(method, "cn")
    if method == "ra":
        scores = partial_grouped_agg(pairs, ["u", "w"], sums={"s": "ra"})
    else:
        scores = partial_grouped_agg(pairs, ["u", "w"], count_alias="cn")
    if method == "jaccard":
        deg = partial_grouped_agg(adj, ["v"], count_alias="d")
        scores = adaptive_join(
            scores, deg, left_keys=["u"], right_keys=["v"],
            how="inner", num_partitions=num_partitions,
        ).map_batches(
            lambda t: t.rename_columns(
                ["du" if c == "d" else c for c in t.column_names]
            ).drop_columns([c for c in t.column_names if c == "v"]),
            batch_format="pyarrow",
        )
        scores = adaptive_join(
            scores, deg, left_keys=["w"], right_keys=["v"],
            how="inner", num_partitions=num_partitions,
        )

        def jac(t: pa.Table) -> pa.Table:
            cn = pc.cast(t.column("cn"), pa.int64())
            du = pc.cast(t.column("du"), pa.int64())
            dw = pc.cast(t.column("d"), pa.int64())
            # union size = du + dw - cn >= 1 whenever cn >= 1 (always here)
            den = pc.subtract(pc.add(du, dw), cn)
            s = pc.divide(pc.multiply(cn, pa.scalar(RA_SCALE, pa.int64())),
                          den)  # integer floor division on int64
            return pa.Table.from_arrays(
                [t.column("u"), t.column("w"), s],
                names=["u", "w", "jaccard"],
            )

        scores = scores.map_batches(jac, batch_format="pyarrow")
    marker = e.map_batches(
        lambda t: t.append_column("_adj", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    cand = adaptive_join(
        scores, marker, left_keys=["u", "w"], right_keys=["a", "b"],
        how="left", num_partitions=num_partitions,
    )
    cand = cand.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("u"), t.column("w"),
             pc.cast(t.column(score_col), pa.int64())],
            names=["u", "w", score_col],
        ).filter(pc.is_null(t.column("_adj"))),
        batch_format="pyarrow",
    )
    return cand.sort(
        [score_col, "u", "w"], descending=[True, False, False]
    ).limit(k)


def _hindex_fixpoint(u: np.ndarray, v: np.ndarray, n_nodes: int) -> np.ndarray:
    """Coreness by the H-index iteration (Lü et al. 2016, Nat. Commun. 7:10168):
    c₀ = degree; c_{t+1}(x) = H-index of {c_t(y) : y ∈ N(x)}.  The sequence is
    monotone non-increasing and its fixpoint IS the core number — shared by
    the driver regime and (per reduce partition) the distributed path, so the
    two regimes are exactly equal by construction (all-integer)."""
    mn = np.concatenate([u, v])          # message targets, fixed per round
    nb = np.concatenate([v, u])
    order = np.argsort(mn, kind="stable")
    mn_s, nb_s = mn[order], nb[order]
    starts = np.flatnonzero(np.r_[True, mn_s[1:] != mn_s[:-1]])
    lens = np.diff(np.r_[starts, len(mn_s)])
    c = np.zeros(n_nodes, np.int64)
    c[mn_s[starts]] = lens                # degree init (isolated nodes stay 0)
    run_of = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(mn_s)) - np.repeat(starts, lens) + 1
    L = np.repeat(lens, lens)
    while True:
        vals = c[nb_s]
        # ascending in-run sort, then h = |{j : v_j + pos_j ≥ L + 1}|
        o = np.lexsort((vals, run_of))
        ok = vals[o] + pos >= L + 1
        h = np.add.reduceat(ok, starts).astype(np.int64)
        if np.array_equal(h, c[mn_s[starts]]):
            return c
        c = c.copy()
        c[mn_s[starts]] = h


def core_numbers(edges, src: str = "src", dst: str = "dst",
                 num_partitions: int = 16,
                 small_graph_edges: int = 1_000_000,
                 max_rounds: int | None = None):
    """k-core decomposition: core number per node of the undirected simple
    graph (self-loops dropped, duplicate/bidirected edges collapsed).

    Small graphs (≤ ``small_graph_edges`` distinct edges — the LPA/pagerank
    driver-regime precedent) run `_hindex_fixpoint` driver-side.  Larger
    graphs iterate the SAME integer rule distributedly: per round, the
    O(nodes) c-table joins back onto one streamed pass of the edge table
    (both directions → (node, neighbor-c) messages, edge rows never
    reshuffle more than the hash exchange), a `grouped_apply` hash exchange
    colocates each node's messages and a vectorized run scan computes the
    per-node H-index.  Early stop: Σc is strictly decreasing until the
    fixpoint (the iterate is elementwise non-increasing), so ONE tiny sum
    aggregate per round detects convergence — no O(nodes) driver diff.

    Rounds-to-converge is bounded by the graph's "propagation depth" (a
    path graph needs n/2 rounds) — ``max_rounds`` caps runaway chains; None
    iterates to the exact fixpoint.  → Dataset (node, core:int64)."""
    from ..functions.joins import adaptive_join
    from .aggregates import distinct_keys, partial_grouped_agg
    from .canonicalize import grouped_apply

    ds = _ds(edges).select_columns([src, dst])

    def canon(b: pa.Table) -> pa.Table:
        s, d = b.column(src), b.column(dst)
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        t = pa.Table.from_arrays(
            [pc.min_element_wise(s, d), pc.max_element_wise(s, d)],
            names=["u", "v"],
        )
        return t.group_by(["u", "v"]).aggregate([])

    e = distinct_keys(
        ds.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
    ).materialize()

    if e.count() <= small_graph_edges:
        tbls = [t for t in ray.get(e.to_arrow_refs()) if t.num_rows]
        if not tbls:
            return rd.from_arrow(pa.table(
                {"node": pa.array([], pa.string()),
                 "core": pa.array([], pa.int64())}))
        et = pa.concat_tables(tbls).combine_chunks()
        ntype = et.column("u").type
        un = et.column("u").to_numpy(zero_copy_only=False)
        vn = et.column("v").to_numpy(zero_copy_only=False)
        nodes_sorted, inv = np.unique(np.concatenate([un, vn]),
                                      return_inverse=True)
        m = len(un)
        c = _hindex_fixpoint(inv[:m].astype(np.int64),
                             inv[m:].astype(np.int64), len(nodes_sorted))
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes_sorted.tolist(), ntype),
            "core": pa.array(c, pa.int64()),
        }))

    def ends(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.Table.from_arrays(
            [pa.chunked_array([t.column("u"), t.column("v")])], names=["node"]
        )

    c_tbl = partial_grouped_agg(
        e.map_batches(ends, batch_format="pyarrow"), ["node"], count_alias="core"
    ).materialize()
    node_t = c_tbl.schema().base_schema.field("node").type
    out_schema = pa.schema([("node", node_t), ("core", pa.int64())])

    def _sum_core(tbl: rd.Dataset) -> int:
        return sum(
            pc.sum(t.column("core")).as_py() or 0
            for t in ray.get(tbl.to_arrow_refs()) if t.num_rows
        )

    def hindex_block(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        cv = block.column("cv").to_numpy(zero_copy_only=False)
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens) + 1
        L = np.repeat(lens, lens)
        ok = cv + pos >= L + 1           # cv ascending in-run via order_col
        h = np.add.reduceat(ok, starts).astype(np.int64)
        return pa.Table.from_arrays(
            [block.column("node").take(pa.array(starts, pa.int64())),
             pa.array(h, pa.int64())],
            schema=out_schema,
        )

    total = _sum_core(c_tbl)
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        rounds += 1

        def msgs_dir(key: str, other: str):
            j = adaptive_join(
                e, c_tbl, left_keys=[other], right_keys=["node"],
                how="inner", num_partitions=num_partitions,
            )
            return j.map_batches(
                lambda t, k=key: pa.Table.from_arrays(
                    [t.column(k), pc.cast(t.column("core"), pa.int64())],
                    names=["node", "cv"],
                ),
                batch_format="pyarrow",
            )

        msgs = msgs_dir("u", "v").union(msgs_dir("v", "u"))
        c_tbl = grouped_apply(
            msgs, ["node"], None, out_schema,
            num_partitions=num_partitions, hash_sort=True,
            block_fn=hindex_block, order_col="cv", exchange="hash",
        ).materialize()
        new_total = _sum_core(c_tbl)
        if new_total == total:
            break
        total = new_total
    return c_tbl

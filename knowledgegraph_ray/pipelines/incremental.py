"""Incremental merge: fold new extractions into an existing graph (D4/J3).

The reference's incremental path probes the live DB per dedup group (exact
field match, then array-contains on emails/aliases —
/root/reference/src/workspace_kg/components/systematic_merge_provider.py:
300-393) and merges into the matched row, never updating the primary key
(:682-684); relations update arrays + max strength on conflict (:1062-1113).

Ray-Data-first equivalent — **the existing graph joins the same shuffle the
new mentions use**:

1. every existing node is converted to a pseudo-mention whose attributes are
   its own columns, with an ordinal BELOW every new mention — the same
   candidate-key generation then reproduces the probe rules (name/emails/
   aliases/domain/url keys), and "first item wins" makes the existing row the
   merge base, so primary names never change;
2. one canonicalization pass over (pseudo + new) mentions yields components;
   components holding ≥2 existing nodes mean a new bridging mention merged
   previously-distinct entities — a rename map (old canonical → new) is
   emitted and existing edges are rewritten through it;
3. new triples resolve through the incremental alias map; rewritten existing
   edges and new edges merge per (src, dst, type) with existing rows first
   (array unions preserve their order, strength takes the max).
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import ARRAY_NODE_COLUMNS, SCALAR_NODE_COLUMNS
from ..stages.canonicalize import NODES_SCHEMA, canonicalize
from ..stages.edges import EDGES_SCHEMA, materialize_edges, merge_edge_row
from ..stages.extract import MENTION_SCHEMA, explode_mentions, explode_triples
from ..functions.ids import relation_id

EXISTING_URL = "graph://existing"
# Existing nodes get ordinals below any real page ordinal so "first item wins"
# keeps them as merge bases (mid = EXISTING_BASE + index).
EXISTING_BASE = -(1 << 60)


def _pseudo_mention_block(tbl: pa.Table, offset: int) -> pa.Table:
    """One sorted node block → pseudo-mention rows with ordinals
    offset..offset+n (column-wise extraction; no per-cell .as_py())."""
    import ray  # worker-side

    n = tbl.num_rows
    names = tbl.column("name").to_pylist() if n else []
    cols = set(tbl.column_names)
    scalars = {
        c: tbl.column(c).to_pylist()
        for c in SCALAR_NODE_COLUMNS
        if c in cols and c != "type"
    }
    arrays = {c: tbl.column(c).to_pylist() for c in ARRAY_NODE_COLUMNS if c in cols}
    types = tbl.column("type").to_pylist() if n else []
    perms = arrays.get("permissions", [None] * n)
    attrs_json: list[str] = []
    sources_json: list[str] = []
    node_sources = arrays.get("sources", [None] * n)
    for i in range(n):
        attrs: dict[str, Any] = {}
        for c, vals in scalars.items():
            v = vals[i]
            if v:
                attrs[c] = v
        for c, vals in arrays.items():
            # sources travel out-of-band (MENTION_SCHEMA.sources_json)
            v = vals[i]
            if v and c != "sources":
                attrs[c] = list(v)
        attrs_json.append(json.dumps(attrs, sort_keys=True))
        # always explicit JSON here: "" would mean [url] == [EXISTING_URL]
        sources_json.append(json.dumps(list(node_sources[i] or [])))
    mids = list(range(EXISTING_BASE + offset, EXISTING_BASE + offset + n))
    return pa.Table.from_pydict(
        {
            "mid": pa.array(mids, pa.int64()),
            "url": pa.array([EXISTING_URL] * n, pa.string()),
            "ord": pa.array(mids, pa.int64()),
            "entity_name": pa.array(names, pa.string()),
            "entity_type": pa.array(types, pa.string()),
            "attributes_json": pa.array(attrs_json, pa.string()),
            "sources_json": pa.array(sources_json, pa.string()),
            "permissions_json": pa.array(
                [json.dumps(p or []) for p in perms], pa.string()
            ),
        },
        schema=MENTION_SCHEMA,
    )


def nodes_as_mentions(nodes: rd.Dataset) -> rd.Dataset:
    """Existing canonical nodes → pseudo-mentions carrying their identity
    keys, ordered by the nodes' original first-seen ordinal (min_ord, name
    tie-break) so incremental canonical-name choice matches what a
    from-scratch run over all inputs would pick.

    Distributed: the sorted node blocks stay in the object store; global
    ordinals come from per-block prefix counts (one metadata task per
    block), and each block converts in its own task with column-wise
    extraction — the driver holds only refs, never the node table."""
    import ray

    sch = nodes.schema()
    names = sch.names if sch is not None else []
    sort_keys = (
        ["min_ord", "name"] if "min_ord" in names else ["type", "name"]
    )
    mat = nodes.sort(sort_keys).materialize()
    refs = mat.to_arrow_refs()  # block order == global sort order

    @ray.remote
    def _rows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def _convert(t: pa.Table, off: int) -> pa.Table:
        return _pseudo_mention_block(t, off)

    counts = ray.get([_rows.remote(r) for r in refs])
    offsets = [0]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + c)
    out_refs = [
        _convert.remote(r, off) for r, off in zip(refs, offsets)
    ]
    if not out_refs:
        return rd.from_arrow(MENTION_SCHEMA.empty_table())
    return rd.from_arrow_refs(out_refs)


def _rename_map(nodes_new: rd.Dataset, with_comp: rd.Dataset) -> rd.Dataset:
    """(old canonical name, type) → new canonical name for every existing
    pseudo-mention whose canonical name CHANGED.  Identity rows are
    filtered out distributed — they are no-ops under the left-join +
    coalesce rewrite, and at scale they are O(existing nodes): keeping
    them used to pull the whole node table onto the driver (measured
    3.7 GB driver RSS at the 10M-node drive).  The comp→name side rides
    adaptive_join (block-ref broadcast or shuffle), so nothing O(nodes)
    ever crosses the driver."""
    from ..functions.joins import adaptive_join

    existing = with_comp.map_batches(
        lambda b: b.filter(pc.equal(b.column("url"), EXISTING_URL)).select(
            ["entity_name", "entity_type", "comp"]
        ),
        batch_format="pyarrow",
    )
    canon = nodes_new.select_columns(["comp", "name"])
    joined = adaptive_join(
        existing, canon, left_keys=["comp"], how="inner"
    )

    def only_renamed(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b.column("entity_name"), b.column("name")))
        return pa.table({
            "old_name": b.column("entity_name"),
            "etype": b.column("entity_type"),
            "new_name": b.column("name"),
        })

    return joined.map_batches(only_renamed, batch_format="pyarrow").materialize()


def _rewrite_existing_edges(edges: rd.Dataset, rename: rd.Dataset) -> rd.Dataset:
    """Rewrite src/dst of existing edges through the rename map (old→new
    canonical); unmatched names are unchanged (left join + coalesce)."""
    from ..functions.joins import adaptive_join

    def as_map(prefix: str):
        return rename.map_batches(
            lambda b, p=prefix: pa.table({
                p: b.column("old_name"),
                f"{p}_type": b.column("etype"),
                f"{p}_new": b.column("new_name"),
            }),
            batch_format="pyarrow",
        )

    e = adaptive_join(edges, as_map("src"),
                      left_keys=["src", "src_type"], how="left")
    e = adaptive_join(e, as_map("dst"),
                      left_keys=["dst", "dst_type"], how="left")

    def apply(b: pa.Table) -> pa.Table:
        from ..functions.arrow_utils import safe_coalesce

        # an EMPTY rename map joins through without the payload column
        # (nothing to rewrite) — leave the endpoint untouched
        for col in ("src", "dst"):
            new = f"{col}_new"
            if new not in b.column_names:
                continue
            b = b.set_column(
                b.column_names.index(col), col,
                safe_coalesce(b.column(new), b.column(col)),
            ).drop_columns([new])
        return b

    return e.map_batches(apply, batch_format="pyarrow")


def _edge_union_block(block: pa.Table, starts) -> pa.Table:
    """Block reducer over every (src, dst, type) run of one sorted block
    (rows pre-sorted by (run, ord) by grouped_apply, existing rows first
    since EXISTING_BASE < 0) — semantics identical to `_edge_union_row` per
    run: array append-unique in ord order, MAX strength, n_raw sum.  Each
    column converts to Python ONCE per block instead of one `.as_py()` per
    cell per group — at scale the incremental union covers the FULL existing
    graph, the same regime that motivated `edges.merge_edge_block`."""
    import numpy as np

    n = block.num_rows
    ends = np.r_[starts[1:], n]
    src_l = block.column("src").to_pylist()
    dst_l = block.column("dst").to_pylist()
    typ_l = block.column("type").to_pylist()
    st_l = block.column("src_type").to_pylist()
    dt_l = block.column("dst_type").to_pylist()
    nraw = block.column("n_raw").to_numpy(zero_copy_only=False)
    str_l = block.column("strength").to_numpy(zero_copy_only=False)
    arr_cols = {
        c: block.column(c).to_pylist()
        for c in ("relationTag", "description", "permissions", "sources")
    }
    cols: dict[str, list] = {k: [] for k in EDGES_SCHEMA.names}
    for s, e in zip(starts.tolist(), ends.tolist()):
        src, dst, rtype = src_l[s], dst_l[s], typ_l[s]
        merged: dict[str, list] = {c: [] for c in arr_cols}
        seen: dict[str, set] = {c: set() for c in arr_cols}
        stmax = 0.0
        for i in range(s, e):
            for c, vals in arr_cols.items():
                m_c, s_c = merged[c], seen[c]
                for v in vals[i] or []:
                    if v and v not in s_c:
                        s_c.add(v)
                        m_c.append(v)
            sv = str_l[i]
            if sv and float(sv) > stmax:
                stmax = float(sv)
        cols["relation_id"].append(relation_id(src, dst, rtype))
        cols["src"].append(src)
        cols["dst"].append(dst)
        cols["type"].append(rtype)
        cols["relationTag"].append(merged["relationTag"])
        cols["description"].append(merged["description"])
        cols["strength"].append(stmax)
        cols["permissions"].append(merged["permissions"])
        cols["sources"].append(merged["sources"])
        cols["src_type"].append(st_l[s])
        cols["dst_type"].append(dt_l[s])
        cols["n_raw"].append(int(nraw[s:e].sum()))
    return pa.Table.from_pydict(cols, schema=EDGES_SCHEMA)


def _edge_union_row(group: pa.Table) -> dict[str, Any]:
    """Merge EDGES_SCHEMA rows for one (src, dst, type): existing rows first
    (ord column), array append-unique, MAX strength
    (systematic_merge_provider.py:1062-1113)."""
    order = pc.sort_indices(group.column("ord"))
    g = group.take(order)
    src = g.column("src")[0].as_py()
    dst = g.column("dst")[0].as_py()
    rtype = g.column("type")[0].as_py()
    row: dict[str, Any] = {
        "relation_id": relation_id(src, dst, rtype),
        "src": src,
        "dst": dst,
        "type": rtype,
        "relationTag": [],
        "description": [],
        "strength": 0.0,
        "permissions": [],
        "sources": [],
        "src_type": g.column("src_type")[0].as_py(),
        "dst_type": g.column("dst_type")[0].as_py(),
        "n_raw": int(pc.sum(g.column("n_raw")).as_py() or 0),
    }
    seen: dict[str, set] = {c: set() for c in ("relationTag", "description", "permissions", "sources")}
    for i in range(g.num_rows):
        for col in ("relationTag", "description", "permissions", "sources"):
            s_col, l_col = seen[col], row[col]
            for v in g.column(col)[i].as_py() or []:
                if v and v not in s_col:
                    s_col.add(v)
                    l_col.append(v)
        row["strength"] = max(row["strength"], float(g.column("strength")[i].as_py() or 0))
    return row


def incremental_merge(
    existing_nodes: rd.Dataset,
    existing_edges: rd.Dataset,
    new_extracted: rd.Dataset,
    out_dir: str,
    *,
    num_partitions: int = 8,
    embed_dim: int = 1024,
    embed_backend: Any = None,
    linking=None,
) -> dict[str, Any]:
    """Merge new extraction results into an existing graph; writes the updated
    nodes/ + edges/ under out_dir and returns counts.

    If the existing nodes carry an ``embedding`` column, the merged nodes do
    too: unchanged nodes keep their stored vector, changed/new nodes are
    re-embedded (D4 regenerate-on-change,
    systematic_merge_provider.py:687-696).

    ``linking`` (stages.linking.LinkingConfig, default off): the fuzzy
    entity-linking candidate stage also runs over the UNION of pseudo-
    mentions and new mentions, so a typo'd new surface can link to an
    EXISTING node — the alias-dictionary half scores new names against the
    stored aliases, the ANN half against the stored names (the north-star
    "score candidate mentions against an alias dictionary + ANN index"
    applied incrementally)."""
    from ..stages.canonicalize import grouped_apply

    existing_sch = existing_nodes.schema()
    has_embeddings = existing_sch is not None and "embedding" in existing_sch.names
    existing_mat = existing_nodes.materialize() if has_embeddings else existing_nodes

    pseudo = nodes_as_mentions(
        existing_mat.drop_columns(["embedding"]) if has_embeddings else existing_mat
    )
    new_mentions = new_extracted.map_batches(explode_mentions, batch_format="pyarrow")
    new_triples = new_extracted.map_batches(explode_triples, batch_format="pyarrow")

    mentions = pseudo.union(new_mentions).materialize()
    nodes, with_comp = canonicalize(
        mentions, num_partitions=num_partitions, linking=linking
    )
    if has_embeddings:
        from ..stages.embedder import reembed_changed_nodes

        nodes = reembed_changed_nodes(
            nodes, existing_mat, dim=embed_dim, backend=embed_backend
        ).materialize()

    rename = _rename_map(nodes, with_comp)
    rewritten = _rewrite_existing_edges(existing_edges, rename).map_batches(
        lambda b: b.append_column("ord", pa.array([EXISTING_BASE] * b.num_rows, pa.int64())),
        batch_format="pyarrow",
    )

    new_edges = materialize_edges(
        new_triples, with_comp, nodes, num_partitions=num_partitions
    ).map_batches(
        lambda b: b.append_column("ord", pa.array([0] * b.num_rows, pa.int64())),
        batch_format="pyarrow",
    )

    all_edges = rewritten.union(new_edges)
    merged_edges = grouped_apply(
        all_edges, ["src", "dst", "type"], _edge_union_row, EDGES_SCHEMA,
        num_partitions=num_partitions,
        # 16-byte hash keys + block reducer + map/reduce hash exchange: same
        # shuffle/reducer shape as the main-path edge merge (the union spans
        # the FULL existing graph)
        hash_sort=True,
        exchange="hash",
        block_fn=_edge_union_block,
        order_col="ord",
    ).materialize()

    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    import shutil

    shutil.rmtree(nodes_dir, ignore_errors=True)
    shutil.rmtree(edges_dir, ignore_errors=True)
    nodes.write_parquet(nodes_dir)
    merged_edges.write_parquet(edges_dir)
    return {
        "nodes": nodes.count(),
        "edges": merged_edges.count(),
        "nodes_dir": nodes_dir,
        "edges_dir": edges_dir,
    }

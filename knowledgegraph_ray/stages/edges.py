"""Edge materialization: endpoint resolution join + relation grouping/dedup.

Reproduces the reference's relation processing
(/root/reference/src/workspace_kg/components/systematic_merge_provider.py:928-1191)
as Ray Data shuffles:

* J1 endpoint resolution — the reference looks each triple endpoint up in the
  per-document entity_mapping (surface name → canonical primary name) and
  drops triples with unmapped endpoints (:944-963).  Here that becomes a hash
  join of triples against the same-document mentions (url, surface) →
  canonical name; when one surface names two entities in a document, the later
  mention wins, matching the reference dict's overwrite order (:444-459).
* D6 relation grouping — groupby (canonical src, canonical dst, type) with a
  map_groups reducer: union descriptions / relationTags / permissions /
  sources in first-seen (ord) order, MAX strength (:991-1025), and
  relation_id = sha256("src::type::dst") (:1193-1196).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Max

from ..functions.ids import relation_id
from ..functions.joins import adaptive_join

EDGES_SCHEMA = pa.schema(
    [
        ("relation_id", pa.string()),
        ("src", pa.string()),
        ("dst", pa.string()),
        ("type", pa.string()),
        ("relationTag", pa.list_(pa.string())),
        ("description", pa.list_(pa.string())),
        ("strength", pa.float32()),
        ("permissions", pa.list_(pa.string())),
        ("sources", pa.list_(pa.string())),
        ("src_type", pa.string()),
        ("dst_type", pa.string()),
        ("n_raw", pa.int64()),
    ]
)


from ..functions.hashing import hash2_key_columns as _hash2_cols


def _loser_mids_task_fn(refs: list):
    """Cross-block duplicate resolution over (h1, h2, mid) projections: rows
    sharing a 128-bit (url, surface) hash keep only the max mid (the
    reference dict's last-write-wins).  Returns the int64 mids to DROP —
    empty in the common case (explode_mentions emits one row per
    (url, surface)), so callers skip the filter pass entirely."""
    import numpy as np

    import ray as _ray

    from ..functions.joins import PREHASH_COL

    tables = [
        t.select([PREHASH_COL, "h2", "mid"])
        for t in _ray.get(list(refs))
        if t.num_rows
    ]
    if not tables:
        return np.array([], dtype=np.int64)
    t = pa.concat_tables(tables).combine_chunks()
    h1 = t.column(PREHASH_COL).to_numpy(zero_copy_only=False)
    h2 = t.column("h2").to_numpy(zero_copy_only=False)
    mid = t.column("mid").to_numpy(zero_copy_only=False)
    # Duplicates are RARE (one row per key per block; cross-block repeats
    # only).  A full 3-key lexsort is 3 indirect argsorts with random-access
    # gathers — measured 20-28 s at 3.7M rows on this host's slow memory.
    # Instead: one cache-friendly VALUE sort of h1 finds the duplicated
    # hashes, a vectorized searchsorted marks candidate rows, and only those
    # few rows pay the exact (h1, h2, mid) lexsort.
    h1_sorted = np.sort(h1)
    rep = h1_sorted[1:] == h1_sorted[:-1]
    if not rep.any():
        return np.array([], dtype=np.int64)
    dupvals = np.unique(h1_sorted[:-1][rep])
    pos = np.searchsorted(dupvals, h1)
    pos[pos == len(dupvals)] = 0
    cand = dupvals[pos] == h1
    h1c, h2c, midc = h1[cand], h2[cand], mid[cand]
    # lexsort by (h1, h2, mid): within each 128-bit key run, the LAST row has
    # the max mid and wins; all earlier rows are losers
    order = np.lexsort((midc, h2c, h1c))
    h1s, h2s, mids = h1c[order], h2c[order], midc[order]
    run_end = np.r_[(h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1]), True]
    return mids[~run_end]


# Above this many projection rows the cross-block dedup runs as a distributed
# groupby instead of one in-process scan (20 B/row: 50M rows ≈ 1 GB).
LOSER_SCAN_INLINE_ROWS = 50_000_000


def _loser_mids_distributed(proj: rd.Dataset):
    """Scale path for the cross-block duplicate scan: ONE groupby over the
    20-byte/row (h1, h2, mid) projection finds keys with >1 row (rare by
    construction), then a broadcast filter pass collects the non-max mids.
    Linear shuffle of the projection only — never the alias payload."""
    import numpy as np

    import ray

    from ..functions.joins import PREHASH_COL, _dataset_to_table

    from ray.data.aggregate import Count, Max

    def _view_i64(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.view(pa.int64())

    def as_i64(b: pa.Table) -> pa.Table:
        # bit-reinterpret the uint64 hashes: Ray's aggregate converts uint64
        # above int64-max to pickled Python objects; equality (all the
        # grouping needs) survives the view
        return pa.Table.from_pydict(
            {
                PREHASH_COL: _view_i64(b.column(PREHASH_COL)),
                "h2": _view_i64(b.column("h2")),
                "mid": b.column("mid"),
            }
        )

    proj = proj.map_batches(as_i64, batch_format="pyarrow")
    from .aggregates import partial_grouped_agg

    # adaptive combine: max/count are order-independent, so the zero-CPU
    # task path is exact; high-cardinality key sets fall back to the groupby
    agg = partial_grouped_agg(
        proj, [PREHASH_COL, "h2"], maxs={"mid": "max_mid"}, count_alias="n"
    )
    dup_tbl = _dataset_to_table(agg.filter(expr="n > 1").materialize())
    if dup_tbl.num_rows == 0:
        return np.array([], dtype=np.int64)
    d1 = dup_tbl.column(PREHASH_COL).to_numpy(zero_copy_only=False)
    d2 = dup_tbl.column("h2").to_numpy(zero_copy_only=False)
    dmax = dup_tbl.column("max_mid").to_numpy(zero_copy_only=False)
    ord_ = np.lexsort((d2, d1))
    dup_ref = ray.put((d1[ord_], d2[ord_], dmax[ord_]))

    def losers(b: pa.Table) -> pa.Table:
        d1s, d2s, dmaxs = ray.get(dup_ref)
        h1 = b.column(PREHASH_COL).to_numpy(zero_copy_only=False)
        h2 = b.column("h2").to_numpy(zero_copy_only=False)
        mid = b.column("mid").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(d1s, h1, side="left")
        hi = np.searchsorted(d1s, h1, side="right")
        # single-slot runs resolve vectorized; multi-slot d1 runs (a 64-bit
        # h1 collision between distinct keys inside the *duplicate* subset)
        # fall to an exact per-row scan of just those rows
        one = hi - lo == 1
        p = np.where(one, lo, 0)
        hit = one & (d1s[p] == h1) & (d2s[p] == h2) & (dmaxs[p] != mid)
        for i in np.flatnonzero(hi - lo > 1):
            for j in range(lo[i], hi[i]):
                if d2s[j] == h2[i]:
                    hit[i] = dmaxs[j] != mid[i]
                    break
        return pa.Table.from_pydict({"mid": pa.array(mid[hit], pa.int64())})

    out = pa.concat_tables(
        ray.get(
            [
                ray.remote(num_cpus=0)(losers).remote(ref)
                for ref in proj.to_arrow_refs()
            ]
        )
    )
    return out.column("mid").to_numpy(zero_copy_only=False)


def build_alias_map(mentions_with_comp: rd.Dataset, nodes: rd.Dataset,
                    num_partitions: int = 16) -> rd.Dataset:
    """(url, surface) → (canonical name, entity type) lookup.

    One row per (url, surface): the document-scoped mapping the reference
    builds per batch (entity_mapping, systematic_merge_provider.py:395-547).
    Later mentions overwrite earlier ones for the same surface in a document
    (python dict assignment order) — we keep the max-mid row.

    NO global sort: a (url, surface) pair nearly always occurs exactly once
    (explode_mentions emits one mention row per entity per document), so the
    range sort this stage used to run moved every row to establish an order
    nothing needed.  Instead: per-block last-wins (vectorized in-block
    sort + run scan), then ONE zero-CPU task over a 20-byte/row (h1, h2, mid)
    projection finds cross-block duplicates by 128-bit key hash; only when
    duplicates exist (rare) does a broadcast anti-filter drop the losers.
    Correct under any block layout — no colocation assumption."""
    import time as _time

    import numpy as np

    import ray

    t0 = _time.monotonic()
    # assemble the comp→(name, type) lookup in ONE zero-CPU task from block
    # refs — the node table's bytes never pass through the driver (the
    # _build_lookup_index idiom; the old _dataset_to_table + ray.put held
    # ~1.6 GB driver RSS at the 10M-node incremental drive)
    canon_refs = [
        r for r in
        nodes.select_columns(["comp", "name", "type"]).materialize().to_arrow_refs()
    ]

    @ray.remote(num_cpus=0)
    def _assemble_canon(*tabs):
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            t = pa.schema([("comp", pa.int64()), ("name", pa.string()),
                           ("type", pa.string())]).empty_table()
        else:
            cols = tabs[0].column_names
            t = pa.concat_tables(
                [t if t.column_names == cols else t.select(cols) for t in tabs]
            ).combine_chunks()
        return (
            t.column("comp").to_numpy(zero_copy_only=False),
            t.column("name"),
            t.column("type"),
        )

    canon_ref = _assemble_canon.remote(*canon_refs)
    LAST_TIMINGS["alias.nodes"] = round(_time.monotonic() - t0, 3)

    def last_per_block(block: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_key_columns
        from ..functions.joins import PREHASH_COL

        n = block.num_rows
        out_schema = pa.schema(
            [
                ("url", pa.string()),
                ("surface", pa.string()),
                ("canonical", pa.string()),
                ("entity_type", pa.string()),
                (PREHASH_COL, pa.uint64()),
                ("h2", pa.uint64()),
                ("mid", pa.int64()),
            ]
        )
        if n == 0:
            return out_schema.empty_table()
        if isinstance(block, pa.Table):
            block = block.combine_chunks()
        # last-wins per 128-bit (url, surface) hash via int lexsort — no
        # 3-string-key Arrow sort, no per-row string objects.  Hash identity
        # is exactly what the cross-block loser scan already uses, so in-block
        # and cross-block dedup share one collision model (two independent
        # polynomial families must both collide).
        keyed = pa.Table.from_pydict(
            {"url": block.column("url"), "surface": block.column("entity_name")}
        )
        h1 = hash_key_columns(keyed, ["url", "surface"])
        h2 = _hash2_cols(keyed, ["url", "surface"])
        mids_np = block.column("mid").to_numpy(zero_copy_only=False)
        order = np.lexsort((mids_np, h2, h1))
        h1s, h2s = h1[order], h2[order]
        last = np.ones(n, dtype=bool)
        last[:-1] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        take_idx = order[last]
        picked = block.take(pa.array(take_idx, pa.int64()))
        comp_ids, canon_names, canon_types = ray.get(canon_ref)
        idx = pc.index_in(
            picked.column("comp"), value_set=pa.array(comp_ids, pa.int64())
        )
        out = pa.Table.from_pydict(
            {
                "url": picked.column("url"),
                "surface": picked.column("entity_name"),
                "canonical": canon_names.take(idx),
                "entity_type": canon_types.take(idx),
            }
        )
        # the lookup-join key hashes (PREHASH_COL protocol) are the same
        # values just computed — reuse, no second hashing pass
        out = out.append_column(PREHASH_COL, pa.array(h1[take_idx], pa.uint64()))
        out = out.append_column("h2", pa.array(h2[take_idx], pa.uint64()))
        out = out.append_column("mid", picked.column("mid"))
        return out.cast(out_schema)

    t0 = _time.monotonic()
    partial = mentions_with_comp.select_columns(
        ["url", "entity_name", "mid", "comp"]
    ).map_batches(last_per_block, batch_format="pyarrow").materialize()
    LAST_TIMINGS["alias.partial"] = round(_time.monotonic() - t0, 3)

    t0 = _time.monotonic()
    # Cross-block duplicate scan over a 20-byte/row (h1, h2, mid) projection,
    # materialized as its own small dataset (parallel column slice).  The
    # scan itself runs IN-PROCESS on the driver: its input is bounded
    # (24 B × alias rows), the driver's imports and allocator are warm, and a
    # zero-CPU worker task was measured spending 10-16 s on worker cold-start
    # and module imports to do ~0.5 s of numpy.  Beyond the inline row bound
    # the scan becomes one distributed groupby over the projection.
    from ..functions.joins import PREHASH_COL

    proj = partial.select_columns([PREHASH_COL, "h2", "mid"]).materialize()
    LAST_TIMINGS["alias.proj"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()
    if proj.count() <= LOSER_SCAN_INLINE_ROWS:
        loser_mids = _loser_mids_task_fn(proj.to_arrow_refs())
    else:
        loser_mids = _loser_mids_distributed(proj)
    LAST_TIMINGS["alias.scan"] = round(_time.monotonic() - t0, 3)
    if len(loser_mids):
        loser_set = pa.array(loser_mids, pa.int64())
        partial = partial.map_batches(
            lambda t, _l=loser_set: t.filter(
                pc.invert(pc.is_in(t.column("mid"), value_set=_l))
            ),
            batch_format="pyarrow",
        ).materialize()
    # NOTE: the helper columns (h2, mid) ride along — the lookup-join probes
    # exclude them (exclude_cols) and the shuffle fallback drops them, so the
    # alias map is materialized exactly once on the common path.
    return partial


def resolve_triples(
    triples: rd.Dataset,
    alias_map: "rd.Dataset | pa.Table | list",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Rewrite triple endpoints to canonical names via same-document lookup;
    inner joins drop triples with unmapped endpoints (J1 semantics).

    When ``alias_map`` is a list of Arrow block refs (the broadcast path),
    the blocks never pass through the driver — each worker assembles one
    cached lookup table and probes it for both endpoints."""
    from ..functions.joins import lookup_join

    if isinstance(alias_map, (pa.Table, list)):
        # both probes hit the SAME (url, surface) index — right_keys stay
        # raw and rename applies to output payload names only, so the driver
        # index-ref cache reuses one build for src and dst
        t = lookup_join(
            triples, alias_map,
            left_keys=["url", "source_entity"], right_keys=["url", "surface"],
            how="inner",
            rename={"canonical": "canonical_src", "entity_type": "src_type"},
            exclude_cols=["h2", "mid"],
        )
        t = lookup_join(
            t, alias_map,
            left_keys=["url", "target_entity"], right_keys=["url", "surface"],
            how="inner",
            rename={"canonical": "canonical_dst", "entity_type": "dst_type"},
            exclude_cols=["h2", "mid"],
        )
        return t
    from ..functions.joins import PREHASH_COL

    sch = alias_map.schema()
    drop = [c for c in (PREHASH_COL, "h2", "mid")
            if sch is not None and c in sch.names]
    if drop:
        alias_map = alias_map.drop_columns(drop)
    src_map = alias_map.rename_columns(
        {"surface": "source_entity", "canonical": "canonical_src",
         "entity_type": "src_type"}
    )
    dst_map = alias_map.rename_columns(
        {"surface": "target_entity", "canonical": "canonical_dst",
         "entity_type": "dst_type"}
    )
    t = adaptive_join(
        triples,
        src_map,
        left_keys=["url", "source_entity"],
        how="inner",
        num_partitions=num_partitions,
    )
    t = adaptive_join(
        t,
        dst_map,
        left_keys=["url", "target_entity"],
        how="inner",
        num_partitions=num_partitions,
    )
    return t


def merge_edge_row(group: pa.Table) -> dict[str, Any]:
    """One (src, dst, type) group → one edge row (D6 reducer)."""
    order = pc.sort_indices(group.column("ord"))
    g = group.take(order)

    src = g.column("canonical_src")[0].as_py()
    dst = g.column("canonical_dst")[0].as_py()
    rtype = g.column("relationship_type")[0].as_py()

    # append-unique via shadow sets (hub edges reach 10^4+ raw rows; list
    # membership scans would be O(n²)); JSON payloads parsed once per
    # distinct string
    descriptions: list[str] = []
    tags: list[str] = []
    perms: list[str] = []
    sources: list[str] = []
    d_seen: set[str] = set()
    t_seen: set[str] = set()
    p_seen: set[str] = set()
    s_seen: set[str] = set()
    strength = 0.0
    json_cache: dict[str, list[str]] = {}

    def parsed(raw: str) -> list[str]:
        hit = json_cache.get(raw)
        if hit is None:
            hit = json_cache[raw] = json.loads(raw) if raw else []
        return hit

    urls = g.column("url").to_pylist() if "url" in g.column_names else None
    for i, (desc, tag, pj, sj, s) in enumerate(zip(
        g.column("description").to_pylist(),
        g.column("relationship_type").to_pylist(),
        g.column("permissions_json").to_pylist(),
        g.column("sources_json").to_pylist(),
        g.column("strength").to_pylist(),
    )):
        if desc and desc not in d_seen:
            d_seen.add(desc)
            descriptions.append(desc)
        if tag and tag not in t_seen:
            t_seen.add(tag)
            tags.append(tag)
        for p in parsed(pj):
            if p and p not in p_seen:
                p_seen.add(p)
                perms.append(p)
        # "" encodes exactly [url] (extract.explode_triples)
        svals = parsed(sj) if sj else ([urls[i]] if urls else [])
        for sid in svals:
            if sid and sid not in s_seen:
                s_seen.add(sid)
                sources.append(sid)
        strength = max(strength, float(s or 0.0))

    row: dict[str, Any] = {
        "relation_id": relation_id(src, dst, rtype),
        "src": src,
        "dst": dst,
        "type": rtype,
        "relationTag": tags,
        "description": descriptions,
        "strength": strength,
        "permissions": perms,
        "sources": sources,
        "src_type": g.column("src_type")[0].as_py(),
        "dst_type": g.column("dst_type")[0].as_py(),
        "n_raw": g.num_rows,
    }
    return row


def merge_edge_group(group: pa.Table) -> pa.Table:
    """map_groups-style reducer (kept for operator-level tests)."""
    return pa.Table.from_pylist([merge_edge_row(group)], schema=EDGES_SCHEMA)


def _first_seen_lists(run_of_el, pos_key, item_codes, valid, n_runs, dict_vals):
    """First-seen-order unique items per run → Arrow ListArray.

    One lexsort over (run, code, pos) exposes each (run, item)'s first
    occurrence; a second lexsort restores first-seen order within the run.
    All C — the reducer's append-unique loops without any per-row Python."""
    import numpy as np

    idx = np.flatnonzero(valid)
    if idx.size == 0:
        offs = np.zeros(n_runs + 1, np.int32)
        return pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), dict_vals.take(pa.array([], pa.int64()))
        )
    r = run_of_el[idx]
    c = item_codes[idx]
    p = pos_key[idx]
    o = np.lexsort((p, c, r))
    rs, cs_ = r[o], c[o]
    first = np.r_[True, (rs[1:] != rs[:-1]) | (cs_[1:] != cs_[:-1])]
    kept = idx[o[first]]
    kept = kept[np.lexsort((pos_key[kept], run_of_el[kept]))]
    counts = np.bincount(run_of_el[kept], minlength=n_runs)
    offs = np.zeros(n_runs + 1, np.int32)
    np.cumsum(counts, out=offs[1:])
    values = dict_vals.take(pa.array(item_codes[kept], pa.int64()))
    return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), values)


def merge_edge_block(block: pa.Table, starts) -> pa.Table:
    """Block reducer: every (src, dst, type) run of one sorted block at once
    (rows pre-sorted by (run, ord) by grouped_apply) — semantics identical to
    merge_edge_row per run, with NO per-row or per-group Python: every
    append-unique list is a segmented lexsort + run scan (_first_seen_lists),
    JSON payloads parse once per distinct string and expand through interned
    item pools + grouped aranges, strength is one maximum.reduceat, and the
    output assembles from Arrow arrays (the only remaining Python is the
    sha256 relation_id per OUTPUT row).  The round-2 per-run dict/set churn
    was the named reducer scaling cost (VERDICT round 2 #2)."""
    import numpy as np

    n = block.num_rows
    starts = np.asarray(starts, np.int64)
    n_runs = len(starts)
    ends = np.r_[starts[1:], n]
    lens = ends - starts
    run_id = np.repeat(np.arange(n_runs, dtype=np.int64), lens)
    block = block.combine_chunks()
    pos = np.arange(n, dtype=np.int64)

    def dcol(name):
        col = block.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = col if pa.types.is_dictionary(col.type) else col.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        return d.dictionary, d.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    first_take = pa.array(starts, pa.int64())
    src_arr = block.column("canonical_src").take(first_take)
    dst_arr = block.column("canonical_dst").take(first_take)
    type_arr = block.column("relationship_type").take(first_take)
    st_arr = block.column("src_type").take(first_take)
    dt_arr = block.column("dst_type").take(first_take)
    rid = pa.array(
        [relation_id(s, d, t) for s, d, t in
         zip(src_arr.to_pylist(), dst_arr.to_pylist(), type_arr.to_pylist())],
        pa.string(),
    )

    # descriptions / tags: first-seen unique of non-empty values per run
    desc_d, desc_i = dcol("description")
    dv = np.array([bool(v) for v in desc_d.to_pylist()], bool)
    desc_list = _first_seen_lists(run_id, pos, desc_i, dv[desc_i], n_runs, desc_d)
    rt_d, rt_i = dcol("relationship_type")
    tv = np.array([bool(v) for v in rt_d.to_pylist()], bool)
    tag_list = _first_seen_lists(run_id, pos, rt_i, tv[rt_i], n_runs, rt_d)

    def nested_lists(json_col: str, url_fallback: bool):
        """JSON list column → first-seen-unique-per-run ListArray.  Items
        intern into one pool; rows expand via grouped arange over the pool
        offsets of their DISTINCT json value (parse count = distinct count).
        ``url_fallback``: "" encodes exactly [url] (extract.explode_triples)."""
        jd, ji = dcol(json_col)
        has_url = url_fallback and "url" in block.column_names
        pool: dict[str, int] = {}

        def intern(x: str) -> int:
            c = pool.get(x)
            if c is None:
                c = pool[x] = len(pool)
            return c

        items_per_code = []
        empty_code = np.zeros(len(jd), bool)
        for k, s in enumerate(jd.to_pylist()):
            if not s:
                empty_code[k] = True
                items_per_code.append(np.empty(0, np.int64))
                continue
            vals = json.loads(s)
            items_per_code.append(
                np.array([intern(x) for x in vals if x], np.int64)
            )
        if has_url:
            url_d, url_i = dcol("url")
            url_pool = np.array([intern(u) for u in url_d.to_pylist()], np.int64)
        code_counts = np.array([len(a) for a in items_per_code], np.int64)
        flat_items = (
            np.concatenate(items_per_code)
            if items_per_code and code_counts.sum() else np.empty(0, np.int64)
        )
        code_offs = np.zeros(len(jd) + 1, np.int64)
        np.cumsum(code_counts, out=code_offs[1:])
        row_counts = code_counts[ji]
        if has_url:
            row_is_empty = empty_code[ji]
            row_counts = np.where(row_is_empty, 1, row_counts)
        K = int(row_counts.max()) + 1 if n else 1
        ra = np.flatnonzero(~row_is_empty) if has_url else np.arange(n)
        ca = code_counts[ji[ra]]
        csa = np.zeros(len(ra) + 1, np.int64)
        np.cumsum(ca, out=csa[1:])
        within = np.arange(csa[-1], dtype=np.int64) - np.repeat(csa[:-1], ca)
        gidx = within + np.repeat(code_offs[ji[ra]], ca)
        el_codes = flat_items[gidx]
        el_runs = np.repeat(run_id[ra], ca)
        el_pos = np.repeat(ra * K, ca) + within
        if has_url and row_is_empty.any():
            rb = np.flatnonzero(row_is_empty)
            el_codes = np.concatenate([el_codes, url_pool[url_i[rb]]])
            el_runs = np.concatenate([el_runs, run_id[rb]])
            el_pos = np.concatenate([el_pos, rb * K])
        pool_arr = pa.array(list(pool), pa.string())
        return _first_seen_lists(
            el_runs, el_pos, el_codes, np.ones(len(el_codes), bool),
            n_runs, pool_arr,
        )

    perms_list = nested_lists("permissions_json", url_fallback=False)
    sources_list = nested_lists("sources_json", url_fallback=True)

    sv = block.column("strength").to_numpy(zero_copy_only=False).astype(np.float64)
    sv = np.nan_to_num(sv, nan=0.0)
    smax = np.maximum.reduceat(sv, starts) if n else np.empty(0)
    np.maximum(smax, 0.0, out=smax)  # row semantics: max starts at 0.0

    t = pa.table({
        "relation_id": rid,
        "src": src_arr, "dst": dst_arr, "type": type_arr,
        "relationTag": tag_list, "description": desc_list,
        "strength": pa.array(smax, pa.float64()),
        "permissions": perms_list, "sources": sources_list,
        "src_type": st_arr, "dst_type": dt_arr,
        "n_raw": pa.array(lens, pa.int64()),
    })
    return t.cast(EDGES_SCHEMA)


# Columns the edge-merge reducer actually reads (plus the order column);
# everything else is pruned before the merge shuffle.
EDGE_MERGE_COLUMNS = [
    "canonical_src", "canonical_dst", "relationship_type", "ord",
    "src_type", "dst_type", "description", "permissions_json",
    "sources_json", "url", "strength",
]

# Sub-stage wall times of the last materialize_edges() call (driver-side,
# for bench attribution; keys: alias, resolve, merge).
LAST_TIMINGS: dict[str, float] = {}


def materialize_edges(
    triples: rd.Dataset,
    mentions_with_comp: rd.Dataset,
    nodes: rd.Dataset,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Full edge path: alias map → endpoint resolution → grouped merge.

    alias_map is materialized: it is probed twice (src and dst joins), and a
    sequential execution of the two hash joins avoids aggregator-actor-pool
    contention on small CPU counts.  Its size is O(distinct (url, surface)
    pairs), far below the corpus.  resolved is materialized for timing
    attribution — the grouped merge's range sort is an all-to-all barrier
    that materializes its input anyway, so this adds no extra pass."""
    import time as _time

    from ..functions.joins import DEFAULT_BROADCAST_ROWS
    from .canonicalize import grouped_apply

    LAST_TIMINGS.clear()
    t0 = _time.monotonic()
    alias_ds = build_alias_map(mentions_with_comp, nodes, num_partitions).materialize()
    if alias_ds.count() <= DEFAULT_BROADCAST_ROWS:
        # broadcast by object refs: blocks stay in the object store, each
        # worker assembles one cached lookup table for both endpoint probes
        alias_map: "rd.Dataset | list" = alias_ds.to_arrow_refs()
    else:
        alias_map = alias_ds
    LAST_TIMINGS["alias"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()
    resolved = resolve_triples(triples, alias_map, num_partitions).materialize()
    LAST_TIMINGS["resolve"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()
    merged = grouped_apply(
        # prune to the columns the reducer reads: the pre-resolution surface
        # strings (source_entity/target_entity) never enter the merge shuffle
        # (the widest in the graph stage).  NOTE: url IS load-bearing here —
        # sources_json == "" encodes exactly [url], so EDGE_MERGE_COLUMNS
        # keeps it; do not prune it.
        resolved.select_columns(EDGE_MERGE_COLUMNS),
        ["canonical_src", "canonical_dst", "relationship_type"],
        merge_edge_row,
        EDGES_SCHEMA,
        num_partitions=num_partitions,
        # 16-byte int sort keys instead of three variable-length strings:
        # the edge-merge exchange is the widest shuffle in the graph stage
        hash_sort=True,
        # explicit map/reduce hash exchange, not a range sort: the reducer
        # needs colocation + in-partition runs, not global order.  Ray's
        # sort was the worst-scaling stage in the round-3 campaign (20 s @ 8
        # cpus -> 25 s @ 32, memory-bus-bound merge-concats); two task waves
        # scale with the partition count instead.
        exchange="hash",
        block_fn=merge_edge_block,
        order_col="ord",
    ).materialize()
    LAST_TIMINGS["merge"] = round(_time.monotonic() - t0, 3)
    return merged

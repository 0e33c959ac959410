"""Entity canonicalization: candidate keys → connected components → group merge.

Replaces the reference's O(N²) in-batch pairwise matcher + transitive closure
(/root/reference/src/workspace_kg/components/systematic_merge_provider.py:152-298)
with a **key-based distributed equivalent**:

1. every mention emits candidate keys derived from the type's systematic
   matching rules (entity_config.yaml:493-615) — an exact rule emits one key
   per normalized scalar value, a search rule emits one key per normalized
   value of both the scalar probe field and the array field, so value-in-array
   and array-overlap matches share a key;
2. connected components over the bipartite mention↔key graph via iterative
   min-label propagation (alternating groupby-aggregate shuffles with
   per-batch partial pre-aggregation — the explicit two-phase/salting answer
   to head-entity skew);
3. one merge per component via groupby(comp).map_groups with rows sorted by
   the global mention ordinal, pinning the reference's "first item wins"
   semantics (:713-726) to a deterministic order.

Semantics note: the reference matches email scalars against ``emails`` arrays
only through the database probe (:344-353), so cross-document email identity
emerges via the DB accumulator; emitting scalar+array values under one key
namespace reproduces that *global fixpoint* directly. Scalar name vs alias
values stay in separate namespaces, exactly as in the reference (name-exact
never matches an alias).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..config import (
    ARRAY_NODE_COLUMNS,
    SCALAR_NODE_COLUMNS,
    STRING_MERGE_FIELDS,
    array_fields_for,
    get_spec,
    llm_to_db_field,
    match_rules_for,
)
from ..functions.joins import adaptive_join
from ..functions.normalize import norm_string

SEP = "\x1e"

# Candidate pairs carry a 128-bit key hash (two independent 64-bit rolling
# polynomials) instead of the raw key string: the CC sort then shuffles 16 B
# per row instead of ~60 B, and the per-block contraction works on ints.
# A pair collides only if BOTH polynomials collide (~1e-19 at 10^10 keys).
PAIR_SCHEMA = pa.schema([("kh", pa.int64()), ("kl", pa.int64()), ("mid", pa.int64())])


def _pair_key_cols(names) -> list[str]:
    return ["kh", "kl"] if "kh" in names else ["key"]


def _with_registry(fn):
    """Wrap a worker-side function with a driver-time ENTITY_TYPES snapshot.

    Runtime-registered entity types (config.yaml_config.register_entity_config)
    live in the driver's registry only; worker processes import the frozen
    module table.  The snapshot travels in the closure and is installed into
    the worker's live registry before the first call — config is captured at
    pipeline construction, the Ray-idiomatic place."""
    from ..config.entity_schema import ENTITY_TYPES as _driver_registry

    snapshot = dict(_driver_registry)

    def wrapped(*args, **kwargs):
        from ..config.entity_schema import ENTITY_TYPES as live

        if live is not snapshot and set(snapshot) - set(live):
            live.update(snapshot)
        return fn(*args, **kwargs)

    return wrapped


def mention_key_strings(batch: pa.Table) -> tuple[list[str], list[int]]:
    """Raw candidate key strings per mention (namespace semantics; the
    shuffled pair table carries only their 128-bit hashes)."""
    keys: list[str] = []
    mids: list[int] = []
    for mid, etype, aj in zip(
        batch.column("mid").to_pylist(),
        batch.column("entity_type").to_pylist(),
        batch.column("attributes_json").to_pylist(),
    ):
        attrs = json.loads(aj) if aj else {}
        for rule in match_rules_for(etype):
            if rule.rule == "exact":
                v = attrs.get(rule.match)
                if isinstance(v, list):
                    v = v[0] if v else None
                nv = norm_string(str(v)) if v else ""
                if nv:
                    keys.append(f"{etype}{SEP}{rule.match}{SEP}{nv}")
                    mids.append(mid)
            else:  # search: scalar probe field + array field share one namespace
                vals: list[Any] = []
                sv = attrs.get(rule.match)
                if isinstance(sv, list):
                    vals.extend(sv)
                elif sv:
                    vals.append(sv)
                lv = attrs.get(rule.db)
                if isinstance(lv, list):
                    vals.extend(lv)
                elif lv:
                    vals.append(lv)
                for v in vals:
                    nv = norm_string(str(v))
                    if nv:
                        keys.append(f"{etype}{SEP}{rule.db}{SEP}{nv}")
                        mids.append(mid)
    return keys, mids


def mention_keys(batch: pa.Table) -> pa.Table:
    """mentions → (kh, kl, mid) candidate pairs, one per matching-rule value
    (keys hashed to a 128-bit pair — see PAIR_SCHEMA)."""
    import numpy as np

    from ..functions.hashing import hash_string_array

    keys, mids = mention_key_strings(batch)
    karr = pa.array(keys, pa.string())
    return pa.Table.from_pydict(
        {
            "kh": pa.array(hash_string_array(karr, 0).astype(np.int64), pa.int64()),
            "kl": pa.array(hash_string_array(karr, 1).astype(np.int64), pa.int64()),
            "mid": pa.array(mids, pa.int64()),
        },
        schema=PAIR_SCHEMA,
    )


def _rule_fields_snapshot():
    """(scalar_fields, list_fields) the registered match rules read, or None
    when a field name is used both ways (fast decode not applicable)."""
    from ..config.entity_schema import ENTITY_TYPES

    scalars: set[str] = set()
    lists_: set[str] = set()
    for et in ENTITY_TYPES:
        for r in match_rules_for(et):
            scalars.add(r.match)
            if r.rule != "exact" and r.db:
                lists_.add(r.db)
    if scalars & lists_:
        return None
    return sorted(scalars), sorted(lists_)


def _key_pass_plan():
    """Batched emission plan: one entry per distinct (field, namespace, kind)
    triple across ALL entity types, with the set of types whose rules read it.
    The dominant rule ('name' exact on every type) becomes ONE whole-batch
    kernel pass instead of a pass per type — and no per-type copy of the
    decoded struct column is ever made."""
    from ..config.entity_schema import ENTITY_TYPES

    plan: dict[tuple[str, str, bool], list[str]] = {}
    for et in sorted(ENTITY_TYPES):
        for r in match_rules_for(et):
            if r.rule == "exact":
                plan.setdefault((r.match, r.match, False), []).append(et)
            else:
                plan.setdefault((r.match, r.db, False), []).append(et)
                plan.setdefault((r.db, r.db, True), []).append(et)
    return [(f, ns, is_list, types) for (f, ns, is_list), types in plan.items()]


def mention_keys_fast(batch: pa.Table) -> pa.Table:
    """Vectorized mention_keys: ONE polars JSON decode (C, fixed struct
    dtype over exactly the fields the match rules read) + Arrow kernels for
    normalization, key concatenation and list explosion — no per-mention
    Python.  Produces the same (kh, kl, mid) pair SET as mention_keys (row
    order differs; CC is order-insensitive).

    Falls back to the Python row path whenever the JSON shape defeats the
    fixed dtype (list-valued scalar field, non-string values, malformed
    JSON) — the reference's semantics for those shapes live there.  The
    fallback is per batch, so one odd document only slows its own batch."""
    import numpy as np

    from ..functions.hashing import hash_string_array

    fields = _rule_fields_snapshot()
    if fields is None or batch.num_rows == 0:
        return mention_keys(batch)
    try:
        import polars as pl
    except ImportError:
        return mention_keys(batch)
    scalar_f, list_f = fields
    aj = batch.column("attributes_json")
    if isinstance(aj, pa.ChunkedArray):
        aj = aj.combine_chunks()
    aj = pc.fill_null(aj, "{}")
    aj = pc.if_else(pc.equal(aj, ""), pa.scalar("{}"), aj)
    dtype = pl.Struct(
        {**{f: pl.Utf8 for f in scalar_f}, **{f: pl.List(pl.Utf8) for f in list_f}}
    )
    try:
        dec = pl.Series("a", aj).str.json_decode(dtype).to_arrow()
    except Exception:
        return mention_keys(batch)
    if isinstance(dec, pa.ChunkedArray):
        dec = dec.combine_chunks()
    et_col = batch.column("entity_type")
    if isinstance(et_col, pa.ChunkedArray):
        et_col = et_col.combine_chunks()
    mids = batch.column("mid")
    if isinstance(mids, pa.ChunkedArray):
        mids = mids.combine_chunks()

    key_parts: list[pa.Array] = []
    mid_parts: list[pa.Array] = []
    batch_types = set(pc.unique(et_col).to_pylist())

    for field, ns, is_list, types in _key_pass_plan():
        if is_list:
            lst = dec.field(field)
            parent = pc.list_parent_indices(lst)
            vals = pc.cast(pc.list_flatten(lst), pa.string())
            ets = et_col.take(parent)
            vmids = mids.take(parent)
        else:
            vals = pc.cast(dec.field(field), pa.string())
            ets = et_col
            vmids = mids
        nv = pc.utf8_trim_whitespace(pc.utf8_lower(vals))
        ok = pc.and_kleene(pc.is_valid(nv), pc.not_equal(nv, ""))
        if not batch_types <= set(types):
            ok = pc.and_kleene(
                ok, pc.is_in(ets, value_set=pa.array(types, pa.string()))
            )
        ok = pc.fill_null(ok, False)
        ets_f = ets.filter(ok)
        keys = pc.binary_join_element_wise(
            ets_f, pa.scalar(ns), nv.filter(ok), SEP
        )
        if len(keys):
            key_parts.append(pc.cast(keys, pa.string()))
            mid_parts.append(vmids.filter(ok))

    if not key_parts:
        return PAIR_SCHEMA.empty_table()

    def _one(arrs):
        arrs = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                for a in arrs]
        flat = []
        for a in arrs:
            flat.extend(a.chunks) if isinstance(a, pa.ChunkedArray) else flat.append(a)
        return pa.concat_arrays(flat)

    karr = _one(key_parts)
    marr = _one(mid_parts)
    return pa.Table.from_pydict(
        {
            "kh": pa.array(hash_string_array(karr, 0).astype(np.int64), pa.int64()),
            "kl": pa.array(hash_string_array(karr, 1).astype(np.int64), pa.int64()),
            "mid": pc.cast(marr, pa.int64()),
        },
        schema=PAIR_SCHEMA,
    )


def _batch_min_by(group_col: str, value_col: str, out_col: str):
    """Per-batch partial min — runs before the groupby shuffle so hub keys
    contribute at most one row per block to the exchange (skew mitigation)."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {group_col: pa.array([], batch.column(group_col).type),
                 out_col: pa.array([], pa.int64())}
            )
        t = batch.select([group_col, value_col]).group_by(group_col).aggregate(
            [(value_col, "min")]
        )
        return t.rename_columns([group_col, out_col])

    return fn


def _driver_union_find(pairs_mat: rd.Dataset) -> rd.Dataset:
    """Small-side fast path: fully vectorized min-label propagation over the
    whole pair table in ONE zero-CPU worker task (numpy factorize +
    scatter-min per round — no per-row Python).  Produces exactly the labels
    the distributed paths converge to (comp = min mid of the component), the
    same way a broadcast join replaces a shuffle join when one side is small.
    Runs in a task, not on the driver: worker arenas are warm from block
    processing while a cold driver pays first-touch page faults for every
    array (measured as a 10-50 s run-to-run swing on this class of host).
    The pair table is O(mentions × rules) — tiny next to the corpus."""
    refs = pairs_mat.to_arrow_refs()
    return rd.from_arrow(ray.get(_union_find_pairs_task.remote(refs)))


@ray.remote(num_cpus=0)
def _union_find_pairs_task(refs: list) -> pa.Table:
    tables = [b for b in ray.get(list(refs)) if b.num_rows]
    return _union_find_pairs_table(tables)


def _uf_labels_from_pairs(t: pa.Table):
    """(key*, mid) pair table → (muniq, label) arrays: label[i] = min mid of
    the connected component containing muniq[i].  Fully vectorized
    min-label propagation (factorize in C, scatter-min per round).

    Allocation-lean by design: codes are int32 where they fit (pair counts
    below the distributed-path threshold always do) and every per-round array
    is preallocated and reused via ``np.take(..., out=)`` — on hosts where
    first-touch page faults dominate (measured 30-50 MB/s here), total bytes
    allocated IS the wall time, so the loop allocates nothing."""
    import numpy as np

    n = t.num_rows
    if n == 0:
        empty = np.array([], dtype=np.int64)
        return empty, empty
    idx_t = np.int32 if n < 2**31 - 1 else np.int64
    # Factorize in C — no Python key objects anywhere: 128-bit (kh, kl) keys
    # via lexsort run-detection; legacy single "key" via dictionary_encode.
    if "kh" in t.column_names:
        kh = t.column("kh").to_numpy(zero_copy_only=False)
        kl = t.column("kl").to_numpy(zero_copy_only=False)
        korder = np.lexsort((kl, kh)).astype(idx_t, copy=False)
        khs, kls = kh[korder], kl[korder]
        newk = np.r_[True, (khs[1:] != khs[:-1]) | (kls[1:] != kls[:-1])]
        del khs, kls
        kcodes_sorted = (np.cumsum(newk, dtype=idx_t) - 1)
        kcodes = np.empty(n, dtype=idx_t)
        kcodes[korder] = kcodes_sorted
    else:
        enc = pc.dictionary_encode(t.column("key"))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        kcodes = enc.indices.to_numpy(zero_copy_only=False).astype(idx_t)
        korder = np.argsort(kcodes, kind="stable").astype(idx_t, copy=False)
        kcodes_sorted = kcodes[korder]
    mids_np = t.column("mid").to_numpy(zero_copy_only=False)
    muniq, mcodes = np.unique(mids_np, return_inverse=True)
    mcodes = mcodes.astype(idx_t, copy=False)
    n_keys = int(kcodes_sorted[-1]) + 1 if n else 0

    # Segment boundaries once; per-round mins via C reduceat into reused bufs.
    kstarts = np.flatnonzero(
        np.r_[True, kcodes_sorted[1:] != kcodes_sorted[:-1]]
    )
    kseg_ids = kcodes_sorted[kstarts]
    morder = np.argsort(mcodes, kind="stable").astype(idx_t, copy=False)
    mcodes_sorted = mcodes[morder]
    mstarts = np.flatnonzero(
        np.r_[True, mcodes_sorted[1:] != mcodes_sorted[:-1]]
    )
    mseg_ids = mcodes_sorted[mstarts]

    label = muniq.copy()  # per distinct mid, starts as itself
    pair_buf = np.empty(n, dtype=np.int64)   # label per pair row
    perm_buf = np.empty(n, dtype=np.int64)   # permuted copy for reduceat
    kmin = np.empty(n_keys, dtype=np.int64)
    new_lab = np.empty(len(label), dtype=np.int64)
    while True:
        np.take(label, mcodes, out=pair_buf)
        np.take(pair_buf, korder, out=perm_buf)
        kmin.fill(np.iinfo(np.int64).max)
        kmin[kseg_ids] = np.minimum.reduceat(perm_buf, kstarts)
        np.take(kmin, kcodes, out=pair_buf)       # propagated key-min per row
        np.take(pair_buf, morder, out=perm_buf)
        seg_min = np.minimum.reduceat(perm_buf, mstarts)
        np.copyto(new_lab, label)
        new_lab[mseg_ids] = np.minimum(new_lab[mseg_ids], seg_min)
        if np.array_equal(new_lab, label):
            break
        label, new_lab = new_lab, label
    return muniq, label


def _union_find_pairs_table(tables: list[pa.Table]) -> pa.Table:
    if not tables:
        return pa.schema([("mid", pa.int64()), ("comp", pa.int64())]).empty_table()
    muniq, label = _uf_labels_from_pairs(pa.concat_tables(tables).combine_chunks())
    return pa.Table.from_pydict(
        {
            "mid": pa.array(muniq, pa.int64()),
            "comp": pa.array(label, pa.int64()),
        }
    )


def _uf_labels_from_edges(a, b):
    """(a, b) int edge arrays → (nodes, label): label = min node id of each
    connected component.  Vectorized min-label propagation (scatter-min)."""
    import numpy as np

    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    label = nodes.copy()
    while True:
        m = np.minimum(label[ia], label[ib])
        new = label.copy()
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        if np.array_equal(new, label):
            break
        label = new
    return nodes, label


_EDGE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _contract_level0(batch: pa.Table) -> pa.Table:
    """Key-colocated block → (a=local root, b=mid) rows.

    All mids sharing a key inside this block are unioned locally (full local
    transitive closure, vectorized — no per-row Python); each distinct mid
    emits one row pointing at its local min root.  Keys never leave this
    level (range sort keeps equal keys in one block)."""
    if batch.num_rows == 0:
        return _EDGE_SCHEMA.empty_table()
    muniq, label = _uf_labels_from_pairs(batch.combine_chunks())
    return pa.Table.from_pydict(
        {"a": pa.array(label, pa.int64()), "b": pa.array(muniq, pa.int64())},
        schema=_EDGE_SCHEMA,
    )


def _expand_star(batch: pa.Table) -> pa.Table:
    """(a, b) edges → (k, v) rows in both orientations, so every claim about
    a node colocates at that node's id in the next sort."""
    a, b = batch.column("a"), batch.column("b")
    return pa.Table.from_pydict(
        {
            "k": pa.chunked_array([a, b]).combine_chunks(),
            "v": pa.chunked_array([b, a]).combine_chunks(),
        }
    )


def _contract_round(batch: pa.Table) -> pa.Table:
    """One star-colocated block → contracted (root, node) rows (distinct
    nodes only; vectorized local closure)."""
    if batch.num_rows == 0:
        return _EDGE_SCHEMA.empty_table()
    t = batch.combine_chunks()
    nodes, label = _uf_labels_from_edges(
        t.column("k").to_numpy(zero_copy_only=False),
        t.column("v").to_numpy(zero_copy_only=False),
    )
    return pa.Table.from_pydict(
        {"a": pa.array(label, pa.int64()), "b": pa.array(nodes, pa.int64())},
        schema=_EDGE_SCHEMA,
    )


def _edge_cc_polars(t: pa.Table):
    """Min-label propagation over (a, b) edges with polars (multithreaded C
    joins/group-bys).  Returns a (node, lab) polars frame, lab = min node id
    of the component.

    Why polars and not the numpy kernel for the big merge: the numpy path is
    ONE thread touching ~0.5 GB of fresh allocations, and on this host
    single-threaded first-touch page faulting is both slow (30-50 MB/s) and
    bimodal (the same 5.8M-edge merge measured anywhere from 2 s to 98 s).
    Polars faults pages from its whole thread pool in parallel, which makes
    the merge wall both stable (9-17 s → ~stable at 5.8M edges) and — unlike
    any serial kernel — actually scale with the CPUs given to the job."""
    import polars as pl

    df = pl.from_arrow(t)
    edges = pl.concat(
        [
            df.rename({"a": "u", "b": "v"}),
            df.rename({"a": "v", "b": "u"}).select(["u", "v"]),
        ]
    )
    labels = (
        edges.select(pl.col("u").alias("node")).unique()
        .with_columns(pl.col("node").alias("lab"))
    )
    while True:
        nbr = (
            edges.join(labels, left_on="v", right_on="node", how="inner")
            .group_by("u").agg(pl.col("lab").min().alias("nbr_min"))
        )
        new = (
            labels.join(nbr, left_on="node", right_on="u", how="left")
            .with_columns(pl.min_horizontal("lab", "nbr_min").alias("new_lab"))
            .select(["node", pl.col("new_lab").alias("lab")])
        )
        changed = (
            new.join(labels, on="node", how="inner")
            .filter(pl.col("lab") != pl.col("lab_right")).height
        )
        labels = new
        if changed == 0:
            return labels


@ray.remote(num_cpus=0)
def _merge_claims_task(refs: list) -> pa.Table:
    """Claim-edge merge: min-label propagation over (a, b) int edges.

    Multithreaded polars kernel when available (see _edge_cc_polars — on this
    class of host the single-threaded numpy merge is bimodal and does not
    scale); numpy scatter-min fallback otherwise.  POLARS_MAX_THREADS is
    pinned to the cluster's CPU count so an 8-cpu job does 8-cpu work."""
    blocks = [b for b in ray.get(list(refs)) if b.num_rows]
    if not blocks:
        return pa.schema([("mid", pa.int64()), ("comp", pa.int64())]).empty_table()
    t = pa.concat_tables(blocks).combine_chunks()
    try:
        import os

        os.environ.setdefault(
            "POLARS_MAX_THREADS",
            str(int(ray.cluster_resources().get("CPU", 0)) or os.cpu_count()),
        )
        labels = _edge_cc_polars(t)
        return pa.Table.from_pydict(
            {
                "mid": pa.array(labels.get_column("node").to_numpy(), pa.int64()),
                "comp": pa.array(labels.get_column("lab").to_numpy(), pa.int64()),
            }
        )
    except ImportError:
        pass
    nodes, label = _uf_labels_from_edges(
        t.column("a").to_numpy(zero_copy_only=False),
        t.column("b").to_numpy(zero_copy_only=False),
    )
    return pa.Table.from_pydict(
        {
            "mid": pa.array(nodes, pa.int64()),
            "comp": pa.array(label, pa.int64()),
        }
    )


# Sub-stage wall times of the last connected_components() call (driver-side
# diagnostics; keys: pairs, contract, solve).
CC_TIMINGS: dict[str, float] = {}


def _memory_capped(measured: int, bytes_per_row: int, frac: float) -> int:
    """Single-task row threshold: the measured crossover on this host, capped
    by a fraction of currently-available memory so a small driver box lowers
    the cutover automatically (the constants are ceilings, not the policy)."""
    try:
        import psutil

        avail = psutil.virtual_memory().available
    except Exception:  # pragma: no cover - psutil ships with ray
        return measured
    return max(65_536, min(measured, int(avail * frac / bytes_per_row)))


def connected_components(
    pairs: rd.Dataset,
    num_partitions: int = 16,
    max_rounds: int = 8,
    driver_threshold: int | None = None,
    edge_driver_threshold: int | None = None,
) -> rd.Dataset:
    """(key, mid) pairs → (mid, comp) labels.

    Distributed transitive closure (the reference's while-loop closure,
    systematic_merge_provider.py:239-298) via **alternating local
    contraction**: range-sort colocates rows sharing one endpoint, a
    per-block union-find contracts them to (root, node) edges, and the sort
    endpoint alternates each round — min roots propagate like pointer
    jumping, but whole local chains collapse in a single round.  Each round
    is one sort + one map over an edge set that never exceeds the pair count.
    Converges when a round performs zero merges on each orientation.

    Pair sets at or below ``driver_threshold`` rows short-circuit to a
    single-task vectorized union-find (identical labels — comp = min mid of
    the component — with no shuffle rounds); pass 0 to force the distributed
    path.  The threshold sits between two measurements on this host: at
    1.17M pairs the single task wins (1.5-4 s vs the distributed path's
    14 s — level-0 contraction barely shrinks the claim set, so the final
    merge does the same work after paying a full shuffle), but at 5.8M
    pairs the single serial task is memory-latency-bound and bimodal
    (79-202 s observed) while the distributed path holds ~39 s and, unlike
    the serial task, still gains from added CPUs.  Above the threshold the
    parallel sort+contract path is both faster and the scale story."""
    import time as _time

    # measured crossovers (docstring) as ceilings, scaled down on small
    # driver/worker heaps: ~48 B/pair live in the serial union-find, ~32
    # B/claim in the zero-CPU merge task; 5%/10% of available memory
    if driver_threshold is None:
        driver_threshold = _memory_capped(3_000_000, 48, 0.05)
    if edge_driver_threshold is None:
        edge_driver_threshold = _memory_capped(50_000_000, 32, 0.10)
    t0 = _time.monotonic()
    pairs_mat = pairs.materialize()
    n_pairs = pairs_mat.count()
    CC_TIMINGS.clear()
    CC_TIMINGS["pairs"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()
    if n_pairs == 0:
        return rd.from_arrow(
            pa.schema([("mid", pa.int64()), ("comp", pa.int64())]).empty_table()
        )
    if driver_threshold and n_pairs <= driver_threshold:
        out = _driver_union_find(pairs_mat)
        CC_TIMINGS["solve"] = round(_time.monotonic() - t0, 3)
        return out

    # Level 0 (distributed): range-sort by key colocates every key's
    # mentions; a per-block union-find contracts them into int64 claim edges
    # (local root, node).  This does all the string handling and most of the
    # merging in parallel; the residual graph is one edge per (node, block).
    sch = pairs_mat.schema()
    E = (
        pairs_mat.sort(_pair_key_cols(sch.names if sch is not None else ["key"]))
        .map_batches(_contract_level0, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    claims = E.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("a"), t.column("b"))),
        batch_format="pyarrow",
    ).materialize()
    CC_TIMINGS["contract"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()

    if claims.count() <= edge_driver_threshold:
        # Level 1: merge the contracted claim edges — O(nodes) int pairs,
        # orders of magnitude below the raw pair/corpus volume.  Runs in a
        # zero-CPU worker task (same cold-driver-page-fault rationale as
        # _driver_union_find).  Nodes with only self-claims (a == b
        # everywhere) are their own comp; they are simply absent here and
        # attach_components fills comp = mid.
        refs = claims.to_arrow_refs()
        out = rd.from_arrow(ray.get(_merge_claims_task.remote(refs)))
        CC_TIMINGS["solve"] = round(_time.monotonic() - t0, 3)
        return out

    # Fallback for residuals beyond driver memory: alternating star
    # contraction.  Fixpoint detection is exact and monotone: every round can
    # only lower a node's claimed root (min-root unions), so sum(a) strictly
    # decreases on any change; (count, sum(a)) stable → converged.
    prev: tuple[int, int] | None = None
    for _ in range(max_rounds):
        E = (
            E.map_batches(_expand_star, batch_format="pyarrow")
            .sort("k")
            .map_batches(_contract_round, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        stat = (E.count(), int(E.sum("a", ignore_nulls=True) or 0))
        if stat == prev:
            break
        prev = stat

    # Dedup cross-block duplicate claims (identical at fixpoint) and emit
    # (mid, comp).
    labels = (
        E.map_batches(_batch_min_by("b", "a", "comp"), batch_format="pyarrow")
        .groupby("b", num_partitions=num_partitions)
        .aggregate(Min("comp", alias_name="comp"))
        .map_batches(
            lambda t: t.rename_columns(["mid", "comp"]), batch_format="pyarrow"
        )
    )
    return labels


def attach_components(
    mentions: rd.Dataset, labels: rd.Dataset, num_partitions: int = 16
) -> rd.Dataset:
    """Left-join mentions with (mid, comp); keyless mentions become singleton
    components (comp = mid)."""
    joined = adaptive_join(
        mentions, labels, left_keys=["mid"], how="left", num_partitions=num_partitions
    )

    def fill(batch: pa.Table) -> pa.Table:
        from ..functions.arrow_utils import safe_coalesce

        comp = safe_coalesce(batch.column("comp"), batch.column("mid"))
        i = batch.column_names.index("comp")
        return batch.set_column(i, "comp", comp)

    return joined.map_batches(fill, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Group merge (create-entity-from-group semantics, D3/D5)
# ---------------------------------------------------------------------------

NODES_SCHEMA = pa.schema(
    [("comp", pa.int64()), ("min_ord", pa.int64())]
    + [(c, pa.string()) for c in SCALAR_NODE_COLUMNS]
    + [(c, pa.list_(pa.string())) for c in ARRAY_NODE_COLUMNS]
    + [("surfaces", pa.list_(pa.string())), ("n_mentions", pa.int64())]
)


def transform_attributes(entity_type: str, raw: dict[str, Any]) -> dict[str, Any]:
    """LLM attribute dict → DB field dict (M12; mirrors
    systematic_merge_provider.py:867-926 + entity_config.py:141-150).

    description always becomes a list; values landing on array columns are
    wrapped/extended; attributes with no schema column are dropped (the
    reference's DB layer drops them at write, kuzu_db_handler.py:153-168).
    """
    spec = get_spec(entity_type)
    if spec is None:
        return dict(raw)
    fmap = spec.field_map()
    out: dict[str, Any] = {}
    for llm_field, value in raw.items():
        if value is None:
            continue
        target = llm_to_db_field(entity_type, llm_field)
        if llm_field == "description":
            value = value if isinstance(value, list) else ([value] if value else [])
        fs = fmap.get(target)
        if fs is None:
            continue  # not a schema column → dropped at the sink in the reference
        if fs.is_array:
            vals = value if isinstance(value, list) else ([value] if value else [])
            if target in out:
                out[target] = out[target] + [v for v in vals]
            else:
                out[target] = list(vals)
        else:
            if isinstance(value, list):
                value = value[0] if value else None
            if value is not None:
                out[target] = value
    return out


def _merge_group_rows(
    etype: str,
    names: list[str],
    attrs_list: list[dict[str, Any]],
    urls: list[str],
    perms_list: list[list[str]],
    sources_list: list[list[str]] | None = None,
) -> dict[str, Any]:
    """Merge one sorted component into a canonical node (rows pre-sorted by
    mid).  Mirrors _create_entity_from_group (systematic_merge_provider.py:
    713-850): first item is the base, other surface names become aliases,
    scalar merge-fields keep the first non-empty value with later conflicts
    overflowing into aliases, array fields append unique values in order."""
    spec = get_spec(etype)
    valid_fields = spec.field_map() if spec else {}
    arr_fields = array_fields_for(etype)
    string_fields = [f for f in STRING_MERGE_FIELDS if f in valid_fields]

    merged = transform_attributes(etype, attrs_list[0])
    primary = names[0]
    merged["name"] = primary

    # Shadow membership sets make every append-unique O(1): hub components
    # (head-entity skew) reach 10^5 mentions, and `x not in list` scans turn
    # the reducer O(n²) — the single worst straggler at scale.
    seen_sets: dict[str, set] = {}

    aliases = merged.get("aliases")
    if not isinstance(aliases, list):
        aliases = []
    merged["aliases"] = aliases

    for f in arr_fields:
        cur = merged.get(f)
        if cur is None:
            merged[f] = []
        elif not isinstance(cur, list):
            merged[f] = [cur] if cur else []
        seen_sets[f] = set(merged[f])

    alias_seen = seen_sets.setdefault("aliases", set(aliases))
    for n in names[1:]:
        if n != primary and n not in alias_seen:
            alias_seen.add(n)
            aliases.append(n)

    for raw_attrs, perm in zip(attrs_list[1:], perms_list[1:]):
        attrs = transform_attributes(etype, raw_attrs)
        for f in string_fields:
            v = attrs.get(f)
            if f in attrs and v:
                if not merged.get(f):
                    merged[f] = v
                elif v != merged[f] and "aliases" in valid_fields:
                    if v not in alias_seen:
                        alias_seen.add(v)
                        merged["aliases"].append(v)
        for f in arr_fields:
            v = attrs.get(f)
            if f in attrs and v:
                vals = v if isinstance(v, list) else [v]
                fs = seen_sets[f]
                fl = merged[f]
                for x in vals:
                    if x and x not in fs:
                        fs.add(x)
                        fl.append(x)

    # Source tracking (M11) when sources are carried out-of-band (the
    # mention schema lifts the parser-injected sources out of
    # attributes_json; see extract.ENTITY_T).  Append-unique per row in mid
    # order — identical to the in-attrs path, since every merge field is an
    # independent ordered append-unique.
    if sources_list is not None and "sources" in valid_fields:
        sl = merged.setdefault("sources", [])
        ss = seen_sets.setdefault("sources", set(sl))
        for svals in sources_list:
            for s_ in svals or []:
                if s_ and s_ not in ss:
                    ss.add(s_)
                    sl.append(s_)

    # Page-level permission injection (M10): union all page permissions.
    if "permissions" in valid_fields:
        pl = merged.setdefault("permissions", [])
        ps = seen_sets.setdefault("permissions", set(pl))
        for perm in perms_list:
            for p in perm or []:
                if p and p not in ps:
                    ps.add(p)
                    pl.append(p)
    # First row's page permissions (base item) are not re-walked above for
    # attrs, so fold base perms too — handled by the loop over perms_list.

    # Deduplicate scalar coercion for output
    row: dict[str, Any] = {"type": etype}
    for c in SCALAR_NODE_COLUMNS:
        if c == "type":
            continue
        v = merged.get(c)
        if isinstance(v, list):
            v = v[0] if v else None
        row[c] = str(v) if v is not None else None
    for c in ARRAY_NODE_COLUMNS:
        v = merged.get(c)
        if v is None:
            v = []
        elif not isinstance(v, list):
            v = [v]
        row[c] = [str(x) for x in v if x is not None]

    seen: set[str] = set()
    surfaces = []
    for n in names:
        if n not in seen:
            seen.add(n)
            surfaces.append(n)
    row["surfaces"] = surfaces
    return row


# NOTE on map-side combining (measured, round 2): an exact-duplicate
# combiner before the merge shuffle (group_by (comp, name, type, attrs,
# perms) keeping min mid/ord + count) is semantically exact — every
# _merge_group_rows step is idempotent for duplicate rows — but collapses
# NOTHING on this engine's output: source-tracking (M11) embeds the page
# url in every mention's attributes_json ("sources": [...]), so mention
# rows are unique by construction (measured ratio 1.000 on 3.7M mentions).
# The reducers keep the sum(n)/"n" fallback so pre-combined inputs from
# other extractors still merge exactly; the pipeline itself only prunes the
# unused url column before the shuffle.
MERGE_COLUMNS = [
    "comp", "mid", "ord", "entity_name", "entity_type",
    "attributes_json", "sources_json", "url", "permissions_json",
]


def merge_component_row(group: pa.Table) -> dict[str, Any]:
    """One component's mentions → one canonical node row (dict)."""
    order = pc.sort_indices(group.column("mid"))
    g = group.take(order)
    etype = g.column("entity_type")[0].as_py()
    names = g.column("entity_name").to_pylist()
    attrs_list = [json.loads(a) if a else {} for a in g.column("attributes_json").to_pylist()]
    urls = g.column("url").to_pylist() if "url" in g.column_names else [None] * g.num_rows
    perms = [json.loads(x) if x else [] for x in g.column("permissions_json").to_pylist()]
    sources_list = None
    if "sources_json" in g.column_names:
        # "" encodes exactly [url] (extract.ENTITY_T)
        sources_list = [
            json.loads(s) if s else [urls[i]]
            for i, s in enumerate(g.column("sources_json").to_pylist())
        ]

    row = _merge_group_rows(etype, names, attrs_list, urls, perms, sources_list)
    row["comp"] = g.column("comp")[0].as_py()
    row["min_ord"] = g.column("ord")[0].as_py()
    row["n_mentions"] = (
        int(pc.sum(g.column("n")).as_py()) if "n" in g.column_names else g.num_rows
    )
    return row


def merge_component_group(group: pa.Table) -> pa.Table:
    """map_groups-style reducer (kept for operator-level tests)."""
    return pa.Table.from_pylist([merge_component_row(group)], schema=NODES_SCHEMA)


def _dict_col(block: pa.Table, name: str):
    """(distinct_values, int32 index array) for a string column — the block
    converts 10^6 rows to Python through its few distinct strings instead of
    materializing one str object per row.  Columns already dictionary-encoded
    (the merge shuffle compresses strings pre-sort) pass through."""
    col = block.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col if pa.types.is_dictionary(col.type) else col.dictionary_encode()
    return d.dictionary.to_pylist(), d.indices.to_numpy(zero_copy_only=False)


def merge_component_block(block: pa.Table, starts) -> pa.Table:
    """Block reducer: all components of one sorted block at once (rows
    pre-sorted by (comp run, mid) by grouped_apply).  Semantics identical to
    merge_component_row per run.  Every string column is dictionary-encoded
    first and JSON payloads parse ONCE PER DISTINCT STRING — with sources
    lifted out of attributes_json the attrs/perms dictionaries are tiny
    relative to the row count, so the reducer's Python allocation rate (the
    measured non-scaling cost on a shared memory bus) is O(distinct), not
    O(rows)."""
    import numpy as np

    n = block.num_rows
    ends = np.r_[starts[1:], n]
    has_url = "url" in block.column_names
    has_src = "sources_json" in block.column_names
    etype_v, etype_i = _dict_col(block, "entity_type")
    name_v, name_i = _dict_col(block, "entity_name")
    attr_v, attr_i = _dict_col(block, "attributes_json")
    perm_v, perm_i = _dict_col(block, "permissions_json")
    if has_url:
        url_v, url_i = _dict_col(block, "url")
    if has_src:
        src_v, src_i = _dict_col(block, "sources_json")
        # parsed per distinct; None marks the "" == [url] fast path
        src_p = [json.loads(s) if s else None for s in src_v]
    attr_p = [json.loads(s) if s else {} for s in attr_v]
    perm_p = [json.loads(s) if s else [] for s in perm_v]
    comps = block.column("comp").to_numpy(zero_copy_only=False)
    ords = block.column("ord").to_numpy(zero_copy_only=False)
    counts = (
        block.column("n").to_numpy(zero_copy_only=False)
        if "n" in block.column_names
        else None
    )

    rows = []
    for s, e in zip(starts.tolist(), ends.tolist()):
        sources_list = None
        if has_src:
            sources_list = [
                (src_p[src_i[i]] if src_v[src_i[i]] else [url_v[url_i[i]]])
                for i in range(s, e)
            ]
        row = _merge_group_rows(
            etype_v[etype_i[s]],
            [name_v[j] for j in name_i[s:e]],
            [attr_p[j] for j in attr_i[s:e]],
            [url_v[j] for j in url_i[s:e]] if has_url else [None] * (e - s),
            [perm_p[j] for j in perm_i[s:e]],
            sources_list,
        )
        row["comp"] = int(comps[s])
        row["min_ord"] = int(ords[s])
        row["n_mentions"] = int(counts[s:e].sum()) if counts is not None else e - s
        rows.append(row)
    return pa.Table.from_pylist(rows, schema=NODES_SCHEMA)


# Target rows per hash-exchange reduce task (see grouped_apply docstring);
# 2^18 keeps one reduce's concat+lexsort inside cache-friendly territory.
_HASH_EXCHANGE_ROWS_PER_PART = 262144


def grouped_apply(
    ds: rd.Dataset,
    keys: list[str],
    row_fn,
    schema: pa.Schema,
    num_partitions: int = 16,
    hash_sort: bool = False,
    block_fn=None,
    order_col: str | None = None,
    exchange: str = "sort",
) -> rd.Dataset:
    """Hash-partitioned grouped apply emitting ONE block per partition.

    Ray's ``groupby().map_groups`` yields one output batch per group, and the
    map operator's block builder charges ~1-2 ms per yielded batch — with
    10^4-10^5 groups that overhead dwarfs the reducers.  Here the dataset is
    hash-repartitioned on the keys (equal keys provably colocate) and sorted
    within each partition, group runs are found with a vectorized
    adjacent-difference scan, the per-group reducer returns a plain dict, and
    each partition becomes exactly one output table.

    ``hash_sort=True`` sorts by a 128-bit composite key hash (two int64
    columns) instead of the raw key columns: the range sort compares 16
    fixed bytes per row instead of several variable-length strings, and the
    run scan reads uint64 arrays zero-copy instead of materializing Python
    string objects.  Two groups merge only if BOTH independent polynomial
    hash families collide (~1e-19 at 10^10 groups) — the collision model the
    CC pair keys and the alias map already accept.

    ``exchange`` picks the all-to-all implementation (hash_sort only):

    * ``"sort"`` — Ray's range sort.  Establishes a GLOBAL order the run
      scan never needed, paying a sampling pass, boundary coordination and
      repeated sorted-run merge-concats.  Measured on this host the merge
      phase is memory-bus-bound and stops scaling past ~8 workers (edges.merge
      ran 20 s @ 8 cpus → 25 s @ 32 in the round-3 campaign).
    * ``"hash"`` — explicit map/reduce exchange: one split task per input
      block partitions rows by ``gh1 % P`` (one argsort + P compact takes),
      one reduce task per partition concats its B parts, lexsorts by the
      128-bit hash and applies the same run-scan reducer.  Exactly two task
      waves, no sampling, no global order, O(rows/P) memory per reduce —
      the shape a real cluster's object store executes as a single
      all-to-all.  Groups colocate because equal keys share gh1."""
    import numpy as np

    # NOTE: ds.sort range-partitions with equal keys colocated (ties cannot
    # straddle a boundary); exchange="hash" below is the key-hash repartition
    # that note used to wish for, without the global HASH_SHUFFLE strategy.

    # NOTE (measured, round 3): dictionary-encoding the string payload
    # before the sort LOSES 3-7x on this engine — Ray's sort re-concats
    # blocks constantly and every concat pays a dictionary unification, so
    # the byte savings are swamped by repeated O(dict) merges.  Plain
    # string columns shuffle faster; do not re-add compression here.
    if exchange not in ("sort", "hash"):
        raise ValueError(f"unknown exchange {exchange!r}")
    if exchange == "hash" and not hash_sort:
        raise ValueError("exchange='hash' requires hash_sort=True")

    if hash_sort:
        from ..functions.hashing import hash2_key_columns, hash_key_columns

        def add_gh(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column(
                    "_gh1", pa.array([], pa.uint64())
                ).append_column("_gh2", pa.array([], pa.uint64()))
            t = t.combine_chunks()
            return t.append_column(
                "_gh1", pa.array(hash_key_columns(t, keys), pa.uint64())
            ).append_column(
                "_gh2", pa.array(hash2_key_columns(t, keys), pa.uint64())
            )

        run_cols = ["_gh1", "_gh2"]
    else:
        run_cols = keys

    def apply_block(block: pa.Table) -> pa.Table:
        n = block.num_rows
        if n == 0:
            return schema.empty_table()
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for k in run_cols:
            col = block.column(k).to_numpy(zero_copy_only=False)
            change[1:] |= col[1:] != col[:-1]
        if block_fn is not None:
            # block reducer path: ONE in-run sort + ONE take per block, then
            # the whole block converts at once — no per-group Arrow calls
            # (slice / sort_indices / take / to_pylist per group was the
            # measured cost at 10^5 groups).
            if order_col is not None:
                run_id = np.cumsum(change) - 1
                ordv = block.column(order_col).to_numpy(zero_copy_only=False)
                order = np.lexsort((ordv, run_id))
                block = block.take(pa.array(order, pa.int64()))
            if hash_sort:
                block = block.drop_columns(["_gh1", "_gh2"])
            return block_fn(block, np.flatnonzero(change))
        if hash_sort:
            block = block.drop_columns(["_gh1", "_gh2"])
        idx = np.flatnonzero(change).tolist()
        idx.append(n)
        rows = [
            row_fn(block.slice(s0, e0 - s0)) for s0, e0 in zip(idx[:-1], idx[1:])
        ]
        return pa.Table.from_pylist(rows, schema=schema)

    if exchange == "hash":
        mat = ds.materialize()
        total = mat.count()
        # Partition count follows DATA SIZE, capped by the caller's
        # num_partitions — never the CPU count.  Measured on this host: with
        # P == num_cpus the 32-cpu leg ran 32 tiny concat+lexsort reduces
        # that fight for one memory bus and the merge stage anti-scaled
        # (10-12 s @ 32 vs 3.3 s @ 8 cpus); ~2^18 rows per reduce keeps each
        # task cache-friendly and the task count proportional to rows — the
        # same rule that yields thousands of partitions at 100 TB.
        P = max(1, min(int(num_partitions), -(-total // _HASH_EXCHANGE_ROWS_PER_PART)))

        @ray.remote
        def _split(block: pa.Table):
            t = add_gh(block)
            if t.num_rows == 0:
                return None if P == 1 else tuple(None for _ in range(P))
            if P == 1:
                return t
            h1 = t.column("_gh1").to_numpy(zero_copy_only=False)
            part = (h1 % np.uint64(P)).astype(np.int64)
            order = np.argsort(part, kind="stable")
            bounds = np.searchsorted(part[order], np.arange(P + 1))
            out = []
            for i in range(P):
                ii = order[bounds[i]:bounds[i + 1]]
                # compact per-partition take (no sliced-buffer shipping)
                out.append(t.take(pa.array(ii, pa.int64())) if ii.size else None)
            return tuple(out)

        @ray.remote
        def _reduce(*parts):
            tabs = [p for p in parts if p is not None and p.num_rows]
            if not tabs:
                return schema.empty_table()
            # blocks from a union() can carry the same columns in different
            # order; concat_tables is strict — normalize to the first block's
            cols = tabs[0].column_names
            tabs = [t if t.column_names == cols else t.select(cols) for t in tabs]
            t = pa.concat_tables(tabs).combine_chunks()
            h1 = t.column("_gh1").to_numpy(zero_copy_only=False)
            h2 = t.column("_gh2").to_numpy(zero_copy_only=False)
            return apply_block(t.take(pa.array(np.lexsort((h2, h1)), pa.int64())))

        refs = mat.to_arrow_refs()
        if not refs:
            return rd.from_arrow(schema.empty_table())
        split_opts = _split.options(num_returns=P) if P > 1 else _split
        splits = [split_opts.remote(r) for r in refs]
        if P == 1:
            splits = [[s] for s in splits]
        out_refs = [
            _reduce.remote(*[splits[b][p] for b in range(len(splits))])
            for p in range(P)
        ]
        return rd.from_arrow_refs(out_refs)

    s = (
        ds.map_batches(add_gh, batch_format="pyarrow").sort(["_gh1", "_gh2"])
        if hash_sort
        else ds.sort(keys)
    )
    return s.map_batches(
        apply_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


# Sub-stage wall times of the last canonicalize() call (driver-side, for
# bench attribution; keys: cc, attach, merge).
LAST_TIMINGS: dict[str, float] = {}


def canonicalize(
    mentions: rd.Dataset,
    num_partitions: int = 16,
    max_rounds: int = 8,
    cc_driver_threshold: int | None = None,
    linking=None,
) -> tuple[rd.Dataset, rd.Dataset]:
    """mentions → (nodes, mentions_with_comp).

    nodes: one row per canonical entity (NODES_SCHEMA).
    mentions_with_comp: the input mentions plus their component id, used by
    the edge-resolution join (stages/edges.py).

    ``linking`` (a stages.linking.LinkingConfig, default None = off) adds
    fuzzy entity-linking pairs — embedding-ANN candidates over normalized
    surfaces plus alias-dictionary keys — into the SAME connected-components
    pass.  Off, outputs are byte-identical to the exact-rule pipeline
    (reference parity)."""
    import time as _time

    t0 = _time.monotonic()
    pairs = mentions.map_batches(
        _with_registry(mention_keys_fast), batch_format="pyarrow"
    )
    if linking is not None:
        from .linking import linking_pairs

        pairs = pairs.union(linking_pairs(mentions, linking))
    labels = connected_components(
        pairs,
        num_partitions=num_partitions,
        max_rounds=max_rounds,
        driver_threshold=cc_driver_threshold,
    )
    LAST_TIMINGS.clear()
    LAST_TIMINGS["cc"] = round(_time.monotonic() - t0, 3)
    for _k, _v in CC_TIMINGS.items():
        LAST_TIMINGS[f"cc.{_k}"] = _v
    t0 = _time.monotonic()
    # Materialize the small intermediates: both are consumed by more than one
    # downstream stage (node write + alias-map join), and keeping several
    # hash-shuffle operators inside one lazy DAG both recomputes the branch
    # and can deadlock aggregator actor pools on small CPU counts.  Size is
    # O(mentions), never O(corpus).
    with_comp = attach_components(
        mentions, labels, num_partitions=num_partitions
    ).materialize()
    LAST_TIMINGS["attach"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()
    # The identity rebatch after map_groups is load-bearing: map_groups emits
    # one tiny block per group, and everything downstream (repartition,
    # write_parquet, joins) degrades with thousands of blocks.
    # Prune the merge shuffle to the columns the reducer reads (legacy
    # fixtures without out-of-band sources keep their subset; exact-dup
    # combining measured useless here — see MERGE_COLUMNS note above).
    _sch = with_comp.schema()
    _have = set(_sch.names if _sch is not None else [])
    merge_in = with_comp.select_columns([c for c in MERGE_COLUMNS if c in _have])
    nodes = grouped_apply(
        merge_in, ["comp"], _with_registry(merge_component_row), NODES_SCHEMA,
        num_partitions=num_partitions,
        # hash keys + map/reduce exchange (round 3): the node merge needs
        # colocation by comp, not a global comp order — same rationale and
        # collision model as the edge merge.
        hash_sort=True,
        exchange="hash",
        block_fn=_with_registry(merge_component_block), order_col="mid",
    ).materialize()
    LAST_TIMINGS["merge"] = round(_time.monotonic() - t0, 3)
    return nodes, with_comp

"""D1–D5 — candidate keys, connected components, group merge (FIXTURES F3)."""

import json

import pyarrow as pa

import ray.data as rd

from knowledgegraph_ray.stages.canonicalize import (
    canonicalize,
    mention_keys,
    transform_attributes,
)


def _mentions_table(rows):
    return pa.Table.from_pydict(
        {
            "mid": [r["mid"] for r in rows],
            "url": [r.get("url", "u") for r in rows],
            "ord": [r.get("ord", r["mid"]) for r in rows],
            "entity_name": [r["name"] for r in rows],
            "entity_type": [r.get("type", "Person") for r in rows],
            "attributes_json": [json.dumps(r.get("attrs", {})) for r in rows],
            "permissions_json": [json.dumps(r.get("perms", [])) for r in rows],
        }
    )


def _canon(rows, **kw):
    ds = rd.from_arrow(_mentions_table(rows))
    nodes, with_comp = canonicalize(ds, num_partitions=2, **kw)
    node_rows = sorted(nodes.take_all(), key=lambda r: r["min_ord"])
    comp_of = {r["mid"]: r["comp"] for r in with_comp.take_all()}
    return node_rows, comp_of


def test_email_search_rule_merges_different_names():
    # entity_config.yaml email/emails search rule: scalar email probes arrays
    rows = [
        {"mid": 0, "name": "Sarah Jones", "attrs": {"name": "Sarah Jones", "email": "s@a.com"}},
        {"mid": 1, "name": "S. Jones", "attrs": {"name": "S. Jones", "email": "s@a.com"}},
    ]
    nodes, comp = _canon(rows)
    assert len(nodes) == 1
    n = nodes[0]
    assert n["name"] == "Sarah Jones"  # first item wins
    assert n["aliases"] == ["S. Jones"]
    assert comp[0] == comp[1]


def test_exact_name_duplicates_merge():
    rows = [
        {"mid": 0, "name": "Acme Corp", "type": "Organization", "attrs": {"name": "Acme Corp"}},
        {"mid": 1, "name": " acme corp ", "type": "Organization", "attrs": {"name": " acme corp "}},
    ]
    nodes, comp = _canon(rows)
    assert len(nodes) == 1
    assert comp[0] == comp[1]


def test_alias_chain_transitive_closure():
    """A~B via email, B~C via exact name → one component (D2)."""
    rows = [
        {"mid": 0, "name": "A", "attrs": {"name": "A", "email": "x@y.com"}},
        {"mid": 1, "name": "B", "attrs": {"name": "B", "email": "x@y.com"}},
        {"mid": 2, "name": "B", "attrs": {"name": "B", "email": "z@w.com"}},
        {"mid": 3, "name": "C", "attrs": {"name": "C", "email": "z@w.com"}},
    ]
    nodes, comp = _canon(rows)
    assert len(nodes) == 1
    assert len({comp[i] for i in range(4)}) == 1
    assert nodes[0]["name"] == "A"
    assert nodes[0]["aliases"] == ["B", "C"]
    assert sorted(nodes[0]["emails"]) == ["x@y.com", "z@w.com"]


def test_types_never_cross_merge():
    rows = [
        {"mid": 0, "name": "Mercury", "type": "Project", "attrs": {"name": "Mercury"}},
        {"mid": 1, "name": "Mercury", "type": "Team", "attrs": {"name": "Mercury"}},
    ]
    nodes, comp = _canon(rows)
    assert len(nodes) == 2
    assert comp[0] != comp[1]


def test_org_domain_rule():
    rows = [
        {"mid": 0, "name": "Acme", "type": "Organization",
         "attrs": {"name": "Acme", "domain": "acme.com"}},
        {"mid": 1, "name": "Acme Incorporated", "type": "Organization",
         "attrs": {"name": "Acme Incorporated", "domain": "acme.com"}},
    ]
    nodes, _ = _canon(rows)
    assert len(nodes) == 1
    assert nodes[0]["domain"] == "acme.com"
    assert nodes[0]["aliases"] == ["Acme Incorporated"]


def test_conflicting_scalar_overflows_to_aliases():
    """systematic_merge_provider.py:784-799 — second value of a scalar merge
    field that conflicts goes into aliases."""
    rows = [
        {"mid": 0, "name": "P", "attrs": {"name": "P", "email": "p@a.com", "worksAt": "Acme"}},
        {"mid": 1, "name": "P", "attrs": {"name": "P", "email": "p@a.com", "worksAt": "Globex"}},
    ]
    nodes, _ = _canon(rows)
    assert len(nodes) == 1
    n = nodes[0]
    assert n["worksAt"] == "Acme"
    assert "Globex" in n["aliases"]


def test_append_unique_arrays_preserve_first_seen_order():
    rows = [
        {"mid": 0, "name": "P", "attrs": {"name": "P", "email": "p@a.com",
                                          "description": "first desc"}},
        {"mid": 1, "name": "P", "attrs": {"name": "P", "email": "p@a.com",
                                          "description": "second desc"}},
        {"mid": 2, "name": "P", "attrs": {"name": "P", "email": "p@a.com",
                                          "description": "first desc"}},
    ]
    nodes, _ = _canon(rows)
    assert nodes[0]["rawDescriptions"] == ["first desc", "second desc"]


def test_permissions_unioned_from_pages():
    rows = [
        {"mid": 0, "name": "P", "attrs": {"name": "P"}, "perms": ["a@x"]},
        {"mid": 1, "name": "P", "attrs": {"name": "P"}, "perms": ["b@x", "a@x"]},
    ]
    nodes, _ = _canon(rows)
    assert nodes[0]["permissions"] == ["a@x", "b@x"]


def test_keyless_mentions_become_singletons():
    rows = [
        {"mid": 5, "name": "", "attrs": {}},
        {"mid": 9, "name": "", "attrs": {}},
    ]
    nodes, comp = _canon(rows)
    assert len(nodes) == 2
    assert comp[5] != comp[9]


def test_mention_keys_namespaces():
    t = _mentions_table(
        [{"mid": 0, "name": "X", "attrs": {"name": "X", "email": "e@a.com",
                                           "aliases": ["Y", "Z"]}}]
    )
    from knowledgegraph_ray.stages.canonicalize import mention_key_strings

    keys, _ = mention_key_strings(t)
    assert any("\x1eemails\x1ee@a.com" in k for k in keys)
    assert any("\x1ename\x1ex" in k for k in keys)
    # alias values land in the aliases namespace, never the name namespace
    assert any("\x1ealiases\x1ey" in k for k in keys)
    assert not any("\x1ename\x1ey" in k for k in keys)


def test_transform_attributes_mapping():
    out = transform_attributes(
        "Person",
        {"name": "X", "email": "e@a.com", "description": "d", "unknown_field": "v"},
    )
    assert out["emails"] == ["e@a.com"]
    assert out["rawDescriptions"] == ["d"]
    assert "unknown_field" not in out  # dropped like kuzu_db_handler.py:153-168


def test_connected_components_three_paths_agree():
    """Driver vectorized propagation, two-level contraction, and the star-loop
    fallback must emit identical labels (comp = min mid of component)."""
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.canonicalize import connected_components

    # chain 0-1-2, pair 10-11, hub key shared by 20..24, singleton 30
    pairs = [
        ("k1", 0), ("k1", 1), ("k2", 1), ("k2", 2),
        ("k3", 10), ("k3", 11),
        ("hub", 20), ("hub", 21), ("hub", 22), ("hub", 23), ("hub", 24),
        ("solo", 30),
    ]
    t = pa.table({"key": [k for k, _ in pairs],
                  "mid": pa.array([m for _, m in pairs], pa.int64())})

    def labels(**kw):
        ds = rd.from_arrow(t)
        out = {r["mid"]: r["comp"]
               for r in connected_components(ds, num_partitions=2, **kw).take_all()}
        for m in {m for _, m in pairs}:
            out.setdefault(m, m)  # absent rows = singleton (attach fills)
        return out

    driver = labels(driver_threshold=10**9)
    twolevel = labels(driver_threshold=0)
    starloop = labels(driver_threshold=0, edge_driver_threshold=0)
    expected = {0: 0, 1: 0, 2: 0, 10: 10, 11: 10,
                20: 20, 21: 20, 22: 20, 23: 20, 24: 20, 30: 30}
    assert driver == expected
    assert twolevel == expected
    assert starloop == expected


def test_mention_keys_fast_matches_python_path(ray_session):
    """The vectorized pair generator must emit exactly the same
    (kh, kl, mid) pair set as the per-row Python path, including list
    fields, empties, whitespace, nulls and missing attributes."""
    import json

    import pyarrow as pa

    from knowledgegraph_ray.stages.canonicalize import (
        mention_keys,
        mention_keys_fast,
    )

    rows = [
        {"mid": 1, "entity_type": "Person",
         "attributes_json": json.dumps({"name": "  Ada  ", "email": "A@x.io",
                                        "aliases": ["Lady A", " ada "]})},
        {"mid": 2, "entity_type": "Person",
         "attributes_json": json.dumps({"name": "", "alias": "nick",
                                        "emails": ["b@x.io", ""]})},
        {"mid": 3, "entity_type": "Organization",
         "attributes_json": json.dumps({"name": "Acme", "domain": "acme.io"})},
        {"mid": 4, "entity_type": "Repository",
         "attributes_json": json.dumps({"url": "https://g/x", "name": None})},
        {"mid": 5, "entity_type": "Issue", "attributes_json": ""},
        {"mid": 6, "entity_type": "Team", "attributes_json": None},
        {"mid": 7, "entity_type": "Topic",
         "attributes_json": json.dumps({"name": "Graphs", "aliases": []})},
    ]
    batch = pa.Table.from_pylist(rows, schema=pa.schema(
        [("mid", pa.int64()), ("entity_type", pa.string()),
         ("attributes_json", pa.string())]))
    slow = mention_keys(batch)
    fast = mention_keys_fast(batch)
    key = lambda t: sorted(zip(t.column("kh").to_pylist(),
                               t.column("kl").to_pylist(),
                               t.column("mid").to_pylist()))
    assert key(slow) == key(fast)
    assert len(key(slow)) > 0


def test_mention_keys_fast_falls_back_on_odd_shapes(ray_session):
    """List-valued scalar field / numeric values defeat the fixed decode
    dtype; the fast path must return the Python path's answer, not raise."""
    import json

    import pyarrow as pa

    from knowledgegraph_ray.stages.canonicalize import (
        mention_keys,
        mention_keys_fast,
    )

    rows = [
        {"mid": 1, "entity_type": "Person",
         "attributes_json": json.dumps({"name": ["ListName", "Second"]})},
        {"mid": 2, "entity_type": "Issue",
         "attributes_json": json.dumps({"id": 42, "name": "Issue 42"})},
    ]
    batch = pa.Table.from_pylist(rows, schema=pa.schema(
        [("mid", pa.int64()), ("entity_type", pa.string()),
         ("attributes_json", pa.string())]))
    slow = mention_keys(batch)
    fast = mention_keys_fast(batch)
    key = lambda t: sorted(zip(t.column("kh").to_pylist(),
                               t.column("kl").to_pylist(),
                               t.column("mid").to_pylist()))
    assert key(slow) == key(fast)


def test_merge_component_block_matches_row_reducer(ray_session):
    """Block reducer == per-group row reducer (aliases overflow, attr JSON,
    permissions union, shuffled mids)."""
    import numpy as np

    from knowledgegraph_ray.stages.canonicalize import (
        NODES_SCHEMA,
        merge_component_block,
        merge_component_row,
    )

    rows = []
    for g in range(4):
        for i in range(3):
            rows.append({
                "mid": g * 10 + (2 - i),  # descending within group
                "url": f"u{i}",
                "ord": g * 10 + (2 - i),
                "entity_name": f"Entity {g}" if i == 0 else f"Alias {g}-{i}",
                "entity_type": "Person",
                "attributes_json": (
                    '{"name": "Entity %d", "description": ["d%d"], '
                    '"emails": ["e%d@x.com"]}' % (g, i, i)
                ),
                "permissions_json": '["grp1"]' if i else '["grp0"]',
                "comp": g,
            })
    tbl = pa.Table.from_pylist(rows)
    starts = np.arange(0, 12, 3)
    run_id = np.repeat(np.arange(4), 3)
    mids = tbl.column("mid").to_numpy(zero_copy_only=False)
    order = np.lexsort((mids, run_id))
    got = merge_component_block(tbl.take(pa.array(order, pa.int64())), starts)
    want = pa.Table.from_pylist(
        [merge_component_row(tbl.slice(s, 3).sort_by("mid")) for s in starts],
        schema=NODES_SCHEMA,
    )
    assert got.equals(want)


def test_merge_reducers_precombined_n_column(ray_session):
    """Reducers accept pre-combined input (exact-dup mentions collapsed to
    one row + multiplicity ``n``, url column dropped) and produce the same
    node as the raw mention sequence — exact-duplicate rows are no-ops for
    every merge step, and n_mentions comes from sum(n)."""
    import numpy as np

    from knowledgegraph_ray.stages.canonicalize import (
        merge_component_block,
        merge_component_row,
    )

    dup_a = {
        "url": "u0", "entity_name": "Acme", "entity_type": "Organization",
        "attributes_json": '{"name": "Acme", "description": ["d"]}',
        "permissions_json": '["g"]', "comp": 0,
    }
    dup_b = {
        "url": "u1", "entity_name": "Acme Corp", "entity_type": "Organization",
        "attributes_json": '{"name": "Acme Corp"}',
        "permissions_json": '["g"]', "comp": 0,
    }
    raw = pa.Table.from_pylist(
        [{**proto, "mid": mid, "ord": mid // 2}
         for mid, proto in [(7, dup_a), (3, dup_b), (5, dup_a), (9, dup_b), (11, dup_a)]]
    )
    combined = pa.Table.from_pylist(
        [
            {k: v for k, v in dup_b.items() if k != "url"} | {"mid": 3, "ord": 1, "n": 2},
            {k: v for k, v in dup_a.items() if k != "url"} | {"mid": 5, "ord": 2, "n": 3},
        ]
    )
    got = merge_component_block(combined, np.array([0])).to_pylist()[0]
    want = merge_component_row(raw.sort_by("mid"))
    assert got == want
    assert got["n_mentions"] == 5


def test_grouped_apply_hash_exchange_equals_sort_exchange(ray_session):
    """exchange='hash' (map/reduce split + per-partition lexsort) must
    produce the same multiset of reduced rows as the range-sort path, at
    several partition counts, including order_col in-run ordering."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.canonicalize import grouped_apply

    rng = np.random.default_rng(17)
    n = 5000
    ks = [f"k{int(v)}" for v in rng.integers(0, 400, n)]
    tbl = pa.table(
        {
            "k": pa.array(ks, pa.string()),
            "ord": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        }
    )
    schema = pa.schema(
        [("k", pa.string()), ("n", pa.int64()), ("first_v", pa.int64())]
    )

    def block_fn(block: pa.Table, starts) -> pa.Table:
        kcol = block.column("k").to_pylist()
        v = block.column("v").to_numpy(zero_copy_only=False)
        starts = list(starts) + [block.num_rows]
        return pa.Table.from_pylist(
            [
                {"k": kcol[s], "n": e - s, "first_v": int(v[s])}
                for s, e in zip(starts[:-1], starts[1:])
            ],
            schema=schema,
        )

    def canon(t: pa.Table):
        return sorted(
            zip(
                t.column("k").to_pylist(),
                t.column("n").to_pylist(),
                t.column("first_v").to_pylist(),
            )
        )

    ds = rd.from_arrow(tbl).repartition(7)
    ref = None
    for P in (1, 3, 16):
        srt = grouped_apply(ds, ["k"], None, schema, num_partitions=P,
                            hash_sort=True, block_fn=block_fn, order_col="ord")
        hsh = grouped_apply(ds, ["k"], None, schema, num_partitions=P,
                            hash_sort=True, block_fn=block_fn, order_col="ord",
                            exchange="hash")
        a = canon(pa.Table.from_pylist(srt.take_all(), schema=schema))
        b = canon(pa.Table.from_pylist(hsh.take_all(), schema=schema))
        assert a == b
        assert len(a) == 400
        if ref is None:
            ref = b
        else:
            assert b == ref  # partition-count invariance of the content


def test_hub_entity_skew_partition_invariant(ray_session):
    """Head-entity skew (north-rule salting concern): one Wikipedia-style hub
    name carries half of all mentions, spread over every partition.  The
    map-side partial min must keep the exchange bounded and the output must
    be byte-identical across partition counts — one hub node aggregating all
    its mentions, tail entities untouched."""
    import json as _json

    from knowledgegraph_ray.stages.canonicalize import canonicalize

    rows = []
    mid = 0
    for i in range(4000):
        rows.append({
            "mid": mid, "name": "Google",
            "type": "Organization",
            "attrs": {"name": "Google", "industry": "tech"},
        })
        mid += 1
        if i % 2 == 0:
            rows.append({
                "mid": mid, "name": f"Tail Entity {i}",
                "type": "Organization",
                "attrs": {"name": f"Tail Entity {i}"},
            })
            mid += 1

    t = _mentions_table(rows)
    baseline = None
    for parts in (1, 4, 16):
        ds = rd.from_arrow(t).repartition(parts)
        nodes, with_comp = canonicalize(ds, num_partitions=4)
        got = sorted(
            (r["name"], r["type"], r["min_ord"]) for r in nodes.take_all()
        )
        hub_comps = {
            r["comp"] for r in with_comp.take_all()
            if r["entity_name"] == "Google"
        }
        assert len(hub_comps) == 1, f"hub split into {len(hub_comps)} comps"
        if baseline is None:
            baseline = got
            assert sum(1 for n, _, _ in got if n == "Google") == 1
            assert len(got) == 1 + 2000   # hub + tails
        else:
            assert got == baseline, f"parts={parts} diverged"

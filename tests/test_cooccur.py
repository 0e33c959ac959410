"""cooccurrence_pairs unit semantics: in-group dedup, a<b canonical order,
hot-group cap, partition invariance."""

from __future__ import annotations

import itertools

import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages.aggregates import cooccurrence_pairs


def _run(rows, **kw):
    ds = rd.from_arrow(pa.table({
        "g": pa.array([r[0] for r in rows], pa.int64()),
        "item": pa.array([r[1] for r in rows], pa.int64()),
    }))
    out = cooccurrence_pairs(
        ds, group_col="g", item_col="item", **kw
    ).take_all()
    return sorted((r["item_a"], r["item_b"], r["n"]) for r in out)


def _brute(rows, cap=None):
    by_g: dict[int, set[int]] = {}
    for g, i in rows:
        by_g.setdefault(g, set()).add(i)
    counts: dict[tuple[int, int], int] = {}
    for items in by_g.values():
        keep = sorted(items)[:cap] if cap else sorted(items)
        for a, b in itertools.combinations(keep, 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return sorted((a, b, n) for (a, b), n in counts.items())


def test_cooccur_dedup_and_order():
    rows = [
        (1, 5), (1, 3), (1, 5), (1, 9),       # dup 5 collapses
        (2, 3), (2, 5),
        (3, 7),                                # singleton: no pairs
        (4, 2), (4, 2),                        # all-dup singleton
    ]
    got = _run(rows)
    assert got == _brute(rows)
    assert got == [(3, 5, 2), (3, 9, 1), (5, 9, 1)]
    assert all(a < b for a, b, _ in got)


def test_cooccur_hot_group_cap():
    rows = [(1, i) for i in range(10)] + [(2, 1), (2, 3)]
    got = _run(rows, max_items_per_group=4)
    # group 1 contributes pairs among its first 4 items only
    assert got == _brute(rows, cap=4)
    assert (0, 1, 1) in got and (0, 9, 1) not in got


@pytest.mark.parametrize("blocks", [1, 5])
def test_cooccur_partition_invariance(blocks):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(int(rng.integers(0, 40)), int(rng.integers(0, 25)))
            for _ in range(600)]
    ds = rd.from_arrow(pa.table({
        "g": pa.array([r[0] for r in rows], pa.int64()),
        "item": pa.array([r[1] for r in rows], pa.int64()),
    })).repartition(blocks)
    out = cooccurrence_pairs(ds, group_col="g", item_col="item").take_all()
    got = sorted((r["item_a"], r["item_b"], r["n"]) for r in out)
    assert got == _brute(rows)


def test_cooccur_uncapped_matches_bruteforce(ray_session):
    # max_items_per_group=None: exact uncapped semantics on a group larger
    # than the default 1024 cap (what the SQL self-join oracles assume).
    import itertools

    n_items = 1500
    t = pa.table({
        "g": pa.array([1] * n_items + [2, 2], pa.int64()),
        "item": pa.array(list(range(n_items)) + [5, 7], pa.int64()),
    })
    out = (
        cooccurrence_pairs(
            rd.from_arrow(t), group_col="g", item_col="item",
            out_a="a", out_b="b", count_col="n",
            max_items_per_group=None, num_partitions=4,
        )
        .to_pandas()
    )
    assert len(out) == n_items * (n_items - 1) // 2
    # pair (5,7) appears in both groups
    assert int(out.set_index(["a", "b"]).loc[(5, 7), "n"]) == 2
    assert (out.drop(out.index[(out.a == 5) & (out.b == 7)])["n"] == 1).all()

"""Bloom-filter build/prefilter/semi-join tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.functions.bloom import (
    bloom_filter_dataset,
    bloom_semi_join,
    build_bloom,
)


def _ds_from(col, name="key", parts=4):
    return rd.from_arrow(pa.table({name: col})).repartition(parts)


def test_bloom_no_false_negatives(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 40, 5_000)
    bloom = build_bloom(_ds_from(pa.array(keys)), ["key"])
    probe = _ds_from(pa.array(keys))  # every probe row IS a member
    out = bloom_filter_dataset(probe, ["key"], bloom)
    assert out.count() == len(keys)  # zero false negatives, ever


def test_bloom_false_positive_rate_bounded(ray_session):
    rng = np.random.default_rng(11)
    members = rng.integers(0, 1 << 30, 10_000)
    bloom = build_bloom(_ds_from(pa.array(members)), ["key"], bits_per_row=12, k=7)
    # disjoint probe range → every accept is a false positive
    probes = rng.integers(1 << 31, 1 << 32, 20_000)
    out = bloom_filter_dataset(_ds_from(pa.array(probes)), ["key"], bloom)
    fp_rate = out.count() / len(probes)
    # nominal ~0.8% at 12 bits/key k=7 (sized on rows ≥ distinct); allow 3×
    assert fp_rate < 0.025, fp_rate


def test_bloom_partition_invariance(ray_session):
    """The bitmap is a pure function of the key set — OR order can't matter."""
    keys = pa.array(np.arange(3_000, dtype=np.int64) * 17)
    probes = _ds_from(pa.array(np.arange(0, 60_000, 7, dtype=np.int64)))
    counts = []
    for parts in (1, 3, 11):
        bloom = build_bloom(_ds_from(keys, parts=parts), ["key"])
        counts.append(bloom_filter_dataset(probes, ["key"], bloom).count())
    assert counts[0] == counts[1] == counts[2]


@pytest.mark.parametrize("bits_per_row", [2, 12])
def test_bloom_semi_join_exact(ray_session, bits_per_row):
    """Composed with the exact join the result equals a plain semi join —
    even at 2 bits/row where the bloom itself passes many false positives."""
    rng = np.random.default_rng(3)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 2_000, 8_000)),
            "v": pa.array(np.arange(8_000, dtype=np.int64)),
        }
    )
    right_keys = np.unique(rng.integers(0, 2_000, 300))
    right = pa.table({"k": pa.array(right_keys)})
    out = bloom_semi_join(
        rd.from_arrow(left).repartition(5),
        rd.from_arrow(right).repartition(2),
        left_keys=["k"],
        bits_per_row=bits_per_row,
    )
    got = sorted(r["v"] for r in out.take_all())
    member = set(right_keys.tolist())
    want = sorted(
        int(v) for k, v in zip(left["k"].to_pylist(), left["v"].to_pylist())
        if k in member
    )
    assert got == want


def test_bloom_string_keys(ray_session):
    members = pa.array([f"url-{i}" for i in range(1_000)])
    bloom = build_bloom(_ds_from(members, name="url", parts=3), ["url"])
    probe = pa.array([f"url-{i}" for i in range(900, 1_100)])
    out = bloom_filter_dataset(_ds_from(probe, name="url"), ["url"], bloom)
    got = set(r["url"] for r in out.take_all())
    assert {f"url-{i}" for i in range(900, 1_000)} <= got  # all members kept
    assert len(got) <= 105  # ≤ ~5 false positives out of 100 non-members


def test_bloom_empty_sides(ray_session):
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    data = _ds_from(pa.array(np.arange(100, dtype=np.int64)), name="k")
    bloom = build_bloom(empty, ["k"])
    assert bloom_filter_dataset(data, ["k"], bloom).count() == 0
    assert bloom_semi_join(data, empty, left_keys=["k"]).count() == 0


def test_full_outer_join_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.functions.joins import full_outer_join

    left = pa.Table.from_pydict(
        {"k": pa.array([1, 2, 3], pa.int64()), "a": pa.array([10, 20, 30], pa.int64())}
    )
    right = pa.Table.from_pydict(
        {"rk": pa.array([2, 3, 4], pa.int64()), "b": pa.array([200, 300, 400], pa.int64())}
    )
    out = full_outer_join(
        rd.from_arrow(left).repartition(2),
        rd.from_arrow(right).repartition(2),
        left_keys=["k"],
        right_keys=["rk"],
    ).take_all()
    got = {r["k"]: (r["a"], r["b"]) for r in out}
    assert got == {
        1: (10, None),
        2: (20, 200),
        3: (30, 300),
        4: (None, 400),
    }

    # one side empty: degenerates to the other side (typed nulls opposite)
    empty = rd.from_arrow(left.slice(0, 0))
    out2 = full_outer_join(
        empty, rd.from_arrow(right), left_keys=["k"], right_keys=["rk"]
    ).take_all()
    assert {r["k"]: (r["a"], r["b"]) for r in out2} == {
        2: (None, 200), 3: (None, 300), 4: (None, 400)
    }


def test_grouped_topk_matches_row_number_semantics(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.aggregates import grouped_topk

    rng = np.random.default_rng(11)
    n = 30_000
    # hot group + tail, heavy value ties to exercise the tiebreak
    grp = np.where(rng.random(n) < 0.4, 0, rng.integers(1, 500, n))
    val = rng.integers(0, 20, n).astype(np.int64)
    tag = np.array([f"t{int(x):04d}" for x in rng.integers(0, 10_000, n)])
    t = pa.Table.from_pydict(
        {"g": pa.array([f"g{int(x)}" for x in grp]),
         "v": pa.array(val), "tag": pa.array(tag)}
    )
    # reference: exact row_number() semantics
    import duckdb
    want = duckdb.connect().execute(
        """SELECT g, v, tag FROM t
           QUALIFY row_number() OVER (
             PARTITION BY g ORDER BY v DESC, tag) <= 7"""
    ).df()
    want_set = set(map(tuple, want.itertuples(index=False)))
    for parts in (1, 4, 16):
        ds = rd.from_arrow(t).repartition(parts)
        out = grouped_topk(
            ds, ["g"], value_col="v", tiebreak_cols=["tag"], k=7
        ).take_all()
        got = {(r["g"], r["v"], r["tag"]) for r in out}
        # rows with fully-equal (g, v, tag) are interchangeable; compare sets
        assert got == want_set, f"parts={parts}"

"""Property tests for skyline_2d and mutual_nn_pairs: exact agreement with
O(n²) brute-force references, across partition counts (the reducers must be
partition-invariant like every combiner in this repo)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _brute_skyline_ids(ids, mn, mx):
    keep = set()
    n = len(mn)
    for i in range(n):
        dominated = any(
            mn[j] <= mn[i] and mx[j] >= mx[i]
            and (mn[j] < mn[i] or mx[j] > mx[i])
            for j in range(n)
        )
        if not dominated:
            keep.add(int(ids[i]))
    return keep


@pytest.mark.parametrize("nparts", [1, 3, 7])
def test_skyline_matches_bruteforce(ray_session, nparts):
    from knowledgegraph_ray.stages.aggregates import skyline_2d

    rng = np.random.default_rng(42)
    n = 400
    mn = rng.integers(0, 40, n).astype(np.float64)  # heavy ties on purpose
    mx = rng.integers(0, 40, n).astype(np.int32)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"id": ids, "mn": mn, "mx": mx})
    ).repartition(nparts)
    out = skyline_2d(ds, min_col="mn", max_col="mx", id_cols=["id"]).to_pandas()
    assert set(out["id"].tolist()) == _brute_skyline_ids(ids, mn, mx)
    # survivors carry their original columns intact
    assert sorted(out.columns) == ["id", "mn", "mx"]


def test_skyline_keeps_equal_duplicates(ray_session):
    from knowledgegraph_ray.stages.aggregates import skyline_2d

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "mn": pa.array([1.0, 1.0, 2.0, 0.5], pa.float64()),
        "mx": pa.array([10, 10, 10, 3], pa.int32()),
    })
    out = skyline_2d(
        rd.from_arrow(t).repartition(2), min_col="mn", max_col="mx",
        id_cols=["id"],
    ).to_pandas()
    # ids 1 and 2 are exact duplicates (mutually non-dominating: both stay);
    # 3 is dominated by them (same mx, larger mn); 4 survives (smaller mn).
    assert set(out["id"].tolist()) == {1, 2, 4}


@pytest.mark.parametrize("block_rows", [16, 1000])
def test_mutual_nn_matches_bruteforce(ray_session, block_rows):
    from knowledgegraph_ray.stages.knn import mutual_nn_pairs

    rng = np.random.default_rng(7)
    na, nb, d = 60, 45, 8
    A = rng.standard_normal((na, d))
    B = rng.standard_normal((nb, d))
    ids_a = np.arange(na, dtype=np.int64) * 3       # non-contiguous ids
    ids_b = np.arange(nb, dtype=np.int64) * 3 + 1

    def mk(ids, M, nparts):
        return rd.from_arrow(pa.table({
            "vec_id": ids,
            "embedding": [list(map(float, r)) for r in M],
        })).repartition(nparts)

    An = A / np.linalg.norm(A, axis=1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    S = An @ Bn.T
    b_of_a = S.argmax(axis=1)
    a_of_b = S.argmax(axis=0)
    want = {
        (int(ids_a[i]), int(ids_b[int(b_of_a[i])]))
        for i in range(na)
        if int(a_of_b[int(b_of_a[i])]) == i
    }
    assert want, "degenerate fixture: no mutual pairs"

    out = mutual_nn_pairs(
        mk(ids_a, A, 3), mk(ids_b, B, 2), target_block_rows=block_rows
    ).to_pandas()
    got = {(int(r.id_a), int(r.id_b)) for r in out.itertuples()}
    assert got == want
    # reported cosine is the floored true pair cosine
    by_pair = {(int(r.id_a), int(r.id_b)): r.cos_r for r in out.itertuples()}
    for (ia, ib), cr in by_pair.items():
        c = float(S[ia // 3, (ib - 1) // 3])
        assert cr == np.floor(c * 10000.0) / 10000.0


def test_skyline_int64_above_2_53_exact(ray_session):
    # ADVICE r3: max_col comparisons must stay in native int64 — a float64
    # cast collapses 2**53 and 2**53+1 and can flip dominance.
    from knowledgegraph_ray.stages.aggregates import skyline_2d

    big = 2**53
    t = pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "mn": pa.array([1, 2, 3], pa.int64()),
        # id=1 strictly beats id=0's max by 1 ulp-below-float-resolution;
        # id=2 ties id=1's max so it is dominated (mn larger, mx not greater)
        "mx": pa.array([big, big + 1, big + 1], pa.int64()),
    })
    out = skyline_2d(
        rd.from_arrow(t), min_col="mn", max_col="mx", id_cols=["id"]
    ).to_pandas()
    assert sorted(out["id"].tolist()) == [0, 1]

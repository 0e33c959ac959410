"""Unit tests for the temporal join operators (stages/temporal.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages.temporal import asof_join, range_join

US = 1_000_000


def _ts(sec: int) -> int:
    return sec * US


def _events(rows, num_blocks=1):
    t = pa.Table.from_pylist(
        [
            {"event_id": r[0], "user_id": r[1], "ts": _ts(r[2])}
            for r in rows
        ],
        schema=pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()),
             ("ts", pa.timestamp("us"))]
        ),
    )
    ds = rd.from_arrow(t)
    return ds.repartition(num_blocks) if num_blocks > 1 else ds


def _orders(rows):
    return rd.from_arrow(
        pa.Table.from_pylist(
            [
                {"o_custkey": r[0], "o_orderdate": _ts(r[1]), "o_orderkey": r[2],
                 "o_price_cents": r[3]}
                for r in rows
            ],
            schema=pa.schema(
                [("o_custkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
                 ("o_orderkey", pa.int64()), ("o_price_cents", pa.int64())]
            ),
        )
    )


def _asof_rows(left, right):
    out = asof_join(
        left, right,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_price_cents"], right_order="o_orderkey",
    )
    return {r["event_id"]: (r["o_orderkey"], r["o_price_cents"])
            for r in out.take_all()}


@pytest.mark.usefixtures("ray_session")
def test_asof_basic_latest_at_or_before():
    left = _events([(1, 7, 100), (2, 7, 250), (3, 7, 50)])
    right = _orders([(7, 100, 11, 1000), (7, 200, 12, 2000), (7, 300, 13, 3000)])
    got = _asof_rows(left, right)
    # event 1 at t=100: order at exactly t=100 qualifies (inclusive)
    assert got[1] == (11, 1000)
    # event 2 at t=250: latest <= 250 is t=200
    assert got[2] == (12, 2000)
    # event 3 at t=50: nothing at or before → nulls
    assert got[3] == (None, None)


@pytest.mark.usefixtures("ray_session")
def test_asof_tie_on_right_ts_takes_max_order():
    left = _events([(1, 7, 500)])
    right = _orders([(7, 400, 21, 100), (7, 400, 23, 300), (7, 400, 22, 200)])
    got = _asof_rows(left, right)
    assert got[1] == (23, 300)


@pytest.mark.usefixtures("ray_session")
def test_asof_key_isolation_across_runs():
    """A left row must never pick up a right row from a different key, even
    though the fill accumulator runs globally across key runs."""
    left = _events([(1, 1, 100), (2, 2, 100)])
    right = _orders([(1, 50, 31, 111)])  # only user 1 has history
    got = _asof_rows(left, right)
    assert got[1] == (31, 111)
    assert got[2] == (None, None)


@pytest.mark.usefixtures("ray_session")
def test_asof_multiblock_matches_singleblock():
    rng = np.random.default_rng(7)
    left = [(i, int(rng.integers(0, 5)), int(rng.integers(0, 1000))) for i in range(200)]
    right = [(k, int(rng.integers(0, 1000)), 1000 + j, j)
             for j, k in enumerate(rng.integers(0, 5, size=80).tolist())]
    a = _asof_rows(_events(left), _orders(right))
    b = _asof_rows(_events(left, num_blocks=7), _orders(right))
    assert a == b
    assert len(a) == 200


@pytest.mark.usefixtures("ray_session")
def test_range_join_bounds_and_strictness():
    ds = _events([
        (1, 7, 0), (2, 7, 0),      # equal ts: never pair (strict >)
        (3, 7, 30), (4, 7, 60),    # within 60s of event 1/2/3 chains
        (5, 7, 121),               # 121 > 60+60 → only pairs with 4? 121-60=61 > 60 → none
    ])
    out = range_join(ds, key="user_id", ts="ts", id_col="event_id", width_us=60 * US)
    pairs = {(r["id_a"], r["id_b"]): r["gap_us"] for r in out.take_all()}
    assert (1, 2) not in pairs and (2, 1) not in pairs
    assert pairs[(1, 3)] == 30 * US and pairs[(2, 3)] == 30 * US
    assert pairs[(1, 4)] == 60 * US  # boundary inclusive
    assert (3, 5) not in pairs  # 91s gap > 60s
    assert set(pairs) == {(1, 3), (2, 3), (1, 4), (2, 4), (3, 4)}


@pytest.mark.usefixtures("ray_session")
def test_range_join_runs_with_restarting_timestamps():
    """Key runs restart at lower timestamps — the global searchsorted must
    not leak matches across keys (monotonized-shift correctness)."""
    ds = _events([
        (1, 1, 1000), (2, 1, 1010),
        (3, 2, 5), (4, 2, 15),      # ts restarts far below key 1's run
    ])
    out = range_join(ds, key="user_id", ts="ts", id_col="event_id", width_us=60 * US)
    pairs = {(r["id_a"], r["id_b"]) for r in out.take_all()}
    assert pairs == {(1, 2), (3, 4)}


@pytest.mark.usefixtures("ray_session")
def test_range_join_matches_bruteforce_multiblock():
    rng = np.random.default_rng(11)
    rows = [(i, int(rng.integers(0, 4)), int(rng.integers(0, 500)))
            for i in range(150)]
    # make ids with equal (user, ts) possible to exercise determinism
    out = range_join(
        _events(rows, num_blocks=5), key="user_id", ts="ts",
        id_col="event_id", width_us=40 * US,
    )
    got = {(r["id_a"], r["id_b"], r["gap_us"]) for r in out.take_all()}
    want = set()
    for (ia, ua, ta) in rows:
        for (ib, ub, tb) in rows:
            if ua == ub and _ts(tb) > _ts(ta) and _ts(tb) <= _ts(ta) + 40 * US:
                want.add((ia, ib, _ts(tb) - _ts(ta)))
    assert got == want


# ---------------------------------------------------------------------------
# Window operators (stages/windows.py): rolling range sum, top-n per group
# ---------------------------------------------------------------------------


def _valued_events(rows, num_blocks=1):
    t = pa.Table.from_pylist(
        [
            {"event_id": r[0], "user_id": r[1], "ts": _ts(r[2]), "v": r[3]}
            for r in rows
        ],
        schema=pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()),
             ("ts", pa.timestamp("us")), ("v", pa.int64())]
        ),
    )
    ds = rd.from_arrow(t)
    return ds.repartition(num_blocks) if num_blocks > 1 else ds


@pytest.mark.usefixtures("ray_session")
def test_rolling_sum_range_frame_includes_equal_ts_peers():
    from knowledgegraph_ray.stages.windows import rolling_range_sum

    ds = _valued_events([
        (1, 7, 0, 10), (2, 7, 0, 20),   # equal ts: RANGE frame includes both
        (3, 7, 30, 5),                   # covers t in [-30, 30] → all three
        (4, 7, 100, 1),                  # covers [70, 100] → itself only
    ])
    out = rolling_range_sum(ds, key_col="user_id", ts_col="ts",
                            value_col="v", id_col="event_id", width_us=30 * US)
    got = {r["event_id"]: r["roll_sum"] for r in out.take_all()}
    assert got == {1: 30, 2: 30, 3: 35, 4: 1}


@pytest.mark.usefixtures("ray_session")
def test_rolling_sum_key_isolation_with_restarting_ts():
    from knowledgegraph_ray.stages.windows import rolling_range_sum

    ds = _valued_events([
        (1, 1, 1000, 100), (2, 1, 1010, 1),
        (3, 2, 1005, 7),    # inside user 1's window range but another key
    ])
    out = rolling_range_sum(ds, key_col="user_id", ts_col="ts",
                            value_col="v", id_col="event_id", width_us=60 * US)
    got = {r["event_id"]: r["roll_sum"] for r in out.take_all()}
    assert got == {1: 100, 2: 101, 3: 7}


@pytest.mark.usefixtures("ray_session")
def test_rolling_sum_matches_bruteforce_multiblock():
    from knowledgegraph_ray.stages.windows import rolling_range_sum

    rng = np.random.default_rng(3)
    rows = [(i, int(rng.integers(0, 4)), int(rng.integers(0, 300)),
             int(rng.integers(-50, 50))) for i in range(120)]
    out = rolling_range_sum(_valued_events(rows, num_blocks=5),
                            key_col="user_id", ts_col="ts", value_col="v",
                            id_col="event_id", width_us=25 * US)
    got = {r["event_id"]: r["roll_sum"] for r in out.take_all()}
    want = {}
    for (i, u, t, v) in rows:
        want[i] = sum(v2 for (_, u2, t2, v2) in rows
                      if u2 == u and _ts(t) - 25 * US <= _ts(t2) <= _ts(t))
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_topn_per_group_rank_and_ties():
    from knowledgegraph_ray.stages.windows import topn_per_group

    t = pa.Table.from_pylist([
        {"k": 1, "score": 50, "oid": 3},
        {"k": 1, "score": 70, "oid": 1},
        {"k": 1, "score": 70, "oid": 2},   # tie on score: oid asc breaks it
        {"k": 1, "score": 60, "oid": 4},
        {"k": 2, "score": 10, "oid": 5},
    ])
    out = topn_per_group(rd.from_arrow(t).repartition(3), key_col="k",
                         order_col="score", n=3, descending=True,
                         tiebreak_col="oid")
    rows = {(r["k"], r["rn"]): r["oid"] for r in out.take_all()}
    assert rows == {(1, 1): 1, (1, 2): 2, (1, 3): 4, (2, 1): 5}


def test_hopping_counts_window_membership(ray_session):
    """An event at t belongs to exactly width/hop windows [s, s+width) with
    s on the hop grid, including exact-boundary timestamps."""
    import datetime

    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.windows import hopping_counts

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        base,                                   # exactly on a 15-min boundary
        base + datetime.timedelta(minutes=7),   # mid-hop
        base + datetime.timedelta(minutes=59, seconds=59),
    ]
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(rows, pa.timestamp("us")),
        "event_type": pa.array(["a"] * len(rows)),
    }))
    got = {(r["window_us"], r["event_type"]): r["n"]
           for r in hopping_counts(ds, width_minutes=60, hop_minutes=15).take_all()}
    hop = 15 * 60 * 1_000_000
    width = 60 * 60 * 1_000_000
    # brute-force reference
    want: dict = {}
    for t in rows:
        t_us = int(t.timestamp() * 1_000_000)
        k = t_us // hop
        for j in range(4):
            s = (k - j) * hop
            assert s <= t_us < s + width
            want[(s, "a")] = want.get((s, "a"), 0) + 1
    assert got == want


def test_asof_join_forward_direction(ray_session):
    """Forward as-of: earliest right row with right_ts >= left_ts; ties by
    max right_order; no-future-row keeps nulls."""
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.temporal import asof_join

    left = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([10, 10, 10, 20], pa.int64()),
        "ts": pa.array([5, 11, 30, 5], pa.int64()),
    })
    right = pa.table({
        "k": pa.array([10, 10, 10, 10, 20], pa.int64()),
        "rts": pa.array([10, 10, 20, 25, 3], pa.int64()),
        "ordc": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "val": pa.array([100, 200, 300, 400, 500], pa.int64()),
    })
    out = asof_join(
        rd.from_arrow(left).repartition(2),
        rd.from_arrow(right).repartition(2),
        left_key="k", right_key="k", left_ts="ts", right_ts="rts",
        right_cols=["val"], right_order="ordc", direction="forward",
    ).take_all()
    got = {r["id"]: r["val"] for r in out}
    # id 1: ts=5 -> earliest rts>=5 is 10 (tie: ordc 2 wins) -> 200
    # id 2: ts=11 -> rts 20 -> 300;  id 3: ts=30 -> none -> None
    # id 4 (k=20): ts=5 -> rts 3 is in the past -> None
    assert got == {1: 200, 2: 300, 3: None, 4: None}


# ---------------------------------------------------------------------------
# interval_coverage
# ---------------------------------------------------------------------------


def _brute_coverage(rows):
    """rows: (key, s, e).  Classic sort-and-merge island oracle."""
    by_k: dict[int, list[tuple[int, int]]] = {}
    for k, s, e in rows:
        by_k.setdefault(k, []).append((s, e))
    out = {}
    for k, iv in by_k.items():
        iv.sort()
        islands = []
        for s, e in iv:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        out[k] = (
            len(islands),
            sum(e - s for s, e in islands),
            islands[0][0],
            max(e for _, e in islands),
        )
    return out


@pytest.mark.parametrize("blocks", [1, 4])
def test_interval_coverage_matches_brute(blocks):
    import numpy as np
    import ray.data as rd

    from knowledgegraph_ray.stages.temporal import interval_coverage

    rng = np.random.default_rng(11)
    rows = []
    for _ in range(800):
        k = int(rng.integers(0, 30))
        s = int(rng.integers(0, 500))
        rows.append((k, s, s + int(rng.integers(0, 40))))
    # exact-touch and zero-length edge cases
    rows += [(99, 0, 10), (99, 10, 20), (99, 21, 21), (99, 21, 21), (99, 30, 30)]
    ds = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "s": pa.array([r[1] for r in rows], pa.int64()),
        "e": pa.array([r[2] for r in rows], pa.int64()),
    })).repartition(blocks)
    got = {
        r["k"]: (r["n_islands"], r["covered"], r["first_start"], r["last_end"])
        for r in interval_coverage(
            ds, key_col="k", start_col="s", end_col="e"
        ).take_all()
    }
    assert got == _brute_coverage(rows)
    # touching intervals merged, zero-length islands counted
    assert got[99] == (3, 20, 0, 30)


def test_segmented_cummax():
    import numpy as np

    from knowledgegraph_ray.stages.temporal import _segmented_cummax

    rng = np.random.default_rng(3)
    for n in (1, 2, 7, 1000):
        runs = np.sort(rng.integers(0, max(1, n // 5), n))
        x = rng.integers(-50, 50, n)
        want = x.copy()
        for i in range(1, n):
            if runs[i] == runs[i - 1]:
                want[i] = max(want[i], want[i - 1])
        assert (_segmented_cummax(x, runs) == want).all()

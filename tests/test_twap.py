"""grouped_twap (stages/windows.py): per-key time-weighted average.

Oracle strategy: brute-force pandas per-key scan over the SAME
(ts, event_id) total order — Δt in whole epoch seconds to the next row,
exact int64 numerator and span, one float division; zero-span keys → NULL.
Partition invariance: the key-only range sort colocates full-key ties, so
any repartition width must yield the identical table.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages.windows import grouped_twap


def _make(n=3000, keys=23, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    ts_us = rng.integers(0, 10_000, n) * 1_000_000 + rng.integers(0, 1_000_000, n)
    return pa.table({
        "user_id": pa.array(rng.integers(0, keys, n), pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(-500, 500, n), pa.int64()),
    })


def _brute(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    rows = []
    for k, g in df.groupby("user_id"):
        ts_s = (g["ts"].astype("int64") // 1_000_000).to_numpy()
        v = g["v"].to_numpy()
        span = int(ts_s[-1] - ts_s[0])
        if span == 0:
            rows.append((k, None))
            continue
        dt = np.zeros(len(g), np.int64)
        dt[:-1] = ts_s[1:] - ts_s[:-1]
        rows.append((k, float((v * dt).sum()) / float(span)))
    return pd.DataFrame(rows, columns=["user_id", "twap"])


@pytest.mark.parametrize("nparts", [1, 3, 8])
def test_twap_matches_bruteforce_any_partitioning(ray_session, nparts):
    t = _make()
    got = (
        grouped_twap(
            rd.from_arrow(t).repartition(nparts),
            key_col="user_id", ts_col="ts",
            order_cols=["ts", "event_id"], value_col="v",
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    want = _brute(t).sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["user_id"] == want["user_id"]).all()
    gn, wn = got["twap"].isna(), want["twap"].isna()
    assert (gn == wn).all()
    assert np.array_equal(
        got["twap"][~gn].to_numpy(), want["twap"][~wn].to_numpy()
    )


def test_twap_single_event_and_zero_span_are_null(ray_session):
    t = pa.table({
        "user_id": pa.array([1, 2, 2, 3, 3], pa.int64()),
        "ts": pa.array(
            [5_000_000, 7_000_000, 7_900_000, 1_000_000, 9_000_000],
            pa.timestamp("us"),
        ),  # user 2: both events inside ONE epoch second -> span 0
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 60], pa.int64()),
    })
    got = (
        grouped_twap(
            rd.from_arrow(t), key_col="user_id", ts_col="ts",
            order_cols=["ts", "event_id"], value_col="v",
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert got["twap"].isna().tolist() == [True, True, False]
    # user 3: 40 * (9-1) / (9-1) = 40.0
    assert got["twap"].iloc[2] == 40.0

def test_twap_all_null_values_yield_null(ray_session):
    # ADVICE r3: a key whose values are ALL NULL (nonzero span) must emit
    # NULL (SQL SUM over zero non-null terms), not 0.0; NULLs inside a
    # mixed key contribute 0 to the numerator (SUM skips null terms).
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        "ts": pa.array(
            [1_000_000, 3_000_000, 5_000_000,
             1_000_000, 2_000_000, 5_000_000],
            pa.timestamp("us"),
        ),
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array([None, None, None, 10, None, 99], pa.int64()),
    })
    got = (
        grouped_twap(
            rd.from_arrow(t), key_col="user_id", ts_col="ts",
            order_cols=["ts", "event_id"], value_col="v",
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert got["twap"].isna().tolist() == [True, False]
    # user 2: 10*(2-1) + NULL-term-skipped + (last row no term) over span 4
    assert got["twap"].iloc[1] == 10.0 / 4.0


def test_twap_null_timestamp_rejected(ray_session):
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([1_000_000, None], pa.timestamp("us")),
        "event_id": pa.array([0, 1], pa.int64()),
        "v": pa.array([1, 2], pa.int64()),
    })
    with pytest.raises(Exception, match="non-null"):
        grouped_twap(
            rd.from_arrow(t), key_col="user_id", ts_col="ts",
            order_cols=["ts", "event_id"], value_col="v",
        ).materialize()

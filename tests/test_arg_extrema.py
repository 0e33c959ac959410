"""grouped_arg_extrema (stages/aggregates.py): FIRST_VALUE + LAST_VALUE +
COUNT per key in one map-side-combined pass.

Oracle strategy: DuckDB window functions over the (order, tiebreak) total
order — the tiebreak is unique so both engines must pick the identical row
under ANY partitioning; the combine is associative, so the small zero-CPU
path and the hash-exchange path must return identical tables.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages import aggregates
from knowledgegraph_ray.stages.aggregates import grouped_arg_extrema


def _make(n=4000, keys=37, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, keys, n), pa.int64()),
        "ord": pa.array(rng.integers(0, 500, n), pa.int64()),  # heavy ties
        "id": pa.array(np.arange(n), pa.int64()),
        "pay": pa.array([f"v{v}" for v in rng.integers(0, 9, n)]),
    })


def _oracle(tbl: pa.Table):
    con = duckdb.connect()
    con.register("t", tbl)
    return con.execute("""
        WITH w AS (
          SELECT k, pay, ord,
            row_number() OVER (PARTITION BY k ORDER BY ord, id) rn_a,
            row_number() OVER (PARTITION BY k ORDER BY ord DESC, id DESC) rn_d,
            count(*) OVER (PARTITION BY k) n
          FROM t)
        SELECT k,
          max(CASE WHEN rn_a = 1 THEN ord END) AS first_ord,
          max(CASE WHEN rn_a = 1 THEN pay END) AS first_pay,
          max(CASE WHEN rn_d = 1 THEN ord END) AS last_ord,
          max(CASE WHEN rn_d = 1 THEN pay END) AS last_pay,
          CAST(max(n) AS BIGINT) AS n_rows
        FROM w GROUP BY k ORDER BY k
    """).df()


def _run(tbl: pa.Table, parallelism: int):
    ds = rd.from_arrow(tbl).repartition(parallelism)
    out = grouped_arg_extrema(
        ds, key_col="k", order_col="ord", tiebreak_col="id",
        payload_col="pay",
    )
    return out.to_pandas().sort_values("k").reset_index(drop=True)


@pytest.mark.parametrize("parallelism", [1, 3, 16])
def test_matches_window_oracle_any_partitioning(ray_session, parallelism):
    tbl = _make()
    got = _run(tbl, parallelism)
    want = _oracle(tbl).reset_index(drop=True)
    assert got.columns.tolist() == want.columns.tolist()
    for c in got.columns:
        assert (got[c] == want[c]).all(), c


def test_large_path_equals_small_path(ray_session, monkeypatch):
    tbl = _make(n=2500, keys=11, seed=13)
    small = _run(tbl, 4)
    monkeypatch.setattr(aggregates, "_SMALL_COMBINE_ROWS", 0)
    large = _run(tbl, 4)
    assert small.equals(large)


def test_empty_input_typed_empty(ray_session):
    tbl = _make(n=0)
    ds = rd.from_arrow(tbl)
    out = grouped_arg_extrema(
        ds, key_col="k", order_col="ord", tiebreak_col="id",
        payload_col="pay",
    )
    # Ray's to_pandas() drops columns on a fully-empty dataset — assert on
    # the Dataset schema (what a downstream stage would consume)
    assert out.count() == 0
    assert out.schema().names == [
        "k", "first_ord", "first_pay", "last_ord", "last_pay", "n_rows",
    ]

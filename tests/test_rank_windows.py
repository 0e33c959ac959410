"""grouped_rank (stages/windows.py): RANK / DENSE_RANK / NTILE / running
sum in one colocated pass.

Oracle strategy: DuckDB window functions over the identical frame spec —
rank/dense_rank are tie-insensitive, ntile and the running sum use the
(value, id) total order with a ROWS frame, so every cell is deterministic
and must match bit-for-bit under any partitioning.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages.windows import grouped_rank


def _oracle(tbl: pa.Table, k: int) -> dict:
    con = duckdb.connect()
    con.register("t", tbl)
    df = con.execute(f"""
        SELECT id,
               RANK()       OVER (PARTITION BY k ORDER BY v) AS rnk,
               DENSE_RANK() OVER (PARTITION BY k ORDER BY v) AS drnk,
               NTILE({k})   OVER (PARTITION BY k ORDER BY v, id) AS tile,
               SUM(v)       OVER (PARTITION BY k ORDER BY v, id
                                  ROWS UNBOUNDED PRECEDING) AS run_sum
        FROM t
    """).df()
    return {
        int(r.id): (int(r.rnk), int(r.drnk), int(r.tile), int(r.run_sum))
        for r in df.itertuples()
    }


def _run(tbl: pa.Table, k: int, parallelism: int) -> dict:
    ds = rd.from_arrow(tbl).repartition(parallelism)
    out = grouped_rank(
        ds, key_col="k", value_col="v", id_col="id", ntile_k=k
    ).take_all()
    return {
        int(r["id"]): (r["rnk"], r["drnk"], r["tile"], r["run_sum"])
        for r in out
    }


@pytest.mark.parametrize("parallelism", [1, 9])
def test_grouped_rank_matches_duckdb(ray_session, parallelism):
    rng = np.random.default_rng(11)
    n = 4_000
    tbl = pa.Table.from_pydict({
        # hot key holds half the rows; values drawn from a tiny domain so
        # tie runs are long (rank vs dense_rank diverge hard)
        "k": pa.array(np.where(rng.random(n) < 0.5, 0, rng.integers(1, 8, n))
                      .astype(np.int64)),
        "v": pa.array(rng.integers(-5, 6, n), pa.int64()),
        "id": pa.array(np.arange(n, dtype=np.int64)),
    })
    assert _run(tbl, 4, parallelism) == _oracle(tbl, 4)


def test_grouped_rank_small_partitions(ray_session):
    # groups smaller than ntile_k (size-0 buckets), singleton groups, and
    # an all-ties group
    tbl = pa.Table.from_pydict({
        "k": pa.array([0, 0, 1, 2, 2, 2, 2, 2], pa.int64()),
        "v": pa.array([7, 7, 3, 1, 1, 1, 1, 1], pa.int64()),
        "id": pa.array(list(range(8)), pa.int64()),
    })
    assert _run(tbl, 4, 3) == _oracle(tbl, 4)


def test_grouped_string_agg_order_and_ties(ray_session):
    """Ordered concat must respect the full (order_cols) order across
    partition boundaries, including duplicate order values (tiebreak col)."""
    import duckdb

    from knowledgegraph_ray.stages.windows import grouped_string_agg

    rng = np.random.default_rng(5)
    n = 1_200
    tbl = pa.Table.from_pydict({
        "k": pa.array(rng.integers(0, 9, n), pa.int64()),
        "v": pa.array([f"s{x}" for x in rng.integers(0, 4, n)], pa.string()),
        "o1": pa.array(rng.integers(0, 10, n), pa.int64()),  # heavy ties
        "o2": pa.array(np.arange(n), pa.int64()),            # unique tiebreak
    })
    got = grouped_string_agg(
        rd.from_arrow(tbl).repartition(7),
        key_col="k", value_col="v", order_cols=["o1", "o2"],
        sep=",", out_col="j",
    ).take_all()
    got_m = {r["k"]: r["j"] for r in got}
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute(
        "SELECT k, string_agg(v, ',' ORDER BY o1, o2) AS j FROM t GROUP BY k"
    ).fetchall()
    assert got_m == dict(exp)


def test_string_agg_skips_nulls_and_rank_rejects_them(ray_session):
    import duckdb

    from knowledgegraph_ray.stages.windows import grouped_rank, grouped_string_agg

    tbl = pa.Table.from_pydict({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array(["a", None, "b", None, None], pa.string()),
        "o": pa.array([1, 2, 3, 1, 2], pa.int64()),
    })
    got = {r["k"]: r["j"] for r in grouped_string_agg(
        rd.from_arrow(tbl), key_col="k", value_col="v",
        order_cols=["o"], sep=",", out_col="j",
    ).take_all()}
    con = duckdb.connect(); con.register("t", tbl)
    exp = dict(con.execute(
        "SELECT k, string_agg(v, ',' ORDER BY o) FROM t GROUP BY k"
    ).fetchall())
    # EXACT SQL parity including the all-null group: the key stays with a
    # NULL aggregate (it used to be dropped — a row-count mismatch)
    assert got == exp
    assert got[2] is None

    bad = pa.Table.from_pydict({
        "k": pa.array([1, 1], pa.int64()),
        "v": pa.array([5, None], pa.int64()),
        "id": pa.array([1, 2], pa.int64()),
    })
    with pytest.raises(Exception, match="contains nulls"):
        grouped_rank(
            rd.from_arrow(bad), key_col="k", value_col="v", id_col="id"
        ).take_all()


def test_extended_windows_edge_cases(ray_session):
    # single-row partition, all-tie partition, hot-key skew — checked
    # against the DuckDB window oracle with explicit full ROWS frames
    rng = np.random.default_rng(3)
    n = 4000
    keys = np.where(rng.random(n) < 0.7, "hot",
                    rng.choice(["a", "b", "c"], n))
    keys[0] = "solo"                      # 1-row partition → pct_rnk 0
    vals = rng.integers(0, 8, n)          # heavy ties
    vals[keys == "b"] = 42                # all-tie partition → cume 1.0
    tbl = pa.table({"k": keys.tolist(), "id": np.arange(n),
                    "v": vals.astype("int64")})
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT id,
               floor(PERCENT_RANK() OVER (PARTITION BY k ORDER BY v) * 1e8)
                 / 1e8 AS pct_rnk,
               floor(CUME_DIST() OVER (PARTITION BY k ORDER BY v) * 1e8)
                 / 1e8 AS cume,
               FIRST_VALUE(v) OVER (PARTITION BY k ORDER BY v, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fv,
               LAST_VALUE(v) OVER (PARTITION BY k ORDER BY v, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
        FROM t ORDER BY id
    """).df()
    for parts in (1, 7):
        got = (
            grouped_rank(rd.from_arrow(tbl).repartition(parts),
                         key_col="k", value_col="v", id_col="id",
                         extended=True)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        assert (got["pct_rnk"] == want["pct_rnk"]).all()
        assert (got["cume"] == want["cume"]).all()
        assert (got["fv"] == want["fv"]).all()
        assert (got["lv"] == want["lv"]).all()
        solo = got[got["id"] == 0].iloc[0]
        assert solo["pct_rnk"] == 0.0 and solo["cume"] == 1.0


def test_null_semantics_lag_hopping_quantiles_urls(ray_session):
    """Review fixes: grouped_lag emits NULL (not INT64_MIN garbage) around
    null values; hopping_counts rejects null timestamps explicitly;
    quantiles ignore nulls in the rank basis (both engines paths);
    normalize_urls passes NULL through; grouping sets demand sentinels."""
    import duckdb
    import numpy as np

    from knowledgegraph_ray.stages.aggregates import (
        grouped_quantile, grouped_quantile_histogram, grouping_sets_agg,
    )
    from knowledgegraph_ray.stages.textops import normalize_urls
    from knowledgegraph_ray.stages.windows import grouped_lag, hopping_counts

    # --- grouped_lag: x - lag(x) is NULL when either side is null
    tbl = pa.Table.from_pydict({
        "k": pa.array(["a"] * 5, pa.string()),
        "v": pa.array([10, None, 30, 45, None], pa.int64()),
        "o": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    got = {r["o"]: r["d"] for r in grouped_lag(
        rd.from_arrow(tbl).repartition(2), key_col="k", order_cols=["o"],
        value_col="v", out_col="d", id_cols=["o"],
    ).take_all()}
    con = duckdb.connect(); con.register("t", tbl)
    exp = dict(con.execute(
        "SELECT o, v - lag(v) OVER (PARTITION BY k ORDER BY o) FROM t"
    ).fetchall())
    assert got == exp  # {1:None, 2:None, 3:None, 4:15, 5:None}

    # --- hopping_counts: explicit contract on null ts
    bad = pa.Table.from_pydict({
        "ts": pa.array([1_000_000, None], pa.timestamp("us")),
        "event_type": pa.array(["x", "y"], pa.string()),
    })
    with pytest.raises(Exception, match="contains nulls"):
        hopping_counts(rd.from_arrow(bad), width_minutes=60,
                       hop_minutes=15).take_all()

    # --- quantiles ignore nulls; all-null group → (key, NULL) on BOTH paths
    qt = pa.Table.from_pydict({
        "k": pa.array(["m"] * 15 + ["z"] * 3, pa.string()),
        "v": pa.array(list(range(10)) + [None] * 5 + [None] * 3, pa.int64()),
    })
    con.register("qt", qt)
    want = dict(con.execute(
        "SELECT k, quantile_disc(v, 0.9) FROM qt GROUP BY k").fetchall())
    hist = {r["k"]: r["q"] for r in grouped_quantile_histogram(
        rd.from_arrow(qt).repartition(3), key_col="k", value_col="v",
        q_num=9, q_den=10, out_col="q",
    ).to_pylist()}
    assert hist == want  # {'m': 8, 'z': None}
    srt = {r["k"]: r["q"] for r in grouped_quantile(
        rd.from_arrow(qt).repartition(3), key_col="k", value_col="v",
        q_num=9, q_den=10, out_col="q",
    ).take_all()}
    assert srt == want  # {'m': 8, 'z': None} — both engines, both paths

    # --- huge int64 values + nulls in ONE block: bin math must stay exact
    # (a bare to_numpy on a null-bearing column degrades to float64, which
    # rounds past 2^53 — 2^60+2 would come back as a multiple of 512)
    big = pa.Table.from_pydict({
        "k": pa.array(["g"] * 6, pa.string()),
        "v": pa.array([2**60 + 3, 2**60 + 1, None, 2**60 + 2, None,
                       2**60 + 5], pa.int64()),
    })
    con.register("bt", big)
    wantb = con.execute("SELECT quantile_disc(v, 0.5) FROM bt").fetchone()[0]
    gotb = grouped_quantile_histogram(
        rd.from_arrow(big), key_col="k", value_col="v",
        q_num=1, q_den=2, out_col="q",
    ).to_pylist()[0]["q"]
    assert gotb == wantb == 2**60 + 2

    # --- normalize_urls: NULL passes through as NULL, not ''
    ub = pa.table({"url": pa.array(
        ["HTTP://WWW.Ex.com:80/a/", None, "not a url"], pa.string())})
    out = normalize_urls(ub).column("url_norm").to_pylist()
    assert out == ["http://ex.com/a", None, "not a url"]

    # --- grouping sets: missing sentinel raises up front with guidance
    ds = rd.from_arrow(pa.table({
        "a": pa.array(["x"], pa.string()), "n": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="sentinel"):
        grouping_sets_agg(ds, ["a"], [["a"], []], sums={"n": "s"})


def test_ordered_prefix_sum(ray_session):
    """Global running total: matches the SQL window exactly at every
    partition layout; presorted path agrees; null values rejected with the
    explicit contract; empty input yields a typed empty table."""
    import duckdb

    from knowledgegraph_ray.stages.windows import ordered_prefix_sum

    rng = np.random.default_rng(7)
    n = 5000
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 500, n).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "v": pa.array(vals)})
    con = duckdb.connect()
    con.register("t", tbl)
    exp = dict(con.execute(
        "SELECT doc_id, CAST(SUM(v) OVER (ORDER BY doc_id) AS BIGINT) FROM t"
    ).fetchall())

    import knowledgegraph_ray.stages.windows as win

    for parts in (1, 3, 16):
        for thr in (1 << 20, 0):  # small-data driver regime AND scale path
            monkey = pytest.MonkeyPatch()
            monkey.setattr(win, "_PREFIX_SUM_DRIVER_ROWS", thr)
            try:
                got = {r["doc_id"]: r["run"] for r in ordered_prefix_sum(
                    rd.from_arrow(tbl).repartition(parts),
                    order_col="doc_id", value_col="v", out_col="run",
                ).take_all()}
            finally:
                monkey.undo()
            assert got == exp, (parts, thr)

    # presorted path (input already globally ordered across blocks)
    srt = tbl.sort_by("doc_id")
    got = {r["doc_id"]: r["run"] for r in ordered_prefix_sum(
        rd.from_arrow(srt), order_col="doc_id", value_col="v",
        out_col="run", presorted=True,
    ).take_all()}
    assert got == exp

    # null values: explicit error, not NaN arithmetic
    bad = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "v": pa.array([1, None], pa.int64())})
    with pytest.raises(Exception, match="contains nulls"):
        ordered_prefix_sum(rd.from_arrow(bad), order_col="doc_id",
                           value_col="v").take_all()

    # empty input: typed empty result with the appended column
    empty = tbl.schema.empty_table()
    out = ordered_prefix_sum(rd.from_arrow(empty), order_col="doc_id",
                             value_col="v", out_col="run")
    assert out.count() == 0


def test_grouped_cumulative_distinct_hand_reference(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.windows import grouped_cumulative_distinct

    # user 1: a b a c b -> 1 2 2 3 3 ; user 2: x x -> 1 1
    tbl = pa.table({
        "u": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([10, 20, 30, 40, 50, 5, 6], pa.int64()),
        "eid": pa.array([100, 101, 102, 103, 104, 200, 201], pa.int64()),
        "v": pa.array(["a", "b", "a", "c", "b", "x", "x"]),
    })
    for parts in (1, 3):
        out = grouped_cumulative_distinct(
            rd.from_arrow(tbl).repartition(parts),
            key_col="u", order_cols=["ts", "eid"], value_col="v",
            id_col="eid",
        ).take_all()
        got = {r["eid"]: r["n_seen"] for r in out}
        assert got == {100: 1, 101: 2, 102: 2, 103: 3, 104: 3,
                       200: 1, 201: 1}, parts

"""Exact grouped quantile via iterative histogram refinement
(stages/aggregates.py grouped_quantile_histogram).

Oracle strategy: numpy sort per group gives the exact discrete quantile
(element at index ceil(q*n) - 1); the histogram path must reproduce it
bit-for-bit regardless of bin count, value range, sign, skew, or
partitioning — the bin-boundary arithmetic is a tight integer partition,
so any off-by-one shows up as a wrong element or a rank walk-off.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from knowledgegraph_ray.stages.aggregates import grouped_quantile_histogram


def _exact(keys, vals, q_num, q_den):
    out = {}
    for k in np.unique(keys):
        v = np.sort(vals[keys == k])
        out[str(k)] = int(v[-(-(q_num * len(v)) // q_den) - 1])
    return out


def _run(keys, vals, q_num, q_den, num_bins, parallelism=7):
    tbl = pa.Table.from_pydict(
        {"k": pa.array([str(x) for x in keys]), "v": pa.array(vals, pa.int64())}
    )
    ds = rd.from_arrow(tbl).repartition(parallelism)
    res = grouped_quantile_histogram(
        ds, key_col="k", value_col="v", q_num=q_num, q_den=q_den,
        out_col="q", num_bins=num_bins,
    )
    return {r["k"]: r["q"] for r in res.to_pylist()}


@pytest.mark.parametrize("num_bins", [2, 3, 16, 4096])
@pytest.mark.parametrize("q_num,q_den", [(1, 2), (9, 10), (1, 100), (99, 100)])
def test_hist_quantile_matches_sort(ray_session, num_bins, q_num, q_den):
    rng = np.random.default_rng(42)
    keys = rng.integers(0, 7, size=5_000)
    # mixed-sign, wide-range, heavy-tailed values stress the bracket math
    vals = (rng.standard_cauchy(5_000) * 1e6).astype(np.int64)
    got = _run(keys, vals, q_num, q_den, num_bins)
    assert got == _exact(keys, vals, q_num, q_den)


def test_hist_quantile_edge_groups(ray_session):
    # single-element groups (lo == hi short-circuit), constant groups,
    # two-element groups straddling a bin boundary, and a hot key holding
    # 90% of the rows
    keys = (["solo"] + ["const"] * 50 + ["pair"] * 2 + ["hot"] * 500)
    vals = ([7] + [-3] * 50 + [0, 1] + list(range(500)))
    got = _run(np.array(keys), np.array(vals, np.int64), 1, 2, num_bins=4)
    exact = _exact(np.array(keys), np.array(vals, np.int64), 1, 2)
    assert got == exact
    assert got["solo"] == 7 and got["const"] == -3


def test_hist_quantile_partition_invariance(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 3, size=2_000)
    vals = rng.integers(-(10**12), 10**12, size=2_000)
    a = _run(keys, vals, 3, 4, num_bins=8, parallelism=1)
    b = _run(keys, vals, 3, 4, num_bins=8, parallelism=13)
    assert a == b == _exact(keys, vals, 3, 4)

def test_hist_quantile_cont_matches_duckdb(ray_session):
    import duckdb

    from knowledgegraph_ray.stages.aggregates import grouped_quantile_cont

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 6, size=3_001)  # odd AND even group sizes
    vals = rng.integers(-(10**9), 10**9, size=3_001)
    tbl = pa.Table.from_pydict(
        {"k": pa.array([str(x) for x in keys]), "v": pa.array(vals, pa.int64())}
    )
    got = grouped_quantile_cont(
        rd.from_arrow(tbl).repartition(5),
        key_col="k", value_col="v", q_num=1, q_den=2, out_col="m",
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute(
        "SELECT k, quantile_cont(v, 0.5) AS m FROM t GROUP BY k ORDER BY k"
    ).df()
    got_m = {r["k"]: r["m"] for r in got.to_pylist()}
    for r in exp.itertuples():
        assert got_m[r.k] == r.m  # bit-exact: dyadic blend of int64 stats


def test_profile_numeric_nulls_and_partitions(ray_session):
    from knowledgegraph_ray.stages.aggregates import profile_numeric

    tbl = pa.Table.from_pydict({
        "a": pa.array([5, None, -2, None, 9], pa.int64()),
        "b": pa.array([None, None, None, None, None], pa.int64()),
    })
    out = {
        r["column"]: r
        for r in profile_numeric(
            rd.from_arrow(tbl).repartition(3), ["a", "b"]
        ).take_all()
    }
    assert out["a"]["n"] == 5 and out["a"]["n_null"] == 2
    assert out["a"]["min_v"] == -2 and out["a"]["max_v"] == 9
    assert out["b"]["n"] == 5 and out["b"]["n_null"] == 5
    assert out["b"]["min_v"] is None and out["b"]["max_v"] is None


def test_grouped_corr_exact_and_degenerate(ray_session):
    import math

    from knowledgegraph_ray.stages.aggregates import grouped_corr

    rng = np.random.default_rng(9)
    # strongly correlated, anti-correlated, independent, constant, singleton
    x1 = rng.integers(0, 1000, 800); y1 = x1 * 3 + rng.integers(0, 50, 800)
    x2 = rng.integers(0, 1000, 500); y2 = 5000 - x2 * 2
    x3 = rng.integers(0, 1000, 600); y3 = rng.integers(0, 1000, 600)
    ks = (["pos"] * 800 + ["neg"] * 500 + ["ind"] * 600
          + ["const"] * 10 + ["solo"])
    xs = np.r_[x1, x2, x3, np.full(10, 7), [3]]
    ys = np.r_[y1, y2, y3, rng.integers(0, 9, 10), [4]]
    tbl = pa.Table.from_pydict({
        "k": pa.array(ks), "x": pa.array(xs, pa.int64()),
        "y": pa.array(ys, pa.int64()),
    })
    out = {r["k"]: r["corr_xy"] for r in grouped_corr(
        rd.from_arrow(tbl).repartition(6), key_col="k", x_col="x", y_col="y",
    ).to_pylist()}

    def ref(x, y):
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x.astype(object) * y.astype(object)).sum())
        sxx = int((x.astype(object) ** 2).sum())
        syy = int((y.astype(object) ** 2).sum())
        return float(n * sxy - sx * sy) / math.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy))

    assert out["pos"] == ref(x1, y1) and out["pos"] > 0.99
    assert out["neg"] == ref(x2, y2) and out["neg"] == -1.0
    assert out["ind"] == ref(x3, y3) and abs(out["ind"]) < 0.2
    assert out["const"] is None and out["solo"] is None


def test_grouped_zscore_exact_and_degenerate(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.aggregates import grouped_zscore

    rng = np.random.default_rng(9)
    n = 3000
    k = rng.choice(["a", "b", "hot"], n, p=[0.1, 0.1, 0.8]).tolist()
    v = rng.integers(-500, 500, n).astype("int64")
    # degenerate groups: single row, zero variance
    k += ["solo", "const", "const", "const"]
    v = np.r_[v, [7, 42, 42, 42]]
    ids = np.arange(len(k), dtype="int64")
    tbl = pa.table({"k": k, "v": v, "id": ids})
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        WITH s AS (
          SELECT k, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(v AS HUGEINT)) AS s1,
                 sum(CAST(v AS HUGEINT) * v) AS s2
          FROM t GROUP BY k
        )
        SELECT id,
               CASE WHEN n >= 2 AND n * s2 - s1 * s1 > 0 THEN
                 floor(CAST(CAST(n AS HUGEINT) * v - s1 AS DOUBLE)
                       * (sqrt(n * (n - 1.0))
                          / (n * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))))
                       * 1e6) / 1e6
               ELSE NULL END AS z
        FROM t JOIN s USING (k) ORDER BY id
    """).df()
    for parts in (1, 6):
        got = (
            grouped_zscore(rd.from_arrow(tbl).repartition(parts),
                           key_col="k", value_col="v", id_col="id")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        assert got["z"].isna().equals(want["z"].isna())
        m = ~want["z"].isna()
        assert (got["z"][m] == want["z"][m]).all()
        # degenerate rows are null
        assert got["z"].iloc[-4:].isna().all()


def test_grouped_skewness_exact_and_degenerate(ray_session):
    import math

    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.aggregates import grouped_skewness

    rng = np.random.default_rng(21)
    vals = {
        "sym": rng.integers(-100, 101, 500),
        "right": rng.integers(0, 20, 400) ** 2,   # right-skewed
        "solo": np.array([5]),
        "const": np.array([3, 3, 3]),
    }
    k = np.concatenate([[g] * len(v) for g, v in vals.items()])
    v = np.concatenate(list(vals.values())).astype("int64")
    tbl = pa.table({"k": k.tolist(), "v": v})
    for parts in (1, 5):
        got = {r["k"]: r["skew_r"] for r in grouped_skewness(
            rd.from_arrow(tbl).repartition(parts), key_col="k", value_col="v"
        ).to_pylist()}
        assert got["solo"] is None and got["const"] is None
        for g in ("sym", "right"):
            x = vals[g].astype(np.float64)
            m2, m3 = ((x - x.mean()) ** 2).mean(), ((x - x.mean()) ** 3).mean()
            ref = m3 / m2 ** 1.5
            assert abs(got[g] - ref) < 1e-6, g
        assert got["right"] > 0.3 and abs(got["sym"]) < 0.3


def test_moment_sums_no_int64_wrap_at_documented_bound(ray_session):
    """Values at the documented per-row bound (|x| ~ 2e6, x^3 ~ 8e18) used
    to wrap the int64 GROUPED SUM (two rows of x=2e6 give sum(x^3) =
    1.6e19 > int64 max) even though each per-row product passed the
    checked multiply; the hi/lo-split partials keep the sums exact."""
    import math

    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.aggregates import (
        grouped_corr, grouped_skewness, grouped_zscore,
    )

    # 6 rows near +2e6 and one low outlier: every pairwise power sum
    # exceeds int64 without the split.
    x = np.array([2_000_000, 1_999_999, 1_999_998, 2_000_000,
                  1_999_997, 2_000_000, -1_500_000], dtype=np.int64)
    tbl = pa.table({"k": ["g"] * len(x), "id": list(range(len(x))),
                    "v": x, "w": x})
    ds = rd.from_arrow(tbl).repartition(3)

    got = grouped_skewness(ds, key_col="k", value_col="v").to_pylist()
    xf = x.astype(np.float64)
    m2 = ((xf - xf.mean()) ** 2).mean()
    m3 = ((xf - xf.mean()) ** 3).mean()
    ref = m3 / m2 ** 1.5
    assert abs(got[0]["skew_r"] - ref) < 1e-6
    assert got[0]["skew_r"] < 0  # low outlier: left-skewed, sign must hold

    corr = grouped_corr(ds, key_col="k", x_col="v", y_col="w").to_pylist()
    assert abs(corr[0]["corr_xy"] - 1.0) < 1e-12  # x vs itself

    z = {r["id"]: r["z"] for r in grouped_zscore(
        ds, key_col="k", value_col="v", id_col="id").take_all()}
    zref = (xf - xf.mean()) / xf.std(ddof=1)
    for i in range(len(x)):
        assert abs(z[i] - math.floor(zref[i] * 1e6) / 1e6) < 2e-6, i


def test_grouping_sets_regimes_exactly_equal(ray_session):
    """The small-result driver cascade must return EXACTLY the distributed
    cascade's rows (same integer sums, same sentinel fill), including the
    grand-total level."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.aggregates import grouping_sets_agg

    rng = np.random.default_rng(17)
    n = 5000
    tbl = pa.table({
        "k1": pa.array(rng.choice(["a", "b", "c"], n)),
        "k2": pa.array(rng.choice(["x", "y"], n)),
        "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })
    sets = [["k1", "k2"], ["k1"], ["k2"], []]
    kwargs = dict(
        sums={"v": "sv"}, count_alias="n",
        sentinels={"k1": "ALL", "k2": "ALL"},
    )
    ds = rd.from_arrow(tbl).repartition(6)
    local = {tuple(sorted(r.items())) for r in grouping_sets_agg(
        ds, ["k1", "k2"], sets, **kwargs).take_all()}
    dist = {tuple(sorted(r.items())) for r in grouping_sets_agg(
        ds, ["k1", "k2"], sets, small_result_rows=0, **kwargs).take_all()}
    assert local == dist
    assert len(local) == 6 + 3 + 2 + 1


def test_adaptive_combine_paths_equal(ray_session, monkeypatch):
    """The two final-combine implementations in partial_grouped_agg /
    distinct_keys (zero-CPU task vs Ray groupby) must agree exactly —
    integer sums / min / max / count are order-independent, so the paths
    are interchangeable; the threshold only picks which one runs.  Also
    pins the guards: float sums refuse the task path, and the >threshold
    fallback (the 100-TB cardinality path) produces the same rows."""
    import knowledgegraph_ray.stages.aggregates as agg

    rng = np.random.default_rng(23)
    n = 20_000
    # NOTE: keys are non-null by test design — Ray's sort-based groupby
    # (the fallback path) cannot sort null string keys (numpy None < str
    # TypeError, a pre-existing Ray limitation); the task path happens to
    # handle them via pyarrow group_by, but the engine contract is
    # "canonicalize null keys upstream", same as every sort-colocating op
    tbl = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "v": pa.array(rng.integers(-1000, 1000, n), pa.int64()),
        "f": pa.array(rng.normal(size=n), pa.float64()),
        "s": pa.array(rng.choice(["x", "yy", "zzz"], n)),
    })
    ds = rd.from_arrow(tbl).repartition(7)
    kwargs = dict(
        sums={"v": "sv"}, mins={"s": "smin"}, maxs={"v": "vmax"},
        count_alias="n",
    )

    def rows(d):
        return {tuple(sorted(r.items())) for r in d.take_all()}

    task_path = rows(agg.partial_grouped_agg(ds, ["k"], **kwargs))
    monkeypatch.setattr(agg, "_SMALL_COMBINE_ROWS", 0)
    shuffle_path = rows(agg.partial_grouped_agg(ds, ["k"], **kwargs))
    monkeypatch.undo()
    assert task_path == shuffle_path and len(task_path) == 4

    # float sums must take the shuffle path even when tiny (summation-order
    # parity): result must still be correct to float tolerance
    fl = agg.partial_grouped_agg(ds, ["k"], sums={"f": "sf"}).take_all()
    import duckdb
    con = duckdb.connect()
    con.register("t", tbl)
    exp = dict(con.execute("SELECT k, sum(f) FROM t GROUP BY k").fetchall())
    got = {r["k"]: r["sf"] for r in fl}
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9

    # distinct_keys: fallback (threshold 0) equals the task path
    dk_task = rows(agg.distinct_keys(ds, ["k", "s"]))
    monkeypatch.setattr(agg, "_SMALL_COMBINE_ROWS", 0)
    dk_shuffle = rows(agg.distinct_keys(ds, ["k", "s"]))
    monkeypatch.undo()
    assert dk_task == dk_shuffle and len(dk_task) == 12


def test_grouped_iqr_outliers_matches_reference(ray_session):
    """Tukey fences with quantile_disc quartile positioning, exact ints."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.aggregates import grouped_iqr_outliers

    rng = np.random.default_rng(17)
    keys, vals = [], []
    for k in range(12):
        n = int(rng.integers(1, 60))
        v = rng.integers(-1000, 1000, size=n).tolist()
        if k % 3 == 0:
            v += [100000 + k, -100000 - k]  # planted extreme outliers
        keys += [f"k{k}"] * len(v)
        vals += v
    # a key with nulls mixed in and one all-null key
    keys += ["kn"] * 4 + ["kallnull"] * 2
    vals += [5, None, 7, 2000000, None, None]

    def qd(sorted_vals, num, den):
        n = len(sorted_vals)
        return sorted_vals[max(math.ceil(num * n / den), 1) - 1]

    ref = {}
    for k in set(keys):
        v = sorted(x for x, kk in zip(vals, keys) if kk == k and x is not None)
        if not v:
            ref[k] = 0
            continue
        q1, q3 = qd(v, 1, 4), qd(v, 3, 4)
        iqr = q3 - q1
        ref[k] = sum(1 for x in v if 2 * x < 2 * q1 - 3 * iqr
                     or 2 * x > 2 * q3 + 3 * iqr)

    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    for parts in (1, 5):
        out = grouped_iqr_outliers(
            rd.from_arrow(tbl).repartition(parts), key_col="k", value_col="v"
        ).take_all()
        got = {r["k"]: r["n_outliers"] for r in out}
        assert got == ref, parts


def test_grouped_weighted_median_matches_reference(ray_session):
    """Lower weighted median: smallest v with 2*cumW(<=v) >= totalW."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.stages.aggregates import grouped_weighted_median

    rng = np.random.default_rng(31)
    keys, vals, wts = [], [], []
    for k in range(10):
        n = int(rng.integers(1, 50))
        keys += [f"k{k}"] * n
        vals += rng.integers(-100, 100, size=n).tolist()
        wts += rng.integers(1, 9, size=n).tolist()
    # exact-half boundary: weights 1,1 over values 3,9 -> lower median 3
    keys += ["kb", "kb"]; vals += [9, 3]; wts += [1, 1]
    # null rows are ignored
    keys += ["k0", "k0"]; vals += [None, 50]; wts += [5, None]

    def ref(k):
        rows = sorted(
            (v, w) for v, kk, w in zip(vals, keys, wts)
            if kk == k and v is not None and w is not None
        )
        tot = sum(w for _, w in rows)
        c = 0
        for v, w in rows:
            c += w
            if 2 * c >= tot:
                return v
        raise AssertionError

    want = {k: ref(k) for k in set(keys)}
    assert want["kb"] == 3

    tbl = pa.table({
        "k": pa.array(keys),
        "v": pa.array(vals, pa.int64()),
        "w": pa.array(wts, pa.int64()),
    })
    for parts in (1, 6):
        out = grouped_weighted_median(
            rd.from_arrow(tbl).repartition(parts),
            key_col="k", value_col="v", weight_col="w",
        ).take_all()
        got = {r["k"]: r["wmedian"] for r in out}
        assert got == want, parts

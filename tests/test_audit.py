"""Data-quality audit (stages/audit.py): every rule kind on a synthetic
table with KNOWN violation counts, including null semantics."""

import pyarrow as pa

import ray.data as rd

from knowledgegraph_ray.stages.audit import table_audit


def test_all_rule_kinds_with_known_counts(ray_session):
    t = pa.table({
        "id": pa.array([1, 2, 2, 3, None, 5], pa.int64()),
        "bal": pa.array([10.0, -5.0, None, -1.0, 3.0, 20000.0], pa.float64()),
        "seg": ["A", "B", "ZZZ", None, "A", "Q"],
        "name": ["u#001", "u#002", "nope", None, "u#0x3", "u#004"],
    })
    out = table_audit(rd.from_arrow(t).repartition(3), [
        {"name": "id_not_null", "column": "id", "kind": "not_null"},
        {"name": "id_unique", "column": "id", "kind": "unique"},
        {"name": "bal_non_negative", "column": "bal", "kind": "non_negative"},
        {"name": "bal_range", "column": "bal", "kind": "range",
         "lo": 0.0, "hi": 100.0},
        {"name": "seg_in_set", "column": "seg", "kind": "in_set",
         "values": ["A", "B"]},
        {"name": "name_format", "column": "name", "kind": "regex",
         "pattern": "u#[0-9]{3}"},
    ])
    got = dict(zip(out.column("check").to_pylist(),
                   out.column("violations").to_pylist()))
    assert got == {
        "id_not_null": 1,        # the None
        "id_unique": 1,          # 5 non-null ids, 4 distinct (the 2,2 dup)
        "bal_non_negative": 2,   # -5, -1 (null doesn't count)
        "bal_range": 3,          # -5, -1, 20000
        "seg_in_set": 2,         # ZZZ, Q (null doesn't count)
        "name_format": 2,        # 'nope', 'u#0x3' (null doesn't count)
    }
    assert set(out.column("rows").to_pylist()) == {6}


def test_range_rule_counts_nan_like_sql(ray_session):
    """DuckDB's total order puts NaN > hi (but not < lo) — the kernel must
    match so NaN-bearing data keeps the oracle equivalence."""
    import duckdb
    import math

    t = pa.table({"x": pa.array([1.0, float("nan"), -5.0, 50.0, None],
                                pa.float64())})
    out = table_audit(rd.from_arrow(t), [
        {"name": "rng", "column": "x", "kind": "range", "lo": 0.0, "hi": 10.0},
        {"name": "lo_only", "column": "x", "kind": "range", "lo": 0.0},
    ])
    got = dict(zip(out.column("check").to_pylist(),
                   out.column("violations").to_pylist()))
    import pyarrow.parquet as pq
    import tempfile, os
    f = os.path.join(tempfile.mkdtemp(), "nan.parquet")
    pq.write_table(t, f)  # parquet preserves NaN vs NULL (pandas would not)
    con = duckdb.connect()
    want_rng = con.sql(
        f"SELECT count(*) FROM read_parquet('{f}') "
        "WHERE x < 0.0 OR x > 10.0").fetchone()[0]
    want_lo = con.sql(
        f"SELECT count(*) FROM read_parquet('{f}') WHERE x < 0.0"
    ).fetchone()[0]
    assert got["rng"] == want_rng == 3   # -5, 50, NaN
    assert got["lo_only"] == want_lo == 1  # just -5


def test_unique_rule_single_pass_counts(ray_session):
    """Non-null counts for unique rules ride the scalar partials pass."""
    t = pa.table({"k": pa.array([1, 1, 2, None, 3, 3, 3], pa.int64())})
    out = table_audit(rd.from_arrow(t).repartition(3), [
        {"name": "k_unique", "column": "k", "kind": "unique"},
    ])
    assert out.column("violations").to_pylist() == [3]  # 6 non-null - 3 distinct
    assert out.column("rows").to_pylist() == [7]

"""UNPIVOT/melt (stages/aggregates.melt)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from knowledgegraph_ray.stages.aggregates import melt


def test_melt_matches_reference(ray_session):
    tbl = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "g": pa.array(["a", "b", "a"]),
        "x": pa.array([10, None, 30], pa.int64()),
        "y": pa.array([-1, -2, -3], pa.int64()),
    })
    ref = set()
    for r in tbl.to_pylist():
        for c in ("x", "y"):
            ref.add((r["id"], r["g"], c, r[c]))
    for parts in (1, 3):
        out = melt(
            rd.from_arrow(tbl).repartition(parts),
            id_cols=["id", "g"], value_cols=["x", "y"],
        ).take_all()
        got = {(r["id"], r["g"], r["variable"], r["value"]) for r in out}
        assert got == ref and len(out) == 6, parts


def test_melt_empty_and_types(ray_session):
    tbl = pa.table({
        "id": pa.array([7], pa.int64()),
        "x": pa.array([1.5], pa.float64()),
        "y": pa.array([None], pa.float64()),
    })
    out = melt(rd.from_arrow(tbl), id_cols=["id"], value_cols=["x", "y"])
    sch = pa.schema([(f.name, f.type)
                     for f in out.schema(fetch_if_missing=True).base_schema])
    assert sch.field("variable").type == pa.string()
    assert sch.field("value").type == pa.float64()
    assert out.count() == 2

    empty = pa.table({
        "id": pa.array([], pa.int64()),
        "x": pa.array([], pa.float64()),
        "y": pa.array([], pa.float64()),
    })
    assert melt(rd.from_arrow(empty), id_cols=["id"],
                value_cols=["x", "y"]).count() == 0


def test_table_diff_statuses(ray_session):
    """All four statuses, null-payload semantics (a real NULL value is not
    'absent'), multi-compare-column OR."""
    from knowledgegraph_ray.functions.joins import table_diff

    old = pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "a": pa.array([10, 20, None, 40, 50], pa.int64()),
        "b": pa.array(["x", "y", "z", "w", "v"]),
    })
    new = pa.table({
        "k": pa.array([2, 3, 4, 5, 6], pa.int64()),
        "a": pa.array([20, None, 41, 50, 60], pa.int64()),
        "b": pa.array(["y", "z", "w", "q", "u"]),
    })
    out = table_diff(
        rd.from_arrow(old).repartition(2), rd.from_arrow(new).repartition(2),
        keys=["k"], compare_cols=["a", "b"],
    ).take_all()
    got = {r["k"]: r["status"] for r in out}
    # k1 removed; k2 unchanged; k3 unchanged (null == null); k4 changed (a);
    # k5 changed (b); k6 added
    assert got == {1: "removed", 2: "unchanged", 3: "unchanged",
                   4: "changed", 5: "changed", 6: "added"}
    r4 = [r for r in out if r["k"] == 4][0]
    assert (r4["a_old"], r4["a_new"]) == (40, 41)

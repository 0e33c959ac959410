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

"""Data-quality audit (the contract-check stage every ingest pipeline runs).

`table_audit` evaluates declarative column rules over a Dataset in ONE
streaming pass (per-block vectorized violation counts, integer partials
summed on the driver — exact, order-independent) plus one distinct-count
exchange per `unique` rule.  Output is the tiny (check, violations, rows)
table a pipeline gates on before spending GPU-hours downstream.

Rule kinds:
  * ``not_null``      — null values
  * ``non_negative``  — value < 0 (nulls don't count; pair with not_null)
  * ``in_set``        — value not in ``values`` (nulls don't count)
  * ``regex``         — full-match failure against ``pattern`` (RE2, the
                        same engine DuckDB's regexp_matches uses)
  * ``range``         — value outside [lo, hi] (either bound optional)
  * ``unique``        — duplicate NON-NULL rows: count(col) − distinct
                        (exact; nulls are the not_null rule's job — SQL
                        count(DISTINCT) semantics)
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _block_violations(b: pa.Table, check: dict[str, Any]) -> int:
    col = b.column(check["column"])
    kind = check["kind"]
    if kind == "not_null":
        return int(col.null_count)
    if kind == "non_negative":
        return int(
            pc.sum(pc.cast(pc.less(col, 0), pa.int64())).as_py() or 0
        )
    if kind == "in_set":
        ok = pc.is_in(col, value_set=pa.array(check["values"], col.type))
        bad = pc.and_(pc.invert(ok), pc.is_valid(col))
        return int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
    if kind == "regex":
        ok = pc.match_substring_regex(
            col, "^(?:" + check["pattern"] + ")$"
        )
        bad = pc.and_(pc.invert(ok), pc.is_valid(col))
        return int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
    if kind == "range":
        bad = pa.array(np.zeros(b.num_rows, bool))
        if "lo" in check:
            bad = pc.or_(bad, pc.less(col, check["lo"]))
        if "hi" in check:
            bad = pc.or_(bad, pc.greater(col, check["hi"]))
        if "hi" in check and pa.types.is_floating(col.type):
            # SQL total order puts NaN above every value (DuckDB counts it
            # as > hi, but NOT as < lo); Arrow comparisons return false on
            # NaN — align so the oracle equivalence holds on NaN data
            bad = pc.or_(bad, pc.is_nan(col))
        bad = pc.and_(pc.fill_null(bad, False), pc.is_valid(col))
        return int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
    raise ValueError(f"unknown audit rule kind {kind!r}")


def table_audit(
    ds: rd.Dataset, checks: list[dict[str, Any]]
) -> pa.Table:
    """→ (check, violations, rows) — one row per rule, sorted by name."""
    from .aggregates import distinct_keys

    scalar = [c for c in checks if c["kind"] != "unique"]
    uniques = [c for c in checks if c["kind"] == "unique"]
    cols = sorted({c["column"] for c in checks})
    pruned = ds.select_columns(cols)

    # ONE streaming pass computes every scalar rule's violations AND each
    # unique rule's non-null count (idx past the scalar rules) — only the
    # distinct exchange per unique rule remains as extra work
    n_counters = len(scalar) + len(uniques)

    def partials(b: pa.Table) -> pa.Table:
        vals = [_block_violations(b, c) for c in scalar] + [
            b.num_rows - b.column(c["column"]).null_count for c in uniques
        ]
        return pa.table({
            "idx": pa.array(range(n_counters), pa.int64()),
            "v": pa.array(vals, pa.int64()),
            "n": pa.array([b.num_rows] * n_counters, pa.int64()),
        })

    totals = [0] * n_counters
    rows_total = 0
    if n_counters:
        for r in pruned.map_batches(
            partials, batch_format="pyarrow"
        ).take_all():
            totals[r["idx"]] += r["v"]
            if r["idx"] == 0:
                rows_total += r["n"]
    else:
        rows_total = pruned.count()

    out_names: list[str] = []
    out_viol: list[int] = []
    for c, v in zip(scalar, totals):
        out_names.append(c["name"])
        out_viol.append(v)
    for u, c in enumerate(uniques):
        col_ds = pruned.select_columns([c["column"]]).map_batches(
            lambda b, _col=c["column"]: b.filter(pc.is_valid(b.column(_col))),
            batch_format="pyarrow",
        )
        n_nonnull = totals[len(scalar) + u]
        n_distinct = distinct_keys(col_ds, [c["column"]]).count()
        out_names.append(c["name"])
        out_viol.append(n_nonnull - n_distinct)
    order = np.argsort(np.array(out_names, object), kind="stable")
    return pa.table({
        "check": pa.array([out_names[i] for i in order], pa.string()),
        "violations": pa.array(
            [int(out_viol[i]) for i in order], pa.int64()
        ),
        "rows": pa.array([rows_total] * len(out_names), pa.int64()),
    })

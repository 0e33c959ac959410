"""Deterministic hash-sampling operators (stages/sampling.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _docs_ds(n=2000, groups=("a", "b", "c", "d")):
    rng = np.random.default_rng(3)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array([groups[i] for i in rng.integers(0, len(groups), n)]),
    }))


def test_sample_uniform_fraction_and_determinism(ray_session):
    from knowledgegraph_ray.stages.sampling import sample_uniform

    ds = _docs_ds()
    for method in ("md5", "fast"):
        a = sorted(r["doc_id"] for r in sample_uniform(
            ds, 0.25, id_col="doc_id", method=method).take_all())
        b = sorted(r["doc_id"] for r in sample_uniform(
            ds.repartition(7), 0.25, id_col="doc_id", method=method).take_all())
        assert a == b, method  # block-layout independent
        assert 0.18 < len(a) / 2000 < 0.32, (method, len(a))


def test_sample_uniform_salt_changes_selection(ray_session):
    from knowledgegraph_ray.stages.sampling import sample_uniform

    ds = _docs_ds()
    a = {r["doc_id"] for r in sample_uniform(ds, 0.3, method="fast").take_all()}
    b = {r["doc_id"] for r in sample_uniform(ds, 0.3, method="fast", salt=99).take_all()}
    assert a != b
    assert len(a & b) > 0  # independent ~30% samples overlap


def test_sample_stratified_per_group_fraction(ray_session):
    from knowledgegraph_ray.stages.sampling import sample_stratified

    ds = _docs_ds(4000)
    for method in ("md5", "fast"):
        out = sample_stratified(
            ds, 0.5, group_col="source", id_col="doc_id", method=method
        ).take_all()
        tot = {g: 0 for g in "abcd"}
        for r in _docs_ds(4000).take_all():
            tot[r["source"]] += 1
        got = {g: 0 for g in "abcd"}
        for r in out:
            got[r["source"]] += 1
        for g in "abcd":
            frac = got[g] / tot[g]
            assert 0.4 < frac < 0.6, (method, g, frac)


def test_md5_bucket_matches_duckdb():
    """The Python md5 bucket must equal the oracle SQL's expression."""
    import duckdb

    from knowledgegraph_ray.stages.sampling import _md5_bucket

    ids = [0, 1, 42, 999_999_937]
    got = _md5_bucket(ids).tolist()
    con = duckdb.connect()
    for i, v in enumerate(ids):
        want = con.execute(
            "SELECT CAST(CONCAT('0x', substr(md5(CAST(? AS VARCHAR)), 1, 16)) "
            "AS UBIGINT) % 1000000", [v]
        ).fetchone()[0]
        assert got[i] == want, (v, got[i], want)


def test_sample_weighted_properties(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.sampling import sample_weighted

    n = 6000
    rng = np.random.default_rng(11)
    w = rng.integers(0, 200, n).astype("int64")
    w[:50] = 0            # never selected
    w[50:100] = 10_000    # prob capped at 1 → always selected
    tbl = pa.table({"doc_id": np.arange(n, dtype="int64"), "w": w})

    got = None
    for parts, method in ((1, "fast"), (8, "fast"), (4, "md5")):
        ds = sample_weighted(
            rd.from_arrow(tbl).repartition(parts),
            weight_col="w", scale_den=100, id_col="doc_id", method=method,
        )
        ids = sorted(r["doc_id"] for r in ds.take_all())
        if method == "fast":
            if got is None:
                got = ids          # layout invariance within a method
            else:
                assert ids == got
        sel = set(ids)
        assert not (sel & set(range(50)))
        assert set(range(50, 100)) <= sel
    # proportionality: selection rate ≈ E[min(1, w/100)] within 3 sigma
    p = np.minimum(w / 100.0, 1.0)
    exp, sd = p.sum(), float(np.sqrt((p * (1 - p)).sum()))
    assert abs(len(got) - exp) < 3 * sd + 1


def test_sample_weighted_cutoff_tree_matches_sql_division(ray_session):
    """The engine must evaluate min((w·num)/den, 1.0)·1e6 with a real
    division, not a pre-folded w·(1/den): for w=9, den=500 the folded form
    gives 18000.000000000004 while SQL's w/500.0 gives exactly 18000.0 —
    a doc whose md5 bucket is exactly 18000 is then kept by one and
    dropped by the other.  Assert the engine keep/drop decision equals the
    division-form predicate for every bucket-boundary weight in range."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.sampling import (
        _BUCKETS, _bucket_column, sample_weighted,
    )

    n, den = 20000, 500
    w = (np.arange(n, dtype="int64") % 700)  # crosses the w=den cap too
    tbl = pa.table({"doc_id": np.arange(n, dtype="int64"), "w": w})
    got = set(
        r["doc_id"] for r in sample_weighted(
            rd.from_arrow(tbl).repartition(4),
            weight_col="w", scale_den=den, id_col="doc_id", method="md5",
        ).take_all()
    )
    buckets = _bucket_column(tbl, "doc_id", "md5", "").astype(np.float64)
    want = {
        int(i) for i in np.nonzero(
            buckets < np.minimum(w.astype(np.float64) / den, 1.0) * _BUCKETS
        )[0]
    }
    assert got == want


def test_sample_stratified_exact_counts(ray_session):
    import math

    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.sampling import sample_stratified_exact

    rng = np.random.default_rng(23)
    groups = rng.choice(["a", "b", "hot", "tiny"], 3000,
                        p=[0.2, 0.2, 0.599, 0.001]).tolist()
    tbl = pa.table({"doc_id": np.arange(3000, dtype="int64"),
                    "source": groups})
    want_n = {g: math.ceil(groups.count(g) / 5)
              for g in set(groups)}
    first = None
    for parts in (1, 7):
        got = sample_stratified_exact(
            rd.from_arrow(tbl).repartition(parts), 1, 5,
            group_col="source", id_col="doc_id",
        ).take_all()
        by = {}
        for r in got:
            by.setdefault(r["source"], []).append(r["doc_id"])
        assert {g: len(v) for g, v in by.items()} == want_n
        ids = sorted((g, sorted(v)) for g, v in by.items())
        if first is None:
            first = ids          # layout invariance
        else:
            assert ids == first


def test_assign_split_properties(ray_session):
    """Every row gets exactly one split; proportions track the weights;
    assignment is layout-invariant; appending a split at the END never
    reassigns rows already in earlier splits (the growth contract)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.sampling import assign_split

    n = 9000
    tbl = pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})

    got = None
    for parts in (1, 8):
        rows = assign_split(
            rd.from_arrow(tbl).repartition(parts),
            [("train", 90), ("val", 5), ("test", 5)],
            id_col="doc_id", method="fast",
        ).take_all()
        m = {r["doc_id"]: r["split"] for r in rows}
        assert len(m) == n  # every row, exactly once
        if got is None:
            got = m
        else:
            assert m == got  # layout invariance
    from collections import Counter
    c = Counter(got.values())
    assert abs(c["train"] - 0.90 * n) < 4 * np.sqrt(0.09 * n) + 1
    assert abs(c["val"] - 0.05 * n) < 4 * np.sqrt(0.0475 * n) + 1
    assert set(c) == {"train", "val", "test"}

    # growth contract: extending the tail with a new split must keep every
    # existing train/val row in place (only 'test' rows may move)
    rows2 = assign_split(
        rd.from_arrow(tbl), [("train", 90), ("val", 5), ("test", 4),
                             ("extra", 1)],
        id_col="doc_id", method="fast",
    ).take_all()
    m2 = {r["doc_id"]: r["split"] for r in rows2}
    # NOTE: integer cutoffs over a different total CAN shift boundaries;
    # with an unchanged total (90+5+5 == 90+5+4+1) they cannot
    for i, s in got.items():
        if s in ("train", "val"):
            assert m2[i] == s, i

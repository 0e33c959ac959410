"""Inverted-index build (stages/textops.inverted_index).

Exactness is checked against the same DuckDB SQL the driver oracle runs
(string_agg ORDER BY doc_id makes posting-list order part of the contract),
plus partition invariance and a cross-block duplicate-pair collapse case.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import ray.data as rd

from knowledgegraph_ray.stages.textops import inverted_index

_SQL = """
    WITH toks AS (
      SELECT doc_id,
             lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
      FROM d
    ),
    per AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY term, doc_id
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS tf,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM per GROUP BY term ORDER BY term
"""


def _expect(tbl: pa.Table):
    con = duckdb.connect()
    con.register("d", tbl)
    rows = con.execute(_SQL).fetchall()
    con.close()
    return rows


def _got(ds):
    out = inverted_index(ds).take_all()
    return sorted((r["term"], r["df"], r["tf"], r["postings"]) for r in out)


def test_inverted_index_matches_duckdb(ray_session):
    docs = pa.table({
        "doc_id": pa.array([7, 3, 11, 20, 5], pa.int64()),
        "text": [
            "The cat sat, the CAT ran!",
            "dog and cat",
            "",
            "cat cat cat dog",
            "punctuation--only?!",
        ],
    })
    assert _got(rd.from_arrow(docs).repartition(3)) == sorted(_expect(docs))


def test_inverted_index_cross_block_pairs_collapse(ray_session):
    # the same (term, doc) pair arrives from TWO map blocks when a doc id
    # repeats across input blocks — the reduce must merge, not duplicate
    docs = pa.table({
        "doc_id": pa.array([1, 1, 2], pa.int64()),
        "text": ["alpha beta", "alpha gamma", "beta alpha"],
    })
    got = _got(rd.from_arrow(docs).repartition(3))
    assert got == sorted(_expect(docs))
    alpha = [g for g in got if g[0] == "alpha"][0]
    assert alpha == ("alpha", 2, 3, "1,2")


def test_inverted_index_partition_invariance(ray_session):
    docs = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": [f"w{i % 7} shared w{i % 3} tail{i}" for i in range(40)],
    })
    a = _got(rd.from_arrow(docs).repartition(1))
    b = _got(rd.from_arrow(docs).repartition(9))
    assert a == b == sorted(_expect(docs))


def test_q_inverted_index_sf0001(ray_session):
    import pyarrow.parquet as pq

    from knowledgegraph_ray.pipelines.queries import q_inverted_index

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    got = [(r["term"], r["df"], r["tf"], r["postings"])
           for r in q_inverted_index("/root/testdata/sf0.001").take_all()]
    assert got == _expect(tbl)

"""End-to-end golden run: full pipeline vs the independent sequential oracle.

North rule: emitted (subj, pred, obj) triples match at P/R ≥ 0.95; with the
deterministic extractor the match must be exactly 1.0. Also asserts the
byte-identical text invariant and partition-count invariance (§4 ordering
design: output must not depend on task scheduling)."""

import pyarrow.parquet as pq
import pytest

from knowledgegraph_ray.pipelines import kg_build, run_graph_build
from knowledgegraph_ray.sources.golden import expected_graph, precision_recall


@pytest.fixture(scope="module")
def built(pages_small, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("kg_work"))
    res = kg_build(
        pages_small["paths"], work,
        batch_size=64, concurrency=2, num_partitions=2, wave_size=2,
    )
    return res


def _edge_rows(res):
    return pq.read_table(res.edges_dir).to_pylist()


def _node_rows(res):
    return pq.read_table(res.nodes_dir).to_pylist()


def test_triples_match_oracle_exactly(built, pages_small):
    expected = expected_graph(pages_small["meta"])
    produced = {(e["src"], e["type"], e["dst"]) for e in _edge_rows(built)}
    exp_keys = {(s, t, d) for (s, t, d) in expected["triples"]}
    p, r = precision_recall(produced, exp_keys)
    missing = list(exp_keys - produced)[:5]
    extra = list(produced - exp_keys)[:5]
    assert (p, r) == (1.0, 1.0), f"P={p} R={r} missing={missing} extra={extra}"


def test_edge_payloads_match_oracle(built, pages_small):
    expected = expected_graph(pages_small["meta"])["triples"]
    for e in _edge_rows(built):
        exp = expected[(e["src"], e["type"], e["dst"])]
        assert e["strength"] == exp["strength"]
        assert sorted(e["sources"]) == sorted(exp["sources"])
        assert e["src_type"] == exp["src_type"]
        assert e["dst_type"] == exp["dst_type"]


def test_clusters_match_oracle(built, pages_small):
    expected = expected_graph(pages_small["meta"])["clusters"]
    exp = {(c["type"], c["canonical"]): frozenset(c["surfaces"]) for c in expected}
    got = {
        (n["type"], n["name"]): frozenset(n["surfaces"]) for n in _node_rows(built)
    }
    assert got == exp


def test_extracted_text_byte_identical_per_url(built, pages_small):
    """Pipeline-extracted text (re-derived from html) must equal the
    generator's committed text for every url."""
    from knowledgegraph_ray.pipelines.kg_build import prepare_pages

    gen = pq.read_table(pages_small["paths"][0])
    prepped = prepare_pages(gen)
    assert prepped.column("text").to_pylist() == gen.column("text").to_pylist()


def test_node_counts_and_lineage_manifests(built, pages_small):
    from knowledgegraph_ray.state.manifests import load_manifests

    manifests = load_manifests(built.manifest_dir, stage="extract")
    assert len(manifests) == len(pages_small["paths"])
    assert sum(m.rows_in for m in manifests.values()) == 240
    assert all(m.rows_in == m.rows_out for m in manifests.values())
    assert sum(m.raw_triples for m in manifests.values()) > 0
    graph = load_manifests(built.manifest_dir, stage="graph")["global"]
    assert graph.extra["nodes"] == len(_node_rows(built))
    assert graph.extra["edges"] == len(_edge_rows(built))


def test_partition_count_invariance(built, tmp_path_factory):
    """Same extraction checkpoint, different shuffle parallelism → identical
    graph (scale-invariance, SURVEY.md §5.5)."""
    import shutil, os

    work2 = str(tmp_path_factory.mktemp("kg_work_p5"))
    shutil.copytree(built.extract_dir, os.path.join(work2, "extracted"))
    # different shuffle parallelism AND the fully distributed label-propagation
    # path (cc_driver_threshold=0) vs the default driver union-find fast path
    run_graph_build(work2, num_partitions=5, output_partitions=2,
                    cc_driver_threshold=0)

    def canon_edges(d):
        rows = pq.read_table(os.path.join(d, "edges")).to_pylist()
        return sorted(
            [(r["relation_id"], r["src"], r["dst"], r["type"], r["strength"],
              tuple(sorted(r["sources"])), tuple(r["description"]))
             for r in rows]
        )

    def canon_nodes(d):
        rows = pq.read_table(os.path.join(d, "nodes")).to_pylist()
        return sorted(
            [(r["type"], r["name"], tuple(r["aliases"]), tuple(sorted(r["surfaces"])),
              tuple(sorted(r["emails"])), r["worksAt"], r["domain"])
             for r in rows]
        )

    assert canon_edges(work2) == canon_edges(built.work_dir)
    assert canon_nodes(work2) == canon_nodes(built.work_dir)

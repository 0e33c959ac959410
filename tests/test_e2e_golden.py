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


# ---------------------------------------------------------------------------
# Second golden: larger corpus, different seed, partition-count sweep
# (round-3 VERDICT item: assert P/R == 1.0 beyond the 240-page fixture)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def built_5k(tmp_path_factory):
    from knowledgegraph_ray.sources.pages import generate_pages, write_pages

    out = tmp_path_factory.mktemp("pages_5k")
    paths = write_pages(str(out), n_pages=5000, seed=1234, rows_per_file=1250)
    _, meta = generate_pages(5000, seed=1234)
    work = str(tmp_path_factory.mktemp("kg_work_5k"))
    res = kg_build(
        paths, work,
        batch_size=256, concurrency=2, num_partitions=3, wave_size=4,
    )
    return {"res": res, "meta": meta}


def test_triples_match_oracle_5k_second_seed(built_5k):
    expected = expected_graph(built_5k["meta"])
    produced = {(e["src"], e["type"], e["dst"]) for e in _edge_rows(built_5k["res"])}
    exp_keys = {(s, t, d) for (s, t, d) in expected["triples"]}
    p, r = precision_recall(produced, exp_keys)
    assert (p, r) == (1.0, 1.0), f"P={p} R={r}"
    # clusters too — merge semantics at 5k pages, second seed
    exp = {(c["type"], c["canonical"]): frozenset(c["surfaces"])
           for c in expected["clusters"]}
    got = {(n["type"], n["name"]): frozenset(n["surfaces"])
           for n in _node_rows(built_5k["res"])}
    assert got == exp


def test_partition_sweep_invariance_5k(built_5k, tmp_path_factory):
    """Graph output is identical across a sweep of shuffle parallelisms and
    both CC regimes at 5k pages."""
    import os
    import shutil

    res = built_5k["res"]

    def canon_edges(d):
        rows = pq.read_table(os.path.join(d, "edges")).to_pylist()
        return sorted(
            (r["relation_id"], r["src"], r["dst"], r["type"], r["strength"],
             tuple(sorted(r["sources"])))
            for r in rows
        )

    base = canon_edges(res.work_dir)
    for np_, cc_thr in ((2, None), (9, 0)):
        work2 = str(tmp_path_factory.mktemp(f"kg_work_5k_p{np_}"))
        shutil.copytree(res.extract_dir, os.path.join(work2, "extracted"))
        kwargs = {"num_partitions": np_, "output_partitions": 3}
        if cc_thr is not None:
            kwargs["cc_driver_threshold"] = cc_thr
        run_graph_build(work2, **kwargs)
        assert canon_edges(work2) == base, f"partitions={np_} cc_thr={cc_thr}"

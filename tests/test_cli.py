"""CLI entry points (reference's main.py / query_search.py / kuzu_init.py)."""

import json

import pytest


@pytest.fixture(scope="module")
def built_graph(pages_small, tmp_path_factory, capsys_factory=None):
    from knowledgegraph_ray.cli import main

    work = str(tmp_path_factory.mktemp("cli_work"))
    pages_dir = pages_small["dir"]
    rc = main(["build", "--input", pages_dir, "--work", work,
               "--num-partitions", "2", "--concurrency", "2"])
    assert rc == 0
    return work


def _run(capsys, argv):
    from knowledgegraph_ray.cli import main

    rc = main(argv)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_stats_details_relations(built_graph, capsys):
    stats = _run(capsys, ["stats", "--graph", built_graph])
    assert stats["total_entities"] > 0 and stats["total_relations"] > 0

    name = next(iter(stats["entity_types"]))
    # pick a concrete node name via admin status + details on a known person
    details_any = _run(capsys, ["relations", "--graph", built_graph,
                                "--name", "definitely-not-present"])
    assert details_any == []


def test_cli_search_and_admin(built_graph, capsys, tmp_path):
    out = _run(capsys, ["search", "--graph", built_graph, "--text", "Acme", "-k", "3",
                        "--dim", "64"])
    assert len(out) == 3 and all("name" in r and "cos_r" in r for r in out)

    status = _run(capsys, ["admin", "--graph", built_graph])
    assert status["tables"]["nodes"]["exists"]

    backup = _run(capsys, ["admin", "--graph", built_graph,
                           "--backup-schema", str(tmp_path / "s.json")])
    assert backup["written"].endswith("s.json")

    export = _run(capsys, ["export", "--graph", built_graph,
                           "--out", str(tmp_path / "g.json"), "--stamp", "t0"])
    doc = json.load(open(export["written"]))
    assert doc["metadata"]["total_nodes"] > 0


def test_repl_commands(tmp_path):
    """S-interactive REPL (query_search.py:295-365): search + special
    commands drive the query layer through an injectable input loop."""
    import json

    import ray.data as rd

    from knowledgegraph_ray.cli import run_repl
    from knowledgegraph_ray.pipelines.kg_build import kg_build
    from knowledgegraph_ray.sources.pages import write_pages

    paths = write_pages(str(tmp_path / "pages"), n_pages=40, seed=42, rows_per_file=20)
    res = kg_build(paths, str(tmp_path / "work"), batch_size=32, concurrency=2,
                   num_partitions=2, resume=False, embed=True, embed_dim=16)
    nodes = res.nodes().materialize()
    edges = res.edges().materialize()

    script = iter([
        "help", "stats", "top 3", "simple", "acme organization", "exit",
    ])
    out: list[str] = []
    run_repl(nodes, edges, dim=16,
             input_fn=lambda _: next(script), print_fn=out.append)
    text = "\n".join(out)
    assert "commands:" in text          # help
    assert '"total_entities"' in text   # stats JSON
    assert "results limit: 3" in text   # top N
    assert "display: simple" in text    # simple toggle
    # the free-text search returned at most 3 simple rows of (name, type)
    results = [json.loads(l) for l in out if l.startswith("[")]
    assert results and len(results[-1]) <= 3
    assert set(results[-1][0]) == {"name"}


def test_cli_backend_selection():
    """--llm-backend/--embed-backend resolve correctly: hermetic defaults are
    None (rule/hash paths), real backends fail fast with a clear ImportError
    when their libraries are absent (this container has no openai or
    transformers)."""
    import argparse

    import pytest

    from knowledgegraph_ray.cli import _backend_factory, _embed_backend

    ns = argparse.Namespace(llm_backend="rule", embed_backend="hash")
    assert _backend_factory(ns) is None
    assert _embed_backend(ns) is None

    # without --embed the embed backend is never built at all
    assert _embed_backend(
        argparse.Namespace(embed_backend="transformer", embed=False)
    ) is None

    try:
        import openai  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="openai"):
            _backend_factory(argparse.Namespace(llm_backend="openai"))()
    try:
        import transformers  # noqa: F401
    except ImportError:
        # LazyBackend defers construction to first call (actor side)
        lb = _embed_backend(
            argparse.Namespace(embed_backend="transformer", embed=True)
        )
        assert lb is not None
        with pytest.raises(ImportError, match="transformers"):
            lb(["text"])

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

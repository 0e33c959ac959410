"""Checkpoint-resume: a killed run resumes without duplicate work and yields
the identical final graph (north rule; SURVEY.md §5.4)."""

import os

import pyarrow.parquet as pq

from knowledgegraph_ray.pipelines import kg_build, run_extraction
from knowledgegraph_ray.state.manifests import load_manifests, manifest_path


def _graph_fingerprint(res):
    edges = pq.read_table(res.edges_dir).to_pylist()
    nodes = pq.read_table(res.nodes_dir).to_pylist()
    return (
        sorted((e["relation_id"], e["strength"], tuple(sorted(e["sources"]))) for e in edges),
        sorted((n["type"], n["name"], tuple(n["aliases"])) for n in nodes),
    )


def test_resume_skips_done_shards_and_matches_fresh_run(pages_small, tmp_path_factory):
    paths = pages_small["paths"]
    work_resume = str(tmp_path_factory.mktemp("resume"))
    work_fresh = str(tmp_path_factory.mktemp("fresh"))

    # "Killed" run: only the first half of the shards completed.
    partial = run_extraction(paths[:2], work_resume, batch_size=64,
                             concurrency=2, wave_size=1)
    assert partial["shards_processed"] == 2
    mdir = os.path.join(work_resume, "manifests")
    mtimes = {
        p: os.path.getmtime(manifest_path(mdir, "extract", f"pages-{i:05d}"))
        for i, p in enumerate(paths[:2])
    }

    # Resumed run over the full input: completed shards must be skipped.
    res = kg_build(paths, work_resume, batch_size=64, concurrency=2,
                   num_partitions=2, wave_size=2, resume=True)
    assert res.metrics["extraction"]["shards_skipped_resume"] == 2
    assert res.metrics["extraction"]["shards_processed"] == len(paths) - 2
    for i, p in enumerate(paths[:2]):
        assert os.path.getmtime(
            manifest_path(mdir, "extract", f"pages-{i:05d}")
        ) == mtimes[p], "skipped shard was re-processed"

    fresh = kg_build(paths, work_fresh, batch_size=64, concurrency=2,
                     num_partitions=2, wave_size=4, resume=False)
    assert _graph_fingerprint(res) == _graph_fingerprint(fresh)

    manifests = load_manifests(mdir, stage="extract")
    assert len(manifests) == len(paths)


def test_retry_failed_rows_recovers_clean_graph(tmp_path):
    """Failed-doc records (error column) are re-driven by run_retry_failed
    (RETRY_FAILED_EMAILS parity): after retry with a working backend the
    checkpoint has zero errors and the graph equals a clean run's."""
    import pyarrow.compute as pc

    import ray.data as rd

    from knowledgegraph_ray.pipelines.kg_build import (
        kg_build,
        run_extraction,
        run_graph_build,
        run_retry_failed,
    )
    from knowledgegraph_ray.stages.extract import RuleBasedBackend
    from knowledgegraph_ray.sources.pages import write_pages

    paths = write_pages(str(tmp_path / "pages"), n_pages=80, seed=42, rows_per_file=20)

    class FlakyBackend(RuleBasedBackend):
        """Deterministically fails on a subset of documents."""

        def __call__(self, text: str) -> str:
            if "Issue" in text:
                raise RuntimeError("backend unavailable")
            return super().__call__(text)

    work = str(tmp_path / "work")
    run_extraction(paths, work, batch_size=32, concurrency=2, resume=False,
                   backend_factory=FlakyBackend)
    def count_errors(kind):
        return (
            rd.read_parquet(f"{work}/extracted", columns=["error"])
            .map_batches(
                lambda b: b.filter(pc.match_substring(b.column("error"), kind)),
                batch_format="pyarrow",
            )
            .count()
        )

    errs = count_errors("extraction failed")
    assert errs > 0, "fixture produced no failures"

    out = run_retry_failed(paths, work, batch_size=32, concurrency=2)
    assert out["failed_rows"] == errs
    assert out["retried"] == errs
    # real failures recovered; permanent "Empty content" records remain
    assert count_errors("extraction failed") == 0

    graph = run_graph_build(work, num_partitions=2)
    clean = kg_build(paths, str(tmp_path / "clean"), batch_size=32, concurrency=2,
                     num_partitions=2, resume=False)
    assert graph["nodes"] == clean.metrics["graph"]["nodes"]
    assert graph["edges"] == clean.metrics["graph"]["edges"]


def test_overlap_matches_serial_and_invalidates(pages_small, tmp_path_factory):
    """overlap=True (per-wave background explode into pre-exploded
    checkpoints) must yield the byte-identical graph, survive resume, and
    invalidate stale pre-explosions when a shard is re-extracted."""
    from knowledgegraph_ray.pipelines.kg_build import (
        _pre_explode_markers,
        _usable_pre_explode,
    )

    paths = pages_small["paths"]
    work_s = str(tmp_path_factory.mktemp("ovl_serial"))
    work_o = str(tmp_path_factory.mktemp("ovl_overlap"))

    serial = kg_build(paths, work_s, batch_size=64, concurrency=2,
                      num_partitions=2, wave_size=2, resume=False)
    ovl = kg_build(paths, work_o, batch_size=64, concurrency=2,
                   num_partitions=2, wave_size=2, resume=False, overlap=True)
    assert _graph_fingerprint(serial) == _graph_fingerprint(ovl)

    # the graph build actually consumed the pre-exploded checkpoints
    markers = _pre_explode_markers(work_o)
    assert sorted(s for v in markers.values() for s in v) == [
        f"pages-{i:05d}" for i in range(len(paths))
    ]
    assert _usable_pre_explode(work_o, os.path.join(work_o, "extracted")) is not None

    # deleting one manifest forces re-extraction of that shard on resume;
    # its pre-explosion must be invalidated and rebuilt, graph unchanged
    os.remove(manifest_path(os.path.join(work_o, "manifests"),
                            "extract", "pages-00001"))
    again = kg_build(paths, work_o, batch_size=64, concurrency=2,
                     num_partitions=2, wave_size=2, resume=True, overlap=True)
    assert again.metrics["extraction"]["shards_processed"] == 1
    assert _graph_fingerprint(again) == _graph_fingerprint(serial)

    # overlap run resumed WITHOUT overlap: stale coverage (none for the
    # re-extracted shard) must fall back to inline explode, graph unchanged
    os.remove(manifest_path(os.path.join(work_o, "manifests"),
                            "extract", "pages-00002"))
    plain = kg_build(paths, work_o, batch_size=64, concurrency=2,
                     num_partitions=2, wave_size=2, resume=True, overlap=False)
    assert _usable_pre_explode(work_o, os.path.join(work_o, "extracted")) is None
    assert _graph_fingerprint(plain) == _graph_fingerprint(serial)

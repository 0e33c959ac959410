"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_small(tmp_path_factory):
    """240 synthetic pages in 4 Parquet shards + the oracle fact log."""
    from knowledgegraph_ray.sources.pages import generate_pages, write_pages

    out = tmp_path_factory.mktemp("pages_small")
    paths = write_pages(str(out), n_pages=240, seed=42, rows_per_file=60)
    _, meta = generate_pages(240, seed=42)
    return {"paths": paths, "meta": meta, "dir": str(out)}

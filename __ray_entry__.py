"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) initialises or shuts down Ray.

* ``entry()`` — flagship KG-construction pipeline over a page table derived
  from ``/root/testdata/sf0.001`` (documents mapped into the north-rule page
  shape, plus a deterministic synthetic page block so the graph is non-empty);
  returns the canonical nodes Dataset.
* ``queries()`` / ``oracle_sql()`` — operator coverage per SURVEY.md §2 plus
  the training-data ops (dedup, similarity search, text analysis); oracle SQL
  keys match the SQL-expressible subset, the rest are rows-only by design
  (LSH clustering, heuristic language id, IVF ANN, the KG pipeline itself).
"""

from __future__ import annotations

import html as _html
import os
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import pyarrow as pa
    import ray.data as rd

    from knowledgegraph_ray.pipelines import kg_build
    from knowledgegraph_ray.sources.pages import generate_pages

    sf_dir = "/root/testdata/sf0.001"
    out = "/tmp/kgray_entry"

    # Map the documents table into the north-rule page shape (url, warc_ts,
    # html, text, lang) — html synthesized around the text, text re-derived
    # from html by the pipeline (byte-identical invariant holds by round-trip).
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    from datetime import datetime, timedelta

    epoch = datetime(2024, 1, 1)
    n = docs.num_rows
    pages = pa.table(
        {
            "url": [f"doc://sf0.001/{i}" for i in docs.column("doc_id").to_pylist()],
            "warc_ts": pa.array([epoch + timedelta(seconds=i) for i in range(n)], pa.timestamp("us")),
            "html": [
                f"<html><body><p>{_html.escape(t or '')}</p></body></html>".encode()
                for t in docs.column("text").to_pylist()
            ],
            "text": pa.array([""] * n, pa.large_string()),
            "lang": docs.column("lang"),
            "ord": pa.array(range(n), pa.int64()),
            "permissions": pa.array([[] for _ in range(n)], pa.list_(pa.string())),
        }
    )
    synth, _ = generate_pages(100, seed=42)
    synth = synth.set_column(
        synth.column_names.index("ord"),
        "ord",
        pa.array([n + i for i in range(synth.num_rows)], pa.int64()),
    )

    os.makedirs(f"{out}/pages", exist_ok=True)
    pq.write_table(pages, f"{out}/pages/pages-00000.parquet")
    pq.write_table(synth, f"{out}/pages/pages-00001.parquet")

    res = kg_build(
        [f"{out}/pages/pages-00000.parquet", f"{out}/pages/pages-00001.parquet"],
        f"{out}/work",
        batch_size=128,
        concurrency=2,
        num_partitions=4,
        resume=False,
    )
    return res.nodes()


def queries() -> dict[str, Callable[[str], Any]]:
    from knowledgegraph_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from knowledgegraph_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)

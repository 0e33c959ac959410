"""JSON sources / sinks (S5–S7) and output-layout admin ops (S11).

Re-expresses the reference's JSON export/load surface
(/root/reference/src/workspace_kg/utils/vespa_integration.py:621-1228) on
Ray Data:

* ``export_jsonl``       — JSONL export (:901-950) → ``Dataset.write_json``
                           (Ray's JSON sink emits one JSON object per line)
* ``export_fields``      — lightweight field-subset export (:816-899)
* ``export_by_column``   — grouped-by-doc_type export (:716-814) → one
                           subdirectory per column value
* ``export_graph_json``  — full export with a metadata envelope (:627-714):
                           streamed JSONL parts + small envelope; rows are
                           inlined in the envelope only under an explicit
                           row-count guard (the reference's single-file form
                           is O(graph) driver memory)
* ``load_jsonl`` / ``load_json_documents`` — loaders (:1168-1228)
* ``graph_status`` / ``clean_graph`` / ``backup_schema`` — the Kuzu admin ops
  (kuzu_init.py:139-328) mapped onto the Parquet output layout
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import pyarrow.compute as pc

import ray.data as rd


def export_jsonl(ds: rd.Dataset, path: str) -> str:
    """JSONL export; one object per row, partitioned files under ``path``."""
    ds.write_json(path)
    return path


def export_fields(ds: rd.Dataset, path: str, fields: list[str]) -> str:
    """Lightweight export of a column subset."""
    ds.select_columns(fields).write_json(path)
    return path


def export_by_column(ds: rd.Dataset, path: str, column: str) -> dict[str, str]:
    """Grouped export: one subdirectory per distinct column value.

    The value set is expected to be small (doc types / entity types); each
    value gets its own streamed write with a pushed-down filter."""
    values = sorted(
        r[column] for r in ds.groupby(column).count().select_columns([column]).take_all()
    )
    out: dict[str, str] = {}
    for v in values:
        sub = os.path.join(path, f"{column}={v}")
        ds.filter(expr=f"{column} == {v!r}").write_json(sub)
        out[v] = sub
    return out


def _jsonl_part_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".json") or f.endswith(".jsonl")
    )


def _count_jsonl_rows(d: str) -> int:
    """Row count by streaming the written part files line-by-line — O(bytes)
    IO, O(1) driver memory; avoids re-executing the dataset for a count."""
    n = 0
    for p in _jsonl_part_files(d):
        with open(p) as f:
            n += sum(1 for line in f if line.strip())
    return n


def export_graph_json(
    nodes: rd.Dataset,
    edges: rd.Dataset,
    path: str,
    run_stamp: str = "",
    inline_max_rows: int = 10_000,
) -> str:
    """Full-graph export with a metadata envelope (vespa_integration.py:
    627-714), STREAMED: nodes and edges are written as JSONL part
    directories by the workers (``Dataset.write_json`` — the driver never
    materializes either side), and ``path`` gets a small envelope JSON with
    the counts and part locations.

    The reference's single-file form (nodes/edges inline in the envelope) is
    O(graph) driver memory, so it sits behind an explicit row-count guard:
    only when nodes+edges ≤ ``inline_max_rows`` are the rows inlined (read
    back from the just-written parts, bounded by the guard).  ``run_stamp``
    is caller-injected — no wall clock inside the engine (determinism)."""
    parts = path + ".parts"
    nodes_dir = os.path.join(parts, "nodes")
    edges_dir = os.path.join(parts, "edges")
    for d in (nodes_dir, edges_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    nodes.write_json(nodes_dir)
    edges.write_json(edges_dir)
    n_nodes = _count_jsonl_rows(nodes_dir)
    n_edges = _count_jsonl_rows(edges_dir)
    doc: dict[str, Any] = {
        "metadata": {
            "export_stamp": run_stamp,
            "total_nodes": n_nodes,
            "total_edges": n_edges,
            "format_version": "1.1",
        },
        "nodes_dir": nodes_dir,
        "edges_dir": edges_dir,
    }
    if n_nodes + n_edges <= inline_max_rows:
        for key, d in (("nodes", nodes_dir), ("edges", edges_dir)):
            rows = []
            for p in _jsonl_part_files(d):
                with open(p) as f:
                    rows += [json.loads(line) for line in f if line.strip()]
            doc[key] = rows
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, default=str)
    os.replace(tmp, path)
    return path


def export_jsonl_gz(
    ds: rd.Dataset, path: str, *, level: int = 6,
    batch_size: "int | None" = None,
) -> dict[str, Any]:
    """Gzipped-JSONL shard export — the de-facto training-data interchange
    format.  Each block is compressed and written INSIDE its worker task
    (distributed sink, driver never sees the data); file names are
    content-addressed (sha1 of the gzip bytes, mtime pinned to 0 so the
    bytes are deterministic), which makes the write idempotent — a retried
    task rewrites the identical file instead of duplicating rows.  Returns
    the manifest {files, rows, bytes} and writes it as ``_index.json``
    (the resumable-output pattern: a consumer can verify shard completeness
    without opening shards).  Per-row json.dumps is fine here: an export
    sink is IO-bound by design."""
    import gzip
    import hashlib
    import io

    os.makedirs(path, exist_ok=True)

    def write_block(b) -> "Any":
        import pyarrow as pa_

        buf = io.BytesIO()
        with gzip.GzipFile(
            fileobj=buf, mode="wb", compresslevel=level, mtime=0
        ) as gz:
            for row in b.to_pylist():
                gz.write((json.dumps(row, default=str) + "\n").encode())
        data = buf.getvalue()
        name = hashlib.sha1(data).hexdigest()[:16] + ".jsonl.gz"
        tmp = os.path.join(path, f"{name}.tmp.{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(path, name))
        return pa_.table({
            "file": [name],
            "rows": [b.num_rows],
            "bytes": [len(data)],
        })

    manifest = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=batch_size
    ).take_all()  # O(#shards) rows — tiny
    # content addressing means byte-identical blocks COALESCE into one file
    # (shard-level dedup); the manifest lists each stored file once so its
    # totals always equal what load_jsonl_gz reads back
    by_name = {m["file"]: m for m in manifest}
    files = sorted(
        ({"file": m["file"], "rows": m["rows"], "bytes": m["bytes"]}
         for m in by_name.values()),
        key=lambda m: m["file"],
    )
    index = {
        "files": files,
        "total_rows": sum(m["rows"] for m in files),
        "total_bytes": sum(m["bytes"] for m in files),
        "format": "jsonl.gz",
    }
    # drop shards from PREVIOUS exports into this directory — without this
    # a re-export with different data leaves stale files that a glob-based
    # reader would union into the result
    keep = {m["file"] for m in files}
    for fn in os.listdir(path):
        if fn.endswith(".jsonl.gz") and fn not in keep:
            os.remove(os.path.join(path, fn))
    tmp = os.path.join(path, "_index.json.tmp")
    with open(tmp, "w") as f:
        json.dump(index, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, "_index.json"))
    return index


def load_jsonl_gz(path: str) -> rd.Dataset:
    """Read back an ``export_jsonl_gz`` directory: the ``_index.json``
    manifest is authoritative when present (exactly the exported shard set),
    else fall back to globbing *.jsonl.gz."""
    idx = os.path.join(path, "_index.json")
    if os.path.isfile(idx):
        with open(idx) as f:
            names = [m["file"] for m in json.load(f)["files"]]
        files = [os.path.join(path, n) for n in sorted(names)]
    else:
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".jsonl.gz")
        )
    return rd.read_json(
        files, arrow_open_stream_args={"compression": "gzip"}
    )


def load_jsonl(path: str) -> rd.Dataset:
    return rd.read_json(path)


def load_json_documents(path: str) -> rd.Dataset:
    """Load a driver-written envelope JSON back into (nodes, edges) is the
    caller's concern; this loads flat JSON/JSONL document files."""
    return rd.read_json(path)


# ---------------------------------------------------------------------------
# Output-layout admin (S11 — kuzu_init.py:139-328 equivalents)
# ---------------------------------------------------------------------------


def graph_status(graph_dir: str) -> dict[str, Any]:
    """Counts + schema of the materialized graph layout."""
    out: dict[str, Any] = {"graph_dir": graph_dir, "tables": {}}
    for name in ("nodes", "edges"):
        d = os.path.join(graph_dir, name)
        if not os.path.isdir(d):
            out["tables"][name] = {"exists": False}
            continue
        ds = rd.read_parquet(d)
        schema = ds.schema()
        out["tables"][name] = {
            "exists": True,
            "rows": ds.count(),
            "columns": list(schema.names),
        }
    mdir = os.path.join(graph_dir, "manifests")
    if os.path.isdir(mdir):
        out["manifests"] = len([f for f in os.listdir(mdir) if f.endswith(".json")])
    return out


def clean_graph(graph_dir: str, *, drop_checkpoints: bool = False) -> list[str]:
    """Delete materialized graph outputs (kuzu_init.py clean/drop); the
    extraction checkpoint survives unless drop_checkpoints."""
    removed = []
    targets = ["nodes", "edges"]
    if drop_checkpoints:
        targets += ["extracted", "manifests"]
    for name in targets:
        d = os.path.join(graph_dir, name)
        if os.path.isdir(d):
            shutil.rmtree(d)
            removed.append(d)
    return removed


def backup_schema(graph_dir: str, out_path: str) -> str:
    """Dump the graph tables' Arrow schemas to JSON (kuzu_init.py:280-303)."""
    doc: dict[str, Any] = {}
    for name in ("nodes", "edges"):
        d = os.path.join(graph_dir, name)
        if os.path.isdir(d):
            schema = rd.read_parquet(d).schema()
            doc[name] = {n: str(t) for n, t in zip(schema.names, schema.types)}
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=2, sort_keys=True)
    os.replace(tmp, out_path)
    return out_path


def compact_parquet(
    in_dir: str,
    out_dir: str,
    *,
    target_mb: int = 256,
    columns: "list[str] | None" = None,
) -> dict[str, Any]:
    """Small-file compaction — the table-maintenance pass every
    long-running partitioned-output pipeline needs (thousands of tiny
    per-task files destroy read parallelism economics at 100 TB: open/
    footer costs dominate).  Streams the input directory through Ray Data
    and rewrites it as ~``target_mb`` files: file count follows TOTAL BYTES
    (never the input file count), rows are preserved exactly, and the
    write stays distributed (repartition + write_parquet — the driver
    never holds the data).  Returns {files_in, files_out, rows, bytes}.
    """
    import os

    import ray.data as rd

    files_in = [
        os.path.join(r, f)
        for r, _, fs in os.walk(in_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in files_in)
    n_out = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    ds = rd.read_parquet(in_dir, columns=columns)
    rows = ds.count()
    ds.repartition(int(n_out)).write_parquet(out_dir)
    files_out = [
        f for f in os.listdir(out_dir) if f.endswith(".parquet")
    ]
    return {
        "files_in": len(files_in),
        "files_out": len(files_out),
        "rows": rows,
        "bytes": total_bytes,
    }

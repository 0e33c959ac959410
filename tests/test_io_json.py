"""S5–S7 JSON sinks/sources + S11 layout admin ops."""

import json
import os

import pyarrow as pa

import ray.data as rd

from knowledgegraph_ray.sources.io_json import (
    backup_schema,
    clean_graph,
    export_by_column,
    export_fields,
    export_graph_json,
    export_jsonl,
    graph_status,
    load_jsonl,
)


def _docs_ds():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "doc_type": ["email", "page", "email"],
                "text": ["a", "b", "c"],
            }
        )
    )


def test_jsonl_round_trip(tmp_path):
    p = str(tmp_path / "out")
    export_jsonl(_docs_ds(), p)
    back = sorted(load_jsonl(p).take_all(), key=lambda r: r["doc_id"])
    assert [r["text"] for r in back] == ["a", "b", "c"]


def test_export_fields(tmp_path):
    p = str(tmp_path / "subset")
    export_fields(_docs_ds(), p, ["doc_id", "doc_type"])
    back = load_jsonl(p).take_all()
    assert set(back[0].keys()) == {"doc_id", "doc_type"}


def test_export_by_column(tmp_path):
    p = str(tmp_path / "by_type")
    dirs = export_by_column(_docs_ds(), p, "doc_type")
    assert set(dirs) == {"email", "page"}
    emails = load_jsonl(dirs["email"]).take_all()
    assert sorted(r["doc_id"] for r in emails) == [1, 3]


def test_export_graph_json_and_admin(tmp_path):
    nodes = rd.from_arrow(pa.table({"name": ["A"], "type": ["Person"]}))
    edges = rd.from_arrow(
        pa.table({"relation_id": ["r"], "src": ["A"], "dst": ["A"], "type": ["SELF"]})
    )
    graph_dir = str(tmp_path / "graph")
    nodes.write_parquet(os.path.join(graph_dir, "nodes"))
    edges.write_parquet(os.path.join(graph_dir, "edges"))

    p = str(tmp_path / "export.json")
    export_graph_json(nodes, edges, p, run_stamp="2026-01-01T00:00:00")
    doc = json.load(open(p))
    assert doc["metadata"]["total_nodes"] == 1
    assert doc["nodes"][0]["name"] == "A"
    # the streamed JSONL parts exist regardless of the inline guard
    assert load_jsonl(doc["nodes_dir"]).take_all()[0]["name"] == "A"

    status = graph_status(graph_dir)
    assert status["tables"]["nodes"]["rows"] == 1
    assert "src" in status["tables"]["edges"]["columns"]

    sp = str(tmp_path / "schema.json")
    backup_schema(graph_dir, sp)
    sdoc = json.load(open(sp))
    assert sdoc["nodes"]["name"] == "string"

    removed = clean_graph(graph_dir)
    assert len(removed) == 2
    assert graph_status(graph_dir)["tables"]["nodes"] == {"exists": False}


def test_compact_parquet_preserves_rows(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from knowledgegraph_ray.sources.io_json import compact_parquet

    src = tmp_path / "many"
    src.mkdir()
    total = 0
    for i in range(40):  # forty tiny files
        t = pa.table({"a": pa.array(range(i * 10, i * 10 + 10), pa.int64()),
                      "b": pa.array([f"s{j}" for j in range(10)])})
        pq.write_table(t, src / f"part-{i:03d}.parquet")
        total += 10
    out = tmp_path / "compact"
    res = compact_parquet(str(src), str(out), target_mb=256)
    assert res["files_in"] == 40 and res["rows"] == total
    assert res["files_out"] < 40
    back = rd.read_parquet(str(out)).take_all()
    assert sorted(r["a"] for r in back) == list(range(total))


def test_export_graph_json_streams_past_guard(ray_session, tmp_path):
    """Over the inline row-count guard: envelope stays small (no inline
    rows), parts carry everything, counts exact."""
    n = 500
    nodes = rd.from_arrow(
        pa.table({"name": [f"n{i}" for i in range(n)], "type": ["Person"] * n})
    ).repartition(4)
    edges = rd.from_arrow(
        pa.table(
            {
                "relation_id": [f"r{i}" for i in range(n)],
                "src": [f"n{i}" for i in range(n)],
                "dst": [f"n{(i + 1) % n}" for i in range(n)],
                "type": ["KNOWS"] * n,
            }
        )
    ).repartition(4)
    p = str(tmp_path / "big.json")
    export_graph_json(nodes, edges, p, inline_max_rows=100)
    assert os.path.getsize(p) < 2000  # envelope only, never O(graph)
    doc = json.load(open(p))
    assert "nodes" not in doc and "edges" not in doc
    assert doc["metadata"]["total_nodes"] == n
    assert doc["metadata"]["total_edges"] == n
    back = load_jsonl(doc["edges_dir"])
    assert back.count() == n
    assert sorted(back.take_all()[0].keys()) == ["dst", "relation_id", "src", "type"]


def test_export_jsonl_gz_roundtrip_and_idempotent(ray_session, tmp_path):
    """Distributed gz shard export: exact row round-trip, deterministic
    content-addressed files (re-export writes the identical set), honest
    _index.json manifest."""
    from knowledgegraph_ray.sources.io_json import export_jsonl_gz, load_jsonl_gz

    n = 1000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": [f"doc {i} body" for i in range(n)],
    })).repartition(4)
    p = str(tmp_path / "shards")
    idx = export_jsonl_gz(ds, p, batch_size=None)
    assert idx["total_rows"] == n and len(idx["files"]) >= 2
    names1 = {f["file"] for f in idx["files"]}
    assert all(name.endswith(".jsonl.gz") for name in names1)
    back = load_jsonl_gz(p).take_all()
    assert sorted(r["doc_id"] for r in back) == list(range(n))
    assert json.load(open(os.path.join(p, "_index.json")))["total_rows"] == n
    # idempotence: re-export lands on the identical content-addressed files
    idx2 = export_jsonl_gz(ds, p, batch_size=None)
    assert {f["file"] for f in idx2["files"]} == names1
    assert len([f for f in os.listdir(p) if f.endswith(".jsonl.gz")]) == len(names1)


def test_export_jsonl_gz_stale_cleanup_and_coalescing(ray_session, tmp_path):
    """Re-export with DIFFERENT data removes the previous export's shards
    (the manifest is the directory's single source of truth), and
    byte-identical blocks coalesce with honest totals."""
    from knowledgegraph_ray.sources.io_json import export_jsonl_gz, load_jsonl_gz

    p = str(tmp_path / "s")
    ds1 = rd.from_arrow(pa.table({"a": list(range(100))})).repartition(2)
    export_jsonl_gz(ds1, p)
    ds2 = rd.from_arrow(pa.table({"a": list(range(100, 160))})).repartition(2)
    idx2 = export_jsonl_gz(ds2, p)
    back = sorted(r["a"] for r in load_jsonl_gz(p).take_all())
    assert back == list(range(100, 160))  # no union with the stale export
    on_disk = {f for f in os.listdir(p) if f.endswith(".jsonl.gz")}
    assert on_disk == {f["file"] for f in idx2["files"]}
    # identical blocks coalesce into one stored file, totals match read-back
    dup = rd.from_arrow(pa.table({"a": [1, 2, 3]})).union(
        rd.from_arrow(pa.table({"a": [1, 2, 3]}))
    ).repartition(2)
    # force two identical single-row-set blocks via explicit batch_size
    p2 = str(tmp_path / "dup")
    idx3 = export_jsonl_gz(
        rd.from_items([{"a": 1}, {"a": 1}]).repartition(2), p2, batch_size=1
    )
    assert idx3["total_rows"] == load_jsonl_gz(p2).count()

"""Query layer over the built graph (nodes/ + edges/ Parquet).

Re-expresses /root/reference/query_search.py as Dataset pipelines:

* ``search``      — vector top-k over node embeddings (K1; reference uses the
                    Kuzu HNSW CALL at :49-111; brute-force cosine is exact)
* ``details``     — point lookup by (name [, type]) (:153-184)
* ``relations``   — 1-hop neighborhood, direction flag, LIMIT 20 (:186-226)
* ``stats``       — per-type node histogram + edge count (:259-293, D9)

All functions take Datasets (or paths) and return Datasets; display
formatting (similarity %, :132) is left to callers.
"""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from .knn import topk_cosine


def _ds(x) -> rd.Dataset:
    return rd.read_parquet(x) if isinstance(x, str) else x


def search(nodes, query_vec: np.ndarray, k: int = 10):
    """Top-k nodes by embedding cosine → (name, cos_r).

    topk_cosine keys on an int id column; a stable one is derived from the
    sha256 of the name (names are the graph PK)."""
    import hashlib

    import pyarrow as pa

    def add_id(b):
        ids = [
            int.from_bytes(hashlib.sha256((n or "").encode()).digest()[:8], "little") >> 1
            for n in b.column("name").to_pylist()
        ]
        return b.append_column("vec_id", pa.array(ids, pa.int64()))

    with_ids = (
        _ds(nodes)
        .select_columns(["name", "embedding"])
        .map_batches(add_id, batch_format="pyarrow")
        .materialize()
    )
    top = topk_cosine(with_ids, query_vec, k=k, vec_col="embedding", id_col="vec_id")
    # map ids back to names via broadcast lookup
    from ..functions.joins import adaptive_join

    names = with_ids.select_columns(["vec_id", "name"])
    return adaptive_join(top, names, left_keys=["vec_id"], how="inner").select_columns(
        ["name", "cos_r"]
    )


def details(nodes, name: str, entity_type: str | None = None):
    """Point lookup by primary key (query_search.py:153-184)."""
    ds = _ds(nodes)
    expr = pc.field("name") == name
    if entity_type:
        expr = expr & (pc.field("type") == entity_type)
    return ds.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.equal(b.column("name"), name),
                pc.equal(b.column("type"), entity_type),
            )
            if entity_type
            else pc.equal(b.column("name"), name)
        ),
        batch_format="pyarrow",
    )


def relations(edges, name: str, direction: str = "both", limit: int = 20):
    """1-hop neighborhood with direction flag and LIMIT 20
    (query_search.py:186-226)."""
    ds = _ds(edges)

    def flt(b):
        src_m = pc.equal(b.column("src"), name)
        dst_m = pc.equal(b.column("dst"), name)
        if direction == "out":
            m = src_m
        elif direction == "in":
            m = dst_m
        else:
            m = pc.or_(src_m, dst_m)
        return b.filter(m)

    return ds.map_batches(flt, batch_format="pyarrow").limit(limit)


def stats(nodes, edges) -> dict:
    """DB statistics (D9): node count per type (count desc), total edges."""
    nd, ed = _ds(nodes), _ds(edges)
    by_type = (
        nd.groupby("type")
        .aggregate(Count(alias_name="n"))
        .sort("n", descending=True)
        .take_all()
    )
    return {
        "entity_types": {r["type"]: r["n"] for r in by_type},
        "total_entities": sum(r["n"] for r in by_type),
        "total_relations": ed.count(),
    }

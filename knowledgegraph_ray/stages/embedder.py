"""Warm-model embedder actor pool (T2/T3) with a deterministic default backend.

Mirrors the reference's two embedding providers:

* the local-transformer embedder loads tokenizer+model once in ``__init__``
  and mean-pools per batch (/root/reference/src/workspace_kg/components/
  embedder.py:6-26, pooling :78-82) — here that shape is the Ray actor-pool
  stage: state in ``__init__`` (once per actor), batched encode in
  ``__call__``;
* the Ollama HTTP embedder serializes an entity / relation to text before
  embedding (ollama_embedder.py:61-77 entity, :84-100 relation) — those
  serializations are replicated below as pure functions.

The default backend is a **deterministic hash embedding** (sha256 of the text
seeds a Gaussian unit vector) so the whole pipeline is hermetic; a real
transformer or HTTP backend plugs in by passing ``backend=`` — the actor-pool
plumbing (schema, batch size, concurrency, num_gpus) is identical.

Usage:
    nodes.map_batches(Embedder, batch_format="pyarrow",
                      batch_size=256, concurrency=4,
                      fn_constructor_kwargs={"dim": 1024})
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable

import numpy as np
import pyarrow as pa

DEFAULT_DIM = 1024


def hash_embedding(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Unit-norm vector fully determined by the text bytes."""
    seed = int.from_bytes(hashlib.sha256(text.encode("utf-8")).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def entity_to_text(
    entity_type: str,
    name: str,
    raw_descriptions: list[str] | None = None,
    attributes: dict[str, Any] | None = None,
) -> str:
    """Entity → embedding text (ollama_embedder.py:53-77): type + name +
    first 3 descriptions + key attributes in fixed order."""
    parts = [f"Type: {entity_type}", f"Name: {name}"]
    for d in (raw_descriptions or [])[:3]:
        if d:
            parts.append(f"Description: {d}")
    attrs = attributes or {}
    for key in ("role", "worksAt", "domain", "industry", "status", "url"):
        v = attrs.get(key)
        if isinstance(v, list):
            v = ", ".join(str(x) for x in v if x)
        if v:
            parts.append(f"{key}: {v}")
    return "\n".join(parts)


def relation_to_text(
    rel_type: str,
    descriptions: list[str] | None = None,
    strength: float | None = None,
) -> str:
    """Relation → embedding text (ollama_embedder.py:79-101): tag +
    descriptions + strength."""
    parts = [f"Relation: {rel_type}"]
    for d in (descriptions or [])[:3]:
        if d:
            parts.append(f"Description: {d}")
    if strength is not None:
        parts.append(f"Strength: {strength}")
    return "\n".join(parts)


class Embedder:
    """Actor-pool stage: adds an ``embedding`` list<float32> column.

    ``backend`` is a callable ``list[str] -> np.ndarray (n, dim)`` loaded once
    per actor; default is the deterministic hash embedding."""

    def __init__(
        self,
        dim: int = DEFAULT_DIM,
        backend: Callable[[list[str]], np.ndarray] | None = None,
        mode: str = "node",
    ) -> None:
        self.dim = dim
        self.backend = backend or self._hash_backend
        self.mode = mode

    def _hash_backend(self, texts: list[str]) -> np.ndarray:
        return np.stack([hash_embedding(t, self.dim) for t in texts])

    def _texts(self, batch: pa.Table) -> list[str]:
        if self.mode == "node":
            types = batch.column("type").to_pylist()
            names = batch.column("name").to_pylist()
            descs = (
                batch.column("rawDescriptions").to_pylist()
                if "rawDescriptions" in batch.column_names
                else [None] * len(names)
            )
            return [
                entity_to_text(t or "", n or "", d or [])
                for t, n, d in zip(types, names, descs)
            ]
        types = batch.column("type").to_pylist()
        descs = (
            batch.column("description").to_pylist()
            if "description" in batch.column_names
            else [None] * len(types)
        )
        strengths = (
            batch.column("strength").to_pylist()
            if "strength" in batch.column_names
            else [None] * len(types)
        )
        return [
            relation_to_text(t or "", d or [], s)
            for t, d, s in zip(types, descs, strengths)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = self._texts(batch)
        names = batch.column_names
        if "_old_text" in names and "_old_embedding" in names:
            # D4 regenerate-on-change (systematic_merge_provider.py:687-696):
            # rows whose serialization text is unchanged KEEP the stored
            # embedding — only changed/new rows hit the model backend.
            old_t = batch.column("_old_text").to_pylist()
            old_e = batch.column("_old_embedding").to_pylist()
            out: list[list[float] | None] = [None] * len(texts)
            to_embed = [
                i
                for i, (t, ot, oe) in enumerate(zip(texts, old_t, old_e))
                if oe is None or ot != t
            ]
            if to_embed:
                new_vecs = self.backend([texts[i] for i in to_embed])
                for j, i in enumerate(to_embed):
                    out[i] = [float(x) for x in new_vecs[j]]
            for i, oe in enumerate(old_e):
                if out[i] is None:
                    out[i] = oe
            batch = batch.drop_columns(["_old_text", "_old_embedding"])
            col = pa.array(out, pa.list_(pa.float32()))
        else:
            vecs = self.backend(texts)
            col = pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))
        if "embedding" in batch.column_names:
            batch = batch.drop_columns(["embedding"])
        return batch.append_column("embedding", col)


def embed_nodes(nodes, *, dim: int = DEFAULT_DIM, concurrency: int = 2,
                batch_size: int = 256, num_gpus: float | None = None,
                backend: Callable[[list[str]], np.ndarray] | None = None):
    """nodes Dataset → nodes + embedding column (actor pool)."""
    kwargs: dict[str, Any] = {}
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    ctor: dict[str, Any] = {"dim": dim, "mode": "node"}
    if backend is not None:
        ctor["backend"] = backend
    return nodes.map_batches(
        Embedder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=ctor,
        **kwargs,
    )


def node_embed_texts(batch: pa.Table) -> list[str]:
    """Serialization text per node row (the Embedder's node mode, exposed so
    the incremental change-detector computes identical texts)."""
    return Embedder(mode="node")._texts(batch)


def reembed_changed_nodes(
    nodes_new,
    existing_nodes,
    *,
    dim: int = DEFAULT_DIM,
    backend: Callable[[list[str]], np.ndarray] | None = None,
    concurrency: int = 2,
    batch_size: int = 256,
):
    """Incremental D4 embedding refresh: merged nodes reuse the stored
    embedding when their serialization text is unchanged, and re-embed
    otherwise (reference systematic_merge_provider.py:687-696 — embeddings
    regenerate when name/descriptions change on merge).

    existing (type, name) → (old text, old embedding) is broadcast by object
    refs; the per-row compare happens inside the embedder actors."""
    import ray
    import pyarrow.compute as pc

    from ..functions.joins import lookup_join

    def old_cols(b: pa.Table) -> pa.Table:
        texts = node_embed_texts(b)
        emb = (
            b.column("embedding")
            if "embedding" in b.column_names
            else pa.nulls(b.num_rows, pa.list_(pa.float32()))
        )
        return pa.Table.from_pydict(
            {
                "type": b.column("type"),
                "name": b.column("name"),
                "_old_text": pa.array(texts, pa.string()),
                "_old_embedding": pc.cast(emb, pa.list_(pa.float32())),
            }
        )

    old_map = existing_nodes.map_batches(old_cols, batch_format="pyarrow").materialize()
    joined = lookup_join(
        nodes_new, old_map.to_arrow_refs(), left_keys=["type", "name"], how="left",
        right_schema=pa.schema(
            [("type", pa.string()), ("name", pa.string()),
             ("_old_text", pa.string()),
             ("_old_embedding", pa.list_(pa.float32()))]
        ),
    )
    kwargs: dict[str, Any] = {"dim": dim, "mode": "node"}
    if backend is not None:
        kwargs["backend"] = backend
    return joined.map_batches(
        Embedder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=kwargs,
    )


def embed_edges(edges, *, dim: int = DEFAULT_DIM, concurrency: int = 2,
                batch_size: int = 256, num_gpus: float | None = None,
                backend: Callable[[list[str]], np.ndarray] | None = None):
    kwargs: dict[str, Any] = {}
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    ctor: dict[str, Any] = {"dim": dim, "mode": "edge"}
    if backend is not None:
        ctor["backend"] = backend
    return edges.map_batches(
        Embedder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=ctor,
        **kwargs,
    )

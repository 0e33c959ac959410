"""Distributed linear-model training (the quality-classifier pipeline).

A 100-TB webtext pipeline trains cheap linear filters (fastText-style
quality/topic classifiers) over hashed features before any expensive model
sees the data.  This module supplies that stage Ray-Data-first, following
`knn.kmeans_fit`'s iterative-algorithm shape:

* features are dense hashed token counts built per batch (one vectorized
  FNV pass over the block's token buffer — no per-row Python);
* training is FULL-BATCH gradient descent: each iteration is ONE
  map_batches pass emitting a fixed-size partial per block (∇ vector +
  loss + count, O(dim) rows — never the corpus), combined on the driver;
  full-batch (not SGD) so the result is independent of row order and
  partitioning up to float-sum order — the kmeans determinism contract;
* below ``small_data_rows`` the block matrices are collected once and the
  iterations run driver-side (the pagerank/kmeans small-data regime) —
  identical math, no per-iteration scheduling overhead.

The reference has no trainer (its models are external services); this is
training-data-pipeline surface on top, like the dedup/featurizer families.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.hashing import hash_string_array


def dense_hash_features(
    batch: pa.Table, *, text_col: str = "text", dim: int = 256
) -> np.ndarray:
    """(n, dim) float64 L2-normalized hashed token counts — the hashing
    trick (Weinberger et al. 2009) with the repo's FNV token hash; fully
    vectorized (split + one hash pass + np.add.at scatter)."""
    n = batch.num_rows
    X = np.zeros((n, dim), np.float64)
    if n == 0:
        return X
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(pc.coalesce(col, ""), " ")
    flat = pc.list_flatten(toks)
    offsets = np.asarray(toks.offsets)
    rows = np.repeat(
        np.arange(n, dtype=np.int64), np.diff(offsets.astype(np.int64))
    )
    if len(flat):
        feats = (hash_string_array(flat) % np.uint64(dim)).astype(np.int64)
        np.add.at(X, (rows, feats), 1.0)
    norms = np.linalg.norm(X, axis=1)
    X /= np.where(norms == 0, 1.0, norms)[:, None]
    return X


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _block_grad(
    X: np.ndarray, y: np.ndarray, w: np.ndarray, b: float
) -> tuple[np.ndarray, float, float, int]:
    """Gradient/loss partials for one block (unregularized; L2 is applied
    once per iteration on the driver so it never multiplies with blocks)."""
    p = _sigmoid(X @ w + b)
    err = p - y
    eps = 1e-12
    loss = float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())
    return X.T @ err, float(err.sum()), loss, X.shape[0]


def logreg_fit(
    ds: rd.Dataset,
    *,
    label_col: str,
    features_fn: Callable[[pa.Table], np.ndarray],
    dim: int,
    iters: int = 50,
    lr: float = 2.0,
    l2: float = 1e-4,
    small_data_rows: int = 2_000_000,
) -> dict[str, Any]:
    """Full-batch logistic regression → {"w", "b", "loss", "n"}.

    ``features_fn(batch) -> (n, dim)`` runs inside the workers; labels are
    0/1 in ``label_col``.  Per iteration ONE streaming pass emits per-block
    (∇w, ∇b, loss, n) partials; the driver takes the gradient step with L2.
    Deterministic at any parallelism up to float-sum order (allclose — the
    kmeans cross-layout contract), because full-batch GD has no sample
    ordering."""
    mat = ds.materialize()
    n_total = mat.count()
    w = np.zeros(dim, np.float64)
    b = 0.0
    losses: list[float] = []

    if n_total == 0:
        return {"w": w, "b": b, "loss": losses, "n": 0}

    def step(partials: list[tuple[np.ndarray, float, float, int]]) -> None:
        nonlocal w, b
        gw = np.zeros(dim, np.float64)
        gb = 0.0
        loss = 0.0
        for pw, pb, pl, _ in partials:
            gw += pw
            gb += pb
            loss += pl
        gw = gw / n_total + l2 * w
        gb /= n_total
        loss = loss / n_total + 0.5 * l2 * float(w @ w)
        w = w - lr * gw
        b = b - lr * gb
        losses.append(loss)

    if n_total <= small_data_rows:
        blocks = []
        for t in ray.get(mat.to_arrow_refs()):
            if t.num_rows:
                X = features_fn(t)
                y = t.column(label_col).to_numpy(zero_copy_only=False).astype(
                    np.float64
                )
                blocks.append((X, y))
        for _ in range(iters):
            step([_block_grad(X, y, w, b) for X, y in blocks])
        return {"w": w, "b": b, "loss": losses, "n": n_total}

    for _ in range(iters):
        ref = ray.put((w, b))

        def partial_tbl(t: pa.Table) -> pa.Table:
            wi, bi = ray.get(ref)
            X = features_fn(t)
            y = t.column(label_col).to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            gw, gb, loss, cnt = _block_grad(X, y, wi, bi)
            flat = pa.array(gw, pa.float64())
            return pa.table({
                "gw": pa.FixedSizeListArray.from_arrays(flat, dim),
                "gb": pa.array([gb], pa.float64()),
                "loss": pa.array([loss], pa.float64()),
                "n": pa.array([cnt], pa.int64()),
            })

        parts = []
        for t in ray.get(
            mat.map_batches(partial_tbl, batch_format="pyarrow")
            .materialize().to_arrow_refs()
        ):
            for i in range(t.num_rows):
                parts.append((
                    np.asarray(t.column("gw")[i].values, np.float64).copy(),
                    t.column("gb")[i].as_py(),
                    t.column("loss")[i].as_py(),
                    t.column("n")[i].as_py(),
                ))
        step(parts)
    return {"w": w, "b": b, "loss": losses, "n": n_total}


def logreg_score(
    ds: rd.Dataset,
    model: dict[str, Any],
    *,
    features_fn: Callable[[pa.Table], np.ndarray],
    out_col: str = "score",
) -> rd.Dataset:
    """Append the model probability per row (one streaming pass; the weight
    vector travels by closure capture — O(dim), tiny)."""
    w = np.asarray(model["w"], np.float64)
    b = float(model["b"])

    def add(t: pa.Table) -> pa.Table:
        p = _sigmoid(features_fn(t) @ w + b)
        return t.append_column(out_col, pa.array(p, pa.float64()))

    return ds.map_batches(add, batch_format="pyarrow")

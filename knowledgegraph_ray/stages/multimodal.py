"""Multimodal (image/audio/video) operators over opaque binary columns.

The engine treats media as ``payload: binary`` plus typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…), processed by
actor-pool ``map_batches`` stages — the same warm-state pattern as the triple
extractor and embedder.  The decode kernels themselves require codec
libraries that are NOT in this container, so each stage takes a ``decoder``
backend; the default is either

* ``NotImplementedError`` (``backend="strict"``) — the clearly-marked stub, or
* a deterministic fake (``backend="fake"``) that derives pixels/samples from
  the payload bytes, so the Ray-side plumbing (schema, batch shapes, actor
  signature, output layout) is fully real and testable.

Scale notes: media rows are wide — stages force small ``batch_size`` and the
output drops the payload as soon as features are extracted (same rule as
dropping ``html`` after text extraction, SURVEY.md §7 "wide rows").
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta_json", pa.string()),
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


def _fake_pixels(payload: bytes, width: int = 32, height: int = 32) -> np.ndarray:
    """Deterministic fake decode: payload bytes → (h, w, 3) uint8."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


class ImageDecoder:
    """Actor-pool stage: binary payload → decoded pixels → pooled feature.

    A real deployment passes ``backend="pillow"``-style decoders; this
    container has no imaging libraries, so "strict" raises the documented
    NotImplementedError and "fake" produces deterministic pixels.
    """

    def __init__(self, backend: str = "fake", resize: tuple[int, int] = (32, 32)) -> None:
        self.backend = backend
        self.resize = resize
        if backend == "pillow":  # pragma: no cover - not installed here
            import importlib

            if importlib.util.find_spec("PIL") is None:
                raise NotImplementedError(
                    "pillow backend requested but PIL is not installed in this "
                    "environment; use backend='fake' for the deterministic stub"
                )

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.backend == "fake":
            w, h = self.resize
            return _fake_pixels(payload, w, h)
        raise NotImplementedError(
            f"image decode backend {self.backend!r} requires codec libraries "
            "not present in this container"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out: dict[str, list[Any]] = {k: [] for k in IMAGE_FEATURES_SCHEMA.names}
        for mid, payload in zip(ids, payloads):
            px = self._decode(payload or b"")
            # pooled per-channel mean/std feature (stand-in for a CNN embed)
            feat = np.concatenate(
                [px.mean(axis=(0, 1)) / 255.0, px.std(axis=(0, 1)) / 255.0]
            ).astype(np.float32)
            out["media_id"].append(mid)
            out["height"].append(px.shape[0])
            out["width"].append(px.shape[1])
            out["channels"].append(px.shape[2])
            out["feature"].append(feat.tolist())
        return pa.Table.from_pydict(out, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("n_samples", pa.int64()),
        ("sample_rate", pa.int32()),
        ("rms", pa.float32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


class AudioFeaturizer:
    """Actor-pool stage: audio payload → windowed energy features."""

    def __init__(self, backend: str = "fake", sample_rate: int = 16000, windows: int = 16) -> None:
        self.backend = backend
        self.sample_rate = sample_rate
        self.windows = windows

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.backend == "fake":
            seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "little")
            rng = np.random.default_rng(seed)
            return rng.standard_normal(self.sample_rate).astype(np.float32)
        raise NotImplementedError(
            f"audio decode backend {self.backend!r} requires codec libraries "
            "not present in this container"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list[Any]] = {k: [] for k in AUDIO_FEATURES_SCHEMA.names}
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            samples = self._decode(payload or b"")
            chunks = np.array_split(samples, self.windows)
            energy = np.array([float(np.sqrt((c**2).mean())) for c in chunks], dtype=np.float32)
            out["media_id"].append(mid)
            out["n_samples"].append(len(samples))
            out["sample_rate"].append(self.sample_rate)
            out["rms"].append(float(np.sqrt((samples**2).mean())))
            out["feature"].append(energy.tolist())
        return pa.Table.from_pydict(out, schema=AUDIO_FEATURES_SCHEMA)


class VideoFrameSampler:
    """Actor-pool stage: video payload → N sampled frames' pooled features.

    Emits one row per sampled frame (flat_map shape), payload dropped."""

    FRAME_SCHEMA = pa.schema(
        [
            ("media_id", pa.string()),
            ("frame_idx", pa.int32()),
            ("feature", pa.list_(pa.float32())),
        ]
    )

    def __init__(self, backend: str = "fake", n_frames: int = 4) -> None:
        self.backend = backend
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list[Any]] = {k: [] for k in self.FRAME_SCHEMA.names}
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            if self.backend != "fake":
                raise NotImplementedError(
                    f"video decode backend {self.backend!r} requires codec "
                    "libraries not present in this container"
                )
            for f in range(self.n_frames):
                px = _fake_pixels((payload or b"") + f.to_bytes(4, "little"), 16, 16)
                feat = (px.mean(axis=(0, 1)) / 255.0).astype(np.float32)
                out["media_id"].append(mid)
                out["frame_idx"].append(f)
                out["feature"].append(feat.tolist())
        return pa.Table.from_pydict(out, schema=self.FRAME_SCHEMA)


def decode_images(ds, *, concurrency: int = 2, batch_size: int = 64, backend: str = "fake"):
    """Media dataset → image features (small batches: wide binary rows)."""
    return ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"backend": backend},
    )


def featurize_audio(ds, *, concurrency: int = 2, batch_size: int = 64, backend: str = "fake"):
    return ds.map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"backend": backend},
    )


def sample_video_frames(ds, *, concurrency: int = 2, batch_size: int = 16,
                        backend: str = "fake", n_frames: int = 4):
    return ds.map_batches(
        VideoFrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"backend": backend, "n_frames": n_frames},
    )


def synth_media_table(n: int, seed: int = 5, media_type: str = "image") -> pa.Table:
    """Deterministic synthetic media rows for tests/benches."""
    rng = np.random.default_rng(seed)
    rows = {
        "media_id": [f"{media_type}-{i:06d}" for i in range(n)],
        "media_type": [media_type] * n,
        "payload": [rng.bytes(256) for _ in range(n)],
        "meta_json": ["{}"] * n,
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)

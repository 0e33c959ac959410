"""Baseline JPEG codec (stages/jpeg.py): round-trips, sampling modes,
decoder strictness, and integration with the raw image backend."""

import numpy as np
import pytest

from knowledgegraph_ray.stages.jpeg import (
    QUANT_LUMA,
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)
from knowledgegraph_ray.stages.multimodal import synth_smooth_image


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert (ZIGZAG[UNZIGZAG] == np.arange(64)).all()
    # the canonical start and end of the scan
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63
    # Annex K.1 spot values
    assert QUANT_LUMA[0] == 16 and QUANT_LUMA[63] == 99


def test_roundtrip_444_and_420():
    px = synth_smooth_image(5, size=40)[:37, :40]  # non-multiple-of-8 dims
    hi = encode_jpeg(px, quality=95)
    assert hi[:2] == b"\xff\xd8" and hi[-2:] == b"\xff\xd9"
    back = decode_jpeg(hi)
    assert back.shape == px.shape
    assert _psnr(back, px) > 38.0
    sub = decode_jpeg(encode_jpeg(px, quality=85, subsample=True))
    assert sub.shape == px.shape
    assert _psnr(sub, px) > 24.0  # chroma pooled 2x on a chroma-rich image
    # quality actually trades bytes for fidelity
    lo = encode_jpeg(px, quality=30)
    assert len(lo) < len(hi)
    assert _psnr(decode_jpeg(lo), px) < _psnr(back, px)


def test_roundtrip_grayscale():
    px = synth_smooth_image(9, size=32)
    back = decode_jpeg(encode_jpeg(px, quality=92, gray=True))
    assert back.shape == px.shape
    assert (back[..., 0] == back[..., 1]).all()
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert _psnr(back[..., 0], luma) > 40.0


def test_many_seeds_never_crash_and_stay_close():
    """20 seeded images through encode→decode: exercises byte stuffing and
    every Huffman size class statistically; reconstruction stays faithful."""
    for seed in range(20):
        px = synth_smooth_image(seed, size=24)
        back = decode_jpeg(encode_jpeg(px, quality=90))
        assert back.shape == px.shape
        assert _psnr(back, px) > 33.0, f"seed {seed}"


def test_decoder_strict_boundaries():
    px = synth_smooth_image(2, size=16)
    data = bytearray(encode_jpeg(px, quality=80))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01")
    # flip SOF0 → SOF2 (progressive): a clear refusal, not garbage output
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))


def test_raw_backend_dispatches_jpeg_and_phash_is_stable(ray_session):
    """JPEG payloads flow through the raw image backend; q95 lossy decode
    stays within a few pHash bits of the lossless BMP of the same pixels."""
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.multimodal import (
        bmp_bytes,
        compute_phashes,
    )

    imgs = [synth_smooth_image(s) for s in range(12)]

    def hashes(encoder, tag):
        t = pa.table({
            "media_id": [f"{tag}{i:02d}" for i in range(len(imgs))],
            "media_type": ["image"] * len(imgs),
            "payload": pa.array([encoder(p) for p in imgs], pa.binary()),
            "meta_json": ["{}"] * len(imgs),
        })
        rows = compute_phashes(
            rd.from_arrow(t), backend="raw", concurrency=2
        ).take_all()
        return dict((r["media_id"][1:], r["phash"]) for r in rows)

    hb = hashes(bmp_bytes, "b")
    hj = hashes(lambda p: encode_jpeg(p, quality=95), "j")
    for k in hb:
        ham = bin((hb[k] ^ hj[k]) & 0xFFFFFFFFFFFFFFFF).count("1")
        assert ham <= 8, f"img {k}: pHash drifted {ham} bits under q95 JPEG"

"""FLAC codec (stages/flac.py): bit-exact round-trips in every mode, CRC
strictness, and fingerprint parity with WAV through the raw audio backend."""

import numpy as np
import pytest

from knowledgegraph_ray.stages.flac import decode_flac, encode_flac


def _sig(seed: int, n: int = 20000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return np.clip(
        9000 * np.sin(2 * np.pi * (300 + 20 * seed) * t / 16000)
        + rng.normal(0, 60, n),
        -32768, 32767,
    ).astype(np.int16)


def test_mono_roundtrip_bit_exact_and_compresses():
    x = _sig(1)
    data = encode_flac(x, 16000)
    back, rate = decode_flac(data)
    assert rate == 16000
    np.testing.assert_array_equal(back[:, 0], x)
    assert len(data) < x.nbytes  # the predictor+Rice actually compress


def test_stereo_all_decorrelation_modes():
    left = _sig(2, 12000)
    rng = np.random.default_rng(7)
    right = np.clip(
        left.astype(np.int64) * 4 // 5 + rng.normal(0, 40, left.size).astype(np.int64),
        -32768, 32767,
    ).astype(np.int16)
    st = np.stack([left, right], axis=1)
    sizes = {}
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        data = encode_flac(st, 44100, stereo_mode=mode)
        back, rate = decode_flac(data)
        assert rate == 44100
        np.testing.assert_array_equal(back, st, err_msg=mode)
        sizes[mode] = len(data)
    # correlated channels: decorrelation must beat independent coding
    assert min(sizes["left_side"], sizes["mid_side"]) < sizes["independent"]


def test_pathological_signals():
    rng = np.random.default_rng(3)
    for sig in (
        np.full(5000, -123, np.int16),                      # constant
        rng.integers(-32768, 32768, 9000).astype(np.int16),  # incompressible
        np.array([1], np.int16),                             # single sample
        np.array([-32768, 32767] * 10, np.int16),            # full swing
    ):
        back, _ = decode_flac(encode_flac(sig, 8000))
        np.testing.assert_array_equal(back[:, 0], sig)


def test_crc_corruption_detected():
    data = bytearray(encode_flac(_sig(4, 6000), 16000))
    data[-100] ^= 0x01  # flip a bit inside the last frame's entropy data
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(data))
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(b"RIFFxxxx")


def test_raw_backend_fingerprint_parity_with_wav(ray_session):
    """FLAC is lossless, so the audio fingerprints of a FLAC corpus must be
    IDENTICAL to the WAV corpus of the same samples (unlike JPEG's few-bit
    pHash drift) — the dedup pipeline is container-agnostic."""
    import pyarrow as pa

    import ray.data as rd

    from knowledgegraph_ray.stages.multimodal import (
        compute_audio_fingerprints,
        synth_tone_wav,
        wav_bytes,
    )

    sigs = [synth_tone_wav(s).astype(np.int16) for s in range(16)]

    def fingerprints(encoder, tag):
        t = pa.table({
            "media_id": [f"{tag}{i:02d}" for i in range(len(sigs))],
            "media_type": ["audio"] * len(sigs),
            "payload": pa.array([encoder(x) for x in sigs], pa.binary()),
            "meta_json": ["{}"] * len(sigs),
        })
        rows = compute_audio_fingerprints(
            rd.from_arrow(t), backend="raw", concurrency=2
        ).take_all()
        return sorted((r["media_id"][1:], r["afp"]) for r in rows)

    wav = fingerprints(lambda x: wav_bytes(x, 8000), "w")
    flac = fingerprints(lambda x: encode_flac(x, 8000), "f")
    assert wav == flac

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


def test_decoder_paths_encoder_never_emits():
    """Hand-built single-frame streams exercise the decode paths the
    repo's encoder doesn't produce: LPC subframes, VERBATIM, Rice escape
    partitions, partition order > 0, and wasted bits."""
    from knowledgegraph_ray.stages.flac import (
        _BitsW,
        _crc8,
        _crc16,
        _utf8_number,
    )

    def streaminfo(n: int) -> bytes:
        w = _BitsW()
        w.write(16, 16); w.write(16, 16); w.write(0, 24); w.write(0, 24)
        w.write(44100, 20); w.write(0, 3); w.write(15, 5); w.write(n, 36)
        w.align()
        body = bytes(w.out) + b"\x00" * 16
        return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body

    def frame(n: int, subframe_bits) -> bytes:
        w = _BitsW()
        w.write(0b11111111111110, 14); w.write(0, 1); w.write(0, 1)
        w.write(6, 4)      # 8-bit blocksize-1 follows
        w.write(9, 4)      # 44100
        w.write(0, 4)      # mono
        w.write(4, 3)      # 16 bps
        w.write(0, 1)
        for b in _utf8_number(0):
            w.write(b, 8)
        w.write(n - 1, 8)
        w.align()
        hdr = bytes(w.out)
        w2 = _BitsW()
        subframe_bits(w2)
        w2.align()
        f = hdr + bytes([_crc8(hdr)]) + bytes(w2.out)
        return f + _crc16(f).to_bytes(2, "big")

    def rice_write(w, v, param):
        u = (v << 1) if v >= 0 else (((-v) << 1) - 1)
        w.write(1, (u >> param) + 1)
        if param:
            w.write(u & ((1 << param) - 1), param)

    # --- LPC order 2, shift 5, two Rice partitions (order 1) -------------
    n = 16
    x = [100, -200, 150, 300, -50, 0, 75, -125, 30, 60, -90, 180, 22, -7, 8, 1]
    c1, c2, shift = 40, -13, 5
    res = []
    for k in range(2, n):
        pred = (c1 * x[k - 1] + c2 * x[k - 2]) >> shift
        res.append(x[k] - pred)

    def lpc_sub(w):
        w.write(0, 1)
        w.write(32 + 1, 6)  # LPC, order 2 (type = 32 + order - 1)
        w.write(0, 1)       # no wasted bits
        for v in x[:2]:
            w.write(v & 0xFFFF, 16)
        w.write(14, 4)      # precision-1 → 15-bit coefs
        w.write(shift & 0x1F, 5)
        for c in (c1, c2):
            w.write(c & 0x7FFF, 15)
        w.write(0, 2)       # 4-bit rice params
        w.write(1, 4)       # partition order 1 → two partitions
        w.write(6, 4)       # param for partition 0 (16/2 - 2 = 6 samples)
        for v in res[:6]:
            rice_write(w, v, 6)
        w.write(15, 4)      # ESCAPE partition: raw bit count follows
        w.write(12, 5)      # 12-bit raw residuals
        for v in res[6:]:
            w.write(v & 0xFFF, 12)

    from knowledgegraph_ray.stages.flac import decode_flac

    back, rate = decode_flac(streaminfo(n) + frame(n, lpc_sub))
    assert rate == 44100
    np.testing.assert_array_equal(back[:, 0], np.array(x, np.int16))

    # --- VERBATIM with 1 wasted bit ---------------------------------------
    y = [2 * v for v in (-5, 7, 100, -300, 0, 12, -1, 9)]  # all even

    def verb_sub(w):
        w.write(0, 1)
        w.write(1, 6)   # VERBATIM
        w.write(1, 1)   # wasted-bits flag
        w.write(1, 1)   # unary 0 → wasted = 1 (a single terminating 1-bit)
        for v in y:
            w.write((v >> 1) & 0x7FFF, 15)  # bps - wasted = 15

    back2, _ = decode_flac(streaminfo(len(y)) + frame(len(y), verb_sub))
    np.testing.assert_array_equal(back2[:, 0], np.array(y, np.int16))


def test_reserved_channel_assignment_raises_valueerror():
    from knowledgegraph_ray.stages.flac import encode_flac

    data = bytearray(encode_flac(_sig(5, 5000), 16000))
    # frame header starts right after metadata; chan bits live in byte 3 of
    # the frame — instead of bit surgery, scan for the sync and patch the
    # channel nibble (upper 4 bits of the 4th header byte) to 11 (reserved)
    i = data.index(b"\xff\xf8", 4)
    data[i + 3] = (0xB << 4) | (data[i + 3] & 0x0F)
    with pytest.raises(ValueError, match="(channel|CRC)"):
        decode_flac(bytes(data))

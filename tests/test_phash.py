"""Perceptual-hash image dedup (stages/multimodal: PHasher,
phash_neardup_pairs, bmp_bytes).

Oracles: byte-exact BMP encode/decode round-trip, a sequential brute-force
all-pairs hamming reference (the banding is EXACT for max_hamming ≤ 3 by
pigeonhole), planted near-duplicate recovery, and partition invariance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from knowledgegraph_ray.stages.multimodal import (
    PHasher,
    bmp_bytes,
    compute_phashes,
    decode_bmp,
    phash_neardup_pairs,
    synth_smooth_image as _smooth_image,
)


def _media(images: list[np.ndarray], parts=3) -> rd.Dataset:
    tbl = pa.table({
        "media_id": pa.array([f"img-{i:04d}" for i in range(len(images))]),
        "media_type": pa.array(["image"] * len(images)),
        "payload": pa.array([bmp_bytes(px) for px in images], pa.binary()),
        "meta_json": pa.array(["{}"] * len(images)),
    })
    return rd.from_arrow(tbl).repartition(parts)


def test_bmp_roundtrip_byte_exact():
    px = _smooth_image(3, 17)  # odd width exercises row padding
    assert np.array_equal(decode_bmp(bmp_bytes(px)), px)


def test_phash_neardup_matches_bruteforce(ray_session):
    images = [_smooth_image(i) for i in range(40)]
    # planted near-dups: a 1-pixel nudge and an exact copy
    near = images[5].copy()
    near[0, 0, 0] = min(254, near[0, 0, 0]) + 1
    images.append(near)           # img-0040 ~ img-0005
    images.append(images[12].copy())  # img-0041 == img-0012

    hasher = PHasher(backend="raw")
    tbl = pa.table({
        "media_id": pa.array([f"img-{i:04d}" for i in range(len(images))]),
        "payload": pa.array([bmp_bytes(px) for px in images], pa.binary()),
    })
    local = hasher(tbl)
    hs = local.column("phash").to_numpy(zero_copy_only=False).astype(np.uint64)
    ids = local.column("media_id").to_pylist()
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(hs[i]) ^ int(hs[j])).count("1")
            if d <= 3:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j]), d))
    assert ("img-0012", "img-0041", 0) in want

    for parts in (1, 4):
        out = phash_neardup_pairs(
            compute_phashes(_media(images, parts), backend="raw"),
            max_hamming=3,
        ).take_all()
        got = {(r["a"], r["b"], r["hamming"]) for r in out}
        assert got == want, parts


def test_phash_determinism_across_batches(ray_session):
    images = [_smooth_image(i + 100) for i in range(20)]
    one = compute_phashes(_media(images, 1), backend="raw").take_all()
    four = compute_phashes(_media(images, 4), backend="raw").take_all()
    assert {(r["media_id"], r["phash"]) for r in one} == \
        {(r["media_id"], r["phash"]) for r in four}


def test_wav_roundtrip_and_audio_fingerprint_neardup(ray_session):
    from knowledgegraph_ray.stages.multimodal import (
        AudioFingerprinter,
        audio_fingerprint64,
        compute_audio_fingerprints,
        decode_wav_pcm16,
        phash_neardup_pairs,
        synth_tone_wav,
        wav_bytes,
    )

    # byte round-trip: encode -> decode recovers the exact samples
    x = synth_tone_wav(7)
    got, rate = decode_wav_pcm16(wav_bytes(x))
    assert rate == 8000
    assert np.array_equal((got * 32768.0).astype(np.int16), x)

    clips = [synth_tone_wav(i) for i in range(30)]
    # planted near-dup: clip 3 + -66 dB noise; and an exact copy of clip 9
    noisy = np.clip(
        clips[3].astype(np.float64)
        + np.random.default_rng(99).normal(0, 16.0, clips[3].size),
        -32768, 32767,
    ).astype(np.int16)
    clips.append(noisy)          # aud-0030 ~ aud-0003
    clips.append(clips[9].copy())  # aud-0031 == aud-0009

    fps = [audio_fingerprint64(c.astype(np.float64) / 32768.0) for c in clips]
    ids = [f"aud-{i:04d}" for i in range(len(clips))]
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(fps[i] ^ fps[j]).count("1")
            if d <= 3:
                want.add((ids[i], ids[j], d))
    assert ("aud-0009", "aud-0031", 0) in want
    assert any(a == "aud-0003" and b == "aud-0030" for a, b, _ in want)

    tbl = pa.table({
        "media_id": pa.array(ids),
        "payload": pa.array([wav_bytes(c) for c in clips], pa.binary()),
    })
    # actor output matches the local reference exactly
    local = AudioFingerprinter(backend="raw")(tbl)
    assert [h & ((1 << 64) - 1) for h in
            local.column("afp").to_numpy(zero_copy_only=False)
            .astype(np.uint64).tolist()] == fps

    for parts in (1, 4):
        out = phash_neardup_pairs(
            compute_audio_fingerprints(
                rd.from_arrow(tbl).repartition(parts), backend="raw"
            ),
            max_hamming=3, hash_col="afp",
        ).take_all()
        got_pairs = {(r["a"], r["b"], r["hamming"]) for r in out}
        assert got_pairs == want, parts

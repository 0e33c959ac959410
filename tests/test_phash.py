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


def test_png_roundtrip_all_filters():
    """Encode with each of the five scanline filters; decode must recover
    the exact pixels (every unfilter path exercised)."""
    import zlib

    from knowledgegraph_ray.stages.multimodal import (
        decode_png,
        png_bytes,
        synth_smooth_image,
    )

    px = synth_smooth_image(11, size=24)
    sizes = {}
    for f in range(5):
        payload = png_bytes(px, filter_type=f)
        back = decode_png(payload)
        np.testing.assert_array_equal(back, px, err_msg=f"filter {f}")
        sizes[f] = len(payload)
    # filtering exists to help deflate: predictive filters must beat None
    # on a smooth image (sanity that the filters actually ran)
    assert min(sizes[1], sizes[2], sizes[3], sizes[4]) < sizes[0]
    # zlib stream is well-formed (decompressible by a third party)
    idat_off = payload.index(b"IDAT") + 4
    ln = int.from_bytes(payload[idat_off - 8 : idat_off - 4], "big")
    assert len(zlib.decompress(payload[idat_off : idat_off + ln])) == 24 * (24 * 3 + 1)


def test_png_color_types():
    """Gray / palette / gray+alpha / RGBA decode paths (hand-built chunks)."""
    import zlib

    from knowledgegraph_ray.stages.multimodal import _PNG_MAGIC, decode_png

    def chunk(cid, body):
        return (
            len(body).to_bytes(4, "big") + cid + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    def png(w, h, ct, raw, plte=b""):
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ct, 0, 0, 0])
        out = _PNG_MAGIC + chunk(b"IHDR", ihdr)
        if plte:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    # gray 2x2: scanlines = filter0 + values
    g = png(2, 2, 0, bytes([0, 10, 20, 0, 30, 40]))
    np.testing.assert_array_equal(
        decode_png(g), np.array([[[10] * 3, [20] * 3], [[30] * 3, [40] * 3]], np.uint8)
    )
    # palette 2x1: indices 1, 0 into [(255,0,0), (0,255,0)]
    p = png(2, 1, 3, bytes([0, 1, 0]), plte=bytes([255, 0, 0, 0, 255, 0]))
    np.testing.assert_array_equal(
        decode_png(p), np.array([[[0, 255, 0], [255, 0, 0]]], np.uint8)
    )
    # gray+alpha 1x1 (alpha dropped) and RGBA 1x1
    ga = png(1, 1, 4, bytes([0, 77, 200]))
    np.testing.assert_array_equal(decode_png(ga), np.full((1, 1, 3), 77, np.uint8))
    rgba = png(1, 1, 6, bytes([0, 1, 2, 3, 99]))
    np.testing.assert_array_equal(
        decode_png(rgba), np.array([[[1, 2, 3]]], np.uint8)
    )


def test_png_phash_matches_bmp(ray_session):
    """Same pixels through PNG and BMP payloads → identical pHashes →
    identical near-dup pairs (decoder-agnostic dedup)."""
    from knowledgegraph_ray.stages.multimodal import (
        bmp_bytes,
        compute_phashes,
        png_bytes,
        synth_smooth_image,
    )

    imgs = [synth_smooth_image(s) for s in range(40)]

    def media(encoder, tag):
        return pa.table({
            "media_id": [f"{tag}-{i:03d}" for i in range(len(imgs))],
            "media_type": ["image"] * len(imgs),
            "payload": pa.array([encoder(px) for px in imgs], pa.binary()),
            "meta_json": ["{}"] * len(imgs),
        })

    hb = compute_phashes(rd.from_arrow(media(bmp_bytes, "x")), backend="raw",
                         concurrency=2).take_all()
    hp = compute_phashes(
        rd.from_arrow(media(lambda px: png_bytes(px, filter_type=4), "x")),
        backend="raw", concurrency=2).take_all()
    assert sorted((r["media_id"], r["phash"]) for r in hb) == sorted(
        (r["media_id"], r["phash"]) for r in hp
    )


def test_gif_roundtrip_and_lzw():
    """GIF encode→decode recovers exact pixels (plain + interlaced); LZW
    round-trips streams long enough to force dictionary growth through
    several code-size widenings and an overflow reset."""
    from knowledgegraph_ray.stages.multimodal import (
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        gif_bytes,
        synth_smooth_image,
    )

    # paletted image: posterize the smooth image to ≤256 distinct colors
    px = (synth_smooth_image(3) // 48 * 48).astype(np.uint8)
    assert len(np.unique(px.reshape(-1, 3), axis=0)) <= 256
    for interlace in (False, True):
        back = decode_gif(gif_bytes(px, interlace=interlace))
        np.testing.assert_array_equal(back, px, err_msg=f"interlace={interlace}")

    # LZW property: deterministic pseudo-random index streams with heavy
    # repetition (dictionary grows fast), several min code sizes
    rng = np.random.default_rng(9)
    for mcs in (2, 4, 8):
        alphabet = 1 << mcs
        runs = rng.integers(1, 40, 4000)
        vals = rng.integers(0, alphabet, 4000)
        data = np.repeat(vals, runs).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data


def test_gif_phash_matches_bmp(ray_session):
    """Posterized corpus through GIF and BMP payloads → identical pHashes
    (the dedup pipeline is decoder-agnostic across all four image codecs)."""
    from knowledgegraph_ray.stages.multimodal import (
        bmp_bytes,
        compute_phashes,
        gif_bytes,
        synth_smooth_image,
    )

    imgs = [(synth_smooth_image(s) // 48 * 48).astype(np.uint8) for s in range(20)]

    def hashes(encoder):
        t = pa.table({
            "media_id": [f"m{i:03d}" for i in range(len(imgs))],
            "media_type": ["image"] * len(imgs),
            "payload": pa.array([encoder(p) for p in imgs], pa.binary()),
            "meta_json": ["{}"] * len(imgs),
        })
        rows = compute_phashes(rd.from_arrow(t), backend="raw",
                               concurrency=2).take_all()
        return sorted((r["media_id"], r["phash"]) for r in rows)

    assert hashes(bmp_bytes) == hashes(gif_bytes)

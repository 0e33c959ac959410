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

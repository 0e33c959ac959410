"""Multimodal (image/audio/video) operators over opaque binary columns.

The engine treats media as ``payload: binary`` plus typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…), processed by
actor-pool ``map_batches`` stages — the same warm-state pattern as the triple
extractor and embedder.  Decode backends:

* ``backend="raw"`` — a REAL pure-numpy decode path: PPM (P6) and 24-bit
  BMP images (``decode_ppm``/``decode_bmp`` + nearest-neighbor
  ``resize_nearest``), PNG via stdlib zlib (``decode_png`` — 8-bit
  gray/RGB/palette/alpha, all five scanline filters), GIF with a full
  LZW codec (``decode_gif`` — 87a/89a, interlacing, local tables),
  baseline JPEG (``stages/jpeg.py`` — Huffman + IDCT, any sampling) and
  PCM-16 WAV audio (``decode_wav_pcm16``) — no codec library needed;
* ``backend="strict"`` — perceptual audio/video codecs (MP3/H.264) require
  codec libraries NOT in this container: the clearly-marked
  ``NotImplementedError`` stub;
* ``backend="fake"`` — deterministic payload-derived pixels/samples, so the
  Ray-side plumbing (schema, batch shapes, actor signature, output layout)
  is testable independently of any format.

Scale notes: media rows are wide — stages force small ``batch_size`` and the
output drops the payload as soon as features are extracted (same rule as
dropping ``html`` after text extraction, SURVEY.md §7 "wide rows").
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


# --- real pure-numpy decoders for UNCOMPRESSED formats -----------------------
# PPM (P6), BMP (24-bit BI_RGB) and WAV (PCM16) need no codec library — the
# container lacks imaging/audio libs, but these formats are just headers +
# raw samples, so the `raw` backend is a REAL decode path; compressed
# formats: PNG gets a REAL stdlib-zlib decoder (decode_png below);
# entropy-coded JPEG/MP3/H.264 remain behind the documented strict stubs.


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → (h, w, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comment lines start with '#'), then ONE whitespace byte, then raw RGB
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BI_RGB, bottom-up) → (h, w, 3) uint8 RGB."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp} bpp, compression {compression}")
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(payload, np.uint8, count=stride * abs(h), offset=data_off)
    rows = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth_predict(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode with stdlib zlib + numpy — no codec library.

    Supports the common web subset: 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced; all
    five scanline filters (None/Sub/Up/Average/Paeth).  Filters 0 and 2 are
    fully vectorized; Sub/Average/Paeth carry a per-byte dependency along
    the scanline, so those rows pay a Python inner loop — fine inside the
    actor pool where decode is the intended per-item work.  Returns
    (h, w, 3) uint8 RGB (alpha dropped, gray broadcast)."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    i = 8
    idat: list[bytes] = []
    plte = None
    w = h = channels = None
    ct = 0
    while i + 8 <= len(payload):
        ln = int.from_bytes(payload[i : i + 4], "big")
        cid = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + ln]
        if cid == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ct, comp, filt, interlace = body[8:13]
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if comp or filt or interlace:
                raise ValueError("unsupported PNG (interlaced or nonzero method)")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ct)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {ct}")
        elif cid == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        i += 12 + ln  # len + id + body + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes, data = raw[:, 0], raw[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), np.uint8)
    bpp = channels
    for r in range(h):
        f = int(ftypes[r])
        prev = out[r - 1].astype(np.int64) if r else np.zeros(stride, np.int64)
        row = data[r]
        if f == 0:
            rec = row
        elif f == 2:
            rec = (row + prev) & 255
        elif f in (1, 3, 4):
            rec = np.empty(stride, np.int64)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if f == 1:
                    pr = a
                elif f == 3:
                    pr = (a + b) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pr = _paeth_predict(a, b, c)
                rec[x] = (int(row[x]) + pr) & 255
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[r] = rec.astype(np.uint8)
    px = out.reshape(h, w, channels)
    if ct == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]].copy()
    if ct == 0:
        return np.repeat(px, 3, axis=2).copy()
    if ct == 4:
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    if ct == 6:
        return px[:, :, :3].copy()
    return px.copy()


def png_bytes(px: np.ndarray, *, filter_type: int = 0, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB → PNG (8-bit RGB, non-interlaced), stdlib zlib.

    ``filter_type`` applies one filter to every scanline (0/1/2/3/4) — the
    encoder side is vectorized for all five since prediction uses the
    ORIGINAL bytes, not reconstructed ones.  Used by tests to exercise every
    decoder filter path and by the synthetic-corpus generators."""
    import zlib

    h, w, c = px.shape
    if c != 3:
        raise ValueError("png_bytes encodes RGB only")
    rows = px.reshape(h, w * 3).astype(np.int64)
    left = np.zeros_like(rows)
    left[:, 3:] = rows[:, :-3]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    upleft = np.zeros_like(rows)
    upleft[1:, 3:] = rows[:-1, :-3]
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - up
    elif filter_type == 3:
        filt = rows - ((left + up) >> 1)
    elif filter_type == 4:
        p = left + up - upleft
        pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, upleft)
        )
        filt = rows - pred
    else:
        raise ValueError(f"bad PNG filter type {filter_type}")
    scan = np.concatenate(
        [np.full((h, 1), filter_type, np.uint8), (filt & 255).astype(np.uint8)],
        axis=1,
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big") + cid + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, RGB, deflate, adaptive, no interlace
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), level))
        + chunk(b"IEND", b"")
    )


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decode (variable 3–12-bit codes, LSB-first bit
    packing, CLEAR/END codes, dictionary capped at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    dict_ = list(base)
    code_size = min_code_size + 1
    bits = nbits = pos = 0
    prev: "bytes | None" = None
    out = bytearray()
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out)  # stream ended without END code — tolerate
            bits |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bits & ((1 << code_size) - 1)
        bits >>= code_size
        nbits -= code_size
        if code == clear:
            dict_ = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(dict_) and (code < clear or code > end):
            entry = dict_[code]
        elif code == len(dict_) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(dict_) < 4096:
            dict_.append(prev + entry[:1])
            if len(dict_) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encode — the exact inverse of ``_lzw_decode``
    (emits CLEAR up front and on dictionary overflow, END at the end)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bits = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal bits, nbits
        bits |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # decoder widens its read AFTER appending the matching entry,
            # i.e. one code later than the add — hence "strictly greater"
            if next_code > (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([k])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(bits & 0xFF)
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """REAL GIF decode (87a/89a) in pure Python/numpy — LZW, global/local
    color tables, interlacing, extension skipping.  Returns the FIRST
    frame as (h, w, 3) uint8 RGB (frame sampling belongs to the video
    stage; GIF-as-image is the corpus-dedup case)."""
    if payload[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    while i < len(payload):
        b0 = payload[i]
        if b0 == 0x21:  # extension: label + sub-blocks
            i += 2
            while payload[i]:
                i += 1 + payload[i]
            i += 1
        elif b0 == 0x2C:  # image descriptor
            left = int.from_bytes(payload[i + 1 : i + 3], "little")
            top = int.from_bytes(payload[i + 3 : i + 5], "little")
            w = int.from_bytes(payload[i + 5 : i + 7], "little")
            h = int.from_bytes(payload[i + 7 : i + 9], "little")
            ipacked = payload[i + 9]
            i += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
                i += n * 3
            if ct is None:
                raise ValueError("GIF frame has no color table")
            mcs = payload[i]
            i += 1
            blocks = bytearray()
            while payload[i]:
                ln = payload[i]
                blocks += payload[i + 1 : i + 1 + ln]
                i += 1 + ln
            idx = np.frombuffer(
                _lzw_decode(bytes(blocks), mcs), np.uint8, count=w * h
            ).reshape(h, w)
            if ipacked & 0x40:  # interlaced: reorder rows into place
                rows = np.empty(h, np.int64)
                r = 0
                for off, step in _GIF_INTERLACE:
                    for y in range(off, h, step):
                        rows[y] = r
                        r += 1
                idx = idx[rows]
            if (w, h) != (sw, sh):  # frame smaller than the logical screen
                full = np.zeros((sh, sw), np.uint8)
                full[top : top + h, left : left + w] = idx
                idx = full
            return ct[idx].copy()
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image frame")


def gif_bytes(px: np.ndarray, *, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB with ≤256 distinct colors → GIF89a (the exact
    inverse of ``decode_gif``; round-trip tested, interlace optional)."""
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"gif_bytes needs ≤256 distinct colors, got {len(palette)}")
    exp = max(1, (len(palette) - 1).bit_length())  # table size 2^exp ≥ 2
    table = np.zeros((1 << exp, 3), np.uint8)
    table[: len(palette)] = palette
    indices = idx.astype(np.uint8).reshape(h, w)
    if interlace:
        order = [y for off, step in _GIF_INTERLACE for y in range(off, h, step)]
        indices = indices[order]
    mcs = max(2, exp)
    lzw = _lzw_encode(indices.tobytes(), mcs)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((exp - 1) & 0x07) | 0x70, 0, 0])  # GCT flag + size
    out += table.tobytes()
    out += b"\x2c" + b"\0\0\0\0" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00, mcs])
    for j in range(0, len(lzw), 255):
        part = lzw[j : j + 255]
        out += bytes([len(part)]) + part
    out += b"\x00\x3b"
    return bytes(out)


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM 16-bit → (mono float32 samples in [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, channels, bits = 12, None, 1, 16
    samples = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: format {fmt}, {bits}-bit")
        elif cid == b"data":
            samples = np.frombuffer(body, np.int16, count=size // 2)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    mono = samples.reshape(-1, channels).mean(axis=1) if channels > 1 else samples
    return (mono.astype(np.float32) / 32768.0), rate


def decode_audio_raw(payload: bytes) -> tuple[np.ndarray, int]:
    """Raw-backend audio dispatch by magic bytes: RIFF/WAVE PCM16 or FLAC
    (stages/flac.py, lossless — identical samples to the source PCM).
    Returns (mono float32 in [-1, 1], sample_rate)."""
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        pcm, rate = decode_flac(payload)
        mono = (
            pcm.astype(np.float64).mean(axis=1)
            if pcm.ndim == 2 and pcm.shape[1] > 1
            else pcm.reshape(-1).astype(np.float64)
        )
        return (mono / 32768.0).astype(np.float32), rate
    return decode_wav_pcm16(payload)


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via two index gathers — no imaging library."""
    ys = (np.arange(height) * px.shape[0] // height).clip(max=px.shape[0] - 1)
    xs = (np.arange(width) * px.shape[1] // width).clip(max=px.shape[1] - 1)
    return px[ys][:, xs]


def decode_y4m(payload: bytes) -> tuple[list[np.ndarray], int, int]:
    """YUV4MPEG2 (C420, 8-bit) → (list of (h, w, 3) uint8 RGB frames, w, h).

    Real uncompressed-video decode: stream header line, then per frame a
    ``FRAME...\\n`` marker followed by planar Y (w*h) + U + V (w/2*h/2 each)
    bytes.  YUV→RGB uses the full-range BT.601 matrix, vectorized per frame."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = 0
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C" and not tok[1:].startswith("420"):
            raise ValueError(f"unsupported Y4M colorspace {tok}")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frames: list[np.ndarray] = []
    i = nl + 1
    while i < len(payload):
        fnl = payload.index(b"\n", i)
        if not payload[i:fnl].startswith(b"FRAME"):
            raise ValueError("missing FRAME marker")
        i = fnl + 1
        Y = np.frombuffer(payload, np.uint8, ysz, i).reshape(h, w).astype(np.float32)
        U = np.frombuffer(payload, np.uint8, csz, i + ysz).reshape(h // 2, w // 2)
        V = np.frombuffer(payload, np.uint8, csz, i + ysz + csz).reshape(h // 2, w // 2)
        i += ysz + 2 * csz
        # upsample chroma 2x (nearest) then full-range BT.601
        Uf = U.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.float32) - 128.0
        Vf = V.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.float32) - 128.0
        rgb = np.stack(
            [Y + 1.402 * Vf, Y - 0.344136 * Uf - 0.714136 * Vf, Y + 1.772 * Uf],
            axis=-1,
        )
        frames.append(np.clip(rgb, 0, 255).astype(np.uint8))
    return frames, w, h


class ImageDecoder:
    """Actor-pool stage: binary payload → decoded pixels → pooled feature.

    ``backend="raw"`` is a REAL decode path with no codec library — PPM,
    BMP, PNG, GIF and baseline JPEG by magic bytes; ``backend="pillow"``
    delegates to PIL when installed (the production escape hatch);
    ``backend="fake"`` produces deterministic payload-derived pixels for
    plumbing tests.
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
        if self.backend == "raw":
            # REAL decode by magic bytes: uncompressed PPM/BMP, plus PNG
            # (deflate via stdlib zlib — no codec library)
            if payload.startswith(b"P6"):
                px = decode_ppm(payload)
            elif payload.startswith(b"BM"):
                px = decode_bmp(payload)
            elif payload.startswith(_PNG_MAGIC):
                px = decode_png(payload)
            elif payload.startswith(b"GIF8"):
                px = decode_gif(payload)
            elif payload.startswith(b"\xff\xd8"):
                from .jpeg import decode_jpeg

                px = decode_jpeg(payload)
            else:
                raise ValueError(
                    "raw backend decodes PPM/BMP/PNG/GIF/JPEG; other "
                    "compressed formats need a codec backend"
                )
            w, h = self.resize
            return resize_nearest(px, w, h)
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
        if self.backend == "raw":
            samples, rate = decode_audio_raw(payload)
            self.sample_rate = rate  # report the container's true rate
            return samples
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
            if self.backend == "raw":
                # real uncompressed video: Y4M stream, uniform frame sampling
                frames, _, _ = decode_y4m(payload or b"")
                n = min(self.n_frames, len(frames))
                picks = (
                    np.linspace(0, len(frames) - 1, n).round().astype(int)
                    if n else np.zeros(0, int)
                )
                for f, fi in enumerate(picks):
                    px = frames[fi]
                    feat = (px.mean(axis=(0, 1)) / 255.0).astype(np.float32)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(int(fi))
                    out["feature"].append(feat.tolist())
                continue
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


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup: real decode → 64-bit pHash → banded near-dup
# pairs.  The image-side twin of the text dedup family (exact/MinHash/
# SimHash) — the dedup pass a multimodal training corpus runs on frames
# and images before contrastive training.
# ---------------------------------------------------------------------------


def bmp_bytes(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (the exact inverse of
    ``decode_bmp``; byte-exact round-trip tested)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM" + (off + len(data)).to_bytes(4, "little") + b"\0\0\0\0"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + b"\0" * 16
    )
    return header + data


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis (float64) — pHash's frequency transform."""
    k = np.arange(n, dtype=np.float64)
    D = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    D[0] *= 1.0 / np.sqrt(n)
    D[1:] *= np.sqrt(2.0 / n)
    return D


_LUMA = np.array([0.299, 0.587, 0.114])  # BT.601, same as the Y4M decoder


def phash64_from_pixels(px: np.ndarray, D: np.ndarray) -> int:
    """64-bit perceptual hash: BT.601 luma → 32×32 (caller resizes) →
    2-D DCT-II → top-left 8×8 low-frequency block → median threshold.
    Deterministic float64 matmuls — every worker computes identical bits."""
    g = px.astype(np.float64) @ _LUMA
    f = (D @ g @ D.T)[:8, :8].reshape(-1)
    med = np.median(f)
    bits = f > med
    return int(np.packbits(bits).view(">u8")[0])


class PHasher:
    """Actor-pool stage: payload → (media_id, phash int64-bits).  The DCT
    basis and resize target are built ONCE per actor (stateful-stage
    pattern); decode reuses ImageDecoder's backends (raw = real PPM/BMP)."""

    def __init__(self, backend: str = "raw", size: int = 32) -> None:
        self._dec = ImageDecoder(backend=backend, resize=(size, size))
        self._D = _dct_matrix(size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        payloads = batch.column("payload").to_pylist()
        hashes = np.empty(len(payloads), np.uint64)
        for i, payload in enumerate(payloads):
            hashes[i] = phash64_from_pixels(
                self._dec._decode(payload or b""), self._D
            )
        return pa.table({
            "media_id": ids,
            "phash": pa.array(hashes.view(np.int64), pa.int64()),
        })


_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def compute_phashes(ds, *, backend: str = "raw", concurrency: int = 2,
                    batch_size: int = 64):
    """Media dataset → (media_id, phash) via the PHasher actor pool."""
    return ds.map_batches(
        PHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"backend": backend},
    )


def phash_neardup_pairs(
    hashes, *, max_hamming: int = 3, id_col: str = "media_id",
    hash_col: str = "phash", num_partitions: int = 16, max_bucket: int = 4096,
):
    """(id, 64-bit hash) → near-duplicate pairs (id_a, id_b, hamming ≤
    ``max_hamming``), EXACT for max_hamming ≤ 3: 4 disjoint 16-bit bands
    guarantee by pigeonhole that any pair within hamming 3 shares a band.

    Scale shape: band rows (int key, id, phash) through the hash map/reduce
    exchange (``grouped_apply(exchange='hash')``); per bucket one
    vectorized XOR outer + byte-LUT popcount emits verified pairs; the
    cross-band pair dedup is a distinct over O(matching pairs).
    ``max_bucket`` caps degenerate buckets (the LSH hot-bucket guard) —
    leave large when exactness vs an oracle is required."""
    import ray.data as rd

    from .aggregates import distinct_keys
    from .canonicalize import grouped_apply

    hashes = hashes if isinstance(hashes, rd.Dataset) else rd.from_arrow(hashes)
    id_type = pa.schema(
        [(f.name, f.type)
         for f in hashes.schema(fetch_if_missing=True).base_schema]
    ).field(id_col).type

    def band_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "key": pa.array([], pa.int64()),
                id_col: pa.array([], id_type),
                hash_col: pa.array([], pa.int64()),
            })
        h = b.column(hash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        bands = np.arange(4, dtype=np.uint64)
        vals = (h[:, None] >> (np.uint64(16) * bands[None, :])) & np.uint64(0xFFFF)
        key = ((bands[None, :] << np.uint64(56)) | vals).astype(np.int64)
        rep = pa.array(np.repeat(np.arange(b.num_rows), 4), pa.int64())
        return pa.table({
            "key": pa.array(key.reshape(-1), pa.int64()),
            id_col: b.column(id_col).take(rep),
            hash_col: pa.array(np.repeat(h.view(np.int64), 4), pa.int64()),
        })

    banded = hashes.map_batches(band_rows, batch_format="pyarrow")
    pair_schema = pa.schema([
        pa.field("a", id_type), pa.field("b", id_type),
        pa.field("hamming", pa.int64()),
    ])

    def bucket_pairs(block: pa.Table, starts: np.ndarray) -> pa.Table:
        n = block.num_rows
        lens = np.diff(np.r_[starts, n])
        ids = block.column(id_col)
        hs = block.column(hash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for s, ln in zip(starts.tolist(), lens.tolist()):
            if ln < 2 or ln > max_bucket:
                continue
            hb = hs[s : s + ln]
            x = hb[:, None] ^ hb[None, :]
            ham = _POP8[x.view(np.uint8)].reshape(ln, ln, 8).sum(
                axis=-1, dtype=np.int64
            )
            iu, ju = np.nonzero(np.triu(ham <= max_hamming, k=1))
            if not iu.size:
                continue
            ia = ids.take(pa.array(s + iu, pa.int64()))
            ib = ids.take(pa.array(s + ju, pa.int64()))
            lo = pc.min_element_wise(ia, ib)
            hi = pc.max_element_wise(ia, ib)
            out_a.append(lo)
            out_b.append(hi)
            out_h.append(pa.array(ham[iu, ju], pa.int64()))
        if not out_a:
            return pair_schema.empty_table()

        def cat(arrs):
            return pa.concat_arrays(
                [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
                 for x in arrs]
            )

        return pa.Table.from_arrays(
            [cat(out_a), cat(out_b), cat(out_h)], schema=pair_schema
        )

    pairs = grouped_apply(
        banded, ["key"], None, pair_schema,
        num_partitions=num_partitions, hash_sort=True,
        block_fn=bucket_pairs, exchange="hash",
    )
    return distinct_keys(pairs, ["a", "b", "hamming"])


def synth_smooth_image(seed: int, size: int = 32) -> np.ndarray:
    """Deterministic low-frequency RGB image — pHash is a low-frequency
    hash, so a 1-pixel perturbation of such an image stays within a few
    bits (used by tests and the derived image-dedup query corpus)."""
    rng = np.random.default_rng(seed)
    y = np.arange(size)[:, None]
    x = np.arange(size)[None, :]
    chans = []
    for _ in range(3):
        fy = rng.uniform(0.5, 2.0)
        fx = rng.uniform(0.5, 2.0)
        ph = rng.uniform(0, 6)
        g = 127 + 120 * np.sin(2 * np.pi * (fy * y + fx * x) / size + ph)
        chans.append(g)
    return np.clip(np.stack(chans, axis=-1), 0, 255).astype(np.uint8)


def docs_to_bmp_media(batch: pa.Table, *, id_col: str = "doc_id") -> pa.Table:
    """doc ids → deterministic BMP media rows, with PLANTED near-dups:
    every id ≡ 1 (mod 7) renders its predecessor's image with one pixel
    nudged (a near-duplicate at pHash hamming ≈ 0–2).  Synthetic-input
    generator for the image-dedup pipeline — deterministic per id, so any
    partitioning of any scale factor produces the same corpus."""
    ids = pc.cast(batch.column(id_col), pa.int64()).to_pylist()
    payloads = []
    for did in ids:
        base = did - 1 if did % 7 == 1 else did
        px = synth_smooth_image(base)
        if did % 7 == 1:
            px = px.copy()
            px[0, 0, 0] = min(int(px[0, 0, 0]), 254) + 1
        payloads.append(bmp_bytes(px))
    return pa.table({
        "media_id": pa.array([f"img-{d:08d}" for d in ids]),
        "media_type": pa.array(["image"] * len(ids)),
        "payload": pa.array(payloads, pa.binary()),
        "meta_json": pa.array(["{}"] * len(ids)),
    })


# ---------------------------------------------------------------------------
# Audio fingerprint dedup: real WAV decode → 64-bit band-energy fingerprint
# (Haitsma–Kalker sign-delta shape) → the SAME banded near-dup machinery as
# pHash (phash_neardup_pairs is generic over the 64-bit hash column).
# ---------------------------------------------------------------------------


def _log_band_edges(n_bins: int = 513, n_bands: int = 65) -> np.ndarray:
    """Strictly increasing log-spaced rFFT-bin band edges (n_bands+1)."""
    raw = 2.0 * (float(n_bins - 1) / 2.0) ** (np.arange(n_bands + 1) / n_bands)
    edges = raw.astype(np.int64)
    for i in range(1, edges.size):
        if edges[i] <= edges[i - 1]:
            edges[i] = edges[i - 1] + 1
    return edges


_AFP_WIN = 1024
_AFP_HOP = 512


def audio_fingerprint64(samples: np.ndarray, hann: np.ndarray | None = None,
                        edges: np.ndarray | None = None) -> int:
    """64-bit clip-level audio fingerprint: Hann-windowed 1024-sample
    frames (hop 512) → average rFFT power spectrum → 65 log-spaced band
    energies → a 64-bit band-PRESENCE bitmap (band b set iff its energy
    exceeds 1/1024 of the total in-band energy).  Deterministic float64,
    so every worker computes identical bits; gain-invariant (both compare
    sides scale together) and robust to low-level noise by construction —
    a −60 dB perturbation moves band energies ~60 dB below the threshold
    margin, unlike adjacent-band sign deltas, which are coin flips in the
    empty bands of sparse tonal spectra."""
    if hann is None:
        hann = np.hanning(_AFP_WIN)
    if edges is None:
        edges = _log_band_edges()
    x = np.asarray(samples, np.float64)
    if x.size < _AFP_WIN:
        x = np.pad(x, (0, _AFP_WIN - x.size))
    starts = np.arange(0, x.size - _AFP_WIN + 1, _AFP_HOP)
    F = x[starts[:, None] + np.arange(_AFP_WIN)[None, :]] * hann
    P = np.abs(np.fft.rfft(F, axis=1)) ** 2
    spec = P.mean(axis=0)
    csum = np.r_[0.0, np.cumsum(spec)]
    e = csum[edges[1:]] - csum[edges[:-1]]
    bits = 1024.0 * e[:64] > e.sum()
    return int(np.packbits(bits).view(">u8")[0])


def _fake_samples(payload: bytes, n: int = 4096) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, n).astype(np.float32)


class AudioFingerprinter:
    """Actor-pool stage: WAV payload → (media_id, afp int64-bits).  Window
    and band edges built ONCE per actor; raw backend is the real PCM16
    decode, fake is payload-derived deterministic samples."""

    def __init__(self, backend: str = "raw") -> None:
        self.backend = backend
        self._hann = np.hanning(_AFP_WIN)
        self._edges = _log_band_edges()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out = np.empty(len(payloads), np.uint64)
        for i, payload in enumerate(payloads):
            if self.backend == "raw":
                samples, _ = decode_audio_raw(payload or b"")
            elif self.backend == "fake":
                samples = _fake_samples(payload or b"")
            else:
                raise NotImplementedError(
                    f"audio backend {self.backend!r} requires codec libraries"
                )
            out[i] = audio_fingerprint64(samples, self._hann, self._edges)
        return pa.table({
            "media_id": batch.column("media_id"),
            "afp": pa.array(out.view(np.int64), pa.int64()),
        })


def compute_audio_fingerprints(ds, *, backend: str = "raw",
                               concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        AudioFingerprinter,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"backend": backend},
    )


def wav_bytes(samples_i16: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 (inverse of decode_wav_pcm16)."""
    data = samples_i16.astype("<i2").tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synth_tone_wav(seed: int, n: int = 4096, rate: int = 8000) -> np.ndarray:
    """Deterministic 8-sine mixture (int16) spanning the band range —
    ~8 presence bits per fingerprint, so distinct clips sit far apart in
    hamming space while small-noise copies hash identically (3 tones set
    too few bits: measured 2.9% chance-pair rate at hamming ≤ 3)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = np.zeros(n)
    for _ in range(8):
        f = rng.uniform(60.0, 3900.0)
        a = rng.uniform(0.06, 0.12)
        ph = rng.uniform(0, 6)
        x += a * np.sin(2 * np.pi * f * t + ph)
    return np.clip(x * 32767.0, -32768, 32767).astype(np.int16)


def docs_to_wav_media(batch: pa.Table, *, id_col: str = "doc_id") -> pa.Table:
    """doc ids → deterministic WAV media rows with PLANTED near-dups:
    every id ≡ 1 (mod 7) renders its predecessor's tone mixture with
    -66 dB noise added (same fingerprint up to a few bits)."""
    ids = pc.cast(batch.column(id_col), pa.int64()).to_pylist()
    payloads = []
    for did in ids:
        base = did - 1 if did % 7 == 1 else did
        x = synth_tone_wav(base).astype(np.float64)
        if did % 7 == 1:
            noise = np.random.default_rng(did).normal(0, 16.0, x.size)
            x = np.clip(x + noise, -32768, 32767)
        payloads.append(wav_bytes(x.astype(np.int16)))
    return pa.table({
        "media_id": pa.array([f"aud-{d:08d}" for d in ids]),
        "media_type": pa.array(["audio"] * len(ids)),
        "payload": pa.array(payloads, pa.binary()),
        "meta_json": pa.array(["{}"] * len(ids)),
    })

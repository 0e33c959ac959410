"""Baseline JPEG (ITU-T T.81) codec in pure Python/numpy — no codec library.

Upgrades the last image-format strict stub to a REAL decode path: the raw
image backend dispatches JFIF payloads here.  Scope is the baseline
sequential DCT process that covers the overwhelming majority of web JPEGs:

* decoder — 8-bit baseline: DQT/SOF0/DHT/SOS/DRI parsing, canonical Huffman
  entropy decode (byte unstuffing, restart markers), dequantize + inverse
  zigzag, orthonormal-matrix IDCT, chroma upsampling for any (h, v) sampling
  (4:4:4, 4:2:0, 4:2:2, grayscale), BT.601 YCbCr→RGB.
* encoder — baseline 4:4:4 or 4:2:0 with the Annex K example quantization
  tables (quality-scaled, libjpeg convention) and per-image canonical
  Huffman tables built from the actual symbol set (equal-length codes, the
  all-ones codeword left unused as T.81 requires) — every table travels in
  the file, so any standard decoder reads the output.

Progressive, arithmetic-coded and 12-bit JPEGs raise ValueError (the
documented strict boundary).  The entropy loops are per-block Python —
decode cost is the intended per-item work inside the actor-pool stage; a
production deployment swaps in a codec library via the decoder-backend hook
(multimodal.ImageDecoder backend="pillow").
"""

from __future__ import annotations

import numpy as np

# zigzag scan order, generated (not transcribed): diagonals alternate
# direction, even diagonals run bottom-left→top-right
_ZZ: list[int] = []
for _d in range(15):
    _rs = list(range(max(0, _d - 7), min(_d, 7) + 1))
    for _r in (reversed(_rs) if _d % 2 == 0 else _rs):
        _ZZ.append(_r * 8 + (_d - _r))
ZIGZAG = np.array(_ZZ, np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 example quantization tables (row-major)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int64)


def _dct8() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix; F = D f Dᵀ equals T.81's FDCT
    normalization (the ¼·C(u)C(v) factors fold into orthonormal scaling)."""
    k = np.arange(8, dtype=np.float64)
    D = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / 16.0)
    D[0] *= np.sqrt(1.0 / 8.0)
    D[1:] *= np.sqrt(2.0 / 8.0)
    return D


_D8 = _dct8()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality convention: 50 = Annex K as-is."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# bit I/O (JPEG bitstreams are MSB-first)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81
        return bytes(self.out)


class _BitReader:
    """Entropy-segment reader: unstuffs FF00, stops at markers; RSTn
    consumption resets the bit phase (the caller resets DC predictors)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1]
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"marker 0x{nxt:02x} inside entropy data")
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def consume_restart(self) -> None:
        self.acc = 0
        self.n = 0
        self.pos += 2  # past FF Dn


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """DHT (counts-per-length, symbols) → {(length, code): symbol}."""
    codes: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_symbol(r: _BitReader, codes: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = codes.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _equal_length_table(symbols: list[int]) -> tuple[list[int], bytes]:
    """Per-image canonical table: all used symbols at one length L with
    2^L − 1 ≥ n (the all-ones codeword stays unused, as T.81 requires)."""
    n = len(symbols)
    L = max(2, (n + 1).bit_length())  # 2^L - 1 >= n
    bits = [0] * 16
    bits[L - 1] = n
    return bits, bytes(sorted(symbols))


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) uint8 RGB (grayscale broadcast)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    i = 2
    data = payload
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        m = data[i + 1]
        if m == 0xD8:
            i += 2
            continue
        if m == 0xD9:
            break
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        body = data[i + 4 : i + 2 + seg_len]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0x0F
                if prec:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body, np.uint8, 64, j + 1).astype(np.int64)
                qt[tid] = tbl[UNZIGZAG]  # store row-major
                j += 65
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"SOF{m - 0xC0}: only baseline sequential (SOF0) is supported"
            )
        elif m == 0xC0:  # SOF0
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = bytes(body[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                j += 17 + nv
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif m == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tabs >> 4, tabs & 0x0F
            i = i + 2 + seg_len
            return _decode_scan(
                data, i, w, h, comps, qt, huff, restart_interval
            )
        i += 2 + seg_len
    raise ValueError("JPEG has no SOS segment")


def _decode_scan(data, pos, w, h, comps, qt, huff, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        )
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # skip to the restart marker and resync
                try:
                    while True:
                        r.bit()
                except _RestartMarker:
                    r.consume_restart()
                    pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    dc_codes = huff[(0, c["td"])]
                    ac_codes = huff[(1, c["ta"])]
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = _decode_block(r, dc_codes, ac_codes)
                            pred[ci] += blk[0]
                            blk[0] = pred[ci]
                            coeff = (blk[UNZIGZAG] * q).reshape(8, 8)
                            pix = _D8.T @ coeff @ _D8 + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            except _RestartMarker:
                r.consume_restart()
                pred = [0] * len(comps)
            mcu_count += 1
    out_planes = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = p.repeat(ry, axis=0).repeat(rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    Y, Cb, Cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.stack(
        [Y + 1.402 * Cr, Y - 0.344136 * Cb - 0.714136 * Cr, Y + 1.772 * Cb],
        axis=-1,
    )
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


def _decode_block(r, dc_codes, ac_codes) -> np.ndarray:
    blk = np.zeros(64, np.int64)
    size = _decode_symbol(r, dc_codes)
    blk[0] = _extend(r.bits(size), size) if size else 0
    k = 1
    while k < 64:
        sym = _decode_symbol(r, ac_codes)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError(f"bad AC symbol 0x{sym:02x}")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        blk[k] = _extend(r.bits(size), size)
        k += 1
    return blk


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _block_symbols(blk_zz: np.ndarray, pred: int) -> tuple[list, int]:
    """Quantized zigzag block → [(dc_size, dc_val)] + AC (sym, size, val)."""
    toks = []
    diff = int(blk_zz[0]) - pred
    mag = abs(diff)
    size = mag.bit_length()
    toks.append(("dc", size, diff))
    k = 1
    run = 0
    last = 63
    while last >= 1 and blk_zz[last] == 0:
        last -= 1
    while k <= last:
        v = int(blk_zz[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            toks.append(("ac", 0xF0, 0))
            run -= 16
        size = abs(v).bit_length()
        toks.append(("ac", (run << 4) | size, v))
        run = 0
        k += 1
    if last < 63:
        toks.append(("ac", 0x00, 0))
    return toks, int(blk_zz[0])


def encode_jpeg(
    px: np.ndarray, *, quality: int = 85, subsample: bool = False,
    gray: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4, 4:2:0 with
    ``subsample=True``, or single-component grayscale with ``gray=True``).
    Quant = quality-scaled Annex K tables; Huffman = per-image equal-length
    canonical tables over the used symbol set."""
    h, w, _ = px.shape
    f = px.astype(np.float64)
    Y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    Cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128.0
    Cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128.0
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if gray:
        sampling = [(1, 1)]
        chans = [Y]
    elif subsample:
        sampling = [(2, 2), (1, 1), (1, 1)]
        # average-pool chroma 2× (pad to even first)

        def pool(p):
            p = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), "edge")
            return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        chans = [Y, pool(Cb), pool(Cr)]
    else:
        sampling = [(1, 1), (1, 1), (1, 1)]
        chans = [Y, Cb, Cr]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    padded = []
    for (sh, sv), p in zip(sampling, chans):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), "edge"
        ) - 128.0
        padded.append(p)

    # pass 1: quantized blocks in MCU order + symbol inventories
    qtabs = [qy, qc, qc][: len(chans)]
    blocks: list[list[np.ndarray]] = [[] for _ in chans]
    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    toks_per_comp: list[list] = [[] for _ in chans]
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((sh, sv), p) in enumerate(zip(sampling, padded)):
                cls = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8]
                        coeff = _D8 @ blk @ _D8.T
                        qz = np.round(coeff / qtabs[ci].reshape(8, 8))
                        zz = qz.reshape(-1)[ZIGZAG].astype(np.int64)
                        toks, dc = _block_symbols(zz, preds[ci])
                        preds[ci] = dc
                        toks_per_comp[ci].append(toks)
                        for kind, sym, _v in toks:
                            (dc_syms if kind == "dc" else ac_syms)[cls].add(sym)

    n_classes = 1 if gray else 2
    dc_tabs = [_equal_length_table(sorted(s)) for s in dc_syms[:n_classes]]
    ac_tabs = [_equal_length_table(sorted(s)) for s in ac_syms[:n_classes]]

    def codes_of(tab):
        bits, vals = tab
        m = _canonical_codes(bits, vals)
        return {sym: (length, code) for (length, code), sym in m.items()}

    dc_codes = [codes_of(t) for t in dc_tabs]
    ac_codes = [codes_of(t) for t in ac_tabs]

    # pass 2: entropy-code interleaved MCUs
    bw = _BitWriter()
    per_comp_iter = [iter(t) for t in toks_per_comp]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(sampling):
                cls = 0 if ci == 0 else 1
                for _ in range(sh * sv):
                    for kind, sym, v in next(per_comp_iter[ci]):
                        codes = dc_codes[cls] if kind == "dc" else ac_codes[cls]
                        length, code = codes[sym]
                        bw.write(code, length)
                        size = sym if kind == "dc" else sym & 0x0F
                        if size:
                            mag = v if v > 0 else v + (1 << size) - 1
                            bw.write(mag, size)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy.reshape(-1)[ZIGZAG].tolist()))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc.reshape(-1)[ZIGZAG].tolist()))
    sof = (bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + bytes([len(chans)]))
    for ci, (sh, sv) in enumerate(sampling):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for th, (bits, vals) in enumerate(tabs):
            out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)
    sos = bytes([len(chans)])
    for ci in range(len(chans)):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)

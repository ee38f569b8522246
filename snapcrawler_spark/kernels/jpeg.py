"""Baseline JPEG codec from scratch (numpy only — no PIL in-sandbox).

Implements the subset of ISO/IEC 10918-1 the engine needs for the
north-rule lossy invariant (decoded pixels PSNR ≥ 40 dB vs source):

- encoder: 8-bit baseline sequential, 4:4:4 (no chroma subsampling,
  chosen for PSNR headroom) or single-component grayscale; Annex-K
  quantization tables scaled by the libjpeg quality curve; Annex-K
  Huffman tables written into DHT segments;
- decoder: SOI/DQT/SOF0/DHT/SOS/EOI parser, canonical Huffman decode
  with byte destuffing, DC prediction, dezigzag, dequantize, matrix
  IDCT, YCbCr→RGB.

The decoder reads the DHT/DQT tables from the stream (it does not
assume the encoder's), so it also accepts other baseline 4:4:4 /
grayscale JPEGs. Reference analog: PIL decode at
filtering_module.py:285 — behavior only; this implementation is
written from the public JPEG specification.
"""

from __future__ import annotations

import numpy as np

# Annex-K base quantization tables
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex-K Huffman table specs: (bits[1..16] counts, symbol values).
# Internal consistency is what matters for round-trip — the tables ride
# in DHT, so the decoder always uses exactly what the encoder wrote.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            c[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_C = _dct_matrix()


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = max(1, min(100, quality))
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = np.floor((base * s + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from the (BITS, HUFFVAL) DHT spec."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _value_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to 8-multiples by edge replication → (n_by, n_bx, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = padded.shape
    blocks = padded.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return blocks, hh // 8, ww // 8


def encode_jpeg(px: np.ndarray, quality: int = 95) -> bytes:
    """(h, w[, 3]) uint8 → baseline JPEG bytes (4:4:4 / grayscale)."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qy, qc = _scaled_tables(quality)
    if gray:
        planes = [px.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]

    # quantized coefficients per component, all blocks at once (matmul DCT)
    comp_coeffs = []
    for ci, plane in enumerate(planes):
        blocks, nby, nbx = _blocks(plane)
        shifted = blocks - 128.0
        coeffs = np.einsum("ux,byxz,vz->byuv", _C, shifted, _C)
        q = qy if ci == 0 else qc
        comp_coeffs.append(
            np.round(coeffs / q).astype(np.int32).reshape(nby * nbx, 8, 8)
        )
    n_blocks = comp_coeffs[0].shape[0]

    dc_codes = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
                _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
                _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0] * len(planes)
    zz = _ZIGZAG
    for bi in range(n_blocks):
        for ci in range(len(planes)):
            tsel = 0 if ci == 0 else 1
            blk = comp_coeffs[ci][bi].ravel()[zz]
            # DC
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            size = _category(diff)
            code, length = dc_codes[tsel][size]
            bw.write(code, length)
            if size:
                bw.write(_value_bits(diff, size), size)
            # AC
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[tsel][0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size = _category(v)
                code, length = ac_codes[tsel][(run << 4) | size]
                bw.write(code, length)
                bw.write(_value_bits(v, size), size)
                run = 0
            if run:
                code, length = ac_codes[tsel][0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    # ---- assemble segments -------------------------------------------------
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, b"\x00" + bytes(qy.astype(np.uint8).ravel()[zz]))
    if not gray:
        out += seg(0xDB, b"\x01" + bytes(qc.astype(np.uint8).ravel()[zz]))
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 1x1 sampling
    out += seg(0xC0, bytes(sof))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        # destuff: FF00 → FF; stop at any other FFxx marker
        buf = bytearray()
        i = 0
        n = len(data)
        while i < n:
            b = data[i]
            if b == 0xFF:
                if i + 1 < n and data[i + 1] == 0x00:
                    buf.append(0xFF)
                    i += 2
                    continue
                break  # marker — end of entropy data
            buf.append(b)
            i += 1
        self.buf = bytes(buf)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.buf):
                raise ValueError("jpeg: bitstream exhausted")
            self.acc = self.buf[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, tree: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline 4:4:4 / grayscale JPEG bytes → (h, w[, 3]) uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    i = 2
    qtables: dict[int, np.ndarray] = {}
    htrees: dict[tuple[int, int], dict] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qsel)
    scan: list[tuple[int, int, int]] = []   # (id, dc_sel, ac_sel)
    entropy = b""
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("jpeg: bad marker stream")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        ln = int.from_bytes(data[i + 2 : i + 4], "big")
        payload = data[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                prec_id = payload[p]
                if prec_id >> 4:
                    raise ValueError("jpeg: 16-bit DQT unsupported")
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                )
                qtables[prec_id & 0xF] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            n = payload[5]
            for c in range(n):
                cid, samp, qsel = payload[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("jpeg: only 4:4:4/grayscale supported")
                comps.append((cid, samp, qsel))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: non-baseline SOF unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                htrees[(tc_th >> 4, tc_th & 0xF)] = _decode_tree(bits, vals)
                p += 17 + nv
        elif marker == 0xDA:  # SOS
            n = payload[0]
            for c in range(n):
                cid, sel = payload[1 + 2 * c : 3 + 2 * c]
                scan.append((cid, sel >> 4, sel & 0xF))
            entropy = data[i + 2 + ln :]
            break
        i += 2 + ln
    if not comps or not scan or h == 0:
        raise ValueError("jpeg: incomplete headers")

    br = _BitReader(entropy)
    nbx, nby = -(-w // 8), -(-h // 8)
    ncomp = len(comps)
    planes = [np.zeros((nby * 8, nbx * 8)) for _ in range(ncomp)]
    pred = [0] * ncomp
    qsel = {cid: q for cid, _s, q in comps}
    zz = _ZIGZAG
    for by in range(nby):
        for bx in range(nbx):
            for ci, (cid, dc_sel, ac_sel) in enumerate(scan):
                blk = np.zeros(64)
                size = _read_symbol(br, htrees[(0, dc_sel)])
                diff = _extend(br.read_bits(size), size) if size else 0
                pred[ci] += diff
                blk[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _read_symbol(br, htrees[(1, ac_sel)])
                    if rs == 0x00:  # EOB
                        break
                    run, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if run == 15:
                            k += 16  # ZRL
                            continue
                        break
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC index overflow")
                    blk[k] = _extend(br.read_bits(size), size)
                    k += 1
                coeffs = np.zeros(64)
                coeffs[zz] = blk
                dq = coeffs.reshape(8, 8) * qtables[qsel[cid]]
                spatial = _C.T @ dq @ _C + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial
    planes = [p[:h, :w] for p in planes]
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images (dB)."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float((d * d).mean())
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)

"""From-scratch BMP and PNG codecs (numpy + zlib only).

The sandbox has no Pillow/OpenCV, so fixture images use formats we can
encode/decode deterministically:

- BMP: uncompressed 24-bit BGR, bottom-up rows, 4-byte row padding,
  BITMAPINFOHEADER. DPI carried in biXPelsPerMeter/biYPelsPerMeter.
- PNG: bit depth 8, color type 0 (grayscale, mode 'L') or 2 (RGB),
  zlib-compressed IDAT; encoder emits filter 0, decoder handles
  filters 0-4. DPI carried in an optional pHYs chunk.

Mirrors the *role* of PIL decode in the reference
(filtering_module.py:285: ``img.size``, ``img.mode``, ``img.info['dpi']``),
not its implementation.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_METERS_PER_INCH = 0.0254


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

def encode_bmp(px: np.ndarray, dpi: int | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    h, w = px.shape[:2]
    row_len = w * 3
    pad = (-row_len) % 4
    # BGR, bottom-up, padded rows
    bgr = px[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row_len + pad), dtype=np.uint8)
        rows[:, :row_len] = bgr.reshape(h, row_len)
    else:
        rows = bgr.reshape(h, row_len)
    body = rows.tobytes()
    ppm = int(round(dpi / _METERS_PER_INCH)) if dpi else 0
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), ppm, ppm, 0, 0)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return file_header + info + body


def decode_bmp(data: bytes) -> tuple[np.ndarray, str, int | None]:
    """Decode a 24-bit uncompressed BMP → ((h, w, 3) uint8 RGB, mode, dpi)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    ppm_x = struct.unpack_from("<i", data, 38)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row_len = w * 3
    stride = row_len + ((-row_len) % 4)
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_len].reshape(h, w, 3)
    rgb = rows[:, :, ::-1] if top_down else rows[::-1, :, ::-1]
    dpi = int(round(ppm_x * _METERS_PER_INCH)) if ppm_x > 0 else None
    return np.ascontiguousarray(rgb), "RGB", dpi


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(px: np.ndarray, dpi: int | None = None) -> bytes:
    """Encode uint8 pixels as PNG.

    (h, w) → grayscale (color type 0, mode 'L'); (h, w, 3) → RGB
    (color type 2). Filter 0 on every row.
    """
    if px.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if px.ndim == 2:
        color_type, channels = 0, 1
        h, w = px.shape
        flat = px.reshape(h, w * channels)
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = px.shape[:2]
        flat = px.reshape(h, w * channels)
    else:
        raise ValueError("encode_png expects (h,w) or (h,w,3)")
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = flat  # filter byte 0 per row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = [_PNG_MAGIC, _chunk(b"IHDR", ihdr)]
    if dpi:
        ppm = int(round(dpi / _METERS_PER_INCH))
        out.append(_chunk(b"pHYs", struct.pack(">IIB", ppm, ppm, 1)))
    out.append(_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def _unfilter(raw: np.ndarray, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse PNG row filters 0-4. raw is (h, 1 + w*channels) uint8."""
    bpp = channels
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            out[y] = line.astype(np.uint8)
        elif ftype == 2:  # Up
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-neighbor scan
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    rec = line[x] + a
                elif ftype == 3:
                    rec = line[x] + ((a + b) >> 1)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec = line[x] + pred
                cur[x] = rec & 0xFF
            out[y] = cur.astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
    return out


def decode_png(data: bytes) -> tuple[np.ndarray, str, int | None]:
    """Decode PNG (bit depth 8, color type 0/2) → (pixels, mode, dpi)."""
    if data[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = len(_PNG_MAGIC)
    idat = bytearray()
    w = h = None
    color_type = None
    dpi = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color_type not in (0, 2) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG: depth={depth} ct={color_type} i={interlace}"
                )
        elif tag == b"pHYs":
            ppm_x, _ppm_y, unit = struct.unpack(">IIB", payload)
            if unit == 1 and ppm_x > 0:
                dpi = int(round(ppm_x * _METERS_PER_INCH))
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = 1 if color_type == 0 else 3
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + w * channels)
    flat = _unfilter(raw, h, w, channels)
    if channels == 1:
        return flat.reshape(h, w), "L", dpi
    return flat.reshape(h, w, 3), "RGB", dpi


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def decode_image(data: bytes) -> tuple[np.ndarray, str, int | None]:
    """Decode by magic bytes → (pixels, mode, dpi).

    Raises ValueError for undecodable/unsupported payloads (caller maps
    those rows to the rejections table, mirroring the reference's PIL
    failure path at filtering_module.py:285-295).
    """
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return decode_png(data)
    if data[:3] == b"\xff\xd8\xff":
        from snapcrawler_spark.kernels.jpeg import decode_jpeg

        px = decode_jpeg(data)
        # baseline JPEG here carries no density segment → dpi None
        return px, ("L" if px.ndim == 2 else "RGB"), None
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from snapcrawler_spark.kernels.gif import decode_gif

        return decode_gif(data)
    if data[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        from snapcrawler_spark.kernels.tiff import decode_tiff

        return decode_tiff(data)
    raise ValueError("undecodable image payload")

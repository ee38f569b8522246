"""From-scratch baseline TIFF codec (numpy + struct only).

Decode-breadth companion to kernels/gif.py (the reference decodes
whatever PIL opens — filtering_module.py:285): uncompressed 8-bit
grayscale/RGB TIFF 6.0, both byte orders (II little / MM big), multi-
strip layouts, DPI from XResolution + ResolutionUnit. That covers the
scanner/export TIFFs a crawl actually meets far more often than the
compressed variants; LZW/JPEG-in-TIFF payloads raise ValueError and
land in the rejections table like any other undecodable row.

The encoder (fixture/tests side) writes single-plane chunky 8-bit
gray or RGB with a configurable strip height and byte order, so the
decoder's strip-reassembly and endianness paths both get exercised by
round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tags used
_W, _H = 256, 257
_BITS = 258
_COMP = 259
_PHOTO = 262
_STRIP_OFF = 273
_SPP = 277
_ROWS_PER_STRIP = 278
_STRIP_CNT = 279
_XRES = 282
_YRES = 283
_RES_UNIT = 296

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def encode_tiff(
    px: np.ndarray,
    dpi: int | None = None,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 as uncompressed TIFF."""
    if px.dtype != np.uint8:
        raise ValueError("encode_tiff expects uint8")
    if px.ndim == 2:
        spp, photo = 1, 1  # BlackIsZero
        h, w = px.shape
    elif px.ndim == 3 and px.shape[2] == 3:
        spp, photo = 3, 2  # RGB
        h, w = px.shape[:2]
    else:
        raise ValueError("encode_tiff expects (h,w) or (h,w,3)")
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or h
    flat = px.reshape(h, w * spp)
    strips = [
        flat[y : y + rps].tobytes() for y in range(0, h, rps)
    ]

    entries = []  # (tag, type, count, value_or_bytes)
    entries.append((_W, 3, 1, w))
    entries.append((_H, 3, 1, h))
    entries.append((_BITS, 3, spp, [8] * spp))
    entries.append((_COMP, 3, 1, 1))
    entries.append((_PHOTO, 3, 1, photo))
    entries.append((_SPP, 3, 1, spp))
    entries.append((_ROWS_PER_STRIP, 3, 1, rps))
    if dpi:
        entries.append((_XRES, 5, 1, (dpi, 1)))
        entries.append((_YRES, 5, 1, (dpi, 1)))
        entries.append((_RES_UNIT, 3, 1, 2))  # inches

    # layout: header(8) + IFD + out-of-line values + strip data
    n_dir = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_size = 2 + n_dir * 12 + 4
    tail_off = ifd_off + ifd_size  # out-of-line value area start
    tail = bytearray()

    def value_field(typ: int, count: int, val) -> bytes:
        if typ == 3:
            vals = val if isinstance(val, list) else [val]
            raw = b"".join(struct.pack(bo + "H", v) for v in vals)
        elif typ == 4:
            vals = val if isinstance(val, list) else [val]
            raw = b"".join(struct.pack(bo + "I", v) for v in vals)
        elif typ == 5:
            raw = struct.pack(bo + "II", *val)
        else:
            raise ValueError(typ)
        if len(raw) <= 4:
            return raw + b"\x00" * (4 - len(raw))
        off = tail_off + len(tail)
        tail.extend(raw)
        return struct.pack(bo + "I", off)

    dir_entries = []
    for tag, typ, count, val in entries:
        dir_entries.append((tag, typ, count, value_field(typ, count, val)))
    # strip tables (offsets resolved after tail is final — reserve now)
    n_strips = len(strips)
    if n_strips == 1:
        off_field_placeholder = None
        cnt_field = struct.pack(bo + "I", len(strips[0]))
        dir_entries.append((_STRIP_CNT, 4, 1, cnt_field))
    else:
        cnt_field = value_field(4, n_strips, [len(s) for s in strips])
        dir_entries.append((_STRIP_CNT, 4, n_strips, cnt_field))
    # strip data begins after the tail
    data_off = tail_off + len(tail) + (4 * n_strips if n_strips > 1 else 0)
    offs = []
    o = data_off
    for s in strips:
        offs.append(o)
        o += len(s)
    if n_strips == 1:
        off_field = struct.pack(bo + "I", offs[0])
    else:
        # the offsets array itself lives in the tail (reserved above)
        off_field = struct.pack(bo + "I", tail_off + len(tail))
        tail.extend(b"".join(struct.pack(bo + "I", x) for x in offs))
    dir_entries.append((_STRIP_OFF, 4, n_strips, off_field))
    dir_entries.sort(key=lambda e: e[0])  # TIFF requires ascending tags

    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    out += struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", n_dir)
    for tag, typ, count, field in dir_entries:
        out += struct.pack(bo + "HHI", tag, typ, count) + field
    out += struct.pack(bo + "I", 0)  # next IFD
    out += tail
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(data: bytes) -> tuple[np.ndarray, str, int | None]:
    """Decode uncompressed 8-bit gray/RGB TIFF → (pixels, mode, dpi)."""
    try:
        return _decode_tiff(data)
    except ValueError:
        raise
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed TIFF: {type(e).__name__}") from e


def _decode_tiff(data: bytes) -> tuple[np.ndarray, str, int | None]:
    if data[:4] == b"II\x2a\x00":
        bo = "<"
    elif data[:4] == b"MM\x00\x2a":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    (n_dir,) = struct.unpack_from(bo + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_dir):
        base = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(bo + "HHI", data, base)
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * count
        voff = base + 8 if size <= 4 else struct.unpack_from(bo + "I", data, base + 8)[0]
        if typ == 3:
            vals = list(struct.unpack_from(bo + f"{count}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(bo + f"{count}I", data, voff))
        elif typ == 5:
            vals = []
            for c in range(count):
                num, den = struct.unpack_from(bo + "II", data, voff + 8 * c)
                vals.append(num // den if den else 0)
        elif typ == 1:
            vals = list(data[voff : voff + count])
        else:  # ASCII — unused here
            vals = []
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    if one(_COMP, 1) != 1:
        raise ValueError(f"unsupported TIFF compression {one(_COMP)}")
    w, h = one(_W), one(_H)
    if not w or not h:
        raise ValueError("TIFF missing dimensions")
    spp = one(_SPP, 1)
    bits = tags.get(_BITS, [8])
    if spp not in (1, 3) or any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF layout spp={spp} bits={bits}")
    offs = tags.get(_STRIP_OFF)
    cnts = tags.get(_STRIP_CNT)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("TIFF missing strip tables")
    raw = b"".join(data[o : o + c] for o, c in zip(offs, cnts))
    need = h * w * spp
    if len(raw) < need:
        raise ValueError(f"TIFF pixel data truncated: {len(raw)} < {need}")
    px = np.frombuffer(raw, np.uint8, need).reshape(
        (h, w) if spp == 1 else (h, w, 3)
    )
    dpi = None
    if one(_RES_UNIT, 2) == 2 and one(_XRES):
        dpi = int(one(_XRES))
    elif one(_RES_UNIT) == 3 and one(_XRES):  # cm → inch
        dpi = int(round(one(_XRES) * 2.54))
    mode = "L" if spp == 1 else "RGB"
    return np.ascontiguousarray(px), mode, dpi

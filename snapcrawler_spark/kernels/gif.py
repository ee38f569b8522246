"""From-scratch GIF87a/GIF89a codec (numpy + stdlib only).

Closes the biggest decode-parity delta vs the reference, which decodes
whatever PIL opens (filtering_module.py:285) — a GIF-heavy corpus lost
every row to ``decode_error`` before this. Scope mirrors the fixture
needs of the other codecs (kernels/codecs.py): single-image (first
frame) GIFs, global or local color table, optional interlacing,
GIF89a extension blocks skipped (a Graphic Control Extension's
transparency index is ignored — the frame renders opaque, which is
what PIL's ``convert("RGB")`` of a first frame does too).

The LZW layer implements the full GIF variable-width coding: codes
start at ``min_code_size + 1`` bits, grow when the table reaches
``2^width`` (cap 12 bits), and reset on CLEAR. The encoder emits CLEAR
exactly when the table fills (4096 entries) so round-trips exercise
the decoder's mid-stream reset path; the decoder also tolerates
"deferred clear" streams (a full table with no CLEAR) by simply
stopping table growth, as real-world encoders produce those.

Decoded pixels come back as (h, w, 3) uint8 RGB with mode ``'P'``
(palette) — the mode PIL reports for GIFs, which the color-mode filter
treats as color (is_valid_color_mode rejects only ``'L'`` under
``'color'``; filtering_module.py:392-402). GIF carries no DPI, so dpi
is None (missing DPI passes, filtering_module.py:378-390).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 1 << 12  # GIF LZW hard cap: 12-bit codes


# --------------------------------------------------------------------------
# LZW
# --------------------------------------------------------------------------

def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """GIF-LZW compress a byte string of palette indices (< 2^mcs)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    def fresh_table() -> dict:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = end + 1
    width = mcs + 1
    emit(clear, width)
    prev = b""
    for byte in indices:
        s = prev + bytes([byte])
        if s in table:
            prev = s
            continue
        emit(table[prev], width)
        table[s] = next_code
        next_code += 1
        # the DECODER's table is one entry behind (it cannot append on
        # the first code after a clear), so widths grow one code later
        # than the encoder table size alone would suggest
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        prev = bytes([byte])
        if next_code == _MAX_CODE:
            emit(clear, width)
            table = fresh_table()
            next_code = end + 1
            width = mcs + 1
    if prev:
        emit(table[prev], width)
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    emit(end, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int) -> bytes:
    """Inverse of ``_lzw_encode``; also accepts deferred-clear streams."""
    clear, end = 1 << mcs, (1 << mcs) + 1

    def fresh_table() -> list:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = fresh_table()
    width = mcs + 1
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + width <= nbits:
        byte_idx = bitpos >> 3
        chunk = int.from_bytes(data[byte_idx : byte_idx + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = fresh_table()
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: bad first code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("GIF LZW: code out of range")
            if len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        out += entry
        prev = entry
    return bytes(out)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row indices in GIF 4-pass interlace transmission order."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    px: np.ndarray,
    interlace: bool = False,
    version: bytes = b"GIF87a",
) -> bytes:
    """Encode (h, w, 3) uint8 RGB (≤256 distinct colors) or (h, w)
    uint8 grayscale as a single-frame GIF with a global color table."""
    if px.dtype != np.uint8:
        raise ValueError("encode_gif expects uint8")
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w[, 3])")
    h, w = px.shape[:2]
    palette, inverse = np.unique(
        px.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(palette) > 256:
        raise ValueError(f"too many colors for GIF: {len(palette)}")
    gct_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    gct = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    indices = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        indices = indices[_interlace_order(h)]
    mcs = max(2, gct_bits)
    out = bytearray()
    out += version
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1), 0, 0)
    out += gct.tobytes()
    if version == b"GIF89a":
        # a minimal Graphic Control Extension (no transparency) so the
        # decoder's extension-skip path is exercised by 89a fixtures
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00
    )
    out.append(mcs)
    out += _sub_blocks(_lzw_encode(indices.tobytes(), mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes) -> tuple[np.ndarray, str, None]:
    """Decode the FIRST image of a GIF87a/89a → ((h, w, 3) uint8 RGB,
    'P', None). Extension blocks are skipped; animation frames past the
    first are ignored (the reference's PIL open reads frame 0 too).
    Raises ValueError on any malformed/truncated payload."""
    try:
        return _decode_gif(data)
    except ValueError:
        raise
    except (IndexError, struct.error, OverflowError) as e:
        # truncated block chains / headers land here — the caller
        # contract (kernels/codecs.decode_image) is ValueError
        raise ValueError(f"malformed GIF: {type(e).__name__}") from e


def _decode_gif(data: bytes) -> tuple[np.ndarray, str, None]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF image with no color table")
            mcs = data[pos]
            pos += 1
            comp = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                comp += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(comp), mcs), dtype=np.uint8
            )
            if len(idx) < w * h:
                raise ValueError(
                    f"GIF pixel data truncated: {len(idx)} < {w * h}"
                )
            idx = idx[: w * h].reshape(h, w)
            if iflags & 0x40:
                rows = np.empty(h, dtype=np.int64)
                rows[_interlace_order(h)] = np.arange(h)
                idx = idx[rows]
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("GIF index out of palette range")
            return np.ascontiguousarray(ct[idx]), "P", None
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image block")

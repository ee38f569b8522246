"""Magic-byte format sniffing.

Mirrors the signature table of the reference's format detector
(advanced_formats.py:76-119): JPEG/PNG/GIF/WEBP/BMP/TIFF/SVG/AVIF/HEIC/
JXL, with 'unknown' for anything else. This replaces the reference's
HTTP Content-Type gate (filtering_module.py:193-197): a row whose bytes
don't sniff as an image is rejected with reason ``non_image_content_type``.
"""

from __future__ import annotations

_FTYP_BRANDS = {
    b"avif": "avif",
    b"avis": "avif",
    b"heic": "heic",
    b"heix": "heic",
    b"hevc": "heic",
    b"mif1": "heif",
    b"msf1": "heif",
}


def sniff_format(data: bytes | None) -> str:
    """Return a lowercase format token or 'unknown'."""
    if not data or len(data) < 4:
        return "unknown"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:3] == b"GIF":
        return "gif"
    if data[:4] == b"RIFF" and len(data) >= 12 and data[8:12] == b"WEBP":
        return "webp"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:12] == b"\x00\x00\x00\x0cJXL \r\n\x87\n" or data[:2] == b"\xff\x0a":
        return "jxl"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return _FTYP_BRANDS.get(data[8:12], "unknown")
    head = data[:256].lstrip()
    if head[:4] == b"<svg" or (head[:5] == b"<?xml" and b"<svg" in data[:1024]):
        return "svg"
    return "unknown"

"""Minimal pure-Python PNG codec (stdlib only: zlib + struct).

Gives `decode_images` a REAL decode path in environments without
PIL/libpng: full chunk parse, zlib inflate, and all five PNG scanline
filters (None/Sub/Up/Average/Paeth, RFC 2083 §6), for 8-bit
greyscale / grey+alpha / RGB / RGBA / palette-indexed (PLTE, a
dominant web shape) images, non-interlaced. Interlaced (Adam7),
16-bit, and sub-8-bit palette images raise ValueError — a real corpus
pipeline routes those to a full decoder; this covers the dominant
web-PNG shapes and proves the plumbing end-to-end. Palette images
decode straight to RGB via the PLTE lookup (tRNS alpha is dropped,
matching the convert('RGB') contract).

The encoder writes the same subset (filter 0 scanlines) and exists so
tests can build genuine PNG fixtures and round-trip them without any
imaging library.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only); palette (3) is
# one index sample per pixel on the wire, three RGB channels decoded
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_FILTER_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _MAGIC


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG: truncated chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG: missing IEND")


def read_ihdr(data: bytes):
    """Cheap header probe: (width, height, channels) from IHDR alone —
    no IDAT inflate. Lets callers apply size guards BEFORE paying the
    decompress + unfilter cost (or feeding a decompression bomb)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad magic)")
    for ctype, body in _chunks(bytes(data)):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in _FILTER_CHANNELS \
                    or interlace or comp or filt:
                raise ValueError("PNG: unsupported image parameters")
            return width, height, 3 if color == 3 else _CHANNELS[color]
        break  # IHDR must be first
    raise ValueError("PNG: no IHDR")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes):
    """PNG bytes → (width, height, channels, raw bytes w*h*channels)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad magic)")
    width = height = None
    channels = 0
    color = -1
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(bytes(data)):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"PNG: unsupported bit depth {depth}")
            if color not in _FILTER_CHANNELS:
                raise ValueError(f"PNG: unsupported color type {color}")
            if interlace:
                raise ValueError("PNG: interlaced images unsupported")
            if comp or filt:
                raise ValueError("PNG: nonstandard compression/filter")
            channels = _FILTER_CHANNELS[color]
        elif ctype == b"PLTE":
            if len(body) == 0 or len(body) % 3 or len(body) > 768:
                raise ValueError("PNG: malformed PLTE")
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG: no IHDR")
    if color == 3 and palette is None:
        raise ValueError("PNG: palette image without PLTE")
    stride = width * channels
    expected = (stride + 1) * height
    # bounded inflate: never expand past the size the IHDR dimensions
    # promise (+1 to detect overflow) — a crafted decompression bomb
    # fails fast instead of ballooning memory
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or d.decompress(b"", 1):
        raise ValueError("PNG: decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: bad filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    if color == 3:
        # map indices through PLTE post-unfilter -> RGB
        n_entries = len(palette) // 3
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            if idx >= n_entries:
                raise ValueError("PNG: palette index out of range")
            rgb[3 * i:3 * i + 3] = palette[3 * idx:3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, channels, bytes(out)


def decode_png_rgb(data: bytes):
    """PNG bytes → (width, height, RGB bytes w*h*3): greyscale
    replicates into RGB, alpha is dropped — the convert('RGB')
    contract decode_images promises."""
    w, h, ch, raw = decode_png(data)
    if ch == 3:
        return w, h, raw
    out = bytearray(w * h * 3)
    if ch == 1:
        for i in range(w * h):
            out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = raw[i]
    elif ch == 2:  # grey + alpha
        for i in range(w * h):
            g = raw[2 * i]
            out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = g
    else:  # RGBA
        for i in range(w * h):
            out[3 * i:3 * i + 3] = raw[4 * i:4 * i + 3]
    return w, h, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(width: int, height: int, pixels: bytes,
               channels: int = 3) -> bytes:
    """(w, h, raw bytes) → PNG bytes (8-bit, filter 0 scanlines)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride:(y + 1) * stride])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def encode_png_palette(width: int, height: int, indices: bytes,
                       palette: bytes) -> bytes:
    """(w, h, one index byte per pixel, RGB-triple palette) → indexed
    PNG (color type 3, 8-bit, PLTE, filter 0 scanlines) — the fixture
    builder for the palette decode path."""
    if len(indices) != width * height:
        raise ValueError("index buffer size mismatch")
    if len(palette) == 0 or len(palette) % 3 or len(palette) > 768:
        raise ValueError("palette must be 1..256 RGB triples")
    if max(indices) >= len(palette) // 3:
        raise ValueError("palette index out of range")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(indices[y * width:(y + 1) * width])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", bytes(palette))
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))

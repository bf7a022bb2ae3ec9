"""Minimal GIF87a/89a codec — stdlib only.

Written from the public GIF89a specification (logical screen
descriptor, color tables, image descriptor, graphic-control
extension, and the GIF flavor of variable-width LZW with clear/end
codes and LSB-first packing inside 255-byte sub-blocks), the same
from-the-spec approach as pipeline/png.py and pipeline/jpeg.py. The
reference engine has no image handling at all (this module serves the
pipeline brief's multimodal columns); decode here is REAL — no PIL.

Scope: decodes the FIRST frame composited onto the logical screen
(background-filled, frame offset honored, GCE transparency leaves the
background). Animated GIFs' later frames are out of scope for corpus
feature extraction; the first frame is what dedup/embedding sees.
Corrupt or truncated streams raise ValueError (typed, like the other
codecs).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def read_screen(data: bytes) -> Tuple[int, int]:
    """Cheap header probe: logical screen (width, height) — the size
    guard runs on these 10 bytes before any LZW work."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad magic)")
    if len(data) < 10:
        raise ValueError("GIF: truncated screen descriptor")
    w, h = struct.unpack("<HH", data[6:10])
    return w, h


def _read_color_table(data: bytes, pos: int, n: int):
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("GIF: truncated color table")
    table = [tuple(data[i:i + 3]) for i in range(pos, end, 3)]
    return table, end


def _read_subblocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated data sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("GIF: truncated data sub-blocks")
        out += data[pos:pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int,
                max_pixels: int) -> bytearray:
    """GIF variable-width LZW: codes LSB-first, clear/end codes,
    dictionary capped at 4096 entries."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("GIF: bad LZW minimum code size")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    bytepos = 0

    def init_dict():
        d: List[bytes] = [bytes([i]) for i in range(clear)]
        d += [b"", b""]  # clear + end placeholders
        return d

    dictionary = init_dict()
    code_size = min_code_size + 1
    prev: bytes = b""
    while True:
        while nbits < code_size:
            if bytepos >= len(data):
                raise ValueError("GIF: LZW stream ended without"
                                 " end-of-information code")
            acc |= data[bytepos] << nbits
            bytepos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            dictionary = init_dict()
            code_size = min_code_size + 1
            prev = b""
            continue
        if code == end:
            return out
        if prev == b"":
            if code >= len(dictionary):
                raise ValueError("GIF: LZW code out of range")
            entry = dictionary[code]
        elif code < len(dictionary):
            entry = dictionary[code]
            dictionary.append(prev + entry[:1])
        elif code == len(dictionary):
            entry = prev + prev[:1]
            dictionary.append(entry)
        else:
            raise ValueError("GIF: LZW code out of range")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("GIF: LZW output exceeds frame size")
        prev = entry
        if (len(dictionary) == (1 << code_size)
                and code_size < 12):
            code_size += 1


def decode_gif(data: bytes):
    """GIF bytes → (width, height, palette, index bytes w*h,
    transparent_index or None) for the first frame composited onto
    the logical screen (frame offset honored; pixels outside the
    frame, and transparent pixels, take the background index)."""
    sw, sh = read_screen(data)
    data = bytes(data)
    flags, bg, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 7))
    transparent = None
    while True:
        if pos >= len(data):
            raise ValueError("GIF: missing image descriptor")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF: no image frame before trailer")
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                if body[0] & 1:
                    transparent = body[3]
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("GIF: truncated image descriptor")
        fx, fy, fw, fh = struct.unpack("<HHHH", data[pos:pos + 8])
        iflags = data[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > sw or fy + fh > sh:
            raise ValueError("GIF: frame exceeds logical screen")
        palette = gct
        if iflags & 0x80:
            palette, pos = _read_color_table(
                data, pos, 2 << (iflags & 7))
        if palette is None:
            raise ValueError("GIF: no color table for frame")
        if pos >= len(data):
            raise ValueError("GIF: truncated LZW header")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(lzw, min_code_size, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError("GIF: LZW data decodes short frame")
        idx = idx[:fw * fh]
        if max(idx) >= len(palette):
            raise ValueError("GIF: pixel index outside color table")
        if iflags & 0x40:  # interlaced: reorder rows
            rows = [None] * fh
            k = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, fh, step):
                    rows[y] = idx[k * fw:(k + 1) * fw]
                    k += 1
            idx = bytearray(b"".join(rows))
        bg_idx = bg if gct is not None and bg < len(gct) else 0
        if (fx, fy, fw, fh) == (0, 0, sw, sh) and transparent is None:
            return sw, sh, palette, bytes(idx), transparent
        screen = bytearray([bg_idx]) * (sw * sh)
        for y in range(fh):
            row = idx[y * fw:(y + 1) * fw]
            off = (fy + y) * sw + fx
            if transparent is None:
                screen[off:off + fw] = row
            else:
                for x, v in enumerate(row):
                    if v != transparent:
                        screen[off + x] = v
        return sw, sh, palette, bytes(screen), transparent


def decode_gif_rgb(data: bytes) -> Tuple[int, int, bytes]:
    """GIF bytes → (width, height, RGB bytes w*h*3) of the first
    frame composited onto the logical screen."""
    w, h, palette, idx, _t = decode_gif(data)
    flat = bytearray(w * h * 3)
    for i, v in enumerate(idx):
        flat[3 * i:3 * i + 3] = bytes(palette[v])
    return w, h, bytes(flat)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], code_size)
        # the decoder appends an entry for this final code too (its
        # adds lag ours by one), so mirror that phantom add before
        # choosing the END code's width — otherwise a table that
        # fills exactly at the last data code leaves the decoder one
        # bit wider than us for END
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(width: int, height: int, rgb: bytes,
               interlace: bool = False) -> bytes:
    """(w, h, RGB bytes) → single-frame GIF89a. The palette is built
    from the image's unique colors (≤ 256 required — this is a
    fixture/test encoder, matching encode_png/encode_jpeg's role)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be exactly w*h*3 bytes")
    colors: dict = {}
    indices = bytearray()
    for i in range(0, len(rgb), 3):
        c = rgb[i:i + 3]
        j = colors.setdefault(c, len(colors))
        if j > 255:
            raise ValueError(
                "encode_gif needs <= 256 unique colors")
        indices.append(j)
    # palette size: power of two >= max(2, n), as the format requires
    bits = 1
    while (1 << bits) < len(colors):
        bits += 1
    palette = list(colors) + [b"\x00\x00\x00"] * ((1 << bits)
                                                  - len(colors))
    if interlace:
        reordered = bytearray()
        for start, step in _INTERLACE_PASSES:
            for y in range(start, height, step):
                reordered += indices[y * width:(y + 1) * width]
        indices = reordered
    min_code_size = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | ((bits - 1) & 7), 0, 0)
    for c in palette:
        out += c
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height,
                                 0x40 if interlace else 0)
    out.append(min_code_size)
    lzw = _lzw_encode(bytes(indices), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)

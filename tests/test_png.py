"""Pure-Python PNG codec (pipeline/png.py) and the real decode path of
decode_images (no PIL in this container — the vendored codec IS the
real path for PNG blobs)."""

import random
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from xapian_spark.pipeline.png import (
    decode_png, decode_png_rgb, encode_png, is_png,
)


def test_roundtrip_all_channel_counts():
    rnd = random.Random(7)
    for w, h, ch in [(1, 1, 1), (3, 2, 3), (8, 5, 4), (16, 16, 3),
                     (7, 9, 2)]:
        px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
        blob = encode_png(w, h, px, ch)
        assert is_png(blob)
        assert decode_png(blob) == (w, h, ch, px)
        rw, rh, rgb = decode_png_rgb(blob)
        assert (rw, rh, len(rgb)) == (w, h, w * h * 3)


def test_decode_externally_filtered_scanlines():
    # a PNG whose rows use every filter type (Sub/Up/Average/Paeth),
    # encoded by hand — proves the UNFILTER side against an encoder
    # the decoder has never seen
    rnd = random.Random(11)
    w, h, ch = 4, 5, 3
    px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        line = bytearray(px[y * stride:(y + 1) * stride])
        f = y % 5
        enc = bytearray(line)
        if f == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (line[i] - line[i - ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                enc[i] = (line[i] - paeth(a, prev[i], c)) & 0xFF
        raw.append(f)
        raw.extend(enc)
        prev = line

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    assert decode_png(blob) == (w, h, 3, px)


def test_rejects_unsupported_shapes():
    blob = encode_png(2, 2, bytes(12), 3)
    assert not is_png(b"\xff\xd8\xff")  # JPEG magic
    with pytest.raises(ValueError, match="magic"):
        decode_png(b"not a png")
    # 16-bit depth refused
    bad = bytearray(blob)
    bad[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_decode_images_real_path(spark):
    from xapian_spark.pipeline.multimodal import (
        decode_images, synthetic_png_media,
    )

    media = synthetic_png_media(spark, 12)
    out = decode_images(media, fake=False).select(
        "media_id", "width", "height",
        F.length("pixels").alias("nbytes")).collect()
    assert len(out) == 12
    for r in out:
        assert r["nbytes"] == r["width"] * r["height"] * 3
    # decoded dims come from IHDR and must match the fixture formula
    dims = {r["media_id"]: (r["width"], r["height"]) for r in out}
    for i in range(12):
        assert dims[i] == (8 + (i % 4) * 4, 8 + (i % 3) * 4)


def test_decode_images_real_pixels_roundtrip(spark):
    # the decoded pixel bytes equal the exact pixels that were encoded
    # (truecolor rows) / the PLTE lookup of the encoded indices
    # (palette rows, i % 3 == 2)
    import hashlib

    from xapian_spark.pipeline.multimodal import (
        _PNG_TEST_PALETTE, _fake_pixels, decode_images,
        synthetic_png_media,
    )

    media = synthetic_png_media(spark, 6)
    rows = {r["media_id"]: bytes(r["pixels"])
            for r in decode_images(media, fake=False).collect()}
    for i in range(6):
        w = 8 + (i % 4) * 4
        h = 8 + (i % 3) * 4
        if i % 3 == 2:
            idx = _fake_pixels(
                hashlib.md5(f"7:pngp:{i}".encode()).digest(),
                w, h)[: w * h]
            expect = b"".join(
                _PNG_TEST_PALETTE[3 * b:3 * b + 3] for b in idx)
        else:
            expect = _fake_pixels(
                hashlib.md5(f"7:png:{i}".encode()).digest(), w, h)
        assert rows[i] == expect


def test_palette_roundtrip_and_validation():
    import pytest

    from xapian_spark.pipeline.png import (
        decode_png, decode_png_rgb, encode_png_palette, read_ihdr,
    )

    w, h = 5, 3
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])  # 4 entries
    idx = bytes([0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 2])
    blob = encode_png_palette(w, h, idx, pal)
    assert read_ihdr(blob) == (w, h, 3)  # reports DECODED channels
    got = decode_png(blob)
    expect = b"".join(pal[3 * b:3 * b + 3] for b in idx)
    assert got == (w, h, 3, expect)
    assert decode_png_rgb(blob) == (w, h, expect)
    # out-of-range index rejected at encode time
    with pytest.raises(ValueError):
        encode_png_palette(2, 1, bytes([0, 9]), pal)
    # and at decode time (craft: encode with big palette, shrink PLTE)
    big = encode_png_palette(2, 1, bytes([0, 5]),
                             bytes(range(18)))  # 6 entries
    plte_at = big.index(b"PLTE")
    import struct as _s
    import zlib as _z
    # rebuild with a 2-entry PLTE, leaving the index stream at 5
    body = bytes(range(6))
    chunk = (_s.pack(">I", len(body)) + b"PLTE" + body
             + _s.pack(">I", _z.crc32(b"PLTE" + body) & 0xFFFFFFFF))
    (old_len,) = _s.unpack(">I", big[plte_at - 4:plte_at])
    tail = plte_at + 8 + old_len  # len+type+body+crc from plte_at-4
    hacked = big[:plte_at - 4] + chunk + big[tail:]
    with pytest.raises(ValueError, match="index out of range"):
        decode_png(hacked)
    # palette image without PLTE
    noplte = big[:plte_at - 4] + big[tail:]
    with pytest.raises(ValueError, match="without PLTE"):
        decode_png(noplte)

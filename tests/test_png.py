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
    import hashlib

    from xapian_spark.pipeline.multimodal import (
        _fake_pixels, decode_images, synthetic_png_media,
    )

    media = synthetic_png_media(spark, 4)
    rows = {r["media_id"]: bytes(r["pixels"])
            for r in decode_images(media, fake=False).collect()}
    for i in range(4):
        w = 8 + (i % 4) * 4
        h = 8 + (i % 3) * 4
        expect = _fake_pixels(
            hashlib.md5(f"7:png:{i}".encode()).digest(), w, h)
        assert rows[i] == expect

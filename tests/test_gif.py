"""Pure-Python GIF codec (pipeline/gif.py) and the real GIF decode
path of decode_images. GIF is lossless, so every check is exact."""

import numpy as np
import pytest

from xapian_spark.pipeline.gif import (
    decode_gif, decode_gif_rgb, encode_gif, is_gif, read_screen,
)


def _pattern(w, h, i=0):
    yy, xx = np.mgrid[0:h, 0:w]
    j = (xx + 2 * yy + i) % 8
    pal = np.stack([(31 * np.arange(8) + i) % 256,
                    (63 * np.arange(8) + 2 * i) % 256,
                    (17 * np.arange(8) + 5 * i) % 256],
                   axis=-1).astype(np.uint8)
    return pal[j].tobytes()


def test_roundtrip_exact_plain_and_interlaced():
    for w, h, interlace in [(8, 8, False), (23, 17, False),
                            (23, 17, True), (64, 48, True),
                            (1, 1, False)]:
        rgb = _pattern(w, h)
        blob = encode_gif(w, h, rgb, interlace=interlace)
        assert is_gif(blob)
        assert read_screen(blob) == (w, h)
        assert decode_gif_rgb(blob) == (w, h, rgb)


def test_code_width_growth_and_dict_reset():
    # 256 distinct colors force code sizes through 9..12 bits and a
    # dictionary reset at 4096 entries
    w, h = 200, 120
    g = (np.add.outer(np.arange(h), np.arange(w)) % 256) \
        .astype(np.uint8)
    rgb = np.stack([g, g, g], -1).tobytes()
    assert decode_gif_rgb(encode_gif(w, h, rgb)) == (w, h, rgb)


def test_palette_capacity_and_errors():
    with pytest.raises(ValueError, match="256 unique"):
        w, h = 32, 32
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack([xx * 8, yy * 8, (xx + yy)], -1) \
            .astype(np.uint8).tobytes()
        encode_gif(w, h, rgb)
    with pytest.raises(ValueError, match="magic"):
        decode_gif_rgb(b"\x89PNG" + b"\x00" * 20)
    with pytest.raises(ValueError, match="w\\*h\\*3"):
        encode_gif(4, 4, b"\x00" * 10)


def test_truncation_raises_valueerror():
    blob = encode_gif(16, 12, _pattern(16, 12))
    for cut in (5, 9, 14, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ValueError):
            decode_gif_rgb(blob[:cut])


def test_transparency_composites_on_background():
    # hand-build a GIF whose frame is a 2x2 sub-rect of a 4x4 screen
    # with a transparent index: untouched + transparent pixels take
    # the background color
    import struct

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 3, 0)  # bg index 3
    for c in pal:
        out += bytes(c)
    # GCE: transparency on, transparent index 2
    out += b"\x21\xf9\x04\x01\x00\x00\x02\x00"
    # frame at (1,1) 2x2, indices [0, 2, 2, 1]
    from xapian_spark.pipeline.gif import _lzw_encode

    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    lzw = _lzw_encode(bytes([0, 2, 2, 1]), 2)
    out += bytes([2]) + bytes([len(lzw)]) + lzw + b"\x00\x3b"
    w, h, pal_out, idx, transparent = decode_gif(bytes(out))
    assert (w, h, transparent) == (4, 4, 2)
    grid = np.frombuffer(idx, dtype=np.uint8).reshape(4, 4)
    assert grid[1, 1] == 0 and grid[2, 2] == 1
    assert grid[1, 2] == 3 and grid[2, 1] == 3  # transparent -> bg
    assert (grid[0] == 3).all() and (grid[:, 0] == 3).all()


def test_decode_images_gif_real_path(spark):
    from xapian_spark.pipeline.multimodal import (
        decode_images, image_pixel_stats, synthetic_gif_media,
    )

    out = {r["media_id"]: r for r in image_pixel_stats(
        decode_images(synthetic_gif_media(spark, 8), fake=False)
    ).collect()}
    assert len(out) == 8
    for i in range(8):
        w = 12 + (i % 3) * 8
        h = 10 + (i % 2) * 6
        rgb = np.frombuffer(_pattern(w, h, i), dtype=np.uint8)
        r = out[i]
        assert (r["width"], r["height"]) == (w, h)
        assert r["pixel_bytes"] == w * h * 3
        assert r["pixel_sum"] == int(rgb.astype(np.int64).sum())

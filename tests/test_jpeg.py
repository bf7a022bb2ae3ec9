"""Pure-Python baseline JPEG codec (pipeline/jpeg.py) and the real
JPEG decode path of decode_images (no PIL in this container — the
vendored codec IS the real path for JPEG blobs)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xapian_spark.pipeline.jpeg import (
    decode_jpeg, decode_jpeg_rgb, encode_jpeg, is_jpeg, read_sof,
)


def _gradient(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255) // max(w - 1, 1)
    g = (yy * 255) // max(h - 1, 1)
    b = ((xx + yy) * 255) // max(w + h - 2, 1)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_flat_grey_is_exact():
    # flat 128: every DCT coefficient is exactly 0 after level shift,
    # so quantization is analytically lossless at ANY quality
    for w, h, q in [(8, 8, 10), (16, 8, 50), (24, 17, 95)]:
        px = bytes([128]) * (w * h)
        blob = encode_jpeg(w, h, px, channels=1, quality=q)
        assert is_jpeg(blob)
        assert read_sof(blob) == (w, h, 1)
        assert decode_jpeg(blob) == (w, h, 1, px)


def test_flat_rgb_is_near_exact():
    # a flat RGB color: Y/Cb/Cr are flat, DC-only; DC quantization
    # rounds once per plane — decoded color is within 1 quant step of
    # exact and UNIFORM across the image
    w, h = 16, 16
    px = bytes([200, 60, 140]) * (w * h)
    blob = encode_jpeg(w, h, px, 3, quality=90)
    W, H, rgb = decode_jpeg_rgb(blob)
    dec = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    assert (W, H) == (w, h)
    assert (dec == dec[0, 0]).all()  # uniform
    assert np.abs(dec[0, 0].astype(int) - [200, 60, 140]).max() <= 3


def test_roundtrip_closeness_all_variants():
    w, h = 24, 17
    base = _gradient(w, h)
    for kwargs, tol in [
        (dict(quality=90), 3.0),              # RGB 4:4:4
        (dict(quality=90, subsample=True), 4.0),   # RGB 4:2:0
        (dict(quality=90, restart_interval=2), 3.0),
        (dict(quality=50), 8.0),
    ]:
        blob = encode_jpeg(w, h, base.tobytes(), 3, **kwargs)
        W, H, rgb = decode_jpeg_rgb(blob)
        dec = np.frombuffer(rgb, dtype=np.uint8).astype(int)
        mae = np.abs(dec.reshape(h, w, 3) - base.astype(int)).mean()
        assert (W, H) == (w, h)
        assert mae < tol, (kwargs, mae)


def test_restart_interval_reconstruction_identical():
    # restart markers change the bitstream (DC predictors reset) but
    # must NOT change reconstructed pixels
    w, h = 32, 24
    base = _gradient(w, h)
    plain = decode_jpeg_rgb(encode_jpeg(w, h, base.tobytes(), 3))
    rst = decode_jpeg_rgb(
        encode_jpeg(w, h, base.tobytes(), 3, restart_interval=1))
    assert plain == rst


def test_grayscale_replicates_to_rgb():
    w, h = 16, 8
    g = (np.arange(w * h) % 256).astype(np.uint8)
    blob = encode_jpeg(w, h, g.tobytes(), 1, quality=95)
    W, H, rgb = decode_jpeg_rgb(blob)
    dec = np.frombuffer(rgb, dtype=np.uint8).reshape(h * w, 3)
    assert (dec[:, 0] == dec[:, 1]).all()
    assert (dec[:, 1] == dec[:, 2]).all()


def test_rejects_unsupported_shapes():
    assert not is_jpeg(b"\x89PNG")
    with pytest.raises(ValueError, match="magic"):
        decode_jpeg(b"not a jpeg")
    blob = bytearray(encode_jpeg(8, 8, bytes([128]) * 64, 1))
    # flip SOF0 (0xC0) to arithmetic-coded SOF9 (unsupported; SOF2
    # progressive IS supported now and has its own tests below)
    sof_at = blob.index(b"\xff\xc0")
    blob[sof_at + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOF"):
        read_sof(bytes(blob))
    # truncation anywhere raises the documented ValueError — never
    # IndexError/struct.error (corrupt corpus blobs must fail typed)
    full = encode_jpeg(8, 8, bytes(range(64)), 1)
    # (cutting just the 2-byte EOI leaves a complete scan — decoders
    # tolerate that; any cut into the entropy data must raise)
    for cut in (8, 4, 3):
        with pytest.raises(ValueError):
            decode_jpeg(full[:-cut])
    # truncated mid-header (inside the DQT/SOF segments)
    for end in range(4, min(len(full) - 1, 64)):
        with pytest.raises(ValueError):
            decode_jpeg(full[:end])


def test_decode_images_jpeg_real_path(spark):
    from xapian_spark.pipeline.multimodal import (
        decode_images, synthetic_jpeg_media,
    )

    media = synthetic_jpeg_media(spark, 12)
    out = decode_images(media, fake=False).select(
        "media_id", "width", "height",
        F.length("pixels").alias("nbytes")).collect()
    assert len(out) == 12
    for r in out:
        assert r["nbytes"] == r["width"] * r["height"] * 3
    dims = {r["media_id"]: (r["width"], r["height"]) for r in out}
    for i in range(12):
        assert dims[i] == (16 + (i % 3) * 8, 16 + (i % 2) * 8)


def test_decode_images_jpeg_pixels_close(spark):
    # decoded pixels approximate the encoded gradient (lossy codec —
    # closeness, not equality; exactness is covered by the flat-block
    # goldens above)
    from xapian_spark.pipeline.multimodal import (
        decode_images, synthetic_jpeg_media,
    )

    media = synthetic_jpeg_media(spark, 4)
    rows = {r["media_id"]: bytes(r["pixels"])
            for r in decode_images(media, fake=False).collect()}
    for i in (1, 2, 3):  # RGB variants
        w = 16 + (i % 3) * 8
        h = 16 + (i % 2) * 8
        base = _gradient(w, h).astype(int)
        dec = np.frombuffer(rows[i], dtype=np.uint8).astype(int) \
            .reshape(h, w, 3)
        assert np.abs(dec - base).mean() < 5.0, i


def test_non_interleaved_scan_rejected():
    # an SOS selecting fewer components than the frame declares is
    # spec-legal (multi-scan baseline) but unsupported — must raise,
    # never silently decode with interleaved MCU geometry
    from xapian_spark.pipeline.jpeg import decode_jpeg_rgb, encode_jpeg

    w, h = 16, 16
    px = bytes(range(256)) * 3
    blob = bytearray(encode_jpeg(w, h, px[:w * h * 3], 3))
    i = blob.find(b"\xff\xda")
    assert i > 0
    blob[i + 4] = 1  # Ns: 3 -> 1 (leave seglen; parser uses seglen)
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg_rgb(bytes(blob))


# ---------------------------------------------------------------------------
# Progressive (SOF2)
# ---------------------------------------------------------------------------

def test_progressive_decode_equals_baseline_decode():
    # progressive and baseline encodes share _prepare_blocks, so the
    # quantized coefficients are identical — decode must agree
    # BIT-exactly. This pins the whole Annex-G scan machinery (DC
    # first + refine, banded AC first + two refinement levels, EOB
    # runs, ZRL) against the already-golden baseline path.
    from xapian_spark.pipeline.jpeg import encode_progressive_jpeg

    rng = np.random.default_rng(3)
    cases = [(16, 16, 3, False, 85), (24, 17, 3, False, 85),
             (32, 24, 3, True, 85), (24, 17, 1, False, 60),
             (48, 40, 3, True, 40)]
    for w, h, ch, sub, q in cases:
        if ch == 1:
            px = rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes()
        else:
            px = rng.integers(0, 256, (h, w, 3),
                              dtype=np.uint8).tobytes()
        pb = encode_progressive_jpeg(w, h, px, ch, quality=q,
                                     subsample=sub)
        assert read_sof(pb) == (w, h, ch)
        got = decode_jpeg(pb)
        exp = decode_jpeg(encode_jpeg(w, h, px, ch, quality=q,
                                      subsample=sub))
        assert got == exp, (w, h, ch, sub, q)


def test_progressive_flat_gray_exact():
    from xapian_spark.pipeline.jpeg import encode_progressive_jpeg

    px = bytes([128]) * (24 * 16)
    blob = encode_progressive_jpeg(24, 16, px, 1, quality=30)
    assert decode_jpeg(blob) == (24, 16, 1, px)


def test_progressive_truncation_raises():
    from xapian_spark.pipeline.jpeg import encode_progressive_jpeg

    px = bytes(range(64)) * 3
    blob = encode_progressive_jpeg(8, 24, px, 1)
    for cut in (4, 16, len(blob) // 3, len(blob) // 2):
        with pytest.raises(ValueError):
            decode_jpeg(blob[:cut])


def test_progressive_through_decode_images(spark):
    from xapian_spark.pipeline.multimodal import (
        decode_images, synthetic_jpeg_media)

    out = decode_images(synthetic_jpeg_media(spark, 10),
                        fake=False).collect()
    assert len(out) == 10
    for r in out:
        w = 16 + (r["media_id"] % 3) * 8
        h = 16 + (r["media_id"] % 2) * 8
        assert (r["width"], r["height"]) == (w, h)
        assert len(r["pixels"]) == w * h * 3

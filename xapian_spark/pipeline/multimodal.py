"""Multimodal column plumbing for training-data pipelines.

Media (image/audio/video) are opaque `binary` columns with typed
metadata. The Spark-side plumbing — schemas, Arrow-batched
mapInPandas transforms, partition-size control for large blobs — is
real and tested; the actual codec work (JPEG decode, resampling, frame
extraction) is STUBBED because no image/audio libraries exist in this
container. Each stub either raises NotImplementedError (real-codec
mode) or produces a deterministic fake derived from the bytes
(`fake=True`, used by tests), with the batch shapes a real decoder
would produce.

Design notes for 100 TB:
- blobs ride in their own column; metadata-only operations
  (filtering by width/duration, bucketing) never deserialize bytes —
  column pruning keeps the scan light (`ReadSchema` without the blob)
- transforms are mapInPandas with a small
  `spark.sql.execution.arrow.maxRecordsPerBatch` so a batch of blobs
  fits executor memory
- derived features (embeddings, resized thumbs) are emitted as new
  columns, preserving partitioning — no shuffle
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

IMAGE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("uri", StringType(), True),
    StructField("mime", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("data", BinaryType(), True),
])

AUDIO_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("uri", StringType(), True),
    StructField("mime", StringType(), False),
    StructField("sample_rate", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("data", BinaryType(), True),
])


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except ImportError:
        return None


def _fake_pixels(data: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for decoded RGB pixels: md5-keyed byte
    stream with the exact size a real decode would produce (w*h*3)."""
    out = bytearray()
    counter = 0
    need = w * h * 3
    seed = hashlib.md5(data[:64] if data else b"").digest()
    while len(out) < need:
        out.extend(hashlib.md5(seed + struct.pack("<I", counter)).digest())
        counter += 1
    return bytes(out[:need])


def decode_images(images: DataFrame, max_pixels: int = 1 << 22,
                  fake: bool = False) -> DataFrame:
    """binary image column → (media_id, width, height, pixels BINARY
    = RGB w*h*3).

    Real mode decodes PNG blobs with the vendored pure-Python codec
    (pipeline/png.py — zlib inflate + full scanline unfiltering), or
    any format via PIL when it's installed; a non-PNG blob without PIL
    raises NotImplementedError per-batch. Fake mode produces
    deterministic bytes with the real decode's shape so downstream
    plumbing is testable without fixtures. In real mode width/height
    come from the DECODED image (IHDR), not the metadata columns."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("pixels", BinaryType(), False),
    ])

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        from xapian_spark.pipeline.jpeg import is_jpeg
        from xapian_spark.pipeline.png import decode_png_rgb, is_png

        pil = _try_import_pil()
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [],
                    "pixels": []}
            for mid, w, h, data in zip(pdf["media_id"], pdf["width"],
                                       pdf["height"], pdf["data"]):
                if fake:
                    w = int(w or 8)
                    h = int(h or 8)
                    if w * h > max_pixels:
                        continue  # size guard: skip over-budget blobs
                    px = _fake_pixels(bytes(data or b""), w, h)
                elif is_png(bytes(data or b"")):
                    from xapian_spark.pipeline.png import read_ihdr

                    # size guard from the IHDR alone — over-budget
                    # blobs are skipped BEFORE any inflate/unfilter
                    w, h, _ch = read_ihdr(bytes(data))
                    if w * h > max_pixels:
                        continue
                    w, h, px = decode_png_rgb(bytes(data))
                elif bytes(data or b"")[:6] in (b"GIF87a", b"GIF89a"):
                    from xapian_spark.pipeline.gif import (
                        decode_gif_rgb, read_screen)

                    # size guard from the 10-byte screen descriptor —
                    # before any LZW work
                    w, h = read_screen(bytes(data))
                    if w * h > max_pixels:
                        continue
                    w, h, px = decode_gif_rgb(bytes(data))
                elif is_jpeg(bytes(data or b"")) and pil is None:
                    # pure-Python path (no PIL available): baseline
                    # SOF0 and progressive SOF2. Variants the vendored
                    # codec rejects (arithmetic, 12-bit, CMYK, …)
                    # raise honestly here; with PIL installed they
                    # fall through to the PIL branch below, which
                    # handles them (and decodes orders of magnitude
                    # faster).
                    from xapian_spark.pipeline.jpeg import (
                        decode_jpeg_rgb, read_sof)

                    # size guard from the SOF header alone — before
                    # any entropy decode / IDCT
                    w, h, _ch = read_sof(bytes(data))
                    if w * h > max_pixels:
                        continue
                    w, h, px = decode_jpeg_rgb(bytes(data))
                elif pil is not None:  # pragma: no cover - no PIL here
                    import io

                    img = pil.open(io.BytesIO(bytes(data)))
                    w, h = img.size
                    if w * h > max_pixels:
                        continue
                    px = img.convert("RGB").tobytes()
                else:
                    raise NotImplementedError(
                        "image decode for formats beyond PNG "
                        "(pipeline/png.py), GIF (pipeline/gif.py) "
                        "and baseline JPEG (pipeline/jpeg.py) needs "
                        "PIL; or run with fake=True for the "
                        "deterministic stub")
                rows["media_id"].append(int(mid))
                rows["width"].append(int(w))
                rows["height"].append(int(h))
                rows["pixels"].append(px)
            yield pd.DataFrame(rows)

    return images.select("media_id", "width", "height", "data") \
        .mapInPandas(gen, schema)


def _dct_basis(n):
    """Orthonormal DCT-II basis: D[k] = a_k cos(pi (2x+1) k / 2n).
    Shared by compute_phash and image_dct_features — the descriptor
    is documented as exactly the signal pHash thresholds into bits,
    so there must be ONE definition."""
    import numpy as np

    x = np.arange(n)
    basis = np.cos(np.pi * (2 * x[None, :] + 1) * x[:, None] / (2 * n))
    basis[0] *= np.sqrt(1.0 / n)
    basis[1:] *= np.sqrt(2.0 / n)
    return basis


def _resize_mean(g, n: int):
    """Area-mean resize to n×n with floor-division block boundaries
    (degenerate blocks when a side < n read the single boundary
    row/col). Vectorized: np.add.reduceat over the boundary arrays —
    a duplicate boundary yields exactly the single-element slice the
    per-block mean wants — instead of n² interpreted slice reductions
    per image (the decode→embed hot path)."""
    import numpy as np

    h, w = g.shape
    ys = (np.arange(n + 1) * h) // n
    xs = (np.arange(n + 1) * w) // n
    rc = np.maximum(np.diff(ys), 1).astype(np.float64)
    cc = np.maximum(np.diff(xs), 1).astype(np.float64)
    sums = np.add.reduceat(
        np.add.reduceat(g, ys[:-1], axis=0), xs[:-1], axis=1)
    return sums / (rc[:, None] * cc[None, :])


def _luma(arr, w: int, h: int):
    """Decoded pixel bytes → float64 grayscale (BT.601 luma for RGB
    payloads, identity for single-channel)."""
    if len(arr) == w * h * 3:
        rgb = arr.reshape(h, w, 3).astype("float64")
        return (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
                + 0.114 * rgb[:, :, 2])
    return arr[:w * h].reshape(h, w).astype("float64")


def compute_phash(decoded: DataFrame, hash_size: int = 8,
                  dct_size: int = 32) -> DataFrame:
    """Perceptual hash (classic DCT pHash) over DECODED pixels
    (the output of decode_images — the two mapInPandas stages chain
    narrowly, pixels never shuffle): luma → area-mean resize to
    dct_size² → 2-D DCT-II → the hash_size² lowest-frequency
    coefficients → bit i = AC coef_i > median of the AC coefficients
    (the DC coefficient is excluded from the median AND carries no
    bit — it exceeds the AC median for any non-degenerate image, so
    hashing it would waste a constant bit and skew block 0's key
    distribution; bit 0 is always 0). Returns (media_id,
    phash_hi BIGINT, phash_lo BIGINT) — NON-NEGATIVE 32-bit halves,
    the simhash convention: signed int32 halves would sign-extend
    under bit_count (bit_count(-1::INT) = 64) and flip block-key
    signs under shiftright/%, silently dropping true near-dups.
    Deterministic float64 numpy throughout; robust to re-encoding
    (a JPEG of the same image hashes within a few bits — the
    cross-format near-dup signal exact byte hashes cannot see)."""
    if hash_size * hash_size != 64:
        raise ValueError("phash is a 64-bit sketch: hash_size must be 8")
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("phash_hi", LongType(), False),
        StructField("phash_lo", LongType(), False),
    ])

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        basis = _dct_basis(dct_size)
        for pdf in batches:
            ids, his, los = [], [], []
            for mid, w, h, px in zip(pdf["media_id"], pdf["width"],
                                     pdf["height"], pdf["pixels"]):
                w, h = int(w), int(h)
                arr = np.frombuffer(bytes(px), dtype=np.uint8)
                g = _luma(arr, w, h)
                d = basis @ _resize_mean(g, dct_size) @ basis.T
                low = d[:hash_size, :hash_size].flatten()
                med = np.median(low[1:])  # AC coefficients only
                bits = 0
                for i, v in enumerate(low):
                    if i and v > med:
                        bits |= 1 << i
                ids.append(int(mid))
                his.append(int(bits >> 32))
                los.append(int(bits & 0xFFFFFFFF))
            yield pd.DataFrame({"media_id": ids, "phash_hi": his,
                                "phash_lo": los})

    return decoded.select("media_id", "width", "height", "pixels") \
        .mapInPandas(gen, schema)


def image_dct_features(decoded: DataFrame, dim: int = 16,
                       dct_size: int = 32) -> DataFrame:
    """REAL image embeddings (no model, no stub): the √dim×√dim
    lowest-frequency block of the 2-D DCT over the area-mean-resized
    luma, L2-normalized — the classic pre-learned-era image descriptor
    (and exactly the signal pHash thresholds into bits). Deterministic
    float64 numpy; (media_id, feature ARRAY<FLOAT>[dim]). Chains
    narrowly after decode_images like compute_phash, and feeds every
    embedding op downstream (cosine_topk, semdedup, lsh, pq) with
    vec_col='feature', id_col='media_id' — a fully real
    decode→embed→dedup image pipeline."""
    side = int(dim ** 0.5)
    if side * side != dim:
        raise ValueError(f"dim must be a perfect square, got {dim}")
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ])

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        basis = _dct_basis(dct_size)
        for pdf in batches:
            ids, feats = [], []
            for mid, w, h, px in zip(pdf["media_id"], pdf["width"],
                                     pdf["height"], pdf["pixels"]):
                w, h = int(w), int(h)
                arr = np.frombuffer(bytes(px), dtype=np.uint8)
                g = _luma(arr, w, h)
                d = basis @ _resize_mean(g, dct_size) @ basis.T
                v = d[:side, :side].flatten()
                v[0] = 0.0  # drop DC: brightness must not dominate
                norm = np.linalg.norm(v)
                if norm > 0:
                    v = v / norm
                ids.append(int(mid))
                feats.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return decoded.select("media_id", "width", "height", "pixels") \
        .mapInPandas(gen, schema)


def image_neardup_pairs(phashes: DataFrame,
                        max_hamming: int = 7) -> DataFrame:
    """Near-duplicate image pairs by pHash hamming distance ≤
    max_hamming: candidates from an 8×8-bit pigeonhole block join
    (hamming ≤ 7 over 8 blocks ⇒ at least one block identical — a
    key-equality join, never a cross product), verified with the
    exact bit_count distance. (media_id_a < media_id_b, hamming)."""
    if not 0 <= max_hamming <= 7:
        raise ValueError(
            "pigeonhole over 8 blocks needs max_hamming in [0, 7]; "
            "use more/smaller blocks for a looser threshold")
    blocks = phashes.select(
        "media_id", "phash_hi", "phash_lo",
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("block"),
                (F.shiftright(F.col(c), off) % F.lit(1 << 8))
                .alias("key"))
            for bi, (c, off) in enumerate(
                [("phash_lo", 0), ("phash_lo", 8),
                 ("phash_lo", 16), ("phash_lo", 24),
                 ("phash_hi", 0), ("phash_hi", 8),
                 ("phash_hi", 16), ("phash_hi", 24)])
        ])).alias("b"),
    ).select("media_id", "phash_hi", "phash_lo", "b.block", "b.key")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.media_id") < F.col("b.media_id")))
        .select(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
            (F.bit_count(
                F.col("a.phash_hi").bitwiseXOR(F.col("b.phash_hi")))
             + F.bit_count(
                 F.col("a.phash_lo").bitwiseXOR(F.col("b.phash_lo")))
             ).alias("hamming"))
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def synthetic_dup_media(spark, n_pairs: int = 25,
                        quality: int = 90) -> DataFrame:
    """2·n_pairs IMAGE_SCHEMA rows for cross-format near-dup tests:
    row i < n_pairs is a textured PNG; row i + n_pairs is the SAME
    image re-encoded as a baseline JPEG (quality `quality`) — byte
    hashes can never pair them, pHash must. Textures are md5-seeded
    8×8 block patterns (distinct images differ in ~half their pHash
    bits; a lossy re-encode of the same image differs in ≤ a few)."""
    from xapian_spark.pipeline.jpeg import encode_jpeg
    from xapian_spark.pipeline.png import encode_png

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def texture(seed: int, w: int, h: int) -> "np.ndarray":
            cells = np.empty(((h + 7) // 8, (w + 7) // 8))
            for cy in range(cells.shape[0]):
                for cx in range(cells.shape[1]):
                    hsh = hashlib.md5(
                        f"tex-{seed}-{cy}-{cx}".encode()).digest()
                    cells[cy, cx] = hsh[0]
            return np.kron(cells, np.ones((8, 8)))[:h, :w]

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                base = i % n_pairs
                w = 32 + (base % 2) * 16
                h = 32 + (base % 3) * 8
                g = texture(base, w, h)
                rgb = np.stack(
                    [g, np.roll(g, 3, axis=1), 255.0 - g],
                    axis=-1).astype(np.uint8)
                if i < n_pairs:
                    blob = encode_png(w, h, rgb.tobytes(), 3)
                    mime = "image/png"
                else:
                    blob = encode_jpeg(w, h, rgb.tobytes(), 3,
                                       quality=quality)
                    mime = "image/jpeg"
                rows.append({
                    "media_id": i, "uri": f"s3://fake/dup{i}",
                    "mime": mime, "width": w, "height": h,
                    "data": blob})
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_SCHEMA.fields])

    return spark.range(2 * n_pairs).mapInPandas(gen, IMAGE_SCHEMA)


def decode_audio(audio: DataFrame) -> DataFrame:
    """REAL audio decode — RIFF/WAVE (PCM + IMA ADPCM, pipeline/
    wav.py) and FLAC (pipeline/flac.py), dispatched on magic:
    (media_id, sample_rate, channels, n_frames, samples BINARY
    int16-LE interleaved). Other/compressed codecs raise honestly,
    the image-codec contract. Narrow mapInPandas; downstream
    stats/feature stages chain without a shuffle."""
    from xapian_spark.pipeline.flac import decode_flac, is_flac
    from xapian_spark.pipeline.wav import decode_wav

    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("samples", BinaryType(), False),
    ])

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "sample_rate": [], "channels": [],
                    "n_frames": [], "samples": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data or b"")
                if is_flac(blob):
                    rate, ch, pcm = decode_flac(blob)
                else:
                    rate, ch, pcm = decode_wav(blob)
                rows["media_id"].append(int(mid))
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["n_frames"].append(len(pcm) // (2 * ch))
                rows["samples"].append(pcm)
            yield pd.DataFrame(rows)

    return audio.select("media_id", "data").mapInPandas(gen, schema)


def audio_stats(decoded: DataFrame) -> DataFrame:
    """Exact integer stats over decoded PCM — the audio-curation
    filter signals (clipping/silence/length): (media_id, sample_rate,
    channels, n_frames, duration_ms, peak, sum_sq). All integer
    (duration by floor division, sum of squares in int64), so a
    deterministic fixture replays bit-exactly in SQL."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("duration_ms", IntegerType(), False),
        StructField("peak", IntegerType(), False),
        StructField("sum_sq", LongType(), False),
    ])

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k.name: [] for k in schema.fields}
            for mid, rate, ch, nf, pcm in zip(
                    pdf["media_id"], pdf["sample_rate"],
                    pdf["channels"], pdf["n_frames"], pdf["samples"]):
                s = np.frombuffer(bytes(pcm), dtype="<i2") \
                    .astype(np.int64)
                rows["media_id"].append(int(mid))
                rows["sample_rate"].append(int(rate))
                rows["channels"].append(int(ch))
                rows["n_frames"].append(int(nf))
                rows["duration_ms"].append(
                    int(nf) * 1000 // int(rate))
                rows["peak"].append(
                    int(np.abs(s).max()) if len(s) else 0)
                rows["sum_sq"].append(int((s * s).sum()))
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(gen, schema)


def synthetic_wav_media(spark, n: int) -> DataFrame:
    """AUDIO_SCHEMA rows whose `data` blobs are REAL RIFF/PCM WAVs
    over a deterministic integer waveform — sample t of clip i is
    ((7i + 13t) mod 4001) − 2000 over n_frames·channels interleaved
    values, n_frames = 400 + (i mod 5)·40, rate 8000, channels
    1 + (i mod 2). Pure integers, so the audio_stats oracle replays
    peak / sum-of-squares EXACTLY in SQL."""
    from xapian_spark.pipeline.wav import encode_wav

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                nf = 400 + (i % 5) * 40
                ch = 1 + (i % 2)
                t = np.arange(nf * ch, dtype=np.int64)
                s = ((7 * i + 13 * t) % 4001 - 2000).astype("<i2")
                blob = encode_wav(8000, ch, s.tobytes())
                rows.append({
                    "media_id": i, "uri": f"s3://fake/a{i}.wav",
                    "mime": "audio/wav", "sample_rate": 8000,
                    "duration_ms": nf * 1000 // 8000, "data": blob,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, AUDIO_SCHEMA)


def synthetic_adpcm_media(spark, n: int) -> DataFrame:
    """AUDIO_SCHEMA rows whose `data` blobs are REAL IMA ADPCM WAVs
    (format 17, 4-bit — pipeline/wav.py) over the same deterministic
    integer waveform as synthetic_wav_media, with n_frames =
    65·(4 + i mod 4) (whole 65-sample blocks, so the decoder emits
    exactly n_frames frames), rate 8000, channels 1 + (i mod 2).
    ADPCM is lossy but fully deterministic integer arithmetic, so the
    audio_adpcm oracle replays the DECODED samples exactly in SQL via
    a recursive CTE over the public IMA step tables."""
    from xapian_spark.pipeline.wav import encode_adpcm_wav

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                nf = 65 * (4 + i % 4)
                ch = 1 + (i % 2)
                t = np.arange(nf * ch, dtype=np.int64)
                s = ((7 * i + 13 * t) % 4001 - 2000).astype("<i2")
                blob = encode_adpcm_wav(8000, ch, s.tobytes(),
                                        samples_per_block=65)
                rows.append({
                    "media_id": i, "uri": f"s3://fake/a{i}.adpcm.wav",
                    "mime": "audio/wav", "sample_rate": 8000,
                    "duration_ms": nf * 1000 // 8000, "data": blob,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, AUDIO_SCHEMA)


def synthetic_flac_media(spark, n: int) -> DataFrame:
    """AUDIO_SCHEMA rows whose `data` blobs are REAL FLAC streams
    (pipeline/flac.py — CONSTANT/FIXED subframes, rice residuals,
    left/side stereo) over the SAME deterministic integer waveform
    as synthetic_wav_media. FLAC is LOSSLESS, so audio stats replay
    with the identical closed-form SQL as the WAV fixture."""
    from xapian_spark.pipeline.flac import encode_flac

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                nf = 400 + (i % 5) * 40
                ch = 1 + (i % 2)
                t = np.arange(nf * ch, dtype=np.int64)
                s = ((7 * i + 13 * t) % 4001 - 2000).astype("<i2")
                blob = encode_flac(8000, ch, s.tobytes())
                rows.append({
                    "media_id": i, "uri": f"s3://fake/a{i}.flac",
                    "mime": "audio/flac", "sample_rate": 8000,
                    "duration_ms": nf * 1000 // 8000, "data": blob,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, AUDIO_SCHEMA)


def image_features(images: DataFrame, dim: int = 16,
                   fake: bool = True) -> DataFrame:
    """(media_id, feature ARRAY<FLOAT>[dim]) — the embed step of a
    media pipeline. Fake mode: deterministic hash-derived unit vector
    (the real model call is the stub); the Spark plumbing (Arrow
    batches, fixed-dim array column) is the real contract."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ])

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image embedding model not available in container")
            ids, feats = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                h = hashlib.md5(bytes(data or b"")).digest()
                v = np.frombuffer(
                    (h * ((dim * 4) // len(h) + 1))[: dim * 4],
                    dtype=np.uint32).astype(np.float32)
                v = v / (np.linalg.norm(v) or 1.0)
                ids.append(int(mid))
                feats.append(v.tolist())
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return images.select("media_id", "data").mapInPandas(gen, schema)


def frame_sample(videos: DataFrame, every_ms: int = 1000,
                 fake: bool = True) -> DataFrame:
    """video binary → one row per sampled frame
    (media_id, frame_idx, ts_ms, frame BINARY). Decode stubbed; the
    explode shape (1→N rows per blob) is the real contract."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ])

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode not available in container")
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [],
                    "frame": []}
            for mid, dur, data in zip(pdf["media_id"],
                                      pdf["duration_ms"], pdf["data"]):
                n = max(1, int(dur or 0) // every_ms)
                for i in range(n):
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame"].append(_fake_pixels(
                        bytes(data or b"") + struct.pack("<I", i), 4, 4))
            yield pd.DataFrame(rows)

    return videos.select("media_id", "duration_ms", "data") \
        .mapInPandas(gen, schema)


_PNG_TEST_PALETTE = bytes(
    c for j in range(256) for c in (j, (j * 7) % 256, (j * 13) % 256))


def synthetic_png_media(spark, n: int, seed: int = 7) -> DataFrame:
    """IMAGE_SCHEMA rows whose `data` blobs are REAL PNG files (written
    by the pure-Python encoder, pipeline/png.py) — the fixture that
    exercises decode_images' real path end-to-end without PIL. Every
    third row (i % 3 == 2) is a palette-indexed PNG (color type 3,
    PLTE = _PNG_TEST_PALETTE), the dominant web shape the truecolor
    rows don't cover; its decoded RGB is the palette lookup of the
    md5-keyed index stream, same w*h*3 output shape."""
    from xapian_spark.pipeline.png import encode_png, encode_png_palette

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                w = 8 + (i % 4) * 4
                h = 8 + (i % 3) * 4
                if i % 3 == 2:
                    idx = _fake_pixels(
                        hashlib.md5(f"{seed}:pngp:{i}".encode())
                        .digest(), w, h)[: w * h]
                    blob = encode_png_palette(w, h, idx,
                                              _PNG_TEST_PALETTE)
                else:
                    px = _fake_pixels(
                        hashlib.md5(f"{seed}:png:{i}".encode())
                        .digest(), w, h)
                    blob = encode_png(w, h, px, 3)
                rows.append({
                    "media_id": i, "uri": f"s3://fake/img{i}.png",
                    "mime": "image/png", "width": w, "height": h,
                    "data": blob,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, IMAGE_SCHEMA)


def synthetic_jpeg_media(spark, n: int, quality: int = 85) -> DataFrame:
    """IMAGE_SCHEMA rows whose `data` blobs are REAL baseline JPEGs
    (pure-Python encoder, pipeline/jpeg.py) over smooth deterministic
    gradients — the fixture that exercises decode_images' JPEG path
    end-to-end without PIL. Coverage by row: i%5==0 grayscale,
    i%5==1 RGB 4:4:4, i%5==2 RGB 4:2:0 (subsampled chroma),
    i%5==3 RGB 4:4:4 with restart intervals, i%5==4 PROGRESSIVE
    (SOF2) RGB 4:2:0 — the dominant large-JPEG web shape."""
    from xapian_spark.pipeline.jpeg import (encode_jpeg,
                                            encode_progressive_jpeg)

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                w = 16 + (i % 3) * 8
                h = 16 + (i % 2) * 8
                yy, xx = np.mgrid[0:h, 0:w]
                r = (xx * 255) // max(w - 1, 1)
                g = (yy * 255) // max(h - 1, 1)
                b = ((xx + yy) * 255) // max(w + h - 2, 1)
                if i % 5 == 0:
                    blob = encode_jpeg(
                        w, h, r.astype(np.uint8).tobytes(), 1,
                        quality=quality)
                elif i % 5 == 4:
                    px = np.stack([r, g, b], axis=-1) \
                        .astype(np.uint8).tobytes()
                    blob = encode_progressive_jpeg(
                        w, h, px, 3, quality=quality, subsample=True)
                else:
                    px = np.stack([r, g, b], axis=-1) \
                        .astype(np.uint8).tobytes()
                    blob = encode_jpeg(
                        w, h, px, 3, quality=quality,
                        subsample=(i % 5 == 2),
                        restart_interval=2 if i % 5 == 3 else 0)
                rows.append({
                    "media_id": i, "uri": f"s3://fake/img{i}.jpg",
                    "mime": "image/jpeg", "width": w, "height": h,
                    "data": blob,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, IMAGE_SCHEMA)


def synthetic_gif_media(spark, n: int) -> DataFrame:
    """IMAGE_SCHEMA rows whose `data` blobs are REAL single-frame
    GIFs (pure-Python LZW encoder, pipeline/gif.py) over an 8-color
    deterministic pattern — palette index at (x, y) is
    (x + 2y + i) mod 8, color j of clip i is ((31j+i) mod 256,
    (63j+2i) mod 256, (17j+5i) mod 256). GIF is LOSSLESS, so the
    media_decode_gif oracle replays the exact pixel SUM in closed
    form. Odd rows are interlaced (4-pass row reorder)."""
    from xapian_spark.pipeline.gif import encode_gif

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                w = 12 + (i % 3) * 8
                h = 10 + (i % 2) * 6
                yy, xx = np.mgrid[0:h, 0:w]
                j = (xx + 2 * yy + i) % 8
                pal = np.stack([(31 * np.arange(8) + i) % 256,
                                (63 * np.arange(8) + 2 * i) % 256,
                                (17 * np.arange(8) + 5 * i) % 256],
                               axis=-1).astype(np.uint8)
                rgb = pal[j].tobytes()
                blob = encode_gif(w, h, rgb, interlace=bool(i % 2))
                rows.append({
                    "media_id": i, "uri": f"s3://fake/img{i}.gif",
                    "mime": "image/gif", "width": w, "height": h,
                    "data": blob,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, IMAGE_SCHEMA)


def image_pixel_stats(decoded: DataFrame) -> DataFrame:
    """Exact integer stats over decoded RGB — (media_id, width,
    height, pixel_bytes, pixel_sum). pixel_sum is the int64 sum of
    every byte, so a lossless codec's fixture replays it exactly in
    SQL (the audio_stats pattern for images). Narrow mapInPandas —
    chains onto decode_images without a shuffle."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("pixel_bytes", IntegerType(), False),
        StructField("pixel_sum", LongType(), False),
    ])

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k.name: [] for k in schema.fields}
            for mid, w, h, px in zip(pdf["media_id"], pdf["width"],
                                     pdf["height"], pdf["pixels"]):
                b = np.frombuffer(bytes(px), dtype=np.uint8)
                rows["media_id"].append(int(mid))
                rows["width"].append(int(w))
                rows["height"].append(int(h))
                rows["pixel_bytes"].append(len(b))
                rows["pixel_sum"].append(int(b.astype(np.int64).sum()))
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(gen, schema)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — must prune the blob column from the
    scan (verify via .explain: ReadSchema excludes `data`)."""
    return media.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
    )


def synthetic_media(spark, n: int, kind: str = "image",
                    seed: int = 7) -> DataFrame:
    """Deterministic synthetic media table for tests/benchmarks."""
    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                h = hashlib.md5(f"{seed}:{kind}:{i}".encode()).digest()
                blob = h * (8 + i % 5)
                if kind == "image":
                    rows.append({
                        "media_id": i, "uri": f"s3://fake/img{i}.jpg",
                        "mime": "image/jpeg",
                        "width": 8 + (i % 4) * 4,
                        "height": 8 + (i % 3) * 4,
                        "data": blob,
                    })
                else:
                    rows.append({
                        "media_id": i, "uri": f"s3://fake/a{i}.wav",
                        "mime": "audio/wav",
                        "sample_rate": 16000,
                        "duration_ms": 500 + (i % 7) * 500,
                        "data": blob,
                    })
            cols = ([f.name for f in IMAGE_SCHEMA.fields]
                    if kind == "image"
                    else [f.name for f in AUDIO_SCHEMA.fields])
            yield pd.DataFrame(rows, columns=cols)

    schema = IMAGE_SCHEMA if kind == "image" else AUDIO_SCHEMA
    if kind == "audio":
        schema = StructType([
            f if f.name != "duration_ms" else
            StructField("duration_ms", IntegerType(), True)
            for f in AUDIO_SCHEMA.fields])
    return spark.range(n).mapInPandas(gen, schema)

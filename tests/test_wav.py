"""RIFF/PCM WAV codec + real audio decode/stats pipeline."""

import struct

import numpy as np
import pytest

from xapian_spark.pipeline.wav import decode_wav, encode_wav, is_wav


def test_roundtrip_mono_and_stereo():
    for ch in (1, 2):
        s = np.arange(-300, 300, dtype="<i2")[:600 - (600 % ch)]
        blob = encode_wav(44100, ch, s.tobytes())
        assert is_wav(blob)
        rate, got_ch, pcm = decode_wav(blob)
        assert (rate, got_ch) == (44100, ch)
        assert pcm == s.tobytes()


def test_odd_data_chunk_padding():
    # a 1-frame mono clip: 2 data bytes (even), but force odd via an
    # extra chunk ordering check — encode pads odd chunks per spec
    s = np.array([1234], dtype="<i2")
    blob = encode_wav(8000, 1, s.tobytes())
    rate, ch, pcm = decode_wav(blob)
    assert np.frombuffer(pcm, dtype="<i2")[0] == 1234


def test_unsupported_formats_raise():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"\x89PNG" + b"\x00" * 40)
    # patch audio_format to 3 (IEEE float)
    s = np.zeros(4, dtype="<i2")
    blob = bytearray(encode_wav(8000, 1, s.tobytes()))
    i = blob.find(b"fmt ")
    blob[i + 8:i + 10] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="PCM 16-bit"):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError):
        encode_wav(8000, 1, b"\x00\x01\x02")  # not whole frames


def test_decode_audio_stats_match_numpy(spark):
    from xapian_spark.pipeline.multimodal import (
        audio_stats, decode_audio, synthetic_wav_media)

    stats = {r["media_id"]: r for r in
             audio_stats(decode_audio(
                 synthetic_wav_media(spark, 8))).collect()}
    for i in range(8):
        nf = 400 + (i % 5) * 40
        ch = 1 + (i % 2)
        t = np.arange(nf * ch, dtype=np.int64)
        s = (7 * i + 13 * t) % 4001 - 2000
        r = stats[i]
        assert (r["sample_rate"], r["channels"], r["n_frames"]) == \
            (8000, ch, nf)
        assert r["duration_ms"] == nf * 1000 // 8000
        assert r["peak"] == int(np.abs(s).max())
        assert r["sum_sq"] == int((s * s).sum())

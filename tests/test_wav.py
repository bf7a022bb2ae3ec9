"""RIFF WAV codec (PCM + IMA ADPCM) + real audio decode/stats
pipeline."""

import struct

import numpy as np
import pytest

from xapian_spark.pipeline.wav import (
    _ima_encode_nibble, decode_wav, encode_adpcm_wav, encode_wav,
    is_wav)


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


def _adpcm_simulate(i, nf, ch_n, spb=65):
    """Fused encode→decode state machine per channel — the same
    closed form the SQL oracle replays (encoder applies the decode
    update, so states never drift and the decoded sample is just the
    evolving predictor)."""
    out = {c: [] for c in range(ch_n)}
    for c in range(ch_n):
        pred, idx = 0, 0
        for t in range(nf):
            v = (7 * i + 13 * (t * ch_n + c)) % 4001 - 2000
            if t % spb == 0:
                pred = v
            else:
                _nib, pred, idx = _ima_encode_nibble(v, pred, idx)
            out[c].append(pred)
    return out


def test_adpcm_decode_matches_state_machine():
    for i in range(6):
        nf = 65 * (4 + i % 4)
        ch = 1 + (i % 2)
        t = np.arange(nf * ch, dtype=np.int64)
        s = ((7 * i + 13 * t) % 4001 - 2000).astype("<i2")
        blob = encode_adpcm_wav(8000, ch, s.tobytes(),
                                samples_per_block=65)
        rate, got_ch, pcm = decode_wav(blob)
        assert (rate, got_ch) == (8000, ch)
        dec = np.frombuffer(pcm, dtype="<i2").reshape(-1, ch)
        assert dec.shape[0] == nf
        sim = _adpcm_simulate(i, nf, ch)
        for c in range(ch):
            assert list(dec[:, c]) == sim[c]


def test_adpcm_block_padding_and_validation():
    # non-whole-block input: last block pads by repeating the final
    # frame, so the decoder emits whole blocks of frames
    s = np.arange(100, dtype="<i2")
    blob = encode_adpcm_wav(8000, 1, s.tobytes(), samples_per_block=65)
    _r, _c, pcm = decode_wav(blob)
    assert len(pcm) // 2 == 130  # 2 blocks of 65
    with pytest.raises(ValueError, match="samples_per_block"):
        encode_adpcm_wav(8000, 1, s.tobytes(), samples_per_block=64)
    # corrupt step index in the block header must raise
    bad = bytearray(blob)
    i = bad.find(b"data") + 8
    bad[i + 2] = 200  # index > 88
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))


def test_truncated_chunk_raises():
    s = np.zeros(8, dtype="<i2")
    blob = encode_wav(8000, 1, s.tobytes())
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(blob[:-4])


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

"""Minimal RIFF/WAVE PCM codec — stdlib struct only.

Public format (RIFF container + `fmt ` chunk with audio_format=1 +
`data` chunk of interleaved little-endian 16-bit samples); written
from the spec like pipeline/png.py and pipeline/jpeg.py, so audio
decode in this container is REAL (no audio library needed), and the
honest NotImplementedError stubs shrink to compressed codecs only.
"""

from __future__ import annotations

import struct
from typing import Tuple


def is_wav(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"WAVE")


def encode_wav(sample_rate: int, channels: int,
               samples: bytes) -> bytes:
    """(rate, channels, interleaved int16-LE frames) → WAV bytes."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if len(samples) % (2 * channels):
        raise ValueError("samples must be whole int16 frames")
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples)) + samples
            + (b"\x00" if len(samples) % 2 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(data: bytes) -> Tuple[int, int, bytes]:
    """WAV bytes → (sample_rate, channels, interleaved int16-LE
    frames). PCM 16-bit only; anything else raises (float/ADPCM/etc.
    need a real audio stack — the same honest-raise contract as the
    image codecs)."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("WAV: truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_format, channels, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"WAV: only PCM 16-bit supported (format {audio_format},"
            f" {bits}-bit)")
    if len(pcm) % (2 * channels):
        raise ValueError("WAV: data chunk is not whole frames")
    return rate, channels, pcm

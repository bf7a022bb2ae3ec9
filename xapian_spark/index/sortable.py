"""Order-preserving double serialization (value-slot encoding).

Byte-exact port of the reference's sortable_serialise /
sortable_unserialise (xapian-core/api/sortable-serialise.cc:44-252):
a <= b  ⟺  sortable_serialise(a) <= sortable_serialise(b) bytewise,
with short encodings for small integers (bias-8 exponent) and trailing
zero-byte truncation. Spark's native DOUBLE ordering replaces this for
columnar sorting (SURVEY §1), but the byte form is what the reference's
NumberValueRangeProcessor emits into boolean range terms, so the
QueryParser needs it for golden parity — and it lets values round-trip
with an on-disk Xapian database.
"""

from __future__ import annotations

import math

DBL_MAX = 1.7976931348623157e308


def sortable_serialise(value: float) -> bytes:
    if value < -DBL_MAX:
        return b""
    mantissa, exponent = math.frexp(value)
    if mantissa == 0.0 or exponent < -2039:
        return b"\x80"
    negative = mantissa < 0
    if negative:
        mantissa = -mantissa
    if value > DBL_MAX or exponent > 2055:
        return b"" if negative else b"\xff" * 9

    nxt = 0x00 if negative else 0xE0
    exponent -= 8
    exponent_negative = exponent < 0
    if exponent_negative:
        exponent = -exponent
        nxt ^= 0x60

    out = bytearray()
    if exponent < 8:
        nxt ^= 0x20
        nxt |= exponent << 2
        if negative ^ exponent_negative:
            nxt ^= 0x1C
    else:
        nxt |= exponent >> 6
        if negative ^ exponent_negative:
            nxt ^= 0x1F
        out.append(nxt & 0xFF)
        nxt = (exponent << 2) & 0xFF
        if negative ^ exponent_negative:
            nxt ^= 0xFC

    mantissa *= 1 << (26 if negative else 27)
    word1 = int(mantissa)
    mantissa -= word1
    word2 = int(mantissa * 4294967296.0)
    if negative:
        word1 = (-word1) & 0xFFFFFFFF
        if word2 != 0:
            word1 = (word1 + 1) & 0xFFFFFFFF
        word2 = (-word2) & 0xFFFFFFFF

    word1 &= 0x03FFFFFF
    nxt |= word1 >> 24
    out.append(nxt & 0xFF)
    out.append((word1 >> 16) & 0xFF)
    out.append((word1 >> 8) & 0xFF)
    out.append(word1 & 0xFF)
    out.append((word2 >> 24) & 0xFF)
    out.append((word2 >> 16) & 0xFF)
    out.append((word2 >> 8) & 0xFF)
    out.append(word2 & 0xFF)

    while out and out[-1] == 0:
        out.pop()
    return bytes(out)


def _numfromstr(value: bytes, pos: int) -> int:
    return value[pos] if pos < len(value) else 0


def sortable_unserialise(value: bytes) -> float:
    if value == b"\x80":
        return 0.0
    if value == b"\xff" * 9:
        return math.inf
    if value == b"":
        return -math.inf

    first = _numfromstr(value, 0)
    i = 0
    first ^= (first & 0xC0) >> 1
    negative = not (first & 0x80)
    exponent_negative = bool(first & 0x40)
    explen = not (first & 0x20)
    exponent = first & 0x1F
    if not explen:
        exponent >>= 2
        if negative ^ exponent_negative:
            exponent ^= 0x07
    else:
        i += 1
        first = _numfromstr(value, i)
        exponent <<= 6
        exponent |= first >> 2
        if negative ^ exponent_negative:
            exponent ^= 0x07FF

    word1 = (first & 0x03) << 24
    i += 1
    word1 |= _numfromstr(value, i) << 16
    i += 1
    word1 |= _numfromstr(value, i) << 8
    i += 1
    word1 |= _numfromstr(value, i)

    word2 = 0
    if i < len(value):
        i += 1
        word2 = _numfromstr(value, i) << 24
        i += 1
        word2 |= _numfromstr(value, i) << 16
        i += 1
        word2 |= _numfromstr(value, i) << 8
        i += 1
        word2 |= _numfromstr(value, i)

    if negative:
        word1 = (-word1) & 0xFFFFFFFF
        if word2 != 0:
            word1 = (word1 + 1) & 0xFFFFFFFF
        word2 = (-word2) & 0xFFFFFFFF
        word1 &= 0x03FFFFFF
    else:
        word1 |= 1 << 26

    mantissa = 0.0
    if word2:
        mantissa = word2 / 4294967296.0
    mantissa += word1
    mantissa /= 1 << (26 if negative else 27)
    if exponent_negative:
        exponent = -exponent
    exponent += 8
    if negative:
        mantissa = -mantissa
    return math.ldexp(mantissa, exponent)

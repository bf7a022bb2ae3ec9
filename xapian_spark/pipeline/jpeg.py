"""Minimal pure-Python baseline JPEG codec (stdlib + numpy).

Gives `decode_images` a REAL decode path for the second dominant web
image format in environments without PIL/libjpeg: full marker parse
(SOI/APPn/COM/DQT/DHT/SOF0/DRI/SOS/RSTn/EOI), canonical Huffman
entropy decoding with byte-unstuffing and restart intervals,
dequantization, inverse zigzag, floating-point 2-D IDCT (numpy,
separable), chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0, and JFIF
YCbCr→RGB. Covers baseline sequential (SOF0, 8-bit) AND progressive
(SOF2: multi-scan spectral selection + successive approximation per
T.81 Annex G — the dominant large-JPEG web shape); arithmetic
coding, 12-bit, and >2x sampling factors raise ValueError — a real
corpus pipeline routes those to a full decoder.

The encoders (encode_jpeg baseline, encode_progressive_jpeg) write
the same subset (grayscale or YCbCr at 4:4:4 or 4:2:0, Annex-K-style
quantization tables, optional restart intervals) and exist so tests
can build genuine JPEG fixtures and round-trip them without any
imaging library. The decoder always reads quantization and Huffman
tables FROM THE FILE (DQT/DHT), never from built-in constants, so
decode correctness is independent of the encoder's table choice.

JPEG is lossy: round-trips assert closeness (mean absolute error),
plus exact golden cases where quantization is analytically lossless
(flat blocks whose DCT has a single DC coefficient of zero).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# 8x8 DCT-II basis matrix: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _C[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _build_huff(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical JPEG assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers surface via `at_restart`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG: truncated entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG: truncated entropy data")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                self.buf = 0xFF
                self.n = 8
                return
            raise ValueError(
                f"JPEG: marker 0x{nxt:02x} inside entropy data")
        self.pos += 1
        self.buf = b
        self.n = 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def read_bits(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG: truncated entropy data")
        if (self.data[self.pos] != 0xFF
                or not 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("JPEG: expected restart marker")
        self.pos += 2

    def decode_huff(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def read_sof(data: bytes):
    """Cheap header probe: (width, height, n_components) from the
    SOF0/SOF2 frame header alone — no entropy decode. Size guards
    run BEFORE the IDCT cost."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad magic)")
    data = bytes(data)
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: bad marker sync")
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker in (0xC0, 0xC2):
            if pos + 10 > len(data):
                raise ValueError("JPEG: truncated SOF header")
            prec, h, w, nc = struct.unpack(
                ">BHHB", data[pos + 4:pos + 10])
            if prec != 8:
                raise ValueError("JPEG: only 8-bit supported")
            return w, h, nc
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: unsupported SOF marker 0xff{marker:02x}"
                " (baseline SOF0 and progressive SOF2 only)")
        if marker == 0xD9:
            break
        pos += 2 + seglen
    raise ValueError("JPEG: no SOF frame header")


def decode_jpeg(data: bytes) -> Tuple[int, int, int, bytes]:
    """JPEG bytes → (width, height, channels, raw bytes w*h*channels).
    channels = 1 (grayscale) or 3 (RGB after YCbCr conversion).
    Handles baseline sequential (SOF0, single interleaved scan) and
    progressive (SOF2: multi-scan spectral selection + successive
    approximation, T.81 Annex G) streams."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad magic)")
    data = bytes(data)
    qtables: Dict[int, np.ndarray] = {}
    htables: Dict[Tuple[int, int], Dict] = {}  # (class, id) -> table
    frame = None
    coefs = None  # progressive: per-comp raw int coefficient planes
    restart_interval = 0
    pos = 2
    while True:
        if pos + 2 > len(data):
            raise ValueError("JPEG: truncated stream")
        if data[pos] != 0xFF:
            raise ValueError("JPEG: bad marker sync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if coefs is not None:
                return _finish_progressive(frame, coefs, qtables)
            raise ValueError("JPEG: EOI before scan")
        if 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("JPEG: truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("JPEG: truncated segment")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables"
                                     " unsupported")
                qtables[tq] = np.frombuffer(
                    seg[p + 1:p + 65], dtype=np.uint8
                ).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                htables[(tc, th)] = _build_huff(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progr.
            if len(seg) < 6:
                raise ValueError("JPEG: truncated SOF header")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("JPEG: only 8-bit supported")
            if nc not in (1, 3):
                raise ValueError(f"JPEG: {nc}-component images"
                                 " unsupported")
            if len(seg) < 6 + 3 * nc:
                raise ValueError("JPEG: truncated SOF header")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                ch, cv = hv >> 4, hv & 15
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise ValueError("JPEG: sampling factors > 2"
                                     " unsupported")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: unsupported SOF marker 0xff{marker:02x}"
                " (baseline SOF0 and progressive SOF2 only)")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("JPEG: truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            if frame.get("progressive"):
                if len(seg) < 4 + 2 * ns:
                    raise ValueError("JPEG: truncated SOS header")
                scan = []
                for i in range(ns):
                    cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                    comp = next((c for c in frame["comps"]
                                 if c["id"] == cs), None)
                    if comp is None:
                        raise ValueError("JPEG: SOS names unknown"
                                         " component")
                    scan.append((comp, tdta >> 4, tdta & 15))
                ss = seg[1 + 2 * ns]
                se = seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if coefs is None:
                    coefs = _alloc_coefs(frame)
                pos = _decode_progressive_scan(
                    data, pos + seglen, frame, scan, htables, coefs,
                    ss, se, ahal >> 4, ahal & 15, restart_interval)
                continue
            if ns != len(frame["comps"]):
                # non-interleaved (multi-scan) baseline is spec-legal
                # but not implemented — decoding a partial scan with
                # interleaved MCU geometry would silently emit corrupt
                # pixels, so refuse like every other unsupported shape
                raise ValueError(
                    f"JPEG: non-interleaved scan ({ns} of "
                    f"{len(frame['comps'])} components) not supported")
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 15))
            return _decode_scan(data, pos + seglen, frame, scan,
                                qtables, htables, restart_interval)
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("JPEG: no scan found")


def _decode_scan(data, pos, frame, scan, qtables, htables,
                 restart_interval):
    w, h = frame["w"], frame["h"]
    comps = [c for c, _t, _a in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # per-component coefficient planes (in MCU-padded block grid)
    planes = []
    for c, _td, _ta in scan:
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        planes.append(np.zeros((bh, bw, 64), dtype=np.float64))

    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_index
                    and mcu_index % restart_interval == 0):
                reader.restart()
                preds = [0] * len(scan)
            for ci, (c, td, ta) in enumerate(scan):
                dc_t = htables.get((0, td))
                ac_t = htables.get((1, ta))
                if dc_t is None or ac_t is None:
                    raise ValueError("JPEG: missing Huffman table")
                qt = qtables.get(c["tq"])
                if qt is None:
                    raise ValueError("JPEG: missing quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        t = reader.decode_huff(dc_t)
                        diff = _extend(reader.read_bits(t), t)
                        preds[ci] += diff
                        coef[0] = preds[ci] * int(qt[0])
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index"
                                                 " overflow")
                            v = _extend(reader.read_bits(s), s)
                            coef[_ZIGZAG[k]] = v * int(qt[k])
                            k += 1
                        planes[ci][my * c["v"] + by,
                                   mx * c["h"] + bx] = coef
            mcu_index += 1

    return _assemble(planes, comps, hmax, vmax, w, h)


def _assemble(planes, comps, hmax, vmax, w, h):
    """Dequantized coefficient planes → (w, h, channels, raw bytes):
    batched IDCT per component, upsample to the max sampling grid,
    crop, and (for 3 components) JFIF YCbCr→RGB."""
    out_planes = []
    for ci, c in enumerate(comps):
        bh, bw, _ = planes[ci].shape
        blocks = planes[ci].reshape(bh * bw, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C) + 128.0
        spatial = np.clip(np.rint(spatial), 0, 255)
        plane = (spatial.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        return w, h, 1, out_planes[0].astype(np.uint8).tobytes()
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 Annex G: spectral selection +
# successive approximation. Raw integer coefficients accumulate
# across scans; dequantization and IDCT run once at EOI.
# ---------------------------------------------------------------------------

def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcus_x, mcus_y


def _alloc_coefs(frame):
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    return {c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                              dtype=np.int32)
            for c in frame["comps"]}


def _next_marker(data, p):
    """Position of the next non-RST marker at/after p (skips stray
    fill bytes and restart markers)."""
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("JPEG: truncated stream after scan")


def _refine_nonzero(reader, block, z, p1, m1):
    """One AC successive-approximation correction bit for a
    coefficient that is already nonzero at the previous precision."""
    if reader.read_bit() and (int(block[z]) & p1) == 0:
        block[z] += p1 if block[z] >= 0 else m1


def _ac_first_block(reader, block, ac_t, ss, se, al, eobrun):
    """First (Ah=0) AC scan for one block; returns updated EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG: AC index overflow")
        block[_ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, block, ac_t, ss, se, al, eobrun):
    """Refinement (Ah>0) AC scan for one block; returns EOBRUN."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                newval = 0  # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "JPEG: invalid magnitude in AC refinement")
                newval = p1 if reader.read_bit() else m1
            # advance over r zero-history positions, emitting
            # correction bits for nonzero-history coefficients passed
            while k <= se:
                z = _ZIGZAG[k]
                if block[z] != 0:
                    _refine_nonzero(reader, block, z, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                block[_ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        # block inside an EOB run: only correction bits remain
        while k <= se:
            z = _ZIGZAG[k]
            if block[z] != 0:
                _refine_nonzero(reader, block, z, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(data, pos, frame, scan, htables, coefs,
                             ss, se, ah, al, restart_interval):
    """Decode one progressive scan into the raw coefficient planes;
    returns the stream position of the next marker."""
    if not (0 <= ss <= se <= 63) or al > 13:
        raise ValueError("JPEG: bad progression parameters")
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    reader = _BitReader(data, pos)

    if ss == 0:  # DC scan (interleaved over MCUs when ns > 1)
        if se != 0:
            raise ValueError(
                "JPEG: DC and AC in one progressive scan")
        preds = [0] * len(scan)
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if (restart_interval and unit
                        and unit % restart_interval == 0):
                    reader.restart()
                    preds = [0] * len(scan)
                for ci, (c, td, _ta) in enumerate(scan):
                    plane = coefs[c["id"]]
                    # single-component DC scans still walk their own
                    # full block grid inside each MCU
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block = plane[my * c["v"] + by,
                                          mx * c["h"] + bx]
                            if ah == 0:
                                dc_t = htables.get((0, td))
                                if dc_t is None:
                                    raise ValueError(
                                        "JPEG: missing Huffman table")
                                t = reader.decode_huff(dc_t)
                                preds[ci] += _extend(
                                    reader.read_bits(t), t)
                                block[0] = preds[ci] << al
                            elif reader.read_bit():
                                block[0] |= np.int32(1 << al)
                unit += 1
        return _next_marker(data, reader.pos)

    # AC scan: spec G.1.1.1.1 — always non-interleaved
    if len(scan) != 1:
        raise ValueError("JPEG: AC progressive scan must be"
                         " non-interleaved")
    c, _td, ta = scan[0]
    ac_t = htables.get((1, ta))
    if ac_t is None:
        raise ValueError("JPEG: missing Huffman table")
    comp_w = -(-frame["w"] * c["h"] // hmax)
    comp_h = -(-frame["h"] * c["v"] // vmax)
    nbx = (comp_w + 7) // 8
    nby = (comp_h + 7) // 8
    plane = coefs[c["id"]]
    eobrun = 0
    unit = 0
    for by in range(nby):
        for bx in range(nbx):
            if (restart_interval and unit
                    and unit % restart_interval == 0):
                reader.restart()
                eobrun = 0
            block = plane[by, bx]
            if ah == 0:
                eobrun = _ac_first_block(
                    reader, block, ac_t, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(
                    reader, block, ac_t, ss, se, al, eobrun)
            unit += 1
    return _next_marker(data, reader.pos)


def _finish_progressive(frame, coefs, qtables):
    hmax, vmax, _mx, _my = _frame_geometry(frame)
    planes = []
    for c in frame["comps"]:
        qt = qtables.get(c["tq"])
        if qt is None:
            raise ValueError("JPEG: missing quant table")
        qt_nat = np.empty(64, dtype=np.float64)
        qt_nat[_ZIGZAG] = qt.astype(np.float64)
        planes.append(coefs[c["id"]].astype(np.float64)
                      * qt_nat[None, None, :])
    return _assemble(planes, frame["comps"], hmax, vmax,
                     frame["w"], frame["h"])


def decode_jpeg_rgb(data: bytes) -> Tuple[int, int, bytes]:
    """JPEG bytes → (width, height, RGB bytes w*h*3): grayscale
    replicates into RGB — the convert('RGB') contract decode_images
    promises."""
    w, h, ch, raw = decode_jpeg(data)
    if ch == 3:
        return w, h, raw
    g = np.frombuffer(raw, dtype=np.uint8)
    return w, h, np.repeat(g, 3).tobytes()


# ---------------------------------------------------------------------------
# Encoder (fixture builder)
# ---------------------------------------------------------------------------

# Annex-K-style quantization tables (quality 50 base)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int32)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _enc_table(bits, vals) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code_length, code)."""
    dec = _build_huff(bits, vals)
    return {v: (length, code) for (length, code), v in dec.items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (spec F.1.2.3)."""
        while self.n:
            self.write(1, 1)


def _mag_bits(v: int) -> Tuple[int, int]:
    """value -> (category t, t magnitude bits)."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = np.clip((base * scale + 50) // 100, 1, 255)
    return qt.astype(np.int32)


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """plane (multiple-of-8 dims) -> per-block zigzag-quantized int
    coefficients [n_blocks_y, n_blocks_x, 64]."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(bh * bw, 8, 8).astype(np.float64) - 128.0)
    coefs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    qt2 = qt.reshape(8, 8).astype(np.float64)
    # round-half-away-from-zero: deterministic and sign-symmetric
    q = coefs / qt2
    q = np.sign(q) * np.floor(np.abs(q) + 0.5)
    zz = q.reshape(bh * bw, 64)[:, _ZIGZAG].astype(np.int64)
    return zz.reshape(bh, bw, 64)


def _pad_edge(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mult_y - h % mult_y) % mult_y
    pw = (mult_x - w % mult_x) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _prepare_blocks(width, height, pixels, channels, quality,
                    subsample):
    """Shared encoder front half: color convert, subsample, pad to
    the MCU grid, FDCT+quantize. Returns (qts, comps, samp, zz,
    mcus_x, mcus_y) with comps = [(plane, tq, th), ...]."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(
        np.float64).reshape(height, width, channels)

    qts = [_scaled_qt(_QT_LUMA, quality)]
    if channels == 3:
        qts.append(_scaled_qt(_QT_CHROMA, quality))
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:  # 4:2:0 — average 2x2 chroma
            p = [_pad_edge(c, 2, 2) for c in (cb, cr)]
            cb = (p[0][0::2, 0::2] + p[0][0::2, 1::2]
                  + p[0][1::2, 0::2] + p[0][1::2, 1::2]) / 4.0
            cr = (p[1][0::2, 0::2] + p[1][0::2, 1::2]
                  + p[1][1::2, 0::2] + p[1][1::2, 1::2]) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        comps = [(y, 0, 0), (cb, 1, 1), (cr, 1, 1)]  # (plane, qt, htab)
    else:
        samp = [(1, 1)]
        comps = [(arr[..., 0], 0, 0)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # quantized blocks per component, MCU-padded
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    zz = []
    for (plane, tq, _th), (sh, sv) in zip(comps, samp):
        # pad each component plane to its own MCU-covered block grid
        need_h = mcus_y * sv * 8
        need_w = mcus_x * sh * 8
        padded = np.pad(plane, ((0, need_h - plane.shape[0]),
                                (0, need_w - plane.shape[1])),
                        mode="edge")
        zz.append(_fdct_quant(padded, qts[tq]))
    return qts, comps, samp, zz, mcus_x, mcus_y


def encode_jpeg(width: int, height: int, pixels: bytes,
                channels: int = 3, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(w, h, raw bytes) → baseline JPEG. channels 1 (grayscale) or 3
    (RGB; converted to YCbCr, 4:4:4 or 4:2:0 when `subsample`)."""
    qts, comps, samp, zz, mcus_x, mcus_y = _prepare_blocks(
        width, height, pixels, channels, quality, subsample)

    # --- headers -----------------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    for tq, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        # DQT is stored in ZIGZAG order (spec B.2.4.1); qt is natural
        out += bytes(int(qt[_ZIGZAG[k]]) for k in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8,
                                     height, width, len(comps))
    for i, ((_p, tq, _th), (sh, sv)) in enumerate(zip(comps, samp)):
        out += bytes([i + 1, (sh << 4) | sv, tq])
    huffs = [(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
             (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if channels == 3:
        huffs += [(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                  (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    enc_tabs = {}
    for tc, th, bits, vals in huffs:
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + sum(bits)) + bytes([(tc << 4) | th])
        out += bytes(bits) + bytes(vals)
        enc_tabs[(tc, th)] = _enc_table(bits, vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps),
                                     len(comps))
    for i, (_p, _tq, th) in enumerate(comps):
        out += bytes([i + 1, (th << 4) | th])
    out += b"\x00\x3f\x00"  # Ss/Se/Ah-Al

    # --- entropy-coded scan -------------------------------------------------
    bw = _BitWriter()
    preds = [0] * len(comps)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_index
                    and mcu_index % restart_interval == 0):
                bw.flush()
                bw.out += bytes([0xFF,
                                 0xD0 + ((mcu_index // restart_interval
                                          - 1) % 8)])
                preds = [0] * len(comps)
            for ci, ((_p, _tq, th), (sh, sv)) in enumerate(
                    zip(comps, samp)):
                dc_tab = enc_tabs[(0, th)]
                ac_tab = enc_tabs[(1, th)]
                for by in range(sv):
                    for bx in range(sh):
                        block = zz[ci][my * sv + by, mx * sh + bx]
                        dc = int(block[0])
                        t, bits = _mag_bits(dc - preds[ci])
                        preds[ci] = dc
                        ln, code = dc_tab[t]
                        bw.write(code, ln)
                        if t:
                            bw.write(bits, t)
                        run = 0
                        nz = np.nonzero(block[1:])[0]
                        last_nz = (nz[-1] + 1) if len(nz) else 0
                        for k in range(1, last_nz + 1):
                            v = int(block[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_tab[0xF0]  # ZRL
                                bw.write(code, ln)
                                run -= 16
                            t, bits = _mag_bits(v)
                            ln, code = ac_tab[(run << 4) | t]
                            bw.write(code, ln)
                            bw.write(bits, t)
                            run = 0
                        if last_nz < 63:
                            ln, code = ac_tab[0x00]  # EOB
                            bw.write(code, ln)
            mcu_index += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — fixture builder. Emits a standard
# spectral-selection + successive-approximation scan script (DC Al=1
# then refine; AC bands 1-5 / 6-63 at Al=2, refined to 1 then 0) so
# tests can build genuine progressive JPEGs without any imaging
# library. AC scans use a flat 256-symbol canonical Huffman table
# (255 codes at 8 bits + 1 at 9; the all-ones 9-bit code stays
# unused, as the spec's padding rule wants) — valid, simple, and
# compression-irrelevant for fixtures. EOB-run batching is real, so
# the decoder's EOBn path is exercised, not just EOB0.
# ---------------------------------------------------------------------------

_AC_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
_AC_FLAT_VALS = list(range(256))


class _ProgAC:
    """Per-scan AC emission state: EOB-run accumulator plus the
    deferred refinement correction bits that ride with it."""

    def __init__(self, bw, tab):
        self.bw = bw
        self.tab = tab
        self.eobrun = 0
        self.be: list = []

    def sym(self, s):
        ln, code = self.tab[s]
        self.bw.write(code, ln)

    def emit_eobrun(self):
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            self.sym(n << 4)
            if n:
                self.bw.write(self.eobrun & ((1 << n) - 1), n)
            self.eobrun = 0
        for b in self.be:
            self.bw.write(b, 1)
        self.be = []

    def first(self, block, ss, se, al):
        """First AC scan (Ah=0): code (coef / 2^Al, toward zero)."""
        r = 0
        for k in range(ss, se + 1):
            v = int(block[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            self.emit_eobrun()
            while r > 15:
                self.sym(0xF0)
                r -= 16
            s, bits = _mag_bits(t if v > 0 else -t)
            self.sym((r << 4) | s)
            self.bw.write(bits, s)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def refine(self, block, ss, se, al):
        """Refinement AC scan (Ah=Al+1): one new magnitude bit per
        already-nonzero coefficient, (run, 1)+sign for newly-nonzero
        ones, zero runs folded into EOB runs past the last new
        coefficient."""
        vals = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
        eob = -1
        for i, t in enumerate(vals):
            if t == 1:
                eob = i
        r = 0
        br: list = []
        for i, t in enumerate(vals):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                self.emit_eobrun()
                self.sym(0xF0)
                r -= 16
                for b in br:
                    self.bw.write(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            self.emit_eobrun()
            self.sym((r << 4) | 1)
            self.bw.write(1 if int(block[ss + i]) >= 0 else 0, 1)
            for b in br:
                self.bw.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.be += br
            if self.eobrun == 0x7FFF or len(self.be) > 900:
                self.emit_eobrun()


def encode_progressive_jpeg(width: int, height: int, pixels: bytes,
                            channels: int = 3, quality: int = 85,
                            subsample: bool = False) -> bytes:
    """(w, h, raw bytes) → progressive (SOF2) JPEG with the scan
    script documented above. Same quantized coefficients as
    encode_jpeg, so progressive and baseline decodes of the same
    pixels agree up to rounding."""
    qts, comps, samp, zz, mcus_x, mcus_y = _prepare_blocks(
        width, height, pixels, channels, quality, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = bytearray(b"\xff\xd8")
    for tq, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(qt[_ZIGZAG[k]]) for k in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8,
                                     height, width, len(comps))
    for i, ((_p, tq, _th), (sh, sv)) in enumerate(zip(comps, samp)):
        out += bytes([i + 1, (sh << 4) | sv, tq])
    huffs = [(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
             (1, 0, _AC_FLAT_BITS, _AC_FLAT_VALS)]
    if channels == 3:
        huffs.append((0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
    enc_tabs = {}
    for tc, th, bits, vals in huffs:
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + sum(bits)) + bytes([(tc << 4) | th])
        out += bytes(bits) + bytes(vals)
        enc_tabs[(tc, th)] = _enc_table(bits, vals)

    def sos_header(comp_ids, tds, ss, se, ah, al):
        hdr = b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for ci, td in zip(comp_ids, tds):
            hdr += bytes([ci + 1, (td << 4)])  # Ta always table 0
        return hdr + bytes([ss, se, (ah << 4) | al])

    dc_td = [0] + [1] * (len(comps) - 1)

    def dc_scan(ah, al):
        nonlocal out
        out += sos_header(list(range(len(comps))), dc_td, 0, 0, ah, al)
        bw = _BitWriter()
        preds = [0] * len(comps)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(zz[ci][my * sv + by,
                                            mx * sh + bx][0])
                            if ah == 0:
                                v = dc >> al
                                t, bits = _mag_bits(v - preds[ci])
                                preds[ci] = v
                                ln, code = enc_tabs[(0, dc_td[ci])][t]
                                bw.write(code, ln)
                                if t:
                                    bw.write(bits, t)
                            else:
                                bw.write((dc >> al) & 1, 1)
        bw.flush()
        out += bw.out

    def ac_scan(ci, ss, se, ah, al):
        nonlocal out
        out += sos_header([ci], [0], ss, se, ah, al)
        bw = _BitWriter()
        st = _ProgAC(bw, enc_tabs[(1, 0)])
        sh, sv = samp[ci]
        comp_w = -(-width * sh // hmax)
        comp_h = -(-height * sv // vmax)
        for by in range((comp_h + 7) // 8):
            for bx in range((comp_w + 7) // 8):
                block = zz[ci][by, bx]
                if ah == 0:
                    st.first(block, ss, se, al)
                else:
                    st.refine(block, ss, se, al)
        st.emit_eobrun()
        bw.flush()
        out += bw.out

    dc_scan(0, 1)
    for ci in range(len(comps)):
        ac_scan(ci, 1, 5, 0, 2)
        ac_scan(ci, 6, 63, 0, 2)
    dc_scan(1, 0)
    for ci in range(len(comps)):
        ac_scan(ci, 1, 5, 2, 1)
        ac_scan(ci, 6, 63, 2, 1)
        ac_scan(ci, 1, 5, 1, 0)
        ac_scan(ci, 6, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)

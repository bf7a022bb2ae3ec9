"""Posting-list chunk codec: delta-encoded docid gaps + VByte, with
per-chunk block-max metadata.

Modeled on the reference brass backend's posting chunks
(xapian-core/backends/brass/brass_postlist.cc:218-231 encode, :323-362
chunk split at CHUNKSIZE≈2000 bytes, :93) and its vbyte integer packing
(xapian-core/common/pack.h:216-227): 7 data bits per byte, LSB-first,
high bit set on every byte except the last.

Divergences (deliberate, documented):
- each posting encodes a (docid_gap-1, wdf, doclen) TRIPLE — the
  reference stores doclen in a separate list keyed by docid
  (brass_postlist.cc doclen chunks); inlining it makes a chunk
  self-contained so the scoring kernel never joins doclens.
- per-chunk block-max metadata (max_wdf, min_doclen) is OUR addition:
  the reference only keeps coarse per-term bounds (SURVEY §4.2); the
  per-chunk bounds enable block-max WAND with the same contract
  (never underestimate ⇒ pruning never changes top-k).

Encoding is NumPy-vectorized (no per-int Python in the hot path):
vbyte byte-lengths computed via log-free comparisons, output buffer
filled by boolean-mask scatter. Decoding uses a cumsum-based scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

# target encoded chunk size in bytes (reference CHUNKSIZE,
# brass_postlist.cc:93)
CHUNK_TARGET_BYTES = 2000

# On-disk chunk format version. v2: the first posting entry stores the
# ABSOLUTE docid (so docid 0 can't underflow the uint64 gap stream);
# v1 (round-1) stored docid-1. Decoding a v1 index with the v2 codec
# shifts every docid down by one SILENTLY — writers stamp this into
# <path>/format.json and SegmentIndex refuses a mismatched (or
# unstamped legacy) index rather than returning wrong documents.
CODEC_VERSION = 2


def vbyte_encode(values: np.ndarray) -> bytes:
    """VByte-encode an array of uint64 (LSB-first, continuation high bit
    on all but the final byte of each value — pack.h:216-227 layout)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: 1 + floor(log128(v)) without logs
    nbytes = np.ones(v.size, dtype=np.int64)
    cur = v >> np.uint64(7)
    while cur.any():
        nbytes += (cur > 0).astype(np.int64)
        cur = cur >> np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # position of each value's first byte
    starts = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    # fill byte-by-byte over the max width (≤10 for uint64)
    maxw = int(nbytes.max())
    shifted = v.copy()
    for k in range(maxw):
        mask = nbytes > k
        idx = starts[mask] + k
        is_last = nbytes[mask] == k + 1
        byte = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        out[idx] = np.where(is_last, byte, byte | np.uint8(0x80))
        shifted = shifted >> np.uint64(7)
    return out.tobytes()


def vbyte_decode(data: bytes) -> np.ndarray:
    """Decode a VByte stream back to uint64 values (vectorized)."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # byte k of value i contributes (raw & 0x7f) << (7 * k)
    pos_in_value = np.arange(raw.size, dtype=np.int64)
    value_id = np.cumsum(np.concatenate(([False], is_last[:-1])))
    pos_in_value = pos_in_value - starts[value_id]
    contrib = (raw & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_value.astype(np.uint64))
    out = np.zeros(ends.size, dtype=np.uint64)
    np.add.at(out, value_id, contrib)
    return out


@dataclass
class Chunk:
    """One encoded posting chunk + its block-max metadata."""

    first_doc_id: int
    last_doc_id: int
    n: int              # postings in this chunk
    max_wdf: int        # block-max: max wdf in chunk
    min_doclen: int     # block-max: min doclen in chunk
    data: bytes         # vbyte (gap-1, wdf, doclen) triples


def encode_chunks(
    doc_ids: np.ndarray, wdfs: np.ndarray, doclens: np.ndarray,
    target_bytes: int = CHUNK_TARGET_BYTES,
) -> List[Chunk]:
    """Split a docid-ascending posting list into ~target_bytes chunks.

    Postings per chunk is estimated from the average encoded triple size
    so chunk boundaries stay deterministic for a given input.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return []
    wdfs = np.asarray(wdfs, dtype=np.int64)
    doclens = np.asarray(doclens, dtype=np.int64)
    if n > 1 and (np.diff(doc_ids) <= 0).any():
        raise ValueError("doc_ids must be strictly ascending")
    if doc_ids[0] < 0:
        # the reference's docid contract is 1-based (omdatabase.cc), but
        # external corpora are commonly 0-based; the codec supports any
        # non-negative docid (first entry stored absolute, so 0 cannot
        # underflow the uint64 gap stream). Negatives are invalid.
        raise ValueError(f"doc_ids must be >= 0 (got {int(doc_ids[0])})")

    # ~2.5 bytes/int average at web scale; 3 ints per posting
    per_posting = 8
    step = max(16, target_bytes // per_posting)
    chunks: List[Chunk] = []
    for s in range(0, n, step):
        e = min(s + step, n)
        ids = doc_ids[s:e]
        w = wdfs[s:e]
        dl = doclens[s:e]
        gaps = np.empty(e - s, dtype=np.uint64)
        # first entry: ABSOLUTE docid (no -1 — docid 0 must not
        # underflow uint64); rest: gap-1 (gaps are >= 1)
        gaps[0] = ids[0]
        gaps[1:] = np.diff(ids).astype(np.uint64) - np.uint64(1)
        tri = np.empty(3 * (e - s), dtype=np.uint64)
        tri[0::3] = gaps
        tri[1::3] = w.astype(np.uint64)
        tri[2::3] = dl.astype(np.uint64)
        chunks.append(Chunk(
            first_doc_id=int(ids[0]),
            last_doc_id=int(ids[-1]),
            n=int(e - s),
            max_wdf=int(w.max()),
            min_doclen=int(dl.min()),
            data=vbyte_encode(tri),
        ))
    return chunks


def decode_chunk(data: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """bytes → (doc_ids, wdfs, doclens), all int64 arrays."""
    tri = vbyte_decode(data)
    gaps = tri[0::3].astype(np.int64)
    gaps[1:] += 1  # first entry is absolute; rest are stored as gap-1
    doc_ids = np.cumsum(gaps)
    return doc_ids, tri[1::3].astype(np.int64), tri[2::3].astype(np.int64)


def encode_positions(pos_lists) -> bytes:
    """Per-posting position lists → one vbyte stream
    (the brass position table analog, brass_positionlist.cc — we use
    count + first + gaps instead of binary-interpolative coding; same
    information, simpler codec).

    Stream layout per posting: [n, p1, p2-p1, …] (n may be 0)."""
    flat: List[int] = []
    for pl in pos_lists:
        pl = [] if pl is None else list(pl)
        flat.append(len(pl))
        prev = 0
        for p in pl:
            flat.append(int(p) - prev)
            prev = int(p)
    return vbyte_encode(np.array(flat, dtype=np.uint64))


def decode_positions(data: bytes, n_postings: int) -> List[np.ndarray]:
    """Inverse of encode_positions → list of int32 arrays."""
    vals = vbyte_decode(data).astype(np.int64)
    out: List[np.ndarray] = []
    i = 0
    for _ in range(n_postings):
        cnt = int(vals[i])
        i += 1
        gaps = vals[i: i + cnt]
        i += cnt
        out.append(np.cumsum(gaps).astype(np.int32) if cnt
                   else np.empty(0, dtype=np.int32))
    return out

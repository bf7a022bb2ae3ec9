"""Binary-interpolative position coding (codec.py v3 pos_data) —
byte-exact transcription of brass_positionlist.cc pack/read_data over
common/bitstream.cc BitWriter/BitReader."""

import random

import numpy as np
import pytest

from xapian_spark.index.codec import (
    _BitReader, _BitWriter, decode_positions, encode_positions,
    pack_positions, unpack_positions,
)


def test_encode_golden_outof_11():
    # the worked example in bitstream.cc:70-86: codes for outof=11.
    # centre values 3..7 use 3 bits, the rest 4 — and the LSB-first
    # stream must round-trip through decode()
    expected_bits = {0: 4, 1: 4, 2: 4, 3: 3, 4: 3, 5: 3, 6: 3, 7: 3,
                     8: 4, 9: 4, 10: 4}
    for value, nbits in expected_bits.items():
        wr = _BitWriter()
        wr.encode(value, 11)
        # pad with a marker so bit-length is observable
        wr._write_bits(1, 1)
        blob = wr.freeze()
        rd = _BitReader(blob)
        assert rd.decode(11) == value
        assert rd._read_bits(1) == 1  # marker lands right after nbits
        # total bits consumed == expected code length + 1
        consumed = (rd.idx * 8) - rd.n
        assert consumed - 8 * (rd.idx - len(blob)) >= 0
        assert nbits + 1 <= len(blob) * 8


def test_bitstream_sequence_roundtrip():
    rnd = random.Random(99)
    ops = []
    wr = _BitWriter()
    for _ in range(200):
        outof = rnd.randrange(1, 1 << 20)
        value = rnd.randrange(outof)
        wr.encode(value, outof)
        ops.append((value, outof))
    blob = wr.freeze()
    rd = _BitReader(blob)
    for value, outof in ops:
        assert rd.decode(outof) == value


def test_pack_positions_roundtrip_property():
    rnd = random.Random(3)
    for _ in range(300):
        n = rnd.randrange(1, 50)
        pos = sorted(rnd.sample(range(1, 2000), n))
        assert unpack_positions(pack_positions(pos)) == pos


def test_pack_single_entry_special_case():
    # reference: single-entry lists are JUST vbyte(last), no bitstream
    assert pack_positions([7]) == b"\x07"
    assert unpack_positions(b"\x07") == [7]
    big = 300
    blob = pack_positions([big])
    assert unpack_positions(blob) == [big]
    assert len(blob) == 2  # two vbyte bytes, nothing else


def test_dense_list_compresses_hard():
    # consecutive positions carry ~zero information: the interpolative
    # code stores 1000 dense positions in a handful of bytes (the
    # count+gaps scheme used ~1 byte per position)
    dense = list(range(1, 1001))
    blob = pack_positions(dense)
    assert len(blob) <= 8
    assert unpack_positions(blob) == dense


def test_stream_with_empty_lists():
    lists = [None, [5], [1, 2, 3], [], [7, 100, 101, 399],
             list(range(1, 200, 3))]
    enc = encode_positions(lists)
    dec = decode_positions(enc, len(lists))
    for a, b in zip(lists, dec):
        assert list(b) == ([] if not a else list(a))
    assert all(isinstance(x, np.ndarray) for x in dec)


def test_phrase_queries_identical_across_codec(spark, tmp_path):
    # end-to-end: a positional segment index built under the v3 codec
    # answers phrase queries identically to the flat positional index
    from pyspark.sql import functions as F

    from xapian_spark.index.build import build_index
    from xapian_spark.index.segments import build_segments
    from xapian_spark.query import ops
    from xapian_spark.query.executor import Enquire

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(80))
    flat = build_index(docs, text_col="text", analyzer="simple",
                       keep_positions=True)
    seg = build_segments(docs, str(tmp_path / "idx"), n_segments=4,
                         analyzer="simple", keep_positions=True)
    q = ops.Phrase(["the", "data"])
    a = [(r["doc_id"], round(r["score"], 10)) for r in
         Enquire(flat).get_mset(q, 0, 10).collect()]
    b = [(r["doc_id"], round(r["score"], 10)) for r in
         Enquire(seg.to_inverted_index()).get_mset(q, 0, 10).collect()]
    assert a == b and a

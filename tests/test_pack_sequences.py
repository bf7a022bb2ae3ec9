"""Sequence-packing accounting: hand cases + brute-force mirror."""

import hashlib

import pytest

from xapian_spark.pipeline.curate import pack_sequences


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bucket(doc_id, seed):
    return int(hashlib.md5(f"{seed}:{doc_id}".encode())
               .hexdigest()[:8], 16)


def _mirror(rows, seq_len, n_shards, seed=0):
    import re
    toks = {i: [t for t in re.split("[^a-z0-9]+", s.lower()) if t]
            for i, s in rows}
    shard = {i: _bucket(i, seed) % n_shards for i, _ in rows}
    out = {}
    offsets = {}
    for i in sorted(toks):
        s = shard[i]
        start = offsets.get(s, 0)
        n = len(toks[i])
        end = start + n
        offsets[s] = end
        last = max(end - 1, start)
        out[i] = (s, n, start, start // seq_len, last // seq_len)
    return out


def test_single_shard_chunking(spark):
    # one shard: offsets accumulate in doc_id order, docs cross bins
    rows = [(1, "a b c"), (2, "d e f g"), (3, "h")]
    got = {r.doc_id: r for r in
           pack_sequences(_df(spark, rows), seq_len=4,
                          n_shards=1).collect()}
    assert (got[1].start_offset, got[1].start_seq, got[1].end_seq) \
        == (0, 0, 0)
    # doc 2 spans tokens 3..6 -> sequences 0 and 1
    assert (got[2].start_offset, got[2].start_seq, got[2].end_seq) \
        == (3, 0, 1)
    assert (got[3].start_offset, got[3].start_seq, got[3].end_seq) \
        == (7, 1, 1)


def test_zero_token_doc(spark):
    rows = [(1, "a b c d"), (2, "!!!"), (3, "e")]
    got = {r.doc_id: r for r in
           pack_sequences(_df(spark, rows), seq_len=2,
                          n_shards=1).collect()}
    assert got[2].n_tokens == 0
    assert got[2].start_seq == got[2].end_seq == 2   # offset 4 -> seq 2
    assert got[3].start_offset == 4                  # unaffected


def test_shard_assignment_stable_across_parallelism(spark):
    rows = [(i, "w " * (i % 7 + 1)) for i in range(50)]
    a = {r.doc_id: (r.shard, r.start_offset) for r in
         pack_sequences(_df(spark, rows), 8, n_shards=4).collect()}
    b = {r.doc_id: (r.shard, r.start_offset) for r in
         pack_sequences(_df(spark, rows).repartition(13), 8,
                        n_shards=4).collect()}
    assert a == b


def test_brute_force_mirror(spark):
    rows = [(i, " ".join(f"t{j}" for j in range((i * 3) % 9)))
            for i in range(40)]
    want = _mirror(rows, seq_len=5, n_shards=4)
    got = {r.doc_id: (r.shard, r.n_tokens, r.start_offset,
                      r.start_seq, r.end_seq)
           for r in pack_sequences(_df(spark, rows), 5,
                                   n_shards=4).collect()}
    assert got == want


def test_bad_args(spark):
    df = _df(spark, [(1, "a")])
    with pytest.raises(ValueError):
        pack_sequences(df, 0)
    with pytest.raises(ValueError):
        pack_sequences(df, 4, n_shards=0)

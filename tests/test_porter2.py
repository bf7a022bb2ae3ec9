"""Snowball english stemmer golden-pair test (stemtest.cc analog).

Validates byte-identical output on all 29,417 pairs from
/root/reference/xapian-data/stemming/english/{voc,output}.txt.
"""

import os

import pytest

GOLD_DIR = "/root/reference/xapian-data/stemming/english"


@pytest.mark.skipif(not os.path.isdir(GOLD_DIR), reason="golden data absent")
def test_english_golden_pairs():
    from xapian_spark.analysis.porter2 import stem

    with open(os.path.join(GOLD_DIR, "voc.txt")) as f:
        voc = f.read().split()
    with open(os.path.join(GOLD_DIR, "output.txt")) as f:
        out = f.read().split()
    assert len(voc) == len(out)
    bad = [(v, o, stem(v)) for v, o in zip(voc, out) if stem(v) != o]
    assert bad == [], f"{len(bad)} mismatches, first: {bad[:5]}"


def test_basics():
    from xapian_spark.analysis.porter2 import stem

    assert stem("cooking") == "cook"
    assert stem("words") == "word"
    assert stem("only") == "onli"
    assert stem("stemmed") == "stem"
    assert stem("dying") == "die"
    assert stem("news") == "news"
    assert stem("a") == "a"
    assert stem("") == ""

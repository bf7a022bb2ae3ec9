"""TermGenerator golden tests ported from the reference
(xapian-core/tests/termgentest.cc:69-160, test_simple table)."""

import pytest

from xapian_spark.analysis.porter2 import stem
from xapian_spark.analysis.tokenizer import (
    STEM_ALL,
    STEM_ALL_Z,
    STEM_NONE,
    TermGenerator,
    describe_document,
)

LONG = "REALLYREALLYREALLYREALLYREALLYREALLYREALLYREALLYREALLYREALLYLONG"

# (stemmer?, strategy, cjk, input, expected) — from termgentest.cc test_simple
CASES = [
    # no stemmer
    (None, None, False, "simple-example", "example[2] simple[1]"),
    (None, None, False, "I.B.M.", "ibm[1]"),
    (None, None, False, "I.B.M", "ibm[1]"),
    (None, None, False, "I.B.", "ib[1]"),
    (None, None, False, "I.B", "ib[1]"),
    (None, None, False, "I.", "i[1]"),
    # english stemmer, STEM_SOME (default)
    (stem, None, False, "I.B.M.", "Zibm:1 ibm[1]"),
    (stem, None, False, "I.B.M", "Zibm:1 ibm[1]"),
    (stem, None, False, "I.B.", "Zib:1 ib[1]"),
    (stem, None, False, "I.B", "Zib:1 ib[1]"),
    (stem, None, False, "I.", "Zi:1 i[1]"),
    (stem, None, False, "I.B.M. P.C.", "Zibm:1 Zpc:1 ibm[1] pc[2]"),
    (stem, None, False, "I.B.M P.C.", "Zibm:1 Zpc:1 ibm[1] pc[2]"),
    (stem, None, False, "1.0 1000,000.99 0.9.9,",
     "0.9.9[3] 1.0[1] 1000,000.99[2]"),
    (stem, None, False, "Pi is 3.1415926536 approximately",
     "3.1415926536[3] Zapproxim:1 Zis:1 Zpi:1 approximately[4] is[2] pi[1]"),
    (stem, None, False, "hello World Test",
     "Zhello:1 Ztest:1 Zworld:1 hello[1] test[3] world[2]"),
    (stem, None, False, "time_t", "Ztime_t:1 time_t[1]"),
    (stem, None, False, "stock -cooking",
     "Zcook:1 Zstock:1 cooking[2] stock[1]"),
    (stem, None, False, "d- school report",
     "Zd:1 Zreport:1 Zschool:1 d[1] report[3] school[2]"),
    (stem, None, False, "gtk+ -gnome", "Zgnome:1 Zgtk+:1 gnome[2] gtk+[1]"),
    (stem, None, False, "c++ -d--", "Zc++:1 Zd:1 c++[1] d[2]"),
    (stem, None, False, "cd'r toebehoren",
     "Zcd'r:1 Ztoebehoren:1 cd'r[1] toebehoren[2]"),
    (stem, None, False, f"a {LONG} term",
     f"Za:1 Z{LONG.lower()}:1 Zterm:1 a[1] {LONG.lower()}[2] term[3]"),
    (stem, None, False, f"a {LONG}X term", "Za:1 Zterm:1 a[1] term[2]"),
    (stem, None, False, "fish+chips", "Zchip:1 Zfish:1 chips[2] fish[1]"),
    # zero-width joins (Myanmar text with U+200B)
    (stem, None, False,
     "ဝီ​ကီ​ပိ​သု"
     "ံး​စွဲ​သူ​မ"
     "ျားက",
     "Zဝီကီပိသုံးစ"
     "ွဲသူများက:1 "
     "ဝီကီပိသုံးစ"
     "ွဲသူများက[1]"),
    # CJK n-grams (stemmer off)
    (None, None, True, "久有归天",
     "久[1] 久有:1 天[4] 归[3] 归天:1 有[2] 有归:1"),
    (None, None, True, "극지라", "극[1] 극지:1 라[3] 지[2] 지라:1"),
    (None, None, True, "ウルス アップ",
     "ア[4] アッ:1 ウ[1] ウル:1 ス[3] ッ[5] ップ:1 プ[6] ル[2] ルス:1"),
    (None, None, True, "インtestタ", "test[3] イ[1] イン:1 タ[4] ン[2]"),
    (None, None, True, "配this is合a个 test!",
     "a[5] is[3] test[7] this[2] 个[6] 合[4] 配[1]"),
    (None, None, True, "申込み！月額円",
     "み[3] 円[6] 月[4] 月額:1 申[1] 申込:1 込[2] 込み:1 額[5] 額円:1"),
    # strategies
    (stem, STEM_NONE, False, "Unstemmed words!", "unstemmed[1] words[2]"),
    (stem, STEM_ALL, False, "Only stemmed words!",
     "onli[1] stem[2] word[3]"),
    (stem, STEM_ALL_Z, False, "Only stemmed words!",
     "Zonli[1] Zstem[2] Zword[3]"),
    # number-like things
    (stem, None, False, "11:59", "11[1] 59[2]"),
    (stem, None, False, "11:59am", "11[1] 59am[2]"),
]

PREFIX_CASES = [
    (stem, "XA", "hello", "XAhello[1] ZXAhello:1"),
    (stem, "XA", "hello World Test",
     "XAhello[1] XAtest[3] XAworld[2] ZXAhello:1 ZXAtest:1 ZXAworld:1"),
    (None, "XA", "发送从", "XA从[3] XA发[1] XA发送:1 XA送[2] XA送从:1"),
    (None, "XA", "点卡思考",
     "XA卡[2] XA卡思:1 XA思[3] XA思考:1 XA点[1] XA点卡:1 XA考[4]"),
]


@pytest.mark.parametrize("stemmer,strategy,cjk,text,expect", CASES)
def test_termgen(stemmer, strategy, cjk, text, expect):
    kwargs = {"stemmer": stemmer, "cjk_ngram": cjk}
    if strategy is not None:
        kwargs["strategy"] = strategy
    tg = TermGenerator(**kwargs)
    doc = tg.index_text(text)
    assert describe_document(doc) == expect


@pytest.mark.parametrize("stemmer,prefix,text,expect", PREFIX_CASES)
def test_termgen_prefix(stemmer, prefix, text, expect):
    tg = TermGenerator(stemmer=stemmer, cjk_ngram=True)
    doc = tg.index_text(text, prefix=prefix)
    assert describe_document(doc) == expect


def test_doclen_includes_z_terms():
    tg = TermGenerator()
    doc = tg.index_text("hello World Test")
    # 3 unstemmed + 3 Z-stems, each wdf 1 → doclen 6 (NOT 3)
    assert doc.doclen() == 6


def test_full_termgentest_table():
    """ALL 42 cases of the reference's termgentest.cc test_simple table
    (fixture tests/data/termgen_golden.json), replayed statefully with
    the harness conventions: persistent stem/strategy/prefix options,
    `cont` appends with a 100-position gap, CJK n-grams enabled
    (XAPIAN_CJK_NGRAM=1 as the reference harness sets, :846-852)."""
    import json
    import os

    from xapian_spark.analysis.porter2 import stem as en_stem
    from xapian_spark.analysis.tokenizer import (
        Document, STEM_ALL, STEM_ALL_Z, STEM_NONE, STEM_SOME,
        TermGenerator, describe_document,
    )

    path = os.path.join(os.path.dirname(__file__), "data",
                        "termgen_golden.json")
    cases = json.load(open(path))
    assert len(cases) == 42
    state = {"stemmer": None, "strategy": STEM_SOME, "prefix": ""}
    doc = None
    for case in cases:
        weight, nopos = 1, False
        for o in (x for x in case["opts"].split(",") if x):
            if o == "cont":
                pass
            elif o == "nopos":
                nopos = True
            elif o.startswith("weight="):
                weight = int(o.split("=")[1])
            elif o.startswith("stem="):
                lang = o.split("=")[1]
                state["stemmer"] = en_stem if lang in ("en", "english") \
                    else None
            elif o == "all":
                state["strategy"] = STEM_ALL
            elif o == "all_z":
                state["strategy"] = STEM_ALL_Z
            elif o == "none":
                state["strategy"] = STEM_NONE
            elif o == "some":
                state["strategy"] = STEM_SOME
            elif o.startswith("prefix="):
                state["prefix"] = o.split("=", 1)[1]
        tg = TermGenerator(stemmer=state["stemmer"],
                           strategy=state["strategy"], cjk_ngram=True)
        if "cont" not in case["opts"].split(",") or doc is None:
            doc = Document()
        else:
            doc.termpos += 100
        tg.index_text(case["text"], doc=doc, wdf_inc=weight,
                      prefix=state["prefix"], with_positions=not nopos)
        assert describe_document(doc) == case["expect"], case

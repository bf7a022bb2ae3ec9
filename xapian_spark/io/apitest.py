"""Loader for the reference's apitest text corpora.

Splits a corpus file into one document per blank-line-separated paragraph,
exactly as the reference harness does (xapian-core/tests/harness/
index_utils.cc:36-47 get_paragraph + the index_to loop): a paragraph ends
at an all-whitespace line; lines keep their trailing newline; consecutive
blank lines yield empty documents (which still count toward doccount).
"""

from __future__ import annotations

import os
from typing import List

REFERENCE_TESTDATA = "/root/reference/xapian-core/tests/testdata"


def paragraphs(path: str) -> List[str]:
    with open(path) as f:
        lines = f.read().split("\n")
    paras: List[str] = []
    i = 0
    n = len(lines)
    while i < n:
        para = ""
        while i < n:
            line = lines[i]
            i += 1
            if line.strip() == "":
                break
            para += line + "\n"
        paras.append(para)
        if i >= n:
            break
    # split('\n') of a file ending in '\n' leaves one trailing '' that the
    # C++ eof check never turns into a document
    while paras and paras[-1] == "":
        paras.pop()
    return paras


def load_corpus(name: str) -> List[str]:
    """e.g. load_corpus("apitest_simpledata") → list of paragraph strings."""
    return paragraphs(os.path.join(REFERENCE_TESTDATA, name + ".txt"))


def corpus_df(spark, name: str):
    """(doc_id 1-based BIGINT, data STRING) DataFrame for a corpus."""
    paras = load_corpus(name)
    return spark.createDataFrame(
        [(i + 1, p) for i, p in enumerate(paras)],
        "doc_id long, data string",
    )


def multi_corpus_df(spark, names):
    """N corpora as one interleaved multi-database: global docid =
    (local-1)*N + subdb + 1, the reference's multi-db interleave inverse
    (matcher/multimatch.cc:175-176: local=(did-1)/N+1, subdb=(did-1)%N)."""
    n = len(names)
    rows = []
    for sub, name in enumerate(names):
        for local, para in enumerate(load_corpus(name), start=1):
            rows.append(((local - 1) * n + sub + 1, para))
    rows.sort()
    return spark.createDataFrame(rows, "doc_id long, data string")

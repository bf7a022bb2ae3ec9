"""Xapian-compatible text tokenizer (TermGenerator semantics).

Re-implements the Unicode word-segmentation rules of the reference's
TermGenerator (xapian-core/queryparser/termgenerator_internal.cc:121-308):

- word characters = Unicode categories L*, M*, N*, Pc (unicode.h:332-347)
- lowercasing per codepoint
- acronym folding:  U.N.C.L.E -> uncle   (:143-160)
- infix joins: ' & U+00B7 U+05F4 U+2027 (and U+2019/U+201B -> ') between
  word chars; zero-width chars ignored   (:67-81)
- digit infix: , . ; and friends between digits  (:83-102)
- trailing '+'/'#' kept, at most 3, not if a word char follows  (:109-113)
- terms longer than 64 UTF-8 bytes are dropped  (termgenerator_internal.h:47)
- STEM_SOME strategy: unstemmed term with positions + 'Z'-prefixed stem
  without positions, both contributing wdf (critical for doclen!)
- optional CJK unigram+bigram emission (cjk-tokenizer.cc:73-126)

Pure-Python core operating on one string; the Spark-side wrapper batches it
through an Arrow/pandas UDF (see xapian_spark.index.build).
"""

from __future__ import annotations

import unicodedata
from typing import Dict, List, Optional, Tuple

from .porter2 import stem as porter2_stem

# Xapian wordchar mask: Lu Ll Lt Lm Lo Mn Me Mc Nd Nl No Pc
_WORDCHAR_CATS = frozenset(
    ("Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Me", "Mc", "Nd", "Nl", "No", "Pc")
)
_SHOULD_STEM_CATS = frozenset(("Ll", "Lt", "Lm", "Lo"))

_INFIX_KEEP = frozenset(("'", "&", "·", "״", "‧"))
_INFIX_APOS = frozenset(("’", "‛"))
_ZERO_WIDTH = frozenset(("​", "‌", "‍", "⁠", "﻿"))
_INFIX_DIGIT = frozenset(
    (",", ".", ";", ";", "։", "؍", "߸",
     "⁄", "︐", "︓", "︔")
)

MAX_WORD_LENGTH = 64  # bytes of UTF-8

STEM_NONE = 0
STEM_SOME = 1
STEM_ALL = 2
STEM_ALL_Z = 3


def _is_wordchar(ch: str) -> bool:
    return unicodedata.category(ch) in _WORDCHAR_CATS


def _lower(ch: str) -> str:
    low = ch.lower()
    # Xapian's tolower is a single-codepoint map; Python may expand
    # (e.g. U+0130) -- keep the first codepoint in that rare case.
    return low if len(low) == 1 else low[0]


def _is_digit(ch: str) -> bool:
    return unicodedata.category(ch) == "Nd"


def _is_cjk(ch: str) -> bool:
    p = ord(ch)
    if p < 0x2E80:
        return False
    return (
        p <= 0x2EFF
        or 0x3000 <= p <= 0x9FFF
        or 0xA700 <= p <= 0xA71F
        or 0xAC00 <= p <= 0xD7AF
        or 0xF900 <= p <= 0xFAFF
        or 0xFE30 <= p <= 0xFE4F
        or 0xFF00 <= p <= 0xFFEF
        or 0x20000 <= p <= 0x2A6DF
        or 0x2F800 <= p <= 0x2FA1F
    )


def should_stem(term: str) -> bool:
    """termgenerator_internal.cc:50-60 — stem only if the first char is a
    (lower/title/modifier/other) letter; skips digit-led terms."""
    return bool(term) and unicodedata.category(term[0]) in _SHOULD_STEM_CATS


class Document:
    """Accumulates (term -> wdf, positions) like Xapian::Document."""

    __slots__ = ("terms", "termpos")

    def __init__(self) -> None:
        self.terms: Dict[str, Tuple[int, List[int]]] = {}
        self.termpos = 0

    def add_posting(self, term: str, pos: int, wdf_inc: int = 1) -> None:
        wdf, positions = self.terms.get(term, (0, []))
        positions.append(pos)
        self.terms[term] = (wdf + wdf_inc, positions)

    def add_term(self, term: str, wdf_inc: int = 1) -> None:
        wdf, positions = self.terms.get(term, (0, []))
        self.terms[term] = (wdf + wdf_inc, positions)

    def doclen(self) -> int:
        """Σ wdf over ALL terms, including Z-stems — this is the `len`
        BM25 uses (brass_database.cc:1058-1071)."""
        return sum(wdf for wdf, _ in self.terms.values())


class TermGenerator:
    """Port of the reference TermGenerator loop (STEM_SOME default)."""

    def __init__(
        self,
        stemmer=porter2_stem,
        strategy: int = STEM_SOME,
        cjk_ngram: bool = False,
        stopwords: Optional[frozenset] = None,
        stop_mode_ignore: bool = False,
        max_word_length: int = MAX_WORD_LENGTH,
    ) -> None:
        self.stemmer = stemmer
        self.strategy = strategy
        self.cjk_ngram = cjk_ngram
        self.stopwords = stopwords
        self.stop_mode_ignore = stop_mode_ignore
        self.max_word_length = max_word_length

    # -- term scanning ----------------------------------------------------

    def _scan_terms(self, text: str) -> List[str]:
        """Yield the unstemmed (lowercased) terms in order."""
        return [t for t, _s, _e in self._scan_terms_spans(text)]

    def _scan_terms_spans(self, text: str):
        """Like _scan_terms but yields (term, start, end) character spans
        (the QueryParser needs the separators between terms to decide
        phrase generation — queryparser.lemony is_phrase_generator)."""
        out: List[Tuple] = []
        n = len(text)
        i = 0
        cjk = self.cjk_ngram
        while True:
            # advance to the start of the next term
            while i < n and not _is_wordchar(text[i]):
                i += 1
            if i >= n:
                return out
            tstart = i

            # acronym: U.N.C.L.E
            ch = text[i]
            if "A" <= ch <= "Z":
                term = _lower(ch)
                p = i + 1
                while (
                    p < n
                    and text[p] == "."
                    and p + 1 < n
                    and "A" <= text[p + 1] <= "Z"
                ):
                    term += _lower(text[p + 1])
                    p += 2
                if len(term) > 1:
                    # allow trailing '.'; reject if a wordchar follows
                    q = p
                    if q < n and text[q] == ".":
                        q += 1
                    if q >= n or not _is_wordchar(text[q]):
                        out.append((term, tstart, q))
                        i = q
                        continue

            term = ""
            while True:
                if cjk and _is_cjk(text[i]) and _is_wordchar(text[i]):
                    run = ""
                    while i < n and _is_cjk(text[i]) and _is_wordchar(text[i]):
                        run += text[i]
                        i += 1
                    out.append((("\x00CJK", run), tstart, i))
                    term = ""
                    while i < n and not _is_wordchar(text[i]):
                        i += 1
                    if i >= n:
                        return out
                    continue
                # consume wordchar run
                while True:
                    term += _lower(text[i])
                    prev = text[i]
                    i += 1
                    if i >= n or (cjk and _is_cjk(text[i])):
                        break
                    if not _is_wordchar(text[i]):
                        break
                if i >= n or (cjk and _is_cjk(text[i])):
                    break
                # possible infix: need a wordchar immediately after it
                if i + 1 >= n:
                    break
                nxt = text[i + 1]
                if not _is_wordchar(nxt):
                    break
                infix = text[i]
                if _is_digit(prev) and _is_digit(nxt):
                    if infix in _INFIX_DIGIT:
                        keep: Optional[str] = infix
                    elif infix in _ZERO_WIDTH:
                        keep = ""
                    else:
                        break
                else:
                    if infix in _INFIX_KEEP:
                        keep = infix
                    elif infix in _INFIX_APOS:
                        keep = "'"
                    elif infix in _ZERO_WIDTH:
                        keep = ""
                    else:
                        break
                term += keep
                i += 1
                continue

            # trailing + or # (up to 3, not if a wordchar follows)
            if term:
                base = len(term)
                count = 0
                j = i
                while j < n and text[j] in ("+", "#"):
                    count += 1
                    if count > 3:
                        term = term[:base]
                        break
                    term += text[j]
                    j += 1
                else:
                    if j < n and _is_wordchar(text[j]):
                        term = term[:base]
                if count <= 3:
                    i = j
            if term:
                out.append((term, tstart, i))
        return out

    # -- indexing ----------------------------------------------------------

    def index_text(
        self,
        text: str,
        doc: Optional[Document] = None,
        wdf_inc: int = 1,
        prefix: str = "",
        with_positions: bool = True,
    ) -> Document:
        if doc is None:
            doc = Document()
        strategy = self.strategy
        stemmer = self.stemmer
        stop = self.stopwords
        for term in self._scan_terms(text):
            if isinstance(term, tuple):  # CJK run
                run = term[1]
                for k in range(len(run)):
                    for glen in (1, 2):
                        tok = run[k: k + glen]
                        if len(tok) < glen:
                            continue
                        if len(tok.encode("utf-8")) > self.max_word_length:
                            continue
                        if self.stop_mode_ignore and stop and tok in stop:
                            continue
                        if strategy in (STEM_SOME, STEM_NONE):
                            if with_positions and glen == 1:
                                doc.termpos += 1
                                doc.add_posting(prefix + tok, doc.termpos, wdf_inc)
                            else:
                                doc.add_term(prefix + tok, wdf_inc)
                        if strategy == STEM_NONE or stemmer is None:
                            continue
                        if strategy == STEM_SOME:
                            if stop and tok in stop:
                                continue
                            if not should_stem(tok):
                                continue
                        z = "" if strategy == STEM_ALL else "Z"
                        stemmed = z + prefix + stemmer(tok)
                        if strategy != STEM_SOME and with_positions:
                            doc.termpos += 1
                            doc.add_posting(stemmed, doc.termpos, wdf_inc)
                        else:
                            doc.add_term(stemmed, wdf_inc)
                continue

            if len(term.encode("utf-8")) > self.max_word_length:
                continue
            if self.stop_mode_ignore and stop and term in stop:
                continue
            if strategy in (STEM_SOME, STEM_NONE):
                if with_positions:
                    doc.termpos += 1
                    doc.add_posting(prefix + term, doc.termpos, wdf_inc)
                else:
                    doc.add_term(prefix + term, wdf_inc)
            if strategy == STEM_NONE or stemmer is None:
                continue
            if strategy == STEM_SOME:
                if stop and term in stop:
                    continue
                if not should_stem(term):
                    continue
            z = "" if strategy == STEM_ALL else "Z"
            stemmed = z + prefix + stemmer(term)
            if strategy != STEM_SOME and with_positions:
                doc.termpos += 1
                doc.add_posting(stemmed, doc.termpos, wdf_inc)
            else:
                doc.add_term(stemmed, wdf_inc)
        return doc


def describe_document(doc: Document) -> str:
    """Format a Document the way termgentest.cc expects (sorted terms,
    ':WDF' when wdf != len(positions), '[p1,p2]' when positional)."""
    parts = []
    for term in sorted(doc.terms):
        wdf, positions = doc.terms[term]
        s = term
        if wdf != len(positions):
            s += f":{wdf}"
        if positions:
            s += "[" + ",".join(str(p) for p in positions) + "]"
        parts.append(s)
    return " ".join(parts)

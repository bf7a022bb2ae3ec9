"""English Snowball stemmer ("Porter2"), pure Python.

Re-implements the published Snowball english algorithm exactly as pinned by
the reference's stemmer definition (/root/reference/xapian-core/languages/
english.sbl) and validated byte-identical against the 29,417 golden pairs in
/root/reference/xapian-data/stemming/english/{voc,output}.txt
(tests/test_porter2.py).

This is the hot path of the tokenizer UDF: it is written allocation-lean and
wrapped in an LRU cache (Zipf vocabularies hit the cache almost always).
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_VOWELS_Y = frozenset("aeiouyY")  # prelude scans: y after vowel -> Y
_V_WXY = frozenset("aeiouywxY")
_VALID_LI = frozenset("cdeghkmnrt")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

# exception1: whole-word special cases / invariants (english.sbl)
_EXCEPTION1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# exception2: whole words left alone after Step 1a
_EXCEPTION2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2_SUFFIXES = (
    # (suffix, replacement-or-None, special) sorted for longest-match scan
    ("ization", "ize"),
    ("ational", "ate"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("fulness", "ful"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", "og"),     # only when preceded by 'l'
    ("li", ""),        # only when preceded by a valid_LI char
)

_STEP3_SUFFIXES = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", ""),     # R2 only
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

_STEP4_SUFFIXES = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _has_vowel(s: str, end: int) -> bool:
    """True if s[:end] contains a vowel (prelude form: 'y' or 'Y' counts
    only via lowercase set; after prelude, vowel y's are lowercase)."""
    for i in range(end):
        if s[i] in _VOWELS:
            return True
    return False


def _short_syllable_at_end(w: str, end: int) -> bool:
    """Snowball `shortv` tested with cursor at `end` (backwardmode)."""
    if end >= 3:
        if (w[end - 1] not in _V_WXY and w[end - 2] in _VOWELS
                and w[end - 3] not in _VOWELS):
            return True
    if end == 2:
        if w[0] in _VOWELS and w[1] not in _VOWELS:
            return True
    return False


@lru_cache(maxsize=131072)
def stem(word: str) -> str:
    """Stem one (already lowercased) word, english Snowball semantics."""
    exc = _EXCEPTION1.get(word)
    if exc is not None:
        return exc
    if len(word) < 3:
        return word

    # --- prelude ---
    w = word
    y_found = False
    if w.startswith("'"):
        w = w[1:]
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)
    n = len(w)

    # --- mark_regions ---
    p1 = p2 = n
    start = 0
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            start = len(pre)
            break
    if start:
        p1 = start
    else:
        i = 0
        while i < n and w[i] not in _VOWELS:
            i += 1
        while i < n and w[i] in _VOWELS:
            i += 1
        if i < n:
            i += 1  # the non-vowel itself
            p1 = i
        else:
            p1 = n
    if p1 < n:
        i = p1
        while i < n and w[i] not in _VOWELS:
            i += 1
        while i < n and w[i] in _VOWELS:
            i += 1
        if i < n:
            p2 = i + 1

    # --- Step 1a ---
    if w.endswith("'s'"):
        w = w[:-3]
    elif w.endswith("'s"):
        w = w[:-2]
    elif w.endswith("'"):
        w = w[:-1]

    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        # delete if a vowel occurs before the char preceding the 's'
        if _has_vowel(w, len(w) - 2):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # --- Step 1b ---
    suf = None
    for s in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if w.endswith(s):
            suf = s
            break
    if suf in ("eed", "eedly"):
        if len(w) - len(suf) >= p1:
            w = w[: -len(suf)] + "ee"
    elif suf is not None:
        if _has_vowel(w, len(w) - len(suf)):
            w = w[: -len(suf)]
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_DOUBLES):
                w = w[:-1]
            elif len(w) == p1 and _short_syllable_at_end(w, len(w)):
                w += "e"

    # --- Step 1c ---
    if (len(w) >= 3 and w[-1] in ("y", "Y")
            and w[-2] not in _VOWELS):
        w = w[:-1] + "i"

    # --- Step 2 ---
    for s, repl in _STEP2_SUFFIXES:
        if w.endswith(s):
            if len(w) - len(s) >= p1:
                stem_part = w[: -len(s)]
                if s == "ogi":
                    if stem_part.endswith("l"):
                        w = stem_part + repl
                elif s == "li":
                    if stem_part and stem_part[-1] in _VALID_LI:
                        w = stem_part
                else:
                    w = stem_part + repl
            break

    # --- Step 3 ---
    for s, repl in _STEP3_SUFFIXES:
        if w.endswith(s):
            if len(w) - len(s) >= p1:
                if s == "ative":
                    if len(w) - len(s) >= p2:
                        w = w[: -len(s)]
                else:
                    w = w[: -len(s)] + repl
            break

    # --- Step 4 ---
    for s in _STEP4_SUFFIXES:
        if w.endswith(s):
            if len(w) - len(s) >= p2:
                if s == "ion":
                    if w[: -3].endswith(("s", "t")):
                        w = w[:-3]
                else:
                    w = w[: -len(s)]
            break

    # --- Step 5 ---
    if w.endswith("e"):
        cut = len(w) - 1
        if cut >= p2 or (cut >= p1 and not _short_syllable_at_end(w, cut)):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= p2:
        w = w[:-1]

    # --- postlude ---
    if y_found:
        w = w.replace("Y", "y")
    return w

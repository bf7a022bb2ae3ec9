"""German / French / Spanish Snowball stemmers, pure Python.

Re-implements the published Snowball algorithms (snowballstem.org) that
the reference registers in languages/stem.cc:52-120 (specs
languages/german.sbl, french.sbl, spanish.sbl), validated against the
reference's full golden vocabularies
(xapian-data/stemming/<lang>/{voc,output}.txt).

Like porter2.py these are plain str->str functions, used inside
vectorized batch UDFs — no per-row Python in any Spark hot path
beyond the tokenizer batch the analyzer already runs.

Snowball semantics preserved exactly:
- `among` picks the LONGEST matching suffix; if that entry's condition
  fails there is NO retry with a shorter suffix;
- string rewrites performed before a later failure are kept (`try`
  restores only the cursor, never the string);
- R1/R2/RV positions are computed on the prelude-transformed string
  and never recomputed after deletions.
"""

from __future__ import annotations

from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _gopast(w: str, i: int, in_set: bool, vowels) -> Optional[int]:
    """Cursor after the first char (from i) whose vowel-membership ==
    in_set; None if never found (Snowball `gopast v` / `gopast non-v`)."""
    n = len(w)
    while i < n:
        if (w[i] in vowels) == in_set:
            return i + 1
        i += 1
    return None


def _std_r1r2(w: str, vowels) -> Tuple[int, int]:
    """Standard R1/R2 (Snowball definition): R1 after the first
    non-vowel following a vowel; R2 likewise within R1."""
    n = len(w)
    p1 = _gopast(w, 0, True, vowels)
    p1 = _gopast(w, p1, False, vowels) if p1 is not None else None
    if p1 is None:
        return n, n
    p2 = _gopast(w, p1, True, vowels)
    p2 = _gopast(w, p2, False, vowels) if p2 is not None else None
    return p1, n if p2 is None else p2


def _longest(w: str, sufs) -> Optional[str]:
    """Longest suffix of w among sufs (the `among` longest-match rule)."""
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# ---------------------------------------------------------------------------
# German (german.sbl)
# ---------------------------------------------------------------------------

_DE_V = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")
_DE_ST_END = frozenset("bdfghklmnt")  # s_ending - 'r'


def german_stem(word: str) -> str:
    w = word.replace("ß", "ss")
    # u/y between vowels → U/Y (checked against already-transformed
    # chars: an uppercased U is no longer a vowel for the next match)
    ch = list(w)
    for i in range(1, len(ch) - 1):
        if ch[i] in "uy" and ch[i - 1] in _DE_V and ch[i + 1] in _DE_V:
            ch[i] = ch[i].upper()
    w = "".join(ch)

    p1, p2 = _std_r1r2(w, _DE_V)
    if len(w) >= 3:
        p1 = max(p1, 3)  # $p1 < x → $p1 = x

    def in_r1(pos: int) -> bool:
        return pos >= p1

    def in_r2(pos: int) -> bool:
        return pos >= p2

    # step 1
    suf = _longest(w, ("em", "ern", "er", "e", "en", "es", "s"))
    if suf:
        pos = len(w) - len(suf)
        if suf in ("em", "ern", "er"):
            if in_r1(pos):
                w = w[:pos]
        elif suf == "s":
            if in_r1(pos) and pos > 0 and w[pos - 1] in _DE_S_END:
                w = w[:pos]
        else:  # e en es
            if in_r1(pos):
                w = w[:pos]
                if w.endswith("niss"):
                    w = w[:-1]

    # step 2
    suf = _longest(w, ("en", "er", "est", "st"))
    if suf:
        pos = len(w) - len(suf)
        if suf == "st":
            if in_r1(pos) and pos > 0 and w[pos - 1] in _DE_ST_END \
                    and pos >= 4:  # st_ending hop 3
                w = w[:pos]
        else:
            if in_r1(pos):
                w = w[:pos]

    # step 3 (d-suffixes)
    suf = _longest(w, ("end", "ung", "ig", "ik", "isch", "lich",
                       "heit", "keit"))
    if suf:
        pos = len(w) - len(suf)
        if suf in ("end", "ung"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ig"):
                    p = len(w) - 2
                    if in_r2(p) and not w[:p].endswith("e"):
                        w = w[:p]
        elif suf in ("ig", "ik", "isch"):
            if in_r2(pos) and not w[:pos].endswith("e"):
                w = w[:pos]
        elif suf in ("lich", "heit"):
            if in_r2(pos):
                w = w[:pos]
                s2 = _longest(w, ("er", "en"))
                if s2:
                    p = len(w) - 2
                    if in_r1(p):
                        w = w[:p]
        else:  # keit
            if in_r2(pos):
                w = w[:pos]
                s2 = _longest(w, ("lich", "ig"))
                if s2:
                    p = len(w) - len(s2)
                    if in_r2(p):
                        w = w[:p]

    return (w.replace("Y", "y").replace("U", "u")
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# French (french.sbl)
# ---------------------------------------------------------------------------

_FR_V = frozenset("aeiouyâàëéêèïîôûù")


def _fr_prelude(word: str) -> str:
    ch = list(word)
    n = len(ch)
    i = 0
    while i < n:
        c = ch[i]
        if c in _FR_V and i + 1 < n:
            if ch[i + 1] in "ui" and i + 2 < n and ch[i + 2] in _FR_V:
                ch[i + 1] = ch[i + 1].upper()
                # `<-` leaves the cursor at the END OF THE REPLACED
                # REGION, so the trailing vowel is re-examined as the
                # anchor of the next match ("jouaient" → joUaIent)
                i += 2
                continue
            if ch[i + 1] == "y":
                ch[i + 1] = "Y"
                i += 2
                continue
        if c == "y" and i + 1 < n and ch[i + 1] in _FR_V:
            ch[i] = "Y"
            i += 2
            continue
        if c == "q" and i + 1 < n and ch[i + 1] == "u":
            ch[i + 1] = "U"
            i += 2
            continue
        i += 1
    return "".join(ch)


# suffix → action id for the big standard_suffix among
_FR_STD = {}
for _s in ("ance", "iqUe", "isme", "able", "iste", "eux",
           "ances", "iqUes", "ismes", "ables", "istes"):
    _FR_STD[_s] = "a1"
for _s in ("atrice", "ateur", "ation", "atrices", "ateurs", "ations"):
    _FR_STD[_s] = "a2"
for _s in ("logie", "logies"):
    _FR_STD[_s] = "log"
for _s in ("usion", "ution", "usions", "utions"):
    _FR_STD[_s] = "u"
for _s in ("ence", "ences"):
    _FR_STD[_s] = "ent"
for _s in ("ement", "ements"):
    _FR_STD[_s] = "ement"
for _s in ("ité", "ités"):
    _FR_STD[_s] = "ite"
for _s in ("if", "ive", "ifs", "ives"):
    _FR_STD[_s] = "if"
_FR_STD["eaux"] = "eaux"
_FR_STD["aux"] = "aux"
for _s in ("euse", "euses"):
    _FR_STD[_s] = "euse"
for _s in ("issement", "issements"):
    _FR_STD[_s] = "issement"
_FR_STD["amment"] = "amment"
_FR_STD["emment"] = "emment"
for _s in ("ment", "ments"):
    _FR_STD[_s] = "ment"

_FR_IVERB = ("îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira",
             "irai", "iraIent", "irais", "irait", "iras", "irent",
             "irez", "iriez", "irions", "irons", "iront", "is",
             "issaIent", "issais", "issait", "issant", "issante",
             "issantes", "issants", "isse", "issent", "isses",
             "issez", "issiez", "issions", "issons", "it")

_FR_VERB2 = ("é", "ée", "ées", "és", "èrent", "er", "era", "erai",
             "eraIent", "erais", "erait", "eras", "erez", "eriez",
             "erions", "erons", "eront", "ez", "iez")
_FR_VERB3 = ("âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait",
             "ant", "ante", "antes", "ants", "as", "asse", "assent",
             "asses", "assiez", "assions")

_FR_KEEP_S = frozenset("aiouès")


def french_stem(word: str) -> str:
    w = _fr_prelude(word)
    n = len(w)

    # RV
    pV = n
    if n >= 3 and w[0] in _FR_V and w[1] in _FR_V:
        pV = 3
    elif w[:3] in ("par", "col", "tap"):
        pV = 3
    else:
        g = _gopast(w, 1, True, _FR_V)
        if g is not None:
            pV = g
    p1, p2 = _std_r1r2(w, _FR_V)

    def rv(pos):
        return pos >= pV

    def r1(pos):
        return pos >= p1

    def r2(pos):
        return pos >= p2

    did = False          # standard/i_verb/verb succeeded
    word_changed = False

    # ---- standard_suffix -------------------------------------------------
    suf = _longest(w, _FR_STD)
    std_ok = False
    if suf:
        act = _FR_STD[suf]
        pos = len(w) - len(suf)
        if act == "a1":
            if r2(pos):
                w = w[:pos]
                std_ok = True
        elif act == "a2":
            if r2(pos):
                w = w[:pos]
                if w.endswith("ic"):
                    p = len(w) - 2
                    w = w[:p] if r2(p) else w[:p] + "iqU"
                std_ok = True
        elif act == "log":
            if r2(pos):
                w = w[:pos] + "log"
                std_ok = True
        elif act == "u":
            if r2(pos):
                w = w[:pos] + "u"
                std_ok = True
        elif act == "ent":
            if r2(pos):
                w = w[:pos] + "ent"
                std_ok = True
        elif act == "ement":
            if rv(pos):
                w = w[:pos]
                s2 = _longest(w, ("iv", "eus", "abl", "iqU",
                                  "ièr", "Ièr"))
                if s2 == "iv":
                    p = len(w) - 2
                    if r2(p):
                        w = w[:p]
                        if w.endswith("at"):
                            p = len(w) - 2
                            if r2(p):
                                w = w[:p]
                elif s2 == "eus":
                    p = len(w) - 3
                    if r2(p):
                        w = w[:p]
                    elif r1(p):
                        w = w[:p] + "eux"
                elif s2 in ("abl", "iqU"):
                    p = len(w) - 3
                    if r2(p):
                        w = w[:p]
                elif s2 in ("ièr", "Ièr"):
                    p = len(w) - 3
                    if rv(p):
                        w = w[:p] + "i"
                std_ok = True
        elif act == "ite":
            if r2(pos):
                w = w[:pos]
                s2 = _longest(w, ("abil", "ic", "iv"))
                if s2 == "abil":
                    p = len(w) - 4
                    w = w[:p] if r2(p) else w[:p] + "abl"
                elif s2 == "ic":
                    p = len(w) - 2
                    w = w[:p] if r2(p) else w[:p] + "iqU"
                elif s2 == "iv":
                    p = len(w) - 2
                    if r2(p):
                        w = w[:p]
                std_ok = True
        elif act == "if":
            if r2(pos):
                w = w[:pos]
                if w.endswith("at"):
                    p = len(w) - 2
                    if r2(p):
                        w = w[:p]
                        if w.endswith("ic"):
                            p = len(w) - 2
                            w = w[:p] if r2(p) else w[:p] + "iqU"
                std_ok = True
        elif act == "eaux":
            w = w[:pos] + "eau"
            std_ok = True
        elif act == "aux":
            if r1(pos):
                w = w[:pos] + "al"
                std_ok = True
        elif act == "euse":
            p = pos
            if r2(p):
                w = w[:p]
                std_ok = True
            elif r1(p):
                w = w[:p] + "eux"
                std_ok = True
        elif act == "issement":
            if r1(pos) and pos > 0 and w[pos - 1] not in _FR_V:
                w = w[:pos]
                std_ok = True
        elif act == "amment":
            if rv(pos):
                w = w[:pos] + "ant"
                word_changed = True  # fail() → fall through to verbs
        elif act == "emment":
            if rv(pos):
                w = w[:pos] + "ent"
                word_changed = True
        elif act == "ment":
            if pos > 0 and w[pos - 1] in _FR_V and rv(pos - 1):
                w = w[:pos]
                word_changed = True

    if std_ok:
        did = True
    else:
        # ---- i_verb_suffix (whole match incl. non-v within RV) ----------
        lim = w[pV:] if pV <= len(w) else ""
        suf = _longest(lim, _FR_IVERB)
        iverb_ok = False
        if suf:
            pos = len(w) - len(suf)
            if pos - 1 >= pV and w[pos - 1] not in _FR_V:
                w = w[:pos]
                iverb_ok = True
        if iverb_ok:
            did = True
        else:
            # ---- verb_suffix --------------------------------------------
            lim = w[pV:] if pV <= len(w) else ""
            suf = _longest(lim, ("ions",) + _FR_VERB2 + _FR_VERB3)
            if suf:
                pos = len(w) - len(suf)
                if suf == "ions":
                    if r2(pos):
                        w = w[:pos]
                        did = True
                elif suf in _FR_VERB2:
                    w = w[:pos]
                    did = True
                else:
                    w = w[:pos]
                    if w.endswith("e") and len(w) - 1 >= pV:
                        w = w[:-1]
                    did = True

    if did:
        # try(['Y'] ← 'i' or ['ç'] ← 'c') at the deletion point
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # residual_suffix runs when the verb chain failed (even if a
        # fail()-rule like amment→ant already rewrote the word)
        if w.endswith("s") and len(w) >= 2 \
                and w[-2] not in _FR_KEEP_S:
            w = w[:-1]
        lim = w[pV:] if pV <= len(w) else ""
        suf = _longest(lim, ("ion", "ier", "ière", "Ier", "Ière",
                             "e", "ë"))
        if suf:
            pos = len(w) - len(suf)
            if suf == "ion":
                if r2(pos) and pos - 1 >= pV \
                        and w[pos - 1] in "st":
                    w = w[:pos]
            elif suf in ("ier", "ière", "Ier", "Ière"):
                w = w[:pos] + "i"
            elif suf == "e":
                w = w[:pos]
            else:  # ë
                if w[:pos].endswith("gu"):
                    w = w[:pos]

    # un_double
    for d in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(d):
            w = w[:-1]
            break

    # un_accent: é/è followed only by ≥1 non-vowels at the end → e
    k = 0
    i = len(w) - 1
    while i >= 0 and w[i] not in _FR_V:
        k += 1
        i -= 1
    if k >= 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return (w.replace("I", "i").replace("U", "u").replace("Y", "y"))


# ---------------------------------------------------------------------------
# Spanish (spanish.sbl)
# ---------------------------------------------------------------------------

_ES_V = frozenset("aeiouáéíóúü")

_ES_PRON = ("me", "se", "sela", "selo", "selas", "selos", "la", "le",
            "lo", "las", "les", "los", "nos")
_ES_PRON_PRE_ACC = {"iéndo": "iendo", "ándo": "ando", "ár": "ar",
                    "ér": "er", "ír": "ir"}
_ES_PRON_PRE = ("ando", "iendo", "ar", "er", "ir")

_ES_STD1 = ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
            "ismos", "able", "ables", "ible", "ibles", "ista",
            "istas", "oso", "osa", "osos", "osas", "amiento",
            "amientos", "imiento", "imientos")
_ES_STD2 = ("adora", "ador", "ación", "adoras", "adores", "aciones",
            "ante", "antes", "ancia", "ancias")
_ES_VERB_GU = ("en", "es", "éis", "emos")
_ES_VERB = ("arían", "arías", "arán", "arás", "aríais", "aría",
            "aréis", "aríamos", "aremos", "ará", "aré",
            "erían", "erías", "erán", "erás", "eríais", "ería",
            "eréis", "eríamos", "eremos", "erá", "eré",
            "irían", "irías", "irán", "irás", "iríais", "iría",
            "iréis", "iríamos", "iremos", "irá", "iré",
            "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed",
            "id", "ase", "iese", "aste", "iste", "an", "aban", "ían",
            "aran", "ieran", "asen", "iesen", "aron", "ieron", "ado",
            "ido", "ando", "iendo", "ió", "ar", "er", "ir", "as",
            "abas", "adas", "idas", "ías", "aras", "ieras", "ases",
            "ieses", "ís", "áis", "abais", "íais", "arais",
            "ierais", "aseis", "ieseis", "asteis", "isteis", "ados",
            "idos", "amos", "ábamos", "íamos", "imos",
            "áramos", "iéramos", "iésemos", "ásemos")
_ES_YVERB = ("ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó",
             "yas", "yes", "yais", "yamos")


def spanish_stem(word: str) -> str:
    w = word
    n = len(w)

    # RV (spanish.sbl mark_regions)
    pV = n
    if n >= 2:
        if w[0] in _ES_V:
            if w[1] not in _ES_V:
                g = _gopast(w, 2, True, _ES_V)
                if g is not None:
                    pV = g
            else:
                g = _gopast(w, 2, False, _ES_V)
                if g is not None:
                    pV = g
        else:
            if w[1] not in _ES_V:
                g = _gopast(w, 2, True, _ES_V)
                if g is not None:
                    pV = g
            elif n >= 3:
                pV = 3
    p1, p2 = _std_r1r2(w, _ES_V)

    def rv(pos):
        return pos >= pV

    def r1(pos):
        return pos >= p1

    def r2(pos):
        return pos >= p2

    # ---- attached_pronoun ----------------------------------------------
    pron = _longest(w, _ES_PRON)
    if pron:
        base = w[: len(w) - len(pron)]
        pre = _longest(base, tuple(_ES_PRON_PRE_ACC) + _ES_PRON_PRE)
        if pre:
            pos = len(base) - len(pre)
            if rv(pos):
                if pre in _ES_PRON_PRE_ACC:
                    w = base[:pos] + _ES_PRON_PRE_ACC[pre]
                else:
                    w = base  # drop pronoun only
        elif base.endswith("yendo") and rv(len(base) - 5) \
                and base[: len(base) - 5].endswith("u"):
            w = base

    # ---- standard_suffix -------------------------------------------------
    did = False
    suf = _longest(w, _ES_STD1 + _ES_STD2
                   + ("logía", "logías", "ución", "uciones", "encia",
                      "encias", "amente", "mente", "idad", "idades",
                      "iva", "ivo", "ivas", "ivos"))
    if suf:
        pos = len(w) - len(suf)
        if suf in _ES_STD1:
            if r2(pos):
                w = w[:pos]
                did = True
        elif suf in _ES_STD2:
            if r2(pos):
                w = w[:pos]
                if w.endswith("ic"):
                    p = len(w) - 2
                    if r2(p):
                        w = w[:p]
                did = True
        elif suf in ("logía", "logías"):
            if r2(pos):
                w = w[:pos] + "log"
                did = True
        elif suf in ("ución", "uciones"):
            if r2(pos):
                w = w[:pos] + "u"
                did = True
        elif suf in ("encia", "encias"):
            if r2(pos):
                w = w[:pos] + "ente"
                did = True
        elif suf == "amente":
            if r1(pos):
                w = w[:pos]
                s2 = _longest(w, ("iv", "os", "ic", "ad"))
                if s2:
                    p = len(w) - 2
                    if r2(p):
                        w = w[:p]
                        if s2 == "iv" and w.endswith("at"):
                            p = len(w) - 2
                            if r2(p):
                                w = w[:p]
                did = True
        elif suf == "mente":
            if r2(pos):
                w = w[:pos]
                s2 = _longest(w, ("ante", "able", "ible"))
                if s2:
                    p = len(w) - 4
                    if r2(p):
                        w = w[:p]
                did = True
        elif suf in ("idad", "idades"):
            if r2(pos):
                w = w[:pos]
                s2 = _longest(w, ("abil", "ic", "iv"))
                if s2:
                    p = len(w) - len(s2)
                    if r2(p):
                        w = w[:p]
                did = True
        else:  # iva ivo ivas ivos
            if r2(pos):
                w = w[:pos]
                if w.endswith("at"):
                    p = len(w) - 2
                    if r2(p):
                        w = w[:p]
                did = True

    if not did:
        # ---- y_verb_suffix (suffix within RV; 'u' may be before) --------
        lim = w[pV:] if pV <= len(w) else ""
        suf = _longest(lim, _ES_YVERB)
        if suf and w[: len(w) - len(suf)].endswith("u"):
            w = w[: len(w) - len(suf)]
            did = True
        if not did:
            # ---- verb_suffix --------------------------------------------
            lim = w[pV:] if pV <= len(w) else ""
            suf = _longest(lim, _ES_VERB_GU + _ES_VERB)
            if suf:
                pos = len(w) - len(suf)
                if suf in _ES_VERB_GU and w[:pos].endswith("gu"):
                    w = w[: pos - 1]  # 'gu' before → drop the u too
                else:
                    w = w[:pos]
                did = True

    # ---- residual_suffix -------------------------------------------------
    suf = _longest(w, ("os", "a", "o", "á", "í", "ó", "e", "é"))
    if suf:
        pos = len(w) - len(suf)
        if suf in ("os", "a", "o", "á", "í", "ó"):
            if rv(pos):
                w = w[:pos]
        else:  # e é
            if rv(pos):
                w = w[:pos]
                if w.endswith("u") and len(w) - 1 >= pV \
                        and w[: len(w) - 1].endswith("g"):
                    w = w[:-1]

    return (w.replace("á", "a").replace("é", "e").replace("í", "i")
            .replace("ó", "o").replace("ú", "u"))


# ---------------------------------------------------------------------------
# registry (stem.cc:52-120 analog)
# ---------------------------------------------------------------------------

def stemmer_for(lang: str):
    """Language name/code → stem function (None for unknown/'none')."""
    from xapian_spark.analysis.porter2 import stem as porter2_stem

    return {
        "en": porter2_stem, "english": porter2_stem,
        "de": german_stem, "german": german_stem,
        "fr": french_stem, "french": french_stem,
        "es": spanish_stem, "spanish": spanish_stem,
    }.get(lang.lower())

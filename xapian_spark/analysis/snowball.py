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
    return _german_body(w)


def german2_stem(word: str) -> str:
    """german2.sbl: the german variant that also folds ae/oe/ue →
    ä/ö/ü (except after q) before the shared suffix steps."""
    ch = list(word)
    for i in range(1, len(ch) - 1):
        if ch[i] in "uy" and ch[i - 1] in _DE_V and ch[i + 1] in _DE_V:
            ch[i] = ch[i].upper()
    w = "".join(ch)
    out = []
    i = 0
    n = len(w)
    while i < n:
        two = w[i:i + 2]
        if w[i] == "ß":
            out.append("ss")
            i += 1
        elif two == "ae":
            out.append("ä")
            i += 2
        elif two == "oe":
            out.append("ö")
            i += 2
        elif two == "ue":
            out.append("ü")
            i += 2
        elif two == "qu":
            out.append(w[i:i + 4])  # 'qu' hop 2: next two chars raw
            i += 4
        else:
            out.append(w[i])
            i += 1
    return _german_body("".join(out))


def _german_body(w: str) -> str:
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
        "da": danish_stem, "danish": danish_stem,
        "nb": norwegian_stem, "nn": norwegian_stem,
        "no": norwegian_stem, "norwegian": norwegian_stem,
        "sv": swedish_stem, "swedish": swedish_stem,
        "it": italian_stem, "italian": italian_stem,
        "pt": portuguese_stem, "portuguese": portuguese_stem,
        "nl": dutch_stem, "dutch": dutch_stem,
        "ru": russian_stem, "russian": russian_stem,
        "ro": romanian_stem, "romanian": romanian_stem,
        "fi": finnish_stem, "finnish": finnish_stem,
        "hu": hungarian_stem, "hungarian": hungarian_stem,
        "tr": turkish_stem, "turkish": turkish_stem,
        "eu": basque_stem, "basque": basque_stem,
        "german2": german2_stem,
        "porter": porter_stem,
        "lovins": lovins_stem,
        "kraaij_pohlmann": kraaij_pohlmann_stem,
        "ca": catalan_stem, "catalan": catalan_stem,
        "hy": armenian_stem, "armenian": armenian_stem,
    }.get(lang.lower())


# ---------------------------------------------------------------------------
# Scandinavian trio (danish.sbl / norwegian.sbl / swedish.sbl)
# ---------------------------------------------------------------------------

_DA_V = frozenset("aeiouyæåø")
_SV_V = frozenset("aeiouyäåö")


def _scand_p1(w: str, vowels) -> int:
    """goto v, gopast non-v, clamped to >= 3 (the shared mark_regions
    of the three Scandinavian stemmers)."""
    p1 = _gopast(w, 0, True, vowels)
    p1 = _gopast(w, p1, False, vowels) if p1 is not None else None
    if p1 is None:
        return len(w)
    return max(p1, 3) if len(w) >= 3 else p1


def _lim_longest(w: str, p1: int, sufs):
    """Longest suffix among sufs lying entirely within [p1, end]
    (`setlimit tomark p1 for [substring]`)."""
    s = _longest(w[p1:] if p1 <= len(w) else "", sufs)
    return s


_DA_MAIN = ("hed", "ethed", "ered", "e", "erede", "ende", "erende",
            "ene", "erne", "ere", "en", "heden", "eren", "er", "heder",
            "erer", "heds", "es", "endes", "erendes", "enes", "ernes",
            "eres", "ens", "hedens", "erens", "ers", "ets", "erets",
            "et", "eret")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")


def _da_consonant_pair(w: str, p1: int) -> str:
    # ends with gd/dt/gt/kt within the region → drop the last char
    if _lim_longest(w, p1, ("gd", "dt", "gt", "kt")):
        return w[:-1]
    return w


def danish_stem(word: str) -> str:
    w = word
    p1 = _scand_p1(w, _DA_V)

    # main_suffix
    suf = _lim_longest(w, p1, _DA_MAIN + ("s",))
    if suf:
        if suf == "s":
            if len(w) >= 2 and w[-2] in _DA_S_END:
                w = w[:-1]
        else:
            w = w[: len(w) - len(suf)]

    w = _da_consonant_pair(w, p1)

    # other_suffix
    if w.endswith("igst"):
        w = w[:-2]  # ['st'] 'ig' delete (no region condition)
    suf = _lim_longest(w, p1, ("ig", "lig", "elig", "els", "løst"))
    if suf == "løst":
        w = w[:-1]
    elif suf:
        w = w[: len(w) - len(suf)]
        w = _da_consonant_pair(w, p1)

    # undouble: double non-vowel at the end (last char within region)
    if len(w) >= 2 and len(w) - 1 >= p1 and w[-1] not in _DA_V \
            and w[-1] == w[-2]:
        w = w[:-1]
    return w


_NO_MAIN = ("a", "e", "ede", "ande", "ende", "ane", "ene", "hetene",
            "en", "heten", "ar", "er", "heter", "as", "es", "edes",
            "endes", "enes", "hetenes", "ens", "hetens", "ers", "ets",
            "et", "het", "ast")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_NO_OTHER = ("leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov",
             "elov", "slov", "hetslov")


def norwegian_stem(word: str) -> str:
    w = word
    p1 = _scand_p1(w, _DA_V)

    suf = _lim_longest(w, p1, _NO_MAIN + ("s", "erte", "ert"))
    if suf:
        if suf == "s":
            ok = (len(w) >= 2 and w[-2] in _NO_S_END) or (
                len(w) >= 3 and w[-2] == "k" and w[-3] not in _DA_V)
            if ok:
                w = w[:-1]
        elif suf in ("erte", "ert"):
            w = w[: len(w) - len(suf)] + "er"
        else:
            w = w[: len(w) - len(suf)]

    if _lim_longest(w, p1, ("dt", "vt")):
        w = w[:-1]

    suf = _lim_longest(w, p1, _NO_OTHER)
    if suf:
        w = w[: len(w) - len(suf)]
    return w


_SV_MAIN = ("a", "arna", "erna", "heterna", "orna", "ad", "e", "ade",
            "ande", "arne", "are", "aste", "en", "anden", "aren",
            "heten", "ern", "ar", "er", "heter", "or", "as", "arnas",
            "ernas", "ornas", "es", "ades", "andes", "ens", "arens",
            "hetens", "erns", "at", "andet", "het", "ast")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")


def swedish_stem(word: str) -> str:
    w = word
    p1 = _scand_p1(w, _SV_V)

    suf = _lim_longest(w, p1, _SV_MAIN + ("s",))
    if suf:
        if suf == "s":
            if len(w) >= 2 and w[-2] in _SV_S_END:
                w = w[:-1]
        else:
            w = w[: len(w) - len(suf)]

    if _lim_longest(w, p1, ("dd", "gd", "nn", "dt", "gt", "kt", "tt")):
        w = w[:-1]

    suf = _lim_longest(w, p1, ("lig", "ig", "els", "löst", "fullt"))
    if suf == "löst":
        w = w[:-1]
    elif suf == "fullt":
        w = w[:-1]
    elif suf:
        w = w[: len(w) - len(suf)]
    return w


# ---------------------------------------------------------------------------
# Italian (italian.sbl)
# ---------------------------------------------------------------------------

_IT_V = frozenset("aeiouàèìòù")

_IT_PRON = ("ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si",
            "ti", "vi", "sene", "gliela", "gliele", "glieli", "glielo",
            "gliene", "mela", "mele", "meli", "melo", "mene", "tela",
            "tele", "teli", "telo", "tene", "cela", "cele", "celi",
            "celo", "cene", "vela", "vele", "veli", "velo", "vene")

_IT_STD1 = ("anza", "anze", "ico", "ici", "ica", "ice", "iche",
            "ichi", "ismo", "ismi", "abile", "abili", "ibile",
            "ibili", "ista", "iste", "isti", "istà", "istè", "istì",
            "oso", "osi", "osa", "ose", "mente", "atrice", "atrici",
            "ante", "anti")
_IT_STD2 = ("azione", "azioni", "atore", "atori")
_IT_VERB = ("ammo", "ando", "ano", "are", "arono", "asse", "assero",
            "assi", "assimo", "ata", "ate", "ati", "ato", "ava",
            "avamo", "avano", "avate", "avi", "avo", "emmo", "enda",
            "ende", "endi", "endo", "erà", "erai", "eranno", "ere",
            "erebbe", "erebbero", "erei", "eremmo", "eremo", "ereste",
            "eresti", "erete", "erò", "erono", "essero", "ete", "eva",
            "evamo", "evano", "evate", "evi", "evo", "Yamo", "iamo",
            "immo", "irà", "irai", "iranno", "ire", "irebbe",
            "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
            "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
            "isco", "iscono", "issero", "ita", "ite", "iti", "ito",
            "iva", "ivamo", "ivano", "ivate", "ivi", "ivo", "ono",
            "uta", "ute", "uti", "uto", "ar", "ir")


def _it_prelude(word: str) -> str:
    w = (word.replace("á", "à").replace("é", "è").replace("í", "ì")
         .replace("ó", "ò").replace("ú", "ù").replace("qu", "qU"))
    ch = list(w)
    n = len(ch)
    i = 0
    while i < n:
        if ch[i] in _IT_V and i + 2 < n and ch[i + 1] in "ui" \
                and ch[i + 2] in _IT_V:
            ch[i + 1] = ch[i + 1].upper()
            i += 2  # cursor at end of replaced region
            continue
        i += 1
    return "".join(ch)


def italian_stem(word: str) -> str:
    w = _it_prelude(word)
    n = len(w)

    # RV (same scheme as spanish)
    pV = n
    if n >= 2:
        if w[0] in _IT_V:
            if w[1] not in _IT_V:
                g = _gopast(w, 2, True, _IT_V)
                if g is not None:
                    pV = g
            else:
                g = _gopast(w, 2, False, _IT_V)
                if g is not None:
                    pV = g
        else:
            if w[1] not in _IT_V:
                g = _gopast(w, 2, True, _IT_V)
                if g is not None:
                    pV = g
            elif n >= 3:
                pV = 3
    p1, p2 = _std_r1r2(w, _IT_V)

    def rv(pos):
        return pos >= pV

    def r1(pos):
        return pos >= p1

    def r2(pos):
        return pos >= p2

    # attached_pronoun
    pron = _longest(w, _IT_PRON)
    if pron:
        base = w[: len(w) - len(pron)]
        pre = _longest(base, ("ando", "endo", "ar", "er", "ir"))
        if pre and rv(len(base) - len(pre)):
            if pre in ("ando", "endo"):
                w = base
            else:
                w = base + "e"

    # standard_suffix / verb_suffix
    did = False
    suf = _longest(w, _IT_STD1 + _IT_STD2
                   + ("logia", "logie", "uzione", "uzioni", "usione",
                      "usioni", "enza", "enze", "amento", "amenti",
                      "imento", "imenti", "amente", "ità", "ivo",
                      "ivi", "iva", "ive"))
    if suf:
        pos = len(w) - len(suf)
        if suf in _IT_STD1:
            if r2(pos):
                w = w[:pos]
                did = True
        elif suf in _IT_STD2:
            if r2(pos):
                w = w[:pos]
                if w.endswith("ic"):
                    p = len(w) - 2
                    if r2(p):
                        w = w[:p]
                did = True
        elif suf in ("logia", "logie"):
            if r2(pos):
                w = w[:pos] + "log"
                did = True
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if r2(pos):
                w = w[:pos] + "u"
                did = True
        elif suf in ("enza", "enze"):
            if r2(pos):
                w = w[:pos] + "ente"
                did = True
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if rv(pos):
                w = w[:pos]
                did = True
        elif suf == "amente":
            if r1(pos):
                w = w[:pos]
                s2 = _longest(w, ("iv", "os", "ic", "abil"))
                if s2:
                    p = len(w) - len(s2)
                    if r2(p):
                        w = w[:p]
                        if s2 == "iv" and w.endswith("at"):
                            p = len(w) - 2
                            if r2(p):
                                w = w[:p]
                did = True
        elif suf == "ità":
            if r2(pos):
                w = w[:pos]
                s2 = _longest(w, ("abil", "ic", "iv"))
                if s2:
                    p = len(w) - len(s2)
                    if r2(p):
                        w = w[:p]
                did = True
        else:  # ivo ivi iva ive
            if r2(pos):
                w = w[:pos]
                if w.endswith("at"):
                    p = len(w) - 2
                    if r2(p):
                        w = w[:p]
                        if w.endswith("ic"):
                            p = len(w) - 2
                            if r2(p):
                                w = w[:p]
                did = True

    if not did:
        lim = w[pV:] if pV <= len(w) else ""
        suf = _longest(lim, _IT_VERB)
        if suf:
            w = w[: len(w) - len(suf)]

    # vowel_suffix
    if w and w[-1] in "aeioàèìò" and rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and rv(len(w) - 1):
            w = w[:-1]
    if w.endswith("h") and len(w) >= 2 and w[-2] in "cg" \
            and rv(len(w) - 2):
        # RV tests the cursor AFTER consuming the CG char — the c/g
        # position, not the h ('buche' keeps its h when c is pre-RV)
        w = w[:-1]

    return (w.replace("I", "i").replace("U", "u"))


# ---------------------------------------------------------------------------
# Portuguese (portuguese.sbl)
# ---------------------------------------------------------------------------

# the prelude rewrites ã→"a~", õ→"o~" (and postlude restores), so the
# regions and all suffix matching run on the two-char forms
_PT_V = frozenset("aeiouáéíóúâêô")

_PT_STD1 = ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
            "ismos", "ável", "ível", "ista", "istas", "oso", "osa",
            "osos", "osas", "amento", "amentos", "imento", "imentos",
            "adora", "ador", "aça~o", "adoras", "adores", "aço~es",
            "ante", "antes", "ância")
_PT_VERB = ("ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara",
            "erá", "era", "irá", "ava", "asse", "esse", "isse",
            "aste", "este", "iste", "ei", "arei", "erei", "irei",
            "am", "iam", "ariam", "eriam", "iriam", "aram", "eram",
            "iram", "avam", "em", "arem", "erem", "irem", "assem",
            "essem", "issem", "ado", "ido", "ando", "endo", "indo",
            "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as",
            "adas", "idas", "ias", "arias", "erias", "irias", "arás",
            "aras", "erás", "eras", "irás", "avas", "es", "ardes",
            "erdes", "irdes", "ares", "eres", "ires", "asses",
            "esses", "isses", "astes", "estes", "istes", "is", "ais",
            "eis", "íeis", "aríeis", "eríeis", "iríeis", "áreis",
            "areis", "éreis", "ereis", "íreis", "ireis", "ásseis",
            "ésseis", "ísseis", "áveis", "ados", "idos", "ámos",
            "amos", "íamos", "aríamos", "eríamos", "iríamos",
            "áramos", "éramos", "íramos", "ávamos", "emos", "aremos",
            "eremos", "iremos", "ássemos", "êssemos", "íssemos",
            "imos", "armos", "ermos", "irmos", "eu", "iu", "ou",
            "ira", "iras")


def portuguese_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    n = len(w)

    # RV (spanish scheme) on the transformed string
    pV = n
    if n >= 2:
        if w[0] in _PT_V:
            if w[1] not in _PT_V:
                g = _gopast(w, 2, True, _PT_V)
                if g is not None:
                    pV = g
            else:
                g = _gopast(w, 2, False, _PT_V)
                if g is not None:
                    pV = g
        else:
            if w[1] not in _PT_V:
                g = _gopast(w, 2, True, _PT_V)
                if g is not None:
                    pV = g
            elif n >= 3:
                pV = 3
    p1, p2 = _std_r1r2(w, _PT_V)

    def rv(pos):
        return pos >= pV

    def r1(pos):
        return pos >= p1

    def r2(pos):
        return pos >= p2

    did = False
    suf = _longest(w, _PT_STD1
                   + ("logía", "logías", "ución", "uciones", "ência",
                      "ências", "amente", "mente", "idade", "idades",
                      "iva", "ivo", "ivas", "ivos", "ira", "iras"))
    if suf:
        pos = len(w) - len(suf)
        if suf in _PT_STD1:
            if r2(pos):
                w = w[:pos]
                did = True
        elif suf in ("logía", "logías"):
            if r2(pos):
                w = w[:pos] + "log"
                did = True
        elif suf in ("ución", "uciones"):
            if r2(pos):
                w = w[:pos] + "u"
                did = True
        elif suf in ("ência", "ências"):
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
                s2 = _longest(w, ("ante", "avel", "ível"))
                if s2:
                    p = len(w) - len(s2)
                    if r2(p):
                        w = w[:p]
                did = True
        elif suf in ("idade", "idades"):
            if r2(pos):
                w = w[:pos]
                s2 = _longest(w, ("abil", "ic", "iv"))
                if s2:
                    p = len(w) - len(s2)
                    if r2(p):
                        w = w[:p]
                did = True
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if r2(pos):
                w = w[:pos]
                if w.endswith("at"):
                    p = len(w) - 2
                    if r2(p):
                        w = w[:p]
                did = True
        else:  # ira iras: non-verbal -eira(s)
            if rv(pos) and pos > 0 and w[pos - 1] == "e":
                w = w[:pos] + "ir"
                did = True

    if not did:
        lim = w[pV:] if pV <= len(w) else ""
        suf = _longest(lim, _PT_VERB)
        if suf:
            w = w[: len(w) - len(suf)]
            did = True

    if did:
        # do ( ['i'] test 'c' RV delete )
        if w.endswith("i") and len(w) >= 2 and w[-2] == "c" \
                and rv(len(w) - 1):
            w = w[:-1]
    else:
        suf = _longest(w, ("os", "a", "i", "o", "á", "í", "ó"))
        if suf:
            pos = len(w) - len(suf)
            if rv(pos):
                w = w[:pos]

    # residual_form
    suf = _longest(w, ("e", "é", "ê"))
    if suf and rv(len(w) - 1):
        w = w[:-1]
        if ((w.endswith("u") and len(w) >= 2 and w[-2] == "g")
                or (w.endswith("i") and len(w) >= 2
                    and w[-2] == "c")) and rv(len(w) - 1):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Dutch (dutch.sbl)
# ---------------------------------------------------------------------------

_NL_V = frozenset("aeiouyè")
_NL_ACCENTS = str.maketrans("äáëéïíöóüú", "aaeeiioouu")


def _nl_prelude(word: str) -> str:
    w = word.translate(_NL_ACCENTS)
    ch = list(w)
    n = len(ch)
    if ch and ch[0] == "y":
        ch[0] = "Y"
    i = 0
    while i < n:
        if ch[i] in _NL_V and i + 1 < n:
            if ch[i + 1] == "i" and i + 2 < n and ch[i + 2] in _NL_V:
                ch[i + 1] = "I"
                i += 2
                continue
            if ch[i + 1] == "y":
                ch[i + 1] = "Y"
                i += 2
                continue
        i += 1
    return "".join(ch)


def dutch_stem(word: str) -> str:
    w = _nl_prelude(word)

    p1, p2 = _std_r1r2(w, _NL_V)
    p1 = max(p1, 3)

    def r1(pos):
        return pos >= p1

    def r2(pos):
        return pos >= p2

    state = {"e_found": False}

    def undouble(s: str) -> str:
        return s[:-1] if s.endswith(("kk", "dd", "tt")) else s

    def en_ending(s: str, nsuf: int):
        pos = len(s) - nsuf
        if r1(pos) and pos > 0 and s[pos - 1] not in _NL_V \
                and not s[:pos].endswith("gem"):
            return undouble(s[:pos])
        return None

    def e_ending(s: str) -> str:
        if s.endswith("e") and r1(len(s) - 1) and len(s) >= 2 \
                and s[-2] not in _NL_V:
            state["e_found"] = True
            return undouble(s[:-1])
        return s

    # step 1
    suf = _longest(w, ("heden", "en", "ene", "s", "se"))
    if suf:
        pos = len(w) - len(suf)
        if suf == "heden":
            if r1(pos):
                w = w[:pos] + "heid"
        elif suf in ("en", "ene"):
            res = en_ending(w, len(suf))
            if res is not None:
                w = res
        else:  # s se
            if r1(pos) and pos > 0 and w[pos - 1] not in _NL_V \
                    and w[pos - 1] != "j":
                w = w[:pos]

    # step 2
    w = e_ending(w)

    # step 3a: heid (then en_ending on the rest) — sequential
    if w.endswith("heid") and r2(len(w) - 4) \
            and not w[: len(w) - 4].endswith("c"):
        w = w[:-4]
        if w.endswith("en"):
            res = en_ending(w, 2)
            if res is not None:
                w = res

    # step 3b (d-suffixes)
    suf = _longest(w, ("end", "ing", "ig", "lijk", "baar", "bar"))
    if suf:
        pos = len(w) - len(suf)
        if suf in ("end", "ing"):
            if r2(pos):
                w = w[:pos]
                if w.endswith("ig") and r2(len(w) - 2) \
                        and not w[: len(w) - 2].endswith("e"):
                    w = w[:-2]
                else:
                    w = undouble(w)
        elif suf == "ig":
            if r2(pos) and not w[:pos].endswith("e"):
                w = w[:pos]
        elif suf == "lijk":
            if r2(pos):
                w = e_ending(w[:pos])
        elif suf == "baar":
            if r2(pos):
                w = w[:pos]
        else:  # bar
            if r2(pos) and state["e_found"]:
                w = w[:pos]

    # step 4: undouble vowel (CVVC at end → CVC)
    if len(w) >= 4 and w[-1] not in _NL_V and w[-1] != "I" \
            and w[-3:-1] in ("aa", "ee", "oo", "uu") \
            and w[-4] not in _NL_V:
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# ---------------------------------------------------------------------------
# Russian (russian.sbl)
# ---------------------------------------------------------------------------

_RU_V = frozenset("аеиоуыэюя")

_RU_PG_AY = ("в", "вши", "вшись")
_RU_PG = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJ = ("ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый",
           "ой", "ем", "им", "ым", "ом", "его", "ого", "ему", "ому",
           "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PART_AY = ("ем", "нн", "вш", "ющ", "щ")
_RU_PART = ("ивш", "ывш", "ующ")
_RU_VERB_AY = ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
               "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно")
_RU_VERB = ("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли",
            "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
            "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить",
            "ыть", "ишь", "ую", "ю")
_RU_NOUN = ("а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами",
            "еи", "ии", "и", "ией", "ей", "ой", "ий", "й", "иям",
            "ям", "ием", "ем", "ам", "ом", "о", "у", "ах", "иях",
            "ях", "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я")


def russian_stem(word: str) -> str:
    w = word
    pV = _gopast(w, 0, True, _RU_V)
    if pV is None:
        return w
    _p1, p2 = _std_r1r2(w, _RU_V)

    def lim(pos):
        return pos >= pV

    def try_del_ay(s, sufs_ay, sufs_plain):
        """Longest among both groups; the _ay group also needs а/я
        immediately before (within the pV limit). Returns the stemmed
        string or None when the among fails."""
        suf = _longest(s[pV:], sufs_ay + sufs_plain)
        if not suf:
            return None
        pos = len(s) - len(suf)
        # the longest match might be in either group
        in_ay = suf in sufs_ay and not (suf in sufs_plain)
        if suf in sufs_ay and suf in sufs_plain:
            in_ay = False
        if in_ay:
            if pos - 1 >= pV and s[pos - 1] in "ая":
                return s[:pos]
            return None
        return s[:pos]

    # perfective_gerund OR (try reflexive; adjectival|verb|noun)
    res = try_del_ay(w, _RU_PG_AY, _RU_PG)
    if res is not None:
        w = res
    else:
        # try reflexive
        suf = _longest(w[pV:], ("ся", "сь"))
        if suf:
            w = w[: len(w) - len(suf)]
        # adjectival
        suf = _longest(w[pV:], _RU_ADJ)
        if suf:
            w = w[: len(w) - len(suf)]
            res = try_del_ay(w, _RU_PART_AY, _RU_PART)
            if res is not None:
                w = res
        else:
            res = try_del_ay(w, _RU_VERB_AY, _RU_VERB)
            if res is not None:
                w = res
            else:
                suf = _longest(w[pV:], _RU_NOUN)
                if suf:
                    w = w[: len(w) - len(suf)]

    # try final 'и'
    if w.endswith("и") and lim(len(w) - 1):
        w = w[:-1]

    # derivational: ост/ость in R2
    suf = _longest(w[pV:], ("ост", "ость"))
    if suf and (len(w) - len(suf)) >= p2:
        w = w[: len(w) - len(suf)]

    # tidy_up
    suf = _longest(w[pV:], ("ейш", "ейше", "н", "ь"))
    if suf in ("ейш", "ейше"):
        w = w[: len(w) - len(suf)]
        if w.endswith("нн") and lim(len(w) - 1):
            w = w[:-1]
    elif suf == "н":
        if w.endswith("нн") and lim(len(w) - 1):
            w = w[:-1]
    elif suf == "ь":
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Romanian (romanian.sbl)
# ---------------------------------------------------------------------------

_RO_V = frozenset("aeiouâîă")

_RO_STEP0 = {**{s: "" for s in ("ul", "ului")},
             "aua": "a",
             **{s: "e" for s in ("ea", "ele", "elor")},
             **{s: "i" for s in ("ii", "iua", "iei", "iile", "iilor",
                                 "ilor")},
             "ile": "i",  # (not 'ab')
             "atei": "at", "aţie": "aţi", "aţia": "aţi"}

_RO_COMBO = {}
for _s in ("abilitate", "abilitati", "abilităi", "abilităţi"):
    _RO_COMBO[_s] = "abil"
_RO_COMBO["ibilitate"] = "ibil"
for _s in ("ivitate", "ivitati", "ivităi", "ivităţi"):
    _RO_COMBO[_s] = "iv"
for _s in ("icitate", "icitati", "icităi", "icităţi", "icator",
           "icatori", "iciv", "iciva", "icive", "icivi", "icivă",
           "ical", "icala", "icale", "icali", "icală"):
    _RO_COMBO[_s] = "ic"
for _s in ("ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
           "atoare", "ator", "atori", "ătoare", "ător", "ători"):
    _RO_COMBO[_s] = "at"
for _s in ("itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
           "itoare", "itor", "itori"):
    _RO_COMBO[_s] = "it"

_RO_STD_DEL = ("at", "ata", "ată", "ati", "ate", "ut", "uta", "ută",
               "uti", "ute", "it", "ita", "ită", "iti", "ite", "ic",
               "ica", "ice", "ici", "ică", "abil", "abila", "abile",
               "abili", "abilă", "ibil", "ibila", "ibile", "ibili",
               "ibilă", "oasa", "oasă", "oase", "os", "osi", "oşi",
               "ant", "anta", "ante", "anti", "antă", "ator", "atori",
               "itate", "itati", "ităi", "ităţi", "iv", "iva", "ive",
               "ivi", "ivă")
_RO_STD_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă",
               "işti")

_RO_VERB_COND = ("are", "ere", "ire", "âre", "ind", "ând", "indu",
                 "ându", "eze", "ească", "ez", "ezi", "ează", "esc",
                 "eşti", "eşte", "ăsc", "ăşti", "ăşte", "am", "ai",
                 "au", "eam", "eai", "ea", "eaţi", "eau", "iam",
                 "iai", "ia", "iaţi", "iau", "ui", "aşi", "arăm",
                 "arăţi", "ară", "uşi", "urăm", "urăţi", "ură",
                 "işi", "irăm", "irăţi", "iră", "âi", "âşi", "ârăm",
                 "ârăţi", "âră", "asem", "aseşi", "ase", "aserăm",
                 "aserăţi", "aseră", "isem", "iseşi", "ise",
                 "iserăm", "iserăţi", "iseră", "âsem", "âseşi",
                 "âse", "âserăm", "âserăţi", "âseră", "usem",
                 "useşi", "use", "userăm", "userăţi", "useră")
_RO_VERB_PLAIN = ("ăm", "aţi", "em", "eţi", "im", "iţi", "âm",
                  "âţi", "seşi", "serăm", "serăţi", "seră", "sei",
                  "se", "sesem", "seseşi", "sese", "seserăm",
                  "seserăţi", "seseră")


def romanian_stem(word: str) -> str:
    # prelude: u/i between vowels → U/I
    ch = list(word)
    n = len(ch)
    i = 0
    while i < n:
        if ch[i] in _RO_V and i + 2 < n and ch[i + 1] in "ui" \
                and ch[i + 2] in _RO_V:
            ch[i + 1] = ch[i + 1].upper()
            i += 2
            continue
        i += 1
    w = "".join(ch)
    n = len(w)

    pV = n
    if n >= 2:
        if w[0] in _RO_V:
            if w[1] not in _RO_V:
                g = _gopast(w, 2, True, _RO_V)
                if g is not None:
                    pV = g
            else:
                g = _gopast(w, 2, False, _RO_V)
                if g is not None:
                    pV = g
        else:
            if w[1] not in _RO_V:
                g = _gopast(w, 2, True, _RO_V)
                if g is not None:
                    pV = g
            elif n >= 3:
                pV = 3
    p1, p2 = _std_r1r2(w, _RO_V)

    def rv(pos):
        return pos >= pV

    def r1(pos):
        return pos >= p1

    def r2(pos):
        return pos >= p2

    # step_0
    suf = _longest(w, _RO_STEP0)
    if suf:
        pos = len(w) - len(suf)
        if r1(pos) and not (suf == "ile" and w[:pos].endswith("ab")):
            w = w[:pos] + _RO_STEP0[suf]

    # standard_suffix: repeat combo, then the R2 among
    removed = False
    while True:
        suf = _longest(w, _RO_COMBO)
        if not suf:
            break
        pos = len(w) - len(suf)
        if not r1(pos):
            break
        w = w[:pos] + _RO_COMBO[suf]
        removed = True
    suf = _longest(w, _RO_STD_DEL + _RO_STD_IST + ("iune", "iuni"))
    if suf:
        pos = len(w) - len(suf)
        if r2(pos):
            if suf in ("iune", "iuni"):
                if pos > 0 and w[pos - 1] == "ţ":
                    w = w[: pos - 1] + "t"
                    removed = True
            elif suf in _RO_STD_IST:
                w = w[:pos] + "ist"
                removed = True
            else:
                w = w[:pos]
                removed = True

    # verb_suffix only when no standard suffix was removed
    if not removed:
        lim = w[pV:] if pV <= len(w) else ""
        suf = _longest(lim, _RO_VERB_COND + _RO_VERB_PLAIN)
        if suf:
            pos = len(w) - len(suf)
            if suf in _RO_VERB_PLAIN and not (suf in _RO_VERB_COND):
                w = w[:pos]
            else:
                # the (non-v or 'u') pre-check runs INSIDE the pV
                # setlimit: the tested char must also be >= pV
                if pos - 1 >= pV and (w[pos - 1] not in _RO_V
                                      or w[pos - 1] == "u"):
                    w = w[:pos]

    # vowel_suffix
    suf = _longest(w, ("a", "e", "i", "ie", "ă"))
    if suf and rv(len(w) - len(suf)):
        w = w[: len(w) - len(suf)]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Finnish (finnish.sbl)
# ---------------------------------------------------------------------------

_FI_V1 = frozenset("aeiouyäö")
_FI_V2 = frozenset("aeiouäö")
_FI_PARTICLE_END = frozenset("aeiouyäönt")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")


def finnish_stem(word: str) -> str:
    w = word
    p1 = _gopast(w, 0, True, _FI_V1)
    p1 = _gopast(w, p1, False, _FI_V1) if p1 is not None else None
    if p1 is None:
        p1 = len(w)
        p2 = len(w)
    else:
        p2 = _gopast(w, p1, True, _FI_V1)
        p2 = _gopast(w, p2, False, _FI_V1) if p2 is not None else None
        if p2 is None:
            p2 = len(w)

    def in1(pos):
        return pos >= p1

    def in2(pos):
        return pos >= p2

    ending_removed = False

    # particle_etc
    suf = _longest(w[p1:], ("kin", "kaan", "kään", "ko", "kö", "han",
                            "hän", "pa", "pä", "sti"))
    if suf:
        pos = len(w) - len(suf)
        if suf == "sti":
            if in2(pos):
                w = w[:pos]
        else:
            if pos > 0 and w[pos - 1] in _FI_PARTICLE_END:
                w = w[:pos]

    # possessive
    suf = _longest(w[p1:], ("si", "ni", "nsa", "nsä", "mme", "nne",
                            "an", "än", "en"))
    if suf:
        pos = len(w) - len(suf)
        base = w[:pos]
        if suf == "si":
            if not base.endswith("k"):
                w = base
        elif suf == "ni":
            w = base
            if w.endswith("kse"):
                w = w[:-3] + "ksi"
        elif suf in ("nsa", "nsä", "mme", "nne"):
            w = base
        elif suf == "an":
            if base.endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                w = base
        elif suf == "än":
            if base.endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                w = base
        else:  # en
            if base.endswith(("lle", "ine")):
                w = base

    def vi(base):
        return (base.endswith("i") and len(base) >= 2
                and base[-2] in _FI_V2)

    # case_ending. siin/seen/den/tten carry BARE routine conditions
    # (VI / LONG) in the sbl: a bare routine is tested at MATCH time
    # and its failure makes the among fall back to a shorter entry —
    # unlike parenthesized commands, whose failure fails the among.
    _CASES = ["han", "hen", "hin", "hon", "hän", "hön", "siin",
              "seen", "den", "tten", "n", "a", "ä", "tta", "ttä",
              "ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä",
              "lta", "ltä", "lle", "na", "nä", "ksi", "ine"]
    suf = _longest(w[p1:], _CASES)
    while suf in ("siin", "seen", "den", "tten"):
        pos = len(w) - len(suf)
        base = w[:pos]
        cond = (base.endswith(_FI_LONG) if suf == "seen"
                else vi(base))
        if cond:
            break
        _CASES.remove(suf)
        suf = _longest(w[p1:], _CASES)
    if suf:
        pos = len(w) - len(suf)
        base = w[:pos]
        ok = True
        extra = 0
        if suf in ("han", "hen", "hin", "hon", "hän", "hön"):
            ok = base.endswith(
                {"han": "a", "hen": "e", "hin": "i", "hon": "o",
                 "hän": "ä", "hön": "ö"}[suf])
        elif suf in ("siin", "den", "tten"):
            ok = vi(base)
        elif suf == "seen":
            ok = base.endswith(_FI_LONG)
        elif suf == "n":
            if base.endswith(_FI_LONG) or base.endswith("ie"):
                extra = 1  # the 'n' takes the preceding char with it
        elif suf in ("a", "ä"):
            ok = (len(base) >= 2 and base[-1] in _FI_V1
                  and base[-2] not in _FI_V1)
        elif suf in ("tta", "ttä"):
            ok = base.endswith("e")
        if ok:
            w = w[: pos - extra]
            ending_removed = True

    # other_endings (R2)
    suf = _longest(w[p2:], ("mpi", "mpa", "mpä", "mmi", "mma", "mmä",
                            "impi", "impa", "impä", "immi", "imma",
                            "immä", "eja", "ejä"))
    if suf:
        pos = len(w) - len(suf)
        if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä") \
                and w[:pos].endswith("po"):
            pass
        else:
            w = w[:pos]

    # (ending_removed → i_plural) or t_plural
    if ending_removed:
        if w and w[-1] in "ij" and in1(len(w) - 1):
            w = w[:-1]
    else:
        if w.endswith("t") and in1(len(w) - 1) and len(w) >= 2 \
                and w[-2] in _FI_V1:
            w = w[:-1]
            suf = _longest(w[p2:], ("mma", "imma"))
            if suf == "imma":
                w = w[: len(w) - 4]
            elif suf == "mma" and not w[: len(w) - 3].endswith("po"):
                w = w[: len(w) - 3]

    # tidy
    if len(w) >= 2 and in1(len(w) - 2) and w[-2:] in _FI_LONG:
        w = w[:-1]
    if w and w[-1] in "aäei" and in1(len(w) - 1) and len(w) >= 2 \
            and w[-2] not in _FI_V1 and in1(len(w) - 2):
        w = w[:-1]
    if w.endswith("oj") or w.endswith("uj"):
        if in1(len(w) - 1) and in1(len(w) - 2):
            w = w[:-1]
    if w.endswith("jo") and in1(len(w) - 1) and in1(len(w) - 2):
        w = w[:-1]
    # undouble the last consonant (anywhere in the word)
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_V1:
        i -= 1
    if i >= 1 and w[i - 1] == w[i]:
        w = w[: i] + w[i + 1:]
    return w


# ---------------------------------------------------------------------------
# Hungarian (hungarian.sbl)
# ---------------------------------------------------------------------------

_HU_V = frozenset("aeiouáéíóöõúüû")
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs", "bb",
               "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
               "pp", "rr", "ss", "tt", "vv", "zz")

_HU_CASE = ("ban", "ben", "ba", "be", "ra", "re", "nak", "nek",
            "val", "vel", "tól", "tõl", "ról", "rõl", "ból", "bõl",
            "hoz", "hez", "höz", "nál", "nél", "ig", "at", "et",
            "ot", "öt", "ért", "képp", "képpen", "kor", "ul", "ül",
            "vá", "vé", "onként", "enként", "anként", "ként", "en",
            "on", "an", "ön", "n", "t")


def hungarian_stem(word: str) -> str:
    w = word
    n = len(w)

    # mark_regions
    p1 = n
    if n and w[0] in _HU_V:
        i = 0
        while i < n and w[i] in _HU_V:
            i += 1
        if i < n:
            for d in _HU_DIGRAPHS:
                if w.startswith(d, i):
                    p1 = i + len(d)
                    break
            else:
                p1 = i + 1
    elif n:
        g = _gopast(w, 0, True, _HU_V)
        if g is not None:
            p1 = g

    def r1(pos):
        return pos >= p1

    def v_ending(s):
        if s.endswith("á") and r1(len(s) - 1):
            return s[:-1] + "a"
        if s.endswith("é") and r1(len(s) - 1):
            return s[:-1] + "e"
        return s

    def undouble(s):
        return s[:-2] + s[-1] if len(s) >= 2 else s

    # instrum: al/el preceded by a double consonant
    suf = _longest(w, ("al", "el"))
    if suf and r1(len(w) - 2) and w[: -2].endswith(_HU_DOUBLES):
        w = undouble(w[:-2])

    # case
    suf = _longest(w, _HU_CASE)
    if suf and r1(len(w) - len(suf)):
        w = v_ending(w[: len(w) - len(suf)])

    # case_special
    suf = _longest(w, ("én", "án", "ánként"))
    if suf and r1(len(w) - len(suf)):
        w = w[: len(w) - len(suf)] + ("a" if suf in ("án", "ánként")
                                      else "e")

    # case_other
    suf = _longest(w, ("astul", "estül", "stul", "stül", "ástul",
                       "éstül"))
    if suf and r1(len(w) - len(suf)):
        base = w[: len(w) - len(suf)]
        if suf == "ástul":
            w = base + "a"
        elif suf == "éstül":
            w = base + "e"
        else:
            w = base

    # factive: á/é preceded by a double consonant
    suf = _longest(w, ("á", "é"))
    if suf and r1(len(w) - 1) and w[:-1].endswith(_HU_DOUBLES):
        w = undouble(w[:-1])

    # owned
    _OWNED = {"oké": "", "öké": "", "aké": "", "eké": "", "éké": "e",
              "áké": "a", "ké": "", "ééi": "e", "áéi": "a", "éi": "",
              "éé": "e", "é": ""}
    suf = _longest(w, _OWNED)
    if suf and r1(len(w) - len(suf)):
        w = w[: len(w) - len(suf)] + _OWNED[suf]

    # sing_owner
    _SING = {"ünk": "", "unk": "", "ánk": "a", "énk": "e", "nk": "",
             "ájuk": "a", "éjük": "e", "juk": "", "jük": "",
             "uk": "", "ük": "", "em": "", "om": "", "am": "",
             "ám": "a", "ém": "e", "m": "", "od": "", "ed": "",
             "ad": "", "öd": "", "ád": "a", "éd": "e", "d": "",
             "ja": "", "je": "", "a": "", "e": "", "o": "",
             "á": "a", "é": "e"}
    suf = _longest(w, _SING)
    if suf and r1(len(w) - len(suf)):
        w = w[: len(w) - len(suf)] + _SING[suf]

    # plur_owner
    _PLUR = {"jaim": "", "jeim": "", "áim": "a", "éim": "e",
             "aim": "", "eim": "", "im": "", "jaid": "", "jeid": "",
             "áid": "a", "éid": "e", "aid": "", "eid": "", "id": "",
             "jai": "", "jei": "", "ái": "a", "éi": "e", "ai": "",
             "ei": "", "i": "", "jaink": "", "jeink": "", "eink": "",
             "aink": "", "áink": "a", "éink": "e", "ink": "",
             "jaitok": "", "jeitek": "", "aitok": "", "eitek": "",
             "áitok": "a", "éitek": "e", "itek": "", "jeik": "",
             "jaik": "", "aik": "", "eik": "", "áik": "a",
             "éik": "e", "ik": ""}
    suf = _longest(w, _PLUR)
    if suf and r1(len(w) - len(suf)):
        w = w[: len(w) - len(suf)] + _PLUR[suf]

    # plural
    _PL = {"ák": "a", "ék": "e", "ök": "", "ak": "", "ok": "",
           "ek": "", "k": ""}
    suf = _longest(w, _PL)
    if suf and r1(len(w) - len(suf)):
        w = w[: len(w) - len(suf)] + _PL[suf]
    return w


# ---------------------------------------------------------------------------
# Classic Porter (porter.sbl — the original 1980 algorithm as pinned
# by the Snowball distribution, distinct from porter2/"english")
# ---------------------------------------------------------------------------

_PO_V = frozenset("aeiouy")
_PO_VWXY = frozenset("aeiouywxY")


def porter_stem(word: str) -> str:
    ch = list(word)
    y_found = False
    if ch and ch[0] == "y":
        ch[0] = "Y"
        y_found = True
    for i in range(1, len(ch)):
        if ch[i] == "y" and ch[i - 1] in _PO_V:
            ch[i] = "Y"
            y_found = True
    w = "".join(ch)
    p1, p2 = _std_r1r2(w, _PO_V)

    def r1(pos):
        return pos >= p1

    def r2(pos):
        return pos >= p2

    def shortv_at(pos):
        """backward (non-v_WXY v non-v) ending at pos (exclusive)."""
        return (pos >= 3 and w[pos - 1] not in _PO_VWXY
                and w[pos - 2] in _PO_V and w[pos - 3] not in _PO_V)

    # Step 1a
    suf = _longest(w, ("sses", "ies", "ss", "s"))
    if suf == "sses":
        w = w[:-4] + "ss"
    elif suf == "ies":
        w = w[:-3] + "i"
    elif suf == "s":
        w = w[:-1]

    # Step 1b
    suf = _longest(w, ("eed", "ed", "ing"))
    if suf == "eed":
        if r1(len(w) - 3):
            w = w[:-3] + "ee"
    elif suf in ("ed", "ing"):
        stem_ = w[: len(w) - len(suf)]
        if any(c in _PO_V for c in stem_):
            w = stem_
            s2 = _longest(w, ("at", "bl", "iz", "bb", "dd", "ff",
                              "gg", "mm", "nn", "pp", "rr", "tt"))
            if s2 in ("at", "bl", "iz"):
                w = w + "e"
            elif s2:
                w = w[:-1]
            elif len(w) == p1 and shortv_at(len(w)):
                w = w + "e"

    # Step 1c
    if w and w[-1] in "yY" and any(c in _PO_V for c in w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    _S2 = {"tional": "tion", "enci": "ence", "anci": "ance",
           "abli": "able", "entli": "ent", "eli": "e", "izer": "ize",
           "ization": "ize", "ational": "ate", "ation": "ate",
           "ator": "ate", "alli": "al", "alism": "al", "aliti": "al",
           "fulness": "ful", "ousli": "ous", "ousness": "ous",
           "iveness": "ive", "iviti": "ive", "biliti": "ble"}
    suf = _longest(w, _S2)
    if suf and r1(len(w) - len(suf)):
        w = w[: len(w) - len(suf)] + _S2[suf]

    # Step 3
    _S3 = {"alize": "al", "icate": "ic", "iciti": "ic", "ical": "ic",
           "ative": "", "ful": "", "ness": ""}
    suf = _longest(w, _S3)
    if suf and r1(len(w) - len(suf)):
        w = w[: len(w) - len(suf)] + _S3[suf]

    # Step 4
    _S4 = ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
           "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
           "ive", "ize", "ion")
    suf = _longest(w, _S4)
    if suf:
        pos = len(w) - len(suf)
        if r2(pos):
            if suf == "ion":
                if pos > 0 and w[pos - 1] in "st":
                    w = w[:pos]
            else:
                w = w[:pos]

    # Step 5a
    if w.endswith("e"):
        pos = len(w) - 1
        if r2(pos) or (r1(pos) and not shortv_at(pos)):
            w = w[:pos]

    # Step 5b
    if w.endswith("ll") and r2(len(w) - 1):
        w = w[:-1]

    if y_found:
        w = w.replace("Y", "y")
    return w


# ---------------------------------------------------------------------------
# Turkish (turkish.sbl) — right-to-left FSM suffix chains, transcribed
# with an explicit backward cursor + bra/ket slice marks because the
# sbl moves the deletion region mid-chain ("[mark ] delete try([ ...")
# ---------------------------------------------------------------------------

_TR_VOWEL = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")
_TR_HARMONY = {"a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
               "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}


class _Tr:
    def __init__(self, w):
        self.w = w
        self.c = len(w)
        self.ket = len(w)
        self.bra = len(w)

    # -- primitives (all operate backward on w[:c]) ---------------------
    def open(self):   # '['
        self.ket = self.c

    def close(self):  # ']'
        self.bra = self.c

    def delete(self):
        self.w = self.w[: self.bra] + self.w[self.ket:]
        delta = self.ket - self.bra
        self.c = self.bra
        self.ket -= delta

    def eats(self, s):
        if self.w[: self.c].endswith(s):
            self.c -= len(s)
            return True
        return False

    def among(self, sufs):
        best = _longest(self.w[: self.c], sufs)
        if best:
            self.c -= len(best)
            return True
        return False

    def attempt(self, fn):
        # Snowball or/try restore the cursor as a DISTANCE FROM THE
        # RIGHT END (generated C saves z->l - z->c): a delete inside a
        # failed alternative is permanent, and the cursor must land at
        # the same offset from the end of the *shrunk* string.
        save = len(self.w) - self.c
        if fn():
            return True
        self.c = len(self.w) - save
        return False

    # -- conditions ----------------------------------------------------
    def harmony(self):
        s = self.w[: self.c]
        for i in range(len(s) - 1, -1, -1):
            if s[i] in _TR_VOWEL:
                allowed = _TR_HARMONY[s[i]]
                return any(ch in allowed for ch in s[:i])
        return False

    def _opt(self, cons):
        """mark_suffix_with_optional_X_consonant."""
        s = self.w[: self.c]
        if s.endswith(cons):
            if len(s) >= 2 and s[-2] in _TR_VOWEL:
                self.c -= 1
                return True
            return False
        return len(s) >= 2 and s[-2] in _TR_VOWEL

    def opt_y(self):
        return self._opt("y")

    def opt_s(self):
        return self._opt("s")

    def opt_n(self):
        return self._opt("n")

    def opt_U(self):
        s = self.w[: self.c]
        if s and s[-1] in _TR_U:
            if len(s) >= 2 and s[-2] not in _TR_VOWEL:
                self.c -= 1
                return True
            return False
        return len(s) >= 2 and s[-2] not in _TR_VOWEL

    # -- suffix marks --------------------------------------------------
    def possessives(self):
        return self.among(("mız", "miz", "muz", "müz", "nız", "niz",
                           "nuz", "nüz", "m", "n")) and self.opt_U()

    def sU(self):
        return (self.harmony()
                and self.w[: self.c].endswith(tuple(_TR_U))
                and (self.c - 1 >= 0 and True)
                and self._mark_sU())

    def _mark_sU(self):
        self.c -= 1
        if self.opt_s():
            return True
        self.c += 1
        return False

    def lArI(self):
        return self.among(("leri", "ları"))

    def yU(self):
        if not self.harmony():
            return False
        s = self.w[: self.c]
        if not (s and s[-1] in _TR_U):
            return False
        self.c -= 1
        if self.opt_y():
            return True
        self.c += 1
        return False

    def nU(self):
        return self.harmony() and self.among(("nı", "ni", "nu", "nü"))

    def nUn(self):
        return (self.harmony()
                and self.among(("ın", "in", "un", "ün"))
                and self.opt_n())

    def yA(self):
        return (self.harmony() and self.among(("a", "e"))
                and self.opt_y())

    def nA(self):
        return self.harmony() and self.among(("na", "ne"))

    def DA(self):
        return self.harmony() and self.among(("da", "de", "ta", "te"))

    def ndA(self):
        return self.harmony() and self.among(("nda", "nde"))

    def DAn(self):
        return self.harmony() and self.among(("dan", "den", "tan",
                                              "ten"))

    def ndAn(self):
        return self.harmony() and self.among(("ndan", "nden"))

    def ylA(self):
        return (self.harmony() and self.among(("la", "le"))
                and self.opt_y())

    def ki(self):
        return self.eats("ki")

    def ncA(self):
        return (self.harmony() and self.among(("ca", "ce"))
                and self.opt_n())

    def yUm(self):
        return (self.harmony()
                and self.among(("ım", "im", "um", "üm"))
                and self.opt_y())

    def sUn(self):
        return self.harmony() and self.among(("sın", "sin", "sun",
                                              "sün"))

    def yUz(self):
        return (self.harmony()
                and self.among(("ız", "iz", "uz", "üz"))
                and self.opt_y())

    def sUnUz(self):
        return self.among(("sınız", "siniz", "sunuz", "sünüz"))

    def lAr(self):
        return self.harmony() and self.among(("ler", "lar"))

    def nUz(self):
        return self.harmony() and self.among(("nız", "niz", "nuz",
                                              "nüz"))

    def DUr(self):
        return self.harmony() and self.among(
            ("tır", "tir", "tur", "tür", "dır", "dir", "dur", "dür"))

    def cAsInA(self):
        return self.among(("casına", "cesine"))

    def yDU(self):
        return (self.harmony()
                and self.among(("tım", "tim", "tum", "tüm", "dım",
                                "dim", "dum", "düm", "tın", "tin",
                                "tun", "tün", "dın", "din", "dun",
                                "dün", "tık", "tik", "tuk", "tük",
                                "dık", "dik", "duk", "dük", "tı",
                                "ti", "tu", "tü", "dı", "di", "du",
                                "dü"))
                and self.opt_y())

    def ysA(self):
        return (self.among(("sam", "san", "sak", "sem", "sen", "sek",
                            "sa", "se"))
                and self.opt_y())

    def ymUs(self):
        return (self.harmony()
                and self.among(("mış", "miş", "muş", "müş"))
                and self.opt_y())

    def yken(self):
        return self.eats("ken") and self.opt_y()


def _tr_nominal_verb(t: _Tr) -> None:
    def b1():
        return (t.attempt(t.ymUs) or t.attempt(t.yDU)
                or t.attempt(t.ysA) or t.attempt(t.yken))

    def b2():
        if not t.cAsInA():
            return False
        (t.attempt(t.sUnUz) or t.attempt(t.lAr) or t.attempt(t.yUm)
         or t.attempt(t.sUn) or t.attempt(t.yUz) or True)
        return t.ymUs()

    def b3():
        if not t.lAr():
            return False
        t.close()
        t.delete()

        def inner():
            t.open()
            return (t.attempt(t.DUr) or t.attempt(t.yDU)
                    or t.attempt(t.ysA) or t.attempt(t.ymUs))
        t.attempt(inner)
        t.flag = False
        return True

    def b4():
        return t.nUz() and (t.attempt(t.yDU) or t.attempt(t.ysA))

    def b5():
        if not (t.attempt(t.sUnUz) or t.attempt(t.yUz)
                or t.attempt(t.sUn) or t.attempt(t.yUm)):
            return False
        t.close()
        t.delete()

        def inner():
            t.open()
            return t.ymUs()
        t.attempt(inner)
        return True

    def b6():
        if not t.DUr():
            return False
        t.close()
        t.delete()

        def inner():
            t.open()
            (t.attempt(t.sUnUz) or t.attempt(t.lAr)
             or t.attempt(t.yUm) or t.attempt(t.sUn)
             or t.attempt(t.yUz) or True)
            return t.ymUs()
        t.attempt(inner)
        return True

    t.open()
    t.flag = True
    if (t.attempt(b1) or t.attempt(b2) or t.attempt(b3)
            or t.attempt(b4) or t.attempt(b5) or t.attempt(b6)):
        t.close()
        t.delete()
    else:
        t.c = t.ket


def _tr_chain_ki(t: _Tr) -> bool:
    t.open()
    if not t.ki():
        t.c = t.ket
        return False

    def after_DA():
        if not t.DA():
            return False
        t.close()
        t.delete()

        def i1():
            t.open()
            if t.lAr():
                t.close()
                t.delete()
                t.attempt(lambda: _tr_chain_ki(t))
                return True
            return False

        def i2():
            t.open()
            if t.possessives():
                t.close()
                t.delete()

                def i2b():
                    t.open()
                    if t.lAr():
                        t.close()
                        t.delete()
                        return _tr_chain_ki(t)
                    return False
                t.attempt(i2b)
                return True
            return False
        t.attempt(lambda: t.attempt(i1) or t.attempt(i2))
        return True

    def after_nUn():
        if not t.nUn():
            return False
        t.close()
        t.delete()

        def i1():
            t.open()
            if t.lArI():
                t.close()
                t.delete()
                return True
            return False

        def i2():
            t.open()
            if t.attempt(t.possessives) or t.attempt(t.sU):
                t.close()
                t.delete()

                def i2b():
                    t.open()
                    if t.lAr():
                        t.close()
                        t.delete()
                        return _tr_chain_ki(t)
                    return False
                t.attempt(i2b)
                return True
            return False
        t.attempt(lambda: (t.attempt(i1) or t.attempt(i2)
                           or t.attempt(lambda: _tr_chain_ki(t))))
        return True

    def after_ndA():
        if not t.ndA():
            return False

        def i1():
            if t.lArI():
                t.close()
                t.delete()
                return True
            return False

        def i2():
            if t.sU():
                t.close()
                t.delete()

                def i2b():
                    t.open()
                    if t.lAr():
                        t.close()
                        t.delete()
                        return _tr_chain_ki(t)
                    return False
                t.attempt(i2b)
                return True
            return False
        return (t.attempt(i1) or t.attempt(i2)
                or t.attempt(lambda: _tr_chain_ki(t)))

    if (t.attempt(after_DA) or t.attempt(after_nUn)
            or t.attempt(after_ndA)):
        return True
    t.c = t.ket
    return False


def _tr_noun_suffixes(t: _Tr) -> None:
    def n1():
        t.open()
        if not t.lAr():
            return False
        t.close()
        t.delete()
        t.attempt(lambda: _tr_chain_ki(t))
        return True

    def n2():
        t.open()
        if not t.ncA():
            return False
        t.close()
        t.delete()

        def i1():
            t.open()
            if t.lArI():
                t.close()
                t.delete()
                return True
            return False

        def i2():
            t.open()
            if t.attempt(t.possessives) or t.attempt(t.sU):
                t.close()
                t.delete()

                def i2b():
                    t.open()
                    if t.lAr():
                        t.close()
                        t.delete()
                        return _tr_chain_ki(t)
                    return False
                t.attempt(i2b)
                return True
            return False

        def i3():
            t.open()
            if t.lAr():
                t.close()
                t.delete()
                return _tr_chain_ki(t)
            return False
        t.attempt(lambda: (t.attempt(i1) or t.attempt(i2)
                           or t.attempt(i3)))
        return True

    def n3():
        t.open()
        if not (t.attempt(t.ndA) or t.attempt(t.nA)):
            return False

        def i1():
            if t.lArI():
                t.close()
                t.delete()
                return True
            return False

        def i2():
            if t.sU():
                t.close()
                t.delete()

                def i2b():
                    t.open()
                    if t.lAr():
                        t.close()
                        t.delete()
                        return _tr_chain_ki(t)
                    return False
                t.attempt(i2b)
                return True
            return False
        return (t.attempt(i1) or t.attempt(i2)
                or t.attempt(lambda: _tr_chain_ki(t)))

    def n4():
        t.open()
        if not (t.attempt(t.ndAn) or t.attempt(t.nU)):
            return False

        def i1():
            if t.sU():
                t.close()
                t.delete()

                def i1b():
                    t.open()
                    if t.lAr():
                        t.close()
                        t.delete()
                        return _tr_chain_ki(t)
                    return False
                t.attempt(i1b)
                return True
            return False
        return t.attempt(i1) or t.attempt(t.lArI)

    def n5():
        t.open()
        if not t.DAn():
            return False
        t.close()
        t.delete()

        def inner():
            t.open()

            def i1():
                if t.possessives():
                    t.close()
                    t.delete()

                    def i1b():
                        t.open()
                        if t.lAr():
                            t.close()
                            t.delete()
                            return _tr_chain_ki(t)
                        return False
                    t.attempt(i1b)
                    return True
                return False

            def i2():
                if t.lAr():
                    t.close()
                    t.delete()
                    t.attempt(lambda: _tr_chain_ki(t))
                    return True
                return False
            return (t.attempt(i1) or t.attempt(i2)
                    or t.attempt(lambda: _tr_chain_ki(t)))
        t.attempt(inner)
        return True

    def n6():
        t.open()
        if not (t.attempt(t.nUn) or t.attempt(t.ylA)):
            return False
        t.close()
        t.delete()

        def i1():
            t.open()
            if t.lAr():
                t.close()
                t.delete()
                return _tr_chain_ki(t)
            return False

        def i2():
            t.open()
            if t.attempt(t.possessives) or t.attempt(t.sU):
                t.close()
                t.delete()

                def i2b():
                    t.open()
                    if t.lAr():
                        t.close()
                        t.delete()
                        return _tr_chain_ki(t)
                    return False
                t.attempt(i2b)
                return True
            return False
        t.attempt(lambda: (t.attempt(i1) or t.attempt(i2)
                           or t.attempt(lambda: _tr_chain_ki(t))))
        return True

    def n7():
        t.open()
        if t.lArI():
            t.close()
            t.delete()
            return True
        return False

    def n8():
        return _tr_chain_ki(t)

    def n9():
        t.open()
        if not (t.attempt(t.DA) or t.attempt(t.yU)
                or t.attempt(t.yA)):
            return False
        t.close()
        t.delete()

        def inner():
            t.open()

            def p1():
                if t.possessives():
                    t.close()
                    t.delete()
                    t.attempt(lambda: (t.open() or True) and t.lAr())
                    return True
                return False
            if not (t.attempt(p1) or t.attempt(t.lAr)):
                return False
            t.close()
            t.delete()
            t.open()
            return _tr_chain_ki(t)
        t.attempt(inner)
        return True

    def n10():
        t.open()
        if t.attempt(t.possessives) or t.attempt(t.sU):
            t.close()
            t.delete()

            def i1():
                t.open()
                if t.lAr():
                    t.close()
                    t.delete()
                    return _tr_chain_ki(t)
                return False
            t.attempt(i1)
            return True
        return False

    (t.attempt(n1) or t.attempt(n2) or t.attempt(n3)
     or t.attempt(n4) or t.attempt(n5) or t.attempt(n6)
     or t.attempt(n7) or t.attempt(n8) or t.attempt(n9)
     or t.attempt(n10))


def turkish_stem(word: str) -> str:
    w = word
    # more_than_one_syllable_word
    if sum(1 for ch in w if ch in _TR_VOWEL) < 2:
        return w

    t = _Tr(w)
    _tr_nominal_verb(t)
    # continue_stemming_noun_suffixes is a boolean TEST between the two
    # `do`s: when the verb stage's lAr branch unsets it, the whole
    # backwards(...) block FAILS — so the noun stage AND the postlude
    # are both skipped (deletions so far are kept).
    if not getattr(t, "flag", True):
        return t.w
    t.c = len(t.w)
    _tr_noun_suffixes(t)
    w = t.w

    # postlude (skipped for the reserved words)
    if w not in ("ad", "soyad"):
        if w.endswith(("d", "g")):
            # append the harmony-matching U to stems ending d/g
            for i in range(len(w) - 1, -1, -1):
                if w[i] in _TR_VOWEL:
                    v = w[i]
                    w += {"a": "ı", "ı": "ı", "e": "i", "i": "i",
                          "o": "u", "u": "u", "ö": "ü", "ü": "ü"}[v]
                    break
        last = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}.get(w[-1:])
        if last:
            w = w[:-1] + last
    return w


# ---------------------------------------------------------------------------
# Basque (basque.sbl) — three among-tables applied with a persistent
# backward cursor: `backwards(repeat aditzak  repeat izenak  do
# adjetiboak)` strips suffix after suffix moving LEFT; the cursor
# carries over from one routine to the next, and every action is
# parenthesized (longest match wins with NO backtracking to shorter
# entries when its RV/R1/R2 condition fails).
# ---------------------------------------------------------------------------

_EU_V = frozenset("aeiou")

# action codes: "rv" / "r1" / "r2" = delete when the match START lies in
# that region; ("repl", s) = slice_from s (always succeeds)
_EU_ADITZAK = {}
for _s in ("le la tzaile aldatu atu tzailea taile tailea pera gale "
           "galea gura kura kor korra or orra tun tuna gaitz gaitza "
           "kaitz kaitza ezin ezina tezin tezina errez erreza karri "
           "karria tzaga tzaka tzake tzeke ez eza tzez keta eta etan "
           "pen pena tze atze kuntza kunde kundea kune kunea kuna kera "
           "era kizun kizuna dura tura men mena go ago tio taldi "
           "taldia aldi aldia gune gunea bide bidea pide pidea gai "
           "gaia ki kin rekin kina kari karia ari tari etari gailu "
           "gailua kide kidea ide idea du ka kan an ean tu lari tatu "
           "rean tarazi arazi tzat bera dako").split():
    _EU_ADITZAK[_s] = "rv"
for _s in ("garri", "garria", "tza"):
    _EU_ADITZAK[_s] = "r2"
for _s in ("atseden", "arabera", "baditu"):
    _EU_ADITZAK[_s] = ("repl", _s)

_EU_IZENAK = {}
for _s in ("ari aria bizia kari karia lari laria tari taria zain "
           "zaina tzain tzaina zale zalea tzale tzalea aizun orde "
           "ordea burua ohi ohia kintza gintzo gintzu tzu tzua tzo "
           "tzoa kuntza talde taldea eria keria teria di za ada tara "
           "etara tra ta tegi tegia keta z zko zkoa ti tia tsu tsua "
           "zu zua bera pera zto ztoa asi asia gile gilea estu estua "
           "larri larria nahi nahia koi koia oi oia goi min mina dun "
           "duna duru durua duri duria os osa oso osoa ar ara tar dar "
           "dara tiar tiara liar liara gabe gabea kabe kabea ga ge "
           "kada tasun tasuna asun asuna go mendu mendua mentu mentua "
           "mendi mendia zio zioa zino zinoa zione zionea ezia degi "
           "degia egi egia toki tokia leku lekua gintza alde aldea "
           "kalde kaldea gune gunea une unea una pe pea gibel gibela "
           "ondo ondoa arte artea aurre aurrea etxe etxea ola ontzi "
           "ontzia gela denda taldi taldia aldi aldia te tea zaro "
           "zaroa taro taroa oro oroa aro aroa ero eroa eroz eroza ka "
           "kan kana tako etako takoa kote kotea tzar tzarra handi "
           "handia kondo kondoa skila no noa ño ñoa ska xka zka tila "
           "to toa tto ttoa txo txoa txu txua anda anga urren urrena "
           "gai gaia gei geia eme emea kume kumea sa ko eko koa ena "
           "enea ne nea kor korra ez eza eta etan ki kia kin kina tu "
           "tua du dua ek tarik tariko tan ordu ordua oste ostea "
           "tzara ra antza behar ro giro ak zp ket kail kaila ail "
           "kirri kirria ngo ngoa ñi sko sta koitz koitza na garren "
           "garrena kera gerren gerrena garna kide tz tuko").split():
    _EU_IZENAK[_s] = "rv"
for _s in ("ora", "garri", "garria", "or", "buru", "ren", "tza"):
    _EU_IZENAK[_s] = "r2"
_EU_IZENAK["joka"] = ("repl", "jok")
for _s in ("tzen", "ten", "en", "tatu"):
    _EU_IZENAK[_s] = "r1"
_EU_IZENAK["trako"] = ("repl", "tra")
_EU_IZENAK["minutuko"] = ("repl", "minutu")
for _s in ("zehar", "geldi", "igaro", "aurka"):
    _EU_IZENAK[_s] = ("repl", _s)

_EU_ADJETIBOAK = {}
for _s in ("era ero go tate tade date dade keria ki to ro la gi "
           "larik lanik ik ztik rik").split():
    _EU_ADJETIBOAK[_s] = "rv"
_EU_ADJETIBOAK["zlea"] = ("repl", "z")


# byte-keyed copies: the stemmer runs in UTF-8 BYTE space like the
# reference (regions are byte offsets; steminternal.cc's lenient
# get_utf8 reads even invalid lead bytes as 2-3 byte chars)
_EU_ADITZAK_B = {k.encode(): v if isinstance(v, str)
                 else (v[0], v[1].encode()) for k, v in _EU_ADITZAK.items()}
_EU_IZENAK_B = {k.encode(): v if isinstance(v, str)
                else (v[0], v[1].encode()) for k, v in _EU_IZENAK.items()}
_EU_ADJETIBOAK_B = {k.encode(): v if isinstance(v, str)
                    else (v[0], v[1].encode())
                    for k, v in _EU_ADJETIBOAK.items()}

_EU_VB = frozenset(b"aeiou")


def _u8_char(wb: bytes, c: int):
    """(codepoint, width) at byte c — steminternal.cc:155 get_utf8's
    LENIENT decode (no validity checks; 3-byte max, truncated at
    end-of-string), so invalid sequences advance exactly as in C."""
    n = len(wb)
    b0 = wb[c]
    if b0 < 0xC0 or c + 1 == n:
        return b0, 1
    b1 = wb[c + 1]
    if b0 < 0xE0 or c + 2 == n:
        return ((b0 & 0x1F) << 6) | (b1 & 0x3F), 2
    return (((b0 & 0xF) << 12) | ((b1 & 0x3F) << 6)
            | (wb[c + 2] & 0x3F), 3)


def _eu_regions(wb: bytes):
    """basque.sbl mark_regions in byte space → (pV, p1, p2)."""
    n = len(wb)
    V = frozenset((0x61, 0x65, 0x69, 0x6F, 0x75))  # aeiou

    def gopast(c, want_vowel):
        while c is not None and c < n:
            ch, w = _u8_char(wb, c)
            c += w
            if (ch in V) == want_vowel:
                return c
        return None

    pV = p1 = p2 = n
    if n:
        ch0, w0 = _u8_char(wb, 0)
        c1 = w0
        r = None
        if c1 < n:
            ch1, w1 = _u8_char(wb, c1)
            if ch0 in V:
                # v then non-v → gopast v ; v then v → gopast non-v
                r = gopast(c1 + w1, ch1 not in V)
            elif ch1 not in V:
                r = gopast(c1 + w1, True)
            else:
                # non-v v next — skip_utf8: lead byte swallows all
                # following continuation bytes (steminternal.cc:91)
                c2 = c1 + w1
                if c2 < n:
                    c3 = c2 + 1
                    if wb[c2] >= 0xC0:
                        while c3 < n and 0x80 <= wb[c3] < 0xC0:
                            c3 += 1
                    r = c3
        if r is not None:
            pV = r
    c = gopast(gopast(0, True), False)
    if c is not None:
        p1 = c
        c = gopast(gopast(c, True), False)
        if c is not None:
            p2 = c
    return pV, p1, p2


def basque_stem(word: str) -> str:
    wb = word.encode("utf-8", "surrogateescape")
    pV, p1, p2 = _eu_regions(wb)

    w = wb

    def step(c, table):
        """One [substring]among(...) call at byte cursor c.
        Returns the new cursor or None on failure."""
        nonlocal w
        suf = _longest(w[:c], table)
        if suf is None:
            return None
        start = c - len(suf)
        act = table[suf]
        if act == "rv":
            if start < pV:
                return None
            w = w[:start] + w[c:]
        elif act == "r1":
            if start < p1:
                return None
            w = w[:start] + w[c:]
        elif act == "r2":
            if start < p2:
                return None
            w = w[:start] + w[c:]
        else:  # slice_from
            w = w[:start] + act[1] + w[c:]
        return start

    c = len(w)
    for table in (_EU_ADITZAK_B, _EU_IZENAK_B):
        while True:
            nc = step(c, table)
            if nc is None:
                break
            c = nc
    step(c, _EU_ADJETIBOAK_B)
    return w.decode("utf-8", "surrogateescape")


# ---------------------------------------------------------------------------
# Lovins (lovins.sbl) — the 1968 Lovins stemmer: longest ending whose
# condition holds (bare routine names in the among = match-time
# conditions WITH backtracking to shorter endings), then undouble,
# then a single respell (parenthesized actions — a failed guard fails
# the whole respell, no fallback to shorter entries).
# ---------------------------------------------------------------------------

def _lov_A(s): return len(s) >= 2
def _lov_B(s): return len(s) >= 3
def _lov_C(s): return len(s) >= 4
def _lov_D(s): return len(s) >= 5
def _lov_E(s): return len(s) >= 2 and s[-1] != "e"
def _lov_F(s): return len(s) >= 3 and s[-1] != "e"
def _lov_G(s): return len(s) >= 3 and s[-1] == "f"
def _lov_H(s): return len(s) >= 2 and (s[-1] == "t" or s.endswith("ll"))
def _lov_I(s): return len(s) >= 2 and s[-1] not in "oe"
def _lov_J(s): return len(s) >= 2 and s[-1] not in "ae"
def _lov_K(s): return len(s) >= 3 and (s[-1] in "li"
                                       or (s[-1] == "e" and s[-3] == "u"))
def _lov_L(s): return (len(s) >= 2 and s[-1] not in "ux"
                       and not (s[-1] == "s" and s[-2] != "o"))
def _lov_M(s): return len(s) >= 2 and s[-1] not in "acem"
def _lov_N(s): return len(s) >= 3 and (s[-3] != "s" or len(s) >= 4)
def _lov_O(s): return len(s) >= 2 and s[-1] in "li"
def _lov_P(s): return len(s) >= 2 and s[-1] != "c"
def _lov_Q(s): return len(s) >= 3 and s[-1] not in "ln"
def _lov_R(s): return len(s) >= 2 and s[-1] in "nr"
def _lov_S(s): return (len(s) >= 2 and
                       (s.endswith("dr")
                        or (s[-1] == "t" and s[-2] != "t")))
def _lov_T(s): return (len(s) >= 2 and
                       (s[-1] == "s" or (s[-1] == "t" and s[-2] != "o")))
def _lov_U(s): return len(s) >= 2 and s[-1] in "lmnr"
def _lov_V(s): return len(s) >= 2 and s[-1] == "c"
def _lov_W(s): return len(s) >= 2 and s[-1] not in "su"
def _lov_X(s): return (len(s) >= 2 and
                       (s[-1] in "li"
                        or (len(s) >= 3 and s[-1] == "e"
                            and s[-3] == "u")))
def _lov_Y(s): return len(s) >= 2 and s.endswith("in")
def _lov_Z(s): return len(s) >= 2 and s[-1] != "f"
def _lov_AA(s): return len(s) >= 2 and s.endswith(
    ("d", "f", "ph", "th", "l", "er", "or", "es", "t"))
def _lov_BB(s): return (len(s) >= 3 and not s.endswith("met")
                        and not s.endswith("ryst"))
def _lov_CC(s): return len(s) >= 2 and s[-1] == "l"


_LOV_ENDINGS_SPEC = """
alistically B arizability A izationally B
antialness A arisations A arizations A entialness A
allically C antaneous A antiality A arisation A arization A
ationally B ativeness A eableness E entations A entiality A
entialize A entiation A ionalness A istically A itousness A
izability A izational A
ableness A arizable A entation A entially A eousness A ibleness A
icalness A ionalism A ionality A ionalize A iousness A izations A
lessness A
ability A aically A alistic B alities A ariness E aristic A
arizing A ateness A atingly A ational B atively A ativism A
elihood E encible A entally A entials A entiate A entness A
fulness A ibility A icalism A icalist A icality A icalize A
ication G icianry A ination A ingness A ionally A isation A
ishness A istical A iteness A iveness A ivistic A ivities A
ization F izement A oidally A ousness A
aceous A acious B action G alness A ancial A ancies A ancing B
ariser A arized A arizer A atable A ations B atives A eature Z
efully A encies A encing A ential A enting C entist A eously A
ialist A iality A ialize A ically A icance A icians A icists A
ifully A ionals A ionate D ioning A ionist A iously A istics A
izable E lessly A nesses A oidism A
acies A acity A aging B aical A alist A alism B ality A alize A
allic BB anced B ances B antic C arial A aries A arily A arity B
arize A aroid A ately A ating I ation B ative A ators A atory A
ature E early Y ehood A eless A elity A ement A enced A ences A
eness E ening E ental A ented C ently A fully A ially A icant A
ician A icide A icism A icist A icity A idine I iedly A ihood A
inate A iness A ingly B inism J inity CC ional A ioned A ished A
istic A ities A itous A ively A ivity A izers F izing F oidal A
oides A otide A ously A
able A ably A ages B ally B ance B ancy B ants B aric A arly K
ated I ates A atic B ator A ealy Y edly E eful A eity A ence A
ency A ened E enly E eous A hood A ials A ians A ible A ibly A
ical A ides L iers A iful A ines M ings N ions B ious A isms B
ists A itic H ized F izer F less A lily A ness A ogen A ward A
wise A ying B yish A
acy A age B aic A als BB ant B ars O ary F ata A ate A eal Y
ear Y ely E ene E ent C ery E ese A ful A ial A ian A ics A
ide L ied A ier A ies P ily A ine M ing N ion Q ish C ism B
ist A ite AA ity A ium A ive A ize F oid A one R ous A
ae A al BB ar X as B ed E en F es E ia A ic A is A ly B on S
or T um U us V yl R 's A s' A
a A e A i A o A s W y B
"""

_LOV_ENDINGS = {}
_toks = _LOV_ENDINGS_SPEC.split()
for _i in range(0, len(_toks), 2):
    _LOV_ENDINGS[_toks[_i]] = globals()[f"_lov_{_toks[_i + 1]}"]
del _toks

# respell rules (appendix C 2-35): (match, replacement, guard) where the
# guard tests the char immediately before the match (None = no char ok)
_LOV_RESPELL = [
    ("iev", "ief", None), ("uct", "uc", None), ("umpt", "um", None),
    ("rpt", "rb", None), ("urs", "ur", None), ("istr", "ister", None),
    ("metr", "meter", None), ("olv", "olut", None),
    ("ul", "l", "aio"), ("bex", "bic", None), ("dex", "dic", None),
    ("pex", "pic", None), ("tex", "tic", None), ("ax", "ac", None),
    ("ex", "ec", None), ("ix", "ic", None), ("lux", "luc", None),
    ("uad", "uas", None), ("vad", "vas", None), ("cid", "cis", None),
    ("lid", "lis", None), ("erid", "eris", None), ("pand", "pans", None),
    ("end", "ens", "s"), ("ond", "ons", None), ("lud", "lus", None),
    ("rud", "rus", None), ("her", "hes", "pt"), ("mit", "mis", None),
    ("ent", "ens", "m"), ("ert", "ers", None), ("et", "es", "n"),
    ("yt", "ys", None), ("yz", "ys", None),
]

_LOV_DOUBLES = frozenset(
    ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt"))


def lovins_stem(word: str) -> str:
    w = word

    # endings: among with routine conditions — longest match first,
    # backtracking to shorter matching endings on condition failure
    for e in sorted((e for e in _LOV_ENDINGS if w.endswith(e)),
                    key=len, reverse=True):
        stem = w[: len(w) - len(e)]
        if _LOV_ENDINGS[e](stem):
            w = stem
            break

    # undouble (appendix C rule 1)
    if w[-2:] in _LOV_DOUBLES:
        w = w[:-1]

    # respell: longest match wins; a failed guard fails the whole
    # routine (parenthesized action — no backtrack)
    best = None
    for m, rep, guard in _LOV_RESPELL:
        if w.endswith(m) and (best is None or len(m) > len(best[0])):
            best = (m, rep, guard)
    if best is not None:
        m, rep, guard = best
        pre = w[: len(w) - len(m)]
        if not (guard and pre and pre[-1] in guard):
            w = pre + rep
    return w


# ---------------------------------------------------------------------------
# Kraaij-Pohlmann (kraaij_pohlmann.sbl) — the alternative Dutch stemmer:
# y-protection prelude, vowel-measure regions (no length clamp), four
# suffix steps with per-entry conditions, ge- prefix/infix removal with
# re-measure, then undoubling. Each among's common "(]" preamble sets
# bra at the match start; entry actions may re-set it after matching
# more context (extending the deleted region leftward).
# ---------------------------------------------------------------------------

_KP_V = frozenset("aeiouy")
_KP_VWX = frozenset("aeiouywx")
_KP_AOU = frozenset("aou")
_KP_AIOU = frozenset("aiou")


def _kp_measure(w: str):
    """p1/p2: after [C* ('ij'|v)+ C] once / twice (no minimum clamp)."""
    n = len(w)
    i = 0
    marks = []
    for _ in range(2):
        while i < n and w[i] not in _KP_V:
            i += 1
        cnt = 0
        while i < n:
            if w.startswith("ij", i):
                i += 2
            elif w[i] in _KP_V:
                i += 1
            else:
                break
            cnt += 1
        if cnt < 1 or i >= n:
            break
        i += 1  # the closing non-v
        marks.append(i)
    p1 = marks[0] if marks else n
    p2 = marks[1] if len(marks) > 1 else n
    return p1, p2


def _kp_V_at(w, c):   # test (v or 'ij') just before c
    return ((c >= 1 and w[c - 1] in _KP_V)
            or (c >= 2 and w[c - 2:c] == "ij"))


def _kp_VX_at(w, c):  # test (next v or 'ij')
    return c >= 1 and _kp_V_at(w, c - 1)


def _kp_C_at(w, c):   # test (not 'ij' non-v)
    return (c >= 1 and w[c - 1] not in _KP_V
            and not (c >= 2 and w[c - 2:c] == "ij"))


def _kp_lengthen(w: str) -> str:
    """lengthen_V at end-of-string: double a short vowel in a newly
    opened syllable (do — returns w unchanged on failure). NB inside
    the 'e' test the leading non-v CONSUMES its char, shifting the
    later not-checks one position left."""
    c = len(w)
    if c < 1 or w[c - 1] in _KP_VWX:
        return w
    c -= 1
    if c >= 1 and w[c - 1] in _KP_AOU:
        pos = c - 1
        if pos == 0 or w[pos - 1] not in _KP_V:
            return w[:pos] + w[pos] + w[pos:]
        return w
    if c >= 1 and w[c - 1] == "e":
        pos = c - 1
        q = pos
        if q >= 1 and w[q - 1] not in _KP_V:
            q -= 1          # non-v consumed
        elif q != 0:
            return w        # neither non-v nor atlimit
        if q >= 1 and w[q - 1] in _KP_AIOU:
            return w        # not AIOU
        if q >= 3 and w[q - 2] in _KP_AIOU and w[q - 3] not in _KP_V:
            return w        # not (next AIOU non-v)
        return w[:pos] + "e" + w[pos:]
    return w


class _KPState:
    __slots__ = ("w", "p1", "p2")

    def __init__(self, w, p1, p2):
        self.w, self.p1, self.p2 = w, p1, p2

    def r1(self, pos):
        return pos >= self.p1

    def r2(self, pos):
        return pos >= self.p2


def _kp_step1(st) -> bool:
    w = st.w
    n = len(w)
    suf = _longest(w, ("'s", "s", "ies", "es", "aus", "en", "nde"))
    if suf is None:
        return False
    c = n - len(suf)
    if suf == "'s":
        st.w = w[:c]
        return True
    if suf == "s":
        if not (st.r1(c) and not (w[:c].endswith("t") and st.r1(c - 1))
                and _kp_C_at(w, c)):
            return False
        st.w = w[:c]
        return True
    if suf == "ies":
        if not st.r1(c):
            return False
        st.w = w[:c] + "ie"
        return True
    if suf == "es":
        if w[:c].endswith("ar") and st.r1(c - 2) and _kp_C_at(w, c - 2):
            st.w = _kp_lengthen(w[:c - 2])
            return True
        if w[:c].endswith("er") and st.r1(c - 2) and _kp_C_at(w, c - 2):
            st.w = w[:c - 2]
            return True
        if st.r1(c) and _kp_C_at(w, c):
            st.w = w[:c] + "e"
            return True
        return False
    if suf == "aus":
        if not (st.r1(c) and _kp_V_at(w, c)):
            return False
        st.w = w[:c] + "au"
        return True
    if suf == "en":
        if w[:c].endswith("hed") and st.r1(c - 3):
            st.w = w[:c - 3] + "heid"
            return True
        if w[:c].endswith("nd"):
            st.w = w[:c]
            return True
        if w[:c].endswith("d") and st.r1(c - 1) and _kp_C_at(w, c - 1):
            st.w = w[:c - 1]
            return True
        if w[c - 1:c] in ("i", "j") and _kp_V_at(w, c - 1):
            st.w = w[:c]
            return True
        if st.r1(c) and _kp_C_at(w, c):
            st.w = _kp_lengthen(w[:c])
            return True
        return False
    # "nde"
    st.w = w[:c] + "nd"
    return True


def _kp_step2(st) -> bool:
    w = st.w
    n = len(w)
    suf = _longest(w, ("je", "ge", "lijke", "ische", "de", "te", "se",
                       "re", "le", "ene", "ieve"))
    if suf is None:
        return False
    c = n - len(suf)
    if suf == "je":
        s = w[:c]
        if s.endswith("'t"):
            st.w = w[:c - 2]
            return True
        if s.endswith("et") and st.r1(c - 2) and _kp_C_at(w, c - 2):
            st.w = w[:c - 2]
            return True
        if s.endswith("rnt"):
            st.w = w[:c - 3] + "rn"
            return True
        if s.endswith("t") and st.r1(c - 1) and _kp_VX_at(w, c - 1):
            st.w = w[:c - 1]
            return True
        if s.endswith("ink"):
            st.w = w[:c - 3] + "ing"
            return True
        if s.endswith("mp"):
            st.w = w[:c - 2] + "m"
            return True
        if s.endswith("'") and st.r1(c - 1):
            st.w = w[:c - 1]
            return True
        if st.r1(c) and _kp_C_at(w, c):
            st.w = w[:c]
            return True
        return False
    if suf in ("ge", "lijke", "ische", "te", "se", "re"):
        if not st.r1(c):
            return False
        st.w = w[:c] + {"ge": "g", "lijke": "lijk", "ische": "isch",
                        "te": "t", "se": "s", "re": "r"}[suf]
        return True
    if suf == "de":
        if not (st.r1(c) and _kp_C_at(w, c)):
            return False
        st.w = w[:c]
        return True
    if suf == "le":
        if not st.r1(c):
            return False
        st.w = _kp_lengthen(w[:c] + "l")
        return True
    if suf == "ene":
        if not (st.r1(c) and _kp_C_at(w, c)):
            return False
        st.w = _kp_lengthen(w[:c] + "en")
        return True
    # "ieve"
    if not (st.r1(c) and _kp_C_at(w, c)):
        return False
    st.w = w[:c] + "ief"
    return True


def _kp_step3(st) -> bool:
    w = st.w
    n = len(w)
    suf = _longest(w, ("atie", "iteit", "heid", "sel", "ster", "rder",
                       "ing", "isme", "erij", "arij", "fie", "gie",
                       "tst", "dst"))
    if suf is None:
        return False
    c = n - len(suf)
    if suf == "atie":
        if not st.r1(c):
            return False
        st.w = w[:c] + "eer"
        return True
    if suf in ("iteit", "ing", "isme", "erij"):
        if not st.r1(c):
            return False
        st.w = _kp_lengthen(w[:c])
        return True
    if suf in ("heid", "sel", "ster"):
        if not st.r1(c):
            return False
        st.w = w[:c]
        return True
    if suf == "rder":
        st.w = w[:c] + "r"
        return True
    if suf == "arij":
        if not (st.r1(c) and _kp_C_at(w, c)):
            return False
        st.w = w[:c] + "aar"
        return True
    if suf in ("fie", "gie"):
        if not st.r2(c):
            return False
        st.w = _kp_lengthen(w[:c] + suf[0])
        return True
    # "tst" / "dst"
    if not (st.r1(c) and _kp_C_at(w, c)):
        return False
    st.w = w[:c] + suf[0]
    return True


def _kp_step4(st) -> bool:
    w = st.w
    n = len(w)
    suf = _longest(w, ("ioneel", "atief", "baar", "naar", "laar",
                       "raar", "tant", "lijker", "lijkst", "achtig",
                       "achtiger", "achtigst", "eriger", "erigst",
                       "erig", "end"))
    if suf is not None:
        c = n - len(suf)
        if suf == "ioneel":
            if st.r1(c):
                st.w = w[:c] + "ie"
                return True
        elif suf == "atief":
            if st.r1(c):
                st.w = w[:c] + "eer"
                return True
        elif suf == "baar":
            if st.r1(c):
                st.w = w[:c]
                return True
        elif suf in ("naar", "laar", "raar"):
            if st.r1(c) and _kp_V_at(w, c):
                st.w = w[:c] + suf[0]
                return True
        elif suf == "tant":
            if st.r1(c):
                st.w = w[:c] + "teer"
                return True
        elif suf in ("lijker", "lijkst"):
            if st.r1(c):
                st.w = w[:c] + "lijk"
                return True
        elif suf in ("achtig", "achtiger", "achtigst"):
            if st.r1(c):
                st.w = w[:c]
                return True
        else:  # eriger erigst erig end
            if st.r1(c) and _kp_C_at(w, c):
                st.w = _kp_lengthen(w[:c])
                return True
    # second among — only when the first fails
    suf = _longest(w, ("iger", "igst", "ig"))
    if suf is None:
        return False
    c = n - len(suf)
    if st.r1(c) and _kp_C_at(w, c):
        st.w = _kp_lengthen(w[:c])
        return True
    return False


def _kp_step7(st) -> bool:
    w = st.w
    suf = _longest(w, ("kt", "ft", "pt"))
    if suf is None:
        return False
    st.w = w[:-2] + suf[0]
    return True


def _kp_step6(st) -> bool:
    w = st.w
    doubles = ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll",
               "mm", "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww",
               "xx", "zz")
    suf = _longest(w, doubles + ("v", "z"))
    if suf is None:
        return False
    if len(suf) == 2:
        st.w = w[:-1]
    elif suf == "v":
        st.w = w[:-1] + "f"
    else:
        st.w = w[:-1] + "s"
    return True


def _kp_step1c(st) -> bool:
    w = st.w
    n = len(w)
    suf = _longest(w, ("d", "t"))
    if suf is None:
        return False
    c = n - 1
    if not (st.r1(c) and _kp_C_at(w, c)):
        return False
    guard = "n" if suf == "d" else "h"
    if w[:c].endswith(guard) and st.r1(c - 1):
        return False
    st.w = w[:c]
    return True


def _kp_lose_prefix(w: str):
    """ge- prefix removal: needs >= 3 more chars and a vowel later
    followed by a non-vowel. Returns (new_w, removed?)."""
    if not w.startswith("ge") or len(w) < 5:
        return w, False
    n = len(w)
    i = 2
    while i < n and w[i] not in _KP_V:
        i += 1
    if i >= n:
        return w, False
    j = i
    while j < n and w[j] in _KP_V:
        j += 1
    if j >= n:
        return w, False
    return w[2:], True


def _kp_lose_infix(w: str):
    """first 'ge' at position >= 1 (gopast commits to it)."""
    k = w.find("ge", 1)
    if k < 0:
        return w, False
    end = k + 2
    n = len(w)
    if n - end < 3:
        return w, False
    i = end
    while i < n and w[i] not in _KP_V:
        i += 1
    if i >= n:
        return w, False
    j = i
    while j < n and w[j] in _KP_V:
        j += 1
    if j >= n:
        return w, False
    return w[:k] + w[end:], True


def kraaij_pohlmann_stem(word: str) -> str:
    # prelude: word-initial y and vowel-preceded y → Y (sequential on
    # the mutating string: a y after a just-protected Y stays y)
    chars = list(word)
    y_found = False
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _KP_V:
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)

    p1, p2 = _kp_measure(w)
    st = _KPState(w, p1, p2)
    stemmed = False
    for step in (_kp_step1, _kp_step2, _kp_step3, _kp_step4):
        if step(st):
            stemmed = True

    nw, ok = _kp_lose_prefix(st.w)
    if ok:
        st.w = nw
        st.p1, st.p2 = _kp_measure(nw)
        _kp_step1c(st)

    nw, ge_infix = _kp_lose_infix(st.w)
    if ge_infix:
        st.w = nw
        st.p1, st.p2 = _kp_measure(nw)
        _kp_step1c(st)

    if _kp_step7(st):
        stemmed = True
    if stemmed or ge_infix:
        _kp_step6(st)

    return st.w.replace("Y", "y") if y_found else st.w


# ---------------------------------------------------------------------------
# Catalan (catalan.sbl) — pronoun strip, standard-or-verb suffix, a
# residual pass, then a cleaning map that folds accents (no golden
# vocabulary ships in xapian-data; validated structurally + spot cases)
# ---------------------------------------------------------------------------

_CA_V = frozenset("aeiouáàéèíïóòúü")

_CA_PRON = ("'s 'hi 'ho 'l 'ls -ls -la -les -li vos se nos -nos -us "
            "us 'n 'ns -n -ns 'm -me -m -te 't li lo los me sela selo "
            "selas selos le la las les ens ho hi").split()

_CA_STD_R1 = ("ar atge formes icte ictes ell ells ella és ès esc essa "
              "et ets eta eres eries ers ina ines able ls ió itat "
              "itats itzar iva ives ivisme ius fer ment amen ament "
              "aments ments ot sfera al als era ana iste aire eria "
              "esa eses esos or ícia ícies icis ici íci ícis ària "
              "àries alla ció cions nça nces ó dor all il ístic enc "
              "enca ís issa issos íssem íssiu issem isseu ísseu ós "
              "osa dora dores dors adura ble bles ívol ívola dís "
              "egar ejar ificar itar ables adors idores idors adora "
              "ació doras dur dures allengües ant ants ancia ancies "
              "atòria atòries tori toris ats ions ota isam ors ora "
              "ores isament bilitat bilitats ivitat ivitats ari aris "
              "ionisme ionista ionistes ialista ialistes ialisme "
              "ialismes ud uts uds encia encies ència ències ïtat "
              "ïtats atiu atius atives ativa ativitat ativitats ible "
              "ibles assa asses assos ent ents íssim íssima íssims "
              "íssimes ìssem ìsseu ìssin ims ima imes isme ista "
              "ismes istes inia inies íinia ínies ita ites triu "
              "trius oses osos ient otes ots").split()
_CA_STD = {s: ("r1", "") for s in _CA_STD_R1}
for _s in ("acions", "ada", "ades"):
    _CA_STD[_s] = ("r2", "")
for _s in ("logía logíes logia logies logi logis lògica lògics "
           "lògiques").split():
    _CA_STD[_s] = ("r2", "log")
for _s in ("ic", "ica", "ics", "iques"):
    _CA_STD[_s] = ("r2", "ic")
for _s in ("quíssim", "quíssims", "quíssimes", "quíssima"):
    _CA_STD[_s] = ("r1", "c")

_CA_VERB = {s: ("r1", "") for s in (
    "ador adora adors adores re ie ent ents udes arà eren ará arían "
    "arías arán arás aríais aria arian arien aries aràs aría aréis "
    "aríamos aremos ara aré arés erían erías erán erás eríais ería "
    "eréis eríamos eremos erá eré er erau erass irían irías irán "
    "irás iríais iría iréis iríamos iremos irá iré írem íreu íeu ia "
    "ies íem ìeu ien at ut uda ava aves avem ávem àvem àveu áveu "
    "aven au ats asseu esseu eresseu àsseu àssem àssim àssiu essen "
    "esses assen asses assim assiu éssen ésseu éssim éssiu éssem í "
    "ares àrem àreu àren aríem aríeu areu aren ant ïm ïu és ïen en "
    "es em am ams ïa ïes dre eix eixer tzar eixes ides ïdes it ït "
    "ïda aba ada ades ida ía iera ad ed its id ids ase iese aste "
    "iste an aban ían aran ieran asen iesen aron ieron ado ido "
    "iendo ió ar ir as ieu ii io ià ess essin essis ass assin assis "
    "essim èssim èssiu abas adas idas ías aras ieras ases ieses ís "
    "áis abais íais arais ierais aseis ieseis asteis isteis ados "
    "idos amos ábamos íamos imos ques áramos iéramos iésemos "
    "ásemos ira iran irem iren ires ireu iria irien iries irà iràs "
    "irè irìem irìeu isquen iguem igueu esqui esquin esquis eixi "
    "eixin eixis eixen eixo isin isis esques sis sin int iríem "
    "iríeu isc atges esca esquen issen isses issin issis isca "
    "issiu issim ïsc ïsca ïssin íssiu íssim ïssis ïguem ïgueu ïra "
    "ïren ïres ïsquen ïsques ïssen ïsses ïxo ïxen ïxes ïx ixo ixen "
    "ixes ix ixa inin inis ini ineu itza itzi itzeu itzis itzo itz "
    "itzà arem in às iï iïn iïs").split()}
_CA_VERB["ando"] = ("r2", "")

_CA_RESID = {s: ("r1", "") for s in (
    "os a o á à í ó e é eu iu is i ir s ì itz ï ïn ïs it").split()}
_CA_RESID["iqu"] = ("r1", "ic")

_CA_CLEAN = str.maketrans("áàéèíìóòúüï·", "aaeeiioouui.")


def catalan_stem(word: str) -> str:
    w = word
    p1, p2 = _std_r1r2(w, _CA_V)

    def apply(table):
        nonlocal w
        suf = _longest(w, table)
        if suf is None:
            return False
        c = len(w) - len(suf)
        cond, rep = table[suf] if isinstance(table, dict) \
            else ("r1", "")
        if cond == "r1" and c < p1:
            return False
        if cond == "r2" and c < p2:
            return False
        w = w[:c] + rep
        return True

    apply({s: ("r1", "") for s in _CA_PRON})
    if not apply(_CA_STD):
        apply(_CA_VERB)
    apply(_CA_RESID)
    return w.translate(_CA_CLEAN)


# ---------------------------------------------------------------------------
# Armenian (armenian.sbl) — ending/verb/adjective/noun amongs applied
# inside `setlimit tomark pV` (matches may not cross the first-vowel
# region); `ending` additionally requires R2. No golden vocabulary
# ships in xapian-data; validated structurally + spot cases.
# ---------------------------------------------------------------------------

_HY_V = frozenset("աէիօւեոը")

_HY_ADJ = ("բար պես որէն ովին ակի լայն րորդ երորդ ական ալի կոտ եկեն "
           "որակ եղ վուն երեն արան են ավետ գին իվ ատ ին").split()
_HY_VERB = ("ում վում ալու ելու վել անալ ելուց ալուց ըալ ըել ալով "
            "ելով ալիս ելիս ենալ ացնալ եցնել ցնել նել ատել ոտել "
            "կոտել տել ված եցվել ացվել եցիր ացիր եցինք ացինք վեցիր "
            "վեցինք վեցիք վեցին ացրիր ացրեց ացրինք ացրիք ացրին եցիք "
            "ացիք եցին ացին ացար ացավ ացանք ացաք ացան վեցի ացրի "
            "եցար եցավ ցանք ցաք ցան ացա ացի եցա չել եցի ար ավ անք "
            "աք ան ալ ել եց աց վե ա").split()
_HY_NOUN = ("ածո անակ անօց արան արք պան ստան եղէն ենք իկ իչ իք մունք "
            "յակ յուն ոնք որդ ոց չեք վածք վոր ավոր ություն ուկ ուհի "
            "ույթ ույք ուստ ուս ցի ալիք անիք իլ իչք ունք գար ու ակ "
            "ան ք").split()
_HY_ENDING = ("ները ներն ների ներդ երից ներից երի երդ երն երը ներին "
              "ությանն ությանը ությանս ությանդ ության երին ին սա ոջ "
              "ից երով ներով երում ներում ուն ուդ վանս վանը վանդ անը "
              "անդ վան ոջը ոջս ոջդ ոց ուց ոջից ցից վից վի վով ով "
              "անով անում վանից ամբ ան ներ եր վա ը ն դ ց ի").split()


def _hy_regions(w: str):
    n = len(w)
    i = 0
    pV = p2 = n

    def gopast(i, want_vowel):
        while i < n:
            hit = (w[i] in _HY_V) == want_vowel
            i += 1
            if hit:
                return i
        return None

    g = gopast(0, True)
    if g is not None:
        pV = g
        g = gopast(g, False)
        g = gopast(g, True) if g is not None else None
        g = gopast(g, False) if g is not None else None
        if g is not None:
            p2 = g
    return pV, p2


def armenian_stem(word: str) -> str:
    w = word
    pV, p2 = _hy_regions(w)

    def strip(table, need_r2=False):
        nonlocal w
        if pV > len(w):
            return
        # setlimit tomark pV: the among only sees w[pV:], so the
        # longest match is the longest suffix NOT crossing pV
        suf = _longest(w[pV:], table)
        if suf is None:
            return
        c = len(w) - len(suf)
        if need_r2 and c < p2:
            return
        w = w[:c]

    strip(_HY_ENDING, need_r2=True)
    strip(_HY_VERB)
    strip(_HY_ADJ)
    strip(_HY_NOUN)
    return w

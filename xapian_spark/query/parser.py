"""QueryParser: text query string → ops.Query tree.

A recursive-descent re-implementation of the reference Lemon grammar
(xapian-core/queryparser/queryparser.lemony, 2219 LoC; flag surface
include/xapian/queryparser.h:399-483). Defaults match the reference:
default_op = OR (queryparser_internal.h:103), flags =
FLAG_PHRASE|FLAG_BOOLEAN|FLAG_LOVEHATE (queryparser.h:483), STEM_SOME
with english stemming, NEAR/ADJ default window 10
(queryparser.lemony:1656-1678).

Behaviors reproduced (golden corpus: tests/queryparsertest.cc:48+):
- probabilistic terms tokenize with the same Unicode rules as
  TermGenerator (shared _scan_terms); contiguous multi-term segments
  ("hyphen-ated", "nu.nl") become implicit PHRASEs of window n
- STEM_SOME: lowercase words → "Z"+stem; words containing an uppercase
  letter, phrase/NEAR constituents, and demoted operator words stay
  unstemmed
- lovehate: +terms are required (AND / AND_MAYBE), -terms are excluded
  (AND_NOT); markers must be glued to the following token
- boolean ops AND/OR/NOT/XOR in ALL-CAPS, parens (unclosed tolerated),
  precedence OR < XOR < NOT < AND; an op without a usable operand
  demotes to a plain (unstemmed) term
- field prefixes via add_prefix (probabilistic: "author:" → "A") and
  add_boolean_prefix ("site:" → "H"); boolean filters OR within a
  field, AND across fields, attach with FILTER (factor-0 AND), and a
  lone filter query is 0-scaled ("0 * H...")
- NEAR/n and ADJ/n join plain terms; stored window = n_terms + w - 1
  (the reference's printed window)
- positions are assigned to probabilistic terms in appearance order;
  boolean filter terms carry no position

describe() renders the tree in the reference Query::get_description
style ("(Zstock@1 AND_NOT Zcook@2)") so the golden corpus applies
verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Tuple

from xapian_spark.analysis.porter2 import stem as porter2_stem
from xapian_spark.analysis.tokenizer import TermGenerator, should_stem
from xapian_spark.query import ops

DEFAULT_WINDOW = 10  # queryparser.lemony:1661-1668

_OPS = {"AND", "OR", "NOT", "XOR"}
_POSITIONAL = {"NEAR": ops.Near, "ADJ": ops.Phrase}


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

@dataclass
class Tok:
    kind: str            # lparen rparen word phrase op posop filter
    raw: str = ""
    words: List[str] = dc_field(default_factory=list)  # lowercased terms
    love: bool = False
    hate: bool = False
    field: Optional[str] = None   # resolved prefix string ("A", "XT", …)
    bool_field: Optional[str] = None  # boolean field name
    value: str = ""               # boolean filter value (verbatim)
    window: int = DEFAULT_WINDOW  # for posop
    has_upper: bool = False
    group_break: bool = False     # trailing phrase-gen ends the group
    break_if_first: bool = False  # tail breaks only a 1-token group
    range_node: object = None     # for kind == "range"
    wildcard: bool = False        # word followed by '*' (FLAG_WILDCARD)


# straight + Unicode curly double quotes (queryparser.lemony
# is_double_quote, :95-99)
_QUOTES = {'"', "\u201c", "\u201d"}
_BREAK = set("()") | _QUOTES
# queryparser.lemony is_phrase_generator / is_stem_preventer
_PHRASE_GEN = set(".-/:\\@")
_STEM_PREVENT = set('(/\\@<>=*[{"')


class QueryParserError(ValueError):
    """Raised for the reference's syntax errors (str(e) matches the
    reference's error text, e.g. "Syntax: <expression> AND
    <expression>")."""


class _Degrade(Exception):
    """Internal: the strict pass hit a GENERIC grammar error (the
    lemon parser's bare "parse error" — e.g. a stray KET, or NEAR
    followed by a non-term). parse_query catches it and re-parses
    with all syntax flags off, exactly like the reference
    (queryparser.cc:154-157: errmsg == "parse error" → re-parse with
    flags=0). The specific "Syntax: ..." errors propagate instead."""


class StringValueRangeProcessor:
    """StringValueRangeProcessor(slot) (queryparser.h:117-160): accepts
    any begin..end pair verbatim. `column` names the docs column the
    range filters at execution time (the value-slot analog); it
    defaults to the slot number, which is what describe() prints."""

    def __init__(self, slot, column=None):
        self.column = str(slot) if column is None else column

    def __call__(self, begin: str, end: str):
        if begin and end and end < begin:
            # begin > end matches nothing (the reference's
            # OP_VALUE_RANGE normalizes to the empty query)
            return ops.MatchNothing()
        return ops.ValueRange(self.column,
                              begin if begin != "" else None,
                              end if end != "" else None)


class NumberValueRangeProcessor:
    """NumberValueRangeProcessor(slot, str_, prefix=True) — the
    reference semantics (queryparser.h:180-260): with a prefix string
    the BEGIN must carry it ("$10..20", "$10..$20", "$..20"); with
    str_ as suffix the END must carry it ("12..42kg"); accepted values
    are emitted as sortable_serialise bytes (golden-identical). Pass
    `column` to target a docs column with plain floats instead (the
    executable mode)."""

    def __init__(self, slot, str_: str = "", prefix: bool = True,
                 column=None):
        self.slot = str(slot)
        self.column = column
        self.str_ = str_
        self.prefix = prefix

    def _parse(self, v: str, required: bool):
        if self.str_:
            if self.prefix:
                if v.startswith(self.str_):
                    v = v[len(self.str_):]
                elif required:
                    return None, False
            else:
                if v.endswith(self.str_):
                    v = v[: -len(self.str_)]
                elif required:
                    return None, False
        if v == "":
            return None, True  # open end
        try:
            return float(v), True
        except ValueError:
            return None, False

    def __call__(self, begin: str, end: str):
        if begin == "" and self.str_ and self.prefix:
            return None  # "..$20" is not a cash range
        lo, ok1 = self._parse(begin, required=self.prefix) \
            if begin != "" else (None, True)
        hi, ok2 = self._parse(end, required=not self.prefix) \
            if end != "" else (None, True)
        if not (ok1 and ok2):
            return None
        if lo is not None and hi is not None and hi < lo:
            return ops.MatchNothing()
        if self.column is not None:
            return ops.ValueRange(self.column, lo, hi)
        from xapian_spark.index.sortable import sortable_serialise

        enc = (lambda x: sortable_serialise(x).decode("latin-1"))
        return ops.ValueRange(
            self.slot,
            enc(lo) if lo is not None else None,
            enc(hi) if hi is not None else None)


class DateValueRangeProcessor:
    """DateValueRangeProcessor(slot) (queryparser.h:166-178): accepts
    YYYYMMDD, YYYY-MM-DD / YYYY/MM/DD / YYYY.MM.DD, and two-digit-year
    D/M/Y forms (retrying M/D/Y when day > 12 forces it, matching the
    reference goldens); emits "YYYYMMDD" strings."""

    def __init__(self, slot, str_: str = "", prefer_mdy: bool = False,
                 epoch_year: int = 1970, column=None,
                 prefix: bool = True):
        self.column = str(slot) if column is None else column
        self.str_ = str_
        self.prefix = prefix
        self.prefer_mdy = prefer_mdy
        self.epoch_year = epoch_year

    def _year(self, y: int) -> int:
        if y >= 100:
            return y
        return 2000 + y if (1900 + y) < self.epoch_year else 1900 + y

    def _one(self, v: str, mdy: bool):
        m = re.fullmatch(r"(\d{4})(\d{2})(\d{2})", v)
        if m:
            y, mo, d = map(int, m.groups())
            return (y, mo, d)
        m = re.fullmatch(r"(\d{4})[-./](\d{1,2})[-./](\d{1,2})", v)
        if m:
            y, mo, d = map(int, m.groups())
            return (y, mo, d) if 1 <= mo <= 12 and 1 <= d <= 31 \
                else None
        m = re.fullmatch(r"(\d{1,2})[-./](\d{1,2})[-./](\d{1,4})", v)
        if m:
            a, b, y = map(int, m.groups())
            d, mo = (b, a) if mdy else (a, b)
            if 1 <= mo <= 12 and 1 <= d <= 31:
                return (self._year(y), mo, d)
        return None

    def __call__(self, begin: str, end: str):
        # optional "date:"-style marker (queryparser.h:166-178 ctor
        # with str_): the begin (prefix) or end (suffix) must carry it
        if self.str_:
            if self.prefix:
                if not begin.startswith(self.str_):
                    return None
                begin = begin[len(self.str_):]
            else:
                if not end.endswith(self.str_):
                    return None
                end = end[: -len(self.str_)]
        for mdy in ((True,) if self.prefer_mdy else (False, True)):
            lo = self._one(begin, mdy) if begin else None
            hi = self._one(end, mdy) if end else None
            if (begin and lo is None) or (end and hi is None):
                continue
            fmt = "{:04d}{:02d}{:02d}".format
            return ops.ValueRange(
                self.column,
                fmt(*lo) if lo else None,
                fmt(*hi) if hi else None)
        return None


class QueryParser:
    """Xapian::QueryParser analog (text syntax subset; see module doc)."""

    def __init__(self, stemmer=porter2_stem, default_op: str = "or",
                 synonyms: Optional[Dict[str, List[str]]] = None,
                 cjk_ngram: bool = False):
        self.stemmer = stemmer
        self.default_op = default_op
        self.prefixes: Dict[str, List[str]] = {}
        self.boolean_prefixes: Dict[str, List[str]] = {}
        # FLAG_AUTO_SYNONYMS analog: generated term → synonym terms;
        # a matching Term leaf becomes OP_SYNONYM over term + synonyms
        # (queryparser.h:461-474; synonym B-tree replaced by this
        # broadcastable dict)
        self.synonyms = synonyms or {}
        # FieldProcessor hooks (queryparser.h:647-714, tests
        # queryparsertest.cc:1819-1930): a callable registered for a
        # field receives the RAW text after 'field:' (quotes stripped)
        # and returns an ops.Query that replaces default handling.
        self.field_procs: Dict[str, object] = {}
        self.bool_field_procs: Dict[str, object] = {}
        self.vrps: List = []
        self._nonexclusive: set = set()
        self._bool_order: Dict[str, int] = {}
        self.cjk_ngram = cjk_ngram
        self._tg = TermGenerator(cjk_ngram=cjk_ngram)
        # FLAG_WILDCARD state (queryparser.h:404-435): a term dictionary
        # for parse-time expansion (set_database analog; None → emit an
        # ops.Wildcard for compile-time expansion) and the expansion cap
        # (set_max_wildcard_expansion; 0 = unlimited at parse time)
        self._db_terms: Optional[List[str]] = None
        self._max_wildcard_expansion = 0
        self._wildcard_flag = False
        # False during the degraded re-parse (reference flags=0 pass):
        # quotes/brackets/lovehate/operators all lex as punctuation
        self._syntax_on = True

    def set_database(self, terms) -> None:
        """QueryParser::set_database analog: a term dictionary enabling
        parse-time wildcard expansion (the 1.2 behavior the reference's
        queryparsertest exercises). Accepts any iterable of terms."""
        self._db_terms = sorted(set(terms))

    def set_max_wildcard_expansion(self, n: int) -> None:
        """Raise WildcardError when a wildcard matches more than n terms
        (queryparser.h:425-435); 0 = unlimited."""
        self._max_wildcard_expansion = n

    def add_valuerangeprocessor(self, vrp) -> None:
        """Chain a range processor (first accepting one wins —
        QueryParser::add_valuerangeprocessor)."""
        self.vrps.append(vrp)

    def add_prefix(self, field: str, prefix) -> None:
        """prefix: a term-prefix string, or a FieldProcessor callable
        (value str → ops.Query) — queryparser.h:647-682."""
        if callable(prefix) and not isinstance(prefix, str):
            self.field_procs[field] = prefix
            return
        self.prefixes.setdefault(field, []).append(prefix)

    def add_boolean_prefix(self, field: str, prefix,
                           exclusive: bool = True) -> None:
        self._bool_order.setdefault(field, len(self._bool_order))
        if callable(prefix) and not isinstance(prefix, str):
            self.bool_field_procs[field] = prefix
            # register the field so the lexer routes 'field:value'
            # (and quoted values) through the filter machinery
            self.boolean_prefixes.setdefault(field, [])
        else:
            self.boolean_prefixes.setdefault(field, []).append(prefix)
        if not exclusive:
            self._nonexclusive.add(field)

    # -- lexing ------------------------------------------------------------

    def _scan(self, text: str) -> List[str]:
        return [t for t in self._tg._scan_terms(text)
                if isinstance(t, str)]

    def _scan_phrase(self, text: str):
        """(words, group_ids) for quoted content: a CJK run expands to
        its unigrams, all sharing one position group
        ('"久有test归"' → 久@1 有@1 test@2 归@3)."""
        words, groups = [], []
        g = 0
        for t in self._tg._scan_terms(text):
            g += 1
            if isinstance(t, str):
                words.append(t)
                groups.append(g)
            elif self.cjk_ngram:
                for chch in t[1]:
                    words.append(chch)
                    groups.append(g)
            else:
                words.append(t[1])
                groups.append(g)
        return words, groups

    def _lex(self, s: str) -> List[Tok]:
        toks: List[Tok] = []
        i, n = 0, len(s)
        love = hate = False
        pend_field: Optional[str] = None
        pend_bool: Optional[str] = None
        pend_is_fproc = False  # pend_bool names a field_procs field
        quote_close = -1  # index just past the last CLOSING quote
        hold_lovehate = False  # pending +/- surviving punctuation
        while i < n:
            ch = s[i]
            if ch.isspace():
                # a LOVE/HATE token already "emitted" (consumed its
                # marker) binds the next term even across skipped
                # punctuation and whitespace ('-> chr' hates chr)
                if not hold_lovehate:
                    love = hate = False
                pend_field = pend_bool = None
                i += 1
                continue
            if ch == "(" and not self._syntax_on:
                # degraded pass (FLAG_BOOLEAN off): pure punctuation
                toks.append(Tok("brk"))
                love = hate = False
                i += 1
                continue
            if ch == ")" and not self._syntax_on:
                toks.append(Tok("brk"))
                love = hate = False
                i += 1
                continue
            if ch == "(":
                if not (i == 0 or s[i - 1].isspace()
                        or s[i - 1] in "()+-:\"“”"):
                    # glued "(" is punctuation, not a bracket — it
                    # breaks the adjacent-term group ("Chr(10)",
                    # "ip_masq_new(proto=TCP)"); a +/- right after it
                    # is punctuation too ("history.go(-1)"), not a
                    # lovehate marker
                    toks.append(Tok("brk"))
                    i += 1
                    while i < n and s[i] in "+-":
                        i += 1
                    continue
                toks.append(Tok("lparen", love=love, hate=hate,
                               field=pend_field))
                love = hate = False
                pend_field = pend_bool = None
                i += 1
                continue
            if ch == ")":
                toks.append(Tok("rparen"))
                love = hate = False
                i += 1
                continue
            if ch in _QUOTES:
                if pend_bool is not None:
                    # quoted boolean-filter value, "" escapes a quote
                    # (golden 'category:"literal """'); a straight
                    # opener closes only on a straight quote — curly
                    # quotes inside are literal ('category:" ”"')
                    closers = {'"'} if ch == '"' else _QUOTES
                    val = []
                    k = i + 1
                    while k < n:
                        if s[k] in closers:
                            if s[k] == '"' and k + 1 < n \
                                    and s[k + 1] == '"':
                                val.append('"')
                                k += 2
                                continue
                            k += 1
                            break
                        val.append(s[k])
                        k += 1
                    toks.append(Tok(
                        "fieldproc" if pend_is_fproc else "filter",
                        bool_field=pend_bool, value="".join(val),
                        love=love, hate=hate))
                    love = hate = False
                    pend_field = pend_bool = None
                    i = k
                    continue
                if not self._syntax_on:
                    # degraded pass (FLAG_PHRASE off): the quote is
                    # punctuation — breaks the group, phrases nothing
                    toks.append(Tok("brk"))
                    love = hate = False
                    pend_field = pend_bool = None
                    i += 1
                    continue
                j = i + 1
                while j < n and s[j] not in _QUOTES:
                    j += 1
                content = s[i + 1: j]  # unmatched → phrase to EOF
                words, groups = self._scan_phrase(content)
                if words:
                    qt = Tok("phrase", raw=content, words=words,
                             love=love, hate=hate, field=pend_field)
                    qt.pos_groups = groups
                    toks.append(qt)
                elif content.strip():
                    # a quoted section with content but no terms
                    # ('"~"') parses as QUOTE <nothing> QUOTE — a
                    # generic grammar error → degraded re-parse
                    raise _Degrade()
                else:
                    # whitespace-only '" "': ignored (lexer skips to
                    # the closing quote), still breaks the group
                    toks.append(Tok("brk"))
                love = hate = False
                pend_field = pend_bool = None
                i = j + 1 if j < n else n
                quote_close = i
                continue
            # a quote char in s[i-1] marks term-start only when it
            # OPENED a phrase; right after a closing quote, +/- is
            # glue punctuation ('"McSquare"+i' — golden
            # setProperty case), not a lovehate marker
            at_start = (i == 0 or s[i - 1].isspace()
                        or (s[i - 1] in "(\"“”" and i != quote_close))
            if ch in "+-" and not love and not hate and at_start:
                if self.vrps:
                    j2 = i
                    while j2 < n and not s[j2].isspace() \
                            and s[j2] not in _BREAK:
                        j2 += 1
                    if ".." in s[i:j2]:
                        # "-5..7" is a range, not a hated term
                        pass_range = True
                    else:
                        pass_range = False
                else:
                    pass_range = False
                if not pass_range and i + 1 < n \
                        and not s[i + 1].isspace() \
                        and s[i + 1] not in "+-)" and self._syntax_on:
                    love = ch == "+"
                    hate = ch == "-"
                    i += 1
                    continue
                if not pass_range:
                    # bare +/-: punctuation, breaks the group
                    toks.append(Tok("brk"))
                    i += 1
                    continue
            # word segment
            j = i
            while j < n and not s[j].isspace() and s[j] not in _BREAK:
                j += 1
            seg = s[i:j]
            next_ch = s[j] if j < n else ""
            i = j
            seg_toks = self._lex_segment(seg, love, hate, next_ch)
            if not seg_toks:
                # a tokenless segment ("!!", "/", ":)") still breaks
                # the adjacent-term grouping; a pending +/- survives
                # it (the reference already emitted the LOVE/HATE
                # token — '-> chr' hates chr)
                toks.append(Tok("brk"))
                if love or hate:
                    hold_lovehate = True
                continue
            hold_lovehate = False
            pending_only = bool(seg_toks) and all(
                t.kind in ("field_only", "bool_field_only",
                           "fieldproc_only")
                for t in seg_toks)
            for tok in seg_toks:
                if tok.kind == "field_only":
                    pend_field = tok.field
                    continue
                if tok.kind == "bool_field_only":
                    pend_bool = tok.bool_field
                    pend_is_fproc = False
                    continue
                if tok.kind == "fieldproc_only":
                    pend_bool = tok.bool_field
                    pend_is_fproc = True
                    continue
                toks.append(tok)
            if not pending_only:
                # a lovehate marker attached to field:"…" survives until
                # the quoted value ('hello -title:"hello world"')
                love = hate = False
        return toks

    def _lex_segment(self, seg: str, love: bool, hate: bool,
                     next_ch: str = "") -> List[Tok]:
        # ALL-CAPS operators (FLAG_BOOLEAN; off in the degraded pass)
        if seg in _OPS and self._syntax_on:
            return [Tok("op", raw=seg)]
        # value range "begin..end" (ValueRangeProcessor chain; first
        # processor that accepts wins — queryparser.h:117-306)
        if self.vrps and ".." in seg:
            begin, end = seg.split("..", 1)
            for vrp in self.vrps:
                node = vrp(begin, end)
                if node is not None:
                    return [Tok("range", range_node=node)]
        if self._syntax_on:
            # operator glued to a phrase by generators:
            # "one AND/two/three"
            m = re.match(r"(AND|OR|NOT|XOR)([.\-/:\\@]+)(.+)$", seg)
            if m and self._scan(m.group(3)):
                return [Tok("op", raw=m.group(1))] + self._lex_segment(
                    m.group(3), False, False, next_ch)
            m = re.fullmatch(r"(NEAR|ADJ)(?:/(\d+))?", seg)
            if m:
                return [Tok("posop", raw=m.group(1),
                            window=int(m.group(2) or DEFAULT_WINDOW))]
        # field prefix?
        fld = None
        body = seg
        if ":" in seg:
            head, rest = seg.split(":", 1)
            if head in self.field_procs:
                # probabilistic FieldProcessor: raw value → Query
                if rest:
                    return [Tok("fieldproc", bool_field=head,
                                value=rest, love=love, hate=hate)]
                if next_ch in _QUOTES:
                    return [Tok("fieldproc_only", bool_field=head)]
            if head in self.boolean_prefixes:
                if rest:
                    return [Tok("filter", bool_field=head, value=rest,
                                love=love, hate=hate)]
                if next_ch in _QUOTES:
                    return [Tok("bool_field_only", bool_field=head)]
            elif head in self.prefixes:
                # "author::foo" is NOT field syntax — the ':' joins a
                # phrase (golden "author::foo"); an empty/termless rest
                # falls back to scanning the whole segment ("author:/")
                if rest and not rest.startswith(":"):
                    spans = list(self._tg._scan_terms_spans(rest))
                    if spans:
                        fld = self.prefixes[head]
                        body = rest
                    elif not rest.strip("".join(_PHRASE_GEN) + "#+*"):
                        pass  # "author:/" → scan full segment
                elif not rest:
                    return [Tok("field_only",
                                field=self.prefixes[head])]

        all_spans = list(self._tg._scan_terms_spans(body))
        lead_break = bool(all_spans) and all_spans[0][1] > 0
        spans = [s_ for s_ in all_spans if isinstance(s_[0], str)]
        cjk_toks = [
            Tok("cjkrun", raw=s_[0][1], field=fld)
            for s_ in all_spans if not isinstance(s_[0], str)
        ] if self.cjk_ngram else []
        if not spans:
            return cjk_toks

        # group consecutive terms whose separator gap consists purely of
        # phrase generators ".-/:\@" (queryparser.lemony
        # is_phrase_generator) into implicit phrases
        chunks: List[List[Tuple[str, int, int]]] = [[spans[0]]]
        for prev, cur in zip(spans, spans[1:]):
            gap = body[prev[2]: cur[1]]
            if gap and all(c in _PHRASE_GEN for c in gap):
                chunks[-1].append(cur)
            else:
                chunks.append([cur])
        # trailing punctuation breaks the prob group — EXCEPT pure
        # phrase-generator runs other than '-' (goldens: "d-" and
        # "sorry," break; "function:" and "2003:" do not)
        tail = body[spans[-1][2]:]
        breaks = any(c not in "./:\\@-" for c in tail)
        # a phrase-generator or '-' tail on the FIRST token of a group
        # still breaks it ("d- school report" and "Warning: stat"
        # group their first token alone; "De lees- of ..." and
        # "function: imagecreate" keep going)
        breaks_if_first = bool(tail) and not breaks

        out: List[Tok] = []
        _n_chunks_emitted = 0
        if lead_break:
            # leading punctuation ("'localhost'", ":welke",
            # "`kernel_thread") separates this token from the group
            out.append(Tok("brk"))
        from xapian_spark.analysis.tokenizer import _is_wordchar

        for ci, chunk in enumerate(chunks):
            if ci > 0:
                # separating punctuation ("state=1", "a|so",
                # "offsetX,offsetY") breaks the adjacent-term group;
                # wordchar-only gaps (CJK runs between latin pieces)
                # do not
                gap = body[chunks[ci - 1][-1][2]: chunk[0][1]]
                if any(not _is_wordchar(c) for c in gap):
                    out.append(Tok("brk"))
            first = ci == 0
            last = ci == len(chunks) - 1
            words = [t for t, _s, _e in chunk]
            if len(words) > 1:
                t = Tok("phrase", raw=body, words=words,
                        love=love and first, hate=hate and first,
                        field=fld)
            else:
                term, s_, e_ = chunk[0]
                raw = body[s_: e_]
                if raw.rstrip("+") in _OPS and len(chunks) > 1 \
                        and term == raw.rstrip("+").lower() \
                        and self._syntax_on:
                    # an ALL-CAPS operator separated by glue
                    # punctuation ("scheduled+AND+nieuwsgroepen")
                    # still operates (the span may carry the trailing
                    # '+' the c++-suffix scan keeps)
                    out.append(Tok("op", raw=raw.rstrip("+")))
                    continue
                # stem preventer: a char glued right after the term
                # ("(/\@<>=*[{\"") blocks stemming (golden 'unmatched"')
                after = body[e_] if e_ < len(body) else \
                    (next_ch if last else "")
                t = Tok("word", raw=raw, words=[term],
                        love=love and first, hate=hate and first,
                        field=fld,
                        has_upper=raw[:1].isupper()
                        or after in _STEM_PREVENT,
                        wildcard=self._wildcard_flag and after == "*")
            if last:
                t.group_break = breaks
                t.break_if_first = breaks_if_first
            out.append(t)
        # CJK runs ride along in source order (interleaving with the
        # word chunks is approximated: runs first is fine for the
        # corpus cases where CJK and latin alternate as whole chunks)
        return _interleave_cjk(body, all_spans, out, cjk_toks)

    # -- term construction -------------------------------------------------

    def _make_term(self, word: str, prefix: Optional[str],
                   has_upper: bool, pos: int, stemmed: bool) -> ops.Term:
        p = prefix or ""
        if stemmed and self.stemmer is not None and not has_upper \
                and should_stem(word):
            t = ops.Term("Z" + p + self.stemmer(word), pos=pos)
        else:
            t = ops.Term(p + word, pos=pos)
        if p:
            # field-prefixed already — a surrounding field:(…) group must
            # not re-prefix it (golden "author:(twain OR title:pit …)")
            object.__setattr__(t, "_prefixed", True)
        return t

    @staticmethod
    def _field_prefixes(field) -> List[Optional[str]]:
        if field is None:
            return [None]
        if isinstance(field, str):
            return [field]
        return list(field)

    def _bool_terms(self, field: str, value: str) -> List[ops.Query]:
        """Boolean filter terms for a field value, one per registered
        prefix; ':' separator when the value starts with an ASCII
        capital (queryparser.lemony prefix_needs_colon:102-107).
        A FieldProcessor field delegates to its callable instead."""
        proc = self.bool_field_procs.get(field)
        if proc is not None:
            return [proc(value)]
        out = []
        for p in self.boolean_prefixes[field]:
            needs = (bool(value) and "A" <= value[0] <= "Z"
                     and len(p) > 1 and not p.endswith(":"))
            out.append(ops.Term(p + (":" if needs else "") + value))
        return out

    def _expand_wildcard(self, pattern: str, pos: int) -> ops.Query:
        """'wild*' → expanded query. With a parse-time term dictionary
        (set_database) this is the reference's 1.2 behavior: empty →
        MatchNothing, one → Term, many → OP_SYNONYM sharing the
        position (queryparsertest.cc test_qp_flag_wildcard1). Without
        one, emit an ops.Wildcard expanded at compile time against the
        index term_stats (the 1.3 behavior)."""
        if self._db_terms is None:
            return ops.Wildcard(
                pattern, max_expansion=self._max_wildcard_expansion)
        matches = [t for t in self._db_terms if t.startswith(pattern)]
        cap = self._max_wildcard_expansion
        if cap and len(matches) > cap:
            raise ops.WildcardError(
                f"Wildcard {pattern!r}* expands to more than {cap} "
                "terms")
        if not matches:
            return ops.MatchNothing()
        if len(matches) == 1:
            return ops.Term(matches[0], pos=pos)
        return ops.Synonym([ops.Term(t, pos=pos) for t in matches])

    def _word_node(self, tok: Tok, state: "_State") -> ops.Query:
        state.pos += 1
        prefixes = self._field_prefixes(tok.field)
        if tok.wildcard:
            variants = [v for v in
                        (self._expand_wildcard((p or "") + tok.words[0],
                                               state.pos)
                         for p in prefixes)
                        if not isinstance(v, ops.MatchNothing)]
            if not variants:
                return ops.MatchNothing()
            if len(variants) == 1:
                return variants[0]
            node = ops.Or(variants)
            object.__setattr__(node, "_prefixed", True)
            return node
        terms = [self._make_term(tok.words[0], p, tok.has_upper,
                                 state.pos, stemmed=True)
                 for p in prefixes]
        t = terms[0]
        # NEAR/ADJ may need to rebuild this term unstemmed
        object.__setattr__(t, "_src", (tok.words[0], prefixes[0]))
        if len(terms) > 1:
            # one field mapped to several prefixes ("authortitle") —
            # OR of the variants at the same position
            node = ops.Or(terms)
            object.__setattr__(node, "_prefixed", True)
            object.__setattr__(node, "_src",
                               (tok.words[0], list(prefixes)))
            object.__setattr__(node, "pos", state.pos)
            return node
        syns = self.synonyms.get(t.term)
        if syns:
            return ops.Synonym([t] + [ops.Term(s) for s in syns])
        return t

    def _phrase_node(self, tok: Tok, state: "_State") -> ops.Query:
        prefixes = self._field_prefixes(tok.field)
        start_pos = state.pos
        groups = getattr(tok, 'pos_groups', None) \
            or list(range(1, len(tok.words) + 1))
        variants = []
        for pi, prefix in enumerate(prefixes):
            terms = []
            prev_g = None
            pos = start_pos
            for w, gid in zip(tok.words, groups):
                if gid != prev_g:
                    pos += 1
                    prev_g = gid
                terms.append(self._make_term(w, prefix, True, pos,
                                             stemmed=False))
            if pi == 0:
                state.pos = pos
            if len(terms) == 1:
                variants.append(terms[0])
                continue
            node = ops.Phrase([t.term for t in terms],
                              window=len(terms))
            object.__setattr__(node, "positions",
                               tuple(t.pos for t in terms))
            variants.append(node)
        if len(variants) == 1:
            return variants[0]
        out = ops.Or(variants)
        object.__setattr__(out, "_prefixed", True)
        return out

    # -- parsing -----------------------------------------------------------

    def parse_query(self, s: str, partial: bool = False,
                    wildcard: bool = False) -> ops.Query:
        """`partial` = FLAG_PARTIAL (search-as-you-type,
        queryparser.lemony PARTIAL_TERM): when the query ends mid-word,
        that word matches as WILDCARD-or-stemmed so results update
        usefully on every keystroke. `wildcard` = FLAG_WILDCARD:
        explicit 'term*' right truncation (queryparser.h:404-415).

        Two-stage parse exactly like the reference
        (queryparser.cc:154-157): a strict pass with full syntax; on a
        GENERIC grammar error (stray ')', positional op that can't
        bind, ...) a silent re-parse with all syntax flags off — only
        the specific "Syntax: ..." errors propagate."""
        self._wildcard_flag = wildcard
        self._syntax_on = True
        try:
            return self._parse_attempt(s, partial)
        except _Degrade:
            self._wildcard_flag = False
            self._syntax_on = False
            try:
                return self._parse_attempt(s, False)
            finally:
                self._syntax_on = True

    def _parse_attempt(self, s: str, partial: bool) -> ops.Query:
        toks = self._lex(s)
        if partial and s and not s[-1].isspace() and toks \
                and toks[-1].kind == "word":
            last = toks[-1]
            word = last.words[0]
            p = self._field_prefixes(last.field)[0] or ""
            stemmed = self._make_term(word, last.field, last.has_upper,
                                      0, stemmed=True)
            last.kind = "partial"
            # the reference caps partial expansion at the 100 most
            # frequent terms (queryparser_internal.h
            # max_partial_expansion_ = 100, WILDCARD_LIMIT_MOST_FREQUENT)
            last.partial_node = ops.Or(
                [ops.Wildcard(p + word, max_expansion=100,
                              limit="most_frequent"),
                 ops.Term(stemmed.term)])
        state = _State(toks)
        q = self._parse_or(state)
        return q if q is not None else ops.MatchNothing()

    def _parse_or(self, st: "_State") -> Optional[ops.Query]:
        left = self._parse_xor(st)
        while st.peek_op("OR"):
            st.take()
            right = self._parse_xor(st)
            if left is None or right is None:
                raise QueryParserError(
                    "Syntax: <expression> OR <expression>")
            left = ops.Or([left, right])
        return left

    def _parse_xor(self, st: "_State") -> Optional[ops.Query]:
        left = self._parse_not(st)
        while st.peek_op("XOR"):
            st.take()
            right = self._parse_not(st)
            if left is None or right is None:
                raise QueryParserError(
                    "Syntax: <expression> XOR <expression>")
            left = ops.Xor([left, right])
        return left

    def _parse_not(self, st: "_State") -> Optional[ops.Query]:
        left = self._parse_and(st)
        while st.peek_op("NOT"):
            st.take()
            right = self._parse_and(st)
            if left is None or right is None:
                # leading NOT needs FLAG_PURE_NOT (not a default flag)
                raise QueryParserError(
                    "Syntax: <expression> NOT <expression>")
            left = ops.AndNot(left, right)
        return left

    def _parse_and(self, st: "_State") -> Optional[ops.Query]:
        left, lneg = self._parse_prob(st)
        while st.peek_op("AND"):
            st.take()
            negate = False
            if st.peek_op("NOT"):
                st.take()
                negate = True
            right, rneg = self._parse_prob(st)
            if left is None or right is None:
                raise QueryParserError(
                    "Syntax: <expression> AND NOT <expression>"
                    if negate else
                    "Syntax: <expression> AND <expression>")
            if negate or rneg:
                left = ops.AndNot(left, right)
            else:
                left = ops.And([left, right])
        return left

    # a prob-group: sequence of words/phrases/filters/groups up to the
    # next boolean op / rparen / EOF.  Returns (node, negate) where
    # negate=True means the group was a pure hated filter ("AND -site:x"
    # → AND_NOT 0*H...).
    def _parse_prob(self, st: "_State"
                    ) -> Tuple[Optional[ops.Query], bool]:
        chunks: List[ops.Query] = []     # phrase/group chunks, in order
        run: List[ops.Query] = []        # current run of plain terms
        loves: List[ops.Query] = []
        hates: List[ops.Query] = []
        filters: Dict[str, List[str]] = {}
        hate_filters: List[Tuple[str, str]] = []
        love_filters: Dict[str, List[str]] = {}
        ranges: List[ops.Query] = []
        void = False  # a required term expanded to nothing
        empty_positive = False  # a plain term expanded to nothing

        def close_run():
            if run:
                if and_mode:
                    # AND-mode runs fold pairwise-left
                    # ("one +two three" → ((one AND two) AND three))
                    node = run[0]
                    for r in run[1:]:
                        node = ops.And([node, r])
                    chunks.append(node)
                else:
                    chunks.append(run[0] if len(run) == 1
                                  else ops.Or(list(run)))
                run.clear()

        and_mode = self.default_op == "and"

        def add(node: ops.Query, love: bool, hate: bool,
                is_term: bool) -> None:
            if hate:
                hates.append(node)
            elif love and not and_mode:
                loves.append(node)
            elif is_term or (love and and_mode):
                # AND mode: loved terms are ordinary run members (AND
                # already requires them — test_and_queries)
                run.append(node)
            else:
                close_run()
                chunks.append(node)

        while True:
            tok = st.peek()
            if tok is None or tok.kind == "rparen" or \
                    (tok.kind == "op"):
                if tok is not None and tok.kind == "rparen":
                    if st.depth == 0:
                        # stray KET: generic grammar error → the whole
                        # query re-parses with syntax off
                        raise _Degrade()
                break
            if tok.kind == "posop":
                # positional chain: last plain term (or multi-prefix
                # variant group) NEAR next term(s)
                nxt = st.peek(1)
                left_ok = run and (
                    isinstance(run[-1], ops.Term)
                    or (isinstance(run[-1], ops.Or)
                        and getattr(run[-1], "_src", None) is not None))
                if left_ok and nxt is not None and nxt.kind == "word":
                    node = self._parse_positional(st, run)
                    if run:
                        pass  # chain replaced the last run entry
                    add(node, False, False, False)
                    continue
                # NEAR/ADJ that can't bind two terms: generic grammar
                # error → degraded re-parse (the op lexes as a term)
                raise _Degrade()
            st.take()
            if tok.kind == "lparen":
                st.depth += 1
                sub = self._parse_or(st)
                if st.peek() is not None and st.peek().kind == "rparen":
                    st.take()
                st.depth -= 1
                if sub is not None:
                    if tok.field is not None:
                        sub = _apply_prefix(
                            sub, self._field_prefixes(tok.field)[0])
                    add(sub, tok.love, tok.hate, False)
                else:
                    close_run()  # empty parens still break the group
                continue
            if tok.kind == "op":   # unreachable (loop breaks on op)
                continue
            if tok.kind == "filter":
                if tok.hate:
                    hate_filters.append((tok.bool_field, tok.value))
                elif tok.love:
                    love_filters.setdefault(tok.bool_field, []).append(
                        tok.value)
                else:
                    filters.setdefault(tok.bool_field, []).append(
                        tok.value)
                continue
            if tok.kind == "brk":
                close_run()
                continue
            if tok.kind == "cjkrun":
                st.pos += 1
                prefixes = [pp or "" for pp in
                            self._field_prefixes(tok.field)]
                rtext = tok.raw
                terms = []
                for kk in range(len(rtext)):
                    for pp in prefixes:
                        terms.append(ops.Term(pp + rtext[kk],
                                              pos=st.pos))
                    if kk + 1 < len(rtext):
                        for pp in prefixes:
                            terms.append(ops.Term(
                                pp + rtext[kk: kk + 2], pos=st.pos))
                node = terms[0] if len(terms) == 1 else ops.And(terms)
                if any(prefixes):
                    object.__setattr__(node, "_prefixed", True)
                # a CJK run is always its own chunk (breaks term runs)
                add(node, tok.love, tok.hate, False)
                continue
            if tok.kind == "range":
                ranges.append(tok.range_node)
                continue
            if tok.kind == "fieldproc":
                # probabilistic FieldProcessor: the callable builds the
                # node from the raw value (may raise QueryParserError)
                node = self.field_procs[tok.bool_field](tok.value)
                add(node, tok.love, tok.hate, False)
                continue
            if tok.kind == "partial":
                st.pos += 1
                node = tok.partial_node
                # stamp the position onto both alternatives
                fixed = []
                for c in node.children:
                    if isinstance(c, ops.Term):
                        fixed.append(ops.Term(c.term, c.wqf, st.pos))
                    else:
                        fixed.append(c)
                add(ops.Or(fixed), tok.love, tok.hate, False)
                continue
            if tok.kind == "word":
                was_empty = not run
                hate = tok.hate
                if (hate or (tok.love and not and_mode)) and run:
                    # a loved/hated term interrupts the adjacent-term
                    # group (lemony:942 "prevent the term after a LOVE
                    # or HATE starting a term group")
                    close_run()
                node = self._word_node(tok, st)
                if isinstance(node, ops.MatchNothing):
                    # empty wildcard expansion (queryparsertest
                    # test_qp_flag_wildcard1): hated → no-op; loved or
                    # AND-required → the whole query matches nothing;
                    # plain in OR → dropped (positions still advance)
                    if tok.love or (and_mode and not hate):
                        void = True
                    elif not hate:
                        empty_positive = True
                    continue
                add(node, tok.love, hate, True)
                if tok.group_break or (tok.break_if_first and was_empty
                                       and len(run) == 1):
                    close_run()
                continue
            if tok.kind == "phrase":
                add(self._phrase_node(tok, st), tok.love, tok.hate,
                    False)
                continue

        close_run()

        if void:
            return ops.MatchNothing(), False

        # assemble: chunks fold left-associatively with the default op
        combine = ops.And if and_mode else ops.Or
        base: Optional[ops.Query] = None
        for c in chunks:
            base = c if base is None else combine([base, c])
        if loves:
            lv = loves[0]
            for extra in loves[1:]:
                lv = ops.And([lv, extra])
            base = lv if base is None else ops.AndMaybe(lv, base)
        # boolean filters: OR within a field (and across a field's
        # multiple prefixes), AND across fields
        all_filters = dict(filters)
        for f, vs in love_filters.items():
            all_filters.setdefault(f, []).extend(vs)
        fnode: Optional[ops.Query] = None
        if all_filters:
            per_field = []
            for f in sorted(all_filters,
                            key=lambda f: self._bool_order[f]):
                terms = [t for v in all_filters[f]
                         for t in self._bool_terms(f, v)]
                combine_f = ops.And if f in self._nonexclusive \
                    else ops.Or
                per_field.append(terms[0] if len(terms) == 1
                                 else combine_f(terms))
            fnode = per_field[0] if len(per_field) == 1 \
                else ops.And(per_field)
        if any(isinstance(r, ops.MatchNothing) for r in ranges):
            # an invalid range (begin > end) empties the whole query
            return ops.MatchNothing(), False
        if ranges:
            by_col: Dict[str, List[ops.Query]] = {}
            for r in ranges:
                by_col.setdefault(getattr(r, "column", ""), []).append(r)
            per_col = [by_col[c][0] if len(by_col[c]) == 1
                       else ops.Or(by_col[c])
                       for c in sorted(by_col)]
            rnode = per_col[0] if len(per_col) == 1 else ops.And(per_col)
            fnode = rnode if fnode is None else ops.And([rnode, fnode])
        if fnode is not None:
            base = ops.ScaleWeight(fnode, 0.0) if base is None \
                else ops.Filter(base, fnode)
        negate = False
        if hate_filters:
            hterms = [t for f, v in hate_filters
                      for t in self._bool_terms(f, v)]
            hf = hterms[0] if len(hterms) == 1 else ops.Or(hterms)
            if base is None:
                base, negate = ops.ScaleWeight(hf, 0.0), True
            else:
                base = ops.AndNot(base, hf)
        if hates:
            hv = hates[0] if len(hates) == 1 else ops.Or(hates)
            if base is None:
                if empty_positive:
                    # an empty wildcard occupied the positive slot:
                    # Query() AND_NOT x == Query() (qp_flag_wildcard1
                    # "foo* -main"), unlike a pure-hate query where the
                    # hated term is demoted to the query itself
                    return ops.MatchNothing(), False
                base, negate = hv, True
            else:
                base = ops.AndNot(base, hv)
        return base, negate

    def _parse_positional(self, st: "_State",
                          run: List[ops.Query]) -> ops.Query:
        """run[-1] NEAR t2 NEAR t3 … — window from the FIRST op."""
        first = st.peek()
        cls = _POSITIONAL[first.raw]
        window = first.window
        left = run.pop()

        def alt_terms(word, prefixes, pos):
            """Unstemmed per-prefix variants (near_expr/adj_expr make
            the constituents unstemmed; a multi-prefix field yields a
            tuple of alternatives — as_opwindow_query's OR)."""
            ts = tuple(self._make_term(word, p, True, pos,
                                       stemmed=False).term
                       for p in prefixes)
            return ts[0] if len(ts) == 1 else ts

        src = getattr(left, "_src", None)
        if src is not None:
            prefs = src[1] if isinstance(src[1], list) else [src[1]]
            elems = [alt_terms(src[0], prefs, left.pos)]
        else:
            elems = [left.term]
        positions = [left.pos]
        while True:
            tok = st.peek()
            if tok is None or tok.kind != "posop" or tok.raw != first.raw:
                break
            nxt = st.peek(1)
            if nxt is None or nxt.kind != "word":
                break
            st.take()
            st.take()
            pos = _bump(st)
            elems.append(alt_terms(nxt.words[0],
                                   self._field_prefixes(nxt.field),
                                   pos))
            positions.append(pos)
        node = cls(elems, window=len(elems) + window - 1)
        object.__setattr__(node, "positions", tuple(positions))
        return node


def corrected_query_string(query: str, suggest_fn) -> str:
    """FLAG_SPELLING_CORRECTION analog
    (QueryParser::get_corrected_query_string): rewrite each plain word
    for which `suggest_fn(word_lower)` returns a replacement; quoted
    sections, operators, and prefixed terms are left alone."""
    out: List[str] = []
    in_quote = False
    for piece in re.split(r"(\s+)", query):
        if piece.count('"') % 2 == 1:
            in_quote = not in_quote
            out.append(piece)
            continue
        if (in_quote or not piece or piece.isspace() or piece in _OPS
                or ":" in piece or piece.startswith(("+", "-", "("))
                or not piece.isalpha()):
            out.append(piece)
            continue
        sug = suggest_fn(piece.lower())
        out.append(sug if sug else piece)
    return "".join(out)


def _interleave_cjk(body, all_spans, word_toks, cjk_toks):
    """Merge word tokens and CJK-run tokens back into source order."""
    if not cjk_toks:
        return word_toks
    out = []
    wi = ci = 0
    for s_ in all_spans:
        if isinstance(s_[0], str):
            if wi < len(word_toks):
                out.append(word_toks[wi])
                wi += 1
        else:
            if ci < len(cjk_toks):
                out.append(cjk_toks[ci])
                ci += 1
    out.extend(word_toks[wi:])
    out.extend(cjk_toks[ci:])
    return out


def _bump(st: "_State") -> int:
    st.pos += 1
    return st.pos


class _State:
    def __init__(self, toks: List[Tok]):
        self.toks = toks
        self.i = 0
        self.pos = 0
        self.depth = 0

    def peek(self, ahead: int = 0) -> Optional[Tok]:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def peek_op(self, name: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "op" and t.raw == name

    def take(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t


def _apply_prefix(q: ops.Query, prefix: str) -> ops.Query:
    """Re-prefix every term in a field:(…) group."""
    if getattr(q, "_prefixed", False):
        return q
    if isinstance(q, ops.Term):
        if getattr(q, "_prefixed", False):
            return q
        t = q.term
        if t.startswith("Z"):
            return ops.Term("Z" + prefix + t[1:], q.wqf, q.pos)
        return ops.Term(prefix + t, q.wqf, q.pos)
    if isinstance(q, (ops.And, ops.Or, ops.Xor, ops.Max, ops.Synonym)):
        return type(q)([_apply_prefix(c, prefix) for c in q.children])
    if isinstance(q, (ops.AndNot, ops.AndMaybe, ops.Filter)):
        return type(q)(_apply_prefix(q.left, prefix),
                       _apply_prefix(q.right, prefix))
    if isinstance(q, (ops.Phrase, ops.Near)):
        node = type(q)([prefix + t for t in q.terms_], q.window)
        object.__setattr__(node, "positions",
                           getattr(q, "positions", ()))
        return node
    return q


# ---------------------------------------------------------------------------
# describe — the reference Query::get_description format
# ---------------------------------------------------------------------------

def describe(q: ops.Query) -> str:
    """Render like the reference (api/queryinternal.cc get_description):
    terms as "Zstock@1", ops as "(l AND_NOT r)", phrases as
    "(a@1 PHRASE 2 b@2)", 0-scale as "0 * …"."""
    if isinstance(q, ops.MatchNothing):
        return ""
    if isinstance(q, ops.MatchAll):
        return "<alldocuments>"
    if isinstance(q, ops.ValueRange):
        def esc(v):
            if not isinstance(v, str):
                return v
            return "".join(
                c if 32 <= ord(c) < 127 else f"\\x{ord(c):02x}"
                for c in v)
        if q.lo is None:
            return f"VALUE_LE {q.column} {esc(q.hi)}"
        if q.hi is None:
            return f"VALUE_GE {q.column} {esc(q.lo)}"
        return f"VALUE_RANGE {q.column} {esc(q.lo)} {esc(q.hi)}"
    if isinstance(q, ops.Term):
        return f"{q.term}@{q.pos}" if q.pos else q.term
    if isinstance(q, ops.ScaleWeight):
        if q.factor == 0:
            return "0 * " + describe(q.child)
        return f"{q.factor} * " + describe(q.child)
    if isinstance(q, (ops.Phrase, ops.Near)):
        op = "PHRASE" if isinstance(q, ops.Phrase) else "NEAR"
        pos = getattr(q, "positions", ()) or (0,) * len(q.terms_)
        parts = []
        for t, p in zip(q.terms_, pos):
            if isinstance(t, tuple):
                parts.append("(" + " OR ".join(
                    f"{x}@{p}" if p else x for x in t) + ")")
            else:
                parts.append(f"{t}@{p}" if p else t)
        w = q.window if q.window is not None else len(q.terms_)
        return "(" + f" {op} {w} ".join(parts) + ")"
    if isinstance(q, (ops.And, ops.Or, ops.Xor, ops.Max, ops.Synonym)):
        name = {ops.And: "AND", ops.Or: "OR", ops.Xor: "XOR",
                ops.Max: "MAX", ops.Synonym: "SYNONYM"}[type(q)]
        return "(" + f" {name} ".join(describe(c)
                                      for c in q.children) + ")"
    if isinstance(q, ops.AndNot):
        return f"({describe(q.left)} AND_NOT {describe(q.right)})"
    if isinstance(q, ops.AndMaybe):
        return f"({describe(q.left)} AND_MAYBE {describe(q.right)})"
    if isinstance(q, ops.Filter):
        return f"({describe(q.left)} FILTER {describe(q.right)})"
    return repr(q)

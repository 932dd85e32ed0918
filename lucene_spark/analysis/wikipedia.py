"""Wikipedia-syntax tokenizer — the lucene/analysis/wikipedia role
(WikipediaTokenizer.java + the WikipediaTokenizerImpl.jflex grammar).

Re-implements the JFlex scanner as an explicit longest-match state
machine (states YYINITIAL / CATEGORY / INTERNAL_LINK / EXTERNAL_LINK /
TWO·THREE·FIVE_SINGLE_QUOTES / DOUBLE_EQUALS / DOUBLE_BRACE / STRING,
WikipediaTokenizerImpl.jflex:180-330), with JFlex's match resolution:
the longest match among the state's rules wins, declaration order
breaks ties, and the global ``[^] | TAGS`` fallback (inclusive %state
semantics) skips HTML tags everywhere. Token types mirror the
reference ids: ALPHANUM, APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST,
NUM, CJ, INTERNAL_LINK, EXTERNAL_LINK, EXTERNAL_LINK_URL, CITATION,
CATEGORY, BOLD, ITALICS, BOLD_ITALICS, HEADING, SUB_HEADING.

Output modes follow WikipediaTokenizer.java:105-214: TOKENS_ONLY
emits each scanner token (first external-link description token at
posInc 0, first-token posInc forced to 1); UNTOKENIZED_ONLY collapses
a same-construct run of an untokenized type into one token with
spaces sized by the offset gaps (collapseTokens); BOTH emits the
collapsed token flagged UNTOKENIZED_TOKEN_FLAG followed by the
individual tokens (collapseAndSaveTokens). Every
TestWikipediaTokenizer vector — testSimple, testHandwritten,
testLinkPhrases, testLinks, testLucene1133, testBoth, offsets,
types, position increments, and flags — is pinned in
tests/test_wikipedia.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# token type names (WikipediaTokenizer.java:58-103)
ALPHANUM = "<ALPHANUM>"
APOSTROPHE = "<APOSTROPHE>"
ACRONYM = "<ACRONYM>"
COMPANY = "<COMPANY>"
EMAIL = "<EMAIL>"
HOST = "<HOST>"
NUM = "<NUM>"
CJ = "<CJ>"
INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1

_L = r"A-Za-zÀ-ÖØ-öø-ÿĀ-῿ﾠ-ￜ"
_D = (r"0-9٠-٩۰-۹०-९০-৯"
      r"੦-੯૦-૯୦-୯௧-௯"
      r"౦-౯೦-೯൦-൯๐-๙"
      r"໐-໙၀-၉")
_K = r"가-힯ᄀ-ᇿ"
AN = rf"[{_L}{_D}{_K}]+"
ALPHA = rf"[{_L}]+"
HAS_DIGIT = rf"[{_L}{_D}]*[{_D}][{_L}{_D}]*"
P = r"[_\-/.,]"
_CJ = (r"[぀-㆏㄀-ㄯ゠-ヿㇰ-ㇿ"
       r"㌀-㍿㐀-䶿一-鿿豈-﫿"
       r"･-ﾟ]")
_NUM = (rf"(?:{AN}{P}{HAS_DIGIT}"
        rf"|[{_D}]+{P}[{_D}]+"
        rf"|{HAS_DIGIT}{P}{AN}"
        rf"|{AN}(?:{P}{HAS_DIGIT}{P}{AN})+"
        rf"|{HAS_DIGIT}(?:{P}{AN}{P}{HAS_DIGIT})+"
        rf"|{AN}{P}{HAS_DIGIT}(?:{P}{AN}{P}{HAS_DIGIT})+"
        rf"|{HAS_DIGIT}{P}{AN}(?:{P}{HAS_DIGIT}{P}{AN})+)")
_TAGS = rf"</?{AN}(?:\s*{AN}=\"{AN}\")*>"
_URL = rf"(?:http://|https://){AN}(?:\.{AN})+[{_L}{_D}{_K}_\-/.,?&=#]*"

_S_INIT, _S_CAT, _S_ILINK, _S_ELINK, _S_2SQ, _S_3SQ, _S_5SQ, \
    _S_2EQ, _S_BRACE, _S_STRING = range(10)


@dataclass
class WikiToken:
    text: str
    type: str
    start: int
    end: int
    position_increment: int
    flags: int = 0


class _Scanner:
    """The jflex scanner: yields (text, type, start, pos_inc,
    num_wiki_tokens_seen) tuples."""

    def __init__(self, text: str):
        self.s = text
        self.pos = 0
        self.state = _S_INIT
        self.tok_type: str | None = None
        self.num_balanced = 0
        self.position_inc = 1
        self.num_link_toks = 0
        self.num_wiki_seen = 0
        self._rules = _RULES

    def next_token(self):
        s, n = self.s, len(self.s)
        while self.pos < n:
            best_len, best_action, best_m = 0, None, None
            for rx, action in self._rules[self.state]:
                m = rx.match(s, self.pos)
                if m is not None and m.end() - self.pos > best_len:
                    best_len = m.end() - self.pos
                    best_action, best_m = action, m
            if best_action is None:     # lone unmatched char: skip
                self.pos += 1
                continue
            start = self.pos
            self.pos = best_m.end()
            emit = best_action(self, best_m.group(0))
            if emit is not None:
                return (best_m.group(0), emit, start,
                        self.position_inc, self.num_wiki_seen)
        return None


# ---- rule actions ------------------------------------------------------

def _emit(tok_type):
    def action(sc: _Scanner, _text: str):
        sc.position_inc = 1
        return tok_type
    return action


def _wiki_emit(sc: _Scanner, _text: str):
    sc.num_wiki_seen += 1
    return sc.tok_type


def _skip(sc: _Scanner, _text: str):
    return None


def _skip_inc(sc: _Scanner, _text: str):
    sc.position_inc = 1
    return None


def _init_ignore(sc: _Scanner, _text: str):
    sc.num_wiki_seen = 0
    sc.position_inc = 1
    return None


def _enter(state, tok_type, reset_balanced=False):
    def action(sc: _Scanner, _text: str):
        sc.num_wiki_seen = 0
        sc.position_inc = 1
        sc.tok_type = tok_type
        if reset_balanced:
            sc.num_balanced = 0
        sc.state = state
        return None
    return action


def _enter_override(state, tok_type):
    # the "links inside override" transitions do NOT touch position_inc
    def action(sc: _Scanner, _text: str):
        sc.num_wiki_seen = 0
        sc.tok_type = tok_type
        sc.state = state
        return None
    return action


def _two_quotes(sc: _Scanner, _text: str):
    sc.num_wiki_seen = 0
    sc.position_inc = 1
    if sc.num_balanced == 0:
        sc.num_balanced += 1
        sc.state = _S_2SQ
    else:
        sc.num_balanced = 0
    return None


def _enter_2eq(sc: _Scanner, _text: str):
    sc.num_wiki_seen = 0
    sc.position_inc = 1
    sc.state = _S_2EQ
    return None


def _ilink_close(sc: _Scanner, _text: str):
    sc.num_link_toks = 0
    sc.state = _S_INIT
    return None


def _cat_close(sc: _Scanner, _text: str):
    sc.state = _S_INIT
    return None


def _elink_url(sc: _Scanner, _text: str):
    sc.position_inc = 1
    sc.num_wiki_seen += 1
    return sc.tok_type


def _elink_word(sc: _Scanner, _text: str):
    sc.position_inc = 0 if sc.num_link_toks == 0 else 1
    sc.num_wiki_seen += 1
    sc.tok_type = EXTERNAL_LINK
    sc.num_link_toks += 1
    return sc.tok_type


def _elink_close(sc: _Scanner, _text: str):
    sc.num_link_toks = 0
    sc.position_inc = 0
    sc.state = _S_INIT
    return None


def _to_bold(sc: _Scanner, _text: str):
    sc.tok_type = BOLD
    sc.state = _S_3SQ
    return None


def _to_bold_italics(sc: _Scanner, _text: str):
    sc.tok_type = BOLD_ITALICS
    sc.state = _S_5SQ
    return None


def _italics_word(sc: _Scanner, _text: str):
    sc.tok_type = ITALICS
    sc.num_wiki_seen += 1
    sc.state = _S_STRING
    return sc.tok_type


def _quotes_word(sc: _Scanner, _text: str):
    sc.state = _S_STRING
    sc.num_wiki_seen += 1
    return sc.tok_type


def _sub_heading(sc: _Scanner, _text: str):
    sc.tok_type = SUB_HEADING
    sc.num_wiki_seen = 0
    sc.state = _S_STRING
    return None


def _heading_word(sc: _Scanner, _text: str):
    sc.tok_type = HEADING
    sc.num_wiki_seen += 1
    return sc.tok_type


def _eq_close(sc: _Scanner, _text: str):
    sc.state = _S_INIT
    return None


def _brace_word(sc: _Scanner, _text: str):
    sc.num_wiki_seen = 0
    return sc.tok_type


def _brace_close(sc: _Scanner, _text: str):
    sc.state = _S_INIT
    return None


def _string_end(sc: _Scanner, _text: str):
    sc.num_balanced = 0
    sc.tok_type = ALPHANUM
    sc.state = _S_INIT
    return None


def _string_word(sc: _Scanner, _text: str):
    sc.num_wiki_seen += 1
    return sc.tok_type


def _string_pipe(sc: _Scanner, _text: str):
    return sc.tok_type


def _string_override(state, tok_type):
    def action(sc: _Scanner, _text: str):
        sc.num_balanced = 0
        sc.num_wiki_seen = 0
        sc.tok_type = tok_type
        sc.state = state
        return None
    return action


def _rx(p: str):
    return re.compile(p)


_GLOBAL_FALLBACK = (_rx(rf"(?s:{_TAGS}|.)"), _skip)

_RULES = {
    _S_INIT: [
        (_rx(AN), _emit(ALPHANUM)),
        (_rx(rf"{ALPHA}(?:'{ALPHA})+"), _emit(APOSTROPHE)),
        (_rx(rf"{ALPHA}\.(?:{ALPHA}\.)+"), _emit(ACRONYM)),
        (_rx(rf"{ALPHA}[&@]{ALPHA}"), _emit(COMPANY)),
        (_rx(rf"{AN}(?:[.\-_]{AN})*@{AN}(?:[.\-]{AN})+"), _emit(EMAIL)),
        (_rx(_NUM), _emit(NUM)),
        (_rx(rf"{AN}(?:\.{AN})+"), _emit(HOST)),
        (_rx(_CJ), _emit(CJ)),
        (_rx(r"\[\["), _enter(_S_ILINK, INTERNAL_LINK)),
        (_rx(r"\[\[:?Category:"), _enter(_S_CAT, CATEGORY)),
        (_rx(r"\["), _enter(_S_ELINK, EXTERNAL_LINK_URL)),
        (_rx(r"''"), _two_quotes),
        (_rx(r"=="), _enter_2eq),
        (_rx(r"\{\{"), _enter(_S_BRACE, CITATION)),
        (_rx(r"<ref>"), _enter(_S_BRACE, CITATION)),
        (_rx(rf"(?s:.|\{{\{{[Ii]nfobox_)"), _init_ignore),
        _GLOBAL_FALLBACK,
    ],
    _S_ILINK: [
        (_rx(AN), _wiki_emit),
        (_rx(r"\]\]"), _ilink_close),
        (_rx(r"(?s:.)"), _skip_inc),
        _GLOBAL_FALLBACK,
    ],
    _S_ELINK: [
        (_rx(_URL), _elink_url),
        (_rx(AN), _elink_word),
        (_rx(r"\]"), _elink_close),
        (_rx(r"\r\n|[ \r\n\t\f]"), _skip_inc),
        _GLOBAL_FALLBACK,
    ],
    _S_CAT: [
        (_rx(AN), _wiki_emit),
        (_rx(r"\]\]"), _cat_close),
        (_rx(r"(?s:.)"), _skip_inc),
        _GLOBAL_FALLBACK,
    ],
    _S_2SQ: [
        (_rx(r"'"), _to_bold),
        (_rx(r"'''"), _to_bold_italics),
        (_rx(AN), _italics_word),
        (_rx(r"\[\["), _enter_override(_S_ILINK, INTERNAL_LINK)),
        (_rx(r"\[\[:?Category:"), _enter_override(_S_CAT, CATEGORY)),
        (_rx(r"\["), _enter_override(_S_ELINK, EXTERNAL_LINK)),
        (_rx(r"(?s:.)"), _skip),
        _GLOBAL_FALLBACK,
    ],
    _S_3SQ: [
        (_rx(AN), _quotes_word),
        (_rx(r"\[\["), _enter_override(_S_ILINK, INTERNAL_LINK)),
        (_rx(r"\[\[:?Category:"), _enter_override(_S_CAT, CATEGORY)),
        (_rx(r"\["), _enter_override(_S_ELINK, EXTERNAL_LINK)),
        (_rx(r"(?s:.)"), _skip),
        _GLOBAL_FALLBACK,
    ],
    _S_5SQ: [
        (_rx(AN), _quotes_word),
        (_rx(r"\[\["), _enter_override(_S_ILINK, INTERNAL_LINK)),
        (_rx(r"\[\[:?Category:"), _enter_override(_S_CAT, CATEGORY)),
        (_rx(r"\["), _enter_override(_S_ELINK, EXTERNAL_LINK)),
        (_rx(r"(?s:.)"), _skip),
        _GLOBAL_FALLBACK,
    ],
    _S_2EQ: [
        (_rx(r"="), _sub_heading),
        (_rx(AN), _heading_word),
        (_rx(r"=="), _eq_close),
        (_rx(r"(?s:.)"), _skip),
        _GLOBAL_FALLBACK,
    ],
    _S_BRACE: [
        (_rx(AN), _brace_word),
        (_rx(r"\}\}"), _brace_close),
        (_rx(r"</ref>"), _brace_close),
        (_rx(r"(?s:.)"), _skip),
        _GLOBAL_FALLBACK,
    ],
    _S_STRING: [
        (_rx(r"'''''"), _string_end),
        (_rx(r"'''"), _string_end),
        (_rx(r"''"), _string_end),
        (_rx(r"==="), _string_end),
        (_rx(AN), _string_word),
        (_rx(r"\[\["), _string_override(_S_ILINK, INTERNAL_LINK)),
        (_rx(r"\[\[:?Category:"), _string_override(_S_CAT, CATEGORY)),
        (_rx(r"\["), _string_override(_S_ELINK, EXTERNAL_LINK)),
        (_rx(r"\|"), _string_pipe),
        (_rx(r"(?s:.)"), _skip),
        _GLOBAL_FALLBACK,
    ],
}


def wikipedia_tokens(text: str, token_output: int = TOKENS_ONLY,
                     untokenized_types: frozenset = frozenset()) -> list[WikiToken]:
    """WikipediaTokenizer over `text` (WikipediaTokenizer.java
    incrementToken / collapseTokens / collapseAndSaveTokens)."""
    sc = _Scanner(text)
    raw = []
    while True:
        t = sc.next_token()
        if t is None:
            break
        raw.append(t)

    out: list[WikiToken] = []
    first = True
    i = 0
    while i < len(raw):
        tok_text, tok_type, start, pos_inc, seen = raw[i]
        if token_output == TOKENS_ONLY \
                or tok_type not in untokenized_types:
            inc = 1 if (first and pos_inc == 0) else pos_inc
            out.append(WikiToken(tok_text, tok_type, start,
                                 start + len(tok_text), inc))
            first = False
            i += 1
            continue
        # collapse the same-construct run (numWikiTokensSeen strictly
        # increasing, java:168-205)
        run = [raw[i]]
        num_seen = 0
        j = i + 1
        while j < len(raw) and raw[j][1] == tok_type \
                and raw[j][4] > num_seen:
            run.append(raw[j])
            num_seen += 1
            j += 1
        buf = []
        last_pos = run[0][2]
        for r_text, _, r_start, _, _ in run:
            buf.append(" " * (r_start - last_pos))
            buf.append(r_text)
            last_pos = r_start + len(r_text)
        collapsed_text = "".join(buf)
        c_start = run[0][2]
        inc = 1 if (first and run[0][3] == 0) else run[0][3]
        flags = UNTOKENIZED_TOKEN_FLAG if token_output == BOTH else 0
        out.append(WikiToken(collapsed_text, tok_type, c_start,
                             c_start + len(collapsed_text), inc, flags))
        first = False
        if token_output == BOTH:
            for k, (r_text, _, r_start, r_inc, _) in enumerate(run):
                out.append(WikiToken(
                    r_text, tok_type, r_start, r_start + len(r_text),
                    0 if k == 0 else r_inc))
        i = j
    return out

"""ClassicTokenizer/ClassicFilter/ClassicAnalyzer — the
lucene/analysis/classic role (the pre-3.1 StandardAnalyzer grammar).

The ClassicTokenizerImpl.jflex grammar as a longest-match scanner:
ALPHANUM (letters+Thai+digits), APOSTROPHE (O'Reilly), ACRONYM
(U.S.A.), COMPANY (AT&T, Excite@Home), EMAIL, HOST (www.nutch.org —
declared BEFORE NUM, so 62.46 is a <HOST>, the documented JavaCC
compliance quirk), NUM (alternating digit-bearing segments joined by
_-/., e.g. 978-0-94045043-1, mid-20th,
78academyawards/rules/rule02.html), CJ unigrams. LETTER is Unicode
letters (Lu/Ll/Lt/Lo — modifier letters split, per
TestClassicAnalyzer's testˆtest vector) minus the CJ ranges;
Korean syllables are ordinary letters. Tokens longer than
max_token_length are skipped with their position increment
accumulating (testMaxTermLength2).

ClassicFilter strips a trailing 's from APOSTROPHE tokens and all
dots from ACRONYM tokens (ClassicFilter.java:33-54); ClassicAnalyzer
chains tokenizer → ClassicFilter → LowerCase → Stop(English). Every
TestClassicAnalyzer vector is pinned in tests/test_classic.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

ALPHANUM = "<ALPHANUM>"
APOSTROPHE = "<APOSTROPHE>"
ACRONYM = "<ACRONYM>"
COMPANY = "<COMPANY>"
EMAIL = "<EMAIL>"
HOST = "<HOST>"
NUM = "<NUM>"
CJ = "<CJ>"
ACRONYM_DEP = "<ACRONYM_DEP>"

_CJ_RANGES = ((0x3100, 0x312F), (0x3040, 0x309F), (0x30A0, 0x30FF),
              (0x31F0, 0x31FF), (0x3300, 0x337F), (0x3400, 0x4DBF),
              (0x4E00, 0x9FFF), (0xF900, 0xFAFF), (0xFF65, 0xFF9F))

_RULES = None


def _ranges_to_class(cps: list[int]) -> str:
    parts = []
    i = 0
    while i < len(cps):
        j = i
        while j + 1 < len(cps) and cps[j + 1] == cps[j] + 1:
            j += 1
        a, b = cps[i], cps[j]
        if a == b:
            parts.append(re.escape(chr(a)))
        else:
            parts.append(f"{re.escape(chr(a))}-{re.escape(chr(b))}")
        i = j + 1
    return "".join(parts)


def _build_rules():
    global _RULES
    if _RULES is not None:
        return _RULES
    import unicodedata

    def in_cj(cp: int) -> bool:
        return any(a <= cp <= b for a, b in _CJ_RANGES)

    letters, digits = [], []
    for cp in range(0x10000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        cat = unicodedata.category(chr(cp))
        if cat in ("Lu", "Ll", "Lt", "Lo") and not in_cj(cp):
            letters.append(cp)
        elif cat == "Nd":
            digits.append(cp)

    L = _ranges_to_class(letters)
    D = _ranges_to_class(digits)
    THAI = "฀-๙"
    AN = f"[{L}{THAI}{D}]+"
    ALPHA = f"[{L}]+"
    HD = f"[{L}{D}]*[{D}][{L}{D}]*"       # HAS_DIGIT
    P = r"[_\-/.,]"
    CJC = "".join(f"{chr(a)}-{chr(b)}" for a, b in _CJ_RANGES)
    # each NUM alternative is its own rule so the longest-match scan
    # considers all of them (Python alternation is leftmost, not
    # longest)
    num_alts = [f"{AN}{P}{HD}",
                f"{HD}{P}{AN}",
                f"{AN}(?:{P}{HD}{P}{AN})+",
                f"{HD}(?:{P}{AN}{P}{HD})+",
                f"{AN}{P}{HD}(?:{P}{AN}{P}{HD})+",
                f"{HD}{P}{AN}(?:{P}{HD}{P}{AN})+"]

    _RULES = [
        (re.compile(AN), ALPHANUM),
        (re.compile(f"{ALPHA}(?:'{ALPHA})+"), APOSTROPHE),
        (re.compile(f"[{L}]\\.(?:[{L}]\\.)+"), ACRONYM),
        (re.compile(f"{ALPHA}[&@]{ALPHA}"), COMPANY),
        (re.compile(f"{AN}(?:[.\\-_]{AN})*@{AN}(?:[.\\-]{AN})+"),
         EMAIL),
        (re.compile(f"{AN}(?:\\.{AN})+"), HOST),
        *[(re.compile(alt), NUM) for alt in num_alts],
        (re.compile(f"[{CJC}]"), CJ),
        (re.compile(f"{AN}\\.(?:{AN}\\.)+"), ACRONYM_DEP),
    ]
    return _RULES


@dataclass(frozen=True)
class ClassicToken:
    text: str
    type: str
    start: int
    end: int
    position_increment: int = 1


def classic_tokens(text: str,
                   max_token_length: int = 255) -> list[ClassicToken]:
    """ClassicTokenizer: longest match wins, declaration order breaks
    ties; over-length tokens are skipped with posInc accumulation."""
    rules = _build_rules()
    out: list[ClassicToken] = []
    pos, n = 0, len(text)
    pending_inc = 1
    while pos < n:
        best_len, best_type, best_m = 0, None, None
        for rx, tok_type in rules:
            m = rx.match(text, pos)
            if m is not None and m.end() - pos > best_len:
                best_len, best_type, best_m = m.end() - pos, tok_type, m
        if best_m is None:
            pos += 1
            continue
        tok = best_m.group(0)
        pos = best_m.end()
        if len(tok) > max_token_length:
            pending_inc += 1          # skipped: hole in positions
            continue
        if best_type == ACRONYM_DEP:
            # LUCENE-1068 (ClassicTokenizer.java:147-149): deprecated
            # acronym form is served as HOST minus the trailing dot
            out.append(ClassicToken(tok[:-1], HOST, best_m.start(),
                                    best_m.end(), pending_inc))
        else:
            out.append(ClassicToken(tok, best_type, best_m.start(),
                                    best_m.end(), pending_inc))
        pending_inc = 1
    return out


def classic_filter(tokens: list[ClassicToken]) -> list[ClassicToken]:
    """ClassicFilter: 's stripped from APOSTROPHE, dots from ACRONYM."""
    out = []
    for t in tokens:
        text = t.text
        if t.type == APOSTROPHE and len(text) >= 2 \
                and text[-2:] in ("'s", "'S"):
            text = text[:-2]
        elif t.type == ACRONYM:
            text = text.replace(".", "")
        out.append(ClassicToken(text, t.type, t.start, t.end,
                                t.position_increment))
    return out


def classic_analyzer_tokens(text: str, stopwords=None,
                            max_token_length: int = 255) -> list[ClassicToken]:
    """ClassicAnalyzer chain: tokenizer → ClassicFilter → lowercase →
    stop filter (position increments accumulate across drops)."""
    if stopwords is None:
        from lucene_spark.analysis.analyzers import ENGLISH_STOP_WORDS
        stopwords = ENGLISH_STOP_WORDS
    out = []
    pending = 0
    for t in classic_filter(classic_tokens(text, max_token_length)):
        low = t.text.lower()
        if low in stopwords:
            pending += t.position_increment
            continue
        out.append(ClassicToken(low, t.type, t.start, t.end,
                                t.position_increment + pending))
        pending = 0
    return out

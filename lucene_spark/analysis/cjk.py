"""CJK analysis — width folding + bigram tokenization.

Role analogue: lucene/analysis/common/.../cjk/CJKAnalyzer.java
(createComponents: StandardTokenizer → CJKWidthFilter → LowerCaseFilter →
CJKBigramFilter → StopFilter), cjk/CJKWidthFilter.java (fullwidth-ASCII +
halfwidth-katakana folding with voiced-mark composition),
cjk/CJKBigramFilter.java (sliding bigrams over runs of adjacent CJK
codepoints; a lone CJK codepoint is emitted as a unigram).

Divergence note (documented): the reference folds width per-token after
StandardTokenizer; we fold on the whole string before tokenizing. The fold
is character-local (the only contextual rule — voiced-mark composition —
looks one char back, and a mark is always adjacent to its kana), and width
folding never changes UAX#29 token boundaries for these classes, so the
emitted token stream is identical. Verified against the reference's own
TestCJKAnalyzer vectors in tests/test_cjk.py.
"""

from __future__ import annotations

import re

import pandas as pd

# --- CJKWidthFilter tables (cjk/CJKWidthFilter.java:45-56, 88-105) -------

# halfwidth kana 0xFF65-0xFF9D → fullwidth kana (FF9E/FF9F fall back to the
# combining voiced marks when they cannot compose with the previous char)
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]

# kana voiced / half-voiced combining deltas, indexed from 0x30A6
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]

_HALFWIDTH_RE = re.compile("[！-～･-ﾟ]")


def cjk_width_fold(text: str) -> str:
    """CJKWidthFilter semantics on a plain string."""
    if not _HALFWIDTH_RE.search(text):
        return text
    out: list[str] = []
    for ch in text:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:           # fullwidth ASCII variants
            out.append(chr(cp - 0xFEE0))
        elif 0xFF65 <= cp <= 0xFF9F:         # halfwidth katakana variants
            if cp in (0xFF9E, 0xFF9F) and out:
                prev = ord(out[-1])
                if 0x30A6 <= prev <= 0x30FD:
                    delta = (_KANA_COMBINE_HALF_VOICED if cp == 0xFF9F
                             else _KANA_COMBINE_VOICED)[prev - 0x30A6]
                    if delta:
                        out[-1] = chr(prev + delta)
                        continue
            out.append(chr(_KANA_NORM[cp - 0xFF65]))
        else:
            out.append(ch)
    return "".join(out)


# --- CJKBigramFilter --------------------------------------------------------

# codepoint classes StandardTokenizer types as HAN/HIRAGANA/KATAKANA/HANGUL
# (all bigrammed by default — CJKBigramFilter.java:41-48). Blocks: Hangul
# jamo + syllables, kana (incl. combining marks and small-kana extensions),
# CJK ext-A, unified ideographs, compatibility ideographs, 〆/〇/々.
_CJK = ("ᄀ-ᇿ々〇〡-〩ぁ-ゟ゠-ヿ"
        "ㇰ-ㇿ㐀-䶿一-鿿ꥠ-꥿가-힣"
        "ힰ-퟿豈-﫿"
        "\U00020000-\U0002FA1F")  # ext B..compat supplement: the
                                  # reference sees these as surrogate
                                  # pairs typed HAN; Python regex works
                                  # on codepoints so a plain range works
# a token is either a run of CJK codepoints or a run of word chars that are
# not CJK (the \w+ the standard chain would produce). \w excludes combining
# marks (Mn/Mc) that UAX#29 keeps token-internal — same fix as the _MN class
# in analyzers.py (Latin/Cyrillic combining, Hebrew points, Arabic harakat,
# Devanagari/Bengali signs): without it رُوبرت splits at the damma.
_MARKS = ("\u0300-\u036f\u0483-\u0489\u0591-\u05bd\u05bf\u05c1\u05c2\u05c4\u05c5"
          "\u05c7\u0610-\u061a\u064b-\u065f\u0670\u06d6-\u06dc\u06df-\u06e8"
          "\u06ea-\u06ed\u0900-\u0903\u093a-\u093c\u093e-\u094f\u0951-\u0957"
          "\u0962\u0963\u0981-\u0983\u09bc\u09be-\u09c4\u09c7\u09c8"
          "\u09cb-\u09cd\u09d7\u09e2\u09e3")
_W = f"[\\w{_MARKS}]"
_CJK_TOKEN_RE = re.compile(f"[{_CJK}]+|(?:(?![{_CJK}]){_W})+")
_CJK_RUN_RE = re.compile(f"[{_CJK}]")


def cjk_token_lists(content: pd.Series) -> pd.Series:
    """Series[str] → Series[list[str]]: width fold, lowercase, then CJK runs
    become sliding bigrams (lone codepoint → unigram); non-CJK word runs pass
    through whole. Stop/length filtering is applied by the shared chain."""
    s = content.map(cjk_width_fold).str.lower()

    def emit(text: str) -> list[str]:
        out: list[str] = []
        for m in _CJK_TOKEN_RE.finditer(text):
            tok = m.group(0)
            if _CJK_RUN_RE.match(tok):
                if len(tok) == 1:
                    out.append(tok)          # lone CJK char: unigram
                else:
                    out.extend(tok[i:i + 2] for i in range(len(tok) - 1))
            else:
                out.append(tok)
        return out

    return s.map(emit)

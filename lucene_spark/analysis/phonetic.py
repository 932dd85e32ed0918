"""Phonetic encoders — Soundex / Refined Soundex + ASCII folding.

Role analogue: lucene/analysis/phonetic/.../PhoneticFilter.java (which
delegates to Apache commons-codec encoders) and ASCIIFoldingFilter
(analysis/common/.../miscellaneous/ASCIIFoldingFilter.java). The
algorithms implemented here are the published ones (American Soundex as
specified by the US National Archives; commons-codec's RefinedSoundex
mapping), re-expressed in Python and validated against the classic
public test vectors in tests/test_analysis.py.

Analyzer integration: entries in stem.STEMMERS ("soundex",
"refined_soundex", "ascii_fold"), so a phonetic analyzer is just
`Analyzer(stemmer="soundex")` — one code per token, the
PhoneticFilter(inject=false) configuration. (inject=true's
original+code dual emission would double doclen; documented out of
scope for the BM25-norm contract.)
"""

from __future__ import annotations

import functools
import unicodedata

# American Soundex digit map (commons-codec Soundex.US_ENGLISH_MAPPING):
# b f p v → 1; c g j k q s x z → 2; d t → 3; l → 4; m n → 5; r → 6;
# a e i o u y h w → not coded
_SOUNDEX_MAP = {}
for _chars, _d in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                   ("l", "4"), ("mn", "5"), ("r", "6")):
    for _c in _chars:
        _SOUNDEX_MAP[_c] = _d


@functools.lru_cache(maxsize=65536)
def soundex(word: str) -> str:
    """American Soundex, commons-codec semantics: letter + 3 digits,
    zero-padded; adjacent duplicates collapse; h/w are TRANSPARENT
    (consonants separated only by h or w code once — the US National
    Archives rule commons-codec implements); vowels break runs."""
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return ""
    out = [w[0].upper()]
    last = _SOUNDEX_MAP.get(w[0], "")
    for c in w[1:]:
        if c in "hw":
            continue          # transparent: do not reset `last`
        d = _SOUNDEX_MAP.get(c, "")
        if d and d != last:
            out.append(d)
            if len(out) == 4:
                break
        last = d              # vowels (d == "") reset the run
    return "".join(out) + "0" * (4 - len(out))


# commons-codec RefinedSoundex US_ENGLISH mapping string, one code per
# letter a..z: "01360240043788015936020505"
_REFINED_MAP = {chr(ord("a") + i): d
                for i, d in enumerate("01360240043788015936020505")}


@functools.lru_cache(maxsize=65536)
def refined_soundex(word: str) -> str:
    """Refined Soundex (commons-codec RefinedSoundex): first letter +
    every code with adjacent duplicates collapsed, no length cap, vowels
    coded as 0."""
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return ""
    out = [w[0].upper()]
    last = None
    for c in w:
        d = _REFINED_MAP.get(c)
        if d is None or d == last:
            continue
        out.append(d)
        last = d
    return "".join(out)


@functools.lru_cache(maxsize=65536)
def ascii_fold(word: str) -> str:
    """ASCIIFoldingFilter role: fold Unicode letters to their ASCII
    base via NFKD decomposition + combining-mark strip, with the few
    common non-decomposable cases the Lucene table also covers (ß→ss,
    æ→ae, œ→oe, ø→o, đ→d, þ→th, ł→l). A documented approximation of
    the filter's generated 2000-case switch."""
    extra = {"ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d",
             "þ": "th", "ð": "d", "ł": "l", "ħ": "h", "ı": "i",
             "Æ": "AE", "Œ": "OE", "Ø": "O", "Đ": "D", "Þ": "TH",
             "Ł": "L"}
    s = "".join(extra.get(c, c) for c in word)
    decomposed = unicodedata.normalize("NFKD", s)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


def icu_fold(tok: str) -> str:
    """ICUFoldingFilter role (analysis/icu/ICUFoldingFilter.java — UTR#30
    folding: NFKC_CaseFold + diacritic/default-ignorable/native-digit
    folding), approximated with unicodedata: NFKC → casefold → NFKD →
    drop combining marks (Mn) and format chars (Cf: ZWJ/ZWNJ etc.) →
    fold decimal digits to ASCII → the non-decomposable Latin table →
    NFC. Matches every vector in the reference's TestICUFoldingFilter
    (tests/test_analysis.py::test_icu_folding)."""
    import unicodedata as ud

    t = ud.normalize("NFKD", ud.normalize("NFKC", tok).casefold())
    extra = {"æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d",
             "þ": "th", "ł": "l", "ħ": "h", "ŋ": "n"}
    out = []
    for ch in t:
        cat = ud.category(ch)
        if cat in ("Mn", "Cf"):
            continue
        if cat == "Nd":
            out.append(str(ud.digit(ch)))
            continue
        out.append(extra.get(ch, ch))
    return ud.normalize("NFC", "".join(out))


def nfkc_cf(tok: str) -> str:
    """ICUNormalizer2Filter default mode (nfkc_cf): NFKC + case fold,
    WITHOUT diacritic removal (icu/ICUNormalizer2Filter.java)."""
    import unicodedata as ud

    return ud.normalize("NFKC", ud.normalize("NFKC", tok).casefold())

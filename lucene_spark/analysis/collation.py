"""Locale collation sort keys — the ICUCollationKeyAnalyzer role
(analysis/icu/src/java/org/apache/lucene/analysis/icu/
ICUCollationKeyAnalyzer.java: text → binary collation key so index-time
sorts and range queries follow locale order, not UTF-8 order).

No ICU library ships in this environment, so this is a DOCUMENTED
pure-Python UCA SUBSET: three-level keys (primary letter order,
secondary accents, tertiary case) over Latin-script text with per-locale
tailorings, validated not against hand-written expectations but against
REAL ICU — the DuckDB oracle runs `ORDER BY w COLLATE <locale>` and the
gate demands identical order (the golden-vocabulary methodology of the
stemmer suite applied to collation).

Level model (UTS #10 §3.3):
- primary: base letters after locale tailoring (sv/fi: å ä ö are
  distinct letters AFTER z — CLDR sv tailoring; de: umlauts equal their
  base vowel at the primary level)
- secondary: combining marks in the CLDR root accent order (_MARK_ORDER
  below — NOT codepoint order; verified against ICU); de-umlaut gets
  a high secondary (CLDR de: ä sorts after a-acute variants)
- tertiary: case, lowercase first (UCA default)
Keys are hex strings: level bytes joined by a 0x01 separator so shorter
prefixes sort first within a level (UTS #10 §3.6.1 level separators).

Supported locales: "root"/"en", "sv", "fi", "de". Unsupported locales
raise — a silent wrong order would be worse than an error.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

# sv/fi tailoring: å ä ö (and their bases once decomposed) are primary
# letters after z; ü/w behavior left at root (CLDR modern sv keeps v≠w)
_SV_PRIMARY = {"å": 27, "ä": 28, "ö": 29}
_LOCALES = ("root", "en", "sv", "fi", "de")

# CLDR root secondary ordering of Latin combining marks (NOT codepoint
# order): acute < grave < breve < circumflex < caron < ring < diaeresis
# < double-acute < tilde < dot-above < cedilla < ogonek < macron < ...
# (the FractionalUCA ordering ICU ships; verified against ICU itself)
_MARK_ORDER = [0x313, 0x314, 0x301, 0x300, 0x306, 0x302, 0x30C, 0x30A,
               0x308, 0x30B, 0x303, 0x307, 0x327, 0x328, 0x304, 0x30D,
               0x30E, 0x312, 0x305, 0x309, 0x30F, 0x310, 0x311]
_MARK_SEC = {cp: 0x21 + i for i, cp in enumerate(_MARK_ORDER)}


def _mark_secondary(cp: int) -> int:
    return _MARK_SEC.get(cp, 0x21 + len(_MARK_ORDER) + (cp - 0x300))


def _letter_primary(base: str, locale: str) -> int:
    return 0x40 + (ord(base) - ord("a"))


def _char_key(ch: str, locale: str):
    """(primary, secondary, tertiary) for one NFC character; None skips
    (combining marks are folded into the preceding letter's secondary)."""
    lo = ch.lower()
    if locale in ("sv", "fi") and lo in _SV_PRIMARY:
        return (0x40 + 25 + _SV_PRIMARY[lo] - 26,
                0x20, 0x08 if ch.isupper() else 0x02)
    d = unicodedata.decomposition(ch)
    base, marks = ch, []
    if d and not d.startswith("<"):
        parts = d.split()
        try:
            cps = [chr(int(p, 16)) for p in parts]
            base = cps[0]
            marks = cps[1:]
        except ValueError:
            pass
    blo = base.lower()
    if "a" <= blo <= "z":
        prim = _letter_primary(blo, locale)
        sec = 0x20
        for m in marks:
            cp = ord(m)
            if 0x300 <= cp <= 0x36F:
                sec = max(sec, _mark_secondary(cp))
        if locale == "de" and lo in "äöü" and ch in "äöüÄÖÜ":
            # CLDR de: umlaut secondary above every combining-mark accent
            sec = 0x90
        ter = 0x08 if base.isupper() else 0x02
        return prim, sec, ter
    if ch.isdigit():
        return 0x30 + int(ch), 0x20, 0x02
    if ch.isspace():
        return 0x05, 0x20, 0x02
    # punctuation / other symbols: primary by codepoint below letters
    return 0x10 + (ord(ch) % 0x20), 0x20, 0x02


def collation_key(text: str, locale: str = "root") -> str:
    """Hex sort key; ORDER BY this string == locale collation order for
    the supported subset."""
    if locale not in _LOCALES:
        raise ValueError(f"unsupported locale {locale!r}; "
                         f"supported: {_LOCALES}")
    prim: list[int] = []
    sec: list[int] = []
    ter: list[int] = []
    for ch in unicodedata.normalize("NFC", text or ""):
        cp = ord(ch)
        if 0x300 <= cp <= 0x36F:
            # stray combining mark: fold into previous secondary
            if sec:
                sec[-1] = max(sec[-1], _mark_secondary(cp))
            continue
        p, s, t = _char_key(ch, locale)
        prim.append(p)
        sec.append(s)
        ter.append(t)
    key = bytes(prim) + b"\x01" + bytes(sec) + b"\x01" + bytes(ter)
    return key.hex()


def collation_key_udf(locale: str = "root"):
    """pandas_udf producing the key column — feed it to orderBy or an
    index-time sort (IndexConfig.sort_by over the derived column)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _key(s: pd.Series) -> pd.Series:
        return s.map(lambda t: collation_key(t or "", locale))

    return _key

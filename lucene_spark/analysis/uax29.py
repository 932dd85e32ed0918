"""UAX#29 word-break tokenizer with URL/email recognition.

Role analogue: lucene/analysis/common/src/java/org/apache/lucene/
analysis/email/UAX29URLEmailTokenizer.java (JFlex grammar implementing
UAX#29 word boundaries + RFC-shaped URL/EMAIL productions) and the
StandardTokenizer word-break rules it extends.

This is a direct small-state scanner over per-codepoint word-break
classes (unicodedata), implementing the rules the reference's test
suite actually exercises:

- WB5/8/9/10: letter/digit runs join freely (B2B, R2D2).
- WB6/7:  MidLetter (:) and MidNumLet (. ') join ALetter×ALetter.
- WB11/12: MidNum (,) and MidNumLet join Numeric×Numeric
  (21.35, 216.239.63.104, 4,600) — a DOUBLE mid always splits.
- WB13a/b: ExtendNumLet (_) joins letter/digit/katakana runs
  (A:B_A:B, 1.2_1.2).
- WB4: Extend/Format (combining marks, ZWJ) attach to the current
  token (LUCENE-1545: "moͤchte" stays whole).
- Hangul is ALetter (안녕하세요 one token); Han and Hiragana emit one
  token per character; Katakana runs join (the reference's
  <IDEOGRAPHIC>/<HIRAGANA>/<KATAKANA> behavior).
- URL/EMAIL productions take precedence over word breaking, as in the
  reference grammar; this implementation recognizes scheme:// and
  www. URLs and RFC-flavored emails with a regex pre-pass.

Known approximations vs the JFlex grammar (documented, out of scope):
emoji grapheme rules, exotic URL forms (bare registry-only hosts,
IPv6 literals), and the full MidLetter/MidNum character inventories
beyond the common members.
"""

from __future__ import annotations

import re
import unicodedata

__all__ = ["tokenize_uax29", "uax29_tokens", "URL_RE", "EMAIL_RE"]

ALPHANUM = "<ALPHANUM>"
NUM = "<NUM>"
URL = "<URL>"
EMAIL = "<EMAIL>"
IDEOGRAPHIC = "<IDEOGRAPHIC>"
HIRAGANA = "<HIRAGANA>"
KATAKANA = "<KATAKANA>"
HANGUL = "<HANGUL>"

# ---- word-break classes ---------------------------------------------------
_AL, _NUMC, _KAT, _IDEO, _HIRA, _HANG = range(6)
_MIDLETTER, _MIDNUM, _MIDNUMLET, _EXTNUMLET, _EXTEND, _OTHER = range(6, 12)

_MIDLETTER_CHARS = {":", "·", "·", "״", "‧",
                    "︓", "﹕", "："}
_MIDNUM_CHARS = {",", ";", "٬", "︐", "︔", "，", "；"}
_MIDNUMLET_CHARS = {".", "'", "‘", "’", "․", "﹒",
                    "＇", "．"}


def _cls(ch: str) -> int:
    # Extend/Format FIRST (WB4): combining marks inside any script block
    # (e.g. U+3099 voiced-sound mark in the hiragana block) must attach
    # to the current token, never start one
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Mc", "Me", "Cf"):
        return _EXTEND
    cp = ord(ch)
    if 0x3041 <= cp <= 0x309F:
        return _HIRA
    # katakana LETTERS only: U+30A0 (double hyphen, Pd) and U+30FB
    # (middle dot, Word_Break=MidLetter) are NOT part of a run
    if 0x30A1 <= cp <= 0x30FA or 0x30FC <= cp <= 0x30FF or \
            0x31F0 <= cp <= 0x31FF or 0xFF66 <= cp <= 0xFF9D:
        return _KAT
    if 0x3400 <= cp <= 0x9FFF or 0xF900 <= cp <= 0xFAFF or \
            0x20000 <= cp <= 0x2FA1F or cp == 0x3007:
        return _IDEO
    if 0xAC00 <= cp <= 0xD7A3 or 0x1100 <= cp <= 0x11FF or \
            0x3130 <= cp <= 0x318F:
        return _HANG
    if ch in _MIDLETTER_CHARS:
        return _MIDLETTER
    if ch in _MIDNUM_CHARS:
        return _MIDNUM
    if ch in _MIDNUMLET_CHARS:
        return _MIDNUMLET
    if cat == "Nd":
        return _NUMC
    if cat.startswith("L"):
        return _AL
    if cat == "Pc":               # '_' and friends
        return _EXTNUMLET
    return _OTHER

_BASE = {_AL, _NUMC, _KAT, _EXTNUMLET, _HANG}
_MIDS = {_MIDLETTER, _MIDNUM, _MIDNUMLET}


def _adjacent_ok(a: int, b: int) -> bool:
    if _EXTNUMLET in (a, b):                     # WB13a/b
        return {a, b} <= {_AL, _NUMC, _KAT, _EXTNUMLET, _HANG}
    if a == _KAT or b == _KAT:
        return a == b                            # katakana joins katakana
    return True                                  # letter/digit/hangul mix


def _mid_ok(prev: int, mid: int, nxt: int) -> bool:
    if mid == _MIDLETTER:
        return prev in (_AL, _HANG) and nxt in (_AL, _HANG)
    if mid == _MIDNUM:
        return prev == _NUMC and nxt == _NUMC
    # MidNumLet (and single quote): letter.letter or num.num
    return (prev in (_AL, _HANG) and nxt in (_AL, _HANG)) or \
        (prev == _NUMC and nxt == _NUMC)


# ---- URL / EMAIL pre-pass -------------------------------------------------
EMAIL_RE = re.compile(
    r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~.\-]+@"
    r"(?:[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?\.)+[A-Za-z]{2,}")
# scheme matching is case-insensitive, like the reference's JFlex URL
# production (HTTPS://EXAMPLE.COM is one <URL> token)
URL_RE = re.compile(
    r"(?:(?i:https?|ftp|file)://|(?i:www)\.)"
    r"""[^\s<>"']*[^\s<>"'.,;:!?)\]}]""")
_PREPASS = re.compile(f"(?P<url>{URL_RE.pattern})|(?P<email>{EMAIL_RE.pattern})")


def _scan_words(text: str, out: list) -> None:
    n = len(text)
    i = 0
    while i < n:
        t = _cls(text[i])
        if t in (_IDEO, _HIRA):
            start = i
            i += 1
            while i < n and _cls(text[i]) == _EXTEND:
                i += 1
            out.append((text[start:i],
                        IDEOGRAPHIC if t == _IDEO else HIRAGANA))
            continue
        if t not in _BASE:
            i += 1
            continue
        start = i
        kinds = {t}
        last_base = t
        i += 1
        while i < n:
            t2 = _cls(text[i])
            if t2 == _EXTEND:
                i += 1
                continue
            if t2 in _BASE:
                if _adjacent_ok(last_base, t2):
                    kinds.add(t2)
                    last_base = t2
                    i += 1
                    continue
                break
            if t2 in _MIDS:
                j = i + 1
                while j < n and _cls(text[j]) == _EXTEND:
                    j += 1
                if j < n and _cls(text[j]) in _BASE and \
                        _mid_ok(last_base, t2, _cls(text[j])):
                    last_base = _cls(text[j])
                    kinds.add(last_base)
                    i = j + 1
                    continue
                break
            break
        tok = text[start:i]
        if kinds & {_HANG}:
            out.append((tok, HANGUL))
        elif _KAT in kinds and kinds <= {_KAT, _EXTNUMLET}:
            out.append((tok, KATAKANA))
        elif _NUMC in kinds and kinds <= {_NUMC, _EXTNUMLET}:
            out.append((tok, NUM))
        else:                       # incl. a lone ExtendNumLet run ("_")
            out.append((tok, ALPHANUM))


def tokenize_uax29(text: str) -> list[tuple[str, str]]:
    """(token, type) pairs — the UAX29URLEmailTokenizer stream shape."""
    if not text:
        return []
    out: list[tuple[str, str]] = []
    pos = 0
    for m in _PREPASS.finditer(text):
        _scan_words(text[pos:m.start()], out)
        out.append((m.group(0), URL if m.lastgroup == "url" else EMAIL))
        pos = m.end()
    _scan_words(text[pos:], out)
    return out


def uax29_tokens(text: str) -> list[str]:
    return [t for t, _ in tokenize_uax29(text)]

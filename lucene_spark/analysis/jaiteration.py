"""Japanese iteration-mark (odoriji) normalization — the kuromoji
JapaneseIterationMarkCharFilter role.

Expands horizontal iteration marks to the character they repeat:
kanji 々 (U+3005), hiragana ゝ/ゞ (U+309D/309E), katakana ヽ/ヾ
(U+30FD/30FE), with ゞ/ヾ voicing the source via the dakuten maps and
ゝ/ヽ de-voicing a voiced source (じゝ → じし). Semantics follow
JapaneseIterationMarkCharFilter.java:

- a span of N consecutive marks repeats the N characters before it
  (馬鹿々々しい → 馬鹿馬鹿しい, ところゞゝゝ → ところどころ) —
  normalizeIterationMark cases 1-3 (java:218-236);
- a span is clamped so it cannot reach back past the end of the
  previous span (ところゞゝゝゞゝゞ → ところどころゞゝゞ) and a mark
  starting exactly at the previous span end — including stream start,
  end position 0 — is illegal and emitted as-is (java:225-231,
  nextIterationMarkSpanSize:244-256);
- source characters are read from the ORIGINAL input, not the
  normalized output (abcところゝゝゝゝ → abcところcところ keeps the
  latin 'c' — the filter ignores script, java:29);
- 。 (U+3002) cannot be iterated: it resets the span end past itself
  (。ゝ → 。ゝ, java:199-202); astral characters behave the same
  (surrogate handling, java:188-191);
- dakuten maps are the 50-entry か..ぼ tables (java:61-137); katakana
  = hiragana + (カ-か). Vertical iteration marks are unsupported,
  exactly as in the reference.

Every TestJapaneseIterationMarkCharFilter.java vector — including the
full hiragana/katakana coverage tables — is pinned in
tests/test_jaiteration.py.
"""

from __future__ import annotations

_KANJI_MARK = "々"      # 々
_HIRA_MARK = "ゝ"       # ゝ
_HIRA_VOICED = "ゞ"     # ゞ
_KATA_MARK = "ヽ"       # ヽ
_KATA_VOICED = "ヾ"     # ヾ
_FULL_STOP = "。"       # 。

_HIRA_BASE = 0x304B         # か


def _build_h2d() -> list[int]:
    # JapaneseIterationMarkCharFilter.java:80-129 verbatim: 50 entries
    # indexed by codepoint - か; voiceable pairs map base AND voiced to
    # the voiced form, everything else in range maps to itself.
    h2d = list(range(_HIRA_BASE, _HIRA_BASE + 50))
    for base in ("か", "き", "く", "け", "こ", "さ", "し", "す", "せ",
                 "そ", "た", "ち", "つ", "て", "と", "は", "ひ", "ふ",
                 "へ", "ほ"):
        b = ord(base)
        voiced = b + 1
        h2d[b - _HIRA_BASE] = voiced
        h2d[voiced - _HIRA_BASE] = voiced
    # っ, な..の, and the handakuten ぱ row keep the identity mapping
    # from the range init — exactly the Java table's self-entries.
    return h2d


_H2D = _build_h2d()
_KATA_BASE = 0x30AB         # カ
_K2D = [c + (_KATA_BASE - _HIRA_BASE) for c in _H2D]


def _lookup(c: str, table: list[int], base: int) -> str:
    i = ord(c) - base
    if 0 <= i < len(table):
        return chr(table[i])
    return c


def _is_dakuten(c: str, table: list[int], base: int) -> bool:
    i = ord(c) - base
    return 0 <= i < len(table) and ord(c) == table[i]


def _normalize(c: str, m: str) -> str:
    """normalize(c, m) — java:270-282: hiragana/katakana marks voice or
    de-voice the source; kanji marks (and cross-script sources) pass the
    source through unchanged."""
    if m == _HIRA_MARK:
        return chr(ord(c) - 1) if _is_dakuten(c, _H2D, _HIRA_BASE) else c
    if m == _HIRA_VOICED:
        return _lookup(c, _H2D, _HIRA_BASE)
    if m == _KATA_MARK:
        return chr(ord(c) - 1) if _is_dakuten(c, _K2D, _KATA_BASE) else c
    if m == _KATA_VOICED:
        return _lookup(c, _K2D, _KATA_BASE)
    return c


def iteration_mark(text: str, normalize_kanji: bool = True,
                   normalize_kana: bool = True) -> str:
    """Normalize iteration marks in `text` (the CharFilter as a pure
    string function — offsets are unchanged: the filter is 1:1)."""

    def is_mark(c: str) -> bool:
        if normalize_kanji and c == _KANJI_MARK:
            return True
        if normalize_kana and c in (_HIRA_MARK, _HIRA_VOICED,
                                    _KATA_MARK, _KATA_VOICED):
            return True
        return False

    out = []
    end = 0        # iterationMarkSpanEndPosition
    span = 0       # iterationMarksSpanSize
    n = len(text)
    for p in range(n):
        c = text[p]
        if ord(c) > 0xFFFF or c == _FULL_STOP:
            # surrogate / full-stop: nothing may iterate across it
            end = p + 1
            out.append(c)
            continue
        if not is_mark(c):
            out.append(c)
            continue
        if p < end:                      # case 1: inside current span
            out.append(_normalize(text[p - span], c))
        elif p == end:                   # case 2: illegal — emit as-is
            end += 1
            out.append(c)
        else:                            # case 3: new span
            size = 0
            while p + size < n and is_mark(text[p + size]):
                size += 1
            if p - size < end:
                size = p - end
            span = size
            end = p + size
            out.append(_normalize(text[p - size], c))
    return "".join(out)

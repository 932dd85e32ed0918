"""Japanese number normalization + katakana stemming — the kuromoji
JapaneseNumberFilter / JapaneseKatakanaStemFilter roles.

- `normalize_number(text)` is an exact port of the
  JapaneseNumberFilter.java recursive-descent grammar (:266-455):

      number      = Σ largePair
      largePair   = [mediumNumber] × [largeKanji  万億兆京垓  (10^≥4)]
      mediumNumber= Σ mediumPair
      mediumPair  = [basicNumber] × [mediumKanji  十百千  (10^1..3)]
      basic       = run of Arabic (half/full-width) digits, kanji
                    digits 〇一二三四五六七八九, decimal points
                    (./．), with thousand separators (,/、) skipped

  Python int/Decimal replaces BigDecimal; the additive-pair semantics
  reproduce the reference's documented oddities exactly (十十 → 20,
  百百百 → 300). Exponents: 十1 百2 千3 万4 億8 兆12 京16 垓20
  (JapaneseNumberFilter.java:128-135).
- `ja_number_tokens(tokens)` applies the filter to a token list: each
  maximal run of numeral tokens merges and normalizes (the filter's
  adjacent-token concatenation); a failed parse falls back to the raw
  tokens. Stacked-token (graph) inputs are out of scope in the flat
  Series chain — documented (the reference skips positionIncrement=0
  stacks too, emitting them as-is).
- `katakana_stem(token, minimum=4)`: JapaneseKatakanaStemFilter.java —
  drop one trailing U+30FC prolonged-sound mark from katakana tokens
  of at least `minimum` characters.
"""

from __future__ import annotations

from decimal import Decimal


def _arabic(c: str) -> int | None:
    if "0" <= c <= "9":
        return ord(c) - 48
    if "０" <= c <= "９":
        return ord(c) - 0xFF10
    return None


_DECIMAL = {".", "．"}
_SEPARATOR = {",", "，"}


class NumberGrammar:
    """The shared JapaneseNumberFilter/KoreanNumberFilter
    recursive-descent grammar, parameterized by the native digit and
    exponent tables (the two filters are table-for-table identical —
    KoreanNumberFilter.java:99-121 vs JapaneseNumberFilter.java:128-146;
    both share the ./．decimal points and ,/，thousand separators)."""

    def __init__(self, digits: dict[str, int], exps: dict[str, int]):
        self.digits = digits
        self.exps = exps

    def is_numeral_char(self, c: str) -> bool:
        return (_arabic(c) is not None or c in self.digits
                or c in self.exps or c in _DECIMAL or c in _SEPARATOR)

    def is_numeral(self, s: str) -> bool:
        return bool(s) and all(self.is_numeral_char(c) for c in s)

    def _parse_basic(self, b: "_Buf"):
        out = []
        while b.i < len(b.s):
            c = b.s[b.i]
            a = _arabic(c)
            if a is not None:
                out.append(str(a))
            elif c in self.digits:
                out.append(str(self.digits[c]))
            elif c in _DECIMAL:
                out.append(".")
            elif c in _SEPARATOR:
                pass
            else:
                break
            b.i += 1
        if not out:
            return None
        return Decimal("".join(out))

    def _parse_power(self, b: "_Buf", lo: int, hi: int):
        if b.i < len(b.s):
            p = self.exps.get(b.s[b.i], 0)
            if lo <= p <= hi:
                b.i += 1
                return Decimal(10) ** p
        return None

    def _parse_medium_pair(self, b: "_Buf"):
        first = self._parse_basic(b)
        second = self._parse_power(b, 1, 3)
        if first is None and second is None:
            return None
        if second is None:
            return first
        if first is None:
            return second
        return first * second

    def _parse_medium(self, b: "_Buf"):
        total = None
        while True:
            r = self._parse_medium_pair(b)
            if r is None:
                return total
            total = r if total is None else total + r

    def _parse_large_pair(self, b: "_Buf"):
        first = self._parse_medium(b)
        second = self._parse_power(b, 4, 99)
        if first is None and second is None:
            return None
        if second is None:
            return first
        if first is None:
            return second
        return first * second

    def normalize(self, text: str) -> str | None:
        """Normalized decimal string for a numeral run, or None when
        the grammar rejects it or trailing characters remain."""
        b = _Buf(text)
        total = None
        while True:
            r = self._parse_large_pair(b)
            if r is None:
                break
            total = r if total is None else total + r
        if total is None or b.i != len(b.s):
            return None
        s = format(total.normalize(), "f")
        if s.endswith(".0"):
            s = s[:-2]
        return s

    def number_tokens(self, tokens: list[str]) -> list[str]:
        """Merge + normalize maximal numeral-token runs, pass
        everything else through (the filter's adjacent-token
        concatenation)."""
        out: list[str] = []
        i = 0
        n = len(tokens)
        while i < n:
            if self.is_numeral(tokens[i]):
                j = i
                while j < n and self.is_numeral(tokens[j]):
                    j += 1
                run = "".join(tokens[i:j])
                norm = self.normalize(run)
                if norm is not None:
                    out.append(norm)
                else:
                    out.extend(tokens[i:j])
                i = j
            else:
                out.append(tokens[i])
                i += 1
        return out


JA_GRAMMAR = NumberGrammar(
    digits={"〇": 0, "一": 1, "二": 2, "三": 3, "四": 4,
            "五": 5, "六": 6, "七": 7, "八": 8, "九": 9},
    exps={"十": 1, "百": 2, "千": 3, "万": 4, "億": 8, "兆": 12,
          "京": 16, "垓": 20})


def is_numeral_char(c: str) -> bool:
    return JA_GRAMMAR.is_numeral_char(c)


def is_numeral(s: str) -> bool:
    return JA_GRAMMAR.is_numeral(s)


class _Buf:
    __slots__ = ("s", "i")

    def __init__(self, s: str):
        self.s, self.i = s, 0


def normalize_number(text: str) -> str | None:
    return JA_GRAMMAR.normalize(text)


def ja_number_tokens(tokens: list[str]) -> list[str]:
    return JA_GRAMMAR.number_tokens(tokens)


_PROLONGED = "ー"


def katakana_stem(token: str, minimum: int = 4) -> str:
    """JapaneseKatakanaStemFilter.stem: katakana tokens of length >=
    minimum drop ONE trailing prolonged sound mark (U+30FC)."""
    if len(token) < minimum:
        return token
    if token[-1] != _PROLONGED:
        return token
    if not all(0x30A1 <= ord(c) <= 0x30FE for c in token):
        return token
    return token[:-1]

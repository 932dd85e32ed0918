"""Compound-word decomposition — the lucene/analysis/compound role
(CompoundWordTokenFilterBase + DictionaryCompoundWordTokenFilter +
HyphenationCompoundWordTokenFilter + the FOP hyphenation engine).

Germanic compounds ("Donaudampfschiff") are split so users can match
parts ("schiff"). Two strategies, both emitting the original token at
posInc 1 with subwords stacked at posInc 0 (base:29-47), processing
only tokens of at least `min_word_size` and keeping subwords within
[min_subword_size, max_subword_size]:

- dictionary brute force (DictionaryCompoundWordTokenFilter.java:
  decompose — every dictionary word found at any offset, or only the
  longest per offset);
- hyphenation-grammar guided (HyphenationCompoundWordTokenFilter.java:
  decompose): Liang's TeX hyphenation algorithm (the FOP
  HyphenationTree, compound/hyphenation/HyphenationTree.java:276-365)
  yields candidate split points; consecutive point spans become
  subwords, optionally dictionary-checked with the genitive-s
  "one char shorter" retry; with no dictionary every span is emitted.

The TeX pattern XML (FOP format: <classes> normalization rows,
<patterns> with interleaved digit weights, <exceptions>) is parsed by
``parse_hyphenation_xml``; `hyphenate` marks the word as ``.word.``,
max-merges the digit values of every matching pattern at every offset,
and returns the odd-valued boundaries (remain/push char counts
honored, leading non-letters skipped, embedded non-letters reject the
word — HyphenationTree.java:276-320). All TestCompoundWordTokenFilter
vectors (Danish grammar included) are in tests/test_compound.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class CompoundToken:
    text: str
    position_increment: int


class HyphenationTree:
    """Liang hyphenator over FOP pattern data."""

    def __init__(self, classes: dict[str, str],
                 patterns: dict[str, tuple[int, ...]],
                 exceptions: dict[str, list[int]] | None = None):
        self.classes = classes
        self.patterns = patterns
        self.exceptions = exceptions or {}
        self._by_first: dict[str, list[str]] = {}
        for key in patterns:
            self._by_first.setdefault(key[:1], []).append(key)

    def hyphenate(self, word: str, remain: int = 1,
                  push: int = 1) -> list[int] | None:
        """Split offsets [0, p1, .., len] or None when unhyphenatable."""
        norm, ignore_begin, end_letters = [], 0, False
        for i, ch in enumerate(word):
            nc = self.classes.get(ch)
            if nc is None:
                if i == ignore_begin:
                    ignore_begin += 1
                else:
                    end_letters = True
            else:
                if end_letters:
                    return None
                norm.append(nc)
        n = len(norm)
        if n < remain + push:
            return None
        s = "".join(norm)
        if s in self.exceptions:
            pts = [j for j in self.exceptions[s]
                   if remain <= j < n - push + 1]
            points = [p + ignore_begin for p in pts]
        else:
            m = "." + s + "."
            vals = [0] * (len(m) + 1)
            for q in range(len(m)):
                for key in self._by_first.get(m[q], ()):
                    if m.startswith(key, q):
                        v = self.patterns[key]
                        for t, d in enumerate(v):
                            if d > vals[q + t]:
                                vals[q + t] = d
            points = [j + ignore_begin for j in range(1, n)
                      if vals[j + 1] % 2 == 1
                      and remain <= j <= n - push]
        if not points:
            return None
        return [0] + points + [n + ignore_begin]


def parse_hyphenation_xml(text: str) -> HyphenationTree:
    """FOP hyphenation XML → HyphenationTree (PatternParser.java role;
    regex-based to sidestep the external DTD reference)."""

    def body(tag: str) -> str:
        m = re.search(rf"<{tag}>(.*?)</{tag}>", text, re.S)
        return m.group(1) if m else ""

    classes: dict[str, str] = {}
    for group in body("classes").split():
        for ch in group:
            classes[ch] = group[0]
    patterns: dict[str, tuple[int, ...]] = {}
    for pat in body("patterns").split():
        key = "".join(c for c in pat if not c.isdigit())
        vals = [0] * (len(key) + 1)
        pos = 0
        for c in pat:
            if c.isdigit():
                vals[pos] = int(c)
            else:
                pos += 1
        patterns[key] = tuple(vals)
    exceptions: dict[str, list[int]] = {}
    for exc in body("exceptions").split():
        word = exc.replace("-", "")
        pts, j = [], 0
        for part in exc.split("-")[:-1]:
            j += len(part)
            pts.append(j)
        exceptions[word] = pts
    return HyphenationTree(classes, patterns, exceptions)


def dictionary_decompound(tokens: list[str], dictionary,
                          min_word_size: int = 5,
                          min_subword_size: int = 2,
                          max_subword_size: int = 15,
                          only_longest_match: bool = False) -> list[CompoundToken]:
    dic = {w.lower() for w in dictionary}
    out: list[CompoundToken] = []
    for tok in tokens:
        out.append(CompoundToken(tok, 1))
        if len(tok) < min_word_size:
            continue
        low = tok.lower()
        for i in range(len(tok) - min_subword_size + 1):
            longest = None
            for j in range(min_subword_size, max_subword_size + 1):
                if i + j > len(tok):
                    break
                if low[i:i + j] in dic:
                    if only_longest_match:
                        if longest is None or len(longest) < j:
                            longest = tok[i:i + j]
                    else:
                        out.append(CompoundToken(tok[i:i + j], 0))
            if only_longest_match and longest is not None:
                out.append(CompoundToken(longest, 0))
    return out


def hyphenation_decompound(tokens: list[str], tree: HyphenationTree,
                           dictionary=None,
                           min_word_size: int = 5,
                           min_subword_size: int = 2,
                           max_subword_size: int = 15,
                           only_longest_match: bool = False) -> list[CompoundToken]:
    dic = None if dictionary is None else {w.lower() for w in dictionary}
    out: list[CompoundToken] = []
    for tok in tokens:
        out.append(CompoundToken(tok, 1))
        if len(tok) < min_word_size:
            continue
        hyp = tree.hyphenate(tok.lower())
        if hyp is None:
            continue
        low = tok.lower()
        for i in range(len(hyp)):
            start = hyp[i]
            longest = None
            for j in range(1, len(hyp) - i):
                part_len = hyp[i + j] - start
                if part_len > max_subword_size:
                    break
                if part_len < min_subword_size:
                    continue
                cand = None
                if dic is None or low[start:start + part_len] in dic:
                    cand = tok[start:start + part_len]
                elif low[start:start + part_len - 1] in dic:
                    # genitive-s / binding character retry
                    cand = tok[start:start + part_len - 1]
                if cand is not None:
                    if only_longest_match:
                        if longest is None or len(longest) < len(cand):
                            longest = cand
                    else:
                        out.append(CompoundToken(cand, 0))
            if only_longest_match and longest is not None:
                out.append(CompoundToken(longest, 0))
    return out

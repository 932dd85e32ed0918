"""Regex-driven analysis — the lucene/analysis/pattern role.

- ``pattern_tokenize`` (PatternTokenizer.java): group=-1 splits on the
  pattern (empty tokens dropped), group>=0 emits that capture group of
  every match.
- ``pattern_replace`` (PatternReplaceFilter.java): per-token regex
  replacement, all occurrences or first only; a null replacement
  strips the match (tokens may become empty — the reference keeps the
  empty token, TestPatternReplaceFilter.testStripFirst).
- ``pattern_replace_text`` (PatternReplaceCharFilter.java role): the
  same replacement applied to raw text before tokenization.
- ``pattern_capture_tokens`` (PatternCaptureGroupTokenFilter.java):
  every capture group of every pattern emitted as a stacked token,
  merged across patterns by capture start offset (nextCapture's
  min-offset scan, java:117-152); empty captures are skipped, the
  whole-token capture is skipped when preserveOriginal would duplicate
  it, and an unmatched token passes through.

Java and Python regex dialects agree on the subset exercised here
(classes, lookbehind, alternation, quantifiers); callers supplying
patterns use Python ``re`` syntax. Reference vectors are pinned in
tests/test_patterns.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


def pattern_tokenize(text: str, pattern: str, group: int = -1) -> list[str]:
    rx = re.compile(pattern)
    if group < 0:
        return [t for t in rx.split(text) if t]
    return [m.group(group) for m in rx.finditer(text)
            if m.group(group) is not None]


def pattern_replace(tokens: list[str], pattern: str,
                    replacement: str | None, replace_all: bool = True) -> list[str]:
    rx = re.compile(pattern)
    repl = "" if replacement is None else replacement
    count = 0 if replace_all else 1
    return [rx.sub(repl, t, count=count) for t in tokens]


def pattern_replace_text(text: str, pattern: str,
                         replacement: str) -> str:
    return re.sub(pattern, replacement, text)


@dataclass(frozen=True)
class CaptureToken:
    text: str
    position_increment: int


def _captures(token: str, rx, preserve_original: bool):
    out = []
    for m in rx.finditer(token):
        for g in range(1, (rx.groups or 0) + 1):
            s, e = m.start(g), m.end(g)
            if s == -1 or s == e:
                continue
            if preserve_original and s == 0 and e == len(token):
                continue
            out.append((s, m.group(g)))
    return out


def pattern_capture_tokens(tokens: list[str], patterns: list[str],
                           preserve_original: bool = False) -> list[CaptureToken]:
    rxs = [re.compile(p) for p in patterns]
    out: list[CaptureToken] = []
    for tok in tokens:
        emitted = []
        if preserve_original:
            emitted.append(tok)
        # merge matchers' capture streams by min start offset, first
        # matcher winning ties (nextCapture, java:117-152)
        streams = [_captures(tok, rx, preserve_original) for rx in rxs]
        heads = [0] * len(streams)
        while True:
            best, best_start = -1, None
            for i, st in enumerate(streams):
                if heads[i] < len(st):
                    s = st[heads[i]][0]
                    if best_start is None or s < best_start:
                        best, best_start = i, s
            if best < 0:
                break
            emitted.append(streams[best][heads[best]][1])
            heads[best] += 1
        if not emitted:
            emitted.append(tok)
        out.append(CaptureToken(emitted[0], 1))
        out.extend(CaptureToken(t, 0) for t in emitted[1:])
    return out

"""Path hierarchy tokenization — the lucene/analysis/path role
(PathHierarchyTokenizer.java + ReversePathHierarchyTokenizer.java).

Forward mode emits every ancestor prefix of a delimited path ("/a/b/c"
→ /a, /a/b, /a/b/c), reverse mode every suffix ("/a/b/c" → /a/b/c,
a/b/c, b/c, c); `skip` drops that many leading (forward) or trailing
(reverse) components, and `replacement` substitutes the delimiter in
the emitted tokens (PathHierarchyTokenizer.java:30-47). The first
token has position increment 1, the rest 0 (they stack as one
position, which is what path faceting and prefix matching rely on).
Every TestPathHierarchyTokenizer / TestReversePathHierarchyTokenizer
vector — offsets included — is pinned in tests/test_pathhierarchy.py.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PathToken:
    text: str
    start: int
    end: int
    position_increment: int


def path_hierarchy_tokens(text: str, delimiter: str = "/",
                          replacement: str | None = None,
                          skip: int = 0) -> list[PathToken]:
    """Forward PathHierarchyTokenizer."""
    if replacement is None:
        replacement = delimiter
    if not text:
        return []
    # token end positions: every delimiter except one at position 0
    # (which would yield an empty component), plus end-of-text
    ends = [i for i, c in enumerate(text) if c == delimiter and i > 0]
    if not ends or ends[-1] != len(text):
        ends.append(len(text))
    if skip > 0:
        if skip >= len(ends):
            return []
        start = ends[skip - 1]
        ends = ends[skip:]
    else:
        start = 0
    out = []
    for i, end in enumerate(ends):
        tok = text[start:end].replace(delimiter, replacement)
        out.append(PathToken(tok, start, end, 1 if i == 0 else 0))
    return out


def reverse_path_hierarchy_tokens(text: str, delimiter: str = "/",
                                  replacement: str | None = None,
                                  skip: int = 0) -> list[PathToken]:
    """ReversePathHierarchyTokenizer: suffix tokens, skip drops
    trailing components."""
    if replacement is None:
        replacement = delimiter
    if not text:
        return []
    delims = [i for i, c in enumerate(text) if c == delimiter]
    kept = text
    if skip > 0:
        # drop the last `skip` components: cut after the delimiter
        # preceding them (component starts are delim+1 < len)
        starts_all = [d + 1 for d in delims if d + 1 < len(text)]
        if not starts_all or skip > len(starts_all):
            return []
        kept = text[:starts_all[len(starts_all) - skip]]
    starts = [0] + [d + 1 for d in delims
                    if d + 1 < len(kept)]
    out = []
    n = len(kept)
    for i, s in enumerate(starts):
        tok = kept[s:].replace(delimiter, replacement)
        out.append(PathToken(tok, s, n, 1 if i == 0 else 0))
    return out

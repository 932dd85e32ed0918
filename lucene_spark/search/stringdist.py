"""StringDistance registry — the lucene/suggest spell distance measures.

Role analogue: lucene/suggest/src/java/org/apache/lucene/search/spell/
StringDistance.java and its four implementations, Solr's
`spellcheck.distanceMeasure` options:
- LevenshteinDistance.java:33-101 (the DirectSpellChecker default
  similarity): 1 - editDistance / max(len), EMPTY-vs-EMPTY = 1,
  empty-vs-nonempty = 0.
- LuceneLevenshteinDistance.java:44-110 (distributed-spellcheck merge
  measure): codepoint-based Damerau (transpositions cost 1),
  1 - d/MIN(len) — deliberately reproducing the reference's quirks:
  one empty side returns max(n, m) (a large POSITIVE "distance", not a
  similarity) and the min-normalization can go negative.
- JaroWinklerDistance.java:40-108: Jaro similarity with the Winkler
  common-prefix bonus above threshold 0.7.
- NGramDistance.java:49-134: Kondrak's n-gram edit distance with
  prefix-padded grams and positional half-costs.

All are plain-Python scalar functions (they run driver-side over
bounded candidate lists, or inside pandas UDFs for bulk rescoring) —
validated against every reference test vector in
TestLevenshteinDistance / TestJaroWinklerDistance / TestNGramDistance
(n=1,2,3).
"""

from __future__ import annotations

__all__ = ["levenshtein_distance", "lucene_levenshtein_distance",
           "jaro_winkler_distance", "ngram_distance", "osa_distance",
           "damerau_distance",
           "STRING_DISTANCES"]


def levenshtein_distance(target: str, other: str) -> float:
    """LevenshteinDistance.getDistance (spell/LevenshteinDistance.java:
    33-101): similarity in [0,1]."""
    n, m = len(target), len(other)
    if n == 0 or m == 0:
        return 1.0 if n == m else 0.0
    p = list(range(n + 1))
    for j in range(1, m + 1):
        t_j = other[j - 1]
        d = [j] + [0] * n
        for i in range(1, n + 1):
            cost = 0 if target[i - 1] == t_j else 1
            d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1] + cost)
        p = d
    return 1.0 - p[n] / max(m, n)


def osa_distance(target: str, other: str) -> int:
    """RESTRICTED transposition edit distance (optimal string
    alignment) — exactly the LuceneLevenshteinDistance.java:75-103
    recurrence (used for merging distributed spellcheck results).  For
    the automaton semantics of FuzzyQuery/DirectSpellChecker candidate
    matching use `damerau_distance` (the unrestricted variant; they
    differ at pairs like 'xabc'/'xca': OSA 3, Damerau 2)."""
    tp, op = target, other
    n, m = len(tp), len(op)
    if n == 0 or m == 0:
        return max(n, m)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        t_j = op[j - 1]
        for i in range(1, n + 1):
            cost = 0 if tp[i - 1] == t_j else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and tp[i - 1] == op[j - 2]
                    and tp[i - 2] == op[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return d[n][m]


def damerau_distance(target: str, other: str) -> int:
    """UNRESTRICTED Damerau-Levenshtein — transposition as a primitive
    edit with further edits allowed inside a transposed pair
    ('xca'→'xac'→'xabc' is 2).  This is what a Schulz-Mihov automaton
    with transposition-primitives accepts (FuzzyQuery's documented
    Damerau-Levenshtein; the automaton applies primitives sequentially
    and carries no OSA adjacency restriction), and what DuckDB's
    damerau_levenshtein computes — unlike `osa_distance`, which is the
    RESTRICTED recurrence LuceneLevenshteinDistance.java uses for
    result merging.  Lowrance-Wagner DP with per-character last-seen
    rows."""
    a, b = target, other
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return max(n, m)
    inf = n + m
    # charset map for the "last occurrence in a" row index
    da: dict[str, int] = {}
    d = [[inf] * (m + 2) for _ in range(n + 2)]
    d[1][1] = 0
    for i in range(1, n + 1):
        d[i + 1][1] = i
    for j in range(1, m + 1):
        d[1][j + 1] = j
    for i in range(1, n + 1):
        db = 0
        for j in range(1, m + 1):
            i1 = da.get(b[j - 1], 0)
            j1 = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,                     # substitute
                d[i + 1][j] + 1,                    # insert
                d[i][j + 1] + 1,                    # delete
                d[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1))  # transpose
        da[a[i - 1]] = i
    return d[n + 1][m + 1]


def lucene_levenshtein_distance(target: str, other: str) -> float:
    """LuceneLevenshteinDistance.getDistance (spell/
    LuceneLevenshteinDistance.java:44-110): codepoint Damerau,
    1 - d/min(len); empty-side quirk returns max(n, m) verbatim."""
    n, m = len(target), len(other)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    return 1.0 - osa_distance(target, other) / min(m, n)


def jaro_winkler_distance(s1: str, s2: str,
                          threshold: float = 0.7) -> float:
    """JaroWinklerDistance.getDistance (spell/JaroWinklerDistance.java:
    40-108): Jaro similarity + Winkler prefix bonus above `threshold`."""
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    transpositions = sum(a != b for a, b in zip(ms1, ms2)) // 2
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b:
            break
        prefix += 1
    m = float(matches)
    j = (m / len(s1) + m / len(s2) + (m - transpositions) / m) / 3
    if j < threshold:
        return j
    return j + min(0.1, 1.0 / len(mx)) * prefix * (1 - j)


def ngram_distance(source: str, target: str, n: int = 2) -> float:
    """NGramDistance.getDistance (spell/NGramDistance.java:49-134)."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(source[i] == target[i] for i in range(min(sl, tl)))
        return cost / max(sl, tl)
    # source padded with n-1 NUL-prefix characters
    sa = [""] * (n - 1) + list(source)
    p = [float(i) for i in range(sl + 1)]
    for j in range(1, tl + 1):
        if j < n:
            t_j = [""] * (n - j) + list(target[:j])
        else:
            t_j = list(target[j - n:j])
        d = [float(j)] + [0.0] * sl
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "":     # discount prefix matches
                    tn -= 1
            ec = cost / tn
            d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1] + ec)
        p = d
    return 1.0 - p[sl] / max(tl, sl)


STRING_DISTANCES = {
    "levenshtein": levenshtein_distance,
    "lucene_levenshtein": lucene_levenshtein_distance,
    "jaro_winkler": jaro_winkler_distance,
    "ngram": ngram_distance,
}

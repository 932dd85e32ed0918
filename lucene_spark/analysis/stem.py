"""Porter stemmer — the classic 1980 algorithm (public; M.F. Porter,
"An algorithm for suffix stripping", Program 14(3):130-137).

Role analogue: lucene/analysis/common/.../en/PorterStemFilter.java:51 and
PorterStemmer.java (which implements the same published algorithm).
Implemented from the published rule tables; validated in tests against
DuckDB's Snowball 'porter' stemmer over the fixture vocabulary (both
implement the same spec, so outputs agree).

Hot-path shape: analyzers stem each batch's UNIQUE tokens once (the
analyzer chain builds a {token: stem} table over the batch vocabulary and
maps lists through it — analyzers._stem_lists), so the per-token Python
cost is bounded by vocabulary size per Arrow batch, not token count; the
lru_cache below additionally reuses stems across batches — the same
reason Lucene caches stems per-field-instance is why this stays cheap.
"""

from __future__ import annotations

import functools

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC)^m[V]."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonants
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        # in vowel run
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


@functools.lru_cache(maxsize=1 << 16)
def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # ---- step 1a ----
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b ----
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w = w + "e"

    # ---- step 1c ----
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 ----
    step2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
        ("logi", "log"),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 3 ----
    step3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 4 ----
    step4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )
    # longest match first (suffix list ordered by the algorithm's table;
    # check longer suffixes before their tails)
    for suf in sorted(step4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # ---- step 5a ----
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # ---- step 5b ----
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w



# ---------------------------------------------------------------------------
# Light stemmers for non-English languages.
#
# Role analogue: the per-language *LightStemFilter chain in
# lucene/analysis/common/src/java/org/apache/lucene/analysis/{de,fr,es,
# it,pt,sv,fi,ru,hu,no}/ — GermanLightStemmer.java, FrenchLightStemmer.java,
# SpanishLightStemmer.java, ItalianLightStemmer.java,
# PortugueseLightStemmer.java, SwedishLightStemmer.java,
# FinnishLightStemmer.java, RussianLightStemmer.java,
# HungarianLightStemmer.java, NorwegianLightStemmer.java. These implement
# the published UniNE/CLEF light-stemming algorithms (Jacques Savoy,
# "Light Stemming Approaches for the French, Portuguese, German and
# Hungarian Languages", ACM SAC 2006; "Report on CLEF-2001/2003
# experiments"; Dolamic & Savoy for Russian): suffix strip tables plus
# diacritic folding. Each function below follows the published rule
# order exactly and is validated against the reference's own golden
# vocabulary data ({de,fr,es,it,pt,sv,fi,ru,hu}lighttestdata.zip and
# no/nb_light.txt — tests/test_stem.py asserts 0 mismatches).


@functools.lru_cache(maxsize=65536)
def german_light_stem(word: str) -> str:
    """GermanLightStemmer.java:64-151 — vowel folding, then two
    plural/case strip steps (-ern / -e[mnrs] / -e / -s-after-stop-cons,
    then -est / -e[rn] / -st)."""
    s = []
    for ch in word:
        if ch in "äàáâ":
            s.append("a")
        elif ch in "öòóô":
            s.append("o")
        elif ch in "ïìíî":
            s.append("i")
        elif ch in "üùúû":
            s.append("u")
        else:
            s.append(ch)
    w = "".join(s)
    st = "bdfghklmnt"
    n = len(w)
    if n > 5 and w.endswith("ern"):
        n -= 3
    elif n > 4 and w[n - 2] == "e" and w[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and w[n - 1] == "e":
        n -= 1
    elif n > 3 and w[n - 1] == "s" and w[n - 2] in st:
        n -= 1
    w = w[:n]
    n = len(w)
    if n > 5 and w.endswith("est"):
        n -= 3
    elif n > 4 and w[n - 2] == "e" and w[n - 1] in "rn":
        n -= 2
    elif n > 4 and w.endswith("st") and w[n - 3] in st:
        n -= 2
    return w[:n]


_FR_FOLD = {"à": "a", "á": "a", "â": "a", "ô": "o", "è": "e", "é": "e",
            "ê": "e", "ù": "u", "û": "u", "î": "i", "ç": "c"}


def _fr_norm(s: list, l: int) -> str:
    """FrenchLightStemmer.java norm() (:212-257): fold + adjacent-dup
    collapse when len>4, then -ie, then final r/e/e and trailing
    double-letter trim."""
    s = s[:l]
    if len(s) > 4:
        for i, ch in enumerate(s):
            s[i] = _FR_FOLD.get(ch, ch)
        i = 1
        while i < len(s):
            if s[i] == s[i - 1] and s[i].isalpha():
                del s[i]
            else:
                i += 1
    l = len(s)
    if l > 4 and s[l - 2] == "i" and s[l - 1] == "e":
        l -= 2
    if l > 4:
        if s[l - 1] == "r":
            l -= 1
        if s[l - 1] == "e":
            l -= 1
        if s[l - 1] == "e":
            l -= 1
        if s[l - 1] == s[l - 2] and s[l - 1].isalpha():
            l -= 1
    return "".join(s[:l])


@functools.lru_cache(maxsize=65536)
def french_light_stem(word: str) -> str:
    """FrenchLightStemmer.java:63-210 — the UniNE French rule table,
    verbatim order (each branch either mutates in place and falls
    through or returns through norm())."""
    s = list(word)
    l = len(s)

    def ew(suf: str) -> bool:
        k = len(suf)
        return l >= k and s[l - k:l] == list(suf)

    if l > 5 and s[l - 1] == "x":
        if s[l - 3] == "a" and s[l - 2] == "u" and s[l - 4] != "e":
            s[l - 2] = "l"
        l -= 1
    if l > 3 and s[l - 1] == "x":
        l -= 1
    if l > 3 and s[l - 1] == "s":
        l -= 1
    if l > 9 and ew("issement"):
        l -= 6
        s[l - 1] = "r"
        return _fr_norm(s, l)
    if l > 8 and ew("issant"):
        l -= 4
        s[l - 1] = "r"
        return _fr_norm(s, l)
    if l > 6 and ew("ement"):
        l -= 4
        if l > 3 and ew("ive"):
            l -= 1
            s[l - 1] = "f"
        return _fr_norm(s, l)
    if l > 11 and ew("ficatrice"):
        l -= 5
        s[l - 2] = "e"
        s[l - 1] = "r"
        return _fr_norm(s, l)
    if l > 10 and ew("ficateur"):
        l -= 4
        s[l - 2] = "e"
        s[l - 1] = "r"
        return _fr_norm(s, l)
    if l > 9 and ew("catrice"):
        l -= 3
        s[l - 4] = "q"
        s[l - 3] = "u"
        s[l - 2] = "e"
        return _fr_norm(s, l)
    if l > 8 and ew("cateur"):
        l -= 2
        s[l - 4] = "q"
        s[l - 3] = "u"
        s[l - 2] = "e"
        s[l - 1] = "r"
        return _fr_norm(s, l)
    if l > 8 and ew("atrice"):
        l -= 4
        s[l - 2] = "e"
        s[l - 1] = "r"
        return _fr_norm(s, l)
    if l > 7 and ew("ateur"):
        l -= 3
        s[l - 2] = "e"
        s[l - 1] = "r"
        return _fr_norm(s, l)
    if l > 6 and ew("trice"):
        l -= 1
        s[l - 3] = "e"
        s[l - 2] = "u"
        s[l - 1] = "r"
    if l > 5 and ew("ième"):
        return _fr_norm(s, l - 4)
    if l > 7 and ew("teuse"):
        l -= 2
        s[l - 1] = "r"
        return _fr_norm(s, l)
    if l > 6 and ew("teur"):
        l -= 1
        s[l - 1] = "r"
        return _fr_norm(s, l)
    if l > 5 and ew("euse"):
        return _fr_norm(s, l - 2)
    if l > 8 and ew("ère"):
        l -= 1
        s[l - 2] = "e"
        return _fr_norm(s, l)
    if l > 7 and ew("ive"):
        l -= 1
        s[l - 1] = "f"
        return _fr_norm(s, l)
    if l > 4 and (ew("folle") or ew("molle")):
        l -= 2
        s[l - 1] = "u"
        return _fr_norm(s, l)
    if l > 9 and ew("nnelle"):
        return _fr_norm(s, l - 5)
    if l > 9 and ew("nnel"):
        return _fr_norm(s, l - 3)
    if l > 4 and ew("ète"):
        l -= 1
        s[l - 2] = "e"
    if l > 8 and ew("ique"):
        l -= 4
    if l > 8 and ew("esse"):
        return _fr_norm(s, l - 3)
    if l > 7 and ew("inage"):
        return _fr_norm(s, l - 3)
    if l > 9 and ew("isation"):
        l -= 7
        if l > 5 and ew("ual"):
            s[l - 2] = "e"
        return _fr_norm(s, l)
    if l > 9 and ew("isateur"):
        return _fr_norm(s, l - 7)
    if l > 8 and ew("ation"):
        return _fr_norm(s, l - 5)
    if l > 8 and ew("ition"):
        return _fr_norm(s, l - 5)
    return _fr_norm(s, l)


@functools.lru_cache(maxsize=65536)
def spanish_light_stem(word: str) -> str:
    """SpanishLightStemmer.java:60-114 (CLEF-2001): fold, then final
    o/a/e, -es after e/s-e/c-e (ces→z) or vowel, words < 5 untouched."""
    if len(word) < 5:
        return word
    s = []
    for ch in word:
        if ch in "àáâä":
            s.append("a")
        elif ch in "òóôö":
            s.append("o")
        elif ch in "èéêë":
            s.append("e")
        elif ch in "ùúûü":
            s.append("u")
        elif ch in "ìíîï":
            s.append("i")
        else:
            s.append(ch)
    l = len(s)
    last = s[l - 1]
    if last in "oae":
        l -= 1
    elif last == "s":
        if s[l - 2] == "e" and s[l - 3] == "s" and s[l - 4] == "e":
            l -= 2
        elif s[l - 2] == "e" and s[l - 3] == "c":
            s[l - 3] = "z"
            l -= 2
        elif s[l - 2] in "oae":
            l -= 2
    return "".join(s[:l])


@functools.lru_cache(maxsize=65536)
def italian_light_stem(word: str) -> str:
    """ItalianLightStemmer.java:60-115 (CLEF-2001): fold, then final
    vowel with i/h-digraph awareness, words < 6 untouched."""
    if len(word) < 6:
        return word
    s = []
    for ch in word:
        if ch in "àáâä":
            s.append("a")
        elif ch in "òóôö":
            s.append("o")
        elif ch in "èéêë":
            s.append("e")
        elif ch in "ùúûü":
            s.append("u")
        elif ch in "ìíîï":
            s.append("i")
        else:
            s.append(ch)
    l = len(s)
    last, prev = s[l - 1], s[l - 2]
    if last == "e":
        l -= 2 if prev in "ih" else 1
    elif last == "i":
        l -= 2 if prev in "hi" else 1
    elif last == "a":
        l -= 2 if prev == "i" else 1
    elif last == "o":
        l -= 2 if prev == "i" else 1
    return "".join(s[:l])


_PT_FOLD = {"à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
            "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
            "è": "e", "é": "e", "ê": "e", "ë": "e",
            "ù": "u", "ú": "u", "û": "u", "ü": "u",
            "ì": "i", "í": "i", "î": "i", "ï": "i", "ç": "c"}


def _pt_remove_suffix(s: list, l: int) -> int:
    """PortugueseLightStemmer.java removeSuffix (:117-160)."""
    def ew(suf: str) -> bool:
        k = len(suf)
        return l >= k and s[l - k:l] == list(suf)

    if l > 4 and ew("es") and s[l - 3] in "rslz":
        return l - 2
    if l > 3 and ew("ns"):
        s[l - 2] = "m"
        return l - 1
    if l > 4 and (ew("eis") or ew("éis")):
        s[l - 3] = "e"
        s[l - 2] = "l"
        return l - 1
    if l > 4 and ew("ais"):
        s[l - 2] = "l"
        return l - 1
    if l > 4 and ew("óis"):
        s[l - 3] = "o"
        s[l - 2] = "l"
        return l - 1
    if l > 4 and ew("is"):
        s[l - 1] = "l"
        return l
    if l > 3 and (ew("ões") or ew("ães")):
        l -= 1
        s[l - 2] = "ã"
        s[l - 1] = "o"
        return l
    if l > 6 and ew("mente"):
        return l - 5
    if l > 3 and s[l - 1] == "s":
        return l - 1
    return l


def _pt_norm_feminine(s: list, l: int) -> int:
    """PortugueseLightStemmer.java normFeminine (:162-199)."""
    def ew(suf: str) -> bool:
        k = len(suf)
        return l >= k and s[l - k:l] == list(suf)

    if l > 7 and (ew("inha") or ew("iaca") or ew("eira")):
        s[l - 1] = "o"
        return l
    if l > 6:
        if ew("osa") or ew("ica") or ew("ida") or ew("ada") or ew("iva") or ew("ama"):
            s[l - 1] = "o"
            return l
        if ew("ona"):
            s[l - 3] = "ã"
            s[l - 2] = "o"
            return l - 1
        if ew("ora"):
            return l - 1
        if ew("esa"):
            s[l - 3] = "ê"
            return l - 1
        if ew("na"):
            s[l - 1] = "o"
            return l
    return l


@functools.lru_cache(maxsize=65536)
def portuguese_light_stem(word: str) -> str:
    """PortugueseLightStemmer.java:63-115 (UniNE): suffix removal →
    feminine normalization → final vowel → fold LAST."""
    if len(word) < 4:
        return word
    s = list(word)
    l = _pt_remove_suffix(s, len(s))
    if l > 3 and s[l - 1] == "a":
        l = _pt_norm_feminine(s, l)
    if l > 4 and s[l - 1] in "eao":
        l -= 1
    return "".join(_PT_FOLD.get(ch, ch) for ch in s[:l])


@functools.lru_cache(maxsize=65536)
def dutch_light_stem(word: str) -> str:
    """No light stemmer exists in the reference for Dutch (nl/ uses
    Snowball); this is a documented engine approximation: plural -en
    with final-consonant undoubling, plural/genitive -s, diminutive -je
    (katten → kat, huizen → huiz, boekjes → boek)."""
    w = word
    if len(w) >= 5 and w.endswith("en"):
        w = w[:-2]
        if len(w) > 2 and w[-1] == w[-2]:
            w = w[:-1]
    elif len(w) >= 5 and w.endswith("s") and w[-2] not in "aeiou":
        w = w[:-1]
    if len(w) >= 6 and w.endswith("je"):
        w = w[:-2]
    return w


@functools.lru_cache(maxsize=65536)
def swedish_light_stem(word: str) -> str:
    """SwedishLightStemmer.java:63-101 (CLEF-2003): possessive -s, then
    one longest-first ending strip."""
    w = word
    l = len(w)
    if l > 4 and w[l - 1] == "s":
        l -= 1
    w = w[:l]

    def ew(suf: str) -> bool:
        return l >= len(suf) and w.endswith(suf)

    if l > 7 and (ew("elser") or ew("heten")):
        return w[:l - 5]
    if l > 6 and (ew("arne") or ew("erna") or ew("ande") or ew("else")
                  or ew("aste") or ew("orna") or ew("aren")):
        return w[:l - 4]
    if l > 5 and (ew("are") or ew("ast") or ew("het")):
        return w[:l - 3]
    if l > 4 and (ew("ar") or ew("er") or ew("or") or ew("en")
                  or ew("at") or ew("te") or ew("et")):
        return w[:l - 2]
    if l > 3 and w[l - 1] in "taen":
        return w[:l - 1]
    return w


@functools.lru_cache(maxsize=65536)
def norwegian_light_stem(word: str, bokmaal: bool = True,
                         nynorsk: bool = False) -> str:
    """NorwegianLightStemmer.java:85-182 — hand-crafted light endings;
    flags select Bokmål/Nynorsk-specific rules (BOKMAAL default, as
    NorwegianLightStemFilter's default constructor)."""
    bm, nn = bokmaal, nynorsk
    w = word
    l = len(w)
    if l > 4 and w[l - 1] == "s":
        l -= 1
    w = w[:l]

    def ew(suf: str) -> bool:
        return l >= len(suf) and w.endswith(suf)

    if l > 7 and ((ew("heter") and bm) or (ew("heten") and bm)
                  or (ew("heita") and nn)):
        return w[:l - 5]
    if l > 8 and nn and (ew("heiter") or ew("leiken") or ew("leikar")):
        return w[:l - 6]
    if l > 5 and (ew("dom") or (ew("het") and bm)):
        return w[:l - 3]
    if l > 6 and nn and (ew("heit") or ew("semd") or ew("leik")):
        return w[:l - 4]
    if l > 7 and (ew("elser") or ew("elsen")):
        return w[:l - 5]
    if l > 6 and ((ew("ende") and bm) or (ew("ande") and nn) or ew("else")
                  or (ew("este") and bm) or (ew("aste") and nn)
                  or (ew("eren") and bm) or (ew("aren") and nn)):
        return w[:l - 4]
    if l > 5 and ((ew("ere") and bm) or (ew("are") and nn)
                  or (ew("est") and bm) or (ew("ast") and nn)
                  or ew("ene") or (ew("ane") and nn)):
        return w[:l - 3]
    if l > 4 and (ew("er") or ew("en") or ew("et") or (ew("ar") and nn)
                  or (ew("st") and bm) or ew("te")):
        return w[:l - 2]
    if l > 3 and w[l - 1] in "aen":
        return w[:l - 1]
    return w


def nynorsk_light_stem(word: str) -> str:
    """Norwegian light stemming with the NYNORSK flag set."""
    return norwegian_light_stem(word, bokmaal=False, nynorsk=True)


@functools.lru_cache(maxsize=65536)
def russian_light_stem(word: str) -> str:
    """RussianLightStemmer.java:61-147 (Dolamic & Savoy): case-ending
    removal (longest first) then ь/и/нн normalization."""
    w = word
    l = len(w)

    def ew(*sufs: str) -> bool:
        return any(l >= len(x) and w[:l].endswith(x) for x in sufs)

    # removeCase
    if l > 6 and ew("иями", "оями"):
        l -= 4
    elif l > 5 and ew("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его",
                      "ему", "ери", "ими", "ого", "ому", "ыми", "оев"):
        l -= 3
    elif l > 4 and ew("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию",
                      "ьв", "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей",
                      "ём", "ев", "ий", "им", "ое", "ой", "ом", "ов", "ые",
                      "ый", "ым", "ми"):
        l -= 2
    elif l > 3 and w[l - 1] in "аеиоуйыяь":
        l -= 1
    # normalize
    if l > 3:
        if w[l - 1] in "ьи":
            l -= 1
        elif w[l - 1] == "н" and w[l - 2] == "н":
            l -= 1
    return w[:l]


def _fi_is_vowel(ch: str) -> bool:
    return ch in "aeiouy"


def _fi_step1(s: list, l: int) -> int:
    def ew(suf: str) -> bool:
        k = len(suf)
        return l >= k and s[l - k:l] == list(suf)

    if l > 8:
        if ew("kin"):
            return _fi_step1(s, l - 3)
        if ew("ko"):
            return _fi_step1(s, l - 2)
    if l > 11:
        if ew("dellinen"):
            return l - 8
        if ew("dellisuus"):
            return l - 9
    return l


def _fi_step2(s: list, l: int) -> int:
    def ew(suf: str) -> bool:
        k = len(suf)
        return l >= k and s[l - k:l] == list(suf)

    if l > 5:
        if ew("lla") or ew("tse") or ew("sti"):
            return l - 3
        if ew("ni"):
            return l - 2
        if ew("aa"):
            return l - 1
    return l


def _fi_step3(s: list, l: int) -> int:
    def ew(suf: str) -> bool:
        k = len(suf)
        return l >= k and s[l - k:l] == list(suf)

    if l > 8:
        if ew("nnen"):
            s[l - 4] = "s"
            return l - 3
        if ew("ntena"):
            s[l - 5] = "s"
            return l - 4
        if ew("tten"):
            return l - 4
        if ew("eiden"):
            return l - 5
    if l > 6:
        if ew("neen") or ew("niin") or ew("seen") or ew("teen") or ew("inen"):
            return l - 4
        if s[l - 3] == "h" and _fi_is_vowel(s[l - 2]) and s[l - 1] == "n":
            return l - 3
        if ew("den"):
            s[l - 3] = "s"
            return l - 2
        if ew("ksen"):
            s[l - 4] = "s"
            return l - 3
        if (ew("ssa") or ew("sta") or ew("lla") or ew("lta") or ew("tta")
                or ew("ksi") or ew("lle")):
            return l - 3
    if l > 5:
        if ew("na") or ew("ne"):
            return l - 2
        if ew("nei"):
            return l - 3
    if l > 4:
        if ew("ja") or ew("ta"):
            return l - 2
        if s[l - 1] == "a":
            return l - 1
        if s[l - 1] == "n" and _fi_is_vowel(s[l - 2]):
            return l - 2
        if s[l - 1] == "n":
            return l - 1
    return l


def _fi_norm1(s: list, l: int) -> int:
    def ew(suf: str) -> bool:
        k = len(suf)
        return l >= k and s[l - k:l] == list(suf)

    if l > 5 and ew("hde"):
        s[l - 3] = "k"
        s[l - 2] = "s"
        s[l - 1] = "i"
    if l > 4 and (ew("ei") or ew("at")):
        return l - 2
    if l > 3 and s[l - 1] in "tsjeai":
        return l - 1
    return l


def _fi_norm2(s: list, l: int) -> int:
    if l > 8 and s[l - 1] in "eou":
        l -= 1
    if l > 4:
        if s[l - 1] == "i":
            l -= 1
        if l > 4:
            # collapse runs of repeated k/p/t
            i = 1
            while i < l:
                if s[i] == s[i - 1] and s[i] in "kpt":
                    del s[i]
                    l -= 1
                else:
                    i += 1
    return l


@functools.lru_cache(maxsize=65536)
def finnish_light_stem(word: str) -> str:
    """FinnishLightStemmer.java:61-232 (CLEF-2003): ä/å/ö folding, then
    step1 (clitics) → step2 → step3 (case endings) → norm1 → norm2."""
    if len(word) < 4:
        return word
    s = []
    for ch in word:
        if ch in "äå":
            s.append("a")
        elif ch == "ö":
            s.append("o")
        else:
            s.append(ch)
    l = _fi_step1(s, len(s))
    l = _fi_step2(s, l)
    l = _fi_step3(s, l)
    l = _fi_norm1(s, l)
    l = _fi_norm2(s, l)
    return "".join(s[:l])


def _hu_is_vowel(ch: str) -> bool:
    return ch in "aeiouy"


def _hu_remove_case(s: list, l: int) -> int:
    def ew(*sufs: str) -> bool:
        return any(l >= len(x) and s[l - len(x):l] == list(x) for x in sufs)

    if l > 6 and ew("kent"):
        return l - 4
    if l > 5:
        if ew("nak", "nek", "val", "vel", "ert", "rol", "ban", "ben", "bol",
              "nal", "nel", "hoz", "hez", "tol"):
            return l - 3
        if ew("al", "el") and not _hu_is_vowel(s[l - 3]) and s[l - 3] == s[l - 4]:
            return l - 3
    if l > 4:
        if ew("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig"):
            return l - 2
        if ew("on", "en") and not _hu_is_vowel(s[l - 3]):
            return l - 2
        if s[l - 1] in "tn":
            return l - 1
        if s[l - 1] in "ae" and s[l - 2] == s[l - 3] and not _hu_is_vowel(s[l - 2]):
            return l - 2
    return l


def _hu_remove_possessive(s: list, l: int) -> int:
    def ew(*sufs: str) -> bool:
        return any(l >= len(x) and s[l - len(x):l] == list(x) for x in sufs)

    if l > 6:
        if not _hu_is_vowel(s[l - 5]) and ew("atok", "otok", "etek"):
            return l - 4
        if ew("itek", "itok"):
            return l - 4
    if l > 5:
        if not _hu_is_vowel(s[l - 4]) and ew("unk", "tok", "tek"):
            return l - 3
        if _hu_is_vowel(s[l - 4]) and ew("juk"):
            return l - 3
        if ew("ink"):
            return l - 3
    if l > 4:
        if not _hu_is_vowel(s[l - 3]) and ew("am", "em", "om", "ad", "ed",
                                             "od", "uk"):
            return l - 2
        if _hu_is_vowel(s[l - 3]) and ew("nk", "ja", "je"):
            return l - 2
        if ew("im", "id", "ik"):
            return l - 2
    if l > 3:
        if s[l - 1] in "ae":
            if not _hu_is_vowel(s[l - 2]):
                return l - 1
        elif s[l - 1] in "md":
            if _hu_is_vowel(s[l - 2]):
                return l - 1
        elif s[l - 1] == "i":
            return l - 1
    return l


def _hu_remove_plural(s: list, l: int) -> int:
    if l > 3 and s[l - 1] == "k":
        if s[l - 2] in "aoe" and l > 4:
            return l - 2
        return l - 1
    return l


@functools.lru_cache(maxsize=65536)
def hungarian_light_stem(word: str) -> str:
    """HungarianLightStemmer.java:61-241 (UniNE): fold, removeCase,
    removePossessive, removePlural, final-vowel normalize."""
    s = []
    for ch in word:
        if ch == "á":
            s.append("a")
        elif ch in "ëé":
            s.append("e")
        elif ch == "í":
            s.append("i")
        elif ch in "óőõö":
            s.append("o")
        elif ch in "úűũûü":
            s.append("u")
        else:
            s.append(ch)
    l = _hu_remove_case(s, len(s))
    l = _hu_remove_possessive(s, l)
    l = _hu_remove_plural(s, l)
    if l > 3 and s[l - 1] in "aeio":
        l -= 1
    return "".join(s[:l])


def german_normalize(word: str) -> str:
    """GermanNormalizationFilter.java:40-105 — the 3-state FSM: ß→ss,
    ä/ö/ü→a/o/u, and umlaut-e deletion ('ae'→'a', 'oe'→'o', 'ue'→'u'
    when the u does not follow a vowel or q). GermanAnalyzer chains this
    BEFORE the light stemmer (de/GermanAnalyzer.java)."""
    N, V, U = 0, 1, 2
    state = N
    out: list[str] = []
    for c in word:
        if c in "ao":
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state == U:
                pass          # delete the e of ae/oe/ue
            else:
                out.append(c)
            state = V
        elif c in "iqy":
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


@functools.lru_cache(maxsize=65536)
def german_light_norm_stem(word: str) -> str:
    """The GermanAnalyzer chain tail: GermanNormalizationFilter →
    GermanLightStemFilter (straße/strasse both → strass)."""
    return german_light_stem(german_normalize(word))


# name → word-level stem function; Analyzer.stemmer selects from here
# (the TokenFilterFactory SPI role — analysis/util/TokenFilterFactory.java)
from lucene_spark.analysis.phonetic import (   # noqa: E402 (registry tail)
    ascii_fold,
    icu_fold,
    nfkc_cf,
    caverphone2,
    metaphone,
    nysiis,
    refined_soundex,
    soundex,
)
from lucene_spark.analysis.rslp import (       # noqa: E402 (registry tail)
    galician_minimal_stem,
    galician_stem,
    portuguese_minimal_stem,
    portuguese_rslp_stem,
)
from lucene_spark.analysis import stem_i18n    # noqa: E402 (registry tail)
from lucene_spark.analysis import snowball     # noqa: E402 (registry tail)
from lucene_spark.analysis import greek        # noqa: E402 (registry tail)

STEMMERS = {
    "porter": porter_stem,
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "metaphone": metaphone,
    "caverphone2": caverphone2,
    "nysiis": nysiis,
    "ascii_fold": ascii_fold,
    "german_light": german_light_stem,
    "german_light_norm": german_light_norm_stem,
    "french_light": french_light_stem,
    "spanish_light": spanish_light_stem,
    "italian_light": italian_light_stem,
    "portuguese_light": portuguese_light_stem,
    "dutch_light": dutch_light_stem,
    "swedish_light": swedish_light_stem,
    "norwegian_light": norwegian_light_stem,
    "nynorsk_light": nynorsk_light_stem,
    "russian_light": russian_light_stem,
    "finnish_light": finnish_light_stem,
    "hungarian_light": hungarian_light_stem,
    # RSLP family (pt/PortugueseStemmer.java, gl/GalicianStemmer.java;
    # rule interpreter in rslp.py) — 0 mismatches vs ptrslptestdata.zip /
    # ptminimaltestdata.zip / gltestdata.zip
    "portuguese_rslp": portuguese_rslp_stem,
    "portuguese_minimal": portuguese_minimal_stem,
    "galician": galician_stem,
    "galician_minimal": galician_minimal_stem,
    # i18n set (stem_i18n.py) — golden-zip or reference-inline-vector
    # validated, see tests/test_stem_i18n.py
    "arabic": stem_i18n.arabic_stem,
    "sorani": stem_i18n.sorani_stem,
    "czech": stem_i18n.czech_stem,
    "bulgarian": stem_i18n.bulgarian_stem,
    "hindi": stem_i18n.hindi_stem,
    "bengali": stem_i18n.bengali_stem,
    "indonesian": stem_i18n.indonesian_stem,
    "latvian": stem_i18n.latvian_stem,
    "german_minimal": stem_i18n.german_minimal_stem,
    "french_minimal": stem_i18n.french_minimal_stem,
    # SerbianNormalizationFilter occupies the post-stop slot because the
    # reference chains it AFTER StopFilter (sr/SerbianAnalyzer.java:106-113;
    # its Latin-script stop entries match pre-normalization tokens)
    "serbian_norm": stem_i18n.serbian_normalize,
    # Snowball family (snowball.py) — 0 mismatches vs the reference's
    # golden vocabularies (snowball/<lang>.zip), see tests/test_snowball.py
    # Greek (greek.py): the Ntais stemmer — 0 mismatches vs all 342
    # TestGreekStemmer vectors
    "greek": greek.greek_stem,
    "danish": snowball.danish_stem,
    "romanian": snowball.romanian_stem,
    "irish": snowball.irish_stem,
    "nepali": snowball.nepali_stem,
    "turkish": snowball.turkish_stem,
    "dutch": snowball.dutch_stem,
    "english_snowball": snowball.english_porter2_stem,
    "armenian": snowball.armenian_stem,
    "basque": snowball.basque_stem,
    "catalan": snowball.catalan_stem,
    "lithuanian": snowball.lithuanian_stem,
    "estonian": snowball.estonian_stem,
    # Snowball stemmers that are the DEFAULT chain in the reference's
    # sv/no/ru/fi/hu analyzers (each chains SnowballFilter, not the
    # light filter) — 0 mismatches vs snowball/<lang>.zip golden data
    "swedish_snowball": snowball.swedish_snowball_stem,
    "norwegian_snowball": snowball.norwegian_snowball_stem,
    "russian_snowball": snowball.russian_snowball_stem,
    "finnish_snowball": snowball.finnish_stem,
    "hungarian_snowball": snowball.hungarian_stem,
    # factory-selectable Snowball variants (SnowballPorterFilterFactory
    # roles) for languages whose DEFAULT analyzer chains a light stemmer
    "spanish_snowball": snowball.spanish_snowball_stem,
    "italian_snowball": snowball.italian_snowball_stem,
    "portuguese_snowball": snowball.portuguese_snowball_stem,
    "german_snowball": snowball.german_snowball_stem,
    "german2_snowball": snowball.german2_snowball_stem,
    "french_snowball": snowball.french_snowball_stem,
    "lovins": snowball.lovins_stem,
    "kp": snowball.kp_stem,
}


def _stempel_pl(word: str) -> str:
    # lazy import: the trie table loads once per process on first use
    from lucene_spark.analysis.stempel import stempel_stem

    return stempel_stem(word)


# Egothor trie stemmer over the reference's trained Polish table
# (analysis/stempel.py; PolishAnalyzer.java chain) — StempelFilter
# semantics included (≤3-char words and null stems pass through)
STEMMERS["stempel_pl"] = _stempel_pl


def _kstem(word: str) -> str:
    from lucene_spark.analysis.kstem import kstem

    return kstem(word)


# Krovetz dictionary-hybrid English stemmer (analysis/kstem.py;
# en/KStemFilter.java role) — 0 mismatches vs the reference's
# 12,130-word golden vocabulary (kstemTestData.zip)
STEMMERS["kstem"] = _kstem

# Pre-stop-filter per-token normalizers (Analyzer.normalizer selects here):
# the {Arabic,Persian,Sorani,Indic}NormalizationFilter roles, chained in
# each reference analyzer's createComponents order.
NORMALIZERS = {
    "fold_digits": stem_i18n.fold_digits,
    "persian": stem_i18n.persian_norm_chain,
    "sorani": stem_i18n.sorani_norm_chain,
    "hindi": stem_i18n.hindi_norm_chain,
    "bengali": stem_i18n.bengali_norm_chain,
    "arabic": stem_i18n.arabic_normalize,
    "indic": stem_i18n.indic_normalize,
    "turkish": snowball.turkish_normalize,
    "catalan": snowball.catalan_elision,
    # ICU module roles (analysis/icu): UTR#30 folding + nfkc_cf
    "icu_folding": icu_fold,
    "nfkc_cf": nfkc_cf,
    "irish": snowball.irish_normalize,
    "greek": greek.greek_normalize,
}

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
# it,pt,nl,sv}/ (GermanLightStemFilter etc.), which implement the light
# suffix-stripping family published by Jacques Savoy ("Light Stemming
# Approaches for the French, Portuguese, German and Hungarian Languages",
# ACM SAC 2006; "A stemming procedure and stopword list for general
# French corpora", JASIS 50(10), 1999). Implemented here from the
# published rule descriptions — plural/case/gender suffix removal plus
# diacritic folding — NOT ports of the reference code; exact rule sets
# are intentionally minimal ("light": conflate inflectional variants,
# never derivational ones) and are pinned by tests/test_stem.py.


def _fold(word: str, table: dict[str, str]) -> str:
    for k, v in table.items():
        if k in word:
            word = word.replace(k, v)
    return word


_DE_FOLD = {"ä": "a", "ö": "o", "ü": "u", "ß": "ss"}


@functools.lru_cache(maxsize=65536)
def german_light_stem(word: str) -> str:
    """Umlaut folding + iterative plural/case endings (-en/-er/-es/-em,
    then -e/-n/-s/-r): Hunde/Hunden/Hund → hund, Häuser → haus."""
    w = _fold(word, _DE_FOLD)
    for _ in range(2):
        if len(w) > 5 and w[-2:] in ("en", "er", "es", "em"):
            w = w[:-2]
        elif len(w) > 4 and w[-1] in "ensr":
            w = w[:-1]
        else:
            break
    return w


@functools.lru_cache(maxsize=65536)
def french_light_stem(word: str) -> str:
    """Savoy's minimal French stemmer shape: -aux→al, then final
    x/s/r/e/é stripping and final double-letter collapse, only on words
    of length >= 6 (chevaux→cheval, tables→tabl, chanter→chant)."""
    w = word
    if len(w) >= 6 and w.endswith("x"):
        if w.endswith("aux"):
            w = w[:-3] + "al"
        else:
            w = w[:-1]
    if len(w) >= 6 and w.endswith("s"):
        w = w[:-1]
    if len(w) >= 6 and w.endswith("r"):
        w = w[:-1]
    if len(w) >= 5 and w.endswith("e"):
        w = w[:-1]
    if len(w) >= 5 and w.endswith("é"):
        w = w[:-1]
    if len(w) >= 5 and w[-1] == w[-2]:
        w = w[:-1]
    return w


_ES_FOLD = {"á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u"}


@functools.lru_cache(maxsize=65536)
def spanish_light_stem(word: str) -> str:
    """Accent folding + plural/gender endings: -os/-as/-es then -o/-a/-e
    (perros/perro → perr, gatos/gato → gat, canciónes → cancion)."""
    w = _fold(word, _ES_FOLD)
    if len(w) >= 5 and w[-2:] in ("os", "as", "es"):
        return w[:-2]
    if len(w) >= 4 and w[-1] in "oae":
        return w[:-1]
    return w


_IT_FOLD = {"à": "a", "è": "e", "é": "e", "ì": "i", "ò": "o", "ù": "u"}


@functools.lru_cache(maxsize=65536)
def italian_light_stem(word: str) -> str:
    """Accent folding, -ie/-he bigram endings, then final vowel removal
    (gatti/gatto → gatt, amiche → amic)."""
    w = _fold(word, _IT_FOLD)
    if len(w) > 5 and w[-2:] in ("ie", "he"):
        return w[:-2]
    if len(w) > 4 and w[-1] in "aeio":
        return w[:-1]
    return w


_PT_FOLD = {"á": "a", "â": "a", "ã": "a", "é": "e", "ê": "e", "í": "i",
            "ó": "o", "ô": "o", "õ": "o", "ú": "u", "ç": "c"}


@functools.lru_cache(maxsize=65536)
def portuguese_light_stem(word: str) -> str:
    """RSLP-S-style plural reduction (the published plural step of the
    RSLP stemmer, Orengo & Huyck 2001) + diacritic folding:
    ões/ães→ão-fold, ns→m, ais→al, eis→el, óis→ol, is→il, -s."""
    w = word
    if w.endswith("ões") or w.endswith("ães"):
        w = w[:-3] + "ão"
    elif w.endswith("ns"):
        w = w[:-2] + "m"
    elif len(w) > 5 and w.endswith("ais"):
        w = w[:-2] + "l"
    elif len(w) > 5 and w.endswith("eis"):
        w = w[:-3] + "el"
    elif w.endswith("óis"):
        w = w[:-3] + "ol"
    elif len(w) > 5 and w.endswith("is"):
        w = w[:-2] + "il"
    elif len(w) > 3 and w.endswith("es"):
        w = w[:-2]
    elif len(w) > 3 and w.endswith("s"):
        w = w[:-1]
    return _fold(w, _PT_FOLD)


@functools.lru_cache(maxsize=65536)
def dutch_light_stem(word: str) -> str:
    """Plural -en with final-consonant undoubling, plural/genitive -s,
    diminutive -je (katten → kat, huizen → huiz, boekjes → boek)."""
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
    """Definite/plural endings: -arna/-erna/-orna, then -ar/-er/-or/
    -en/-et/-na, then single -a/-e/-n/-s (bilarna/bilar/bilen → bil)."""
    w = word
    if len(w) >= 6 and w[-4:] in ("arna", "erna", "orna"):
        return w[:-4]
    if len(w) >= 5 and w[-2:] in ("ar", "er", "or", "en", "et", "na"):
        return w[:-2]
    if len(w) >= 5 and w[-1] in "aens":
        return w[:-1]
    return w


# name → word-level stem function; Analyzer.stemmer selects from here
# (the TokenFilterFactory SPI role — analysis/util/TokenFilterFactory.java)
STEMMERS = {
    "porter": porter_stem,
    "german_light": german_light_stem,
    "french_light": french_light_stem,
    "spanish_light": spanish_light_stem,
    "italian_light": italian_light_stem,
    "portuguese_light": portuguese_light_stem,
    "dutch_light": dutch_light_stem,
    "swedish_light": swedish_light_stem,
}

"""Snowball stemmers, pure-Python, exact to the published algorithms.

The Snowball algorithms are public (snowballstem.org); the reference wraps
machine-generated Java for them (org/tartarus/snowball/ext/*.java, used by
analysis/snowball/SnowballFilter.java). Each function below re-implements
the published algorithm directly in Python and is validated to ZERO
mismatches against the reference's golden vocabularies
(analysis/common/src/test/.../snowball/<lang>.zip: voc.txt → output.txt)
in tests/test_snowball.py.

Semantics notes shared by the implementations (mirrors the Snowball
runtime, SnowballProgram.java):
- R1/R2 are *indices* computed once on the input word; suffix removal only
  shortens the tail so the indices stay valid.
- "among in R1" = the longest listed suffix that the word ends with AND
  that lies entirely inside R1 (candidates crossing the R1 boundary are
  skipped in favor of shorter ones, exactly like find_among_b under
  limit_backward = p1).
- Grouping tests that run after the among (e.g. Danish s_ending) are NOT
  R1-restricted — the generated code restores limit_backward first.
"""

from __future__ import annotations


def _r1_std(word: str, vowels: frozenset[str]) -> int:
    """Standard R1: index after the first non-vowel following a vowel."""
    n = len(word)
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    return i + 1 if i < n else n


def _r1_scand(word: str, vowels: frozenset[str]) -> int:
    """Scandinavian R1: standard R1 but at least 3 chars precede it.
    Words shorter than 3 get R1 = len(word) (mark_regions fails)."""
    n = len(word)
    if n < 3:
        return n
    p1 = _r1_std(word, vowels)
    return max(p1, 3) if p1 < n else n


def _longest_in_r1(word: str, p1: int, sufs) -> str | None:
    """Longest suffix from `sufs` (iterable, pre-sorted longest-first) that
    the word ends with and that lies entirely in R1."""
    n = len(word)
    for s in sufs:
        if word.endswith(s) and n - len(s) >= p1:
            return s
    return None


# =========================================================================
# Danish — snowballstem.org/algorithms/danish/stemmer.html
# (reference: org/tartarus/snowball/ext/DanishStemmer.java)
# =========================================================================

_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")
# undouble consonant grouping is ASCII-only: b-z minus e i o u y
_DA_CONS = frozenset("bcdfghjklmnpqrstvwxz")

_DA_STEP1 = sorted(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
     "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
     "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
     "ers", "ets", "erets", "et", "eret", "s"],
    key=len, reverse=True)
_DA_STEP3 = sorted(["ig", "lig", "elig", "els", "løst"], key=len, reverse=True)


def _da_consonant_pair(word: str, p1: int) -> str:
    # step 2: ends with gd/dt/gt/kt entirely in R1 → drop last letter
    if len(word) - 2 >= p1 and word[-2:] in ("gd", "dt", "gt", "kt"):
        return word[:-1]
    return word


def danish_stem(word: str) -> str:
    p1 = _r1_scand(word, _DA_VOWELS)
    # step 1: main suffix
    s = _longest_in_r1(word, p1, _DA_STEP1)
    if s == "s":
        if len(word) >= 2 and word[-2] in _DA_S_ENDING:
            word = word[:-1]
    elif s:
        word = word[: -len(s)]
    # step 2
    word = _da_consonant_pair(word, p1)
    # step 3
    if word.endswith("igst"):
        word = word[:-2]
    s = _longest_in_r1(word, p1, _DA_STEP3)
    if s == "løst":
        word = word[:-1]
    elif s:
        word = word[: -len(s)]
        word = _da_consonant_pair(word, p1)
    # step 4: undouble — last char a consonant in R1, equal to the one before
    if (len(word) - 1 >= p1 and len(word) >= 2
            and word[-1] in _DA_CONS and word[-2] == word[-1]):
        word = word[:-1]
    return word


# =========================================================================
# Romanian — snowballstem.org/algorithms/romanian/stemmer.html
# (reference: org/tartarus/snowball/ext/RomanianStemmer.java)
# ţ/ş below are the cedilla forms U+0163/U+015F, as in the reference.
# =========================================================================

_RO_VOWELS = frozenset("aeiouâîă")

_RO_STEP0 = {  # a_1 — R1 post-check on the longest match
    "ea": 3, "aţia": 7, "aua": 2, "iua": 4, "aţie": 7, "ele": 3,
    "ile": 5, "iile": 4, "iei": 4, "atei": 6, "ii": 4, "ului": 1, "ul": 1,
    "elor": 3, "ilor": 4, "iilor": 4,
}
_RO_STEP0_REPL = {1: "", 2: "a", 3: "e", 4: "i", 5: "i", 6: "at",
                  7: "aţi"}

_RO_COMBO = {  # a_2 — replacements, repeated while matching in R1
    "icala": "ic", "iciva": "ic", "ativa": "at", "itiva": "it",
    "icale": "ic", "aţiune": "at", "iţiune": "it",
    "atoare": "at", "itoare": "it", "ătoare": "at", "icitate": "ic",
    "abilitate": "abil", "ibilitate": "ibil", "ivitate": "iv",
    "icive": "ic", "ative": "at", "itive": "it", "icali": "ic",
    "atori": "at", "icatori": "ic", "itori": "it", "ători": "at",
    "icitati": "ic", "abilitati": "abil", "ivitati": "iv", "icivi": "ic",
    "ativi": "at", "itivi": "it", "icităi": "ic",
    "abilităi": "abil", "ivităi": "iv",
    "icităţi": "ic", "abilităţi": "abil",
    "ivităţi": "iv", "ical": "ic", "ator": "at",
    "icator": "ic", "itor": "it", "ător": "at", "iciv": "ic",
    "ativ": "at", "itiv": "it", "icală": "ic", "icivă": "ic",
    "ativă": "at", "itivă": "it",
}

_RO_STD = {  # a_3 — R2 post-check; 1 delete, 2 ţ+iune→t, 3 →ist
    "ica": 1, "abila": 1, "ibila": 1, "oasa": 1, "ata": 1, "ita": 1,
    "anta": 1, "ista": 3, "uta": 1, "iva": 1, "ic": 1, "ice": 1,
    "abile": 1, "ibile": 1, "isme": 3, "iune": 2, "oase": 1, "ate": 1,
    "itate": 1, "ite": 1, "ante": 1, "iste": 3, "ute": 1, "ive": 1,
    "ici": 1, "abili": 1, "ibili": 1, "iuni": 2, "atori": 1, "osi": 1,
    "ati": 1, "itati": 1, "iti": 1, "anti": 1, "isti": 3, "uti": 1,
    "işti": 3, "ivi": 1, "ităi": 1, "oşi": 1,
    "ităţi": 1, "abil": 1, "ibil": 1, "ism": 3, "ator": 1,
    "os": 1, "at": 1, "it": 1, "ant": 1, "ist": 3, "ut": 1, "iv": 1,
    "ică": 1, "abilă": 1, "ibilă": 1, "oasă": 1,
    "ată": 1, "ită": 1, "antă": 1, "istă": 3,
    "ută": 1, "ivă": 1,
}

_RO_VERB = {  # a_4 — limit-based among within RV; 1 needs non-vowel/'u'
    "ea": 1, "ia": 1, "esc": 1, "ăsc": 1, "ind": 1, "ând": 1,
    "are": 1, "ere": 1, "ire": 1, "âre": 1, "se": 2, "ase": 1,
    "sese": 2, "ise": 1, "use": 1, "âse": 1, "eşte": 1,
    "ăşte": 1, "eze": 1, "ai": 1, "eai": 1, "iai": 1,
    "sei": 2, "eşti": 1, "ăşti": 1, "ui": 1, "ezi": 1,
    "âi": 1, "aşi": 1, "seşi": 2, "aseşi": 1,
    "seseşi": 2, "iseşi": 1, "useşi": 1,
    "âseşi": 1, "işi": 1, "uşi": 1, "âşi": 1,
    "aţi": 2, "eaţi": 1, "iaţi": 1, "eţi": 2,
    "iţi": 2, "âţi": 2, "arăţi": 1,
    "serăţi": 2, "aserăţi": 1,
    "seserăţi": 2, "iserăţi": 1,
    "userăţi": 1, "âserăţi": 1,
    "irăţi": 1, "urăţi": 1, "ârăţi": 1,
    "am": 1, "eam": 1, "iam": 1, "em": 2, "asem": 1, "sesem": 2,
    "isem": 1, "usem": 1, "âsem": 1, "im": 2, "âm": 2,
    "ăm": 2, "arăm": 1, "serăm": 2, "aserăm": 1,
    "seserăm": 2, "iserăm": 1, "userăm": 1,
    "âserăm": 1, "irăm": 1, "urăm": 1,
    "ârăm": 1, "au": 1, "eau": 1, "iau": 1, "indu": 1,
    "ându": 1, "ez": 1, "ească": 1, "ară": 1,
    "seră": 2, "aseră": 1, "seseră": 2, "iseră": 1,
    "useră": 1, "âseră": 1, "iră": 1, "ură": 1,
    "âră": 1, "ează": 1,
}

_RO_STEP0_SUFS = sorted(_RO_STEP0, key=len, reverse=True)
_RO_COMBO_SUFS = sorted(_RO_COMBO, key=len, reverse=True)
_RO_STD_SUFS = sorted(_RO_STD, key=len, reverse=True)
_RO_VERB_SUFS = sorted(_RO_VERB, key=len, reverse=True)
_RO_VOWEL_SUFS = ("ie", "a", "e", "i", "ă")


def _longest_suffix(word: str, sufs) -> str | None:
    """Longest suffix the word ends with, NO region constraint (the
    post-check among shape: region is tested after on the winner only)."""
    for s in sufs:
        if word.endswith(s):
            return s
    return None


def _rv_es(word: str, vowels) -> int:
    """Spanish-family RV (also Romanian/Italian/Portuguese):
    - 2nd letter consonant → after the next vowel;
    - first two letters vowels → after the next consonant;
    - else (consonant+vowel) → after the 3rd letter;
    end of word when not found."""
    n = len(word)
    if n == 0:
        return 0
    if word[0] in vowels:
        if n > 1 and word[1] in vowels:
            i = 2
            while i < n and word[i] in vowels:
                i += 1
            return i + 1 if i < n else n
        i = 2
        while i < n and word[i] not in vowels:
            i += 1
        return i + 1 if i < n else n
    if n > 1 and word[1] not in vowels:
        i = 2
        while i < n and word[i] not in vowels:
            i += 1
        return i + 1 if i < n else n
    return 3 if n >= 3 else n


def _r1_r2(word: str, vowels) -> tuple[int, int]:
    p1 = _r1_std(word, vowels)
    n = len(word)
    i = p1
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    p2 = i + 1 if i < n else n
    return p1, p2


def romanian_stem(word: str) -> str:
    # prelude: u/i between vowels → U/I (consonantized; restored at the end)
    chars = list(word)
    for j in range(1, len(chars) - 1):
        if (chars[j] in "ui" and chars[j - 1] in _RO_VOWELS
                and chars[j + 1] in _RO_VOWELS):
            chars[j] = chars[j].upper()
    word = "".join(chars)

    pv = _rv_es(word, _RO_VOWELS)
    p1, p2 = _r1_r2(word, _RO_VOWELS)

    # step 0: plural/article suffixes (R1 post-check)
    s = _longest_suffix(word, _RO_STEP0_SUFS)
    if s and len(word) - len(s) >= p1:
        act = _RO_STEP0[s]
        if act == 5:  # 'ile' → 'i' unless preceded by 'ab'
            if not word[: -len(s)].endswith("ab"):
                word = word[: -len(s)] + "i"
        else:
            word = word[: -len(s)] + _RO_STEP0_REPL[act]

    # standard suffix: combo replacements repeated, then a_3 in R2
    removed = False
    while True:
        s = _longest_suffix(word, _RO_COMBO_SUFS)
        if s and len(word) - len(s) >= p1:
            word = word[: -len(s)] + _RO_COMBO[s]
            removed = True
        else:
            break
    s = _longest_suffix(word, _RO_STD_SUFS)
    if s and len(word) - len(s) >= p2:
        act = _RO_STD[s]
        if act == 1:
            word = word[: -len(s)]
            removed = True
        elif act == 2:
            if word[: -len(s)].endswith("ţ"):
                word = word[: -len(s) - 1] + "t"
                removed = True
        else:
            word = word[: -len(s)] + "ist"
            removed = True

    # verb suffix only if nothing standard was removed; limit-based in RV
    if not removed:
        s = _longest_in_r1(word, pv, _RO_VERB_SUFS)
        if s:
            if _RO_VERB[s] == 2:
                word = word[: -len(s)]
            else:
                j = len(word) - len(s) - 1
                if j >= pv and (word[j] not in _RO_VOWELS or word[j] == "u"):
                    word = word[: -len(s)]

    # final vowel (RV post-check)
    s = _longest_suffix(word, _RO_VOWEL_SUFS)
    if s and len(word) - len(s) >= pv:
        word = word[: -len(s)]

    return word.replace("I", "i").replace("U", "u")


# =========================================================================
# Irish — snowballstem.org/algorithms/irish/stemmer.html
# (reference: org/tartarus/snowball/ext/IrishStemmer.java)
# =========================================================================

_GA_VOWELS = frozenset("aeiouáéíóú")
# initial mutation / eclipsis prefixes — longest prefix wins, then replace
_GA_PREFIX = sorted([
    ("d'fh", "f"), ("bhf", "f"), ("b'", ""), ("bh", "b"), ("bp", "p"),
    ("ch", "c"), ("d'", ""), ("dh", "d"), ("dt", "t"), ("fh", "f"),
    ("gc", "c"), ("gh", "g"), ("h-", ""), ("m'", ""), ("mb", "b"),
    ("mh", "m"), ("n-", ""), ("nd", "d"), ("ng", "g"), ("ph", "p"),
    ("sh", "s"), ("t-", ""), ("th", "t"), ("ts", "s"),
], key=lambda kv: len(kv[0]), reverse=True)

_GA_NOUN = {  # 1 → R1 delete, 2 → R2 delete (post-check on longest)
    "íochta": 1, "aíochta": 1, "ire": 2, "aire": 2, "abh": 1, "eabh": 1,
    "ibh": 1, "aibh": 1, "amh": 1, "eamh": 1, "imh": 1, "aimh": 1,
    "íocht": 1, "aíocht": 1, "irí": 2, "airí": 2,
}
_GA_DERIV = {  # 1 → R2 delete; others replace unconditionally
    "óideacha": "óid", "patacha": "paite", "achta": 1, "arcachta": "arc",
    "eachta": 1, "grafaíochta": "graf", "paite": "paite", "ach": 1,
    "each": 1, "óideach": "óid", "gineach": "gin", "patach": "paite",
    "grafaíoch": "graf", "pataigh": "paite", "óidigh": "óid",
    "achtúil": 1, "eachtúil": 1, "gineas": "gin", "ginis": "gin",
    "acht": 1, "arcacht": "arc", "eacht": 1, "grafaíocht": "graf",
    "arcachtaí": "arc", "grafaíochtaí": "graf",
}
_GA_VERB = {  # 1 → RV delete, 2 → R1 delete
    "imid": 1, "aimid": 1, "ímid": 1, "aímid": 1, "adh": 2, "eadh": 2,
    "faidh": 1, "fidh": 1, "áil": 2, "ain": 2, "tear": 2, "tar": 2,
}
_GA_NOUN_SUFS = sorted(_GA_NOUN, key=len, reverse=True)
_GA_DERIV_SUFS = sorted(_GA_DERIV, key=len, reverse=True)
_GA_VERB_SUFS = sorted(_GA_VERB, key=len, reverse=True)


def irish_stem(word: str) -> str:
    for pre, repl in _GA_PREFIX:
        if word.startswith(pre):
            word = repl + word[len(pre):]
            break
    # regions on the de-mutated word; RV = after the first vowel
    n = len(word)
    i = 0
    while i < n and word[i] not in _GA_VOWELS:
        i += 1
    pv = i + 1 if i < n else n
    p1, p2 = _r1_r2(word, _GA_VOWELS)

    s = _longest_suffix(word, _GA_NOUN_SUFS)
    if s and len(word) - len(s) >= (p1 if _GA_NOUN[s] == 1 else p2):
        word = word[: -len(s)]
    s = _longest_suffix(word, _GA_DERIV_SUFS)
    if s:
        repl = _GA_DERIV[s]
        if repl == 1:
            if len(word) - len(s) >= p2:
                word = word[: -len(s)]
        else:
            word = word[: -len(s)] + repl
    s = _longest_suffix(word, _GA_VERB_SUFS)
    if s and len(word) - len(s) >= (pv if _GA_VERB[s] == 1 else p1):
        word = word[: -len(s)]
    return word


# =========================================================================
# Nepali — snowballstem.org/algorithms/nepali/stemmer.html
# (reference: org/tartarus/snowball/ext/NepaliStemmer.java; tables
# extracted mechanically from its among arrays)
# =========================================================================

_NE_CAT1 = {
    "लाइ": 1, "लाई": 1, "सँग": 1, "संग": 1, "मार्फत": 1, "रत": 1,
    "का": 2, "मा": 1, "द्वारा": 1, "कि": 2, "पछि": 1, "की": 2, "ले": 1,
    "कै": 2, "सँगै": 1, "मै": 1, "को": 2,
}
_NE_CAT3 = [
    "थिए", "छ", "इछ", "एछ", "िछ", "ेछ", "नेछ", "हुनेछ", "इन्छ", "िन्छ",
    "हुन्छ", "एका", "इएका", "िएका", "ेका", "नेका", "दा", "इदा", "िदा",
    "देखि", "माथि", "एकी", "इएकी", "िएकी", "ेकी", "देखी", "थी", "दी",
    "छु", "एछु", "ेछु", "नेछु", "नु", "हरु", "हरू", "छे", "थे", "ने",
    "एकै", "ेकै", "नेकै", "दै", "इदै", "िदै", "एको", "इएको", "िएको",
    "ेको", "नेको", "दो", "इदो", "िदो", "यो", "इयो", "भयो", "ियो",
    "थियो", "दियो", "थ्यो", "छौ", "इछौ", "एछौ", "िछौ", "ेछौ", "नेछौ",
    "यौ", "थियौ", "छ्यौ", "थ्यौ", "छन्", "इछन्", "एछन्", "िछन्",
    "ेछन्", "नेछन्", "लान्", "छिन्", "थिन्", "पर्", "इस्", "थिइस्",
    "छस्", "इछस्", "एछस्", "िछस्", "ेछस्", "नेछस्", "िस्", "थिस्",
    "छेस्", "होस्",
]
_NE_CAT1_SUFS = sorted(_NE_CAT1, key=len, reverse=True)
_NE_CAT3_SUFS = sorted(_NE_CAT3, key=len, reverse=True)


def _ne_remove_cat2(word: str) -> str:
    # ँ/ं drop only after यौ छौ नौ थे; ै drops only after त्र
    if word.endswith("ँ") or word.endswith("ं"):
        rest = word[:-1]
        if rest.endswith(("यौ", "छौ", "नौ", "थे")):
            return rest
    elif word.endswith("ै"):
        rest = word[:-1]
        if rest.endswith("त्र"):
            return rest
    return word


def nepali_stem(word: str) -> str:
    # category 1: postpositions (once)
    s = _longest_suffix(word, _NE_CAT1_SUFS)
    if s:
        rest = word[: -len(s)]
        if _NE_CAT1[s] == 1 or not rest.endswith(("ए", "े")):
            word = rest
    # categories 2+3: peel verbal morphology while category 3 matches;
    # a category-2 removal sticks even when category 3 then fails
    while True:
        word = _ne_remove_cat2(word)
        s = _longest_suffix(word, _NE_CAT3_SUFS)
        if s:
            word = word[: -len(s)]
        else:
            break
    return word


# =========================================================================
# Turkish — snowballstem.org/algorithms/turkish/stemmer.html
# (reference: org/tartarus/snowball/ext/TurkishStemmer.java; used through
# analysis/snowball/SnowballFilter.java, which keeps whatever is in the
# buffer regardless of stem()'s boolean — so partial rewrites stick)
# =========================================================================

_TR_VOWELS = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")
# vowel-harmony classes: last vowel → set an earlier vowel must belong to
_TR_HARMONY = {"a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
               "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}


def _tr_harmony(w: str, p: int) -> bool:
    """check_vowel_harmony at cursor p: the last vowel before p must have
    an earlier vowel of its harmony class somewhere in the word."""
    i = p - 1
    while i >= 0 and w[i] not in _TR_VOWELS:
        i -= 1
    if i < 0:
        return False
    grp = _TR_HARMONY[w[i]]
    j = i - 1
    while j >= 0 and w[j] not in grp:
        j -= 1
    return j >= 0


def _tr_opt_cons(w: str, p: int, c: str):
    """mark_suffix_with_optional_X_consonant: consume a preceding X when a
    vowel precedes it; otherwise require not-X AND a vowel two back."""
    if p >= 2 and w[p - 1] == c and w[p - 2] in _TR_VOWELS:
        return p - 1
    if p >= 1 and w[p - 1] == c:
        return None
    if p < 1 or p - 2 < 0 or w[p - 2] not in _TR_VOWELS:
        return None
    return p


def _tr_opt_U(w: str, p: int):
    """mark_suffix_with_optional_U_vowel (the mirror shape: U preceded by
    a non-vowel consumes; else not-U and non-vowel two back)."""
    if p >= 2 and w[p - 1] in _TR_U and w[p - 2] not in _TR_VOWELS:
        return p - 1
    if p >= 1 and w[p - 1] in _TR_U:
        return None
    if p < 1 or p - 2 < 0 or w[p - 2] in _TR_VOWELS:
        return None
    return p


def _tr_among(w: str, p: int, sufs):
    for s in sufs:
        if w.endswith(s, 0, p):
            return p - len(s)
    return None


def _sufs(*groups):
    out = []
    for g in groups:
        out.extend(g.split())
    return sorted(out, key=len, reverse=True)


_TR_POSS = _sufs("m n miz niz muz nuz müz nüz mız nız")
_TR_LARI = _sufs("leri ları")
_TR_NU = _sufs("ni nu nü nı")
_TR_NUN = _sufs("in un ün ın")
_TR_YA = _sufs("a e")
_TR_NA = _sufs("na ne")
_TR_DA = _sufs("da ta de te")
_TR_NDA = _sufs("nda nde")
_TR_DAN = _sufs("dan tan den ten")
_TR_NDAN = _sufs("ndan nden")
_TR_YLA = _sufs("la le")
_TR_NCA = _sufs("ca ce")
_TR_YUM = _sufs("im um üm ım")
_TR_SUN = _sufs("sin sun sün sın")
_TR_YUZ = _sufs("iz uz üz ız")
_TR_SUNUZ = _sufs("siniz sunuz sünüz sınız")
_TR_LAR = _sufs("lar ler")
_TR_NUZ = _sufs("niz nuz nüz nız")
_TR_DUR = _sufs("dir tir dur tur dür tür dır tır")
_TR_CASINA = _sufs("casına cesine")
_TR_YDU = _sufs("di ti dik tik duk tuk dük tük dık tık dim tim dum tum "
                "düm tüm dım tım din tin dun tun dün tün dın tın "
                "du tu dü tü dı tı")
_TR_YSA = _sufs("sa se sak sek sam sem san sen")
_TR_YMUS = _sufs("miş muş müş mış")


def _m_poss(w, p):
    q = _tr_among(w, p, _TR_POSS)
    return None if q is None else _tr_opt_U(w, q)


def _m_sU(w, p):
    if not _tr_harmony(w, p) or p < 1 or w[p - 1] not in _TR_U:
        return None
    return _tr_opt_cons(w, p - 1, "s")


def _m_lArI(w, p):
    return _tr_among(w, p, _TR_LARI)


def _m_yU(w, p):
    if not _tr_harmony(w, p) or p < 1 or w[p - 1] not in _TR_U:
        return None
    return _tr_opt_cons(w, p - 1, "y")


def _harmony_among(table, opt=None):
    def m(w, p):
        if not _tr_harmony(w, p):
            return None
        q = _tr_among(w, p, table)
        if q is None:
            return None
        return _tr_opt_cons(w, q, opt) if opt else q
    return m


_m_nU = _harmony_among(_TR_NU)
_m_nUn = _harmony_among(_TR_NUN, "n")
_m_yA = _harmony_among(_TR_YA, "y")
_m_nA = _harmony_among(_TR_NA)
_m_DA = _harmony_among(_TR_DA)
_m_ndA = _harmony_among(_TR_NDA)
_m_DAn = _harmony_among(_TR_DAN)
_m_ndAn = _harmony_among(_TR_NDAN)
_m_ylA = _harmony_among(_TR_YLA, "y")
_m_ncA = _harmony_among(_TR_NCA, "n")
_m_yUm = _harmony_among(_TR_YUM, "y")
_m_sUn = _harmony_among(_TR_SUN)
_m_yUz = _harmony_among(_TR_YUZ, "y")
_m_lAr = _harmony_among(_TR_LAR)
_m_nUz = _harmony_among(_TR_NUZ)
_m_DUr = _harmony_among(_TR_DUR)
_m_yDU = _harmony_among(_TR_YDU, "y")
_m_ymUs = _harmony_among(_TR_YMUS, "y")


def _m_ki(w, p):
    return p - 2 if w.endswith("ki", 0, p) else None


def _m_sUnUz(w, p):
    return _tr_among(w, p, _TR_SUNUZ)


def _m_cAsInA(w, p):
    return _tr_among(w, p, _TR_CASINA)


def _m_ysA(w, p):
    q = _tr_among(w, p, _TR_YSA)
    return None if q is None else _tr_opt_cons(w, q, "y")


def _m_yken(w, p):
    if not w.endswith("ken", 0, p):
        return None
    return _tr_opt_cons(w, p - 3, "y")


def _first(w, p, *marks):
    for m in marks:
        q = m(w, p)
        if q is not None:
            return q
    return None


def _tr_nominal_verb(w: str):
    """stem_nominal_verb_suffixes → (word, continue_noun_suffixes)."""
    n = len(w)
    # (ymUs_ | yDU | ysA | yken) ] delete
    p = _first(w, n, _m_ymUs, _m_yDU, _m_ysA, _m_yken)
    if p is not None:
        return w[:p], True
    # cAsInA (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_ ] delete
    p = _m_cAsInA(w, n)
    if p is not None:
        p2 = _first(w, p, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)
        if p2 is None:
            p2 = p
        q = _m_ymUs(w, p2)
        if q is not None:
            return w[:q], True
    # lAr ] delete try([ DUr|yDU|ysA|ymUs_ ] delete); stop noun stemming
    p = _m_lAr(w, n)
    if p is not None:
        w2 = w[:p]
        q = _first(w2, len(w2), _m_DUr, _m_yDU, _m_ysA, _m_ymUs)
        if q is not None:
            w2 = w2[:q]
        return w2, False
    # nUz (yDU | ysA) ] delete
    p = _m_nUz(w, n)
    if p is not None:
        q = _first(w, p, _m_yDU, _m_ysA)
        if q is not None:
            return w[:q], True
    # (sUnUz|yUz|sUn|yUm) ] delete try([ ymUs_ ] delete)
    p = _first(w, n, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm)
    if p is not None:
        w2 = w[:p]
        q = _m_ymUs(w2, len(w2))
        if q is not None:
            w2 = w2[:q]
        return w2, True
    # DUr ] delete try([ (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_ ] delete)
    p = _m_DUr(w, n)
    if p is not None:
        w2 = w[:p]
        p2 = _first(w2, len(w2), _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)
        if p2 is None:
            p2 = len(w2)
        q = _m_ymUs(w2, p2)
        if q is not None:
            w2 = w2[:q]
        return w2, True
    return w, True


def _tr_chain_ki(w: str):
    """stem_suffix_chain_before_ki → (word, matched). Returns the input
    unchanged when it fails (it never mutates before failing)."""
    n = len(w)
    p = _m_ki(w, n)
    if p is None:
        return w, False
    # DA branch: delete DA+ki, then optional continuations
    q = _m_DA(w, p)
    if q is not None:
        w2 = w[:q]
        r = _m_lAr(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            w4, ok = _tr_chain_ki(w3)
            return (w4 if ok else w3), True
        r = _m_poss(w2, len(w2))
        if r is not None:
            w3 = w2[:r]
            r2 = _m_lAr(w3, len(w3))
            if r2 is not None:
                w3 = w3[:r2]                      # lAr delete sticks
                w4, ok = _tr_chain_ki(w3)
                if ok:
                    w3 = w4
            return w3, True
        return w2, True
    # nUn branch
    q = _m_nUn(w, p)
    if q is not None:
        w2 = w[:q]
        n2 = len(w2)
        r = _m_lArI(w2, n2)
        if r is not None:
            return w2[:r], True
        r = _m_poss(w2, n2)
        if r is None:
            r = _m_sU(w2, n2)
        if r is not None:
            w3 = w2[:r]
            r2 = _m_lAr(w3, len(w3))
            if r2 is not None:
                w3 = w3[:r2]
                w4, ok = _tr_chain_ki(w3)
                if ok:
                    w3 = w4
            return w3, True
        w3, ok = _tr_chain_ki(w2)
        return (w3 if ok else w2), True
    # ndA branch: nothing deleted unless an inner alternative lands
    q = _m_ndA(w, p)
    if q is not None:
        r = _m_lArI(w, q)
        if r is not None:
            return w[:r], True
        r = _m_sU(w, q)
        if r is not None:
            w2 = w[:r]
            r2 = _m_lAr(w2, len(w2))
            if r2 is not None:
                w2 = w2[:r2]
                w3, ok = _tr_chain_ki(w2)
                if ok:
                    w2 = w3
            return w2, True
        # recurse on the prefix before ndA+ki; the tail stays in place
        pre, ok = _tr_chain_ki(w[:q])
        if ok:
            return pre + w[q:], True
    return w, False


def _tr_noun_suffixes(w: str) -> str:
    """stem_noun_suffixes (ordered alternation, buffer semantics)."""
    n = len(w)
    # lAr ] delete try(chain_ki)
    p = _m_lAr(w, n)
    if p is not None:
        w2 = w[:p]
        w3, ok = _tr_chain_ki(w2)
        return w3 if ok else w2
    # ncA ] delete try(lArI | (poss|sU)(try lAr+chain) | lAr+chain)
    p = _m_ncA(w, n)
    if p is not None:
        w2 = w[:p]
        n2 = len(w2)
        q = _m_lArI(w2, n2)
        if q is not None:
            return w2[:q]
        q = _m_poss(w2, n2)
        if q is None:
            q = _m_sU(w2, n2)
        if q is not None:
            w3 = w2[:q]
            r = _m_lAr(w3, len(w3))
            if r is not None:
                w3 = w3[:r]
                w4, ok = _tr_chain_ki(w3)
                if ok:
                    w3 = w4
            return w3
        q = _m_lAr(w2, n2)
        if q is not None:
            w3 = w2[:q]
            w4, ok = _tr_chain_ki(w3)
            return w4 if ok else w3
        return w2
    # (ndA|nA) then REQUIRED (lArI | sU... | chain-on-prefix)
    p = _first(w, n, _m_ndA, _m_nA)
    if p is not None:
        q = _m_lArI(w, p)
        if q is not None:
            return w[:q]
        q = _m_sU(w, p)
        if q is not None:
            w2 = w[:q]
            r = _m_lAr(w2, len(w2))
            if r is not None:
                w2 = w2[:r]
                w3, ok = _tr_chain_ki(w2)
                if ok:
                    w2 = w3
            return w2
        pre, ok = _tr_chain_ki(w[:p])
        if ok:
            return pre + w[p:]
        # alternative failed entirely; fall through with w unchanged
    # (ndAn|nU) then REQUIRED (sU... | lArI)
    p = _first(w, n, _m_ndAn, _m_nU)
    if p is not None:
        q = _m_sU(w, p)
        if q is not None:
            w2 = w[:q]
            r = _m_lAr(w2, len(w2))
            if r is not None:
                w2 = w2[:r]
                w3, ok = _tr_chain_ki(w2)
                if ok:
                    w2 = w3
            return w2
        q = _m_lArI(w, p)
        if q is not None:
            return w[:q]
    # DAn ] delete try(poss... | lAr try(chain) | chain)
    p = _m_DAn(w, n)
    if p is not None:
        w2 = w[:p]
        n2 = len(w2)
        q = _m_poss(w2, n2)
        if q is not None:
            w3 = w2[:q]
            r = _m_lAr(w3, len(w3))
            if r is not None:
                w3 = w3[:r]
                w4, ok = _tr_chain_ki(w3)
                if ok:
                    w3 = w4
            return w3
        q = _m_lAr(w2, n2)
        if q is not None:
            w3 = w2[:q]
            w4, ok = _tr_chain_ki(w3)
            return w4 if ok else w3
        w3, ok = _tr_chain_ki(w2)
        return w3 if ok else w2
    # (nUn|ylA) ] delete try(lAr+chain | (poss|sU)... | chain); note a
    # failed lAr+chain keeps the lAr deletion and falls to the next arm
    p = _first(w, n, _m_nUn, _m_ylA)
    if p is not None:
        w2 = w[:p]
        q = _m_lAr(w2, len(w2))
        if q is not None:
            w3 = w2[:q]
            w4, ok = _tr_chain_ki(w3)
            if ok:
                return w4
            w2 = w3
        q = _m_poss(w2, len(w2))
        if q is None:
            q = _m_sU(w2, len(w2))
        if q is not None:
            w3 = w2[:q]
            r = _m_lAr(w3, len(w3))
            if r is not None:
                w3 = w3[:r]
                w4, ok = _tr_chain_ki(w3)
                if ok:
                    w3 = w4
            return w3
        w3, ok = _tr_chain_ki(w2)
        return w3 if ok else w2
    # lArI ] delete
    p = _m_lArI(w, n)
    if p is not None:
        return w[:p]
    # bare chain_ki
    w2, ok = _tr_chain_ki(w)
    if ok:
        return w2
    # (DA|yU|yA) ] delete try((poss [opt lAr] | lAr) delete, chain REQUIRED)
    p = _first(w, n, _m_DA, _m_yU, _m_yA)
    if p is not None:
        w2 = w[:p]
        q = _m_poss(w2, len(w2))
        if q is not None:
            w3 = w2[:q]
            r = _m_lAr(w3, len(w3))
            if r is not None:
                w3 = w3[:r]
            w4, ok = _tr_chain_ki(w3)
            return w4 if ok else w3
        q = _m_lAr(w2, len(w2))
        if q is not None:
            w3 = w2[:q]
            w4, ok = _tr_chain_ki(w3)
            return w4 if ok else w3
        return w2
    # (poss|sU) ] delete try(lAr+chain)
    q = _m_poss(w, n)
    if q is None:
        q = _m_sU(w, n)
    if q is not None:
        w2 = w[:q]
        r = _m_lAr(w2, len(w2))
        if r is not None:
            w2 = w2[:r]
            w3, ok = _tr_chain_ki(w2)
            if ok:
                w2 = w3
        return w2
    return w


_TR_FINAL = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def turkish_stem(word: str) -> str:
    if sum(c in _TR_VOWELS for c in word) < 2:
        return word
    w, cont = _tr_nominal_verb(word)
    if not cont:
        return w
    w = _tr_noun_suffixes(w)
    # postlude
    if w in ("ad", "soyad"):       # reserved words skip post-processing
        return w
    if w and w[-1] in "dg":        # append harmony vowel after final d/g
        i = len(w) - 1
        while i >= 0 and w[i] not in _TR_VOWELS:
            i -= 1
        if i >= 0:
            v = w[i]
            w += ("ı" if v in "aı" else "i" if v in "ei"
                  else "u" if v in "ou" else "ü")
    if w and w[-1] in _TR_FINAL:   # final devoicing b→p c→ç d→t ğ→k
        w = w[:-1] + _TR_FINAL[w[-1]]
    return w


# =========================================================================
# Chain helpers for the Turkish / Irish analyzers
# =========================================================================

def turkish_normalize(tok: str) -> str:
    """ApostropheFilter + TurkishLowerCaseFilter
    (tr/TurkishAnalyzer.java:110-113): truncate at the first apostrophe,
    then Turkish-aware lowering (İ→i, I→ı, I+combining-dot→i)."""
    for a in ("'", "’"):
        i = tok.find(a)
        if i >= 0:
            tok = tok[:i]
    out = []
    i, n = 0, len(tok)
    while i < n:
        c = tok[i]
        if c == "İ":
            out.append("i")
        elif c == "I":
            if i + 1 < n and tok[i + 1] == "̇":
                out.append("i")
                i += 1          # consume the combining dot above
            else:
                out.append("ı")
        else:
            out.append(c.lower())
        i += 1
    return "".join(out)


_GA_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")


def irish_normalize(tok: str) -> str:
    """ElisionFilter(d,m,b) + IrishLowerCaseFilter
    (ga/IrishAnalyzer.java:122-123): strip a d'/m'/b' article, then keep
    an n/t eclipsis prefix as 'n-'/'t-' before an uppercase vowel (so the
    stemmer's n-/t- rules fire), lowercasing the remainder."""
    if len(tok) >= 2 and tok[1] in "'’" and tok[0] in "dmbDMB":
        tok = tok[2:]
    if len(tok) > 1 and tok[0] in "nt" and tok[1] in _GA_UPPER_VOWELS:
        return tok[0] + "-" + tok[1:].lower()
    return tok.lower()


# =========================================================================
# English "porter2" — snowballstem.org/algorithms/english/stemmer.html
# (reference: org/tartarus/snowball/ext/EnglishStemmer.java; exposed as
# the SnowballPorterFilterFactory language=English chain — distinct from
# the classic Porter stemmer shipped as stem.porter_stem)
# =========================================================================

_EN_V = frozenset("aeiouy")
_EN_NOT_SHORT_C = frozenset("aeiouywxY")   # shortv excludes w, x, Y

_EN_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXC2 = frozenset(["inning", "outing", "canning", "herring", "earring",
                      "proceed", "exceed", "succeed"])
_EN_STEP2 = {  # a_5 → replacement; None = special
    "tional": "tion", "enci": "ence", "anci": "ance", "abli": "able",
    "entli": "ent", "izer": "ize", "ization": "ize", "ational": "ate",
    "ation": "ate", "ator": "ate", "alism": "al", "aliti": "al",
    "alli": "al", "fulness": "ful", "ousli": "ous", "ousness": "ous",
    "iveness": "ive", "iviti": "ive", "biliti": "ble", "bli": "ble",
    "fulli": "ful", "lessli": "less", "ogi": None, "li": None,
}
_EN_STEP3 = {"tional": "tion", "ational": "ate", "alize": "al",
             "icate": "ic", "iciti": "ic", "ical": "ic", "ful": "",
             "ness": "", "ative": None}
_EN_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
             "ement", "ment", "ent", "ism", "ate", "iti", "ous", "ive",
             "ize", "ion"]
_EN_VALID_LI = frozenset("cdeghkmnrt")
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_EN_STEP2_SUFS = sorted(_EN_STEP2, key=len, reverse=True)
_EN_STEP3_SUFS = sorted(_EN_STEP3, key=len, reverse=True)
_EN_STEP4_SUFS = sorted(_EN_STEP4, key=len, reverse=True)


def _en_shortv(w: str, p: int) -> bool:
    """Backward short-syllable test ending at p: (non-WXY-consonant,
    vowel, consonant) or (consonant, vowel, start-of-word)."""
    if p >= 3 and (w[p - 1] not in _EN_NOT_SHORT_C and w[p - 2] in _EN_V
                   and w[p - 3] not in _EN_V):
        return True
    return p == 2 and w[0] in _EN_V and w[1] not in _EN_V


def english_porter2_stem(word: str) -> str:
    exc = _EN_EXC1.get(word)
    if exc is not None:
        return exc
    if len(word) < 3:
        return word
    # prelude: drop one leading apostrophe; y at start / after vowel → Y
    if word.startswith("'"):
        word = word[1:]
    chars = list(word)
    y_found = False
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for j in range(1, len(chars)):
        if chars[j] == "y" and chars[j - 1] in _EN_V:
            chars[j] = "Y"
            y_found = True
    word = "".join(chars)
    # regions: R1 skips a gener/commun/arsen prefix
    n = len(word)
    p1 = None
    for pre in ("commun", "gener", "arsen"):
        if word.startswith(pre):
            p1 = len(pre)
            break
    if p1 is None:
        p1 = _r1_std(word, _EN_V)
    i = p1
    while i < n and word[i] not in _EN_V:
        i += 1
    while i < n and word[i] in _EN_V:
        i += 1
    p2 = i + 1 if i < n else n

    # step 0 + 1a
    for s in ("'s'", "'s", "'"):
        if word.endswith(s):
            word = word[: -len(s)]
            break
    for s in ("sses", "ies", "ied", "us", "ss", "s"):
        if word.endswith(s):
            if s == "sses":
                word = word[:-2]
            elif s in ("ies", "ied"):
                word = word[:-3] + ("i" if len(word) > 4 else "ie")
            elif s == "s":
                # delete when a vowel exists before the penultimate char
                if any(c in _EN_V for c in word[:-2]):
                    word = word[:-1]
            break
    if word in _EN_EXC2:
        return word

    # step 1b
    for s in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if not word.endswith(s):
            continue
        if s in ("eed", "eedly"):
            if len(word) - len(s) >= p1:
                word = word[: -len(s)] + "ee"
        else:
            stem_part = word[: -len(s)]
            if any(c in _EN_V for c in stem_part):
                word = stem_part
                if word.endswith(("at", "bl", "iz")):
                    word += "e"
                elif word.endswith(_EN_DOUBLES):
                    word = word[:-1]
                elif len(word) == p1 and _en_shortv(word, len(word)):
                    word += "e"
        break

    # step 1c: final y/Y after a non-vowel that isn't the first letter
    if (len(word) > 2 and word[-1] in "yY"
            and word[-2] not in _EN_V):
        word = word[:-1] + "i"

    # step 2 (R1 post-check on the longest match)
    s = _longest_suffix(word, _EN_STEP2_SUFS)
    if s and len(word) - len(s) >= p1:
        if s == "ogi":
            if word[: -3].endswith("l"):
                word = word[:-3] + "og"
        elif s == "li":
            if word[:-2] and word[-3] in _EN_VALID_LI:
                word = word[:-2]
        else:
            word = word[: -len(s)] + _EN_STEP2[s]

    # step 3 (R1; ative additionally needs R2)
    s = _longest_suffix(word, _EN_STEP3_SUFS)
    if s and len(word) - len(s) >= p1:
        if s == "ative":
            if len(word) - 5 >= p2:
                word = word[:-5]
        else:
            word = word[: -len(s)] + _EN_STEP3[s]

    # step 4 (R2; ion only after s/t)
    s = _longest_suffix(word, _EN_STEP4_SUFS)
    if s and len(word) - len(s) >= p2:
        if s == "ion":
            if word[: -3].endswith(("s", "t")):
                word = word[:-3]
        else:
            word = word[: -len(s)]

    # step 5
    if word.endswith("e"):
        if (len(word) - 1 >= p2
                or (len(word) - 1 >= p1
                    and not _en_shortv(word, len(word) - 1))):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= p2 and word.endswith("ll"):
        word = word[:-1]

    return word.replace("Y", "y") if y_found else word


# =========================================================================
# Dutch — snowballstem.org/algorithms/dutch/stemmer.html
# (reference: org/tartarus/snowball/ext/DutchStemmer.java; the
# nl/DutchAnalyzer.java chain also applies a 4-entry stem-override
# dictionary before the Snowball stage — folded into dutch_stem here)
# =========================================================================

_NL_V = frozenset("aeiouyè")
_NL_VJ = _NL_V | {"j"}          # g_v_j
_NL_VI = _NL_V | {"I"}          # g_v_I
_NL_ACCENTS = str.maketrans("áäéëíïóöúü", "aaeeiioouu")
# DutchAnalyzer DEFAULT_STEM_DICT (nl/DutchAnalyzer.java:79-83)
_NL_OVERRIDES = {"fiets": "fiets", "bromfiets": "bromfiets",
                 "ei": "eier", "kind": "kinder"}


def _nl_regions(w: str):
    n, V = len(w), _NL_V
    i = 0
    while i < n and w[i] not in V:
        i += 1
    while i < n and w[i] in V:
        i += 1
    if i >= n:
        return n, n
    p1 = max(i + 1, 3)            # at least 3 chars before R1
    i += 1
    while i < n and w[i] not in V:
        i += 1
    while i < n and w[i] in V:
        i += 1
    if i >= n:
        return p1, n
    return p1, i + 1


def _nl_undouble(w: str) -> str:
    return w[:-1] if w.endswith(("dd", "kk", "tt")) else w


def _nl_en_ending(w: str, b: int, p1: int):
    """Shared en/ene deletion: R1, non-vowel before, not after gem."""
    rest = w[:b]
    if (b >= p1 and rest and rest[-1] not in _NL_V
            and not rest.endswith("gem")):
        return _nl_undouble(rest)
    return None


def _nl_e_ending(w: str, p1: int):
    """Returns (word, e_found)."""
    if (w.endswith("e") and len(w) - 1 >= p1 and len(w) >= 2
            and w[-2] not in _NL_V):
        return _nl_undouble(w[:-1]), True
    return w, False


def dutch_stem(word: str) -> str:
    if word in _NL_OVERRIDES:
        return _NL_OVERRIDES[word]
    # prelude: fold accents; y at start / i,y between vowels → consonants
    w = word.translate(_NL_ACCENTS)
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for j in range(1, len(chars)):
        if (chars[j] == "i" and chars[j - 1] in _NL_V
                and j + 1 < len(chars) and chars[j + 1] in _NL_V):
            chars[j] = "I"
        elif chars[j] == "y" and chars[j - 1] in _NL_V:
            chars[j] = "Y"
    w = "".join(chars)
    p1, p2 = _nl_regions(w)

    # step 1
    for s in ("heden", "ene", "en", "se", "s"):
        if w.endswith(s):
            b = len(w) - len(s)
            if s == "heden":
                if b >= p1:
                    w = w[:b] + "heid"
            elif s in ("ene", "en"):
                w2 = _nl_en_ending(w, b, p1)
                if w2 is not None:
                    w = w2
            else:                          # se / s: not after vowel or j
                if b >= p1 and b >= 1 and w[b - 1] not in _NL_VJ:
                    w = w[:b]
            break

    # step 2
    w, e_found = _nl_e_ending(w, p1)

    # step 3a: heden → delete in R2 (not after c), then en_ending
    if (w.endswith("heid") and len(w) - 4 >= p2
            and not w[: -4].endswith("c")):
        w = w[:-4]
        if w.endswith("en"):
            w2 = _nl_en_ending(w, len(w) - 2, p1)
            if w2 is not None:
                w = w2

    # step 3b: d/verb suffixes (R2)
    for s in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if w.endswith(s):
            b = len(w) - len(s)
            if s in ("end", "ing"):
                if b >= p2:
                    w = w[:b]
                    if (w.endswith("ig") and len(w) - 2 >= p2
                            and not w[: -2].endswith("e")):
                        w = w[:-2]
                    else:
                        w = _nl_undouble(w)
            elif s == "ig":
                if b >= p2 and not w[:b].endswith("e"):
                    w = w[:b]
            elif s == "lijk":
                if b >= p2:
                    w = w[:b]
                    w, _ = _nl_e_ending(w, p1)
            elif s == "baar":
                if b >= p2:
                    w = w[:b]
            else:                          # bar: only if step 2 dropped an e
                if b >= p2 and e_found:
                    w = w[:b]
            break

    # step 4: undouble vowel in C-VV-C
    if (len(w) >= 4 and w[-1] not in _NL_VI
            and w[-3:-1] in ("aa", "ee", "oo", "uu")
            and w[-4] not in _NL_V):
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# =========================================================================
# Armenian — snowballstem.org/algorithms/armenian/stemmer.html
# (reference: org/tartarus/snowball/ext/ArmenianStemmer.java; among data
# in snowball_tables.py, generated by scripts/gen_snowball_tables.py)
# =========================================================================

from lucene_spark.analysis import snowball_tables as _T  # noqa: E402


def _find_b(word: str, lb: int, table) -> tuple[str, int] | None:
    """find_among_b: longest suffix from `table` (pre-sorted longest-first)
    the word ends with that does not extend before limit_backward `lb`.
    Returns (suffix, code) or None. Exact for tables without among-level
    condition methods (true of every table in snowball_tables.py)."""
    n = len(word)
    for s, code in table:
        if n - len(s) >= lb and word.endswith(s):
            return s, code
    return None


def _mark_v2(word: str, vowels) -> tuple[int, int]:
    """Armenian-style regions: pV = after the first vowel; p2 = after the
    first non-vowel that follows the second vowel-run (V* C* V* C
    scanning, each golab loop leaving the cursor past the matched char —
    ArmenianStemmer.r_mark_regions)."""
    n = len(word)
    pV = p2 = n
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    if i >= n:
        return pV, p2
    i += 1
    pV = i
    while i < n and word[i] in vowels:
        i += 1
    if i >= n:
        return pV, p2
    i += 1
    while i < n and word[i] not in vowels:
        i += 1
    if i >= n:
        return pV, p2
    i += 1
    while i < n and word[i] in vowels:
        i += 1
    if i >= n:
        return pV, p2
    return pV, i + 1


def armenian_stem(word: str) -> str:
    """ArmenianStemmer.stem(): within RV (limit_backward = pV), try in
    order ending (R2-gated), verb, adjective, noun — each deletes the
    longest matching suffix from its table."""
    w = word
    pV, p2 = _mark_v2(w, _T.HY_VOWELS)
    if len(w) < pV:
        return w
    for table, need_r2 in ((_T.HY_ENDING, True), (_T.HY_VERB, False),
                           (_T.HY_ADJ, False), (_T.HY_NOUN, False)):
        m = _find_b(w, pV, table)
        if m and (not need_r2 or len(w) - len(m[0]) >= p2):
            w = w[: len(w) - len(m[0])]
    return w
# =========================================================================
# Basque — snowballstem.org/algorithms/basque/stemmer.html
# (reference: org/tartarus/snowball/ext/BasqueStemmer.java)
# =========================================================================

def _find_b_at(w: str, c: int, lb: int, table):
    """find_among_b at cursor c: longest table suffix matching w[:c] that
    does not extend before limit_backward lb. Returns (suffix, code)."""
    for s, code in table:
        if c - len(s) >= lb and w.startswith(s, c - len(s)):
            return s, code
    return None


def basque_stem(word: str) -> str:
    """BasqueStemmer.stem(): repeat aditzak, repeat izenak, one
    adjetiboak pass. RV is the Spanish-family RV; R1/R2 standard.
    Snowball `repeat` semantics: each successful match leaves the cursor
    at bra, so subsequent matches happen strictly to the left — regions
    (absolute indices, never adjusted after slicing, like the Java
    I_pV/I_p1/I_p2 fields) gate deletes via the bra position."""
    w = word
    pV = _rv_es(w, _T.EU_VOWELS)
    p1, p2 = _r1_r2(w, _T.EU_VOWELS)
    c = len(w)

    regions = {"rv": pV, "r2": p2, "r1": p1}

    def apply(table, actions):
        nonlocal w, c
        m = _find_b_at(w, c, 0, table)
        if m is None:
            return False
        s, code = m
        bra = c - len(s)
        gate, rep = actions[code]
        if gate and bra < regions[gate]:
            return False
        w = w[:bra] + rep + w[c:]
        c = bra
        return True

    # per-table switch: code -> (region gate or None, replacement)
    aditzak = {1: ("rv", ""), 2: ("r2", ""), 3: (None, "atseden"),
               4: (None, "arabera"), 5: (None, "baditu")}
    izenak = {1: ("rv", ""), 2: ("r2", ""), 3: (None, "jok"),
              4: ("r1", ""), 5: (None, "tra"), 6: (None, "minutu"),
              7: (None, "zehar"), 8: (None, "geldi"), 9: (None, "igaro"),
              10: (None, "aurka")}
    adj = {1: ("rv", ""), 2: (None, "z")}
    while apply(_T.EU_ADITZAK, aditzak):
        pass
    while apply(_T.EU_IZENAK, izenak):
        pass
    apply(_T.EU_ADJ, adj)
    return w


# =========================================================================
# Catalan — snowballstem.org/algorithms/catalan/stemmer.html
# (reference: org/tartarus/snowball/ext/CatalanStemmer.java)
# =========================================================================

_CA_CLEAN_MAP = str.maketrans("àáèéìíïòóúü·", "aaeeiiioouu.")

_CA_ACT = {
    "pronoun": {1: ("r1", "")},
    "standard": {1: ("r1", ""), 2: ("r2", ""), 3: ("r2", "log"),
                 4: ("r2", "ic"), 5: ("r1", "c")},
    "verb": {1: ("r1", ""), 2: ("r2", "")},
    "residual": {1: ("r1", ""), 2: ("r1", "ic")},
}


def catalan_stem(word: str) -> str:
    """CatalanStemmer.stem(): attached_pronoun, then (standard_suffix or
    verb_suffix), then residual_suffix — each a `do` restoring the cursor
    to the (current) word end — then the forward `cleaning` pass that
    strips accents (all 1:1 char maps, so a translate table)."""
    w = word
    p1, p2 = _r1_r2(w, _T.CA_VOWELS)
    regions = {"r1": p1, "r2": p2}

    def apply(table, actions):
        nonlocal w
        m = _find_b(w, 0, table)
        if m is None:
            return False
        s, code = m
        bra = len(w) - len(s)
        gate, rep = actions[code]
        if bra < regions[gate]:
            return False
        w = w[:bra] + rep
        return True

    apply(_T.CA_PRONOUN, _CA_ACT["pronoun"])
    if not apply(_T.CA_STANDARD, _CA_ACT["standard"]):
        apply(_T.CA_VERB, _CA_ACT["verb"])
    apply(_T.CA_RESIDUAL, _CA_ACT["residual"])
    return w.translate(_CA_CLEAN_MAP)


# =========================================================================
# Lithuanian — snowballstem.org/algorithms/lithuanian/stemmer.html
# (reference: org/tartarus/snowball/ext/LithuanianStemmer.java)
# =========================================================================

_LT_CONFLICT_FROM = {1: "aitė", 2: "uotė", 3: "ėjimas", 4: "esys",
                     5: "asys", 6: "avimas", 7: "ojimas", 8: "okatė"}
_LT_CHDZ_FROM = {1: "t", 2: "d"}


def lithuanian_stem(word: str) -> str:
    """LithuanianStemmer.stem(): R1 with the initial-'a' quirk (words
    longer than 6 starting with 'a' compute R1 from index 1), then
    fix_conflicts, step1 (find_among_b UNDER limit_backward=p1, so a
    long suffix crossing the R1 boundary loses to a shorter in-R1 one),
    fix_chdz, repeated step2 (same R1-limited among), fix_chdz again,
    fix_gd. The fix_* rules are unconditional end replacements."""
    w = word
    n = len(w)
    start = 1 if (n > 6 and w.startswith("a")) else 0
    i = start
    while i < n and w[i] not in _T.LT_VOWELS:
        i += 1
    p1 = n
    if i < n:
        i += 1
        while i < n and w[i] in _T.LT_VOWELS:
            i += 1
        if i < n:
            p1 = i + 1

    def fix(table, froms):
        nonlocal w
        m = _find_b(w, 0, table)
        if m:
            s, code = m
            w = w[: len(w) - len(s)] + froms[code]

    fix(_T.LT_CONFLICTS, _LT_CONFLICT_FROM)
    if len(w) >= p1:
        m = _find_b(w, p1, _T.LT_STEP1)
        if m:
            w = w[: len(w) - len(m[0])]
    fix(_T.LT_CHDZ, _LT_CHDZ_FROM)
    while len(w) >= p1:
        m = _find_b(w, p1, _T.LT_STEP2)
        if m is None:
            break
        w = w[: len(w) - len(m[0])]
    fix(_T.LT_CHDZ, _LT_CHDZ_FROM)
    m = _find_b(w, 0, _T.LT_GD)
    if m:
        w = w[: len(w) - len(m[0])] + "g"
    return w


# =========================================================================
# Estonian — snowballstem.org/algorithms/estonian/stemmer.html
# (reference: org/tartarus/snowball/ext/EstonianStemmer.java)
# =========================================================================

_ET_VERB_EXC_FROM = {
    1: "joo", 2: "saa", 3: "viima", 4: "keesi", 5: "löö", 6: "löi",
    7: "loo", 8: "käisi", 9: "söö", 10: "too", 11: "võisi", 12: "jääma",
    13: "müüsi", 14: "luge", 15: "põde", 16: "ladu", 17: "tegi",
    18: "nägi",
}
_ET_SPECIAL_FROM = {1: "lase", 2: "mise", 3: "lise"}


def _et_longv_before(w: str, pos: int) -> bool:
    """r_LONGV at cursor=pos: the two chars ending at pos form a long
    vowel (aa/ee/ii/oo/uu/ää/õõ/öö/üü)."""
    return pos >= 2 and w[pos - 2] == w[pos - 1] and w[pos - 1] in "aeiouäõöü"


def estonian_stem(word: str) -> str:
    """EstonianStemmer.stem(): whole-word verb exceptions first; then
    emphasis (gi/ki), verb endings (sets is_verb), substantive chain
    (special nouns, case endings, plural-3, degrees, i-plural, nu) when
    no verb ending fired, and finally kk/pp/tt undoubling before a final
    vowel. All amongs match within R1 (find_among_b under
    limit_backward=p1); the post-checks (GI/KI/RV groupings, LONGV,
    mis/las/lis context) run unrestricted, as the generated code restores
    limit_backward before them."""
    w = word
    exc = _ET_VERB_EXC_FROM.get(
        next((c for s, c in _T.ET_VERB_EXC if s == w), 0))
    if exc:
        return exc
    n = len(w)
    # mark_regions: p1 after the first non-vowel following the first vowel
    p1 = _r1_std(w, _T.ET_V1)

    def find(table):
        m = _find_b(w, p1, table)
        if m is None or len(w) < p1:
            return None
        return m

    # --- emphasis ---
    m = find(_T.ET_EMPHASIS)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if bra >= 4:
            if code == 1:
                if (w[bra - 1] in _T.ET_GI
                        and not _et_longv_before(w, bra)):
                    w = w[:bra]
            else:
                if w[bra - 1] in _T.ET_KI:
                    w = w[:bra]

    # --- verb ---
    is_verb = False
    m = find(_T.ET_VERB)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if code == 1:
            w = w[:bra]
            is_verb = True
        elif code == 2:
            w = w[:bra] + "a"
            is_verb = True
        else:  # 3: preceding char must be a V1 vowel
            if bra >= 1 and w[bra - 1] in _T.ET_V1:
                w = w[:bra]
                is_verb = True

    if not is_verb:
        # --- substantive chain, each a `do` at the current end ---
        m = find(_T.ET_SPECIAL_NOUN)
        if m:
            s, code = m
            w = w[: len(w) - len(s)] + _ET_SPECIAL_FROM[code]
        m = find(_T.ET_CASE)
        if m:
            s, _ = m
            bra = len(w) - len(s)
            if (bra >= 1 and w[bra - 1] in _T.ET_RV) or \
                    _et_longv_before(w, bra):
                w = w[:bra]
        m = find(_T.ET_PLURAL3)
        if m:
            s, code = m
            bra = len(w) - len(s)
            if code == 1:
                w = w[:bra] + "iku"
            elif code == 2:
                if not _et_longv_before(w, bra):
                    w = w[:bra]
            elif code == 3:
                if bra >= 4:
                    if w.startswith("mis", bra - 3) or \
                            w.startswith("las", bra - 3) or \
                            w.startswith("lis", bra - 3):
                        w = w[:bra] + "e"
                    elif not w.startswith("t", bra - 1):
                        w = w[:bra]
                    # preceded by "t" with bra>=4: fail (fallback also
                    # sees the "t" and fails)
                else:
                    if not (bra >= 1 and w[bra - 1] == "t"):
                        w = w[:bra] + "t"
            else:  # 4
                if (bra >= 1 and w[bra - 1] in _T.ET_RV) or \
                        _et_longv_before(w, bra):
                    w = w[:bra]
        m = find(_T.ET_DEGREES)
        if m:
            s, code = m
            bra = len(w) - len(s)
            if code == 2 or (bra >= 1 and w[bra - 1] in _T.ET_RV):
                w = w[:bra]
        m = find(_T.ET_IPLURAL)
        if m:
            s, _ = m
            bra = len(w) - len(s)
            if bra >= 1 and w[bra - 1] in _T.ET_RV:
                w = w[:bra]
        m = find(_T.ET_NU)
        if m:
            w = w[: len(w) - len(m[0])]

    # --- remove_double_kpt: final V1 vowel preceded by kk/pp/tt ---
    if (len(w) >= 3 and w[-1] in _T.ET_V1
            and w[-3:-1] in ("kk", "pp", "tt")):
        w = w[:-3] + w[-2:]
    return w


def catalan_elision(tok: str) -> str:
    """ElisionFilter with CatalanAnalyzer.DEFAULT_ARTICLES (d l m n s t,
    case-insensitive — ca/CatalanAnalyzer.java:46-48): strip everything
    up to and including the first apostrophe when the prefix before it
    is an article ("l'home" → "home"). Runs on already-lowercased tokens
    (equivalent to the reference's pre-LowerCase position, since elision
    only removes a case-insensitively matched prefix)."""
    hits = [i for i in (tok.find("'"), tok.find("’")) if i != -1]
    if not hits:
        return tok
    i = min(hits)        # the FIRST apostrophe of either kind, like
    return tok[i + 1:] if tok[:i] in _CA_ARTICLES else tok  # ElisionFilter


_CA_ARTICLES = frozenset("dlmnst")


# =========================================================================
# Swedish / Norwegian Snowball — the reference's DEFAULT sv/no chains
# (sv/SwedishAnalyzer.java, no/NorwegianAnalyzer.java both chain
# SnowballFilter; ext/SwedishStemmer.java, ext/NorwegianStemmer.java)
# =========================================================================

def swedish_snowball_stem(word: str) -> str:
    w = word
    p1 = _r1_scand(w, _T.SV_VOWELS)
    # main_suffix: within R1; code 2 ('s') gated on the preceding char
    if len(w) >= p1:
        m = _find_b(w, p1, _T.SV_MAIN)
        if m:
            s, code = m
            bra = len(w) - len(s)
            if code == 1 or (bra >= 1 and w[bra - 1] in _T.SV_S_END):
                w = w[:bra]
    # consonant_pair: dd/gd/nn/dt/gt/kt/tt within R1 at the end → drop
    # the last char (requires at least one char inside R1)
    if len(w) > p1 and _find_b(w, p1, _T.SV_CONS):
        w = w[:-1]
    # other_suffix: lig/ig/els → delete; löst → lös; fullt → full
    if len(w) >= p1:
        m = _find_b(w, p1, _T.SV_OTHER)
        if m:
            s, code = m
            bra = len(w) - len(s)
            w = w[:bra] + {1: "", 2: "lös", 3: "full"}[code]
    return w


def norwegian_snowball_stem(word: str) -> str:
    w = word
    p1 = _r1_scand(w, _T.NO_VOWELS)
    if len(w) >= p1:
        m = _find_b(w, p1, _T.NO_MAIN)
        if m:
            s, code = m
            bra = len(w) - len(s)
            if code == 1:
                w = w[:bra]
            elif code == 2:
                # 's': preceding char in s_ending, OR 'k' not preceded
                # by a vowel
                if (bra >= 1 and w[bra - 1] in _T.NO_S_END) or \
                        (bra >= 2 and w[bra - 1] == "k"
                         and w[bra - 2] not in _T.NO_VOWELS):
                    w = w[:bra]
            else:  # 3: erte/ert → er
                w = w[:bra] + "er"
    # consonant_pair: dt/vt within R1 at the end → drop the last char
    if len(w) >= 1 and _find_b(w, p1, _T.NO_CONS) and len(w) >= p1:
        w = w[:-1]
    if len(w) >= p1:
        m = _find_b(w, p1, _T.NO_OTHER)
        if m:
            w = w[: len(w) - len(m[0])]
    return w


# =========================================================================
# Russian Snowball — the reference's DEFAULT ru chain
# (ru/RussianAnalyzer.java chains SnowballFilter; ext/RussianStemmer.java)
# =========================================================================

def russian_snowball_stem(word: str) -> str:
    """RussianStemmer.stem(): ё→е prelude; then within RV
    (limit_backward = pV): perfective-gerund OR (reflexive?, then
    adjectival|verb|noun); trailing и; R2-gated derivational
    (ость/ост); tidy-up (ейш(е), double н, soft sign)."""
    w = word.replace("ё", "е")
    pV, p2 = _mark_v2(w, _T.RU_VOWELS)
    if len(w) < pV:
        return w

    def match_ay(table):
        """Among where code 1 additionally requires a preceding а/я
        (inside RV); returns bra or None."""
        m = _find_b(w, pV, table)
        if m is None:
            return None
        s, code = m
        bra = len(w) - len(s)
        if code == 1 and not (bra - 1 >= pV and w[bra - 1] in "ая"):
            return None
        return bra

    # step 1
    bra = match_ay(_T.RU_PERF_GERUND)
    if bra is not None:
        w = w[:bra]
    else:
        m = _find_b(w, pV, _T.RU_REFLEXIVE)
        if m:
            w = w[: len(w) - len(m[0])]
        m = _find_b(w, pV, _T.RU_ADJECTIVE)
        if m:
            w = w[: len(w) - len(m[0])]
            b2 = match_ay(_T.RU_PARTICIPLE)
            if b2 is not None:
                w = w[:b2]
        else:
            b2 = match_ay(_T.RU_VERB)
            if b2 is not None:
                w = w[:b2]
            else:
                m = _find_b(w, pV, _T.RU_NOUN)
                if m:
                    w = w[: len(w) - len(m[0])]

    # step 2: trailing и (inside RV)
    if len(w) - 1 >= pV and w.endswith("и"):
        w = w[:-1]
    # step 3: derivational, R2-gated
    m = _find_b(w, pV, _T.RU_DERIV)
    if m and len(w) - len(m[0]) >= p2:
        w = w[: len(w) - len(m[0])]
    # step 4: tidy up
    m = _find_b(w, pV, _T.RU_TIDY)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if code == 1:          # ейш(е): delete, then нн → н
            w = w[:bra]
            if (len(w) - 2 >= pV and w.endswith("нн")):
                w = w[:-1]
        elif code == 2:        # н preceded by н
            if bra - 1 >= pV and w[bra - 1] == "н":
                w = w[:bra]
        else:                  # 3: soft sign
            w = w[:bra]
    return w


# =========================================================================
# Finnish Snowball — the reference's DEFAULT fi chain
# (fi/FinnishAnalyzer.java chains SnowballFilter; ext/FinnishStemmer.java)
# =========================================================================

_FI_LONGSET = frozenset(("aa", "ee", "ii", "oo", "uu", "ää", "öö"))


def _fi_long(w: str, bra: int, lb: int) -> bool:
    """r_LONG at cursor=bra: a doubled vowel ends at bra (within lb)."""
    return bra - 2 >= lb and w[bra - 2: bra] in _FI_LONGSET


def _fi_vi(w: str, bra: int, lb: int) -> bool:
    """r_VI at cursor=bra: 'i' preceded by a V2 vowel (within lb)."""
    return (bra - 1 >= lb and w[bra - 1] == "i"
            and bra - 1 > lb and w[bra - 2] in _T.FI_V2)


_FI_CONDS = {"r_LONG": _fi_long, "r_VI": _fi_vi}


def _find_b_cond(w: str, lb: int, table, conds) -> tuple[str, int] | None:
    """find_among_b with among-level condition methods: on a condition
    failure the trie falls back through the substring chain, which in a
    longest-first linear scan is exactly 'continue to the next (shorter)
    matching entry' — every matching entry is a suffix of the longest."""
    n = len(w)
    for e in table:
        s, code = e[0], e[1]
        bra = n - len(s)
        if bra >= lb and w.endswith(s):
            if len(e) == 3 and not conds[e[2]](w, bra, lb):
                continue
            return s, code
    return None


def finnish_stem(word: str) -> str:
    """FinnishStemmer.stem(): particle, possessive, case ending (sets
    ending_removed), comparative/other endings (R2), then i-plural if an
    ending was removed else t-plural, then the 4+1-step tidy. Amongs run
    under limit_backward = p1 (p2 for other/t-plural tail); the grouping
    and eq post-checks run with limit_backward restored, per the
    generated code."""
    w = word
    p1, p2 = _r1_r2(word, _T.FI_V1)
    ending_removed = False

    # particle_etc
    if len(w) >= p1:
        m = _find_b(w, p1, _T.FI_PARTICLE)
        if m:
            s, code = m
            bra = len(w) - len(s)
            if code == 1:
                if bra >= 1 and w[bra - 1] in _T.FI_PARTICLE_END:
                    w = w[:bra]
            elif bra >= p2:                        # 2: sti, R2-gated
                w = w[:bra]

    # possessive
    if len(w) >= p1:
        m = _find_b(w, p1, _T.FI_POSSESSIVE)
        if m:
            s, code = m
            bra = len(w) - len(s)
            if code == 1:                          # si, not after k
                if not (bra >= 1 and w[bra - 1] == "k"):
                    w = w[:bra]
            elif code == 2:                        # ni; kse → ksi
                w = w[:bra]
                if w.endswith("kse"):
                    w = w[:-1] + "i"
            elif code == 3:
                w = w[:bra]
            elif code == 4:                        # an after ta/ssa/sta/...
                if _find_b_at(w, bra, 0, _T.FI_SA):
                    w = w[:bra]
            elif code == 5:                        # än after tä/ssä/stä/...
                if _find_b_at(w, bra, 0, _T.FI_SAE):
                    w = w[:bra]
            elif code == 6:                        # en after lle/ine
                if _find_b_at(w, bra, 0, _T.FI_LLE):
                    w = w[:bra]

    # case_ending
    if len(w) >= p1:
        m = _find_b_cond(w, p1, _T.FI_CASE, _FI_CONDS)
        if m:
            s, code = m
            bra = len(w) - len(s)
            ok = False
            if 1 <= code <= 6:                     # h+vowel harmony
                ok = bra >= 1 and w[bra - 1] == "aeioäö"[code - 1]
            elif code == 7:                        # n (+1 after LONG/ie)
                ok = True
                if bra >= 2 and (w[bra - 2: bra] in _FI_LONGSET
                                 or w[bra - 2: bra] == "ie"):
                    bra -= 1
            elif code == 8:                        # a/ä after V1+C... no:
                ok = (bra >= 2 and w[bra - 1] in _T.FI_V1
                      and w[bra - 2] in _T.FI_C)
            else:
                ok = True
            if ok:
                w = w[:bra]
                ending_removed = True

    # other_endings (comparatives), within R2
    if len(w) >= p2:
        m = _find_b(w, p2, _T.FI_OTHER)
        if m:
            s, code = m
            bra = len(w) - len(s)
            if code != 1 or not (bra >= 2 and w[bra - 2: bra] == "po"):
                w = w[:bra]

    if ending_removed:
        if len(w) >= p1:
            m = _find_b(w, p1, _T.FI_IPLURAL)
            if m:
                w = w[: len(w) - len(m[0])]
    else:
        # t_plural: final t after a vowel, both inside R1
        if (len(w) >= p1 and len(w) - 1 >= p1 and w.endswith("t")
                and len(w) - 1 > p1 and w[-2] in _T.FI_V1):
            w = w[:-1]
            if len(w) >= p2:
                m = _find_b(w, p2, _T.FI_TPLURAL)
                if m:
                    s, code = m
                    bra = len(w) - len(s)
                    if code != 1 or not (bra >= 2
                                         and w[bra - 2: bra] == "po"):
                        w = w[:bra]

    # tidy
    if len(w) >= p1:
        if len(w) - 2 >= p1 and w[-2:] in _FI_LONGSET and len(w) > p1:
            w = w[:-1]
        if (len(w) - 1 > p1 and len(w) > p1 and w[-1] in _T.FI_AEI
                and w[-2] in _T.FI_C):
            w = w[:-1]
        if len(w) - 2 >= p1 and w[-1] == "j" and w[-2] in "ou":
            w = w[:-1]
        if len(w) - 2 >= p1 and w[-1] == "o" and w[-2] == "j":
            w = w[:-1]
        # undouble the rightmost consonant run's final char
        c = len(w)
        while c > 0 and w[c - 1] in _T.FI_V1:
            c -= 1
        if (c > 0 and w[c - 1] in _T.FI_C and c - 2 >= 0
                and w[c - 2] == w[c - 1]):
            w = w[: c - 1] + w[c:]
    return w


# =========================================================================
# Hungarian Snowball — the reference's DEFAULT hu chain
# (hu/HungarianAnalyzer.java chains SnowballFilter;
# ext/HungarianStemmer.java)
# =========================================================================

def _hu_r1(w: str) -> int:
    """Hungarian R1: vowel-start words mark after the first consonant
    cluster char — after the WHOLE digraph when it opens a listed double
    consonant (cs/dzs/gy/...); consonant-start words mark after the
    first vowel."""
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _T.HU_VOWELS:
        i = 0
        while i < n and w[i] in _T.HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for s, _ in _T.HU_DOUBLECONS_F:
            if w.startswith(s, i):
                return i + len(s)
        return i + 1
    i = 1
    while i < n and w[i] not in _T.HU_VOWELS:
        i += 1
    return i + 1 if i < n else n


def _hu_v_ending(w: str, p1: int) -> str:
    """á→a / é→e at the end, R1-gated."""
    if w and len(w) - 1 >= p1:
        if w[-1] == "á":
            return w[:-1] + "a"
        if w[-1] == "é":
            return w[:-1] + "e"
    return w


def hungarian_stem(word: str) -> str:
    """HungarianStemmer.stem(): instrum, case (+v_ending), case_special,
    case_other, factive, owned, sing_owner, plur_owner, plural — each a
    `do` at the current end. Amongs match UNRESTRICTED (longest suffix
    wins) with R1 as a post-check on bra; instrum/factive additionally
    require a doubled consonant before the suffix and undouble it."""
    w = word
    p1 = _hu_r1(word)

    def dbl_rule(table):
        # instrum / factive: R1 + double-consonant-before + del + undouble
        nonlocal w
        m = _find_b(w, 0, table)
        if m is None:
            return
        s, _ = m
        bra = len(w) - len(s)
        if bra < p1 or not _find_b_at(w, bra, 0, _T.HU_DOUBLE):
            return
        w = w[:bra]
        if len(w) >= 2:
            w = w[:-2] + w[-1]

    def sub_rule(table, actions):
        nonlocal w
        m = _find_b(w, 0, table)
        if m is None:
            return False
        s, code = m
        bra = len(w) - len(s)
        if bra < p1:
            return False
        w = w[:bra] + actions[code]
        return True

    dbl_rule(_T.HU_INSTRUM)
    if sub_rule(_T.HU_CASE, {-1: ""}):
        w = _hu_v_ending(w, p1)
    sub_rule(_T.HU_CASE_SPECIAL, {1: "e", 2: "a"})
    sub_rule(_T.HU_CASE_OTHER, {1: "", 2: "a", 3: "e"})
    dbl_rule(_T.HU_FACTIVE)
    sub_rule(_T.HU_OWNED, {1: "", 2: "e", 3: "a"})
    sub_rule(_T.HU_SING_OWNER, {1: "", 2: "a", 3: "e"})
    sub_rule(_T.HU_PLUR_OWNER, {1: "", 2: "a", 3: "e"})
    sub_rule(_T.HU_PLURAL, {1: "a", 2: "e", 3: ""})
    return w


# =========================================================================
# Spanish Snowball — factory-selectable variant
# (analysis/snowball/SnowballPorterFilterFactory; ext/SpanishStemmer.java;
# the DEFAULT es chain stays the UniNE light stemmer, as in
# es/SpanishAnalyzer.java)
# =========================================================================

_ES_POSTLUDE = str.maketrans("áéíóú", "aeiou")   # ü is KEPT (a_0)


def spanish_snowball_stem(word: str) -> str:
    """SpanishStemmer.stem(): attached pronoun (a_1 after a gerund/
    infinitive marker a_2, RV-gated), then standard suffix | y-verb |
    verb suffix, residual suffix, and the de-accenting postlude."""
    w = word
    pV = _rv_es(w, _T.ES_VOWELS)
    p1, p2 = _r1_r2(w, _T.ES_VOWELS)

    # attached_pronoun
    m = _find_b(w, 0, _T.ES_PRONOUN)
    if m:
        pron = m[0]
        c = len(w) - len(pron)
        m2 = _find_b_at(w, c, 0, _T.ES_PRE_PRONOUN)
        if m2:
            s2, code = m2
            start = c - len(s2)
            if start >= pV:
                if code <= 5:      # accented marker: replace both parts
                    w = w[:start] + {1: "iendo", 2: "ando", 3: "ar",
                                     4: "er", 5: "ir"}[code]
                elif code == 6:    # plain marker: drop the pronoun only
                    w = w[:c]
                elif start >= 1 and w[start - 1] == "u":  # 7: [u]yendo
                    w = w[:c]

    def opt_del(w2, sufs, gate_p2=True):
        """Optional follow-up: delete a further suffix if present and in
        R2 (the lab0/'try' blocks after the main delete)."""
        m3 = _find_b(w2, 0, sufs)
        if m3 and len(w2) - len(m3[0]) >= p2:
            return w2[: len(w2) - len(m3[0])]
        return w2

    # standard_suffix | y_verb_suffix | verb_suffix
    done = False
    m = _find_b(w, 0, _T.ES_STANDARD)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if code == 1 and bra >= p2:
            w = w[:bra]
            done = True
        elif code == 2 and bra >= p2:
            w = opt_del(w[:bra], (("ic", -1),))
            done = True
        elif code == 3 and bra >= p2:
            w = w[:bra] + "log"
            done = True
        elif code == 4 and bra >= p2:
            w = w[:bra] + "u"
            done = True
        elif code == 5 and bra >= p2:
            w = w[:bra] + "ente"
            done = True
        elif code == 6 and bra >= p1:
            w2 = w[:bra]
            m3 = _find_b(w2, 0, _T.ES_SUB6)
            if m3 and len(w2) - len(m3[0]) >= p2:
                s3, c3 = m3
                w2 = w2[: len(w2) - len(s3)]
                if c3 == 1:               # iv → optional at
                    w2 = opt_del(w2, (("at", -1),))
            w = w2
            done = True
        elif code == 7 and bra >= p2:
            w = opt_del(w[:bra], _T.ES_SUB7)
            done = True
        elif code == 8 and bra >= p2:
            w = opt_del(w[:bra], _T.ES_SUB8)
            done = True
        elif code == 9 and bra >= p2:
            w = opt_del(w[:bra], (("at", -1),))
            done = True
    if not done and len(w) >= pV:
        m = _find_b(w, pV, _T.ES_Y_VERB)
        if m and len(w) - len(m[0]) - 1 >= 0 \
                and w[len(w) - len(m[0]) - 1] == "u":
            w = w[: len(w) - len(m[0])]
            done = True
    if not done and len(w) >= pV:
        m = _find_b(w, pV, _T.ES_VERB)
        if m:
            s, code = m
            bra = len(w) - len(s)
            if code == 1 and bra >= 2 and w[bra - 1] == "u" \
                    and w[bra - 2] == "g":
                bra -= 1
            w = w[:bra]

    # residual_suffix
    m = _find_b(w, 0, _T.ES_RESIDUAL)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if bra >= pV:
            w = w[:bra]
            if code == 2 and w.endswith("gu") and len(w) - 1 >= pV:
                w = w[:-1]
    return w.translate(_ES_POSTLUDE)


# =========================================================================
# Portuguese Snowball — factory-selectable variant
# (ext/PortugueseStemmer.java; the DEFAULT pt chain stays the UniNE
# light stemmer per pt/PortugueseAnalyzer.java, with RSLP also available)
# =========================================================================

def portuguese_snowball_stem(word: str) -> str:
    """PortugueseStemmer.stem(): ã/õ→a~/o~ prelude; (standard|verb
    suffix + optional c[i] drop) | residual suffix; residual form;
    reverse postlude."""
    w = word.replace("ã", "a~").replace("õ", "o~")
    pV = _rv_es(w, _T.PT_VOWELS)
    p1, p2 = _r1_r2(w, _T.PT_VOWELS)

    def opt_del(w2, sufs):
        m3 = _find_b(w2, 0, sufs)
        if m3 and len(w2) - len(m3[0]) >= p2:
            return w2[: len(w2) - len(m3[0])], m3[1]
        return w2, None

    changed = False
    m = _find_b(w, 0, _T.PT_STANDARD)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if code == 1 and bra >= p2:
            w = w[:bra]
            changed = True
        elif code == 2 and bra >= p2:
            w = w[:bra] + "log"
            changed = True
        elif code == 3 and bra >= p2:
            w = w[:bra] + "u"
            changed = True
        elif code == 4 and bra >= p2:
            w = w[:bra] + "ente"
            changed = True
        elif code == 5 and bra >= p1:
            w2, c3 = opt_del(w[:bra], _T.PT_SUB_IC)
            if c3 == 1:                    # iv → optional at
                w2, _c = opt_del(w2, (("at", -1),))
            w = w2
            changed = True
        elif code == 6 and bra >= p2:
            w, _c = opt_del(w[:bra], _T.PT_SUB_LOG)
            changed = True
        elif code == 7 and bra >= p2:
            w, _c = opt_del(w[:bra], _T.PT_SUB_UC)
            changed = True
        elif code == 8 and bra >= p2:
            w, _c = opt_del(w[:bra], (("at", -1),))
            changed = True
        elif code == 9 and bra >= pV and bra >= 1 and w[bra - 1] == "e":
            w = w[:bra] + "ir"
            changed = True
    if not changed and len(w) >= pV:
        m = _find_b(w, pV, _T.PT_VERB)
        if m:
            w = w[: len(w) - len(m[0])]
            changed = True
    if changed:
        # trailing i after c, inside RV
        if (w.endswith("ci") and len(w) - 1 >= pV):
            w = w[:-1]
    else:
        m = _find_b(w, 0, _T.PT_RESIDUAL)
        if m and len(w) - len(m[0]) >= pV:
            w = w[: len(w) - len(m[0])]

    # residual_form
    m = _find_b(w, 0, _T.PT_RESID2)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if code == 2:
            w = w[:bra] + "c"
        elif bra >= pV:
            # the e/é/ê delete applies once RV passes; the gu→g / ci→c
            # follow-up drop is additionally RV-gated at the dropped char
            w = w[:bra]
            if ((w.endswith("gu") or w.endswith("ci"))
                    and len(w) - 1 >= pV):
                w = w[:-1]
    return w.replace("a~", "ã").replace("o~", "õ")


# =========================================================================
# Italian Snowball — factory-selectable variant
# (ext/ItalianStemmer.java; the DEFAULT it chain stays the UniNE light
# stemmer per it/ItalianAnalyzer.java)
# =========================================================================

_IT_ACCENTS = str.maketrans("áéíóú", "àèìòù")


def italian_snowball_stem(word: str) -> str:
    """ItalianStemmer.stem(): prelude (acute→grave, qu→qU, u/i between
    vowels uppercased), attached pronoun, standard|verb suffix, vowel
    suffix, postlude (U/I lowered)."""
    w = _de_mark_uv(word.translate(_IT_ACCENTS).replace("qu", "qU"),
                    _T.IT_VOWELS, letters="ui")
    pV = _rv_es(w, _T.IT_VOWELS)
    p1, p2 = _r1_r2(w, _T.IT_VOWELS)

    # attached_pronoun: pronoun preceded by ando/endo (del) or
    # ar/er/ir (→e), RV-gated at the marker start
    m = _find_b(w, 0, _T.IT_PRONOUN)
    if m:
        c = len(w) - len(m[0])
        m2 = _find_b_at(w, c, 0, _T.IT_PRE_PRONOUN)
        if m2 and c - len(m2[0]) >= pV:
            w = w[:c] if m2[1] == 1 else w[:c] + "e"

    def opt_del(w2, sufs):
        m3 = _find_b(w2, 0, sufs)
        if m3 and len(w2) - len(m3[0]) >= p2:
            return w2[: len(w2) - len(m3[0])], m3[1]
        return w2, None

    done = False
    m = _find_b(w, 0, _T.IT_STANDARD)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if code == 1 and bra >= p2:
            w = w[:bra]
            done = True
        elif code == 2 and bra >= p2:
            w, _c = opt_del(w[:bra], (("ic", -1),))
            done = True
        elif code == 3 and bra >= p2:
            w = w[:bra] + "log"
            done = True
        elif code == 4 and bra >= p2:
            w = w[:bra] + "u"
            done = True
        elif code == 5 and bra >= p2:
            w = w[:bra] + "ente"
            done = True
        elif code == 6 and bra >= pV:
            w = w[:bra]
            done = True
        elif code == 7 and bra >= p1:
            w2, c3 = opt_del(w[:bra], _T.IT_SUB_ABIL)
            if c3 == 1:
                w2, _c = opt_del(w2, (("at", -1),))
            w = w2
            done = True
        elif code == 8 and bra >= p2:
            w, _c = opt_del(w[:bra], _T.IT_SUB_OS)
            done = True
        elif code == 9 and bra >= p2:
            w2, c3 = opt_del(w[:bra], (("at", -1),))
            if c3 is not None:
                w2, _c = opt_del(w2, (("ic", -1),))
            w = w2
            done = True
    if not done and len(w) >= pV:
        m = _find_b(w, pV, _T.IT_VERB)
        if m:
            w = w[: len(w) - len(m[0])]

    # vowel_suffix: final a/e/i/o/à/è/ì/ò in RV (then a further i in RV);
    # then ch/gh → c/g in RV
    if w and w[-1] in _T.IT_AEIO and len(w) - 1 >= pV:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= pV:
            w = w[:-1]
    if (len(w) >= 2 and w[-1] == "h" and w[-2] in _T.IT_CG
            and len(w) - 2 >= pV):       # RV checked at the c/g position
        w = w[:-1]
    return w.replace("I", "i").replace("U", "u")


# =========================================================================
# German Snowball — factory-selectable variant
# (ext/GermanStemmer.java; the DEFAULT de chain stays the UniNE light
# stemmer + normalization per de/GermanAnalyzer.java)
# =========================================================================

_DE_POSTLUDE = str.maketrans("YUäöü", "yuaou")


def _de_mark_uv(w: str, vowels, letters: str = "uy") -> str:
    """`letters` between two vowels get uppercased so later suffix rules
    skip them — u/y for German, u/i for Italian."""
    ch = list(w)
    for i in range(len(ch) - 2):
        if (ch[i] in vowels and ch[i + 1] in letters
                and ch[i + 2] in vowels):
            ch[i + 1] = ch[i + 1].upper()
    return "".join(ch)


def _de_suffix_passes(w: str, p1: int, p2: int, step1, step2, step3,
                      step3_gu, s_end, st_end) -> str:
    """The three German suffix passes, shared verbatim by GermanStemmer
    and German2Stemmer (their tables are identical; only the preludes
    differ)."""
    # pass 1: noun endings, R1
    m = _find_b(w, 0, step1)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if bra >= p1:
            if code == 1:
                w = w[:bra]
            elif code == 2:
                w = w[:bra]
                if w.endswith("niss"):     # geheimniss → geheimnis
                    w = w[:-1]
            elif bra >= 1 and w[bra - 1] in s_end:
                w = w[:bra]

    # pass 2: verb endings, R1
    m = _find_b(w, 0, step2)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if bra >= p1:
            if code == 1:
                w = w[:bra]
            elif (bra >= 4 and w[bra - 1] in st_end):
                # st: needs >=3 chars before the st_ending consonant
                w = w[:bra]

    # pass 3: derivational endings, R2
    m = _find_b(w, 0, step3)
    if m:
        s, code = m
        bra = len(w) - len(s)
        if bra >= p2:
            if code == 1:                  # end/ung (+optional ig)
                w = w[:bra]
                if (w.endswith("ig") and len(w) - 2 >= p2
                        and not w[:-2].endswith("e")):
                    w = w[:-2]
            elif code == 2:                # ig/ik/isch, not after e
                if not (bra >= 1 and w[bra - 1] == "e"):
                    w = w[:bra]
            elif code == 3:                # lich/heit (+optional er/en R1)
                w = w[:bra]
                for t in ("er", "en"):
                    if w.endswith(t) and len(w) - 2 >= p1:
                        w = w[:-2]
                        break
            else:                          # 4: keit (+optional lich/ig R2)
                w = w[:bra]
                m2 = _find_b(w, p2, step3_gu)
                if m2:
                    w = w[: len(w) - len(m2[0])]
    return w


def german_snowball_stem(word: str) -> str:
    """GermanStemmer.stem(): ß→ss prelude + u/y marking; three
    independent suffix passes (R1 noun endings with the niss cleanup,
    R1 verb endings with the st guard, R2 derivational endings with
    ig/lich follow-ups); postlude lowers marks and folds umlauts."""
    w = _de_mark_uv(word.replace("ß", "ss"), _T.DE_VOWELS)
    n = len(w)
    if n < 3:
        p1 = p2 = n
    else:
        p1, p2 = _r1_r2(w, _T.DE_VOWELS)
        p1 = max(p1, 3)

    w = _de_suffix_passes(w, p1, p2, _T.DE_STEP1, _T.DE_STEP2,
                          _T.DE_STEP3, _T.DE_STEP3_GU, _T.DE_S_END,
                          _T.DE_ST_END)
    return w.translate(_DE_POSTLUDE)


def german2_snowball_stem(word: str) -> str:
    """German2Stemmer.stem(): like german but the prelude folds
    ae/oe/ue → ä/ö/ü (after u/y marking, with "qu" skipping the next
    two chars so 'ue' after q survives) and ß→ss in the same scan; the
    suffix passes are identical to GermanStemmer."""
    w = _de_mark_uv(word, _T.DE2_VOWELS)
    out = []
    i, n = 0, len(w)
    while i < n:
        if w[i] == "ß":
            out.append("ss")
            i += 1
        elif w.startswith("ae", i):
            out.append("ä")
            i += 2
        elif w.startswith("oe", i):
            out.append("ö")
            i += 2
        elif w.startswith("ue", i):
            out.append("ü")
            i += 2
        elif w.startswith("qu", i):
            if n - (i + 2) < 2:            # hop 2 past end: scan stops
                out.append(w[i:])
                break
            out.append(w[i: i + 4])
            i += 4
        else:
            out.append(w[i])
            i += 1
    w = "".join(out)
    n = len(w)
    if n < 3:
        p1 = p2 = n
    else:
        p1, p2 = _r1_r2(w, _T.DE2_VOWELS)
        p1 = max(p1, 3)

    w = _de_suffix_passes(w, p1, p2, _T.DE2_STEP1, _T.DE2_STEP2,
                          _T.DE2_STEP3, _T.DE2_STEP3_GU, _T.DE2_S_END,
                          _T.DE2_ST_END)
    return w.translate(_DE_POSTLUDE)


# =========================================================================
# French Snowball — factory-selectable variant
# (ext/FrenchStemmer.java; the DEFAULT fr chain stays the UniNE light
# stemmer per fr/FrenchAnalyzer.java)
# =========================================================================

def _fr_prelude(word: str) -> str:
    ch = list(word)
    V = _T.FR_VOWELS
    i = 0
    while i < len(ch):
        c = ch[i]
        n1 = ch[i + 1] if i + 1 < len(ch) else ""
        n2 = ch[i + 2] if i + 2 < len(ch) else ""
        if c in V and n1 == "u" and n2 in V:
            ch[i + 1] = "U"
        elif c in V and n1 == "i" and n2 in V:
            ch[i + 1] = "I"
        elif c in V and n1 == "y":
            ch[i + 1] = "Y"
        elif c == "ë":
            ch[i: i + 1] = ["H", "e"]
        elif c == "ï":
            ch[i: i + 1] = ["H", "i"]
        elif c == "y" and n1 in V:
            ch[i] = "Y"
        elif c == "q" and n1 == "u":
            ch[i + 1] = "U"
        else:
            i += 1
    return "".join(ch)


def _fr_postlude(w: str) -> str:
    out = []
    i = 0
    while i < len(w):
        if w.startswith("He", i):
            out.append("ë")
            i += 2
        elif w.startswith("Hi", i):
            out.append("ï")
            i += 2
        elif w[i] == "H":
            i += 1
        elif w[i] == "I":
            out.append("i")
            i += 1
        elif w[i] == "U":
            out.append("u")
            i += 1
        elif w[i] == "Y":
            out.append("y")
            i += 1
        else:
            out.append(w[i])
            i += 1
    return "".join(out)


def _fr_rv(w: str) -> int:
    """French RV: position after the 2nd char when the word starts with
    two vowels; after 'par'/'col'/'tap'; else after the first vowel
    found from position 1."""
    n = len(w)
    V = _T.FR_VOWELS
    if n >= 3 and w[0] in V and w[1] in V:
        return 3
    for s, _ in _T.FR_A0:
        if w.startswith(s):
            return len(s)
    i = 1
    while i < n and w[i] not in V:
        i += 1
    return i + 1 if i < n else n


def french_snowball_stem(word: str) -> str:
    """FrenchStemmer.stem(). Cases 13-15 of the standard table slice and
    then 'fail', letting the verb-suffix rules continue on the modified
    word — modeled with the three-way status below."""
    w = _fr_prelude(word)
    V = _T.FR_VOWELS
    pV = _fr_rv(w)
    p1, p2 = _r1_r2(w, V)

    def r2(bra):
        return bra >= p2

    def std():
        """Returns 'ok' | 'fail' (possibly after slicing)."""
        nonlocal w
        m = _find_b(w, 0, _T.FR_A4)
        if m is None:
            return "fail"
        s, code = m
        bra = len(w) - len(s)
        if code == 1:
            if not r2(bra):
                return "fail"
            w = w[:bra]
        elif code == 2:
            if not r2(bra):
                return "fail"
            w = w[:bra]
            if w.endswith("ic"):
                w = w[:-2] if r2(len(w) - 2) else w[:-2] + "iqU"
        elif code == 3:
            if not r2(bra):
                return "fail"
            w = w[:bra] + "log"
        elif code == 4:
            if not r2(bra):
                return "fail"
            w = w[:bra] + "u"
        elif code == 5:
            if not r2(bra):
                return "fail"
            w = w[:bra] + "ent"
        elif code == 6:
            if bra < pV:
                return "fail"
            w = w[:bra]
            m2 = _find_b(w, 0, _T.FR_A2)
            if m2:
                s2, c2 = m2
                b2 = len(w) - len(s2)
                if c2 == 1 and r2(b2):        # iv (+ optional at)
                    w = w[:b2]
                    if w.endswith("at") and r2(len(w) - 2):
                        w = w[:-2]
                elif c2 == 2:                 # eus
                    if r2(b2):
                        w = w[:b2]
                    elif b2 >= p1:
                        w = w[:b2] + "eux"
                elif c2 == 3 and r2(b2):      # abl/iqU
                    w = w[:b2]
                elif c2 == 4 and b2 >= pV:    # ièr/Ièr
                    w = w[:b2] + "i"
        elif code == 7:
            if not r2(bra):
                return "fail"
            w = w[:bra]
            m2 = _find_b(w, 0, _T.FR_A3)
            if m2:
                s2, c2 = m2
                b2 = len(w) - len(s2)
                if c2 == 1:                   # abil
                    w = w[:b2] if r2(b2) else w[:b2] + "abl"
                elif c2 == 2:                 # ic
                    w = w[:b2] if r2(b2) else w[:b2] + "iqU"
                elif r2(b2):                  # iv
                    w = w[:b2]
        elif code == 8:
            if not r2(bra):
                return "fail"
            w = w[:bra]
            if w.endswith("at") and r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("ic"):
                    w = w[:-2] if r2(len(w) - 2) else w[:-2] + "iqU"
        elif code == 9:
            w = w[:bra] + "eau"
        elif code == 10:
            if bra < p1:
                return "fail"
            w = w[:bra] + "al"
        elif code == 11:
            if r2(bra):
                w = w[:bra]
            elif bra >= p1:
                w = w[:bra] + "eux"
            else:
                return "fail"
        elif code == 12:
            if bra < p1 or bra < 1 or w[bra - 1] in V:
                return "fail"
            w = w[:bra]
        elif code == 13:
            if bra < pV:
                return "fail"
            w = w[:bra] + "ant"
            return "fail"                     # continue with verb rules
        elif code == 14:
            if bra < pV:
                return "fail"
            w = w[:bra] + "ent"
            return "fail"
        else:                                 # 15: ment(s) after RV vowel
            if not (bra >= 1 and w[bra - 1] in V and bra - 1 >= pV):
                return "fail"
            w = w[:bra]
            return "fail"
        return "ok"

    applied = std() == "ok"
    if not applied and len(w) >= pV:
        m = _find_b(w, pV, _T.FR_A5)
        if m:
            bra = len(w) - len(m[0])
            if (not (bra - 1 >= pV and w[bra - 1] == "H")
                    and bra > pV and w[bra - 1] not in V):
                w = w[:bra]
                applied = True
    if not applied and len(w) >= pV:
        m = _find_b(w, pV, _T.FR_A6)
        if m:
            s, code = m
            bra = len(w) - len(s)
            if code == 1:
                if r2(bra):
                    w = w[:bra]
                    applied = True
            elif code == 2:
                w = w[:bra]
                applied = True
            else:
                w = w[:bra]
                if len(w) - 1 >= pV and w.endswith("e"):
                    w = w[:-1]
                applied = True
    if applied:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # residual: optional s-drop, then ion/ier/e within RV
        if w.endswith("s"):
            e = len(w) - 1
            if (w[max(0, e - 2):e] == "Hi"
                    or (e >= 1 and w[e - 1] not in _T.FR_KEEP_S)):
                w = w[:e]
        if len(w) >= pV:
            m = _find_b(w, pV, _T.FR_A7)
            if m:
                s, code = m
                bra = len(w) - len(s)
                if code == 1:
                    if (r2(bra) and bra - 1 >= pV
                            and w[bra - 1] in "st"):
                        w = w[:bra]
                elif code == 2:
                    w = w[:bra] + "i"
                else:
                    w = w[:bra]

    if _find_b(w, 0, _T.FR_A8):              # un_double: enn/onn/ett/...
        w = w[:-1]
    # un_accent: é/è before a trailing non-vowel run → e
    j = len(w)
    while j > 0 and w[j - 1] not in V:
        j -= 1
    if j < len(w) and j > 0 and w[j - 1] in "éè":
        w = w[: j - 1] + "e" + w[j:]
    return _fr_postlude(w)


# =========================================================================
# Lovins (English, 1968) — factory-selectable variant
# (ext/LovinsStemmer.java; SnowballPorterFilterFactory language "Lovins")
# =========================================================================

def _lov_conds():
    """Lovins context conditions, each evaluated at the removal point
    bra against the stem w[:bra] (lb is always 0 for Lovins)."""
    def A(w, b, lb): return b >= 2
    def B(w, b, lb): return b >= 3
    def C(w, b, lb): return b >= 4
    def D(w, b, lb): return b >= 5
    def E(w, b, lb): return b >= 2 and w[b - 1] != "e"
    def F(w, b, lb): return b >= 3 and w[b - 1] != "e"
    def G(w, b, lb): return b >= 3 and w[b - 1] == "f"
    def H(w, b, lb):
        return b >= 2 and (w[b - 1] == "t" or w[b - 2: b] == "ll")
    def I(w, b, lb): return b >= 2 and w[b - 1] not in "oe"
    def J(w, b, lb): return b >= 2 and w[b - 1] not in "ae"
    def K(w, b, lb):
        return b >= 3 and (w[b - 1] in "li"
                           or (w[b - 1] == "e" and w[b - 3] == "u"))
    def L(w, b, lb):
        if b < 2 or w[b - 1] in "ux":
            return False
        return w[b - 1] != "s" or w[b - 2] == "o"
    def M(w, b, lb): return b >= 2 and w[b - 1] not in "acem"
    def N(w, b, lb):
        return b >= 3 and (w[b - 3] != "s" or b >= 4)
    def O(w, b, lb): return b >= 2 and w[b - 1] in "li"
    def P(w, b, lb): return b >= 2 and w[b - 1] != "c"
    def Q(w, b, lb): return b >= 3 and w[b - 1] not in "ln"
    def R(w, b, lb): return b >= 2 and w[b - 1] in "nr"
    def S(w, b, lb):
        return b >= 2 and (w[b - 2: b] == "dr"
                           or (w[b - 1] == "t" and w[b - 2: b] != "tt"))
    def T(w, b, lb):
        return b >= 2 and (w[b - 1] == "s"
                           or (w[b - 1] == "t" and w[b - 2: b] != "ot"))
    def U(w, b, lb): return b >= 2 and w[b - 1] in "lmnr"
    def V(w, b, lb): return b >= 2 and w[b - 1] == "c"
    def W(w, b, lb): return b >= 2 and w[b - 1] not in "su"
    def X(w, b, lb):
        return b >= 2 and (w[b - 1] in "li"
                           or (b >= 3 and w[b - 1] == "e"
                               and w[b - 3] == "u"))
    def Y(w, b, lb): return b >= 2 and w[b - 2: b] == "in"
    def Z(w, b, lb): return b >= 2 and w[b - 1] != "f"
    def AA(w, b, lb):
        return b >= 2 and _find_b_at(w, b, 0, _T.LOV_AA) is not None
    def BB(w, b, lb):
        return (b >= 3 and not w[:b].endswith("met")
                and not w[:b].endswith("ryst"))
    def CC(w, b, lb): return b >= 2 and w[b - 1] == "l"
    return {f"r_{f.__name__}": f for f in (
        A, B, C, D, E, F, G, H, I, J, K, L, M, N, O, P, Q, R, S, T, U,
        V, W, X, Y, Z, AA, BB, CC)}


_LOV_CONDS = _lov_conds()

_LOV_RESPELL_FROM = {
    1: "ief", 2: "uc", 3: "um", 4: "rb", 5: "ur", 6: "ister",
    7: "meter", 8: "olut", 9: "l", 10: "bic", 11: "dic", 12: "pic",
    13: "tic", 14: "ac", 15: "ec", 16: "ic", 17: "luc", 18: "uas",
    19: "vas", 20: "cis", 21: "lis", 22: "eris", 23: "pans", 24: "ens",
    25: "ons", 26: "lus", 27: "rus", 28: "hes", 29: "mis", 30: "ens",
    31: "ers", 32: "es", 33: "ys",
}
# respell codes whose rule fails when the match is preceded by one of
# these chars (eq_s_b guards before the slice_from)
_LOV_RESPELL_NOT_AFTER = {9: "aio", 24: "s", 28: "pt", 30: "m", 32: "n"}


def lovins_stem(word: str) -> str:
    """LovinsStemmer.stem(): longest-match ending removal under the 29
    context conditions (with find_among_b's substring-chain fallback on
    condition failure), consonant undoubling, and the 33 respell rules."""
    w = word
    m = _find_b_cond(w, 0, _T.LOV_ENDINGS, _LOV_CONDS)
    if m:
        w = w[: len(w) - len(m[0])]
    if len(w) >= 2 and _find_b(w, 0, _T.LOV_DOUBLE):
        w = w[:-1]
    m = _find_b(w, 0, _T.LOV_RESPELL)
    if m:
        s, code = m
        bra = len(w) - len(s)
        guard = _LOV_RESPELL_NOT_AFTER.get(code)
        if not (guard and bra >= 1 and w[bra - 1] in guard):
            w = w[:bra] + _LOV_RESPELL_FROM[code]
    return w


# =========================================================================
# Kraaij-Pohlmann (Dutch, 1994) — factory-selectable variant
# (ext/KpStemmer.java; SnowballPorterFilterFactory language "Kp").
# Implemented over a small cursor/slice runtime (_KpRun) that mirrors
# SnowballProgram's backward-mode semantics exactly, because KP's rules
# re-measure regions mid-run and insert characters at the cursor.
# =========================================================================

class _KpRun:
    __slots__ = ("w", "c", "lb", "bra", "ket", "p1", "p2",
                 "ge_removed", "stemmed", "y_found", "s_ch")

    def __init__(self, word: str):
        self.w = word
        self.c = 0
        self.lb = 0
        self.bra = self.ket = 0
        self.p1 = self.p2 = len(word)
        self.ge_removed = self.stemmed = self.y_found = False
        self.s_ch = ""

    # --- forward primitives ---
    def eq_s(self, s):
        if self.w.startswith(s, self.c) and self.c + len(s) <= len(self.w):
            self.c += len(s)
            return True
        return False

    def in_g(self, grp):
        if self.c < len(self.w) and self.w[self.c] in grp:
            self.c += 1
            return True
        return False

    def out_g(self, grp):
        if self.c < len(self.w) and self.w[self.c] not in grp:
            self.c += 1
            return True
        return False

    # --- backward primitives ---
    def eq_s_b(self, s):
        if self.c - len(s) >= self.lb and self.w.startswith(
                s, self.c - len(s)):
            self.c -= len(s)
            return True
        return False

    def in_g_b(self, grp):
        if self.c > self.lb and self.w[self.c - 1] in grp:
            self.c -= 1
            return True
        return False

    def out_g_b(self, grp):
        if self.c > self.lb and self.w[self.c - 1] not in grp:
            self.c -= 1
            return True
        return False

    def find_b(self, table):
        for s, code in table:
            if self.c - len(s) >= self.lb and self.w.startswith(
                    s, self.c - len(s)):
                self.c -= len(s)
                return code
        return 0

    # --- slicing (replace_s cursor-adjust semantics) ---
    def _replace(self, b, k, rep):
        adj = len(rep) - (k - b)
        self.w = self.w[:b] + rep + self.w[k:]
        if self.c >= k:
            self.c += adj
        elif self.c > b:
            self.c = b

    def sl_del(self):
        self._replace(self.bra, self.ket, "")

    def sl_from(self, rep):
        self._replace(self.bra, self.ket, rep)

    def insert(self, pos, s):
        self._replace(pos, pos, s)


def _kp_R1(r):
    return r.p1 <= r.c


def _kp_R2(r):
    return r.p2 <= r.c


def _kp_V(r):
    v = r.c
    ok = r.in_g_b(_T.KP_V) or (r.c == v and r.eq_s_b("ij"))
    r.c = v
    return ok


def _kp_VX(r):
    v = r.c
    if r.c <= r.lb:
        return False
    r.c -= 1
    ok = r.in_g_b(_T.KP_V) or r.eq_s_b("ij")
    r.c = v
    return ok


def _kp_C(r):
    v = r.c
    if r.eq_s_b("ij"):
        r.c = v
        return False
    ok = r.out_g_b(_T.KP_V)
    r.c = v
    return ok


def _kp_lengthen_V(r):
    """Double a short a/o/u/e before a final non-(vowel|w|x) consonant."""
    v1 = len(r.w) - r.c
    while True:                                 # lab0 as a breakable block
        if not r.out_g_b(_T.KP_V_WX):
            break
        r.ket = r.c
        v2 = len(r.w) - r.c
        if r.in_g_b(_T.KP_AOU):
            r.bra = r.c
            v3 = len(r.w) - r.c
            if not (r.out_g_b(_T.KP_V) or r.c <= r.lb):
                break
            r.c = len(r.w) - v3
        else:
            r.c = len(r.w) - v2
            if not r.eq_s_b("e"):
                break
            r.bra = r.c
            v5 = len(r.w) - r.c
            v6 = len(r.w) - r.c
            if not r.out_g_b(_T.KP_V):
                r.c = len(r.w) - v6
                if r.c > r.lb:
                    break
            v7 = len(r.w) - r.c
            if r.in_g_b(_T.KP_AIOU):
                break
            r.c = len(r.w) - v7
            v8 = len(r.w) - r.c
            hit = False
            if r.c > r.lb:
                r.c -= 1
                if r.in_g_b(_T.KP_AIOU) and r.out_g_b(_T.KP_V):
                    hit = True
            if hit:
                break
            r.c = len(r.w) - v8
            r.c = len(r.w) - v5
        r.s_ch = r.w[r.bra: r.ket]
        c = r.c
        r.insert(r.c, r.s_ch)
        r.c = c
        break
    r.c = len(r.w) - v1
    return True


def _kp_step1(r):
    r.ket = r.c
    code = r.find_b(_T.KP_STEP1)
    if code == 0:
        return False
    r.bra = r.c
    if code == 1:
        r.sl_del()
    elif code == 2:                             # s
        if not _kp_R1(r):
            return False
        v = len(r.w) - r.c
        if r.eq_s_b("t") and _kp_R1(r):
            return False
        r.c = len(r.w) - v
        if not _kp_C(r):
            return False
        r.sl_del()
    elif code == 3:                             # ies → ie
        if not _kp_R1(r):
            return False
        r.sl_from("ie")
    elif code == 4:                             # es
        v = len(r.w) - r.c
        if (r.eq_s_b("ar") and _kp_R1(r) and _kp_C(r)):
            r.bra = r.c
            r.sl_del()
            _kp_lengthen_V(r)
        else:
            r.c = len(r.w) - v
            if r.eq_s_b("er") and _kp_R1(r) and _kp_C(r):
                r.bra = r.c
                r.sl_del()
            else:
                r.c = len(r.w) - v
                if not (_kp_R1(r) and _kp_C(r)):
                    return False
                r.sl_from("e")
    elif code == 5:                             # aus → au
        if not (_kp_R1(r) and _kp_V(r)):
            return False
        r.sl_from("au")
    elif code == 6:                             # en
        v = len(r.w) - r.c
        if r.eq_s_b("hed") and _kp_R1(r):
            r.bra = r.c
            r.sl_from("heid")
        else:
            r.c = len(r.w) - v
            if r.eq_s_b("nd"):
                r.sl_del()
            else:
                r.c = len(r.w) - v
                if r.eq_s_b("d") and _kp_R1(r) and _kp_C(r):
                    r.bra = r.c
                    r.sl_del()
                else:
                    r.c = len(r.w) - v
                    matched = False
                    if r.eq_s_b("i") or r.eq_s_b("j"):
                        if _kp_V(r):
                            r.sl_del()
                            matched = True
                        else:
                            r.c = len(r.w) - v
                    if not matched:
                        r.c = len(r.w) - v
                        if not (_kp_R1(r) and _kp_C(r)):
                            return False
                        r.sl_del()
                        _kp_lengthen_V(r)
    else:                                       # 7: nde → nd
        r.sl_from("nd")
    return True


def _kp_step2(r):
    r.ket = r.c
    code = r.find_b(_T.KP_STEP2)
    if code == 0:
        return False
    r.bra = r.c
    if code == 1:                               # je: alternative chain,
        v = len(r.w) - r.c                      # each restoring on failure
        if r.eq_s_b("'t"):
            r.bra = r.c
            r.sl_del()
            return True
        r.c = len(r.w) - v
        if r.eq_s_b("et"):
            r.bra = r.c
            if _kp_R1(r) and _kp_C(r):
                r.sl_del()
                return True
        r.c = len(r.w) - v
        if r.eq_s_b("rnt"):
            r.bra = r.c
            r.sl_from("rn")
            return True
        r.c = len(r.w) - v
        if r.eq_s_b("t"):
            r.bra = r.c
            if _kp_R1(r) and _kp_VX(r):
                r.sl_del()
                return True
        r.c = len(r.w) - v
        if r.eq_s_b("ink"):
            r.bra = r.c
            r.sl_from("ing")
            return True
        r.c = len(r.w) - v
        if r.eq_s_b("mp"):
            r.bra = r.c
            r.sl_from("m")
            return True
        r.c = len(r.w) - v
        if r.eq_s_b("'"):
            r.bra = r.c
            if _kp_R1(r):
                r.sl_del()
                return True
        r.c = len(r.w) - v
        r.bra = r.c
        if not (_kp_R1(r) and _kp_C(r)):
            return False
        r.sl_del()
    elif code == 2:
        if not _kp_R1(r):
            return False
        r.sl_from("g")
    elif code == 3:
        if not _kp_R1(r):
            return False
        r.sl_from("lijk")
    elif code == 4:
        if not _kp_R1(r):
            return False
        r.sl_from("isch")
    elif code == 5:
        if not (_kp_R1(r) and _kp_C(r)):
            return False
        r.sl_del()
    elif code == 6:
        if not _kp_R1(r):
            return False
        r.sl_from("t")
    elif code == 7:
        if not _kp_R1(r):
            return False
        r.sl_from("s")
    elif code == 8:
        if not _kp_R1(r):
            return False
        r.sl_from("r")
    elif code == 9:
        if not _kp_R1(r):
            return False
        r.sl_del()
        r.insert(r.c, "l")
        _kp_lengthen_V(r)
    elif code == 10:
        if not (_kp_R1(r) and _kp_C(r)):
            return False
        r.sl_del()
        r.insert(r.c, "en")
        _kp_lengthen_V(r)
    else:                                       # 11: ieve → ief
        if not (_kp_R1(r) and _kp_C(r)):
            return False
        r.sl_from("ief")
    return True


def _kp_step3(r):
    r.ket = r.c
    code = r.find_b(_T.KP_STEP3)
    if code == 0:
        return False
    r.bra = r.c
    if code == 1:
        if not _kp_R1(r):
            return False
        r.sl_from("eer")
    elif code == 2:
        if not _kp_R1(r):
            return False
        r.sl_del()
        _kp_lengthen_V(r)
    elif code == 3:
        if not _kp_R1(r):
            return False
        r.sl_del()
    elif code == 4:
        r.sl_from("r")
    elif code == 5:
        if not (_kp_R1(r) and _kp_C(r)):
            return False
        r.sl_from("aar")
    elif code == 6:
        if not _kp_R2(r):
            return False
        r.sl_del()
        r.insert(r.c, "f")
        _kp_lengthen_V(r)
    elif code == 7:
        if not _kp_R2(r):
            return False
        r.sl_del()
        r.insert(r.c, "g")
        _kp_lengthen_V(r)
    elif code == 8:
        if not (_kp_R1(r) and _kp_C(r)):
            return False
        r.sl_from("t")
    else:                                       # 9
        if not (_kp_R1(r) and _kp_C(r)):
            return False
        r.sl_from("d")
    return True


def _kp_step4(r):
    v = len(r.w) - r.c
    r.ket = r.c
    code = r.find_b(_T.KP_STEP4A)
    ok = False
    if code:
        r.bra = r.c
        if code == 1:
            ok = _kp_R1(r)
            if ok:
                r.sl_from("ie")
        elif code == 2:
            ok = _kp_R1(r)
            if ok:
                r.sl_from("eer")
        elif code == 3:
            ok = _kp_R1(r)
            if ok:
                r.sl_del()
        elif code == 4:
            ok = _kp_R1(r) and _kp_V(r)
            if ok:
                r.sl_from("n")
        elif code == 5:
            ok = _kp_R1(r) and _kp_V(r)
            if ok:
                r.sl_from("l")
        elif code == 6:
            ok = _kp_R1(r) and _kp_V(r)
            if ok:
                r.sl_from("r")
        elif code == 7:
            ok = _kp_R1(r)
            if ok:
                r.sl_from("teer")
        elif code == 8:
            ok = _kp_R1(r)
            if ok:
                r.sl_from("lijk")
        else:                                   # 9
            ok = _kp_R1(r) and _kp_C(r)
            if ok:
                r.sl_del()
                _kp_lengthen_V(r)
    if ok:
        return True
    # fallback: ig/iger/igst (R1, C) with lengthening
    r.c = len(r.w) - v
    r.ket = r.c
    if r.find_b(_T.KP_STEP4B) == 0:
        return False
    r.bra = r.c
    if not (_kp_R1(r) and _kp_C(r)):
        return False
    r.sl_del()
    _kp_lengthen_V(r)
    return True


def _kp_step7(r):
    r.ket = r.c
    code = r.find_b(_T.KP_STEP7)
    if code == 0:
        return False
    r.bra = r.c
    r.sl_from({1: "k", 2: "f", 3: "p"}[code])
    return True


_KP_STEP6_FROM = {1: "b", 2: "c", 3: "d", 4: "f", 5: "g", 6: "h",
                  7: "j", 8: "k", 9: "l", 10: "m", 11: "n", 12: "p",
                  13: "q", 14: "r", 15: "s", 16: "t", 17: "v", 18: "w",
                  19: "x", 20: "z"}


def _kp_step6(r):
    r.ket = r.c
    code = r.find_b(_T.KP_STEP6)
    if code == 0:
        return False
    r.bra = r.c
    r.sl_from(_KP_STEP6_FROM[code])
    return True


def _kp_step1c(r):
    r.ket = r.c
    code = r.find_b(_T.KP_STEP1C)
    if code == 0:
        return False
    r.bra = r.c
    if not (_kp_R1(r) and _kp_C(r)):
        return False
    guard = "n" if code == 1 else "h"
    v = len(r.w) - r.c
    if r.eq_s_b(guard) and _kp_R1(r):
        return False
    r.c = len(r.w) - v
    r.sl_del()
    return True


def _kp_lose_prefix(r):
    r.bra = r.c
    if not r.eq_s("ge"):
        return False
    r.ket = r.c
    v1 = r.c
    if r.c + 3 > len(r.w):
        return False
    # scan (without moving past) for a vowel, then a consonant
    i = r.c
    while i < len(r.w) and r.w[i] not in _T.KP_V:
        i += 1
    if i >= len(r.w):
        return False
    while i < len(r.w) and r.w[i] in _T.KP_V:
        i += 1
    if i >= len(r.w):
        return False
    r.c = v1
    r.ge_removed = True
    r.sl_del()
    return True


def _kp_lose_infix(r):
    if r.c >= len(r.w):
        return False
    r.c += 1
    while True:
        r.bra = r.c
        if r.eq_s("ge"):
            r.ket = r.c
            break
        if r.c >= len(r.w):
            return False
        r.c += 1
    if r.c + 3 > len(r.w):
        return False
    i = r.c
    while i < len(r.w) and r.w[i] not in _T.KP_V:
        i += 1
    if i >= len(r.w):
        return False
    while i < len(r.w) and r.w[i] in _T.KP_V:
        i += 1
    if i >= len(r.w):
        return False
    r.ge_removed = True
    r.sl_del()
    return True


def _kp_measure(r):
    """KP regions: like standard p1/p2 but 'ij' counts as one vowel and
    each region boundary needs a trailing consonant."""
    r.p1 = r.p2 = len(r.w)
    v1 = r.c
    r.c = 0
    ok = True
    while r.out_g(_T.KP_V):
        pass
    n = 0
    while True:
        v4 = r.c
        if r.eq_s("ij") or r.in_g(_T.KP_V):
            n += 1
            continue
        r.c = v4
        break
    if n < 1 or not r.out_g(_T.KP_V):
        r.c = v1
        return True
    r.p1 = r.c
    while r.out_g(_T.KP_V):
        pass
    n = 0
    while True:
        v8 = r.c
        if r.eq_s("ij") or r.in_g(_T.KP_V):
            n += 1
            continue
        r.c = v8
        break
    if n < 1 or not r.out_g(_T.KP_V):
        r.c = v1
        return True
    r.p2 = r.c
    r.c = v1
    return True


def kp_stem(word: str) -> str:
    """KpStemmer.stem(): y-marking, measure, steps 1-4, ge- prefix and
    -ge- infix removal (each re-measuring and gating step 1c), step 7
    consonant respell, step 6 undoubling when anything changed, and
    Y-restoration."""
    r = _KpRun(word)
    # mark y's: leading y and any y after a vowel → Y
    if r.w.startswith("y"):
        r.w = "Y" + r.w[1:]
        r.y_found = True
    ch = list(r.w)
    for i in range(1, len(ch)):
        if ch[i] == "y" and ch[i - 1] in _T.KP_V:
            ch[i] = "Y"
            r.y_found = True
    r.w = "".join(ch)

    _kp_measure(r)
    r.lb = 0
    r.c = len(r.w)
    for step in (_kp_step1, _kp_step2, _kp_step3, _kp_step4):
        v = len(r.w) - r.c
        if step(r):
            r.stemmed = True
        r.c = len(r.w) - v

    r.c = 0
    r.ge_removed = False
    if _kp_lose_prefix(r):
        r.c = 0
        _kp_measure(r)
    r.c = 0
    r.lb = 0
    r.c = len(r.w)
    if r.ge_removed:
        _kp_step1c(r)
    r.c = 0
    r.ge_removed = False
    if _kp_lose_infix(r):
        r.c = 0
        _kp_measure(r)
    r.c = 0
    r.lb = 0
    r.c = len(r.w)
    v = len(r.w) - r.c
    if r.ge_removed:
        _kp_step1c(r)
    r.c = len(r.w) - v
    r.c = 0
    r.lb = 0
    r.c = len(r.w)
    v = len(r.w) - r.c
    if _kp_step7(r):
        r.stemmed = True
    r.c = len(r.w) - v
    if r.stemmed or r.ge_removed:
        _kp_step6(r)
    if r.y_found:
        r.w = r.w.replace("Y", "y")
    return r.w

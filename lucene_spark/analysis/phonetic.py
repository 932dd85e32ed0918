"""Phonetic encoders — Soundex / Refined Soundex + ASCII folding.

Role analogue: lucene/analysis/phonetic/.../PhoneticFilter.java (which
delegates to Apache commons-codec encoders) and ASCIIFoldingFilter
(analysis/common/.../miscellaneous/ASCIIFoldingFilter.java). The
algorithms implemented here are the published ones (American Soundex as
specified by the US National Archives; commons-codec's RefinedSoundex
mapping), re-expressed in Python and validated against the classic
public test vectors in tests/test_analysis.py.

Analyzer integration: entries in stem.STEMMERS ("soundex",
"refined_soundex", "ascii_fold"), so a phonetic analyzer is just
`Analyzer(stemmer="soundex")` — one code per token, the
PhoneticFilter(inject=false) configuration. (inject=true's
original+code dual emission would double doclen; documented out of
scope for the BM25-norm contract.)
"""

from __future__ import annotations

import functools
import re
import unicodedata

# American Soundex digit map (commons-codec Soundex.US_ENGLISH_MAPPING):
# b f p v → 1; c g j k q s x z → 2; d t → 3; l → 4; m n → 5; r → 6;
# a e i o u y h w → not coded
_SOUNDEX_MAP = {}
for _chars, _d in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                   ("l", "4"), ("mn", "5"), ("r", "6")):
    for _c in _chars:
        _SOUNDEX_MAP[_c] = _d


@functools.lru_cache(maxsize=65536)
def soundex(word: str) -> str:
    """American Soundex, commons-codec semantics: letter + 3 digits,
    zero-padded; adjacent duplicates collapse; h/w are TRANSPARENT
    (consonants separated only by h or w code once — the US National
    Archives rule commons-codec implements); vowels break runs."""
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return ""
    out = [w[0].upper()]
    last = _SOUNDEX_MAP.get(w[0], "")
    for c in w[1:]:
        if c in "hw":
            continue          # transparent: do not reset `last`
        d = _SOUNDEX_MAP.get(c, "")
        if d and d != last:
            out.append(d)
            if len(out) == 4:
                break
        last = d              # vowels (d == "") reset the run
    return "".join(out) + "0" * (4 - len(out))


# commons-codec RefinedSoundex US_ENGLISH mapping string, one code per
# letter a..z: "01360240043788015936020505"
_REFINED_MAP = {chr(ord("a") + i): d
                for i, d in enumerate("01360240043788015936020505")}


@functools.lru_cache(maxsize=65536)
def refined_soundex(word: str) -> str:
    """Refined Soundex (commons-codec RefinedSoundex): first letter +
    every code with adjacent duplicates collapsed, no length cap, vowels
    coded as 0."""
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return ""
    out = [w[0].upper()]
    last = None
    for c in w:
        d = _REFINED_MAP.get(c)
        if d is None or d == last:
            continue
        out.append(d)
        last = d
    return "".join(out)


@functools.lru_cache(maxsize=65536)
def ascii_fold(word: str) -> str:
    """ASCIIFoldingFilter role: fold Unicode letters to their ASCII
    base via NFKD decomposition + combining-mark strip, with the few
    common non-decomposable cases the Lucene table also covers (ß→ss,
    æ→ae, œ→oe, ø→o, đ→d, þ→th, ł→l). A documented approximation of
    the filter's generated 2000-case switch."""
    extra = {"ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d",
             "þ": "th", "ð": "d", "ł": "l", "ħ": "h", "ı": "i",
             "Æ": "AE", "Œ": "OE", "Ø": "O", "Đ": "D", "Þ": "TH",
             "Ł": "L"}
    s = "".join(extra.get(c, c) for c in word)
    decomposed = unicodedata.normalize("NFKD", s)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


def icu_fold(tok: str) -> str:
    """ICUFoldingFilter role (analysis/icu/ICUFoldingFilter.java — UTR#30
    folding: NFKC_CaseFold + diacritic/default-ignorable/native-digit
    folding), approximated with unicodedata: NFKC → casefold → NFKD →
    drop combining marks (Mn) and format chars (Cf: ZWJ/ZWNJ etc.) →
    fold decimal digits to ASCII → the non-decomposable Latin table →
    NFC. Matches every vector in the reference's TestICUFoldingFilter
    (tests/test_analysis.py::test_icu_folding)."""
    import unicodedata as ud

    t = ud.normalize("NFKD", ud.normalize("NFKC", tok).casefold())
    extra = {"æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d",
             "þ": "th", "ł": "l", "ħ": "h", "ŋ": "n"}
    out = []
    for ch in t:
        cat = ud.category(ch)
        if cat in ("Mn", "Cf"):
            continue
        if cat == "Nd":
            out.append(str(ud.digit(ch)))
            continue
        out.append(extra.get(ch, ch))
    return ud.normalize("NFC", "".join(out))


def nfkc_cf(tok: str) -> str:
    """ICUNormalizer2Filter default mode (nfkc_cf): NFKC + case fold,
    WITHOUT diacritic removal (icu/ICUNormalizer2Filter.java)."""
    import unicodedata as ud

    return ud.normalize("NFKC", ud.normalize("NFKC", tok).casefold())


@functools.lru_cache(maxsize=65536)
def metaphone(word: str, max_code_len: int = 4) -> str:
    """Metaphone (Lawrence Philips 1990; the commons-codec variant the
    reference's PhoneticFilter wraps — analysis/phonetic/PhoneticFilter
    .java + TestPhoneticFilter vectors). Letters-only input; adjacent
    duplicates collapse except C; vowels survive only word-initially;
    default code length 4 (commons DEFAULT_MAX_CODE_LEN)."""
    w = [c for c in word.upper() if "A" <= c <= "Z"]
    if not w:
        return ""
    if len(w) == 1:
        return w[0]
    VOWELS, FRONTV, VARSON = set("AEIOU"), set("EIY"), set("CSPTG")
    first2 = "".join(w[:2])
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[0] == "X":
        w = ["S"] + w[1:]
    elif first2 == "WH":
        w = ["W"] + w[2:]
    n = len(w)
    code: list[str] = []
    i = 0
    while i < n and len(code) < max_code_len:
        c = w[i]
        if c != "C" and i > 0 and w[i - 1] == c:
            i += 1
            continue
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""
        if c in VOWELS:
            if i == 0:
                code.append(c)
        elif c == "B":
            if not (i == n - 1 and i > 0 and w[i - 1] == "M"):
                code.append("B")
        elif c == "C":
            if i > 0 and w[i - 1] == "S" and nxt in FRONTV:
                pass               # SCE/SCI/SCY: C silent after S
            elif nxt == "I" and nxt2 == "A":
                code.append("X")
            elif nxt in FRONTV:
                code.append("S")
            elif nxt == "H":
                # SCH → K; commons: word-initial CH → K when the char at
                # index 2 IS a vowel (CHIA/CHEMISTRY shapes), else X
                if i > 0 and w[i - 1] == "S":
                    code.append("K")
                elif i == 0 and n >= 3 and w[2] in VOWELS:
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in FRONTV:
                code.append("J")
                i += 2
            else:
                code.append("T")
        elif c == "G":
            # commons-codec silences: -GH at word end; GH before a
            # consonant; mid-word GN / GNED
            silent = (nxt == "H" and (i + 1 == n - 1 or
                                      (nxt2 and nxt2 not in VOWELS))) or \
                (i > 0 and ("".join(w[i:i + 2]) == "GN" or
                            "".join(w[i:i + 4]) == "GNED"))
            if not silent:
                if nxt in FRONTV:
                    code.append("J")
                else:
                    code.append("K")
            if nxt == "H" and i + 1 < n - 1 and nxt2 in VOWELS:
                i += 1          # GH before vowel: H handled here
        elif c == "H":
            if i > 0 and w[i - 1] in VARSON:
                pass
            elif i > 0 and w[i - 1] in VOWELS and (not nxt or nxt not in VOWELS):
                pass
            else:
                code.append("H")
        elif c == "K":
            if not (i > 0 and w[i - 1] == "C"):
                code.append("K")
        elif c in "FJLMNR":
            code.append(c)
        elif c == "P":
            code.append("F" if nxt == "H" else "P")
        elif c == "Q":
            code.append("K")
        elif c == "S":
            if nxt == "I" and nxt2 in "OA":
                code.append("X")
            elif nxt == "H":
                code.append("X")
            else:
                code.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in ("O", "A"):
                code.append("X")
            elif nxt == "H":
                code.append("0")
            elif not (nxt == "C" and nxt2 == "H"):
                code.append("T")
        elif c == "V":
            code.append("F")
        elif c == "W":
            if nxt in VOWELS:
                code.append("W")
        elif c == "X":
            code.append("K")
            if len(code) < max_code_len:
                code.append("S")
        elif c == "Y":
            if nxt in VOWELS:
                code.append("Y")
        elif c == "Z":
            code.append("S")
        i += 1
    return "".join(code[:max_code_len])


# Caverphone 2.0 replacement pipeline (David Hood 2004, the revision
# commons-codec Caverphone2 implements; reference vectors in
# TestPhoneticFilter.testAlgorithms).
_CAVERPHONE2_STEPS: list[tuple[str, str]] = [
    (r"e$", ""),
    (r"^cough", "cou2f"), (r"^rough", "rou2f"), (r"^tough", "tou2f"),
    (r"^enough", "enou2f"), (r"^trough", "trou2f"), (r"^gn", "2n"),
    (r"mb$", "m2"),
    (r"cq", "2q"), (r"ci", "si"), (r"ce", "se"), (r"cy", "sy"),
    (r"tch", "2ch"), (r"c", "k"), (r"q", "k"), (r"x", "k"), (r"v", "f"),
    (r"dg", "2g"), (r"tio", "sio"), (r"tia", "sia"), (r"d", "t"),
    (r"ph", "fh"), (r"b", "p"), (r"sh", "s2"), (r"z", "s"),
    (r"^[aeiou]", "A"), (r"[aeiou]", "3"),
    (r"j", "y"), (r"^y3", "Y3"), (r"^y", "A"), (r"y", "3"),
    (r"3gh3", "3kh3"), (r"gh", "22"), (r"g", "k"),
    (r"s+", "S"), (r"t+", "T"), (r"p+", "P"), (r"k+", "K"),
    (r"f+", "F"), (r"m+", "M"), (r"n+", "N"),
    (r"w3", "W3"), (r"wh3", "Wh3"), (r"w$", "3"), (r"w", "2"),
    (r"^h", "A"), (r"h", "2"),
    (r"r3", "R3"), (r"r$", "3"), (r"r", "2"),
    (r"l3", "L3"), (r"l$", "3"), (r"l", "2"),
    (r"2", ""), (r"3$", "A"), (r"3", ""),
]


@functools.lru_cache(maxsize=65536)
def caverphone2(word: str) -> str:
    """Caverphone 2.0: the published replacement pipeline, 1-padded to
    10 characters."""
    t = "".join(c for c in word.lower() if "a" <= c <= "z")
    if not t:
        return ""
    for pat, rep in _CAVERPHONE2_STEPS:
        t = re.sub(pat, rep, t)
    return (t + "1" * 10)[:10]


@functools.lru_cache(maxsize=65536)
def nysiis(word: str, strict: bool = True) -> str:
    """NYSIIS (Taft 1970; commons-codec Nysiis, strict=True caps the
    code at 6 chars)."""
    w = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not w:
        return ""
    # first-character transcodes
    for a, b in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"), ("PH", "FF"),
                 ("PF", "FF"), ("SCH", "SSS")):
        if w.startswith(a):
            w = b + w[len(a):]
            break
    for a, b in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                 ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if w.endswith(a):
            w = w[:-len(a)] + b
            break
    key = [w[0]]
    i = 1
    n = len(w)
    while i < n:
        if w[i:i + 2] == "EV":
            rep = "AF"
            step = 2
        elif w[i] in "AEIOU":
            rep, step = "A", 1
        elif w[i] == "Q":
            rep, step = "G", 1
        elif w[i] == "Z":
            rep, step = "S", 1
        elif w[i] == "M":
            rep, step = "N", 1
        elif w[i:i + 2] == "KN":
            rep, step = "N", 2
        elif w[i] == "K":
            rep, step = "C", 1
        elif w[i:i + 3] == "SCH":
            rep, step = "SSS", 3
        elif w[i:i + 2] == "PH":
            rep, step = "FF", 2
        elif w[i] == "H" and (w[i - 1] not in "AEIOU" or
                              (i + 1 < n and w[i + 1] not in "AEIOU")):
            rep, step = w[i - 1], 1
        elif w[i] == "W" and w[i - 1] in "AEIOU":
            rep, step = w[i - 1], 1
        else:
            rep, step = w[i], 1
        for ch in rep:
            if ch != key[-1]:
                key.append(ch)
        i += step
    out = "".join(key)
    if out.endswith("S") and len(out) > 1:
        out = out[:-1]
    if out.endswith("AY"):
        out = out[:-2] + "Y"
    if out.endswith("A") and len(out) > 1:
        out = out[:-1]
    return out[:6] if strict else out


# Daitch-Mokotoff Soundex rule table (the published Avotaynu standard
# the reference's DaitchMokotoffSoundexFilter encodes via commons-codec
# dmrules.txt): sequence -> (code at word start, code before a vowel,
# code otherwise); None = not coded; a tuple of alternatives = a branch
# (every combination yields a code — the filter's multi-token output).
_DM_VOWELS = set("aeiouy")
_DM_RULES: list[tuple[str, tuple]] = sorted([
    ("ai", ("0", "1", None)), ("aj", ("0", "1", None)),
    ("ay", ("0", "1", None)), ("au", ("0", "7", None)),
    ("a", ("0", None, None)),
    ("b", ("7", "7", "7")),
    ("chs", ("5", "54", "54")),
    ("ch", (("5", "4"), ("5", "4"), ("5", "4"))),
    ("ck", (("5", "45"), ("5", "45"), ("5", "45"))),
    ("cz", ("4", "4", "4")), ("cs", ("4", "4", "4")),
    ("csz", ("4", "4", "4")), ("czs", ("4", "4", "4")),
    ("c", (("5", "4"), ("5", "4"), ("5", "4"))),
    ("drz", ("4", "4", "4")), ("drs", ("4", "4", "4")),
    ("ds", ("4", "4", "4")), ("dsh", ("4", "4", "4")),
    ("dsz", ("4", "4", "4")),
    ("dz", ("4", "4", "4")), ("dzh", ("4", "4", "4")),
    ("dzs", ("4", "4", "4")),
    ("d", ("3", "3", "3")), ("dt", ("3", "3", "3")),
    ("ei", ("0", "1", None)), ("ej", ("0", "1", None)),
    ("ey", ("0", "1", None)), ("eu", ("1", "1", None)),
    ("e", ("0", None, None)),
    ("fb", ("7", "7", "7")), ("f", ("7", "7", "7")),
    ("g", ("5", "5", "5")),
    ("h", ("5", "5", None)),
    ("ia", ("1", None, None)), ("ie", ("1", None, None)),
    ("io", ("1", None, None)), ("iu", ("1", None, None)),
    ("i", ("0", None, None)),
    ("j", (("1", "4"), (None, "4"), (None, "4"))),
    ("ks", ("5", "54", "54")), ("kh", ("5", "5", "5")),
    ("k", ("5", "5", "5")),
    ("l", ("8", "8", "8")),
    ("mn", (None, "66", "66")), ("m", ("6", "6", "6")),
    ("nm", (None, "66", "66")), ("n", ("6", "6", "6")),
    ("oi", ("0", "1", None)), ("oj", ("0", "1", None)),
    ("oy", ("0", "1", None)), ("o", ("0", None, None)),
    ("p", ("7", "7", "7")), ("pf", ("7", "7", "7")),
    ("ph", ("7", "7", "7")),
    ("q", ("5", "5", "5")),
    ("rz", (("94", "4"), ("94", "4"), ("94", "4"))),
    ("rs", (("94", "4"), ("94", "4"), ("94", "4"))),
    ("r", ("9", "9", "9")),
    ("schtsch", ("2", "4", "4")), ("schtsh", ("2", "4", "4")),
    ("schtch", ("2", "4", "4")),
    ("scht", ("2", "43", "43")), ("schd", ("2", "43", "43")),
    ("sch", ("4", "4", "4")),
    ("shtch", ("2", "4", "4")), ("shch", ("2", "4", "4")),
    ("shtsh", ("2", "4", "4")),
    ("sht", ("2", "43", "43")), ("shd", ("2", "43", "43")),
    ("sh", ("4", "4", "4")),
    ("stch", ("2", "4", "4")), ("stsch", ("2", "4", "4")),
    ("sc", ("2", "4", "4")),
    ("strz", ("2", "4", "4")), ("strs", ("2", "4", "4")),
    ("stsh", ("2", "4", "4")),
    ("st", ("2", "43", "43")),
    ("szcz", ("2", "4", "4")), ("szcs", ("2", "4", "4")),
    ("szt", ("2", "43", "43")), ("szd", ("2", "43", "43")),
    ("sd", ("2", "43", "43")),
    ("sz", ("4", "4", "4")), ("s", ("4", "4", "4")),
    ("tch", ("4", "4", "4")), ("ttch", ("4", "4", "4")),
    ("ttsch", ("4", "4", "4")),
    ("th", ("3", "3", "3")),
    ("trz", ("4", "4", "4")), ("trs", ("4", "4", "4")),
    ("tsch", ("4", "4", "4")), ("tsh", ("4", "4", "4")),
    ("ts", ("4", "4", "4")), ("tts", ("4", "4", "4")),
    ("ttsz", ("4", "4", "4")), ("tc", ("4", "4", "4")),
    ("tz", ("4", "4", "4")), ("ttz", ("4", "4", "4")),
    ("tzs", ("4", "4", "4")), ("tsz", ("4", "4", "4")),
    ("t", ("3", "3", "3")),
    ("ui", ("0", "1", None)), ("uj", ("0", "1", None)),
    ("uy", ("0", "1", None)), ("ue", ("0", None, None)),
    ("u", ("0", None, None)),
    ("v", ("7", "7", "7")), ("w", ("7", "7", "7")),
    ("x", ("5", "54", "54")),
    ("y", ("1", None, None)),
    ("zdz", ("2", "4", "4")), ("zdzh", ("2", "4", "4")),
    ("zhdzh", ("2", "4", "4")),
    ("zd", ("2", "43", "43")), ("zhd", ("2", "43", "43")),
    ("zh", ("4", "4", "4")), ("zs", ("4", "4", "4")),
    ("zsch", ("4", "4", "4")), ("zsh", ("4", "4", "4")),
    ("z", ("4", "4", "4")),
], key=lambda kv: -len(kv[0]))       # longest match first


@functools.lru_cache(maxsize=65536)
def daitch_mokotoff(word: str) -> tuple[str, ...]:
    """Daitch-Mokotoff Soundex (analysis/phonetic/
    DaitchMokotoffSoundexFilter.java wrapping commons-codec
    DaitchMokotoffSoundex; TestDaitchMokotoffSoundexFilter vectors):
    6-digit zero-padded codes, ONE OR MORE per word (ambiguous
    sequences like C/CH/CK/J/RS branch into every alternative).
    Adjacent identical codes collapse unless a vowel separates them."""
    w = "".join(c for c in word.lower() if "a" <= c <= "z")
    if not w:
        return ()
    branches: list[tuple[str, str | None]] = [("", None)]  # (digits, last)
    i = 0
    n = len(w)
    while i < n:
        for seq, codes in _DM_RULES:
            if w.startswith(seq, i):
                if i == 0 and codes[0] is None and len(seq) > 1:
                    # a multi-letter sequence that is UNCODED at word
                    # start (mn/nm) must not swallow its letters —
                    # fall through to the single-letter rules so
                    # 'Mniszek' codes its leading nasal (6) like
                    # commons-codec, instead of dropping it
                    continue
                if i == 0:
                    code = codes[0]
                elif i + len(seq) < n and w[i + len(seq)] in _DM_VOWELS:
                    code = codes[1]
                else:
                    code = codes[2]
                alts = code if isinstance(code, tuple) else (code,)
                is_vowel = seq[0] in _DM_VOWELS
                nxt: list[tuple[str, str | None]] = []
                for digits, last in branches:
                    for alt in alts:
                        if alt is None:
                            # uncoded; a vowel breaks code adjacency
                            nxt.append((digits, None if is_vowel else last))
                        elif alt != last:
                            nxt.append((digits + alt, alt))
                        else:
                            nxt.append((digits, last))
                # dedupe branch states to bound the product
                branches = list(dict.fromkeys(nxt))[:16]
                i += len(seq)
                break
        else:
            i += 1
    return tuple(dict.fromkeys(
        (d + "000000")[:6] for d, _ in branches))

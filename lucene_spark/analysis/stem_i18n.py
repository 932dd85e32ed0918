"""Per-language normalizers and stemmers for the non-Latin / light-stemmer
language set: Arabic, Persian, Sorani Kurdish, Czech, Bulgarian, Hindi,
Bengali, Indonesian, Latvian, plus the German/French minimal stemmers.

All are word-level str -> str functions implementing the published
algorithms the reference ships:
- Arabic: Larkey, Ballesteros & Connell, "Light stemming for Arabic
  information retrieval" (light-10 stemmer) — ar/ArabicNormalizer.java,
  ar/ArabicStemmer.java
- Sorani: Esmaili et al. (Sorani normalization + affix stripping) —
  ckb/SoraniNormalizer.java, ckb/SoraniStemmer.java
- Czech: Dolamic & Savoy (light stemmer) — cz/CzechStemmer.java
- Bulgarian: Nakov, BulStem — bg/BulgarianStemmer.java
- Hindi: Ramanathan & Rao lightweight stemmer — hi/HindiStemmer.java,
  hi/HindiNormalizer.java
- Bengali: Majumder et al. — bn/BengaliNormalizer.java, bn/BengaliStemmer.java
- Indonesian: Asian, Williams & Tahaghoghi — id/IndonesianStemmer.java
- Latvian: light stemmer with palatalization unwinding — lv/LatvianStemmer.java
- Persian: normalization only (PersianAnalyzer stems nothing) —
  fa/PersianNormalizer.java
- German/French minimal: de/GermanMinimalStemmer.java,
  fr/FrenchMinimalStemmer.java

Verified in tests/test_stem_i18n.py against the reference's own golden
vocabularies (ckbtestdata.zip, deminimaltestdata.zip, frminimaltestdata.zip)
and the inline vectors of its unit tests.
"""

from __future__ import annotations

import functools
import unicodedata

# ---------------------------------------------------------------- Arabic

_AR_NORM = str.maketrans({
    "آ": "ا", "أ": "ا", "إ": "ا",  # hamza forms → alef
    "ى": "ي",                                          # dotless yeh → yeh
    "ة": "ه",                                          # teh marbuta → heh
    "ـ": None,                                              # tatweel
    "ً": None, "ٌ": None, "ٍ": None,              # -atan marks
    "َ": None, "ُ": None, "ِ": None,              # fatha/damma/kasra
    "ّ": None, "ْ": None,                              # shadda/sukun
})


def arabic_normalize(word: str) -> str:
    """ArabicNormalizer: hamza-seat folding, teh marbuta → heh, dotless
    yeh → yeh, removal of harakat + tatweel."""
    return word.translate(_AR_NORM)


_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_stem_word(word: str) -> str:
    """ArabicStemmer: strip one definite-article/conjunction prefix
    (wa- needs ≥4 chars, others ≥ prefix+2), then strip every matching
    suffix in table order (each needs ≥2 chars left)."""
    for p in _AR_PREFIXES:
        if len(p) == 1:
            if len(word) < 4:
                continue
        elif len(word) < len(p) + 2:
            continue
        if word.startswith(p):
            word = word[len(p):]
            break
    for s in _AR_SUFFIXES:
        if len(word) >= len(s) + 2 and word.endswith(s):
            word = word[: len(word) - len(s)]
    return word


@functools.lru_cache(maxsize=65536)
def arabic_stem(word: str) -> str:
    """The ArabicAnalyzer tail: normalization then stemming (the stop
    filter runs BEFORE this in the chain, as in the reference)."""
    return arabic_stem_word(arabic_normalize(word))


# ---------------------------------------------------------------- Persian

_FA_NORM = str.maketrans({
    "ی": "ي", "ے": "ي",   # farsi yeh / yeh barree → yeh
    "ک": "ك",                        # keheh → kaf
    "ۀ": "ه", "ہ": "ه",   # heh+yeh / heh goal → heh
    "ٔ": None,                            # hamza above
})


@functools.lru_cache(maxsize=65536)
def persian_normalize(word: str) -> str:
    """PersianAnalyzer normalization tail: ArabicNormalizer then
    PersianNormalizer (no stemming — the analyzer stops there)."""
    return word.translate(_AR_NORM).translate(_FA_NORM)


# ------------------------------------------------------- Sorani (Kurdish)

def sorani_normalize(word: str) -> str:
    """SoraniNormalizer: yeh/kaf unification to the Kurdish forms,
    ZWNJ handling (heh+ZWNJ → ae), final heh → ae, reh initialization,
    harakat/tatweel/format-char removal."""
    out: list[str] = []
    n = len(word)
    for i, c in enumerate(word):
        if c in "يى":               # yeh, dotless yeh → farsi yeh
            out.append("ی")
        elif c == "ك":                    # kaf → keheh
            out.append("ک")
        elif c == "‌":                    # ZWNJ
            if out and out[-1] == "ه":
                out[-1] = "ە"             # heh before ZWNJ → ae
        elif c == "ه":
            # final heh → ae ("final" in the original string)
            out.append("ە" if i == n - 1 else "ه")
        elif c == "ة":                    # teh marbuta → ae
            out.append("ە")
        elif c == "ھ":                    # heh doachashmee → heh
            out.append("ه")
        elif c == "ر":                    # initial reh → rreh
            out.append("ڕ" if i == 0 else "ر")
        elif c == "ڒ":                    # rreh above → rreh
            out.append("ڕ")
        elif c in "ـًٌٍَُِّْ":
            pass                               # tatweel + harakat deleted
        elif unicodedata.category(c) == "Cf":
            pass                               # other format chars deleted
        else:
            out.append(c)
    return "".join(out)


def sorani_stem_word(w: str) -> str:
    """SoraniStemmer: postposition, possessive pronoun, then the first
    matching article/ezafe suffix (if-chain order is significant)."""
    n = len(w)
    if n > 5 and w.endswith("دا"):          # -dA
        w = w[:-2]
    elif n > 4 and w.endswith("نا"):        # -nA (drop one char)
        w = w[:-1]
    elif n > 6 and w.endswith("ەوە"):  # -awa
        w = w[:-3]
    n = len(w)
    if n > 6 and (w.endswith("مان") or
                  w.endswith("یان") or
                  w.endswith("تان")):  # -mAn/-yAn/-tAn
        w = w[:-3]
    n = len(w)
    # indefinite singular ezafe
    if n > 6 and w.endswith("ێکی"):
        return w[:-3]
    if n > 7 and w.endswith("یەکی"):
        return w[:-4]
    # indefinite singular
    if n > 5 and w.endswith("ێک"):
        return w[:-2]
    if n > 6 and w.endswith("یەک"):
        return w[:-3]
    # definite singular
    if n > 6 and w.endswith("ەکە"):
        return w[:-3]
    if n > 5 and w.endswith("کە"):
        return w[:-2]
    # definite plural
    if n > 7 and w.endswith("ەکان"):
        return w[:-4]
    if n > 6 and w.endswith("کان"):
        return w[:-3]
    # indefinite plural ezafe
    if n > 7 and w.endswith("یانی"):
        return w[:-4]
    if n > 6 and w.endswith("انی"):
        return w[:-3]
    # indefinite plural
    if n > 6 and w.endswith("یان"):
        return w[:-3]
    if n > 5 and w.endswith("ان"):
        return w[:-2]
    # demonstrative plural
    if n > 7 and w.endswith("یانە"):
        return w[:-4]
    if n > 6 and w.endswith("انە"):
        return w[:-3]
    # demonstrative singular
    if n > 5 and (w.endswith("ایە") or
                  w.endswith("ەیە")):
        return w[:-2]
    if n > 4 and w.endswith("ە"):
        return w[:-1]
    # absolute singular ezafe
    if n > 4 and w.endswith("ی"):
        return w[:-1]
    return w


@functools.lru_cache(maxsize=65536)
def sorani_stem(word: str) -> str:
    return sorani_stem_word(word)


# ------------------------------------------------------------------ Czech

_CZ_CASE_5 = ("atech",)
_CZ_CASE_4 = ("ětem", "etem", "atům")
_CZ_CASE_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
              "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
              "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_CASE_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
              "mi", "ou")
_CZ_VOWELS = set("aeiouůyáéíýě")


def _cz_remove_case(w: str) -> str:
    n = len(w)
    if n > 7 and w.endswith(_CZ_CASE_5):
        return w[:-5]
    if n > 6 and w.endswith(_CZ_CASE_4):
        return w[:-4]
    if n > 5 and w.endswith(_CZ_CASE_3):
        return w[:-3]
    if n > 4 and w.endswith(_CZ_CASE_2):
        return w[:-2]
    if n > 3 and w[-1] in _CZ_VOWELS:
        return w[:-1]
    return w


@functools.lru_cache(maxsize=65536)
def czech_stem(word: str) -> str:
    """CzechStemmer (Dolamic & Savoy light stemmer): remove case endings,
    possessives, then palatalization normalization."""
    w = _cz_remove_case(word)
    if len(w) > 5 and w.endswith(("ov", "in", "ův")):
        w = w[:-2]
    if not w:
        return w
    # normalize
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]          # e* > *   (shift last char left)
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]    # *ů* -> *o*
    return w


# -------------------------------------------------------------- Bulgarian

def _bg_remove_article(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("ият"):
        return w[:-3]
    if n > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        return w[:-2]
    if n > 4 and w.endswith("ят"):
        return w[:-2]
    return w


def _bg_remove_plural(w: str) -> str:
    n = len(w)
    if n > 6:
        if w.endswith("овци"):
            return w[:-3]
        if w.endswith("ове"):
            return w[:-3]
        if w.endswith("еве"):
            return w[:-3] + "й"
    if n > 5:
        if w.endswith("ища"):
            return w[:-3]
        if w.endswith("та"):
            return w[:-2]
        if w.endswith("ци"):
            return w[:-2] + "к"
        if w.endswith("зи"):
            return w[:-2] + "г"
        if w[-3] == "е" and w[-1] == "и":
            return w[:-3] + "я" + w[-2]   # replace е with я, remove и
    if n > 4:
        if w.endswith("си"):
            return w[:-2] + "х"
        if w.endswith("и"):
            return w[:-1]
    return w


@functools.lru_cache(maxsize=65536)
def bulgarian_stem(word: str) -> str:
    """BulgarianStemmer (BulStem, Nakov): article + plural removal with
    the ен→н and ъ-elision rewrites."""
    w = word
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    w = _bg_remove_article(w)
    w = _bg_remove_plural(w)
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w.endswith(("а", "о", "е")):
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# ------------------------------------------------------------------ Hindi

_HI_NORM_MAP = {
    "ँ": "ं",                     # candrabindu → bindu
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े",
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
}
_HI_DELETE = {"़", "‍", "‌", "्"}


@functools.lru_cache(maxsize=65536)
def hindi_normalize(word: str) -> str:
    """HindiNormalizer (Ramanathan & Rao): nukta/matra folding, long→short
    vowels, virama/ZWJ/ZWNJ deletion, dead-n → bindu."""
    out: list[str] = []
    i = 0
    n = len(word)
    while i < n:
        c = word[i]
        if c == "न" and i + 1 < n and word[i + 1] == "्":
            out.append("ं")               # dead n → bindu
            i += 2
            continue
        if c in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_NORM_MAP.get(c, c))
        i += 1
    return "".join(out)


_HI_SUF_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_SUF_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
             "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
             "ियों", "ियां")
_HI_SUF_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
             "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
             "ुआं")
_HI_SUF_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
             "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_SUF_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


@functools.lru_cache(maxsize=65536)
def hindi_stem(word: str) -> str:
    """HindiStemmer: longest-first suffix strip with per-tier length guards."""
    n = len(word)
    if n > 6 and word.endswith(_HI_SUF_5):
        return word[:-5]
    if n > 5 and word.endswith(_HI_SUF_4):
        return word[:-4]
    if n > 4 and word.endswith(_HI_SUF_3):
        return word[:-3]
    if n > 3 and word.endswith(_HI_SUF_2):
        return word[:-2]
    if n > 2 and word.endswith(_HI_SUF_1):
        return word[:-1]
    return word


# ---------------------------------------------------------------- Bengali

def bengali_normalize(word: str) -> str:
    """BengaliNormalizer (Majumder et al.): chandrabindu deletion, vowel
    shortening, phala/visarga rewrites, sibilant unification."""
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "ঁ":                       # chandrabindu → delete
            del s[i]
            continue
        if c == "ী":
            s[i] = "ি"
        elif c == "ূ":
            s[i] = "ু"
        elif c == "ক":                     # Khio
            if i + 2 < len(s) and s[i + 1] == "্" and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
        elif c == "ঙ":                     # Nga → anusvara
            s[i] = "ং"
        elif c == "য":                     # Ja Phala
            if i == 2 and s[i - 1] == "্":
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                continue
            elif i >= 1 and s[i - 1] == "্":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
        elif c == "ব":                     # Ba Phalaa
            if i == 0 or s[i - 1] != "্":
                pass
            elif i == 2:
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i >= 5 and s[i - 3] == "্":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i >= 2:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif c == "ঃ":                     # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif c in "শষ":               # sh → s
            s[i] = "স"
        elif c == "ণ":                     # retroflex n → n
            s[i] = "ন"
        elif c in "ড়ঢ়":               # rra/rha → ra
            s[i] = "র"
        elif c == "ৎ":                     # khanda-ta → ta
            s[i] = "ত"
        i += 1
    return "".join(s)


_BN_SUF_8 = ("িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন",
             "ইয়াছিলেন")
_BN_SUF_7 = ("িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা",
             "িয়াছিলি", "য়েদেরকে")
_BN_SUF_6 = ("িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন",
             "েদেরকে")
_BN_SUF_5 = ("িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা",
             "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে")
_BN_SUF_4 = ("িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা",
             "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের")
_BN_SUF_3 = ("লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম",
             "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি",
             "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের")
_BN_SUF_2 = ("িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে",
             "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের",
             "তে", "রা", "কে")
_BN_SUF_1 = ("ি", "ী", "া", "ো", "ে", "ব", "ত")


@functools.lru_cache(maxsize=65536)
def bengali_stem(word: str) -> str:
    """BengaliStemmer: longest-first suffix strip with length guards."""
    n = len(word)
    if n > 9 and word.endswith(_BN_SUF_8):
        return word[:-8]
    if n > 8 and word.endswith(_BN_SUF_7):
        return word[:-7]
    if n > 7 and word.endswith(_BN_SUF_6):
        return word[:-6]
    if n > 6 and word.endswith(_BN_SUF_5):
        return word[:-5]
    if n > 5 and word.endswith(_BN_SUF_4):
        return word[:-4]
    if n > 4 and word.endswith(_BN_SUF_3):
        return word[:-3]
    if n > 3 and word.endswith(_BN_SUF_2):
        return word[:-2]
    if n > 2 and word.endswith(_BN_SUF_1):
        return word[:-1]
    return word


# -------------------------------------------------------------- Indonesian

_ID_VOWELS = set("aeiou")


def _id_syllables(w: str) -> int:
    return sum(1 for c in w if c in _ID_VOWELS)


@functools.lru_cache(maxsize=65536)
def indonesian_stem(word: str, derivational: bool = True) -> str:
    """IndonesianStemmer (Asian/Williams/Tahaghoghi): particle + possessive
    stripping, then derivational prefixes/suffixes with the flag
    interactions of the published algorithm."""
    w = word
    syl = _id_syllables(w)
    flags = 0
    KE, PENG, DI, MENG, TER, BER, PE = 1, 2, 4, 8, 16, 32, 64

    if syl > 2 and w.endswith(("kah", "lah", "pun")):
        syl -= 1
        w = w[:-3]
    if syl > 2:
        if w.endswith(("ku", "mu")):
            syl -= 1
            w = w[:-2]
        elif w.endswith("nya"):
            syl -= 1
            w = w[:-3]
    if not derivational:
        return w

    def first_order(w: str) -> tuple[str, int, bool]:
        # returns (word, flag, fired)
        if w.startswith("meng"):
            return w[4:], MENG, True
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
            return "s" + w[4:], MENG, True
        if w.startswith("men"):
            return w[3:], MENG, True
        if w.startswith("mem"):
            return w[3:], MENG, True
        if w.startswith("me"):
            return w[2:], MENG, True
        if w.startswith("peng"):
            return w[4:], PENG, True
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
            return "s" + w[4:], PENG, True
        if w.startswith("peny"):
            return w[4:], PENG, True
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
            return "t" + w[3:], PENG, True
        if w.startswith("pen"):
            return w[3:], PENG, True
        if w.startswith("pem"):
            return w[3:], PENG, True
        if w.startswith("di"):
            return w[2:], DI, True
        if w.startswith("ter"):
            return w[3:], TER, True
        if w.startswith("ke"):
            return w[2:], KE, True
        return w, 0, False

    def second_order(w: str) -> tuple[str, int, bool]:
        if w.startswith("ber"):
            return w[3:], BER, True
        if w == "belajar":
            return w[3:], BER, True
        if (w.startswith("be") and len(w) > 4 and w[2] not in _ID_VOWELS
                and w[3] == "e" and w[4] == "r"):
            return w[2:], BER, True
        if w.startswith("per"):
            return w[3:], 0, True
        if w == "pelajar":
            return w[3:], 0, True
        if w.startswith("pe"):
            return w[2:], PE, True
        return w, 0, False

    def suffix(w: str, flags: int) -> tuple[str, bool]:
        if (w.endswith("kan") and not flags & KE and not flags & PENG
                and not flags & PE):
            return w[:-3], True
        if (w.endswith("an") and not flags & DI and not flags & MENG
                and not flags & TER):
            return w[:-2], True
        if (w.endswith("i") and not w.endswith("si") and not flags & BER
                and not flags & KE and not flags & PENG):
            return w[:-1], True
        return w, False

    # stemDerivational flow
    if syl > 2:
        w2, f, fired = first_order(w)
        if fired:
            flags |= f
            syl -= 1
            w = w2
            if syl > 2:
                w2, fired2 = suffix(w, flags)
                if fired2:
                    syl -= 1
                    w = w2
                    if syl > 2:
                        w2, f, fired3 = second_order(w)
                        if fired3:
                            flags |= f
                            syl -= 1
                            w = w2
            return w
    # first-order did not fire (or syllable guard blocked it)
    if syl > 2:
        w2, f, fired = second_order(w)
        if fired:
            flags |= f
            syl -= 1
            w = w2
    if syl > 2:
        w2, fired = suffix(w, flags)
        if fired:
            syl -= 1
            w = w2
    return w


# ----------------------------------------------------------------- Latvian

# (affix, vowel-count-of-suffix, palatalizes)
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)
_LV_VOWELS = set("aeiouāīēū")


def _lv_unpalatalize(word: str, ln: int) -> str:
    """word still holds the removed suffix at [ln:]; s[ln] is its first
    char (the LatvianStemmer.unpalatalize contract)."""
    stem = word[:ln]
    if word[ln] == "u":
        if stem.endswith("kš"):
            return stem[:-2] + "kst"
        if stem.endswith("ņņ"):
            return stem[:-2] + "nn"
    if stem.endswith(("pj", "bj", "mj", "vj")):
        return stem[:-1]
    for src, dst in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if stem.endswith(src):
            return stem[:-2] + dst
    if stem.endswith("č"):
        return stem[:-1] + "c"
    if stem.endswith("ļ"):
        return stem[:-1] + "l"
    if stem.endswith("ņ"):
        return stem[:-1] + "n"
    return stem


@functools.lru_cache(maxsize=65536)
def latvian_stem(word: str) -> str:
    """LatvianStemmer: light stemmer, removes the first matching inflexional
    suffix whose vowel budget allows it, unwinding palatalization."""
    nv = sum(1 for c in word if c in _LV_VOWELS)
    for affix, vc, pal in _LV_AFFIXES:
        if nv > vc and len(word) >= len(affix) + 3 and word.endswith(affix):
            ln = len(word) - len(affix)
            return _lv_unpalatalize(word, ln) if pal else word[:ln]
    return word


# ---------------------------------------------------- Indic / digit folds

# DecimalDigitFilter (analysis/core/DecimalDigitFilter.java): any Unicode
# decimal digit folds to its 0-9 value. Table built lazily per codepoint.
@functools.lru_cache(maxsize=4096)
def _digit_fold(c: str) -> str:
    if ord(c) < 128:
        return c
    d = unicodedata.digit(c, -1)
    return str(d) if d >= 0 else c


def fold_digits(word: str) -> str:
    if all(ord(c) < 128 for c in word):
        return word
    return "".join(_digit_fold(c) for c in word)


# IndicNormalizer (analysis/in/IndicNormalizer.java) composes decomposed
# Indic sequences. The practically-load-bearing subset for the Devanagari
# and Bengali analyzers is base+nukta → precomposed letter — exactly the
# pairs Unicode EXCLUDES from NFC composition (U+0958-095F, U+09DC/DD/DF),
# so plain NFC cannot produce them. We apply NFC for the ordinary
# two-part vowel compositions, then compose the exclusion pairs by table.
# Divergence note: the other 7 Indic scripts pass through NFC only.
_INDIC_NUKTA = {  # decomposed base+U+093C/U+09BC pair -> precomposed letter
    "क़": "क़", "ख़": "ख़",  # qa, khha
    "ग़": "ग़", "ज़": "ज़",  # ghha, za
    "ड़": "ड़", "ढ़": "ढ़",  # dddha, rha
    "फ़": "फ़", "य़": "य़",  # fa, yya
    "ऩ": "ऩ", "ऱ": "ऱ",  # nnna, rra
    "ऴ": "ऴ",                            # llla
    "ড়": "ড়", "ঢ়": "ঢ়",  # bengali rra, rha
    "য়": "য়",                            # bengali yya
}


@functools.lru_cache(maxsize=65536)
def indic_normalize(word: str) -> str:
    w = unicodedata.normalize("NFC", word)
    for pair, comp in _INDIC_NUKTA.items():
        if pair[0] in w:
            w = w.replace(pair, comp)
    return w


# ------------------------------------------ per-analyzer normalizer chains

@functools.lru_cache(maxsize=65536)
def persian_norm_chain(word: str) -> str:
    """PersianAnalyzer pre-stop tail: DecimalDigit → ArabicNormalizer →
    PersianNormalizer (fa/PersianAnalyzer.java createComponents order)."""
    return persian_normalize(fold_digits(word))


@functools.lru_cache(maxsize=65536)
def sorani_norm_chain(word: str) -> str:
    """SoraniAnalyzer pre-stop tail: SoraniNormalizer → DecimalDigit."""
    return fold_digits(sorani_normalize(word))


@functools.lru_cache(maxsize=65536)
def hindi_norm_chain(word: str) -> str:
    """HindiAnalyzer pre-stop tail: DecimalDigit → IndicNormalizer →
    HindiNormalizer."""
    return hindi_normalize(indic_normalize(fold_digits(word)))


@functools.lru_cache(maxsize=65536)
def bengali_norm_chain(word: str) -> str:
    """BengaliAnalyzer pre-stop tail: DecimalDigit → IndicNormalizer →
    BengaliNormalizer."""
    return bengali_normalize(indic_normalize(fold_digits(word)))


# -------------------------------------------- German / French minimal

_DE_MIN_UML = str.maketrans("äöü", "aou")


@functools.lru_cache(maxsize=65536)
def german_minimal_stem(word: str) -> str:
    """GermanMinimalStemmer: umlaut folding + plural/case endings."""
    if len(word) < 5:
        return word
    w = word.translate(_DE_MIN_UML)
    n = len(w)
    if n > 6 and w.endswith("nen"):
        return w[:-3]
    if n > 5 and w.endswith(("en", "se", "es", "er")):
        return w[:-2]
    if w[-1] in "nesr":
        return w[:-1]
    return w


@functools.lru_cache(maxsize=65536)
def french_minimal_stem(word: str) -> str:
    """FrenchMinimalStemmer: plural/e/é endings + double-letter collapse."""
    if len(word) < 6:
        return word
    w = word
    if w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u":
            return w[:-2] + "l"        # u→l, drop x: chevaux → cheval
        return w[:-1]
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":
        w = w[:-1]
    if len(w) >= 2 and w[-1] == w[-2] and w[-1].isalpha():
        w = w[:-1]
    return w


# ----------------------------------------------------------------- Serbian

# sr/SerbianNormalizationFilter.java:48-160 — lowercase Serbian Cyrillic
# (plus the Latin diacritic letters đžčćš) folded to "bald" Latin; the
# digraph letters ђ/љ/њ/џ expand to dj/lj/nj/dz. Expects lowercased input,
# exactly like the reference filter.
_SR_NORM = str.maketrans({
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d",
    "ђ": "dj", "đ": "dj", "е": "e",
    "ж": "z", "з": "z", "ž": "z",
    "и": "i", "ј": "j", "к": "k", "л": "l", "љ": "lj",
    "м": "m", "н": "n", "њ": "nj", "о": "o", "п": "p",
    "р": "r", "с": "s", "т": "t",
    "ћ": "c", "ц": "c", "ч": "c", "č": "c", "ć": "c",
    "у": "u", "ф": "f", "х": "h", "џ": "dz",
    "ш": "s", "š": "s",
})


def serbian_normalize(word: str) -> str:
    """SerbianNormalizationFilter: Cyrillic + Latin-diacritic folding."""
    return word.translate(_SR_NORM)

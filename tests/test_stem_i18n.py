"""i18n stemmer/normalizer validation against the reference's own golden
vocabularies (ckbtestdata.zip, deminimaltestdata.zip, frminimaltestdata.zip,
ptrslptestdata.zip, ptminimaltestdata.zip, gltestdata.zip — the
VocabularyAssert data of the corresponding Test*Filter classes) and the
inline vectors of its unit tests (cz/bg/hi/bn/id/lv/ar/fa), plus
analyzer-chain behavior for the new language registrations."""

from __future__ import annotations

import io
import re
import zipfile

import pandas as pd
import pytest

from lucene_spark.analysis import get_analyzer
from lucene_spark.analysis.rslp import (
    galician_minimal_stem,
    galician_stem,
    portuguese_minimal_stem,
    portuguese_rslp_stem,
)
from lucene_spark.analysis import stem_i18n as S

_ANALYSIS_TESTDATA = ("/root/reference/lucene/analysis/common/src/test/"
                      "org/apache/lucene/analysis/")

_GOLDEN_ZIPS = [
    ("pt_rslp", "pt/ptrslptestdata.zip", "ptrslp.txt", portuguese_rslp_stem),
    ("pt_minimal", "pt/ptminimaltestdata.zip", "ptminimal.txt",
     portuguese_minimal_stem),
    ("galician", "gl/gltestdata.zip", "gl.txt", galician_stem),
    ("german_minimal", "de/deminimaltestdata.zip", "deminimal.txt",
     S.german_minimal_stem),
    ("french_minimal", "fr/frminimaltestdata.zip", "frminimal.txt",
     S.french_minimal_stem),
    ("sorani", "ckb/ckbtestdata.zip", "testdata.txt",
     lambda w: S.sorani_stem(S.sorani_normalize(w))),
]


@pytest.mark.parametrize("name,zip_rel,inner,fn", _GOLDEN_ZIPS,
                         ids=[g[0] for g in _GOLDEN_ZIPS])
def test_golden_vocabularies(name, zip_rel, inner, fn):
    try:
        zf = zipfile.ZipFile(_ANALYSIS_TESTDATA + zip_rel)
    except OSError:
        pytest.skip("reference golden data not available")
    pairs = [ln.rstrip("\n").split("\t")
             for ln in io.TextIOWrapper(zf.open(inner), encoding="utf-8")
             if "\t" in ln]
    assert len(pairs) > 5000
    mism = [(v, fn(v), o) for v, o in pairs if fn(v) != o]
    assert not mism, (name, len(mism), mism[:10])


def _java_vectors(path: str, pattern: str) -> list[tuple[str, str]]:
    """Extract (input, expected) string pairs from a reference unit test."""
    def jdec(s: str) -> str:
        return re.sub(r"\\u([0-9a-fA-F]{4})|\\(.)",
                      lambda m: (chr(int(m.group(1), 16)) if m.group(1)
                                 else m.group(2)), s)
    try:
        txt = open(_ANALYSIS_TESTDATA + path, encoding="utf-8").read()
    except OSError:
        pytest.skip("reference test source not available")
    out = [(jdec(a), jdec(b)) for a, b in re.findall(pattern, txt)]
    # assertAnalyzesTo(an, "in", new String[] {"out"}) — single-output form
    # used by the cz/bg stemmer tests
    out += [(jdec(a), jdec(b)) for a, b in re.findall(
        r'assertAnalyzesTo\(\w+,\s*"((?:[^"\\]|\\.)*)",\s*'
        r'new String\[\]\s*\{"((?:[^"\\]|\\.)*)"\}\)', txt)]
    return out


# var-qualified checkOneTerm only matches analyzer `a` — e.g. the
# Indonesian test's `b` is the stemDerivational=false mode, not our chain
_CHECK2 = r'check(?:OneTerm)?\((?:a,\s*)?"((?:[^"\\]|\\.)*)",\s*"((?:[^"\\]|\\.)*)"\)'

_INLINE_VECTORS = [
    # cz/bg vectors go through the full analyzer (LowerCaseFilter first)
    ("czech", "cz/TestCzechStemmer.java", lambda w: S.czech_stem(w.lower())),
    ("bulgarian", "bg/TestBulgarianStemmer.java", S.bulgarian_stem),
    ("hindi_stem", "hi/TestHindiStemmer.java", S.hindi_stem),
    ("hindi_norm", "hi/TestHindiNormalizer.java", S.hindi_normalize),
    ("bengali_stem", "bn/TestBengaliStemmer.java", S.bengali_stem),
    ("bengali_norm", "bn/TestBengaliNormalizer.java", S.bengali_normalize),
    ("indonesian", "id/TestIndonesianStemmer.java", S.indonesian_stem),
    ("latvian", "lv/TestLatvianStemmer.java",
     lambda w: S.latvian_stem(w.strip())),  # two vectors carry a stray space
    ("arabic_stem", "ar/TestArabicStemFilter.java", S.arabic_stem_word),
    ("arabic_norm", "ar/TestArabicNormalizationFilter.java",
     S.arabic_normalize),
    ("persian_norm", "fa/TestPersianNormalizationFilter.java",
     S.persian_normalize),
]


@pytest.mark.parametrize("name,path,fn", _INLINE_VECTORS,
                         ids=[v[0] for v in _INLINE_VECTORS])
def test_reference_inline_vectors(name, path, fn):
    vs = _java_vectors(path, _CHECK2)
    assert len(vs) >= 5, (name, "extraction found too few vectors")
    mism = [(v, fn(v), o) for v, o in vs if fn(v) != o]
    assert not mism, (name, len(mism), mism[:10])


def test_bengali_suffix_tables_match_reference():
    """The Bengali tier tables equal the reference's endsWith set exactly
    (codepoint-exact — precomposed U+09DF, not ya+nukta)."""
    try:
        jtxt = open("/root/reference/lucene/analysis/common/src/java/org/"
                    "apache/lucene/analysis/bn/BengaliStemmer.java",
                    encoding="utf-8").read()
    except OSError:
        pytest.skip("reference source not available")
    ref = set(re.findall(r'endsWith\(buffer, len, "([^"]*)"\)', jtxt))
    mine = set().union(S._BN_SUF_8, S._BN_SUF_7, S._BN_SUF_6, S._BN_SUF_5,
                       S._BN_SUF_4, S._BN_SUF_3, S._BN_SUF_2, S._BN_SUF_1)
    assert ref == mine, (ref - mine, mine - ref)


def test_indic_normalize_composes_exclusion_pairs():
    """NFC alone cannot produce U+0958-095F / U+09DC-09DF (composition
    exclusions); indic_normalize must (explicit codepoints — editors
    re-normalize Devanagari literals invisibly)."""
    # qa: ka+nukta (U+0915 U+093C) -> U+0958
    assert S.indic_normalize("\u0915\u093c\u0932\u092e") == "\u0958\u0932\u092e"
    # bengali rra: dda+nukta (U+09A1 U+09BC) -> U+09DC
    assert S.indic_normalize("\u09ac\u09a1\u09bc") == "\u09ac\u09dc"
    # devanagari yya: ya+nukta -> U+095F (single codepoint)
    assert len(S.indic_normalize("\u092f\u093c")) == 1
    # then the Hindi chain folds the nukta form away entirely
    assert S.hindi_norm_chain("\u0915\u093c\u0932\u092e") == "\u0915\u0932\u092e"


def test_fold_digits():
    assert S.fold_digits("١٢٣") == "123"      # arabic-indic
    assert S.fold_digits("۴۵") == "45"          # extended arabic-indic
    assert S.fold_digits("१२") == "12"          # devanagari
    assert S.fold_digits("abc123") == "abc123"


def test_i18n_analyzer_chains():
    """Each registered analyzer: stops removed, stems applied, script
    tokenized. Vectors follow the reference analyzer tests
    (TestArabicAnalyzer, TestPersianAnalyzer, TestSoraniAnalyzer...)."""
    cases = [
        # (analyzer, text, expect_in, expect_absent)
        ("arabic", "كتاب الكتب", "كتاب", "ال"),
        ("persian", "کتاب‌ها و کتاب", "كتاب‌ها", "و"),
        ("sorani", "پیاوەکان", "پیاو", None),
        ("czech", "a ti nejlepší", "nejlepš", "a"),
        ("bulgarian", "и красивите градове", "красив", "и"),
        ("hindi", "और बड़े लड़के", "लडक", "और"),
        ("bengali", "এই মেয়েরা", "মে", "এই"),
        ("indonesian", "dan peledakان".replace("ان",""), "ledak", "dan"),
        ("latvian", "un lielie tirgi", "tirg", "un"),
        ("galician", "e os cabalos", "cabal", "os"),
        ("brazilian", "e os livros", "livr", "os"),
        ("portuguese_rslp", "e os livros", "livr", "os"),
    ]
    for name, text, expect_in, expect_absent in cases:
        an = get_analyzer(name)
        toks = list(an.tokenize_series(pd.Series([text])).iloc[0])
        assert expect_in in toks, (name, toks)
        if expect_absent is not None:
            assert expect_absent not in toks, (name, toks)


def test_persian_zwnj_token_and_stop_after_normalize():
    """PersianAnalyzer: ZWNJ is token-internal; stop entries are in
    normalized form and the stop filter runs AFTER normalization (e.g. the
    stop list contains 'می‌شود'-style normalized words)."""
    an = get_analyzer("persian")
    toks = list(an.tokenize_series(pd.Series(["کتاب‌های خوب"])).iloc[0])
    # farsi yeh (U+06CC) normalized to arabic yeh (U+064A), ZWNJ kept
    assert any("‌" in t for t in toks), toks
    assert all("ی" not in t for t in toks), toks


def test_positions_preserved_with_normalizer():
    an = get_analyzer("hindi")
    t, p = an.tokenize_with_positions(pd.Series(["और बड़े लड़के"]))
    # 'और' is a stopword -> position gap preserved
    assert list(p.iloc[0])[0] == 1, (list(t.iloc[0]), list(p.iloc[0]))

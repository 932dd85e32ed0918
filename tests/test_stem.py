"""Porter stemmer validation against the reference's own golden test data
(lucene/analysis/common/src/test/.../en/porterTestData.zip — the 23k-word
voc.txt/output.txt pair used by TestPorterStemFilter), plus analyzer-chain
behavior (stemming after stop filtering, `run` matches `running`)."""

from __future__ import annotations

import io
import zipfile

import pandas as pd
import pytest

from lucene_spark.analysis import get_analyzer
from lucene_spark.analysis.stem import porter_stem

GOLDEN_ZIP = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
              "lucene/analysis/en/porterTestData.zip")


def test_porter_matches_lucene_golden_data():
    try:
        zf = zipfile.ZipFile(GOLDEN_ZIP)
    except OSError:
        pytest.skip("reference golden data not available")
    voc = io.TextIOWrapper(zf.open("voc.txt")).read().split()
    out = io.TextIOWrapper(zf.open("output.txt")).read().split()
    assert len(voc) == len(out) and len(voc) > 20000
    mism = [(v, porter_stem(v), o) for v, o in zip(voc, out) if porter_stem(v) != o]
    assert not mism, mism[:10]


def test_porter_classic_examples():
    cases = {
        "caresses": "caress", "ponies": "poni", "relational": "relat",
        "conditional": "condit", "hopping": "hop", "happy": "happi",
        "generalizations": "gener", "running": "run", "merges": "merg",
        "tables": "tabl",
    }
    for w, s in cases.items():
        assert porter_stem(w) == s, (w, porter_stem(w), s)


def test_english_analyzer_chain():
    an = get_analyzer("english")
    toks = an.tokenize_series(pd.Series(["The runners were RUNNING quickly"]))
    # stops removed, lowercased, stemmed: runner/run share no stem but
    # running → run; 'the'/'were' stopped ('were' is not in the 33-word
    # set, so it stays, stemmed)
    out = list(toks.iloc[0])
    assert "run" in out and "the" not in out
    # positions keep gaps across stopped tokens, stems applied to kept ones
    t2, p2 = an.tokenize_with_positions(pd.Series(["the running dog"]))
    assert list(t2.iloc[0]) == ["run", "dog"] and list(p2.iloc[0]) == [1, 2]


def test_stemmed_index_search(spark, tmp_path):
    """End-to-end: an english-analyzer index matches inflected forms."""
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    rows = [("r", f"p{i}", "c", t) for i, t in enumerate([
        "merging streams quickly", "merge the stream", "sorted tables",
        "unrelated words here"])]
    src = spark.createDataFrame(rows, "repo string, path string, commit string, content string")
    idx = str(tmp_path) + "/stemidx"
    cfg = IndexConfig(partitions=1, num_buckets=2, analyzer="english")
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))
    got = {r["doc_id"] for r in s.matches("merges", with_scores=False).collect()}
    assert len(got) == 2  # 'merging' and 'merge' docs
    got2 = {r["doc_id"] for r in s.matches("table", with_scores=False).collect()}
    assert len(got2) == 1  # 'tables' doc


def test_light_stemmers_conflate_inflections():
    """Per-language light stemmers (the UniNE/CLEF *LightStemmer family):
    plural/case/gender variants conflate; diacritics fold. Expectations
    match the reference algorithms exactly (note: gato/gatti stay — the
    Spanish/Italian stemmers skip words under 5/6 chars by design)."""
    from lucene_spark.analysis.stem import STEMMERS

    cases = {
        "german_light": [("hunde", "hund"), ("hunden", "hund"),
                         ("häuser", "haus"), ("katzen", "katz"),
                         ("katze", "katz"), ("hund", "hund")],
        "french_light": [("chevaux", "cheval"), ("cheval", "cheval"),
                         ("tables", "tabl"), ("table", "tabl"),
                         ("chanter", "chant"), ("chantes", "chant")],
        "spanish_light": [("perros", "perr"), ("perro", "perr"),
                          ("gatos", "gat"), ("gato", "gato"),
                          ("canciones", "cancion")],
        "italian_light": [("gatti", "gatti"), ("amiche", "amic"),
                          ("ragazzi", "ragazz"), ("ragazzo", "ragazz")],
        "portuguese_light": [("livros", "livr"), ("livro", "livr"),
                             ("animais", "animal"), ("animal", "animal"),
                             ("homens", "homem"), ("lições", "lica")],
        "dutch_light": [("katten", "kat"), ("kat", "kat"),
                        ("boeken", "boek"), ("boek", "boek")],
        "swedish_light": [("bilar", "bil"), ("bilen", "bil"),
                          ("bil", "bil"), ("flickorna", "flick"),
                          ("flickor", "flick")],
        "russian_light": [("журналами", "журнал"), ("журналы", "журнал"),
                          ("журнал", "журнал")],
        "finnish_light": [("kirjat", "kirj"), ("kirja", "kir")],
        "hungarian_light": [("házak", "haz"), ("házban", "haz")],
        "norwegian_light": [("bilene", "bil"), ("bilen", "bil"),
                            ("hemmeligheten", "hemmelig")],
    }
    for name, pairs in cases.items():
        fn = STEMMERS[name]
        for word, want in pairs:
            assert fn(word) == want, (name, word, fn(word), want)


_LIGHT_GOLDENS = [
    ("german_light", "de/delighttestdata.zip", "delight.txt"),
    ("french_light", "fr/frlighttestdata.zip", "frlight.txt"),
    ("spanish_light", "es/eslighttestdata.zip", "eslight.txt"),
    ("portuguese_light", "pt/ptlighttestdata.zip", "ptlight.txt"),
    ("italian_light", "it/itlighttestdata.zip", "itlight.txt"),
    ("swedish_light", "sv/svlighttestdata.zip", "svlight.txt"),
    ("russian_light", "ru/rulighttestdata.zip", "rulight.txt"),
    ("finnish_light", "fi/filighttestdata.zip", "filight.txt"),
    ("hungarian_light", "hu/hulighttestdata.zip", "hulight.txt"),
]

_ANALYSIS_TESTDATA = ("/root/reference/lucene/analysis/common/src/test/"
                      "org/apache/lucene/analysis/")


@pytest.mark.parametrize("name,zip_rel,inner", _LIGHT_GOLDENS)
def test_light_stemmers_match_lucene_golden_data(name, zip_rel, inner):
    """Every light stemmer reproduces the reference's own golden
    vocabulary byte-for-byte (VocabularyAssert data used by
    Test{German,French,...}LightStemFilter — 20k-50k pairs each)."""
    from lucene_spark.analysis.stem import STEMMERS

    try:
        zf = zipfile.ZipFile(_ANALYSIS_TESTDATA + zip_rel)
    except OSError:
        pytest.skip("reference golden data not available")
    pairs = [ln.rstrip("\n").split("\t")
             for ln in io.TextIOWrapper(zf.open(inner), encoding="utf-8")
             if "\t" in ln]
    assert len(pairs) > 10000
    fn = STEMMERS[name]
    mism = [(v, fn(v), o) for v, o in pairs if fn(v) != o]
    assert not mism, (name, len(mism), mism[:10])


@pytest.mark.parametrize("name,txt_rel", [
    ("norwegian_light", "no/nb_light.txt"),
    ("nynorsk_light", "no/nn_light.txt"),
])
def test_norwegian_light_matches_golden_data(name, txt_rel):
    """Bokmål/Nynorsk flag variants vs nb_light.txt / nn_light.txt
    (TestNorwegianLightStemFilter)."""
    from lucene_spark.analysis.stem import STEMMERS

    try:
        with open(_ANALYSIS_TESTDATA + txt_rel, encoding="utf-8") as f:
            pairs = [ln.rstrip("\n").split("\t") for ln in f if "\t" in ln]
    except OSError:
        pytest.skip("reference golden data not available")
    fn = STEMMERS[name]
    mism = [(v, fn(v), o) for v, o in pairs if fn(v) != o]
    assert not mism, (name, mism[:10])


def test_new_language_analyzers_registered():
    """finnish/russian/hungarian/norwegian/nynorsk chains: stop + stem."""
    for name, text, expect_in, expect_out in [
        ("russian", "новые журналы и книги", "журнал", "и"),
        ("finnish", "uudet kirjat ja lehdet", "kirj", "ja"),
        # Snowball Hungarian (the reference default) keeps accents
        ("hungarian", "a házak és az utcák", "ház", "a"),
        ("norwegian", "bilene og husene er der", "bil", "og"),
    ]:
        an = get_analyzer(name)
        toks = list(an.tokenize_series(pd.Series([text])).iloc[0])
        assert expect_in in toks, (name, toks)
        assert expect_out not in toks, (name, toks)


def test_german_normalization_filter():
    """GermanNormalizationFilter FSM (de/GermanNormalizationFilter.java):
    ß→ss, umlaut folding, ae/oe/ue e-deletion with the vowel/q guard;
    the 'german' analyzer chain conflates ß and ss spellings."""
    from lucene_spark.analysis.stem import STEMMERS, german_normalize

    assert german_normalize("straße") == "strasse"
    assert german_normalize("häuser") == "hauser"
    assert german_normalize("aerodynamisch") == "arodynamisch"
    assert german_normalize("blaue") == "blaue"      # ue after vowel kept
    assert german_normalize("quelle") == "quelle"    # ue after q kept
    f = STEMMERS["german_light_norm"]
    assert f("straße") == f("strasse") == "strass"
    an = get_analyzer("german")
    a = list(an.tokenize_series(pd.Series(["die Straße"])).iloc[0])
    b = list(an.tokenize_series(pd.Series(["die Strasse"])).iloc[0])
    assert a == b == ["strass"]


def test_all_stemmers_total_and_deterministic():
    """Every registered stemmer/normalizer is TOTAL over arbitrary
    unicode tokens (no exceptions — an analyzer chain must never die on
    weird corpus bytes) and deterministic. Hypothesis-driven."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_spark.analysis.stem import NORMALIZERS, STEMMERS

    fns = list(STEMMERS.items()) + list(NORMALIZERS.items())

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=24))
    def run(tok):
        for name, fn in fns:
            try:
                a = fn(tok)
                b = fn(tok)
            except Exception as e:   # pragma: no cover
                raise AssertionError(f"{name} raised on {tok!r}: {e}")
            assert isinstance(a, str) and a == b, (name, tok)

    run()

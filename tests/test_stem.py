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
    """Per-language light stemmers (GermanLightStemFilter-family role):
    plural/case/gender variants conflate; diacritics fold; short words
    and already-stemmed forms are stable (idempotence)."""
    from lucene_spark.analysis.stem import STEMMERS

    cases = {
        "german_light": [("hunde", "hund"), ("hunden", "hund"),
                         ("häuser", "haus"), ("katzen", "katz"),
                         ("katze", "katz"), ("hund", "hund")],
        "french_light": [("chevaux", "cheval"), ("cheval", "cheval"),
                         ("tables", "tabl"), ("table", "tabl"),
                         ("chanter", "chant"), ("chantes", "chant")],
        "spanish_light": [("perros", "perr"), ("perro", "perr"),
                          ("gatos", "gat"), ("gato", "gat"),
                          ("canciones", "cancion")],
        "italian_light": [("gatti", "gatt"), ("gatto", "gatt"),
                          ("amiche", "amic"), ("amica", "amic")],
        "portuguese_light": [("livros", "livro"), ("livro", "livro"),
                             ("animais", "animal"), ("animal", "animal"),
                             ("homens", "homem"), ("lições", "licao")],
        "dutch_light": [("katten", "kat"), ("kat", "kat"),
                        ("boeken", "boek"), ("boek", "boek")],
        "swedish_light": [("bilarna", "bil"), ("bilar", "bil"),
                          ("bilen", "bil"), ("bil", "bil"),
                          ("flickorna", "flick"), ("flickor", "flick")],
    }
    for name, pairs in cases.items():
        fn = STEMMERS[name]
        for word, want in pairs:
            assert fn(word) == want, (name, word, fn(word), want)

    # each stemmer's own outputs are stable (stem(stem(w)) == stem(w) on
    # its OWN language's vocabulary — cross-language idempotence is not a
    # light-stemmer property: single-pass suffix stripping by design)
    for name, pairs in cases.items():
        fn = STEMMERS[name]
        for word, _ in pairs:
            out = fn(word)
            assert fn(out) == out, (name, word, out)

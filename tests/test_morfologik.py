"""Polish Morfologik dictionary lemmatizer (MorfologikFilter role) —
analysis/morfologik.py. Golden vectors are the reference's own
TestMorfologikAnalyzer.java expectations (lines 40-117), seeded
verbatim into the generated dictionary (stempel methodology)."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_spark.analysis.morfologik import (
    default_dictionary,
    lemmatize_token,
    lemmatize_with_tags,
    morfologik_token_lists,
)


# TestMorfologikAnalyzer.java:40-43
@pytest.mark.parametrize("token,want", [
    ("a", ["a"]),
    ("liście", ["liście", "liść", "list", "lista"]),
    ("danych", ["dany", "dana", "dane", "dać"]),
    ("ęóąśłżźćń", ["ęóąśłżźćń"]),            # miss passes through
])
def test_reference_basic_vectors(token, want):
    assert lemmatize_token(token) == want


# TestMorfologikAnalyzer.java:108-117 — case handling contract:
# exact lookup first, lowercase second
@pytest.mark.parametrize("token,want", [
    ("AGD", ["AGD", "artykuły gospodarstwa domowego"]),
    ("agd", ["artykuły gospodarstwa domowego"]),
    ("Poznania", ["Poznań"]),
    ("poznania", ["poznanie", "poznać"]),
    ("Aarona", ["Aaron"]),
    ("aarona", ["aarona"]),                  # no lowercase entry: miss
    ("Liście", ["liście", "liść", "list", "lista"]),
])
def test_reference_case_vectors(token, want):
    assert lemmatize_token(token) == want


def test_sentence_sequence_matches_reference():
    # TestMorfologikAnalyzer.java:50-53 ("liście danych" stream)
    out = morfologik_token_lists(pd.Series(["liście danych"])).iloc[0]
    assert out == ["liście", "liść", "list", "lista",
                   "dany", "dana", "dane", "dać"]


def test_tags_split_on_plus_and_pipe():
    got = lemmatize_with_tags("danych")
    assert [l for l, _ in got] == ["dany", "dana", "dane", "dać"]
    assert all(tags and all(":" in t or t.isalpha() for t in tags)
               for _, tags in got)


def test_generated_paradigms_scale():
    d = default_dictionary()
    assert len(d.table) >= 13000
    # every generated feminine-paradigm form round-trips to its lemma
    fem = [(f, ls) for f, ls in d.table.items()
           if f.endswith("ami") and len(ls) == 1]
    assert len(fem) >= 300
    for f, ls in fem[:50]:
        lemma = ls[0][0]
        assert lemma.endswith(("a",)) or not lemma.endswith("ać")


def test_analyzer_registry_chain():
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis.analyzers import tokenize_pandas

    a = get_analyzer("morfologik")
    out = tokenize_pandas(
        pd.Series(["liście danych", "Poznania xyz"]), a).tolist()
    assert out[0] == ["liście", "liść", "list", "lista",
                      "dany", "dana", "dane", "dać"]
    assert out[1] == ["Poznań", "xyz"]

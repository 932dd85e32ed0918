"""FuzzyQuery / DirectSpellChecker transposition parity: the reference
defaults count an adjacent swap as ONE edit (FuzzyQuery.java:77,
DirectSpellChecker.java:415) — 'emrge' must reach 'merge' at
maxEdits=1."""

from __future__ import annotations

from lucene_spark.search.stringdist import osa_distance


def test_osa_counts_swap_as_one():
    assert osa_distance("emrge", "merge") == 1
    assert osa_distance("martha", "marhta") == 1
    assert osa_distance("abc", "abc") == 0
    assert osa_distance("", "ab") == 2


def test_expand_fuzzy_transpositions_default(reader):
    # 'merge' exists in the session corpus; 'emrge' is its adjacent swap
    assert "merge" in reader.expand_fuzzy("emrge", max_edits=1)
    # legacy plain-Levenshtein path: swap costs 2 edits → no match
    assert "merge" not in reader.expand_fuzzy("emrge", max_edits=1,
                                              transpositions=False)


def test_suggest_similar_reaches_transposed_term(reader):
    from lucene_spark.search.spellcheck import suggest_similar

    out = suggest_similar(reader, "emrge", n=5, max_edits=1, min_prefix=0)
    terms = [r["term"] for r in out.collect()]
    assert "merge" in terms
    row = next(r for r in out.collect() if r["term"] == "merge")
    assert row["ed"] == 1          # the OSA distance, not plain lev 2

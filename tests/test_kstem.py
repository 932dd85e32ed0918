"""KStem golden vocabulary — the reference's entire kstemTestData.zip
(12,130 word→stem pairs, TestKStemmer.java:62) at 0 mismatches, plus
targeted vectors for each ending family and the filter contract."""

import os

import pytest

from lucene_spark.analysis.kstem import KStemmer, kstem

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "kstem_golden.txt")


def test_golden_vocabulary_zero_mismatch():
    bad = []
    with open(GOLDEN, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            word, want = line.split("\t")
            got = kstem(word)
            if got != want:
                bad.append((word, want, got))
    assert bad == [], f"{len(bad)} mismatches, first 10: {bad[:10]}"


VECTORS = [
    # plural / -ies
    ("calories", "calorie"), ("aides", "aide"), ("crosses", "cross"),
    # past tense / doubled consonant
    ("backfilled", "backfill"), ("died", "die"), ("microcoded",
                                                  "microcode"),
    # aspect
    ("aging", "age"), ("fingerspelling", "fingerspell"),
    # direct conflations / exceptions (dictionary-driven)
    ("italians", "italy"), ("italian", "italy"),
    # derivational endings — dictionary headwords return unchanged
    # (definition, resignation, adherence are themselves headwords);
    # these are the golden file's own rows
    ("definition", "definition"), ("immunity", "immune"),
    ("amplification", "amplify"), ("militarily", "military"),
    ("optimal", "optimum"), ("canonic", "canonical"),
    # direct conflation table
    ("fled", "flee"),
    # unchanged: short / non-alpha
    ("ab", "ab"), ("r2d2", "r2d2"),
]


@pytest.mark.parametrize("word,want", VECTORS)
def test_vectors(word, want):
    assert kstem(word) == want


def test_reusable_instance():
    st = KStemmer()
    assert st.stem("indexes") == "index"
    assert st.stem("jumped") == "jump"
    assert st.stem("jumped") == "jump"   # stateless across calls


PORTER_GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                             "porter_golden.txt")


def test_porter_golden_vocabulary_zero_mismatch():
    """The reference's porterTestData.zip (23,531 pairs,
    TestPorterStemFilter.java) against the registered porter stemmer."""
    from lucene_spark.analysis.stem import STEMMERS

    porter = STEMMERS["porter"]
    bad = []
    with open(PORTER_GOLDEN, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            word, want = line.split("\t")
            got = porter(word)
            if got != want:
                bad.append((word, want, got))
    assert bad == [], f"{len(bad)} mismatches, first 10: {bad[:10]}"

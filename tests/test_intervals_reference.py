"""Reference-exact interval fixtures — the checkIntervals expectations
of queries/src/test/org/apache/lucene/queries/intervals/TestIntervals
.java ported verbatim (docs normalized to lowercase no-punctuation so
whitespace tokens equal StandardAnalyzer's): the algebra must reproduce
Lucene's exact per-doc minimal-interval streams, not just match sets."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.search import intervals as IV
from lucene_spark.search.explain import _iv_doc_spans

# TestIntervals.java:62-69 field1_docs, punctuation stripped + lowercased
FIELD1 = [
    "nothing of interest to anyone here",
    "pease porridge hot pease porridge cold pease porridge in the pot nine"
    " days old some like it hot some like it cold some like it in the pot"
    " nine days old",
    "pease porridge cold pease porridge hot pease porridge in the pot"
    " twelve days old some like it cold some like it hot some like it in"
    " the fraggle",
    "nor here nowt hot going on in pease this one",
    "pease porridge hot pease porridge cold pease porridge in the pot nine"
    " years old some like it hot some like it twelve",
    "porridge is great",
]
# TestIntervals.java field2_docs[5]
FIELD2_5 = "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6"


def docmodel(text: str) -> dict:
    toks = text.split()
    out: dict = {}
    for t in set(toks):
        pos = np.array([i for i, x in enumerate(toks) if x == t],
                       dtype=np.int64)
        out[("", t)] = (len(pos), len(toks), pos)
    return out


def spans_per_doc(node, docs):
    return [
        [(s, e) for s, e in _iv_doc_spans(node, docmodel(d))] for d in docs]


def pairs(flat):
    return sorted(zip(flat[::2], flat[1::2]))


@pytest.mark.parametrize("node,expected", [
    # testBefore (TestIntervals.java:833-838)
    (IV.before(IV.term("cold"), IV.term("twelve")),
     [[], [], [2, 2], [], [5, 5], []]),
    # testAfter (java:814-830)
    (IV.after(IV.term("porridge"),
              IV.ordered(IV.term("pease"), IV.term("cold"))),
     [[], [7, 7], [4, 4, 7, 7], [], [7, 7], []]),
    # testWithin (java:840-847) — within over an OR reference
    (IV.within(IV.term("hot"), 6,
               IV.or_(IV.term("porridge"), IV.term("fraggle"))),
     [[], [2, 2], [5, 5, 21, 21], [], [2, 2], []]),
    # testOverlapping (java:849-856)
    (IV.overlapping(IV.unordered(IV.term("hot"), IV.term("porridge")),
                    IV.unordered(IV.term("cold"), IV.term("pease"))),
     [[], [2, 4, 7, 17], [5, 7, 7, 21], [], [2, 4], []]),
    # testMinimumShouldMatch (java:716-737)
    (IV.at_least(3, IV.term("porridge"), IV.term("hot"), IV.term("twelve"),
                 IV.term("nine"), IV.term("pease")),
     [[], [0, 2, 1, 3, 2, 4, 6, 11, 7, 17],
      [3, 5, 4, 6, 5, 7, 6, 11, 7, 21], [],
      [0, 2, 1, 3, 2, 4, 6, 11, 7, 17, 11, 21], []]),
    # testDefinedGaps (java:781-788) — phrase over an extend child
    (IV.phrase(IV.term("pease"), IV.extend(IV.term("cold"), 1, 1),
               IV.term("porridge")),
     [[], [3, 7], [0, 4], [], [3, 7], []]),
])
def test_field1_reference_intervals(node, expected):
    got = spans_per_doc(node, FIELD1)
    want = [pairs(e) for e in expected]
    assert [sorted(g) for g in got] == want


def test_unordered_over_composed_reference():
    """TestIntervals.java:695-713: unordered(ordered(w1, w3), w4) over
    field2_docs[5] yields exactly {(0,3), (3,6), (4,8)}."""
    node = IV.unordered(IV.ordered(IV.term("w1"), IV.term("w3")),
                        IV.term("w4"))
    got = _iv_doc_spans(node, docmodel(FIELD2_5))
    assert sorted(got) == [(0, 3), (3, 6), (4, 8)]


def test_no_match_min_should_match():
    """TestIntervals.java:776-779: atLeast(4, a, b) can never match."""
    from lucene_spark.search import plan as P

    node = IV.at_least(4, IV.term("a"), IV.term("b"))
    assert isinstance(node, P.MatchNoneNode)


def test_degenerate_min_should_match():
    """TestIntervals.java:760-774: ordered(atLeast(1, interest),
    atLeast(1, anyone)) over doc 0 → exactly (2, 4)."""
    node = IV.ordered(IV.at_least(1, IV.term("interest")),
                      IV.at_least(1, IV.term("anyone")))
    got = _iv_doc_spans(node, docmodel(FIELD1[0]))
    assert got == [(2, 4)]

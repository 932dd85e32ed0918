"""Match-region highlighter (lucene/highlighter/matchhighlight role) —
search/matchhighlight.py: query-derived offset regions (phrase = ONE
region), PassageSelector.pickBest semantics, formatted passages."""

from __future__ import annotations

import re

import pytest

from lucene_spark.search import plan as P
from lucene_spark.search.matchhighlight import (
    _format_passages,
    _node_regions,
    match_highlight,
    pick_best_passages,
)


def _toks(text):
    return [(m.group(0), m.start(), m.end())
            for m in re.finditer(r"\S+", text)]


TEXT = "the quick brown fox jumps over the lazy dog and the quick cat"


def test_phrase_is_one_region():
    regs = _node_regions(_toks(TEXT), P.PhraseNode(terms=("lazy", "dog")))
    assert regs == [(35, 43)]
    assert TEXT[35:43] == "lazy dog"


def test_gapped_phrase_positions():
    # PhraseQuery.Builder add(term, position): "quick"/0 "fox"/2
    regs = _node_regions(
        _toks(TEXT), P.PhraseNode(terms=("quick", "fox"),
                                  positions=(0, 2)))
    assert regs == [(4, 19)]
    assert TEXT[4:19] == "quick brown fox"


def test_boolean_union_and_term_regions():
    node = P.BooleanNode(clauses=(
        P.Clause(node=P.TermNode(term="quick"), occur="SHOULD"),
        P.Clause(node=P.PrefixNode(prefix="jum"), occur="SHOULD"),
        P.Clause(node=P.TermNode(term="absent"), occur="MUST_NOT"),
    ))
    regs = sorted(_node_regions(_toks(TEXT), node))
    assert regs == [(4, 9), (20, 25), (52, 57)]


def test_pick_best_prefers_denser_passage():
    regs = [(4, 9), (35, 43), (52, 57)]
    ps = pick_best_passages(TEXT, regs, 30, 1)
    assert len(ps) == 1
    frm, to, inside = ps[0]
    assert len(inside) == 2            # the two right-side markers
    out = _format_passages(TEXT, ps, "<b>", "</b>", "...")
    assert "<b>lazy dog</b>" in out and "<b>quick</b>" in out


def test_passages_never_overlap_and_come_in_offset_order():
    regs = [(4, 9), (35, 43), (52, 57)]
    ps = pick_best_passages(TEXT, regs, 20, 3)
    for a, b in zip(ps, ps[1:]):
        assert a[1] < b[0]
    assert ps == sorted(ps)


def test_empty_and_degenerate():
    assert pick_best_passages("", [(0, 3)], 20, 2) == []
    assert pick_best_passages(TEXT, [], 20, 2) == []
    assert pick_best_passages(TEXT, [(0, 5)], 0, 2) == []


def test_spark_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, TEXT), (2, "nothing to see here"),
         (3, "quick quick quick")], "doc_id long, text string")
    out = match_highlight(df, "text", '"lazy dog" OR quick',
                          analyzer="whitespace",
                          max_passage_window=30, max_passages=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert "<b>lazy dog</b>" in rows[1]["match_snippet"]
    assert rows[2]["match_snippet"] == ""
    assert rows[2]["match_regions"] == []
    assert len(rows[3]["match_regions"]) == 3
    regs = [(r["from"], r["to"]) for r in rows[1]["match_regions"]]
    assert (35, 43) in regs             # the phrase region survives

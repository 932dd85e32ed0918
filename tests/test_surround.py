"""Surround query-language parser tests: grammar shapes vs the reference
dialect (lucene/queryparser/surround/parser/QueryParser.jj; query/
DistanceQuery.java, SrndTruncQuery.java) plus end-to-end matching parity
against a brute-force positional oracle recomputed from the source text
(the Test02Boolean / Test03Distance strategy from
queryparser/src/test/.../surround/query/).
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from lucene_spark.search import plan as P
from lucene_spark.search.surround import SurroundSyntaxError, parse_surround


# ----------------------------------------------------------------- grammar

def test_infix_w_chain():
    n = parse_surround("a W b W c")
    assert isinstance(n, P.IntervalSlotsNode)
    assert n.ordered and n.max_gaps == 0
    assert [s.term for s in n.slots] == ["a", "b", "c"]


def test_infix_n():
    n = parse_surround("a N b")
    assert isinstance(n, P.IntervalSlotsNode)
    assert not n.ordered and n.max_gaps == 0


def test_prefix_distance():
    n = parse_surround("3W(alpha, beta, gamma)")
    assert isinstance(n, P.IntervalSlotsNode)
    assert n.ordered and n.max_gaps == 2
    assert [s.term for s in n.slots] == ["alpha", "beta", "gamma"]
    n = parse_surround("5n(x, y)")
    assert not n.ordered and n.max_gaps == 4


def test_truncation_slot():
    n = parse_surround("2W(jav*, lang)")
    assert isinstance(n.slots[0], P.PrefixNode) and n.slots[0].prefix == "jav"
    assert isinstance(n.slots[1], P.TermNode)
    n = parse_surround("2W(j?va, lang)")
    assert isinstance(n.slots[0], P.RegexpNode)


def test_or_slot():
    n = parse_surround("3W((a OR b), c)")
    assert isinstance(n.slots[0], P.TermInSetNode)
    assert set(n.slots[0].terms) == {"a", "b"}


def test_boolean_precedence():
    # OR binds loosest: `a AND b OR c` = (a AND b) OR c
    n = parse_surround("a AND b OR c")
    assert isinstance(n, P.BooleanNode)
    assert [c.occur for c in n.clauses] == [P.Occur.SHOULD, P.Occur.SHOULD]
    inner = n.clauses[0].node
    assert isinstance(inner, P.BooleanNode)
    assert all(c.occur is P.Occur.MUST for c in inner.clauses)


def test_not():
    n = parse_surround("a NOT b")
    assert isinstance(n, P.BooleanNode)
    assert [c.occur for c in n.clauses] == [P.Occur.MUST, P.Occur.MUST_NOT]


def test_distance_binds_tighter_than_bool():
    n = parse_surround("a W b AND c")
    assert isinstance(n, P.BooleanNode)
    assert isinstance(n.clauses[0].node, P.IntervalSlotsNode)
    assert isinstance(n.clauses[1].node, P.TermNode)


def test_prefix_nary_boolean():
    n = parse_surround("AND(a, b, c)")
    assert isinstance(n, P.BooleanNode) and len(n.clauses) == 3
    assert all(c.occur is P.Occur.MUST for c in n.clauses)
    n = parse_surround("or(a, b)")
    assert all(c.occur is P.Occur.SHOULD for c in n.clauses)


def test_boost_and_field():
    n = parse_surround("2W(a, b)^3")
    assert n.boost == 3.0
    n = parse_surround("title:a W title:b")
    assert n.field == "title"
    n = parse_surround("a W b", default_field="content")
    assert n.field == "content"
    assert all(s.field == "content" for s in n.slots)


def test_field_mix_rejected():
    with pytest.raises(SurroundSyntaxError):
        parse_surround("title:a W body:b")


def test_nested_distance_rejected():
    with pytest.raises(SurroundSyntaxError):
        parse_surround("3W(a, 2W(b, c))")


def test_case_insensitive_ops_literal_terms():
    n = parse_surround("a and b")
    assert isinstance(n, P.BooleanNode)
    # terms are lowercased by default, AND/OR/NOT/W/N are operators
    n = parse_surround("Alpha W Beta")
    assert [s.term for s in n.slots] == ["alpha", "beta"]


def test_empty_and_trailing():
    assert isinstance(parse_surround(""), P.MatchNoneNode)
    with pytest.raises(SurroundSyntaxError):
        parse_surround("a )")


# ------------------------------------------------------------- end-to-end

def brute_slots(slot_pls: list[np.ndarray], max_gaps: int, ordered: bool) -> bool:
    """One position per slot from the slot's UNION position list."""
    for combo in itertools.product(*[p.tolist() for p in slot_pls]):
        k = len(combo)
        if ordered:
            if not all(combo[i] < combo[i + 1] for i in range(k - 1)):
                continue
            span = combo[-1] - combo[0]
        else:
            span = max(combo) - min(combo)
        if (span + 1) - k <= max_gaps:
            return True
    return False


@pytest.fixture(scope="module")
def positioned(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    idx = str(tmp_path_factory.mktemp("srx")) + "/index"
    src = spark.createDataFrame(make_corpus(120, seed=7))
    cfg = IndexConfig(partitions=2, num_buckets=4, index_positions=True)
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    return IndexSearcher(IndexReader(spark, idx)), src


def _tok_positions(searcher, src):
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("code")
    ds = searcher.hydrate(searcher.matches(P.MatchAllNode(), with_scores=False))
    keyed = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in ds.collect()}
    toks = {}
    for r in src.collect():
        did = keyed[(r["repo"], r["path"], r["commit"])]
        toks[did] = list(an.tokenize_series(pd.Series([r["content"]])).iloc[0])
    return toks


def _slot_union(toks: list[str], terms: set[str]) -> np.ndarray:
    return np.array([i for i, t in enumerate(toks) if t in terms], dtype=np.int64)


@pytest.mark.parametrize("qtext,slot_sets,max_gaps,ordered", [
    ("index W writer", [{"index"}, {"writer"}], 0, True),
    ("3N(index, writer)", [{"index"}, {"writer"}], 2, False),
    ("4W((index OR merge), writer)", [{"index", "merge"}, {"writer"}], 3, True),
])
def test_surround_end_to_end(positioned, qtext, slot_sets, max_gaps, ordered):
    searcher, src = positioned
    node = parse_surround(qtext)
    assert isinstance(node, P.IntervalSlotsNode)
    assert node.max_gaps == max_gaps and node.ordered == ordered
    got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}
    toks = _tok_positions(searcher, src)
    want = set()
    for did, tk in toks.items():
        pls = [_slot_union(tk, s) for s in slot_sets]
        if all(p.size for p in pls) and brute_slots(pls, max_gaps, ordered):
            want.add(did)
    assert got == want, qtext


def test_surround_truncated_slot_end_to_end(positioned):
    """`2W(merg*, writer)` — the prefix slot expands against the real
    dictionary (SrndTruncQuery → SpanOr role)."""
    searcher, src = positioned
    node = parse_surround("2W(merg*, writer)")
    got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}
    toks = _tok_positions(searcher, src)
    want = set()
    for did, tk in toks.items():
        a = np.array([i for i, t in enumerate(tk) if t.startswith("merg")],
                     dtype=np.int64)
        b = _slot_union(tk, {"writer"})
        if a.size and b.size and brute_slots([a, b], 1, True):
            want.add(did)
    assert got == want


def test_surround_boolean_end_to_end(positioned):
    """`index AND NOT(writer)`-style boolean == set algebra on term hits."""
    searcher, src = positioned
    node = parse_surround("index NOT writer")
    got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}
    toks = _tok_positions(searcher, src)
    want = {d for d, tk in toks.items() if "index" in tk and "writer" not in tk}
    assert got == want


def test_dangling_operators_raise():
    for bad in ("a OR", "a AND", "a NOT", "a W", "a N"):
        with pytest.raises(SurroundSyntaxError):
            parse_surround(bad)
